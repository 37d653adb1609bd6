package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is batch-only (SURVEY §2.2: no streaming anywhere), so
  * this is part of the pipeline-extension surface: watermarked tumbling-
  * window aggregation as `readStream -> transform -> writeStream`, plus a
  * batch-equivalent transform (identical logic, used by the oracle-checked
  * query and by tests to cross-validate the streaming output).
  */
object EventStream {

  /** The windowed aggregation, defined once and shared by the batch and
    * streaming paths: tumbling window per event_type with count / sum.
    */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming variant: file-source readStream over the same parquet,
    * 10-minute watermark, complete processing of available data through the
    * streaming engine into an in-memory sink. Returns the sink contents as
    * a DataFrame. Used for smoke/tests at harness scale; on a cluster the
    * sink would be a parquet/Kafka writeStream with the same plan.
    */
  def runStreamingWindowedAgg(spark: SparkSession, eventsParquet: String,
                              windowLen: String = "1 hour",
                              queryName: String = "graft_stream_agg"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsParquet).schema
    // the file-stream source wants a directory basePath; point it at the
    // parent and glob the single file
    val parent = eventsParquet.substring(0, eventsParquet.lastIndexOf('/'))
    val fname = eventsParquet.substring(eventsParquet.lastIndexOf('/') + 1)
    val raw = spark.readStream.schema(schema)
      .option("basePath", parent)
      .option("pathGlobFilter", fname)
      .parquet(parent)
    // ns-as-long -> microsecond timestamps (same conversion as Tables.events)
    val stream = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw
    }
    val agg = windowedAgg(stream.withWatermark("ts", "10 minutes"), windowLen)
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
