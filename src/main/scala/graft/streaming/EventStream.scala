package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

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

  /** Child session sized for LOCAL streaming state: the shuffle-partition
    * count fixes the per-operator state-store count for the lifetime of a
    * streaming query, and 32 stores x a few KB of state each is pure
    * commit/snapshot overhead at harness scale (measured: 16s -> 4.4s on
    * the sf0.1 stream-stream join). On a real cluster this is sized UP to
    * the executor core count instead — the knob, not the number, is the
    * design point. The parent session's conf is untouched.
    */
  private[streaming] def streamSession(spark: SparkSession,
                                       statePartitions: Int = 8): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    // newSession() does NOT inherit session-scoped SQL confs — carry the
    // caller's state-store backend choice (e.g. RocksDB for large state)
    // into the child so it actually takes effect
    val k = "spark.sql.streaming.stateStore.providerClass"
    try s.conf.set(k, spark.conf.get(k)) catch { case _: Throwable => () }
    s
  }

  /** Drain a finished memory-sink query onto the PARENT session: collect
    * the sink's rows, stop the query, and DROP the sink's temp view so
    * repeated Bench/Verify invocations in one JVM do not accumulate a
    * fully-materialized result table per run (the memory sink pins its
    * rows in the child session's catalog until dropped). The returned
    * DataFrame is a local relation on `parent` — independent of the child
    * session and of the sink.
    *
    * Stopping the query does NOT unload its state-store providers: they
    * stay registered in the executor-side `StateStore` singleton (waiting
    * for a next microbatch that never comes), each pinning a checkpoint
    * file manager with its thread pool — measured +8 providers and +70
    * threads per stateful run in one JVM. For these one-shot drained
    * queries the state is dead by construction, so unload it eagerly.
    * (`unloadAll` would also bounce providers of a concurrently-running
    * streaming query; that query reloads them from its checkpoint on the
    * next batch — a hiccup, not a correctness issue — and graft's
    * streaming helpers are synchronous one-shots, so in-library there is
    * no concurrent holder.) */
  private[graft] def drainMemorySink(parent: SparkSession, child: SparkSession,
                                     q: StreamingQuery, queryName: String): DataFrame = {
    val sink = child.table(queryName)
    val rows = sink.collect()
    val schema = sink.schema
    q.stop()
    child.catalog.dropTempView(queryName)
    try org.apache.spark.sql.graft.Bridge.unloadAllStateStores()
    catch { case _: Throwable => () }
    parent.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** The parity-critical nanos->micros ts conversion (same as
    * `Tables.events`): INT64 TIMESTAMP(NANOS) read as long, floored to
    * micros with INTEGER division (ns epoch exceeds 2^53 — double division
    * corrupts). One definition, shared by every streaming entry point. */
  private[graft] def convertTs(df: DataFrame,
                                   schema: org.apache.spark.sql.types.StructType): DataFrame =
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // timestamp[us] without isAdjustedToUTC reads as NTZ, which
        // event-time watermarks reject; every entry point runs UTC, so
        // the LTZ cast is value-preserving (same rule as Tables.events)
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** The file-source readStream over an events parquet file, with the
    * shared ts conversion. */
  /** File-source stream over a SINGLE parquet file: the source streams a
    * DIRECTORY, so glob-filter the parent down to the one file. Shared
    * by the event and document stream surfaces. */
  private[streaming] def readFileStream(spark: SparkSession, parquetFile: String): DataFrame = {
    // resolve to absolute first: a relative single-segment path gets its
    // real parent, and a root-level file ("/f.parquet", slash index 0)
    // streams from "/" instead of failing a parent-directory guard
    val abs = new java.io.File(parquetFile).getAbsolutePath
    val slash = abs.lastIndexOf('/')
    val parent = if (slash == 0) "/" else abs.substring(0, slash)
    val schema = spark.read.parquet(abs).schema
    spark.readStream.schema(schema)
      .option("basePath", parent)
      .option("pathGlobFilter", abs.substring(slash + 1))
      .parquet(parent)
  }

  private def readEventStream(spark: SparkSession, eventsParquet: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = readFileStream(spark, eventsParquet)
    convertTs(raw, spark.read.parquet(eventsParquet).schema)
  }

  /** Stream-stream interval join through Structured Streaming: purchases
    * inner-joined to the same user's clicks within the preceding hour.
    * Both sides carry watermarks + the time-range join condition, which is
    * exactly what lets the engine BOUND THE JOIN STATE (clicks older than
    * watermark - 1h are evicted) — the property that makes a stream-stream
    * join runnable forever at scale, vs. unbounded state growth. Batch
    * twin (and DuckDB oracle): a plain time-range self-join.
    */
  def runStreamingIntervalJoin(spark0: SparkSession, eventsParquet: String,
                               queryName: String = "graft_stream_join"): DataFrame = {
    val spark = streamSession(spark0)
    val stream = readEventStream(spark, eventsParquet)
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    val clicks = stream.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val joined = purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("interval 1 hour") &&
        col("c_ts") <= col("p_ts"))
      .select("user_id", "purchase_id", "click_id")
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    drainMemorySink(spark0, spark, q, queryName)
  }

  /** Streaming exact dedup: the source is REPLAYED (the events file copied
    * twice into the stream directory, so every event arrives twice) and
    * `dropDuplicatesWithinWatermark("event_id")` removes the duplicates
    * with BOUNDED state — ids older than the 1-hour watermark are evicted,
    * which is what lets exactly-once dedup run forever on an unbounded
    * stream instead of accumulating every id ever seen. Returns the
    * deduped rows; callers aggregate. Oracle twin = the same aggregate
    * over the single-copy batch table.
    */
  def runStreamingDedup(spark0: SparkSession, eventsParquet: String,
                        queryName: String = "graft_stream_dedup"): DataFrame = {
    val spark = streamSession(spark0)
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup")
    try {
      val src = java.nio.file.Paths.get(eventsParquet)
      java.nio.file.Files.copy(src, dir.resolve("a.parquet"))
      java.nio.file.Files.copy(src, dir.resolve("b.parquet"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(eventsParquet).schema
      val raw = spark.readStream.schema(schema).parquet(dir.toString)
      val deduped = convertTs(raw, schema).withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
      val q = deduped.writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      drainMemorySink(spark0, spark, q, queryName) // rows localized; staging can go
    } finally {
      dir.toFile.listFiles().foreach(_.delete())
      dir.toFile.delete(): Unit
    }
  }

  /** Streaming variant: file-source readStream over the same parquet,
    * 10-minute watermark, complete processing of available data through the
    * streaming engine into an in-memory sink. Returns the sink contents as
    * a DataFrame. Used for smoke/tests at harness scale; on a cluster the
    * sink would be a parquet/Kafka writeStream with the same plan.
    */
  def runStreamingWindowedAgg(spark0: SparkSession, eventsParquet: String,
                              windowLen: String = "1 hour",
                              queryName: String = "graft_stream_agg"): DataFrame = {
    val spark = streamSession(spark0)
    val stream = readEventStream(spark, eventsParquet)
    val agg = windowedAgg(stream.withWatermark("ts", "10 minutes"), windowLen)
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    drainMemorySink(spark0, spark, q, queryName)
  }
}
