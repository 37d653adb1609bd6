package graft.streaming

import graft.text.QualityClassifier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Streaming document pipeline surfaces: gates whose batch forms are
  * pure row-wise expressions run UNCHANGED on a stream with zero state —
  * no watermark, no aggregation buffers, append mode. This is the
  * deployment shape for scoring documents as they land (the file source
  * here; Kafka in production — same plan above the source).
  */
object DocStream {

  /** Quality-classifier gate over a document stream (AvailableNow one-
    * shot for the harness; remove the trigger for continuous). The
    * scoring plan is IDENTICAL to the batch query's — same expressions,
    * same model literal — which is why the batch oracle checks this
    * query's output verbatim. */
  def runStreamingQuality(spark0: SparkSession, docsParquet: String,
                          queryName: String): DataFrame = {
    val spark = EventStream.streamSession(spark0)
    val stream = EventStream.readFileStream(spark, docsParquet)
    val scored = QualityClassifier.score(stream, "text", "doc_id")
    val q = scored.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    EventStream.drainMemorySink(spark0, spark, q, queryName)
  }
}
