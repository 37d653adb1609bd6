package graft.streaming

import graft.text.QualityClassifier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

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

  /** Streaming near-duplicate detection: new documents ARRIVE AS A
    * STREAM and are LSH-checked against the standing corpus per
    * micro-batch via `foreachBatch` + the batch incremental operator —
    * the production shape for "reject near-dups at ingest time".
    *
    * Why foreachBatch and not a stream-static join: the incremental
    * check is a band equi-join FOLLOWED by an exact-Jaccard
    * verification join and a candidate de-dup — a multi-join DAG that
    * per-batch batch semantics express directly, while the pure
    * streaming planner would force watermark/state reasoning onto what
    * is logically a stateless per-batch lookup. State here is ZERO:
    * each batch joins against the static corpus and emits its pairs;
    * nothing carries across batches, so the query runs forever at
    * bounded memory. At 100 TB the static side is the banded signature
    * INDEX persisted in the VectorStore (not the raw corpus), and each
    * micro-batch's band join prunes to matching buckets — O(batch),
    * never O(corpus) per batch (same argument as dedup_incremental,
    * whose oracle this query shares verbatim).
    *
    * The collected per-batch results are BOUNDED: pairs above a 0.8
    * Jaccard threshold from one ingest batch — the same few-row
    * contract as the batch operator's output. */
  def runStreamingNearDup(spark0: SparkSession, docsParquet: String,
                          threshold: Double = 0.8): DataFrame = {
    val spark = EventStream.streamSession(spark0)
    val stream = EventStream.readFileStream(spark, docsParquet)
      .filter(col("doc_id") % 10 === 7) // the "new arrivals" slice
    val standing = spark.read.parquet(
      new java.io.File(docsParquet).getAbsolutePath)
      .filter(col("doc_id") % 10 =!= 7)
    val buf = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val pairs = graft.operators.Dedup.minhashLshIncremental(
          batch, standing, "text", "doc_id", threshold = threshold)
        buf.synchronized { buf ++= pairs.collect() }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    val schema = StructType(Seq(
      StructField("new_id", LongType), StructField("existing_id", LongType),
      StructField("jaccard", DoubleType)))
    spark0.createDataFrame(
      java.util.Arrays.asList(buf.toSeq: _*), schema)
  }
}
