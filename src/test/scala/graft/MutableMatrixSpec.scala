package graft

import graft.operators.{MutableBq, MutablePq}
import org.apache.spark.sql.functions._

/** Cross-cutting pins for the live-mutable index matrix (BQ / PQ —
  * IVF, SQ, graph have their own suites): point-in-time reads at the
  * indexed watermark, codes-only layouts, and refresh idempotence. */
class MutableMatrixSpec extends SparkSpec {

  private def freshStore(tag: String) = graft.store.VectorStore(
    java.nio.file.Files.createTempDirectory(tag).toString)

  test("mutable-BQ reads are point-in-time; refresh surfaces the new state") {
    val store = freshStore("graft_mbq_spec")
    try {
      val e = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding")).cache()
      val mc = store.createMutable("vecs", e, "vec_id")
      MutableBq.attach(spark, store, "vecs", "embedding", "vecs_bq")
      // codes-only: no vector column in the index
      val idxCols = store.read(spark, "vecs_bq").schema.fieldNames.toSet
      assert(!idxCols.contains("embedding") && idxCols.contains("bq_lo"))
      mc.delete(e.filter(col("vec_id") % 10 === 6).select("vec_id"))
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head.getSeq[Float](0).toArray
      // pre-refresh: the attach-time snapshot still answers WITH the
      // later-deleted ids
      val before = MutableBq.search(spark, store, "vecs", "vecs_bq", qv,
        k = 50, rerank = 4).collect().map(_.getLong(0))
      assert(before.exists(_ % 10 == 6),
        "pre-refresh snapshot must still see the later-deleted ids")
      MutableBq.refresh(spark, store, "vecs", "vecs_bq")
      val after = MutableBq.search(spark, store, "vecs", "vecs_bq", qv,
        k = 50, rerank = 4).collect().map(_.getLong(0))
      assert(after.nonEmpty && after.forall(_ % 10 != 6))
      e.unpersist()
    } finally store.destroy()
  }

  test("mutable-PQ resolves live versions and stays codes-only") {
    val store = freshStore("graft_mpq_spec")
    try {
      val e = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding")).cache()
      val mc = store.createMutable("vecs", e, "vec_id")
      MutablePq.attach(spark, store, "vecs", "embedding", "vecs_pq",
        ncells = 8)
      val idxCols = store.read(spark, "vecs_pq").schema.fieldNames.toSet
      assert(!idxCols.contains("embedding") && idxCols.contains("pq_code"))
      mc.upsert(e.filter(col("vec_id") % 10 === 3)
        .withColumn("embedding", reverse(col("embedding"))))
      mc.delete(e.filter(col("vec_id") % 10 === 6).select("vec_id"))
      val w1 = MutablePq.refresh(spark, store, "vecs", "vecs_pq")
      val w2 = MutablePq.refresh(spark, store, "vecs", "vecs_pq")
      assert(w1 == w2, "idempotent refresh must not advance the watermark")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head.getSeq[Float](0).toArray
      val hits = MutablePq.search(spark, store, "vecs", "vecs_pq", qv,
        k = 10, nprobe = 8, rerank = 8).collect()
      assert(hits.nonEmpty && hits.forall(_.getLong(0) % 10 != 6))
      // the query vector itself (vec 0, unmutated) must be its own
      // nearest neighbor through the compressed chain
      assert(hits.head.getLong(0) == 0L && hits.head.getDouble(1) == 0.0)
      e.unpersist()
    } finally store.destroy()
  }
}
