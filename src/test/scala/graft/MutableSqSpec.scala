package graft

import graft.operators.{MutableSq, Similarity}
import org.apache.spark.sql.functions._

/** Live-mutable COMPRESSED index ([[graft.operators.MutableSq]]):
  * merge-on-read consistency under upsert/delete, codes-only layout,
  * and refresh invisibility — search over the maintained index must
  * equal a direct ADC ranking of the LIVE corpus re-encoded with the
  * frozen quantizer. */
class MutableSqSpec extends SparkSpec {

  private def freshStore() = graft.store.VectorStore(
    java.nio.file.Files.createTempDirectory("graft_msq_spec").toString)

  test("mutable-SQ search resolves live versions through the codes-only index") {
    val store = freshStore()
    try {
      val e = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding")).cache()
      val mc = store.createMutable("vecs", e, "vec_id")
      val (cents, mins, maxs) = MutableSq.attach(
        spark, store, "vecs", "embedding", "vecs_sq", ncells = 8, iters = 2)

      // codes-only: the index layout must not carry the raw vector
      val idxCols = store.read(spark, "vecs_sq").schema.fieldNames.toSet
      assert(!idxCols.contains("embedding") && idxCols.contains("sq_code"),
        s"index must store codes, not vectors: $idxCols")

      mc.upsert(e.filter(col("vec_id") % 10 === 3)
        .withColumn("embedding", reverse(col("embedding"))))
      mc.delete(e.filter(col("vec_id") % 10 === 6).select("vec_id"))
      MutableSq.refresh(spark, store, "vecs", "vecs_sq")

      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head.getSeq[Float](0).map(_.toDouble).toArray
      val got = MutableSq.search(spark, store, "vecs", "vecs_sq", qv,
        k = 10, nprobe = 8) // all cells: makes the twin exact, not probe-lucky
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq

      // twin: re-encode the LIVE corpus with the frozen quantizer and
      // ADC-rank directly — no index, no versions, no tombstones
      import graft.functions.VectorFunctions.sqAdc
      val scales = Array.tabulate(mins.length)(i => (maxs(i) - mins(i)) / 255)
      val live = e.filter(col("vec_id") % 10 =!= 6)
        .withColumn("embedding",
          when(col("vec_id") % 10 === 3, reverse(col("embedding")))
            .otherwise(col("embedding")))
      val want = Similarity.sqAssignEncode(live, "embedding", "vec_id",
          cents, mins, maxs)
        .withColumn("dist", floor(sqAdc(col("sq_code"), mins, scales, qv)
          * 1e6 + 0.5) / 1e6)
        .orderBy(col("dist"), col("vec_id"))
        .limit(10)
        .select(col("vec_id"), col("cell_id").cast("int"), col("dist"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      assert(got == want, "live search must equal the frozen-quantizer " +
        s"re-encode of the mutated corpus:\n got=$got\nwant=$want")

      // deleted ids never surface; upserted ids rank by the NEW vector
      assert(got.forall(_._1 % 10 != 6))

      // idempotent refresh: nothing written since ⇒ watermark unchanged
      val w1 = MutableSq.refresh(spark, store, "vecs", "vecs_sq")
      val w2 = MutableSq.refresh(spark, store, "vecs", "vecs_sq")
      assert(w1 == w2)
      e.unpersist()
    } finally store.destroy()
  }

  test("where-DSL filters CURRENT metadata versions, not stale ones") {
    val store = freshStore()
    try {
      val e = Tables.embeddings(spark, sf).cache() // carries label
      val mc = store.createMutable("vecs", e, "vec_id")
      MutableSq.attach(spark, store, "vecs", "embedding", "vecs_sq",
        ncells = 8, iters = 2)
      // upserts move label out of the filter band AND reverse the vector
      mc.upsert(e.filter(col("vec_id") % 10 === 3)
        .withColumn("embedding", reverse(col("embedding")))
        .withColumn("label", col("label") + 10))
      MutableSq.refresh(spark, store, "vecs", "vecs_sq")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head.getSeq[Float](0).map(_.toDouble).toArray
      val hits = MutableSq.search(spark, store, "vecs", "vecs_sq", qv,
        k = 50, nprobe = 8, where = Some("""{"label": {"$lt": 10}}"""))
        .collect()
      // an index leaking a STALE version (old label < 10) would readmit
      // the upserted ids — their CURRENT label is >= 10
      assert(hits.nonEmpty && hits.forall(_.getLong(0) % 10 != 3))
      e.unpersist()
    } finally store.destroy()
  }
}
