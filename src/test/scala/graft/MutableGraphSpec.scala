package graft

import graft.functions.VectorFunctions.{l2Sq, vecLit}
import graft.operators.MutableGraph
import org.apache.spark.sql.functions._

/** Live-mutable GRAPH index ([[graft.operators.MutableGraph]]): the
  * walk family's merge-on-read semantics — exhaustive configuration
  * equals exact kNN over the live state, waypoints (deleted /
  * superseded nodes) route but never surface, reads are point-in-time
  * at the indexed watermark, and refresh touches only the arrival
  * versions' cells. */
class MutableGraphSpec extends SparkSpec {

  private def freshStore() = graft.store.VectorStore(
    java.nio.file.Files.createTempDirectory("graft_mgr_spec").toString)

  private def liveTwin(e: org.apache.spark.sql.DataFrame) = e
    .filter(col("vec_id") % 10 =!= 6)
    .withColumn("embedding",
      when(col("vec_id") % 10 === 3, reverse(col("embedding")))
        .otherwise(col("embedding")))

  test("exhaustive config equals exact kNN over the mutated live state") {
    val store = freshStore()
    try {
      val e = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding")).cache()
      val n = e.count().toInt
      val mc = store.createMutable("vecs", e, "vec_id")
      MutableGraph.attach(spark, store, "vecs", "embedding", "vecs_graph",
        ncells = 4, iters = 2, m = 8)
      mc.upsert(e.filter(col("vec_id") % 10 === 3)
        .withColumn("embedding", reverse(col("embedding"))))
      mc.delete(e.filter(col("vec_id") % 10 === 6).select("vec_id"))
      MutableGraph.refresh(spark, store, "vecs", "vecs_graph")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head.getSeq[Float](0).map(_.toDouble).toArray
      // exhaustive: probe every cell, beam wide enough to visit everything
      val got = MutableGraph.search(spark, store, "vecs", "vecs_graph", qv,
        k = 10, nprobe = 4, ef = n + 10)
        .select("vec_id", "dist")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = liveTwin(e)
        .withColumn("dist",
          floor(l2Sq(col("embedding"), vecLit(qv.map(_.toFloat))) * 1e6 + 0.5) / 1e6)
        .orderBy(col("dist"), col("vec_id")).limit(10)
        .select("vec_id", "dist")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == want,
        s"exhaustive live-graph search must equal exact live kNN:\n g=$got\n w=$want")
      // waypoints never surface
      assert(got.forall(_._1 % 10 != 6))
      e.unpersist()
    } finally store.destroy()
  }

  test("reads are point-in-time at the watermark; refresh advances them") {
    val store = freshStore()
    try {
      val e = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding")).cache()
      val n = e.count().toInt
      val mc = store.createMutable("vecs", e, "vec_id")
      MutableGraph.attach(spark, store, "vecs", "embedding", "vecs_graph",
        ncells = 4, iters = 2, m = 8)
      // mutate WITHOUT refresh: the snapshot at the attach watermark
      // must still answer with the PRE-mutation state
      mc.delete(e.filter(col("vec_id") % 10 === 6).select("vec_id"))
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head.getSeq[Float](0).map(_.toDouble).toArray
      val before = MutableGraph.search(spark, store, "vecs", "vecs_graph", qv,
        k = 10, nprobe = 4, ef = n + 10).collect().map(_.getLong(0)).toSet
      val exactPre = e
        .withColumn("dist",
          floor(l2Sq(col("embedding"), vecLit(qv.map(_.toFloat))) * 1e6 + 0.5) / 1e6)
        .orderBy(col("dist"), col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
      assert(before == exactPre,
        "pre-refresh search must read the attach-time snapshot")
      // refresh: deletes write no rows, so no cell rebuilds — but the
      // watermark advances and the tombstones now apply
      MutableGraph.refresh(spark, store, "vecs", "vecs_graph")
      val after = MutableGraph.search(spark, store, "vecs", "vecs_graph", qv,
        k = 10, nprobe = 4, ef = n + 10).collect().map(_.getLong(0)).toSet
      assert(after.forall(_ % 10 != 6), s"deleted ids resurfaced: $after")
      e.unpersist()
    } finally store.destroy()
  }

  test("nodes indexed PAST the watermark never surface (crashed-refresh window)") {
    // a refresh that rebuilds cells but dies before its watermark
    // advance leaves the index holding FUTURE node versions; the
    // search-time `seq <= watermark` bound (the sibling families' rule)
    // must keep them out of results. Residual (documented): the
    // pre-mutation versions in REBUILT cells are gone until the re-run,
    // so rows may be MISSING — but nothing from the future may SHOW.
    val store = freshStore()
    try {
      val e = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding")).cache()
      val n = e.count().toInt
      val mc = store.createMutable("vecs", e, "vec_id")
      MutableGraph.attach(spark, store, "vecs", "embedding", "vecs_graph",
        ncells = 4, iters = 2, m = 8)
      // pick an id to mutate and aim the query AT its future vector:
      // if the future version leaked, it would rank #1 at distance 0
      val target = e.filter(col("vec_id") % 10 === 3)
        .orderBy("vec_id").limit(1)
      val targetId = target.head.getLong(0)
      mc.upsert(target.withColumn("embedding", reverse(col("embedding"))))
      MutableGraph.refresh(spark, store, "vecs", "vecs_graph")
      // roll the watermark back: the index now carries seq-1 nodes past it
      val props = new java.util.Properties()
      props.setProperty("seq", "0")
      graft.store.StoreFs.forPath(store.root).writePropsAtomic(
        s"${store.root}/vecs_graph/_indexed.properties", props, "spec rollback")
      val qv = target.select(reverse(col("embedding")))
        .head.getSeq[Float](0).map(_.toDouble).toArray
      val got = MutableGraph.search(spark, store, "vecs", "vecs_graph", qv,
          k = 5, nprobe = 4, ef = n + 10)
        .collect().map(r => (r.getLong(0), r.getDouble(2)))
      assert(!got.exists { case (id, d) => id == targetId && d == 0.0 },
        s"future version of $targetId surfaced at the old watermark: " +
          got.mkString(", "))
      e.unpersist()
    } finally store.destroy()
  }

  test("where-DSL filters CURRENT metadata versions over the walk candidates") {
    val store = freshStore()
    try {
      val e = Tables.embeddings(spark, sf).cache() // carries label
      val n = e.count().toInt
      val mc = store.createMutable("vecs", e, "vec_id")
      MutableGraph.attach(spark, store, "vecs", "embedding", "vecs_graph",
        ncells = 4, iters = 2, m = 8)
      // upserts move label out of the filter band AND reverse the vector
      mc.upsert(e.filter(col("vec_id") % 10 === 3)
        .withColumn("embedding", reverse(col("embedding")))
        .withColumn("label", col("label") + 10))
      MutableGraph.refresh(spark, store, "vecs", "vecs_graph")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head.getSeq[Float](0).map(_.toDouble).toArray
      val hits = MutableGraph.search(spark, store, "vecs", "vecs_graph", qv,
        k = 50, nprobe = 4, ef = n + 10,
        where = Some("""{"label": {"$lt": 10}}""")).collect()
      // a stale metadata version (old label < 10) would readmit the
      // upserted ids — their CURRENT label is >= 10
      assert(hits.nonEmpty && hits.forall(_.getLong(0) % 10 != 3))
      e.unpersist()
    } finally store.destroy()
  }

  test("refresh rebuilds only the touched cells") {
    val store = freshStore()
    try {
      val e = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding")).cache()
      val mc = store.createMutable("vecs", e, "vec_id")
      MutableGraph.attach(spark, store, "vecs", "embedding", "vecs_graph",
        ncells = 4, iters = 2, m = 8)
      val filesBefore = store.dataFileStatuses("vecs_graph")
        .map(st => st.getPath.toString -> st.getModificationTime).toMap
      // upsert ONE id: at most one touched cell rebuilds
      mc.upsert(e.filter(col("vec_id") === 3)
        .withColumn("embedding", reverse(col("embedding"))))
      MutableGraph.refresh(spark, store, "vecs", "vecs_graph")
      val untouchedSurvivors = store.dataFileStatuses("vecs_graph")
        .map(_.getPath.toString).count(filesBefore.contains)
      assert(untouchedSurvivors > 0,
        "a one-row refresh must leave untouched cells' files in place")
      e.unpersist()
    } finally store.destroy()
  }
}
