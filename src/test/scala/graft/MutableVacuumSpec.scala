package graft

import graft.operators.{MutableGraph, MutableSq, MutableVacuum}
import graft.store.MutableCollection
import org.apache.spark.sql.functions._

/** Index-garbage vacuum ([[graft.operators.MutableVacuum]] +
  * [[graft.operators.MutableGraph.vacuum]]): the live/garbage/pending
  * accounting at the index watermark, the invariant that vacuum never
  * changes a search result (it removes only what search already
  * filters), the n_garbage→0 postcondition, pending-row preservation
  * across a simulated crashed refresh, all-garbage cell removal, the
  * advisor's recommendation rule, and idempotence. */
class MutableVacuumSpec extends SparkSpec {

  private def freshStore() = graft.store.VectorStore(
    java.nio.file.Files.createTempDirectory("graft_vac_spec").toString)

  private def embeddings() = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding")).cache()

  /** attach + a DELETE-ONLY mutation + refresh: deletes write no data
    * rows, so refresh touches no cells and every deleted id's node
    * lingers as a waypoint — the deterministic worst case vacuum exists
    * for (an upsert script would make refresh itself rebuild the
    * touched cells and scrub some garbage as a side effect). */
  private def mutatedGraph(store: graft.store.VectorStore,
                           e: org.apache.spark.sql.DataFrame): Unit = {
    val mc = store.createMutable("vecs", e, "vec_id")
    MutableGraph.attach(spark, store, "vecs", "embedding", "vecs_graph",
      ncells = 4, iters = 2, m = 8)
    mc.delete(e.filter(col("vec_id") % 10 === 6).select("vec_id"))
    MutableGraph.refresh(spark, store, "vecs", "vecs_graph")
  }

  test("graph vacuum: garbage drops to zero, search results unchanged") {
    val store = freshStore()
    try {
      val e = embeddings()
      val n = e.count()
      mutatedGraph(store, e)
      val before = MutableVacuum.report(spark, store, "vecs", "vecs_graph")
        .agg(sum("n_rows"), sum("n_live"), sum("n_garbage")).head()
      // deletes never touch cells, so EVERY deleted id's node lingers
      assert(before.getLong(2) == n / 10,
        s"expected ${n / 10} waypoint nodes, got ${before.getLong(2)}")
      assert(before.getLong(1) == n - n / 10) // live = all minus deleted
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head.getSeq[Float](0).map(_.toDouble).toArray
      def run() = MutableGraph.search(spark, store, "vecs", "vecs_graph",
          qv, k = 10, nprobe = 4, ef = 48)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      val preSearch = run()
      val vacuumed = MutableGraph.vacuum(spark, store, "vecs", "vecs_graph",
        maxGarbagePpm = 0L)
      assert(vacuumed.nonEmpty)
      // physical rewrite only: identical results, identical watermark view
      assert(run() == preSearch)
      val after = MutableVacuum.report(spark, store, "vecs", "vecs_graph")
        .agg(sum("n_rows"), sum("n_live"), sum("n_garbage")).head()
      assert(after.getLong(2) == 0L, s"garbage must be 0, got ${after.getLong(2)}")
      assert(after.getLong(0) == after.getLong(1)) // index == live node set
      // idempotent: nothing left to vacuum
      assert(MutableGraph.vacuum(spark, store, "vecs", "vecs_graph", 0L).isEmpty)
      e.unpersist()
    } finally store.destroy()
  }

  test("graph vacuum removes an all-garbage cell's partition outright") {
    val store = freshStore()
    try {
      val e = embeddings()
      val mc = store.createMutable("vecs", e, "vec_id")
      MutableGraph.attach(spark, store, "vecs", "embedding", "vecs_graph",
        ncells = 4, iters = 2, m = 8)
      // delete EVERYTHING: every cell becomes pure waypoints
      mc.delete(e.select("vec_id"))
      MutableGraph.refresh(spark, store, "vecs", "vecs_graph")
      val dirty = MutableGraph.vacuum(spark, store, "vecs", "vecs_graph", 0L)
      assert(dirty.nonEmpty)
      // the re-seated empty schema keeps the index READABLE at 0 rows
      assert(store.read(spark, "vecs_graph").count() == 0L)
      assert(MutableVacuum.report(spark, store, "vecs", "vecs_graph")
        .count() == 0L)
      // and searchable: an emptied index answers with zero rows, not a crash
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head.getSeq[Float](0).map(_.toDouble).toArray
      assert(MutableGraph.search(spark, store, "vecs", "vecs_graph", qv,
        k = 5, nprobe = 4, ef = 16).count() == 0L)
      e.unpersist()
    } finally store.destroy()
  }

  test("sq vacuum: stale versions rewritten per cell, search unchanged, " +
      "pending rows preserved across a simulated crashed refresh") {
    val store = freshStore()
    try {
      val e = embeddings()
      val n = e.count()
      val mc = store.createMutable("vecs", e, "vec_id")
      MutableSq.attach(spark, store, "vecs", "embedding", "vecs_sq",
        ncells = 4, iters = 2)
      mc.upsert(e.filter(col("vec_id") % 10 === 3)
        .withColumn("embedding", reverse(col("embedding"))))
      mc.delete(e.filter(col("vec_id") % 10 === 6).select("vec_id"))
      MutableSq.refresh(spark, store, "vecs", "vecs_sq")
      // superseded %3 versions + deleted %6 versions are garbage
      val before = MutableVacuum.report(spark, store, "vecs", "vecs_sq")
        .agg(sum("n_rows"), sum("n_live"), sum("n_garbage"), sum("n_pending"))
        .head()
      assert(before.getLong(2) == 2 * (n / 10),
        s"expected ${2 * (n / 10)} garbage versions, got ${before.getLong(2)}")
      assert(before.getLong(3) == 0L)
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head.getSeq[Float](0).map(_.toDouble).toArray
      def run() = MutableSq.search(spark, store, "vecs", "vecs_sq", qv,
          k = 10, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      val preSearch = run()
      // simulate a refresh that crashed before its watermark advance:
      // another mutation + refresh, then roll the watermark file back —
      // the just-indexed rows are now PENDING (seq > w)
      mc.upsert(e.filter(col("vec_id") % 10 === 4)
        .withColumn("embedding", reverse(col("embedding"))))
      val wBefore = graft.store.StoreFs.forPath(store.root)
        .readProps(s"${store.root}/vecs_sq/_indexed.properties")
        .get.getProperty("seq")
      MutableSq.refresh(spark, store, "vecs", "vecs_sq")
      val props = new java.util.Properties()
      props.setProperty("seq", wBefore)
      graft.store.StoreFs.forPath(store.root).writePropsAtomic(
        s"${store.root}/vecs_sq/_indexed.properties", props, "spec rollback")
      val crashed = MutableVacuum.report(spark, store, "vecs", "vecs_sq")
        .agg(sum("n_pending")).head()
      assert(crashed.getLong(0) == n / 10,
        s"expected ${n / 10} pending rows, got ${crashed.getLong(0)}")
      val cells = MutableVacuum.vacuumCells(spark, store, "vecs", "vecs_sq",
        maxGarbagePpm = 0L)
      assert(cells.nonEmpty)
      assert(run() == preSearch) // pre-crash watermark view is unchanged
      val after = MutableVacuum.report(spark, store, "vecs", "vecs_sq")
        .agg(sum("n_garbage"), sum("n_pending")).head()
      assert(after.getLong(0) == 0L)
      assert(after.getLong(1) == n / 10) // pending rows SURVIVED the vacuum
      // the re-run refresh is a no-op append (same delta, dedup absorbs),
      // and search at the advanced watermark sees the %4 mutation
      MutableSq.refresh(spark, store, "vecs", "vecs_sq")
      assert(MutableVacuum.report(spark, store, "vecs", "vecs_sq")
        .agg(sum("n_pending")).head().getLong(0) == 0L)
      e.unpersist()
    } finally store.destroy()
  }

  test("vacuumCells serves the whole cell-partitioned family: IVF and PQ") {
    val store = freshStore()
    try {
      val e = embeddings()
      val n = e.count()
      val mc = store.createMutable("vecs", e, "vec_id")
      graft.operators.MutableIvf.attach(spark, store, "vecs", "embedding",
        "vecs_ivf", ncells = 4)
      graft.operators.MutablePq.attach(spark, store, "vecs", "embedding",
        "vecs_pq", ncells = 4)
      mc.upsert(e.filter(col("vec_id") % 10 === 3)
        .withColumn("embedding", reverse(col("embedding"))))
      mc.delete(e.filter(col("vec_id") % 10 === 6).select("vec_id"))
      graft.operators.MutableIvf.refresh(spark, store, "vecs", "vecs_ivf")
      graft.operators.MutablePq.refresh(spark, store, "vecs", "vecs_pq")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head.getSeq[Float](0).toArray
      def runIvf() = graft.operators.MutableIvf.search(spark, store, "vecs",
          "vecs_ivf", qv, k = 10, nprobe = 4)
        .collect().map(r => r.getLong(0)).toSeq
      def runPq() = graft.operators.MutablePq.search(spark, store, "vecs",
          "vecs_pq", qv, k = 10, nprobe = 4, rerank = 4)
        .collect().map(r => r.getLong(0)).toSeq
      val (preIvf, prePq) = (runIvf(), runPq())
      Seq("vecs_ivf", "vecs_pq").foreach { idx =>
        assert(MutableVacuum.vacuumCells(spark, store, "vecs", idx, 0L).nonEmpty)
        val after = MutableVacuum.report(spark, store, "vecs", idx)
          .agg(sum("n_rows"), sum("n_garbage")).head()
        assert(after.getLong(1) == 0L, s"$idx garbage must be 0")
        assert(after.getLong(0) == n - n / 10, s"$idx must hold exactly the live versions")
      }
      assert(runIvf() == preIvf, "IVF search changed across vacuum")
      assert(runPq() == prePq, "PQ search changed across vacuum")
      e.unpersist()
    } finally store.destroy()
  }

  test("threshold gates the rewrite; advisor recommends per the worst cell") {
    val store = freshStore()
    try {
      val e = embeddings()
      val mc = store.createMutable("vecs", e, "vec_id")
      MutableSq.attach(spark, store, "vecs", "embedding", "vecs_sq",
        ncells = 4, iters = 2)
      graft.operators.MutableBq.attach(spark, store, "vecs", "embedding",
        "vecs_bq")
      mc.delete(e.filter(col("vec_id") % 100 === 7).select("vec_id"))
      MutableSq.refresh(spark, store, "vecs", "vecs_sq")
      graft.operators.MutableBq.refresh(spark, store, "vecs", "vecs_bq")
      // ~1% garbage: far below a 50% threshold -> no rewrite anywhere
      assert(MutableVacuum.vacuumCells(spark, store, "vecs", "vecs_sq",
        maxGarbagePpm = 500000L).isEmpty)
      assert(!MutableVacuum.vacuumFlat(spark, store, "vecs", "vecs_bq",
        maxGarbagePpm = 500000L))
      val adv = MutableVacuum.advisor(spark, store, "vecs",
          Seq("vecs_sq", "vecs_bq"), maxGarbagePpm = 500000L)
        .collect().map(r => (r.getString(0), r.getBoolean(6))).toMap
      assert(adv == Map("vecs_sq" -> false, "vecs_bq" -> false))
      // at threshold 0 every index with any garbage is recommended
      val adv0 = MutableVacuum.advisor(spark, store, "vecs",
          Seq("vecs_sq", "vecs_bq"), maxGarbagePpm = 0L)
        .collect().map(r => (r.getString(0), r.getBoolean(6))).toMap
      assert(adv0 == Map("vecs_sq" -> true, "vecs_bq" -> true))
      // and the flat vacuum rewrites the BQ relation clean
      assert(MutableVacuum.vacuumFlat(spark, store, "vecs", "vecs_bq", 0L))
      assert(MutableVacuum.report(spark, store, "vecs", "vecs_bq")
        .head().getAs[Long]("n_garbage") == 0L)
      e.unpersist()
    } finally store.destroy()
  }

  test("indexCatalog surfaces garbage columns via the watermark binding") {
    val store = freshStore()
    try {
      val e = embeddings()
      val mc = store.createMutable("vecs", e, "vec_id")
      MutableSq.attach(spark, store, "vecs", "embedding", "vecs_sq",
        ncells = 4, iters = 2)
      mc.delete(e.filter(col("vec_id") % 10 === 6).select("vec_id"))
      MutableSq.refresh(spark, store, "vecs", "vecs_sq")
      // the sidecar binds the index to its collection — discoverability
      assert(MutableVacuum.boundCollection(store, "vecs_sq") == Some("vecs"))
      val cat = store.indexCatalog(spark, maxGarbagePpm = 10000L).collect()
        .map(r => r.getString(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)),
           if (r.isNullAt(4)) None else Some(r.getBoolean(4)))).toMap
      // the dirty versioned index reports its worst cell and recommends
      val (ppm, rec) = cat("vecs_sq")
      assert(ppm.exists(_ > 10000L), s"vecs_sq worst ppm: $ppm")
      assert(rec.contains(true))
      // the worst cell the catalog reports IS the report's max
      val worst = MutableVacuum.report(spark, store, "vecs", "vecs_sq")
        .agg(max("garbage_ppm")).head().getLong(0)
      assert(ppm.contains(worst))
      // plain collections carry NULLs, not zeros
      assert(cat("vecs") == ((None, None)))
      // after the vacuum the catalog goes quiet
      MutableVacuum.vacuumCells(spark, store, "vecs", "vecs_sq", 0L)
      val cat2 = store.indexCatalog(spark, maxGarbagePpm = 10000L).collect()
        .map(r => r.getString(0) ->
          (if (r.isNullAt(3)) -1L else r.getLong(3),
           if (r.isNullAt(4)) false else r.getBoolean(4))).toMap
      assert(cat2("vecs_sq") == ((0L, false)))
      e.unpersist()
    } finally store.destroy()
  }
}
