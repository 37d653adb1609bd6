package graft

import graft.operators.{Clustering, Similarity}
import org.apache.spark.sql.functions._

/** Retrain-at-new-geometry for the ENCODE families (SQ / PQ / BQ) — the
  * lifecycle completion the frozen-quantizer appends defer to "the
  * retrain verb's job": each verb must produce a store byte-identical in
  * answers to a FROM-SCRATCH build at the retrained geometry, and the
  * codes-only families (SQ, BQ) must enforce their corpus-cardinality
  * contract rather than silently retraining on a drifted relation. */
class RetrainSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf)

  private def freshStore(tag: String) = graft.store.VectorStore(
    java.nio.file.Files.createTempDirectory(tag).toString)

  test("retrainStoredSq equals a from-scratch build at the new geometry") {
    val store = freshStore("graft_sqrt_spec")
    try {
      val e = emb.cache()
      val standing = e.filter(col("vec_id") % 10 =!= 7)
      // stale build: quantizer fitted on the standing slice only
      val c0 = Clustering.trainCentroids(standing, 8, 2)
      val (mn0, mx0) = Similarity.sqMinMax(standing, "embedding")
      store.create("sq", Similarity.sqAssignEncode(
        standing, "embedding", "vec_id", c0, mn0, mx0),
        partitionBy = Seq("cell_id"))
      Similarity.insertIntoStoredSq(store, "sq",
        e.filter(col("vec_id") % 10 === 7), "embedding", "vec_id",
        c0, mn0, mx0): Unit
      val (cents, mins, maxs) = Similarity.retrainStoredSq(
        spark, store, "sq", e, "embedding", "vec_id", ncells = 4, iters = 2)
      // from-scratch twin at the same geometry
      val (centsF, minsF, maxsF) = Similarity.buildIvfSqIndex(
        store, "sq_fresh", e, "embedding", "vec_id", ncells = 4, iters = 2)
      assert(cents.map(_.toSeq).toSeq == centsF.map(_.toSeq).toSeq,
        "retrained centroids must equal from-scratch centroids")
      assert(mins.toSeq == minsF.toSeq && maxs.toSeq == maxsF.toSeq)
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head.getSeq[Float](0).map(_.toDouble).toArray
      def hits(name: String) = Similarity.sqSearchStored(
        store.read(spark, name).filter(col("vec_id") =!= 0),
        "vec_id", cents, mins, maxs, qv, k = 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      assert(hits("sq") == hits("sq_fresh"))
      // the stored rows themselves match (codes, cells, ids)
      val got = store.read(spark, "sq").orderBy("vec_id")
        .collect().map(_.toSeq).toSeq
      val want = store.read(spark, "sq_fresh").orderBy("vec_id")
        .collect().map(_.toSeq).toSeq
      assert(got == want, "retrained layout must equal a from-scratch build")
      e.unpersist()
    } finally store.destroy()
  }

  test("retrainStoredPq equals a from-scratch build at the new geometry") {
    val store = freshStore("graft_pqrt_spec")
    try {
      val e = emb.cache()
      val (c0, cb0) = Similarity.trainIvfPq(e, "embedding", "vec_id", ncells = 16)
      store.create("pq", Similarity.pqEncode(
        e.filter(col("vec_id") % 10 =!= 7), "embedding", "vec_id", c0, cb0),
        partitionBy = Seq("cell_id"))
      Similarity.insertIntoStoredPq(store, "pq",
        e.filter(col("vec_id") % 10 === 7), "embedding", "vec_id", c0, cb0): Unit
      val (cents, cb) = Similarity.retrainStoredPq(
        spark, store, "pq", "embedding", "vec_id", ncells = 8)
      val (centsF, cbF) = Similarity.buildIvfPqIndex(
        store, "pq_fresh", e, "embedding", "vec_id", ncells = 8)
      assert(cents.map { case (i, c) => (i, c.toSeq) }.toSeq ==
        centsF.map { case (i, c) => (i, c.toSeq) }.toSeq)
      assert(cb.cents.map(_.map(_.toSeq).toSeq).toSeq ==
        cbF.cents.map(_.map(_.toSeq).toSeq).toSeq,
        "retrained codebooks must equal from-scratch codebooks")
      val got = store.read(spark, "pq")
        .select(col("vec_id"), col("cell_id"), hex(col("pq_code")))
        .orderBy("vec_id").collect().map(_.toSeq).toSeq
      val want = store.read(spark, "pq_fresh")
        .select(col("vec_id"), col("cell_id"), hex(col("pq_code")))
        .orderBy("vec_id").collect().map(_.toSeq).toSeq
      assert(got == want, "retrained codes must equal a from-scratch build")
      e.unpersist()
    } finally store.destroy()
  }

  test("retrainStoredBq centers signatures and round-trips its sidecar") {
    val store = freshStore("graft_bqrt_spec")
    try {
      val e = emb.cache()
      val corpus = e.filter(col("vec_id") =!= 0)
      Similarity.buildBqIndex(store, "bq",
        corpus.filter(col("vec_id") % 10 =!= 7), "embedding", "vec_id")
      Similarity.insertIntoStoredBq(store, "bq",
        corpus.filter(col("vec_id") % 10 === 7), "embedding", "vec_id"): Unit
      assert(Similarity.readBqThresholds(store, "bq").isEmpty,
        "a sign-at-zero layout carries no threshold sidecar")
      val thr = Similarity.retrainStoredBq(
        spark, store, "bq", corpus, "embedding", "vec_id")
      // sidecar round-trips exactly (Double.toString is lossless)
      assert(Similarity.readBqThresholds(store, "bq").get.toSeq == thr.toSeq)
      // retrained signatures equal a direct centered encode of the corpus
      val want = Similarity.bqEncodeCentered(corpus, "embedding", "vec_id", thr)
        .orderBy("vec_id").collect().map(_.toSeq).toSeq
      val got = store.read(spark, "bq").orderBy("vec_id")
        .collect().map(_.toSeq).toSeq
      assert(got == want)
      // centered search over the retrained store == search over the
      // directly-encoded store (maintenance invisible to the answer)
      store.create("bq_fresh",
        Similarity.bqEncodeCentered(corpus, "embedding", "vec_id", thr))
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head.getSeq[Float](0).toArray
      def hits(name: String) = Similarity.bqSearchStoredCentered(
        store.read(spark, name), corpus, "embedding", "vec_id", qv, thr)
        .collect().map(_.toSeq).toSeq
      assert(hits("bq") == hits("bq_fresh"))
      e.unpersist()
    } finally store.destroy()
  }

  test("codes-only retrains enforce the corpus-cardinality contract") {
    val store = freshStore("graft_rt_contract")
    try {
      val e = emb.cache()
      val c0 = Clustering.trainCentroids(e, 8, 2)
      val (mn0, mx0) = Similarity.sqMinMax(e, "embedding")
      store.create("sq", Similarity.sqAssignEncode(
        e, "embedding", "vec_id", c0, mn0, mx0), partitionBy = Seq("cell_id"))
      val drifted = e.filter(col("vec_id") % 2 === 0)
      val ex = intercept[IllegalArgumentException] {
        Similarity.retrainStoredSq(spark, store, "sq", drifted,
          "embedding", "vec_id", ncells = 4)
      }
      assert(ex.getMessage.contains("retrainStoredSq"))
      Similarity.buildBqIndex(store, "bq", e, "embedding", "vec_id")
      val ex2 = intercept[IllegalArgumentException] {
        Similarity.retrainStoredBq(spark, store, "bq", drifted,
          "embedding", "vec_id")
      }
      assert(ex2.getMessage.contains("retrainStoredBq"))
      // a SAME-CARDINALITY relation with a different id set must also be
      // rejected (the order-independent id digest, not just the count —
      // a count-only check would silently swap in an inconsistent index)
      val shifted = e.withColumn("vec_id", col("vec_id") + 1000000L)
      val ex3 = intercept[IllegalArgumentException] {
        Similarity.retrainStoredSq(spark, store, "sq", shifted,
          "embedding", "vec_id", ncells = 4)
      }
      assert(ex3.getMessage.contains("id digest"))
      // EVEN-MULTIPLICITY adversary: {1,1,2,2} vs {3,3,4,4} — same
      // cardinality, and a plain xor-of-id-hashes digests BOTH to 0
      // (each id appears an even number of times, self-canceling). The
      // digest hashes (id, per-id count) so multiplicity groups can't
      // vanish — this pair must be rejected.
      store.create("sq_dup", e.filter(col("vec_id") < 4)
        .withColumn("vec_id", (col("vec_id") % 2) + 1))
      val counterfeit = e.filter(col("vec_id") < 4)
        .withColumn("vec_id", (col("vec_id") % 2) + 3)
      val ex4 = intercept[IllegalArgumentException] {
        Similarity.retrainStoredSq(spark, store, "sq_dup", counterfeit,
          "embedding", "vec_id", ncells = 4)
      }
      assert(ex4.getMessage.contains("id digest"))
      e.unpersist()
    } finally store.destroy()
  }

  test("ivfRetrainAdvisor: clean growth exactly 1.0, drifted append recommends") {
    val store = freshStore("graft_radv_spec")
    try {
      val e = emb.cache()
      // clean: router trained on everything it serves
      Similarity.buildIvfIndex(store, "clean", e, "embedding", "vec_id",
        ncells = 8, trainIters = 2)
      val clean = Similarity.ivfRetrainAdvisor(spark, store, "clean",
        "embedding").head()
      assert(clean.getAs[Long]("err_growth_ppm") == 1000000L,
        "an unmutated layout's growth must be EXACTLY 1.0 — baseline " +
          "sidecar and live measurement share one fixed-point kernel")
      assert(!clean.getAs[Boolean]("retrain_recommended"))
      // stale: standing-trained router + 2x-scaled arrivals (the
      // embedder-version-change drift; exact in float32)
      val cents = Similarity.buildIvfIndex(store, "stale",
        e.filter(col("vec_id") % 10 =!= 7), "embedding", "vec_id",
        ncells = 8, trainIters = 2)
      Similarity.insertIntoStoredIvf(store, "stale",
        e.filter(col("vec_id") % 10 === 7)
          .withColumn("embedding",
            transform(col("embedding"), x => x * lit(2.0f))),
        "embedding", "vec_id", cents): Unit
      val stale = Similarity.ivfRetrainAdvisor(spark, store, "stale",
        "embedding").head()
      assert(stale.getAs[Long]("err_growth_ppm") > 1200000L,
        s"2x-scaled arrivals must push error growth past the threshold " +
          s"(got ${stale.getAs[Long]("err_growth_ppm")} ppm)")
      assert(stale.getAs[Boolean]("retrain_recommended"))
      // the baseline sidecar is the STANDING stats — untouched by the
      // frozen-router append (that is what makes it a baseline)
      val base = Similarity.readRouterStats(store, "stale").get
      assert(base.nRows == e.filter(col("vec_id") % 10 =!= 7).count())
      // self-description contract: no router sidecar -> loud failure
      store.create("bare", e.limit(10))
      val ex = intercept[IllegalArgumentException] {
        Similarity.ivfRetrainAdvisor(spark, store, "bare", "embedding")
      }
      assert(ex.getMessage.contains("router"))
      // the loop CLOSES: running the retrain the advisor recommended
      // resets the baseline — the advisor must read growth exactly 1.0
      // again and recommend nothing
      Similarity.retrainStoredIvf(spark, store, "stale", "embedding",
        "vec_id", ncells = 8): Unit
      val after = Similarity.ivfRetrainAdvisor(spark, store, "stale",
        "embedding").head()
      assert(after.getAs[Long]("err_growth_ppm") == 1000000L,
        "retrain must reset the advisor baseline")
      assert(!after.getAs[Boolean]("retrain_recommended"))
      e.unpersist()
    } finally store.destroy()
  }

  test("stored SQ / PQ layouts are self-describing: sidecar artifacts reproduce the search") {
    val store = freshStore("graft_selfdesc_spec")
    try {
      val e = emb.cache()
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head.getSeq[Float](0).map(_.toDouble).toArray
      // SQ: build returns in-memory artifacts; a FRESH store handle must
      // search identically from the sidecar alone
      val (c0, mn0, mx0) = Similarity.buildIvfSqIndex(
        store, "sq", e, "embedding", "vec_id")
      val reopened = graft.store.VectorStore(store.root)
      val (c1, mn1, mx1) = Similarity.readSqQuantizer(reopened, "sq").get
      assert(c1.map(_.toSeq).toSeq == c0.map(_.toSeq).toSeq)
      assert(mn1.toSeq == mn0.toSeq && mx1.toSeq == mx0.toSeq)
      def sqSearch(c: Array[Array[Float]], mn: Array[Double], mx: Array[Double]) =
        Similarity.sqSearchStored(
          reopened.read(spark, "sq").filter(col("vec_id") =!= 0),
          "vec_id", c, mn, mx, qv, k = 5, nprobe = 4)
          .collect().map(_.toSeq).toSeq
      assert(sqSearch(c1, mn1, mx1) == sqSearch(c0, mn0, mx0))
      // PQ: router + codebooks round-trip through the sidecar
      val (pc0, cb0) = Similarity.buildIvfPqIndex(
        store, "pq", e, "embedding", "vec_id", ncells = 8)
      val (pc1, cb1) = Similarity.readPqCodebook(reopened, "pq").get
      assert(pc1.map { case (i, v) => (i, v.toSeq) }.toSeq ==
        pc0.map { case (i, v) => (i, v.toSeq) }.toSeq)
      assert((cb1.m, cb1.dsub, cb1.ksub) == (cb0.m, cb0.dsub, cb0.ksub))
      assert(cb1.cents.map(_.map(_.toSeq).toSeq).toSeq ==
        cb0.cents.map(_.map(_.toSeq).toSeq).toSeq)
      // retrain re-persists: the sidecar must describe the NEW geometry
      val (c2, mn2, mx2) = Similarity.retrainStoredSq(
        spark, store, "sq", e, "embedding", "vec_id", ncells = 4, iters = 2)
      val (c3, mn3, mx3) = Similarity.readSqQuantizer(reopened, "sq").get
      assert(c3.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
      assert(mn3.toSeq == mn2.toSeq && mx3.toSeq == mx2.toSeq)
      assert(c3.length == 4, "sidecar still describes the OLD geometry")
      e.unpersist()
    } finally store.destroy()
  }
}
