package graft

import graft.functions.VectorFunctions._
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Binary-quantization top-k and IVF range search (the round-11 ANN tail):
  * recall pins vs exact, the exhaustive-rerank identity (shortlist =
  * corpus ⇒ BQ is exact), plan shape (Hamming pre-rank must be a
  * TakeOrderedAndProject over the signature projection), and the
  * probed-cells ⊆ / = relationships of the radius query.
  */
class BqRangeSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sf)
  private def qv: Array[Float] =
    emb.filter(col("vec_id") === 0).select("embedding").as[Array[Float]].head()
  private def corpus = emb.filter(col("vec_id") =!= 0)

  private def exactTop(k: Int): Seq[Long] = corpus
    .withColumn("cosine", round(cosine(col("embedding"), vecLit(qv)), 6))
    .orderBy(col("cosine").desc, col("vec_id"))
    .limit(k).select("vec_id").as[Long].collect().toSeq

  test("exhaustive rerank (shortlist = corpus) equals exact top-k — ids AND cosines") {
    val n = corpus.count().toInt
    val bq = Similarity.bqTopK(corpus, "embedding", "vec_id", qv,
      k = 10, rerank = (n + 9) / 10 + 1).collect()
    val exact = corpus
      .withColumn("cosine", round(cosine(col("embedding"), vecLit(qv)), 6))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10).select("vec_id", "cosine").collect()
    assert(bq.map(_.getLong(0)).toSeq == exact.map(_.getLong(0)).toSeq)
    assert(bq.map(_.getDouble(2)).toSeq == exact.map(_.getDouble(1)).toSeq)
  }

  test("BQ recall@10 vs exact at the gate config (rerank=4); deterministic") {
    val a = Similarity.bqTopK(corpus, "embedding", "vec_id", qv, k = 10, rerank = 4)
      .collect()
    val b = Similarity.bqTopK(corpus, "embedding", "vec_id", qv, k = 10, rerank = 4)
      .collect()
    assert(a.toSeq == b.toSeq, "BQ rerun must be bit-identical")
    val recall = a.map(_.getLong(0)).toSet.intersect(exactTop(10).toSet).size / 10.0
    info(f"BQ recall@10 vs exact (rerank=4, 64-bit signatures): $recall%.2f")
    assert(recall >= 0.5, f"BQ recall collapsed: $recall%.2f")
  }

  test("Hamming pre-rank is a TakeOrderedAndProject; hamming values are sane") {
    val shortlisted = Similarity.bqTopK(corpus, "embedding", "vec_id", qv,
      k = 10, rerank = 4)
    val plan = shortlisted.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered in:\n$plan")
    val rows = shortlisted.collect()
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 64))
    // the top hit by cosine should be Hamming-close to the query: sign
    // agreement is what the pre-rank banks on
    assert(rows.head.getInt(1) <= 32,
      s"top cosine hit unexpectedly Hamming-far: ${rows.head.getInt(1)}")
  }

  test("BQ incremental append: untouched files byte-identical; search == full rebuild; refusals") {
    import graft.operators.Similarity
    val rootInc = java.nio.file.Files.createTempDirectory("bqinc").toString
    val rootFull = java.nio.file.Files.createTempDirectory("bqfull").toString
    val storeInc = graft.store.VectorStore(rootInc)
    val storeFull = graft.store.VectorStore(rootFull)
    try {
      val standing = corpus.filter(col("vec_id") % 10 =!= 7)
      val arrivals = corpus.filter(col("vec_id") % 10 === 7)
      Similarity.buildBqIndex(storeInc, "bq", standing, "embedding", "vec_id")
      val before = storeInc.dataFiles("bq")
        .map(f => f.getPath -> (f.length, f.lastModified)).toMap
      val n = Similarity.insertIntoStoredBq(storeInc, "bq", arrivals,
        "embedding", "vec_id")
      assert(n == arrivals.count())
      // O(batch): pre-existing signature files untouched by the append
      storeInc.dataFiles("bq").foreach { f =>
        before.get(f.getPath).foreach(meta =>
          assert((f.length, f.lastModified) == meta,
            s"pre-existing file ${f.getPath} rewritten by the append"))
      }
      assert(storeInc.dataFiles("bq").size > before.size, "append added no files")
      // maintained index == from-scratch full build, row for row
      Similarity.buildBqIndex(storeFull, "bq", corpus, "embedding", "vec_id")
      val inc = Similarity.bqSearchStored(storeInc.read(spark, "bq"), corpus,
        "embedding", "vec_id", qv, k = 10, rerank = 4).collect().toSeq
      val full = Similarity.bqSearchStored(storeFull.read(spark, "bq"), corpus,
        "embedding", "vec_id", qv, k = 10, rerank = 4).collect().toSeq
      assert(inc == full, "maintained BQ index diverged from a full rebuild")
      // contract refusals: batch-internal duplicate, existing id
      intercept[IllegalArgumentException] {
        Similarity.insertIntoStoredBq(storeInc, "bq",
          arrivals.limit(1).unionAll(arrivals.limit(1)), "embedding", "vec_id")
      }
      intercept[IllegalArgumentException] {
        Similarity.insertIntoStoredBq(storeInc, "bq", arrivals.limit(1),
          "embedding", "vec_id")
      }
    } finally { storeInc.destroy(); storeFull.destroy() }
  }

  test("stored BQ search == inline BQ search, row for row") {
    val root = java.nio.file.Files.createTempDirectory("graft_bqspec").toString
    val store = graft.store.VectorStore(root)
    try {
      Similarity.buildBqIndex(store, "sigs", corpus, "embedding", "vec_id")
      val stored = Similarity.bqSearchStored(store.read(spark, "sigs"), corpus,
        "embedding", "vec_id", qv, k = 10, rerank = 4).collect()
      val inline = Similarity.bqTopK(corpus, "embedding", "vec_id", qv,
        k = 10, rerank = 4).collect()
      assert(stored.toSeq == inline.toSeq)
    } finally store.destroy()
  }

  test("batch BQ == per-query single BQ, query by query; one scan posture") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val coll = emb.filter(col("vec_id") >= 5)
    val batch = Similarity.bqTopKMany(coll, "embedding", "vec_id",
        queries, "q_id", "q_vec", k = 10, rerank = 4)
      .orderBy("q_id", "rank").collect()
    val singles = (0L until 5L).flatMap { qid =>
      val v = emb.filter(col("vec_id") === qid)
        .select("embedding").as[Array[Float]].head()
      Similarity.bqTopK(coll, "embedding", "vec_id", v, k = 10, rerank = 4)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, r.getLong(0), r.getInt(1), r.getDouble(2), i + 1) }
    }
    assert(batch.map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
      r.getDouble(3), r.getInt(4))).toSeq == singles,
      "batch rows must equal the concatenation of single-query bqTopK runs")
    // the query side must broadcast: no shuffle should carry the corpus
    // signature scan into the cross join
    val plan = Similarity.bqTopKMany(coll, "embedding", "vec_id",
      queries, "q_id", "q_vec", k = 10, rerank = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query side not broadcast:\n$plan")
  }

  test("multi-probe LSH: bucket budget respected; recall monotone in nflip") {
    val qv0 = emb.filter(col("vec_id") === 0).select("embedding")
      .as[Array[Float]].head()
    val exact10 = emb
      .withColumn("cosine", round(cosine(col("embedding"), vecLit(qv0)), 6))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10).select("vec_id").as[Long].collect().toSet
    def run(nflip: Int) = Similarity.lshMultiProbeTopK(emb, "embedding",
      "vec_id", qv0, k = 10, nBits = 6, nflip = nflip).collect()
    val base = run(0)
    assert(base.map(_.getLong(1)).distinct.length == 1,
      "nflip=0 must probe exactly the query's own bucket")
    val multi = run(3)
    assert(multi.map(_.getLong(1)).distinct.length <= 4,
      "nflip=3 probes at most 4 buckets")
    // candidate set grows monotonically, and exact ranking over a
    // superset can only gain exact-top-k members — recall is monotone
    def recall(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getLong(0)).count(exact10.contains)
    assert(recall(multi) >= recall(base),
      s"recall regressed: base ${recall(base)}, multi ${recall(multi)}")
    // the query vector itself (in corpus, in its own bucket) is rank 1
    assert(multi.head.getLong(0) == 0L && multi.head.getDouble(2) == 1.0)
  }

  test("federated BQ: single arm == bqSearchStored; query's own shard wins rank 1") {
    val root = java.nio.file.Files.createTempDirectory("graft_fedspec").toString
    val store = graft.store.VectorStore(root)
    try {
      // identity: one arm over the whole corpus == the stored single-
      // collection search (same shortlist, same rerank)
      Similarity.buildBqIndex(store, "all", corpus, "embedding", "vec_id")
      val fed1 = Similarity.bqSearchFederated(spark, store,
          Seq(("all", "all", corpus)), "embedding", "vec_id", qv,
          k = 10, rerank = 4)
        .select("vec_id", "hamming", "cosine").collect().toSeq
      val single = Similarity.bqSearchStored(store.read(spark, "all"), corpus,
        "embedding", "vec_id", qv, k = 10, rerank = 4).collect().toSeq
      assert(fed1 == single, "one-arm federation diverged from bqSearchStored")
      // two-arm split including the query vector: its own shard must
      // surface it at rank 1 with cosine 1.0
      val c0 = emb.filter(col("vec_id") % 2 === 0)
      val c1 = emb.filter(col("vec_id") % 2 === 1)
      Similarity.buildBqIndex(store, "c0", c0, "embedding", "vec_id")
      Similarity.buildBqIndex(store, "c1", c1, "embedding", "vec_id")
      val fed = Similarity.bqSearchFederated(spark, store,
        Seq(("c0", "c0", c0), ("c1", "c1", c1)),
        "embedding", "vec_id", qv, k = 10, rerank = 4).collect()
      assert(fed.head.getString(0) == "c0" && fed.head.getLong(1) == 0L &&
        fed.head.getDouble(3) == 1.0,
        s"query vector not recovered from its shard: ${fed.head}")
      assert(fed.map(_.getString(0)).distinct.length == 2,
        "both shards should contribute to the fused top-10 on this corpus")
    } finally store.destroy()
  }

  test("range search: probed subset of the exact radius set; nprobe=all equals it") {
    val exactRadius = emb
      .withColumn("cosine", round(cosine(col("embedding"), vecLit(qv)), 6))
      .filter(col("cosine") >= 0.20 && col("vec_id") =!= 0)
      .select("vec_id").as[Long].collect().toSet
    val probed = Similarity.ivfRangeSearch(emb, "embedding", "vec_id", qv,
        minCosine = 0.20, ncells = 16, nprobe = 4)
      .filter(col("vec_id") =!= 0)
      .select("vec_id").as[Long].collect().toSet
    assert(probed.subsetOf(exactRadius),
      s"probed radius result contains out-of-band ids: ${probed -- exactRadius}")
    info(f"radius recall at nprobe 4/16: ${probed.size}/${exactRadius.size}")
    val all = Similarity.ivfRangeSearch(emb, "embedding", "vec_id", qv,
        minCosine = 0.20, ncells = 16, nprobe = 16)
      .filter(col("vec_id") =!= 0)
      .select("vec_id").as[Long].collect().toSet
    assert(all == exactRadius,
      "probing every cell must recover the exact radius set")
  }

  test("range search result carries only above-threshold cosines from probed cells") {
    val out = Similarity.ivfRangeSearch(emb, "embedding", "vec_id", qv,
      minCosine = 0.20, ncells = 16, nprobe = 4).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getDouble(2) >= 0.20))
    assert(out.map(r => r.getInt(1)).distinct.length <= 4,
      "results must come from at most nprobe cells")
  }
}
