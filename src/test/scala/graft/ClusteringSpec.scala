package graft

import graft.operators.Clustering
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Deterministic k-means + SemDeDup invariants (the oracle proves the
  * arithmetic end-to-end; these pin the semantic and plan contracts). */
class ClusteringSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("kmeans assignment is the true argmin with lowest-cid tiebreak") {
    val assigned = Clustering.kmeansAssign(emb, k = 8, iters = 2)
      .select(col("vec_id"), col("cluster_id"), col("dist"))
    // brute-force re-derivation: the final centroid set is reproduced by
    // re-running the two Lloyd steps, then every vector's (dist, cid) min
    var cents = Clustering.initCentroids(emb, 8, "vec_id", "embedding")
    for (_ <- 0 until 2) cents = Clustering.lloydStep(emb, cents, "vec_id", "embedding")
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
    val expected = rows.map { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).toArray
      val dists = cents.map { c =>
        var acc = 0.0; var i = 0
        while (i < v.length) { val d = v(i).toDouble - c(i); acc += d * d; i += 1 }
        math.floor(acc * 1e6 + 0.5) / 1e6
      }
      val best = dists.zipWithIndex.minBy { case (d, j) => (d, j) }
      (id, best._2.toLong, best._1)
    }.sortBy(_._1)
    val got = assigned.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == expected.toSeq)
  }

  test("argmin property: 300 random vectors incl. exact ties match a reference loop") {
    // centroid 7 duplicates centroid 6 — every vector ties between them
    // exactly, so the lowest-cid rule is exercised on every row; some
    // vectors sit exactly ON a centroid (dist 0.0)
    val rnd = new scala.util.Random(0x5eed)
    val dim = 16
    val base = Array.fill(7)(Array.fill(dim)(rnd.nextFloat() - 0.5f))
    val cents = base :+ base(6).clone()
    val vecs: Seq[(Long, Seq[Float])] = (0 until 300).map { i =>
      val v = if (i % 7 == 0) cents(i % 8).clone()
              else Array.fill(dim)(rnd.nextFloat() - 0.5f)
      (i.toLong, v.toSeq)
    }
    import spark.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val got = df.withColumn("_a", Clustering.assignStruct(col("embedding"), cents))
      .select(col("vec_id"), col("_a").getField("cid"), col("_a").getField("dist"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    val expected = vecs.map { case (id, v) =>
      val dists = cents.map { c =>
        var acc = 0.0; var i = 0
        while (i < dim) { val d = v(i).toDouble - c(i); acc += d * d; i += 1 }
        math.floor(acc * 1e6 + 0.5) / 1e6
      }
      val best = dists.zipWithIndex.minBy { case (dd, j) => (dd, j) }
      (id, best._2, best._1)
    }.sortBy(_._1)
    assert(got.toSeq == expected)
    assert(got.forall(_._2 != 7), "tie against a duplicate centroid must fall to the lower cid")
  }

  test("every cluster inhabited at harness scale; dist >= 0; ids covered") {
    val a = Clustering.kmeansAssign(emb, k = 8, iters = 2)
    assert(a.count() == emb.count())
    assert(a.filter(col("dist") < 0).isEmpty)
    assert(a.select("cluster_id").distinct().count() == 8)
  }

  test("lloydStep: a centroid with no members is carried unchanged") {
    // a far sentinel centroid attracts nothing; the step must return it
    // bit-identically (the empty-cluster rule the oracle mirrors)
    val cents = Clustering.initCentroids(emb, 8, "vec_id", "embedding")
    val far = Array.fill(cents(0).length)(1e6f)
    val next = Clustering.lloydStep(emb, cents.init :+ far, "vec_id", "embedding")
    assert(next.last.toSeq == far.toSeq)
  }

  test("semantic pairs are a subset of the all-pairs embedding near-dups") {
    val semantic = Clustering.semanticNearDup(emb, k = 8, iters = 2, threshold = 0.35)
      .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val allPairs = graft.operators.Dedup.embeddingNearDup(emb, "embedding", "vec_id", threshold = 0.35)
      .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(semantic.nonEmpty, "gate-scale corpus must produce semantic near-dup pairs")
    assert(semantic.subsetOf(allPairs),
      s"cluster gating invented pairs: ${semantic.diff(allPairs)}")
  }

  test("diverse sample: at most 20 per cluster, ranks contiguous from 1") {
    val s = GraftQueries.all("cluster_diverse_sample")(spark, sf)
    val byCluster = s.collect().groupBy(_.getLong(0))
    assert(byCluster.nonEmpty)
    byCluster.foreach { case (cid, rows) =>
      val ranks = rows.map(_.getLong(2)).sorted
      assert(ranks.length <= 20, s"cluster $cid oversampled")
      assert(ranks.toSeq == (1L to ranks.length).toSeq, s"cluster $cid ranks not contiguous")
    }
  }

  test("cluster gating retains a usable share of the all-pairs near-dups") {
    // SemDeDup's trade: only same-cluster pairs are compared. Measure the
    // recall of that gate against the exact all-pairs relation and pin a
    // floor — if a refactor degrades the clustering badly enough to drop
    // most true pairs, this fails before the oracle (which only checks
    // that the gated result matches the gated definition).
    val semantic = Clustering.semanticNearDup(emb, k = 8, iters = 2, threshold = 0.35).count()
    val allPairs = graft.operators.Dedup.embeddingNearDup(emb, "embedding", "vec_id", 0.35).count()
    val recall = semantic.toDouble / allPairs
    assert(recall >= 0.30, f"cluster-gate recall $recall%.2f below floor (k=8 on gate corpus)")
  }

  test("semantic prune: survivors + pair id_b side partition the corpus") {
    val pairs = Clustering.semanticNearDup(emb, k = 8, iters = 2, threshold = 0.35)
    val droppedIds = pairs.select("id_b").collect().map(_.getLong(0)).toSet
    val survivors = Clustering.semanticPrune(emb, k = 8, iters = 2, threshold = 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val all = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors.union(droppedIds) == all)
    assert(survivors.intersect(droppedIds).isEmpty)
    // keep-lowest-id: every pair's id_a survives unless itself someone's id_b
    val ids_a = pairs.select("id_a").collect().map(_.getLong(0)).toSet
    assert((ids_a -- droppedIds).subsetOf(survivors))
  }

  test("semantic decontamination flags only corpus rows, all above threshold") {
    val out = GraftQueries.all("decontaminate_semantic")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) % 97 != 0, "probe leaked into the flagged corpus side")
      assert(r.getLong(1) % 97 == 0, "non-probe id on the probe side")
      assert(r.getDouble(2) >= 0.30)
    }
  }

  test("cluster stats: sizes partition the corpus, mean <= max") {
    val stats = GraftQueries.all("cluster_kmeans_stats")(spark, sf).collect()
    assert(stats.map(_.getLong(1)).sum == emb.count())
    stats.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3) + 1e-9,
        s"cluster ${r.getLong(0)}: mean ${r.getDouble(2)} > max ${r.getDouble(3)}")
    }
  }

  test("streaming assignment equals the batch expression on the arrivals slice") {
    // centroids train on the standing slice; the streamed plan is the
    // unchanged batch projection, so outputs must match row-for-row
    val standing = emb.filter(col("vec_id") % 10 =!= 7)
    var cents = Clustering.initCentroids(standing, 8, "vec_id", "embedding")
    for (_ <- 0 until 2) cents = Clustering.lloydStep(standing, cents, "vec_id", "embedding")
    val batch = emb.filter(col("vec_id") % 10 === 7)
      .withColumn("_a", Clustering.assignStruct(col("embedding"), cents))
      .select(col("vec_id"), col("_a").getField("cid").cast("long").as("cluster_id"),
        col("_a").getField("dist").as("dist"))
      .orderBy("vec_id").collect().toSeq
    val streamed = GraftQueries.all("streaming_cluster_assign")(spark, sf)
      .orderBy("vec_id").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("plan: decontamination broadcasts the bounded probe side") {
    val p = GraftQueries.all("decontaminate_semantic")(spark, sf)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"probe side not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"probe join must not shuffle the corpus:\n$p")
  }

  test("plan: assignment is map-only (no join), centroids ride as literals") {
    val p = GraftQueries.all("cluster_kmeans")(spark, sf)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Join"), s"assignment must not join:\n$p")
    // one exchange only — the final presentation sort (count the detail
    // headers; FormattedMode prints each node in tree AND detail)
    val exchanges = p.linesIterator.count(_.trim.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges <= 1, s"map-only assignment grew $exchanges exchanges:\n$p")
  }

  test("plan: diverse sample rank-filter runs as WindowGroupLimit") {
    // k clusters is few keys; without the map-side group-limit pre-prune
    // each reducer would absorb its whole cluster before ranking
    val p = GraftQueries.all("cluster_diverse_sample")(spark, sf)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("WindowGroupLimit"), s"rank filter not group-limited:\n$p")
  }

  test("plan: semantic dedup shuffles on cluster_id, never all-pairs") {
    val p = GraftQueries.all("dedup_semantic")(spark, sf)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"semantic dedup fell back to all-pairs:\n$p")
  }

  test("giant-cluster guard: oversized clusters take the banded path") {
    // Two engineered mega-clusters (160 and 110 rows — a degenerate
    // boilerplate bucket) plus three small ones. Cap 100 routes both
    // mega-clusters through lshNearDupJoin; small clusters keep the
    // exact all-pairs-within-cluster semantics bit-for-bit.
    import spark.implicits._
    val rnd = new scala.util.Random(0x9c1d)
    val dim = 64
    def rv() = Array.fill(dim)(rnd.nextFloat() - 0.5f)
    val bases = Array.fill(140)(rv())
    // planted near-dups are SCALED copies: identical direction => same
    // hyperplane signs in every LSH table => candidate recall 1.0 there
    val mega0 = bases.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq, 0L) } ++
      (0 until 20).map(i => (1000L + i, bases(i).map(x => x * 1.0002f).toSeq, 0L))
    val mega1 = (0 until 110).map { i =>
      // row 2000 duplicates base 0's direction but sits in ANOTHER
      // cluster — the same-cluster gate must drop that candidate pair
      val v = if (i == 0) bases(0).map(x => x * 1.0003f) else rv()
      (2000L + i, v.toSeq, 1L)
    }
    val small = (2 to 4).flatMap { c =>
      val vs = Array.fill(7)(rv())
      vs.zipWithIndex.map { case (v, i) => (3000L + c * 100 + i, v.toSeq, c.toLong) } :+
        ((3000L + c * 100 + 50, vs(0).map(x => x * 1.0002f).toSeq, c.toLong))
    }
    val assigned = (mega0.toSeq ++ mega1 ++ small).toDF("vec_id", "embedding", "cluster_id")

    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select("cluster_id", "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = keyed(Clustering.semanticNearDupFrom(assigned, 0.95,
      maxClusterSize = Int.MaxValue))
    val guarded = keyed(Clustering.semanticNearDupFrom(assigned, 0.95,
      maxClusterSize = 100))

    // small clusters are untouched by the guard
    assert(guarded.filter(_._1 >= 2) == exact.filter(_._1 >= 2))
    // banded candidates never invent pairs, and every planted
    // same-direction pair is recovered (recall 1.0 on identical signs)
    assert(guarded.subsetOf(exact), s"invented: ${guarded.diff(exact)}")
    (0 until 20).foreach(i => assert(guarded.contains((0L, i.toLong, 1000L + i))))
    // the cross-cluster duplicate candidate (0 vs 2000) must be gated out
    assert(!guarded.exists(p => p._2 == 0L && p._3 == 2000L))
    // bounded per-task enumeration: the banded route's collision groups
    // stay far below the 160-row cluster (the quadratic term the guard
    // exists to break up)
    val megaRows = assigned.filter(col("cluster_id") < 2)
    val maxGroup = graft.operators.Similarity
      .cosineLshBuckets(megaRows, "embedding", nBits = 8, dim = dim)
      .groupBy("lsh_bucket").count().agg(max("count")).head.getLong(0)
    assert(maxGroup <= 60, s"collision group $maxGroup not bounded")
  }
}
