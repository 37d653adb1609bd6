package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),   // near dup
    (4L, "completely different content about spark engines"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content; min id is canonical") {
    val out = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id", "group_size", "canonical_id", "is_duplicate")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(out.contains((1L, 2L, 1L, false)))
    assert(out.contains((2L, 2L, 1L, true)))
    assert(out.contains((3L, 1L, 3L, false)))
  }

  test("minhash LSH finds exact and near dups, never false positives after verify") {
    val pairs = Dedup.minhashLsh(docs.filter($"doc_id" =!= 5), "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical => jaccard 1, always recalled
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("exact jaccard join matches brute-force jaccard") {
    val out = Dedup.ngramJaccardJoin(docs.filter($"doc_id" =!= 5), "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList.sortBy(p => (p._1, p._2))
    assert(out.map(p => (p._1, p._2)) == List((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out.head._3 == 1.0)
  }

  test("size-ratio prune keeps qualifying pairs and drops impossible ones") {
    val rng = new scala.util.Random(7)
    def rand(n: Int) = (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val base = rand(200)
    val d2 = Seq(
      (1L, base),
      (2L, base + " tail"),   // near-identical => must survive the prune
      (3L, rand(40))          // tiny distinct set => pruned/impossible vs 200-char docs
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardJoin(d2, "text", "doc_id", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash: identical docs collide, near dups within small hamming") {
    val pairs = Dedup.simhashPairs(docs.filter($"doc_id" =!= 5), "text", "doc_id", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList
    val identical = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(identical.exists(_._3 == 0))
  }

  test("simhash: duplicate id values never self-pair; INT ids keep their type (both paths)") {
    // 3 rows, 2 sharing id value 1 with identical text: the banded kernel
    // must NOT emit a (1,1) self-pair, matching the join path's id_a < id_b
    val dup = Seq(
      (1, "the quick brown fox jumps over the lazy dog"),
      (1, "the quick brown fox jumps over the lazy dog"),
      (2, "the quick brown fox jumps over the lazy cat")
    ).toDF("doc_id", "text")
    val kernel = Dedup.simhashPairs(dup, "text", "doc_id", maxHamming = 10)
    assert(kernel.schema("id_a").dataType == org.apache.spark.sql.types.IntegerType,
      "INT ids must not silently widen to LONG")
    val kPairs = kernel.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(!kPairs.exists(p => p._1 == p._2), s"self-pair emitted: $kPairs")
    // generic (string-id) path on the same data agrees pair-for-pair
    val dupS = dup.withColumn("doc_id", concat(lit("d"), col("doc_id")))
    val jPairs = Dedup.simhashPairs(dupS, "text", "doc_id", maxHamming = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!jPairs.exists(p => p._1 == p._2))
    assert(kPairs.map { case (a, b) => (s"d$a", s"d$b") } == jPairs,
      "kernel and join paths diverge")
  }

  test("connected components: transitive chains merge, singletons stay, min id wins") {
    import spark.implicits._
    // chain 10-20-30 (10~20 and 20~30 only), pair 40-50, singleton 60
    val pairs = Seq((20L, 10L), (20L, 30L), (50L, 40L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 40L, 50L -> 40L),
      s"got $comp")
    val docs = Seq(
      (10L, "aaaa"), (20L, "bbbb"), (30L, "cccc"), (60L, "solo")
    ).toDF("doc_id", "text")
    // clusters() over docs with NO near-dup pairs: everyone is a singleton
    val solo = Dedup.clusters(docs, "text", "doc_id", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(solo.forall { case (id, cid, sz, canon) => cid == id && sz == 1L && canon })
  }

  test("keepBest: highest score wins per cluster, id breaks ties, singletons kept") {
    import spark.implicits._
    // cluster 1 = {1,2,3} (3 is best), cluster 4 = {4,5} (exact score tie
    // — lowest id must win), 6 a singleton
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L)).toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 0.5), (2L, 0.7), (3L, 0.9), (4L, 0.8), (5L, 0.8),
      (6L, 0.1)).toDF("doc_id", "quality")
    val got = Dedup.keepBest(clusters, scores, "doc_id", "quality")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got == Map(1L -> false, 2L -> false, 3L -> true,
      4L -> true, 5L -> false, 6L -> true), s"got $got")
    // invariant on real data: exactly one keeper per cluster, and its
    // quality is the cluster max
    val docs = Tables.documents(spark, sf)
    val cl = Dedup.clusters(docs, "text", "doc_id", threshold = 0.8)
      .select("doc_id", "cluster_id")
    val q = graft.text.TextAnalysis.textStats(docs).select(col("doc_id"), col("quality"))
    val out = Dedup.keepBest(cl, q, "doc_id", "quality")
    val perCluster = out.groupBy("cluster_id")
      .agg(count(when(col("is_kept"), 1)).as("n_kept"),
        max(col("quality")).as("qmax"),
        max(when(col("is_kept"), col("quality"))).as("qkept"))
      .collect()
    assert(perCluster.forall(_.getLong(1) == 1L), "not exactly one keeper per cluster")
    assert(perCluster.forall(r => r.getDouble(2) == r.getDouble(3)),
      "a keeper is not its cluster's max quality")
  }

  test("leak-free split: near-dup pairs never cross folds; both folds populated") {
    import spark.implicits._
    val d = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, d)
    val folds = GraftQueries.all("pipeline_split_leakfree")(spark, d)
      .select("doc_id", "fold").as[(Long, String)].collect().toMap
    assert(folds.values.toSet == Set("train", "val"), "a fold is empty")
    // THE invariant: no near-dup pair spans the split (eval contamination)
    val pairs = Dedup.minhashLsh(docs, "text", "doc_id", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture has no near-dup pairs — invariant untested")
    pairs.foreach { case (a, b) =>
      assert(folds(a) == folds(b), s"near-dups $a/$b split across folds")
    }
  }

  test("embedding near-dup with cosine threshold") {
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0.99f, 0.1f, 0f)),
      (3L, Array(0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(vecs, "embedding", "vec_id", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)))
  }

  test("decontaminate: flags docs sharing n-grams with the benchmark, counts distinct hits") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a verbatim copy the quick brown fox jumps high"),
      (2L, "completely unrelated words with nothing shared here"),
      (3L, "the quick brown fox appears twice the quick brown fox")
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, bench, "text", "doc_id", n = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // doc 1 (9 tokens -> 6 grams): "the quick brown fox" + "quick brown
    // fox jumps" both in benchmark
    assert(out(1L) == ((6L, 2L, true)), s"got ${out(1L)}")
    // doc 2: 7 tokens -> 4 distinct 4-grams, zero hits
    assert(out(2L) == ((4L, 0L, false)), s"got ${out(2L)}")
    // doc 3 (10 tokens, "the quick brown fox" twice): the repeat dedups in
    // n_grams (7 raw -> 6 distinct) and its hit counts ONCE
    assert(out(3L) == ((6L, 1L, true)), s"got ${out(3L)}")
  }

  test("decontaminateBloom is bit-identical to decontaminate at sf0.001") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val exact = Dedup.decontaminate(corpus, bench, "text", "doc_id", n = 3)
      .orderBy("doc_id").collect().toSeq
    val bloom = Dedup.decontaminateBloom(corpus, bench, "text", "doc_id", n = 3)
      .orderBy("doc_id").collect().toSeq
    assert(bloom == exact)
    assert(exact.exists(_.getBoolean(3)), "degenerate fixture: nothing contaminated")
    assert(exact.exists(!_.getBoolean(3)), "degenerate fixture: everything contaminated")
  }

  test("decontaminateBloom exactness does not depend on the filter: saturated fpp stays exact") {
    // fpp -> ~0.5 makes the Bloom gate pass a large share of clean grams;
    // the confirm join must kill every false positive, so the answer is
    // unchanged — the filter only moves work, never the result
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a verbatim copy the quick brown fox jumps high"),
      (2L, "completely unrelated words with nothing shared here"),
      (3L, "the quick brown fox appears twice the quick brown fox")
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminateBloom(corpus, bench, "text", "doc_id",
        n = 4, fpp = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) == ((6L, 2L, true)), s"got ${out(1L)}")
    assert(out(2L) == ((4L, 0L, false)), s"got ${out(2L)}")
    assert(out(3L) == ((6L, 1L, true)), s"got ${out(3L)}")
  }

  test("substringSpans matches a brute-force scalar reference on a random small-vocab corpus") {
    val rnd = new scala.util.Random(0x5eed6)
    val nGram = 3
    val corpus = (0 until 120).map { i =>
      val n = 1 + rnd.nextInt(30)
      (i.toLong, Seq.fill(n)("w" + rnd.nextInt(6)).mkString(" "))
    }
    // independent scalar reference: explicit span lists, global counts,
    // sorted-interval merge — no Spark expression code shared
    val toks = corpus.map { case (id, t) => id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val spans = toks.flatMap { case (id, ts) =>
      (0 to ts.size - nGram).map(s => (id, s, ts.slice(s, s + nGram).mkString(" ")))
    }
    val occ = spans.groupBy(_._3).map { case (k, v) => k -> v.size }
    val expected = toks.flatMap { case (id, ts) =>
      val dup = spans.filter(p => p._1 == id && occ(p._3) > 1).map(_._2).sorted
      if (dup.isEmpty) None
      else {
        var intervals = List.empty[(Int, Int)]
        dup.foreach { s =>
          val e = s + nGram - 1
          intervals match {
            case (a, b) :: rest if s <= b => intervals = (a, math.max(b, e)) :: rest
            case _ => intervals = (s, e) :: intervals
          }
        }
        val covered = intervals.map { case (a, b) => b - a + 1 }.sum
        Some(id -> ((ts.size.toLong, dup.size.toLong, intervals.size.toLong,
          covered.toLong, math.floor(covered.toDouble / ts.size * 1e6 + 0.5) / 1e6)))
      }
    }.toMap
    val got = Dedup.substringSpans(corpus.toDF("doc_id", "text"), "text", "doc_id", n = nGram)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got == expected)
  }

  test("connectedComponents: string-id chain converges fully (non-numeric convergence probe)") {
    // a 3-hop chain needs multiple propagation rounds: the numeric sum
    // probe would see NULL casts and stop after one round
    val pairs = Seq(("b", "a"), ("c", "b"), ("d", "c")).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a"), s"got $out")
  }

  test("connectedComponents: distributed tier (localMaxEdges=0) matches driver union-find") {
    import spark.implicits._
    // deterministic pseudo-random graph: ~120 edges over 80 nodes, mixed
    // components including a long chain (stresses contraction depth)
    val rnd = new scala.util.Random(42)
    val chain = (0 until 20).map(i => (i.toLong, (i + 1).toLong))
    val random = (1 to 100).map { _ =>
      (30L + rnd.nextInt(50), 30L + rnd.nextInt(50))
    }.filter { case (a, b) => a != b }
    val pairs = (chain ++ random).toDF("id_a", "id_b")
    val viaDriver = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set("graft.cc.localMaxEdges", "0")
    try {
      val viaDistributed = Dedup.connectedComponents(pairs.repartition(7), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaDistributed == viaDriver,
        s"tier divergence: ${viaDistributed.toSet.diff(viaDriver.toSet)}")
      // string ids through the distributed path too (no numeric kernel shortcut)
      val sPairs = Seq(("b", "a"), ("c", "b"), ("d", "c"), ("y", "x")).toDF("id_a", "id_b")
      val s = Dedup.connectedComponents(sPairs.repartition(3), "id_a", "id_b")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(s == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
        "x" -> "x", "y" -> "x"), s"got $s")
    } finally spark.conf.unset("graft.cc.localMaxEdges")
  }

  test("minhashLshIncremental: finds new-vs-existing dups only, never existing-vs-existing") {
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // dup pair INSIDE existing
      (3L, "completely different content about spark engines here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 1 and 2
      (11L, "fresh unique never before seen writing right here now")
    ).toDF("doc_id", "text")
    val out = Dedup.minhashLshIncremental(batch, existing, "text", "doc_id", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 1L), (10L, 2L)), s"got $out")
  }

  test("signature index: indexed incremental check matches the inline form and never scans the corpus") {
    val scratch = java.nio.file.Files.createTempDirectory("graft_sig_idx").toString
    try {
      val docs = Tables.documents(spark, sf)
      val existing = docs.filter(col("doc_id") % 10 =!= 7)
      // localize the batch as a micro-batch would arrive (NOT a scan of
      // the corpus file — so any corpus scan in the indexed plan below
      // is a real leak, not the batch side)
      val batchRows = docs.filter(col("doc_id") % 10 === 7)
        .select("doc_id", "text").collect()
      val batch = spark.createDataFrame(
        java.util.Arrays.asList(batchRows.toSeq: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType))))
      val store = graft.store.VectorStore(scratch)
      Dedup.buildSignatureIndex(store, "nd", existing, "text", "doc_id")
      val bandsIdx = store.read(spark, "nd_bands")
      val shinglesIdx = store.read(spark, "nd_shingles")
      val indexed = Dedup.minhashLshIncrementalIndexed(
        batch, bandsIdx, shinglesIdx, "text", "doc_id", threshold = 0.8)
      // per-batch plan reads the STORED index, never the standing corpus:
      // the only file scans besides the batch's own are under the store
      // root — this is the "batch N does not re-shingle the corpus" pin
      val scans = indexed.queryExecution.executedPlan.toString()
        .linesIterator.filter(_.contains("FileScan")).mkString("\n")
      assert(scans.contains("nd_bands") && scans.contains("nd_shingles"),
        s"expected index scans, got:\n$scans")
      assert(!scans.contains("documents.parquet"),
        s"standing corpus must not be re-read per batch:\n$scans")
      val a = indexed.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val b = Dedup.minhashLshIncremental(
          batch, existing, "text", "doc_id", threshold = 0.8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(a == b, s"indexed vs inline divergence: ${a.diff(b)} / ${b.diff(a)}")
      assert(a.nonEmpty, "fixture slice should contain at least one near-dup pair")
    } finally {
      graft.store.VectorStore(scratch).destroy()
    }
  }

  test("signature index append: the nightly loop — day-2 batch sees day-1 commits through the grown index") {
    val scratch = java.nio.file.Files.createTempDirectory("graft_sig_app").toString
    try {
      val standing = Seq(
        (1L, "the quick brown fox jumps over the lazy dog tonight"),
        (2L, "completely different content about spark engines here")
      ).toDF("doc_id", "text")
      val day1 = Seq(
        (10L, "fresh unique never before seen writing right here now")
      ).toDF("doc_id", "text")
      val day2 = Seq(
        (20L, "fresh unique never before seen writing right here now"), // dup of 10
        (21L, "the quick brown fox jumps over the lazy dog tonight")    // dup of 1
      ).toDF("doc_id", "text")
      val store = graft.store.VectorStore(scratch)
      Dedup.buildSignatureIndex(store, "nd", standing, "text", "doc_id")
      def check(batch: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        Dedup.minhashLshIncrementalIndexed(batch,
            store.read(spark, "nd_bands"), store.read(spark, "nd_shingles"),
            "text", "doc_id", threshold = 0.8)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(check(day1) == Set.empty, "day-1 batch is clean vs the standing corpus")
      // commit day 1: its signatures join the index
      Dedup.appendToSignatureIndex(store, "nd", day1, "text", "doc_id")
      // day 2 finds dups against BOTH the original corpus and day 1
      assert(check(day2) == Set((20L, 10L), (21L, 1L)))
      // the sidecar pins the layout's banding identity: readable back,
      // and a mismatched-banding append fails LOUDLY instead of writing
      // keys no query at the build parameters would ever match
      assert(Dedup.signatureIndexParams(store, "nd").contains((5, 32, 4)))
      intercept[IllegalArgumentException] {
        Dedup.appendToSignatureIndex(store, "nd", day2, "text", "doc_id",
          bands = 16, rowsPerBand = 8)
      }
      intercept[IllegalArgumentException] {
        Dedup.appendToSignatureIndex(store, "nd", day2, "text", "doc_id",
          shingleSize = 7)
      }
    } finally {
      graft.store.VectorStore(scratch).destroy()
    }
  }

  test("substringSpans: merges overlapping dup windows, counts within-doc repeats, splits disjoint intervals") {
    val corpus = Seq(
      (1L, "a b c d e f g h"),            // shares windows a-b-c, b-c-d, c-d-e with doc 2
      (2L, "a b c d e x y z"),
      (3L, "p q r s t u v w"),            // all-unique: no report row
      (4L, "m m m m m m"),                // 4 identical within-doc windows -> full coverage
      (5L, "a b c w1 w2 w3 w4 c d e")     // two disjoint dup intervals
    ).toDF("doc_id", "text")
    val out = Dedup.substringSpans(corpus, "text", "doc_id", n = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // (n_tokens, n_dup_spans, n_intervals, dup_tokens, dup_ratio)
    assert(out(1L) == ((8L, 3L, 1L, 5L, 0.625)), s"got ${out(1L)}")
    assert(out(2L) == ((8L, 3L, 1L, 5L, 0.625)), s"got ${out(2L)}")
    assert(!out.contains(3L))
    assert(out(4L) == ((6L, 4L, 1L, 6L, 1.0)), s"got ${out(4L)}")
    assert(out(5L) == ((10L, 2L, 2L, 6L, 0.6)), s"got ${out(5L)}")
  }

  test("bandingAdvisor: 16x8 at threshold 0.8; steeper curve at higher floor-clearing rows; estimates ordered") {
    val d = Tables.documents(spark, sf)
    val row = Dedup.bandingAdvisor(d, "text", "doc_id", threshold = 0.8,
      nHashes = 128).head()
    val get = (c: String) => row.getLong(row.fieldIndex(c))
    // s-curve arithmetic: at t=0.8 the largest rows-per-band clearing a
    // 0.9 recall floor over 128 hashes is 8 (p = 0.947); 16 bands
    assert(row.getInt(row.fieldIndex("bands")) == 16)
    assert(row.getInt(row.fieldIndex("rows_per_band")) == 8)
    assert(get("p_threshold_mu") >= 900000L && get("p_threshold_mu") <= 1000000L)
    // the whole point: recommended banding slashes the background
    // candidate stream vs the 32x4 default on this low-entropy corpus
    assert(get("p_background_mu") < get("p_background_default_mu"))
    assert(get("est_candidates") <= get("est_candidates_default"))
    assert(get("bg_jaccard_mu") > 0L && get("bg_jaccard_mu") < 500000L,
      s"background jaccard should be moderate, got ${get("bg_jaccard_mu")}")
    // a LOWER threshold needs a shallower curve: rows-per-band shrinks
    val low = Dedup.bandingAdvisor(d, "text", "doc_id", threshold = 0.5,
      nHashes = 128).head()
    assert(low.getInt(low.fieldIndex("rows_per_band")) < 8)
    // a BIGGER hash budget keeps the 8-row curve and doubles the bands —
    // 32x8 is what cleanCorpusDecisions runs (p(0.8)=0.997 recall
    // headroom; a real sf0.1 pair at j=0.8298 needs it — see the
    // cleanCorpusDecisions scaladoc)
    val big = Dedup.bandingAdvisor(d, "text", "doc_id", threshold = 0.8,
      nHashes = 256, defaultBands = 64, defaultRowsPerBand = 4).head()
    assert(big.getInt(big.fieldIndex("bands")) == 32)
    assert(big.getInt(big.fieldIndex("rows_per_band")) == 8)
  }

  test("minhashLshAuto executes chooseBanding's pick; pairs equal the explicit form") {
    val d = Tables.documents(spark, sf)
    assert(Dedup.chooseBanding(0.8, 256) == ((32, 8)))
    assert(Dedup.chooseBanding(0.8, 128) == ((16, 8)))
    // at t=0.5 even 4-row bands miss the floor (p=0.873) -> 64x2
    assert(Dedup.chooseBanding(0.5, 128) == ((64, 2)))
    // higher threshold -> steeper curve (rows-per-band monotone up)
    val rows = Seq(0.3, 0.5, 0.7, 0.9).map(t => Dedup.chooseBanding(t, 256)._2)
    assert(rows == rows.sorted, s"rows-per-band not monotone in threshold: $rows")
    val auto = Dedup.minhashLshAuto(d, "text", "doc_id", threshold = 0.8)
    val row = auto.head()
    assert(row.getInt(row.fieldIndex("bands")) == 32)
    assert(row.getInt(row.fieldIndex("rows_per_band")) == 8)
    val a = auto.select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val explicit = Dedup.minhashLsh(d, "text", "doc_id",
        bands = 32, rowsPerBand = 8, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == explicit)
    assert(a.nonEmpty)
  }

  test("ipow matches math.pow to double precision and is exactly reproducible") {
    for (x <- Seq(0.0, 0.172902, 0.5, 0.8, 0.999999, 1.0); n <- Seq(1, 2, 4, 7, 8, 16, 32, 128)) {
      val got = Dedup.ipow(x, n)
      assert(math.abs(got - math.pow(x, n)) <= 1e-12 * math.max(1.0, math.pow(x, n)),
        s"ipow($x,$n)=$got vs pow=${math.pow(x, n)}")
      assert(got == Dedup.ipow(x, n)) // bit-stable
    }
  }

  test("substringScrub cuts exactly the covered tokens from ALL occurrences; others untouched") {
    val corpus = Seq(
      (1L, "a b c d e f g h"),            // shares a-b-c..c-d-e with doc 2
      (2L, "a b c d e x y z"),
      (3L, "p q r s t u v w"),            // unique: passes through verbatim
      (4L, "m m m m m m"),                // fully covered: scrubs to empty
      (5L, "a b c w1 w2 w3 w4 c d e")     // two disjoint intervals cut
    ).toDF("doc_id", "text")
    val out = Dedup.substringScrub(corpus, "text", "doc_id", n = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((8L, 3L, "f g h")), s"got ${out(1L)}")
    assert(out(2L) == ((8L, 3L, "x y z")), s"got ${out(2L)}")
    assert(out(3L) == ((8L, 8L, "p q r s t u v w")))
    assert(out(4L) == ((6L, 0L, "")), s"got ${out(4L)}")
    assert(out(5L) == ((10L, 4L, "w1 w2 w3 w4")), s"got ${out(5L)}")
    assert(out.size == 5) // one row per doc, scrubbed or not
    // consistency with the report: kept = n_tokens - dup_tokens
    val report = Dedup.substringSpans(corpus, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    out.foreach { case (id, (n, kept, _)) =>
      assert(n - kept == report.getOrElse(id, 0L), s"doc $id")
    }
  }
}
