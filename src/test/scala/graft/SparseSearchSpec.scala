package graft

import org.apache.spark.sql.functions._

import graft.operators.SparseSearch

class SparseSearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
  private def newStore() = {
    val root = java.nio.file.Files.createTempDirectory("graft_sparsespec").toString
    graft.store.VectorStore(root)
  }
  private val q = Seq("vector" -> 1.0, "query" -> 0.8, "join" -> 0.5)

  test("stored sparse search == inline topK row for row") {
    val store = newStore()
    try {
      SparseSearch.buildIndex(store, "sp", docs, "text", "doc_id", nBuckets = 8)
      val stored = SparseSearch.searchStored(spark, store, "sp", q, k = 12)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val inline = SparseSearch.topK(
          SparseSearch.encode(docs, "text", "doc_id"), q, k = 12)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(stored == inline, "the stored tier must preserve the inline identity")
      assert(stored.nonEmpty)
    } finally store.destroy()
  }

  test("search scan prunes to the query terms' buckets (PartitionFilters)") {
    val store = newStore()
    try {
      SparseSearch.buildIndex(store, "sp", docs, "text", "doc_id", nBuckets = 8)
      val pruned = SparseSearch.prunedPostings(spark, store, "sp", Seq("vector"))
      val scans = pruned.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "no FileSourceScanExec over the postings")
      scans.foreach { scan =>
        assert(scan.partitionFilters.exists(_.references.exists(_.name == "bucket")),
          s"bucket probe is not a partition filter: ${scan.partitionFilters}")
        assert(scan.selectedPartitions.partitionCount <= 1,
          s"1-term query scanned ${scan.selectedPartitions.partitionCount} buckets")
      }
    } finally store.destroy()
  }

  test("exact integer dot product: hand-checked corpus, zero-idf term kept, absent term contributes nothing") {
    // 4 docs; "common" appears in all (idf = ln 1 = 0 → w_mu = 0, KEPT);
    // "rare" in doc 1 only (idf = ln 4); "pair" in docs 1,2 (idf = ln 2)
    val tiny = Seq(
      (1L, "rare pair common"),
      (2L, "pair common"),
      (3L, "common"),
      (4L, "common common")).toDF("doc_id", "text")
    val enc = SparseSearch.encode(tiny, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    def mu(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    assert(enc((1L, "rare")) == mu(math.log(4.0)), s"got $enc")
    assert(enc((1L, "pair")) == mu(math.log(2.0)))
    assert(enc((3L, "common")) == 0L, "all-docs term carries zero weight but stays")
    assert(enc((4L, "common")) == 0L, "tf=2 × ln(1)=0 is still 0")
    // query hits rare + pair + an absent term; doc1 = rare + pair, doc2 = pair
    val out = SparseSearch.topK(SparseSearch.encode(tiny, "text", "doc_id"),
        Seq("rare" -> 1.0, "pair" -> 0.5, "nosuchterm" -> 9.9), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expect1 = (mu(math.log(4.0)) * 1000000L + mu(math.log(2.0)) * 500000L).toDouble / 1e12
    val expect2 = (mu(math.log(2.0)) * 500000L).toDouble / 1e12
    assert(out(1L) == expect1, s"got $out")
    assert(out(2L) == expect2)
    assert(!out.contains(3L) && !out.contains(4L),
      "docs sharing no query term must not surface")
  }

  test("incremental insert: frozen encoder (build-time df/N), OOV drops, O(batch) bucket append, dup id refused") {
    val store = newStore()
    try {
      val standing = docs.filter($"doc_id" % 10 =!= 7)
      val arriving = docs.filter($"doc_id" % 10 === 7)
      SparseSearch.buildIndex(store, "sp", standing, "text", "doc_id", nBuckets = 8)
      val before = store.dataFileStatuses("sp")
        .map(f => f.getPath.toString -> (f.getLen, f.getModificationTime)).toMap
      SparseSearch.insertInto(store, "sp", arriving, "text", "doc_id")
      // untouched files immutable (appends only ADD files)
      val after = store.dataFileStatuses("sp")
        .map(f => f.getPath.toString -> (f.getLen, f.getModificationTime)).toMap
      before.foreach { case (p, sig) =>
        assert(after.get(p).contains(sig), s"pre-existing file changed: $p") }
      assert(after.size > before.size, "append added no files")
      // frozen stats: every arrival posting's w_mu must equal
      // tf_arrival × ln(N_standing / df_standing)
      val nStanding = standing.select("doc_id").distinct().count()
      val expected = SparseSearch.encodeAgainst(arriving, "text", "doc_id",
          SparseSearch.encode(standing, "text", "doc_id")
            .groupBy("term").agg(count(lit(1)).cast("long").as("df")),
          nStanding)
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val arrivingIds = arriving.select("doc_id").as[Long].collect().toSet
      val stored = spark.read.parquet(s"${store.root}/sp")
        .filter($"doc_id".isin(arrivingIds.toSeq.map(Long.box): _*))
        .collect().map(r => (r.getLong(r.fieldIndex("doc_id")),
          r.getString(r.fieldIndex("term"))) -> r.getLong(r.fieldIndex("w_mu"))).toMap
      assert(stored == expected, "arrival postings must carry frozen-stats weights")
      // append contract refuses a re-insert
      val err = intercept[IllegalArgumentException] {
        SparseSearch.insertInto(store, "sp", arriving.limit(1), "text", "doc_id")
      }
      assert(err.getMessage.contains("existing id"), err.getMessage)
    } finally store.destroy()
  }

  test("streaming sink: torn append healed per row, watermark skips, post-commit redelivery is a no-op") {
    val store = newStore()
    try {
      val standing = docs.filter($"doc_id" % 10 =!= 7)
      val arriving = docs.filter($"doc_id" % 10 === 7)
      SparseSearch.buildIndex(store, "sp", standing, "text", "doc_id", nBuckets = 8)
      // simulate a crash MID-append: half the batch's postings landed,
      // no commit — then the same batch is redelivered through the sink
      val full = SparseSearch.encodeForIndex(store, "sp", arriving, "text", "doc_id")
        .localCheckpoint(true)
      val torn = full.filter(xxhash64($"term", $"doc_id") % 2 === 0)
      store.append("sp", torn, partitionBy = Seq("bucket"))
      graft.streaming.IndexStream.sparseBatchSink(store, "sp", "text", "doc_id")(
        arriving, 0L)
      def postings() = spark.read.parquet(s"${store.root}/sp")
        .select("term", "doc_id", "w_mu")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2)).toSeq
      val healed = postings()
      // reference: a clean batch insert on a fresh store
      val clean = newStore()
      SparseSearch.buildIndex(clean, "sp", standing, "text", "doc_id", nBuckets = 8)
      SparseSearch.insertInto(clean, "sp", arriving, "text", "doc_id")
      val expect = spark.read.parquet(s"${clean.root}/sp")
        .select("term", "doc_id", "w_mu")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2)).toSeq
      clean.destroy()
      assert(healed == expect,
        "redelivery must complete the torn append exactly, no dup postings")
      // watermark: same batchId skipped outright
      graft.streaming.IndexStream.sparseBatchSink(store, "sp", "text", "doc_id")(
        arriving, 0L)
      // post-commit redelivery under a NEW id: anti-filters to nothing
      graft.streaming.IndexStream.sparseBatchSink(store, "sp", "text", "doc_id")(
        arriving, 1L)
      assert(postings() == expect, "replay regimes must not change the index")
    } finally store.destroy()
  }

  test("delete: tombstoned docs vanish from every verb, weights of survivors unchanged (frozen model)") {
    val store = newStore()
    try {
      SparseSearch.buildIndex(store, "sp", docs, "text", "doc_id", nBuckets = 8)
      val before = SparseSearch.searchStored(spark, store, "sp", q, k = 50)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val victims = before.keys.toSeq.sorted.take(3)
      SparseSearch.deleteFrom(store, "sp",
        victims.toDF("doc_id"))
      val after = SparseSearch.searchStored(spark, store, "sp", q, k = 50)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      victims.foreach(v => assert(!after.contains(v), s"deleted $v still surfaces"))
      // survivors keep their EXACT pre-delete scores: the frozen encoder
      // means a delete cannot move anyone else's weight (rows newly
      // promoted into the top-50 by the freed slots are not comparable)
      after.foreach { case (id, s) =>
        before.get(id).foreach(b =>
          assert(b == s, s"survivor $id score moved: $b -> $s")) }
      assert(after.keySet.intersect(before.keySet).nonEmpty)
      // physically still on disk (tombstone, not rewrite) — and a
      // re-insert of a tombstoned id is refused
      assert(spark.read.parquet(s"${store.root}/sp")
        .filter($"doc_id" === victims.head).count() > 0)
      intercept[IllegalArgumentException] {
        SparseSearch.insertInto(store, "sp",
          docs.filter($"doc_id" === victims.head), "text", "doc_id")
      }
    } finally store.destroy()
  }

  test("compaction: dirty buckets to one file, clean untouched, tombstones folded and log truncated, content preserved") {
    val store = newStore()
    try {
      SparseSearch.buildIndex(store, "sp", docs.filter($"doc_id" % 10 =!= 7),
        "text", "doc_id", nBuckets = 8)
      SparseSearch.insertInto(store, "sp", docs.filter($"doc_id" % 10 === 7),
        "text", "doc_id")
      SparseSearch.deleteFrom(store, "sp",
        docs.filter($"doc_id" % 7 === 0).select("doc_id"))
      val preSearch = SparseSearch.searchStored(spark, store, "sp", q, k = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      def filesPerBucket() = store.dataFileStatuses("sp")
        .groupBy(_.getPath.getParent.getName).view.mapValues(_.size).toMap
      val before = filesPerBucket()
      val cleanBuckets = before.filter(_._2 == 1).keySet
      val cleanSigs = store.dataFileStatuses("sp")
        .filter(f => cleanBuckets(f.getPath.getParent.getName))
        .map(f => f.getPath.toString -> (f.getLen, f.getModificationTime)).toMap
      val rewritten = SparseSearch.compactIndex(spark, store, "sp",
        maxFilesPerBucket = 1)
      assert(rewritten.nonEmpty, "appends + deletes must have dirtied buckets")
      val after = filesPerBucket()
      rewritten.foreach(b => assert(after(s"bucket=$b") == 1,
        s"bucket $b not compacted: ${after.get(s"bucket=$b")}"))
      // clean buckets' files byte-identical (never rewritten)
      store.dataFileStatuses("sp")
        .filter(f => cleanSigs.contains(f.getPath.toString))
        .foreach(f => assert(
          cleanSigs(f.getPath.toString) == (f.getLen, f.getModificationTime),
          s"clean bucket file rewritten: ${f.getPath}"))
      // tombstone log gone, deleted docs physically folded out
      assert(!graft.store.StoreFs.forPath(store.root)
        .exists(s"${store.root}/sp/_deleted"), "folded log must be truncated")
      assert(spark.read.parquet(s"${store.root}/sp")
        .filter($"doc_id" % 7 === 0).count() == 0,
        "tombstoned postings must be physically gone")
      // answers identical, and a second compact is a no-op
      val postSearch = SparseSearch.searchStored(spark, store, "sp", q, k = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(postSearch == preSearch, "compaction must be answer-invisible")
      assert(SparseSearch.compactIndex(spark, store, "sp",
        maxFilesPerBucket = 1).isEmpty, "second compact must find nothing dirty")
    } finally store.destroy()
  }

  test("batch search == per-query singles; filtered = allowed ∩ unfiltered with unchanged scores") {
    val store = newStore()
    try {
      SparseSearch.buildIndex(store, "sp", docs, "text", "doc_id", nBuckets = 8)
      val q2 = Seq("filter" -> 1.0, "scan" -> 0.7)
      val many = SparseSearch.searchStoredMany(spark, store, "sp",
          Seq("qa" -> q, "qb" -> q2), k = 9)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3, x._4)).toSeq).toMap
      def single(qq: Seq[(String, Double)]) =
        SparseSearch.searchStored(spark, store, "sp", qq, k = 9)
          .collect().zipWithIndex
          .map { case (r, i) => (r.getLong(0), r.getDouble(1), (i + 1).toLong) }.toSeq
      assert(many("qa") == single(q), "batch arm qa must equal the single search")
      assert(many("qb") == single(q2), "batch arm qb must equal the single search")
      intercept[IllegalArgumentException](SparseSearch.searchStoredMany(
        spark, store, "sp", Seq("x" -> q, "x" -> q2), 5))
      // filtered: survivors are allowed ∩ unfiltered-scoring docs, and
      // each keeps its EXACT unfiltered score (frozen weights)
      val unfiltered = SparseSearch.searchStored(spark, store, "sp", q, k = 1000)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val allowed = docs.filter($"doc_id" % 3 === 0).select("doc_id")
      val filtered = SparseSearch.searchStoredFiltered(spark, store, "sp", q,
          k = 1000, allowed = allowed)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(filtered.keySet ==
        unfiltered.keySet.filter(_ % 3 == 0), "filter-then-rank hit set")
      filtered.foreach { case (id, s) =>
        assert(unfiltered(id) == s, s"filter moved a score for $id") }
    } finally store.destroy()
  }

  test("impact threshold: predicate reaches PushedFilters, scores are lower bounds, zero cutoff is exact") {
    val store = newStore()
    try {
      SparseSearch.buildIndex(store, "sp", docs, "text", "doc_id", nBuckets = 8)
      // plan pin: the w_mu cutoff must reach the parquet scan
      val lazyPlan = SparseSearch.prunedPostings(spark, store, "sp", Seq("vector"))
        .filter($"w_mu" >= 400000L)
      val scans = lazyPlan.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty)
      assert(scans.exists(_.metadata.get("PushedFilters")
          .exists(_.contains("GreaterThanOrEqual(w_mu,400000)"))),
        s"impact cutoff not pushed: ${scans.map(_.metadata.get("PushedFilters"))}")
      val exact = SparseSearch.searchStored(spark, store, "sp", q, k = 1000)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val approx = SparseSearch.searchStoredImpact(spark, store, "sp", q,
          k = 1000, minImpactMu = 400000L)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(approx.nonEmpty && approx.keySet.subsetOf(exact.keySet))
      approx.foreach { case (id, s) =>
        assert(s <= exact(id), s"impact score must lower-bound exact for $id") }
      val zero = SparseSearch.searchStoredImpact(spark, store, "sp", q,
          k = 1000, minImpactMu = 0L)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(zero == exact, "minImpactMu=0 must be the exact search")
    } finally store.destroy()
  }

  test("compacting a fully-dead bucket deletes it instead of resurrecting it (review regression)") {
    val store = newStore()
    try {
      // nBuckets=1: every posting lands in bucket 0; deleting EVERY doc
      // makes that bucket's live content empty — the staged rewrite
      // emits no directory for it, and the promote must treat the
      // journaled-empty bucket as a delete, never as already-promoted
      val tiny = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
      SparseSearch.buildIndex(store, "sp", tiny, "text", "doc_id", nBuckets = 1)
      SparseSearch.deleteFrom(store, "sp", Seq(1L, 2L).toDF("doc_id"))
      SparseSearch.compactIndex(spark, store, "sp", maxFilesPerBucket = 1)
      assert(!graft.store.StoreFs.forPath(store.root)
        .exists(s"${store.root}/sp/_deleted"), "log truncated")
      val out = SparseSearch.searchStored(spark, store, "sp",
        Seq("beta" -> 1.0), k = 5)
      assert(out.collect().isEmpty,
        "a fully-tombstoned-then-compacted index must serve NOTHING — " +
          "surviving postings here means the dead bucket was resurrected")
      // idempotent second pass on the emptied index
      assert(SparseSearch.compactIndex(spark, store, "sp",
        maxFilesPerBucket = 1).isEmpty)
    } finally store.destroy()
  }

  test("OOV-only batch appends nothing and empty query refused") {
    val store = newStore()
    try {
      val tiny = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
      SparseSearch.buildIndex(store, "sp", tiny, "text", "doc_id", nBuckets = 4)
      SparseSearch.insertInto(store, "sp",
        Seq((9L, "zzz qqq")).toDF("doc_id", "text"), "text", "doc_id")
      assert(spark.read.parquet(s"${store.root}/sp")
        .filter($"doc_id" === 9L).count() == 0,
        "out-of-vocabulary terms have no fitted weight — no postings")
      intercept[IllegalArgumentException] {
        SparseSearch.topK(SparseSearch.encode(tiny, "text", "doc_id"), Nil, 5)
      }
    } finally store.destroy()
  }
}
