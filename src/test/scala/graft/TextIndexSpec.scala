package graft

import graft.text.{TextAnalysis, TextIndex}
import org.apache.spark.sql.functions._

/** Stored inverted text index: stored-vs-inline BM25 identity (incl. a
  * term absent from the corpus), bucket partition pruning, O(batch)
  * incremental append (pre-existing files byte-identical; search equals
  * a full rebuild), append-contract refusal, sidecar failure mode. */
class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)
  private def newStore() = {
    val root = java.nio.file.Files.createTempDirectory("graft_tidxspec").toString
    graft.store.VectorStore(root)
  }

  test("stored BM25 == inline bm25TopK row for row, incl. an absent term") {
    val store = newStore()
    try {
      TextIndex.buildTextIndex(store, "ti", docs, "text", "doc_id", nBuckets = 8)
      for (terms <- Seq(Seq("filter", "vector", "sort"),
                        Seq("join", "nosuchterm_xyzzy", "query"))) {
        val stored = TextIndex.bm25SearchStored(spark, store, "ti", terms, k = 15)
          .collect().toSeq
        val inline = TextAnalysis.bm25TopK(docs, "text", "doc_id", terms, k = 15)
          .collect().toSeq
        assert(stored == inline, s"stored != inline for terms $terms")
        assert(stored.nonEmpty)
      }
    } finally store.destroy()
  }

  test("filtered BM25: allow-all == unfiltered; survivors keep their unfiltered scores") {
    val store = newStore()
    try {
      TextIndex.buildTextIndex(store, "ti", docs, "text", "doc_id", nBuckets = 8)
      val terms = Seq("filter", "vector", "sort")
      val unfiltered = TextIndex.bm25SearchStored(spark, store, "ti", terms, k = 500)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      // allow-all identity
      val allowAll = TextIndex.bm25SearchStoredFiltered(spark, store, "ti",
          terms, k = 15, allowed = docs.select("doc_id")).collect().toSeq
      val plain = TextIndex.bm25SearchStored(spark, store, "ti", terms, k = 15)
        .collect().toSeq
      assert(allowAll == plain, "allow-all filter must be the identity")
      // a real filter: survivors are exactly the allowed ∩ scoring docs,
      // each with its unfiltered score
      val allowed = docs.filter(col("lang") === "en").select("doc_id")
      val allowedIds = allowed.collect().map(_.getLong(0)).toSet
      val filtered = TextIndex.bm25SearchStoredFiltered(spark, store, "ti",
        terms, k = 500, allowed = allowed).collect()
      assert(filtered.nonEmpty)
      filtered.foreach { r =>
        val id = r.getLong(0)
        assert(allowedIds.contains(id), s"doc $id not in the allowed set")
        assert(unfiltered(id) == (r.getLong(1), r.getDouble(2)),
          s"doc $id score drifted under the filter")
      }
      assert(filtered.map(_.getLong(0)).toSet ==
        unfiltered.keySet.intersect(allowedIds),
        "filtered hit set must be allowed ∩ unfiltered-scoring docs")
    } finally store.destroy()
  }

  test("search scan prunes to the query terms' buckets (PartitionFilters)") {
    val store = newStore()
    try {
      TextIndex.buildTextIndex(store, "ti", docs, "text", "doc_id", nBuckets = 8)
      // the BM25 consumption shape: frequency columns only — the scan
      // must prune the positional payload away
      val pruned = TextIndex.prunedPostings(spark, store, "ti", Seq("filter"))
        .select("term", "doc_id", "tf", "dl")
      val scans = pruned.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "no FileSourceScanExec over the postings")
      scans.foreach { scan =>
        assert(scan.partitionFilters.exists(_.references.exists(_.name == "bucket")),
          s"bucket probe is not a partition filter: ${scan.partitionFilters}")
        assert(scan.selectedPartitions.partitionCount <= 1,
          s"1-term query scanned ${scan.selectedPartitions.partitionCount} buckets")
        // column pruning: the BM25 path never pays for `positions` —
        // the positional payload stays on disk (bucket is directory-
        // derived, not file IO)
        assert(scan.schema.fieldNames.toSet.subsetOf(
          Set("term", "doc_id", "tf", "dl", "bucket")),
          s"postings scan reads ${scan.schema.fieldNames.mkString(",")}")
      }
    } finally store.destroy()
  }

  test("incremental append: untouched files byte-identical; search == full rebuild") {
    val storeInc = newStore()
    val storeFull = newStore()
    try {
      val part = docs.filter(col("doc_id") % 3 =!= 0)
      val batch = docs.filter(col("doc_id") % 3 === 0)
      TextIndex.buildTextIndex(storeInc, "ti", part, "text", "doc_id", nBuckets = 8)
      val before = storeInc.dataFileStatuses("ti")
        .map(f => f.getPath.toString -> (f.getLen, f.getModificationTime)).toMap
      TextIndex.insertIntoTextIndex(storeInc, "ti", batch, "text", "doc_id")
      val after = storeInc.dataFileStatuses("ti")
        .map(f => f.getPath.toString -> (f.getLen, f.getModificationTime)).toMap
      before.foreach { case (p, sig) =>
        assert(after.get(p).contains(sig), s"append rewrote pre-existing file $p")
      }
      assert(after.size > before.size, "append added no files")

      TextIndex.buildTextIndex(storeFull, "ti", docs, "text", "doc_id", nBuckets = 8)
      val terms = Seq("join", "query")
      val inc = TextIndex.bm25SearchStored(spark, storeInc, "ti", terms, k = 12)
        .collect().toSeq
      val full = TextIndex.bm25SearchStored(spark, storeFull, "ti", terms, k = 12)
        .collect().toSeq
      assert(inc == full, "maintained index diverged from full rebuild")
    } finally { storeInc.destroy(); storeFull.destroy() }
  }

  test("phrase search == direct token-window differential, incl. duplicate-term phrase") {
    import org.apache.spark.sql.functions.{posexplode, lit, count}
    val store = newStore()
    try {
      TextIndex.buildTextIndex(store, "ti", docs, "text", "doc_id", nBuckets = 8)
      for (phrase <- Seq(Seq("hash", "join"), Seq("table", "table"),
                         Seq("big", "order", "scan"))) {
        val got = TextIndex.phraseSearch(spark, store, "ti", phrase, k = 500)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // differential: slide over the raw token stream, no index
        val toks = docs
          .select(col("doc_id"),
            posexplode(graft.text.TextAnalysis.tokens(col("text")))
              .as(Seq("pos", "tok")))
        val slots = phrase.zipWithIndex.map { case (t, i) =>
          toks.filter(col("tok") === lit(t))
            .select(col("doc_id"), (col("pos") - lit(i)).as("start"), lit(i).as("slot"))
        }.reduce(_ unionByName _)
        val want = slots.groupBy("doc_id", "start")
          .agg(org.apache.spark.sql.functions.countDistinct(col("slot")).as("ns"))
          .filter(col("ns") === phrase.length)
          .groupBy("doc_id").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"phrase $phrase: index result diverged from direct scan")
        assert(got.nonEmpty, s"phrase $phrase matched nothing — weak fixture")
      }
    } finally store.destroy()
  }

  test("streaming sink: intent-only and torn-append crash windows heal; refusals loud") {
    import graft.streaming.IndexStream
    import org.apache.spark.sql.functions.{coalesce, count, lit, sum}
    val store = newStore()
    val storeFull = newStore()
    try {
      val standing = docs.filter(col("doc_id") % 3 === 0)
      val batchA = docs.filter(col("doc_id") % 3 === 1)
      val batchB = docs.filter(col("doc_id") % 3 === 2)
      TextIndex.buildTextIndex(store, "ti", standing, "text", "doc_id", nBuckets = 8)

      // crash shape A: intent written, NOTHING appended, process died
      val postsA = TextIndex.postingsOf(batchA, "text", "doc_id", 8)
      val rA = postsA.select("doc_id", "dl").distinct()
        .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head
      val st0 = TextIndex.readState(store, "ti")
      TextIndex.writeState(store, "ti", st0.copy(pending =
        Some(TextIndex.PendingBatch(0L, rA.getLong(0), rA.getLong(1)))))
      // pending index: search and the batch verb both refuse
      intercept[IllegalArgumentException] {
        TextIndex.bm25SearchStored(spark, store, "ti", Seq("join"), k = 5)
      }
      intercept[IllegalArgumentException] {
        TextIndex.insertIntoTextIndex(store, "ti", batchB, "text", "doc_id")
      }
      // a DIFFERENT batch arriving over the intent refuses
      intercept[IllegalArgumentException] {
        IndexStream.textBatchSink(store, "ti", "text", "doc_id")(batchB, 1L)
      }
      // redelivery of the SAME batch heals shape A
      IndexStream.textBatchSink(store, "ti", "text", "doc_id")(batchA, 0L)
      assert(TextIndex.readState(store, "ti").pending.isEmpty)
      assert(TextIndex.readState(store, "ti").lastBatch == 0L)

      // crash shape B: intent + TORN append (a doc's postings split
      // across bucket dirs; only some rows landed), process died
      val postsB = TextIndex.postingsOf(batchB, "text", "doc_id", 8)
      val rB = postsB.select("doc_id", "dl").distinct()
        .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head
      val st1 = TextIndex.readState(store, "ti")
      TextIndex.writeState(store, "ti", st1.copy(pending =
        Some(TextIndex.PendingBatch(1L, rB.getLong(0), rB.getLong(1)))))
      store.append("ti", postsB.filter(col("tf") % 2 === 0),
        partitionBy = Seq("bucket"))
      IndexStream.textBatchSink(store, "ti", "text", "doc_id")(batchB, 1L)
      val st2 = TextIndex.readState(store, "ti")
      assert(st2.pending.isEmpty && st2.lastBatch == 1L)

      // replay after commit, same batchId: skipped outright
      val filesBefore = store.dataFileStatuses("ti").map(_.getPath.toString).toSet
      IndexStream.textBatchSink(store, "ti", "text", "doc_id")(batchB, 1L)
      assert(store.dataFileStatuses("ti").map(_.getPath.toString).toSet == filesBefore)
      // redelivery under a NEW batchId after commit: loud refusal
      val ex = intercept[IllegalArgumentException] {
        IndexStream.textBatchSink(store, "ti", "text", "doc_id")(batchB, 2L)
      }
      assert(ex.getMessage.contains("already counted"))

      // after both heals the index equals a from-scratch full build:
      // same search rows, same committed stats, no duplicate postings
      TextIndex.buildTextIndex(storeFull, "ti", docs, "text", "doc_id", nBuckets = 8)
      val a = TextIndex.bm25SearchStored(spark, store, "ti",
        Seq("join", "query"), k = 12).collect().toSeq
      val b = TextIndex.bm25SearchStored(spark, storeFull, "ti",
        Seq("join", "query"), k = 12).collect().toSeq
      assert(a == b, "healed index diverged from full rebuild")
      val sf2 = TextIndex.readState(storeFull, "ti")
      assert(st2.nDocs == sf2.nDocs && st2.sumDl == sf2.sumDl)
      assert(store.read(spark, "ti").count() == storeFull.read(spark, "ti").count(),
        "healed index carries duplicate or missing postings")
    } finally { store.destroy(); storeFull.destroy() }
  }

  test("compaction: dirty buckets rewritten to one file, clean untouched, rows preserved") {
    val store = newStore()
    try {
      TextIndex.buildTextIndex(store, "ti",
        docs.filter(col("doc_id") % 4 <= 1), "text", "doc_id", nBuckets = 8)
      TextIndex.insertIntoTextIndex(store, "ti",
        docs.filter(col("doc_id") % 4 === 2), "text", "doc_id")
      TextIndex.insertIntoTextIndex(store, "ti",
        docs.filter(col("doc_id") % 4 === 3), "text", "doc_id")
      def filesPerBucket() = store.dataFileStatuses("ti")
        .groupBy(_.getPath.getParent.getName).view.mapValues(_.size).toMap
      val before = filesPerBucket()
      assert(before.values.exists(_ > 2), s"appends produced no fragments: $before")
      val beforeRows = store.read(spark, "ti").count()
      val cleanBefore = store.dataFileStatuses("ti")
        .filter(f => before(f.getPath.getParent.getName) <= 2)
        .map(f => f.getPath.toString -> (f.getLen, f.getModificationTime)).toMap
      val dirty = TextIndex.compactIndex(spark, store, "ti", maxFilesPerBucket = 2)
      assert(dirty.nonEmpty)
      val after = filesPerBucket()
      dirty.foreach { b =>
        assert(after(s"bucket=$b") == 1, s"bucket $b still fragmented: $after")
      }
      // untouched buckets' files byte-identical
      cleanBefore.foreach { case (p, sig) =>
        assert(store.dataFileStatuses("ti")
          .exists(f => f.getPath.toString == p &&
            (f.getLen, f.getModificationTime) == sig),
          s"compaction touched clean-bucket file $p")
      }
      assert(store.read(spark, "ti").count() == beforeRows,
        "compaction changed the posting row count")
      // idempotent: a second pass finds nothing to do
      assert(TextIndex.compactIndex(spark, store, "ti", maxFilesPerBucket = 2).isEmpty)
    } finally store.destroy()
  }

  test("boolean search == set-algebra differential; batch BM25 == singles") {
    import org.apache.spark.sql.functions.{countDistinct, explode}
    val store = newStore()
    try {
      TextIndex.buildTextIndex(store, "ti", docs, "text", "doc_id", nBuckets = 8)
      // boolean differential straight off the tokens
      val membership = docs.select(col("doc_id"),
          explode(graft.text.TextAnalysis.tokens(col("text"))).as("t"))
        .distinct()
      def docsOf(t: String) = membership.filter(col("t") === t)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val want = ((docsOf("join") intersect docsOf("filter")) diff docsOf("slow"))
        .map { d =>
          d -> Seq("vector", "spark", "sort").count(t => docsOf(t).contains(d)).toLong
        }.toMap
      val got = TextIndex.booleanSearch(spark, store, "ti",
          must = Seq("join", "filter"), should = Seq("vector", "spark", "sort"),
          mustNot = Seq("slow"), k = 1000)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, "boolean search diverged from set algebra")
      assert(got.nonEmpty)
      // overlapping must/mustNot refuses
      intercept[IllegalArgumentException] {
        TextIndex.booleanSearch(spark, store, "ti", must = Seq("join"),
          mustNot = Seq("join"))
      }
      // batch == singles, query by query
      val batch = TextIndex.bm25SearchStoredMany(spark, store, "ti",
        Seq("x" -> Seq("filter", "vector"), "y" -> Seq("join", "nosuch")),
        k = 8).collect()
      val singles = Seq("x" -> Seq("filter", "vector"), "y" -> Seq("join", "nosuch"))
        .flatMap { case (qid, terms) =>
          TextIndex.bm25SearchStored(spark, store, "ti", terms, k = 8)
            .collect().map(r => (qid, r.getLong(0), r.getLong(1), r.getDouble(2)))
        }
      assert(batch.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq == singles,
        "batched BM25 diverged from single-query searches")
    } finally store.destroy()
  }

  test("batch BM25 plan: one postings feed, no per-query union, flat in batch size") {
    val store = newStore()
    try {
      TextIndex.buildTextIndex(store, "ti", docs, "text", "doc_id", nBuckets = 8)
      // capture the scoring plan the eager batch verb executes
      val captured = new java.util.concurrent.CopyOnWriteArrayList[
        org.apache.spark.sql.execution.SparkPlan]()
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            ns: Long): Unit = { captured.add(qe.executedPlan); () }
        override def onFailure(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      }
      def audit(queries: Seq[(String, Seq[String])]): Int = {
        captured.clear()
        import scala.jdk.CollectionConverters._
        def flat(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.SparkPlan] = p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            flat(a.executedPlan)
          // Spark 4 AQE: materialized stages (incl. the final
          // ResultQueryStageExec) are leaves whose subtree hangs off .plan
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            s +: flat(s.plan)
          case n => Seq(n)
        }.flatten
        def windowPlans = captured.asScala.toSeq.map(flat).filter(_.exists {
          case _: org.apache.spark.sql.execution.window.WindowExec => true
          case _ => false
        })
        spark.listenerManager.register(listener)
        try {
          TextIndex.bm25SearchStoredMany(spark, store, "ti", queries, k = 5)
          // the listener bus is async — wait (bounded) for the plan
          val deadline = System.nanoTime() + 30e9.toLong
          while (windowPlans.isEmpty && System.nanoTime() < deadline)
            Thread.sleep(50)
        } finally spark.listenerManager.unregister(listener)
        val scoring = windowPlans
        assert(scoring.nonEmpty, "no scoring (window) plan captured; saw:\n" +
          captured.asScala.map(p => flat(p).map(_.getClass.getSimpleName)
            .mkString("[", ",", "]")).mkString("\n"))
        val ns = scoring.maxBy(_.length) // the batch verb's final plan
        assert(!ns.exists(_.isInstanceOf[org.apache.spark.sql.execution.UnionExec]),
          "batch BM25 built a per-query union plan")
        // ONE postings feed: the persisted pruned slice enters the
        // scoring plan through a single in-memory scan
        val feeds = ns.count {
          case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
            m.schema.fieldNames.contains("tf")
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.schema.fieldNames.contains("tf")
          case _ => false
        }
        assert(feeds == 1, s"batch BM25 scoring plan has $feeds postings feeds")
        ns.length
      }
      val terms = Seq("filter", "vector", "join", "query", "sort")
      val small = audit(Seq("a" -> terms.take(2), "b" -> terms.drop(2)))
      val large = audit((0 until 8).map(i => s"q$i" -> Seq(terms(i % 5))))
      assert(small == large,
        s"scoring plan grew with the batch: $small nodes at Q=2, $large at Q=8")
    } finally store.destroy()
  }

  test("index catalog detects every layout family") {
    import graft.operators.{Clustering, GraphAnn, Similarity}
    val store = newStore()
    try {
      val e = Tables.embeddings(spark, sf)
      store.create("plain", e.select(col("vec_id"), col("label")))
      Similarity.buildIvfIndex(store, "v_ivf", e, "embedding", "vec_id", ncells = 8)
      Similarity.buildBqIndex(store, "v_bq", e, "embedding", "vec_id")
      Similarity.buildIvfPqIndex(store, "v_pq", e, "embedding", "vec_id", ncells = 8)
      Similarity.buildIvfSqIndex(store, "v_sq", e, "embedding", "vec_id")
      val cents = Clustering.trainCentroids(e, 8, 2)
      val (g, _) = GraphAnn.buildGraph(e, "embedding", "vec_id", ncells = 8,
        m = 8, centroids = Some(cents))
      store.create("v_graph", g.toDF(), partitionBy = Seq("cell_id"))
      TextIndex.buildTextIndex(store, "v_text", docs, "text", "doc_id", nBuckets = 4)
      store.createMutable("v_mut", e.select(col("vec_id"), col("label")), "vec_id")
      val kinds = store.indexCatalog(spark).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(kinds == Map("plain" -> "collection", "v_ivf" -> "ivf",
        "v_bq" -> "bq", "v_pq" -> "ivf_pq", "v_sq" -> "ivf_sq",
        "v_graph" -> "graph", "v_text" -> "text", "v_mut" -> "mutable"),
        s"misdetected: $kinds")
    } finally store.destroy()
  }

  test("proximity search == direct token differential") {
    import org.apache.spark.sql.functions.{abs, min, posexplode, lit}
    val store = newStore()
    try {
      TextIndex.buildTextIndex(store, "ti", docs, "text", "doc_id", nBuckets = 8)
      val got = TextIndex.proximitySearch(spark, store, "ti",
          "vector", "spark", maxDist = 4, k = 500)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val toks = docs.select(col("doc_id"),
        posexplode(graft.text.TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
      val want = toks.filter(col("tok") === lit("vector"))
        .select(col("doc_id"), col("pos").as("pa"))
        .join(toks.filter(col("tok") === lit("spark"))
          .select(col("doc_id"), col("pos").as("pb")), Seq("doc_id"))
        .groupBy("doc_id").agg(min(abs(col("pa") - col("pb"))).as("d"))
        .filter(col("d") <= 4)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want)
      assert(got.nonEmpty, "proximity fixture matched nothing")
    } finally store.destroy()
  }

  test("delete: every verb reflects the live set; refusals loud; re-add refused") {
    val store = newStore()
    val storeLive = newStore()
    try {
      TextIndex.buildTextIndex(store, "ti", docs, "text", "doc_id", nBuckets = 8)
      val deadIds = docs.filter(col("doc_id") % 5 === 0).select("doc_id")
      TextIndex.deleteFromTextIndex(store, "ti", deadIds)
      // ground truth: an index built over only the live corpus
      val live = docs.filter(col("doc_id") % 5 =!= 0)
      TextIndex.buildTextIndex(storeLive, "ti", live, "text", "doc_id", nBuckets = 8)
      def rows(st: graft.store.VectorStore, f: => org.apache.spark.sql.DataFrame) = f.collect().toSeq
      assert(
        TextIndex.bm25SearchStored(spark, store, "ti", Seq("join", "query"), 12).collect().toSeq ==
        TextIndex.bm25SearchStored(spark, storeLive, "ti", Seq("join", "query"), 12).collect().toSeq,
        "BM25 after delete != live-only rebuild")
      assert(
        TextIndex.booleanSearch(spark, store, "ti", Seq("join"), Seq("query"), Seq("vector"), 10).collect().toSeq ==
        TextIndex.booleanSearch(spark, storeLive, "ti", Seq("join"), Seq("query"), Seq("vector"), 10).collect().toSeq,
        "boolean after delete != live-only rebuild")
      assert(
        TextIndex.phraseSearch(spark, store, "ti", Seq("the", "batch"), 10).collect().toSeq ==
        TextIndex.phraseSearch(spark, storeLive, "ti", Seq("the", "batch"), 10).collect().toSeq,
        "phrase after delete != live-only rebuild")
      assert(
        TextIndex.indexStats(spark, store, "ti", 10).collect().toSeq ==
        TextIndex.indexStats(spark, storeLive, "ti", 10).collect().toSeq,
        "indexStats after delete != live-only rebuild")
      // a deleted id cannot come back (its raw postings remain)
      intercept[IllegalArgumentException] {
        TextIndex.insertIntoTextIndex(store, "ti",
          docs.filter(col("doc_id") === 0), "text", "doc_id")
      }
      // double-delete and unknown-id deletes refuse
      intercept[IllegalArgumentException] {
        TextIndex.deleteFromTextIndex(store, "ti", deadIds.limit(1))
      }
      intercept[IllegalArgumentException] {
        import spark.implicits._
        TextIndex.deleteFromTextIndex(store, "ti",
          Seq(-999L).toDF("doc_id"))
      }
      // but INSERT of genuinely new docs still works after deletes, and
      // search stays consistent with the live-only twin
      val extra = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(100000L, "join query join vector"))),
        new org.apache.spark.sql.types.StructType()
          .add("doc_id", "long").add("text", "string"))
      TextIndex.insertIntoTextIndex(store, "ti", extra, "text", "doc_id")
      TextIndex.insertIntoTextIndex(storeLive, "ti", extra, "text", "doc_id")
      assert(
        TextIndex.bm25SearchStored(spark, store, "ti", Seq("join", "query"), 12).collect().toSeq ==
        TextIndex.bm25SearchStored(spark, storeLive, "ti", Seq("join", "query"), 12).collect().toSeq,
        "post-delete insert diverged from live-only twin")
    } finally { store.destroy(); storeLive.destroy() }
  }

  test("delete crash windows: intent-only and tombstone-landed both heal exactly once") {
    val store = newStore()
    val storeLive = newStore()
    try {
      TextIndex.buildTextIndex(store, "ti", docs, "text", "doc_id", nBuckets = 8)
      val deadIds = docs.filter(col("doc_id") % 5 === 0).select("doc_id")
        .localCheckpoint(true)
      val nDead = deadIds.count()
      val dlDead = TextIndex.postingsOf(docs.filter(col("doc_id") % 5 === 0),
          "text", "doc_id", 8)
        .select("doc_id", "dl").distinct()
        .agg(org.apache.spark.sql.functions.sum(col("dl"))).head.getLong(0)
      // window 1: intent recorded, NO tombstones landed
      val st0 = TextIndex.readState(store, "ti")
      TextIndex.writeState(store, "ti", st0.copy(pending = Some(
        TextIndex.PendingBatch(TextIndex.DeleteVerbIntent, nDead, dlDead))))
      intercept[IllegalArgumentException] { // verbs refuse the pending index
        TextIndex.bm25SearchStored(spark, store, "ti", Seq("join"), k = 5)
      }
      intercept[IllegalArgumentException] { // wrong-verb heal refused
        TextIndex.resumeInsert(store, "ti", docs.limit(1), "text", "doc_id")
      }
      intercept[IllegalArgumentException] { // wrong-batch heal refused
        TextIndex.resumeDelete(store, "ti", deadIds.limit(1))
      }
      TextIndex.resumeDelete(store, "ti", deadIds)
      assert(TextIndex.readState(store, "ti").pending.isEmpty)
      // a fresh delete refuses while ANY intent is pending
      val st1 = TextIndex.readState(store, "ti")
      TextIndex.writeState(store, "ti", st1.copy(pending = Some(
        TextIndex.PendingBatch(TextIndex.DeleteVerbIntent, 1L, 37L))))
      intercept[IllegalArgumentException] {
        TextIndex.deleteFromTextIndex(store, "ti", deadIds)
      }
      TextIndex.writeState(store, "ti", st1) // clear the synthetic intent
      // window 1 healed == live-only rebuild
      TextIndex.buildTextIndex(storeLive, "ti",
        docs.filter(col("doc_id") % 5 =!= 0), "text", "doc_id", nBuckets = 8)
      assert(
        TextIndex.bm25SearchStored(spark, store, "ti", Seq("join", "query"), 12).collect().toSeq ==
        TextIndex.bm25SearchStored(spark, storeLive, "ti", Seq("join", "query"), 12).collect().toSeq,
        "healed delete diverged from live-only rebuild")
      // window 2 on a fresh index: intent AND tombstones landed, stats
      // never committed — resume must not double-append or double-decrement
      val store2 = newStore()
      val storeLive2 = newStore()
      try {
        TextIndex.buildTextIndex(store2, "ti", docs, "text", "doc_id", nBuckets = 8)
        val dead2 = docs.filter(col("doc_id") % 3 === 0).select("doc_id")
          .localCheckpoint(true)
        val n2 = dead2.count()
        val dl2 = TextIndex.postingsOf(docs.filter(col("doc_id") % 3 === 0),
            "text", "doc_id", 8)
          .select("doc_id", "dl").distinct()
          .agg(org.apache.spark.sql.functions.sum(col("dl"))).head.getLong(0)
        val s2 = TextIndex.readState(store2, "ti")
        TextIndex.writeState(store2, "ti", s2.copy(pending = Some(
          TextIndex.PendingBatch(TextIndex.DeleteVerbIntent, n2, dl2))))
        dead2.write.mode("append").parquet(s"${store2.root}/ti/_deleted")
        TextIndex.resumeDelete(store2, "ti", dead2)
        assert(TextIndex.readState(store2, "ti").pending.isEmpty)
        TextIndex.buildTextIndex(storeLive2, "ti",
          docs.filter(col("doc_id") % 3 =!= 0), "text", "doc_id", nBuckets = 8)
        assert(
          TextIndex.bm25SearchStored(spark, store2, "ti", Seq("join", "query"), 12).collect().toSeq ==
          TextIndex.bm25SearchStored(spark, storeLive2, "ti", Seq("join", "query"), 12).collect().toSeq,
          "tombstone-landed heal diverged from live-only rebuild")
        // stats decremented exactly once
        val healed = TextIndex.readState(store2, "ti")
        val liveSt = TextIndex.readState(storeLive2, "ti")
        assert(healed.nDocs == liveSt.nDocs && healed.sumDl == liveSt.sumDl,
          s"stats double-applied: $healed vs $liveSt")
      } finally { store2.destroy(); storeLive2.destroy() }
    } finally { store.destroy(); storeLive.destroy() }
  }

  test("batch-verb crash window: loud pending, resumeInsert heals, wrong batch refused") {
    val store = newStore()
    val storeFull = newStore()
    try {
      val standing = docs.filter(col("doc_id") % 2 === 0)
      val batch = docs.filter(col("doc_id") % 2 === 1)
      TextIndex.buildTextIndex(store, "ti", standing, "text", "doc_id", nBuckets = 8)
      // simulate the crash: intent recorded + HALF the postings landed,
      // stats never committed
      val posts = TextIndex.postingsOf(batch, "text", "doc_id", 8)
      val r = posts.select("doc_id", "dl").distinct()
        .agg(org.apache.spark.sql.functions.count(lit(1)),
          org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.sum(col("dl")), lit(0L))).head
      val st0 = TextIndex.readState(store, "ti")
      TextIndex.writeState(store, "ti", st0.copy(pending = Some(
        TextIndex.PendingBatch(TextIndex.BatchVerbIntent, r.getLong(0), r.getLong(1)))))
      store.append("ti", posts.filter(col("tf") % 2 === 1), partitionBy = Seq("bucket"))
      // every verb refuses the pending index — no silently-stale idf
      intercept[IllegalArgumentException] {
        TextIndex.bm25SearchStored(spark, store, "ti", Seq("join"), k = 5)
      }
      intercept[IllegalArgumentException] {
        TextIndex.insertIntoTextIndex(store, "ti", batch, "text", "doc_id")
      }
      // resuming with a DIFFERENT batch is caught by the intent guard
      intercept[IllegalArgumentException] {
        TextIndex.resumeInsert(store, "ti", batch.limit(3), "text", "doc_id")
      }
      // the same batch heals: torn rows complete, stats apply once
      TextIndex.resumeInsert(store, "ti", batch, "text", "doc_id")
      assert(TextIndex.readState(store, "ti").pending.isEmpty)
      TextIndex.buildTextIndex(storeFull, "ti", docs, "text", "doc_id", nBuckets = 8)
      val a = TextIndex.bm25SearchStored(spark, store, "ti", Seq("join", "query"), k = 12)
        .collect().toSeq
      val b = TextIndex.bm25SearchStored(spark, storeFull, "ti", Seq("join", "query"), k = 12)
        .collect().toSeq
      assert(a == b, "healed batch-verb index diverged from full rebuild")
      // with nothing pending, resumeInsert refuses
      intercept[IllegalStateException] {
        TextIndex.resumeInsert(store, "ti", batch, "text", "doc_id")
      }
    } finally { store.destroy(); storeFull.destroy() }
  }

  test("compaction crash states replay: staged+journal, mid-promote; reads refuse") {
    val store = newStore()
    try {
      TextIndex.buildTextIndex(store, "ti",
        docs.filter(col("doc_id") % 4 <= 1), "text", "doc_id", nBuckets = 8)
      TextIndex.insertIntoTextIndex(store, "ti",
        docs.filter(col("doc_id") % 4 === 2), "text", "doc_id")
      TextIndex.insertIntoTextIndex(store, "ti",
        docs.filter(col("doc_id") % 4 === 3), "text", "doc_id")
      val want = TextIndex.bm25SearchStored(spark, store, "ti",
        Seq("order", "group"), k = 12).collect().toSeq
      val rowsBefore = store.read(spark, "ti").count()
      // crash shape: stage fully written + journal committed, promote
      // never ran — reproduce by hand with the operator's own layout
      val collDir = s"${store.root}/ti"
      val sfs = graft.store.StoreFs.forPath(store.root)
      val dirty = Seq(0, 1)
      store.read(spark, "ti")
        .filter(col("bucket").isin(dirty.map(Int.box): _*))
        .repartition(dirty.length, col("bucket"))
        .write.partitionBy("bucket").parquet(s"$collDir/_compact_stage")
      val props = new java.util.Properties()
      props.setProperty("buckets", dirty.mkString(","))
      sfs.writePropsAtomic(s"$collDir/_compact.properties", props, "test journal")
      // deepen the crash on bucket 0: live already shadowed (the state
      // between the two renames)
      sfs.deleteTree(s"$collDir/_old_bucket=0")
      assert(sfs.rename(s"$collDir/bucket=0", s"$collDir/_old_bucket=0"))
      // reads refuse while the journal exists
      intercept[IllegalArgumentException] {
        TextIndex.bm25SearchStored(spark, store, "ti", Seq("join"), k = 5)
      }
      // the next compactIndex call replays the promote to completion
      val resumed = TextIndex.compactIndex(spark, store, "ti", maxFilesPerBucket = 1)
      assert(resumed.contains(0) && resumed.contains(1), s"resumed: $resumed")
      assert(!sfs.exists(s"$collDir/_compact.properties"))
      assert(!sfs.exists(s"$collDir/_compact_stage"))
      assert(!sfs.exists(s"$collDir/_old_bucket=0"))
      assert(store.read(spark, "ti").count() == rowsBefore,
        "replayed compaction lost or duplicated postings")
      val got = TextIndex.bm25SearchStored(spark, store, "ti",
        Seq("order", "group"), k = 12).collect().toSeq
      assert(got == want, "search changed across the crash-replayed compaction")
    } finally store.destroy()
  }

  test("build refuses duplicate ids even when the duplicate texts differ in length") {
    val store = newStore()
    try {
      val dup = docs.limit(1).withColumn("doc_id", lit(888888L))
        .unionByName(docs.limit(2).filter(col("doc_id") =!= docs.limit(1)
          .collect().head.getLong(0))
          .limit(1).withColumn("doc_id", lit(888888L)))
      val ex = intercept[IllegalArgumentException] {
        TextIndex.buildTextIndex(store, "ti_dup2",
          docs.unionByName(dup), "text", "doc_id", nBuckets = 4)
      }
      assert(ex.getMessage.contains("duplicate"))
    } finally store.destroy()
  }

  test("append refuses existing doc ids; search refuses a non-index collection") {
    val store = newStore()
    try {
      TextIndex.buildTextIndex(store, "ti", docs, "text", "doc_id", nBuckets = 4)
      val ex = intercept[IllegalArgumentException] {
        TextIndex.insertIntoTextIndex(store, "ti", docs.limit(5), "text", "doc_id")
      }
      assert(ex.getMessage.contains("append semantics"))
      // in-batch duplicate NEW ids refuse too (raw-batch contract — the
      // grouped postings would have collapsed the duplicate silently)
      val fresh = docs.limit(1).withColumn("doc_id", lit(999999L))
      val exDup = intercept[IllegalArgumentException] {
        TextIndex.insertIntoTextIndex(store, "ti",
          fresh.unionByName(fresh), "text", "doc_id")
      }
      assert(exDup.getMessage.contains("duplicate"))
      // a build over a corpus with duplicate ids refuses outright
      val exBuild = intercept[IllegalArgumentException] {
        TextIndex.buildTextIndex(store, "ti_dup",
          docs.limit(3).unionByName(docs.limit(3)), "text", "doc_id",
          nBuckets = 4)
      }
      assert(exBuild.getMessage.contains("duplicate"))
      store.create("plain", docs.limit(10))
      val ex2 = intercept[IllegalStateException] {
        TextIndex.bm25SearchStored(spark, store, "plain", Seq("join"), k = 5)
      }
      assert(ex2.getMessage.contains("not a text index"))
    } finally store.destroy()
  }
}
