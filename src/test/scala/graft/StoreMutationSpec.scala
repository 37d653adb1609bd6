package graft

import graft.store.{MutableCollection, VectorStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Id-level mutation (upsert / update / delete / get) over the store —
  * the merge-on-read tombstone contract of
  * [[graft.store.MutableCollection]]. */
class StoreMutationSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() = VectorStore(
    java.nio.file.Files.createTempDirectory("graft_mut_spec").toString)

  private def base: DataFrame =
    Seq((1L, "a", "one"), (2L, "a", "two"), (3L, "b", "three"),
      (4L, "b", "four"), (5L, "c", "five"))
      .toDF("id", "src", "text")

  private def liveMap(mc: MutableCollection): Map[Long, (String, String)] =
    mc.readLive(spark).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap

  private def hasIdBloom(f: java.io.File): Boolean = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.getAbsolutePath),
      spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      import scala.jdk.CollectionConverters._
      r.getFooter.getBlocks.asScala.forall(_.getColumns.asScala
        .filter(_.getPath.toDotString == "id")
        .forall(_.getBloomFilterOffset >= 0))
    } finally r.close()
  }

  test("createMutable + readLive round-trips and hides bookkeeping") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    val live = mc.readLive(spark)
    assert(live.columns.toSeq == Seq("id", "src", "text")) // no _graft_seq
    assert(live.count() == 5)
    // raw read sees the seq column (dead-version semantics documented)
    assert(store.read(spark, "c").columns.contains(MutableCollection.SeqCol))
    store.destroy()
  }

  test("upsert replaces existing ids and inserts new ones") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    mc.upsert(Seq((2L, "a", "TWO"), (6L, "d", "six")).toDF("id", "src", "text"))
    val m = liveMap(mc)
    assert(m.size == 6)
    assert(m(2L) == ("a", "TWO")) // replaced
    assert(m(6L) == ("d", "six")) // inserted
    assert(m(1L) == ("a", "one")) // untouched
    store.destroy()
  }

  test("compaction report: exact dead accounting, ppm recommendation, reclaim visible after compactDirty") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id") // 5 rows, seq 1
    // fresh collection: nothing dead, no recommendation at any threshold
    val fresh = mc.compactionReport(spark, minDeadFraction = 0.01).head
    assert(fresh.getLong(0) == 5 && fresh.getLong(1) == 0 &&
      fresh.getDouble(3) == 0.0 && !fresh.getBoolean(4))
    mc.upsert(Seq((1L, "a", "ONE"), (2L, "a", "TWO")).toDF("id", "src", "text"))
    mc.delete(Seq(3L).toDF("id"))
    // 7 versions: seq-1 rows for ids 1,2 superseded, id 3 deleted -> 3 dead
    val rep = mc.compactionReport(spark, minDeadFraction = 0.3).head
    assert(rep.getLong(0) == 7 && rep.getLong(1) == 3 && rep.getLong(2) == 4,
      s"wrong ledger: $rep")
    assert(rep.getDouble(3) == 0.428571, s"ratio: $rep")
    assert(rep.getBoolean(4)) // 3/7 >= 0.3
    // boundary is integer-exact: at exactly the ratio it still recommends,
    // one ppm above it does not
    assert(mc.compactionReport(spark, 3.0 / 7).head.getBoolean(4))
    assert(!mc.compactionReport(spark, 0.428572).head.getBoolean(4))
    // act on the recommendation: the rewrite reclaims the dead versions
    // and the report agrees afterwards (live view untouched)
    val before = mc.readLive(spark).orderBy("id").collect().toSeq
    assert(mc.compactDirty(spark, minDeadFraction = 0.3).nonEmpty)
    val after = mc.compactionReport(spark, minDeadFraction = 0.3).head
    assert(after.getLong(1) == 0 && !after.getBoolean(4), s"not reclaimed: $after")
    assert(mc.readLive(spark).orderBy("id").collect().toSeq == before)
    store.destroy()
  }

  test("delete removes ids; later upsert resurrects them") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    mc.deleteIds(spark, Seq(1L, 3L))
    assert(liveMap(mc).keySet == Set(2L, 4L, 5L))
    mc.upsert(Seq((3L, "b", "three-again")).toDF("id", "src", "text"))
    val m = liveMap(mc)
    assert(m.keySet == Set(2L, 3L, 4L, 5L))
    assert(m(3L) == ("b", "three-again"))
    store.destroy()
  }

  test("update rewrites only the provided columns; unknown ids are skipped") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    mc.update(spark, Seq((2L, "TWO"), (99L, "ninety-nine")).toDF("id", "text"))
    val m = liveMap(mc)
    assert(m(2L) == ("a", "TWO")) // src kept, text replaced
    assert(!m.contains(99L)) // unknown id skipped (Chroma warns-and-skips)
    assert(m.size == 5)
    store.destroy()
  }

  test("update is delta-bounded: batch ids reach the live scan as PushedFilters; big-batch join path agrees") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    // small batch: the live read under the merge must carry In(id, ...)
    // — the scan is row-group-pruned, not a corpus pass
    mc.update(spark, Seq((2L, "TWO")).toDF("id", "text"))
    val lastWrite = spark.read.parquet(s"${store.root}/c")
      .filter(col(MutableCollection.SeqCol) === mc.currentSeq)
    assert(lastWrite.collect().map(r => (r.getLong(0), r.getString(2))).toSeq
      == Seq((2L, "TWO")))
    // forcing the join path (zero In budget) produces the same merge
    spark.conf.set(MutableCollection.IsinMaxIdsConf, "0")
    try mc.update(spark, Seq((3L, "THREE"), (99L, "ghost")).toDF("id", "text"))
    finally spark.conf.unset(MutableCollection.IsinMaxIdsConf)
    val m = liveMap(mc)
    assert(m(2L) == ("a", "TWO") && m(3L) == ("b", "THREE") && !m.contains(99L))
    store.destroy()
  }

  test("every mutable-collection file carries an id bloom filter (create, upsert, tombstones, compact)") {
    // random ids make row-group min/max useless for the delta-bounded
    // id lookups — the bloom is what prunes; a write path that silently
    // drops it turns every bounded read back into a corpus scan
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    mc.upsert(Seq((6L, "d", "six")).toDF("id", "src", "text"))
    mc.deleteIds(spark, Seq(1L))
    def parquetFiles(sub: String) =
      Option(new java.io.File(s"${store.root}/c$sub").listFiles())
        .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet")).toSeq
    val dataFiles = parquetFiles("")
    val tombFiles = parquetFiles("/_tombstones")
    assert(dataFiles.nonEmpty && tombFiles.nonEmpty)
    (dataFiles ++ tombFiles).foreach(f =>
      assert(hasIdBloom(f), s"missing id bloom: ${f.getName}"))
    mc.compact(spark)
    val afterCompact = parquetFiles("")
    assert(afterCompact.nonEmpty)
    afterCompact.foreach(f =>
      assert(hasIdBloom(f), s"compaction stripped the id bloom: ${f.getName}"))
    store.destroy()
  }

  test("get returns live versions only") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    mc.upsert(Seq((2L, "a", "TWO")).toDF("id", "src", "text"))
    mc.deleteIds(spark, Seq(1L))
    val got = mc.get(spark, Seq(1L, 2L, 3L)).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(2L -> "TWO", 3L -> "three"))
    store.destroy()
  }

  test("compact folds tombstones: live view identical, log truncated, raw read shrinks") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    mc.upsert(Seq((2L, "a", "TWO"), (6L, "d", "six")).toDF("id", "src", "text"))
    mc.deleteIds(spark, Seq(4L))
    val before = liveMap(mc)
    val rawBefore = store.read(spark, "c").count() // 5 base + 2 upsert = 7
    assert(rawBefore == 7)
    mc.compact(spark)
    assert(liveMap(mc) == before)
    assert(store.read(spark, "c").count() == before.size.toLong) // dead gone
    // post-compact mutation still works (seq survives the swap)
    mc.deleteIds(spark, Seq(5L))
    assert(!liveMap(mc).contains(5L))
    store.destroy()
  }

  test("readLive plans a broadcast tombstone join and skips it with no tombstones") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    // no tombstones: plan has no join at all
    val clean = mc.readLive(spark).queryExecution.executedPlan.toString
    assert(!clean.contains("Join"), s"expected no join, got:\n$clean")
    mc.deleteIds(spark, Seq(1L))
    val plan = mc.readLive(spark).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"tombstone merge must be a broadcast join, got:\n$plan")
    store.destroy()
  }

  test("duplicate ids within one upsert batch are rejected") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    val ex = intercept[IllegalArgumentException] {
      mc.upsert(Seq((7L, "x", "s1"), (7L, "x", "s2")).toDF("id", "src", "text"))
    }
    assert(ex.getMessage.contains("duplicate ids"))
    store.destroy()
  }

  test("upsert schema drift is rejected up front") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    val ex = intercept[IllegalArgumentException] {
      mc.upsert(Seq((7L, "x")).toDF("id", "src")) // missing text
    }
    assert(ex.getMessage.contains("schema mismatch"))
    store.destroy()
  }

  test("immutable collections reject mutation; mutable reject raw append and file compact") {
    val store = freshStore()
    store.create("plain", base)
    val ex1 = intercept[IllegalArgumentException] { store.mutable("plain") }
    assert(ex1.getMessage.contains("not mutable"))
    store.createMutable("mut", base, "id")
    val ex2 = intercept[IllegalArgumentException] { store.append("mut", base) }
    assert(ex2.getMessage.contains("mutable"))
    val ex3 = intercept[IllegalArgumentException] { store.compact(spark, "mut") }
    assert(ex3.getMessage.contains("tombstone"))
    store.destroy()
  }

  test("deleteWhere / getWhere evaluate the where-DSL against CURRENT versions") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    // move id 3 out of src 'b' FIRST — deleteWhere on src=b must not
    // touch it (current version no longer matches)
    mc.upsert(Seq((3L, "moved", "three")).toDF("id", "src", "text"))
    mc.deleteWhere(spark, """{"src": "b"}""")
    assert(liveMap(mc).keySet == Set(1L, 2L, 3L, 5L)) // only 4 (still b) died
    assert(mc.getWhere(spark, """{"src": {"$ne": "a"}}""")
      .collect().map(_.getLong(0)).toSet == Set(3L, 5L))
    store.destroy()
  }

  test("bound search over a mutable collection sees the live view (upserted text, deleted ids gone)") {
    import graft.embed.{Embedders, HashEmbedder}
    val store = freshStore()
    val (pe, qe) = Embedders.asymmetric(p => HashEmbedder(16, p))
    val m = graft.store.CollectionManifest.of(pe, qe)
    val chunks = Seq(
      (1L, "spark shuffles data across executors"),
      (2L, "parquet stores columns together"),
      (3L, "broadcast joins avoid the shuffle"))
      .toDF("id", "chunk")
    val mc = store.createMutable("kb",
      Embedders.embed(chunks, "chunk", "embedding", pe), "id",
      manifest = Some(m))
    // replace chunk 2's content and delete chunk 3; the search surface
    // must track the mutation, not the raw files
    mc.upsert(Embedders.embed(
      Seq((2L, "columnar parquet layout prunes reads")).toDF("id", "chunk"),
      "chunk", "embedding", pe))
    mc.deleteIds(spark, Seq(3L))
    val res = graft.query.RagSearch.searchBound(spark, store, "kb",
      "parquet columns", nResults = 3, metadataCols = Nil)
    assert(res.error.isEmpty, s"search errored: ${res.error}")
    val byId = res.results.map(h => h.id -> h.content).toMap
    assert(byId.keySet == Set("1", "2")) // 3 deleted, nothing stale
    assert(byId("2") == "columnar parquet layout prunes reads")
    // count() is the live count
    assert(store.count(spark, "kb") == 2)
    store.destroy()
  }

  test("snapshot reads reconstruct every retained historical state; compact raises the floor") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    def snapMap(s: Long): Map[Long, (String, String)] =
      mc.readLiveAt(spark, s).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val s0 = mc.currentSeq // 0: as created
    val v0 = liveMap(mc)
    mc.upsert(Seq((2L, "a", "TWO"), (6L, "d", "six")).toDF("id", "src", "text"))
    val s1 = mc.currentSeq
    val v1 = liveMap(mc)
    mc.deleteIds(spark, Seq(4L, 6L))
    val s2 = mc.currentSeq
    val v2 = liveMap(mc)
    mc.upsert(Seq((4L, "b", "four-again")).toDF("id", "src", "text"))
    val s3 = mc.currentSeq
    val v3 = liveMap(mc)
    // every historical live view reconstructs from the same files
    assert(snapMap(s0) == v0)
    assert(snapMap(s1) == v1)
    assert(snapMap(s2) == v2)
    assert(snapMap(s3) == v3)
    // a sequence that was never allocated is an error, not an empty frame
    val exFuture = intercept[IllegalArgumentException] { mc.readLiveAt(spark, s3 + 1) }
    assert(exFuture.getMessage.contains("does not exist"))
    // compaction folds history: floor rises, older snapshots throw,
    // the floor snapshot itself still reads (== the compacted state)
    mc.compact(spark)
    assert(mc.floorSeq == s3)
    assert(snapMap(s3) == v3)
    val exOld = intercept[IllegalArgumentException] { mc.readLiveAt(spark, s2) }
    assert(exOld.getMessage.contains("predates the last compact"))
    // post-compact mutations keep snapshotting forward
    mc.deleteIds(spark, Seq(5L))
    assert(snapMap(s3) == v3) // pre-delete state still reconstructible
    assert(snapMap(mc.currentSeq) == liveMap(mc))
    store.destroy()
  }

  test("fork: zero-copy writable clone — bytes shared, histories independent") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    mc.upsert(Seq((6L, "d", "six")).toDF("id", "src", "text"))
    val before = liveMap(mc)
    store.fork("c", "branch")
    // data bytes are SHARED (hardlink -> same inode), not duplicated
    val srcFile = store.dataFiles("c").head.toPath
    val ino = java.nio.file.Files.getAttribute(srcFile, "unix:ino")
    val linked = store.dataFiles("branch").map(f =>
      java.nio.file.Files.getAttribute(f.toPath, "unix:ino")).contains(ino)
    assert(linked, "expected at least one shared inode between source and fork")
    // the fork mutates independently; the source never sees it
    val br = store.mutable("branch")
    br.upsert(Seq((1L, "a", "FORKED")).toDF("id", "src", "text"))
    br.deleteIds(spark, Seq(5L))
    assert(liveMap(mc) == before, "source changed by a fork mutation")
    val bm = liveMap(br)
    assert(bm(1L) == ("a", "FORKED") && !bm.contains(5L) && bm(6L) == ("d", "six"))
    // and the other direction: source mutations invisible to the fork
    mc.deleteIds(spark, Seq(4L))
    assert(liveMap(br).contains(4L))
    // compacting the fork (rewrites+swaps ITS directory) leaves source intact
    br.compact(spark)
    assert(liveMap(mc).keySet == before.keySet - 4L)
    assert(liveMap(br) == bm)
    store.destroy()
  }

  test("tenant/database addressing: isolated roots, verbs unchanged, no path escape") {
    val root = java.nio.file.Files.createTempDirectory("graft_tenants").toString
    val s1 = VectorStore.forTenant(root, "acme", "vectors")
    s1.create("kb", base)
    assert(s1.list() == Seq("kb"))
    assert(VectorStore.forTenant(root, "acme", "other").list().isEmpty)
    assert(VectorStore.forTenant(root, "globex", "vectors").list().isEmpty)
    val ex = intercept[IllegalArgumentException] {
      VectorStore.forTenant(root, "../evil", "db")
    }
    assert(ex.getMessage.contains("path segments"))
    VectorStore(root).destroy()
  }

  test("rename moves every sidecar; peek and getPage read the live view in id order") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    mc.upsert(Seq((6L, "d", "six")).toDF("id", "src", "text"))
    mc.deleteIds(spark, Seq(2L))
    store.rename("c", "c2")
    assert(store.list() == Seq("c2"))
    val mc2 = store.mutable("c2") // marker + tombstones travelled
    assert(liveMap(mc2).keySet == Set(1L, 3L, 4L, 5L, 6L))
    assert(store.peek(spark, "c2", 2, idCol = "id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L)) // live order, no dead 2
    assert(mc2.getPage(spark, limit = 2, offset = 2)
      .collect().map(_.getLong(0)).toSeq == Seq(4L, 5L))
    assert(mc2.getPage(spark, limit = 10, offset = 4)
      .collect().map(_.getLong(0)).toSeq == Seq(6L)) // short last page
    val ex = intercept[IllegalArgumentException] { store.rename("nope", "x") }
    assert(ex.getMessage.contains("does not exist"))
    val ex2 = intercept[IllegalArgumentException] { store.rename("c2", "c2") }
    assert(ex2.getMessage.contains("already exists"))
    // reserved compaction suffixes and path separators are rejected —
    // "x__old" would be deleted by a later compact of "x" or silently
    // renamed by crash recovery
    val ex3 = intercept[IllegalArgumentException] { store.rename("c2", "x__old") }
    assert(ex3.getMessage.contains("staging suffixes"))
    val ex4 = intercept[IllegalArgumentException] { store.rename("c2", "a/b") }
    assert(ex4.getMessage.contains("path segment"))
    // getPage overflow guard: arguments its precondition accepts must
    // not surface as a negative-limit analysis error
    val ex5 = intercept[IllegalArgumentException] {
      mc2.getPage(spark, limit = 2, offset = Int.MaxValue)
    }
    assert(ex5.getMessage.contains("overflows"))
    store.destroy()
  }

  test("deleteWhereDocument / getWhereDocument test CONTENT of current versions") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    // rewrite id 2's text so the content filter sees the CURRENT version
    mc.upsert(Seq((2L, "a", "rewritten")).toDF("id", "src", "text"))
    assert(mc.getWhereDocument(spark, """{"$contains": "ree"}""", "text")
      .collect().map(_.getLong(0)).toSet == Set(3L)) // "three"; "two" is gone
    mc.deleteWhereDocument(spark, """{"$or": [{"$contains": "rewritten"}, {"$contains": "five"}]}""", "text")
    assert(liveMap(mc).keySet == Set(1L, 3L, 4L))
    store.destroy()
  }

  test("changesBetween classifies insert/update/delete with the right payloads") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    val s0 = mc.currentSeq
    mc.upsert(Seq((2L, "a", "TWO"), (6L, "d", "six")).toDF("id", "src", "text"))
    mc.deleteIds(spark, Seq(4L))
    mc.update(spark, Seq((5L, "edited")).toDF("id", "src"))
    val diff = mc.changesBetween(spark, s0, mc.currentSeq)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(r => (r._1, r._2))
    assert(diff.toSeq == Seq(
      ("delete", 4L, "b", "four"), // OLD payload
      ("insert", 6L, "d", "six"),
      ("update", 2L, "a", "TWO"), // NEW payload
      ("update", 5L, "edited", "five")))
    // a row UPDATED then DELETED within the span reports its fromSeq
    // values (the diff is between endpoint states, not a history replay)
    mc.update(spark, Seq((3L, "patched")).toDF("id", "src"))
    mc.deleteIds(spark, Seq(3L))
    val d3 = mc.changesBetween(spark, s0, mc.currentSeq)
      .filter(col("id") === 3L).collect().map(r =>
        (r.getString(0), r.getString(2), r.getString(3))).toSeq
    assert(d3 == Seq(("delete", "b", "three"))) // seq-0 values, not "patched"
    // identical endpoints -> empty; reversed endpoints -> error
    assert(mc.changesBetween(spark, mc.currentSeq, mc.currentSeq).isEmpty)
    val ex = intercept[IllegalArgumentException] {
      mc.changesBetween(spark, mc.currentSeq, s0)
    }
    assert(ex.getMessage.contains("fromSeq"))
    store.destroy()
  }

  test("changesBetween is delta-bounded: seq-range pushdown + semi-join resolution, no corpus shuffle") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    val s0 = mc.currentSeq
    mc.upsert(Seq((2L, "a", "TWO"), (6L, "d", "six")).toDF("id", "src", "text"))
    mc.deleteIds(spark, Seq(4L))
    // (1) the touched-id delta scan carries the (from, to] span as
    // PushedFilters on the hidden seq columns — parquet min/max stats
    // prune to O(delta) files (each batch writes files of constant seq)
    val deltaPlan = mc.touchedIdsDelta(spark, s0, mc.currentSeq)
      .queryExecution.executedPlan.toString
    assert(deltaPlan.contains(s"GreaterThan(${MutableCollection.SeqCol},$s0)") &&
      deltaPlan.contains(s"LessThanOrEqual(${MutableCollection.SeqCol},"),
      s"data-side seq span must reach PushedFilters, got:\n$deltaPlan")
    assert(deltaPlan.contains(s"GreaterThan(${MutableCollection.DelSeqCol},$s0)"),
      s"tombstone-side seq span must reach PushedFilters, got:\n$deltaPlan")
    // baseline: the tiny spec collection takes the small-collection
    // tier — one plain full-outer job, no probe overhead
    val cdc = mc.changesBetween(spark, s0, mc.currentSeq)
    assert(!cdc.queryExecution.executedPlan.toString.contains("LeftSemi"),
      "small collections must diff with the one-job full-outer shape")
    val expect = cdc.collect().map(_.toString).sorted.toSeq
    // (2) small delta on a BIG collection (forced via the size conf):
    // the touched id set is pushed as an In predicate into BOTH
    // snapshot scans — endpoint resolution costs no join at all; the
    // only join left is the O(delta) full-outer diff, never a
    // corpus-keyed shuffle
    spark.conf.set(MutableCollection.SmallCollectionBytesConf, "0")
    try {
      val small = mc.changesBetween(spark, s0, mc.currentSeq)
      val cdcPlan = small.queryExecution.executedPlan.toString
      val inScans = cdcPlan.linesIterator.count(l =>
        l.contains("PushedFilters") && l.contains("In(id"))
      assert(inScans >= 2,
        s"touched ids must reach PushedFilters of both snapshot scans, got $inScans in:\n$cdcPlan")
      assert(!cdcPlan.contains("LeftSemi"),
        s"small delta must resolve by In pushdown, not joins:\n$cdcPlan")
      assert(small.collect().map(_.toString).sorted.toSeq == expect,
        "In-pushdown tier must produce the identical change set")
      // (3) an oversized delta degrades to broadcast semi-joins (forced
      // here with a zero In budget) and produces the identical change set
      spark.conf.set(MutableCollection.IsinMaxIdsConf, "0")
      val big = mc.changesBetween(spark, s0, mc.currentSeq)
      val bigPlan = big.queryExecution.executedPlan.toString
      val semiJoins = bigPlan.linesIterator.count(l =>
        l.contains("BroadcastHashJoin") && l.contains("LeftSemi"))
      assert(semiJoins == 2,
        s"semi-join tier must gate both snapshot views, got $semiJoins in:\n$bigPlan")
      assert(big.collect().map(_.toString).sorted.toSeq == expect,
        "semi-join tier must produce the identical change set")
      // (4) an untouched span answers empty with no snapshot scan at all
      val empty = mc.changesBetween(spark, mc.currentSeq, mc.currentSeq)
      assert(empty.isEmpty && empty.queryExecution.executedPlan.toString
        .contains("LocalTableScan"),
        "empty span must short-circuit to a local empty relation")
    } finally {
      spark.conf.unset(MutableCollection.IsinMaxIdsConf)
      spark.conf.unset(MutableCollection.SmallCollectionBytesConf)
    }
    store.destroy()
  }

  test("snapshot seq bound is pushed into the parquet scan") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    mc.upsert(Seq((2L, "a", "TWO")).toDF("id", "src", "text"))
    val plan = mc.readLiveAt(spark, 1L).queryExecution.executedPlan.toString
    assert(plan.contains(s"LessThanOrEqual(${MutableCollection.SeqCol},1)"),
      s"seq bound must reach PushedFilters, got:\n$plan")
    store.destroy()
  }

  test("sequence allocation is crash-safe: marker advances before data lands") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    mc.upsert(Seq((6L, "d", "six")).toDF("id", "src", "text")) // seq 1
    mc.deleteIds(spark, Seq(1L)) // seq 2
    val marker = MutableCollection.Marker.read(s"${store.root}/c").get
    assert(marker == MutableCollection.Marker("id", 2L))
    // a reader that opens the collection mid-write never sees a torn
    // marker (atomic rename) — simulate by re-opening
    assert(store.mutable("c").idCol == "id")
    store.destroy()
  }

  private def dataFileNames(store: VectorStore, name: String): Set[String] =
    Option(new java.io.File(s"${store.root}/$name").listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet

  test("compactDirty rewrites only files past the dead threshold; live view unchanged") {
    val store = freshStore()
    // coalesce(1): ONE seq-0 file of 5 rows, so per-file dead fractions
    // are exact (an uncoalesced local Seq splits across tasks, and a
    // one-row file holding a killed id would be 100% dead)
    val mc = store.createMutable("c", base.coalesce(1), "id")
    mc.upsert(Seq((1L, "a", "ONE"), (2L, "a", "TWO"))
      .toDF("id", "src", "text").coalesce(1)) // kills 2/5 of the seq-0 file (40% dead)
    mc.upsert(Seq((6L, "d", "six")).toDF("id", "src", "text").coalesce(1)) // 0% dead file
    val before = liveMap(mc)
    val filesBefore = dataFileNames(store, "c")
    // threshold above the dirtiest file: NOTHING moves — no rewrite, no
    // floor raise, no file churn
    assert(mc.compactDirty(spark, minDeadFraction = 0.5).isEmpty)
    assert(dataFileNames(store, "c") == filesBefore && mc.floorSeq == 0L)
    // threshold below: exactly the seq-0 files rewrite; the clean
    // upsert files survive untouched
    val rewritten = mc.compactDirty(spark, minDeadFraction = 0.3)
    assert(rewritten.nonEmpty)
    val filesAfter = dataFileNames(store, "c")
    assert(rewritten.toSet.subsetOf(filesBefore))
    assert((filesBefore -- rewritten.toSet).subsetOf(filesAfter),
      "clean files must survive a targeted compaction untouched")
    assert((filesAfter & rewritten.toSet).isEmpty, "dirty originals must be gone")
    assert(liveMap(mc) == before, "the live view is invariant under compactDirty")
    // rewritten files carry only live rows, keep the seq column, and
    // keep the id bloom the delta-bounded reads rely on
    val promoted = filesAfter -- filesBefore
    assert(promoted.nonEmpty)
    promoted.foreach { n =>
      assert(hasIdBloom(new java.io.File(s"${store.root}/c/$n")),
        s"rewritten file lost the id bloom: $n")
    }
    val promotedRows = spark.read.parquet(
      promoted.map(n => s"${store.root}/c/$n").toSeq: _*)
    assert(promotedRows.columns.contains(MutableCollection.SeqCol))
    assert(promotedRows.select("id").as[Long].collect().sorted.toSeq ==
      Seq(3L, 4L, 5L)) // exactly the seq-0 survivors, nothing dead
    // dead versions are physically gone -> snapshots below the floor
    // are refused, exactly like a full compact
    assert(mc.floorSeq == mc.currentSeq)
    intercept[IllegalArgumentException](mc.readLiveAt(spark, 0L))
    // later mutations + a second targeted pass compose
    mc.deleteIds(spark, Seq(3L))
    assert(mc.compactDirty(spark, minDeadFraction = 0.2).nonEmpty)
    assert(liveMap(mc) == before - 3L)
    store.destroy()
  }

  test("compactDirty with no tombstones is a no-op") {
    val store = freshStore()
    val mc = store.createMutable("c", base, "id")
    assert(mc.compactDirty(spark).isEmpty)
    assert(liveMap(mc) == liveMap(mc))
    store.destroy()
  }

  test("an interrupted compactDirty journal replays idempotently on the next verb") {
    val store = freshStore()
    val mc = store.createMutable("c", base.coalesce(1), "id")
    val orig = dataFileNames(store, "c")
    assert(orig.size == 1)
    val origName = orig.head
    val dir = s"${store.root}/c"
    // simulate the crash point RIGHT AFTER the atomic journal commit:
    // stage a rewritten file (here: a byte-copy standing in for the
    // rewrite of the original) and journal promote+delete, then die
    // before executing — the on-disk state compactDirty leaves if the
    // process is killed at its point of no return
    val stagedName = "part-replay-test.parquet"
    val stageDir = new java.io.File(dir, MutableCollection.RewriteStageDir)
    assert(stageDir.mkdir())
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(dir, origName),
      java.nio.file.Paths.get(stageDir.getPath, stagedName))
    val props = new java.util.Properties() // the journal's stable format
    props.setProperty("stage", MutableCollection.RewriteStageDir)
    props.setProperty("delete.0", origName)
    props.setProperty("promote.0", stagedName)
    val out = new java.io.FileOutputStream(
      new java.io.File(dir, MutableCollection.JournalFile))
    try props.store(out, "test journal") finally out.close()
    // the next verb through the handle replays the journal first
    assert(mc.countLive(spark) == 5)
    val after = dataFileNames(store, "c")
    assert(after == Set(stagedName), s"journal not replayed: $after")
    assert(!new java.io.File(dir, MutableCollection.JournalFile).exists())
    assert(!stageDir.exists())
    // a second pass over the already-replayed state changes nothing
    assert(mc.countLive(spark) == 5)
    assert(dataFileNames(store, "c") == Set(stagedName))
    store.destroy()
  }

  test("compactTombstones folds the log to max-seq per id; live view unchanged; stranded swap heals") {
    val store = freshStore()
    val mc = store.createMutable("c", base.coalesce(1), "id")
    // churn one id repeatedly: the log gains one entry per write
    mc.upsert(Seq((1L, "a", "v1")).toDF("id", "src", "text").coalesce(1))
    mc.upsert(Seq((1L, "a", "v2")).toDF("id", "src", "text").coalesce(1))
    mc.deleteIds(spark, Seq(2L))
    val dir = s"${store.root}/c"
    val tombDir = s"$dir/${MutableCollection.TombstonesDir}"
    val logBefore = spark.read.parquet(tombDir)
    assert(logBefore.count() == 3) // 2 upsert tombstones for id 1 + delete of id 2
    val before = liveMap(mc)
    mc.compactTombstones(spark)
    val logAfter = spark.read.parquet(tombDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(logAfter == Map(1L -> 2L, 2L -> 3L), s"fold wrong: $logAfter")
    assert(liveMap(mc) == before, "live view changed under a log fold")
    assert(mc.floorSeq == mc.currentSeq) // history between tombstones is gone
    // folding an already-folded log is a no-op in content
    mc.compactTombstones(spark)
    assert(liveMap(mc) == before)
    // stranded swap (crash between the two renames): log only under
    // __old — the crash killed that process, so recovery happens
    // through the NEXT process's fresh handle (recovery probes are
    // memoized per handle to keep them off the marker hot path)
    assert(new java.io.File(tombDir).renameTo(
      new java.io.File(s"$dir/${MutableCollection.TombstonesDir}__old")))
    val mc2 = store.mutable("c")
    assert(liveMap(mc2) == before, "stranded log not healed — deletes resurrected")
    assert(new java.io.File(tombDir).isDirectory)
    store.destroy()
  }

  test("createMutable refuses a partitioned layout") {
    val store = freshStore()
    val e = intercept[IllegalArgumentException](
      store.createMutable("c", base, "id", partitionBy = Seq("src")))
    assert(e.getMessage.contains("partition"))
    store.destroy()
  }
}
