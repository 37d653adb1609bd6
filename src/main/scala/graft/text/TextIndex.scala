package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.{StoreFs, VectorStore}

/** STORED inverted text index + BM25 search over the persisted layout —
  * the keyword-retrieval twin of the stored vector indexes
  * ([[graft.operators.Similarity.buildIvfIndex]] and friends). The
  * reference delegates text relevance to its engine's built-in keyword
  * scoring; here the index is an explicit Spark-native layout:
  *
  *   - '''postings''': one row per (term, doc) pair —
  *     `(term, doc_id, tf, dl)` — PARTITIONED BY `bucket =
  *     pmod(xxhash64(term), nBuckets)`. A query over t terms prunes to
  *     at most t buckets (PartitionFilters, pinned in spec) and then
  *     `term IN (...)` row-group pruning inside them; the scan cost is
  *     O(postings of the query terms), never O(corpus). Bucketing by
  *     term hash (not `partitionBy(term)`) keeps the directory count
  *     fixed at any vocabulary size — a 100 TB corpus has hundreds of
  *     millions of distinct terms, which would otherwise be hundreds of
  *     millions of directories.
  *   - '''corpus statistics''': BM25 needs N (doc count) and avgdl
  *     (mean doc length) over the WHOLE corpus — O(1) numbers, kept in
  *     a `_text_index.properties` sidecar (atomic-replace discipline,
  *     [[graft.store.StoreFs.writePropsAtomic]]) and inlined into the
  *     scoring expression as literals at query time. Per-term document
  *     frequencies need NO sidecar: every posting of a term lives in
  *     that term's bucket, so the pruned scan itself yields exact df.
  *
  * Incremental maintenance is O(batch) by construction: new documents
  * append postings under their terms' bucket directories (dynamic
  * partition append — untouched buckets' files are immutable, spec-
  * pinned) and the sidecar advances additively (long adds — exact), so
  * a search over the maintained index is ROW-IDENTICAL to a from-
  * scratch build over the same corpus: same posting set, same stats,
  * same expression. That identity is under the gate oracle
  * (`text_bm25_incremental` hashes against the same corpus-level SQL
  * as the full build).
  *
  * Scoring parity: [[bm25SearchStored]] reproduces
  * [[TextAnalysis.bm25TopK]]'s arithmetic EXPRESSION-FOR-EXPRESSION
  * (Lucene +1 idf, floor-form rounding). Missing (term, doc) pairs
  * contribute exact 0.0 — same as the inline form's tf=0 branch — and
  * the per-term partial scores are re-assembled in FIXED term order via
  * a singleton-max pivot (never a groupBy sum, whose float addition
  * order is row-order-dependent), so stored results are bit-identical
  * to the inline operator and to the DuckDB oracle.
  */
object TextIndex {

  /** Sidecar file name (`_`-prefixed: invisible to Spark listings);
    * owned by the store layer so the catalog can detect the layout. */
  private[graft] val PropsFile = VectorStore.TextIndexPropsFile

  /** The one tokenizer ([[TextAnalysis.tokens]]) — build and the inline
    * scorer cannot drift. Exposed to the streaming sink so the postings
    * a micro-batch appends come from the same expression. */
  private[graft] def postingsOf(docs: DataFrame, textCol: String, idCol: String,
                                nBuckets: Int): DataFrame =
    graft.Tables.spread(docs)
      // null text folds to "" (one empty-string token) so EVERY doc
      // yields >= 1 posting: a null-text doc would otherwise vanish
      // from postings AND stats, silently breaking the maintained-index
      // == full-rebuild identity
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(coalesce(col(textCol), lit(""))).as("_toks"))
      .withColumn("dl", size(col("_toks")).cast("long"))
      .select(col("doc_id"), col("dl"),
        posexplode(col("_toks")).as(Seq("pos", "term")))
      .groupBy("term", "doc_id", "dl")
      // positions make the layout POSITIONAL (phrase/proximity queries);
      // BM25 never reads them — parquet column pruning keeps its scan as
      // slim as a frequency-only index
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn("bucket", bucketOf(col("term"), nBuckets))
      .select("term", "doc_id", "tf", "dl", "positions", "bucket")

  private def bucketOf(term: Column, nBuckets: Int): Column =
    pmod(xxhash64(term), lit(nBuckets.toLong)).cast("int")

  /** Bucket ids of literal query terms — evaluated through the SAME
    * Spark expression as the build (a |terms|-row local-relation job;
    * bounded, no scan), so driver and layout can never disagree on the
    * hash. */
  private def bucketsOf(spark: SparkSession, terms: Seq[String],
                        nBuckets: Int): Seq[Int] = {
    import spark.implicits._
    terms.toDF("term").select(bucketOf(col("term"), nBuckets))
      .collect().map(_.getInt(0)).toSeq.distinct
  }

  private def statsPath(store: VectorStore, name: String) =
    s"${store.root}/$name/$PropsFile"

  /** Doc-level (doc_id, dl) companion — written at build, appended on
    * insert; makes DELETE stats O(companion scan ∩ batch) instead of a
    * full postings scan (a doc's postings spread across every bucket,
    * its companion row is one slim record). `_`-prefixed: invisible to
    * Spark scans of the collection. */
  private def docsPath(store: VectorStore, name: String) =
    s"${store.root}/$name/_docs"

  /** Doc-id tombstone log — the delete side of the index. Append-only
    * parquet of deleted ids, read `distinct` (re-appended ids are
    * harmless); every read verb anti-joins it. */
  private def deletedPath(store: VectorStore, name: String) =
    s"${store.root}/$name/_deleted"

  /** The tombstone set as a distinct one-column relation, or None when
    * nothing was ever deleted. */
  private[graft] def tombstoneIds(spark: SparkSession, store: VectorStore,
                                  name: String): Option[DataFrame] = {
    val path = deletedPath(store, name)
    if (!StoreFs.forPath(store.root).exists(path)) None
    else Some(spark.read.parquet(path).select("doc_id").distinct())
  }

  /** Anti-join a postings-shaped relation against the tombstones. The
    * broadcast is size-gated off the tombstone log's on-disk bytes and
    * FAILS CLOSED (unmeasurable = too-big = shuffle join), the
    * MutableCollection discipline. */
  private def liveOnly(spark: SparkSession, store: VectorStore, name: String,
                       df: DataFrame): DataFrame =
    tombstoneIds(spark, store, name) match {
      case None => df
      case Some(ts) =>
        val raw = StoreFs.forPath(store.root)
          .treeBytesFailClosed(deletedPath(store, name))
        val est = if (raw > Long.MaxValue / 8) Long.MaxValue else raw * 8
        df.join(graft.operators.BroadcastGate.maybeBroadcast(ts, est),
          Seq("doc_id"), "left_anti")
    }

  /** A streaming batch's write-ahead stats intent (see
    * [[graft.streaming.IndexStream.textBatchSink]]): recorded BEFORE the
    * postings append so the crash window between append and stats
    * commit is healable — the redelivered batch finds its own intent
    * and knows its stats are not yet counted. */
  private[graft] final case class PendingBatch(batchId: Long, nDocs: Long,
                                               sumDl: Long)

  /** The whole sidecar: committed corpus stats, layout geometry, the
    * streaming commit watermark, and an optional in-flight intent. One
    * file, every transition a single atomic replace — stats and
    * watermark can never disagree with each other. */
  private[graft] final case class IndexState(nDocs: Long, sumDl: Long,
                                             nBuckets: Int, lastBatch: Long,
                                             pending: Option[PendingBatch])

  private[graft] def writeState(store: VectorStore, name: String,
                                st: IndexState): Unit = {
    val props = new java.util.Properties()
    props.setProperty("n_docs", st.nDocs.toString)
    props.setProperty("sum_dl", st.sumDl.toString)
    props.setProperty("n_buckets", st.nBuckets.toString)
    props.setProperty("last_batch", st.lastBatch.toString)
    st.pending.foreach { p =>
      props.setProperty("pending_batch", p.batchId.toString)
      props.setProperty("pending_docs", p.nDocs.toString)
      props.setProperty("pending_dl", p.sumDl.toString)
    }
    StoreFs.forPath(store.root).writePropsAtomic(
      statsPath(store, name), props, "graft text index stats")
  }

  private[graft] def readState(store: VectorStore, name: String): IndexState =
    StoreFs.forPath(store.root).readProps(statsPath(store, name)).map { p =>
      val pending = Option(p.getProperty("pending_batch")).map { b =>
        PendingBatch(b.toLong, p.getProperty("pending_docs").toLong,
          p.getProperty("pending_dl").toLong)
      }
      IndexState(p.getProperty("n_docs").toLong, p.getProperty("sum_dl").toLong,
        p.getProperty("n_buckets").toInt,
        Option(p.getProperty("last_batch")).fold(-1L)(_.toLong), pending)
    }.getOrElse(throw new IllegalStateException(
      s"'$name' has no $PropsFile sidecar — not a text index"))

  /** Committed (nDocs, sumDl, nBuckets) — what search arithmetic reads. */
  private[graft] def readStats(store: VectorStore, name: String): (Long, Long, Int) = {
    val st = readState(store, name)
    (st.nDocs, st.sumDl, st.nBuckets)
  }

  private def requireQuiescent(st: IndexState, name: String, op: String): Unit =
    require(st.pending.isEmpty,
      s"$op: '$name' has an uncommitted append intent for batch " +
        s"${st.pending.get.batchId} — heal it (redeliver that batch via the " +
        "sink, or resumeInsert for the batch verb) first")

  /** Full pre-flight for every read/maintenance verb: sidecar present,
    * no uncommitted append intent, no half-promoted compaction. */
  private def requireReady(store: VectorStore, name: String,
                           op: String): IndexState = {
    val st = readState(store, name)
    requireQuiescent(st, name, op)
    require(!StoreFs.forPath(store.root).exists(journalPath(store, name)),
      s"$op: '$name' has an unfinished compaction promote — run " +
        "compactIndex to complete it first")
    st
  }

  /** Eager-local-relation epilogue shared by every query verb: nothing
    * returned holds the store open. */
  private def eager(spark: SparkSession, out: DataFrame): DataFrame = {
    val rows = out.collect()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** Build the index: ONE corpus scan (tokenize → explode → per-(term,
    * doc) partial-agg count), the doc-level stats aggregated off the
    * same batch, postings written bucket-partitioned. */
  def buildTextIndex(store: VectorStore, name: String, docs: DataFrame,
                     textCol: String, idCol: String, nBuckets: Int = 8): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    // duplicate doc ids would write duplicate postings and inflate every
    // df — refuse BEFORE building, on the raw ids (a (doc_id, dl)-level
    // check would miss duplicates whose texts differ in length)
    val cnts = docs.agg(count(lit(1)), countDistinct(col(idCol))).head
    require(cnts.getLong(0) == cnts.getLong(1),
      s"buildTextIndex: corpus has ${cnts.getLong(0) - cnts.getLong(1)} " +
        s"duplicate '$idCol' value(s) — ids must be unique")
    store.create(name, postingsOf(docs, textCol, idCol, nBuckets),
      partitionBy = Seq("bucket"))
    // doc-level (doc_id, dl) companion off the stored postings (distinct
    // — one slim column-pruned pass; counting the source again instead
    // would double-tokenize); corpus stats aggregate off the companion,
    // so the sidecar and `_docs` can never disagree
    val sp = docs.sparkSession
    store.read(sp, name).select("doc_id", "dl").distinct()
      .write.mode("overwrite").parquet(docsPath(store, name))
    val r = sp.read.parquet(docsPath(store, name))
      .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head
    writeState(store, name,
      IndexState(r.getLong(0), r.getLong(1), nBuckets, -1L, None))
  }

  /** The reserved intent id of the BATCH verb (streaming batches use
    * their real non-negative batchId). */
  private[graft] val BatchVerbIntent = -2L

  /** The one append protocol — shared by the batch verb, its resume,
    * and the streaming sink ([[graft.streaming.IndexStream.textBatchSink]]):
    *
    *  1. write-ahead INTENT: pending = (intentId, batch doc count,
    *     batch token count) in the same atomic sidecar as the committed
    *     stats — postings and idf stats can never silently disagree;
    *  2. append, anti-filtered per ROW against the stored (term,
    *     doc_id) pairs of this batch's doc ids — a crash that tore
    *     MID-append (a doc's postings span bucket directories) is
    *     completed posting-by-posting on redelivery, never duplicated;
    *  3. commit: fold pending into the stats (and optionally advance
    *     the streaming watermark) in the SAME atomic write that clears
    *     the intent.
    *
    * `expect`: a resume/heal passes the recorded intent; the recomputed
    * batch stats must match it — a cheap guard against "resuming" with
    * a different batch than the one that crashed. Returns the batch's
    * (docs, tokens) stats. */
  private[graft] def appendWithIntent(store: VectorStore, name: String,
                                      batch: DataFrame, textCol: String,
                                      idCol: String, st: IndexState,
                                      intentId: Long,
                                      expect: Option[PendingBatch],
                                      newLastBatch: Option[Long],
                                      refuseCollisions: Boolean): PendingBatch = {
    val sp = batch.sparkSession
    val posts = postingsOf(batch, textCol, idCol, st.nBuckets)
      .localCheckpoint(true) // consumed by stats, collision probe, append
    val r = posts.select("doc_id", "dl").distinct()
      .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head
    val pend = PendingBatch(intentId, r.getLong(0), r.getLong(1))
    expect.foreach { e =>
      require(e.nDocs == pend.nDocs && e.sumDl == pend.sumDl,
        s"appendWithIntent: resumed batch does not match the recorded " +
          s"intent ($e vs $pend) — heal requires redelivering the SAME batch")
    }
    // stored (term, doc_id) pairs of this batch's docs: one slim
    // column-pruned pass; empty in the healthy path, the torn half of a
    // crashed append in the heal path
    val existingPairs = store.read(sp, name).select("term", "doc_id")
      .join(graft.operators.BroadcastGate.maybeBroadcast(
        posts.select("doc_id").distinct(), pend.nDocs * 64),
        Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    if (refuseCollisions) {
      val n = existingPairs.limit(1).count()
      require(n == 0L,
        s"appendWithIntent: batch re-delivers doc ids already in '$name' " +
          "with no pending intent — its stats are already counted")
    }
    writeState(store, name, st.copy(pending = Some(pend)))
    val fresh = posts.join(existingPairs, Seq("term", "doc_id"), "left_anti")
    store.append(name, fresh, partitionBy = Seq("bucket"))
    // `_docs` companion rides the same intent: a heal anti-filters the
    // batch's ids against already-landed companion rows (whole-doc rows
    // — doc_id granularity suffices, unlike the per-(term,doc) postings)
    val existingDocs = sp.read.parquet(docsPath(store, name)).select("doc_id")
      .join(graft.operators.BroadcastGate.maybeBroadcast(
        posts.select("doc_id").distinct(), pend.nDocs * 64),
        Seq("doc_id"), "left_semi")
    posts.select("doc_id", "dl").distinct()
      .join(existingDocs, Seq("doc_id"), "left_anti")
      .write.mode("append").parquet(docsPath(store, name))
    writeState(store, name, st.copy(
      nDocs = st.nDocs + pend.nDocs, sumDl = st.sumDl + pend.sumDl,
      lastBatch = newLastBatch.getOrElse(st.lastBatch), pending = None))
    pend
  }

  /** O(batch) incremental append: new docs' postings land under their
    * terms' existing bucket directories; the stats sidecar advances
    * additively (exact long adds), so search-after-append ==
    * search-after-full-rebuild, row for row. Batch doc ids must be NEW
    * (same append contract as the vector tiers). Runs the write-ahead
    * intent protocol: a crash between the append and the stats commit
    * leaves a LOUD pending marker (every verb refuses), healed by
    * [[resumeInsert]] with the same batch — never a silently-stale
    * idf. */
  def insertIntoTextIndex(store: VectorStore, name: String, batch: DataFrame,
                          textCol: String, idCol: String): Unit = {
    val st = requireReady(store, name, "insertIntoTextIndex")
    // PIN: the batch feeds the contract check AND the intent protocol's
    // stats + postings passes — a nondeterministic input could pass the
    // check on one evaluation and commit stats for a different row set
    val pinned = batch.localCheckpoint(true)
    // contract runs on the RAW batch ids: the postings' grouped doc_id
    // would collapse an in-batch duplicate and slip it past the
    // uniqueness half of the check
    graft.operators.AppendContract.requireNewUniqueIds(
      store, name, pinned.select(col(idCol).as("doc_id")), "doc_id",
      "insertIntoTextIndex")
    appendWithIntent(store, name, pinned, textCol, idCol, st,
      BatchVerbIntent, expect = None, newLastBatch = None,
      refuseCollisions = false): Unit
  }

  /** Heal a crashed [[insertIntoTextIndex]]: redeliver the SAME batch.
    * The recorded intent is verified against the batch's recomputed
    * stats, already-landed postings anti-filter away row by row, and
    * the commit applies the stats exactly once. */
  def resumeInsert(store: VectorStore, name: String, batch: DataFrame,
                   textCol: String, idCol: String): Unit = {
    val st = readState(store, name)
    val pend = st.pending.getOrElse(throw new IllegalStateException(
      s"resumeInsert: '$name' has no pending intent — nothing to heal"))
    require(pend.batchId == BatchVerbIntent,
      s"resumeInsert: pending intent ${pend.batchId} belongs to " +
        (if (pend.batchId == DeleteVerbIntent) "the delete verb — heal via resumeDelete"
         else "a streaming batch — redeliver it through the sink instead"))
    appendWithIntent(store, name, batch, textCol, idCol,
      st.copy(pending = None), BatchVerbIntent, expect = Some(pend),
      newLastBatch = None, refuseCollisions = false): Unit
  }

  /** The reserved intent id of the DELETE verb. */
  private[graft] val DeleteVerbIntent = -3L

  /** Delete documents from the index — doc-id TOMBSTONES, never a
    * postings rewrite: a doc's postings spread across every bucket, so a
    * physical delete would be O(index); the tombstone append + sidecar
    * decrement is O(batch), and every read verb anti-joins the tombstone
    * set (shared [[liveOnly]] in the pruned-scan stage, so BM25 scores —
    * N, avgdl, AND per-term df — reflect exactly the live corpus; the
    * gate oracle recomputes them from the raw text minus the deleted
    * rows). Stats come from the `_docs` companion for the batch's ids
    * (slim semi-joined scan), not a postings pass.
    *
    * Crash-safe via the append protocol's intent slot: intent (negative
    * delta) → tombstone append → commit-and-clear. A crash in between
    * leaves a loud pending marker; [[resumeDelete]] with the SAME ids
    * heals (tombstone re-appends are additionally harmless — the set is
    * read distinct). Deleted ids can NOT be re-inserted (their raw
    * postings remain and the append contract refuses); reclaim space
    * and ids by rebuilding the index from the live corpus. */
  def deleteFromTextIndex(store: VectorStore, name: String,
                          ids: DataFrame): Unit = {
    val st = requireReady(store, name, "deleteFromTextIndex")
    deleteImpl(store, name, ids, st, expect = None)
  }

  /** Heal a crashed [[deleteFromTextIndex]]: redeliver the SAME ids. */
  def resumeDelete(store: VectorStore, name: String, ids: DataFrame): Unit = {
    val st = readState(store, name)
    val pend = st.pending.getOrElse(throw new IllegalStateException(
      s"resumeDelete: '$name' has no pending intent — nothing to heal"))
    require(pend.batchId == DeleteVerbIntent,
      s"resumeDelete: pending intent ${pend.batchId} does not belong to " +
        "the delete verb")
    deleteImpl(store, name, ids, st.copy(pending = None), expect = Some(pend))
  }

  private def deleteImpl(store: VectorStore, name: String, ids: DataFrame,
                         st: IndexState, expect: Option[PendingBatch]): Unit = {
    val sp = ids.sparkSession
    val batch = ids.select(col(ids.columns.head).as("doc_id")).distinct()
      .localCheckpoint(true) // consumed by count, victims, tombstone probe, append
    val nBatch = batch.count()
    require(nBatch > 0, "deleteFromTextIndex: empty id batch")
    val victims = sp.read.parquet(docsPath(store, name))
      .join(graft.operators.BroadcastGate.maybeBroadcast(batch, nBatch * 16),
        Seq("doc_id"), "left_semi")
    val r = victims.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head
    require(r.getLong(0) == nBatch,
      s"deleteFromTextIndex: ${nBatch - r.getLong(0)} id(s) not present in '$name'")
    val pend = PendingBatch(DeleteVerbIntent, r.getLong(0), r.getLong(1))
    expect match {
      case Some(e) =>
        require(e.nDocs == pend.nDocs && e.sumDl == pend.sumDl,
          s"resumeDelete: redelivered ids do not match the recorded intent " +
            s"($e vs $pend) — heal requires the SAME batch")
      case None =>
        // a fresh delete must not target already-deleted ids (its stats
        // would double-decrement); the heal path skips this — its batch
        // ids MAY already be tombstoned by the crashed attempt
        tombstoneIds(sp, store, name).foreach { ts =>
          val dup = batch.join(ts, Seq("doc_id"), "left_semi").limit(1).count()
          require(dup == 0L,
            s"deleteFromTextIndex: batch contains already-deleted id(s) in '$name'")
        }
    }
    writeState(store, name, st.copy(pending = Some(pend)))
    val fresh = tombstoneIds(sp, store, name)
      .fold(batch)(ts => batch.join(ts, Seq("doc_id"), "left_anti"))
    fresh.write.mode("append").parquet(deletedPath(store, name))
    writeState(store, name, st.copy(
      nDocs = st.nDocs - pend.nDocs, sumDl = st.sumDl - pend.sumDl,
      pending = None))
  }

  /** The search's scan stage, exposed for plan pins: postings of the
    * query terms only — `bucket IN (term buckets)` must land as a
    * PartitionFilter (directory pruning), `term IN (...)` as a data
    * filter inside the surviving buckets. */
  private[graft] def prunedPostings(spark: SparkSession, store: VectorStore,
                                    name: String, terms: Seq[String]): DataFrame = {
    val (_, _, nBuckets) = readStats(store, name)
    val buckets = bucketsOf(spark, terms, nBuckets)
    // tombstone anti-join HERE covers every search verb at once (BM25,
    // boolean, phrase, proximity, snippets, batch) — deleted docs can
    // never surface nor count toward a pruned-scan df
    liveOnly(spark, store, name, store.read(spark, name)
      .filter(col("bucket").isin(buckets.map(Int.box): _*) &&
        col("term").isin(terms: _*)))
  }

  private val CompactJournal = "_compact.properties"
  private val CompactStageDir = "_compact_stage"

  private def journalPath(store: VectorStore, name: String) =
    s"${store.root}/$name/$CompactJournal"

  /** Bucket-targeted compaction — the maintenance the streaming sink
    * makes necessary: every micro-batch appends one small file per
    * touched bucket, so a long-running ingest leaves each bucket a pile
    * of file fragments that tax listing and scan startup. Buckets with
    * more than `maxFilesPerBucket` fragments are rewritten to one file
    * each (content preserved row-for-row — gate-checked against the
    * corpus oracle), O(dirty buckets), never O(index).
    *
    * Crash-safe via the store's staged-swap discipline, NOT a bare
    * dynamic-partition overwrite (whose job commit deletes a bucket
    * directory before renaming the replacement in — a crash there would
    * silently LOSE the bucket): rewritten buckets stage under an
    * `_`-prefixed scratch dir (invisible to Spark), ONE atomic journal
    * write is the commit point, and the promote (live → `_old_bucket=`
    * shadow, staged → live, shadow deleted) is idempotent per bucket —
    * any crash replays to completion on the next call, every
    * intermediate state holding each bucket's full content exactly
    * once. Read verbs refuse while a journal exists. Returns the
    * rewritten bucket ids (including any resumed from a crash). */
  def compactIndex(spark: SparkSession, store: VectorStore, name: String,
                   maxFilesPerBucket: Int = 4): Seq[Int] = {
    require(maxFilesPerBucket >= 1, "maxFilesPerBucket must be >= 1")
    val sfs = StoreFs.forPath(store.root)
    // finish a crashed promote first: the journal is only ever written
    // AFTER the stage is complete, so replay is always safe
    val resumed = promoteStaged(store, name)
    requireQuiescent(readState(store, name), name, "compactIndex")
    val collDir = s"${store.root}/$name"
    val perBucket = store.dataFileStatuses(name)
      .filter(_.getPath.getParent.getParent.getName == name) // not scratch
      .flatMap { f =>
        val dir = f.getPath.getParent.getName
        if (dir.startsWith("bucket=")) Some(dir.stripPrefix("bucket=").toInt)
        else None
      }
      .groupBy(identity).view.mapValues(_.size).toMap
    val dirty = perBucket.filter(_._2 > maxFilesPerBucket).keys.toSeq.sorted
    if (dirty.nonEmpty) {
      val stage = s"$collDir/$CompactStageDir"
      sfs.deleteTree(stage) // a pre-journal crash leaves only dead stage
      store.read(spark, name)
        .filter(col("bucket").isin(dirty.map(Int.box): _*))
        .repartition(dirty.length, col("bucket"))
        .write.partitionBy("bucket").parquet(stage)
      // the commit point
      val props = new java.util.Properties()
      props.setProperty("buckets", dirty.mkString(","))
      sfs.writePropsAtomic(journalPath(store, name), props,
        "graft text-index compaction journal")
      promoteStaged(store, name): Unit
    }
    (resumed ++ dirty).distinct.sorted
  }

  /** Idempotent promote of a journaled compaction stage; no-op without
    * a journal. Per bucket: live → `_old_bucket=` shadow (skipped if
    * already moved), staged → live (skipped if already promoted),
    * shadow deleted — each step re-runnable from any crash point. */
  private def promoteStaged(store: VectorStore, name: String): Seq[Int] = {
    val sfs = StoreFs.forPath(store.root)
    sfs.readProps(journalPath(store, name)).fold(Seq.empty[Int]) { props =>
      val buckets = props.getProperty("buckets", "").split(",")
        .filter(_.nonEmpty).map(_.toInt).toSeq
      val collDir = s"${store.root}/$name"
      buckets.foreach { b =>
        val live = s"$collDir/bucket=$b"
        val old = s"$collDir/_old_bucket=$b"
        val staged = s"$collDir/$CompactStageDir/bucket=$b"
        if (sfs.exists(staged)) {
          if (sfs.exists(live)) {
            sfs.deleteTree(old)
            sfs.rename(live, old): Unit
          }
          sfs.rename(staged, live): Unit
        }
        sfs.deleteTree(old)
      }
      sfs.deleteTree(s"$collDir/$CompactStageDir")
      sfs.deleteTree(journalPath(store, name))
      buckets
    }
  }

  /** Boolean retrieval over the postings — the must/should/must-not
    * query form, index-only: a doc qualifies when it holds a posting
    * for EVERY `must` term and for NO `mustNot` term; qualifying docs
    * rank by how many `should` terms they also hold (then doc id).
    * Absence of a mustNot term IS decidable from the pruned scan — all
    * of a term's postings live in its bucket, so "no posting fetched"
    * means "term absent". Scan cost: the buckets of the mentioned
    * terms; the shuffle carries one slim row per (involved term, doc).
    */
  def booleanSearch(spark: SparkSession, store: VectorStore, name: String,
                    must: Seq[String], should: Seq[String] = Nil,
                    mustNot: Seq[String] = Nil, k: Int = 10): DataFrame = {
    require(must.nonEmpty, "booleanSearch: at least one must term")
    val overlap = (must ++ should).toSet.intersect(mustNot.toSet)
    require(overlap.isEmpty, s"booleanSearch: terms both required and " +
      s"excluded: ${overlap.mkString(", ")}")
    requireReady(store, name, "booleanSearch"): Unit
    val all = (must ++ should ++ mustNot).distinct
    val pruned = prunedPostings(spark, store, name, all)
      .select("term", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def docsWith(t: String) = pruned.filter(col("term") === lit(t))
        .select("doc_id")
      // postings are unique per (term, doc): each docsWith is already
      // one row per doc, and equi-joins of unique-keyed sets stay unique
      val qualified = must.distinct.map(docsWith).reduce(_.join(_, Seq("doc_id")))
      val excluded = mustNot.distinct.map(docsWith)
        .reduceOption(_ unionByName _)
      val base = excluded.fold(qualified)(ex =>
        qualified.join(ex.distinct(), Seq("doc_id"), "left_anti"))
      val out = (if (should.isEmpty)
        base.withColumn("n_should", lit(0L))
      else {
        // distinct terms: a repeated should term must not double-count
        val hits = should.distinct.map(docsWith).reduce(_ unionByName _)
        base.join(hits.groupBy("doc_id").agg(count(lit(1)).as("n_should")),
            Seq("doc_id"), "left")
          .withColumn("n_should", coalesce(col("n_should"), lit(0L)))
      })
        .orderBy(col("n_should").desc, col("doc_id"))
        .limit(k)
        .select("doc_id", "n_should")
      eager(spark, out)
    } finally pruned.unpersist()
  }

  /** Ops view of the stored index: the top terms by document frequency
    * with their collection frequencies, straight off the postings (one
    * column-pruned scan, partial-agg shuffle on term). The stored
    * layout's content must reconcile with the corpus — the gate oracle
    * recomputes these numbers from the raw text. */
  def indexStats(spark: SparkSession, store: VectorStore, name: String,
                 topN: Int = 20): DataFrame = {
    requireReady(store, name, "indexStats"): Unit
    eager(spark, liveOnly(spark, store, name, store.read(spark, name))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
      .orderBy(col("df").desc, col("term"))
      .limit(topN))
  }

  /** Exact phrase search over the positional postings: documents
    * containing the tokens of `phrase` CONSECUTIVELY, ranked by match
    * count. Slot algebra, no text access: occurrences of the i-th
    * phrase term shift to their would-be phrase START (`pos - i`); a
    * (doc, start) pair with all |phrase| slots present is a match.
    * Duplicate terms in the phrase are just independent slots.
    *
    * Scale shape: the scan is the same bucket-pruned posting fetch as
    * BM25 (only the phrase's terms' buckets are listed) plus the
    * `positions` column; the shuffle carries slim (doc, start, slot)
    * rows — O(occurrences of the phrase terms), never O(corpus). */
  def phraseSearch(spark: SparkSession, store: VectorStore, name: String,
                   phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    requireReady(store, name, "phraseSearch"): Unit
    val pruned = prunedPostings(spark, store, name, phrase.distinct)
      .select("term", "doc_id", "positions")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val slots = phrase.zipWithIndex.map { case (t, i) =>
        pruned.filter(col("term") === lit(t))
          .select(col("doc_id"), explode(col("positions")).as("_pos"))
          .select(col("doc_id"), (col("_pos") - lit(i)).as("start"),
            lit(i).as("slot"))
      }.reduce(_ unionByName _)
      val out = slots.groupBy("doc_id", "start")
        .agg(countDistinct(col("slot")).as("_nslots"))
        .filter(col("_nslots") === phrase.length)
        .groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
        .orderBy(col("n_matches").desc, col("doc_id"))
        .limit(k)
      eager(spark, out)
    } finally pruned.unpersist()
  }

  /** Proximity search over the positional postings: documents where
    * `termA` and `termB` occur within `maxDist` tokens of each other
    * (either order), ranked by their closest co-occurrence. Same
    * bucket-pruned posting fetch as [[phraseSearch]]; the per-doc join
    * of the two position lists is bounded by the terms' occurrence
    * counts, never the corpus. */
  def proximitySearch(spark: SparkSession, store: VectorStore, name: String,
                      termA: String, termB: String, maxDist: Int,
                      k: Int): DataFrame = {
    require(termA != termB, "proximitySearch: distinct terms required")
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    requireReady(store, name, "proximitySearch"): Unit
    val pruned = prunedPostings(spark, store, name, Seq(termA, termB))
      .select("term", "doc_id", "positions")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def side(t: String, c: String) = pruned.filter(col("term") === lit(t))
        .select(col("doc_id"), explode(col("positions")).as(c))
      val out = side(termA, "_pa").join(side(termB, "_pb"), Seq("doc_id"))
        .select(col("doc_id"), abs(col("_pa") - col("_pb")).as("_d"))
        .groupBy("doc_id").agg(min(col("_d")).as("min_dist"))
        .filter(col("min_dist") <= maxDist)
        .orderBy(col("min_dist"), col("doc_id"))
        .limit(k)
      eager(spark, out)
    } finally pruned.unpersist()
  }

  /** BM25 top-k over the stored layout. The scan is partition-pruned to
    * the query terms' buckets and term-filtered inside them; df per term
    * aggregates off that pruned slice (exact — a term's postings are
    * confined to its bucket); N/avgdl come from the sidecar. Returns an
    * eager ≤k-row local relation (the [[TextAnalysis.bm25TopK]]
    * discipline — nothing returned holds the store open). */
  def bm25SearchStored(spark: SparkSession, store: VectorStore, name: String,
                       terms: Seq[String], k: Int,
                       k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25SearchStored: empty term set")
    // a pending intent means appended-but-uncounted postings may exist —
    // scoring against stale stats would be silently wrong, so refuse
    val st0 = requireReady(store, name, "bm25SearchStored")
    val pruned = prunedPostings(spark, store, name, terms)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // |terms| rows — bounded driver collect, inlined as literals
      // (the bm25TopK stats discipline)
      val dfByTerm = pruned.groupBy("term").agg(count(lit(1)).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      eager(spark, bm25TopkOff(pruned, terms, st0.nDocs, st0.sumDl,
        dfByTerm, k, k1, b))
    } finally pruned.unpersist()
  }

  /** BM25 over the stored layout with a metadata document filter — the
    * `where`-DSL half of filtered search applied to keyword retrieval
    * (filter-then-rank, like [[graft.query.Knn]]'s filtered form).
    * `allowed` is a one-column doc-id relation, typically a pushed-down
    * metadata scan of the docs table; it gates WHICH docs may surface.
    * Scoring statistics stay corpus-level (df off the full pruned slice,
    * N/avgdl from the sidecar): a surviving doc scores exactly what the
    * unfiltered search gives it — the standard filtered-BM25 semantic,
    * and the property the gate oracle checks.
    *
    * Scale shape: the posting scan is the same bucket-pruned fetch; the
    * CANDIDATE ids (bounded by the query terms' postings — est. from the
    * already-collected df sums, size-gated) broadcast INTO the metadata
    * scan as a map-only semi, and the ≤-candidate survivors broadcast
    * back onto the postings. The corpus-sized allowed set never crosses
    * a shuffle; over the gate both joins degrade to hash joins. */
  def bm25SearchStoredFiltered(spark: SparkSession, store: VectorStore,
                               name: String, terms: Seq[String], k: Int,
                               allowed: DataFrame, k1: Double = 1.2,
                               b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25SearchStoredFiltered: empty term set")
    val st0 = requireReady(store, name, "bm25SearchStoredFiltered")
    val pruned = prunedPostings(spark, store, name, terms)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dfByTerm = pruned.groupBy("term").agg(count(lit(1)).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val estBytes = dfByTerm.values.sum * 16
      val hitIds = pruned.select("doc_id").distinct()
      val allowedIds = allowed
        .select(col(allowed.columns.head).as("doc_id"))
      val surviving = allowedIds.join(
        graft.operators.BroadcastGate.maybeBroadcast(hitIds, estBytes),
        Seq("doc_id"), "left_semi")
      val gated = pruned.join(
        graft.operators.BroadcastGate.maybeBroadcast(surviving, estBytes),
        Seq("doc_id"), "left_semi")
      eager(spark, bm25TopkOff(gated, terms, st0.nDocs, st0.sumDl,
        dfByTerm, k, k1, b))
    } finally pruned.unpersist()
  }

  /** The scoring stage shared by the single and batch stored searches:
    * singleton-max pivot (each (term, doc) appears once) + FIXED
    * term-order re-assembly so float addition matches the inline
    * expression tree and the oracle bit for bit; corpus stats and df
    * inlined as literals. `pruned` may carry postings of OTHER queries'
    * terms — their docs score exactly 0.0 and fall to the bm25 > 0
    * filter (the Lucene +1 idf is strictly positive, so any doc with a
    * real term hit survives). */
  private def bm25TopkOff(pruned: DataFrame, terms: Seq[String],
                          n: Long, sumDl: Long, dfByTerm: Map[String, Long],
                          k: Int, k1: Double, b: Double): DataFrame = {
    val avgdl = lit(sumDl).cast("double") / lit(n)
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === lit(t), col("tf"))).as(s"_tf$i")
    }
    val pivoted = pruned.groupBy("doc_id")
      .agg(max(col("dl")).as("dl"), perTerm: _*)
    val score = terms.zipWithIndex.map { case (t, i) =>
      val dfT = lit(dfByTerm.getOrElse(t, 0L))
      val tf = coalesce(col(s"_tf$i"), lit(0L)).cast("double")
      val idf = log((lit(n) - dfT + 0.5) / (dfT + 0.5) + 1.0)
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    }.reduce(_ + _)
    pivoted
      .withColumn("bm25", floor(score * 1e4 + 0.5) / 1e4)
      .filter(col("bm25") > 0)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("dl"), col("bm25"))
  }

  /** Search-result snippets — the user-facing tail of the search path:
    * BM25 top-k plus, per hit, the first occurrence position of any
    * query term (1-based) and a ±`window`-token excerpt around it.
    * Locating reads the INDEX's positional postings (no re-tokenize of
    * the corpus); only the ≤ k hit docs' text rows are fetched for the
    * excerpt, through a broadcast id join the scan can push down. */
  def snippets(spark: SparkSession, store: VectorStore, name: String,
               docs: DataFrame, textCol: String, idCol: String,
               terms: Seq[String], k: Int, window: Int = 3): DataFrame = {
    require(window >= 0, s"window must be >= 0, got $window")
    val hits = bm25SearchStored(spark, store, name, terms, k) // eager ≤k rows
    val firstPos = prunedPostings(spark, store, name, terms)
      .join(broadcast(hits.select("doc_id")), Seq("doc_id"))
      .select(col("doc_id"), explode(col("positions")).as("_p"))
      .groupBy("doc_id").agg((min(col("_p")) + 1).as("first_pos")) // 1-based
    val out = hits
      .join(firstPos, Seq("doc_id"))
      .join(docs.select(col(idCol).as("doc_id"), col(textCol).as("_text")),
        Seq("doc_id"))
      .withColumn("_toks", TextAnalysis.tokens(col("_text")))
      .withColumn("_start", greatest(col("first_pos") - window, lit(1)))
      .withColumn("_len",
        least(col("first_pos") + window, size(col("_toks"))) - col("_start") + 1)
      .withColumn("snippet",
        concat_ws(" ", slice(col("_toks"), col("_start"), col("_len"))))
      .select(col("doc_id"), col("bm25"), col("first_pos"), col("snippet"))
      .orderBy(col("bm25").desc, col("doc_id"))
    val res = eager(spark, out)
    // the text join is INNER: a docs frame out of sync with the indexed
    // corpus (missing or duplicated ids) would silently drop or
    // duplicate hits — make that loud
    require(res.count() == hits.count(),
      s"snippets: the docs frame does not cover the hit set 1:1 for '$name'")
    res
  }

  /** Batch BM25: Q independent term-set queries amortized onto ONE
    * pruned posting fetch (the union of every query's terms' buckets)
    * and one |allTerms|-row df collect. Per-query rows are identical to
    * [[bm25SearchStored]] run separately (spec-pinned): the shared scan
    * changes cost, never content.
    *
    * ONE-SCAN shape (the [[graft.operators.SparseSearch.topKMany]] /
    * `ivfSearchStoredMany` discipline): the (q_id, term, term_idx, df)
    * query table is a broadcast literal, scoring is one join + one
    * (q_id, doc)-keyed aggregation, ranking a per-query window over
    * slim rows — plan size, analysis time, and job count are FLAT in
    * the batch size (a per-query plan-arm union grows linearly and
    * becomes a driver-side planning bottleneck at a few thousand
    * queries; pinned in spec: one postings scan, no union).
    *
    * Bit-parity with the single-query pivot: each (q_id, doc, term)
    * row's contribution uses the IDENTICAL expression as
    * [[bm25TopkOff]]'s per-term summand, and the per-(q_id, doc) sum
    * re-assembles contributions in FIXED term order (sort_array on the
    * query-local term index, then a left-to-right double fold). Terms
    * the doc lacks contribute exactly +0.0 in the single-query
    * expression tree — an IEEE addition identity — so summing only the
    * PRESENT terms in term order is bit-identical to the full tree. */
  def bm25SearchStoredMany(spark: SparkSession, store: VectorStore,
                           name: String, queries: Seq[(String, Seq[String])],
                           k: Int, k1: Double = 1.2,
                           b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "bm25SearchStoredMany: every query needs a non-empty term set")
    require(queries.map(_._1).distinct.length == queries.length,
      "bm25SearchStoredMany: duplicate query ids")
    val st0 = requireReady(store, name, "bm25SearchStoredMany")
    val allTerms = queries.flatMap(_._2).distinct
    val pruned = prunedPostings(spark, store, name, allTerms)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // |allTerms| rows — bounded driver collect, inlined into the
      // broadcast query table (the bm25TopK stats discipline: df is a
      // per-term constant of the index state, not per-row data)
      val dfByTerm = pruned.groupBy("term").agg(count(lit(1)).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      import spark.implicits._
      val q = broadcast(queries.flatMap { case (qid, terms) =>
        terms.zipWithIndex.map { case (t, i) =>
          (qid, t, i, dfByTerm.getOrElse(t, 0L)) }
      }.toDF("q_id", "term", "_ti", "_df"))
      val n = st0.nDocs
      val avgdl = lit(st0.sumDl).cast("double") / lit(n)
      // the EXACT per-term summand of bm25TopkOff, df as a joined
      // column instead of a literal (same value, same op sequence)
      val tf = col("tf").cast("double")
      val idf = log((lit(n) - col("_df") + 0.5) / (col("_df") + 0.5) + 1.0)
      val contrib = idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("bm25").desc, col("doc_id"))
      val out = pruned.join(q, Seq("term"))
        .select(col("q_id"), col("doc_id"), col("dl"), col("_ti"),
          contrib.as("_c"))
        .groupBy(col("q_id"), col("doc_id"))
        .agg(max(col("dl")).as("dl"),
          sort_array(collect_list(struct(col("_ti"), col("_c")))).as("_cs"))
        // left-to-right double fold in term order == the single-query
        // expression tree (0.0 + first == first; absent terms are +0.0
        // identities there and absent rows here)
        .withColumn("_score",
          aggregate(transform(col("_cs"), x => x.getField("_c")),
            lit(0.0), (acc, x) => acc + x))
        .withColumn("bm25", floor(col("_score") * 1e4 + 0.5) / 1e4)
        .filter(col("bm25") > 0)
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= k)
        .select("q_id", "doc_id", "dl", "bm25")
        .orderBy(col("q_id"), col("bm25").desc, col("doc_id"))
      eager(spark, out)
    } finally pruned.unpersist()
  }
}
