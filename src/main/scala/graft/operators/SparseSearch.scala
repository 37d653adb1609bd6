package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.{StoreFs, VectorStore}

/** Sparse-vector retrieval — the learned-sparse ("SPLADE-class") arm a
  * vector store serves next to its dense index: every document is a
  * sparse map `term -> weight`, a query is a handful of weighted terms,
  * and the score is the sparse dot product `Σ_t q_t · d_t`. The
  * reference's stack exposes exactly this surface through Chroma's
  * sparse-embedding collections; here the moving parts are re-expressed
  * as relational plans:
  *
  *  - the "encoder" is a deterministic tf·idf ([[encode]]): real sparse
  *    embedders are per-document model outputs; a tf·idf fit on the
  *    build corpus has the same shape (bounded terms per doc, one
  *    weight per (doc, term)) while staying SQL-twinnable for the gate.
  *  - weights are EXACT fixed-point micro-units (`w_mu: BIGINT`), so
  *    the dot product is pure integer arithmetic — order-free, hence
  *    bit-identical at any parallelism and in the DuckDB oracle.
  *  - the stored layout is a bucket-partitioned inverted index
  *    ([[buildIndex]]): postings `(term, doc_id, w_mu)` partitioned by
  *    `bucket = pmod(xxhash64(term), nBuckets)` — a q-term query reads
  *    at most |q| buckets (PartitionFilters, spec-pinned), the
  *    TextIndex discipline.
  *
  * 100 TB shape: queries are bounded (tens of terms), so the query side
  * is always a broadcast literal; the corpus side is one pruned scan of
  * the touched buckets followed by a partial-aggregated sum keyed on
  * doc_id — candidates shuffle (docs sharing a query term), never the
  * corpus. There is no all-pairs anywhere: scoring work is
  * O(postings of query terms), the inverted-index contract.
  */
object SparseSearch {

  /** Fixed-point scale for weights: 1e6 micro-units per 1.0. Scores are
    * micro² (1e12) after the product — still comfortably inside Long
    * for realistic magnitudes (w ≤ ~1e4 ⇒ w_mu ≤ 1e10; q ≤ ~1e2 ⇒
    * q_mu ≤ 1e8; a 50-term overlap stays < 2^63). */
  val Scale = 1000000L

  /** Per-(doc, distinct term) frequencies — THE tokenize pass. One
    * definition so the build encoder and the frozen-stats encoder can
    * never drift on tokenization or null-text folding. */
  private def termFreqs(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    graft.Tables.spread(docs)
      .select(col(idCol).as("doc_id"),
        explode(graft.text.TextAnalysis.tokens(coalesce(col(textCol), lit("")))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))

  /** Bounded-result eager materialization: stored-search verbs return
    * collected frames because callers destroy throwaway stores in a
    * finally — a lazy frame would read a deleted directory. */
  private def eager(spark: SparkSession, out: DataFrame): DataFrame = {
    val rows = out.collect()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** Deterministic sparse "encoder": tf·idf over whitespace tokens,
    * `w = tf · ln(N / df)` quantized to micro-units with the repo's
    * floor-form round (`floor(x·1e6 + 0.5)`). Emits one posting row per
    * (doc, distinct term): `(doc_id, term, w_mu)`. Terms appearing in
    * every document get weight 0 (ln 1) and are kept — dropping them is
    * the caller's policy, and the oracle twin keeps them too.
    *
    * Corpus stats (N, df) are the "model": like any trained encoder
    * they are FROZEN artifacts of the corpus they were fit on —
    * [[buildIndex]] persists the fitted N so incremental encode against
    * a stored index reuses the build-time statistics rather than
    * silently re-fitting (see [[insertInto]]).
    */
  def encode(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val nDocs = docs.select(col(idCol)).distinct().count()
    encodeWithN(docs, textCol, idCol, nDocs)
  }

  /** [[encode]] with the document count supplied — the frozen-stats
    * seam used by [[insertInto]]. df is still computed over the GIVEN
    * frame; for incremental appends the realistic contract is
    * "the encoder is the build corpus' model", so [[insertInto]] passes
    * the stored stats through here via [[encodeAgainst]] instead. */
  private def encodeWithN(docs: DataFrame, textCol: String, idCol: String,
                          nDocs: Long): DataFrame = {
    val tf = termFreqs(docs, textCol, idCol)
    val df_ = tf.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    tf.join(df_, Seq("term"))
      .select(col("doc_id"), col("term"),
        floor(col("tf") * log(lit(nDocs.toDouble) / col("df")) * 1e6 + 0.5)
          .cast("long").as("w_mu"))
  }

  /** Encode NEW documents against a FROZEN vocabulary model `(term ->
    * df, N)` — the incremental-append path: out-of-vocabulary terms get
    * no posting (an unseen term has no fitted weight, exactly like a
    * sparse embedder's fixed vocab), in-vocab terms score with the
    * build-time df. The model side is a small relation (capped vocab),
    * broadcast by the optimizer's own size estimate. */
  def encodeAgainst(docs: DataFrame, textCol: String, idCol: String,
                    model: DataFrame, nDocs: Long): DataFrame = {
    val tf = termFreqs(docs, textCol, idCol)
    tf.join(model.select(col("term"), col("df")), Seq("term"))
      .select(col("doc_id"), col("term"),
        floor(col("tf") * log(lit(nDocs.toDouble) / col("df")) * 1e6 + 0.5)
          .cast("long").as("w_mu"))
  }

  /** Quantize user query weights to micro-units with the same floor
    * form the encoder uses (negatives round symmetrically via the
    * sign-split so -0.5 doesn't bias upward; sparse query weights are
    * non-negative in practice, but the quantizer shouldn't care). */
  private def quantize(w: Double): Long =
    if (w >= 0) math.floor(w * Scale + 0.5).toLong
    else -math.floor(-w * Scale + 0.5).toLong

  /** Sparse dot-product top-k over encoded postings: join the postings
    * against the BROADCAST query literal on term, integer-sum the
    * products per doc, rank by `(score DESC, doc_id)`. Exact — every
    * arithmetic step is on longs. `score` is the dot product in real
    * units (`s_mu2 / 1e12`, one deterministic long→double conversion).
    */
  def topK(postings: DataFrame, query: Seq[(String, Double)], k: Int): DataFrame = {
    require(query.nonEmpty, "sparse query needs at least one term")
    val sp = postings.sparkSession
    import sp.implicits._
    val q = broadcast(
      query.map { case (t, w) => (t, quantize(w)) }.toDF("term", "q_mu"))
    postings.join(q, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w_mu") * col("q_mu")).cast("long").as("s_mu2"))
      // rank on the CONVERTED double (one monotone long→double cast both
      // engines perform identically), id tiebreak — so a downstream
      // row_number over (score, doc_id) composes exactly with the oracle
      .select(col("doc_id"), (col("s_mu2").cast("double") / 1e12).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Batch sparse search — Q weighted-term queries against ONE postings
    * relation (the `query(query_texts=[...])` list shape on the sparse
    * tier): the query table `(q_id, term, q_mu)` is a broadcast
    * literal, scoring is one join + one (q_id, doc_id)-keyed integer
    * sum, ranking a per-query window over slim rows. A term shared by
    * two queries pairs each posting with both through the join — the
    * postings scan is still paid ONCE. */
  def topKMany(postings: DataFrame,
               queries: Seq[(String, Seq[(String, Double)])],
               k: Int): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "batch sparse search needs at least one term per query")
    require(queries.map(_._1).distinct.length == queries.length,
      "duplicate query ids in the batch")
    val sp = postings.sparkSession
    import sp.implicits._
    val q = broadcast(queries
      .flatMap { case (qid, terms) =>
        terms.map { case (t, w) => (qid, t, quantize(w)) } }
      .toDF("q_id", "term", "q_mu"))
    postings.join(q, Seq("term"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("w_mu") * col("q_mu")).cast("long").as("s_mu2"))
      .select(col("q_id"), col("doc_id"),
        (col("s_mu2").cast("double") / 1e12).as("score"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }

  // ---------------------------------------------------------------- store

  private val PropsFile = VectorStore.SparseIndexPropsFile
  private def bucketOf(term: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(term), lit(nBuckets.toLong)).cast("int")

  /** Persist the inverted layout: postings `(term, doc_id, w_mu)`
    * PARTITIONED BY `bucket` so a query's scan lists only its terms'
    * buckets, plus a `_model` vocabulary sidecar (term → df; the frozen
    * encoder) and a props sidecar carrying `n_buckets` / `n_docs`. */
  def buildIndex(store: VectorStore, name: String, docs: DataFrame,
                 textCol: String, idCol: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val nDocs = docs.select(col(idCol)).distinct().count()
    // ONE tokenize pass feeds both the postings and the vocab model —
    // without the persist, the model write re-runs the whole encode
    val postings = encodeWithN(docs, textCol, idCol, nDocs)
      .withColumn("bucket", bucketOf(col("term"), nBuckets))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // impact-clustered layout: sorting each write partition by weight
      // gives parquet row groups tight w_mu min/max stats, so an
      // impact-threshold search ([[searchStoredImpact]]) skips whole
      // row groups of low-impact postings instead of filtering rows
      store.create(name,
        postings.select("term", "doc_id", "w_mu", "bucket")
          .sortWithinPartitions(col("bucket"), col("w_mu").desc),
        partitionBy = Seq("bucket"))
      // vocabulary model AFTER the data (create clears the directory)
      postings.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"${store.root}/$name/_model")
    } finally postings.unpersist()
    val props = new java.util.Properties()
    props.setProperty("n_buckets", nBuckets.toString)
    props.setProperty("n_docs", nDocs.toString)
    StoreFs.forPath(store.root)
      .writePropsAtomic(s"${store.root}/$name/$PropsFile", props,
        "graft sparse inverted index")
  }

  private def readProps(store: VectorStore, name: String): (Int, Long) = {
    // every verb resolves props first, so this is the one choke point:
    // refuse to serve or mutate mid-promote (a bucket is momentarily
    // absent between its two renames) — compactIndex replays to done
    require(!StoreFs.forPath(store.root).isFile(journalPath(store, name)),
      s"sparse index '$name' has an unfinished compaction promote — " +
        "run compactIndex to complete it first")
    val p = StoreFs.forPath(store.root)
      .readProps(s"${store.root}/$name/$PropsFile")
      .getOrElse(sys.error(s"'$name' is not a sparse index (no $PropsFile)"))
    (p.getProperty("n_buckets").toInt, p.getProperty("n_docs").toLong)
  }

  /** Append new documents to a stored sparse index with the FROZEN
    * encoder (build-time df/N — OOV terms drop, the fixed-vocab
    * contract): postings written as a dynamic-partition append, so only
    * the batch's terms' buckets gain files — O(batch), untouched
    * buckets' files immutable. The append contract refuses doc ids the
    * index already holds. */
  def insertInto(store: VectorStore, name: String, docs: DataFrame,
                 textCol: String, idCol: String): Unit = {
    // PIN: the batch is consumed twice (contract check, encode+append) —
    // a nondeterministic input could pass the uniqueness contract on one
    // evaluation yet append a different row set
    val pinned = docs.localCheckpoint(true)
    AppendContract.requireNewUniqueIds(store, name,
      pinned.select(col(idCol).as("doc_id")), "doc_id",
      "SparseSearch.insertInto")
    store.append(name, encodeForIndex(store, name, pinned, textCol, idCol),
      partitionBy = Seq("bucket"))
  }

  /** Encode a batch with the index's FROZEN on-disk model into
    * append-ready bucketed postings — the seam [[insertInto]] and the
    * streaming sink share, so batch and stream can never disagree on
    * the encoding. */
  private[graft] def encodeForIndex(store: VectorStore, name: String,
                                    docs: DataFrame, textCol: String,
                                    idCol: String): DataFrame = {
    val sp = docs.sparkSession
    val (nBuckets, nDocs) = readProps(store, name)
    val model = sp.read.parquet(s"${store.root}/$name/_model")
    encodeAgainst(docs, textCol, idCol, model, nDocs)
      .withColumn("bucket", bucketOf(col("term"), nBuckets))
      .select("term", "doc_id", "w_mu", "bucket")
  }

  /** Search the stored layout: bucket ids of the query terms are
    * computed through the SAME Spark expression as the build (a
    * |terms|-row local job — driver and layout can never disagree on
    * the hash), the scan filters to those buckets (PartitionFilters;
    * only touched directories are listed/read), then the identical
    * integer dot-product ranking as [[topK]]. */
  def searchStored(spark: SparkSession, store: VectorStore, name: String,
                   query: Seq[(String, Double)], k: Int): DataFrame = {
    require(query.nonEmpty, "sparse query needs at least one term")
    // eager: top-k is bounded, and callers destroy throwaway stores in
    // a finally — a lazy frame would read a deleted directory
    val out = topK(prunedPostings(spark, store, name, query.map(_._1)),
      query, k)
    eager(spark, out)
  }

  /** Impact-threshold sparse search — the classic impact-ordered-index
    * trade: postings below `minImpactMu` micro-units are SKIPPED, so a
    * candidate's score keeps only its strong term matches. Approximate
    * by design (scores are lower bounds of the exact dot product;
    * `minImpactMu = 0` degenerates to exact) but DETERMINISTICALLY so —
    * the cutoff is a pure predicate, which is what lets the gate oracle
    * restate the approximation exactly instead of settling for a recall
    * bound. At scale the predicate lands in PushedFilters against the
    * impact-clustered layout [[buildIndex]] writes (row groups sorted
    * by w_mu carry tight min/max stats), so the skipped postings are
    * never read, not merely filtered — the I/O win impact ordering
    * exists for. */
  def searchStoredImpact(spark: SparkSession, store: VectorStore, name: String,
                         query: Seq[(String, Double)], k: Int,
                         minImpactMu: Long): DataFrame = {
    require(minImpactMu >= 0, "minImpactMu must be non-negative")
    val out = topK(
      prunedPostings(spark, store, name, query.map(_._1))
        .filter(col("w_mu") >= minImpactMu),
      query, k)
    eager(spark, out)
  }

  /** Metadata-filtered sparse search over the stored index —
    * filter-then-rank: survivors score exactly their unfiltered dot
    * product (weights are frozen per (doc, term); there are no corpus
    * stats a filter could shift — simpler than the BM25 analog by
    * construction). Scale shape mirrors
    * [[graft.text.TextIndex.bm25SearchStoredFiltered]]: the CANDIDATE
    * ids (bounded by the query terms' postings) broadcast INTO the
    * allowed-set scan as a map-only semi, and the ≤-candidate survivors
    * broadcast back onto the postings — the corpus-sized allowed set
    * never crosses a shuffle. */
  def searchStoredFiltered(spark: SparkSession, store: VectorStore,
                           name: String, query: Seq[(String, Double)], k: Int,
                           allowed: DataFrame): DataFrame = {
    require(query.nonEmpty, "sparse query needs at least one term")
    val pruned = prunedPostings(spark, store, name, query.map(_._1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val estBytes = pruned.count() * 48
      val hitIds = pruned.select("doc_id").distinct()
      val allowedIds = allowed
        .select(col(allowed.columns.head).as("doc_id"))
      val surviving = allowedIds.join(
        BroadcastGate.maybeBroadcast(hitIds, estBytes), Seq("doc_id"), "left_semi")
      val gated = pruned.join(
        BroadcastGate.maybeBroadcast(surviving, estBytes), Seq("doc_id"), "left_semi")
      val out = topK(gated, query, k)
      val rows = out.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally { pruned.unpersist(); () }
  }

  /** Batch search over the stored layout: ONE scan pruned to the union
    * of every query's terms' buckets, then [[topKMany]]. */
  def searchStoredMany(spark: SparkSession, store: VectorStore, name: String,
                       queries: Seq[(String, Seq[(String, Double)])],
                       k: Int): DataFrame = {
    require(queries.nonEmpty, "batch sparse search needs at least one query")
    val terms = queries.flatMap(_._2.map(_._1)).distinct
    val out = topKMany(prunedPostings(spark, store, name, terms), queries, k)
    eager(spark, out)
  }

  /** The bucket-pruned postings fetch [[searchStored]] scores over —
    * exposed so the pruning spec pins the exact scan the search runs.
    * Tombstoned docs are filtered here, so every read verb sees the
    * live set. */
  private[graft] def prunedPostings(spark: SparkSession, store: VectorStore,
                                    name: String, terms: Seq[String]): DataFrame = {
    import spark.implicits._
    // resolve once so the props probe, the empty-bucket listing, and the
    // scan below all read the same concrete collection behind an alias
    val concrete = store.resolve(name)
    val (nBuckets, _) = readProps(store, concrete)
    // an index whose every bucket compacted away to empty has no data
    // directories left — a valid (empty) index, not a read error
    if (!StoreFs.forPath(store.root).list(s"${store.root}/$concrete")
        .exists(_.getPath.getName.startsWith("bucket=")))
      return Seq.empty[(String, Long, Long)].toDF("term", "doc_id", "w_mu")
    val buckets = terms.toDF("term")
      .select(bucketOf(col("term"), nBuckets))
      .collect().map(_.getInt(0)).toSeq.distinct
    // through store.read, not a raw parquet path: every stored-index
    // read gets recoverStranded healing + alias resolution (the
    // TextIndex.prunedPostings discipline); the bucket filter on top
    // still lands in PartitionFilters
    val pruned = store.read(spark, concrete)
      .filter(col("bucket").isin(buckets.map(Int.box): _*))
      .select("term", "doc_id", "w_mu")
    liveOnly(spark, store, concrete, pruned)
  }

  private def deletedPath(store: VectorStore, name: String) =
    s"${store.root}/$name/_deleted"

  /** DELETE docs from the stored sparse index — O(batch): doc-id
    * tombstones appended to an `_deleted` log, postings stay on disk
    * and every read verb anti-joins the log (the TextIndex delete
    * discipline). The frozen encoder makes this the WHOLE story: df/N
    * are build-time model artifacts, so removing a doc changes no other
    * doc's weight — no stats decrement, no idf drift, nothing to keep
    * consistent beyond the tombstone append itself. Re-inserting a
    * tombstoned id is refused by the append contract (its postings are
    * still physically present), matching the text tier. */
  def deleteFrom(store: VectorStore, name: String, ids: DataFrame): Unit = {
    readProps(store, name): Unit // fail fast on a non-sparse-index path
    ids.select(col(ids.columns.head).cast("long").as("doc_id"))
      .write.mode("append").parquet(deletedPath(store, name))
  }

  /** Anti-join against the tombstone log; size-gated broadcast that
    * FAILS CLOSED (unmeasurable bytes = too big = shuffle join). */
  private def liveOnly(spark: SparkSession, store: VectorStore, name: String,
                       df: DataFrame): DataFrame = {
    val raw = StoreFs.forPath(store.root)
    val path = deletedPath(store, name)
    if (!raw.exists(path)) df
    else {
      val ts = spark.read.parquet(path).select("doc_id").distinct()
      df.join(BroadcastGate.maybeBroadcast(ts, raw.treeBytesFailClosed(path)),
        Seq("doc_id"), "left_anti")
    }
  }

  private val CompactJournal = "_sparse_compact.properties"
  private val CompactStageDir = "_sparse_compact_stage"
  private def journalPath(store: VectorStore, name: String) =
    s"${store.root}/$name/$CompactJournal"

  /** Bucket-targeted compaction + tombstone folding — the maintenance
    * triad's third axis for the sparse tier. Dirty = buckets past
    * `maxFilesPerBucket` fragments (streaming/insert appends) ∪ buckets
    * still holding a tombstoned doc's postings (found with ONE
    * column-pruned scan against the bounded tombstone set). Dirty
    * buckets are rewritten LIVE-ONLY to one file each — O(dirty
    * buckets), never O(index) — and the tombstone log is truncated in
    * the same journaled commit, so the anti-join cost of deletes is
    * reclaimed, not just the file count.
    *
    * Crash-safety is the text tier's staged-promote discipline (a bare
    * dynamic-partition overwrite deletes a live bucket directory before
    * its replacement lands): stage under an `_`-scratch dir, ONE atomic
    * journal write as the commit point, idempotent per-bucket promote
    * (with the log truncation inside the journaled replay), every
    * intermediate state serving each live posting exactly once.
    * Returns the rewritten bucket ids (including any resumed). */
  def compactIndex(spark: SparkSession, store: VectorStore, name: String,
                   maxFilesPerBucket: Int = 4): Seq[Int] = {
    require(maxFilesPerBucket >= 1, "maxFilesPerBucket must be >= 1")
    val sfs = StoreFs.forPath(store.root)
    val resumed = promoteStaged(store, name)
    val collDir = s"${store.root}/$name"
    val perBucket = store.dataFileStatuses(name)
      .filter(_.getPath.getParent.getParent.getName == name) // not scratch
      .flatMap { f =>
        val dir = f.getPath.getParent.getName
        if (dir.startsWith("bucket=")) Some(dir.stripPrefix("bucket=").toInt)
        else None
      }
      .groupBy(identity).view.mapValues(_.size).toMap
    val fragDirty = perBucket.filter(_._2 > maxFilesPerBucket).keys.toSeq
    val hasTombstones = sfs.exists(deletedPath(store, name))
    // SNAPSHOT the tombstone file set FIRST: this exact set drives both
    // the dirty-bucket derivation and the journaled truncation, so a
    // delete landing anywhere after this listing is neither folded nor
    // relied upon — its log file survives the truncation and its
    // postings (in buckets this pass doesn't rewrite) stay anti-joined
    // until the next compact. Closes the scan→journal race without a
    // writer lock.
    val foldFiles =
      if (!hasTombstones) Nil
      else sfs.list(deletedPath(store, name))
        .map(_.getPath.getName).filter(_.startsWith("part-"))
    val tombDirty =
      if (foldFiles.isEmpty) Nil
      else {
        val ts = spark.read.parquet(
            foldFiles.map(f => s"${deletedPath(store, name)}/$f"): _*)
          .select("doc_id").distinct()
        spark.read.parquet(collDir).select("bucket", "doc_id")
          .join(BroadcastGate.maybeBroadcast(ts,
            sfs.treeBytesFailClosed(deletedPath(store, name))),
            Seq("doc_id"), "left_semi")
          .select("bucket").distinct()
          .collect().map(_.getInt(0)).toSeq
      }
    val dirty = (fragDirty ++ tombDirty).distinct.sorted
    if (dirty.nonEmpty || foldFiles.nonEmpty) {
      val stage = s"$collDir/$CompactStageDir"
      sfs.deleteTree(stage) // a pre-journal crash leaves only dead stage
      if (dirty.nonEmpty)
        liveOnly(spark, store, name,
            spark.read.parquet(collDir)
              .filter(col("bucket").isin(dirty.map(Int.box): _*))
              .select("term", "doc_id", "w_mu", "bucket"))
          .repartition(dirty.length, col("bucket"))
          .write.partitionBy("bucket").parquet(stage)
      // a dirty bucket whose LIVE content is empty (every posting
      // tombstoned) writes no staged directory — record those
      // explicitly so the promote can distinguish "rewrote to empty:
      // delete the live dir" from "already promoted in a replay:
      // leave it alone" (conflating them either resurrects the dead
      // bucket or deletes a live one)
      val staged =
        if (!sfs.exists(stage)) Set.empty[Int]
        else sfs.list(stage).map(_.getPath.getName)
          .filter(_.startsWith("bucket="))
          .map(_.stripPrefix("bucket=").toInt).toSet
      val emptied = dirty.filterNot(staged)
      // the commit point: buckets + the EXACT tombstone files folded —
      // file-level truncation, because a whole-log delete replayed
      // after a crash would silently resurrect any doc tombstoned
      // BETWEEN the journal write and the replay
      val props = new java.util.Properties()
      props.setProperty("buckets", dirty.mkString(","))
      props.setProperty("empty_buckets", emptied.mkString(","))
      props.setProperty("fold_files", foldFiles.mkString(","))
      sfs.writePropsAtomic(journalPath(store, name), props,
        "graft sparse-index compaction journal")
      promoteStaged(store, name): Unit
    }
    (resumed ++ dirty).distinct.sorted
  }

  /** Idempotent promote of a journaled compaction stage (no-op without
    * a journal): per bucket live → `_old_bucket=` shadow → staged →
    * live, shadow deleted; then the journaled tombstone-log truncation;
    * journal cleared last. Re-runnable from any crash point. */
  private def promoteStaged(store: VectorStore, name: String): Seq[Int] = {
    val sfs = StoreFs.forPath(store.root)
    sfs.readProps(journalPath(store, name)).fold(Seq.empty[Int]) { props =>
      val buckets = props.getProperty("buckets", "").split(",")
        .filter(_.nonEmpty).map(_.toInt).toSeq
      val emptied = props.getProperty("empty_buckets", "").split(",")
        .filter(_.nonEmpty).map(_.toInt).toSet
      val collDir = s"${store.root}/$name"
      // journaled-empty buckets: the live rewrite dropped every row, so
      // the promote IS a delete of the live dir (idempotent)
      emptied.foreach(b => sfs.deleteTree(s"$collDir/bucket=$b"))
      buckets.filterNot(emptied).foreach { b =>
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
      val folded = props.getProperty("fold_files", "").split(",")
        .filter(_.nonEmpty).toSeq
      if (folded.nonEmpty) {
        val dir = deletedPath(store, name)
        folded.foreach(f => sfs.deleteTree(s"$dir/$f"))
        // drop the directory only if NO data file remains (a delete
        // that landed after the journal keeps the log alive)
        if (sfs.exists(dir) &&
            !sfs.list(dir).exists(_.getPath.getName.startsWith("part-")))
          sfs.deleteTree(dir)
      }
      sfs.deleteTree(s"$collDir/$CompactStageDir")
      sfs.deleteTree(journalPath(store, name))
      buckets
    }
  }
}
