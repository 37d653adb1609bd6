package graft.streaming

import graft.operators.{BroadcastGate, Similarity}
import graft.store.{StreamCommits, VectorStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Continuous ingest into a STORED ANN index: vectors arrive as a
  * stream and land in the cell-partitioned IVF layout per micro-batch —
  * the online half of the stored-index story (the batch half is
  * [[Similarity.insertIntoStoredIvf]], the nightly append). IVF needs
  * no rebuild on insert (cells are unordered candidate lists), which is
  * exactly what makes it the index family that can absorb a stream:
  * per-batch cost is O(batch) assignment + O(batch) new files under the
  * touched cell directories, and searches over the store see every
  * committed batch with no maintenance step in between.
  *
  * Exactly-once across restarts, in two layers:
  *  1. batches at or below the [[StreamCommits]] watermark are skipped
  *     outright (Structured Streaming replays a restarted batch with
  *     the SAME batchId — the watermark makes the replay free);
  *  2. the crash window between the parquet append and the watermark
  *     commit self-heals: each batch is filtered to ids NOT already in
  *     the index before appending (one column-pruned map-only pass over
  *     the index's slim id column — the ids already landed by the
  *     half-committed attempt drop out, the rest complete it). This is
  *     the streaming counterpart of the batch tier's append contract
  *     ([[graft.operators.AppendContract]]): same uniqueness invariant,
  *     but a replayed collision here is EXPECTED recovery, not an error
  *     — so it filters instead of refusing.
  */
object IndexStream {

  /** The exactly-once APPEND sink every encode-and-append index family
    * shares (IVF, BQ, SQ, PQ — everything whose per-batch effect is new
    * files, no rebuild): encode the micro-batch with the family's FROZEN
    * quantizer, refuse in-batch duplicate ids (a data error — which copy
    * wins would be undefined; cross-batch collisions are RECOVERY and
    * filter instead), anti-filter against the index's slim id column
    * (the append-vs-commit crash window heals per id), append, commit
    * the watermark. One definition so a fix to the discipline (the
    * pin-before-require ordering, the broadcast gates) reaches every
    * family. */
  def encodedBatchSink(store: VectorStore, name: String, idCol: String,
                       encode: DataFrame => DataFrame,
                       partitionBy: Seq[String], sinkTag: String)(
                       batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= StreamCommits.lastBatchId(store, name)) return
    val sp = batch.sparkSession
    // pin BEFORE the dup require, so the check, the collision probe, and
    // the append all see ONE evaluation of the batch
    val encoded = encode(batch).localCheckpoint(true)
    val cnts = encoded.agg(count(lit(1)), countDistinct(col(idCol))).head
    require(cnts.getLong(0) == cnts.getLong(1),
      s"$sinkTag: micro-batch $batchId carries duplicate ids")
    // ids this batch shares with the index — bounded by the batch, so
    // it broadcasts back out for the anti filter; the index side is
    // only ever the streamed side of a map-only semi-join. Pinned so
    // the collision COUNT below and the anti filter see one evaluation
    // (and the semi-join scan is paid once, not once per consumer).
    val colliding = store.read(sp, name).select(idCol)
      .join(BroadcastGate.maybeBroadcast(encoded.select(idCol),
        cnts.getLong(0) * 64), Seq(idCol), "left_semi")
      .localCheckpoint(true)
    // a fully-healed redelivery (every id already landed) must cost a
    // bounded probe, not a distributed write of zero rows: ids are
    // unique per batch, so |fresh| = |batch| - |colliding| exactly
    if (colliding.count() < cnts.getLong(0)) {
      val fresh = encoded.join(BroadcastGate.maybeBroadcast(colliding,
        cnts.getLong(0) * 64), Seq(idCol), "left_anti")
      store.append(name, fresh, partitionBy = partitionBy)
    }
    // the commit point: only once the append is durable does the batch
    // become skippable — a crash above replays into the anti filter
    StreamCommits.commit(store, name, batchId)
  }

  /** The `foreachBatch` body: exactly-once append of one micro-batch
    * into the stored IVF index `name` under the frozen centroids
    * `cents`. Public and callable outside a stream on purpose — the
    * gate query drives the replay paths deterministically by invoking
    * it with controlled batchIds. */
  def ivfBatchSink(store: VectorStore, name: String, vecCol: String,
                   idCol: String, cents: Array[(Int, Array[Float])])(
                   batch: DataFrame, batchId: Long): Unit =
    encodedBatchSink(store, name, idCol,
      Similarity.withCellId(_, vecCol, cents), Seq("cell_id"),
      "ivfBatchSink")(batch, batchId)

  /** BQ / SQ / PQ sinks — the same frozen-quantizer encodes the batch
    * verbs use ([[Similarity.insertIntoStoredBq]] and siblings), through
    * the shared exactly-once sink. */
  def bqBatchSink(store: VectorStore, name: String, vecCol: String,
                  idCol: String, dim: Int = 64)(
                  batch: DataFrame, batchId: Long): Unit =
    encodedBatchSink(store, name, idCol,
      Similarity.bqEncodeFor(_, vecCol, idCol, dim), Nil,
      "bqBatchSink")(batch, batchId)

  def sqBatchSink(store: VectorStore, name: String, vecCol: String,
                  idCol: String, cents: Array[Array[Float]],
                  mins: Array[Double], maxs: Array[Double])(
                  batch: DataFrame, batchId: Long): Unit =
    encodedBatchSink(store, name, idCol,
      Similarity.sqAssignEncode(_, vecCol, idCol, cents, mins, maxs),
      Seq("cell_id"), "sqBatchSink")(batch, batchId)

  def pqBatchSink(store: VectorStore, name: String, vecCol: String,
                  idCol: String, cents: Array[(Int, Array[Float])],
                  cb: Similarity.PqCodebook)(
                  batch: DataFrame, batchId: Long): Unit =
    encodedBatchSink(store, name, idCol,
      Similarity.pqEncode(_, vecCol, idCol, cents, cb), Seq("cell_id"),
      "pqBatchSink")(batch, batchId)

  /** Drive `sink` over the arrival slice (vec_id % 10 == 7) of an
    * embeddings parquet, then deterministically replay both recovery
    * paths — the harness every streaming-ingest gate query shares. */
  def runArrivalStream(spark0: SparkSession, embParquet: String,
                       store: VectorStore, name: String,
                       sink: (DataFrame, Long) => Unit): Unit = {
    val spark = EventStream.streamSession(spark0)
    val arrivals = EventStream.readFileStream(spark, embParquet)
      .filter(col("vec_id") % 10 === 7)
    val q = arrivals.writeStream
      .foreachBatch(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    val replayed = spark.read.parquet(
        new java.io.File(embParquet).getAbsolutePath)
      .filter(col("vec_id") % 10 === 7)
    sink(replayed, StreamCommits.lastBatchId(store, name))
    sink(replayed, StreamCommits.lastBatchId(store, name) + 1)
  }

  /** Harness: stream the arrivals slice (vec_id % 10 == 7) of an
    * embeddings parquet into a stored IVF index built from the standing
    * slice, with centroids trained once on the full corpus (the frozen
    * router), then REPLAY two batches through the sink — one below the
    * watermark (skipped) and one carrying only already-inserted ids
    * (anti-filtered to nothing) — and return the maintained store's
    * collection for probing. The caller searches it exactly like
    * `ann_ivf_store`; a hash match against the same full-corpus oracle
    * proves streaming ingest (and both replay paths) invisible to the
    * answer. */
  def runStreamingIvfIngest(spark0: SparkSession, embParquet: String,
                            store: VectorStore, name: String,
                            cents: Array[(Int, Array[Float])]): Unit =
    runArrivalStream(spark0, embParquet, store, name,
      ivfBatchSink(store, name, "embedding", "vec_id", cents) _)

  // ------------------------------------------- stored GRAPH index sink

  /** `foreachBatch` body for the stored NSW GRAPH index — the last
    * index family to gain a streaming ingest path, and the only one
    * whose per-batch effect is a REBUILD rather than a plain append
    * ([[graft.operators.GraphAnn.insertIntoStored]] re-links the
    * touched cells' graphs). Exactly-once with the same two layers as
    * [[ivfBatchSink]]: the [[StreamCommits]] watermark skips replayed
    * batchIds, and the append-vs-commit crash window self-heals by
    * anti-filtering the batch against the index's slim id column —
    * ids whose rebuild already landed drop out (re-running the insert
    * verb with them would REFUSE via the append contract, correctly:
    * there a collision is a data error, here it is expected recovery).
    * The touched-cell overwrite itself relies on the write job's own
    * commit protocol, same as the nightly batch verb. */
  def graphBatchSink(store: VectorStore, name: String, vecCol: String,
                     idCol: String, cents: Array[Array[Float]],
                     m: Int = 8, efConstruction: Int = 32)(
                     batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= StreamCommits.lastBatchId(store, name)) return
    val sp = batch.sparkSession
    // pin BEFORE the dup require: the check, the heal probe, and the
    // insert must all see one evaluation of the batch
    val pinned = batch.localCheckpoint(true)
    val cnts = pinned.agg(count(lit(1)), countDistinct(col(idCol))).head
    require(cnts.getLong(0) == cnts.getLong(1),
      s"graphBatchSink: micro-batch $batchId carries duplicate ids")
    val colliding = store.read(sp, name).select(col("id").as(idCol))
      .join(BroadcastGate.maybeBroadcast(
        pinned.select(col(idCol).cast("long").as(idCol)),
        cnts.getLong(0) * 64), Seq(idCol), "left_semi")
    val collidingB = BroadcastGate.maybeBroadcast(colliding, cnts.getLong(0) * 64)
    val fresh = pinned.join(collidingB,
      pinned(idCol).cast("long") === collidingB(idCol), "left_anti")
    if (!fresh.isEmpty)
      graft.operators.GraphAnn.insertIntoStored(store, name, fresh,
        vecCol, idCol, cents, m, efConstruction): Unit
    StreamCommits.commit(store, name, batchId)
  }

  /** Harness twin of [[runStreamingIvfIngest]] for the graph index:
    * stream the arrival slice into a stored NSW graph built from the
    * standing slice (frozen full-corpus router), then deterministically
    * replay both recovery paths (below-watermark skip; new-batchId
    * all-ids-landed anti-filter). The caller checks the maintained
    * store's ASSIGNMENT MANIFEST under the gate hash (cell routing is
    * SQL-derivable; the adjacency is the walk kernel's spec territory). */
  def runStreamingGraphIngest(spark0: SparkSession, embParquet: String,
                              store: VectorStore, name: String,
                              cents: Array[Array[Float]]): Unit =
    runArrivalStream(spark0, embParquet, store, name,
      graphBatchSink(store, name, "embedding", "vec_id", cents) _)

  // ------------------------------------------- stored TEXT index sink

  /** `foreachBatch` body for the stored inverted text index
    * ([[graft.text.TextIndex]]) — exactly-once like [[ivfBatchSink]],
    * with one extra moving part the vector tier doesn't have: the batch
    * must commit BOTH its postings (parquet append) and its corpus-stat
    * delta (sidecar n_docs/sum_dl — BM25's idf inputs), and the two
    * must never disagree. The protocol is a write-ahead intent, every
    * transition one atomic sidecar replace:
    *
    *  1. skip if batchId <= the sidecar watermark (replay after full
    *     commit);
    *  2. record the intent: pending = (batchId, batch doc count, batch
    *     token count) — computed from the batch BEFORE anything lands;
    *  3. append postings, anti-filtered per ROW against the stored
    *     (term, doc_id) pairs of this batch's doc ids — so a crash that
    *     tore MID-append (a doc's postings span several bucket
    *     directories, unlike the vector tier's one-row-per-id) is
    *     completed posting-by-posting on redelivery, never duplicated;
    *  4. commit: fold pending into the committed stats and advance the
    *     watermark in the SAME atomic write that clears the intent.
    *
    * Crash between 2 and 4 ⇒ the redelivered batch (same batchId, the
    * Structured Streaming contract) finds its own intent and finishes
    * steps 3-4 idempotently. A pending intent from a DIFFERENT batch,
    * or a colliding batch with no intent (redelivery under a new
    * batchId after commit), is refused loudly — counting its stats
    * again would silently skew every idf, which is worse than stopping
    * the stream. Search and the batch verbs refuse a pending index for
    * the same reason. */
  def textBatchSink(store: VectorStore, name: String, textCol: String,
                    idCol: String)(batch: DataFrame, batchId: Long): Unit = {
    import graft.text.TextIndex
    val st = TextIndex.readState(store, name)
    if (batchId <= st.lastBatch) return
    st.pending.foreach { p =>
      require(p.batchId == batchId,
        s"textBatchSink: '$name' holds an intent for batch ${p.batchId} but " +
          s"batch $batchId arrived — redeliver the pending batch to heal")
    }
    val cnts = batch.agg(count(lit(1)), countDistinct(col(idCol))).head
    require(cnts.getLong(0) == cnts.getLong(1),
      s"textBatchSink: micro-batch $batchId carries duplicate doc ids")
    // the shared protocol core (TextIndex.appendWithIntent) runs steps
    // 2-4; collisions refuse when there is no intent to heal (a
    // redelivery under a NEW batchId after commit), and the recorded
    // intent is matched against the redelivered batch's stats
    TextIndex.appendWithIntent(store, name, batch, textCol, idCol,
      st.copy(pending = None), batchId,
      expect = st.pending, newLastBatch = Some(batchId),
      refuseCollisions = st.pending.isEmpty): Unit
  }

  /** Harness twin of [[runStreamingIvfIngest]] for the text index:
    * stream the arrivals slice (doc_id % 10 == 7) into an index built
    * from the standing slice, then replay the last batch (same batchId
    * — must skip via the watermark). The caller searches the maintained
    * index; a hash match against the full-corpus BM25 oracle proves the
    * streamed maintenance invisible. */
  def runStreamingTextIngest(spark0: SparkSession, docsParquet: String,
                             store: VectorStore, name: String): Unit = {
    val spark = EventStream.streamSession(spark0)
    val arrivals = EventStream.readFileStream(spark, docsParquet)
      .filter(col("doc_id") % 10 === 7)
    val q = arrivals.writeStream
      .foreachBatch(textBatchSink(store, name, "text", "doc_id") _)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    // replay after full commit, same batchId: the watermark skips it
    val replayed = spark.read.parquet(
        new java.io.File(docsParquet).getAbsolutePath)
      .filter(col("doc_id") % 10 === 7)
    textBatchSink(store, name, "text", "doc_id")(
      replayed, graft.text.TextIndex.readState(store, name).lastBatch)
  }

  // ----------------------------------------- stored SPARSE index sink

  /** `foreachBatch` body for the stored sparse inverted index
    * ([[graft.operators.SparseSearch]]) — exactly-once, and notably
    * SIMPLER than [[textBatchSink]]'s intent protocol: the sparse
    * index's encoder is FROZEN at build time (df/N are model artifacts,
    * not live corpus stats), so a batch commits postings and a
    * watermark and nothing else — there is no stats delta that could
    * disagree with the data. What remains is the torn-append hazard the
    * text tier also has (a doc's postings span several bucket
    * directories), healed the same way: the batch's postings
    * anti-filter per ROW against the stored `(term, doc_id)` pairs of
    * its own doc ids, so a crash mid-append is completed
    * posting-by-posting on redelivery, never duplicated. */
  def sparseBatchSink(store: VectorStore, name: String, textCol: String,
                      idCol: String)(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= StreamCommits.lastBatchId(store, name)) return
    val sp = batch.sparkSession
    val cnts = batch.agg(count(lit(1)), countDistinct(col(idCol))).head
    require(cnts.getLong(0) == cnts.getLong(1),
      s"sparseBatchSink: micro-batch $batchId carries duplicate ids")
    val postings = graft.operators.SparseSearch
      .encodeForIndex(store, name, batch, textCol, idCol)
      .localCheckpoint(true) // consumed twice (heal probe + append)
    // stored (term, doc_id) rows of THIS batch's doc ids — on a heal
    // redelivery that relation is as large as the batch's OWN posting
    // volume, so the gate estimate must be posting-scaled, not
    // row-scaled (a doc averages hundreds of distinct terms; an id-row
    // estimate would force-broadcast gigabytes). The localCheckpoint
    // makes the count a metadata read, not a recompute.
    val batchIds = batch.select(col(idCol).as("doc_id")).distinct()
    val nPostings = postings.count()
    val postBytes = nPostings * 64
    val existing = store.read(sp, name).select("term", "doc_id")
      .join(BroadcastGate.maybeBroadcast(batchIds, cnts.getLong(0) * 64),
        Seq("doc_id"), "left_semi")
      .localCheckpoint(true) // consumed by the count gate + anti filter
    // fully-healed redelivery (every posting already landed) costs a
    // bounded probe, not a distributed write of zero rows: under the
    // redelivery contract (same batch, frozen deterministic encoder)
    // the stored pairs of this batch's docs are a SUBSET of the batch's
    // own postings, so |fresh| = |postings| - |existing| exactly
    if (existing.count() < nPostings) {
      val fresh = postings.join(
        BroadcastGate.maybeBroadcast(existing, postBytes),
        Seq("term", "doc_id"), "left_anti")
      store.append(name, fresh, partitionBy = Seq("bucket"))
    }
    StreamCommits.commit(store, name, batchId)
  }

  /** Harness mirroring [[runStreamingTextIngest]]: stream the arrival
    * slice into a sparse index built on the standing corpus (frozen
    * encoder), then drive both replay regimes through the sink — the
    * committed batchId (watermark skip) and a redelivery under a new
    * batchId (anti-filters to nothing; legal here precisely because
    * there are no live stats to double-count). */
  def runStreamingSparseIngest(spark0: SparkSession, docsParquet: String,
                               store: VectorStore, name: String): Unit = {
    val spark = EventStream.streamSession(spark0)
    val arrivals = EventStream.readFileStream(spark, docsParquet)
      .filter(col("doc_id") % 10 === 7)
    val q = arrivals.writeStream
      .foreachBatch(sparseBatchSink(store, name, "text", "doc_id") _)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    val replayed = spark.read.parquet(
        new java.io.File(docsParquet).getAbsolutePath)
      .filter(col("doc_id") % 10 === 7)
    sparseBatchSink(store, name, "text", "doc_id")(
      replayed, StreamCommits.lastBatchId(store, name))
    sparseBatchSink(store, name, "text", "doc_id")(
      replayed, StreamCommits.lastBatchId(store, name) + 1)
  }
}
