package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The append-only contract every incremental index-maintenance verb
  * enforces ([[GraphAnn.insertIntoStored]],
  * [[Similarity.insertIntoStoredIvf]]): batch ids must be UNIQUE within
  * the batch and NEW to the stored index. One definition so a fix to
  * the check (size estimate, error wording, null handling) reaches
  * every tier.
  *
  * Cost shape: one bounded agg over the batch, then ONE map-only
  * column-pruned pass over the index's slim id column — the batch ids
  * ride a size-gated broadcast into a left-semi COUNT (a limit(1)
  * probe would cost several escalating partial jobs in the
  * no-collision common case; an `intersect` would distinct-shuffle the
  * FULL index id space). Returns the batch row count (the caller
  * usually wants it anyway). */
private[graft] object AppendContract {

  def requireNewUniqueIds(store: graft.store.VectorStore, name: String,
                          batch: DataFrame, idCol: String,
                          op: String): Long = {
    val cnts = batch.agg(count(lit(1)), countDistinct(col(idCol))).head
    requireUnique(cnts.getLong(0), cnts.getLong(1), op)
    requireNoExisting(store, name, batch, idCol, cnts.getLong(0), op)
    cnts.getLong(0)
  }

  /** The batch-internal half of the contract on PRE-AGGREGATED counts —
    * for callers that fold the count/countDistinct into a job they run
    * anyway (the graph/IVF insert verbs piggyback it on the touched-cell
    * collect). */
  def requireUnique(total: Long, distinct: Long, op: String): Unit =
    require(total == distinct,
      s"$op: batch contains duplicate ids — append semantics require " +
        "new, unique ids")

  /** The index-collision half: ONE map-only column-pruned pass over the
    * index's slim id column, batch ids riding a size-gated broadcast
    * into a left-semi COUNT. */
  def requireNoExisting(store: graft.store.VectorStore, name: String,
                        batch: DataFrame, idCol: String, batchCount: Long,
                        op: String): Unit = {
    // countDistinct, not count: an index keyed at (term, doc) grain
    // (text/sparse postings) holds many rows per id — a raw row count
    // would report one colliding doc as its whole vocabulary
    val dupCount = store.read(batch.sparkSession, name).select(idCol)
      .join(BroadcastGate.maybeBroadcast(
        batch.select(col(idCol)), batchCount * 64), Seq(idCol), "left_semi")
      .agg(countDistinct(col(idCol))).head.getLong(0)
    require(dupCount == 0L,
      s"$op: batch re-inserts $dupCount existing id(s) into '$name' — " +
        "append semantics require new ids")
  }
}
