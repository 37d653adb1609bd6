package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast: mark a build side for broadcast only when its
  * estimated in-memory size is under a hard cap, otherwise leave it
  * unmarked so the planner picks a shuffle join.
  *
  * Rationale (100 TB posture): an unconditional `broadcast()` on a
  * relation that grows with the input (e.g. the id -> shingle-set side of
  * a dedup verification join) OOMs the driver/executors once the corpus
  * outgrows memory. The caller supplies a cheap estimate (rows x payload
  * width from an aggregation over an already-cached relation); under the
  * cap the broadcast keeps candidate-pair parallelism with no shuffle,
  * over it the join degrades gracefully to two hash joins on fixed-width
  * id keys.
  */
object BroadcastGate {

  /** Default cap: 256 MB — large enough that harness-scale build sides
    * always broadcast, small enough to never threaten executor memory. */
  val DefaultLimitBytes: Long = 256L << 20

  def maybeBroadcast(df: DataFrame, estimatedBytes: Long,
                     limitBytes: Long = DefaultLimitBytes): DataFrame =
    if (estimatedBytes <= limitBytes) broadcast(df) else df
}
