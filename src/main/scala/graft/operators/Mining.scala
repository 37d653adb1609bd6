package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-pair mining for contrastive embedder training (the
  * DPR / SBERT / CLIP data-prep step): what makes a two-tower or
  * triplet model learn is not the positives — it is the NEGATIVES being
  * hard, i.e. close enough to the anchor that the model must move them.
  * Random negatives are almost always easy (cosine ~ 0 in high
  * dimension), so production pipelines mine the corpus for each
  * anchor's nearest other-class vectors and train against those.
  *
  * Relationship to the registry's band miner: `mine_hard_negatives`
  * (Queries) mines a LABEL-FREE cosine band [lo, hi) — the
  * self-supervised posture where no class structure exists and the
  * near-dup ceiling guards against false negatives. This operator is
  * the SUPERVISED half: labels define positives, and each negative is
  * classified against the anchor's nearest positive — the
  * FaceNet/SBERT triplet rule, which a band cannot express because the
  * hard/semi-hard boundary is PER-ANCHOR (it sits wherever that
  * anchor's best positive sits).
  *
  * Scale shape: anchors are a TRAINING BATCH — bounded by construction
  * (thousands), so they broadcast; the corpus side is one scan with the
  * codegen'd cosine kernel, then one shuffle partitioned by anchor for
  * the per-anchor top-k window. O(corpus · |batch|) scored pairs,
  * O(k · |batch|) output. When the batch outgrows broadcast, route both
  * sides through the IVF layout ([[Similarity.ivfSearchStoredMany]]
  * with an over-fetch) — the candidate generation changes, the
  * classification below does not.
  *
  * All emitted scores are integer micro-units (floor(cos·1e6 + 0.5) as
  * LONG) and the tier rule is pure integer comparison, so the whole
  * result — including the mining DECISION per pair — replays
  * relationally under the gate hash.
  */
object Mining {

  /** For each anchor: the `k` nearest corpus vectors from OTHER classes,
    * each classified against the anchor's nearest same-class positive
    * (its `pos_cos_mu`):
    *  - `hard`      — cos(a,n) ≥ cos(a,p): the negative outranks the
    *    positive; a retrieval model currently gets this anchor WRONG;
    *  - `semi_hard` — within `marginMu` below the positive: the
    *    triplet-loss band (violates the margin, still ordered right);
    *  - `easy`      — everything else that made top-k.
    *
    * Anchors with no same-class row in the corpus (no positive to
    * measure against) are dropped — a pair miner cannot classify what
    * it cannot anchor. The anchor itself never scores (id inequality),
    * so an anchor drawn FROM the corpus does not pair with itself. */
  def hardNegatives(corpus: DataFrame, vecCol: String, idCol: String,
                    labelCol: String,
                    anchors: DataFrame, aIdCol: String, aVecCol: String,
                    aLabelCol: String,
                    k: Int, marginMu: Long = 50000L): DataFrame = {
    require(k > 0, "hardNegatives: k must be positive")
    val scored = corpus.crossJoin(broadcast(anchors))
      .filter(col(idCol) =!= col(aIdCol))
      .withColumn("cos_mu",
        floor(cosine(col(vecCol), col(aVecCol)) * 1e6 + 0.5).cast("long"))
    // the anchor's nearest positive — |batch| rows, broadcast back
    val posBest = scored.filter(col(labelCol) === col(aLabelCol))
      .groupBy(col(aIdCol)).agg(max(col("cos_mu")).as("pos_cos_mu"))
    val w = Window.partitionBy(col(aIdCol))
      .orderBy(col("cos_mu").desc, col(idCol))
    scored.filter(col(labelCol) =!= col(aLabelCol))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .join(broadcast(posBest), Seq(aIdCol))
      .withColumn("tier",
        when(col("cos_mu") >= col("pos_cos_mu"), lit("hard"))
          .when(col("cos_mu") + lit(marginMu) >= col("pos_cos_mu"),
            lit("semi_hard"))
          .otherwise(lit("easy")))
      .select(col(aIdCol), col(idCol).as("neg_id"),
        col(labelCol).as("neg_label"), col("cos_mu"), col("rank"),
        col("pos_cos_mu"), col("tier"))
  }
}
