package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mixture planning for training-data pipelines: turning per-domain
  * corpus statistics into exact, reproducible sampling plans. The
  * sampling/packing EXECUTION verbs live in Queries (mix_weighted_sample,
  * pack_*); this object owns the PLANNING arithmetic that decides how
  * much of each domain a run should take.
  */
object Mixture {

  /** Temperature-scaled sampling allocation — the standard multilingual /
    * multi-domain mixing rule (sample domain d with probability ∝ n_d^τ;
    * τ < 1 flattens the head so low-resource domains are up-weighted):
    * given per-row domains and a document budget, one row per domain with
    * its count, fixed-point temperature weight, and an integer quota that
    * sums to EXACTLY the budget via largest-remainder apportionment.
    *
    * Determinism contract: τ = 0.5 computes with sqrt — correctly rounded
    * under IEEE-754 on every engine, where pow carries no such guarantee —
    * then every later step is integer: weights floor to 1e-6 fixed-point
    * BIGINTs, base quotas are budget·w ÷ Σw integer division, and the
    * leftover (< #domains) goes to the largest (budget·w mod Σw)
    * remainders, domain-asc ties. The whole plan therefore hash-matches a
    * SQL restatement. General τ uses pow and is NOT cross-engine exact —
    * keep it out of oracles (spec-pin it instead).
    *
    * Scale shape: ONE partial-aggregated groupBy(domain) — the only
    * shuffle carries a row per domain; apportionment runs on that
    * |domains|-row result (bounded, driver-side). At 100 TB the count
    * pass is the whole cost, and it is the minimal one. */
  /** As [[temperatureAllocation]], but sized by an integer weight column
    * (token counts — what a training budget actually allocates) instead
    * of row counts: n_d = Σ sizeCol over the domain, and the budget is a
    * TOKEN budget. Same exactness contract — the per-domain sums are
    * integer aggregates, so the one sqrt still operates on an exact
    * value. */
  def temperatureAllocationBy(df: DataFrame, domainCol: String,
                              sizeCol: String, budget: Long,
                              tau: Double = 0.5): DataFrame =
    allocate(df.groupBy(col(domainCol).cast("string").as("domain"))
        .agg(sum(col(sizeCol).cast("long")).as("n")),
      budget, tau)

  def temperatureAllocation(df: DataFrame, domainCol: String,
                            budget: Long, tau: Double = 0.5): DataFrame =
    allocate(df.groupBy(col(domainCol).cast("string").as("domain"))
        .agg(count(lit(1)).as("n")),
      budget, tau)

  /** Shared apportionment core: one (domain, n) row per domain in, the
    * exact quota plan out. */
  private def allocate(grouped: DataFrame, budget: Long,
                       tau: Double): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val spark = grouped.sparkSession
    import spark.implicits._
    val counts = grouped
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    if (counts.isEmpty)
      return Seq.empty[(String, Long, Long, Long)]
        .toDF("domain", "n_docs", "w_fp", "quota")
    val wFp = counts.map { case (dom, n) =>
      val w =
        if (tau == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, tau)
      (dom, n, math.floor(w * 1e6).toLong)
    }
    // BigInt arithmetic: budget·w is ~budget·sqrt(n)·1e6 and overflows
    // Long at training scale (budget 1e12 × w_fp 1e11 ≈ 1e23); Σw itself
    // can pass Long.Max with enough huge domains. The quotient always
    // fits a Long (quota <= budget), so only the intermediates widen —
    // results are bit-identical to the Long path wherever it didn't
    // overflow, preserving the oracle hash.
    val sumW = wFp.iterator.map(w => BigInt(w._3)).sum
    val base = wFp.map { case (dom, n, w) =>
      val prod = BigInt(budget) * BigInt(w)
      (dom, n, w, (prod / sumW).toLong, prod % sumW)
    }
    val leftover = budget - base.map(_._4).sum
    // largest-remainder apportionment: rank by (remainder desc, domain asc)
    val bump = base.sortBy { case (dom, _, _, _, rem) => (-rem, dom) }
      .take(leftover.toInt).map(_._1).toSet
    base.map { case (dom, n, w, q, _) =>
      (dom, n, w, q + (if (bump(dom)) 1L else 0L))
    }.toSeq.toDF("domain", "n_docs", "w_fp", "quota")
  }

  /** Packing-strategy ADVISOR — the batch-prep decision between the two
    * shipped layouts: greedy per-shard packing
    * ([[graft.text.TextAnalysis.packSequences]] — documents never
    * straddle a sequence, at the cost of padding under-filled sequences
    * and overflowing spilled ones) vs concat-and-chunk
    * ([[graft.text.TextAnalysis.packConcatChunks]] — zero waste except
    * each shard's tail, but documents split across sequence
    * boundaries). One row per strategy with its sequence count, token
    * totals, padding and overflow, floor-rounded waste ratio (vs
    * n_seqs·seqLen capacity), and the recommendation: greedy when its
    * waste is affordable (ppm rule, integer-exact — boundary-preserving
    * wins when it costs little), concat otherwise. Exactly one row is
    * recommended; the whole table sits under a cross-engine hash.
    *
    * Scale shape: both packers are one window pass per shard; the
    * advisor adds a per-strategy single-row aggregate. */
  def packAdvisor(docs: DataFrame, textCol: String, idCol: String,
                  shardCol: String, seqLen: Int,
                  maxWastePpm: Long = 100000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val L = lit(seqLen.toLong)
    def stats(packed: DataFrame): (Long, Long, Long, Long) = {
      val r = packed.agg(count(lit(1)).as("n"),
        sum(col("seq_tokens")).as("t"),
        sum(greatest(lit(0L), L - col("seq_tokens"))).as("p"),
        sum(greatest(lit(0L), col("seq_tokens") - L)).as("o")).head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val (gn, gt, gp, go) = stats(graft.text.TextAnalysis.packSequences(
      docs, textCol, idCol, shardCol, budgetTokens = seqLen))
    val (cn, ct, cp, co) = stats(graft.text.TextAnalysis.packConcatChunks(
      docs, textCol, idCol, shardCol, seqLen = seqLen))
    val greedyAffordable =
      gn > 0 && (gp + go) * 1000000L <= gn * seqLen * maxWastePpm
    def ratio(pad: Long, over: Long, n: Long): Double =
      if (n == 0) 0.0
      else math.floor((pad + over).toDouble / (n * seqLen) * 1e6 + 0.5) / 1e6
    Seq(
      ("concat_chunks", cn, ct, cp, co, ratio(cp, co, cn), !greedyAffordable),
      ("greedy_docs", gn, gt, gp, go, ratio(gp, go, gn), greedyAffordable))
      .toDF("strategy", "n_seqs", "total_tokens", "pad_tokens",
        "overflow_tokens", "waste_ratio", "recommended")
  }
}
