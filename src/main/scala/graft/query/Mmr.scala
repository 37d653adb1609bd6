package graft.query

import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance diversified retrieval (Carbonell &
  * Goldstein, SIGIR '98) — the standard "relevant but not redundant"
  * re-ranker offered by vector-retrieval stacks (Chroma-adjacent client
  * libraries expose it as `max_marginal_relevance_search`; the reference's
  * `search_for_rag` at /root/reference/src/RagWorkflow.py:30-73 is the
  * plain top-k this diversifies).
  *
  * Two-stage shape, the same recall-then-precision split as
  * [[graft.GraftQueries.ragRerank]]:
  *
  *  - '''Stage 1 (distributed):''' an exact top-`fetchN` candidate cut by
  *    cosine-to-query — a `TakeOrderedAndProject` over the full corpus
  *    (or, at scale, any ANN probe from the IVF/graph tier: the contract
  *    is only "a bounded candidate set with query similarities"). This is
  *    the part that touches 100 TB, and it never shuffles more than
  *    top-N per partition.
  *  - '''Stage 2 (driver):''' the greedy argmax loop over the `fetchN`
  *    collected candidates — O(k·N) dot products on a few dozen rows,
  *    the same bounded-result driver compute as collecting the ANN
  *    results themselves. Greedy MMR is inherently sequential (each pick
  *    changes every remaining score), so distributing it would mean k
  *    barrier rounds over k·N tiny tasks: strictly worse.
  *
  * Determinism/parity discipline: all similarities are fixed to integer
  * micro-units (`floor(cos·1e6 + 0.5)` as Long) BEFORE any comparison, so
  * the greedy trajectory depends only on 6-decimal-rounded values that
  * the DuckDB oracle reproduces bit-exactly; ties break by ascending id.
  * Scores: pick 1 maximizes simq; pick i>1 maximizes
  * `floor(λ·simq6 − (1−λ)·maxSim6 + 0.5)` where maxSim6 is the max
  * rounded cosine to any already-picked row.
  */
object Mmr {

  private[graft] def cosine64(a: Array[Float], b: Array[Float]): Double = {
    // mirrors VectorDistance / the oracle's three sequential list_sums:
    // per-index double products, left-to-right accumulation
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  private def r6i(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  /** Diversified top-`k` of `collection` for `queryVec`.
    * Returns (rank, id, simq, mmr): simq = rounded cosine to the query,
    * mmr = the (rounded) marginal-relevance score the row was picked at
    * (for rank 1, its simq — no redundancy penalty exists yet).
    */
  def diversify(collection: DataFrame,
                vecCol: String,
                idCol: String,
                queryVec: Array[Float],
                k: Int = 10,
                lambdaRel: Double = 0.5,
                fetchN: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(fetchN >= k, s"fetchN ($fetchN) must cover k ($k)")
    require(lambdaRel >= 0.0 && lambdaRel <= 1.0, s"lambda in [0,1], got $lambdaRel")
    val spark = collection.sparkSession

    val simq6 = floor(
      VectorFunctions.cosine(col(vecCol), VectorFunctions.vecLit(queryVec)) * 1e6 + lit(0.5)
    ).cast("long")
    // distributed candidate cut: per-partition top-N + single merge
    val cand: Array[(Long, Array[Float], Long)] = collection
      .select(col(idCol).cast("long").as("_id"),
        col(vecCol).cast(ArrayType(FloatType)).as("_vec"),
        simq6.as("_simq6"))
      .orderBy(col("_simq6").desc, col("_id"))
      .limit(fetchN)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))

    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
    // maxSim6(c) = running max rounded-cosine from candidate c to the
    // chosen set — updated incrementally, so the loop is O(k·N) cosines
    val maxSim6 = Array.fill(cand.length)(Long.MinValue)
    val picked = Array.fill(cand.length)(false)
    while (out.length < math.min(k, cand.length)) {
      var best = -1; var bestScore = Long.MinValue
      var c = 0
      while (c < cand.length) {
        if (!picked(c)) {
          val score =
            if (chosen.isEmpty) cand(c)._3
            else math.floor(lambdaRel * cand(c)._3 - (1.0 - lambdaRel) * maxSim6(c) + 0.5).toLong
          // ties break by ascending id EXPLICITLY: the candidate array
          // is (simq desc, id asc) ordered, so first-strictly-greater
          // alone would hand an exact score tie to the higher-simq
          // candidate — while the oracle's arg_min(vid, -score, vid)
          // hands it to the lowest id. Compare ids on equal scores.
          if (score > bestScore ||
              (score == bestScore && best >= 0 && cand(c)._1 < cand(best)._1)) {
            best = c; bestScore = score
          }
        }
        c += 1
      }
      picked(best) = true
      chosen += best
      out += Row(out.length + 1L, cand(best)._1, cand(best)._3 / 1e6, bestScore / 1e6)
      var j = 0
      while (j < cand.length) {
        if (!picked(j)) {
          val s = r6i(cosine64(cand(j)._2, cand(best)._2))
          if (s > maxSim6(j)) maxSim6(j) = s
        }
        j += 1
      }
    }

    val schema = StructType(Seq(
      StructField("rank", LongType, nullable = false),
      StructField(idCol, LongType, nullable = false),
      StructField("simq", DoubleType, nullable = false),
      StructField("mmr", DoubleType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(out.toSeq, 1), schema)
  }
}
