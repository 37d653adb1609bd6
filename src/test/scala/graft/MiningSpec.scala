package graft

import graft.operators.Mining
import org.apache.spark.sql.functions._

/** Triplet-tier mining ([[graft.operators.Mining.hardNegatives]]) — the
  * label-aware contrastive data-prep verb. Handcrafted 2-D geometry so
  * every tier boundary is exact: anchor at (1,0), its positive at a
  * known cosine, negatives placed above / inside / below the semi-hard
  * band. */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  // unit-ish vectors at controlled cosines to the anchor (1, 0):
  // cos = x / |v| for v = (x, y) with |v| = 1 here by construction
  private def vec(cos: Double): Array[Float] = {
    val s = math.sqrt(math.max(0.0, 1.0 - cos * cos))
    Array(cos.toFloat, s.toFloat)
  }

  private val corpus = Seq(
    (1L, vec(1.00), 0), // the anchor itself (same id — must never pair)
    (2L, vec(0.80), 0), // the positive: pos_cos_mu = 800000
    (3L, vec(0.90), 1), // hard: outranks the positive
    (4L, vec(0.80), 1), // hard: ties the positive (>= rule)
    (5L, vec(0.78), 1), // semi-hard: within the 0.05 margin
    (6L, vec(0.60), 1), // easy
    (7L, vec(0.10), 2)  // easy, rank 5
  ).toDF("vec_id", "embedding", "label")

  private def mine(k: Int) = Mining.hardNegatives(
    corpus, "embedding", "vec_id", "label",
    corpus.filter(col("vec_id") === 1)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_vec"),
        col("label").as("a_label")),
    "a_id", "a_vec", "a_label", k = k, marginMu = 50000L)

  test("tier boundaries are exact: hard >= positive, semi-hard within margin") {
    val rows = mine(10).orderBy("rank").collect()
      .map(r => (r.getAs[Long]("neg_id"), r.getAs[Int]("rank"),
        r.getAs[String]("tier")))
    assert(rows.toSeq == Seq(
      (3L, 1, "hard"),      // 0.90 > 0.80
      (4L, 2, "hard"),      // 0.80 >= 0.80 — the tie is HARD, not semi
      (5L, 3, "semi_hard"), // 780000 + 50000 >= 800000
      (6L, 4, "easy"),      // 600000 + 50000 <  800000
      (7L, 5, "easy")))
    // the anchor itself and its same-class positive never appear
    assert(!rows.map(_._1).toSet.intersect(Set(1L, 2L)).nonEmpty)
  }

  test("k bounds the per-anchor output; pos_cos_mu is the nearest positive") {
    val rows = mine(2).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Long]("pos_cos_mu") == 800000L))
  }

  test("anchors without a positive are dropped, not misclassified") {
    // anchor from label 2: no OTHER label-2 row exists
    val out = Mining.hardNegatives(
      corpus, "embedding", "vec_id", "label",
      corpus.filter(col("vec_id") === 7)
        .select(col("vec_id").as("a_id"), col("embedding").as("a_vec"),
          col("label").as("a_label")),
      "a_id", "a_vec", "a_label", k = 5)
    assert(out.count() == 0L)
  }

  test("sf0.001 panel: every pair's tier replays from its own columns") {
    val e = Tables.embeddings(spark, sf)
    val anchors = e.filter(col("vec_id") < 6)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_vec"),
        col("label").as("a_label"))
    val rows = Mining.hardNegatives(e, "embedding", "vec_id", "label",
      anchors, "a_id", "a_vec", "a_label", k = 10, marginMu = 50000L)
      .collect()
    assert(rows.length == 60, "6 anchors x k=10")
    rows.foreach { r =>
      val (c, p, t) = (r.getAs[Long]("cos_mu"), r.getAs[Long]("pos_cos_mu"),
        r.getAs[String]("tier"))
      val expect = if (c >= p) "hard"
        else if (c + 50000L >= p) "semi_hard" else "easy"
      assert(t == expect, s"tier drifted from its own integer rule: $r")
    }
  }
}
