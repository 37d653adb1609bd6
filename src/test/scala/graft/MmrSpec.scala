package graft

import graft.query.Mmr
import org.apache.spark.sql.functions._

class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0)
  private def queryVec: Array[Float] =
    Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray

  test("lambda=1.0 degenerates to plain relevance top-k") {
    val mmr = Mmr.diversify(corpus, "embedding", "vec_id", queryVec,
      k = 10, lambdaRel = 1.0, fetchN = 30).collect()
    val plain = corpus
      .withColumn("simq6",
        floor(graft.functions.VectorFunctions.cosine(col("embedding"),
          graft.functions.VectorFunctions.vecLit(queryVec)) * 1e6 + lit(0.5)).cast("long"))
      .orderBy(col("simq6").desc, col("vec_id"))
      .limit(10).select("vec_id").as[Long].collect()
    assert(mmr.map(_.getLong(1)).toSeq == plain.toSeq)
  }

  test("diversification changes the ranking vs pure relevance and is deterministic") {
    val a = Mmr.diversify(corpus, "embedding", "vec_id", queryVec, k = 10).collect()
    val b = Mmr.diversify(corpus, "embedding", "vec_id", queryVec, k = 10).collect()
    assert(a.toSeq == b.toSeq)
    val relevance = Mmr.diversify(corpus, "embedding", "vec_id", queryVec,
      k = 10, lambdaRel = 1.0).collect()
    assert(a.map(_.getLong(1)).toSeq != relevance.map(_.getLong(1)).toSeq,
      "λ=0.5 should reorder vs pure relevance on the clustered gate corpus")
    // picked marginal scores are non-increasing after the first pick:
    // each candidate's score is pointwise non-increasing as the chosen
    // set grows, and the argmax ranges over a shrinking set
    val scores = a.drop(1).map(_.getDouble(3))
    assert(scores.zip(scores.drop(1)).forall { case (x, y) => y <= x })
  }

  test("a near-duplicate of the top hit is deferred by the redundancy penalty") {
    // rank-1's near-clone (one epsilon-perturbed dim) scores ~simq on
    // relevance but its max-sim-to-chosen is ~1.0 => MMR pushes it down
    val base = corpus.limit(50).cache()
    val top = Mmr.diversify(base, "embedding", "vec_id", queryVec, k = 1).collect()(0)
    val topVec = base.filter(col("vec_id") === top.getLong(1))
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val clone = topVec.clone(); clone(0) = clone(0) + 1e-4f
    val withClone = base.union(Seq((999999L, clone.toSeq, 0))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast(base.schema("embedding").dataType), col("label")))
    val div = Mmr.diversify(withClone, "embedding", "vec_id", queryVec, k = 5).collect()
    val cloneRank = div.find(_.getLong(1) == 999999L).map(_.getLong(0))
    assert(!cloneRank.contains(2L),
      s"clone of rank-1 must not be picked second (got rank $cloneRank)")
  }

  test("k larger than the collection returns every row once") {
    val small = corpus.limit(7)
    val out = Mmr.diversify(small, "embedding", "vec_id", queryVec, k = 20, fetchN = 30).collect()
    assert(out.length == 7)
    assert(out.map(_.getLong(1)).distinct.length == 7)
    assert(out.map(_.getLong(0)).toSeq == (1L to 7L))
  }
}
