package graft

import org.apache.spark.sql.functions._

/** `Tables.spread`'s cheap partition probe must agree with the physical
  * plan it replaces, and library operators must not leak cached
  * relations into the session (the r6/r7 bug class).
  */
class TablesSpec extends SparkSpec {

  test("estimatedPartitions matches the physical probe on narrow plans") {
    val docs = Tables.documents(spark, sf)
    val cases = Seq(
      "scan" -> docs,
      "project" -> docs.select(col("doc_id"), length(col("text")).as("n")),
      "filter" -> docs.filter(col("lang") === "en").select("doc_id", "text"),
      "generate" -> docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok")))
    for ((name, df) <- cases) {
      val est = Tables.estimatedPartitions(df)
      assert(est.isDefined, s"$name: narrow plan should be estimable")
      assert(est.get === df.rdd.getNumPartitions,
        s"$name: estimate must equal the physical partition count")
    }
    // a previous spread's barrier is estimable without re-planning
    val spreadDf = Tables.spread(docs)
    val est = Tables.estimatedPartitions(spreadDf.select("doc_id"))
    assert(est.contains(spreadDf.rdd.getNumPartitions))
    // non-narrow plans decline (fall back to the physical probe)
    assert(Tables.estimatedPartitions(
      docs.groupBy("lang").agg(count(lit(1)))).isEmpty)
  }

  test("spread widens a narrow scan to the session parallelism") {
    val par = spark.sparkContext.defaultParallelism
    val out = Tables.spread(Tables.documents(spark, sf))
    assert(out.rdd.getNumPartitions >= par)
    assert(out.count() === Tables.documents(spark, sf).count())
  }

  test("lshNearDupJoin leaves no cached relation in the session") {
    spark.catalog.clearCache()
    val emb = Tables.embeddings(spark, sf)
    val out = graft.operators.Similarity
      .lshNearDupJoin(emb, "embedding", "vec_id", threshold = 0.95)
    out.count() // consume the result as a long-lived session would
    assert(spark.sharedState.cacheManager.isEmpty,
      "operator must not leak a cache-manager entry past the call")
  }
}
