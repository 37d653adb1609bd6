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

  test("estimatedPartitions declines non-splittable sources and local relations") {
    // gzipped text reads one partition per file — the split-packing
    // formula would overcount and let spread() skip its widening; such
    // scans must fall back to the physical probe
    val tmp = java.nio.file.Files.createTempDirectory("graft_gztext").toString
    try {
      Tables.documents(spark, sf).select(col("doc_id").cast("string"))
        .coalesce(1).write.mode("overwrite").option("compression", "gzip").text(tmp)
      val gz = spark.read.text(tmp)
      assert(Tables.estimatedPartitions(gz).isEmpty,
        "non-parquet/orc file source must pay the physical probe")
    } finally graft.store.VectorStore(tmp).destroy()
    // LocalTableScanExec parallelizes local data, so a static estimate
    // of 1 would make spread() insert a needless shuffle+barrier
    import spark.implicits._
    val local = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    assert(Tables.estimatedPartitions(local).isEmpty,
      "local relations must pay the physical probe")
  }

  test("spread widens a narrow scan to the session parallelism") {
    val par = spark.sparkContext.defaultParallelism
    val out = Tables.spread(Tables.documents(spark, sf))
    assert(out.rdd.getNumPartitions >= par)
    assert(out.count() === Tables.documents(spark, sf).count())
  }

  test("near-dup operators leave no cached relation in the session") {
    // r6/r8/r9 bug class: an operator that caches a relation its lazy
    // result still references can never unpersist it — long-lived
    // sessions (notebooks, services, the composed pipelines that call
    // minhashLsh per execution) accumulate cache-manager entries forever.
    val emb = Tables.embeddings(spark, sf)
    val docs = Tables.documents(spark, sf).limit(200)
    val ops: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "lshNearDupJoin" -> (() => graft.operators.Similarity
        .lshNearDupJoin(emb, "embedding", "vec_id", threshold = 0.95)),
      "minhashLsh" -> (() => graft.operators.Dedup
        .minhashLsh(docs, "text", "doc_id", threshold = 0.8)),
      "ngramJaccardJoin" -> (() => graft.operators.Dedup
        .ngramJaccardJoin(docs, "text", "doc_id", threshold = 0.6)),
      "clusters" -> (() => graft.operators.Dedup
        .clusters(docs, "text", "doc_id", threshold = 0.8)))
    for ((name, op) <- ops) {
      spark.catalog.clearCache()
      op().count() // consume the result as a long-lived session would
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name must not leak a cache-manager entry past the call")
    }
  }
}
