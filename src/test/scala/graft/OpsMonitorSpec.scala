package graft

import graft.operators.{Audit, Similarity}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The ops-monitoring pair: stored-IVF cell stats (router-drift / hot-cell
  * watch) and embedding-space drift. Pins: the stats scan never reads the
  * vector column; counts reconcile with the corpus; drift is zero on
  * identical slices, localizes a planted per-dim shift, and is
  * merge-order-invariant (fixed-point sums).
  */
class OpsMonitorSpec extends SparkSpec {
  import spark.implicits._

  test("ivfIndexStats: counts reconcile, fractions sum to ~1, scan is vector-free") {
    val root = java.nio.file.Files.createTempDirectory("graft_statspec").toString
    val store = graft.store.VectorStore(root)
    try {
      val e = Tables.embeddings(spark, sf)
      Similarity.buildIvfIndex(store, "v", e, "embedding", "vec_id", ncells = 8)
      val stats = Similarity.ivfIndexStats(store.read(spark, "v"), "vec_id")
      // recurse through AdaptiveSparkPlanExec to reach the real scan
      def findScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
        p match {
          case f: FileSourceScanExec => Seq(f)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            findScans(a.executedPlan)
          case other => other.children.flatMap(findScans)
        }
      val scans = findScans(stats.queryExecution.executedPlan)
      assert(scans.nonEmpty)
      assert(!scans.exists(_.requiredSchema.fieldNames.contains("embedding")),
        s"stats scan reads the vector column: ${scans.map(_.requiredSchema.fieldNames.mkString(","))}")
      val rows = stats.collect()
      assert(rows.map(_.getLong(1)).sum == e.count())
      val fracSum = rows.map(_.getDouble(4)).sum
      assert(math.abs(fracSum - 1.0) < 1e-4, s"n_frac sums to $fracSum")
      assert(rows.forall(r => r.getLong(2) <= r.getLong(3)), "min_id > max_id")
    } finally store.destroy()
  }

  test("embeddingDrift: zero on identical slices") {
    val e = Tables.embeddings(spark, sf).limit(100)
    val out = Audit.embeddingDrift(e, e).collect()
    assert(out.length == 64)
    assert(out.forall(_.getDouble(3) == 0.0))
    assert(out.forall(r => r.getDouble(1) == r.getDouble(2)))
  }

  test("embeddingDrift localizes a planted per-dim shift") {
    val e = Tables.embeddings(spark, sf).limit(200).cache()
    try {
      val shifted = e.withColumn("embedding",
        transform(col("embedding"),
          (x, i) => when(i === 7, x + lit(0.5f)).otherwise(x)))
      val out = Audit.embeddingDrift(e, shifted, "embedding").collect()
      val hit = out.find(_.getLong(0) == 7L).get
      assert(math.abs(hit.getDouble(3) - 0.5) < 1e-3,
        s"planted shift not recovered: ${hit.getDouble(3)}")
      assert(out.filter(_.getLong(0) != 7L).forall(_.getDouble(3) < 1e-3),
        "shift leaked into unplanted dims")
    } finally e.unpersist()
  }

  test("streamed drift == batch drift, row for row (associative state)") {
    val e = Tables.embeddings(spark, sf)
    val batch = graft.operators.Audit.embeddingDrift(
      e.filter(col("vec_id") % 10 =!= 7),
      e.filter(col("vec_id") % 10 === 7)).collect()
    val streamed = graft.streaming.DocStream.runStreamingDrift(spark,
      s"$sf/embeddings.parquet",
      "sdr_spec_" + java.util.UUID.randomUUID().toString.replace("-", ""))
      .orderBy("pos").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("embeddingDrift is partitioning-invariant (fixed-point merge order)") {
    val e = Tables.embeddings(spark, sf)
    val ref = e.filter(col("vec_id") % 2 === 0)
    val cur = e.filter(col("vec_id") % 2 === 1)
    val a = Audit.embeddingDrift(ref, cur).collect()
    val b = Audit.embeddingDrift(ref.repartition(7), cur.repartition(13)).collect()
    assert(a.toSeq == b.toSeq)
  }
}
