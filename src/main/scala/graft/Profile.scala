package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time the named queries (Bench's protocol — 3 runs, median)
  * without running the whole suite. `runMain graft.Profile q1 q2 ...`.
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_RUNS (default 3).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
        .foreach(t => Tables.read(spark, sfDir, t).count())
    } catch { case _: Throwable => () }
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          System.err.println(s"[profile] $name FAILED: $e"); -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        System.gc()
        dt
      }.sorted
      System.err.println(
        f"[profile] $name%-28s med ${times(runs / 2)}%8.2fs  min ${times.head}%6.2fs  max ${times.last}%6.2fs")
    }
    spark.stop()
  }
}
