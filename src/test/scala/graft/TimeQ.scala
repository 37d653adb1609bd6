package graft
import org.apache.spark.sql.SparkSession

/** Local perf probe: times named registry queries over 3 same-JVM runs
  * (median-of-3 mirror of Bench, but for a handful of queries while
  * iterating). Same-JVM rerun GROWTH here is itself a finding — it
  * exposed the iterative-lineage leak in connectedComponents.
  *
  *   SFD=/root/testdata/sf0.1 sbt "Test/runMain graft.TimeQ <query>..."
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SFD", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.foreach { n =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val c = GraftQueries.all(n)(spark, d).count()
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$c")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
