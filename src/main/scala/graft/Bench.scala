package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen infrastructure + scan machinery, so the
    // alphabetically-first query doesn't absorb session startup
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
        .foreach(t => Tables.read(spark, sfDir, t).count())
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators that cache intermediates (dedup shingle sets) would
      // otherwise leak blocks into every later query's JVM
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      System.err.println(f"[bench] $name%-28s $dt%8.2fs")
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
