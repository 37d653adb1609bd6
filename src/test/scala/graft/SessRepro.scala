package graft

import org.apache.spark.sql.SparkSession

/** Scratch reproduction harness for the streaming_sessions bench growth
  * (VERDICT r5: 3.44s -> 9.75s across three same-JVM runs). Runs the query
  * N times and prints per-run wall time plus JVM diagnostics between runs:
  * live thread count (by suspicious name groups) and the StateStore
  * object's loaded-provider count (via reflection if not accessible).
  * Not part of the bench or gate; Test scope only.
  */
object SessRepro {
  def loadedProviderCount(): Int = {
    try {
      val cls = Class.forName(
        "org.apache.spark.sql.execution.streaming.state.StateStore$")
      val mod = cls.getField("MODULE$").get(null)
      val m = cls.getDeclaredMethods.find(_.getName == "getLoadedProviders")
      m match {
        case Some(meth) =>
          meth.setAccessible(true)
          meth.invoke(mod).asInstanceOf[Seq[_]].size
        case None =>
          val f = cls.getDeclaredFields.find(_.getName.contains("loadedProviders"))
          f.map { fld =>
            fld.setAccessible(true)
            val v = fld.get(mod)
            v.getClass.getMethod("size").invoke(v).asInstanceOf[Int]
          }.getOrElse(-1)
      }
    } catch { case _: Throwable => -1 }
  }

  def threadReport(): String = {
    import scala.jdk.CollectionConverters._
    val ts = Thread.getAllStackTraces.keySet.asScala.toSeq.map(_.getName)
    // group by name with trailing digits stripped, show the biggest groups
    val top = ts.groupBy(_.replaceAll("[-_]?\\d+$", "")).toSeq
      .map { case (k, v) => (k, v.size) }.sortBy(-_._2).take(8)
    s"threads=${ts.size} top=${top.map { case (k, n) => s"$k:$n" }.mkString(", ")}"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = args.headOption.map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    // bench order: the three other streaming queries run (3x each) before
    // streaming_sessions, piling up providers/threads without the fix
    val names = Seq("streaming_dedup", "streaming_hourly", "streaming_join",
      "streaming_sessions")
    names.foreach { name =>
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        println(f"[repro] $name%-20s run $i%2d  $dt%6.2fs  rows=$n  providers=${loadedProviderCount()}  ${threadReport()}")
      }
    }
    spark.stop()
  }
}
