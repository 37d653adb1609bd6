package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the named queries (all if
  * none named) so plan shape — pushdown, pruning, broadcast, TakeOrdered,
  * codegen spans — can be reviewed. `runMain graft.Explain [names...]`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else GraftQueries.all.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try println(GraftQueries.all(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"EXPLAIN FAILED: $e") }
    }
    spark.stop()
  }
}
