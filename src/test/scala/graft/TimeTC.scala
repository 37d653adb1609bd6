package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profile of Clustering.trainCentroids (test-scope probe). */
object TimeTC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SFD", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()
    import graft.operators.Clustering
    (1 to 3).foreach { run =>
      val e = Tables.embeddings(spark, d).cache()
      e.count()
      def t[A](tag: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"  run$run $tag%-16s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
        r
      }
      val c0 = t("init") { Clustering.initCentroids(e, 8, "vec_id", "embedding") }
      val c1 = t("lloyd1") { Clustering.lloydStep(e, c0, "vec_id", "embedding") }
      val c2 = t("lloyd2") { Clustering.lloydStep(e, c1, "vec_id", "embedding") }
      println(s"  run$run checksum ${c2.map(_.sum).sum}")
      e.unpersist()
    }
    spark.stop()
  }
}
