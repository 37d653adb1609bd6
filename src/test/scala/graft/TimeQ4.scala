package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TimeQ4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id)").collect()
    // pairs once, to local, fresh trivial-lineage DF
    val t0 = System.nanoTime()
    val pairsLocal = graft.operators.Dedup.minhashLsh(Tables.documents(spark, d), "text", "doc_id", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    println(f"pairs: ${(System.nanoTime()-t0)/1e9}%.2fs n=${pairsLocal.size}")
    (1 to 3).foreach { i =>
      val p = pairsLocal.toDF("id_a", "id_b")
      val t1 = System.nanoTime()
      val n = graft.operators.Dedup.connectedComponents(p, "id_a", "id_b").count()
      println(f"cc run$i: ${(System.nanoTime()-t1)/1e9}%.2fs rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
