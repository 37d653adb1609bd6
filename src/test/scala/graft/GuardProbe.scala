package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the graph giant-cell guard at bench scale (sf0.1) under
  * forced splits. r10 measurement (idle box): cap=MaxValue/500 do not
  * trigger (8 cells, max 261); cap=200 splits 8 -> 16 cells, max 163,
  * build+search 7.5s vs 2.7s non-triggering — the guard rounds' extra
  * assignment scans and the 16-centroid assignStruct codegen, paid
  * only on the degenerate-distribution path it exists for. Recall at
  * fixed nprobe declines as ncells grows (6/16 probed vs 6/8) — the
  * standard IVF routing tradeoff; scale nprobe with ncells.
  * `SFD`-independent: hardcodes sf0.1 like TimeTD. */
object GuardProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.embeddings(spark, "/root/testdata/sf0.1").cache()
    e.count()
    for (cap <- Seq(Int.MaxValue, 500, 200)) {
      val t0 = System.nanoTime()
      val (g, cents) = graft.operators.GraphAnn.buildGraph(
        e.filter(col("vec_id") =!= 0), "embedding", "vec_id",
        ncells = 8, m = 8, maxCellSize = cap)
      val sizes = g.toDF().groupBy("cell_id").count().collect().map(_.getLong(1))
      val qv = e.filter(col("vec_id") === 0).select(col("embedding"))
        .head.getSeq[Float](0).map(_.toDouble).toArray
      val hits = graft.operators.GraphAnn.search(g, cents, qv, 10, math.min(cents.length, 6), 48)
        .collect().map(_.getLong(0)).toSet
      val qb = broadcast(e.filter(col("vec_id") === 0).select(col("embedding").as("qv")))
      val exact = e.filter(col("vec_id") =!= 0).crossJoin(qb)
        .withColumn("dd", graft.functions.VectorFunctions.l2Sq(col("embedding"), col("qv")))
        .orderBy(col("dd"), col("vec_id")).limit(10).collect().map(_.getLong(0)).toSet
      println(f"cap=$cap%10d cells=${cents.length}%3d maxCell=${sizes.max}%5d " +
        f"build+search=${(System.nanoTime()-t0)/1e9}%5.1fs recall@10=${hits.intersect(exact).size/10.0}%.2f")
    }
    spark.stop()
  }
}
