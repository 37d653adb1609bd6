package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profile of ann_graph_incremental (test-scope probe). */
object TimeGI {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SFD", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()
    import graft.operators.{Clustering, GraphAnn}
    (1 to 3).foreach { run =>
      val root = java.nio.file.Files.createTempDirectory("graft_gi_prof").toString
      val store = graft.store.VectorStore(root)
      val e = Tables.embeddings(spark, d).cache()
      def t[A](tag: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"  run$run $tag%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
        r
      }
      try {
        val cents = t("trainCentroids") { Clustering.trainCentroids(e, 8, 2) }
        val standing = e.filter(col("vec_id") =!= 0 && col("vec_id") % 10 =!= 7)
        val arrivals = e.filter(col("vec_id") =!= 0 && col("vec_id") % 10 === 7)
        val g0 = t("buildGraph") { GraphAnn.buildGraph(standing, "embedding",
          "vec_id", ncells = 8, m = 8, centroids = Some(cents))._1 }
        t("store.create") { store.create("graph", g0.toDF(), partitionBy = Seq("cell_id")) }
        t("insertIntoStored") {
          // replicate the verb's internals with timers
          val assigned = arrivals
            .withColumn("_a", Clustering.assignStruct(col("embedding"), cents))
            .select(col("vec_id").cast("long").as("id"),
              col("embedding").cast("array<float>").as("vec"),
              col("_a").getField("cid").as("cell_id"))
            .localCheckpoint(false)
          val head = t("  agg") { assigned.agg(count(lit(1)),
            countDistinct(col("id")), sort_array(collect_set(col("cell_id")))).head }
          val touched = head.getSeq[Int](2).toArray
          t("  collision") { graft.operators.AppendContract.requireNoExisting(
            store, "graph", assigned, "id", head.getLong(0), "probe") }
          val existing = store.read(spark, "graph")
            .filter(col("cell_id").isin(touched.map(Int.box).toIndexedSeq: _*))
            .select(col("id"), col("vec"), col("cell_id"))
          import spark.implicits._
          val members = existing.unionByName(assigned)
            .repartition(math.max(touched.length, 1), col("cell_id"))
            .as[(Long, Array[Float], Int)]
          val rebuilt = t("  rebuild+ckpt") { members.mapPartitions { it =>
            it.toArray.groupBy(_._3).iterator.flatMap { case (cell, rows) =>
              GraphAnn.buildCell(cell, rows.map(r => (r._1, r._2)), 8, 32)
            }
          }.localCheckpoint(true) }
          t("  write") { store.overwritePartitions("graph", rebuilt.toDF(),
            Seq("cell_id")) }
        }
        val qv = e.filter(col("vec_id") === 0).select(col("embedding"))
          .head.getSeq[Float](0).map(_.toDouble).toArray
        t("searchStored") { GraphAnn.searchStored(
          store.read(spark, "graph"), cents, qv, k = 10, nprobe = 4, ef = 48)
          .collect() }
      } finally { e.unpersist(); store.destroy() }
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
