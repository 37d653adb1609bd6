package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: phase-level timing of `dedup_clusters` (the bench's top
  * query after the r10 training-data fusion) — pair finding (minhash +
  * band join + exact verify) vs connected components vs the final
  * window labeling. `runMain graft.ProfileCC`; same env knobs as
  * Profile.
  */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      Tables.read(spark, sfDir, "documents").count()
    } catch { case _: Throwable => () }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc]   $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val s = spark
    for (i <- 1 to 3) {
      println(s"[cc] run $i")
      val total0 = System.nanoTime()
      val docs = Tables.documents(s, sfDir)
      // fine-grained mirror of minhashLsh's internals (same helpers)
      val withSh = t("  shingles+ckpt") {
        operators.Dedup.shingleRelation(docs, "text", "doc_id", 5).localCheckpoint(true)
      }
      val candidates = t("  band-join+dedup") {
        val banded = operators.Dedup.bandedOf(withSh, 128, 32)
        val c = banded.as("a")
          .join(banded.as("b"),
            col("a._band") === col("b._band") &&
              col("a._bandhash") === col("b._bandhash") &&
              col("a._id") < col("b._id") &&
              operators.Dedup.lengthFilter(col("a._n"), col("b._n"), 0.8))
          .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
          .dropDuplicates("id_a", "id_b").localCheckpoint(true)
        println(s"[cc]     (candidates: ${c.count()})")
        c
      }
      val pairs = t("  verify+ckpt") {
        val estBytes = operators.Dedup.shingleBytes(withSh)
        val p = candidates
          .join(operators.Dedup.verifySide(withSh, "id_a", "sh_a", estBytes), "id_a")
          .join(operators.Dedup.verifySide(withSh, "id_b", "sh_b", estBytes), "id_b")
        operators.Dedup.verifyJaccard(p, 0.8)
          .select("id_a", "id_b").localCheckpoint(true)
      }
      val comp = t("connectedComponents") {
        val c = operators.Dedup.connectedComponents(pairs, "id_a", "id_b")
        c.count(); c
      }
      t("label-window+collect") {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
        docs.select(col("doc_id"))
          .join(comp.select(col("id").as("doc_id"), col("label")), Seq("doc_id"), "left")
          .withColumn("cluster_id", coalesce(col("label"), col("doc_id")))
          .drop("label")
          .withColumn("cluster_size", count(lit(1)).over(w))
          .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
          .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
          .orderBy("doc_id").count()
      }
      println(f"[cc]   TOTAL                    ${(System.nanoTime() - total0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
