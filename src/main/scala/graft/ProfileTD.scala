package graft

import graft.text.{QualityClassifier, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: phase-level timing of the composed `pipeline_training_data`
  * chain (construction-time jobs vs the gates job vs sampling/packing) —
  * the query is the bench's heaviest and its cost is NOT the sum of its
  * component queries, so this breaks the composition down in place.
  * `runMain graft.ProfileTD`; same env knobs as Profile.
  */
object ProfileTD {
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
      println(f"[td]   $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val s = spark
    for (i <- 1 to 3) {
      println(s"[td] run $i")
      val total0 = System.nanoTime()
      val docs = Tables.spread(Tables.documents(s, sfDir))
      val cleanKeep = t("cleanDecisions-construct") {
        GraftQueries.cleanCorpusDecisions(docs).filter(col("keep")).select("doc_id")
      }
      val heavyDup = t("substring-construct") {
        graft.operators.Dedup.substringSpans(docs, "text", "doc_id", n = 8)
          .filter(col("dup_ratio") > 0.5).select("doc_id")
      }
      val survivors = t("gates-job(checkpoint)") {
        // mirrors the r10 fused query shape: the classifier gate is a
        // map-side column on the count projection (keepCol), not a
        // relation + join
        val counts = docs.select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("_ntok"),
          QualityClassifier.keepCol(col("text")).as("_cls_keep"))
        val keepIds = cleanKeep.join(heavyDup, Seq("doc_id"), "left_anti")
        counts.filter(col("_cls_keep")).drop("_cls_keep")
          .join(keepIds, "doc_id").localCheckpoint(true)
      }
      val sampled = t("mixSample") {
        GraftQueries.mixSampleFromCounts(s, survivors)
      }
      t("pack+agg") {
        TextAnalysis.packAssign(sampled, "doc_id", "source", "_ntok", budgetTokens = 512)
          .withColumnRenamed("seq_id", "_seq")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("_ntok")).as("n_tokens"),
            countDistinct(col("_seq")).as("n_sequences"))
          .count()
      }
      println(f"[td]   TOTAL                    ${(System.nanoTime() - total0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
