package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.text.{QualityClassifier, TextAnalysis}

/** One-off stage profile of pipeline_training_data: times each gate
  * subtree in isolation, then the composed survivors materialization,
  * to locate the gap between the composed query's cost and the sum of
  * its parts. SFD=... sbt "Test/runMain graft.TimeTD"
  */
object TimeTD {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SFD", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(name: String)(f: => Long): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val c = f
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$c")
      spark.catalog.clearCache(); System.gc()
    }

    val docs = Tables.documents(spark, d)
    time("gates(cleanCorpusDecisions)") {
      GraftQueries.cleanCorpusDecisions(docs).count()
    }
    time("substringSpans-gate") {
      Dedup.substringSpans(docs, "text", "doc_id", n = 8)
        .filter(col("dup_ratio") > 0.5).count()
    }
    time("classifier-gate") {
      QualityClassifier.score(docs, "text", "doc_id")
        .filter(col("keep")).count()
    }
    time("survivors-materialize") {
      val cleanKeep = GraftQueries.cleanCorpusDecisions(docs)
        .filter(col("keep")).select("doc_id")
      val heavyDup = Dedup.substringSpans(docs, "text", "doc_id", n = 8)
        .filter(col("dup_ratio") > 0.5).select("doc_id")
      val clsKeep = QualityClassifier.score(docs, "text", "doc_id")
        .filter(col("keep")).select("doc_id")
      Tables.spread(docs)
        .join(cleanKeep, "doc_id").join(clsKeep, "doc_id")
        .join(heavyDup, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("_ntok"))
        .localCheckpoint(true).count()
    }
    time("full-pipeline_training_data") {
      GraftQueries.all("pipeline_training_data")(spark, d).count()
    }
    spark.stop()
  }
}
