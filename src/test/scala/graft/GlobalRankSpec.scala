package graft

import graft.operators.GlobalRank
import graft.text.TextAnalysis
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking: equality with the single-partition window
  * forms it replaces (row_number, NTILE incl. remainder and n<k cases),
  * input-partitioning invariance, and the plan pin that the shipped
  * curriculum operator contains NO partitionless window. */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)

  test("withGlobalRowNumber == partitionless row_number window, any input partitioning") {
    val base = docs.select(col("doc_id"), col("source"), length(col("text")).as("len"))
    val sortCols = Seq(col("len").desc, col("doc_id"))
    val windowed = base.withColumn("rn",
        row_number().over(Window.orderBy(sortCols: _*)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    for (reshape <- Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
        identity, _.repartition(7), _.repartition(1), _.coalesce(2))) {
      val got = GlobalRank.withGlobalRowNumber(reshape(base), sortCols, "rn")
        .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
      assert(got == windowed, "distributed rank diverged from the window form")
    }
  }

  test("ntileOfRank == SQL NTILE across remainder shapes, incl. n < k") {
    for ((n, k) <- Seq((500, 4), (503, 4), (17, 5), (3, 8), (1, 4))) {
      val rows = (1 to n).map(_.toLong).toDF("id")
      val windowed = rows.withColumn("nt",
          ntile(k).over(Window.orderBy(col("id"))).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val arith = rows.withColumn("nt",
          GlobalRank.ntileOfRank(col("id"), n.toLong, k).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(arith == windowed, s"NTILE arithmetic diverged at n=$n k=$k")
    }
  }

  test("curriculumOrder == the window form; plan has no partitionless window") {
    val q = TextAnalysis.textStats(docs).select(col("doc_id"), col("quality"))
      // drop a prime-ish prefix so n % 4 != 0 (the gate corpus is
      // divisible by 4 — the remainder path must be covered here)
      .filter(col("doc_id") >= 13)
    val shuffleKey = md5(col("doc_id").cast("string").cast("binary"))
    val windowForm = q
      .withColumn("phase",
        ntile(4).over(Window.orderBy(col("quality"), col("doc_id"))).cast("long"))
      .withColumn("emit_rank",
        row_number().over(Window.orderBy(col("phase"), shuffleKey, col("doc_id")))
          .cast("long"))
      .select("doc_id", "quality", "phase", "emit_rank")
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2), r.getLong(3))))
      .toMap
    val out = TextAnalysis.curriculumOrder(q, "quality", "doc_id", phases = 4)
      .select("doc_id", "quality", "phase", "emit_rank")
    val got = out.collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == windowForm, "curriculumOrder diverged from the window form")
    // the 100 TB pin: NO window without a partition spec anywhere in the
    // shipped operator's plan (the ranks come from range sort + offsets)
    def flat(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        flat(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        s +: flat(s.plan)
      case n => Seq(n)
    }.flatten
    val badWindows = flat(out.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(badWindows.isEmpty,
      s"curriculumOrder shipped ${badWindows.length} partitionless window(s)")
  }
}
