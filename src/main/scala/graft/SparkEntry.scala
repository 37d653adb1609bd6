package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real surface lives in [[GraftQueries]] (Spark) / [[GraftOracles]]
  * (DuckDB twins).
  */
object SparkEntry {
  /** Flagship: the full ingest pipeline (chunk -> metadata -> ids ->
    * embed) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    GraftQueries.ingestPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * LLM-pipeline extension surface). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = GraftQueries.all

  /** DuckDB oracle SQL per query; keys absent -> rows-only check. */
  def oracleSql: Map[String, String] = GraftOracles.all
}
