package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the harness test tables (TESTDATA.md).
  *
  * Every query takes `(spark, sfDir)` and reads parquet directly so
  * Catalyst sees the scan and can push filters/prune columns into it.
  *
  * `events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark's parquet
  * reader rejects; we read it via `legacy.parquet.nanosAsLong` and floor to
  * microseconds with integer arithmetic (ns epoch values exceed 2^53, so
  * double division would corrupt them).
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = read(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = read(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = read(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = read(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
