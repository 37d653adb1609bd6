package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval containment join, bucketized so it scales.
  *
  * A naive `p.key = i.key AND p.ts BETWEEN i.start AND i.end` plans as a
  * join on the equi-key with a range residual — fine per key, but a hot
  * key degenerates to its full |points| x |intervals| product. Bucketizing
  * time into fixed-width buckets and exploding each interval over the
  * buckets it covers turns the range condition into an equi-join on
  * (key, bucket) with an exact residual filter; a point lives in exactly
  * one bucket, so no post-join dedup is needed. Bucket width trades
  * replication (long intervals explode into more buckets) against
  * per-bucket fan-in; pick it near the median interval length.
  */
object IntervalJoin {

  /** Join `points` (with `tsCol`) into `intervals` ([startCol, endCol],
    * inclusive) sharing `keys`. Returns matched rows: all interval columns
    * + the point columns prefixed `p_`.
    */
  def containmentJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      tsCol: String, startCol: String, endCol: String,
                      bucketSeconds: Long = 3600L): DataFrame = {
    val pBucket = floor(col(tsCol).cast("double") / bucketSeconds).cast("long")
    val iFrom = floor(col(startCol).cast("double") / bucketSeconds).cast("long")
    val iTo = floor(col(endCol).cast("double") / bucketSeconds).cast("long")
    val pointCols = points.columns.filterNot(keys.contains)
    val p = points.select(
      keys.map(col) ++ Seq(pBucket.as("_bucket")) ++
        pointCols.map(c => col(c).as(s"p_$c")): _*)
    val i = intervals
      .withColumn("_bucket", explode(sequence(iFrom, iTo)))
    i.join(p, keys :+ "_bucket")
      .filter(col(s"p_$tsCol") >= col(startCol) && col(s"p_$tsCol") <= col(endCol))
      .drop("_bucket")
  }
}
