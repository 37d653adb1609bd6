package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right row
  * with right.ts <= left.ts, per key.
  *
  * Implemented with the union+window technique instead of a range join:
  * tag both sides, union, sort within key by (ts, side), and carry the last
  * seen right row forward with `last(_, ignoreNulls=true)`. One shuffle on
  * the key, no quadratic candidate explosion — the shape that survives
  * 100 TB where a `BETWEEN` range join would not. (DuckDB's ASOF JOIN is
  * the oracle twin.)
  */
object AsOf {

  /** leftDf asof-join rightDf on keyCols, time column `tsCol` (backward
    * semantics, inclusive). Right columns are prefixed `matched_`.
    * `toleranceSeconds`: when set, a match older than the tolerance is
    * discarded (matched_* become null) — the bounded-staleness as-of.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   tsCol: String, rightValueCols: Seq[String],
                   toleranceSeconds: Option[Double] = None): DataFrame = {
    val leftCols = left.columns
    // side 0 = right (so at equal ts the right row sorts first and IS
    // visible to a left row with the same ts — inclusive semantics)
    val carried = rightValueCols :+ "__rts"
    val rTagged = right.withColumn("__rts", col(tsCol)).select(
      keyCols.map(col) ++ Seq(col(tsCol).as("_ts"), lit(0).as("_side")) ++
        carried.map(c => col(c).as(s"matched_$c")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(col(tsCol).as("_ts"), lit(1).as("_side")) ++
        rightValueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"matched_$c")) ++
        Seq(lit(null).cast(right.schema(tsCol).dataType).as("matched___rts")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol).map(col): _*)
    val unioned = rTagged.unionByName(lTagged)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = carried.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"matched_$c", last(col(s"matched_$c"), ignoreNulls = true).over(w))
    }
    val bounded = toleranceSeconds match {
      case None => filled
      case Some(tol) =>
        val stale = col("matched___rts").isNull ||
          col("_ts").cast("double") - col("matched___rts").cast("double") > tol
        rightValueCols.foldLeft(filled) { (df, c) =>
          df.withColumn(s"matched_$c", when(stale, lit(null)).otherwise(col(s"matched_$c")))
        }
    }
    bounded.filter(col("_side") === 1)
      .drop("_side", "matched___rts")
      .withColumnRenamed("_ts", tsCol)
  }
}
