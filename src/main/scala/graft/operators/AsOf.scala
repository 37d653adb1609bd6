package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (point-in-time) join: for each left row, the most recent right row
  * with right.ts <= left.ts, per key.
  *
  * Implemented with the union+window technique instead of a range join:
  * tag both sides, union, sort within key by (ts, side, tiebreak), and
  * carry the last seen right row forward with `last(_, ignoreNulls=true)`.
  * One shuffle on the key, no quadratic candidate explosion — the shape
  * that survives 100 TB where a `BETWEEN` range join would not. (DuckDB's
  * ASOF JOIN is the oracle twin.)
  *
  * Determinism: all matched right columns travel in ONE struct, so they
  * always come from the SAME right row (no per-column tearing), and
  * `rightTieCols` totally orders right rows that share (key, ts) — the
  * LAST row in that order wins (e.g. tiebreak on event_id ⇒ the max
  * event_id at equal timestamps). Without a tiebreak, which equal-ts right
  * row wins is partitioning-dependent (DuckDB's ASOF is equally
  * arbitrary), so oracle-compared queries must pass one and mirror it in
  * the oracle with a dedup of equal-ts right rows.
  */
object AsOf {

  /** leftDf asof-join rightDf on keyCols, time column `tsCol` (backward
    * semantics, inclusive). Right columns are prefixed `matched_`.
    * `toleranceSeconds`: when set, a match older than the tolerance is
    * discarded (matched_* become null) — the bounded-staleness as-of.
    * `rightTieCols`: deterministic tiebreak among right rows sharing
    * (key, ts); the row with the greatest tie value wins.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   tsCol: String, rightValueCols: Seq[String],
                   toleranceSeconds: Option[Double] = None,
                   rightTieCols: Seq[String] = Seq.empty): DataFrame =
    asofImpl(left, right, keyCols, tsCol, rightValueCols, toleranceSeconds,
      rightTieCols, forward = false)

  /** Forward as-of: for each left row, the EARLIEST right row with
    * right.ts >= left.ts per key (inclusive) — the mirror of
    * [[asofBackward]], same single-shuffle union+window shape, walked in
    * descending time order. */
  def asofForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  tsCol: String, rightValueCols: Seq[String],
                  toleranceSeconds: Option[Double] = None,
                  rightTieCols: Seq[String] = Seq.empty): DataFrame =
    asofImpl(left, right, keyCols, tsCol, rightValueCols, toleranceSeconds,
      rightTieCols, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                       tsCol: String, rightValueCols: Seq[String],
                       toleranceSeconds: Option[Double],
                       rightTieCols: Seq[String],
                       forward: Boolean): DataFrame = {
    val leftCols = left.columns
    val passThrough = leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
    val matchedType = StructType(
      rightValueCols.map(c => StructField(c, right.schema(c).dataType)) :+
        StructField("__rts", right.schema(tsCol).dataType))
    // side 0 = right (so at equal ts the right row sorts first and IS
    // visible to a left row with the same ts — inclusive semantics)
    val rTagged = right.select(
      keyCols.map(col) ++ Seq(col(tsCol).as("_ts"), lit(0).as("_side")) ++
        rightTieCols.zipWithIndex.map { case (c, i) => col(c).as(s"_tie$i") } ++
        Seq(struct(rightValueCols.map(col) :+ col(tsCol).as("__rts"): _*).as("_m")) ++
        passThrough.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(col(tsCol).as("_ts"), lit(1).as("_side")) ++
        rightTieCols.zipWithIndex.map { case (c, i) =>
          lit(null).cast(right.schema(c).dataType).as(s"_tie$i") } ++
        Seq(lit(null).cast(matchedType).as("_m")) ++
        passThrough.map(col): _*)
    val unioned = rTagged.unionByName(lTagged)
    // forward walks time DESC so "last right row seen" = earliest ts >=
    // left ts; right rows (side 0) still sort before left at equal ts, so
    // inclusivity is preserved in both directions
    val tsOrd = if (forward) col("_ts").desc else col("_ts").asc
    val ordering = Seq(tsOrd, col("_side")) ++
      rightTieCols.indices.map(i => col(s"_tie$i"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("_m", last(col("_m"), ignoreNulls = true).over(w))
    val matched = toleranceSeconds match {
      case None => col("_m")
      case Some(tol) =>
        val gap =
          if (forward) col("_m.__rts").cast("double") - col("_ts").cast("double")
          else col("_ts").cast("double") - col("_m.__rts").cast("double")
        val stale = col("_m").isNull || gap > tol
        when(stale, lit(null).cast(matchedType)).otherwise(col("_m"))
    }
    filled.filter(col("_side") === 1)
      .select(
        keyCols.map(col) ++ Seq(col("_ts").as(tsCol)) ++
          rightValueCols.map(c => matched.getField(c).as(s"matched_$c")) ++
          passThrough.map(col): _*)
  }
}
