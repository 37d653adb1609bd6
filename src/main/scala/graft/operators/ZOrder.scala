package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional clustering for data skipping —
  * the lakehouse `OPTIMIZE ZORDER BY` shape, as plain Spark expressions.
  *
  * Why it matters at 100 TB: parquet row-group/file min-max stats prune
  * scans only along the sort order. Sorting by `ts` makes `user_id`
  * predicates scan everything; interleaving the bits of BOTH columns into
  * one key and range-partitioning on it gives every output file a tight
  * bounding box in BOTH dimensions, so either predicate (or both) skips
  * most files. The whole computation is codegen'd column arithmetic —
  * one stats aggregate, one range shuffle, no UDFs.
  *
  * Normalization: each column is min-max scaled to `bits`-bit integers
  * with DOUBLE arithmetic (one driver-side stats row), then bit-interleaved
  * (c1 on odd positions, c2 on even). Ties/degenerate ranges collapse to 0.
  */
object ZOrder {

  /** The interleaved Morton key for two already-normalized integer
    * columns in [0, 2^bits). */
  private[operators] def morton(n1: Column, n2: Column, bits: Int): Column =
    (0 until bits).map { i =>
      val b1 = shiftright(n1, i).bitwiseAND(lit(1L))
      val b2 = shiftright(n2, i).bitwiseAND(lit(1L))
      shiftleft(b1, 2 * i + 1).bitwiseOR(shiftleft(b2, 2 * i))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Add a `_zorder` column interleaving `c1` and `c2` (numeric or
    * timestamp — cast to double internally). One stats aggregate runs
    * eagerly to learn the min/max scaling. */
  def withZorderKey(df: DataFrame, c1: String, c2: String,
                    bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 31)
    val d1 = col(c1).cast("double")
    val d2 = col(c2).cast("double")
    val r = df.agg(min(d1), max(d1), min(d2), max(d2)).collect()(0)
    // empty frame / all-null column -> null stats; degenerate dimensions
    // collapse to 0 (clustering becomes a no-op instead of an NPE)
    def stat(i: Int): Double = if (r.isNullAt(i)) 0.0 else r.getDouble(i)
    val (lo1, hi1, lo2, hi2) = (stat(0), stat(1), stat(2), stat(3))
    val scale = (1L << bits) - 1
    def norm(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(greatest(coalesce((c - lo) / (hi - lo) * scale, lit(0.0)), lit(0.0)),
        lit(scale.toDouble)).cast("long")
    df.withColumn("_zorder", morton(norm(d1, lo1, hi1), norm(d2, lo2, hi2), bits))
  }

  /** Cluster the frame into `numFiles` z-ordered ranges: range-partition
    * on the Morton key and sort within partitions, so a parquet write
    * yields one tight two-dimensional bounding box per file. */
  def cluster(df: DataFrame, c1: String, c2: String, numFiles: Int,
              bits: Int = 16): DataFrame =
    withZorderKey(df, c1, c2, bits)
      .repartitionByRange(numFiles, col("_zorder"))
      .sortWithinPartitions("_zorder")
}
