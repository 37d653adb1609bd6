package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed GLOBAL row numbering — the scale-safe replacement for a
  * partitionless `row_number().over(Window.orderBy(...))`, which funnels
  * every row through ONE task (Spark's single-partition window warning;
  * at 100 TB it is the job). Shape: one range-repartition on the sort
  * key + an in-partition sort (a normal distributed sort — partition i's
  * keys all precede partition i+1's), then the rank of a row is its
  * partition's cumulative row offset plus its position within the
  * partition (the classic zipWithIndex construction, in DataFrame
  * terms via `monotonically_increasing_id`: within a partition the id
  * increments by 1 per row in stored order, so `id - min(id)` is the
  * 0-based local position — no dependence on the id's bit layout).
  *
  * The sorted frame is PINNED with an eager localCheckpoint before the
  * two consumptions (the per-partition count/min collect and the final
  * projection): `repartitionByRange` samples its boundaries with a seed
  * derived from the evaluation's RDD lineage, so two separate
  * evaluations of the same plan may place partition boundaries
  * differently — offsets computed on one evaluation applied to another
  * would corrupt ranks. The checkpoint is the correctness device, not a
  * cache. Cost: one materialization of the input — callers should
  * project the frame slim first (the rank is a function of the sort key
  * alone; re-join wide payloads afterwards if needed).
  *
  * The only driver-side state is one row per partition (count + min id)
  * — bounded by the partition count, never the data. */
object GlobalRank {

  /** `df` plus a 1-based BIGINT global row number `out` over the total
    * order `sortCols` (make it total — include a unique tiebreak column
    * — or equal-key rows get arbitrary but deterministic-per-run
    * neighboring ranks). `numPartitions` defaults to the session's
    * parallelism. */
  def withGlobalRowNumber(df: DataFrame, sortCols: Seq[Column], out: String,
                          numPartitions: Int = 0): DataFrame =
    withGlobalRowNumberAndCount(df, sortCols, out, numPartitions)._1

  /** [[withGlobalRowNumber]] plus the total row count — free from the
    * same per-partition collect, saving callers that need both (NTILE
    * arithmetic) a separate counting job over the input. */
  def withGlobalRowNumberAndCount(df: DataFrame, sortCols: Seq[Column],
                                  out: String,
                                  numPartitions: Int = 0): (DataFrame, Long) = {
    require(!df.columns.exists(_.startsWith("_gr_")),
      "GlobalRank reserves the _gr_ column prefix — rename the input's " +
        df.columns.filter(_.startsWith("_gr_")).mkString(", "))
    val sp = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else math.max(sp.sparkContext.defaultParallelism, 1)
    val pinned = df
      .repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint(true)
    val marked = pinned
      .withColumn("_gr_pid", spark_partition_id())
      .withColumn("_gr_mid", monotonically_increasing_id())
    // bounded collect: one row per partition
    val parts = marked.groupBy(col("_gr_pid"))
      .agg(count(lit(1)).as("_gr_n"), min(col("_gr_mid")).as("_gr_min"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var acc = 0L
    val offsets = parts.map { case (pid, n, mn) =>
      val o = (pid, acc, mn); acc += n; o
    }
    val offDf = sp.createDataFrame(
      java.util.Arrays.asList(offsets.map(o =>
        org.apache.spark.sql.Row(o._1, o._2, o._3)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_gr_pid",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("_gr_off",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_gr_min",
          org.apache.spark.sql.types.LongType))))
    val ranked = marked.join(broadcast(offDf), Seq("_gr_pid"))
      .withColumn(out,
        col("_gr_off") + (col("_gr_mid") - col("_gr_min")) + lit(1L))
      .drop("_gr_pid", "_gr_mid", "_gr_off", "_gr_min")
    (ranked, acc)
  }

  /** Standard-SQL NTILE(k) from a precomputed global row number: with n
    * rows, the first `n % k` buckets take `n/k + 1` rows, the rest
    * `n/k` — pure integer arithmetic on the rank, so the quartile split
    * needs no second window. */
  def ntileOfRank(rank: Column, n: Long, k: Int): Column = {
    val q = lit(n / k)
    val rem = lit(n % k)
    val big = rem * (q + lit(1L)) // rows covered by the (q+1)-sized buckets
    when(rank <= big, (rank - 1) / (q + lit(1L)) + lit(1L))
      .otherwise(rem + (rank - big - lit(1L)) / q + lit(1L))
  }
}
