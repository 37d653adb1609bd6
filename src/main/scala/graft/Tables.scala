package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation

/** Readers for the harness test tables (TESTDATA.md).
  *
  * Every query takes `(spark, sfDir)` and reads parquet directly so
  * Catalyst sees the scan and can push filters/prune columns into it.
  *
  * `events.parquet` has shipped as both INT64 TIMESTAMP(NANOS) — which
  * Spark's parquet reader rejects; read via `legacy.parquet.nanosAsLong`
  * and floored to micros with integer arithmetic (ns epoch values exceed
  * 2^53, so double division would corrupt them) — and as timestamp[us]
  * WITHOUT isAdjustedToUTC, which Spark reads as TIMESTAMP_NTZ. The NTZ
  * form answers batch queries fine but is rejected by event-time
  * watermarks, so normalize it to TIMESTAMP (LTZ): every entry point
  * runs the session in UTC, making the cast value-preserving and the
  * DuckDB oracle (naive timestamps) unaffected.
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
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** Ensure at least `defaultParallelism` partitions before EXPENSIVE
    * per-row compute (tokenize / n-gram hash / classifier fold).
    *
    * A single-row-group parquet file scans as ONE partition no matter
    * what `maxPartitionBytes` says (parquet splits at row-group
    * boundaries), so without this an operator's whole tokenize/hash map
    * stage runs serially on one core — both a ~P× slowdown and the
    * one-straggler-task shape whose wall time swings multi-× whenever
    * the host deschedules that single thread. A real 100 TB scan has
    * thousands of splits, so the partition-count guard makes this a
    * no-op at scale; the shuffle is only paid when the scan is narrower
    * than the cluster, where it is the cheapest possible fix (it moves
    * raw rows once, before any per-row work).
    */
  def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // micro-batches are already narrow slices
    val par = df.sparkSession.sparkContext.defaultParallelism
    val n = estimatedPartitions(df).getOrElse {
      // non-narrow plan (join/agg/window below): pay the physical probe
      df.rdd.getNumPartitions
    }
    if (n < par) {
      // The LogicalRDD leaf makes this a plan BARRIER, not just a
      // repartition: callers filter on expensive derived columns
      // (classifier keep, span dup_ratio, token counts), and Catalyst
      // alias-inlines such predicates and pushes them below a plain
      // round-robin exchange — re-running the whole per-row compute
      // serially inside the narrow scan stage, which is exactly what
      // spread exists to prevent. Blocking pushdown/pruning here is safe
      // precisely because this branch only fires when the input is
      // narrower than the cluster (a scan this small has nothing to
      // gain from pushdown); at scale the `else` branch returns the
      // plan untouched and parquet pushdown behaves as usual.
      // barrier ABOVE the exchange (repartition first, then wrap): the
      // row conversion the LogicalRDD costs then runs in the POST-shuffle
      // tasks (P-way parallel), and the serial narrow stage stays a pure
      // columnar scan + shuffle write.
      val wide = df.repartition(par)
      df.sparkSession.createDataFrame(wide.rdd, df.schema)
    } else df
  }

  /** Partition-count estimate WITHOUT compiling the physical plan.
    *
    * `df.rdd` re-plans the whole query per call, and spread has many
    * call sites — r7's bench showed that fixed cost dominating several
    * small-query medians. For the common spread input — narrow ops
    * (project/filter/generate) over a parquet scan or over a previous
    * spread's LogicalRDD barrier — the partition count is determined by
    * the leaf alone, and the file-scan case is REPLICATED from Spark's
    * own `FilePartition.maxSplitBytes` + greedy packing (same formula,
    * same conf knobs), so the decision matches what the physical probe
    * would say. Anything with a shuffle in it returns None and pays the
    * physical probe as before.
    */
  private[graft] def estimatedPartitions(df: DataFrame): Option[Int] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    def walk(p: LogicalPlan): Option[Int] = p match {
      case lr: LogicalRDD => Some(lr.rdd.getNumPartitions)
      case lr: LogicalRelation => lr.relation match {
        // the split-packing formula below is only valid for SPLITTABLE
        // formats; a gzipped-text or multiLine json/csv relation reads
        // one partition per file, so estimating it would let spread()
        // silently skip the widening it exists for — those (rare at
        // spread call sites) pay the physical probe
        case fs: HadoopFsRelation
            if fs.fileFormat.getClass.getSimpleName.matches("(Parquet|Orc)FileFormat") =>
          Some(fileScanPartitions(df.sparkSession, fs))
        case _ => None
      }
      // LocalRelation: LocalTableScanExec parallelizes to
      // min(rows, leafNodeDefaultParallelism) — version-sensitive enough
      // that replicating it is riskier than the (cheap, local-data)
      // physical probe
      case _: LocalRelation => None
      case u @ (_: Project | _: Filter | _: Generate | _: SubqueryAlias) =>
        walk(u.asInstanceOf[UnaryNode].child)
      case _ => None
    }
    walk(df.queryExecution.analyzed)
  }

  /** Spark's FileSourceScanExec split arithmetic (maxSplitBytes from
    * maxPartitionBytes/openCostInBytes/minPartitionNum, then greedy
    * size-descending bin-packing) applied to the relation's file
    * listing — the listing itself is cached by the InMemoryFileIndex,
    * so this touches no physical planning. */
  private def fileScanPartitions(s: SparkSession, fs: HadoopFsRelation): Int = {
    val conf = s.sessionState.conf
    val openCost = conf.filesOpenCostInBytes
    val minPartitionNum =
      conf.filesMinPartitionNum.getOrElse(s.sparkContext.defaultParallelism)
    val files = fs.location.listFiles(Nil, Nil).flatMap(_.files)
    if (files.isEmpty) return 0
    val totalBytes = files.map(_.getLen + openCost).sum
    val maxSplitBytes = math.min(conf.filesMaxPartitionBytes,
      math.max(openCost, totalBytes / math.max(minPartitionNum, 1)))
    val splits = files.flatMap { f =>
      val len = f.getLen
      if (len == 0) Nil
      else (0L until len by maxSplitBytes).map(off => math.min(maxSplitBytes, len - off))
    }.sortBy(-_)
    var count = 0
    var cur = 0L
    splits.foreach { sz =>
      if (cur + sz > maxSplitBytes && cur > 0) { count += 1; cur = 0L }
      cur += sz + openCost
    }
    if (cur > 0) count += 1
    math.max(count, 1)
  }
}
