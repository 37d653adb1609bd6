package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark main (driver contract): runs every registered query
  * at SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is timed over 3 consecutive runs in a fixed (alphabetical)
  * order in the same JVM and reported as the MEDIAN — single-run timings
  * on a contended box showed 2-4x swings on untouched code paths in
  * rounds 3-4, burying real regressions and real wins alike. min/max per
  * query are kept in `queries_detail` (max-vs-median exposes first-touch
  * warmup costs; a high min flags a genuinely slow plan).
  * `value` = sum of the per-query figures, comparable across rounds.
  *
  * The HEAVY tier (composed pipelines, streaming, store/index builders —
  * the queries that run many jobs and checkpoint intermediates) gets 5
  * runs and reports the TRIMMED MEAN of the middle 3: these queries are
  * the ones the box's I/O-stall noise mode distorts (round 10's official
  * record had `pipeline_training_data` at 7.44 s median with a 6.23 s
  * min on a query whose calm-box median is ~4.7 s), and one stalled run
  * out of three shifts a median where a 5-run trim absorbs it. Detail
  * rows carry median, min, max, the trimmed figure, and the run count,
  * so both estimators stay auditable.
  *
  * CONTAMINATION self-diagnosis: the same code has benched 2-5x apart
  * on builder vs driver runs of the SAME HEAD (r13), so a record must
  * carry the evidence of its own measurement conditions. Per query the
  * detail row records the raw run times and the max/min SPREAD; a
  * spread > 2 marks the query `contaminated` AND triggers up to
  * [[MaxExtraRuns]] adaptive re-runs (the estimators recompute over all
  * successful runs, so one stalled pass is out-voted rather than
  * shipped). The top level reports the contaminated-query count and the
  * OS load average sampled before and after the sweep — a driver-side
  * reader can now tell "slow plan" from "busy box" without a rebuild.
  */
object Bench {
  private val Runs = 3
  private val HeavyRuns = 5
  private val MaxExtraRuns = 4
  private val SpreadFlag = BenchStats.SpreadFlag

  /** 1-minute OS load average (rounded), or -1 where the JMX bean
    * doesn't supply one — the record's busy-box evidence. */
  private def loadAvg(): Double = {
    val la = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    if (la < 0) -1.0 else math.floor(la * 100 + 0.5) / 100
  }

  /** CPU-steal calibration probe: a fixed single-threaded integer spin
    * (~100 ms on an unthrottled core) timed in wall-clock. The box this
    * suite runs on throttles in waves at the HOST level (GC logs ruled
    * the JVM out rounds ago: <1.3 s total pause while wall swung 5x),
    * and the probe makes that visible IN the record: a 100 ms nominal
    * spin reading 400 ms next to a 4x-slow query run says "throttled
    * window", not "slow plan". The xorshift keeps the loop
    * unoptimizable; the result is folded into the returned millis so
    * the JIT cannot delete it. */
  private def calibrate(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < 150000000) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    val ms = (System.nanoTime() - t0) / 1e6
    math.floor(ms * 10 + 0.5) / 10 + (if (x == 42L) 1e-9 else 0.0)
  }

  /** The composed/streaming/builder queries whose many-job execution is
    * exposed to scheduler + I/O stalls — the trimmed-mean tier. */
  private def isHeavy(name: String): Boolean =
    name.startsWith("pipeline_") || name.startsWith("streaming_") ||
      name.startsWith("collection_") || name.startsWith("ingest_") ||
      name.startsWith("ann_graph") || name.startsWith("sparse_") ||
      name.contains("vacuum") || name == "dedup_clusters"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // generated-class cache sized for the WHOLE sweep, not Spark's
      // 100-entry default: 271 queries evict each other's classes, so
      // without this every run of a big composed plan re-pays janino
      // compilation (the r13 kmeans finding, suite-wide) — runs 2..n of
      // a query should measure the PLAN, not the compiler. Static conf:
      // must be set before the context starts.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen infrastructure + scan machinery, so the
    // alphabetically-first query doesn't absorb session startup
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
        .foreach(t => Tables.read(spark, sfDir, t).count())
    } catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY=a,b,c — iterate on a subset; BENCH_FULL.json is
    // only written for unfiltered runs so a probe can't clobber the record
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty) System.err.println(
        s"[bench] WARNING: SPARK_GRAFT_ONLY names not in the registry " +
          s"(skipped): ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val loadStart = loadAvg()
    val results = selected.map { case (name, fn) =>
      val nRuns = if (isHeavy(name)) HeavyRuns else Runs
      // (wall seconds, succeeded) per run: a crashed run must NOT
      // contribute its (fast) wall time to the estimators — with the
      // heavy tier's trimmed mean, folding crash times in would mask a
      // query that fails on some runs as a healthy fast one
      def oneRun(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name run FAILED: $e"); false }
        val dt = (System.nanoTime() - t0) / 1e9
        // operators that cache intermediates (dedup shingle sets) would
        // otherwise leak blocks into every later query's JVM; the GC
        // drains the ContextCleaner's reference queue (shuffle files,
        // broadcasts) the same way a fresh JVM per query would — without
        // it, cleanup debt lands on whichever shuffle-heavy query runs
        // next (measured: the iterative clustering query degrades from a
        // stable ~6.5s median to 8.4 median / 15s max without this).
        // Both run OUTSIDE the timed section.
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        System.gc()
        (dt, ok)
      }
      val cal = calibrate()
      // the measurement POLICY (adaptive re-runs, warm spread, median
      // takeover under detected contamination) lives in [[BenchStats]]
      // — pure and unit-tested, because estimator quirks read as perf
      // regressions and burn rounds (r12-r14 history)
      val (runs, extra) = BenchStats.collectRuns(nRuns, MaxExtraRuns, oneRun _)
      BenchStats.summarize(runs, extra, isHeavy(name)) match {
        case None =>
          // every run crashed: report a LOUD sentinel, never a timing
          System.err.println(f"[bench] $name%-28s ALL ${runs.length} runs FAILED")
          (name, -1.0, -1.0, -1.0, -1.0, -1.0, 0, runs.length,
            Seq.empty[Double], 1.0, cal)
        case Some(s) =>
          System.err.println(
            f"[bench] $name%-28s med ${s.median}%8.2fs  trim ${s.trimmed}%6.2fs  " +
              f"min ${s.min}%6.2fs  max ${s.max}%6.2fs  n=${s.n}  cal ${cal}%6.1fms" +
              (if (s.contaminated) f"  CONTAMINATED spread=${s.spread}%.1fx" else "") +
              (if (s.errors > 0) s"  ERRORS=${s.errors}" else ""))
          (name, s.primary, s.median, s.trimmed, s.min, s.max, s.n, s.errors,
            s.raw, s.spread, cal)
      }
    }
    val loadEnd = loadAvg()
    val qs = results.map { case (k, p, _, _, _, _, _, _, _, _, _) => s"\"" + k + "\":" + p }
      .mkString("{", ",", "}")
    def r3(x: Double): Double = math.floor(x * 1000 + 0.5) / 1000
    val detail = results.map { case (k, _, m, tr, lo, hi, n, errs, raw, spr, cal) =>
      s"\"" + k + "\":{\"median\":" + m + ",\"trimmed\":" + tr +
        ",\"min\":" + lo + ",\"max\":" + hi + ",\"runs\":" + n +
        ",\"errors\":" + errs + ",\"spread\":" + spr +
        ",\"contaminated\":" + (spr > SpreadFlag) +
        ",\"cal_ms\":" + cal +
        ",\"raw\":" + raw.map(r3).mkString("[", ",", "]") + "}"
    }.mkString("{", ",", "}")
    // all-runs-failed queries carry the -1 sentinel: exclude them from the
    // total (a negative contribution would misread as speed) and surface
    // the count at the top level instead
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    val contaminated = results.count { case r => r._2 >= 0 && r._10 > SpreadFlag }
    // the calibration track's own summary: nominal ~100 ms; the max/min
    // ratio IS the host-throttle amplitude the sweep experienced
    val cals = results.map(_._11).sorted
    val calLine =
      if (cals.isEmpty) ""
      else s""""cal_ms_min":${cals.head},"cal_ms_median":${cals(cals.length / 2)},"cal_ms_max":${cals.last},"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","runs_per_query":$Runs,"heavy_runs":$HeavyRuns,"failed_queries":$failed,"contaminated_queries":$contaminated,$calLine"load_avg_start":$loadStart,"load_avg_end":$loadEnd,"queries":$qs,"queries_detail":$detail,"sf":"$sfDir"}"""
    // durable record: the driver captures stdout with a bounded tail, and
    // r5's ~60 leading query medians were lost to mid-line truncation.
    // Write the full JSON to the repo BEFORE printing, so the round's perf
    // record survives any stdout capture failure.
    if (only.isEmpty) {
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        (json + "\n").getBytes("UTF-8"))
      catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    }
    println(json)
    spark.stop()
  }
}
