package graft

/** The PURE estimator core of [[Bench]] — measurement policy factored
  * out of the main so it is unit-testable (BenchStatsSpec). The r12-r14
  * criterion history is one long lesson that the measurement code is
  * load-bearing: an estimator quirk reads as a perf regression and
  * burns a round. Policy summary:
  *
  *  - runs are (wall seconds, succeeded); crashed runs NEVER contribute
  *    their (fast) wall time to any estimator;
  *  - the WARM spread (max/min over runs 2..n — run 1 is cold JIT and
  *    expected to cost 2-3x) past [[SpreadFlag]] marks contamination
  *    and triggers bounded adaptive re-runs;
  *  - median: conventional (mean of middles when the surviving count is
  *    even — only reachable via crashes, base counts are odd);
  *  - trimmed: mean of the middle n-2 — the heavy tier's
  *    no-contamination primary;
  *  - primary: heavy & clean → trimmed; heavy & re-runs fired → median
  *    of all (the trim still averages bad passes in when several of n
  *    are bad; the median resists up to half); light tier → median. */
object BenchStats {

  val SpreadFlag = 2.0

  final case class Summary(primary: Double, median: Double,
                           trimmed: Double, min: Double, max: Double,
                           n: Int, errors: Int, raw: Seq[Double],
                           spread: Double) {
    def contaminated: Boolean = spread > SpreadFlag
  }

  /** max/min over the SUCCESSFUL runs excluding the first (cold) one;
    * 1.0 when fewer than one warm success exists. */
  def warmSpread(runs: Seq[(Double, Boolean)]): Double = {
    val ok = runs.drop(1).filter(_._2).map(_._1)
    if (ok.isEmpty) 1.0 else ok.max / math.max(ok.min, 1e-9)
  }

  /** Run `base` passes, then while the warm spread exceeds the flag add
    * passes up to `maxExtra`. Returns (all runs, extras fired). */
  def collectRuns(base: Int, maxExtra: Int,
                  oneRun: () => (Double, Boolean)): (Seq[(Double, Boolean)], Int) = {
    var runs: Seq[(Double, Boolean)] = (1 to base).map(_ => oneRun())
    var extra = 0
    while (extra < maxExtra && warmSpread(runs) > SpreadFlag) {
      runs = runs :+ oneRun(); extra += 1
    }
    (runs, extra)
  }

  /** Summarize a query's runs; None when EVERY run crashed (the caller
    * reports the loud sentinel instead of a timing). */
  def summarize(runs: Seq[(Double, Boolean)], extra: Int,
                heavy: Boolean): Option[Summary] = {
    val spr = math.floor(warmSpread(runs) * 1000 + 0.5) / 1000
    val errors = runs.count(!_._2)
    val times = runs.filter(_._2).map(_._1).sorted
    if (times.isEmpty) return None
    val n = times.length
    val med =
      if (n % 2 == 1) times(n / 2)
      else (times(n / 2 - 1) + times(n / 2)) / 2
    val trimmed =
      if (n > 2) times.drop(1).dropRight(1).sum / (n - 2) else med
    val primary = if (heavy && extra == 0) trimmed else med
    Some(Summary(primary, med, trimmed, times.head, times.last, n, errors,
      runs.filter(_._2).map(_._1), spr))
  }
}
