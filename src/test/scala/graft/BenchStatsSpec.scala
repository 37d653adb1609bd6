package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench measurement policy ([[BenchStats]]) — unit-pinned because
  * estimator quirks read as perf regressions: warm-spread semantics
  * (cold run1 excluded), bounded adaptive re-runs, crash exclusion,
  * the trim, and the median takeover under detected contamination. */
class BenchStatsSpec extends AnyFunSuite {

  private def ok(xs: Double*): Seq[(Double, Boolean)] = xs.map((_, true))

  test("warm spread excludes the cold first run") {
    // 3x cold start, tight warm runs: NOT contamination
    assert(BenchStats.warmSpread(ok(3.0, 1.0, 1.05, 0.98)) < 1.1)
    // a warm stall IS contamination even with a calm run1
    assert(BenchStats.warmSpread(ok(1.0, 1.0, 4.2, 1.1)) > 2.0)
    // degenerate: no warm successes -> neutral 1.0
    assert(BenchStats.warmSpread(Seq((5.0, true))) == 1.0)
    assert(BenchStats.warmSpread(Seq((5.0, true), (9.0, false))) == 1.0)
  }

  test("adaptive re-runs: fire only past the flag, bounded, stop when calm") {
    // calm: exactly base runs, no extras
    var calls = 0
    val calm = () => { calls += 1; (1.0 + calls * 0.001, true) }
    val (r1, e1) = BenchStats.collectRuns(5, 4, calm)
    assert(r1.length == 5 && e1 == 0)
    // one warm stall then calm: extras fire until the spread includes
    // enough calm runs... spread stays >2 while the stall is in the
    // window, so it runs to the bound (the stall never leaves the warm
    // set) — re-runs are BOUNDED, a bimodal query stays flagged
    calls = 0
    val stallSecond = () => { calls += 1; (if (calls == 2) 9.0 else 1.0, true) }
    val (r2, e2) = BenchStats.collectRuns(3, 4, stallSecond)
    assert(e2 == 4 && r2.length == 7)
    assert(BenchStats.warmSpread(r2) > 2.0) // still flagged - honest
  }

  test("crashed runs never contribute a timing; all-crash is a sentinel") {
    val s = BenchStats.summarize(
      Seq((0.1, false), (2.0, true), (2.2, true), (0.1, false), (2.1, true)),
      extra = 0, heavy = false).get
    assert(s.n == 3 && s.errors == 2)
    assert(s.median == 2.1 && s.min == 2.0 && s.max == 2.2)
    assert(BenchStats.summarize(Seq((0.1, false), (0.2, false)), 0, true).isEmpty)
  }

  test("median handles an even surviving count (crash-made)") {
    val s = BenchStats.summarize(
      Seq((1.0, true), (3.0, true), (9.9, false), (2.0, true), (4.0, true)),
      extra = 0, heavy = false).get
    assert(s.n == 4 && s.median == 2.5) // mean of middles 2.0, 3.0
  }

  test("trim is the mean of the middle n-2; heavy primary switches to " +
      "the median once re-runs fired") {
    val five = ok(1.0, 10.0, 2.0, 3.0, 4.0) // sorted: 1,2,3,4,10
    val clean = BenchStats.summarize(five, extra = 0, heavy = true).get
    assert(clean.trimmed == 3.0 && clean.primary == 3.0) // (2+3+4)/3
    // same runs but contamination was detected -> median governs
    val dirty = BenchStats.summarize(five, extra = 2, heavy = true).get
    assert(dirty.primary == dirty.median && dirty.median == 3.0)
    // the case that motivated the takeover: several bad passes of 7 —
    // trim still averages two of them in, median resists
    val seven = ok(5.0, 5.1, 5.2, 5.3, 19.0, 20.0, 21.0)
    val s7 = BenchStats.summarize(seven, extra = 4, heavy = true).get
    assert(s7.median == 5.3)
    assert(s7.trimmed > 10.0, "the trim is poisoned here - that is the point")
    assert(s7.primary == 5.3)
    // light tier always reports the median
    val light = BenchStats.summarize(five, extra = 0, heavy = false).get
    assert(light.primary == light.median && light.median == 3.0)
  }

  test("contaminated flag follows the warm spread") {
    val s = BenchStats.summarize(ok(1.0, 1.0, 4.2, 1.0), 0, false).get
    assert(s.contaminated && s.spread > 4.0)
    val calm = BenchStats.summarize(ok(9.0, 1.0, 1.1, 1.0), 0, false).get
    assert(!calm.contaminated) // the 9.0 is run1 - cold, expected
  }
}
