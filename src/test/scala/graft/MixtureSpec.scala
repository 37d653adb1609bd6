package graft

import graft.operators.Mixture

class MixtureSpec extends SparkSpec {

  test("temperature allocation: quotas sum to the budget exactly; tau=0.5 flattens the head") {
    import spark.implicits._
    val df = (Seq.fill(900)("web") ++ Seq.fill(90)("code") ++
      Seq.fill(10)("math")).toDF("domain")
    val plan = Mixture.temperatureAllocation(df, "domain", budget = 100)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(plan.keySet == Set("web", "code", "math"))
    assert(plan.values.map(_._2).sum == 100L, s"quota sum: $plan")
    // proportional sampling would hand web 90/100; sqrt flattening cuts
    // the head and boosts the tail
    val (webN, webQ) = plan("web")
    val (mathN, mathQ) = plan("math")
    assert(webN == 900 && mathN == 10)
    assert(webQ < 80, s"head not flattened: $plan")
    assert(mathQ >= 5, s"tail not boosted: $plan")
    // tau = 1 is plain proportional apportionment
    val prop = Mixture.temperatureAllocation(df, "domain", budget = 100,
        tau = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(prop("web") == 90L && prop("code") == 9L && prop("math") == 1L,
      s"tau=1 not proportional: $prop")
    // empty input -> empty plan, schema intact
    val empty = Mixture.temperatureAllocation(df.limit(0), "domain", 100)
    assert(empty.columns.toSeq ==
      Seq("domain", "n_docs", "w_fp", "quota") && empty.count() == 0)
  }

  test("token-weighted allocation: sized by the weight column, quotas sum exactly") {
    import spark.implicits._
    // few huge docs vs many tiny ones: by ROWS b dominates, by TOKENS a does
    val df = (Seq.fill(2)(("a", 1000L)) ++ Seq.fill(50)(("b", 1L)))
      .toDF("domain", "ntok")
    val byTokens = Mixture.temperatureAllocationBy(df, "domain", "ntok",
        budget = 100)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(byTokens.values.map(_._2).sum == 100L)
    assert(byTokens("a")._1 == 2000L && byTokens("b")._1 == 50L,
      s"token sums wrong: $byTokens")
    // sqrt(2000) vs sqrt(50): a gets ~86% of the budget
    assert(byTokens("a")._2 > byTokens("b")._2, s"token sizing ignored: $byTokens")
    val byRows = Mixture.temperatureAllocation(df, "domain", budget = 100)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(byRows("b") > byRows("a"), s"row sizing drifted: $byRows")
  }

  test("token-budget arithmetic survives training scale (no Long overflow)") {
    import spark.implicits._
    // budget 1e12 x w_fp ~1e11: budget*w ~1e23 >> Long.MaxValue — the
    // BigInt path must produce exact, non-negative quotas that still sum
    // to the budget (the Long path returned garbage silently)
    val big = Seq(("web", 9000000000000000000L), ("code", 4000000000000000L),
        ("wiki", 60000000000L))
      .toDF("domain", "ntok")
    val budget = 1000000000000L // 1T tokens
    val out = Mixture.temperatureAllocationBy(big, "domain", "ntok", budget)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(out.values.forall(_ >= 0L), s"negative quota (overflow): $out")
    assert(out.values.sum == budget, s"quotas must sum to the budget: $out")
    assert(out("web") > out("code") && out("code") > out("wiki"), s"order: $out")
  }

  test("pack advisor: exactly one recommendation; concat never overflows and wastes only shard tails; threshold flips") {
    val docs = Tables.documents(spark, sf)
    val out = Mixture.packAdvisor(docs, "text", "doc_id", "source",
        seqLen = 512)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getBoolean(6)))
    assert(out.map(_._1).sorted.toSeq == Seq("concat_chunks", "greedy_docs"))
    assert(out.count(_._5) == 1, s"not exactly one recommendation: ${out.toSeq}")
    val concat = out.find(_._1 == "concat_chunks").get
    assert(concat._4 == 0L, s"concat overflowed: $concat")
    val nShards = docs.select("source").distinct().count()
    assert(concat._3 <= nShards * 511, s"concat pads beyond shard tails: $concat")
    // an impossible waste bar forces the concat recommendation
    val strict = Mixture.packAdvisor(docs, "text", "doc_id", "source", 512,
        maxWastePpm = 0L)
      .collect().map(r => (r.getString(0), r.getBoolean(6))).toMap
    assert(strict("concat_chunks") && !strict("greedy_docs"),
      s"zero-waste bar did not flip to concat: $strict")
  }

  test("temperature allocation: leftover goes to largest remainders, domain-asc ties") {
    import spark.implicits._
    // three equal domains, budget 100: base quota 33 each, leftover 1
    // -> identical remainders, domain-asc tie gives it to 'a'
    val df = (Seq.fill(7)("a") ++ Seq.fill(7)("b") ++ Seq.fill(7)("c"))
      .toDF("domain")
    val plan = Mixture.temperatureAllocation(df, "domain", budget = 100)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(plan.values.sum == 100L)
    assert(plan("a") == 34L && plan("b") == 33L && plan("c") == 33L,
      s"tie-break drifted: $plan")
  }
}
