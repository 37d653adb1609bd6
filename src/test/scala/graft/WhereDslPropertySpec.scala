package graft

import graft.query.WhereDsl
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Generative parity sweep for the Chroma where-DSL translator (VERDICT
  * r4 #8): random nested `$and`/`$or` trees — mixed-type numeric
  * comparisons, `$in`/`$nin`, multi-key implicit conjunctions, depth up
  * to 3 — cross-checked row-for-row against an independent reference
  * evaluator over the same metadata rows. The evaluator implements the
  * DSL semantics directly on JValues (numerics compare in double,
  * strings lexically, `$in`/`$nin` by membership equality) — a second
  * implementation, not a call into WhereDsl, so a shared bug cannot
  * hide. Seeded: every failure is replayable.
  */
/** Metadata row for the sweep (top-level: Spark encoders cannot reach a
  * class nested inside the suite instance). */
final case class WhereDslMRow(id: Long, lang: String, source: String,
                              n_chars: Long, score: Double, flag: Boolean)

class WhereDslPropertySpec extends SparkSpec {

  private type MRow = WhereDslMRow

  private val langs = Vector("en", "de", "fr", "es")
  private val sources = Vector("web", "wiki", "book")

  private def mkRows(rng: scala.util.Random, n: Int): IndexedSeq[MRow] =
    (0 until n).map { i =>
      WhereDslMRow(i.toLong, langs(rng.nextInt(langs.size)), sources(rng.nextInt(sources.size)),
        rng.nextInt(101).toLong, math.floor(rng.nextDouble() * 1000) / 10.0,
        rng.nextBoolean())
    }

  // ------------------------------------------------ random DSL trees

  private def numLit(rng: scala.util.Random): JValue =
    if (rng.nextBoolean()) JInt(BigInt(rng.nextInt(101)))
    else JDouble(math.floor(rng.nextDouble() * 1000) / 10.0)

  private def leafFor(rng: scala.util.Random): (String, JValue) = {
    val (name, value): (String, () => JValue) = rng.nextInt(5) match {
      case 0 => ("lang", () => JString(langs(rng.nextInt(langs.size))))
      case 1 => ("source", () => JString(sources(rng.nextInt(sources.size))))
      case 2 => ("n_chars", () => numLit(rng))
      case 3 => ("score", () => numLit(rng))
      case _ => ("flag", () => JBool(rng.nextBoolean()))
    }
    val ops =
      if (name == "flag") Vector("$eq", "$ne")
      else Vector("$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin")
    rng.nextInt(3) match {
      case 0 => name -> value() // bare {"k": v} equality
      case _ =>
        val op = ops(rng.nextInt(ops.size))
        if (op == "$in" || op == "$nin")
          name -> JObject(List(op ->
            JArray((0 to rng.nextInt(3)).map(_ => value()).toList)))
        else name -> JObject(List(op -> value()))
    }
  }

  private def tree(rng: scala.util.Random, depth: Int): JObject =
    if (depth == 0) JObject(List(leafFor(rng)))
    else rng.nextInt(4) match {
      case 0 => JObject(List(leafFor(rng)))
      case 1 => JObject(List("$and" ->
        JArray((0 to 1 + rng.nextInt(2)).map(_ => tree(rng, depth - 1): JValue).toList)))
      case 2 => JObject(List("$or" ->
        JArray((0 to 1 + rng.nextInt(2)).map(_ => tree(rng, depth - 1): JValue).toList)))
      case _ => // multi-key object = implicit conjunction over distinct fields
        val l1 = leafFor(rng)
        var l2 = leafFor(rng)
        while (l2._1 == l1._1) l2 = leafFor(rng)
        JObject(List(l1, l2))
    }

  // -------------------------------------- independent reference eval

  private def fieldVal(r: MRow, k: String): Any = k match {
    case "lang" => r.lang
    case "source" => r.source
    case "n_chars" => r.n_chars
    case "score" => r.score
    case "flag" => r.flag
    case other => fail(s"generator produced unknown field $other")
  }

  /** Three-way compare of a column value against a JSON literal; None =
    * incomparable types (never generated, would be a generator bug). */
  private def cmp(a: Any, v: JValue): Option[Int] = (a, v) match {
    case (s: String, JString(t)) => Some(math.signum(s.compareTo(t)))
    case (b: Boolean, JBool(t)) => Some(if (b == t) 0 else 1)
    case (x: Long, JInt(i)) => Some(x.compare(i.toLong))
    case (x: Long, JDouble(d)) => Some(math.signum(x.toDouble.compareTo(d)))
    case (x: Double, JInt(i)) => Some(math.signum(x.compareTo(i.toDouble)))
    case (x: Double, JDouble(d)) => Some(math.signum(x.compareTo(d)))
    case _ => None
  }

  private def evalOp(a: Any, op: String, v: JValue): Boolean = op match {
    case "$eq" => cmp(a, v).contains(0)
    case "$ne" => !cmp(a, v).contains(0)
    case "$gt" => cmp(a, v).exists(_ > 0)
    case "$gte" => cmp(a, v).exists(_ >= 0)
    case "$lt" => cmp(a, v).exists(_ < 0)
    case "$lte" => cmp(a, v).exists(_ <= 0)
    case "$in" => v match {
      case JArray(vs) => vs.exists(x => cmp(a, x).contains(0))
      case _ => false
    }
    case "$nin" => v match {
      case JArray(vs) => !vs.exists(x => cmp(a, x).contains(0))
      case _ => true
    }
    case other => fail(s"generator produced unknown op $other")
  }

  private def evalTree(j: JValue, r: MRow): Boolean = j match {
    case JObject(fields) => fields.forall {
      case ("$and", JArray(cs)) => cs.forall(evalTree(_, r))
      case ("$or", JArray(cs)) => cs.exists(evalTree(_, r))
      case (k, JObject(List((op, v)))) if op.startsWith("$") => evalOp(fieldVal(r, k), op, v)
      case (k, v) => cmp(fieldVal(r, k), v).contains(0)
    }
    case other => fail(s"generator produced non-object clause $other")
  }

  test("random nested where-DSL trees: Spark filter == reference evaluator") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(0xD51C0DEL)
    val data = mkRows(rng, 200)
    val df = data.toDF().cache()
    df.count()
    var nonTrivial = 0
    (1 to 500).foreach { i =>
      val t = tree(rng, 3)
      val json = JsonMethods.compact(JsonMethods.render(t))
      val expected = data.filter(evalTree(t, _)).map(_.id).toSet
      val got = df.filter(WhereDsl.parse(json)).select("id").as[Long].collect().toSet
      assert(got == expected,
        s"tree #$i mismatch: $json\n missing=${(expected -- got).toSeq.sorted.take(5)}" +
          s" extra=${(got -- expected).toSeq.sorted.take(5)}")
      if (expected.nonEmpty && expected.size < data.size) nonTrivial += 1
    }
    info(s"non-trivial selections (neither empty nor all rows): $nonTrivial/500")
    // the sweep must not be vacuously passing on all-or-nothing filters
    assert(nonTrivial > 150)
    df.unpersist()
  }
}
