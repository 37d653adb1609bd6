package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val pairs = Seq(
    (Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
    (Array(0f, 0f, 0f), Array(1f, 1f, 1f)),
    (Array(1f, 0f, 0f), Array(1f, 0f, 0f)),
    (Array(-1f, 2.5f, 0.5f), Array(3f, -0.25f, 8f))
  ).toDF("a", "b")

  test("codegen expression matches HOF fallback for all metrics") {
    val df = pairs.select(
      l2Sq($"a", $"b").as("e_l2"), l2SqHof($"a", $"b").as("h_l2"),
      dot($"a", $"b").as("e_dot"), dotHof($"a", $"b").as("h_dot"),
      cosine($"a", $"b").as("e_cos"), cosineHof($"a", $"b").as("h_cos"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-12)
      assert(math.abs(r.getDouble(4) - r.getDouble(5)) < 1e-12)
    }
  }

  test("known values") {
    val r = pairs.select(l2Sq($"a", $"b"), dot($"a", $"b"), cosine($"a", $"b")).collect()
    assert(r(0).getDouble(0) == 27.0) // (3^2+3^2+3^2)
    assert(r(0).getDouble(1) == 32.0) // 4+10+18
    assert(r(2).getDouble(2) == 1.0)  // identical unit vectors
    assert(r(1).getDouble(2) == 0.0)  // zero-norm guard
  }

  test("interpreted eval matches codegen (eval path via filter on literal)") {
    // force interpreted path through a literal fold
    val v = vecLit(Array(1f, 2f))
    val out = spark.range(1).select(l2Sq(v, vecLit(Array(3f, 4f))).as("d")).head().getDouble(0)
    assert(out == 8.0)
  }

  test("SQ encode/ADC: reconstruction error bounded, exact on grid points") {
    val mins = Array(0.0, -1.0, 2.0)
    val maxs = Array(1.0, 1.0, 2.0) // dim 2 is degenerate (mx == mn)
    val scales = Array.tabulate(3)(i => (maxs(i) - mins(i)) / 255)
    val df = Seq(
      Tuple1(Array(0f, -1f, 2f)),      // exact lower corner -> codes (0,0,0)
      Tuple1(Array(1f, 1f, 2f)),       // exact upper corner -> (255,255,0)
      Tuple1(Array(0.5f, 0.123f, 2f))
    ).toDF("v")
    val enc = df.select(sqEncode($"v", mins, maxs).as("code"))
    val codes = enc.collect().map(_.getSeq[Int](0))
    assert(codes(0) == Seq(0, 0, 0))
    assert(codes(1) == Seq(255, 255, 0))
    // ADC distance of a vector to ITSELF as query = pure quantization
    // error: bounded by sum of (scale/2)^2 per dim
    val q = Array(0.5, 0.123, 2.0)
    val selfDist = enc.select(sqAdc($"code", mins, scales, q).as("d"))
      .collect()(2).getDouble(0)
    val bound = scales.map(s => (s / 2) * (s / 2)).sum + 1e-12
    assert(selfDist <= bound, s"$selfDist > $bound")
  }

  test("SQ ADC codegen matches an HOF reconstruction") {
    val mins = Array(-0.5, -0.5, -0.5, -0.5)
    val maxs = Array(0.5, 0.5, 0.5, 0.5)
    val scales = Array.tabulate(4)(i => (maxs(i) - mins(i)) / 255)
    val query = Array(0.1, -0.2, 0.3, -0.4)
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(50)(Tuple1(Array.fill(4)(rnd.nextFloat() - 0.5f))).toDF("v")
      .select(sqEncode($"v", mins, maxs).as("code"))
    val minsL = typedlit(mins); val qL = typedlit(query)
    val hof = aggregate(
      zip_with($"code", sequence(lit(1), lit(4)), (c, i) =>
        (element_at(minsL, i) + c.cast("double") * element_at(typedlit(scales), i)
          - element_at(qL, i)) *
        (element_at(minsL, i) + c.cast("double") * element_at(typedlit(scales), i)
          - element_at(qL, i))),
      lit(0.0), (acc, x) => acc + x)
    df.select(sqAdc($"code", mins, scales, query).as("e"), hof.as("h"))
      .collect().foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("normalize produces unit vectors") {
    val n = pairs.select(normalize($"a").as("n"))
      .select(sqrt(aggregate(transform($"n", x => x * x), lit(0.0), (a, x) => a + x)))
      .as[Double].collect()
    assert(math.abs(n(0) - 1.0) < 1e-6)
    assert(n(1) == 0.0) // zero vector stays zero
  }

  test("null inputs yield null") {
    val df = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(l2Sq($"a", $"b")).head().isNullAt(0))
  }

  test("SQL function registry: spark.sql reaches the same kernels as the DataFrame API") {
    graft.functions.GraftFunctions.register(spark)
    Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f)))
      .toDF("a", "b").createOrReplaceTempView("vfr")
    val r = spark.sql(
      """SELECT vec_dot(a, b) AS d, vec_cosine(a, b) AS c, vec_l2sq(a, b) AS l,
        |       set_intersect_size(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS i
        |FROM vfr""".stripMargin).head()
    assert(r.getDouble(0) == 32.0)
    val api = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
      .select(cosine($"a", $"b"), l2Sq($"a", $"b")).head()
    assert(r.getDouble(1) == api.getDouble(0) && r.getDouble(2) == api.getDouble(1))
    assert(r.getInt(3) == 2)
    // the input-cast seam: DOUBLE/INT array literals (SQL's defaults)
    // must coerce, not be misread by the typed kernel slots
    val cast = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |       set_intersect_size(array(1, 2, 5), array(2, 3, 5)) AS i""".stripMargin).head()
    assert(cast.getDouble(0) == 32.0 && cast.getInt(1) == 2)
    // arity is validated, not an IndexOutOfBounds crash or silent ignore
    val e = intercept[Exception](spark.sql("SELECT vec_cosine(array(1.0F))").head())
    assert(e.getMessage.contains("2 arguments") ||
      Option(e.getCause).exists(_.getMessage.contains("2 arguments")))
  }
}
