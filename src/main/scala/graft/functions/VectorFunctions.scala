package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector distance/similarity primitives over `ARRAY<FLOAT>` columns.
  *
  * Two tiers:
  *  1. [[VectorDistance]] — a native Catalyst `Expression` with
  *     `doGenCode` (tight primitive loop, no per-element lambda dispatch,
  *     stays inside whole-stage codegen). This is the hot path for kNN /
  *     similarity-join at scale.
  *  2. HOF fallbacks built from `zip_with`/`aggregate` — pure built-ins,
  *     used to cross-check the expression in tests.
  *
  * Accumulation is double-precision left-to-right over the array order,
  * which both DuckDB's `list_distance` family and a hand-rolled oracle can
  * reproduce.
  */
object Metric extends Enumeration {
  val L2Sq, Cosine, Dot = Value
}

case class VectorDistance(left: Expression, right: Expression, metric: String)
    extends BinaryExpression {

  // inputs are cast to ARRAY<FLOAT> at the Column-builder layer
  // (VectorFunctions.floatVec), so no ExpectsInputTypes contract needed
  override def dataType: DataType = DoubleType
  override def prettyName: String = s"vector_$metric"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var i = 0
    metric match {
      case "l2sq" =>
        var acc = 0.0
        while (i < n) { val d = xs.getFloat(i).toDouble - ys.getFloat(i); acc += d * d; i += 1 }
        acc
      case "dot" =>
        var acc = 0.0
        while (i < n) { acc += xs.getFloat(i).toDouble * ys.getFloat(i); i += 1 }
        acc
      case "cosine" =>
        var dot = 0.0; var na = 0.0; var nb = 0.0
        while (i < n) {
          val x = xs.getFloat(i).toDouble; val y = ys.getFloat(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      metric match {
        case "l2sq" =>
          val acc = ctx.freshName("acc")
          val d = ctx.freshName("d")
          s"""
             |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
             |  $acc += $d * $d;
             |}
             |${ev.value} = $acc;
           """.stripMargin
        case "dot" =>
          val acc = ctx.freshName("acc")
          s"""
             |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
             |double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
             |}
             |${ev.value} = $acc;
           """.stripMargin
        case "cosine" =>
          val dot = ctx.freshName("dot")
          val na = ctx.freshName("na")
          val nb = ctx.freshName("nb")
          val x = ctx.freshName("x")
          val y = ctx.freshName("y")
          s"""
             |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
             |double $dot = 0.0, $na = 0.0, $nb = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $x = (double) $a.getFloat($i);
             |  double $y = (double) $b.getFloat($i);
             |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
             |}
             |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
           """.stripMargin
      }
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric distance computation over int8 scalar-quantized codes: the
  * stored side is an `ARRAY<INT>` of per-dimension byte codes, the query
  * stays full precision, and the dequantize+distance runs fused in one
  * codegen'd loop. Dequantization params (per-dim min and scale =
  * (max-min)/255) and the query vector ride as reference objects — k·dim
  * doubles in the task binary, not columns.
  *
  * Why this exists next to IVF-PQ: SQ is the 4× compression point with
  * near-exact recall (PQ is 32× with coarse recall + rerank); at 100 TB
  * the SQ scan reads 64 B/vector instead of 256 B, and — unlike PQ's
  * codebook argmin — the encode/decode arithmetic is exactly
  * reproducible in SQL, so SQ search is a FULL oracle check, not a
  * recall-spec-only operator.
  */
case class SqAdcDistance(child: Expression, mins: Array[Double],
    scales: Array[Double], query: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_adc_distance"

  override protected def nullSafeEval(c: Any): Any = {
    val codes = c.asInstanceOf[ArrayData]
    val n = math.min(codes.numElements(), query.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = mins(i) + codes.getInt(i) * scales(i) - query(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("mins", mins, "double[]")
    val scalesRef = ctx.addReferenceObj("scales", scales, "double[]")
    val queryRef = ctx.addReferenceObj("query", query, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($c.numElements(), $queryRef.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $minsRef[$i] + $c.getInt($i) * $scalesRef[$i] - $queryRef[$i];
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  private def asCol(e: Expression): Column = Bridge.column(e)
  private def ex(c: Column): Expression = Bridge.expression(c)
  private def floatVec(c: Column): Column = c.cast(ArrayType(FloatType))

  /** Squared L2 distance (Chroma's default space — reference never
    * overrides `hnsw:space`, see SURVEY §6). */
  def l2Sq(a: Column, b: Column): Column =
    asCol(VectorDistance(ex(floatVec(a)), ex(floatVec(b)), "l2sq"))

  def cosine(a: Column, b: Column): Column =
    asCol(VectorDistance(ex(floatVec(a)), ex(floatVec(b)), "cosine"))

  def dot(a: Column, b: Column): Column =
    asCol(VectorDistance(ex(floatVec(a)), ex(floatVec(b)), "dot"))

  /** Literal query vector as an ARRAY<FLOAT> column. */
  def vecLit(v: Array[Float]): Column =
    array(v.map(x => lit(x)): _*).cast(ArrayType(FloatType))

  /** int8 scalar-quantization ENCODE: per-dim `floor((x-mn)/(mx-mn)·255
    * + 0.5)` against corpus min/max (no clamp needed — corpus vectors
    * are inside their own min/max by definition; a dim with mx == mn
    * codes to 0). HOF form on purpose: encoding runs once per vector at
    * index-build time, not per comparison — the search hot path is the
    * codegen'd [[SqAdcDistance]]. */
  def sqEncode(vec: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val minsL = typedlit(mins)
    val maxsL = typedlit(maxs)
    transform(vec, (x, i) => {
      val mn = element_at(minsL, i + 1)
      val mx = element_at(maxsL, i + 1)
      when(mx === mn, lit(0))
        .otherwise(floor((x.cast("double") - mn) / (mx - mn) * 255 + 0.5).cast("int"))
    })
  }

  /** Fused dequantize + squared-L2 against a full-precision query
    * (asymmetric distance computation over [[sqEncode]] codes). */
  def sqAdc(codes: Column, mins: Array[Double], scales: Array[Double],
      query: Array[Double]): Column =
    asCol(SqAdcDistance(ex(codes.cast(ArrayType(IntegerType))), mins, scales, query))

  // ---- HOF fallbacks (built-ins only; used for cross-checking) ----
  def l2SqHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) *
      (x.cast("double") - y.cast("double"))), lit(0.0), (acc, v) => acc + v)

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosineHof(a: Column, b: Column): Column = {
    val d = dotHof(a, b)
    val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")), lit(0.0), (p, v) => p + v)
    val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")), lit(0.0), (p, v) => p + v)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / sqrt(na * nb))
  }

  /** L2-normalize an ARRAY<FLOAT> column (BGE-style `normalize_embeddings`). */
  def normalize(a: Column): Column = {
    val nrm = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (p, v) => p + v))
    when(nrm === 0.0, a).otherwise(transform(a, x => (x.cast("double") / nrm).cast("float")))
  }
}
