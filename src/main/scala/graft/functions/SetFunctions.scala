package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** |A ∩ B| for two SORTED ARRAY<BIGINT> columns via a zero-allocation
  * merge scan in generated code.
  *
  * This is the inner loop of the exact set-similarity join: Spark's
  * `array_intersect` builds a hash set per row pair (per-pair allocation +
  * boxing), which at millions of candidate pairs dominates the whole
  * dedup query. A merge over pre-sorted arrays is a few thousand primitive
  * compares with no allocation — ~40x faster end-to-end on the ngram
  * dedup bench.
  *
  * Inputs MUST be sorted ascending and duplicate-free (use
  * `array_sort(array_distinct(...))` — Dedup.sortedShingleHashes does).
  */
case class SortedArrayIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_array_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val m = ys.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val x = xs.getLong(i)
      val y = ys.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Early-exit Jaccard threshold test over two SORTED ARRAY<BIGINT> sets:
  * true iff |A∩B| / |A∪B| >= minFrac. The merge scan aborts as soon as the
  * intersection can no longer reach (or can no longer miss) the required
  * count — on candidate streams where most pairs are far below threshold
  * this halves the scan work vs computing the full intersection.
  */
case class JaccardAtLeast(left: Expression, right: Expression, minFrac: Double)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "jaccard_at_least"

  // i/(n+m-i) >= t  <=>  i >= t(n+m)/(1+t)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val m = ys.numElements()
    val required = math.ceil(minFrac * (n + m) / (1.0 + minFrac) - 1e-9).toInt
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      if (c >= required) return true
      if (c + math.min(n - i, m - j) < required) return false
      val x = xs.getLong(i); val y = ys.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c >= required
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val req = ctx.freshName("req")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val rem = ctx.freshName("rem")
      val done = ctx.freshName("done")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $req = (int) java.lang.Math.ceil($minFrac * ($n + $m) / (1.0 + $minFrac) - 1e-9);
         |int $i = 0, $j = 0, $c = 0;
         |boolean $done = false;
         |while (!$done && $i < $n && $j < $m) {
         |  if ($c >= $req) { ${ev.value} = true; $done = true; break; }
         |  int $rem = java.lang.Math.min($n - $i, $m - $j);
         |  if ($c + $rem < $req) { ${ev.value} = false; $done = true; break; }
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |if (!$done) { ${ev.value} = $c >= $req; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SetFunctions {
  def sortedIntersectSize(a: Column, b: Column): Column =
    Bridge.column(SortedArrayIntersectSize(Bridge.expression(a), Bridge.expression(b)))

  def jaccardAtLeast(a: Column, b: Column, minFrac: Double): Column =
    Bridge.column(JaccardAtLeast(Bridge.expression(a), Bridge.expression(b), minFrac))
}
