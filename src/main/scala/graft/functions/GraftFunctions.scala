package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}

/** The library's SQL-callable functions: every custom Catalyst
  * expression surfaces in the SQL front-end too, so `spark.sql` users
  * get the same codegen'd kernels as the DataFrame API.
  *
  * Lives next to the kernels it wraps because each builder must mirror
  * the INPUT-CAST seam of the Column builders (VectorFunctions.floatVec
  * etc.) — the raw kernels read typed array slots directly, so an
  * uncast ARRAY<DOUBLE> or ARRAY<INT> argument would be silently
  * misread in codegen rather than coerced.
  */
object GraftFunctions {

  private def two(name: String)(f: (Expression, Expression) => Expression)
  : Seq[Expression] => Expression = { args =>
    if (args.length != 2)
      throw new IllegalArgumentException(
        s"$name expects exactly 2 arguments, got ${args.length}")
    f(args(0), args(1))
  }

  private def fv(e: Expression): Expression = Cast(e, ArrayType(FloatType))
  private def lv(e: Expression): Expression = Cast(e, ArrayType(LongType))

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_cosine" -> two("vec_cosine")((a, b) => VectorDistance(fv(a), fv(b), "cosine")),
    "vec_l2sq" -> two("vec_l2sq")((a, b) => VectorDistance(fv(a), fv(b), "l2sq")),
    "vec_dot" -> two("vec_dot")((a, b) => VectorDistance(fv(a), fv(b), "dot")),
    "set_intersect_size" ->
      two("set_intersect_size")((a, b) => SortedArrayIntersectSize(lv(a), lv(b))))

  /** Register on a LIVE session (getOrCreate reuses existing sessions,
    * where builder-time extensions never run — this path always works). */
  def register(spark: SparkSession): Unit = all.foreach { case (n, b) =>
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(n, b, "built-in")
  }
}
