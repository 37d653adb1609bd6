package graft

import graft.functions.{JaccardAtLeast, SortedArrayIntersectSize, VectorDistance}
import graft.text.Chunker
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the custom Catalyst expressions and the
  * chunker — evaluated via Expression.eval directly (no SparkSession), so
  * thousands of random cases run in milliseconds. Codegen equivalence to
  * eval is covered separately in VectorFunctionsSpec through real plans.
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic forAll: seeded Gen sampling (the offline cache has no
    * scalatest-scalacheck bridge; seeding also makes failures replayable). */
  private def forAll[A](g: Gen[A], n: Int = 500)(f: A => Unit): Unit =
    (0 until n).foreach { i => f(g.pureApply(Gen.Parameters.default, Seed(0x5eedL + i))) }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 500)(f: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      f(ga.pureApply(Gen.Parameters.default, Seed(0xaaL + i)),
        gb.pureApply(Gen.Parameters.default, Seed(0xbbL + i)))
    }

  private def forAll3[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C], n: Int = 500)(f: (A, B, C) => Unit): Unit =
    (0 until n).foreach { i =>
      f(ga.pureApply(Gen.Parameters.default, Seed(0xaaL + i)),
        gb.pureApply(Gen.Parameters.default, Seed(0xbbL + i)),
        gc.pureApply(Gen.Parameters.default, Seed(0xccL + i)))
    }

  private def sortedDistinct(xs: Seq[Long]): Array[Long] = xs.distinct.sorted.toArray

  private def litArr(xs: Array[Long]): Literal =
    Literal.create(ArrayData.toArrayData(xs), ArrayType(LongType))

  private val longSet = Gen.listOf(Gen.chooseNum(-50L, 50L)).map(sortedDistinct)

  test("SortedArrayIntersectSize == |A ∩ B| for random sorted sets") {
    forAll2(longSet, longSet) { (a, b) =>
      val expected = a.toSet.intersect(b.toSet).size
      val got = SortedArrayIntersectSize(litArr(a), litArr(b)).eval(null)
      assert(got == expected)
    }
  }

  test("JaccardAtLeast(t) agrees with exact jaccard for random sets and thresholds") {
    forAll3(longSet, longSet, Gen.chooseNum(0.0, 1.0)) { (a, b, t) =>
      val inter = a.toSet.intersect(b.toSet).size.toDouble
      val union = (a.length + b.length) - inter
      val jaccard = if (union == 0) 0.0 else inter / union
      val got = JaccardAtLeast(litArr(a), litArr(b), t).eval(null)
      // exact boundary ties go either way in float math; test off-boundary
      if (math.abs(jaccard - t) > 1e-9) {
        assert(got == (jaccard >= t), s"a=${a.toSeq} b=${b.toSeq} t=$t j=$jaccard")
      }
    }
  }

  private val floatVec = Gen.listOfN(8, Gen.chooseNum(-5.0f, 5.0f)).map(_.toArray)

  private def litVec(v: Array[Float]): Literal =
    Literal.create(ArrayData.toArrayData(v), ArrayType(FloatType))

  test("VectorDistance l2sq matches reference double accumulation") {
    forAll2(floatVec, floatVec) { (a, b) =>
      val expected = a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
      val got = VectorDistance(litVec(a), litVec(b), "l2sq").eval(null).asInstanceOf[Double]
      assert(math.abs(got - expected) < 1e-9)
    }
  }

  test("VectorDistance dot is symmetric and matches reference") {
    forAll2(floatVec, floatVec) { (a, b) =>
      val expected = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val ab = VectorDistance(litVec(a), litVec(b), "dot").eval(null).asInstanceOf[Double]
      val ba = VectorDistance(litVec(b), litVec(a), "dot").eval(null).asInstanceOf[Double]
      assert(math.abs(ab - expected) < 1e-9 && ab == ba)
    }
  }

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 2000)
    cs <- Gen.listOfN(n, Gen.frequency(
      (20, Gen.alphaLowerChar), (4, Gen.const(' ')), (1, Gen.const('.')),
      (1, Gen.const('!')), (1, Gen.const('\n'))))
  } yield cs.mkString

  test("chunker invariants: bounded size, non-blank, in-order coverage") {
    forAll(textGen) { text =>
      val chunks = Chunker.chunkText(text, 120, 20)
      if (text.length <= 120) {
        assert(chunks == Seq(text)) // whole and unstripped
      } else {
        chunks.foreach { c =>
          assert(c.length <= 120)
          assert(c.trim.nonEmpty)
          assert(text.contains(c)) // every chunk is a substring
        }
        // chunks appear in order: each chunk starts at or after the previous
        val starts = chunks.scanLeft(0) { (from, c) => text.indexOf(c, from) }.tail
        assert(starts.forall(_ >= 0))
        assert(starts == starts.sorted)
      }
    }
  }
}
