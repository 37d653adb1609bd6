package graft

import graft.text.Chunker.chunkText
import org.scalatest.funsuite.AnyFunSuite

/** Chunker ground-truth fixtures (SURVEY §5.3 — outputs computed by
  * executing the reference chunk_text verbatim) + seeded property checks
  * (the scalatest/scalacheck bridge isn't on the offline classpath, so the
  * generators are hand-rolled with a fixed seed).
  */
class ChunkerSpec extends AnyFunSuite {

  test("text <= chunk_size returned whole and unstripped") {
    assert(chunkText("abc") == Seq("abc"))
    assert(chunkText("  padded  ") == Seq("  padded  "))
    assert(chunkText("x" * 600) == Seq("x" * 600))
  }

  test("sentence boundary in scan window cuts after the boundary") {
    val text = ("A" * 595) + ". " + ("B" * 600)
    val out = chunkText(text)
    assert(out.map(_.length) == Seq(596, 600, 100))
    assert(out.head == ("A" * 595) + ".") // trailing space stripped
  }

  test("no boundaries: hard cuts with 50-char overlap") {
    val out = chunkText("x" * 1250)
    assert(out.map(_.length) == Seq(600, 600, 150))
  }

  test("last boundary wins when several in window") {
    // ". " at 560, "! " at 580 (both inside [550, 600) scan window)
    val text = ("a" * 560) + ". " + ("b" * 18) + "! " + ("c" * 300)
    val out = chunkText(text)
    // cut lands after "! " (raw end 582); trailing space stripped -> 581
    assert(out.head.length == 581)
    assert(out.head.endsWith("!"))
  }

  test("whitespace-only window dropped but cursor advances") {
    val text = ("F" * 600) + (" " * 200) + ("G" * 600)
    val out = chunkText(text)
    assert(out.map(_.length) == Seq(600, 600, 300))
  }

  test("601 chars splits [600, 51]") {
    assert(chunkText("y" * 601).map(_.length) == Seq(600, 51))
  }

  test("exactly 600 chars stays one chunk") {
    assert(chunkText("z" * 600).size == 1)
  }

  private def randomTexts(n: Int): Seq[String] = {
    val rng = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnopqrstuvwxyz    .!?\n"
    (0 until n).map { _ =>
      val len = rng.nextInt(3000)
      (0 until len).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    }
  }

  test("property: no chunk exceeds chunk_size; chunks non-blank for long input") {
    randomTexts(200).foreach { t =>
      val out = chunkText(t)
      assert(out.forall(_.length <= 600))
      if (t.length > 600) assert(out.forall(_.trim.nonEmpty))
      if (t.length <= 600) assert(out == Seq(t))
    }
  }

  test("property: chunk coverage — every non-ws char count is preserved or grown by overlap") {
    randomTexts(200).foreach { t =>
      if (t.length > 600) {
        // windows tile the input with 50-char overlap, so the concatenated
        // chunks must contain at least every non-whitespace char once
        val joined = chunkText(t).mkString
        assert(joined.count(c => !c.isWhitespace) >= t.count(c => !c.isWhitespace))
      }
    }
  }
}
