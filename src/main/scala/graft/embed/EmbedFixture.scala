package graft.embed

/** The deterministic corpus behind the `ingest_embed_fixture` gate —
  * ONE definition shared by the gate query and the fixture generator
  * (`GenHashEmbedFixture`), so they cannot diverge.
  *
  * 100 synthetic texts derived purely from the text id (no table, no
  * SF dependence): 3-7 tokens each, token shapes like `tok42x7` so the
  * [[HashEmbedder]] kernel's every code path runs — word hashing, sign
  * bits, char 3-grams (tokens are >= 6 chars), repeated tokens across
  * texts (collisions accumulate), and the final L2 normalization. The
  * checked-in fixture pins the resulting embedding VALUES at 2^20
  * fixed point; any drift in FNV-1a, tokenization, 3-gram windows, or
  * normalization order hash-mismatches the gate. */
object EmbedFixture {
  def texts: Seq[(Long, String)] = (0L until 100L).map { i =>
    val words = (0 until (3 + (i % 5)).toInt).map { j =>
      s"tok${(i * 31 + j * 7) % 97}x${(i + j) % 13}"
    }
    (i, words.mkString(" "))
  }
}
