package graft.embed

/** WordPiece tokenizer — the tokenization the reference's
  * SentenceTransformer models use (uncased BERT vocab,
  * /root/reference/src/PDFToChromaIngester.py:43): basic tokenization
  * (lowercase, whitespace split, punctuation split-out) followed by
  * greedy longest-match subword segmentation with `##` continuation
  * pieces; a word with any unmatchable remainder becomes `[UNK]`.
  * Loaded from the standard `vocab.txt` (one token per line, line
  * number = id) that ships beside every BERT-family checkpoint.
  *
  * This is the id-emitting counterpart of the trained-BPE path
  * ([[graft.text.Bpe]]): BPE hashes learned subword STRINGS into the
  * embedding table (vocab-free), WordPiece maps them to the
  * checkpoint's OWN rows — required for pretrained weights, where row
  * order is part of the model.
  */
final case class WordPiece(vocab: Map[String, Int], lowercase: Boolean = true) {

  val unkId: Int = vocab.getOrElse("[UNK]",
    throw new IllegalArgumentException("vocab has no [UNK]"))
  val clsId: Int = vocab.getOrElse("[CLS]",
    throw new IllegalArgumentException("vocab has no [CLS]"))
  val sepId: Int = vocab.getOrElse("[SEP]",
    throw new IllegalArgumentException("vocab has no [SEP]"))

  /** `[CLS] pieces… [SEP]`, truncated to `maxLen` total ids. */
  def encode(text: String, maxLen: Int): Array[Int] = {
    val pieces = basicTokens(text).iterator.flatMap(wordIds).take(maxLen - 2).toArray
    (clsId +: pieces.toSeq :+ sepId).toArray
  }

  /** Basic tokenization, faithful to HF's BasicTokenizer for uncased
    * vocabs: lowercase + accent stripping (NFD, drop combining marks —
    * "café" must reach the vocab as "cafe", or every accented word
    * [UNK]s), whitespace split, each PUNCTUATION character its own
    * token (ASCII symbol ranges + Unicode P* categories — the HF
    * rule; non-punctuation symbols like '€' stay inside words), each
    * CJK ideograph its own token (CJK has no whitespace word
    * boundaries, so the vocab carries per-character pieces). */
  private[graft] def basicTokens(text: String): Seq[String] = {
    val t0 = if (lowercase) text.toLowerCase else text
    val t =
      if (!lowercase) t0
      else java.text.Normalizer.normalize(t0, java.text.Normalizer.Form.NFD)
        .filterNot(c => Character.getType(c) == Character.NON_SPACING_MARK)
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    def flush(): Unit = if (cur.nonEmpty) { out += cur.toString(); cur.clear() }
    t.foreach { c =>
      if (c.isWhitespace) flush()
      else if (isPunct(c) || isCjk(c)) { flush(); out += c.toString }
      else cur += c
    }
    flush()
    out.result()
  }

  /** HF's `_is_punctuation`: the four ASCII symbol runs (treated as
    * punctuation "for consistency" even where Unicode classes them as
    * symbols — `$`, `^`, backtick…) plus every Unicode P* category. */
  private def isPunct(c: Char): Boolean = {
    val cp = c.toInt
    (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
    (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126) || {
      val t = Character.getType(c)
      t == Character.DASH_PUNCTUATION || t == Character.START_PUNCTUATION ||
      t == Character.END_PUNCTUATION || t == Character.CONNECTOR_PUNCTUATION ||
      t == Character.OTHER_PUNCTUATION || t == Character.INITIAL_QUOTE_PUNCTUATION ||
      t == Character.FINAL_QUOTE_PUNCTUATION
    }
  }

  /** The ideograph ranges BERT's `_is_chinese_char` isolates (BMP
    * blocks only — kana are NOT split per-char, matching HF; the rare
    * supplementary-plane ideographs arrive as surrogate pairs and fall
    * through to the word path, where an out-of-vocab piece maps to
    * [UNK] as HF does). */
  private def isCjk(c: Char): Boolean =
    (c >= 0x4e00 && c <= 0x9fff) || (c >= 0x3400 && c <= 0x4dbf) ||
    (c >= 0xf900 && c <= 0xfaff)

  /** Greedy longest-match segmentation of one word. */
  private[graft] def wordIds(word: String): Seq[Int] = {
    if (word.length > 100) return Seq(unkId) // HF's max_input_chars_per_word
    val ids = Seq.newBuilder[Int]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var hit = -1
      while (end > start && hit < 0) {
        val piece = (if (start > 0) "##" else "") + word.substring(start, end)
        vocab.get(piece) match {
          case Some(id) => hit = id
          case None => end -= 1
        }
      }
      if (hit < 0) return Seq(unkId)
      ids += hit
      start = end
    }
    ids.result()
  }
}

object WordPiece {
  /** Load the standard `vocab.txt`: one token per line, id = line index. */
  def load(path: String): WordPiece = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path), java.nio.charset.StandardCharsets.UTF_8)
    val vocab = Map.newBuilder[String, Int]
    var i = 0
    lines.forEach { l => vocab += l.trim -> i; i += 1 }
    WordPiece(vocab.result())
  }
}
