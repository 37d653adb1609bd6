package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer — the trainer AND the encoder
  * (Sennrich et al. 2016), completing the tokenizer story begun by
  * text_bpe_merges (which reports only the first iteration's pair
  * stats).
  *
  * Scale design: the trainer never iterates over the corpus. One
  * distributed pass builds the WORD-FREQUENCY table (the standard BPE
  * trainer substrate), capped to the `vocabCap` most frequent words —
  * the same bounded-collect discipline as the unigram-LM vocabulary —
  * and the greedy merge loop runs driver-side over that bounded table.
  * Encoding is a per-row JVM kernel (a tight loop over tiny arrays;
  * the merge ranks ride inside the UDF closure like the minhash band
  * kernel) — iterative merging is not expressible as a built-in
  * expression chain.
  */
object Bpe {

  /** Word pattern shared with text_bpe_tokens: letter runs, digit runs,
    * single other-symbols. */
  val WordPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def words(text: Column): Column =
    regexp_extract_all(lower(text), lit(WordPattern), lit(0))

  /** Learn `numMerges` merges. Deterministic: ties in pair frequency
    * break lexicographically; the word-freq cap orders by (count desc,
    * word) like the LM vocab. */
  def train(docs: DataFrame, textCol: String,
            numMerges: Int = 50, vocabCap: Int = 50000): Seq[(String, String)] = {
    val wordFreq: Seq[(String, Long)] = graft.Tables.spread(docs)
      .select(explode(words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    var vocab: Seq[(Array[String], Long)] =
      wordFreq.map { case (w, c) => (codePointSymbols(w), c) }
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, c) => (mergePair(syms, best), c) }
        i += 1
      }
    }
    merges.result()
  }

  /** One left-to-right pass merging every occurrence of `pair`. */
  private def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += syms(j) + syms(j + 1); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Initial symbols are CODE POINTS, not UTF-16 units — char-level
    * splitting would shear surrogate pairs into malformed half-surrogate
    * symbols on astral-plane text (emoji, CJK-B) and break the
    * n_subwords <= code-point-length invariant (Spark's `length` counts
    * code points). */
  private def codePointSymbols(word: String): Array[String] =
    word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Encode one word: start from code-point symbols, repeatedly apply
    * the LOWEST-RANK merge present until none applies. */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms = codePointSymbols(word)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var j = 0
      while (j < syms.length - 1) {
        val r = rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(j), syms(j + 1)) }
        j += 1
      }
      if (best == null) continue = false
      else syms = mergePair(syms, best)
      if (syms.length < 2) continue = false
    }
    syms
  }

  /** Subword sequence for a whole document's word array. */
  def encodeUdf(merges: Seq[(String, String)]): UserDefinedFunction = {
    val rank = merges.zipWithIndex.toMap
    udf { (ws: Seq[String]) => ws.flatMap(w => encodeWord(w, rank)) }
  }

  /** Per-doc encoding report: (idCol, n_words, n_subwords, n_chars_tok,
    * compression) — compression = subwords per word, floor-rounded. */
  def encodeReport(docs: DataFrame, textCol: String, idCol: String,
                   merges: Seq[(String, String)]): DataFrame = {
    val enc = encodeUdf(merges)
    graft.Tables.spread(docs)
      .select(col(idCol), words(col(textCol)).as("_w"))
      .filter(size(col("_w")) > 0)
      .withColumn("_sub", enc(col("_w")))
      .select(col(idCol),
        size(col("_w")).cast("long").as("n_words"),
        size(col("_sub")).cast("long").as("n_subwords"),
        aggregate(transform(col("_w"), w => length(w).cast("long")),
          lit(0L), (a, x) => a + x).as("n_chars_tok"))
      .withColumn("compression",
        floor(col("n_subwords").cast("double") / col("n_words") * 1e6 + 0.5) / 1e6)
  }
}
