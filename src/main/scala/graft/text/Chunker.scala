package graft.text

import scala.collection.mutable.ArrayBuffer

/** Sliding-window text chunker, semantics-equivalent to the reference
  * `chunk_text` (/root/reference/src/PDFToChromaIngester.py:94-124):
  *
  *   - text of length <= chunkSize is returned whole and UNstripped;
  *   - otherwise windows of `chunkSize` chars; if a sentence boundary
  *     (". ", "! ", "? ", "\n\n") *starts* at any position in the last
  *     `overlap` chars of the window, the window is cut just after the
  *     LAST such boundary (last-match-wins);
  *   - each emitted chunk is stripped; whitespace-only chunks are dropped
  *     but the cursor still advances;
  *   - the next window starts at `end - overlap`, so adjacent chunks share
  *     `overlap` raw chars.
  *
  * Pure JVM function (no Spark deps) so it unit-tests without a session;
  * exposed to DataFrames via a UDF in [[graft.ingest.IngestPipeline]].
  */
object Chunker {
  private val SentenceEnds: Array[String] = Array(". ", "! ", "? ", "\n\n")

  /** Python `str.strip()` analog: strips unicode whitespace from both ends
    * (Character.isWhitespace misses U+00A0-style spaces; isSpaceChar covers
    * them — Python's str.isspace is the union).
    */
  def pyStrip(s: String): String = {
    var from = 0
    var until = s.length
    @inline def isWs(c: Char) = Character.isWhitespace(c) || Character.isSpaceChar(c)
    while (from < until && isWs(s.charAt(from))) from += 1
    while (until > from && isWs(s.charAt(until - 1))) until -= 1
    if (from == 0 && until == s.length) s else s.substring(from, until)
  }

  def chunkText(text: String, chunkSize: Int = 600, overlap: Int = 50): Seq[String] = {
    if (text == null) return Seq.empty
    if (text.length <= chunkSize) return Seq(text)
    val chunks = new ArrayBuffer[String]
    var start = 0
    val n = text.length
    while (start < n) {
      var end = start + chunkSize
      if (end < n) {
        // scan [end-overlap, end); LAST boundary start wins
        var bestBreak = -1
        var i = end - overlap
        while (i < end) {
          var e = 0
          while (e < SentenceEnds.length) {
            val ending = SentenceEnds(e)
            if (i + ending.length <= n && text.regionMatches(i, ending, 0, ending.length))
              bestBreak = i + ending.length
            e += 1
          }
          i += 1
        }
        if (bestBreak != -1) end = bestBreak
      }
      // NOTE: when end >= n, `end` stays start+chunkSize (unclamped) — the
      // slice clamps but the cursor advance uses the unclamped value,
      // matching the reference's `start = end - overlap`.
      val sliceEnd = math.min(end, n)
      val chunk = pyStrip(text.substring(start, sliceEnd))
      if (chunk.nonEmpty) chunks += chunk
      start = end - overlap
    }
    chunks.toSeq
  }
}
