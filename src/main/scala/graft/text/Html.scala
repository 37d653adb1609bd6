package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for web payloads (the step between the WARC
  * source's HTTP bodies and the documents pipeline — Common Crawl's
  * WET-file derivation, reduced to its deterministic core).
  *
  * Deliberately COLUMN-LEVEL: a chain of `regexp_replace`/`replace`
  * expressions, fully inside codegen, one pass per rule — no UDF, no
  * DOM parse. Every pattern is written in the RE2-compatible subset
  * (no backreferences, no lookaround; inline `(?is)` flags only), so a
  * SQL engine can run the IDENTICAL chain — which is how the oracle
  * checks it. A DOM parser handles pathological markup better, but for
  * bulk corpus work the regex chain is what production WET extractors
  * actually do, and determinism + twin-ability are the contract here.
  *
  * Rules, in order (order is load-bearing):
  *   1. drop <script>...</script> and <style>...</style> wholesale
  *      (their CONTENT is not text; two rules — RE2 has no backrefs);
  *   2. drop <!-- comments -->;
  *   3. every remaining tag → one space (word boundary, so
  *      `<p>a</p><p>b</p>` keeps a/b apart);
  *   4. decode the six entities that dominate real corpora
  *      (&lt; &gt; &quot; &#39; &nbsp;, and &amp; LAST so
  *      `&amp;lt;` decodes to the literal text `&lt;`, not `<`);
  *   5. collapse whitespace runs to single spaces and trim.
  */
object Html {

  /** The tag/entity strip chain over an HTML string column. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", "")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", "")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(ent, "\\s+", " "))
  }
}
