package graft

import graft.text.{Chunker, TextAnalysis}
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("bigram LM: predictable sequences score above unpredictable ones; singletons drop") {
    import spark.implicits._
    // build a corpus where "a b" dominates: docs repeating the pair are
    // high-probability, a doc of one-off tokens is low, a 1-token doc
    // contributes no bigram row
    val docs = (
      (1 to 8).map(i => (i.toLong, "a b a b a b a b")) ++
        Seq((100L, "q w e r t y u i"), (101L, "solo"))
    ).toDF("doc_id", "text")
    val res = GraftQueries.bigramLogProb(docs)
    val byId = res.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(!byId.contains(101L), "single-token doc has no bigram row")
    assert(byId(1L)._1 == 7L)
    assert(byId(1L)._2 > byId(100L)._2,
      s"repetitive ${byId(1L)._2} should outscore one-off ${byId(100L)._2}")
  }

  test("bm25: term hits rank above misses; rarer terms weigh more; absent query terms score 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark shuffle join merge"),          // has 'merge' (rare)
      (2L, "hash hash hash table lookup"),       // has 'hash' (common), high tf
      (3L, "hash table"),                        // has 'hash', short doc
      (4L, "completely unrelated words here"),   // no query terms
      (5L, "hash join plan")                     // has 'hash'
    ).toDF("doc_id", "text")
    val out = graft.text.TextAnalysis
      .bm25TopK(docs, "text", "doc_id", Seq("hash", "merge"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!out.contains(4L), "doc without query terms must score 0 and be filtered")
    assert(out.keySet == Set(1L, 2L, 3L, 5L))
    // 'merge' appears in 1/5 docs, 'hash' in 3/5 -> merge idf > hash idf;
    // doc 1's single rare term beats doc 5's single common term
    assert(out(1L) > out(5L), s"rare-term doc should outrank common-term doc: $out")
    // higher tf of the same term in a comparable doc -> higher score
    assert(out(2L) > out(5L), s"tf saturation should still order 2 above 5: $out")
  }
  import spark.implicits._

  test("percolate: all-terms match, repeated tokens count once, loud refusals") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha alpha alpha"),      // repeats must not fake a 2-term hit
      (3L, "beta gamma delta"),
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.percolate(docs, "text", "doc_id", Seq(
        "q_ab" -> Seq("alpha", "beta"),
        "q_a_dup" -> Seq("alpha", "alpha"), // dup in the QUERY folds to 1 term
        "q_none" -> Seq("zeta")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("q_ab", 1L), ("q_a_dup", 1L), ("q_a_dup", 2L)),
      s"got $out")
    intercept[IllegalArgumentException] {
      TextAnalysis.percolate(docs, "text", "doc_id",
        Seq("q" -> Seq("a"), "q" -> Seq("b")))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.percolate(docs, "text", "doc_id", Seq("q" -> Nil))
    }
  }

  test("bm25DynamicTopK tracks the literal-pivot form: same ranking, <=1e-6/term score drift") {
    val docs = Tables.documents(spark, sf)
    val terms = Seq("filter", "vector", "sort")
    val lit = TextAnalysis.bm25TopK(docs, "text", "doc_id", terms, k = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val dyn = TextAnalysis.bm25DynamicTopK(docs, "text", "doc_id", terms, k = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(lit.nonEmpty && lit.length == dyn.length)
    // the fixed-point formulation rounds each term partial at 1e-6 (the
    // literal form rounds once at 1e-4) — scores may drift below that,
    // rankings should agree except at sub-rounding near-ties
    val drift = lit.map(_._1).zip(dyn.map(_._1)).count { case (a, b) => a != b }
    assert(drift <= 2, s"rankings diverged at $drift positions")
    val litById = lit.toMap
    dyn.foreach { case (id, s) =>
      litById.get(id).foreach(ls =>
        assert(math.abs(ls - s) <= 1e-4 + terms.length * 1e-6,
          s"doc $id score drifted: $ls vs $s"))
    }
  }

  test("prfSearch: mExpand=0 degenerates to the dynamic seed search; expansion changes the answer") {
    val docs = Tables.documents(spark, sf)
    val seeds = Seq("vector", "query")
    val noExp = TextAnalysis.prfSearch(docs, "text", "doc_id", seeds,
      k = 12, nSeed = 10, mExpand = 0).collect().toSeq
    val direct = TextAnalysis.bm25DynamicTopK(docs, "text", "doc_id", seeds,
      k = 12).collect().toSeq
    assert(noExp == direct, "mExpand=0 must be exactly the seed search")
    val expanded = TextAnalysis.prfSearch(docs, "text", "doc_id", seeds,
      k = 12, nSeed = 10, mExpand = 3).collect().toSeq
    assert(expanded != direct, "3 expansion terms changed nothing — fixture too weak")
  }

  test("percolate join form == stateless expression form on the corpus") {
    val docs = Tables.documents(spark, sf)
    val qs = Seq(
      "q_joins" -> Seq("join", "merge"),
      "q_vector" -> Seq("vector", "scan"),
      "q_dup" -> Seq("batch", "batch"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val joined = rows(TextAnalysis.percolate(docs, "text", "doc_id", qs))
    val expr = rows(TextAnalysis.percolateExpr(docs, "text", "doc_id", qs))
    assert(joined == expr, "the two percolate forms diverged")
    assert(joined.nonEmpty, "percolate fixture matched nothing")
  }

  test("pyStrip matches python str.strip semantics incl. nbsp") {
    assert(Chunker.pyStrip("  ab c  ") == "ab c")
    assert(Chunker.pyStrip("\t\nx\r\n") == "x")
    assert(Chunker.pyStrip(" y ") == "y")
    assert(Chunker.pyStrip("   ") == "")
    assert(Chunker.pyStrip("") == "")
  }

  test("textStats computes token counts and ratios") {
    val df = Seq((1, "the cat sat, the cat ran.")).toDF("doc_id", "text")
    val r = TextAnalysis.textStats(df).collect().head
    assert(r.getAs[Int]("n_tokens") == 6)
    assert(math.abs(r.getAs[Double]("uniq_token_ratio") - 0.666667) < 1e-6)
    assert(r.getAs[Double]("punct_ratio") > 0)
  }

  test("langId picks profile with most hits, und when none") {
    val df = Seq(
      (1, "the cat and the dog"),
      (2, "el perro y la casa de los gatos"),
      (3, "xyzzy qwerty")
    ).toDF("id", "text")
    val out = df.select($"id", TextAnalysis.langId($"text").as("p")).as[(Int, String)].collect().toMap
    assert(out(1) == "en")
    assert(out(2) == "es")
    assert(out(3) == "und")
  }

  test("token-set fingerprint is order and duplication invariant") {
    val df = Seq((1, "b a c a"), (2, "c b a"), (3, "a b d")).toDF("id", "text")
    val fps = df.select($"id", TextAnalysis.tokenSetFingerprint($"text").as("f"))
      .as[(Int, String)].collect().toMap
    assert(fps(1) == fps(2))
    assert(fps(1) != fps(3))
  }

  test("winnow fingerprints: dup-invariance and shift tolerance") {
    val a = TextAnalysis.winnow("the quick brown fox jumps over the lazy dog")
    val b = TextAnalysis.winnow("the quick brown fox jumps over the lazy dog")
    assert(a.sameElements(b))
    assert(a.nonEmpty)
    // prefix edit preserves most selected hashes (winnowing locality)
    val c = TextAnalysis.winnow("xx the quick brown fox jumps over the lazy dog")
    val overlap = a.toSet.intersect(c.toSet).size.toDouble / a.length
    assert(overlap > 0.6, s"winnow overlap $overlap")
    // short strings
    assert(TextAnalysis.winnow("abc", k = 7).isEmpty)
    assert(TextAnalysis.winnow(null).isEmpty)
  }

  test("charNgrams produces n-grams in order") {
    val out = spark.range(1).select(
      TextAnalysis.charNgrams(lit("abcde"), 3).as("g")).as[Seq[String]].head()
    assert(out == Seq("abc", "bcd", "cde"))
  }

  test("stripHtml: scripts/styles/comments dropped wholesale, tags break words, entities decode once") {
    val cases = Seq(
      // script content (incl. a bare '<') is NOT text
      ("<p>a</p><script>if (1 < 2) alert('<div>')</script><p>b</p>", "a b"),
      ("<style>p { color: red; }</style>hello", "hello"),
      ("<!-- secret --><b>kept</b>", "kept"),
      // adjacent block tags must not glue words together
      ("<p>one</p><p>two</p>", "one two"),
      // entity decode is single-pass: &amp;lt; is the TEXT "&lt;"
      ("a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39; f&nbsp;g &amp;lt;", """a & b <c> "d" 'e' f g &lt;"""),
      // attributes and self-closing tags vanish; whitespace collapses
      ("""<img src="x.png"/>  <a href="/y">link</a>""", "link"),
      // case-insensitive script/style
      ("<SCRIPT>x</SCRIPT>ok<STYLE>y</STYLE>", "ok"))
    val out = cases.zipWithIndex.map { case ((in, _), i) => (i, in) }
      .toDF("i", "html")
      .select(col("i"), graft.text.Html.stripHtml(col("html")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(out(i) == want, s"case $i: <<$in>> -> <<${out(i)}>> want <<$want>>")
    }
  }

  test("packConcatChunks: hand-computed boundary straddle") {
    // shard a: docs of 3, 4, 2 tokens, L=4 -> stream [0,9):
    //   seq 0 = doc1(3) + doc2(1), seq 1 = doc2(3) + doc3(1), seq 2 = doc3(1)
    val docs = Seq(
      ("a", 1L, "w w w"), ("a", 2L, "x x x x"), ("a", 3L, "y y"),
      ("b", 4L, "z z z z z")) // [0,5): seq 0 full, seq 1 = 1 token
      .toDF("source", "doc_id", "text")
    val out = TextAnalysis.packConcatChunks(docs, "text", "doc_id", "source", 4)
      .orderBy("source", "seq_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("a", 0L, 2L, 4L, 1L, 2L),
      ("a", 1L, 2L, 4L, 2L, 3L),
      ("a", 2L, 1L, 1L, 3L, 3L),
      ("b", 0L, 1L, 4L, 4L, 4L),
      ("b", 1L, 1L, 1L, 4L, 4L)))
  }

  test("packConcatChunks: every sequence exactly L tokens except each shard's last; lossless") {
    val docs = Tables.documents(spark, sf)
    val L = 512
    val packed = TextAnalysis.packConcatChunks(docs, "text", "doc_id", "source", L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val totalTokens = docs.select(sum(size(TextAnalysis.tokens(col("text")))
      .cast("long"))).head.getLong(0)
    assert(packed.map(_._4).sum == totalTokens) // no token lost or doubled
    packed.groupBy(_._1).foreach { case (src, seqs) =>
      val sorted = seqs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.length.toLong).toSeq,
        s"$src: seq gap")
      sorted.dropRight(1).foreach { q =>
        assert(q._4 == L.toLong, s"$src seq ${q._2}: ${q._4} != $L")
      }
      assert(sorted.last._4 <= L.toLong && sorted.last._4 > 0)
    }
  }

  test("packSequences: lossless partition of each shard into budgeted sequences") {
    val docs = Tables.documents(spark, sf)
    val budget = 512
    val packed = TextAnalysis.packSequences(docs, "text", "doc_id", "source", budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // every doc lands in exactly one sequence; no tokens lost
    val totalDocs = docs.count()
    assert(packed.map(_._3).sum == totalDocs)
    val totalTokens = docs.select(sum(size(TextAnalysis.tokens(col("text")))
      .cast("long"))).head.getLong(0)
    assert(packed.map(_._4).sum == totalTokens)
    packed.groupBy(_._1).foreach { case (src, seqs) =>
      val sorted = seqs.sortBy(_._2)
      // doc-id ranges of consecutive sequences are ordered and disjoint
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5, s"$src: overlap $a $b")
        case _ => ()
      }
      // greedy rule: every sequence except the shard's last is filled to
      // the budget boundary (its token span crosses the next boundary)
      sorted.dropRight(1).zip(sorted.tail).foreach { case (a, b) =>
        assert(b._2 > a._2)
      }
    }
  }

  test("domain cap: <= 20 per source, best-quality-first, WindowGroupLimit plan") {
    val out = GraftQueries.all("sample_domain_cap")(spark, sf)
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the rank filter must pre-prune map-side: a mega-domain ships its
    // local top-20 per task into the shuffle, never its whole corpus
    assert(p.contains("WindowGroupLimit"), s"cap filter not group-limited:\n$p")
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).foreach { case (src, grp) =>
      assert(grp.length <= 20, s"$src over cap")
      val ranks = grp.map(_.getLong(3)).sorted.toSeq
      assert(ranks == (1L to grp.length).toSeq, s"$src ranks not contiguous")
      // quality non-increasing in rank order
      val byRank = grp.sortBy(_.getLong(3)).map(_.getDouble(2))
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a >= b, s"$src quality not sorted")
        case _ => ()
      }
    }
  }
}
