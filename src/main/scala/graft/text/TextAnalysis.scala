package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM training-data pipeline:
  * tokenization, quality scoring, language-ID, fingerprinting.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no Scala UDFs), so whole-stage codegen covers the full pipeline and the
  * same logic is expressible in ANSI SQL for the DuckDB oracle.
  */
object TextAnalysis {

  /** Whitespace tokenization of trimmed, lowercased text. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Tiny per-language stopword profiles for the heuristic language-ID.
    * Deterministic and SQL-expressible; real corpora would use char
    * n-gram profiles (see [[charNgrams]]) — the scoring shape is the same.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "zh" -> Seq("的", "了", "是", "我", "不"),
  )

  /** Number of tokens that appear in `words` (built-ins only). */
  def profileScore(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  /** Predicted language: argmax of profile scores; ties break by profile
    * order (en first); all-zero scores → "und" (undetermined).
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangProfiles.map { case (lang, ws) => lang -> profileScore(toks, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first-match-wins on ties, profile order = priority order
    scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Character n-grams of the raw text (for fingerprinting / shingling). */
  def charNgrams(text: Column, n: Int): Column =
    transform(sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => substring(text, i, lit(n))) // substr is 1-based

  /** Per-document text statistics + quality score.
    * Columns: n_chars, n_tokens, avg_token_len, punct_ratio, stopword_ratio,
    * uniq_token_ratio, quality.
    */
  def textStats(df0: DataFrame, textCol: String = "text"): DataFrame = {
    val df = graft.Tables.spread(df0) // tokenize must not run serially on a narrow scan
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks)
    val nChars = length(t)
    val punct = nChars - length(regexp_replace(t, "[\\.,;:!\\?]", ""))
    val stop = profileScore(toks, LangProfiles.head._2)
    val tokLenSum = aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
    // quality is computed from the UNrounded ratios: rounding intermediates
    // to 6 decimals and then scaling by 0.3 manufactures exact decimal
    // half-cases at the 6th digit, where Spark (binary-expansion HALF_UP)
    // and other engines (scaled std::round) disagree.
    val punctRatio = punct.cast("double") / nChars
    val uniqRatio = size(array_distinct(toks)).cast("double") / nTok
    df.withColumn("n_tokens", nTok)
      .withColumn("avg_token_len", round(tokLenSum.cast("double") / nTok, 6))
      .withColumn("punct_ratio", round(punctRatio, 6))
      .withColumn("stopword_ratio", round(stop.cast("double") / nTok, 6))
      .withColumn("uniq_token_ratio", round(uniqRatio, 6))
      .withColumn("quality",
        // floor(x*1e6+0.5)/1e6 instead of round(): pure IEEE ops, so any
        // engine computing the same double input rounds identically (the
        // weighted sum of rationals CAN terminate exactly on a decimal
        // half, where round() implementations legitimately diverge)
        floor(least(lit(1.0),
          (lit(0.4) * least(nTok.cast("double") / 50.0, lit(1.0))) +
          (lit(0.3) * (lit(1.0) - punctRatio)) +
          (lit(0.3) * uniqRatio)) * 1e6 + 0.5) / 1e6)
  }

  /** Token n-grams (word shingles) as joined strings — tokens are
    * whitespace-split so the space separator is unambiguous, and string
    * grams keep the oracle expressible (nested-list distinct isn't
    * portable). */
  def tokenNgrams(toks: Column, n: Int): Column =
    filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => when(size(slice(toks, i + 1, lit(n))) === n,
          array_join(slice(toks, i + 1, lit(n)), " "))),
      g => g.isNotNull)

  /** Repetition ratio — the Gopher-style repetition filter signal:
    * 1 - distinct_ngrams/total_ngrams over token n-grams. 0 = no repeated
    * n-gram; high values flag boilerplate/spam.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val grams = tokenNgrams(tokens(text), n)
    when(size(grams) === 0, 0.0).otherwise(
      round(lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams), 6))
  }

  /** Deterministic content fingerprint: md5 over the sorted distinct token
    * set — invariant to token order and duplication, so re-shuffled or
    * re-padded documents collide. SQL-expressible for the oracle.
    */
  def tokenSetFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Karp-Rabin rolling-hash winnowing fingerprint (pure JVM; the classic
    * MOSS scheme): hash every k-gram with a polynomial rolling hash, then
    * keep the minimum hash of each window of w consecutive k-gram hashes
    * (rightmost-min). Returns the distinct selected hashes, sorted.
    */
  def winnow(text: String, k: Int = 7, w: Int = 4): Array[Long] = {
    if (text == null || text.length < k) return Array.empty
    val Base = 257L
    val Mod = (1L << 61) - 1
    def mulmod(a: Long, b: Long): Long = {
      // 61-bit modulus keeps a*b within 122 bits; use Math.multiplyHigh
      val hi = Math.multiplyHigh(a, b)
      val lo = a * b
      // fold 2^64 ≡ 2^3 (mod 2^61-1): (hi<<3 | lo>>>61) + (lo & Mod)
      var r = ((hi << 3) | (lo >>> 61)) + (lo & Mod)
      if (r >= Mod) r -= Mod
      r
    }
    val n = text.length
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    var h = 0L
    var pow = 1L // Base^(k-1)
    var i = 0
    while (i < k) {
      h = (mulmod(h, Base) + text.charAt(i)) % Mod
      if (i < k - 1) pow = mulmod(pow, Base)
      i += 1
    }
    hashes(0) = h
    i = 1
    while (i < nGrams) {
      h = (h - mulmod(text.charAt(i - 1), pow) % Mod + Mod) % Mod
      h = (mulmod(h, Base) + text.charAt(i + k - 1)) % Mod
      hashes(i) = h
      i += 1
    }
    if (nGrams <= w) return Array(hashes.min)
    val out = scala.collection.mutable.SortedSet.empty[Long]
    i = 0
    while (i + w <= nGrams) {
      var m = hashes(i)
      var j = i + 1
      while (j < i + w) { if (hashes(j) <= m) m = hashes(j); j += 1 }
      out += m
      i += 1
    }
    out.toArray
  }

  /** BM25 ranking (Robertson / Lucene +1 idf form) of the corpus against a
    * small literal query-term set — the keyword half of hybrid retrieval
    * (rag_hybrid_search's term-hit score is the cruder cousin).
    *
    * ONE corpus scan (r5 had two — the scoring pass recomputed the whole
    * tokenize+tf lineage under a crossJoin(broadcast(stats))), codegen'd,
    * zero UDFs:
    *  1. the scan tokenizes and reduces each doc to the COMPACT per-doc
    *     projection (id, dl, tf per term) — 2+|terms| longs per doc, tiny
    *     next to the text — persisted MEMORY_AND_DISK;
    *  2. corpus statistics (N, total token count, per-term document
    *     frequencies — a SINGLE row) aggregate off the compact cache and
    *     are inlined into the scoring expression as literals;
    *  3. scoring + distributed top-k (TakeOrderedAndProject) also read
    *     the cache; the ≤k result rows are collected and returned as an
    *     eager local relation so the cache is unpersisted BEFORE
    *     returning — no cached relation outlives the call (the
    *     mix-report discipline).
    * At 100 TB the text is read once; the cached projection is ~40×
    * smaller than the corpus at k terms and spills to disk if it must.
    * The arithmetic is written expression-for-expression like the DuckDB
    * oracle so the double math is bit-identical cross-engine (floor-form
    * rounding per parity rules); literal inlining keeps the same
    * expression tree shape (long literals in place of long columns), so
    * results are unchanged.
    */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val withTf = bm25TfProjection(docs, textCol, idCol, terms)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val statsRow = bm25Stats(withTf, terms)
      val topk = bm25ScoreTopK(withTf, statsRow, idCol, terms, k, k1, b)
      val rows = topk.collect()
      docs.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), topk.schema)
    } finally withTf.unpersist()
  }

  /** Percolation — REVERSE search (the standing-query/alerting half of
    * an ingest pipeline): a registered set of term queries is matched
    * against an incoming document batch; a query matches a document when
    * the document contains EVERY one of the query's terms. Registered
    * queries are few and fixed while documents stream through, so the
    * (q_id, term) relation broadcasts and matching is ONE map-side pass
    * over the tokenized batch: distinct doc terms explode, hash against
    * the broadcast query terms, and a per-(query, doc) distinct-hit
    * count equal to the query's term count is a match. The shuffle
    * carries only (q_id, doc_id) hit rows — O(hits), never the corpus
    * text. Returns (q_id, doc_id, n_terms), one row per match. */
  def percolate(docs: DataFrame, textCol: String, idCol: String,
                queries: Seq[(String, Seq[String])]): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "percolate: every registered query needs a non-empty term set")
    require(queries.map(_._1).distinct.length == queries.length,
      "percolate: duplicate query ids")
    val sp = docs.sparkSession
    import sp.implicits._
    val qRel = queries.flatMap { case (q, ts) =>
      val d = ts.distinct
      d.map(t => (q, t, d.length.toLong))
    }.toDF("q_id", "term", "n_terms")
    val docTerms = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(tokens(col(textCol)))).as("term"))
    docTerms.join(broadcast(qRel), Seq("term"))
      .groupBy("q_id", "doc_id")
      .agg(count(lit(1)).as("_n_hit"), max(col("n_terms")).as("n_terms"))
      .filter(col("_n_hit") === col("n_terms"))
      .select("q_id", "doc_id", "n_terms")
  }

  /** BM25 over a DYNAMIC term set — terms known only at runtime (query
    * expansion, user queries, data-derived term lists), where
    * [[bm25TopK]]'s literal per-term expression pivot cannot be built at
    * plan-author time. Determinism needs care: a per-doc float sum via
    * groupBy would depend on Spark's partial-agg merge order, so each
    * (doc, term) partial is floor-rounded to a 1e-6 FIXED-POINT LONG and
    * the per-doc reduce sums integers (associative — any merge order,
    * any engine, same bits). Scores differ from [[bm25TopK]] only below
    * 1e-6 per term; the arithmetic inside the partial is the same
    * expression chain, and the whole formulation is mirrored
    * relationally by the gate oracle.
    *
    * Scale shape: one corpus-stats scan (two O(1) numbers), one
    * tokenize scan joined map-side against the (bounded, broadcast)
    * term relation; the shuffle carries (doc, term, tf) hit rows only.
    * df is relational (term-keyed broadcast join) — no driver collect
    * grows with the term set. */
  def bm25DynamicTopK(docs: DataFrame, textCol: String, idCol: String,
                      terms: Seq[String], k: Int,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25DynamicTopK: empty term set")
    val sp = docs.sparkSession
    import sp.implicits._
    val spread = graft.Tables.spread(docs)
      .select(col(idCol).as("doc_id"),
        tokens(coalesce(col(textCol), lit(""))).as("_toks"))
    val statsRow = spread
      .agg(count(lit(1)), coalesce(sum(size(col("_toks")).cast("long")), lit(0L)))
      .head
    val (nDocs, sumDl) = (statsRow.getLong(0), statsRow.getLong(1))
    require(nDocs > 0, "bm25DynamicTopK: empty corpus")
    val termRel = terms.distinct.toDF("term")
    val tf = spread
      .select(col("doc_id"), size(col("_toks")).cast("long").as("dl"),
        explode(col("_toks")).as("term"))
      .join(broadcast(termRel), Seq("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = lit(sumDl).cast("double") / lit(nDocs)
    val tfD = col("tf").cast("double")
    val idf = log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val partial = idf * (tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    tf.join(broadcast(dfRel), Seq("term"))
      .withColumn("_fp", floor(partial * 1e6 + 0.5).cast("long"))
      .groupBy("doc_id")
      .agg(max(col("dl")).as("dl"), sum(col("_fp")).as("_sfp"))
      .withColumn("bm25", col("_sfp").cast("double") / 1e6)
      .filter(col("bm25") > 0)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
      .select("doc_id", "dl", "bm25")
  }

  /** Pseudo-relevance-feedback search (Rocchio-style expansion): run the
    * seed query, harvest the `mExpand` most document-frequent NEW terms
    * from the top-`nSeed` hits (tiebreak term-ascending), and re-search
    * with the expanded term set through [[bm25DynamicTopK]] (the terms
    * are data-derived — exactly the dynamic-term case). The expansion
    * harvest touches only the ≤ nSeed hit documents (broadcast id join,
    * bounded term relation); the whole chain — seed ranking, harvest,
    * expanded scoring — is one static SQL statement for the oracle. */
  def prfSearch(docs: DataFrame, textCol: String, idCol: String,
                seedTerms: Seq[String], k: Int, nSeed: Int = 10,
                mExpand: Int = 3): DataFrame = {
    require(seedTerms.nonEmpty, "prfSearch: empty seed term set")
    require(nSeed >= 1 && mExpand >= 0, "prfSearch: nSeed >= 1, mExpand >= 0")
    val seed = bm25TopK(docs, textCol, idCol, seedTerms.distinct, nSeed)
      .select(col(idCol).as("_hit_id"))
    val expansion = docs
      .join(broadcast(seed), col(idCol) === col("_hit_id"))
      .select(explode(array_distinct(tokens(coalesce(col(textCol), lit(""))))).as("term"))
      .filter(!col("term").isin(seedTerms.distinct: _*))
      .groupBy("term").agg(count(lit(1)).as("_dfh"))
      .orderBy(col("_dfh").desc, col("term"))
      .limit(mExpand)
      .collect().map(_.getString(0)).toSeq // bounded: mExpand rows
    bm25DynamicTopK(docs, textCol, idCol, seedTerms.distinct ++ expansion, k)
  }

  /** Stateless expression form of [[percolate]]: matching as a pure
    * per-row projection — one `array_contains` conjunction per
    * registered query over the row's token set, matched ids exploded
    * out. No join, no shuffle, NO STATE — the form a streaming ingest
    * runs (append mode, zero watermark), and the fastest batch form
    * while the query set is small. The join form stays the scale path
    * for LARGE registered-query sets (this one's codegen width grows
    * with Σ query terms). Same output contract as [[percolate]];
    * equality of the two forms is spec-pinned. */
  def percolateExpr(docs: DataFrame, textCol: String, idCol: String,
                    queries: Seq[(String, Seq[String])]): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "percolateExpr: every registered query needs a non-empty term set")
    require(queries.map(_._1).distinct.length == queries.length,
      "percolateExpr: duplicate query ids")
    val toks = tokens(col(textCol))
    val matched = array(queries.map { case (q, ts) =>
      val d = ts.distinct
      when(d.map(t => array_contains(toks, lit(t))).reduce(_ && _),
        struct(lit(q).as("q_id"), lit(d.length.toLong).as("n_terms")))
    }: _*)
    docs.select(col(idCol).as("doc_id"),
        explode(filter(matched, x => x.isNotNull)).as("_m"))
      .select(col("_m.q_id"), col("doc_id"), col("_m.n_terms"))
  }

  /** Curriculum ordering — easy-to-hard phases (quality NTILE with
    * doc-id ties) and a deterministic md5 shuffle WITHIN each phase,
    * emitted as a materialized 1-based global `emit_rank`: the
    * training-order product of a curriculum-learning pipeline.
    *
    * SCALE-SAFE by construction: both global orders are distributed
    * range sorts + per-partition offset arithmetic
    * ([[graft.operators.GlobalRank]]), and the NTILE phase split is
    * integer arithmetic on the first global rank — no partitionless
    * window anywhere in the plan (spec-pinned), so no task ever holds
    * more than its partition. Input should be the slim (id, quality)
    * projection — the two ranking passes each materialize their frame
    * once (the GlobalRank checkpoint discipline). */
  def curriculumOrder(scored: DataFrame, qualityCol: String, idCol: String,
                      phases: Int = 4): DataFrame = {
    import graft.operators.GlobalRank
    val (ranked, n) = GlobalRank.withGlobalRowNumberAndCount(
      scored.select(col(idCol), col(qualityCol)),
      Seq(col(qualityCol), col(idCol)), "_qr")
    val phased = ranked
      .withColumn("phase",
        GlobalRank.ntileOfRank(col("_qr"), n, phases).cast("long"))
      .drop("_qr")
    val shuffleKey = md5(col(idCol).cast("string").cast("binary"))
    GlobalRank.withGlobalRowNumber(phased,
      Seq(col("phase"), shuffleKey, col(idCol)), "emit_rank")
  }

  /** Greedy sequence packing for LLM training: assign consecutive docs
    * (per shard, in id order) to fixed-token-budget training sequences.
    * A doc whose tokens straddle a boundary goes to the sequence its
    * FIRST token falls in (seq_id = tokens-before-this-doc div budget) —
    * the deterministic rule both engines can compute, so the whole
    * packing is hash-checkable.
    *
    * Scale shape: packing is inherently sequential WITHIN a stream, so
    * the operator packs per shard (`shardCol`) and parallelizes across
    * shards — exactly how production packers shard by source/file. The
    * window cum-sum runs one partition per shard with map-side token
    * counting; no global single-partition bottleneck.
    */
  def packSequences(docs: DataFrame, textCol: String, idCol: String,
                    shardCol: String, budgetTokens: Int): DataFrame =
    packAssign(
      docs.select(col(shardCol), col(idCol),
        size(tokens(col(textCol))).cast("long").as("_n_tokens")),
      idCol, shardCol, "_n_tokens", budgetTokens)
      .groupBy(col(shardCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_n_tokens")).as("seq_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))

  /** Concat-and-chunk packing — the GPT-style pretraining batch layout
    * (the other standard besides [[packSequences]]'s greedy whole-doc
    * form): within each shard the token stream is the concatenation of
    * documents in id order, cut into FIXED `seqLen`-token sequences with
    * documents straddling cut points (no padding, no document loss; only
    * the shard's final sequence runs short). A document occupying stream
    * positions [off, off+n) contributes to every sequence from
    * `off div L` through `(off+n-1) div L`, with per-sequence token
    * share = window overlap.
    *
    * Scale shape: identical to [[packSequences]] — packing is sequential
    * within a stream, so the cum-sum window runs per shard and the
    * operator parallelizes across shards; the boundary explode adds one
    * row per (doc, straddled sequence), ~totalTokens/seqLen extra rows
    * corpus-wide. Output one report row per (shard, seq_id): n_docs,
    * seq_tokens (= seqLen except each shard's last), first/last doc. */
  def packConcatChunks(docs: DataFrame, textCol: String, idCol: String,
                       shardCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val L = lit(seqLen.toLong)
    docs
      .select(col(shardCol), col(idCol),
        size(tokens(col(textCol))).cast("long").as("_n"))
      .withColumn("_off", coalesce(sum(col("_n")).over(w), lit(0L)))
      .withColumn("seq_id",
        explode(sequence(expr(s"_off div $seqLen"),
          expr(s"(_off + _n - 1) div $seqLen"))))
      .withColumn("_share",
        least(col("_off") + col("_n"), (col("seq_id") + 1) * L) -
          greatest(col("_off"), col("seq_id") * L))
      .groupBy(col(shardCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_share")).as("seq_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
  }

  /** The packing RULE alone — greedy cumulative-sum sequence assignment
    * over precomputed token counts (one `seq_id` column added). Shared
    * by [[packSequences]] (per-sequence report) and the composed
    * training-data pipeline (per-source rollup), so the rule cannot
    * silently diverge between them. */
  def packAssign(counts: DataFrame, idCol: String, shardCol: String,
                 tokCol: String, budgetTokens: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .withColumn("_cum_before", coalesce(sum(col(tokCol)).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"_cum_before div $budgetTokens"))
  }

  /** Stage 1 of bm25TopK: the single tokenize scan, reduced to the compact
    * (id, dl, tf per term) projection. Exposed for plan tests. */
  private[graft] def bm25TfProjection(docs: DataFrame, textCol: String,
                                      idCol: String, terms: Seq[String]): DataFrame = {
    val base = graft.Tables.spread(docs)
      .select(col(idCol), tokens(col(textCol)).as("_toks"))
      .withColumn("_dl", size(col("_toks")).cast("long"))
    terms.indices.foldLeft(base) { case (df, i) =>
      df.withColumn(s"_tf$i",
        size(filter(col("_toks"), x => x === lit(terms(i)))).cast("long"))
    }.drop("_toks")
  }

  /** Stage 2: the 1-row corpus statistics aggregate, collected eagerly. */
  private[graft] def bm25Stats(withTf: DataFrame, terms: Seq[String]): Row = {
    val statCols = Seq(count(lit(1)).as("_n"), sum(col("_dl")).as("_sumdl")) ++
      terms.indices.map(i => sum(when(col(s"_tf$i") > 0, 1L).otherwise(0L)).as(s"_df$i"))
    withTf.agg(statCols.head, statCols.tail: _*).collect()(0)
  }

  /** Stage 3: scoring with stats inlined as literals + distributed top-k.
    * No join anywhere — the lazy plan is scan → project → filter →
    * TakeOrderedAndProject. Exposed for plan tests. */
  private[graft] def bm25ScoreTopK(withTf: DataFrame, statsRow: Row, idCol: String,
                                   terms: Seq[String], k: Int,
                                   k1: Double, b: Double): DataFrame = {
    val n = lit(statsRow.getAs[Long]("_n"))
    val sumdl = lit(statsRow.getAs[Long]("_sumdl"))
    val dfs = terms.indices.map(i => lit(statsRow.getAs[Long](s"_df$i")))
    val avgdl = sumdl.cast("double") / n
    val score = terms.indices.map { i =>
      val tf = col(s"_tf$i").cast("double")
      val idf = log((n - dfs(i) + 0.5) / (dfs(i) + 0.5) + 1.0)
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl").cast("double") / avgdl))
    }.reduce(_ + _)
    withTf
      .withColumn("bm25", floor(score * 1e4 + 0.5) / 1e4)
      .filter(col("bm25") > 0)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("_dl").as("dl"), col("bm25"))
  }
}
