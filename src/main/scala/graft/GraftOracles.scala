package graft

/** DuckDB oracle SQL twins for [[GraftQueries]]. Keys match `queries` keys;
  * queries absent here get the driver's weaker rows-only check (they are
  * non-SQL-expressible: hash embeddings, seeded LSH planes, approximate
  * IVF; the FNV/fmix64 simhash IS expressible — see dedup_simhash).
  *
  * DuckDB dialect notes baked in:
  *  - `count(*) FILTER (WHERE ...)` instead of sum(int) (sum widens to
  *    HUGEINT, which would not match Spark's BIGINT);
  *  - vector math via `list_transform(range(1,65), ...)` double
  *    accumulation (list_cosine_similarity is float32 — off by ~1e-7);
  *  - `regexp_replace(..., 'g')` for replace-all;
  *  - window sums CAST to BIGINT.
  */
object GraftOracles {

  // exact-decimal money arithmetic, mirrored in GraftQueries.money/oneMinus
  private val px = "CAST(l_extendedprice AS DECIMAL(12,4))"
  private val revenue = s"$px * CAST((1 - l_discount) AS DECIMAL(6,4))"

  private lazy val qualityClassifierSql: String = {
    val m = graft.text.QualityClassifier.load()
    val wl = m.weights.mkString("[", ",", "]")
    s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
       |f AS (SELECT doc_id, unnest(t || list_transform(range(1, greatest(len(t), 1)),
       |    i -> t[i] || ' ' || t[i+1])) AS feat FROM tk),
       |b AS (SELECT doc_id,
       |    (('0x' || substr(md5(feat), 1, 6))::BIGINT % 256)::INT AS bkt FROM f),
       |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       |    CAST(sum(($wl)[bkt + 1]) AS BIGINT) + (${m.bias}) AS logit
       |  FROM b GROUP BY 1)
       |SELECT doc_id, n_feats,
       |  floor(logit::DOUBLE / n_feats / 1048576 * 1e6 + 0.5) / 1e6 AS score,
       |  floor(logit::DOUBLE / n_feats / 1048576 * 1e6 + 0.5) / 1e6 > 0.0 AS keep
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** EXACT new-vs-standing Jaccard (doc_id % 10 = 7 is the arrival
    * slice), shared by the batch incremental operator and its streamed
    * foreachBatch form. */
  private lazy val incrementalNearDupSql: String =
    s"""${shinglesCte()}
       |SELECT a.doc_id AS new_id, b.doc_id AS existing_id,
       |  round(len(list_intersect(a.s, b.s))::DOUBLE /
       |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
       |FROM sh a JOIN sh b ON a.doc_id % 10 = 7 AND b.doc_id % 10 <> 7
       |WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
       |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.8
       |ORDER BY 1,2""".stripMargin

  /** Binary-exponentiation power EXPRESSION — generated from the exact
    * loop [[graft.operators.Dedup.ipow]] runs (r *= b at each set bit,
    * then b *= b), so DuckDB performs the bit-identical IEEE
    * multiplication sequence and the s-curve probabilities of the
    * banding advisor hash-match cross-engine. */
  private def ipowSql(x: String, n: Int): String = {
    var r = "CAST(1.0 AS DOUBLE)"; var b = s"($x)"; var e = n
    while (e > 0) {
      if ((e & 1) == 1) r = s"($r * $b)"
      b = s"($b * $b)"; e >>= 1
    }
    r
  }

  /** 1 - (1 - j^rows)^bands via [[ipowSql]] — Dedup.sCurveP's twin.
    * Every literal is cast to DOUBLE: DuckDB parses bare decimal
    * literals as DECIMAL, whose scale overflows under the squaring
    * chain (and whose arithmetic wouldn't be IEEE anyway). */
  private def sCurvePSql(j: String, rows: Int, bands: Int): String = {
    val inner = ipowSql(s"CAST($j AS DOUBLE)", rows)
    s"(CAST(1.0 AS DOUBLE) - ${ipowSql(s"CAST(1.0 AS DOUBLE) - $inner", bands)})"
  }

  /** Twin of dedup_banding_advisor — the WHOLE decision replayed: the
    * deterministic pair sample (400 lowest ids, opposite-half rank
    * pairing), the order-independent micro-unit background mean, the
    * descending divisor scan over the same binary-exponentiation
    * s-curve products (bit-identical IEEE multiply sequences via
    * [[ipowSql]]), the candidate estimates under both bandings, and the
    * dominance flag. A drifted recall floor, a changed multiplication
    * order, or an inverted divisor preference all hash-fail. Constants
    * mirror the gate call: threshold 0.8, nHashes 128, recallFloor 0.9,
    * default 32x4, maxSamplePairs 200. */
  private def bandingAdvisorSql: String = {
    val nH = 128
    val divisorsDesc = (1 to nH).filter(nH % _ == 0).reverse
    def mu(p: String) =
      s"CAST(floor($p * 1e6 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    val rCase = divisorsDesc
      .map(r =>
        s"WHEN ${sCurvePSql("0.8", r, nH / r)} >= CAST(0.9 AS DOUBLE) THEN $r")
      .mkString("\n    ")
    def perR(f: Int => String) =
      "CASE dec.r " +
        divisorsDesc.map(r => s"WHEN $r THEN ${f(r)}").mkString(" ") + " END"
    val jBg = "(CAST(bg.mu AS DOUBLE) / 1000000.0)"
    s"""WITH samp AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 400),
       |sh0 AS (SELECT doc_id,
       |    list_distinct(list_transform(range(1, greatest(length(text)-4, 1)+1),
       |      i -> substr(text, i::INT, 5))) AS s
       |  FROM samp),
       |rk AS (SELECT doc_id, s, row_number() OVER (ORDER BY doc_id) AS rk,
       |    count(*) OVER () AS m2 FROM sh0),
       |pr AS (SELECT CAST(floor(
       |    (CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
       |     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))) * 1e6 + 0.5)
       |    AS BIGINT) AS jmu
       |  FROM rk a JOIN rk b ON b.rk = a.rk + (a.m2 // 2)
       |  WHERE a.rk <= (a.m2 // 2)),
       |bgc AS (SELECT CAST(count(*) AS BIGINT) AS m,
       |    COALESCE(CAST(sum(jmu) AS BIGINT), 0) AS smu FROM pr),
       |bg AS (SELECT m, CASE WHEN m = 0 THEN 0 ELSE smu // m END AS mu FROM bgc),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |dec AS (SELECT CASE
       |    $rCase
       |    ELSE 1 END AS r FROM (SELECT 1)),
       |probs AS (SELECT
       |    ${perR(r => sCurvePSql("0.8", r, nH / r))} AS p_t,
       |    ${perR(r => sCurvePSql(jBg, r, nH / r))} AS p_bg,
       |    ${sCurvePSql(jBg, 4, 32)} AS p_bg_def
       |  FROM dec, bg)
       |SELECT nn.n AS n_docs, bg.m AS sample_pairs, bg.mu AS bg_jaccard_mu,
       |  CAST($nH // dec.r AS INT) AS bands, CAST(dec.r AS INT) AS rows_per_band,
       |  ${mu("probs.p_t")} AS p_threshold_mu,
       |  ${mu("probs.p_bg")} AS p_background_mu,
       |  CAST(floor(CAST(nn.n * (nn.n - 1) // 2 AS DOUBLE) * probs.p_bg)
       |    AS BIGINT) AS est_candidates,
       |  CAST(32 AS INT) AS default_bands, CAST(4 AS INT) AS default_rows_per_band,
       |  ${mu("probs.p_bg_def")} AS p_background_default_mu,
       |  CAST(floor(CAST(nn.n * (nn.n - 1) // 2 AS DOUBLE) * probs.p_bg_def)
       |    AS BIGINT) AS est_candidates_default,
       |  (CAST(floor(CAST(nn.n * (nn.n - 1) // 2 AS DOUBLE) * probs.p_bg_def)
       |    AS BIGINT) > 10 * nn.n) AS background_dominated
       |FROM nn, bg, dec, probs""".stripMargin
  }

  /** Twin of dedup_minhash_auto — the exact-Jaccard join (recall proof
    * AT the chosen banding) with the banding DECISION replayed: the same
    * descending divisor scan over the 256-hash budget as
    * Dedup.chooseBanding, each probability the identical [[ipowSql]]
    * multiply chain, the chosen (bands, rows_per_band) on every row. */
  private def minhashAutoSql: String = {
    val nH = 256
    val divisorsDesc = (1 to nH).filter(nH % _ == 0).reverse
    val rCase = divisorsDesc
      .map(r =>
        s"WHEN ${sCurvePSql("0.8", r, nH / r)} >= CAST(0.9 AS DOUBLE) THEN $r")
      .mkString("\n    ")
    s"""${shinglesCte()},
       |dec AS (SELECT CASE
       |    $rCase
       |    ELSE 1 END AS r FROM (SELECT 1))
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  round(len(list_intersect(a.s, b.s))::DOUBLE /
       |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard,
       |  CAST($nH // dec.r AS INT) AS bands, CAST(dec.r AS INT) AS rows_per_band
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id, dec
       |WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
       |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.8
       |ORDER BY 1,2""".stripMargin
  }

  /** shingle-set CTE used by the jaccard oracles */
  private def shinglesCte(extraCols: String = "") =
    s"""WITH sh AS (
       |  SELECT doc_id$extraCols,
       |    list_distinct(list_transform(range(1, greatest(length(text)-4, 1)+1),
       |      i -> substr(text, i::INT, 5))) AS s
       |  FROM documents)""".stripMargin

  /** Twin of graph_pagerank: the walk anchor's M=6 adjacency CTE plus
    * `iters` UNROLLED iteration CTEs (standard SQL forbids aggregation
    * in a recursive term, and unrolling keeps each step a plain
    * join-group-by). Arithmetic is the engine's exactly: BIGINT
    * micro-unit ranks, per-edge `rank // outdeg` (positive operands, so
    * DuckDB's floor `//` == Spark's truncating DIV), damping as
    * `(85 · Σ) // 100`, dangling-in nodes kept by the LEFT JOIN. */
  private def pagerankOracle(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""r$k AS (SELECT c.id,
         |    CAST(150000 + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS rank_mu
         |  FROM corpus c LEFT JOIN (
         |    SELECT e.dst AS id, CAST(sum(r.rank_mu // od.od) AS BIGINT) AS s
         |    FROM edges e JOIN od ON od.src = e.src
         |    JOIN r${k - 1} r ON r.id = e.src GROUP BY 1) s USING (id))"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH corpus AS (
       |  SELECT CAST(vec_id AS BIGINT) AS id, embedding AS v
       |  FROM embeddings WHERE vec_id < 300),
       |pairs AS MATERIALIZED (
       |  SELECT a.id AS src, b.id AS dst,
       |    list_sum(list_transform(range(1,65),
       |      i -> (a.v[i]::DOUBLE - b.v[i]::DOUBLE) * (a.v[i]::DOUBLE - b.v[i]::DOUBLE))) AS d
       |  FROM corpus a JOIN corpus b ON a.id <> b.id),
       |ranked AS (
       |  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY d, dst) AS r
       |  FROM pairs),
       |edges AS MATERIALIZED (SELECT src, dst FROM ranked WHERE r <= 6),
       |od AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM edges GROUP BY 1),
       |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank_mu FROM corpus),
       |$steps
       |SELECT id AS vec_id, rank_mu FROM r$iters
       |ORDER BY rank_mu DESC, vec_id""".stripMargin
  }

  /** The frozen-encoder sparse twin shared by the incremental,
    * streaming, and compaction maintenance forms; `extraWhere` filters
    * the RANKING only (tombstoned docs stay inside the frozen model's
    * df/N — they were part of the fitted corpus). */
  private def sparseFrozenOracleWhere(extraWhere: String) =
    s"""WITH standing AS (SELECT * FROM documents WHERE doc_id % 10 <> 7),
         |tks AS (SELECT doc_id, unnest($toks) AS term FROM standing),
         |tfs AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |        FROM tks GROUP BY 1, 2),
         |dfv AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfs GROUP BY 1),
         |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM standing),
         |tka AS (SELECT doc_id, unnest($toks) AS term FROM documents
         |        WHERE doc_id % 10 = 7),
         |tfa AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |        FROM tka GROUP BY 1, 2),
         |tfall AS (SELECT * FROM tfs UNION ALL SELECT * FROM tfa),
         |w AS (SELECT doc_id, term,
         |    CAST(floor(tf * ln(CAST(nd.n AS DOUBLE) / dfv.df) * 1e6 + 0.5) AS BIGINT) AS w_mu
         |  FROM tfall JOIN dfv USING (term) CROSS JOIN nd),
         |q AS (SELECT * FROM (VALUES
         |    ('vector', CAST(1000000 AS BIGINT)), ('query', CAST(800000 AS BIGINT)),
         |    ('join', CAST(500000 AS BIGINT)), ('spark', CAST(250000 AS BIGINT)))
         |  AS t(term, q_mu)),
         |sc AS (SELECT doc_id, CAST(sum(w.w_mu * q.q_mu) AS BIGINT) AS s_mu2
         |       FROM w JOIN q USING (term) GROUP BY 1)
         |SELECT doc_id, CAST(s_mu2 AS DOUBLE) / 1e12 AS score
         |FROM sc $extraWhere
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  private lazy val sparseFrozenOracle = sparseFrozenOracleWhere("")

  /** Twin of graph_components: the M=3 adjacency (walk-oracle CTE
    * family), symmetrized, then `iters` unrolled min-label rounds —
    * bounded-hop minima are exact at ANY round count, so no
    * convergence clause is needed. */
  private def componentsOracle(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""l$k AS (SELECT c.id,
         |    least(p.label, COALESCE(s.nl, p.label)) AS label
         |  FROM corpus c
         |  JOIN l${k - 1} p ON p.id = c.id
         |  LEFT JOIN (
         |    SELECT e.dst AS id, min(r.label) AS nl
         |    FROM edges e JOIN l${k - 1} r ON r.id = e.src GROUP BY 1) s
         |  ON s.id = c.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH corpus AS (
       |  SELECT CAST(vec_id AS BIGINT) AS id, embedding AS v
       |  FROM embeddings WHERE vec_id < 300),
       |pairs AS MATERIALIZED (
       |  SELECT a.id AS src, b.id AS dst,
       |    list_sum(list_transform(range(1,65),
       |      i -> (a.v[i]::DOUBLE - b.v[i]::DOUBLE) * (a.v[i]::DOUBLE - b.v[i]::DOUBLE))) AS d
       |  FROM corpus a JOIN corpus b ON a.id <> b.id),
       |ranked AS (
       |  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY d, dst) AS r
       |  FROM pairs),
       |dedges AS (SELECT src, dst FROM ranked WHERE r <= 3),
       |edges AS MATERIALIZED (
       |  SELECT src, dst FROM dedges
       |  UNION SELECT dst AS src, src AS dst FROM dedges),
       |l0 AS (SELECT id, id AS label FROM corpus),
       |$steps
       |SELECT id AS vec_id, label FROM l$iters ORDER BY id""".stripMargin
  }

  /** The sparse-retrieval CTE body shared by the inline, stored, and
    * hybrid-fusion twins: exact fixed-point tf·idf postings, a
    * pure-BIGINT dot product, and the one monotone BIGINT→DOUBLE score
    * conversion the engine ranks on. Terminal relation: `spsc(doc_id,
    * score)`. `wFilter` is the impact-threshold predicate (`TRUE` for
    * the exact forms). */
  private def sparseBodyWhere(wFilter: String) =
    s"""tk AS (SELECT doc_id, unnest($toks) AS term FROM documents),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |       FROM tk GROUP BY 1, 2),
       |dfv AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
       |w AS (SELECT doc_id, term,
       |    CAST(floor(tf * ln(CAST(nd.n AS DOUBLE) / dfv.df) * 1e6 + 0.5) AS BIGINT) AS w_mu
       |  FROM tf JOIN dfv USING (term) CROSS JOIN nd),
       |spq AS (SELECT * FROM (VALUES
       |    ('vector', CAST(1000000 AS BIGINT)), ('query', CAST(800000 AS BIGINT)),
       |    ('join', CAST(500000 AS BIGINT)), ('spark', CAST(250000 AS BIGINT)))
       |  AS t(term, q_mu)),
       |spsc AS (SELECT doc_id,
       |    CAST(CAST(sum(w.w_mu * spq.q_mu) AS BIGINT) AS DOUBLE) / 1e12 AS score
       |  FROM w JOIN spq USING (term) WHERE $wFilter GROUP BY doc_id)""".stripMargin

  private lazy val sparseBody = sparseBodyWhere("TRUE")

  /** The sparse-retrieval twin shared by the inline and stored forms. */
  private lazy val sparseDotOracle =
    s"""WITH $sparseBody
       |SELECT doc_id, score FROM spsc
       |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  /** Twin of sparse_deleted: same full-corpus frozen encoder (deleted
    * docs still count in df/N — they were part of the fitted model),
    * tombstoned ids excluded from the ranking only. */
  private lazy val sparseDeletedOracle =
    s"""WITH $sparseBody
       |SELECT doc_id, score FROM spsc
       |WHERE doc_id % 7 <> 0
       |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  /** The largest-remainder temperature apportionment over any
    * (domain, n) source CTE — shared by mix_temperature (row counts)
    * and mix_temperature_tokens (token sums). */
  /** `huge = true` runs the quota products in HUGEINT — the twin of the
    * Scala side's BigInt path for training-scale budgets, where
    * budget·w_fp overflows 64 bits (BIGINT arithmetic would ERROR in
    * DuckDB, wrap in a naive engine; both are wrong answers). */
  private def tempAllocSql(srcSql: String, budget: Long,
                           huge: Boolean = false): String = {
    val b = if (huge) s"CAST($budget AS HUGEINT)" else s"$budget"
    s"""WITH c AS ($srcSql),
       |w AS (SELECT domain, n,
       |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS w_fp FROM c),
       |s AS (SELECT CAST(sum(w_fp) AS BIGINT) AS sw FROM w),
       |q AS (SELECT domain, n, w_fp,
       |    CAST(($b * w_fp) // sw AS BIGINT) AS q0,
       |    CAST(($b * w_fp) % sw AS BIGINT) AS rem FROM w, s),
       |l AS (SELECT CAST($budget - sum(q0) AS BIGINT) AS lo FROM q),
       |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, domain) AS rr FROM q)
       |SELECT domain, n AS n_docs, w_fp,
       |  CAST(q0 + CASE WHEN rr <= (SELECT lo FROM l) THEN 1 ELSE 0 END AS BIGINT) AS quota
       |FROM r ORDER BY domain""".stripMargin
  }

  /** Twin of pack_concat_chunks, shared with the pack_advisor composite:
    * window arithmetic over the per-shard running offset. */
  private lazy val packConcatChunksSql: String =
    """WITH t AS (SELECT source, doc_id,
      |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n
      |  FROM documents),
      |c AS (SELECT source, doc_id, n,
      |    CAST(coalesce(sum(n) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
      |  FROM t),
      |e AS (SELECT source, doc_id, n, off,
      |    unnest(range(off // 512, (off + n - 1) // 512 + 1)) AS seq_id
      |  FROM c)
      |SELECT source, CAST(seq_id AS BIGINT) AS seq_id,
      |  count(*) AS n_docs,
      |  CAST(sum(least(off + n, (seq_id + 1) * 512) -
      |           greatest(off, seq_id * 512)) AS BIGINT) AS seq_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Twin of pack_sequences, shared with the pack_advisor composite:
    * seq of a doc = tokens-before div budget. */
  private lazy val packSequencesSql: String =
    """WITH t AS (SELECT source, doc_id,
      |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (SELECT source, doc_id, n_tokens,
      |    coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |  FROM t)
      |SELECT source, CAST(cum_before // 512 AS BIGINT) AS seq_id,
      |  count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM c GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  /** Shared twin of vec_percolate / streaming_vec_percolate (floor-form
    * rounding — the one rule both percolate paths use). */
  private lazy val vecPercolateSql =
    s"""WITH b AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < 20),
       |a AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 20)
       |SELECT a.vec_id, b.q_id, floor(($cosineDouble) * 1e6 + 0.5) / 1e6 AS cosine
       |FROM a CROSS JOIN b
       |WHERE floor(($cosineDouble) * 1e6 + 0.5) / 1e6 >= 0.3
       |ORDER BY a.vec_id, b.q_id""".stripMargin

  /** Twin of vec_percolate_lsh: the SAME seeded signature arms as
    * dedup_embedding_lsh, asymmetric — subscriptions (vec_id < 20) join
    * documents (vec_id >= 20) on any per-table bucket collision, exact
    * floor-form cosine verify at 0.3. */
  private lazy val vecPercolateLshSql =
    s"""WITH sigs AS (
       |$lshSigArms),
       |qsig AS (SELECT vec_id AS q_id, t, bucket FROM sigs WHERE vec_id < 20),
       |dsig AS (SELECT vec_id, t, bucket FROM sigs WHERE vec_id >= 20),
       |cand AS (SELECT DISTINCT d.vec_id, q.q_id
       |  FROM dsig d JOIN qsig q ON d.t = q.t AND d.bucket = q.bucket)
       |SELECT c.vec_id, c.q_id,
       |  floor(($cosineDouble) * 1e6 + 0.5) / 1e6 AS cosine
       |FROM cand c
       |JOIN embeddings a ON a.vec_id = c.vec_id
       |JOIN embeddings b ON b.vec_id = c.q_id
       |WHERE floor(($cosineDouble) * 1e6 + 0.5) / 1e6 >= 0.3
       |ORDER BY c.vec_id, c.q_id""".stripMargin

  private val cosineDouble =
    """list_sum(list_transform(range(1,65), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
      |sqrt(list_sum(list_transform(range(1,65), i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)) *
      |     list_sum(list_transform(range(1,65), i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))""".stripMargin

  private val l2sqToQv =
    """list_sum(list_transform(range(1,65),
      |  i -> (e.embedding[i]::DOUBLE - q.qv[i]::DOUBLE) * (e.embedding[i]::DOUBLE - q.qv[i]::DOUBLE)))""".stripMargin

  /** Unrolled twin of [[graft.operators.Clustering]]'s deterministic
    * k-means (k=8, 2 Lloyd rounds): residue-class init, left-to-right
    * double l2² rounded via the floor form BEFORE the row_number argmin
    * (cid is the tiebreak), Lloyd means through the 2^24 fixed-point
    * BIGINT sums with a float32 re-quantize — the exact arithmetic the
    * Spark side performs, so per-vector assignments hash-match. Ends at
    * `s2f` = (vec_id, embedding, cid) and `a2f` = the final-centroid
    * distance relation; callers append their SELECT. */
  private def kmDist(c: String) =
    s"""floor(list_sum(list_transform(range(1,65),
       |      i -> (e.embedding[CAST(i AS INT)]::DOUBLE - $c.v[CAST(i AS INT)])
       |         * (e.embedding[CAST(i AS INT)]::DOUBLE - $c.v[CAST(i AS INT)]))) * 1e6 + 0.5) / 1e6""".stripMargin

  /** Source- and geometry-parameterized variant: `srcWhere` restricts
    * the TRAINING corpus (the streaming twin trains on the standing
    * slice only); `k` is the cell count (retrain twins re-derive the
    * router at a NEW geometry). */
  private def kmeansCteOn(srcWhere: String, k: Int = 8): String = {
    def round(i: Int, prev: String): String =
      s"""d$i AS (SELECT e.vec_id, e.embedding, c.cid, ${kmDist("c")} AS dr
         |  FROM ksrc e CROSS JOIN $prev c),
         |a$i AS (SELECT vec_id, embedding, cid, dr,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dr, cid) AS rn FROM d$i),
         |s$i AS (SELECT vec_id, embedding, cid FROM a$i WHERE rn = 1),
         |m$i AS (SELECT cid, u.p AS pos,
         |    CAST(sum(CAST(floor(embedding[CAST(u.p + 1 AS INT)]::DOUBLE * 16777216) AS BIGINT)) AS DOUBLE)
         |      / count(*) / 16777216 AS mval
         |  FROM s$i, unnest(range(0, 64)) AS u(p) GROUP BY 1, 2),
         |cm$i AS (SELECT cid, list(CAST(CAST(mval AS FLOAT) AS DOUBLE) ORDER BY pos) AS v
         |  FROM m$i GROUP BY 1),
         |c$i AS (SELECT * FROM cm$i UNION ALL
         |  SELECT * FROM $prev p WHERE p.cid NOT IN (SELECT cid FROM cm$i))""".stripMargin
    s"""ksrc AS (SELECT vec_id, embedding FROM embeddings WHERE $srcWhere),
       |seeds AS (SELECT CAST(vec_id % $k AS INT) AS cid, min(vec_id) AS seed_id
       |  FROM ksrc GROUP BY 1),
       |c0 AS (SELECT s.cid, list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM seeds s JOIN ksrc e ON e.vec_id = s.seed_id),
       |${round(1, "c0")},
       |${round(2, "c1")},
       |d2f AS (SELECT e.vec_id, e.embedding, c.cid, ${kmDist("c")} AS dr
       |  FROM ksrc e CROSS JOIN c2 c),
       |a2f AS (SELECT vec_id, embedding, cid, dr,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dr, cid) AS rn FROM d2f),
       |s2f AS (SELECT vec_id, embedding, cid FROM a2f WHERE rn = 1)""".stripMargin
  }

  private val kmeansCte: String = kmeansCteOn("TRUE")

  /** Shared twin of ann_ivfpq / ann_ivfpq_store (identical answers —
    * stored vs inline encoding is invisible): the COMPLETE IVF-PQ chain
    * in SQL. Every stage mirrors [[graft.operators.Similarity]]'s
    * driver/UDF arithmetic bit-for-bit:
    *  - coarse quantizer = simIvfCte (trunc fixed-point Lloyd);
    *  - PQ training points = md5-of-id-ordered residuals CAST TO FLOAT
    *    (trainIvfPq rounds its sample; `resid`), subspace slices of 8
    *    dims — while ENCODING argmins over UNROUNDED double residuals
    *    (pqEncode never rounds; `residd`) — two residual relations
    *    because the Scala sides genuinely differ;
    *  - kmeansDriver = seeds from the first ksub points in sample
    *    order, then per-iteration: argmin by sequential double l2 (ties
    *    lowest index), member sums accumulated IN SAMPLE ORDER
    *    (list(x ORDER BY rn) -> list_sum), empty cells keep their
    *    centroid, means re-quantized through FLOAT;
    *  - encode = per-subspace argmin of each corpus vector's residual;
    *  - search = raw-l2 (dr, cid) 4-cell probe, per-(query, cell)
    *    DOUBLE residual distance tables, ADC = j-ordered sum of table
    *    entries rounded HALF-UP 6, shortlist rank <= rerank*k by
    *    (adc, id), exact raw-l2 rerank rounded 6, top-10 by (score, id).
    * ksub is 256 in the operator; min(ksub, points) caps it at the
    * sample size exactly as kmeansDriver does. */
  /** `srcSql` is the relation the ENCODE/SEARCH side runs over — the
    * identity (the corpus itself) for the immutable entries, a live
    * restatement (reversed vectors, deleted ids gone) for the
    * mutable-PQ twin; TRAINING always reads the original corpus (the
    * attach-time state). `qWhere` picks the query rows; `emitQid`
    * drops the q_id column for single-query verbs. */
  private def ivfPqSql(ncells: Int, iters: Int, m: Int, dsub: Int,
                       ksubMax: Int, nprobe: Int, k: Int, rerank: Int,
                       srcSql: String = "SELECT vec_id, embedding FROM embeddings",
                       qWhere: String = "vec_id < 5",
                       emitQid: Boolean = true): String = {
    def pqRound(i: Int, prev: String): String =
      s"""pqd$i AS (SELECT p.rn, p.j, p.v, c.c, list_sum(list_transform(range(1,${dsub + 1}),
         |    x -> (p.v[CAST(x AS INT)] - c.v[CAST(x AS INT)])
         |       * (p.v[CAST(x AS INT)] - c.v[CAST(x AS INT)]))) AS dr
         |  FROM pqpts p JOIN $prev c ON c.j = p.j),
         |pqa$i AS (SELECT rn, j, v, c,
         |    row_number() OVER (PARTITION BY rn, j ORDER BY dr, c) AS arn FROM pqd$i),
         |pqs$i AS (SELECT rn, j, v, c FROM pqa$i WHERE arn = 1),
         |pqm$i AS (SELECT j, c, u.p AS pos,
         |    list_sum(list(v[CAST(u.p + 1 AS INT)] ORDER BY rn)) AS s, count(*) AS n
         |  FROM pqs$i, unnest(range(0, $dsub)) AS u(p) GROUP BY 1, 2, 3),
         |pqcm$i AS (SELECT j, c,
         |    list(CAST(CAST(s / n AS FLOAT) AS DOUBLE) ORDER BY pos) AS v
         |  FROM pqm$i GROUP BY 1, 2),
         |pqc$i AS MATERIALIZED (SELECT * FROM pqcm$i UNION ALL
         |  SELECT * FROM $prev p WHERE NOT EXISTS (
         |    SELECT 1 FROM pqcm$i n WHERE n.j = p.j AND n.c = p.c))""".stripMargin
    s"""WITH ${simIvfCte(ncells, iters)},
       |cellm AS MATERIALIZED (SELECT vec_id, cid FROM scellf),
       |centm AS MATERIALIZED (SELECT cid, v FROM sc$iters),
       |smp AS (SELECT vec_id,
       |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
       |  FROM embeddings),
       |resid AS MATERIALIZED (SELECT s.vec_id, list_transform(range(1,65),
       |    i -> CAST(CAST(e.embedding[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]
       |      AS FLOAT) AS DOUBLE)) AS res
       |  FROM cellm s JOIN embeddings e ON e.vec_id = s.vec_id
       |  JOIN centm c ON c.cid = s.cid),
       |lsrc AS MATERIALIZED ($srcSql),
       |lad0 AS (SELECT l.vec_id, l.embedding, c.cid, list_sum(list_transform(range(1,65),
       |    i -> (l.embedding[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)])
       |       * (l.embedding[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]))) AS dr
       |  FROM lsrc l CROSS JOIN centm c),
       |lcellm AS MATERIALIZED (SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dr, cid) AS rn
       |    FROM lad0) WHERE rn = 1),
       |residd AS MATERIALIZED (SELECT s.vec_id, list_transform(range(1,65),
       |    i -> e.embedding[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]) AS res
       |  FROM lcellm s JOIN lsrc e ON e.vec_id = s.vec_id
       |  JOIN centm c ON c.cid = s.cid),
       |pqpts AS MATERIALIZED (SELECT m.rn, u.j, list_slice(r.res, u.j * $dsub + 1, (u.j + 1) * $dsub) AS v
       |  FROM smp m JOIN resid r ON r.vec_id = m.vec_id,
       |    unnest(range(0, $m)) AS u(j)),
       |pqc0 AS MATERIALIZED (SELECT j, CAST(rn - 1 AS BIGINT) AS c, v FROM pqpts
       |  WHERE rn <= LEAST($ksubMax, (SELECT count(*) FROM smp))),
       |${(1 to iters).map(i => pqRound(i, s"pqc${i - 1}")).mkString(",\n")},
       |enc0 AS (SELECT r.vec_id, p.j, list_slice(r.res, p.j * $dsub + 1, (p.j + 1) * $dsub) AS v
       |  FROM residd r, unnest(range(0, $m)) AS p(j)),
       |encd AS (SELECT e0.vec_id, e0.j, c.c, list_sum(list_transform(range(1,${dsub + 1}),
       |    x -> (e0.v[CAST(x AS INT)] - c.v[CAST(x AS INT)])
       |       * (e0.v[CAST(x AS INT)] - c.v[CAST(x AS INT)]))) AS dr
       |  FROM enc0 e0 JOIN pqc$iters c ON c.j = e0.j),
       |enca AS (SELECT vec_id, j, c,
       |    row_number() OVER (PARTITION BY vec_id, j ORDER BY dr, c) AS arn FROM encd),
       |code AS MATERIALIZED (SELECT vec_id, j, c FROM enca WHERE arn = 1),
       |sq AS MATERIALIZED (SELECT vec_id AS q_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
       |  FROM embeddings WHERE $qWhere),
       |sqd AS (SELECT q.q_id, c.cid, list_sum(list_transform(range(1,65),
       |    i -> (q.qv[CAST(i AS INT)] - c.v[CAST(i AS INT)])
       |       * (q.qv[CAST(i AS INT)] - c.v[CAST(i AS INT)]))) AS dr
       |  FROM sq q CROSS JOIN centm c),
       |sprobe AS MATERIALIZED (SELECT q_id, cid FROM (
       |    SELECT q_id, cid, row_number() OVER (PARTITION BY q_id ORDER BY dr, cid) AS rn
       |    FROM sqd) WHERE rn <= $nprobe),
       |qres AS (SELECT p.q_id, p.cid, list_transform(range(1,65),
       |    i -> q.qv[CAST(i AS INT)] - c.v[CAST(i AS INT)]) AS res
       |  FROM sprobe p JOIN sq q ON q.q_id = p.q_id JOIN centm c ON c.cid = p.cid),
       |dt AS MATERIALIZED (SELECT r.q_id, r.cid, u.j, c.c, list_sum(list_transform(range(1,${dsub + 1}),
       |    x -> (r.res[CAST(u.j * $dsub + x AS INT)] - c.v[CAST(x AS INT)])
       |       * (r.res[CAST(u.j * $dsub + x AS INT)] - c.v[CAST(x AS INT)]))) AS d
       |  FROM qres r, unnest(range(0, $m)) AS u(j)
       |  JOIN pqc$iters c ON c.j = u.j),
       |adc0 AS (SELECT p.q_id, s.vec_id, s.cid,
       |    list_sum(list(t.d ORDER BY t.j)) AS adc_raw
       |  FROM sprobe p
       |  JOIN lcellm s ON s.cid = p.cid
       |  JOIN code cd ON cd.vec_id = s.vec_id
       |  JOIN dt t ON t.q_id = p.q_id AND t.cid = s.cid AND t.j = cd.j AND t.c = cd.c
       |  GROUP BY 1, 2, 3),
       |short AS (SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (
       |      PARTITION BY q_id ORDER BY round(adc_raw, 6), vec_id) AS rn
       |    FROM adc0) WHERE rn <= ${rerank * k}),
       |ex AS (SELECT h.q_id, h.vec_id, round(list_sum(list_transform(range(1,65),
       |    i -> (e.embedding[CAST(i AS INT)]::DOUBLE - q.qv[CAST(i AS INT)])
       |       * (e.embedding[CAST(i AS INT)]::DOUBLE - q.qv[CAST(i AS INT)]))), 6) AS score
       |  FROM short h JOIN lsrc e ON e.vec_id = h.vec_id
       |  JOIN sq q ON q.q_id = h.q_id),
       |fin AS (SELECT q_id, vec_id, score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score, vec_id) AS rank
       |  FROM ex)
       |${if (emitQid)
           s"SELECT q_id, vec_id, score, CAST(rank AS BIGINT) AS rank\nFROM fin WHERE rank <= $k ORDER BY q_id, rank"
         else
           s"SELECT vec_id, score, CAST(rank AS BIGINT) AS rank\nFROM fin WHERE rank <= $k ORDER BY rank"}""".stripMargin
  }

  private lazy val ivfPqTop10Sql: String = ivfPqSql(
    ncells = 16, iters = 3, m = 8, dsub = 8, ksubMax = 256,
    nprobe = 4, k = 10, rerank = 4)

  /** Shared twin of ann_probe_knn / ann_ivf_store (identical answers by
    * construction — see the map entries): quantize, probe 4 cells by raw
    * l2 (dr, cid), top-10 among candidates by raw l2 with vec_id
    * tiebreak, label joined back. */
  /** Twin of [[graft.operators.Similarity.adaptiveFilteredKnn]] at the
    * gate configuration (k=10, 16 cells, 4-cell probe, 5% pre-filter
    * threshold): BOTH branches computed, each gated by the relational
    * replay of the matching-fraction decision — exactly one survives.
    * `predSql` references the vector row as alias `t`. */
  private def adaptiveKnnSql(predSql: String): String = {
    def cos(v: String) =
      s"""round(
         |    list_sum(list_transform(range(1,65), i -> $v.embedding[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE)) /
         |    sqrt(list_sum(list_transform(range(1,65), i -> $v.embedding[CAST(i AS INT)]::DOUBLE * $v.embedding[CAST(i AS INT)]::DOUBLE)) *
         |         list_sum(list_transform(range(1,65), i -> q.qe[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE))), 6)""".stripMargin
    s"""WITH ${simIvfCte(16, 3)},
       |sel AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(count(*) FILTER (WHERE $predSql) AS BIGINT) AS m
       |  FROM embeddings t),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |pres AS (SELECT t.vec_id, ${cos("t")} AS cosine
       |  FROM embeddings t CROSS JOIN q WHERE $predSql),
       |prer AS (SELECT vec_id, cosine,
       |    row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank FROM pres),
       |pqd AS (SELECT c.cid, list_sum(list_transform(range(1,65),
       |    i -> (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)])
       |       * (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]))) AS dr
       |  FROM sc3 c CROSS JOIN q),
       |probe AS (SELECT cid FROM pqd ORDER BY dr, cid LIMIT 4),
       |posts AS (SELECT t.vec_id, ${cos("t")} AS cosine
       |  FROM scellf s JOIN embeddings t ON t.vec_id = s.vec_id CROSS JOIN q
       |  WHERE s.cid IN (SELECT cid FROM probe) AND ($predSql)),
       |postr AS (SELECT vec_id, cosine,
       |    row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank FROM posts)
       |SELECT vec_id, cosine, rank, 'pre' AS path FROM prer
       |  WHERE rank <= 10 AND (SELECT m FROM sel) <= (SELECT n FROM sel) * 0.05
       |UNION ALL
       |SELECT vec_id, cosine, rank, 'post' AS path FROM postr
       |  WHERE rank <= 10 AND (SELECT m FROM sel) > (SELECT n FROM sel) * 0.05
       |ORDER BY rank""".stripMargin
  }

  /** Shared twin of ann_ivfsq_store / ann_ivfsq_incremental: the full
    * SQ chain (kmeans router, full-corpus min/max, probe, encode, ADC)
    * — the incremental append's frozen quantizer makes the maintained
    * store equal the full build, so one SQL serves both. Geometry-
    * parameterized (`k` cells, `nprobe` probes) so the RETRAIN twin
    * (`ann_sq_retrain` refits at 4 cells) re-derives the new quantizer
    * relationally with no notion of the stale build or the swap. */
  private def ivfSqTop10SqlAt(k: Int, nprobe: Int): String =
    s"""WITH ${kmeansCteOn("TRUE", k)},
         |mm AS (SELECT u.p AS pos,
         |    min(embedding[CAST(u.p + 1 AS INT)]::DOUBLE) AS mn,
         |    max(embedding[CAST(u.p + 1 AS INT)]::DOUBLE) AS mx
         |  FROM embeddings, unnest(range(0, 64)) AS u(p) GROUP BY 1),
         |mml AS (SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs FROM mm),
         |q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
         |  FROM embeddings WHERE vec_id = 0),
         |qc AS (SELECT c.cid, floor(list_sum(list_transform(range(1,65),
         |      i -> (q.qv[CAST(i AS INT)] - c.v[CAST(i AS INT)])
         |         * (q.qv[CAST(i AS INT)] - c.v[CAST(i AS INT)]))) * 1e6 + 0.5) / 1e6 AS dr
         |  FROM c2 c CROSS JOIN q),
         |probe AS (SELECT cid FROM qc ORDER BY dr, cid LIMIT $nprobe),
         |cand AS (SELECT s.vec_id, s.cid, s.embedding FROM s2f s
         |  WHERE s.vec_id <> 0 AND s.cid IN (SELECT cid FROM probe)),
         |enc AS (SELECT c.vec_id, c.cid,
         |    list_transform(range(1,65), i -> CASE WHEN m.mxs[CAST(i AS INT)] = m.mns[CAST(i AS INT)] THEN 0
         |      ELSE CAST(floor((c.embedding[CAST(i AS INT)]::DOUBLE - m.mns[CAST(i AS INT)])
         |        / (m.mxs[CAST(i AS INT)] - m.mns[CAST(i AS INT)]) * 255 + 0.5) AS INT) END) AS code
         |  FROM cand c CROSS JOIN mml m),
         |dd AS (SELECT enc.vec_id, enc.cid,
         |    floor(list_sum(list_transform(range(1,65),
         |      i -> (m.mns[CAST(i AS INT)] + enc.code[CAST(i AS INT)] * ((m.mxs[CAST(i AS INT)] - m.mns[CAST(i AS INT)]) / 255) - q.qv[CAST(i AS INT)])
         |         * (m.mns[CAST(i AS INT)] + enc.code[CAST(i AS INT)] * ((m.mxs[CAST(i AS INT)] - m.mns[CAST(i AS INT)]) / 255) - q.qv[CAST(i AS INT)]))) * 1e6 + 0.5) / 1e6 AS dist
         |  FROM enc CROSS JOIN mml m CROSS JOIN q)
         |SELECT vec_id, CAST(cid AS INT) AS cell_id, dist FROM dd
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin

  private lazy val ivfSqTop10Sql: String = ivfSqTop10SqlAt(8, 4)

  /** Twin of ann_bq_retrain — the CENTERED-BQ chain end to end: per-dim
    * thresholds as fixed-point means over the corpus (trunc·2²⁴ BIGINT
    * sums — the exact arithmetic [[graft.operators.Similarity.bqThresholds]]
    * performs, so both engines derive bit-identical doubles), signatures
    * and the query packed against the SAME thresholds, integer Hamming
    * pre-rank, exact-cosine rerank. No notion of the sign-at-zero build,
    * the append, or the swap. */
  private lazy val bqCenteredTop10Sql: String = {
    def pack(v: String, lo: Int, hi: Int, off: Int) =
      s"""CAST(list_sum(list_transform(range($lo,$hi), i ->
         |      CASE WHEN $v[CAST(i AS INT)]::DOUBLE > t.tv[CAST(i AS INT)]
         |        THEN (CAST(1 AS BIGINT) << CAST(i-$off AS INT)) ELSE 0 END)) AS BIGINT)""".stripMargin
    s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0),
       |thrm AS (SELECT u.p AS pos,
       |    CAST(sum(CAST(trunc(embedding[CAST(u.p + 1 AS INT)]::DOUBLE * 16777216) AS BIGINT)) AS DOUBLE)
       |      / count(*) / 16777216 AS t
       |  FROM corpus, unnest(range(0, 64)) AS u(p) GROUP BY 1),
       |thr AS (SELECT list(t ORDER BY pos) AS tv FROM thrm),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |qs AS (SELECT ${pack("q.qv", 1, 33, 1)} AS qlo,
       |    ${pack("q.qv", 33, 65, 33)} AS qhi
       |  FROM q CROSS JOIN thr t),
       |sig AS (SELECT c.vec_id, ${pack("c.embedding", 1, 33, 1)} AS lo,
       |    ${pack("c.embedding", 33, 65, 33)} AS hi
       |  FROM corpus c CROSS JOIN thr t),
       |short AS (SELECT s.vec_id,
       |    CAST(bit_count(xor(s.lo, t.qlo)) + bit_count(xor(s.hi, t.qhi)) AS INT) AS hamming
       |  FROM sig s CROSS JOIN qs t
       |  ORDER BY hamming, vec_id LIMIT 40)
       |SELECT sh.vec_id, sh.hamming, round(
       |    list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE)) /
       |    sqrt(list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * e.embedding[CAST(i AS INT)]::DOUBLE)) *
       |         list_sum(list_transform(range(1,65), i -> q.qv[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE))), 6) AS cosine
       |FROM short sh JOIN embeddings e USING (vec_id) CROSS JOIN q
       |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin
  }

  private lazy val annProbedTop10Sql: String = annProbedTop10SqlAt(16, 3)

  /** The probed-top-10 twin at ANY router geometry: k-means re-derived
    * relationally at (`ncells`, `iters`), 4-cell probe, exact distance
    * inside the probed cells. Parameterized so maintenance verbs that
    * CHANGE the geometry (`ann_ivf_retrain` rebuilds at 8 cells) get
    * the same full-hash proof as the build-time queries. */
  private def annProbedTop10SqlAt(ncells: Int, iters: Int): String =
    s"""WITH ${simIvfCte(ncells, iters)},
       |q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
       |  FROM embeddings WHERE vec_id = 0),
       |pqd AS (SELECT c.cid, list_sum(list_transform(range(1,65),
       |    i -> (q.qv[CAST(i AS INT)] - c.v[CAST(i AS INT)])
       |       * (q.qv[CAST(i AS INT)] - c.v[CAST(i AS INT)]))) AS dr
       |  FROM sc$iters c CROSS JOIN q),
       |probe AS (SELECT cid FROM pqd ORDER BY dr, cid LIMIT 4),
       |cand AS (SELECT s.vec_id, s.cid, s.embedding FROM scellf s
       |  WHERE s.cid IN (SELECT cid FROM probe)),
       |dd AS (SELECT c.vec_id, c.cid, list_sum(list_transform(range(1,65),
       |    i -> (c.embedding[CAST(i AS INT)]::DOUBLE - q.qv[CAST(i AS INT)])
       |       * (c.embedding[CAST(i AS INT)]::DOUBLE - q.qv[CAST(i AS INT)]))) AS dr
       |  FROM cand c CROSS JOIN q)
       |SELECT d.vec_id, e2.label, CAST(d.cid AS INT) AS cell_id
       |FROM (SELECT * FROM dd ORDER BY dr, vec_id LIMIT 10) d
       |JOIN embeddings e2 ON e2.vec_id = d.vec_id
       |ORDER BY d.vec_id""".stripMargin

  /** The hyperplane-signature expression for one seeded table —
    * regenerates [[graft.operators.Similarity]]'s scala.util.Random
    * Gaussian draw and inlines the planes as double literals
    * (float->double is exact; Double.toString round-trips), so bit i =
    * sign(left-to-right dot) is reproduced with no shared code. */
  private def lshBucketExprSql(seed: Long, nBits: Int): String = {
    val rng = new scala.util.Random(seed)
    val planes = Array.fill(nBits)(Array.fill(64)(rng.nextGaussian().toFloat))
    planes.zipWithIndex.map { case (p, bit) =>
      val lits = p.map(f => f.toDouble.toString).mkString("[", ", ", "]")
      s"""CASE WHEN list_sum(list_transform(range(1,65),
         |    i -> e.embedding[CAST(i AS INT)]::DOUBLE * ($lits)[CAST(i AS INT)]))
         |  >= 0 THEN CAST(${1L << bit} AS BIGINT) ELSE CAST(0 AS BIGINT) END""".stripMargin
    }.mkString("\n + ")
  }

  /** Twin of [[graft.operators.Similarity.lshMultiProbeTopK]] at the
    * gate configuration: the probe set (per-bit query dots against the
    * regenerated plane literals, lowest-|margin| flips, xors) is
    * derived IN SQL, then signatures filter to the probed buckets and
    * exact cosine ranks — every stage relational. */
  private lazy val lshMultiProbeSql: String = {
    val rng = new scala.util.Random(42L)
    val planes = Array.fill(6)(Array.fill(64)(rng.nextGaussian().toFloat))
    val dotArms = planes.zipWithIndex.map { case (h, i) =>
      val lits = h.map(f => f.toDouble.toString).mkString("[", ", ", "]")
      s"""SELECT $i AS i, list_sum(list_transform(range(1,65),
         |    j -> q.qv[CAST(j AS INT)]::DOUBLE * ($lits)[CAST(j AS INT)])) AS dp FROM q""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |qd AS ($dotArms),
       |qb AS (SELECT CAST(sum(CASE WHEN dp >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS base FROM qd),
       |fl AS (SELECT i FROM qd ORDER BY abs(dp), i LIMIT 3),
       |probes AS (SELECT base AS b FROM qb
       |  UNION ALL SELECT CAST(xor(qb.base, CAST(1 AS BIGINT) << fl.i) AS BIGINT) FROM qb CROSS JOIN fl),
       |sig AS (SELECT vec_id, (${lshBucketExprSql(42L, 6)}) AS lsh_bucket
       |  FROM embeddings e),
       |cand AS (SELECT s.vec_id, s.lsh_bucket FROM sig s
       |  WHERE s.lsh_bucket IN (SELECT b FROM probes)),
       |resc AS (SELECT c.vec_id, c.lsh_bucket, round(
       |    list_sum(list_transform(range(1,65), i -> e2.embedding[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE)) /
       |    sqrt(list_sum(list_transform(range(1,65), i -> e2.embedding[CAST(i AS INT)]::DOUBLE * e2.embedding[CAST(i AS INT)]::DOUBLE)) *
       |         list_sum(list_transform(range(1,65), i -> q.qv[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE))), 6) AS cosine
       |  FROM cand c JOIN embeddings e2 ON e2.vec_id = c.vec_id CROSS JOIN q)
       |SELECT vec_id, lsh_bucket, cosine, rank FROM (
       |  SELECT vec_id, lsh_bucket, cosine,
       |    row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank FROM resc)
       |WHERE rank <= 10 ORDER BY rank""".stripMargin
  }

  private lazy val lshBucketsSql: String =
    s"""WITH b AS (SELECT vec_id, (${lshBucketExprSql(42L, 12)}) AS lsh_bucket
       |  FROM embeddings e)
       |SELECT lsh_bucket, count(*) AS n_vectors FROM b
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** The 8-table signature relation (seeds 42..49, 8 bits) shared by the
    * dedup_embedding_lsh and mine_hard_negatives_lsh twins — the same
    * planes [[graft.operators.Similarity]]'s lshTabled derives. */
  private lazy val lshSigArms: String = (0 until 8).map { t =>
    s"""SELECT vec_id, $t AS t, (${lshBucketExprSql(42L + t, 8)}) AS bucket
       |FROM embeddings e""".stripMargin
  }.mkString("\nUNION ALL\n")

  /** Twin of dedup_embedding_lsh: with deterministic seeded planes the
    * "approximate" banded join is exactly computable — candidates =
    * any-table bucket collision, exact cosine verify with the repo's
    * floor-form round6 at threshold 0.35. */
  private lazy val dedupEmbeddingLshSql: String =
    s"""WITH sigs AS (
       |$lshSigArms),
       |cand AS (SELECT DISTINCT s1.vec_id AS id_a, s2.vec_id AS id_b
       |  FROM sigs s1 JOIN sigs s2
       |    ON s1.t = s2.t AND s1.bucket = s2.bucket AND s1.vec_id < s2.vec_id)
       |SELECT c.id_a, c.id_b,
       |  floor(($cosineDouble) * 1e6 + 0.5) / 1e6 AS cosine
       |FROM cand c
       |JOIN embeddings a ON a.vec_id = c.id_a
       |JOIN embeddings b ON b.vec_id = c.id_b
       |WHERE floor(($cosineDouble) * 1e6 + 0.5) / 1e6 >= 0.35
       |ORDER BY id_a, id_b""".stripMargin

  /** Twin of mine_hard_negatives_lsh: same signature relation; anchors
    * are the %100 slice, candidates any-table collisions (self
    * excluded), exact-cosine band [0.30, 0.98) with HALF-UP round6 (the
    * operator's round(); positive band, so floor-form agrees), top-5
    * per anchor by (cosine desc, id). */
  private lazy val mineHardNegativesLshSql: String =
    s"""WITH sigs AS (
       |$lshSigArms),
       |asig AS (SELECT vec_id AS anchor_id, t, bucket FROM sigs WHERE vec_id % 100 = 0),
       |cand AS (SELECT DISTINCT ax.anchor_id, s.vec_id AS cid
       |  FROM asig ax JOIN sigs s
       |    ON ax.t = s.t AND ax.bucket = s.bucket AND ax.anchor_id <> s.vec_id),
       |sc AS (SELECT c.anchor_id, c.cid, round($cosineDouble, 6) AS cosine
       |  FROM cand c
       |  JOIN embeddings a ON a.vec_id = c.anchor_id
       |  JOIN embeddings b ON b.vec_id = c.cid),
       |bandd AS (SELECT * FROM sc WHERE cosine >= 0.30 AND cosine < 0.98),
       |r AS (SELECT anchor_id, cid, cosine,
       |    row_number() OVER (PARTITION BY anchor_id ORDER BY cosine DESC, cid) AS rank
       |  FROM bandd)
       |SELECT anchor_id, cid AS vec_id, CAST(rank AS BIGINT) AS rank, cosine
       |FROM r WHERE rank <= 5 ORDER BY anchor_id, rank""".stripMargin

  /** Unrolled twin of [[graft.operators.Similarity.trainCentroidArrays]]
    * + `withCellId` — the OTHER deterministic quantizer (the Similarity
    * tier's, distinct from Clustering's in three ways the twin must
    * mirror exactly): seeds are the `k` smallest vec_ids (not residue
    * classes), the fixed-point Lloyd sum TRUNCATES toward zero (Scala's
    * double→long cast; `trunc`, not `floor`), and cell assignment
    * argmins over the UNROUNDED left-to-right double l2 (ties to lowest
    * cid). The training sampleCap (100k, md5-ordered TakeOrdered) never
    * binds at gate scale (<=2000 vectors), so the twin trains on every
    * row. Ends at `scellf` = (vec_id, embedding, cid) under the FINAL
    * centroids `sc<iters>`. */
  private def simIvfCte(k: Int, iters: Int, srcWhere: String = "TRUE",
                        pfx: String = "s"): String = {
    def rawDist(c: String) =
      s"""list_sum(list_transform(range(1,65),
         |      i -> (e.embedding[CAST(i AS INT)]::DOUBLE - $c.v[CAST(i AS INT)])
         |         * (e.embedding[CAST(i AS INT)]::DOUBLE - $c.v[CAST(i AS INT)])))""".stripMargin
    def round(i: Int, prev: String): String =
      s"""${pfx}d$i AS (SELECT e.vec_id, e.embedding, c.cid, ${rawDist("c")} AS dr
         |  FROM ${pfx}src e CROSS JOIN $prev c),
         |${pfx}a$i AS (SELECT vec_id, embedding, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dr, cid) AS rn FROM ${pfx}d$i),
         |${pfx}s$i AS (SELECT vec_id, embedding, cid FROM ${pfx}a$i WHERE rn = 1),
         |${pfx}m$i AS (SELECT cid, u.p AS pos,
         |    CAST(sum(CAST(trunc(embedding[CAST(u.p + 1 AS INT)]::DOUBLE * 16777216) AS BIGINT)) AS DOUBLE)
         |      / count(*) / 16777216 AS mval
         |  FROM ${pfx}s$i, unnest(range(0, 64)) AS u(p) GROUP BY 1, 2),
         |${pfx}cm$i AS (SELECT cid, list(CAST(CAST(mval AS FLOAT) AS DOUBLE) ORDER BY pos) AS v
         |  FROM ${pfx}m$i GROUP BY 1),
         |${pfx}c$i AS (SELECT * FROM ${pfx}cm$i UNION ALL
         |  SELECT * FROM $prev p WHERE p.cid NOT IN (SELECT cid FROM ${pfx}cm$i))""".stripMargin
    s"""${pfx}src AS (SELECT vec_id, embedding FROM embeddings WHERE $srcWhere),
       |${pfx}seeds AS (SELECT embedding, row_number() OVER (ORDER BY vec_id) - 1 AS cid
       |  FROM (SELECT * FROM ${pfx}src ORDER BY vec_id LIMIT $k)),
       |${pfx}c0 AS (SELECT cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM ${pfx}seeds),
       |${(1 to iters).map(i => round(i, s"${pfx}c${i - 1}")).mkString(",\n")},
       |${pfx}df AS (SELECT e.vec_id, e.embedding, c.cid, ${rawDist(s"c")} AS dr
       |  FROM embeddings e CROSS JOIN ${pfx}c$iters c),
       |${pfx}af AS (SELECT vec_id, embedding, cid, dr,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dr, cid) AS rn FROM ${pfx}df),
       |${pfx}cellf AS (SELECT vec_id, embedding, cid FROM ${pfx}af WHERE rn = 1)""".stripMargin
  }

  /** Shared twin of ann_bq_topk / ann_bq_store (identical answers — the
    * stored signature layout is invisible): 1-bit binary quantization is
    * FULLY deterministic (sign tests, integer XOR/popcount, (hamming, id)
    * / (cosine, id) orderings), so the whole pre-rank + rerank pipeline
    * is plain SQL. Signatures pack into two 32-bit halves carried as
    * BIGINTs — bit 63 is never touched, so signed-shift semantics can't
    * diverge between engines; the dedup_simhash precedent proves
    * bit_count(xor(..)) parity. */
  private lazy val bqTop10Sql: String =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |qs AS (SELECT
      |    CAST(list_sum(list_transform(range(1,33), i ->
      |      CASE WHEN qv[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-1 AS INT)) ELSE 0 END)) AS BIGINT) AS qlo,
      |    CAST(list_sum(list_transform(range(33,65), i ->
      |      CASE WHEN qv[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-33 AS INT)) ELSE 0 END)) AS BIGINT) AS qhi
      |  FROM q),
      |sig AS (SELECT vec_id,
      |    CAST(list_sum(list_transform(range(1,33), i ->
      |      CASE WHEN embedding[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-1 AS INT)) ELSE 0 END)) AS BIGINT) AS lo,
      |    CAST(list_sum(list_transform(range(33,65), i ->
      |      CASE WHEN embedding[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-33 AS INT)) ELSE 0 END)) AS BIGINT) AS hi
      |  FROM embeddings WHERE vec_id <> 0),
      |short AS (SELECT s.vec_id,
      |    CAST(bit_count(xor(s.lo, t.qlo)) + bit_count(xor(s.hi, t.qhi)) AS INT) AS hamming
      |  FROM sig s CROSS JOIN qs t
      |  ORDER BY hamming, vec_id LIMIT 40)
      |SELECT sh.vec_id, sh.hamming, round(
      |    list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE)) /
      |    sqrt(list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * e.embedding[CAST(i AS INT)]::DOUBLE)) *
      |         list_sum(list_transform(range(1,65), i -> q.qv[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE))), 6) AS cosine
      |FROM short sh JOIN embeddings e USING (vec_id) CROSS JOIN q
      |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin

  // text-analysis shared fragments
  private val toks = """string_split_regex(trim(lower(text)), '\s+')"""
  private val enStop = "['the','a','of','and','is','to','in']"

  /** Oracle side of the source round-trip checksum: the same aggregate
    * straight off the parquet table — equality with the engine's
    * write+read-back result proves the interchange format is lossless. */
  private val roundtripChecksumSql =
    """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
      |  min(md5(text)) AS md5_lo, max(md5(text)) AS md5_hi
      |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** WARC variant adds an id sum: header parsing (record id out of the
    * WARC-Record-ID header), not just payload transport, must survive
    * the write+split+parse cycle. */
  private val warcChecksumSql =
    """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
      |  min(md5(text)) AS md5_lo, max(md5(text)) AS md5_hi
      |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** CTE chain ending in dec(doc_id, quality, avg_logp, decision) — the
    * oracle twin of GraftQueries.cleanCorpusDecisions (quality gate ->
    * unigram-LM gate at -3.43 -> exact dedup -> MinHash near-dup, first
    * failing reason wins). Shared by pipeline_clean_corpus (per-doc
    * audit) and pipeline_clean_mix (mix report over kept docs). */
  private lazy val cleanDecisionCtes =
    s"""tk AS (SELECT doc_id, unnest($toks) AS token FROM documents),
       |v AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tk
       |    GROUP BY 1 ORDER BY c DESC, token LIMIT 50000),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tk),
       |vc AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM v),
       |sc AS (SELECT tk.doc_id,
       |    CAST(floor(ln((coalesce(v.c, 0) + 1.0) / (total + nv)) * 1048576) AS BIGINT) AS lp
       |  FROM tk LEFT JOIN v USING (token), t, vc),
       |lm AS (SELECT doc_id,
       |    floor(CAST(sum(lp) AS DOUBLE) / count(*) / 1048576 * 1e6 + 0.5) / 1e6 AS avg_logp
       |  FROM sc GROUP BY 1),
       |q AS (SELECT doc_id,
       |    floor(least(1.0,
       |      0.4 * least(len($toks)::DOUBLE / 50.0, 1.0)
       |      + 0.3 * (1.0 - (length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))::DOUBLE / length(text))
       |      + 0.3 * (len(list_distinct($toks))::DOUBLE / len($toks))) * 1e6 + 0.5) / 1e6 AS quality
       |  FROM documents),
       |e AS (SELECT doc_id,
       |    doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
       |  FROM documents),
       |sh AS (SELECT doc_id,
       |    list_distinct(list_transform(range(1, greatest(length(text)-4, 1)+1),
       |      i -> substr(text, i::INT, 5))) AS s
       |  FROM documents),
       |near AS (SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
       |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.8),
       |dec AS (SELECT d.doc_id, q.quality, lm.avg_logp,
       |  CASE WHEN q.quality < 0.3 THEN 'low_quality'
       |       WHEN lm.avg_logp < -3.43 THEN 'lm_gibberish'
       |       WHEN e.is_duplicate THEN 'exact_duplicate'
       |       WHEN d.doc_id IN (SELECT doc_id FROM near) THEN 'near_duplicate'
       |       ELSE 'kept' END AS decision
       |  FROM documents d JOIN q USING (doc_id) JOIN lm USING (doc_id) JOIN e USING (doc_id))""".stripMargin

  /** Exact recursive twin of the reference chunker, PARAMETERIZED by
    * (size, overlap) — the gate tier runs it at 120/20 (`chunkerWalkCte`,
    * the differential-tested configuration) and the flagship
    * `ingest_pipeline` twin at the reference defaults 600/50:
    * walks each doc's cursor exactly like Chunker.chunkText — window end =
    * LAST sentence-boundary start in the window's final 20 chars (+2) if
    * any ('. ','! ','? ','\n\n' — all length 2), else start+120; chunk =
    * strip(text[start, min(end,n))), empty chunks dropped, next start =
    * end-20 (unclamped). Produces `allc(doc_id, start, chunk)`; consumers
    * append their own SELECT. Equivalence is by construction, not data
    * luck (differentially tested: scripts/test_chunk_oracle.py). Shared by
    * chunk_docs and ingest_ids.
    *
    * Known representable divergences (irrelevant for the harness corpus,
    * stated for honesty): the SQL trim strips the 6 ASCII whitespace chars
    * while pyStrip strips full Unicode whitespace (U+00A0/U+2028/...), and
    * DuckDB substr/length count CODEPOINTS while the JVM chunker counts
    * UTF-16 units — so astral-plane characters would desynchronize
    * offsets. Both engines agree for BMP text with ASCII whitespace.
    */
  private def chunkerWalkCteFor(size: Int, overlap: Int): String = {
    val scanFrom = size - overlap
    s"""WITH RECURSIVE
       |b AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |walk AS (
       |  SELECT doc_id, text, n, CAST(0 AS BIGINT) AS start FROM b WHERE n > $size
       |  UNION ALL
       |  SELECT doc_id, text, n, e - $overlap AS start FROM (
       |    SELECT doc_id, text, n,
       |      CASE WHEN start + $size < n THEN coalesce(list_max(list_filter(list_transform(
       |             range(start+$scanFrom, start+$size),
       |             i -> CASE WHEN substr(text, CAST(i+1 AS INT), 2)
       |                       IN ('. ', '! ', '? ', chr(10)||chr(10)) THEN i+2 END),
       |           x -> x IS NOT NULL)), start+$size)
       |        ELSE start + $size END AS e
       |    FROM walk WHERE start < n)),
       |steps AS (
       |  SELECT doc_id, start, text, n,
       |    CASE WHEN start + $size < n THEN coalesce(list_max(list_filter(list_transform(
       |           range(start+$scanFrom, start+$size),
       |           i -> CASE WHEN substr(text, CAST(i+1 AS INT), 2)
       |                     IN ('. ', '! ', '? ', chr(10)||chr(10)) THEN i+2 END),
       |         x -> x IS NOT NULL)), start+$size)
       |      ELSE start + $size END AS e
       |  FROM walk WHERE start < n),
       |big AS (
       |  SELECT doc_id, start,
       |    trim(substr(text, CAST(start+1 AS INT), CAST(least(e, n) - start AS INT)),
       |         ' ' || chr(10) || chr(13) || chr(9) || chr(12) || chr(11)) AS chunk
       |  FROM steps),
       |allc AS (
       |  SELECT doc_id, CAST(0 AS BIGINT) AS start, text AS chunk FROM b WHERE n <= $size
       |  UNION ALL
       |  SELECT doc_id, start, chunk FROM big WHERE length(chunk) > 0)""".stripMargin
  }

  private val chunkerWalkCte = chunkerWalkCteFor(120, 20)

  /** BM25 corpus CTE for an arbitrary literal term set (k1=1.2, b=0.75):
    * per-doc tf/dl, one stats row, floor-rounded score with the term
    * partials added in fixed term order — the exact expression tree
    * [[graft.text.TextAnalysis.bm25TopK]] and the stored-index search
    * ([[graft.text.TextIndex.bm25SearchStored]]) both build. */
  private def bm25CteFor(terms: Seq[String]): String =
    "WITH " + bm25BodyFor(terms)

  /** [[bm25CteFor]] without the leading WITH — for composition with
    * other CTE bodies (the stored hybrid twin). */
  private def bm25BodyFor(terms: Seq[String], p: String = "",
                          src: String = "documents"): String = {
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"    CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x = '$t')) AS BIGINT) AS tf$i"
    }.mkString(",\n")
    val dfCols = terms.indices.map { i =>
      s"    CAST(count(*) FILTER (WHERE tf$i > 0) AS BIGINT) AS df$i"
    }.mkString(",\n")
    val scoreTerms = terms.indices.map { i =>
      s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * (CAST(tf$i AS DOUBLE) * 2.2) / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / n)))"
    }.mkString("\n    + ")
    s"""${p}d AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS dl,
       |$tfCols
       |  FROM $src),
       |${p}s AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sumdl,
       |$dfCols
       |  FROM ${p}d),
       |${p}bm AS (
       |  SELECT doc_id, dl, floor((
       |      $scoreTerms
       |    ) * 1e4 + 0.5) / 1e4 AS bm25
       |  FROM ${p}d, ${p}s)""".stripMargin
  }

  /** Shared BM25 corpus CTE (terms hash/merge/window/stream) — used by
    * text_bm25 and rag_bm25_fusion. */
  private val bm25Cte = bm25CteFor(Seq("hash", "merge", "window", "stream"))

  /** Percolation twin shared by the batch and streaming forms: the
    * registered query relation as VALUES, docs' distinct tokens
    * unnested, a query matches when every one of its terms hits. */
  private val percolateSql =
    s"""WITH q(q_id, term) AS (VALUES
       |  ('q_joins','join'), ('q_joins','merge'),
       |  ('q_vector','vector'), ('q_vector','scan'),
       |  ('q_stream','stream'), ('q_stream','window'), ('q_stream','batch'),
       |  ('q_agg','customer'), ('q_agg','agg')),
       |qn AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_terms
       |  FROM q GROUP BY q_id),
       |dt AS (SELECT doc_id,
       |    unnest(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS term
       |  FROM documents),
       |m AS (SELECT q.q_id, dt.doc_id, CAST(count(*) AS BIGINT) AS n_hit
       |  FROM dt JOIN q USING (term) GROUP BY 1, 2)
       |SELECT m.q_id, m.doc_id, qn.n_terms FROM m JOIN qn USING (q_id)
       |WHERE m.n_hit = qn.n_terms ORDER BY m.q_id, m.doc_id""".stripMargin

  val all: Map[String, String] = Map(

    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,4))),2) AS DOUBLE) AS sum_qty,
         |  CAST(round(sum($px),2) AS DOUBLE) AS sum_base_price,
         |  CAST(round(sum($revenue),2) AS DOUBLE) AS sum_disc_price,
         |  CAST(round(sum($revenue * CAST((1 + l_tax) AS DECIMAL(6,4))),2) AS DOUBLE) AS sum_charge,
         |  round(CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / count(*), 4) AS avg_qty,
         |  round(CAST(sum($px) AS DOUBLE) / count(*), 4) AS avg_price,
         |  round(CAST(sum(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) / count(*), 4) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q2_top_revenue_orders" ->
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, c_name,
         |  CAST(round(sum($revenue),2) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY 1,2,3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q3_nation_revenue" ->
      s"""SELECT n_name, CAST(round(sum($revenue),2) AS DOUBLE) AS revenue, count(*) AS n_lineitems
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' AND o_orderdate < TIMESTAMP '1999-01-01'
         |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,

    "q4_forecast_revenue" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(12,4))),2) AS DOUBLE) AS revenue, count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24""".stripMargin,

    "q5_top_customers_per_nation" ->
      """SELECT n_name, rk, c_custkey, c_name, acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_name, round(c_acctbal,2) AS acctbal,
        |    CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rk
        |  FROM customer) c
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE rk <= 3 ORDER BY n_name, rk""".stripMargin,

    "q6_orders_rollup" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS status,
        |  coalesce(o_orderpriority,'ALL') AS priority,
        |  count(*) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,4))),2) AS DOUBLE) AS sum_totalprice
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q13_cube" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rflag,
        |  coalesce(l_linestatus,'ALL') AS lstatus,
        |  count(*) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,4))),2) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin,

    "q14_sql_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q15_interval_join" ->
      """WITH l AS (SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |m AS (SELECT user_id, ts, event_id,
        |    CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 1800 SECOND THEN 1 ELSE 0 END AS new_session
        |  FROM l),
        |s AS (SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM m),
        |g AS (SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end
        |  FROM s GROUP BY 1,2),
        |closed AS (SELECT * FROM (SELECT *, max(session_id) OVER (PARTITION BY user_id) AS mx FROM g)
        |  WHERE session_id < mx)
        |SELECT c.user_id,
        |  strftime(c.session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n_errors
        |FROM closed c JOIN events e
        |  ON e.user_id = c.user_id AND e.event_type = 'error'
        | AND e.ts >= c.session_start AND e.ts <= c.session_end
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q16_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q7_segment_orders" ->
      """WITH f AS (SELECT c_mktsegment,
        |  EXISTS(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AS has_o
        |  FROM customer c)
        |SELECT c_mktsegment,
        |  count(*) FILTER (WHERE has_o) AS n_with_orders,
        |  count(*) FILTER (WHERE NOT has_o) AS n_without_orders
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    "q8_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS n_events, round(sum(value),4) AS sum_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q9_events_props" ->
      """SELECT regexp_extract(props, '"k": (\d+)', 1)::INT % 10 AS k_bucket,
        |  count(*) AS n_events, round(avg(value),4) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q10_sessionize" ->
      """WITH l AS (SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |m AS (SELECT user_id, ts, event_id,
        |    CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 1800 SECOND THEN 1 ELSE 0 END AS new_session
        |  FROM l),
        |s AS (SELECT user_id,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM m)
        |SELECT user_id, max(session_id) AS n_sessions, count(*) AS n_events
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    // equal-ts right rows are deduped to the max event_id BEFORE the ASOF
    // join — mirrors the engine's rightTieCols=Seq("event_id") tiebreak
    // (DuckDB's ASOF pick among equal-ts rows is otherwise arbitrary)
    "q11_asof_purchase_click" ->
      """SELECT p.user_id, p.event_id, c.event_id AS matched_event_id,
        |  round(c.value,4) AS matched_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'click') WHERE rn = 1) c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY 1,2""".stripMargin,

    "collection_stats" ->
      """SELECT (SELECT count(*) FROM documents) AS n_documents,
        |  (SELECT count(DISTINCT source) FROM documents) AS n_sources,
        |  (SELECT count(DISTINCT lang) FROM documents) AS n_langs,
        |  (SELECT count(*) FROM embeddings) AS n_embeddings""".stripMargin,

    "where_dsl_filter" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE lang IN ('en','fr') AND n_chars > 200 AND source <> 'src3'
        |ORDER BY doc_id""".stripMargin,

    "collection_lifecycle" ->
      """SELECT lang, count(*) AS n_docs, count(DISTINCT source) AS n_sources
        |FROM documents WHERE lang IN ('en','zh')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Twin of streaming_upsert: the converged live view of the CDC
    // stream — standing slice (doc_id % 10 != 7) + streamed inserts
    // (== 7) + streamed replacements (== 3, upper(text)), minus the
    // post-stream delete (% 9 == 0). Every doc_id ends up present
    // exactly once unless deleted.
    "streaming_upsert" ->
      """SELECT doc_id, source,
        |  CASE WHEN doc_id % 10 = 3 THEN upper(text) ELSE text END AS text
        |FROM documents WHERE doc_id % 9 <> 0 ORDER BY doc_id""".stripMargin,

    // Twin of collection_mutate: the mutation sequence (create <=300,
    // upsert 250..350 with upper(text), update source='edited' for
    // <=20, delete doc_id % 7 == 0) restated as plain SQL — the final
    // live view must hash-match, proving the tombstone merge resolves
    // write sequences exactly.
    "collection_mutate" ->
      """WITH base AS (
        |  SELECT doc_id, source, text FROM documents WHERE doc_id <= 300),
        |ups AS (
        |  SELECT doc_id, source, upper(text) AS text FROM documents
        |  WHERE doc_id BETWEEN 250 AND 350),
        |st1 AS (
        |  SELECT * FROM ups
        |  UNION ALL
        |  SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM ups)),
        |st2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id <= 20 THEN 'edited' ELSE source END AS source,
        |    text
        |  FROM st1)
        |SELECT doc_id, source, text FROM st2
        |WHERE doc_id % 7 <> 0 ORDER BY doc_id""".stripMargin,

    // Twin of collection_snapshot: both retained historical states of
    // the collection_mutate sequence — the post-upsert snapshot (st1)
    // and the final live view (post-update, post-delete) — restated in
    // SQL with no notion of sequences or tombstones. A hash match
    // proves the seq-bounded merge reconstructs history exactly.
    "collection_snapshot" ->
      """WITH base AS (
        |  SELECT doc_id, source, text FROM documents WHERE doc_id <= 300),
        |ups AS (
        |  SELECT doc_id, source, upper(text) AS text FROM documents
        |  WHERE doc_id BETWEEN 250 AND 350),
        |st1 AS (
        |  SELECT * FROM ups
        |  UNION ALL
        |  SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM ups)),
        |st2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id <= 20 THEN 'edited' ELSE source END AS source,
        |    text
        |  FROM st1),
        |fin AS (SELECT doc_id, source, text FROM st2 WHERE doc_id % 7 <> 0)
        |SELECT 'post_upsert' AS snapshot, doc_id, source, text FROM st1
        |UNION ALL
        |SELECT 'final' AS snapshot, doc_id, source, text FROM fin
        |ORDER BY snapshot, doc_id""".stripMargin,

    // Twin of collection_cdc_batches: each write of the mutation
    // sequence re-derived as its own change batch. Batch 1 = the upsert
    // (updates where the value ACTUALLY changed + inserts of new ids),
    // batch 2 = the partial update's effects (skip rows already
    // 'edited'), batch 3 = the delete (pre-delete payloads). The
    // value-changed predicates mirror changesBetween's null-safe struct
    // compare exactly.
    "collection_cdc_batches" ->
      """WITH base AS (
        |  SELECT doc_id, source, text FROM documents WHERE doc_id <= 300),
        |ups AS (
        |  SELECT doc_id, source, upper(text) AS text FROM documents
        |  WHERE doc_id BETWEEN 250 AND 350),
        |st1 AS (
        |  SELECT * FROM ups
        |  UNION ALL
        |  SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM ups)),
        |st2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id <= 20 THEN 'edited' ELSE source END AS source,
        |    text
        |  FROM st1),
        |batches AS (
        |  SELECT CAST(1 AS BIGINT) AS batch_seq, 'update' AS change,
        |      u.doc_id, u.source, u.text
        |    FROM ups u JOIN base b ON b.doc_id = u.doc_id
        |    WHERE u.source IS DISTINCT FROM b.source
        |       OR u.text IS DISTINCT FROM b.text
        |  UNION ALL
        |  SELECT 1, 'insert', doc_id, source, text FROM ups
        |    WHERE doc_id NOT IN (SELECT doc_id FROM base)
        |  UNION ALL
        |  SELECT 2, 'update', doc_id, 'edited', text FROM st1
        |    WHERE doc_id <= 20 AND source <> 'edited'
        |  UNION ALL
        |  SELECT 3, 'delete', doc_id, source, text FROM st2
        |    WHERE doc_id % 7 = 0)
        |SELECT batch_seq, change, doc_id, source, text
        |FROM batches ORDER BY batch_seq, change, doc_id""".stripMargin,

    // Twin of collection_diff: the CDC read between the creation state
    // (st0 = docs <= 300) and the final state (fin) of the
    // collection_mutate sequence, re-derived purely from the two SQL
    // states — inserts (in fin only), deletes (in st0 only, OLD
    // payload), updates (both, any column differs, NEW payload).
    "collection_diff" ->
      """WITH st0 AS (
        |  SELECT doc_id, source, text FROM documents WHERE doc_id <= 300),
        |ups AS (
        |  SELECT doc_id, source, upper(text) AS text FROM documents
        |  WHERE doc_id BETWEEN 250 AND 350),
        |st1 AS (
        |  SELECT * FROM ups
        |  UNION ALL
        |  SELECT * FROM st0 WHERE doc_id NOT IN (SELECT doc_id FROM ups)),
        |fin AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id <= 20 THEN 'edited' ELSE source END AS source,
        |    text
        |  FROM st1 WHERE doc_id % 7 <> 0)
        |SELECT 'insert' AS change, f.doc_id, f.source, f.text FROM fin f
        |  WHERE f.doc_id NOT IN (SELECT doc_id FROM st0)
        |UNION ALL
        |SELECT 'delete', o.doc_id, o.source, o.text FROM st0 o
        |  WHERE o.doc_id NOT IN (SELECT doc_id FROM fin)
        |UNION ALL
        |SELECT 'update', f.doc_id, f.source, f.text
        |  FROM fin f JOIN st0 o ON f.doc_id = o.doc_id
        |  WHERE f.source IS DISTINCT FROM o.source
        |     OR f.text IS DISTINCT FROM o.text
        |ORDER BY change, doc_id""".stripMargin,

    // Twin of collection_cdc_delta: the collection_diff change set
    // cross-joined with the two tier tags — the oracle has no notion of
    // tiers because BOTH delta code paths must equal the plain diff.
    "collection_cdc_delta" ->
      """WITH st0 AS (
        |  SELECT doc_id, source, text FROM documents WHERE doc_id <= 300),
        |ups AS (
        |  SELECT doc_id, source, upper(text) AS text FROM documents
        |  WHERE doc_id BETWEEN 250 AND 350),
        |st1 AS (
        |  SELECT * FROM ups
        |  UNION ALL
        |  SELECT * FROM st0 WHERE doc_id NOT IN (SELECT doc_id FROM ups)),
        |fin AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id <= 20 THEN 'edited' ELSE source END AS source,
        |    text
        |  FROM st1 WHERE doc_id % 7 <> 0),
        |diff AS (
        |  SELECT 'insert' AS change, f.doc_id, f.source, f.text FROM fin f
        |    WHERE f.doc_id NOT IN (SELECT doc_id FROM st0)
        |  UNION ALL
        |  SELECT 'delete', o.doc_id, o.source, o.text FROM st0 o
        |    WHERE o.doc_id NOT IN (SELECT doc_id FROM fin)
        |  UNION ALL
        |  SELECT 'update', f.doc_id, f.source, f.text
        |    FROM fin f JOIN st0 o ON f.doc_id = o.doc_id
        |    WHERE f.source IS DISTINCT FROM o.source
        |       OR f.text IS DISTINCT FROM o.text)
        |SELECT t.tier, d.change, d.doc_id, d.source, d.text
        |FROM diff d CROSS JOIN (VALUES ('isin'), ('semi')) t(tier)
        |ORDER BY tier, change, doc_id""".stripMargin,

    // Twin of collection_fork: the source state (untouched create) and
    // the fork state (upsert 290..330 lower + delete %11) restated
    // independently — a hash match proves the hardlinked fork's history
    // is fully isolated from the source's.
    "collection_fork" ->
      """WITH base AS (
        |  SELECT doc_id, source, text FROM documents WHERE doc_id <= 300),
        |ups AS (
        |  SELECT doc_id, source, lower(text) AS text FROM documents
        |  WHERE doc_id BETWEEN 290 AND 330),
        |brk AS (
        |  SELECT * FROM ups
        |  UNION ALL
        |  SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM ups))
        |SELECT 'source' AS side, doc_id, source, text FROM base
        |UNION ALL
        |SELECT 'fork', doc_id, source, text FROM brk WHERE doc_id % 11 <> 0
        |ORDER BY side, doc_id""".stripMargin,

    // Twin of collection_mutate_compact: the oracle restates the whole
    // mutation sequence (create <=280, delete %5, upsert 260..330 with
    // lower(text), update source='patched' for <=15) with NO notion of
    // the mid-sequence compact — a hash match proves compaction is
    // invisible to every later mutation and the final view.
    "collection_mutate_compact" ->
      """WITH base AS (
        |  SELECT doc_id, source, text FROM documents
        |  WHERE doc_id <= 280 AND doc_id % 5 <> 0),
        |ups AS (
        |  SELECT doc_id, source, lower(text) AS text FROM documents
        |  WHERE doc_id BETWEEN 260 AND 330),
        |st1 AS (
        |  SELECT * FROM ups
        |  UNION ALL
        |  SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM ups))
        |SELECT doc_id,
        |  CASE WHEN doc_id <= 15 THEN 'patched' ELSE source END AS source,
        |  text
        |FROM st1 ORDER BY doc_id""".stripMargin,

    // Twin of collection_compact_dirty: the identical mutation sequence
    // restated with NO notion of the two targeted (dirty-file-only)
    // compaction passes — a hash match proves the journaled
    // promote/delete rewrite of threshold-crossing files is invisible
    // to the live view.
    "collection_compact_dirty" ->
      """WITH base AS (
        |  SELECT doc_id, source, text FROM documents
        |  WHERE doc_id <= 280 AND doc_id % 5 <> 0),
        |ups AS (
        |  SELECT doc_id, source, lower(text) AS text FROM documents
        |  WHERE doc_id BETWEEN 260 AND 330),
        |st1 AS (
        |  SELECT * FROM ups
        |  UNION ALL
        |  SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM ups))
        |SELECT doc_id,
        |  CASE WHEN doc_id <= 15 THEN 'patched' ELSE source END AS source,
        |  text
        |FROM st1 ORDER BY doc_id""".stripMargin,

    // Twin of collection_compact_advisor — the version ledger restated:
    // create(<=300) is seq 1, upsert(250-350) is seq 2, the %7 delete
    // outranks everything; a version is dead when a later version of
    // its id exists or its id was deleted. Counts, the floor-rounded
    // ratio, and the ppm recommendation (dead*1e6 >= n*100000 at the
    // 0.1 threshold) are integer-exact.
    "collection_compact_advisor" ->
      """WITH v AS (
        |  SELECT doc_id, 1 AS seq FROM documents WHERE doc_id <= 300
        |  UNION ALL
        |  SELECT doc_id, 2 AS seq FROM documents WHERE doc_id BETWEEN 250 AND 350),
        |dels AS (SELECT DISTINCT doc_id FROM v WHERE doc_id % 7 = 0),
        |flag AS (SELECT v.doc_id, v.seq,
        |    (EXISTS (SELECT 1 FROM v v2 WHERE v2.doc_id = v.doc_id AND v2.seq > v.seq)
        |     OR v.doc_id IN (SELECT doc_id FROM dels)) AS dead
        |  FROM v)
        |SELECT CAST(count(*) AS BIGINT) AS n_versions,
        |  CAST(count(*) FILTER (WHERE dead) AS BIGINT) AS n_dead,
        |  CAST(count(*) FILTER (WHERE NOT dead) AS BIGINT) AS n_live,
        |  floor(CAST(count(*) FILTER (WHERE dead) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS dead_ratio,
        |  count(*) FILTER (WHERE dead) * 1000000 >= count(*) * 100000 AS recommend_compact
        |FROM flag""".stripMargin,

    // Twin of collection_manifest: DuckDB independently recomputes the
    // SHA-256 binding fingerprint over the SAME canonical string
    // CollectionManifest.canonical builds (family hash, resource '',
    // dim 64, prefixes 'passage: '/'query: ', no merges) and the row
    // count off the source table — the Spark side must round-trip the
    // sidecar and resolve the query embedder to hash-match.
    "collection_manifest" ->
      """SELECT 'hash' AS family, CAST(64 AS INT) AS dim,
        |  'passage: ' AS passage_prefix, 'query: ' AS query_prefix,
        |  CAST(0 AS INT) AS n_merges,
        |  sha256('graft-embedder|hash||64|passage: |query: |') AS fingerprint,
        |  true AS resolved_ok,
        |  count(*) AS n_rows
        |FROM documents""".stripMargin,

    // Twin of collection_modify: the final collection state after the
    // metadata REPLACEMENT + rename + compact, restated literally (the
    // first metadata map must have vanished wholesale — 'version' gone).
    "collection_modify" ->
      """SELECT 'corpus' AS collections,
        |  'owner=search-team;purpose=rag' AS metadata,
        |  true AS survives_compact,
        |  (SELECT count(*) FROM documents WHERE doc_id <= 100) AS n_rows""".stripMargin,

    // Twin of collection_alias: phase v1 reads the even-id slice, phase
    // v2 (post-swap) the full corpus — both through the alias; a
    // resolution or torn-cutover bug diverges from this restatement.
    "collection_alias" ->
      """SELECT 'v1' AS phase, source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 2 = 0 GROUP BY source
        |UNION ALL
        |SELECT 'v2' AS phase, source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source
        |ORDER BY phase, source""".stripMargin,

    // Twin of collection_include: the Chroma get-default projection
    // (ids + documents + metadatas, NO embeddings) as a plain select.
    "collection_include" ->
      """SELECT doc_id, text, source, lang FROM documents
        |WHERE doc_id <= 50 ORDER BY doc_id""".stripMargin,

    "where_dsl_or" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE lang NOT IN ('en','es','fr') OR n_chars <= 120
        |ORDER BY doc_id""".stripMargin,

    // Twin of where_document_filter: Chroma $contains/$not_contains as
    // plain substring tests, nesting as boolean algebra
    "where_document_filter" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE contains(text, 'data')
        |  AND (contains(text, 'stream') OR NOT contains(text, 'hash'))
        |ORDER BY doc_id""".stripMargin,

    "chunk_docs" ->
      s"""$chunkerWalkCte
         |SELECT doc_id,
         |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1 AS INT) AS chunk_index,
         |  doc_id::VARCHAR || '_chunk_' ||
         |    (row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1)::VARCHAR AS chunk_id,
         |  chunk, CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS total_chunks
         |FROM allc ORDER BY doc_id, chunk_index""".stripMargin,

    "ingest_ids" ->
      s"""$chunkerWalkCte
         |SELECT doc_id, chunk_index, chunk_id, sha256(chunk_id) AS id FROM (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1 AS INT) AS chunk_index,
         |    doc_id::VARCHAR || '_chunk_' ||
         |      (row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1)::VARCHAR AS chunk_id
         |  FROM allc)
         |ORDER BY doc_id, chunk_index""".stripMargin,

    // the ingestDocuments prefix: blank docs are filtered BEFORE chunking
    // (reference :132-138), then chunk/metadata/id derivation as above
    "ingest_records" ->
      s"""$chunkerWalkCte
         |SELECT doc_id, chunk_index, chunk_id, sha256(chunk_id) AS id,
         |  chunk, source, total_chunks
         |FROM (
         |  SELECT a.doc_id,
         |    CAST(row_number() OVER (PARTITION BY a.doc_id ORDER BY a.start) - 1 AS INT) AS chunk_index,
         |    a.doc_id::VARCHAR || '_chunk_' ||
         |      (row_number() OVER (PARTITION BY a.doc_id ORDER BY a.start) - 1)::VARCHAR AS chunk_id,
         |    a.chunk, d.source,
         |    CAST(count(*) OVER (PARTITION BY a.doc_id) AS BIGINT) AS total_chunks
         |  FROM allc a JOIN documents d ON a.doc_id = d.doc_id
         |  WHERE length(trim(d.text)) > 0)
         |ORDER BY doc_id, chunk_index""".stripMargin,

    // Twin of ingest_pipeline — the FLAGSHIP leaves the rows-only list:
    // the full deterministic pipeline (blank-filter -> chunk at the
    // reference defaults 600/50 -> chunk ids -> sha256) restates through
    // the parameterized chunker walk, and the embedder column is pinned
    // by its invariant as a constant (the ingest_transformer precedent):
    // HashEmbedder L2-normalizes every non-empty token bag and a
    // non-blank chunk always tokenizes to >= 1 token, so
    // round(norm, 4) = 1.0 on EVERY row — a zero vector, an
    // unnormalized embedder, or a drifted chunker all hash-mismatch.
    "ingest_pipeline" ->
      s"""${chunkerWalkCteFor(600, 50)}
         |SELECT doc_id, chunk_id, chunk_index,
         |  CAST(total_chunks AS INT) AS total_chunks,
         |  sha256(chunk_id) AS id, CAST(1.0 AS DOUBLE) AS embedding_norm
         |FROM (
         |  SELECT a.doc_id,
         |    CAST(row_number() OVER (PARTITION BY a.doc_id ORDER BY a.start) - 1 AS INT) AS chunk_index,
         |    a.doc_id::VARCHAR || '_chunk_' ||
         |      (row_number() OVER (PARTITION BY a.doc_id ORDER BY a.start) - 1)::VARCHAR AS chunk_id,
         |    count(*) OVER (PARTITION BY a.doc_id) AS total_chunks
         |  FROM allc a JOIN documents d ON a.doc_id = d.doc_id
         |  WHERE length(trim(d.text)) > 0)
         |ORDER BY doc_id, chunk_index""".stripMargin,

    // Twin of ingest_transformer: the relational half (per-source
    // doc/chunk counts over non-blank docs) recomputes through the same
    // chunker walk; the model half is pinned by invariants emitted as
    // constants — dim 64 min and max, and every chunk's vector unit-norm
    // (n_unit_norm = n_chunks; the instruction prefix guarantees no
    // empty token list, hence no zero vector)
    "ingest_transformer" ->
      s"""$chunkerWalkCte
         |SELECT d.source,
         |  CAST(count(DISTINCT a.doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(64 AS BIGINT) AS dim_min,
         |  CAST(64 AS BIGINT) AS dim_max,
         |  CAST(count(*) AS BIGINT) AS n_unit_norm
         |FROM allc a JOIN documents d ON a.doc_id = d.doc_id
         |WHERE length(trim(d.text)) > 0
         |GROUP BY d.source ORDER BY d.source""".stripMargin,

    "q28_moving_avg" ->
      """WITH w AS (SELECT event_id, event_type,
        |    count(*) OVER fr AS cnt_1h,
        |    sum(CAST(value AS DECIMAL(12,4))) OVER fr AS sum_1h
        |  FROM events
        |  WINDOW fr AS (PARTITION BY event_type ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |    RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type, cnt_1h,
        |  floor(CAST(sum_1h AS DOUBLE) / cnt_1h * 1e4 + 0.5) / 1e4 AS avg_1h
        |FROM w ORDER BY event_id""".stripMargin,

    "text_scrub_pii" ->
      """SELECT doc_id,
        |  md5(regexp_replace(regexp_replace(text,
        |    '[\w.+-]+@[\w-]+\.[\w.]+', '<EMAIL>', 'g'), '\d{3,}', '<NUM>', 'g')) AS scrubbed_md5,
        |  CAST(len(regexp_extract_all(text, '\d{3,}')) AS BIGINT) AS n_long_nums
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_term_freq" ->
      """WITH t AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents)
        |SELECT term, count(*) AS tf FROM t WHERE length(term) > 0
        |GROUP BY 1 ORDER BY tf DESC, term LIMIT 30""".stripMargin,

    "vec_centroid_per_label" ->
      """WITH e AS (SELECT label, CAST(i-1 AS INT) AS pos,
        |    CAST(floor(embedding[CAST(i AS INT)]::DOUBLE * 16777216) AS BIGINT) AS fp
        |  FROM embeddings, unnest(range(1, 9)) AS t(i))
        |SELECT label, pos,
        |  floor(CAST(sum(fp) AS DOUBLE) / count(*) / 16777216 * 1e6 + 0.5) / 1e6 AS avg_component,
        |  count(*) AS n
        |FROM e GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    // Twin of q45_sql_vector_fn — double accumulation mirrors the
    // VectorDistance kernel (established by vec_knn / dedup_embedding)
    "q45_sql_vector_fn" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |  round(list_sum(list_transform(range(1,65), i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE)) /
         |    sqrt(list_sum(list_transform(range(1,65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)) *
         |         list_sum(list_transform(range(1,65), i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE))), 6) AS cosine,
         |  round($l2sqToQv, 6) AS l2sq
         |FROM embeddings e, q WHERE e.vec_id <> 0
         |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin,

    "cluster_kmeans" ->
      s"""WITH $kmeansCte
         |SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id, dr AS dist
         |FROM a2f WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // SemDeDup twin: the k-means CTE's final assignment gates the pair
    // join; the cosine kernel + floor-form rounding match dedup_embedding
    "dedup_semantic" ->
      s"""WITH $kmeansCte
         |SELECT CAST(a.cid AS BIGINT) AS cluster_id, a.vec_id AS id_a, b.vec_id AS id_b,
         |  floor(($cosineDouble) * 1e6 + 0.5) / 1e6 AS cosine
         |FROM s2f a JOIN s2f b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |WHERE floor(($cosineDouble) * 1e6 + 0.5) / 1e6 >= 0.35
         |ORDER BY 1, 2, 3""".stripMargin,

    "cluster_kmeans_stats" ->
      s"""WITH $kmeansCte
         |SELECT CAST(cid AS BIGINT) AS cluster_id, count(*) AS n,
         |  floor(CAST(sum(CAST(floor(dr * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / count(*) + 0.5) / 1e6 AS mean_dist,
         |  max(dr) AS max_dist
         |FROM a2f WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,

    // train on the standing slice, assign the streamed arrivals — the
    // stateless batch expression IS the streaming plan, so this checks
    // the streamed output verbatim
    "streaming_cluster_assign" ->
      s"""WITH ${kmeansCteOn("vec_id % 10 <> 7")},
         |arr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 7),
         |ad AS (SELECT e.vec_id, c.cid, ${kmDist("c")} AS dr
         |  FROM arr e CROSS JOIN c2 c),
         |aa AS (SELECT vec_id, cid, dr,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dr, cid) AS rn FROM ad)
         |SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id, dr AS dist
         |FROM aa WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // pair CTE's id_b side IS the drop set: survivors = anti-join
    "dedup_semantic_prune" ->
      s"""WITH $kmeansCte,
         |pr AS (SELECT b.vec_id AS id_b
         |  FROM s2f a JOIN s2f b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  WHERE floor(($cosineDouble) * 1e6 + 0.5) / 1e6 >= 0.35)
         |SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id FROM s2f
         |WHERE vec_id NOT IN (SELECT id_b FROM pr) ORDER BY vec_id""".stripMargin,

    "decontaminate_semantic" ->
      s"""SELECT b.vec_id, a.vec_id AS probe_id,
         |  floor(($cosineDouble) * 1e6 + 0.5) / 1e6 AS cosine
         |FROM embeddings a JOIN embeddings b
         |  ON a.vec_id % 97 = 0 AND b.vec_id % 97 <> 0
         |WHERE floor(($cosineDouble) * 1e6 + 0.5) / 1e6 >= 0.30
         |ORDER BY 1, 2""".stripMargin,

    "cluster_diverse_sample" ->
      s"""WITH $kmeansCte,
         |rk AS (SELECT cid, vec_id,
         |    row_number() OVER (PARTITION BY cid
         |      ORDER BY md5(CAST(vec_id AS VARCHAR) || ':div'), vec_id) AS rk
         |  FROM s2f)
         |SELECT CAST(cid AS BIGINT) AS cluster_id, vec_id, CAST(rk AS BIGINT) AS rk
         |FROM rk WHERE rk <= 20 ORDER BY cluster_id, rk""".stripMargin,

    // Morton-key twin: min-max 16-bit normalization (trunc mirrors
    // Spark's double->long cast; clamp + null->0 coalesce identical),
    // then the 16-term bit interleave spelled out. The hi<=lo CASE
    // mirrors ZOrder's degenerate-dimension branch (constant column ->
    // 0, not NULL/inf) so the twins agree even off the harness data.
    "zorder_key" -> {
      def norm(c: String, lo: String, hi: String) =
        s"CASE WHEN $hi <= $lo THEN 0 ELSE CAST(trunc(least(greatest(coalesce(($c - $lo) / ($hi - $lo) * 65535, 0.0), 0.0), 65535.0)) AS BIGINT) END"
      val morton = (0 until 16).map(i =>
        s"((((n1 >> $i) & 1) << ${2 * i + 1}) | (((n2 >> $i) & 1) << ${2 * i}))")
        .mkString(" | ")
      s"""WITH st AS (SELECT min(user_id::DOUBLE) AS lo1, max(user_id::DOUBLE) AS hi1,
         |    min(value) AS lo2, max(value) AS hi2 FROM events),
         |n AS (SELECT e.event_id,
         |    ${norm("e.user_id::DOUBLE", "st.lo1", "st.hi1")} AS n1,
         |    ${norm("e.value", "st.lo2", "st.hi2")} AS n2
         |  FROM events e CROSS JOIN st)
         |SELECT event_id, $morton AS zkey FROM n ORDER BY event_id""".stripMargin
    },

    // int8 SQ twin: per-dim min/max quantizer, encode/decode arithmetic
    // stated in the same operation order as sqEncode/SqAdcDistance
    "ann_sq_topk" ->
      s"""WITH mm AS (SELECT u.p AS pos,
         |    min(embedding[CAST(u.p + 1 AS INT)]::DOUBLE) AS mn,
         |    max(embedding[CAST(u.p + 1 AS INT)]::DOUBLE) AS mx
         |  FROM embeddings, unnest(range(0, 64)) AS u(p) GROUP BY 1),
         |mml AS (SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs FROM mm),
         |q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
         |  FROM embeddings WHERE vec_id = 0),
         |enc AS (SELECT e.vec_id,
         |    list_transform(range(1,65), i -> CASE WHEN m.mxs[CAST(i AS INT)] = m.mns[CAST(i AS INT)] THEN 0
         |      ELSE CAST(floor((e.embedding[CAST(i AS INT)]::DOUBLE - m.mns[CAST(i AS INT)])
         |        / (m.mxs[CAST(i AS INT)] - m.mns[CAST(i AS INT)]) * 255 + 0.5) AS INT) END) AS code
         |  FROM embeddings e CROSS JOIN mml m WHERE e.vec_id <> 0),
         |dd AS (SELECT enc.vec_id,
         |    floor(list_sum(list_transform(range(1,65),
         |      i -> (m.mns[CAST(i AS INT)] + enc.code[CAST(i AS INT)] * ((m.mxs[CAST(i AS INT)] - m.mns[CAST(i AS INT)]) / 255) - q.qv[CAST(i AS INT)])
         |         * (m.mns[CAST(i AS INT)] + enc.code[CAST(i AS INT)] * ((m.mxs[CAST(i AS INT)] - m.mns[CAST(i AS INT)]) / 255) - q.qv[CAST(i AS INT)]))) * 1e6 + 0.5) / 1e6 AS dist
         |  FROM enc CROSS JOIN mml m CROSS JOIN q)
         |SELECT vec_id, dist FROM dd ORDER BY dist, vec_id LIMIT 10""".stripMargin,

    // Twin of ann_bq_topk — 1-bit binary quantization is FULLY
    // deterministic (sign tests, integer XOR/popcount, (hamming, id) /
    // (cosine, id) orderings), so the whole pre-rank + rerank pipeline is
    // plain SQL. Signatures pack into two 32-bit halves carried as
    // BIGINTs — bit 63 is never touched, so signed-shift semantics can't
    // diverge between engines. The dedup_simhash precedent proves
    // bit_count(xor(..)) parity.
    "ann_bq_topk" -> bqTop10Sql,
    // stored signature index — same computation, the layout is invisible
    // to the answer (the annProbedTop10Sql one-SQL-two-entries precedent)
    "ann_bq_store" -> bqTop10Sql,
    // incremental append to the signature index: maintenance must be
    // invisible — the maintained index answers with the SAME full-corpus
    // SQL as the from-scratch build (the ann_ivf_incremental discipline)
    "ann_bq_incremental" -> bqTop10Sql,
    // streaming ingest (incl. both replays) must be invisible too
    "streaming_bq_ingest" -> bqTop10Sql,

    // Twin of ann_range_search — radius query over the IVF layout:
    // simIvfCte quantizer, the same raw-l2 (dr, cid) take-4 probe as
    // ann_ivf, then EVERY vector in the probed cells clearing the rounded
    // cosine threshold (no top-k). vec_id 0 is the query — part of the
    // trained index, excluded from the result.
    "ann_range_search" ->
      s"""WITH ${simIvfCte(16, 3)},
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |pd AS (SELECT c.cid, list_sum(list_transform(range(1,65),
         |    i -> (q.qv[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)])
         |       * (q.qv[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]))) AS dr
         |  FROM q CROSS JOIN sc3 c),
         |probe AS (SELECT cid FROM (
         |    SELECT cid, row_number() OVER (ORDER BY dr, cid) AS rn FROM pd) WHERE rn <= 4)
         |SELECT s.vec_id, CAST(s.cid AS INT) AS cell_id, round(
         |    list_sum(list_transform(range(1,65), i -> s.embedding[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE)) /
         |    sqrt(list_sum(list_transform(range(1,65), i -> s.embedding[CAST(i AS INT)]::DOUBLE * s.embedding[CAST(i AS INT)]::DOUBLE)) *
         |         list_sum(list_transform(range(1,65), i -> q.qv[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE))), 6) AS cosine
         |FROM scellf s JOIN probe p ON s.cid = p.cid CROSS JOIN q
         |WHERE s.vec_id <> 0 AND round(
         |    list_sum(list_transform(range(1,65), i -> s.embedding[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE)) /
         |    sqrt(list_sum(list_transform(range(1,65), i -> s.embedding[CAST(i AS INT)]::DOUBLE * s.embedding[CAST(i AS INT)]::DOUBLE)) *
         |         list_sum(list_transform(range(1,65), i -> q.qv[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE))), 6) >= 0.20
         |ORDER BY vec_id""".stripMargin,

    "graph_pagerank" -> pagerankOracle(iters = 5),
    "graph_components" -> componentsOracle(iters = 8),

    // Twin of graph_degree_stats — the M=6 adjacency's in-degree
    // histogram; in-degree-0 nodes kept via the left join.
    "graph_degree_stats" ->
      """WITH corpus AS (
        |  SELECT CAST(vec_id AS BIGINT) AS id, embedding AS v
        |  FROM embeddings WHERE vec_id < 300),
        |pairs AS MATERIALIZED (
        |  SELECT a.id AS src, b.id AS dst,
        |    list_sum(list_transform(range(1,65),
        |      i -> (a.v[i]::DOUBLE - b.v[i]::DOUBLE) * (a.v[i]::DOUBLE - b.v[i]::DOUBLE))) AS d
        |  FROM corpus a JOIN corpus b ON a.id <> b.id),
        |ranked AS (
        |  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY d, dst) AS r
        |  FROM pairs),
        |edges AS (SELECT src, dst FROM ranked WHERE r <= 6),
        |indeg AS (SELECT c.id,
        |    COALESCE(e.n, CAST(0 AS BIGINT)) AS in_degree
        |  FROM corpus c LEFT JOIN (
        |    SELECT dst AS id, CAST(count(*) AS BIGINT) AS n
        |    FROM edges GROUP BY 1) e ON e.id = c.id)
        |SELECT in_degree, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM indeg GROUP BY 1 ORDER BY 1""".stripMargin,

    // Twin of ann_matryoshka — the two-stage cascade restated: the
    // coarse score is the cosine over dims 1..16 only (floor-round 6),
    // the survivor set is the top-50 by (coarse DESC, id), and the
    // final ranking rescores exactly those rows on all 64 dims. The
    // survivor CUT is inside the hash: a coarse-stage divergence
    // changes which rows exist downstream.
    "ann_matryoshka" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT e.vec_id, e.embedding,
        |    floor((list_sum(list_transform(range(1,17), i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE)) /
        |      sqrt(list_sum(list_transform(range(1,17), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)) *
        |           list_sum(list_transform(range(1,17), i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))) * 1e6 + 0.5) / 1e6 AS coarse
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
        |r AS (SELECT *, row_number() OVER (ORDER BY coarse DESC, vec_id) AS rn FROM c),
        |f AS (SELECT r.vec_id, r.coarse,
        |    floor((list_sum(list_transform(range(1,65), i -> r.embedding[i]::DOUBLE * q.qv[i]::DOUBLE)) /
        |      sqrt(list_sum(list_transform(range(1,65), i -> r.embedding[i]::DOUBLE * r.embedding[i]::DOUBLE)) *
        |           list_sum(list_transform(range(1,65), i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))) * 1e6 + 0.5) / 1e6 AS score
        |  FROM r CROSS JOIN q WHERE rn <= 50)
        |SELECT vec_id, coarse, score FROM f
        |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    // Twin of rag_boosted — the 6-rounded cosine and the 6-rounded
    // quality mix under the floor form; the join is the id intersection
    // of the two tables, exactly as the engine's inner join.
    "rag_boosted" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cs AS (SELECT e.vec_id AS doc_id,
         |    floor((list_sum(list_transform(range(1,65), i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE)) /
         |      sqrt(list_sum(list_transform(range(1,65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)) *
         |           list_sum(list_transform(range(1,65), i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))) * 1e6 + 0.5) / 1e6 AS cosine
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
         |qual AS (SELECT doc_id,
         |    floor(least(1.0,
         |      0.4 * least(len($toks)::DOUBLE / 50.0, 1.0)
         |      + 0.3 * (1.0 - (length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))::DOUBLE / length(text))
         |      + 0.3 * (len(list_distinct($toks))::DOUBLE / len($toks))) * 1e6 + 0.5) / 1e6 AS quality
         |  FROM documents)
         |SELECT cs.doc_id, cosine, quality,
         |  floor((0.7 * cosine + 0.3 * quality) * 1e6 + 0.5) / 1e6 AS boosted
         |FROM cs JOIN qual USING (doc_id)
         |ORDER BY boosted DESC, doc_id LIMIT 10""".stripMargin,

    // Twin of ann_named_vectors — per-arm slice cosines rounded at 6,
    // the 0.6/0.4 weighted mix floor-rounded once.
    "ann_named_vectors" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |sc AS (SELECT e.vec_id,
        |  floor((list_sum(list_transform(range(1,33), i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE)) /
        |    sqrt(list_sum(list_transform(range(1,33), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)) *
        |         list_sum(list_transform(range(1,33), i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))) * 1e6 + 0.5) / 1e6 AS c_title,
        |  floor((list_sum(list_transform(range(33,65), i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE)) /
        |    sqrt(list_sum(list_transform(range(33,65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)) *
        |         list_sum(list_transform(range(33,65), i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))) * 1e6 + 0.5) / 1e6 AS c_body
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0)
        |SELECT vec_id,
        |  floor((0.6 * c_title + 0.4 * c_body) * 1e6 + 0.5) / 1e6 AS score
        |FROM sc ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    // Twin of ann_discover — per-(candidate, example) rounded cosines,
    // the pair gate as a HAVING on count of strictly-passed pairs, the
    // survivor ranking by the same rounded target similarity. Example
    // ids (target + both sides of each pair) are excluded everywhere.
    "ann_discover" ->
      s"""WITH ex AS (SELECT CAST(vec_id AS BIGINT) AS id, embedding
         |  FROM embeddings WHERE vec_id IN (0,1,2,4,5)),
         |sim AS (SELECT a.vec_id AS vid, b.id AS eid,
         |    floor(($cosineDouble) * 1e6 + 0.5) / 1e6 AS c
         |  FROM embeddings a CROSS JOIN ex b
         |  WHERE a.vec_id NOT IN (0,1,2,4,5)),
         |px AS (SELECT * FROM (VALUES (CAST(1 AS BIGINT), CAST(4 AS BIGINT)),
         |    (CAST(2 AS BIGINT), CAST(5 AS BIGINT))) AS t(pos, neg)),
         |gate AS (SELECT sp.vid
         |  FROM px
         |  JOIN sim sp ON sp.eid = px.pos
         |  JOIN sim sn ON sn.eid = px.neg AND sn.vid = sp.vid
         |  GROUP BY sp.vid
         |  HAVING count(*) FILTER (WHERE sp.c > sn.c) = (SELECT count(*) FROM px))
         |SELECT s.vid AS vec_id, s.c AS score
         |FROM sim s JOIN gate g ON g.vid = s.vid
         |WHERE s.eid = 0
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    // Twin of ann_recommend — the Rocchio average-vector query is
    // rebuilt with the IDENTICAL arithmetic: per-dim 2^24 fixed-point
    // BIGINT sums over the example rows (order-free integer addition),
    // the same double op sequence (sum→/n→/2^24, then 2·ap − an), a
    // float32 re-quantize (the Lloyd-oracle CAST(... AS FLOAT) trick),
    // then the one-scan cosine ranking with the floor-form round and
    // the example ids excluded.
    "ann_recommend" ->
      """WITH ex AS (SELECT CAST(vec_id AS BIGINT) AS id, embedding,
        |    vec_id IN (1,2,3) AS is_pos
        |  FROM embeddings WHERE vec_id IN (1,2,3,4,5)),
        |comp AS (SELECT CAST(i AS INT) AS pos,
        |    CAST(sum(CASE WHEN is_pos THEN CAST(floor(embedding[CAST(i AS INT)]::DOUBLE * 16777216) AS BIGINT) END) AS DOUBLE) / 3 / 16777216 AS ap,
        |    CAST(sum(CASE WHEN NOT is_pos THEN CAST(floor(embedding[CAST(i AS INT)]::DOUBLE * 16777216) AS BIGINT) END) AS DOUBLE) / 2 / 16777216 AS an
        |  FROM ex, unnest(range(1, 65)) AS t(i) GROUP BY 1),
        |qc AS (SELECT list(CAST(CAST(2.0 * ap - an AS FLOAT) AS DOUBLE) ORDER BY pos) AS qv FROM comp)
        |SELECT e.vec_id,
        |  floor((list_sum(list_transform(range(1,65), i -> e.embedding[i]::DOUBLE * q.qv[i])) /
        |    sqrt(list_sum(list_transform(range(1,65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)) *
        |         list_sum(list_transform(range(1,65), i -> q.qv[i] * q.qv[i])))) * 1e6 + 0.5) / 1e6 AS score
        |FROM embeddings e CROSS JOIN qc q
        |WHERE e.vec_id NOT IN (1,2,3,4,5)
        |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin,

    // Twin of ann_recommend_best — per-candidate max-of-ROUNDED cosine
    // against each example side (round-before-max mirrors the Spark
    // greatest-of-rounded), then the same CASE: sPos wins ties, else
    // the nearest negative claims the candidate at −sNeg.
    "ann_recommend_best" ->
      s"""WITH ex AS (SELECT CAST(vec_id AS BIGINT) AS id, embedding,
         |    vec_id IN (1,2,3) AS is_pos
         |  FROM embeddings WHERE vec_id IN (1,2,3,4,5)),
         |sim AS (SELECT a.vec_id AS vid, b.is_pos AS is_pos,
         |    floor(($cosineDouble) * 1e6 + 0.5) / 1e6 AS c
         |  FROM embeddings a CROSS JOIN ex b
         |  WHERE a.vec_id NOT IN (1,2,3,4,5)),
         |agg AS (SELECT vid,
         |    max(CASE WHEN is_pos THEN c END) AS sp,
         |    max(CASE WHEN NOT is_pos THEN c END) AS sn
         |  FROM sim GROUP BY vid)
         |SELECT vid AS vec_id, CASE WHEN sp >= sn THEN sp ELSE -sn END AS score
         |FROM agg ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    // Twin of ann_ivf_stats — the stored index's per-cell assignment IS
    // the simIvfCte quantizer's, so introspection is a GROUP BY over the
    // relationally-derived cells. n_frac denominator = the full corpus
    // (the index is built over every row, including vec_id 0).
    "ann_ivf_stats" ->
      s"""WITH ${simIvfCte(16, 3)},
         |per AS (SELECT CAST(cid AS INT) AS cell_id,
         |    CAST(count(*) AS BIGINT) AS n_vectors,
         |    min(vec_id) AS min_id, max(vec_id) AS max_id
         |  FROM scellf GROUP BY 1),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM embeddings)
         |SELECT cell_id, n_vectors, min_id, max_id,
         |  floor(n_vectors::DOUBLE / total * 1e6 + 0.5) / 1e6 AS n_frac
         |FROM per, t ORDER BY cell_id""".stripMargin,

    // Twin of embedding_drift — per-dim means through the proven 2^24
    // trunc fixed-point BIGINT sum (the sm$i arithmetic), floor-rounded
    // once at the edge; the shift subtracts the ROUNDED means, so both
    // engines difference identical doubles.
    "embedding_drift" ->
      """WITH r AS (SELECT u.p AS pos,
        |    CAST(sum(CAST(trunc(embedding[CAST(u.p + 1 AS INT)]::DOUBLE * 16777216) AS BIGINT)) AS DOUBLE)
        |      / count(*) / 16777216 AS m
        |  FROM embeddings, unnest(range(0, 64)) AS u(p) WHERE vec_id % 2 = 0 GROUP BY 1),
        |c AS (SELECT u.p AS pos,
        |    CAST(sum(CAST(trunc(embedding[CAST(u.p + 1 AS INT)]::DOUBLE * 16777216) AS BIGINT)) AS DOUBLE)
        |      / count(*) / 16777216 AS m
        |  FROM embeddings, unnest(range(0, 64)) AS u(p) WHERE vec_id % 2 = 1 GROUP BY 1),
        |j AS (SELECT r.pos, floor(r.m * 1e6 + 0.5) / 1e6 AS mean_ref,
        |    floor(c.m * 1e6 + 0.5) / 1e6 AS mean_cur
        |  FROM r JOIN c USING (pos))
        |SELECT CAST(pos AS BIGINT) AS pos, mean_ref, mean_cur,
        |  floor(abs(mean_cur - mean_ref) * 1e6 + 0.5) / 1e6 AS shift
        |FROM j ORDER BY pos""".stripMargin,

    // Twins of ann_search_auto / ann_search_auto_bq — the chosen family
    // is a literal under the hash: picking the wrong index would both
    // mismatch the tag and (in general) the rows.
    "ann_search_auto" ->
      s"""WITH ${simIvfCte(16, 3)},
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |pqd AS (SELECT c.cid, list_sum(list_transform(range(1,65),
         |    i -> (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)])
         |       * (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]))) AS dr
         |  FROM sc3 c CROSS JOIN q),
         |probe AS (SELECT cid FROM pqd ORDER BY dr, cid LIMIT 4),
         |vsc AS (SELECT s.vec_id, round(
         |    list_sum(list_transform(range(1,65), i -> s.embedding[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE)) /
         |    sqrt(list_sum(list_transform(range(1,65), i -> s.embedding[CAST(i AS INT)]::DOUBLE * s.embedding[CAST(i AS INT)]::DOUBLE)) *
         |         list_sum(list_transform(range(1,65), i -> q.qe[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE))), 6) AS cosine
         |  FROM scellf s CROSS JOIN q
         |  WHERE s.cid IN (SELECT cid FROM probe))
         |SELECT vec_id, cosine, rank, 'ivf' AS index_kind FROM (
         |  SELECT vec_id, cosine,
         |    row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank FROM vsc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,

    "ann_search_auto_bq" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |qs AS (SELECT
        |    CAST(list_sum(list_transform(range(1,33), i ->
        |      CASE WHEN qv[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-1 AS INT)) ELSE 0 END)) AS BIGINT) AS qlo,
        |    CAST(list_sum(list_transform(range(33,65), i ->
        |      CASE WHEN qv[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-33 AS INT)) ELSE 0 END)) AS BIGINT) AS qhi
        |  FROM q),
        |sig AS (SELECT vec_id,
        |    CAST(list_sum(list_transform(range(1,33), i ->
        |      CASE WHEN embedding[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-1 AS INT)) ELSE 0 END)) AS BIGINT) AS lo,
        |    CAST(list_sum(list_transform(range(33,65), i ->
        |      CASE WHEN embedding[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-33 AS INT)) ELSE 0 END)) AS BIGINT) AS hi
        |  FROM embeddings),
        |short AS (SELECT s.vec_id,
        |    CAST(bit_count(xor(s.lo, t.qlo)) + bit_count(xor(s.hi, t.qhi)) AS INT) AS hamming
        |  FROM sig s CROSS JOIN qs t
        |  ORDER BY hamming, vec_id LIMIT 40),
        |resc AS (SELECT sh.vec_id, round(
        |    list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE)) /
        |    sqrt(list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * e.embedding[CAST(i AS INT)]::DOUBLE)) *
        |         list_sum(list_transform(range(1,65), i -> q.qv[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE))), 6) AS cosine
        |  FROM short sh JOIN embeddings e USING (vec_id) CROSS JOIN q)
        |SELECT vec_id, cosine, rank, 'bq' AS index_kind FROM (
        |  SELECT vec_id, cosine,
        |    row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank FROM resc)
        |WHERE rank <= 10 ORDER BY rank""".stripMargin,

    // Twin of index_catalog — every per-kind row count re-derived from
    // the base tables: postings = distinct (term, doc), mutable = live
    // rows after the delete, vector layouts = corpus cardinality.
    // Twin of index_catalog — detection + live counts, PLUS the vacuum
    // advisor columns restated from the version ledger: mut_bq indexed
    // every version before 10 deletes (garbage ppm the global integer
    // fraction, recommendation the same >10000 threshold comparison the
    // gate passes), mut_sq indexed an unmutated collection (clean,
    // quiet). Unbound rows carry NULLs.
    "index_catalog" ->
      """WITH tk AS (SELECT DISTINCT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) FILTER (WHERE vec_id < 10) AS BIGINT) AS nd,
        |    CAST(count(*) FILTER (WHERE vec_id < 250) AS BIGINT) AS nh
        |  FROM embeddings)
        |SELECT * FROM (
        |  SELECT 'bq_sigs' AS name, 'bq' AS kind,
        |    (SELECT n FROM c) AS n_rows,
        |    CAST(NULL AS BIGINT) AS worst_cell_garbage_ppm,
        |    CAST(NULL AS BOOLEAN) AS vacuum_recommended
        |  UNION ALL SELECT 'docs_text', 'text',
        |    (SELECT CAST(count(*) AS BIGINT) FROM tk),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN)
        |  UNION ALL SELECT 'ivf_vecs', 'ivf', (SELECT n FROM c),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN)
        |  UNION ALL SELECT 'mut_bq', 'bq', (SELECT n FROM c),
        |    (SELECT (1000000 * nd) // n FROM c),
        |    (SELECT ((1000000 * nd) // n) > 10000 FROM c)
        |  UNION ALL SELECT 'mut_clean', 'mutable', (SELECT nh FROM c),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN)
        |  UNION ALL SELECT 'mut_sq', 'ivf_sq', (SELECT nh FROM c),
        |    CAST(0 AS BIGINT), false
        |  UNION ALL SELECT 'mut_vecs', 'mutable',
        |    (SELECT n - nd FROM c),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN)
        |  UNION ALL SELECT 'plain', 'collection', (SELECT n FROM c),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN)
        |  UNION ALL SELECT 'sig_docs_bands', 'minhash_bands',
        |    (SELECT 32 * CAST(count(*) AS BIGINT) FROM documents WHERE doc_id % 3 = 0),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN)
        |  UNION ALL SELECT 'sig_docs_shingles', 'minhash_shingles',
        |    (SELECT CAST(count(*) AS BIGINT) FROM documents WHERE doc_id % 3 = 0),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN)
        |  UNION ALL SELECT 'sparse_docs', 'sparse',
        |    (SELECT CAST(count(*) AS BIGINT) FROM tk WHERE doc_id % 5 = 0),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN)
        |) ORDER BY name""".stripMargin,

    "ann_lsh_multiprobe" -> lshMultiProbeSql,

    // Twin of ann_federated_search — bqTop10Sql split into two parity-
    // shard arms: per-arm 40-row Hamming shortlists, tagged union, one
    // global exact rerank with (cosine DESC, collection, vec_id) ties.
    "ann_federated_search" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |qs AS (SELECT
        |    CAST(list_sum(list_transform(range(1,33), i ->
        |      CASE WHEN qv[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-1 AS INT)) ELSE 0 END)) AS BIGINT) AS qlo,
        |    CAST(list_sum(list_transform(range(33,65), i ->
        |      CASE WHEN qv[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-33 AS INT)) ELSE 0 END)) AS BIGINT) AS qhi
        |  FROM q),
        |sig AS (SELECT vec_id, vec_id % 2 AS par,
        |    CAST(list_sum(list_transform(range(1,33), i ->
        |      CASE WHEN embedding[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-1 AS INT)) ELSE 0 END)) AS BIGINT) AS lo,
        |    CAST(list_sum(list_transform(range(33,65), i ->
        |      CASE WHEN embedding[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-33 AS INT)) ELSE 0 END)) AS BIGINT) AS hi
        |  FROM embeddings),
        |ham AS (SELECT s.par, s.vec_id,
        |    CAST(bit_count(xor(s.lo, t.qlo)) + bit_count(xor(s.hi, t.qhi)) AS INT) AS hamming
        |  FROM sig s CROSS JOIN qs t),
        |short AS (SELECT par, vec_id, hamming FROM (
        |    SELECT par, vec_id, hamming,
        |      row_number() OVER (PARTITION BY par ORDER BY hamming, vec_id) AS r
        |    FROM ham) WHERE r <= 40),
        |resc AS (SELECT CASE WHEN sh.par = 0 THEN 'c0' ELSE 'c1' END AS collection,
        |    sh.vec_id, sh.hamming, round(
        |    list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE)) /
        |    sqrt(list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * e.embedding[CAST(i AS INT)]::DOUBLE)) *
        |         list_sum(list_transform(range(1,65), i -> q.qv[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE))), 6) AS cosine
        |  FROM short sh JOIN embeddings e ON e.vec_id = sh.vec_id CROSS JOIN q)
        |SELECT collection, vec_id, hamming, cosine, rank FROM (
        |  SELECT collection, vec_id, hamming, cosine,
        |    row_number() OVER (ORDER BY cosine DESC, collection, vec_id) AS rank
        |  FROM resc) WHERE rank <= 10
        |ORDER BY rank""".stripMargin,

    // Twin of ann_bq_batch — bqTop10Sql generalized to a query RELATION:
    // per-query window ranks replace the single-query LIMITs, everything
    // else is the same proven integer arithmetic.
    "ann_bq_batch" ->
      """WITH qs AS (SELECT vec_id AS q_id, embedding AS qv,
        |    CAST(list_sum(list_transform(range(1,33), i ->
        |      CASE WHEN embedding[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-1 AS INT)) ELSE 0 END)) AS BIGINT) AS qlo,
        |    CAST(list_sum(list_transform(range(33,65), i ->
        |      CASE WHEN embedding[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-33 AS INT)) ELSE 0 END)) AS BIGINT) AS qhi
        |  FROM embeddings WHERE vec_id < 5),
        |sig AS (SELECT vec_id,
        |    CAST(list_sum(list_transform(range(1,33), i ->
        |      CASE WHEN embedding[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-1 AS INT)) ELSE 0 END)) AS BIGINT) AS lo,
        |    CAST(list_sum(list_transform(range(33,65), i ->
        |      CASE WHEN embedding[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-33 AS INT)) ELSE 0 END)) AS BIGINT) AS hi
        |  FROM embeddings WHERE vec_id >= 5),
        |scored AS (SELECT q.q_id, s.vec_id,
        |    CAST(bit_count(xor(s.lo, q.qlo)) + bit_count(xor(s.hi, q.qhi)) AS INT) AS hamming
        |  FROM sig s CROSS JOIN qs q),
        |short AS (SELECT q_id, vec_id, hamming FROM (
        |    SELECT q_id, vec_id, hamming,
        |      row_number() OVER (PARTITION BY q_id ORDER BY hamming, vec_id) AS r
        |    FROM scored) WHERE r <= 40),
        |resc AS (SELECT sh.q_id, sh.vec_id, sh.hamming, round(
        |    list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE)) /
        |    sqrt(list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * e.embedding[CAST(i AS INT)]::DOUBLE)) *
        |         list_sum(list_transform(range(1,65), i -> q.qv[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE))), 6) AS cosine
        |  FROM short sh JOIN embeddings e ON e.vec_id = sh.vec_id
        |  JOIN qs q ON q.q_id = sh.q_id)
        |SELECT q_id, vec_id, hamming, cosine, rank FROM (
        |  SELECT q_id, vec_id, hamming, cosine,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
        |  FROM resc) WHERE rank <= 10
        |ORDER BY q_id, rank""".stripMargin,

    // Twin of streaming_drift — the streamed state IS the batch
    // fixed-point partial agg (associative sums), so the batch drift SQL
    // over the same standing/arrivals split checks the streamed output
    // verbatim (the streaming_quality discipline, extended to a
    // bounded-state aggregate).
    "streaming_drift" ->
      """WITH r AS (SELECT u.p AS pos,
        |    CAST(sum(CAST(trunc(embedding[CAST(u.p + 1 AS INT)]::DOUBLE * 16777216) AS BIGINT)) AS DOUBLE)
        |      / count(*) / 16777216 AS m
        |  FROM embeddings, unnest(range(0, 64)) AS u(p) WHERE vec_id % 10 <> 7 GROUP BY 1),
        |c AS (SELECT u.p AS pos,
        |    CAST(sum(CAST(trunc(embedding[CAST(u.p + 1 AS INT)]::DOUBLE * 16777216) AS BIGINT)) AS DOUBLE)
        |      / count(*) / 16777216 AS m
        |  FROM embeddings, unnest(range(0, 64)) AS u(p) WHERE vec_id % 10 = 7 GROUP BY 1),
        |j AS (SELECT r.pos, floor(r.m * 1e6 + 0.5) / 1e6 AS mean_ref,
        |    floor(c.m * 1e6 + 0.5) / 1e6 AS mean_cur
        |  FROM r JOIN c USING (pos))
        |SELECT CAST(pos AS BIGINT) AS pos, mean_ref, mean_cur,
        |  floor(abs(mean_cur - mean_ref) * 1e6 + 0.5) / 1e6 AS shift
        |FROM j ORDER BY pos""".stripMargin,

    // Twin of ann_ivf — IVF-flat moves from rows-only to FULL ORACLE:
    // the simIvfCte reproduces Similarity's quantizer bit-for-bit
    // (min-id seeds, trunc fixed-point Lloyd, unrounded argmin), probe
    // selection is the same raw-l2 sort (dr, cid) take-4, and scoring
    // is the proven left-to-right cosine restricted to probed cells.
    // IVF is "approximate" only in WHICH cells are probed — given the
    // deterministic quantizer, the whole computation is exact and
    // therefore hash-checkable.
    "ann_ivf" ->
      s"""WITH ${simIvfCte(16, 3)},
         |sq AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |sqd AS (SELECT q.q_id, c.cid, list_sum(list_transform(range(1,65),
         |    i -> (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)])
         |       * (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]))) AS dr
         |  FROM sq q CROSS JOIN sc3 c),
         |sprobe AS (SELECT q_id, cid FROM (
         |    SELECT q_id, cid, row_number() OVER (PARTITION BY q_id ORDER BY dr, cid) AS rn
         |    FROM sqd) WHERE rn <= 4),
         |scand AS (SELECT p.q_id, s.vec_id, s.embedding
         |  FROM scellf s JOIN sprobe p ON s.cid = p.cid),
         |sscore AS (SELECT c.q_id, c.vec_id, round(
         |    list_sum(list_transform(range(1,65), i -> c.embedding[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE)) /
         |    sqrt(list_sum(list_transform(range(1,65), i -> c.embedding[CAST(i AS INT)]::DOUBLE * c.embedding[CAST(i AS INT)]::DOUBLE)) *
         |         list_sum(list_transform(range(1,65), i -> q.qe[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE))), 6) AS cosine
         |  FROM scand c JOIN sq q ON q.q_id = c.q_id),
         |srank AS (SELECT q_id, vec_id, cosine,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
         |  FROM sscore)
         |SELECT q_id, vec_id, cosine, rank FROM srank WHERE rank <= 10
         |ORDER BY q_id, rank""".stripMargin,

    // Twin of ann_probe_knn AND ann_ivf_store (one SQL, two entries):
    // both run the SAME computation — Similarity quantizer (simIvfCte),
    // AnnProbeRule's raw-l2 (dr, cid) take-4 probe, top-10 by the raw
    // promote-to-double l2 — differing only in WHERE the cells live
    // (inline projection vs cell-partitioned files), which is invisible
    // to the answer. Moves two more ANN entries from rows-only to full
    // oracle.
    "ann_probe_knn" -> annProbedTop10Sql,

    // Twin of rag_hybrid_stored — BM25 corpus form + relational IVF
    // router, RRF-fused: both stored layouts (bucketed postings,
    // cell-partitioned vectors) must be invisible next to the direct
    // corpus computation.
    "rag_hybrid_stored" ->
      s"""WITH ${bm25BodyFor(Seq("vector", "scan", "batch"))},
         |${simIvfCte(16, 3)},
         |kwtop AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank_kw
         |  FROM (SELECT doc_id, bm25 FROM bm WHERE bm25 > 0
         |        ORDER BY bm25 DESC, doc_id LIMIT 100)),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |pqd AS (SELECT c.cid, list_sum(list_transform(range(1,65),
         |    i -> (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)])
         |       * (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]))) AS dr
         |  FROM sc3 c CROSS JOIN q),
         |probe AS (SELECT cid FROM pqd ORDER BY dr, cid LIMIT 4),
         |vsc AS (SELECT s.vec_id AS doc_id, round(
         |    list_sum(list_transform(range(1,65), i -> s.embedding[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE)) /
         |    sqrt(list_sum(list_transform(range(1,65), i -> s.embedding[CAST(i AS INT)]::DOUBLE * s.embedding[CAST(i AS INT)]::DOUBLE)) *
         |         list_sum(list_transform(range(1,65), i -> q.qe[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE))), 6) AS cosine
         |  FROM scellf s CROSS JOIN q
         |  WHERE s.cid IN (SELECT cid FROM probe)),
         |vtop AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT) AS rank_vec
         |  FROM (SELECT doc_id, cosine FROM vsc
         |        ORDER BY cosine DESC, doc_id LIMIT 100))
         |SELECT doc_id, rank_kw, rank_vec,
         |  floor((coalesce(1.0/(60+rank_kw), 0) + coalesce(1.0/(60+rank_vec), 0))*1e6 + 0.5)/1e6 AS rrf
         |FROM kwtop FULL OUTER JOIN vtop USING (doc_id)
         |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,

    // Twin of rag_hybrid_sparse — the sparse CTE body (exact integer
    // dot product, monotone double conversion) feeds one arm, the IVF
    // quantizer CTE the other; both rank at k=100 with id tiebreaks and
    // fuse with the same RRF arithmetic as rag_hybrid_stored.
    "rag_hybrid_sparse" ->
      s"""WITH $sparseBody,
         |${simIvfCte(16, 3)},
         |sptop AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_sp
         |  FROM (SELECT doc_id, score FROM spsc
         |        ORDER BY score DESC, doc_id LIMIT 100)),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |pqd AS (SELECT c.cid, list_sum(list_transform(range(1,65),
         |    i -> (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)])
         |       * (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]))) AS dr
         |  FROM sc3 c CROSS JOIN q),
         |probe AS (SELECT cid FROM pqd ORDER BY dr, cid LIMIT 4),
         |vsc AS (SELECT s.vec_id AS doc_id, round(
         |    list_sum(list_transform(range(1,65), i -> s.embedding[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE)) /
         |    sqrt(list_sum(list_transform(range(1,65), i -> s.embedding[CAST(i AS INT)]::DOUBLE * s.embedding[CAST(i AS INT)]::DOUBLE)) *
         |         list_sum(list_transform(range(1,65), i -> q.qe[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE))), 6) AS cosine
         |  FROM scellf s CROSS JOIN q
         |  WHERE s.cid IN (SELECT cid FROM probe)),
         |vtop AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT) AS rank_vec
         |  FROM (SELECT doc_id, cosine FROM vsc
         |        ORDER BY cosine DESC, doc_id LIMIT 100))
         |SELECT doc_id, rank_sp, rank_vec,
         |  floor((coalesce(1.0/(60+rank_sp), 0) + coalesce(1.0/(60+rank_vec), 0))*1e6 + 0.5)/1e6 AS rrf
         |FROM sptop FULL OUTER JOIN vtop USING (doc_id)
         |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,

    // Twins of ann_adaptive_prefilter / ann_adaptive_postfilter — the
    // oracle contains BOTH plans plus the relational replay of the
    // cost-based decision (matching-fraction threshold), so the CHOICE
    // sits under the hash, not just the chosen branch's rows.
    "ann_adaptive_prefilter" ->
      adaptiveKnnSql("t.label = 3 AND t.vec_id % 7 = 0"),
    "ann_adaptive_postfilter" ->
      adaptiveKnnSql("t.label >= 2"),

    // Twin of ann_recall_report — router re-derived relationally, probe
    // ranks per (query, cell), exact top-10 ground truth, recall and
    // candidate volume per (query, nprobe). The operator's cache-and-
    // filter staging must be invisible next to this direct form.
    "ann_recall_report" ->
      s"""WITH ${simIvfCte(16, 3)},
         |sq AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |sqd AS (SELECT q.q_id, c.cid, list_sum(list_transform(range(1,65),
         |    i -> (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)])
         |       * (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]))) AS dr
         |  FROM sq q CROSS JOIN sc3 c),
         |sprn AS (SELECT q_id, cid,
         |    row_number() OVER (PARTITION BY q_id ORDER BY dr, cid) AS rn
         |  FROM sqd),
         |cand AS (SELECT p.q_id, p.rn, s.vec_id, round(
         |    list_sum(list_transform(range(1,65), i -> s.embedding[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE)) /
         |    sqrt(list_sum(list_transform(range(1,65), i -> s.embedding[CAST(i AS INT)]::DOUBLE * s.embedding[CAST(i AS INT)]::DOUBLE)) *
         |         list_sum(list_transform(range(1,65), i -> q.qe[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE))), 6) AS cosine
         |  FROM scellf s JOIN sprn p ON s.cid = p.cid
         |  JOIN sq q ON q.q_id = p.q_id
         |  WHERE p.rn <= 8),
         |exact AS (SELECT q_id, vec_id FROM (
         |    SELECT q.q_id, e.vec_id, row_number() OVER (PARTITION BY q.q_id ORDER BY round(
         |      list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE)) /
         |      sqrt(list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * e.embedding[CAST(i AS INT)]::DOUBLE)) *
         |           list_sum(list_transform(range(1,65), i -> q.qe[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE))), 6) DESC, e.vec_id) AS xr
         |    FROM embeddings e CROSS JOIN sq q) WHERE xr <= 10),
         |ps AS (SELECT unnest([1,2,4,8]) AS nprobe),
         |ivfk AS (SELECT q_id, nprobe, vec_id FROM (
         |    SELECT c.q_id, p.nprobe, c.vec_id,
         |      row_number() OVER (PARTITION BY c.q_id, p.nprobe ORDER BY c.cosine DESC, c.vec_id) AS r
         |    FROM cand c JOIN ps p ON c.rn <= p.nprobe) WHERE r <= 10),
         |ncand AS (SELECT c.q_id, p.nprobe, CAST(count(*) AS BIGINT) AS n_candidates
         |  FROM cand c JOIN ps p ON c.rn <= p.nprobe GROUP BY 1, 2),
         |hits AS (SELECT i.q_id, i.nprobe, CAST(count(*) AS BIGINT) AS n_hits
         |  FROM ivfk i JOIN exact x ON x.q_id = i.q_id AND x.vec_id = i.vec_id
         |  GROUP BY 1, 2)
         |SELECT n.q_id, CAST(n.nprobe AS INT) AS nprobe, n.n_candidates,
         |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  floor(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 10.0 * 1e6 + 0.5) / 1e6 AS recall
         |FROM ncand n LEFT JOIN hits h ON h.q_id = n.q_id AND h.nprobe = n.nprobe
         |ORDER BY n.q_id, n.nprobe""".stripMargin,

    // Twin of ann_eval_graded — the recall-report replay extended to
    // graded metrics: exact rank kept as relevance rel = 11 - xr, DCG an
    // integer sum over the SAME discount-table longs the operator uses
    // (interpolated from Similarity.ndcgDiscountFixed, never a log2 at
    // compare time), MRR and NDCG one round-half-up integer division
    // each. Zero-hit (query, nprobe) cells report (0, 0.0, 0.0).
    "ann_eval_graded" -> {
      val w = graft.operators.Similarity.ndcgDiscountFixed(10)
      val idcg = (1 to 10).map(i => (11 - i).toLong * w(i - 1)).sum
      val wVals = w.zipWithIndex
        .map { case (v, i) => s"(${i + 1}, ${v})" }.mkString(", ")
      s"""WITH ${simIvfCte(16, 3)},
         |sq AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |sqd AS (SELECT q.q_id, c.cid, list_sum(list_transform(range(1,65),
         |    i -> (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)])
         |       * (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]))) AS dr
         |  FROM sq q CROSS JOIN sc3 c),
         |sprn AS (SELECT q_id, cid,
         |    row_number() OVER (PARTITION BY q_id ORDER BY dr, cid) AS rn
         |  FROM sqd),
         |cand AS (SELECT p.q_id, p.rn, s.vec_id, round(
         |    list_sum(list_transform(range(1,65), i -> s.embedding[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE)) /
         |    sqrt(list_sum(list_transform(range(1,65), i -> s.embedding[CAST(i AS INT)]::DOUBLE * s.embedding[CAST(i AS INT)]::DOUBLE)) *
         |         list_sum(list_transform(range(1,65), i -> q.qe[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE))), 6) AS cosine
         |  FROM scellf s JOIN sprn p ON s.cid = p.cid
         |  JOIN sq q ON q.q_id = p.q_id
         |  WHERE p.rn <= 8),
         |exact AS (SELECT q_id, vec_id, xr FROM (
         |    SELECT q.q_id, e.vec_id, row_number() OVER (PARTITION BY q.q_id ORDER BY round(
         |      list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE)) /
         |      sqrt(list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * e.embedding[CAST(i AS INT)]::DOUBLE)) *
         |           list_sum(list_transform(range(1,65), i -> q.qe[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE))), 6) DESC, e.vec_id) AS xr
         |    FROM embeddings e CROSS JOIN sq q) WHERE xr <= 10),
         |ps AS (SELECT unnest([1,2,4,8]) AS nprobe),
         |ivfk AS (SELECT q_id, nprobe, vec_id, r FROM (
         |    SELECT c.q_id, p.nprobe, c.vec_id,
         |      row_number() OVER (PARTITION BY c.q_id, p.nprobe ORDER BY c.cosine DESC, c.vec_id) AS r
         |    FROM cand c JOIN ps p ON c.rn <= p.nprobe) WHERE r <= 10),
         |w(r, wf) AS (VALUES $wVals),
         |h AS (SELECT i.q_id, i.nprobe, i.r, CAST(11 - x.xr AS BIGINT) AS rel
         |  FROM ivfk i JOIN exact x ON x.q_id = i.q_id AND x.vec_id = i.vec_id),
         |agg AS (SELECT h.q_id, h.nprobe, CAST(count(*) AS BIGINT) AS n_hits,
         |    min(h.r) AS minr, CAST(sum(h.rel * w.wf) AS BIGINT) AS dcg
         |  FROM h JOIN w ON w.r = h.r GROUP BY 1, 2),
         |base AS (SELECT q.q_id, p.nprobe
         |  FROM (SELECT DISTINCT q_id FROM sq) q CROSS JOIN ps p)
         |SELECT b.q_id, CAST(b.nprobe AS INT) AS nprobe,
         |  CAST(coalesce(a.n_hits, 0) AS BIGINT) AS n_hits,
         |  CASE WHEN a.minr IS NULL THEN 0.0
         |    ELSE ((2000000 + a.minr) // (2 * a.minr)) / 1e6 END AS mrr,
         |  CASE WHEN a.dcg IS NULL THEN 0.0
         |    ELSE ((2 * a.dcg * 1000000 + ${idcg}) // (2 * ${idcg})) / 1e6 END AS ndcg
         |FROM base b LEFT JOIN agg a ON a.q_id = b.q_id AND a.nprobe = b.nprobe
         |ORDER BY b.q_id, b.nprobe""".stripMargin
    },

    // Twin of ann_index_advisor — the whole decision table re-derived:
    // each family's search is its existing twin VERBATIM as a subquery
    // (ivf = annProbedTop10SqlAt(16,3), sq = ivfSqTop10SqlAt(8,4), bq =
    // bqTop10Sql, pq = ivfPqSql at the store geometry with the single-
    // query panel), each joined against the exact top-10 under that
    // family's metric and corpus convention; prices, the ceil(0.7·10)=7
    // integer bar, and the bytes-asc/name-asc recommendation are plain
    // relational algebra on the hit counts.
    "ann_index_advisor" -> {
      val l2d = (tbl: String) =>
        s"""list_sum(list_transform(range(1,65),
           |      i -> ($tbl.embedding[CAST(i AS INT)]::DOUBLE - q.qv[CAST(i AS INT)])
           |         * ($tbl.embedding[CAST(i AS INT)]::DOUBLE - q.qv[CAST(i AS INT)])))""".stripMargin
      val cosd =
        s"""round(
           |    list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)])) /
           |    sqrt(list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * e.embedding[CAST(i AS INT)]::DOUBLE)) *
           |         list_sum(list_transform(range(1,65), i -> q.qv[CAST(i AS INT)] * q.qv[CAST(i AS INT)]))), 6)""".stripMargin
      s"""WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
         |  FROM embeddings WHERE vec_id = 0),
         |xl2f AS (SELECT vec_id FROM (
         |    SELECT e.vec_id, round(${l2d("e")}, 6) AS d FROM embeddings e CROSS JOIN q
         |    ORDER BY d, e.vec_id LIMIT 10)),
         |xl2x AS (SELECT vec_id FROM (
         |    SELECT e.vec_id, round(${l2d("e")}, 6) AS d FROM embeddings e CROSS JOIN q
         |    WHERE e.vec_id <> 0 ORDER BY d, e.vec_id LIMIT 10)),
         |xcos AS (SELECT vec_id FROM (
         |    SELECT e.vec_id, $cosd AS c FROM embeddings e CROSS JOIN q
         |    WHERE e.vec_id <> 0 ORDER BY c DESC, e.vec_id LIMIT 10)),
         |fivf AS (SELECT vec_id FROM (${annProbedTop10SqlAt(16, 3)})),
         |fsq AS (SELECT vec_id FROM (${ivfSqTop10SqlAt(8, 4)})),
         |fbq AS (SELECT vec_id FROM ($bqTop10Sql)),
         |fpq AS (SELECT vec_id FROM (${ivfPqSql(
             ncells = 16, iters = 3, m = 8, dsub = 8, ksubMax = 256,
             nprobe = 4, k = 10, rerank = 4, qWhere = "vec_id = 0",
             emitQid = false)})),
         |hits AS (
         |  SELECT 'flat' AS family, 256 AS bytes, CAST(10 AS BIGINT) AS n_hits
         |  UNION ALL SELECT 'ivf_flat', 256,
         |    (SELECT CAST(count(*) AS BIGINT) FROM fivf f JOIN xl2f x USING (vec_id))
         |  UNION ALL SELECT 'ivf_sq', 64,
         |    (SELECT CAST(count(*) AS BIGINT) FROM fsq f JOIN xl2x x USING (vec_id))
         |  UNION ALL SELECT 'bq', 16,
         |    (SELECT CAST(count(*) AS BIGINT) FROM fbq f JOIN xcos x USING (vec_id))
         |  UNION ALL SELECT 'ivf_pq', 8,
         |    (SELECT CAST(count(*) AS BIGINT) FROM fpq f JOIN xl2f x USING (vec_id))),
         |dec AS (SELECT family, bytes, n_hits, n_hits >= 7 AS meets FROM hits),
         |rec AS (SELECT family FROM dec WHERE meets ORDER BY bytes, family LIMIT 1)
         |SELECT family, CAST(bytes AS BIGINT) AS bytes_per_vec, n_hits,
         |  floor(CAST(n_hits AS DOUBLE) / 10.0 * 1e6 + 0.5) / 1e6 AS recall,
         |  meets, family = (SELECT family FROM rec) AS recommended
         |FROM dec ORDER BY family""".stripMargin
    },

    // Twin of ann_autotune — the recall-report relational replay PLUS
    // the decision: min nprobe with total panel hits >= ceil(0.9·10·5)
    // = 45 (integer rule, fallback 8), then the served IVF top-10 at
    // that setting with the decision columns on every row.
    "ann_autotune" ->
      s"""WITH ${simIvfCte(16, 3)},
         |sq AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |sqd AS (SELECT q.q_id, c.cid, list_sum(list_transform(range(1,65),
         |    i -> (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)])
         |       * (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]))) AS dr
         |  FROM sq q CROSS JOIN sc3 c),
         |sprn AS (SELECT q_id, cid,
         |    row_number() OVER (PARTITION BY q_id ORDER BY dr, cid) AS rn
         |  FROM sqd),
         |cand AS (SELECT p.q_id, p.rn, s.vec_id, round(
         |    list_sum(list_transform(range(1,65), i -> s.embedding[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE)) /
         |    sqrt(list_sum(list_transform(range(1,65), i -> s.embedding[CAST(i AS INT)]::DOUBLE * s.embedding[CAST(i AS INT)]::DOUBLE)) *
         |         list_sum(list_transform(range(1,65), i -> q.qe[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE))), 6) AS cosine
         |  FROM scellf s JOIN sprn p ON s.cid = p.cid
         |  JOIN sq q ON q.q_id = p.q_id
         |  WHERE p.rn <= 8),
         |exact AS (SELECT q_id, vec_id FROM (
         |    SELECT q.q_id, e.vec_id, row_number() OVER (PARTITION BY q.q_id ORDER BY round(
         |      list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE)) /
         |      sqrt(list_sum(list_transform(range(1,65), i -> e.embedding[CAST(i AS INT)]::DOUBLE * e.embedding[CAST(i AS INT)]::DOUBLE)) *
         |           list_sum(list_transform(range(1,65), i -> q.qe[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE))), 6) DESC, e.vec_id) AS xr
         |    FROM embeddings e CROSS JOIN sq q) WHERE xr <= 10),
         |ps AS (SELECT unnest([1,2,4,8]) AS nprobe),
         |ivfk AS (SELECT q_id, nprobe, vec_id FROM (
         |    SELECT c.q_id, p.nprobe, c.vec_id,
         |      row_number() OVER (PARTITION BY c.q_id, p.nprobe ORDER BY c.cosine DESC, c.vec_id) AS r
         |    FROM cand c JOIN ps p ON c.rn <= p.nprobe) WHERE r <= 10),
         |tot AS (SELECT i.nprobe, CAST(count(*) AS BIGINT) AS hits
         |  FROM ivfk i JOIN exact x ON x.q_id = i.q_id AND x.vec_id = i.vec_id
         |  GROUP BY i.nprobe),
         |chx AS (SELECT CAST(coalesce(min(nprobe) FILTER (WHERE hits >= 45), 8) AS INT) AS np
         |  FROM tot),
         |chits AS (SELECT chx.np,
         |    CAST(coalesce((SELECT hits FROM tot WHERE tot.nprobe = chx.np), 0) AS BIGINT) AS h
         |  FROM chx),
         |res AS (SELECT c.q_id, c.vec_id, c.cosine,
         |    CAST(row_number() OVER (PARTITION BY c.q_id ORDER BY c.cosine DESC, c.vec_id) AS BIGINT) AS rank
         |  FROM cand c, chx WHERE c.rn <= chx.np)
         |SELECT r.q_id, r.vec_id, r.cosine, r.rank, ch.np AS nprobe,
         |  floor(CAST(ch.h AS DOUBLE) / 50.0 * 1e6 + 0.5) / 1e6 AS mean_recall
         |FROM res r, chits ch WHERE r.rank <= 10
         |ORDER BY r.q_id, r.rank""".stripMargin,

    // Twin of ann_ivf_store_batch — the ann_ivf batch form with the
    // candidate's cell carried through: the stored layout's partition
    // pruning and broadcast cell-pairing must be invisible next to the
    // purely relational router re-derivation.
    "ann_ivf_store_batch" ->
      s"""WITH ${simIvfCte(16, 3)},
         |sq AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |sqd AS (SELECT q.q_id, c.cid, list_sum(list_transform(range(1,65),
         |    i -> (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)])
         |       * (q.qe[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]))) AS dr
         |  FROM sq q CROSS JOIN sc3 c),
         |sprobe AS (SELECT q_id, cid FROM (
         |    SELECT q_id, cid, row_number() OVER (PARTITION BY q_id ORDER BY dr, cid) AS rn
         |    FROM sqd) WHERE rn <= 4),
         |scand AS (SELECT p.q_id, s.vec_id, s.cid, s.embedding
         |  FROM scellf s JOIN sprobe p ON s.cid = p.cid),
         |sscore AS (SELECT c.q_id, c.vec_id, CAST(c.cid AS INT) AS cell_id, round(
         |    list_sum(list_transform(range(1,65), i -> c.embedding[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE)) /
         |    sqrt(list_sum(list_transform(range(1,65), i -> c.embedding[CAST(i AS INT)]::DOUBLE * c.embedding[CAST(i AS INT)]::DOUBLE)) *
         |         list_sum(list_transform(range(1,65), i -> q.qe[CAST(i AS INT)]::DOUBLE * q.qe[CAST(i AS INT)]::DOUBLE))), 6) AS cosine
         |  FROM scand c JOIN sq q ON q.q_id = c.q_id),
         |srank AS (SELECT q_id, vec_id, cell_id, cosine,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
         |  FROM sscore)
         |SELECT q_id, vec_id, cell_id, cosine, rank FROM srank WHERE rank <= 10
         |ORDER BY q_id, rank""".stripMargin,
    "ann_ivf_store" -> annProbedTop10Sql,

    // Twin of ann_ivf_incremental (same SQL as ann_ivf_store): IVF
    // append-maintenance must be INVISIBLE to the answer — the oracle
    // has no notion of which rows arrived incrementally.
    "ann_ivf_incremental" -> annProbedTop10Sql,

    // Twin of streaming_ann_ingest (same SQL again): rows that arrived
    // through the exactly-once foreachBatch sink — including the two
    // deterministically replayed recovery batches — must leave a store
    // indistinguishable from the batch build.
    "streaming_ann_ingest" -> annProbedTop10Sql,

    // Twin of ann_mutable_ivf: the LIVE-collection ANN — re-derive the
    // frozen 16-cell router over the ORIGINAL corpus (the attach-time
    // training set), restate the live state after the mutations
    // (vec_id%10==3 carries the reversed vector — float-exact on both
    // engines — and %10==6 is gone), re-assign every live row by the
    // same (double l2², lowest cid) argmin, probe 4 cells, exact
    // top-10. A hash match proves the index's version resolution
    // (tombstone filter over stored versions) equals the relational
    // restatement of the mutated corpus.
    "ann_mutable_ivf" ->
      s"""WITH ${simIvfCte(16, 3)},
         |q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
         |  FROM embeddings WHERE vec_id = 0),
         |live AS (SELECT vec_id,
         |    CASE WHEN vec_id % 10 = 3 THEN list_reverse(embedding)
         |         ELSE embedding END AS lv
         |  FROM embeddings WHERE vec_id % 10 <> 6),
         |lad AS (SELECT l.vec_id, l.lv, c.cid, list_sum(list_transform(range(1,65),
         |    i -> (l.lv[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)])
         |       * (l.lv[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]))) AS dr
         |  FROM live l CROSS JOIN sc3 c),
         |laa AS (SELECT vec_id, lv, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dr, cid) AS rn
         |  FROM lad),
         |lcell AS (SELECT vec_id, lv, cid FROM laa WHERE rn = 1),
         |pqd AS (SELECT c.cid, list_sum(list_transform(range(1,65),
         |    i -> (q.qv[CAST(i AS INT)] - c.v[CAST(i AS INT)])
         |       * (q.qv[CAST(i AS INT)] - c.v[CAST(i AS INT)]))) AS dr
         |  FROM sc3 c CROSS JOIN q),
         |probe AS (SELECT cid FROM pqd ORDER BY dr, cid LIMIT 4),
         |dd AS (SELECT l.vec_id, l.cid, list_sum(list_transform(range(1,65),
         |    i -> (l.lv[CAST(i AS INT)]::DOUBLE - q.qv[CAST(i AS INT)])
         |       * (l.lv[CAST(i AS INT)]::DOUBLE - q.qv[CAST(i AS INT)]))) AS dr
         |  FROM lcell l CROSS JOIN q
         |  WHERE l.cid IN (SELECT cid FROM probe))
         |SELECT d.vec_id, CAST(d.cid AS INT) AS cell_id,
         |  floor(d.dr * 1e6 + 0.5) / 1e6 AS dist
         |FROM (SELECT * FROM dd ORDER BY dr, vec_id LIMIT 10) d
         |ORDER BY dist, d.vec_id""".stripMargin,

    // Twin of ann_mutable_ivf_filtered: same construction, but the
    // where filter (label < 10, against CURRENT versions) excludes the
    // upserted ids outright — their new label is >= 10 — so the live
    // set is the untouched rows only. An engine that resolved a STALE
    // version (old label < 10) would readmit those ids with their OLD
    // vector and mismatch.
    "ann_mutable_ivf_filtered" ->
      s"""WITH ${simIvfCte(16, 3)},
         |q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
         |  FROM embeddings WHERE vec_id = 0),
         |live AS (SELECT vec_id, embedding AS lv FROM embeddings
         |  WHERE vec_id % 10 <> 6 AND vec_id % 10 <> 3),
         |lad AS (SELECT l.vec_id, l.lv, c.cid, list_sum(list_transform(range(1,65),
         |    i -> (l.lv[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)])
         |       * (l.lv[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]))) AS dr
         |  FROM live l CROSS JOIN sc3 c),
         |laa AS (SELECT vec_id, lv, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dr, cid) AS rn
         |  FROM lad),
         |lcell AS (SELECT vec_id, lv, cid FROM laa WHERE rn = 1),
         |pqd AS (SELECT c.cid, list_sum(list_transform(range(1,65),
         |    i -> (q.qv[CAST(i AS INT)] - c.v[CAST(i AS INT)])
         |       * (q.qv[CAST(i AS INT)] - c.v[CAST(i AS INT)]))) AS dr
         |  FROM sc3 c CROSS JOIN q),
         |probe AS (SELECT cid FROM pqd ORDER BY dr, cid LIMIT 4),
         |dd AS (SELECT l.vec_id, l.cid, list_sum(list_transform(range(1,65),
         |    i -> (l.lv[CAST(i AS INT)]::DOUBLE - q.qv[CAST(i AS INT)])
         |       * (l.lv[CAST(i AS INT)]::DOUBLE - q.qv[CAST(i AS INT)]))) AS dr
         |  FROM lcell l CROSS JOIN q
         |  WHERE l.cid IN (SELECT cid FROM probe))
         |SELECT d.vec_id, CAST(d.cid AS INT) AS cell_id,
         |  floor(d.dr * 1e6 + 0.5) / 1e6 AS dist
         |FROM (SELECT * FROM dd ORDER BY dr, vec_id LIMIT 10) d
         |ORDER BY dist, d.vec_id""".stripMargin,

    // Twin of ann_mutable_sq: the live-mutable COMPRESSED index — the
    // frozen quantizer (8-cell deterministic Lloyd + per-dim min/max)
    // re-derived over the ORIGINAL corpus (the attach-time training
    // set), the live state restated (reversed %3 vectors, %6 gone),
    // every live row re-assigned by the floor-rounded argmin and
    // re-encoded with the frozen ranges, 4-cell probe, ADC rank on the
    // rounded micro-units. A hash match proves tombstone-merged version
    // resolution through the CODES-ONLY index equals the relational
    // restatement of the mutated corpus.
    "ann_mutable_sq" ->
      s"""WITH ${kmeansCteOn("TRUE", 8)},
         |mm AS (SELECT u.p AS pos,
         |    min(embedding[CAST(u.p + 1 AS INT)]::DOUBLE) AS mn,
         |    max(embedding[CAST(u.p + 1 AS INT)]::DOUBLE) AS mx
         |  FROM embeddings, unnest(range(0, 64)) AS u(p) GROUP BY 1),
         |mml AS (SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs FROM mm),
         |q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
         |  FROM embeddings WHERE vec_id = 0),
         |live AS (SELECT vec_id,
         |    CASE WHEN vec_id % 10 = 3 THEN list_reverse(embedding)
         |         ELSE embedding END AS lv
         |  FROM embeddings WHERE vec_id % 10 <> 6),
         |lad AS (SELECT l.vec_id, l.lv, c.cid,
         |    floor(list_sum(list_transform(range(1,65),
         |      i -> (l.lv[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)])
         |         * (l.lv[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]))) * 1e6 + 0.5) / 1e6 AS dr
         |  FROM live l CROSS JOIN c2 c),
         |laa AS (SELECT vec_id, lv, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dr, cid) AS rn
         |  FROM lad),
         |lcell AS (SELECT vec_id, lv, cid FROM laa WHERE rn = 1),
         |qc AS (SELECT c.cid, floor(list_sum(list_transform(range(1,65),
         |      i -> (q.qv[CAST(i AS INT)] - c.v[CAST(i AS INT)])
         |         * (q.qv[CAST(i AS INT)] - c.v[CAST(i AS INT)]))) * 1e6 + 0.5) / 1e6 AS dr
         |  FROM c2 c CROSS JOIN q),
         |probe AS (SELECT cid FROM qc ORDER BY dr, cid LIMIT 4),
         |enc AS (SELECT l.vec_id, l.cid,
         |    list_transform(range(1,65), i -> CASE WHEN m.mxs[CAST(i AS INT)] = m.mns[CAST(i AS INT)] THEN 0
         |      ELSE CAST(floor((l.lv[CAST(i AS INT)]::DOUBLE - m.mns[CAST(i AS INT)])
         |        / (m.mxs[CAST(i AS INT)] - m.mns[CAST(i AS INT)]) * 255 + 0.5) AS INT) END) AS code
         |  FROM lcell l CROSS JOIN mml m
         |  WHERE l.cid IN (SELECT cid FROM probe)),
         |dd AS (SELECT enc.vec_id, enc.cid,
         |    floor(list_sum(list_transform(range(1,65),
         |      i -> (m.mns[CAST(i AS INT)] + enc.code[CAST(i AS INT)] * ((m.mxs[CAST(i AS INT)] - m.mns[CAST(i AS INT)]) / 255) - q.qv[CAST(i AS INT)])
         |         * (m.mns[CAST(i AS INT)] + enc.code[CAST(i AS INT)] * ((m.mxs[CAST(i AS INT)] - m.mns[CAST(i AS INT)]) / 255) - q.qv[CAST(i AS INT)]))) * 1e6 + 0.5) / 1e6 AS dist
         |  FROM enc CROSS JOIN mml m CROSS JOIN q)
         |SELECT vec_id, CAST(cid AS INT) AS cell_id, dist FROM dd
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin,

    // Twin of ann_mutable_bq: the live-mutable signature index — the
    // mutated corpus restated (reversed %3 vectors, %6 gone), sign
    // signatures packed into 32-bit halves, integer Hamming pre-rank
    // over LIVE versions, exact-cosine rerank against CURRENT vectors.
    // A stale signature (old vector's signs) or a resurrected delete in
    // the shortlist breaks the hash.
    "ann_mutable_bq" ->
      """WITH live AS (SELECT vec_id,
        |    CASE WHEN vec_id % 10 = 3 THEN list_reverse(embedding)
        |         ELSE embedding END AS lv
        |  FROM embeddings WHERE vec_id % 10 <> 6),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |qs AS (SELECT
        |    CAST(list_sum(list_transform(range(1,33), i ->
        |      CASE WHEN qv[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-1 AS INT)) ELSE 0 END)) AS BIGINT) AS qlo,
        |    CAST(list_sum(list_transform(range(33,65), i ->
        |      CASE WHEN qv[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-33 AS INT)) ELSE 0 END)) AS BIGINT) AS qhi
        |  FROM q),
        |sig AS (SELECT vec_id,
        |    CAST(list_sum(list_transform(range(1,33), i ->
        |      CASE WHEN lv[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-1 AS INT)) ELSE 0 END)) AS BIGINT) AS lo,
        |    CAST(list_sum(list_transform(range(33,65), i ->
        |      CASE WHEN lv[CAST(i AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(i-33 AS INT)) ELSE 0 END)) AS BIGINT) AS hi
        |  FROM live),
        |short AS (SELECT s.vec_id,
        |    CAST(bit_count(xor(s.lo, t.qlo)) + bit_count(xor(s.hi, t.qhi)) AS INT) AS hamming
        |  FROM sig s CROSS JOIN qs t
        |  ORDER BY hamming, vec_id LIMIT 40)
        |SELECT sh.vec_id, sh.hamming, round(
        |    list_sum(list_transform(range(1,65), i -> l.lv[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE)) /
        |    sqrt(list_sum(list_transform(range(1,65), i -> l.lv[CAST(i AS INT)]::DOUBLE * l.lv[CAST(i AS INT)]::DOUBLE)) *
        |         list_sum(list_transform(range(1,65), i -> q.qv[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE))), 6) AS cosine
        |FROM short sh JOIN live l USING (vec_id) CROSS JOIN q
        |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,

    // Twin of page_keyset: the live state restated (current labels for
    // the upserted %3 ids, %6 ids gone) cut by the same cursor —
    // id > 100, id order, 25 rows. A stale-version leak (old label) or
    // a resurrected delete breaks the hash.
    "page_keyset" ->
      """SELECT vec_id,
        |  CASE WHEN vec_id % 10 = 3 THEN label + 10 ELSE label END AS label
        |FROM embeddings
        |WHERE vec_id % 10 <> 6 AND vec_id > 100
        |ORDER BY vec_id LIMIT 25""".stripMargin,

    // Twin of ann_ivf_retrain: the SAME probe at the RETRAINED
    // geometry (8 cells) — the oracle re-derives the new router from
    // the corpus relationally with no notion of the old 16-cell build,
    // the incremental appends, or the swap; a hash match proves the
    // retrain-and-rebuild verb re-routes every row exactly as a
    // from-scratch 8-cell build would.
    "ann_ivf_retrain" -> annProbedTop10SqlAt(8, 3),

    // Twin of ann_ivfpq AND ann_ivfpq_store (one SQL, two entries —
    // stored vs inline encoding is invisible to the answer): the whole
    // IVF-PQ chain is deterministic, so "approximate" is again only a
    // statement about WHICH candidates are scored — see ivfPqSql.
    "ann_ivfpq" -> ivfPqTop10Sql,
    "ann_ivfpq_store" -> ivfPqTop10Sql,
    // incremental PQ append: frozen router + codebooks => the maintained
    // store equals the full build, same generated oracle
    "ann_ivfpq_incremental" -> ivfPqTop10Sql,
    "streaming_pq_ingest" -> ivfPqTop10Sql,

    // Twin of ann_lsh_buckets (rows-only no more): deterministic
    // hyperplane signatures are pure arithmetic once the seeded planes
    // are inlined — see lshBucketsSql.
    "ann_lsh_buckets" -> lshBucketsSql,

    // Twin of dedup_embedding_lsh — the banded near-dup join is exactly
    // computable for the same reason (see dedupEmbeddingLshSql).
    "dedup_embedding_lsh" -> dedupEmbeddingLshSql,

    // Twin of mine_hard_negatives_lsh — same signature relation, banded
    // candidate mining + exact-cosine rerank (mineHardNegativesLshSql).
    "mine_hard_negatives_lsh" -> mineHardNegativesLshSql,

    // Twin of the STORED int8-SQ search — the first stored-ANN full
    // oracle: the kmeans CTE reproduces the deterministic coarse
    // quantizer (c2 = final centroids, s2f = per-vector cells), qc/probe
    // reproduce the floor-rounded lowest-cid-tie probe-cell selection,
    // and the encode/ADC arithmetic is the proven ann_sq_topk form
    // restricted to candidates in probed cells.
    // Twin of streaming_graph_ingest: the maintained graph store's
    // assignment manifest — per-cell count + id checksum off the kmeans
    // CTE's final assignment, no notion of the stream, the two replays,
    // or the per-batch rebuilds. A dropped/duplicated/misrouted arrival
    // breaks the hash; the walk itself is spec territory.
    "streaming_graph_ingest" ->
      s"""WITH $kmeansCte
         |SELECT CAST(cid AS INT) AS cell_id,
         |  CAST(count(*) AS BIGINT) AS n_nodes, bit_xor(vec_id) AS id_xor
         |FROM s2f WHERE vec_id <> 0 GROUP BY 1 ORDER BY 1""".stripMargin,

    // Twin of ann_graph_retrain: the assignment manifest at the NEW
    // geometry — k=4 kmeans trained on the store's own content (the
    // vec_id<>0 slice), no notion of the old build or the swap.
    "ann_graph_retrain" ->
      s"""WITH ${kmeansCteOn("vec_id <> 0", 4)}
         |SELECT CAST(cid AS INT) AS cell_id,
         |  CAST(count(*) AS BIGINT) AS n_nodes, bit_xor(vec_id) AS id_xor
         |FROM s2f GROUP BY 1 ORDER BY 1""".stripMargin,

    "ann_ivfsq_store" -> ivfSqTop10Sql,
    // incremental SQ append: frozen quantizer (full-corpus centroids +
    // min/max) => the maintained store equals the full build, same SQL
    "ann_ivfsq_incremental" -> ivfSqTop10Sql,
    "streaming_sq_ingest" -> ivfSqTop10Sql,

    // Twin of ann_sq_retrain: the SAME SQ chain re-derived at the
    // RETRAINED geometry (4 cells, 2-probe) with full-corpus min/max —
    // no notion of the stale standing-slice build, the frozen-quantizer
    // appends, or the swap; a hash match proves the retrain verb equals
    // a from-scratch 4-cell build.
    "ann_sq_retrain" -> ivfSqTop10SqlAt(4, 2),

    // Twin of ann_pq_retrain: the full IVF-PQ chain at the retrained
    // 8-cell geometry (codebooks refitted on the store's own vectors =
    // the corpus, which is what the generated chain trains on).
    "ann_pq_retrain" -> ivfPqSql(
      ncells = 8, iters = 3, m = 8, dsub = 8, ksubMax = 256,
      nprobe = 4, k = 10, rerank = 4),

    // Twin of ann_bq_retrain: the centered-BQ chain (see the val).
    "ann_bq_retrain" -> bqCenteredTop10Sql,

    // Twin of ann_mutable_pq: the full generated PQ chain — coarse
    // router + codebooks trained on the ORIGINAL corpus (the attach
    // state), the encode/search side restated over the LIVE relation
    // (reversed %3 vectors, %6 gone), single query vec 0. A stale code,
    // a resurrected delete, or a drifted codebook all break the hash.
    "ann_mutable_pq" -> ivfPqSql(
      ncells = 16, iters = 3, m = 8, dsub = 8, ksubMax = 256,
      nprobe = 4, k = 10, rerank = 4,
      srcSql = """SELECT vec_id,
                 |    CASE WHEN vec_id % 10 = 3 THEN list_reverse(embedding)
                 |         ELSE embedding END AS embedding
                 |  FROM embeddings WHERE vec_id % 10 <> 6""".stripMargin,
      qWhere = "vec_id = 0", emitQid = false),


    // Twin of ann_graph_walk: the beam-walk KERNEL replayed as a
    // recursive-CTE state machine — one neighbor OFFER or candidate POP
    // per recursion step, carrying (visited, cand, res) as list state
    // with the kernel's exact (dist, id) orderings, adjacency-order
    // offers, ef=24 bound and stop rule. The M=6 kNN adjacency is
    // re-derived relationally (the SQL-expressible graph construction);
    // distances use the established list_transform double-accumulation
    // kernel. MATERIALIZED pins keep the per-step joins O(1)-ish.
    "ann_graph_walk" ->
      """        |WITH RECURSIVE
        |corpus AS (
        |  SELECT CAST(vec_id AS BIGINT) AS id, embedding AS v
        |  FROM embeddings WHERE vec_id <> 0 AND vec_id < 500),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |pairs AS MATERIALIZED (
        |  SELECT a.id AS src, b.id AS dst,
        |    list_sum(list_transform(range(1,65),
        |      i -> (a.v[i]::DOUBLE - b.v[i]::DOUBLE) * (a.v[i]::DOUBLE - b.v[i]::DOUBLE))) AS d
        |  FROM corpus a JOIN corpus b ON a.id <> b.id),
        |ranked AS (
        |  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY d, dst) AS r
        |  FROM pairs),
        |adj AS MATERIALIZED (
        |  SELECT src, list(dst ORDER BY r) AS nbrs
        |  FROM ranked WHERE r <= 6 GROUP BY src),
        |qd AS MATERIALIZED (
        |  SELECT c.id, list_sum(list_transform(range(1,65),
        |      i -> (c.v[i]::DOUBLE - q.qv[i]::DOUBLE) * (c.v[i]::DOUBLE - q.qv[i]::DOUBLE))) AS d
        |  FROM corpus c, q),
        |entry AS (SELECT min(id) AS id FROM corpus),
        |walk AS (
        |  SELECT
        |    [e.id] AS visited,
        |    [{'d': qd.d, 'id': e.id}] AS cand,
        |    [{'d': qd.d, 'id': e.id}] AS res,
        |    CAST(NULL AS BIGINT[]) AS nbrs,
        |    0 AS ni,
        |    false AS stopped
        |  FROM entry e JOIN qd ON qd.id = e.id
        |  UNION ALL
        |  SELECT
        |    CASE WHEN s.popping OR s.seen THEN s.visited
        |         ELSE list_append(s.visited, s.nb) END AS visited,
        |    CASE WHEN s.popping THEN s.sc[2:]
        |         WHEN s.seen OR NOT s.enter THEN s.cand
        |         ELSE list_append(s.cand, {'d': s.dn, 'id': s.nb}) END AS cand,
        |    CASE WHEN s.popping OR s.seen OR NOT s.enter THEN s.res
        |         WHEN len(s.res) >= 24 THEN list_sort(list_append(s.res, {'d': s.dn, 'id': s.nb}))[1:24]
        |         ELSE list_append(s.res, {'d': s.dn, 'id': s.nb}) END AS res,
        |    CASE WHEN s.popping AND NOT (len(s.cand) = 0 OR s.stop_now) THEN s.c_nbrs
        |         WHEN s.popping THEN NULL
        |         ELSE s.nbrs END AS nbrs,
        |    CASE WHEN s.popping THEN 0 ELSE s.ni + 1 END AS ni,
        |    CASE WHEN s.popping AND (len(s.cand) = 0 OR s.stop_now) THEN true
        |         ELSE false END AS stopped
        |  FROM (
        |    SELECT w.visited, w.cand, w.res, w.nbrs, w.ni,
        |      (w.nbrs IS NULL OR w.ni >= len(w.nbrs)) AS popping,
        |      list_sort(w.cand) AS sc,
        |      list_sort(w.res)[-1] AS mr,
        |      sc[1].id AS c_id,
        |      aj.nbrs AS c_nbrs,
        |      (len(w.res) >= 24 AND (sc[1].d > (mr).d OR (sc[1].d = (mr).d AND sc[1].id > (mr).id))) AS stop_now,
        |      CASE WHEN NOT (w.nbrs IS NULL OR w.ni >= len(w.nbrs))
        |           THEN w.nbrs[w.ni + 1] END AS nb,
        |      CASE WHEN NOT (w.nbrs IS NULL OR w.ni >= len(w.nbrs))
        |             AND list_contains(w.visited, w.nbrs[w.ni + 1]) THEN true
        |           ELSE false END AS seen,
        |      qn.d AS dn,
        |      CASE WHEN NOT (w.nbrs IS NULL OR w.ni >= len(w.nbrs))
        |             AND NOT list_contains(w.visited, w.nbrs[w.ni + 1])
        |           THEN (len(w.res) < 24
        |                 OR qn.d < list_sort(w.res)[-1].d
        |                 OR (qn.d = list_sort(w.res)[-1].d
        |                     AND w.nbrs[w.ni + 1] < list_sort(w.res)[-1].id))
        |           ELSE false END AS enter
        |    FROM walk w
        |    LEFT JOIN adj aj ON aj.src = list_sort(w.cand)[1].id
        |    LEFT JOIN qd qn ON qn.id = (CASE WHEN w.nbrs IS NOT NULL AND w.ni < len(w.nbrs)
        |                                     THEN w.nbrs[w.ni + 1] END)
        |    WHERE NOT w.stopped
        |  ) s
        |),
        |final AS (SELECT res FROM walk WHERE stopped),
        |flat AS (SELECT unnest(res) AS r FROM final),
        |topk AS (SELECT r.d AS d, r.id AS id FROM flat ORDER BY d, id LIMIT 10)
        |SELECT id AS vec_id, floor(d * 1e6 + 0.5) / 1e6 AS dist
        |FROM topk ORDER BY dist, vec_id""".stripMargin,

    // Twin of ann_graph_exhaustive: exact l2² top-10 — the identity the
    // exhaustive walk configuration must reproduce bit-for-bit (the
    // beam never prunes, so the walk kernel degenerates to exact kNN).
    // The one oracle-checkable point of the graph family's kernel.
    "ann_graph_exhaustive" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, round($l2sqToQv, 6) AS distance
         |FROM embeddings e, q WHERE vec_id <> 0
         |ORDER BY distance, vec_id LIMIT 10""".stripMargin,

    // Twin of ann_graph_probe — the probe-DERIVATION half of a graph
    // search: probe set + order through the kmeans twin and the
    // sqProbeCells floor-rounded lowest-cid rule, per-cell population
    // from the same assignments, emitted count = least(k, population)
    // (the walk must fill its per-cell top-k whenever the cell holds
    // k reachable nodes — the connectivity pin). Probed-but-empty cells
    // appear on neither side (both use inner joins to the population).
    "ann_graph_probe" ->
      s"""WITH $kmeansCte,
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |pd AS (SELECT c.cid, floor(list_sum(list_transform(range(1,65),
         |    i -> (q.qv[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)])
         |       * (q.qv[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]))) * 1e6 + 0.5) / 1e6 AS dr
         |  FROM c2 c, q),
         |probe AS (SELECT cid, CAST(rn - 1 AS INT) AS probe_rank FROM (
         |    SELECT cid, row_number() OVER (ORDER BY dr, cid) AS rn FROM pd)
         |  WHERE rn <= 4),
         |pop AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_nodes
         |  FROM s2f WHERE vec_id <> 0 GROUP BY cid)
         |SELECT p.probe_rank, CAST(p.cid AS INT) AS cell_id, o.n_nodes,
         |  least(CAST(10 AS BIGINT), o.n_nodes) AS n_emitted
         |FROM probe p JOIN pop o ON o.cid = p.cid
         |ORDER BY probe_rank""".stripMargin,

    // Twin of ann_graph_batch_probe — the single-query probe anchor's
    // derivation replayed PER QUERY of the batch: probe set + order from
    // the kmeans twin and the floor-rounded lowest-cid rule partitioned
    // by qid, per-cell population over the vec_id >= 3 corpus, emitted
    // count = least(k, population) (connectivity pin per (query, cell)).
    "ann_graph_batch_probe" ->
      s"""WITH $kmeansCte,
         |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |  WHERE vec_id < 3),
         |pd AS (SELECT q.qid, c.cid, floor(list_sum(list_transform(range(1,65),
         |    i -> (q.qv[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)])
         |       * (q.qv[CAST(i AS INT)]::DOUBLE - c.v[CAST(i AS INT)]))) * 1e6 + 0.5) / 1e6 AS dr
         |  FROM c2 c, q),
         |probe AS (SELECT qid, cid, CAST(rn - 1 AS INT) AS probe_rank FROM (
         |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY dr, cid) AS rn
         |    FROM pd)
         |  WHERE rn <= 4),
         |pop AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_nodes
         |  FROM s2f WHERE vec_id >= 3 GROUP BY cid)
         |SELECT p.qid, p.probe_rank, CAST(p.cid AS INT) AS cell_id, o.n_nodes,
         |  least(CAST(10 AS BIGINT), o.n_nodes) AS n_emitted
         |FROM probe p JOIN pop o ON o.cid = p.cid
         |ORDER BY qid, probe_rank""".stripMargin,

    // Twin of ann_graph_vacuum — the waypoint-GC verb under a FULL hash:
    // the post-vacuum exhaustive walk must equal exact kNN over the live
    // corpus (deleted %6 gone), the accounting is integer-exact (the
    // delete-only script makes garbage EXACTLY the deleted ids — deletes
    // write no data rows, so refresh touches no cells), and the parity
    // bits assert vacuum rewrote at least one cell without changing
    // anything a search could see.
    "ann_graph_vacuum" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(count(*) FILTER (WHERE vec_id % 10 = 6) AS BIGINT) AS n6
         |  FROM embeddings),
         |top AS (
         |  SELECT vec_id, floor($l2sqToQv * 1e6 + 0.5) / 1e6 AS dist
         |  FROM embeddings e, q WHERE vec_id % 10 <> 6
         |  ORDER BY dist, vec_id LIMIT 10)
         |SELECT t.vec_id, t.dist,
         |  c.n AS n_nodes_before, c.n - c.n6 AS n_live,
         |  c.n6 AS n_garbage_before,
         |  c.n - c.n6 AS n_nodes_after, CAST(0 AS BIGINT) AS n_garbage_after,
         |  true AS vacuumed_any, true AS search_unchanged
         |FROM top t, c ORDER BY dist, vec_id""".stripMargin,

    // Twin of ann_sq_vacuum — the relational families' stale-version GC:
    // after the registry's standard mutation script the index holds
    // n + n3 versions of which n3 (superseded) + n6 (deleted) are
    // garbage; vacuum keeps exactly the live n - n6, zero pending, and
    // the probe answers identically before and after.
    "ann_sq_vacuum" ->
      """WITH c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) FILTER (WHERE vec_id % 10 = 3) AS BIGINT) AS n3,
        |  CAST(count(*) FILTER (WHERE vec_id % 10 = 6) AS BIGINT) AS n6
        |  FROM embeddings)
        |SELECT n + n3 AS n_rows_before, n - n6 AS n_live,
        |  n3 + n6 AS n_garbage_before,
        |  n - n6 AS n_rows_after, CAST(0 AS BIGINT) AS n_garbage_after,
        |  CAST(0 AS BIGINT) AS n_pending_after,
        |  true AS vacuumed_any, true AS search_unchanged
        |FROM c""".stripMargin,

    // Twin of ann_vacuum_advisor — BOTH rewrite DECISIONS under the
    // hash (the compact-advisor discipline). The flat BQ arm's
    // worst-cell ppm is the global integer fraction
    // floor(1e6 * garbage / (live + garbage)) = 1e6*(n3+n6) // (n+n3).
    // The cell-partitioned SQ arm re-derives the frozen router (kmeans
    // CTE at k=4 over the attach-time corpus), assigns the reversed %3
    // upserts with it, replays each cell's garbage fraction, the
    // dirty-cell selection (garb > 0 AND ppm > 100000 — vacuumCells'
    // rule), and the post-vacuum state (dirty cells scrubbed, clean
    // cells keep their garbage).
    "ann_vacuum_advisor" ->
      s"""WITH ${kmeansCteOn("TRUE", 4)},
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) FILTER (WHERE vec_id % 10 = 3) AS BIGINT) AS n3,
        |  CAST(count(*) FILTER (WHERE vec_id % 10 = 6) AS BIGINT) AS n6
        |  FROM embeddings),
        |revd AS (SELECT e.vec_id, cb.cid,
        |    floor(list_sum(list_transform(range(1,65),
        |      i -> (e.embedding[CAST(65 - i AS INT)]::DOUBLE - cb.v[CAST(i AS INT)])
        |         * (e.embedding[CAST(65 - i AS INT)]::DOUBLE - cb.v[CAST(i AS INT)]))) * 1e6 + 0.5) / 1e6 AS dr
        |  FROM embeddings e CROSS JOIN c2 cb WHERE e.vec_id % 10 = 3),
        |reva AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dr, cid) AS rn
        |  FROM revd) WHERE rn = 1),
        |cells AS (SELECT cid, CAST(sum(live) AS BIGINT) AS live,
        |    CAST(sum(garb) AS BIGINT) AS garb FROM (
        |  SELECT cid,
        |    CASE WHEN vec_id % 10 IN (3, 6) THEN 0 ELSE 1 END AS live,
        |    CASE WHEN vec_id % 10 IN (3, 6) THEN 1 ELSE 0 END AS garb
        |  FROM s2f
        |  UNION ALL SELECT cid, 1, 0 FROM reva) GROUP BY 1),
        |cppm AS (SELECT cid, live, garb,
        |    CASE WHEN live + garb = 0 THEN 0
        |      ELSE (1000000 * garb) // (live + garb) END AS ppm
        |  FROM cells),
        |dirty AS (SELECT cid FROM cppm WHERE garb > 0 AND ppm > 100000),
        |sqb AS (SELECT CAST(sum(live + garb) AS BIGINT) AS n_rows,
        |    CAST(sum(live) AS BIGINT) AS n_live,
        |    CAST(sum(garb) AS BIGINT) AS n_garbage,
        |    CAST(max(ppm) AS BIGINT) AS worst FROM cppm),
        |sqa AS (SELECT
        |    CAST(sum(live + CASE WHEN cid IN (SELECT cid FROM dirty)
        |      THEN 0 ELSE garb END) AS BIGINT) AS n_rows,
        |    CAST(sum(live) AS BIGINT) AS n_live,
        |    CAST(sum(CASE WHEN cid IN (SELECT cid FROM dirty)
        |      THEN 0 ELSE garb END) AS BIGINT) AS n_garbage,
        |    CAST(max(CASE WHEN cid IN (SELECT cid FROM dirty)
        |      THEN 0 ELSE ppm END) AS BIGINT) AS worst FROM cppm)
        |SELECT * FROM (
        |  SELECT 'vecs_bq' AS "index", n + n3 AS n_rows, n - n6 AS n_live,
        |    CAST(0 AS BIGINT) AS n_pending, n3 + n6 AS n_garbage,
        |    (1000000 * (n3 + n6)) // (n + n3) AS worst_cell_garbage_ppm,
        |    ((1000000 * (n3 + n6)) // (n + n3)) > 100000 AS vacuum_recommended,
        |    'before' AS phase,
        |    ((1000000 * (n3 + n6)) // (n + n3)) > 100000 AS rewrote
        |  FROM c
        |  UNION ALL
        |  SELECT 'vecs_sq', (SELECT n_rows FROM sqb), (SELECT n_live FROM sqb),
        |    CAST(0 AS BIGINT), (SELECT n_garbage FROM sqb),
        |    (SELECT worst FROM sqb),
        |    (SELECT n_garbage FROM sqb) > 0 AND (SELECT worst FROM sqb) > 100000,
        |    'before', (SELECT count(*) FROM dirty) > 0
        |  UNION ALL
        |  SELECT 'vecs_bq', n - n6, n - n6, CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT), CAST(0 AS BIGINT), false, 'after',
        |    ((1000000 * (n3 + n6)) // (n + n3)) > 100000
        |  FROM c
        |  UNION ALL
        |  SELECT 'vecs_sq', (SELECT n_rows FROM sqa), (SELECT n_live FROM sqa),
        |    CAST(0 AS BIGINT), (SELECT n_garbage FROM sqa),
        |    (SELECT worst FROM sqa),
        |    (SELECT n_garbage FROM sqa) > 0 AND (SELECT worst FROM sqa) > 100000,
        |    'after', (SELECT count(*) FROM dirty) > 0)
        |ORDER BY phase, "index"""".stripMargin,

    // Twin of mine_triplets — label-aware triplet mining under the
    // hash: the anchor-batch cross join scored in integer micro-units
    // (the double-accumulated cosine, floor-rounded BEFORE any
    // comparison), the per-anchor nearest-positive max, the
    // (cos desc, id) top-10 other-class window, and the
    // hard/semi_hard/easy tier CASE — per-pair decisions included.
    "mine_triplets" ->
      s"""WITH a AS (SELECT vec_id AS a_id, embedding, label AS a_label
         |  FROM embeddings WHERE vec_id < 6),
         |scored AS (SELECT a.a_id, a.a_label, b.vec_id AS neg_id,
         |    b.label AS neg_label,
         |    CAST(floor(($cosineDouble) * 1e6 + 0.5) AS BIGINT) AS cos_mu
         |  FROM embeddings b CROSS JOIN a WHERE b.vec_id <> a.a_id),
         |pos AS (SELECT a_id, CAST(max(cos_mu) AS BIGINT) AS pos_cos_mu
         |  FROM scored WHERE neg_label = a_label GROUP BY 1),
         |negs AS (SELECT *, row_number() OVER (PARTITION BY a_id
         |      ORDER BY cos_mu DESC, neg_id) AS rank
         |  FROM scored WHERE neg_label <> a_label)
         |SELECT n.a_id, n.neg_id, n.neg_label, n.cos_mu,
         |  CAST(n.rank AS INT) AS rank, p.pos_cos_mu,
         |  CASE WHEN n.cos_mu >= p.pos_cos_mu THEN 'hard'
         |    WHEN n.cos_mu + 50000 >= p.pos_cos_mu THEN 'semi_hard'
         |    ELSE 'easy' END AS tier
         |FROM negs n JOIN pos p USING (a_id)
         |WHERE n.rank <= 10
         |ORDER BY a_id, rank""".stripMargin,

    // Twin of ann_retrain_advisor — the retrain DECISION under the
    // hash: both arms' routers re-derived relationally (simIvf CTE at
    // each arm's training source — full corpus for the clean arm,
    // standing slice for the stale one), the stale arm's 2x-scaled
    // arrivals assigned by the frozen router (x*2 is exact in float32,
    // so embedding[i]::DOUBLE * 2 is the identical vector), every
    // per-row error
    // floor-rounded to LONG micro-units BEFORE summing (order-free
    // integer aggregation — the exact Scala discipline), and the two
    // ppm ratios + threshold comparisons replayed as integer CASE
    // arithmetic. The clean arm's growth is exactly 1_000_000 by
    // construction (baseline == current), so a drifted baseline
    // sidecar, a wrong rounding, or an inverted threshold hash-fails.
    "ann_retrain_advisor" ->
      s"""WITH ${simIvfCte(8, 2, "TRUE", "cl")},
         |${simIvfCte(8, 2, "vec_id % 10 <> 7", "st")},
         |clrows AS (SELECT cid, CAST(floor(dr * 1e6 + 0.5) AS BIGINT) AS mu
         |  FROM claf WHERE rn = 1),
         |clagg AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(count(DISTINCT cid) AS BIGINT) AS ncells,
         |    CAST(sum(mu) AS BIGINT) AS se FROM clrows),
         |clmx AS (SELECT CAST(max(c) AS BIGINT) AS mx FROM (
         |    SELECT count(*) AS c FROM clrows GROUP BY cid)),
         |strows0 AS (SELECT cid, CAST(floor(dr * 1e6 + 0.5) AS BIGINT) AS mu
         |  FROM staf WHERE rn = 1 AND vec_id % 10 <> 7),
         |strev AS (SELECT e.vec_id, c.cid, list_sum(list_transform(range(1,65),
         |      i -> (e.embedding[CAST(i AS INT)]::DOUBLE * 2 - c.v[CAST(i AS INT)])
         |         * (e.embedding[CAST(i AS INT)]::DOUBLE * 2 - c.v[CAST(i AS INT)]))) AS dr
         |  FROM embeddings e CROSS JOIN stc2 c WHERE e.vec_id % 10 = 7),
         |streva AS (SELECT cid, CAST(floor(dr * 1e6 + 0.5) AS BIGINT) AS mu
         |  FROM (SELECT cid, dr,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dr, cid) AS rn
         |    FROM strev) WHERE rn = 1),
         |strows AS (SELECT * FROM strows0 UNION ALL SELECT * FROM streva),
         |stagg AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(count(DISTINCT cid) AS BIGINT) AS ncells,
         |    CAST(sum(mu) AS BIGINT) AS se FROM strows),
         |stmx AS (SELECT CAST(max(c) AS BIGINT) AS mx FROM (
         |    SELECT count(*) AS c FROM strows GROUP BY cid)),
         |stbase AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(mu) AS BIGINT) AS se FROM strows0)
         |SELECT * FROM (
         |  SELECT 'clean' AS arm, n AS n_rows, CAST(ncells AS INT) AS n_cells,
         |    se // n AS build_mean_err_mu, se // n AS mean_err_mu,
         |    CAST(1000000 AS BIGINT) AS err_growth_ppm,
         |    (SELECT mx FROM clmx) * 1000000 // n AS max_cell_share_ppm,
         |    (SELECT mx FROM clmx) * 1000000 // n > 500000 AS retrain_recommended
         |  FROM clagg
         |  UNION ALL
         |  SELECT 'stale', a.n, CAST(a.ncells AS INT),
         |    b.se // b.n, a.se // a.n,
         |    (a.se // a.n) * 1000000 // (b.se // b.n),
         |    (SELECT mx FROM stmx) * 1000000 // a.n,
         |    (a.se // a.n) * 1000000 // (b.se // b.n) > 1200000
         |      OR (SELECT mx FROM stmx) * 1000000 // a.n > 500000
         |  FROM stagg a, stbase b)
         |ORDER BY arm""".stripMargin,

    // Twin of ann_graph_adaptive: both filter arms' exact top-10 (the
    // selective arm takes the exact 'pre' branch outright; the broad arm
    // runs the walk exhaustively, where it provably equals exact kNN),
    // with the COST DECISION replayed relationally — path = CASE on the
    // same m-vs-0.05·n comparison the Scala verb makes, so an inverted
    // or drifted threshold hash-fails.
    "ann_graph_adaptive" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |n AS (SELECT count(*) AS n FROM embeddings WHERE vec_id <> 0),
         |msel AS (SELECT count(*) AS m FROM embeddings
         |  WHERE vec_id <> 0 AND vec_id % 25 = 3),
         |mbrd AS (SELECT count(*) AS m FROM embeddings
         |  WHERE vec_id <> 0 AND label IN (1,2,3)),
         |sel AS (SELECT 'selective' AS qtag, vec_id, round($l2sqToQv, 6) AS dist,
         |    CASE WHEN (SELECT m FROM msel)::DOUBLE <= (SELECT n FROM n) * 0.05
         |      THEN 'pre' ELSE 'post' END AS path
         |  FROM embeddings e, q WHERE vec_id <> 0 AND vec_id % 25 = 3
         |  ORDER BY dist, vec_id LIMIT 10),
         |brd AS (SELECT 'broad' AS qtag, vec_id, round($l2sqToQv, 6) AS dist,
         |    CASE WHEN (SELECT m FROM mbrd)::DOUBLE <= (SELECT n FROM n) * 0.05
         |      THEN 'pre' ELSE 'post' END AS path
         |  FROM embeddings e, q WHERE vec_id <> 0 AND label IN (1,2,3)
         |  ORDER BY dist, vec_id LIMIT 10)
         |SELECT qtag AS q, vec_id, dist, path FROM sel
         |UNION ALL
         |SELECT qtag AS q, vec_id, dist, path FROM brd
         |ORDER BY q, dist, vec_id""".stripMargin,

    "vec_knn" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, round($l2sqToQv, 6) AS distance
         |FROM embeddings e, q ORDER BY distance, vec_id LIMIT 10""".stripMargin,

    // Twin of vec_knn_ip — inner-product space: negative dot ranks,
    // floor-form rounding, id ties, query row excluded.
    "vec_knn_ip" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label,
         |  floor(list_sum(list_transform(range(1,65),
         |    i -> e.embedding[CAST(i AS INT)]::DOUBLE * q.qv[CAST(i AS INT)]::DOUBLE)) * 1e6 + 0.5) / 1e6 AS score
         |FROM embeddings e, q WHERE vec_id <> 0
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    "vec_knn_filtered" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, round($l2sqToQv, 6) AS distance
         |FROM embeddings e, q WHERE label IN (1,2,3)
         |ORDER BY distance, vec_id LIMIT 10""".stripMargin,

    // Twin of vec_percolate AND streaming_vec_percolate (the stream is
    // the stateless broadcast form of the same kernel) — every (doc,
    // standing subscription) pair at rounded cosine >= 0.3; the
    // operator's broadcast staging must be invisible next to this
    // direct cross-join form.
    "vec_percolate" -> vecPercolateSql,
    "streaming_vec_percolate" -> vecPercolateSql,
    "vec_percolate_lsh" -> vecPercolateLshSql,

    // Twin of vec_percolate_auto — the percolate crossover DECISION
    // under the hash (the adaptiveFilteredKnn discipline): both
    // percolate forms restated over the %5 standing split, the choice a
    // CASE over the SAME rows·(4·dim+24) <= 40000 broadcast-bytes
    // arithmetic the Scala advisor computes, so an inverted or drifted
    // threshold hash-fails — not just the chosen branch's rows.
    "vec_percolate_auto" ->
      s"""WITH dec AS (SELECT CASE
         |    WHEN CAST(count(*) AS BIGINT) * (4 * max(len(embedding)) + 24) <= 40000
         |    THEN 'broadcast' ELSE 'lsh' END AS path
         |  FROM embeddings WHERE vec_id % 5 = 0),
         |sigs AS (
         |$lshSigArms),
         |qsig AS (SELECT vec_id AS q_id, t, bucket FROM sigs WHERE vec_id % 5 = 0),
         |dsig AS (SELECT vec_id, t, bucket FROM sigs WHERE vec_id % 5 <> 0),
         |cand AS (SELECT DISTINCT d.vec_id, q.q_id
         |  FROM dsig d JOIN qsig q ON d.t = q.t AND d.bucket = q.bucket)
         |SELECT a.vec_id, b.vec_id AS q_id,
         |  floor(($cosineDouble) * 1e6 + 0.5) / 1e6 AS cosine,
         |  'broadcast' AS path
         |FROM embeddings a CROSS JOIN embeddings b
         |WHERE a.vec_id % 5 <> 0 AND b.vec_id % 5 = 0
         |  AND floor(($cosineDouble) * 1e6 + 0.5) / 1e6 >= 0.3
         |  AND (SELECT path FROM dec) = 'broadcast'
         |UNION ALL
         |SELECT c.vec_id, c.q_id,
         |  floor(($cosineDouble) * 1e6 + 0.5) / 1e6 AS cosine,
         |  'lsh' AS path
         |FROM cand c
         |JOIN embeddings a ON a.vec_id = c.vec_id
         |JOIN embeddings b ON b.vec_id = c.q_id
         |WHERE floor(($cosineDouble) * 1e6 + 0.5) / 1e6 >= 0.3
         |  AND (SELECT path FROM dec) = 'lsh'
         |ORDER BY vec_id, q_id""".stripMargin,

    // Twin of knn_classify — brute-force cosine top-15 per probe over the
    // labeled 99%, then the majority vote with the count-desc/label-asc
    // tiebreak the Spark verb declares.
    "knn_classify" ->
      s"""WITH probes AS (SELECT vec_id AS probe_id, embedding
         |    FROM embeddings WHERE vec_id % 100 = 0),
         |s AS (SELECT b.probe_id, a.vec_id, a.label, round($cosineDouble, 6) AS cosine
         |      FROM embeddings a, probes b WHERE a.vec_id % 100 <> 0),
         |r AS (SELECT probe_id, label,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rank
         |  FROM s),
         |votes AS (SELECT probe_id, label, CAST(count(*) AS BIGINT) AS n_votes
         |  FROM r WHERE rank <= 15 GROUP BY probe_id, label),
         |best AS (SELECT probe_id, label, n_votes,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY n_votes DESC, label) AS vr
         |  FROM votes)
         |SELECT probe_id, label AS pred_label, n_votes FROM best
         |WHERE vr = 1 ORDER BY probe_id""".stripMargin,

    // Twin of ann_grouped_topk — per-label l2² top-2 for the vec_id=0
    // query (diversified serving results).
    "ann_grouped_topk" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |s AS (SELECT vec_id, label, round($l2sqToQv, 6) AS distance
         |      FROM embeddings e, q),
         |r AS (SELECT label, vec_id, distance,
         |    CAST(row_number() OVER (PARTITION BY label ORDER BY distance, vec_id) AS BIGINT) AS rank
         |  FROM s)
         |SELECT label, vec_id, distance, rank FROM r WHERE rank <= 2
         |ORDER BY label, rank""".stripMargin,

    // Twin of rag_maxsim — late-interaction MaxSim over 4×16-dim slices:
    // per (doc, d_slot, q_slot) double dot, max over d_slot, the four
    // per-q-slot maxes added in fixed slot order (CASE pivot), floor 1e-6.
    "rag_maxsim" ->
      s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
         |slots(sl) AS (VALUES (0), (1), (2), (3)),
         |sub AS (SELECT e.vec_id, dsl.sl AS ds, qsl.sl AS qs,
         |    list_sum(list_transform(range(1, 17),
         |      i -> e.embedding[(i + 16*dsl.sl)::INT]::DOUBLE * q.embedding[(i + 16*qsl.sl)::INT]::DOUBLE)) AS dt
         |  FROM embeddings e, q, slots dsl, slots qsl),
         |m AS (SELECT vec_id, qs, max(dt) AS m FROM sub GROUP BY 1, 2),
         |sc AS (SELECT vec_id, floor((
         |      max(CASE WHEN qs = 0 THEN m END) + max(CASE WHEN qs = 1 THEN m END)
         |    + max(CASE WHEN qs = 2 THEN m END) + max(CASE WHEN qs = 3 THEN m END)
         |  ) * 1e6 + 0.5) / 1e6 AS maxsim
         |  FROM m GROUP BY vec_id)
         |SELECT vec_id, maxsim FROM sc
         |ORDER BY maxsim DESC, vec_id LIMIT 20""".stripMargin,

    "vec_topk_join" ->
      s"""WITH qs AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < 5),
         |s AS (SELECT b.q_id, a.vec_id, round($cosineDouble, 6) AS cosine
         |      FROM embeddings a, qs b),
         |r AS (SELECT q_id, vec_id, cosine,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
         |  FROM s)
         |SELECT q_id, vec_id, cosine, rank FROM r WHERE rank <= 10
         |ORDER BY q_id, rank""".stripMargin,

    "rag_context" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |s AS (SELECT vec_id, round($l2sqToQv, 6) AS distance
         |      FROM embeddings e, q ORDER BY distance, vec_id LIMIT 10),
         |h AS (SELECT s.vec_id, s.distance,
         |    '[Source: ' || d.source || ', Chunk: ' || d.doc_id::VARCHAR || '_chunk_0]'
         |      || chr(10) || d.text || chr(10) AS piece
         |  FROM s JOIN documents d ON d.doc_id = s.vec_id),
         |cum AS (SELECT piece, distance, vec_id,
         |    CAST(sum(length(piece)) OVER (ORDER BY distance, vec_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM h),
         |kept AS (SELECT * FROM cum WHERE cum <= 2000)
         |SELECT coalesce(string_agg(piece, chr(10) || '---' || chr(10) ORDER BY cum), '') AS context,
         |  count(*) AS pieces_used, coalesce(max(cum), 0) AS context_chars
         |FROM kept""".stripMargin,

    "rag_rerank" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |s AS (SELECT e.vec_id, e.label, e.embedding, q.qv,
         |    $l2sqToQv AS dist
         |  FROM embeddings e, q ORDER BY dist, vec_id LIMIT 50)
         |SELECT vec_id, label,
         |  round(list_sum(list_transform(range(1,65), i -> s.embedding[i]::DOUBLE * s.qv[i]::DOUBLE)) /
         |        sqrt(list_sum(list_transform(range(1,65), i -> s.embedding[i]::DOUBLE * s.embedding[i]::DOUBLE)) *
         |             list_sum(list_transform(range(1,65), i -> s.qv[i]::DOUBLE * s.qv[i]::DOUBLE))), 6) AS cos
         |FROM s ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,

    "rag_hybrid_search" ->
      """WITH kw AS (SELECT doc_id,
        |    (CASE WHEN contains(lower(text), 'hash') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lower(text), 'merge') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lower(text), 'scan') THEN 1 ELSE 0 END) AS kw_score
        |  FROM documents),
        |kwtop AS (SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY kw_score DESC, doc_id) AS BIGINT) AS rank_kw
        |  FROM kw ORDER BY kw_score DESC, doc_id LIMIT 100),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |vs AS (SELECT e.vec_id AS doc_id,
        |    list_sum(list_transform(range(1,65), i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE)) /
        |    sqrt(list_sum(list_transform(range(1,65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)) *
        |         list_sum(list_transform(range(1,65), i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE))) AS cos
        |  FROM embeddings e, q),
        |vtop AS (SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS rank_vec
        |  FROM vs ORDER BY cos DESC, doc_id LIMIT 100)
        |SELECT doc_id, rank_kw, rank_vec,
        |  floor((coalesce(1.0/(60+rank_kw), 0) + coalesce(1.0/(60+rank_vec), 0))*1e6 + 0.5)/1e6 AS rrf
        |FROM kwtop FULL OUTER JOIN vtop USING (doc_id)
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,

    "dedup_exact" ->
      """SELECT doc_id, md5(text) AS content_hash,
        |  count(*) OVER (PARTITION BY md5(text)) AS group_size,
        |  min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
        |  doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_banding_advisor" -> bandingAdvisorSql,

    "dedup_minhash_auto" -> minhashAutoSql,

    "dedup_minhash" ->
      s"""${shinglesCte()}
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(len(list_intersect(a.s, b.s))::DOUBLE /
         |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
         |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.8
         |ORDER BY 1,2""".stripMargin,

    // Twin of dedup_incremental: EXACT Jaccard between the batch and the
    // standing corpus — equality proves the banded join's recall at
    // these parameters, exactly as the dedup_minhash oracle does for the
    // self-join form.
    "dedup_incremental" -> incrementalNearDupSql,

    // the streamed form runs the SAME per-batch incremental check, so
    // the same batch oracle verifies it verbatim (zero streaming state —
    // each micro-batch is an independent new-vs-standing band join)
    "streaming_neardup" -> incrementalNearDupSql,

    "dedup_ngram" ->
      s"""${shinglesCte(", lang")}
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(len(list_intersect(a.s, b.s))::DOUBLE /
         |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND a.lang = b.lang
         |WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
         |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.6
         |ORDER BY 1,2""".stripMargin,

    // Twin of QualityClassifier.score: the SAME checked-in weight fixture
    // is loaded here and inlined as a 256-element list literal, the hash
    // bucket is the identical md5-hex-prefix expression, and the logit is
    // an integer (fixed-point 2^20) sum — order-independent, so the two
    // engines agree bit-for-bit; the only float math is the final
    // floor-form rounding, mirrored expression-for-expression.
    "quality_classifier" -> qualityClassifierSql,

    // fixed-width binning over the SAME per-doc score query (as a
    // derived table), so the bin oracle inherits the classifier oracle's
    // exact integer-logit arithmetic
    "quality_bins" ->
      s"""SELECT CAST(least(greatest(floor((score + 1.0) * 10), 0), 19) AS BIGINT) AS bin,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_feats) AS BIGINT) AS n_feats,
         |  min(score) AS min_score, max(score) AS max_score
         |FROM ($qualityClassifierSql) GROUP BY 1 ORDER BY 1""".stripMargin,
    // the streaming form runs the IDENTICAL expressions with zero state,
    // so the batch oracle checks it verbatim
    "streaming_quality" -> qualityClassifierSql,

    // Twin of Dedup.substringSpans (n=8): identical tokenization, window
    // hashing (md5 of the space-joined 8-token slice — both engines emit
    // lowercase hex), corpus-wide occurrence count, and the same
    // gaps-and-islands window merge. dup_ratio mirrors the engine's
    // floor(x*1e6+0.5)/1e6 pure-IEEE rounding expression-for-expression.
    "dedup_substring" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
         |base AS (SELECT doc_id, len(t)::BIGINT AS n_tokens, t
         |  FROM tk WHERE len(t) >= 8),
         |sp AS (SELECT doc_id, n_tokens, i AS start,
         |    md5(array_to_string(t[i+1:i+8], ' ')) AS h
         |  FROM base, unnest(range(0, len(t) - 8 + 1)) AS u(i)),
         |dup AS (SELECT h FROM sp GROUP BY h HAVING count(*) > 1),
         |ds AS (SELECT sp.* FROM sp JOIN dup USING (h)),
         |m AS (SELECT doc_id, n_tokens, start,
         |    max(start + 7) OVER (PARTITION BY doc_id ORDER BY start
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |  FROM ds),
         |isl AS (SELECT doc_id, n_tokens, start,
         |    sum(CASE WHEN prev_end IS NULL OR start > prev_end THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY start) AS island
         |  FROM m),
         |iv AS (SELECT doc_id, n_tokens, island,
         |    CAST(count(*) AS BIGINT) AS spans_in_island,
         |    min(start) AS i_start, max(start) + 7 AS i_end
         |  FROM isl GROUP BY 1, 2, 3)
         |SELECT doc_id, n_tokens,
         |  CAST(sum(spans_in_island) AS BIGINT) AS n_dup_spans,
         |  CAST(count(*) AS BIGINT) AS n_intervals,
         |  CAST(sum(i_end - i_start + 1) AS BIGINT) AS dup_tokens,
         |  floor(sum(i_end - i_start + 1)::DOUBLE / n_tokens * 1e6 + 0.5) / 1e6 AS dup_ratio
         |FROM iv GROUP BY 1, 2 ORDER BY doc_id""".stripMargin,

    // Removal twin: the SAME island/interval chain, then positions NOT
    // covered by any interval rebuild the scrubbed token stream
    // (string_agg ORDER BY position). Fully-covered and empty/NULL-text
    // docs coalesce to ('', 0) on both engines.
    "dedup_substring_scrub" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
         |base AS (SELECT doc_id, len(t)::BIGINT AS n_tokens, t
         |  FROM tk WHERE len(t) >= 8),
         |sp AS (SELECT doc_id, n_tokens, i AS start,
         |    md5(array_to_string(t[i+1:i+8], ' ')) AS h
         |  FROM base, unnest(range(0, len(t) - 8 + 1)) AS u(i)),
         |dup AS (SELECT h FROM sp GROUP BY h HAVING count(*) > 1),
         |ds AS (SELECT sp.* FROM sp JOIN dup USING (h)),
         |m AS (SELECT doc_id, start,
         |    max(start + 7) OVER (PARTITION BY doc_id ORDER BY start
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |  FROM ds),
         |isl AS (SELECT doc_id, start,
         |    sum(CASE WHEN prev_end IS NULL OR start > prev_end THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY start) AS island
         |  FROM m),
         |iv AS (SELECT doc_id, island, min(start) AS i_start,
         |    max(start) + 7 AS i_end
         |  FROM isl GROUP BY 1, 2),
         |pos AS (SELECT doc_id, unnest(range(0, len(t))) AS p FROM tk),
         |kept AS (SELECT pos.doc_id, pos.p FROM pos
         |  WHERE NOT EXISTS (SELECT 1 FROM iv
         |    WHERE iv.doc_id = pos.doc_id AND pos.p BETWEEN iv.i_start AND iv.i_end)),
         |rebuilt AS (SELECT k.doc_id,
         |    CAST(count(*) AS BIGINT) AS kept_tokens,
         |    string_agg(tk.t[k.p + 1], ' ' ORDER BY k.p) AS scrub_text
         |  FROM kept k JOIN tk USING (doc_id) GROUP BY 1)
         |SELECT tk.doc_id,
         |  CAST(coalesce(len(tk.t), 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(r.kept_tokens, 0) AS BIGINT) AS kept_tokens,
         |  coalesce(r.scrub_text, '') AS scrub_text
         |FROM tk LEFT JOIN rebuilt r USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // Reachability twin of Dedup.clusters: the recursive walk carries
    // every reachable label to every node; min over the walk = the
    // component minimum, exactly what min-label propagation converges
    // to. Pair set = the exact-Jaccard oracle of dedup_minhash (LSH
    // recall proven there), so the cluster labeling is fully checked.
    "dedup_clusters" ->
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(text)-4, 1)+1),
         |      i -> substr(text, i::INT, 5))) AS s
         |  FROM documents),
         |prs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
         |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.8),
         |edges AS (SELECT id_a AS a, id_b AS b FROM prs UNION SELECT id_b, id_a FROM prs),
         |walk(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, w.lbl FROM walk w JOIN edges e ON w.id = e.b),
         |comp AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY id),
         |sized AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM comp GROUP BY 1)
         |SELECT c.doc_id, c.cluster_id, s.cluster_size,
         |  c.doc_id = c.cluster_id AS is_canonical
         |FROM comp c JOIN sized s USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,

    // Twin of dedup_keep_best: the dedup_clusters reachability CTE
    // composed with the quality score, canonical = per-cluster
    // (quality DESC, doc_id) rank 1 — the keep-best retention policy
    // under the same full-labeling hash as the keep-lowest-id form.
    "dedup_keep_best" ->
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(text)-4, 1)+1),
         |      i -> substr(text, i::INT, 5))) AS s
         |  FROM documents),
         |prs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
         |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.8),
         |edges AS (SELECT id_a AS a, id_b AS b FROM prs UNION SELECT id_b, id_a FROM prs),
         |walk(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, w.lbl FROM walk w JOIN edges e ON w.id = e.b),
         |comp AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY id),
         |q AS (SELECT doc_id,
         |    floor(least(1.0,
         |      0.4 * least(len($toks)::DOUBLE / 50.0, 1.0)
         |      + 0.3 * (1.0 - (length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))::DOUBLE / length(text))
         |      + 0.3 * (len(list_distinct($toks))::DOUBLE / len($toks))) * 1e6 + 0.5) / 1e6 AS quality
         |  FROM documents),
         |rk AS (SELECT c.doc_id, c.cluster_id, q.quality,
         |    row_number() OVER (PARTITION BY c.cluster_id
         |      ORDER BY q.quality DESC, c.doc_id) AS rn
         |  FROM comp c JOIN q USING (doc_id))
         |SELECT doc_id, cluster_id, quality, rn = 1 AS is_kept
         |FROM rk ORDER BY doc_id""".stripMargin,

    // Twin of export_curriculum_shards: the pack_curriculum rank CTEs
    // plus the contiguous (rank-1)·S/n shard split and the read-back
    // manifest aggregates — rank arithmetic, split, and losslessness
    // under one hash.
    "export_curriculum_shards" ->
      s"""WITH q AS (SELECT doc_id,
         |    floor(least(1.0,
         |      0.4 * least(len($toks)::DOUBLE / 50.0, 1.0)
         |      + 0.3 * (1.0 - (length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))::DOUBLE / length(text))
         |      + 0.3 * (len(list_distinct($toks))::DOUBLE / len($toks))) * 1e6 + 0.5) / 1e6 AS quality
         |  FROM documents),
         |p AS (SELECT doc_id, quality,
         |    CAST(ntile(4) OVER (ORDER BY quality, doc_id) AS BIGINT) AS phase
         |  FROM q),
         |r AS (SELECT doc_id, phase,
         |    CAST(row_number() OVER (ORDER BY phase, md5(doc_id::VARCHAR), doc_id) AS BIGINT) AS emit_rank
         |  FROM p),
         |n AS (SELECT count(*) AS n FROM documents),
         |shd AS (SELECT doc_id, phase, emit_rank,
         |    CAST(floor((emit_rank - 1) * 8 / (SELECT n FROM n)::DOUBLE) AS INT) AS shard
         |  FROM r)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |  min(emit_rank) AS rank_lo, max(emit_rank) AS rank_hi,
         |  min(phase) AS phase_lo, max(phase) AS phase_hi,
         |  bit_xor(doc_id) AS id_xor
         |FROM shd GROUP BY shard ORDER BY shard""".stripMargin,

    // Twin of rag_late_interaction: the md5-arithmetic token embedder
    // (8 dims of md5(tok:j) rationals — exactly computable on both
    // engines), per-(doc, query-token) MaxSim, fixed-q_idx-order sum
    // via list(ORDER BY)→list_sum mirroring the engine's sort_array →
    // left-to-right fold.
    "rag_late_interaction" ->
      s"""WITH qt(q_idx, qt) AS (VALUES (0, 'hash'), (1, 'merge'), (2, 'stream'), (3, 'vector')),
         |cand AS (SELECT doc_id, text FROM documents
         |  WHERE lower(text) LIKE '%hash%' OR lower(text) LIKE '%merge%'
         |     OR lower(text) LIKE '%stream%' OR lower(text) LIKE '%vector%'),
         |dt AS (SELECT doc_id, unnest(list_distinct($toks)) AS tok FROM cand),
         |dv AS (SELECT doc_id, tok,
         |    list_transform(range(1, 9), j ->
         |      ('0x' || substr(md5(tok || ':' || j), 1, 6))::BIGINT::DOUBLE / 16777216.0) AS v
         |  FROM dt),
         |qv AS (SELECT q_idx,
         |    list_transform(range(1, 9), j ->
         |      ('0x' || substr(md5(qt || ':' || j), 1, 6))::BIGINT::DOUBLE / 16777216.0) AS v
         |  FROM qt),
         |sims AS (SELECT dv.doc_id, qv.q_idx,
         |    max(round(
         |      list_sum(list_transform(range(1, 9), i -> dv.v[i] * qv.v[i])) /
         |      sqrt(list_sum(list_transform(range(1, 9), i -> dv.v[i] * dv.v[i])) *
         |           list_sum(list_transform(range(1, 9), i -> qv.v[i] * qv.v[i]))), 6)) AS ms
         |  FROM dv, qv GROUP BY 1, 2),
         |sc AS (SELECT doc_id,
         |    floor(list_sum(list(ms ORDER BY q_idx)) * 1e6 + 0.5) / 1e6 AS score
         |  FROM sims GROUP BY doc_id)
         |SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // Twin of ann_mutual_knn: per-side top-5 ranks over the bounded
    // slice's pair relation, mutual self-join, one orientation out.
    "ann_mutual_knn" ->
      s"""WITH p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    round($cosineDouble, 6) AS cosine
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
         |  WHERE a.vec_id < 300 AND b.vec_id < 300),
         |r AS (SELECT id_a, id_b, cosine,
         |    row_number() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b) AS rank
         |  FROM p),
         |t AS (SELECT id_a, id_b, cosine FROM r WHERE rank <= 5)
         |SELECT t.id_a, t.id_b, t.cosine
         |FROM t JOIN t t2 ON t.id_a = t2.id_b AND t.id_b = t2.id_a
         |WHERE t.id_a < t.id_b ORDER BY 1, 2""".stripMargin,

    // Twin of pipeline_split_leakfree: the dedup_clusters reachability
    // CTE + the cluster-grain md5 fold rule — the no-cluster-spans-folds
    // invariant holds by construction on both sides.
    "pipeline_split_leakfree" ->
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(text)-4, 1)+1),
         |      i -> substr(text, i::INT, 5))) AS s
         |  FROM documents),
         |prs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
         |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.8),
         |edges AS (SELECT id_a AS a, id_b AS b FROM prs UNION SELECT id_b, id_a FROM prs),
         |walk(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.a, w.lbl FROM walk w JOIN edges e ON w.id = e.b),
         |comp AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY id)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN ('0x' || substr(md5(cluster_id::VARCHAR), 1, 6))::BIGINT % 10 < 8
         |    THEN 'train' ELSE 'val' END AS fold
         |FROM comp ORDER BY doc_id""".stripMargin,

    // Twin of mix_weighted_sample: the A-ES priority ln(u)/w restated
    // verbatim — md5 fraction shifted into (0,1], quality floored at
    // 1e-3, floor-rounded to 9 decimals, (priority DESC, id) top-100.
    "mix_weighted_sample" ->
      s"""WITH q AS (SELECT doc_id, source,
         |    floor(least(1.0,
         |      0.4 * least(len($toks)::DOUBLE / 50.0, 1.0)
         |      + 0.3 * (1.0 - (length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))::DOUBLE / length(text))
         |      + 0.3 * (len(list_distinct($toks))::DOUBLE / len($toks))) * 1e6 + 0.5) / 1e6 AS quality
         |  FROM documents),
         |pr AS (SELECT doc_id, source, quality,
         |    floor(ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::BIGINT::DOUBLE + 1.0) / 16777217.0)
         |      / greatest(quality, 0.001) * 1e9) / 1e9 AS priority
         |  FROM q)
         |SELECT doc_id, source, quality, priority FROM pr
         |ORDER BY priority DESC, doc_id LIMIT 100""".stripMargin,

    // Twin of mix_temperature — the τ=0.5 apportionment restated: counts
    // per source, sqrt weights floored to 1e-6 BIGINTs (sqrt is
    // correctly rounded on both engines), base quota budget·w // Σw,
    // leftover to the largest (budget·w mod Σw) remainders domain-asc —
    // integer arithmetic end to end, budget 1000.
    "mix_temperature" -> tempAllocSql(
      """SELECT source AS domain, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1""".stripMargin, 1000L),

    // Twin of mix_temperature_tokens — the same apportionment sized by
    // per-domain TOKEN sums (integer aggregates, so the one sqrt still
    // sees an exact value), token budget 100000.
    "mix_temperature_tokens" -> tempAllocSql(
      """SELECT source AS domain,
        |  CAST(sum(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT) AS n
        |  FROM documents GROUP BY 1""".stripMargin, 100000L),

    // Twin of mix_temperature_scale — the BigInt path under the hash:
    // token sums scaled x1e9 and a 1e12 budget make budget*w_fp ~ 1e25,
    // so the quota products run in HUGEINT (the Scala side's BigInt).
    "mix_temperature_scale" -> tempAllocSql(
      """SELECT source AS domain,
        |  CAST(sum(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT)
        |    * 1000000000 AS n
        |  FROM documents GROUP BY 1""".stripMargin, 1000000000000L,
      huge = true),

    // Twin of mine_hard_negatives: exact cosine (double accumulation),
    // identical band and deterministic (cosine desc, vec_id) tie-break
    "mine_hard_negatives" ->
      s"""WITH an AS (SELECT vec_id AS anchor_id, embedding AS av
         |  FROM embeddings WHERE vec_id % 100 = 0),
         |sc AS (SELECT an.anchor_id, e.vec_id,
         |    round(list_sum(list_transform(range(1,65), i -> e.embedding[i]::DOUBLE * an.av[i]::DOUBLE)) /
         |      sqrt(list_sum(list_transform(range(1,65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)) *
         |           list_sum(list_transform(range(1,65), i -> an.av[i]::DOUBLE * an.av[i]::DOUBLE))), 6) AS cosine
         |  FROM embeddings e JOIN an ON e.vec_id <> an.anchor_id),
         |bd AS (SELECT * FROM sc WHERE cosine >= 0.30 AND cosine < 0.98),
         |r AS (SELECT anchor_id, vec_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY anchor_id
         |      ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
         |  FROM bd)
         |SELECT anchor_id, vec_id, rank, cosine FROM r WHERE rank <= 5
         |ORDER BY anchor_id, rank""".stripMargin,

    // Twin of dedup_image_phash — FULL hash where r12 was rows-only:
    // the fixture pixels are CLOSED-FORM in doc_id (synthPngVariant —
    // dims and every RGB channel are modular arithmetic; odd ids render
    // base id-1 with 4 green-LSB flips), so the oracle recomputes the
    // dHash WITHOUT decoding: per-cell integer area means over the 9x8
    // clamped grid (integer division throughout, exactly dHashBytes'
    // arithmetic), horizontal-neighbor sign bits packed into two 32-bit
    // halves (bit 63 would overflow DuckDB's shift — the BQ precedent),
    // all-pairs hamming <= 3 (the 4x16 banding is recall-lossless by
    // pigeonhole, so the pair set is stated directly — the dedup_simhash
    // argument). Any PNG encode- OR decode-side bit error now breaks the
    // hash, the multimodal_decode guarantee extended to the perceptual
    // pipeline.
    "dedup_image_phash" ->
      """WITH docs AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 1 THEN doc_id - 1 ELSE doc_id END AS base,
        |    CASE WHEN doc_id % 2 = 1 THEN 4 ELSE 0 END AS flips
        |  FROM documents),
        |dims AS (SELECT doc_id, base, flips,
        |    8 + (base % 24) AS w, 8 + ((base * 7) % 24) AS h
        |  FROM docs),
        |cells AS (SELECT d.doc_id, d.base, d.flips, d.w, d.h, cy.cy, cx.cx,
        |    (cx.cx * d.w) // 9 AS x0,
        |    GREATEST(((cx.cx + 1) * d.w) // 9, (cx.cx * d.w) // 9 + 1) AS x1,
        |    (cy.cy * d.h) // 8 AS y0,
        |    GREATEST(((cy.cy + 1) * d.h) // 8, (cy.cy * d.h) // 8 + 1) AS y1
        |  FROM dims d, unnest(range(0, 8)) AS cy(cy), unnest(range(0, 9)) AS cx(cx)),
        |px AS (SELECT c.doc_id, c.cy, c.cx,
        |    ((xs.x * 31 + ys.y * 17 + c.base) % 256) * 299
        |      + (CASE WHEN ys.y * c.w + xs.x < c.flips
        |           THEN xor((xs.x * 13 + ys.y * 29 + c.base * 3) % 256, CAST(1 AS BIGINT))
        |           ELSE (xs.x * 13 + ys.y * 29 + c.base * 3) % 256 END) * 587
        |      + ((xs.x * 7 + ys.y * 11 + c.base * 5) % 256) * 114 AS gray
        |  FROM cells c,
        |    unnest(range(c.x0, LEAST(c.x1, c.w))) AS xs(x),
        |    unnest(range(c.y0, LEAST(c.y1, c.h))) AS ys(y)),
        |cm AS (SELECT doc_id, cy, cx, CAST(sum(gray) // count(*) AS BIGINT) AS mg
        |  FROM px GROUP BY 1, 2, 3),
        |bits AS (SELECT a.doc_id, a.cy * 8 + a.cx AS k,
        |    CASE WHEN a.mg > b.mg THEN 1 ELSE 0 END AS bit
        |  FROM cm a JOIN cm b ON b.doc_id = a.doc_id AND b.cy = a.cy AND b.cx = a.cx + 1
        |  WHERE a.cx < 8),
        |sigs AS (SELECT doc_id,
        |    CAST(sum(CASE WHEN bit = 1 AND k < 32 THEN (CAST(1 AS BIGINT) << CAST(k AS INT))
        |      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS lo,
        |    CAST(sum(CASE WHEN bit = 1 AND k >= 32 THEN (CAST(1 AS BIGINT) << CAST(k - 32 AS INT))
        |      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS hi
        |  FROM bits GROUP BY 1)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INT) AS hamming
        |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "dedup_embedding" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, round($cosineDouble, 6) AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE round($cosineDouble, 6) >= 0.35
         |ORDER BY 1,2""".stripMargin,

    // Bit-exact twin of Dedup.simhashUdf: FNV-1a 64 over UTF-16 units
    // (= codepoints for the BMP/ASCII corpus) via list_reduce with a
    // prepended seed, then the murmur fmix64 finalizer. HUGEINT carries
    // the mod-2^64 arithmetic; the fmix multiply (constant ~2^64) is
    // split into 32-bit halves (c_hi=0xff51afd7, c_lo=0xed558ccd) since
    // a full 64x64 product overflows even HUGEINT. The banding in
    // simhashPairsLongId is recall-lossless by pigeonhole, so the pair
    // set is stated directly: hamming(sig_a, sig_b) <= 3, id_a < id_b.
    "dedup_simhash" ->
      s"""WITH tok0 AS (
         |  SELECT doc_id, unnest($toks) AS tok FROM documents),
         |dtok AS (SELECT DISTINCT tok FROM tok0),
         |fnv AS (
         |  SELECT tok, list_reduce(
         |    list_prepend(14695981039346656037::UBIGINT,
         |      list_transform(range(1, length(tok)+1), i -> unicode(substr(tok, i::INT, 1))::UBIGINT)),
         |    (h, c) -> ((xor(h, c)::HUGEINT * 1099511628211) % 18446744073709551616::HUGEINT)::UBIGINT) AS h0
         |  FROM dtok),
         |fm1 AS (SELECT tok, xor(h0, h0 >> 33) AS h1 FROM fnv),
         |fm2 AS (SELECT tok,
         |  ((h1::HUGEINT * 3981806797) +
         |   (((h1::HUGEINT % 4294967296) * 4283543511) % 4294967296) * 4294967296)
         |   % 18446744073709551616::HUGEINT AS h2h
         |  FROM fm1),
         |hashed AS (SELECT tok, xor(h2h::UBIGINT, h2h::UBIGINT >> 33) AS h FROM fm2),
         |bits(k) AS (SELECT unnest(range(0, 64))),
         |votes AS (
         |  SELECT t.doc_id, b.k,
         |    count(*) FILTER (WHERE (x.h >> b.k) & 1 = 1) -
         |    count(*) FILTER (WHERE (x.h >> b.k) & 1 = 0) AS v
         |  FROM tok0 t JOIN hashed x USING (tok) CROSS JOIN bits b
         |  GROUP BY 1, 2),
         |sigs AS (
         |  SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::HUGEINT << k) ELSE 0::HUGEINT END)::UBIGINT AS sig
         |  FROM votes GROUP BY doc_id)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 3
         |ORDER BY 1, 2""".stripMargin,

    // round-trip checksum: the SAME aggregate the engine computes after
    // its JSONL/CSV write+read cycle; hash equality proves losslessness
    "source_jsonl" -> roundtripChecksumSql,
    "source_csv" -> roundtripChecksumSql,
    "source_orc" -> roundtripChecksumSql,

    // WARC adds an id sum to the checksum: header parsing (record id out
    // of the WARC-Record-ID header), not just payload transport, must
    // survive the write+split+parse cycle
    // Twin of source_html_strip: the IDENTICAL RE2-subset strip chain —
    // script/style wholesale, comments, tags -> space, the six entities
    // (&amp; LAST), whitespace collapse. Rule order is on the hash path.
    "source_html_strip" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || doc_id ||
        |  '</title><style>p { color: red; }</style></head><body><h1>' ||
        |  source || '</h1><!-- id --><p>' || text ||
        |  ' &amp; more &lt;tags&gt;</p><script>var x = 1 < 2;</script></body></html>'
        |  AS html FROM documents)
        |SELECT doc_id, trim(regexp_replace(
        |  replace(replace(replace(replace(replace(replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |      '(?is)<script[^>]*>.*?</script>', '', 'g'),
        |      '(?is)<style[^>]*>.*?</style>', '', 'g'),
        |      '(?s)<!--.*?-->', '', 'g'),
        |      '<[^>]+>', ' ', 'g'),
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |    '&nbsp;', ' '), '&amp;', '&'),
        |  '\s+', ' ', 'g')) AS text
        |FROM h ORDER BY doc_id""".stripMargin,

    "source_warc" -> warcChecksumSql,
    // identical contract through gzipped segments — codec transparency
    // must not change a single byte of any payload
    "source_warc_gz" -> warcChecksumSql,

    // same salted-md5 split arithmetic straight off the source table
    "pipeline_split" ->
      """WITH s AS (SELECT *,
        |    ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 8))::BIGINT % 100 AS h
        |  FROM documents)
        |SELECT source, lang,
        |  CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'validation'
        |       ELSE 'test' END AS split,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // Twin of corpus_audit: every check restated as an independent
    // scalar count (count(*) FILTER per the HUGEINT gotcha; anti-joins
    // via NOT EXISTS). check_name, not "check" — CHECK is reserved.
    "corpus_audit" ->
      """WITH checks(check_name, n) AS (
        |  SELECT 'docs_total', count(*) FROM documents
        |  UNION ALL SELECT 'duplicate_doc_ids',
        |    count(*) - count(DISTINCT doc_id) FROM documents
        |  UNION ALL SELECT 'empty_text',
        |    count(*) FILTER (WHERE len(trim(text)) = 0) FROM documents
        |  UNION ALL SELECT 'embeddings_total', count(*) FROM embeddings
        |  UNION ALL SELECT 'dim_mismatch',
        |    count(*) FILTER (WHERE len(embedding) <> 64) FROM embeddings
        |  UNION ALL SELECT 'zero_norm_vectors',
        |    count(*) FILTER (WHERE len(list_filter(embedding, x -> x <> 0)) = 0)
        |    FROM embeddings
        |  UNION ALL SELECT 'nan_vectors',
        |    count(*) FILTER (WHERE len(list_filter(embedding, x -> isnan(x))) > 0)
        |    FROM embeddings
        |  UNION ALL SELECT 'docs_without_embedding', count(*) FROM documents d
        |    WHERE NOT EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)
        |  UNION ALL SELECT 'embeddings_without_doc', count(*) FROM embeddings e
        |    WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id))
        |SELECT check_name, CAST(n AS BIGINT) AS n
        |FROM checks ORDER BY check_name""".stripMargin,

    // Twin of corpus_datasheet; quantile_cont mirrors Spark's exact
    // `percentile` (both sort and linearly interpolate at the midpoint)
    "corpus_datasheet" ->
      """WITH b AS (SELECT doc_id, lang, source,
        |    len(string_split_regex(trim(lower(text)), '\s+'))::BIGINT AS ntok,
        |    length(text)::BIGINT AS nch, md5(text) AS h
        |  FROM documents),
        |w AS (SELECT b.*, count(*) OVER (PARTITION BY h) > 1 AS dup FROM b)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  CAST(sum(nch) AS BIGINT) AS n_chars,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  quantile_cont(ntok, 0.5)::DOUBLE AS median_tokens,
        |  max(ntok) AS max_tokens,
        |  CAST(count(*) FILTER (WHERE dup) AS BIGINT) AS n_dup_docs,
        |  floor(count(*) FILTER (WHERE dup)::DOUBLE / count(*) * 1e6 + 0.5) / 1e6 AS dup_ratio
        |FROM w""".stripMargin,

    // Composed twin of pipeline_training_data: the clean-decision chain,
    // the prefixed substring-duplication and classifier fragments, the
    // mix-sample rate arithmetic RE-DERIVED over the survivor set, and
    // the greedy packing window — each fragment identical to its
    // stand-alone oracle, so a hash match proves the COMPOSITION (gate
    // interplay, survivor-set stats, per-source packing), not just the
    // parts.
    "pipeline_training_data" -> {
      val m = graft.text.QualityClassifier.load()
      val wl = m.weights.mkString("[", ",", "]")
      s"""WITH $cleanDecisionCtes,
         |k1 AS (SELECT doc_id FROM dec WHERE decision = 'kept'),
         |ss_tk AS (SELECT doc_id, $toks AS tl FROM documents),
         |ss_base AS (SELECT doc_id, len(tl)::BIGINT AS n_tokens, tl
         |  FROM ss_tk WHERE len(tl) >= 8),
         |ss_sp AS (SELECT doc_id, n_tokens, i AS start,
         |    md5(array_to_string(tl[i+1:i+8], ' ')) AS h
         |  FROM ss_base, unnest(range(0, len(tl) - 8 + 1)) AS u(i)),
         |ss_dup AS (SELECT h FROM ss_sp GROUP BY h HAVING count(*) > 1),
         |ss_ds AS (SELECT ss_sp.* FROM ss_sp JOIN ss_dup USING (h)),
         |ss_m AS (SELECT doc_id, n_tokens, start,
         |    max(start + 7) OVER (PARTITION BY doc_id ORDER BY start
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |  FROM ss_ds),
         |ss_isl AS (SELECT doc_id, n_tokens, start,
         |    sum(CASE WHEN prev_end IS NULL OR start > prev_end THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY start) AS island
         |  FROM ss_m),
         |ss_iv AS (SELECT doc_id, n_tokens, island,
         |    min(start) AS i_start, max(start) + 7 AS i_end
         |  FROM ss_isl GROUP BY 1, 2, 3),
         |heavy AS (SELECT doc_id FROM ss_iv GROUP BY doc_id, n_tokens
         |  HAVING floor(sum(i_end - i_start + 1)::DOUBLE / n_tokens * 1e6 + 0.5) / 1e6 > 0.5),
         |qc_f AS (SELECT doc_id, unnest(tl || list_transform(range(1, greatest(len(tl), 1)),
         |    i -> tl[i] || ' ' || tl[i+1])) AS feat FROM ss_tk),
         |qc_b AS (SELECT doc_id,
         |    (('0x' || substr(md5(feat), 1, 6))::BIGINT % 256)::INT AS bkt FROM qc_f),
         |qc_s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |    CAST(sum(($wl)[bkt + 1]) AS BIGINT) + (${m.bias}) AS logit
         |  FROM qc_b GROUP BY 1),
         |qc_k AS (SELECT doc_id FROM qc_s
         |  WHERE floor(logit::DOUBLE / n_feats / 1048576 * 1e6 + 0.5) / 1e6 > 0.0),
         |surv AS (SELECT d.doc_id, d.source,
         |    len(string_split_regex(trim(lower(d.text)), '\\s+'))::BIGINT AS ntok
         |  FROM documents d
         |  JOIN k1 USING (doc_id) JOIN qc_k USING (doc_id)
         |  WHERE d.doc_id NOT IN (SELECT doc_id FROM heavy)),
         |mx_st AS (SELECT source, CAST(sum(ntok) AS BIGINT) AS tv,
         |    1 + (substr(source, 4)::INT % 3) AS w FROM surv GROUP BY 1),
         |mx_ws AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM mx_st),
         |mx_sh AS (SELECT source, tv, w::DOUBLE / wsum AS share FROM mx_st, mx_ws),
         |mx_bd AS (SELECT min(tv::DOUBLE / share) AS budget FROM mx_sh),
         |mx_rt AS (SELECT source, tv, share * budget / tv AS rate FROM mx_sh, mx_bd),
         |samp AS (SELECT surv.source, surv.doc_id, surv.ntok
         |  FROM surv JOIN mx_rt USING (source)
         |  WHERE ('0x' || substr(md5(surv.doc_id::VARCHAR), 1, 6))::BIGINT::DOUBLE / 16777216.0 < mx_rt.rate),
         |pk AS (SELECT source, doc_id, ntok,
         |    coalesce(sum(ntok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM samp)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
         |  CAST(count(DISTINCT cum // 512) AS BIGINT) AS n_sequences,
         |  floor(sum(ntok)::DOUBLE / (count(DISTINCT cum // 512) * 512) * 1e6 + 0.5) / 1e6 AS fill_ratio
         |FROM pk GROUP BY source ORDER BY source""".stripMargin
    },

    // Twin of pipeline_mix_sample: token stats, the 1+(src# mod 3) weight
    // rule, budget = min(t/share), rate = share*budget/t, and the
    // id-hash-fraction keep test all recompute here with the identical
    // IEEE expression order; integer token/weight sums keep every input
    // to the double arithmetic bit-equal across engines.
    "pipeline_mix_sample" ->
      """WITH tk AS (SELECT doc_id, source,
        |    len(string_split_regex(trim(lower(text)), '\s+'))::BIGINT AS ntok
        |  FROM documents),
        |st AS (SELECT source, CAST(sum(ntok) AS BIGINT) AS t,
        |    1 + (substr(source, 4)::INT % 3) AS w
        |  FROM tk GROUP BY 1),
        |ws AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM st),
        |sh AS (SELECT source, t, w::DOUBLE / wsum AS share FROM st, ws),
        |bd AS (SELECT min(t::DOUBLE / share) AS budget FROM sh),
        |rt AS (SELECT source, t, share * budget / t AS rate FROM sh, bd),
        |kept AS (SELECT tk.source, tk.ntok, rt.rate FROM tk JOIN rt USING (source)
        |  WHERE ('0x' || substr(md5(tk.doc_id::VARCHAR), 1, 6))::BIGINT::DOUBLE / 16777216.0 < rt.rate),
        |ag AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs_kept,
        |    CAST(sum(ntok) AS BIGINT) AS n_tokens_kept,
        |    floor(max(rate) * 1e6 + 0.5) / 1e6 AS sample_rate
        |  FROM kept GROUP BY 1),
        |tt AS (SELECT CAST(sum(n_tokens_kept) AS BIGINT) AS tot FROM ag)
        |SELECT source, n_docs_kept, n_tokens_kept, sample_rate,
        |  floor(n_tokens_kept::DOUBLE / tot * 1e6 + 0.5) / 1e6 AS achieved_share
        |FROM ag, tt ORDER BY source""".stripMargin,

    // Twin of pack_curriculum: the same rounded-quality NTILE phases,
    // md5 within-phase shuffle, and global emit rank — SQL NTILE
    // semantics are standard, so the two engines agree row for row.
    "pack_curriculum" ->
      s"""WITH q AS (SELECT doc_id,
         |    floor(least(1.0,
         |      0.4 * least(len($toks)::DOUBLE / 50.0, 1.0)
         |      + 0.3 * (1.0 - (length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))::DOUBLE / length(text))
         |      + 0.3 * (len(list_distinct($toks))::DOUBLE / len($toks))) * 1e6 + 0.5) / 1e6 AS quality
         |  FROM documents),
         |p AS (SELECT doc_id, quality,
         |    CAST(ntile(4) OVER (ORDER BY quality, doc_id) AS BIGINT) AS phase
         |  FROM q)
         |SELECT doc_id, quality, phase,
         |  CAST(row_number() OVER (ORDER BY phase, md5(doc_id::VARCHAR), doc_id) AS BIGINT) AS emit_rank
         |FROM p ORDER BY emit_rank""".stripMargin,

    // Twin of mix_upsample: the 1 + (src# mod 5)·0.45 epoch rule, the
    // md5-fraction bernoulli for the fractional copy, and the emitted
    // multiset's per-source aggregates — copy counts under the hash.
    "mix_upsample" ->
      s"""WITH tk AS (SELECT doc_id, source, len($toks)::BIGINT AS ntok
         |  FROM documents),
         |e AS (SELECT doc_id, source, ntok,
         |    1.0 + (substr(source, 4)::INT % 5) * 0.45 AS ep,
         |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::BIGINT::DOUBLE / 16777216.0 AS frac
         |  FROM tk),
         |c AS (SELECT source, doc_id, ntok,
         |    CAST(floor(ep) + CASE WHEN frac < ep - floor(ep) THEN 1 ELSE 0 END AS BIGINT) AS n_copies
         |  FROM e)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_copies) AS BIGINT) AS n_emitted,
         |  CAST(sum(ntok * n_copies) AS BIGINT) AS tokens_emitted,
         |  floor(sum(n_copies)::DOUBLE / count(*) * 1e6 + 0.5) / 1e6 AS achieved_epochs
         |FROM c GROUP BY source ORDER BY source""".stripMargin,

    // Twin of store_compact: the post-rewrite checksum equals the source
    // table's, and the file counts are deterministic (64 scattered
    // appends -> 1 byte-budgeted file at gate scale).
    "store_compact" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  min(md5(text)) AS md5_lo, max(md5(text)) AS md5_hi,
        |  CAST(64 AS BIGINT) AS n_files_before, CAST(1 AS BIGINT) AS n_files_after
        |FROM documents""".stripMargin,

    // Manifest twin of export_shards, straight off the source table: the
    // deterministic shard arithmetic (md5-hex-prefix of the id, mod 8)
    // and checksum aggregates reproduce here, so equality proves the
    // engine's shuffle+partitioned-write+read-back cycle lost nothing
    // and assigned every doc to the arithmetic shard.
    "export_shards" ->
      """SELECT (('0x' || substr(md5(doc_id::VARCHAR), 1, 6))::BIGINT % 8)::INT AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  bit_xor(('0x' || substr(md5(text), 1, 12))::BIGINT) AS content_xor,
        |  min(md5(text)) AS md5_lo, max(md5(text)) AS md5_hi
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_bpe_merges" ->
      s"""WITH tk AS (SELECT $toks AS t FROM documents),
         |p AS (SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
         |    i -> t[i] || ' ' || t[i+1])) AS pair FROM tk)
         |SELECT pair, CAST(count(*) AS BIGINT) AS n
         |FROM p GROUP BY 1 ORDER BY n DESC, pair LIMIT 30""".stripMargin,

    // PMI collocations: identical cast order and floor rounding as the
    // Spark side (double ratio inside ln; totals as scalars). The 50k
    // vocab cap is not binding at oracle scale (vocab << 50k), so the
    // uncapped oracle matches the capped engine by construction.
    "text_pmi" ->
      s"""WITH tk AS (SELECT $toks AS t FROM documents),
         |u AS (SELECT w, CAST(count(*) AS BIGINT) AS cw
         |      FROM (SELECT unnest(t) AS w FROM tk) GROUP BY 1),
         |tot AS (SELECT CAST(sum(cw) AS BIGINT) AS n_tok FROM u),
         |p AS (SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
         |    i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS pr FROM tk),
         |pw AS (SELECT pr.w1 AS w1, pr.w2 AS w2 FROM p),
         |bt AS (SELECT CAST(count(*) AS BIGINT) AS n_big FROM pw),
         |b AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM pw
         |      GROUP BY 1, 2 HAVING count(*) >= 10)
         |SELECT b.w1 || ' ' || b.w2 AS pair, b.n,
         |  floor(ln(CAST(b.n AS DOUBLE) * tot.n_tok * tot.n_tok
         |    / (CAST(bt.n_big AS DOUBLE) * u1.cw * u2.cw)) * 1e6 + 0.5) / 1e6 AS pmi
         |FROM b
         |JOIN u u1 ON u1.w = b.w1
         |JOIN u u2 ON u2.w = b.w2
         |CROSS JOIN tot CROSS JOIN bt
         |ORDER BY pmi DESC, b.w1, b.w2 LIMIT 30""".stripMargin,

    // Twin of sparse_topk AND sparse_store (the stored tier's contract
    // is exact identity with the inline form): the tf·idf encoder in
    // exact micro-units — floor-form quantize to BIGINT — then the dot
    // product as pure integer arithmetic (order-free in both engines),
    // score surfaced via one deterministic BIGINT→DOUBLE conversion.
    // The query literal's micro-unit weights are the same floor(w·1e6
    // + 0.5) the engine's quantizer computes.
    "sparse_topk" -> sparseDotOracle,
    "sparse_store" -> sparseDotOracle,
    "sparse_deleted" -> sparseDeletedOracle,

    // Twin of sparse_impact — the impact cutoff restated as the same
    // pure predicate on the encoded weights: the approximation is
    // deterministic, so it sits UNDER the hash rather than behind a
    // recall bound.
    "sparse_impact" ->
      s"""WITH ${sparseBodyWhere("w.w_mu >= 400000")}
         |SELECT doc_id, score FROM spsc
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // Twin of sparse_filtered — the sparse body's ranking joined to the
    // metadata predicate; frozen weights mean the filter moves no score.
    "sparse_filtered" ->
      s"""WITH $sparseBody
         |SELECT s.doc_id, s.score
         |FROM spsc s JOIN documents d USING (doc_id)
         |WHERE d.lang IN ('en', 'de')
         |ORDER BY s.score DESC, s.doc_id LIMIT 10""".stripMargin,

    // Twin of sparse_batch — the query table as a VALUES literal,
    // per-(q_id, doc) integer sums, per-query rank windows.
    "sparse_batch" ->
      s"""WITH $sparseBody,
         |bq AS (SELECT * FROM (VALUES
         |    ('qa', 'vector', CAST(1000000 AS BIGINT)),
         |    ('qa', 'query', CAST(800000 AS BIGINT)),
         |    ('qa', 'join', CAST(500000 AS BIGINT)),
         |    ('qa', 'spark', CAST(250000 AS BIGINT)),
         |    ('qb', 'filter', CAST(1000000 AS BIGINT)),
         |    ('qb', 'scan', CAST(700000 AS BIGINT)),
         |    ('qb', 'merge', CAST(400000 AS BIGINT)))
         |  AS t(q_id, term, q_mu)),
         |bsc AS (SELECT bq.q_id, w.doc_id,
         |    CAST(CAST(sum(w.w_mu * bq.q_mu) AS BIGINT) AS DOUBLE) / 1e12 AS score
         |  FROM w JOIN bq USING (term) GROUP BY 1, 2),
         |br AS (SELECT q_id, doc_id, score,
         |    CAST(row_number() OVER (PARTITION BY q_id
         |      ORDER BY score DESC, doc_id) AS BIGINT) AS rank
         |  FROM bsc)
         |SELECT q_id, doc_id, score, rank FROM br
         |WHERE rank <= 8 ORDER BY q_id, rank""".stripMargin,

    // Twin of sparse_incremental AND streaming_sparse_ingest (stream
    // and batch maintenance must be indistinguishable in the answer) —
    // the FROZEN-encoder semantics stated relationally: df and N come
    // from the STANDING slice only (doc_id % 10 <> 7, the model the
    // build fitted), the arrival slice's term frequencies inner-join
    // that vocabulary (OOV terms drop — the fixed-vocab contract), and
    // every posting scores with the frozen stats.
    "sparse_incremental" -> sparseFrozenOracle,
    "streaming_sparse_ingest" -> sparseFrozenOracle,
    // Twin of sparse_compact: build + append + delete + compact must be
    // answer-equivalent to the frozen-encoder view minus tombstones.
    "sparse_compact" -> sparseFrozenOracleWhere("WHERE doc_id % 7 <> 0"),


    // TF-IDF top terms: df derives from the (doc, term) aggregate, scores
    // floor-round before ranking (both engines rank identical rounded
    // values; term breaks ties). The engine's 50k df cap is not binding
    // at oracle scale, so the uncapped oracle matches by construction.
    "text_tfidf" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toks) AS term FROM documents),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |       FROM tk GROUP BY 1, 2),
         |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |       FROM documents),
         |sc AS (SELECT tf.doc_id, tf.term, tf.tf,
         |    floor(tf.tf * ln(CAST(nd.n_docs AS DOUBLE) / df.df) * 1e6 + 0.5) / 1e6 AS score
         |  FROM tf JOIN df USING (term) CROSS JOIN nd),
         |r AS (SELECT *, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY score DESC, term) AS rank FROM sc)
         |SELECT doc_id, term, tf, score, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // Twin of sample_domain_cap: the proven quality form, then a
    // per-source row_number with the same (quality DESC, doc_id) order.
    "sample_domain_cap" ->
      s"""WITH q AS (SELECT doc_id, source,
         |    floor(least(1.0,
         |      0.4 * least(len($toks)::DOUBLE / 50.0, 1.0)
         |      + 0.3 * (1.0 - (length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))::DOUBLE / length(text))
         |      + 0.3 * (len(list_distinct($toks))::DOUBLE / len($toks))) * 1e6 + 0.5) / 1e6 AS quality
         |  FROM documents),
         |r AS (SELECT doc_id, source, quality,
         |    row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rank
         |  FROM q)
         |SELECT doc_id, source, quality, rank FROM r WHERE rank <= 20
         |ORDER BY source, rank""".stripMargin,

    "text_stats" ->
      s"""SELECT doc_id, length(text)::INT AS n_chars_measured,
         |  len($toks)::INT AS n_tokens,
         |  round(list_sum(list_transform($toks, t -> length(t)))::DOUBLE / len($toks), 6) AS avg_token_len,
         |  round((length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))::DOUBLE / length(text), 6) AS punct_ratio,
         |  round(len(list_filter($toks, t -> list_contains($enStop, t)))::DOUBLE / len($toks), 6) AS stopword_ratio,
         |  round(len(list_distinct($toks))::DOUBLE / len($toks), 6) AS uniq_token_ratio,
         |  floor(least(1.0,
         |    0.4 * least(len($toks)::DOUBLE / 50.0, 1.0)
         |    + 0.3 * (1.0 - (length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))::DOUBLE / length(text))
         |    + 0.3 * (len(list_distinct($toks))::DOUBLE / len($toks))) * 1e6 + 0.5) / 1e6 AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,

    "lang_id" ->
      s"""WITH sc AS (SELECT doc_id, lang,
         |  len(list_filter($toks, t -> list_contains($enStop, t))) AS s_en,
         |  len(list_filter($toks, t -> list_contains(['el','la','de','que','y','los'], t))) AS s_es,
         |  len(list_filter($toks, t -> list_contains(['le','la','les','de','et','un'], t))) AS s_fr,
         |  len(list_filter($toks, t -> list_contains(['der','die','das','und','ist','ein'], t))) AS s_de,
         |  len(list_filter($toks, t -> list_contains(['的','了','是','我','不'], t))) AS s_zh
         |FROM documents)
         |SELECT doc_id, lang AS lang_actual,
         |  CASE WHEN greatest(s_en,s_es,s_fr,s_de,s_zh) = 0 THEN 'und'
         |       WHEN s_en = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'en'
         |       WHEN s_es = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'es'
         |       WHEN s_fr = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'fr'
         |       WHEN s_de = greatest(s_en,s_es,s_fr,s_de,s_zh) THEN 'de'
         |       ELSE 'zh' END AS lang_pred
         |FROM sc ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |g AS (SELECT doc_id,
         |  list_filter(list_transform(range(0, greatest(len(tk)-3,0)+1),
         |    i -> CASE WHEN len(tk[(i+1)::INT:(i+3)::INT]) = 3
         |              THEN array_to_string(tk[(i+1)::INT:(i+3)::INT], ' ') END),
         |    x -> x IS NOT NULL) AS g3,
         |  list_filter(list_transform(range(0, greatest(len(tk)-2,0)+1),
         |    i -> CASE WHEN len(tk[(i+1)::INT:(i+2)::INT]) = 2
         |              THEN array_to_string(tk[(i+1)::INT:(i+2)::INT], ' ') END),
         |    x -> x IS NOT NULL) AS g2
         |FROM t)
         |SELECT doc_id,
         |  CASE WHEN len(g3) = 0 THEN 0.0
         |       ELSE round(1.0 - len(list_distinct(g3))::DOUBLE / len(g3), 6) END AS rep3,
         |  CASE WHEN len(g2) = 0 THEN 0.0
         |       ELSE round(1.0 - len(list_distinct(g2))::DOUBLE / len(g2), 6) END AS rep2
         |FROM g ORDER BY doc_id""".stripMargin,

    // forward as-of (ON c.ts <= p.ts); same equal-ts dedup as q11
    "q38_asof_forward" ->
      """SELECT c.user_id, c.event_id, p.event_id AS matched_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF JOIN (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'purchase') WHERE rn = 1) p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY 1,2""".stripMargin,

    "q39_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS t_view
        |  FROM events GROUP BY 1),
        |c AS (SELECT e.user_id, any_value(v.t_view) AS t_view,
        |    min(e.ts) FILTER (WHERE e.event_type = 'click' AND e.ts >= v.t_view) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id GROUP BY 1),
        |p AS (SELECT e.user_id, any_value(c.t_view) AS t_view, any_value(c.t_click) AS t_click,
        |    min(e.ts) FILTER (WHERE e.event_type = 'purchase' AND e.ts >= c.t_click) AS t_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id GROUP BY 1)
        |SELECT count(*) AS n_users,
        |  count(t_view) AS n_viewed,
        |  count(t_click) AS n_clicked_after_view,
        |  count(t_purchase) AS n_purchased_after_click
        |FROM p""".stripMargin,

    // same equal-ts dedup as q11 (engine tiebreak = max event_id)
    "q17_asof_tolerance" ->
      """SELECT p.user_id, p.event_id, c.event_id AS matched_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'click') WHERE rn = 1) c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |WHERE p.ts - c.ts <= INTERVAL 3600 SECOND
        |ORDER BY 1,2""".stripMargin,

    "doc_fingerprint" ->
      s"""SELECT doc_id,
         |  md5(array_to_string(list_sort(list_distinct($toks)), ' ')) AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,

    "doc_winnow_sql" ->
      """WITH g AS (SELECT doc_id,
        |    list_transform(range(1, greatest(length(text)-7, 1)+1),
        |      i -> md5(substr(text, i::INT, 8))) AS kg
        |  FROM documents),
        |m AS (SELECT doc_id,
        |    list_distinct(list_transform(range(0, greatest(len(kg)-4, 0)+1),
        |      i -> list_aggregate(kg[(i+1)::INT:(i+4)::INT], 'min'))) AS fps
        |  FROM g)
        |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
        |  list_aggregate(fps, 'min') AS min_fp,
        |  list_aggregate(fps, 'max') AS max_fp
        |FROM m ORDER BY doc_id""".stripMargin,

    "quality_filter" ->
      s"""WITH t AS (SELECT lang,
         |  len($toks) AS n_tokens,
         |  floor(least(1.0,
         |    0.4 * least(len($toks)::DOUBLE / 50.0, 1.0)
         |    + 0.3 * (1.0 - (length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))::DOUBLE / length(text))
         |    + 0.3 * (len(list_distinct($toks))::DOUBLE / len($toks))) * 1e6 + 0.5) / 1e6 AS quality
         |FROM documents)
         |SELECT lang, count(*) AS n_docs FROM t
         |WHERE quality >= 0.5 AND n_tokens >= 20
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "pipeline_clean_corpus" ->
      s"""WITH $cleanDecisionCtes
         |SELECT doc_id, quality, avg_logp, decision, decision = 'kept' AS keep
         |FROM dec ORDER BY doc_id""".stripMargin,

    "pipeline_clean_mix" ->
      s"""WITH $cleanDecisionCtes,
         |kept AS (SELECT doc_id FROM dec WHERE decision = 'kept'),
         |kd AS (SELECT d.source, d.lang,
         |    CAST(len(string_split_regex(trim(lower(d.text)), '\\s+')) AS BIGINT) AS ntok
         |  FROM documents d JOIN kept USING (doc_id)),
         |cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(ntok) AS BIGINT) AS n_tokens
         |  FROM kd GROUP BY 1, 2),
         |tt AS (SELECT CAST(sum(ntok) AS BIGINT) AS total FROM kd)
         |SELECT source, lang, n_docs, n_tokens,
         |  floor(CAST(n_tokens AS DOUBLE) / total * 1e6 + 0.5) / 1e6 AS token_share
         |FROM cells, tt ORDER BY source, lang""".stripMargin,

    "ingest_report" ->
      """SELECT source,
        |  count(*) AS n_docs,
        |  count(*) FILTER (WHERE length(trim(text)) > 0) AS n_success,
        |  count(*) FILTER (WHERE length(trim(text)) = 0) AS n_failed
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  sha256(text) AS content_sha
        |FROM documents ORDER BY doc_id""".stripMargin,

    // benchmark decontamination: word-3-gram collision of corpus docs
    // against the doc_id%97=0 eval subset; token/gram construction is
    // the string_split_regex + list-slice twin of Dedup.decontaminate
    "decontaminate" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |g AS (SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(t)-2,1)+1),
        |    i -> array_to_string(t[i:i+2], ' '))) AS grams FROM tk),
        |b AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
        |du AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
        |  FROM g WHERE doc_id % 97 <> 0)
        |SELECT du.doc_id, CAST(any_value(du.n_grams) AS BIGINT) AS n_grams,
        |  CAST(count(b.gram) AS BIGINT) AS n_overlap,
        |  count(b.gram) > 0 AS contaminated
        |FROM du LEFT JOIN b ON du.gram = b.gram
        |GROUP BY du.doc_id ORDER BY du.doc_id""".stripMargin,

    // Twin of decontaminate_bloom — and deliberately the SAME SQL as
    // decontaminate's: the Bloom gate + exact confirm join must be
    // bit-invisible in the answer; only the shuffle shape changes.
    "decontaminate_bloom" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |g AS (SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(t)-2,1)+1),
        |    i -> array_to_string(t[i:i+2], ' '))) AS grams FROM tk),
        |b AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
        |du AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
        |  FROM g WHERE doc_id % 97 <> 0)
        |SELECT du.doc_id, CAST(any_value(du.n_grams) AS BIGINT) AS n_grams,
        |  CAST(count(b.gram) AS BIGINT) AS n_overlap,
        |  count(b.gram) > 0 AS contaminated
        |FROM du LEFT JOIN b ON du.gram = b.gram
        |GROUP BY du.doc_id ORDER BY du.doc_id""".stripMargin,

    // Twin of pack_concat_chunks: the fixed-length concat-and-chunk
    // layout — a doc at stream offset off with n tokens contributes to
    // sequences off//512 .. (off+n-1)//512, share = window overlap. The
    // cum-sum is cast to BIGINT up front (DuckDB windowed sum yields
    // HUGEINT, which range() rejects).
    "pack_concat_chunks" -> packConcatChunksSql,

    // greedy per-shard sequence packing: seq of a doc = tokens-before div
    // budget; token count parity = string_split_regex twin of tokens()
    "pack_sequences" -> packSequencesSql,

    // Twin of pack_advisor — both packing twins as subqueries, each
    // folded to (n_seqs, totals, padding, overflow); the ppm decision
    // (greedy recommended iff its pad+overflow <= capacity·0.1, concat
    // otherwise) and the floor-rounded waste ratios are integer-exact.
    "pack_advisor" ->
      s"""WITH ga AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(seq_tokens) AS BIGINT) AS t,
         |    CAST(sum(greatest(0, 512 - seq_tokens)) AS BIGINT) AS p,
         |    CAST(sum(greatest(0, seq_tokens - 512)) AS BIGINT) AS o
         |  FROM ($packSequencesSql)),
         |ca AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(seq_tokens) AS BIGINT) AS t,
         |    CAST(sum(greatest(0, 512 - seq_tokens)) AS BIGINT) AS p,
         |    CAST(sum(greatest(0, seq_tokens - 512)) AS BIGINT) AS o
         |  FROM ($packConcatChunksSql)),
         |aff AS (SELECT n > 0 AND (p + o) * 1000000 <= n * 512 * 100000 AS ok FROM ga)
         |SELECT 'concat_chunks' AS strategy, n AS n_seqs, t AS total_tokens,
         |  p AS pad_tokens, o AS overflow_tokens,
         |  CASE WHEN n = 0 THEN 0.0
         |    ELSE floor((p + o) / CAST(n * 512 AS DOUBLE) * 1e6 + 0.5) / 1e6 END AS waste_ratio,
         |  NOT (SELECT ok FROM aff) AS recommended
         |FROM ca
         |UNION ALL
         |SELECT 'greedy_docs', n, t, p, o,
         |  CASE WHEN n = 0 THEN 0.0
         |    ELSE floor((p + o) / CAST(n * 512 AS DOUBLE) * 1e6 + 0.5) / 1e6 END,
         |  (SELECT ok FROM aff)
         |FROM ga
         |ORDER BY strategy""".stripMargin,

    // Spark encodes a 16-bit PCM WAV whose samples are closed-form in
    // doc_id and decodes it with javax.sound.sampled; the oracle
    // recomputes the decoded sample sums codec-free (same scheme as
    // multimodal_decode below)
    "multimodal_audio" ->
      """WITH dims AS (SELECT doc_id, CAST(64 + doc_id % 192 AS BIGINT) AS n
        |  FROM documents),
        |sm AS (SELECT doc_id, n, unnest(range(n)) AS i FROM dims)
        |SELECT doc_id, CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
        |  CAST(any_value(n) AS BIGINT) AS n_samples,
        |  CAST(sum((i*37 + doc_id*13) % 4096 - 2048) AS BIGINT) AS sample_sum
        |FROM sm GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Spark encodes a PNG whose dims/pixels are closed-form in doc_id and
    // decodes it with javax.imageio; the oracle recomputes the decoded
    // channel sums WITHOUT a codec, so the real encode->decode round-trip
    // is bit-checked. (This build lacks lateral table functions, hence the
    // staged unnest(range(...)) pixel grid.)
    "multimodal_decode" ->
      """WITH dims AS (
        |  SELECT doc_id, CAST(8 + doc_id % 24 AS INT) AS width,
        |         CAST(8 + (doc_id*7) % 24 AS INT) AS height
        |  FROM documents),
        |px1 AS (SELECT doc_id, width, height, unnest(range(width)) AS x FROM dims),
        |px AS (SELECT doc_id, width, height, x, unnest(range(height)) AS y FROM px1)
        |SELECT doc_id, width, height,
        |  CAST(sum((x*31 + y*17 + doc_id) % 256) AS BIGINT) AS red_sum,
        |  CAST(sum((x*13 + y*29 + doc_id*3) % 256) AS BIGINT) AS green_sum,
        |  CAST(sum((x*7 + y*11 + doc_id*5) % 256) AS BIGINT) AS blue_sum
        |FROM px GROUP BY 1,2,3 ORDER BY doc_id""".stripMargin,

    "streaming_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS n_events, round(sum(value),4) AS sum_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q18_lead_lag" ->
      """WITH w AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_date,
        |    lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day', prev_date, o_orderdate) AS BIGINT) AS days_since_prev,
        |  CAST(round(CAST(o_totalprice AS DECIMAL(12,4)) - CAST(coalesce(next_price, 0.0) AS DECIMAL(12,4)), 2) AS DOUBLE) AS price_vs_next
        |FROM w WHERE prev_date IS NOT NULL ORDER BY 1,2""".stripMargin,

    "q19_setops" ->
      """WITH a AS (SELECT o_custkey FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
        |b AS (SELECT o_custkey FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT
        |  (SELECT count(*) FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)) AS n_both,
        |  (SELECT count(*) FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)) AS n_only_1995,
        |  (SELECT count(*) FROM (SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a)) AS n_only_1996""".stripMargin,

    "q20_json_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  count(*) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q21_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q22_minmax_by" ->
      """SELECT n_name,
        |  arg_max(c_name, CAST(round(c_acctbal*100) AS BIGINT)*10000000 + c_custkey) AS richest,
        |  arg_min(c_name, CAST(round(c_acctbal*100) AS BIGINT)*10000000 + c_custkey) AS poorest,
        |  round(max(c_acctbal), 2) AS max_bal,
        |  round(min(c_acctbal), 2) AS min_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q23_array_agg" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(l_linenumber)), ',') AS linenumbers,
        |  count(*) AS n_lines
        |FROM lineitem GROUP BY 1 HAVING count(*) >= 5 ORDER BY 1""".stripMargin,

    "q24_gapfill" ->
      """WITH b AS (SELECT min(date_trunc('hour', ts)) AS h0, max(date_trunc('hour', ts)) AS h1 FROM events),
        |hrs AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b),
        |t AS (SELECT DISTINCT event_type FROM events),
        |c AS (SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
        |  FROM events GROUP BY 1,2)
        |SELECT strftime(h.hour, '%Y-%m-%d %H:%M:%S') AS hour, t.event_type,
        |  coalesce(c.n, 0) AS n_events
        |FROM hrs h CROSS JOIN t
        |LEFT JOIN c ON c.hour = h.hour AND c.event_type = t.event_type
        |ORDER BY 1,2""".stripMargin,

    "q25_stats_agg" ->
      """SELECT l_returnflag,
        |  floor(corr(l_quantity, l_extendedprice) * 1e6 + 0.5) / 1e6 AS corr_qty_price,
        |  floor(covar_samp(l_quantity, l_extendedprice) * 1e2 + 0.5) / 1e2 AS covar_qty_price,
        |  floor(stddev_samp(l_extendedprice) * 1e2 + 0.5) / 1e2 AS std_price,
        |  floor(var_samp(l_quantity) * 1e2 + 0.5) / 1e2 AS var_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q26_ntile" ->
      """WITH q AS (SELECT c_mktsegment, c_acctbal,
        |    CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
        |  FROM customer)
        |SELECT c_mktsegment, quartile, count(*) AS n,
        |  round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal
        |FROM q GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q27_levenshtein" ->
      """WITH w AS (SELECT source, doc_id, text,
        |    lead(text) OVER (PARTITION BY source ORDER BY doc_id) AS next_text
        |  FROM documents)
        |SELECT source, doc_id,
        |  CAST(levenshtein(substr(text, 1, 40), substr(next_text, 1, 40)) AS BIGINT) AS lev40
        |FROM w WHERE next_text IS NOT NULL ORDER BY 1,2""".stripMargin,

    "skew_salted_agg" ->
      """SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct_l_partkey
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // word pattern interpolated from the single shared constant
    // (graft.text.Bpe.WordPattern) — Scala "\\s" is the literal \s DuckDB
    // expects inside a standard single-quoted string
    // Twin of text_bpe_apply: a checked-in expected-encoding fixture at
    // the sf0.01 gate scale (the iterative trainer cannot be expressed in
    // a recursive CTE — aggregation over the recursive reference is not
    // SQL). The fixture is a REGRESSION pin generated from the encoder
    // (GenBpeApplyFixture, recorded provenance); independent correctness
    // evidence is BpeSpec's classic worked example + invariants and the
    // oracle-checked text_bpe_merges pair statistics. Any drift in
    // trainer tie-breaks, word splitting, or the encode loop
    // hash-mismatches here.
    // Twins of q12_distinct_sketch / q44_percentile_sketch — the last
    // two non-graph rows-only entries leave the list: the EXACT columns
    // recompute relationally (count DISTINCT; quantile_cont — the same
    // continuous p·(n-1) interpolation Spark's percentile performs, in
    // the shared floor-form rounding), the APPROX sketch columns pin
    // against the checked-in fixture (GenSketchFixture — HLL registers
    // merge by max and quantile summaries compact deterministically, so
    // fixed input reproduces exactly; generated at 8 AND 32 threads and
    // required equal before writing).
    "q12_distinct_sketch" ->
      """WITH fx AS (SELECT * FROM
        |  read_csv('/root/repo/src/main/resources/graft/sketch_fixture_sf001.csv',
        |           header=true))
        |SELECT l.l_returnflag,
        |  CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS n_exact,
        |  CAST(f.n_approx AS BIGINT) AS n_approx
        |FROM lineitem l JOIN fx f ON f.l_returnflag = l.l_returnflag
        |GROUP BY l.l_returnflag, f.n_approx
        |ORDER BY l.l_returnflag""".stripMargin,

    "q44_percentile_sketch" ->
      """WITH fx AS (SELECT * FROM
        |  read_csv('/root/repo/src/main/resources/graft/sketch_fixture_sf001.csv',
        |           header=true)),
        |ex AS (SELECT l_returnflag,
        |    floor(quantile_cont(l_extendedprice, 0.5) * 1e4 + 0.5) / 1e4 AS p50_exact,
        |    floor(quantile_cont(l_extendedprice, 0.99) * 1e4 + 0.5) / 1e4 AS p99_exact
        |  FROM lineitem GROUP BY 1)
        |SELECT e.l_returnflag, e.p50_exact,
        |  CAST(f.p50_approx AS DOUBLE) AS p50_approx,
        |  e.p99_exact, CAST(f.p99_approx AS DOUBLE) AS p99_approx
        |FROM ex e JOIN fx f USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,

    // Twin of ingest_embed_fixture: the checked-in HashEmbedder
    // expected-value fixture (GenHashEmbedFixture — the text_bpe_apply
    // regression-pin discipline; see the gate scaladoc for what drift
    // it catches and where the independent evidence lives).
    "ingest_embed_fixture" ->
      """SELECT CAST(text_id AS BIGINT) AS text_id,
        |  CAST(pos AS INT) AS pos,
        |  CAST(val_fp AS BIGINT) AS val_fp
        |FROM read_csv('/root/repo/src/main/resources/graft/hash_embed_fixture.csv',
        |              header=true)
        |ORDER BY text_id, pos""".stripMargin,

    "text_bpe_apply" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(n_words AS BIGINT) AS n_words,
        |  CAST(n_subwords AS BIGINT) AS n_subwords,
        |  CAST(n_chars_tok AS BIGINT) AS n_chars_tok,
        |  CAST(compression AS DOUBLE) AS compression
        |FROM read_csv('/root/repo/src/main/resources/graft/bpe_apply_sf001.csv',
        |              header=true)
        |ORDER BY doc_id""".stripMargin,

    "text_bpe_tokens" ->
      s"""WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '${graft.text.Bpe.WordPattern}') AS tk
        |  FROM documents)
        |SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_bpe_tokens,
        |  CAST(len(list_distinct(tk)) AS BIGINT) AS n_uniq_bpe,
        |  floor(coalesce(list_sum(list_transform(tk, x -> length(x))), 0)::DOUBLE
        |        / greatest(len(tk), 1) * 1e6 + 0.5) / 1e6 AS avg_bpe_len
        |FROM t ORDER BY doc_id""".stripMargin,

    // byte-exact frame compare without blob slicing (this DuckDB build has
    // none): both engines frame the BYTES — Spark slices the binary and
    // hexes each frame, the oracle hexes the blob and slices 2-char-per-
    // byte windows; md5 runs over the identical hex text
    "multimodal_frames" ->
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents
        |    WHERE octet_length(encode(text)) > 0),
        |f AS (SELECT doc_id, i, substring(hx, CAST(i*128+1 AS INT), 128) AS fh
        |  FROM h, unnest(range(0, CAST(ceil(length(hx)/128.0) AS INT))) AS t(i))
        |SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |  CAST(length(fh) // 2 AS BIGINT) AS frame_bytes,
        |  md5(fh) AS frame_md5
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    "multimodal_resize" ->
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        |  FROM documents WHERE octet_length(encode(text)) > 0),
        |r AS (SELECT doc_id, array_to_string(list_transform(
        |    range(0, (n-1)//4 + 1), i -> substr(hx, CAST(i*8+1 AS INT), 2)), '') AS res
        |  FROM h)
        |SELECT doc_id, CAST(length(res) // 2 AS BIGINT) AS resized_bytes,
        |  md5(res) AS resized_md5
        |FROM r ORDER BY doc_id""".stripMargin,

    "streaming_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        |ORDER BY 1,2,3""".stripMargin,

    "q29_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |       coalesce(l_linestatus, 'ALL') AS lstatus,
        |       CAST(grouping(l_returnflag) AS INT) AS g_rflag,
        |       CAST(grouping(l_linestatus) AS INT) AS g_lstatus,
        |       count(*) AS n,
        |       CAST(round(sum(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY rflag, lstatus, g_rflag, g_lstatus""".stripMargin,

    "ingest_incremental" ->
      """SELECT lang, count(*) AS n_added
        |FROM documents WHERE doc_id >= 250
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q36_promo_revenue" ->
      s"""SELECT p_type,
         |  CAST(round(sum($revenue),2) AS DOUBLE) AS revenue,
         |  CAST(round(sum(CASE WHEN p_brand = 'Brand#1' THEN $revenue
         |                      ELSE CAST(0 AS DECIMAL(12,4)) END),2) AS DOUBLE) AS brand1_revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_name LIKE '%a%'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q37_top_suppliers" ->
      s"""WITH bys AS (SELECT l_suppkey, CAST(round(sum($revenue),2) AS DOUBLE) AS revenue,
         |    count(*) AS n_items
         |  FROM lineitem GROUP BY 1)
         |SELECT s_name, n_name, revenue, n_items
         |FROM bys JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |ORDER BY revenue DESC, s_name LIMIT 10""".stripMargin,

    "q33_unpivot" ->
      """WITH w AS (SELECT l_returnflag,
        |    CAST(round(sum(CAST(l_quantity AS DECIMAL(12,4))),2) AS DOUBLE) AS sum_qty,
        |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))),2) AS DOUBLE) AS sum_price,
        |    CAST(count(*) AS DOUBLE) AS n_items
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
        |UNION ALL SELECT l_returnflag, 'n_items', n_items FROM w
        |ORDER BY l_returnflag, metric""".stripMargin,

    "q34_rlike" ->
      """SELECT lang, count(*) AS n_docs_with_numbers
        |FROM documents WHERE regexp_matches(text, '[0-9]{2,}')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q35_datetime" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |  count(*) AS n_orders,
        |  strftime(min(o_orderdate + INTERVAL 30 DAY), '%Y-%m-%d') AS min_due
        |FROM orders GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,

    "q40_rank_dist" ->
      """WITH r AS (SELECT c_mktsegment, c_custkey,
        |    floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pr,
        |    floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cd
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey))
        |SELECT c_mktsegment, c_custkey, pr, cd FROM r
        |WHERE c_custkey % 50 = 0 ORDER BY 1,2""".stripMargin,

    "text_hof" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents)
         |SELECT doc_id,
         |  len(list_filter(tk, x -> list_contains($enStop, x))) > 0 AS has_stopword,
         |  len(list_filter(tk, x -> length(x) >= 20)) = 0 AS all_short,
         |  CAST(len(list_filter(tk, x -> length(x) >= 8)) AS BIGINT) AS n_long_tokens
         |FROM t ORDER BY doc_id""".stripMargin,

    "text_sample_10pct" ->
      """SELECT lang, count(*) AS n_sampled, CAST(sum(n_chars) AS BIGINT) AS sampled_chars
        |FROM documents WHERE md5(doc_id::VARCHAR) < '1a'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q32_dense_rank" ->
      """WITH r AS (SELECT c_mktsegment, c_custkey, c_acctbal,
        |    CAST(rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS BIGINT) AS rnk,
        |    CAST(dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS BIGINT) AS drnk
        |  FROM customer)
        |SELECT c_mktsegment, c_custkey, rnk, drnk, round(c_acctbal, 2) AS acctbal
        |FROM r WHERE rnk <= 5 ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin,

    "q30_first_last" ->
      """WITH w AS (SELECT o_custkey,
        |    first_value(o_orderdate) OVER fr AS first_date,
        |    last_value(o_orderdate) OVER fr AS last_date,
        |    first_value(o_totalprice) OVER fr AS first_price,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders
        |  WINDOW fr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT o_custkey,
        |  strftime(first_date, '%Y-%m-%d') AS first_date,
        |  strftime(last_date, '%Y-%m-%d') AS last_date,
        |  round(first_price, 2) AS first_price
        |FROM w WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q31_corr_subquery" ->
      """SELECT c_mktsegment, count(*) AS n_above
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_mktsegment = c.c_mktsegment)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "typed_user_gaps" ->
      """WITH s AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |g AS (SELECT user_id, sec,
        |    lag(sec) OVER (PARTITION BY user_id ORDER BY sec) AS prev FROM s)
        |SELECT user_id, count(*) AS n_events,
        |  coalesce(max(sec - prev), 0) AS max_gap_s
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "streaming_dedup" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "streaming_sessions" ->
      """WITH l AS (SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |m AS (SELECT user_id, ts, event_id,
        |    CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 1800 SECOND THEN 1 ELSE 0 END AS new_session
        |  FROM l),
        |s AS (SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM m),
        |g AS (SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
        |    count(*) AS n_events
        |  FROM s GROUP BY 1,2),
        |f AS (SELECT *, max(session_id) OVER (PARTITION BY user_id) AS max_sid FROM g)
        |SELECT user_id,
        |  strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
        |  n_events
        |FROM f WHERE session_id < max_sid ORDER BY user_id, session_start""".stripMargin,

    // BM25 (Lucene +1-idf form), k1=1.2 b=0.75, terms hash/merge/window/
    // stream. The arithmetic mirrors TextAnalysis.bm25TopK expression-for-
    // expression (same association order) so the double math agrees;
    // floor-form rounding per the parity rules.
    "text_bm25" ->
      s"""$bm25Cte
         |SELECT doc_id, dl, bm25 FROM bm
         |WHERE bm25 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,

    // Twin of text_bm25_store — the oracle computes corpus-level BM25
    // and knows nothing of the postings layout: bucket pruning, the
    // stats sidecar, and the pivot re-assembly must all be invisible.
    "text_bm25_store" ->
      s"""${bm25CteFor(Seq("filter", "vector", "sort"))}
         |SELECT doc_id, dl, bm25 FROM bm
         |WHERE bm25 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin,

    // Twin of text_bm25_filtered — corpus-level BM25 (stats unfiltered)
    // with the metadata filter gating the candidate set: survivors carry
    // exactly their unfiltered scores.
    "text_bm25_filtered" ->
      s"""${bm25CteFor(Seq("table", "scan", "group"))}
         |SELECT bm.doc_id, bm.dl, bm.bm25 FROM bm
         |JOIN documents dd ON dd.doc_id = bm.doc_id
         |WHERE dd.lang IN ('en','de') AND bm.bm25 > 0
         |ORDER BY bm.bm25 DESC, bm.doc_id LIMIT 12""".stripMargin,

    // Twin of text_percolate — reverse search: the registered query
    // relation as VALUES, docs' distinct tokens unnested, a query
    // matches when every one of its terms hits.
    "text_percolate" -> percolateSql,

    // Twin of streaming_percolate (same SQL): the stateless expression
    // form over the stream must land the identical match set.
    "streaming_percolate" -> percolateSql,

    // Twin of text_bm25_deleted — corpus-level BM25 over the LIVE set
    // only: the tombstoned rows must vanish from N, avgdl, and df.
    "text_bm25_deleted" ->
      s"""WITH ${bm25BodyFor(Seq("row", "column", "value"),
             src = "(SELECT * FROM documents WHERE doc_id % 7 <> 0)")}
         |SELECT doc_id, dl, bm25 FROM bm
         |WHERE bm25 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 12""".stripMargin,

    // Twin of text_prf_search — the whole PRF chain in one statement:
    // seed BM25 (literal-pivot CTE), expansion harvest off the top-10
    // hits (df-desc/term-asc, seed terms excluded), then the
    // dynamic-term BM25 with fixed-point BIGINT partials (floor 1e-6 per
    // (doc, term), integer sum — the associative formulation the Spark
    // side uses for runtime term sets).
    "text_prf_search" ->
      s"""WITH ${bm25BodyFor(Seq("vector", "query"), "pf")},
         |seed AS (SELECT doc_id FROM pfbm WHERE bm25 > 0
         |  ORDER BY bm25 DESC, doc_id LIMIT 10),
         |hterm AS (SELECT term, CAST(count(*) AS BIGINT) AS dfh FROM (
         |    SELECT d.doc_id,
         |      unnest(list_distinct(string_split_regex(trim(lower(d.text)), '\\s+'))) AS term
         |    FROM documents d JOIN seed s ON s.doc_id = d.doc_id)
         |  WHERE term NOT IN ('vector', 'query') GROUP BY term),
         |expd AS (SELECT term FROM (
         |    SELECT term, row_number() OVER (ORDER BY dfh DESC, term) AS r
         |    FROM hterm) WHERE r <= 3),
         |terms AS (SELECT term FROM expd
         |  UNION SELECT unnest(['vector', 'query']) AS term),
         |toks AS (SELECT doc_id,
         |    CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS dl,
         |    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
         |  FROM documents),
         |stt AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(len(string_split_regex(trim(lower(text)), '\\s+'))) AS BIGINT) AS sumdl
         |  FROM documents),
         |tfr AS (SELECT t.doc_id, t.dl, t.term, CAST(count(*) AS BIGINT) AS tf
         |  FROM toks t JOIN terms USING (term) GROUP BY 1, 2, 3),
         |dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfr GROUP BY term),
         |prt AS (SELECT tfr.doc_id, tfr.dl,
         |    CAST(floor((ln((stt.n - dfr.df + 0.5) / (dfr.df + 0.5) + 1.0)
         |      * (CAST(tfr.tf AS DOUBLE) * 2.2)
         |      / (CAST(tfr.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(tfr.dl AS DOUBLE)
         |          / (CAST(stt.sumdl AS DOUBLE) / stt.n)))) * 1e6 + 0.5) AS BIGINT) AS fp
         |  FROM tfr JOIN dfr USING (term) CROSS JOIN stt),
         |scd AS (SELECT doc_id, max(dl) AS dl, CAST(sum(fp) AS BIGINT) AS sfp
         |  FROM prt GROUP BY doc_id)
         |SELECT doc_id, dl, CAST(sfp AS DOUBLE) / 1e6 AS bm25 FROM scd
         |WHERE CAST(sfp AS DOUBLE) / 1e6 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 12""".stripMargin,

    // Twin of text_bm25_incremental — same corpus-level form: a 2/3
    // build + 1/3 append must be indistinguishable from one full build.
    "text_bm25_incremental" ->
      s"""${bm25CteFor(Seq("join", "query"))}
         |SELECT doc_id, dl, bm25 FROM bm
         |WHERE bm25 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 12""".stripMargin,

    // Twin of text_index_compact — build + 2 appends + bucket
    // compaction must be indistinguishable from one full-corpus build.
    "text_index_compact" ->
      s"""${bm25CteFor(Seq("order", "group"))}
         |SELECT doc_id, dl, bm25 FROM bm
         |WHERE bm25 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 12""".stripMargin,

    // Twin of text_faceted_search — BM25 top-50 hit set, facet counts
    // over (lang, source), share of the actual hit count.
    "text_faceted_search" ->
      s"""${bm25CteFor(Seq("join", "vector"))},
         |top AS (SELECT doc_id FROM bm WHERE bm25 > 0
         |  ORDER BY bm25 DESC, doc_id LIMIT 50)
         |SELECT d2.lang, d2.source, CAST(count(*) AS BIGINT) AS n_hits,
         |  floor(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM top) * 1e6 + 0.5) / 1e6 AS share
         |FROM top t JOIN documents d2 USING (doc_id)
         |GROUP BY d2.lang, d2.source
         |ORDER BY n_hits DESC, d2.lang, d2.source""".stripMargin,

    // Twin of text_snippets — BM25 top-10, first term position and the
    // ±3-token excerpt recomputed from the raw text (1-based inclusive
    // slicing on both engines).
    "text_snippets" ->
      s"""${bm25CteFor(Seq("merge", "stream"))},
         |top AS (SELECT doc_id, bm25 FROM bm WHERE bm25 > 0
         |  ORDER BY bm25 DESC, doc_id LIMIT 10),
         |tk AS (SELECT doc_id,
         |    string_split_regex(trim(lower(text)), '\\s+') AS arr
         |  FROM documents),
         |px AS (SELECT doc_id, unnest(arr) AS tok,
         |    generate_subscripts(arr, 1) AS i FROM tk),
         |pos AS (SELECT doc_id, min(i) AS first_pos FROM px
         |  WHERE tok IN ('merge', 'stream') GROUP BY doc_id)
         |SELECT t.doc_id, t.bm25, p.first_pos,
         |  array_to_string(
         |    a.arr[greatest(p.first_pos - 3, 1):least(p.first_pos + 3, len(a.arr))],
         |    ' ') AS snippet
         |FROM top t JOIN pos p USING (doc_id) JOIN tk a USING (doc_id)
         |ORDER BY t.bm25 DESC, t.doc_id""".stripMargin,

    // Twin of text_bm25_batch — two prefixed CTE sets (one per query),
    // top-10 each, union tagged by q_id: the shared-scan batching must
    // be invisible next to two independent corpus computations.
    "text_bm25_batch" ->
      s"""WITH ${bm25BodyFor(Seq("filter", "vector", "sort"), "qa")},
         |${bm25BodyFor(Seq("join", "query"), "qb")}
         |SELECT * FROM (
         |  SELECT 'q0' AS q_id, doc_id, dl, bm25 FROM qabm
         |  WHERE bm25 > 0 ORDER BY bm25 DESC, doc_id LIMIT 10)
         |UNION ALL
         |SELECT * FROM (
         |  SELECT 'q1' AS q_id, doc_id, dl, bm25 FROM qbbm
         |  WHERE bm25 > 0 ORDER BY bm25 DESC, doc_id LIMIT 10)
         |ORDER BY q_id, bm25 DESC, doc_id""".stripMargin,

    // Twin of text_boolean_search — set algebra on distinct (doc, term)
    // membership recomputed from the text: INTERSECT the musts, EXCEPT
    // the must-nots, count should-hits.
    "text_boolean_search" ->
      """WITH tk AS (SELECT DISTINCT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM documents),
        |base AS (
        |  SELECT doc_id FROM tk WHERE t = 'join'
        |  INTERSECT SELECT doc_id FROM tk WHERE t = 'filter'
        |  EXCEPT SELECT doc_id FROM tk WHERE t = 'slow'),
        |sh AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_should FROM tk
        |  WHERE t IN ('vector', 'spark', 'sort') GROUP BY doc_id)
        |SELECT b.doc_id, CAST(coalesce(sh.n_should, 0) AS BIGINT) AS n_should
        |FROM base b LEFT JOIN sh USING (doc_id)
        |ORDER BY n_should DESC, doc_id LIMIT 20""".stripMargin,

    // Twin of text_near_search — positions recomputed from the text;
    // closest co-occurrence of the two terms per doc, window <= 3.
    "text_near_search" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok,
        |    generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS pos
        |  FROM documents),
        |a AS (SELECT doc_id, pos FROM tk WHERE tok = 'vector'),
        |b AS (SELECT doc_id, pos FROM tk WHERE tok = 'spark'),
        |m AS (SELECT a.doc_id, min(abs(a.pos - b.pos)) AS min_dist
        |  FROM a JOIN b ON b.doc_id = a.doc_id GROUP BY a.doc_id)
        |SELECT doc_id, CAST(min_dist AS INT) AS min_dist FROM m
        |WHERE min_dist <= 3
        |ORDER BY min_dist, doc_id LIMIT 25""".stripMargin,

    // Twin of text_index_stats — document and collection frequencies
    // recomputed from the raw text: the stored postings must hold
    // exactly one row per (term, doc) with the true tf.
    "text_index_stats" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents)
        |SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
        |  CAST(count(*) AS BIGINT) AS cf
        |FROM tk GROUP BY term
        |ORDER BY df DESC, term LIMIT 20""".stripMargin,

    // Twin of text_phrase_search — token positions recomputed straight
    // off the corpus text (multiple unnests in one SELECT zip in
    // DuckDB), the same slot-shift algebra, 1-based positions (the
    // shift difference cancels in the start arithmetic).
    "text_phrase_search" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok,
        |    generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS pos
        |  FROM documents),
        |sl AS (
        |  SELECT doc_id, pos - 0 AS start, 0 AS slot FROM tk WHERE tok = 'hash'
        |  UNION ALL
        |  SELECT doc_id, pos - 1 AS start, 1 AS slot FROM tk WHERE tok = 'join'),
        |m AS (SELECT doc_id, start FROM sl
        |  GROUP BY doc_id, start HAVING count(DISTINCT slot) = 2)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches FROM m
        |GROUP BY doc_id
        |ORDER BY n_matches DESC, doc_id LIMIT 15""".stripMargin,

    // Twin of streaming_text_ingest — the streamed standing/arrivals
    // split plus the intent protocol and the replay must all be
    // indistinguishable from one full-corpus build.
    "streaming_text_ingest" ->
      s"""${bm25CteFor(Seq("hash", "stream"))}
         |SELECT doc_id, dl, bm25 FROM bm
         |WHERE bm25 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin,

    // BM25 arm (top-100 by rounded score) + exact-cosine arm (top-100)
    // fused with reciprocal-rank fusion — the principled hybrid whose
    // cruder cousin is rag_hybrid_search's term-hit score
    // Twin of rag_hybrid_relative — min-max normalization per arm over
    // its own top-100 (all-equal arm → 1.0), 0.5/0.5 weighted sum,
    // every normalized value floor-rounded at 6 off the same rounded
    // arm scores the engine divides.
    "rag_hybrid_relative" ->
      s"""$bm25Cte,
         |kwtop AS (SELECT doc_id, bm25 FROM bm WHERE bm25 > 0
         |          ORDER BY bm25 DESC, doc_id LIMIT 100),
         |kmm AS (SELECT min(bm25) AS mn, max(bm25) AS mx FROM kwtop),
         |kwn AS (SELECT doc_id, floor((CASE WHEN mx > mn
         |      THEN (bm25 - mn) / (mx - mn) ELSE 1.0 END) * 1e6 + 0.5) / 1e6 AS norm_kw
         |  FROM kwtop, kmm),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |vsc AS (SELECT e.vec_id AS doc_id,
         |    floor((list_sum(list_transform(range(1,65), i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE)) /
         |      sqrt(list_sum(list_transform(range(1,65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)) *
         |           list_sum(list_transform(range(1,65), i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))) * 1e6 + 0.5) / 1e6 AS c
         |  FROM embeddings e CROSS JOIN q),
         |vtop AS (SELECT doc_id, c FROM vsc ORDER BY c DESC, doc_id LIMIT 100),
         |vmm AS (SELECT min(c) AS vn, max(c) AS vx FROM vtop),
         |vnr AS (SELECT doc_id, floor((CASE WHEN vx > vn
         |      THEN (c - vn) / (vx - vn) ELSE 1.0 END) * 1e6 + 0.5) / 1e6 AS norm_vec
         |  FROM vtop, vmm)
         |SELECT doc_id, norm_kw, norm_vec,
         |  floor((0.5 * coalesce(norm_kw, 0) + 0.5 * coalesce(norm_vec, 0)) * 1e6 + 0.5) / 1e6 AS fused
         |FROM kwn FULL OUTER JOIN vnr USING (doc_id)
         |ORDER BY fused DESC, doc_id LIMIT 10""".stripMargin,

    "rag_bm25_fusion" ->
      s"""$bm25Cte,
         |kwtop AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank_kw
         |  FROM (SELECT doc_id, bm25 FROM bm WHERE bm25 > 0
         |        ORDER BY bm25 DESC, doc_id LIMIT 100)),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |vs AS (SELECT e.vec_id AS doc_id,
         |    list_sum(list_transform(range(1,65), i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE)) /
         |    sqrt(list_sum(list_transform(range(1,65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)) *
         |         list_sum(list_transform(range(1,65), i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE))) AS cos
         |  FROM embeddings e, q),
         |vtop AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS rank_vec
         |  FROM vs ORDER BY cos DESC, doc_id LIMIT 100)
         |SELECT doc_id, rank_kw, rank_vec,
         |  floor((coalesce(1.0/(60+rank_kw), 0) + coalesce(1.0/(60+rank_vec), 0))*1e6 + 0.5)/1e6 AS rrf
         |FROM kwtop FULL OUTER JOIN vtop USING (doc_id)
         |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,

    // Recursive-CTE replay of the greedy MMR trajectory: every similarity
    // is fixed to integer micro-units (floor(cos*1e6+0.5) BIGINT) before
    // ANY comparison, so the argmax path is float-noise-free on both
    // engines; ties break by ascending vec_id via the composite BIGINT
    // arg_min key (-score6*1e9 + vid). The query vector (vec_id 0, part
    // of the corpus) is excluded from candidacy — standard MMR setup.
    // ps holds all ordered candidate pairs, so the inner JOIN in the
    // recursive term can never drop a candidate (chosen ⊆ cand, and a
    // correlated subquery into a MATERIALIZED CTE would silently NULL
    // here — the ann_graph_walk lesson).
    "rag_mmr" ->
      s"""WITH RECURSIVE
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cand AS MATERIALIZED (
         |  SELECT e.vec_id, e.embedding,
         |    CAST(floor((list_sum(list_transform(range(1,65), i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE)) /
         |      sqrt(list_sum(list_transform(range(1,65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)) *
         |           list_sum(list_transform(range(1,65), i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE))))*1e6 + 0.5) AS BIGINT) AS simq6
         |  FROM embeddings e, q WHERE e.vec_id <> 0
         |  ORDER BY simq6 DESC, vec_id LIMIT 30),
         |ps AS MATERIALIZED (
         |  SELECT a.vec_id AS ia, b.vec_id AS ib,
         |    CAST(floor(($cosineDouble)*1e6 + 0.5) AS BIGINT) AS sim6
         |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
         |sel AS (
         |  SELECT 1 AS step, [f.vec_id] AS chosen, f.vec_id AS vec_id, f.simq6, f.simq6 AS mmr6
         |  FROM (SELECT vec_id, simq6 FROM cand ORDER BY simq6 DESC, vec_id LIMIT 1) f
         |  UNION ALL
         |  SELECT step+1, list_append(chosen, vid), vid, simq6, score6 FROM (
         |    SELECT step, chosen,
         |      arg_min(vid,   -score6*1000000000 + vid) AS vid,
         |      arg_min(simq6, -score6*1000000000 + vid) AS simq6,
         |      arg_min(score6,-score6*1000000000 + vid) AS score6
         |    FROM (
         |      SELECT s.step, s.chosen, c.vec_id AS vid, c.simq6,
         |        CAST(floor(0.5*c.simq6 - 0.5*max(p.sim6) + 0.5) AS BIGINT) AS score6
         |      FROM sel s JOIN cand c ON NOT list_contains(s.chosen, c.vec_id)
         |        JOIN ps p ON p.ia = c.vec_id AND list_contains(s.chosen, p.ib)
         |      WHERE s.step < 10
         |      GROUP BY s.step, s.chosen, c.vec_id, c.simq6
         |    ) g GROUP BY step, chosen
         |  ) pick)
         |SELECT CAST(step AS BIGINT) AS rank, vec_id, simq6/1e6 AS simq, mmr6/1e6 AS mmr
         |FROM sel ORDER BY rank""".stripMargin,

    "q41_cohort_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY 1)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
        |  CAST(datediff('day', cohort, day) AS BIGINT) AS day_offset,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN c ON e.user_id = c.user_id
        |WHERE datediff('day', cohort, day) IN (0, 1, 3, 7, 14, 30)
        |GROUP BY cohort, 2 ORDER BY 1, 2""".stripMargin,

    // Twin of text_bigram_lm: the same deterministic caps (count desc
    // then lexicographic), add-one smoothing, and fixed-point log sums
    // as the unigram twin, one n-gram order up
    "text_bigram_lm" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS t FROM documents),
         |pr AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
         |  FROM tk, unnest(range(1, len(t))) AS u(i)),
         |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c1
         |  FROM (SELECT unnest(t) AS w FROM tk) GROUP BY 1
         |  ORDER BY c1 DESC, w LIMIT 50000),
         |big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM pr
         |  GROUP BY 1, 2 ORDER BY c2 DESC, w1, w2 LIMIT 100000),
         |nv AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM uni),
         |sc AS (SELECT pr.doc_id,
         |    CAST(floor(ln((coalesce(big.c2, 0) + 1.0) / (coalesce(uni.c1, 0) + nv.nv))
         |      * 1048576) AS BIGINT) AS lp
         |  FROM pr LEFT JOIN big USING (w1, w2) LEFT JOIN uni ON pr.w1 = uni.w, nv)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  floor(CAST(sum(lp) AS DOUBLE) / count(*) / 1048576 * 1e6 + 0.5) / 1e6 AS avg_logp2
         |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "text_unigram_lm" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |    FROM documents),
        |v AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tk
        |    GROUP BY 1 ORDER BY c DESC, token LIMIT 50000),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tk),
        |vc AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM v),
        |sc AS (SELECT tk.doc_id,
        |    CAST(floor(ln((coalesce(v.c, 0) + 1.0) / (total + nv)) * 1048576) AS BIGINT) AS lp
        |  FROM tk LEFT JOIN v USING (token), t, vc)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  floor(CAST(sum(lp) AS DOUBLE) / count(*) / 1048576 * 1e6 + 0.5) / 1e6 AS avg_logp
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,

    "q43_not_in" ->
      """SELECT c_mktsegment, count(*) AS n_inactive
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderdate >= TIMESTAMP '1997-01-01')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q42_map_metadata" ->
      """WITH m AS (SELECT doc_id,
        |    map_concat(
        |      map(['source','lang','n_chars'], [source, lang, CAST(n_chars AS VARCHAR)]),
        |      map(['ingestion_date'], ['2025-07-13'])) AS md
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(cardinality(md) AS BIGINT) AS n_keys,
        |  md['lang'][1] AS lang_val,
        |  md['ingestion_date'][1] AS ingest_date,
        |  md['missing'][1] AS missing_val,
        |  array_to_string(map_keys(md), ',') AS keys_csv
        |FROM m ORDER BY doc_id""".stripMargin,

    "pipeline_mix_report" ->
      """WITH d AS (SELECT source, lang,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS ntok
        |  FROM documents),
        |cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(ntok) AS BIGINT) AS n_tokens
        |  FROM d GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(ntok) AS BIGINT) AS total FROM d)
        |SELECT source, lang, n_docs, n_tokens,
        |  floor(CAST(n_tokens AS DOUBLE) / total * 1e6 + 0.5) / 1e6 AS token_share
        |FROM cells, t ORDER BY source, lang""".stripMargin,
  )
}
