package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard (with lossless set-size pruning), and
  * embedding-cosine near-dup.
  *
  * Scale design notes (the part that matters at 100 TB):
  *  - exact dedup is a single hash-shuffle on a 32-byte digest, never on
  *    the document text itself;
  *  - MinHash-LSH shuffles (band_id, band_hash) pairs — tiny fixed-width
  *    keys — and only exact-verifies candidate pairs, so the quadratic blow
  *    -up is confined to hash-bucket collisions;
  *  - the exact Jaccard join applies the |A|/|B| set-size ratio bound (a
  *    LOSSLESS prune: J(A,B) <= min|A|,|B| / max|A|,|B|) before computing
  *    any intersection;
  *  - all signatures are computed with built-in codegen'd expressions
  *    (xxhash64 / md5), no Scala closures in the per-row hot path.
  */
object Dedup {

  /** Distinct character shingles (n-grams) of a text column — the set used
    * for Jaccard similarity. Built-ins only (substring over a sequence), so
    * the same definition is expressible in the DuckDB oracle.
    */
  def shingles(text: Column, n: Int = 5): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => substring(text, i, lit(n))))

  /** The same distinct-shingle set as SORTED 64-bit hashes: set operations
    * on fixed-width longs are several times cheaper than on strings, and
    * |A∩B| is unchanged up to a ~2^-64 collision (the distinct-shingle
    * universe of a corpus is far below birthday range). Sorted so the
    * pair-wise intersection is a zero-allocation merge scan
    * ([[graft.functions.SortedArrayIntersectSize]]).
    */
  def shingleHashes(text: Column, n: Int = 5): Column =
    array_sort(array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => xxhash64(substring(text, i, lit(n))))))

  // ---------------------------------------------------------------- exact

  /** Exact dedup: md5 content hash, group, flag canonicals (min id wins).
    * Output: one row per input row with (hash, group_size, is_canonical).
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
    df.withColumn("content_hash", md5(col(textCol).cast("binary")))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .withColumn("is_duplicate", col(idCol) =!= col("canonical_id"))
  }

  // ------------------------------------------------------------- minhash

  /** MinHash band hashes in ONE pass over the shingle set (a UDF, not
    * `perms` stacked aggregate expressions — codegen over 128 array
    * aggregates per row compiles into an enormous method that falls out of
    * JIT; the tight JVM loop is ~100x faster and touches each shingle
    * once). Per shingle: one 64-bit base hash, then `perms` cheap
    * 2-universal mixes (h*A_i+B_i); per band: mix of its rows' minima.
    * Returns `bands` longs.
    */
  def minhashBandHashes(perms: Int, bands: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(perms % bands == 0)
    val r = perms / bands
    val rng = new scala.util.Random(0x5eed)
    val as = Array.fill(perms)(rng.nextLong() | 1L)
    val bs = Array.fill(perms)(rng.nextLong())
    udf((shingles: Array[Long]) => { // Array param: no per-element boxing
      val mins = Array.fill(perms)(Long.MaxValue)
      var si = 0
      while (si < shingles.length) {
        var h = shingles(si)
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
        var p = 0
        while (p < perms) {
          val v = h * as(p) + bs(p)
          if (v < mins(p)) mins(p) = v
          p += 1
        }
        si += 1
      }
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var acc = 0xcbf29ce484222325L
        var j = 0
        while (j < r) {
          acc ^= mins(b * r + j); acc *= 0x100000001b3L
          j += 1
        }
        out(b) = acc
        b += 1
      }
      out
    })
  }

  /** MinHash + LSH banding candidate generation + exact-Jaccard verify.
    *
    * bands*rowsPerBand permutations; a pair becomes a candidate if any band
    * of their signatures matches; candidates are verified with EXACT
    * Jaccard on the shingle sets so false positives never escape. With
    * bands=32, rows=4 a pair at J=0.8 is missed with prob (1-0.8^4)^32 ~
    * 5e-8 — effectively exact at the thresholds dedup uses.
    *
    * Output: (id_a, id_b, jaccard) pairs with jaccard >= threshold, id_a < id_b.
    */
  // ---- shared LSH plumbing (self-join and incremental forms): one
  // implementation of prep / banding / size estimate / broadcast gate so
  // a fix in one form cannot silently miss the other

  /** (id, sorted shingle hashes), repartitioned — a single-file input is
    * one partition and would compute every signature on one core. NOT
    * persisted; each caller picks its persistence discipline. */
  private[graft] def shingleRelation(df: DataFrame, textCol: String, idCol: String,
                              shingleSize: Int): DataFrame =
    graft.Tables.spread(df.select(col(idCol).as("_id"), col(textCol).as("_text")))
      .withColumn("_sh", shingleHashes(col("_text"), shingleSize))
      .drop("_text")

  /** The banded relation carries ONLY (id, shingle-set size, band,
    * bandhash) — never the shingle arrays — so the LSH shuffle moves
    * fixed-width keys. `_n` exists for the length filter below. */
  private[graft] def bandedOf(withSh: DataFrame, perms: Int, bands: Int): DataFrame =
    withSh.select(col("_id"), size(col("_sh")).as("_n"),
      posexplode(minhashBandHashes(perms, bands)(col("_sh")))
        .as(Seq("_band", "_bandhash")))

  /** Length filter (the classic size-based prune of the similarity-join
    * literature): J(A,B) = |A∩B|/|A∪B| <= min(|A|,|B|)/max(|A|,|B|), so a
    * candidate whose size ratio is under the threshold can NEVER verify —
    * dropping it inside the band join is lossless, and on template-heavy
    * corpora (where moderate-similarity pairs dominate band collisions)
    * it removes most of the candidate stream before the dedup shuffle and
    * the verify join ever see it. Computed divide-round-compare with the
    * SAME double semantics as [[verifyJaccard]] (round(x, 6) >= t):
    * correctly-rounded division and HALF_UP rounding are both monotone,
    * so round6(fl(intersect/union)) <= round6(fl(min/max)) and a pruned
    * pair is always one verify would reject — never one it would keep
    * (a plain `min >= t*max` integer form is NOT safe here: at
    * min == t*max exactly, fp error in t*max can prune a pair whose
    * rounded jaccard still passes). */
  private[graft] def lengthFilter(na: Column, nb: Column, threshold: Double): Column =
    round(least(na, nb).cast("double") / greatest(na, nb), 6) >= lit(threshold)

  /** Estimated in-memory bytes of a shingle relation (one agg over the
    * already-persisted relation). */
  private[graft] def shingleBytes(withSh: DataFrame): Long = {
    val st = withSh.agg(count(lit(1)).as("n"),
      coalesce(sum(size(col("_sh"))), lit(0L)).as("h")).head()
    st.getLong(1) * 8L + st.getLong(0) * 48L
  }

  /** The slim (id -> shingles) verification side: broadcast keeps the
    * candidate stream's hash-partitioned parallelism with no shuffle, but
    * the relation grows with the corpus — so the broadcast is SIZE-GATED;
    * over the cap the planner falls back to hash joins on the id key. */
  private[graft] def verifySide(withSh: DataFrame, id: String, shc: String,
                         estBytes: Long): DataFrame =
    BroadcastGate.maybeBroadcast(
      withSh.select(col("_id").as(id), col("_sh").as(shc)), estBytes)

  def minhashLsh(df: DataFrame, textCol: String, idCol: String,
                 shingleSize: Int = 5, bands: Int = 32, rowsPerBand: Int = 4,
                 threshold: Double = 0.8): DataFrame = {
    // EAGER localCheckpoint, not cache(): the plan consumes the shingle
    // sets three times (banding + both sides of the verification join)
    // and recomputing the hash+sort per consumer triples the dominant
    // cost — but a cache-manager entry the lazy result still references
    // can never be unpersisted by this operator, and minhashLsh runs
    // inside cleanCorpusDecisions, so every composed-pipeline execution
    // in a long-lived session would leak one shingle relation (the bug
    // class the r6 dedup_clusters and r8 lshNearDupJoin fixes closed).
    // Checkpoint blocks are GC-managed (ContextCleaner drops them when
    // the plan is unreferenced).
    val withSh = shingleRelation(df, textCol, idCol, shingleSize)
      .localCheckpoint(true)
    val banded = bandedOf(withSh, bands * rowsPerBand, bands)
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a._band") === col("b._band") &&
          col("a._bandhash") === col("b._bandhash") &&
          col("a._id") < col("b._id") &&
          lengthFilter(col("a._n"), col("b._n"), threshold))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val estBytes = shingleBytes(withSh)
    val pairs = candidates
      .join(verifySide(withSh, "id_a", "sh_a", estBytes), "id_a")
      .join(verifySide(withSh, "id_b", "sh_b", estBytes), "id_b")
    verifyJaccard(pairs, threshold)
  }

  /** Incremental near-dup — the nightly-ingest shape: each NEW doc's
    * near-duplicates in the EXISTING corpus, and only those (never
    * existing x existing, which a full self-join would redundantly
    * re-verify on every batch). Both sides band identically and join on
    * the fixed-width (band, bandhash) key; at 100 TB the existing side's
    * banded signatures are a PRECOMPUTED stored relation bucketed by that
    * key (the signature store appends as batches commit), so the daily
    * cost is O(new batch) + one bucket-join — here both derive inline
    * from the same operators to keep the oracle exact.
    *
    * Output: (new_id, existing_id, jaccard) — callers drop or re-route
    * new docs with any hit.
    */
  def minhashLshIncremental(newDf: DataFrame, existing: DataFrame,
                            textCol: String, idCol: String,
                            shingleSize: Int = 5, bands: Int = 32,
                            rowsPerBand: Int = 4,
                            threshold: Double = 0.8): DataFrame = {
    // eager localCheckpoint, not cache(): the nightly caller is a
    // LONG-LIVED ingest session, and a cached relation the lazy result
    // still references can never be unpersisted by this operator —
    // batches would accumulate in the cache manager forever. Checkpoint
    // blocks are GC-managed instead; the trade (no lineage recompute if
    // an executor dies — the batch job just retries) is the right one
    // for a maintenance operator.
    val nw = shingleRelation(newDf, textCol, idCol, shingleSize)
      .localCheckpoint(true)
    val ex = shingleRelation(existing, textCol, idCol, shingleSize)
      .localCheckpoint(true)
    val candidates = bandedOf(nw, bands * rowsPerBand, bands).as("a")
      .join(bandedOf(ex, bands * rowsPerBand, bands).as("b"),
        col("a._band") === col("b._band") &&
          col("a._bandhash") === col("b._bandhash") &&
          lengthFilter(col("a._n"), col("b._n"), threshold))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val pairs = candidates
      .join(verifySide(nw, "id_a", "sh_a", shingleBytes(nw)), "id_a")
      .join(verifySide(ex, "id_b", "sh_b", shingleBytes(ex)), "id_b")
    verifyJaccard(pairs, threshold)
      .select(col("id_a").as("new_id"), col("id_b").as("existing_id"), col("jaccard"))
  }

  /** Build and persist the banded-signature INDEX of a standing corpus —
    * the stored relation that makes incremental/streaming near-dup
    * O(batch) instead of O(corpus) per check. Two collections in the
    * store (shingles computed ONCE, checkpointed, written to both):
    *
    *   `<name>_bands`    (_band, _bandhash, _id, _n)  — the fixed-width
    *                     join keys plus the shingle-set size feeding the
    *                     lossless length filter on each batch's band join;
    *                     at 100 TB this is the relation to BUCKET
    *                     by (_band, _bandhash) so each batch's band join
    *                     is a co-located bucket join with no corpus-side
    *                     shuffle (Spark bucketed tables need a catalog,
    *                     so the harness layout is plain parquet and the
    *                     join shuffles the SMALL batch side only —
    *                     already the right asymptotic shape).
    *   `<name>_shingles` (_id, _sh)               — exact-verify side,
    *                     fetched by id equi-join for candidates only.
    *
    * Appending a committed batch's own signatures keeps the index
    * current (the nightly pattern of [[minhashLshIncremental]]'s doc).
    */
  /** Sidecar recording a signature index's (shingleSize, bands,
    * rowsPerBand) — the parameters are part of the LAYOUT's identity: a
    * batch banded at different parameters joins the stored keys on
    * garbage and silently returns an empty/wrong candidate set, the
    * nastiest failure mode a stored index can have. Written by
    * [[buildSignatureIndex]], VALIDATED by [[appendToSignatureIndex]];
    * readable via [[signatureIndexParams]] so a caller can band its
    * query side to match instead of guessing. (Banding became properly
    * variable the moment [[bandingAdvisor]] started recommending
    * per-threshold parameters — a fixed-default world never hit this.) */
  private[graft] val SignatureIndexPropsFile = "_minhash_index.properties"

  private def writeSignatureProps(store: graft.store.VectorStore,
                                  name: String, shingleSize: Int,
                                  bands: Int, rowsPerBand: Int): Unit = {
    val props = new java.util.Properties()
    props.setProperty("shingle_size", shingleSize.toString)
    props.setProperty("bands", bands.toString)
    props.setProperty("rows_per_band", rowsPerBand.toString)
    graft.store.StoreFs.forPath(store.root).writePropsAtomic(
      s"${store.root}/${name}_bands/$SignatureIndexPropsFile", props,
      "graft minhash signature-index parameters")
  }

  /** (shingleSize, bands, rowsPerBand) of a stored signature index, or
    * None for an index written before the sidecar existed. */
  def signatureIndexParams(store: graft.store.VectorStore,
                           name: String): Option[(Int, Int, Int)] =
    graft.store.StoreFs.forPath(store.root)
      .readProps(s"${store.root}/${name}_bands/$SignatureIndexPropsFile")
      .map(p => (p.getProperty("shingle_size").toInt,
        p.getProperty("bands").toInt, p.getProperty("rows_per_band").toInt))

  private def requireSignatureParams(store: graft.store.VectorStore,
                                     name: String, shingleSize: Int,
                                     bands: Int, rowsPerBand: Int): Unit =
    signatureIndexParams(store, name).foreach { case (ss, b, r) =>
      require(ss == shingleSize && b == bands && r == rowsPerBand,
        s"signature index '$name' was built at shingle=$ss ${b}x$r but this " +
          s"call bands at shingle=$shingleSize ${bands}x$rowsPerBand — " +
          "mismatched banding joins the stored keys on garbage; read " +
          "Dedup.signatureIndexParams and band to match")
    }

  def buildSignatureIndex(store: graft.store.VectorStore, name: String,
                          docs: DataFrame, textCol: String, idCol: String,
                          shingleSize: Int = 5, bands: Int = 32,
                          rowsPerBand: Int = 4): Unit = {
    val sh = shingleRelation(docs, textCol, idCol, shingleSize)
      .localCheckpoint(true) // shingle ONCE; both writes read the blocks
    store.create(s"${name}_shingles", sh)
    store.create(s"${name}_bands",
      bandedOf(sh, bands * rowsPerBand, bands)
        .select(col("_band"), col("_bandhash"), col("_id"), col("_n")))
    writeSignatureProps(store, name, shingleSize, bands, rowsPerBand)
  }

  /** Append a committed batch's signatures to an existing index — the
    * other half of the nightly loop [[buildSignatureIndex]] documents:
    * check the batch against the index, commit the survivors, then
    * append THEIR signatures so tomorrow's batch sees them. O(batch)
    * compute, two partitioned appends, no touch of the standing
    * relations. */
  def appendToSignatureIndex(store: graft.store.VectorStore, name: String,
                             batch: DataFrame, textCol: String, idCol: String,
                             shingleSize: Int = 5, bands: Int = 32,
                             rowsPerBand: Int = 4): Unit = {
    // loud failure beats silently appending keys no query will match
    // (pre-sidecar indexes pass unchecked — the `_n` back-compat rule)
    requireSignatureParams(store, name, shingleSize, bands, rowsPerBand)
    val sh = shingleRelation(batch, textCol, idCol, shingleSize)
      .localCheckpoint(true)
    store.append(s"${name}_shingles", sh)
    store.append(s"${name}_bands",
      bandedOf(sh, bands * rowsPerBand, bands)
        .select(col("_band"), col("_bandhash"), col("_id"), col("_n")))
  }

  /** Incremental near-dup against a PRECOMPUTED signature index (the
    * two relations [[buildSignatureIndex]] writes): each new doc is
    * shingled and banded — the standing corpus is NOT touched; its
    * banded keys and shingle sets arrive from the stored index — then
    * candidates band-join the index and exact Jaccard verifies against
    * the stored shingle sets. Cost per call: O(new batch) compute + a
    * band equi-join + an id equi-join, which is what lets a streaming
    * ingest run this every micro-batch forever.
    *
    * Result-identical to [[minhashLshIncremental]] (same seeds, same
    * banding, same exact verify) — pinned in DedupSpec.
    */
  def minhashLshIncrementalIndexed(newDf: DataFrame, bandsIdx: DataFrame,
                                   shinglesIdx: DataFrame,
                                   textCol: String, idCol: String,
                                   shingleSize: Int = 5, bands: Int = 32,
                                   rowsPerBand: Int = 4,
                                   threshold: Double = 0.8): DataFrame = {
    val nw = shingleRelation(newDf, textCol, idCol, shingleSize)
      .localCheckpoint(true)
    // the length filter needs the stored side's set size; indexes written
    // before `_n` landed in the `_bands` schema still work, just unpruned
    val sizeOk =
      if (bandsIdx.columns.contains("_n"))
        lengthFilter(col("a._n"), col("b._n"), threshold)
      else lit(true)
    val candidates = bandedOf(nw, bands * rowsPerBand, bands).as("a")
      .join(bandsIdx.as("b"),
        col("a._band") === col("b._band") &&
          col("a._bandhash") === col("b._bandhash") && sizeOk)
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val pairs = candidates
      .join(verifySide(nw, "id_a", "sh_a", shingleBytes(nw)), "id_a")
      .join(shinglesIdx.select(col("_id").as("id_b"), col("_sh").as("sh_b")),
        "id_b")
    verifyJaccard(pairs, threshold)
      .select(col("id_a").as("new_id"), col("id_b").as("existing_id"),
        col("jaccard"))
  }

  // ---------------------------------------------------- banding advisor

  /** Integer power by binary exponentiation with a FIXED multiplication
    * sequence (r *= b at each set bit, then b *= b — in that order).
    * IEEE multiplication is exactly rounded, so any engine replaying the
    * SAME sequence produces the bit-identical double — which is what
    * lets the s-curve probabilities below sit under a cross-engine gate
    * hash. The DuckDB twin generates its product expression from this
    * exact loop (GraftOracles.ipowSql); `math.pow` would NOT be safe
    * here (libm results differ across platforms in the last ulp). */
  private[graft] def ipow(x: Double, n: Int): Double = {
    var r = 1.0; var b = x; var e = n
    while (e > 0) {
      if ((e & 1) == 1) r *= b
      b *= b; e >>= 1
    }
    r
  }

  /** LSH s-curve: P(some band collides | jaccard = j) with `rows` rows
    * per band over `bands` bands = 1 - (1 - j^rows)^bands. Built on
    * [[ipow]] so it is bit-replayable in SQL. */
  private[graft] def sCurveP(j: Double, rows: Int, bands: Int): Double =
    1.0 - ipow(1.0 - ipow(j, rows), bands)

  /** The banding DECISION shared by [[bandingAdvisor]] (reports it) and
    * [[minhashLshAuto]] (executes it): the LARGEST rows-per-band whose
    * collision probability at the threshold still clears `recallFloor`
    * — the steepest s-curve (fewest background candidates) that cannot
    * cost real recall. Returns (bands, rowsPerBand). Pure arithmetic in
    * (threshold, nHashes, recallFloor); corpus statistics inform the
    * advisor's ESTIMATES, never the choice — which is what lets a SQL
    * oracle replay it from literals. */
  def chooseBanding(threshold: Double, nHashes: Int,
                    recallFloor: Double = 0.9): (Int, Int) = {
    val divisorsDesc = (1 to nHashes).filter(nHashes % _ == 0).reverse
    val r = divisorsDesc
      .find(r => sCurveP(threshold, r, nHashes / r) >= recallFloor)
      .getOrElse(1)
    (nHashes / r, r)
  }

  /** Self-tuning MinHash near-dup join — [[minhashLsh]] at the banding
    * [[chooseBanding]] picks for the threshold (the
    * [[Similarity.vectorPercolateAuto]] discipline: nothing should
    * silently run a fixed 32x4 curve for every threshold — the r15 10x
    * probe measured that default generating a background-dominated
    * candidate stream, 925k verified pairs from 5k docs). The chosen
    * (bands, rows_per_band) ride every output row, so the gate hash
    * covers the DECISION, not just the surviving pairs; the exact
    * verify step makes precision exact at any banding, and recall sits
    * at the s-curve value the floor guarantees (>= 0.997 at the default
    * 256-hash budget and t=0.8 — measured pair-set-EQUAL to the exact
    * join at every test scale; see cleanCorpusDecisions).
    *
    * Default nHashes=256, not 128: recall headroom is cheap (one more
    * minhash pass per shingle) while a missed true pair is forever — a
    * real sf0.1 pair at j=0.8298 deterministically misses the 128-hash
    * 16x8 curve and collides at 32x8. */
  def minhashLshAuto(df: DataFrame, textCol: String, idCol: String,
                     threshold: Double, nHashes: Int = 256,
                     shingleSize: Int = 5,
                     recallFloor: Double = 0.9): DataFrame = {
    val (b, r) = chooseBanding(threshold, nHashes, recallFloor)
    minhashLsh(df, textCol, idCol, shingleSize, b, r, threshold)
      .withColumn("bands", lit(b)).withColumn("rows_per_band", lit(r))
  }

  /** MinHash banding ADVISOR — chooses the s-curve-correct
    * (bands, rowsPerBand) for a dedup threshold and prices the
    * candidate stream the corpus' own background similarity implies,
    * with the whole decision under the gate hash (the
    * [[Similarity.vectorPercolateAuto]] discipline: pure integer/float
    * arithmetic a SQL oracle replays term-for-term).
    *
    * Why this operator exists: fixed banding is the one silently-wrong
    * -at-scale choice left in the dedup family. The repo's own 10x
    * probe measured it (NOTES round-15): at background Jaccard ~0.22
    * (low-entropy corpora) the default 32 bands x 4 rows has its
    * s-curve midpoint at 0.42, so UNRELATED pairs collide — 925,615
    * verified pairs from 5,000 docs, growing quadratically with the
    * corpus. At threshold 0.8 the scale-correct banding is 16 x 8
    * (midpoint 0.71): background collides at ~1e-4, true pairs at
    * ~0.95. The engine knew the arithmetic; nothing CHOSE it. This
    * does.
    *
    * Decision rule (replayed as a CASE over the same [[ipow]] products
    * in the oracle): among the divisor pairs rows x (nHashes/rows),
    * pick the LARGEST rows-per-band whose collision probability at the
    * threshold still clears `recallFloor` — the steepest s-curve (=
    * fewest background candidates) that cannot cost real recall.
    *
    * Background estimate: exact shingle Jaccard over a DETERMINISTIC
    * pair sample — the 2·`maxSamplePairs` lowest-id docs, rank r paired
    * with rank r + half (opposite halves, so injected near-dup
    * neighbors at adjacent ids never pair) — averaged in order-
    * independent micro-unit BIGINT arithmetic. The sample is a
    * TakeOrdered (top-k by id) + a ≤2·maxSamplePairs-row local window,
    * never a global row_number over the corpus, so the advisor costs
    * one slim top-k scan + one count at any corpus size.
    *
    * Output (one row): the recommendation, its collision probabilities
    * at the threshold and at the measured background (micro-units), the
    * estimated background candidate-pair count under BOTH the
    * recommended and the caller's current/default banding, and a
    * `background_dominated` flag (default banding's expected background
    * candidates exceed 10x the corpus — the "the candidate stream IS
    * the job" regime the 10x probe measured). */
  def bandingAdvisor(df: DataFrame, textCol: String, idCol: String,
                     threshold: Double, nHashes: Int = 128,
                     shingleSize: Int = 5, recallFloor: Double = 0.9,
                     maxSamplePairs: Int = 200,
                     defaultBands: Int = 32,
                     defaultRowsPerBand: Int = 4): DataFrame = {
    require(defaultBands * defaultRowsPerBand == nHashes,
      s"default banding ${defaultBands}x$defaultRowsPerBand must factor nHashes=$nHashes")
    val sp = df.sparkSession
    import sp.implicits._
    val n = df.count()
    // deterministic sample: 2*maxSamplePairs lowest ids (TakeOrdered —
    // scalable), shingled, ranked locally (bounded rows post-limit)
    val samp = df.orderBy(col(idCol)).limit(2 * maxSamplePairs)
      .select(col(idCol).as("_id"),
        shingleHashes(col(textCol), shingleSize).as("_sh"))
      .withColumn("rk", row_number().over(Window.orderBy("_id")))
      .localCheckpoint(true)
    val half = samp.count() / 2
    val st =
      if (half == 0) (0L, 0L)
      else {
        val inter = graft.functions.SetFunctions
          .sortedIntersectSize(col("a._sh"), col("b._sh")).cast("double")
        val union = (size(col("a._sh")) + size(col("b._sh"))).cast("double") - inter
        val agg = samp.as("a")
          .join(samp.as("b"), col("b.rk") === col("a.rk") + lit(half))
          .filter(col("a.rk") <= lit(half))
          .select(floor(inter / union * 1e6 + 0.5).as("jmu"))
          .agg(count(lit(1)), coalesce(sum(col("jmu")), lit(0L))).head()
        (agg.getLong(0), agg.getLong(1))
      }
    val (m, sumMu) = st
    val bgMu = if (m == 0) 0L else sumMu / m
    val j = bgMu.toDouble / 1e6
    val (bSel, rSel) = chooseBanding(threshold, nHashes, recallFloor)
    val mu = (x: Double) => math.floor(x * 1e6 + 0.5).toLong
    val nPairs = n * (n - 1) / 2
    val est = (p: Double) => math.floor(nPairs.toDouble * p).toLong
    val pBgSel = sCurveP(j, rSel, bSel)
    val pBgDef = sCurveP(j, defaultRowsPerBand, defaultBands)
    val estDef = est(pBgDef)
    Seq((n, m, bgMu, bSel, rSel,
      mu(sCurveP(threshold, rSel, bSel)), mu(pBgSel), est(pBgSel),
      defaultBands, defaultRowsPerBand, mu(pBgDef), estDef,
      estDef > 10 * n))
      .toDF("n_docs", "sample_pairs", "bg_jaccard_mu", "bands",
        "rows_per_band", "p_threshold_mu", "p_background_mu",
        "est_candidates", "default_bands", "default_rows_per_band",
        "p_background_default_mu", "est_candidates_default",
        "background_dominated")
  }

  private[graft] def verifyJaccard(pairs: DataFrame, threshold: Double): DataFrame = {
    val inter = graft.functions.SetFunctions
      .sortedIntersectSize(col("sh_a"), col("sh_b")).cast("double")
    val sizes = (size(col("sh_a")) + size(col("sh_b"))).cast("double")
    // Hot-path prefilter: early-exit threshold test at slightly-slack t
    // (so the exact rounded-jaccard check below can't disagree at the
    // boundary); it aborts the merge scan as soon as the decision is
    // forced, and survivors — few — recompute the exact count.
    val tSlack = math.max(threshold - 1e-4, 0.0)
    val prefilter = graft.functions.SetFunctions
      .jaccardAtLeast(col("sh_a"), col("sh_b"), tSlack)
    val jaccard = round(inter / (sizes - inter), 6)
    pairs.filter(prefilter)
      .withColumn("jaccard", jaccard)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ------------------------------------------------------ exact jaccard

  /** Exact n-gram Jaccard similarity join (self-join) with the lossless
    * set-size ratio prune. Optional blocking column (e.g. language) —
    * blocking IS a semantic restriction and is part of the operator's
    * declared contract, not a silent approximation.
    */
  def ngramJaccardJoin(df: DataFrame, textCol: String, idCol: String,
                       shingleSize: Int = 5, threshold: Double = 0.6,
                       blockCol: Option[String] = None): DataFrame = {
    val baseCols = Seq(col(idCol).as("_id"), shingleHashes(col(textCol), shingleSize).as("_sh")) ++
      blockCol.map(c => col(c).as("_blk"))
    // EAGER localCheckpoint, not cache(): consumed as probe side AND
    // broadcast build side, so it must be materialized once — but this
    // operator can never unpersist a cached relation the lazy result
    // still references (the long-lived-session leak class; see
    // minhashLsh above). The probe side is repartitioned to the session
    // parallelism first — a single-file parquet input is ONE partition,
    // which would run the whole pairs x merge-scan workload on one task
    // under a broadcast join.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val base = df.select(baseCols: _*).withColumn("_n", size(col("_sh")))
      .repartition(par).localCheckpoint(true)
    val joinCond = {
      val idOrd = col("a._id") < col("b._id")
      // lossless: J >= t requires min/max >= t (see lengthFilter — the
      // round6 divide form matches verifyJaccard's boundary semantics;
      // the old t*max multiply form could prune an exactly-at-threshold
      // pair through fp error in t*max)
      val sizeOk = lengthFilter(col("a._n"), col("b._n"), threshold)
      blockCol match {
        case Some(_) => idOrd && sizeOk && col("a._blk") === col("b._blk")
        case None => idOrd && sizeOk
      }
    }
    // Broadcast the build side: a shuffled join on the blocking column
    // collapses parallelism to #blocks (5 languages -> 5 tasks), while a
    // broadcast build keeps the probe side at full input parallelism. An
    // exact O(n^2)-per-block join only makes sense when one side fits in
    // memory anyway — at true scale the LSH operators above are the path —
    // but the broadcast is still SIZE-GATED so an oversized input degrades
    // to a shuffle join instead of OOMing.
    val bstats = base.agg(count(lit(1)).as("n"),
      coalesce(sum(size(col("_sh"))), lit(0L)).as("h")).head()
    val estBytes = bstats.getLong(1) * 8L + bstats.getLong(0) * 48L
    val pairs = base.as("a")
      .join(BroadcastGate.maybeBroadcast(base.as("b"), estBytes), joinCond)
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        col("a._sh").as("sh_a"), col("b._sh").as("sh_b"))
    verifyJaccard(pairs, threshold)
  }

  // ------------------------------------------------------------- simhash

  /** 64-bit SimHash over whitespace tokens: each token votes its hash
    * bits, signature bit = sign of the vote sum. One pass per row in a
    * tight JVM loop (64 stacked aggregate expressions — the "built-ins
    * only" formulation — compile into a method too large for JIT, same
    * pathology as the expression-stack minhash).
    */
  val simhashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((tokens: Seq[String]) => {
      val votes = new Array[Int](64)
      tokens.foreach { t =>
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < t.length) { h ^= t.charAt(i); h *= 0x100000001b3L; i += 1 }
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
          k += 1
        }
      }
      var sig = 0L
      var k = 0
      while (k < 64) { if (votes(k) > 0) sig |= (1L << k); k += 1 }
      sig
    })

  def simhash(tokens: Column): Column = simhashUdf(tokens)

  /** SimHash near-dup pairs: band the 64-bit signature into 4 x 16-bit
    * chunks (pigeonhole: hamming <= 3 guarantees one identical chunk),
    * group by chunk, enumerate surviving pairs per bucket.
    *
    * Why not a banded self-JOIN: the join pays full row machinery per
    * candidate pair, and low-entropy corpora make some 16-bit chunks very
    * common — a bucket of m docs is m^2/2 candidate evaluations ON ONE
    * TASK (the join key pins the bucket to a single partition either way).
    * Collecting each bucket once and scanning sorted primitive arrays is
    * ~20x cheaper per pair, so the worst bucket costs milliseconds, not
    * seconds. Bucket members must fit in task memory (ids+sigs = 16 bytes/
    * doc); for corpora where a 16-bit bucket could exceed that, widen the
    * chunks with extra signature bits first (more bands of more bits).
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType =>
        simhashPairsLongId(df, textCol, idCol, maxHamming)
      case _ => simhashPairsJoin(df, textCol, idCol, maxHamming)
    }
  }

  /** Fast path: integral ids travel through the per-bucket primitive
    * kernel. Output id columns keep the INPUT id type (an INT id comes
    * back as INT, not silently widened to the kernel's internal LONG),
    * and duplicate id VALUES never produce an (x, x) self-pair — both
    * exactly matching the generic-join path's `id_a < id_b` semantics. */
  private def simhashPairsLongId(df: DataFrame, textCol: String, idCol: String,
                                 maxHamming: Int): DataFrame = {
    val idType = df.schema(idCol).dataType
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val sigs = graft.Tables.spread(df)
      .select(col(idCol).cast("long").as("_id"), simhash(toks).as("_sig"))
    signaturePairs(sigs, "_id", "_sig", maxHamming)
      .select(col("id_a").cast(idType).as("id_a"),
        col("id_b").cast(idType).as("id_b"), col("hamming"))
  }

  /** Band chunk expressions for exact recall at radius `maxHamming`:
    * `maxHamming + 1` chunks covering all 64 signature bits (pigeonhole:
    * at most `maxHamming` differing bits cannot touch every one of
    * `maxHamming + 1` chunks, so near-dup pairs always share at least
    * one identical chunk and land in a common bucket). Chunk widths
    * differ by at most one bit; the default radius 3 yields the 4x16
    * layout. Wider radii mean narrower chunks and therefore bigger
    * buckets — recall stays exact, candidate cost grows. */
  private def bandExprs(sig: org.apache.spark.sql.Column,
                        maxHamming: Int): Seq[org.apache.spark.sql.Column] = {
    // 64 one-bit bands cover radius 63; radius 64 (every bit differs)
    // has NO shared band — banding cannot express "all pairs", so
    // refuse loudly rather than silently dropping the h=64 corner
    require(maxHamming >= 0 && maxHamming <= 63,
      s"maxHamming must be in [0, 63], got $maxHamming (64-bit signatures)")
    val nb = maxHamming + 1
    val base = 64 / nb
    val rem = 64 % nb
    val widths = Seq.tabulate(nb)(i => if (i < rem) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _).init
    widths.zip(offsets).map { case (w, off) =>
      val mask = if (w == 64) -1L else (1L << w) - 1
      shiftrightunsigned(sig, off).bitwiseAND(lit(mask))
    }
  }

  /** Near-dup pairs over ANY 64-bit per-row signature — the banding +
    * per-bucket kernel of [[simhashPairs]] factored out so other
    * signature families (image dHash, audio fingerprints) reuse it:
    * `maxHamming + 1` chunks sized by [[bandExprs]] (pigeonhole: recall
    * is EXACT at the requested radius — 4 x 16-bit at the default 3),
    * bucket members scanned as sorted primitive arrays (see the
    * simhashPairs scaladoc for why not a join). Input: an integral id
    * column + a long signature column.
    * Output: (id_a, id_b, hamming), id_a < id_b, both as LONG. */
  def signaturePairs(sigs0: DataFrame, idCol: String, sigCol: String,
                     maxHamming: Int = 3): DataFrame = {
    // a string id would cast to null, getLong(null) would read 0, and
    // the strict id_a < id_b check would silently suppress EVERY pair —
    // an empty answer with no error; fail loudly instead (simhashPairs
    // dispatches non-integral ids to its join form for this reason)
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = sigs0.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"signaturePairs needs an integral id column; '$idCol' is $idType " +
        "(map your ids to longs first, or use simhashPairs' generic join form)")
    val sigs = sigs0.select(col(idCol).cast("long").as("_id"),
      col(sigCol).cast("long").as("_sig"))
    val banded = sigs.select(col("_id"), col("_sig"),
      posexplode(array(bandExprs(col("_sig"), maxHamming): _*))
        .as(Seq("_band", "_chunk")))
    val enumeratePairs = udf((members: Seq[org.apache.spark.sql.Row]) => {
      val n = members.size
      val ids = new Array[Long](n)
      val sg = new Array[Long](n)
      var i = 0
      members.foreach { r => ids(i) = r.getLong(0); sg(i) = r.getLong(1); i += 1 }
      val idx = Array.range(0, n).sortBy(ids(_)) // emit (low id, high id)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
      i = 0
      while (i < n) {
        val a = idx(i)
        var j = i + 1
        while (j < n) {
          val b = idx(j)
          val h = java.lang.Long.bitCount(sg(a) ^ sg(b))
          // strict < (not just distinct rows): two rows sharing one id
          // value must not emit a self-pair, mirroring `id_a < id_b`
          if (h <= maxHamming && ids(a) < ids(b)) out += ((ids(a), ids(b), h))
          j += 1
        }
        i += 1
      }
      out.toSeq
    })
    banded.groupBy("_band", "_chunk")
      .agg(collect_list(struct(col("_id"), col("_sig"))).as("_members"))
      .filter(size(col("_members")) > 1)
      .select(explode(enumeratePairs(col("_members"))).as("_p"))
      .select(col("_p._1").as("id_a"), col("_p._2").as("id_b"),
        col("_p._3").as("hamming"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Generic-id fallback (string ids etc.): banded self-join with the
    * hamming predicate evaluated inside the join condition. Same
    * semantics; pays row machinery per candidate pair, so prefer integral
    * ids on large skewed corpora. */
  private def simhashPairsJoin(df: DataFrame, textCol: String, idCol: String,
                               maxHamming: Int): DataFrame = {
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val sigs = graft.Tables.spread(df)
      .select(col(idCol).as("_id"), simhash(toks).as("_sig"))
    val banded = sigs.select(col("_id"), col("_sig"),
      posexplode(array(bandExprs(col("_sig"), maxHamming): _*))
        .as(Seq("_band", "_chunk")))
    banded.as("a")
      .join(banded.as("b"),
        col("a._band") === col("b._band") && col("a._chunk") === col("b._chunk") &&
          col("a._id") < col("b._id") &&
          bit_count(col("a._sig").bitwiseXOR(col("b._sig"))) <= maxHamming)
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        bit_count(col("a._sig").bitwiseXOR(col("b._sig"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
  }

  // ------------------------------------------------ near-dup clustering

  /** Connected components over an undirected pair graph: every node ends
    * with its component's MINIMUM id as label. Deterministic by
    * construction (min is merge-order-independent), so the result is
    * bit-identical across partitionings — and oracle-able (DuckDB
    * WITH RECURSIVE reachability twin).
    *
    * Three-tier execution, picked by measured graph size — near-dup pair
    * graphs are a VANISHING fraction of the corpus (a corpus with 1%
    * near-dups at 100 TB yields a pair graph in the low billions of
    * edges, most corpora far less; sf0.1 here yields 256 pairs), so the
    * operator must not pay iterative-distributed overhead on a graph
    * that fits in one task:
    *
    *  1. pairs are materialized (eager localCheckpoint) and counted —
    *     one cheap job on checkpointed blocks;
    *  2. if the edge count is at most `graft.cc.localMaxEdges` (default
    *     2^21) and the id type is plainly orderable, the edge list is
    *     collected and solved with a driver-side union-find: ZERO
    *     shuffles, two jobs, immune to per-job scheduler stalls — the
    *     variance that dominates an iterative loop on a loaded host;
    *  3. otherwise each partition union-finds the edges it holds
    *     (mapPartitions, no shuffle) and emits one (node -> local
    *     component min) star edge per node — contraction that both
    *     shrinks the edge set to at most one edge per node-occurrence
    *     and collapses every intra-partition path to depth 1 — and the
    *     min-label propagation loop runs on the contracted stars.
    *     Rounds = contracted diameter, typically 2 even for chain-shaped
    *     originals that would take O(chain) rounds uncontracted.
    *
    * Set `graft.cc.localMaxEdges=0` (spark conf) to force the
    * distributed path; `graft.cc.explicitGc=true` restores the old
    * post-loop `System.gc()` (the ContextCleaner only frees truncated
    * rounds' shuffle/checkpoint blocks after a driver GC, which a large
    * driver heap may defer for hours — but forcing a global GC inside a
    * library operator punishes co-tenant jobs, and is a no-op under
    * -XX:+DisableExplicitGC, so it is opt-in for long-lived sessions
    * that do not run their own collection discipline).
    *
    * Returns (id, label) for every node that appears in `pairs`.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxRounds: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    val idType = pairs.schema(aCol).dataType
    val localMax = spark.conf.getOption("graft.cc.localMaxEdges")
      .map(_.toLong).getOrElse(1L << 21)
    val edgesRaw = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint(true)
    val nEdges = edgesRaw.count()
    idOrdering(idType) match {
      case Some(ord) if nEdges <= localMax =>
        driverUnionFind(spark, edgesRaw.collect(), idType, ord)
      case Some(ord) =>
        minLabelLoop(contractEdges(edgesRaw, idType, ord), maxRounds)
      case None =>
        // exotic orderable id types (date, binary, ...): no typed
        // union-find kernel, but Spark's min() still orders them
        minLabelLoop(edgesRaw, maxRounds)
    }
  }

  /** Driver-ordering kernel for the common id types. Exotic types fall
    * back to the fully-distributed loop (None). */
  private def idOrdering(dt: org.apache.spark.sql.types.DataType)
      : Option[Ordering[Any]] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType =>
        Some(Ordering.by((x: Any) => x.asInstanceOf[Number].longValue()))
      case DoubleType | FloatType =>
        Some(Ordering.by((x: Any) => x.asInstanceOf[Number].doubleValue()))
      case _: DecimalType =>
        Some(Ordering.by((x: Any) => BigDecimal(x.asInstanceOf[java.math.BigDecimal])))
      case StringType =>
        Some(Ordering.by((x: Any) => x.asInstanceOf[String]))
      case _ => None
    }
  }

  /** Union-find with path halving; roots chosen by `ord` min so the
    * final parent IS the component label with no second pass. */
  private final class UnionFind(ord: Ordering[Any]) {
    private val parent = new java.util.HashMap[Any, Any]()
    def find(x0: Any): Any = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (ord.compare(p, x) != 0) {
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp) // path halving
        x = p; p = gp
      }
      x
    }
    def union(a: Any, b: Any): Unit = {
      val ra = find(a); val rb = find(b)
      val c = ord.compare(ra, rb)
      if (c < 0) parent.put(rb, ra)
      else if (c > 0) parent.put(ra, rb)
    }
    def touch(x: Any): Unit = if (!parent.containsKey(x)) parent.put(x, x)
    def entries(): Iterator[(Any, Any)] = {
      val keys = new java.util.ArrayList[Any](parent.keySet())
      import scala.jdk.CollectionConverters._
      keys.iterator().asScala.map(k => (k, find(k)))
    }
  }

  /** Tier-2 finish: solve the whole graph in the driver. The edge list
    * is bounded by the caller's count gate, so this is a bounded collect
    * (the same contract as the centroid/top-k collects elsewhere), not a
    * driver-side loop over corpus data. */
  private def driverUnionFind(spark: org.apache.spark.sql.SparkSession,
                              rows: Array[org.apache.spark.sql.Row],
                              idType: org.apache.spark.sql.types.DataType,
                              ord: Ordering[Any]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val uf = new UnionFind(ord)
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      uf.touch(r.get(0)); uf.touch(r.get(1))
      uf.union(r.get(0), r.get(1))
      i += 1
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](rows.length)
    uf.entries().foreach { case (id, root) =>
      out.add(org.apache.spark.sql.Row(id, root))
    }
    spark.createDataFrame(out,
      StructType(Seq(StructField("id", idType), StructField("label", idType))))
  }

  /** Tier-3 contraction: per-partition union-find over whatever edges the
    * partition holds — one scan, NO shuffle — emitting one
    * (id, local component min) star edge per locally-seen node. CC of
    * the union of the stars equals CC of the original graph (each star
    * preserves its partition's connectivity; shared nodes stitch stars
    * across partitions), but paths inside a partition collapse to depth
    * 1 and the loop below starts from at most one edge per node
    * occurrence instead of the full pair list. */
  private def contractEdges(edgesRaw: DataFrame,
                            idType: org.apache.spark.sql.types.DataType,
                            ord: Ordering[Any]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val schema = StructType(Seq(
      StructField("src", idType), StructField("dst", idType)))
    val star = edgesRaw.rdd.mapPartitions { it =>
      val uf = new UnionFind(ord)
      it.foreach { r =>
        uf.touch(r.get(0)); uf.touch(r.get(1))
        uf.union(r.get(0), r.get(1))
      }
      uf.entries().map { case (id, root) => org.apache.spark.sql.Row(id, root) }
    }
    edgesRaw.sparkSession.createDataFrame(star, schema)
  }

  /** Min-label propagation (the fully-distributed tier): each round is
    * one join + one min-aggregate shuffle on the edge list; stops when
    * no label changed. Rounds = graph diameter — 2-3 for contracted
    * star graphs. */
  private def minLabelLoop(pairs: DataFrame, maxRounds: Int): DataFrame = {
    val edges = pairs.select(col("src"), col("dst"))
      .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .cache()
    // eager localCheckpoint, not cache(): the round-1 reassignment drops
    // the only operator-held reference, so a cache entry here could
    // never be unpersisted (edges CAN be, at the bottom — it lives for
    // the whole loop). Same GC-managed-blocks trade as the per-round
    // checkpoints below.
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    // Convergence detection without a per-round join: labels only DECREASE
    // under min-propagation and the id set is fixed, so the label sum
    // strictly decreases iff any label changed. One 1-row aggregate per
    // round (which also materializes the round's cache) replaces the old
    // join+filter+count change probe — at scale that join was a full extra
    // shuffle of the label relation per round. decimal(38,0) keeps the sum
    // exact for arbitrary 64-bit ids (a wrapped long sum could collide).
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO) // empty pair set -> null sum
    // the sum probe is only sound for numeric ids (a non-numeric label
    // casts to NULL and every round would sum to zero = instant false
    // convergence); other id types take a per-round changed-row probe —
    // one extra join, but correct for any orderable type
    val numericIds = labels.schema("label").dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    def anyChanged(next: DataFrame, prev: DataFrame): Boolean =
      next.select(col("id"), col("label").as("_ln"))
        .join(prev.select(col("id"), col("label").as("_lp")), "id")
        .filter(col("_ln") =!= col("_lp")).limit(1).count() > 0
    var prevSum = if (numericIds) labelSum(labels) else null
    var changed = true
    var rounds = 0
    while (changed && rounds < maxRounds) {
      val byDst = labels.select(col("id").as("dst"), col("label"))
      val neighbor = edges.join(byDst, "dst").select(col("src").as("id"), col("label"))
      // localCheckpoint (eager), NOT cache: each round's plan must start
      // from the materialized blocks, not stack onto the previous
      // round's. With cache() the final labels carried a rounds-deep
      // union/groupBy lineage tower whose ShuffleDependencies stayed
      // registered as long as any reference lived — the iterative-Spark
      // leak (GraphX's Pregel checkpoints for exactly this reason),
      // measured here as same-JVM reruns degrading 4s -> 13s -> 17s.
      val next = labels.union(neighbor)
        .groupBy("id").agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      changed =
        if (numericIds) {
          val curSum = labelSum(next)
          val c = curSum.compareTo(prevSum) != 0
          prevSum = curSum
          c
        } else anyChanged(next, labels)
      labels = next
      rounds += 1
    }
    edges.unpersist()
    // ContextCleaner frees the truncated rounds' shuffle/checkpoint
    // blocks only after a driver GC; opt-in (see scaladoc above) because
    // a forced global GC inside a library operator punishes co-tenants
    // and silently no-ops under -XX:+DisableExplicitGC.
    if (pairs.sparkSession.conf.getOption("graft.cc.explicitGc").contains("true"))
      System.gc()
    labels
  }

  /** Near-duplicate CLUSTERS — the canonical-representative step a real
    * dedup pipeline runs after pair finding: MinHash-LSH pairs ->
    * connected components -> every document labeled with its cluster's
    * min doc id, cluster size, and whether it is the kept canonical.
    * Docs in no pair are their own singleton cluster. One window shuffle
    * for sizes on top of the component rounds.
    */
  def clusters(df: DataFrame, textCol: String, idCol: String,
               threshold: Double, bands: Int = 32,
               rowsPerBand: Int = 4): DataFrame = {
    val pairs = minhashLsh(df, textCol, idCol, bands = bands,
      rowsPerBand = rowsPerBand, threshold = threshold).select("id_a", "id_b")
    val comp = connectedComponents(pairs, "id_a", "id_b")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
    df.select(col(idCol).as("doc_id"))
      .join(comp.select(col("id").as("doc_id"), col("label")), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("label"), col("doc_id")))
      .drop("label")
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
      .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
  }

  /** Quality-aware canonical selection — the retention policy step after
    * near-dup clustering: instead of keep-lowest-id, each cluster keeps
    * its HIGHEST-scoring member (id ascending on ties), the policy a
    * training-data pipeline actually wants (near-dups differ in
    * boilerplate, truncation, encoding damage — the best-quality copy
    * is the one to train on).
    *
    * `clusters` is a (id, cluster_id) labeling ([[Dedup.clusters]]'
    * output shape); `scores` a (id, score) relation. The winner is a
    * PARTITIONED window per cluster — parallel at any scale (clusters
    * are bounded by the near-dup guard upstream, and the window key is
    * the cluster id, never a global order). */
  def keepBest(clusters: DataFrame, scores: DataFrame,
               idCol: String, scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(col(scoreCol).desc, col(idCol))
    clusters.join(scores, Seq(idCol))
      .withColumn("is_kept", row_number().over(w) === 1)
      .select(col(idCol), col("cluster_id"), col(scoreCol), col("is_kept"))
  }

  // ----------------------------------------------------- decontamination

  /** Benchmark decontamination — the training-data step that flags
    * documents overlapping an evaluation set (the GPT-2/GPT-3 recipe:
    * word n-gram collision against the benchmark, n=8 by default).
    *
    * Scale shape: the benchmark side is an eval set — thousands of docs,
    * not billions — so its distinct gram set BROADCASTS; the corpus side
    * is one tokenize scan, a map-side broadcast join, and a partial
    * aggregate, so the only shuffle carries one row per document. A doc
    * shorter than n tokens contributes its whole token sequence as a
    * single gram (the shingle convention above, mirrored in the oracle).
    *
    * Output: (doc_id, n_grams, n_overlap, contaminated) per corpus doc.
    */
  /** Distinct word n-grams of a pre-projected token array (short docs
    * emit their whole token sequence as one gram). ONE definition shared
    * by [[decontaminate]] and [[decontaminateBloom]] — their
    * bit-identical-output guarantee depends on the gram rule never
    * diverging between them.
    *
    * The token array MUST be projected to its own column before this
    * transform lambda touches it: an expression inside a higher-order
    * function is outside codegen's subexpression elimination, so an
    * inline split() would re-tokenize the document once PER GRAM —
    * O(tokens^2) per doc (measured 7s -> 0.5s at sf0.1). */
  private def wordGrams(toks: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n)))))

  def decontaminate(docs: DataFrame, benchmark: DataFrame,
                    textCol: String, idCol: String, n: Int = 8): DataFrame = {
    def grams(toks: Column): Column = wordGrams(toks, n)
    val bGrams = benchmark
      .select(graft.text.TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(explode(grams(col("_toks"))).as("gram"))
      .distinct()
      .withColumn("_hit", lit(1))
    // n_grams is COUNTED after the explode rather than carried as a
    // size(_g) column: consuming the gram array twice (size + explode)
    // makes the optimizer inline and re-evaluate the whole gram pipeline
    // per consumer (measured 4s -> 0.6s at sf0.1). The count is exact
    // because the array is distinct and never empty (short docs emit one
    // whole-sequence gram).
    val exploded = docs
      .select(col(idCol).as("doc_id"),
        graft.text.TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), explode(grams(col("_toks"))).as("gram"))
    exploded.join(broadcast(bGrams), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_grams"),
        coalesce(sum(col("_hit")), lit(0L)).cast("long").as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  /** [[decontaminate]] for the regime its broadcast assumption breaks:
    * a benchmark whose distinct gram set is too large to ship to every
    * executor as an exact set (a full held-out SHARD, not a thousand-doc
    * eval suite). Same output, bit-identical — the approximation is
    * confined to a pre-filter that can only ADD work, never change the
    * answer:
    *
    *  1. build a Bloom filter over the benchmark grams (`fpp` at the
    *     measured cardinality; ~1.2 GB of bits covers 10⁹ grams at 1% —
    *     broadcastable where the exact set is not);
    *  2. ONE corpus scan aggregates per doc: the exact gram count, plus
    *     `collect_set` of only the grams the filter might contain — so
    *     the shuffle carries one row per doc whose payload is the
    *     candidate grams (true hits + fpp·grams), not the corpus;
    *  3. the candidates then join the exact benchmark gram relation
    *     (shuffled join — the benchmark side is big, that is the
    *     premise) to kill the false positives.
    *
    * The gate is a deliberate Scala UDF: the value it filters is an
    * exploded STRING gram, the work per row is one xxhash pass — the
    * same arithmetic a native might_contain expression would do — and
    * it sits map-side on a column that exists only transiently, so
    * nothing upstream leaves codegen. Exactness does not depend on the
    * filter at all (a degenerate all-true filter just shuffles more),
    * which DedupSpec pins by forcing fpp to saturation. */
  def decontaminateBloom(docs: DataFrame, benchmark: DataFrame,
                         textCol: String, idCol: String, n: Int = 8,
                         fpp: Double = 0.01): DataFrame = {
    def grams(toks: Column): Column = wordGrams(toks, n)
    // the benchmark gram relation is consumed three times (cardinality
    // count, bloom build, confirm join) — materialize it once rather
    // than re-tokenizing the benchmark per consumer
    val bGrams = benchmark
      .select(graft.text.TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(explode(grams(col("_toks"))).as("gram"))
      .distinct()
      .localCheckpoint(true)
    val nb = math.max(bGrams.count(), 1L)
    val bf = bGrams.stat.bloomFilter("gram", nb, fpp)
    val bfB = docs.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((g: String) => bfB.value.mightContainString(g))
    val perDoc = docs
      .select(col(idCol).as("doc_id"),
        graft.text.TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), explode(grams(col("_toks"))).as("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_grams"),
        // collect_set skips nulls: non-candidates vanish map-side
        collect_set(when(mightContain(col("gram")), col("gram"))).as("_cand"))
    perDoc
      .select(col("doc_id"), col("n_grams"), explode_outer(col("_cand")).as("gram"))
      .join(bGrams.withColumn("_hit", lit(1)), Seq("gram"), "left")
      .groupBy("doc_id", "n_grams")
      .agg(coalesce(sum(col("_hit")), lit(0L)).cast("long").as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
      .select("doc_id", "n_grams", "n_overlap", "contaminated")
  }

  // -------------------------------------------- exact-substring spans

  /** Span-level exact-substring duplicate report — the ExactSubstr shape
    * of "Deduplicating Training Data Makes Language Models Better" (Lee
    * et al. 2022) at word-token granularity: every n-token window of
    * every document is hashed, a window whose hash occurs more than once
    * in the corpus (in ANY document, including its own) is a duplicated
    * span, and per document the overlapping spans merge into maximal
    * intervals (gaps-and-islands) so the duplicated-token coverage is
    * counted once per token.
    *
    * Scale shape: ONE corpus scan explodes to O(total tokens) span rows
    * carrying only (doc_id, start, 16-byte md5) — never the span text.
    * The occurrence count is a WINDOW over span_hash, not an aggregate
    * joined back: the join form re-scans and re-tokenizes the whole
    * corpus for its second side (the bm25 double-scan defect class), and
    * at scale the duplicate-hash set is too large to assume broadcast —
    * the sort-merge join would shuffle the spans by hash anyway. The
    * window form pays that same by-hash shuffle once and skips the
    * second scan entirely. The interval merge is then a per-document
    * window bounded by document length. No stage is quadratic in corpus
    * size.
    *
    * Output: one row per document that contains at least one duplicated
    * span — (doc_id, n_tokens, n_dup_spans, n_intervals, dup_tokens,
    * dup_ratio). Consumers drop docs above a ratio threshold or cut the
    * reported intervals out of the text.
    */
  /** Per-doc merged intervals of corpus-duplicated n-token spans:
    * (doc_id, n_tokens, _island, _spans, _is, _ie) with [_is, _ie]
    * 0-based inclusive token positions. Shared by the duplication
    * REPORT ([[substringSpans]]) and the REMOVAL form
    * ([[substringScrub]]). */
  private def spanIslands(df: DataFrame, textCol: String, idCol: String,
                          n: Int): DataFrame = {
    val toks = graft.text.TextAnalysis.tokens(col(textCol))
    // the docs-shorter-than-n guard is a `when` INSIDE the posexplode
    // argument (empty array -> zero rows), NOT a .filter: a filter on
    // size(tokens(text)) is pushed below the spread exchange by Catalyst
    // and re-runs the whole tokenize serially in the narrow scan stage
    val spans = graft.Tables.spread(df)
      .select(col(idCol).as("doc_id"), toks.as("_t"))
      .select(col("doc_id"), size(col("_t")).cast("long").as("n_tokens"),
        posexplode(when(size(col("_t")) >= n, transform(
            sequence(lit(0), size(col("_t")) - n),
            i => md5(concat_ws(" ", slice(col("_t"), i + 1, lit(n))).cast("binary"))))
          .otherwise(array().cast("array<string>")))
          .as(Seq("start", "span_hash")))
    // gaps-and-islands: a span starting at s covers tokens [s, s+n-1];
    // a span opens a new interval iff it starts past every prior end
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    spans
      .withColumn("_occ", count(lit(1)).over(Window.partitionBy(col("span_hash"))))
      .filter(col("_occ") > 1)
      .withColumn("_prev_end", max(col("start") + (n - 1))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_new",
        when(col("_prev_end").isNull || col("start") > col("_prev_end"), 1L)
          .otherwise(0L))
      .withColumn("_island", sum(col("_new")).over(byDoc))
      .groupBy(col("doc_id"), col("n_tokens"), col("_island"))
      .agg(count(lit(1)).as("_spans"),
        min(col("start")).as("_is"), (max(col("start")) + (n - 1)).as("_ie"))
  }

  def substringSpans(df: DataFrame, textCol: String, idCol: String,
                     n: Int = 8): DataFrame =
    spanIslands(df, textCol, idCol, n)
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(sum(col("_spans")).as("n_dup_spans"),
        count(lit(1)).as("n_intervals"),
        sum(col("_ie") - col("_is") + 1).cast("long").as("dup_tokens"))
      .withColumn("dup_ratio",
        floor(col("dup_tokens").cast("double") / col("n_tokens") * 1e6 + 0.5) / 1e6)

  /** Exact-substring REMOVAL (the action to [[substringSpans]]'s
    * report): every token covered by a corpus-duplicated n-token span is
    * cut — ALL occurrences, as in the released ExactSubstr tool (keeping
    * one canonical occurrence needs a global tie-break across docs; cut-
    * all is deterministic, order-free, and the published behavior). One
    * row per doc: original/kept token counts and the scrubbed text in
    * token space (single-space joined — removal operates on the token
    * stream, so reconstruction does too).
    *
    * Scale shape: the interval relation is doc_id-keyed and SMALL (only
    * docs with duplicated spans, a handful of intervals each), so the
    * join back to the corpus is a plain equi-join Spark can
    * broadcast/shuffle as stats dictate; reconstruction is a map-only
    * indexed-lambda filter over the token array — no second window, no
    * extra shuffle beyond the interval computation itself. */
  def substringScrub(df: DataFrame, textCol: String, idCol: String,
                     n: Int = 8): DataFrame = {
    val iv = spanIslands(df, textCol, idCol, n)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("_is"), col("_ie"))).as("_ivs"))
    val toks = graft.text.TextAnalysis.tokens(col(textCol))
    graft.Tables.spread(df)
      .select(col(idCol).as("doc_id"), toks.as("_t"))
      .join(iv, Seq("doc_id"), "left")
      .withColumn("_kept",
        when(col("_ivs").isNull, col("_t")).otherwise(
          filter(col("_t"), (_, i) =>
            !exists(col("_ivs"),
              v => i >= v.getField("_is") && i <= v.getField("_ie")))))
      .select(col("doc_id"),
        coalesce(size(col("_t")), lit(0)).cast("long").as("n_tokens"),
        coalesce(size(col("_kept")), lit(0)).cast("long").as("kept_tokens"),
        concat_ws(" ", col("_kept")).as("scrub_text"))
  }

  // -------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-duplicate pairs. Exact all-pairs with id
    * ordering; at scale swap the crossJoin for [[Similarity.cosineLsh]]
    * bucketing — same verify step.
    */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String,
                       threshold: Double): DataFrame = {
    // probe side spread: single-file inputs are one partition, and the
    // broadcast nested-loop join would run all O(n^2) cosines serially
    val a = graft.Tables.spread(df.select(col(idCol).as("id_a"), col(vecCol).as("_va")))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("_vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", round(VectorFunctions.cosine(col("_va"), col("_vb")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
