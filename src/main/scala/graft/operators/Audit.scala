package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus integrity audit — the pre-flight checks a pipeline runs before
  * burning compute on a corpus: referential integrity between the text
  * and embedding tables, and vector hygiene (dimension drift, zero-norm
  * vectors that break cosine, NaN poison).
  *
  * Scale shape: one map-side aggregate pass per table (no shuffle wider
  * than the 1-row partials) plus ONE slim id-only full outer join for
  * the two orphan directions — no text or vectors ever cross a shuffle.
  * Output is a tall (check_name, n) relation so new checks extend
  * without schema changes.
  */
object Audit {
  def corpusAudit(docs: DataFrame, emb: DataFrame,
                  docId: String = "doc_id", textCol: String = "text",
                  vecId: String = "vec_id", vecCol: String = "embedding",
                  dim: Int = 64): DataFrame = {
    val ref = docs.select(col(docId).as("_id")).withColumn("_d", lit(1))
      .join(emb.select(col(vecId).as("_id")).withColumn("_e", lit(1)),
        Seq("_id"), "full")
      .agg(count(when(col("_e").isNull, 1)).as("docs_without_embedding"),
        count(when(col("_d").isNull, 1)).as("embeddings_without_doc"))
    val docStats = docs.agg(
      count(lit(1)).as("docs_total"),
      (count(lit(1)) - countDistinct(col(docId))).as("duplicate_doc_ids"),
      count(when(length(trim(col(textCol))) === 0, 1)).as("empty_text"))
    val vecStats = emb.agg(
      count(lit(1)).as("embeddings_total"),
      count(when(size(col(vecCol)) =!= dim, 1)).as("dim_mismatch"),
      count(when(not(exists(col(vecCol), x => x =!= lit(0f))), 1))
        .as("zero_norm_vectors"),
      count(when(exists(col(vecCol), x => isnan(x)), 1)).as("nan_vectors"))
    docStats.crossJoin(vecStats).crossJoin(ref) // three 1-row frames
      .select(expr("""stack(9,
        'dim_mismatch', dim_mismatch,
        'docs_total', docs_total,
        'docs_without_embedding', docs_without_embedding,
        'duplicate_doc_ids', duplicate_doc_ids,
        'embeddings_total', embeddings_total,
        'embeddings_without_doc', embeddings_without_doc,
        'empty_text', empty_text,
        'nan_vectors', nan_vectors,
        'zero_norm_vectors', zero_norm_vectors) AS (check_name, n)"""))
      .orderBy("check_name")
  }

  /** Per-dimension distribution drift between a reference embedding slice
    * and a current one — the monitor a production pipeline runs when a
    * model upgrade, preprocessing change, or data-mix shift is suspected
    * of moving the embedding space (stale-centroid IVF routers and
    * similarity thresholds both silently degrade under drift).
    *
    * Scale shape: one map-side partial-agg pass per side, dim-bounded
    * output; vectors never cross a shuffle. Determinism: per-dim means go
    * through the 2^24 fixed-point BIGINT sum (trunc-toward-zero, the
    * trainer's discipline) so partial-agg merge order cannot shift a
    * mean; rounding to 6 decimals happens once, at the edge, floor-form.
    * Output: (pos, mean_ref, mean_cur, shift) — tall, one row per dim. */
  def embeddingDrift(ref: DataFrame, cur: DataFrame,
                     vecCol: String = "embedding"): DataFrame =
    driftJoin(meansFromPartials(dimPartials(ref, vecCol), "ref"),
      meansFromPartials(dimPartials(cur, vecCol), "cur"))

  private val Scale = 1L << 24

  /** The raw per-dim fixed-point partials (pos, _s, _n). Associative
    * BIGINT sums ⇒ this exact aggregation is also INCREMENTALLY
    * maintainable by the streaming engine (dim-bounded state) —
    * [[graft.streaming.DocStream.runStreamingDrift]] runs it verbatim on
    * a stream and rounds after the final trigger. */
  private[graft] def dimPartials(df: DataFrame, vecCol: String): DataFrame = df
    .select(posexplode(col(vecCol)).as(Seq("pos", "_x")))
    .groupBy(col("pos").cast("long").as("pos"))
    .agg(sum((col("_x").cast("double") * Scale).cast("long")).as("_s"),
      count(lit(1)).as("_n"))

  /** Round once, at the edge — floor-form 6 decimals. */
  private[graft] def meansFromPartials(partials: DataFrame, tag: String): DataFrame =
    partials.select(col("pos"),
      (floor(col("_s").cast("double") / col("_n") / Scale * 1e6 + lit(0.5)) / 1e6)
        .as(s"mean_$tag"))

  private[graft] def driftJoin(ref: DataFrame, cur: DataFrame): DataFrame =
    ref.join(cur, Seq("pos"))
      .withColumn("shift",
        floor(abs(col("mean_cur") - col("mean_ref")) * 1e6 + lit(0.5)) / 1e6)
      .orderBy("pos")
}
