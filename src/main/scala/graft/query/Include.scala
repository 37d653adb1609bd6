package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The Chroma `include=[...]` result-projection parameter
  * (`collection.get(include=...)` / `collection.query(include=...)` in
  * the client API the reference binds): results carry ids ALWAYS, plus
  * only the requested field groups —
  *
  *  - `"documents"`  → the content column,
  *  - `"embeddings"` → the vector column (excluded by Chroma's default
  *    precisely because hauling vectors a caller will not use is the
  *    dominant result-transfer cost — at scale this projection is also
  *    column PRUNING: dropped groups never leave the parquet scan),
  *  - `"metadatas"`  → every other payload column,
  *  - `"distances"`  → the query-shape distance column.
  *
  * Column-name mapping is explicit because this engine's collections
  * are plain relational schemas, not Chroma's fixed four-slot record:
  * the caller names which column plays "document" / "embedding" /
  * "distance"; everything else is "metadatas". Applied BEFORE an
  * action, the select reaches Catalyst's column pruner, so
  * `include=["documents"]` on a stored collection physically skips the
  * embedding pages on disk. */
object Include {

  val Known: Set[String] = Set("documents", "embeddings", "metadatas", "distances")

  /** Chroma's default for `get`: documents + metadatas (no embeddings). */
  val GetDefault: Seq[String] = Seq("documents", "metadatas")

  /** Chroma's default for `query`: documents + metadatas + distances. */
  val QueryDefault: Seq[String] = Seq("documents", "metadatas", "distances")

  def project(df: DataFrame, idCol: String, include: Seq[String],
              documentCol: Option[String] = None,
              embeddingCol: Option[String] = None,
              distanceCol: Option[String] = None): DataFrame = {
    val unknown = include.filterNot(Known)
    require(unknown.isEmpty,
      s"unknown include entries: ${unknown.mkString(", ")} " +
        s"(known: ${Known.toSeq.sorted.mkString(", ")})")
    require(df.columns.contains(idCol), s"id column '$idCol' not in result " +
      s"(${df.columns.mkString(", ")})")
    val inc = include.toSet
    // asking for a group the result shape cannot supply is a caller bug —
    // silently returning fewer columns would corrupt downstream schemas
    def requireCol(group: String, c: Option[String]): Unit =
      require(!inc(group) || c.exists(df.columns.contains),
        s"include=[$group] but this result carries no $group column" +
          c.fold("")(n => s" ('$n' absent)"))
    requireCol("documents", documentCol)
    requireCol("embeddings", embeddingCol)
    requireCol("distances", distanceCol)
    val special = Set(idCol) ++ documentCol ++ embeddingCol ++ distanceCol
    val metaCols = df.columns.filterNot(special).toSeq
    def want(group: String, cols: Seq[String]): Seq[String] =
      if (inc(group)) cols else Nil
    val out = Seq(idCol) ++
      want("documents", documentCol.toSeq) ++
      want("metadatas", metaCols) ++
      want("embeddings", embeddingCol.toSeq) ++
      want("distances", distanceCol.toSeq)
    df.select(out.map(col): _*)
  }
}
