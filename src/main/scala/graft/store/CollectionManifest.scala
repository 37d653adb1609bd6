package graft.store

import graft.embed.{Embedder, EmbedderId, HashEmbedder, MlpEmbedder, TransformerEmbedder}

/** Embedder identity bound to a collection — the Spark analog of Chroma
  * binding the embedding function at create_collection
  * (/root/reference/src/PDFToChromaIngester.py:51-54): once a collection
  * is created, every append and every query MUST use the same embedding
  * space, or distances are silently garbage. The manifest persists as a
  * `_embedder.properties` sidecar inside the collection directory (the
  * leading underscore keeps it invisible to Spark's file listing, like
  * `_SUCCESS`), survives compaction, and lets a query session
  * verify-or-resolve the embedder without the caller re-stating it.
  *
  * `passagePrefix` / `queryPrefix` carry the asymmetric instruction
  * convention (reference: /root/reference/src/ChromaCloudIngester.py:52,181
  * — "passage: ..." on add, "query: ..." on search): one space, two text
  * conventions, so verification checks the space PLUS the side-appropriate
  * prefix.
  */
final case class CollectionManifest(family: String, resource: String,
                                    dim: Int,
                                    passagePrefix: String, queryPrefix: String,
                                    bpeMerges: Seq[(String, String)]) {

  /** Canonical serialization the fingerprint is computed over. Merge pairs
    * join with a space (BPE symbols never contain whitespace — they come
    * from whitespace tokenization) and entries with a comma. */
  def canonical: String =
    s"graft-embedder|$family|$resource|$dim|$passagePrefix|$queryPrefix|" +
      bpeMerges.map(p => p._1 + " " + p._2).mkString(",")

  /** SHA-256 hex of [[canonical]] — the one-value equality check engines
    * agree on (the DuckDB oracle recomputes it with sha256()). */
  def fingerprint: String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(canonical.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def passageId: EmbedderId = EmbedderId(family, resource, dim, passagePrefix, bpeMerges)
  def queryId: EmbedderId = EmbedderId(family, resource, dim, queryPrefix, bpeMerges)

  private def fail(side: String, got: EmbedderId, want: EmbedderId): Nothing =
    throw new IllegalArgumentException(
      s"embedder mismatch: collection is bound to $side embedder " +
        s"(family=${want.family}, resource=${want.resource}, dim=${want.dim}, " +
        s"prefix='${want.prefix}', merges=${want.bpeMerges.size}) but got " +
        s"(family=${got.family}, resource=${got.resource}, dim=${got.dim}, " +
        s"prefix='${got.prefix}', merges=${got.bpeMerges.size}) — " +
        "distances across embedding spaces are meaningless")

  /** Require `e` to be the collection's passage-side embedder (adds). */
  def verifyPassage(e: Embedder): Unit =
    if (e.identity != passageId) fail("passage", e.identity, passageId)

  /** Require `e` to be the collection's query-side embedder (searches). */
  def verifyQuery(e: Embedder): Unit =
    if (e.identity != queryId) fail("query", e.identity, queryId)

  private def resolve(prefix: String): Embedder = family match {
    case "hash"        => HashEmbedder(dim, prefix)
    case "mlp"         => MlpEmbedder(resource)
    case "transformer" => TransformerEmbedder(resource, prefix, bpeMerges)
    case f => throw new IllegalArgumentException(
      s"cannot resolve embedder family '$f' — pass the embedder explicitly")
  }

  /** Construct the query-side embedder from the manifest alone — the
    * "resolve" half of verify-or-resolve: a search session needs only the
    * store, never an out-of-band embedder object. */
  def resolveQueryEmbedder: Embedder = resolve(queryPrefix)

  /** Construct the passage-side embedder (incremental ingest sessions). */
  def resolvePassageEmbedder: Embedder = resolve(passagePrefix)
}

object CollectionManifest {
  /** Sidecar file name; `_`-prefixed paths are filtered by Spark/Hadoop
    * file listings, so parquet reads of the collection never see it. */
  val FileName = "_embedder.properties"

  /** Manifest of an asymmetric (passage, query) pair — must share one
    * embedding space, differing only in instruction prefix. */
  def of(passage: Embedder, query: Embedder): CollectionManifest = {
    val (p, q) = (passage.identity, query.identity)
    require(p.space == q.space,
      s"passage/query embedders are from different spaces: ${p.space} vs ${q.space}")
    CollectionManifest(p.family, p.resource, p.dim, p.prefix, q.prefix, p.bpeMerges)
  }

  /** Manifest of a symmetric embedder (same convention on both sides). */
  def single(e: Embedder): CollectionManifest = of(e, e)

  private[store] def write(collectionDir: String, m: CollectionManifest): Unit = {
    val props = new java.util.Properties()
    props.setProperty("family", m.family)
    props.setProperty("resource", m.resource)
    props.setProperty("dim", m.dim.toString)
    props.setProperty("passagePrefix", m.passagePrefix)
    props.setProperty("queryPrefix", m.queryPrefix)
    // NUL separates the two symbols of a pair, SOH separates pairs —
    // both impossible inside BPE symbols (they come from whitespace
    // tokenization and carry no control chars); Properties escapes them
    // to \uXXXX on disk anyway
    props.setProperty("bpeMerges",
      m.bpeMerges.map(p => p._1 + "\u0000" + p._2).mkString("\u0001"))
    props.setProperty("fingerprint", m.fingerprint)
    StoreFs.forPath(collectionDir).writePropsAtomic(
      s"$collectionDir/$FileName", props,
      "graft collection embedder manifest")
  }

  private[store] def read(collectionDir: String): Option[CollectionManifest] = {
    val propsOpt = StoreFs.forPath(collectionDir)
      .readProps(s"$collectionDir/$FileName")
    if (propsOpt.isEmpty) return None
    val props = propsOpt.get
    val mergesRaw = Option(props.getProperty("bpeMerges")).getOrElse("")
    val merges =
      if (mergesRaw.isEmpty) Nil
      else mergesRaw.split("\u0001", -1).toSeq.map { pair =>
        val i = pair.indexOf('\u0000')
        (pair.substring(0, i), pair.substring(i + 1))
      }
    val m = CollectionManifest(
      props.getProperty("family", ""), props.getProperty("resource", ""),
      props.getProperty("dim", "0").toInt,
      props.getProperty("passagePrefix", ""), props.getProperty("queryPrefix", ""),
      merges)
    // a corrupted/hand-edited sidecar must not silently bind the wrong
    // space — the stored fingerprint re-verifies the canonical fields
    val stored = props.getProperty("fingerprint", "")
    require(stored == m.fingerprint,
      s"corrupt manifest at $collectionDir/$FileName: " +
        s"stored fingerprint $stored != recomputed ${m.fingerprint}")
    Some(m)
  }
}
