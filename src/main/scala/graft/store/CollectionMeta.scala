package graft.store

/** Collection-level USER metadata — the Chroma `collection.metadata` /
  * `collection.modify(metadata=...)` surface (the reference's bound
  * client API carries it even though the ingester itself only sets a
  * collection name, /root/reference/src/PDFToChromaIngester.py:29-33):
  * arbitrary string key-values describing the collection (owner,
  * description, hnsw tuning hints, ...), persisted as a
  * `_collection.properties` sidecar inside the collection directory —
  * `_`-prefixed like the embedder manifest, so Spark's parquet listing
  * never sees it; it travels with [[VectorStore.rename]] (directory
  * move) and is copied by [[VectorStore.fork]] and both compaction
  * paths.
  *
  * `modify(metadata=...)` REPLACES the whole map (Chroma's documented
  * semantics), it does not merge — [[VectorStore.modify]] follows that.
  */
object CollectionMeta {
  /** Sidecar file name (`_`-prefixed: invisible to Spark listings). */
  val FileName = "_collection.properties"

  private[store] def write(collectionDir: String,
                           meta: Map[String, String]): Unit = {
    val props = new java.util.Properties()
    meta.foreach { case (k, v) => props.setProperty(k, v) }
    // atomic: a direct in-place overwrite torn by a crash would
    // Properties.load WITHOUT ERROR as a partial map — silent loss
    StoreFs.forPath(collectionDir).writePropsAtomic(
      s"$collectionDir/$FileName", props, "graft collection metadata")
  }

  private[store] def read(collectionDir: String): Map[String, String] =
    StoreFs.forPath(collectionDir)
      .readProps(s"$collectionDir/$FileName")
      .fold(Map.empty[String, String]) { props =>
        import scala.jdk.CollectionConverters._
        props.stringPropertyNames().asScala
          .map(k => k -> props.getProperty(k)).toMap
      }
}
