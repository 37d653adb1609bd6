package graft.store

/** Per-collection streaming commit watermark — the exactly-once seam for
  * `foreachBatch` sinks that append into a stored index. Structured
  * Streaming guarantees a replayed micro-batch re-arrives with the SAME
  * `batchId`, so a sink that (1) skips batches at or below the recorded
  * watermark and (2) advances the watermark only AFTER its writes
  * commit turns at-least-once delivery into exactly-once effects. The
  * watermark file uses the marker discipline (tmp + atomic
  * overwrite-rename through [[StoreFs]]): readers see the old or the
  * new watermark, never a torn file — and a crash BETWEEN the append
  * and the commit is the documented window the sink's replay filter
  * self-heals (see `IndexStream.ivfBatchSink`). */
object StreamCommits {
  private val FileName = "_stream_commits.properties"

  /** The highest batchId whose effects are fully committed for
    * `name`; -1 when no batch ever committed. */
  def lastBatchId(store: VectorStore, name: String): Long =
    StoreFs.forPath(store.root)
      .readProps(s"${store.root}/$name/$FileName")
      .fold(-1L)(_.getProperty("lastBatchId", "-1").toLong)

  /** Record `batchId` as fully committed. Call AFTER the batch's
    * writes have committed — never before. */
  def commit(store: VectorStore, name: String, batchId: Long): Unit = {
    val props = new java.util.Properties()
    props.setProperty("lastBatchId", batchId.toString)
    StoreFs.forPath(store.root).writePropsAtomic(
      s"${store.root}/$name/$FileName", props,
      "graft streaming commit watermark")
  }
}
