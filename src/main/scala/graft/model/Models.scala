package graft.model

/** Typed public-API surface (the case-class boundary; pipelines stay
  * DataFrame-native internally).
  *
  * Shapes mirror the reference's result dicts:
  *  - SearchHit    = {content, metadata, distance, id}
  *    (/root/reference/src/PDFToChromaIngester.py:269-274)
  *  - SearchResult = {query, results, total_results, error?} (:276-287)
  *  - ChunkRecord  = the (id, document, metadata) add-tuple (:159-170) plus
  *    its embedding
  *  - CollectionStats = {total_documents, collection_name} (:237-247)
  *  - IngestReport per-source success tally (:207-223, :364-378)
  */
final case class ChunkRecord(
    id: String,
    docId: Long,
    chunkId: String,
    chunkIndex: Int,
    totalChunks: Int,
    chunk: String,
    embedding: Array[Float])

final case class SearchHit(
    content: String,
    metadata: Map[String, String],
    distance: Double,
    id: String)

final case class SearchResult(
    query: String,
    results: Seq[SearchHit],
    totalResults: Int,
    error: Option[String] = None)

final case class CollectionStats(totalDocuments: Long, collectionName: String)

final case class IngestReport(source: String, nDocs: Long, nSuccess: Long, nFailed: Long)
