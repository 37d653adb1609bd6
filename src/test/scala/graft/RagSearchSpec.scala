package graft

import graft.embed.HashEmbedder
import graft.functions.SetFunctions
import graft.ingest.IngestPipeline
import graft.query.RagSearch
import org.apache.spark.sql.functions._

class RagSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embedder = HashEmbedder(dim = 32)
  private lazy val collection =
    IngestPipeline.ingestDocuments(Tables.documents(spark, sf).limit(100), embedder)
      .cache()

  test("search_for_rag returns typed hits with metadata, ascending distance") {
    val res = RagSearch.searchForRag(collection, "fast hash join query",
      embedder.encodeOne, nResults = 4)
    assert(res.error.isEmpty)
    assert(res.totalResults == 4 && res.results.size == 4)
    val ds = res.results.map(_.distance)
    assert(ds == ds.sorted)
    assert(res.results.head.metadata.contains("chunk_id"))
  }

  test("empty query guarded without running a job") {
    val res = RagSearch.searchForRag(collection, "   ", embedder.encodeOne)
    assert(res.totalResults == 0 && res.error.contains("Query text is required"))
  }

  test("where filter restricts candidates before ranking") {
    val res = RagSearch.searchForRag(collection, "query", embedder.encodeOne,
      nResults = 50, whereJson = Some("""{"doc_id": {"$lt": 10}}"""))
    assert(res.results.nonEmpty)
    assert(res.results.forall(_.metadata("doc_id").toLong < 10))
  }

  test("context_for_rag assembles capped context with source headers") {
    val ctx = RagSearch.contextForRag(collection, "vector data", embedder.encodeOne,
      maxContextLength = 2000)
    assert(ctx.nonEmpty && ctx.length <= 2000 + 5 * 10) // pieces capped; separators uncounted (reference semantics)
    assert(ctx.startsWith("[Source: "))
  }

  test("sorted intersect size matches array_intersect semantics") {
    val df = Seq(
      (Array(1L, 3L, 5L, 9L), Array(2L, 3L, 9L, 11L)),
      (Array.empty[Long], Array(1L, 2L)),
      (Array(4L), Array(4L))
    ).toDF("a", "b")
    val got = df.select(SetFunctions.sortedIntersectSize($"a", $"b")).as[Int].collect().toSeq
    assert(got == Seq(2, 0, 1))
    val viaBuiltin = df.select(size(array_intersect($"a", $"b"))).as[Int].collect().toSeq
    assert(got == viaBuiltin)
  }
}
