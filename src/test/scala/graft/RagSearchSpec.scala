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

  test("where_document filter restricts by content; composes with where as a conjunction") {
    val res = RagSearch.searchForRag(collection, "query", embedder.encodeOne,
      nResults = 50, whereDocumentJson = Some("""{"$contains": "data"}"""))
    assert(res.results.nonEmpty)
    assert(res.results.forall(_.content.contains("data")))
    val both = RagSearch.searchForRag(collection, "query", embedder.encodeOne,
      nResults = 50, whereJson = Some("""{"doc_id": {"$lt": 10}}"""),
      whereDocumentJson = Some("""{"$not_contains": "data"}"""))
    assert(both.results.forall(h =>
      h.metadata("doc_id").toLong < 10 && !h.content.contains("data")))
    // bad operator surfaces through the defensive error contract
    val bad = RagSearch.searchForRag(collection, "query", embedder.encodeOne,
      whereDocumentJson = Some("""{"$regex": "x"}"""))
    assert(bad.error.exists(_.contains("where_document")))
  }

  test("parseDocument: nested and/or semantics against a literal truth table") {
    import graft.query.WhereDsl
    val docs = Seq((1L, "alpha data stream"), (2L, "alpha data hash"),
      (3L, "alpha data"), (4L, "plain text")).toDF("id", "text")
    val got = docs.filter(WhereDsl.parseDocument(
        """{"$and":[{"$contains":"data"},{"$or":[{"$contains":"stream"},{"$not_contains":"hash"}]}]}""",
        col("text")))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L)) // 2 killed by hash-without-stream, 4 by no data
    // empty clauses get the DSL's error contract, not a bare empty.reduce
    Seq("{}", """{"$and": []}""", """{"$or": []}""").foreach { bad =>
      val ex = intercept[IllegalArgumentException] {
        WhereDsl.parseDocument(bad, col("text"))
      }
      assert(ex.getMessage.contains("must not be empty"), s"for $bad: $ex")
    }
  }

  test("context_for_rag assembles capped context with source headers") {
    val ctx = RagSearch.contextForRag(collection, "vector data", embedder.encodeOne,
      maxContextLength = 2000)
    assert(ctx.nonEmpty && ctx.length <= 2000 + 5 * 10) // pieces capped; separators uncounted (reference semantics)
    assert(ctx.startsWith("[Source: "))
  }

  test("jaccardAtLeast agrees with exact jaccard on random sorted sets") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 300).map { _ =>
      val a = (0 until rng.nextInt(60)).map(_ => rng.nextInt(80).toLong).distinct.sorted.toArray
      val b = (0 until rng.nextInt(60)).map(_ => rng.nextInt(80).toLong).distinct.sorted.toArray
      (a, b)
    }
    val df = rows.toDF("a", "b")
    for (t <- Seq(0.2, 0.5, 0.8)) {
      val got = df.select(SetFunctions.jaccardAtLeast($"a", $"b", t)).as[Boolean].collect()
      rows.zip(got).foreach { case ((a, b), res) =>
        val inter = a.toSet.intersect(b.toSet).size
        val uni = a.toSet.union(b.toSet).size
        // uni==0 -> required count 0 -> vacuously true (never occurs for
        // shingle sets, which are non-empty by construction)
        val expect = if (uni == 0) true else inter.toDouble / uni >= t - 1e-12
        assert(res == expect, s"t=$t a=${a.toList} b=${b.toList}")
      }
    }
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

  // --- embedder-bound collections (Chroma binds the embedding function at
  // create_collection, reference PDFToChromaIngester.py:51-54; the manifest
  // is our persisted form of that binding) ---

  private def boundStore(): (graft.store.VectorStore, graft.embed.Embedder, graft.embed.Embedder) = {
    val root = java.nio.file.Files.createTempDirectory("graft_bound_spec").toString
    val store = graft.store.VectorStore(root)
    val (pe, qe) = graft.embed.Embedders.asymmetric(p => HashEmbedder(32, p))
    val coll = IngestPipeline.ingestDocuments(Tables.documents(spark, sf).limit(60), pe)
    store.create("docs", coll, manifest = Some(graft.store.CollectionManifest.of(pe, qe)))
    (store, pe, qe)
  }

  test("bound search resolves the query embedder from the manifest alone") {
    val (store, _, qe) = boundStore()
    try {
      val viaManifest = RagSearch.searchBound(spark, store, "docs", "fast hash join query")
      assert(viaManifest.error.isEmpty && viaManifest.results.nonEmpty)
      // identical to a direct search with the true query-side embedder —
      // the resolve path reconstructs the same embedding space + prefix
      val direct = RagSearch.searchForRag(store.read(spark, "docs"),
        "fast hash join query", qe.encodeOne)
      assert(viaManifest.results.map(h => (h.id, h.distance)) ==
        direct.results.map(h => (h.id, h.distance)))
    } finally store.destroy()
  }

  test("bound search rejects a mismatched embedder instead of returning garbage distances") {
    val (store, pe, qe) = boundStore()
    try {
      // wrong space (different dim)
      val wrongDim = intercept[IllegalArgumentException] {
        RagSearch.searchBound(spark, store, "docs", "q", embedder = Some(HashEmbedder(64, "query: ")))
      }
      assert(wrongDim.getMessage.contains("embedder mismatch"))
      // right space, wrong side: the PASSAGE embedder must not run queries
      // (asymmetric prefix conventions are part of the identity)
      val wrongSide = intercept[IllegalArgumentException] {
        RagSearch.searchBound(spark, store, "docs", "q", embedder = Some(pe))
      }
      assert(wrongSide.getMessage.contains("embedder mismatch"))
      // the matching query embedder passes verification
      val ok = RagSearch.searchBound(spark, store, "docs", "query text", embedder = Some(qe))
      assert(ok.error.isEmpty && ok.results.nonEmpty)
    } finally store.destroy()
  }

  test("bound search on an unbound collection fails loudly, not silently") {
    val root = java.nio.file.Files.createTempDirectory("graft_unbound_spec").toString
    val store = graft.store.VectorStore(root)
    try {
      store.create("plain", IngestPipeline.ingestDocuments(
        Tables.documents(spark, sf).limit(10), HashEmbedder(32, "passage: ")))
      val e = intercept[IllegalArgumentException] {
        RagSearch.searchBound(spark, store, "plain", "q")
      }
      assert(e.getMessage.contains("no embedder manifest"))
    } finally store.destroy()
  }
}
