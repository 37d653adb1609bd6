package graft.app

import graft.Tables
import graft.embed.{Embedders, HashEmbedder}
import graft.ingest.IngestPipeline
import graft.query.RagSearch
import graft.store.{CollectionManifest, VectorStore}
import org.apache.spark.sql.SparkSession

/** Runnable demo mirroring the reference's three entry points (SURVEY §3):
  *
  *  EP1  batch ingest  -> collection parquet (PDFToChromaIngester __main__)
  *  EP2  RAG retrieval over the stored collection (RagWorkflow __main__)
  *  EP3  re-ingest with extra metadata + full RAG demo (ChromaCloudIngester)
  *
  * Collections are EMBEDDER-BOUND end to end, as Chroma binds the
  * embedding function at create_collection
  * (/root/reference/src/PDFToChromaIngester.py:51-54): creation writes
  * the manifest, appends must declare the same space, and retrieval
  * resolves the query-side embedder FROM the manifest — the caller
  * never re-states it, so mixed-embedding-space queries are impossible
  * by construction.
  *
  * `runMain graft.app.Demo [sfDir] [collectionsRoot]`
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val root = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_collections").toString
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // asymmetric instruction convention (reference ChromaCloudIngester
    // :52,181): "passage: " on add, "query: " on search — one space,
    // two sides, both recorded in the manifest
    val (pe, qe) = Embedders.asymmetric(p => HashEmbedder(dim = 64, prefix = p))
    val manifest = CollectionManifest.of(pe, qe)
    val store = VectorStore(root)

    // EP1: ingest -> overwrite collection, binding the embedder
    val records = IngestPipeline.ingestDocuments(Tables.documents(spark, sfDir), pe)
    store.create("docs", records, manifest = Some(manifest))
    println(s"[demo] ingested ${store.count(spark, "docs")} chunk records into $root/docs")
    println(s"[demo] collections: ${store.list().mkString(", ")}")
    println(s"[demo] binding: ${store.manifest("docs").map(_.canonical).getOrElse("NONE")}")

    // EP2: RAG retrieval — the query embedder comes from the MANIFEST
    val res = RagSearch.searchBound(spark, store, "docs", "fast vector hash join",
      nResults = 4, metadataCols = Seq("chunk_id", "doc_id", "source"))
    println(s"[demo] query='${res.query}' hits=${res.totalResults}")
    res.results.foreach { h =>
      println(f"[demo]   d=${h.distance}%.4f id=${h.metadata("chunk_id")} '${h.content.take(60)}...'")
    }
    val ctx = RagSearch.contextForRag(store.read(spark, "docs"), "fast vector hash join",
      qe.encodeOne, maxContextLength = 2000)
    println(s"[demo] context chars=${ctx.length}")

    // EP3: append re-ingest (the reference's double-ingest quirk — append
    // is allowed, demos won't hide it) — MUST declare the same binding
    store.append("docs", records, manifest = Some(manifest))
    println(s"[demo] after re-ingest: ${store.count(spark, "docs")} records (2x, by design)")
    // the guard the binding exists for: a mismatched space is refused
    try {
      store.append("docs", records, manifest = Some(
        CollectionManifest.of(HashEmbedder(dim = 32, prefix = "passage: "),
          HashEmbedder(dim = 32, prefix = "query: "))))
      println("[demo] ERROR: mixed-space append was accepted")
    } catch {
      case e: IllegalArgumentException =>
        println(s"[demo] mixed-space append correctly refused: ${e.getMessage.take(80)}...")
    }

    // EP1/EP2 over the reference's ACTUAL input when present: a directory
    // of real PDFs through binaryFile scan + the pure-JVM extractor, into
    // the reference's collection name (:20), probed with its smoke query
    // (:387 "refund policy")
    val pdfDir = "/root/reference/pdf_datasets"
    if (new java.io.File(pdfDir).isDirectory) {
      val pdfRecords = IngestPipeline.ingestBinaryDir(spark, pdfDir, pe)
      store.create("airline_travel_docs", pdfRecords, manifest = Some(manifest))
      // count from the written collection — re-counting pdfRecords would
      // re-run the whole extraction+embedding pipeline a second time
      val written = store.read(spark, "airline_travel_docs")
      println(s"[demo] PDF ingest: ${written.count()} chunk records " +
        s"from ${written.select("filename").distinct().count()} PDFs")
      val pdfHits = RagSearch.searchBound(spark, store, "airline_travel_docs",
        "refund policy", nResults = 4, metadataCols = Seq("chunk_id", "filename"))
      pdfHits.results.foreach { h =>
        println(f"[demo]   d=${h.distance}%.4f ${h.metadata("filename")} '${h.content.take(60).replace('\n', ' ')}...'")
      }
    }
    spark.stop()
  }
}
