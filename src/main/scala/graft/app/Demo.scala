package graft.app

import graft.Tables
import graft.embed.HashEmbedder
import graft.ingest.IngestPipeline
import graft.query.RagSearch
import graft.store.VectorStore
import org.apache.spark.sql.SparkSession

/** Runnable demo mirroring the reference's three entry points (SURVEY §3):
  *
  *  EP1  batch ingest  -> collection parquet (PDFToChromaIngester __main__)
  *  EP2  RAG retrieval over the stored collection (RagWorkflow __main__)
  *  EP3  re-ingest with extra metadata + full RAG demo (ChromaCloudIngester)
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
    val embedder = HashEmbedder(dim = 64)
    val store = VectorStore(root)

    // EP1: ingest -> overwrite collection
    val records = IngestPipeline.ingestDocuments(Tables.documents(spark, sfDir), embedder)
    store.create("docs", records)
    println(s"[demo] ingested ${store.count(spark, "docs")} chunk records into $root/docs")
    println(s"[demo] collections: ${store.list().mkString(", ")}")

    // EP2: RAG retrieval
    val collection = store.read(spark, "docs")
    val res = RagSearch.searchForRag(collection, "fast vector hash join", embedder.encodeOne,
      nResults = 4, metadataCols = Seq("chunk_id", "doc_id", "source"))
    println(s"[demo] query='${res.query}' hits=${res.totalResults}")
    res.results.foreach { h =>
      println(f"[demo]   d=${h.distance}%.4f id=${h.metadata("chunk_id")} '${h.content.take(60)}...'")
    }
    val ctx = RagSearch.contextForRag(collection, "fast vector hash join",
      embedder.encodeOne, maxContextLength = 2000)
    println(s"[demo] context chars=${ctx.length}")

    // EP3: append re-ingest with different metadata (the reference's
    // double-ingest quirk — append is allowed, demos won't hide it)
    store.append("docs", records)
    println(s"[demo] after re-ingest: ${store.count(spark, "docs")} records (2x, by design)")

    // EP1/EP2 over the reference's ACTUAL input when present: a directory
    // of real PDFs through binaryFile scan + the pure-JVM extractor, into
    // the reference's collection name (:20), probed with its smoke query
    // (:387 "refund policy")
    val pdfDir = "/root/reference/pdf_datasets"
    if (new java.io.File(pdfDir).isDirectory) {
      val pdfRecords = IngestPipeline.ingestBinaryDir(spark, pdfDir, embedder)
      store.create("airline_travel_docs", pdfRecords)
      // count from the written collection — re-counting pdfRecords would
      // re-run the whole extraction+embedding pipeline a second time
      val written = store.read(spark, "airline_travel_docs")
      println(s"[demo] PDF ingest: ${written.count()} chunk records " +
        s"from ${written.select("filename").distinct().count()} PDFs")
      val pdfHits = RagSearch.searchForRag(store.read(spark, "airline_travel_docs"),
        "refund policy", embedder.encodeOne,
        nResults = 4, metadataCols = Seq("chunk_id", "filename"))
      pdfHits.results.foreach { h =>
        println(f"[demo]   d=${h.distance}%.4f ${h.metadata("filename")} '${h.content.take(60).replace('\n', ' ')}...'")
      }
    }
    spark.stop()
  }
}
