package graft.ingest

import graft.embed.{Embedder, Embedders, HashEmbedder}
import graft.text.Chunker
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The ingest pipeline (reference EP1, /root/reference/src/
  * PDFToChromaIngester.py:126-223): document → extract → chunk → explode →
  * metadata/ids → embed → chunk records.
  *
  * Where the reference loops files sequentially (:218-221), this is one
  * declarative plan: a map-only pipeline with NO shuffle until the sink —
  * scan, UDFs, posexplode, and projections all fuse into a single
  * whole-stage-codegen'd pass, and `binaryFile`/parquet input splits give
  * file-level parallelism for free. At 100 TB nothing here materializes
  * more than one partition of chunk records at a time.
  *
  * Semantics carried over exactly:
  *  - blank text ⇒ row excluded from the collection but reported as a
  *    failed file in [[ingestReport]] (:132-138);
  *  - ALL chunks are added (the canonical 3-of-4-variant behavior — the
  *    `[0:2]` slice at :190-192 is a bug in one variant, see SURVEY §0);
  *  - per-chunk metadata: source, filename, total_chunks, chunk_index,
  *    chunk_id = "{filename}_chunk_{i}" (:144-170);
  *  - ids: uuid4 per chunk (:170) by default; deterministic sha256 mode for
  *    reproducible tests.
  */
object IngestPipeline {

  val chunkUdf = udf((text: String, size: Int, overlap: Int) =>
    Chunker.chunkText(text, size, overlap))

  /** Chunk a documents DataFrame: adds (chunk_index, chunk, total_chunks,
    * chunk_id). `idCol` identifies the source document (doc_id / filename).
    */
  def chunk(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
            chunkSize: Int = 600, overlap: Int = 50): DataFrame = {
    docs
      .withColumn("_chunks", chunkUdf(col(textCol), lit(chunkSize), lit(overlap)))
      .withColumn("total_chunks", size(col("_chunks")))
      .select(col("*"), posexplode(col("_chunks")).as(Seq("chunk_index", "chunk")))
      .drop("_chunks", textCol)
      .withColumn("chunk_id", format_string("%s_chunk_%d", col(idCol), col("chunk_index")))
  }

  /** Full ingest over a documents table (the harness `documents` schema:
    * doc_id, text, lang, source, n_chars). Returns chunk records:
    * (id, chunk_id, doc_id, source, filename, chunk_index, total_chunks,
    *  chunk, embedding).
    */
  def ingestDocuments(docs: DataFrame,
                      embedder: Embedder = HashEmbedder(dim = 64),
                      deterministicIds: Boolean = true,
                      chunkSize: Int = 600, overlap: Int = 50): DataFrame = {
    val nonBlank = docs.filter(length(trim(col("text"))) > 0)
    val chunked = chunk(nonBlank, "text", "doc_id", chunkSize, overlap)
    val withId = if (deterministicIds)
      chunked.withColumn("id", sha2(col("chunk_id").cast("binary"), 256))
    else chunked.withColumn("id", expr("uuid()"))
    Embedders.embed(withId, "chunk", "embedding", embedder)
  }

  /** Per-source ingest report (reference `ingest_directory` result map +
    * the success tally at :364-378): success = document text non-blank
    * after extraction-fallback (:132-138).
    */
  def ingestReport(docs: DataFrame, groupCol: String = "source"): DataFrame = {
    val ok = (length(trim(col("text"))) > 0).cast("int")
    docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(ok).as("n_success"),
        (count(lit(1)) - sum(ok)).as("n_failed"))
  }

  /** binaryFile-source variant (the real PDF-dir shape, reference O1): scan
    * a directory, keep `.pdf` paths, extract text with [[PdfText]] — the
    * pure-JVM PDF extractor (Flate decode, page tree, Tj/TJ content
    * streams, /ToUnicode CID decoding) — falling back to a UTF-8 decode
    * for non-PDF bytes, then to the blank-text failed-row semantics.
    */
  def readBinaryDir(spark: org.apache.spark.sql.SparkSession, dir: String,
                    glob: String = "*.pdf"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** Extraction chain (reference :130-138): primary = the pure-JVM PDF
    * extractor [[PdfText]] (real content-stream + ToUnicode decoding).
    * The UTF-8 fallback applies ONLY to non-PDF bytes (plain-text files
    * arriving through the same dir scan): a GENUINE PDF whose extraction
    * fails — encrypted, image-only, unsupported filter — must produce
    * blank text so the blank-text contract records a failed row
    * (:136-138), not mojibake of the raw PDF bytes masquerading as
    * success. Exceptions → "" (:77-79).
    */
  val extractTextUdf = udf { (bytes: Array[Byte]) =>
    if (bytes == null) ""
    else if (PdfText.looksLikePdf(bytes)) PdfText.extract(bytes)
    else try new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    catch { case _: Throwable => "" }
  }

  def ingestBinaryDir(spark: org.apache.spark.sql.SparkSession, dir: String,
                      embedder: Embedder = HashEmbedder(dim = 64)): DataFrame = {
    val files = readBinaryDir(spark, dir)
      .withColumn("filename", element_at(split(col("path"), "/"), -1))
      .withColumn("text", extractTextUdf(col("content")))
      .select("path", "filename", "text")
      .withColumnRenamed("path", "source")
      .withColumn("doc_id", col("filename"))
    ingestDocuments(docs = files, embedder = embedder)
  }
}
