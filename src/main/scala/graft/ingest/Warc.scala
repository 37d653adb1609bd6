package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal WARC/1.0 writer + splittable reader — the container format
  * web-scale training corpora arrive in (Common Crawl ships ~100 TB per
  * crawl as WARC). The reference ingests local PDF directories
  * (/root/reference/src/PDFToChromaIngester.py:96-104); a crawl-scale
  * corpus swaps that directory walk for exactly this record reader.
  *
  * Writer: classic records — version line, named headers, Content-Length,
  * blank line, payload, CRLF gap — one record per text-sink row.
  *
  * Reader: the 100 TB-shaped part. Files split on the record header via
  * Hadoop's configurable record delimiter; TextInputFormat stays
  * SPLITTABLE with a custom delimiter (each block-sized split advances to
  * its first full record, the tail record spills into the next split's
  * reader), so a 1000-executor cluster divides a crawl at block
  * boundaries with no coordination. Everything after the split is
  * DECLARATIVE: regexp_extract for headers, Content-Length-bounded
  * substr for the payload — whole-stage codegen, no UDF. Slicing by
  * Content-Length (what real WARC readers do) keeps writer framing
  * (record-gap CRLF, text-sink newlines) out of the payload.
  *
  * Caveat shared with every delimiter-resync WARC reader: a payload that
  * embeds the exact header bytes mis-splits; readers resync at the next
  * parseable header, which is what `Content-Length`-missing chunk
  * filtering implements (the orphaned fragment lacks headers and drops;
  * the enclosing record's payload is truncated at the collision — the
  * same failure contract as jwarc/warcio on corrupt length fields).
  */
object Warc {
  private val Delim = "WARC/1.0\r\n"

  /** Render `docs` (doc_id, source, lang, text) as WARC records under
    * `dir` (one text-sink file per partition, like a crawler's segment
    * files). */
  def write(docs: DataFrame, dir: String): Unit = {
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:graft:"),
      col("doc_id").cast("string"),
      lit(">\r\nWARC-Source: "), col("source"),
      lit("\r\nWARC-Language: "), col("lang"),
      lit("\r\nContent-Length: "), length(col("text")).cast("string"),
      lit("\r\n\r\n"), col("text"), lit("\r\n"))
    docs.select(rec.as("value")).write.mode("overwrite").text(dir)
  }

  /** Read a WARC directory back as (doc_id string, source, lang, text).
    * Splittable: record-delimited TextInputFormat, then codegen'd
    * header/payload extraction. Chunks without a parseable
    * Content-Length (the empty pre-header split at each file head,
    * resync fragments) are dropped. */
  def read(s: SparkSession, dir: String): DataFrame = {
    val conf = new org.apache.hadoop.conf.Configuration(
      s.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", Delim)
    val rdd = s.sparkContext.newAPIHadoopFile(dir,
        classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
        classOf[org.apache.hadoop.io.LongWritable],
        classOf[org.apache.hadoop.io.Text], conf)
      .map(_._2.toString) // Text buffers are REUSED per record: copy now
    val recs = s.createDataFrame(rdd.map(Row(_)),
      StructType(Seq(StructField("rec", StringType))))
    val clen = regexp_extract(col("rec"), "Content-Length: (\\d+)", 1)
    val body = col("rec").substr(
      instr(col("rec"), "\r\n\r\n") + 4, clen.cast("int"))
    recs
      .filter(clen =!= "")
      .select(
        regexp_extract(col("rec"), "WARC-Record-ID: <urn:graft:([^>]+)>", 1)
          .as("doc_id"),
        regexp_extract(col("rec"), "WARC-Source: ([^\r\n]+)", 1).as("source"),
        regexp_extract(col("rec"), "WARC-Language: ([^\r\n]+)", 1).as("lang"),
        body.as("text"))
  }
}
