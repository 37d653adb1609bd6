package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink breadth: csv and json round-trips on the documents shape
  * (the engine is parquet-first; these prove the standard source matrix
  * works through the same DataFrame surface).
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf).limit(50).cache()

  test("csv sink/source round trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(s"$dir/docs")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val back = spark.read.option("header", "true").schema(schema).csv(s"$dir/docs")
    assert(back.count() == docs.count())
    val a = docs.select("doc_id", "text").as[(Long, String)].collect().toSet
    val b = back.select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("orc sink/source round trip (embeddings incl. array column)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val emb = Tables.embeddings(spark, sf).limit(50).cache()
    emb.write.mode("overwrite").orc(s"$dir/emb")
    val back = spark.read.orc(s"$dir/emb")
    assert(back.schema == emb.schema) // array<float> survives exactly
    assert(back.count() == emb.count())
    val a = emb.select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().map { case (id, v) => (id, v.toSeq) }.toSet
    val b = back.select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().map { case (id, v) => (id, v.toSeq) }.toSet
    assert(a == b)
  }

  test("json sink/source round trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    docs.write.mode("overwrite").json(s"$dir/docs")
    val back = spark.read.json(s"$dir/docs")
    assert(back.count() == docs.count())
    val a = docs.select("doc_id", "n_chars").as[(Long, Long)].collect().toSet
    val b = back.select("doc_id", "n_chars").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("text source: wholetext file-per-row feeds the ingest pipeline") {
    // the raw-.txt-corpus ingest shape (the non-PDF sibling of
    // ingestBinaryDir): one row per FILE via wholetext, filename from
    // the reserved metadata column, straight into ingestDocuments
    val dir = java.nio.file.Files.createTempDirectory("graft_txt").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.txt"),
      "alpha beta gamma. " * 50)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/b.txt"),
      "delta epsilon zeta. " * 50)
    val files = spark.read.option("wholetext", "true").text(dir)
      .select(col("value").as("text"),
        element_at(split(input_file_name(), "/"), -1).as("doc_id"))
      .withColumn("source", col("doc_id"))
    val out = graft.ingest.IngestPipeline.ingestDocuments(
      files, graft.embed.HashEmbedder(dim = 16), chunkSize = 120, overlap = 20)
    val perDoc = out.groupBy("doc_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perDoc.keySet == Set("a.txt", "b.txt"))
    assert(perDoc.values.forall(_ > 3)) // ~900 chars / 100-char stride
    // line-mode (default) reads the same dir as one row per line
    assert(spark.read.text(dir).count() == 2) // each file is one line here
  }

  test("embeddings (nested array column) survive a json round trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json_vec").toString
    val e = Tables.embeddings(spark, sf).limit(20)
    e.write.mode("overwrite").json(s"$dir/emb")
    val back = spark.read.json(s"$dir/emb")
      .select(col("vec_id"), col("embedding").cast(ArrayType(FloatType)))
    val a = e.select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    val b = back.as[(Long, Seq[Float])].collect().toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) =>
      v.zip(b(k)).foreach { case (x, y) => assert(math.abs(x - y) < 1e-5) }
    }
  }

  test("warc sink/source: records round-trip; payload sliced by Content-Length survives CRLF and header-ish bytes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_spec").toString
    // adversarial payloads: embedded CRLFs, a '>' after an id-like
    // prefix, a fake header line INSIDE the payload, unicode, emptyish
    val tricky = Seq(
      (1L, "web", "en", "plain payload"),
      (2L, "web", "en", "line one\r\nline two\r\n\r\nline after gap"),
      (3L, "books", "de", "fake header\r\nContent-Length: 9999\r\nstill payload"),
      (4L, "books", "de", "angle > bracket <urn:graft:77> and éüß"),
      (5L, "web", "fr", "x")).toDF("doc_id", "source", "lang", "text")
    graft.ingest.Warc.write(tricky, dir)
    val back = graft.ingest.Warc.read(spark, dir)
      .withColumn("doc_id", col("doc_id").cast("long"))
    val a = tricky.as[(Long, String, String, String)].collect().toSet
    val b = back.select("doc_id", "source", "lang", "text")
      .as[(Long, String, String, String)].collect().toSet
    assert(b == a, s"mismatch:\n got ${b.toSeq.sortBy(_._1)}\n exp ${a.toSeq.sortBy(_._1)}")
    // multi-part write (many small tasks) still reads back whole: the
    // reader must tolerate one leading empty chunk PER FILE
    val dir2 = java.nio.file.Files.createTempDirectory("graft_warc_spec2").toString
    graft.ingest.Warc.write(docs.repartition(7), dir2)
    assert(graft.ingest.Warc.read(spark, dir2).count() == docs.count())
  }

  test("warc: octet framing survives a record FOLLOWING a multibyte payload") {
    // Content-Length counts BYTES: 'éüß€' is 4 chars / 9 UTF-8 bytes.
    // A char-counting reader slices doc 1 five bytes short and then
    // mis-frames everything after it — doc 2's payload is the canary.
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_mb").toString
    val docs = Seq(
      (1L, "web", "fr", "éüß€ multibyte body"),
      (2L, "web", "en", "plain follower")).toDF("doc_id", "source", "lang", "text")
    graft.ingest.Warc.write(docs.coalesce(1), dir)
    val back = graft.ingest.Warc.read(spark, dir)
      .withColumn("doc_id", col("doc_id").cast("long"))
      .as[(Long, String, String, String)].collect().toSet
    assert(back == docs.as[(Long, String, String, String)].collect().toSet)
  }

  test("warc: null fields are dropped EXPLICITLY and counted, never silently lost") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_null").toString
    val docs = Seq(
      (1L, "web", "en", "kept"),
      (2L, null.asInstanceOf[String], "en", "null source"),
      (3L, "web", "en", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "lang", "text")
    val dropped = graft.ingest.Warc.write(docs, dir)
    assert(dropped === 2L, "both null-bearing rows surface in the count")
    val back = graft.ingest.Warc.read(spark, dir)
    assert(back.count() === 1L)
    assert(back.select("text").as[String].collect().toSeq == Seq("kept"))
  }

  test("warc property sweep: random unicode payloads (astral chars, CRLFs, header-ish text) round-trip") {
    // octet framing is byte arithmetic over re-encoded UTF-8 — sweep it
    // with adversarial generated payloads: multibyte BMP chars, astral
    // (surrogate-pair) code points, embedded CRLF/blank lines, and
    // text that LOOKS like WARC headers. Seeded -> deterministic.
    val rnd = new scala.util.Random(20260813L)
    val pools = Array(
      "abc def ghi ", "éüßñ çØå ", "日本語中文 한국어 ", "😀🎉🧪🚀 ",
      "\r\n", "\r\n\r\n", "Content-Length: 42\r\n", "WARC-Source: fake\r\n",
      "mixed éA日😀z ")
    val docs = (0 until 60).map { i =>
      val n = 1 + rnd.nextInt(12)
      val text = (0 until n).map(_ => pools(rnd.nextInt(pools.length))).mkString
      (i.toLong, s"src${i % 3}", "xx", text)
    }
    // the reader drops resync fragments when a payload embeds the exact
    // record delimiter at a parse-breaking spot; none of these pools
    // contain the full "WARC/1.0\r\n" header line, so the round trip
    // must be lossless
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_prop").toString
    val in = docs.toDF("doc_id", "source", "lang", "text")
    val dropped = graft.ingest.Warc.write(in.repartition(5), dir)
    assert(dropped === 0L)
    val back = graft.ingest.Warc.read(spark, dir)
      .withColumn("doc_id", col("doc_id").cast("long"))
      .select("doc_id", "source", "lang", "text")
      .as[(Long, String, String, String)].collect().toSet
    assert(back == docs.toSet,
      s"lost: ${docs.toSet.diff(back).take(2)}; extra: ${back.diff(docs.toSet).take(2)}")
  }

  test("warc: gzipped segments round-trip byte-identically through the same reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_gz").toString
    graft.ingest.Warc.write(docs, dir, compression = Some("gzip"))
    val gzFiles = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".gz"))
    assert(gzFiles.nonEmpty, "writer must emit .gz segment files")
    val back = graft.ingest.Warc.read(spark, dir)
      .withColumn("doc_id", col("doc_id").cast("long"))
    val a = docs.select("doc_id", "source", "lang", "text")
      .as[(Long, String, String, String)].collect().toSet
    val b = back.select("doc_id", "source", "lang", "text")
      .as[(Long, String, String, String)].collect().toSet
    assert(b == a)
  }

  test("warc query: checksum aggregate matches the source table exactly") {
    val out = GraftQueries.sourceWarc(spark, sf).collect()
    val direct = Tables.documents(spark, sf)
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    out.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[String]("lang"))
      assert((r.getAs[Long]("n_docs"), r.getAs[Long]("id_sum")) == direct(k), s"cell $k")
    }
    assert(out.length == direct.size)
  }

  test("pipeline_split: deterministic, content-independent, decorrelated from the sample hash") {
    val out = GraftQueries.pipelineSplit(spark, sf).collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sf).count())
    // rerun = identical assignment (no rand(), no partition dependence)
    val again = GraftQueries.pipelineSplit(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // global ratios near 80/10/10 (hash uniformity at 500 docs)
    val bySplit = out.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(bySplit("train") > total * 7 / 10 && bySplit("train") < total * 9 / 10)
    assert(bySplit.keySet == Set("train", "validation", "test"))
  }

  test("quality_bins: fixed-width bins partition the corpus; bounds consistent") {
    val out = GraftQueries.qualityBins(spark, sf).collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sf).filter(col("text").isNotNull).count())
    out.foreach { r =>
      val bin = r.getAs[Long]("bin")
      val lo = r.getAs[Double]("min_score"); val hi = r.getAs[Double]("max_score")
      assert(bin >= 0 && bin <= 19)
      assert(lo <= hi)
      // scores inside the bin's half-open interval (clamp bins excepted)
      if (bin > 0 && bin < 19) {
        assert(lo >= bin / 10.0 - 1.0 - 1e-9 && hi < (bin + 1) / 10.0 - 1.0 + 1e-9)
      }
    }
  }

  test("export_shards: every doc lands in its arithmetic shard, nothing lost, roughly balanced") {
    val out = GraftQueries.exportShards(spark, sf).collect()
    assert(out.map(_.getAs[Int]("shard")).toSet == (0 until 8).toSet)
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sf).count())
    // md5 sharding at 500 docs: no shard should be empty or hold half the corpus
    val counts = out.map(_.getAs[Long]("n_docs"))
    assert(counts.min > 0 && counts.max < total / 2)
  }
}
