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
