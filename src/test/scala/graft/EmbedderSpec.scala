package graft

import graft.embed.{Embedders, HashEmbedder, MlpEmbedder, PrefixConvention, TransformerEmbedder}
import org.apache.spark.sql.functions._

/** The model-backed embedder seam: weights deserialize from the classpath
  * fixture, inference runs through the same partition-batched path as the
  * hash embedder, and the two are drop-in swappable (identical pipeline
  * topology) — the production property a real ONNX/transformer model
  * needs from this engine.
  */
class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  test("weight fixture loads and forward pass is deterministic + unit-norm") {
    val w = MlpEmbedder.load("/graft/toy_mlp.bin")
    assert((w.dimIn, w.dimHidden, w.dimOut) == (128, 32, 32))
    val e = MlpEmbedder()
    val v1 = e.encodeOne("spark shuffles the lineitem table")
    val v2 = e.encodeOne("spark shuffles the lineitem table")
    assert(v1.toSeq == v2.toSeq)
    assert(v1.length == 32)
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5, s"norm $norm")
    // weights actually matter: different text maps to a different direction
    val v3 = e.encodeOne("completely different words here")
    assert(v3.toSeq != v1.toSeq)
  }

  test("generator is reproducible: regenerating the fixture is byte-identical") {
    val tmp = java.nio.file.Files.createTempFile("toy_mlp", ".bin")
    try {
      MlpEmbedder.writeToyWeights(tmp)
      val fixture = getClass.getResourceAsStream("/graft/toy_mlp.bin").readAllBytes()
      assert(java.util.Arrays.equals(java.nio.file.Files.readAllBytes(tmp), fixture))
    } finally java.nio.file.Files.delete(tmp)
  }

  test("embedder swap: hash and MLP run the identical pipeline topology") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(64)
    val hashed = Embedders.embed(docs, "text", "embedding", HashEmbedder(dim = 32))
    val mlp = Embedders.embed(docs, "text", "embedding", MlpEmbedder())
    // identical schema and physical plan shape — swapping the model changes
    // no operator in the plan, only the function inside mapPartitions
    assert(hashed.schema == mlp.schema)
    def shape(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collect { case p => p.nodeName }
    assert(shape(hashed) == shape(mlp))
    // both produce a 32-dim unit vector per row
    Seq(hashed, mlp).foreach { df =>
      val rows = df.select(size($"embedding").as("d"),
        aggregate($"embedding", lit(0.0d), (a, x) => a + x * x).as("sq")).collect()
      assert(rows.length == 64)
      rows.foreach { r =>
        assert(r.getInt(0) == 32)
        assert(math.abs(math.sqrt(r.getDouble(1)) - 1.0) < 1e-4)
      }
    }
  }

  test("transformer fixture loads; forward is deterministic, unit-norm, and ORDER-SENSITIVE") {
    val w = TransformerEmbedder.load("/graft/toy_transformer.bin")
    assert((w.vocab, w.d, w.heads, w.dff, w.maxLen) == (512, 64, 4, 128, 64))
    val e = TransformerEmbedder()
    val v1 = e.encodeOne("spark shuffles the lineitem table")
    assert(v1.toSeq == e.encodeOne("spark shuffles the lineitem table").toSeq)
    assert(v1.length == 64)
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5, s"norm $norm")
    // position embeddings + attention make word ORDER matter — the
    // property no bag-of-words embedder (hash, MLP-over-BoW) has
    val perm = e.encodeOne("table the shuffles spark lineitem")
    assert(perm.toSeq != v1.toSeq, "permuted tokens must embed differently")
    // attention mixes CONTEXT into each token: the shared suffix embeds
    // differently under a different first token
    val ctx1 = e.encodeOne("good morning vector database")
    val ctx2 = e.encodeOne("bad morning vector database")
    assert(ctx1.toSeq != ctx2.toSeq)
  }

  test("transformer generator is reproducible: regenerating the fixture is byte-identical") {
    val tmp = java.nio.file.Files.createTempFile("toy_transformer", ".bin")
    try {
      TransformerEmbedder.writeToyWeights(tmp)
      val fixture = getClass.getResourceAsStream("/graft/toy_transformer.bin").readAllBytes()
      assert(java.util.Arrays.equals(java.nio.file.Files.readAllBytes(tmp), fixture))
    } finally java.nio.file.Files.delete(tmp)
  }

  test("asymmetric prefixes: passage/query sides share weights but embed apart") {
    val (passages, queries) = Embedders.asymmetric(
      p => TransformerEmbedder(prefix = p), PrefixConvention())
    val text = "vector similarity search over embeddings"
    val pv = passages.encodeOne(text)
    val qv = queries.encodeOne(text)
    assert(pv.toSeq != qv.toSeq,
      "the instruction prefix must steer the embedding")
    // same side is self-consistent
    assert(passages.encodeOne(text).toSeq == pv.toSeq)
    // both live on the unit sphere of the same model
    Seq(pv, qv).foreach { v =>
      assert(math.abs(math.sqrt(v.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
    }
  }

  test("embedder swap: transformer runs the identical pipeline topology too") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(64)
    val hashed = Embedders.embed(docs, "text", "embedding", HashEmbedder(dim = 64))
    val trf = Embedders.embed(docs, "text", "embedding",
      TransformerEmbedder(prefix = "passage: "))
    assert(hashed.schema == trf.schema)
    def shape(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collect { case p => p.nodeName }
    assert(shape(hashed) == shape(trf))
    val rows = trf.select(size($"embedding").as("d"),
      aggregate($"embedding", lit(0.0d), (a, x) => a + x * x).as("sq")).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      assert(r.getInt(0) == 64)
      assert(math.abs(math.sqrt(r.getDouble(1)) - 1.0) < 1e-4)
    }
  }

  test("transformer inference is partitioning-invariant (per-executor lazy weights)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(50)
    def run(parts: Int): Map[Long, Seq[Float]] =
      Embedders.embed(docs.repartition(parts), "text", "embedding",
          TransformerEmbedder(prefix = "passage: "))
        .select("doc_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(run(2) == run(8))
  }

  test("MLP inference is partitioning-invariant (per-executor lazy weights)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(100)
    def run(parts: Int): Map[Long, Seq[Float]] =
      Embedders.embed(docs.repartition(parts), "text", "embedding", MlpEmbedder())
        .select("doc_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(run(2) == run(16))
  }
}
