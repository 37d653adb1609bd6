package graft

import graft.embed.{Embedders, HashEmbedder, MlpEmbedder}
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

  test("MLP inference is partitioning-invariant (per-executor lazy weights)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(100)
    def run(parts: Int): Map[Long, Seq[Float]] =
      Embedders.embed(docs.repartition(parts), "text", "embedding", MlpEmbedder())
        .select("doc_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(run(2) == run(16))
  }
}
