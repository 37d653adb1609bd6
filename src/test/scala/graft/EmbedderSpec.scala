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

  test("retrieval quality: corpus-trained BPE turns suffix-varied retrieval from 0 to 1 (ablation on the same model)") {
    // Labeled relevance fixture: each passage pairs two distinctive
    // stems in one inflection ("...ing"/"...ed"); its query uses the
    // OPPOSITE inflections — no query token equals any passage token as
    // a whole word. The transformer's whitespace mode hashes each
    // variant to an unrelated embedding row -> retrieval is chance;
    // with the corpus-trained BPE vocabulary wired in, both forms share
    // stem subwords (the property the reference's WordPiece pipeline
    // relies on) and retrieval is perfect. Measured: 0.00 -> 1.00.
    // The hash baseline also scores 1.00 here — its char-3-gram fallback
    // covers suffix variation — which is why the hash-vs-transformer
    // comparison needs the order fixture in the next test.
    val stems = Seq(
      ("zorplicat", "vembrasqu"), ("quandrexi", "blatherin"),
      ("frimbulat", "crandovex"), ("splenomir", "drakkenby"),
      ("thrumbolt", "wexfordia"), ("glimmerno", "pravantus"),
      ("snorkelbi", "fluxionar"), ("crumpleho", "vastrobel"),
      ("mirandole", "tuskwalle"), ("pendragor", "ozymandre"))
    val passages = stems.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, s"the ${a}ing module ${b}ed the records cleanly")
    }
    val queries = stems.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, s"${a}ed ${b}ing")
    }
    val corpus = (passages ++ queries.map { case (i, t) => (100 + i, t) })
      .toDF("id", "text")
    val merges = graft.text.Bpe.train(corpus, "text", numMerges = 60)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i).toDouble * b(i); i += 1 }
      s
    }
    def recallAt1(embed: String => Array[Float]): Double = {
      val pv = passages.map { case (i, t) => (i, embed(t)) }
      queries.count { case (qi, qt) =>
        val qv = embed(qt)
        pv.maxBy { case (pi, v) => (cos(qv, v), -pi) }._1 == qi
      }.toDouble / queries.size
    }
    val rBpe = recallAt1(
      TransformerEmbedder(prefix = "passage: ", bpeMerges = merges).encodeOne)
    val rPlain = recallAt1(TransformerEmbedder(prefix = "passage: ").encodeOne)
    val rHash = recallAt1(HashEmbedder(dim = 64).encodeOne)
    info(f"suffix recall@1: trf+bpe $rBpe%.2f, trf whitespace $rPlain%.2f, hash $rHash%.2f")
    assert(rBpe >= 0.9, f"BPE transformer recall@1 too low: $rBpe%.2f")
    assert(rBpe > rPlain + 0.5,
      f"BPE wiring must be the difference: $rBpe%.2f vs whitespace $rPlain%.2f")
    assert(rBpe >= rHash)
  }

  test("retrieval quality: transformer separates bag-identical order-confusable passages; hash baseline provably ties") {
    // The discriminating fixture for transformer-vs-bag: passage PAIRS
    // with the SAME word multiset in opposite orders (near-dup
    // confusables); the query asks for one member. Every bag embedder —
    // the hash baseline included, trigrams and all — assigns both
    // members identical vectors, so its best score is attained by BOTH
    // and the pick is a coin flip (credited 0.5 here, its true expected
    // recall). The transformer's position embeddings + attention
    // separate the pair, and the corpus-trained BPE keeps its tokens
    // aligned with the corpus. Deterministic end to end; also driven
    // through the distributed embed + brute-force-top-k rag path.
    import graft.operators.Similarity
    val stems = Seq(
      ("zorplicat", "vembrasqu"), ("quandrexi", "blatherin"),
      ("frimbulat", "crandovex"), ("splenomir", "drakkenby"),
      ("thrumbolt", "wexfordia"), ("glimmerno", "pravantus"),
      ("snorkelbi", "fluxionar"), ("crumpleho", "vastrobel"),
      ("mirandole", "tuskwalle"), ("pendragor", "ozymandre"))
    val passages = stems.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((2L * i, s"the ${a}ing service ${b}ed the queue"),
          (2L * i + 1, s"the ${b}ed service ${a}ing the queue"))
    }
    val queries = stems.zipWithIndex.map { case ((a, b), i) =>
      (2L * i, s"the ${a}ing service ${b}ed the queue")
    }
    val corpus = passages.toDF("id", "text")
    val merges = graft.text.Bpe.train(corpus, "text", numMerges = 60)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i).toDouble * b(i); i += 1 }
      s
    }
    // effective recall: outright top-1 hits plus half credit for exact
    // ties that include the truth (a tie IS a coin flip at query time)
    def effectiveRecall(embed: String => Array[Float]): (Double, Int) = {
      val pv = passages.map { case (i, t) => (i, embed(t)) }
      var credit = 0.0; var ties = 0
      queries.foreach { case (qi, qt) =>
        val qv = embed(qt)
        val scored = pv.map { case (pi, v) => (pi, cos(qv, v)) }
        val best = scored.map(_._2).max
        val winners = scored.filter(s => math.abs(s._2 - best) < 1e-9).map(_._1)
        if (winners == Seq(qi)) credit += 1.0
        else if (winners.contains(qi)) { credit += 1.0 / winners.size; ties += 1 }
      }
      (credit / queries.size, ties)
    }
    val bpeT = TransformerEmbedder(prefix = "passage: ", bpeMerges = merges)
    val (rTrf, trfTies) = effectiveRecall(bpeT.encodeOne)
    val (rHash, hashTies) = effectiveRecall(HashEmbedder(dim = 384).encodeOne)
    info(f"order recall@1: trf+bpe $rTrf%.2f ($trfTies ties) vs hash $rHash%.2f ($hashTies ties)")
    assert(hashTies == queries.size,
      s"bag embedder must tie on every bag-identical pair, tied $hashTies")
    assert(rTrf === 1.0, f"transformer must separate every pair: $rTrf%.2f")
    assert(rTrf > rHash + 0.3,
      f"transformer ($rTrf%.2f) must beat the bag baseline ($rHash%.2f)")
    // same conclusion through the DISTRIBUTED rag path: embed via the
    // batched mapPartitions seam, rank via the brute-force top-k the
    // rag tier scores with
    val pDf = Embedders.embed(passages.toDF("pid", "text"), "text", "embedding", bpeT)
      .select("pid", "embedding")
    val qDf = Embedders.embed(queries.toDF("q_id", "text"), "text", "embedding", bpeT)
      .select(col("q_id"), col("embedding").as("q_vec"))
    val top1 = Similarity.bruteForceTopK(pDf, "embedding", "pid",
        qDf, "q_id", "q_vec", k = 1)
      .select("q_id", "pid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distRecall = queries.count { case (qi, _) => top1.get(qi).contains(qi) }
      .toDouble / queries.size
    info(f"distributed order recall@1: $distRecall%.2f")
    assert(distRecall === 1.0)
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
