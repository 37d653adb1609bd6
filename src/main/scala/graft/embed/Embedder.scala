package graft.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pluggable embedding stage (reference: the collection-bound
  * SentenceTransformer at /root/reference/src/PDFToChromaIngester.py:41-49).
  *
  * The default implementation is a deterministic feature-hashing embedder:
  * pure JVM, no model weights, unit-norm output — so the engine is
  * self-contained and every test is reproducible. A real model (e.g. ONNX
  * MiniLM) would plug in behind the same trait with one session per
  * partition and batched inference, exactly like the reference batches
  * `encode(List[str])`.
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Batched encode — one call per partition-batch, mirroring the
    * reference's batched `SentenceTransformer.encode`. */
  def encode(texts: Seq[String]): Seq[Array[Float]] = texts.map(encodeOne)
  def encodeOne(text: String): Array[Float]
}

/** Feature-hashing embedder: each lowercase whitespace token (and its
  * 3-gram shingles, for a little sub-word signal) hashes to `dim` buckets
  * with a sign bit; the accumulated vector is L2-normalized. Deterministic
  * across JVMs (murmur-free: explicit FNV-1a).
  */
final case class HashEmbedder(dim: Int = 384, prefix: String = "") extends Embedder {
  @inline private def fnv1a(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  override def encodeOne(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    if (text == null) return v
    val toks = (prefix + text).toLowerCase.split("\\s+")
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (tok.nonEmpty) {
        val h = fnv1a(tok, 0x9e3779b97f4a7c15L)
        val idx = java.lang.Math.floorMod(h, dim.toLong).toInt
        val sign = if ((h >>> 62 & 1L) == 0L) 1f else -1f
        v(idx) += sign
        // char 3-grams for sub-word signal
        var i = 0
        while (i + 3 <= tok.length) {
          val g = fnv1a(tok.substring(i, i + 3), 0x85ebca6b0b131a2fL)
          v(java.lang.Math.floorMod(g, dim.toLong).toInt) += (if ((g >>> 62 & 1L) == 0L) 0.5f else -0.5f)
          i += 1
        }
      }
      t += 1
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += v(i).toDouble * v(i); i += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
    }
    v
  }
}

/** Model-backed embedder: a 2-layer MLP (tanh hidden layer, L2-normalized
  * output) over hashed bag-of-words features, with weights loaded from a
  * binary file on the classpath. Deliberately tiny, but it exercises the
  * FULL production seam the reference's `SentenceTransformer.encode` needs
  * (/root/reference/src/PDFToChromaIngester.py:41-49): weights deserialized
  * once per executor JVM (`@transient lazy val` — the Spark analog of
  * one-model-per-worker), inference batched per partition through
  * [[Embedder.encode]], output dimension decoupled from input features. A
  * real ONNX/transformer model swaps in by replacing `forward` and the
  * weight format; nothing in the pipeline topology changes (proved by the
  * swap test in EmbedderSpec).
  *
  * Weight file format (big-endian, via DataOutputStream): magic "GMLP",
  * int dimIn, int dimHidden, int dimOut, then float32 arrays
  * w1[dimIn*dimHidden], b1[dimHidden], w2[dimHidden*dimOut], b2[dimOut].
  */
final case class MlpEmbedder(resource: String = "/graft/toy_mlp.bin") extends Embedder {

  @transient private lazy val model: MlpEmbedder.Weights =
    MlpEmbedder.load(resource)

  override def dim: Int = model.dimOut

  override def encodeOne(text: String): Array[Float] = {
    val m = model
    // hashed bag-of-words input, L2-normalized (same tokenization as
    // HashEmbedder so the two embedders are drop-in swappable)
    val x = HashEmbedder(dim = m.dimIn).encodeOne(text)
    m.forward(x)
  }
}

object MlpEmbedder {
  final case class Weights(dimIn: Int, dimHidden: Int, dimOut: Int,
                           w1: Array[Float], b1: Array[Float],
                           w2: Array[Float], b2: Array[Float]) {
    def forward(x: Array[Float]): Array[Float] = {
      val h = new Array[Float](dimHidden)
      var j = 0
      while (j < dimHidden) {
        var acc = b1(j).toDouble
        var i = 0
        while (i < dimIn) { acc += x(i) * w1(i * dimHidden + j); i += 1 }
        h(j) = math.tanh(acc).toFloat
        j += 1
      }
      val out = new Array[Float](dimOut)
      var norm = 0.0
      var o = 0
      while (o < dimOut) {
        var acc = b2(o).toDouble
        var j2 = 0
        while (j2 < dimHidden) { acc += h(j2) * w2(j2 * dimOut + o); j2 += 1 }
        out(o) = acc.toFloat
        norm += acc * acc
        o += 1
      }
      if (norm > 0) {
        val inv = (1.0 / math.sqrt(norm)).toFloat
        o = 0
        while (o < dimOut) { out(o) *= inv; o += 1 }
      }
      out
    }
  }

  def load(resource: String): Weights = {
    val in = Option(getClass.getResourceAsStream(resource))
      .getOrElse(throw new java.io.FileNotFoundException(
        s"embedder weights not on classpath: $resource"))
    val d = new java.io.DataInputStream(new java.io.BufferedInputStream(in))
    try {
      val magic = new Array[Byte](4)
      d.readFully(magic)
      require(new String(magic, "US-ASCII") == "GMLP",
        s"bad weight-file magic in $resource")
      val dimIn = d.readInt(); val dimHidden = d.readInt(); val dimOut = d.readInt()
      def floats(n: Int): Array[Float] = {
        val a = new Array[Float](n)
        var i = 0
        while (i < n) { a(i) = d.readFloat(); i += 1 }
        a
      }
      Weights(dimIn, dimHidden, dimOut,
        floats(dimIn * dimHidden), floats(dimHidden),
        floats(dimHidden * dimOut), floats(dimOut))
    } finally d.close()
  }

  /** Deterministic weight-file writer (the checked-in fixture's recorded
    * provenance): xorshift64* PRNG from a fixed seed, uniform in
    * [-1/sqrt(fanIn), 1/sqrt(fanIn)] per layer. */
  def writeToyWeights(path: java.nio.file.Path, dimIn: Int = 128,
                      dimHidden: Int = 32, dimOut: Int = 32,
                      seed: Long = 0x5eed5eed5eedL): Unit = {
    var s = seed
    def nextUniform(): Double = {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      val u = (s * 0x2545f4914f6cdd1dL >>> 11).toDouble / (1L << 53).toDouble
      u * 2.0 - 1.0
    }
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(path)))
    try {
      out.write("GMLP".getBytes("US-ASCII"))
      out.writeInt(dimIn); out.writeInt(dimHidden); out.writeInt(dimOut)
      def layer(n: Int, fanIn: Int): Unit = {
        val bound = 1.0 / math.sqrt(fanIn.toDouble)
        var i = 0
        while (i < n) { out.writeFloat((nextUniform() * bound).toFloat); i += 1 }
      }
      layer(dimIn * dimHidden, dimIn); layer(dimHidden, dimIn)
      layer(dimHidden * dimOut, dimHidden); layer(dimOut, dimHidden)
    } finally out.close()
  }
}

object Embedders {
  /** Column-level embed via UDF (per-row; fine for scalar use). */
  def embedUdf(embedder: Embedder): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => embedder.encodeOne(s))

  /** DataFrame-level embed: batches per partition through
    * [[Embedder.encode]] — the shape a model-backed embedder needs (load
    * the session once per partition, infer in batches).
    */
  def embed(df: DataFrame, textCol: String, outCol: String,
            embedder: Embedder, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField(outCol,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val vecs = embedder.encode(batch.map(r => r.getString(idx)))
        batch.iterator.zip(vecs.iterator).map { case (r, v) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }(enc)
  }
}
