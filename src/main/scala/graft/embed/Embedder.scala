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
