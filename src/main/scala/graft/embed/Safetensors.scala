package graft.embed

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Pure-JVM reader/writer for the safetensors format — the weight-file
  * seam that lets a real pretrained checkpoint (e.g. BAAI/bge-small-en
  * or all-MiniLM-L6-v2, the models the reference ingester loads at
  * /root/reference/src/PDFToChromaIngester.py:43-47 and
  * ChromaCloudIngester.py:49-54) run through [[TransformerEmbedder]]'s
  * forward pass when placed on the filesystem, with no network and no
  * native runtime.
  *
  * Format (public spec, github.com/huggingface/safetensors): an 8-byte
  * little-endian u64 header length, a JSON header mapping tensor name →
  * `{"dtype": "...", "shape": [...], "data_offsets": [begin, end]}`
  * (offsets relative to the byte buffer after the header; optional
  * `"__metadata__"` string map), then the raw little-endian tensor
  * bytes. The JSON is parsed with Jackson, which Spark already ships —
  * no new dependency.
  *
  * Dtypes F32, F16, BF16, F64 and I64 all decode to `Array[Float]`
  * (the forward pass is float32-in / double-accumulate, so wider types
  * narrow on load — the standard inference posture).
  */
object Safetensors {

  final case class TensorMeta(dtype: String, shape: Array[Int],
                              begin: Long, end: Long)

  final class File(val tensors: Map[String, TensorMeta],
                   val metadata: Map[String, String],
                   data: Array[Byte]) {

    def shape(name: String): Array[Int] = meta(name).shape

    private def meta(name: String): TensorMeta =
      tensors.getOrElse(name, throw new NoSuchElementException(
        s"tensor '$name' not in checkpoint (has: ${tensors.keys.toSeq.sorted.take(20).mkString(", ")}…)"))

    /** Decode a tensor to float32, row-major as stored. */
    def floats(name: String): Array[Float] = {
      val m = meta(name)
      val bb = ByteBuffer.wrap(data, m.begin.toInt, (m.end - m.begin).toInt)
        .order(ByteOrder.LITTLE_ENDIAN)
      val n = m.shape.foldLeft(1L)(_ * _).toInt
      val out = new Array[Float](n)
      m.dtype match {
        case "F32" =>
          var i = 0; while (i < n) { out(i) = bb.getFloat(); i += 1 }
        case "F64" =>
          var i = 0; while (i < n) { out(i) = bb.getDouble().toFloat; i += 1 }
        case "F16" =>
          var i = 0
          while (i < n) { out(i) = f16ToFloat(bb.getShort()); i += 1 }
        case "BF16" =>
          // bfloat16 = the top 16 bits of an IEEE float32
          var i = 0
          while (i < n) {
            out(i) = java.lang.Float.intBitsToFloat((bb.getShort() & 0xffff) << 16)
            i += 1
          }
        case "I64" =>
          var i = 0; while (i < n) { out(i) = bb.getLong().toFloat; i += 1 }
        case d => throw new UnsupportedOperationException(
          s"dtype $d of tensor '$name' not supported")
      }
      out
    }
  }

  /** IEEE 754 binary16 → float32 (Java 17 has no Float.float16ToFloat):
    * expand the 5-bit exponent / 10-bit mantissa, normalizing subnormals. */
  private[embed] def f16ToFloat(h: Short): Float = {
    val bits = h & 0xffff
    val sign = (bits & 0x8000) << 16
    val exp = (bits >>> 10) & 0x1f
    val man = bits & 0x3ff
    val f32 =
      if (exp == 0x1f) sign | 0x7f800000 | (man << 13)          // inf / NaN
      else if (exp != 0) sign | ((exp + 112) << 23) | (man << 13) // normal
      else if (man == 0) sign                                     // ±0
      else {                                                      // subnormal
        var e = 113
        var m = man
        while ((m & 0x400) == 0) { m <<= 1; e -= 1 }
        sign | (e << 23) | ((m & 0x3ff) << 13)
      }
    java.lang.Float.intBitsToFloat(f32)
  }

  def read(path: String): File = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(bytes.length >= 8, s"$path too short for a safetensors header")
    val headerLen = ByteBuffer.wrap(bytes, 0, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
    require(headerLen > 0 && 8 + headerLen <= bytes.length,
      s"$path: bad header length $headerLen")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(bytes, 8, headerLen.toInt)
    val data = java.util.Arrays.copyOfRange(bytes, (8 + headerLen).toInt, bytes.length)
    var tensors = Map.empty[String, TensorMeta]
    var metadata = Map.empty[String, String]
    val dtypeBytes = Map("F64" -> 8, "F32" -> 4, "F16" -> 2, "BF16" -> 2, "I64" -> 8)
    root.fields().forEachRemaining { e =>
      val (name, node) = (e.getKey, e.getValue)
      if (name == "__metadata__") {
        node.fields().forEachRemaining { m => metadata += m.getKey -> m.getValue.asText }
      } else {
        // validate up front: a truncated or offset-corrupt checkpoint
        // must fail HERE with the cause, not as a BufferUnderflow deep
        // inside a tensor decode on an executor
        require(node.hasNonNull("dtype") && node.hasNonNull("shape") &&
          node.hasNonNull("data_offsets") && node.get("data_offsets").size() == 2,
          s"$path: tensor '$name' header is malformed")
        val shape = (0 until node.get("shape").size()).map(node.get("shape").get(_).asInt).toArray
        require(shape.forall(_ >= 0), s"$path: tensor '$name' has a negative dimension")
        val off = node.get("data_offsets")
        val (begin, end) = (off.get(0).asLong, off.get(1).asLong)
        require(begin >= 0 && begin <= end && end <= data.length,
          s"$path: tensor '$name' offsets [$begin, $end) exceed the ${data.length}-byte buffer (truncated file?)")
        val dt = node.get("dtype").asText
        dtypeBytes.get(dt).foreach { w =>
          require(end - begin == shape.foldLeft(1L)(_ * _) * w,
            s"$path: tensor '$name' byte span ${end - begin} != shape ${shape.mkString("x")} * $w")
        }
        tensors += name -> TensorMeta(dt, shape, begin, end)
      }
    }
    new File(tensors, metadata, data)
  }

  /** Write an F32 checkpoint (fixture generation / interchange). Tensor
    * order in the file follows the map's iteration order; offsets are
    * packed contiguously. */
  def write(path: String, tensors: Seq[(String, (Array[Int], Array[Float]))],
            metadata: Map[String, String] = Map.empty): Unit = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
    }
    var off = 0L
    val entries = tensors.map { case (name, (shape, vals)) =>
      require(shape.product == vals.length,
        s"$name: shape ${shape.mkString("x")} != ${vals.length} values")
      val begin = off
      off += vals.length * 4L
      s""""${esc(name)}":{"dtype":"F32","shape":[${shape.mkString(",")}],"data_offsets":[$begin,$off]}"""
    }
    val metaEntry =
      if (metadata.isEmpty) Nil
      else Seq(s""""__metadata__":{${metadata.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString(",")}}""")
    val header = (metaEntry ++ entries).mkString("{", ",", "}").getBytes("UTF-8")
    val out = ByteBuffer.allocate(8 + header.length + off.toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putLong(header.length.toLong)
    out.put(header)
    tensors.foreach { case (_, (_, vals)) =>
      vals.foreach(out.putFloat)
    }
    Files.write(Paths.get(path), out.array())
  }
}
