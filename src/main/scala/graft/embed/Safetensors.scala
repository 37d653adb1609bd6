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

  /** Lazy byte access to a tensor span — the seam that keeps the reader
    * off the 2 GB JVM array bound: nothing is heap-resident until a
    * specific tensor is decoded, and only that tensor's span is read. */
  private[embed] sealed trait Source {
    def slice(begin: Long, end: Long): ByteBuffer
  }

  /** Span reads through a FileChannel positioned past the header — the
    * FILE can be any size; each TENSOR must fit an array (true of every
    * encoder-family tensor by orders of magnitude). */
  private[embed] final class ChannelSource(path: String, dataStart: Long) extends Source {
    def slice(begin: Long, end: Long): ByteBuffer = {
      require(end - begin <= Int.MaxValue,
        s"$path: single tensor span ${end - begin} bytes exceeds the 2 GB decode bound")
      val ch = java.nio.channels.FileChannel.open(
        Paths.get(path), java.nio.file.StandardOpenOption.READ)
      try {
        val bb = ByteBuffer.allocate((end - begin).toInt)
        ch.position(dataStart + begin)
        while (bb.hasRemaining && ch.read(bb) >= 0) {}
        require(!bb.hasRemaining,
          s"$path: tensor span [$begin, $end) truncated mid-read")
        bb.flip()
        bb.order(ByteOrder.LITTLE_ENDIAN)
        bb
      } finally ch.close()
    }
  }

  final class File(val tensors: Map[String, TensorMeta],
                   val metadata: Map[String, String],
                   sources: Map[String, Source]) {

    private[embed] def sourceOf(name: String): Source = sources(name)

    def shape(name: String): Array[Int] = meta(name).shape

    private def meta(name: String): TensorMeta =
      tensors.getOrElse(name, throw new NoSuchElementException(
        s"tensor '$name' not in checkpoint (has: ${tensors.keys.toSeq.sorted.take(20).mkString(", ")}…)"))

    /** Decode a tensor to float32, row-major as stored. */
    def floats(name: String): Array[Float] = {
      val m = meta(name)
      val bb = sources(name).slice(m.begin, m.end)
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

  /** Open a single-file checkpoint. Only the JSON header is read eagerly
    * — tensor bytes stream per-decode through a channel, so the FILE
    * size is unbounded (the old whole-file read capped checkpoints at
    * the 2 GB JVM array bound). */
  def read(path: String): File = {
    val fileSize = Files.size(Paths.get(path))
    require(fileSize >= 8, s"$path too short for a safetensors header")
    val ch = java.nio.channels.FileChannel.open(
      Paths.get(path), java.nio.file.StandardOpenOption.READ)
    val (headerBytes, headerLen) =
      try {
        val lenBuf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        while (lenBuf.hasRemaining && ch.read(lenBuf) >= 0) {}
        lenBuf.flip()
        val hl = lenBuf.getLong
        require(hl > 0 && 8 + hl <= fileSize, s"$path: bad header length $hl")
        val hb = ByteBuffer.allocate(hl.toInt)
        while (hb.hasRemaining && ch.read(hb) >= 0) {}
        require(!hb.hasRemaining, s"$path: bad header length $hl")
        (hb.array(), hl)
      } finally ch.close()
    val dataLen = fileSize - 8 - headerLen
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(headerBytes, 0, headerBytes.length)
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
        require(begin >= 0 && begin <= end && end <= dataLen,
          s"$path: tensor '$name' offsets [$begin, $end) exceed the $dataLen-byte buffer (truncated file?)")
        val dt = node.get("dtype").asText
        dtypeBytes.get(dt).foreach { w =>
          require(end - begin == shape.foldLeft(1L)(_ * _) * w,
            s"$path: tensor '$name' byte span ${end - begin} != shape ${shape.mkString("x")} * $w")
        }
        tensors += name -> TensorMeta(dt, shape, begin, end)
      }
    }
    val src = new ChannelSource(path, 8 + headerLen)
    new File(tensors, metadata, tensors.keys.map(_ -> (src: Source)).toMap)
  }

  /** Open a SHARDED checkpoint through its HF-convention index
    * (`model.safetensors.index.json`: `{"metadata": {...}, "weight_map":
    * {"tensor.name": "model-00001-of-00002.safetensors", ...}}`) — the
    * layout HF emits for any model too large for one file. Each shard's
    * header is parsed once; tensor bytes stay lazy per-shard, so total
    * checkpoint size is unbounded. Exposes exactly the weight_map's
    * tensors (a shard-local extra stays invisible — the index IS the
    * manifest); a tensor mapped to a shard that does not carry it fails
    * here, not at first decode. */
  def readSharded(indexPath: String): File = {
    val p = Paths.get(indexPath).toAbsolutePath
    val dir = p.getParent
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readAllBytes(p))
    val wm = root.get("weight_map")
    require(wm != null && wm.isObject,
      s"$indexPath: no weight_map object — not a safetensors index")
    var mapping = Map.empty[String, String]
    wm.fields().forEachRemaining { e => mapping += e.getKey -> e.getValue.asText }
    require(mapping.nonEmpty, s"$indexPath: empty weight_map")
    val shardFiles: Map[String, File] =
      mapping.values.toSeq.distinct.map { shard =>
        shard -> read(dir.resolve(shard).toString)
      }.toMap
    var tensors = Map.empty[String, TensorMeta]
    var sources = Map.empty[String, Source]
    mapping.foreach { case (name, shard) =>
      val sf = shardFiles(shard)
      val m = sf.tensors.getOrElse(name, throw new IllegalArgumentException(
        s"$indexPath: weight_map sends tensor '$name' to $shard, " +
          "which does not carry it"))
      tensors += name -> m
      sources += name -> sf.sourceOf(name)
    }
    // shard metadata merges first-wins (HF writes identical metadata to
    // every shard; a disagreement keeps the first shard's value)
    val metadata = shardFiles.values.foldLeft(Map.empty[String, String]) {
      (acc, f) => f.metadata ++ acc
    }
    new File(tensors, metadata, sources)
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
