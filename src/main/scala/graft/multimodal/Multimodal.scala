package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `BINARY` payloads + typed metadata,
  * with decode/feature-extract as a batched per-partition stage.
  *
  * Image (PNG/JPEG via `javax.imageio`) and audio (PCM WAV via
  * `javax.sound.sampled`) decode are REAL — both codecs ship in the JDK,
  * and both round-trips are oracle-checked bit-exactly. Only formats the
  * JDK genuinely lacks (video containers, MP3/AAC) keep the
  * clearly-marked STUB (`FakeDecoder`) producing deterministic features
  * from the bytes; the surrounding pipeline — the binary column schema,
  * the partition-batched map (the Scala analog of `mapInPandas`
  * batches), the feature struct shape — is identical between real and
  * stubbed decoders.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("content_sha", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),   // stubbed decode
    StructField("height", IntegerType, nullable = false),  // stubbed decode
    StructField("n_frames", IntegerType, nullable = false) // stubbed decode
  ))

  /** STUB decoder — stands in ONLY for codecs the JDK lacks (video,
    * MP3/AAC; a real deployment plugs ffmpeg in here). Images and WAV
    * audio use the REAL [[ImageCodec]]/[[AudioCodec]] instead.
    * Deterministic pseudo-features derived from the payload so tests are
    * reproducible.
    */
  object FakeDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(bytes)
      val w = 64 + math.floorMod(h, 1024)
      val ht = 64 + math.floorMod(h >> 10, 1024)
      val frames = 1 + math.floorMod(h >> 20, 64)
      (w, ht, frames)
    }
  }

  /** REAL image codec — PNG/JPEG through the JDK's `javax.imageio` (no
    * external dependency; PNG is lossless RGB so decode returns the exact
    * encoded pixels). This replaces FakeDecoder for images; FakeDecoder
    * remains the stand-in for audio/video codecs the JDK lacks.
    */
  object ImageCodec {
    // in-memory stream cache: the default disk cache writes a temp file
    // per image, pure overhead for our small blobs
    javax.imageio.ImageIO.setUseCache(false)

    /** Encode a width×height RGB image, pixels from `rgb(x, y)` packed
      * 0xRRGGBB, to PNG bytes. */
    def encodePng(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode any ImageIO-supported format and reduce to per-channel
      * pixel sums — (width, height, red_sum, green_sum, blue_sum); None
      * for bytes no reader claims OR that a reader claims and then fails
      * on (valid signature, corrupt body — ImageIO.read THROWS there
      * rather than returning null, and an escaped exception would fail
      * the task and poison the whole job instead of dropping the row).
      * The sums are an order-insensitive, bit-exact pixel feature an
      * oracle can recompute in closed form. */
    def decodeRgbFeatures(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Long)] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        Some((w, h, sr, sg, sb))
      }
    }
  }

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("red_sum", LongType, nullable = false),
    StructField("green_sum", LongType, nullable = false),
    StructField("blue_sum", LongType, nullable = false)
  ))

  /** Batched REAL image decode over a binary column (same per-partition
    * seam as [[extractFeatures]], ImageIO instead of the stub). Rows whose
    * bytes decode to no image are dropped — the fallback-chain semantics
    * (a corrupt blob yields no feature row, not a poisoned one).
    */
  def decodeImages(df: DataFrame, binCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("img", imageFeatureSchema))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      // per-partition codec session seam (ImageIO reader pool, GPU codec…)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          ImageCodec.decodeRgbFeatures(r.getAs[Array[Byte]](idx)).map {
            case (w, h, sr, sg, sb) =>
              Row.fromSeq(r.toSeq :+ Row(w, h, sr, sg, sb))
          }
        }
      }
    }(enc)
  }

  /** REAL audio codec — PCM WAV through the JDK's `javax.sound.sampled`
    * (no external dependency; PCM is lossless so decode returns the exact
    * encoded samples). With ImageCodec this leaves FakeDecoder standing
    * in only for formats the JDK genuinely lacks (video, MP3/AAC).
    */
  object AudioCodec {
    /** Encode 16-bit mono PCM samples to a canonical 44-byte-header WAV. */
    def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1)                       // PCM
        .putShort(1)                       // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2)            // byte rate
        .putShort(2)                       // block align
        .putShort(16)                      // bits per sample
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** Decode any javax.sound-supported container to
      * (sample_rate, channels, n_samples, sample_sum) over signed 16-bit
      * samples; None for undecodable bytes. The sum is an
      * order-insensitive, bit-exact feature an oracle can recompute. */
    def decodePcmFeatures(bytes: Array[Byte]): Option[(Int, Int, Long, Long)] = {
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16) return None
          val le = !fmt.isBigEndian
          val data = in.readAllBytes()
          var (n, sum) = (0L, 0L)
          var i = 0
          while (i + 1 < data.length) {
            val s =
              if (le) ((data(i) & 0xff) | (data(i + 1) << 8)).toShort
              else ((data(i + 1) & 0xff) | (data(i) << 8)).toShort
            sum += s; n += 1; i += 2
          }
          Some((fmt.getSampleRate.toInt, fmt.getChannels, n, sum))
        } finally in.close()
      } catch { case _: Throwable => None }
    }
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sample_sum", LongType, nullable = false)
  ))

  /** Batched REAL audio decode over a binary column — same per-partition
    * seam as [[decodeImages]]; undecodable rows drop. */
  def decodeAudio(df: DataFrame, binCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("audio", audioFeatureSchema))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          AudioCodec.decodePcmFeatures(r.getAs[Array[Byte]](idx)).map {
            case (sr, ch, n, sum) => Row.fromSeq(r.toSeq :+ Row(sr, ch, n, sum))
          }
        }
      }
    }(enc)
  }

  /** Deterministic synthetic WAV for a row id: sample count and every
    * sample are closed-form in the id (same oracle trick as
    * [[synthPng]]). 16-bit mono PCM at 8 kHz. */
  def synthWav(id: Long): Array[Byte] = {
    val n = (64 + Math.floorMod(id, 192L)).toInt
    val samples = Array.tabulate(n) { i =>
      (Math.floorMod(i.toLong * 37L + id * 13L, 4096L) - 2048L).toShort
    }
    AudioCodec.encodeWav(samples, 8000)
  }

  /** Deterministic synthetic PNG for a row id: dimensions and every pixel
    * are closed-form functions of the id, so an oracle can recompute the
    * decoded features without decoding — which makes the ENCODE→DECODE
    * round-trip through the real codec byte-exactly checkable in SQL.
    */
  def synthPng(id: Long): Array[Byte] = synthPngVariant(id, flips = 0)

  /** [[synthPng]] with the green LSB of the first `flips` pixels (row-
    * major) inverted — a controlled NEAR-duplicate: the perceptual
    * distance is a handful of sub-quantization luminance nudges, while
    * the bytes (and any exact hash) differ completely. This is THE one
    * pixel-formula definition — synthPng is the flips = 0 case, so the
    * near-duplicate fixture property (variant == base except green
    * LSBs) holds by construction, not by parallel maintenance. */
  def synthPngVariant(id: Long, flips: Int): Array[Byte] = {
    val w = (8 + Math.floorMod(id, 24L)).toInt
    val h = (8 + Math.floorMod(id * 7L, 24L)).toInt
    ImageCodec.encodePng(w, h, (x, y) => {
      val r = Math.floorMod(x * 31L + y * 17L + id, 256L).toInt
      val g0 = Math.floorMod(x * 13L + y * 29L + id * 3L, 256L).toInt
      val b = Math.floorMod(x * 7L + y * 11L + id * 5L, 256L).toInt
      val g = if (y * w + x < flips) g0 ^ 1 else g0
      (r << 16) | (g << 8) | b
    })
  }

  /** 64-bit difference hash (dHash) of an image — the classic perceptual
    * fingerprint (LAION-style image near-dup pipelines): decode,
    * grayscale (integer 299/587/114 weights), AREA-AVERAGE down to a 9x8
    * grid with pure integer arithmetic (no Graphics2D resampling, whose
    * filters vary across JVMs — determinism is an API here), one bit per
    * horizontal neighbor comparison. Images narrower than the grid get
    * clamped (overlapping) cells rather than failing. None for
    * undecodable bytes, mirroring [[ImageCodec.decodeRgbFeatures]]. */
  def dHashBytes(bytes: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val cells = Array.ofDim[Long](8, 9) // [row][col] mean gray * denom
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 9) {
          val x0 = cx * w / 9; val x1 = math.max((cx + 1) * w / 9, x0 + 1)
          val y0 = cy * h / 8; val y1 = math.max((cy + 1) * h / 8, y0 + 1)
          var sum = 0L
          var y = y0
          while (y < h && y < y1) {
            var x = x0
            while (x < w && x < x1) {
              val p = img.getRGB(x, y)
              sum += ((p >> 16) & 0xff) * 299L + ((p >> 8) & 0xff) * 587L +
                (p & 0xff) * 114L
              x += 1
            }
            y += 1
          }
          val n = (math.min(x1, w) - x0).toLong * (math.min(y1, h) - y0)
          cells(cy)(cx) = if (n > 0) sum / n else 0L
          cx += 1
        }
        cy += 1
      }
      var sig = 0L
      var k = 0
      while (k < 64) {
        val row = k / 8; val colI = k % 8
        if (cells(row)(colI) > cells(row)(colI + 1)) sig |= (1L << k)
        k += 1
      }
      Some(sig)
    }
  }

  private val dHashUdf = udf((bytes: Array[Byte]) =>
    if (bytes == null) None else dHashBytes(bytes))

  /** dHash column over a binary image column (null for undecodable). */
  def dHash(bin: Column): Column = dHashUdf(bin)

  /** Perceptual near-duplicate image pairs: dHash per payload (one
    * decode pass, map-side), then the SAME banded hamming kernel the
    * text SimHash path uses ([[graft.operators.Dedup.signaturePairs]] —
    * 4 x 16-bit chunks, EXACT recall at hamming <= 3 by pigeonhole, per-
    * bucket primitive-array scan). Undecodable payloads drop out rather
    * than poisoning a bucket. Output (id_a, id_b, hamming), id_a < id_b. */
  def imageNearDup(df: DataFrame, binCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    // validate BEFORE the long cast: a string id would cast to null and
    // the kernel would silently suppress every pair (same contract as
    // Dedup.signaturePairs, which this cast would otherwise mask)
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"imageNearDup needs an integral id column; '$idCol' is $idType")
    graft.operators.Dedup.signaturePairs(
      graft.Tables.spread(df)
        .select(col(idCol).cast("long").as("_id"), dHash(col(binCol)).as("_sig"))
        .filter(col("_sig").isNotNull),
      "_id", "_sig", maxHamming)
  }

  /** Attach a binary payload column derived from a string column (the
    * testdata has no real blobs; `encode(text)` makes the plumbing real).
    */
  def withBinaryPayload(df: DataFrame, srcCol: String, outCol: String = "payload"): DataFrame =
    df.withColumn(outCol, col(srcCol).cast("binary"))

  /** Frame sampling over a binary payload: fixed-size byte frames exploded
    * to one row each — the video/audio frame-sampling shape (one opaque
    * blob -> N frame blobs + per-frame index). Pure column ops (`substring`
    * on BINARY slices bytes), so the whole stage stays in codegen and
    * distributes trivially: the explode multiplies rows, never bytes per
    * row, and downstream per-frame decode parallelizes over frames instead
    * of whole payloads. Zero-byte payloads produce zero frames.
    */
  def frameSample(df: DataFrame, binCol: String, frameBytes: Int): DataFrame = {
    require(frameBytes > 0)
    val nFrames = ceil(length(col(binCol)).cast("double") / frameBytes).cast("int")
    df.withColumn("_nf", nFrames)
      .filter(col("_nf") > 0) // sequence(0, -1) would descend, not be empty
      .withColumn("frame_idx", explode(sequence(lit(0), col("_nf") - 1)))
      // substr with Column operands (not string-interpolated expr SQL):
      // safe for any caller column name, incl. ones needing backticks
      .withColumn("frame",
        substr(col(binCol), col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .drop("_nf")
  }

  /** Batched feature extraction over the binary column: one decoder
    * "session" per partition, rows processed in batches — the exact shape a
    * real model/codec needs. Output adds a `features` struct column.
    */
  def extractFeatures(df: DataFrame, binCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("features", featureSchema))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      // per-partition decoder init would go here (codec session / model)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](idx)
          val (w, h, f) = FakeDecoder.decode(bytes)
          sha.reset()
          val digest = sha.digest(bytes).map("%02x".format(_)).mkString
          Row.fromSeq(r.toSeq :+ Row(bytes.length.toLong, digest, w, h, f))
        }
      }
    }(enc)
  }
}
