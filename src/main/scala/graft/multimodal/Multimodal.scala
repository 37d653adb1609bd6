package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `BINARY` payloads + typed metadata,
  * with decode/feature-extract as a batched per-partition stage.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked STUB (`FakeDecoder`) producing deterministic features
  * from the bytes; everything around it — the binary column schema, the
  * partition-batched map (the Scala analog of `mapInPandas` batches), the
  * feature struct shape — is the real pipeline and is what the tests
  * exercise.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("content_sha", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),   // stubbed decode
    StructField("height", IntegerType, nullable = false),  // stubbed decode
    StructField("n_frames", IntegerType, nullable = false) // stubbed decode
  ))

  /** STUB decoder — stands in for an image/audio codec (??? in a real
    * deployment this calls e.g. javax.imageio / ffmpeg). Deterministic
    * pseudo-features derived from the payload so tests are reproducible.
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
