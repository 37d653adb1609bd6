package graft

import org.apache.spark.sql.SparkSession

/** One-off generator for the checked-in HashEmbedder expected-output
  * fixture `src/main/resources/graft/hash_embed_fixture.csv` — the
  * oracle table for `ingest_embed_fixture`.
  *
  * The fixture is a REGRESSION pin (derived from the embedder it
  * checks): independent correctness evidence for the kernel is
  * EmbedderSpec (unit norm, determinism, sign/index arithmetic) and the
  * `ingest_pipeline` unit-norm oracle. What the fixture adds is that
  * any future drift in FNV-1a constants, tokenization, the 3-gram
  * window, accumulation order, or the normalization hash-mismatches
  * the gate on actual VALUES, not just the norm.
  *
  *   sbt "Test/runMain graft.GenHashEmbedFixture"
  */
object GenHashEmbedFixture {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = GraftQueries.all("ingest_embed_fixture")(spark, "")
      .orderBy("text_id", "pos").collect()
    val p = java.nio.file.Paths.get(
      "src/main/resources/graft/hash_embed_fixture.csv")
    val w = java.nio.file.Files.newBufferedWriter(p)
    try {
      w.write("text_id,pos,val_fp\n")
      rows.foreach { r =>
        w.write(s"${r.getLong(0)},${r.getInt(1)},${r.getLong(2)}\n")
      }
    } finally w.close()
    println(s"wrote ${rows.length} rows to $p")
    spark.stop()
  }
}
