package graft

import org.apache.spark.sql.SparkSession

/** One-off generator for the checked-in BPE-encode expected-output
  * fixture `src/main/resources/graft/bpe_apply_sf001.csv` — the oracle
  * table for `text_bpe_apply` at the sf0.01 correctness-gate scale.
  *
  * The fixture is a REGRESSION pin (it is derived from the encoder it
  * checks): the independent correctness evidence for the trainer/encoder
  * is BpeSpec — the classic worked example, exact invariants, and
  * determinism — and the oracle-checked `text_bpe_merges` pair stats.
  * What the fixture adds is that any future drift in trainer tie-breaks,
  * word splitting, or the encode loop hash-mismatches the gate.
  *
  *   sbt "Test/runMain graft.GenBpeApplyFixture"
  */
object GenBpeApplyFixture {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = GraftQueries.all("text_bpe_apply")(spark, "/root/testdata/sf0.01")
      .orderBy("doc_id").collect()
    val p = java.nio.file.Paths.get("src/main/resources/graft/bpe_apply_sf001.csv")
    val w = java.nio.file.Files.newBufferedWriter(p)
    try {
      w.write("doc_id,n_words,n_subwords,n_chars_tok,compression\n")
      rows.foreach { r =>
        w.write(f"${r.getLong(0)}%d,${r.getLong(1)}%d,${r.getLong(2)}%d,${r.getLong(3)}%d,${r.getDouble(4)}%.6f%n")
      }
    } finally w.close()
    println(s"wrote ${rows.length} rows to $p")
    spark.stop()
  }
}
