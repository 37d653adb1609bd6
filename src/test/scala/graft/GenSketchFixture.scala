package graft

import org.apache.spark.sql.SparkSession

/** One-off generator for the checked-in sketch expected-output fixture
  * `src/main/resources/graft/sketch_fixture_sf001.csv` — the approx
  * halves of `q12_distinct_sketch` / `q44_percentile_sketch` at the
  * sf0.01 gate scale.
  *
  * HLL++ registers merge by max and quantile summaries by deterministic
  * compaction, so both sketches are reproducible on fixed input — the
  * r13 determinism sweep already showed the dumps byte-identical at 8
  * vs 32 threads, and this generator re-asserts it by computing at BOTH
  * thread counts and requiring equality before writing. The fixture is
  * a REGRESSION pin (derived from the sketches it checks): independent
  * evidence is the error-bound assertions in QuerySemanticsSpec /
  * ScaleSpec and the EXACT columns, which the gate oracle recomputes
  * relationally rather than from this file.
  *
  *   sbt "Test/runMain graft.GenSketchFixture"
  */
object GenSketchFixture {
  private def compute(cpus: Int): Seq[(String, Long, Double, Double)] = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q12 = GraftQueries.all("q12_distinct_sketch")(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val q44 = GraftQueries.all("q44_percentile_sketch")(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(4))).toMap
    val out = q12.keys.toSeq.sorted.map { flag =>
      (flag, q12(flag), q44(flag)._1, q44(flag)._2)
    }
    spark.stop()
    out
  }

  def main(args: Array[String]): Unit = {
    val at8 = compute(8)
    val at32 = compute(32)
    require(at8 == at32,
      s"sketches not thread-count deterministic on this corpus:\n $at8\n $at32")
    val p = java.nio.file.Paths.get(
      "src/main/resources/graft/sketch_fixture_sf001.csv")
    val w = java.nio.file.Files.newBufferedWriter(p)
    try {
      w.write("l_returnflag,n_approx,p50_approx,p99_approx\n")
      at8.foreach { case (flag, n, p50, p99) =>
        w.write(s"$flag,$n,$p50,$p99\n")
      }
    } finally w.close()
    println(s"wrote ${at8.length} rows to $p")
  }
}
