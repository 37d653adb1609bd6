package graft

import graft.text.QualityClassifier

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val model = QualityClassifier.load()

  /** Independent scalar re-implementation (java MessageDigest, explicit
    * loops) of the feature/hash/score pipeline — shares NO Spark
    * expression code with the implementation under test. */
  private def expected(text: String): (Long, Double, Boolean) = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    val feats = toks ++ toks.sliding(2).withFilter(_.size == 2).map(_.mkString(" "))
    val md = java.security.MessageDigest.getInstance("MD5")
    var logit = model.bias
    feats.foreach { f =>
      val hex = md.digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(6)
      val bkt = (java.lang.Long.parseLong(hex, 16) % QualityClassifier.NumBuckets).toInt
      logit += model.weights(bkt)
    }
    val n = feats.size.toLong
    val score = math.floor(
      logit.toDouble / n / QualityClassifier.FpScale * 1e6 + 0.5) / 1e6
    (n, score, score > 0.0)
  }

  test("weight fixture loads: bias + 256 fixed-point weights, regeneration is byte-identical") {
    assert(model.weights.length == 256)
    val tmp = java.nio.file.Files.createTempFile("qlr", ".txt")
    QualityClassifier.writeToyWeights(tmp)
    val regen = java.nio.file.Files.readAllBytes(tmp)
    val checked = getClass.getResourceAsStream("/graft/quality_lr.txt").readAllBytes()
    assert(java.util.Arrays.equals(regen, checked))
    java.nio.file.Files.delete(tmp)
  }

  test("score matches an independent scalar reimplementation on varied docs") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "single",
      "Mixed CASE  with   irregular    spacing and trailing   ",
      "a a a a a a a a",
      "unicode tökens höher straße naïve café")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = QualityClassifier.score(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == expected(t), s"doc $i '$t': got ${got(i.toLong)}, want ${expected(t)}")
    }
  }

  test("NULL text yields no row (matches the oracle's unnest semantics)") {
    val df = Seq((1L, Some("real text here")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = QualityClassifier.score(df, "text", "doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("n_feats is 2n-1 for an n-token doc; scoring is deterministic across partitionings") {
    val df = Seq((1L, "one two three four five")).toDF("doc_id", "text")
    val r1 = QualityClassifier.score(df, "text", "doc_id").collect().head
    assert(r1.getLong(1) == 9L)
    val r32 = QualityClassifier.score(df.repartition(32), "text", "doc_id").collect().head
    assert(r1.getDouble(2) == r32.getDouble(2))
  }
}
