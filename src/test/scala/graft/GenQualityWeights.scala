package graft

/** One-off generator for the checked-in quality-classifier weight
  * fixture `src/main/resources/graft/quality_lr.txt` (fixed xorshift64*
  * seed; see QualityClassifier.writeToyWeights). Re-running reproduces
  * the identical file byte-for-byte.
  *
  *   sbt "Test/runMain graft.GenQualityWeights"
  */
object GenQualityWeights {
  def main(args: Array[String]): Unit = {
    val p = java.nio.file.Paths.get("src/main/resources/graft/quality_lr.txt")
    graft.text.QualityClassifier.writeToyWeights(p)
    println(s"wrote ${java.nio.file.Files.size(p)} bytes to $p")
  }
}
