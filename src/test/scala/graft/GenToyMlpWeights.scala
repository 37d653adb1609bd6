package graft

/** One-off generator for the checked-in embedder weight fixture
  * `src/main/resources/graft/toy_mlp.bin` (recorded provenance: fixed
  * xorshift64* seed, see MlpEmbedder.writeToyWeights). Re-running it
  * reproduces the identical file byte-for-byte.
  *
  *   sbt "Test/runMain graft.GenToyMlpWeights"
  */
object GenToyMlpWeights {
  def main(args: Array[String]): Unit = {
    val p = java.nio.file.Paths.get("src/main/resources/graft/toy_mlp.bin")
    graft.embed.MlpEmbedder.writeToyWeights(p)
    println(s"wrote ${java.nio.file.Files.size(p)} bytes to $p")
  }
}
