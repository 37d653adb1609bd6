package graft

/** One-off generator for the checked-in transformer weight fixture
  * `src/main/resources/graft/toy_transformer.bin` (recorded provenance:
  * fixed xorshift64* seed, see TransformerEmbedder.writeToyWeights).
  * Re-running it reproduces the identical file byte-for-byte.
  *
  *   sbt "Test/runMain graft.GenToyTransformerWeights"
  */
object GenToyTransformerWeights {
  def main(args: Array[String]): Unit = {
    val p = java.nio.file.Paths.get("src/main/resources/graft/toy_transformer.bin")
    graft.embed.TransformerEmbedder.writeToyWeights(p)
    println(s"wrote ${java.nio.file.Files.size(p)} bytes to $p")
  }
}
