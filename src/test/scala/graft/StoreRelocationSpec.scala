package graft

import graft.store.VectorStore
import graft.text.TextIndex
import org.apache.spark.sql.functions._

/** Store directories are path-RELOCATABLE: every sidecar (markers,
  * watermarks, stats, banding parameters) records names and numbers,
  * never absolute paths — so a byte copy of a store root is
  * indistinguishable from having built it there. This is the contract
  * the per-process mutation fixtures in [[GraftQueries]] lean on (build
  * a pristine pre-verb state once, clone the DIRECTORY per gate
  * invocation), and the property these tests pin:
  *  1. a cloned store answers searches identically to its source;
  *  2. mutating the clone leaves the source's answers (and bytes)
  *     untouched — clones are fully isolated.
  */
class StoreRelocationSpec extends SparkSpec {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // the EXACT clone the mutation fixtures use (hardlinked part-* files,
  // copied sidecars) — the tests pin the fixture's real mechanism
  private def copyTree(src: String, dst: String): Unit =
    VectorStore.cloneTreeLinked(src, dst)

  private def treeDigest(root: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[(String, Long)] =
      if (f.isDirectory) f.listFiles().sortBy(_.getName).toIndexedSeq.flatMap(walk)
      else Seq(f.getAbsolutePath.stripPrefix(root) -> f.length)
    walk(new java.io.File(root)).toMap
  }

  test("text index: clone answers identically; mutating it leaves the source intact") {
    val docs = Tables.documents(spark, sf)
    val src = VectorStore(tmp("graft_reloc_src"))
    try {
      TextIndex.buildTextIndex(src, "docs_text", docs, "text", "doc_id",
        nBuckets = 8)
      val bytesBefore = treeDigest(src.root)
      val cloneRoot = tmp("graft_reloc_dst")
      copyTree(src.root, cloneRoot)
      val clone = VectorStore(cloneRoot)
      try {
        // the clone really is LINKED, not copied: parquet payloads share
        // inodes with the source (the O(metadata) property the fixtures
        // buy), while sidecars are independent copies
        val linked = java.nio.file.Files.walk(java.nio.file.Paths.get(cloneRoot))
          .filter(p => p.getFileName.toString.startsWith("part-"))
          .filter(p => java.nio.file.Files
            .getAttribute(p, "unix:nlink").asInstanceOf[Number].intValue() >= 2)
          .count()
        assert(linked > 0, "expected hardlinked part-* files in the clone")
        def search(st: VectorStore) =
          TextIndex.bm25SearchStored(spark, st, "docs_text",
            terms = Seq("join", "query"), k = 10)
            .collect().map(_.toSeq).toSeq
        assert(search(clone) == search(src),
          "cloned index must answer exactly like its source")
        // mutate ONLY the clone; the source must not notice
        TextIndex.deleteFromTextIndex(clone, "docs_text",
          docs.filter(col("doc_id") % 3 === 0).select("doc_id"))
        assert(search(src) == search(VectorStore(src.root)),
          "source search drifted after clone mutation")
        assert(treeDigest(src.root) == bytesBefore,
          "clone mutation wrote into the source tree")
        assert(search(clone) != search(src),
          "the delete must be visible on the clone (sanity)")
      } finally clone.destroy()
    } finally src.destroy()
  }

  test("mutable collection + SQ index: relocated store resumes the lifecycle") {
    import graft.operators.MutableSq
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val src = VectorStore(tmp("graft_reloc_msrc"))
    try {
      src.createMutable("vecs", e, "vec_id")
      MutableSq.attach(spark, src, "vecs", "embedding", "vecs_sq",
        ncells = 4, iters = 2)
      val cloneRoot = tmp("graft_reloc_mdst")
      copyTree(src.root, cloneRoot)
      val clone = VectorStore(cloneRoot)
      try {
        // the clone's marker, quantizer sidecar, and version ledger must
        // all resolve at the NEW path: run the full mutate-refresh-search
        // lifecycle on it
        val mc = clone.mutable("vecs")
        mc.upsert(e.filter(col("vec_id") % 10 === 3)
          .withColumn("embedding", reverse(col("embedding"))))
        mc.delete(e.filter(col("vec_id") % 10 === 6).select("vec_id"))
        MutableSq.refresh(spark, clone, "vecs", "vecs_sq")
        val qv = e.filter(col("vec_id") === 0).select("embedding")
          .head.getSeq[Float](0).map(_.toDouble).toArray
        val got = MutableSq.search(spark, clone, "vecs", "vecs_sq", qv,
          k = 5, nprobe = 4).collect()
        assert(got.length == 5)
        assert(!got.map(_.getLong(0)).exists(_ % 10 == 6),
          "deleted ids surfaced from the relocated index")
        // and the source still reads its pre-mutation state
        val live = src.mutable("vecs").readLive(spark).count()
        assert(live == e.count(), "source live count changed")
      } finally clone.destroy()
    } finally src.destroy()
  }
}
