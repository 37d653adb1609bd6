package graft

import graft.store.{CollectionManifest, MutableCollection, VectorStore}
import org.apache.spark.sql.functions._

/** The store driven through a Hadoop-FileSystem path (explicit `file:`
  * scheme) — pins that every bookkeeping primitive the store's
  * crash-safety and gating mechanisms rely on (atomic marker replace,
  * staged compaction swaps, rename, fork, tombstone/footprint size
  * probes) works addressed through the `FileSystem` API rather than
  * `java.io.File`, i.e. the store is not silently local-only. The same
  * code paths then run against `hdfs:` or any mounted scheme; only
  * [[VectorStore.fork]]'s hardlink fast path is local (it degrades to a
  * byte copy elsewhere, as documented). */
class StoreFsSpec extends SparkSpec {
  import spark.implicits._

  private def schemeRoot(): String =
    "file:" + java.nio.file.Files.createTempDirectory("graft_fs_spec").toString

  test("mutable lifecycle through a file:-scheme root: upsert/delete/snapshot/CDC/compact") {
    val store = VectorStore(schemeRoot())
    val mc = store.createMutable("c",
      Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("id", "text"), "id")
    val s0 = mc.currentSeq
    mc.upsert(Seq((2L, "TWO"), (4L, "four")).toDF("id", "text"))
    mc.deleteIds(spark, Seq(1L))
    assert(mc.readLive(spark).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(2L -> "TWO", 3L -> "three", 4L -> "four"))
    // snapshot + CDC reconstruct through the scheme'd path (the CDC size
    // tier walks the footprint through the FileSystem API)
    assert(mc.readLiveAt(spark, s0).count() == 3)
    val changes = mc.changesBetween(spark, s0, mc.currentSeq).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(changes == Seq(("delete", 1L), ("insert", 4L), ("update", 2L)))
    // marker atomic-replace sequence survives; compact swaps directories
    val preCompact = mc.currentSeq
    mc.compact(spark)
    val after = store.mutable("c")
    assert(after.floorSeq == preCompact)
    assert(after.readLive(spark).count() == 3)
    // post-compact mutations keep working on the swapped directory
    after.upsert(Seq((5L, "five")).toDF("id", "text"))
    assert(after.countLive(spark) == 4)
    store.destroy()
  }

  test("rename, fork, and immutable compact through a file:-scheme root") {
    val store = VectorStore(schemeRoot())
    store.create("a", Seq((1L, "x"), (2L, "y")).toDF("id", "v"))
    store.rename("a", "b")
    assert(store.list() == Seq("b"))
    assert(store.read(spark, "b").count() == 2)
    // fork links bytes on the local scheme (inode check via the
    // local-file view of the statuses)
    store.fork("b", "br")
    val ino = java.nio.file.Files.getAttribute(
      store.dataFiles("b").head.toPath, "unix:ino")
    assert(store.dataFiles("br").map(f =>
      java.nio.file.Files.getAttribute(f.toPath, "unix:ino")).contains(ino),
      "fork on the local scheme must hardlink data files")
    // many-file layout compacts through the staged FileSystem swap
    store.create("m", spark.range(1000).toDF("id").repartition(8))
    val (before, afterN) = store.compact(spark, "m")
    assert(before == 8 && afterN == 1)
    assert(store.read(spark, "m").count() == 1000)
    store.destroy()
  }

  test("manifest sidecar round-trips through a file:-scheme root") {
    val store = VectorStore(schemeRoot())
    val m = CollectionManifest("hash", "builtin", 16, "passage: ", "query: ", Nil)
    store.create("c", Seq((1L, "t")).toDF("id", "text"), manifest = Some(m))
    assert(store.manifest("c").map(_.fingerprint).contains(m.fingerprint))
    // binding survives compaction (sidecar copied through the swap)
    store.compact(spark, "c")
    assert(store.manifest("c").map(_.fingerprint).contains(m.fingerprint))
    store.destroy()
  }

  test("tenant addressing composes scheme'd roots") {
    val root = schemeRoot()
    val store = VectorStore.forTenant(root, "acme", "prod")
    store.create("c", Seq((1L, "t")).toDF("id", "text"))
    assert(store.read(spark, "c").count() == 1)
    assert(VectorStore.forTenant(root, "acme", "prod").list() == Seq("c"))
    store.destroy()
  }

  test("marker is replaced atomically (no torn reads) under the scheme'd path") {
    val store = VectorStore(schemeRoot())
    val mc = store.createMutable("c", Seq((1L, "t")).toDF("id", "text"), "id")
    (1 to 5).foreach(i => mc.upsert(Seq((i.toLong + 1, s"v$i")).toDF("id", "text")))
    val marker = MutableCollection.Marker.read(s"${store.root}/c").get
    assert(marker.seq == 5L && marker.idCol == "id")
    store.destroy()
  }
}
