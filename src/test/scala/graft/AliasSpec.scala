package graft

import org.apache.spark.sql.functions._

class AliasSpec extends SparkSpec {
  import spark.implicits._

  private def newStore() = {
    val root = java.nio.file.Files.createTempDirectory("graft_aliasspec").toString
    graft.store.VectorStore(root)
  }
  private def tiny = Seq((1L, "a"), (2L, "b")).toDF("id", "v")

  test("alias lifecycle: create, resolve, read-through, atomic swap, drop") {
    val store = newStore()
    try {
      store.create("v1", tiny)
      store.create("v2", tiny.withColumn("v", lit("z")))
      store.createAlias("serving", "v1")
      assert(store.resolve("serving") == "v1")
      assert(store.resolve("v1") == "v1", "a concrete name resolves to itself")
      assert(store.read(spark, "serving").filter($"v" === "z").count() == 0)
      store.swapAlias("serving", "v2")
      assert(store.resolve("serving") == "v2")
      assert(store.read(spark, "serving").filter($"v" === "z").count() == 2,
        "post-swap reads must see the new target")
      assert(store.aliases() == Seq("serving" -> "v2"))
      assert(store.count(spark, "serving") == 2)
      store.dropAlias("serving")
      assert(store.aliases().isEmpty)
      assert(store.resolve("serving") == "serving")
    } finally store.destroy()
  }

  test("namespace stays unambiguous in both directions; registry hidden from list()") {
    val store = newStore()
    try {
      store.create("v1", tiny)
      store.createAlias("serving", "v1")
      assert(store.list() == Seq("v1"), "_aliases must not list as a collection")
      // alias name can't shadow a collection, collection can't mint over an alias
      intercept[IllegalArgumentException](store.createAlias("v1", "v1"))
      intercept[IllegalArgumentException](store.rename("v1", "serving"))
      intercept[IllegalArgumentException](store.fork("v1", "serving"))
      intercept[IllegalArgumentException](store.create("serving", tiny))
      // re-create refused; retarget is explicit
      intercept[IllegalArgumentException](store.createAlias("serving", "v1"))
      // swap to a missing target refused
      intercept[IllegalArgumentException](store.swapAlias("serving", "nope"))
      intercept[IllegalArgumentException](store.dropAlias("nope"))
    } finally store.destroy()
  }

  test("rename does NOT retarget: a dangling alias fails loudly on read") {
    val store = newStore()
    try {
      store.create("v1", tiny)
      store.createAlias("serving", "v1")
      store.rename("v1", "v1_archived")
      assert(store.resolve("serving") == "v1",
        "rename must not silently retarget an alias")
      intercept[Exception](store.read(spark, "serving").collect())
      // explicit re-point heals it
      store.swapAlias("serving", "v1_archived")
      assert(store.read(spark, "serving").count() == 2)
    } finally store.destroy()
  }

  test("write-alias contract: append, mutable mutations, and manifest probes resolve through the alias") {
    val store = newStore()
    try {
      store.create("v1", tiny)
      store.createAlias("serving", "v1")
      store.append("serving", Seq((3L, "c")).toDF("id", "v"))
      assert(store.count(spark, "v1") == 3,
        "append through the alias must land on the target, not mint a shadow dir")
      assert(store.list() == Seq("v1"), "no shadow collection")
      // mutable target: upsert through the alias
      val mc = store.createMutable("mv", tiny, "id")
      mc.idCol: Unit
      store.createAlias("live", "mv")
      store.mutable("live").delete(Seq(1L).toDF("id"))
      assert(store.count(spark, "mv") == 1)
      // manifest probe through an alias reports the target's binding
      assert(store.manifest("serving").isEmpty == store.manifest("v1").isEmpty)
    } finally store.destroy()
  }

  test("alias resolves through readCurrent on a mutable target") {
    val store = newStore()
    try {
      val mc = store.createMutable("mv1", tiny, "id")
      mc.delete(Seq(1L).toDF("id"))
      store.createAlias("live", "mv1")
      assert(store.readCurrent(spark, "live").as[(Long, String)].collect()
        .toSet == Set((2L, "b")),
        "alias + mutable must compose: tombstone-merged view through the alias")
    } finally store.destroy()
  }
}
