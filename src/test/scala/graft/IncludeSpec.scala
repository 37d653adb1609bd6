package graft

import graft.query.Include
import graft.store.VectorStore
import org.apache.spark.sql.functions._

/** The Chroma `include=[...]` projection and `collection.modify`
  * metadata verb. */
class IncludeSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "alpha text", "web", Array(0.1f, 0.2f), 0.5),
    (2L, "beta text", "pdf", Array(0.3f, 0.4f), 0.7))
    .toDF("id", "text", "source", "embedding", "dist")

  test("include groups project ids-always + requested columns, in Chroma order") {
    val got = Include.project(df, "id", Seq("documents", "distances"),
      documentCol = Some("text"), embeddingCol = Some("embedding"),
      distanceCol = Some("dist"))
    assert(got.columns.toSeq == Seq("id", "text", "dist"))
    val all = Include.project(df, "id",
      Seq("documents", "metadatas", "embeddings", "distances"),
      documentCol = Some("text"), embeddingCol = Some("embedding"),
      distanceCol = Some("dist"))
    // metadatas = everything not claimed by a named slot
    assert(all.columns.toSeq == Seq("id", "text", "source", "embedding", "dist"))
    // ids-only: legal (Chroma include=[])
    assert(Include.project(df, "id", Nil).columns.toSeq == Seq("id"))
  }

  test("unknown include entries and unsupplied groups fail loudly") {
    val ex = intercept[IllegalArgumentException] {
      Include.project(df, "id", Seq("document")) // typo
    }
    assert(ex.getMessage.contains("unknown include"))
    val ex2 = intercept[IllegalArgumentException] {
      Include.project(df, "id", Seq("distances")) // get shape: no distance col
    }
    assert(ex2.getMessage.contains("distances"))
  }

  test("include projection reaches the parquet scan: dropped embeddings never leave disk") {
    val root = java.nio.file.Files.createTempDirectory("graft_inc_spec").toString
    val store = VectorStore(root)
    store.create("c", df)
    val got = Include.project(store.read(spark, "c"), "id", Include.GetDefault,
      documentCol = Some("text"), embeddingCol = Some("embedding"),
      distanceCol = Some("dist"))
    val readSchema = got.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("text") && !readSchema.contains("embedding"),
      s"embedding column must be pruned from the scan: $readSchema")
    store.destroy()
  }

  test("modify replaces metadata wholesale and travels with rename/compact/fork") {
    val root = java.nio.file.Files.createTempDirectory("graft_meta_spec").toString
    val store = VectorStore(root)
    store.create("c", df.drop("dist"))
    assert(store.metadata("c").isEmpty)
    store.modify("c", metadata = Some(Map("owner" -> "a", "version" -> "1")))
    store.modify("c", metadata = Some(Map("owner" -> "b"))) // REPLACE, not merge
    assert(store.metadata("c") == Map("owner" -> "b"))
    val renamed = store.modify("c", newName = Some("c2"))
    assert(renamed == "c2" && store.metadata("c2") == Map("owner" -> "b"))
    store.compact(spark, "c2")
    assert(store.metadata("c2") == Map("owner" -> "b"), "metadata lost in compaction swap")
    store.fork("c2", "c3")
    assert(store.metadata("c3") == Map("owner" -> "b"), "metadata not copied by fork")
    // fork's sidecar is a COPY: mutating the fork's metadata must not
    // leak into the source
    store.modify("c3", metadata = Some(Map("owner" -> "fork")))
    assert(store.metadata("c2") == Map("owner" -> "b"))
    val ex = intercept[IllegalArgumentException] {
      store.modify("nope", metadata = Some(Map("x" -> "y")))
    }
    assert(ex.getMessage.contains("does not exist"))
    store.destroy()
  }
}
