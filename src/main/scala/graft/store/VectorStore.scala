package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed collection store — the Spark analog of the reference's
  * ChromaDB collection lifecycle (/root/reference/src/PDFToChromaIngester.py):
  *
  *  - create_collection with delete-then-recreate (:29-33) = overwrite write
  *  - collection.add (:189-193 / ChromaCloudIngester.py:153-157) = append
  *  - collection.count (:237-247) = parquet metadata-only count
  *  - client.list_collections (RagWorkflow.py:26) = subdirectory listing
  *
  * Layout: `<root>/<collectionName>/` parquet, optionally partitioned by a
  * metadata column (e.g. `category`) so equality `where` filters become
  * partition pruning at scale.
  */
final case class VectorStore(root: String) {
  private def path(name: String) = s"$root/$name"

  def create(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path(name))
  }

  def append(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("append")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path(name))
  }

  def read(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(path(name))

  /** Metadata-only count (Catalyst answers count(*) over parquet from
    * footers without scanning data pages). */
  def count(spark: SparkSession, name: String): Long =
    read(spark, name).count()

  def list(): Seq[String] = {
    val d = new java.io.File(root)
    if (!d.isDirectory) Nil
    else d.listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
  }

  def drop(name: String): Unit = rmTree(new java.io.File(path(name)))

  /** Remove the whole store root (scratch stores in tests/queries). */
  def destroy(): Unit = rmTree(new java.io.File(root))

  private def rmTree(f: java.io.File): Unit = {
    def rm(g: java.io.File): Unit = {
      if (g.isDirectory) g.listFiles().foreach(rm)
      g.delete(): Unit
    }
    if (f.exists()) rm(f)
  }
}
