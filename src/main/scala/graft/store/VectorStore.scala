package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

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

  def create(name: String, df: DataFrame, partitionBy: Seq[String] = Nil,
             manifest: Option[CollectionManifest] = None): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path(name))
    // write AFTER the parquet overwrite (which clears the directory) so
    // the binding can never outlive the data it describes
    manifest.foreach(CollectionManifest.write(path(name), _))
  }

  /** Create a collection supporting id-level mutation (upsert / update /
    * delete / get) — rows gain a hidden write-sequence column and the
    * collection gains a tombstone log; see [[MutableCollection]] for the
    * merge-on-read design. Read mutable collections through
    * [[MutableCollection.readLive]] (plain [[read]] sees dead versions). */
  def createMutable(name: String, df: DataFrame, idCol: String,
                    partitionBy: Seq[String] = Nil,
                    manifest: Option[CollectionManifest] = None): MutableCollection = {
    require(df.columns.contains(idCol),
      s"id column '$idCol' is not in the frame (${df.columns.mkString(", ")})")
    create(name, df.withColumn(MutableCollection.SeqCol, lit(0L)),
      partitionBy, manifest)
    MutableCollection.Marker.write(path(name), MutableCollection.Marker(idCol, 0L))
    MutableCollection(this, name)
  }

  /** Handle to an existing mutable collection (fails fast otherwise). */
  def mutable(name: String): MutableCollection = {
    recoverStranded()
    val mc = MutableCollection(this, name)
    mc.idCol: Unit // validates the marker exists
    mc
  }

  def append(name: String, df: DataFrame, partitionBy: Seq[String] = Nil,
             manifest: Option[CollectionManifest] = None): Unit = {
    require(MutableCollection.Marker.read(path(name)).isEmpty,
      s"collection '$name' is mutable — raw append would bypass the " +
        "sequence column; go through VectorStore.mutable(name).upsert")
    // the Chroma-bound-embedder contract (PDFToChromaIngester.py:51-54):
    // an embedder-bound collection rejects appends that do not declare
    // the SAME embedding space — the silent-mixed-space failure mode is
    // exactly what the manifest exists to prevent
    (this.manifest(name), manifest) match {
      case (Some(have), Some(declared)) =>
        require(have.fingerprint == declared.fingerprint,
          s"append to '$name' with a different embedder manifest: collection " +
            s"is bound to ${have.canonical} but the append declares ${declared.canonical}")
      case (Some(have), None) =>
        throw new IllegalArgumentException(
          s"collection '$name' is bound to embedder ${have.canonical} — " +
            "append must declare the matching manifest")
      case _ => // unbound collection, or first binding below
    }
    val w = df.write.mode("append")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path(name))
    if (this.manifest(name).isEmpty)
      manifest.foreach(CollectionManifest.write(path(name), _))
  }

  /** Dynamic partition overwrite: replace ONLY the partitions present
    * in `df`, leaving every other partition's files untouched — the
    * incremental-index maintenance primitive (a batch that lands in 3
    * of 1000 cells rewrites 3 directories, not the collection). */
  def overwritePartitions(name: String, df: DataFrame, partitionBy: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionBy: _*).parquet(path(name))

  /** The embedder manifest bound to a collection, if any. */
  def manifest(name: String): Option[CollectionManifest] = {
    recoverStranded()
    CollectionManifest.read(path(name))
  }

  def read(spark: SparkSession, name: String): DataFrame = {
    recoverStranded()
    spark.read.parquet(path(name))
  }

  /** The collection's CURRENT rows: the tombstone-merged live view for
    * mutable collections, a plain read otherwise — what every QUERY
    * path should consume (raw [[read]] sees dead row versions on a
    * mutable collection). */
  def readCurrent(spark: SparkSession, name: String): DataFrame = {
    recoverStranded()
    if (MutableCollection.Marker.read(path(name)).isDefined)
      MutableCollection(this, name).readLive(spark)
    else spark.read.parquet(path(name))
  }

  /** Live count — metadata-only over parquet footers for immutable
    * collections (no data pages scanned); tombstone-merged for mutable
    * ones (correct beats fast: a raw footer count would include dead
    * versions). */
  def count(spark: SparkSession, name: String): Long =
    readCurrent(spark, name).count()

  /** Null-safe listing: listFiles() returns null on an unreadable dir or
    * when racing a concurrent compaction swap deleting it mid-walk. */
  private def ls(f: java.io.File): Array[java.io.File] =
    Option(f.listFiles()).getOrElse(Array.empty)

  /** Crash recovery for the compaction swap: a death between the two
    * renames leaves the data ONLY under `name__old` (which list()
    * filters out — the collection would silently vanish). Detect the
    * stranded layout on every open/listing and rename it back. */
  private def recoverStranded(): Unit =
    ls(new java.io.File(root)).foreach { f =>
      val n = f.getName
      if (n.endsWith("__old")) {
        val base = new java.io.File(root, n.stripSuffix("__old"))
        if (!base.exists()) f.renameTo(base): Unit
      }
    }

  def list(): Seq[String] = {
    recoverStranded()
    val d = new java.io.File(root)
    if (!d.isDirectory) Nil
    else ls(d).filter(_.isDirectory).map(_.getName)
      // in-flight compaction scratch (a crash mid-compact can leave
      // either behind) is not a collection
      .filterNot(n => n.endsWith("__compacting") || n.endsWith("__old"))
      .sorted.toSeq
  }

  /** All data files of a collection (recursive — partitioned layouts
    * keep files one directory down). */
  def dataFiles(name: String): Seq[java.io.File] = {
    recoverStranded()
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) ls(f).toSeq.flatMap(walk)
      else if (f.getName.startsWith("part-")) Seq(f)
      else Nil
    val d = new java.io.File(path(name))
    if (d.exists()) walk(d) else Nil
  }

  /** Compact a collection's small files — the maintenance op every
    * long-lived ingest store needs: streaming/incremental appends leave
    * thousands of KB-sized files, and at 100 TB the resulting scan-task
    * and NameNode/listing overhead dominates query latency.
    *
    * Reads the collection, coalesces to ceil(bytes/targetBytes) output
    * files — `coalesce`, NOT `repartition`: compaction is an IO rewrite
    * and must not pay a full shuffle pass — writes to a swap directory,
    * then atomically renames into place. On an object store the rename
    * becomes a manifest/pointer swap (table formats exist for exactly
    * this); the read+coalesce+write core is unchanged.
    *
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, name: String,
              targetBytes: Long = 128L << 20): (Int, Int) = {
    // the swap would silently DROP the tombstone log and marker —
    // resurrecting every deleted row; mutable collections compact
    // through their own tombstone-folding path
    require(MutableCollection.Marker.read(path(name)).isEmpty,
      s"collection '$name' is mutable — use VectorStore.mutable(name).compact " +
        "(file compaction here would discard the tombstone log)")
    val before = dataFiles(name)
    val totalBytes = before.map(_.length).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    // a hive-partitioned layout is detected from the data-file paths and
    // PRESERVED — flattening it would silently break every pruned read;
    // files merge within partition directories
    val rootPath = new java.io.File(path(name)).toPath
    val partCols = before.headOption.toSeq.flatMap { f =>
      rootPath.relativize(f.toPath.getParent).toString
        .split("/").filter(_.contains("=")).map(_.takeWhile(_ != '='))
    }
    val tmpName = name + "__compacting"
    val w = read(spark, name).coalesce(nOut).write.mode("overwrite")
    (if (partCols.nonEmpty) w.partitionBy(partCols.toSeq: _*) else w)
      .parquet(path(tmpName))
    // the embedder binding survives compaction — the rewrite changes file
    // layout, never the embedding space
    CollectionManifest.read(path(name))
      .foreach(CollectionManifest.write(path(tmpName), _))
    // swap with a recovery path: stage the original ASIDE first — a
    // delete-then-rename would strand the collection with no data under
    // its name if the second rename failed (open handles, NFS quirks)
    val dst = new java.io.File(path(name))
    val old = new java.io.File(path(name + "__old"))
    rmTree(old)
    require(dst.renameTo(old), s"compaction: cannot stage $name aside")
    if (!new java.io.File(path(tmpName)).renameTo(dst)) {
      // report a failed restore DISTINCTLY — claiming "restored" on a
      // discarded rename result could send an operator looking at the
      // wrong directory; recoverStranded() also heals this on next open
      val restored = old.renameTo(dst)
      throw new IllegalStateException(
        if (restored) s"compaction swap failed for $name; original restored"
        else s"compaction swap failed for $name AND restore failed — " +
          s"data is under ${name}__old (auto-recovered on next open)")
    }
    rmTree(old)
    (before.size, dataFiles(name).size)
  }

  /** Rename a collection (the Chroma `collection.modify(name=...)`
    * shape): one atomic directory move — every sidecar (manifest,
    * mutable marker, tombstone log) travels with it; nothing is
    * rewritten. Fails fast on a missing source or existing target
    * rather than clobbering. */
  /** Shared target-name validation for the verbs that mint a collection
    * name (rename / fork): plain path segment, and none of the
    * compaction machinery's reserved suffixes — "x__old" would be
    * deleted by a later compact of "x" (rm of the staging dir) or
    * silently renamed by recoverStranded, and "x__compacting" is
    * invisible to list() and overwritten by a compact of "x". */
  private def requireMintableName(to: String): Unit = {
    require(to.nonEmpty && !to.contains('/') && !to.contains('\\') &&
      to != "." && to != "..",
      s"collection name '$to' must be a plain path segment")
    require(!to.endsWith("__old") && !to.endsWith("__compacting"),
      s"collection name '$to' collides with the compaction staging suffixes")
  }

  def rename(from: String, to: String): Unit = {
    recoverStranded()
    requireMintableName(to)
    val src = new java.io.File(path(from))
    val dst = new java.io.File(path(to))
    require(src.isDirectory, s"collection '$from' does not exist")
    require(!dst.exists(), s"collection '$to' already exists")
    require(src.renameTo(dst), s"rename '$from' -> '$to' failed")
  }

  /** Zero-copy writable fork of a collection (the lakehouse SHALLOW
    * CLONE verb): every data file and sidecar is HARDLINKED into the
    * new collection directory — O(files) metadata operations, zero
    * bytes moved, so forking a 100 TB collection for an experiment
    * costs what an `ls` costs. Parquet files are immutable by the
    * store's write discipline (appends/compactions create NEW files;
    * the staged swap replaces directories, never rewrites in place), so
    * the link-sharing is safe: mutations on either side only ADD files
    * in their own directory or swap their own directory away — the
    * shared bytes are never edited through either name — and the same
    * holds for tombstone-log parquet (appends create new files,
    * truncation deletes names). Non-parquet sidecars (the mutable
    * marker, the embedder manifest) are COPIED, not linked: the marker
    * is atomically REPLACED on every seq allocation, which would sever
    * a link anyway — copying makes the bookkeeping independence
    * explicit, so a forked mutable collection versions independently.
    * Falls back to a byte copy if the filesystem refuses links. */
  def fork(from: String, to: String): Unit = {
    recoverStranded()
    requireMintableName(to)
    val src = new java.io.File(path(from))
    val dst = new java.io.File(path(to))
    require(src.isDirectory, s"collection '$from' does not exist")
    require(!dst.exists(), s"collection '$to' already exists")
    def go(s: java.io.File, d: java.io.File): Unit = {
      if (s.isDirectory) {
        require(d.mkdirs() || d.isDirectory, s"cannot create ${d.getPath}")
        ls(s).foreach(c => go(c, new java.io.File(d, c.getName)))
      } else if (s.getName.startsWith("part-")) {
        // parquet payloads — data AND tombstone-log files — are
        // HARDLINKED: both are immutable under the write discipline
        // (appends create new files, compaction swaps directories, the
        // log truncates by deleting names), so sharing bytes is safe
        try java.nio.file.Files.createLink(d.toPath, s.toPath)
        catch { case _: UnsupportedOperationException | _: java.io.IOException =>
          java.nio.file.Files.copy(s.toPath, d.toPath): Unit }
      } else {
        // non-parquet sidecars (marker, manifest, _SUCCESS): copied —
        // the marker is atomically REPLACED on every seq allocation,
        // which would sever a link anyway; copying makes the
        // bookkeeping independence explicit
        java.nio.file.Files.copy(s.toPath, d.toPath): Unit
      }
    }
    // staged like every other multi-step write in this file: build
    // under the reserved (list-invisible) suffix, then ONE atomic
    // rename — a crash mid-walk leaves only an inert staging dir that
    // the next fork clears, never a half-populated collection that
    // reads as valid and blocks retry
    val tmp = new java.io.File(path(to + "__compacting"))
    rmTree(tmp)
    go(src, tmp)
    require(tmp.renameTo(dst), s"fork '$from' -> '$to': final rename failed")
  }

  /** First `n` current rows by id order (the Chroma `peek(n)` shape) —
    * a bounded look, not a scan: TakeOrdered, k rows per partition. */
  def peek(spark: SparkSession, name: String, n: Int = 10,
           idCol: String = "id"): DataFrame =
    readCurrent(spark, name).orderBy(idCol).limit(n)

  def drop(name: String): Unit = rmTree(new java.io.File(path(name)))

  /** Remove the whole store root (scratch stores in tests/queries). */
  def destroy(): Unit = rmTree(new java.io.File(root))

  private def rmTree(f: java.io.File): Unit = {
    def rm(g: java.io.File): Unit = {
      if (g.isDirectory) ls(g).foreach(rm)
      g.delete(): Unit
    }
    if (f.exists()) rm(f)
  }
}

object VectorStore {
  /** Tenant/database addressing (the Chroma Cloud client shape —
    * `CloudClient(tenant=..., database=...)`,
    * /root/reference/src/ChromaCloudIngester.py:31-32, and
    * RagWorkflow.py's HttpClient): a database under a tenant is a store
    * root at `<root>/<tenant>/<database>/` — two filesystem levels, no
    * extra machinery, and every store verb (create / mutable / rename /
    * compact / list) works unchanged inside it. Names are validated as
    * single path segments so a tenant id can never escape the root. */
  def forTenant(root: String, tenant: String, database: String): VectorStore = {
    def ok(s: String) = s.nonEmpty && !s.contains('/') && !s.contains('\\') &&
      s != "." && s != ".."
    require(ok(tenant) && ok(database),
      s"tenant/database must be plain path segments, got '$tenant'/'$database'")
    val dir = new java.io.File(new java.io.File(root, tenant), database)
    dir.mkdirs()
    VectorStore(dir.getPath)
  }
}
