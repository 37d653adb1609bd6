package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileStatus, FileSystem, FileUtil, Options, Path, RawLocalFileSystem}

/** Filesystem seam for the store: every bookkeeping primitive the store's
  * crash-safety and gating mechanisms rely on — atomic marker replace,
  * staged directory swaps, recursive listings/deletes, link-or-copy fork,
  * on-disk size measurement — expressed against Hadoop's `FileSystem`
  * API, so the SAME store code addresses `file:`, `hdfs:`, or any other
  * mounted scheme (the 100 TB deployments this engine targets do not run
  * on `java.io.File`: `File.listFiles` on an HDFS/S3 path returns null,
  * which used to read as "0 tombstone bytes" and silently force the
  * broadcast gate open).
  *
  * Scheme notes:
  *  - the local scheme gets a PRIVATE `RawLocalFileSystem` instance —
  *    not the cached checksummed `LocalFileSystem` — so marker/manifest
  *    writes do not mint `.crc` sidecars and no shared cached FileSystem
  *    object is ever mutated;
  *  - `overwriteRename` goes through `FileContext` with
  *    `Options.Rename.OVERWRITE` — the documented atomic replace (atomic
  *    on HDFS; a POSIX rename on local disks);
  *  - hardlinks exist only on local disks; [[linkOrCopy]] degrades to a
  *    byte copy elsewhere (a fork off local storage is O(bytes), not
  *    O(files) — callers document this);
  *  - size probes FAIL CLOSED: an I/O error on an existing path reads as
  *    `Long.MaxValue` ("too big"), never 0 — gates that compare sizes
  *    then choose the conservative plan (no broadcast, delta-bounding)
  *    instead of the memory-unsafe one.
  */
final class StoreFs private (private[store] val fs: FileSystem,
                             private val conf: Configuration) {

  private def p(s: String): Path = new Path(s)

  def exists(s: String): Boolean = fs.exists(p(s))

  def isDir(s: String): Boolean =
    try fs.getFileStatus(p(s)).isDirectory
    catch { case _: java.io.FileNotFoundException => false }

  def mkdirs(s: String): Unit = { fs.mkdirs(p(s)): Unit }

  /** Children of a directory; empty when the path is missing. Other I/O
    * errors surface to the caller (size gates wrap them fail-closed). */
  def list(s: String): Seq[FileStatus] =
    try fs.listStatus(p(s)).toSeq
    catch { case _: java.io.FileNotFoundException => Nil }

  /** Recursive walk of all regular files under `s` (empty when missing). */
  def walkFiles(s: String): Seq[FileStatus] =
    list(s).flatMap { st =>
      if (st.isDirectory) walkFiles(st.getPath.toString) else Seq(st)
    }

  def deleteTree(s: String): Unit = { fs.delete(p(s), true): Unit }

  /** Contract rename: false when it cannot complete (e.g. dst exists). */
  def rename(src: String, dst: String): Boolean = fs.rename(p(src), p(dst))

  /** Atomic replace of `dst` by `src` (marker updates): readers see the
    * old or the new file, never a torn one — and never NO file.
    *
    * Scheme split verified against hadoop-client-api 3.4.2 bytecode:
    * the local AbstractFileSystem stack (RawLocalFs / ChecksumFs /
    * DelegateToFileSystem) does NOT override the 3-arg
    * `renameInternal`, whose base implementation is DELETE-then-rename
    * — a crash between the two leaves no marker at all, which is
    * exactly the window an atomic replace exists to close. So the
    * local scheme goes straight to POSIX rename via NIO `ATOMIC_MOVE`;
    * remote schemes go through `FileContext` with
    * `Options.Rename.OVERWRITE`, which HDFS's AbstractFileSystem
    * overrides with a genuinely atomic server-side overwrite rename. */
  def overwriteRename(src: String, dst: String): Unit =
    if (isLocal)
      java.nio.file.Files.move(localPath(src), localPath(dst),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    else fctx.rename(p(src), p(dst), Options.Rename.OVERWRITE)

  private lazy val fctx = FileContext.getFileContext(fs.getUri, conf)

  def writeBytes(s: String, bytes: Array[Byte]): Unit = {
    val out = fs.create(p(s), true)
    try out.write(bytes) finally out.close()
  }

  def readBytes(s: String): Array[Byte] = {
    val in = fs.open(p(s))
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }

  def isFile(s: String): Boolean =
    try fs.getFileStatus(p(s)).isFile
    catch { case _: java.io.FileNotFoundException => false }

  /** Atomic Properties-file write — THE sidecar discipline (marker,
    * collection metadata, compaction journal, streaming watermark):
    * serialize, write to `.tmp`, atomically replace. One definition so
    * a fix to the discipline (fsync policy, tmp naming) reaches every
    * sidecar — four hand-rolled copies predated this. */
  def writePropsAtomic(path: String, props: java.util.Properties,
                       comment: String): Unit = {
    val buf = new java.io.ByteArrayOutputStream()
    props.store(buf, comment)
    writeBytes(s"$path.tmp", buf.toByteArray)
    overwriteRename(s"$path.tmp", path)
  }

  /** Read-side twin of [[writePropsAtomic]]; None when the file does
    * not exist. */
  def readProps(path: String): Option[java.util.Properties] = {
    if (!isFile(path)) return None
    val props = new java.util.Properties()
    props.load(new java.io.ByteArrayInputStream(readBytes(path)))
    Some(props)
  }

  /** Hardlink `src` as `dst` when the scheme supports it (local disks),
    * byte copy otherwise. */
  def linkOrCopy(src: String, dst: String): Unit =
    if (isLocal) {
      try java.nio.file.Files.createLink(localPath(dst), localPath(src))
      catch { case _: UnsupportedOperationException | _: java.io.IOException =>
        java.nio.file.Files.copy(localPath(src), localPath(dst)): Unit }
    } else FileUtil.copy(fs, p(src), fs, p(dst), false, conf): Unit

  def copyFile(src: String, dst: String): Unit =
    if (isLocal) java.nio.file.Files.copy(localPath(src), localPath(dst)): Unit
    else FileUtil.copy(fs, p(src), fs, p(dst), false, conf): Unit

  /** Total bytes of all files under `s`, FAILING CLOSED: a missing path
    * is 0, but an I/O error on an existing path reads as Long.MaxValue
    * so size-gated decisions stay conservative. Uses
    * `getContentSummary` — ONE server-side RPC on HDFS (a driver-side
    * recursive listStatus walk would issue one RPC per directory, which
    * on a million-file collection could cost more than the work the
    * size gates it feeds are trying to avoid); the local implementation
    * walks internally, same cost as before. */
  def treeBytesFailClosed(s: String): Long =
    try fs.getContentSummary(p(s)).getLength
    catch {
      case _: java.io.FileNotFoundException => 0L
      case _: java.io.IOException => Long.MaxValue
    }

  def isLocal: Boolean = {
    val sch = fs.getUri.getScheme
    sch == null || sch == "file"
  }

  private def localPath(s: String): java.nio.file.Path =
    java.nio.file.Paths.get(p(s).toUri.getPath)

  /** Local-disk view of a listed file (callers must be on the local
    * scheme — inode checks, split engineering in specs). */
  def toLocalFile(st: FileStatus): java.io.File =
    new java.io.File(st.getPath.toUri.getPath)
}

object StoreFs {

  // one StoreFs per scheme+authority — marker reads sit on the mutation
  // hot path and must not rebuild a Hadoop Configuration per call (the
  // same per-scheme caching FileSystem.get itself does)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, StoreFs]()

  /** Resolve the filesystem owning `root` with the active Spark session's
    * Hadoop configuration (plain `new Configuration()` off-session).
    * Instances are cached per scheme+authority — WITH the Configuration
    * captured at FIRST resolution of that scheme, the same trade
    * Hadoop's own `FileSystem.get` cache makes (per scheme+authority+ugi,
    * first conf wins). A process that reconfigures credentials/fs
    * settings for an already-resolved scheme mid-flight keeps the first
    * binding; that is a process-lifecycle boundary, not a per-call one. */
  def forPath(root: String): StoreFs = {
    val uri = new Path(root).toUri
    val key = s"${uri.getScheme}://${uri.getAuthority}"
    cache.computeIfAbsent(key, _ => {
      val conf = org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sessionState.newHadoopConf()).getOrElse(new Configuration())
      val fs =
        if (uri.getScheme == null || uri.getScheme == "file") {
          // private raw instance: no .crc sidecars, no shared-cache mutation
          val raw = new RawLocalFileSystem()
          raw.initialize(java.net.URI.create("file:///"), conf)
          raw
        } else new Path(root).getFileSystem(conf)
      new StoreFs(fs, conf)
    })
  }
}
