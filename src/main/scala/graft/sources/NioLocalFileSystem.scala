package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path => HPath, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem for Spark data IO without the per-file process forks
  * the default `file` filesystem (`LocalFileSystem`, a
  * `ChecksumFileSystem`) pays:
  *
  *  1. **A fork+exec per create.** Without libhadoop (not shipped in
  *     this image), `RawLocalFileSystem.setPermission` falls back to
  *     shelling out `chmod` via `ProcessBuilder` — observed in driver
  *     stack samples on EVERY metadata/part-file create (guide §7.3).
  *     Forking an 8 GB JVM for each of the dozens of files a
  *     multi-commit fixture creates is pure overhead; this override
  *     performs the same chmod through java.nio in-process.
  *  2. **A fork+exec per link-status probe.** The base
  *     `getFileLinkStatus` shells out `readlink` per call
  *     (`FileUtil.readLink`), and the FileContext rename/status paths
  *     call it on every pointer flip — r17 driver samples caught the
  *     fork mid-commit. An in-process java.nio lstat answers the
  *     non-symlink case (the only one the engine creates); real
  *     symlinks still take the base path.
  *  3. **A `.crc` sidecar per file.** The checksum wrapper doubles the
  *     creates (and their chmods) and adds verification IO on every
  *     read. HDFS-class deployments run on raw filesystems anyway;
  *     local-mode benching should too.
  *
  * Installed via `fs.file.impl` (+ cache eviction so a pre-registered
  * checksummed instance cannot keep serving) by [[LocalFsInstall]];
  * [[NioLocalFs]] is the AbstractFileSystem face of the same
  * implementation, installed via `fs.AbstractFileSystem.file.impl` so
  * FileContext metadata ops (the commit protocol's pointer flips and
  * status probes) run fork-free as well. Behavior is otherwise exactly
  * `RawLocalFileSystem`.
  */
class NioLocalFileSystem extends RawLocalFileSystem {
  import java.nio.file.attribute.PosixFilePermission._

  override def setPermission(p: HPath, permission: FsPermission): Unit = {
    val m = permission.toShort
    // special bits (setuid/setgid/sticky) have no PosixFilePermission
    // mapping — dropping them silently would diverge from
    // RawLocalFileSystem semantics (ADVICE r16), so those take the
    // base class's Shell path
    if ((m & ~0x1ff) != 0) { super.setPermission(p, permission); return }
    val perms = new java.util.HashSet[java.nio.file.attribute.PosixFilePermission]()
    if ((m & 0x100) != 0) perms.add(OWNER_READ)
    if ((m & 0x80) != 0) perms.add(OWNER_WRITE)
    if ((m & 0x40) != 0) perms.add(OWNER_EXECUTE)
    if ((m & 0x20) != 0) perms.add(GROUP_READ)
    if ((m & 0x10) != 0) perms.add(GROUP_WRITE)
    if ((m & 0x8) != 0) perms.add(GROUP_EXECUTE)
    if ((m & 0x4) != 0) perms.add(OTHERS_READ)
    if ((m & 0x2) != 0) perms.add(OTHERS_WRITE)
    if ((m & 0x1) != 0) perms.add(OTHERS_EXECUTE)
    try java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, perms)
    catch {
      // non-POSIX store: the base class's Shell path still knows how —
      // correctness over speed on the odd path
      case _: UnsupportedOperationException | _: java.io.IOException =>
        super.setPermission(p, permission)
    }
  }

  /** Link status without the base class's `readlink` fork: one nio
    * lstat decides; the engine never creates symlinks, so the
    * non-symlink answer (== getFileStatus) covers every real call, and
    * a genuine symlink defers to the base implementation. */
  override def getFileLinkStatus(f: HPath): FileStatus = {
    import java.nio.file.{Files, LinkOption}
    import java.nio.file.attribute.BasicFileAttributes
    val jp =
      try pathToFile(f).toPath
      catch { case scala.util.control.NonFatal(_) =>
        return super.getFileLinkStatus(f) }
    val attrs =
      try Files.readAttributes(jp, classOf[BasicFileAttributes],
        LinkOption.NOFOLLOW_LINKS)
      catch {
        case _: java.nio.file.NoSuchFileException =>
          throw new java.io.FileNotFoundException(s"File $f does not exist")
        case scala.util.control.NonFatal(_) =>
          return super.getFileLinkStatus(f)
      }
    if (attrs.isSymbolicLink) super.getFileLinkStatus(f)
    else getFileStatus(f)
  }
}

/** The AbstractFileSystem (FileContext) face of [[NioLocalFileSystem]]:
  * raw (no `.crc` sidecars) and fork-free for the status/rename calls
  * the commit protocol issues per pointer flip. Hadoop instantiates it
  * reflectively from `fs.AbstractFileSystem.file.impl` via this exact
  * (URI, Configuration) constructor shape. */
class NioLocalFs(uri: java.net.URI,
                 conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new NioLocalFileSystem, conf, "file", false)

/** Points a session's Hadoop configuration at [[NioLocalFileSystem]] for
  * the `file` scheme. Idempotent; call once per JVM entry point before
  * the first write. */
object LocalFsInstall {
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val mode = sys.env.getOrElse("SPARK_GRAFT_FS_MODE", "nio").trim
    if (mode == "stock") return
    val hc = spark.sparkContext.hadoopConfiguration
    if (mode == "nocache") { // A/B probe: stock impl, no instance cache
      hc.set("fs.file.impl.disable.cache", "true")
      return
    }
    hc.set("fs.file.impl", classOf[NioLocalFileSystem].getName)
    hc.set("fs.AbstractFileSystem.file.impl", classOf[NioLocalFs].getName)
    // the engine's FileContext cache may hold contexts built on the
    // stock AbstractFileSystem — rebuild them from the new conf
    VersionedTable.invalidateFileContextCache()
    if (mode == "nio-nocache") {
      hc.set("fs.file.impl.disable.cache", "true")
    } else {
      // keep the FileSystem instance cache (executor scan paths call
      // getFileSystem per split — per-call instantiation measurably
      // hurt iterative queries), but evict the `file`-scheme instance
      // the session init already cached so the impl above takes
      // effect. closeAll() would also close filesystems other
      // components hold (event-log writer, concurrent sessions) —
      // ADVICE r16 — so close exactly the one stale entry.
      try {
        val stale = org.apache.hadoop.fs.FileSystem.get(
          java.net.URI.create("file:///"), hc)
        if (!stale.isInstanceOf[NioLocalFileSystem]) stale.close()
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
