package graft.sources

import org.apache.hadoop.fs.{Path => HPath, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem for Spark data IO without the two per-file taxes the
  * default `file` filesystem (`LocalFileSystem`, a `ChecksumFileSystem`)
  * pays on every create:
  *
  *  1. **A fork+exec per create.** Without libhadoop (not shipped in
  *     this image), `RawLocalFileSystem.setPermission` falls back to
  *     shelling out `chmod` via `ProcessBuilder` — observed in driver
  *     stack samples on EVERY metadata/part-file create (guide §7.3).
  *     Forking an 8 GB JVM for each of the dozens of files a
  *     multi-commit fixture creates is pure overhead; this override
  *     performs the same chmod through java.nio in-process.
  *  2. **A `.crc` sidecar per file.** The checksum wrapper doubles the
  *     creates (and their chmods) and adds verification IO on every
  *     read. HDFS-class deployments run on raw filesystems anyway;
  *     local-mode benching should too.
  *
  * Installed via `fs.file.impl` (+ cache disable so a pre-registered
  * checksummed instance cannot keep serving) by [[LocalFsInstall]].
  * Behavior is otherwise exactly `RawLocalFileSystem`.
  */
class NioLocalFileSystem extends RawLocalFileSystem {
  import java.nio.file.attribute.PosixFilePermission._

  override def setPermission(p: HPath, permission: FsPermission): Unit = {
    val perms = new java.util.HashSet[java.nio.file.attribute.PosixFilePermission]()
    val m = permission.toShort
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
      // non-POSIX store or special bits: the base class's Shell path
      // still knows how — correctness over speed on the odd path
      case _: UnsupportedOperationException | _: java.io.IOException =>
        super.setPermission(p, permission)
    }
  }
}

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
    if (mode == "nio-nocache") {
      hc.set("fs.file.impl.disable.cache", "true")
    } else {
      // keep the FileSystem instance cache (executor scan paths call
      // getFileSystem per split — per-call instantiation measurably
      // hurt iterative queries), but evict any `file` filesystem the
      // session init already cached so the impl above takes effect
      try org.apache.hadoop.fs.FileSystem.closeAll()
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
