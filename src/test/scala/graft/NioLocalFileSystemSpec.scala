package graft.sources

import java.nio.file.Files
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite

/** The fork-free local filesystem the bench mains install: chmod via
  * java.nio must land the same mode bits the Shell fallback would, and
  * a session pointed at it must write checksum-free parquet that plain
  * readers (and the default FS) read back identically. */
class NioLocalFileSystemSpec extends AnyFunSuite {

  test("setPermission applies exact POSIX bits without forking") {
    val fs = new NioLocalFileSystem()
    fs.initialize(java.net.URI.create("file:///"),
      new org.apache.hadoop.conf.Configuration())
    val f = Files.createTempFile("graft_niofs", ".txt")
    val p = new HPath(f.toUri)
    for (mode <- Seq("644", "600", "755", "640")) {
      fs.setPermission(p, new FsPermission(Integer.parseInt(mode, 8).toShort))
      val got = java.nio.file.Files.getPosixFilePermissions(f)
      val expect = java.nio.file.attribute.PosixFilePermissions
        .fromString(new FsPermission(Integer.parseInt(mode, 8).toShort).toString)
      assert(got === expect, s"mode $mode")
    }
  }

  test("special mode bits (setuid/setgid/sticky) delegate to the base " +
    "path instead of being silently dropped") {
    val fs = new NioLocalFileSystem()
    fs.initialize(java.net.URI.create("file:///"),
      new org.apache.hadoop.conf.Configuration())
    val f = Files.createTempFile("graft_niofs_sb", ".txt")
    val p = new HPath(f.toUri)
    fs.setPermission(p, new FsPermission(Integer.parseInt("1644", 8).toShort))
    val mode = Files.getAttribute(f, "unix:mode")
      .asInstanceOf[java.lang.Integer].intValue() & 0xfff
    assert(mode === Integer.parseInt("1644", 8),
      f"sticky bit lost: got ${mode.toOctalString}")
  }

  test("getFileLinkStatus answers without forking readlink: status for " +
    "a plain file, FileNotFoundException for a missing path") {
    val fs = new NioLocalFileSystem()
    fs.initialize(java.net.URI.create("file:///"),
      new org.apache.hadoop.conf.Configuration())
    val f = Files.createTempFile("graft_niofs_ls", ".txt")
    Files.write(f, "abc".getBytes)
    val st = fs.getFileLinkStatus(new HPath(f.toUri))
    assert(st.getLen === 3L && !st.isSymlink)
    intercept[java.io.FileNotFoundException] {
      fs.getFileLinkStatus(new HPath(f.toUri.toString + ".absent"))
    }
  }

  test("FileContext through NioLocalFs: atomic OVERWRITE rename works " +
    "and the AbstractFileSystem face is fork-free raw") {
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("fs.AbstractFileSystem.file.impl", classOf[NioLocalFs].getName)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      java.net.URI.create("file:///"), conf)
    val d = Files.createTempDirectory("graft_niofc")
    val src = new HPath(d.resolve("a").toUri)
    val dst = new HPath(d.resolve("b").toUri)
    import org.apache.hadoop.fs.{CreateFlag, Options}
    for ((p, body) <- Seq((src, "new"), (dst, "old"))) {
      val out = fc.create(p, java.util.EnumSet.of(CreateFlag.CREATE),
        Options.CreateOpts.createParent())
      out.write(body.getBytes("UTF-8")); out.close()
    }
    fc.rename(src, dst, Options.Rename.OVERWRITE)
    assert(new String(Files.readAllBytes(d.resolve("b")), "UTF-8") === "new")
    assert(!Files.exists(d.resolve("a")))
    // raw: no .crc sidecars from the FileContext create path
    assert(!d.toFile.listFiles().exists(_.getName.endsWith(".crc")))
  }

  test("a session on the nio FS writes crc-free parquet that reads back identically") {
    val spark = graft.TestSpark.spark
    val hc = spark.sparkContext.hadoopConfiguration
    val prevImpl = hc.get("fs.file.impl")
    val prevAfs = hc.get("fs.AbstractFileSystem.file.impl")
    val prevCache = hc.get("fs.file.impl.disable.cache")
    LocalFsInstall.install(spark)
    try {
      val d = Files.createTempDirectory("graft_niofs_rt").toString + "/t"
      import org.apache.spark.sql.functions._
      val df = spark.range(100).select(col("id"),
        concat(lit("v"), col("id")).as("s"))
      df.write.parquet(d)
      // no .crc sidecars: the raw FS skips the checksum wrapper
      val names = new java.io.File(d).listFiles().map(_.getName)
      assert(!names.exists(_.endsWith(".crc")),
        s"checksum sidecars written: ${names.mkString(",")}")
      val back = spark.read.parquet(d)
      assert(back.count() === 100)
      assert(back.agg(sum("id")).collect()(0).getLong(0) === 4950L)
    } finally {
      if (prevImpl == null) hc.unset("fs.file.impl") else hc.set("fs.file.impl", prevImpl)
      if (prevAfs == null) hc.unset("fs.AbstractFileSystem.file.impl")
      else hc.set("fs.AbstractFileSystem.file.impl", prevAfs)
      if (prevCache == null) hc.unset("fs.file.impl.disable.cache")
      else hc.set("fs.file.impl.disable.cache", prevCache)
      // evict the instance the install cached so later suites in this
      // JVM run on the restored conf, not the overridden filesystem
      try {
        val cur = org.apache.hadoop.fs.FileSystem.get(
          java.net.URI.create("file:///"), hc)
        if (cur.isInstanceOf[NioLocalFileSystem]) cur.close()
      } catch { case scala.util.control.NonFatal(_) => () }
      VersionedTable.invalidateFileContextCache()
    }
  }
}
