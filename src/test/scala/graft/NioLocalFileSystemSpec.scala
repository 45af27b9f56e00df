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

  test("a session on the nio FS writes crc-free parquet that reads back identically") {
    val spark = graft.TestSpark.spark
    val hc = spark.sparkContext.hadoopConfiguration
    val prevImpl = hc.get("fs.file.impl")
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
      if (prevCache == null) hc.unset("fs.file.impl.disable.cache")
      else hc.set("fs.file.impl.disable.cache", prevCache)
    }
  }
}
