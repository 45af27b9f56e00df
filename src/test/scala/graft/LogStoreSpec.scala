package graft.sources

import java.nio.file.Files
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Path => HPath}
import org.scalatest.funsuite.AnyFunSuite

/** The commit protocol's storage seam: put-if-absent atomicity and the
  * loud refusal of schemes that cannot provide it. */
class LogStoreSpec extends AnyFunSuite {

  private def localFc = FileContext.getFileContext(new Configuration())

  test("scheme-less and file: paths resolve to the NIO store (local defaultFS)") {
    val fc = localFc
    assert(LogStore.forPath(new HPath("/tmp/x"), fc).isInstanceOf[LogStore.Nio])
    assert(LogStore.forPath(new HPath("file:/tmp/x"), fc)
      .isInstanceOf[LogStore.Nio])
  }

  // The contract cases run against BOTH the local NIO store and the
  // conditional-put contract double (the S3 If-None-Match model): the
  // commit protocol needs nothing beyond these three primitives, so an
  // implementation passing this block is a valid commit substrate.
  private def stores: Seq[(String, () => LogStore)] = Seq(
    "nio" -> (() => LogStore.forPath(
      new HPath(Files.createTempDirectory("graft_logstore").toString),
      localFc)),
    "conditional-put double" -> (() => new LogStore.InMemory))

  for ((label, mk) <- stores) {
    test(s"[$label] putIfAbsent admits exactly one winner under contention") {
      val store = mk()
      val dir = Files.createTempDirectory("graft_logstore").toString
      val p = new HPath(dir, "_claim")
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val start = new java.util.concurrent.CountDownLatch(1)
      val ts = (1 to 16).map { i =>
        new Thread(() => {
          start.await()
          try { store.putIfAbsent(p, i.toString); wins.incrementAndGet(); () }
          catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => () }
        })
      }
      ts.foreach(_.start()); start.countDown(); ts.foreach(_.join())
      assert(wins.get == 1)
      // the winner's content is what persisted
      val content = store.read(p).get
      assert((1 to 16).map(_.toString).contains(content))
      // read/list/exists see the committed file
      assert(store.exists(p))
      assert(store.list(new HPath(dir)).contains("_claim"))
      // delete then re-claim succeeds
      assert(store.delete(p, recursive = false))
      store.putIfAbsent(p, "again")
      assert(store.read(p).contains("again"))
    }

    test(s"[$label] overwrite replaces; putIfAbsent after overwrite " +
      "still refuses") {
      val store = mk()
      val dir = Files.createTempDirectory("graft_logstore2").toString
      val p = new HPath(dir, "_ptr")
      store.overwrite(p, "1")
      store.overwrite(p, "2")
      assert(store.read(p).contains("2"))
      intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
        store.putIfAbsent(p, "3")
      }
    }

    test(s"[$label] list is one-level; recursive delete clears the " +
      "prefix; absent paths read None") {
      val store = mk()
      val dir = Files.createTempDirectory("graft_logstore3").toString
      store.overwrite(new HPath(s"$dir/t/v=1/_marker"), "m1")
      store.overwrite(new HPath(s"$dir/t/v=2/_marker"), "m2")
      store.overwrite(new HPath(s"$dir/t/_LATEST"), "2")
      assert(store.list(new HPath(s"$dir/t")).toSet ==
        Set("v=1", "v=2", "_LATEST"))
      assert(store.read(new HPath(s"$dir/t/absent")).isEmpty)
      assert(store.delete(new HPath(s"$dir/t/v=2"), recursive = true))
      assert(!store.exists(new HPath(s"$dir/t/v=2/_marker")))
      assert(store.exists(new HPath(s"$dir/t/_LATEST")))
    }
  }

  test("overwrite temp names carry pid + a process-wide counter — " +
    "distinct per call, so same-host writers cannot collide") {
    val a = LogStore.tmpName("_LATEST"); val b = LogStore.tmpName("_LATEST")
    assert(a != b, s"two tmpName calls collided: $a")
    val pidHex = java.lang.Long.toHexString(ProcessHandle.current().pid())
    assert(a.contains(pidHex), s"$a lacks the pid component $pidHex")
    assert(a.startsWith("._LATEST.tmp."), a)
  }

  test("non-atomic schemes (S3A-class) refuse commits loudly, reads keep working") {
    val fc = localFc
    val store = new LogStore.Hdfs(fc, atomic = false, "s3a")
    val e = intercept[UnsupportedOperationException] {
      store.putIfAbsent(new HPath("/never/created"), "x")
    }
    assert(e.getMessage.contains("s3a"))
    assert(e.getMessage.contains("atomic"))
    // nothing was created
    assert(!localFc.util.exists(new HPath("/never/created")))
    // the read surface is not gated
    val dir = Files.createTempDirectory("graft_logstore3")
    Files.writeString(dir.resolve("f"), "hello")
    assert(store.read(new HPath(dir.toString, "f")).contains("hello"))
  }

  test("writing a gvt table through an s3a root fails loudly (end-to-end refusal)") {
    // no S3A AbstractFileSystem is on the classpath in this environment,
    // so the refusal surfaces at FileContext resolution — still loud,
    // still before any data lands; with a connector present, the
    // LogStore.Hdfs(atomic=false) path above is the arbiter
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val e = intercept[Exception] {
      VersionedTable.write(Seq(1, 2).toDF("id"), "s3a://bucket/t")
    }
    val msg = String.valueOf(e.getMessage) + e.getClass.getName
    assert(msg.toLowerCase.contains("s3a") || msg.contains("UnsupportedFileSystem"))
  }
}
