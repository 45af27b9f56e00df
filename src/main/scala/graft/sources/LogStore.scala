package graft.sources

import java.util.EnumSet
import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path => HPath}

/** The storage seam of the gvt commit protocol — the three primitives
  * whose ATOMICITY the protocol's correctness rests on, extracted behind
  * a trait so each filesystem class supplies (or refuses) them
  * explicitly, the same boundary Delta draws with its pluggable
  * `LogStore` (delta-io/delta: storage/.../LogStore.java).
  *
  *  - `putIfAbsent` — at most one concurrent caller across ALL processes
  *    may succeed for a given path. This single primitive arbitrates
  *    version claims and commit markers; without it two writers can
  *    commit the same version and the conflict loser deletes the
  *    winner's data (the round-10 TOCTOU class).
  *  - `read` / `list` — must observe a completed `putIfAbsent`
  *    (read-after-write, list-after-write consistency).
  *  - `overwrite` / `delete` — pointer-cache flips and claim releases;
  *    plain visibility suffices (the marker chain, not `_LATEST`, is
  *    the source of truth).
  *
  * Implementations:
  *  - [[LogStore.Nio]] for paths that RESOLVE to the local filesystem:
  *    put-if-absent via the kernel's `O_CREAT|O_EXCL` (NIO
  *    `CREATE_NEW`), the only genuinely atomic local primitive —
  *    `RawLocalFileSystem.create(overwrite=false)` is exists()-then-open
  *    and loses races.
  *  - [[LogStore.Hdfs]] for HDFS-class schemes, where the FileContext
  *    `CREATE`-without-`OVERWRITE` contract is namenode-atomic.
  *  - Anything else — S3A and friends, whose create-no-overwrite is NOT
  *    atomic without a conditional-put layer — is REFUSED loudly at
  *    `putIfAbsent` rather than silently relying on non-atomic
  *    semantics. Reads/lists still work on any Hadoop-supported scheme,
  *    so consuming a gvt table from an object store is fine; only
  *    commits require an atomic store.
  *
  * Scheme resolution uses the RESOLVED filesystem, not the raw URI: a
  * scheme-less path resolves through `fs.defaultFS`, so on a cluster
  * whose default FS is HDFS a bare `/warehouse/t` must take the HDFS
  * path — routing it to local NIO would put claims and markers on the
  * driver's own disk where no other writer (or reader) sees them,
  * silently voiding mutual exclusion.
  *
  * PLUGGABLE stores: `spark.graft.logstore.<scheme> = <fqcn>` (session
  * conf) routes that scheme's metadata operations to a user-supplied
  * public no-arg class implementing this trait, overriding the built-in
  * routing — the drop-in point for a real conditional-put object-store
  * adapter (S3 `PUT If-None-Match`, GCS/ABFS generation/etag
  * preconditions) without library changes. The trait is public for
  * exactly this reason; [[LogStore.InMemory]] is the contract double an
  * adapter should be validated against (LogStoreSpec's parameterized
  * contract block).
  */
trait LogStore {
  def read(p: HPath): Option[String]
  /** Atomic create-no-overwrite; throws
    * [[org.apache.hadoop.fs.FileAlreadyExistsException]] when the path
    * exists (= another writer won). */
  def putIfAbsent(p: HPath, s: String): Unit
  def overwrite(p: HPath, s: String): Unit
  def delete(p: HPath, recursive: Boolean): Boolean
  def list(p: HPath): Seq[String]
  def exists(p: HPath): Boolean
}

object LogStore {

  private val tmpSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Overwrite temp-file name: pid + thread + a process-wide counter.
    * Thread id alone collided across PROCESSES (the multi-writer
    * scenario the store contract supports): two same-host writers
    * flipping the same pointer could interleave on one `.tmp` path and
    * the loser's ATOMIC_MOVE threw mid-commit (ADVICE r16). */
  private[sources] def tmpName(name: String): String =
    "." + name + ".tmp." +
      java.lang.Long.toHexString(ProcessHandle.current().pid()) + "-" +
      java.lang.Long.toHexString(Thread.currentThread().getId) + "-" +
      java.lang.Long.toHexString(tmpSeq.incrementAndGet())

  /** Schemes whose FileContext create-no-overwrite is atomic (single
    * metadata authority). Everything else that is not local is refused
    * at `putIfAbsent`. */
  private val atomicHadoopSchemes = Set("hdfs", "viewfs", "webhdfs", "ofs")

  /** Registered custom stores, instantiated ONCE per (scheme, class) and
    * reused — adapters may hold connection pools. Keyed by class name
    * too, so re-pointing the conf at a different class takes effect. */
  private val customStores =
    new java.util.concurrent.ConcurrentHashMap[(String, String), LogStore]()

  /** Drop every instantiated custom store (tests; conf churn). The next
    * metadata op re-reads `spark.graft.logstore.*` and re-instantiates. */
  def invalidateCustomStores(): Unit = customStores.clear()

  /** The custom store registered for `scheme` in the ACTIVE session's
    * conf, if any. Conf lookup per call is a map probe — metadata ops
    * are IO-bound, the probe is noise. */
  private def custom(scheme: String): Option[LogStore] =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .flatMap(_.conf.getOption(s"spark.graft.logstore.$scheme"))
      .map(cn => customStores.computeIfAbsent((scheme, cn), _ =>
        Class.forName(cn).getDeclaredConstructor().newInstance()
          .asInstanceOf[LogStore]))

  /** The registered store for a path's RAW scheme, before any
    * FileContext resolution — lets a custom scheme that Hadoop has no
    * filesystem for carry gvt METADATA (a conditional-put commit service
    * keyed by path, say) while data files stay on a Hadoop-readable
    * store. Scheme-less paths return None here and resolve through
    * [[forPath]]'s defaultFS routing. */
  def forRawScheme(p: HPath): Option[LogStore] =
    Option(p.toUri.getScheme).flatMap(custom)

  /** Resolve the store for a path via the path's FileContext (which
    * applies `fs.defaultFS` to scheme-less paths). `fc` is the cached
    * context the caller already holds for this path's scheme+authority.
    * A `spark.graft.logstore.<resolved scheme>` registration wins over
    * the built-in routing. */
  def forPath(p: HPath, fc: FileContext): LogStore = {
    val resolved = Option(fc.makeQualified(p).toUri.getScheme).getOrElse("file")
    custom(resolved).getOrElse(
      if (resolved == "file") new Nio(fc)
      else new Hdfs(fc, atomic = atomicHadoopSchemes.contains(resolved), resolved))
  }

  /** Shared FileContext-backed read/list/delete/overwrite; subclasses
    * decide the put-if-absent primitive. */
  private[sources] sealed abstract class FcStore(fc: FileContext) extends LogStore {
    override def read(p: HPath): Option[String] = {
      if (!fc.util.exists(p)) None
      else {
        // the exists() answer can go stale before open(): a concurrent
        // pointer flip (FileContext's OVERWRITE rename deletes the
        // destination first on local fs) removes the file for a moment —
        // a vanished file reads as absent, same as losing the exists()
        // race by a hair
        val in =
          try fc.open(p)
          catch { case _: java.io.FileNotFoundException => return None }
        try {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          Some(new String(out.toByteArray, "UTF-8"))
        } finally in.close()
      }
    }
    override def overwrite(p: HPath, s: String): Unit = {
      // temp-write + OVERWRITE rename: readers see either the old or
      // the new content, never a truncated file — the same visibility
      // contract Nio.overwrite gives the local scheme, so pointer
      // flips no longer need a hand-rolled tmp+rename at every call
      // site
      val tmp = new HPath(p.getParent, LogStore.tmpName(p.getName))
      val out = fc.create(tmp,
        EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
        Options.CreateOpts.createParent())
      try out.write(s.getBytes("UTF-8")) finally out.close()
      fc.rename(tmp, p, Options.Rename.OVERWRITE)
    }
    override def delete(p: HPath, recursive: Boolean): Boolean =
      fc.util.exists(p) && fc.delete(p, recursive)
    override def list(p: HPath): Seq[String] =
      if (!fc.util.exists(p)) Seq.empty
      else fc.util.listStatus(p).toSeq.map(_.getPath.getName)
    override def exists(p: HPath): Boolean = fc.util.exists(p)
  }

  /** Local filesystem: kernel-atomic exclusive create — and EVERY other
    * primitive through java.nio rather than the Hadoop local FS, whose
    * create path (a) forks a `chmod` process per file when libhadoop is
    * absent and (b) writes `.crc` sidecars, doubling the creates. The
    * gvt commit protocol issues hundreds of metadata ops per
    * multi-commit fixture; each was paying both taxes (driver stack
    * samples, guide §7.3). */
  private[sources] final class Nio(fc: FileContext) extends FcStore(fc) {
    import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption, Path => JPath}

    private def jpath(p: HPath): JPath =
      Paths.get(fc.makeQualified(p).toUri.getPath)

    override def read(p: HPath): Option[String] =
      try Some(new String(Files.readAllBytes(jpath(p)), "UTF-8"))
      catch {
        case _: java.nio.file.NoSuchFileException => None
        // a concurrent OVERWRITE rename can vanish the file for a
        // moment — reads as absent, same as the FcStore race note
        case _: java.io.FileNotFoundException => None
      }

    override def putIfAbsent(p: HPath, s: String): Unit = {
      val path = jpath(p)
      Option(path.getParent).foreach(Files.createDirectories(_))
      try Files.write(path, s.getBytes("UTF-8"),
        StandardOpenOption.CREATE_NEW,
        StandardOpenOption.WRITE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(p.toString)
      }
    }

    /** Temp-write + atomic rename: readers see either the old or the
      * new content, never a truncated file — strictly stronger than the
      * FileContext OVERWRITE create this replaces (which truncates in
      * place), and fork-free. */
    override def overwrite(p: HPath, s: String): Unit = {
      val path = jpath(p)
      Option(path.getParent).foreach(Files.createDirectories(_))
      val tmp = path.resolveSibling(LogStore.tmpName(path.getFileName.toString))
      Files.write(tmp, s.getBytes("UTF-8"))
      Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }

    override def delete(p: HPath, recursive: Boolean): Boolean = {
      val path = jpath(p)
      if (!Files.exists(path)) false
      else if (!recursive || !Files.isDirectory(path)) {
        try Files.deleteIfExists(path)
        catch {
          case _: java.nio.file.DirectoryNotEmptyException =>
            // non-recursive delete of a non-empty dir: match Hadoop's
            // refusal semantics
            throw new java.io.IOException(s"Directory $p is not empty")
        }
      } else {
        import scala.jdk.CollectionConverters._
        val all = Files.walk(path)
        try all.sorted(java.util.Comparator.reverseOrder[JPath]())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
        finally all.close()
        true
      }
    }

    override def list(p: HPath): Seq[String] = {
      val path = jpath(p)
      if (!Files.isDirectory(path)) Seq.empty
      else {
        val ds = Files.newDirectoryStream(path)
        try {
          import scala.jdk.CollectionConverters._
          ds.iterator().asScala.map(_.getFileName.toString).toList
        } finally ds.close()
      }
    }

    override def exists(p: HPath): Boolean = Files.exists(jpath(p))
  }

  /** Conditional-put contract double: the in-memory model of an object
    * store that exposes an atomic conditional PUT — the shape S3 now
    * provides natively (`PUT` with `If-None-Match: *` returns 412 when
    * the key exists), and GCS/ABFS provide via generation/etag
    * preconditions. The commit protocol needs NOTHING beyond the three
    * primitives this trait names, so a real adapter is a transport
    * mapping, validated offline against this double:
    *
    *   putIfAbsent → `PUT key If-None-Match: *` (412 ⇒
    *                 FileAlreadyExistsException — another writer won)
    *   overwrite   → unconditional `PUT key`
    *   read        → `GET key`;  list → `LIST prefix/` (one level);
    *   delete      → `DELETE key` (recursive = list + delete each)
    *   exists      → `HEAD key` (or a 1-key LIST on the prefix)
    *
    * Consistency expectations match S3's current model: strong
    * read-after-write and list-after-write. The double keeps one flat
    * key space (an object store has no real directories); `list` and
    * recursive `delete` are prefix operations exactly as they would be
    * over the wire. */
  private[sources] final class InMemory extends LogStore {
    private val objects =
      new java.util.concurrent.ConcurrentHashMap[String, String]()
    private def key(p: HPath): String = p.toUri.getPath
    private def childPrefix(p: HPath): String = key(p).stripSuffix("/") + "/"

    override def read(p: HPath): Option[String] = Option(objects.get(key(p)))
    override def putIfAbsent(p: HPath, s: String): Unit =
      if (objects.putIfAbsent(key(p), s) != null)
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(p.toString)
    override def overwrite(p: HPath, s: String): Unit =
      { objects.put(key(p), s); () }
    override def delete(p: HPath, recursive: Boolean): Boolean =
      if (!recursive) objects.remove(key(p)) != null
      else {
        val pre = childPrefix(p)
        val direct = objects.remove(key(p)) != null
        val nested = objects.keySet().removeIf(_.startsWith(pre))
        direct || nested
      }
    override def list(p: HPath): Seq[String] = {
      val pre = childPrefix(p)
      import scala.jdk.CollectionConverters._
      objects.keySet().asScala.iterator
        .filter(_.startsWith(pre))
        .map(_.stripPrefix(pre).takeWhile(_ != '/'))
        .toSeq.distinct.sorted
    }
    override def exists(p: HPath): Boolean = {
      val pre = childPrefix(p)
      import scala.jdk.CollectionConverters._
      objects.containsKey(key(p)) ||
        objects.keySet().asScala.exists(_.startsWith(pre))
    }
  }

  /** HDFS-class schemes: the FileContext CREATE (no OVERWRITE) contract.
    * Non-atomic schemes carry `atomic = false` and refuse commits. */
  private[sources] final class Hdfs(fc: FileContext, atomic: Boolean,
                                    scheme: String) extends FcStore(fc) {
    override def putIfAbsent(p: HPath, s: String): Unit = {
      if (!atomic) throw new UnsupportedOperationException(
        s"gvt: the commit protocol needs an atomic put-if-absent, which " +
          s"'$scheme' does not provide (create-no-overwrite is not atomic " +
          s"on this store). Writing gvt tables here would silently lose " +
          s"concurrent commits; use file:/hdfs:, or register a " +
          s"conditional-put LogStore for this scheme " +
          s"(spark.graft.logstore.$scheme=<class>; S3's PUT If-None-Match " +
          s"maps 1:1 onto putIfAbsent — see LogStore.InMemory's contract " +
          s"notes). (Reads of gvt tables on '$scheme' remain supported.)")
      val out = fc.create(p, EnumSet.of(CreateFlag.CREATE),
        Options.CreateOpts.createParent())
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
  }
}
