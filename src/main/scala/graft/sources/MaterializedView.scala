package graft.sources

import java.nio.charset.StandardCharsets
import java.util.Base64
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project, Sort, SubqueryAlias, Union}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Materialized aggregate views over gvt tables, with incremental
  * (change-feed-driven) maintenance and automatic query rewrite
  * ([[graft.plans.MvRewrite]]) — the warehouse feature Databricks ships
  * as materialized views on Delta (the reference's gold marts,
  * 03_gold_metrics.py, are exactly this shape rebuilt by notebook runs;
  * reference: README.md "Gold" layer). Spark-first design: the MV is
  * itself a gvt table (versioned, time-travelable, vacuumable), the
  * refresh delta is the table's own change feed, and the rewrite is a
  * Catalyst optimizer rule — no new storage or execution machinery.
  *
  * An MV is defined by (base table, grouping columns, aggregate list).
  * Supported aggregates: `sum(col)`, `count(*)`, `count(col)`,
  * `min(col)`, `max(col)` — the re-aggregable algebra. The MV table
  * additionally materializes internal bookkeeping columns the user
  * never sees: `_rows` (group row count — detects dead groups on
  * refresh and answers `count(*)`), and `_nn_<out>` per sum (non-null
  * input count — keeps the SQL null contract for sums over all-null
  * groups, and serves `avg` rewrites exactly as total/non-null).
  *
  * Refresh cost model (the 100 TB story): the delta aggregation reads
  * ONLY the changed rows via the keyless change feed — O(changed), not
  * O(base) — then one MV-sized full-outer merge folds it in. A full
  * re-aggregation of the base happens only when the spec carries
  * min/max AND some hop in the range may have removed rows (a removed
  * row could have carried the extreme; Delta's own MVs recompute on
  * the same trigger). Row-neutral maintenance commits (OPTIMIZE /
  * COMPACT / VACUUM / ANALYZE / CLUSTER) never force a rebuild.
  *
  * Freshness contract: the rewrite fires only when the MV's recorded
  * base version equals the version the query's relation actually
  * serves — a stale MV silently degrades to the base scan, never to a
  * stale answer. The spec rides each MV commit as a `_mv` metadata
  * file, so [[attach]] can re-register after a JVM restart.
  */
object MaterializedView {

  private val log = graft.util.Log("mv")

  /** One aggregate column: fn ∈ sum|count|min|max|count_distinct, col
    * ("*" allowed for count), out = the MV column name (and rewrite
    * match target). A count_distinct maintains a per-(group, value)
    * multiplicity SIDE table beside the MV (the classic counting
    * approach), so inserts AND deletes fold incrementally and subset
    * rollups re-aggregate the side table exactly. */
  final case class AggSpec(fn: String, col: String, out: String) {
    require(Set("sum", "count", "min", "max", "count_distinct")
      .contains(fn),
      s"unsupported MV aggregate: $fn (supported: sum, count, min, " +
        "max, count_distinct)")
    require(fn == "count" || col != "*", s"$fn(*) is not an aggregate")
  }

  /** The multiplicity side table of one count_distinct aggregate: a
    * gvt table sibling of the MV root holding (groups…, value,
    * `_mult`), maintained by the same signed fold. */
  private[graft] def sideRootOf(mvRoot: String, out: String): String =
    s"${mvRoot.stripSuffix("/")}_mult_$out"

  /** `mvVersion` is REGISTRATION state, not part of the persisted
    * spec: the MV table version this registration's data lives at.
    * The rewrite reads exactly this version, so a registry entry and
    * the snapshot it serves can never be torn apart by a concurrent
    * refresh (the fold commits first, then the registry swaps — a
    * reader holding the OLD entry keeps reading the OLD snapshot). */
  final case class MvSpec(mvRoot: String, baseRoot: String,
                          baseVersion: Long, groups: Seq[String],
                          aggs: Seq[AggSpec],
                          mvVersion: Long = -1L,
                          sideVersions: Map[String, Long] = Map.empty) {
    private[sources] def serialize: String = {
      val a = aggs.map(x => s"${x.fn}:${x.col}:${x.out}").mkString(",")
      s"base=$baseRoot\nbaseVersion=$baseVersion\n" +
        s"groups=${groups.mkString(",")}\naggs=$a\n"
    }
  }

  private[sources] def parseSpec(mvRoot: String, s: String): MvSpec = {
    val kv = s.linesIterator.filter(_.contains("=")).map { l =>
      val i = l.indexOf('='); (l.take(i), l.drop(i + 1))
    }.toMap
    MvSpec(mvRoot, kv("base"), kv("baseVersion").trim.toLong,
      kv("groups").split(",").filter(_.nonEmpty).toSeq,
      kv("aggs").split(",").filter(_.nonEmpty).toSeq.map { a =>
        val Array(fn, c, out) = a.split(":", 3); AggSpec(fn, c, out)
      })
  }

  /** baseRoot (normalized) → specs of its registered MVs, keyed by
    * mvRoot. Driver-side session registry — a cluster deployment would
    * back this with its catalog; [[attach]] restores entries from the
    * persisted `_mv` metadata. */
  private val registry =
    new ConcurrentHashMap[String, Map[String, MvSpec]]()

  private[graft] def norm(root: String): String =
    new org.apache.hadoop.fs.Path(root).toUri.getPath

  private[graft] def viewsOf(baseRoot: String): Seq[MvSpec] =
    Option(registry.get(norm(baseRoot))).map(_.values.toSeq).getOrElse(Nil)

  private def register(spec: MvSpec): Unit =
    registry.compute(norm(spec.baseRoot), (_, old) =>
      (if (old == null) Map.empty[String, MvSpec] else old) +
        (norm(spec.mvRoot) -> spec))

  /** Test/ops escape hatch: forget every registered view (and the
    * probed-roots cache, so discovery re-fires like a fresh driver). */
  def clearRegistry(): Unit = {
    registry.clear(); exactRegistry.clear(); probedRoots.clear()
  }

  /** Registry listing for `SHOW MATERIALIZED VIEWS`: one entry per
    * registered view (both tiers) — (mvRoot, tier, bases with their
    * recorded versions, served MV version). */
  def describeRegistered(): Seq[(String, String, Seq[(String, Long)], Long)] = {
    import scala.jdk.CollectionConverters._
    val agg = registry.values().asScala.flatMap(_.values).toSeq.distinct
      .map(s => (s.mvRoot, "algebraic",
        Seq(s.baseRoot -> s.baseVersion), s.mvVersion))
    val exact = exactRegistry.values().asScala.toSeq.map { e =>
      val tier = if (e.joinAgg.isDefined) "differential-join" else "exact"
      (e.spec.mvRoot, tier, e.spec.baseVersions.toSeq.sortBy(_._1),
        e.mvVersion)
    }
    (agg ++ exact).sortBy(_._1)
  }

  /** The MV snapshot a registration serves: the PINNED version recorded
    * when the registration's data committed (readLatest only for the
    * -1 sentinel of pre-pinning registrations). Pinning closes the
    * refresh race: a query planned against the OLD registry entry
    * reads the OLD MV snapshot even if a concurrent fold has already
    * committed a newer one — entry and data swap together. */
  private[graft] def readMv(spark: SparkSession, mvRoot: String,
                            v: Long): DataFrame =
    if (v >= 0) VersionedTable.readVersion(spark, mvRoot, v)
    else VersionedTable.readLatest(spark, mvRoot)

  /** Deregister a view from the rewrite (both tiers): queries fall back
    * to their base scans; the MV table itself stays on disk (re-attach
    * any time). Long-lived sessions creating throwaway views (bench
    * fixtures, notebooks) call this so the exact-match candidate list
    * — scanned per planned query — never accretes. Also removes the
    * storage-backed registration markers, so a FRESH driver stops
    * discovering the view (DROP propagates across sessions). */
  def drop(mvRoot: String): Unit = {
    val key = norm(mvRoot)
    // resolve base roots from the in-memory registries, FALLING BACK to
    // the MV table's own _mv/_mv_exact metadata (the spec of record):
    // a fresh driver running DROP never triggered the lazy discovery
    // that would have populated the registries, and without the
    // fallback its marker deletion would silently no-op — later
    // drivers would rediscover and re-attach the dropped view
    val bases = scala.util.Try(baseRootsOf(mvRoot)).toOption
      .orElse(persistedBaseRootsOf(mvRoot))
      .getOrElse(Nil)
    exactRegistry.remove(key)
    registry.replaceAll((_, m) => m - key)
    bases.foreach { b =>
      scala.util.Try(VersionedTable.delete(registryMarker(b, mvRoot),
        recursive = false))
    }
  }

  /** Base roots recorded in the MV table's own metadata (newest commit
    * carrying either tier's spec wins) — the cross-session source of
    * truth when this driver's registries have no entry. */
  private def persistedBaseRootsOf(mvRoot: String): Option[Seq[String]] =
    scala.util.Try {
      VersionedTable.committedVersions(mvRoot).reverse.iterator.flatMap { v =>
        VersionedTable.readMeta(mvRoot, v, "_mv_exact")
          .map(parseExact(mvRoot, _).baseVersions.keys.toSeq)
          .orElse(VersionedTable.readMeta(mvRoot, v, "_mv")
            .map(s => Seq(parseSpec(mvRoot, s).baseRoot)))
      }.toSeq.headOption
    }.toOption.flatten

  // ------------------------------------------------------------------
  // Storage-backed registration: create() stamps a marker under each
  // BASE root (`<base>/_mv_registry/<md5-of-mvRoot>` holding the
  // mvRoot path), so a FRESH driver rediscovers persisted views
  // LAZILY on first planner contact with the base — the rewrite
  // survives restarts with no re-registration call. The markers ride
  // the same LogStore seam as the commit protocol (list/read/
  // overwrite/delete suffice; no atomicity needed — the spec of
  // record is the MV table's own `_mv`/`_mv_exact` metadata, a stale
  // or orphaned marker merely attaches fail-closed or no-ops). A
  // cluster deployment would keep these rows in its metastore.
  // ------------------------------------------------------------------

  private def registryMarker(baseRoot: String, mvRoot: String)
      : org.apache.hadoop.fs.Path = {
    val id = java.security.MessageDigest.getInstance("MD5")
      .digest(norm(mvRoot).getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(baseRoot, "_mv_registry"), id)
  }

  private def stampRegistration(baseRoots: Iterable[String],
                                mvRoot: String): Unit =
    baseRoots.foreach { b =>
      VersionedTable.writeString(registryMarker(b, mvRoot),
        norm(mvRoot) + "\n", overwrite = true)
    }

  /** Base roots already probed for persisted registrations — one
    * listing per root per driver lifetime (cleared with the registry,
    * so tests can simulate a fresh driver). */
  private val probedRoots =
    ConcurrentHashMap.newKeySet[String]()

  /** Lazy cross-session discovery, called by the rewrite on first
    * contact with a gvt root: attach every marker's MV (aggregate
    * tier first, exact tier second). Failures skip silently —
    * fail-closed means the query scans its base; an exact view whose
    * defining SQL needs views not in this session's scope simply
    * stays unattached. */
  private[graft] def discover(spark: SparkSession, baseRoot: String): Unit = {
    val key = norm(baseRoot)
    if (!probedRoots.add(key)) return
    val dir = new org.apache.hadoop.fs.Path(baseRoot, "_mv_registry")
    val markers =
      try VersionedTable.listNames(dir)
      catch {
        case scala.util.control.NonFatal(e) =>
          // a missing dir lists EMPTY (the common no-views case), so an
          // exception here is a genuine IO failure: un-cache the probe
          // (the next planner contact retries — a transient error must
          // not disable cross-session rewrites for the driver's
          // lifetime) and say why rewrites are off meanwhile
          probedRoots.remove(key)
          log.warn(s"$baseRoot: _mv_registry listing failed " +
            s"(${e.getMessage}) — MV discovery retries on next contact")
          return
      }
    markers.foreach { name =>
      val mvRoot = (try VersionedTable.readString(
        new org.apache.hadoop.fs.Path(dir, name))
      catch {
        case scala.util.control.NonFatal(e) =>
          log.warn(s"$baseRoot: unreadable _mv_registry marker $name " +
            s"(${e.getMessage}) — skipped")
          None
      }).map(_.trim).getOrElse("")
      if (mvRoot.nonEmpty && !isRegistered(mvRoot)) {
        try { attach(mvRoot); () }
        catch {
          case scala.util.control.NonFatal(_) =>
            try { attachExact(spark, mvRoot); () }
            catch {
              case scala.util.control.NonFatal(e) =>
                // fail-closed is correct (the query scans its base) but
                // must be diagnosable: say which view stayed unattached
                log.warn(s"$baseRoot: persisted MV $mvRoot failed to " +
                  s"attach (${e.getMessage}) — queries scan the base")
            }
        }
      }
    }
  }

  private def isRegistered(mvRoot: String): Boolean = {
    val key = norm(mvRoot)
    if (exactRegistry.containsKey(key)) return true
    val it = registry.values().iterator()
    while (it.hasNext) if (it.next().contains(key)) return true
    false
  }

  // ------------------------------------------------------------------
  // Exact-match views: ANY defining query (joins, filters, distinct —
  // whatever Spark can run), matched whole-subtree via
  // `LogicalPlan.sameResult` (the CacheManager mechanism; gvt relations
  // canonicalize semantically, so independent reads of one snapshot
  // compare equal). Freshness is structural: the defining plan embeds
  // the chain dirs (version) of every gvt relation it read, so a query
  // over an advanced base simply stops matching — stale service is
  // impossible by construction. Refresh re-runs the defining query
  // (no incremental algebra is assumed for arbitrary shapes).
  // ------------------------------------------------------------------

  final case class ExactSpec(mvRoot: String, sql: String,
                             baseVersions: Map[String, Long])

  /** A registered exact view plus its cached match artifacts: the
    * optimized defining plan (top-level Sort stripped — same multiset)
    * and its output types, the rule's cheap prefilter; `joinAgg` is
    * the recognized differential-maintenance shape, when any. */
  final case class ExactEntry(spec: ExactSpec, matchPlan: LogicalPlan,
                              outTypes: Seq[DataType],
                              joinAgg: Option[JoinAggInfo] = None,
                              mvVersion: Long = -1L,
                              sideVersions: Map[String, Long] = Map.empty)

  /** The shape the differential refresh serves: a re-aggregable
    * aggregate over per-row operators (project/filter) around INNER
    * joins of N live gvt relation references. The telescoping product
    * rule gives, positionally over the references R₁…Rₙ,
    *
    *   Δ(R₁⋈…⋈Rₙ) = ⋃ᵢ R₁_old ⋈ … ⋈ ΔRᵢ ⋈ Rᵢ₊₁_new ⋈ … ⋈ Rₙ_new
    *
    * (per-row operators distribute over union, so any project/filter
    * dressing is preserved) — each term joins one DELTA against the
    * other sides, never all-old⋈all-old (the 100 TB-dominant term),
    * and the delta aggregate folds into the MV additively. The
    * identity is exact over SIGNED multisets, so sum/count views also
    * fold RETRACTIONS (deletes/updates) — see [[diffDeltaAgg]]'s
    * counting-IVM split; min/max views fold insert-only ranges and
    * rebuild on retraction (a removed row may carry the extreme;
    * Delta's MVs recompute on the same trigger). Self-joins are
    * sound: the rule is positional over REFERENCES, and the analyzer
    * deduplicates relation instances per reference. */
  final case class JoinAggInfo(groups: Seq[String], aggs: Seq[AggSpec],
                               ge: Seq[Expression],
                               ae: Seq[NamedExpression],
                               joinChild: LogicalPlan,
                               rels: Seq[LogicalRelation],
                               roots: Seq[String])

  private val exactRegistry = new ConcurrentHashMap[String, ExactEntry]()

  private[graft] def exactViews: Seq[ExactEntry] = {
    import scala.jdk.CollectionConverters._
    exactRegistry.values().asScala.toSeq
  }

  // Re-entrancy guard: while a defining plan is being parsed/optimized,
  // the rewrite rule must not fire (a defining query matching an
  // already-registered view would cache an MV-referencing plan and
  // cascade matching into nonsense).
  private val building = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }
  private[graft] def isBuilding: Boolean = building.get()

  private def buildDefPlan(spark: SparkSession, sql: String)
      : (DataFrame, LogicalPlan) = {
    building.set(true)
    try {
      val df = spark.sql(sql)
      val matchPlan = df.queryExecution.optimizedPlan match {
        case s: Sort if s.global => s.child // ordering is not a set property
        case p => p
      }
      (df, matchPlan)
    } finally building.set(false)
  }

  /** gvt (root → served version) of every gvt relation in a plan. */
  private def gvtVersionsOf(plan: LogicalPlan): Map[String, Long] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import graft.sources.gvt.{GvtDvRelation, GvtFileIndex}
    plan.collect {
      case lr: LogicalRelation => lr.relation match {
        case hfs: HadoopFsRelation => hfs.location match {
          case idx: GvtFileIndex if idx.tableRoot.nonEmpty =>
            val vs = idx.rootPaths.flatMap { p =>
              val n = p.getName
              if (n.startsWith("v=")) scala.util.Try(n.drop(2).toLong).toOption
              else None
            }
            if (vs.isEmpty) Nil else Seq(idx.tableRoot -> vs.max)
          case _ => Nil
        }
        case dv: GvtDvRelation => Seq(dv.root -> dv.version)
        case _ => Nil
      }
    }.flatten.toMap
  }

  private def serializeExact(spec: ExactSpec): String = {
    val b64 = Base64.getEncoder.encodeToString(
      spec.sql.getBytes(StandardCharsets.UTF_8))
    val vs = spec.baseVersions.toSeq.sortBy(_._1)
      .map { case (r, v) => s"$r:$v" }.mkString(",")
    s"sqlb64=$b64\nversions=$vs\n"
  }

  private def parseExact(mvRoot: String, s: String): ExactSpec = {
    val kv = s.linesIterator.filter(_.contains("=")).map { l =>
      val i = l.indexOf('='); (l.take(i), l.drop(i + 1))
    }.toMap
    val sql = new String(Base64.getDecoder.decode(kv("sqlb64")),
      StandardCharsets.UTF_8)
    val versions = kv.getOrElse("versions", "").split(",")
      .filter(_.contains(":")).map { e =>
        val i = e.lastIndexOf(':'); (e.take(i), e.drop(i + 1).toLong)
      }.toMap
    ExactSpec(mvRoot, sql, versions)
  }

  /** The names foldIntoMv owns inside a differential join MV table. */
  private[graft] def internalNames(aggs: Seq[AggSpec]): Seq[String] =
    "_rows" +: aggs.filter(_.fn == "sum").map(a => s"_nn_${a.out}")

  /** Build the storable MV frame for an exact entry: the defining
    * frame itself, or — when the differential shape is recognized —
    * the defining aggregate EXTENDED with the fold's internal counters
    * (`_rows`, per-sum `_nn_*`; the rewrite projects them away). */
  /** The `_rows` / per-sum `_nn_*` bookkeeping aggregates a
    * differential join MV materializes beside its user outputs. */
  private def internalExtras(info: JoinAggInfo): Seq[NamedExpression] =
    Alias(Count(Literal(1)).toAggregateExpression(), "_rows")() +:
      info.ae.collect {
        case Alias(ag: AggregateExpression, n)
            if ag.aggregateFunction.isInstanceOf[Sum] =>
          Alias(Count(ag.aggregateFunction.asInstanceOf[Sum].child)
            .toAggregateExpression(), s"_nn_$n")()
      }

  private def exactMvFrame(spark: SparkSession, df: DataFrame,
                           joinAgg: Option[JoinAggInfo]): DataFrame =
    joinAgg match {
      case None => df
      case Some(info) =>
        building.set(true)
        try org.apache.spark.sql.graft.NativeColumns.ofPlan(spark,
          Aggregate(info.ge, info.ae ++ internalExtras(info),
            info.joinChild))
        finally building.set(false)
    }

  private def recognizeSafe(matchPlan: LogicalPlan,
                            outNames: Seq[String]): Option[JoinAggInfo] =
    recognizeJoinAgg(matchPlan).filter(info =>
      internalNames(info.aggs).forall(n => !outNames.contains(n)) &&
        // side-table layout: the distinct VALUE column must not shadow
        // a group column or the multiplicity counter
        cdValueAttrs(info).forall { case (_, a) =>
          !info.groups.contains(a.name) && a.name != "_mult" })

  /** count_distinct output → its VALUE attribute in the defining
    * aggregate (recognizeJoinAgg admits only bare-attribute distinct
    * counts, so the cast is total). */
  private def cdValueAttrs(info: JoinAggInfo)
      : Seq[(String, AttributeReference)] = {
    val it = info.aggs.iterator
    info.ae.flatMap {
      case Alias(ag: AggregateExpression, _) if it.hasNext =>
        val spec = it.next()
        if (spec.fn != "count_distinct") Nil
        else ag.aggregateFunction match {
          case Count(Seq(a: AttributeReference)) => Seq(spec.out -> a)
          case _ => Nil
        }
      case _ => Nil
    }
  }

  /** The fold-range token a side commit is stamped with: the sorted
    * (root → version) map the fold started FROM — fold idempotence
    * across both tiers (single-table folds serialize one root). */
  private def fromToken(vs: Map[String, Long]): String =
    vs.toSeq.sortBy(_._1).map { case (r, v) => s"$r:$v" }.mkString(",")

  /** Build (or rebuild) a JOIN view's multiplicity side tables over
    * its (old or live) join subtree. Written BEFORE the MV commit —
    * the MV metadata is the transaction point, so a crash leaves an
    * orphan side write the next fold's idempotence stamp ignores
    * (creates stamp the non-matching "-"). */
  private def writeJoinSideTables(spark: SparkSession, info: JoinAggInfo,
                                  mvRoot: String,
                                  operation: String): Map[String, Long] =
    cdValueAttrs(info).map { case (out, vAttr) =>
      import org.apache.spark.sql.catalyst.expressions.IsNotNull
      val g = info.ge.zip(info.groups).map { case (e, n) => Alias(e, n)() }
      val plan = Aggregate(
        info.ge :+ vAttr,
        g ++ Seq(vAttr: NamedExpression,
          Alias(Count(Literal(1)).toAggregateExpression(), "_mult")()),
        Filter(IsNotNull(vAttr), info.joinChild))
      building.set(true)
      try out -> VersionedTable.write(
        org.apache.spark.sql.graft.NativeColumns.ofPlan(spark, plan),
        sideRootOf(mvRoot, out), operation = operation,
        metaFiles = Map("_mv_side_from" -> "-"))
      finally building.set(false)
    }.toMap

  /** Materialize an arbitrary defining query and register it for
    * whole-subtree rewrite. The query must read at least one gvt
    * relation (else freshness has no anchor) and emit distinct output
    * column names (the MV table's schema). When the defining shape is
    * a re-aggregable aggregate over one inner join of two gvt tables,
    * the view self-upgrades to DIFFERENTIAL maintenance (see
    * [[JoinAggInfo]]). */
  def createExact(spark: SparkSession, mvRoot: String, sql: String): Unit = {
    val (df, matchPlan) = buildDefPlan(spark, sql)
    val names = df.schema.fieldNames
    require(names.distinct.length == names.length,
      s"defining query emits duplicate column names: ${names.mkString(",")}")
    val versions = gvtVersionsOf(matchPlan)
    require(versions.nonEmpty,
      "defining query reads no gvt relation — freshness would be " +
        "unanchored; materialize a plain table instead")
    val joinAgg = recognizeSafe(matchPlan, names.toSeq)
    val spec = ExactSpec(mvRoot, sql, versions)
    // sides first: the _mv_exact commit is the transaction point
    val sideVs = joinAgg.map(info =>
      writeJoinSideTables(spark, info, mvRoot, "MV_CREATE"))
      .getOrElse(Map.empty[String, Long])
    building.set(true)
    val mvv =
      try VersionedTable.write(exactMvFrame(spark, df, joinAgg), mvRoot,
        operation = "MV_CREATE",
        metaFiles = Map("_mv_exact" -> serializeExact(spec)))
      finally building.set(false)
    exactRegistry.put(norm(mvRoot),
      ExactEntry(spec, matchPlan, df.schema.map(_.dataType), joinAgg, mvv,
        sideVs))
    stampRegistration(versions.keys, mvRoot)
  }

  /** Re-register a persisted exact view (newest `_mv_exact` wins). The
    * defining plan is rebuilt against LIVE versions; if the recorded
    * versions differ (the base moved while detached), the match plan is
    * parked unmatchable until a refresh realigns data and plan. */
  def attachExact(spark: SparkSession, mvRoot: String): ExactSpec = {
    val spec = VersionedTable.committedVersions(mvRoot).reverse.iterator
      .flatMap(v => VersionedTable.readMeta(mvRoot, v, "_mv_exact"))
      .toSeq.headOption.map(parseExact(mvRoot, _))
      .getOrElse(throw new IllegalArgumentException(
        s"no _mv_exact metadata at $mvRoot — not an exact materialized view"))
    registerExact(spark, spec)
    spec
  }

  /** Register `spec` with a defining plan built against live versions;
    * when the live plan no longer corresponds to the versions the MV
    * DATA represents, the entry keeps an unmatchable placeholder plan —
    * fail-closed: a stale view degrades to base scans, never serves. */
  private def registerExact(spark: SparkSession, spec: ExactSpec): Unit = {
    val (df, matchPlan) = buildDefPlan(spark, spec.sql)
    val outNames = df.schema.fieldNames.toSeq
    val aligned = gvtVersionsOf(matchPlan) == spec.baseVersions
    val mp: LogicalPlan =
      if (aligned) matchPlan
      else org.apache.spark.sql.catalyst.plans.logical.LocalRelation(Nil)
    val joinAgg = if (aligned) recognizeSafe(matchPlan, outNames) else None
    exactRegistry.put(norm(spec.mvRoot),
      ExactEntry(spec, mp, df.schema.map(_.dataType), joinAgg,
        VersionedTable.latestVersion(spec.mvRoot).getOrElse(-1L),
        joinAgg.map(cdValueAttrs).getOrElse(Nil).map { case (out, _) =>
          out -> VersionedTable
            .latestVersion(sideRootOf(spec.mvRoot, out)).getOrElse(-1L)
        }.toMap))
  }

  /** Base roots a view is anchored on (either tier). */
  private def baseRootsOf(mvRoot: String): Seq[String] = {
    val key = norm(mvRoot)
    Option(exactRegistry.get(key))
      .map(_.spec.baseVersions.keys.toSeq)
      .orElse {
        val it = registry.values().iterator()
        var found: Option[Seq[String]] = None
        while (it.hasNext && found.isEmpty)
          found = it.next().get(key).map(s => Seq(s.baseRoot))
        found
      }
      .getOrElse(throw new IllegalArgumentException(
        s"$mvRoot is not a registered materialized view — " +
          "create/attach it first"))
  }

  /** Continuous maintenance (Databricks "continuous mode" MVs): a
    * micro-batch stream over each base's change feed whose only job is
    * to call [[refresh]] when commits land — the refresh itself stays
    * the incremental/rebuild logic above, and a tick with nothing new
    * is a listing-cost no-op. Exactly-once is irrelevant here (refresh
    * is idempotent and self-versioning), so replays after checkpoint
    * recovery are harmless. A multi-base view runs one stream per base
    * root — their concurrent refresh() calls serialize on the per-MV
    * lock inside [[refresh]], so interleaved folds cannot double-apply
    * or drop a delta. Returns the started queries — one per base
    * root; `processAllAvailable()`/`stop()` them like any stream. */
  def continuousRefresh(spark: SparkSession, mvRoot: String,
                        checkpointDir: String)
      : Seq[org.apache.spark.sql.streaming.StreamingQuery] =
    baseRootsOf(mvRoot).zipWithIndex.map { case (root, i) =>
      spark.readStream.format("gvt-cdf").load(root)
        .writeStream
        .option("checkpointLocation", s"$checkpointDir/$i")
        .foreachBatch { (_: DataFrame, _: Long) =>
          refresh(spark, mvRoot); ()
        }
        .start()
    }

  /** Recognize the differential-maintenance shape in an optimized
    * defining plan; None = refresh stays a full re-run. */
  private def recognizeJoinAgg(matchPlan: LogicalPlan): Option[JoinAggInfo] =
    matchPlan match {
      case Aggregate(ge, ae, child, _) =>
        // the subtree below the aggregate: per-row operators and inner
        // joins only, at least two gvt relation references (pre-order
        // collection fixes the positional Δ-term order)
        var joins = 0
        var rels: Seq[LogicalRelation] = Nil
        var clean = true
        child.foreach {
          case j: Join =>
            if (j.joinType != Inner || j.condition.isEmpty) clean = false
            else joins += 1
          case lr: LogicalRelation => rels :+= lr
          case _: Project | _: Filter | _: SubqueryAlias => ()
          case _ => clean = false
        }
        if (!clean || joins == 0 || rels.size < 2 || joins != rels.size - 1)
          return None
        val roots = rels.map(lr => gvtVersionsOf(lr).keys.toSeq match {
          case Seq(r) => r
          case _ => return None
        })
        // grouping keys must be bare attrs; every output either echoes
        // a grouping key or is a re-aggregable aggregate alias
        val geAttrs = ge.map {
          case a: AttributeReference => a
          case _ => return None
        }
        val groups = scala.collection.mutable.ArrayBuffer.empty[String]
        val aggs = scala.collection.mutable.ArrayBuffer.empty[AggSpec]
        // the fold (and the MV table it maintains) lays out groups
        // first, then aggregates — require the defining output in that
        // order so create/refresh write byte-compatible schemas
        ae.foreach {
          case a: AttributeReference if geAttrs.exists(_.exprId == a.exprId) =>
            if (aggs.nonEmpty) return None
            groups += a.name
          case al @ Alias(a: AttributeReference, _)
              if geAttrs.exists(_.exprId == a.exprId) =>
            if (aggs.nonEmpty) return None
            groups += al.name
          case al @ Alias(ag: AggregateExpression, _)
              if ag.filter.isEmpty && !ag.isDistinct =>
            ag.aggregateFunction match {
              case Sum(_: AttributeReference, _) =>
                aggs += AggSpec("sum", "_join", al.name)
              case Count(Seq(l: Literal)) if l.value != null =>
                aggs += AggSpec("count", "*", al.name)
              case Count(Seq(_: AttributeReference)) =>
                aggs += AggSpec("count", "_join", al.name)
              case Min(_: AttributeReference) =>
                aggs += AggSpec("min", "_join", al.name)
              case Max(_: AttributeReference) =>
                aggs += AggSpec("max", "_join", al.name)
              case _ => return None
            }
          case al @ Alias(ag: AggregateExpression, _)
              if ag.filter.isEmpty && ag.isDistinct =>
            // count(DISTINCT attr): maintained via a per-(group, value)
            // multiplicity side table folded by the same signed
            // telescoping delta — inserts AND deletes stay O(delta)
            ag.aggregateFunction match {
              case Count(Seq(_: AttributeReference)) =>
                aggs += AggSpec("count_distinct", "_join", al.name)
              case _ => return None
            }
          case _ => return None
        }
        if (groups.isEmpty || aggs.isEmpty) return None
        Some(JoinAggInfo(groups.toSeq, aggs.toSeq, ge, ae, child,
          rels, roots))
      case _ => None
    }

  /** Delta rows of `root` across `(fromV, cur]`, aligned onto
    * `rel.output` (same names, SAME exprIds) so it substitutes for the
    * relation inside a cached plan. `sign` selects the change class:
    * 0 = every change row (insert-only ranges), +1 = additions
    * (insert/update_postimage), -1 = retractions
    * (delete/update_preimage) — the two halves of the signed
    * Z-relation delta Rᵢ_new − Rᵢ_old. None when the root is already
    * at `fromV`. */
  private def alignedDelta(spark: SparkSession, root: String, fromV: Long,
                           cur: Long, rel: LogicalRelation,
                           sign: Int = 0)
      : Option[LogicalPlan] = {
    if (cur == fromV) return None
    val chain = VersionedTable.committedVersions(root)
    val raw = chain.zip(chain.drop(1))
      .filter { case (_, b) => b > fromV && b <= cur }
      .map { case (a, b) => VersionedTable.changes(spark, root, a, b) }
      .reduce(_ unionByName _)
    val delta = (sign match {
      case 0 => raw
      case 1 => raw.filter(col("_change_type")
        .isin("insert", "update_postimage"))
      case _ => raw.filter(col("_change_type")
        .isin("delete", "update_preimage"))
    }).drop("_change_type")
    Some(alignTo(delta.queryExecution.analyzed, rel))
  }

  /** Alias `plan`'s output (matched by name) onto `rel.output`'s names
    * AND exprIds, making it a drop-in substitute for the relation. */
  private def alignTo(plan: LogicalPlan, rel: LogicalRelation): LogicalPlan = {
    val byName = plan.output.map(a => a.name -> a).toMap
    Project(rel.output.map(o =>
      Alias(byName(o.name), o.name)(exprId = o.exprId)), plan)
  }

  /** The differential delta-aggregate plan: the defining aggregate's
    * own expressions over the telescoping union
    * ⋃ᵢ R₁_old⋈…⋈ΔRᵢ⋈Rᵢ₊₁_new⋈…⋈Rₙ_new, with aggregate outputs
    * renamed to the fold's `_d_` protocol plus `_d_rows` / per-sum
    * non-null counters. Substitution is positional over the relation
    * REFERENCES (identity map), so repeated roots / self-joins stay
    * sound.
    *
    * Retractions (counting IVM): the telescoping identity is exact
    * over SIGNED multisets (Z-relations), and each term is linear in
    * its ΔRᵢ, so a range with deletes/updates splits per position into
    * an addition half Δ⁺ᵢ and a retraction half Δ⁻ᵢ (both from the
    * change feed). Every joined row of a term carries its delta row's
    * sign (the other sides are unsigned snapshots), so the signed
    * delta aggregate is P − N: the plain delta aggregate over the
    * Δ⁺-term union minus the one over the Δ⁻-term union — a DELETE
    * through a join view folds at O(changed ⋈ other sides), never a
    * base rescan. `retracting` lists the roots whose range carries
    * retractions (metadata-decided); sum/count algebra only — min/max
    * views rebuild on retraction (a removed row may carry the
    * extreme), the same trigger Delta's own MVs recompute on. */
  /** The telescoping delta-term union for one change class (`sign`)
    * over the references `pos` admits; None = no admitted reference
    * advanced (or its range carries no rows of that class). */
  private def deltaTermUnion(spark: SparkSession, info: JoinAggInfo,
                             oldV: Map[String, Long],
                             newV: Map[String, Long],
                             sign: Int, pos: Int => Boolean)
      : Option[LogicalPlan] = {
    val newPlanByRoot: Map[String, LogicalPlan] =
      info.roots.distinct.filter(r => oldV(r) != newV(r)).map { r =>
        r -> VersionedTable.readVersion(spark, r, newV(r))
          .queryExecution.analyzed
      }.toMap
    val deltaByIdx: Map[Int, LogicalPlan] =
      info.rels.indices.filter(pos).flatMap { i =>
        val r = info.roots(i)
        alignedDelta(spark, r, oldV(r), newV(r), info.rels(i), sign)
          .map(i -> _)
      }.toMap
    if (deltaByIdx.isEmpty) return None
    val variants: Seq[LogicalPlan] = deltaByIdx.keys.toSeq.sorted.map { i =>
      val mapping = new java.util.IdentityHashMap[LogicalRelation, LogicalPlan]()
      info.rels.zipWithIndex.foreach { case (rel, j) =>
        if (j == i) mapping.put(rel, deltaByIdx(i))
        else if (j > i && oldV(info.roots(j)) != newV(info.roots(j)))
          mapping.put(rel, alignTo(newPlanByRoot(info.roots(j)), rel))
        // j < i (and unadvanced j > i): keep the OLD reference as-is
      }
      info.joinChild.transformUp {
        case lr: LogicalRelation if mapping.containsKey(lr) => mapping.get(lr)
      }
    }
    Some(if (variants.size == 1) variants.head else Union(variants))
  }

  /** The defining aggregate over a term union, outputs renamed to the
    * fold's `_d_` protocol plus `_d_rows` / per-sum non-null counters. */
  private def diffAggOf(spark: SparkSession, info: JoinAggInfo,
                        unioned: LogicalPlan): DataFrame = {
    val iter = info.aggs.iterator
    val renamed: Seq[NamedExpression] = info.ae.map {
      case al @ Alias(ag: AggregateExpression, _)
          if iter.hasNext => // aggs were collected in ae order
        val spec = iter.next()
        // count_distinct deltas come from the SIDE fold — emit a
        // placeholder the caller overwrites (a distinct count over a
        // delta term union would be meaningless)
        if (spec.fn == "count_distinct")
          Alias(Literal(0L), s"_d_${spec.out}")()
        else Alias(ag, s"_d_${spec.out}")()
      case other => other // group echo keeps its name
    }
    val extras: Seq[NamedExpression] =
      Alias(Count(Literal(1)).toAggregateExpression(), "_d_rows")() +:
        info.ae.collect {
          case Alias(ag: AggregateExpression, n)
              if ag.aggregateFunction.isInstanceOf[Sum] =>
            val in = ag.aggregateFunction.asInstanceOf[Sum].child
            Alias(Count(in).toAggregateExpression(), s"_d_nn_$n")()
        }
    org.apache.spark.sql.graft.NativeColumns.ofPlan(spark,
      Aggregate(info.ge, renamed ++ extras, unioned))
  }

  private def diffDeltaAgg(spark: SparkSession, info: JoinAggInfo,
                           oldV: Map[String, Long],
                           newV: Map[String, Long],
                           retracting: Set[String]): DataFrame = {
    def aggOf(u: LogicalPlan): DataFrame = diffAggOf(spark, info, u)

    if (retracting.isEmpty)
      return aggOf(deltaTermUnion(spark, info, oldV, newV, 0, _ => true)
        .getOrElse(
          throw new IllegalStateException("refresh with no advanced base")))
    // Signed combination, FUSED (guide §1.2 remove passes, §2.4): the
    // retraction path used to aggregate the Δ⁺ and Δ⁻ term unions
    // SEPARATELY and merge the two group-sized aggregates with a
    // null-safe full-outer join — two aggregate shuffles plus a join
    // shuffle pair for what is algebraically ONE signed aggregate.
    // Each term-union row now carries its class sign and a single
    // aggregate computes P − N directly: sums weight by the sign,
    // counts sum the sign. Only sums/counts reach here (min/max over a
    // retraction takes the affected-group recompute path), so the
    // signed algebra is total.
    val pos = deltaTermUnion(spark, info, oldV, newV, 1, _ => true)
    val neg = deltaTermUnion(spark, info, oldV, newV, -1,
      i => retracting.contains(info.roots(i)))
    if (pos.isEmpty && neg.isEmpty)
      throw new IllegalStateException("refresh with no advanced base")
    signedDeltaAgg(spark, info, pos, neg)
  }

  /** The fused signed delta aggregate: project each admitted term
    * union to (groups, per-aggregate input values, `__sign` = ±1),
    * union, and aggregate once — `_d_<out>` for a sum is
    * Σ value·sign (cast back to the defining sum's type), for a count
    * the signed non-null count, `_d_rows` = Σ sign, per-sum `_d_nn_*`
    * the signed non-null counters. count_distinct emits the same 0L
    * placeholder [[diffAggOf]] does (the side fold overwrites it). */
  private def signedDeltaAgg(spark: SparkSession, info: JoinAggInfo,
                             posU: Option[LogicalPlan],
                             negU: Option[LogicalPlan]): DataFrame = {
    val gAliases = info.ge.zip(info.groups).map { case (e, n) =>
      Alias(e, n)() }
    // per-aggregate input expression + the defining sum's result type,
    // paired in ae order exactly like diffAggOf/cdValueAttrs
    val it = info.aggs.iterator
    val valAliases: Seq[(AggSpec, Option[NamedExpression], Option[DataType])] =
      info.ae.collect {
        case Alias(ag: AggregateExpression, _) if it.hasNext =>
          val spec = it.next()
          ag.aggregateFunction match {
            case s: Sum =>
              (spec, Some(Alias(s.child, s"_v_${spec.out}")()),
                Some(ag.dataType))
            case c: Count if c.children.size == 1 &&
                !c.children.head.foldable && spec.fn == "count" =>
              (spec, Some(Alias(c.children.head, s"_v_${spec.out}")()),
                None)
            case _ => (spec, None, None) // count(*) / count_distinct
          }
      }
    def side(u: LogicalPlan, s: Long): DataFrame =
      org.apache.spark.sql.graft.NativeColumns.ofPlan(spark,
        Project(gAliases ++ valAliases.flatMap(_._2) :+
          (Alias(Literal(s), "__sign")(): NamedExpression), u))
    val parts = posU.map(side(_, 1L)).toSeq ++ negU.map(side(_, -1L)).toSeq
    val delta = parts.reduce(_ unionByName _)
    val sgn = col("__sign")
    def signedNn(out: String): Column =
      sum(when(col(s"_v_$out").isNotNull, sgn).otherwise(lit(0L)))
    val dCols: Seq[Column] = valAliases.map { case (a, _, sumType) =>
      (a.fn match {
        case "sum" =>
          // cast back to the defining sum's type so the fold (and the
          // committed MV schema) see the same type the insert-only
          // path produces
          sumType.foldLeft(sum(col(s"_v_${a.out}") * sgn))((c, t) =>
            c.cast(t))
        case "count" if a.col == "*" => sum(sgn)
        case "count" => signedNn(a.out)
        case "count_distinct" => max(lit(0L)) // placeholder, caller overwrites
        case other => // min/max retractions take the recompute path
          throw new IllegalStateException(
            s"signed fold cannot serve '$other' (caller must recompute)")
      }).as(s"_d_${a.out}")
    } ++ (sum(sgn).as("_d_rows") +:
      valAliases.collect { case (a, _, _) if a.fn == "sum" =>
        signedNn(a.out).as(s"_d_nn_${a.out}") })
    delta.groupBy(info.groups.map(col): _*).agg(dCols.head, dCols.tail: _*)
  }

  /** The signed per-(group, value) multiplicity delta of one JOIN-view
    * count_distinct aggregate across a refresh range: the telescoping
    * term unions projected to (groups, value), each row carrying its
    * class sign — exactly the side-fold's `_dmult` input. */
  private def joinSideDelta(spark: SparkSession, info: JoinAggInfo,
                            oldV: Map[String, Long],
                            newV: Map[String, Long],
                            retracting: Set[String],
                            vAttr: AttributeReference): DataFrame = {
    val gAliases = info.ge.zip(info.groups).map { case (e, n) =>
      Alias(e, n)() }
    def rowsOf(u: LogicalPlan, s: Long): DataFrame =
      org.apache.spark.sql.graft.NativeColumns.ofPlan(spark,
        Project(gAliases :+ (vAttr: NamedExpression), u))
        .withColumn("__sign", lit(s))
    val parts: Seq[DataFrame] =
      if (retracting.isEmpty)
        deltaTermUnion(spark, info, oldV, newV, 0, _ => true)
          .map(rowsOf(_, 1L)).toSeq
      else
        deltaTermUnion(spark, info, oldV, newV, 1, _ => true)
          .map(rowsOf(_, 1L)).toSeq ++
          deltaTermUnion(spark, info, oldV, newV, -1,
            i => retracting.contains(info.roots(i)))
            .map(rowsOf(_, -1L)).toSeq
    val delta = parts.reduceOption(_ unionByName _).getOrElse(
      throw new IllegalStateException("refresh with no advanced base"))
    delta.filter(col(vAttr.name).isNotNull)
      .groupBy((info.groups :+ vAttr.name).map(col): _*)
      .agg(sum(col("__sign")).as("_dmult"))
  }

  /** Join-view tier of the affected-group recompute: a min/max view
    * over a retraction range re-aggregates ONLY the key groups present
    * in the retraction delta — from the LIVE join restricted to them
    * (per-column IN prefilters push through the join to the owning
    * side's scan for data skipping; an exact null-safe semi join
    * against the broadcast key set keeps the replaced set precise) —
    * while every other group folds the insert-only remainder as usual.
    * `info` is the REGISTERED shape (its joinChild reads the old
    * snapshots the delta terms telescope from); `liveInfo` the shape
    * re-recognized on the live plan (its joinChild reads the new
    * snapshots the recompute aggregates). None = the retraction
    * touched more than [[AffectedGroupCap]] groups — the caller
    * re-runs the defining plan. */
  private def minMaxRetractJoinFold(spark: SparkSession, mvRoot: String,
                                    info: JoinAggInfo,
                                    liveInfo: JoinAggInfo,
                                    oldV: Map[String, Long],
                                    newV: Map[String, Long],
                                    retracting: Set[String],
                                    meta: (String, String)): Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, EqualNullSafe, In, IsNull, Or}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.JoinHint
    import org.apache.spark.sql.graft.NativeColumns

    val negU = deltaTermUnion(spark, info, oldV, newV, -1,
      i => retracting.contains(info.roots(i))).getOrElse {
      // the range carried retraction-class commits but no retraction
      // ROWS — the plain insert-only fold is exact
      return Some(foldIntoMv(spark, mvRoot, info.groups, info.aggs,
        diffDeltaAgg(spark, info, oldV, newV, Set.empty), meta))
    }
    val negKeys = NativeColumns.ofPlan(spark,
      Project(info.ge.zip(info.groups).map { case (g, n) =>
        Alias(g, n)() }, negU))
    val affected = collectAffected(negKeys).getOrElse(return None)
    val aff = affectedFrame(spark, info.groups, negKeys.schema, affected)

    // insert-only remainder for groups no retraction touched
    val dAggOpt = deltaTermUnion(spark, info, oldV, newV, 1, _ => true)
      .map(u => diffAggOf(spark, info, u))
      .map(d => d.join(broadcast(aff), nullSafeOn(d, aff, info.groups),
        "left_anti"))

    // recompute the affected groups over the live join
    val skipExpr: Expression = liveInfo.ge.zipWithIndex.map { case (g, i) =>
      val vals = affected.map(_.get(i)).distinct
      val nonNull = vals.filter(_ != null).toIndexedSeq
      val dt = negKeys.schema(i).dataType
      val f: Expression =
        if (nonNull.isEmpty) Literal(false)
        else In(g, nonNull.map(v => Literal.create(v, dt)))
      if (vals.contains(null)) Or(f, IsNull(g)) else f
    }.reduce(CAnd(_, _))
    val affPlan = aff.queryExecution.analyzed
    val semiCond = liveInfo.ge.zip(affPlan.output).map { case (g, a) =>
      EqualNullSafe(g, a): Expression }.reduce(CAnd(_, _))
    val recomputed = NativeColumns.ofPlan(spark,
      Aggregate(liveInfo.ge, liveInfo.ae ++ internalExtras(liveInfo),
        Join(Filter(skipExpr, liveInfo.joinChild), affPlan, LeftSemi,
          Some(semiCond), JoinHint.NONE)))

    val old = VersionedTable.readLatest(spark, mvRoot)
    val oldKept = old.join(broadcast(aff),
      nullSafeOn(old, aff, info.groups), "left_anti")
    val merged = dAggOpt match {
      case Some(d) => foldFrames(oldKept, d, info.groups, info.aggs)
      case None    => oldKept
    }
    Some(VersionedTable.write(merged.unionByName(recomputed), mvRoot,
      operation = "MV_REFRESH", metaFiles = Map(meta)))
  }

  /** The cached plan with every gvt relation re-pointed at its LIVE
    * snapshot, output attrs (names, exprIds) preserved — refresh works
    * from the plan itself, so a defining SQL bound to snapshot-pinning
    * temp views cannot go stale, and plan/data/versions are consistent
    * by construction (no re-parse race). A relation whose live schema
    * diverged keeps its old node (the aligned-versions check downstream
    * then parks the view fail-closed). */
  private def reresolve(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case lr: LogicalRelation =>
        gvtVersionsOf(lr).keys.toSeq match {
          case Seq(root) =>
            // read through the gvt SOURCE (readLatest's internal reader
            // plans a plain parquet relation — the fresh node must keep
            // its GvtFileIndex/GvtDvRelation identity for matching)
            spark.read.format("gvt").load(root)
              .queryExecution.analyzed match {
              case f: LogicalRelation if f.schema == lr.schema =>
                lr.copy(relation = f.relation)
              case _ => lr
            }
          case _ => lr
        }
    }

  private def refreshExact(spark: SparkSession, entry: ExactEntry): Unit = {
    val live = entry.spec.baseVersions.keys.map(r =>
      r -> VersionedTable.latestVersion(r).getOrElse(-1L)).toMap
    if (live == entry.spec.baseVersions) return // fresh: no commit

    val mpLive = reresolve(spark, entry.matchPlan)
    val liveV = gvtVersionsOf(mpLive)
    if (liveV.keySet != entry.spec.baseVersions.keySet) {
      // a parked (unmatchable) entry carries no resolvable plan — fall
      // back to re-parsing the defining SQL (needs its views in scope)
      val (df, matchPlan) = buildDefPlan(spark, entry.spec.sql)
      val names = df.schema.fieldNames.toSeq
      val joinAgg = recognizeSafe(matchPlan, names)
      val spec = entry.spec.copy(baseVersions = gvtVersionsOf(matchPlan))
      val sideVs = joinAgg.map(info =>
        writeJoinSideTables(spark, info, spec.mvRoot, "MV_REBUILD"))
        .getOrElse(Map.empty[String, Long])
      building.set(true)
      val mvv =
        try VersionedTable.write(exactMvFrame(spark, df, joinAgg),
          spec.mvRoot, operation = "MV_REBUILD",
          metaFiles = Map("_mv_exact" -> serializeExact(spec)))
        finally building.set(false)
      exactRegistry.put(norm(spec.mvRoot),
        ExactEntry(spec, matchPlan, df.schema.map(_.dataType), joinAgg, mvv,
          sideVs))
      return
    }
    val outNames = entry.matchPlan.output.map(_.name)
    val next = entry.spec.copy(baseVersions = liveV)

    def insertOnlyRange(root: String): Boolean = {
      val from = entry.spec.baseVersions(root); val to = liveV(root)
      // the chain memo carries per-commit operations — no per-hop reads
      VersionedTable.committedChain(root)
        .filter(c => c.version > from && c.version <= to)
        .forall(c => insertOnly(c.operation.trim))
    }

    def rerun(): Unit = {
      // re-run the defining plan at live versions: plan, data, and
      // recorded versions pin the SAME snapshots by construction
      val joinAgg = recognizeSafe(mpLive, outNames)
      val df = org.apache.spark.sql.graft.NativeColumns.ofPlan(spark, mpLive)
      // sides first: the _mv_exact commit is the transaction point
      val sideVs = joinAgg.map(info =>
        writeJoinSideTables(spark, info, next.mvRoot, "MV_REBUILD"))
        .getOrElse(Map.empty[String, Long])
      building.set(true)
      val mvv =
        try VersionedTable.write(exactMvFrame(spark, df, joinAgg),
          next.mvRoot, operation = "MV_REBUILD",
          metaFiles = Map("_mv_exact" -> serializeExact(next)))
        finally building.set(false)
      exactRegistry.put(norm(next.mvRoot),
        ExactEntry(next, mpLive, entry.outTypes, joinAgg, mvv, sideVs))
    }

    // differential eligibility: sum/count views fold ANY feed-served
    // range (retractions ride the signed counting-IVM fold); min/max
    // views fold insert-only ranges and RECOMPUTE only the
    // retraction-affected groups otherwise (a removed row may carry an
    // extreme, but only of a group it belonged to)
    val diffable: Option[(JoinAggInfo, Set[String])] =
      entry.joinAgg.flatMap { info =>
        if (liveV.keySet != entry.spec.baseVersions.keySet) None
        else Some((info,
          info.roots.distinct.filterNot(insertOnlyRange).toSet))
      }

    diffable match {
      case Some((info, retracting)) =>
        // differential: fold the telescoping delta-join union into the
        // MV — all-old ⋈ all-old (the dominant term) never recomputes
        val hasMinMax =
          info.aggs.exists(a => a.fn == "min" || a.fn == "max")
        val cds = cdValueAttrs(info)
        val newSideVs = scala.collection.mutable.Map.empty[String, Long]
        building.set(true)
        val mvv =
          try {
            if (retracting.nonEmpty && hasMinMax) {
              // the min/max + count_distinct + retraction combo keeps
              // the simple re-run (the recompute path would need side
              // recomputation for the affected groups)
              val r = if (cds.nonEmpty) None
                else recognizeSafe(mpLive, outNames).flatMap { liveInfo =>
                  minMaxRetractJoinFold(spark, entry.spec.mvRoot, info,
                    liveInfo, entry.spec.baseVersions, liveV, retracting,
                    "_mv_exact" -> serializeExact(next))
                }
              if (r.isEmpty && cds.isEmpty)
                log.warn(s"${entry.spec.mvRoot}: min/max retraction " +
                  s"touched more than $AffectedGroupCap groups — " +
                  "defining-plan re-run")
              r
            } else Some {
              var dAgg = diffDeltaAgg(spark, info,
                entry.spec.baseVersions, liveV, retracting)
              // count_distinct: fold each side table with the signed
              // per-(group, value) delta and overwrite the placeholder
              // _d_ column with the distinct-count delta. Each side's
              // persisted fold join is released AFTER the MV fold
              // commits (the delta keeps recomputable lineage over it)
              val releases = scala.collection.mutable.ListBuffer
                .empty[() => Unit]
              try {
                cds.foreach { case (out, vAttr) =>
                  val dm = joinSideDelta(spark, info,
                    entry.spec.baseVersions, liveV, retracting, vAttr)
                  val (sv, dAggD, release) = foldSideFrame(spark,
                    sideRootOf(entry.spec.mvRoot, out),
                    (info.groups :+ vAttr.name).distinct, info.groups, out,
                    dm, fromToken(entry.spec.baseVersions))
                  releases += release
                  newSideVs(out) = sv
                  val jj = dAgg.join(dAggD,
                    info.groups.map(g => dAgg(g) <=> dAggD(g))
                      .reduce(_ && _), "left")
                  dAgg = jj.select(dAgg.columns.toSeq.map { c =>
                    if (c == s"_d_$out")
                      coalesce(dAggD(s"_d_$out"), lit(0L)).as(c)
                    else dAgg(c)
                  }: _*)
                }
                foldIntoMv(spark, entry.spec.mvRoot, info.groups, info.aggs,
                  dAgg, "_mv_exact" -> serializeExact(next))
              } finally releases.foreach(_())
            }
          } catch {
            // a hop the keyless feed cannot reconstruct (sidecar-less
            // UPDATE_DV): degrade to the defining-plan re-run — the MV
            // never mutates its base to compensate. ONLY the dedicated
            // feed refusal degrades: a genuine bug surfacing as a bare
            // UnsupportedOperationException propagates instead of
            // silently forfeiting the O(delta) guarantee.
            case e: VersionedTable.ChangeFeedUnavailable =>
              log.warn(s"${entry.spec.mvRoot}: differential refresh " +
                s"degraded to defining-plan re-run — ${e.getMessage}")
              None
          } finally building.set(false)
        mvv match {
          case Some(v) =>
            exactRegistry.put(norm(next.mvRoot), ExactEntry(next, mpLive,
              entry.outTypes, recognizeSafe(mpLive, outNames), v,
              entry.sideVersions ++ newSideVs))
          case None => rerun()
        }
      case None => rerun()
    }
  }

  /** The internal row-count column plus per-sum non-null counters. */
  private def internalAggs(aggs: Seq[AggSpec]): Seq[Column] =
    count(lit(1)).cast("long").as("_rows") +:
      aggs.filter(_.fn == "sum").map(a =>
        count(col(a.col)).cast("long").as(s"_nn_${a.out}"))

  private def userAgg(a: AggSpec): Column = a.fn match {
    case "sum"   => sum(col(a.col)).as(a.out)
    case "min"   => min(col(a.col)).as(a.out)
    case "max"   => max(col(a.col)).as(a.out)
    case "count_distinct" =>
      countDistinct(col(a.col)).cast("long").as(a.out)
    case "count" =>
      (if (a.col == "*") count(lit(1)) else count(col(a.col)))
        .cast("long").as(a.out)
  }

  /** Build (or rebuild) the multiplicity side tables of a spec's
    * count_distinct aggregates from a base snapshot. Returns out →
    * committed side version. */
  private def writeSideTables(spark: SparkSession, base: DataFrame,
                              spec: MvSpec,
                              operation: String): Map[String, Long] =
    spec.aggs.filter(_.fn == "count_distinct").map { a =>
      val keys = (spec.groups :+ a.col).distinct
      val side = base.filter(col(a.col).isNotNull)
        .groupBy(keys.map(col): _*)
        .agg(count(lit(1)).cast("long").as("_mult"))
      a.out -> VersionedTable.write(side, sideRootOf(spec.mvRoot, a.out),
        operation = operation,
        metaFiles = Map("_mv_side_from" -> "-"))
    }.toMap

  private def aggregate(base: DataFrame, groups: Seq[String],
                        aggs: Seq[AggSpec]): DataFrame = {
    val cols = aggs.map(userAgg) ++ internalAggs(aggs)
    base.groupBy(groups.map(col): _*).agg(cols.head, cols.tail: _*)
  }

  /** Build the MV over the base table's LIVE snapshot and register it
    * for rewrite. Returns the pinned base version. */
  def create(spark: SparkSession, baseRoot: String, mvRoot: String,
             groups: Seq[String], aggs: Seq[AggSpec]): Long = {
    require(groups.nonEmpty, "MV needs at least one grouping column")
    require(aggs.nonEmpty, "MV needs at least one aggregate")
    val v = VersionedTable.latestVersion(baseRoot).getOrElse(
      throw new IllegalArgumentException(s"no versions at $baseRoot"))
    val spec = MvSpec(mvRoot, baseRoot, v, groups, aggs)
    val baseDf = VersionedTable.readVersion(spark, baseRoot, v)
    val mv = aggregate(baseDf, groups, aggs)
    // sides FIRST: the _mv metadata commit is the transaction point —
    // a crash before it leaves only harmless orphan side writes
    val sideVs = writeSideTables(spark, baseDf, spec, "MV_CREATE")
    val mvv = VersionedTable.write(mv, mvRoot, operation = "MV_CREATE",
      metaFiles = Map("_mv" -> spec.serialize))
    register(spec.copy(mvVersion = mvv, sideVersions = sideVs))
    stampRegistration(Seq(baseRoot), mvRoot)
    v
  }

  /** Re-register an MV persisted by an earlier session: newest `_mv`
    * metadata wins (each refresh re-stamps it). */
  def attach(mvRoot: String): MvSpec = {
    val spec0 = VersionedTable.committedVersions(mvRoot).reverse.iterator
      .flatMap(v => VersionedTable.readMeta(mvRoot, v, "_mv"))
      .toSeq.headOption
      .map(parseSpec(mvRoot, _))
      .getOrElse(throw new IllegalArgumentException(
        s"no _mv metadata at $mvRoot — not a materialized view"))
    val spec = spec0.copy(
      mvVersion = VersionedTable.latestVersion(mvRoot).getOrElse(-1L),
      sideVersions = spec0.aggs.filter(_.fn == "count_distinct").map(a =>
        a.out -> VersionedTable.latestVersion(sideRootOf(mvRoot, a.out))
          .getOrElse(-1L)).toMap)
    register(spec)
    spec
  }

  /** Commits that cannot change the live row set (rewrites/maintenance
    * of the SAME rows) — they never invalidate incremental min/max. */
  private def rowNeutral(op: String): Boolean =
    op.startsWith("OPTIMIZE") || op.startsWith("COMPACT") ||
      op.startsWith("VACUUM") || op.startsWith("ANALYZE") ||
      op.startsWith("CLUSTER") || op.startsWith("MV_")

  private def insertOnly(op: String): Boolean =
    op == "APPEND" || rowNeutral(op)

  /** Bring the MV up to its bases' live versions. Aggregate views go
    * incremental (change-feed delta + MV-sized merge) whenever the
    * algebra allows, with full re-aggregation only for min/max over a
    * row-removing range; exact-match views re-run their defining query.
    * No-op (and no commit) when already fresh. Returns the now-current
    * base version (aggregate views) or the max base version (exact). */
  def refresh(spark: SparkSession, mvRoot: String): Long = {
    val key = norm(mvRoot)
    // serialize refresh PER MV: continuousRefresh runs one stream per
    // base root, so a multi-base view gets concurrent refresh() calls —
    // unserialized, two interleaved folds could both read the same MV
    // snapshot and double-apply or drop a delta
    refreshLocks.computeIfAbsent(key, _ => new Object).synchronized {
      refreshLocked(spark, mvRoot, key)
    }
  }

  private val refreshLocks = new ConcurrentHashMap[String, Object]()

  private def refreshLocked(spark: SparkSession, mvRoot: String,
                            key: String): Long = {
    def isAggRegistered: Boolean = {
      val it = registry.values().iterator()
      while (it.hasNext) if (it.next().contains(key)) return true
      false
    }
    Option(exactRegistry.get(key)).orElse {
      // not in-memory: a persisted exact view attaches on demand
      if (!isAggRegistered &&
          VersionedTable.committedVersions(mvRoot).reverse
            .exists(v => VersionedTable.readMeta(mvRoot, v, "_mv_exact")
              .isDefined)) {
        attachExact(spark, mvRoot); Option(exactRegistry.get(key))
      } else None
    } match {
      case Some(entry) =>
        refreshExact(spark, entry)
        return exactRegistry.get(key).spec.baseVersions.values
          .foldLeft(0L)(math.max)
      case None =>
    }
    val spec = specOf(mvRoot)
    val cur = VersionedTable.latestVersion(spec.baseRoot).getOrElse(
      throw new IllegalArgumentException(s"no versions at ${spec.baseRoot}"))
    if (cur == spec.baseVersion) return cur
    val ops = VersionedTable.committedChain(spec.baseRoot)
      .filter(c => c.version > spec.baseVersion && c.version <= cur)
      .map(_.operation.trim)
    val hasMinMax = spec.aggs.exists(a => a.fn == "min" || a.fn == "max")
    val hasCd = spec.aggs.exists(_.fn == "count_distinct")
    val next = spec.copy(baseVersion = cur)
    def rebuild(): (Long, Map[String, Long]) = {
      // a removed row could have carried the extreme (or the change
      // feed refused): re-aggregate the live snapshot
      val baseDf = VersionedTable.readVersion(spark, spec.baseRoot, cur)
      val mv = aggregate(baseDf, spec.groups, spec.aggs)
      val sv = writeSideTables(spark, baseDf, spec, "MV_REBUILD")
      (VersionedTable.write(mv, mvRoot, operation = "MV_REBUILD",
        metaFiles = Map("_mv" -> next.serialize)), sv)
    }
    val (mvv, sideVs) =
      if (hasMinMax && !ops.forall(insertOnly)) {
        // min/max over a retraction range: recompute ONLY the key
        // groups present in the retraction delta (a removed row can
        // carry the extreme of no other group); full re-aggregation
        // only past the group cap, when the feed can't reconstruct
        // the range, or when the spec mixes in count_distinct (the
        // rare combo keeps the simple rebuild)
        try {
          (if (hasCd) None else minMaxRetractFold(spark, spec, cur, next))
            .map((_, Map.empty[String, Long])).getOrElse {
              if (!hasCd)
                log.warn(s"$mvRoot: retraction touched more than " +
                  s"$AffectedGroupCap groups — full re-aggregation")
              rebuild()
            }
        }
        catch {
          case e: VersionedTable.ChangeFeedUnavailable =>
            log.warn(s"$mvRoot: min/max retraction refresh degraded " +
              s"to full re-aggregation — ${e.getMessage}")
            rebuild()
        }
      }
      else {
        // the keyless feed refuses DML ranges captured without
        // `gvt.enableChangeDataFeed` sidecars — the MV never mutates its
        // base to compensate (no auto-backfill); it degrades to a full
        // re-aggregation, and stays incremental once the property is on.
        // Only the dedicated refusal degrades (and is logged); any other
        // UnsupportedOperationException is a real bug and propagates.
        try incrementalFold(spark, spec, cur, next)
        catch {
          case e: VersionedTable.ChangeFeedUnavailable =>
            log.warn(s"$mvRoot: incremental refresh degraded to full " +
              s"re-aggregation — ${e.getMessage}")
            rebuild()
        }
      }
    register(next.copy(mvVersion = mvv, sideVersions = sideVs))
    cur
  }

  private def specOf(mvRoot: String): MvSpec = {
    val key = norm(mvRoot)
    val it = registry.values().iterator()
    while (it.hasNext) {
      it.next().get(key) match {
        case Some(s) => return s
        case None    =>
      }
    }
    attach(mvRoot)
  }

  /** O(changed) delta from the keyless change feed, folded into the MV
    * with one MV-sized full-outer merge (null group keys match via
    * null-safe equality); groups whose row count hits zero drop out. */
  private def incrementalFold(spark: SparkSession, spec: MvSpec,
                              cur: Long, next: MvSpec)
      : (Long, Map[String, Long]) = {
    // the keyless feed is per-hop (a range across rewrite commits has
    // no single reconstruction) — walk consecutive committed pairs and
    // union, exactly the batch change-feed relation's shape; each hop
    // is O(its changes)
    val chain = VersionedTable.committedVersions(spec.baseRoot)
    val delta = chain.zip(chain.drop(1))
      .filter { case (_, b) => b > spec.baseVersion && b <= cur }
      .map { case (a, b) =>
        VersionedTable.changes(spark, spec.baseRoot, a, b)
          .select((spec.groups ++ spec.aggs.map(_.col).filter(_ != "*")
            ).distinct.map(col) :+ col("_change_type"): _*)
      }
      .reduce(_ unionByName _)
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    // delta aggregate per group: signed sums/counts; min/max only see
    // insert-only ranges here, so a plain min/max of the new rows
    // folds; count_distinct deltas come from the side fold below
    val dCols: Seq[Column] = spec.aggs
      .filter(_.fn != "count_distinct").map { a =>
      a.fn match {
        case "sum" => sum(col(a.col) * sign).as(s"_d_${a.out}")
        case "count" =>
          (if (a.col == "*") sum(sign)
           else sum(when(col(a.col).isNotNull, sign).otherwise(lit(0L))))
            .as(s"_d_${a.out}")
        case "min" => min(col(a.col)).as(s"_d_${a.out}")
        case "max" => max(col(a.col)).as(s"_d_${a.out}")
      }
    } ++ (sum(sign).as("_d_rows") +:
      spec.aggs.filter(_.fn == "sum").map(a =>
        sum(when(col(a.col).isNotNull, sign).otherwise(lit(0L)))
          .as(s"_d_nn_${a.out}")))
    var dAgg = delta.groupBy(spec.groups.map(col): _*)
      .agg(dCols.head, dCols.tail: _*)
    // count_distinct: fold each multiplicity side table with the same
    // signed delta, and derive the per-group distinct-count delta from
    // the values that APPEARED (multiplicity 0 → >0) minus those that
    // DISAPPEARED (>0 → 0) — the classic counting approach, exact for
    // inserts AND deletes
    val releases = scala.collection.mutable.ListBuffer.empty[() => Unit]
    try {
      val sideVs = spec.aggs.filter(_.fn == "count_distinct").map { a =>
        val (sv, dAggD, release) = foldSide(spark, spec, a, delta, sign)
        releases += release
        val j = dAgg.join(dAggD,
          spec.groups.map(g => dAgg(g) <=> dAggD(g)).reduce(_ && _), "left")
        dAgg = j.select(dAgg.columns.toSeq.map(c => dAgg(c)) :+
          coalesce(dAggD(s"_d_${a.out}"), lit(0L)).as(s"_d_${a.out}"): _*)
        a.out -> sv
      }.toMap
      (foldIntoMv(spark, spec.mvRoot, spec.groups, spec.aggs, dAgg,
        "_mv" -> next.serialize), sideVs)
    } finally releases.foreach(_())
  }

  /** Fold one count_distinct side table with the signed delta: merge
    * per-(group, value) multiplicities (side-sized, like the MV merge
    * is MV-sized), drop rows whose multiplicity hits zero, commit, and
    * return the new side version plus the per-group distinct-count
    * delta frame (`groups…, _d_<out>`) and its release. */
  private def foldSide(spark: SparkSession, spec: MvSpec, a: AggSpec,
                       delta: DataFrame, sign: Column)
      : (Long, DataFrame, () => Unit) = {
    val keys = (spec.groups :+ a.col).distinct
    val dm = delta.filter(col(a.col).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(sum(sign).as("_dmult"))
    foldSideFrame(spark, sideRootOf(spec.mvRoot, a.out), keys,
      spec.groups, a.out, dm,
      fromToken(Map(norm(spec.baseRoot) -> spec.baseVersion)))
  }

  /** The side-fold core, shared by the single-table and join tiers.
    * `dm` = the signed per-(keys) multiplicity delta (`_dmult`);
    * `from` = the [[fromToken]] of the base versions the range folds
    * FROM, stamped on the side commit (`_mv_side_from`) — if the
    * side's newest commit already carries this stamp, a previous
    * refresh committed the side and crashed before the MV commit, so
    * the fold is SKIPPED (idempotence) and the distinct delta
    * re-derives from the side's own last hop instead of
    * double-applying the delta.
    *
    * Returns (side version, distinct-delta frame, release). The delta
    * keeps its LINEAGE over the persisted join (no localCheckpoint:
    * that storage is non-reliable — an executor loss mid-refresh on a
    * real cluster would lose the delta with no recompute path, the r16
    * verdict's durability item — and the checkpoint job itself was a
    * full extra pass). The caller invokes `release()` once the delta
    * is consumed (after the MV fold commits); a recompute after
    * release is still CORRECT — the join rebuilds from the side's
    * still-readable pre-fold version and the change feed. */
  private[graft] def foldSideFrame(spark: SparkSession, sRoot: String,
                                   keys: Seq[String], groups: Seq[String],
                                   dOut: String, dm: DataFrame,
                                   from: String)
      : (Long, DataFrame, () => Unit) = {
    def distinctDelta(old: DataFrame, nu: DataFrame): DataFrame = {
      val cond = keys.map(k => old(k) <=> nu(k)).reduce(_ && _)
      val j = old.join(nu, cond, "full_outer")
      val chg = when(old("_mult").isNull && nu("_mult").isNotNull, lit(1L))
        .when(old("_mult").isNotNull && nu("_mult").isNull, lit(-1L))
        .otherwise(lit(0L))
      j.select(groups.map(g => coalesce(old(g), nu(g)).as(g)) :+
          chg.as("_chg"): _*)
        .groupBy(groups.map(col): _*)
        .agg(sum("_chg").as(s"_d_$dOut"))
        .filter(col(s"_d_$dOut") =!= 0)
    }
    val cur = VersionedTable.latestVersion(sRoot).getOrElse(-1L)
    if (cur >= 0 && VersionedTable.readMeta(sRoot, cur, "_mv_side_from")
        .map(_.trim).contains(from)) {
      // crash-recovery replay: the side already folded this range
      val prevV = VersionedTable.committedVersions(sRoot)
        .filter(_ < cur).lastOption
      log.warn(s"$sRoot: side table already folded from base [$from] " +
        "— deriving the distinct delta from its last hop")
      val prev = prevV.map(VersionedTable.readVersion(spark, sRoot, _))
        .getOrElse(VersionedTable.readLatest(spark, sRoot).limit(0))
      return (cur,
        distinctDelta(prev, VersionedTable.readVersion(spark, sRoot, cur)),
        () => ())
    }
    val old = VersionedTable.readLatest(spark, sRoot)
    val cond = keys.map(k => old(k) <=> dm(k)).reduce(_ && _)
    // TWO consumers derive from this join (the merged side table that
    // is written, and the distinct-count delta) — persist it so the
    // side-table-sized outer join is computed once, not re-scanned for
    // the delta (guide §5: reuse is real and bounded)
    val joined = old.join(dm, cond, "full_outer")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ok = false
    try {
      val newMult = coalesce(old("_mult"), lit(0L)) +
        coalesce(dm("_dmult"), lit(0L))
      val merged = joined
        .select(keys.map(k => coalesce(old(k), dm(k)).as(k)) :+
          newMult.as("_mult"): _*)
        .filter(col("_mult") > 0)
      val sv = VersionedTable.write(merged, sRoot, operation = "MV_REFRESH",
        metaFiles = Map("_mv_side_from" -> from))
      val chg = when(old("_mult").isNull && newMult > 0, lit(1L))
        .when(old("_mult").isNotNull && newMult <= 0, lit(-1L))
        .otherwise(lit(0L))
      val dAggD = joined
        .select(groups.map(g =>
          coalesce(old(g), dm(g)).as(g)) :+ chg.as("_chg"): _*)
        .groupBy(groups.map(col): _*)
        .agg(sum("_chg").as(s"_d_$dOut"))
        .filter(col(s"_d_$dOut") =!= 0)
      ok = true
      (sv, dAggD, () => { joined.unpersist(); () })
    } finally { if (!ok) { joined.unpersist(); () } }
  }

  /** Fold a `_d_`-prefixed per-group delta aggregate into the MV with
    * one MV-sized null-safe full-outer merge; groups whose row count
    * hits zero drop out. Shared by the single-table change-feed path
    * and the differential join path. */
  private def foldIntoMv(spark: SparkSession, mvRoot: String,
                         groups: Seq[String], aggs: Seq[AggSpec],
                         dAgg: DataFrame, meta: (String, String)): Long =
    VersionedTable.write(
      foldFrames(VersionedTable.readLatest(spark, mvRoot), dAgg,
        groups, aggs),
      mvRoot, operation = "MV_REFRESH", metaFiles = Map(meta))

  /** The merge itself: `old` (an MV-shaped frame) full-outer-joined
    * null-safely with the `_d_` delta aggregate. Min/max fold via
    * least/greatest, so the delta side must be INSERT-ONLY when the
    * spec carries extremes (the retraction paths recompute those
    * groups instead of handing them here). */
  private def foldFrames(old: DataFrame, dAgg: DataFrame,
                         groups: Seq[String],
                         aggs: Seq[AggSpec]): DataFrame = {
    val joinCond = groups.map(g => old(g) <=> dAgg(g)).reduce(_ && _)
    val joined = old.join(dAgg, joinCond, "full_outer")

    def both(o: Column, d: Column): Column = coalesce(o, lit(0L)) + coalesce(d, lit(0L))
    val groupCols = groups.map(g => coalesce(old(g), dAgg(g)).as(g))
    val newRows = both(old("_rows"), dAgg("_d_rows")).as("_rows")
    val aggCols: Seq[Column] = aggs.map { a =>
      val o = old(a.out); val d = dAgg(s"_d_${a.out}")
      a.fn match {
        // the side fold hands the per-group DISTINCT-COUNT delta
        // (values appeared minus values disappeared) — plain addition
        case "count" | "count_distinct" => both(o, d).as(a.out)
        case "sum" =>
          // SQL null contract: the sum is NULL iff no non-null input
          // survives; exact via the materialized non-null counters
          val nn = both(old(s"_nn_${a.out}"), dAgg(s"_d_nn_${a.out}"))
          when(nn === 0, lit(null)).otherwise(
            coalesce(o, lit(0)) + coalesce(d, lit(0))).as(a.out)
        case "min" => least(o, d).as(a.out)
        case "max" => greatest(o, d).as(a.out)
      }
    }
    val nnCols = aggs.filter(_.fn == "sum").map(a =>
      both(old(s"_nn_${a.out}"), dAgg(s"_d_nn_${a.out}")).as(s"_nn_${a.out}"))
    joined
      .select(groupCols ++ aggCols ++ (newRows +: nnCols): _*)
      .filter(col("_rows") > 0)
  }

  // ------------------------------------------------------------------
  // Affected-group recompute: min/max views over a RETRACTION range.
  // A removed row may have carried a group's extreme, so min/max can't
  // fold a retraction algebraically — but only the key groups PRESENT
  // IN THE RETRACTION DELTA can lose an extreme. Those groups are
  // re-aggregated from the live base restricted to them (per-column IN
  // prefilters push to the scan for data skipping; an exact null-safe
  // semi join keeps the replaced set precise), every other group folds
  // the insert-only remainder as usual, and the merge replaces exactly
  // the recomputed groups. Delta-bound in the common case — the full
  // re-aggregation a retraction used to force unconditionally now
  // happens only past the driver-side key cap or on a feed refusal.
  // ------------------------------------------------------------------

  /** Max distinct retraction-affected groups collected to the driver
    * (group keys are metadata, like IVF routing ids — but unbounded in
    * the worst case, so past the cap the refresh degrades to the full
    * re-aggregation). */
  private[sources] val AffectedGroupCap = 10000

  /** The retraction delta's distinct group keys, collected; None =
    * over the cap, caller degrades to a rebuild. */
  private def collectAffected(groupsDf: DataFrame)
      : Option[Array[org.apache.spark.sql.Row]] = {
    val a = groupsDf.distinct().limit(AffectedGroupCap + 1).collect()
    if (a.length > AffectedGroupCap) None else Some(a)
  }

  /** Per-column IN prefilter over the affected keys — a SUPERSET of
    * the affected groups (cross product over columns), pushable to the
    * scan for file/partition skipping; exactness comes from the semi
    * join layered on top. */
  private def skipFilter(groups: Seq[String],
                         affected: Array[org.apache.spark.sql.Row])
      : Column =
    groups.zipWithIndex.map { case (g, i) =>
      val vals = affected.map(_.get(i)).distinct
      val nonNull = vals.filter(_ != null)
      val f = if (nonNull.isEmpty) lit(false)
              else col(g).isin(nonNull.toIndexedSeq: _*)
      if (vals.contains(null)) f || col(g).isNull else f
    }.reduce(_ && _)

  /** The affected keys as a broadcastable frame with `__aff_`-prefixed
    * names (never colliding with MV/base columns). */
  private def affectedFrame(spark: SparkSession, groups: Seq[String],
                            schema: org.apache.spark.sql.types.StructType,
                            affected: Array[org.apache.spark.sql.Row])
      : DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(affected.toSeq.asJava, schema)
      .select(groups.map(g => col(g).as(s"__aff_$g")): _*)
  }

  private def nullSafeOn(left: DataFrame, aff: DataFrame,
                         groups: Seq[String]): Column =
    groups.map(g => left(g) <=> aff(s"__aff_$g")).reduce(_ && _)

  /** Single-table tier: refresh a min/max view across a range with
    * retractions at delta-bound cost. None = over the group cap, the
    * caller rebuilds. Feed refusals propagate (caller catches). */
  private def minMaxRetractFold(spark: SparkSession, spec: MvSpec,
                                cur: Long, next: MvSpec): Option[Long] = {
    val chain = VersionedTable.committedVersions(spec.baseRoot)
    val cols = (spec.groups ++ spec.aggs.map(_.col).filter(_ != "*")).distinct
    val delta = chain.zip(chain.drop(1))
      .filter { case (_, b) => b > spec.baseVersion && b <= cur }
      .map { case (a, b) =>
        VersionedTable.changes(spark, spec.baseRoot, a, b)
          .select(cols.map(col) :+ col("_change_type"): _*)
      }
      .reduce(_ unionByName _)
    val rets = delta.filter(col("_change_type")
      .isin("delete", "update_preimage"))
    val retGroups = rets.select(spec.groups.map(col): _*)
    val affected = collectAffected(retGroups).getOrElse(return None)
    val aff = affectedFrame(spark, spec.groups, retGroups.schema, affected)

    // insert-only remainder for groups NOT affected by a retraction
    val adds = delta.filter(col("_change_type")
      .isin("insert", "update_postimage"))
    val dCols: Seq[Column] = spec.aggs.map { a =>
      (a.fn match {
        case "sum"   => sum(col(a.col))
        case "count" => (if (a.col == "*") count(lit(1))
                         else count(col(a.col))).cast("long")
        case "min"   => min(col(a.col))
        case "max"   => max(col(a.col))
      }).as(s"_d_${a.out}")
    } ++ (count(lit(1)).cast("long").as("_d_rows") +:
      spec.aggs.filter(_.fn == "sum").map(a =>
        count(col(a.col)).cast("long").as(s"_d_nn_${a.out}")))
    val dAgg0 = adds.groupBy(spec.groups.map(col): _*)
      .agg(dCols.head, dCols.tail: _*)
    val dAgg = dAgg0.join(broadcast(aff), nullSafeOn(dAgg0, aff, spec.groups),
      "left_anti")

    // recompute the affected groups from the live snapshot: the IN
    // prefilter reaches the scan (partition pruning / file skipping on
    // clustered group columns), the semi join makes the set exact
    val basePruned = VersionedTable.readVersion(spark, spec.baseRoot, cur)
      .filter(skipFilter(spec.groups, affected))
    val recomputed = aggregate(
      basePruned.join(broadcast(aff), nullSafeOn(basePruned, aff, spec.groups),
        "left_semi"),
      spec.groups, spec.aggs)

    val old = VersionedTable.readLatest(spark, spec.mvRoot)
    val oldKept = old.join(broadcast(aff), nullSafeOn(old, aff, spec.groups),
      "left_anti")
    val merged = foldFrames(oldKept, dAgg, spec.groups, spec.aggs)
      .unionByName(recomputed)
    Some(VersionedTable.write(merged, spec.mvRoot, operation = "MV_REFRESH",
      metaFiles = Map("_mv" -> next.serialize)))
  }
}
