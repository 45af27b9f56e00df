package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import graft.sources.VersionedTable

/** Maintenance SQL for gvt tables — the statements Delta adds beyond
  * ANSI (Delta ships its own DeltaSqlParser for exactly these; this is
  * the same delegating-parser shape, injected by
  * [[graft.GraftExtensions]]):
  *
  *   OPTIMIZE <t> [ZORDER BY (c1, c2[, c3[, c4]])]
  *   VACUUM <t> [RETAIN <n> HOURS]
  *   DESCRIBE HISTORY <t>
  *
  * `<t>` is a registered gvt view/table name, or the path form
  * `` gvt.`/table/root` `` (Delta's ``delta.`path` `` idiom). Anything
  * else delegates verbatim to Spark's parser — the wrapper recognizes
  * only statements Spark itself cannot parse, so no valid Spark SQL
  * changes meaning.
  *
  * OPTIMIZE maps to the cheapest correct maintenance: a pure append
  * chain folds via [[VersionedTable.compactChain]] (O(appended), base
  * files untouched); deletion vectors, clone crossings, or ZORDER BY
  * take the full [[VersionedTable.compact]] rewrite. VACUUM maps to
  * [[VersionedTable.vacuum]] with the Delta retention contract
  * (`RETAIN n HOURS` → the retention window; snapshots newer than it
  * are never dropped). DESCRIBE HISTORY returns
  * [[VersionedTable.history]] newest-first. */
class GvtSqlParser(session: SparkSession, delegate: ParserInterface)
  extends ParserInterface {

  import GvtSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = {
    val t = sqlText.trim.stripSuffix(";").trim
    t match {
      case OptimizeRe(target, zorder) =>
        val zCols = Option(zorder).toSeq
          .flatMap(_.split(',')).map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty)
        GvtOptimizeCommand(target.trim, zCols)
      case VacuumRe(target, hours) =>
        GvtVacuumCommand(target.trim,
          Option(hours).map(h => h.trim.toLong * 3600L * 1000L))
      // `DESC history status` is VALID Spark SQL (describe column
      // 'status' of a table named 'history') — only claim the statement
      // when the target actually resolves to a gvt relation, else
      // delegate so no valid Spark SQL changes meaning
      case HistoryRe(target) if isGvtTarget(session, target.trim) =>
        GvtHistoryCommand(target.trim)
      // ALTER TABLE may grow constraint syntax in Spark itself — claim
      // only gvt targets (same guard as DESCRIBE HISTORY)
      case AddConstraintRe(target, name, expr)
          if isGvtTarget(session, target.trim) =>
        GvtAddConstraintCommand(target.trim, name.trim, expr.trim)
      case DropConstraintRe(target, name)
          if isGvtTarget(session, target.trim) =>
        GvtDropConstraintCommand(target.trim, name.trim)
      case RestoreRe(target, version) =>
        GvtRestoreCommand(target.trim, version.trim.toLong)
      // in-query VERSION AS OF / TIMESTAMP AS OF over gvt targets must
      // substitute at parse time — Spark's analyzer rejects time travel
      // on temp views before injected resolution rules run
      case _ => GvtTimeTravel.resolve(session, delegate.parsePlan(sqlText))
    }
  }

  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GvtSqlParser {
  // target = gvt.`path` | [`]ident[`] ; statements Spark can't parse,
  // so matching them first never shadows valid Spark SQL
  private val Target = """(gvt\s*\.\s*`[^`]+`|`[^`]+`|[\w.]+)"""
  private val OptimizeRe =
    ("""(?is)^OPTIMIZE\s+""" + Target +
      """(?:\s+ZORDER\s+BY\s*\(?\s*([`\w,\s]+?)\s*\)?)?\s*$""").r
  private val VacuumRe =
    ("""(?is)^VACUUM\s+""" + Target +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS?)?\s*$""").r
  private val HistoryRe =
    ("""(?is)^DESC(?:RIBE)?\s+HISTORY\s+""" + Target + """\s*$""").r
  private val RestoreRe =
    ("""(?is)^RESTORE\s+(?:TABLE\s+)?""" + Target +
      """\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*$""").r
  private val AddConstraintRe =
    ("""(?is)^ALTER\s+TABLE\s+""" + Target +
      """\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*$""").r
  private val DropConstraintRe =
    ("""(?is)^ALTER\s+TABLE\s+""" + Target +
      """\s+DROP\s+CONSTRAINT\s+(\w+)\s*$""").r

  private val PathForm = """(?is)^gvt\s*\.\s*`([^`]+)`$""".r

  /** Does a statement target resolve to a gvt relation? Used to avoid
    * claiming statements that are also valid Spark SQL. */
  private[plans] def isGvtTarget(spark: SparkSession, target: String): Boolean =
    target.trim match {
      case PathForm(_) => true
      case ident =>
        val name = ident.stripPrefix("`").stripSuffix("`")
        try GvtDml.gvtRootOf(spark.table(name).queryExecution.analyzed).isDefined
        catch { case scala.util.control.NonFatal(_) => false }
    }

  /** Resolve a statement target to its gvt table root: the
    * `` gvt.`path` `` form directly, otherwise the analyzed plan of the
    * named view/table must be a gvt relation. */
  private[plans] def rootOf(spark: SparkSession, target: String): String =
    target.trim match {
      case PathForm(p) => p
      case ident =>
        val name = ident.stripPrefix("`").stripSuffix("`")
        val plan = spark.table(name).queryExecution.analyzed
        GvtDml.gvtRootOf(plan).getOrElse(throw new IllegalArgumentException(
          s"$name is not a gvt table/view — OPTIMIZE/VACUUM/DESCRIBE " +
            "HISTORY apply to gvt relations only"))._1
    }
}

/** `OPTIMIZE t [ZORDER BY (…)]` → chain fold when eligible, else the
  * full compaction rewrite. Returns the resulting live version. */
case class GvtOptimizeCommand(target: String, zorderBy: Seq[String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("new_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GvtSqlParser.rootOf(spark, target)
    val v = VersionedTable.latestVersion(root).getOrElse(
      throw new IllegalArgumentException(s"no versions at $root"))
    val chainFoldable = zorderBy.isEmpty &&
      VersionedTable.chainDvDirs(root, v).isEmpty &&
      VersionedTable.dataDirsOf(root, v).size > 2 &&
      VersionedTable.dataDirsOf(root, v).forall(_.startsWith(s"$root/"))
    val nv =
      if (chainFoldable) VersionedTable.compactChain(spark, root)
      else VersionedTable.compact(spark, root, zorderBy = zorderBy)
    Seq(Row(nv))
  }
}

/** `VACUUM t [RETAIN n HOURS]` → retention with the Delta window
  * contract; returns the dropped versions, ascending. */
case class GvtVacuumCommand(target: String, retainMs: Option[Long])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("dropped_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GvtSqlParser.rootOf(spark, target)
    VersionedTable.vacuum(root, keep = 1,
      retainMinMs = retainMs.getOrElse(24L * 3600 * 1000))
      .map(Row(_))
  }
}

/** `RESTORE [TABLE] t [TO] VERSION AS OF n` → re-commit snapshot n's
  * content as a NEW version on top (history preserved, concurrent
  * writers conflict instead of being rolled back — Delta RESTORE). */
case class GvtRestoreCommand(target: String, version: Long)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("new_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GvtSqlParser.rootOf(spark, target)
    Seq(Row(VersionedTable.restore(spark, root, version)))
  }
}

/** `ALTER TABLE t ADD CONSTRAINT n CHECK (expr)` → register a table
  * CHECK constraint: the LIVE snapshot must already satisfy it, and
  * every future write path validates (Delta's surface + contract). */
case class GvtAddConstraintCommand(target: String, name: String,
                                   exprSql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    VersionedTable.addCheckConstraint(spark,
      GvtSqlParser.rootOf(spark, target), name, exprSql)
    Seq.empty
  }
}

/** `ALTER TABLE t DROP CONSTRAINT n`. */
case class GvtDropConstraintCommand(target: String, name: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    VersionedTable.dropCheckConstraint(
      GvtSqlParser.rootOf(spark, target), name)
    Seq.empty
  }
}

/** `DESCRIBE HISTORY t` → the commit chain, newest first. */
case class GvtHistoryCommand(target: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("commit_ts_millis", LongType, nullable = true)(),
    AttributeReference("operation", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = GvtSqlParser.rootOf(spark, target)
    VersionedTable.history(spark, root).collect().toSeq
  }
}

/** The `table_changes` table-valued function (Delta's CDF SQL surface):
  *
  *   SELECT * FROM table_changes('<view-or-path>', fromV, toV, '<keys>')
  *
  * → [[VersionedTable.changes]] between the two committed versions:
  * every key classified insert / delete / update_preimage+postimage,
  * with the O(batch) no-join fast path when the range is pure appends.
  * The engine's CDF is storage-free (the retained snapshots ARE the
  * log), so unlike Delta the key columns must be named — the 4th
  * argument, comma-separated. Injected by [[graft.GraftExtensions]]
  * via `injectTableFunction`. */
object GvtTableChanges {
  import org.apache.spark.sql.catalyst.expressions.Expression

  def builder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 4,
      "table_changes(table_or_path, fromVersion, toVersion, keysCsv) " +
        s"takes 4 arguments, got ${args.size}")
    def eval(e: Expression, what: String): Any = {
      require(e.foldable, s"table_changes: $what must be a literal")
      val v = e.eval(null)
      require(v != null, s"table_changes: $what must not be NULL")
      v
    }
    val spark = SparkSession.active
    val target = eval(args(0), "table").toString
    val fromV = eval(args(1), "fromVersion").toString.toLong
    val toV = eval(args(2), "toVersion").toString.toLong
    val keys = eval(args(3), "keys").toString
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    require(keys.nonEmpty, "table_changes: keys must name at least one column")
    val root =
      if (target.contains("/")) target
      else GvtSqlParser.rootOf(spark, target)
    VersionedTable.changes(spark, root, fromV, toV, keys)
      .queryExecution.logical
  }
}
