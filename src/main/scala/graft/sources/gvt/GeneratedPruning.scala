package graft.sources.gvt

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, OneRowRelation, Project}
import org.apache.spark.sql.types._
import graft.sources.VersionedTable

/** Generated-column PARTITION pruning (Delta's
  * OptimizeGeneratedColumn analogue): a table partitioned by a
  * GENERATED column — `day DATE GENERATED ALWAYS AS (cast(ts AS date))
  * … PARTITIONED BY (day)` — is queried by the BASE column (`WHERE ts
  * >= X`), and without derivation every partition scans. Because the
  * registered expressions here are MONOTONE (cast to date, to_date,
  * date_trunc, trunc, year), a range bound on the base implies a bound
  * on the generated partition value: `ts >= X  ⟹  day >= cast(X AS
  * date)`. [[derive]] turns pushed data filters on the base column
  * into partition filters on the generated column, which the file
  * index then prunes with — planning-time, no data read.
  *
  * Soundness rules:
  *  - only expressions whose WHOLE chain is monotone non-decreasing
  *    derive anything; everything else derives nothing (never a wrong
  *    prune, only a missed one);
  *  - strict bounds weaken to inclusive on the generated side
  *    (`ts > X ⟹ day >= f(X)` — f collapses distinct inputs);
  *  - every derived predicate carries an `OR g IS NULL` escape: an
  *    expression may map a non-NULL base to NULL (e.g. a cast that
  *    fails), and those rows live in the null partition — it is never
  *    pruned. The residual filter on the scan still evaluates exactly,
  *    so pruning is result-invisible;
  *  - a TZ-DEPENDENT chain (timestamp↔date casts, date_trunc — their
  *    mapping follows the session timezone) derives only in a session
  *    whose timezone EQUALS the zone recorded at registration: values
  *    were stored under that zone (the write path refuses any other),
  *    so a reader in a different zone would compute a shifted bound
  *    and prune a directory holding matching rows. Legacy
  *    registrations without a recorded zone never derive tz-dependent
  *    bounds. */
private[graft] object GeneratedPruning {

  /** Derived partition-filter expressions for `dataFilters`, one per
    * (generated partition column × derivable conjunct). Attribute
    * references in the result are FRESH and bind by NAME inside
    * `PartitioningAwareFileIndex.prunePartitions` — the contract that
    * hook resolves partition columns with. */
  def derive(spark: SparkSession, root: String,
             fullSchema: StructType, partitionSchema: StructType,
             dataFilters: Seq[Expression]): Seq[Expression] = {
    if (dataFilters.isEmpty || partitionSchema.isEmpty) return Seq.empty
    val gens = VersionedTable.generatedColumns(root)
      .filter { case (n, _) => partitionSchema.fieldNames.contains(n) }
    if (gens.isEmpty) return Seq.empty
    val recordedTz = VersionedTable.generatedColumnTz(root)
    val sessionTz = spark.sessionState.conf.sessionLocalTimeZone
    gens.toSeq.sorted.flatMap { case (gName, exprSql) =>
      typedChain(spark, fullSchema, exprSql).toSeq.flatMap {
        case (chain, base) =>
          // tz-dependent chains derive only under the registered zone
          if (tzDependent(chain) && !recordedTz.get(gName).contains(sessionTz))
            Seq.empty
          else {
            val g = AttributeReference(gName,
              partitionSchema(partitionSchema.fieldIndex(gName)).dataType)()
            dataFilters.flatMap(f => deriveFilter(f, base, chain, g))
          }
      }
    }
  }

  /** Any node typed session-tz-sensitive TimestampType ⇒ the chain's
    * base→generated mapping shifts with the session timezone. */
  private def tzDependent(chain: Expression): Boolean =
    chain.exists(_.dataType == TimestampType)

  /** Is the registered chain timezone-dependent? Only chains
    * [[typedChain]] accepts can derive bounds, so everything else is
    * false (tz cannot make a prune wrong for them). Used by the WRITE
    * path's session-tz guard. */
  private[graft] def tzDependentChain(spark: SparkSession,
                                      schema: StructType,
                                      exprSql: String): Boolean =
    typedChain(spark, schema, exprSql).exists { case (chain, _) =>
      tzDependent(chain)
    }

  /** Resolve the registered SQL expression against the table schema and
    * verify the whole chain is a monotone wrap of exactly one column.
    * Returns (typed chain with RuntimeReplaceables unfolded, base). */
  private def typedChain(spark: SparkSession, schema: StructType,
                         exprSql: String): Option[(Expression, Attribute)] =
    try {
      val parsed = spark.sessionState.sqlParser.parseExpression(exprSql)
      val rel = LocalRelation(
        org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema))
      val analyzed = spark.sessionState.analyzer.execute(
        Project(Seq(Alias(parsed, "g")()), rel))
      val typed0 = analyzed.collectFirst {
        case Project(Seq(a: Alias), _) => a.child
      }.getOrElse(return None)
      val typed = typed0.transformUp {
        case r: RuntimeReplaceable => r.replacement
      }
      for {
        base <- baseOf(typed)
        // the base must be the ONLY column the chain touches (a second
        // column in e.g. a format argument breaks the implication)
        if typed.references.toSeq == Seq(base)
      } yield (typed, base)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The monotone-chain walk: each node must be order-preserving in its
    * single column-bearing child. */
  private def baseOf(e: Expression): Option[Attribute] = e match {
    case a: AttributeReference => Some(a)
    case c: Cast if monotoneCast(c.child.dataType, c.dataType) =>
      baseOf(c.child)
    // date_trunc(fmt, ts): floor to the unit start — monotone for every
    // supported fmt; the fmt side must be a literal
    case t: TruncTimestamp if t.left.foldable => baseOf(t.right)
    // trunc(date, fmt)
    case t: TruncDate if t.right.foldable => baseOf(t.left)
    case y: Year => baseOf(y.child)
    case r: RuntimeReplaceable => baseOf(r.replacement)
    case _ => None
  }

  /** Casts that preserve order for every input (temporal family; string
    * casts are NOT here — lexicographic order of unnormalized strings
    * does not follow parsed order). */
  private def monotoneCast(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (TimestampType, DateType) => true
      case (TimestampNTZType, DateType) => true
      case (DateType, TimestampType) => true
      case (DateType, TimestampNTZType) => true
      case (TimestampType, TimestampNTZType) => true
      case (TimestampNTZType, TimestampType) => true
      case _ => false
    }

  /** Evaluate the chain at a literal base value → the generated value
    * as a Literal (None when evaluation fails — derive nothing). */
  private def applyChain(chain: Expression, lit: Literal): Option[Literal] =
    try {
      val sub = chain.transformUp { case _: AttributeReference => lit }
      Some(Literal(sub.eval(null), chain.dataType))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def orNull(g: AttributeReference, pred: Expression): Expression =
    Or(pred, IsNull(g))

  /** One pushed conjunct → its derived partition predicate. */
  private def deriveFilter(f: Expression, base: Attribute,
                           chain: Expression,
                           g: AttributeReference): Option[Expression] = {
    def isBase(e: Expression): Boolean = e match {
      case a: AttributeReference =>
        a.name.equalsIgnoreCase(base.name) && a.dataType == base.dataType
      case _ => false
    }
    def at(l: Literal): Option[Literal] =
      if (l.value == null) None else applyChain(chain, l)
    f match {
      case And(l, r) =>
        (deriveFilter(l, base, chain, g), deriveFilter(r, base, chain, g)) match {
          case (Some(a), Some(b)) => Some(And(a, b))
          case (a, b) => a.orElse(b)
        }
      case Or(l, r) =>
        for {
          a <- deriveFilter(l, base, chain, g)
          b <- deriveFilter(r, base, chain, g)
        } yield Or(a, b)
      case EqualTo(b, l: Literal) if isBase(b) =>
        at(l).map(v => orNull(g, EqualNullSafe(g, v)))
      case EqualTo(l: Literal, b) if isBase(b) =>
        at(l).map(v => orNull(g, EqualNullSafe(g, v)))
      case GreaterThan(b, l: Literal) if isBase(b) =>
        at(l).map(v => orNull(g, GreaterThanOrEqual(g, v)))
      case GreaterThanOrEqual(b, l: Literal) if isBase(b) =>
        at(l).map(v => orNull(g, GreaterThanOrEqual(g, v)))
      case LessThan(b, l: Literal) if isBase(b) =>
        at(l).map(v => orNull(g, LessThanOrEqual(g, v)))
      case LessThanOrEqual(b, l: Literal) if isBase(b) =>
        at(l).map(v => orNull(g, LessThanOrEqual(g, v)))
      // literal-first comparisons mirror
      case GreaterThan(l: Literal, b) if isBase(b) =>
        at(l).map(v => orNull(g, LessThanOrEqual(g, v)))
      case GreaterThanOrEqual(l: Literal, b) if isBase(b) =>
        at(l).map(v => orNull(g, LessThanOrEqual(g, v)))
      case LessThan(l: Literal, b) if isBase(b) =>
        at(l).map(v => orNull(g, GreaterThanOrEqual(g, v)))
      case LessThanOrEqual(l: Literal, b) if isBase(b) =>
        at(l).map(v => orNull(g, GreaterThanOrEqual(g, v)))
      case In(b, vs) if isBase(b) && vs.forall(_.isInstanceOf[Literal]) =>
        val mapped = vs.map(v => at(v.asInstanceOf[Literal]))
        if (mapped.exists(_.isEmpty)) None
        else Some(orNull(g, In(g, mapped.flatten)))
      case _ => None
    }
  }
}
