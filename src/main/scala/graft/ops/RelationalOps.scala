package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One composable function per operator row of SURVEY.md §2 — the
  * relational vocabulary the reference exercises, as idiomatic Spark.
  *
  * Scale discipline: every helper stays declarative (Catalyst plans it),
  * no driver-side actions, windows always carry an explicit deterministic
  * ORDER BY (the reference's `monotonically_increasing_id()` tie-break,
  * 02_silver_transform.py:50, is partition-layout-dependent and therefore
  * irreproducible — SURVEY.md §7 determinism rules).
  */
object RelationalOps {

  /** W1 dedup-keep-first: one row per key, deterministic tie-break —
    * reference 02_silver_transform.py:50-56 (orders) / :110-116
    * (order_products). Window shuffles once on the key; at scale prefer
    * running this right after ingest so downstream stages reuse the
    * hash-partitioning. */
  def dedupFirst(df: DataFrame, keys: Seq[String], tieBreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tieBreak: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** W2 purchase-sequence rank — reference 03_gold_metrics.py:298-305:
    * row_number per (user, product) ordered by order sequence. */
  def sequenceRank(df: DataFrame, partitionCols: Seq[String],
                   orderCols: Seq[Column], as: String = "purchase_seq"): DataFrame =
    df.withColumn(as,
      row_number().over(Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)))

  /** W3 lag with offset+default — reference 03_gold_metrics.py:303
    * (`lag(reordered, 1, 0)`). */
  def lagPrev(df: DataFrame, valueCol: Column, partitionCols: Seq[String],
              orderCols: Seq[Column], default: Any, as: String): DataFrame =
    df.withColumn(as,
      lag(valueCol, 1, default).over(Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)))

  /** W4 group-size over unordered window — reference quality.py:74-79
    * duplicate detection (`count(*) over (partition by key)`). */
  def groupSize(df: DataFrame, keys: Seq[String], as: String = "group_size"): DataFrame =
    df.withColumn(as, count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))

  /** P11 7-arm CASE: day-of-week int → name. The reference's Instacart
    * encoding has 0 = Saturday (02_silver_transform.py:73-79). */
  def dayNameInstacart(dow: Column): Column =
    when(dow === 0, "Saturday")
      .when(dow === 1, "Sunday")
      .when(dow === 2, "Monday")
      .when(dow === 3, "Tuesday")
      .when(dow === 4, "Wednesday")
      .when(dow === 5, "Thursday")
      .otherwise("Friday")

  /** P11 variant for a 0=Sunday..6=Saturday dow (DuckDB `dayofweek`
    * convention, used by the testdata-backed queries). */
  def dayNameSunday0(dow: Column): Column =
    when(dow === 0, "Sunday")
      .when(dow === 1, "Monday")
      .when(dow === 2, "Tuesday")
      .when(dow === 3, "Wednesday")
      .when(dow === 4, "Thursday")
      .when(dow === 5, "Friday")
      .otherwise("Saturday")

  /** P12 BETWEEN range bucketing: hour-of-day → daypart — reference
    * 02_silver_transform.py:80-83. Evening is 17-20 inclusive (hour 21 is
    * Night, matching the reference's `between(17, 20)`). */
  def hourBucket(hour: Column): Column =
    when(hour.between(5, 11), "Morning")
      .when(hour.between(12, 16), "Afternoon")
      .when(hour.between(17, 20), "Evening")
      .otherwise("Night")

  /** P14-P16 surrogate key: md5 over '_'-joined key parts — reference
    * 03_gold_metrics.py:85-88. */
  def surrogateKey(parts: Column*): Column =
    md5(concat_ws("_", parts.map(_.cast("string")): _*))

  /** P18 nullif divide-by-zero guard — reference 03_gold_metrics.py:118-121. */
  def safeDiv(num: Column, den: Column): Column = num / nullif(den, lit(0))

  /** P23 conditional share: fraction of rows satisfying `cond` —
    * reference 03_gold_metrics.py:256-261 (`avg(CASE WHEN … THEN 1 ELSE 0)`). */
  def share(cond: Column): Column = avg(when(cond, 1.0).otherwise(0.0))

  /** A8/J4 percent-of-grand-total without a driver action: 1-row total agg
    * cross-joined (broadcast NL join of one row) — the serverless form
    * (03_gold_metrics_serverless.py:271-302), preferred over the DF
    * notebook's driver-side `count()` + `lit` (03:242) because it keeps the
    * whole computation in one distributed plan. */
  def withPctOfTotal(df: DataFrame, valueCol: String, totalOver: DataFrame,
                     totalExpr: Column, as: String, scale: Int): DataFrame = {
    val totals = totalOver.agg(totalExpr.as("_grand_total"))
    df.crossJoin(broadcast(totals))
      .withColumn(as, rnd(col(valueCol) * 100.0 / col("_grand_total"), scale))
      .drop("_grand_total")
  }

  /** A8/J4 percent-of-grand-total derived FROM the aggregated frame itself:
    * an empty-partition window summing `valueCol` over all groups. Use when
    * the grand total is recoverable from the group aggregates (grand total
    * of row counts = Σ per-group counts) — then the expensive pre-agg
    * subtree (e.g. a multi-way star join) appears in the plan exactly ONCE,
    * vs. [[withPctOfTotal]] over the raw input which re-executes it.
    * The window shuffles the post-agg frame to a single partition — fine at
    * any data scale because group cardinality (departments, nations) is
    * small by construction; the 100 TB input was already reduced by the agg. */
  def withPctOfTotalFromAgg(df: DataFrame, valueCol: String, as: String, scale: Int): DataFrame = {
    val w = Window.partitionBy()
    df.withColumn(as,
      rnd(col(valueCol) * 100.0 / sum(col(valueCol)).over(w), scale))
  }

  /** O3 top-k: Catalyst plans sort+limit as TakeOrderedAndProject (no full
    * sort at scale). Always pass a total order for determinism. */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Per-group top-k via the custom GroupedTopK operator (bounded heaps,
    * partial pass before the shuffle — see graft.plans.GroupedTopK). The
    * window-function formulation (`row_number().over(...)  <= k`) is the
    * semantic reference; this plan shuffles at most k rows per key per
    * input partition instead of every row. */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame =
    org.apache.spark.sql.graft.GroupedTopKApi.groupedTopK(df, keys, order, k)

  /** Skew-safe two-stage aggregation: partial-aggregate on (keys ⊕ salt),
    * then final-aggregate on keys. A hot key's rows spread across
    * `saltBuckets` reducers in stage 1 instead of hammering one; stage 2
    * combines the per-salt partials (sums/counts re-aggregate losslessly).
    * The salt is derived from stable columns (hash mod buckets), NOT
    * rand(), so results stay deterministic. Use when a groupBy key is
    * skewed enough that AQE's skew handling (which only splits join
    * partitions) doesn't apply. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], saltFrom: Seq[Column],
                     saltBuckets: Int, sums: Map[String, Column]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(saltFrom: _*), lit(saltBuckets)))
    val partial = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_cnt"),
        sums.map { case (n, c) => sum(c).as(s"_sum_$n") }.toSeq: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("_cnt")).as("n_rows"),
        sums.keys.map(n => sum(col(s"_sum_$n")).as(n)).toSeq: _*)
  }

  /** MERGE/upsert semantics (Delta's `MERGE WHEN MATCHED THEN UPDATE WHEN
    * NOT MATCHED THEN INSERT` for the full-row case) on plain DataFrames:
    * rows from `updates` win on key collision; unmatched target rows pass
    * through; update-only keys become inserts. One anti-join + union — at
    * scale the anti-join broadcasts when `updates` is a small changeset
    * (the common incremental-refresh shape) and shuffles on the key
    * otherwise; either way the target is scanned exactly once. */
  def mergeUpsert(target: DataFrame, updates: DataFrame, keys: Seq[String],
                  allowMissingColumns: Boolean = false): DataFrame =
    updates.unionByName(
      target.join(updates.select(keys.map(col): _*), keys, "left_anti"),
      allowMissingColumns = allowMissingColumns)

  /** Clause-level MERGE (the full Delta `MERGE INTO` surface beyond
    * [[mergeUpsert]]'s whole-row upsert):
    *
    *   WHEN MATCHED [AND matchedDelete] THEN DELETE
    *   WHEN MATCHED THEN UPDATE SET matchedUpdate   (unlisted cols keep target values)
    *   WHEN NOT MATCHED THEN INSERT *               (iff insertNotMatched)
    *   WHEN NOT MATCHED BY SOURCE [AND nmsDelete] THEN DELETE
    *   WHEN NOT MATCHED BY SOURCE THEN UPDATE SET nmsUpdate
    *
    * NOT MATCHED BY SOURCE clauses act on target rows WITHOUT a source
    * match (Delta 2.3+): delete those satisfying `nmsDelete`, apply
    * `nmsUpdate` assignments (referencing `t.x` only — there is no
    * source row) to the remainder. A conditional NMS/matched UPDATE is
    * expressed by the caller wrapping each assignment in
    * `when(cond, e).otherwise(col("t.c"))`.
    *
    * Conditions and assignments are Column expressions over the packed
    * sides: `col("t.x")` = target value, `col("s.x")` = source value
    * (Delta's `target.x` / `source.x` qualification). Evaluation order
    * follows Delta: a matched row is deleted if the delete condition
    * holds, else updated. Plan: ONE key-partitioned full-outer join —
    * the target is scanned once, the changeset broadcasts when small.
    * Caller contract (as in Delta): `source` has at most one row per
    * key. A PARTIAL source — carrying only the keys plus the columns
    * the update assignments read — is fine (Delta supports update/
    * delete-only merges over partial sources): a target column absent
    * from the source inserts as NULL, exactly Delta's unlisted-column
    * INSERT semantics. Output columns = target columns. */
  /** One `WHEN NOT MATCHED [AND cond] THEN INSERT …` clause for
    * [[mergeClauses]]: `cond` is evaluated over the packed source
    * (`s.x` / key columns); `values` maps target columns to insert
    * expressions (an unlisted column inserts NULL — SQL's unlisted-
    * column semantics), or None for `INSERT *` (source columns carry,
    * absent ones insert NULL). Clauses evaluate FIRST-WINS per source
    * row; a row matching no clause is not inserted. */
  case class MergeInsert(cond: Option[Column],
                         values: Option[Map[String, Column]])

  def mergeClauses(target: DataFrame, source: DataFrame, keys: Seq[String],
                   matchedDelete: Option[Column] = None,
                   matchedUpdate: Map[String, Column] = Map.empty,
                   insertNotMatched: Boolean = true,
                   nmsDelete: Option[Column] = None,
                   nmsUpdate: Map[String, Column] = Map.empty,
                   insertClauses: Seq[MergeInsert] = Seq.empty): DataFrame = {
    val tCols = target.columns.filterNot(keys.contains).toSeq
    val sCols = source.columns.filterNot(keys.contains).toSeq
    val tp = target.select(keys.map(col) :+ struct(tCols.map(col): _*).as("t"): _*)
    val sp = source.select(keys.map(col) :+ struct(sCols.map(col): _*).as("s"): _*)
    val j = tp.join(sp, keys, "full_outer")
    val tOnly = col("s").isNull
    val sOnly = col("t").isNull
    val matched = col("t").isNotNull && col("s").isNotNull
    val deleteHit = matchedDelete
      .map(c => matched && coalesce(c, lit(false)))
      .getOrElse(lit(false))
    val nmsDeleteHit = nmsDelete
      .map(c => tOnly && coalesce(c, lit(false)))
      .getOrElse(lit(false))
    // normalized NOT MATCHED clause list: the legacy boolean is one
    // unconditional INSERT *
    val inserts: Seq[MergeInsert] =
      if (insertClauses.nonEmpty) insertClauses
      else if (insertNotMatched) Seq(MergeInsert(None, None))
      else Seq.empty
    val insertHit = inserts
      .map(_.cond.map(c => coalesce(c, lit(false))).getOrElse(lit(true)))
      .reduceOption(_ || _).getOrElse(lit(false))
    val kept = j.filter((tOnly && !nmsDeleteHit) ||
      (sOnly && insertHit) ||
      (matched && !deleteHit))
    val sHas = sCols.toSet
    // per-column first-wins insert value: nested whens in clause order
    // (a target column the partial source omits inserts as NULL — never
    // reference a non-existent s.<c>)
    def insertValue(c: String): Column = {
      val starVal: Column = if (sHas(c)) col(s"s.$c") else lit(null)
      inserts.foldRight(lit(null): Column) { (cl, els) =>
        val v = cl.values.map(_.getOrElse(c, lit(null))).getOrElse(starVal)
        cl.cond match {
          case Some(cc) => when(coalesce(cc, lit(false)), v).otherwise(els)
          case None => v // unconditional: consumes every remaining row
        }
      }
    }
    kept.select(keys.map(col) ++ tCols.map { c =>
      when(tOnly, nmsUpdate.getOrElse(c, col(s"t.$c")))
        .when(sOnly, insertValue(c))
        .otherwise(matchedUpdate.getOrElse(c, col(s"t.$c")))
        .as(c)
    }: _*)
  }

  /** P17 cross-engine-deterministic rounding: floor(x·10ⁿ + 0.5)/10ⁿ.
    * Spark's `round` (BigDecimal HALF_UP over the shortest decimal
    * representation) and DuckDB's `round` (binary nearbyint-style) disagree
    * on decimal ties like 1222.745. This formulation uses only IEEE-754
    * double ops (multiply, add, floor, divide) that both engines execute
    * identically, so results are bit-identical given bit-identical inputs.
    * The oracle SQL uses the same `floor(x*10^n + 0.5)/10^n` expression.
    * Decimal-looking ties follow the BINARY value (1222.745 is stored as
    * 1222.7449999... and rounds DOWN) — deterministic and engine-agreeing,
    * unlike decimal HALF_UP. Non-negative inputs assumed. */
  def rnd(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }
}
