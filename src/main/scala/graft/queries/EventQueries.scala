package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables.t
import graft.ops.RelationalOps.rnd

/** Time-series operators over the `events` table — the batch-verifiable
  * counterparts of the Structured Streaming jobs in graft.streaming
  * (tumbling-window aggregation, gap-based sessionization). Window starts
  * are emitted as strings so timestamp precision/unit differences between
  * engines can't affect the hash.
  */
object EventQueries {

  /** Schema-adaptive read of the `events` table: `ts` (and `props`)
    * normalization is the generalized dtype dispatch in
    * [[graft.sources.Tables.t]] — the r6 TIMESTAMP(NANOS) breakage is
    * documented there along with every other physical encoding the
    * normalization absorbs. */
  def events(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events") // dtype dispatch now centralized in Tables.t

  /** Gap-based sessionization: a new session starts after `gapSec` of
    * user inactivity. Classic lag → flag → running-sum session id. */
  def sessionize(events: DataFrame, gapSec: Long): DataFrame = {
    val order = Seq(col("ts"), col("event_id"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(order: _*)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (col("ts").cast("long") - col("prev_ts").cast("long")) > gapSec, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Hourly per-type rollup (integer cents) + its min..max hour spine —
    * shared by the zero-fill and forward-fill resampling queries. */
  private def hourlyAndSpine(ev: DataFrame): (DataFrame, DataFrame) = {
    val hourly = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("cents"))
    val spine = hourly.groupBy(col("event_type"))
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hr"))
    (hourly, spine)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling 1-hour window aggregation (batch form of the streaming job).
    "q_events_window" -> ((s, dir) =>
      events(s, dir)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          rnd(sum(col("value")), 2).as("total_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .orderBy(col("window_start"), col("event_type"))),

    // Sliding 1-hour window, 30-minute slide: each event lands in exactly
    // two windows (Spark's window() generator; the oracle enumerates the
    // same epoch-aligned starts explicitly).
    "q_events_sliding" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n_events"))
        .orderBy(col("window_start"), col("event_type"))),

    // As-of join (operator named in the build brief): for each event, the
    // latest order of the same user at-or-before the event time. Realized
    // Spark-first as union + last_value(ignore nulls) over a (key, time)
    // window — ONE shuffle on the key, no range-join row explosion; ties
    // on order date resolve to the max order key (tag sorts build rows
    // before probe rows at equal timestamps -> inclusive as-of).
    "q_asof_join" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val b = t(s, dir, "orders").select(
        col("o_custkey").as("k"), col("o_orderdate").as("t"),
        col("o_orderkey"), col("o_totalprice"),
        lit(0).as("tag"), lit(null).cast("long").as("event_id"),
        lit(null).cast("string").as("event_type"))
      val p = events(s, dir).select(
        col("user_id").as("k"), col("ts").as("t"),
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("double").as("o_totalprice"),
        lit(1).as("tag"), col("event_id"), col("event_type"))
      val w = Window.partitionBy(col("k"))
        .orderBy(col("t"), col("tag"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      b.unionByName(p)
        .withColumn("last_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
        .withColumn("last_price", last(col("o_totalprice"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("event_type"), col("k").as("user_id"),
          col("last_orderkey"), col("last_price"))
        .orderBy(col("event_id"))
    }),

    // Funnel (view → click → purchase): per user, the first view, the
    // first click STRICTLY AFTER it, and the first purchase strictly
    // after that click. Realized in ONE shuffle: running conditional
    // minima over the (user, time) window qualify each row, and the
    // per-user aggregate reuses the window's hash partitioning (no second
    // exchange). The naive form — one self-join per stage — re-scans and
    // re-shuffles events three times; this scans it once. At equal
    // timestamps (ts, event_id) ordering makes the running minima
    // deterministic, and strict > keeps same-instant stages un-counted
    // in both engines.
    "q_funnel" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val isV = col("event_type") === "view"
      val isC = col("event_type") === "click"
      val isP = col("event_type") === "purchase"
      events(s, dir)
        .withColumn("t1r", min(when(isV, col("ts"))).over(w))
        .withColumn("t2r", min(when(isC && col("ts") > col("t1r"), col("ts"))).over(w))
        .groupBy(col("user_id"))
        .agg(min(when(isV, col("ts"))).as("t1"),
          min(when(isC && col("ts") > col("t1r"), col("ts"))).as("t2"),
          min(when(isP && col("ts") > col("t2r"), col("ts"))).as("t3"))
        .select(col("user_id"),
          date_format(col("t1"), "yyyy-MM-dd HH:mm:ss").as("first_view"),
          date_format(col("t2"), "yyyy-MM-dd HH:mm:ss").as("first_click"),
          date_format(col("t3"), "yyyy-MM-dd HH:mm:ss").as("first_purchase"),
          when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
            .when(col("t1").isNotNull, 1).otherwise(0).as("stage"))
        .orderBy(col("user_id"))
    }),

    // Retention cohorts — the product-analytics staple over an event
    // stream: users grouped by their first-seen hour; for each cohort ×
    // hour offset, how many of its users were active that many hours
    // later. Two aggregates + one user_id-co-partitioned join — the
    // cohort table is one row per user and the activity table one row
    // per (user, hour), so at 100 TB the join never touches raw events
    // twice and nothing user-count-sized is broadcast.
    "q_retention" -> ((s, dir) => {
      val ev = events(s, dir)
      val firsts = ev.groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("cohort_hr"))
      val active = ev.select(col("user_id"),
        date_trunc("hour", col("ts")).as("act_hr")).distinct()
      firsts.join(active, Seq("user_id"))
        .withColumn("offset_hours",
          expr("(cast(act_hr as long) - cast(cohort_hr as long)) div 3600"))
        .filter(col("offset_hours") <= 6)
        .groupBy(
          date_format(col("cohort_hr"), "yyyy-MM-dd HH:mm:ss").as("cohort_hour"),
          col("offset_hours"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_hour"), col("offset_hours"))
    }),

    // Gap-based sessions (30 min), aggregated to session grain.
    // Semi-structured column handling: the JSON `props` payload parsed
    // both ways — schema-on-read struct (from_json, the scale path: one
    // parse per row into a typed column) and path extraction
    // (get_json_object); both must agree.
    "q_events_json" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val propsSchema = StructType(Seq(StructField("k", LongType)))
      events(s, dir)
        .select(col("event_type"),
          from_json(col("props"), propsSchema).getField("k").as("k"),
          get_json_object(col("props"), "$.k").cast("long").as("k2"))
        .filter(col("k") <=> col("k2")) // null-safe: '{}' rows agree on NULL
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // Spark 4's VARIANT type (the open semi-structured storage type):
    // props parses ONCE into a shredded binary variant, the typed path
    // extraction happens on the variant (no re-parse per field), and
    // the variant column itself crosses the groupBy shuffle — the
    // at-scale answer when the payload schema is open-ended (from_json
    // needs the schema up front; variant defers it to extraction).
    "q_variant" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_type"), parse_json(col("props")).as("v"))
        .withColumn("k", variant_get(col("v"), "$.k", "long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count(col("k")).as("n_with_k"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))),

    // The built-in session operator (Spark 3.2+): session_window merges
    // overlapping [ts, ts+gap) intervals per key inside one hash
    // aggregation — no window-function shuffle-sort pass like the
    // gaps-and-islands formulation below. Session end = last event + gap
    // (the operator's contract, vs max(ts) in q_events_sessionize).
    "q_events_session_window" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), rnd(sum(col("value")), 2).as("total_value"))
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("session_start"))),

    "q_events_sessionize" -> ((s, dir) =>
      sessionize(events(s, dir), 1800L)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          rnd(sum(col("value")), 2).as("total_value"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"))
        .orderBy(col("user_id"), col("session_id"))),

    // Calendar-spine gap filling — the resampling step before any
    // time-series model: hourly per-type rollups, with the ~5% of empty
    // hours restored by exploding each type's min..max hour range and
    // left-joining the facts back. Money sums use integer CENTS
    // (floor(v·100+0.5) per row, then a long sum) — exact and
    // associative where a double sum is order-sensitive across engines.
    // The spine is O(types × hours) — vanishingly small next to the
    // event scan, so the join back broadcasts; the only corpus-sized
    // exchange is the hourly rollup itself.
    "q_gap_fill" -> ((s, dir) => {
      val (hourly, spine) = hourlyAndSpine(events(s, dir))
      spine.join(hourly, Seq("event_type", "hr"), "left")
        .select(col("event_type"),
          date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("cents"), lit(0L)).as("cents"),
          col("n_events").isNull.as("is_gap"))
        .orderBy(col("event_type"), col("hr"))
    }),

    // Forward-fill over the calendar spine (last observation carried
    // forward — the other resampling convention): gaps inherit the most
    // recent observed hour's values via last_value(ignore nulls) over
    // the per-type time ordering, the same window trick as q_asof_join.
    // One (type, hr) ordering serves both fill columns.
    "q_gap_fill_ffill" -> ((s, dir) => {
      val (hourly, spine) = hourlyAndSpine(events(s, dir))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(hourly, Seq("event_type", "hr"), "left")
        .withColumn("is_gap", col("n_events").isNull)
        .withColumn("n_events_ffill",
          last(col("n_events"), ignoreNulls = true).over(w))
        .withColumn("cents_ffill",
          last(col("cents"), ignoreNulls = true).over(w))
        .select(col("event_type"),
          date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hr"),
          col("n_events_ffill"), col("cents_ffill"), col("is_gap"))
        .orderBy(col("event_type"), col("hr"))
    }),

    // RANGE-frame window (vs the ROWS frames elsewhere): trailing-24h
    // rolling count and spend per user, framed by the ORDER-BY VALUE —
    // same-instant peers aggregate together regardless of row order, so
    // the result is deterministic where a ROWS frame would depend on
    // tie order. Seconds come from an explicit floor (both engines), and
    // money is integer cents. One (user, sec) shuffle serves the frame.
    "q_window_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
        .rangeBetween(-86399L, 0L)
      events(s, dir)
        .withColumn("sec", col("ts").cast("long"))
        .withColumn("cents", floor(col("value") * 100 + lit(0.5)).cast("long"))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_24h"),
          sum(col("cents")).over(w).as("cents_24h"))
        .orderBy(col("event_id"))
    }),

    // Regex surface over semi-structured text: group extraction,
    // global masking, and predicate matching. Patterns stay in the
    // RE2-compatible subset (character classes, quantifiers, one
    // capture group) so Java regex and DuckDB/RE2 agree byte-for-byte.
    "q_regex" -> ((s, dir) =>
      events(s, dir).select(
        col("event_id"),
        regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
          .cast("long").as("k_extracted"),
        regexp_replace(col("props"), "[0-9]", "#").as("masked"),
        col("props").rlike("[0-9]{2,}").as("has_2digits"))
        .orderBy(col("event_id"))),

    // SCD Type-2 dimension build (Kimball): per user, the day's LAST
    // event type is the day's state ((ts, event_id) max_by — exact
    // tiebreak); consecutive same-state days compress into validity
    // intervals [valid_from, valid_to), open-ended ('9999-12-31') for
    // the current row. After the per-(user, day) aggregate, the lag /
    // row_number / lead windows all share ONE user_id partitioning —
    // the filter between them doesn't re-exchange.
    "q_scd2" -> ((s, dir) => {
      val byUserDay = events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(max_by(col("event_type"),
          struct(col("ts"), col("event_id"))).as("state"))
      val wU = Window.partitionBy(col("user_id")).orderBy(col("day"))
      byUserDay
        .withColumn("prev_state", lag(col("state"), 1).over(wU))
        .filter(col("prev_state").isNull || col("state") =!= col("prev_state"))
        .withColumn("version", row_number().over(wU).cast("long"))
        .withColumn("valid_to_d", lead(col("day"), 1).over(wU))
        .select(col("user_id"), col("version"), col("state"),
          date_format(col("day"), "yyyy-MM-dd").as("valid_from"),
          coalesce(date_format(col("valid_to_d"), "yyyy-MM-dd"),
            lit("9999-12-31")).as("valid_to"))
        .orderBy(col("user_id"), col("version"))
    }))

  val oracle: Map[String, String] = Map(

    "q_gap_fill" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(hr) AS h0, max(hr) AS h1
        |  FROM hourly GROUP BY 1),
        |spine AS (SELECT event_type,
        |    unnest(range(h0, h1 + INTERVAL 1 HOUR, INTERVAL 1 HOUR)) AS hr
        |  FROM bounds)
        |SELECT s.event_type, strftime(s.hr, '%Y-%m-%d %H:%M:%S') AS hr,
        |  coalesce(d.n_events, 0) AS n_events, coalesce(d.cents, 0) AS cents,
        |  d.hr IS NULL AS is_gap
        |FROM spine s LEFT JOIN hourly d
        |  ON s.event_type = d.event_type AND s.hr = d.hr
        |ORDER BY 1, 2""".stripMargin,

    "q_gap_fill_ffill" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(hr) AS h0, max(hr) AS h1
        |  FROM hourly GROUP BY 1),
        |spine AS (SELECT event_type,
        |    unnest(range(h0, h1 + INTERVAL 1 HOUR, INTERVAL 1 HOUR)) AS hr
        |  FROM bounds),
        |j AS (SELECT s.event_type, s.hr, d.n_events, d.cents,
        |    d.hr IS NULL AS is_gap
        |  FROM spine s LEFT JOIN hourly d
        |    ON s.event_type = d.event_type AND s.hr = d.hr)
        |SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hr,
        |  last_value(n_events IGNORE NULLS) OVER w AS n_events_ffill,
        |  last_value(cents IGNORE NULLS) OVER w AS cents_ffill,
        |  is_gap
        |FROM j
        |WINDOW w AS (PARTITION BY event_type ORDER BY hr
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY 1, 2""".stripMargin,

    "q_window_range" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    CAST(floor(value * 1e2 + 0.5) AS BIGINT) AS cents
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_24h,
        |  CAST(sum(cents) OVER w AS BIGINT) AS cents_24h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |  RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_regex" ->
      """SELECT event_id,
        |  CAST(nullif(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS BIGINT)
        |    AS k_extracted,
        |  regexp_replace(props, '[0-9]', '#', 'g') AS masked,
        |  regexp_matches(props, '[0-9]{2,}') AS has_2digits
        |FROM events ORDER BY event_id""".stripMargin,

    "q_scd2" ->
      """WITH r AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
        |    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |s AS (SELECT user_id, day, event_type AS state FROM r WHERE rn = 1),
        |c AS (SELECT user_id, day, state,
        |    lag(state) OVER (PARTITION BY user_id ORDER BY day) AS prev_state
        |  FROM s),
        |f AS (SELECT user_id, day, state FROM c
        |  WHERE prev_state IS NULL OR state <> prev_state),
        |v AS (SELECT user_id, day, state,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS BIGINT)
        |      AS version,
        |    lead(day) OVER (PARTITION BY user_id ORDER BY day) AS valid_to_d
        |  FROM f)
        |SELECT user_id, version, state, strftime(day, '%Y-%m-%d') AS valid_from,
        |  coalesce(strftime(valid_to_d, '%Y-%m-%d'), '9999-12-31') AS valid_to
        |FROM v ORDER BY user_id, version""".stripMargin,

    "q_events_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS n_events,
        |  floor(sum(value) * 1e2 + 0.5) / 1e2 AS total_value,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "q_events_sliding" ->
      """WITH w AS (
        |  SELECT event_type,
        |    unnest([CAST(floor(epoch(ts)/1800) AS BIGINT)*1800 - 1800,
        |            CAST(floor(epoch(ts)/1800) AS BIGINT)*1800]) AS wstart
        |  FROM events)
        |SELECT strftime(make_timestamp(wstart*1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS n_events
        |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "q_asof_join" ->
      """WITH u AS (
        |  SELECT o_custkey AS k, o_orderdate AS t, o_orderkey, o_totalprice,
        |    0 AS tag, NULL::BIGINT AS event_id, NULL::VARCHAR AS event_type
        |  FROM orders
        |  UNION ALL
        |  SELECT user_id, ts, NULL, NULL, 1, event_id, event_type FROM events),
        |w AS (
        |  SELECT *,
        |    last_value(o_orderkey IGNORE NULLS) OVER win AS last_orderkey,
        |    last_value(o_totalprice IGNORE NULLS) OVER win AS last_price
        |  FROM u
        |  WINDOW win AS (PARTITION BY k ORDER BY t, tag, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type, k AS user_id, last_orderkey, last_price
        |FROM w WHERE tag = 1 ORDER BY event_id""".stripMargin,

    "q_retention" ->
      """WITH f AS (SELECT user_id, date_trunc('hour', min(ts)) AS cohort_hr
        |           FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS act_hr FROM events),
        |j AS (SELECT f.user_id, f.cohort_hr,
        |        CAST((CAST(epoch(a.act_hr) AS BIGINT)
        |              - CAST(epoch(f.cohort_hr) AS BIGINT)) // 3600 AS BIGINT)
        |          AS offset_hours
        |      FROM f JOIN a USING (user_id))
        |SELECT strftime(cohort_hr, '%Y-%m-%d %H:%M:%S') AS cohort_hour,
        |       offset_hours, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        |FROM j WHERE offset_hours <= 6
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // staged-join form: first-stage minima feed the next stage's strict
    // time predicate — semantically the window formulation above
    "q_funnel" ->
      """WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN t1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN t2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT u.user_id,
        |  strftime(t1.t1, '%Y-%m-%d %H:%M:%S') AS first_view,
        |  strftime(t2.t2, '%Y-%m-%d %H:%M:%S') AS first_click,
        |  strftime(t3.t3, '%Y-%m-%d %H:%M:%S') AS first_purchase,
        |  CASE WHEN t3.t3 IS NOT NULL THEN 3 WHEN t2.t2 IS NOT NULL THEN 2
        |       WHEN t1.t1 IS NOT NULL THEN 1 ELSE 0 END AS stage
        |FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
        |  LEFT JOIN t3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q_variant" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS n_with_k,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_events_json" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(props->>'k' AS BIGINT)) AS min_k,
        |  max(CAST(props->>'k' AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // session_window semantics: a session breaks when ts >= prev + gap
    // (timestamp-interval comparison, exact at this data's granularity);
    // session_end = last event + gap.
    "q_events_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts >= lag(ts) OVER w + INTERVAL '30 minutes'
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events,
        |  floor(sum(value) * 1e2 + 0.5) / 1e2 AS total_value
        |FROM sessions GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "q_events_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR CAST(floor(epoch(ts)) AS BIGINT) -
        |         CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  floor(sum(value) * 1e2 + 0.5) / 1e2 AS total_value,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM sessions GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin)
}
