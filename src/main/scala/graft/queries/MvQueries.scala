package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{MaterializedView, VersionedTable}
import graft.sources.MaterializedView.AggSpec

/** Materialized-view registry queries: the automatic rewrite
  * ([[graft.plans.MvRewrite]]) answering a rollup from the MV table,
  * and change-feed-driven incremental maintenance across append+DML
  * commits. Each query REQUIRES the MV path actually served the scan
  * (inputFiles probe) — a silent fall-back to the base would still
  * produce correct rows, and this row exists to pin the mechanism, not
  * just the values. The DuckDB oracle reproduces the fixture
  * arithmetic from the raw `orders` table.
  */
object MvQueries {

  private def tmpDir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(d.toFile)
    }))
    d.toString
  }

  private def baseRows(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.t(s, dir, "orders").select(
      col("o_orderkey").as("k"),
      col("o_orderstatus").as("status"),
      col("o_orderpriority").as("prio"),
      floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))

  private def requireMv(df: DataFrame, mvRoot: String): DataFrame = {
    // inputFiles plans the query — the rewrite either fired here or the
    // row is a loud failure, never a silent base-scan pass. Matched on
    // a path BOUNDARY: a bare basename `contains` would also match the
    // fixture tmp dir that prefixes the base path, passing vacuously on
    // a base scan.
    val root = new java.io.File(mvRoot).getCanonicalPath
    require(df.inputFiles.exists { f =>
      val p = try new java.net.URI(f).getPath catch { case _: Exception => f }
      p != null && (p == root || p.startsWith(root + "/"))
    }, s"MV rewrite did not fire — query scanned the base instead of $mvRoot")
    // deregister the throwaway fixture view: bench repeats each query
    // in one long-lived session, and the exact-match candidate list is
    // scanned per planned query — it must not accrete. (A later
    // re-plan of `df` falls back to the base scan: same rows.)
    MaterializedView.drop(mvRoot)
    df
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The warehouse flagship: a (status, prio) MV answers a
    // prio-filtered status rollup — sum of sums, coalesced sum of
    // counts, avg as total/​count — without touching the base. The
    // require pins that the scan really is MV-sized.
    "q_mv_rewrite" -> ((s, dir) => {
      val out = tmpDir("graft_mv")
      val base = s"$out/base"; val mv = s"$out/mv"
      VersionedTable.write(baseRows(s, dir), base)
      MaterializedView.create(s, base, mv, Seq("status", "prio"),
        Seq(AggSpec("sum", "cents", "sum_cents"),
          AggSpec("count", "*", "n_orders")))
      graft.GraftSession.withExtensions(s) { sess =>
        val q = sess.read.format("gvt").load(base)
          .filter(col("prio") =!= "4-NOT SPECIFIED")
          .groupBy(col("status"))
          .agg(sum(col("cents")).as("sum_cents"),
            count(lit(1)).as("n_orders"),
            (sum(col("cents")).cast("double") / count(lit(1))).as("avg_cents"))
          .orderBy(col("status"))
        requireMv(q, mv)
      }
    }),

    // Incremental maintenance: a DELETE_DV hop (reconstructed from the
    // commit's own artifacts) plus an append hop fold into the MV at
    // O(changed) — no base re-aggregation — and the refreshed MV serves
    // the rollup. History must show MV_REFRESH, never MV_REBUILD.
    "q_mv_incremental" -> ((s, dir) => {
      val out = tmpDir("graft_mvi")
      val base = s"$out/base"; val mv = s"$out/mv"
      VersionedTable.write(baseRows(s, dir), base)
      MaterializedView.create(s, base, mv, Seq("status"),
        Seq(AggSpec("sum", "cents", "sum_cents"),
          AggSpec("count", "*", "n_orders")))
      VersionedTable.deleteWhereVector(s, base, col("k") % 97 === 0)
      VersionedTable.append(
        baseRows(s, dir).filter(col("k") % 10 === 0)
          .select((col("k") + 1000000).as("k"), lit("X").as("status"),
            col("prio"), (col("cents") + 7).as("cents")), base)
      MaterializedView.refresh(s, mv)
      val ops = VersionedTable.history(s, mv)
        .select("operation").collect().map(_.getString(0)).toSet
      require(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"),
        s"refresh was not incremental: $ops")
      graft.GraftSession.withExtensions(s) { sess =>
        val q = sess.read.format("gvt").load(base)
          .groupBy(col("status"))
          .agg(sum(col("cents")).as("sum_cents"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("status"))
        requireMv(q, mv)
      }
    }),

    // The SQL lifecycle: CREATE MATERIALIZED VIEW extracts the spec
    // from the defining query, a DML + append go stale, REFRESH
    // restores service, and the rollup reads MV-sized.
    "q_sql_mv" -> ((s, dir) => {
      val out = tmpDir("graft_mvsql")
      val base = s"$out/base"; val mv = s"$out/mv"
      VersionedTable.write(baseRows(s, dir), base)
      graft.GraftSession.withExtensions(s) { sess =>
        sess.read.format("gvt").load(base)
          .createOrReplaceTempView("mvsql_t")
        sess.sql(s"CREATE MATERIALIZED VIEW gvt.`$mv` AS " +
          "SELECT status, prio, sum(cents) AS sum_cents, count(*) AS n " +
          "FROM mvsql_t GROUP BY status, prio").collect()
        sess.sql("DELETE FROM mvsql_t WHERE k % 97 = 0").collect()
        sess.sql(s"REFRESH MATERIALIZED VIEW gvt.`$mv`").collect()
        val q = sess.read.format("gvt").load(base)
          .filter(col("prio") =!= "4-NOT SPECIFIED")
          .groupBy(col("status"))
          .agg(sum(col("cents")).as("sum_cents"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("status"))
        requireMv(q, mv)
      }
    }),

    // EXACT-tier view over a JOIN — the shape the aggregate algebra
    // cannot serve. Whole-subtree sameResult matching with structural
    // freshness: the post-delete refresh re-pins the new base version,
    // and the rollup query (same plan, different aliases) reads
    // MV-sized.
    "q_mv_exact_join" -> ((s, dir) => {
      val out = tmpDir("graft_mvx")
      val ord = s"$out/ord"; val cust = s"$out/cust"; val mv = s"$out/mv"
      VersionedTable.write(
        graft.sources.Tables.t(s, dir, "orders").select(
          col("o_orderkey").as("k"), col("o_custkey").as("ck_o"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
            .as("cents")), ord)
      VersionedTable.write(
        graft.sources.Tables.t(s, dir, "customer").select(
          col("c_custkey").as("ck"), col("c_mktsegment").as("segment")), cust)
      graft.GraftSession.withExtensions(s) { sess =>
        sess.read.format("gvt").load(cust)
          .createOrReplaceTempView("mvx_cust")
        sess.read.format("gvt").load(ord)
          .createOrReplaceTempView("mvx_ord2")
        sess.sql(s"CREATE MATERIALIZED VIEW gvt.`$mv` AS " +
          "SELECT segment, sum(cents) AS sum_cents, count(*) AS n " +
          "FROM mvx_ord2 JOIN mvx_cust ON ck_o = ck GROUP BY segment")
          .collect()
        sess.sql("DELETE FROM mvx_ord2 WHERE k % 97 = 0").collect()
        sess.read.format("gvt").load(ord)
          .createOrReplaceTempView("mvx_ord2")
        sess.sql(s"REFRESH MATERIALIZED VIEW gvt.`$mv`").collect()
        val q = sess.sql(
          "SELECT segment, sum(cents) AS sum_cents, count(*) AS n_orders " +
            "FROM mvx_ord2 JOIN mvx_cust ON ck_o = ck GROUP BY segment " +
            "ORDER BY segment")
        requireMv(q, mv)
      }
    }),

    // DIFFERENTIAL join-view maintenance: append-only deltas on BOTH
    // sides fold as agg(ΔA⋈B_new ∪ A_old⋈ΔB) — A_old⋈B_old, the
    // 100 TB-dominant term, is never recomputed. History must show
    // MV_REFRESH (the fold), never MV_REBUILD.
    "q_mv_diff_join" -> ((s, dir) => {
      val out = tmpDir("graft_mvd")
      val ord = s"$out/ord"; val cust = s"$out/cust"; val mv = s"$out/mv"
      VersionedTable.write(
        graft.sources.Tables.t(s, dir, "orders").select(
          col("o_orderkey").as("k"), col("o_custkey").as("ck_o"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
            .as("cents")), ord)
      VersionedTable.write(
        graft.sources.Tables.t(s, dir, "customer").select(
          col("c_custkey").as("ck"), col("c_mktsegment").as("segment")), cust)
      graft.GraftSession.withExtensions(s) { sess =>
        sess.read.format("gvt").load(cust)
          .createOrReplaceTempView("mvd_cust")
        sess.read.format("gvt").load(ord)
          .createOrReplaceTempView("mvd_ord")
        sess.sql(s"CREATE MATERIALIZED VIEW gvt.`$mv` AS " +
          "SELECT segment, sum(cents) AS sum_cents, count(*) AS n_orders " +
          "FROM mvd_ord JOIN mvd_cust ON ck_o = ck GROUP BY segment")
          .collect()
        // append-only deltas on both sides (reproducible arithmetic):
        // repriced echo orders for every k%10 customer order, plus a
        // synthetic segment with its own orders
        VersionedTable.append(
          graft.sources.Tables.t(s, dir, "orders")
            .filter(col("o_orderkey") % 10 === 0)
            .select((col("o_orderkey") + 2000000).as("k"),
              col("o_custkey").as("ck_o"),
              (floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
                + 13).as("cents")), ord)
        VersionedTable.append(sess.range(1).select(
          lit(3000000L).as("ck"), lit("SEG_X").as("segment")), cust)
        VersionedTable.append(sess.range(5).select(
          (col("id") + 2100000).as("k"), lit(3000000L).as("ck_o"),
          (col("id") * 10 + 1).as("cents")), ord)
        sess.sql(s"REFRESH MATERIALIZED VIEW gvt.`$mv`").collect()
        val ops = VersionedTable.history(sess, mv)
          .select("operation").collect().map(_.getString(0)).toSet
        require(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"),
          s"join refresh was not differential: $ops")
        sess.read.format("gvt").load(ord)
          .createOrReplaceTempView("mvd_ord")
        sess.read.format("gvt").load(cust)
          .createOrReplaceTempView("mvd_cust")
        val q = sess.sql(
          "SELECT segment, sum(cents) AS sum_cents, count(*) AS n_orders " +
            "FROM mvd_ord JOIN mvd_cust ON ck_o = ck GROUP BY segment " +
            "ORDER BY segment")
        requireMv(q, mv)
      }
    }),

    // Algebraic ROLLUP over a differential join view: GROUP BY segment
    // (a SUBSET of the view's (segment, status) groups) re-aggregates
    // the MV — sum of sums, summed counts, avg from the sum + its
    // non-null counter — without recomputing the join, and the WHERE
    // on the other group column rides as a COMPENSATION predicate on
    // the MV rows (the optimizer pushes it below the join, where
    // whole-subtree matching alone could never serve it). The exact
    // tier serves only the identical shape; this row pins the rollup
    // tier.
    "q_mv_join_rollup" -> ((s, dir) => {
      val out = tmpDir("graft_mvru")
      val ord = s"$out/ord"; val cust = s"$out/cust"; val mv = s"$out/mv"
      VersionedTable.write(
        graft.sources.Tables.t(s, dir, "orders").select(
          col("o_orderkey").as("k"), col("o_custkey").as("ck_o"),
          col("o_orderstatus").as("status"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
            .as("cents")), ord)
      VersionedTable.write(
        graft.sources.Tables.t(s, dir, "customer").select(
          col("c_custkey").as("ck"), col("c_mktsegment").as("segment")), cust)
      graft.GraftSession.withExtensions(s) { sess =>
        sess.read.format("gvt").load(cust)
          .createOrReplaceTempView("mvru_cust")
        sess.read.format("gvt").load(ord)
          .createOrReplaceTempView("mvru_ord")
        sess.sql(s"CREATE MATERIALIZED VIEW gvt.`$mv` AS " +
          "SELECT segment, status, sum(cents) AS sum_cents, count(*) AS n " +
          "FROM mvru_ord JOIN mvru_cust ON ck_o = ck " +
          "GROUP BY segment, status").collect()
        val q = sess.sql(
          "SELECT segment, sum(cents) AS sum_cents, count(*) AS n_orders, " +
            "CAST(sum(cents) AS DOUBLE) / count(*) AS avg_cents " +
            "FROM mvru_ord JOIN mvru_cust ON ck_o = ck " +
            "WHERE status IN ('O', 'P') " +
            "GROUP BY segment ORDER BY segment")
        requireMv(q, mv)
      }
    }),

    // Counting-IVM RETRACTIONS through a join view: a DELETE plus an
    // append on the fact fold as the SIGNED telescoping delta
    // (P − N: Δ⁺⋈dim minus Δ⁻⋈dim) — A_old⋈B_old never recomputes and
    // the fact is never rescanned. History must show MV_REFRESH (the
    // fold), never MV_REBUILD.
    "q_mv_diff_retract" -> ((s, dir) => {
      val out = tmpDir("graft_mvr")
      val ord = s"$out/ord"; val cust = s"$out/cust"; val mv = s"$out/mv"
      VersionedTable.write(
        graft.sources.Tables.t(s, dir, "orders").select(
          col("o_orderkey").as("k"), col("o_custkey").as("ck_o"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
            .as("cents")), ord)
      VersionedTable.setTblProperties(ord,
        Map("gvt.enableChangeDataFeed" -> "true"))
      VersionedTable.write(
        graft.sources.Tables.t(s, dir, "customer").select(
          col("c_custkey").as("ck"), col("c_mktsegment").as("segment")), cust)
      graft.GraftSession.withExtensions(s) { sess =>
        sess.read.format("gvt").load(cust)
          .createOrReplaceTempView("mvr_cust")
        sess.read.format("gvt").load(ord)
          .createOrReplaceTempView("mvr_ord")
        sess.sql(s"CREATE MATERIALIZED VIEW gvt.`$mv` AS " +
          "SELECT segment, sum(cents) AS sum_cents, count(*) AS n_orders " +
          "FROM mvr_ord JOIN mvr_cust ON ck_o = ck GROUP BY segment")
          .collect()
        // the retraction: every 7th order leaves; a repriced echo of
        // every 13th arrives in the same range
        VersionedTable.deleteWhereVector(sess, ord, col("k") % 7 === 0)
        VersionedTable.append(
          graft.sources.Tables.t(sess, dir, "orders")
            .filter(col("o_orderkey") % 13 === 0)
            .select((col("o_orderkey") + 4000000).as("k"),
              col("o_custkey").as("ck_o"),
              (floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
                + 5).as("cents")), ord)
        sess.sql(s"REFRESH MATERIALIZED VIEW gvt.`$mv`").collect()
        val ops = VersionedTable.history(sess, mv)
          .select("operation").collect().map(_.getString(0)).toSet
        require(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"),
          s"retraction refresh was not differential: $ops")
        sess.read.format("gvt").load(ord)
          .createOrReplaceTempView("mvr_ord")
        val q = sess.sql(
          "SELECT segment, sum(cents) AS sum_cents, count(*) AS n_orders " +
            "FROM mvr_ord JOIN mvr_cust ON ck_o = ck GROUP BY segment " +
            "ORDER BY segment")
        requireMv(q, mv)
      }
    }),

    // Min/max retraction via AFFECTED-GROUP recompute: a DELETE
    // confined to one status group plus an append into another fold
    // into a min/max join view as MV_REFRESH — the extremes are
    // re-aggregated ONLY for the retraction's key groups (the IN
    // prefilter pushes to the fact scan; untouched groups fold the
    // insert remainder), never the whole-view rebuild a retraction
    // used to force.
    "q_mv_diff_retract_minmax" -> ((s, dir) => {
      val out = tmpDir("graft_mvrm")
      val ord = s"$out/ord"; val cust = s"$out/cust"; val mv = s"$out/mv"
      VersionedTable.write(
        graft.sources.Tables.t(s, dir, "orders").select(
          col("o_orderkey").as("k"), col("o_custkey").as("ck_o"),
          col("o_orderstatus").as("status"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
            .as("cents")), ord)
      VersionedTable.setTblProperties(ord,
        Map("gvt.enableChangeDataFeed" -> "true"))
      VersionedTable.write(
        graft.sources.Tables.t(s, dir, "customer").select(
          col("c_custkey").as("ck"), col("c_mktsegment").as("segment")), cust)
      graft.GraftSession.withExtensions(s) { sess =>
        sess.read.format("gvt").load(cust)
          .createOrReplaceTempView("mvrm_cust")
        sess.read.format("gvt").load(ord)
          .createOrReplaceTempView("mvrm_ord")
        sess.sql(s"CREATE MATERIALIZED VIEW gvt.`$mv` AS " +
          "SELECT status, min(cents) AS min_cents, " +
          "max(cents) AS max_cents, count(*) AS n_orders " +
          "FROM mvrm_ord JOIN mvrm_cust ON ck_o = ck GROUP BY status")
          .collect()
        // retraction confined to status F; appended echoes land in O
        VersionedTable.deleteWhereVector(sess, ord,
          col("status") === "F" && col("k") % 7 === 0)
        VersionedTable.append(
          graft.sources.Tables.t(sess, dir, "orders")
            .filter(col("o_orderkey") % 13 === 0)
            .select((col("o_orderkey") + 4000000).as("k"),
              col("o_custkey").as("ck_o"), lit("O").as("status"),
              (floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
                + 11).as("cents")), ord)
        sess.sql(s"REFRESH MATERIALIZED VIEW gvt.`$mv`").collect()
        val ops = VersionedTable.history(sess, mv)
          .select("operation").collect().map(_.getString(0)).toSet
        require(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"),
          s"min/max retraction refresh was not affected-group-bound: $ops")
        sess.read.format("gvt").load(ord)
          .createOrReplaceTempView("mvrm_ord")
        val q = sess.sql(
          "SELECT status, min(cents) AS min_cents, " +
            "max(cents) AS max_cents, count(*) AS n_orders " +
            "FROM mvrm_ord JOIN mvrm_cust ON ck_o = ck GROUP BY status " +
            "ORDER BY status")
        requireMv(q, mv)
      }
    }),

    // COUNT(DISTINCT) through a JOIN view: the differential tier now
    // maintains the multiplicity side table with the signed
    // telescoping delta — a DELETE that can remove values from groups
    // and an append carrying a brand-new priority both fold as
    // MV_REFRESH (never a rebuild), and the whole-shape rewrite serves
    // the refreshed view.
    "q_mv_distinct_join" -> ((s, dir) => {
      val out = tmpDir("graft_mvdj")
      val ord = s"$out/ord"; val cust = s"$out/cust"; val mv = s"$out/mv"
      VersionedTable.write(
        graft.sources.Tables.t(s, dir, "orders").select(
          col("o_orderkey").as("k"), col("o_custkey").as("ck_o"),
          col("o_orderpriority").as("prio"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
            .as("cents")), ord)
      VersionedTable.setTblProperties(ord,
        Map("gvt.enableChangeDataFeed" -> "true"))
      VersionedTable.write(
        graft.sources.Tables.t(s, dir, "customer").select(
          col("c_custkey").as("ck"), col("c_mktsegment").as("segment")), cust)
      graft.GraftSession.withExtensions(s) { sess =>
        sess.read.format("gvt").load(cust)
          .createOrReplaceTempView("mvdj_cust")
        sess.read.format("gvt").load(ord)
          .createOrReplaceTempView("mvdj_ord")
        val defSql =
          "SELECT segment, count(DISTINCT prio) AS u_prio, " +
            "sum(cents) AS sum_cents, count(*) AS n_orders " +
            "FROM mvdj_ord JOIN mvdj_cust ON ck_o = ck GROUP BY segment"
        sess.sql(s"CREATE MATERIALIZED VIEW gvt.`$mv` AS $defSql")
          .collect()
        // delete every 1-URGENT order (the priority can vanish from
        // segments) and append echoes carrying a NEW priority
        VersionedTable.deleteWhereVector(sess, ord,
          col("prio") === "1-URGENT")
        VersionedTable.append(
          graft.sources.Tables.t(sess, dir, "orders")
            .filter(col("o_orderkey") % 19 === 0)
            .select((col("o_orderkey") + 6000000).as("k"),
              col("o_custkey").as("ck_o"), lit("9-NEW").as("prio"),
              floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
                .as("cents")), ord)
        sess.sql(s"REFRESH MATERIALIZED VIEW gvt.`$mv`").collect()
        val ops = VersionedTable.history(sess, mv)
          .select("operation").collect().map(_.getString(0)).toSet
        require(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"),
          s"distinct join-view refresh was not differential: $ops")
        sess.read.format("gvt").load(ord)
          .createOrReplaceTempView("mvdj_ord")
        val q = sess.sql(defSql + " ORDER BY segment")
        requireMv(q, mv)
      }
    }),

    // COUNT(DISTINCT) through an MV: the per-(group, value)
    // multiplicity side table folds inserts AND deletes (counting
    // approach), the exact-grouping query answers from the MV column,
    // and a SUBSET rollup — where distinct counts can never
    // re-aggregate — answers from the side table alone (probed
    // in-fixture). History must show MV_REFRESH, never MV_REBUILD.
    "q_mv_distinct" -> ((s, dir) => {
      val out = tmpDir("graft_mvd")
      val base = s"$out/base"; val mv = s"$out/mv"
      VersionedTable.write(
        graft.sources.Tables.t(s, dir, "orders").select(
          col("o_orderkey").as("k"), col("o_custkey").as("ck"),
          col("o_orderstatus").as("status"),
          col("o_orderpriority").as("prio"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
            .as("cents")), base)
      MaterializedView.create(s, base, mv, Seq("status", "prio"),
        Seq(AggSpec("count_distinct", "ck", "u_cust"),
          AggSpec("sum", "cents", "sum_cents")))
      // deletes remove every 11th order; appends bring NEW custkeys
      // (shifted out of range) under one status — both classes must
      // fold through the multiplicity side table
      VersionedTable.deleteWhereVector(s, base, col("k") % 11 === 0)
      VersionedTable.append(
        graft.sources.Tables.t(s, dir, "orders")
          .filter(col("o_orderkey") % 17 === 0)
          .select((col("o_orderkey") + 5000000).as("k"),
            (col("o_custkey") + 9000000).as("ck"),
            lit("O").as("status"), lit("1-URGENT").as("prio"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
              .as("cents")), base)
      MaterializedView.refresh(s, mv)
      val ops = VersionedTable.history(s, mv)
        .select("operation").collect().map(_.getString(0)).toSet
      require(ops.contains("MV_REFRESH") && !ops.contains("MV_REBUILD"),
        s"count_distinct refresh was not incremental: $ops")
      graft.GraftSession.withExtensions(s) { sess =>
        // subset rollup must scan ONLY the side table
        val side = MaterializedView.sideRootOf(mv, "u_cust")
        val probe = sess.read.format("gvt").load(base).groupBy("status")
          .agg(countDistinct(col("ck")).as("u"))
        val sideCanon = new java.io.File(side).getCanonicalPath
        require(probe.inputFiles.nonEmpty && probe.inputFiles.forall { f =>
          val p = try new java.net.URI(f).getPath
                  catch { case _: Exception => f }
          p != null && p.startsWith(sideCanon + "/")
        }, "subset distinct rollup must be served by the side table " +
          s"alone: ${probe.inputFiles.take(3).mkString(",")}")
        // the served row: a MIXED subset rollup — distinct counts from
        // the side table LEFT-joined with the MV re-aggregation, no
        // base scan
        val q = sess.read.format("gvt").load(base)
          .groupBy("status")
          .agg(countDistinct(col("ck")).as("u_cust"),
            sum(col("cents")).as("sum_cents"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("status"))
        require(q.inputFiles.exists { f =>
          val p = try new java.net.URI(f).getPath
                  catch { case _: Exception => f }
          p != null && p.startsWith(sideCanon + "/")
        }, "the mixed rollup must read the side table")
        requireMv(q, mv)
      }
    })
  )

  val oracle: Map[String, String] = Map(

    "q_mv_join_rollup" ->
      """WITH o AS (SELECT o_custkey AS ck_o,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderstatus IN ('O', 'P'))
        |SELECT c_mktsegment AS segment,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(cents) AS DOUBLE) / count(*) AS avg_cents
        |FROM o JOIN customer ON ck_o = c_custkey
        |GROUP BY segment ORDER BY segment""".stripMargin,

    "q_mv_diff_retract" ->
      """WITH o AS (
        |  SELECT o_custkey AS ck_o,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 7 <> 0
        |  UNION ALL
        |  SELECT o_custkey,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) + 5
        |  FROM orders WHERE o_orderkey % 13 = 0)
        |SELECT c_mktsegment AS segment,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM o JOIN customer ON ck_o = c_custkey
        |GROUP BY segment ORDER BY segment""".stripMargin,

    "q_mv_distinct_join" ->
      """WITH o AS (
        |  SELECT o_custkey AS ck_o, o_orderpriority AS prio,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderpriority <> '1-URGENT'
        |  UNION ALL
        |  SELECT o_custkey, '9-NEW',
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)
        |  FROM orders WHERE o_orderkey % 19 = 0)
        |SELECT c_mktsegment AS segment,
        |  CAST(count(DISTINCT prio) AS BIGINT) AS u_prio,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM o JOIN customer ON ck_o = c_custkey
        |GROUP BY c_mktsegment ORDER BY segment""".stripMargin,

    "q_mv_distinct" ->
      """WITH b AS (
        |  SELECT o_custkey AS ck, o_orderstatus AS status,
        |    o_orderpriority AS prio,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 11 <> 0
        |  UNION ALL
        |  SELECT o_custkey + 9000000, 'O', '1-URGENT',
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)
        |  FROM orders WHERE o_orderkey % 17 = 0)
        |SELECT status,
        |  CAST(count(DISTINCT ck) AS BIGINT) AS u_cust,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM b GROUP BY status ORDER BY status""".stripMargin,

    "q_mv_diff_retract_minmax" ->
      """WITH o AS (
        |  SELECT o_custkey AS ck_o, o_orderstatus AS status,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders
        |  WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 7 = 0)
        |  UNION ALL
        |  SELECT o_custkey, 'O',
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) + 11
        |  FROM orders WHERE o_orderkey % 13 = 0)
        |SELECT status, CAST(min(cents) AS BIGINT) AS min_cents,
        |  CAST(max(cents) AS BIGINT) AS max_cents,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM o JOIN customer ON ck_o = c_custkey
        |GROUP BY status ORDER BY status""".stripMargin,

    "q_mv_diff_join" ->
      """WITH o AS (
        |  SELECT o_custkey AS ck_o,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders
        |  UNION ALL
        |  SELECT o_custkey,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) + 13
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |c AS (SELECT c_custkey AS ck, c_mktsegment AS segment FROM customer
        |      UNION ALL SELECT 3000000, 'SEG_X'),
        |x AS (SELECT 3000000 AS ck_o, CAST(i*10 + 1 AS BIGINT) AS cents
        |      FROM unnest([0,1,2,3,4]) AS t(i)),
        |allo AS (SELECT * FROM o UNION ALL SELECT * FROM x)
        |SELECT segment, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM allo JOIN c ON ck_o = ck
        |GROUP BY segment ORDER BY segment""".stripMargin,

    "q_mv_exact_join" ->
      """WITH o AS (SELECT o_orderkey AS k, o_custkey AS ck_o,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 97 <> 0)
        |SELECT c_mktsegment AS segment,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM o JOIN customer ON ck_o = c_custkey
        |GROUP BY segment ORDER BY segment""".stripMargin,

    "q_sql_mv" ->
      """WITH b AS (SELECT o_orderkey AS k, o_orderstatus AS status,
        |    o_orderpriority AS prio,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT status, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM b WHERE k % 97 <> 0 AND prio <> '4-NOT SPECIFIED'
        |GROUP BY status ORDER BY status""".stripMargin,

    "q_mv_rewrite" ->
      """WITH b AS (SELECT o_orderstatus AS status, o_orderpriority AS prio,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT status, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(cents) AS DOUBLE) / count(*) AS avg_cents
        |FROM b WHERE prio <> '4-NOT SPECIFIED'
        |GROUP BY status ORDER BY status""".stripMargin,

    "q_mv_incremental" ->
      """WITH b AS (SELECT o_orderkey AS k, o_orderstatus AS status,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |fin AS (
        |  SELECT status, cents FROM b WHERE k % 97 <> 0
        |  UNION ALL
        |  SELECT 'X' AS status, cents + 7 AS cents FROM b WHERE k % 10 = 0)
        |SELECT status, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM fin GROUP BY status ORDER BY status""".stripMargin
  )
}
