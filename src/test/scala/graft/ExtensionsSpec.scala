package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The production registration path: a session configured ONLY with
  * `spark.sql.extensions=graft.GraftExtensions` (no register() calls, no
  * experimental-registry mutation) must resolve the native SQL functions
  * and plan the custom GroupedTopK operator. */
class ExtensionsSpec extends AnyFunSuite {

  /** Build a sibling session on the shared SparkContext carrying
    * GraftExtensions, run `f`, restore the suite session. spark.sql.
    * extensions is a STATIC conf (applies only at SparkContext build),
    * so over the shared test context the injection goes through
    * Builder.withExtensions — the same SparkSessionExtensions => Unit
    * instance the config names, exercising the identical inject path.
    * The shared TestSpark session must be cleared from the active/
    * default slots first or getOrCreate would just return it. */
  private def withExtensionsSession[A](f: SparkSession => A): A = {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val sess = SparkSession.builder()
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      try f(sess)
      finally {
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("injected functions resolve in SQL with no register() call") {
    withExtensionsSession { sess =>
      val row = sess.sql(
        """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
          |       hamming('af', '0f') AS h""".stripMargin).head()
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-9)
      assert(row.getInt(1) == 1) // character-level (DuckDB semantics): one differing position
    }
  }

  test("GroupedTopK plans through the injected strategy alone") {
    import org.apache.spark.sql.graft.GroupedTopKApi
    withExtensionsSession { sess =>
      val df = sess.range(100)
        .select((col("id") % 5).as("g"), col("id").as("v"))
      val out = GroupedTopKApi.build(df, Seq(col("g")), Seq(col("v").desc), 2)
      assert(out.queryExecution.executedPlan.toString.contains("GroupedTopK"))
      val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (0L to 4L).flatMap(g => Seq((g, 95L + g), (g, 90L + g))).toSet
      assert(got == want)
    }
  }

  test("the build-only path fails without the extension (proves injection is load-bearing)") {
    import org.apache.spark.sql.graft.{GroupedTopKApi, GroupedTopKStrategy}
    val base = TestSpark.spark
    // strip any strategy left by earlier suites, then plan WITHOUT registration
    base.experimental.extraStrategies =
      base.experimental.extraStrategies.filterNot(_ == GroupedTopKStrategy)
    val df = base.range(10).select((col("id") % 2).as("g"), col("id").as("v"))
    val out = GroupedTopKApi.build(df, Seq(col("g")), Seq(col("v")), 1)
    intercept[Exception] { out.collect() }
  }

  test("INSERT INTO a gvt relation routes through the commit protocol " +
    "(r11: the refusal became a rewrite)") {
    withExtensionsSession { sess =>
      import sess.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft_gvtguard").toString + "/t"
      graft.sources.VersionedTable.write((1 to 5).toDF("id"), root)
      sess.sql(s"CREATE OR REPLACE TEMPORARY VIEW gvt_guard USING gvt OPTIONS (path '$root')")
      sess.sql("INSERT INTO gvt_guard VALUES (99)")
      // the insert is a versioned APPEND commit, not a raw file write
      assert(graft.sources.VersionedTable.latestVersion(root).contains(2L))
      assert(graft.sources.VersionedTable.history(sess, root)
        .filter(org.apache.spark.sql.functions.col("operation") === "INSERT")
        .count() == 1L)
      // a re-resolved view reads the committed row; v1 is untouched
      sess.sql(s"CREATE OR REPLACE TEMPORARY VIEW gvt_guard USING gvt OPTIONS (path '$root')")
      assert(sess.sql("SELECT count(*) AS n FROM gvt_guard").as[Long].head() == 6)
      assert(graft.sources.VersionedTable.readVersion(sess, root, 1L).count() == 5)
    }
  }

  test("SQL DML over gvt: DELETE FROM / UPDATE / MERGE INTO route to versioned commits") {
    withExtensionsSession { sess =>
      import sess.implicits._
      import graft.sources.VersionedTable
      val root = java.nio.file.Files.createTempDirectory("graft_sqldml").toString + "/t"
      VersionedTable.write((1 to 100).map(i => (i, i * 10L)).toDF("id", "v"),
        root)
      def view(): Unit = sess.sql(
        s"CREATE OR REPLACE TEMPORARY VIEW gvt_dml USING gvt OPTIONS (path '$root')")
      view()
      // DELETE FROM → O(changed) deletion-vector commit
      sess.sql("DELETE FROM gvt_dml WHERE id <= 10")
      view()
      assert(sess.sql("SELECT count(*) AS n FROM gvt_dml").as[Long].head() == 90)
      // UPDATE … SET → DV UPDATE commit (expression over the old value)
      sess.sql("UPDATE gvt_dml SET v = v + 5 WHERE id = 50")
      view()
      assert(sess.sql("SELECT v FROM gvt_dml WHERE id = 50").as[Long].head() == 505L)
      // MERGE INTO: delete / update / insert clauses in one statement
      Seq((50, 1L), (60, 2L), (999, 3L)).toDF("id", "v")
        .createOrReplaceTempView("dml_src")
      sess.sql("""MERGE INTO gvt_dml t USING dml_src s ON t.id = s.id
        WHEN MATCHED AND s.v = 1 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.v + 100
        WHEN NOT MATCHED THEN INSERT *""")
      view()
      val got = sess.sql(
        "SELECT id, v FROM gvt_dml WHERE id IN (50, 60, 999) ORDER BY id")
        .as[(Int, Long)].collect().toSeq
      assert(got == Seq((60, 102L), (999, 3L)), s"got $got")
      assert(sess.sql("SELECT count(*) AS n FROM gvt_dml").as[Long].head() == 90)
      // history reflects the routed operations
      val ops = VersionedTable.history(sess, root)
        .select("operation").as[String].collect().toSeq
      assert(ops.containsSlice(Seq("MERGE", "UPDATE_DV", "DELETE_DV")), ops.toString)
      // a time-travel-pinned view is read-only
      sess.sql(s"""CREATE OR REPLACE TEMPORARY VIEW gvt_dml_v1 USING gvt
        OPTIONS (path '$root', versionAsOf '1')""")
      val e = intercept[Exception] { sess.sql("DELETE FROM gvt_dml_v1 WHERE id = 1") }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(e).exists(_.contains("read-only")), e.toString)
    }
  }

  test("DML subqueries: uncorrelated IN/NOT IN/EXISTS route into the DV " +
    "locate scan as semi/anti joins; unsupported shapes refuse loudly") {
    withExtensionsSession { sess =>
      import sess.implicits._
      import graft.sources.VersionedTable
      val root = java.nio.file.Files.createTempDirectory("graft_sqldmlsub")
        .toString + "/t"
      VersionedTable.write((1 to 100).map(i => (i, i * 10L)).toDF("id", "v"),
        root)
      def view(): Unit = sess.sql(s"CREATE OR REPLACE TEMPORARY VIEW " +
        s"sub_dml USING gvt OPTIONS (path '$root')")
      view()
      Seq(3, 7, 11, 200).toDF("sk").createOrReplaceTempView("sub_keys")
      // IN subquery: deletes only the existing staged keys
      sess.sql("DELETE FROM sub_dml WHERE id IN (SELECT sk FROM sub_keys)")
      view()
      assert(sess.sql("SELECT count(*) AS n FROM sub_dml")
        .as[Long].head() == 97)
      // UPDATE with residual + IN: expression values work too
      sess.sql("UPDATE sub_dml SET v = v + 1 WHERE id <= 10 " +
        "AND id IN (SELECT sk + 1 FROM sub_keys)")
      view()
      assert(sess.sql("SELECT v FROM sub_dml WHERE id = 4")
        .as[Long].head() == 41L)
      assert(sess.sql("SELECT v FROM sub_dml WHERE id = 12")
        .as[Long].head() == 120L, "residual bound ignored")
      // NOT IN without NULLs: anti join under a residual bound
      sess.sql("DELETE FROM sub_dml WHERE id <= 5 " +
        "AND id NOT IN (SELECT sk FROM sub_keys)")
      view()
      assert(sess.sql("SELECT count(*) AS n FROM sub_dml")
        .as[Long].head() == 93) // 1,2,4,5 gone (3 already deleted)
      // NOT IN over a NULL-bearing subquery deletes NOTHING (SQL 3VL)
      val vBefore = VersionedTable.latestVersion(root).get
      sess.sql("DELETE FROM sub_dml WHERE id NOT IN " +
        "(SELECT CASE WHEN sk = 7 THEN NULL ELSE sk END FROM sub_keys)")
      view()
      assert(sess.sql("SELECT count(*) AS n FROM sub_dml")
        .as[Long].head() == 93)
      // FALSE EXISTS: the whole command no-ops — not even a commit
      sess.sql("DELETE FROM sub_dml WHERE EXISTS " +
        "(SELECT 1 FROM sub_keys WHERE sk < 0)")
      assert(VersionedTable.latestVersion(root).get == vBefore + 1,
        "a FALSE-EXISTS DELETE must not commit")
      // correlated EXISTS (the staging idiom): equality-decorrelated
      // into a semi locate join — deletes ids 6, 10, 14 (sk + 3)
      sess.sql("DELETE FROM sub_dml WHERE EXISTS " +
        "(SELECT 1 FROM sub_keys WHERE sk + 3 = id)")
      view()
      assert(sess.sql("SELECT count(*) AS n FROM sub_dml")
        .as[Long].head() == 90)
      // correlated NOT EXISTS: plain anti-join semantics (a no-match
      // row QUALIFIES) — remaining ids <= 9 are 8 and 9, neither staged
      sess.sql("DELETE FROM sub_dml WHERE id <= 9 AND NOT EXISTS " +
        "(SELECT 1 FROM sub_keys WHERE sk = id)")
      view()
      assert(sess.sql("SELECT count(*) AS n FROM sub_dml")
        .as[Long].head() == 88)
      // uncorrelated SCALAR subqueries: condition and assignment both
      // evaluate once at command time (min(sk)*4 = 12; max(sk) = 200)
      sess.sql("UPDATE sub_dml SET v = (SELECT CAST(max(sk) AS BIGINT) " +
        "FROM sub_keys) WHERE id = (SELECT min(sk) * 4 FROM sub_keys)")
      view()
      assert(sess.sql("SELECT v FROM sub_dml WHERE id = 12")
        .as[Long].head() == 200L)
      // multi-column NOT IN: exact 3VL via the compatibility anti-join.
      // (15,150) matches -> kept; (16,160) vs (16,NULL) is UNKNOWN ->
      // kept; (17,170) is FALSE against every pair -> deleted
      sess.sql("SELECT * FROM VALUES (15, CAST(150 AS BIGINT)), " +
        "(16, CAST(NULL AS BIGINT)) AS t(pk, pv)")
        .createOrReplaceTempView("sub_pairs")
      sess.sql("DELETE FROM sub_dml WHERE id BETWEEN 15 AND 17 " +
        "AND (id, v) NOT IN (SELECT pk, pv FROM sub_pairs)")
      view()
      assert(sess.sql("SELECT id FROM sub_dml WHERE id BETWEEN 15 AND 17 " +
        "ORDER BY id").as[Int].collect().toSeq == Seq(15, 16),
        "multi-column NOT IN must honor SQL 3VL (only the FALSE row deletes)")
      // refusals: aggregating correlation, correlated scalar,
      // MERGE-clause subquery — loud, never silently mis-executed
      def refuses(sql: String, needle: String): Unit = {
        val e = intercept[Exception] { sess.sql(sql) }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Seq.empty
          else String.valueOf(t.getMessage) +: msgs(t.getCause)
        assert(msgs(e).exists(_.toLowerCase.contains(needle.toLowerCase)),
          s"expected '$needle' in: ${msgs(e).mkString(" | ")}")
      }
      // multi-key correlated EXISTS: both equality conjuncts become
      // semi-join keys (delete rows where (id, v) matches a pair)
      sess.sql("SELECT * FROM VALUES (20, CAST(200 AS BIGINT)), " +
        "(21, CAST(999 AS BIGINT)) AS t(mk, mv)")
        .createOrReplaceTempView("sub_mkeys")
      sess.sql("DELETE FROM sub_dml WHERE EXISTS " +
        "(SELECT 1 FROM sub_mkeys WHERE mk = id AND mv = v)")
      view()
      assert(sess.sql("SELECT id FROM sub_dml WHERE id IN (20, 21) " +
        "ORDER BY id").as[Int].collect().toSeq == Seq(21),
        "only the (id, v)-matching row deletes; the half-match stays")
      // CORRELATED NOT IN: the null-probe decomposition — one
      // distributed anti-join on the equality key, exact 3VL per key
      // group. id 22's group carries a NULL (UNKNOWN → survives), 23
      // matches (FALSE → survives), 24 mismatches (TRUE → deletes),
      // 25 has NO group (NOT IN () is TRUE → deletes)
      sess.sql("SELECT * FROM VALUES (22, CAST(NULL AS BIGINT)), " +
        "(22, CAST(1 AS BIGINT)), (23, CAST(230 AS BIGINT)), " +
        "(24, CAST(1 AS BIGINT)) AS t(ck, cv)")
        .createOrReplaceTempView("sub_corr")
      sess.sql("DELETE FROM sub_dml WHERE id BETWEEN 22 AND 25 " +
        "AND v NOT IN (SELECT cv FROM sub_corr WHERE ck = id)")
      view()
      assert(sess.sql("SELECT id FROM sub_dml WHERE id BETWEEN 22 AND 25 " +
        "ORDER BY id").as[Int].collect().toSeq == Seq(22, 23),
        "correlated NOT IN 3VL: NULL-bearing group and match survive; " +
          "mismatch and empty group delete")
      // non-equality correlation in NOT IN keeps the loud refusal
      refuses("DELETE FROM sub_dml WHERE v NOT IN " +
        "(SELECT cv FROM sub_corr WHERE ck > id)", "equality")
      refuses("DELETE FROM sub_dml WHERE EXISTS (SELECT count(*) " +
        "FROM sub_keys WHERE sk = id GROUP BY sk HAVING count(*) > 1)",
        "correlated")
      // CORRELATED AGGREGATED scalar subqueries decompose into a
      // per-key aggregate LEFT-joined onto the locate scan — in SET
      // assignments and conditions alike. Live rows with sub_corr key
      // groups: 22 (max cv = 1, NULLs ignored) and 23 (max cv = 230);
      // the count(*) condition bounds the update to matched keys so
      // the empty-group NULL scalar never poisons v
      sess.sql("UPDATE sub_dml SET v = " +
        "(SELECT max(cv) FROM sub_corr WHERE ck = id) * 10 " +
        "WHERE id BETWEEN 22 AND 30 AND " +
        "(SELECT count(*) FROM sub_corr WHERE ck = id) > 0")
      view()
      assert(sess.sql("SELECT v FROM sub_dml WHERE id = 22")
        .as[Long].head() == 10L,
        "correlated scalar assignment must read the per-key aggregate " +
          "(max ignores the NULL pair)")
      assert(sess.sql("SELECT v FROM sub_dml WHERE id = 23")
        .as[Long].head() == 2300L)
      assert(sess.sql("SELECT v FROM sub_dml WHERE id = 26")
        .as[Long].head() == 260L,
        "rows with an EMPTY key group (count=0) must not update")
      // COUNT over an empty key group is 0, not NULL (the classic
      // decorrelation bug): rows WITHOUT a staged key satisfy `= 0`
      val vBeforeCnt = VersionedTable.latestVersion(root).get
      sess.sql("DELETE FROM sub_dml WHERE id IN (31, 32) AND " +
        "(SELECT count(*) FROM sub_corr WHERE ck = id) = 0")
      view()
      assert(sess.sql("SELECT count(*) AS n FROM sub_dml " +
        "WHERE id IN (31, 32)").as[Long].head() == 0L,
        "count-on-empty-group must fold to 0, not NULL")
      assert(VersionedTable.latestVersion(root).get == vBeforeCnt + 1)
      // a NON-aggregated (bare) correlated scalar decomposes into the
      // same per-key locate join WITH the standard runtime guard: a
      // single-row key group passes its value through, a multi-row
      // group raises the more-than-one-row error NAMING the key
      sess.sql("UPDATE sub_dml SET v = " +
        "(SELECT cv FROM sub_corr WHERE ck = id) WHERE id = 23")
      view()
      assert(sess.sql("SELECT v FROM sub_dml WHERE id = 23")
        .as[Long].head() == 230L,
        "a single-row key group must pass the bare scalar through")
      // an EMPTY key group evaluates to NULL (SQL: empty scalar =
      // NULL) — `NULL = anything` is UNKNOWN, so the row survives
      sess.sql("DELETE FROM sub_dml WHERE id = 26 AND " +
        "(SELECT cv FROM sub_corr WHERE ck = id) = 260")
      view()
      assert(sess.sql("SELECT count(*) AS n FROM sub_dml WHERE id = 26")
        .as[Long].head() == 1L,
        "an empty key group's bare scalar must be NULL (UNKNOWN, " +
          "no delete)")
      // id 22's key group holds TWO rows → the exact SQL runtime error
      val multi = intercept[Exception] {
        sess.sql("UPDATE sub_dml SET v = " +
          "(SELECT cv FROM sub_corr WHERE ck = id) WHERE id = 22")
      }
      def chainMsgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else String.valueOf(t.getMessage) +: chainMsgs(t.getCause)
      assert(chainMsgs(multi).exists(m =>
        m.contains("more than one row") && m.contains("(22)")),
        "a multi-row key group must raise the more-than-one-row " +
          s"error naming the key: ${chainMsgs(multi).mkString(" | ")}")
      // RESIDUAL one-side-outer comparisons ride the semi/anti join
      // beside the equality keys (the staging freshness idiom
      // `EXISTS(… WHERE s.k = t.k AND s.bound < t.v)`). id 40 (v=400):
      // bound 350 < 400 → EXISTS TRUE → deleted; id 41 (v=410):
      // bound 500 < 410 is FALSE → kept
      sess.sql("SELECT * FROM VALUES (40, CAST(350 AS BIGINT)), " +
        "(41, CAST(500 AS BIGINT)) AS t(rk, bound)")
        .createOrReplaceTempView("sub_res")
      sess.sql("DELETE FROM sub_dml WHERE EXISTS " +
        "(SELECT 1 FROM sub_res WHERE rk = id AND bound < v)")
      view()
      assert(sess.sql("SELECT id FROM sub_dml WHERE id IN (40, 41) " +
        "ORDER BY id").as[Int].collect().toSeq == Seq(41),
        "residual comparison must refine the semi join")
      // NOT EXISTS with a residual: 41's only staged row fails the
      // bound (TRUE), 42 has no staged row (TRUE) — both delete
      sess.sql("DELETE FROM sub_dml WHERE id IN (41, 42) AND NOT EXISTS " +
        "(SELECT 1 FROM sub_res WHERE rk = id AND bound < v)")
      view()
      assert(sess.sql("SELECT count(*) AS n FROM sub_dml " +
        "WHERE id IN (41, 42)").as[Long].head() == 0L,
        "residual comparison must refine the anti join")
      refuses("""MERGE INTO sub_dml t USING sub_keys s ON t.id = s.sk
        WHEN MATCHED AND t.id IN (SELECT sk FROM sub_keys) THEN DELETE""",
        "subquery")
    }
  }

  test("MERGE NOT MATCHED clause chains: first-wins conditions, general " +
    "column lists, key-assignment refusals") {
    withExtensionsSession { sess =>
      import sess.implicits._
      import graft.sources.VersionedTable
      val root = java.nio.file.Files.createTempDirectory("graft_mergeclauses")
        .toString + "/t"
      VersionedTable.write(Seq((1, 10L, "t")).toDF("id", "v", "tag"), root)
      Seq((1, 100L, "m"), (2, 20L, "a"), (3, 33L, "b"), (4, 40L, "c"))
        .toDF("id", "v", "tag").createOrReplaceTempView("mc_src")
      def view(): Unit = sess.sql(s"CREATE OR REPLACE TEMPORARY VIEW " +
        s"mc_t USING gvt OPTIONS (path '$root')")
      view()
      sess.sql("""MERGE INTO mc_t t USING mc_src s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED AND s.v % 20 = 0 THEN INSERT (id, v) VALUES (s.id, s.v + 1)
        WHEN NOT MATCHED AND s.tag = 'b' THEN INSERT *
        WHEN NOT MATCHED THEN INSERT (id, tag) VALUES (s.id, 'rest')""")
      view()
      val got = sess.sql("SELECT id, v, tag FROM mc_t ORDER BY id")
        .as[(Int, Option[Long], Option[String])].collect().toSeq
      assert(got == Seq(
        (1, Some(100L), Some("t")),   // matched update
        (2, Some(21L), None),         // clause 1: tag unlisted -> NULL
        (3, Some(33L), Some("b")),    // clause 2: INSERT *
        (4, Some(41L), None)),        // v%20=0 first-wins over the rest clause
        s"got $got")
      // a source row matching NO clause is not inserted
      Seq((9, 7L, "x")).toDF("id", "v", "tag")
        .createOrReplaceTempView("mc_src2")
      sess.sql("""MERGE INTO mc_t t USING mc_src2 s ON t.id = s.id
        WHEN NOT MATCHED AND s.v % 2 = 0 THEN INSERT *""")
      view()
      assert(sess.sql("SELECT count(*) AS n FROM mc_t").as[Long].head() == 4)
      // refusals: a key assigned anything but its source counterpart;
      // a column list omitting the key
      def refuses(sql: String, needle: String): Unit = {
        val e = intercept[Exception] { sess.sql(sql) }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Seq.empty
          else String.valueOf(t.getMessage) +: msgs(t.getCause)
        assert(msgs(e).exists(_.contains(needle)),
          s"expected '$needle' in: ${msgs(e).mkString(" | ")}")
      }
      refuses("""MERGE INTO mc_t t USING mc_src s ON t.id = s.id
        WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id + 1000, s.v)""",
        "source join counterpart")
      refuses("""MERGE INTO mc_t t USING mc_src s ON t.id = s.id
        WHEN NOT MATCHED THEN INSERT (v, tag) VALUES (s.v, s.tag)""",
        "omitting merge key")
    }
  }

  test("maintenance SQL: OPTIMIZE / VACUUM / DESCRIBE HISTORY; VERSION AS OF in queries") {
    withExtensionsSession { sess =>
      import sess.implicits._
      import graft.sources.VersionedTable
      val root = java.nio.file.Files.createTempDirectory("graft_maintsql").toString + "/t"
      VersionedTable.write((1 to 100).toDF("id"), root)               // v1
      VersionedTable.append((101 to 200).toDF("id"), root)            // v2
      VersionedTable.append((201 to 300).toDF("id"), root)            // v3
      sess.sql(s"CREATE OR REPLACE TEMPORARY VIEW maint_t USING gvt OPTIONS (path '$root')")
      // OPTIMIZE folds the append chain (base untouched)
      val nv = sess.sql("OPTIMIZE maint_t").as[Long].head()
      assert(VersionedTable.readMeta(root, nv, "_parent").map(_.trim) == Some("1"))
      assert(VersionedTable.readLatest(sess, root).count() == 300)
      // DESCRIBE HISTORY, newest first
      val hist = sess.sql("DESCRIBE HISTORY maint_t")
        .select("operation").as[String].collect().toSeq
      assert(hist.head == "COMPACT_CHAIN" && hist.last == "WRITE", hist.toString)
      // in-query time travel: VERSION AS OF over the registered view
      assert(sess.sql("SELECT count(*) AS n FROM maint_t VERSION AS OF 1")
        .as[Long].head() == 100)
      assert(sess.sql("SELECT count(*) AS n FROM maint_t VERSION AS OF 2")
        .as[Long].head() == 200)
      // the path form works without any registered view
      assert(sess.sql(s"SELECT max(id) AS m FROM gvt.`$root` VERSION AS OF 1")
        .as[Int].head() == 100)
      // VACUUM RETAIN 0 HOURS reclaims the folded-away tips
      val dropped = sess.sql("VACUUM maint_t RETAIN 0 HOURS").as[Long].collect().toSet
      assert(dropped.nonEmpty && !dropped.contains(1L) && !dropped.contains(nv))
      assert(VersionedTable.readLatest(sess, root).count() == 300)
      // OPTIMIZE ZORDER BY takes the full rewrite path
      val root2 = java.nio.file.Files.createTempDirectory("graft_maintz").toString + "/t"
      VersionedTable.write((1 to 500).map(i => (i.toLong, (i * 7 % 500).toLong))
        .toDF("a", "b").repartition(4), root2)
      sess.sql(s"CREATE OR REPLACE TEMPORARY VIEW maint_z USING gvt OPTIONS (path '$root2')")
      sess.sql("OPTIMIZE maint_z ZORDER BY (a, b)").collect()
      assert(VersionedTable.history(sess, root2).select("operation")
        .as[String].head().startsWith("COMPACT(zorder"))
      // a non-gvt target is refused loudly
      sess.range(5).createOrReplaceTempView("plain_view")
      val e = intercept[Exception] { sess.sql("OPTIMIZE plain_view") }
      assert(e.getMessage.contains("not a gvt table"), e.toString)
    }
  }

  test("DML semantics: simultaneous UPDATE, MERGE clause order, strict INSERT lists") {
    withExtensionsSession { sess =>
      import sess.implicits._
      import graft.sources.VersionedTable
      val root = java.nio.file.Files.createTempDirectory("graft_dmlsem").toString + "/t"
      VersionedTable.write(Seq((1, 10L, 20L)).toDF("id", "a", "b"), root)
      def view(): Unit = sess.sql(
        s"CREATE OR REPLACE TEMPORARY VIEW sem_t USING gvt OPTIONS (path '$root')")
      view()
      // SQL UPDATE assigns SIMULTANEOUSLY: a=b, b=a swaps
      sess.sql("UPDATE sem_t SET a = b, b = a WHERE id = 1")
      view()
      assert(sess.sql("SELECT a, b FROM sem_t").as[(Long, Long)].head() == ((20L, 10L)))
      // two conditional DELETEs OR together, last unconditional UPDATE
      // takes the rest (Spark's parser already forbids a non-last
      // unconditional matched clause, so first-wins order reduces to
      // exactly this shape)
      VersionedTable.write((1 to 10).map(i => (i, i.toLong, 0L)).toDF("id", "a", "b"),
        root, allowEvolution = true)
      view()
      (1 to 10).map(i => (i, 0L, 0L)).toDF("id", "a", "b")
        .createOrReplaceTempView("sem_src2")
      sess.sql("""MERGE INTO sem_t t USING sem_src2 s ON t.id = s.id
        WHEN MATCHED AND t.a <= 2 THEN DELETE
        WHEN MATCHED AND t.a >= 9 THEN DELETE
        WHEN MATCHED THEN UPDATE SET b = t.a""")
      view()
      val left = sess.sql("SELECT id, b FROM sem_t ORDER BY id")
        .as[(Int, Long)].collect().toSeq
      assert(left == (3 to 8).map(i => (i, i.toLong)), left.toString)
      // (a partial INSERT column list is SUPPORTED since round 13 —
      // unlisted columns insert NULL; covered with oracle + clause-chain
      // assertions in the "MERGE NOT MATCHED clause chains" test and
      // q_merge_ins_clauses)
      // WHEN NOT MATCHED BY SOURCE: conditional delete + update of the
      // remaining target-only rows (and a conditional matched UPDATE)
      // state: ids 3..8 with (a=i, b=i)
      (3 to 5).map(i => (i, 0L, 0L)).toDF("id", "a", "b")
        .createOrReplaceTempView("sem_src3")
      sess.sql("""MERGE INTO sem_t t USING sem_src3 s ON t.id = s.id
        WHEN MATCHED AND t.a >= 5 THEN UPDATE SET b = -5
        WHEN NOT MATCHED BY SOURCE AND t.b >= 8 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET a = -1""")
      view()
      val nms = sess.sql("SELECT id, a, b FROM sem_t ORDER BY id")
        .as[(Int, Long, Long)].collect().toSeq
      assert(nms == Seq((3, 3L, 3L), (4, 4L, 4L), (5, 5L, -5L),
        (6, -1L, 6L), (7, -1L, 7L)), nms.toString) // id 8 deleted
    }
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT over gvt tables") {
    withExtensionsSession { sess =>
      import sess.implicits._
      import graft.sources.VersionedTable
      val root = java.nio.file.Files.createTempDirectory("graft_consql").toString + "/t"
      VersionedTable.write((1 to 10).map(i => (i, i * 10)).toDF("id", "v"), root)
      sess.sql(s"CREATE OR REPLACE TEMPORARY VIEW con_t USING gvt OPTIONS (path '$root')")
      sess.sql("ALTER TABLE con_t ADD CONSTRAINT v_pos CHECK (v > 0)")
      assert(VersionedTable.constraints(root) == Map("v_pos" -> "v > 0"))
      // the constraint gates writes…
      intercept[VersionedTable.CheckConstraintViolation] {
        VersionedTable.append(Seq((11, -1)).toDF("id", "v"), root)
      }
      // …an unsatisfiable one is rejected against the live snapshot…
      intercept[VersionedTable.CheckConstraintViolation] {
        sess.sql("ALTER TABLE con_t ADD CONSTRAINT v_big CHECK (v > 1000)")
      }
      // …and DROP removes it
      sess.sql("ALTER TABLE con_t DROP CONSTRAINT v_pos")
      assert(VersionedTable.constraints(root).isEmpty)
      VersionedTable.append(Seq((11, -1)).toDF("id", "v"), root)
      assert(VersionedTable.readLatest(sess, root).count() == 11)
    }
  }

  test("RESTORE SQL and the table_changes TVF") {
    withExtensionsSession { sess =>
      import sess.implicits._
      import graft.sources.VersionedTable
      val root = java.nio.file.Files.createTempDirectory("graft_restsql").toString + "/t"
      VersionedTable.write((1 to 10).map(i => (i, s"v$i")).toDF("id", "s"), root) // v1
      VersionedTable.deleteWhereVector(sess, root, col("id") <= 3)               // v2
      sess.sql(s"CREATE OR REPLACE TEMPORARY VIEW rest_t USING gvt OPTIONS (path '$root')")
      // CDF via SQL: the delete classified through the TVF
      val changed = sess.sql(
        "SELECT _change_type, count(*) AS n FROM table_changes('" + root +
          "', 1, 2, 'id') GROUP BY _change_type")
        .as[(String, Long)].collect().toMap
      assert(changed == Map("delete" -> 3L), changed.toString)
      // view-name targets resolve through the catalog too
      assert(sess.sql("SELECT count(*) AS n FROM table_changes('rest_t', 1, 2, 'id')")
        .as[Long].head() == 3)
      // RESTORE re-commits v1's content on top
      val nv = sess.sql("RESTORE TABLE rest_t TO VERSION AS OF 1").as[Long].head()
      assert(VersionedTable.readLatest(sess, root).count() == 10)
      assert(VersionedTable.history(sess, root).select("operation")
        .as[String].head() == s"RESTORE(v=1)")
      assert(nv == VersionedTable.latestVersion(root).get)
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION: new source columns join the target " +
      "schema; plain MERGE keeps it") {
    withExtensionsSession { sess =>
      import sess.implicits._
      import graft.sources.VersionedTable
      val root = java.nio.file.Files.createTempDirectory("graft_mergevo").toString + "/t"
      VersionedTable.write((1 to 20).map(i => (i, i * 10L)).toDF("id", "v"), root)
      sess.sql(s"CREATE OR REPLACE TEMPORARY VIEW evo_t USING gvt OPTIONS (path '$root')")
      Seq((11, 111L, "a"), (25, 250L, "b")).toDF("id", "v", "note")
        .createOrReplaceTempView("evo_src")
      sess.sql("""MERGE WITH SCHEMA EVOLUTION INTO evo_t t USING evo_src s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val latest = VersionedTable.readLatest(sess, root)
      assert(latest.columns.toSeq == Seq("id", "v", "note"))
      val rows = latest.orderBy("id")
        .as[(Int, Long, Option[String])].collect().toSeq
      assert(rows.size == 21)
      assert(rows.filter(r => Set(1, 11, 25)(r._1)) == Seq(
        (1, 10L, None), (11, 111L, Some("a")), (25, 250L, Some("b"))))
      // plain MERGE (no evolution): extra source columns are the
      // documented partial-source tolerance — schema must NOT widen
      Seq((12, 222L, 9L).asInstanceOf[(Int, Long, Long)])
        .toDF("id", "v", "extra").createOrReplaceTempView("evo_src2")
      sess.sql(s"CREATE OR REPLACE TEMPORARY VIEW evo_t USING gvt OPTIONS (path '$root')")
      sess.sql("""MERGE INTO evo_t t USING evo_src2 s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.v""")
      val after = VersionedTable.readLatest(sess, root)
      assert(after.columns.toSeq == Seq("id", "v", "note"))
      assert(after.filter($"id" === 12).select("v").as[Long].head() == 222L)
      // API-level evolution (Delta autoMerge analogue): conditional
      // clause over an evolving source through mergeInto
      VersionedTable.mergeInto(sess, root,
        Seq((13, 333L, 7L)).toDF("id", "v", "w"), Seq("id"),
        matchedUpdate = Map("v" -> col("s.v"), "w" -> col("s.w")),
        insertNotMatched = false, allowEvolution = true)
      val evolved = VersionedTable.readLatest(sess, root)
      assert(evolved.columns.toSeq == Seq("id", "v", "note", "w"))
      val r13 = evolved.filter($"id" === 13)
        .select("v", "w").as[(Long, Option[Long])].head()
      assert(r13 == ((333L, Some(7L))))
      assert(evolved.filter($"w".isNull).count() == 20)
    }
  }
}
