package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables.t

/** Recursive CTEs (`WITH RECURSIVE`, new in Spark 4.0 — SPARK-24497):
  * hierarchy traversal the iterative DataFrame loops (PageRank/CC/SSSP
  * in graft.ops) express imperatively, here in pure declarative SQL —
  * Catalyst plans each iteration as a distributed join against the
  * previous frontier, so the shape scales like the hand-rolled loops.
  * Fixtures derive synthetic hierarchies from key arithmetic (the
  * repo's modular-fixture convention) so the DuckDB oracle replays the
  * identical recursion.
  */
object RecursiveQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Customer binary tree (parent = k DIV 2, root k=0): per-depth
    // rollup of population and balances. Depth grows with log2(n), so
    // the iteration count — and the plan — holds at any scale.
    "q_recursive_tree" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("rec_customer")
      s.sql(
        """WITH RECURSIVE d AS (
          |  SELECT c_custkey AS k,
          |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acct_cents,
          |    0 AS depth
          |  FROM rec_customer WHERE c_custkey = 0
          |  UNION ALL
          |  SELECT c.c_custkey,
          |    CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT),
          |    d.depth + 1
          |  FROM rec_customer c JOIN d ON c.c_custkey DIV 2 = d.k
          |  WHERE c.c_custkey > 0)
          |SELECT depth, CAST(count(*) AS BIGINT) AS n_custs,
          |  CAST(sum(acct_cents) AS BIGINT) AS acct_cents
          |FROM d GROUP BY depth ORDER BY depth""".stripMargin)
    }),

    // Parts explosion (BOM): component edges p → 2p+1, 2p+2 with
    // per-edge quantity (p % 3 + 1); the rollup multiplies quantities
    // down each path and prices the components — the classic
    // transitive-closure-with-accumulator recursion. The child→parent
    // map is written as the EQUI condition `(c-1) DIV 2 = parent`
    // (covering both children exactly) so every iteration is a hash
    // join against the frontier — the OR-of-equalities form plans a
    // per-iteration nested loop (10.2s vs ~1s at sf0.1). `c > 0` keeps
    // the two engines' integer-division conventions off the c=0 row
    // (trunc vs floor on -1/2 — and a 0→0 self-edge would not
    // terminate).
    "q_recursive_bom" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("rec_part")
      s.sql(
        """WITH RECURSIVE bom AS (
          |  SELECT p_partkey AS root, p_partkey AS part,
          |    p_retailprice AS price, CAST(1 AS BIGINT) AS mult
          |  FROM rec_part WHERE p_partkey < 10
          |  UNION ALL
          |  SELECT b.root, c.p_partkey, c.p_retailprice,
          |    b.mult * (b.part % 3 + 1)
          |  FROM bom b JOIN rec_part c
          |    ON (c.p_partkey - 1) DIV 2 = b.part
          |  WHERE c.p_partkey > 0)
          |SELECT root, CAST(count(*) AS BIGINT) AS n_parts,
          |  CAST(sum(mult) AS BIGINT) AS total_mult,
          |  CAST(sum(CAST(floor(mult * price * 100 + 0.5) AS BIGINT)) AS BIGINT)
          |    AS cost_cents
          |FROM bom GROUP BY root ORDER BY root""".stripMargin)
    })
  )

  val oracle: Map[String, String] = Map(

    "q_recursive_tree" ->
      """WITH RECURSIVE d AS (
        |  SELECT c_custkey AS k,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acct_cents,
        |    0 AS depth
        |  FROM customer WHERE c_custkey = 0
        |  UNION ALL
        |  SELECT c.c_custkey,
        |    CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT),
        |    d.depth + 1
        |  FROM customer c JOIN d ON c.c_custkey // 2 = d.k
        |  WHERE c.c_custkey > 0)
        |SELECT depth, CAST(count(*) AS BIGINT) AS n_custs,
        |  CAST(sum(acct_cents) AS BIGINT) AS acct_cents
        |FROM d GROUP BY depth ORDER BY depth""".stripMargin,

    "q_recursive_bom" ->
      """WITH RECURSIVE bom AS (
        |  SELECT p_partkey AS root, p_partkey AS part,
        |    p_retailprice AS price, CAST(1 AS BIGINT) AS mult
        |  FROM part WHERE p_partkey < 10
        |  UNION ALL
        |  SELECT b.root, c.p_partkey, c.p_retailprice,
        |    b.mult * (b.part % 3 + 1)
        |  FROM bom b JOIN part c
        |    ON (c.p_partkey - 1) // 2 = b.part
        |  WHERE c.p_partkey > 0)
        |SELECT root, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(mult) AS BIGINT) AS total_mult,
        |  CAST(sum(CAST(floor(mult * price * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS cost_cents
        |FROM bom GROUP BY root ORDER BY root""".stripMargin
  )
}
