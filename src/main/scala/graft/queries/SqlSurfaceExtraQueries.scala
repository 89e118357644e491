package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Eighty-seventh wave: the remaining ANSI/modern SQL-surface clauses a
  * migrating user would type verbatim — the PIVOT clause (not the API),
  * a shared named WINDOW, LIMIT/OFFSET pagination over a total order,
  * and NATURAL JOIN + `SELECT * EXCEPT` star-pruning — each carried by a
  * real analytic (segment revenue matrix, daily-revenue momentum panel,
  * top-spender page, enriched-dimension projection), with the oracle
  * spelled in portable SQL (explicit conditional aggregates / repeated
  * OVER / explicit join + column list), so the check proves the sugared
  * clause resolves to the same plan semantics, not that two engines
  * share a parser.
  *
  * Scale shapes: every query reduces facts with one keyed aggregation
  * before any window/pivot; pagination rides a global TopN on a total
  * order (unique tiebreak key), which Spark plans as partial per-
  * partition limits before the single ordered take.
  */
object SqlSurfaceExtraQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // PIVOT clause: order-year × market-segment revenue matrix in exact
    // cents, segments as columns. Spark's PIVOT (value list pinned, so
    // the output schema is static — the only pivot form that's sane on
    // a shared-nothing planner); the oracle is the portable conditional
    // aggregate. Fact scan reduces to (year, segment) before the pivot.
    Q("sql_pivot_clause",
      Some(
        """SELECT year(o.o_orderdate) AS yr,
          |  CAST(coalesce(sum(CASE WHEN c.c_mktsegment = 'AUTOMOBILE'
          |    THEN CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT) END), 0)
          |    AS BIGINT) AS automobile_cents,
          |  CAST(coalesce(sum(CASE WHEN c.c_mktsegment = 'BUILDING'
          |    THEN CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT) END), 0)
          |    AS BIGINT) AS building_cents,
          |  CAST(coalesce(sum(CASE WHEN c.c_mktsegment = 'FURNITURE'
          |    THEN CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT) END), 0)
          |    AS BIGINT) AS furniture_cents,
          |  CAST(coalesce(sum(CASE WHEN c.c_mktsegment = 'HOUSEHOLD'
          |    THEN CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT) END), 0)
          |    AS BIGINT) AS household_cents,
          |  CAST(coalesce(sum(CASE WHEN c.c_mktsegment = 'MACHINERY'
          |    THEN CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT) END), 0)
          |    AS BIGINT) AS machinery_cents
          |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          |GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        tbl(s, dir, "orders").createOrReplaceTempView("orders_pvt")
        tbl(s, dir, "customer").createOrReplaceTempView("customer_pvt")
        s.sql(
          """SELECT yr,
            |  CAST(coalesce(AUTOMOBILE, 0) AS BIGINT) AS automobile_cents,
            |  CAST(coalesce(BUILDING, 0) AS BIGINT) AS building_cents,
            |  CAST(coalesce(FURNITURE, 0) AS BIGINT) AS furniture_cents,
            |  CAST(coalesce(HOUSEHOLD, 0) AS BIGINT) AS household_cents,
            |  CAST(coalesce(MACHINERY, 0) AS BIGINT) AS machinery_cents
            |FROM (
            |  SELECT year(o.o_orderdate) AS yr, c.c_mktsegment AS seg,
            |    CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT) AS cents
            |  FROM orders_pvt o JOIN customer_pvt c
            |    ON c.c_custkey = o.o_custkey)
            |PIVOT (sum(cents) FOR seg IN ('AUTOMOBILE' AS AUTOMOBILE,
            |  'BUILDING' AS BUILDING, 'FURNITURE' AS FURNITURE,
            |  'HOUSEHOLD' AS HOUSEHOLD, 'MACHINERY' AS MACHINERY))
            |ORDER BY yr
            |""".stripMargin)
      }),

    // Named WINDOW clause: one month frame, three analytics sharing the
    // same WINDOW spec (rank by revenue, month-over-month delta,
    // 3-month trailing sum) — the deduplicated form a human writes; the
    // oracle repeats the explicit OVER. Facts reduce to the bounded
    // month frame first, so the single-partition window is ≤ ~80 rows.
    Q("sql_window_named",
      Some(
        """WITH m AS (SELECT year(o_orderdate)*100 + month(o_orderdate)
          |    AS ym,
          |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents
          |  FROM orders GROUP BY 1)
          |SELECT ym, cents,
          |  CAST(rank() OVER (ORDER BY cents DESC, ym) AS BIGINT)
          |    AS rev_rank,
          |  CAST(cents - coalesce(lag(cents) OVER (ORDER BY ym), 0)
          |    AS BIGINT) AS mom_delta_cents,
          |  CAST(sum(cents) OVER (ORDER BY ym
          |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
          |    AS trail3_cents
          |FROM m ORDER BY ym
          |""".stripMargin),
      (s, dir) => {
        tbl(s, dir, "orders").createOrReplaceTempView("orders_nw")
        s.sql(
          """WITH m AS (SELECT year(o_orderdate)*100 + month(o_orderdate)
            |    AS ym,
            |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
            |    AS BIGINT) AS cents
            |  FROM orders_nw GROUP BY 1)
            |SELECT ym, cents,
            |  CAST(rank() OVER wr AS BIGINT) AS rev_rank,
            |  CAST(cents - coalesce(lag(cents) OVER wt, 0) AS BIGINT)
            |    AS mom_delta_cents,
            |  CAST(sum(cents) OVER w3 AS BIGINT) AS trail3_cents
            |FROM m
            |WINDOW wr AS (ORDER BY cents DESC, ym), wt AS (ORDER BY ym),
            |  w3 AS (ORDER BY ym ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            |ORDER BY ym
            |""".stripMargin)
      }),

    // LIMIT/OFFSET pagination over a TOTAL order (revenue desc, custkey
    // as the unique tiebreak — without it OFFSET is nondeterministic on
    // any engine): page 3 of the top-spender report, 20 rows starting
    // at 40. Spark plans the global sort as a TopN of OFFSET+LIMIT
    // rows (partial per-partition limits, single ordered take) — the
    // only sane distributed pagination; deep pages should switch to
    // keyset predicates, which is exactly what makes this worth pinning.
    Q("sql_limit_offset",
      Some(
        """SELECT c.c_custkey, c.c_name,
          |  CAST(sum(CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents
          |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          |GROUP BY 1, 2 ORDER BY cents DESC, c.c_custkey
          |LIMIT 20 OFFSET 40
          |""".stripMargin),
      (s, dir) => {
        tbl(s, dir, "orders").createOrReplaceTempView("orders_pg")
        tbl(s, dir, "customer").createOrReplaceTempView("customer_pg")
        s.sql(
          """SELECT c.c_custkey, c.c_name,
            |  CAST(sum(CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT))
            |    AS BIGINT) AS cents
            |FROM orders_pg o JOIN customer_pg c
            |  ON c.c_custkey = o.o_custkey
            |GROUP BY 1, 2 ORDER BY cents DESC, c.c_custkey
            |LIMIT 20 OFFSET 40
            |""".stripMargin)
      }),

    // NATURAL JOIN + SELECT * EXCEPT: the customer dimension enriched
    // through nation→region by shared key names, with the join keys
    // star-pruned from the output — the "denormalize and drop the
    // plumbing" projection. Spark resolves NATURAL JOIN to the common
    // columns at analysis; both small sides broadcast. The oracle
    // spells the explicit equi-join and column list.
    Q("sql_natural_except",
      Some(
        """SELECT c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment,
          |  n.n_name AS nation_name, r.r_name AS region_name
          |FROM customer c
          |JOIN nation n ON n.n_nationkey = c.c_nationkey
          |JOIN region r ON r.r_regionkey = n.n_regionkey
          |ORDER BY c.c_custkey
          |""".stripMargin),
      (s, dir) => {
        tbl(s, dir, "customer").createOrReplaceTempView("customer_nj")
        tbl(s, dir, "nation").createOrReplaceTempView("nation_nj")
        tbl(s, dir, "region").createOrReplaceTempView("region_nj")
        s.sql(
          """SELECT * EXCEPT (nationkey, regionkey)
            |FROM (SELECT c_nationkey AS nationkey, c_custkey, c_name,
            |        c_acctbal, c_mktsegment FROM customer_nj)
            |NATURAL JOIN (SELECT n_nationkey AS nationkey,
            |        n_regionkey AS regionkey, n_name AS nation_name
            |      FROM nation_nj)
            |NATURAL JOIN (SELECT r_regionkey AS regionkey,
            |        r_name AS region_name FROM region_nj)
            |ORDER BY c_custkey
            |""".stripMargin)
      })
  )
}
