package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Ninety-sixth wave: the Spark 4 SQL procedural surface — session
  * variables (DECLARE / SET VAR feeding a later statement), dynamic SQL
  * via EXECUTE IMMEDIATE with USING parameters, a BEGIN…END WHILE
  * script computing an exact integer square root (float seed, integer
  * correction loop — the isqrt contract holds by construction), and a
  * FOR-loop fold compounding yearly growth in micro integers, matched
  * by a recursive-CTE oracle running the identical sequential chain.
  *
  * These are control-flow features a migrating SQL-warehouse user
  * types daily; each is carried by a data-driven computation whose
  * result the oracle pins exactly, so the scripts are verified, not
  * just parsed. Scripting statements run on the driver; every
  * statement body is still a distributed query.
  */
object ScriptingOpsQueries extends QueryModule {

  private def withScripting[T](s: org.apache.spark.sql.SparkSession)(
      f: => T): T = {
    val old = s.conf.getOption("spark.sql.scripting.enabled")
    s.conf.set("spark.sql.scripting.enabled", "true")
    try f finally old match {
      case Some(v) => s.conf.set("spark.sql.scripting.enabled", v)
      case None => s.conf.unset("spark.sql.scripting.enabled")
    }
  }

  def all: Seq[Q] = Seq(

    // Session variables: the p95 order value (exact discrete
    // percentile) lands in a DECLAREd variable, and a second statement
    // filters on it — the "compute threshold once, reuse everywhere"
    // warehouse idiom. The oracle inlines the same percentile as a
    // scalar subquery; both must agree to the cent.
    Q("sql_session_variables",
      Some(
        """WITH h AS (SELECT CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)
          |    AS v FROM orders),
          |c AS (SELECT v, CAST(count(*) AS BIGINT) AS n,
          |  CAST(coalesce(sum(count(*)) OVER (ORDER BY v
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |    AS BIGINT) AS bef,
          |  CAST(sum(count(*)) OVER () AS BIGINT) AS nn
          |  FROM h GROUP BY v),
          |thr AS (SELECT min(v) AS t FROM c
          |  WHERE bef < (95*nn + 99)//100 AND (95*nn + 99)//100 <= bef + n)
          |SELECT o.o_orderpriority AS priority,
          |  CAST(count(*) AS BIGINT) AS n_above,
          |  CAST(sum(CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents_above
          |FROM orders o, thr
          |WHERE CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT) >= thr.t
          |GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        tbl(s, dir, "orders").createOrReplaceTempView("orders_sv")
        s.sql("DECLARE OR REPLACE VARIABLE graft_p95_thr BIGINT DEFAULT 0")
        s.sql(
          """SET VAR graft_p95_thr = (
            |  WITH h AS (SELECT CAST(floor(o_totalprice*100 + 0.5)
            |      AS BIGINT) AS v FROM orders_sv),
            |  c AS (SELECT v, CAST(count(*) AS BIGINT) AS n,
            |    CAST(coalesce(sum(count(*)) OVER (ORDER BY v
            |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            |      AS BIGINT) AS bef,
            |    CAST(sum(count(*)) OVER () AS BIGINT) AS nn
            |    FROM h GROUP BY v)
            |  SELECT min(v) FROM c
            |  WHERE bef < (95*nn + 99) div 100
            |    AND (95*nn + 99) div 100 <= bef + n)
            |""".stripMargin)
        s.sql(
          """SELECT o_orderpriority AS priority,
            |  CAST(count(*) AS BIGINT) AS n_above,
            |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
            |    AS BIGINT) AS cents_above
            |FROM orders_sv
            |WHERE CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)
            |  >= graft_p95_thr
            |GROUP BY 1 ORDER BY 1
            |""".stripMargin)
      }),

    // EXECUTE IMMEDIATE with positional USING parameters: the per-year
    // segment report template instantiated for 1997 — dynamic SQL as a
    // first-class statement (the safe, parameterized replacement for
    // string-spliced report generators). Oracle = the statically
    // written query.
    Q("sql_execute_immediate",
      Some(
        """SELECT c.c_mktsegment AS segment,
          |  CAST(count(*) AS BIGINT) AS n_orders,
          |  CAST(sum(CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents
          |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          |WHERE year(o.o_orderdate) = 1997
          |GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        tbl(s, dir, "orders").createOrReplaceTempView("orders_ei")
        tbl(s, dir, "customer").createOrReplaceTempView("customer_ei")
        s.sql(
          """EXECUTE IMMEDIATE
            |  'SELECT c.c_mktsegment AS segment,
            |     CAST(count(*) AS BIGINT) AS n_orders,
            |     CAST(sum(CAST(floor(o.o_totalprice*100 + 0.5)
            |       AS BIGINT)) AS BIGINT) AS cents
            |   FROM orders_ei o JOIN customer_ei c
            |     ON c.c_custkey = o.o_custkey
            |   WHERE year(o.o_orderdate) = ?
            |   GROUP BY 1 ORDER BY 1'
            |  USING 1997
            |""".stripMargin)
      }),

    // BEGIN…END WHILE script: exact integer square root of the total
    // revenue in cents — float-sqrt seed, then WHILE correction loops
    // enforce s² ≤ n < (s+1)² EXACTLY (the loops run 0–2 iterations;
    // the contract holds no matter how the double seed rounded). The
    // oracle states the same isqrt via bounded CASE corrections.
    // Script control flow is driver-side; the revenue aggregate is the
    // distributed part.
    Q("sql_scripting_isqrt",
      Some(
        """WITH t AS (SELECT CAST(sum(CAST(floor(o_totalprice*100 + 0.5)
          |    AS BIGINT)) AS BIGINT) AS n FROM orders),
          |s0 AS (SELECT n, CAST(floor(sqrt(CAST(n AS DOUBLE)))
          |    AS BIGINT) AS s FROM t),
          |s1 AS (SELECT n, CASE WHEN (s+1)*(s+1) <= n THEN s+1
          |    ELSE s END AS s FROM s0),
          |s2 AS (SELECT n, CASE WHEN (s+1)*(s+1) <= n THEN s+1
          |    ELSE s END AS s FROM s1),
          |s3 AS (SELECT n, CASE WHEN s*s > n THEN s-1 ELSE s END AS s
          |  FROM s2),
          |s4 AS (SELECT n, CASE WHEN s*s > n THEN s-1 ELSE s END AS s
          |  FROM s3)
          |SELECT n AS revenue_cents, s AS isqrt,
          |  CAST(CASE WHEN s*s <= n AND n < (s+1)*(s+1) THEN 1 ELSE 0
          |    END AS BIGINT) AS contract_ok
          |FROM s4
          |""".stripMargin),
      (s, dir) => withScripting(s) {
        tbl(s, dir, "orders").createOrReplaceTempView("orders_sq2")
        s.sql(
          """BEGIN
            |  DECLARE n BIGINT DEFAULT 0;
            |  DECLARE sq BIGINT DEFAULT 0;
            |  SET n = (SELECT CAST(sum(CAST(floor(o_totalprice*100
            |    + 0.5) AS BIGINT)) AS BIGINT) FROM orders_sq2);
            |  SET sq = CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT);
            |  WHILE (sq + 1) * (sq + 1) <= n DO
            |    SET sq = sq + 1;
            |  END WHILE;
            |  WHILE sq * sq > n DO
            |    SET sq = sq - 1;
            |  END WHILE;
            |  SELECT n AS revenue_cents, sq AS isqrt,
            |    CAST(CASE WHEN sq*sq <= n AND n < (sq+1)*(sq+1)
            |      THEN 1 ELSE 0 END AS BIGINT) AS contract_ok;
            |END
            |""".stripMargin)
      }),

    // FOR-loop fold: an index compounding each year's revenue growth
    // sequentially in micro integers — acc ← acc·(1e6+g) div 1e6 — the
    // order-dependent chain a window product can't express exactly.
    // The oracle replays the IDENTICAL chain with a recursive CTE, so
    // the script's iteration order is pinned, not assumed. Growth
    // factors come from one scan + a lag on the bounded year frame.
    Q("sql_scripting_fold",
      Some(
        """WITH y AS (SELECT year(o_orderdate) AS yr,
          |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS rev FROM orders GROUP BY 1),
          |g AS (SELECT yr, rev,
          |  CAST(row_number() OVER (ORDER BY yr) AS BIGINT) AS i,
          |  CAST(CAST(rev AS HUGEINT) * 1000000
          |    // lag(rev) OVER (ORDER BY yr) - 1000000 AS BIGINT) AS gm
          |  FROM y),
          |k AS (SELECT CAST(count(*) AS BIGINT) AS steps FROM g
          |  WHERE gm IS NOT NULL),
          |rc AS (
          |  WITH RECURSIVE r(i, acc) AS (
          |    SELECT CAST(1 AS BIGINT), CAST(1000000 AS BIGINT)
          |    UNION ALL
          |    SELECT r.i + 1, r.acc * (1000000 + g.gm) // 1000000
          |    FROM r JOIN g ON g.i = r.i + 1)
          |  SELECT max(i) AS last_i,
          |    max_by(acc, i) AS index_micro FROM r)
          |SELECT k.steps AS n_growth_years, rc.index_micro
          |FROM k, rc
          |""".stripMargin),
      (s, dir) => withScripting(s) {
        tbl(s, dir, "orders").createOrReplaceTempView("orders_fold")
        s.sql(
          """BEGIN
            |  DECLARE acc BIGINT DEFAULT 1000000;
            |  DECLARE steps BIGINT DEFAULT 0;
            |  FOR r AS (
            |    WITH y AS (SELECT year(o_orderdate) AS yr,
            |      CAST(sum(CAST(floor(o_totalprice*100 + 0.5)
            |        AS BIGINT)) AS BIGINT) AS rev
            |      FROM orders_fold GROUP BY 1)
            |    SELECT gm FROM (SELECT yr,
            |      CAST(CAST(rev AS DECIMAL(38,0)) * 1000000
            |        div lag(rev) OVER (ORDER BY yr) - 1000000
            |        AS BIGINT) AS gm FROM y)
            |    WHERE gm IS NOT NULL ORDER BY yr) DO
            |    SET acc = acc * (1000000 + r.gm) div 1000000;
            |    SET steps = steps + 1;
            |  END FOR;
            |  SELECT steps AS n_growth_years, acc AS index_micro;
            |END
            |""".stripMargin)
      })
  )
}
