package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Hundred-nineteenth wave: proportion effect size, impossibility
  * audits, and mix stability — Cohen's h for the year-over-year return
  * rate (the arcsine effect size that stays honest near 0% and 100%),
  * an impossible-values census across the fact tables (negative money,
  * zero quantities, out-of-range discounts, future dates — each rule
  * an exact count), and quarterly segment-share swing (is the revenue
  * mix stable enough for per-segment planning?).
  *
  * Exactness: h is one asin chain over exact proportions; every audit
  * rule is an integer count from one scan per table; shares ride
  * integer bps with max-minus-min swings.
  */
object CohensHOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Cohen's h for the 1996 → 1997 return-rate move: h = 2·asin√p₁ −
    // 2·asin√p₂ — unlike the raw difference, comparable across base
    // rates. Pairs with wave 90's z-test: z says "real?", h says "big
    // enough to care?".
    Q("stats_cohens_h",
      Some(
        """WITH y AS (SELECT year(l_shipdate) AS yr,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
          |    AS BIGINT) AS x
          |  FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)
          |  GROUP BY 1),
          |p AS (SELECT
          |  max(CASE WHEN yr = 1996 THEN n END) AS n1,
          |  max(CASE WHEN yr = 1996 THEN x END) AS x1,
          |  max(CASE WHEN yr = 1997 THEN n END) AS n2,
          |  max(CASE WHEN yr = 1997 THEN x END) AS x2 FROM y)
          |SELECT n1, x1, n2, x2,
          |  CAST(floor((2.0 * asin(sqrt(CAST(x1 AS DOUBLE)
          |      / CAST(n1 AS DOUBLE)))
          |    - 2.0 * asin(sqrt(CAST(x2 AS DOUBLE)
          |      / CAST(n2 AS DOUBLE)))) * 1000000.0) AS BIGINT)
          |    AS cohens_h_micro
          |FROM p
          |""".stripMargin),
      (s, dir) => {
        val y = tbl(s, dir, "lineitem")
          .filter(year(col("l_shipdate")).isin(1996, 1997))
          .groupBy(year(col("l_shipdate")).as("yr"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
              .cast("long").as("x"))
        val p = y.agg(
          max(when(col("yr") === 1996, col("n"))).as("n1"),
          max(when(col("yr") === 1996, col("x"))).as("x1"),
          max(when(col("yr") === 1997, col("n"))).as("n2"),
          max(when(col("yr") === 1997, col("x"))).as("x2"))
        p.select(col("n1"), col("x1"), col("n2"), col("x2"),
          floor((lit(2.0d) * asin(sqrt(col("x1").cast("double") /
            col("n1").cast("double"))) -
            lit(2.0d) * asin(sqrt(col("x2").cast("double") /
              col("n2").cast("double")))) * 1000000.0d).cast("long")
            .as("cohens_h_micro"))
      }),

    // Impossible-values census: rules that should NEVER fire —
    // negative or zero money, zero/negative quantities, discounts
    // outside [0, 0.5], taxes outside [0, 0.2], ship dates before the
    // order date or after the corpus horizon. Each rule one exact
    // count from a single scan per table; any non-zero row is an
    // upstream bug with a name.
    Q("dq_impossible_values",
      Some(
        """WITH l AS (SELECT
          |  CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS bad_price,
          |  CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS bad_qty,
          |  CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5
          |    THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
          |  CAST(sum(CASE WHEN l_tax < 0 OR l_tax > 0.2 THEN 1 ELSE 0
          |    END) AS BIGINT) AS bad_tax,
          |  CAST(sum(CASE WHEN l_shipdate > TIMESTAMP '2002-01-01'
          |    THEN 1 ELSE 0 END) AS BIGINT) AS future_ship
          |  FROM lineitem),
          |o AS (SELECT
          |  CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS bad_total FROM orders),
          |je AS (SELECT CAST(count(*) AS BIGINT) AS ship_before_order
          |  FROM lineitem li JOIN orders oo
          |    ON oo.o_orderkey = li.l_orderkey
          |  WHERE li.l_shipdate < oo.o_orderdate)
          |SELECT rule, n FROM (
          |  SELECT 'a_price_nonpositive' AS rule, bad_price AS n FROM l
          |  UNION ALL SELECT 'b_qty_nonpositive', bad_qty FROM l
          |  UNION ALL SELECT 'c_discount_range', bad_discount FROM l
          |  UNION ALL SELECT 'd_tax_range', bad_tax FROM l
          |  UNION ALL SELECT 'e_future_ship', future_ship FROM l
          |  UNION ALL SELECT 'f_total_nonpositive', bad_total FROM o
          |  UNION ALL SELECT 'g_ship_before_order', ship_before_order
          |  FROM je) ORDER BY rule
          |""".stripMargin),
      (s, dir) => {
        val l = tbl(s, dir, "lineitem").agg(
          sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L))
            .cast("long").as("bad_price"),
          sum(when(col("l_quantity") <= 0, 1L).otherwise(0L))
            .cast("long").as("bad_qty"),
          sum(when(col("l_discount") < 0 || col("l_discount") > 0.5,
            1L).otherwise(0L)).cast("long").as("bad_discount"),
          sum(when(col("l_tax") < 0 || col("l_tax") > 0.2, 1L)
            .otherwise(0L)).cast("long").as("bad_tax"),
          sum(when(col("l_shipdate") >
            to_timestamp(lit("2002-01-01 00:00:00")), 1L).otherwise(0L))
            .cast("long").as("future_ship"))
        val o = tbl(s, dir, "orders").agg(
          sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L))
            .cast("long").as("bad_total"))
        val je = tbl(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
          .join(tbl(s, dir, "orders")
              .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") < col("o_orderdate"))
          .agg(count(lit(1)).cast("long").as("ship_before_order"))
        def row(name: String, src: org.apache.spark.sql.DataFrame,
            c: String) =
          src.select(lit(name).as("rule"), col(c).as("n"))
        row("a_price_nonpositive", l, "bad_price")
          .unionByName(row("b_qty_nonpositive", l, "bad_qty"))
          .unionByName(row("c_discount_range", l, "bad_discount"))
          .unionByName(row("d_tax_range", l, "bad_tax"))
          .unionByName(row("e_future_ship", l, "future_ship"))
          .unionByName(row("f_total_nonpositive", o, "bad_total"))
          .unionByName(row("g_ship_before_order", je,
            "ship_before_order"))
          .orderBy("rule")
      }),

    // Quarterly segment-share swing: each segment's revenue share in
    // bps per quarter, and per segment the max-minus-min swing across
    // the horizon — stable mix (low swing) justifies per-segment
    // capacity plans; volatile mix says plan at the total. Bounded
    // (quarter × segment) frame after one scan.
    Q("orders_segment_share_swing",
      Some(
        """WITH q AS (SELECT c.c_mktsegment AS seg,
          |  year(o.o_orderdate)*4 + (month(o.o_orderdate)-1)//3 AS qt,
          |  CAST(sum(CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents
          |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          |  GROUP BY 1, 2),
          |t AS (SELECT qt, CAST(sum(cents) AS BIGINT) AS tot FROM q
          |  GROUP BY 1),
          |sh AS (SELECT q.seg, q.qt,
          |  q.cents * 10000 // t.tot AS bps
          |  FROM q JOIN t ON t.qt = q.qt)
          |SELECT seg AS segment,
          |  CAST(count(*) AS BIGINT) AS n_quarters,
          |  CAST(min(bps) AS BIGINT) AS min_share_bps,
          |  CAST(max(bps) AS BIGINT) AS max_share_bps,
          |  CAST(max(bps) - min(bps) AS BIGINT) AS swing_bps
          |FROM sh GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val q = tbl(s, dir, "orders")
          .select(col("o_custkey"),
            (year(col("o_orderdate")) * 4 +
              expr("(month(o_orderdate)-1) div 3")).as("qt"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
              .as("cents"))
          .join(broadcast(tbl(s, dir, "customer")
              .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy("seg", "qt")
          .agg(sum(col("cents")).cast("long").as("cents"))
        val t = q.groupBy("qt")
          .agg(sum(col("cents")).cast("long").as("tot"))
        q.join(broadcast(t), Seq("qt"))
          .select(col("seg"), col("qt"),
            expr("cents * 10000 div tot").as("bps"))
          .groupBy(col("seg").as("segment"))
          .agg(count(lit(1)).cast("long").as("n_quarters"),
            min(col("bps")).cast("long").as("min_share_bps"),
            max(col("bps")).cast("long").as("max_share_bps"),
            (max(col("bps")) - min(col("bps"))).cast("long")
              .as("swing_bps"))
          .orderBy("segment")
      })
  )
}
