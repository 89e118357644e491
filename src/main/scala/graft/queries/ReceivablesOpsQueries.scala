package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Eighty-sixth wave: the receivables / fulfillment-operations battery —
  * an accounts-receivable aging report over open orders, a monthly
  * backlog burndown via interval delta-counting, the order-to-ship lag
  * distribution with exact discrete percentiles, and a split-shipment
  * profile. The order-to-cash reporting surface every ERP pipeline runs
  * nightly (the reference's domain is exactly such an ERP).
  *
  * Exactness contract (same as waves 81-85): money in BIGINT cents via
  * `floor(x*100 + 0.5)`, day arithmetic from midnight-aligned timestamp
  * columns (datediff == date_diff for these), weighted averages as
  * integer `div` on non-negative operands (Spark `div` truncates toward
  * zero, DuckDB `//` floors — identical on non-negatives), percentiles
  * as discrete order statistics from a value-count histogram (smallest
  * value whose cumulative count reaches k = ceil(p·N/100), written as
  * `(p*N + 99) div 100` in both engines). Sums that could exceed BIGINT
  * at a 100× scale-up accumulate in DECIMAL(38,0)/HUGEINT before the
  * final bounded division.
  */
object ReceivablesOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Accounts-receivable aging: open orders ('O' and partially-filled
    // 'P'), aged against the corpus as-of date (max order date — a
    // deterministic, data-derived "today"), bucketed 0-30 / 31-60 /
    // 61-90 / 91-180 / 180+ days. Per (status, bucket): order count,
    // open cents, and the cents-weighted average age in days. The fact
    // scan reduces to one keyed aggregation after a broadcast of the
    // one-row as-of scalar; the output frame is ≤10 rows at any SF.
    Q("orders_ar_aging",
      Some(
        """WITH ao AS (SELECT max(o_orderdate) AS ad FROM orders),
          |b AS (SELECT o.o_orderstatus AS status,
          |  date_diff('day', o.o_orderdate, ao.ad) AS age,
          |  CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT) AS cents
          |  FROM orders o, ao WHERE o.o_orderstatus IN ('O', 'P')),
          |k AS (SELECT status,
          |  CASE WHEN age <= 30 THEN 'a_0_30'
          |       WHEN age <= 60 THEN 'b_31_60'
          |       WHEN age <= 90 THEN 'c_61_90'
          |       WHEN age <= 180 THEN 'd_91_180'
          |       ELSE 'e_over_180' END AS bucket, age, cents FROM b)
          |SELECT status, bucket, CAST(count(*) AS BIGINT) AS n_orders,
          |  CAST(sum(cents) AS BIGINT) AS open_cents,
          |  CAST(sum(CAST(age AS HUGEINT) * cents) // sum(CAST(cents AS
          |    HUGEINT)) AS BIGINT) AS wavg_age_days
          |FROM k GROUP BY 1, 2 ORDER BY 1, 2
          |""".stripMargin),
      (s, dir) => {
        val o = tbl(s, dir, "orders")
          .select(col("o_orderstatus").as("status"), col("o_orderdate"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
              .as("cents"))
          .filter(col("status").isin("O", "P"))
        val asof = tbl(s, dir, "orders")
          .agg(max(col("o_orderdate")).as("ad"))
        o.crossJoin(broadcast(asof))
          .withColumn("age", datediff(col("ad"), col("o_orderdate")))
          .withColumn("bucket",
            when(col("age") <= 30, "a_0_30")
              .when(col("age") <= 60, "b_31_60")
              .when(col("age") <= 90, "c_61_90")
              .when(col("age") <= 180, "d_91_180")
              .otherwise("e_over_180"))
          .groupBy("status", "bucket")
          .agg(count(lit(1)).cast("long").as("n_orders"),
            sum(col("cents")).cast("long").as("open_cents"),
            floor(sum((col("age") * col("cents")).cast("decimal(38,0)"))
              .cast("decimal(38,0)") /
              sum(col("cents").cast("decimal(38,0)")))
              .cast("long").as("wavg_age_days"))
          .orderBy("status", "bucket")
      }),

    // Monthly backlog burndown: an order enters the backlog in its
    // order month and (when finished, status 'F') leaves the month
    // AFTER its last lineitem ships; 'O'/'P' orders never close inside
    // the horizon. Implemented as interval delta-counting — +1/+cents
    // at the open month, −1/−cents at the close month — cumulated over
    // the bounded month spine (≤ ~80 rows at any SF), so the fact scan
    // is two keyed aggregations and the window never sees raw rows.
    Q("orders_backlog_burndown",
      Some(
        """WITH o AS (SELECT o_orderkey,
          |  year(o_orderdate)*12 + month(o_orderdate) - 1 AS ym,
          |  CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents,
          |  o_orderstatus AS st FROM orders),
          |cl AS (SELECT o.o_orderkey,
          |  year(x.ms)*12 + month(x.ms) AS ymc, o.cents
          |  FROM o JOIN (SELECT l_orderkey, max(l_shipdate) AS ms
          |    FROM lineitem GROUP BY 1) x ON x.l_orderkey = o.o_orderkey
          |  WHERE o.st = 'F'),
          |d AS (SELECT ym, CAST(count(*) AS BIGINT) AS dn,
          |    CAST(sum(cents) AS BIGINT) AS dc FROM o GROUP BY 1
          |  UNION ALL SELECT ymc AS ym, -CAST(count(*) AS BIGINT),
          |    -CAST(sum(cents) AS BIGINT) FROM cl GROUP BY 1),
          |m AS (SELECT ym, CAST(sum(dn) AS BIGINT) AS dn,
          |  CAST(sum(dc) AS BIGINT) AS dc FROM d GROUP BY 1)
          |SELECT CAST(ym // 12 AS BIGINT) AS yr,
          |  CAST(ym % 12 + 1 AS BIGINT) AS mon,
          |  CAST(sum(dn) OVER (ORDER BY ym
          |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog_orders,
          |  CAST(sum(dc) OVER (ORDER BY ym
          |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog_cents
          |FROM m ORDER BY 1, 2
          |""".stripMargin),
      (s, dir) => {
        val o = tbl(s, dir, "orders")
          .select(col("o_orderkey"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
              .as("ym"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
              .as("cents"),
            col("o_orderstatus").as("st"))
        val lastShip = tbl(s, dir, "lineitem")
          .groupBy(col("l_orderkey")).agg(max(col("l_shipdate")).as("ms"))
        val closes = o.filter(col("st") === "F")
          .join(lastShip, col("l_orderkey") === col("o_orderkey"))
          .select((year(col("ms")) * 12 + month(col("ms"))).as("ym"),
            col("cents"))
        val deltas = o.groupBy("ym")
          .agg(count(lit(1)).cast("long").as("dn"),
            sum(col("cents")).cast("long").as("dc"))
          .unionByName(closes.groupBy("ym")
            .agg((-count(lit(1))).cast("long").as("dn"),
              (-sum(col("cents"))).cast("long").as("dc")))
          .groupBy("ym")
          .agg(sum(col("dn")).cast("long").as("dn"),
            sum(col("dc")).cast("long").as("dc"))
        val w = Window.orderBy("ym").rowsBetween(Window.unboundedPreceding, 0)
        deltas
          .select(expr("ym div 12").cast("long").as("yr"),
            (col("ym") % 12 + 1).cast("long").as("mon"),
            sum(col("dn")).over(w).cast("long").as("backlog_orders"),
            sum(col("dc")).over(w).cast("long").as("backlog_cents"))
          .orderBy("yr", "mon")
      }),

    // Order-to-ship fulfillment lag per order priority: days from
    // order date to each lineitem's ship date, reduced to a
    // (priority, lag) value-count histogram (value-bounded: lag spans
    // a few hundred distinct days regardless of corpus size), then
    // exact discrete percentiles p50/p90/p99 as the smallest lag whose
    // cumulative count reaches ceil(p·N/100), plus the exact
    // milli-day mean. The per-priority SLA curve of the order pipeline.
    Q("orders_fulfillment_lag",
      Some(
        """WITH b AS (SELECT o.o_orderpriority AS pri,
          |  date_diff('day', o.o_orderdate, l.l_shipdate) AS lag
          |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
          |h AS (SELECT pri, lag, CAST(count(*) AS BIGINT) AS n
          |  FROM b GROUP BY 1, 2),
          |c AS (SELECT pri, lag, n,
          |  CAST(coalesce(sum(n) OVER (PARTITION BY pri ORDER BY lag
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |    AS BIGINT) AS bef,
          |  CAST(sum(n) OVER (PARTITION BY pri) AS BIGINT) AS ng,
          |  CAST(sum(n * lag) OVER (PARTITION BY pri) AS BIGINT) AS sl
          |  FROM h)
          |SELECT pri AS priority, max(ng) AS n_lines,
          |  CAST(max(sl) * 1000 // max(ng) AS BIGINT) AS mean_lag_milli,
          |  CAST(min(CASE WHEN bef < (50*ng + 99)//100
          |    AND (50*ng + 99)//100 <= bef + n THEN lag END) AS BIGINT)
          |    AS p50_days,
          |  CAST(min(CASE WHEN bef < (90*ng + 99)//100
          |    AND (90*ng + 99)//100 <= bef + n THEN lag END) AS BIGINT)
          |    AS p90_days,
          |  CAST(min(CASE WHEN bef < (99*ng + 99)//100
          |    AND (99*ng + 99)//100 <= bef + n THEN lag END) AS BIGINT)
          |    AS p99_days
          |FROM c GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val h = tbl(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
          .join(tbl(s, dir, "orders")
              .select(col("o_orderkey"), col("o_orderdate"),
                col("o_orderpriority").as("pri")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("pri"),
            datediff(col("l_shipdate"), col("o_orderdate")).as("lag"))
          .groupBy("pri", "lag").agg(count(lit(1)).cast("long").as("n"))
        val wc = Window.partitionBy("pri").orderBy("lag")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wg = Window.partitionBy("pri")
        val c = h
          .withColumn("bef", coalesce(sum(col("n")).over(wc), lit(0L))
            .cast("long"))
          .withColumn("ng", sum(col("n")).over(wg).cast("long"))
          .withColumn("sl", sum(col("n") * col("lag")).over(wg).cast("long"))
        def pct(p: Int): org.apache.spark.sql.Column =
          min(when(col("bef") < expr(s"($p*ng + 99) div 100") &&
            expr(s"($p*ng + 99) div 100") <= col("bef") + col("n"),
            col("lag"))).cast("long")
        c.groupBy(col("pri").as("priority"))
          .agg(max(col("ng")).as("n_lines"),
            expr("max(sl) * 1000 div max(ng)").cast("long")
              .as("mean_lag_milli"),
            pct(50).as("p50_days"), pct(90).as("p90_days"),
            pct(99).as("p99_days"))
          .orderBy("priority")
      }),

    // Split-shipment profile: per order, how many distinct calendar
    // months its lineitems ship across and how many days the shipping
    // window spans, histogrammed by month count. Per-order aggregation
    // is keyed on l_orderkey (map-side combinable), the histogram
    // frame is ≤ ~12 rows; mean span rides as exact milli-days. The
    // consolidation question — "how fragmented is our fulfillment?" —
    // asked of any order pipeline before batching shipments.
    Q("orders_split_shipments",
      Some(
        """WITH p AS (SELECT l_orderkey,
          |  CAST(count(DISTINCT year(l_shipdate)*12 + month(l_shipdate))
          |    AS BIGINT) AS mths,
          |  date_diff('day', min(l_shipdate), max(l_shipdate)) AS span,
          |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents
          |  FROM lineitem GROUP BY 1)
          |SELECT mths AS ship_months, CAST(count(*) AS BIGINT) AS n_orders,
          |  CAST(sum(CAST(span AS HUGEINT)) * 1000 // count(*) AS BIGINT)
          |    AS mean_span_milli_days,
          |  CAST(sum(cents) AS BIGINT) AS cents
          |FROM p GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        tbl(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"),
            floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
              .as("cents"))
          .groupBy("l_orderkey")
          .agg(countDistinct(year(col("l_shipdate")) * 12 +
              month(col("l_shipdate"))).cast("long").as("mths"),
            datediff(max(col("l_shipdate")), min(col("l_shipdate")))
              .as("span"),
            sum(col("cents")).cast("long").as("cents"))
          .groupBy(col("mths").as("ship_months"))
          .agg(count(lit(1)).cast("long").as("n_orders"),
            floor(sum(col("span").cast("decimal(38,0)")) * 1000 /
              count(lit(1))).cast("long").as("mean_span_milli_days"),
            sum(col("cents")).cast("long").as("cents"))
          .orderBy("ship_months")
      })
  )
}
