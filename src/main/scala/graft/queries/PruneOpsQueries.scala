package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Sixteenth wave: pruning/segmentation ops — zone-map skip planning (the
  * file-skipping calculus a 100 TB lakehouse scan lives on), Pareto/ABC
  * inventory classification, and RFM customer segmentation with
  * distribution-derived (not globally-ranked) quintile boundaries.
  *
  * Determinism: zone maps and skip decisions are pure date/integer
  * compares; ABC cumulative shares compare DECIMAL·smallint products
  * (never a float threshold); RFM boundaries come from exact cumulative
  * counts over each metric's value distribution.
  */
object PruneOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // ZONE-MAP SKIP PLANNING: build the per-partition (ship month)
    // min/max zone-map table, then for three scan predicates report how
    // many partitions a zone-map-aware reader opens vs skips and the row
    // bound it scans. This is the planning half of layout_range_sorted's
    // physical demonstration: the zone-map build is one map-side-combined
    // pass, and each predicate's decision joins the predicate list
    // (3 rows, broadcast) against the |partitions| domain — the plan the
    // engine would execute at 100 TB where partitions number ~10⁵ and the
    // zone-map table still fits an executor.
    Q("layout_zonemap_prune",
      Some(
        """WITH zm AS (
          |  SELECT strftime(l_shipdate, '%Y-%m') AS part,
          |         min(l_shipdate) AS lo, max(l_shipdate) AS hi,
          |         CAST(count(*) AS BIGINT) AS n_rows
          |  FROM lineitem GROUP BY 1),
          |preds AS (
          |  SELECT * FROM (VALUES
          |    ('q_3mo', TIMESTAMP '1995-03-01', TIMESTAMP '1995-06-01'),
          |    ('q_1yr', TIMESTAMP '1996-01-01', TIMESTAMP '1997-01-01'),
          |    ('q_all', TIMESTAMP '1990-01-01', TIMESTAMP '2000-01-01'))
          |    AS t(pred, p_lo, p_hi)),
          |dec AS (
          |  SELECT p.pred, z.part, z.n_rows,
          |         CASE WHEN z.hi >= p.p_lo AND z.lo < p.p_hi
          |              THEN 1 ELSE 0 END AS must_read
          |  FROM preds p, zm z)
          |SELECT pred,
          |  CAST(count(*) AS BIGINT) AS parts_total,
          |  CAST(sum(must_read) AS BIGINT) AS parts_read,
          |  CAST(count(*) - sum(must_read) AS BIGINT) AS parts_skipped,
          |  CAST(sum(CASE WHEN must_read = 1 THEN n_rows ELSE 0 END)
          |    AS BIGINT) AS rows_scan_bound,
          |  CAST(sum(must_read) AS DOUBLE) / count(*) AS read_fraction
          |FROM dec GROUP BY pred ORDER BY pred""".stripMargin),
      (s, dir) => {
        val zm = tbl(s, dir, "lineitem")
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("part"))
          .agg(min("l_shipdate").as("lo"), max("l_shipdate").as("hi"),
            count(lit(1)).as("n_rows"))
        val preds = s.createDataFrame(Seq(
            ("q_3mo", "1995-03-01", "1995-06-01"),
            ("q_1yr", "1996-01-01", "1997-01-01"),
            ("q_all", "1990-01-01", "2000-01-01")))
          .toDF("pred", "p_lo", "p_hi")
          .select(col("pred"), col("p_lo").cast("timestamp"),
            col("p_hi").cast("timestamp"))
        val dec = zm.crossJoin(broadcast(preds))
          .select(col("pred"), col("n_rows"),
            when(col("hi") >= col("p_lo") && col("lo") < col("p_hi"), 1)
              .otherwise(0).as("must_read"))
        dec.groupBy("pred")
          .agg(count(lit(1)).as("parts_total"),
            sum("must_read").cast("long").as("parts_read"),
            (count(lit(1)) - sum("must_read")).cast("long")
              .as("parts_skipped"),
            sum(when(col("must_read") === 1, col("n_rows")).otherwise(0L))
              .cast("long").as("rows_scan_bound"),
            (sum("must_read").cast("double") / count(lit(1)))
              .as("read_fraction"))
          .orderBy("pred")
      }),

    // PARETO / ABC CLASSIFICATION: parts ranked by revenue; class A holds
    // the top ~80% of revenue, B the next ~15%, C the tail — the
    // inventory-policy split every supply-chain report starts from. The
    // revenue reduce is one map-side-combined pass; the cumulative share
    // runs over the |parts| domain ordered by (revenue desc, partkey),
    // and the class thresholds compare DECIMAL·smallint products (cum·5
    // vs tot·4, cum·20 vs tot·19) so no float threshold ever decides a
    // boundary row differently across engines.
    Q("agg_pareto_abc",
      Some(
        """WITH r AS (
          |  SELECT l_partkey AS part, CAST(sum(CAST(l_extendedprice
          |    AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS rev
          |  FROM lineitem GROUP BY 1),
          |c AS (
          |  SELECT part, rev,
          |    CAST(sum(rev) OVER (ORDER BY rev DESC, part)
          |      AS DECIMAL(18,2)) AS cum,
          |    CAST(sum(rev) OVER () AS DECIMAL(18,2)) AS tot
          |  FROM r),
          |k AS (
          |  SELECT part, rev,
          |    CASE WHEN cum * 5 <= tot * 4 THEN 'A'
          |         WHEN cum * 20 <= tot * 19 THEN 'B'
          |         ELSE 'C' END AS abc
          |  FROM c)
          |SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
          |  CAST(sum(rev) AS DOUBLE) AS revenue,
          |  CAST(sum(rev) AS DOUBLE) / CAST(max(t.tot) AS DOUBLE)
          |    AS revenue_share
          |FROM k, (SELECT CAST(sum(rev) AS DECIMAL(18,2)) AS tot FROM r) t
          |GROUP BY abc ORDER BY abc""".stripMargin),
      (s, dir) => {
        // the cumulative revenue share runs as the two-phase PARALLEL
        // prefix sum (H.globalCumSum; exact decimal addition is
        // associative, so the partition-offset split is value-identical
        // to the oracle's single window) — the |parts| domain is
        // unbounded at 100 TB, so a global `sum OVER (ORDER BY rev)`
        // would sort it in ONE task (r9 window-discipline sweep catch);
        // the grand total attaches as a 1-row broadcast, not a window.
        val r = tbl(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("part"))
          .agg(sum(H.dec2(col("l_extendedprice")))
            .cast("decimal(18,2)").as("rev"))
        val (cs, pp) = H.globalCumSum(r,
          Seq(col("rev").desc, col("part")), col("rev"), "cum0")
        val tot = pp.agg(sum("rev").cast("decimal(18,2)").as("tot"))
        val k = cs.crossJoin(broadcast(tot))
          .select(col("part"), col("rev"), col("tot"),
            when(col("cum0").cast("decimal(18,2)") * 5 <= col("tot") * 4, "A")
              .when(col("cum0").cast("decimal(18,2)") * 20 <= col("tot") * 19,
                "B")
              .otherwise("C").as("abc"))
        val out = k
          .groupBy("abc")
          .agg(count(lit(1)).as("n_parts"),
            sum("rev").cast("double").as("revenue"),
            (sum("rev").cast("double") / max("tot").cast("double"))
              .as("revenue_share"))
          .orderBy("abc")
        H.materialized(out, caches = Nil, checkpoints = Seq(pp))
      }),

    // RFM SEGMENTATION: customers scored 1-5 on Recency (days since last
    // order), Frequency (order count), Monetary (total spend). The
    // quintile BOUNDARIES come from each metric's cumulative distribution
    // (smallest value whose cumulative customer count reaches k/5 of the
    // total — the same exact calculus as agg_weighted_percentile), and
    // every customer then scores by comparing against 4 broadcast
    // boundary values — NOT by a global ntile rank, which would shuffle
    // every customer into one ordered partition and is exactly the
    // anti-pattern this query exists to avoid at scale. Output: the
    // segment grid with sizes and exact DECIMAL-summed spend.
    Q("orders_rfm_segments",
      Some(
        """WITH anchor AS (SELECT max(o_orderdate) AS mx FROM orders),
          |cust AS (
          |  SELECT o_custkey AS cust,
          |    CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
          |      CAST(max(mx) AS DATE)) AS BIGINT) AS rec,
          |    CAST(count(*) AS BIGINT) AS freq,
          |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
          |      AS DECIMAL(18,2)) AS mon
          |  FROM orders, anchor GROUP BY 1),
          |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cust),
          |ks AS (SELECT unnest([1, 2, 3, 4]) AS k),
          |rcum AS (SELECT rec AS v, sum(count(*))
          |           OVER (ORDER BY rec) AS cumc FROM cust GROUP BY rec),
          |rb AS (SELECT k, min(v) AS b FROM rcum, ks, n
          |       WHERE cumc * 5 >= k * n GROUP BY k),
          |fcum AS (SELECT freq AS v, sum(count(*))
          |           OVER (ORDER BY freq) AS cumc FROM cust GROUP BY freq),
          |fb AS (SELECT k, min(v) AS b FROM fcum, ks, n
          |       WHERE cumc * 5 >= k * n GROUP BY k),
          |mcum AS (SELECT mon AS v, sum(count(*))
          |           OVER (ORDER BY mon) AS cumc FROM cust GROUP BY mon),
          |mb AS (SELECT k, min(v) AS b FROM mcum, ks, n
          |       WHERE cumc * 5 >= k * n GROUP BY k),
          |sc AS (
          |  SELECT mon,
          |    -- recency inverts: low days-since-last-order = best = 5
          |    CAST(5 - (SELECT count(*) FROM rb WHERE cust.rec > rb.b)
          |      AS BIGINT) AS r_score,
          |    CAST(1 + (SELECT count(*) FROM fb WHERE cust.freq > fb.b)
          |      AS BIGINT) AS f_score,
          |    CAST(1 + (SELECT count(*) FROM mb WHERE cust.mon > mb.b)
          |      AS BIGINT) AS m_score
          |  FROM cust)
          |SELECT r_score, f_score, m_score,
          |  CAST(count(*) AS BIGINT) AS n_customers,
          |  CAST(sum(mon) AS DOUBLE) AS total_spend
          |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
      (s, dir) => {
        val orders = tbl(s, dir, "orders")
        val anchor = orders.agg(max("o_orderdate").as("mx"))
        val cust = orders.crossJoin(broadcast(anchor))
          .groupBy(col("o_custkey").as("cust"))
          .agg(
            datediff(max(col("mx")).cast("date"),
              max("o_orderdate").cast("date")).cast("long").as("rec"),
            count(lit(1)).as("freq"),
            sum(H.dec2(col("o_totalprice"))).cast("decimal(18,2)").as("mon"))

        // exact quintile boundaries from each metric's value distribution:
        // smallest v with cumCount(v)·5 >= k·n, k = 1..4
        def bounds(metric: String) = {
          val d = cust.groupBy(col(metric).as("v"))
            .agg(count(lit(1)).as("c"))
          val cum = d.withColumn("cumc", sum("c").over(Window.orderBy("v")))
            .crossJoin(broadcast(cust.agg(count(lit(1)).as("n"))))
          val ks = s.createDataFrame(Seq(Tuple1(1), Tuple1(2), Tuple1(3),
            Tuple1(4))).toDF("k")
          cum.crossJoin(broadcast(ks))
            .filter(col("cumc") * 5 >= col("k") * col("n"))
            .groupBy("k").agg(min("v").as("b"))
            .agg(collect_list(struct(col("k"), col("b"))).as("bs"))
            .select(expr(
              "transform(array_sort(bs, (x, y) -> CASE WHEN x.k < y.k " +
                "THEN -1 WHEN x.k > y.k THEN 1 ELSE 0 END), p -> p.b)")
              .as("bounds"))
        }
        // score = 1 + |boundaries the value exceeds|; recency inverts
        // (low days-since-last-order is the BEST bucket → 5)
        val scored = cust
          .crossJoin(broadcast(bounds("rec").withColumnRenamed("bounds", "rb")))
          .crossJoin(broadcast(bounds("freq").withColumnRenamed("bounds", "fb")))
          .crossJoin(broadcast(bounds("mon").withColumnRenamed("bounds", "mb")))
          .select(col("mon"),
            (lit(6) - (lit(1) + expr(
              "size(filter(rb, b -> rec > b))"))).cast("long").as("r_score"),
            (lit(1) + expr("size(filter(fb, b -> freq > b))")).cast("long")
              .as("f_score"),
            (lit(1) + expr("size(filter(mb, b -> mon > b))")).cast("long")
              .as("m_score"))
        scored.groupBy("r_score", "f_score", "m_score")
          .agg(count(lit(1)).as("n_customers"),
            sum("mon").cast("double").as("total_spend"))
          .orderBy("r_score", "f_score", "m_score")
      })
  )
}
