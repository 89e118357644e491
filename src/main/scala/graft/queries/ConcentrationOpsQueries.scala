package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Seventy-sixth wave: concentration and global-ordering operators —
  * a Herfindahl-Hirschman revenue-concentration index per market
  * segment (the standard antitrust/portfolio concentration measure),
  * a single-source supplier-risk screen (parts with exactly one
  * supplier and their revenue exposure), a running-distinct-count
  * series computed scalably (first-occurrence reduction before the
  * window, so the cumulative sum runs over the bounded segment×month
  * frame, never the fact table), and a two-phase global row-id
  * assignment — the scale-correct replacement for the single-partition
  * `row_number() OVER (ORDER BY …)` that dies first on a real cluster.
  */
object ConcentrationOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // HHI revenue concentration per market segment: per-customer share
    // of segment revenue in ppm (integer division — exact in both
    // engines on non-negative operands), HHI = sum of squared shares.
    // Shape: one keyed aggregation per level (orders pre-aggregated by
    // customer BEFORE the customer join, so the join input is |C|-scale
    // not |O|-scale), then a 5-row broadcast of segment totals.
    Q("orders_hhi_concentration",
      Some(
        """WITH oc AS (SELECT c.c_mktsegment AS seg, o.o_custkey AS ck,
          |  CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents
          |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          |  GROUP BY 1, 2),
          |t AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_cust,
          |  CAST(sum(cents) AS BIGINT) AS total_cents FROM oc GROUP BY 1),
          |sh AS (SELECT oc.seg, oc.cents * 1000000 // t.total_cents AS ppm
          |  FROM oc JOIN t ON t.seg = oc.seg)
          |SELECT t.seg AS mktsegment, t.n_cust, t.total_cents,
          |  CAST(sum(sh.ppm * sh.ppm) // 1000000 AS BIGINT) AS hhi_micro,
          |  CAST(max(sh.ppm) AS BIGINT) AS top_share_ppm
          |FROM sh JOIN t ON t.seg = sh.seg GROUP BY 1, 2, 3 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val perCust = tbl(s, dir, "orders")
          .groupBy(col("o_custkey").as("ck"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
            .cast("long").as("cents"))
        val oc = perCust.join(
            tbl(s, dir, "customer")
              .select(col("c_custkey").as("ck2"),
                col("c_mktsegment").as("seg")),
            col("ck") === col("ck2"))
          .select("seg", "ck", "cents")
        val t = oc.groupBy("seg")
          .agg(count(lit(1)).cast("long").as("n_cust"),
            sum("cents").cast("long").as("total_cents"))
        oc.join(broadcast(t.withColumnRenamed("seg", "seg2")),
            col("seg") === col("seg2"))
          .withColumn("ppm", expr("cents * 1000000 div total_cents"))
          .groupBy(col("seg").as("mktsegment"), col("n_cust"),
            col("total_cents"))
          .agg(expr("sum(ppm * ppm) div 1000000").cast("long")
              .as("hhi_micro"),
            max("ppm").cast("long").as("top_share_ppm"))
          .orderBy("mktsegment")
      }),

    // Single-source supplier risk, at month granularity: part-months
    // with >= 2 shipments that ALL came from one supplier — the spans
    // where losing that supplier would have stalled the part. One pass
    // over the fact table (count distinct + count + sum in the same
    // keyed aggregation; for a single-source month max(suppkey) IS the
    // supplier), then the 10-row top frame joins supplier with the
    // 10-row side broadcast.
    Q("supply_single_source_risk",
      Some(
        """WITH pm AS (SELECT l_partkey AS pk,
          |  CAST(year(CAST(l_shipdate AS TIMESTAMP)) * 100
          |    + month(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) AS ym,
          |  count(DISTINCT l_suppkey) AS ns, count(*) AS n,
          |  max(l_suppkey) AS sk,
          |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents
          |  FROM lineitem GROUP BY 1, 2),
          |sgl AS (SELECT pk, ym, sk, CAST(n AS BIGINT) AS n_ship, cents
          |  FROM pm WHERE ns = 1 AND n >= 2),
          |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_single_months,
          |  CAST(coalesce(sum(cents), 0) AS BIGINT)
          |    AS total_exposure_cents FROM sgl),
          |top AS (SELECT sgl.*, row_number()
          |  OVER (ORDER BY cents DESC, pk, ym) AS rk FROM sgl)
          |SELECT CAST(top.rk AS BIGINT) AS rk, top.pk AS partkey,
          |  top.ym, top.sk AS suppkey, sup.s_name, top.n_ship,
          |  top.cents AS exposure_cents,
          |  tot.n_single_months, tot.total_exposure_cents
          |FROM top JOIN supplier sup ON sup.s_suppkey = top.sk, tot
          |WHERE top.rk <= 10 ORDER BY rk
          |""".stripMargin),
      (s, dir) => {
        val pm = tbl(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("pk"),
            (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
              .cast("long").as("ym"))
          .agg(countDistinct("l_suppkey").as("ns"),
            count(lit(1)).as("n"),
            max("l_suppkey").as("sk"),
            sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
              .cast("long").as("cents"))
        val sgl = pm.filter(col("ns") === 1 && col("n") >= 2)
          .select(col("pk"), col("ym"), col("sk"),
            col("n").cast("long").as("n_ship"), col("cents"))
          .localCheckpoint() // census + top-10 read it once each
        val tot = sgl.agg(count(lit(1)).cast("long").as("n_single_months"),
          coalesce(sum("cents"), lit(0L)).cast("long")
            .as("total_exposure_cents"))
        val top = sgl.orderBy(col("cents").desc, col("pk"), col("ym"))
          .limit(10)
          .withColumn("rk",
            row_number().over(
              Window.orderBy(col("cents").desc, col("pk"), col("ym")))
              .cast("long"))
        val out = tbl(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))
          .join(broadcast(top), col("s_suppkey") === col("sk"))
          .crossJoin(broadcast(tot))
          .select(col("rk"), col("pk").as("partkey"), col("ym"),
            col("sk").as("suppkey"), col("s_name"), col("n_ship"),
            col("cents").as("exposure_cents"),
            col("n_single_months"), col("total_exposure_cents"))
          .orderBy("rk")
        H.materialized(out, Nil, Seq(sgl))
      }),

    // Running distinct-part count per market segment by order month,
    // computed the scale-correct way: "distinct so far" is a SUM of
    // first-occurrence flags, and the first occurrence is min(month)
    // per (segment, part) — a keyed aggregation. The cumulative window
    // then runs over the bounded segment×month frame (≤ 5 × ~84 rows),
    // never over fact rows; a naive count(DISTINCT) OVER (… ROWS
    // UNBOUNDED PRECEDING) is unsupported AND would be quadratic.
    Q("win_running_distinct",
      Some(
        """WITH base AS (SELECT c.c_mktsegment AS seg, l.l_partkey AS pk,
          |  CAST(year(CAST(o.o_orderdate AS TIMESTAMP)) * 100
          |    + month(CAST(o.o_orderdate AS TIMESTAMP)) AS BIGINT) AS ym
          |  FROM lineitem l
          |  JOIN orders o ON o.o_orderkey = l.l_orderkey
          |  JOIN customer c ON c.c_custkey = o.o_custkey),
          |fm AS (SELECT seg, pk, CAST(min(ym) AS BIGINT) AS fym
          |  FROM base GROUP BY 1, 2),
          |nw AS (SELECT seg, fym AS ym, CAST(count(*) AS BIGINT)
          |  AS new_parts FROM fm GROUP BY 1, 2)
          |SELECT seg AS mktsegment, ym, new_parts,
          |  CAST(sum(new_parts) OVER (PARTITION BY seg ORDER BY ym)
          |    AS BIGINT) AS cum_distinct_parts
          |FROM nw ORDER BY 1, 2
          |""".stripMargin),
      (s, dir) => {
        val base = tbl(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .join(tbl(s, dir, "orders")
              .select(col("o_orderkey"), col("o_custkey"),
                (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
                  .cast("long").as("ym")),
            col("ok") === col("o_orderkey"))
          .join(tbl(s, dir, "customer")
              .select(col("c_custkey"), col("c_mktsegment").as("seg")),
            col("o_custkey") === col("c_custkey"))
        val nw = base.groupBy("seg", "pk")
          .agg(min("ym").cast("long").as("fym"))
          .groupBy(col("seg"), col("fym").as("ym"))
          .agg(count(lit(1)).cast("long").as("new_parts"))
        nw.withColumn("cum_distinct_parts",
            sum("new_parts").over(
              Window.partitionBy("seg").orderBy("ym")).cast("long"))
          .select(col("seg").as("mktsegment"), col("ym"), col("new_parts"),
            col("cum_distinct_parts"))
          .orderBy("mktsegment", "ym")
      }),

    // Two-phase global row-id: contiguous 1-based ranks over the whole
    // fact table in total (l_orderkey, l_linenumber) order WITHOUT a
    // single-partition sort. Phase 1 range-partitions on the sort key;
    // phase 2 ranks within each range partition and adds the broadcast
    // running offset of preceding partitions' counts. The result is
    // independent of where the sampled range boundaries fall (ranges
    // are disjoint and ordered by partition id), so AQE coalescing or
    // a different executor count cannot change a single output value —
    // the property that makes the pattern safe at 1000 executors.
    // Output is the rowid % 997 == 1 diagonal plus the total census.
    Q("layout_global_rowid",
      Some(
        """WITH r AS (SELECT l_orderkey, l_linenumber,
          |  row_number() OVER (ORDER BY l_orderkey, l_linenumber)
          |    AS rowid FROM lineitem),
          |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem)
          |SELECT CAST(r.rowid AS BIGINT) AS rowid, r.l_orderkey,
          |  CAST(r.l_linenumber AS BIGINT) AS l_linenumber, tot.n_rows
          |FROM r, tot WHERE r.rowid % 997 = 1 ORDER BY rowid
          |""".stripMargin),
      (s, dir) => {
        // H.globalRank carries the whole two-phase pattern (r12: its rank
        // phase no longer re-shuffles — monotonic id over the sorted range
        // partitions replaces the row_number window, so the fact table
        // crosses exactly ONE exchange)
        val (ranked, keyed) = H.globalRank(
          tbl(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_linenumber")),
          Seq(col("l_orderkey"), col("l_linenumber")), "rowid")
        val tot = keyed.agg(count(lit(1)).cast("long").as("n_rows"))
        val out = ranked.filter(col("rowid") % 997 === 1)
          .crossJoin(broadcast(tot))
          .select(col("rowid"), col("l_orderkey"),
            col("l_linenumber").cast("long"), col("n_rows"))
          .orderBy("rowid")
        H.materialized(out, Nil, Seq(keyed))
      }))
}
