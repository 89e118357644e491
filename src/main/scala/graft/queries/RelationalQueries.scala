package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.{dec2, dec2s, fmtTs, fmtTsSec, tbl}
import graft.ops.Relational.asOfJoin

/** SURVEY §2.2 ENG rows: the relational surface the reference delegates to
  * Azure SQL after load, expressed as native Spark plans. Every query is
  * DuckDB-oracle-verified; determinism rules are in `graft.H`.
  *
  * Scale notes (100 TB thinking, verified via .explain on sf0.1):
  *   - dimension joins (region/nation/customer-filtered) are `broadcast()`
  *     hinted → no shuffle of the fact table;
  *   - aggregations are partial+final hash aggs (map-side combine free);
  *   - top-k uses orderBy+limit → TakeOrderedAndProject, never a global sort;
  *   - window functions shuffle once on their partition keys.
  */
object RelationalQueries extends QueryModule {

  private val F6 = "%Y-%m-%d %H:%M:%S.%f"
  private val F0 = "%Y-%m-%d %H:%M:%S"

  // exact decimal revenue term, both engines: price * (1 - discount)
  private val revSql =
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "(1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)"
  private def revCol =
    sum(dec2(col("l_extendedprice")) * (lit(1) - dec2s(col("l_discount"))))
      .cast("double")

  def all: Seq[Q] = Seq(

    // ---- aggregation -----------------------------------------------------

    Q("q1_pricing_summary",
      Some("SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price, " +
        s"$revSql AS sum_disc_price, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(4,2))) * " +
        "(1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty, " +
        "count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            revCol.as("sum_disc_price"),
            sum(dec2(col("l_extendedprice")) * (lit(1) - dec2s(col("l_discount")))
              * (lit(1) + dec2s(col("l_tax")))).cast("double").as("sum_charge"),
            (sum(dec2(col("l_quantity"))).cast("double")
              / count(lit(1)).cast("double")).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q6: the pure filter-and-sum scan (pushdown + single agg).
    Q("q6_revenue_change",
      Some("SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue, " +
        "count(*) AS n_lines FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
        "AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24"),
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
          .agg(sum(dec2(col("l_extendedprice")) * dec2s(col("l_discount")))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_lines"))),

    // TPC-H Q18 shape: large-volume orders via HAVING, joined back to
    // orders + customer.
    Q("q18_big_orders",
      Some("SELECT c_name, o_orderkey, " +
        s"strftime(o_orderdate, '$F0') AS o_orderdate, o_totalprice, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON o_orderkey = l_orderkey " +
        "GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice " +
        "HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 120 " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"),
      (s, dir) => {
        val big = tbl(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum(dec2(col("l_quantity"))).as("total_qty_dec"))
          .filter(col("total_qty_dec") > 120)
        tbl(s, dir, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(tbl(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("o_orderkey"),
            fmtTsSec(col("o_orderdate")).as("o_orderdate"), col("o_totalprice"),
            col("total_qty_dec").cast("double").as("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)
      }),

    Q("agg_distinct",
      Some("SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, " +
        "count(*) AS n_orders, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price, " +
        "min(o_totalprice) AS min_price, max(o_totalprice) AS max_price " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
      (s, dir) =>
        tbl(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(
            countDistinct(col("o_custkey")).as("n_cust"),
            count(lit(1)).as("n_orders"),
            sum(dec2(col("o_totalprice"))).cast("double").as("sum_price"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"))
          .orderBy("o_orderpriority")),

    // HLL sketch — not oracle-comparable by construction → rows-only check.
    // Approx distinct with the error bound ENCODED in the result: the HLL
    // estimate itself isn't SQL-reproducible, so the query emits the exact
    // counts plus in-bounds flags (|approx-exact|/exact <= 3×rsd = 0.15).
    // The oracle asserts the flags are 1 — an out-of-bound sketch goes red.
    Q("agg_approx_distinct",
      Some("SELECT l_returnflag, " +
        "count(DISTINCT l_partkey) AS exact_parts, " +
        "count(DISTINCT l_orderkey) AS exact_orders, " +
        "CAST(1 AS INTEGER) AS parts_in_bounds, " +
        "CAST(1 AS INTEGER) AS orders_in_bounds " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("exact_parts"),
            countDistinct(col("l_orderkey")).as("exact_orders"),
            approx_count_distinct(col("l_partkey"), 0.05).as("ap"),
            approx_count_distinct(col("l_orderkey"), 0.05).as("ao"))
          .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
            (abs(col("ap") - col("exact_parts")).cast("double") /
              col("exact_parts").cast("double") <= 0.15).cast("int")
              .as("parts_in_bounds"),
            (abs(col("ao") - col("exact_orders")).cast("double") /
              col("exact_orders").cast("double") <= 0.15).cast("int")
              .as("orders_in_bounds"))
          .orderBy("l_returnflag")),

    Q("agg_rollup",
      Some("SELECT coalesce(l_returnflag, 'ALL') AS returnflag, " +
        "coalesce(l_linestatus, 'ALL') AS linestatus, " +
        "CAST(grouping(l_returnflag) AS INTEGER) AS g_flag, " +
        "CAST(grouping(l_linestatus) AS INTEGER) AS g_status, " +
        "count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY returnflag, linestatus"),
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
            grouping(col("l_returnflag")).cast("int").as("g_flag"),
            grouping(col("l_linestatus")).cast("int").as("g_status"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("g_flag"), col("g_status"), col("n"), col("sum_qty"))
          .orderBy("returnflag", "linestatus")),

    Q("agg_cube",
      Some("SELECT coalesce(o_orderstatus, 'ALL') AS status, " +
        "coalesce(o_orderpriority, 'ALL') AS priority, " +
        "count(*) AS n, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price " +
        "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) " +
        "ORDER BY status, priority"),
      (s, dir) =>
        tbl(s, dir, "orders")
          .cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("o_totalprice"))).cast("double").as("sum_price"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("sum_price"))
          .orderBy("status", "priority")),

    Q("agg_groupingsets",
      Some("SELECT coalesce(o_orderstatus, 'ALL') AS status, " +
        "coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n " +
        "FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) " +
        "ORDER BY status, priority"),
      (s, dir) => {
        tbl(s, dir, "orders").createOrReplaceTempView("orders_gs")
        s.sql("SELECT coalesce(o_orderstatus, 'ALL') AS status, " +
          "coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n " +
          "FROM orders_gs GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) " +
          "ORDER BY status, priority")
      }),

    // ---- joins -----------------------------------------------------------

    Q("q3_shipping_priority",
      Some("SELECT l_orderkey, " +
        s"$revSql AS revenue, " +
        s"strftime(o_orderdate, '$F0') AS o_orderdate, o_orderpriority " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' " +
        "AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00' " +
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority " +
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"),
      (s, dir) => {
        val cust = tbl(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = tbl(s, dir, "orders")
          .filter(col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        val li = tbl(s, dir, "lineitem")
          .filter(col("l_shipdate") > to_timestamp(lit("1997-01-01 00:00:00")))
        li.join(broadcast(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(revCol.as("revenue"))
          .select(col("l_orderkey"), col("revenue"),
            fmtTsSec(col("o_orderdate")).as("o_orderdate"), col("o_orderpriority"))
          .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
      }),

    Q("q5_local_supplier",
      Some("SELECT n_name, " + s"$revSql AS revenue " +
        "FROM customer, orders, lineitem, supplier, nation, region " +
        "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey " +
        "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
        "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey " +
        "AND r_name = 'ASIA' " +
        "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' " +
        "GROUP BY n_name ORDER BY revenue DESC, n_name"),
      (s, dir) => {
        val nat = tbl(s, dir, "nation")
          .join(broadcast(tbl(s, dir, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
        val supp = tbl(s, dir, "supplier")
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        val ord = tbl(s, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        tbl(s, dir, "lineitem")
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(tbl(s, dir, "customer"),
            col("o_custkey") === col("c_custkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .groupBy("n_name")
          .agg(revCol.as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      }),

    Q("join_left_agg",
      Some("SELECT c_custkey, count(o_orderkey) AS n_orders, " +
        "CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spend " +
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY c_custkey ORDER BY c_custkey"),
      (s, dir) =>
        tbl(s, dir, "customer")
          .join(tbl(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders"),
            coalesce(sum(dec2(col("o_totalprice"))), lit(0)).cast("double")
              .as("total_spend"))
          .orderBy("c_custkey")),

    // Right outer join: all customers kept, orders only where the filtered
    // left side matches (null order columns otherwise).
    Q("join_right",
      Some("SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice " +
        "FROM (SELECT * FROM orders WHERE o_totalprice > 200000.0) o " +
        "RIGHT JOIN customer c ON o.o_custkey = c.c_custkey " +
        "ORDER BY c_custkey, o_orderkey"),
      (s, dir) =>
        tbl(s, dir, "orders").filter(col("o_totalprice") > 200000.0)
          .join(tbl(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"), "right")
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_totalprice"))
          .orderBy("c_custkey", "o_orderkey")),

    Q("join_semi",
      Some("SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderpriority = '1-URGENT') ORDER BY c_custkey"),
      (s, dir) =>
        tbl(s, dir, "customer")
          .join(tbl(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name").orderBy("c_custkey")),

    Q("join_anti",
      Some("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00') ORDER BY c_custkey"),
      (s, dir) =>
        tbl(s, dir, "customer")
          .join(tbl(s, dir, "orders")
              .filter(col("o_orderdate") >= to_timestamp(lit("2001-01-01 00:00:00"))),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name").orderBy("c_custkey")),

    Q("join_full_outer",
      Some("WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust " +
        "FROM customer GROUP BY 1), " +
        "s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp " +
        "FROM supplier GROUP BY 1) " +
        "SELECT coalesce(c.nationkey, s.nationkey) AS nationkey, " +
        "coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp " +
        "FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey ORDER BY nationkey"),
      (s, dir) => {
        val c = tbl(s, dir, "customer").groupBy(col("c_nationkey").as("ck"))
          .agg(count(lit(1)).as("n_cust"))
        val sp = tbl(s, dir, "supplier").groupBy(col("s_nationkey").as("sk"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(sp, col("ck") === col("sk"), "full")
          .select(coalesce(col("ck"), col("sk")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      }),

    // Non-equi (theta/range) join: broadcast nested-loop against a tiny
    // bucket dimension — the scale-safe shape for banding joins.
    Q("join_range_nonequi",
      Some("SELECT p_partkey, p_size, cls FROM part JOIN " +
        "(VALUES (1, 10, 'small'), (11, 25, 'medium'), (26, 50, 'large')) " +
        "t(lo, hi, cls) ON p_size BETWEEN lo AND hi ORDER BY p_partkey"),
      (s, dir) => {
        import s.implicits._
        val buckets = Seq((1, 10, "small"), (11, 25, "medium"), (26, 50, "large"))
          .toDF("lo", "hi", "cls")
        tbl(s, dir, "part")
          .join(broadcast(buckets),
            col("p_size") >= col("lo") && col("p_size") <= col("hi"))
          .select("p_partkey", "p_size", "cls").orderBy("p_partkey")
      }),

    // As-of join: for each purchase, the latest click by the same user at or
    // before it. Equi-join on the key + one window pass — no cross product.
    Q("join_asof",
      Some("WITH j AS (SELECT p.event_id AS p_id, p.ts AS pts, " +
        "c.event_id AS c_id, c.ts AS cts, " +
        "row_number() OVER (PARTITION BY p.event_id " +
        "ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST) AS rn " +
        "FROM events p LEFT JOIN events c ON c.user_id = p.user_id " +
        "AND c.event_type = 'click' AND c.ts <= p.ts " +
        "WHERE p.event_type = 'purchase') " +
        s"SELECT p_id, strftime(pts, '$F6') AS p_ts, " +
        "coalesce(c_id, -1) AS c_id, " +
        s"coalesce(strftime(cts, '$F6'), '-') AS c_ts " +
        "FROM j WHERE rn = 1 ORDER BY p_id"),
      (s, dir) => {
        val ev = H.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id"), col("ts").as("c_ts"))
        asOfJoin(purchases, clicks, key = "user_id",
          leftTs = "p_ts", rightTs = "c_ts", leftId = "p_id", rightTieBreak = "c_id")
          .select(col("p_id"), fmtTs(col("p_ts")).as("p_ts"),
            coalesce(col("c_id"), lit(-1L)).as("c_id"),
            coalesce(fmtTs(col("c_ts")), lit("-")).as("c_ts"))
          .orderBy("p_id")
      }),

    // ---- windows ---------------------------------------------------------

    Q("win_rank",
      Some("SELECT c_custkey, c_nationkey, c_acctbal, rn, rnk, drnk FROM " +
        "(SELECT c_custkey, c_nationkey, c_acctbal, " +
        "CAST(row_number() OVER w AS BIGINT) AS rn, " +
        "CAST(rank() OVER w AS BIGINT) AS rnk, " +
        "CAST(dense_rank() OVER w AS BIGINT) AS drnk FROM customer " +
        "WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)) " +
        "WHERE rn <= 5 ORDER BY c_nationkey, rn"),
      (s, dir) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        tbl(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
            row_number().over(w).cast("long").as("rn"),
            rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"))
          .filter(col("rn") <= 5)
          .orderBy("c_nationkey", "rn")
      }),

    Q("win_lag_lead",
      Some("SELECT event_id, user_id, value, " +
        "coalesce(lag(value) OVER w, -1.0) AS prev_value, " +
        "coalesce(lead(value) OVER w, -1.0) AS next_value " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) " +
        "ORDER BY user_id, event_id"),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        H.events(s, dir)
          .select(col("event_id"), col("user_id"), col("value"),
            coalesce(lag(col("value"), 1).over(w), lit(-1.0)).as("prev_value"),
            coalesce(lead(col("value"), 1).over(w), lit(-1.0)).as("next_value"))
          .orderBy("user_id", "event_id")
      }),

    Q("win_running",
      Some("SELECT user_id, event_id, " +
        "CAST(sum(CAST(value AS DECIMAL(12,2))) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value, " +
        "CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n " +
        "FROM events ORDER BY user_id, event_id"),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        H.events(s, dir)
          .select(col("user_id"), col("event_id"),
            sum(dec2(col("value"))).over(w).cast("double").as("running_value"),
            count(lit(1)).over(w).cast("long").as("running_n"))
          .orderBy("user_id", "event_id")
      }),

    Q("win_range_frame",
      Some("SELECT o_orderkey, o_orderpriority, o_totalprice, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER " +
        "(PARTITION BY o_orderpriority ORDER BY o_totalprice " +
        "RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS nearby_sum " +
        "FROM orders ORDER BY o_orderkey"),
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"))
          .rangeBetween(-1000L, Window.currentRow)
        tbl(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
            sum(dec2(col("o_totalprice"))).over(w).cast("double").as("nearby_sum"))
          .orderBy("o_orderkey")
      }),

    // ---- sort / limit / set ops -----------------------------------------

    Q("sort_topk",
      Some("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"),
      (s, dir) =>
        tbl(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .select("o_orderkey", "o_totalprice").limit(20)),

    Q("set_union",
      Some("SELECT o_custkey FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00' " +
        "UNION " +
        "SELECT o_custkey FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' " +
        "ORDER BY o_custkey"),
      (s, dir) => {
        val o = tbl(s, dir, "orders")
        def in(y0: String, y1: String) =
          o.filter(col("o_orderdate") >= to_timestamp(lit(s"$y0-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit(s"$y1-01-01 00:00:00")))
            .select("o_custkey")
        in("1995", "1996").union(in("1996", "1997")).distinct().orderBy("o_custkey")
      }),

    Q("set_intersect",
      Some("SELECT o_custkey FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1995-03-01 00:00:00' " +
        "INTERSECT " +
        "SELECT o_custkey FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-03-01 00:00:00' " +
        "ORDER BY o_custkey"),
      (s, dir) => {
        val o = tbl(s, dir, "orders")
        def in(a: String, b: String) =
          o.filter(col("o_orderdate") >= to_timestamp(lit(a)) &&
            col("o_orderdate") < to_timestamp(lit(b))).select("o_custkey")
        in("1995-01-01 00:00:00", "1995-03-01 00:00:00")
          .intersect(in("1996-01-01 00:00:00", "1996-03-01 00:00:00"))
          .orderBy("o_custkey")
      }),

    Q("set_except",
      Some("SELECT o_custkey FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1995-03-01 00:00:00' " +
        "EXCEPT " +
        "SELECT o_custkey FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-03-01 00:00:00' " +
        "ORDER BY o_custkey"),
      (s, dir) => {
        val o = tbl(s, dir, "orders")
        def in(a: String, b: String) =
          o.filter(col("o_orderdate") >= to_timestamp(lit(a)) &&
            col("o_orderdate") < to_timestamp(lit(b))).select("o_custkey")
        in("1995-01-01 00:00:00", "1995-03-01 00:00:00")
          .except(in("1996-01-01 00:00:00", "1996-03-01 00:00:00"))
          .orderBy("o_custkey")
      }),

    // union-by-name across differently-shaped sources — the reference's
    // multi-company-instance union (readme.md:148-153).
    Q("set_union_byname",
      Some("SELECT id, name, acctbal, side, coalesce(mktsegment, '-') AS mktsegment FROM (" +
        "SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal, " +
        "'customer' AS side, c_mktsegment AS mktsegment FROM customer " +
        "UNION ALL BY NAME " +
        "SELECT s_suppkey AS id, s_name AS name, 'supplier' AS side, " +
        "s_acctbal AS acctbal FROM supplier) ORDER BY side, id"),
      (s, dir) => {
        val c = tbl(s, dir, "customer")
          .select(col("c_custkey").as("id"), col("c_name").as("name"),
            col("c_acctbal").as("acctbal"), lit("customer").as("side"),
            col("c_mktsegment").as("mktsegment"))
        val sp = tbl(s, dir, "supplier")
          .select(col("s_suppkey").as("id"), col("s_name").as("name"),
            lit("supplier").as("side"), col("s_acctbal").as("acctbal"))
        c.unionByName(sp, allowMissingColumns = true)
          .withColumn("mktsegment", coalesce(col("mktsegment"), lit("-")))
          .orderBy("side", "id")
      }),

    // ---- scalar functions ------------------------------------------------

    Q("scalar_string",
      Some("SELECT doc_id, upper(substr(text, 1, 12)) AS head, " +
        "CAST(length(text) AS BIGINT) AS len_chars, " +
        "source || '/' || lang AS src_lang, " +
        "replace(substr(text, 1, 20), ' ', '_') AS snake, " +
        "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens " +
        "FROM documents ORDER BY doc_id"),
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(col("doc_id"),
            upper(substring(col("text"), 1, 12)).as("head"),
            length(col("text")).cast("long").as("len_chars"),
            concat(col("source"), lit("/"), col("lang")).as("src_lang"),
            regexp_replace(substring(col("text"), 1, 20), " ", "_").as("snake"),
            (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
              .cast("long").as("n_tokens"))
          .orderBy("doc_id")),

    Q("scalar_datetime",
      Some("SELECT event_id, CAST(year(ts) AS BIGINT) AS y, " +
        "CAST(month(ts) AS BIGINT) AS m, CAST(day(ts) AS BIGINT) AS d, " +
        "CAST(hour(ts) AS BIGINT) AS h, " +
        "CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, " +
        s"strftime(date_trunc('day', ts), '$F0') AS day_start, " +
        "CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s, " +
        "CAST(datediff('day', TIMESTAMP '2024-01-01 00:00:00', date_trunc('day', ts)) AS BIGINT) AS days_since " +
        "FROM events ORDER BY event_id"),
      (s, dir) =>
        H.events(s, dir)
          .select(col("event_id"),
            year(col("ts")).cast("long").as("y"),
            month(col("ts")).cast("long").as("m"),
            dayofmonth(col("ts")).cast("long").as("d"),
            hour(col("ts")).cast("long").as("h"),
            dayofweek(col("ts")).cast("long").as("dow"),
            fmtTsSec(date_trunc("day", col("ts"))).as("day_start"),
            unix_timestamp(col("ts")).cast("long").as("epoch_s"),
            datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
              .cast("long").as("days_since"))
          .orderBy("event_id")),

    Q("scalar_math",
      Some("SELECT l_orderkey, l_linenumber, " +
        "CAST(round(l_discount * 100) AS BIGINT) AS disc_pct, " +
        "sqrt(l_quantity) AS qty_sqrt, " +
        "abs(l_discount - 0.05) AS disc_dev, " +
        "CAST(floor(l_extendedprice) AS BIGINT) AS price_floor, " +
        "CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil, " +
        "CAST(l_partkey % 7 AS BIGINT) AS pk_mod " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            round(col("l_discount") * 100).cast("long").as("disc_pct"),
            sqrt(col("l_quantity")).as("qty_sqrt"),
            abs(col("l_discount") - 0.05).as("disc_dev"),
            floor(col("l_extendedprice")).cast("long").as("price_floor"),
            ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
            (col("l_partkey") % 7).cast("long").as("pk_mod"))
          .orderBy("l_orderkey", "l_linenumber")),

    Q("scalar_null",
      Some("SELECT o_orderkey, " +
        "coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label, " +
        "CASE WHEN o_totalprice > 100000 THEN 'big' " +
        "WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS size_class, " +
        "CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS BIGINT) AS is_final " +
        "FROM orders ORDER BY o_orderkey"),
      (s, dir) =>
        tbl(s, dir, "orders")
          .select(col("o_orderkey"),
            coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
              .as("status_label"),
            when(col("o_totalprice") > 100000, "big")
              .when(col("o_totalprice") > 50000, "mid")
              .otherwise("small").as("size_class"),
            when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("is_final"))
          .orderBy("o_orderkey")),

    Q("scalar_json",
      Some("SELECT event_id, json_extract_string(props, '$.k') AS k_str, " +
        "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num " +
        "FROM events ORDER BY event_id"),
      (s, dir) =>
        H.events(s, dir)
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").as("k_str"),
            get_json_object(col("props"), "$.k").cast("long").as("k_num"))
          .orderBy("event_id")),

    Q("explode_tokens",
      Some("SELECT token, count(*) AS n FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) " +
        "GROUP BY token ORDER BY n DESC, token LIMIT 50"),
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token")).limit(50)))
}
