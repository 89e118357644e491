package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, QueryModule}
import graft.H.{dec2, dec2s, tbl}

/** Additional TPC-H-pattern queries (adapted to the synthetic schema) that
  * exercise optimizer paths the first headline set doesn't: correlated
  * EXISTS as a non-equi semi join, conditional aggregation, ratio-of-sums
  * metrics, disjunctive multi-table predicates, and a scalar-subquery
  * threshold feeding an anti join. All broadcast their dimension sides and
  * keep aggregates decimal-exact (H determinism rules).
  */
object TpchMoreQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Q4 pattern: priority count of orders with at least one line shipped
    // after the order date — correlated EXISTS = non-equi LEFT SEMI join
    // (shuffles on the key once; the extra predicate rides the join).
    Q("q4_order_priority",
      Some("SELECT o_orderpriority, count(*) AS order_count FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' " +
        "AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00' " +
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey " +
        "AND l_shipdate > o_orderdate) " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
      (s, dir) =>
        tbl(s, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1997-07-01 00:00:00")))
          .join(tbl(s, dir, "lineitem"),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")),

    // Q12 pattern: conditional aggregation after a fact-fact equi join —
    // high/low-priority line counts per linestatus for a ship-year.
    Q("q12_shipmode_priority",
      Some("SELECT l_linestatus, " +
        "count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count, " +
        "count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
        "WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' " +
        "AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00' " +
        "GROUP BY l_linestatus ORDER BY l_linestatus"),
      (s, dir) => {
        val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        tbl(s, dir, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("1998-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1999-01-01 00:00:00")))
          .join(tbl(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
          .groupBy("l_linestatus")
          .agg(count(when(high, 1)).as("high_line_count"),
            count(when(!high, 1)).as("low_line_count"))
          .orderBy("l_linestatus")
      }),

    // Q14 pattern: promo revenue share per ship-month — ratio of two exact
    // decimal sums, emitted as the deterministic double of their division.
    Q("q14_promo_revenue",
      Some("WITH l AS (SELECT date_trunc('month', l_shipdate) AS m, p_type, " +
        "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(4,2))) AS rev " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey " +
        "WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' " +
        "AND l_shipdate < TIMESTAMP '1998-07-01 00:00:00') " +
        "SELECT strftime(m, '%Y-%m') AS ship_month, " +
        "CAST(100.0 * CAST(coalesce(sum(CASE WHEN p_type = 'PROMO' THEN rev END), 0) AS DOUBLE) " +
        "/ CAST(sum(rev) AS DOUBLE) AS DOUBLE) AS promo_pct " +
        "FROM l GROUP BY m ORDER BY ship_month"),
      (s, dir) => {
        val rev = dec2(col("l_extendedprice")) * (lit(1) - dec2s(col("l_discount")))
        tbl(s, dir, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("1998-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1998-07-01 00:00:00")))
          .join(broadcast(tbl(s, dir, "part")), col("p_partkey") === col("l_partkey"))
          .withColumn("rev", rev)
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
          .agg((lit(100.0) *
            coalesce(sum(when(col("p_type") === "PROMO", col("rev"))), lit(0)).cast("double") /
            sum(col("rev")).cast("double")).as("promo_pct"))
          .orderBy("ship_month")
      }),

    // Q19 pattern: disjunctive multi-table predicate — each disjunct pairs a
    // part filter with a lineitem filter; Catalyst extracts the common
    // p_partkey join and evaluates the OR above it (no cross product).
    Q("q19_disjunctive",
      Some("SELECT count(*) AS n, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey " +
        "WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10) " +
        "OR (p_brand = 'Brand#17' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)"),
      (s, dir) => {
        val d1 = col("p_brand") === "Brand#4" &&
          col("p_size").between(1, 15) && col("l_quantity") >= 10
        val d2 = col("p_brand") === "Brand#17" &&
          col("p_size").between(10, 30) && col("l_quantity") >= 20
        tbl(s, dir, "lineitem")
          .join(broadcast(tbl(s, dir, "part")), col("p_partkey") === col("l_partkey"))
          .filter(d1 || d2)
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("l_extendedprice"))).cast("double").as("total"))
      }),

    // Q16 pattern: distinct-supplier count after a fact join, with IN-list
    // and negated-equality predicates pushed into the part scan.
    Q("q16_supplier_variety",
      Some("SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey " +
        "WHERE p_brand <> 'Brand#4' AND p_size IN (1, 5, 10, 15, 20) " +
        "GROUP BY p_brand, p_size ORDER BY supplier_cnt DESC, p_brand, p_size"),
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .join(broadcast(tbl(s, dir, "part")
              .filter(col("p_brand") =!= "Brand#4" &&
                col("p_size").isin(1, 5, 10, 15, 20))),
            col("p_partkey") === col("l_partkey"))
          .groupBy("p_brand", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))),

    // Regex scalar surface: extract / count / replace with patterns in the
    // common dialect subset (no lookaround), identical in both engines.
    Q("scalar_regex",
      Some("SELECT doc_id, " +
        "regexp_extract(text, '([a-z]+ing)', 1) AS first_ing, " +
        "CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers, " +
        "regexp_replace(substr(text, 1, 40), '[aeiou]', '_', 'g') AS devoweled " +
        "FROM documents ORDER BY doc_id"),
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(col("doc_id"),
            regexp_extract(col("text"), "([a-z]+ing)", 1).as("first_ing"),
            size(expr("regexp_extract_all(text, '[0-9]+', 0)")).cast("long")
              .as("n_numbers"),
            regexp_replace(substring(col("text"), 1, 40), "[aeiou]", "_")
              .as("devoweled"))
          .orderBy("doc_id")),

    // Bucketed co-located join: both sides written bucketBy(8) on the join
    // key, then sort-merge-joined — bucket co-location satisfies the join's
    // distribution requirement so there is NO Exchange on either side, and
    // the downstream groupBy on the same key rides the same distribution.
    // The 100 TB shape for repeated fact-fact joins on a stable key.
    Q("join_bucketed",
      Some("SELECT o_custkey, count(*) AS n_orders, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY o_custkey ORDER BY o_custkey"),
      (s, dir) => {
        val db = "graft_bucketed"
        // physical cleanup too: the in-memory catalog of a NEW session has
        // no record of a previous run's managed tables, so their leftover
        // warehouse files would otherwise fail saveAsTable with
        // LOCATION_ALREADY_EXISTS
        s.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
        val dbPath = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), s"$db.db")
        val fs = dbPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(dbPath)) fs.delete(dbPath, true)
        s.sql(s"CREATE DATABASE `$db`")
        tbl(s, dir, "orders").write.mode("overwrite")
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .format("parquet").saveAsTable(s"$db.orders_b")
        tbl(s, dir, "customer").write.mode("overwrite")
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .format("parquet").saveAsTable(s"$db.customer_b")
        s.table(s"$db.orders_b")
          .join(s.table(s"$db.customer_b").hint("merge"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            sum(dec2(col("o_totalprice"))).cast("double").as("total_spend"))
          .orderBy("o_custkey")
      }),

    // Q22 pattern: above-average-balance customers with NO orders — a
    // broadcast scalar threshold (exact decimal avg as double) feeding an
    // anti join. The threshold is sum/count, not avg(), so both engines
    // produce the identical double.
    Q("q22_global_sales_opp",
      Some("WITH thr AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) " +
        "/ count(*) AS t FROM customer WHERE c_acctbal > 0) " +
        "SELECT c_nationkey, count(*) AS numcust, " +
        "CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal " +
        "FROM customer, thr WHERE c_acctbal > thr.t " +
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
        "GROUP BY c_nationkey ORDER BY c_nationkey"),
      (s, dir) => {
        val cust = tbl(s, dir, "customer")
        val thr = cust.filter(col("c_acctbal") > 0)
          .agg((sum(dec2(col("c_acctbal"))).cast("double") / count(lit(1))).as("t"))
        cust.crossJoin(broadcast(thr))
          .filter(col("c_acctbal") > col("t"))
          .join(tbl(s, dir, "orders"),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("numcust"),
            sum(dec2(col("c_acctbal"))).cast("double").as("totacctbal"))
          .orderBy("c_nationkey")
      }))
}
