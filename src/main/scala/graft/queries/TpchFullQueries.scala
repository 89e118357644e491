package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{H, Q, QueryModule}
import graft.H.{dec2, dec2s, tbl}

/** The remaining TPC-H query patterns (q2, q7-q11, q13, q15, q17, q20, q21),
  * adapted to the synthetic schema: there is no partsupp table and no
  * commit/receipt dates, so supply cost derives from lineitem unit prices and
  * "late" derives from ship-vs-order date — but each query keeps its
  * canonical optimizer shape (correlated min subquery, two-nation volume
  * join, ratio-of-sums market share, HAVING scalar subquery, left-join
  * histogram, arg-max view, correlated-avg threshold, nested IN chain,
  * EXISTS/NOT-EXISTS anti-join chain).
  *
  * Scale notes: every dimension chain (region→nation→supplier/customer,
  * part) is broadcast; the only shuffles are on fact keys (l_orderkey /
  * l_partkey / grouping keys), which is the 100 TB plan. Aggregated money is
  * decimal-exact per H rules; doubles are emitted only as final casts or
  * order-independent min/max.
  */
object TpchFullQueries extends QueryModule {

  private val F = "yyyy-MM-dd HH:mm:ss"

  def all: Seq[Q] = Seq(

    // Q2 pattern: cheapest supplier per part (correlated MIN subquery).
    // partsupp stand-in: per-(part, supplier) unit cost = min unit price
    // ever charged on a lineitem. The correlated "cost = (SELECT min ...)"
    // becomes a window-min over the part key — one shuffle on l_partkey,
    // no second scan, no join back (the classic decorrelation Spark and
    // DuckDB both reach; we write it explicitly).
    Q("q2_min_cost_supplier",
      Some("WITH ps AS (SELECT l_partkey, l_suppkey, " +
        "min(l_extendedprice / l_quantity) AS unit_cost FROM lineitem " +
        "GROUP BY 1, 2), " +
        "m AS (SELECT *, min(unit_cost) OVER (PARTITION BY l_partkey) AS best " +
        "FROM ps) " +
        "SELECT p_partkey, p_brand, s_name, s_acctbal, unit_cost " +
        "FROM m JOIN part ON p_partkey = l_partkey " +
        "JOIN supplier ON s_suppkey = l_suppkey " +
        "JOIN nation ON n_nationkey = s_nationkey " +
        "JOIN region ON r_regionkey = n_regionkey " +
        "WHERE unit_cost = best AND p_type = 'LARGE' AND p_size <= 25 " +
        "AND r_name = 'EUROPE' " +
        "ORDER BY s_acctbal DESC, p_partkey, s_name"),
      (s, dir) => {
        val ps = tbl(s, dir, "lineitem")
          .groupBy("l_partkey", "l_suppkey")
          .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
        val best = ps.withColumn("best",
          min("unit_cost").over(Window.partitionBy("l_partkey")))
          .filter(col("unit_cost") === col("best"))
        val sup = broadcast(tbl(s, dir, "supplier")
          .join(broadcast(tbl(s, dir, "nation")),
            col("n_nationkey") === col("s_nationkey"))
          .join(broadcast(tbl(s, dir, "region")
            .filter(col("r_name") === "EUROPE")),
            col("r_regionkey") === col("n_regionkey")))
        best
          .join(broadcast(tbl(s, dir, "part")
            .filter(col("p_type") === "LARGE" && col("p_size") <= 25)),
            col("p_partkey") === col("l_partkey"))
          .join(sup, col("s_suppkey") === col("l_suppkey"))
          .select(col("p_partkey"), col("p_brand"), col("s_name"),
            col("s_acctbal"), col("unit_cost"))
          .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_name"))
      }),

    // Q7 pattern: volume shipping between two nations — supplier nation and
    // customer nation joined through the fact, symmetric pair filter, per
    // (supp_nation, cust_nation, year) revenue. lineitem⋈orders is the one
    // shuffle; customer, supplier, nation all broadcast.
    Q("q7_volume_shipping",
      Some("SELECT sn AS supp_nation, cn AS cust_nation, y AS l_year, " +
        "CAST(sum(rev) AS DOUBLE) AS revenue FROM (" +
        "SELECT n1.n_name AS sn, n2.n_name AS cn, strftime(l_shipdate, '%Y') AS y, " +
        "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(4,2))) AS rev " +
        "FROM lineitem JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN customer ON c_custkey = o_custkey " +
        "JOIN supplier ON s_suppkey = l_suppkey " +
        "JOIN nation n1 ON n1.n_nationkey = s_nationkey " +
        "JOIN nation n2 ON n2.n_nationkey = c_nationkey " +
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' " +
        "AND l_shipdate < TIMESTAMP '1999-01-01' " +
        "AND ((n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_13') " +
        "OR (n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_8'))) " +
        "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),
      (s, dir) => {
        val n1 = tbl(s, dir, "nation").select(
          col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val n2 = tbl(s, dir, "nation").select(
          col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
        val pair = (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_13") ||
          (col("supp_nation") === "NATION_13" && col("cust_nation") === "NATION_8")
        tbl(s, dir, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1999-01-01 00:00:00")))
          .join(tbl(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(tbl(s, dir, "customer")), col("c_custkey") === col("o_custkey"))
          .join(broadcast(tbl(s, dir, "supplier")), col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(n1), col("sn_key") === col("s_nationkey"))
          .join(broadcast(n2), col("cn_key") === col("c_nationkey"))
          .filter(pair)
          .groupBy(col("supp_nation"), col("cust_nation"),
            date_format(col("l_shipdate"), "yyyy").as("l_year"))
          .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2s(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      }),

    // Q8 pattern: national market share — NATION_3's fraction of AMERICA's
    // STANDARD-part order revenue per order year. Ratio of two decimal sums
    // over the same rows (conditional numerator), emitted via the q14
    // double-division pattern.
    Q("q8_market_share",
      Some("WITH t AS (SELECT strftime(o_orderdate, '%Y') AS o_year, " +
        "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(4,2))) AS rev, n1.n_name AS supp_nation " +
        "FROM lineitem JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN customer ON c_custkey = o_custkey " +
        "JOIN part ON p_partkey = l_partkey " +
        "JOIN supplier ON s_suppkey = l_suppkey " +
        "JOIN nation n1 ON n1.n_nationkey = s_nationkey " +
        "JOIN nation n2 ON n2.n_nationkey = c_nationkey " +
        "JOIN region ON r_regionkey = n2.n_regionkey " +
        "WHERE r_name = 'AMERICA' AND p_type = 'STANDARD' " +
        "AND o_orderdate >= TIMESTAMP '1997-01-01' " +
        "AND o_orderdate < TIMESTAMP '1999-01-01') " +
        "SELECT o_year, CAST(CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_3' " +
        "THEN rev END), 0) AS DOUBLE) / CAST(sum(rev) AS DOUBLE) AS DOUBLE) AS mkt_share " +
        "FROM t GROUP BY 1 ORDER BY 1"),
      (s, dir) => {
        val n1 = tbl(s, dir, "nation").select(
          col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val n2 = tbl(s, dir, "nation").select(
          col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_rkey"))
        val rev = dec2(col("l_extendedprice")) * (lit(1) - dec2s(col("l_discount")))
        tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "orders")
            .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
              col("o_orderdate") < to_timestamp(lit("1999-01-01 00:00:00"))),
            col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(tbl(s, dir, "customer")), col("c_custkey") === col("o_custkey"))
          .join(broadcast(tbl(s, dir, "part").filter(col("p_type") === "STANDARD")),
            col("p_partkey") === col("l_partkey"))
          .join(broadcast(tbl(s, dir, "supplier")), col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(n1), col("sn_key") === col("s_nationkey"))
          .join(broadcast(n2), col("cn_key") === col("c_nationkey"))
          .join(broadcast(tbl(s, dir, "region").filter(col("r_name") === "AMERICA")),
            col("r_regionkey") === col("cn_rkey"))
          .withColumn("rev", rev)
          .groupBy(date_format(col("o_orderdate"), "yyyy").as("o_year"))
          .agg((coalesce(sum(when(col("supp_nation") === "NATION_3", col("rev"))), lit(0))
            .cast("double") / sum(col("rev")).cast("double")).as("mkt_share"))
          .orderBy("o_year")
      }),

    // Q9 pattern: product-line profit by supplier nation and year. Supply
    // cost stand-in: half the part's retail price per unit (decimal-exact).
    // profit = rev - qty * cost; all decimal until the final cast.
    Q("q9_product_profit",
      Some("SELECT n_name AS nation, strftime(o_orderdate, '%Y') AS o_year, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(4,2))) - " +
        "CAST(l_quantity AS DECIMAL(12,2)) * " +
        "(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(4,2)))) " +
        "AS DOUBLE) AS profit " +
        "FROM lineitem JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN part ON p_partkey = l_partkey " +
        "JOIN supplier ON s_suppkey = l_suppkey " +
        "JOIN nation ON n_nationkey = s_nationkey " +
        "WHERE p_name LIKE '%widget%' " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
      (s, dir) => {
        val profit = dec2(col("l_extendedprice")) * (lit(1) - dec2s(col("l_discount"))) -
          dec2(col("l_quantity")) * (dec2(col("p_retailprice")) * dec2s(lit(0.5)))
        tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(tbl(s, dir, "part").filter(col("p_name").like("%widget%"))),
            col("p_partkey") === col("l_partkey"))
          .join(broadcast(tbl(s, dir, "supplier")), col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(tbl(s, dir, "nation")), col("n_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name").as("nation"),
            date_format(col("o_orderdate"), "yyyy").as("o_year"))
          .agg(sum(profit).cast("double").as("profit"))
          .orderBy("nation", "o_year")
      }),

    // Q10 pattern: top returned-revenue customers for a quarter. Revenue
    // aggregates on c_custkey (one shuffle); nation broadcast; deterministic
    // top-20 via (revenue DESC, c_custkey) total order.
    Q("q10_returned_items",
      Some("SELECT c_custkey, c_name, CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue, " +
        "c_acctbal, n_name " +
        "FROM lineitem JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN customer ON c_custkey = o_custkey " +
        "JOIN nation ON n_nationkey = c_nationkey " +
        "WHERE l_returnflag = 'R' " +
        "AND o_orderdate >= TIMESTAMP '1997-01-01' " +
        "AND o_orderdate < TIMESTAMP '1997-04-01' " +
        "GROUP BY 1, 2, 4, 5 ORDER BY revenue DESC, c_custkey LIMIT 20"),
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .join(tbl(s, dir, "orders")
            .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
              col("o_orderdate") < to_timestamp(lit("1997-04-01 00:00:00"))),
            col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(tbl(s, dir, "customer")), col("c_custkey") === col("o_custkey"))
          .join(broadcast(tbl(s, dir, "nation")), col("n_nationkey") === col("c_nationkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2s(col("l_discount"))))
            .cast("double").as("revenue"))
          .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)),

    // Q11 pattern: important stock — per-part supplied value from one
    // nation's suppliers, kept when > 1/1000 of that nation's total
    // (HAVING with a scalar subquery). The global total is a one-row
    // aggregate broadcast into the filter; comparison cross-multiplied in
    // exact decimal (no fraction).
    Q("q11_important_stock",
      Some("WITH v AS (SELECT l_partkey, " +
        "sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS val " +
        "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey " +
        "JOIN nation ON n_nationkey = s_nationkey " +
        "WHERE n_name = 'NATION_18' GROUP BY 1) " +
        "SELECT l_partkey, CAST(val AS DOUBLE) AS part_value FROM v " +
        "WHERE val * 1000 > (SELECT sum(val) FROM v) " +
        "ORDER BY part_value DESC, l_partkey"),
      (s, dir) => {
        val v = tbl(s, dir, "lineitem")
          .join(broadcast(tbl(s, dir, "supplier")), col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(tbl(s, dir, "nation").filter(col("n_name") === "NATION_18")),
            col("n_nationkey") === col("s_nationkey"))
          .groupBy("l_partkey")
          .agg(sum(dec2(col("l_extendedprice"))).as("val"))
        val total = v.agg(sum(col("val")).as("total"))
        v.join(broadcast(total))
          .filter(col("val") * 1000 > col("total"))
          .select(col("l_partkey"), col("val").cast("double").as("part_value"))
          .orderBy(col("part_value").desc, col("l_partkey"))
      }),

    // Q13 pattern: customer order-count distribution — LEFT OUTER join so
    // zero-order customers survive, then a histogram of counts. Two
    // aggregations; the first shuffles on c_custkey, the second on the
    // (tiny) count domain.
    Q("q13_customer_distribution",
      Some("WITH c AS (SELECT c_custkey, count(o_orderkey) AS c_count " +
        "FROM customer LEFT JOIN orders ON o_custkey = c_custkey " +
        "AND o_orderpriority <> '5-LOW' GROUP BY 1) " +
        "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM c " +
        "GROUP BY 1 ORDER BY custdist DESC, c_count DESC"),
      (s, dir) =>
        tbl(s, dir, "customer")
          .join(tbl(s, dir, "orders").filter(col("o_orderpriority") =!= "5-LOW"),
            col("o_custkey") === col("c_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)),

    // Q15 pattern: top supplier — quarterly revenue per supplier, keep the
    // arg-max via a scalar-subquery MAX compared in exact decimal (the
    // double cast happens only on output).
    Q("q15_top_supplier",
      Some("WITH r AS (SELECT l_suppkey, " +
        "sum(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' " +
        "AND l_shipdate < TIMESTAMP '1997-04-01' GROUP BY 1) " +
        "SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev " +
        "FROM r JOIN supplier ON s_suppkey = l_suppkey " +
        "WHERE total_rev = (SELECT max(total_rev) FROM r) ORDER BY s_suppkey"),
      (s, dir) => {
        val r = tbl(s, dir, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1997-04-01 00:00:00")))
          .groupBy("l_suppkey")
          .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2s(col("l_discount"))))
            .as("total_rev"))
        val m = r.agg(max(col("total_rev")).as("best"))
        r.join(broadcast(m))
          .filter(col("total_rev") === col("best"))
          .join(broadcast(tbl(s, dir, "supplier")), col("s_suppkey") === col("l_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("total_rev").cast("double").as("total_rev"))
          .orderBy("s_suppkey")
      }),

    // Q17 pattern: small-quantity order revenue — lines below 20% of their
    // part's average quantity. The correlated AVG decorrelates to a window
    // aggregate; the threshold compare is cross-multiplied into exact
    // decimal (5 * cnt * qty < sum_qty) so no division ever happens.
    Q("q17_small_quantity",
      Some("WITH w AS (SELECT l_partkey, l_quantity, l_extendedprice, " +
        "sum(CAST(l_quantity AS DECIMAL(12,2))) OVER (PARTITION BY l_partkey) AS sq, " +
        "count(*) OVER (PARTITION BY l_partkey) AS cnt FROM lineitem " +
        "JOIN part ON p_partkey = l_partkey WHERE p_brand = 'Brand#3' AND p_size < 10) " +
        "SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total " +
        "FROM w WHERE CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt < sq"),
      (s, dir) => {
        val w = Window.partitionBy("l_partkey")
        tbl(s, dir, "lineitem")
          .join(broadcast(tbl(s, dir, "part")
            .filter(col("p_brand") === "Brand#3" && col("p_size") < 10)),
            col("p_partkey") === col("l_partkey"))
          .withColumn("sq", sum(dec2(col("l_quantity"))).over(w))
          .withColumn("cnt", count(lit(1)).over(w))
          .filter(dec2(col("l_quantity")) * 5 * col("cnt") < col("sq"))
          .agg(count(lit(1)).as("n"),
            coalesce(sum(dec2(col("l_extendedprice"))), lit(0)).cast("double").as("total"))
      }),

    // Q20 pattern: suppliers with excess supply of promotable parts —
    // nested IN chain: supplier IN (pairs with total qty over threshold,
    // for parts IN (name-pattern parts)). Inner agg per (part, supplier)
    // with HAVING, then a LEFT SEMI to supplier — no counting join.
    Q("q20_excess_supply",
      Some("SELECT s_suppkey, s_name, n_name FROM supplier " +
        "JOIN nation ON n_nationkey = s_nationkey " +
        "WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem " +
        "WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%') " +
        "AND l_shipdate >= TIMESTAMP '1997-01-01' " +
        "AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY l_suppkey, l_partkey HAVING sum(l_quantity) > 50) " +
        "ORDER BY s_suppkey"),
      (s, dir) => {
        val qualified = tbl(s, dir, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
          .join(broadcast(tbl(s, dir, "part").filter(col("p_name").like("small%"))),
            col("p_partkey") === col("l_partkey"), "left_semi")
          .groupBy("l_suppkey", "l_partkey")
          .agg(sum(col("l_quantity")).as("qty"))
          .filter(col("qty") > 50)
        tbl(s, dir, "supplier")
          .join(broadcast(tbl(s, dir, "nation")), col("n_nationkey") === col("s_nationkey"))
          .join(qualified, col("l_suppkey") === col("s_suppkey"), "left_semi")
          .select("s_suppkey", "s_name", "n_name")
          .orderBy("s_suppkey")
      }),

    // Q21 pattern: suppliers who kept finished orders waiting — "late" is
    // shipped >60 days after order date (no receipt date in this schema).
    // The EXISTS (another supplier on the order) keeps lines via LEFT SEMI;
    // the NOT EXISTS (another LATE supplier on the order) removes them via
    // LEFT ANTI — the canonical semi/anti chain on the same fact.
    Q("q21_waiting_supplier",
      Some("WITH l AS (SELECT l_orderkey, l_suppkey, " +
        "l_shipdate > o_orderdate + INTERVAL '60 days' AS late " +
        "FROM lineitem JOIN orders ON o_orderkey = l_orderkey " +
        "WHERE o_orderstatus = 'F'), " +
        "l1 AS (SELECT l_orderkey, l_suppkey FROM l WHERE late) " +
        "SELECT s_name, CAST(count(*) AS BIGINT) AS numwait FROM l1 " +
        "JOIN supplier ON s_suppkey = l1.l_suppkey " +
        "WHERE EXISTS (SELECT 1 FROM l l2 WHERE l2.l_orderkey = l1.l_orderkey " +
        "AND l2.l_suppkey <> l1.l_suppkey) " +
        "AND NOT EXISTS (SELECT 1 FROM l l3 WHERE l3.l_orderkey = l1.l_orderkey " +
        "AND l3.l_suppkey <> l1.l_suppkey AND l3.late) " +
        "GROUP BY s_name ORDER BY numwait DESC, s_name"),
      (s, dir) => {
        // The semi/anti chain collapses to per-order supplier counts:
        // EXISTS(other supplier)      ⟺ distinct suppliers on order ≥ 2
        // NOT EXISTS(other LATE supp) ⟺ distinct LATE suppliers == 1
        //   (the probe line is itself late, so "no OTHER late supplier"
        //    means the late-supplier set is exactly {sk}).
        // One (orderkey, suppkey) partial-agg pass + one order-keyed
        // window replaces the r8 plan's 30M-row localCheckpoint feeding
        // separate LEFT SEMI and LEFT ANTI joins (r8 probe: that plan
        // measured 8.5×/decade, checkpoint-write-bound at saturated
        // cores) — the fact is now shuffled twice and never materialized.
        val grp = tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "orders").filter(col("o_orderstatus") === "F"),
            col("o_orderkey") === col("l_orderkey"))
          .withColumn("late",
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .groupBy(col("l_orderkey").as("k"), col("l_suppkey").as("sk"))
          .agg(sum(when(col("late"), 1L).otherwise(0L)).as("late_lines"))
        val w = Window.partitionBy("k")
        val out = grp
          .withColumn("ns", count(lit(1)).over(w))
          .withColumn("nls",
            sum(when(col("late_lines") > 0, 1L).otherwise(0L)).over(w))
          .filter(col("late_lines") > 0 && col("ns") >= 2 &&
            col("nls") === 1)
          .join(broadcast(tbl(s, dir, "supplier")),
            col("s_suppkey") === col("sk"))
          .groupBy("s_name")
          .agg(sum("late_lines").cast("long").as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
        out
      }))
}
