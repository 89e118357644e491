package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Fifty-ninth wave: operations-research analytics — an (s,S) inventory
  * policy simulation folded over per-brand daily demand, and chain-ladder
  * development factors from the order-to-ship runoff triangle. The
  * simulation is an exact integer fold (serve → deplete → reorder) per
  * brand; the chain ladder is two tiny reaggregations of the month×delay
  * matrix with cross-multiplied micro factors.
  */
object OpsResearchQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // (s,S) policy: start 1000, reorder point 300, order-up-to 1000,
    // instant replenishment. Per brand over the densified 1995-01 daily
    // demand: serve what stock allows, count lost units and reorders.
    // Brands fold in parallel; the 31-step fold is the per-series
    // contract (state = two BIGINTs).
    Q("orders_inventory_policy_sim",
      Some(
        """WITH RECURSIVE dm AS MATERIALIZED (
          |  SELECT pb.p_brand, sp.day, coalesce(g.qty, 0) AS demand
          |  FROM (SELECT DISTINCT p_brand FROM part) pb
          |  CROSS JOIN (SELECT unnest(range(1, 32)) AS day) sp
          |  LEFT JOIN (SELECT p.p_brand,
          |      CAST(strftime(l.l_shipdate, '%d') AS BIGINT) AS day,
          |      CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
          |    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          |    WHERE strftime(l.l_shipdate, '%Y-%m') = '1995-01'
          |    GROUP BY 1, 2) g
          |    ON g.p_brand = pb.p_brand AND g.day = sp.day),
          |f AS (
          |  SELECT p_brand, 0 AS t, CAST(1000 AS BIGINT) AS stock,
          |    CAST(0 AS BIGINT) AS lost, CAST(0 AS BIGINT) AS reorders
          |  FROM (SELECT DISTINCT p_brand FROM dm)
          |  UNION ALL
          |  SELECT f.p_brand, f.t + 1,
          |    CASE WHEN f.stock - least(f.stock, dm.demand) <= 300
          |      THEN 1000 ELSE f.stock - least(f.stock, dm.demand) END,
          |    f.lost + dm.demand - least(f.stock, dm.demand),
          |    f.reorders + CASE WHEN f.stock - least(f.stock, dm.demand)
          |      <= 300 THEN 1 ELSE 0 END
          |  FROM f JOIN dm ON dm.p_brand = f.p_brand AND dm.day = f.t + 1
          |  WHERE f.t < 31
          |)
          |SELECT p_brand AS brand, stock AS end_stock, lost AS lost_units,
          |  reorders FROM f WHERE t = 31 ORDER BY brand
          |""".stripMargin),
      (s, dir) => {
        val g = tbl(s, dir, "lineitem")
          .filter(date_format(col("l_shipdate"), "yyyy-MM") === "1995-01")
          .join(broadcast(tbl(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("p_partkey") === col("l_partkey"))
          .groupBy(col("p_brand"),
            date_format(col("l_shipdate"), "d").cast("long").as("day"))
          .agg(sum(col("l_quantity").cast("long")).cast("long").as("qty"))
          .localCheckpoint() // brand domain + the dense join
        val brands = tbl(s, dir, "part").select("p_brand").distinct()
        val arr = brands
          .withColumn("day", explode(sequence(lit(1L), lit(31L))))
          .join(g, Seq("p_brand", "day"), "left")
          .withColumn("qty", coalesce(col("qty"), lit(0L)))
          .groupBy("p_brand")
          .agg(transform(array_sort(collect_list(struct(col("day"),
            col("qty")))), p => p.getField("qty")).as("demand"))
        val fold =
          """aggregate(demand,
            |  named_struct('stock', 1000L, 'lost', 0L, 'reorders', 0L),
            |  (st, d) -> named_struct(
            |    'stock', CASE WHEN st.stock - least(st.stock, d) <= 300L
            |      THEN 1000L ELSE st.stock - least(st.stock, d) END,
            |    'lost', st.lost + d - least(st.stock, d),
            |    'reorders', st.reorders +
            |      CASE WHEN st.stock - least(st.stock, d) <= 300L
            |        THEN 1L ELSE 0L END))""".stripMargin
        val out = arr
          .withColumn("st", expr(fold))
          .select(col("p_brand").as("brand"),
            col("st.stock").as("end_stock"),
            col("st.lost").as("lost_units"),
            col("st.reorders").as("reorders"))
          .orderBy("brand")
        H.materialized(out, caches = Nil, checkpoints = Seq(g))
      }),

    // Chain-ladder development factors: cumulative shipped quantity by
    // (order-month cohort, ship-delay) for 1996 cohorts, delays 0-3
    // months; factor f_d = Σ_i C(i,d+1) · 10⁶ // Σ_i C(i,d) over cohorts
    // with BOTH columns (the standard all-cohorts volume-weighted
    // estimator, exact cross-multiplied micro).
    Q("orders_chain_ladder",
      Some(
        """WITH base AS (SELECT
          |  strftime(o.o_orderdate, '%Y-%m') AS cohort,
          |  CAST((CAST(strftime(l.l_shipdate, '%Y') AS BIGINT) * 12
          |    + CAST(strftime(l.l_shipdate, '%m') AS BIGINT))
          |   - (CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) * 12
          |    + CAST(strftime(o.o_orderdate, '%m') AS BIGINT)) AS BIGINT)
          |    AS delay,
          |  CAST(l.l_quantity AS BIGINT) AS qty
          |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          |  WHERE strftime(o.o_orderdate, '%Y') = '1996'),
          |tri AS (SELECT cohort, delay, CAST(sum(qty) AS BIGINT) AS q
          |  FROM base WHERE delay BETWEEN 0 AND 3 GROUP BY cohort, delay),
          |cum AS (SELECT cohort, delay,
          |  CAST(sum(q) OVER (PARTITION BY cohort ORDER BY delay) AS BIGINT)
          |    AS c FROM tri),
          |fac AS (SELECT a.delay AS from_delay,
          |  CAST(sum(a.c) AS BIGINT) AS mass_from,
          |  CAST(sum(b.c) AS BIGINT) AS mass_to
          |  FROM cum a JOIN cum b ON b.cohort = a.cohort
          |    AND b.delay = a.delay + 1
          |  GROUP BY a.delay)
          |SELECT from_delay, mass_from, mass_to,
          |  mass_to * 1000000 // mass_from AS factor_micro
          |FROM fac ORDER BY from_delay
          |""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val base = tbl(s, dir, "orders")
          .filter(date_format(col("o_orderdate"), "yyyy") === "1996")
          .select(col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM").as("cohort"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .cast("long").as("om"))
          .join(tbl(s, dir, "lineitem")
            .select(col("l_orderkey"),
              (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
                .cast("long").as("sm"),
              col("l_quantity").cast("long").as("qty")),
            col("l_orderkey") === col("o_orderkey"))
          .withColumn("delay", col("sm") - col("om"))
          .filter(col("delay").between(0, 3))
        val cum = base.groupBy("cohort", "delay")
          .agg(sum("qty").cast("long").as("q"))
          .withColumn("c", sum("q").over(
            Window.partitionBy("cohort").orderBy("delay")).cast("long"))
          .localCheckpoint() // both sides of the adjacent-delay join
        val out = cum.select(col("cohort"), col("delay"), col("c"))
          .join(cum.select(col("cohort").as("ch2"),
            col("delay").as("d2"), col("c").as("cnext")),
            col("ch2") === col("cohort") &&
              col("d2") === col("delay") + 1)
          .groupBy(col("delay").as("from_delay"))
          .agg(sum("c").cast("long").as("mass_from"),
            sum("cnext").cast("long").as("mass_to"))
          .withColumn("factor_micro",
            expr("mass_to * 1000000 div mass_from"))
          .orderBy("from_delay")
        H.materialized(out, caches = Nil, checkpoints = Seq(cum))
      }))
}
