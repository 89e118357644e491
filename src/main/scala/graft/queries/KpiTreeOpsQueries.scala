package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Hundred-seventeenth wave: pricing dynamics, contract enforcement,
  * and KPI algebra — temporal price stickiness per part (how long a
  * unit price survives before repricing), a schema contract check
  * (expected vs observed columns AND types, with missing/extra/drift
  * statuses computed, not asserted), and the multiplicative AOV tree
  * decomposed into exactly-additive log factors (lines/order ×
  * qty/line × price/qty — the KPI bridge that always reconciles).
  *
  * Exactness: price runs are integer change counts over per-part
  * total-ordered windows; the contract compares normalized type names
  * from each engine's own catalog; each log factor quantizes to micro
  * with the residual emitted rather than hidden.
  */
object KpiTreeOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Price stickiness: per part, unit prices (milli-cents) in ship
    // order — how many price RUNS, the mean run length in milli, and
    // the census of parts by repricing intensity. Windows are per-part
    // (parallel); ties in the corpus's non-unique line key break by
    // the price itself, keeping the order total.
    Q("part_price_stickiness",
      Some(
        """WITH u AS (SELECT l_partkey AS pk, l_shipdate, l_orderkey,
          |  l_linenumber,
          |  CAST(CAST(floor(l_extendedprice*100 + 0.5) AS HUGEINT)
          |    * 1000 // CAST(l_quantity AS BIGINT) AS BIGINT) AS pm
          |  FROM lineitem),
          |r AS (SELECT pk, pm,
          |  CASE WHEN lag(pm) OVER w IS NULL OR pm <> lag(pm) OVER w
          |    THEN 1 ELSE 0 END AS brk
          |  FROM u WINDOW w AS (PARTITION BY pk
          |    ORDER BY l_shipdate, l_orderkey, l_linenumber, pm)),
          |a AS (SELECT pk, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(brk) AS BIGINT) AS runs FROM r GROUP BY 1
          |  HAVING count(*) >= 8),
          |b AS (SELECT pk, n, runs, n * 1000 // runs AS mrl FROM a)
          |SELECT
          |  CAST(count(*) AS BIGINT) AS n_parts,
          |  CAST(sum(n) AS BIGINT) AS n_lines,
          |  CAST(sum(runs) AS BIGINT) AS n_price_runs,
          |  CAST(sum(n) * 1000 // sum(runs) AS BIGINT)
          |    AS mean_run_len_milli,
          |  CAST(sum(CASE WHEN mrl >= 2000 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS sticky_parts,
          |  CAST(sum(CASE WHEN runs = n THEN 1 ELSE 0 END) AS BIGINT)
          |    AS fully_fluid_parts
          |FROM b
          |""".stripMargin),
      (s, dir) => {
        val u = tbl(s, dir, "lineitem")
          .select(col("l_partkey").as("pk"), col("l_shipdate"),
            col("l_orderkey"), col("l_linenumber"),
            expr("CAST(CAST(floor(l_extendedprice*100 + 0.5)" +
              " AS DECIMAL(38,0)) * 1000" +
              " div CAST(l_quantity AS BIGINT) AS BIGINT)").as("pm"))
        val w = Window.partitionBy("pk")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "pm")
        val r = u.withColumn("brk",
          when(lag("pm", 1).over(w).isNull ||
            col("pm") =!= lag("pm", 1).over(w), 1).otherwise(0))
        val a = r.groupBy("pk")
          .agg(count(lit(1)).cast("long").as("n"),
            sum(col("brk")).cast("long").as("runs"))
          .filter(col("n") >= 8)
          .withColumn("mrl", expr("n * 1000 div runs"))
        a.agg(count(lit(1)).cast("long").as("n_parts"),
            sum(col("n")).cast("long").as("n_lines"),
            sum(col("runs")).cast("long").as("n_price_runs"),
            expr("sum(n) * 1000 div sum(runs)").cast("long")
              .as("mean_run_len_milli"),
            sum(when(col("mrl") >= 2000, 1L).otherwise(0L))
              .cast("long").as("sticky_parts"),
            sum(when(col("runs") === col("n"), 1L).otherwise(0L))
              .cast("long").as("fully_fluid_parts"))
      }),

    // Schema contract: the declared contract (a VALUES list, including
    // one column the data does NOT have) checked against each engine's
    // OWN catalog view of the orders table — statuses ok / type_drift
    // / missing / extra are computed by the full-outer join, and the
    // type names normalize through a shared CASE. The ingestion gate
    // that catches silent upstream schema changes before they land.
    Q("dq_schema_contract",
      Some(
        """WITH obs AS (SELECT column_name AS col_name,
          |  CASE lower(column_type)
          |    WHEN 'bigint' THEN 'long' WHEN 'double' THEN 'double'
          |    WHEN 'varchar' THEN 'string' WHEN 'integer' THEN 'int'
          |    WHEN 'timestamp' THEN 'timestamp' ELSE lower(column_type)
          |  END AS otype
          |  FROM (DESCRIBE SELECT * FROM orders)),
          |exp(col_name, etype) AS (VALUES
          |  ('o_orderkey', 'long'), ('o_custkey', 'long'),
          |  ('o_orderstatus', 'string'), ('o_totalprice', 'double'),
          |  ('o_orderdate', 'timestamp'), ('o_comment', 'string'))
          |SELECT coalesce(exp.col_name, obs.col_name) AS col_name,
          |  coalesce(exp.etype, '-') AS expected_type,
          |  coalesce(obs.otype, '-') AS observed_type,
          |  CASE WHEN exp.col_name IS NULL THEN 'extra'
          |       WHEN obs.col_name IS NULL THEN 'missing'
          |       WHEN exp.etype = obs.otype THEN 'ok'
          |       ELSE 'type_drift' END AS status
          |FROM exp FULL OUTER JOIN obs ON obs.col_name = exp.col_name
          |ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val obs = tbl(s, dir, "orders").schema.fields.toSeq
          .map(f => (f.name, f.dataType.simpleString))
          .toDF("col_name", "otype")
          .withColumn("otype",
            when(col("otype") === "bigint", "long")
              .otherwise(col("otype")))
        val exp = Seq(
          ("o_orderkey", "long"), ("o_custkey", "long"),
          ("o_orderstatus", "string"), ("o_totalprice", "double"),
          ("o_orderdate", "timestamp"), ("o_comment", "string"))
          .toDF("ecol", "etype")
        exp.join(obs, col("col_name") === col("ecol"), "full_outer")
          .select(coalesce(col("ecol"), col("col_name")).as("col_name"),
            coalesce(col("etype"), lit("-")).as("expected_type"),
            coalesce(col("otype"), lit("-")).as("observed_type"),
            when(col("ecol").isNull, "extra")
              .when(col("otype").isNull, "missing")
              .when(col("etype") === col("otype"), "ok")
              .otherwise("type_drift").as("status"))
          .orderBy("col_name")
      }),

    // AOV KPI tree, 1996 → 1997: average order value factors EXACTLY
    // as (lines/order)·(qty/line)·(cents/qty), so the log changes add
    // up — each factor's Δln quantizes to micro, and the residual vs
    // Δln(AOV) is emitted (it is the quantization dust, nothing else).
    // The decomposition that tells you WHICH lever moved the KPI.
    Q("orders_kpi_tree",
      Some(
        """WITH f AS (SELECT year(o.o_orderdate) AS yr,
          |  CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS orders,
          |  CAST(count(*) AS BIGINT) AS lines,
          |  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
          |  CAST(sum(CAST(floor(l.l_extendedprice*100 + 0.5)
          |    AS BIGINT)) AS BIGINT) AS cents
          |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          |  WHERE year(o.o_orderdate) IN (1996, 1997) GROUP BY 1),
          |p AS (SELECT
          |  max(CASE WHEN yr = 1996 THEN orders END) AS o0,
          |  max(CASE WHEN yr = 1996 THEN lines END) AS l0,
          |  max(CASE WHEN yr = 1996 THEN qty END) AS q0,
          |  max(CASE WHEN yr = 1996 THEN cents END) AS c0,
          |  max(CASE WHEN yr = 1997 THEN orders END) AS o1,
          |  max(CASE WHEN yr = 1997 THEN lines END) AS l1,
          |  max(CASE WHEN yr = 1997 THEN qty END) AS q1,
          |  max(CASE WHEN yr = 1997 THEN cents END) AS c1 FROM f),
          |d AS (SELECT
          |  CAST(floor(ln(CAST(l1 AS DOUBLE)/CAST(o1 AS DOUBLE)
          |    / (CAST(l0 AS DOUBLE)/CAST(o0 AS DOUBLE))) * 1000000.0)
          |    AS BIGINT) AS dln_lines_per_order,
          |  CAST(floor(ln(CAST(q1 AS DOUBLE)/CAST(l1 AS DOUBLE)
          |    / (CAST(q0 AS DOUBLE)/CAST(l0 AS DOUBLE))) * 1000000.0)
          |    AS BIGINT) AS dln_qty_per_line,
          |  CAST(floor(ln(CAST(c1 AS DOUBLE)/CAST(q1 AS DOUBLE)
          |    / (CAST(c0 AS DOUBLE)/CAST(q0 AS DOUBLE))) * 1000000.0)
          |    AS BIGINT) AS dln_price_per_qty,
          |  CAST(floor(ln(CAST(c1 AS DOUBLE)/CAST(o1 AS DOUBLE)
          |    / (CAST(c0 AS DOUBLE)/CAST(o0 AS DOUBLE))) * 1000000.0)
          |    AS BIGINT) AS dln_aov FROM p)
          |SELECT dln_lines_per_order, dln_qty_per_line,
          |  dln_price_per_qty, dln_aov,
          |  CAST(dln_aov - dln_lines_per_order - dln_qty_per_line
          |    - dln_price_per_qty AS BIGINT) AS residual_micro
          |FROM d
          |""".stripMargin),
      (s, dir) => {
        val f = tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "orders")
              .select(col("o_orderkey"), year(col("o_orderdate"))
                .as("yr"))
              .filter(col("yr").isin(1996, 1997)),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("yr")
          .agg(countDistinct(col("o_orderkey")).cast("long")
              .as("orders"),
            count(lit(1)).cast("long").as("lines"),
            sum(col("l_quantity").cast("long")).cast("long").as("qty"),
            sum(floor(col("l_extendedprice") * 100 + lit(0.5))
              .cast("long")).cast("long").as("cents"))
        def cell(y: Int, f0: String) =
          max(when(col("yr") === y, col(f0)))
        val p = f.agg(cell(1996, "orders").as("o0"),
          cell(1996, "lines").as("l0"), cell(1996, "qty").as("q0"),
          cell(1996, "cents").as("c0"), cell(1997, "orders").as("o1"),
          cell(1997, "lines").as("l1"), cell(1997, "qty").as("q1"),
          cell(1997, "cents").as("c1"))
        def d(c: String) = col(c).cast("double")
        def dln(a1: String, b1: String, a0: String, b0: String) =
          floor(log(d(a1) / d(b1) / (d(a0) / d(b0))) * 1000000.0d)
            .cast("long")
        p.select(dln("l1", "o1", "l0", "o0").as("dln_lines_per_order"),
            dln("q1", "l1", "q0", "l0").as("dln_qty_per_line"),
            dln("c1", "q1", "c0", "q0").as("dln_price_per_qty"),
            dln("c1", "o1", "c0", "o0").as("dln_aov"))
          .withColumn("residual_micro",
            (col("dln_aov") - col("dln_lines_per_order") -
              col("dln_qty_per_line") - col("dln_price_per_qty"))
              .cast("long"))
      })
  )
}
