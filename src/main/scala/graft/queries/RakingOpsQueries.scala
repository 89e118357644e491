package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Seventy-ninth wave: weighting and diagnostics operators — iterative
  * proportional fitting (survey raking) of the nation×segment customer
  * grid to mixed targets, a Friedman rank test across segments blocked
  * by nation (the nonparametric repeated-measures ANOVA), a skew-salting
  * planner over per-user event counts (the AQE-style "which keys need
  * how many salt buckets" audit as a first-class query), and a
  * Breusch-Pagan heteroskedasticity screen on the order-value trend
  * (residual² regressed back on the regressor, LM = n·R²).
  *
  * All iteration is bounded and unrolled (4 IPF sweeps over a 125-cell
  * broadcast grid); every multi-row reduction is an integer sum with
  * magnitude-audited quantization; doubles appear only in per-row
  * fixed IEEE chains identical across engines.
  */
object RakingOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // IPF / raking: rake the observed (nation, segment) customer counts
    // to row targets = observed nation totals and column targets =
    // uniform segment shares (S div 5). Two full row+column sweeps in
    // exact micro-integer arithmetic — truncating division, identical
    // in both engines on the non-negative operands. The fact table is
    // touched once (the joint census); every sweep is arithmetic on the
    // bounded 125-cell grid. 100 TB shape: raking any k-dim grid costs
    // one keyed aggregation + O(cells) per sweep.
    Q("stats_ipf_raking",
      Some(
        """WITH j AS (SELECT c_nationkey AS nk, c_mktsegment AS seg,
          |  CAST(count(*) AS BIGINT) AS n FROM customer GROUP BY 1, 2),
          |rt AS (SELECT nk, sum(n) AS tgt FROM j GROUP BY 1),
          |s AS (SELECT sum(n) AS s FROM j),
          |ct AS (SELECT seg, s.s // 5 AS tgt FROM
          |  (SELECT DISTINCT seg FROM j), s),
          |w0 AS (SELECT nk, seg, n, CAST(1000000 AS BIGINT) AS w FROM j),
          |r1s AS (SELECT nk, sum(n * w) AS rs FROM w0 GROUP BY 1),
          |r1 AS (SELECT w0.nk, w0.seg, w0.n,
          |  w0.w * (rt.tgt * 1000000) // r1s.rs AS w
          |  FROM w0 JOIN rt ON rt.nk = w0.nk JOIN r1s ON r1s.nk = w0.nk),
          |c1s AS (SELECT seg, sum(n * w) AS cs FROM r1 GROUP BY 1),
          |c1 AS (SELECT r1.nk, r1.seg, r1.n,
          |  r1.w * (ct.tgt * 1000000) // c1s.cs AS w
          |  FROM r1 JOIN ct ON ct.seg = r1.seg JOIN c1s ON c1s.seg = r1.seg),
          |r2s AS (SELECT nk, sum(n * w) AS rs FROM c1 GROUP BY 1),
          |r2 AS (SELECT c1.nk, c1.seg, c1.n,
          |  c1.w * (rt.tgt * 1000000) // r2s.rs AS w
          |  FROM c1 JOIN rt ON rt.nk = c1.nk JOIN r2s ON r2s.nk = c1.nk),
          |c2s AS (SELECT seg, sum(n * w) AS cs FROM r2 GROUP BY 1),
          |c2 AS (SELECT r2.nk, r2.seg, r2.n,
          |  r2.w * (ct.tgt * 1000000) // c2s.cs AS w
          |  FROM r2 JOIN ct ON ct.seg = r2.seg JOIN c2s ON c2s.seg = r2.seg)
          |SELECT CAST(nk AS BIGINT) AS nationkey, seg AS mktsegment,
          |  n, CAST(w AS BIGINT) AS w_micro,
          |  CAST(n * w // 1000000 AS BIGINT) AS raked_mass
          |FROM c2 ORDER BY 1, 2
          |""".stripMargin),
      (s, dir) => {
        val j = tbl(s, dir, "customer")
          .groupBy(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"))
          .agg(count(lit(1)).cast("long").as("n"))
          .localCheckpoint() // bounded 125-cell grid; sweeps never rescan
        val rt = j.groupBy("nk").agg(sum("n").as("rtgt"))
        val tot = j.agg(sum("n").as("s"))
        val ct = j.select("seg").distinct().crossJoin(broadcast(tot))
          .select(col("seg"), expr("s div 5").as("ctgt"))
        def rowSweep(g: DataFrame): DataFrame =
          g.groupBy(col("nk").as("rk")).agg(sum(expr("n * w")).as("rs"))
            .join(g, col("rk") === col("nk"))
            .join(broadcast(rt.withColumnRenamed("nk", "tk")),
              col("tk") === col("nk"))
            .select(col("nk"), col("seg"), col("n"),
              expr("w * (rtgt * 1000000) div rs").as("w"))
        def colSweep(g: DataFrame): DataFrame =
          g.groupBy(col("seg").as("cseg")).agg(sum(expr("n * w")).as("cs"))
            .join(g, col("cseg") === col("seg"))
            .join(broadcast(ct.withColumnRenamed("seg", "tseg")),
              col("tseg") === col("seg"))
            .select(col("nk"), col("seg"), col("n"),
              expr("w * (ctgt * 1000000) div cs").as("w"))
        val w0 = j.withColumn("w", lit(1000000L))
        val out = colSweep(rowSweep(colSweep(rowSweep(w0))))
          .select(col("nk").cast("long").as("nationkey"),
            col("seg").as("mktsegment"), col("n"),
            col("w").cast("long").as("w_micro"),
            expr("n * w div 1000000").cast("long").as("raked_mass"))
          .orderBy("nationkey", "mktsegment")
        H.materialized(out, Nil, Seq(j))
      }),

    // Friedman rank test: blocks = nations, treatments = market
    // segments, measure = truncated mean account balance cents per
    // cell. Ranks within each block use doubled average ranks
    // (2·minrank + ties − 1: integers even under ties), so the
    // statistic F = 3·ΣR2_j²/(n·k·(k+1)) − 3n(k+1) is exact integer
    // milli. Only the cell census touches the fact table; ranking runs
    // on the bounded block×treatment grid.
    Q("stats_friedman_test",
      Some(
        """WITH cell AS (SELECT c_nationkey AS nk, c_mktsegment AS seg,
          |  CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
          |    // count(*) AS BIGINT) AS v
          |  FROM customer GROUP BY 1, 2),
          |full_blocks AS (SELECT nk FROM cell GROUP BY 1
          |  HAVING count(*) = (SELECT count(DISTINCT seg) FROM cell)),
          |r AS (SELECT c.nk, c.seg, c.v,
          |  rank() OVER (PARTITION BY c.nk ORDER BY c.v) AS mr,
          |  count(*) OVER (PARTITION BY c.nk, c.v) AS ties
          |  FROM cell c JOIN full_blocks fb ON fb.nk = c.nk),
          |r2 AS (SELECT seg, sum(2 * mr + ties - 1) AS rsum2 FROM r
          |  GROUP BY 1),
          |dims AS (SELECT CAST(count(DISTINCT nk) AS BIGINT) AS n,
          |  CAST(count(DISTINCT seg) AS BIGINT) AS k FROM r)
          |SELECT r2.seg AS mktsegment, CAST(r2.rsum2 AS BIGINT) AS rank2_sum,
          |  dims.n AS n_blocks, dims.k AS k_treatments,
          |  CAST(3000 * (SELECT sum(rsum2 * rsum2) FROM r2)
          |      // (dims.n * dims.k * (dims.k + 1))
          |    - 3000 * dims.n * (dims.k + 1) AS BIGINT) AS friedman_milli
          |FROM r2, dims ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val cell = tbl(s, dir, "customer")
          .groupBy(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"))
          .agg(expr("sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))" +
            " div count(*)").cast("long").as("v"))
          .localCheckpoint() // bounded 125-cell grid
        val kSegs = cell.agg(countDistinct("seg").as("kk"))
        val fullBlocks = cell.groupBy("nk").agg(count(lit(1)).as("nc"))
          .crossJoin(broadcast(kSegs))
          .filter(col("nc") === col("kk")).select(col("nk").as("fbk"))
        val r = cell.join(broadcast(fullBlocks), col("nk") === col("fbk"))
          .withColumn("mr", rank().over(
            Window.partitionBy("nk").orderBy("v")))
          .withColumn("ties", count(lit(1)).over(
            Window.partitionBy("nk", "v")))
        val r2 = r.groupBy("seg")
          .agg(sum(expr("2 * mr + ties - 1")).as("rsum2"))
          .localCheckpoint()
        val dims = r.agg(countDistinct("nk").cast("long").as("n"),
          countDistinct("seg").cast("long").as("k"))
        val ssum = r2.agg(sum(expr("rsum2 * rsum2")).as("ss"))
        val out = r2.crossJoin(broadcast(dims)).crossJoin(broadcast(ssum))
          .select(col("seg").as("mktsegment"),
            col("rsum2").cast("long").as("rank2_sum"),
            col("n").as("n_blocks"), col("k").as("k_treatments"),
            expr("3000 * ss div (n * k * (k + 1)) - 3000 * n * (k + 1)")
              .cast("long").as("friedman_milli"))
          .orderBy("mktsegment")
        H.materialized(out, Nil, Seq(cell, r2))
      }),

    // Skew-salting planner: per-user event counts vs the mean, salt
    // factor = buckets needed so no bucket exceeds 4x the mean key
    // mass — the exact arithmetic an AQE-style skew mitigation (or a
    // manual salted join) needs, surfaced as an audit table of the top
    // 20 heaviest keys. One keyed aggregation + a 1-row broadcast of
    // global stats; the top-k is a TakeOrdered, never a global sort.
    Q("pipeline_skew_planner",
      Some(
        """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
          |  FROM events GROUP BY 1),
          |g AS (SELECT CAST(sum(cnt) AS BIGINT) AS s,
          |  CAST(count(*) AS BIGINT) AS nu,
          |  sum(cnt) // count(*) AS mean FROM u)
          |SELECT u.user_id, u.cnt,
          |  CAST(u.cnt * 1000000 // g.mean AS BIGINT) AS skew_ratio_micro,
          |  CAST((u.cnt + 4 * g.mean - 1) // (4 * g.mean) AS BIGINT)
          |    AS salt_factor,
          |  CAST((SELECT count(*) FROM u u2, g g2
          |    WHERE u2.cnt > 4 * g2.mean) AS BIGINT) AS n_keys_salted
          |FROM u, g ORDER BY u.cnt DESC, u.user_id LIMIT 20
          |""".stripMargin),
      (s, dir) => {
        val u = H.events(s, dir)
          .groupBy("user_id").agg(count(lit(1)).cast("long").as("cnt"))
          .localCheckpoint()
        val g = u.agg(sum("cnt").cast("long").as("s"),
          count(lit(1)).cast("long").as("nu"),
          expr("sum(cnt) div count(*)").as("mean"))
        val salted = u.crossJoin(broadcast(g))
          .filter(col("cnt") > lit(4) * col("mean"))
          .agg(count(lit(1)).cast("long").as("n_keys_salted"))
        val out = u.crossJoin(broadcast(g)).crossJoin(broadcast(salted))
          .select(col("user_id"), col("cnt"),
            expr("cnt * 1000000 div mean").cast("long")
              .as("skew_ratio_micro"),
            expr("(cnt + 4 * mean - 1) div (4 * mean)").cast("long")
              .as("salt_factor"),
            col("n_keys_salted"))
          .orderBy(col("cnt").desc, col("user_id")).limit(20)
        H.materialized(out, Nil, Seq(u))
      }),

    // Breusch-Pagan heteroskedasticity screen per order priority:
    // stage 1 regresses order value (whole dollars) on order date (day
    // index) from exact integer moments; stage 2 quantizes each
    // squared residual to millions (floor of a per-row IEEE chain —
    // deterministic), regresses it back on the regressor, and reports
    // LM = n·R². Σz² stays under 2e18 at 10x sf1. Two scans of orders
    // (moments, then residuals), both map-side-combinable keyed
    // aggregations.
    Q("dq_breusch_pagan",
      Some("WITH o AS (SELECT o_orderpriority AS pr, " +
        "CAST(date_diff('day', TIMESTAMP '1992-01-01', " +
        "CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS x, " +
        "CAST(floor(o_totalprice) AS BIGINT) AS y FROM orders), " +
        "m AS (SELECT pr, CAST(count(*) AS DOUBLE) AS n, " +
        "CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) AS sx, " +
        "CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy, " +
        "CAST(CAST(sum(x * x) AS BIGINT) AS DOUBLE) AS sxx, " +
        "CAST(CAST(sum(x * y) AS BIGINT) AS DOUBLE) AS sxy " +
        "FROM o GROUP BY 1), " +
        "cf AS (SELECT pr, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b, " +
        "(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a " +
        "FROM m), " +
        "z AS (SELECT o.pr, o.x, CAST(floor((CAST(o.y AS DOUBLE) - " +
        "(cf.a + cf.b * CAST(o.x AS DOUBLE))) * (CAST(o.y AS DOUBLE) - " +
        "(cf.a + cf.b * CAST(o.x AS DOUBLE))) / 1000000.0) AS BIGINT) AS z " +
        "FROM o JOIN cf ON cf.pr = o.pr), " +
        "m2 AS (SELECT pr, CAST(count(*) AS DOUBLE) AS n, " +
        "CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) AS sx, " +
        "CAST(CAST(sum(z) AS BIGINT) AS DOUBLE) AS sz, " +
        "CAST(CAST(sum(x * x) AS BIGINT) AS DOUBLE) AS sxx, " +
        "CAST(CAST(sum(x * z) AS BIGINT) AS DOUBLE) AS sxz, " +
        "CAST(CAST(sum(z * z) AS BIGINT) AS DOUBLE) AS szz " +
        "FROM z GROUP BY 1) " +
        "SELECT pr AS o_orderpriority, CAST(n AS BIGINT) AS n, " +
        "CASE WHEN (n * sxx - sx * sx) * (n * szz - sz * sz) <= 0.0 " +
        "THEN 0.0 ELSE n * ((n * sxz - sx * sz) * (n * sxz - sx * sz)) / " +
        "((n * sxx - sx * sx) * (n * szz - sz * sz)) END AS lm_stat " +
        "FROM m2 ORDER BY 1"),
      (s, dir) => {
        val o = tbl(s, dir, "orders").select(
            col("o_orderpriority").as("pr"),
            datediff(col("o_orderdate"), lit("1992-01-01").cast("timestamp"))
              .cast("long").as("x"),
            floor(col("o_totalprice")).cast("long").as("y"))
          .localCheckpoint() // two passes: moments, then residuals
        val m = o.groupBy("pr").agg(
          count(lit(1)).cast("double").as("n"),
          sum("x").cast("long").cast("double").as("sx"),
          sum("y").cast("long").cast("double").as("sy"),
          sum(expr("x * x")).cast("long").cast("double").as("sxx"),
          sum(expr("x * y")).cast("long").cast("double").as("sxy"))
        val cf = m.select(col("pr").as("cpr"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx"))).as("b"),
          ((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
            col("n")).as("a"))
        val resid = col("y").cast("double") -
          (col("a") + col("b") * col("x").cast("double"))
        val z = o.join(broadcast(cf), col("pr") === col("cpr"))
          .select(col("pr"), col("x"),
            floor(resid * resid / lit(1000000.0)).cast("long").as("z"))
        val m2 = z.groupBy("pr").agg(
          count(lit(1)).cast("double").as("n"),
          sum("x").cast("long").cast("double").as("sx"),
          sum("z").cast("long").cast("double").as("sz"),
          sum(expr("x * x")).cast("long").cast("double").as("sxx"),
          sum(expr("x * z")).cast("long").cast("double").as("sxz"),
          sum(expr("z * z")).cast("long").cast("double").as("szz"))
        val varx = col("n") * col("sxx") - col("sx") * col("sx")
        val varz = col("n") * col("szz") - col("sz") * col("sz")
        val cov = col("n") * col("sxz") - col("sx") * col("sz")
        val out = m2.select(col("pr").as("o_orderpriority"),
            col("n").cast("long").as("n"),
            when(varx * varz <= 0.0, 0.0)
              .otherwise(col("n") * (cov * cov) / (varx * varz))
              .as("lm_stat"))
          .orderBy("o_orderpriority")
        H.materialized(out, Nil, Seq(o))
      }))
}
