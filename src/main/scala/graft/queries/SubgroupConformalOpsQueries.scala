package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-9 wave 127: audit/allocation ops that exercise the round's new
  * two-phase primitives at query level — subgroup deviation scanning
  * (hotspot detection over a bounded cell grid), Neyman-optimal labeling
  * budget allocation (exact integer-sqrt sigma masses + largest-remainder
  * rounding), and split-conformal prediction intervals whose calibration
  * quantile is an EXACT distributed selection (value-count histogram +
  * H.globalCumSum — no global sort of the residual stream).
  */
object SubgroupConformalOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // SUBGROUP DEVIATION SCAN (hotspot detection): which (nation,
    // priority) cells have an order-status-F share that deviates most
    // from the global share — the slice-finding audit run before any
    // aggregate metric is trusted (Simpson's-paradox guard, bias scan).
    // All scoring in exact ppm integers (k·10⁶ div n minus K·10⁶ div N);
    // a minimum-support gate (n ≥ 20) keeps noise cells out. Scale
    // shape: ONE map-side-combined pass to the ≤ |nations|×|priorities|
    // cell grid (the broadcast dim attach is the only join); the grid is
    // bounded by construction, so ordering it is free.
    Q("dq_subgroup_scan",
      Some(
        """WITH cells AS (
          |  SELECT c_nationkey AS nation, o_orderpriority AS priority,
          |    CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
          |      AS BIGINT) AS k
          |  FROM orders JOIN customer ON c_custkey = o_custkey
          |  GROUP BY 1, 2),
          |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
          |               CAST(sum(k) AS BIGINT) AS kk FROM cells)
          |SELECT nation, priority, n, k,
          |  CAST(k * 1000000 // n - kk * 1000000 // nn AS BIGINT)
          |    AS dev_ppm
          |FROM cells, tot
          |WHERE n >= 20
          |ORDER BY abs(k * 1000000 // n - kk * 1000000 // nn) DESC,
          |  nation, priority
          |LIMIT 20
          |""".stripMargin),
      (s, dir) => {
        val cells = tbl(s, dir, "orders")
          .join(broadcast(tbl(s, dir, "customer")
            .select("c_custkey", "c_nationkey")),
            col("c_custkey") === col("o_custkey"))
          .groupBy(col("c_nationkey").as("nation"),
            col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
              .cast("long").as("k"))
        val tot = cells.agg(sum("n").cast("long").as("nn"),
          sum("k").cast("long").as("kk"))
        cells.crossJoin(broadcast(tot))
          .filter(col("n") >= 20)
          .withColumn("dev_ppm",
            expr("CAST(k * 1000000 div n - kk * 1000000 div nn AS BIGINT)"))
          .orderBy(abs(col("dev_ppm")).desc, col("nation"), col("priority"))
          .limit(20)
          .select("nation", "priority", "n", "k", "dev_ppm")
      }),

    // NEYMAN-OPTIMAL LABELING BUDGET: allocate k=200 annotation slots
    // across language strata ∝ N_h·σ_h (the allocation minimizing the
    // stratified estimator's variance — Neyman 1934, the standard
    // labeling-budget calculus). Exact integer path: the sigma MASS
    // N_h·σ_h = √(N_h·Σx² − (Σx)²) computed as an integer sqrt (double
    // sqrt + a ±1 correction ladder, exact beyond 2⁵³), then
    // largest-remainder rounding so the allocations sum to EXACTLY k.
    // Proportional allocation reported alongside — the delta per stratum
    // is what the optimal design buys. Scale shape: one map-side pass to
    // the |strata| domain; the remainder windows run on that bounded
    // frame.
    Q("sample_neyman_allocation",
      Some(
        """WITH s AS (
          |  SELECT lang, CAST(count(*) AS BIGINT) AS nh,
          |    CAST(sum(n_chars) AS BIGINT) AS sx,
          |    CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
          |  FROM documents GROUP BY 1),
          |w AS (
          |  SELECT lang, nh, sx, sxx, nh * sxx - sx * sx AS m,
          |    CAST(floor(sqrt(CAST(nh * sxx - sx * sx AS DOUBLE)))
          |      AS BIGINT) AS s0
          |  FROM s),
          |w2 AS (
          |  SELECT lang, nh, m,
          |    CASE WHEN (s0 + 1) * (s0 + 1) <= m THEN s0 + 1
          |         WHEN s0 * s0 > m THEN s0 - 1 ELSE s0 END AS sig
          |  FROM w),
          |t AS (SELECT CAST(sum(sig) AS BIGINT) AS tw,
          |             CAST(sum(nh) AS BIGINT) AS tn FROM w2),
          |alloc AS (
          |  SELECT lang, nh, sig,
          |    200 * sig // tw AS base, 200 * sig % tw AS rem,
          |    200 * nh // tn AS pbase, 200 * nh % tn AS prem
          |  FROM w2, t),
          |fin AS (
          |  SELECT lang, nh, sig, base, pbase,
          |    CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
          |      <= 200 - sum(base) OVER () THEN 1 ELSE 0 END AS extra,
          |    CASE WHEN row_number() OVER (ORDER BY prem DESC, lang)
          |      <= 200 - sum(pbase) OVER () THEN 1 ELSE 0 END AS pextra
          |  FROM alloc)
          |SELECT lang, nh AS n_stratum, sig AS sigma_mass,
          |  CAST(base + extra AS BIGINT) AS alloc_neyman,
          |  CAST(pbase + pextra AS BIGINT) AS alloc_proportional
          |FROM fin ORDER BY lang
          |""".stripMargin),
      (s, dir) => {
        val st = tbl(s, dir, "documents")
          .groupBy("lang")
          .agg(count(lit(1)).cast("long").as("nh"),
            sum("n_chars").cast("long").as("sx"),
            sum(col("n_chars") * col("n_chars")).cast("long").as("sxx"))
          .withColumn("m", col("nh") * col("sxx") - col("sx") * col("sx"))
          .withColumn("s0",
            floor(sqrt(col("m").cast("double"))).cast("long"))
          // exact isqrt: double sqrt is within 1 ulp, one ±1 step corrects
          .withColumn("sig",
            when((col("s0") + 1) * (col("s0") + 1) <= col("m"),
              col("s0") + 1)
              .when(col("s0") * col("s0") > col("m"), col("s0") - 1)
              .otherwise(col("s0")))
        val t = st.agg(sum("sig").cast("long").as("tw"),
          sum("nh").cast("long").as("tn"))
        // |strata| frame: the windows below are bounded by construction
        val alloc = st.crossJoin(broadcast(t))
          .withColumn("base", expr("200 * sig div tw"))
          .withColumn("rem", expr("200 * sig % tw"))
          .withColumn("pbase", expr("200 * nh div tn"))
          .withColumn("prem", expr("200 * nh % tn"))
        val fin = alloc
          .withColumn("extra",
            when(row_number().over(Window.orderBy(col("rem").desc,
              col("lang"))) <= lit(200) -
              sum("base").over(Window.partitionBy()), 1L).otherwise(0L))
          .withColumn("pextra",
            when(row_number().over(Window.orderBy(col("prem").desc,
              col("lang"))) <= lit(200) -
              sum("pbase").over(Window.partitionBy()), 1L).otherwise(0L))
        fin.select(col("lang"), col("nh").as("n_stratum"),
            col("sig").as("sigma_mass"),
            (col("base") + col("extra")).cast("long").as("alloc_neyman"),
            (col("pbase") + col("pextra")).cast("long")
              .as("alloc_proportional"))
          .orderBy("lang")
      }),

    // SPLIT-CONFORMAL PREDICTION INTERVAL: train/calibration split by a
    // pure id hash (resharding-safe); the "model" is the per-event-type
    // exact micro-mean from TRAIN; the interval half-width q is the
    // ⌈0.9·(n+1)⌉-th smallest absolute residual on CALIBRATION — the
    // distribution-free 90% guarantee (Vovk et al.; Lei et al. 2018,
    // both public). q is found WITHOUT sorting the residual stream: the
    // residuals reduce to a value-count histogram and H.globalCumSum
    // walks the (bounded-by-distinct-values) domain — the same exact
    // selection a 100 TB run needs. The audit verifies the guarantee:
    // calibration coverage at q must be ≥ 900 permille by construction.
    Q("stats_conformal_interval",
      Some(
        """WITH ev AS (
          |  SELECT event_type, event_id,
          |    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS y
          |  FROM events),
          |tr AS (SELECT * FROM ev WHERE event_id % 5 <> 0),
          |model AS (
          |  SELECT event_type,
          |    CAST(sum(y) // count(*) AS BIGINT) AS yhat
          |  FROM tr GROUP BY 1),
          |cal AS (
          |  SELECT abs(y - yhat) AS r
          |  FROM ev JOIN model USING (event_type) WHERE event_id % 5 = 0),
          |n AS (SELECT CAST(count(*) AS BIGINT) AS nc FROM cal),
          |q AS (
          |  SELECT r AS q_micro FROM cal, n
          |  ORDER BY r LIMIT 1
          |  OFFSET (SELECT CAST(ceil(0.9 * (nc + 1)) AS BIGINT) - 1 FROM n))
          |SELECT
          |  (SELECT CAST(count(*) AS BIGINT) FROM tr) AS n_train,
          |  (SELECT nc FROM n) AS n_calib,
          |  (SELECT q_micro FROM q) AS q_micro,
          |  (SELECT CAST(sum(CASE WHEN r <= (SELECT q_micro FROM q)
          |      THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
          |    FROM cal) AS coverage_permille,
          |  (SELECT CASE WHEN (SELECT CAST(sum(CASE WHEN r <=
          |      (SELECT q_micro FROM q) THEN 1 ELSE 0 END) * 1000
          |      // count(*) AS BIGINT) FROM cal) >= 900
          |    THEN 1 ELSE 0 END) AS guarantee_met
          |""".stripMargin),
      (s, dir) => {
        val ev = H.events(s, dir)
          .select(col("event_type"), col("event_id"),
            floor(col("value") * 1000000 + lit(0.5)).cast("long").as("y"))
        val tr = ev.filter(pmod(col("event_id"), lit(5)) =!= 0)
        val model = tr.groupBy("event_type")
          .agg(expr("CAST(sum(y) div count(1) AS BIGINT)").as("yhat"))
        val cal = ev.filter(pmod(col("event_id"), lit(5)) === 0)
          .join(broadcast(model), Seq("event_type"))
          .select(abs(col("y") - col("yhat")).as("r"))
        // exact distributed selection: histogram + two-phase prefix sum
        val hist = cal.groupBy("r").agg(count(lit(1)).as("c"))
        val (cum, pp) = H.globalCumSum(hist, Seq(col("r")), col("c"), "cum")
        val nC = cal.agg(count(lit(1)).cast("long").as("nc"))
        val qv = cum.crossJoin(broadcast(nC))
          .filter(col("cum") >= ceil(lit(0.9) * (col("nc") + 1)))
          .agg(min("r").as("q_micro"))
        val cov = cal.crossJoin(broadcast(qv))
          .agg(expr("CAST(sum(CASE WHEN r <= q_micro THEN 1 ELSE 0 END)" +
            " * 1000 div count(1) AS BIGINT)").as("coverage_permille"))
        val out = tr.agg(count(lit(1)).cast("long").as("n_train"))
          .crossJoin(broadcast(nC))
          .crossJoin(broadcast(qv))
          .crossJoin(broadcast(cov))
          .select(col("n_train"), col("nc").as("n_calib"), col("q_micro"),
            col("coverage_permille"),
            when(col("coverage_permille") >= 900, 1L).otherwise(0L)
              .as("guarantee_met"))
        H.materialized(out, caches = Nil, checkpoints = Seq(pp))
      })
  )
}
