package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Hundred-fifteenth wave: ordered repeated measures, aggregation
  * paradoxes, and stationarity — Page's L trend test (blocks = nations,
  * ordered treatments = priorities; the directional sibling of
  * Friedman), a Simpson's-paradox detector (does the pooled
  * urgent-vs-rest return-rate direction flip against the per-segment
  * majority?), and a Dickey-Fuller unit-root check on daily revenue
  * (is the series mean-reverting or a random walk?).
  *
  * Exactness: within-block ranks ride at 2× with average ties from
  * per-block histograms; direction flags are integer cross-multiplied
  * comparisons; the DF regression uses n-scaled HUGEINT moments with
  * one micro-floored chain for the t statistic.
  */
object PageTrendOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Page's L: blocks = customer nations, treatments = the five
    // priorities in their natural order, value = mean order cents
    // (cross-multiplied exact comparisons inside each block's rank).
    // L2 = Σ_j j·R2_j with within-block ranks at 2×; the null moments
    // are closed-form integers. Rejects when spend rises MONOTONICALLY
    // with priority — the ordered question Friedman can't ask.
    Q("stats_page_trend",
      Some(
        """WITH b AS (SELECT n.n_name AS blk, o.o_orderpriority AS trt,
          |  CAST(sum(CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
          |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          |  JOIN nation n ON n.n_nationkey = c.c_nationkey
          |  GROUP BY 1, 2),
          |r AS (SELECT blk, trt,
          |  CAST(2 * rank() OVER (PARTITION BY blk
          |      ORDER BY s * 1000000 // n)
          |    + count(*) OVER (PARTITION BY blk,
          |      s * 1000000 // n) - 1 AS BIGINT) AS r2
          |  FROM b),
          |j AS (SELECT trt,
          |  CASE trt WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
          |    WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
          |    ELSE 5 END AS ord, CAST(sum(r2) AS BIGINT) AS r2sum
          |  FROM r GROUP BY 1),
          |t AS (SELECT CAST(sum(ord * r2sum) AS BIGINT) AS l2,
          |  CAST((SELECT count(DISTINCT blk) FROM b) AS BIGINT) AS nb
          |  FROM j)
          |SELECT nb AS n_blocks, l2 AS page_l_2x,
          |  CAST(nb * 2 * 5 * 6 * 6 // 4 AS BIGINT) AS null_mean_2x,
          |  CAST(floor((CAST(l2 AS DOUBLE) / 2.0
          |    - CAST(nb AS DOUBLE) * 5.0 * 36.0 / 4.0)
          |    / sqrt(CAST(nb AS DOUBLE) * 25.0 * 24.0 * 6.0 / 144.0)
          |    * 1000000.0) AS BIGINT) AS z_micro
          |FROM t
          |""".stripMargin),
      (s, dir) => {
        val b = tbl(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderpriority").as("trt"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
              .as("cents"))
          .join(broadcast(tbl(s, dir, "customer")
              .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(tbl(s, dir, "nation")
              .select(col("n_nationkey"), col("n_name").as("blk"))),
            col("n_nationkey") === col("c_nationkey"))
          .groupBy("blk", "trt")
          .agg(sum(col("cents")).cast("long").as("s"),
            count(lit(1)).cast("long").as("n"))
          .withColumn("mean_micro", expr("s * 1000000 div n"))
        val r = b.withColumn("r2",
          (lit(2) * rank().over(Window.partitionBy("blk")
            .orderBy("mean_micro")) +
            count(lit(1)).over(Window.partitionBy("blk", "mean_micro"))
            - 1).cast("long"))
        val j = r.groupBy("trt")
          .agg(sum(col("r2")).cast("long").as("r2sum"))
          .withColumn("ord",
            when(col("trt") === "1-URGENT", 1)
              .when(col("trt") === "2-HIGH", 2)
              .when(col("trt") === "3-MEDIUM", 3)
              .when(col("trt") === "4-NOT SPECIFIED", 4).otherwise(5))
        val nb = b.agg(countDistinct(col("blk")).cast("long").as("nb"))
        j.agg(sum(col("ord") * col("r2sum")).cast("long").as("l2"))
          .crossJoin(broadcast(nb))
          .select(col("nb").as("n_blocks"), col("l2").as("page_l_2x"),
            expr("nb * 2 * 5 * 6 * 6 div 4").cast("long")
              .as("null_mean_2x"),
            floor((col("l2").cast("double") / 2.0d -
              col("nb").cast("double") * 5.0d * 36.0d / 4.0d) /
              sqrt(col("nb").cast("double") * 25.0d * 24.0d * 6.0d /
                144.0d) * 1000000.0d).cast("long").as("z_micro"))
      }),

    // Simpson's-paradox detector: urgent-vs-rest return-rate direction,
    // pooled and per segment (exact cross-multiplied comparisons — no
    // rate division at all). Emits the pooled direction, how many
    // segments agree, and the paradox flag when the pooled sign
    // contradicts the stratified majority — the aggregation trap,
    // detected mechanically.
    Q("stats_simpsons_check",
      Some(
        """WITH lab AS (SELECT l_orderkey AS ok,
          |  max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
          |  FROM lineitem GROUP BY 1),
          |b AS (SELECT c.c_mktsegment AS seg,
          |  CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
          |    AS urg, lab.ret
          |  FROM orders o JOIN lab ON lab.ok = o.o_orderkey
          |  JOIN customer c ON c.c_custkey = o.o_custkey),
          |s AS (SELECT seg,
          |  CAST(sum(CASE WHEN urg = 1 THEN ret ELSE 0 END) AS BIGINT)
          |    AS xu,
          |  CAST(sum(urg) AS BIGINT) AS nu,
          |  CAST(sum(CASE WHEN urg = 0 THEN ret ELSE 0 END) AS BIGINT)
          |    AS xr,
          |  CAST(sum(1 - urg) AS BIGINT) AS nr FROM b GROUP BY 1),
          |d AS (SELECT seg,
          |  CASE WHEN xu * nr > xr * nu THEN 1
          |       WHEN xu * nr < xr * nu THEN -1 ELSE 0 END AS dir
          |  FROM s),
          |p AS (SELECT CAST(sum(xu) AS BIGINT) AS xu,
          |  CAST(sum(nu) AS BIGINT) AS nu, CAST(sum(xr) AS BIGINT)
          |    AS xr, CAST(sum(nr) AS BIGINT) AS nr FROM s)
          |SELECT
          |  CAST(CASE WHEN p.xu * p.nr > p.xr * p.nu THEN 1
          |    WHEN p.xu * p.nr < p.xr * p.nu THEN -1 ELSE 0 END
          |    AS BIGINT) AS pooled_dir,
          |  CAST((SELECT sum(CASE WHEN dir = 1 THEN 1 ELSE 0 END)
          |    FROM d) AS BIGINT) AS segments_up,
          |  CAST((SELECT sum(CASE WHEN dir = -1 THEN 1 ELSE 0 END)
          |    FROM d) AS BIGINT) AS segments_down,
          |  CAST((SELECT CASE WHEN (p2.xu * p2.nr > p2.xr * p2.nu
          |      AND (SELECT sum(CASE WHEN dir = -1 THEN 1 ELSE 0 END)
          |        FROM d) > (SELECT sum(CASE WHEN dir = 1 THEN 1
          |        ELSE 0 END) FROM d))
          |    OR (p2.xu * p2.nr < p2.xr * p2.nu
          |      AND (SELECT sum(CASE WHEN dir = 1 THEN 1 ELSE 0 END)
          |        FROM d) > (SELECT sum(CASE WHEN dir = -1 THEN 1
          |        ELSE 0 END) FROM d))
          |    THEN 1 ELSE 0 END FROM p p2) AS BIGINT) AS paradox
          |FROM p
          |""".stripMargin),
      (s, dir) => {
        val lab = tbl(s, dir, "lineitem")
          .groupBy(col("l_orderkey").as("ok"))
          .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0))
            .as("ret"))
        val b = tbl(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)
              .as("urg"))
          .join(lab, col("ok") === col("o_orderkey"))
          .join(broadcast(tbl(s, dir, "customer")
              .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
            col("o_custkey") === col("c_custkey"))
        val st = b.groupBy("seg")
          .agg(sum(when(col("urg") === 1, col("ret")).otherwise(0))
              .cast("long").as("xu"),
            sum(col("urg")).cast("long").as("nu"),
            sum(when(col("urg") === 0, col("ret")).otherwise(0))
              .cast("long").as("xr"),
            sum(lit(1) - col("urg")).cast("long").as("nr"))
          .localCheckpoint()
        val d = st.select(
          when(col("xu") * col("nr") > col("xr") * col("nu"), 1)
            .when(col("xu") * col("nr") < col("xr") * col("nu"), -1)
            .otherwise(0).as("dir"))
          .agg(sum(when(col("dir") === 1, 1L).otherwise(0L))
            .cast("long").as("segments_up"),
            sum(when(col("dir") === -1, 1L).otherwise(0L))
              .cast("long").as("segments_down"))
        val p = st.agg(sum(col("xu")).cast("long").as("xu"),
          sum(col("nu")).cast("long").as("nu"),
          sum(col("xr")).cast("long").as("xr"),
          sum(col("nr")).cast("long").as("nr"))
        val out = p.crossJoin(broadcast(d))
          .select(
            when(col("xu") * col("nr") > col("xr") * col("nu"), 1L)
              .when(col("xu") * col("nr") < col("xr") * col("nu"), -1L)
              .otherwise(0L).cast("long").as("pooled_dir"),
            col("segments_up"), col("segments_down"))
          .withColumn("paradox",
            when((col("pooled_dir") === 1 &&
              col("segments_down") > col("segments_up")) ||
              (col("pooled_dir") === -1 &&
                col("segments_up") > col("segments_down")), 1L)
              .otherwise(0L).cast("long"))
        H.materialized(out, Nil, Seq(st))
      }),

    // Dickey-Fuller (no augmentation): Δy_t = α + β·y_{t-1} + ε on
    // daily revenue kd; β near 0 = random walk, strongly negative =
    // mean reversion. β and its t statistic from n-scaled
    // HUGEINT moments, each a single micro-floored chain — the
    // stationarity gate before any ARIMA-style forecast.
    Q("ts_adf_lite",
      Some(
        """WITH d AS (SELECT
          |  CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
          |    AS BIGINT) AS t,
          |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) // 100000 AS kd
          |  FROM orders GROUP BY o_orderdate),
          |p AS (SELECT kd AS y,
          |  lag(kd) OVER (ORDER BY t) AS yl FROM d),
          |v AS (SELECT y - yl AS dy, yl FROM p WHERE yl IS NOT NULL),
          |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(yl) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT)
          |    AS sy,
          |  sum(CAST(yl AS HUGEINT)*yl) AS sxx,
          |  sum(CAST(yl AS HUGEINT)*dy) AS sxy,
          |  sum(CAST(dy AS HUGEINT)*dy) AS syy FROM v),
          |f AS (SELECT n,
          |  (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
          |    - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
          |  / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
          |    - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) AS beta,
          |  CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
          |    - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) AS dxx,
          |  CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
          |    - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE) AS dyy,
          |  CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
          |    - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE) AS dxy FROM m)
          |SELECT n AS n_days,
          |  CAST(floor(beta * 1000000.0) AS BIGINT) AS beta_micro,
          |  CAST(floor(beta / sqrt((dyy/dxx - beta*beta)
          |    / (CAST(n AS DOUBLE) - 2.0)) * 1000000.0) AS BIGINT)
          |    AS df_t_micro
          |FROM f
          |""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "orders")
          .groupBy(col("o_orderdate"))
          .agg(expr("CAST(sum(CAST(floor(o_totalprice*100 + 0.5)" +
            " AS BIGINT)) AS BIGINT) div 100000").as("kd"))
          .select(datediff(col("o_orderdate"),
            to_timestamp(lit("1992-01-01 00:00:00"))).cast("long")
            .as("t"), col("kd"))
        val p = d.withColumn("yl",
          lag("kd", 1).over(Window.orderBy("t")))
        val v = p.filter(col("yl").isNotNull)
          .select((col("kd") - col("yl")).as("dy"), col("yl"))
        val m = v.agg(count(lit(1)).cast("long").as("n"),
          sum(col("yl")).cast("long").as("sx"),
          sum(col("dy")).cast("long").as("sy"),
          sum(col("yl").cast("decimal(38,0)") * col("yl"))
            .cast("decimal(38,0)").as("sxx"),
          sum(col("yl").cast("decimal(38,0)") * col("dy"))
            .cast("decimal(38,0)").as("sxy"),
          sum(col("dy").cast("decimal(38,0)") * col("dy"))
            .cast("decimal(38,0)").as("syy"))
        val f = m
          .withColumn("dxx", col("n").cast("double") *
            col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double"))
          .withColumn("dyy", col("n").cast("double") *
            col("syy").cast("double") -
            col("sy").cast("double") * col("sy").cast("double"))
          .withColumn("dxy", col("n").cast("double") *
            col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double"))
          .withColumn("beta", col("dxy") / col("dxx"))
        f.select(col("n").as("n_days"),
          floor(col("beta") * 1000000.0d).cast("long").as("beta_micro"),
          floor(col("beta") / sqrt((col("dyy") / col("dxx") -
            col("beta") * col("beta")) /
            (col("n").cast("double") - 2.0d)) * 1000000.0d)
            .cast("long").as("df_t_micro"))
      })
  )
}
