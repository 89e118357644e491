package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Eighty-second wave: cutoff and preference-model operators — Kneedle
  * knee-point detection on the ranked user-activity curve (the
  * principled "where to cut the long tail" answer), Deming orthogonal
  * regression between two error-bearing daily series (OLS assumes x is
  * exact; Deming doesn't), a Plackett-Luce strength fit over daily
  * event-type contests via two unrolled MM iterations, and a one-row
  * graph cohesion card (density, global transitivity, degree profile)
  * for the co-supplier graph.
  */
object KneeOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Kneedle knee detection: users ranked by event count (two-phase
    // global rank — range partitions + broadcast offsets, no
    // single-partition window), knee = the point with max |cross
    // product| distance to the chord from (1, y_max) to (n, y_min) —
    // exact integer 2D geometry, ties to the smallest rank. The
    // canonical "how many heavy users are really heavy" cutoff.
    Q("profile_knee_cutoff",
      Some(
        """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
          |  FROM events GROUP BY 1),
          |r AS (SELECT user_id, c, CAST(row_number() OVER
          |  (ORDER BY c DESC, user_id) AS BIGINT) AS rk FROM u),
          |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(max(c) AS BIGINT) AS y1, CAST(min(c) AS BIGINT) AS yn
          |  FROM u),
          |x AS (SELECT r.rk, r.c, r.user_id,
          |  abs((g.n - 1) * (r.c - g.y1) - (r.rk - 1) * (g.yn - g.y1))
          |    AS cross_abs FROM r, g)
          |SELECT x.rk AS knee_rank, x.c AS knee_count,
          |  CAST(x.user_id AS BIGINT) AS knee_user,
          |  CAST(x.cross_abs AS BIGINT) AS cross_abs, g.n AS n_users
          |FROM x, g ORDER BY x.cross_abs DESC, x.rk LIMIT 1
          |""".stripMargin),
      (s, dir) => {
        val u = H.events(s, dir)
          .groupBy("user_id").agg(count(lit(1)).cast("long").as("c"))
          .repartitionByRange(32, col("c").desc, col("user_id"))
          .withColumn("pid", spark_partition_id())
          .localCheckpoint()
        val offs = u.groupBy("pid").agg(count(lit(1)).as("cnt"))
          .withColumn("off",
            sum("cnt").over(Window.orderBy("pid")) - col("cnt"))
          .select(col("pid").as("pid2"), col("off"))
        val r = u
          .withColumn("lrk", row_number().over(
            Window.partitionBy("pid").orderBy(col("c").desc, col("user_id")))
            .cast("long"))
          .join(broadcast(offs), col("pid") === col("pid2"))
          .select(col("user_id"), col("c"), (col("off") + col("lrk")).as("rk"))
        val g = u.agg(count(lit(1)).cast("long").as("n"),
          max("c").cast("long").as("y1"), min("c").cast("long").as("yn"))
        val out = r.crossJoin(broadcast(g))
          .select(col("rk").as("knee_rank"), col("c").as("knee_count"),
            col("user_id").cast("long").as("knee_user"),
            abs((col("n") - 1) * (col("c") - col("y1")) -
              (col("rk") - 1) * (col("yn") - col("y1"))).cast("long")
              .as("cross_abs"),
            col("n").as("n_users"))
          .orderBy(col("cross_abs").desc, col("knee_rank")).limit(1)
        H.materialized(out, Nil, Seq(u))
      }),

    // Deming (orthogonal) regression of daily views on daily clicks —
    // both series carry sampling error, so OLS attenuates the slope;
    // Deming with δ=1 is the closed form slope = (syy − sxx +
    // sqrt((syy−sxx)² + 4·sxy²)) / (2·sxy) over CENTERED moments, all
    // derived from exact integer sums in the n-scaled form (n·Σxx −
    // (Σx)²) and finished by one fixed IEEE chain. One day-keyed
    // aggregation; the fit is arithmetic on six numbers.
    Q("stats_deming_regression",
      Some(
        """WITH d AS (SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP))
          |    // 86400000000 AS BIGINT) AS dy,
          |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
          |    AS BIGINT) AS x,
          |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
          |    AS BIGINT) AS y
          |  FROM events GROUP BY 1),
          |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |  CAST(sum(x * x) AS BIGINT) AS sxx,
          |  CAST(sum(y * y) AS BIGINT) AS syy,
          |  CAST(sum(x * y) AS BIGINT) AS sxy FROM d),
          |c AS (SELECT n,
          |  CAST(n * sxx - sx * sx AS DOUBLE) AS cxx,
          |  CAST(n * syy - sy * sy AS DOUBLE) AS cyy,
          |  CAST(n * sxy - sx * sy AS DOUBLE) AS cxy,
          |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
          |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my FROM m)
          |SELECT n AS n_days,
          |  CASE WHEN cxy = 0.0 THEN 0.0 ELSE
          |    (cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx)
          |      + 4.0 * cxy * cxy)) / (2.0 * cxy) END AS slope,
          |  CASE WHEN cxy = 0.0 THEN my ELSE
          |    my - (cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx)
          |      + 4.0 * cxy * cxy)) / (2.0 * cxy) * mx END AS intercept
          |FROM c
          |""".stripMargin),
      (s, dir) => {
        val d = H.events(s, dir)
          .groupBy(expr("unix_micros(ts) div 86400000000").cast("long")
            .as("dy"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("x"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .cast("long").as("y"))
        val m = d.agg(count(lit(1)).cast("long").as("n"),
          sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
          sum(expr("x * x")).cast("long").as("sxx"),
          sum(expr("y * y")).cast("long").as("syy"),
          sum(expr("x * y")).cast("long").as("sxy"))
        val cxx = expr("CAST(n * sxx - sx * sx AS DOUBLE)")
        val cyy = expr("CAST(n * syy - sy * sy AS DOUBLE)")
        val cxy = expr("CAST(n * sxy - sx * sy AS DOUBLE)")
        val mx = expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)")
        val my = expr("CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)")
        val slope = (cyy - cxx +
          sqrt((cyy - cxx) * (cyy - cxx) + lit(4.0) * cxy * cxy)) /
          (lit(2.0) * cxy)
        m.select(col("n").as("n_days"),
          when(cxy === 0.0, 0.0).otherwise(slope).as("slope"),
          when(cxy === 0.0, my).otherwise(my - slope * mx).as("intercept"))
      }),

    // Plackett-Luce strengths for the 5 event types from daily
    // head-to-head contests (i beats j on a day iff its count is
    // strictly higher): two unrolled Hunter-MM iterations
    // γ'_i = W_i·1e12 // Σ_j c_ij·1e12 // (γ_i+γ_j), exact micro
    // integers, then normalized to Σγ = k·1e6. The contest census is
    // one day-keyed aggregation + a 10-pair bounded join; each MM
    // sweep is arithmetic on the 5-row strength frame.
    Q("rank_plackett_luce",
      Some(
        """WITH d AS (SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP))
          |    // 86400000000 AS BIGINT) AS dy, event_type AS t,
          |  CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
          |pair AS (SELECT a.t AS ti, b.t AS tj,
          |  CAST(sum(CASE WHEN a.c > b.c THEN 1 ELSE 0 END) AS BIGINT)
          |    AS wins,
          |  CAST(sum(CASE WHEN a.c <> b.c THEN 1 ELSE 0 END) AS BIGINT)
          |    AS games
          |  FROM d a JOIN d b ON b.dy = a.dy AND a.t <> b.t GROUP BY 1, 2),
          |w AS (SELECT ti, sum(wins) AS wi FROM pair GROUP BY 1),
          |g0 AS (SELECT ti, CAST(1000000 AS BIGINT) AS gam FROM w),
          |d1 AS (SELECT p.ti, sum(p.games * 1000000000000
          |    // (ga.gam + gb.gam)) AS ds
          |  FROM pair p JOIN g0 ga ON ga.ti = p.ti
          |  JOIN g0 gb ON gb.ti = p.tj GROUP BY 1),
          |g1 AS (SELECT w.ti, CASE WHEN d1.ds = 0 THEN 1000000
          |  ELSE GREATEST(1, w.wi * 1000000000000 // d1.ds) END AS gam
          |  FROM w JOIN d1 ON d1.ti = w.ti),
          |d2 AS (SELECT p.ti, sum(p.games * 1000000000000
          |    // (ga.gam + gb.gam)) AS ds
          |  FROM pair p JOIN g1 ga ON ga.ti = p.ti
          |  JOIN g1 gb ON gb.ti = p.tj GROUP BY 1),
          |g2 AS (SELECT w.ti, CASE WHEN d2.ds = 0 THEN 1000000
          |  ELSE GREATEST(1, w.wi * 1000000000000 // d2.ds) END AS gam
          |  FROM w JOIN d2 ON d2.ti = w.ti),
          |tot AS (SELECT sum(gam) AS tg, count(*) AS k FROM g2)
          |SELECT g2.ti AS event_type, CAST(w.wi AS BIGINT) AS wins,
          |  CAST(g2.gam * tot.k * 1000000 // tot.tg AS BIGINT)
          |    AS strength_micro
          |FROM g2 JOIN w ON w.ti = g2.ti, tot ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val d = H.events(s, dir)
          .groupBy(expr("unix_micros(ts) div 86400000000").cast("long")
            .as("dy"), col("event_type").as("t"))
          .agg(count(lit(1)).cast("long").as("c"))
          .localCheckpoint() // bounded day x type frame
        val pair = d.as("a")
          .join(d.as("b"), col("b.dy") === col("a.dy") &&
            col("a.t") =!= col("b.t"))
          .groupBy(col("a.t").as("ti"), col("b.t").as("tj"))
          .agg(sum(when(col("a.c") > col("b.c"), 1L).otherwise(0L))
            .cast("long").as("wins"),
            sum(when(col("a.c") =!= col("b.c"), 1L).otherwise(0L))
              .cast("long").as("games"))
          .localCheckpoint() // 20-row contest matrix drives both sweeps
        val w = pair.groupBy("ti").agg(sum("wins").as("wi"))
        def sweep(g: DataFrame): DataFrame = {
          val ds = pair
            .join(g.select(col("ti").as("gi"), col("gam").as("ga")),
              col("gi") === col("ti"))
            .join(g.select(col("ti").as("gj"), col("gam").as("gb")),
              col("gj") === col("tj"))
            .groupBy(col("ti").as("di"))
            .agg(sum(expr("games * 1000000000000 div (ga + gb)")).as("ds"))
          w.join(ds, col("ti") === col("di"))
            .select(col("ti"),
              when(col("ds") === 0, 1000000L).otherwise(
                greatest(lit(1L), expr("wi * 1000000000000 div ds")))
                .as("gam"))
        }
        val g0 = w.select(col("ti"), lit(1000000L).as("gam"))
        val g2 = sweep(sweep(g0))
        val tot = g2.agg(sum("gam").as("tg"), count(lit(1)).as("k"))
        val out = g2.join(w.withColumnRenamed("ti", "wt"),
            col("ti") === col("wt"))
          .crossJoin(broadcast(tot))
          .select(col("ti").as("event_type"),
            col("wi").cast("long").as("wins"),
            expr("gam * k * 1000000 div tg").cast("long")
              .as("strength_micro"))
          .orderBy("event_type")
        H.materialized(out, Nil, Seq(d, pair))
      }),

    // One-row cohesion card for the thresholded co-supplier graph:
    // density, global transitivity 6·triangles/Σd(d−1) (triangles via
    // the same degree-ordered orientation as the triangle census — each
    // counted once, hub forward-stars bounded), max/mean degree. The
    // whole-graph health summary that complements the per-node lcc
    // distribution. All ratios exact micro/milli integers.
    Q("graph_cohesion_summary",
      Some("WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem), " +
        "e AS (SELECT x.l_suppkey AS a, y.l_suppkey AS b FROM li x " +
        "JOIN li y ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 6), " +
        "deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM " +
        "(SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY 1), " +
        "o AS (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b) " +
        "THEN e.a ELSE e.b END AS src, " +
        "CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b) " +
        "THEN e.b ELSE e.a END AS dst " +
        "FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b), " +
        "tri AS (SELECT CAST(count(*) AS BIGINT) AS t FROM o w1 " +
        "JOIN o w2 ON w2.src = w1.dst " +
        "JOIN o w3 ON w3.src = w1.src AND w3.dst = w2.dst), " +
        "g AS (SELECT CAST(count(*) AS BIGINT) AS v, " +
        "CAST(sum(d) AS BIGINT) AS sd, CAST(sum(d * (d - 1)) AS BIGINT) " +
        "AS wedges2, CAST(max(d) AS BIGINT) AS maxd FROM deg) " +
        "SELECT g.v AS n_nodes, CAST(g.sd // 2 AS BIGINT) AS n_edges, " +
        "CAST(CASE WHEN g.v < 2 THEN 0 ELSE g.sd * 1000000 " +
        "// (g.v * (g.v - 1)) END AS BIGINT) AS density_micro, " +
        "CAST(CASE WHEN g.wedges2 = 0 THEN 0 ELSE " +
        "6 * tri.t * 1000000 // g.wedges2 END AS BIGINT) " +
        "AS transitivity_micro, g.maxd AS max_degree, " +
        "CAST(g.sd * 1000 // g.v AS BIGINT) AS avg_degree_milli " +
        "FROM g, tri"),
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey").distinct()
        val e = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_suppkey") < col("y.l_suppkey"))
          .groupBy(col("x.l_suppkey").as("a"), col("y.l_suppkey").as("b"))
          .agg(count(lit(1)).as("co"))
          .filter(col("co") >= 6).drop("co")
          .localCheckpoint()
        val deg = e.select(col("a").as("v"))
          .unionAll(e.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).cast("long").as("d"))
          .localCheckpoint()
        val fwd = col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b"))
        val o = e
          .join(broadcast(deg.select(col("v").as("va"), col("d").as("da"))),
            col("va") === col("a"))
          .join(broadcast(deg.select(col("v").as("vb"), col("d").as("db"))),
            col("vb") === col("b"))
          .select(when(fwd, col("a")).otherwise(col("b")).as("src"),
            when(fwd, col("b")).otherwise(col("a")).as("dst"))
          .localCheckpoint()
        val tri = o.as("w1")
          .join(o.as("w2"), col("w2.src") === col("w1.dst"))
          .join(o.as("w3"), col("w3.src") === col("w1.src") &&
            col("w3.dst") === col("w2.dst"))
          .agg(count(lit(1)).cast("long").as("t"))
        val g = deg.agg(count(lit(1)).cast("long").as("v"),
          sum("d").cast("long").as("sd"),
          sum(expr("d * (d - 1)")).cast("long").as("wedges2"),
          max("d").cast("long").as("maxd"))
        val out = g.crossJoin(broadcast(tri))
          .select(col("v").as("n_nodes"),
            expr("sd div 2").cast("long").as("n_edges"),
            when(col("v") < 2, 0L)
              .otherwise(expr("sd * 1000000 div (v * (v - 1))"))
              .cast("long").as("density_micro"),
            when(col("wedges2") === 0, 0L)
              .otherwise(expr("6 * t * 1000000 div wedges2"))
              .cast("long").as("transitivity_micro"),
            col("maxd").as("max_degree"),
            expr("sd * 1000 div v").cast("long").as("avg_degree_milli"))
        H.materialized(out, Nil, Seq(e, deg, o))
      }))
}
