package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Sixty-fifth wave: alignment, distribution distance, and assignment —
  * Kendall tau-b rank correlation (with the Mann-Kendall S trend
  * statistic), banded dynamic-time-warping distance between daily
  * series, 1-D Wasserstein (earth-mover) distance between value
  * distributions, greedy maximal weighted matching via parallel
  * locally-best rounds, and the newsvendor inventory quantile policy.
  *
  * Determinism: every compare-path value is exact integer arithmetic
  * except tau-b's final denominator, which is sqrt of an exact integer
  * product (sqrt is IEEE-identical across engines) followed by one
  * floor(x*1e6 + 0.5).
  */
object AlignmentOpsQueries extends QueryModule {

  private val Big = 1000000000000L // unreachable-cell sentinel (min-safe)

  def all: Seq[Q] = Seq(

    // Kendall tau-b between the daily click and purchase counts, plus
    // the Mann-Kendall S of purchases over time (pairs are day-ordered,
    // so S falls out of the same pair frame). All 435 pairs enumerated
    // exactly — concordant/discordant/tie counts are integers; tau-b is
    // the only division, guarded against zero variance.
    Q("stats_kendall_tau",
      Some(
        """WITH dom AS (SELECT unnest(range(1, 31)) AS day),
          |d AS MATERIALIZED (SELECT dom.day,
          |  CAST(coalesce(s.x, 0) AS BIGINT) AS x,
          |  CAST(coalesce(s.y, 0) AS BIGINT) AS y
          |  FROM dom LEFT JOIN (
          |    SELECT CAST(strftime(ts, '%d') AS BIGINT) AS day,
          |      sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
          |      sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          |        AS y
          |    FROM events GROUP BY 1) s ON s.day = dom.day),
          |p AS (SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
          |  FROM d a JOIN d b ON a.day < b.day),
          |agg AS (SELECT CAST(count(*) AS BIGINT) AS pairs,
          |  CAST(sum(CASE WHEN (x1 < x2 AND y1 < y2)
          |    OR (x1 > x2 AND y1 > y2) THEN 1 ELSE 0 END) AS BIGINT)
          |    AS conc,
          |  CAST(sum(CASE WHEN (x1 < x2 AND y1 > y2)
          |    OR (x1 > x2 AND y1 < y2) THEN 1 ELSE 0 END) AS BIGINT)
          |    AS disc,
          |  CAST(sum(CASE WHEN x1 = x2 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS tx,
          |  CAST(sum(CASE WHEN y1 = y2 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS ty,
          |  CAST(sum(CASE WHEN y2 > y1 THEN 1 WHEN y2 < y1 THEN -1
          |    ELSE 0 END) AS BIGINT) AS mk_s FROM p)
          |SELECT CAST(30 AS BIGINT) AS n, pairs, conc, disc,
          |  CAST(CASE WHEN (pairs - tx) * (pairs - ty) = 0 THEN 0
          |    ELSE floor(1000000.0 * (conc - disc)
          |      / sqrt(CAST((pairs - tx) * (pairs - ty) AS DOUBLE))
          |      + 0.5) END AS BIGINT) AS tau_b_micro,
          |  mk_s AS mk_s_purchase
          |FROM agg
          |""".stripMargin),
      (s, dir) => {
        val daily = H.events(s, dir)
          .groupBy(date_format(col("ts"), "d").cast("long").as("day"))
          .agg(
            sum(when(col("event_type") === "click", 1).otherwise(0))
              .cast("long").as("x"),
            sum(when(col("event_type") === "purchase", 1).otherwise(0))
              .cast("long").as("y"))
        val d = s.range(1, 31).select(col("id").as("day"))
          .join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("x"), lit(0L)).as("x"),
            coalesce(col("y"), lit(0L)).as("y"))
          .localCheckpoint() // both sides of the pair self-join
        val p = d.select(col("day").as("day1"), col("x").as("x1"),
            col("y").as("y1"))
          .join(d.select(col("day").as("day2"), col("x").as("x2"),
            col("y").as("y2")), col("day1") < col("day2"))
        val out = p.agg(
            count(lit(1)).cast("long").as("pairs"),
            sum(when((col("x1") < col("x2") && col("y1") < col("y2")) ||
              (col("x1") > col("x2") && col("y1") > col("y2")), 1)
              .otherwise(0)).cast("long").as("conc"),
            sum(when((col("x1") < col("x2") && col("y1") > col("y2")) ||
              (col("x1") > col("x2") && col("y1") < col("y2")), 1)
              .otherwise(0)).cast("long").as("disc"),
            sum(when(col("x1") === col("x2"), 1).otherwise(0))
              .cast("long").as("tx"),
            sum(when(col("y1") === col("y2"), 1).otherwise(0))
              .cast("long").as("ty"),
            sum(when(col("y2") > col("y1"), 1)
              .when(col("y2") < col("y1"), -1).otherwise(0))
              .cast("long").as("mk_s"))
          .select(lit(30L).as("n"), col("pairs"), col("conc"),
            col("disc"),
            when((col("pairs") - col("tx")) *
              (col("pairs") - col("ty")) === 0, 0L)
              .otherwise(floor(lit(1000000.0) *
                (col("conc") - col("disc")) /
                sqrt(((col("pairs") - col("tx")) *
                  (col("pairs") - col("ty"))).cast("double")) + 0.5))
              .cast("long").as("tau_b_micro"),
            col("mk_s").as("mk_s_purchase"))
        H.materialized(out, caches = Nil, checkpoints = Seq(d))
      }),

    // Banded DTW between the daily click and view count series (30x30
    // grid, Sakoe-Chiba bands 2/5/29 — 29 is the unbanded full grid).
    // The DP runs as one flat row-major fold: cell k reads up/left/diag
    // from the growing dp array; out-of-band cells cost the sentinel,
    // which min-propagation never selects on a feasible path. The
    // oracle replays the identical fold as a recursive CTE keyed on
    // (band, k).
    Q("ts_dtw_band",
      Some(
        s"""WITH RECURSIVE dom AS (SELECT unnest(range(1, 31)) AS day),
           |daily AS MATERIALIZED (SELECT dom.day,
           |  CAST(coalesce(s.a, 0) AS BIGINT) AS a,
           |  CAST(coalesce(s.b, 0) AS BIGINT) AS b
           |  FROM dom LEFT JOIN (
           |    SELECT CAST(strftime(ts, '%d') AS BIGINT) AS day,
           |      sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           |        AS a,
           |      sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           |        AS b
           |    FROM events GROUP BY 1) s ON s.day = dom.day),
           |ser AS MATERIALIZED (SELECT list(a ORDER BY day) AS la,
           |  list(b ORDER BY day) AS lb FROM daily),
           |bands AS (SELECT unnest([2, 5, 29]) AS band),
           |g AS (
           |  SELECT band, 0 AS k,
           |    [CAST(abs(la[1] - lb[1]) AS BIGINT)] AS dp
           |  FROM bands, ser
           |  UNION ALL
           |  SELECT g.band, g.k + 1, list_append(g.dp,
           |    CASE WHEN abs((g.k + 1) // 30 - (g.k + 1) % 30) > g.band
           |      THEN $Big
           |      ELSE abs(ser.la[((g.k + 1) // 30) + 1]
           |        - ser.lb[((g.k + 1) % 30) + 1]) END
           |    + least(
           |      CASE WHEN g.k + 1 >= 30 THEN g.dp[g.k + 1 - 29]
           |        ELSE $Big END,
           |      CASE WHEN (g.k + 1) % 30 > 0 THEN g.dp[g.k + 1]
           |        ELSE $Big END,
           |      CASE WHEN g.k + 1 >= 30 AND (g.k + 1) % 30 > 0
           |        THEN g.dp[g.k + 1 - 30] ELSE $Big END))
           |  FROM g, ser WHERE g.k < 899
           |)
           |SELECT CAST(band AS BIGINT) AS band,
           |  CAST(dp[900] AS BIGINT) AS dtw_cost
           |FROM g WHERE k = 899 ORDER BY band
           |""".stripMargin),
      (s, dir) => {
        val daily = H.events(s, dir)
          .groupBy(date_format(col("ts"), "d").cast("long").as("day"))
          .agg(
            sum(when(col("event_type") === "click", 1).otherwise(0))
              .cast("long").as("a"),
            sum(when(col("event_type") === "view", 1).otherwise(0))
              .cast("long").as("b"))
        val dense = s.range(1, 31).select(col("id").as("day"))
          .join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("a"), lit(0L)).as("a"),
            coalesce(col("b"), lit(0L)).as("b"))
        val ser = dense.agg(
          expr("transform(array_sort(collect_list(struct(day, a))), " +
            "p -> p.a)").as("la"),
          expr("transform(array_sort(collect_list(struct(day, b))), " +
            "p -> p.b)").as("lb"))
        ser
          .select(explode(array(lit(2L), lit(5L), lit(29L))).as("band"),
            col("la"), col("lb"))
          .withColumn("dp", expr(
            s"""aggregate(sequence(1, 899),
               |  array(abs(element_at(la, 1) - element_at(lb, 1))),
               |  (dp, k) -> dp || array(
               |    CASE WHEN abs(k div 30 - k % 30) > band THEN ${Big}L
               |      ELSE abs(element_at(la, CAST(k div 30 AS INT) + 1)
               |        - element_at(lb, CAST(k % 30 AS INT) + 1)) END
               |    + least(
               |      CASE WHEN k >= 30
               |        THEN element_at(dp, CAST(k AS INT) - 29)
               |        ELSE ${Big}L END,
               |      CASE WHEN k % 30 > 0
               |        THEN element_at(dp, CAST(k AS INT))
               |        ELSE ${Big}L END,
               |      CASE WHEN k >= 30 AND k % 30 > 0
               |        THEN element_at(dp, CAST(k AS INT) - 30)
               |        ELSE ${Big}L END)))""".stripMargin))
          .select(col("band"),
            element_at(col("dp"), 900).as("dtw_cost"))
          .orderBy("band")
      }),

    // 1-D Wasserstein (earth-mover) distance between the click and
    // error value distributions, binned at 20-dollar granularity. The
    // CDF difference is kept as the exact cross-multiplied integer
    // |cumA*nB - cumB*nA|; the micro normalization is the single final
    // division. (Integer headroom: bins*nA*nB*1e6 stays under 2^63
    // through sf1.) EMD is the drift metric TVD undersells — it weighs
    // HOW FAR mass moved, not just how much.
    Q("stats_wasserstein_1d",
      Some(
        """WITH e AS (SELECT event_type,
          |  CAST(floor(value*100 + 0.5) AS BIGINT) // 2000 AS bin
          |  FROM events WHERE event_type IN ('click', 'error')),
          |h AS (SELECT bin,
          |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
          |    AS BIGINT) AS ca,
          |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          |    AS BIGINT) AS cb
          |  FROM e GROUP BY bin),
          |c AS (SELECT bin, sum(ca) OVER (ORDER BY bin) AS cuma,
          |  sum(cb) OVER (ORDER BY bin) AS cumb FROM h),
          |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
          |  CAST(sum(cb) AS BIGINT) AS nb FROM h)
          |SELECT t.na AS n_a, t.nb AS n_b,
          |  CAST(count(*) AS BIGINT) AS bins,
          |  CAST(sum(abs(cuma*t.nb - cumb*t.na)) AS BIGINT)
          |    AS emd_scaled,
          |  CAST(sum(abs(cuma*t.nb - cumb*t.na)) * 1000000
          |    // (t.na*t.nb) AS BIGINT) AS emd_bin_micro
          |FROM c, t GROUP BY t.na, t.nb
          |""".stripMargin),
      (s, dir) => {
        val h = H.events(s, dir)
          .filter(col("event_type").isin("click", "error"))
          .select(col("event_type"),
            expr("CAST(floor(value*100 + 0.5) AS BIGINT) div 2000")
              .as("bin"))
          .groupBy("bin")
          .agg(
            sum(when(col("event_type") === "click", 1).otherwise(0))
              .cast("long").as("ca"),
            sum(when(col("event_type") === "error", 1).otherwise(0))
              .cast("long").as("cb"))
          .localCheckpoint() // CDF window + the totals row
        // ~25 bins: the unpartitioned CDF window is a bounded frame
        val c = h.withColumn("cuma",
            sum("ca").over(Window.orderBy("bin")))
          .withColumn("cumb", sum("cb").over(Window.orderBy("bin")))
        val t = h.agg(sum("ca").cast("long").as("na"),
          sum("cb").cast("long").as("nb"))
        val out = c.crossJoin(broadcast(t))
          .groupBy("na", "nb")
          .agg(count(lit(1)).cast("long").as("bins"),
            sum(abs(col("cuma") * col("nb") - col("cumb") * col("na")))
              .cast("long").as("emd_scaled"))
          .select(col("na").as("n_a"), col("nb").as("n_b"), col("bins"),
            col("emd_scaled"),
            expr("emd_scaled * 1000000 div (na * nb)")
              .as("emd_bin_micro"))
        H.materialized(out, caches = Nil, checkpoints = Seq(h))
      }),

    // Greedy maximal weighted matching on the co-purchase graph
    // (support-ranked edges): the one-to-one assignment step of record
    // linkage. Distributed as parallel locally-best rounds — an edge is
    // taken iff its rank is the minimum over ALL edges incident to both
    // endpoints; matched vertices drop out and rounds repeat. This
    // parallel schedule provably reproduces the SEQUENTIAL greedy
    // matching (the global min edge is always locally minimal, and
    // removals commute), which is what the oracle replays edge-by-edge
    // with a matched-vertex list. O(log E) expected rounds, each a
    // pair of bounded shuffles; no driver-side edge state.
    Q("graph_greedy_matching",
      Some(
        """WITH RECURSIVE li AS MATERIALIZED (
          |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          |  FROM lineitem WHERE l_partkey < 60),
          |ed AS MATERIALIZED (SELECT a.pk AS u, b.pk AS v,
          |  CAST(count(*) AS BIGINT) AS support
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          |  GROUP BY 1, 2),
          |rk AS MATERIALIZED (SELECT u, v, support,
          |  CAST(row_number() OVER (ORDER BY support DESC, u, v)
          |    AS BIGINT) AS rn FROM ed),
          |g AS (
          |  SELECT CAST(0 AS BIGINT) AS i, CAST([] AS BIGINT[]) AS mv,
          |    CAST(NULL AS BIGINT) AS tu, CAST(NULL AS BIGINT) AS tv,
          |    false AS took
          |  UNION ALL
          |  SELECT rk.rn,
          |    CASE WHEN list_contains(g.mv, rk.u)
          |        OR list_contains(g.mv, rk.v) THEN g.mv
          |      ELSE list_append(list_append(g.mv, rk.u), rk.v) END,
          |    rk.u, rk.v,
          |    NOT (list_contains(g.mv, rk.u)
          |      OR list_contains(g.mv, rk.v))
          |  FROM g JOIN rk ON rk.rn = g.i + 1
          |)
          |SELECT CAST(g.tu AS BIGINT) AS u, CAST(g.tv AS BIGINT) AS v,
          |  rk.support
          |FROM g JOIN rk ON rk.u = g.tu AND rk.v = g.tv
          |WHERE g.took ORDER BY u
          |""".stripMargin),
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
          .filter(col("l_partkey") < 60)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
          .localCheckpoint() // both 2-path sides
        val ed = li.join(
            li.select(col("ok").as("ok2"), col("pk").as("pk2")),
            col("ok") === col("ok2") && col("pk") < col("pk2"))
          .groupBy(col("pk").as("u"), col("pk2").as("v"))
          .agg(count(lit(1)).cast("long").as("support"))
        // bounded edge set (< 1.8k pairs): global rank window is fine
        val rk = ed.withColumn("rn", row_number().over(
            Window.orderBy(col("support").desc, col("u"), col("v")))
          .cast("long"))
        var rem = rk.localCheckpoint()
        var matched = rk.filter(lit(false)).localCheckpoint()
        var rounds = 0
        while (rounds < 1000 && rem.count() > 0) {
          val inc = rem.select(col("u").as("vert"), col("rn"))
            .union(rem.select(col("v").as("vert"), col("rn")))
            .groupBy("vert").agg(min("rn").as("mr"))
            .localCheckpoint() // joined on both endpoints
          val sel = rem
            .join(inc.select(col("vert").as("vu"), col("mr").as("mru")),
              col("u") === col("vu") && col("rn") === col("mru"))
            .join(inc.select(col("vert").as("vv"), col("mr").as("mrv")),
              col("v") === col("vv") && col("rn") === col("mrv"))
            .select(col("u"), col("v"), col("support"), col("rn"))
            .localCheckpoint() // matched output + blocked-vertex sides
          matched = matched.union(sel).localCheckpoint()
          val mverts = sel.select(col("u").as("vert"))
            .union(sel.select(col("v").as("vert"))).distinct()
            .localCheckpoint()
          rem = rem
            .join(mverts.select(col("vert").as("bu")),
              col("u") === col("bu"), "left_anti")
            .join(mverts.select(col("vert").as("bv")),
              col("v") === col("bv"), "left_anti")
            .localCheckpoint() // per-round frontier (iterative-state rule)
          rounds += 1
        }
        matched.select(col("u"), col("v"), col("support")).orderBy("u")
      }),

    // Newsvendor policy per part brand over Q1-1995 daily demand:
    // stock q* = the 75th-percentile day (critical ratio cu/(cu+co) =
    // 3/4), read off the sorted daily-demand distribution without any
    // division; achieved service level and mean lost sales follow from
    // one pass back over the days.
    Q("orders_newsvendor",
      Some(
        """WITH d AS MATERIALIZED (
          |  SELECT p.p_brand AS brand, l.l_shipdate AS dt,
          |    CAST(sum(l.l_quantity) AS BIGINT) AS dem
          |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          |  WHERE l.l_shipdate BETWEEN DATE '1995-01-01'
          |    AND DATE '1995-03-31'
          |  GROUP BY 1, 2),
          |r AS (SELECT brand, dem,
          |  CAST(row_number() OVER (PARTITION BY brand
          |    ORDER BY dem, dt) AS BIGINT) AS rn,
          |  CAST(count(*) OVER (PARTITION BY brand) AS BIGINT) AS days
          |  FROM d),
          |q AS (SELECT brand, days,
          |  CAST(min(CASE WHEN 4*rn >= 3*days THEN dem END) AS BIGINT)
          |    AS q_star
          |  FROM r GROUP BY 1, 2)
          |SELECT q.brand, q.days, q.q_star,
          |  CAST(1000000 * sum(CASE WHEN d.dem <= q.q_star THEN 1
          |    ELSE 0 END) // q.days AS BIGINT) AS service_micro,
          |  CAST(1000 * sum(CASE WHEN d.dem > q.q_star
          |    THEN d.dem - q.q_star ELSE 0 END) // q.days AS BIGINT)
          |    AS lost_mean_milli
          |FROM q JOIN d ON d.brand = q.brand
          |GROUP BY 1, 2, 3 ORDER BY q.brand
          |""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "lineitem")
          .filter(col("l_shipdate").between("1995-01-01", "1995-03-31"))
          .join(broadcast(tbl(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("p_partkey") === col("l_partkey"))
          .groupBy(col("p_brand").as("brand"),
            col("l_shipdate").as("dt"))
          .agg(sum("l_quantity").cast("long").as("dem"))
          .localCheckpoint() // quantile pass + the service-level pass
        val r = d
          .withColumn("rn", row_number().over(Window.partitionBy("brand")
            .orderBy(col("dem"), col("dt"))).cast("long"))
          .withColumn("days", count(lit(1)).over(
            Window.partitionBy("brand")).cast("long"))
        val q = r.groupBy("brand", "days")
          .agg(min(when(lit(4) * col("rn") >= lit(3) * col("days"),
            col("dem"))).cast("long").as("q_star"))
        val out = q
          .join(d.select(col("brand").as("b2"), col("dem")),
            col("b2") === col("brand"))
          .groupBy("brand", "days", "q_star")
          .agg(
            (lit(1000000L) * sum(when(col("dem") <= col("q_star"), 1L)
              .otherwise(0L))).as("svc_num"),
            (lit(1000L) * sum(when(col("dem") > col("q_star"),
              col("dem") - col("q_star")).otherwise(0L))).as("lost_num"))
          .select(col("brand"), col("days"), col("q_star"),
            expr("svc_num div days").as("service_micro"),
            expr("lost_num div days").as("lost_mean_milli"))
          .orderBy("brand")
        H.materialized(out, caches = Nil, checkpoints = Seq(d))
      }))
}
