package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}

/** Sixty-eighth wave: state-space decoding and signal diagnostics —
  * two-state integer Viterbi burst detection (decoded WITHOUT
  * backtracking via forward+backward cost sums), a fully quantized
  * 1-D Kalman level filter, the Wald-Wolfowitz runs test, and adstock
  * (geometric ad-carryover) correlation.
  *
  * The Kalman fold contains the wave's one signed division; it runs
  * through F(x) = (x + 1e15)/1e6 - 1e9, which floors identically in
  * both engines because the shifted numerator is always positive
  * (Spark `div` truncates, DuckDB `//` floors — equal on positives).
  */
object ViterbiOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Two-state burst decoding of daily purchase arrivals: base rate
    // q0 = floor mean, burst rate q1 = 2*q0, switch penalty q0. The
    // optimal state path is recovered from forward[d][s] + backward
    // [d][s] - cost[d][s] == total min cost (valid for every day the
    // optimal path passes through), so no backtracking pass and no
    // path storage — both folds are plain day-ordered reductions.
    Q("events_burst_viterbi",
      Some(
        """WITH RECURSIVE dom AS (SELECT unnest(range(1, 31)) AS day),
          |d AS MATERIALIZED (SELECT dom.day,
          |  CAST(coalesce(s.y, 0) AS BIGINT) AS y
          |  FROM dom LEFT JOIN (
          |    SELECT CAST(strftime(ts, '%d') AS BIGINT) AS day,
          |      count(*) AS y FROM events WHERE event_type = 'purchase'
          |    GROUP BY 1) s ON s.day = dom.day),
          |q AS (SELECT CAST(sum(y) // 30 AS BIGINT) AS q0 FROM d),
          |fw AS (
          |  SELECT 1 AS day, abs(d.y - q.q0) AS c0,
          |    abs(d.y - 2*q.q0) AS c1 FROM d, q WHERE d.day = 1
          |  UNION ALL
          |  SELECT fw.day + 1,
          |    abs(d.y - q.q0) + least(fw.c0, fw.c1 + q.q0),
          |    abs(d.y - 2*q.q0) + least(fw.c1, fw.c0 + q.q0)
          |  FROM fw JOIN d ON d.day = fw.day + 1, q WHERE fw.day < 30),
          |bw AS (
          |  SELECT 30 AS day, abs(d.y - q.q0) AS c0,
          |    abs(d.y - 2*q.q0) AS c1 FROM d, q WHERE d.day = 30
          |  UNION ALL
          |  SELECT bw.day - 1,
          |    abs(d.y - q.q0) + least(bw.c0, bw.c1 + q.q0),
          |    abs(d.y - 2*q.q0) + least(bw.c1, bw.c0 + q.q0)
          |  FROM bw JOIN d ON d.day = bw.day - 1, q WHERE bw.day > 1),
          |tot AS (SELECT least(c0, c1) AS best FROM fw WHERE day = 30)
          |SELECT d.day, d.y,
          |  CAST(CASE WHEN fw.c0 + bw.c0 - abs(d.y - q.q0) <= tot.best
          |    THEN 0 ELSE 1 END AS BIGINT) AS burst,
          |  CAST(tot.best AS BIGINT) AS total_cost
          |FROM d JOIN fw ON fw.day = d.day JOIN bw ON bw.day = d.day,
          |  q, tot
          |ORDER BY d.day
          |""".stripMargin),
      (s, dir) => {
        val daily = H.events(s, dir)
          .filter(col("event_type") === "purchase")
          .groupBy(date_format(col("ts"), "d").cast("long").as("day"))
          .agg(count(lit(1)).cast("long").as("y"))
        val d = s.range(1, 31).select(col("id").as("day"))
          .join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
          .localCheckpoint() // fold input + the per-day decode join
        val folded = d
          .agg(array_sort(collect_list(struct(col("day"), col("y"))))
            .as("arr"), (sum("y") / 30).cast("long").as("q0"))
          .withColumn("fw", expr(
            """aggregate(slice(arr, 2, 29),
              |  array(named_struct(
              |    'c0', abs(element_at(arr, 1).y - q0),
              |    'c1', abs(element_at(arr, 1).y - 2*q0))),
              |  (acc, x) -> acc || array(named_struct(
              |    'c0', abs(x.y - q0) + least(element_at(acc, -1).c0,
              |      element_at(acc, -1).c1 + q0),
              |    'c1', abs(x.y - 2*q0) + least(element_at(acc, -1).c1,
              |      element_at(acc, -1).c0 + q0))))""".stripMargin))
          .withColumn("bw", expr(
            """reverse(aggregate(slice(reverse(arr), 2, 29),
              |  array(named_struct(
              |    'c0', abs(element_at(arr, 30).y - q0),
              |    'c1', abs(element_at(arr, 30).y - 2*q0))),
              |  (acc, x) -> acc || array(named_struct(
              |    'c0', abs(x.y - q0) + least(element_at(acc, -1).c0,
              |      element_at(acc, -1).c1 + q0),
              |    'c1', abs(x.y - 2*q0) + least(element_at(acc, -1).c1,
              |      element_at(acc, -1).c0 + q0)))))""".stripMargin))
          .withColumn("best", expr(
            "least(element_at(fw, 30).c0, element_at(fw, 30).c1)"))
          .localCheckpoint() // read per day by the decode explode
        folded
          .select(col("q0"), col("best"),
            posexplode(expr(
              """zip_with(arr, zip_with(fw, bw, (f, b) -> struct(f, b)),
                |  (a, c) -> struct(a.day AS day, a.y AS y,
                |    c.f.c0 + c.b.c0 AS s0))""".stripMargin)))
          .select(col("col.day").as("day"), col("col.y").as("y"),
            when(col("col.s0") - abs(col("col.y") - col("q0"))
              <= col("best"), 0L).otherwise(1L).as("burst"),
            col("best").as("total_cost"))
          .orderBy("day")
      }),

    // Quantized local-level Kalman filter over daily click counts:
    // state, gain, and error variance all live in exact micro integers
    // (Q = 5e4 micro, R = 2e6 micro, p0 = 1e7 micro); the signed
    // level-update division goes through the positive-shift floor F.
    // Converging gain_micro is the classic steady-state signature.
    Q("ts_kalman_level",
      Some(
        """WITH RECURSIVE dom AS (SELECT unnest(range(1, 31)) AS day),
          |d AS MATERIALIZED (SELECT dom.day,
          |  CAST(coalesce(s.y, 0) AS BIGINT) AS y
          |  FROM dom LEFT JOIN (
          |    SELECT CAST(strftime(ts, '%d') AS BIGINT) AS day,
          |      count(*) AS y FROM events WHERE event_type = 'click'
          |    GROUP BY 1) s ON s.day = dom.day),
          |f AS (
          |  SELECT 0 AS day, CAST(0 AS BIGINT) AS l,
          |    CAST(10000000 AS BIGINT) AS p, CAST(0 AS BIGINT) AS k,
          |    CAST(0 AS BIGINT) AS y
          |  UNION ALL
          |  SELECT d.day,
          |    f.l + ((((f.p + 50000) * 1000000 // (f.p + 50000 + 2000000))
          |      * (d.y * 1000000 - f.l) + 1000000000000000) // 1000000
          |      - 1000000000),
          |    ((1000000 - (f.p + 50000) * 1000000
          |      // (f.p + 50000 + 2000000)) * (f.p + 50000)) // 1000000,
          |    (f.p + 50000) * 1000000 // (f.p + 50000 + 2000000),
          |    d.y
          |  FROM f JOIN d ON d.day = f.day + 1 WHERE f.day < 30
          |)
          |SELECT day, y, l AS level_micro, k AS gain_micro,
          |  p AS p_micro
          |FROM f WHERE day > 0 ORDER BY day
          |""".stripMargin),
      (s, dir) => {
        val daily = H.events(s, dir)
          .filter(col("event_type") === "click")
          .groupBy(date_format(col("ts"), "d").cast("long").as("day"))
          .agg(count(lit(1)).cast("long").as("y"))
        val d = s.range(1, 31).select(col("id").as("day"))
          .join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
        d.agg(array_sort(collect_list(struct(col("day"), col("y"))))
            .as("arr"))
          .select(explode(expr(
            """aggregate(arr,
              |  array(named_struct('day', 0L, 'y', 0L, 'l', 0L,
              |    'p', 10000000L, 'k', 0L)),
              |  (acc, x) -> acc || array(named_struct(
              |    'day', x.day, 'y', x.y,
              |    'l', element_at(acc, -1).l +
              |      ((((element_at(acc, -1).p + 50000L) * 1000000L
              |        div (element_at(acc, -1).p + 50000L + 2000000L))
              |        * (x.y * 1000000L - element_at(acc, -1).l)
              |        + 1000000000000000L) div 1000000L - 1000000000L),
              |    'p', ((1000000L - (element_at(acc, -1).p + 50000L)
              |        * 1000000L div (element_at(acc, -1).p + 50000L
              |        + 2000000L)) * (element_at(acc, -1).p + 50000L))
              |      div 1000000L,
              |    'k', (element_at(acc, -1).p + 50000L) * 1000000L
              |      div (element_at(acc, -1).p + 50000L + 2000000L))))
              |""".stripMargin)).as("r"))
          .filter(col("r.day") > 0)
          .select(col("r.day").as("day"), col("r.y").as("y"),
            col("r.l").as("level_micro"), col("r.k").as("gain_micro"),
            col("r.p").as("p_micro"))
          .orderBy("day")
      }),

    // Wald-Wolfowitz runs test on daily click counts vs their median:
    // R observed runs among the strictly-above/strictly-below days,
    // z from the exact integer numerator R*n - 2*n1*n2 - n over the
    // sqrt variance (ties dropped, per the standard test).
    Q("stats_runs_test",
      Some(
        """WITH d AS (SELECT CAST(strftime(ts, '%d') AS BIGINT) AS day,
          |  CAST(count(*) AS BIGINT) AS y FROM events
          |  WHERE event_type = 'click' GROUP BY 1),
          |med AS (SELECT y AS m FROM (SELECT y, row_number() OVER
          |  (ORDER BY y, day) AS rn FROM d) r
          |  WHERE rn = (SELECT (count(*) + 1) // 2 FROM d)),
          |sgn AS (SELECT day, CASE WHEN y > m THEN 1 ELSE -1 END AS s
          |  FROM d, med WHERE y <> m),
          |runs AS (SELECT CAST(1 + sum(CASE WHEN s <> prev THEN 1
          |    ELSE 0 END) AS BIGINT) AS r,
          |  CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n1,
          |  CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n2
          |  FROM (SELECT s, lag(s) OVER (ORDER BY day) AS prev
          |    FROM sgn) x)
          |SELECT n1, n2, r AS runs,
          |  CAST(floor(1000.0 * (r*(n1+n2) - 2*n1*n2 - (n1+n2))
          |    / ((n1+n2) * sqrt(2.0*n1*n2*(2*n1*n2 - n1 - n2)
          |      / ((n1+n2)*(n1+n2)*(n1+n2-1)))) + 0.5) AS BIGINT)
          |    AS z_milli
          |FROM runs
          |""".stripMargin),
      (s, dir) => {
        val d = H.events(s, dir)
          .filter(col("event_type") === "click")
          .groupBy(date_format(col("ts"), "d").cast("long").as("day"))
          .agg(count(lit(1)).cast("long").as("y"))
          .localCheckpoint() // median rank + the sign sequence
        val n = d.count()
        val med = d
          .withColumn("rn", row_number().over(
            Window.orderBy(col("y"), col("day"))))
          .filter(col("rn") === (n + 1) / 2)
          .select(col("y").as("m"))
        val sgn = d.crossJoin(broadcast(med))
          .filter(col("y") =!= col("m"))
          .select(col("day"),
            when(col("y") > col("m"), 1L).otherwise(-1L).as("s"))
        sgn
          .withColumn("prev", lag("s", 1).over(Window.orderBy("day")))
          .agg(
            (lit(1L) + sum(when(col("s") =!= col("prev"), 1L)
              .otherwise(0L))).cast("long").as("runs"),
            sum(when(col("s") === 1, 1L).otherwise(0L)).cast("long")
              .as("n1"),
            sum(when(col("s") === -1, 1L).otherwise(0L)).cast("long")
              .as("n2"))
          .select(col("n1"), col("n2"), col("runs"),
            floor(lit(1000.0) *
              (col("runs") * (col("n1") + col("n2"))
                - lit(2) * col("n1") * col("n2")
                - (col("n1") + col("n2"))) /
              ((col("n1") + col("n2")) *
                sqrt(lit(2.0) * col("n1") * col("n2") *
                  (lit(2) * col("n1") * col("n2") - col("n1")
                    - col("n2")) /
                  ((col("n1") + col("n2")) * (col("n1") + col("n2")) *
                    (col("n1") + col("n2") - 1)))) + 0.5)
              .cast("long").as("z_milli"))
      }),

    // Adstock (geometric ad-carryover, half-life one day via bit
    // shift) of daily clicks, correlated against daily purchases:
    // Pearson r for both the raw and the adstocked series from exact
    // integer power sums — did carryover modeling increase the
    // observable click->purchase association?
    Q("events_adstock_corr",
      Some(
        """WITH RECURSIVE dom AS (SELECT unnest(range(1, 31)) AS day),
          |d AS MATERIALIZED (SELECT dom.day,
          |  CAST(coalesce(s.x, 0) AS BIGINT) AS x,
          |  CAST(coalesce(s.p, 0) AS BIGINT) AS p
          |  FROM dom LEFT JOIN (
          |    SELECT CAST(strftime(ts, '%d') AS BIGINT) AS day,
          |      sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
          |        AS x,
          |      sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          |        AS p
          |    FROM events GROUP BY 1) s ON s.day = dom.day),
          |ad AS (
          |  SELECT 1 AS day, (SELECT x FROM d WHERE day = 1) AS a
          |  UNION ALL
          |  SELECT ad.day + 1, d.x + ad.a // 2
          |  FROM ad JOIN d ON d.day = ad.day + 1 WHERE ad.day < 30),
          |j AS (SELECT d.day, d.x, d.p, ad.a FROM d
          |  JOIN ad ON ad.day = d.day),
          |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(p) AS BIGINT) AS sp,
          |  CAST(sum(a) AS BIGINT) AS sa,
          |  CAST(sum(x*x) AS BIGINT) AS sxx,
          |  CAST(sum(p*p) AS BIGINT) AS spp,
          |  CAST(sum(a*a) AS BIGINT) AS saa,
          |  CAST(sum(x*p) AS BIGINT) AS sxp,
          |  CAST(sum(a*p) AS BIGINT) AS sap FROM j)
          |SELECT n,
          |  CAST(floor(1000000.0 * (n*sxp - sx*sp)
          |    / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
          |      * sqrt(CAST(n*spp - sp*sp AS DOUBLE))) + 0.5) AS BIGINT)
          |    AS r_raw_micro,
          |  CAST(floor(1000000.0 * (n*sap - sa*sp)
          |    / (sqrt(CAST(n*saa - sa*sa AS DOUBLE))
          |      * sqrt(CAST(n*spp - sp*sp AS DOUBLE))) + 0.5) AS BIGINT)
          |    AS r_adstock_micro
          |FROM s
          |""".stripMargin),
      (s, dir) => {
        val daily = H.events(s, dir)
          .groupBy(date_format(col("ts"), "d").cast("long").as("day"))
          .agg(
            sum(when(col("event_type") === "click", 1).otherwise(0))
              .cast("long").as("x"),
            sum(when(col("event_type") === "purchase", 1).otherwise(0))
              .cast("long").as("p"))
        val d = s.range(1, 31).select(col("id").as("day"))
          .join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("x"), lit(0L)).as("x"),
            coalesce(col("p"), lit(0L)).as("p"))
        d.agg(array_sort(collect_list(struct(col("day"), col("x"),
            col("p")))).as("arr"))
          .withColumn("j", expr(
            """aggregate(slice(arr, 2, 29),
              |  array(named_struct('x', element_at(arr, 1).x,
              |    'p', element_at(arr, 1).p,
              |    'a', element_at(arr, 1).x)),
              |  (acc, r) -> acc || array(named_struct('x', r.x, 'p', r.p,
              |    'a', r.x + element_at(acc, -1).a div 2)))""".stripMargin))
          .select(explode(col("j")).as("r"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum("r.x").cast("long").as("sx"),
            sum("r.p").cast("long").as("sp"),
            sum("r.a").cast("long").as("sa"),
            sum(col("r.x") * col("r.x")).cast("long").as("sxx"),
            sum(col("r.p") * col("r.p")).cast("long").as("spp"),
            sum(col("r.a") * col("r.a")).cast("long").as("saa"),
            sum(col("r.x") * col("r.p")).cast("long").as("sxp"),
            sum(col("r.a") * col("r.p")).cast("long").as("sap"))
          .select(col("n"),
            floor(lit(1000000.0) * (col("n") * col("sxp")
              - col("sx") * col("sp")) /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) *
                sqrt((col("n") * col("spp") - col("sp") * col("sp"))
                  .cast("double"))) + 0.5).cast("long")
              .as("r_raw_micro"),
            floor(lit(1000000.0) * (col("n") * col("sap")
              - col("sa") * col("sp")) /
              (sqrt((col("n") * col("saa") - col("sa") * col("sa"))
                .cast("double")) *
                sqrt((col("n") * col("spp") - col("sp") * col("sp"))
                  .cast("double"))) + 0.5).cast("long")
              .as("r_adstock_micro"))
      }))
}
