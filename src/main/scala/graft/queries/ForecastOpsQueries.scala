package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}

/** Fifty-fourth wave: exponential-smoothing forecasting as exact integer
  * folds — Holt-Winters additive (level + trend + 7-slot seasonal vector)
  * and a simple-exponential-smoothing parameter grid. Each type's dense
  * 30-day milli-count array folds through one `aggregate` HOF (the
  * per-series-sequential shape; series fold in parallel across the
  * cluster), with the offset floor-div trick — a possibly-negative
  * operand gets +4·10¹² before div 4 and the engine subtracts 10¹² after,
  * so Spark's truncating `div` and DuckDB's flooring `//` agree exactly.
  * The oracle replays the identical recurrence as a recursive CTE whose
  * seasonal state is a LIST column rebuilt by comprehension each step.
  */
object ForecastOpsQueries extends QueryModule {

  private val DenseSql =
    """dd AS MATERIALIZED (
      |  SELECT ty.event_type, sp.day, coalesce(g.c, 0) * 1000 AS ym
      |  FROM (SELECT DISTINCT event_type FROM events) ty
      |  CROSS JOIN (SELECT unnest(range(1, 31)) AS day) sp
      |  LEFT JOIN (SELECT event_type, CAST(strftime(ts, '%d') AS BIGINT)
      |      AS day, CAST(count(*) AS BIGINT) AS c
      |    FROM events GROUP BY 1, 2) g
      |    ON g.event_type = ty.event_type AND g.day = sp.day)""".stripMargin

  private def denseArr(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val g = H.events(s, dir)
      .groupBy(col("event_type"),
        date_format(col("ts"), "d").cast("long").as("day"))
      .agg((count(lit(1)) * 1000).cast("long").as("ym"))
      .localCheckpoint() // the type domain and the dense join both read it
    val ty = g.select("event_type").distinct()
    val out = ty.withColumn("day", explode(sequence(lit(1L), lit(30L))))
      .join(g, Seq("event_type", "day"), "left")
      .withColumn("ym", coalesce(col("ym"), lit(0L)))
      .groupBy("event_type")
      .agg(transform(array_sort(collect_list(struct(col("day"),
        col("ym")))), p => p.getField("ym")).as("ym"))
    (out, g)
  }

  // shared recurrence fragments (Spark SQL lambda dialect; `st` is the
  // fold state, `t` the 1-based day)
  private val SIdx = "element_at(st.s, ((t-1) % 7) + 1)"
  private val Ymt = "element_at(ym, t)"
  private val LNew =
    s"($Ymt - $SIdx + 3*(st.l + st.b) + 4000000000000L) div 4" +
      " - 1000000000000L"
  private val BNew =
    s"(($LNew) - st.l + 3*st.b + 4000000000000L) div 4 - 1000000000000L"
  private val SNew =
    s"($Ymt - ($LNew) + 3*$SIdx + 4000000000000L) div 4 - 1000000000000L"
  private val ErrU = s"abs($Ymt - (st.l + st.b + $SIdx)) div 1000"

  def all: Seq[Q] = Seq(

    // Holt-Winters additive (α=β=γ=1/4, period 7): one-step-ahead SSE
    // from day 8, plus the day-31 forecast.
    Q("ts_holt_winters",
      Some(
        s"""WITH RECURSIVE $DenseSql,
           |w1 AS (SELECT event_type, list(ym ORDER BY day) AS f7 FROM dd
           |  WHERE day <= 7 GROUP BY event_type),
           |f AS (
           |  SELECT event_type, 7 AS t,
           |    CAST(list_aggregate(f7, 'sum') // 7 AS BIGINT) AS l,
           |    CAST(0 AS BIGINT) AS b,
           |    [CAST(f7[i+1] - list_aggregate(f7, 'sum') // 7 AS BIGINT)
           |      FOR i IN range(0,7)] AS s,
           |    CAST(0 AS BIGINT) AS sse
           |  FROM w1
           |  UNION ALL
           |  SELECT f.event_type, f.t + 1,
           |    (dd.ym - f.s[1 + (f.t % 7)] + 3*(f.l + f.b)
           |      + 4000000000000) // 4 - 1000000000000,
           |    ((dd.ym - f.s[1 + (f.t % 7)] + 3*(f.l + f.b)
           |      + 4000000000000) // 4 - 1000000000000
           |      - f.l + 3*f.b + 4000000000000) // 4 - 1000000000000,
           |    [CASE WHEN i = (f.t % 7) THEN
           |       (dd.ym - ((dd.ym - f.s[1 + (f.t % 7)] + 3*(f.l + f.b)
           |         + 4000000000000) // 4 - 1000000000000)
           |        + 3*f.s[1 + (f.t % 7)] + 4000000000000) // 4
           |        - 1000000000000
           |     ELSE f.s[i+1] END FOR i IN range(0,7)],
           |    f.sse + (abs(dd.ym - (f.l + f.b + f.s[1 + (f.t % 7)]))
           |      // 1000) * (abs(dd.ym - (f.l + f.b
           |      + f.s[1 + (f.t % 7)])) // 1000)
           |  FROM f JOIN dd ON dd.event_type = f.event_type
           |    AND dd.day = f.t + 1
           |  WHERE f.t < 30
           |)
           |SELECT event_type, CAST(l AS BIGINT) AS level_milli,
           |  CAST(b AS BIGINT) AS trend_milli,
           |  CAST(l + b + s[1 + (30 % 7)] AS BIGINT) AS forecast31_milli,
           |  CAST(sse AS BIGINT) AS sse_unit
           |FROM f WHERE t = 30 ORDER BY event_type
           |""".stripMargin),
      (s, dir) => {
        val (arr, g) = denseArr(s, dir)
        val fold =
          "aggregate(sequence(8, 30), " +
            "named_struct(" +
            "'l', aggregate(slice(ym, 1, 7), 0L, (a, x) -> a + x) div 7, " +
            "'b', 0L, " +
            "'s', transform(sequence(1, 7), i -> element_at(ym, i) - " +
            "aggregate(slice(ym, 1, 7), 0L, (a, x) -> a + x) div 7), " +
            "'sse', 0L), " +
            "(st, t) -> named_struct(" +
            s"'l', $LNew, " +
            s"'b', $BNew, " +
            s"'s', transform(st.s, (x, i) -> CASE WHEN i = (t-1) % 7 " +
            s"THEN $SNew ELSE x END), " +
            s"'sse', st.sse + ($ErrU) * ($ErrU)))"
        val out = arr
          .withColumn("st", expr(fold))
          .select(col("event_type"),
            col("st.l").as("level_milli"),
            col("st.b").as("trend_milli"),
            (col("st.l") + col("st.b") +
              element_at(col("st.s"), lit((30 % 7) + 1)))
              .as("forecast31_milli"),
            col("st.sse").as("sse_unit"))
          .orderBy("event_type")
        H.materialized(out, caches = Nil, checkpoints = Seq(g))
      }),

    // Simple-exponential-smoothing grid: α ∈ {1/2, 1/4, 1/8} folded per
    // type (l' = (y + (k−1)·l) div k — non-negative operands, no offset
    // needed), ranked by one-step-ahead SSE within type. The grid is an
    // explode over the per-type array rows — series × α fold in parallel.
    Q("ts_ses_grid",
      Some(
        s"""WITH RECURSIVE $DenseSql,
           |w0 AS (SELECT event_type, list(ym ORDER BY day) AS ya FROM dd
           |  GROUP BY event_type),
           |ks AS (SELECT unnest([2, 4, 8]) AS k),
           |f AS (
           |  SELECT w0.event_type, ks.k, 1 AS t,
           |    CAST(ya[1] AS BIGINT) AS l, CAST(0 AS BIGINT) AS sse, ya
           |  FROM w0 CROSS JOIN ks
           |  UNION ALL
           |  SELECT event_type, k, t + 1,
           |    (ya[t+1] + (k-1)*l) // k,
           |    sse + (abs(ya[t+1] - l) // 1000) * (abs(ya[t+1] - l) // 1000),
           |    ya
           |  FROM f WHERE t < 30
           |),
           |r AS (SELECT event_type, CAST(k AS BIGINT) AS k,
           |  CAST(l AS BIGINT) AS level_milli, CAST(sse AS BIGINT) AS sse_unit
           |  FROM f WHERE t = 30)
           |SELECT event_type, k, level_milli, sse_unit,
           |  CAST(row_number() OVER (PARTITION BY event_type
           |    ORDER BY sse_unit, k) AS BIGINT) AS rnk
           |FROM r ORDER BY event_type, k
           |""".stripMargin),
      (s, dir) => {
        val (arr, g) = denseArr(s, dir)
        def fold(k: Int) =
          s"aggregate(sequence(2, 30), " +
            s"named_struct('l', element_at(ym, 1), 'sse', 0L), " +
            s"(st, t) -> named_struct(" +
            s"'l', (element_at(ym, t) + ${k - 1}*st.l) div $k, " +
            s"'sse', st.sse + (abs(element_at(ym, t) - st.l) div 1000) * " +
            s"(abs(element_at(ym, t) - st.l) div 1000)))"
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("sse_unit", "k")
        val out = arr
          .withColumn("x", explode(array(Seq(2, 4, 8).map(k =>
            struct(lit(k.toLong).as("k"), expr(fold(k)).as("st"))): _*)))
          .select(col("event_type"), col("x.k"),
            col("x.st.l").as("level_milli"),
            col("x.st.sse").as("sse_unit"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .orderBy("event_type", "k")
        H.materialized(out, caches = Nil, checkpoints = Seq(g))
      }))
}
