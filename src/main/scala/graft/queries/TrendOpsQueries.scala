package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}

/** Forty-sixth wave: time-series trend ops over the daily event-count
  * series — Theil-Sen robust slope (median of pairwise slopes), best-lag
  * cross-correlation between event types, and monotone-streak detection
  * (gaps-and-islands over rises). The fact table compresses to ≤30 rows
  * per type in one map-side-combined pass, so every pairwise construction
  * downstream is over a tiny frame — the 100 TB cost is the first
  * aggregation, never the trend math.
  *
  * Slope division uses the offset trick: floor((a + K·b)·10⁶ / b) =
  * K·10⁶ + floor(a·10⁶/b) exactly, so the numerator stays positive and
  * Spark's truncating `div` agrees with DuckDB's flooring `//` even when
  * the day-over-day delta is negative (K = 100000 covers any daily count
  * below 100k; at larger scale raise K — it cancels exactly).
  */
object TrendOpsQueries extends QueryModule {

  private val DailySql =
    "SELECT event_type, CAST(strftime(ts, '%d') AS BIGINT) AS day, " +
      "CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2"

  private def daily(s: org.apache.spark.sql.SparkSession, dir: String) =
    H.events(s, dir)
      .groupBy(col("event_type"),
        date_format(col("ts"), "d").cast("long").as("day"))
      .agg(count(lit(1)).cast("long").as("c"))

  def all: Seq[Q] = Seq(

    // Theil-Sen estimator: the lower-median of all pairwise day slopes per
    // event type — the robust trend line (breakdown point 29%), exact to
    // the micro.
    Q("ts_theil_sen",
      Some(
        s"""WITH d AS ($DailySql),
           |p AS (SELECT a.event_type,
           |  ((b.c - a.c) + 100000*(b.day - a.day)) * 1000000
           |    // (b.day - a.day) - 100000000000 AS sm
           |  FROM d a JOIN d b
           |    ON a.event_type = b.event_type AND a.day < b.day),
           |r AS (SELECT event_type, sm,
           |  row_number() OVER (PARTITION BY event_type ORDER BY sm) AS rn,
           |  count(*) OVER (PARTITION BY event_type) AS cnt FROM p)
           |SELECT event_type, CAST(cnt AS BIGINT) AS n_pairs,
           |  CAST(sm AS BIGINT) AS slope_micro
           |FROM r WHERE rn = (cnt + 1) // 2 ORDER BY event_type
           |""".stripMargin),
      (s, dir) => {
        val d = daily(s, dir).localCheckpoint() // both self-join sides
        val b = d.select(col("event_type").as("et2"), col("day").as("day2"),
          col("c").as("c2"))
        val wr = Window.partitionBy("event_type").orderBy("sm")
        val wc = Window.partitionBy("event_type")
        val out = d.join(b, col("event_type") === col("et2") &&
            col("day") < col("day2"))
          .select(col("event_type"),
            expr("((c2 - c) + 100000*(day2 - day)) * 1000000" +
              " div (day2 - day) - 100000000000").as("sm"))
          .withColumn("rn", row_number().over(wr).cast("long"))
          .withColumn("cnt", count(lit(1)).over(wc).cast("long"))
          .filter(col("rn") === expr("(cnt + 1) div 2"))
          .select(col("event_type"), col("cnt").as("n_pairs"),
            col("sm").as("slope_micro"))
          .orderBy("event_type")
        H.materialized(out, caches = Nil, checkpoints = Seq(d))
      }),

    // Best-lag cross-correlation: for each ordered type pair (ta < tb) and
    // lag ∈ [-7, 7], the raw integer cross-product Σ a(d)·b(d+lag); report
    // the argmax lag. The lag sweep is an explode-to-equi join (15 shifted
    // copies of the left series hash-joined on day), never a non-equi
    // nested loop.
    Q("ts_xcorr_lag",
      Some(
        s"""WITH d AS ($DailySql),
           |x AS (SELECT a.event_type AS ta, b.event_type AS tb, lag.l,
           |  CAST(sum(a.c * b.c) AS BIGINT) AS score
           |  FROM d a
           |  CROSS JOIN (SELECT unnest(range(-7, 8)) AS l) lag
           |  JOIN d b ON b.day = a.day + lag.l AND a.event_type < b.event_type
           |  GROUP BY a.event_type, b.event_type, lag.l),
           |r AS (SELECT ta, tb, l, score,
           |  row_number() OVER (PARTITION BY ta, tb
           |    ORDER BY score DESC, l) AS rn FROM x)
           |SELECT ta, tb, CAST(l AS BIGINT) AS best_lag, score
           |FROM r WHERE rn = 1 ORDER BY ta, tb
           |""".stripMargin),
      (s, dir) => {
        val d = daily(s, dir).localCheckpoint() // both join sides
        val lags = array((-7 to 7).map(l => lit(l.toLong)): _*)
        val a = d.withColumn("l", explode(lags))
          .select(col("event_type").as("ta"), col("l"),
            (col("day") + col("l")).as("md"), col("c").as("ca"))
        val b = d.select(col("event_type").as("tb"), col("day").as("day2"),
          col("c").as("cb"))
        val w = Window.partitionBy("ta", "tb")
          .orderBy(col("score").desc, col("l"))
        val out = a.join(b, col("md") === col("day2") &&
            col("ta") < col("tb"))
          .groupBy("ta", "tb", "l")
          .agg(sum(col("ca") * col("cb")).cast("long").as("score"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("ta"), col("tb"), col("l").as("best_lag"),
            col("score"))
          .orderBy("ta", "tb")
        H.materialized(out, caches = Nil, checkpoints = Seq(d))
      }),

    // Monotone rise streaks: consecutive-day strictly-increasing runs per
    // type (gaps-and-islands keyed by day − row_number), reporting the
    // longest run, the number of runs, and runs of length ≥ 3.
    Q("ts_monotone_streaks",
      Some(
        s"""WITH d AS ($DailySql),
           |f AS (SELECT event_type, day,
           |  CASE WHEN day = lag(day) OVER w + 1
           |    AND c > lag(c) OVER w THEN 1 ELSE 0 END AS rise
           |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
           |i AS (SELECT event_type,
           |  day - row_number() OVER (PARTITION BY event_type ORDER BY day)
           |    AS grp FROM f WHERE rise = 1),
           |runs AS (SELECT event_type, grp, CAST(count(*) AS BIGINT) AS len
           |  FROM i GROUP BY event_type, grp)
           |SELECT event_type, CAST(count(*) AS BIGINT) AS n_runs,
           |  CAST(max(len) AS BIGINT) AS max_run,
           |  CAST(sum(CASE WHEN len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS runs_ge3
           |FROM runs GROUP BY event_type ORDER BY event_type
           |""".stripMargin),
      (s, dir) => {
        val wd = Window.partitionBy("event_type").orderBy("day")
        daily(s, dir)
          .withColumn("rise",
            when(col("day") === lag(col("day"), 1).over(wd) + 1 &&
              col("c") > lag(col("c"), 1).over(wd), 1).otherwise(0))
          .filter(col("rise") === 1)
          .withColumn("grp",
            col("day") - row_number().over(wd).cast("long"))
          .groupBy("event_type", "grp")
          .agg(count(lit(1)).cast("long").as("len"))
          .groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n_runs"),
            max("len").cast("long").as("max_run"),
            sum(when(col("len") >= 3, 1L).otherwise(0L)).cast("long")
              .as("runs_ge3"))
          .orderBy("event_type")
      }))
}
