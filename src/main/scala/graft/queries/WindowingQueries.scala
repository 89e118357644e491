package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.{dec2, fmtTs, fmtTsSec}

/** Event-time windowing — the batch-checkable faces of the Structured
  * Streaming operators (`graft.streaming` runs the same expressions under
  * readStream + watermark; specs cover that path with MemoryStream). Spark's
  * `window`/`session_window` are usable in batch aggregation, which is what
  * makes them DuckDB-verifiable here.
  */
object WindowingQueries extends QueryModule {

  private val F6 = "%Y-%m-%d %H:%M:%S.%f"
  private val F0 = "%Y-%m-%d %H:%M:%S"

  def all: Seq[Q] = Seq(

    Q("stream_tumbling",
      Some("SELECT strftime(time_bucket(INTERVAL '1 hour', ts), " +
        s"'$F0') AS wstart, event_type, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
      (s, dir) =>
        H.events(s, dir)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("value"))).cast("double").as("sum_value"))
          .select(fmtTsSec(col("window.start")).as("wstart"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("wstart", "event_type")),

    // Sliding 1h window every 15min: each event lands in 4 windows.
    Q("stream_sliding",
      Some("SELECT strftime(time_bucket(INTERVAL '15 minutes', ts) " +
        s"- k * INTERVAL '15 minutes', '$F0') AS wstart, " +
        "event_type, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value " +
        "FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) ks " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
      (s, dir) =>
        H.events(s, dir)
          .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("value"))).cast("double").as("sum_value"))
          .select(fmtTsSec(col("window.start")).as("wstart"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("wstart", "event_type")),

    // Session windows, 24h inactivity gap, per user. Session end is
    // last-event + gap (Spark's half-open [start, last+gap) semantics:
    // an event exactly `gap` after the last starts a NEW session → the
    // oracle's gaps-and-islands break uses `>=`).
    Q("stream_session",
      Some("WITH e AS (SELECT user_id, ts, value, " +
        "CASE WHEN lag(ts) OVER w IS NULL " +
        "OR ts - lag(ts) OVER w >= INTERVAL '24 hours' THEN 1 ELSE 0 END AS new_s " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT user_id, ts, value, sum(new_s) OVER " +
        "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM e) " +
        s"SELECT user_id, strftime(min(ts), '$F6') AS s_start, " +
        s"strftime(max(ts) + INTERVAL '24 hours', '$F6') AS s_end, " +
        "count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value " +
        "FROM s GROUP BY user_id, sid ORDER BY user_id, s_start"),
      (s, dir) =>
        H.events(s, dir)
          .groupBy(session_window(col("ts"), "24 hours"), col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("value"))).cast("double").as("sum_value"))
          .select(col("user_id"),
            fmtTs(col("session_window.start")).as("s_start"),
            fmtTs(col("session_window.end")).as("s_end"),
            col("n"), col("sum_value"))
          .orderBy("user_id", "s_start")))
}
