package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.{dec2, tbl}

/** Analytic-function completions: distribution ranks (exact rational
  * doubles, so engine-bit-exact), ntile, first/last value with explicit
  * frames, discrete median via window selection, and calendar gap-filling —
  * the "resample with zero-fill" ETL staple.
  */
object AnalyticQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    Q("win_analytic_extras",
      Some("SELECT c_custkey, c_nationkey, " +
        "CAST(ntile(4) OVER w AS BIGINT) AS quartile, " +
        "percent_rank() OVER w AS pr, " +
        "cume_dist() OVER w AS cd, " +
        "first_value(c_custkey) OVER " +
        "(PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest, " +
        "last_value(c_custkey) OVER " +
        "(PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest " +
        "FROM customer WINDOW w AS " +
        "(PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) " +
        "ORDER BY c_custkey"),
      (s, dir) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        val whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        tbl(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"),
            first(col("c_custkey")).over(whole).as("richest"),
            last(col("c_custkey")).over(whole).as("poorest"))
          .orderBy("c_custkey")
      }),

    // Discrete median (lower middle) selected by window position — exact in
    // both engines, unlike interpolated percentile implementations.
    Q("agg_median_disc",
      Some("WITH r AS (SELECT event_type, value, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn, " +
        "count(*) OVER (PARTITION BY event_type) AS n FROM events) " +
        "SELECT event_type, value AS median_value FROM r " +
        "WHERE rn = (n + 1) // 2 ORDER BY event_type"),
      (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
        val wc = Window.partitionBy("event_type")
        H.events(s, dir)
          .select(col("event_type"), col("value"), col("event_id"))
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wc))
          .filter(col("rn") === expr("(n + 1) div 2"))
          .select(col("event_type"), col("value").as("median_value"))
          .orderBy("event_type")
      }),

    // Approx percentile with the error bound ENCODED (same pattern as
    // agg_approx_distinct): the GK-sketch median itself isn't
    // SQL-reproducible, so the query emits the exact discrete p45/p55
    // envelope (window-position selection, engine-exact) plus a flag that
    // the approx median landed inside it. The oracle asserts the flag.
    Q("agg_approx_percentile",
      Some("WITH r AS (SELECT event_type, value, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn, " +
        "count(*) OVER (PARTITION BY event_type) AS n FROM events) " +
        "SELECT event_type, " +
        "max(CASE WHEN rn = CAST(ceil(n * 0.45) AS BIGINT) THEN value END) AS p45, " +
        "max(CASE WHEN rn = CAST(ceil(n * 0.55) AS BIGINT) THEN value END) AS p55, " +
        "CAST(1 AS INTEGER) AS median_in_bounds " +
        "FROM r GROUP BY event_type ORDER BY event_type"),
      (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
        val wc = Window.partitionBy("event_type")
        H.events(s, dir)
          .select(col("event_type"), col("value"), col("event_id"))
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wc))
          .groupBy("event_type")
          .agg(
            max(when(col("rn") === ceil(col("n") * 0.45).cast("long"), col("value"))).as("p45"),
            max(when(col("rn") === ceil(col("n") * 0.55).cast("long"), col("value"))).as("p55"),
            percentile_approx(col("value"), lit(0.5), lit(100)).as("am"))
          .select(col("event_type"), col("p45"), col("p55"),
            (col("am") >= col("p45") && col("am") <= col("p55")).cast("int")
              .as("median_in_bounds"))
          .orderBy("event_type")
      }),

    // Large×large time-range join via binning: clicks within ±1h of each
    // purchase, counted — an equi-join on time buckets plus an exact
    // predicate, never a cross product (graft.ops.Relational.proximityJoin).
    Q("join_range_time",
      Some("WITH p AS (SELECT event_id AS p_id, ts FROM events " +
        "WHERE event_type = 'purchase'), " +
        "c AS (SELECT ts AS cts FROM events WHERE event_type = 'click'), " +
        "j AS (SELECT p_id, count(*) AS n FROM p JOIN c " +
        "ON cts >= p.ts - INTERVAL '1 hour' AND cts <= p.ts + INTERVAL '1 hour' " +
        "GROUP BY p_id) " +
        "SELECT p.p_id, coalesce(j.n, 0) AS n_clicks " +
        "FROM p LEFT JOIN j ON j.p_id = p.p_id ORDER BY p.p_id"),
      (s, dir) => {
        val ev = H.events(s, dir)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
        val c = ev.filter(col("event_type") === "click")
          .select(col("ts").as("c_ts"))
        val matched = graft.ops.Relational
          .proximityJoin(p, c, "p_ts", "c_ts", radiusSeconds = 3600L)
          .groupBy("p_id").agg(count(lit(1)).as("n"))
        p.join(matched, Seq("p_id"), "left")
          .select(col("p_id"), coalesce(col("n"), lit(0L)).as("n_clicks"))
          .orderBy("p_id")
      }),

    // Skew-safe salted equi-join: the hot-key escape hatch
    // (Relational.saltedJoin) produces results IDENTICAL to the plain join —
    // verified here against the plain-join oracle. Salting spreads each
    // key's rows over `factor` sub-keys; only the shuffle layout changes.
    Q("join_salted",
      Some("SELECT o_orderpriority, count(*) AS n, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "WHERE c_mktsegment = 'BUILDING' " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
      (s, dir) => {
        val dim = tbl(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("o_custkey"))
        graft.ops.Relational
          .saltedJoin(tbl(s, dir, "orders"), dim, "o_custkey", factor = 8)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("o_totalprice"))).cast("double").as("total_spend"))
          .orderBy("o_orderpriority")
      }),

    // Calendar gap-fill: a generated day spine × event-type dim, left-joined
    // to daily aggregates, missing days zero-filled.
    Q("stream_gapfill",
      Some("WITH spine AS (SELECT unnest(generate_series(DATE '2024-01-01', " +
        "DATE '2024-01-30', INTERVAL 1 DAY))::DATE AS day), " +
        "types AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type), " +
        "daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, " +
        "count(*) AS n FROM events GROUP BY 1, 2) " +
        "SELECT strftime(s.day, '%Y-%m-%d') AS day, t.event_type, " +
        "coalesce(d.n, 0) AS n " +
        "FROM spine s CROSS JOIN types t " +
        "LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type " +
        "ORDER BY 1, 2"),
      (s, dir) => {
        val spine = s.range(1)
          .select(explode(expr(
            "sequence(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)"))
            .as("day"))
        import s.implicits._
        val types = Seq("click", "error", "purchase", "signup", "view")
          .toDF("event_type")
        val daily = H.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        spine.crossJoin(types)
          .join(daily, Seq("day", "event_type"), "left")
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
          .orderBy("day", "event_type")
      }),

    // Batch sessionization via the gap-and-island window pattern (the
    // classic formulation, complementing stream_session's session_window):
    // new-session flag where the gap to the previous event exceeds 8h,
    // running sum of flags = session index, then per-session aggregates.
    // One shuffle on user_id; all three windows share the same partition
    // order, so Catalyst plans a single sort. Gap compare in integer
    // microseconds — engine-exact.
    Q("events_sessionize",
      Some("WITH g AS (SELECT user_id, event_id, ts, " +
        "CASE WHEN lag(epoch_us(ts)) OVER w IS NULL " +
        "OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 28800000000 " +
        "THEN 1 ELSE 0 END AS new_s FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_idx FROM g) " +
        "SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, " +
        "CAST(count(*) AS BIGINT) AS n_events, " +
        "strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_start, " +
        "strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_end " +
        "FROM s GROUP BY 1, 2 ORDER BY 1, 2"),
      (s, dir) => {
        val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gapUs = 8L * 3600 * 1000000
        H.events(s, dir).select("user_id", "event_id", "ts")
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
          .withColumn("new_s",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
          .withColumn("session_idx", sum("new_s").over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_idx")
          .agg(count(lit(1)).as("n_events"),
            H.fmtTs(min(col("ts"))).as("s_start"),
            H.fmtTs(max(col("ts"))).as("s_end"))
          .orderBy("user_id", "session_idx")
      }),

    // Retention cohort matrix: cohort = each user's first active day,
    // cells = distinct users active at each day offset. Two shuffles
    // (per-user min, then cohort cells) — both key-parallel; the cohort
    // frame is users-sized, tiny next to the event log it summarizes.
    Q("events_retention",
      Some("WITH fa AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort " +
        "FROM events GROUP BY 1), " +
        "act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events) " +
        "SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day, " +
        "CAST(date_diff('day', cohort, d) AS BIGINT) AS day_offset, " +
        "CAST(count(*) AS BIGINT) AS n_users " +
        "FROM act JOIN fa USING (user_id) " +
        "GROUP BY cohort, day_offset ORDER BY 1, 2"),
      (s, dir) => {
        val ev = H.events(s, dir)
        val fa = ev.groupBy("user_id").agg(min(to_date(col("ts"))).as("cohort"))
        val act = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
        act.join(fa, Seq("user_id"))
          .withColumn("day_offset", datediff(col("d"), col("cohort")).cast("long"))
          .groupBy("cohort", "day_offset")
          .agg(count(lit(1)).as("n_users"))
          .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
            col("day_offset"), col("n_users"))
          .orderBy("cohort_day", "day_offset")
      }))
}
