package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.{tbl, fmtTs}

/** Forty-second wave: late-arriving SCD2 correction (the bitemporal
  * maintenance op) and matched-cohort uplift analysis (observational
  * causal measurement with exact-integer arithmetic).
  */
object BitemporalOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Late-arriving SCD2 correction: the interval table was built from
    // on-time events; late rows (synthesized: event_id % 11 = 0) arrive
    // after the fact and must retro-correct history. The engine rebuilds
    // ONLY the affected users (base intervals for untouched users pass
    // through — at 100 TB the correction cost follows |affected keys|,
    // not table size); the oracle computes the full rebuild directly, so
    // the hash compare PROVES incremental == rebuild. Same interval
    // semantics as scd2_intervals.
    Q("scd2_late_correction",
      Some(
        "WITH e AS (SELECT user_id, event_type, ts, event_id FROM events " +
          "WHERE user_id < 200), " +
          "ch AS (SELECT user_id, event_type, ts, event_id, " +
          "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev " +
          "FROM e), " +
          "f AS (SELECT user_id, event_type, ts, event_id FROM ch " +
          "WHERE prev IS NULL OR prev <> event_type), " +
          "v AS (SELECT user_id, event_type, ts, " +
          "lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vto, " +
          "CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version " +
          "FROM f) " +
          "SELECT user_id, version, event_type, " +
          "strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from, " +
          "strftime(vto, '%Y-%m-%d %H:%M:%S.%f') AS valid_to, " +
          "CASE WHEN vto IS NULL THEN 1 ELSE 0 END AS is_current " +
          "FROM v ORDER BY user_id, version"),
      (s, dir) => {
        val all = H.events(s, dir)
          .select("user_id", "event_type", "ts", "event_id")
          .filter(col("user_id") < 200)
        val isLate = pmod(col("event_id"), lit(11)) === 0
        def build(ev: org.apache.spark.sql.DataFrame) = {
          val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          ev.withColumn("prev", lag(col("event_type"), 1).over(w))
            .filter(col("prev").isNull || col("prev") =!= col("event_type"))
            .withColumn("vto", lead(col("ts"), 1).over(w))
            .withColumn("version", row_number().over(w).cast("long"))
            .select(col("user_id"), col("version"), col("event_type"),
              fmtTs(col("ts")).as("valid_from"),
              fmtTs(col("vto")).as("valid_to"),
              when(col("vto").isNull, 1).otherwise(0).as("is_current"))
        }
        // the on-time base table (what the warehouse holds before the
        // late batch lands)
        val onTime = all.filter(!isLate)
        val late = all.filter(isLate).localCheckpoint()
        val affected = late.select("user_id").distinct()
        // correction: affected users rebuild from on-time + late rows;
        // every other user's base intervals pass through UNTOUCHED
        val affectedRebuilt = build(
          all.join(broadcast(affected), Seq("user_id"), "left_semi"))
        val untouched = build(onTime)
          .join(broadcast(affected), Seq("user_id"), "left_anti")
        H.materialized(
          untouched.unionAll(affectedRebuilt).orderBy("user_id", "version"),
          caches = Nil, checkpoints = Seq(late))
      }),

    // Matched-cohort uplift: treated users (above-median error load in the pre
    // period, days 1-15) against controls MATCHED on pre-period activity
    // bucket; outcome = post-period (days 16-30) purchase count. The
    // exact-integer analogue of propensity bucketing: per bucket the
    // uplift is a difference of floor-scaled means, and the overall row
    // aggregates only buckets holding BOTH groups (the common-support
    // rule, enforced structurally). events_ab_test covers randomized
    // splits; this is the observational path.
    Q("events_uplift_matched",
      Some("WITH e AS (SELECT user_id, event_type, ts FROM events), " +
        "pre AS (SELECT user_id, CAST(count(*) AS BIGINT) AS pre_n, " +
        "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS pre_err " +
        "FROM e WHERE CAST(strftime(ts, '%d') AS BIGINT) <= 15 GROUP BY user_id), " +
        "post AS (SELECT user_id, CAST(count(*) AS BIGINT) AS post_buy FROM e " +
        "WHERE CAST(strftime(ts, '%d') AS BIGINT) > 15 AND event_type = 'purchase' " +
        "GROUP BY user_id), " +
        "u AS (SELECT p.user_id, p.pre_n // 5 AS bucket, " +
        "CASE WHEN p.pre_err >= 7 THEN 1 ELSE 0 END AS treated, " +
        "coalesce(po.post_buy, 0) AS y FROM pre p " +
        "LEFT JOIN post po ON po.user_id = p.user_id), " +
        "b AS (SELECT bucket, " +
        "CAST(sum(treated) AS BIGINT) AS n_t, " +
        "CAST(sum(1 - treated) AS BIGINT) AS n_c, " +
        "CAST(sum(CASE WHEN treated = 1 THEN y ELSE 0 END) AS BIGINT) AS y_t, " +
        "CAST(sum(CASE WHEN treated = 0 THEN y ELSE 0 END) AS BIGINT) AS y_c " +
        "FROM u GROUP BY bucket) " +
        "SELECT bucket, n_t, n_c, y_t, y_c, " +
        "(y_t * 1000000) // n_t - (y_c * 1000000) // n_c AS uplift_micro " +
        "FROM b WHERE n_t > 0 AND n_c > 0 ORDER BY bucket"),
      (s, dir) => {
        val e = H.events(s, dir)
          .select(col("user_id"), col("event_type"),
            date_format(col("ts"), "d").cast("long").as("day"))
          .localCheckpoint() // pre and post both scan it
        val pre = e.filter(col("day") <= 15)
          .groupBy("user_id")
          .agg(count(lit(1)).cast("long").as("pre_n"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L))
              .cast("long").as("pre_err"))
        val post = e.filter(col("day") > 15 && col("event_type") === "purchase")
          .groupBy("user_id").agg(count(lit(1)).cast("long").as("post_buy"))
        val u = pre.join(post, Seq("user_id"), "left")
          .select(expr("pre_n div 5").as("bucket"),
            when(col("pre_err") >= 7, 1L).otherwise(0L).as("treated"),
            coalesce(col("post_buy"), lit(0L)).as("y"))
        H.materialized(
          u.groupBy("bucket")
            .agg(sum("treated").cast("long").as("n_t"),
              sum(lit(1L) - col("treated")).cast("long").as("n_c"),
              sum(when(col("treated") === 1, col("y")).otherwise(0L))
                .cast("long").as("y_t"),
              sum(when(col("treated") === 0, col("y")).otherwise(0L))
                .cast("long").as("y_c"))
            .filter(col("n_t") > 0 && col("n_c") > 0)
            .select(col("bucket"), col("n_t"), col("n_c"), col("y_t"),
              col("y_c"),
              (expr("(y_t * 1000000) div n_t") -
                expr("(y_c * 1000000) div n_c")).as("uplift_micro"))
            .orderBy("bucket"),
          caches = Nil, checkpoints = Seq(e))
      }),

    // BITEMPORAL AS-OF (r9): reconstruct each user's state at VALID time
    // V as the warehouse KNEW it at TRANSACTION time T — the 2-D query
    // that distinguishes "what was true" from "what we believed". Load
    // batches: on-time events land at txn 1, late rows (event_id % 11 =
    // 0, the scd2_late_correction convention) at txn 2. The same valid
    // time V answers DIFFERENTLY across T — exactly the audit/replay
    // contract (reproduce last week's report bit-for-bit, or re-state it
    // with corrections). Scale shape: each event fans into at most
    // |grid| = 4 (V, T) cells it is visible in (bounded fanout, no
    // per-cell rescan); one argmax groupBy per (user, cell) with a
    // deterministic (ts, event_id) tie-break, then a cell-domain count.
    Q("scd2_bitemporal_asof",
      Some(
        """WITH e AS (
          |  SELECT user_id, event_type, ts, event_id,
          |    CAST(strftime(ts, '%d') AS BIGINT) AS day,
          |    CASE WHEN event_id % 11 = 0 THEN 2 ELSE 1 END AS txn
          |  FROM events),
          |grid AS (
          |  SELECT v, t FROM (VALUES (10, 1), (10, 2), (20, 1), (20, 2))
          |    AS g(v, t)),
          |vis AS (
          |  SELECT g.v, g.t, e.user_id, e.event_type, e.ts, e.event_id
          |  FROM e JOIN grid g ON e.day <= g.v AND e.txn <= g.t),
          |st AS (
          |  SELECT v, t, user_id, event_type,
          |    row_number() OVER (PARTITION BY v, t, user_id
          |      ORDER BY ts DESC, event_id DESC) AS rn
          |  FROM vis)
          |SELECT CAST(v AS BIGINT) AS v_day, CAST(t AS BIGINT) AS txn,
          |  event_type AS state, CAST(count(*) AS BIGINT) AS n_users
          |FROM st WHERE rn = 1
          |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
          |""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val e = H.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"),
            date_format(col("ts"), "d").cast("long").as("day"),
            when(pmod(col("event_id"), lit(11)) === 0, 2L).otherwise(1L)
              .as("txn"))
        val grid = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L))
          .toDF("v", "t")
        // bounded fanout (≤4 cells per event), then ONE argmax reduce:
        // max(struct(ts, event_id, state)) is the deterministic latest
        val st = e.join(broadcast(grid),
            col("day") <= col("v") && col("txn") <= col("t"))
          .groupBy("v", "t", "user_id")
          .agg(max(struct(col("ts"), col("event_id"),
            col("event_type"))).getField("event_type").as("state"))
        st.groupBy(col("v").as("v_day"), col("t").as("txn"), col("state"))
          .agg(count(lit(1)).cast("long").as("n_users"))
          .orderBy("v_day", "txn", "state")
      }),

    // DOUBLY-ROBUST (AIPW) UPLIFT: the augmented inverse-propensity
    // estimator over the same observational frame as
    // events_uplift_matched — τ̂ = mean[ m̂₁−m̂₀ + T·(y−m̂₁)/ê −
    // (1−T)·(y−m̂₀)/(1−ê) ], consistent if EITHER the outcome model or
    // the propensity is right (Robins-Rotnitzky-Zhao 1994; the standard
    // modern causal default). Outcome model = per-bucket exact micro
    // means; propensity ê_s = bucket treated share, so 1/ê_s = n_s/n_t_s
    // stays an integer ratio — every per-user correction term is integer
    // arithmetic with ONE documented div per term, identical in both
    // engines. Output: the three estimators side by side (naive diff,
    // stratified G-computation, AIPW) with the frame sizes. Scale shape:
    // two per-user partial aggregates + one bucket-domain model join —
    // the per-user terms reduce map-side.
    Q("events_aipw_uplift",
      Some(
        """WITH e AS (SELECT user_id, event_type,
          |    CAST(strftime(ts, '%d') AS BIGINT) AS day FROM events),
          |pre AS (SELECT user_id, CAST(count(*) AS BIGINT) AS pre_n,
          |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          |      AS BIGINT) AS pre_err
          |  FROM e WHERE day <= 15 GROUP BY user_id),
          |post AS (SELECT user_id, CAST(count(*) AS BIGINT) AS post_buy
          |  FROM e WHERE day > 15 AND event_type = 'purchase'
          |  GROUP BY user_id),
          |u AS (SELECT p.user_id, p.pre_n // 5 AS bucket,
          |    CASE WHEN p.pre_err >= 7 THEN 1 ELSE 0 END AS t,
          |    coalesce(po.post_buy, 0) * 1000000 AS y
          |  FROM pre p LEFT JOIN post po ON po.user_id = p.user_id),
          |b AS (SELECT bucket,
          |    CAST(count(*) AS BIGINT) AS n_s,
          |    CAST(sum(t) AS BIGINT) AS nt,
          |    CAST(sum(1 - t) AS BIGINT) AS nc,
          |    CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS yt,
          |    CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS yc
          |  FROM u GROUP BY bucket HAVING sum(t) > 0 AND sum(1 - t) > 0),
          |m AS (SELECT bucket, n_s, nt, nc,
          |    yt // nt AS m1, yc // nc AS m0 FROM b),
          |terms AS (
          |  SELECT u.t, u.y, m.m1, m.m0, m.n_s, m.nt, m.nc,
          |    m.m1 - m.m0
          |      + CASE WHEN u.t = 1
          |          THEN ((u.y - m.m1) * m.n_s) // m.nt ELSE 0 END
          |      - CASE WHEN u.t = 0
          |          THEN ((u.y - m.m0) * m.n_s) // m.nc ELSE 0 END AS tau
          |  FROM u JOIN m ON m.bucket = u.bucket),
          |agg AS (
          |  SELECT CAST(count(*) AS BIGINT) AS n_users,
          |    CAST(sum(t) AS BIGINT) AS n_treated,
          |    CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS syt,
          |    CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS syc,
          |    CAST(sum((m1 - m0)) AS BIGINT) AS sg,
          |    CAST(sum(tau) AS BIGINT) AS staipw
          |  FROM terms)
          |SELECT n_users, n_treated,
          |  CAST(syt // n_treated - syc // (n_users - n_treated) AS BIGINT)
          |    AS ate_naive_micro,
          |  CAST(sg // n_users AS BIGINT) AS ate_strat_micro,
          |  CAST(staipw // n_users AS BIGINT) AS ate_aipw_micro
          |FROM agg
          |""".stripMargin),
      (s, dir) => {
        val e = H.events(s, dir)
          .select(col("user_id"), col("event_type"),
            date_format(col("ts"), "d").cast("long").as("day"))
          .localCheckpoint() // pre and post both scan it
        val pre = e.filter(col("day") <= 15)
          .groupBy("user_id")
          .agg(count(lit(1)).cast("long").as("pre_n"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L))
              .cast("long").as("pre_err"))
        val post = e.filter(col("day") > 15 &&
            col("event_type") === "purchase")
          .groupBy("user_id").agg(count(lit(1)).cast("long").as("post_buy"))
        val u = pre.join(post, Seq("user_id"), "left")
          .select(expr("pre_n div 5").as("bucket"),
            when(col("pre_err") >= 7, 1L).otherwise(0L).as("t"),
            (coalesce(col("post_buy"), lit(0L)) * 1000000L).as("y"))
          .localCheckpoint() // model fit AND per-user terms both read it
        // bucket-domain outcome/propensity model (exact integer ratios)
        val m = u.groupBy("bucket")
          .agg(count(lit(1)).cast("long").as("n_s"),
            sum("t").cast("long").as("nt"),
            sum(lit(1L) - col("t")).cast("long").as("nc"),
            sum(when(col("t") === 1, col("y")).otherwise(0L))
              .cast("long").as("yt"),
            sum(when(col("t") === 0, col("y")).otherwise(0L))
              .cast("long").as("yc"))
          .filter(col("nt") > 0 && col("nc") > 0)
          .select(col("bucket"), col("n_s"), col("nt"), col("nc"),
            expr("yt div nt").as("m1"), expr("yc div nc").as("m0"))
        val terms = u.join(m, Seq("bucket"))
          .select(col("t"), col("y"), col("m1"), col("m0"),
            (col("m1") - col("m0")
              + when(col("t") === 1,
                expr("((y - m1) * n_s) div nt")).otherwise(0L)
              - when(col("t") === 0,
                expr("((y - m0) * n_s) div nc")).otherwise(0L)).as("tau"))
        val out = terms.agg(
            count(lit(1)).cast("long").as("n_users"),
            sum("t").cast("long").as("n_treated"),
            sum(when(col("t") === 1, col("y")).otherwise(0L))
              .cast("long").as("syt"),
            sum(when(col("t") === 0, col("y")).otherwise(0L))
              .cast("long").as("syc"),
            sum(col("m1") - col("m0")).cast("long").as("sg"),
            sum("tau").cast("long").as("staipw"))
          .select(col("n_users"), col("n_treated"),
            expr("CAST(syt div n_treated - syc div (n_users - n_treated)" +
              " AS BIGINT)").as("ate_naive_micro"),
            expr("CAST(sg div n_users AS BIGINT)").as("ate_strat_micro"),
            expr("CAST(staipw div n_users AS BIGINT)").as("ate_aipw_micro"))
        H.materialized(out, caches = Nil, checkpoints = Seq(e, u))
      }))
}
