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
      }))
}
