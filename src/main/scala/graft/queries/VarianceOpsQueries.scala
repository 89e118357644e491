package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}

/** Sixtieth wave: variance decomposition and windowed order statistics —
  * one-way ANOVA across event types (milli-floored group means keep
  * every squared deviation inside 64 bits at any corpus size), an exact
  * sliding 7-day median (bounded window, in-row selection — never a
  * global sort), and exponentially discounted per-cohort value via
  * bit-shift halving (no floating decay factor).
  */
object VarianceOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // One-way ANOVA of value-cents across event types: between/within
    // sums of squares from milli-scaled mean deviations, each per-row
    // square floored by 10⁶ before summation (bounded ≤ 2.4e13 per
    // group at sf0.1; safe to 10⁹ rows), F in micro with sequenced
    // divisions. One group reduce + one per-row pass.
    Q("stats_anova_oneway",
      Some(
        """WITH e AS (SELECT event_type AS g,
          |  CAST(floor(value*100 + 0.5) AS BIGINT) AS v FROM events),
          |gs AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(v) AS BIGINT) AS s FROM e GROUP BY g),
          |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
          |  CAST(sum(s) AS BIGINT) AS ss,
          |  CAST(count(*) AS BIGINT) AS k FROM gs),
          |m AS (SELECT gs.g, gs.n, gs.s * 1000 // gs.n AS gm,
          |  tot.ss * 1000 // tot.nn AS tm, tot.nn, tot.k
          |  FROM gs CROSS JOIN tot),
          |ssb AS (SELECT CAST(sum(n * (((gm - tm) * (gm - tm))
          |  // 1000000)) AS BIGINT) AS ssb FROM m),
          |ssw AS (SELECT CAST(sum(((e.v * 1000 - m.gm)
          |  * (e.v * 1000 - m.gm)) // 1000000) AS BIGINT) AS ssw
          |  FROM e JOIN m ON m.g = e.g),
          |st AS (SELECT tot.k - 1 AS dfb, tot.nn - tot.k AS dfw,
          |  ssb.ssb, ssw.ssw FROM tot CROSS JOIN ssb CROSS JOIN ssw)
          |SELECT CAST(dfb AS BIGINT) AS dfb, CAST(dfw AS BIGINT) AS dfw,
          |  ssb, ssw,
          |  (ssb // dfb) * 1000000 // greatest(ssw // dfw, 1)
          |    AS f_micro
          |FROM st
          |""".stripMargin),
      (s, dir) => {
        val e = H.events(s, dir)
          .select(col("event_type").as("g"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("v"))
          .localCheckpoint() // group stats + the within-pass
        val gs = e.groupBy("g").agg(count(lit(1)).cast("long").as("n"),
          sum("v").cast("long").as("s"))
        val tot = gs.agg(sum("n").cast("long").as("nn"),
          sum("s").cast("long").as("ss"),
          count(lit(1)).cast("long").as("k"))
        val m = gs.crossJoin(broadcast(tot))
          .select(col("g"), col("n"),
            expr("s * 1000 div n").as("gm"),
            expr("ss * 1000 div nn").as("tm"), col("nn"), col("k"))
          .localCheckpoint() // ssb reduce + the per-row join
        val ssb = m.agg(sum(expr(
          "n * (((gm - tm) * (gm - tm)) div 1000000)"))
          .cast("long").as("ssb"))
        val ssw = e.join(broadcast(m.select(col("g"), col("gm"))), Seq("g"))
          .agg(sum(expr("((v * 1000 - gm) * (v * 1000 - gm)) div 1000000"))
            .cast("long").as("ssw"))
        val out = tot.crossJoin(broadcast(ssb)).crossJoin(broadcast(ssw))
          .select((col("k") - 1).as("dfb"),
            (col("nn") - col("k")).as("dfw"), col("ssb"), col("ssw"))
          .withColumn("f_micro", expr(
            "(ssb div dfb) * 1000000 div greatest(ssw div dfw, 1L)"))
        H.materialized(out, caches = Nil, checkpoints = Seq(e, m))
      }),

    // Exact sliding 7-day median of daily counts per type: the window is
    // bounded (≤7 rows), so the median is in-row selection over the
    // collected window array — never a repartition or global sort. Lower
    // median for even windows, matching percentile-disc discipline.
    Q("ts_sliding_median7",
      Some(
        """WITH d AS (SELECT event_type,
          |  CAST(strftime(ts, '%d') AS BIGINT) AS day,
          |  CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
          |w AS (SELECT event_type, day, c,
          |  list(c) OVER (PARTITION BY event_type ORDER BY day
          |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS win FROM d)
          |SELECT event_type, day, c,
          |  CAST(list_sort(win)[(len(win) + 1) // 2] AS BIGINT)
          |    AS median7
          |FROM w ORDER BY event_type, day
          |""".stripMargin),
      (s, dir) => {
        val wd = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-6, 0)
        H.events(s, dir)
          .groupBy(col("event_type"),
            date_format(col("ts"), "d").cast("long").as("day"))
          .agg(count(lit(1)).cast("long").as("c"))
          .withColumn("win", collect_list("c").over(wd))
          .withColumn("median7", element_at(array_sort(col("win")),
            ((size(col("win")) + 1) / 2).cast("int")))
          .select("event_type", "day", "c", "median7")
          .orderBy("event_type", "day")
      }),

    // Discounted cohort value: per signup-week cohort, purchase cents
    // discounted by week-of-month distance with half-life halving —
    // value >> weeks_since — integer shifts, no float decay. One
    // per-user reduce, then the cohort matrix.
    Q("events_discounted_value",
      Some(
        """WITH u AS (SELECT user_id,
          |  min(CAST(strftime(ts, '%d') AS BIGINT) - 1) // 7 AS cohort_w
          |  FROM events GROUP BY user_id),
          |p AS (SELECT e.user_id,
          |  (CAST(strftime(e.ts, '%d') AS BIGINT) - 1) // 7 AS w,
          |  CAST(floor(e.value*100 + 0.5) AS BIGINT) AS cents
          |  FROM events e WHERE e.event_type = 'purchase'),
          |j AS (SELECT u.cohort_w, p.w - u.cohort_w AS age_w, p.cents
          |  FROM p JOIN u ON u.user_id = p.user_id
          |  WHERE p.w >= u.cohort_w)
          |SELECT cohort_w, CAST(count(*) AS BIGINT) AS purchases,
          |  CAST(sum(cents) AS BIGINT) AS raw_cents,
          |  CAST(sum(cents // (1 << age_w)) AS BIGINT) AS discounted_cents
          |FROM j GROUP BY cohort_w ORDER BY cohort_w
          |""".stripMargin),
      (s, dir) => {
        val e = H.events(s, dir)
          .select(col("user_id"), col("event_type"),
            expr("(CAST(date_format(ts, 'd') AS BIGINT) - 1) div 7")
              .as("w"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
          .localCheckpoint() // cohort reduce + purchase pass
        val u = e.groupBy("user_id").agg(min("w").as("cohort_w"))
        val out = e.filter(col("event_type") === "purchase")
          .join(u, Seq("user_id"))
          .filter(col("w") >= col("cohort_w"))
          .withColumn("age_w", col("w") - col("cohort_w"))
          .groupBy("cohort_w")
          .agg(count(lit(1)).cast("long").as("purchases"),
            sum("cents").cast("long").as("raw_cents"),
            sum(expr("cents div (shiftleft(1L, CAST(age_w AS INT)))"))
              .cast("long").as("discounted_cents"))
          .orderBy("cohort_w")
        H.materialized(out, caches = Nil, checkpoints = Seq(e))
      }))
}
