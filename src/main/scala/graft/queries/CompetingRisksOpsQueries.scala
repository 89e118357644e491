package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-9 wave 128: competing-risks survival (Aalen–Johansen cumulative
  * incidence — the estimator that replaces 1−KM when events compete; KM
  * on one cause alone over-counts, the textbook bias) and time-phased
  * requirements explosion (MRP — the manufacturing-planning netting walk
  * down a bounded-depth BOM). Determinism discipline as the KM wave:
  * the day-grid recurrences run as micro-integer folds (array-fold in
  * Spark, recursive CTE in the oracle); the only fact-sized ops are
  * per-key partial aggregates.
  */
object CompetingRisksOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // AALEN–JOHANSEN CUMULATIVE INCIDENCE: users experience the FIRST of
    // two competing terminal events — purchase (cause A) or error (cause
    // B) — at day-of-month resolution; users with neither are censored at
    // their last activity day. CIF_k(t) = Σ_{s≤t} S(s−)·d_k(s)/n(s) with
    // S the ALL-cause survival — the estimator whose cause-k curve plus
    // the competitor's plus S(t) sums to 1 (identity asserted by the
    // micro-integer fold construction: surv + cifA + cifB only moves mass
    // between the three accumulators). Tie day (both causes same day) →
    // cause A by a documented deterministic rule. Scale shape: two
    // map-side per-user aggregates are the only corpus passes; the
    // at-risk suffix and the fold run on the 30-row day grid.
    Q("events_competing_risks",
      Some(
        """WITH RECURSIVE peru AS (
          |  SELECT user_id,
          |    min(CASE WHEN event_type = 'purchase'
          |      THEN CAST(strftime(ts, '%d') AS BIGINT) END) AS ta,
          |    min(CASE WHEN event_type = 'error'
          |      THEN CAST(strftime(ts, '%d') AS BIGINT) END) AS tb,
          |    max(CAST(strftime(ts, '%d') AS BIGINT)) AS lastd
          |  FROM events GROUP BY user_id),
          |lab AS (
          |  SELECT user_id,
          |    CASE WHEN ta IS NOT NULL AND (tb IS NULL OR ta <= tb) THEN 'A'
          |         WHEN tb IS NOT NULL THEN 'B' ELSE 'C' END AS cause,
          |    CASE WHEN ta IS NOT NULL AND (tb IS NULL OR ta <= tb) THEN ta
          |         WHEN tb IS NOT NULL THEN tb ELSE lastd END AS day
          |  FROM peru),
          |byday AS (
          |  SELECT day,
          |    CAST(sum(CASE WHEN cause = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS da,
          |    CAST(sum(CASE WHEN cause = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS db
          |  FROM lab GROUP BY day),
          |spine AS (SELECT unnest(range(1, 31)) AS day),
          |t AS (
          |  SELECT s.day, coalesce(b.da, 0) AS da, coalesce(b.db, 0) AS db,
          |    CAST((SELECT count(*) FROM lab l WHERE l.day >= s.day)
          |      AS BIGINT) AS n
          |  FROM spine s LEFT JOIN byday b ON b.day = s.day),
          |aj AS (
          |  SELECT CAST(0 AS BIGINT) AS day, CAST(1000000 AS BIGINT) AS s,
          |    CAST(0 AS BIGINT) AS ca, CAST(0 AS BIGINT) AS cb
          |  UNION ALL
          |  SELECT t.day,
          |    CASE WHEN t.n = 0 THEN aj.s
          |      ELSE aj.s - (aj.s * t.da) // t.n - (aj.s * t.db) // t.n END,
          |    CASE WHEN t.n = 0 THEN aj.ca
          |      ELSE aj.ca + (aj.s * t.da) // t.n END,
          |    CASE WHEN t.n = 0 THEN aj.cb
          |      ELSE aj.cb + (aj.s * t.db) // t.n END
          |  FROM aj JOIN t ON t.day = aj.day + 1)
          |SELECT aj.day, t.n AS n_risk, t.da AS d_purchase, t.db AS d_error,
          |  aj.ca AS cif_purchase_micro, aj.cb AS cif_error_micro,
          |  aj.s AS surv_micro
          |FROM aj JOIN t ON t.day = aj.day ORDER BY aj.day
          |""".stripMargin),
      (s, dir) => {
        val peru = H.events(s, dir)
          .groupBy("user_id")
          .agg(
            min(when(col("event_type") === "purchase",
              date_format(col("ts"), "d").cast("long"))).as("ta"),
            min(when(col("event_type") === "error",
              date_format(col("ts"), "d").cast("long"))).as("tb"),
            max(date_format(col("ts"), "d").cast("long")).as("lastd"))
        val lab = peru.select(
            when(col("ta").isNotNull &&
              (col("tb").isNull || col("ta") <= col("tb")), "A")
              .when(col("tb").isNotNull, "B").otherwise("C").as("cause"),
            when(col("ta").isNotNull &&
              (col("tb").isNull || col("ta") <= col("tb")), col("ta"))
              .when(col("tb").isNotNull, col("tb")).otherwise(col("lastd"))
              .as("day"))
          .localCheckpoint() // read by the day reduce AND at-risk suffix
        val byday = lab.groupBy("day")
          .agg(sum(when(col("cause") === "A", 1L).otherwise(0L))
            .cast("long").as("da"),
            sum(when(col("cause") === "B", 1L).otherwise(0L))
              .cast("long").as("db"))
        val spine = s.range(1, 31).select(col("id").as("day"))
        // at-risk suffix over the 30-day grid — O(days²) on the bounded
        // domain (the |users| frame reduces to ≤30 day-count rows first)
        val perday = lab.groupBy(col("day").as("dd"))
          .agg(count(lit(1)).cast("long").as("cnt"))
        val atRisk = spine.join(broadcast(perday), col("dd") >= col("day"),
            "left")
          .groupBy("day").agg(coalesce(sum("cnt"), lit(0L)).cast("long")
            .as("n"))
        val t = spine.join(broadcast(byday), Seq("day"), "left")
          .join(broadcast(atRisk), Seq("day"))
          .select(col("day"), coalesce(col("da"), lit(0L)).as("da"),
            coalesce(col("db"), lit(0L)).as("db"), col("n"))
        // the AJ recurrence as one integer array fold (KM-wave idiom):
        // mass only moves from surv into the two CIF accumulators
        val folded = t.agg(array_sort(collect_list(struct(col("day"),
            col("da"), col("db"), col("n")))).as("arr"))
          .select(explode(expr(
            "aggregate(arr, array(named_struct(" +
              "'day', CAST(0 AS BIGINT), 'n_risk', CAST(0 AS BIGINT), " +
              "'d_purchase', CAST(0 AS BIGINT), " +
              "'d_error', CAST(0 AS BIGINT), " +
              "'cif_purchase_micro', CAST(0 AS BIGINT), " +
              "'cif_error_micro', CAST(0 AS BIGINT), " +
              "'surv_micro', CAST(1000000 AS BIGINT))), " +
              "(acc, x) -> acc || array(named_struct(" +
              "'day', x.day, 'n_risk', x.n, " +
              "'d_purchase', x.da, 'd_error', x.db, " +
              "'cif_purchase_micro', CASE WHEN x.n = 0 " +
              "THEN element_at(acc, -1).cif_purchase_micro " +
              "ELSE element_at(acc, -1).cif_purchase_micro + " +
              "(element_at(acc, -1).surv_micro * x.da) div x.n END, " +
              "'cif_error_micro', CASE WHEN x.n = 0 " +
              "THEN element_at(acc, -1).cif_error_micro " +
              "ELSE element_at(acc, -1).cif_error_micro + " +
              "(element_at(acc, -1).surv_micro * x.db) div x.n END, " +
              "'surv_micro', CASE WHEN x.n = 0 " +
              "THEN element_at(acc, -1).surv_micro " +
              "ELSE element_at(acc, -1).surv_micro - " +
              "(element_at(acc, -1).surv_micro * x.da) div x.n - " +
              "(element_at(acc, -1).surv_micro * x.db) div x.n END)))"))
            .as("r"))
          .filter(col("r.day") > 0)
        val out = folded.select(col("r.day").as("day"),
            col("r.n_risk").as("n_risk"),
            col("r.d_purchase").as("d_purchase"),
            col("r.d_error").as("d_error"),
            col("r.cif_purchase_micro").as("cif_purchase_micro"),
            col("r.cif_error_micro").as("cif_error_micro"),
            col("r.surv_micro").as("surv_micro"))
          .orderBy("day")
        H.materialized(out, caches = Nil, checkpoints = Seq(lab))
      }),

    // MRP TIME-PHASED REQUIREMENTS EXPLOSION: demand nets down a
    // bounded-depth bill of materials — component(p) = p//10 with
    // qty-per = p%5+1 and lead time = p%3+1 weeks (a deterministic
    // synthetic BOM over the part catalog; every part ≥10 has its
    // component in-catalog by construction). Level 0 gross requirements
    // come from ordered quantities per (part, week); each explosion pass
    // offsets by the consuming part's lead time (the planned-release
    // calculus) and multiplies by qty-per. Three passes — the classic
    // level-synchronous MRP walk, depth bounded by the BOM, never a
    // recursive fact join. Scale shape: ONE fact-sized (part, week)
    // reduce; every pass after is part-domain map + re-reduce with
    // map-side combine. Output: per-level weekly requirement totals.
    Q("orders_mrp_explosion",
      Some(
        """WITH d0 AS (
          |  SELECT l_partkey AS part,
          |    CAST(date_diff('day', TIMESTAMP '1992-01-01',
          |      CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) // 7 AS week,
          |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
          |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          |  GROUP BY 1, 2),
          |e1 AS (
          |  SELECT part // 10 AS cpart, week - (part % 3 + 1) AS cweek,
          |    qty * (part % 5 + 1) AS cqty FROM d0 WHERE part >= 10),
          |d1 AS (
          |  SELECT cpart AS part, cweek AS week,
          |    CAST(sum(cqty) AS BIGINT) AS qty FROM e1 GROUP BY 1, 2),
          |e2 AS (
          |  SELECT part // 10 AS cpart, week - (part % 3 + 1) AS cweek,
          |    qty * (part % 5 + 1) AS cqty FROM d1 WHERE part >= 10),
          |d2 AS (
          |  SELECT cpart AS part, cweek AS week,
          |    CAST(sum(cqty) AS BIGINT) AS qty FROM e2 GROUP BY 1, 2),
          |e3 AS (
          |  SELECT part // 10 AS cpart, week - (part % 3 + 1) AS cweek,
          |    qty * (part % 5 + 1) AS cqty FROM d2 WHERE part >= 10),
          |d3 AS (
          |  SELECT cpart AS part, cweek AS week,
          |    CAST(sum(cqty) AS BIGINT) AS qty FROM e3 GROUP BY 1, 2),
          |u AS (
          |  SELECT 0 AS lvl, part, week, qty FROM d0
          |  UNION ALL SELECT 1, part, week, qty FROM d1
          |  UNION ALL SELECT 2, part, week, qty FROM d2
          |  UNION ALL SELECT 3, part, week, qty FROM d3)
          |SELECT CAST(lvl AS BIGINT) AS lvl, week,
          |  CAST(count(*) AS BIGINT) AS n_parts,
          |  CAST(sum(qty) AS BIGINT) AS total_qty
          |FROM u GROUP BY 1, 2 ORDER BY 1, 2
          |""".stripMargin),
      (s, dir) => {
        // the only fact-sized op: gross requirements per (part, week)
        val d0 = tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "orders"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_partkey").as("part"),
            (datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
              / 7).cast("long").as("week"))
          .agg(sum(col("l_quantity").cast("long")).cast("long").as("qty"))
        // one level-synchronous netting pass: lead-time offset + qty-per
        // multiply + part-domain re-reduce (map-side combined)
        def explode1(d: org.apache.spark.sql.DataFrame) = d
          .filter(col("part") >= 10)
          .groupBy((col("part") / 10).cast("long").as("part"),
            (col("week") - (pmod(col("part"), lit(3)) + 1)).as("week"))
          .agg(sum(col("qty") * (pmod(col("part"), lit(5)) + 1))
            .cast("long").as("qty"))
        val d1 = explode1(d0); val d2 = explode1(d1); val d3 = explode1(d2)
        def lvl(n: Int, d: org.apache.spark.sql.DataFrame) =
          d.select(lit(n.toLong).as("lvl"), col("part"), col("week"),
            col("qty"))
        lvl(0, d0).unionAll(lvl(1, d1)).unionAll(lvl(2, d2))
          .unionAll(lvl(3, d3))
          .groupBy("lvl", "week")
          .agg(count(lit(1)).cast("long").as("n_parts"),
            sum("qty").cast("long").as("total_qty"))
          .orderBy("lvl", "week")
      })
  )
}
