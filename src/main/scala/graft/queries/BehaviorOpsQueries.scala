package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Fourteenth wave: behavioral/split ops — last-touch conversion
  * attribution over the event stream, group-aware k-fold assignment (the
  * split that PREVENTS the leakage split_leakage_audit detects), and an
  * exponentially-decayed daily activity trend.
  *
  * Determinism: attribution credits whole conversions (integer counts +
  * DECIMAL-summed value — no fractional credit, so no float accumulation);
  * the k-fold assignment is a rank formula, not a hash; the EWMA's decay
  * weights are dyadic (2^-k) and carried as exact BIGINT numerators via
  * bit shifts until one final IEEE division — no libm pow on the compare
  * path in any engine.
  */
object BehaviorOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // LAST-TOUCH ATTRIBUTION: each purchase is credited to the same
    // user's most recent non-purchase event within the preceding 24 h
    // (ties on ts broken by event_id; purchases with no qualifying touch
    // report as '(direct)'). The per-user ordered pass is ONE window over
    // the event stream — the ignore-nulls last_value trick pulls the
    // predecessor without a self-join, so the heavy stage is a single
    // hash-partition-by-user exchange; the report aggregation afterwards
    // runs on |event_types| rows. Value sums go through DECIMAL (exact,
    // order-independent); latency is an exact integer micros sum with one
    // final division.
    Q("events_attribution",
      Some(
        """WITH ev AS (SELECT user_id, event_id, event_type, ts, value
          |            FROM events),
          |w AS (
          |  SELECT *,
          |    last_value(CASE WHEN event_type <> 'purchase' THEN epoch_us(ts)
          |               END IGNORE NULLS)
          |      OVER (PARTITION BY user_id ORDER BY ts, event_id
          |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          |      AS touch_us,
          |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type
          |               END IGNORE NULLS)
          |      OVER (PARTITION BY user_id ORDER BY ts, event_id
          |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          |      AS touch_type
          |  FROM ev),
          |conv AS (
          |  SELECT CASE WHEN touch_us IS NOT NULL
          |                   AND epoch_us(ts) - touch_us <= 86400000000
          |              THEN touch_type ELSE '(direct)' END AS channel,
          |         value,
          |         CASE WHEN touch_us IS NOT NULL
          |                   AND epoch_us(ts) - touch_us <= 86400000000
          |              THEN epoch_us(ts) - touch_us END AS lat_us
          |  FROM w WHERE event_type = 'purchase')
          |SELECT channel, CAST(count(*) AS BIGINT) AS n_conversions,
          |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
          |  CAST(sum(lat_us) AS DOUBLE) / count(lat_us) / 1000000.0
          |    AS avg_latency_sec
          |FROM conv GROUP BY channel ORDER BY channel""".stripMargin),
      (s, dir) => {
        val wSpec = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val notPurchase = col("event_type") =!= "purchase"
        val w = H.events(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("ts"), col("value"))
          .withColumn("touch_us",
            last(when(notPurchase, unix_micros(col("ts"))),
              ignoreNulls = true).over(wSpec))
          .withColumn("touch_type",
            last(when(notPurchase, col("event_type")),
              ignoreNulls = true).over(wSpec))
        val inWin = col("touch_us").isNotNull &&
          unix_micros(col("ts")) - col("touch_us") <= 86400000000L
        w.filter(col("event_type") === "purchase")
          .select(
            when(inWin, col("touch_type")).otherwise("(direct)").as("channel"),
            col("value"),
            when(inWin, unix_micros(col("ts")) - col("touch_us")).as("lat_us"))
          .groupBy("channel")
          .agg(count(lit(1)).as("n_conversions"),
            H.sumMoney(col("value")).as("total_value"),
            (sum("lat_us").cast("double") / count("lat_us") / 1000000.0)
              .as("avg_latency_sec"))
          .orderBy("channel")
      }),

    // GROUP-AWARE K-FOLD SPLIT: every document of a source lands in the
    // same fold (fold = group rank mod 5 — a deterministic formula, so
    // the assignment is reproducible across runs and engines with no
    // seeded RNG), which is the split discipline that prevents the
    // train/test contamination split_leakage_audit exists to catch. The
    // group table is the distinct-source domain (sublinear in the
    // corpus); its rank is a window over |groups| rows and the join back
    // is unhinted so AQE broadcasts it while it's small. The output
    // carries the per-fold balance AND the executable no-leak proof
    // (max_folds_per_group == 1).
    Q("sample_group_kfold",
      Some(
        """WITH g AS (
          |  SELECT source, CAST(row_number() OVER (ORDER BY source) - 1
          |    AS BIGINT) % 5 AS fold
          |  FROM (SELECT DISTINCT source FROM documents)),
          |d AS (SELECT d.doc_id, d.source, d.n_chars, d.lang, g.fold
          |      FROM documents d JOIN g USING (source)),
          |leak AS (
          |  SELECT max(nf) AS max_folds_per_group FROM (
          |    SELECT source, count(DISTINCT fold) AS nf FROM d GROUP BY 1))
          |SELECT fold, CAST(count(DISTINCT source) AS BIGINT) AS n_groups,
          |  CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
          |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
          |  CAST(max(max_folds_per_group) AS BIGINT) AS max_folds_per_group
          |FROM d, leak GROUP BY fold ORDER BY fold""".stripMargin),
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val g = docs.select("source").distinct()
          .withColumn("fold",
            ((row_number().over(Window.orderBy("source")) - 1) % 5)
              .cast("long"))
        val d = docs.join(g, Seq("source"))
        val leak = d.groupBy("source")
          .agg(countDistinct("fold").as("nf"))
          .agg(max("nf").as("max_folds_per_group"))
        d.crossJoin(broadcast(leak))
          .groupBy("fold")
          .agg(countDistinct("source").as("n_groups"),
            count(lit(1)).as("n_docs"),
            sum("n_chars").cast("long").as("n_chars"),
            countDistinct("lang").as("n_langs"),
            max("max_folds_per_group").cast("long").as("max_folds_per_group"))
          .orderBy("fold")
      }),

    // DYADIC EWMA TREND: per event type, the exponentially-decayed daily
    // event count over a 10-day window with weights 2^-k (k = days back).
    // The decay sum stays EXACT until the last step: day counts are
    // integers, each frame term c_j·2^(9-k) is computed as one windowed
    // BIGINT sum of c_j·2^(rn_j) followed by a single bit shift (every
    // term keeps a factor ≥ 2^(rn-9), so the right shift drops no bits),
    // and the normalized trend is one IEEE division of two exact BIGINTs
    // — bit-identical across engines with pow() never called. Shape: the
    // heavy pass is one map-side-combined (type, day) count; the window
    // runs on the |types|×|days| domain.
    Q("ts_ewma",
      Some(
        """WITH d AS (
          |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
          |         CAST(count(*) AS BIGINT) AS c
          |  FROM events GROUP BY 1, 2),
          |r AS (
          |  SELECT *, CAST(row_number() OVER (PARTITION BY event_type
          |    ORDER BY day) - 1 AS BIGINT) AS rn FROM d),
          |f AS (
          |  SELECT *,
          |    sum(c << rn) OVER (PARTITION BY event_type ORDER BY rn
          |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS s,
          |    sum(1::BIGINT << rn) OVER (PARTITION BY event_type ORDER BY rn
          |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS m
          |  FROM r),
          |sh AS (
          |  SELECT event_type, day, c,
          |    CASE WHEN rn >= 9 THEN s >> (rn - 9) ELSE s << (9 - rn) END AS s2,
          |    CASE WHEN rn >= 9 THEN m >> (rn - 9) ELSE m << (9 - rn) END AS m2
          |  FROM f)
          |SELECT event_type, day, c,
          |  CAST(s2 AS DOUBLE) / CAST(m2 AS DOUBLE) AS ewma
          |FROM sh ORDER BY event_type, day""".stripMargin),
      (s, dir) => {
        val d = H.events(s, dir)
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("c"))
        val byType = Window.partitionBy("event_type").orderBy("day")
        val frame = Window.partitionBy("event_type").orderBy("rn")
          .rowsBetween(-9, Window.currentRow)
        val r = d.withColumn("rn",
          (row_number().over(byType) - 1).cast("long"))
        r.withColumn("s",
            sum(expr("shiftleft(c, CAST(rn AS INT))")).over(frame))
          .withColumn("m",
            sum(expr("shiftleft(1L, CAST(rn AS INT))")).over(frame))
          .select(col("event_type"), col("day"), col("c"),
            when(col("rn") >= 9,
              expr("shiftright(s, CAST(rn - 9 AS INT))"))
              .otherwise(expr("shiftleft(s, CAST(9 - rn AS INT))")).as("s2"),
            when(col("rn") >= 9,
              expr("shiftright(m, CAST(rn - 9 AS INT))"))
              .otherwise(expr("shiftleft(m, CAST(9 - rn AS INT))")).as("m2"))
          .select(col("event_type"), col("day"), col("c"),
            (col("s2").cast("double") / col("m2").cast("double")).as("ewma"))
          .orderBy("event_type", "day")
      })
  )
}
