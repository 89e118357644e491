package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Ninety-seventh wave: fuzzy linkage at name-level, cohort migration,
  * bitmap-word set algebra, and conversion latency — a blocked fuzzy
  * name match that NEVER expands row-level pairs (names dedupe to the
  * bounded vocabulary first; pair mass returns as count products), the
  * year-over-year spend-band migration matrix, distinct-user
  * intersection via 64-bit bitmap words (bit_or + AND + bit_count —
  * the roaring-bitmap shape in pure SQL), and first-view→first-purchase
  * latency percentiles from a value-count histogram.
  *
  * Exactness: Levenshtein is the uniquely-defined metric both engines
  * implement natively; all masses/counts are integer products; the
  * latency stats use the discrete-percentile and milli-mean idioms.
  */
object FuzzyBitmapOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Blocked fuzzy name match over the part catalog: block on the
    // first word, compare DISTINCT names (the vocabulary is bounded —
    // word₁×word₂ — so the name-level join stays fixed-size while the
    // corpus grows), and report pair mass by multiplying row counts
    // back in: exact-duplicate pairs C(cnt,2) per name, near pairs
    // (levenshtein 1–3) as cnt_a·cnt_b. The scale discipline IS the
    // point: fuzzy joins explode row-level; name-level they don't.
    Q("er_fuzzy_name_match",
      Some(
        """WITH n AS (SELECT p_name, CAST(count(*) AS BIGINT) AS cnt
          |  FROM part GROUP BY 1),
          |b AS (SELECT p_name, cnt, string_split(p_name, ' ')[1] AS blk
          |  FROM n),
          |np AS (SELECT a.blk, CAST(count(*) AS BIGINT) AS near_name_pairs,
          |  CAST(sum(a.cnt * b.cnt) AS BIGINT) AS near_pair_mass
          |  FROM b a JOIN b b ON b.blk = a.blk AND a.p_name < b.p_name
          |  WHERE levenshtein(a.p_name, b.p_name) <= 3 GROUP BY 1),
          |g AS (SELECT blk, CAST(count(*) AS BIGINT) AS n_names,
          |  CAST(sum(cnt) AS BIGINT) AS n_rows,
          |  CAST(sum(cnt * (cnt - 1) // 2) AS BIGINT) AS exact_dup_pairs
          |  FROM b GROUP BY 1)
          |SELECT g.blk AS block, g.n_names, g.n_rows, g.exact_dup_pairs,
          |  CAST(coalesce(np.near_name_pairs, 0) AS BIGINT)
          |    AS near_name_pairs,
          |  CAST(coalesce(np.near_pair_mass, 0) AS BIGINT)
          |    AS near_pair_mass
          |FROM g LEFT JOIN np ON np.blk = g.blk ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val n = tbl(s, dir, "part")
          .groupBy("p_name").agg(count(lit(1)).cast("long").as("cnt"))
        val b = n.withColumn("blk",
          element_at(split(col("p_name"), " ", -1), 1))
          .localCheckpoint() // bounded vocabulary frame, used 3×
        val np = b.as("a")
          .join(b.as("b"), col("b.blk") === col("a.blk") &&
            col("a.p_name") < col("b.p_name"))
          .filter(levenshtein(col("a.p_name"), col("b.p_name")) <= 3)
          .groupBy(col("a.blk").as("blk"))
          .agg(count(lit(1)).cast("long").as("near_name_pairs"),
            sum(col("a.cnt") * col("b.cnt")).cast("long")
              .as("near_pair_mass"))
        val g = b.groupBy("blk")
          .agg(count(lit(1)).cast("long").as("n_names"),
            sum(col("cnt")).cast("long").as("n_rows"),
            sum(expr("cnt * (cnt - 1) div 2")).cast("long")
              .as("exact_dup_pairs"))
        val out = g.join(np.withColumnRenamed("blk", "blk2"),
            col("blk") === col("blk2"), "left")
          .select(col("blk").as("block"), col("n_names"), col("n_rows"),
            col("exact_dup_pairs"),
            coalesce(col("near_name_pairs"), lit(0L)).cast("long")
              .as("near_name_pairs"),
            coalesce(col("near_pair_mass"), lit(0L)).cast("long")
              .as("near_pair_mass"))
          .orderBy("block")
        H.materialized(out, Nil, Seq(b))
      }),

    // Spend-band migration matrix, 1996 → 1997: per customer annual
    // cents, fixed absolute bands (the thresholds are part of the
    // spec — NO global sort/ntile, so the banding is one map-side
    // expression at any scale), full-outer across years so entrants
    // (band −1 in 1996) and churners (band −1 in 1997) land in the
    // matrix. The retention report a revenue team reads quarterly.
    Q("orders_tier_migration",
      Some(
        """WITH y AS (SELECT o_custkey AS ck, year(o_orderdate) AS yr,
          |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents
          |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
          |  GROUP BY 1, 2),
          |b AS (SELECT ck, yr,
          |  CASE WHEN cents < 10000000 THEN 0
          |       WHEN cents < 25000000 THEN 1
          |       WHEN cents < 50000000 THEN 2 ELSE 3 END AS band,
          |  cents FROM y),
          |m AS (SELECT coalesce(a.ck, c.ck) AS ck,
          |  coalesce(a.band, -1) AS band_1996,
          |  coalesce(c.band, -1) AS band_1997,
          |  coalesce(c.cents, 0) AS cents_1997
          |  FROM (SELECT * FROM b WHERE yr = 1996) a
          |  FULL OUTER JOIN (SELECT * FROM b WHERE yr = 1997) c
          |    ON c.ck = a.ck)
          |SELECT CAST(band_1996 AS BIGINT) AS band_1996,
          |  CAST(band_1997 AS BIGINT) AS band_1997,
          |  CAST(count(*) AS BIGINT) AS n_customers,
          |  CAST(sum(cents_1997) AS BIGINT) AS cents_1997
          |FROM m GROUP BY 1, 2 ORDER BY 1, 2
          |""".stripMargin),
      (s, dir) => {
        val y = tbl(s, dir, "orders")
          .filter(year(col("o_orderdate")).isin(1996, 1997))
          .groupBy(col("o_custkey").as("ck"),
            year(col("o_orderdate")).as("yr"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
            .cast("long")).cast("long").as("cents"))
        val b = y.withColumn("band",
          when(col("cents") < 10000000L, 0)
            .when(col("cents") < 25000000L, 1)
            .when(col("cents") < 50000000L, 2).otherwise(3))
        val a96 = b.filter(col("yr") === 1996)
          .select(col("ck"), col("band").as("b96"))
        val a97 = b.filter(col("yr") === 1997)
          .select(col("ck").as("ck2"), col("band").as("b97"),
            col("cents").as("c97"))
        a96.join(a97, col("ck") === col("ck2"), "full_outer")
          .select(coalesce(col("b96"), lit(-1)).cast("long")
              .as("band_1996"),
            coalesce(col("b97"), lit(-1)).cast("long").as("band_1997"),
            coalesce(col("c97"), lit(0L)).as("cents_1997"))
          .groupBy("band_1996", "band_1997")
          .agg(count(lit(1)).cast("long").as("n_customers"),
            sum(col("cents_1997")).cast("long").as("cents_1997"))
          .orderBy("band_1996", "band_1997")
      }),

    // Distinct-user intersection via bitmap words: users who BOTH
    // clicked and purchased per day, computed as 62-bit word buckets (bit 63 would overflow DuckDB's checked shift) —
    // bit_or to build each side's bitmap, & to intersect, bit_count to
    // cardinality — the roaring-bitmap/bitmap-index shape in three
    // codegen'd integer ops. vs the naive COUNT(DISTINCT … INTERSECT)
    // this ships ~n/64 words through the shuffle instead of n ids and
    // parallelizes the AND perfectly.
    Q("agg_bitmap_intersect",
      Some(
        """WITH e AS (SELECT CAST(ts AS DATE) AS day,
          |  user_id // 62 AS w,
          |  (CAST(1 AS BIGINT) << CAST(user_id % 62 AS INT)) AS bit,
          |  event_type FROM events
          |  WHERE event_type IN ('click', 'purchase')),
          |m AS (SELECT day, w,
          |  bit_or(CASE WHEN event_type = 'click' THEN bit
          |    ELSE 0 END) AS bc,
          |  bit_or(CASE WHEN event_type = 'purchase' THEN bit
          |    ELSE 0 END) AS bp
          |  FROM e GROUP BY 1, 2)
          |SELECT strftime(day, '%Y-%m-%d') AS day,
          |  CAST(sum(bit_count(bc)) AS BIGINT) AS n_click,
          |  CAST(sum(bit_count(bp)) AS BIGINT) AS n_purchase,
          |  CAST(sum(bit_count(bc & bp)) AS BIGINT) AS n_both
          |FROM m GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val e = H.events(s, dir)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("ts").cast("date").as("day"),
            expr("user_id div 62").as("w"),
            expr("shiftleft(CAST(1 AS BIGINT)," +
              " CAST(user_id % 62 AS INT))").as("bit"),
            col("event_type"))
        val m = e.groupBy("day", "w")
          .agg(bit_or(when(col("event_type") === "click", col("bit"))
              .otherwise(0L)).as("bc"),
            bit_or(when(col("event_type") === "purchase", col("bit"))
              .otherwise(0L)).as("bp"))
        m.groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
          .agg(sum(bit_count(col("bc"))).cast("long").as("n_click"),
            sum(bit_count(col("bp"))).cast("long").as("n_purchase"),
            sum(bit_count(col("bc").bitwiseAND(col("bp")))).cast("long")
              .as("n_both"))
          .orderBy("day")
      }),

    // First-view → first-subsequent-purchase latency: per user the
    // two firsts (map-side min), latency in whole minutes, then exact
    // discrete p50/p90 and the milli-mean from the value-count
    // histogram. The conversion-latency curve growth teams track; the
    // histogram keeps every post-scan stage value-bounded.
    Q("events_time_to_convert",
      Some(
        """WITH f AS (SELECT user_id,
          |  min(CASE WHEN event_type = 'view' THEN ts END) AS v,
          |  min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
          |  FROM events GROUP BY 1),
          |l AS (SELECT (epoch_us(p) - epoch_us(v)) // 60000000 AS m
          |  FROM f WHERE v IS NOT NULL AND p IS NOT NULL AND p > v),
          |h AS (SELECT m, CAST(count(*) AS BIGINT) AS n FROM l
          |  GROUP BY 1),
          |c AS (SELECT m, n,
          |  CAST(coalesce(sum(n) OVER (ORDER BY m
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |    AS BIGINT) AS bef,
          |  CAST(sum(n) OVER () AS BIGINT) AS nn,
          |  CAST(sum(n * m) OVER () AS BIGINT) AS sm FROM h)
          |SELECT max(nn) AS n_converted,
          |  CAST(max(sm) * 1000 // max(nn) AS BIGINT)
          |    AS mean_minutes_milli,
          |  CAST(min(CASE WHEN bef < (50*nn + 99)//100
          |    AND (50*nn + 99)//100 <= bef + n THEN m END) AS BIGINT)
          |    AS p50_minutes,
          |  CAST(min(CASE WHEN bef < (90*nn + 99)//100
          |    AND (90*nn + 99)//100 <= bef + n THEN m END) AS BIGINT)
          |    AS p90_minutes
          |FROM c
          |""".stripMargin),
      (s, dir) => {
        val f = H.events(s, dir)
          .groupBy("user_id")
          .agg(min(when(col("event_type") === "view", col("ts")))
            .as("v"),
            min(when(col("event_type") === "purchase", col("ts")))
              .as("p"))
        val l = f.filter(col("v").isNotNull && col("p").isNotNull &&
            col("p") > col("v"))
          .select(expr("(unix_micros(p) - unix_micros(v)) div 60000000")
            .as("m"))
        val h = l.groupBy("m").agg(count(lit(1)).cast("long").as("n"))
        val wb = Window.orderBy("m")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wg = Window.partitionBy()
        val c = h
          .withColumn("bef", coalesce(sum(col("n")).over(wb), lit(0L))
            .cast("long"))
          .withColumn("nn", sum(col("n")).over(wg).cast("long"))
          .withColumn("sm",
            sum(col("n") * col("m")).over(wg).cast("long"))
        c.agg(max(col("nn")).as("n_converted"),
            expr("max(sm) * 1000 div max(nn)").cast("long")
              .as("mean_minutes_milli"),
            min(when(col("bef") < expr("(50*nn + 99) div 100") &&
              expr("(50*nn + 99) div 100") <= col("bef") + col("n"),
              col("m"))).cast("long").as("p50_minutes"),
            min(when(col("bef") < expr("(90*nn + 99) div 100") &&
              expr("(90*nn + 99) div 100") <= col("bef") + col("n"),
              col("m"))).cast("long").as("p90_minutes"))
      })
  )
}
