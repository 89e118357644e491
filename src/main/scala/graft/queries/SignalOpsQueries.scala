package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Fifteenth wave: signal/QA ops — behavioral transition modeling, data
  * freshness auditing, exact weighted percentiles, and token burstiness.
  *
  * Determinism: transition probabilities, percentile picks, and burstiness
  * are all single IEEE divisions of exact BIGINT/DECIMAL-derived values;
  * timestamps leave the engine as formatted strings only.
  */
object SignalOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // MARKOV TRANSITION MATRIX over the per-user event stream: counts and
    // row-normalized probabilities of each consecutive event-type pair
    // (ties on ts broken by event_id — the stream order is total). The
    // heavy stage is ONE hash-partition-by-user window (lag), then the
    // aggregation runs on |types|² rows; the row-normalizer joins back on
    // the |types| domain, unhinted so AQE broadcasts it. Behavioral
    // transition models are how session-analytics engines featurize
    // clickstreams — and the probability is an exact c/rowTotal division.
    Q("events_markov",
      Some(
        """WITH e AS (
          |  SELECT user_id, event_type, ts, event_id FROM events),
          |t AS (
          |  SELECT user_id, lag(event_type) OVER
          |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
          |    event_type AS curr
          |  FROM e),
          |c AS (SELECT prev, curr, CAST(count(*) AS BIGINT) AS n
          |      FROM t WHERE prev IS NOT NULL GROUP BY 1, 2),
          |rt AS (SELECT prev, CAST(sum(n) AS BIGINT) AS row_total FROM c
          |       GROUP BY 1)
          |SELECT c.prev, c.curr, c.n, rt.row_total,
          |       CAST(c.n AS DOUBLE) / CAST(rt.row_total AS DOUBLE) AS prob
          |FROM c JOIN rt USING (prev)
          |ORDER BY prev, curr""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val t = H.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("prev", lag("event_type", 1).over(w))
          .withColumnRenamed("event_type", "curr")
          .filter(col("prev").isNotNull)
        val c = t.groupBy("prev", "curr").agg(count(lit(1)).as("n"))
        val rt = c.groupBy("prev").agg(sum("n").cast("long").as("row_total"))
        c.join(rt, Seq("prev"))
          .select(col("prev"), col("curr"), col("n"), col("row_total"),
            (col("n").cast("double") / col("row_total").cast("double"))
              .as("prob"))
          .orderBy("prev", "curr")
      }),

    // FRESHNESS AUDIT: per event type — last-seen timestamp, number of
    // calendar days with data vs the span, and the largest day gap
    // between consecutive active days (the SLA signal a pipeline monitor
    // alerts on). One map-side-combined (type, day) reduce, then lag on
    // the |types|×|days| domain; day arithmetic is exact integer date
    // diffing and the emitted timestamp is a formatted string.
    Q("dq_freshness",
      Some(
        """WITH d AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day, max(ts) AS last_ts
          |  FROM events GROUP BY 1, 2),
          |g AS (
          |  SELECT event_type, day, last_ts,
          |    day - lag(day) OVER (PARTITION BY event_type ORDER BY day)
          |      AS gap
          |  FROM d)
          |SELECT event_type,
          |  strftime(max(last_ts), '%Y-%m-%d %H:%M:%S.%f') AS last_seen,
          |  CAST(count(*) AS BIGINT) AS active_days,
          |  CAST(max(day) - min(day) + 1 AS BIGINT) AS span_days,
          |  CAST(max(day) - min(day) + 1 AS BIGINT) - count(*) AS missing_days,
          |  CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_days
          |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val d = H.events(s, dir)
          .groupBy(col("event_type"), col("ts").cast("date").as("day"))
          .agg(max("ts").as("last_ts"))
        val g = d.withColumn("gap",
          datediff(col("day"),
            lag("day", 1).over(
              Window.partitionBy("event_type").orderBy("day"))))
        g.groupBy("event_type")
          .agg(H.fmtTs(max("last_ts")).as("last_seen"),
            count(lit(1)).as("active_days"),
            (datediff(max("day"), min("day")) + 1).cast("long")
              .as("span_days"),
            ((datediff(max("day"), min("day")) + 1).cast("long") -
              count(lit(1))).as("missing_days"),
            coalesce(max("gap"), lit(0)).cast("long").as("max_gap_days"))
          .orderBy("event_type")
      }),

    // EXACT WEIGHTED PERCENTILES: the l_quantity-weighted p25/p50/p75 of
    // l_extendedprice per return flag — "the price such that half the
    // QUANTITY sits below it", the inventory-weighted form of a median.
    // Computed exactly from the value distribution: one (flag, price)
    // partial-agg reduce, a cumulative weight window over the per-flag
    // price domain, then the smallest price whose cumulative weight
    // reaches p·total picks each percentile (weighted lower-median
    // definition — pure integer/DECIMAL compares, no interpolation, no
    // sampling). approx_percentile trades exactness for one pass; this is
    // the exact two-pass form that stays distribution-domain-bounded.
    Q("agg_weighted_percentile",
      Some(
        """WITH d AS (
          |  SELECT l_returnflag AS flag, CAST(l_extendedprice AS DECIMAL(12,2))
          |    AS price, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
          |  FROM lineitem GROUP BY 1, 2),
          |c AS (
          |  SELECT *, sum(wt) OVER (PARTITION BY flag ORDER BY price) AS cw,
          |         sum(wt) OVER (PARTITION BY flag) AS tw
          |  FROM d)
          |SELECT flag,
          |  CAST(min(CASE WHEN cw * 4 >= tw THEN price END) AS DOUBLE) AS p25,
          |  CAST(min(CASE WHEN cw * 2 >= tw THEN price END) AS DOUBLE) AS p50,
          |  CAST(min(CASE WHEN cw * 4 >= tw * 3 THEN price END) AS DOUBLE)
          |    AS p75,
          |  CAST(max(tw) AS BIGINT) AS total_weight
          |FROM c GROUP BY flag ORDER BY flag""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "lineitem")
          .groupBy(col("l_returnflag").as("flag"),
            H.dec2(col("l_extendedprice")).as("price"))
          .agg(sum(col("l_quantity").cast("long")).as("wt"))
        val c = d
          .withColumn("cw",
            sum("wt").over(Window.partitionBy("flag").orderBy("price")))
          .withColumn("tw",
            sum("wt").over(Window.partitionBy("flag")))
        c.groupBy("flag")
          .agg(
            min(when(col("cw") * 4 >= col("tw"), col("price")))
              .cast("double").as("p25"),
            min(when(col("cw") * 2 >= col("tw"), col("price")))
              .cast("double").as("p50"),
            min(when(col("cw") * 4 >= col("tw") * 3, col("price")))
              .cast("double").as("p75"),
            max("tw").cast("long").as("total_weight"))
          .orderBy("flag")
      }),

    // TOKEN BURSTINESS: collection frequency / document frequency per
    // token — cf/df ≈ 1 marks words spread evenly across the corpus,
    // high cf/df marks tokens that BURST inside few documents (template
    // boilerplate, spam runs); corpus-QA uses it to catch generator
    // artifacts plain frequency ranking hides. One explode feeds one
    // aggregation computing both counters (count(*) and approx-free
    // count(DISTINCT doc_id) via two-level exact aggregation), min
    // support 50, burstiness is one exact division. Top-25 by burstiness
    // plans a bounded TakeOrderedAndProject, never a full sort.
    Q("corpus_burstiness",
      Some(
        """WITH tok AS (
          |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          |  FROM documents),
          |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cf,
          |             CAST(count(DISTINCT doc_id) AS BIGINT) AS df
          |      FROM tok GROUP BY 1 HAVING count(*) >= 50)
          |SELECT tok, cf, df,
          |       CAST(cf AS DOUBLE) / CAST(df AS DOUBLE) AS burstiness
          |FROM c ORDER BY burstiness DESC, tok LIMIT 25""".stripMargin),
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("tok")
          .agg(count(lit(1)).as("cf"),
            countDistinct("doc_id").as("df"))
          .filter(col("cf") >= 50)
          .select(col("tok"), col("cf"), col("df"),
            (col("cf").cast("double") / col("df").cast("double"))
              .as("burstiness"))
          .orderBy(col("burstiness").desc, col("tok"))
          .limit(25))
  )
}
