package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Hundred-twelfth wave: XML scalar surface, information density, and
  * audience stability — Spark's xpath functions over per-row XML
  * payloads (the oracle parses the same markup with portable string
  * ops, so the XPath semantics are pinned, not assumed), bits-per-
  * character under the corpus's own unigram char model (the
  * compression floor that prices storage), and the DAU drawdown
  * profile (worst peak-to-trough audience loss, in milli).
  *
  * Exactness: the XML payload is constructed deterministically from
  * row data; BPC terms floor to micro per character value before the
  * cross-character sum; drawdown is a running-max window over the
  * bounded day frame in pure integers.
  */
object XpathBpcOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // xpath over constructed order XML: each order renders as
    // <o><k>…</k><p>…</p><s>…</s></o>, Spark extracts fields back via
    // xpath_long / xpath_string and aggregates per status — the oracle
    // never parses XML at all, it aggregates the source columns, so a
    // broken extraction breaks counts and sums alike. The XML scalar
    // surface (xpath_*) a legacy-feed migration needs.
    Q("scalar_xpath",
      Some(
        """SELECT o_orderstatus AS status,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents,
          |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
          |FROM orders WHERE o_orderkey < 5000 GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val xml = tbl(s, dir, "orders")
          .filter(col("o_orderkey") < 5000)
          .select(concat(lit("<o><k>"), col("o_orderkey"),
            lit("</k><p>"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"),
            lit("</p><s>"), col("o_orderstatus"), lit("</s></o>"))
            .as("x"))
        xml.select(
            expr("xpath_string(x, '/o/s')").as("status"),
            expr("xpath_long(x, '/o/p')").as("cents1"),
            expr("xpath_long(x, '/o/k')").as("k1"))
          .groupBy("status")
          .agg(count(lit(1)).cast("long").as("n"),
            sum(col("cents1")).cast("long").as("cents"),
            sum(col("k1")).cast("long").as("key_sum"))
          .orderBy("status")
      }),

    // Bits per character under the corpus's own unigram char model:
    // H = −Σ p_c log2 p_c with each character's term micro-floored
    // pre-sum — the entropy floor any compressor must respect, and the
    // first-order estimate of what the corpus costs to store. One
    // char explode (linear), a 256-ish histogram, one bounded sum.
    Q("text_unigram_bpc",
      Some(
        """WITH ch AS (SELECT unnest(string_split(text, '')) AS c
          |  FROM documents),
          |h AS (SELECT c, CAST(count(*) AS BIGINT) AS n FROM ch
          |  WHERE c <> '' GROUP BY 1),
          |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
          |  CAST(count(*) AS BIGINT) AS k FROM h),
          |e AS (SELECT CAST(sum(CAST(floor(
          |    -(CAST(h.n AS DOUBLE)/CAST(t.nn AS DOUBLE))
          |    * ln(CAST(h.n AS DOUBLE)/CAST(t.nn AS DOUBLE))
          |    / ln(2.0) * 1000000.0) AS BIGINT)) AS BIGINT) AS bpc_micro
          |  FROM h, t)
          |SELECT t.nn AS n_chars, t.k AS alphabet,
          |  e.bpc_micro,
          |  CAST(e.bpc_micro * 100 // 8000000 AS BIGINT)
          |    AS floor_vs_ascii_pct
          |FROM t, e
          |""".stripMargin),
      (s, dir) => {
        val h = tbl(s, dir, "documents")
          .select(explode(split(col("text"), "")).as("c"))
          .filter(col("c") =!= "")
          .groupBy("c").agg(count(lit(1)).cast("long").as("n"))
          .localCheckpoint()
        val t = h.agg(sum(col("n")).cast("long").as("nn"),
          count(lit(1)).cast("long").as("k"))
        val e = h.crossJoin(broadcast(t))
          .select(floor((lit(0.0d) - col("n").cast("double") /
            col("nn").cast("double")) *
            log(col("n").cast("double") / col("nn").cast("double")) /
            log(lit(2.0d)) * 1000000.0d).cast("long").as("term"))
          .agg(sum(col("term")).cast("long").as("bpc_micro"))
        val out = t.crossJoin(broadcast(e))
          .select(col("nn").as("n_chars"), col("k").as("alphabet"),
            col("bpc_micro"),
            expr("bpc_micro * 100 div 8000000").cast("long")
              .as("floor_vs_ascii_pct"))
        H.materialized(out, Nil, Seq(h))
      }),

    // DAU drawdown: daily active users, running peak, and the worst
    // peak-to-trough loss in milli — the audience-stability read a
    // growth dashboard pairs with the retention curve. Pure integers
    // on the bounded day frame; the window is a running max.
    Q("events_dau_drawdown",
      Some(
        """WITH d AS (SELECT CAST(ts AS DATE) AS day,
          |  CAST(count(DISTINCT user_id) AS BIGINT) AS dau
          |  FROM events GROUP BY 1),
          |r AS (SELECT day, dau,
          |  CAST(max(dau) OVER (ORDER BY day
          |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak FROM d),
          |dd AS (SELECT day, dau, peak,
          |  (peak - dau) * 1000 // peak AS dd_milli FROM r),
          |mx AS (SELECT max(dd_milli) AS worst FROM dd)
          |SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
          |  (SELECT CAST(max(dau) AS BIGINT) FROM d) AS peak_dau,
          |  CAST(mx.worst AS BIGINT) AS max_drawdown_milli,
          |  (SELECT strftime(min(day), '%Y-%m-%d') FROM dd, mx
          |    WHERE dd.dd_milli = mx.worst) AS worst_day
          |FROM mx
          |""".stripMargin),
      (s, dir) => {
        val d = H.events(s, dir)
          .groupBy(col("ts").cast("date").as("day"))
          .agg(countDistinct(col("user_id")).cast("long").as("dau"))
          .localCheckpoint()
        val r = d.withColumn("peak",
          max(col("dau")).over(Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
        val dd = r.withColumn("dd_milli",
          expr("(peak - dau) * 1000 div peak"))
          .localCheckpoint()
        val mx = dd.agg(max(col("dd_milli")).as("worst"))
        val worstDay = dd.crossJoin(broadcast(mx))
          .filter(col("dd_milli") === col("worst"))
          .agg(date_format(min(col("day")), "yyyy-MM-dd")
            .as("worst_day"))
        val out = d.agg(count(lit(1)).cast("long").as("n_days"),
            max(col("dau")).cast("long").as("peak_dau"))
          .crossJoin(broadcast(mx.select(col("worst").cast("long")
            .as("max_drawdown_milli"))))
          .crossJoin(broadcast(worstDay))
          .select(col("n_days"), col("peak_dau"),
            col("max_drawdown_milli"), col("worst_day"))
        H.materialized(out, Nil, Seq(d, dd))
      })
  )
}
