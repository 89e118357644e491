package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, QueryModule}
import graft.H.tbl

/** Round-9 wave 145: the Cochran–Armitage trend test — dose-response in
  * proportions across ORDERED groups, the categorical sibling of the
  * board's Jonckheere (continuous) and chi-square (unordered) tests.
  */
object TrendTestOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // COCHRAN–ARMITAGE: return-rate trend across the five ordered order
    // priorities (scores 1..5 from the priority prefix). Counts are one
    // map-side-combined reduce; the statistic Z² = S²/(p̄(1−p̄)·V) with
    // S = Σtx − p̄Σtn and V = Σnt² − (Σtn)²/N derives from the five
    // exact integer count rows in identical double trees (the
    // stats_cuped discipline — no cross-row double reduction anywhere).
    // Output: the per-priority census plus the shared statistic columns.
    Q("stats_cochran_armitage",
      Some(
        """WITH g AS (
          |  SELECT o_orderpriority AS priority,
          |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS t,
          |    CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
          |      AS BIGINT) AS x
          |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          |  GROUP BY 1, 2),
          |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
          |    CAST(sum(x) AS BIGINT) AS xx,
          |    CAST(sum(t * x) AS BIGINT) AS stx,
          |    CAST(sum(t * n) AS BIGINT) AS stn,
          |    CAST(sum(t * t * n) AS BIGINT) AS stt
          |  FROM g),
          |z AS (SELECT nn, xx, stx, stn, stt,
          |    CAST(stx AS DOUBLE) - CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE)
          |      * CAST(stn AS DOUBLE) AS s,
          |    (CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE))
          |      * (1.0 - CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE)) AS pq,
          |    CAST(stt AS DOUBLE) - CAST(stn AS DOUBLE)
          |      * CAST(stn AS DOUBLE) / CAST(nn AS DOUBLE) AS v
          |  FROM tot)
          |SELECT g.priority, g.t AS score, g.n, g.x,
          |  CAST(g.x * 1000000 // g.n AS BIGINT) AS rate_ppm,
          |  CAST(floor(z.s * z.s / (z.pq * z.v) * 1000.0) AS BIGINT)
          |    AS z2_milli,
          |  CAST(CASE WHEN z.s > 0 THEN 1 WHEN z.s < 0 THEN -1 ELSE 0 END
          |    AS BIGINT) AS trend_sign
          |FROM g CROSS JOIN z ORDER BY g.t
          |""".stripMargin),
      (s, dir) => {
        val g = tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority").as("priority"),
            expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("t"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
              .cast("long").as("x"))
          .localCheckpoint() // the moment pass + output both read it
        val z = g.agg(sum("n").cast("long").as("nn"),
            sum("x").cast("long").as("xx"),
            sum(expr("t * x")).cast("long").as("stx"),
            sum(expr("t * n")).cast("long").as("stn"),
            sum(expr("t * t * n")).cast("long").as("stt"))
          .select(
            expr("CAST(stx AS DOUBLE) - CAST(xx AS DOUBLE)" +
              " / CAST(nn AS DOUBLE) * CAST(stn AS DOUBLE)").as("s"),
            expr("(CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE))" +
              " * (1.0 - CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE))").as("pq"),
            expr("CAST(stt AS DOUBLE) - CAST(stn AS DOUBLE)" +
              " * CAST(stn AS DOUBLE) / CAST(nn AS DOUBLE)").as("v"))
        val out = g.crossJoin(broadcast(z))
          .select(col("priority"), col("t").as("score"), col("n"), col("x"),
            expr("CAST(x * 1000000 div n AS BIGINT)").as("rate_ppm"),
            expr("CAST(floor(s * s / (pq * v) * 1000.0) AS BIGINT)")
              .as("z2_milli"),
            expr("CAST(CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1" +
              " ELSE 0 END AS BIGINT)").as("trend_sign"))
          .orderBy("score")
        graft.H.materialized(out, Nil, Seq(g))
      })
  )
}
