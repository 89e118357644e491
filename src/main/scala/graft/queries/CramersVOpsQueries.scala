package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-10 wave 157: bias-corrected Cramér's V (Bergsma 2013) — the
  * EFFECT SIZE the board's chi-square independence test lacks: χ² says
  * whether segment and priority are associated, V says how strongly on a
  * 0-1 scale comparable across table sizes, and the bias correction keeps
  * small-sample V from reading noise as signal.
  */
object CramersVOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // CRAMÉR'S V over the (market segment × order priority) contingency
    // table: one fact-sized count reduce onto the bounded 5×5 domain;
    // per-cell χ² contributions micro-quantized before the only cross-row
    // integer sum (the stats_chi2_independence discipline); V and the
    // Bergsma bias-corrected V derive from (chi2_micro, n, r, c) in
    // identical double trees. Output: one row.
    Q("stats_cramers_v",
      Some(
        """WITH o AS (SELECT c.c_mktsegment AS seg,
          |    o.o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS obs
          |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          |  GROUP BY 1, 2),
          |r AS (SELECT seg, CAST(sum(obs) AS BIGINT) AS rt FROM o GROUP BY 1),
          |c AS (SELECT pri, CAST(sum(obs) AS BIGINT) AS ct FROM o GROUP BY 1),
          |n AS (SELECT CAST(sum(obs) AS BIGINT) AS nt,
          |    CAST((SELECT count(*) FROM r) AS BIGINT) AS nr,
          |    CAST((SELECT count(*) FROM c) AS BIGINT) AS nc FROM o),
          |sp AS (SELECT r.seg, c.pri, r.rt, c.ct FROM r CROSS JOIN c),
          |t2 AS (SELECT sp.seg, sp.pri, sp.rt, sp.ct,
          |    coalesce(o.obs, 0) AS obs
          |  FROM sp LEFT JOIN o ON o.seg = sp.seg AND o.pri = sp.pri),
          |x AS (SELECT CAST(sum(CAST(floor(
          |    CAST(CAST(t2.obs AS HUGEINT) * n.nt
          |        - CAST(t2.rt AS HUGEINT) * t2.ct AS DOUBLE)
          |      * CAST(CAST(t2.obs AS HUGEINT) * n.nt
          |        - CAST(t2.rt AS HUGEINT) * t2.ct AS DOUBLE) * 1000000.0
          |      / (CAST(t2.rt AS DOUBLE) * CAST(t2.ct AS DOUBLE)
          |         * CAST(n.nt AS DOUBLE)) + 0.5) AS BIGINT)) AS BIGINT)
          |    AS chi2_micro
          |  FROM t2 CROSS JOIN n)
          |SELECT n.nr AS n_rows, n.nc AS n_cols, n.nt AS n,
          |  x.chi2_micro // 1000 AS chi2_milli,
          |  CAST(floor(sqrt(CAST(x.chi2_micro AS DOUBLE) / 1000000.0
          |    / CAST(n.nt AS DOUBLE)
          |    / CAST(least(n.nr - 1, n.nc - 1) AS DOUBLE)) * 1000.0)
          |    AS BIGINT) AS v_milli,
          |  CAST(floor(sqrt(
          |    greatest(CAST(x.chi2_micro AS DOUBLE) / 1000000.0
          |        / CAST(n.nt AS DOUBLE)
          |      - CAST((n.nr - 1) * (n.nc - 1) AS DOUBLE)
          |        / CAST(n.nt - 1 AS DOUBLE), 0.0)
          |    / (least(
          |        CAST(n.nr AS DOUBLE) - CAST((n.nr - 1) * (n.nr - 1)
          |          AS DOUBLE) / CAST(n.nt - 1 AS DOUBLE),
          |        CAST(n.nc AS DOUBLE) - CAST((n.nc - 1) * (n.nc - 1)
          |          AS DOUBLE) / CAST(n.nt - 1 AS DOUBLE)) - 1.0))
          |    * 1000.0) AS BIGINT) AS v_corrected_milli
          |FROM x CROSS JOIN n
          |""".stripMargin),
      (s, dir) => {
        val o = tbl(s, dir, "orders")
          .join(broadcast(tbl(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
            col("c_custkey") === col("o_custkey"))
          .groupBy(col("seg"), col("o_orderpriority").as("pri"))
          .agg(count(lit(1)).cast("long").as("obs"))
          .localCheckpoint() // totals + the cell grid read it
        val r = o.groupBy("seg").agg(sum("obs").cast("long").as("rt"))
        val c = o.groupBy("pri").agg(sum("obs").cast("long").as("ct"))
        val n = o.agg(sum("obs").cast("long").as("nt"))
          .crossJoin(broadcast(r.agg(count(lit(1)).cast("long").as("nr"))))
          .crossJoin(broadcast(c.agg(count(lit(1)).cast("long").as("nc"))))
        val x = r.crossJoin(broadcast(c))
          .join(o, Seq("seg", "pri"), "left")
          .withColumn("obs", coalesce(col("obs"), lit(0L)))
          .crossJoin(broadcast(n))
          // widen obs*nt / rt*ct to DECIMAL(38,0) (oracle: HUGEINT) BEFORE
          // the product: at nt beyond ~3e9 rows the plain BIGINT product
          // overflows — DuckDB errors, non-ANSI Spark wraps silently (the
          // events_logrank_test widening discipline; r10 advice).
          .agg(sum(expr(
            """CAST(floor(
              |  CAST(CAST(obs AS DECIMAL(38,0)) * nt
              |      - CAST(rt AS DECIMAL(38,0)) * ct AS DOUBLE)
              |    * CAST(CAST(obs AS DECIMAL(38,0)) * nt
              |      - CAST(rt AS DECIMAL(38,0)) * ct AS DOUBLE) * 1000000.0
              |    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
              |       * CAST(nt AS DOUBLE)) + 0.5) AS BIGINT)""".stripMargin))
            .cast("long").as("chi2_micro"))
        val out = x.crossJoin(broadcast(n))
          .select(col("nr").as("n_rows"), col("nc").as("n_cols"),
            col("nt").as("n"),
            expr("chi2_micro div 1000").as("chi2_milli"),
            expr("""CAST(floor(sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0
              |  / CAST(nt AS DOUBLE)
              |  / CAST(least(nr - 1, nc - 1) AS DOUBLE)) * 1000.0)
              |  AS BIGINT)""".stripMargin).as("v_milli"),
            expr("""CAST(floor(sqrt(
              |  greatest(CAST(chi2_micro AS DOUBLE) / 1000000.0
              |      / CAST(nt AS DOUBLE)
              |    - CAST((nr - 1) * (nc - 1) AS DOUBLE)
              |      / CAST(nt - 1 AS DOUBLE), 0.0)
              |  / (least(
              |      CAST(nr AS DOUBLE) - CAST((nr - 1) * (nr - 1)
              |        AS DOUBLE) / CAST(nt - 1 AS DOUBLE),
              |      CAST(nc AS DOUBLE) - CAST((nc - 1) * (nc - 1)
              |        AS DOUBLE) / CAST(nt - 1 AS DOUBLE)) - 1.0))
              |  * 1000.0) AS BIGINT)""".stripMargin)
              .as("v_corrected_milli"))
        H.materialized(out, caches = Nil, checkpoints = Seq(o))
      })
  )
}
