package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Ninety-second wave: two-dimensional layout evidence and comparison
  * statistics — a z-order advisor that MEASURES 2-D prune rates under
  * three physical layouts (ingest, single-key sort, Morton), effect
  * sizes for a segment A/B (Cohen's d, Hedges' g, exact Cliff's
  * delta), an exact weekly-seasonality strength (the ANOVA
  * decomposition carried entirely in integers at milli precision), and
  * correlated EXISTS / NOT EXISTS subqueries (planned as semi + anti
  * joins).
  *
  * Exactness: prune counts weight surviving chunks by row count —
  * pure integers. Cliff's delta comes from win/loss counts on the
  * value histogram with the sign-split division idiom (Spark `div`
  * truncates toward zero, DuckDB `//` floors — they agree only on
  * non-negatives). Seasonal strength never touches a float: SS terms
  * ride as exact milli integers with per-group denominators divided
  * out before the cross-group sum.
  */
object EffectLayoutOpsQueries extends QueryModule {

  /** Morton interleave of the low `bits` bits of px/py (x even lanes);
    * valid SQL in both engines. */
  private def mortonSql(px: String, py: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($px >> $i) & 1) << ${2 * i})",
        s"((($py >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  def all: Seq[Q] = Seq(

    // Z-order advisor: for a 2-D probe workload (4×4 grid of partkey ×
    // suppkey ranges), measure the fraction of ROWS a zone-map scan
    // must touch under three layouts — ingest chunks (orderkey), a
    // partkey-sorted layout, and Morton(partkey, suppkey) buckets.
    // Chunking is VALUE-bucketed (key div const, morton div 2^10), so
    // no global sort is simulated — the same one-pass keyed
    // aggregation per layout, all three in one scan via stack. The
    // measured answer to "is a z-order rewrite worth it for 2-D
    // point-range traffic?" — the defining 100 TB layout question.
    Q("layout_zorder_advisor",
      Some {
        val m = mortonSql("(l_partkey & 1023)", "(l_suppkey & 1023)", 10)
        """WITH b AS (SELECT l_orderkey // 400 AS ck_ingest,
          |  l_partkey // 64 AS ck_sorted, (MORTON) // 1024 AS ck_z,
          |  l_partkey AS x, l_suppkey AS y FROM lineitem),
          |lng AS (SELECT 'a_ingest' AS layout, ck_ingest AS chunk, x, y
          |    FROM b
          |  UNION ALL SELECT 'b_partkey_sorted', ck_sorted, x, y FROM b
          |  UNION ALL SELECT 'c_zorder', ck_z, x, y FROM b),
          |ch AS (SELECT layout, chunk, CAST(count(*) AS BIGINT) AS rows_n,
          |  CAST(min(x) AS BIGINT) AS mnx, CAST(max(x) AS BIGINT) AS mxx,
          |  CAST(min(y) AS BIGINT) AS mny, CAST(max(y) AS BIGINT) AS mxy
          |  FROM lng GROUP BY 1, 2),
          |g AS (SELECT CAST(min(x) AS BIGINT) AS gx0,
          |  CAST(max(x) AS BIGINT) AS gx1, CAST(min(y) AS BIGINT) AS gy0,
          |  CAST(max(y) AS BIGINT) AS gy1 FROM b),
          |pr AS (SELECT
          |  g.gx0 + i.i * (g.gx1 - g.gx0 + 1) // 4 AS px0,
          |  g.gx0 + (i.i + 1) * (g.gx1 - g.gx0 + 1) // 4 - 1 AS px1,
          |  g.gy0 + j.j * (g.gy1 - g.gy0 + 1) // 4 AS py0,
          |  g.gy0 + (j.j + 1) * (g.gy1 - g.gy0 + 1) // 4 - 1 AS py1
          |  FROM g, (SELECT range AS i FROM range(0, 4)) i,
          |    (SELECT range AS j FROM range(0, 4)) j),
          |tot AS (SELECT layout, CAST(count(*) AS BIGINT) AS n_chunks,
          |  CAST(sum(rows_n) AS BIGINT) AS total_rows FROM ch GROUP BY 1),
          |sc AS (SELECT ch.layout,
          |  CAST(sum(ch.rows_n) AS BIGINT) AS scanned_rows
          |  FROM ch JOIN pr ON NOT (ch.mxx < pr.px0 OR ch.mnx > pr.px1
          |    OR ch.mxy < pr.py0 OR ch.mny > pr.py1)
          |  GROUP BY 1)
          |SELECT t.layout, t.n_chunks, sc.scanned_rows,
          |  CAST(10000 - sc.scanned_rows * 10000 // (16 * t.total_rows)
          |    AS BIGINT) AS prune_bps
          |FROM tot t JOIN sc ON sc.layout = t.layout ORDER BY 1
          |""".stripMargin.replace("(MORTON)", s"($m)")
      },
      (s, dir) => {
        val m = mortonSql("(l_partkey & 1023)", "(l_suppkey & 1023)", 10)
        val b = tbl(s, dir, "lineitem")
          .select(expr("l_orderkey div 400").as("ck_ingest"),
            expr("l_partkey div 64").as("ck_sorted"),
            expr(s"($m) div 1024").as("ck_z"),
            col("l_partkey").as("x"), col("l_suppkey").as("y"))
        val lng = b.select(lit("a_ingest").as("layout"),
            col("ck_ingest").as("chunk"), col("x"), col("y"))
          .unionByName(b.select(lit("b_partkey_sorted").as("layout"),
            col("ck_sorted").as("chunk"), col("x"), col("y")))
          .unionByName(b.select(lit("c_zorder").as("layout"),
            col("ck_z").as("chunk"), col("x"), col("y")))
        val ch = lng.groupBy("layout", "chunk")
          .agg(count(lit(1)).cast("long").as("rows_n"),
            min(col("x")).cast("long").as("mnx"),
            max(col("x")).cast("long").as("mxx"),
            min(col("y")).cast("long").as("mny"),
            max(col("y")).cast("long").as("mxy"))
        val g = b.agg(min(col("x")).cast("long").as("gx0"),
          max(col("x")).cast("long").as("gx1"),
          min(col("y")).cast("long").as("gy0"),
          max(col("y")).cast("long").as("gy1"))
        val pr = g
          .select(col("gx0"), col("gx1"), col("gy0"), col("gy1"),
            explode(sequence(lit(0), lit(3))).as("i"))
          .select(col("gx0"), col("gx1"), col("gy0"), col("gy1"),
            col("i"), explode(sequence(lit(0), lit(3))).as("j"))
          .select(expr("gx0 + i * (gx1 - gx0 + 1) div 4").as("px0"),
            expr("gx0 + (i + 1) * (gx1 - gx0 + 1) div 4 - 1").as("px1"),
            expr("gy0 + j * (gy1 - gy0 + 1) div 4").as("py0"),
            expr("gy0 + (j + 1) * (gy1 - gy0 + 1) div 4 - 1").as("py1"))
        val tot = ch.groupBy("layout")
          .agg(count(lit(1)).cast("long").as("n_chunks"),
            sum(col("rows_n")).cast("long").as("total_rows"))
        val sc = ch.join(broadcast(pr),
            !(col("mxx") < col("px0") || col("mnx") > col("px1") ||
              col("mxy") < col("py0") || col("mny") > col("py1")))
          .groupBy("layout")
          .agg(sum(col("rows_n")).cast("long").as("scanned_rows"))
        tot.join(sc, Seq("layout"))
          .select(col("layout"), col("n_chunks"), col("scanned_rows"),
            expr("10000 - scanned_rows * 10000 div (16 * total_rows)")
              .cast("long").as("prune_bps"))
          .orderBy("layout")
      }),

    // Effect sizes for BUILDING vs MACHINERY order values: Cohen's d
    // and Hedges' g from exact integer moments (one micro-floored
    // chain each), plus Cliff's delta computed EXACTLY from win/loss
    // counts on the shared value histogram — the δ = (W−L)/(n₁n₀)
    // rank statistic, in milli via the sign-split integer division.
    // Effect size, not p-value, is what a 1e9-row A/B actually needs:
    // at that n everything is "significant".
    Q("stats_effect_sizes",
      Some(
        """WITH b AS (SELECT c.c_mktsegment AS g,
          |  CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT) AS v
          |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
          |h AS (SELECT v,
          |  CAST(sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n1,
          |  CAST(sum(CASE WHEN g = 'MACHINERY' THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n0
          |  FROM b GROUP BY 1),
          |c AS (SELECT v, n1, n0,
          |  CAST(coalesce(sum(n0) OVER w, 0) AS BIGINT) AS c0,
          |  CAST(coalesce(sum(n1) OVER w, 0) AS BIGINT) AS c1
          |  FROM h WINDOW w AS (ORDER BY v
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
          |u AS (SELECT sum(CAST(n1 AS HUGEINT) * c0) AS w_win,
          |  sum(CAST(n0 AS HUGEINT) * c1) AS w_loss FROM c),
          |m AS (SELECT CAST(sum(n1) AS BIGINT) AS na,
          |  CAST(sum(n0) AS BIGINT) AS nb,
          |  CAST(sum(n1 * v) AS BIGINT) AS sa,
          |  CAST(sum(n0 * v) AS BIGINT) AS sb,
          |  sum(CAST(n1 AS HUGEINT) * v * v) AS qa,
          |  sum(CAST(n0 AS HUGEINT) * v * v) AS qb FROM h),
          |e AS (SELECT m.na, m.nb,
          |  (CAST(m.sa AS DOUBLE)/CAST(m.na AS DOUBLE)
          |    - CAST(m.sb AS DOUBLE)/CAST(m.nb AS DOUBLE))
          |  / sqrt(((CAST(m.qa AS DOUBLE) - CAST(m.sa AS DOUBLE)
          |      *CAST(m.sa AS DOUBLE)/CAST(m.na AS DOUBLE))
          |    + (CAST(m.qb AS DOUBLE) - CAST(m.sb AS DOUBLE)
          |      *CAST(m.sb AS DOUBLE)/CAST(m.nb AS DOUBLE)))
          |    / (CAST(m.na AS DOUBLE) + CAST(m.nb AS DOUBLE) - 2.0))
          |    AS d, u.w_win, u.w_loss
          |  FROM m, u)
          |SELECT na AS n_building, nb AS n_machinery,
          |  CAST(floor(d * 1000000.0) AS BIGINT) AS cohens_d_micro,
          |  CAST(floor(d * (1.0 - 3.0/(4.0*(CAST(na AS DOUBLE)
          |    + CAST(nb AS DOUBLE)) - 9.0)) * 1000000.0) AS BIGINT)
          |    AS hedges_g_micro,
          |  CAST(CASE WHEN w_win >= w_loss
          |    THEN (w_win - w_loss) * 1000
          |      // (CAST(na AS HUGEINT) * nb)
          |    ELSE -((w_loss - w_win) * 1000
          |      // (CAST(na AS HUGEINT) * nb)) END AS BIGINT)
          |    AS cliffs_delta_milli
          |FROM e
          |""".stripMargin),
      (s, dir) => {
        val b = tbl(s, dir, "orders")
          .select(col("o_custkey"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
              .as("v"))
          .join(broadcast(tbl(s, dir, "customer")
              .select(col("c_custkey"), col("c_mktsegment").as("g"))
              .filter(col("g").isin("BUILDING", "MACHINERY"))),
            col("o_custkey") === col("c_custkey"))
        val h = b.groupBy("v")
          .agg(sum(when(col("g") === "BUILDING", 1L).otherwise(0L))
              .cast("long").as("n1"),
            sum(when(col("g") === "MACHINERY", 1L).otherwise(0L))
              .cast("long").as("n0"))
        val w = Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)
        val c = h
          .withColumn("c0", coalesce(sum(col("n0")).over(w), lit(0L))
            .cast("long"))
          .withColumn("c1", coalesce(sum(col("n1")).over(w), lit(0L))
            .cast("long"))
        val u = c.agg(
          sum(col("n1").cast("decimal(38,0)") * col("c0"))
            .cast("decimal(38,0)").as("w_win"),
          sum(col("n0").cast("decimal(38,0)") * col("c1"))
            .cast("decimal(38,0)").as("w_loss"))
        val m = h.agg(sum(col("n1")).cast("long").as("na"),
          sum(col("n0")).cast("long").as("nb"),
          sum(col("n1") * col("v")).cast("long").as("sa"),
          sum(col("n0") * col("v")).cast("long").as("sb"),
          sum(col("n1").cast("decimal(38,0)") * col("v") * col("v"))
            .cast("decimal(38,0)").as("qa"),
          sum(col("n0").cast("decimal(38,0)") * col("v") * col("v"))
            .cast("decimal(38,0)").as("qb"))
        val e = m.crossJoin(broadcast(u))
          .withColumn("d",
            (col("sa").cast("double") / col("na").cast("double") -
              col("sb").cast("double") / col("nb").cast("double")) /
              sqrt(((col("qa").cast("double") -
                col("sa").cast("double") * col("sa").cast("double") /
                  col("na").cast("double")) +
                (col("qb").cast("double") -
                  col("sb").cast("double") * col("sb").cast("double") /
                    col("nb").cast("double"))) /
                (col("na").cast("double") + col("nb").cast("double")
                  - 2.0d)))
        e.select(col("na").as("n_building"), col("nb").as("n_machinery"),
          floor(col("d") * 1000000.0d).cast("long").as("cohens_d_micro"),
          floor(col("d") * (lit(1.0d) - lit(3.0d) /
            (lit(4.0d) * (col("na").cast("double") +
              col("nb").cast("double")) - lit(9.0d))) * 1000000.0d)
            .cast("long").as("hedges_g_micro"),
          expr("CAST(CASE WHEN w_win >= w_loss THEN (w_win - w_loss)" +
            " * 1000 div (CAST(na AS DECIMAL(38,0)) * nb)" +
            " ELSE -((w_loss - w_win) * 1000" +
            " div (CAST(na AS DECIMAL(38,0)) * nb)) END AS BIGINT)")
            .as("cliffs_delta_milli"))
      }),

    // Weekly seasonality strength of daily revenue — the one-way ANOVA
    // decomposition over day-of-week carried ENTIRELY in exact
    // integers: daily cents truncate to 100k-cent units (part of the
    // spec, deterministic), SS terms ride at ×1000 with each group's
    // denominator divided out BEFORE the cross-group sum, and
    // strength = (SSt − SSw)/SSt lands as an exact micro ratio. The
    // "is there a weekly cycle worth modeling" gate for forecasting.
    Q("ts_seasonal_strength",
      Some(
        """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
          |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) // 100000 AS kd
          |  FROM orders GROUP BY 1),
          |g AS (SELECT dayofweek(day) AS dow,
          |  CAST(count(*) AS BIGINT) AS n, CAST(sum(kd) AS BIGINT) AS s,
          |  CAST(sum(kd*kd) AS BIGINT) AS q FROM d GROUP BY 1),
          |w AS (SELECT CAST(sum(q*1000 - CAST(s AS HUGEINT)*s*1000 // n)
          |    AS BIGINT) AS ssw_milli,
          |  CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS st,
          |  CAST(sum(q) AS BIGINT) AS qt FROM g)
          |SELECT nn AS n_days,
          |  CAST(qt*1000 - CAST(st AS HUGEINT)*st*1000 // nn AS BIGINT)
          |    AS sst_milli,
          |  ssw_milli,
          |  CAST(((qt*1000 - CAST(st AS HUGEINT)*st*1000 // nn)
          |    - ssw_milli) * 1000000
          |    // (qt*1000 - CAST(st AS HUGEINT)*st*1000 // nn) AS BIGINT)
          |    AS strength_micro
          |FROM w
          |""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(expr("CAST(sum(CAST(floor(o_totalprice*100 + 0.5)" +
            " AS BIGINT)) AS BIGINT) div 100000").as("kd"))
        val g = d.groupBy(dayofweek(col("day")).as("dow"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(col("kd")).cast("long").as("s"),
            sum(col("kd") * col("kd")).cast("long").as("q"))
        g.agg(sum(expr(
              "q*1000 - CAST(s AS DECIMAL(38,0))*s*1000 div n"))
              .cast("long").as("ssw_milli"),
            sum(col("n")).cast("long").as("nn"),
            sum(col("s")).cast("long").as("st"),
            sum(col("q")).cast("long").as("qt"))
          .select(col("nn").as("n_days"),
            expr("qt*1000 - CAST(st AS DECIMAL(38,0))*st*1000 div nn")
              .cast("long").as("sst_milli"),
            col("ssw_milli"),
            expr("((qt*1000 - CAST(st AS DECIMAL(38,0))*st*1000 div nn)" +
              " - ssw_milli) * 1000000" +
              " div (qt*1000 - CAST(st AS DECIMAL(38,0))*st*1000 div nn)")
              .cast("long").as("strength_micro"))
      }),

    // Correlated EXISTS / NOT EXISTS subqueries — the declarative form
    // of "customers who placed an urgent 1997 order but never had an
    // order fail to finish", counted per segment. Catalyst decorrelates
    // both predicates into LEFT SEMI and LEFT ANTI hash joins (no
    // per-row re-execution), which is exactly why the correlated form
    // is safe at 100 TB. The oracle runs the identical portable SQL.
    Q("subquery_exists_correlated",
      Some(
        """SELECT c.c_mktsegment AS segment,
          |  CAST(count(*) AS BIGINT) AS n_customers
          |FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |    WHERE o.o_custkey = c.c_custkey
          |      AND o.o_orderpriority = '1-URGENT'
          |      AND year(o.o_orderdate) = 1997)
          |  AND NOT EXISTS (SELECT 1 FROM orders o2
          |    WHERE o2.o_custkey = c.c_custkey
          |      AND o2.o_orderstatus = 'F'
          |      AND year(o2.o_orderdate) >= 1999)
          |GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        tbl(s, dir, "customer").createOrReplaceTempView("customer_sq")
        tbl(s, dir, "orders").createOrReplaceTempView("orders_sq")
        s.sql(
          """SELECT c.c_mktsegment AS segment,
            |  CAST(count(*) AS BIGINT) AS n_customers
            |FROM customer_sq c
            |WHERE EXISTS (SELECT 1 FROM orders_sq o
            |    WHERE o.o_custkey = c.c_custkey
            |      AND o.o_orderpriority = '1-URGENT'
            |      AND year(o.o_orderdate) = 1997)
            |  AND NOT EXISTS (SELECT 1 FROM orders_sq o2
            |    WHERE o2.o_custkey = c.c_custkey
            |      AND o2.o_orderstatus = 'F'
            |      AND year(o2.o_orderdate) >= 1999)
            |GROUP BY 1 ORDER BY 1
            |""".stripMargin)
      })
  )
}
