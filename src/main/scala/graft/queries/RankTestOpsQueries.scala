package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Eighty-fifth wave: the rank/robust omnibus battery — Kruskal-Wallis
  * (k-sample rank ANOVA with tie correction), a Theil-Sen median slope for
  * the daily-revenue trend, Brown-Forsythe (median-centered Levene) equality
  * of spread, and Mood's median test on a grand-median split. Completes the
  * hypothesis-testing family (chi²/MWU/KS/Friedman/Cochran are earlier
  * waves) with the k-sample omnibus tests an experimentation platform runs
  * before pairwise drill-down.
  *
  * Exactness contract (same as wave 48): every fact scan reduces to a
  * value-count histogram first (map-side combinable; the cents domain is
  * value-bounded, so the histogram stops growing once the price domain is
  * covered, regardless of corpus size). Tie ranks ride at 2× so average
  * ranks stay integer; medians come from the two middle order statistics
  * (also 2×); sums that could exceed BIGINT go through DECIMAL(38,0) /
  * HUGEINT; each test's one float appearance is a fixed IEEE chain written
  * identically in both engines and floored to micro BEFORE any cross-cell
  * sum, so outputs are BIGINT end-to-end.
  */
object RankTestOpsQueries extends QueryModule {

  private val Priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  def all: Seq[Q] = Seq(

    // Kruskal-Wallis across the five order priorities, values = total
    // price in cents. Average tie ranks at 2× (2·rank at value v =
    // 2·|below| + tie size + 1); S = Σ R_g²/n_g enters H through a
    // per-group micro-floored double term (r2x ≈ n·N stays exactly
    // representable as a double well past a 100× scale-up), and the tie
    // correction 1 − Σ(t³−t)/(N³−N) accumulates per-VALUE micro floors —
    // both engines run the identical chain, so H is reproducible to the
    // last micro.
    Q("stats_kruskal_wallis",
      Some(
        """WITH b AS (SELECT o_orderpriority AS g,
          |  CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS v FROM orders),
          |h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS n
          |  FROM b GROUP BY 1, 2),
          |sp AS (SELECT v, CAST(sum(n) AS BIGINT) AS nt FROM h GROUP BY 1),
          |c AS (SELECT v, nt, CAST(coalesce(sum(nt) OVER (ORDER BY v
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |  AS BIGINT) AS bef FROM sp),
          |r AS (SELECT h.g, CAST(sum(h.n) AS BIGINT) AS n,
          |  CAST(sum(h.n * (2*c.bef + c.nt + 1)) AS BIGINT) AS r2x
          |  FROM h JOIN c ON c.v = h.v GROUP BY 1),
          |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM r),
          |tie AS (SELECT CAST(sum(CAST(floor(
          |  (CAST(sp.nt AS DOUBLE)*CAST(sp.nt AS DOUBLE)*CAST(sp.nt AS DOUBLE)
          |   - CAST(sp.nt AS DOUBLE)) * 1000000.0 /
          |  (CAST(t.nn AS DOUBLE)*CAST(t.nn AS DOUBLE)*CAST(t.nn AS DOUBLE)
          |   - CAST(t.nn AS DOUBLE))) AS BIGINT)) AS BIGINT) AS tsum
          |  FROM sp, t),
          |q AS (SELECT CAST(sum(CAST(floor(
          |  CAST(r.r2x AS DOUBLE)*CAST(r.r2x AS DOUBLE) * 250000.0 /
          |  (CAST(r.n AS DOUBLE)*CAST(t.nn AS DOUBLE)
          |   *(CAST(t.nn AS DOUBLE)+1.0))) AS BIGINT)) AS BIGINT) AS s_micro
          |  FROM r, t)
          |SELECT r.g AS priority, r.n, r.r2x, t.nn AS n_total,
          |  CAST(12*q.s_micro - 3*(t.nn+1)*1000000 AS BIGINT) AS h_micro,
          |  CAST(1000000 - tie.tsum AS BIGINT) AS tie_corr_micro,
          |  CAST(floor(CAST(12*q.s_micro - 3*(t.nn+1)*1000000 AS DOUBLE)
          |    * 1000000.0 / CAST(1000000 - tie.tsum AS DOUBLE)) AS BIGINT)
          |    AS h_adj_micro
          |FROM r, t, tie, q ORDER BY r.g
          |""".stripMargin),
      (s, dir) => {
        val b = tbl(s, dir, "orders")
          .select(col("o_orderpriority").as("g"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v"))
        val h = b.groupBy("g", "v").agg(count(lit(1)).cast("long").as("n"))
          .localCheckpoint() // value histogram feeds spine + group sums
        val sp = h.groupBy("v").agg(sum("n").cast("long").as("nt"))
          .localCheckpoint() // value-bounded spine, read twice
        // unpartitioned cumulative over the value-bounded spine: the cents
        // domain caps this frame no matter the corpus size
        val c = sp.withColumn("bef",
          coalesce(sum("nt").over(Window.orderBy("v")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        val r = h.join(c.select(col("v"), col("nt"), col("bef")), "v")
          .groupBy("g")
          .agg(sum("n").cast("long").as("n"),
            sum(col("n") * (lit(2) * col("bef") + col("nt") + 1))
              .cast("long").as("r2x"))
          .localCheckpoint() // bounded 5-row frame, read three times
        val t = r.agg(sum("n").cast("long").as("nn"))
        val tie = sp.crossJoin(broadcast(t))
          .agg(sum(floor(
            (col("nt").cast("double") * col("nt").cast("double")
              * col("nt").cast("double") - col("nt").cast("double"))
              * 1000000.0 /
              (col("nn").cast("double") * col("nn").cast("double")
                * col("nn").cast("double") - col("nn").cast("double")))
            .cast("long")).cast("long").as("tsum"))
        val q = r.crossJoin(broadcast(t))
          .agg(sum(floor(
            col("r2x").cast("double") * col("r2x").cast("double")
              * 250000.0 /
              (col("n").cast("double") * col("nn").cast("double")
                * (col("nn").cast("double") + 1.0)))
            .cast("long")).cast("long").as("s_micro"))
        val out = r.crossJoin(broadcast(t)).crossJoin(broadcast(tie))
          .crossJoin(broadcast(q))
          .select(col("g").as("priority"), col("n"), col("r2x"),
            col("nn").as("n_total"),
            (lit(12) * col("s_micro") - lit(3) * (col("nn") + 1)
              * lit(1000000L)).cast("long").as("h_micro"),
            (lit(1000000L) - col("tsum")).cast("long")
              .as("tie_corr_micro"),
            floor((lit(12) * col("s_micro") - lit(3) * (col("nn") + 1)
              * lit(1000000L)).cast("double") * 1000000.0 /
              (lit(1000000L) - col("tsum")).cast("double"))
              .cast("long").as("h_adj_micro"))
          .orderBy("priority")
        H.materialized(out, Nil, Seq(h, sp, r))
      }),

    // Theil-Sen median slope of daily revenue vs day index: the day frame
    // is calendar-bounded (~2.4k days at any corpus size), so the
    // O(days²) ≈ 2.9M pairwise-slope census is a fixed-size broadcast
    // join; the slope is exact in micro-cents/day via the two middle
    // order statistics (reported separately plus at 2×, like
    // stats_hodges_lehmann). n_positive gives the sign diagnostic.
    Q("stats_theil_sen",
      Some(
        """WITH d AS (SELECT CAST(date_diff('day', TIMESTAMP '1992-01-01',
          |    o_orderdate) AS BIGINT) AS dy,
          |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS rev
          |  FROM orders GROUP BY 1),
          |p AS (SELECT a.dy AS di, b.dy AS dj,
          |  CAST(floor(CAST(b.rev - a.rev AS DOUBLE) * 1000000.0 /
          |    CAST(b.dy - a.dy AS DOUBLE)) AS BIGINT) AS sl
          |  FROM d a JOIN d b ON b.dy > a.dy),
          |r AS (SELECT sl, row_number() OVER (ORDER BY sl, di, dj) AS rk
          |  FROM p),
          |m AS (SELECT CAST(count(*) AS BIGINT) AS m,
          |  CAST(sum(CASE WHEN sl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos
          |  FROM p)
          |SELECT m.m AS n_pairs, m.pos AS n_positive,
          |  CAST((SELECT r1.sl FROM r r1, m WHERE r1.rk = (m.m + 1) // 2)
          |    AS BIGINT) AS slope_lo_micro,
          |  CAST((SELECT r2.sl FROM r r2, m WHERE r2.rk = m.m // 2 + 1)
          |    AS BIGINT) AS slope_hi_micro,
          |  CAST(((SELECT r1.sl FROM r r1, m WHERE r1.rk = (m.m + 1) // 2)
          |    + (SELECT r2.sl FROM r r2, m WHERE r2.rk = m.m // 2 + 1))
          |    AS BIGINT) AS slope_2x_micro
          |FROM m
          |""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "orders")
          .select(datediff(col("o_orderdate"),
            lit("1992-01-01").cast("timestamp")).cast("long").as("dy"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
              .as("cents"))
          .groupBy("dy").agg(sum("cents").cast("long").as("rev"))
          // spread: the O(days²) pair expansion below probes this frame —
          // left at the aggregate's AQE-coalesced single partition, ONE
          // task generates all ~2.9M pairs (H.spread)
          .transform(graft.H.spread(_, col("dy")))
          .localCheckpoint() // calendar-bounded day frame
        val p = d.select(col("dy").as("di"), col("rev").as("ri"))
          .join(broadcast(d.select(col("dy").as("dj"),
            col("rev").as("rj"))), col("dj") > col("di"))
          .select(col("di"), col("dj"),
            floor((col("rj") - col("ri")).cast("double") * 1000000.0 /
              (col("dj") - col("di")).cast("double")).cast("long")
              .as("sl"))
        // two-phase global rank (range partitions + broadcast offsets) —
        // the 2.9M-pair sort stays parallel instead of one-partition;
        // ONE materialization of the pair frame serves rank, count and
        // sign census alike
        val pp = p.repartitionByRange(32, col("sl"), col("di"), col("dj"))
          .withColumn("pid", spark_partition_id())
          .localCheckpoint()
        val offs = pp.groupBy("pid").agg(count(lit(1)).as("cnt"))
          .withColumn("off",
            sum("cnt").over(Window.orderBy("pid")) - col("cnt"))
          .select(col("pid").as("pid2"), col("off"))
        val m = pp.agg(count(lit(1)).cast("long").as("m"),
          sum(when(col("sl") > 0, 1L).otherwise(0L)).cast("long").as("pos"))
        // both middle order statistics in ONE pass over the ranked frame:
        // ranks are sorted by sl, so lo = min, hi = max of the ≤2 hits
        // (odd m selects the same rank twice — min = max, still exact)
        val sel = pp
          .withColumn("lrk", row_number().over(
            Window.partitionBy("pid").orderBy("sl", "di", "dj"))
            .cast("long"))
          .join(broadcast(offs), col("pid") === col("pid2"))
          .select(col("sl"),
            (col("off") + col("lrk")).cast("long").as("rk"))
          .crossJoin(broadcast(m))
          .filter(col("rk") === expr("(m + 1) div 2") ||
            col("rk") === expr("m div 2 + 1"))
          .agg(min(col("sl")).as("slope_lo_micro"),
            max(col("sl")).as("slope_hi_micro"))
        val out = m.crossJoin(broadcast(sel))
          .select(col("m").as("n_pairs"), col("pos").as("n_positive"),
            col("slope_lo_micro").cast("long"),
            col("slope_hi_micro").cast("long"),
            (col("slope_lo_micro") + col("slope_hi_micro")).cast("long")
              .as("slope_2x_micro"))
        H.materialized(out, Nil, Seq(d, pp))
      }),

    // Brown-Forsythe (median-centered Levene) equality of spread across
    // the five priorities: per-group median exact at 2× from the group
    // histogram's cumulative positions, |deviation| therefore integer in
    // half-cents, and the z²-sums ride DECIMAL(38,0)/HUGEINT (half-cent
    // squares would overflow BIGINT past ~10⁷ rows). The F statistic
    // assembles from the five groups via a conditional-aggregation pivot
    // over the STATIC TPC-H priority domain — max() per named slot is
    // order-insensitive, so the one double chain is fixed and identical
    // in both engines.
    Q("stats_levene_bf",
      Some(
        """WITH b AS (SELECT o_orderpriority AS g,
          |  CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS v FROM orders),
          |h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS n
          |  FROM b GROUP BY 1, 2),
          |c AS (SELECT g, v, n,
          |  CAST(coalesce(sum(n) OVER (PARTITION BY g ORDER BY v
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |    AS BIGINT) AS bef,
          |  CAST(sum(n) OVER (PARTITION BY g) AS BIGINT) AS ng FROM h),
          |med AS (SELECT lo.g, lo.v + hi.v AS m2 FROM
          |  (SELECT g, min(v) AS v FROM c
          |    WHERE bef < (ng+1)//2 AND (ng+1)//2 <= bef + n GROUP BY g) lo
          |  JOIN (SELECT g, min(v) AS v FROM c
          |    WHERE bef < ng//2 + 1 AND ng//2 + 1 <= bef + n GROUP BY g) hi
          |  ON hi.g = lo.g),
          |z AS (SELECT h.g, CAST(sum(h.n) AS BIGINT) AS n,
          |  CAST(sum(h.n * abs(2*h.v - med.m2)) AS BIGINT) AS sz,
          |  sum(CAST(h.n AS HUGEINT) * abs(2*h.v - med.m2)
          |    * abs(2*h.v - med.m2)) AS szz
          |  FROM h JOIN med ON med.g = h.g GROUP BY h.g),
          |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
          |  CAST(sum(sz) AS BIGINT) AS szt FROM z),
          |piv AS (SELECT
          |  max(CASE WHEN g = '1-URGENT' THEN CAST(n AS DOUBLE) END) AS n1,
          |  max(CASE WHEN g = '2-HIGH' THEN CAST(n AS DOUBLE) END) AS n2,
          |  max(CASE WHEN g = '3-MEDIUM' THEN CAST(n AS DOUBLE) END) AS n3,
          |  max(CASE WHEN g = '4-NOT SPECIFIED' THEN CAST(n AS DOUBLE) END)
          |    AS n4,
          |  max(CASE WHEN g = '5-LOW' THEN CAST(n AS DOUBLE) END) AS n5,
          |  max(CASE WHEN g = '1-URGENT' THEN CAST(sz AS DOUBLE) END) AS s1,
          |  max(CASE WHEN g = '2-HIGH' THEN CAST(sz AS DOUBLE) END) AS s2,
          |  max(CASE WHEN g = '3-MEDIUM' THEN CAST(sz AS DOUBLE) END) AS s3,
          |  max(CASE WHEN g = '4-NOT SPECIFIED' THEN CAST(sz AS DOUBLE) END)
          |    AS s4,
          |  max(CASE WHEN g = '5-LOW' THEN CAST(sz AS DOUBLE) END) AS s5,
          |  max(CASE WHEN g = '1-URGENT' THEN CAST(szz AS DOUBLE) END) AS q1,
          |  max(CASE WHEN g = '2-HIGH' THEN CAST(szz AS DOUBLE) END) AS q2,
          |  max(CASE WHEN g = '3-MEDIUM' THEN CAST(szz AS DOUBLE) END) AS q3,
          |  max(CASE WHEN g = '4-NOT SPECIFIED' THEN CAST(szz AS DOUBLE) END)
          |    AS q4,
          |  max(CASE WHEN g = '5-LOW' THEN CAST(szz AS DOUBLE) END) AS q5
          |  FROM z),
          |f AS (SELECT CAST(floor((CAST(t.nn AS DOUBLE) - 5.0) / 4.0 *
          |  ((n1*(s1/n1 - CAST(t.szt AS DOUBLE)/CAST(t.nn AS DOUBLE))
          |     *(s1/n1 - CAST(t.szt AS DOUBLE)/CAST(t.nn AS DOUBLE))
          |   + n2*(s2/n2 - CAST(t.szt AS DOUBLE)/CAST(t.nn AS DOUBLE))
          |     *(s2/n2 - CAST(t.szt AS DOUBLE)/CAST(t.nn AS DOUBLE))
          |   + n3*(s3/n3 - CAST(t.szt AS DOUBLE)/CAST(t.nn AS DOUBLE))
          |     *(s3/n3 - CAST(t.szt AS DOUBLE)/CAST(t.nn AS DOUBLE))
          |   + n4*(s4/n4 - CAST(t.szt AS DOUBLE)/CAST(t.nn AS DOUBLE))
          |     *(s4/n4 - CAST(t.szt AS DOUBLE)/CAST(t.nn AS DOUBLE))
          |   + n5*(s5/n5 - CAST(t.szt AS DOUBLE)/CAST(t.nn AS DOUBLE))
          |     *(s5/n5 - CAST(t.szt AS DOUBLE)/CAST(t.nn AS DOUBLE))) /
          |   ((q1 - s1*s1/n1) + (q2 - s2*s2/n2) + (q3 - s3*s3/n3)
          |    + (q4 - s4*s4/n4) + (q5 - s5*s5/n5))) * 1000000.0)
          |  AS BIGINT) AS f_micro FROM piv, t)
          |SELECT z.g AS priority, z.n, med.m2 AS median_2x_cents,
          |  CAST(floor(CAST(z.sz AS DOUBLE) * 1000000.0 /
          |    CAST(z.n AS DOUBLE)) AS BIGINT) AS z_mean_micro,
          |  f.f_micro
          |FROM z JOIN med ON med.g = z.g, f ORDER BY z.g
          |""".stripMargin),
      (s, dir) => {
        val b = tbl(s, dir, "orders")
          .select(col("o_orderpriority").as("g"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v"))
        val h = b.groupBy("g", "v").agg(count(lit(1)).cast("long").as("n"))
          .localCheckpoint() // per-group value histogram, read twice
        // five bounded partitions over the value-bounded histogram
        val cw = Window.partitionBy("g").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)
        val c = h
          .withColumn("bef", coalesce(sum("n").over(cw), lit(0L)))
          .withColumn("ng",
            sum("n").over(Window.partitionBy("g")).cast("long"))
        val lo = c.filter(col("bef") < expr("(ng+1) div 2") &&
            expr("(ng+1) div 2") <= col("bef") + col("n"))
          .groupBy("g").agg(min("v").as("vlo"))
        val hi = c.filter(col("bef") < expr("ng div 2 + 1") &&
            expr("ng div 2 + 1") <= col("bef") + col("n"))
          .groupBy("g").agg(min("v").as("vhi"))
        val med = lo.join(hi, "g")
          .select(col("g"), (col("vlo") + col("vhi")).as("m2"))
        val z = h.join(broadcast(med), "g")
          .groupBy("g")
          .agg(sum("n").cast("long").as("n"),
            sum(col("n") * abs(lit(2) * col("v") - col("m2")))
              .cast("long").as("sz"),
            sum(col("n").cast("decimal(38,0)")
              * abs(lit(2) * col("v") - col("m2"))
              * abs(lit(2) * col("v") - col("m2"))).as("szz"))
          .localCheckpoint() // bounded 5-row frame, read three times
        val t = z.agg(sum("n").cast("long").as("nn"),
          sum("sz").cast("long").as("szt"))
        def slot(src: String, i: Int, as: String) =
          max(when(col("g") === lit(Priorities(i - 1)),
            col(src).cast("double"))).as(as)
        val piv = z.agg(
          slot("n", 1, "n1"), slot("n", 2, "n2"), slot("n", 3, "n3"),
          slot("n", 4, "n4"), slot("n", 5, "n5"),
          slot("sz", 1, "s1"), slot("sz", 2, "s2"), slot("sz", 3, "s3"),
          slot("sz", 4, "s4"), slot("sz", 5, "s5"),
          slot("szz", 1, "q1"), slot("szz", 2, "q2"), slot("szz", 3, "q3"),
          slot("szz", 4, "q4"), slot("szz", 5, "q5"))
        val f = piv.crossJoin(broadcast(t))
          .select(floor(expr(
            """(CAST(nn AS DOUBLE) - 5.0) / 4.0 *
              |((n1*(s1/n1 - CAST(szt AS DOUBLE)/CAST(nn AS DOUBLE))
              |   *(s1/n1 - CAST(szt AS DOUBLE)/CAST(nn AS DOUBLE))
              | + n2*(s2/n2 - CAST(szt AS DOUBLE)/CAST(nn AS DOUBLE))
              |   *(s2/n2 - CAST(szt AS DOUBLE)/CAST(nn AS DOUBLE))
              | + n3*(s3/n3 - CAST(szt AS DOUBLE)/CAST(nn AS DOUBLE))
              |   *(s3/n3 - CAST(szt AS DOUBLE)/CAST(nn AS DOUBLE))
              | + n4*(s4/n4 - CAST(szt AS DOUBLE)/CAST(nn AS DOUBLE))
              |   *(s4/n4 - CAST(szt AS DOUBLE)/CAST(nn AS DOUBLE))
              | + n5*(s5/n5 - CAST(szt AS DOUBLE)/CAST(nn AS DOUBLE))
              |   *(s5/n5 - CAST(szt AS DOUBLE)/CAST(nn AS DOUBLE))) /
              | ((q1 - s1*s1/n1) + (q2 - s2*s2/n2) + (q3 - s3*s3/n3)
              |  + (q4 - s4*s4/n4) + (q5 - s5*s5/n5))) * 1000000.0
              |""".stripMargin.replace('\n', ' '))).cast("long")
            .as("f_micro"))
        val out = z.join(broadcast(med), "g").crossJoin(broadcast(f))
          .select(col("g").as("priority"), col("n"),
            col("m2").cast("long").as("median_2x_cents"),
            floor(col("sz").cast("double") * 1000000.0 /
              col("n").cast("double")).cast("long").as("z_mean_micro"),
            col("f_micro"))
          .orderBy("priority")
        H.materialized(out, Nil, Seq(h, z))
      }),

    // Mood's median test across market segments: split every order at the
    // GRAND 2×median (exact from the global value-histogram cumulative),
    // 5×2 contingency on the strict below/above counts (ties at the
    // median sit out, reported), chi² with each of the ten cells
    // cross-multiplied then micro-floored from the one fixed double chain
    // before the exact integer sum.
    Q("stats_mood_median",
      Some(
        """WITH b AS (SELECT c.c_mktsegment AS g,
          |  CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT) AS v
          |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
          |h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS n
          |  FROM b GROUP BY 1, 2),
          |sp AS (SELECT v, CAST(sum(n) AS BIGINT) AS nt FROM h GROUP BY 1),
          |c2 AS (SELECT v, nt, CAST(coalesce(sum(nt) OVER (ORDER BY v
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |  AS BIGINT) AS bef FROM sp),
          |t0 AS (SELECT CAST(sum(nt) AS BIGINT) AS tn FROM sp),
          |m2 AS (SELECT lo.v + hi.v AS m2 FROM
          |  (SELECT min(v) AS v FROM c2, t0
          |    WHERE bef < (tn+1)//2 AND (tn+1)//2 <= bef + nt) lo,
          |  (SELECT min(v) AS v FROM c2, t0
          |    WHERE bef < tn//2 + 1 AND tn//2 + 1 <= bef + nt) hi),
          |cls AS (SELECT h.g,
          |  CAST(sum(CASE WHEN 2*h.v < m2.m2 THEN h.n ELSE 0 END)
          |    AS BIGINT) AS nb,
          |  CAST(sum(CASE WHEN 2*h.v > m2.m2 THEN h.n ELSE 0 END)
          |    AS BIGINT) AS na,
          |  CAST(sum(CASE WHEN 2*h.v = m2.m2 THEN h.n ELSE 0 END)
          |    AS BIGINT) AS nat
          |  FROM h, m2 GROUP BY h.g),
          |tt AS (SELECT CAST(sum(nb) AS BIGINT) AS tb,
          |  CAST(sum(na) AS BIGINT) AS ta,
          |  CAST(sum(nb + na) AS BIGINT) AS t FROM cls),
          |cells AS (
          |  SELECT cls.g, cls.nb AS obs, cls.nb + cls.na AS rt,
          |    tt.tb AS ct, tt.t FROM cls, tt
          |  UNION ALL
          |  SELECT cls.g, cls.na, cls.nb + cls.na, tt.ta, tt.t
          |  FROM cls, tt),
          |chi AS (SELECT CAST(sum(CAST(floor(
          |  (CAST(obs AS DOUBLE)*CAST(t AS DOUBLE)
          |   - CAST(rt AS DOUBLE)*CAST(ct AS DOUBLE))
          |  * (CAST(obs AS DOUBLE)*CAST(t AS DOUBLE)
          |     - CAST(rt AS DOUBLE)*CAST(ct AS DOUBLE))
          |  * 1000000.0 / (CAST(t AS DOUBLE)*CAST(rt AS DOUBLE)
          |    *CAST(ct AS DOUBLE))) AS BIGINT)) AS BIGINT) AS chi2_micro
          |  FROM cells)
          |SELECT cls.g AS mktsegment, cls.nb AS n_below, cls.na AS n_above,
          |  cls.nat AS n_at, chi.chi2_micro
          |FROM cls, chi ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val b = tbl(s, dir, "orders")
          .select(col("o_custkey"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("v"))
          .join(broadcast(tbl(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment").as("g"))),
            col("o_custkey") === col("c_custkey"))
        val h = b.groupBy("g", "v").agg(count(lit(1)).cast("long").as("n"))
          .localCheckpoint() // read for median spine + class counts
        val sp = h.groupBy("v").agg(sum("n").cast("long").as("nt"))
        val c2 = sp.withColumn("bef",
          coalesce(sum("nt").over(Window.orderBy("v")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .localCheckpoint() // value-bounded cumulative spine, read twice
        val t0 = c2.agg(sum("nt").cast("long").as("tn"))
        val vlo = c2.crossJoin(broadcast(t0))
          .filter(col("bef") < expr("(tn+1) div 2") &&
            expr("(tn+1) div 2") <= col("bef") + col("nt"))
          .agg(min("v").as("vlo"))
        val vhi = c2.crossJoin(broadcast(t0))
          .filter(col("bef") < expr("tn div 2 + 1") &&
            expr("tn div 2 + 1") <= col("bef") + col("nt"))
          .agg(min("v").as("vhi"))
        val m2 = vlo.crossJoin(broadcast(vhi))
          .select((col("vlo") + col("vhi")).as("m2"))
        val cls = h.crossJoin(broadcast(m2))
          .groupBy("g")
          .agg(sum(when(lit(2) * col("v") < col("m2"), col("n"))
              .otherwise(0L)).cast("long").as("nb"),
            sum(when(lit(2) * col("v") > col("m2"), col("n"))
              .otherwise(0L)).cast("long").as("na"),
            sum(when(lit(2) * col("v") === col("m2"), col("n"))
              .otherwise(0L)).cast("long").as("nat"))
          .localCheckpoint() // bounded 5-row frame, read three times
        val tt = cls.agg(sum("nb").cast("long").as("tb"),
          sum("na").cast("long").as("ta"),
          sum(col("nb") + col("na")).cast("long").as("t"))
        val cells = cls.crossJoin(broadcast(tt))
          .select(col("g"), col("nb").as("obs"),
            (col("nb") + col("na")).as("rt"), col("tb").as("ct"), col("t"))
          .unionAll(cls.crossJoin(broadcast(tt))
            .select(col("g"), col("na").as("obs"),
              (col("nb") + col("na")).as("rt"), col("ta").as("ct"),
              col("t")))
        val chi = cells.agg(sum(floor(
          (col("obs").cast("double") * col("t").cast("double")
            - col("rt").cast("double") * col("ct").cast("double"))
            * (col("obs").cast("double") * col("t").cast("double")
              - col("rt").cast("double") * col("ct").cast("double"))
            * 1000000.0 / (col("t").cast("double")
              * col("rt").cast("double") * col("ct").cast("double")))
          .cast("long")).cast("long").as("chi2_micro"))
        val out = cls.crossJoin(broadcast(chi))
          .select(col("g").as("mktsegment"), col("nb").as("n_below"),
            col("na").as("n_above"), col("nat").as("n_at"),
            col("chi2_micro"))
          .orderBy("mktsegment")
        H.materialized(out, Nil, Seq(h, c2, cls))
      }))
}
