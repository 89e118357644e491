package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Ninetieth wave: risk-scoring and evaluation operators — a WOE/IV
  * credit-style scorecard against the return-label, a two-proportion
  * z-test with Wilson bounds for the year-over-year return rate, the
  * SQL distribution window functions (percent_rank / cume_dist / ntile
  * / nth_value) exercised as real engine functions, and ROC-AUC via the
  * rank-sum identity on a value-count histogram (never a quadratic
  * pair scan).
  *
  * Exactness: counts are exact integers from one keyed aggregation per
  * query; every probability/log appearance is a single fixed IEEE
  * chain floored to micro before any cross-bin sum; AUC's U statistic
  * rides at 2× (ties count once) in HUGEINT/DECIMAL so n_pos·n_neg
  * never overflows; window-function outputs are micro-floored doubles
  * whose inputs are small exact integers (rank, n), so both engines
  * compute bit-identical values.
  */
object RiskEvalOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // WOE / IV scorecard: label = order contains a returned lineitem;
    // features = order priority and customer segment. Per bin: good and
    // bad counts, weight-of-evidence ln((g/G)/(b/B)) in micro, and the
    // bin's IV contribution (g/G − b/B)·WOE in micro — the standard
    // feature-screening table a risk pipeline emits before model fit.
    // Facts reduce to per-order labels (map-side combinable max), then
    // one keyed aggregation per feature on broadcast-joined dims.
    Q("orders_woe_iv",
      Some(
        """WITH lab AS (SELECT l_orderkey AS ok,
          |  max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS bad
          |  FROM lineitem GROUP BY 1),
          |base AS (SELECT o.o_orderkey, o.o_orderpriority AS pri,
          |  c.c_mktsegment AS seg, lab.bad
          |  FROM orders o JOIN lab ON lab.ok = o.o_orderkey
          |  JOIN customer c ON c.c_custkey = o.o_custkey),
          |f AS (SELECT 'priority' AS feature, pri AS bin,
          |    CAST(sum(1 - bad) AS BIGINT) AS n_good,
          |    CAST(sum(bad) AS BIGINT) AS n_bad
          |  FROM base GROUP BY 1, 2
          |  UNION ALL SELECT 'segment', seg,
          |    CAST(sum(1 - bad) AS BIGINT), CAST(sum(bad) AS BIGINT)
          |  FROM base GROUP BY 1, 2),
          |t AS (SELECT feature, CAST(sum(n_good) AS BIGINT) AS gt,
          |  CAST(sum(n_bad) AS BIGINT) AS bt FROM f GROUP BY 1)
          |SELECT f.feature, f.bin, f.n_good, f.n_bad,
          |  CAST(floor(ln((CAST(f.n_good AS DOUBLE)/CAST(t.gt AS DOUBLE))
          |    / (CAST(f.n_bad AS DOUBLE)/CAST(t.bt AS DOUBLE)))
          |    * 1000000.0) AS BIGINT) AS woe_micro,
          |  CAST(floor((CAST(f.n_good AS DOUBLE)/CAST(t.gt AS DOUBLE)
          |    - CAST(f.n_bad AS DOUBLE)/CAST(t.bt AS DOUBLE))
          |    * ln((CAST(f.n_good AS DOUBLE)/CAST(t.gt AS DOUBLE))
          |    / (CAST(f.n_bad AS DOUBLE)/CAST(t.bt AS DOUBLE)))
          |    * 1000000.0) AS BIGINT) AS iv_term_micro
          |FROM f JOIN t ON t.feature = f.feature ORDER BY 1, 2
          |""".stripMargin),
      (s, dir) => {
        val lab = tbl(s, dir, "lineitem")
          .groupBy(col("l_orderkey").as("ok"))
          .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0))
            .as("bad"))
        val base = tbl(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderpriority").as("pri"))
          .join(lab, col("ok") === col("o_orderkey"))
          .join(broadcast(tbl(s, dir, "customer")
              .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
            col("o_custkey") === col("c_custkey"))
        def feat(name: String, bin: org.apache.spark.sql.Column) =
          base.groupBy(bin.as("bin"))
            .agg(sum(lit(1) - col("bad")).cast("long").as("n_good"),
              sum(col("bad")).cast("long").as("n_bad"))
            .select(lit(name).as("feature"), col("bin"), col("n_good"),
              col("n_bad"))
        val f = feat("priority", col("pri"))
          .unionByName(feat("segment", col("seg")))
        val t = f.groupBy("feature")
          .agg(sum(col("n_good")).cast("long").as("gt"),
            sum(col("n_bad")).cast("long").as("bt"))
        f.join(broadcast(t), Seq("feature"))
          .select(col("feature"), col("bin"), col("n_good"), col("n_bad"),
            floor(log((col("n_good").cast("double") /
              col("gt").cast("double")) /
              (col("n_bad").cast("double") / col("bt").cast("double"))) *
              1000000.0d).cast("long").as("woe_micro"),
            floor((col("n_good").cast("double") / col("gt").cast("double")
              - col("n_bad").cast("double") / col("bt").cast("double")) *
              log((col("n_good").cast("double") /
                col("gt").cast("double")) /
                (col("n_bad").cast("double") / col("bt").cast("double"))) *
              1000000.0d).cast("long").as("iv_term_micro"))
          .orderBy("feature", "bin")
      }),

    // Two-proportion z-test + Wilson 95% bounds: did the lineitem
    // return rate move from 1996 to 1997? Pooled-variance z and each
    // year's Wilson interval in micro — the A/B primitive for rates.
    // One scan to the 2-row year frame; all arithmetic on bounded ints.
    Q("stats_two_proportion_z",
      Some(
        """WITH y AS (SELECT year(l_shipdate) AS yr,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
          |    AS BIGINT) AS x
          |  FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)
          |  GROUP BY 1),
          |p AS (SELECT
          |  max(CASE WHEN yr = 1996 THEN n END) AS n1,
          |  max(CASE WHEN yr = 1996 THEN x END) AS x1,
          |  max(CASE WHEN yr = 1997 THEN n END) AS n2,
          |  max(CASE WHEN yr = 1997 THEN x END) AS x2 FROM y),
          |z AS (SELECT n1, x1, n2, x2,
          |  CAST(x1 AS DOUBLE)/CAST(n1 AS DOUBLE) AS p1,
          |  CAST(x2 AS DOUBLE)/CAST(n2 AS DOUBLE) AS p2,
          |  CAST(x1 + x2 AS DOUBLE)/CAST(n1 + n2 AS DOUBLE) AS pp
          |  FROM p)
          |SELECT n1, x1, n2, x2,
          |  CAST(floor((p1 - p2) / sqrt(pp*(1.0-pp)
          |    *(1.0/CAST(n1 AS DOUBLE) + 1.0/CAST(n2 AS DOUBLE)))
          |    * 1000000.0) AS BIGINT) AS z_micro,
          |  CAST(floor((p1 + 1.9599639845400545*1.9599639845400545
          |    /(2.0*CAST(n1 AS DOUBLE)) - 1.9599639845400545
          |    * sqrt(p1*(1.0-p1)/CAST(n1 AS DOUBLE)
          |      + 1.9599639845400545*1.9599639845400545
          |        /(4.0*CAST(n1 AS DOUBLE)*CAST(n1 AS DOUBLE))))
          |    / (1.0 + 1.9599639845400545*1.9599639845400545
          |        /CAST(n1 AS DOUBLE)) * 1000000.0) AS BIGINT)
          |    AS wilson_lo_1996_micro,
          |  CAST(floor((p2 + 1.9599639845400545*1.9599639845400545
          |    /(2.0*CAST(n2 AS DOUBLE)) - 1.9599639845400545
          |    * sqrt(p2*(1.0-p2)/CAST(n2 AS DOUBLE)
          |      + 1.9599639845400545*1.9599639845400545
          |        /(4.0*CAST(n2 AS DOUBLE)*CAST(n2 AS DOUBLE))))
          |    / (1.0 + 1.9599639845400545*1.9599639845400545
          |        /CAST(n2 AS DOUBLE)) * 1000000.0) AS BIGINT)
          |    AS wilson_lo_1997_micro
          |FROM z
          |""".stripMargin),
      (s, dir) => {
        tbl(s, dir, "lineitem")
          .select(col("l_shipdate"), col("l_returnflag"))
          .createOrReplaceTempView("lineitem_tpz")
        s.sql(
          """WITH y AS (SELECT year(l_shipdate) AS yr,
            |  CAST(count(*) AS BIGINT) AS n,
            |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
            |    AS BIGINT) AS x
            |  FROM lineitem_tpz WHERE year(l_shipdate) IN (1996, 1997)
            |  GROUP BY 1),
            |p AS (SELECT
            |  max(CASE WHEN yr = 1996 THEN n END) AS n1,
            |  max(CASE WHEN yr = 1996 THEN x END) AS x1,
            |  max(CASE WHEN yr = 1997 THEN n END) AS n2,
            |  max(CASE WHEN yr = 1997 THEN x END) AS x2 FROM y),
            |z AS (SELECT n1, x1, n2, x2,
            |  CAST(x1 AS DOUBLE)/CAST(n1 AS DOUBLE) AS p1,
            |  CAST(x2 AS DOUBLE)/CAST(n2 AS DOUBLE) AS p2,
            |  CAST(x1 + x2 AS DOUBLE)/CAST(n1 + n2 AS DOUBLE) AS pp
            |  FROM p)
            |SELECT n1, x1, n2, x2,
            |  CAST(floor((p1 - p2) / sqrt(pp*(1.0d-pp)
            |    *(1.0d/CAST(n1 AS DOUBLE) + 1.0d/CAST(n2 AS DOUBLE)))
            |    * 1000000.0d) AS BIGINT) AS z_micro,
            |  CAST(floor((p1 + 1.9599639845400545d*1.9599639845400545d
            |    /(2.0d*CAST(n1 AS DOUBLE)) - 1.9599639845400545d
            |    * sqrt(p1*(1.0d-p1)/CAST(n1 AS DOUBLE)
            |      + 1.9599639845400545d*1.9599639845400545d
            |        /(4.0d*CAST(n1 AS DOUBLE)*CAST(n1 AS DOUBLE))))
            |    / (1.0d + 1.9599639845400545d*1.9599639845400545d
            |        /CAST(n1 AS DOUBLE)) * 1000000.0d) AS BIGINT)
            |    AS wilson_lo_1996_micro,
            |  CAST(floor((p2 + 1.9599639845400545d*1.9599639845400545d
            |    /(2.0d*CAST(n2 AS DOUBLE)) - 1.9599639845400545d
            |    * sqrt(p2*(1.0d-p2)/CAST(n2 AS DOUBLE)
            |      + 1.9599639845400545d*1.9599639845400545d
            |        /(4.0d*CAST(n2 AS DOUBLE)*CAST(n2 AS DOUBLE))))
            |    / (1.0d + 1.9599639845400545d*1.9599639845400545d
            |        /CAST(n2 AS DOUBLE)) * 1000000.0d) AS BIGINT)
            |    AS wilson_lo_1997_micro
            |FROM z
            |""".stripMargin)
      }),

    // Distribution window functions as the engines implement them:
    // percent_rank, cume_dist, ntile(4), nth_value(…, 3) per nation
    // over (acctbal cents, suppkey) — a TOTAL order, so every value is
    // deterministic. The float pair (rank−1)/(n−1) and rank/n are
    // single divisions of small exact integers — bit-identical across
    // engines — floored to micro. Windows partition by nation: fully
    // parallel, frame sizes dimension-bounded.
    Q("win_distribution_funcs",
      Some(
        """WITH b AS (SELECT s_nationkey AS nk, s_suppkey AS sk,
          |  CAST(floor(s_acctbal*100 + 0.5) AS BIGINT) AS cents
          |  FROM supplier)
          |SELECT nk, sk, cents,
          |  CAST(floor(percent_rank() OVER w * 1000000.0) AS BIGINT)
          |    AS pr_micro,
          |  CAST(floor(cume_dist() OVER w * 1000000.0) AS BIGINT)
          |    AS cd_micro,
          |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          |  CAST(coalesce(nth_value(cents, 3) OVER w, -1) AS BIGINT)
          |    AS third_cents
          |FROM b WINDOW w AS (PARTITION BY nk ORDER BY cents, sk)
          |ORDER BY nk, sk
          |""".stripMargin),
      (s, dir) => {
        val b = tbl(s, dir, "supplier")
          .select(col("s_nationkey").as("nk"), col("s_suppkey").as("sk"),
            floor(col("s_acctbal") * 100 + lit(0.5)).cast("long")
              .as("cents"))
        val w = Window.partitionBy("nk").orderBy("cents", "sk")
        b.select(col("nk"), col("sk"), col("cents"),
            floor(percent_rank().over(w) * 1000000.0d).cast("long")
              .as("pr_micro"),
            floor(cume_dist().over(w) * 1000000.0d).cast("long")
              .as("cd_micro"),
            ntile(4).over(w).cast("long").as("quartile"),
            coalesce(nth_value(col("cents"), 3).over(w), lit(-1L))
              .cast("long").as("third_cents"))
          .orderBy("nk", "sk")
      }),

    // ROC-AUC of the document quality score against the lang='en'
    // label, via the rank-sum identity AUC = U/(n₁·n₀) on the score
    // value-count histogram: U2 = Σ_v n₁(v)·(2·c₀(<v) + n₀(v)) counts
    // wins at 2× with ties at 1× — NEVER the quadratic pair join. U2
    // accumulates in HUGEINT/DECIMAL(38,0); auc_micro = U2·5e5 div
    // (n₁·n₀) is exact at any corpus size. The one-number ranking
    // quality gate for any scoring model at scale.
    Q("clf_roc_auc",
      Some(
        """WITH d AS (SELECT
          |  CAST(n_chars + 7 * len(string_split(text, ' ')) AS BIGINT)
          |    AS score,
          |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
          |  FROM documents),
          |h AS (SELECT score,
          |  CAST(sum(pos) AS BIGINT) AS n1,
          |  CAST(sum(1 - pos) AS BIGINT) AS n0
          |  FROM d GROUP BY 1),
          |c AS (SELECT score, n1, n0,
          |  CAST(coalesce(sum(n0) OVER (ORDER BY score
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |    AS BIGINT) AS c0
          |  FROM h),
          |u AS (SELECT sum(CAST(n1 AS HUGEINT) * (2*c0 + n0)) AS u2,
          |  CAST(sum(n1) AS BIGINT) AS np, CAST(sum(n0) AS BIGINT) AS nn
          |  FROM c)
          |SELECT np AS n_pos, nn AS n_neg, CAST(u2 AS VARCHAR) AS u2,
          |  CAST(u2 * 500000 // (CAST(np AS HUGEINT) * nn) AS BIGINT)
          |    AS auc_micro
          |FROM u
          |""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .select((col("n_chars") +
            lit(7) * size(split(col("text"), " ", -1))).cast("long")
            .as("score"),
            when(col("lang") === "en", 1).otherwise(0).as("pos"))
        val h = d.groupBy("score")
          .agg(sum(col("pos")).cast("long").as("n1"),
            sum(lit(1) - col("pos")).cast("long").as("n0"))
        val w = Window.orderBy("score")
          .rowsBetween(Window.unboundedPreceding, -1)
        val c = h.withColumn("c0",
          coalesce(sum(col("n0")).over(w), lit(0L)).cast("long"))
        c.agg(
            sum(col("n1").cast("decimal(38,0)") *
              (lit(2) * col("c0") + col("n0")))
              .cast("decimal(38,0)").as("u2"),
            sum(col("n1")).cast("long").as("np"),
            sum(col("n0")).cast("long").as("nn"))
          .select(col("np").as("n_pos"), col("nn").as("n_neg"),
            col("u2").cast("string").as("u2"),
            expr("CAST(u2 * 500000 div (CAST(np AS DECIMAL(38,0)) * nn)" +
              " AS BIGINT)").as("auc_micro"))
      })
  )
}
