package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Hundred-tenth wave: composition adjustment and leakage audits —
  * trading-day-adjusted YoY growth (was 1997 up because of demand or
  * because it had more Mondays?), per-dimension label leakage in the
  * embedding space (which coordinates predict the label on their own —
  * the probe before trusting "anonymized" vectors), and hour-of-day
  * habit entropy per user (how schedulable is the audience?).
  *
  * Exactness: the adjustment reweights exact per-dow cents by integer
  * day counts (one milli chain at the end); per-dim AUC reuses the
  * rank-sum identity with windows partitioned by dimension; habit
  * entropy terms floor to micro per (user, hour) before the per-user
  * sum, and the final census is integer bands.
  */
object AdjustmentOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Trading-day adjustment: YoY growth 1996→1997 raw, and adjusted
    // by reweighting each weekday's 1997 revenue to 1996's weekday
    // day-count composition — rev_adj = Σ_dow rev97_dow ·
    // (days96_dow/days97_dow), carried as exact cents·days integers
    // until one final milli ratio. The difference between raw and
    // adjusted growth IS the calendar artifact.
    Q("orders_trading_day_adjust",
      Some(
        """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
          |  year(o_orderdate) AS yr,
          |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents
          |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
          |  GROUP BY 1, 2),
          |g AS (SELECT yr, dayofweek(day) AS dow,
          |  CAST(count(*) AS BIGINT) AS days,
          |  CAST(sum(cents) AS BIGINT) AS cents FROM d GROUP BY 1, 2),
          |p AS (SELECT a.dow, a.days AS d96, a.cents AS c96,
          |  b.days AS d97, b.cents AS c97
          |  FROM (SELECT * FROM g WHERE yr = 1996) a
          |  JOIN (SELECT * FROM g WHERE yr = 1997) b ON b.dow = a.dow),
          |t AS (SELECT CAST(sum(c96) AS BIGINT) AS r96,
          |  CAST(sum(c97) AS BIGINT) AS r97,
          |  CAST(sum(CAST(c97 AS HUGEINT) * d96 // d97) AS BIGINT)
          |    AS r97_adj FROM p)
          |SELECT r96 AS rev96_cents, r97 AS rev97_cents,
          |  r97_adj AS rev97_adjusted_cents,
          |  CAST((r97 - r96) * 1000 // r96 AS BIGINT)
          |    AS raw_growth_milli,
          |  CAST((r97_adj - r96) * 1000 // r96 AS BIGINT)
          |    AS adjusted_growth_milli
          |FROM t
          |""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "orders")
          .filter(year(col("o_orderdate")).isin(1996, 1997))
          .groupBy(col("o_orderdate").cast("date").as("day"),
            year(col("o_orderdate")).as("yr"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
            .cast("long")).cast("long").as("cents"))
        val g = d.groupBy(col("yr"), dayofweek(col("day")).as("dow"))
          .agg(count(lit(1)).cast("long").as("days"),
            sum(col("cents")).cast("long").as("cents"))
        val p = g.filter(col("yr") === 1996)
          .select(col("dow"), col("days").as("d96"),
            col("cents").as("c96"))
          .join(g.filter(col("yr") === 1997)
            .select(col("dow").as("dow2"), col("days").as("d97"),
              col("cents").as("c97")), col("dow") === col("dow2"))
        p.agg(sum(col("c96")).cast("long").as("r96"),
            sum(col("c97")).cast("long").as("r97"),
            sum(expr("CAST(c97 AS DECIMAL(38,0)) * d96 div d97"))
              .cast("long").as("r97_adj"))
          .select(col("r96").as("rev96_cents"),
            col("r97").as("rev97_cents"),
            col("r97_adj").as("rev97_adjusted_cents"),
            expr("(r97 - r96) * 1000 div r96").cast("long")
              .as("raw_growth_milli"),
            expr("(r97_adj - r96) * 1000 div r96").cast("long")
              .as("adjusted_growth_milli"))
      }),

    // Per-dimension label leakage: for every embedding coordinate, the
    // AUC of predicting label==0 from that coordinate alone (rank-sum
    // identity per dim, windows partitioned by dimension — fully
    // parallel), reporting the five most-leaking dims by |AUC − ½|.
    // The audit that catches "the label is basically dimension 17"
    // before someone ships those vectors as anonymized.
    Q("emb_dim_leakage",
      Some(
        """WITH e AS (SELECT
          |  CASE WHEN label = 0 THEN 1 ELSE 0 END AS pos,
          |  CAST(floor(unnest(embedding)::DOUBLE * 1000 + 0.5)
          |    AS BIGINT) AS x,
          |  generate_subscripts(embedding, 1) AS j FROM embeddings),
          |h AS (SELECT j, x, CAST(sum(pos) AS BIGINT) AS n1,
          |  CAST(sum(1 - pos) AS BIGINT) AS n0 FROM e GROUP BY 1, 2),
          |c AS (SELECT j, x, n1, n0,
          |  CAST(coalesce(sum(n0) OVER (PARTITION BY j ORDER BY x
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |    AS BIGINT) AS c0 FROM h),
          |u AS (SELECT j, sum(CAST(n1 AS HUGEINT) * (2*c0 + n0)) AS u2,
          |  CAST(sum(n1) AS BIGINT) AS np, CAST(sum(n0) AS BIGINT)
          |    AS nn FROM c GROUP BY 1),
          |a AS (SELECT j, CAST(u2 * 500000
          |    // (CAST(np AS HUGEINT) * nn) AS BIGINT) AS auc_micro
          |  FROM u)
          |SELECT CAST(j AS BIGINT) AS dim, auc_micro,
          |  CAST(abs(auc_micro - 500000) AS BIGINT) AS leak_micro
          |FROM a ORDER BY leak_micro DESC, dim LIMIT 5
          |""".stripMargin),
      (s, dir) => {
        // posexplode emits a column literally named 'pos' — keep the
        // label flag under a different name to avoid the collision
        val e2 = tbl(s, dir, "embeddings")
          .select(col("label"), posexplode(col("embedding")))
          .select(when(col("label") === 0, 1).otherwise(0).as("isp"),
            (col("pos") + 1).as("j"),
            floor(col("col").cast("double") * 1000 + lit(0.5))
              .cast("long").as("x"))
        val h = e2.groupBy("j", "x")
          .agg(sum(col("isp")).cast("long").as("n1"),
            sum(lit(1) - col("isp")).cast("long").as("n0"))
        val wc = Window.partitionBy("j").orderBy("x")
          .rowsBetween(Window.unboundedPreceding, -1)
        val c = h.withColumn("c0",
          coalesce(sum(col("n0")).over(wc), lit(0L)).cast("long"))
        val u = c.groupBy("j")
          .agg(sum(col("n1").cast("decimal(38,0)") *
            (lit(2) * col("c0") + col("n0"))).cast("decimal(38,0)")
            .as("u2"),
            sum(col("n1")).cast("long").as("np"),
            sum(col("n0")).cast("long").as("nn"))
        u.select(col("j").cast("long").as("dim"),
            expr("CAST(u2 * 500000 div (CAST(np AS DECIMAL(38,0))" +
              " * nn) AS BIGINT)").as("auc_micro"))
          .withColumn("leak_micro",
            abs(col("auc_micro") - 500000).cast("long"))
          .orderBy(col("leak_micro").desc, col("dim")).limit(5)
      }),

    // Hour-of-day habit entropy: per user, the entropy of their
    // activity's hour histogram (terms micro-floored pre-sum), binned
    // into habit bands (≤1.0 nat = strongly scheduled … >2.5 ≈
    // uniform). The "when can we ship maintenance windows" census; the
    // per-user frame is 24-bounded and the final output 4 bands.
    Q("events_habit_entropy",
      Some(
        """WITH h AS (SELECT user_id, hour(ts) AS hr,
          |  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
          |t AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS nt FROM h
          |  GROUP BY 1),
          |e AS (SELECT h.user_id,
          |  CAST(sum(CAST(floor(-(CAST(h.n AS DOUBLE)
          |      / CAST(t.nt AS DOUBLE))
          |    * ln(CAST(h.n AS DOUBLE) / CAST(t.nt AS DOUBLE))
          |    * 1000000.0) AS BIGINT)) AS BIGINT) AS ent_micro
          |  FROM h JOIN t ON t.user_id = h.user_id
          |  WHERE t.nt >= 10 GROUP BY 1),
          |b AS (SELECT CASE WHEN ent_micro <= 1000000 THEN 'a_scheduled'
          |  WHEN ent_micro <= 1800000 THEN 'b_routine'
          |  WHEN ent_micro <= 2500000 THEN 'c_diffuse'
          |  ELSE 'd_uniform' END AS band FROM e)
          |SELECT band, CAST(count(*) AS BIGINT) AS n_users
          |FROM b GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val h = H.events(s, dir)
          .groupBy(col("user_id"), hour(col("ts")).as("hr"))
          .agg(count(lit(1)).cast("long").as("n"))
        val t = h.groupBy("user_id")
          .agg(sum(col("n")).cast("long").as("nt"))
          .filter(col("nt") >= 10)
        val e = h.join(t, Seq("user_id"))
          .select(col("user_id"),
            floor((lit(0.0d) - col("n").cast("double") /
              col("nt").cast("double")) *
              log(col("n").cast("double") / col("nt").cast("double")) *
              1000000.0d).cast("long").as("term"))
          .groupBy("user_id")
          .agg(sum(col("term")).cast("long").as("ent_micro"))
        e.select(when(col("ent_micro") <= 1000000L, "a_scheduled")
            .when(col("ent_micro") <= 1800000L, "b_routine")
            .when(col("ent_micro") <= 2500000L, "c_diffuse")
            .otherwise("d_uniform").as("band"))
          .groupBy("band")
          .agg(count(lit(1)).cast("long").as("n_users"))
          .orderBy("band")
      })
  )
}
