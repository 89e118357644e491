package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Twenty-seventh wave: distribution/behavior QA — exact higher moments,
  * bot-behavior flags over the event stream, and a cohort revenue matrix.
  *
  * Determinism: skewness/kurtosis assemble from exact DECIMAL moment
  * sums (Spark's built-ins accumulate doubles in partition order and are
  * NOT run-stable — this query is the engine's deterministic form);
  * bot thresholds are integer compares; cohort cells are DECIMAL sums.
  */
object BehaviorQaOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // EXACT HIGHER MOMENTS: per-flag skewness and excess kurtosis of
    // l_quantity from the first four EXACT power sums (DECIMAL
    // accumulation, one map-side-combined pass) assembled into the
    // standard m3/m2^1.5 and m4/m2²−3 forms at the very end — doubles
    // built from exact sums, sqrt correctly rounded, so the shape
    // statistics hash identically (Spark's skewness()/kurtosis()
    // aggregate doubles in partition order and cannot).
    Q("agg_higher_moments",
      Some(
        """WITH m AS (
          |  SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
          |    CAST(sum(CAST(l_quantity AS BIGINT) *
          |      CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
          |    CAST(sum(CAST(l_quantity AS BIGINT) *
          |      CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
          |      AS BIGINT) AS s3,
          |    CAST(sum(CAST(l_quantity AS BIGINT) *
          |      CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) *
          |      CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4
          |  FROM lineitem GROUP BY 1),
          |c AS (
          |  SELECT flag, n,
          |    CAST(s1 AS DOUBLE) / n AS mu,
          |    CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) *
          |      (CAST(s1 AS DOUBLE) / n) AS m2,
          |    CAST(s3 AS DOUBLE) / n
          |      - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
          |      + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
          |        * (CAST(s1 AS DOUBLE) / n) AS m3,
          |    CAST(s4 AS DOUBLE) / n
          |      - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
          |      + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
          |        * (CAST(s2 AS DOUBLE) / n)
          |      - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
          |        * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
          |      AS m4
          |  FROM m)
          |SELECT flag, n, mu, m2 AS variance,
          |  m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)) AS skewness,
          |  m4 / (m2 * m2) - 3 AS excess_kurtosis
          |FROM c ORDER BY flag""".stripMargin),
      (s, dir) => {
        val q = col("l_quantity").cast("long")
        val m = tbl(s, dir, "lineitem")
          .groupBy(col("l_returnflag").as("flag"))
          .agg(count(lit(1)).as("n"),
            sum(q).cast("long").as("s1"),
            sum(q * q).cast("long").as("s2"),
            sum(q * q * q).cast("long").as("s3"),
            sum(q * q * q * q).cast("long").as("s4"))
        val mu = col("s1").cast("double") / col("n")
        val e2 = col("s2").cast("double") / col("n")
        val e3 = col("s3").cast("double") / col("n")
        val e4 = col("s4").cast("double") / col("n")
        val c = m.select(col("flag"), col("n"), mu.as("mu"),
          (e2 - mu * mu).as("m2"),
          (e3 - lit(3) * mu * e2 + lit(2) * mu * mu * mu).as("m3"),
          (e4 - lit(4) * mu * e3 + lit(6) * mu * mu * e2 -
            lit(3) * mu * mu * mu * mu).as("m4"))
        c.select(col("flag"), col("n"), col("mu"), col("m2").as("variance"),
            (col("m3") / (sqrt(col("m2")) * sqrt(col("m2")) *
              sqrt(col("m2")))).as("skewness"),
            (col("m4") / (col("m2") * col("m2")) - 3).as("excess_kurtosis"))
          .orderBy("flag")
      }),

    // BOT-BEHAVIOR FLAGS: the per-user heuristics an abuse filter runs —
    // minimum inter-arrival gap, busiest-minute event count, and
    // duplicate-timestamp count — each an exact integer from one ordered
    // pass (lag window) plus one (user, minute) reduce; a user flags
    // when any threshold trips (gap < 5 s, >5 events in one minute, any
    // exact-duplicate timestamp). The event stream is touched once per
    // statistic, all hash-partitioned by user.
    Q("events_bot_flags",
      Some(
        """WITH g AS (
          |  SELECT user_id,
          |    epoch_us(ts) - lag(epoch_us(ts)) OVER
          |      (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          |  FROM events),
          |mg AS (SELECT user_id, CAST(min(gap_us) AS BIGINT) AS min_gap_us
          |       FROM g WHERE gap_us IS NOT NULL GROUP BY 1),
          |pm AS (
          |  SELECT user_id, CAST(max(cnt) AS BIGINT) AS max_per_min FROM (
          |    SELECT user_id, count(*) AS cnt FROM events
          |    GROUP BY user_id, time_bucket(INTERVAL '1 minute', ts))
          |  GROUP BY 1),
          |dup AS (
          |  SELECT user_id, CAST(sum(c - 1) AS BIGINT) AS dup_ts FROM (
          |    SELECT user_id, ts, count(*) AS c FROM events
          |    GROUP BY user_id, ts)
          |  GROUP BY 1)
          |SELECT mg.user_id, mg.min_gap_us, pm.max_per_min, dup.dup_ts,
          |  CAST(CASE WHEN mg.min_gap_us < 5000000 OR pm.max_per_min > 5
          |    OR dup.dup_ts > 0 THEN 1 ELSE 0 END AS BIGINT) AS bot_flag
          |FROM mg JOIN pm ON mg.user_id = pm.user_id
          |        JOIN dup ON mg.user_id = dup.user_id
          |ORDER BY mg.user_id""".stripMargin),
      (s, dir) => {
        val ev = H.events(s, dir)
        val g = ev
          .withColumn("gap_us",
            unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(
              Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
        val mg = g.filter(col("gap_us").isNotNull)
          .groupBy("user_id").agg(min("gap_us").cast("long").as("min_gap_us"))
        val pm = ev
          .groupBy(col("user_id"),
            date_trunc("minute", col("ts")).as("minute"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy("user_id").agg(max("cnt").cast("long").as("max_per_min"))
        val dup = ev.groupBy("user_id", "ts").agg(count(lit(1)).as("c"))
          .groupBy("user_id")
          .agg(sum(col("c") - 1).cast("long").as("dup_ts"))
        mg.join(pm, Seq("user_id")).join(dup, Seq("user_id"))
          .select(col("user_id"), col("min_gap_us"), col("max_per_min"),
            col("dup_ts"),
            when(col("min_gap_us") < 5000000L || col("max_per_min") > 5 ||
              col("dup_ts") > 0, 1L).otherwise(0L).cast("long")
              .as("bot_flag"))
          .orderBy("user_id")
      }),

    // COHORT REVENUE MATRIX: customers cohorted by first-order year,
    // revenue tracked by years-since-first — the retention economics
    // view (distinct from events_retention's user-day activity form).
    // First-order year is one min-window over the per-customer order
    // stream; the matrix reduce runs on |cohorts|×|ages| cells with
    // DECIMAL-exact revenue.
    Q("orders_cohort_revenue",
      Some(
        """WITH fo AS (
          |  SELECT o_custkey, min(CAST(strftime(o_orderdate, '%Y')
          |    AS BIGINT)) AS cohort
          |  FROM orders GROUP BY 1),
          |j AS (
          |  SELECT fo.cohort,
          |    CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) - fo.cohort
          |      AS age,
          |    o.o_totalprice AS price
          |  FROM orders o JOIN fo ON o.o_custkey = fo.o_custkey)
          |SELECT cohort, CAST(age AS BIGINT) AS age,
          |  CAST(count(*) AS BIGINT) AS n_orders,
          |  CAST(sum(CAST(price AS DECIMAL(12,2))) AS DOUBLE) AS revenue
          |FROM j GROUP BY 1, 2 ORDER BY cohort, age""".stripMargin),
      (s, dir) => {
        val o = tbl(s, dir, "orders")
        val fo = o.groupBy("o_custkey")
          .agg(min(date_format(col("o_orderdate"), "yyyy").cast("long"))
            .as("cohort"))
        o.join(fo, Seq("o_custkey"))
          .select(col("cohort"),
            (date_format(col("o_orderdate"), "yyyy").cast("long") -
              col("cohort")).as("age"),
            col("o_totalprice"))
          .groupBy("cohort", "age")
          .agg(count(lit(1)).as("n_orders"),
            H.sumMoney(col("o_totalprice")).as("revenue"))
          .orderBy("cohort", "age")
      })
  )
}
