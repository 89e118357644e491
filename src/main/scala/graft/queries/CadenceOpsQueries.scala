package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Hundred-twenty-second wave: cadence, intrinsic dimension, and the
  * aggregation law — customer purchase-cadence regularity (CV of
  * inter-order gaps, banded: metronomes vs bursts), the TwoNN
  * intrinsic-dimension estimate of the embedding space (how many
  * dimensions the data actually uses, vs the 64 it's stored in), and
  * the CV shrink law across daily/weekly/monthly aggregation (iid
  * predicts 1/√n; the measured deviation IS the autocorrelation).
  *
  * Exactness: gaps are integer days with exact moment CVs per
  * customer; TwoNN anchors are a deterministic id sample whose top-2
  * neighbor distances come from integer SSDs, each ln ratio
  * micro-floored pre-sum; the aggregation law compares integer-moment
  * CVs cross-multiplied into milli.
  */
object CadenceOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Purchase-cadence regularity: per customer with ≥ 5 orders, the
    // CV of inter-order gaps (exact integer moments, one chain),
    // banded from metronome (CV < 0.5) to bursty (CV > 1.5). Cadence
    // tells retention campaigns WHEN to fire; this census tells you
    // whether cadence even exists.
    Q("orders_cadence_regularity",
      Some(
        """WITH d AS (SELECT o_custkey AS ck,
          |  CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
          |    AS BIGINT) AS t FROM orders),
          |g AS (SELECT ck, t - lag(t) OVER (PARTITION BY ck ORDER BY t)
          |    AS gap FROM d),
          |m AS (SELECT ck, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(gap) AS BIGINT) AS s,
          |  sum(CAST(gap AS HUGEINT)*gap) AS q FROM g
          |  WHERE gap IS NOT NULL GROUP BY 1
          |  HAVING count(*) >= 4 AND sum(gap) > 0),
          |cv AS (SELECT ck,
          |  CAST(floor(sqrt((CAST(q AS DOUBLE)*CAST(n AS DOUBLE)
          |    - CAST(s AS DOUBLE)*CAST(s AS DOUBLE))
          |    / (CAST(n AS DOUBLE) - 1.0)) / CAST(s AS DOUBLE)
          |    * 1000.0) AS BIGINT) AS cv_milli FROM m),
          |k AS (SELECT CASE WHEN cv_milli < 500 THEN 'a_metronome'
          |  WHEN cv_milli < 1000 THEN 'b_regular'
          |  WHEN cv_milli < 1500 THEN 'c_loose'
          |  ELSE 'd_bursty' END AS band FROM cv)
          |SELECT band, CAST(count(*) AS BIGINT) AS n_customers,
          |  CAST(count(*) * 10000 // (SELECT count(*) FROM k)
          |    AS BIGINT) AS share_bps
          |FROM k GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "orders")
          .select(col("o_custkey").as("ck"),
            datediff(col("o_orderdate"),
              to_timestamp(lit("1992-01-01 00:00:00"))).cast("long")
              .as("t"))
        val g = d.withColumn("gap",
          col("t") - lag("t", 1).over(
            Window.partitionBy("ck").orderBy("t")))
          .filter(col("gap").isNotNull)
        val m = g.groupBy("ck")
          .agg(count(lit(1)).cast("long").as("n"),
            sum(col("gap")).cast("long").as("s"),
            sum(col("gap").cast("decimal(38,0)") * col("gap"))
              .cast("decimal(38,0)").as("q"))
          .filter(col("n") >= 4 && col("s") > 0)
        val k = m.select(
          floor(sqrt((col("q").cast("double") * col("n").cast("double")
            - col("s").cast("double") * col("s").cast("double")) /
            (col("n").cast("double") - 1.0d)) /
            col("s").cast("double") * 1000.0d).cast("long")
            .as("cv_milli"))
          .select(when(col("cv_milli") < 500, "a_metronome")
            .when(col("cv_milli") < 1000, "b_regular")
            .when(col("cv_milli") < 1500, "c_loose")
            .otherwise("d_bursty").as("band"))
          .localCheckpoint()
        val tot = k.agg(count(lit(1)).cast("long").as("tk"))
        val out = k.groupBy("band")
          .agg(count(lit(1)).cast("long").as("n_customers"))
          .crossJoin(broadcast(tot))
          .select(col("band"), col("n_customers"),
            expr("n_customers * 10000 div tk").cast("long")
              .as("share_bps"))
          .orderBy("band")
        H.materialized(out, Nil, Seq(k))
      }),

    // TwoNN intrinsic dimension: for 500 deterministic anchor vectors,
    // the ratio of 2nd- to 1st-nearest-neighbor distance; ID ≈
    // n / Σ ln(r2/r1). Embeddings stored in 64 dims often LIVE on a
    // ~10-dim manifold — ID prices how much PQ/MRL compression is
    // actually free. Anchor×corpus scan is linear in the corpus; the
    // ln ratios floor to micro pre-sum.
    Q("emb_intrinsic_dim",
      Some("WITH e AS (SELECT vec_id, " +
        "list_transform(embedding, x -> CAST(floor(x::DOUBLE * 1000 " +
        "+ 0.5) AS BIGINT)) AS v FROM embeddings), " +
        "a AS (SELECT vec_id AS aid, v AS av FROM e " +
        "WHERE vec_id < 500), " +
        "d AS (SELECT a.aid, " +
        "list_sum(list_transform(list_zip(a.av, e.v), " +
        "x -> (x[1] - x[2]) * (x[1] - x[2]))) AS d2, e.vec_id " +
        "FROM a JOIN e ON e.vec_id <> a.aid), " +
        "r AS (SELECT aid, d2, row_number() OVER (PARTITION BY aid " +
        "ORDER BY d2, vec_id) AS rk FROM d), " +
        "p AS (SELECT r1.aid, r1.d2 AS r1d, r2.d2 AS r2d " +
        "FROM (SELECT aid, d2 FROM r WHERE rk = 1) r1 " +
        "JOIN (SELECT aid, d2 FROM r WHERE rk = 2) r2 " +
        "ON r2.aid = r1.aid WHERE r1.d2 > 0), " +
        "t AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(floor(0.5 * ln(CAST(r2d AS DOUBLE) " +
        "/ CAST(r1d AS DOUBLE)) * 1000000.0) AS BIGINT)) AS BIGINT) " +
        "AS slnr_micro FROM p) " +
        "SELECT n AS n_anchors, slnr_micro, " +
        "CAST(n * 1000000000000 // slnr_micro // 1000 AS BIGINT) " +
        "AS intrinsic_dim_milli FROM t"),
      (s, dir) => {
        import graft.functions.{CustomExpressions => CE}
        // milli-int VALUES carried as doubles: squares ≤ 4e6 and sums
        // ≤ 2.6e8 are exact in double, so the fused native distance is
        // bit-identical to the oracle's integer arithmetic — and
        // codegen'd, unlike an interpreted zip_with lambda (4× faster
        // here)
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)" +
              " * 1000 + 0.5) AS DOUBLE))").as("v"))
          .localCheckpoint()
        val a = e.filter(col("vec_id") < 500)
          .select(col("vec_id").as("aid"), col("v").as("av"))
        val d = e.join(broadcast(a), col("vec_id") =!= col("aid"))
          .select(col("aid"), col("vec_id"),
            CE.squared_distance(col("av"), col("v")).cast("long")
              .as("d2"))
        val r = d.withColumn("rk", row_number().over(
          Window.partitionBy("aid").orderBy("d2", "vec_id")))
          .filter(col("rk") <= 2)
        val p = r.filter(col("rk") === 1)
          .select(col("aid"), col("d2").as("r1d"))
          .join(r.filter(col("rk") === 2)
            .select(col("aid").as("aid2"), col("d2").as("r2d")),
            col("aid") === col("aid2"))
          .filter(col("r1d") > 0)
        p.agg(count(lit(1)).cast("long").as("n"),
            sum(floor(lit(0.5d) * log(col("r2d").cast("double") /
              col("r1d").cast("double")) * 1000000.0d).cast("long"))
              .cast("long").as("slnr_micro"))
          .select(col("n").as("n_anchors"), col("slnr_micro"),
            expr("n * 1000000000000 div slnr_micro div 1000")
              .cast("long").as("intrinsic_dim_milli"))
      }),

    // CV aggregation law: revenue CV at daily, weekly, and monthly
    // grain. Under iid days, weekly CV ≈ daily/√7 and monthly ≈
    // daily/√30 — the measured ratio vs that prediction (milli) is a
    // direct read on temporal correlation, and on how much window
    // size really buys a forecaster. Three keyed aggregations, exact
    // moments, cross-multiplied ratios.
    Q("ts_cv_aggregation_law",
      Some {
        def cv(src: String) =
          s"""(SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(kd) AS BIGINT) AS s,
             |  sum(CAST(kd AS HUGEINT)*kd) AS q FROM $src)""".stripMargin
        """WITH base AS (SELECT CAST(o_orderdate AS DATE) AS day,
          |  year(o_orderdate)*100 + weekofyear(o_orderdate) AS wk,
          |  year(o_orderdate)*12 + month(o_orderdate) AS mon,
          |  CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
          |  FROM orders),
          |dd AS (SELECT day, CAST(sum(cents) AS BIGINT) // 100000 AS kd
          |  FROM base GROUP BY 1),
          |ww AS (SELECT wk, CAST(sum(cents) AS BIGINT) // 100000 AS kd
          |  FROM base GROUP BY 1),
          |mm AS (SELECT mon, CAST(sum(cents) AS BIGINT) // 100000 AS kd
          |  FROM base GROUP BY 1),
          |cvd AS """.stripMargin + cv("dd") + """,
          |cvw AS """.stripMargin + cv("ww") + """,
          |cvm AS """.stripMargin + cv("mm") + """,
          |f AS (SELECT
          |  sqrt((CAST(cvd.q AS DOUBLE)*CAST(cvd.n AS DOUBLE)
          |    - CAST(cvd.s AS DOUBLE)*CAST(cvd.s AS DOUBLE)))
          |    / CAST(cvd.s AS DOUBLE) AS cv_d,
          |  sqrt((CAST(cvw.q AS DOUBLE)*CAST(cvw.n AS DOUBLE)
          |    - CAST(cvw.s AS DOUBLE)*CAST(cvw.s AS DOUBLE)))
          |    / CAST(cvw.s AS DOUBLE) AS cv_w,
          |  sqrt((CAST(cvm.q AS DOUBLE)*CAST(cvm.n AS DOUBLE)
          |    - CAST(cvm.s AS DOUBLE)*CAST(cvm.s AS DOUBLE)))
          |    / CAST(cvm.s AS DOUBLE) AS cv_m
          |  FROM cvd, cvw, cvm)
          |SELECT CAST(floor(cv_d * 1000.0) AS BIGINT) AS cv_daily_milli,
          |  CAST(floor(cv_w * 1000.0) AS BIGINT) AS cv_weekly_milli,
          |  CAST(floor(cv_m * 1000.0) AS BIGINT) AS cv_monthly_milli,
          |  CAST(floor(cv_d / cv_w / sqrt(7.0) * 1000.0) AS BIGINT)
          |    AS weekly_vs_iid_milli,
          |  CAST(floor(cv_d / cv_m / sqrt(30.0) * 1000.0) AS BIGINT)
          |    AS monthly_vs_iid_milli
          |FROM f
          |""".stripMargin
      },
      (s, dir) => {
        val base = tbl(s, dir, "orders")
          .select(col("o_orderdate").cast("date").as("day"),
            (year(col("o_orderdate")) * 100 +
              weekofyear(col("o_orderdate"))).as("wk"),
            (year(col("o_orderdate")) * 12 +
              month(col("o_orderdate"))).as("mon"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
              .as("cents"))
          .localCheckpoint()
        def grain(key: String) = base.groupBy(key)
          .agg(expr("CAST(sum(cents) AS BIGINT) div 100000").as("kd"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(col("kd")).cast("long").as("s"),
            sum(col("kd").cast("decimal(38,0)") * col("kd"))
              .cast("decimal(38,0)").as("q"))
        def cvCol(pfx: String) =
          sqrt(col(s"${pfx}q").cast("double") *
            col(s"${pfx}n").cast("double") -
            col(s"${pfx}s").cast("double") *
              col(s"${pfx}s").cast("double")) /
            col(s"${pfx}s").cast("double")
        val j = grain("day")
          .select(col("n").as("dn"), col("s").as("ds"),
            col("q").as("dq"))
          .crossJoin(broadcast(grain("wk")
            .select(col("n").as("wn"), col("s").as("ws"),
              col("q").as("wq"))))
          .crossJoin(broadcast(grain("mon")
            .select(col("n").as("mn"), col("s").as("ms"),
              col("q").as("mq"))))
        j.select(
          floor(cvCol("d") * 1000.0d).cast("long").as("cv_daily_milli"),
          floor(cvCol("w") * 1000.0d).cast("long")
            .as("cv_weekly_milli"),
          floor(cvCol("m") * 1000.0d).cast("long")
            .as("cv_monthly_milli"),
          floor(cvCol("d") / cvCol("w") / sqrt(lit(7.0d)) * 1000.0d)
            .cast("long").as("weekly_vs_iid_milli"),
          floor(cvCol("d") / cvCol("m") / sqrt(lit(30.0d)) * 1000.0d)
            .cast("long").as("monthly_vs_iid_milli"))
      })
  )
}
