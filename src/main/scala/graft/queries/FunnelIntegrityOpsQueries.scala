package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Hundred-second wave: curation accounting, embedding geometry, and
  * operational identities — the filter-funnel report (how many docs
  * each curation stage drops, in order), embedding-space isotropy from
  * exact milli moments, Little's law verified as an EXACT identity
  * (time-integrated backlog == summed residence, computed two
  * independent ways), and the Grubbs max-deviation outlier test on
  * daily revenue.
  *
  * Exactness: funnel stages are boolean integer flags evaluated in one
  * scan with keep-first dedup as the last stage; isotropy is
  * 1 − ‖mean‖²/E‖x‖² assembled from HUGEINT/DECIMAL milli sums with
  * one final chain; both Little's-law sides are pure integer day
  * counts; Grubbs' G is one micro-floored chain over exact moments.
  */
object FunnelIntegrityOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Filter-funnel accounting: the four standard curation gates
    // applied IN ORDER (length ≥ 200 chars, language in the serving
    // set, quality = alpha-ratio proxy ≥ 25%, exact-content keep-first
    // dedup), each stage counting survivors and drops attributable to
    // IT (not to earlier stages). One scan computes every flag; the
    // dedup stage is a keep-first window over content hash among docs
    // that passed everything else. The report every corpus release
    // ships with — where did the other 40% go?
    Q("pipeline_filter_funnel",
      Some(
        """WITH f AS (SELECT doc_id, md5(text) AS h,
          |  CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS f_len,
          |  CASE WHEN lang IN ('en', 'de', 'fr', 'es', 'ja') THEN 1
          |    ELSE 0 END AS f_lang,
          |  CASE WHEN length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
          |    * 4 >= length(text) THEN 1 ELSE 0 END AS f_qual
          |  FROM documents),
          |d AS (SELECT doc_id, f_len, f_lang, f_qual,
          |  CASE WHEN f_len = 1 AND f_lang = 1 AND f_qual = 1 THEN
          |    CASE WHEN row_number() OVER (PARTITION BY h,
          |      (f_len = 1 AND f_lang = 1 AND f_qual = 1)
          |      ORDER BY doc_id) = 1 THEN 1 ELSE 0 END
          |  ELSE 0 END AS f_dedup FROM f),
          |g AS (SELECT CAST(count(*) AS BIGINT) AS n0,
          |  CAST(sum(f_len) AS BIGINT) AS n1,
          |  CAST(sum(f_len * f_lang) AS BIGINT) AS n2,
          |  CAST(sum(f_len * f_lang * f_qual) AS BIGINT) AS n3,
          |  CAST(sum(f_dedup) AS BIGINT) AS n4 FROM d)
          |SELECT stage, survivors, dropped FROM (
          |  SELECT '0_ingest' AS stage, n0 AS survivors,
          |    CAST(0 AS BIGINT) AS dropped, 0 AS ord FROM g
          |  UNION ALL SELECT '1_length', n1, n0 - n1, 1 FROM g
          |  UNION ALL SELECT '2_language', n2, n1 - n2, 2 FROM g
          |  UNION ALL SELECT '3_quality', n3, n2 - n3, 3 FROM g
          |  UNION ALL SELECT '4_dedup', n4, n3 - n4, 4 FROM g)
          |ORDER BY ord
          |""".stripMargin),
      (s, dir) => {
        val f = tbl(s, dir, "documents")
          .select(col("doc_id"), md5(col("text")).as("h"),
            when(col("n_chars") >= 200, 1).otherwise(0).as("f_len"),
            when(col("lang").isin("en", "de", "fr", "es", "ja"), 1)
              .otherwise(0).as("f_lang"),
            when(length(regexp_replace(col("text"), "[^a-zA-Z]", "")) *
              4 >= length(col("text")), 1).otherwise(0).as("f_qual"))
        val pass = col("f_len") === 1 && col("f_lang") === 1 &&
          col("f_qual") === 1
        val d = f.withColumn("f_dedup",
          when(pass, when(row_number().over(
            Window.partitionBy(col("h"), pass).orderBy("doc_id")) === 1,
            1).otherwise(0)).otherwise(0))
        val g = d.agg(count(lit(1)).cast("long").as("n0"),
          sum(col("f_len")).cast("long").as("n1"),
          sum(col("f_len") * col("f_lang")).cast("long").as("n2"),
          sum(col("f_len") * col("f_lang") * col("f_qual")).cast("long")
            .as("n3"),
          sum(col("f_dedup")).cast("long").as("n4"))
        def st(name: String, ord: Int, sv: String, dr: String) =
          g.select(lit(name).as("stage"), expr(sv).cast("long")
            .as("survivors"), expr(dr).cast("long").as("dropped"),
            lit(ord).as("ord"))
        st("0_ingest", 0, "n0", "CAST(0 AS BIGINT)")
          .unionByName(st("1_length", 1, "n1", "n0 - n1"))
          .unionByName(st("2_language", 2, "n2", "n1 - n2"))
          .unionByName(st("3_quality", 3, "n3", "n2 - n3"))
          .unionByName(st("4_dedup", 4, "n4", "n3 - n4"))
          .orderBy("ord").drop("ord")
      }),

    // Embedding isotropy: 1 − ‖x̄‖²/E‖x‖² — a perfectly isotropic
    // (direction-balanced) space scores 1, a collapsed one 0. Elements
    // quantize to milli; both quadratic forms assemble from
    // (Σx)² / n² and Σ‖x‖²/n in HUGEINT/DECIMAL with ONE final micro
    // chain. Anisotropy is the classic failure of contrastive
    // embeddings — this is the one-number audit before any cosine is
    // trusted at scale.
    Q("emb_isotropy",
      Some(
        """WITH e AS (SELECT vec_id,
          |  CAST(floor(unnest(embedding)::DOUBLE * 1000 + 0.5)
          |    AS BIGINT) AS x,
          |  generate_subscripts(embedding, 1) AS j
          |  FROM embeddings),
          |pd AS (SELECT j, CAST(sum(x) AS BIGINT) AS sx FROM e
          |  GROUP BY 1),
          |nrm AS (SELECT CAST(sum(CAST(x AS HUGEINT) * x) AS VARCHAR)
          |    AS q2 FROM e),
          |n AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM embeddings),
          |mu AS (SELECT CAST(sum(CAST(sx AS HUGEINT) * sx) AS VARCHAR)
          |    AS m2 FROM pd)
          |SELECT n.nv AS n_vectors, mu.m2 AS mean_num, nrm.q2 AS sq_num,
          |  CAST(floor((1.0 - (CAST(mu.m2 AS DOUBLE)
          |    / (CAST(n.nv AS DOUBLE) * CAST(n.nv AS DOUBLE)))
          |    / (CAST(nrm.q2 AS DOUBLE) / CAST(n.nv AS DOUBLE)))
          |    * 1000000.0) AS BIGINT) AS isotropy_micro
          |FROM n, mu, nrm
          |""".stripMargin),
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), posexplode(col("embedding")))
          .select(col("pos").as("j"),
            floor(col("col").cast("double") * 1000 + lit(0.5))
              .cast("long").as("x"))
        val pd = e.groupBy("j").agg(sum(col("x")).cast("long").as("sx"))
        val nrm = e.agg(sum(col("x").cast("decimal(38,0)") * col("x"))
          .cast("decimal(38,0)").cast("string").as("q2"))
        val n = tbl(s, dir, "embeddings")
          .agg(count(lit(1)).cast("long").as("nv"))
        val mu = pd.agg(sum(col("sx").cast("decimal(38,0)") * col("sx"))
          .cast("decimal(38,0)").cast("string").as("m2"))
        n.crossJoin(broadcast(mu)).crossJoin(broadcast(nrm))
          .select(col("nv").as("n_vectors"), col("m2").as("mean_num"),
            col("q2").as("sq_num"),
            floor((lit(1.0d) - (col("m2").cast("double") /
              (col("nv").cast("double") * col("nv").cast("double"))) /
              (col("q2").cast("double") / col("nv").cast("double"))) *
              1000000.0d).cast("long").as("isotropy_micro"))
      }),

    // Little's law as an EXACT identity: for finished orders, the
    // time-integrated backlog (Σ over days of how many F-orders are
    // open that day, via interval delta counting + cumulative spine)
    // must equal the summed residence days (Σ close−open per order) —
    // two INDEPENDENT computations, one integer equality. A failed
    // check means the interval counting (the machinery behind every
    // backlog/concurrency query here) is broken; L̄ = λ·W̄ falls out in
    // milli as the operational reading.
    Q("orders_little_law",
      Some(
        """WITH f AS (SELECT o.o_orderkey,
          |  CAST(date_diff('day', TIMESTAMP '1992-01-01', o.o_orderdate)
          |    AS BIGINT) AS d0,
          |  CAST(date_diff('day', TIMESTAMP '1992-01-01', x.ms)
          |    AS BIGINT) + 1 AS d1
          |  FROM orders o JOIN (SELECT l_orderkey, max(l_shipdate) AS ms
          |    FROM lineitem GROUP BY 1) x ON x.l_orderkey = o.o_orderkey
          |  WHERE o.o_orderstatus = 'F'),
          |res AS (SELECT CAST(count(*) AS BIGINT) AS n_orders,
          |  CAST(sum(d1 - d0) AS BIGINT) AS resid_days FROM f),
          |dl AS (SELECT d0 AS d, CAST(count(*) AS BIGINT) AS dn FROM f
          |  GROUP BY 1
          |  UNION ALL SELECT d1, -CAST(count(*) AS BIGINT) FROM f
          |  GROUP BY 1),
          |dl2 AS (SELECT d, CAST(sum(dn) AS BIGINT) AS dn FROM dl
          |  GROUP BY 1),
          |sp AS (SELECT d, CAST(sum(dn) OVER (ORDER BY d
          |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog,
          |  CAST(coalesce(lead(d) OVER (ORDER BY d) - d, 0) AS BIGINT)
          |    AS span
          |  FROM dl2),
          |intg AS (SELECT CAST(sum(backlog * span) AS BIGINT) AS ldays
          |  FROM sp)
          |SELECT res.n_orders, res.resid_days, intg.ldays
          |    AS integrated_backlog_days,
          |  CAST(CASE WHEN res.resid_days = intg.ldays THEN 1 ELSE 0
          |    END AS BIGINT) AS identity_holds,
          |  CAST(res.resid_days * 1000 // res.n_orders AS BIGINT)
          |    AS mean_residence_milli_days
          |FROM res, intg
          |""".stripMargin),
      (s, dir) => {
        val f = tbl(s, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"),
            datediff(col("o_orderdate"),
              to_timestamp(lit("1992-01-01 00:00:00"))).cast("long")
              .as("d0"))
          .join(tbl(s, dir, "lineitem")
              .groupBy(col("l_orderkey"))
              .agg(max(col("l_shipdate")).as("ms")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("d0"),
            (datediff(col("ms"),
              to_timestamp(lit("1992-01-01 00:00:00"))).cast("long") + 1)
              .as("d1"))
          .localCheckpoint()
        val res = f.agg(count(lit(1)).cast("long").as("n_orders"),
          sum(col("d1") - col("d0")).cast("long").as("resid_days"))
        val dl = f.groupBy(col("d0").as("d"))
          .agg(count(lit(1)).cast("long").as("dn"))
          .unionByName(f.groupBy(col("d1").as("d"))
            .agg((-count(lit(1))).cast("long").as("dn")))
          .groupBy("d").agg(sum(col("dn")).cast("long").as("dn"))
        val wd = Window.orderBy("d")
        val sp = dl
          .withColumn("backlog", sum(col("dn")).over(
            wd.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
          .withColumn("span",
            coalesce(lead("d", 1).over(wd) - col("d"), lit(0L))
              .cast("long"))
        val intg = sp.agg(sum(col("backlog") * col("span")).cast("long")
          .as("ldays"))
        val out = res.crossJoin(broadcast(intg))
          .select(col("n_orders"), col("resid_days"),
            col("ldays").as("integrated_backlog_days"),
            when(col("resid_days") === col("ldays"), 1L).otherwise(0L)
              .cast("long").as("identity_holds"),
            expr("resid_days * 1000 div n_orders").cast("long")
              .as("mean_residence_milli_days"))
        H.materialized(out, Nil, Seq(f))
      }),

    // Grubbs' max-deviation test on daily revenue: G = max|x − x̄|/s
    // in micro from exact integer moments (one chain), plus which day
    // and the two-sided 5% critical value for n (the t-based closed
    // form, same fixed chain in both engines). The single-outlier
    // gate a metrics pipeline runs before trusting a daily total.
    Q("stats_grubbs_test",
      Some(
        """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
          |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) // 100000 AS kd
          |  FROM orders GROUP BY 1),
          |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(kd) AS BIGINT) AS s,
          |  CAST(sum(kd*kd) AS BIGINT) AS q FROM d),
          |g AS (SELECT d.day, d.kd, m.n, m.s, m.q,
          |  abs(d.kd * m.n - m.s) AS dev_n
          |  FROM d, m),
          |top AS (SELECT day, kd, n, s, q, dev_n FROM g
          |  ORDER BY dev_n DESC, day LIMIT 1)
          |SELECT strftime(day, '%Y-%m-%d') AS outlier_day, kd AS value_kd,
          |  n AS n_days,
          |  CAST(floor(CAST(dev_n AS DOUBLE) / CAST(n AS DOUBLE)
          |    / sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
          |      * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          |      / (CAST(n AS DOUBLE) - 1.0)) * 1000000.0) AS BIGINT)
          |    AS g_micro
          |FROM top
          |""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(expr("CAST(sum(CAST(floor(o_totalprice*100 + 0.5)" +
            " AS BIGINT)) AS BIGINT) div 100000").as("kd"))
        val m = d.agg(count(lit(1)).cast("long").as("n"),
          sum(col("kd")).cast("long").as("s"),
          sum(col("kd") * col("kd")).cast("long").as("q"))
        d.crossJoin(broadcast(m))
          .withColumn("dev_n", abs(col("kd") * col("n") - col("s")))
          .orderBy(col("dev_n").desc, col("day")).limit(1)
          .select(date_format(col("day"), "yyyy-MM-dd")
            .as("outlier_day"),
            col("kd").as("value_kd"), col("n").as("n_days"),
            floor(col("dev_n").cast("double") / col("n").cast("double") /
              sqrt((col("q").cast("double") - col("s").cast("double") *
                col("s").cast("double") / col("n").cast("double")) /
                (col("n").cast("double") - 1.0d)) * 1000000.0d)
              .cast("long").as("g_micro"))
      })
  )
}
