package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-11 wave 186: UNSUPERVISED Fellegi-Sunter parameter estimation
  * by EM over the comparison-pattern census — the Splink shape. The
  * labeled `er_fellegi_sunter` computes m/u from ground truth; in
  * production no truth exists, and EM recovers (λ, m_k, u_k) from the 8
  * pattern counts alone. This query runs EM on the SAME instance
  * (FellegiRecEvalOpsQueries.dirtySql fixture — one definition) and then
  * grades itself against the by-construction truth the fixture hides.
  *
  * The per-iteration arithmetic is ONE Scala string template used
  * verbatim by the DuckDB oracle and the Spark expr() side, the
  * clf_logreg_train discipline.
  */
object ErEmOpsQueries extends QueryModule {

  /** E-step responsibilities as SQL over columns (f1,f2,f3,n) × params
    * (lam, m1, m2, m3, u1, u2, u3). */
  private def prodSql(p: String): String =
    Seq(1, 2, 3).map(k =>
      s"(CASE WHEN f$k = 1 THEN $p$k ELSE 1.0 - $p$k END)").mkString(" * ")
  private val wSql: String =
    s"(lam * ${prodSql("m")}) / (lam * ${prodSql("m")}" +
      s" + (1.0 - lam) * ${prodSql("u")})"

  /** M-step: new params from Σ over the 8 patterns. */
  private val mStepSums: String =
    """sum(n * w) AS sw, sum(n) AS tot,
      |sum(n * w * f1) AS a1, sum(n * w * f2) AS a2, sum(n * w * f3) AS a3,
      |sum(n * (1.0 - w) * f1) AS b1, sum(n * (1.0 - w) * f2) AS b2,
      |sum(n * (1.0 - w) * f3) AS b3""".stripMargin
  private val mStepSolve: Seq[(String, String)] = Seq(
    "lam" -> "sw / tot",
    "m1" -> "a1 / sw", "m2" -> "a2 / sw", "m3" -> "a3 / sw",
    "u1" -> "b1 / (tot - sw)", "u2" -> "b2 / (tot - sw)",
    "u3" -> "b3 / (tot - sw)")

  def all: Seq[Q] = Seq(

    // (Fixture note: f1 — full-name equality — never fires: every
    // corruption mode alters the name, so EM must drive m1 → 0, which it
    // does; the informative features are f2/f3, reported against truth.
    // The output's point is the honest EM-vs-truth gap: the u's come
    // back near-exact (u2 0.0569 vs 0.0558), while λ lands at 0.129 vs
    // a true prevalence of 0.199 — EM's latent class is "f2∧f3 agree",
    // and the mode-0 corruption (17th char swapped) removes f2 from a
    // third of true matches, which EM then conflates with non-matches.
    // That failure mode is exactly what a linkage shop must know before
    // trusting unsupervised calibration.)
    // EM over the bounded 8-row pattern census: one fact-sized blocked
    // join + pattern reduce (the er_fellegi_sunter shape), then 5
    // unrolled EM rounds of domain-sized arithmetic (8 rows × a
    // broadcast 1-row parameter frame). Output: the EM estimates next
    // to the labeled-truth ppm censuses — the judge of whether
    // unsupervised linkage calibration actually recovered the fixture.
    Q("er_fellegi_sunter_em",
      Some {
        def round(prev: String, out: String) =
          s"""${out}_s AS (SELECT ${mStepSums.replace("\n", " ")}
             |  FROM (SELECT pat.*, $wSql AS w FROM pat, $prev)),
             |$out AS (SELECT ${mStepSolve.map { case (nm, e) =>
                 s"$e AS $nm" }.mkString(", ")}
             |  FROM ${out}_s)""".stripMargin
        s"""WITH dirty AS (SELECT c_custkey AS d_key,
           |    c_nationkey AS d_nat,
           |    ${FellegiRecEvalOpsQueries.dirtySql} AS d_name,
           |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS d_band
           |  FROM customer),
           |cand AS (SELECT d.d_key, c.c_custkey,
           |    CASE WHEN d.d_name = c.c_name THEN 1 ELSE 0 END AS f1,
           |    CASE WHEN substr(d.d_name, 1, 17) = substr(c.c_name, 1, 17)
           |      THEN 1 ELSE 0 END AS f2,
           |    CASE WHEN d.d_band = CAST(floor(c.c_acctbal / 1000.0)
           |      AS BIGINT) THEN 1 ELSE 0 END AS f3,
           |    CASE WHEN d.d_key = c.c_custkey THEN 1 ELSE 0 END AS lab
           |  FROM dirty d JOIN customer c
           |    ON c.c_nationkey = d.d_nat
           |    AND substr(c.c_name, 1, 16) = substr(d.d_name, 1, 16)),
           |pat AS (SELECT f1, f2, f3, CAST(count(*) AS DOUBLE) AS n
           |  FROM cand GROUP BY 1, 2, 3),
           |em0 AS (SELECT 0.1 AS lam, 0.9 AS m1, 0.9 AS m2, 0.9 AS m3,
           |  0.1 AS u1, 0.1 AS u2, 0.1 AS u3),
           |${round("em0", "em1")},
           |${round("em1", "em2")},
           |${round("em2", "em3")},
           |${round("em3", "em4")},
           |${round("em4", "em5")},
           |truth AS (SELECT
           |    CAST(sum(lab) AS BIGINT) AS nm,
           |    CAST(sum(1 - lab) AS BIGINT) AS nu,
           |    CAST(sum(f2 * lab) AS BIGINT) AS t2,
           |    CAST(sum(f2 * (1 - lab)) AS BIGINT) AS s2,
           |    CAST(sum(f3 * lab) AS BIGINT) AS t3,
           |    CAST(sum(f3 * (1 - lab)) AS BIGINT) AS s3
           |  FROM cand)
           |SELECT
           |  CAST((SELECT CAST(sum(n) AS BIGINT) FROM pat) AS BIGINT)
           |    AS n_pairs,
           |  CAST(floor(em5.lam * 1000000 + 0.5) AS BIGINT) AS lam_micro,
           |  CAST(floor(em5.m1 * 1000000 + 0.5) AS BIGINT) AS m1_micro,
           |  CAST(floor(em5.m2 * 1000000 + 0.5) AS BIGINT) AS m2_micro,
           |  CAST(floor(em5.m3 * 1000000 + 0.5) AS BIGINT) AS m3_micro,
           |  CAST(floor(em5.u1 * 1000000 + 0.5) AS BIGINT) AS u1_micro,
           |  CAST(floor(em5.u2 * 1000000 + 0.5) AS BIGINT) AS u2_micro,
           |  CAST(floor(em5.u3 * 1000000 + 0.5) AS BIGINT) AS u3_micro,
           |  CAST(truth.nm * 1000000 // (truth.nm + truth.nu) AS BIGINT)
           |    AS true_prevalence_micro,
           |  CAST(truth.t2 * 1000000 // truth.nm AS BIGINT)
           |    AS true_m2_micro,
           |  CAST(truth.s2 * 1000000 // truth.nu AS BIGINT)
           |    AS true_u2_micro,
           |  CAST(truth.t3 * 1000000 // truth.nm AS BIGINT)
           |    AS true_m3_micro,
           |  CAST(truth.s3 * 1000000 // truth.nu AS BIGINT)
           |    AS true_u3_micro
           |FROM em5, truth
           |""".stripMargin
      },
      (s, dir) => {
        val cust = tbl(s, dir, "customer")
        val dirty = cust.select(col("c_custkey").as("d_key"),
          col("c_nationkey").as("d_nat"),
          FellegiRecEvalOpsQueries.dirtyCol.as("d_name"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("d_band"))
        val cand = dirty.join(cust,
            col("c_nationkey") === col("d_nat") &&
              substring(col("c_name"), 1, 16) ===
                substring(col("d_name"), 1, 16))
          .select(
            when(col("d_name") === col("c_name"), 1).otherwise(0).as("f1"),
            when(substring(col("d_name"), 1, 17) ===
              substring(col("c_name"), 1, 17), 1).otherwise(0).as("f2"),
            when(col("d_band") ===
              floor(col("c_acctbal") / 1000.0).cast("long"), 1)
              .otherwise(0).as("f3"),
            when(col("d_key") === col("c_custkey"), 1).otherwise(0)
              .as("lab"))
          .localCheckpoint() // pattern census + truth census read it
        val pat = cand.groupBy("f1", "f2", "f3")
          .agg(count(lit(1)).cast("double").as("n"))
          .localCheckpoint() // 8-row domain, read 5× by the EM rounds
        var em = s.sql("SELECT 0.1 AS lam, 0.9 AS m1, 0.9 AS m2," +
          " 0.9 AS m3, 0.1 AS u1, 0.1 AS u2, 0.1 AS u3")
        (1 to 5).foreach { _ =>
          val sums = pat.crossJoin(broadcast(em))
            .withColumn("w", expr(wSql))
            .agg(expr("sum(n * w)").as("sw"), expr("sum(n)").as("tot"),
              expr("sum(n * w * f1)").as("a1"),
              expr("sum(n * w * f2)").as("a2"),
              expr("sum(n * w * f3)").as("a3"),
              expr("sum(n * (1.0 - w) * f1)").as("b1"),
              expr("sum(n * (1.0 - w) * f2)").as("b2"),
              expr("sum(n * (1.0 - w) * f3)").as("b3"))
          em = sums.select(mStepSolve.map { case (nm, e) =>
            expr(e).as(nm) }: _*)
        }
        val truth = cand.agg(
          sum("lab").cast("long").as("nm"),
          sum(lit(1) - col("lab")).cast("long").as("nu"),
          sum(col("f2") * col("lab")).cast("long").as("t2"),
          sum(col("f2") * (lit(1) - col("lab"))).cast("long").as("s2"),
          sum(col("f3") * col("lab")).cast("long").as("t3"),
          sum(col("f3") * (lit(1) - col("lab"))).cast("long").as("s3"))
        val nPairs = pat.agg(sum("n").cast("long").as("n_pairs"))
        val out = em.crossJoin(broadcast(truth))
          .crossJoin(broadcast(nPairs))
          .select(col("n_pairs"),
            floor(col("lam") * 1000000 + 0.5).cast("long").as("lam_micro"),
            floor(col("m1") * 1000000 + 0.5).cast("long").as("m1_micro"),
            floor(col("m2") * 1000000 + 0.5).cast("long").as("m2_micro"),
            floor(col("m3") * 1000000 + 0.5).cast("long").as("m3_micro"),
            floor(col("u1") * 1000000 + 0.5).cast("long").as("u1_micro"),
            floor(col("u2") * 1000000 + 0.5).cast("long").as("u2_micro"),
            floor(col("u3") * 1000000 + 0.5).cast("long").as("u3_micro"),
            expr("CAST(nm * 1000000 div (nm + nu) AS BIGINT)")
              .as("true_prevalence_micro"),
            expr("CAST(t2 * 1000000 div nm AS BIGINT)").as("true_m2_micro"),
            expr("CAST(s2 * 1000000 div nu AS BIGINT)").as("true_u2_micro"),
            expr("CAST(t3 * 1000000 div nm AS BIGINT)").as("true_m3_micro"),
            expr("CAST(s3 * 1000000 div nu AS BIGINT)").as("true_u3_micro"))
        H.materialized(out, caches = Nil, checkpoints = Seq(cand, pat))
      })
  )
}
