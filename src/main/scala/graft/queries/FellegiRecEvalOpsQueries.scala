package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-10 wave 149: probabilistic record-linkage scoring (Fellegi-Sunter
  * 1969 — the inference layer the board's deterministic ER queries feed)
  * and a recommender coverage/diversity/novelty report (the beyond-accuracy
  * eval every recsys ships next to hit-rate).
  */
object FellegiRecEvalOpsQueries extends QueryModule {

  /** The er_blocked_linkage corruption fixture (GovernanceQueries:123),
    * inlined: three deterministic corruption modes keyed on c_custkey % 3,
    * confined to the name tail so the 16-char blocking prefix survives. */
  private[queries] val dirtySql: String =
    "CASE CAST(c_custkey % 3 AS INTEGER) " +
      "WHEN 0 THEN substr(c_name, 1, 16) || 'Q' || substr(c_name, 18, 1) " +
      "WHEN 1 THEN substr(c_name, 1, 17) " +
      "ELSE c_name || 'Z' END"

  private[queries] def dirtyCol: org.apache.spark.sql.Column =
    when(col("c_custkey") % 3 === 0,
      concat(substring(col("c_name"), 1, 16), lit("Q"),
        substring(col("c_name"), 18, 1)))
      .when(col("c_custkey") % 3 === 1, substring(col("c_name"), 1, 17))
      .otherwise(concat(col("c_name"), lit("Z")))

  def all: Seq[Q] = Seq(

    // FELLEGI-SUNTER MATCH WEIGHTS: candidate pairs from (nation, 16-char
    // name prefix) blocking over the corrupted-vs-clean roster; per-pair
    // agreement pattern over three comparison fields — full-name equality,
    // 17-char-prefix equality, account-balance-band equality. Ground truth
    // is known by construction (d_key = c_custkey), so the m_k (agreement
    // given match) and u_k (agreement given non-match) probabilities are
    // exact ppm censuses, and each of the 8 patterns gets its
    // log-likelihood-ratio weight Σ log2(m/u) + Σ log2((1-m)/(1-u)) in an
    // identical double tree over those integers. The blocking keeps the
    // scorer off the n² grid (block size bounded by the key design); the
    // pattern domain is 8 rows at any corpus size.
    Q("er_fellegi_sunter",
      Some(
        s"""WITH dirty AS (SELECT c_custkey AS d_key,
           |    c_nationkey AS d_nat, $dirtySql AS d_name,
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
           |mu AS (SELECT
           |    CAST(sum(lab) AS BIGINT) AS nm,
           |    CAST(sum(1 - lab) AS BIGINT) AS nu,
           |    CAST(sum(f1 * lab) AS BIGINT) AS m1,
           |    CAST(sum(f2 * lab) AS BIGINT) AS m2,
           |    CAST(sum(f3 * lab) AS BIGINT) AS m3,
           |    CAST(sum(f1 * (1 - lab)) AS BIGINT) AS u1,
           |    CAST(sum(f2 * (1 - lab)) AS BIGINT) AS u2,
           |    CAST(sum(f3 * (1 - lab)) AS BIGINT) AS u3
           |  FROM cand),
           |pat AS (SELECT f1, f2, f3,
           |    CAST(sum(lab) AS BIGINT) AS n_match,
           |    CAST(sum(1 - lab) AS BIGINT) AS n_nonmatch
           |  FROM cand GROUP BY 1, 2, 3),
           |ppm AS (SELECT
           |    least(greatest(m1 * 1000000 // nm, 1), 999999) AS m1p,
           |    least(greatest(m2 * 1000000 // nm, 1), 999999) AS m2p,
           |    least(greatest(m3 * 1000000 // nm, 1), 999999) AS m3p,
           |    least(greatest(u1 * 1000000 // nu, 1), 999999) AS u1p,
           |    least(greatest(u2 * 1000000 // nu, 1), 999999) AS u2p,
           |    least(greatest(u3 * 1000000 // nu, 1), 999999) AS u3p
           |  FROM mu)
           |SELECT pat.f1, pat.f2, pat.f3, pat.n_match, pat.n_nonmatch,
           |  CAST(floor((
           |    (CASE WHEN pat.f1 = 1
           |      THEN ln(CAST(ppm.m1p AS DOUBLE) / CAST(ppm.u1p AS DOUBLE))
           |      ELSE ln(CAST(1000000 - ppm.m1p AS DOUBLE)
           |        / CAST(1000000 - ppm.u1p AS DOUBLE)) END) +
           |    (CASE WHEN pat.f2 = 1
           |      THEN ln(CAST(ppm.m2p AS DOUBLE) / CAST(ppm.u2p AS DOUBLE))
           |      ELSE ln(CAST(1000000 - ppm.m2p AS DOUBLE)
           |        / CAST(1000000 - ppm.u2p AS DOUBLE)) END) +
           |    (CASE WHEN pat.f3 = 1
           |      THEN ln(CAST(ppm.m3p AS DOUBLE) / CAST(ppm.u3p AS DOUBLE))
           |      ELSE ln(CAST(1000000 - ppm.m3p AS DOUBLE)
           |        / CAST(1000000 - ppm.u3p AS DOUBLE)) END)
           |  ) / ln(2.0) * 1000.0) AS BIGINT) AS weight_milli
           |FROM pat CROSS JOIN ppm
           |ORDER BY pat.f1, pat.f2, pat.f3
           |""".stripMargin),
      (s, dir) => {
        val cust = tbl(s, dir, "customer")
        val dirty = cust.select(col("c_custkey").as("d_key"),
          col("c_nationkey").as("d_nat"), dirtyCol.as("d_name"),
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
          .localCheckpoint() // the m/u census + the pattern census read it
        val mu = cand.agg(
          sum("lab").cast("long").as("nm"),
          sum(lit(1) - col("lab")).cast("long").as("nu"),
          sum(col("f1") * col("lab")).cast("long").as("m1"),
          sum(col("f2") * col("lab")).cast("long").as("m2"),
          sum(col("f3") * col("lab")).cast("long").as("m3"),
          sum(col("f1") * (lit(1) - col("lab"))).cast("long").as("u1"),
          sum(col("f2") * (lit(1) - col("lab"))).cast("long").as("u2"),
          sum(col("f3") * (lit(1) - col("lab"))).cast("long").as("u3"))
        val ppm = mu.select(
          expr("least(greatest(m1 * 1000000 div nm, 1L), 999999L)").as("m1p"),
          expr("least(greatest(m2 * 1000000 div nm, 1L), 999999L)").as("m2p"),
          expr("least(greatest(m3 * 1000000 div nm, 1L), 999999L)").as("m3p"),
          expr("least(greatest(u1 * 1000000 div nu, 1L), 999999L)").as("u1p"),
          expr("least(greatest(u2 * 1000000 div nu, 1L), 999999L)").as("u2p"),
          expr("least(greatest(u3 * 1000000 div nu, 1L), 999999L)").as("u3p"))
        val pat = cand.groupBy("f1", "f2", "f3")
          .agg(sum("lab").cast("long").as("n_match"),
            sum(lit(1) - col("lab")).cast("long").as("n_nonmatch"))
        def leg(k: Int): String =
          s"(CASE WHEN f$k = 1" +
            s" THEN ln(CAST(m${k}p AS DOUBLE) / CAST(u${k}p AS DOUBLE))" +
            s" ELSE ln(CAST(1000000 - m${k}p AS DOUBLE)" +
            s" / CAST(1000000 - u${k}p AS DOUBLE)) END)"
        val out = pat.crossJoin(broadcast(ppm))
          .select(col("f1"), col("f2"), col("f3"),
            col("n_match"), col("n_nonmatch"),
            expr(s"CAST(floor((${leg(1)} + ${leg(2)} + ${leg(3)})" +
              " / ln(2.0) * 1000.0) AS BIGINT)").as("weight_milli"))
          .orderBy("f1", "f2", "f3")
        H.materialized(out, caches = Nil, checkpoints = Seq(cand))
      }),

    // RECOMMENDER COVERAGE / DIVERSITY / NOVELTY: the beyond-accuracy
    // report for the per-segment top-5 popularity recommender — catalog
    // coverage (distinct recommended parts over the catalog), intra-list
    // brand diversity (pairwise brand-inequality over the 10 ordered
    // pairs of each 5-item list), and novelty (mean -log2 popularity
    // share of the recommended items, milli). One fact-sized
    // (segment, part) reduce; everything after the top-5 cut lives on
    // the 25-row recommendation domain.
    Q("rec_coverage_diversity",
      Some(
        """WITH sp AS (SELECT c.c_mktsegment AS seg, l.l_partkey AS pk,
          |    CAST(count(*) AS BIGINT) AS cnt
          |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          |  JOIN customer c ON c.c_custkey = o.o_custkey
          |  GROUP BY 1, 2),
          |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM sp),
          |top5 AS (SELECT seg, pk, cnt, rnk FROM (
          |    SELECT seg, pk, cnt, CAST(row_number() OVER
          |      (PARTITION BY seg ORDER BY cnt DESC, pk) AS BIGINT) AS rnk
          |    FROM sp) WHERE rnk <= 5),
          |withbrand AS (SELECT t.seg, t.pk, t.cnt, t.rnk, p.p_brand
          |  FROM top5 t JOIN part p ON p.p_partkey = t.pk),
          |divr AS (SELECT a.seg, CAST(sum(CASE WHEN a.p_brand <> b.p_brand
          |      THEN 1 ELSE 0 END) AS BIGINT) AS unlike,
          |    CAST(count(*) AS BIGINT) AS pairs
          |  FROM withbrand a JOIN withbrand b
          |    ON a.seg = b.seg AND a.rnk < b.rnk GROUP BY 1),
          |nov AS (SELECT w.seg,
          |    CAST(sum(CAST(floor(-ln(CAST(w.cnt AS DOUBLE)
          |      / CAST(tot.n AS DOUBLE)) / ln(2.0) * 1000.0) AS BIGINT))
          |      AS BIGINT) AS novsum_milli,
          |    CAST(count(*) AS BIGINT) AS k,
          |    CAST(count(DISTINCT w.p_brand) AS BIGINT) AS n_brands
          |  FROM withbrand w CROSS JOIN tot GROUP BY 1),
          |cov AS (SELECT CAST(count(DISTINCT pk) AS BIGINT) AS n_rec,
          |    CAST((SELECT count(*) FROM part) AS BIGINT) AS n_cat
          |  FROM top5)
          |SELECT n.seg, n.k AS list_size, n.n_brands,
          |  d.unlike * 1000000 // d.pairs AS diversity_micro,
          |  n.novsum_milli // n.k AS novelty_milli,
          |  cov.n_rec * 1000000 // cov.n_cat AS coverage_micro
          |FROM nov n JOIN divr d ON d.seg = n.seg CROSS JOIN cov
          |ORDER BY n.seg
          |""".stripMargin),
      (s, dir) => {
        val sp = tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(tbl(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
            col("c_custkey") === col("o_custkey"))
          .groupBy(col("seg"), col("l_partkey").as("pk"))
          .agg(count(lit(1)).cast("long").as("cnt"))
          .localCheckpoint() // total mass + the top-5 cut read it
        val tot = sp.agg(sum("cnt").cast("long").as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("seg").orderBy(col("cnt").desc, col("pk"))
        val top5 = sp.withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 5)
        val withBrand = top5.join(
            broadcast(tbl(s, dir, "part")
              .select(col("p_partkey"), col("p_brand"))),
            col("p_partkey") === col("pk"))
          .select("seg", "pk", "cnt", "rnk", "p_brand")
          .localCheckpoint() // diversity pairs + novelty + coverage read it
        val divr = withBrand.select(col("seg"), col("rnk").as("ra"),
            col("p_brand").as("ba"))
          .join(withBrand.select(col("seg").as("seg2"), col("rnk").as("rb"),
            col("p_brand").as("bb")),
            col("seg") === col("seg2") && col("ra") < col("rb"))
          .groupBy("seg")
          .agg(sum(when(col("ba") =!= col("bb"), 1L).otherwise(0L))
            .cast("long").as("unlike"),
            count(lit(1)).cast("long").as("pairs"))
        val nov = withBrand.crossJoin(broadcast(tot))
          .groupBy("seg")
          .agg(sum(expr("CAST(floor(-ln(CAST(cnt AS DOUBLE)" +
            " / CAST(n AS DOUBLE)) / ln(2.0) * 1000.0) AS BIGINT)"))
            .cast("long").as("novsum_milli"),
            count(lit(1)).cast("long").as("k"),
            countDistinct("p_brand").cast("long").as("n_brands"))
        val cov = withBrand.agg(
            countDistinct("pk").cast("long").as("n_rec"))
          .crossJoin(broadcast(
            tbl(s, dir, "part").agg(count(lit(1)).cast("long").as("n_cat"))))
        val out = nov.join(divr, Seq("seg"))
          .crossJoin(broadcast(cov))
          .select(col("seg"), col("k").as("list_size"), col("n_brands"),
            expr("unlike * 1000000 div pairs").as("diversity_micro"),
            expr("novsum_milli div k").as("novelty_milli"),
            expr("n_rec * 1000000 div n_cat").as("coverage_micro"))
          .orderBy("seg")
        H.materialized(out, caches = Nil, checkpoints = Seq(sp, withBrand))
      })
  )
}
