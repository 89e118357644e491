package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Hundred-fourth wave: equivalence testing, seeding quality, pricing
  * consistency, and retention decay — TOST ("are BUILDING and
  * MACHINERY order values equivalent within ±1%?", the regulatory
  * inverse of significance testing), k-means++ D² seeding measured
  * against naive first-k seeds by exact quantized inertia, per-part
  * unit-price dispersion (who's price-discriminating?), and the
  * retention half-life from a log-linear decay fit.
  *
  * Exactness: TOST's two t statistics share one exact-moment chain;
  * k-means++ picks are hash-tiebroken argmax rounds (driver decisions
  * like the greedy-coverage loop) and inertia sums milli-quantized
  * squared distances; dispersion is an integer cross-multiplied CV;
  * the decay fit micro-quantizes each log before HUGEINT moments.
  */
object EquivalenceOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // TOST equivalence: BUILDING vs MACHINERY mean order value, margin
    // δ = ±1% of the pooled mean. Both one-sided t statistics assemble
    // from the SAME exact integer moments; equivalence holds iff
    // t_lower ≥ +1.645 AND t_upper ≤ −1.645 (5% each side). The
    // question launch reviews actually ask — "prove it DIDN'T change" —
    // which a plain t-test can never answer.
    Q("stats_tost_equivalence",
      Some(
        """WITH b AS (SELECT c.c_mktsegment AS g,
          |  CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT) AS v
          |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
          |m AS (SELECT
          |  CAST(sum(CASE WHEN g='BUILDING' THEN 1 ELSE 0 END) AS BIGINT)
          |    AS na,
          |  CAST(sum(CASE WHEN g='BUILDING' THEN v ELSE 0 END) AS BIGINT)
          |    AS sa,
          |  sum(CASE WHEN g='BUILDING' THEN CAST(v AS HUGEINT)*v
          |    ELSE 0 END) AS qa,
          |  CAST(sum(CASE WHEN g='MACHINERY' THEN 1 ELSE 0 END)
          |    AS BIGINT) AS nb,
          |  CAST(sum(CASE WHEN g='MACHINERY' THEN v ELSE 0 END)
          |    AS BIGINT) AS sb,
          |  sum(CASE WHEN g='MACHINERY' THEN CAST(v AS HUGEINT)*v
          |    ELSE 0 END) AS qb FROM b),
          |e AS (SELECT na, nb,
          |  CAST(sa AS DOUBLE)/CAST(na AS DOUBLE)
          |    - CAST(sb AS DOUBLE)/CAST(nb AS DOUBLE) AS diff,
          |  0.01 * (CAST(sa + sb AS DOUBLE)/CAST(na + nb AS DOUBLE))
          |    AS delta,
          |  sqrt(((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE)
          |      *CAST(sa AS DOUBLE)/CAST(na AS DOUBLE))
          |    + (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE)
          |      *CAST(sb AS DOUBLE)/CAST(nb AS DOUBLE)))
          |    / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2.0)
          |    * (1.0/CAST(na AS DOUBLE) + 1.0/CAST(nb AS DOUBLE)))
          |    AS se FROM m)
          |SELECT na, nb,
          |  CAST(floor(diff * 1000.0) AS BIGINT) AS diff_milli_cents,
          |  CAST(floor(delta * 1000.0) AS BIGINT) AS delta_milli_cents,
          |  CAST(floor((diff + delta) / se * 1000000.0) AS BIGINT)
          |    AS t_lower_micro,
          |  CAST(floor((diff - delta) / se * 1000000.0) AS BIGINT)
          |    AS t_upper_micro,
          |  CAST(CASE WHEN (diff + delta) / se >= 1.6448536269514722
          |    AND (diff - delta) / se <= -1.6448536269514722
          |    THEN 1 ELSE 0 END AS BIGINT) AS equivalent
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
        val m = b.agg(
          sum(when(col("g") === "BUILDING", 1L).otherwise(0L))
            .cast("long").as("na"),
          sum(when(col("g") === "BUILDING", col("v")).otherwise(0L))
            .cast("long").as("sa"),
          sum(when(col("g") === "BUILDING",
            col("v").cast("decimal(38,0)") * col("v")).otherwise(0))
            .cast("decimal(38,0)").as("qa"),
          sum(when(col("g") === "MACHINERY", 1L).otherwise(0L))
            .cast("long").as("nb"),
          sum(when(col("g") === "MACHINERY", col("v")).otherwise(0L))
            .cast("long").as("sb"),
          sum(when(col("g") === "MACHINERY",
            col("v").cast("decimal(38,0)") * col("v")).otherwise(0))
            .cast("decimal(38,0)").as("qb"))
        val e = m
          .withColumn("diff", col("sa").cast("double") /
            col("na").cast("double") -
            col("sb").cast("double") / col("nb").cast("double"))
          .withColumn("delta", lit(0.01d) *
            ((col("sa") + col("sb")).cast("double") /
              (col("na") + col("nb")).cast("double")))
          .withColumn("se",
            sqrt(((col("qa").cast("double") -
              col("sa").cast("double") * col("sa").cast("double") /
                col("na").cast("double")) +
              (col("qb").cast("double") -
                col("sb").cast("double") * col("sb").cast("double") /
                  col("nb").cast("double"))) /
              (col("na").cast("double") + col("nb").cast("double")
                - 2.0d) *
              (lit(1.0d) / col("na").cast("double") +
                lit(1.0d) / col("nb").cast("double"))))
        e.select(col("na"), col("nb"),
          floor(col("diff") * 1000.0d).cast("long")
            .as("diff_milli_cents"),
          floor(col("delta") * 1000.0d).cast("long")
            .as("delta_milli_cents"),
          floor((col("diff") + col("delta")) / col("se") * 1000000.0d)
            .cast("long").as("t_lower_micro"),
          floor((col("diff") - col("delta")) / col("se") * 1000000.0d)
            .cast("long").as("t_upper_micro"),
          when((col("diff") + col("delta")) / col("se") >=
            1.6448536269514722d &&
            (col("diff") - col("delta")) / col("se") <=
              -1.6448536269514722d, 1L).otherwise(0L).cast("long")
            .as("equivalent"))
      }),

    // k-means++ seeding quality: 4 seeds chosen by the D² rule
    // (farthest-first, deterministic hash tiebreak — each pick is a
    // one-row driver decision like the greedy-coverage loop) vs the
    // naive first-4 seeds, both scored by exact milli-quantized
    // inertia over all vectors. The seeding gap IS the argument for
    // kmeans++ — here it's measured, engine-exactly, on the real
    // corpus.
    Q("emb_kmeanspp_seeding",
      Some(
        """WITH e AS (SELECT vec_id,
          |  CAST(floor(unnest(embedding)::DOUBLE * 1000 + 0.5)
          |    AS BIGINT) AS x,
          |  generate_subscripts(embedding, 1) AS j FROM embeddings),
          |d1 AS (SELECT e.vec_id,
          |  CAST(sum(CAST(e.x - s.x AS HUGEINT) * (e.x - s.x))
          |    AS HUGEINT) AS d2
          |  FROM e JOIN (SELECT j, x FROM e WHERE vec_id = 0) s
          |    ON s.j = e.j GROUP BY 1),
          |p2 AS (SELECT vec_id FROM d1 ORDER BY d2 DESC, vec_id LIMIT 1),
          |n2 AS (SELECT e.vec_id,
          |  CAST(sum(CAST(e.x - s.x AS HUGEINT) * (e.x - s.x))
          |    AS HUGEINT) AS d2
          |  FROM e JOIN (SELECT e2.j, e2.x FROM e e2, p2
          |    WHERE e2.vec_id = p2.vec_id) s ON s.j = e.j GROUP BY 1),
          |d2f AS (SELECT d1.vec_id, LEAST(d1.d2, n2.d2) AS d2
          |  FROM d1 JOIN n2 ON n2.vec_id = d1.vec_id),
          |p3 AS (SELECT vec_id FROM d2f ORDER BY d2 DESC, vec_id
          |  LIMIT 1),
          |n3 AS (SELECT e.vec_id,
          |  CAST(sum(CAST(e.x - s.x AS HUGEINT) * (e.x - s.x))
          |    AS HUGEINT) AS d2
          |  FROM e JOIN (SELECT e2.j, e2.x FROM e e2, p3
          |    WHERE e2.vec_id = p3.vec_id) s ON s.j = e.j GROUP BY 1),
          |d3f AS (SELECT d2f.vec_id, LEAST(d2f.d2, n3.d2) AS d2
          |  FROM d2f JOIN n3 ON n3.vec_id = d2f.vec_id),
          |p4 AS (SELECT vec_id FROM d3f ORDER BY d2 DESC, vec_id
          |  LIMIT 1),
          |n4 AS (SELECT e.vec_id,
          |  CAST(sum(CAST(e.x - s.x AS HUGEINT) * (e.x - s.x))
          |    AS HUGEINT) AS d2
          |  FROM e JOIN (SELECT e2.j, e2.x FROM e e2, p4
          |    WHERE e2.vec_id = p4.vec_id) s ON s.j = e.j GROUP BY 1),
          |d4f AS (SELECT d3f.vec_id, LEAST(d3f.d2, n4.d2) AS d2
          |  FROM d3f JOIN n4 ON n4.vec_id = d3f.vec_id),
          |ipp AS (SELECT CAST(sum(d2) AS HUGEINT) AS inertia FROM d4f),
          |dn AS (SELECT t.vec_id, min(t.d2) AS d2 FROM (
          |  SELECT e.vec_id, s.vec_id AS sid,
          |    CAST(sum(CAST(e.x - s.x AS HUGEINT) * (e.x - s.x))
          |      AS HUGEINT) AS d2
          |  FROM e JOIN (SELECT vec_id, j, x FROM e WHERE vec_id < 4) s
          |    ON s.j = e.j GROUP BY 1, 2) t GROUP BY 1),
          |inv AS (SELECT CAST(sum(d2) AS HUGEINT) AS inertia FROM dn),
          |seeds AS (SELECT 0 AS sid UNION ALL SELECT vec_id FROM p2
          |  UNION ALL SELECT vec_id FROM p3
          |  UNION ALL SELECT vec_id FROM p4)
          |SELECT (SELECT CAST(string_agg(CAST(sid AS VARCHAR), ','
          |    ORDER BY sid) AS VARCHAR) FROM seeds) AS pp_seeds,
          |  (SELECT CAST(inertia AS VARCHAR) FROM ipp)
          |    AS pp_inertia_milli2,
          |  (SELECT CAST(inertia AS VARCHAR) FROM inv)
          |    AS naive_inertia_milli2,
          |  CAST((SELECT inertia FROM inv) * 1000
          |    // (SELECT inertia FROM ipp) AS BIGINT)
          |    AS naive_over_pp_milli
          |""".stripMargin),
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)" +
              " * 1000 + 0.5) AS BIGINT))").as("v"))
          .localCheckpoint()
        // distance to one seed vector as a column expression
        def dist(vcol: String, seedCol: String) =
          expr(s"aggregate(zip_with($vcol, $seedCol, (a, b)" +
            s" -> (a - b) * (a - b)), CAST(0 AS BIGINT)," +
            " (acc, x) -> acc + x)")
        def seedVec(id: Long): DataFrame =
          e.filter(col("vec_id") === id).select(col("v").as("sv"))
        var seeds = List(0L)
        var cur = e.crossJoin(broadcast(seedVec(0L)))
          .select(col("vec_id"), col("v"),
            dist("v", "sv").as("d2"))
          .localCheckpoint()
        (2 to 4).foreach { _ =>
          // one-row argmax fetch per seeding round (driver decision)
          val pick = cur.orderBy(col("d2").desc, col("vec_id"))
            .limit(1).collect()(0).getLong(0)
          seeds = seeds :+ pick
          cur = cur.crossJoin(broadcast(seedVec(pick)))
            .select(col("vec_id"), col("v"),
              least(col("d2"), dist("v", "sv")).as("d2"))
            .localCheckpoint()
        }
        val ipp = cur.agg(sum(col("d2").cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("inertia"))
        val naive = e.filter(col("vec_id") < 4)
          .select(col("v").as("sv"))
        val dn = e.crossJoin(broadcast(naive))
          .select(col("vec_id"), dist("v", "sv").as("d"))
          .groupBy("vec_id").agg(min(col("d")).as("d2"))
        val inv = dn.agg(sum(col("d2").cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("inertia"))
        val out = ipp.select(col("inertia").as("ipp"))
          .crossJoin(broadcast(inv.select(col("inertia").as("inv"))))
          .select(lit(seeds.sorted.mkString(",")).as("pp_seeds"),
            col("ipp").cast("string").as("pp_inertia_milli2"),
            col("inv").cast("string").as("naive_inertia_milli2"),
            expr("CAST(inv * 1000 div ipp AS BIGINT)")
              .as("naive_over_pp_milli"))
        H.materialized(out, Nil, Seq(e, cur))
      }),

    // Per-part unit-price dispersion: the same part sold at different
    // effective unit prices — coefficient of variation in milli from
    // exact integer moments, top 20 most-dispersed parts with volume.
    // The price-consistency audit behind "are discounts policy or
    // favoritism?"; one keyed aggregation plus a distributed TopN.
    Q("part_price_dispersion",
      Some(
        """WITH u AS (SELECT l_partkey AS pk,
          |  CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
          |    // CAST(l_quantity AS BIGINT) AS up FROM lineitem),
          |m AS (SELECT pk, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(up) AS BIGINT) AS s,
          |  sum(CAST(up AS HUGEINT)*up) AS q FROM u GROUP BY 1
          |  HAVING count(*) >= 8)
          |SELECT pk AS partkey, n,
          |  CAST(s * 1000 // n // 1000 AS BIGINT) AS mean_unit_cents,
          |  CAST(floor(sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
          |    *CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
          |    / (CAST(n AS DOUBLE) - 1.0))
          |    / (CAST(s AS DOUBLE)/CAST(n AS DOUBLE)) * 1000.0)
          |    AS BIGINT) AS cv_milli
          |FROM m ORDER BY cv_milli DESC, pk LIMIT 20
          |""".stripMargin),
      (s, dir) => {
        val u = tbl(s, dir, "lineitem")
          .select(col("l_partkey").as("pk"),
            expr("CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)" +
              " div CAST(l_quantity AS BIGINT)").as("up"))
        val m = u.groupBy("pk")
          .agg(count(lit(1)).cast("long").as("n"),
            sum(col("up")).cast("long").as("s"),
            sum(col("up").cast("decimal(38,0)") * col("up"))
              .cast("decimal(38,0)").as("q"))
          .filter(col("n") >= 8)
        m.select(col("pk").as("partkey"), col("n"),
            expr("s * 1000 div n div 1000").cast("long")
              .as("mean_unit_cents"),
            floor(sqrt((col("q").cast("double") -
              col("s").cast("double") * col("s").cast("double") /
                col("n").cast("double")) /
              (col("n").cast("double") - 1.0d)) /
              (col("s").cast("double") / col("n").cast("double")) *
              1000.0d).cast("long").as("cv_milli"))
          .orderBy(col("cv_milli").desc, col("partkey")).limit(20)
      }),

    // Retention half-life: day-N return rates (users active on their
    // first day who return N days later), fitted as ln(rate) = a − λN
    // over N ∈ 1..14 with each log micro-quantized pre-moment; the
    // half-life ln2/λ lands in milli-days. One cohort self-join on the
    // bounded (user, day) frame; the one-number summary a growth team
    // tracks release over release.
    Q("events_retention_halflife",
      Some(
        """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
          |  FROM events),
          |f AS (SELECT user_id, min(day) AS d0 FROM ud GROUP BY 1),
          |r AS (SELECT ud.day - f.d0 AS n,
          |  CAST(count(DISTINCT ud.user_id) AS BIGINT) AS ret
          |  FROM ud JOIN f ON f.user_id = ud.user_id
          |  WHERE ud.day - f.d0 BETWEEN 1 AND 14 GROUP BY 1),
          |c AS (SELECT CAST(count(*) AS BIGINT) AS cohort FROM f),
          |p AS (SELECT CAST(n AS BIGINT) AS x,
          |  CAST(floor(ln(CAST(ret AS DOUBLE) / CAST(c.cohort AS DOUBLE))
          |    * 1000000.0) AS BIGINT) AS ly FROM r, c),
          |mm AS (SELECT CAST(count(*) AS BIGINT) AS k,
          |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
          |  sum(CAST(x AS HUGEINT)*x) AS sxx,
          |  sum(CAST(x AS HUGEINT)*ly) AS sxy FROM p)
          |SELECT k AS n_points,
          |  CAST(floor((CAST(k AS DOUBLE)*CAST(sxy AS DOUBLE)
          |    - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
          |    / (CAST(k AS DOUBLE)*CAST(sxx AS DOUBLE)
          |    - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * (-1.0))
          |    AS BIGINT) AS lambda_micro,
          |  CAST(floor(693147.1805599453 / ((CAST(k AS DOUBLE)
          |    *CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
          |    *CAST(sy AS DOUBLE)) / (CAST(k AS DOUBLE)
          |    *CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
          |    *CAST(sx AS DOUBLE)) * (-1.0))) AS BIGINT)
          |    AS halflife_milli_days
          |FROM mm
          |""".stripMargin),
      (s, dir) => {
        val ud = H.events(s, dir)
          .select(col("user_id"), col("ts").cast("date").as("day"))
          .distinct()
          .localCheckpoint()
        val fu = ud.groupBy("user_id").agg(min(col("day")).as("d0"))
        val r = ud.join(fu, Seq("user_id"))
          .select(datediff(col("day"), col("d0")).as("n"),
            col("user_id"))
          .filter(col("n").between(1, 14))
          .groupBy("n")
          .agg(countDistinct(col("user_id")).cast("long").as("ret"))
        val c = fu.agg(count(lit(1)).cast("long").as("cohort"))
        val p = r.crossJoin(broadcast(c))
          .select(col("n").cast("long").as("x"),
            floor(log(col("ret").cast("double") /
              col("cohort").cast("double")) * 1000000.0d).cast("long")
              .as("ly"))
        val out = p.agg(count(lit(1)).cast("long").as("k"),
            sum(col("x")).cast("long").as("sx"),
            sum(col("ly")).cast("long").as("sy"),
            sum(col("x").cast("decimal(38,0)") * col("x"))
              .cast("decimal(38,0)").as("sxx"),
            sum(col("x").cast("decimal(38,0)") * col("ly"))
              .cast("decimal(38,0)").as("sxy"))
          .select(col("k").as("n_points"),
            floor((col("k").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
              (col("k").cast("double") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")) *
              lit(-1.0d)).cast("long").as("lambda_micro"),
            floor(lit(693147.1805599453d) /
              ((col("k").cast("double") * col("sxy").cast("double") -
                col("sx").cast("double") * col("sy").cast("double")) /
                (col("k").cast("double") * col("sxx").cast("double") -
                  col("sx").cast("double") * col("sx").cast("double")) *
                lit(-1.0d))).cast("long").as("halflife_milli_days"))
        H.materialized(out, Nil, Seq(ud))
      })
  )
}
