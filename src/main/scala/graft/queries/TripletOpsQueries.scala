package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Hundred-fourteenth wave: the sign test, metric-learning audits, and
  * retrieval bias — the paired sign test on year-over-year customer
  * spend (the assumption-free floor under Wilcoxon), triplet-violation
  * rates over the embedding space (does same-label beat diff-label at
  * the distance level the loss assumed?), and dot-product vs cosine
  * retrieval bias (dot rewards LONG vectors — measured by the norms it
  * retrieves).
  *
  * Exactness: sign counts are integers with one z chain; triplet
  * distances are milli-quantized integer SSDs via zip_with (deterministic
  * pairing by id windows, mixed-label fallbacks filtered); retrieval
  * sets are hash-tiebroken top-5 with HUGEINT integer scores on both
  * metrics — overlap and norms are exact.
  */
object TripletOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Sign test on per-customer spend, 1996 → 1997: just the sign
    // counts and the binomial normal approximation — no rank, no
    // symmetry assumption; when it and Wilcoxon agree, the story is
    // robust. One keyed aggregation and a 2-cell chain.
    Q("stats_sign_test",
      Some(
        """WITH y AS (SELECT o_custkey AS ck, year(o_orderdate) AS yr,
          |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents
          |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
          |  GROUP BY 1, 2),
          |p AS (SELECT a.ck, b.cents - a.cents AS d
          |  FROM (SELECT * FROM y WHERE yr = 1996) a
          |  JOIN (SELECT * FROM y WHERE yr = 1997) b ON b.ck = a.ck
          |  WHERE b.cents <> a.cents),
          |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS pos FROM p)
          |SELECT n AS n_pairs, pos AS n_up, n - pos AS n_down,
          |  CAST(floor((CAST(pos AS DOUBLE)
          |    - CAST(n AS DOUBLE) / 2.0)
          |    / sqrt(CAST(n AS DOUBLE) / 4.0) * 1000000.0) AS BIGINT)
          |    AS z_micro
          |FROM c
          |""".stripMargin),
      (s, dir) => {
        val y = tbl(s, dir, "orders")
          .filter(year(col("o_orderdate")).isin(1996, 1997))
          .groupBy(col("o_custkey").as("ck"),
            year(col("o_orderdate")).as("yr"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
            .cast("long")).cast("long").as("cents"))
        val p = y.filter(col("yr") === 1996)
          .select(col("ck"), col("cents").as("c96"))
          .join(y.filter(col("yr") === 1997)
            .select(col("ck").as("ck2"), col("cents").as("c97")),
            col("ck") === col("ck2"))
          .filter(col("c97") =!= col("c96"))
        p.agg(count(lit(1)).cast("long").as("n"),
            sum(when(col("c97") > col("c96"), 1L).otherwise(0L))
              .cast("long").as("pos"))
          .select(col("n").as("n_pairs"), col("pos").as("n_up"),
            (col("n") - col("pos")).as("n_down"),
            floor((col("pos").cast("double") -
              col("n").cast("double") / 2.0d) /
              sqrt(col("n").cast("double") / 4.0d) * 1000000.0d)
              .cast("long").as("z_micro"))
      }),

    // Triplet violations: anchor → next same-label vector (positive),
    // anchor → next vector by id with a DIFFERENT label (negative);
    // violation = d(a,p)² ≥ d(a,n)² on milli-quantized integer
    // distances. The share of violated triplets and the mean margin
    // are what a metric-learning loss actually optimizes — measured
    // here without training anything.
    Q("emb_triplet_violations",
      Some(
        """WITH e AS (SELECT vec_id, label,
          |  list_transform(embedding, x -> CAST(floor(x::DOUBLE * 1000
          |    + 0.5) AS BIGINT)) AS v FROM embeddings),
          |pos AS (SELECT vec_id, label, v,
          |  lead(vec_id) OVER wl AS p_id, lead(v) OVER wl AS pv
          |  FROM e WINDOW wl AS (PARTITION BY label ORDER BY vec_id)),
          |neg AS (SELECT e.vec_id, lead(e.vec_id) OVER wg AS n_id,
          |  lead(e.label) OVER wg AS n_label, lead(e.v) OVER wg AS nv
          |  FROM e WINDOW wg AS (ORDER BY vec_id)),
          |t AS (SELECT p.vec_id, p.v, p.pv, n.nv
          |  FROM pos p JOIN neg n ON n.vec_id = p.vec_id
          |  WHERE p.p_id IS NOT NULL AND n.n_id IS NOT NULL
          |    AND n.n_label <> p.label),
          |d AS (SELECT vec_id,
          |  list_sum(list_transform(list_zip(v, pv),
          |    x -> (x[1] - x[2]) * (x[1] - x[2])))
          |    AS dp,
          |  list_sum(list_transform(list_zip(v, nv),
          |    x -> (x[1] - x[2]) * (x[1] - x[2])))
          |    AS dn FROM t)
          |SELECT CAST(count(*) AS BIGINT) AS n_triplets,
          |  CAST(sum(CASE WHEN dp >= dn THEN 1 ELSE 0 END) AS BIGINT)
          |    AS violations,
          |  CAST(sum(CASE WHEN dp >= dn THEN 1 ELSE 0 END) * 10000
          |    // count(*) AS BIGINT) AS violation_bps,
          |  CAST(sum(CAST(dn - dp AS HUGEINT)) // count(*) AS BIGINT)
          |    AS mean_margin_milli2
          |FROM d
          |""".stripMargin),
      (s, dir) => {
        // r9: both "next row" constructs run as RANK-ADJACENCY equi-joins
        // on a two-phase parallel global rank (H.globalRank) instead of
        // lead() windows. The old plan's `lead OVER (ORDER BY vec_id)`
        // single-partition-sorted the WHOLE embeddings table (and the
        // per-label lead sorted corpus/|labels| per task); rank r ⋈ r+1
        // under the same total order is the identical adjacency with only
        // range-partitioned sorts. The (label, vec_id) rank gives the
        // within-label successor for free: consecutive ranks share a
        // label exactly when the successor exists (label boundaries drop,
        // as lead's null did).
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("label"), expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)" +
              " * 1000 + 0.5) AS BIGINT))").as("v"))
        val (rkL, ppL) = H.globalRank(e, Seq(col("label"), col("vec_id")), "lrnk")
        val pos = rkL.join(
          rkL.select((col("lrnk") - 1).as("lj"), col("label").as("p_label"),
            col("vec_id").as("p_id"), col("v").as("pv")),
          col("lrnk") === col("lj") && col("label") === col("p_label"))
        val (rkG, ppG) = H.globalRank(e, Seq(col("vec_id")), "grnk")
        val neg = rkG.select(col("vec_id").as("vid2"), col("grnk"))
          .join(rkG.select((col("grnk") - 1).as("gj"),
            col("vec_id").as("n_id"), col("label").as("n_label"),
            col("v").as("nv")), col("grnk") === col("gj"))
          .select(col("vid2"), col("n_id"), col("n_label"), col("nv"))
        def ssd(a: String, b: String) =
          expr(s"aggregate(zip_with($a, $b, (x, y)" +
            " -> (x - y) * (x - y)), CAST(0 AS BIGINT)," +
            " (acc, x) -> acc + x)")
        val t = pos.join(neg, col("vid2") === col("vec_id"))
          .filter(col("n_label") =!= col("label"))
          .select(ssd("v", "pv").as("dp"), ssd("v", "nv").as("dn"))
        val out = t.agg(count(lit(1)).cast("long").as("n_triplets"),
            sum(when(col("dp") >= col("dn"), 1L).otherwise(0L))
              .cast("long").as("violations"),
            sum((col("dn") - col("dp")).cast("decimal(38,0)"))
              .cast("decimal(38,0)").as("marg"))
          .select(col("n_triplets"), col("violations"),
            expr("violations * 10000 div n_triplets").cast("long")
              .as("violation_bps"),
            expr("CAST(marg div n_triplets AS BIGINT)")
              .as("mean_margin_milli2"))
        H.materialized(out, caches = Nil, checkpoints = Seq(ppL, ppG))
      }),

    // Dot-product vs cosine retrieval bias: the same 10 queries
    // retrieve top-5 by integer dot and by cosine; the overlap between
    // the two result sets and the mean squared norm each metric
    // retrieves. Dot chasing long vectors is THE silent failure of
    // un-normalized serving — this emits the receipts.
    Q("sim_dot_vs_cosine_bias",
      Some(
        """WITH e AS (SELECT vec_id,
          |  list_transform(embedding, x -> CAST(floor(x::DOUBLE * 1000
          |    + 0.5) AS BIGINT)) AS v FROM embeddings),
          |n AS (SELECT vec_id, v,
          |  list_sum(list_transform(v, x -> x * x)) AS nrm FROM e),
          |q AS (SELECT vec_id AS qid, v AS qv FROM n
          |  WHERE vec_id < 10),
          |s AS (SELECT q.qid, c.vec_id AS vid, c.nrm,
          |  list_sum(list_transform(list_zip(q.qv, c.v),
          |    x -> x[1] * x[2])) AS dot
          |  FROM q JOIN n c ON c.vec_id <> q.qid),
          |byd AS (SELECT qid, vid, nrm FROM (SELECT qid, vid, nrm,
          |  row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vid)
          |    AS rk FROM s) WHERE rk <= 5),
          |byc AS (SELECT qid, vid, nrm FROM (SELECT qid, vid, nrm,
          |  row_number() OVER (PARTITION BY qid ORDER BY
          |    CAST(dot AS DOUBLE) / sqrt(CAST(nrm AS DOUBLE)) DESC,
          |    vid) AS rk FROM s) WHERE rk <= 5)
          |SELECT
          |  (SELECT CAST(count(*) AS BIGINT) FROM byd d JOIN byc c
          |    ON c.qid = d.qid AND c.vid = d.vid) AS overlap_pairs,
          |  (SELECT CAST(sum(CAST(nrm AS HUGEINT)) // count(*)
          |    AS BIGINT) FROM byd) AS dot_mean_norm2,
          |  (SELECT CAST(sum(CAST(nrm AS HUGEINT)) // count(*)
          |    AS BIGINT) FROM byc) AS cos_mean_norm2
          |""".stripMargin),
      (s, dir) => {
        val n = tbl(s, dir, "embeddings")
          .select(col("vec_id"), expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)" +
              " * 1000 + 0.5) AS BIGINT))").as("v"))
          .withColumn("nrm", expr(
            "aggregate(transform(v, x -> x * x), CAST(0 AS BIGINT)," +
              " (acc, x) -> acc + x)"))
          .localCheckpoint()
        val q = n.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("v").as("qv"))
        val sc = n.select(col("vec_id").as("vid"), col("v").as("cv"),
            col("nrm"))
          .join(broadcast(q), col("vid") =!= col("qid"))
          .withColumn("dot", expr(
            "aggregate(zip_with(qv, cv, (x, y) -> x * y)," +
              " CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
          .select("qid", "vid", "nrm", "dot")
          .localCheckpoint()
        val wd = Window.partitionBy("qid")
          .orderBy(col("dot").desc, col("vid"))
        val wcs = Window.partitionBy("qid")
          .orderBy((col("dot").cast("double") /
            sqrt(col("nrm").cast("double"))).desc, col("vid"))
        val byd = sc.withColumn("rk", row_number().over(wd))
          .filter(col("rk") <= 5).select("qid", "vid", "nrm")
          .localCheckpoint()
        val byc = sc.withColumn("rk", row_number().over(wcs))
          .filter(col("rk") <= 5).select("qid", "vid", "nrm")
          .localCheckpoint()
        val ov = byd.as("d")
          .join(byc.as("c"), col("c.qid") === col("d.qid") &&
            col("c.vid") === col("d.vid"))
          .agg(count(lit(1)).cast("long").as("overlap_pairs"))
        val out = ov
          .crossJoin(broadcast(byd.agg(
            expr("CAST(sum(CAST(nrm AS DECIMAL(38,0))) div count(*)" +
              " AS BIGINT)").as("dot_mean_norm2"))))
          .crossJoin(broadcast(byc.agg(
            expr("CAST(sum(CAST(nrm AS DECIMAL(38,0))) div count(*)" +
              " AS BIGINT)").as("cos_mean_norm2"))))
        H.materialized(out, Nil, Seq(n, sc, byd, byc))
      })
  )
}
