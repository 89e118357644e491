package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{VectorSim => VS}

/** Seventy-eighth wave: serial-correlation and distribution-shape
  * diagnostics — a Ljung-Box portmanteau table over the daily click
  * series (the standard "is this residual white noise" gate before
  * trusting any forecast), epoch-folding period detection over event
  * days (the astronomy fold: concentration of counts by dy mod P),
  * an embedding-hubness audit (the reverse-kNN occurrence skew that
  * predicts ANN retrieval pathology in high dimensions), and Burrows'
  * Delta stylometric distance between language sub-corpora (mean
  * z-score divergence over the shared top-term vocabulary).
  *
  * Exactness discipline: every multi-row reduction is an integer sum;
  * doubles appear only in per-row chains of correctly-rounded IEEE ops
  * (+,-,*,/,sqrt,floor) written as the same expression tree in both
  * engines — no engine-transcendentals (ln/exp/pow), no double
  * aggregation order dependence.
  */
object PeriodicityOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Ljung-Box portmanteau test on daily click counts, lags 1..5:
    // autocovariances from integer deviations about the truncated mean,
    // rho_k^2 in micro via a data-adaptive downscale (s = max(1,
    // c0 div 1e6)) that keeps every square inside BIGINT at any SF
    // while never zeroing small-SF signal, and the cumulative
    // Q_h = n(n+2) * sum_{k<=h} rho_k^2/(n-k) as a running window sum
    // over the 5-row lag frame. The series aggregates to the bounded
    // day domain before anything quadratic runs, so the lag self-join
    // costs O(days^2) regardless of event volume.
    Q("stats_ljung_box",
      Some(
        """WITH d AS (SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP))
          |    // 86400000000 AS BIGINT) AS dy,
          |  CAST(count(*) AS BIGINT) AS c FROM events
          |  WHERE event_type = 'click' GROUP BY 1),
          |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |  sum(c) // count(*) AS mu FROM d),
          |v AS (SELECT dy, c - st.mu AS dev FROM d, st),
          |c0 AS (SELECT sum(dev * dev) AS c0 FROM v),
          |ck AS (SELECT k, coalesce(sum(a.dev * b.dev), 0) AS ck
          |  FROM (SELECT unnest([1, 2, 3, 4, 5]) AS k) ks
          |  LEFT JOIN v a ON true
          |  LEFT JOIN v b ON b.dy = a.dy + ks.k
          |  GROUP BY 1),
          |sc AS (SELECT GREATEST(1, c0 // 1000000) AS s,
          |  c0 // GREATEST(1, c0 // 1000000) AS c0s FROM c0),
          |r AS (SELECT k, ck,
          |  CASE WHEN sc.c0s = 0 THEN 0
          |    ELSE (abs(ck) // sc.s) * (abs(ck) // sc.s) * 1000000
          |      // (sc.c0s * sc.c0s) END AS rho2_micro
          |  FROM ck, sc)
          |SELECT CAST(r.k AS BIGINT) AS lag, CAST(r.ck AS BIGINT) AS ck,
          |  CAST(r.rho2_micro AS BIGINT) AS rho2_micro,
          |  CAST(st.n * (st.n + 2) * sum(r.rho2_micro // (st.n - r.k))
          |    OVER (ORDER BY r.k) AS BIGINT) AS q_micro
          |FROM r, st ORDER BY lag
          |""".stripMargin),
      (s, dir) => {
        val d = H.events(s, dir)
          .filter(col("event_type") === "click")
          .select(expr("unix_micros(ts) div 86400000000").cast("long")
            .as("dy"))
          .groupBy("dy").agg(count(lit(1)).cast("long").as("c"))
          .localCheckpoint() // bounded ~30-row day frame
        val st = d.agg(count(lit(1)).cast("long").as("n"),
          expr("sum(c) div count(*)").as("mu"))
        val v = d.crossJoin(broadcast(st))
          .select(col("dy"), (col("c") - col("mu")).as("dev"))
          .localCheckpoint()
        val c0 = v.agg(sum(col("dev") * col("dev")).as("c0"))
        val ks = s.range(1, 6).select(col("id").as("k"))
        val ck = ks
          .join(v.select(col("dy").as("ady"), col("dev").as("adev")))
          .join(v.select(col("dy").as("bdy"), col("dev").as("bdev")),
            col("bdy") === col("ady") + col("k"), "left")
          .groupBy("k")
          .agg(coalesce(sum(col("adev") * col("bdev")), lit(0L)).as("ck"))
        val sc = c0.select(
          greatest(lit(1L), expr("c0 div 1000000")).as("s"),
          expr("c0 div GREATEST(1, c0 div 1000000)").as("c0s"))
        val r = ck.crossJoin(broadcast(sc))
          .select(col("k"), col("ck"),
            when(col("c0s") === 0, 0L).otherwise(
              expr("(abs(ck) div s) * (abs(ck) div s) * 1000000" +
                " div (c0s * c0s)")).as("rho2_micro"))
        val out = r.crossJoin(broadcast(st))
          .select(col("k").cast("long").as("lag"),
            col("ck").cast("long").as("ck"),
            col("rho2_micro").cast("long").as("rho2_micro"),
            (col("n") * (col("n") + 2) *
              sum(expr("rho2_micro div (n - k)")).over(
                Window.orderBy("k"))).cast("long").as("q_micro"))
          .orderBy("lag")
        H.materialized(out, Nil, Seq(d, v))
      }),

    // Epoch-folding period detection: fold the event-day index by each
    // candidate period P in {2,3,5,7,11}, score the fold by the exact
    // phase-concentration ratio P * sum(s_p^2) / S^2 in micro (1e6 =
    // perfectly uniform phases, P*1e6 = everything on one phase) with a
    // data-adaptive downscale bounding the squares inside BIGINT at any
    // event volume. Per period also the peak phase (ties to the
    // smallest phase) and its share. One scan, one keyed aggregation
    // per (period, phase) — the candidate set is a 5-row broadcast.
    Q("events_period_fold",
      Some(
        """WITH e AS (SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP))
          |    // 86400000000 AS BIGINT) AS dy FROM events),
          |s AS (SELECT CAST(count(*) AS BIGINT) AS s FROM e),
          |f AS (SELECT p.p, e.dy % p.p AS phase,
          |  CAST(count(*) AS BIGINT) AS sp
          |  FROM e, (SELECT unnest([2, 3, 5, 7, 11]) AS p) p
          |  GROUP BY 1, 2),
          |sc AS (SELECT GREATEST(1, s // 300000) AS sc, s,
          |  s // GREATEST(1, s // 300000) AS sq FROM s),
          |agg AS (SELECT p, sum((sp // sc.sc) * (sp // sc.sc)) AS sq2,
          |  count(*) AS nph FROM f, sc GROUP BY 1, sc.sc),
          |pk AS (SELECT p, phase, sp, row_number() OVER
          |  (PARTITION BY p ORDER BY sp DESC, phase) AS rk FROM f)
          |SELECT CAST(agg.p AS BIGINT) AS period,
          |  CAST(agg.p * agg.sq2 * 1000000 // (sc.sq * sc.sq) AS BIGINT)
          |    AS ratio_micro,
          |  CAST(agg.nph AS BIGINT) AS n_phases,
          |  CAST(pk.phase AS BIGINT) AS peak_phase,
          |  CAST(pk.sp * 1000000 // sc.s AS BIGINT) AS peak_share_micro
          |FROM agg JOIN pk ON pk.p = agg.p AND pk.rk = 1, sc
          |ORDER BY period
          |""".stripMargin),
      (s, dir) => {
        val e = H.events(s, dir)
          .select(expr("unix_micros(ts) div 86400000000").cast("long")
            .as("dy"))
        val tot = e.agg(count(lit(1)).cast("long").as("s"))
        val periods = s.range(0, 5)
          .select(element_at(array(lit(2L), lit(3L), lit(5L), lit(7L),
            lit(11L)), (col("id") + 1).cast("int")).as("p"))
        val f = e.crossJoin(broadcast(periods))
          .groupBy(col("p"), (col("dy") % col("p")).as("phase"))
          .agg(count(lit(1)).cast("long").as("sp"))
          .localCheckpoint() // <= 28-row fold frame feeds two branches
        val sc = tot.select(
          greatest(lit(1L), expr("s div 300000")).as("sc"), col("s"),
          expr("s div GREATEST(1, s div 300000)").as("sq"))
        val agg = f.crossJoin(broadcast(sc))
          .groupBy("p", "sc")
          .agg(sum(expr("(sp div sc) * (sp div sc)")).as("sq2"),
            count(lit(1)).as("nph"))
        val pk = f.withColumn("rk", row_number().over(
            Window.partitionBy("p").orderBy(col("sp").desc, col("phase"))))
          .filter(col("rk") === 1)
          .select(col("p").as("p2"), col("phase"), col("sp"))
        val out = agg
          .join(pk, col("p") === col("p2"))
          .crossJoin(broadcast(sc.select(col("sq"), col("s"))))
          .select(col("p").cast("long").as("period"),
            expr("p * sq2 * 1000000 div (sq * sq)").cast("long")
              .as("ratio_micro"),
            col("nph").cast("long").as("n_phases"),
            col("phase").cast("long").as("peak_phase"),
            expr("sp * 1000000 div s").cast("long").as("peak_share_micro"))
          .orderBy("period")
        H.materialized(out, Nil, Seq(f))
      }),

    // Embedding-hubness audit: within-bucket kNN (k=5, the same
    // count-adaptive LSH candidate scheme as sim_knn_graph — candidates
    // are a bucket equi-join, never all-pairs), then the reverse-kNN
    // occurrence count per vector and its third-moment skewness g1 from
    // exact integer sums (the divisions/sqrt run on identical BIGINTs
    // in both engines; m2^(3/2) is m2*sqrt(m2), not pow). High g1 with
    // many antihubs is the canonical symptom that cosine retrieval over
    // this space will concentrate on a few hub vectors.
    Q("emb_hubness_audit",
      Some(s"WITH ${VS.skewCappedCtesSql}, " +
        "p AS (SELECT a.vec_id AS src, b.vec_id AS dst, " +
        s"(${VS.dotSql("a.v", "b.v")}) / (sqrt(a.nrm) * sqrt(b.nrm)) AS sim " +
        "FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id), " +
        "knn AS (SELECT src, dst FROM (SELECT src, dst, row_number() OVER " +
        "(PARTITION BY src ORDER BY sim DESC, dst) AS rnk FROM p) " +
        "WHERE rnk <= 5), " +
        "occ AS (SELECT e.vec_id, CAST(coalesce(c.c, 0) AS BIGINT) AS c " +
        "FROM e LEFT JOIN (SELECT dst, count(*) AS c FROM knn GROUP BY 1) c " +
        "ON c.dst = e.vec_id), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS np, sum(c) AS s1, " +
        "sum(c * c) AS s2, sum(c * c * c) AS s3, " +
        "CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS antihubs, " +
        "max(c) AS maxc FROM occ), " +
        "hub AS (SELECT vec_id FROM occ ORDER BY c DESC, vec_id LIMIT 1) " +
        "SELECT m.np AS n_points, m.antihubs, CAST(m.maxc AS BIGINT) AS max_occ, " +
        "CAST(hub.vec_id AS BIGINT) AS top_hub_vec, " +
        "CASE WHEN CAST(m.s2 AS DOUBLE) / CAST(m.np AS DOUBLE) - " +
        "(CAST(m.s1 AS DOUBLE) / CAST(m.np AS DOUBLE)) * " +
        "(CAST(m.s1 AS DOUBLE) / CAST(m.np AS DOUBLE)) <= 0.0 THEN 0.0 ELSE " +
        "(CAST(m.s3 AS DOUBLE) / CAST(m.np AS DOUBLE) - " +
        "3.0 * (CAST(m.s1 AS DOUBLE) / CAST(m.np AS DOUBLE)) * " +
        "(CAST(m.s2 AS DOUBLE) / CAST(m.np AS DOUBLE)) + " +
        "2.0 * (CAST(m.s1 AS DOUBLE) / CAST(m.np AS DOUBLE)) * " +
        "(CAST(m.s1 AS DOUBLE) / CAST(m.np AS DOUBLE)) * " +
        "(CAST(m.s1 AS DOUBLE) / CAST(m.np AS DOUBLE))) / " +
        "((CAST(m.s2 AS DOUBLE) / CAST(m.np AS DOUBLE) - " +
        "(CAST(m.s1 AS DOUBLE) / CAST(m.np AS DOUBLE)) * " +
        "(CAST(m.s1 AS DOUBLE) / CAST(m.np AS DOUBLE))) * " +
        "sqrt(CAST(m.s2 AS DOUBLE) / CAST(m.np AS DOUBLE) - " +
        "(CAST(m.s1 AS DOUBLE) / CAST(m.np AS DOUBLE)) * " +
        "(CAST(m.s1 AS DOUBLE) / CAST(m.np AS DOUBLE)))) END AS skew_g1 " +
        "FROM m, hub"),
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val (nk, sigCk) = VS.skewCappedKey(e, "v", e.count(), "bucket")
        val n = nk.localCheckpoint()
        val a = n.select(col("vec_id").as("src"), col("v").as("av"),
          col("bucket"))
        val b = n.select(col("vec_id").as("dst"), col("v").as("bv"),
          col("bucket").as("bucket_b"))
        // fused native cosine (bit-identical to the unrolled oracle form)
        // + array columns projected away BEFORE the ranking window: the
        // unrolled 64-term chain broke whole-stage codegen and the window
        // shuffled kilobyte rows — measured 17x/decade at 20k vectors,
        // 1.4x after this rewrite (same fix as sim_graph_walk_eval)
        val knn = a.join(b,
            col("bucket") === col("bucket_b") && col("src") =!= col("dst"))
          .withColumn("sim", graft.functions.CustomExpressions.cosine_sim(
            col("av"), col("bv")))
          .select("src", "dst", "sim")
          .withColumn("rnk", row_number().over(
            Window.partitionBy("src").orderBy(col("sim").desc, col("dst"))))
          .filter(col("rnk") <= 5)
          .select("src", "dst")
        val occ = n.select(col("vec_id"))
          .join(knn.groupBy("dst").agg(count(lit(1)).as("cc")),
            col("vec_id") === col("dst"), "left")
          .select(col("vec_id"), coalesce(col("cc"), lit(0L)).cast("long")
            .as("c"))
          .localCheckpoint()
        val m = occ.agg(count(lit(1)).cast("long").as("np"),
          sum("c").as("s1"), sum(expr("c * c")).as("s2"),
          sum(expr("c * c * c")).as("s3"),
          sum(when(col("c") === 0, 1L).otherwise(0L)).cast("long")
            .as("antihubs"),
          max("c").as("maxc"))
        val hub = occ.orderBy(col("c").desc, col("vec_id")).limit(1)
          .select(col("vec_id").as("hub_vec"))
        val mu = expr("CAST(s1 AS DOUBLE) / CAST(np AS DOUBLE)")
        val m2 = expr("CAST(s2 AS DOUBLE) / CAST(np AS DOUBLE)") - mu * mu
        val m3 = expr("CAST(s3 AS DOUBLE) / CAST(np AS DOUBLE)") -
          lit(3.0) * mu * expr("CAST(s2 AS DOUBLE) / CAST(np AS DOUBLE)") +
          lit(2.0) * mu * mu * mu
        val out = m.crossJoin(broadcast(hub))
          .select(col("np").as("n_points"), col("antihubs"),
            col("maxc").cast("long").as("max_occ"),
            col("hub_vec").cast("long").as("top_hub_vec"),
            when(m2 <= 0.0, 0.0).otherwise(m3 / (m2 * sqrt(m2)))
              .as("skew_g1"))
        H.materialized(out, Nil, Seq(n, occ, sigCk))
      }),

    // Burrows' Delta between language sub-corpora: z-score each
    // language's relative frequency (micro-exact integers) of the 20
    // globally most frequent tokens against the cross-language mean and
    // population sd, then Delta(l1,l2) = mean |z1 - z2| over the
    // vocabulary, milli-quantized per word BEFORE the cross-word sum so
    // the only multi-row double reduction is an integer one. The dense
    // (lang x term) grid is a 100-row broadcast; only the token census
    // touches the corpus.
    Q("text_burrows_delta",
      Some(
        """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS term
          |  FROM documents),
          |tk AS (SELECT lang, term FROM tok WHERE term <> ''),
          |tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS t
          |  FROM tk GROUP BY 1),
          |top AS (SELECT term FROM (SELECT term, row_number() OVER
          |  (ORDER BY count(*) DESC, term) AS rk FROM tk GROUP BY term)
          |  WHERE rk <= 20),
          |cnt AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS c
          |  FROM tk GROUP BY 1, 2),
          |grid AS (SELECT tot.lang, top.term,
          |  coalesce(cnt.c, 0) * 1000000 // tot.t AS f
          |  FROM tot CROSS JOIN top
          |  LEFT JOIN cnt ON cnt.lang = tot.lang AND cnt.term = top.term),
          |st AS (SELECT term, CAST(count(*) AS BIGINT) AS l,
          |  sum(f) // count(*) AS mu FROM grid GROUP BY 1),
          |sd AS (SELECT st.term, st.mu,
          |  sum((g.f - st.mu) * (g.f - st.mu)) // st.l AS var
          |  FROM grid g JOIN st ON st.term = g.term GROUP BY 1, 2, st.l),
          |pw AS (SELECT a.lang AS l1, b.lang AS l2, a.term,
          |  CASE WHEN sd.var <= 0 THEN 0 ELSE CAST(floor(
          |    abs(a.f - b.f) * 1000.0 / sqrt(CAST(sd.var AS DOUBLE)))
          |    AS BIGINT) END AS d
          |  FROM grid a JOIN grid b
          |    ON a.term = b.term AND a.lang < b.lang
          |  JOIN sd ON sd.term = a.term)
          |SELECT l1, l2,
          |  CAST(sum(d) // count(*) AS BIGINT) AS delta_milli,
          |  CAST(max(d) AS BIGINT) AS max_term_d_milli,
          |  min(CASE WHEN d = (SELECT max(d2.d) FROM pw d2
          |    WHERE d2.l1 = pw.l1 AND d2.l2 = pw.l2) THEN term END)
          |    AS top_term
          |FROM pw GROUP BY 1, 2 ORDER BY 1, 2
          |""".stripMargin),
      (s, dir) => {
        val tk = tbl(s, dir, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("term"))
          .filter(col("term") =!= "")
          .localCheckpoint() // token census feeds three aggregations
        val tot = tk.groupBy("lang").agg(count(lit(1)).cast("long").as("t"))
        val top = tk.groupBy("term").agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("n").desc, col("term"))))
          .filter(col("rk") <= 20).select("term")
        val cnt = tk.groupBy("lang", "term")
          .agg(count(lit(1)).cast("long").as("c"))
        val grid = tot.crossJoin(broadcast(top))
          .join(cnt.withColumnRenamed("lang", "cl")
              .withColumnRenamed("term", "ct"),
            col("lang") === col("cl") && col("term") === col("ct"), "left")
          .select(col("lang"), col("term"),
            expr("coalesce(c, 0) * 1000000 div t").as("f"))
          .localCheckpoint() // dense 100-row (lang x term) grid
        val st = grid.groupBy("term")
          .agg(count(lit(1)).cast("long").as("l"),
            expr("sum(f) div count(*)").as("mu"))
        val sd = grid.join(broadcast(st.withColumnRenamed("term", "st_t")),
            col("term") === col("st_t"))
          .groupBy(col("term").as("sd_t"), col("mu"), col("l"))
          .agg(expr("sum((f - mu) * (f - mu)) div l").as("var"))
        val pw = grid.as("ga")
          .join(grid.as("gb"), col("ga.term") === col("gb.term") &&
            col("ga.lang") < col("gb.lang"))
          .join(broadcast(sd), col("ga.term") === col("sd_t"))
          .select(col("ga.lang").as("l1"), col("gb.lang").as("l2"),
            col("ga.term").as("term"),
            when(col("var") <= 0, 0L).otherwise(
              floor(abs(col("ga.f") - col("gb.f")) * lit(1000.0) /
                sqrt(col("var").cast("double"))).cast("long")).as("d"))
        val wmax = Window.partitionBy("l1", "l2")
        val out = pw
          .withColumn("dmax", max("d").over(wmax))
          .groupBy("l1", "l2")
          .agg(expr("sum(d) div count(*)").cast("long").as("delta_milli"),
            max("d").cast("long").as("max_term_d_milli"),
            min(when(col("d") === col("dmax"), col("term")))
              .as("top_term"))
          .orderBy("l1", "l2")
        H.materialized(out, Nil, Seq(tk, grid))
      }))
}
