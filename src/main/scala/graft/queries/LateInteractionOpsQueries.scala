package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{VectorSim => VS}

/** Thirty-sixth wave: late-interaction retrieval (ColBERT-style MaxSim),
  * Kaplan-Meier survival curves, and moving-average lexical diversity.
  * The recurring determinism moves: per-term cosines round to micro
  * BIGINTs BEFORE any multi-row sum (float accumulation order never
  * reaches the compare path), and the KM product recurrence runs as an
  * integer fold — array-fold in Spark, recursive CTE in the oracle.
  */
object LateInteractionOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // ColBERT-style late interaction: documents and queries are SETS of
    // token vectors (4 per unit here, carved from the embedding corpus);
    // score(q, d) = Σ_{qt ∈ q} max_{dt ∈ d} cos(qt, dt). The MaxSim max
    // runs on raw doubles (max is order-free); each query-token's best
    // cosine rounds to micro BEFORE the per-pair sum, so the sum is an
    // integer reduce. Query tokens broadcast (bounded); the corpus side
    // streams — the production late-interaction shape.
    Q("sim_colbert_maxsim",
      Some("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        s"n AS (SELECT vec_id, vec_id // 4 AS unit, v, (${VS.norm2Sql("v")}) AS nrm FROM e), " +
        "q AS (SELECT vec_id AS qtok, unit AS qset, v AS qv, nrm AS qn FROM n WHERE vec_id < 20), " +
        "best AS (SELECT q.qset, q.qtok, c.unit AS doc, " +
        s"max((${VS.dotSql("q.qv", "c.v")}) / (sqrt(q.qn) * sqrt(c.nrm))) AS mx " +
        "FROM q CROSS JOIN n c GROUP BY q.qset, q.qtok, c.unit), " +
        "scored AS (SELECT qset, doc, CAST(sum(CAST(round(mx * 1000000) AS BIGINT)) AS BIGINT) AS score_micro " +
        "FROM best GROUP BY qset, doc) " +
        "SELECT qset, doc, score_micro, CAST(rnk AS BIGINT) AS rnk FROM (" +
        "SELECT qset, doc, score_micro, row_number() OVER " +
        "(PARTITION BY qset ORDER BY score_micro DESC, doc) AS rnk FROM scored) " +
        "WHERE rnk <= 5 ORDER BY qset, rnk"),
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val n = e.select(col("vec_id"), expr("vec_id div 4").as("unit"), col("v"))
        val q = n.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qtok"), col("unit").as("qset"),
            col("v").as("qv"))
        val best = n.select(col("unit").as("doc"), col("v").as("cv"))
          .join(broadcast(q))
          .withColumn("cs", graft.functions.CustomExpressions
            .cosine_sim(col("qv"), col("cv")))
          .groupBy("qset", "qtok", "doc").agg(max("cs").as("mx"))
        val scored = best
          .select(col("qset"), col("doc"),
            expr("CAST(round(mx * 1000000) AS BIGINT)").as("mm"))
          .groupBy("qset", "doc").agg(sum("mm").cast("long").as("score_micro"))
        val w = Window.partitionBy("qset")
          .orderBy(col("score_micro").desc, col("doc"))
        scored.withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 5)
          .select("qset", "doc", "score_micro", "rnk")
          .orderBy("qset", "rnk")
      }),

    // Kaplan-Meier churn survival over the event horizon: a user is
    // "at risk" through their last-seen day; S(d) = S(d−1)·(n_d − d_d)/n_d
    // as a micro-scaled integer fold (floor division — deterministic in
    // both engines, same discipline as the pagerank/markov iterations).
    // The corpus pass reduces to ONE row per user (last day), then a
    // 30-row daily frame; the recurrence folds over an ARRAY in Spark
    // and a recursive CTE in the oracle — no driver loop, no collect.
    Q("ts_survival_km",
      Some("WITH RECURSIVE lastd AS (SELECT user_id, " +
        "max(CAST(strftime(ts, '%d') AS BIGINT)) AS dday FROM events " +
        "GROUP BY user_id), " +
        "deaths AS (SELECT dday AS day, CAST(count(*) AS BIGINT) AS d " +
        "FROM lastd GROUP BY dday), " +
        "spine AS (SELECT unnest(range(1, 31)) AS day), " +
        "t AS (SELECT s.day, coalesce(dd.d, 0) AS d, " +
        "CAST((SELECT count(*) FROM lastd l WHERE l.dday >= s.day) AS BIGINT) AS n " +
        "FROM spine s LEFT JOIN deaths dd ON dd.day = s.day), " +
        "km AS (SELECT CAST(0 AS BIGINT) AS day, CAST(1000000 AS BIGINT) AS s " +
        "UNION ALL SELECT t.day, CASE WHEN t.n = 0 THEN km.s " +
        "ELSE (km.s * (t.n - t.d)) // t.n END " +
        "FROM km JOIN t ON t.day = km.day + 1) " +
        "SELECT km.day, t.n AS n_risk, t.d AS n_deaths, km.s AS surv_micro " +
        "FROM km JOIN t ON t.day = km.day ORDER BY km.day"),
      (s, dir) => {
        val lastd = H.events(s, dir)
          .groupBy("user_id")
          .agg(max(date_format(col("ts"), "d").cast("long")).as("dday"))
          .localCheckpoint() // deaths AND the at-risk suffix both read it
        val deaths = lastd.groupBy(col("dday").as("day"))
          .agg(count(lit(1)).cast("long").as("d"))
        val spine = s.range(1, 31).select(col("id").as("day"))
        // at-risk = suffix count of last-seen days: cross the 30-day spine
        // with the per-day death counts and sum the tail — O(days²) on the
        // 30-row domain, never a per-user pass
        val atRisk = spine.join(broadcast(deaths.select(
            col("day").as("dd"), col("d").as("dc"))),
            col("dd") >= col("day"), "left")
          .groupBy("day").agg(coalesce(sum("dc"), lit(0L)).cast("long").as("n"))
        val t = spine.join(broadcast(deaths), Seq("day"), "left")
          .join(broadcast(atRisk), Seq("day"))
          .select(col("day"), coalesce(col("d"), lit(0L)).as("d"), col("n"))
        // integer fold over the sorted 30-day array: one row carries the
        // whole recurrence, then explodes back to rows
        val folded = t.agg(array_sort(collect_list(struct(col("day"),
            col("d"), col("n")))).as("arr"))
          .select(explode(expr(
            "aggregate(arr, array(named_struct('day', CAST(0 AS BIGINT), " +
              "'n_risk', CAST(0 AS BIGINT), 'n_deaths', CAST(0 AS BIGINT), " +
              "'surv_micro', CAST(1000000 AS BIGINT))), " +
              "(acc, x) -> acc || array(named_struct('day', x.day, " +
              "'n_risk', x.n, 'n_deaths', x.d, " +
              "'surv_micro', CASE WHEN x.n = 0 THEN element_at(acc, -1).surv_micro " +
              "ELSE (element_at(acc, -1).surv_micro * (x.n - x.d)) div x.n END)))"))
            .as("r"))
        H.materialized(
          folded.select(col("r.day").as("day"), col("r.n_risk").as("n_risk"),
            col("r.n_deaths").as("n_deaths"),
            col("r.surv_micro").as("surv_micro"))
            .filter(col("day") > 0) // the fold's seed row is not a day
            .orderBy("day"),
          caches = Nil, checkpoints = Seq(lastd))
      }),

    // Moving-average type-token ratio (MATTR, Covington & McFall 2010):
    // lexical diversity that, unlike raw TTR, does not shrink with
    // document length. Window = 30 tokens, stride 10 (documented
    // sampling — the full-stride form multiplies volume 10× for a
    // near-identical average). Each token explodes into the ≤3 windows
    // that cover it under the stride, distinct-counts reduce per
    // (doc, window), and the per-doc average is an exact scaled integer.
    Q("text_mattr_diversity",
      Some("WITH idxed AS (SELECT doc_id, ws, unnest(range(0, len(ws))) AS i " +
        "FROM (SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z]+') AS ws " +
        "FROM documents) t), " +
        "toks AS (SELECT doc_id, ws[i + 1] AS w, CAST(i AS BIGINT) AS idx " +
        "FROM idxed WHERE ws[i + 1] <> ''), " +
        "seq AS (SELECT doc_id, w, row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY idx) - 1 AS p, " +
        "count(*) OVER (PARTITION BY doc_id) AS nt FROM toks), " +
        "win AS (SELECT doc_id, w, p, nt, unnest(range(0, 3)) AS k FROM seq), " +
        "assigned AS (SELECT doc_id, w, ((p // 10) - k) * 10 AS ws_ FROM win " +
        "WHERE (p // 10) - k >= 0 AND ((p // 10) - k) * 10 + 30 <= nt " +
        "AND p >= ((p // 10) - k) * 10 AND p < ((p // 10) - k) * 10 + 30), " +
        "perwin AS (SELECT doc_id, ws_, CAST(count(DISTINCT w) AS BIGINT) AS dw " +
        "FROM assigned GROUP BY doc_id, ws_), " +
        "perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows, " +
        "CAST(sum(dw) AS BIGINT) AS sum_dw FROM perwin GROUP BY doc_id) " +
        "SELECT doc_id, n_windows, sum_dw, " +
        "(sum_dw * 1000000) // (30 * n_windows) AS mattr_micro " +
        "FROM perdoc ORDER BY doc_id"),
      (s, dir) => {
        val toks = tbl(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(split(lower(col("text")), "[^a-z]+")).as(Seq("i", "w")))
          .filter(col("w") =!= "")
        val seq0 = toks
          .withColumn("p", row_number().over(
            Window.partitionBy("doc_id").orderBy("i")).cast("long") - 1)
          .withColumn("nt", count(lit(1)).over(
            Window.partitionBy("doc_id")).cast("long"))
        val assigned = seq0
          .select(col("doc_id"), col("w"), col("p"), col("nt"),
            explode(expr("sequence(0, 2)")).as("k"))
          .withColumn("ws_", (expr("p div 10") - col("k")) * 10)
          .filter(col("ws_") >= 0 && col("ws_") + 30 <= col("nt") &&
            col("p") >= col("ws_") && col("p") < col("ws_") + 30)
        val perwin = assigned.groupBy("doc_id", "ws_")
          .agg(countDistinct("w").cast("long").as("dw"))
        perwin.groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_windows"),
            sum("dw").cast("long").as("sum_dw"))
          .select(col("doc_id"), col("n_windows"), col("sum_dw"),
            expr("(sum_dw * 1000000) div (30 * n_windows)").as("mattr_micro"))
          .orderBy("doc_id")
      }))
}
