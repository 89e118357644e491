package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{VectorSim => VS}

/** Thirteenth wave: corpus-mining ops — contrastive hard-negative mining
  * over the embedding table, collocation extraction by exact lift,
  * context-length truncation-loss accounting, and a shuffle-key skew
  * diagnostic (the report a 100 TB job would consult before choosing a
  * salting factor).
  *
  * Determinism: no emitted value passes through ln/exp (engine libm ULPs
  * differ) — collocation strength is the exact-integer lift ratio
  * c_ab·W/(c_a·c_b), the skew report's Gini comes from the closed-form
  * integer identity, and every double is a single IEEE division of
  * BIGINT-derived operands (bit-identical across Spark and DuckDB).
  */
object MiningOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // HARD-NEGATIVE MINING for contrastive training: for each of 20 probe
    // vectors, the 3 most-cosine-similar vectors carrying a DIFFERENT
    // label — the "hardest" negatives an embedding trainer wants in-batch.
    // Shape: the probe set is tiny by construction (a minibatch), so it
    // broadcasts and the corpus streams past it exactly once — at 100 TB
    // the corpus side stays a partitioned scan with a per-partition top-k
    // (the window's rank<=3 plans as WindowGroupLimit push-down), and only
    // probes×3 rows survive to the final exchange. Exact by design; the
    // ANN variants (sim_ann_lsh / sim_ivf_topk) are the recall-tradeoff
    // path when the probe set itself is huge.
    Q("sim_hard_negatives",
      Some("WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v " +
        "FROM embeddings), " +
        s"n AS (SELECT vec_id, label, v, (${VS.norm2Sql("v")}) AS nrm FROM e), " +
        "p AS (SELECT q.vec_id AS qid, q.label AS qlabel, c.vec_id AS vid, " +
        "c.label AS vlabel, " +
        s"(${VS.dotSql("q.v", "c.v")}) / (sqrt(q.nrm) * sqrt(c.nrm)) AS sim " +
        "FROM n q, n c WHERE q.vec_id < 20 AND c.label <> q.label) " +
        "SELECT qid, qlabel, vid, vlabel, CAST(row_number() OVER " +
        "(PARTITION BY qid ORDER BY sim DESC, vid) AS BIGINT) AS rnk, sim " +
        "FROM p QUALIFY rnk <= 3 ORDER BY qid, rnk"),
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("v"))
        val n = e.withColumn("nrm", VS.norm2("v"))
        val q = n.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("label").as("qlabel"),
            col("v").as("qv"), col("nrm").as("qn"))
        val c = n.select(col("vec_id").as("vid"), col("label").as("vlabel"),
          col("v").as("cv"), col("nrm").as("cn"))
        val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vid"))
        c.join(broadcast(q), col("vlabel") =!= col("qlabel"))
          .withColumn("sim",
            VS.dot("qv", "cv") / (sqrt(col("qn")) * sqrt(col("cn"))))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select("qid", "qlabel", "vid", "vlabel", "rnk", "sim")
          .orderBy("qid", "rnk")
      }),

    // COLLOCATION EXTRACTION: top-20 adjacent-bigram collocations by lift
    // = P(ab)/(P(a)P(b)) = c_ab·W/(c_a·c_b), min support 5. Lift is a
    // strictly monotone transform of PMI, so the ranking is the PMI
    // ranking without ever calling ln (libm ULPs differ across engines).
    // Shape: one posexplode → two partial-agg counts (bigram and unigram,
    // both map-side combined), unigram counts join back twice — unhinted,
    // so AQE broadcasts the vocabulary while it's small and falls back to
    // a shuffled hash join when it isn't; the bigram stream never
    // materializes anything wider than (a, b, count). W rides along as a
    // broadcast one-row total.
    Q("text_collocations",
      Some(
        """WITH s AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
          |tok AS (SELECT doc_id, unnest(ts) AS tok,
          |               generate_subscripts(ts, 1) AS pos FROM s),
          |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
          |w AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
          |big AS (SELECT a.tok AS a, b.tok AS b, CAST(count(*) AS BIGINT) AS cab
          |        FROM tok a JOIN tok b
          |          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          |        GROUP BY 1, 2 HAVING count(*) >= 5)
          |SELECT a, b, cab, ua.c AS ca, ub.c AS cb,
          |       CAST(cab * n AS DOUBLE) / CAST(ua.c * ub.c AS DOUBLE) AS lift
          |FROM big JOIN uni ua ON big.a = ua.tok
          |         JOIN uni ub ON big.b = ub.tok, w
          |ORDER BY lift DESC, a, b LIMIT 20""".stripMargin),
      (s, dir) => {
        // the token stream feeds four consumers (bigram self-join twice,
        // unigram counts, the total) and is deliberately NOT cached:
        // regenerating a posexplode over the (columnar, codegen'd) parquet
        // scan measures cheaper than writing the exploded rows to storage
        // once — measured both ways at sf0.1 and 10x
        val tok = tbl(s, dir, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .select(col("doc_id"), (col("pos") + 1).as("pos"),
            col("col").as("tok"))
        val uni = tok.groupBy("tok").agg(count(lit(1)).as("c"))
        val w = tok.agg(count(lit(1)).as("n"))
        val big = tok.as("a")
          .join(tok.as("b"),
            col("a.doc_id") === col("b.doc_id") &&
              col("b.pos") === col("a.pos") + 1)
          .groupBy(col("a.tok").as("a"), col("b.tok").as("b"))
          .agg(count(lit(1)).as("cab"))
          .filter(col("cab") >= 5)
        // vocabulary joins carry NO broadcast hint: the unigram table is
        // sublinear in the corpus but still unbounded (a 100 TB crawl has
        // billions of distinct tokens) — AQE broadcasts it while it's small
        // and degrades to a shuffled hash join when it isn't, which a
        // forced hint would turn into an executor OOM instead
        big
          .join(uni.select(col("tok").as("a"), col("c").as("ca")), Seq("a"))
          .join(uni.select(col("tok").as("b"), col("c").as("cb")), Seq("b"))
          .crossJoin(broadcast(w))
          .select(col("a"), col("b"), col("cab"), col("ca"), col("cb"),
            ((col("cab") * col("n")).cast("double") /
              (col("ca") * col("cb")).cast("double")).as("lift"))
          .orderBy(col("lift").desc, col("a"), col("b"))
          .limit(20)
      }),

    // TRUNCATION-LOSS REPORT: per language, how many subword tokens a
    // context length of L=64 discards — the accounting a pretraining run
    // does before choosing sequence length (tokens use the corpus's
    // 4-char subword rule, same as text_tokens_bpe / vocab_fertility).
    // One map pass computes each doc's exact token count with the
    // higher-order fold (codegen, no UDF), then a single map-side-combined
    // aggregation; loss_frac is one IEEE division of exact BIGINTs.
    Q("vocab_truncation_loss",
      Some(
        """WITH d AS (
          |  SELECT lang, list_sum(list_apply(string_split(text, ' '),
          |    w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS t
          |  FROM documents)
          |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(CASE WHEN t > 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
          |  CAST(sum(t) AS BIGINT) AS total_tokens,
          |  CAST(sum(least(t, 64)) AS BIGINT) AS kept_tokens,
          |  CAST(sum(t) - sum(least(t, 64)) AS BIGINT) AS lost_tokens,
          |  CAST(sum(t) - sum(least(t, 64)) AS DOUBLE) / CAST(sum(t) AS DOUBLE)
          |    AS loss_frac
          |FROM d GROUP BY lang ORDER BY lang""".stripMargin),
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(col("lang"),
            expr("aggregate(split(text, ' '), 0L, " +
              "(acc, w) -> acc + CAST(ceil(length(w) / 4.0) AS LONG))").as("t"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("t") > 64, 1).otherwise(0)).cast("long")
              .as("n_truncated"),
            sum("t").cast("long").as("total_tokens"),
            sum(least(col("t"), lit(64L))).cast("long").as("kept_tokens"),
            (sum("t") - sum(least(col("t"), lit(64L)))).cast("long")
              .as("lost_tokens"),
            ((sum("t") - sum(least(col("t"), lit(64L)))).cast("double") /
              sum("t").cast("double")).as("loss_frac"))
          .orderBy("lang")),

    // SHUFFLE-KEY SKEW DIAGNOSTIC on lineitem.l_suppkey: the one-row
    // report that decides a salting factor before a 100 TB shuffle —
    // top-1 key share, share held by the top decile of keys, and the Gini
    // coefficient of the key histogram via the closed-form rank identity
    // G = (2·Σ rank·c − (n+1)·Σc) / (n·Σc), every term an exact BIGINT
    // (ranks are deterministic: counts ascending, key as tie-break).
    // Shape: the heavy pass is one map-side-combined count; everything
    // after runs on the |keys| distribution, which is the domain, not the
    // data — the report costs one scan regardless of skew.
    Q("dq_skew_report",
      Some(
        """WITH c AS (
          |  SELECT l_suppkey AS k, CAST(count(*) AS BIGINT) AS c
          |  FROM lineitem GROUP BY 1),
          |r AS (SELECT k, c, CAST(row_number() OVER (ORDER BY c, k) AS BIGINT)
          |        AS rnk, CAST(count(*) OVER () AS BIGINT) AS nk FROM c),
          |a AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
          |             CAST(sum(c) AS BIGINT) AS n_rows,
          |             CAST(max(c) AS BIGINT) AS max_c,
          |             CAST(sum(rnk * c) AS BIGINT) AS src,
          |             CAST(sum(CASE WHEN rnk * 10 > nk * 9 THEN c ELSE 0 END)
          |               AS BIGINT) AS top_decile_rows
          |      FROM r)
          |SELECT n_keys, n_rows, max_c,
          |  CAST(max_c AS DOUBLE) / CAST(n_rows AS DOUBLE) AS top1_share,
          |  CAST(top_decile_rows AS DOUBLE) / CAST(n_rows AS DOUBLE)
          |    AS top_decile_share,
          |  CAST(2 * src - (n_keys + 1) * n_rows AS DOUBLE) /
          |    CAST(n_keys * n_rows AS DOUBLE) AS gini
          |FROM a""".stripMargin),
      (s, dir) => {
        val c = tbl(s, dir, "lineitem")
          .groupBy(col("l_suppkey").as("k")).agg(count(lit(1)).as("c"))
        // r9: the rank over the |keys| frame is a two-phase PARALLEL
        // global rank (H.globalRank) — the key domain is exactly what a
        // skew report profiles, so it can be 10⁸ rows; the old global
        // row_number sorted it in ONE task (the events_rfm nit class)
        val (ranked, pp) = H.globalRank(c, Seq(col("c"), col("k")), "rnk")
        val r = ranked.crossJoin(broadcast(
          pp.agg(count(lit(1)).cast("long").as("nk"))))
        val out = r.agg(count(lit(1)).as("n_keys"), sum("c").cast("long").as("n_rows"),
            max("c").cast("long").as("max_c"),
            sum(col("rnk") * col("c")).cast("long").as("src"),
            sum(when(col("rnk") * 10 > col("nk") * 9, col("c")).otherwise(0L))
              .cast("long").as("top_decile_rows"))
          .select(col("n_keys"), col("n_rows"), col("max_c"),
            (col("max_c").cast("double") / col("n_rows").cast("double"))
              .as("top1_share"),
            (col("top_decile_rows").cast("double") /
              col("n_rows").cast("double")).as("top_decile_share"),
            ((lit(2) * col("src") - (col("n_keys") + 1) * col("n_rows"))
              .cast("double") /
              (col("n_keys") * col("n_rows")).cast("double")).as("gini"))
        H.materialized(out, caches = Nil, checkpoints = Seq(pp))
      })
  )
}
