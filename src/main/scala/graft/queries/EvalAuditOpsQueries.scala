package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Seventy-second wave: corpus and model-audit statistics — Yule's
  * characteristic K (a sample-size-free lexical concentration index),
  * a disparate-impact fairness audit with the four-fifths rule, exact
  * leave-one-source-out influence on the corpus quality metric, and a
  * Nelson-Aalen cumulative-hazard estimate of user lifetime with
  * end-of-window censoring. Every statistic is exact integer
  * arithmetic (micro/centi fixed point) so the DuckDB oracle hashes
  * identically.
  */
object EvalAuditOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Yule's K per source: K = 1e4 * (S2 - N) / N^2 with N total
    // tokens and S2 the sum of squared type frequencies. Reported in
    // centi-K (x100), so the whole statistic is one integer expression
    // over two partial sums — a single keyed aggregation tree that
    // map-side combines at any scale.
    Q("text_yule_k",
      Some(
        """WITH tok AS (SELECT source, w FROM (SELECT source,
          |    unnest(string_split(text, ' ')) AS w FROM documents) x
          |  WHERE length(w) > 0),
          |f AS (SELECT source, w, CAST(count(*) AS BIGINT) AS f
          |  FROM tok GROUP BY 1, 2),
          |a AS (SELECT source, CAST(sum(f) AS BIGINT) AS n_tokens,
          |  CAST(count(*) AS BIGINT) AS n_types,
          |  CAST(sum(f * f) AS BIGINT) AS s2 FROM f GROUP BY 1)
          |SELECT source, n_tokens, n_types,
          |  (s2 - n_tokens) * 1000000 // (n_tokens * n_tokens)
          |    AS yule_k_centi
          |FROM a ORDER BY source
          |""".stripMargin),
      (s, dir) => {
        val f = tbl(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy("source", "w").agg(count(lit(1)).cast("long").as("f"))
        f.groupBy("source")
          .agg(sum("f").cast("long").as("n_tokens"),
            count(lit(1)).cast("long").as("n_types"),
            sum(col("f") * col("f")).cast("long").as("s2"))
          .select(col("source"), col("n_tokens"), col("n_types"),
            expr("(s2 - n_tokens) * 1000000 div (n_tokens * n_tokens)")
              .as("yule_k_centi"))
          .orderBy("source")
      }),

    // Disparate-impact audit of a deterministic document classifier
    // (positive = n_chars >= 300) across language groups: selection
    // rate per group, ratio to the best-treated group, and the EEOC
    // four-fifths flag. Group frame is tiny, so the reference rate
    // rides a broadcast — the fact scan stays one pass.
    Q("eval_fairness_parity",
      Some(
        """WITH g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS pos
          |  FROM documents GROUP BY lang),
          |r AS (SELECT lang, n, pos,
          |  pos * 1000000 // n AS rate_micro FROM g),
          |m AS (SELECT max(rate_micro) AS max_rate FROM r)
          |SELECT r.lang, r.n, r.pos, r.rate_micro,
          |  r.rate_micro * 1000000 // m.max_rate AS di_ratio_micro,
          |  CASE WHEN r.rate_micro * 1000000 // m.max_rate < 800000
          |    THEN 1 ELSE 0 END AS four_fifths_flag
          |FROM r, m ORDER BY lang
          |""".stripMargin),
      (s, dir) => {
        val r = tbl(s, dir, "documents")
          .groupBy("lang")
          .agg(count(lit(1)).cast("long").as("n"),
            sum(when(col("n_chars") >= 300, 1L).otherwise(0L))
              .cast("long").as("pos"))
          .withColumn("rate_micro", expr("pos * 1000000 div n"))
          .localCheckpoint() // max-rate pass + the per-group output
        val m = r.agg(max("rate_micro").as("max_rate"))
        val out = r.crossJoin(broadcast(m))
          .select(col("lang"), col("n"), col("pos"), col("rate_micro"),
            expr("rate_micro * 1000000 div max_rate").as("di_ratio_micro"),
            when(expr("rate_micro * 1000000 div max_rate") < 800000, 1L)
              .otherwise(0L).as("four_fifths_flag"))
          .orderBy("lang")
        H.materialized(out, caches = Nil, checkpoints = Seq(r))
      }),

    // Exact leave-one-source-out influence on the corpus mean quality
    // proxy (mean n_chars, micro fixed point): removing source i moves
    // the mean by loo - overall, computed from per-source partial sums
    // against a broadcast total — no second scan, no per-source
    // recomputation, O(sources) driver-free arithmetic.
    Q("eval_loo_influence",
      Some(
        """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(n_chars) AS BIGINT) AS sc
          |  FROM documents GROUP BY source),
          |t AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
          |  CAST(sum(sc) AS BIGINT) AS ts FROM g)
          |SELECT g.source, g.n AS n_docs,
          |  g.sc * 1000000 // g.n AS mean_micro,
          |  (t.ts - g.sc) * 1000000 // (t.tn - g.n) AS loo_mean_micro,
          |  (t.ts - g.sc) * 1000000 // (t.tn - g.n)
          |    - t.ts * 1000000 // t.tn AS influence_micro
          |FROM g, t ORDER BY source
          |""".stripMargin),
      (s, dir) => {
        val g = tbl(s, dir, "documents")
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("n_chars").cast("long").as("sc"))
          .localCheckpoint() // total pass + the per-source output
        val t = g.agg(sum("n").cast("long").as("tn"),
          sum("sc").cast("long").as("ts"))
        val out = g.crossJoin(broadcast(t))
          .select(col("source"), col("n").as("n_docs"),
            expr("sc * 1000000 div n").as("mean_micro"),
            expr("(ts - sc) * 1000000 div (tn - n)").as("loo_mean_micro"),
            expr("(ts - sc) * 1000000 div (tn - n) - ts * 1000000 div tn")
              .as("influence_micro"))
          .orderBy("source")
        H.materialized(out, caches = Nil, checkpoints = Seq(g))
      }),

    // Nelson-Aalen cumulative hazard of user lifetime (hours from
    // first to last event), right-censored for users still active in
    // the final 24h of the observation window. Risk sets come from a
    // SUFFIX sum over the duration-level frame — bounded by the time
    // domain (<= 720 rows for a 30-day window), never by |users| — and
    // each hazard increment d/n is rounded to micro BEFORE the running
    // sum, so accumulation order cannot leak into the hash.
    Q("ts_nelson_aalen",
      Some(
        """WITH l AS (SELECT user_id, epoch_us(min(ts)) AS fus,
          |  epoch_us(max(ts)) AS lus FROM events GROUP BY user_id),
          |m AS (SELECT max(lus) AS mx FROM l),
          |u AS (SELECT (lus - fus) // 3600000000 AS t_h,
          |  CASE WHEN m.mx - lus >= 86400000000 THEN 1 ELSE 0 END
          |    AS dead FROM l, m),
          |g AS (SELECT t_h, CAST(count(*) AS BIGINT) AS n_at,
          |  CAST(sum(dead) AS BIGINT) AS d FROM u GROUP BY t_h),
          |r AS (SELECT t_h, d, CAST(sum(n_at) OVER
          |  (ORDER BY t_h DESC) AS BIGINT) AS at_risk FROM g),
          |h AS (SELECT t_h, d, at_risk,
          |  d * 1000000 // at_risk AS term_micro FROM r WHERE d > 0)
          |SELECT CAST(t_h AS BIGINT) AS hours, at_risk, d AS deaths,
          |  CAST(term_micro AS BIGINT) AS term_micro,
          |  CAST(sum(term_micro) OVER (ORDER BY t_h) AS BIGINT)
          |    AS cum_hazard_micro
          |FROM h ORDER BY hours
          |""".stripMargin),
      (s, dir) => {
        val l = H.events(s, dir)
          .groupBy("user_id")
          .agg(unix_micros(min("ts")).as("fus"),
            unix_micros(max("ts")).as("lus"))
          .localCheckpoint() // window-end pass + the duration census
        val m = l.agg(max("lus").as("mx"))
        val g = l.crossJoin(broadcast(m))
          .select(expr("(lus - fus) div 3600000000").as("t_h"),
            when(col("mx") - col("lus") >= 86400000000L, 1L)
              .otherwise(0L).as("dead"))
          .groupBy("t_h")
          .agg(count(lit(1)).cast("long").as("n_at"),
            sum("dead").cast("long").as("d"))
        // duration-level frame: bounded by the hour domain, so the
        // unpartitioned windows are constant-size, not data-size
        val out = g
          .withColumn("at_risk", sum("n_at").over(
            Window.orderBy(col("t_h").desc)).cast("long"))
          .filter(col("d") > 0)
          .withColumn("term_micro", expr("d * 1000000 div at_risk"))
          .withColumn("cum_hazard_micro",
            sum("term_micro").over(Window.orderBy("t_h")).cast("long"))
          .select(col("t_h").cast("long").as("hours"), col("at_risk"),
            col("d").as("deaths"), col("term_micro").cast("long"),
            col("cum_hazard_micro"))
          .orderBy("hours")
        H.materialized(out, caches = Nil, checkpoints = Seq(l))
      }))
}
