package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, QueryModule}
import graft.H.tbl

/** Round-9 wave 144: Jensen–Shannon divergence between source token
  * distributions (the symmetric, bounded corpus-drift measure next to the
  * board's TVD and mutual-information legs) and empirical-Bayes
  * beta-binomial shrinkage (small-area estimation — the fix for ranking
  * noisy per-entity rates by raw value).
  */
object JsdShrinkOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // JSD MATRIX: token distributions per source in exact micro shares;
    // for every source pair the dense (pair × vocab) grid — tokens
    // missing on one side matter (they contribute p·ln2, which is
    // exactly what separates JSD from naive overlap) — with each
    // (pair, token) term computed per row in identical double trees and
    // nano-quantized BEFORE the only cross-row sum (integer). Top-15
    // most divergent pairs. Scale shape: one fact-sized token census;
    // the pair grid is (|sources|² × vocab) — catalog-domain (sources
    // are a mix dimension, the corpus_drift_tvd argument).
    Q("corpus_jsd_matrix",
      Some(
        """WITH tok AS (
          |  SELECT source, unnest(string_split(text, ' ')) AS t
          |  FROM documents),
          |tk AS (SELECT source, t FROM tok WHERE t <> ''),
          |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n
          |  FROM tk GROUP BY 1),
          |dist AS (
          |  SELECT tk.source, tk.t,
          |    CAST(count(*) * 1000000 // max(tot.n) AS BIGINT) AS p_micro
          |  FROM tk JOIN tot ON tot.source = tk.source
          |  GROUP BY 1, 2),
          |vocab AS (SELECT DISTINCT t FROM tk),
          |pairs AS (SELECT a.source AS sa, b.source AS sb
          |  FROM tot a JOIN tot b ON a.source < b.source),
          |grid AS (
          |  SELECT p.sa, p.sb, v.t,
          |    coalesce(da.p_micro, 0) AS p, coalesce(db.p_micro, 0) AS q
          |  FROM pairs p CROSS JOIN vocab v
          |  LEFT JOIN dist da ON da.source = p.sa AND da.t = v.t
          |  LEFT JOIN dist db ON db.source = p.sb AND db.t = v.t),
          |terms AS (
          |  SELECT sa, sb,
          |    CASE WHEN p > 0 OR q > 0 THEN CAST(floor((
          |      CASE WHEN p > 0 THEN CAST(p AS DOUBLE) / 1000000.0
          |        * ln(CAST(p AS DOUBLE) * 2.0
          |          / (CAST(p AS DOUBLE) + CAST(q AS DOUBLE))) ELSE 0.0 END
          |      + CASE WHEN q > 0 THEN CAST(q AS DOUBLE) / 1000000.0
          |        * ln(CAST(q AS DOUBLE) * 2.0
          |          / (CAST(p AS DOUBLE) + CAST(q AS DOUBLE))) ELSE 0.0 END
          |      ) * 500000000.0) AS BIGINT) ELSE 0 END AS term_nano,
          |    CASE WHEN p > 0 AND q > 0 THEN 1 ELSE 0 END AS shared
          |  FROM grid),
          |jsd AS (SELECT sa, sb, CAST(sum(term_nano) AS BIGINT) AS jsd_nano,
          |    CAST(sum(shared) AS BIGINT) AS n_shared
          |  FROM terms GROUP BY 1, 2)
          |SELECT sa, sb, jsd_nano, n_shared FROM jsd
          |ORDER BY jsd_nano DESC, sa, sb LIMIT 15
          |""".stripMargin),
      (s, dir) => {
        val tk = tbl(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
          .filter(col("t") =!= "")
        val tot = tk.groupBy("source")
          .agg(count(lit(1)).cast("long").as("n"))
        val dist = tk.join(tot, Seq("source"))
          .groupBy("source", "t")
          .agg(expr("CAST(count(1) * 1000000 div max(n) AS BIGINT)")
            .as("p_micro"))
          .localCheckpoint() // joined twice into the pair grid
        val vocab = tk.select("t").distinct()
        val pairs = tot.select(col("source").as("sa"))
          .crossJoin(tot.select(col("source").as("sb")))
          .filter(col("sa") < col("sb"))
        val grid = pairs.crossJoin(broadcast(vocab))
          .join(dist.select(col("source").as("dsa"), col("t").as("ta"),
            col("p_micro").as("p")),
            col("dsa") === col("sa") && col("ta") === col("t"), "left")
          .join(dist.select(col("source").as("dsb"), col("t").as("tb"),
            col("p_micro").as("q")),
            col("dsb") === col("sb") && col("tb") === col("t"), "left")
          .select(col("sa"), col("sb"),
            coalesce(col("p"), lit(0L)).as("p"),
            coalesce(col("q"), lit(0L)).as("q"))
        val terms = grid.select(col("sa"), col("sb"),
          expr(
            """CASE WHEN p > 0 OR q > 0 THEN CAST(floor((
              |  CASE WHEN p > 0 THEN CAST(p AS DOUBLE) / 1000000.0
              |    * ln(CAST(p AS DOUBLE) * 2.0
              |      / (CAST(p AS DOUBLE) + CAST(q AS DOUBLE))) ELSE 0.0 END
              |  + CASE WHEN q > 0 THEN CAST(q AS DOUBLE) / 1000000.0
              |    * ln(CAST(q AS DOUBLE) * 2.0
              |      / (CAST(p AS DOUBLE) + CAST(q AS DOUBLE))) ELSE 0.0 END
              |  ) * 500000000.0) AS BIGINT) ELSE 0 END""".stripMargin)
            .as("term_nano"),
          when(col("p") > 0 && col("q") > 0, 1L).otherwise(0L).as("shared"))
        val out = terms.groupBy("sa", "sb")
          .agg(sum("term_nano").cast("long").as("jsd_nano"),
            sum("shared").cast("long").as("n_shared"))
          .orderBy(col("jsd_nano").desc, col("sa"), col("sb")).limit(15)
        graft.H.materialized(out, Nil, Seq(dist))
      }),

    // EMPIRICAL-BAYES SHRINKAGE: per-nation return rates (R-flag share)
    // shrunk toward the global rate with the beta-binomial
    // method-of-moments prior — K = m(1−m)/v − 1 from the ppm-quantized
    // rate census, shrunk_i = (x_i + K·m) / (n_i + K). The small-area
    // fix: tiny nations stop winning "worst return rate" leaderboards on
    // noise. Determinism: rates quantize to ppm integers per nation; the
    // prior moments are integer sums over the 25-row nation domain; K
    // and the shrunk rates derive per row in identical double trees.
    // Scale shape: one fact-sized (nation) reduce; everything after is
    // the 25-row domain.
    Q("stats_eb_shrinkage",
      Some(
        """WITH r AS (
          |  SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
          |      AS BIGINT) AS x
          |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          |  JOIN customer ON c_custkey = o_custkey
          |  JOIN nation ON n_nationkey = c_nationkey
          |  GROUP BY 1),
          |q AS (SELECT nation, n, x,
          |    CAST(x * 1000000 // n AS BIGINT) AS raw_ppm FROM r),
          |mo AS (SELECT CAST(count(*) AS BIGINT) AS k_n,
          |    CAST(sum(raw_ppm) AS BIGINT) AS s1,
          |    CAST(sum(raw_ppm * raw_ppm) AS BIGINT) AS s2 FROM q),
          |pri AS (SELECT k_n, s1, s2,
          |    CAST(s1 AS DOUBLE) / CAST(k_n AS DOUBLE) / 1000000.0 AS m,
          |    (CAST(s2 AS DOUBLE) / CAST(k_n AS DOUBLE)
          |      - (CAST(s1 AS DOUBLE) / CAST(k_n AS DOUBLE))
          |        * (CAST(s1 AS DOUBLE) / CAST(k_n AS DOUBLE)))
          |      / 1000000.0 / 1000000.0 AS v
          |  FROM mo)
          |SELECT q.nation, q.n, q.x, q.raw_ppm,
          |  CAST(floor((CAST(q.x AS DOUBLE)
          |      + (pri.m * (1.0 - pri.m) / pri.v - 1.0) * pri.m)
          |    / (CAST(q.n AS DOUBLE)
          |      + (pri.m * (1.0 - pri.m) / pri.v - 1.0)) * 1000000.0)
          |    AS BIGINT) AS shrunk_ppm,
          |  CAST(floor((pri.m * (1.0 - pri.m) / pri.v - 1.0)
          |    / (CAST(q.n AS DOUBLE)
          |      + (pri.m * (1.0 - pri.m) / pri.v - 1.0)) * 1000000.0)
          |    AS BIGINT) AS shrink_weight_ppm
          |FROM q CROSS JOIN pri ORDER BY q.nation
          |""".stripMargin),
      (s, dir) => {
        val r = tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
          .join(tbl(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
          .join(broadcast(tbl(s, dir, "nation")),
            col("n_nationkey") === col("c_nationkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
              .cast("long").as("x"))
        val q = r.withColumn("raw_ppm", expr("CAST(x * 1000000 div n AS BIGINT)"))
          .localCheckpoint() // moment pass + output both read it
        val pri = q.agg(count(lit(1)).cast("long").as("k_n"),
            sum("raw_ppm").cast("long").as("s1"),
            sum(expr("raw_ppm * raw_ppm")).cast("long").as("s2"))
          .select(
            expr("CAST(s1 AS DOUBLE) / CAST(k_n AS DOUBLE) / 1000000.0")
              .as("m"),
            expr("""(CAST(s2 AS DOUBLE) / CAST(k_n AS DOUBLE)
              | - (CAST(s1 AS DOUBLE) / CAST(k_n AS DOUBLE))
              |   * (CAST(s1 AS DOUBLE) / CAST(k_n AS DOUBLE)))
              | / 1000000.0 / 1000000.0""".stripMargin).as("v"))
        val out = q.crossJoin(broadcast(pri))
          .select(col("nation"), col("n"), col("x"), col("raw_ppm"),
            expr("""CAST(floor((CAST(x AS DOUBLE)
              |    + (m * (1.0 - m) / v - 1.0) * m)
              |  / (CAST(n AS DOUBLE) + (m * (1.0 - m) / v - 1.0))
              |  * 1000000.0) AS BIGINT)""".stripMargin).as("shrunk_ppm"),
            expr("""CAST(floor((m * (1.0 - m) / v - 1.0)
              |  / (CAST(n AS DOUBLE) + (m * (1.0 - m) / v - 1.0))
              |  * 1000000.0) AS BIGINT)""".stripMargin)
              .as("shrink_weight_ppm"))
          .orderBy("nation")
        graft.H.materialized(out, Nil, Seq(q))
      })
  )
}
