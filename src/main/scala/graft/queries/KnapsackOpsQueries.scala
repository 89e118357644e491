package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Fifty-eighth wave: optimal context selection as a 0/1 knapsack DP —
  * per source, pick the doc subset maximizing a quality score within a
  * quantized token budget, folded with a 129-slot DP array state. The
  * exact-DP answer rides next to the greedy density heuristic, so the
  * query measures the heuristic's optimality gap — the number the
  * pack_bin_ffd/pack_contexts family cannot see. Per-shard-sequential
  * fold, shards (sources) in parallel; capacity is the bounded-state
  * contract (quantized weights keep the DP array at 129 BIGINTs no
  * matter the corpus).
  */
object KnapsackOpsQueries extends QueryModule {

  private val Cap = 128 // budget in 16-token units (2048 tokens)

  def all: Seq[Q] = Seq(

    Q("pack_knapsack_dp",
      Some(
        s"""WITH RECURSIVE d AS MATERIALIZED (
           |  SELECT doc_id, source,
           |    greatest(len(string_split(text, ' ')) // 16, 1) AS w,
           |    CAST(n_chars AS BIGINT) AS q
           |  FROM documents WHERE doc_id % 4 = 0),
           |it AS (SELECT doc_id, source, w, q, CAST(row_number() OVER
           |  (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rn
           |  FROM d),
           |nn AS (SELECT source, CAST(count(*) AS BIGINT) AS n
           |  FROM it GROUP BY source),
           |f AS (
           |  SELECT nn.source, 0 AS t,
           |    [CAST(0 AS BIGINT) FOR i IN range(0, ${Cap + 1})] AS dp,
           |    nn.n
           |  FROM nn
           |  UNION ALL
           |  SELECT f.source, f.t + 1,
           |    [CASE WHEN i >= it.w AND dp[1 + i - CAST(it.w AS INT)] + it.q
           |        > dp[i + 1]
           |      THEN dp[1 + i - CAST(it.w AS INT)] + it.q
           |      ELSE dp[i + 1] END FOR i IN range(0, ${Cap + 1})],
           |    f.n
           |  FROM f JOIN it ON it.source = f.source AND it.rn = f.t + 1
           |  WHERE f.t < f.n
           |),
           |opt AS (SELECT source, dp[${Cap + 1}] AS best_q FROM f
           |  WHERE t = n),
           |greedy AS (
           |  SELECT source, CAST(sum(q) AS BIGINT) AS greedy_q FROM (
           |    SELECT source, q, w,
           |      CAST(sum(w) OVER (PARTITION BY source
           |        ORDER BY q * 1000 // w DESC, doc_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |        AS BIGINT) AS cw
           |    FROM it) g WHERE cw <= $Cap GROUP BY source)
           |SELECT o.source, CAST(o.best_q AS BIGINT) AS optimal_q,
           |  coalesce(g.greedy_q, 0) AS greedy_q,
           |  coalesce(g.greedy_q, 0) * 1000000
           |    // greatest(o.best_q, 1) AS greedy_ratio_micro
           |FROM opt o LEFT JOIN greedy g ON g.source = o.source
           |ORDER BY o.source
           |""".stripMargin),
      (s, dir) => {
        val it = tbl(s, dir, "documents")
          .filter(pmod(col("doc_id"), lit(4)) === 0)
          .select(col("doc_id"), col("source"),
            greatest(expr("size(split(text, ' ', -1)) div 16"), lit(1))
              .cast("long").as("w"),
            col("n_chars").cast("long").as("q"))
          .localCheckpoint() // DP arrays + the greedy pass
        val packed = it
          .groupBy("source")
          .agg(transform(array_sort(collect_list(struct(col("doc_id"),
            col("w"), col("q")))), p =>
            struct(p.getField("w").as("w"), p.getField("q").as("q")))
            .as("items"))
          .withColumn("dp", expr(
            s"""aggregate(items,
               |  transform(sequence(0, $Cap), i -> 0L),
               |  (dp, item) -> transform(dp, (v, i) ->
               |    CASE WHEN i >= item.w
               |        AND element_at(dp, CAST(i - item.w + 1 AS INT))
               |          + item.q > v
               |      THEN element_at(dp, CAST(i - item.w + 1 AS INT))
               |        + item.q
               |      ELSE v END))""".stripMargin))
          .select(col("source"),
            element_at(col("dp"), Cap + 1).as("optimal_q"))
        val wg = org.apache.spark.sql.expressions.Window
          .partitionBy("source")
          .orderBy(expr("q * 1000 div w").desc, col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        val greedy = it
          .withColumn("cw", sum("w").over(wg).cast("long"))
          .filter(col("cw") <= Cap)
          .groupBy("source").agg(sum("q").cast("long").as("greedy_q"))
        val out = packed
          .join(greedy, Seq("source"), "left")
          .withColumn("greedy_q", coalesce(col("greedy_q"), lit(0L)))
          .select(col("source"), col("optimal_q"), col("greedy_q"),
            expr("greedy_q * 1000000 div greatest(optimal_q, 1L)")
              .as("greedy_ratio_micro"))
          .orderBy("source")
        H.materialized(out, caches = Nil, checkpoints = Seq(it))
      }))
}
