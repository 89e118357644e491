package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}

/** Round-11 wave 158: preference-pair / RLHF data prep — per-prompt
  * response pairing plus a Bradley–Terry strength fit (Hunter 2004 MM
  * iteration) from exact integer win counts. This is the reward-model
  * data-prep face the board's rank_* evals lack: given pairwise
  * preferences between K candidate systems, recover a per-system
  * strength on a common scale.
  *
  * Scale shape: the ONLY fact-sized work is one window pass (pair
  * consecutive events per user) and one count reduce onto the bounded
  * K×K = 8×8 comparison grid; the MM iteration runs on a single-row
  * frame carrying the 64-cell matrix as arrays — round count and state
  * are INDEPENDENT of corpus size (the stable-matching discipline).
  * All iteration arithmetic is FIXED-POINT INTEGER (micros, floor
  * division, DECIMAL(38,0)/HUGEINT-widened products), so both engines
  * compute bit-identical sequences — no float-accumulation drift.
  *
  * Reference anchor: the reference pipeline's run-report aggregations
  * (reference readme.md run reports) have no preference-learning
  * surface; this wave extends SURVEY §2.2 per the r10 verdict item 5a.
  */
object PrefRlhfOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // BRADLEY-TERRY preference fit: "prompts" are users, "responses" are
    // their events; consecutive events per user (by ts, event_id) form a
    // preference pair between system A = event_id%8 and system B, won by
    // the higher `value` (ties: lower system id). Win counts W_i and the
    // symmetric games matrix g_ij feed 20 MM rounds in integer micros:
    //   D_i   = Σ_j floor(g_ij·1e9 / (p_i + p_j))
    //   p'_i  = floor(W_i·1e9 / D_i)          (p in micros: p_real·1e6)
    //   p''_i = floor(p'_i·8e6 / Σ p')        (renormalize Σp ≈ 8e6)
    // Output: one row per system — games, wins, win rate, fitted
    // strength (micros), rank by strength.
    Q("pref_bradley_terry",
      Some {
        // p'(i) as DuckDB text (1-based lists); referenced twice in the
        // normalize step (numerator + sum), so built once here
        val praw = """list_transform(range(0, 8), i -> CASE
          |      WHEN wt[i+1] = 0 THEN p[i+1]
          |      ELSE CAST(CAST(w[i+1] AS HUGEINT) * 1000000000 //
          |        list_sum(list_transform(range(0, 8), j -> CASE
          |          WHEN j = i THEN CAST(0 AS HUGEINT)
          |          ELSE CAST(g[i*8+j+1] AS HUGEINT) * 1000000000
          |            // (p[i+1] + p[j+1]) END)) AS BIGINT) END)""".stripMargin
        s"""WITH RECURSIVE e AS (
          |  SELECT user_id AS u, event_id AS id, ts, value AS v,
          |    CAST(event_id % 8 AS BIGINT) AS sys
          |  FROM events),
          |pr AS (
          |  SELECT u, sys, v,
          |    lag(sys) OVER (PARTITION BY u ORDER BY ts, id) AS psys,
          |    lag(v) OVER (PARTITION BY u ORDER BY ts, id) AS pv
          |  FROM e),
          |cmp AS (
          |  SELECT CASE WHEN v > pv OR (v = pv AND sys < psys)
          |      THEN sys ELSE psys END AS win,
          |    CASE WHEN v > pv OR (v = pv AND sys < psys)
          |      THEN psys ELSE sys END AS los
          |  FROM pr WHERE psys IS NOT NULL AND psys <> sys),
          |wc AS (SELECT win, los, CAST(count(*) AS BIGINT) AS n
          |  FROM cmp GROUP BY 1, 2),
          |sym AS (SELECT win AS a, los AS b, n FROM wc
          |  UNION ALL SELECT los, win, n FROM wc),
          |gcell AS (SELECT a, b, CAST(sum(n) AS BIGINT) AS g
          |  FROM sym GROUP BY 1, 2),
          |idx AS (SELECT range AS i FROM range(8)),
          |grid AS (SELECT i.i AS i, j.i AS j, coalesce(gc.g, 0) AS g
          |  FROM idx i CROSS JOIN idx j
          |  LEFT JOIN gcell gc ON gc.a = i.i AND gc.b = j.i),
          |packed AS (SELECT
          |  (SELECT list(g ORDER BY i * 8 + j) FROM grid) AS g,
          |  (SELECT list(coalesce(wn, 0) ORDER BY i.i) FROM idx i
          |    LEFT JOIN (SELECT win, CAST(sum(n) AS BIGINT) AS wn
          |      FROM wc GROUP BY 1) ww ON ww.win = i.i) AS w,
          |  (SELECT list(gt ORDER BY i) FROM
          |    (SELECT i, CAST(sum(g) AS BIGINT) AS gt
          |     FROM grid GROUP BY 1) t) AS wt),
          |it AS (
          |  SELECT 0 AS t,
          |    list_transform(range(0, 8),
          |      i -> CAST(1000000 AS BIGINT)) AS p, g, w, wt
          |  FROM packed
          |  UNION ALL
          |  SELECT t + 1,
          |    list_transform(range(0, 8), i -> CASE
          |      WHEN wt[i+1] = 0 THEN p[i+1]
          |      ELSE CAST(CAST(($praw)[i+1] AS HUGEINT) * 8000000
          |        // list_sum($praw) AS BIGINT) END),
          |    g, w, wt
          |  FROM it WHERE t < 20),
          |fin AS (SELECT p, g, w, wt FROM it WHERE t = 20)
          |SELECT i.i AS sys, fin.wt[i.i+1] AS games, fin.w[i.i+1] AS wins,
          |  CASE WHEN fin.wt[i.i+1] = 0 THEN 0
          |    ELSE fin.w[i.i+1] * 1000 // fin.wt[i.i+1] END
          |    AS win_rate_milli,
          |  fin.p[i.i+1] AS strength_micro,
          |  CAST(row_number() OVER (ORDER BY fin.p[i.i+1] DESC, i.i)
          |    AS BIGINT) AS rank
          |FROM idx i CROSS JOIN fin
          |ORDER BY sys
          |""".stripMargin
      },
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = H.events(s, dir).select(
          col("user_id").as("u"), col("event_id").as("id"),
          col("ts"), col("value").as("v"),
          pmod(col("event_id"), lit(8)).cast("long").as("sys"))
        val w = Window.partitionBy("u").orderBy(col("ts"), col("id"))
        val won = col("v") > col("pv") ||
          (col("v") === col("pv") && col("sys") < col("psys"))
        val cmp = e
          .withColumn("psys", lag("sys", 1).over(w))
          .withColumn("pv", lag("v", 1).over(w))
          .filter(col("psys").isNotNull && col("psys") =!= col("sys"))
          .select(when(won, col("sys")).otherwise(col("psys")).as("win"),
            when(won, col("psys")).otherwise(col("sys")).as("los"))
        val wc = cmp.groupBy("win", "los")
          .agg(count(lit(1)).cast("long").as("n"))
          .localCheckpoint() // read by the symmetric grid AND the win census
        val sym = wc.select(col("win").as("a"), col("los").as("b"), col("n"))
          .unionByName(wc.select(col("los").as("a"), col("win").as("b"), col("n")))
        val gcell = sym.groupBy("a", "b").agg(sum("n").cast("long").as("g"))
        val idx = s.range(8).select(col("id").as("i"))
        val grid = idx.crossJoin(idx.select(col("i").as("j")))
          .join(gcell, col("a") === col("i") && col("b") === col("j"), "left")
          .select(col("i"), col("j"), coalesce(col("g"), lit(0L)).as("g"))
        val wins = idx.join(
            wc.groupBy("win").agg(sum("n").cast("long").as("wn")),
            col("win") === col("i"), "left")
          .select(col("i"), coalesce(col("wn"), lit(0L)).as("wn"))
        // pack the bounded 8×8 state into ONE row of arrays (ordered by
        // explicit sort keys — collect_list alone is order-nondeterministic)
        val packed = grid
          .agg(expr("transform(sort_array(collect_list(struct(i*8+j AS k, g))), x -> x.g)").as("g"))
          .crossJoin(wins.agg(
            expr("transform(sort_array(collect_list(struct(i AS k, wn))), x -> x.wn)").as("w")))
          .crossJoin(grid.groupBy("i").agg(sum("g").cast("long").as("gt"))
            .agg(expr("transform(sort_array(collect_list(struct(i AS k, gt))), x -> x.gt)").as("wt")))
          .withColumn("p", expr("array_repeat(CAST(1000000 AS BIGINT), 8)"))
        // 20 MM rounds on the single-row frame; localCheckpoint per round
        // keeps the expression tree linear (each round references p up to
        // 4×; un-cut lineage would duplicate the subtree 4^20 times)
        val prawE =
          """transform(sequence(0, 7), i -> CASE
            |  WHEN wt[i] = 0 THEN p[i]
            |  ELSE CAST(CAST(w[i] AS DECIMAL(38,0)) * 1000000000 div
            |    aggregate(sequence(0, 7), CAST(0 AS BIGINT), (acc, j) ->
            |      acc + CASE WHEN j = i THEN CAST(0 AS BIGINT)
            |        ELSE CAST(CAST(g[i*8+j] AS DECIMAL(38,0)) * 1000000000
            |          div (p[i] + p[j]) AS BIGINT) END) AS BIGINT) END)""".stripMargin
        val pnewE =
          """transform(sequence(0, 7), i -> CASE
            |  WHEN wt[i] = 0 THEN p[i]
            |  ELSE CAST(CAST(praw[i] AS DECIMAL(38,0)) * 8000000 div
            |    aggregate(praw, CAST(0 AS BIGINT), (acc, x) -> acc + x)
            |    AS BIGINT) END)""".stripMargin
        var st = packed.localCheckpoint()
        val toFree = scala.collection.mutable.ListBuffer(st)
        for (_ <- 1 to 20) {
          st = st.withColumn("praw", expr(prawE))
            .withColumn("p", expr(pnewE)).drop("praw")
            .localCheckpoint()
          toFree += st
        }
        val out = idx.crossJoin(st)
          .select(col("i").as("sys"),
            expr("wt[i]").as("games"), expr("w[i]").as("wins"),
            expr("CASE WHEN wt[i] = 0 THEN 0L ELSE w[i] * 1000 div wt[i] END")
              .as("win_rate_milli"),
            expr("p[i]").as("strength_micro"))
          .withColumn("rank", row_number().over(
            Window.orderBy(col("strength_micro").desc, col("sys")))
            .cast("long")) // bounded 8-row domain: single-partition window OK
          .orderBy("sys")
        H.materialized(out, caches = Nil,
          checkpoints = toFree.toSeq :+ wc)
      })
  )
}
