package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Twenty-fourth wave: engagement/efficiency ops — rolling DAU/MAU
  * stickiness (the sliding-window exact distinct), sequence-packing
  * efficiency accounting, and common-neighbor link prediction.
  *
  * Determinism: the rolling distinct comes from a bounded 28-way explode
  * of the REDUCED (user, day) presence stream (never the raw events);
  * packing waste and link-prediction scores are exact integers.
  */
object EngagementOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // DAU/MAU STICKINESS: daily active users over 28-day active users,
    // per day. Rolling COUNT(DISTINCT) doesn't compose as a window
    // aggregate; the exact scale shape is: reduce to the (user, day)
    // presence domain first, then each presence row contributes to the
    // 28 following days via a bounded explode — the shuffle carries
    // |presence|×28 domain rows, never raw events. Stickiness is one
    // exact division; days outside the observed range are dropped so
    // every MAU window is fully inside the data.
    Q("events_stickiness",
      Some(
        """WITH pres AS (
          |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
          |span AS (SELECT min(day) AS lo, max(day) AS hi FROM pres),
          |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM pres
          |        GROUP BY 1),
          |cover AS (
          |  SELECT DISTINCT user_id, day + CAST(k AS INTEGER) AS d
          |  FROM pres, (SELECT unnest(range(0, 28)) AS k) ks),
          |mau AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS mau
          |        FROM cover GROUP BY 1)
          |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, mau.mau,
          |       CAST(dau.dau AS DOUBLE) / CAST(mau.mau AS DOUBLE)
          |         AS stickiness
          |FROM dau JOIN mau ON dau.day = mau.day, span
          |WHERE dau.day >= lo + 27 AND dau.day <= hi
          |ORDER BY day""".stripMargin),
      (s, dir) => {
        val pres = H.events(s, dir)
          .select(col("user_id"), col("ts").cast("date").as("day"))
          .distinct()
        val span = pres.agg(min("day").as("lo"), max("day").as("hi"))
        val dau = pres.groupBy("day").agg(count(lit(1)).as("dau"))
        val cover = pres
          .select(col("user_id"),
            explode(expr("sequence(0, 27)")).as("k"), col("day"))
          .select(col("user_id"), expr("date_add(day, k)").as("day"))
          .distinct()
        val mau = cover.groupBy("day").agg(count(lit(1)).as("mau"))
        dau.join(mau, Seq("day"))
          .crossJoin(broadcast(span))
          .filter(col("day") >= date_add(col("lo"), 27) &&
            col("day") <= col("hi"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("dau"), col("mau"),
            (col("dau").cast("double") / col("mau").cast("double"))
              .as("stickiness"))
          .orderBy("day")
      }),

    // PACKING EFFICIENCY: for the contiguous 512-token packing of
    // pack_contexts, the per-source accounting a data engineer reads —
    // packs produced, tail waste, fill rate, and how many documents
    // straddle a pack boundary (each straddler costs a cross-example
    // attention mask downstream). All from the same one-window prefix
    // sum; waste and straddles are exact integers.
    Q("pack_efficiency",
      Some(
        """WITH d AS (
          |  SELECT doc_id, source,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          |  FROM documents),
          |c AS (
          |  SELECT doc_id, source, n_tokens,
          |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      - n_tokens AS BIGINT) AS begin_pos
          |  FROM d)
          |SELECT source,
          |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
          |  CAST((sum(n_tokens) + 511) // 512 AS BIGINT) AS n_packs,
          |  CAST((sum(n_tokens) + 511) // 512 * 512 - sum(n_tokens)
          |    AS BIGINT) AS tail_waste,
          |  CAST(sum(n_tokens) AS DOUBLE) /
          |    CAST((sum(n_tokens) + 511) // 512 * 512 AS DOUBLE) AS fill_rate,
          |  CAST(sum(CASE WHEN begin_pos // 512 <>
          |    (begin_pos + n_tokens - 1) // 512 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS straddlers
          |FROM c GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        tbl(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .withColumn("begin_pos",
            sum("n_tokens").over(w) - col("n_tokens"))
          .groupBy("source")
          .agg(sum("n_tokens").cast("long").as("total_tokens"),
            expr("CAST((sum(n_tokens) + 511) div 512 AS BIGINT)")
              .as("n_packs"),
            expr("CAST((sum(n_tokens) + 511) div 512 * 512 - sum(n_tokens)" +
              " AS BIGINT)").as("tail_waste"),
            expr("CAST(sum(n_tokens) AS DOUBLE) / " +
              "CAST((sum(n_tokens) + 511) div 512 * 512 AS DOUBLE)")
              .as("fill_rate"),
            sum(when(expr("begin_pos div 512") =!=
              expr("(begin_pos + n_tokens - 1) div 512"), 1).otherwise(0))
              .cast("long").as("straddlers"))
          .orderBy("source")
      }),

    // COMMON-NEIGHBOR LINK PREDICTION over the user co-activity graph
    // (users sharing ≥25 (day, event-type) slots; the TPC-H co-supply
    // graph is complete by construction and was rejected). Two scale
    // bounds make this safe on a DENSE graph — the first probe of the
    // unbounded form ran away at 10x because common-neighbor counting is
    // Σ degree², cubic when density grows:
    //   1. CROWDED SLOTS DROP before the pair join (slots with >128
    //      active users) — co-presence in a slot everyone occupies is no
    //      evidence of a tie, exactly the stop-token rule all-pairs
    //      similarity joins use, and it bounds the quadratic per-slot
    //      pair expansion by a constant;
    //   2. the directed neighbor list caps at each node's top-12 edges
    //      by (shared slots desc, neighbor) — standard link-prediction
    //      sparsification, a window-rank pushdown — so the 2-hop join
    //      carries at most |nodes|·12² pairs.
    // Direct edges subtract via an anti-join; bounded top-15 output.
    Q("graph_fof_recs",
      Some(
        """WITH p AS (
          |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type AS t
          |  FROM events),
          |keep AS (
          |  SELECT d, t FROM p GROUP BY 1, 2 HAVING count(*) <= 128),
          |pk AS (SELECT p.* FROM p JOIN keep USING (d, t)),
          |co AS (
          |  SELECT a.user_id AS sa, b.user_id AS sb,
          |         CAST(count(*) AS BIGINT) AS w
          |  FROM pk a JOIN pk b ON a.d = b.d AND a.t = b.t
          |    AND a.user_id < b.user_id
          |  GROUP BY 1, 2 HAVING count(*) >= 25),
          |e0 AS (SELECT sa, sb, w FROM co UNION ALL SELECT sb, sa, w FROM co),
          |e AS (SELECT sa, sb FROM (
          |    SELECT sa, sb, row_number() OVER (PARTITION BY sa
          |      ORDER BY w DESC, sb) AS rnk FROM e0)
          |  WHERE rnk <= 12),
          |two AS (
          |  SELECT x.sa AS a, y.sb AS c, CAST(count(*) AS BIGINT) AS cn
          |  FROM e x JOIN e y ON x.sb = y.sa AND x.sa < y.sb
          |  GROUP BY 1, 2),
          |recs AS (
          |  SELECT t.a, t.c, t.cn FROM two t
          |  LEFT JOIN co ON co.sa = t.a AND co.sb = t.c
          |  WHERE co.sa IS NULL)
          |SELECT a, c, cn FROM recs ORDER BY cn DESC, a, c LIMIT 15""".stripMargin),
      (s, dir) => {
        val p = H.events(s, dir)
          .select(col("user_id"), col("ts").cast("date").as("d"),
            col("event_type").as("t"))
          .distinct()
        val keep = p.groupBy("d", "t").agg(count(lit(1)).as("slot_n"))
          .filter(col("slot_n") <= 128).select("d", "t")
        val pk = p.join(keep, Seq("d", "t"))
        val co = pk.as("a")
          .join(pk.as("b"),
            col("a.d") === col("b.d") && col("a.t") === col("b.t") &&
              col("a.user_id") < col("b.user_id"))
          .groupBy(col("a.user_id").as("sa"), col("b.user_id").as("sb"))
          .agg(count(lit(1)).as("w"))
          .filter(col("w") >= 25)
        val e0 = co.unionByName(co.select(col("sb").as("sa"),
          col("sa").as("sb"), col("w")))
        val e = e0
          .withColumn("rnk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("sa")
              .orderBy(col("w").desc, col("sb"))))
          .filter(col("rnk") <= 12)
          .select("sa", "sb")
        val two = e.select(col("sa").as("a"), col("sb").as("m"))
          .join(e.select(col("sa").as("m2"), col("sb").as("c")),
            col("m") === col("m2") && col("a") < col("c"))
          .groupBy("a", "c").agg(count(lit(1)).as("cn"))
        two
          .join(co.select("sa", "sb"),
            two("a") === co("sa") && two("c") === co("sb"), "left_anti")
          .orderBy(col("cn").desc, col("a"), col("c"))
          .limit(15)
      })
  )
}
