package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-9 wave 141: TextRank keyword extraction (weighted PageRank on the
  * token co-occurrence graph — Mihalcea & Tarau 2004, the standard
  * unsupervised keyphrase baseline next to RAKE) and fixed-effect
  * meta-analysis (inverse-variance pooling with Cochran's Q and I² — the
  * multi-experiment synthesis primitive).
  */
object TextRankMetaOpsQueries extends QueryModule {

  private val Rounds = 8
  private val TopNodes = 64

  /** One TextRank round as a named CTE (the chained-CTE iteration pattern
    * from graph_label_prop/graph_pagerank — aggregation per round is not
    * legal inside a recursive term). r_next(i) = base + (850 · Σ_{j→i}
    * ((w_ji · r_j) div W_j)) div 1000, all integer micro. */
  private def prRoundSql(prev: String, next: String): String =
    s"$next AS (SELECT n2.id, CAST(nn.base + (850 * coalesce(c.s, 0)) // 1000 AS BIGINT) AS r " +
      s"FROM nodes n2 CROSS JOIN nstats nn LEFT JOIN (" +
      s"SELECT e.b AS id, CAST(sum((e.w * p.r) // ws.tw) AS BIGINT) AS s " +
      s"FROM uedges e JOIN $prev p ON p.id = e.a " +
      s"JOIN wsum ws ON ws.id = e.a GROUP BY e.b) c ON c.id = n2.id)"

  def all: Seq[Q] = Seq(

    // TEXTRANK KEYWORDS: adjacency-window co-occurrence graph over tokens
    // (length ≥ 4 keeps the noise words out), symmetrized with count
    // weights, restricted to the TopNodes most frequent tokens (the cap
    // that keeps the iteration domain bounded by construction at any
    // corpus size); 8 rounds of weighted PageRank (d = 0.85) in exact
    // micro integers. Per-round contribution (w·r) div W is one
    // documented truncating div per edge, identical in both engines.
    // Scale shape: the pair census is the only fact-sized pass (one map
    // per document, no per-doc window — pairs come from an index
    // transform over the token array); every round is edges ⋈ broadcast
    // rank-state on the bounded node domain.
    Q("text_textrank_keywords",
      Some(
        "WITH tl AS (SELECT doc_id, string_split(text, ' ') AS ts " +
          "FROM documents WHERE length(text) > 0), " +
          "pr0 AS (SELECT ts[i] AS a, ts[i + 1] AS b FROM " +
          "(SELECT ts, unnest(range(1, len(ts))) AS i FROM tl) t), " +
          "pr AS (SELECT a, b FROM pr0 WHERE length(a) >= 4 " +
          "AND length(b) >= 4 AND a <> b), " +
          "cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (" +
          "SELECT a AS tok FROM pr UNION ALL SELECT b FROM pr) GROUP BY 1), " +
          s"nodes AS (SELECT tok AS id FROM cnt ORDER BY c DESC, tok LIMIT $TopNodes), " +
          "de AS (SELECT a, b, CAST(count(*) AS BIGINT) AS w FROM pr " +
          "JOIN nodes x ON x.id = a JOIN nodes y ON y.id = b GROUP BY 1, 2), " +
          "uedges AS (SELECT a, b, CAST(sum(w) AS BIGINT) AS w FROM (" +
          "SELECT a, b, w FROM de UNION ALL SELECT b, a, w FROM de) " +
          "GROUP BY 1, 2), " +
          "wsum AS (SELECT a AS id, CAST(sum(w) AS BIGINT) AS tw " +
          "FROM uedges GROUP BY 1), " +
          "nstats AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
          "CAST(150000 // count(*) AS BIGINT) AS base FROM nodes), " +
          "p0 AS (SELECT nodes.id, CAST(1000000 // nn.n AS BIGINT) AS r " +
          "FROM nodes CROSS JOIN nstats nn), " +
          (1 to Rounds).map(i => prRoundSql(s"p${i - 1}", s"p$i"))
            .mkString(", ") + " " +
          s"SELECT id AS token, r AS rank_micro, ws.tw AS weight_degree " +
          s"FROM p$Rounds JOIN wsum ws USING (id) " +
          "ORDER BY rank_micro DESC, token LIMIT 15"),
      (s, dir) => {
        val tl = tbl(s, dir, "documents")
          .filter(length(col("text")) > 0)
          .select(split(col("text"), " ").as("ts"))
        // size(ts) >= 2 guard (r9 advisor, medium): sequence(1, 0) is the
        // DESCENDING [1, 0] in Spark, so a single-token document would hit
        // element_at(ts, 0) and abort under ANSI — DuckDB's range(1, 1) is
        // empty for the same input, matching the filtered form exactly
        val pr = tl
          .filter(size(col("ts")) >= 2)
          .select(explode(expr(
            """transform(sequence(1, size(ts) - 1), i ->
              | named_struct('a', element_at(ts, i),
              |   'b', element_at(ts, i + 1)))""".stripMargin)).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
          .filter(length(col("a")) >= 4 && length(col("b")) >= 4 &&
            col("a") =!= col("b"))
        val cnt = pr.select(col("a").as("tok"))
          .unionAll(pr.select(col("b").as("tok")))
          .groupBy("tok").agg(count(lit(1)).cast("long").as("c"))
        val nodes = cnt.orderBy(col("c").desc, col("tok")).limit(TopNodes)
          .select(col("tok").as("id")).localCheckpoint()
        val de = pr
          .join(broadcast(nodes.select(col("id").as("na"))),
            col("a") === col("na"))
          .join(broadcast(nodes.select(col("id").as("nb"))),
            col("b") === col("nb"))
          .groupBy("a", "b").agg(count(lit(1)).cast("long").as("w"))
        val uedges = de.select("a", "b", "w")
          .unionAll(de.select(col("b").as("a"), col("a").as("b"), col("w")))
          .groupBy("a", "b").agg(sum("w").cast("long").as("w"))
          .localCheckpoint() // joined every round
        val wsum = uedges.groupBy(col("a").as("wid"))
          .agg(sum("w").cast("long").as("tw")).localCheckpoint()
        val n = nodes.count()
        val base = 150000L / n
        var rank = nodes.withColumn("r", lit(1000000L / n)).localCheckpoint()
        val ckpts = scala.collection.mutable.ArrayBuffer(nodes, uedges,
          wsum, rank)
        for (_ <- 1 to Rounds) {
          val contrib = uedges
            .join(broadcast(rank.select(col("id").as("pid"), col("r"))),
              col("a") === col("pid"))
            .join(broadcast(wsum), col("a") === col("wid"))
            .groupBy(col("b").as("cid"))
            .agg(sum(expr("(w * r) div tw")).cast("long").as("s"))
          rank = nodes
            .join(contrib, col("id") === col("cid"), "left")
            .select(col("id"),
              (lit(base) + expr(s"(850 * coalesce(s, 0)) div 1000"))
                .cast("long").as("r"))
            .localCheckpoint()
          ckpts += rank
        }
        val out = rank
          .join(wsum, col("id") === col("wid"))
          .select(col("id").as("token"), col("r").as("rank_micro"),
            col("tw").as("weight_degree"))
          .orderBy(col("rank_micro").desc, col("token")).limit(15)
        H.materialized(out, Nil, ckpts.toSeq)
      }),

    // FIXED-EFFECT META-ANALYSIS: per region, the BUILDING-vs-MACHINERY
    // mean-order-value effect (milli-dollars, exact integer means) with
    // its sampling variance from exact integer moments; inverse-variance
    // weights pooled across the five regional "experiments", plus
    // Cochran's Q and I² heterogeneity. Discipline: the only cross-row
    // reductions are INTEGER sums (weights are CAST to BIGINT per row
    // from identically-derived doubles; Σw, Σw·y, Σw·d² are exact), so
    // engine aggregation order cannot shift a bit. Scale shape: one
    // map-side-combined (region, segment) moment pass; everything after
    // is the 5-row region domain.
    Q("stats_meta_fixed",
      Some(
        """WITH m AS (
          |  SELECT r_name AS region, c_mktsegment AS seg,
          |    CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT))
          |      AS BIGINT) AS sx,
          |    CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT)
          |      * CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS BIGINT)
          |      AS sxx
          |  FROM orders JOIN customer ON c_custkey = o_custkey
          |  JOIN nation ON n_nationkey = c_nationkey
          |  JOIN region ON r_regionkey = n_regionkey
          |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
          |  GROUP BY 1, 2),
          |eff AS (
          |  SELECT a.region,
          |    a.n AS n1, b.n AS n2,
          |    (a.sx * 1000 // a.n) - (b.sx * 1000 // b.n) AS y_milli,
          |    ((CAST(a.sxx AS DOUBLE) - CAST(a.sx AS DOUBLE)
          |        * CAST(a.sx AS DOUBLE) / CAST(a.n AS DOUBLE))
          |      / CAST(a.n - 1 AS DOUBLE)) / CAST(a.n AS DOUBLE)
          |    + ((CAST(b.sxx AS DOUBLE) - CAST(b.sx AS DOUBLE)
          |        * CAST(b.sx AS DOUBLE) / CAST(b.n AS DOUBLE))
          |      / CAST(b.n - 1 AS DOUBLE)) / CAST(b.n AS DOUBLE) AS v
          |  FROM m a JOIN m b ON b.region = a.region
          |  WHERE a.seg = 'BUILDING' AND b.seg = 'MACHINERY'),
          |w AS (SELECT region, n1, n2, y_milli,
          |    CAST(floor(1000000000000.0 / v) AS BIGINT) AS wt FROM eff),
          |pool AS (SELECT
          |    CAST(sum(wt * y_milli) // sum(wt) AS BIGINT) AS pooled_milli,
          |    CAST(sum(wt) AS BIGINT) AS wtot FROM w),
          |qq AS (SELECT
          |    CAST(sum(w.wt * ((w.y_milli - p.pooled_milli) // 1000)
          |      * ((w.y_milli - p.pooled_milli) // 1000)) // 1000000
          |      AS BIGINT) AS q_micro
          |  FROM w CROSS JOIN pool p)
          |SELECT w.region, w.n1, w.n2, CAST(w.y_milli AS BIGINT) AS y_milli,
          |  w.wt, p.pooled_milli, qq.q_micro,
          |  CAST(CASE WHEN qq.q_micro > 4000000
          |    THEN (qq.q_micro - 4000000) * 1000000 // qq.q_micro
          |    ELSE 0 END AS BIGINT) AS i2_ppm
          |FROM w CROSS JOIN pool p CROSS JOIN qq
          |ORDER BY w.region
          |""".stripMargin),
      (s, dir) => {
        val m = tbl(s, dir, "orders")
          .join(tbl(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
          .join(tbl(s, dir, "nation"),
            col("n_nationkey") === col("c_nationkey"))
          .join(broadcast(tbl(s, dir, "region")),
            col("r_regionkey") === col("n_regionkey"))
          .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
          .groupBy(col("r_name").as("region"),
            col("c_mktsegment").as("seg"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(floor(col("o_totalprice") + lit(0.5)).cast("long"))
              .cast("long").as("sx"),
            sum(floor(col("o_totalprice") + lit(0.5)).cast("long") *
              floor(col("o_totalprice") + lit(0.5)).cast("long"))
              .cast("long").as("sxx"))
        val a = m.filter(col("seg") === "BUILDING")
          .select(col("region"), col("n").as("n1"), col("sx").as("sx1"),
            col("sxx").as("sxx1"))
        val b = m.filter(col("seg") === "MACHINERY")
          .select(col("region").as("region2"), col("n").as("n2"),
            col("sx").as("sx2"), col("sxx").as("sxx2"))
        val eff = a.join(b, col("region") === col("region2"))
          .select(col("region"), col("n1"), col("n2"),
            expr("(sx1 * 1000 div n1) - (sx2 * 1000 div n2)").as("y_milli"),
            expr(
              """((CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE)
                |    * CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                |  / CAST(n1 - 1 AS DOUBLE)) / CAST(n1 AS DOUBLE)
                |+ ((CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE)
                |    * CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                |  / CAST(n2 - 1 AS DOUBLE)) / CAST(n2 AS DOUBLE)"""
                .stripMargin).as("v"))
        val w = eff.select(col("region"), col("n1"), col("n2"),
          col("y_milli"), expr("CAST(floor(1000000000000.0 / v) AS BIGINT)")
            .as("wt")).localCheckpoint() // pooled + Q + output all read it
        val pool = w.agg(
          expr("CAST(sum(wt * y_milli) div sum(wt) AS BIGINT)")
            .as("pooled_milli"),
          sum("wt").cast("long").as("wtot"))
        val qq = w.crossJoin(broadcast(pool))
          .agg(expr("CAST(sum(wt * ((y_milli - pooled_milli) div 1000)" +
            " * ((y_milli - pooled_milli) div 1000)) div 1000000 AS BIGINT)")
            .as("q_micro"))
        val out = w.crossJoin(broadcast(pool)).crossJoin(broadcast(qq))
          .select(col("region"), col("n1"), col("n2"),
            col("y_milli").cast("long").as("y_milli"), col("wt"),
            col("pooled_milli"), col("q_micro"),
            expr("CAST(CASE WHEN q_micro > 4000000 THEN" +
              " (q_micro - 4000000) * 1000000 div q_micro" +
              " ELSE 0 END AS BIGINT)").as("i2_ppm"))
          .orderBy("region")
        H.materialized(out, Nil, Seq(w))
      })
  )
}
