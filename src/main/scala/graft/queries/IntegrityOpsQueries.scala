package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Forty-seventh wave: cross-table integrity auditing and preference-pair
  * construction (the RLHF-style data-building op). The win-rate matrix is
  * the scale showcase: the engine counts pairwise score wins with an
  * O(n log n) rank-prefix construction, while the oracle states the plain
  * quadratic double-scan — the hash compare proves the decomposition exact.
  */
object IntegrityOpsQueries extends QueryModule {

  /** Integer doc quality score used by the preference ops: characters plus
    * 7× the whitespace word count (cheap, deterministic, no floats). */
  private val ScoreSql = "n_chars + 7 * len(string_split(text, ' '))"
  private def score(df: DataFrame) =
    df.withColumn("score",
      col("n_chars") + lit(7) * size(split(col("text"), " ", -1)))

  def all: Seq[Q] = Seq(

    // Referential-integrity audit over every FK edge of the star schema:
    // child rows + orphan rows per edge in ONE left-join pass per edge
    // (global agg, so a fully-intact edge still emits its zero row).
    // Dimension keysets broadcast; the lineitem→orders edge is the only
    // genuinely big⋈big probe and shuffles on the key as it must.
    Q("dq_referential_orphans",
      Some {
        def edge(name: String, child: String, fk: String, parent: String,
            pk: String) =
          s"SELECT '$name' AS edge, CAST(count(*) AS BIGINT) AS child_rows, " +
            s"CAST(sum(CASE WHEN p.$pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
            s"AS orphans FROM $child c LEFT JOIN (SELECT DISTINCT $pk " +
            s"FROM $parent) p ON p.$pk = c.$fk"
        Seq(
          edge("customer.nation", "customer", "c_nationkey", "nation",
            "n_nationkey"),
          edge("lineitem.orders", "lineitem", "l_orderkey", "orders",
            "o_orderkey"),
          edge("lineitem.part", "lineitem", "l_partkey", "part", "p_partkey"),
          edge("lineitem.supplier", "lineitem", "l_suppkey", "supplier",
            "s_suppkey"),
          edge("nation.region", "nation", "n_regionkey", "region",
            "r_regionkey"),
          edge("orders.customer", "orders", "o_custkey", "customer",
            "c_custkey"),
          edge("supplier.nation", "supplier", "s_nationkey", "nation",
            "n_nationkey"))
          .mkString("", " UNION ALL ", " ORDER BY edge")
      },
      (s, dir) => {
        def edge(name: String, child: DataFrame, fk: String,
            parent: DataFrame, pk: String) = {
          val keys = parent.select(col(pk).as("__pk")).distinct()
          child.select(col(fk))
            .join(keys, col(fk) === col("__pk"), "left")
            .agg(count(lit(1)).cast("long").as("child_rows"),
              sum(when(col("__pk").isNull, 1L).otherwise(0L)).cast("long")
                .as("orphans"))
            .select(lit(name).as("edge"), col("child_rows"), col("orphans"))
        }
        val li = tbl(s, dir, "lineitem")
        val orders = tbl(s, dir, "orders")
        val cust = tbl(s, dir, "customer")
        val sup = tbl(s, dir, "supplier")
        val nation = tbl(s, dir, "nation")
        Seq(
          edge("customer.nation", cust, "c_nationkey", nation, "n_nationkey"),
          edge("lineitem.orders", li, "l_orderkey", orders, "o_orderkey"),
          edge("lineitem.part", li, "l_partkey", tbl(s, dir, "part"),
            "p_partkey"),
          edge("lineitem.supplier", li, "l_suppkey", sup, "s_suppkey"),
          edge("nation.region", nation, "n_regionkey", tbl(s, dir, "region"),
            "r_regionkey"),
          edge("orders.customer", orders, "o_custkey", cust, "c_custkey"),
          edge("supplier.nation", sup, "s_nationkey", nation, "n_nationkey"))
          .reduce(_ unionAll _)
          .orderBy("edge")
      }),

    // Candidate-key uniqueness profile: declared key → rows, distinct
    // keys, duplicate rows, for every table in the catalog. Each row is
    // one map-side-combined count-distinct pass; the profile unions eight
    // one-row frames.
    Q("dq_uniqueness_profile",
      Some {
        def prof(t: String, key: String, cols: String) =
          s"SELECT '$t' AS tbl, '$key' AS key_cols, " +
            s"CAST((SELECT count(*) FROM $t) AS BIGINT) AS rows_n, " +
            s"CAST((SELECT count(*) FROM (SELECT DISTINCT $cols FROM $t)) " +
            "AS BIGINT) AS distinct_n"
        Seq(
          prof("customer", "c_custkey", "c_custkey"),
          prof("documents", "doc_id", "doc_id"),
          prof("embeddings", "vec_id", "vec_id"),
          prof("events", "event_id", "event_id"),
          prof("lineitem", "l_orderkey+l_linenumber",
            "l_orderkey, l_linenumber"),
          prof("orders", "o_orderkey", "o_orderkey"),
          prof("part", "p_partkey", "p_partkey"),
          prof("supplier", "s_suppkey", "s_suppkey"))
          .zipWithIndex.map { case (q, i) =>
            s"SELECT tbl, key_cols, rows_n, distinct_n, " +
              s"rows_n - distinct_n AS dup_rows FROM ($q) u$i" }
          .mkString("", " UNION ALL ", " ORDER BY tbl")
      },
      (s, dir) => {
        def prof(t: String, key: String, cols: Seq[String]) =
          tbl(s, dir, t)
            .agg(count(lit(1)).cast("long").as("rows_n"),
              count_distinct(col(cols.head), cols.tail.map(col): _*)
                .cast("long").as("distinct_n"))
            .select(lit(t).as("tbl"), lit(key).as("key_cols"),
              col("rows_n"), col("distinct_n"),
              (col("rows_n") - col("distinct_n")).as("dup_rows"))
        Seq(
          prof("customer", "c_custkey", Seq("c_custkey")),
          prof("documents", "doc_id", Seq("doc_id")),
          prof("embeddings", "vec_id", Seq("vec_id")),
          prof("events", "event_id", Seq("event_id")),
          prof("lineitem", "l_orderkey+l_linenumber",
            Seq("l_orderkey", "l_linenumber")),
          prof("orders", "o_orderkey", Seq("o_orderkey")),
          prof("part", "p_partkey", Seq("p_partkey")),
          prof("supplier", "s_suppkey", Seq("s_suppkey")))
          .reduce(_ unionAll _)
          .orderBy("tbl")
      }),

    // Preference-pair construction: within each (lang, source) bucket,
    // pair each doc with the next 3 docs down the quality ranking
    // (chosen = higher score; ties broken by doc_id so the pair set is
    // total-ordered). Rank-adjacent pairing keeps the output LINEAR in
    // the corpus — never the quadratic all-pairs — and the gap join is an
    // explode-to-equi on (bucket, rank).
    Q("pref_pairs_build",
      Some(
        s"""WITH d AS (SELECT doc_id, lang, source,
           |  CAST($ScoreSql AS BIGINT) AS score FROM documents),
           |r AS (SELECT doc_id, lang, source, score,
           |  CAST(row_number() OVER (PARTITION BY lang, source
           |    ORDER BY score DESC, doc_id) AS BIGINT) AS rnk FROM d),
           |p AS (SELECT a.lang, a.source, a.doc_id AS chosen,
           |  b.doc_id AS rejected, a.score - b.score AS margin,
           |  b.rnk - a.rnk AS gap
           |  FROM r a JOIN r b ON a.lang = b.lang AND a.source = b.source
           |    AND b.rnk - a.rnk IN (1, 2, 3))
           |SELECT lang, source, chosen, rejected, margin, gap
           |FROM p ORDER BY lang, source, chosen, gap
           |""".stripMargin),
      (s, dir) => {
        val r = score(tbl(s, dir, "documents"))
          .select(col("doc_id"), col("lang"), col("source"), col("score"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy("lang", "source")
              .orderBy(col("score").desc, col("doc_id"))).cast("long"))
          .localCheckpoint() // both pair sides
        val a = r.withColumn("gap", explode(array(lit(1L), lit(2L), lit(3L))))
          .select(col("lang"), col("source"), col("doc_id").as("chosen"),
            col("score").as("cs"), (col("rnk") + col("gap")).as("want"),
            col("gap"))
        val b = r.select(col("lang").as("l2"), col("source").as("s2"),
          col("doc_id").as("rejected"), col("score").as("rs"),
          col("rnk").as("rnk2"))
        val out = a.join(b, col("lang") === col("l2") &&
            col("source") === col("s2") && col("want") === col("rnk2"))
          .select(col("lang"), col("source"), col("chosen"), col("rejected"),
            (col("cs") - col("rs")).as("margin"), col("gap"))
          .orderBy("lang", "source", "chosen", "gap")
        H.materialized(out, caches = Nil, checkpoints = Seq(r))
      }),

    // Source-vs-source win-rate matrix: over same-lang doc pairs from two
    // different sources, how often does source A's doc outscore B's?
    // Engine: rank-prefix counting — per (lang, score) counts, a dense
    // (lang, score) × source spine, and an exclusive running sum give
    // "docs of s2 strictly below score v" in O(n log n); wins then
    // aggregate products of tiny per-score counts. The oracle is the
    // literal quadratic FROM d a JOIN d b — bit-equality proves the
    // prefix decomposition. Ties score for neither side; comparisons
    // count every cross pair.
    Q("pref_winrate_sources",
      Some(
        s"""WITH d AS (SELECT doc_id, lang, source,
           |  CAST($ScoreSql AS BIGINT) AS score FROM documents),
           |w AS (SELECT a.source AS s1, b.source AS s2,
           |  CAST(sum(CASE WHEN a.score > b.score THEN 1 ELSE 0 END)
           |    AS BIGINT) AS wins,
           |  CAST(count(*) AS BIGINT) AS comparisons
           |  FROM d a JOIN d b ON a.lang = b.lang AND a.source <> b.source
           |  GROUP BY a.source, b.source)
           |SELECT s1, s2, wins, comparisons,
           |  wins * 1000000 // comparisons AS winrate_micro
           |FROM w ORDER BY s1, s2
           |""".stripMargin),
      (s, dir) => {
        val d = score(tbl(s, dir, "documents"))
          .select(col("lang"), col("source"), col("score"))
        // per-(lang, score, source) counts — everything downstream runs on
        // this reduced domain
        val g = d.groupBy("lang", "score", "source")
          .agg(count(lit(1)).cast("long").as("c"))
          .localCheckpoint()
        val sources = g.select("source").distinct()
        val spine = g.select("lang", "score").distinct()
          .join(broadcast(sources.select(col("source").as("s2"))))
        val below = spine
          .join(g.select(col("lang"), col("score"),
            col("source").as("s2"), col("c")), Seq("lang", "score", "s2"),
            "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
          .withColumn("below", sum("c").over(
            Window.partitionBy("lang", "s2").orderBy("score")
              .rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("below", coalesce(col("below"), lit(0L)))
          .select(col("lang"), col("score"), col("s2"), col("below"))
        val wins = g.select(col("lang"), col("score"),
            col("source").as("s1"), col("c").as("c1"))
          .join(below, Seq("lang", "score"))
          .filter(col("s1") =!= col("s2"))
          .groupBy("s1", "s2")
          .agg(sum(col("c1") * col("below")).cast("long").as("wins"))
        val totals = g.groupBy("lang", "source")
          .agg(sum("c").cast("long").as("n"))
        val comparisons = totals.select(col("lang"), col("source").as("s1"),
            col("n").as("n1"))
          .join(totals.select(col("lang").as("l2"), col("source").as("s2"),
            col("n").as("n2")), col("lang") === col("l2") &&
            col("s1") =!= col("s2"))
          .groupBy("s1", "s2")
          .agg(sum(col("n1") * col("n2")).cast("long").as("comparisons"))
        val out = wins.join(comparisons, Seq("s1", "s2"))
          .withColumn("winrate_micro",
            expr("wins * 1000000 div comparisons"))
          .select("s1", "s2", "wins", "comparisons", "winrate_micro")
          .orderBy("s1", "s2")
        H.materialized(out, caches = Nil, checkpoints = Seq(g))
      }))
}
