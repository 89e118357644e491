package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Q, QueryModule}
import graft.H.tbl
import graft.functions.{VectorSim => VS}

/** Fifth wave of corpus-scale operators: hybrid retrieval (reciprocal rank
  * fusion of a lexical and a dense leg — the standard way RAG-era curation
  * pipelines pick documents), linear quality-classifier inference (the
  * fastText/CCNet-style hashed bag-of-words scorer used to filter web
  * corpora), and bounded-hop BFS shortest paths over the trade graph (the
  * reachability primitive behind link-graph corpus analysis).
  *
  * All three follow the repo's cross-engine determinism discipline: integer
  * or rational arithmetic end-to-end, DECIMAL(18,9) requantization for any
  * cross-row double sum, and a total-order sort on every output.
  */
object RetrievalQueries extends QueryModule {

  private def d9(c: Column): Column = c.cast(DecimalType(18, 9))

  /** DuckDB-side fold of the first 4 hex chars of md5(`e`) to a BIGINT in
    * [0, 65536) — the exact twin of Spark's
    * `conv(substring(md5(e),1,4),16,10)` (same trick as select_dsir /
    * sample_split). */
  private def md5FoldSql(e: String): String = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(md5($e), $i, 1)) - 1)"
    s"((((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)}))"
  }

  /** Shared trade-graph SQL prelude: nation→nation edges, each source
    * keeping its top-7 destinations by trade count (scale-invariant
    * sparsification, same rule as graph_pagerank), then symmetrized. */
  private[queries] val uedgesSql: String =
    "pairs AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w " +
      "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
      "JOIN customer c ON o.o_custkey = c.c_custkey " +
      "JOIN supplier s ON l.l_suppkey = s.s_suppkey GROUP BY 1, 2), " +
      "edges AS (SELECT src, dst FROM (SELECT src, dst, " +
      "row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rk FROM pairs) WHERE rk <= 7), " +
      "uedges AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges)"

  /** Okapi BM25 scores for the fixed 3-term query, one wide shuffle total.
    *
    * The naive per-(doc,term) postings plan re-scans the exploded token
    * table four times (doc length, corpus stats, df, tf). This form pivots
    * the query terms into per-doc counters so ONE explode + ONE
    * groupBy(doc_id) pass computes everything per-document; corpus stats
    * and per-term dfs then come from a tiny aggregate over the per-doc
    * frame (|docs| rows, not |tokens|), broadcast back as one row. Scoring
    * arithmetic is unchanged from the oracle: rational idf surrogate, each
    * term's contribution requantized through DECIMAL(18,9), and the three
    * decimal terms added exactly (a zero-tf term contributes exact decimal
    * zero, so including all docs with ≥1 query-term hit matches the
    * oracle's per-(doc,term) row sum bit-for-bit).
    *
    * The per-doc frame is double-referenced (scoring + corpus stats) and
    * Spark does not CSE across DAG branches, so it is materialized via
    * localCheckpoint — the explode runs once, and what is replayed for the
    * second branch is the |docs|-row reduction, not the token stream.
    * Returns (scored, checkpoint); callers MUST free the checkpoint at
    * their query tail (H.materialized(_, Nil, Seq(chk))).
    */
  private[graft] def bm25PerDoc(s: SparkSession, dir: String,
      terms: Seq[String]): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    tok.groupBy("doc_id").agg(
      count(lit(1)).as("dl"),
      terms.map(t => count(when(col("term") === t, 1)).as(s"tf_$t")): _*)
  }

  private[graft] def bm25Scored(s: SparkSession, dir: String,
      terms: Seq[String]): (DataFrame, DataFrame) = {
    val per = bm25PerDoc(s, dir, terms).localCheckpoint()
    val statAggs: Seq[Column] =
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
        .as("avgdl") +:
        terms.map(t => count(when(col(s"tf_$t") > 0, 1)).as(s"df_$t"))
    val stats = per.agg(count(lit(1)).as("n"), statAggs: _*)
    def part(t: String): Column = {
      val idf = (lit(2) * col("n") - lit(2) * col(s"df_$t") + 1)
        .cast("double") / (lit(2) * col(s"df_$t") + 1).cast("double")
      val sat = (col(s"tf_$t").cast("double") * lit(2.2)) /
        (col(s"tf_$t").cast("double") +
          lit(1.2) * (lit(0.25) +
            lit(0.75) * (col("dl").cast("double") / col("avgdl"))))
      d9(idf * sat)
    }
    val scored = per.crossJoin(broadcast(stats))
      .filter(terms.map(t => col(s"tf_$t") > 0).reduce(_ || _))
      .select(col("doc_id"),
        terms.map(part).reduce(_ + _).cast("double").as("score"))
    (scored, per)
  }

  /** Spark twin of [[uedgesSql]]. */
  private[queries] def uedgesDf(s: SparkSession, dir: String): DataFrame = {
    val li = tbl(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val ord = tbl(s, dir, "orders").select("o_orderkey", "o_custkey")
    val cust = tbl(s, dir, "customer").select("c_custkey", "c_nationkey")
    val supp = tbl(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .groupBy(cust("c_nationkey").cast("int").as("src"),
        supp("s_nationkey").cast("int").as("dst"))
      .agg(count(lit(1)).as("w"))
    val rk = row_number()
      .over(Window.partitionBy("src").orderBy(col("w").desc, col("dst")))
    val edges = pairs.withColumn("rk", rk).filter(col("rk") <= 7)
      .select("src", "dst")
    edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  /** The rank_rrf pipeline pre-materialization (the Q fn wraps it in
    * H.materialized; PlanGuardsSpec inspects this plan directly, same
    * pattern as ScaleCorpusQueries.pcaFrames). Returns (out, perChk) —
    * the caller frees the BM25 per-doc checkpoint. */
  private[graft] def rrfPipeline(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val (scored, perChk) = bm25Scored(s, dir, Seq("spark", "join", "window"))
    val btop = scored.orderBy(col("score").desc, col("doc_id")).limit(100)
      .withColumn("rb",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long"))
      .select("doc_id", "rb")
    val e = tbl(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val qv = e.filter(col("vec_id") === 0).select(col("v").as("q"))
    val sims = e.crossJoin(broadcast(qv))
      .select(col("vec_id"),
        (VS.dot("v", "q") /
          (sqrt(VS.norm2("v")) * sqrt(VS.norm2("q")))).as("sim"))
    val ctop = sims.orderBy(col("sim").desc, col("vec_id")).limit(100)
      .withColumn("rc",
        row_number().over(Window.orderBy(col("sim").desc, col("vec_id")))
          .cast("long"))
      .select("vec_id", "rc")
    val fused = btop.join(ctop, btop("doc_id") === ctop("vec_id"),
        "full_outer")
      .select(coalesce(btop("doc_id"), ctop("vec_id")).as("doc_id"),
        (coalesce(lit(1.0) / (lit(60) + col("rb")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("rc")), lit(0.0)))
          .as("rrf_score"),
        coalesce(col("rb"), lit(-1L)).as("bm25_rank"),
        coalesce(col("rc"), lit(-1L)).as("cos_rank"))
    val out = fused.orderBy(col("rrf_score").desc, col("doc_id")).limit(25)
      .withColumn("rnk",
        row_number()
          .over(Window.orderBy(col("rrf_score").desc, col("doc_id")))
          .cast("long"))
      .orderBy("rnk")
    (out, perChk)
  }

  def all: Seq[Q] = Seq(

    // Reciprocal rank fusion (Cormack/Clarke/Buettcher 2009) of a lexical
    // BM25 leg and a dense cosine leg — hybrid retrieval as modern
    // curation pipelines run it. Each leg retrieves its top-100 list
    // independently (BM25 with the repo's rational idf surrogate, cosine
    // against the vec_id=0 query embedding); fusion scores
    // 1/(60+rank_lex) + 1/(60+rank_dense) over the union of the two lists
    // and keeps the top-25. Determinism: both legs rank by (score DESC,
    // id), the RRF terms are single IEEE divisions of exact integers
    // summed in fixed AST order, ties break on doc_id. Scale shape: each
    // leg ends in TakeOrderedAndProject (no global window over the
    // corpus — the only row_number windows run over the ≤100-row
    // retrieved lists); the fusion join touches ≤200 rows regardless of
    // corpus size, so the whole fusion stage is broadcast-trivial at any
    // scale.
    Q("rank_rrf",
      Some(
        s"""WITH qt AS (SELECT unnest(['spark', 'join', 'window']) AS term),
           |tok AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
           |), dl AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1
           |), stats AS (
           |  SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n,
           |         CAST((SELECT count(*) FROM tok) AS DOUBLE)
           |           / CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl
           |), df AS (
           |  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           |  FROM tok JOIN qt USING (term) GROUP BY term
           |), tf AS (
           |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           |  FROM tok JOIN qt USING (term) GROUP BY 1, 2
           |), scored AS (
           |  SELECT tf.doc_id,
           |         CAST(sum(CAST(
           |           (CAST(2*stats.n - 2*df.df + 1 AS DOUBLE) / CAST(2*df.df + 1 AS DOUBLE))
           |           * ((CAST(tf.tf AS DOUBLE) * 2.2)
           |              / (CAST(tf.tf AS DOUBLE)
           |                 + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / stats.avgdl))))
           |          AS DECIMAL(18,9))) AS DOUBLE) AS score
           |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats
           |  GROUP BY tf.doc_id
           |), btop AS (
           |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rb
           |  FROM (SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT 100)
           |), e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |qv AS (SELECT v AS q FROM e WHERE vec_id = 0),
           |sims AS (
           |  SELECT vec_id,
           |         (${VS.dotSql("v", "q")})
           |           / (sqrt(${VS.norm2Sql("v")}) * sqrt(${VS.norm2Sql("q")})) AS sim
           |  FROM e CROSS JOIN qv
           |), ctop AS (
           |  SELECT vec_id, CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS rc
           |  FROM (SELECT * FROM sims ORDER BY sim DESC, vec_id LIMIT 100)
           |), fused AS (
           |  SELECT coalesce(b.doc_id, c.vec_id) AS doc_id,
           |         coalesce(CAST(1 AS DOUBLE) / (60 + b.rb), CAST(0 AS DOUBLE))
           |           + coalesce(CAST(1 AS DOUBLE) / (60 + c.rc), CAST(0 AS DOUBLE)) AS rrf_score,
           |         coalesce(b.rb, -1) AS bm25_rank,
           |         coalesce(c.rc, -1) AS cos_rank
           |  FROM btop b FULL OUTER JOIN ctop c ON b.doc_id = c.vec_id
           |)
           |SELECT doc_id, rrf_score, bm25_rank, cos_rank,
           |       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rnk
           |FROM (SELECT * FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 25)
           |ORDER BY rnk""".stripMargin),
      (s, dir) => {
        val (out, perChk) = rrfPipeline(s, dir)
        graft.H.materialized(out, Nil, Seq(perChk))
      }),

    // Linear quality-classifier inference over hashed bag-of-words — the
    // fastText-style scorer (Joulin et al. 2016) that GPT-3/CCNet-lineage
    // pipelines use to keep "looks like the target corpus" documents. The
    // model here is a fixed 256-bucket weight vector derived
    // deterministically from md5 (a stand-in for trained weights — the
    // inference plan, which is what the engine owns, is identical); a
    // document's score is the mean per-token weight, computed in EXACT
    // integer arithmetic (Σ of BIGINT weights, one final IEEE division by
    // 1000·len), so both engines hash identically with no decimal
    // requantization needed. Scale shape: per-token bucketing is a
    // codegen'd expression, the weight table is a 256-row broadcast join,
    // and scoring is one partial-agg shuffle keyed by doc_id — classifier
    // inference over 100 TB is embarrassingly parallel, exactly this plan.
    Q("select_classifier",
      Some(
        s"""WITH weights AS (
           |  SELECT CAST(b AS BIGINT) AS b,
           |         CAST(${md5FoldSql("'w' || CAST(b AS VARCHAR)")} % 2001 - 1000 AS BIGINT) AS w
           |  FROM generate_series(0, 255) t(b)
           |), tok AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
           |), f AS (
           |  SELECT doc_id, CAST(${md5FoldSql("term")} % 256 AS BIGINT) AS b FROM tok
           |), sc AS (
           |  SELECT f.doc_id, CAST(sum(w.w) AS BIGINT) AS sw,
           |         CAST(count(*) AS BIGINT) AS toks
           |  FROM f JOIN weights w USING (b) GROUP BY 1
           |)
           |SELECT doc_id, toks,
           |       CAST(sw AS DOUBLE) / CAST(1000 * toks AS DOUBLE) AS quality,
           |       CASE WHEN sw >= 0 THEN 'keep' ELSE 'drop_classifier' END AS decision
           |FROM sc ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val weights = s.range(256)
          .select(col("id").as("b"),
            (conv(substring(md5(concat(lit("w"), col("id").cast("string"))),
              1, 4), 16, 10).cast("long") % 2001 - 1000).as("w"))
        val tok = tbl(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        val f = tok.select(col("doc_id"),
          (conv(substring(md5(col("term")), 1, 4), 16, 10).cast("long")
            % 256).as("b"))
        val sc = f.join(broadcast(weights), Seq("b"))
          .groupBy("doc_id")
          .agg(sum(col("w")).as("sw"), count(lit(1)).as("toks"))
        sc.select(col("doc_id"), col("toks"),
            (col("sw").cast("double") /
              (lit(1000) * col("toks")).cast("double")).as("quality"),
            when(col("sw") >= 0, "keep").otherwise("drop_classifier")
              .as("decision"))
          .orderBy("doc_id")
      }),

    // Single-source shortest paths by bounded-hop BFS relaxation over the
    // undirected trade graph (source: nation 0), the reachability
    // primitive behind link-graph analysis of web corpora. Seven
    // synchronous relaxation rounds (hop cap 7 ≫ this graph's diameter;
    // the cap is mirrored in the oracle's recursive CTE so both engines
    // compute the identical bounded-hop distance). Pure integer algebra —
    // dist state is BIGINT hops, `least` ignoring NULLs is the min-relax.
    // Scale shape per round: edges ⋈ broadcast(dist state) →
    // one partial-agg groupBy(dst) — the frontier state is |nodes| rows
    // while the billion-edge side is never re-shuffled (at |nodes| too
    // large to broadcast the same loop runs co-partitioned on src, as
    // graph_pagerank documents); rounds = hop bound, not |V|.
    Q("graph_shortest_path",
      Some(
        s"""WITH RECURSIVE $uedgesSql,
           |bfs AS (
           |  SELECT CAST(0 AS INT) AS id, CAST(0 AS BIGINT) AS d
           |  UNION
           |  SELECT e.dst, b.d + 1 FROM bfs b JOIN uedges e ON e.src = b.id
           |  WHERE b.d < 7
           |), dist AS (SELECT id, min(d) AS dist FROM bfs GROUP BY id)
           |SELECT n_name, coalesce(dist.dist, -1) AS dist
           |FROM nation LEFT JOIN dist ON dist.id = n_nationkey
           |ORDER BY n_name""".stripMargin),
      (s, dir) => {
        val uedges = uedgesDf(s, dir).localCheckpoint()
        val nodes = tbl(s, dir, "nation").select(col("n_nationkey").as("id"))
        val d0 = nodes.select(col("id"),
          when(col("id") === 0, lit(0L)).as("dist"))
        def round(prev: DataFrame): DataFrame = {
          val st = broadcast(
            prev.filter(col("dist").isNotNull)
              .select(col("id").as("sid"), col("dist").as("sd")))
          val relax = uedges.join(st, col("src") === col("sid"))
            .groupBy(col("dst").as("rid"))
            .agg(min(col("sd") + 1).as("nd"))
          prev.join(relax, prev("id") === col("rid"), "left")
            .select(prev("id"), least(col("dist"), col("nd")).as("dist"))
        }
        // checkpoint the |nodes|-row state EVERY round: each round reads
        // prev twice (broadcast frontier + outer join), so un-materialized
        // lineage doubles per round — the 7-round tree re-evaluated the
        // whole prefix ~2^7 times (measured 6.4 s for a 25-node graph;
        // ~1 s checkpointed)
        val ckpts = scala.collection.mutable.ArrayBuffer(uedges)
        var dist = d0.localCheckpoint(); ckpts += dist
        for (_ <- 1 to 7) { dist = round(dist).localCheckpoint(); ckpts += dist }
        val nation = tbl(s, dir, "nation")
        val out = dist
          .join(broadcast(nation), dist("id") === nation("n_nationkey"))
          .select(col("n_name"), coalesce(col("dist"), lit(-1L)).as("dist"))
          .orderBy("n_name")
        graft.H.materialized(out, Nil, ckpts.toSeq)
      }))
}
