package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{VectorSim => VS}

/** Thirty-ninth wave: self-redundancy scoring (the compression-ratio
  * proxy quality filters use), kNN-distance outlier detection over the
  * embedding corpus, and bounded-hop all-pairs distances via
  * multi-source BFS.
  */
object OutlierOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Self-redundancy: 1 − distinct/total 8-char windows — the
    // deterministic stand-in for the zlib compression-ratio signal that
    // quality pipelines use to drop boilerplate/spam (highly repetitive
    // text compresses well ⇔ low distinct-window share). Pure per-doc
    // window counting: one explode, one two-level reduce, exact micro
    // integers.
    Q("text_self_redundancy",
      Some("WITH pos AS (SELECT doc_id, " +
        "substr(text, CAST(i AS INTEGER), 8) AS win " +
        "FROM (SELECT doc_id, text, unnest(range(1, CAST(length(text) AS BIGINT) - 6)) AS i " +
        "FROM documents WHERE length(text) >= 8) t), " +
        "per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_win, " +
        "CAST(count(DISTINCT win) AS BIGINT) AS n_distinct FROM pos GROUP BY doc_id) " +
        "SELECT doc_id, n_win, n_distinct, " +
        "((n_win - n_distinct) * 1000000) // n_win AS redundancy_micro " +
        "FROM per ORDER BY redundancy_micro DESC, doc_id"),
      (s, dir) => {
        val pos = tbl(s, dir, "documents")
          .filter(length(col("text")) >= 8)
          .select(col("doc_id"),
            explode(expr("sequence(1, length(text) - 7)")).as("i"), col("text"))
          .select(col("doc_id"),
            expr("substring(text, CAST(i AS INT), 8)").as("win"))
        pos.groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_win"),
            countDistinct("win").cast("long").as("n_distinct"))
          .select(col("doc_id"), col("n_win"), col("n_distinct"),
            expr("((n_win - n_distinct) * 1000000) div n_win")
              .as("redundancy_micro"))
          .orderBy(col("redundancy_micro").desc, col("doc_id"))
      }),

    // kNN-distance outliers: a point whose 3rd-nearest neighbor is far
    // is isolated — the semdedup/quality-filter signal for "off-manifold"
    // embeddings. Candidates come from the LSH buckets (production
    // shape); points whose bucket holds < 3 candidates are reported
    // through the n_cand column rather than silently ranked (no silent
    // coverage gap). Distances stay micro-rounded integers.
    Q("emb_knn_outliers",
      Some(s"WITH ${VS.skewCappedCtesSql}, " +
        "p AS (SELECT a.vec_id AS id, b.vec_id AS nb, " +
        s"CAST(round((1 - (${VS.dotSql("a.v", "b.v")}) / (sqrt(a.nrm) * sqrt(b.nrm))) * 1000000) AS BIGINT) AS dist_micro " +
        "FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id), " +
        "r AS (SELECT id, dist_micro, row_number() OVER " +
        "(PARTITION BY id ORDER BY dist_micro, nb) AS rk, " +
        "count(*) OVER (PARTITION BY id) AS n_cand FROM p), " +
        "k3 AS (SELECT id, dist_micro AS knn3_micro, CAST(n_cand AS BIGINT) AS n_cand " +
        "FROM r WHERE rk = 3) " +
        "SELECT CAST(row_number() OVER (ORDER BY knn3_micro DESC, id) AS BIGINT) AS rnk, " +
        "id, knn3_micro, n_cand FROM k3 QUALIFY rnk <= 20 ORDER BY rnk"),
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val (nk, sigCk) = VS.skewCappedKey(e, "v", e.count(), "bucket")
        val n = nk.localCheckpoint()
        val p = n.select(col("vec_id").as("id"), col("v").as("av"), col("bucket"))
          .join(n.select(col("vec_id").as("nb"), col("v").as("bv"),
            col("bucket").as("bb")),
            col("bucket") === col("bb") && col("id") =!= col("nb"))
          .withColumn("cs", graft.functions.CustomExpressions
            .cosine_sim(col("av"), col("bv")))
          .select(col("id"), col("nb"),
            expr("CAST(round((1 - cs) * 1000000) AS BIGINT)").as("dist_micro"))
        val w = Window.partitionBy("id")
        val r = p
          .withColumn("rk", row_number().over(
            w.orderBy(col("dist_micro"), col("nb"))))
          .withColumn("n_cand", count(lit(1)).over(w).cast("long"))
        val k3 = r.filter(col("rk") === 3)
          .select(col("id"), col("dist_micro").as("knn3_micro"), col("n_cand"))
        val top = k3.orderBy(col("knn3_micro").desc, col("id")).limit(20)
        H.materialized(
          top.withColumn("rnk", row_number().over(
              Window.orderBy(col("knn3_micro").desc, col("id"))).cast("long"))
            .select("rnk", "id", "knn3_micro", "n_cand").orderBy("rnk"),
          caches = Nil, checkpoints = Seq(n, sigCk))
      }),

    // Bounded all-pairs shortest paths: multi-source BFS — state is
    // (source, node, dist) for ALL sources simultaneously, each round one
    // edges ⋈ state relax (the single-source loop run |V| times would be
    // |V| passes; this is ROUNDS passes with |V|² state — the right
    // trade when |V|² state fits, as the pagerank docs argue for the
    // frontier). Output: per node its 4-hop eccentricity and reach set
    // size — the graph-health profile.
    Q("graph_bounded_apsp",
      Some(
        s"""WITH RECURSIVE $uedgesSqlLocal,
           |bfs AS (
           |  SELECT n_nationkey AS src, n_nationkey AS id, CAST(0 AS BIGINT) AS d
           |  FROM nation
           |  UNION
           |  SELECT b.src, e.dst, b.d + 1 FROM bfs b JOIN uedges e ON e.src = b.id
           |  WHERE b.d < 4
           |), dist AS (SELECT src, id, min(d) AS dist FROM bfs GROUP BY src, id)
           |SELECT n_name, CAST(max(dist) AS BIGINT) AS ecc4,
           |       CAST(count(*) AS BIGINT) AS reach4
           |FROM dist JOIN nation ON n_nationkey = src
           |GROUP BY n_name ORDER BY n_name""".stripMargin),
      (s, dir) => {
        val uedges = RetrievalQueries.uedgesDf(s, dir).localCheckpoint()
        val nodes = tbl(s, dir, "nation").select(col("n_nationkey").as("id"))
        val ckpts = scala.collection.mutable.ArrayBuffer(uedges)
        // state: (src, id, d) — min-dist per (src, id) so far
        var dist = nodes.select(col("id").as("src"), col("id"),
          lit(0L).as("d")).localCheckpoint()
        ckpts += dist
        for (_ <- 1 to 4) {
          val relax = dist
            .join(uedges.select(col("src").as("es"), col("dst")),
              col("id") === col("es"))
            .select(col("src"), col("dst").as("id"), (col("d") + 1).as("d"))
          dist = dist.unionAll(relax)
            .groupBy("src", "id").agg(min("d").as("d"))
            .localCheckpoint()
          ckpts += dist
        }
        val nation = tbl(s, dir, "nation")
        H.materialized(
          dist.join(broadcast(nation), col("src") === col("n_nationkey"))
            .groupBy("n_name")
            .agg(max("d").cast("long").as("ecc4"),
              count(lit(1)).cast("long").as("reach4"))
            .orderBy("n_name"),
          caches = Nil, checkpoints = ckpts.toSeq)
      }))

  /** The same undirected trade edge set as RetrievalQueries.uedgesSql,
    * aliased to avoid cross-module private access. */
  private def uedgesSqlLocal: String = RetrievalQueries.uedgesSql
}
