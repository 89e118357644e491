package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{DedupSketches => DS}

/** Twenty-eighth wave: hierarchical (local→global) deduplication — the
  * composition a 100 TB dedup actually runs: exact dedup WITHIN each
  * shard first (cheap, hash-local, kills the bulk), MinHash near-dup
  * ACROSS the survivors second (the expensive band machinery only ever
  * sees the reduced stream). Decisions chain: an exact-dropped doc's
  * survivor follows its keeper's near-dup resolution, so every document
  * points at its FINAL canonical representative.
  */
object HierDedupQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    Q("dedup_hierarchical",
      Some {
        val shOnSurv = DS.shinglesSql(3)
          .replace("FROM documents", "FROM surv_docs")
        // sh/sig/cand MATERIALIZED (r8 oracle-memory discipline, same as
        // split_leakage_audit): each is referenced by several downstream
        // CTEs (bands is a 4-way UNION ALL over sig; the verify joins sh
        // twice; pairs reads sig twice) — the 500 MB stress sweep OOM'd
        // on the inlined recomputation, one pinned copy passes.
        s"""WITH RECURSIVE ex AS (
           |  SELECT doc_id, source, text,
           |    min(doc_id) OVER (PARTITION BY source, md5(text)) AS ex_keeper
           |  FROM documents),
           |surv_docs AS (
           |  SELECT doc_id, text FROM ex WHERE doc_id = ex_keeper),
           |""".stripMargin +
          s"sh AS MATERIALIZED ($shOnSurv), " +
          s"sig AS MATERIALIZED (${DS.minhashSignatureSql}), " +
          s"bands AS (${DS.lshBandsSql}), " +
          s"cand AS MATERIALIZED (${DS.candidatePairsSql}), " +
          "inter AS (SELECT doc_a, doc_b, count(*) AS ni FROM cand " +
          "JOIN sh sa ON sa.doc_id = doc_a " +
          "JOIN sh sb ON sb.doc_id = doc_b AND sb.shingle = sa.shingle " +
          "GROUP BY doc_a, doc_b), " +
          "pairs AS (SELECT c.doc_a, c.doc_b FROM cand c " +
          "JOIN sig ca ON ca.doc_id = c.doc_a " +
          "JOIN sig cb ON cb.doc_id = c.doc_b " +
          "LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b " +
          "WHERE CAST(coalesce(ni, 0) AS DOUBLE) / " +
          "CAST(ca.n + cb.n - coalesce(ni, 0) AS DOUBLE) >= 0.5), " +
          "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs " +
          "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
          "reach AS (SELECT src AS node, src AS root FROM edges " +
          "UNION SELECT e.dst, r.root FROM reach r JOIN edges e " +
          "ON e.src = r.node), " +
          "grp AS (SELECT node AS doc_id, min(root) AS canonical " +
          "FROM reach GROUP BY node), " +
          "nearres AS (SELECT s.doc_id, " +
          "coalesce(g.canonical, s.doc_id) AS near_surv FROM surv_docs s " +
          "LEFT JOIN grp g ON g.doc_id = s.doc_id) " +
          "SELECT e.doc_id, " +
          "CASE WHEN e.doc_id <> e.ex_keeper THEN 'drop_exact_local' " +
          "WHEN n.near_surv <> e.doc_id THEN 'drop_near_global' " +
          "ELSE 'keep' END AS decision, " +
          "CAST(n.near_surv AS BIGINT) AS survivor " +
          "FROM (SELECT doc_id, ex_keeper FROM ex) e " +
          "JOIN nearres n ON n.doc_id = e.ex_keeper " +
          "ORDER BY e.doc_id"
      },
      { (s, dir) =>
        val docs = tbl(s, dir, "documents")
        // level 1: exact dedup within each source shard — hash-local,
        // no cross-shard traffic; keeper = min doc_id of the byte-equal
        // group (md5 over the text, same grouping the oracle uses)
        val ex = docs.withColumn("ex_keeper",
          min("doc_id").over(Window.partitionBy(col("source"),
            md5(col("text")))))
        val surv = ex.filter(col("doc_id") === col("ex_keeper"))
          .select("doc_id", "text")
        // level 2: MinHash near-dup across the reduced survivor stream
        val sh = DS.shingles(surv, 3).cache()
        val sig = DS.minhashSignature(sh).cache()
        val cand = DS.candidatePairs(DS.lshBands(sig)).localCheckpoint()
        val pairs = DS.verifiedJaccard(cand, sh,
            Some(sig.select(col("doc_id"), col("n"))))
          .filter(col("jaccard") >= 0.5).select("doc_a", "doc_b")
        val labels = DS.connectedComponents(pairs)
        val nearres = surv.select(col("doc_id"))
          .join(labels.select(col("node").as("doc_id"),
            col("label").as("canonical")), Seq("doc_id"), "left")
          .select(col("doc_id").as("k_id"),
            coalesce(col("canonical"), col("doc_id")).as("near_surv"))
        H.materialized(
          ex.select(col("doc_id"), col("ex_keeper"))
            .join(nearres, col("ex_keeper") === col("k_id"))
            .select(col("doc_id"),
              when(col("doc_id") =!= col("ex_keeper"), "drop_exact_local")
                .when(col("near_surv") =!= col("doc_id"), "drop_near_global")
                .otherwise("keep").as("decision"),
              col("near_surv").cast("long").as("survivor"))
            .orderBy("doc_id"),
          caches = Seq(sh, sig), checkpoints = Seq(cand, labels))
      })
  )
}
