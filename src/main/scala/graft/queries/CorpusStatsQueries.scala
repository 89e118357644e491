package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Ninth wave: corpus composition analytics — the cross-source overlap
  * matrix (which sources duplicate each other, the first question asked
  * before mixing corpora) and the per-source n-gram novelty score (how
  * much of a source is unique to it).
  */
object CorpusStatsQueries extends QueryModule {

  /** Distinct (source, 3-gram shingle) pairs — the source-level shingle
    * set both queries work from. Same shingle construction as the dedup
    * family (DedupSketches.shingles), keyed by source instead of doc.
    * private[graft]: PlanGuardsSpec asserts on the pre-materialization
    * plans (the judged queries checkpoint their result, which hides the
    * interior plan behind an RDD scan). */
  private[graft] def sourceShingles(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("source"), split(col("text"), " ").as("toks"))
      .select(col("source"), explode(expr(
        "array_distinct(CASE WHEN size(toks) >= 3 THEN " +
          "transform(sequence(0, size(toks) - 3), " +
          "i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])) " +
          "ELSE array() END)")).as("shingle"))
      .distinct()

  private val sourceShinglesSql: String =
    "SELECT DISTINCT source, l[i] || ' ' || l[i + 1] || ' ' || l[i + 2] AS shingle " +
      "FROM (SELECT source, l, unnest(range(1, len(l) - 1)) AS i " +
      "FROM (SELECT source, string_split(text, ' ') AS l FROM documents))"

  def all: Seq[Q] = Seq(

    // CROSS-SOURCE OVERLAP MATRIX: exact shingle-Jaccard between every
    // source pair — the "which of my 20 corpora are secretly the same
    // crawl" report. The pair generation is a shingle-keyed self-join:
    // per-shingle fan-out is bounded by |sources|² (here ≤400), never by
    // corpus size, so the join cost is linear in total shingle
    // occurrences; hot shingles (stopword trigrams resident in every
    // source) are ordinary skewed keys that AQE splits. Per-source set
    // sizes come from one partial-agg pass and join back broadcast. The
    // shingle set is cached once and freed — the self-join's two branches
    // must not re-run the explode+distinct.
    Q("corpus_overlap_matrix",
      Some(
        s"""WITH ss AS ($sourceShinglesSql),
           |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ss GROUP BY source),
           |pairs AS (
           |  SELECT a.source AS source_a, b.source AS source_b,
           |         CAST(count(*) AS BIGINT) AS n_shared
           |  FROM ss a JOIN ss b ON a.shingle = b.shingle AND a.source < b.source
           |  GROUP BY 1, 2
           |)
           |SELECT source_a, source_b, n_shared,
           |       CAST(n_shared AS DOUBLE) /
           |         CAST(sa.n + sb.n - n_shared AS DOUBLE) AS jaccard
           |FROM pairs
           |JOIN sizes sa ON sa.source = source_a
           |JOIN sizes sb ON sb.source = source_b
           |ORDER BY source_a, source_b""".stripMargin),
      (s, dir) => {
        val ss = sourceShingles(s, dir).cache()
        H.materialized(overlapFrame(ss), caches = Seq(ss))
      }),

    // N-GRAM NOVELTY: per source, the fraction of its shingles that occur
    // in NO other source — the uniqueness complement of the overlap
    // matrix (a source with low novelty and high pairwise Jaccard is a
    // re-crawl, not new data). Shingle → resident-source count is one
    // partial-agg groupBy (bounded value domain per shingle); uniqueness
    // joins back onto the per-source totals. No self-join at all, so this
    // is the cheap first-pass screen before the pairwise matrix.
    Q("corpus_ngram_novelty",
      Some(
        s"""WITH ss AS ($sourceShinglesSql),
           |res AS (
           |  SELECT shingle, CAST(count(*) AS BIGINT) AS n_sources
           |  FROM ss GROUP BY shingle
           |)
           |SELECT ss.source,
           |       CAST(count(*) AS BIGINT) AS n_shingles,
           |       CAST(count(CASE WHEN res.n_sources = 1 THEN 1 END) AS BIGINT) AS n_unique,
           |       CAST(count(CASE WHEN res.n_sources = 1 THEN 1 END) AS DOUBLE) /
           |         CAST(count(*) AS DOUBLE) AS novelty
           |FROM ss JOIN res ON res.shingle = ss.shingle
           |GROUP BY ss.source ORDER BY ss.source""".stripMargin),
      (s, dir) => {
        val ss = sourceShingles(s, dir).cache()
        H.materialized(noveltyFrame(ss), caches = Seq(ss))
      }))

  /** Pre-materialization overlap-matrix frame over a (cached) shingle set —
    * split out so PlanGuardsSpec can assert the interior plan shape. */
  private[graft] def overlapFrame(ss: DataFrame): DataFrame = {
    val sizes = ss.groupBy("source").agg(count(lit(1)).as("n"))
    val pairs = ss.as("a")
      .join(ss.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(sizes.as("sa")), col("source_a") === col("sa.source"))
      .join(broadcast(sizes.as("sb")), col("source_b") === col("sb.source"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        (col("n_shared").cast("double") /
          (col("sa.n") + col("sb.n") - col("n_shared")).cast("double"))
          .as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** Pre-materialization novelty frame — see overlapFrame. */
  private[graft] def noveltyFrame(ss: DataFrame): DataFrame = {
    val res = ss.groupBy("shingle").agg(count(lit(1)).as("n_sources"))
    ss.join(res, "shingle")
      .groupBy("source")
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("n_sources") === 1, 1)).as("n_unique"),
        (count(when(col("n_sources") === 1, 1)).cast("double") /
          count(lit(1)).cast("double")).as("novelty"))
      .orderBy("source")
  }
}
