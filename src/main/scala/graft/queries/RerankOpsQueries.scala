package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{VectorSim => VS}

/** Twenty-fifth wave: re-ranking/AV ops — MMR diversified re-ranking
  * (greedy, like select_kcenter's proven unrolled-oracle pattern),
  * energy-gate voice-activity detection over true decoded PCM, and
  * naive-seasonal forecast backtesting.
  *
  * Determinism: MMR scores are fixed-order double expressions with
  * vid tie-breaks; VAD's decision path is an exact integer energy
  * compare; backtest errors are exact integer sums with one division.
  */
object RerankOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // MMR DIVERSIFIED RE-RANKING: from the top-20 cosine candidates for
    // probe vector 0, greedily select 5 results maximizing
    // relevance − max-similarity-to-selected (λ=0.5 scaled out — the
    // difference is monotone in the λ=0.5 MMR objective) — the re-ranker
    // that keeps a retrieval page from showing five near-copies.
    // Sequential in k by nature, so each round is one bounded argmax job
    // over the 20-row candidate frame with the running max-sim updated
    // against a single broadcast pick; the oracle unrolls the identical
    // rounds as chained CTEs (the select_kcenter pattern, greatest()
    // instead of least()).
    Q("sim_mmr_rerank",
      Some {
        val cos = s"(${VS.dotSql("e.v", "q.v")}) / (sqrt(e.nrm) * sqrt(q.nrm))"
        val pcos = s"(${VS.dotSql("e.v", "c.v")}) / (sqrt(e.nrm) * sqrt(c.nrm))"
        """WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v
          |  FROM embeddings),
          |n AS (SELECT vec_id, v,
          |""".stripMargin +
          s"(${VS.norm2Sql("v")}) AS nrm FROM emb), " +
          // AS MATERIALIZED on every chained CTE: each round references
          // its predecessor several times, and inlining would expand the
          // 64-term cosine expressions ~3^k-fold (measured: DuckDB OOMs
          // at round 5 without the hint)
          "cand AS MATERIALIZED (SELECT e.vec_id, e.v, e.nrm, " +
          s"$cos AS rel, CAST(row_number() OVER (ORDER BY $cos DESC, " +
          "e.vec_id) AS BIGINT) AS rnk " +
          "FROM n e, (SELECT v, nrm FROM n WHERE vec_id = 0) q " +
          "WHERE e.vec_id <> 0 QUALIFY rnk <= 20), " +
          "d1 AS MATERIALIZED (SELECT vec_id, v, nrm, rel, " +
          "CAST(-1.0 AS DOUBLE) AS ms FROM cand), " +
          "p1 AS MATERIALIZED (SELECT vec_id, v, nrm, rel, rel AS score " +
          "FROM d1 ORDER BY rel DESC, vec_id LIMIT 1), " +
          (2 to 5).map { r =>
            val prev = r - 1
            s"d$r AS MATERIALIZED (SELECT e.vec_id, e.v, e.nrm, e.rel, " +
              s"greatest(e.ms, $pcos) AS ms " +
              s"FROM d$prev e, (SELECT v, nrm FROM p$prev) c " +
              s"WHERE e.vec_id <> (SELECT vec_id FROM p$prev)), " +
              s"p$r AS MATERIALIZED (SELECT vec_id, v, nrm, rel, " +
              s"rel - ms AS score " +
              s"FROM d$r ORDER BY rel - ms DESC, vec_id LIMIT 1), "
          }.mkString.dropRight(2) + " " +
          "SELECT * FROM (" +
          (1 to 5).map(r =>
            s"SELECT CAST($r AS BIGINT) AS round, CAST(vec_id AS BIGINT) " +
              s"AS picked, rel, score FROM p$r").mkString(" UNION ALL ") +
          ") ORDER BY round"
      },
      (s, dir) => {
        val frames = scala.collection.mutable.ListBuffer.empty[DataFrame]
        def ckpt(df: DataFrame): DataFrame = {
          val c = df.localCheckpoint(); frames += c; c
        }
        val n = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          .withColumn("nrm", VS.norm2("v"))
        val q = n.filter(col("vec_id") === 0)
          .select(col("v").as("qv"), col("nrm").as("qn"))
        val rel = VS.dot("v", "qv") / (sqrt(col("nrm")) * sqrt(col("qn")))
        val cand = ckpt(n.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .withColumn("rel", rel)
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("rel").desc, col("vec_id"))).cast("long"))
          .filter(col("rnk") <= 20)
          .select(col("vec_id"), col("v"), col("nrm"), col("rel"),
            lit(-1.0).as("ms")))
        var pool = cand
        var picks = Seq.empty[(Int, DataFrame)]
        for (r <- 1 to 5) {
          val scored = pool.withColumn("score",
            if (r == 1) col("rel") else col("rel") - col("ms"))
          val p = ckpt(scored.orderBy(col("score").desc, col("vec_id"))
            .limit(1))
          picks :+= (r -> p)
          if (r < 5) {
            val c = p.select(col("vec_id").as("cid"), col("v").as("cv"),
              col("nrm").as("cn"))
            pool = ckpt(pool.crossJoin(broadcast(c))
              .filter(col("vec_id") =!= col("cid"))
              .select(col("vec_id"), col("v"), col("nrm"), col("rel"),
                greatest(col("ms"), VS.dot("v", "cv") /
                  (sqrt(col("nrm")) * sqrt(col("cn")))).as("ms")))
          }
        }
        val out = picks.map { case (r, p) =>
          p.select(lit(r.toLong).as("round"),
            col("vec_id").cast("long").as("picked"), col("rel"),
            col("score"))
        }.reduce(_.unionByName(_)).orderBy("round")
        H.materialized(out, caches = Nil, checkpoints = frames.toSeq)
      }),

    // VOICE-ACTIVITY DETECTION over TRUE decoded PCM: full 40-sample
    // frames gate on exact integer energy (Σs² ≥ 40·16000² — no float
    // RMS decides a frame), then active runs summarize to segment count
    // and longest run — the audio-curation op that prices a clip's
    // speech density before transcription. The oracle rebuilds every
    // frame closed-form, so container-walk or sample-decode bugs break
    // the hash; the segment logic is verified by the gaps-and-islands
    // SQL twin.
    Q("multimodal_vad",
      Some(
        """WITH dims AS (
          |  SELECT doc_id,
          |    64 + (doc_id * 3 + octet_length(encode(text))) % 192 AS n
          |  FROM documents),
          |fr AS (SELECT doc_id, n, unnest(range(0, n // 40)) AS f FROM dims),
          |en AS (
          |  SELECT doc_id, n, f,
          |    CASE WHEN list_sum(list_transform(range(f * 40, f * 40 + 40),
          |      i -> ((doc_id * 7 + i * 13) % 65536 - 32768) *
          |           ((doc_id * 7 + i * 13) % 65536 - 32768)))
          |      >= 40::BIGINT * 16000 * 16000 THEN 1 ELSE 0 END AS active
          |  FROM fr),
          |runs AS (
          |  SELECT doc_id, n, f, active,
          |    f - row_number() OVER (PARTITION BY doc_id, active ORDER BY f)
          |      AS grp
          |  FROM en),
          |seg AS (
          |  SELECT doc_id, CAST(count(*) AS BIGINT) AS len
          |  FROM runs WHERE active = 1 GROUP BY doc_id, grp)
          |SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_samples,
          |  CAST(d.n // 40 AS BIGINT) AS n_frames,
          |  CAST(coalesce((SELECT sum(active) FROM en
          |    WHERE en.doc_id = d.doc_id), 0) AS BIGINT) AS n_active,
          |  CAST(coalesce((SELECT count(*) FROM seg
          |    WHERE seg.doc_id = d.doc_id), 0) AS BIGINT) AS n_segments,
          |  CAST(coalesce((SELECT max(len) FROM seg
          |    WHERE seg.doc_id = d.doc_id), 0) AS BIGINT) AS longest_run
          |FROM dims d ORDER BY d.doc_id""".stripMargin),
      (s, dir) =>
        graft.functions.Multimodal
          .transformVad(s, tbl(s, dir, "documents"))
          .toDF()
          .orderBy("doc_id")),

    // NAIVE-SEASONAL BACKTEST: forecast(day) = actual(day − 7) per event
    // type, scored with MAE and WAPE — the baseline every forecasting
    // pipeline must beat, and the harness that proves the evaluation
    // plumbing before a real model enters. Errors are exact integer
    // sums; each metric is one final division. Everything after the
    // (type, day) reduce runs on the day domain via one lag window.
    Q("ts_backtest_naive",
      Some(
        """WITH d AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day,
          |         CAST(count(*) AS BIGINT) AS c
          |  FROM events GROUP BY 1, 2),
          |j AS (
          |  SELECT event_type, day, c,
          |    lag(c, 7) OVER (PARTITION BY event_type ORDER BY day) AS fc
          |  FROM d)
          |SELECT event_type, CAST(count(fc) AS BIGINT) AS n_days,
          |  CAST(sum(abs(c - fc)) AS DOUBLE) / count(fc) AS mae,
          |  CAST(sum(abs(c - fc)) AS DOUBLE) /
          |    CAST(sum(CASE WHEN fc IS NOT NULL THEN c END) AS DOUBLE)
          |    AS wape
          |FROM j WHERE fc IS NOT NULL
          |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val d = H.events(s, dir)
          .groupBy(col("event_type"), col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("c"))
        val j = d.withColumn("fc",
          lag("c", 7).over(Window.partitionBy("event_type").orderBy("day")))
        j.filter(col("fc").isNotNull)
          .groupBy("event_type")
          .agg(count("fc").as("n_days"),
            (sum(abs(col("c") - col("fc"))).cast("double") / count("fc"))
              .as("mae"),
            (sum(abs(col("c") - col("fc"))).cast("double") /
              sum(col("c")).cast("double")).as("wape"))
          .orderBy("event_type")
      })
  )
}
