package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{CustomExpressions => CE, DedupSketches => DS,
  VectorSim => VS}

/** Twentieth wave: diversity/coverage ops — the Heaps-law vocabulary
  * growth curve, greedy k-center coreset selection over embeddings, and a
  * per-source template-prefix probe.
  *
  * Determinism: the growth curve is first-occurrence integer bucketing;
  * k-center distances are the fused squared-distance expression whose
  * DuckDB twin is the identical left-associated sum, with ties broken by
  * vec_id; prefix diversity is exact distinct counting.
  */
object CoresetOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // HEAPS-LAW GROWTH CURVE: how many NEW 3-shingles each corpus decile
    // contributes — the saturation curve that tells a crawl operator
    // whether more data still buys new content or just re-buys the head.
    // First occurrence is min(doc_id) per shingle (one map-side-combined
    // pass over the shingle stream); deciles are integer bucketing
    // against the broadcast max; novelty divides two exact BIGINTs. At
    // 100 TB this is the same two aggregations — the shingle domain is
    // the reduced stream, never collected.
    Q("corpus_vocab_growth",
      Some(s"WITH sh AS (${DS.shinglesSql(3)}), " +
        "fo AS (SELECT shingle, min(doc_id) AS fd FROM sh GROUP BY 1), " +
        "inst AS (SELECT doc_id FROM sh), " +
        "mx AS (SELECT max(doc_id) + 1 AS m FROM documents), " +
        "newsh AS (SELECT least(9, fd * 10 // m) AS decile, " +
        "CAST(count(*) AS BIGINT) AS new_shingles FROM fo, mx GROUP BY 1), " +
        "vol AS (SELECT least(9, doc_id * 10 // m) AS decile, " +
        "CAST(count(*) AS BIGINT) AS instances FROM inst, mx GROUP BY 1) " +
        "SELECT n.decile, n.new_shingles, v.instances, " +
        "CAST(sum(n.new_shingles) OVER (ORDER BY n.decile) AS BIGINT) " +
        "AS cum_vocab, " +
        "CAST(n.new_shingles AS DOUBLE) / CAST(v.instances AS DOUBLE) " +
        "AS novelty " +
        "FROM newsh n JOIN vol v ON n.decile = v.decile ORDER BY n.decile"),
      (s, dir) => {
        val sh = DS.shingles(tbl(s, dir, "documents"), 3)
        val mx = tbl(s, dir, "documents")
          .agg((max("doc_id") + 1).as("m"))
        val fo = sh.groupBy("shingle").agg(min("doc_id").as("fd"))
        val newsh = fo.crossJoin(broadcast(mx))
          .groupBy(least(lit(9L), expr("fd * 10 div m"))
            .cast("long").as("decile"))
          .agg(count(lit(1)).as("new_shingles"))
        val vol = sh.select("doc_id").crossJoin(broadcast(mx))
          .groupBy(least(lit(9L), expr("doc_id * 10 div m"))
            .cast("long").as("decile"))
          .agg(count(lit(1)).as("instances"))
        newsh.join(vol, Seq("decile"))
          .withColumn("cum_vocab",
            sum("new_shingles").over(
              org.apache.spark.sql.expressions.Window.orderBy("decile"))
              .cast("long"))
          .select(col("decile"), col("new_shingles"), col("instances"),
            col("cum_vocab"),
            (col("new_shingles").cast("double") /
              col("instances").cast("double")).as("novelty"))
          .orderBy("decile")
      }),

    // GREEDY K-CENTER CORESET: 4 rounds of farthest-point selection over
    // the embedding table — the classic 2-approximation coreset a
    // training-data pipeline uses to pick maximally diverse exemplars.
    // The selection is inherently sequential in k, so each round is one
    // bounded job: the running min-distance column updates against the
    // single new center (broadcast 1-row), and argmax picks by
    // (distance desc, vec_id) — k tiny jobs over a partitioned scan, no
    // driver-side distance matrix. The oracle unrolls the same 4 rounds
    // as chained CTEs with the identical left-associated distance sum.
    Q("select_kcenter",
      Some {
        val ssd = VS.ssdSql("e.v", "c.v")
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
          |  FROM embeddings),
          |""".stripMargin +
          // round 1: distances to seed (vec_id 0)
          s"d1 AS (SELECT e.vec_id, e.v, ($ssd) AS dmin FROM e, " +
          "(SELECT v FROM e WHERE vec_id = 0) c WHERE e.vec_id <> 0), " +
          "p1 AS (SELECT vec_id, v, dmin FROM d1 " +
          "ORDER BY dmin DESC, vec_id LIMIT 1), " +
          (2 to 4).map { r =>
            val prev = r - 1
            s"d$r AS (SELECT e.vec_id, e.v, least(e.dmin, ($ssd)) AS dmin " +
              s"FROM d$prev e, (SELECT v FROM p$prev) c " +
              s"WHERE e.vec_id <> (SELECT vec_id FROM p$prev)), " +
              s"p$r AS (SELECT vec_id, v, dmin FROM d$r " +
              "ORDER BY dmin DESC, vec_id LIMIT 1), "
          }.mkString +
          "sel AS (SELECT 0 AS round, CAST(0 AS BIGINT) AS center, " +
          "0.0 AS dist FROM (VALUES (1)) seed(x) " +
          (1 to 4).map(r =>
            s"UNION ALL SELECT $r, vec_id, dmin FROM p$r ").mkString +
          ") SELECT CAST(round AS BIGINT) AS round, " +
          "CAST(center AS BIGINT) AS center, dist FROM sel ORDER BY round"
      },
      (s, dir) => {
        CE.registerTemp(s)
        val frames = scala.collection.mutable.ListBuffer.empty[DataFrame]
        def ckpt(df: DataFrame): DataFrame = {
          val c = df.localCheckpoint(); frames += c; c
        }
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val seed = e.filter(col("vec_id") === 0)
          .select(col("v").as("cv"))
        var pool: DataFrame = ckpt(e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(seed))
          .select(col("vec_id"), col("v"),
            CE.squared_distance(col("v"), col("cv")).as("dmin")))
        var picks = Seq[(Int, DataFrame)]()
        for (r <- 1 to 4) {
          val p = ckpt(pool.orderBy(col("dmin").desc, col("vec_id")).limit(1))
          picks :+= (r -> p)
          if (r < 4) {
            val c = p.select(col("vec_id").as("cid"), col("v").as("cv"))
            pool = ckpt(pool.crossJoin(broadcast(c))
              .filter(col("vec_id") =!= col("cid"))
              .select(col("vec_id"), col("v"),
                least(col("dmin"),
                  CE.squared_distance(col("v"), col("cv"))).as("dmin")))
          }
        }
        val zero = s.range(1).select(lit(0L).as("round"),
          lit(0L).as("center"), lit(0.0).as("dist"))
        val out = picks.map { case (r, p) =>
          p.select(lit(r.toLong).as("round"),
            col("vec_id").cast("long").as("center"), col("dmin").as("dist"))
        }.foldLeft(zero)(_.unionByName(_)).orderBy("round")
        H.materialized(out, caches = Nil, checkpoints = frames.toSeq)
      }),

    // TEMPLATE-PREFIX PROBE: per source, how many DISTINCT document
    // prefixes exist at 5/10/20 chars — a source whose docs collapse to
    // one prefix is template/boilerplate output (the C4-style signal for
    // dropping a domain). One map-side-combined aggregation; the three
    // distinct counts share a single pass via Spark's expand.
    Q("text_template_prefix",
      Some(
        """SELECT source,
          |  CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(count(DISTINCT substr(text, 1, 5)) AS BIGINT) AS p5,
          |  CAST(count(DISTINCT substr(text, 1, 10)) AS BIGINT) AS p10,
          |  CAST(count(DISTINCT substr(text, 1, 20)) AS BIGINT) AS p20,
          |  CAST(CASE WHEN count(DISTINCT substr(text, 1, 20)) = 1
          |       THEN 1 ELSE 0 END AS BIGINT) AS templated
          |FROM documents GROUP BY source ORDER BY source""".stripMargin),
      (s, dir) =>
        tbl(s, dir, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(substring(col("text"), 1, 5)).as("p5"),
            countDistinct(substring(col("text"), 1, 10)).as("p10"),
            countDistinct(substring(col("text"), 1, 20)).as("p20"),
            when(countDistinct(substring(col("text"), 1, 20)) === 1, 1L)
              .otherwise(0L).cast("long").as("templated"))
          .orderBy("source"))
  )
}
