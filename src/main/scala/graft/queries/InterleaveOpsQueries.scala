package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Hundred-seventh wave: online-eval and vector-search realities —
  * team-draft interleaving of two rankers (the production A/B for
  * search, drafted deterministically and scored against a term-AND
  * relevance set), the Jarque-Bera normality test on daily revenue,
  * and FILTERED vector search: pre-filtered exact top-k vs the
  * take-top-20-then-filter shortcut, with the recall loss measured —
  * the canonical argument for filter-aware ANN indexes.
  *
  * Exactness: both rankers score in pure integers (tf·idf_micro and a
  * field-boosted variant); the draft is six unrolled rounds of
  * identical CTE text run verbatim by BOTH engines over the ranked
  * views; JB is one micro chain over HUGEINT raw moments; recall
  * counts are integers over hash-tiebroken top-k sets.
  */
object InterleaveOpsQueries extends QueryModule {

  /** Team-draft interleave, 3 rounds of (A pick, B pick), shared SQL:
    * expects relations rankA(doc_id, rnk), rankB(doc_id, rnk),
    * rel(doc_id). */
  private def draftSql: String = {
    // each pick: the team's best-ranked doc not in the prior picks
    def pick(team: String, k: Int, prior: Seq[String]): String = {
      val notIn = if (prior.isEmpty) ""
      else "WHERE " + prior.map(p => s"doc_id NOT IN (SELECT doc_id FROM $p)").mkString(" AND ")
      s"p$k AS (SELECT doc_id, '$team' AS team, $k AS pos FROM rank$team $notIn ORDER BY rnk, doc_id LIMIT 1)"
    }
    val names = (1 to 6).map(k => s"p$k")
    val picks = (1 to 6).map { k =>
      val team = if (k % 2 == 1) "A" else "B"
      pick(team, k, names.take(k - 1))
    }.mkString(",\n")
    val all = names.map(n => s"SELECT * FROM $n").mkString(" UNION ALL ")
    s"""WITH $picks,
       |draft AS ($all)
       |SELECT d.pos, d.team, d.doc_id,
       |  CAST(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END
       |    AS BIGINT) AS relevant
       |FROM draft d LEFT JOIN rel r ON r.doc_id = d.doc_id
       |ORDER BY d.pos""".stripMargin
  }

  def all: Seq[Q] = Seq(

    // Team-draft interleaving: ranker A (plain tf·idf) vs ranker B
    // (title-boosted tf·idf), drafted alternately over 6 positions —
    // each team takes its best not-yet-picked doc — and judged against
    // the docs containing ALL query terms. The drafting CTE chain is
    // GENERATED once and run verbatim by both engines over identically
    // scored views; the per-position relevance flags decide which
    // ranker wins the session.
    Q("rank_interleaving_pref",
      Some {
        val score =
          """WITH tok AS (SELECT doc_id,
            |  unnest(string_split(text, ' ')) AS w,
            |  generate_subscripts(string_split(text, ' '), 1) AS i
            |  FROM documents),
            |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf,
            |  CAST(sum(CASE WHEN i <= 5 THEN 3 ELSE 1 END) AS BIGINT)
            |    AS wtf
            |  FROM tok WHERE w <> '' GROUP BY 1, 2),
            |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
            |idf AS (SELECT w, CAST(floor(ln(CAST(nn.n AS DOUBLE)
            |    / CAST(count(*) AS DOUBLE)) * 1000000.0) AS BIGINT)
            |    AS idf_micro
            |  FROM tf, nn WHERE w IN ('scan', 'merge', 'vector')
            |  GROUP BY w, nn.n),
            |sa AS (SELECT tf.doc_id,
            |    CAST(sum(tf.tf * idf.idf_micro) AS BIGINT) AS sc
            |  FROM tf JOIN idf ON idf.w = tf.w GROUP BY 1),
            |sb AS (SELECT tf.doc_id,
            |    CAST(sum(tf.wtf * idf.idf_micro) AS BIGINT) AS sc
            |  FROM tf JOIN idf ON idf.w = tf.w GROUP BY 1),
            |rankA AS (SELECT doc_id, row_number() OVER
            |  (ORDER BY sc DESC, doc_id) AS rnk FROM sa),
            |rankB AS (SELECT doc_id, row_number() OVER
            |  (ORDER BY sc DESC, doc_id) AS rnk FROM sb),
            |rel AS (SELECT doc_id FROM tf
            |  WHERE w IN ('scan', 'merge', 'vector')
            |  GROUP BY 1 HAVING count(DISTINCT w) = 3),
            |""".stripMargin
        score + draftSql.stripPrefix("WITH ")
      },
      (s, dir) => {
        val tf = tbl(s, dir, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ", -1)))
          .withColumnRenamed("col", "w").withColumnRenamed("pos", "i0")
          .withColumn("i", col("i0") + 1)
          .filter(col("w") =!= "")
          .groupBy("doc_id", "w")
          .agg(count(lit(1)).cast("long").as("tf"),
            sum(when(col("i") <= 5, 3L).otherwise(1L)).cast("long")
              .as("wtf"))
          .localCheckpoint()
        val nn = tbl(s, dir, "documents")
          .agg(count(lit(1)).cast("long").as("n"))
        val idf = tf.filter(col("w").isin("scan", "merge", "vector"))
          .groupBy("w").agg(count(lit(1)).cast("long").as("df"))
          .crossJoin(broadcast(nn))
          .select(col("w"),
            floor(log(col("n").cast("double") /
              col("df").cast("double")) * 1000000.0d).cast("long")
              .as("idf_micro"))
        val scored = tf.join(broadcast(idf), Seq("w"))
        scored.groupBy("doc_id")
          .agg(sum(col("tf") * col("idf_micro")).cast("long").as("sc"))
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("sc").desc, col("doc_id"))))
          .select("doc_id", "rnk")
          .localCheckpoint() // the draft references this view ~9 times
          .createOrReplaceTempView("rankA")
        scored.groupBy("doc_id")
          .agg(sum(col("wtf") * col("idf_micro")).cast("long").as("sc"))
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("sc").desc, col("doc_id"))))
          .select("doc_id", "rnk")
          .localCheckpoint()
          .createOrReplaceTempView("rankB")
        tf.filter(col("w").isin("scan", "merge", "vector"))
          .groupBy("doc_id")
          .agg(countDistinct(col("w")).as("kw"))
          .filter(col("kw") === 3).select("doc_id")
          .createOrReplaceTempView("rel")
        s.sql(draftSql)
      }),

    // Jarque-Bera normality of daily revenue: skewness and kurtosis
    // from HUGEINT raw moments (kd units), JB = n/6·(S² + (K−3)²/4)
    // as one micro chain. Rejecting normality here is what justifies
    // the rank-based tests everywhere else in this battery.
    Q("stats_jarque_bera",
      Some(
        """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
          |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) // 100000 AS kd
          |  FROM orders GROUP BY 1),
          |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(kd) AS BIGINT) AS s1,
          |  sum(CAST(kd AS HUGEINT)*kd) AS s2,
          |  sum(CAST(kd AS HUGEINT)*kd*kd) AS s3,
          |  sum(CAST(kd AS HUGEINT)*kd*kd*kd) AS s4 FROM d),
          |z AS (SELECT n,
          |  CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE) AS mu,
          |  CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE) AS r2,
          |  CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE) AS r3,
          |  CAST(s4 AS DOUBLE)/CAST(n AS DOUBLE) AS r4 FROM m),
          |c AS (SELECT n,
          |  r2 - mu*mu AS m2,
          |  r3 - 3.0*mu*r2 + 2.0*mu*mu*mu AS m3,
          |  r4 - 4.0*mu*r3 + 6.0*mu*mu*r2 - 3.0*mu*mu*mu*mu AS m4
          |  FROM z)
          |SELECT n AS n_days,
          |  CAST(floor(m3 / (m2 * sqrt(m2)) * 1000000.0) AS BIGINT)
          |    AS skew_micro,
          |  CAST(floor(m4 / (m2 * m2) * 1000000.0) AS BIGINT)
          |    AS kurt_micro,
          |  CAST(floor(CAST(n AS DOUBLE) / 6.0
          |    * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
          |      + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0)
          |        / 4.0) * 1000000.0) AS BIGINT) AS jb_micro
          |FROM c
          |""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(expr("CAST(sum(CAST(floor(o_totalprice*100 + 0.5)" +
            " AS BIGINT)) AS BIGINT) div 100000").as("kd"))
        val m = d.agg(count(lit(1)).cast("long").as("n"),
          sum(col("kd")).cast("long").as("s1"),
          sum(col("kd").cast("decimal(38,0)") * col("kd"))
            .cast("decimal(38,0)").as("s2"),
          sum(col("kd").cast("decimal(38,0)") * col("kd") * col("kd"))
            .cast("decimal(38,0)").as("s3"),
          sum(col("kd").cast("decimal(38,0)") * col("kd") * col("kd") *
            col("kd")).cast("decimal(38,0)").as("s4"))
        val z = m.select(col("n"),
          (col("s1").cast("double") / col("n").cast("double")).as("mu"),
          (col("s2").cast("double") / col("n").cast("double")).as("r2"),
          (col("s3").cast("double") / col("n").cast("double")).as("r3"),
          (col("s4").cast("double") / col("n").cast("double")).as("r4"))
        val c = z.select(col("n"),
          (col("r2") - col("mu") * col("mu")).as("m2"),
          (col("r3") - lit(3.0d) * col("mu") * col("r2") +
            lit(2.0d) * col("mu") * col("mu") * col("mu")).as("m3"),
          (col("r4") - lit(4.0d) * col("mu") * col("r3") +
            lit(6.0d) * col("mu") * col("mu") * col("r2") -
            lit(3.0d) * col("mu") * col("mu") * col("mu") * col("mu"))
            .as("m4"))
        c.select(col("n").as("n_days"),
          floor(col("m3") / (col("m2") * sqrt(col("m2"))) * 1000000.0d)
            .cast("long").as("skew_micro"),
          floor(col("m4") / (col("m2") * col("m2")) * 1000000.0d)
            .cast("long").as("kurt_micro"),
          floor(col("n").cast("double") / 6.0d *
            ((col("m3") / (col("m2") * sqrt(col("m2")))) *
              (col("m3") / (col("m2") * sqrt(col("m2")))) +
              (col("m4") / (col("m2") * col("m2")) - 3.0d) *
                (col("m4") / (col("m2") * col("m2")) - 3.0d) / 4.0d) *
            1000000.0d).cast("long").as("jb_micro"))
      }),

    // Filtered vector search: exact label-filtered top-5 (the truth)
    // vs "take unfiltered top-20, then filter" (the shortcut every
    // naive vector deployment tries). Recall of the shortcut and how
    // many of its slots went unfilled — measured per 10 query vectors,
    // aggregated. Selective filters starve post-filtering; this query
    // is the number that justifies filter-aware indexes at 1e9
    // vectors.
    Q("sim_filtered_topk",
      Some("WITH e AS (SELECT vec_id, label, " +
        "embedding::DOUBLE[] AS v FROM embeddings), " +
        s"n AS MATERIALIZED (SELECT vec_id, label, v, " +
        s"(${graft.functions.VectorSim.norm2Sql("v")}) AS nrm FROM e), " +
        "q AS MATERIALIZED (SELECT vec_id AS qid, label AS ql, v AS qv, nrm AS qn " +
        "FROM n WHERE vec_id < 10), " +
        // sims deliberately NOT materialized: the full |q|x|n| sim table
        // buffered at once is what OOM'd the r11 oracle process; inlined,
        // each consumer streams it (the dot product is recomputed per
        // consumer — CPU for peak memory, the right trade in the harness)
        "sims AS (SELECT q.qid, q.ql, c.vec_id AS vid, " +
        "c.label AS cl, " +
        s"(${graft.functions.VectorSim.dotSql("q.qv", "c.v")}) " +
        "/ (sqrt(q.qn) * sqrt(c.nrm)) AS sim " +
        "FROM q CROSS JOIN n c WHERE c.vec_id <> q.qid), " +
        "truth AS MATERIALIZED (SELECT qid, vid FROM (SELECT qid, vid, " +
        "row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vid) " +
        "AS rnk FROM sims WHERE cl = ql) WHERE rnk <= 5), " +
        "pre AS (SELECT qid, vid, cl, ql FROM (SELECT qid, vid, cl, ql, " +
        "row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vid) " +
        "AS rnk FROM sims) WHERE rnk <= 20), " +
        "post AS MATERIALIZED (SELECT qid, vid FROM (SELECT qid, vid, " +
        "row_number() OVER (PARTITION BY qid ORDER BY vid) AS k " +
        "FROM pre WHERE cl = ql) WHERE k <= 5) " +
        "SELECT CAST(count(*) AS BIGINT) AS truth_pairs, " +
        "CAST((SELECT count(*) FROM post) AS BIGINT) AS post_pairs, " +
        "CAST((SELECT count(*) FROM post p JOIN truth t " +
        "ON t.qid = p.qid AND t.vid = p.vid) * 10000 " +
        "// (SELECT count(*) FROM truth) AS BIGINT) " +
        "AS postfilter_recall_bps FROM truth"),
      (s, dir) => {
        import graft.functions.{CustomExpressions => CE}
        val n = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("v"))
        val q = n.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("label").as("ql"),
            col("v").as("qv"))
        val sims = n.select(col("vec_id").as("vid"),
            col("label").as("cl"), col("v").as("cv"))
          .join(broadcast(q), col("vid") =!= col("qid"))
          .withColumn("sim", CE.cosine_sim(col("qv"), col("cv")))
          .select("qid", "ql", "vid", "cl", "sim")
          .localCheckpoint()
        val wq = Window.partitionBy("qid")
          .orderBy(col("sim").desc, col("vid"))
        val truth = sims.filter(col("cl") === col("ql"))
          .withColumn("rnk", row_number().over(wq))
          .filter(col("rnk") <= 5).select("qid", "vid")
          .localCheckpoint()
        val pre = sims.withColumn("rnk", row_number().over(wq))
          .filter(col("rnk") <= 20)
        val post = pre.filter(col("cl") === col("ql"))
          .withColumn("k", row_number().over(
            Window.partitionBy("qid").orderBy("vid")))
          .filter(col("k") <= 5).select("qid", "vid")
          .localCheckpoint()
        val hits = post.as("p")
          .join(truth.as("t"), col("t.qid") === col("p.qid") &&
            col("t.vid") === col("p.vid"))
          .agg(count(lit(1)).cast("long").as("h"))
        val out = truth.agg(count(lit(1)).cast("long")
            .as("truth_pairs"))
          .crossJoin(broadcast(post.agg(count(lit(1)).cast("long")
            .as("post_pairs"))))
          .crossJoin(broadcast(hits))
          .select(col("truth_pairs"), col("post_pairs"),
            expr("h * 10000 div truth_pairs").cast("long")
              .as("postfilter_recall_bps"))
        H.materialized(out, Nil, Seq(sims, truth, post))
      })
  )
}
