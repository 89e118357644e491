package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Fifty-second wave: model-evaluation metrics — Matryoshka embedding
  * truncation recall, the unbiased pass@k estimator, and clipped n-gram
  * (BLEU-style) precision between planted document pairs. pass@k's
  * falling-factorial ratio and BLEU's clipped counts are exact integers;
  * the truncated-dim cosine reuses the bit-reproducible left-associated
  * dot chains of the similarity family.
  */
object EvalMetricsOpsQueries extends QueryModule {

  private def dotSqlN(a: String, b: String, dims: Int): String =
    (1 to dims).map(i => s"$a[$i] * $b[$i]").mkString(" + ")

  private def dotN(a: String, b: String, dims: Int) =
    (1 to dims).map(i => element_at(col(a), i) * element_at(col(b), i))
      .reduce(_ + _)

  def all: Seq[Q] = Seq(

    // Matryoshka truncation recall: how much of the full-64-dim top-5
    // neighborhood survives when cosine runs on the first 16 / 32 dims
    // only (the Matryoshka representation-learning serving question:
    // scan cheap prefixes, rerank full). All three dot products compute
    // in ONE pass over the candidate join (shared prefix chains); ranks
    // and the overlap count are exact.
    Q("emb_matryoshka_recall",
      Some {
        def variant(d: Int) =
          s"""SELECT qid, vid, $d AS dims, CAST(row_number() OVER
             |  (PARTITION BY qid ORDER BY
             |    (${dotSqlN("qv", "cv", d)}) /
             |      (sqrt(${dotSqlN("qv", "qv", d)}) *
             |       sqrt(${dotSqlN("cv", "cv", d)})) DESC, vid)
             |  AS BIGINT) AS rnk FROM p""".stripMargin
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
           |  FROM embeddings),
           |p AS (SELECT q.vec_id AS qid, c.vec_id AS vid, q.v AS qv,
           |  c.v AS cv FROM e q JOIN e c ON c.vec_id <> q.vec_id
           |  WHERE q.vec_id < 10),
           |full5 AS (SELECT qid, vid FROM (${variant(64)}) f WHERE rnk <= 5),
           |tr AS (SELECT * FROM (${variant(16)}) a WHERE rnk <= 5
           |  UNION ALL SELECT * FROM (${variant(32)}) b WHERE rnk <= 5)
           |SELECT tr.qid, tr.dims,
           |  CAST(sum(CASE WHEN f.vid IS NULL THEN 0 ELSE 1 END) AS BIGINT)
           |    AS hits
           |FROM tr LEFT JOIN full5 f ON f.qid = tr.qid AND f.vid = tr.vid
           |GROUP BY tr.qid, tr.dims ORDER BY tr.qid, tr.dims
           |""".stripMargin
      },
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>")
            .as("v"))
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("v").as("qv"))
        val p = e.select(col("vec_id").as("vid"), col("v").as("cv"))
          .join(broadcast(q), col("vid") =!= col("qid"))
          .select(col("qid"), col("vid"),
            (dotN("qv", "cv", 64) / (sqrt(dotN("qv", "qv", 64)) *
              sqrt(dotN("cv", "cv", 64)))).as("s64"),
            (dotN("qv", "cv", 16) / (sqrt(dotN("qv", "qv", 16)) *
              sqrt(dotN("cv", "cv", 16)))).as("s16"),
            (dotN("qv", "cv", 32) / (sqrt(dotN("qv", "qv", 32)) *
              sqrt(dotN("cv", "cv", 32)))).as("s32"))
          .localCheckpoint() // three rankings over one scored frame
        def top5(sim: String, d: Int) = p
          .withColumn("rnk", row_number().over(
            Window.partitionBy("qid").orderBy(col(sim).desc, col("vid"))))
          .filter(col("rnk") <= 5)
          .select(col("qid"), col("vid"), lit(d.toLong).as("dims"))
        val full5 = top5("s64", 64)
          .select(col("qid").as("fq"), col("vid").as("fv"))
        val out = top5("s16", 16).unionAll(top5("s32", 32))
          .join(broadcast(full5), col("qid") === col("fq") &&
            col("vid") === col("fv"), "left")
          .groupBy("qid", "dims")
          .agg(sum(when(col("fv").isNull, 0L).otherwise(1L)).cast("long")
            .as("hits"))
          .orderBy("qid", "dims")
        H.materialized(out, caches = Nil, checkpoints = Seq(p))
      }),

    // Unbiased pass@k (Chen et al. 2021): 1 − C(n−c,k)/C(n,k) per user,
    // with attempts = events and successes = purchases. The binomial
    // ratio reduces to a k-term falling-factorial ratio — exact BIGINTs
    // for bounded k, and a success count within k of n zeroes the
    // numerator, so the pass = 1 boundary is automatic. One per-user
    // reduce, a 3-way k explode, and a k-sized rollup.
    Q("eval_pass_at_k",
      Some {
        def ff(base: String, k: Int) =
          (0 until k).map(j => s"greatest($base - $j, 0)").mkString(" * ")
        def passK(k: Int) =
          s"1000000 - ${ff("(n - c)", k)} * 1000000 // (${ff("n", k)})"
        s"""WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |    AS BIGINT) AS c FROM events GROUP BY user_id),
           |f AS (SELECT user_id, n, c FROM u WHERE n >= 5),
           |p AS (SELECT user_id, 1 AS k, ${passK(1)} AS pass_micro FROM f
           |  UNION ALL SELECT user_id, 3, ${passK(3)} FROM f
           |  UNION ALL SELECT user_id, 5, ${passK(5)} FROM f)
           |SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS users,
           |  CAST(sum(pass_micro) // count(*) AS BIGINT) AS avg_pass_micro,
           |  CAST(sum(CASE WHEN pass_micro = 1000000 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS certain_users
           |FROM p GROUP BY k ORDER BY k
           |""".stripMargin
      },
      (s, dir) => {
        def ff(base: String, k: Int) =
          (0 until k).map(j => s"greatest($base - $j, 0L)").mkString(" * ")
        def passK(k: Int) =
          s"1000000L - ${ff("(n - c)", k)} * 1000000L div (${ff("n", k)})"
        val f = H.events(s, dir)
          .groupBy("user_id")
          .agg(count(lit(1)).cast("long").as("n"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .cast("long").as("c"))
          .filter(col("n") >= 5)
        f.withColumn("x", explode(array(Seq(1, 3, 5).map(k =>
            struct(lit(k.toLong).as("k"),
              expr(passK(k)).as("pass_micro"))): _*)))
          .select(col("x.k"), col("x.pass_micro"))
          .groupBy("k")
          .agg(count(lit(1)).cast("long").as("users"),
            expr("CAST(sum(pass_micro) div count(*) AS BIGINT)")
              .as("avg_pass_micro"),
            sum(when(col("pass_micro") === 1000000L, 1L).otherwise(0L))
              .cast("long").as("certain_users"))
          .orderBy("k")
      }),

    // Clipped n-gram precision (the BLEU-1/BLEU-2 core, no brevity
    // exponential) between each focus doc and its id-adjacent partner in
    // the same source — candidate pairs, reference counts, and clipping
    // all on the exploded token domain; counts never leave integers.
    Q("text_bleu_pairs",
      Some(
        """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS toks
          |  FROM documents),
          |rk AS (SELECT doc_id, source, row_number() OVER
          |  (PARTITION BY source ORDER BY doc_id) AS rn FROM d),
          |pr AS (SELECT a.doc_id AS cand, b.doc_id AS ref
          |  FROM rk a JOIN rk b ON a.source = b.source AND b.rn = a.rn + 1
          |  WHERE a.rn <= 5),
          |u1 AS (SELECT doc_id, t.tok, CAST(count(*) AS BIGINT) AS n
          |  FROM d, unnest(toks) t(tok) GROUP BY doc_id, t.tok),
          |b1 AS (SELECT doc_id, toks[i+1] || ' ' || toks[i+2] AS tok,
          |  CAST(count(*) AS BIGINT) AS n
          |  FROM d, unnest(range(0, len(toks) - 1)) t(i)
          |  GROUP BY doc_id, toks[i+1] || ' ' || toks[i+2]),
          |p1 AS (SELECT pr.cand, pr.ref,
          |  CAST(sum(least(c.n, coalesce(r.n, 0))) AS BIGINT) AS clip,
          |  CAST(sum(c.n) AS BIGINT) AS total
          |  FROM pr JOIN u1 c ON c.doc_id = pr.cand
          |  LEFT JOIN u1 r ON r.doc_id = pr.ref AND r.tok = c.tok
          |  GROUP BY pr.cand, pr.ref),
          |p2 AS (SELECT pr.cand, pr.ref,
          |  CAST(sum(least(c.n, coalesce(r.n, 0))) AS BIGINT) AS clip,
          |  CAST(sum(c.n) AS BIGINT) AS total
          |  FROM pr JOIN b1 c ON c.doc_id = pr.cand
          |  LEFT JOIN b1 r ON r.doc_id = pr.ref AND r.tok = c.tok
          |  GROUP BY pr.cand, pr.ref)
          |SELECT p1.cand, p1.ref,
          |  p1.clip * 1000000 // p1.total AS bleu1_micro,
          |  p2.clip * 1000000 // p2.total AS bleu2_micro
          |FROM p1 JOIN p2 ON p2.cand = p1.cand AND p2.ref = p1.ref
          |ORDER BY p1.cand
          |""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            split(col("text"), " ", -1).as("toks"))
          .localCheckpoint() // pair spine + two n-gram explosions
        val rk = d.select(col("doc_id"), col("source"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("source").orderBy("doc_id")))
        val pr = rk.filter(col("rn") <= 5)
          .select(col("doc_id").as("cand"), col("source"),
            (col("rn") + 1).as("want"))
          .join(rk.select(col("doc_id").as("ref"),
            col("source").as("s2"), col("rn").as("rn2")),
            col("source") === col("s2") && col("want") === col("rn2"))
          .select("cand", "ref")
        val u1 = d.select(col("doc_id"), explode(col("toks")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).cast("long").as("n"))
        val b1 = d.select(col("doc_id"), explode(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => concat(a, lit(" "), b))).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).cast("long").as("n"))
        def clipped(grams: org.apache.spark.sql.DataFrame) = pr
          .join(grams.select(col("doc_id").as("cand"), col("tok"),
            col("n").as("cn")), Seq("cand"))
          .join(grams.select(col("doc_id").as("ref"), col("tok"),
            col("n").as("rn")), Seq("ref", "tok"), "left")
          .groupBy("cand", "ref")
          .agg(sum(least(col("cn"), coalesce(col("rn"), lit(0L))))
            .cast("long").as("clip"),
            sum("cn").cast("long").as("total"))
        val out = clipped(u1)
          .select(col("cand"), col("ref"),
            expr("clip * 1000000 div total").as("bleu1_micro"))
          .join(clipped(b1)
            .select(col("cand").as("c2"), col("ref").as("r2"),
              expr("clip * 1000000 div total").as("bleu2_micro")),
            col("cand") === col("c2") && col("ref") === col("r2"))
          .select("cand", "ref", "bleu1_micro", "bleu2_micro")
          .orderBy("cand")
        H.materialized(out, caches = Nil, checkpoints = Seq(d))
      }))
}
