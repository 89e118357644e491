package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Ninety-fifth wave: retrieval feedback, experiment planning, basket
  * diversity, and a CSV torture roundtrip — pseudo-relevance-feedback
  * query expansion (retrieve → mine expansion terms → re-retrieve, all
  * integer-scored), the A/B minimum-detectable-effect planning curve,
  * brand-entropy of each segment's purchase mix, and a CSV writer/
  * parser quirks roundtrip (embedded delimiters, quotes, newlines)
  * pinned by content hashes against the parquet source.
  *
  * Exactness: retrieval scores are Σ tf·idf_micro with idf quantized
  * once per term — pure integers end-to-end; MDE and entropy values
  * are per-row micro-floored chains; the CSV check hashes the
  * round-tripped payload, so ANY quoting/escaping loss breaks the
  * compare.
  */
object PrfPowerOpsQueries extends QueryModule {

  private val QTerms = Seq("scan", "merge", "vector")

  def all: Seq[Q] = Seq(

    // Pseudo-relevance feedback: score docs on the seed query by
    // Σ tf·idf_micro, take the top 10, mine the 5 highest-scoring
    // non-seed terms from those docs, re-retrieve on the expanded
    // query. Output = final top 10 with integer scores and a flag for
    // docs the expansion surfaced. All stages are keyed aggregations
    // plus distributed TopNs; term lists broadcast; no score is ever a
    // float. The classic recall lever when the seed query undersells
    // the intent — and at 100 TB it is two extra bounded passes, not a
    // re-index.
    Q("sim_prf_expansion",
      Some {
        // tf/idf MATERIALIZED (r7 verdict #1): tf feeds r1/exp/r2/idf and
        // idf feeds three joins — without the hint DuckDB re-tokenizes the
        // corpus per reference; one pinned copy bounds the oracle's peak.
        val qlist = QTerms.map(t => s"('$t')").mkString(", ")
        s"""WITH q(term) AS (VALUES $qlist),
           |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
           |  FROM documents),
           |tf AS MATERIALIZED (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           |  FROM tok WHERE term <> '' GROUP BY 1, 2),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
           |idf AS MATERIALIZED (SELECT term, CAST(floor(ln(CAST(nn.n AS DOUBLE)
           |    / CAST(count(*) AS DOUBLE)) * 1000000.0) AS BIGINT)
           |    AS idf_micro
           |  FROM tf, nn GROUP BY term, nn.n),
           |r1 AS (SELECT tf.doc_id,
           |    CAST(sum(tf.tf * idf.idf_micro) AS BIGINT) AS score
           |  FROM tf JOIN q ON q.term = tf.term
           |  JOIN idf ON idf.term = tf.term
           |  GROUP BY 1 ORDER BY score DESC, tf.doc_id LIMIT 10),
           |exp AS (SELECT tf.term,
           |    CAST(sum(tf.tf * idf.idf_micro) AS BIGINT) AS w
           |  FROM tf JOIN r1 ON r1.doc_id = tf.doc_id
           |  JOIN idf ON idf.term = tf.term
           |  WHERE tf.term NOT IN (SELECT term FROM q)
           |  GROUP BY 1 ORDER BY w DESC, tf.term LIMIT 5),
           |q2 AS (SELECT term FROM q UNION ALL SELECT term FROM exp),
           |r2 AS (SELECT tf.doc_id,
           |    CAST(sum(tf.tf * idf.idf_micro) AS BIGINT) AS score
           |  FROM tf JOIN q2 ON q2.term = tf.term
           |  JOIN idf ON idf.term = tf.term
           |  GROUP BY 1 ORDER BY score DESC, tf.doc_id LIMIT 10)
           |SELECT CAST(row_number() OVER (ORDER BY r2.score DESC,
           |    r2.doc_id) AS BIGINT) AS rnk, r2.doc_id, r2.score,
           |  CASE WHEN r1.doc_id IS NULL THEN 1 ELSE 0 END AS surfaced
           |FROM r2 LEFT JOIN r1 ON r1.doc_id = r2.doc_id
           |ORDER BY 1
           |""".stripMargin
      },
      (s, dir) => {
        import s.implicits._
        val tf = tbl(s, dir, "documents")
          .select(col("doc_id"),
            explode(split(col("text"), " ", -1)).as("term"))
          .filter(col("term") =!= "")
          .groupBy("doc_id", "term")
          .agg(count(lit(1)).cast("long").as("tf"))
          .localCheckpoint() // three retrieval passes share it
        val nn = tbl(s, dir, "documents")
          .agg(count(lit(1)).cast("long").as("n"))
        val idf = tf.groupBy("term")
          .agg(count(lit(1)).cast("long").as("df"))
          .crossJoin(broadcast(nn))
          .select(col("term"),
            floor(log(col("n").cast("double") /
              col("df").cast("double")) * 1000000.0d).cast("long")
              .as("idf_micro"))
        val q = QTerms.toDF("term")
        def retrieve(terms: org.apache.spark.sql.DataFrame) = tf
          .join(broadcast(terms), Seq("term"))
          .join(idf, Seq("term"))
          .groupBy("doc_id")
          .agg(sum(col("tf") * col("idf_micro")).cast("long").as("score"))
          .orderBy(col("score").desc, col("doc_id")).limit(10)
        val r1 = retrieve(q).localCheckpoint()
        val exp = tf
          .join(broadcast(r1.select("doc_id")), Seq("doc_id"))
          .join(broadcast(q.withColumnRenamed("term", "qt")),
            col("term") === col("qt"), "left_anti")
          .join(idf, Seq("term"))
          .groupBy("term")
          .agg(sum(col("tf") * col("idf_micro")).cast("long").as("w"))
          .orderBy(col("w").desc, col("term")).limit(5)
        val r2 = retrieve(q.unionByName(exp.select("term")))
        val out = r2
          .join(broadcast(r1.select(col("doc_id").as("d1"))),
            col("doc_id") === col("d1"), "left")
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id")))
            .cast("long"))
          .select(col("rnk"), col("doc_id"), col("score"),
            when(col("d1").isNull, 1).otherwise(0).as("surfaced"))
          .orderBy("rnk")
        H.materialized(out, Nil, Seq(tf, r1))
      }),

    // A/B test planning curve: observed purchase rate → the minimum
    // detectable absolute effect (α=.05 two-sided, power .80) at each
    // candidate per-arm sample size. One scan to p̂, then a 10-row
    // spine; each MDE is a single micro-floored chain. The "how long
    // must this experiment run" table every platform keeps pinned.
    Q("stats_ab_power_mde",
      Some(
        """WITH p AS (SELECT CAST(sum(CASE WHEN event_type = 'purchase'
          |    THEN 1 ELSE 0 END) AS BIGINT) AS x,
          |  CAST(count(*) AS BIGINT) AS n FROM events),
          |sp(arm_n) AS (VALUES (1000), (2000), (5000), (10000), (20000),
          |  (50000), (100000), (200000), (500000), (1000000))
          |SELECT CAST(sp.arm_n AS BIGINT) AS arm_n, p.x AS conversions,
          |  p.n AS observations,
          |  CAST(floor((1.9599639845400545 + 0.8416212335729143)
          |    * sqrt(2.0 * (CAST(p.x AS DOUBLE)/CAST(p.n AS DOUBLE))
          |      * (1.0 - CAST(p.x AS DOUBLE)/CAST(p.n AS DOUBLE))
          |      / CAST(sp.arm_n AS DOUBLE)) * 1000000.0) AS BIGINT)
          |    AS mde_abs_micro
          |FROM sp, p ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val p = H.events(s, dir)
          .agg(sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).cast("long").as("x"),
            count(lit(1)).cast("long").as("n"))
        val sp = Seq(1000, 2000, 5000, 10000, 20000, 50000, 100000,
          200000, 500000, 1000000).toDF("arm_n")
        sp.crossJoin(broadcast(p))
          .select(col("arm_n").cast("long").as("arm_n"),
            col("x").as("conversions"), col("n").as("observations"),
            floor(lit(1.9599639845400545d + 0.8416212335729143d) *
              sqrt(lit(2.0d) *
                (col("x").cast("double") / col("n").cast("double")) *
                (lit(1.0d) - col("x").cast("double") /
                  col("n").cast("double")) /
                col("arm_n").cast("double")) * 1000000.0d).cast("long")
              .as("mde_abs_micro"))
          .orderBy("arm_n")
      }),

    // Brand entropy of each segment's purchase mix: how concentrated
    // is a segment's demand across the 25 brands? Per-(segment, brand)
    // line counts, entropy terms micro-floored per brand BEFORE the
    // per-segment sum, normalized against ln(brand count) in milli.
    // The assortment-diversity lens on the same facts the revenue
    // reports read — one extra keyed aggregation.
    Q("orders_basket_entropy",
      Some(
        """WITH b AS (SELECT c.c_mktsegment AS seg, p.p_brand AS brand,
          |  CAST(count(*) AS BIGINT) AS n
          |  FROM lineitem l
          |  JOIN orders o ON o.o_orderkey = l.l_orderkey
          |  JOIN customer c ON c.c_custkey = o.o_custkey
          |  JOIN part p ON p.p_partkey = l.l_partkey
          |  GROUP BY 1, 2),
          |t AS (SELECT seg, CAST(sum(n) AS BIGINT) AS tot,
          |  CAST(count(*) AS BIGINT) AS k FROM b GROUP BY 1),
          |e AS (SELECT b.seg, t.k,
          |  CAST(sum(CAST(floor(-(CAST(b.n AS DOUBLE)
          |      / CAST(t.tot AS DOUBLE))
          |    * ln(CAST(b.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
          |    * 1000000.0) AS BIGINT)) AS BIGINT) AS ent_micro
          |  FROM b JOIN t ON t.seg = b.seg GROUP BY 1, 2)
          |SELECT seg AS segment, k AS n_brands, ent_micro,
          |  CAST(ent_micro * 1000 // CAST(floor(ln(CAST(k AS DOUBLE))
          |    * 1000000.0) AS BIGINT) AS BIGINT) AS norm_entropy_milli
          |FROM e ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val b = tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "orders")
              .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(tbl(s, dir, "customer")
              .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(tbl(s, dir, "part")
              .select(col("p_partkey"), col("p_brand").as("brand"))),
            col("p_partkey") === col("l_partkey"))
          .groupBy("seg", "brand")
          .agg(count(lit(1)).cast("long").as("n"))
        val t = b.groupBy("seg")
          .agg(sum(col("n")).cast("long").as("tot"),
            count(lit(1)).cast("long").as("k"))
        b.join(broadcast(t), Seq("seg"))
          .select(col("seg"), col("k"),
            floor((lit(0.0d) - col("n").cast("double") /
              col("tot").cast("double")) *
              log(col("n").cast("double") / col("tot").cast("double")) *
              1000000.0d).cast("long").as("term"))
          .groupBy(col("seg").as("segment"), col("k").as("n_brands"))
          .agg(sum(col("term")).cast("long").as("ent_micro"))
          .withColumn("norm_entropy_milli",
            expr("ent_micro * 1000 div CAST(floor(ln(CAST(n_brands" +
              " AS DOUBLE)) * 1000000.0) AS BIGINT)").cast("long"))
          .orderBy("segment")
      }),

    // CSV quirks roundtrip: payloads with embedded delimiters, double
    // quotes, and newlines written through Spark's CSV writer
    // (quoteAll + escaped quotes) and read back with multiLine — the
    // md5 of every payload must survive, pinned against the parquet
    // source (the oracle never touches the CSV). The row count AND
    // per-row hash equality prove the quoting dialect lossless — the
    // debug-sink fidelity check for columns that contain the
    // delimiter itself.
    Q("source_csv_quirks",
      Some(
        """SELECT doc_id,
          |  md5(substr(text, 1, 40) || ',"' || chr(10) || '"x,') AS h,
          |  CAST(length(substr(text, 1, 40) || ',"' || chr(10)
          |    || '"x,') AS BIGINT) AS payload_len
          |FROM documents WHERE doc_id < 200 ORDER BY doc_id
          |""".stripMargin),
      (s, dir) => {
        val payload = concat(substring(col("text"), 1, 40),
          lit(",\""), lit("\n"), lit("\"x,"))
        val src = tbl(s, dir, "documents")
          .filter(col("doc_id") < 200)
          .select(col("doc_id"), payload.as("payload"))
        val out = H.tmpDir("graft_csvq") + "/payload"
        src.coalesce(1).write.mode("overwrite")
          .option("quoteAll", "true").option("escape", "\"")
          .option("header", "true").csv(out)
        val back = s.read
          .option("header", "true").option("multiLine", "true")
          .option("escape", "\"")
          .schema("doc_id LONG, payload STRING")
          .csv(out)
        back.select(col("doc_id"), md5(col("payload")).as("h"),
            length(col("payload")).cast("long").as("payload_len"))
          .orderBy("doc_id")
      })
  )
}
