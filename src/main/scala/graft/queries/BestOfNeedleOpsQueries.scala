package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-11 waves 177-179: best-of-n inference-scaling curve, gzip JSONL
  * ingest round-trip, and needle-in-a-haystack long-context eval-set
  * construction — three ops an LLM serving/eval shop runs weekly.
  */
object BestOfNeedleOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // BEST-OF-N SCALING CURVE: each user is a prompt, each event's value
    // a sampled response reward. E[max of n iid draws] from the per-
    // prompt empirical distribution is exact order-statistics arithmetic:
    // with the k rewards sorted ascending, E[max_n] = Σ_i r_(i) ·
    // ((i/k)^n − ((i−1)/k)^n). Reported per n ∈ {1,2,4,8,16}, averaged
    // over prompts — the curve that tells a serving shop whether n more
    // samples buy reward. One per-prompt rank pass (per-key window,
    // partition = prompt), then a bounded 5-face reduce.
    Q("pref_best_of_n",
      Some {
        def face(n: Int) =
          s"""SELECT CAST($n AS BIGINT) AS n,
             |  CAST(count(*) AS BIGINT) AS n_prompts,
             |  CAST(floor(avg(emax) * 1000 + 0.5) AS BIGINT)
             |    AS e_best_milli
             |FROM (SELECT user_id,
             |    sum(v * (pow(CAST(i AS DOUBLE) / k, $n)
             |      - pow(CAST(i - 1 AS DOUBLE) / k, $n))) AS emax
             |  FROM r GROUP BY user_id)""".stripMargin
        s"""WITH r AS (SELECT user_id, value AS v,
           |    row_number() OVER (PARTITION BY user_id
           |      ORDER BY value, event_id) AS i,
           |    count(*) OVER (PARTITION BY user_id) AS k
           |  FROM events)
           |${Seq(1, 2, 4, 8, 16).map(face).mkString(" UNION ALL ")}
           |ORDER BY n
           |""".stripMargin
      },
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        val r = H.events(s, dir).select(col("user_id"),
            col("value").as("v"), col("event_id"))
          .withColumn("i", row_number().over(w.orderBy("v", "event_id")))
          .withColumn("k", count(lit(1)).over(w))
          .localCheckpoint() // ranked rewards feed all five faces
        val faces = Seq(1, 2, 4, 8, 16).map { n =>
          r.groupBy("user_id")
            .agg(sum(col("v") * (pow(col("i").cast("double") / col("k"), n)
              - pow((col("i") - 1).cast("double") / col("k"), n))).as("emax"))
            .agg(count(lit(1)).cast("long").as("n_prompts"),
              floor(avg("emax") * 1000 + 0.5).cast("long").as("e_best_milli"))
            .select(lit(n.toLong).as("n"), col("n_prompts"),
              col("e_best_milli"))
        }
        val out = faces.reduce(_ unionByName _).orderBy("n")
        H.materialized(out, caches = Nil, checkpoints = Seq(r))
      }),

    // GZIP JSONL ROUND-TRIP: the dominant raw-corpus wire format at
    // 100 TB is .jsonl.gz — write the documents table as gzip-compressed
    // JSON lines, read it back through the codec with an explicit schema
    // (no inference pass), and aggregate per lang. The oracle aggregates
    // the ORIGINAL parquet: the codec round-trip must be lossless.
    Q("source_jsonl_gzip",
      Some(
        """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(n_chars) AS BIGINT) AS chars,
          |  CAST(sum(length(text)) AS BIGINT) AS text_chars
          |FROM documents GROUP BY lang ORDER BY lang
          |""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.types._
        val out = H.tmpDir("graft_jsonl_gz") + "/docs"
        tbl(s, dir, "documents")
          .select("doc_id", "text", "lang", "n_chars")
          .write.mode("overwrite").option("compression", "gzip").json(out)
        s.read
          .schema(StructType(Seq(
            StructField("doc_id", LongType), StructField("text", StringType),
            StructField("lang", StringType), StructField("n_chars", LongType))))
          .json(out)
          .groupBy("lang")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("n_chars").cast("long").as("chars"),
            sum(length(col("text"))).cast("long").as("text_chars"))
          .orderBy("lang")
      }),

    // NEEDLE-IN-A-HAYSTACK SET CONSTRUCTION: for each doc ≥ 200 chars
    // and each depth ∈ {0,25,50,75,100}%, plant a unique needle sentence
    // at the exact char offset and then RECOVER it by search — the
    // construction-plus-audit pass behind long-context eval sets. The
    // audit is the point: n_recovered counts rows where strpos finds the
    // needle exactly at the planted offset. Per-row string ops, zero
    // shuffle before the 5-key reduce.
    Q("text_needle_insert",
      Some(
        """WITH d AS (SELECT doc_id, text, n_chars FROM documents
          |  WHERE n_chars >= 200),
          |faces AS (SELECT unnest([0, 25, 50, 75, 100]) AS depth),
          |planted AS (SELECT doc_id, depth,
          |    n_chars * depth // 100 AS p,
          |    substr(text, 1, n_chars * depth // 100)
          |      || ' NEEDLE' || CAST(doc_id AS VARCHAR) || ' '
          |      || substr(text, n_chars * depth // 100 + 1) AS ctx
          |  FROM d, faces),
          |audit AS (SELECT depth, p, length(ctx) AS clen,
          |    CASE WHEN strpos(ctx,
          |      ' NEEDLE' || CAST(doc_id AS VARCHAR) || ' ') = p + 1
          |      THEN 1 ELSE 0 END AS ok
          |  FROM planted)
          |SELECT CAST(depth AS BIGINT) AS depth,
          |  CAST(count(*) AS BIGINT) AS n_samples,
          |  CAST(sum(ok) AS BIGINT) AS n_recovered,
          |  CAST(sum(clen) AS BIGINT) AS total_chars,
          |  CAST(sum(p) * 1000 // greatest(sum(clen), 1) AS BIGINT)
          |    AS avg_pos_milli
          |FROM audit GROUP BY depth ORDER BY depth
          |""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .filter(col("n_chars") >= 200).select("doc_id", "text", "n_chars")
        val faces = explode(array(Seq(0, 25, 50, 75, 100).map(lit): _*))
        val needle = concat(lit(" NEEDLE"), col("doc_id").cast("string"),
          lit(" "))
        val planted = d.withColumn("depth", faces)
          .withColumn("p", expr("n_chars * depth div 100"))
          .withColumn("ctx", concat(
            expr("substr(text, 1, CAST(p AS INT))"), needle,
            expr("substr(text, CAST(p + 1 AS INT))")))
        // instr with a COLUMN needle needs the SQL form (the Scala
        // `instr(Column, String)` overload only takes a literal)
        val audit = planted.select(col("depth"), col("p"),
          length(col("ctx")).cast("long").as("clen"),
          when(expr("instr(ctx, concat(' NEEDLE', CAST(doc_id AS STRING), ' '))")
            === col("p") + 1, 1L).otherwise(0L).as("ok"))
        audit.groupBy(col("depth").cast("long").as("depth"))
          .agg(count(lit(1)).cast("long").as("n_samples"),
            sum("ok").cast("long").as("n_recovered"),
            sum("clen").cast("long").as("total_chars"),
            expr("CAST(sum(p) * 1000 div greatest(sum(clen), 1) AS BIGINT)")
              .as("avg_pos_milli"))
          .orderBy("depth")
      })
  )
}
