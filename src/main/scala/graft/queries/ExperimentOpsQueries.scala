package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{TextAnalysis => TA}

/** Twenty-sixth wave: experiment/eval ops — a language-ID confusion
  * matrix, two-proportion A/B analysis, and the character-coverage curve
  * a tokenizer trainer reads before fixing its charset.
  *
  * Determinism: confusion cells and coverage counts are exact integers;
  * the A/B z-score's only libm call is sqrt (correctly rounded);
  * recall/accuracy are single divisions.
  */
object ExperimentOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // LANGUAGE-ID CONFUSION MATRIX: the per-class quality artifact for
    // the corpus's stopword language classifier — one row per
    // (actual, predicted) cell with per-actual recall riding along.
    // Notably 'zh' has no stopword model, so the matrix EXPOSES where
    // those docs land instead of hiding them in an accuracy scalar —
    // which is what a confusion matrix is for. One scored map pass, one
    // grouped reduce on the |langs|² domain.
    Q("text_langid_eval",
      Some {
        val toks = "string_split(text, ' ')"
        val scores = TA.stopwords.map(_._1)
          .map { lang => s"${TA.langScoreSql(toks, "text", lang)} AS s_$lang" }
          .mkString(", ")
        val pred = "CASE WHEN s_en >= greatest(s_es, s_fr, s_de) THEN 'en' " +
          "WHEN s_es >= greatest(s_fr, s_de) THEN 'es' " +
          "WHEN s_fr >= s_de THEN 'fr' ELSE 'de' END"
        s"WITH scored AS (SELECT doc_id, lang, $scores FROM documents), " +
          s"p AS (SELECT lang, $pred AS pred FROM scored), " +
          "cm AS (SELECT lang, pred, CAST(count(*) AS BIGINT) AS n " +
          "FROM p GROUP BY 1, 2), " +
          // row totals via a window over cm, not a groupBy+join back —
          // a second reference to cm would re-run the scoring scan
          "rt AS (SELECT lang, pred, n, CAST(sum(n) OVER " +
          "(PARTITION BY lang) AS BIGINT) AS row_total FROM cm) " +
          "SELECT lang, pred, n, row_total, " +
          "CAST(CASE WHEN lang = pred THEN n ELSE 0 END AS DOUBLE) " +
          "/ CAST(row_total AS DOUBLE) AS recall_contrib " +
          "FROM rt ORDER BY lang, pred"
      },
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .withColumn("toks", TA.tokens(col("text")))
        val scored = TA.stopwords.map(_._1).foldLeft(d) { case (df, lang) =>
          df.withColumn(s"s_$lang", TA.langScore(col("toks"), col("text"), lang))
        }
        val pred = when(
          col("s_en") >= greatest(col("s_es"), col("s_fr"), col("s_de")), "en")
          .when(col("s_es") >= greatest(col("s_fr"), col("s_de")), "es")
          .when(col("s_fr") >= col("s_de"), "fr")
          .otherwise("de")
        val cm = scored.select(col("lang"), pred.as("pred"))
          .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
        cm.withColumn("row_total",
            sum("n").over(Window.partitionBy("lang")).cast("long"))
          .select(col("lang"), col("pred"), col("n"), col("row_total"),
            (when(col("lang") === col("pred"), col("n")).otherwise(0L)
              .cast("double") / col("row_total").cast("double"))
              .as("recall_contrib"))
          .orderBy("lang", "pred")
      }),

    // TWO-PROPORTION A/B ANALYSIS: users split by id parity (the
    // deterministic assignment), metric = heavy buyer (≥14 purchases —
    // every user purchases at least once in this stream, so the raw
    // conversion rate is a degenerate p=1 whose pooled variance is 0);
    // pooled-variance z-score for the rate difference — the readout of
    // every conversion experiment. All counts are exact; the z-score's
    // numerator and variance are built from those counts with sqrt as
    // the only libm call, so the verdict hashes identically. One
    // per-user reduce (map-side combined), then the 2-row group domain.
    Q("events_ab_test",
      Some(
        """WITH u AS (
          |  SELECT user_id, user_id % 2 AS grp,
          |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
          |      ELSE 0 END) >= 14 THEN 1 ELSE 0 END AS converted
          |  FROM events GROUP BY 1, 2),
          |g AS (
          |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(converted) AS BIGINT) AS conv
          |  FROM u GROUP BY 1),
          |w AS (
          |  SELECT
          |    max(CASE WHEN grp = 0 THEN n END) AS n0,
          |    max(CASE WHEN grp = 0 THEN conv END) AS c0,
          |    max(CASE WHEN grp = 1 THEN n END) AS n1,
          |    max(CASE WHEN grp = 1 THEN conv END) AS c1
          |  FROM g)
          |SELECT n0, c0, n1, c1,
          |  CAST(c0 AS DOUBLE) / n0 AS rate0,
          |  CAST(c1 AS DOUBLE) / n1 AS rate1,
          |  (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0) /
          |    sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
          |         (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
          |         (1.0 / n0 + 1.0 / n1)) AS z_score
          |FROM w""".stripMargin),
      (s, dir) => {
        val u = H.events(s, dir)
          .groupBy(col("user_id"), pmod(col("user_id"), lit(2)).as("grp"))
          .agg(when(sum(when(col("event_type") === "purchase", 1)
            .otherwise(0)) >= 14, 1).otherwise(0).as("converted"))
        val g = u.groupBy("grp")
          .agg(count(lit(1)).as("n"), sum("converted").cast("long").as("conv"))
        val w = g.agg(
          max(when(col("grp") === 0, col("n"))).as("n0"),
          max(when(col("grp") === 0, col("conv"))).as("c0"),
          max(when(col("grp") === 1, col("n"))).as("n1"),
          max(when(col("grp") === 1, col("conv"))).as("c1"))
        val p = (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))
        w.select(col("n0"), col("c0"), col("n1"), col("c1"),
          (col("c0").cast("double") / col("n0")).as("rate0"),
          (col("c1").cast("double") / col("n1")).as("rate1"),
          ((col("c1").cast("double") / col("n1") -
            col("c0").cast("double") / col("n0")) /
            sqrt(p * (lit(1.0) - p) *
              (lit(1.0) / col("n0") + lit(1.0) / col("n1")))).as("z_score"))
      }),

    // CHARACTER-COVERAGE CURVE: what fraction of all character instances
    // the top-10/50/100 characters cover — the number SentencePiece's
    // character_coverage flag is set FROM. One char-count reduce, a rank
    // window over the |charset| domain, exact cumulative ratios.
    Q("vocab_char_coverage",
      Some(
        """WITH ch AS (
          |  SELECT unnest(string_split_regex(text, '')) AS c FROM documents),
          |cnt AS (SELECT c, CAST(count(*) AS BIGINT) AS n FROM ch
          |        WHERE c <> '' GROUP BY 1),
          |r AS (SELECT c, n,
          |        CAST(row_number() OVER (ORDER BY n DESC, c) AS BIGINT)
          |          AS rnk,
          |        CAST(sum(n) OVER (ORDER BY n DESC, c) AS BIGINT) AS cum,
          |        CAST(sum(n) OVER () AS BIGINT) AS tot
          |      FROM cnt)
          |SELECT CAST(k AS BIGINT) AS top_k,
          |  max(cum) AS covered,
          |  max(tot) AS total_chars,
          |  CAST(max(cum) AS DOUBLE) / CAST(max(tot) AS DOUBLE) AS coverage
          |FROM r, (SELECT unnest([10, 50, 100]) AS k) ks
          |WHERE rnk <= k GROUP BY k ORDER BY top_k""".stripMargin),
      (s, dir) => {
        val cnt = tbl(s, dir, "documents")
          .select(explode(split(col("text"), "")).as("c"))
          .filter(col("c") =!= "")
          .groupBy("c").agg(count(lit(1)).as("n"))
        val r = cnt
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("n").desc, col("c"))).cast("long"))
          .withColumn("cum", sum("n").over(
            Window.orderBy(col("n").desc, col("c"))).cast("long"))
          .withColumn("tot",
            sum("n").over(Window.partitionBy()).cast("long"))
        val ks = s.createDataFrame(Seq(Tuple1(10L), Tuple1(50L),
          Tuple1(100L))).toDF("k")
        r.crossJoin(broadcast(ks))
          .filter(col("rnk") <= col("k"))
          .groupBy(col("k").as("top_k"))
          .agg(max("cum").as("covered"),
            max("tot").as("total_chars"),
            (max("cum").cast("double") / max("tot").cast("double"))
              .as("coverage"))
          .orderBy("top_k")
      })
  )
}
