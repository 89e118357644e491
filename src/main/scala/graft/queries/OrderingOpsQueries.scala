package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Q, QueryModule}
import graft.H.tbl

/** Eighth wave: corpus ordering and lifecycle operators — curriculum
  * ordering (stratified round-robin interleave without a global sort key),
  * readability scoring (Flesch-style difficulty proxy), CUSUM changepoint
  * detection over the event stream (data-drift monitoring), and
  * manifest-based snapshot time-travel reads (the lakehouse "as of
  * version V" query).
  */
object OrderingOpsQueries extends QueryModule {

  private def d9(c: Column): Column = c.cast(DecimalType(18, 9))

  def all: Seq[Q] = Seq(

    // CURRICULUM ORDERING: rank docs by a difficulty proxy (mean word
    // length) WITHIN each source, then interleave sources round-robin —
    // the standard "mix sources evenly while going easy→hard" training
    // order. The interesting part is the global position: computed
    // WITHOUT a global row_number (which would be a single-partition
    // window — the classic driver bottleneck at 100 TB). Instead
    // pos = Σ_s min(rk-1, n_s)  +  |{s' < source : n_s' ≥ rk}|  + 1,
    // i.e. docs in earlier rounds plus earlier sources in this round —
    // a pure function of (rk, source) and the tiny per-source count
    // list, evaluated per-row against a broadcast array with
    // higher-order functions. The only wide ops are the per-source
    // window rank and the final presentation sort; a production writer
    // would range-partition by pos and skip the sort entirely.
    Q("curriculum_order",
      Some(
        """WITH sc AS (
          |  SELECT doc_id, source,
          |         CAST(n_chars AS DOUBLE) /
          |           CAST(len(string_split(text, ' ')) AS DOUBLE) AS difficulty
          |  FROM documents
          |), rk AS (
          |  SELECT doc_id, source, difficulty,
          |         CAST(row_number() OVER (PARTITION BY source
          |           ORDER BY difficulty, doc_id) AS BIGINT) AS rk
          |  FROM sc
          |), cnt AS (
          |  SELECT list_sort(list(struct_pack(s := source, n := n))) AS lst
          |  FROM (SELECT source, CAST(count(*) AS BIGINT) AS n
          |        FROM documents GROUP BY source)
          |)
          |SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
          |         list_apply(lst, x -> least(rk - 1, x.n))), (a, b) -> a + b)
          |       + CAST(len(list_filter(lst, x -> x.n >= rk AND x.s < source)) AS BIGINT)
          |       + 1 AS pos,
          |       doc_id, source, rk, difficulty
          |FROM rk CROSS JOIN cnt
          |ORDER BY pos""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "documents")
        val ranked = d.select(col("doc_id"), col("source"),
            (col("n_chars").cast("double") /
              size(split(col("text"), " ")).cast("double")).as("difficulty"))
          .withColumn("rk", row_number().over(Window.partitionBy("source")
            .orderBy(col("difficulty"), col("doc_id"))).cast("long"))
        val cnt = d.groupBy("source").agg(count(lit(1)).as("n"))
          .agg(expr("array_sort(collect_list(struct(source AS s, n)))").as("lst"))
        ranked.crossJoin(broadcast(cnt))
          .select(
            (expr("aggregate(transform(lst, x -> least(rk - 1, x.n)), " +
              "CAST(0 AS BIGINT), (a, b) -> a + b)") +
              expr("CAST(size(filter(lst, x -> x.n >= rk AND x.s < source)) AS BIGINT)") +
              lit(1L)).as("pos"),
            col("doc_id"), col("source"), col("rk"), col("difficulty"))
          .orderBy("pos")
      }),

    // READABILITY SCORE: Flesch reading-ease with a vowel-group syllable
    // heuristic (syllables ≈ runs of [aeiouy]) and a fixed 15-words-per-
    // sentence proxy — the corpus texts carry no sentence punctuation, so
    // the sentence count is ⌈words/15⌉ (documented heuristic, same on
    // both engines). Every term is a per-row scalar on exact integer
    // counts; the two divisions and the polynomial are evaluated in the
    // same left-associated order on both engines, so the double is
    // bit-identical. One scan, zero shuffles before the presentation
    // sort — a readability pass over 100 TB is map-only.
    Q("text_readability",
      Some(
        """WITH m AS (
          |  SELECT doc_id,
          |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
          |         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syll
          |  FROM documents
          |), e AS (
          |  SELECT doc_id, n_words, n_syll,
          |         greatest(CAST(1 AS BIGINT),
          |           CAST(ceil(CAST(n_words AS DOUBLE) / 15.0) AS BIGINT)) AS n_sents
          |  FROM m
          |), f AS (
          |  SELECT doc_id, n_words, n_sents, n_syll,
          |         206.835
          |           - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))
          |           - 84.6 * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE)) AS flesch
          |  FROM e
          |)
          |SELECT doc_id, n_words, n_sents, n_syll, flesch,
          |       CASE WHEN flesch >= 60 THEN 'easy'
          |            WHEN flesch >= 30 THEN 'medium' ELSE 'hard' END AS band
          |FROM f ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val m = tbl(s, dir, "documents").select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
            .cast("long").as("n_syll"))
        val e = m.withColumn("n_sents",
          greatest(lit(1L), ceil(col("n_words").cast("double") / lit(15.0)).cast("long")))
        e.select(col("doc_id"), col("n_words"), col("n_sents"), col("n_syll"),
            (lit(206.835)
              - lit(1.015) * (col("n_words").cast("double") / col("n_sents").cast("double"))
              - lit(84.6) * (col("n_syll").cast("double") / col("n_words").cast("double")))
              .as("flesch"))
          .withColumn("band", when(col("flesch") >= 60, "easy")
            .when(col("flesch") >= 30, "medium").otherwise("hard"))
          .orderBy("doc_id")
      }),

    // CUSUM CHANGEPOINT: per event_type, the day where the cumulative
    // deviation of the daily mean from the grand mean peaks — the
    // classic drift/changepoint monitor a pipeline runs over its intake
    // stream. Bit-exactness: daily and grand sums go through
    // DECIMAL(18,9) (order-free), each mean is ONE exact-decimal→double
    // cast and ONE division (correctly rounded, engine-identical), the
    // per-day deviation is cast back to DECIMAL so the running windowed
    // sum is exact regardless of frame evaluation strategy, and only the
    // final CUSUM value is emitted as a double. Scale: one partial-agg
    // groupBy to days (reduces 100 TB to |types|×|days| rows), then all
    // windowing happens on the tiny daily frame.
    Q("ts_changepoint",
      Some(
        """WITH daily AS (
          |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
          |         sum(CAST(value AS DECIMAL(18,9))) AS s,
          |         CAST(count(*) AS BIGINT) AS c
          |  FROM events GROUP BY 1, 2
          |), g AS (
          |  SELECT event_type,
          |         CAST(sum(s) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS gmean
          |  FROM daily GROUP BY 1
          |), dev AS (
          |  SELECT d.event_type, d.day,
          |         CAST(CAST(d.s AS DOUBLE) / CAST(d.c AS DOUBLE) - g.gmean
          |              AS DECIMAL(18,9)) AS dv
          |  FROM daily d JOIN g ON g.event_type = d.event_type
          |), cus AS (
          |  SELECT event_type, day,
          |         CAST(sum(dv) OVER (PARTITION BY event_type ORDER BY day
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cusum,
          |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days
          |  FROM dev
          |), pick AS (
          |  SELECT *, row_number() OVER (PARTITION BY event_type
          |    ORDER BY abs(cusum) DESC, day) AS r
          |  FROM cus
          |)
          |SELECT event_type, day AS cp_day, cusum, n_days
          |FROM pick WHERE r = 1 ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val daily = graft.H.events(s, dir)
          .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(sum(d9(col("value"))).as("s"), count(lit(1)).as("c"))
        val g = daily.groupBy("event_type")
          .agg((sum(col("s")).cast("double") / sum(col("c")).cast("double")).as("gmean"))
        val dev = daily.join(g, "event_type")
          .select(col("event_type"), col("day"),
            d9(col("s").cast("double") / col("c").cast("double") - col("gmean")).as("dv"))
        val wOrd = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cus = dev.select(col("event_type"), col("day"),
          sum(col("dv")).over(wOrd).cast("double").as("cusum"),
          count(lit(1)).over(Window.partitionBy("event_type")).as("n_days"))
        cus.withColumn("r", row_number().over(Window.partitionBy("event_type")
            .orderBy(abs(col("cusum")).desc, col("day"))))
          .filter(col("r") === 1)
          .select(col("event_type"), col("day").as("cp_day"), col("cusum"), col("n_days"))
          .orderBy("event_type")
      }),

    // SNAPSHOT TIME-TRAVEL: read a versioned shard manifest "as of" three
    // versions at once — the lakehouse time-travel query. Each order
    // stands in for a data file with a deterministic (added_v,
    // removed_v] lifetime derived from its keys; a snapshot at V is the
    // interval predicate added_v ≤ V < removed_v (open-ended when never
    // removed). The version list is a 3-row broadcast; the manifest side
    // is scanned ONCE and the non-equi join fans each file into the
    // snapshots it is live in. At 100 TB the manifest carries zone maps
    // on added_v/removed_v, so a single-version read partition-prunes to
    // the touched version range — the same reason real table formats
    // sort manifests by snapshot id.
    Q("pipeline_time_travel",
      Some(
        """WITH manifest AS (
          |  SELECT o_orderkey, o_totalprice,
          |         CAST(o_orderkey % 50 AS BIGINT) AS added_v,
          |         CASE WHEN o_orderkey % 50 + 1 + o_custkey % 60 < 50
          |              THEN CAST(o_orderkey % 50 + 1 + o_custkey % 60 AS BIGINT)
          |         END AS removed_v
          |  FROM orders
          |), v AS (SELECT CAST(unnest([10, 25, 40]) AS BIGINT) AS version)
          |SELECT version,
          |       CAST(count(*) AS BIGINT) AS n_live,
          |       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS live_value
          |FROM manifest JOIN v
          |  ON added_v <= version AND (removed_v IS NULL OR removed_v > version)
          |GROUP BY version ORDER BY version""".stripMargin),
      (s, dir) => {
        val manifest = tbl(s, dir, "orders").select(
          col("o_orderkey"), col("o_totalprice"),
          (col("o_orderkey") % 50).cast("long").as("added_v"),
          when(col("o_orderkey") % 50 + 1 + col("o_custkey") % 60 < 50,
            (col("o_orderkey") % 50 + 1 + col("o_custkey") % 60).cast("long"))
            .as("removed_v"))
        val versions = s.range(1)
          .select(explode(array(lit(10L), lit(25L), lit(40L))).as("version"))
        manifest.join(broadcast(versions),
            col("added_v") <= col("version") &&
              (col("removed_v").isNull || col("removed_v") > col("version")))
          .groupBy("version")
          .agg(count(lit(1)).as("n_live"), graft.H.sumMoney(col("o_totalprice")).as("live_value"))
          .orderBy("version")
      }))
}
