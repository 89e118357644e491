package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-9 wave 131: process-mining conformance checking (transition-model
  * audit over event sequences — van der Aalst's conformance dimension,
  * public textbook material) and exposure-based ranking fairness (group
  * exposure share vs relevance share under a position-discount model).
  */
object ConformanceOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // PROCESS CONFORMANCE CHECKING: each user's event sequence is audited
    // against a declared transition model (the allowed process edges —
    // here the funnel view→{view,click}, click→{view,click,purchase},
    // purchase→{view}, signup→{view,click}, error→{view}, plus any→error
    // as the always-allowed failure edge). Output: the transition census
    // with each edge's allowed flag and the model's fitness (allowed
    // share, permille) — the process-mining artifact that localizes WHERE
    // reality deviates from the designed flow, not just how often. Scale
    // shape: one per-user lag window (hash-partitioned on user, the
    // sessionize discipline) feeding one map-side-combined (from, to)
    // reduce; the model attaches broadcast on the bounded edge domain.
    Q("events_conformance_check",
      Some(
        """WITH seq AS (
          |  SELECT user_id, event_type AS t,
          |    lag(event_type) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS f
          |  FROM events),
          |census AS (
          |  SELECT f, t, CAST(count(*) AS BIGINT) AS n
          |  FROM seq WHERE f IS NOT NULL GROUP BY 1, 2),
          |model AS (
          |  SELECT * FROM (VALUES
          |    ('view', 'view'), ('view', 'click'),
          |    ('click', 'view'), ('click', 'click'), ('click', 'purchase'),
          |    ('purchase', 'view'),
          |    ('signup', 'view'), ('signup', 'click'),
          |    ('error', 'view')) AS m(f, t)),
          |lab AS (
          |  SELECT c.f, c.t, c.n,
          |    CASE WHEN c.t = 'error' OR m.f IS NOT NULL
          |      THEN 1 ELSE 0 END AS allowed
          |  FROM census c LEFT JOIN model m ON m.f = c.f AND m.t = c.t),
          |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
          |    CAST(sum(allowed * n) AS BIGINT) AS an FROM lab)
          |SELECT lab.f AS from_type, lab.t AS to_type, lab.n,
          |  CAST(lab.allowed AS BIGINT) AS allowed,
          |  CAST(an * 1000 // tn AS BIGINT) AS model_fitness_permille
          |FROM lab, tot ORDER BY from_type, to_type
          |""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val seq0 = H.events(s, dir)
          .select(col("user_id"), col("event_type").as("t"),
            lag("event_type", 1).over(Window.partitionBy("user_id")
              .orderBy(col("ts"), col("event_id"))).as("f"))
        val census = seq0.filter(col("f").isNotNull)
          .groupBy("f", "t").agg(count(lit(1)).cast("long").as("n"))
        val model = Seq(
            ("view", "view"), ("view", "click"),
            ("click", "view"), ("click", "click"), ("click", "purchase"),
            ("purchase", "view"),
            ("signup", "view"), ("signup", "click"),
            ("error", "view"))
          .toDF("mf", "mt").withColumn("hit", lit(1))
        val lab = census.join(broadcast(model),
            col("f") === col("mf") && col("t") === col("mt"), "left")
          .select(col("f"), col("t"), col("n"),
            when(col("t") === "error" || col("hit").isNotNull, 1L)
              .otherwise(0L).as("allowed"))
        val tot = lab.agg(sum("n").cast("long").as("tn"),
          sum(col("allowed") * col("n")).cast("long").as("an"))
        lab.crossJoin(broadcast(tot))
          .select(col("f").as("from_type"), col("t").as("to_type"),
            col("n"), col("allowed"),
            expr("CAST(an * 1000 div tn AS BIGINT)")
              .as("model_fitness_permille"))
          .orderBy("from_type", "to_type")
      }),

    // EXPOSURE-BASED RANKING FAIRNESS: under a position-discount model
    // (DCG-style milli-weights for ranks 1-10, stated as a literal table
    // — no float log in the compare path), does each document source's
    // share of EXPOSURE track its share of RELEVANCE? The audit ranks
    // docs per language by an exact relevance proxy (n_chars), computes
    // group exposure vs relevance shares in ppm, and reports the
    // disparity ratio — the disparate-exposure metric of Singh & Joachims
    // (KDD'18, public). Scale shape: the per-language top-10 runs as a
    // SALTED two-phase grouped top-k — rank within (lang, salt), keep k,
    // then re-rank the ≤ |langs|·S·k survivors within lang — so no
    // window partition ever sorts a corpus-sized slice (5 langs over
    // 100 TB would otherwise mean 5 tasks sorting 20 TB each; the
    // ORACLE states the textbook single window). Group reduces on the
    // bounded (source) domain.
    Q("rank_exposure_fairness",
      Some(
        """WITH w AS (
          |  SELECT * FROM (VALUES (1, 1000), (2, 631), (3, 500), (4, 431),
          |    (5, 387), (6, 356), (7, 333), (8, 315), (9, 301), (10, 289))
          |    AS w(rnk, wt)),
          |r AS (
          |  SELECT lang, source, n_chars,
          |    row_number() OVER (PARTITION BY lang
          |      ORDER BY n_chars DESC, doc_id) AS rnk
          |  FROM documents),
          |top AS (
          |  SELECT r.lang, r.source, r.n_chars, w.wt
          |  FROM r JOIN w ON w.rnk = r.rnk),
          |g AS (
          |  SELECT source, CAST(count(*) AS BIGINT) AS n_ranked,
          |    CAST(sum(wt) AS BIGINT) AS exposure,
          |    CAST(sum(n_chars) AS BIGINT) AS relevance
          |  FROM top GROUP BY 1),
          |tot AS (SELECT CAST(sum(exposure) AS BIGINT) AS te,
          |    CAST(sum(relevance) AS BIGINT) AS tr FROM g)
          |SELECT source, n_ranked,
          |  CAST(exposure * 1000000 // te AS BIGINT) AS exposure_ppm,
          |  CAST(relevance * 1000000 // tr AS BIGINT) AS relevance_ppm,
          |  CAST((exposure * 1000000 // te) * 1000 //
          |    (relevance * 1000000 // tr) AS BIGINT) AS disparity_milli
          |FROM g, tot ORDER BY source
          |""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val w = Seq(1 -> 1000L, 2 -> 631L, 3 -> 500L, 4 -> 431L,
            5 -> 387L, 6 -> 356L, 7 -> 333L, 8 -> 315L, 9 -> 301L,
            10 -> 289L)
          .toDF("rnk", "wt")
        // phase 1: per-(lang, salt) local top-10 — every sort is over a
        // 1/32 slice; phase 2 re-ranks the ≤ |langs|·32·10 survivors
        val d0 = tbl(s, dir, "documents")
          .select(col("lang"), col("source"), col("n_chars"), col("doc_id"))
        val local = d0
          .withColumn("salt", pmod(col("doc_id"), lit(32)))
          .withColumn("lrk", row_number().over(
            Window.partitionBy("lang", "salt")
              .orderBy(col("n_chars").desc, col("doc_id"))))
          .filter(col("lrk") <= 10)
        val r = local
          .withColumn("rnk", row_number().over(Window.partitionBy("lang")
            .orderBy(col("n_chars").desc, col("doc_id"))))
          .filter(col("rnk") <= 10)
          .drop("salt", "lrk")
        val top = r.join(broadcast(w), Seq("rnk"))
        val g = top.groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_ranked"),
            sum("wt").cast("long").as("exposure"),
            sum("n_chars").cast("long").as("relevance"))
        val tot = g.agg(sum("exposure").cast("long").as("te"),
          sum("relevance").cast("long").as("tr"))
        g.crossJoin(broadcast(tot))
          .select(col("source"), col("n_ranked"),
            expr("CAST(exposure * 1000000 div te AS BIGINT)")
              .as("exposure_ppm"),
            expr("CAST(relevance * 1000000 div tr AS BIGINT)")
              .as("relevance_ppm"),
            expr("CAST((exposure * 1000000 div te) * 1000 div " +
              "(relevance * 1000000 div tr) AS BIGINT)")
              .as("disparity_milli"))
          .orderBy("source")
      })
  )
}
