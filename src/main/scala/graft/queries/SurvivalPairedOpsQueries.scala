package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-10 wave 148: the three classical inference completions the board
  * lacked next to its existing members —
  *   - log-rank test (two-group survival comparison; the inference step on
  *     top of the existing Kaplan-Meier / Nelson-Aalen estimators),
  *   - McNemar's test (paired nominal outcomes on the SAME units; the
  *     paired sibling of the two-proportion z),
  *   - Tukey HSD (post-hoc pairwise means after one-way ANOVA — which the
  *     board runs but could not follow up on).
  * All statistics derive from exact integer censuses; doubles appear only
  * in identical leaf expression trees (the stats_cuped discipline).
  */
object SurvivalPairedOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // LOG-RANK TEST: time-to-first-purchase difference between the even
    // and odd user cohorts (user_id % 2). Duration = first 'purchase'
    // day; users who never purchase inside the 30-day horizon are
    // right-censored (carried as duration 31: at risk through every day,
    // never an event) — the standard conversion-survival shape on top of
    // the board's Kaplan-Meier estimator. Per-day at-risk counts come
    // from the 30-row spine x duration-census suffix trick (O(days^2) on
    // the bounded calendar domain, never a per-user pass). The O-E and
    // hypergeometric-variance terms are micro-quantized PER DAY before
    // the only cross-row sums (integer adds — engine aggregation order
    // cannot shift a bit); products run wide — Spark DECIMAL(38,0),
    // DuckDB HUGEINT — so a 10^9-user census cannot overflow. (NOT
    // DECIMAL on the DuckDB side: DuckDB silently promotes
    // DECIMAL(38,0) x BIGINT to DOUBLE when the result precision would
    // exceed 38, and the float ulp flips knife-edge floor divisions —
    // measured as ±1-per-day drift in the summed variance term.)
    Q("events_logrank_test",
      Some(
        """WITH lastd AS (SELECT user_id, user_id % 2 AS grp,
          |    coalesce(min(CASE WHEN event_type = 'purchase'
          |      THEN CAST(strftime(ts, '%d') AS BIGINT) END), 31) AS dday
          |  FROM events GROUP BY 1, 2),
          |deaths AS (SELECT dday AS day, grp,
          |    CAST(count(*) AS BIGINT) AS d
          |  FROM lastd WHERE dday <= 30 GROUP BY 1, 2),
          |spine AS (SELECT unnest(range(1, 31)) AS day),
          |t AS (SELECT s.day,
          |    CAST(coalesce((SELECT d FROM deaths x
          |      WHERE x.day = s.day AND x.grp = 0), 0) AS BIGINT) AS d1,
          |    CAST(coalesce((SELECT d FROM deaths x
          |      WHERE x.day = s.day AND x.grp = 1), 0) AS BIGINT) AS d2,
          |    CAST((SELECT count(*) FROM lastd l
          |      WHERE l.grp = 0 AND l.dday >= s.day) AS BIGINT) AS n1,
          |    CAST((SELECT count(*) FROM lastd l
          |      WHERE l.grp = 1 AND l.dday >= s.day) AS BIGINT) AS n2
          |  FROM spine s),
          |terms AS (SELECT day, d1, d2, n1, n2,
          |    CAST(CAST((d1 + d2) AS HUGEINT) * n1 * 1000000
          |      // greatest(n1 + n2, 1) AS BIGINT) AS e1_micro,
          |    CAST(CASE WHEN n1 + n2 >= 2 THEN
          |      CAST((d1 + d2) AS HUGEINT) * n1 * n2
          |        * (n1 + n2 - d1 - d2) * 1000000
          |        // (CAST((n1 + n2) AS HUGEINT) * (n1 + n2)
          |           * (n1 + n2 - 1))
          |      ELSE 0 END AS BIGINT) AS v_micro
          |  FROM t),
          |st AS (SELECT CAST(sum(d1) AS BIGINT) AS o1,
          |    CAST(sum(e1_micro) AS BIGINT) AS e1m,
          |    CAST(sum(v_micro) AS BIGINT) AS vm FROM terms)
          |SELECT terms.day, terms.n1 AS n_risk_even,
          |  terms.n2 AS n_risk_odd, terms.d1 AS d_even, terms.d2 AS d_odd,
          |  st.o1 AS observed_even, st.e1m AS expected_even_micro,
          |  st.vm AS variance_micro,
          |  CAST(CAST((st.o1 * 1000000 - st.e1m) AS HUGEINT)
          |    * (st.o1 * 1000000 - st.e1m) * 1000
          |    // (CAST(greatest(st.vm, 1) AS HUGEINT) * 1000000)
          |    AS BIGINT) AS logrank_z2_milli
          |FROM terms CROSS JOIN st
          |WHERE terms.d1 + terms.d2 > 0 ORDER BY terms.day
          |""".stripMargin),
      (s, dir) => {
        val lastd = H.events(s, dir)
          .groupBy(col("user_id"), (col("user_id") % 2).as("grp"))
          .agg(coalesce(min(when(col("event_type") === "purchase",
            date_format(col("ts"), "d").cast("long"))), lit(31L)).as("dday"))
          .localCheckpoint() // deaths AND the two at-risk suffixes read it
        val deaths = lastd.filter(col("dday") <= 30)
          .groupBy(col("dday").as("day"), col("grp"))
          .agg(count(lit(1)).cast("long").as("d"))
        // per-day per-group last-seen census (at-risk = suffix sums over
        // the bounded 30-day domain — the ts_survival_km idiom, per group)
        val lastCensus = lastd.groupBy(col("dday"), col("grp"))
          .agg(count(lit(1)).cast("long").as("lc"))
        val spine = s.range(1, 31).select(col("id").as("day"))
        val atRisk = spine.join(broadcast(lastCensus), col("dday") >= col("day"))
          .groupBy("day")
          .agg(sum(when(col("grp") === 0, col("lc")).otherwise(0L))
            .cast("long").as("n1"),
            sum(when(col("grp") === 1, col("lc")).otherwise(0L))
              .cast("long").as("n2"))
        val t = spine
          .join(broadcast(deaths.filter(col("grp") === 0)
            .select(col("day").as("dd1"), col("d").as("d1"))),
            col("dd1") === col("day"), "left")
          .join(broadcast(deaths.filter(col("grp") === 1)
            .select(col("day").as("dd2"), col("d").as("d2"))),
            col("dd2") === col("day"), "left")
          .join(broadcast(atRisk), Seq("day"))
          .select(col("day"),
            coalesce(col("d1"), lit(0L)).as("d1"),
            coalesce(col("d2"), lit(0L)).as("d2"),
            col("n1"), col("n2"))
        val terms = t.select(col("day"), col("d1"), col("d2"),
            col("n1"), col("n2"),
            expr("CAST(CAST((d1 + d2) AS DECIMAL(38,0)) * n1 * 1000000" +
              " div greatest(n1 + n2, 1L) AS BIGINT)").as("e1_micro"),
            expr("CAST(CASE WHEN n1 + n2 >= 2 THEN" +
              " CAST((d1 + d2) AS DECIMAL(38,0)) * n1 * n2" +
              " * (n1 + n2 - d1 - d2) * 1000000" +
              " div (CAST((n1 + n2) AS DECIMAL(38,0)) * (n1 + n2)" +
              " * (n1 + n2 - 1)) ELSE 0 END AS BIGINT)").as("v_micro"))
          .localCheckpoint() // the statistic reduce + output both read it
        val st = terms.agg(sum("d1").cast("long").as("o1"),
          sum("e1_micro").cast("long").as("e1m"),
          sum("v_micro").cast("long").as("vm"))
        val out = terms.filter(col("d1") + col("d2") > 0)
          .crossJoin(broadcast(st))
          .select(col("day"), col("n1").as("n_risk_even"),
            col("n2").as("n_risk_odd"), col("d1").as("d_even"),
            col("d2").as("d_odd"), col("o1").as("observed_even"),
            col("e1m").as("expected_even_micro"),
            col("vm").as("variance_micro"),
            expr("CAST(CAST((o1 * 1000000 - e1m) AS DECIMAL(38,0))" +
              " * (o1 * 1000000 - e1m) * 1000" +
              " div (CAST(greatest(vm, 1L) AS DECIMAL(38,0)) * 1000000)" +
              " AS BIGINT)").as("logrank_z2_milli"))
          .orderBy("day")
        H.materialized(out, caches = Nil, checkpoints = Seq(lastd, terms))
      }),

    // McNEMAR'S TEST: two document-quality rules scored on the SAME
    // documents — rule A (length gate: 20-200 tokens) vs rule B (lexical
    // diversity gate: TTR > 0.3). Marginal pass rates can look identical
    // while the rules disagree on half the corpus; McNemar tests exactly
    // the discordant cells. Per language: the 2x2 paired census, the
    // plain statistic (b-c)^2/(b+c), and the continuity-corrected form —
    // both in milli from exact integers. One map-side-combined reduce.
    Q("stats_mcnemar_test",
      Some(
        """WITH r AS (SELECT lang,
          |    CASE WHEN len(string_split(text, ' '))
          |      BETWEEN 20 AND 200 THEN 1 ELSE 0 END AS a,
          |    CASE WHEN CAST(len(list_distinct(string_split(text, ' ')))
          |        AS DOUBLE) / CAST(len(string_split(text, ' '))
          |        AS DOUBLE) > 0.3 THEN 1 ELSE 0 END AS b
          |  FROM documents),
          |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(a * b) AS BIGINT) AS n_both,
          |    CAST(sum(a * (1 - b)) AS BIGINT) AS only_a,
          |    CAST(sum((1 - a) * b) AS BIGINT) AS only_b,
          |    CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n_neither
          |  FROM r GROUP BY 1)
          |SELECT lang, n, n_both, only_a, only_b, n_neither,
          |  CAST((only_a - only_b) * (only_a - only_b) * 1000
          |    // greatest(only_a + only_b, 1) AS BIGINT) AS mcnemar_milli,
          |  CAST(greatest(abs(only_a - only_b) - 1, 0)
          |    * greatest(abs(only_a - only_b) - 1, 0) * 1000
          |    // greatest(only_a + only_b, 1) AS BIGINT)
          |    AS mcnemar_cc_milli
          |FROM c ORDER BY lang
          |""".stripMargin),
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(col("lang"),
            when(size(split(col("text"), " ")).between(20, 200), 1)
              .otherwise(0).as("a"),
            when(size(array_distinct(split(col("text"), " "))).cast("double")
              / size(split(col("text"), " ")).cast("double") > 0.3, 1)
              .otherwise(0).as("b"))
          .groupBy("lang")
          .agg(count(lit(1)).cast("long").as("n"),
            sum(col("a") * col("b")).cast("long").as("n_both"),
            sum(col("a") * (lit(1) - col("b"))).cast("long").as("only_a"),
            sum((lit(1) - col("a")) * col("b")).cast("long").as("only_b"),
            sum((lit(1) - col("a")) * (lit(1) - col("b"))).cast("long")
              .as("n_neither"))
          .select(col("lang"), col("n"), col("n_both"), col("only_a"),
            col("only_b"), col("n_neither"),
            expr("CAST((only_a - only_b) * (only_a - only_b) * 1000" +
              " div greatest(only_a + only_b, 1L) AS BIGINT)")
              .as("mcnemar_milli"),
            expr("CAST(greatest(abs(only_a - only_b) - 1, 0L)" +
              " * greatest(abs(only_a - only_b) - 1, 0L) * 1000" +
              " div greatest(only_a + only_b, 1L) AS BIGINT)")
              .as("mcnemar_cc_milli"))
          .orderBy("lang")),

    // TUKEY HSD: post-hoc pairwise comparison of mean account balance
    // (cents) across the five market segments — the follow-up the
    // existing one-way ANOVA needs before "segments differ" becomes
    // "THESE segments differ". MSE comes from exact integer moments
    // (count / sum / DECIMAL sum-of-squares in one reduce); each of the
    // 10 pairs computes q = |mi - mj| / sqrt(MSE/2 * (1/ni + 1/nj)) in an
    // identical double tree over those integers. Pair grid is the 5x5
    // segment domain — broadcast, never a fact-side pass.
    Q("stats_tukey_hsd",
      Some(
        """WITH v AS (SELECT c_mktsegment AS g,
          |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
          |  FROM customer),
          |gs AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(v) AS BIGINT) AS s,
          |    CAST(sum(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) AS q
          |  FROM v GROUP BY 1),
          |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
          |    CAST(count(*) AS BIGINT) AS k,
          |    CAST(sum(q) - sum(CAST(s AS DECIMAL(38,0)) * s // n)
          |      AS DECIMAL(38,0)) AS ssw
          |  FROM gs)
          |SELECT a.g AS seg_a, b.g AS seg_b, a.n AS n_a, b.n AS n_b,
          |  a.s * 1000 // a.n AS mean_a_milli,
          |  b.s * 1000 // b.n AS mean_b_milli,
          |  CAST(floor(abs(CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
          |      - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
          |    / sqrt(CAST(tot.ssw AS DOUBLE) / CAST(tot.nn - tot.k AS DOUBLE)
          |      / 2.0 * (1.0 / CAST(a.n AS DOUBLE)
          |        + 1.0 / CAST(b.n AS DOUBLE))) * 1000.0) AS BIGINT)
          |    AS q_milli
          |FROM gs a JOIN gs b ON a.g < b.g CROSS JOIN tot
          |ORDER BY seg_a, seg_b
          |""".stripMargin),
      (s, dir) => {
        val gs = tbl(s, dir, "customer")
          .select(col("c_mktsegment").as("g"),
            floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("v"))
          .groupBy("g")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("v").cast("long").as("s"),
            sum(expr("CAST(v AS DECIMAL(38,0)) * v"))
              .cast("decimal(38,0)").as("q"))
          .localCheckpoint() // totals + both pair sides read it
        val tot = gs.agg(sum("n").cast("long").as("nn"),
          count(lit(1)).cast("long").as("k"),
          (sum("q") - sum(expr("CAST(s AS DECIMAL(38,0)) * s div n")))
            .cast("decimal(38,0)").as("ssw"))
        val a = gs.select(col("g").as("seg_a"), col("n").as("n_a"),
          col("s").as("s_a"))
        val b = gs.select(col("g").as("seg_b"), col("n").as("n_b"),
          col("s").as("s_b"))
        val out = a.join(b, col("seg_a") < col("seg_b"))
          .crossJoin(broadcast(tot))
          .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
            expr("s_a * 1000 div n_a").as("mean_a_milli"),
            expr("s_b * 1000 div n_b").as("mean_b_milli"),
            expr("CAST(floor(abs(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)" +
              " - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))" +
              " / sqrt(CAST(ssw AS DOUBLE) / CAST(nn - k AS DOUBLE)" +
              " / 2.0 * (1.0 / CAST(n_a AS DOUBLE)" +
              " + 1.0 / CAST(n_b AS DOUBLE))) * 1000.0) AS BIGINT)")
              .as("q_milli"))
          .orderBy("seg_a", "seg_b")
        H.materialized(out, caches = Nil, checkpoints = Seq(gs))
      })
  )
}
