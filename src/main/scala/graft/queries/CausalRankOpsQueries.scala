package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Hundred-third wave: causal inference, structural breaks, catch-up
  * planning, and fielded ranking — difference-in-differences on the
  * event stream (signup users vs never-signup, pre vs post midpoint),
  * the Chow test for a regression break at 1998, the watermark
  * backfill planner (per entity: lag, batch count, row estimate — the
  * reference's watermark semantics turned into a catch-up schedule),
  * and BM25F with a title field boost.
  *
  * Exactness: DiD cell means stay (sum, count) integer pairs until one
  * final micro chain; Chow SSRs come from n-scaled integer moments
  * with per-segment micro floors; the planner is pure integer calendar
  * math; BM25F saturates per (doc, term) in ONE micro-floored chain
  * before the cross-term sum.
  */
object CausalRankOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Difference-in-differences: does signing up change purchase
    // VALUE? Treatment = users with a signup event, periods split at
    // the data-derived midpoint instant. The estimator is the classic
    // four-cell double difference of per-user-period means — cells
    // reduce to (Σ value-cents, user-period count) integer pairs, and
    // the DiD lands in one micro chain. The observational-causal
    // workhorse, with every mean auditable.
    Q("events_diff_in_diff",
      Some(
        """WITH b AS (SELECT min(epoch_us(ts)) AS lo,
          |  max(epoch_us(ts)) AS hi FROM events),
          |t AS (SELECT user_id,
          |  max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
          |    AS treated FROM events GROUP BY 1),
          |e AS (SELECT ev.user_id, t.treated,
          |  CASE WHEN epoch_us(ev.ts) * 2 >= b.lo + b.hi THEN 1 ELSE 0
          |    END AS post,
          |  CAST(floor(ev.value * 100 + 0.5) AS BIGINT) AS cents
          |  FROM events ev JOIN t ON t.user_id = ev.user_id, b
          |  WHERE ev.event_type = 'purchase'),
          |up AS (SELECT user_id, treated, post,
          |  CAST(sum(cents) AS BIGINT) AS cents FROM e GROUP BY 1, 2, 3),
          |c AS (SELECT treated, post, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(cents) AS BIGINT) AS s FROM up GROUP BY 1, 2),
          |p AS (SELECT
          |  max(CASE WHEN treated = 1 AND post = 1 THEN s END) AS s11,
          |  max(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n11,
          |  max(CASE WHEN treated = 1 AND post = 0 THEN s END) AS s10,
          |  max(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n10,
          |  max(CASE WHEN treated = 0 AND post = 1 THEN s END) AS s01,
          |  max(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n01,
          |  max(CASE WHEN treated = 0 AND post = 0 THEN s END) AS s00,
          |  max(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n00
          |  FROM c)
          |SELECT n11, n10, n01, n00,
          |  CAST(floor(((CAST(s11 AS DOUBLE)/CAST(n11 AS DOUBLE)
          |    - CAST(s10 AS DOUBLE)/CAST(n10 AS DOUBLE))
          |    - (CAST(s01 AS DOUBLE)/CAST(n01 AS DOUBLE)
          |    - CAST(s00 AS DOUBLE)/CAST(n00 AS DOUBLE)))
          |    * 1000.0) AS BIGINT) AS did_milli_cents
          |FROM p
          |""".stripMargin),
      (s, dir) => {
        val ev = H.events(s, dir)
        val b = ev.agg(min(unix_micros(col("ts"))).as("lo"),
          max(unix_micros(col("ts"))).as("hi"))
        val t = ev.groupBy("user_id")
          .agg(max(when(col("event_type") === "signup", 1).otherwise(0))
            .as("treated"))
        val e = ev.filter(col("event_type") === "purchase")
          .join(t, Seq("user_id"))
          .crossJoin(broadcast(b))
          .select(col("user_id"), col("treated"),
            when(unix_micros(col("ts")) * 2 >= col("lo") + col("hi"), 1)
              .otherwise(0).as("post"),
            floor(col("value") * 100 + lit(0.5)).cast("long")
              .as("cents"))
        val up = e.groupBy("user_id", "treated", "post")
          .agg(sum(col("cents")).cast("long").as("cents"))
        val c = up.groupBy("treated", "post")
          .agg(count(lit(1)).cast("long").as("n"),
            sum(col("cents")).cast("long").as("s"))
        def cell(t0: Int, p0: Int, f: String) =
          max(when(col("treated") === t0 && col("post") === p0,
            col(f)))
        c.agg(cell(1, 1, "s").as("s11"), cell(1, 1, "n").as("n11"),
            cell(1, 0, "s").as("s10"), cell(1, 0, "n").as("n10"),
            cell(0, 1, "s").as("s01"), cell(0, 1, "n").as("n01"),
            cell(0, 0, "s").as("s00"), cell(0, 0, "n").as("n00"))
          .select(col("n11"), col("n10"), col("n01"), col("n00"),
            floor(((col("s11").cast("double") / col("n11").cast("double")
              - col("s10").cast("double") / col("n10").cast("double")) -
              (col("s01").cast("double") / col("n01").cast("double") -
                col("s00").cast("double") / col("n00").cast("double"))) *
              1000.0d).cast("long").as("did_milli_cents"))
      }),

    // Chow test: does the daily-revenue-on-time regression break at
    // 1998-01-01? SSRs for the pooled fit and each segment come from
    // exact n-scaled integer moments (kd units), each SSR one
    // micro-floored chain, F assembled from the three. The structural-
    // break gate before extrapolating any trend across a regime
    // change.
    Q("stats_chow_break",
      Some(
        """WITH d AS (SELECT
          |  CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
          |    AS BIGINT) AS x,
          |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) // 100000 AS y,
          |  CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 0
          |    ELSE 1 END AS seg
          |  FROM orders GROUP BY o_orderdate),
          |m AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |  sum(CAST(x AS HUGEINT)*x) AS sxx,
          |  sum(CAST(x AS HUGEINT)*y) AS sxy,
          |  sum(CAST(y AS HUGEINT)*y) AS syy FROM d GROUP BY 1),
          |a AS (SELECT seg,
          |  CAST(floor(((CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
          |      - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))
          |    - (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
          |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
          |      * (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
          |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
          |      / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
          |      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)))
          |    / CAST(n AS DOUBLE)) AS BIGINT) AS ssr, n FROM m),
          |pm AS (SELECT CAST(sum(n) AS BIGINT) AS n,
          |  CAST(sum(sx) AS BIGINT) AS sx, CAST(sum(sy) AS BIGINT)
          |    AS sy, sum(sxx) AS sxx, sum(sxy) AS sxy, sum(syy) AS syy
          |  FROM m),
          |pa AS (SELECT
          |  CAST(floor(((CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
          |      - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))
          |    - (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
          |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
          |      * (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
          |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
          |      / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
          |      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)))
          |    / CAST(n AS DOUBLE)) AS BIGINT) AS ssrp, n FROM pm),
          |f AS (SELECT pa.ssrp, pa.n,
          |  (SELECT CAST(sum(ssr) AS BIGINT) FROM a) AS ssru FROM pa)
          |SELECT n AS n_days, ssrp AS ssr_pooled, ssru AS ssr_split,
          |  CAST(floor((CAST(ssrp - ssru AS DOUBLE) / 2.0)
          |    / (CAST(ssru AS DOUBLE) / (CAST(n AS DOUBLE) - 4.0))
          |    * 1000000.0) AS BIGINT) AS chow_f_micro
          |FROM f
          |""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "orders")
          .groupBy(col("o_orderdate"))
          .agg(expr("CAST(sum(CAST(floor(o_totalprice*100 + 0.5)" +
            " AS BIGINT)) AS BIGINT) div 100000").as("y"))
          .select(datediff(col("o_orderdate"),
            to_timestamp(lit("1992-01-01 00:00:00"))).cast("long")
            .as("x"), col("y"),
            when(col("o_orderdate") <
              to_timestamp(lit("1998-01-01 00:00:00")), 0).otherwise(1)
              .as("seg"))
        val m = d.groupBy("seg")
          .agg(count(lit(1)).cast("long").as("n"),
            sum(col("x")).cast("long").as("sx"),
            sum(col("y")).cast("long").as("sy"),
            sum(col("x").cast("decimal(38,0)") * col("x"))
              .cast("decimal(38,0)").as("sxx"),
            sum(col("x").cast("decimal(38,0)") * col("y"))
              .cast("decimal(38,0)").as("sxy"),
            sum(col("y").cast("decimal(38,0)") * col("y"))
              .cast("decimal(38,0)").as("syy"))
          .localCheckpoint()
        def ssrExpr = floor(((col("n").cast("double") *
          col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double")) -
          (col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) *
            (col("n").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
            (col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double"))) /
          col("n").cast("double")).cast("long")
        val a = m.select(ssrExpr.as("ssr"))
          .agg(sum(col("ssr")).cast("long").as("ssru"))
        val pm = m.agg(sum(col("n")).cast("long").as("n"),
          sum(col("sx")).cast("long").as("sx"),
          sum(col("sy")).cast("long").as("sy"),
          sum(col("sxx")).cast("decimal(38,0)").as("sxx"),
          sum(col("sxy")).cast("decimal(38,0)").as("sxy"),
          sum(col("syy")).cast("decimal(38,0)").as("syy"))
        val pa = pm.select(ssrExpr.as("ssrp"), col("n"))
        val out = pa.crossJoin(broadcast(a))
          .select(col("n").as("n_days"), col("ssrp").as("ssr_pooled"),
            col("ssru").as("ssr_split"),
            floor(((col("ssrp") - col("ssru")).cast("double") / 2.0d) /
              (col("ssru").cast("double") /
                (col("n").cast("double") - 4.0d)) * 1000000.0d)
              .cast("long").as("chow_f_micro"))
        H.materialized(out, Nil, Seq(m))
      }),

    // Watermark backfill planner: per entity (event type), the
    // watermark's lag behind the corpus high-water mark, the catch-up
    // schedule in 6-hour batches, and the expected row volume (average
    // daily rate × gap). Pure integer calendar math off one keyed
    // aggregation — the reference's watermark state (O19) turned into
    // the operational "how long until we're caught up" table.
    Q("pipeline_backfill_plan",
      Some(
        """WITH g AS (SELECT max(epoch_us(ts)) AS hi,
          |  min(epoch_us(ts)) AS lo FROM events),
          |w AS (SELECT event_type, max(epoch_us(ts)) AS wm,
          |  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1)
          |SELECT w.event_type, CAST(w.n AS BIGINT) AS n_rows,
          |  CAST((g.hi - w.wm) // 3600000000 AS BIGINT) AS lag_hours,
          |  CAST(((g.hi - w.wm) + 21599999999) // 21600000000 AS BIGINT)
          |    AS n_batches_6h,
          |  CAST(w.n * ((g.hi - w.wm) // 3600000000)
          |    // ((g.hi - g.lo) // 3600000000 + 1) AS BIGINT)
          |    AS est_backfill_rows
          |FROM w, g ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val ev = H.events(s, dir)
        val g = ev.agg(max(unix_micros(col("ts"))).as("hi"),
          min(unix_micros(col("ts"))).as("lo"))
        ev.groupBy("event_type")
          .agg(max(unix_micros(col("ts"))).as("wm"),
            count(lit(1)).cast("long").as("n"))
          .crossJoin(broadcast(g))
          .select(col("event_type"), col("n").as("n_rows"),
            expr("(hi - wm) div 3600000000").cast("long")
              .as("lag_hours"),
            expr("((hi - wm) + 21599999999) div 21600000000")
              .cast("long").as("n_batches_6h"),
            expr("n * ((hi - wm) div 3600000000)" +
              " div ((hi - lo) div 3600000000 + 1)").cast("long")
              .as("est_backfill_rows"))
          .orderBy("event_type")
      }),

    // BM25F: the title field (first five tokens) weighted 3× the body,
    // field-weighted tf saturated through ONE micro-floored chain per
    // (doc, term) — idf is micro-quantized once per term, k1 = 1.2,
    // b = 0.75 against the weighted average length. The fielded
    // ranking function real search engines run; scores stay exact
    // integers after the per-cell floor.
    Q("rank_bm25f",
      Some(
        """WITH tok AS (SELECT doc_id,
          |  unnest(string_split(text, ' ')) AS w,
          |  generate_subscripts(string_split(text, ' '), 1) AS i
          |  FROM documents),
          |ft AS (SELECT doc_id, w,
          |  CAST(sum(CASE WHEN i <= 5 THEN 3 ELSE 1 END) AS BIGINT)
          |    AS wtf
          |  FROM tok WHERE w <> '' GROUP BY 1, 2),
          |dl AS (SELECT doc_id, CAST(sum(wtf) AS BIGINT) AS wlen
          |  FROM ft GROUP BY 1),
          |st AS (SELECT CAST(count(*) AS BIGINT) AS nd,
          |  CAST(sum(wlen) AS BIGINT) AS tot FROM dl),
          |idf AS (SELECT w, CAST(floor(ln((CAST(st.nd AS DOUBLE)
          |    - CAST(count(*) AS DOUBLE) + 0.5)
          |    / (CAST(count(*) AS DOUBLE) + 0.5) + 1.0) * 1000000.0)
          |    AS BIGINT) AS idf_micro
          |  FROM ft, st WHERE w IN ('scan', 'merge', 'vector')
          |  GROUP BY w, st.nd),
          |sc AS (SELECT ft.doc_id,
          |  CAST(floor(CAST(idf.idf_micro AS DOUBLE)
          |    * (CAST(ft.wtf AS DOUBLE) * 2.2)
          |    / (CAST(ft.wtf AS DOUBLE) + 1.2 * (0.25 + 0.75
          |      * CAST(dl.wlen AS DOUBLE) * CAST(st.nd AS DOUBLE)
          |      / CAST(st.tot AS DOUBLE)))) AS BIGINT) AS term_score
          |  FROM ft JOIN idf ON idf.w = ft.w
          |  JOIN dl ON dl.doc_id = ft.doc_id, st)
          |SELECT doc_id, CAST(sum(term_score) AS BIGINT) AS score_micro,
          |  CAST(count(*) AS BIGINT) AS n_terms
          |FROM sc GROUP BY 1 ORDER BY score_micro DESC, doc_id LIMIT 10
          |""".stripMargin),
      (s, dir) => {
        val tok = tbl(s, dir, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ", -1)))
          .withColumnRenamed("col", "w").withColumnRenamed("pos", "i0")
          .withColumn("i", col("i0") + 1)
          .filter(col("w") =!= "")
        val ft = tok.groupBy("doc_id", "w")
          .agg(sum(when(col("i") <= 5, 3L).otherwise(1L)).cast("long")
            .as("wtf"))
          .localCheckpoint()
        val dl = ft.groupBy("doc_id")
          .agg(sum(col("wtf")).cast("long").as("wlen"))
        val st = dl.agg(count(lit(1)).cast("long").as("nd"),
          sum(col("wlen")).cast("long").as("tot"))
        val idf = ft.filter(col("w").isin("scan", "merge", "vector"))
          .groupBy("w").agg(count(lit(1)).cast("long").as("df"))
          .crossJoin(broadcast(st))
          .select(col("w"),
            floor(log((col("nd").cast("double") -
              col("df").cast("double") + 0.5d) /
              (col("df").cast("double") + 0.5d) + 1.0d) * 1000000.0d)
              .cast("long").as("idf_micro"))
        val sc = ft.join(broadcast(idf), Seq("w"))
          .join(dl, Seq("doc_id"))
          .crossJoin(broadcast(st))
          .select(col("doc_id"),
            floor(col("idf_micro").cast("double") *
              (col("wtf").cast("double") * 2.2d) /
              (col("wtf").cast("double") + lit(1.2d) * (lit(0.25d) +
                lit(0.75d) * col("wlen").cast("double") *
                col("nd").cast("double") / col("tot").cast("double"))))
              .cast("long").as("term_score"))
        val out = sc.groupBy("doc_id")
          .agg(sum(col("term_score")).cast("long").as("score_micro"),
            count(lit(1)).cast("long").as("n_terms"))
          .orderBy(col("score_micro").desc, col("doc_id")).limit(10)
        H.materialized(out, Nil, Seq(ft))
      })
  )
}
