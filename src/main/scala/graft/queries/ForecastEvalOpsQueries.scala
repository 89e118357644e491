package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Ninety-eighth wave: forecast evaluation, disclosure control,
  * calendar effects, and the DataFrame.transpose API — a
  * three-forecaster scoreboard (naive / seasonal-naive / drift) scored
  * with exact-integer MASE and micro-floored sMAPE on a 12-month
  * holdout, one-round cell suppression for a small-count statistical
  * release (primary < 5, complementary = smallest cell of any row left
  * with a lone suppression), the end-of-month revenue lift, and Spark
  * 4's transpose() pivoting a bounded report frame sideways.
  *
  * Exactness: MASE stays a pure integer ratio (cross-multiplied, milli
  * scale); sMAPE terms floor to micro per month BEFORE the mean;
  * suppression decisions compare exact counts with deterministic
  * tiebreaks; the EOM lift cross-multiplies integer sums.
  */
object ForecastEvalOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Forecast scoreboard on the monthly revenue series: last 12
    // months held out; naive (last train value), seasonal-naive
    // (actual from 12 months prior), drift (linear extrapolation with
    // integer slope). MASE = test MAE / train one-step MAE as a
    // cross-multiplied integer ratio; sMAPE per-month terms floored to
    // micro pre-mean. Everything after the one fact scan lives on the
    // ~80-row month frame. The "which baseline must a model beat"
    // table every forecasting effort starts from.
    Q("ts_forecast_scoreboard",
      Some(
        """WITH m AS (SELECT year(o_orderdate)*12 + month(o_orderdate)
          |    AS ym,
          |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS rev
          |  FROM orders GROUP BY 1),
          |ix AS (SELECT ym, rev,
          |  CAST(row_number() OVER (ORDER BY ym) AS BIGINT) AS i,
          |  CAST(count(*) OVER () AS BIGINT) AS n FROM m),
          |tr AS (SELECT max(CASE WHEN i = n - 12 THEN rev END) AS last_v,
          |  max(CASE WHEN i = 1 THEN rev END) AS first_v,
          |  CAST(max(n) - 12 AS BIGINT) AS ntr FROM ix),
          |trd AS (SELECT CAST(sum(abs(a.rev - b.rev)) AS BIGINT) AS sad
          |  FROM ix a JOIN ix b ON b.i = a.i - 1, tr
          |  WHERE a.i <= tr.ntr),
          |tst AS (SELECT a.i, a.rev,
          |  tr.last_v AS f_naive,
          |  s.rev AS f_snaive,
          |  tr.last_v + CASE WHEN tr.last_v >= tr.first_v
          |    THEN (a.i - tr.ntr) * ((tr.last_v - tr.first_v)
          |      // (tr.ntr - 1))
          |    ELSE -((a.i - tr.ntr) * ((tr.first_v - tr.last_v)
          |      // (tr.ntr - 1))) END AS f_drift
          |  FROM ix a JOIN ix s ON s.i = a.i - 12, tr
          |  WHERE a.i > tr.ntr),
          |lng AS (SELECT 'a_naive' AS model, rev, f_naive AS f FROM tst
          |  UNION ALL SELECT 'b_snaive', rev, f_snaive FROM tst
          |  UNION ALL SELECT 'c_drift', rev, f_drift FROM tst),
          |sc AS (SELECT model, CAST(count(*) AS BIGINT) AS h,
          |  CAST(sum(abs(rev - f)) AS BIGINT) AS sae,
          |  CAST(sum(CAST(floor(2.0 * abs(CAST(rev - f AS DOUBLE))
          |    / (abs(CAST(rev AS DOUBLE)) + abs(CAST(f AS DOUBLE)))
          |    * 1000000.0) AS BIGINT)) AS BIGINT) AS smape_sum_micro
          |  FROM lng GROUP BY 1)
          |SELECT sc.model, sc.h, sc.sae,
          |  CAST(sc.sae * (tr.ntr - 1) * 1000 // (sc.h * trd.sad)
          |    AS BIGINT) AS mase_milli,
          |  CAST(sc.smape_sum_micro // sc.h AS BIGINT)
          |    AS smape_mean_micro
          |FROM sc, tr, trd ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val m = tbl(s, dir, "orders")
          .groupBy((year(col("o_orderdate")) * 12 +
            month(col("o_orderdate"))).as("ym"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
            .cast("long")).cast("long").as("rev"))
        val ix = m
          .withColumn("i",
            row_number().over(Window.orderBy("ym")).cast("long"))
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy()).cast("long"))
          .localCheckpoint() // bounded month frame, read 4×
        val tr = ix.agg(
          max(when(col("i") === col("n") - 12, col("rev"))).as("last_v"),
          max(when(col("i") === 1, col("rev"))).as("first_v"),
          (max(col("n")) - 12).cast("long").as("ntr"))
        val trd = ix.as("a")
          .join(ix.as("b"), col("b.i") === col("a.i") - 1)
          .crossJoin(broadcast(tr))
          .filter(col("a.i") <= col("ntr"))
          .agg(sum(abs(col("a.rev") - col("b.rev"))).cast("long")
            .as("sad"))
        val tst = ix.as("a")
          .join(ix.as("s"), col("s.i") === col("a.i") - 12)
          .crossJoin(broadcast(tr))
          .filter(col("a.i") > col("ntr"))
          .select(col("a.rev").as("rev"),
            col("last_v").as("f_naive"),
            col("s.rev").as("f_snaive"),
            (col("last_v") + expr(
              "CASE WHEN last_v >= first_v THEN (a.i - ntr)" +
                " * ((last_v - first_v) div (ntr - 1))" +
                " ELSE -((a.i - ntr) * ((first_v - last_v)" +
                " div (ntr - 1))) END")).as("f_drift"))
        val lng = tst.select(lit("a_naive").as("model"), col("rev"),
            col("f_naive").as("f"))
          .unionByName(tst.select(lit("b_snaive").as("model"),
            col("rev"), col("f_snaive").as("f")))
          .unionByName(tst.select(lit("c_drift").as("model"), col("rev"),
            col("f_drift").as("f")))
        val sc = lng.groupBy("model")
          .agg(count(lit(1)).cast("long").as("h"),
            sum(abs(col("rev") - col("f"))).cast("long").as("sae"),
            sum(floor(lit(2.0d) *
              abs((col("rev") - col("f")).cast("double")) /
              (abs(col("rev").cast("double")) +
                abs(col("f").cast("double"))) * 1000000.0d)
              .cast("long")).cast("long").as("smape_sum_micro"))
        val out = sc.crossJoin(broadcast(tr)).crossJoin(broadcast(trd))
          .select(col("model"), col("h"), col("sae"),
            expr("sae * (ntr - 1) * 1000 div (h * sad)").cast("long")
              .as("mase_milli"),
            expr("smape_sum_micro div h").cast("long")
              .as("smape_mean_micro"))
          .orderBy("model")
        H.materialized(out, Nil, Seq(ix))
      }),

    // One-round cell suppression for the (nation, priority) release of
    // 2001 order counts: cells under 5 suppress primarily; any nation
    // row left with EXACTLY ONE suppressed cell gets its smallest
    // surviving cell suppressed too (else the row margin reveals the
    // hidden value) — deterministic tiebreak by count then priority.
    // Statistical-disclosure control as a query: flags, not deletion,
    // so the release pipeline downstream stays auditable.
    Q("privacy_cell_suppression",
      Some(
        """WITH c AS (SELECT n.n_name AS nation,
          |  o.o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS n
          |  FROM orders o
          |  JOIN customer cu ON cu.c_custkey = o.o_custkey
          |  JOIN nation n ON n.n_nationkey = cu.c_nationkey
          |  WHERE year(o.o_orderdate) = 2001 GROUP BY 1, 2),
          |p AS (SELECT nation, pri, n,
          |  CASE WHEN n < 5 THEN 1 ELSE 0 END AS prim FROM c),
          |r AS (SELECT nation, CAST(sum(prim) AS BIGINT) AS nsup FROM p
          |  GROUP BY 1),
          |sm AS (SELECT p.nation, min(p.n) AS mn FROM p
          |  JOIN r ON r.nation = p.nation
          |  WHERE r.nsup = 1 AND p.prim = 0 GROUP BY 1),
          |smc AS (SELECT p.nation, p.n AS mn,
          |  min(p.pri) AS mnpri FROM p
          |  JOIN sm ON sm.nation = p.nation AND sm.mn = p.n
          |  WHERE p.prim = 0 GROUP BY 1, 2)
          |SELECT p.nation, p.pri AS priority, p.n,
          |  CAST(p.prim AS BIGINT) AS primary_suppress,
          |  CAST(CASE WHEN smc.nation IS NOT NULL AND p.prim = 0
          |    AND p.n = smc.mn AND p.pri = smc.mnpri THEN 1 ELSE 0 END
          |    AS BIGINT) AS complementary_suppress
          |FROM p LEFT JOIN smc ON smc.nation = p.nation
          |ORDER BY 1, 2
          |""".stripMargin),
      (s, dir) => {
        val c = tbl(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 2001)
          .join(broadcast(tbl(s, dir, "customer")
              .select(col("c_custkey"), col("c_nationkey"))),
            col("c_custkey") === col("o_custkey"))
          .join(broadcast(tbl(s, dir, "nation")
              .select(col("n_nationkey"), col("n_name").as("nation"))),
            col("n_nationkey") === col("c_nationkey"))
          .groupBy(col("nation"), col("o_orderpriority").as("pri"))
          .agg(count(lit(1)).cast("long").as("n"))
        val p = c.withColumn("prim",
          when(col("n") < 5, 1).otherwise(0))
        val r = p.groupBy("nation")
          .agg(sum(col("prim")).cast("long").as("nsup"))
        val sm = p.join(broadcast(r), Seq("nation"))
          .filter(col("nsup") === 1 && col("prim") === 0)
          .groupBy("nation").agg(min(col("n")).as("mn"))
        val smc = p.join(broadcast(sm), Seq("nation"))
          .filter(col("prim") === 0 && col("n") === col("mn"))
          .groupBy("nation", "mn").agg(min(col("pri")).as("mnpri"))
        p.join(broadcast(smc), Seq("nation"), "left")
          .select(col("nation"), col("pri").as("priority"), col("n"),
            col("prim").cast("long").as("primary_suppress"),
            when(col("mnpri").isNotNull && col("prim") === 0 &&
              col("n") === col("mn") && col("pri") === col("mnpri"), 1L)
              .otherwise(0L).cast("long").as("complementary_suppress"))
          .orderBy("nation", "priority")
      }),

    // End-of-month effect: do the last three calendar days of each
    // month out-earn the rest? Daily cents split by last_day(day) −
    // day ≤ 2; the lift is the cross-multiplied integer mean ratio in
    // milli. The calendar artifact every revenue forecast must either
    // model or consciously ignore.
    Q("ts_eom_effect",
      Some(
        """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
          |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents
          |  FROM orders GROUP BY 1),
          |k AS (SELECT day, cents,
          |  CASE WHEN date_diff('day', day, last_day(day)) <= 2
          |    THEN 1 ELSE 0 END AS eom FROM d),
          |g AS (SELECT
          |  CAST(sum(CASE WHEN eom = 1 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS ne,
          |  CAST(sum(CASE WHEN eom = 1 THEN cents ELSE 0 END) AS BIGINT)
          |    AS se,
          |  CAST(sum(CASE WHEN eom = 0 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS nr,
          |  CAST(sum(CASE WHEN eom = 0 THEN cents ELSE 0 END) AS BIGINT)
          |    AS sr FROM k)
          |SELECT ne AS eom_days, se AS eom_cents, nr AS rest_days,
          |  sr AS rest_cents,
          |  CAST(se * nr * 1000 // (sr * ne) AS BIGINT) AS lift_milli
          |FROM g
          |""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
            .cast("long")).cast("long").as("cents"))
        val k = d.withColumn("eom",
          when(datediff(last_day(col("day")), col("day")) <= 2, 1)
            .otherwise(0))
        k.agg(
            sum(when(col("eom") === 1, 1L).otherwise(0L)).cast("long")
              .as("ne"),
            sum(when(col("eom") === 1, col("cents")).otherwise(0L))
              .cast("long").as("se"),
            sum(when(col("eom") === 0, 1L).otherwise(0L)).cast("long")
              .as("nr"),
            sum(when(col("eom") === 0, col("cents")).otherwise(0L))
              .cast("long").as("sr"))
          .select(col("ne").as("eom_days"), col("se").as("eom_cents"),
            col("nr").as("rest_days"), col("sr").as("rest_cents"),
            expr("se * nr * 1000 div (sr * ne)").cast("long")
              .as("lift_milli"))
      }),

    // DataFrame.transpose (Spark 4): the year × segment cents report
    // flipped sideways — segments become rows, years become columns —
    // for the bounded report frames where analysts want the other
    // orientation without re-aggregating. The oracle states the
    // transposed result directly; values cross the transpose as
    // strings of exact cents.
    Q("api_transpose",
      Some(
        """WITH f AS (SELECT c.c_mktsegment AS seg,
          |  year(o.o_orderdate) AS yr,
          |  CAST(sum(CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents
          |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          |  WHERE year(o.o_orderdate) IN (1996, 1997, 1998)
          |  GROUP BY 1, 2)
          |SELECT seg,
          |  CAST(max(CASE WHEN yr = 1996 THEN cents END) AS VARCHAR)
          |    AS y1996,
          |  CAST(max(CASE WHEN yr = 1997 THEN cents END) AS VARCHAR)
          |    AS y1997,
          |  CAST(max(CASE WHEN yr = 1998 THEN cents END) AS VARCHAR)
          |    AS y1998
          |FROM f GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val f = tbl(s, dir, "orders")
          .filter(year(col("o_orderdate")).isin(1996, 1997, 1998))
          .join(broadcast(tbl(s, dir, "customer")
              .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
            col("c_custkey") === col("o_custkey"))
          .groupBy(concat(lit("y"), year(col("o_orderdate"))).as("yr"),
            col("seg"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
            .cast("long")).cast("long").as("cents"))
        val wide = f.groupBy("yr").pivot("seg").sum("cents")
          .orderBy("yr")
        wide.transpose(col("yr"))
          .withColumnRenamed("key", "seg")
          .select(col("seg") +: Seq("y1996", "y1997", "y1998")
            .map(c => col(c).cast("string").as(c)): _*)
          .orderBy("seg")
      })
  )
}
