package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Typed rows for the Dataset-API sessionization (encoders need
  * top-level case classes). */
final case class SessEv(user_id: Long, ts_us: Long, event_id: Long)
final case class SessStat(user_id: Long, n_events: Long,
  n_sessions: Long, max_session_events: Long)

/** Ninety-first wave: motif significance, revenue recognition, Zipf's
  * law, and a typed-Dataset sessionizer — triangle z-score against the
  * Chung-Lu configuration null (is the co-supplier clustering real or
  * a degree artifact?), a deferred-revenue amortization schedule with
  * exact integer cent-splitting, the Zipf exponent fit on micro-
  * quantized log moments, and per-user session statistics through
  * `groupByKey.mapGroups` (the Dataset encoder path, oracle-checked
  * against the window-sessionization SQL).
  *
  * Exactness: triangle/degree counts are exact; E[T] and z are one
  * micro-floored IEEE chain on three degree moments. Revenue splits
  * use cents div k with the remainder spread to the earliest months —
  * the schedule sums back to the order total BY CONSTRUCTION. The Zipf
  * regression quantizes each ln to micro BEFORE the cross-row moment
  * sums (HUGEINT/DECIMAL), so the fitted slope is reproducible to the
  * last micro.
  */
object MotifRevenueOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Triangle significance on the repeat-co-supplier graph (same ≥6
    // threshold as graph_triangles): observed triangles vs the
    // Chung-Lu expectation E[T] = S₂³/(6·S₁³) from degree moments
    // S₁ = Σd, S₂ = Σd(d−1), with a Poisson z = (T − E)/√E. The edge
    // build is the one fact-heavy stage; orientation bounds the wedge
    // join; moments ride the |V| degree frame. Degree-preserving null
    // models are how graph pipelines separate real community structure
    // from hub artifacts at scale.
    Q("graph_motif_z",
      Some(
        """WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
          |e AS (SELECT x.l_suppkey AS a, y.l_suppkey AS b FROM li x
          |  JOIN li y ON x.l_orderkey = y.l_orderkey
          |    AND x.l_suppkey < y.l_suppkey
          |  GROUP BY 1, 2 HAVING count(*) >= 6),
          |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
          |  (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
          |  GROUP BY 1),
          |o AS (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
          |    THEN e.a ELSE e.b END AS src,
          |  CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
          |    THEN e.b ELSE e.a END AS dst
          |  FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b),
          |tri AS (SELECT CAST(count(*) AS BIGINT) AS t FROM o w1
          |  JOIN o w2 ON w2.src = w1.dst
          |  JOIN o w3 ON w3.src = w1.src AND w3.dst = w2.dst),
          |m AS (SELECT CAST(count(*) AS BIGINT) AS nv,
          |  CAST(sum(d) AS BIGINT) AS s1,
          |  CAST(sum(d*(d-1)) AS BIGINT) AS s2 FROM deg)
          |SELECT m.nv AS n_nodes, m.s1 // 2 AS n_edges, tri.t AS triangles,
          |  CAST(floor(CAST(m.s2 AS DOUBLE)*CAST(m.s2 AS DOUBLE)
          |    *CAST(m.s2 AS DOUBLE) / (6.0*CAST(m.s1 AS DOUBLE)
          |    *CAST(m.s1 AS DOUBLE)*CAST(m.s1 AS DOUBLE)) * 1000000.0)
          |    AS BIGINT) AS e_tri_micro,
          |  CAST(floor((CAST(tri.t AS DOUBLE)
          |    - CAST(m.s2 AS DOUBLE)*CAST(m.s2 AS DOUBLE)
          |      *CAST(m.s2 AS DOUBLE) / (6.0*CAST(m.s1 AS DOUBLE)
          |      *CAST(m.s1 AS DOUBLE)*CAST(m.s1 AS DOUBLE)))
          |    / sqrt(CAST(m.s2 AS DOUBLE)*CAST(m.s2 AS DOUBLE)
          |      *CAST(m.s2 AS DOUBLE) / (6.0*CAST(m.s1 AS DOUBLE)
          |      *CAST(m.s1 AS DOUBLE)*CAST(m.s1 AS DOUBLE)))
          |    * 1000000.0) AS BIGINT) AS z_micro
          |FROM tri, m
          |""".stripMargin),
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey").distinct()
        val e = li.as("x")
          .join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_suppkey") < col("y.l_suppkey"))
          .groupBy(col("x.l_suppkey").as("a"), col("y.l_suppkey").as("b"))
          .agg(count(lit(1)).as("w")).filter(col("w") >= 6)
          .select("a", "b")
          .localCheckpoint()
        val deg = e.select(col("a").as("v"))
          .unionAll(e.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).cast("long").as("d"))
        val fwd = col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b"))
        val o = e
          .join(broadcast(deg.select(col("v").as("va"), col("d").as("da"))),
            col("va") === col("a"))
          .join(broadcast(deg.select(col("v").as("vb"), col("d").as("db"))),
            col("vb") === col("b"))
          .select(when(fwd, col("a")).otherwise(col("b")).as("src"),
            when(fwd, col("b")).otherwise(col("a")).as("dst"))
          .localCheckpoint()
        val tri = o.as("w1")
          .join(o.as("w2"), col("w2.src") === col("w1.dst"))
          .join(o.as("w3"), col("w3.src") === col("w1.src") &&
            col("w3.dst") === col("w2.dst"))
          .agg(count(lit(1)).cast("long").as("t"))
        val m = deg.agg(count(lit(1)).cast("long").as("nv"),
          sum(col("d")).cast("long").as("s1"),
          sum(col("d") * (col("d") - 1)).cast("long").as("s2"))
        val out = tri.crossJoin(broadcast(m))
          .withColumn("e_d",
            col("s2").cast("double") * col("s2").cast("double") *
              col("s2").cast("double") /
              (lit(6.0d) * col("s1").cast("double") *
                col("s1").cast("double") * col("s1").cast("double")))
          .select(col("nv").as("n_nodes"),
            expr("s1 div 2").cast("long").as("n_edges"),
            col("t").as("triangles"),
            floor(col("e_d") * 1000000.0d).cast("long")
              .as("e_tri_micro"),
            floor((col("t").cast("double") - col("e_d")) /
              sqrt(col("e_d")) * 1000000.0d).cast("long").as("z_micro"))
        H.materialized(out, caches = Nil, checkpoints = Seq(e, o))
      }),

    // Deferred revenue recognition: each order's cents amortize evenly
    // over its service months (order month → last ship month), the
    // integer remainder accruing to the EARLIEST months, so the
    // schedule reconciles to the booked total exactly. Per-order month
    // spans explode via sequence() — bounded fan-out (≤ ~24 months) —
    // then one keyed aggregation to the calendar. The accrual-
    // accounting twin of the cash-basis monthly revenue report.
    Q("orders_revenue_recognition",
      Some(
        """WITH sp AS (SELECT o.o_orderkey,
          |  year(o.o_orderdate)*12 + month(o.o_orderdate) - 1 AS ym0,
          |  CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT) AS cents,
          |  coalesce(year(x.ms)*12 + month(x.ms) - 1,
          |    year(o.o_orderdate)*12 + month(o.o_orderdate) - 1) AS ym1
          |  FROM orders o LEFT JOIN (SELECT l_orderkey, max(l_shipdate)
          |    AS ms FROM lineitem GROUP BY 1) x
          |    ON x.l_orderkey = o.o_orderkey),
          |k AS (SELECT o_orderkey, ym0, cents,
          |  CASE WHEN ym1 >= ym0 THEN ym1 - ym0 + 1 ELSE 1 END AS months
          |  FROM sp),
          |r AS (SELECT k.ym0 + u.i AS ym,
          |  k.cents // k.months
          |    + CASE WHEN u.i < k.cents % k.months THEN 1 ELSE 0 END
          |    AS rec
          |  FROM k, LATERAL unnest(generate_series(0, k.months - 1))
          |    AS u(i))
          |SELECT CAST(ym // 12 AS BIGINT) AS yr,
          |  CAST(ym % 12 + 1 AS BIGINT) AS mon,
          |  CAST(sum(rec) AS BIGINT) AS recognized_cents,
          |  CAST(count(*) AS BIGINT) AS n_order_months
          |FROM r GROUP BY 1, 2 ORDER BY 1, 2
          |""".stripMargin),
      (s, dir) => {
        val lastShip = tbl(s, dir, "lineitem")
          .groupBy(col("l_orderkey")).agg(max(col("l_shipdate")).as("ms"))
        val k = tbl(s, dir, "orders")
          .select(col("o_orderkey"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
              .as("ym0"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
              .as("cents"))
          .join(lastShip, col("l_orderkey") === col("o_orderkey"), "left")
          .select(col("ym0"), col("cents"),
            when(col("ms").isNotNull &&
              (year(col("ms")) * 12 + month(col("ms")) - 1) >= col("ym0"),
              (year(col("ms")) * 12 + month(col("ms")) - 1) - col("ym0")
                + 1).otherwise(1).as("months"))
        k.select(col("ym0"), col("cents"), col("months"),
            explode(sequence(lit(0), col("months") - 1)).as("i"))
          .select((col("ym0") + col("i")).as("ym"),
            (expr("cents div months") +
              when(col("i") < col("cents") % col("months"), 1L)
                .otherwise(0L)).as("rec"))
          .groupBy(expr("ym div 12").cast("long").as("yr"),
            (col("ym") % 12 + 1).cast("long").as("mon"))
          .agg(sum(col("rec")).cast("long").as("recognized_cents"),
            count(lit(1)).cast("long").as("n_order_months"))
          .orderBy("yr", "mon")
      }),

    // Zipf exponent of the corpus token distribution: global token
    // counts, rank by (count desc, token), top 1000 ranks, then the
    // least-squares slope of ln(freq) on ln(rank) — each ln quantized
    // to micro BEFORE the moment sums (HUGEINT/DECIMAL), so the fit is
    // engine-exact. Natural corpora sit near α ≈ 1; drift flags
    // boilerplate or synthetic spam. TopN bounds every post-scan stage.
    Q("corpus_zipf_alpha",
      Some(
        """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t
          |  FROM documents),
          |cnt AS (SELECT t, CAST(count(*) AS BIGINT) AS f FROM tok
          |  WHERE t <> '' GROUP BY 1),
          |rk AS (SELECT f, row_number() OVER (ORDER BY f DESC, t) AS r
          |  FROM cnt),
          |top AS (SELECT CAST(r AS BIGINT) AS r,
          |  CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000.0) AS BIGINT)
          |    AS lx,
          |  CAST(floor(ln(CAST(f AS DOUBLE)) * 1000000.0) AS BIGINT)
          |    AS ly
          |  FROM rk WHERE r <= 1000),
          |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
          |  sum(CAST(lx AS HUGEINT) * lx) AS sxx,
          |  sum(CAST(lx AS HUGEINT) * ly) AS sxy FROM top)
          |SELECT n,
          |  CAST(floor((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
          |    - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
          |    / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
          |    - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * (-1000000.0))
          |    AS BIGINT) AS alpha_micro
          |FROM m
          |""".stripMargin),
      (s, dir) => {
        val cnt = tbl(s, dir, "documents")
          .select(explode(split(col("text"), " ", -1)).as("t"))
          .filter(col("t") =!= "")
          .groupBy("t").agg(count(lit(1)).cast("long").as("f"))
        // TopN first (distributed partial limits), then rank the
        // 1000-row survivor frame — never a full-vocab global window.
        val rk = cnt.orderBy(col("f").desc, col("t")).limit(1000)
          .withColumn("r",
            row_number().over(Window.orderBy(col("f").desc, col("t"))))
        val top = rk
          .select(col("r").cast("long").as("r"),
            floor(log(col("r").cast("double")) * 1000000.0d).cast("long")
              .as("lx"),
            floor(log(col("f").cast("double")) * 1000000.0d).cast("long")
              .as("ly"))
        top.agg(count(lit(1)).cast("long").as("n"),
            sum(col("lx")).cast("long").as("sx"),
            sum(col("ly")).cast("long").as("sy"),
            sum(col("lx").cast("decimal(38,0)") * col("lx"))
              .cast("decimal(38,0)").as("sxx"),
            sum(col("lx").cast("decimal(38,0)") * col("ly"))
              .cast("decimal(38,0)").as("sxy"))
          .select(col("n"),
            floor((col("n").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
              (col("n").cast("double") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")) *
              lit(-1000000.0d)).cast("long").as("alpha_micro"))
      }),

    // Typed-Dataset sessionization: groupByKey(user).mapGroups with
    // case-class encoders — per user, event count, 30-minute-gap
    // session count, and the largest session. The per-group closure
    // sorts its own events (per-user volumes are bounded; a hot-key
    // user would shard by day first) while users spread across
    // executors — the idiomatic typed path when per-entity logic
    // outgrows window functions. Oracle = the standard lag/cumsum
    // window sessionization.
    Q("typed_session_stats",
      Some(
        """WITH g AS (SELECT user_id, ts, event_id,
          |  CASE WHEN lag(ts) OVER w IS NULL
          |    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
          |    THEN 1 ELSE 0 END AS brk
          |  FROM events WINDOW w AS (PARTITION BY user_id
          |    ORDER BY ts, event_id)),
          |sess AS (SELECT user_id,
          |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |    ROWS UNBOUNDED PRECEDING) AS sid
          |  FROM g),
          |per AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n
          |  FROM sess GROUP BY 1, 2)
          |SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
          |  CAST(count(*) AS BIGINT) AS n_sessions,
          |  CAST(max(n) AS BIGINT) AS max_session_events
          |FROM per GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val gapUs = 1800000000L
        H.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_id"))
          .as[SessEv]
          .groupByKey(_.user_id)
          .mapGroups { (u: Long, it: Iterator[SessEv]) =>
            val evs = it.toArray.sortBy(e => (e.ts_us, e.event_id))
            var sessions = 0L
            var cur = 0L
            var maxSess = 0L
            var prev = Long.MinValue
            evs.foreach { e =>
              if (prev == Long.MinValue || e.ts_us - prev > gapUs) {
                sessions += 1; cur = 0L
              }
              cur += 1; if (cur > maxSess) maxSess = cur
              prev = e.ts_us
            }
            SessStat(u, evs.length.toLong, sessions, maxSess)
          }
          .toDF()
          .orderBy("user_id")
      })
  )
}
