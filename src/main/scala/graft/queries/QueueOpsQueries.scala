package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Seventy-first wave: queueing, topology, and lifecycle economics —
  * FIFO waiting times by the Lindley recursion in closed form (prefix
  * minus running-min prefix: one partitioned window pass, NO
  * sequential fold), rich-club coefficients, scalable ID-gap audit
  * (bucketed so no global window), and cohort LTV projection with an
  * exact geometric tail.
  */
object QueueOpsQueries extends QueryModule {

  // Σ_{j=1..12} 3^j * 4^(12-j): the exact numerator of the geometric
  // tail Σ (3/4)^j over denominator 4^12
  private val GeoNum: Long =
    (1 to 12).map(j => math.pow(3, j).toLong * math.pow(4, 12 - j).toLong).sum
  private val GeoDen: Long = 16777216L // 4^12

  def all: Seq[Q] = Seq(

    // Single-server FIFO waiting time per event type at 80% target
    // utilization: service time = 0.8 * mean interarrival. The Lindley
    // recursion W(n+1) = max(0, W(n) + S - A(n)) collapses to
    // W(n) = P(n) - min_{k<=n} P(k) over the prefix sums of S - A —
    // a partitioned window pass instead of an inherently-serial fold,
    // which is what makes the queueing audit runnable at 100 TB.
    Q("events_queue_wait",
      Some(
        """WITH a AS (SELECT event_type AS t, epoch_us(ts) AS us,
          |  event_id FROM events),
          |svc AS (SELECT t, CAST(count(*) AS BIGINT) AS n,
          |  CAST(8 * (max(us) - min(us)) // (10 * (count(*) - 1))
          |    AS BIGINT) AS s
          |  FROM a GROUP BY t),
          |seq AS (SELECT a.t, a.us, svc.s, svc.n,
          |  CAST(row_number() OVER (PARTITION BY a.t
          |    ORDER BY a.us, a.event_id) AS BIGINT) AS rn,
          |  lag(a.us) OVER (PARTITION BY a.t
          |    ORDER BY a.us, a.event_id) AS prev
          |  FROM a JOIN svc ON svc.t = a.t),
          |u AS (SELECT t, s, n, rn,
          |  CASE WHEN prev IS NULL THEN 0 ELSE s - (us - prev) END
          |    AS du FROM seq),
          |p AS (SELECT t, s, n, rn,
          |  CAST(sum(du) OVER (PARTITION BY t ORDER BY rn) AS BIGINT)
          |    AS pre FROM u),
          |w AS (SELECT t, s, n,
          |  pre - min(pre) OVER (PARTITION BY t ORDER BY rn) AS wait
          |  FROM p)
          |SELECT t AS event_type, n, s AS service_us,
          |  CAST(sum(wait) // n AS BIGINT) AS avg_wait_us,
          |  CAST(max(wait) AS BIGINT) AS max_wait_us,
          |  CAST(sum(CASE WHEN wait > 0 THEN 1 ELSE 0 END) * 1000000
          |    // n AS BIGINT) AS waiting_micro
          |FROM w GROUP BY t, n, s ORDER BY event_type
          |""".stripMargin),
      (s, dir) => {
        val a = H.events(s, dir)
          .select(col("event_type").as("t"),
            unix_micros(col("ts")).as("us"), col("event_id"))
          .localCheckpoint() // service-rate pass + the window pass
        val svc = a.groupBy("t")
          .agg(count(lit(1)).cast("long").as("n"),
            expr("8 * (max(us) - min(us)) div (10 * (count(*) - 1))")
              .cast("long").as("svc"))
        val ord = Window.partitionBy("t").orderBy("us", "event_id")
        val w = a.join(svc.select(col("t").as("t2"), col("n"),
            col("svc")), col("t2") === col("t"))
          .withColumn("prev", lag("us", 1).over(ord))
          .withColumn("du", when(col("prev").isNull, 0L)
            .otherwise(col("svc") - (col("us") - col("prev"))))
          .withColumn("pre", sum("du").over(
            ord.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
          .withColumn("wait", col("pre") - min("pre").over(
            ord.rowsBetween(Window.unboundedPreceding, 0)))
        val out = w.groupBy(col("t").as("event_type"), col("n"),
            col("svc").as("service_us"))
          .agg(expr("sum(wait) div n").cast("long").as("avg_wait_us"),
            max("wait").cast("long").as("max_wait_us"),
            expr("sum(CASE WHEN wait > 0 THEN 1 ELSE 0 END) * 1000000 div n")
              .cast("long").as("waiting_micro"))
          .orderBy("event_type")
        H.materialized(out, caches = Nil, checkpoints = Seq(a))
      }),

    // Rich-club coefficient of the co-purchase graph at degree
    // thresholds 2/4/8: among nodes with degree > k, the realized
    // fraction of possible edges — do the hubs preferentially
    // interconnect? Exact integer census, one degree frame reused
    // across thresholds.
    Q("graph_rich_club",
      Some(
        """WITH li AS MATERIALIZED (
          |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          |  FROM lineitem WHERE l_partkey < 60),
          |ed AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
          |deg AS MATERIALIZED (SELECT v, CAST(count(*) AS BIGINT) AS d
          |  FROM (SELECT u AS v FROM ed UNION ALL SELECT v FROM ed) x
          |  GROUP BY v),
          |ks AS (SELECT unnest([2, 4, 8]) AS k),
          |club AS (SELECT ks.k, CAST(count(*) AS BIGINT) AS nk
          |  FROM ks JOIN deg ON deg.d > ks.k GROUP BY ks.k),
          |ce AS (SELECT ks.k, CAST(count(*) AS BIGINT) AS ek
          |  FROM ks JOIN ed ON true
          |  JOIN deg du ON du.v = ed.u AND du.d > ks.k
          |  JOIN deg dv ON dv.v = ed.v AND dv.d > ks.k
          |  GROUP BY ks.k)
          |SELECT CAST(c.k AS BIGINT) AS k, c.nk,
          |  coalesce(ce.ek, 0) AS club_edges,
          |  CASE WHEN c.nk >= 2 THEN 2 * coalesce(ce.ek, 0) * 1000000
          |    // (c.nk * (c.nk - 1)) ELSE 0 END AS phi_micro
          |FROM club c LEFT JOIN ce ON ce.k = c.k ORDER BY k
          |""".stripMargin),
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
          .filter(col("l_partkey") < 60)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
          .localCheckpoint() // both 2-path sides
        val ed = li.join(
            li.select(col("ok").as("ok2"), col("pk").as("pk2")),
            col("ok") === col("ok2") && col("pk") < col("pk2"))
          .select(col("pk").as("u"), col("pk2").as("v"))
          .distinct()
          .localCheckpoint() // degree census + club-edge census
        val deg = ed.select(col("u").as("vx"))
          .union(ed.select(col("v").as("vx")))
          .groupBy("vx").agg(count(lit(1)).cast("long").as("d"))
          .localCheckpoint() // joined on both endpoints x 3 thresholds
        val ks = s.range(0, 3)
          .select(expr("element_at(array(2L, 4L, 8L), CAST(id AS INT) + 1)")
            .as("k"))
        val club = ks.join(deg, col("d") > col("k"))
          .groupBy("k").agg(count(lit(1)).cast("long").as("nk"))
        val ce = ks.crossJoin(ed)
          .join(deg.select(col("vx").as("cu"), col("d").as("du")),
            col("cu") === col("u"))
          .join(deg.select(col("vx").as("cv"), col("d").as("dv")),
            col("cv") === col("v"))
          .filter(col("du") > col("k") && col("dv") > col("k"))
          .groupBy(col("k").as("k2"))
          .agg(count(lit(1)).cast("long").as("ek"))
        val out = club.join(ce, col("k2") === col("k"), "left")
          .select(col("k"), col("nk"),
            coalesce(col("ek"), lit(0L)).as("club_edges"),
            when(col("nk") >= 2,
              expr("2 * coalesce(ek, 0L) * 1000000 div (nk * (nk - 1))"))
              .otherwise(0L).as("phi_micro"))
          .orderBy("k")
        H.materialized(out, caches = Nil,
          checkpoints = Seq(li, ed, deg))
      }),

    // ID-gap audit over o_orderkey WITHOUT a global sort: keys bucket
    // by div 4096; intra-bucket gaps come from a PARTITIONED lead
    // window, inter-bucket gaps from the (small) bucket-summary lead.
    // Every missing range is one or the other, so the census is
    // complete while every shuffle stays keyed — the shape that
    // survives a 100x scale-up. Output: the 10 widest gaps plus the
    // global census.
    Q("dq_id_gap_islands",
      Some(
        """WITH k AS (SELECT DISTINCT o_orderkey AS id FROM orders),
          |b AS (SELECT id, id // 4096 AS bk FROM k),
          |intra AS (SELECT id + 1 AS gs, nxt - 1 AS ge
          |  FROM (SELECT id, bk, lead(id) OVER (PARTITION BY bk
          |    ORDER BY id) AS nxt FROM b) x
          |  WHERE nxt IS NOT NULL AND nxt > id + 1),
          |bs AS (SELECT bk, min(id) AS mn, max(id) AS mx
          |  FROM b GROUP BY bk),
          |inter AS (SELECT mx + 1 AS gs, nmn - 1 AS ge
          |  FROM (SELECT bk, mx, lead(mn) OVER (ORDER BY bk) AS nmn
          |    FROM bs) y
          |  WHERE nmn IS NOT NULL AND nmn > mx + 1),
          |gaps AS (SELECT gs, ge, ge - gs + 1 AS glen
          |  FROM (SELECT * FROM intra UNION ALL SELECT * FROM inter) g),
          |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_gaps,
          |  CAST(coalesce(sum(glen), 0) AS BIGINT) AS missing
          |  FROM gaps),
          |top AS (SELECT gs, ge, glen, row_number() OVER
          |  (ORDER BY glen DESC, gs) AS rk FROM gaps)
          |SELECT CAST(top.rk AS BIGINT) AS rk,
          |  CAST(top.gs AS BIGINT) AS gap_start,
          |  CAST(top.ge AS BIGINT) AS gap_end,
          |  CAST(top.glen AS BIGINT) AS gap_len,
          |  tot.n_gaps, tot.missing
          |FROM top, tot WHERE top.rk <= 10 ORDER BY rk
          |""".stripMargin),
      (s, dir) => {
        val b = tbl(s, dir, "orders")
          .select(col("o_orderkey").as("id")).distinct()
          .withColumn("bk", expr("id div 4096"))
          .localCheckpoint() // intra-gap window + bucket summary
        val intra = b
          .withColumn("nxt", lead("id", 1).over(
            Window.partitionBy("bk").orderBy("id")))
          .filter(col("nxt").isNotNull && col("nxt") > col("id") + 1)
          .select((col("id") + 1).as("gs"), (col("nxt") - 1).as("ge"))
        val bs = b.groupBy("bk")
          .agg(min("id").as("mn"), max("id").as("mx"))
        // bucket summary is |keys|/4096 rows: the unpartitioned lead
        // window here is a bounded frame, not a data-scale sort
        val inter = bs
          .withColumn("nmn", lead("mn", 1).over(Window.orderBy("bk")))
          .filter(col("nmn").isNotNull && col("nmn") > col("mx") + 1)
          .select((col("mx") + 1).as("gs"), (col("nmn") - 1).as("ge"))
        val gaps = intra.union(inter)
          .withColumn("glen", col("ge") - col("gs") + 1)
          .localCheckpoint() // census + top-10 rank
        val tot = gaps.agg(count(lit(1)).cast("long").as("n_gaps"),
          coalesce(sum("glen"), lit(0L)).cast("long").as("missing"))
        val top = gaps.orderBy(col("glen").desc, col("gs")).limit(10)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("glen").desc, col("gs"))).cast("long"))
        val out = top.crossJoin(broadcast(tot))
          .select(col("rk"), col("gs").as("gap_start"),
            col("ge").as("gap_end"), col("glen").as("gap_len"),
            col("n_gaps"), col("missing"))
          .orderBy("rk")
        H.materialized(out, caches = Nil, checkpoints = Seq(b, gaps))
      }),

    // Cohort LTV projection: customers cohort by first-order month of
    // 1995; observed monthly revenue plus a geometric tail at
    // retention 3/4 projected off the last observed month — the tail
    // multiplier enters as the EXACT fraction sum(3^j*4^(12-j))/4^12,
    // so the projection is pure integer arithmetic.
    Q("orders_ltv_projection",
      Some(
        s"""WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
           |  CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
           |  FROM orders WHERE o_orderdate BETWEEN DATE '1995-01-01'
           |    AND DATE '1995-12-31'),
           |fc AS (SELECT o_custkey,
           |  CAST(min(strftime(o_orderdate, '%m')::INTEGER) AS BIGINT)
           |    AS cohort FROM o GROUP BY o_custkey),
           |rev AS (SELECT fc.cohort,
           |  CAST(strftime(o.o_orderdate, '%m')::INTEGER AS BIGINT)
           |    - fc.cohort AS offs,
           |  CAST(sum(o.cents) AS BIGINT) AS cents
           |  FROM o JOIN fc ON fc.o_custkey = o.o_custkey
           |  GROUP BY 1, 2),
           |agg AS (SELECT cohort,
           |  CAST(count(*) AS BIGINT) AS months_observed,
           |  CAST(sum(cents) AS BIGINT) AS observed_cents,
           |  CAST(max(CASE WHEN offs = (SELECT max(offs) FROM rev r2
           |    WHERE r2.cohort = rev.cohort) THEN cents END) AS BIGINT)
           |    AS last_cents
           |  FROM rev GROUP BY cohort)
           |SELECT cohort, months_observed, observed_cents,
           |  last_cents * $GeoNum // $GeoDen AS projected_tail_cents,
           |  observed_cents + last_cents * $GeoNum // $GeoDen
           |    AS ltv_cents
           |FROM agg ORDER BY cohort
           |""".stripMargin),
      (s, dir) => {
        val o = tbl(s, dir, "orders")
          .filter(col("o_orderdate").between("1995-01-01", "1995-12-31"))
          .select(col("o_custkey"),
            date_format(col("o_orderdate"), "M").cast("long").as("m"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
              .as("cents"))
          .localCheckpoint() // cohort assignment + revenue pass
        val fc = o.groupBy("o_custkey").agg(min("m").as("cohort"))
        val rev = o.join(fc.select(col("o_custkey").as("ck"),
            col("cohort")), col("ck") === col("o_custkey"))
          .groupBy(col("cohort"), (col("m") - col("cohort")).as("offs"))
          .agg(sum("cents").cast("long").as("cents"))
          .localCheckpoint() // max-offset pick + the aggregate
        val lastOff = rev.groupBy(col("cohort").as("c2"))
          .agg(max("offs").as("mo"))
        val out = rev.join(lastOff, col("c2") === col("cohort"))
          .groupBy("cohort")
          .agg(count(lit(1)).cast("long").as("months_observed"),
            sum("cents").cast("long").as("observed_cents"),
            max(when(col("offs") === col("mo"), col("cents")))
              .cast("long").as("last_cents"))
          .select(col("cohort"), col("months_observed"),
            col("observed_cents"),
            expr(s"last_cents * $GeoNum div $GeoDen")
              .as("projected_tail_cents"),
            expr(s"observed_cents + last_cents * $GeoNum div $GeoDen")
              .as("ltv_cents"))
          .orderBy("cohort")
        H.materialized(out, caches = Nil, checkpoints = Seq(o, rev))
      }))
}
