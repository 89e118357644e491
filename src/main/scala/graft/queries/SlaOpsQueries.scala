package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Seventy-fourth wave: calendar-aware SLA accounting, cooperative-game
  * attribution, and pricing economics — business-hours latency via a
  * CLOSED-FORM business-minute clock (no calendar explode), exact
  * Shapley channel attribution over the empirical coalition lattice,
  * duplicate-payment pair detection with an explode-to-equi bucket
  * join, and arc price elasticity across discount tiers.
  */
object SlaOpsQueries extends QueryModule {

  /** Business-minute clock B(t): minutes of Mon-Fri 09:00-17:00 UTC
    * elapsed from the epoch to t, in closed form. Epoch day 0 is a
    * Thursday; the 7-day block starting Thursday contains business
    * days at offsets {0,1,4,5,6}, giving the prefix table below. The
    * SLA between two instants is then B(t2)-B(t1) — pure arithmetic
    * per row, no per-day explode, nothing that grows with the span. */
  private def bizSql(us: String): String =
    s"""(( ($us // 86400000000) // 7) * 2400
       |  + [0,480,960,960,960,1440,1920][(($us // 86400000000) % 7) + 1]
       |  + CASE WHEN (($us // 86400000000) % 7) IN (2, 3) THEN 0
       |    ELSE least(greatest(($us % 86400000000) // 60000000, 540),
       |      1020) - 540 END)""".stripMargin.replaceAll("\n", " ")

  private def bizSpark(us: String): String =
    s"""(( ($us div 86400000000) div 7) * 2400
       |  + element_at(array(0,480,960,960,960,1440,1920),
       |      cast((($us div 86400000000) % 7) + 1 as int))
       |  + CASE WHEN (($us div 86400000000) % 7) IN (2, 3) THEN 0
       |    ELSE least(greatest(($us % 86400000000) div 60000000, 540),
       |      1020) - 540 END)""".stripMargin.replaceAll("\n", " ")

  // Shapley coalition weights for n=4 channels, x24: |S|!(3-|S|)!
  private val ShapW = "array(6, 2, 2, 6)" // index |S| = 0..3

  def all: Seq[Q] = Seq(

    // Business-hours SLA from each user's signup to their next
    // purchase, grouped by the signup weekday (0=Mon). The business
    // clock is closed-form, so the measure costs O(1) per pair at any
    // scale — no calendar table, no day-range explode.
    Q("events_sla_business_hours",
      Some(
        s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
           |  FROM events),
           |su AS (SELECT user_id, min(us) AS t1 FROM e
           |  WHERE event_type = 'signup' GROUP BY user_id),
           |pu AS (SELECT e.user_id, min(e.us) AS t2
           |  FROM e JOIN su ON su.user_id = e.user_id
           |  WHERE e.event_type = 'purchase' AND e.us >= su.t1
           |  GROUP BY e.user_id),
           |pair AS (SELECT su.user_id, su.t1, pu.t2,
           |  ${bizSql("pu.t2")} - ${bizSql("su.t1")} AS bmin
           |  FROM su JOIN pu ON pu.user_id = su.user_id)
           |SELECT CAST(((t1 // 86400000000) + 3) % 7 AS BIGINT)
           |    AS signup_dow,
           |  CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(sum(bmin) // count(*) AS BIGINT) AS avg_bmin,
           |  CAST(min(bmin) AS BIGINT) AS min_bmin,
           |  CAST(max(bmin) AS BIGINT) AS max_bmin
           |FROM pair GROUP BY 1 ORDER BY signup_dow
           |""".stripMargin),
      (s, dir) => {
        val e = H.events(s, dir)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .localCheckpoint() // signup pass + purchase pass
        val su = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("us").as("t1"))
        val pu = e.filter(col("event_type") === "purchase")
          .join(su.select(col("user_id").as("u2"), col("t1")),
            col("u2") === col("user_id") && col("us") >= col("t1"))
          .groupBy("user_id").agg(min("us").as("t2"))
        val pair = su.join(pu.select(col("user_id").as("u3"), col("t2")),
            col("u3") === col("user_id"))
          .withColumn("bmin",
            expr(bizSpark("t2")) - expr(bizSpark("t1")))
        pair.groupBy(expr("((t1 div 86400000000) + 3) % 7").cast("long")
            .as("signup_dow"))
          .agg(count(lit(1)).cast("long").as("n_pairs"),
            expr("sum(bmin) div count(*)").cast("long").as("avg_bmin"),
            min("bmin").cast("long").as("min_bmin"),
            max("bmin").cast("long").as("max_bmin"))
          .orderBy("signup_dow")
        match { case out => H.materialized(out, Nil, Seq(e)) }
      }),

    // Exact Shapley attribution over the empirical coalition lattice:
    // each user's pre-purchase channel set is a 4-bit mask over
    // {click, error, signup, view}; v(mask) = observed conversion rate
    // in micro (0 for unobserved cells). phi_i = sum over S not
    // containing i of |S|!(3-|S|)!/4! * (v(S+i) - v(S)) — 64 exact
    // integer terms on a 16-row broadcast lattice; only the mask
    // census touches the fact table.
    Q("events_shapley_attribution",
      Some(
        s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
           |  FROM events),
           |fp AS (SELECT user_id, min(us) AS pt FROM e
           |  WHERE event_type = 'purchase' GROUP BY user_id),
           |pre AS (SELECT e.user_id,
           |  CASE WHEN e.event_type = 'click' THEN 1
           |    WHEN e.event_type = 'error' THEN 2
           |    WHEN e.event_type = 'signup' THEN 4
           |    WHEN e.event_type = 'view' THEN 8 END AS bit,
           |  CASE WHEN fp.user_id IS NULL THEN 0 ELSE 1 END AS conv
           |  FROM e LEFT JOIN fp ON fp.user_id = e.user_id
           |  WHERE e.event_type <> 'purchase'
           |    AND (fp.pt IS NULL OR e.us < fp.pt)),
           |um AS (SELECT user_id, CAST(sum(DISTINCT bit) AS BIGINT)
           |    AS mask, max(conv) AS conv
           |  FROM pre GROUP BY user_id),
           |cell AS (SELECT mask, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(conv) AS BIGINT) AS c FROM um GROUP BY mask),
           |lat AS (SELECT CAST(r.range AS BIGINT) AS m,
           |  coalesce(c * 1000000 // n, 0) AS v
           |  FROM range(16) r LEFT JOIN cell ON cell.mask = r.range),
           |ch AS (SELECT unnest(['click','error','signup','view'])
           |    AS channel, unnest([1, 2, 4, 8]) AS cbit),
           |terms AS (SELECT ch.channel,
           |  [6,2,2,6][CAST(
           |    (s.m & 1) + ((s.m & 2) // 2) + ((s.m & 4) // 4)
           |      + ((s.m & 8) // 8) AS INTEGER) + 1]
           |    * (w.v - s.v) AS t
           |  FROM ch JOIN lat s ON (s.m & ch.cbit) = 0
           |  JOIN lat w ON w.m = s.m + ch.cbit)
           |SELECT channel, CAST(sum(t) AS BIGINT) AS phi_x24_micro,
           |  CAST(sum(t) // 24 AS BIGINT) AS phi_micro
           |FROM terms GROUP BY channel ORDER BY channel
           |""".stripMargin),
      (s, dir) => {
        val e = H.events(s, dir)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .localCheckpoint() // purchase pass + channel pass
        val fp = e.filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(min("us").as("pt"))
        val um = e.filter(col("event_type") =!= "purchase")
          .join(fp.select(col("user_id").as("u2"), col("pt")),
            col("u2") === col("user_id"), "left")
          .filter(col("pt").isNull || col("us") < col("pt"))
          .select(col("user_id"),
            expr("CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2" +
              " WHEN 'signup' THEN 4 WHEN 'view' THEN 8 END").as("bit"),
            when(col("pt").isNull, 0L).otherwise(1L).as("conv"))
          .groupBy("user_id")
          .agg(sum_distinct(col("bit")).cast("long").as("mask"),
            max("conv").as("conv"))
        val cell = um.groupBy("mask")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("conv").cast("long").as("c"))
        val lat = s.range(16).select(col("id").as("m"))
          .join(cell, col("mask") === col("m"), "left")
          .select(col("m"),
            coalesce(expr("c * 1000000 div n"), lit(0L)).as("v"))
          .localCheckpoint() // S side + S+i side of the lattice join
        val ch = s.range(4).select(
          expr("element_at(array('click','error','signup','view'), " +
            "cast(id as int) + 1)").as("channel"),
          expr("element_at(array(1L,2L,4L,8L), cast(id as int) + 1)")
            .as("cbit"))
        val terms = ch
          .join(lat.select(col("m").as("sm"), col("v").as("sv")),
            expr("(sm & cbit) = 0"))
          .join(lat.select(col("m").as("wm"), col("v").as("wv")),
            expr("wm = sm + cbit"))
          .select(col("channel"),
            (expr(s"element_at($ShapW, cast((sm & 1) + ((sm & 2) div 2)" +
              " + ((sm & 4) div 4) + ((sm & 8) div 8) as int) + 1)") *
              (col("wv") - col("sv"))).as("t"))
        val out = terms.groupBy("channel")
          .agg(sum("t").cast("long").as("phi_x24_micro"),
            expr("sum(t) div 24").cast("long").as("phi_micro"))
          .orderBy("channel")
        H.materialized(out, Nil, Seq(e, lat))
      }),

    // Duplicate-payment screen: orders by the same customer within 7
    // days for amounts within $5000. BOTH tolerances join as EQUI keys
    // — (custkey, 7-day bucket, $5000 bucket) with the probe side
    // exploded to its 3x3 candidate buckets, then the exact radius
    // filter — never a nested-loop band join. Census + 10 largest
    // suspects by amount.
    Q("dq_duplicate_payments",
      Some(
        """WITH o AS (SELECT o_orderkey AS ok, o_custkey AS ck,
          |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
          |  CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP))
          |    // 86400000000 AS BIGINT) AS dy FROM orders),
          |probe AS (SELECT ok, ck, cents, dy,
          |  (dy // 7) + d.doff AS dbk, (cents // 500000) + a.aoff AS abk
          |  FROM o
          |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS doff) d
          |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS aoff) a),
          |build AS (SELECT ok, ck, cents, dy, dy // 7 AS dbk,
          |  cents // 500000 AS abk FROM o),
          |pairs AS (SELECT DISTINCT b.ck, p.ok AS ok1, b.ok AS ok2,
          |  p.cents AS cents1, b.cents AS cents2,
          |  abs(b.dy - p.dy) AS day_gap
          |  FROM probe p JOIN build b ON b.ck = p.ck
          |    AND b.dbk = p.dbk AND b.abk = p.abk
          |  WHERE p.ok < b.ok AND abs(b.dy - p.dy) <= 7
          |    AND abs(b.cents - p.cents) <= 500000),
          |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
          |  CAST(count(DISTINCT ck) AS BIGINT) AS n_customers
          |  FROM pairs),
          |top AS (SELECT *, row_number() OVER (ORDER BY cents2 DESC,
          |  ok1, ok2) AS rk FROM pairs)
          |SELECT CAST(top.rk AS BIGINT) AS rk, top.ck AS custkey,
          |  top.ok1, top.ok2, top.cents1, top.cents2,
          |  CAST(top.day_gap AS BIGINT) AS day_gap,
          |  tot.n_pairs, tot.n_customers
          |FROM top, tot WHERE top.rk <= 10 ORDER BY rk
          |""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val o = tbl(s, dir, "orders")
          .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
              .as("cents"),
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
              " div 86400000000").cast("long").as("dy"))
          .localCheckpoint() // probe side + build side
        val probe = o
          .crossJoin(s.range(-1, 2).select(col("id").as("doff")))
          .crossJoin(s.range(-1, 2).select(col("id").as("aoff")))
          .select(col("ok").as("ok1"), col("ck").as("ck1"),
            col("cents").as("cents1"), col("dy").as("dy1"),
            (expr("dy div 7") + col("doff")).as("dbk"),
            (expr("cents div 500000") + col("aoff")).as("abk"))
        val build = o.withColumn("dbk2", expr("dy div 7"))
          .withColumn("abk2", expr("cents div 500000"))
        val pairs = probe.join(build,
            col("ck") === col("ck1") && col("dbk2") === col("dbk") &&
              col("abk2") === col("abk"))
          .filter(col("ok1") < col("ok") &&
            abs(col("dy") - col("dy1")) <= 7 &&
            abs(col("cents") - col("cents1")) <= 500000)
          .select(col("ck"), col("ok1"), col("ok").as("ok2"),
            col("cents1"), col("cents").as("cents2"),
            abs(col("dy") - col("dy1")).as("day_gap"))
          .distinct()
          .localCheckpoint() // census + top-10
        val tot = pairs.agg(count(lit(1)).cast("long").as("n_pairs"),
          countDistinct("ck").cast("long").as("n_customers"))
        val top = pairs.orderBy(col("cents2").desc, col("ok1"), col("ok2"))
          .limit(10)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("cents2").desc, col("ok1"), col("ok2")))
            .cast("long"))
        val out = top.crossJoin(broadcast(tot))
          .select(col("rk"), col("ck").as("custkey"), col("ok1"),
            col("ok2"), col("cents1"), col("cents2"),
            col("day_gap").cast("long"), col("n_pairs"),
            col("n_customers"))
          .orderBy("rk")
        H.materialized(out, Nil, Seq(o, pairs))
      }),

    // Arc price elasticity of demand across discount tiers: effective
    // price index 100-pct vs mean quantity per tier; elasticity between
    // adjacent tiers by the midpoint formula, sign applied explicitly
    // so every integer division sees non-negative operands (Spark div
    // truncates toward zero, DuckDB // floors — they only agree >= 0).
    Q("orders_price_elasticity",
      Some(
        """WITH t AS (SELECT CAST(round(l_discount * 100, 0) AS BIGINT)
          |    AS tier,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
          |  FROM lineitem GROUP BY 1),
          |q AS (SELECT tier, n, 100 - tier AS px100,
          |  sq * 1000000 // n AS q_micro FROM t),
          |l AS (SELECT tier, n, px100, q_micro,
          |  lag(px100) OVER (ORDER BY tier) AS pp,
          |  lag(q_micro) OVER (ORDER BY tier) AS pq
          |  FROM q)
          |SELECT tier, n, CAST(px100 AS BIGINT) AS px100, q_micro,
          |  CAST(CASE WHEN q_micro >= pq THEN -1 ELSE 1 END
          |    * (abs(q_micro - pq) * (pp + px100) * 1000000
          |       // ((q_micro + pq) * (pp - px100))) AS BIGINT)
          |    AS elasticity_micro
          |FROM l WHERE pp IS NOT NULL ORDER BY tier
          |""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val t = tbl(s, dir, "lineitem")
          .groupBy(round(col("l_discount") * 100, 0).cast("long")
            .as("tier"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(col("l_quantity").cast("long")).cast("long").as("sq"))
          .select(col("tier"), col("n"), (lit(100) - col("tier"))
            .as("px100"), expr("sq * 1000000 div n").as("q_micro"))
        // tier frame: <= 11 rows, the unpartitioned lag is bounded
        t.withColumn("pp", lag("px100", 1).over(Window.orderBy("tier")))
          .withColumn("pq", lag("q_micro", 1).over(Window.orderBy("tier")))
          .filter(col("pp").isNotNull)
          .select(col("tier"), col("n"), col("px100").cast("long"),
            col("q_micro"),
            (when(col("q_micro") >= col("pq"), -1L).otherwise(1L) *
              expr("abs(q_micro - pq) * (pp + px100) * 1000000" +
                " div ((q_micro + pq) * (pp - px100))")).cast("long")
              .as("elasticity_micro"))
          .orderBy("tier")
      }))
}
