package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Hundred-eighth wave: chain dynamics and spread diagnostics — the
  * Markov mixing profile (total-variation distance of P, P², P⁴ from
  * the P⁸ reference via micro-quantized matrix squarings), the
  * bullwhip ratio (order-quantity variance amplification over shipped
  * demand, the supply-chain whip), and Bartlett's test for equal
  * variances across priorities (the parametric sibling of wave 85's
  * Brown-Forsythe).
  *
  * Exactness: each matrix squaring floors every entry to micro before
  * the next (a defined quantized chain both engines replay on the
  * |types|² frame); bullwhip is a cross-multiplied integer ratio of
  * CV²s; Bartlett's log terms floor to micro per group pre-sum.
  */
object MixingOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Markov mixing profile: the session chain's k-step transition
    // matrices P, P², P⁴ (micro-quantized squarings — floor after
    // every entry, so the chain is reproducible) measured against P⁸
    // as the near-stationary reference; TV_k = max-row ½Σ|Δ|. How many
    // steps until user behavior forgets its start state — the memory
    // horizon a sequence model actually has to capture. The heavy
    // stage is the same one lag window; squarings live on 25-row
    // frames.
    Q("events_markov_mixing",
      Some(
        """WITH t AS (SELECT lag(event_type) OVER (PARTITION BY user_id
          |    ORDER BY ts, event_id) AS i, event_type AS j FROM events),
          |c AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n FROM t
          |  WHERE i IS NOT NULL GROUP BY 1, 2),
          |rt AS (SELECT i, CAST(sum(n) AS BIGINT) AS r FROM c
          |  GROUP BY 1),
          |p1 AS (SELECT c.i, c.j, c.n * 1000000 // rt.r AS p
          |  FROM c JOIN rt ON rt.i = c.i),
          |p2 AS (SELECT a.i, b.j,
          |  CAST(sum(a.p * b.p) // 1000000 AS BIGINT) AS p
          |  FROM p1 a JOIN p1 b ON b.i = a.j GROUP BY 1, 2),
          |p4 AS (SELECT a.i, b.j,
          |  CAST(sum(a.p * b.p) // 1000000 AS BIGINT) AS p
          |  FROM p2 a JOIN p2 b ON b.i = a.j GROUP BY 1, 2),
          |p8 AS (SELECT a.i, b.j,
          |  CAST(sum(a.p * b.p) // 1000000 AS BIGINT) AS p
          |  FROM p4 a JOIN p4 b ON b.i = a.j GROUP BY 1, 2),
          |lng AS (SELECT 1 AS k, i, j, p FROM p1
          |  UNION ALL SELECT 2, i, j, p FROM p2
          |  UNION ALL SELECT 4, i, j, p FROM p4),
          |d AS (SELECT l.k, l.i,
          |  CAST(sum(abs(l.p - p8.p)) AS BIGINT) AS sad
          |  FROM lng l JOIN p8 ON p8.i = l.i AND p8.j = l.j
          |  GROUP BY 1, 2)
          |SELECT CAST(k AS BIGINT) AS k_steps,
          |  CAST(max(sad) // 2 AS BIGINT) AS tv_max_micro
          |FROM d GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val c = H.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"))
          .withColumn("i", lag("event_type", 1).over(w))
          .withColumnRenamed("event_type", "j")
          .filter(col("i").isNotNull)
          .groupBy("i", "j").agg(count(lit(1)).cast("long").as("n"))
        val rt = c.groupBy("i").agg(sum(col("n")).cast("long").as("r"))
        val p1 = c.join(rt, Seq("i"))
          .select(col("i"), col("j"),
            expr("n * 1000000 div r").as("p"))
          .localCheckpoint()
        def square(p: org.apache.spark.sql.DataFrame) = p.as("a")
          .join(p.as("b"), col("b.i") === col("a.j"))
          .groupBy(col("a.i").as("i"), col("b.j").as("j"))
          .agg(expr("CAST(sum(a.p * b.p) div 1000000 AS BIGINT)")
            .as("p"))
          .localCheckpoint()
        val p2 = square(p1)
        val p4 = square(p2)
        val p8 = square(p4)
        val lng = p1.select(lit(1).as("k"), col("i"), col("j"), col("p"))
          .unionByName(p2.select(lit(2).as("k"), col("i"), col("j"),
            col("p")))
          .unionByName(p4.select(lit(4).as("k"), col("i"), col("j"),
            col("p")))
        val out = lng
          .join(p8.select(col("i"), col("j"), col("p").as("p8")),
            Seq("i", "j"))
          .groupBy("k", "i")
          .agg(sum(abs(col("p") - col("p8"))).cast("long").as("sad"))
          .groupBy(col("k").cast("long").as("k_steps"))
          .agg(expr("max(sad) div 2").cast("long").as("tv_max_micro"))
          .orderBy("k_steps")
        H.materialized(out, Nil, Seq(p1, p2, p4, p8))
      }),

    // Bullwhip ratio: variance amplification of monthly ORDERED
    // quantity over monthly SHIPPED quantity — CV²(orders by order
    // month) / CV²(shipments by ship month) in milli, every moment an
    // exact integer, the final ratio cross-multiplied. > 1000 means
    // the order signal whipsaws harder than real demand — the
    // inventory-instability klaxon.
    Q("supply_bullwhip_ratio",
      Some(
        """WITH om AS (SELECT year(o.o_orderdate)*12
          |    + month(o.o_orderdate) AS ym,
          |  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
          |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          |  GROUP BY 1),
          |sm AS (SELECT year(l_shipdate)*12 + month(l_shipdate) AS ym,
          |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
          |  FROM lineitem GROUP BY 1),
          |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(q) AS BIGINT) AS s, sum(CAST(q AS HUGEINT)*q) AS qq
          |  FROM om),
          |ms AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(q) AS BIGINT) AS s, sum(CAST(q AS HUGEINT)*q) AS qq
          |  FROM sm)
          |SELECT mo.n AS order_months, ms.n AS ship_months,
          |  CAST(floor(((CAST(mo.qq AS DOUBLE)*CAST(mo.n AS DOUBLE)
          |      - CAST(mo.s AS DOUBLE)*CAST(mo.s AS DOUBLE))
          |    / (CAST(mo.s AS DOUBLE)*CAST(mo.s AS DOUBLE)))
          |    / ((CAST(ms.qq AS DOUBLE)*CAST(ms.n AS DOUBLE)
          |      - CAST(ms.s AS DOUBLE)*CAST(ms.s AS DOUBLE))
          |    / (CAST(ms.s AS DOUBLE)*CAST(ms.s AS DOUBLE)))
          |    * 1000.0) AS BIGINT) AS bullwhip_milli
          |FROM mo, ms
          |""".stripMargin),
      (s, dir) => {
        val om = tbl(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"))
          .join(tbl(s, dir, "orders")
              .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy((year(col("o_orderdate")) * 12 +
            month(col("o_orderdate"))).as("ym"))
          .agg(sum(col("l_quantity").cast("long")).cast("long").as("q"))
        val sm = tbl(s, dir, "lineitem")
          .groupBy((year(col("l_shipdate")) * 12 +
            month(col("l_shipdate"))).as("ym"))
          .agg(sum(col("l_quantity").cast("long")).cast("long").as("q"))
        def mom(df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).cast("long").as("n"),
            sum(col("q")).cast("long").as("s"),
            sum(col("q").cast("decimal(38,0)") * col("q"))
              .cast("decimal(38,0)").as("qq"))
        val mo = mom(om)
        val ms = mom(sm)
          .select(col("n").as("n2"), col("s").as("s2"),
            col("qq").as("qq2"))
        mo.crossJoin(broadcast(ms))
          .select(col("n").as("order_months"),
            col("n2").as("ship_months"),
            floor(((col("qq").cast("double") * col("n").cast("double") -
              col("s").cast("double") * col("s").cast("double")) /
              (col("s").cast("double") * col("s").cast("double"))) /
              ((col("qq2").cast("double") * col("n2").cast("double") -
                col("s2").cast("double") * col("s2").cast("double")) /
                (col("s2").cast("double") * col("s2").cast("double"))) *
              1000.0d).cast("long").as("bullwhip_milli"))
      }),

    // Bartlett's test for equal variances across the five priorities —
    // the parametric complement to Brown-Forsythe: per-group variances
    // from HUGEINT moments, each ln term micro-floored pre-sum, the
    // correction factor one final chain. Sensitive to non-normality by
    // design (pair with stats_jarque_bera to decide which to trust).
    Q("stats_bartlett_test",
      Some(
        """WITH b AS (SELECT o_orderpriority AS g,
          |  CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) // 1000 AS v
          |  FROM orders),
          |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(v) AS BIGINT) AS s, sum(CAST(v AS HUGEINT)*v) AS q
          |  FROM b GROUP BY 1),
          |z AS (SELECT g, n,
          |  (CAST(q AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)
          |    /CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS s2
          |  FROM m),
          |t AS (SELECT CAST(sum(m.n) AS BIGINT) AS nn,
          |  CAST(count(*) AS BIGINT) AS k,
          |  CAST(sum(CAST(floor((CAST(m.n AS DOUBLE) - 1.0) * ln(z.s2)
          |    * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_lnv_micro,
          |  CAST(sum(m.q*1000 - CAST(m.s AS HUGEINT)*m.s*1000 // m.n)
          |    AS BIGINT) AS pooled_milli,
          |  CAST(sum(1000000000 // (m.n - 1)) AS BIGINT) AS inv_nano
          |  FROM m JOIN z ON z.g = m.g)
          |SELECT nn AS n_total, k AS n_groups,
          |  CAST(floor(((CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))
          |    * ln(CAST(pooled_milli AS DOUBLE) / 1000.0
          |      / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))
          |    - CAST(sum_lnv_micro AS DOUBLE) / 1000000.0)
          |    / (1.0 + (CAST(inv_nano AS DOUBLE)/1000000000.0
          |      - 1.0/(CAST(nn AS DOUBLE)
          |      - CAST(k AS DOUBLE))) / (3.0*(CAST(k AS DOUBLE) - 1.0)))
          |    * 1000000.0) AS BIGINT) AS bartlett_micro
          |FROM t
          |""".stripMargin),
      (s, dir) => {
        val b = tbl(s, dir, "orders")
          .select(col("o_orderpriority").as("g"),
            expr("CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)" +
              " div 1000").as("v"))
        val m = b.groupBy("g")
          .agg(count(lit(1)).cast("long").as("n"),
            sum(col("v")).cast("long").as("s"),
            sum(col("v").cast("decimal(38,0)") * col("v"))
              .cast("decimal(38,0)").as("q"))
        val z = m.select(col("g"), col("n"),
          ((col("q").cast("double") - col("s").cast("double") *
            col("s").cast("double") / col("n").cast("double")) /
            (col("n").cast("double") - 1.0d)).as("s2"))
        val t = m.join(z.select(col("g"), col("s2")), Seq("g"))
          .agg(sum(col("n")).cast("long").as("nn"),
            count(lit(1)).cast("long").as("k"),
            sum(floor((col("n").cast("double") - 1.0d) *
              log(col("s2")) * 1000000.0d).cast("long")).cast("long")
              .as("sum_lnv_micro"),
            sum(expr(
              "q*1000 - CAST(s AS DECIMAL(38,0))*s*1000 div n"))
              .cast("long").as("pooled_milli"),
            sum(expr("1000000000 div (n - 1)")).cast("long")
              .as("inv_nano"))
        t.select(col("nn").as("n_total"), col("k").as("n_groups"),
          floor(((col("nn").cast("double") - col("k").cast("double")) *
            log(col("pooled_milli").cast("double") / 1000.0d /
              (col("nn").cast("double") - col("k").cast("double"))) -
            col("sum_lnv_micro").cast("double") / 1000000.0d) /
            (lit(1.0d) + (col("inv_nano").cast("double") /
              1000000000.0d - lit(1.0d) /
              (col("nn").cast("double") - col("k").cast("double"))) /
              (lit(3.0d) * (col("k").cast("double") - 1.0d))) *
            1000000.0d).cast("long").as("bartlett_micro"))
      })
  )
}
