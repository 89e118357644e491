package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Sixty-first wave: financial reconciliation, weighted link prediction,
  * and inventory classification. The reconciliation recomputes order
  * totals from lines in exact scaled integers; resource allocation is
  * the division-friendly (1/deg, no log) member of the common-neighbor
  * family; ABC×XYZ crosses the revenue Pareto with demand variability
  * (variance from exact power sums, one sqrt at the end).
  */
object ReconcileOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Reconcile o_totalprice against Σ ext·(1−disc)·(1+tax) recomputed
    // from lines in scaled-integer cents (the TPC-H charge identity).
    // Report per order priority: orders, exact matches within a cent,
    // and the total absolute drift — the audit that catches silent
    // rounding policy changes between systems. One join + two reduces.
    Q("dq_totalprice_reconciliation",
      Some(
        """WITH lc AS (SELECT l_orderkey,
          |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
          |    * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))
          |    * (100 + CAST(floor(l_tax*100 + 0.5) AS BIGINT)) // 10000)
          |    AS BIGINT) AS charge_c
          |  FROM lineitem GROUP BY l_orderkey),
          |j AS (SELECT o.o_orderpriority,
          |  CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT) AS total_c,
          |  lc.charge_c FROM orders o
          |  JOIN lc ON lc.l_orderkey = o.o_orderkey)
          |SELECT o_orderpriority AS priority,
          |  CAST(count(*) AS BIGINT) AS orders,
          |  CAST(sum(CASE WHEN abs(total_c - charge_c) <= 1
          |    THEN 1 ELSE 0 END) AS BIGINT) AS within_cent,
          |  CAST(sum(abs(total_c - charge_c)) AS BIGINT) AS drift_cents
          |FROM j GROUP BY o_orderpriority ORDER BY priority
          |""".stripMargin),
      (s, dir) => {
        val lc = tbl(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum(expr(
            "CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)" +
              " * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))" +
              " * (100 + CAST(floor(l_tax*100 + 0.5) AS BIGINT))" +
              " div 10000")).cast("long").as("charge_c"))
        tbl(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
              .as("total_c"))
          .join(lc, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).cast("long").as("orders"),
            sum(when(abs(col("total_c") - col("charge_c")) <= 1, 1L)
              .otherwise(0L)).cast("long").as("within_cent"),
            sum(abs(col("total_c") - col("charge_c"))).cast("long")
              .as("drift_cents"))
          .orderBy("priority")
      }),

    // Resource-allocation link prediction on the focus co-purchase
    // subgraph: RA(u,v) = Σ_{z ∈ CN(u,v)} 1/deg(z), in micro — the
    // division-friendly sibling of Adamic-Adar (no log). Candidates are
    // 2-hop pairs that are NOT already edges (anti-join), top-10 overall.
    // Degrees broadcast; the 2-hop enumeration is degree-bounded.
    Q("graph_resource_allocation",
      Some(
        """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          |  FROM lineitem WHERE l_partkey < 60),
          |ed AS (SELECT DISTINCT a.pk AS u, b.pk AS v
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
          |deg AS (SELECT u AS z, CAST(count(*) AS BIGINT) AS d FROM ed
          |  GROUP BY u),
          |cn AS (SELECT e1.u, e2.v,
          |  CAST(sum(1000000 // deg.d) AS BIGINT) AS ra_micro,
          |  CAST(count(*) AS BIGINT) AS common
          |  FROM ed e1 JOIN ed e2 ON e2.u = e1.v AND e2.v <> e1.u
          |  JOIN deg ON deg.z = e1.v
          |  GROUP BY e1.u, e2.v),
          |nonedge AS (SELECT cn.u, cn.v, cn.ra_micro, cn.common FROM cn
          |  LEFT JOIN ed ON ed.u = cn.u AND ed.v = cn.v
          |  WHERE ed.u IS NULL AND cn.u < cn.v)
          |SELECT u, v, common, ra_micro,
          |  CAST(row_number() OVER (ORDER BY ra_micro DESC, u, v)
          |    AS BIGINT) AS rnk
          |FROM nonedge ORDER BY rnk LIMIT 10
          |""".stripMargin),
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
          .filter(col("l_partkey") < 60)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
          .localCheckpoint()
        val ed = li.join(
            li.select(col("ok").as("ok2"), col("pk").as("pk2")),
            col("ok") === col("ok2") && col("pk") =!= col("pk2"))
          .select(col("pk").as("u"), col("pk2").as("v"))
          .distinct()
          .localCheckpoint() // 2-hop sides, degrees, and the anti-join
        val deg = ed.groupBy(col("u").as("z"))
          .agg(count(lit(1)).cast("long").as("d"))
        val cn = ed.select(col("u"), col("v").as("z"))
          .join(ed.select(col("u").as("z2"), col("v")),
            col("z2") === col("z"))
          .filter(col("v") =!= col("u"))
          .join(broadcast(deg), Seq("z"))
          .groupBy("u", "v")
          .agg(sum(expr("1000000 div d")).cast("long").as("ra_micro"),
            count(lit(1)).cast("long").as("common"))
        val out = cn
          .join(ed.select(col("u").as("eu"), col("v").as("ev")),
            col("eu") === col("u") && col("ev") === col("v"), "left_anti")
          .filter(col("u") < col("v"))
          .orderBy(col("ra_micro").desc, col("u"), col("v"))
          .limit(10)
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("ra_micro").desc, col("u"), col("v")))
            .cast("long"))
          .select("u", "v", "common", "ra_micro", "rnk")
          .orderBy("rnk")
        H.materialized(out, caches = Nil, checkpoints = Seq(li, ed))
      }),

    // ABC × XYZ inventory classification: ABC from the cumulative
    // revenue Pareto (A ≤ 70%, B ≤ 90%, C rest) ranked on the REDUCED
    // per-part domain (facts compress first; with a very large item
    // universe the cumsum would band like orders_skyline_pareto),
    // crossed with XYZ demand variability
    // (coefficient of variation from exact power sums; X < 0.5, Y < 1,
    // Z rest). Output the 3×3 class matrix with revenue mass.
    Q("orders_abc_xyz",
      Some(
        """WITH pm AS (SELECT l_partkey,
          |  CAST(strftime(l_shipdate, '%Y-%m') AS VARCHAR) AS m,
          |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS rev_c,
          |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
          |  FROM lineitem GROUP BY 1, 2),
          |ps AS (SELECT l_partkey, CAST(sum(rev_c) AS BIGINT) AS rev,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(qty) AS BIGINT) AS sq,
          |  CAST(sum(qty*qty) AS BIGINT) AS sq2 FROM pm GROUP BY 1),
          |tot AS (SELECT CAST(sum(rev) AS BIGINT) AS trev FROM ps),
          |rk AS (SELECT ps.*, tot.trev,
          |  CAST(sum(ps.rev) OVER (ORDER BY ps.rev DESC, ps.l_partkey
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |    AS crev FROM ps CROSS JOIN tot),
          |cls AS (SELECT l_partkey, rev, n, sq, sq2,
          |  CASE WHEN crev * 100 <= trev * 70 THEN 'A'
          |    WHEN crev * 100 <= trev * 90 THEN 'B' ELSE 'C' END AS abc,
          |  CASE WHEN n < 2 OR sq = 0 THEN 'Z'
          |    WHEN sqrt(CAST(n*sq2 - sq*sq AS DOUBLE)) * 2
          |      < CAST(sq AS DOUBLE) THEN 'X'
          |    WHEN sqrt(CAST(n*sq2 - sq*sq AS DOUBLE))
          |      < CAST(sq AS DOUBLE) THEN 'Y' ELSE 'Z' END AS xyz
          |  FROM rk)
          |SELECT abc, xyz, CAST(count(*) AS BIGINT) AS parts,
          |  CAST(sum(rev) AS BIGINT) AS revenue_cents
          |FROM cls GROUP BY abc, xyz ORDER BY abc, xyz
          |""".stripMargin),
      (s, dir) => {
        // XYZ: cv = sqrt(n·Σq² − (Σq)²)/Σq (the √n-scaled population CV
        // cross-multiplied — thresholds stated on the same scaled form
        // in both engines, so no division happens before the compare)
        val pm = tbl(s, dir, "lineitem")
          .groupBy(col("l_partkey"),
            date_format(col("l_shipdate"), "yyyy-MM").as("m"))
          .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5))
            .cast("long")).cast("long").as("rev_c"),
            sum(col("l_quantity").cast("long")).cast("long").as("qty"))
        val ps = pm.groupBy("l_partkey")
          .agg(sum("rev_c").cast("long").as("rev"),
            count(lit(1)).cast("long").as("n"),
            sum("qty").cast("long").as("sq"),
            sum(col("qty") * col("qty")).cast("long").as("sq2"))
          .localCheckpoint() // total + the ranked pass
        val tot = ps.agg(sum("rev").cast("long").as("trev"))
        val wr = Window.orderBy(col("rev").desc, col("l_partkey"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val out = ps.crossJoin(broadcast(tot))
          .withColumn("crev", sum("rev").over(wr).cast("long"))
          .withColumn("abc",
            when(col("crev") * 100 <= col("trev") * 70, "A")
              .when(col("crev") * 100 <= col("trev") * 90, "B")
              .otherwise("C"))
          .withColumn("xyz",
            when(col("n") < 2 || col("sq") === 0, "Z")
              .when(sqrt((col("n") * col("sq2") - col("sq") * col("sq"))
                .cast("double")) * 2 < col("sq").cast("double"), "X")
              .when(sqrt((col("n") * col("sq2") - col("sq") * col("sq"))
                .cast("double")) < col("sq").cast("double"), "Y")
              .otherwise("Z"))
          .groupBy("abc", "xyz")
          .agg(count(lit(1)).cast("long").as("parts"),
            sum("rev").cast("long").as("revenue_cents"))
          .orderBy("abc", "xyz")
        H.materialized(out, caches = Nil, checkpoints = Seq(ps))
      }))
}
