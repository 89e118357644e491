package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Eighty-first wave: financial-allocation and paired-test operators —
  * a price-volume-mix decomposition of year-over-year revenue change
  * (the standard FP&A bridge, sign-handled integer arithmetic), FIFO
  * cost-of-goods allocation via closed-form prefix-sum interval
  * overlap (no sequential consumption loop), Cochran's Q test for
  * k paired binary treatments (the k-sample McNemar), and a
  * bloom-filter parquet source roundtrip (write with column bloom
  * filters, point-lookup back).
  */
object CostingOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Price-volume-mix bridge, 1996 → 1997, per market segment:
    // ΔRev = price effect (Δp·q1) + volume effect (p0·Δq) + residual
    // cross term, with unit prices in truncated milli-cents and every
    // signed product divided through the explicit sign(x)*(|x| div d)
    // idiom (Spark div truncates, DuckDB // floors — they agree only
    // on non-negative operands). Facts reduce to a 5-row
    // (segment, year) frame before any arithmetic.
    Q("orders_price_volume_mix",
      Some(
        """WITH f AS (SELECT c.c_mktsegment AS seg,
          |  year(CAST(o.o_orderdate AS TIMESTAMP)) AS yr,
          |  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q,
          |  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents
          |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          |  JOIN customer c ON c.c_custkey = o.o_custkey
          |  WHERE year(CAST(o.o_orderdate AS TIMESTAMP)) IN (1996, 1997)
          |  GROUP BY 1, 2),
          |p AS (SELECT a.seg, a.q AS q0, b.q AS q1,
          |  a.cents AS r0, b.cents AS r1,
          |  a.cents * 1000 // a.q AS p0m, b.cents * 1000 // b.q AS p1m
          |  FROM f a JOIN f b ON b.seg = a.seg
          |  WHERE a.yr = 1996 AND b.yr = 1997),
          |e AS (SELECT seg, q0, q1, r0, r1,
          |  CASE WHEN p1m >= p0m THEN (p1m - p0m) * q1 // 1000
          |    ELSE -((p0m - p1m) * q1 // 1000) END AS price_eff,
          |  CASE WHEN q1 >= q0 THEN p0m * (q1 - q0) // 1000
          |    ELSE -(p0m * (q0 - q1) // 1000) END AS vol_eff
          |  FROM p)
          |SELECT seg AS mktsegment, CAST(r1 - r0 AS BIGINT) AS delta_cents,
          |  CAST(price_eff AS BIGINT) AS price_effect_cents,
          |  CAST(vol_eff AS BIGINT) AS volume_effect_cents,
          |  CAST(r1 - r0 - price_eff - vol_eff AS BIGINT) AS residual_cents
          |FROM e ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val f = tbl(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
          .join(tbl(s, dir, "orders")
              .select(col("o_orderkey"), col("o_custkey"),
                year(col("o_orderdate")).as("yr"))
              .filter(col("yr").isin(1996, 1997)),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(tbl(s, dir, "customer")
              .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy("seg", "yr")
          .agg(sum(col("l_quantity").cast("long")).cast("long").as("q"),
            sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
              .cast("long").as("cents"))
        val a = f.filter(col("yr") === 1996)
          .select(col("seg"), col("q").as("q0"), col("cents").as("r0"),
            expr("cents * 1000 div q").as("p0m"))
        val b = f.filter(col("yr") === 1997)
          .select(col("seg").as("seg2"), col("q").as("q1"),
            col("cents").as("r1"), expr("cents * 1000 div q").as("p1m"))
        a.join(b, col("seg") === col("seg2"))
          .select(col("seg").as("mktsegment"),
            (col("r1") - col("r0")).cast("long").as("delta_cents"),
            when(col("p1m") >= col("p0m"),
                expr("(p1m - p0m) * q1 div 1000"))
              .otherwise(-expr("(p0m - p1m) * q1 div 1000"))
              .cast("long").as("price_effect_cents"),
            when(col("q1") >= col("q0"), expr("p0m * (q1 - q0) div 1000"))
              .otherwise(-expr("p0m * (q0 - q1) div 1000"))
              .cast("long").as("volume_effect_cents"))
          .withColumn("residual_cents",
            (col("delta_cents") - col("price_effect_cents") -
              col("volume_effect_cents")).cast("long"))
          .orderBy("mktsegment")
      }),

    // FIFO cost of goods sold: receipts = lineitems per part in
    // (shipdate, orderkey, linenumber) order; demand = half the total
    // received quantity (truncated). Each receipt's consumed units are
    // the CLOSED-FORM interval overlap max(0, min(cumQ, D) − (cumQ −
    // qty)) — no sequential consumption loop, one per-part window +
    // one keyed aggregation, rolled up to brand. Unit cost =
    // cents div qty (quantities are exact integers 1..50). The same
    // prefix-allocation shape as orders_transport_nwcorner, here on
    // the |parts|-partitioned fact window — fully parallel at scale.
    Q("orders_fifo_cogs",
      Some(
        """WITH r AS (SELECT l_partkey AS pk,
          |  CAST(l_quantity AS BIGINT) AS qty,
          |  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
          |    // CAST(l_quantity AS BIGINT) AS unit_cents,
          |  sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_partkey
          |    ORDER BY l_shipdate, l_orderkey, l_linenumber
          |    ROWS UNBOUNDED PRECEDING) AS cumq
          |  FROM lineitem),
          |d AS (SELECT pk, max(cumq) // 2 AS dem FROM r GROUP BY 1),
          |c AS (SELECT r.pk,
          |  GREATEST(0, LEAST(r.cumq, d.dem) - (r.cumq - r.qty)) AS used,
          |  r.qty, r.unit_cents
          |  FROM r JOIN d ON d.pk = r.pk),
          |pp AS (SELECT c.pk, CAST(sum(c.used * c.unit_cents) AS BIGINT)
          |    AS cogs_cents, CAST(sum(c.used) AS BIGINT) AS used_qty,
          |  CAST(sum(c.qty - c.used) AS BIGINT) AS ending_qty
          |  FROM c GROUP BY 1)
          |SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_parts,
          |  CAST(sum(pp.cogs_cents) AS BIGINT) AS cogs_cents,
          |  CAST(sum(pp.used_qty) AS BIGINT) AS used_qty,
          |  CAST(sum(pp.ending_qty) AS BIGINT) AS ending_qty
          |FROM pp JOIN part p ON p.p_partkey = pp.pk
          |GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("pk")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val r = tbl(s, dir, "lineitem")
          .select(col("l_partkey").as("pk"),
            col("l_quantity").cast("long").as("qty"),
            expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)" +
              " div CAST(l_quantity AS BIGINT)").as("unit_cents"),
            col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .withColumn("cumq", sum("qty").over(w))
          .localCheckpoint() // windowed receipts feed demand + overlap
        val d = r.groupBy(col("pk").as("dk"))
          .agg(expr("max(cumq) div 2").as("dem"))
        val c = r.join(d, col("pk") === col("dk"))
          .select(col("pk"),
            greatest(lit(0L), least(col("cumq"), col("dem")) -
              (col("cumq") - col("qty"))).as("used"),
            col("qty"), col("unit_cents"))
        val pp = c.groupBy("pk")
          .agg(sum(expr("used * unit_cents")).cast("long").as("cogs_cents"),
            sum("used").cast("long").as("used_qty"),
            sum(expr("qty - used")).cast("long").as("ending_qty"))
        val out = pp.join(broadcast(tbl(s, dir, "part")
              .select(col("p_partkey"), col("p_brand"))),
            col("pk") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).cast("long").as("n_parts"),
            sum("cogs_cents").cast("long").as("cogs_cents"),
            sum("used_qty").cast("long").as("used_qty"),
            sum("ending_qty").cast("long").as("ending_qty"))
          .orderBy("p_brand")
        H.materialized(out, Nil, Seq(r))
      }),

    // Cochran's Q: blocks = users, treatments = the 5 event types,
    // x_ij = 1 iff user i ever emitted type j. Q = (k−1)·Σ(kT_j−N)² /
    // (k·(k·ΣR − ΣR²)) — the k-sample McNemar — exact in milli via
    // integer arithmetic (every operand non-negative). The fact table
    // reduces to the 0/1 incidence in one distinct + two keyed
    // aggregations; the statistic is arithmetic on k+1 numbers.
    Q("stats_cochran_q",
      Some(
        """WITH x AS (SELECT DISTINCT user_id, event_type FROM events),
          |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS tj
          |  FROM x GROUP BY 1),
          |r AS (SELECT user_id, CAST(count(*) AS BIGINT) AS ri
          |  FROM x GROUP BY 1),
          |dims AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM t) AS k,
          |  (SELECT CAST(sum(tj) AS BIGINT) FROM t) AS n,
          |  (SELECT CAST(sum(ri) AS BIGINT) FROM r) AS sr,
          |  (SELECT CAST(sum(ri * ri) AS BIGINT) FROM r) AS sr2,
          |  (SELECT CAST(count(*) AS BIGINT) FROM r) AS blocks),
          |num AS (SELECT CAST(sum((dims.k * t.tj - dims.n) *
          |  (dims.k * t.tj - dims.n)) AS BIGINT) AS ss FROM t, dims)
          |SELECT t.event_type, t.tj AS n_users_with,
          |  dims.blocks AS n_blocks,
          |  CAST(CASE WHEN dims.k * dims.sr - dims.sr2 = 0 THEN 0
          |    ELSE 1000 * (dims.k - 1) * num.ss
          |      // (dims.k * (dims.k * dims.sr - dims.sr2)) END AS BIGINT)
          |    AS q_milli
          |FROM t, dims, num ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val x = H.events(s, dir)
          .select("user_id", "event_type").distinct()
          .localCheckpoint() // 0/1 incidence feeds both marginals
        val t = x.groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("tj"))
          .localCheckpoint()
        val r = x.groupBy("user_id").agg(count(lit(1)).cast("long").as("ri"))
        val kn = t.agg(count(lit(1)).cast("long").as("k"),
          sum("tj").cast("long").as("n"))
        val rr = r.agg(sum("ri").cast("long").as("sr"),
          sum(expr("ri * ri")).cast("long").as("sr2"),
          count(lit(1)).cast("long").as("blocks"))
        val dims = kn.crossJoin(rr)
        val num = t.crossJoin(broadcast(dims))
          .agg(sum(expr("(k * tj - n) * (k * tj - n)")).cast("long")
            .as("ss"))
        val out = t.crossJoin(broadcast(dims)).crossJoin(broadcast(num))
          .select(col("event_type"), col("tj").as("n_users_with"),
            col("blocks").as("n_blocks"),
            when(expr("k * sr - sr2") === 0, 0L)
              .otherwise(expr(
                "1000 * (k - 1) * ss div (k * (k * sr - sr2))"))
              .cast("long").as("q_milli"))
          .orderBy("event_type")
        H.materialized(out, Nil, Seq(x, t))
      }),

    // Parquet bloom-filter source roundtrip: write the part table with
    // a bloom filter on p_partkey (dictionary off for that column so
    // the bloom is actually consulted), read it back with an IN-list
    // point lookup — the row-group-skipping shape a 100 TB point query
    // needs when min/max zone maps can't prune (keys uniformly spread).
    // The oracle runs the same lookup on the source table: the
    // roundtrip must be lossless and the filter exact.
    Q("source_parquet_bloom",
      Some("SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_brand, " +
        "CAST(p_size AS BIGINT) AS p_size FROM part " +
        "WHERE p_partkey % 97 = 13 ORDER BY 1"),
      (s, dir) => {
        val scratch = H.tmpDir("graft_bloom") + "/part_bloom"
        tbl(s, dir, "part")
          .write.mode("overwrite")
          .option("parquet.bloom.filter.enabled#p_partkey", "true")
          .option("parquet.bloom.filter.expected.ndv#p_partkey", "20000")
          .option("parquet.enable.dictionary#p_partkey", "false")
          .parquet(scratch)
        s.read.parquet(scratch)
          .filter(col("p_partkey") % 97 === 13)
          .select(col("p_partkey").cast("long").as("p_partkey"),
            col("p_brand"), col("p_size").cast("long").as("p_size"))
          .orderBy("p_partkey")
      }))
}
