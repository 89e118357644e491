package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Hundred-twenty-first wave: baselines and loyalty — the majority-
  * successor accuracy of the session chain (the number any sequence
  * model must beat; pairs with wave 118's branching entropy), a brand
  * loyalty census (what share of each customer's purchases go to
  * their modal brand), and the G-test of segment × priority
  * independence (the likelihood-ratio twin of the chi-square, additive
  * across partitions of the table).
  *
  * Exactness: baseline accuracy is Σ max-successor / Σ transitions in
  * integer bps; modal shares are per-customer integer argmax ratios;
  * G terms 2·O·ln(O/E) floor to micro per cell pre-sum.
  */
object LoyaltyOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Majority-successor baseline: predict each next event as the
    // current state's most frequent successor; accuracy = Σ max / Σ
    // total in bps, overall and per state. A sequence model that
    // doesn't clear this number is a very expensive lookup table.
    Q("events_markov_baseline_acc",
      Some(
        """WITH t AS (SELECT lag(event_type) OVER (PARTITION BY user_id
          |    ORDER BY ts, event_id) AS i, event_type AS j FROM events),
          |c AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n FROM t
          |  WHERE i IS NOT NULL GROUP BY 1, 2),
          |m AS (SELECT i, CAST(max(n) AS BIGINT) AS best,
          |  CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
          |SELECT i AS state, best AS majority_hits, tot AS transitions,
          |  CAST(best * 10000 // tot AS BIGINT) AS accuracy_bps,
          |  CAST((SELECT sum(best) * 10000 // sum(tot) FROM m)
          |    AS BIGINT) AS overall_accuracy_bps
          |FROM m ORDER BY 1
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
        val m = c.groupBy("i")
          .agg(max(col("n")).cast("long").as("best"),
            sum(col("n")).cast("long").as("tot"))
          .localCheckpoint()
        val ov = m.agg(expr("sum(best) * 10000 div sum(tot)")
          .cast("long").as("overall_accuracy_bps"))
        val out = m.crossJoin(broadcast(ov))
          .select(col("i").as("state"),
            col("best").as("majority_hits"),
            col("tot").as("transitions"),
            expr("best * 10000 div tot").cast("long")
              .as("accuracy_bps"),
            col("overall_accuracy_bps"))
          .orderBy("state")
        H.materialized(out, Nil, Seq(m))
      }),

    // Brand loyalty census: per customer, the share of their lineitems
    // going to their single most-purchased brand (ties break to the
    // lexically-smaller brand), banded into loyalty tiers. Per-customer
    // argmax over a (customer, brand) frame — hash-parallel, domain-
    // bounded per customer. The "do we have customers or just
    // transactions" read.
    Q("orders_brand_loyalty",
      Some(
        """WITH cb AS (SELECT o.o_custkey AS ck, p.p_brand AS brand,
          |  CAST(count(*) AS BIGINT) AS n
          |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          |  JOIN part p ON p.p_partkey = l.l_partkey GROUP BY 1, 2),
          |m AS (SELECT ck, CAST(max(n) AS BIGINT) AS best,
          |  CAST(sum(n) AS BIGINT) AS tot FROM cb GROUP BY 1
          |  HAVING sum(n) >= 10),
          |b AS (SELECT ck, best * 10000 // tot AS share_bps FROM m),
          |k AS (SELECT CASE WHEN share_bps >= 5000 THEN 'a_loyal'
          |  WHEN share_bps >= 3000 THEN 'b_leaning'
          |  WHEN share_bps >= 1500 THEN 'c_mixed'
          |  ELSE 'd_promiscuous' END AS tier FROM b)
          |SELECT tier, CAST(count(*) AS BIGINT) AS n_customers,
          |  CAST(count(*) * 10000 // (SELECT count(*) FROM k)
          |    AS BIGINT) AS share_bps
          |FROM k GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val cb = tbl(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
          .join(tbl(s, dir, "orders")
              .select(col("o_orderkey"), col("o_custkey").as("ck")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(tbl(s, dir, "part")
              .select(col("p_partkey"), col("p_brand").as("brand"))),
            col("p_partkey") === col("l_partkey"))
          .groupBy("ck", "brand")
          .agg(count(lit(1)).cast("long").as("n"))
        val m = cb.groupBy("ck")
          .agg(max(col("n")).cast("long").as("best"),
            sum(col("n")).cast("long").as("tot"))
          .filter(col("tot") >= 10)
        val k = m.select(expr("best * 10000 div tot").as("share_bps"))
          .select(when(col("share_bps") >= 5000, "a_loyal")
            .when(col("share_bps") >= 3000, "b_leaning")
            .when(col("share_bps") >= 1500, "c_mixed")
            .otherwise("d_promiscuous").as("tier"))
          .localCheckpoint()
        val tot = k.agg(count(lit(1)).cast("long").as("tk"))
        val out = k.groupBy("tier")
          .agg(count(lit(1)).cast("long").as("n_customers"))
          .crossJoin(broadcast(tot))
          .select(col("tier"), col("n_customers"),
            expr("n_customers * 10000 div tk").cast("long")
              .as("share_bps"))
          .orderBy("tier")
        H.materialized(out, Nil, Seq(k))
      }),

    // G-test of segment × priority independence: G = 2·Σ O·ln(O/E),
    // each cell's term micro-floored pre-sum (E as the exact rational
    // row·col/N inside the one chain). The likelihood-ratio twin of
    // chi-square — additive across table partitions, which is why
    // distributed pipelines prefer it.
    Q("stats_g_test",
      Some(
        """WITH c AS (SELECT c.c_mktsegment AS seg,
          |  o.o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS n
          |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          |  GROUP BY 1, 2),
          |r AS (SELECT seg, CAST(sum(n) AS BIGINT) AS nr FROM c
          |  GROUP BY 1),
          |p AS (SELECT pri, CAST(sum(n) AS BIGINT) AS np FROM c
          |  GROUP BY 1),
          |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM c),
          |g AS (SELECT CAST(sum(CAST(floor(2.0 * CAST(c.n AS DOUBLE)
          |    * ln(CAST(c.n AS DOUBLE) * CAST(t.nn AS DOUBLE)
          |      / (CAST(r.nr AS DOUBLE) * CAST(p.np AS DOUBLE)))
          |    * 1000000.0) AS BIGINT)) AS BIGINT) AS g_micro,
          |  CAST(count(*) AS BIGINT) AS cells
          |  FROM c JOIN r ON r.seg = c.seg JOIN p ON p.pri = c.pri, t)
          |SELECT g.cells,
          |  CAST((SELECT (count(DISTINCT seg) - 1)
          |    * (count(DISTINCT pri) - 1) FROM c) AS BIGINT) AS df,
          |  g.g_micro
          |FROM g
          |""".stripMargin),
      (s, dir) => {
        val c = tbl(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderpriority").as("pri"))
          .join(broadcast(tbl(s, dir, "customer")
              .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy("seg", "pri")
          .agg(count(lit(1)).cast("long").as("n"))
          .localCheckpoint()
        val r = c.groupBy("seg").agg(sum(col("n")).cast("long")
          .as("nr"))
        val p = c.groupBy("pri").agg(sum(col("n")).cast("long")
          .as("np"))
        val t = c.agg(sum(col("n")).cast("long").as("nn"))
        val df = c.agg(((countDistinct(col("seg")) - 1) *
          (countDistinct(col("pri")) - 1)).cast("long").as("df"))
        val g = c.join(broadcast(r), Seq("seg"))
          .join(broadcast(p), Seq("pri"))
          .crossJoin(broadcast(t))
          .select(floor(lit(2.0d) * col("n").cast("double") *
            log(col("n").cast("double") * col("nn").cast("double") /
              (col("nr").cast("double") * col("np").cast("double"))) *
            1000000.0d).cast("long").as("term"))
          .agg(sum(col("term")).cast("long").as("g_micro"),
            count(lit(1)).cast("long").as("cells"))
        val out = g.crossJoin(broadcast(df))
          .select(col("cells"), col("df"), col("g_micro"))
        H.materialized(out, Nil, Seq(c))
      })
  )
}
