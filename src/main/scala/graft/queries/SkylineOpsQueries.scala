package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Fifty-sixth wave: dominance analytics — the 2-D Pareto skyline
  * (minimize price, maximize size) via a sort+running-max construction
  * that the oracle's literal NOT-EXISTS dominance predicate proves
  * exact, and 4-hop graph eccentricity from the bounded walk frames.
  */
object SkylineOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Pareto skyline of parts (cheapest price, largest size): p is
    // dominated iff some q has price ≤ p ∧ size ≥ s with one strict.
    // Engine: two window maxima — the best size among STRICTLY cheaper
    // parts (integer RANGE frame) and among equal-price parts — replace
    // the quadratic scan; O(n log n), partitionable by price band at
    // scale. The oracle states the textbook NOT EXISTS, so the hash
    // compare proves the window decomposition handles every tie case.
    Q("orders_skyline_pareto",
      Some(
        """WITH p AS (SELECT p_partkey,
          |  CAST(floor(p_retailprice*100 + 0.5) AS BIGINT) AS price_c,
          |  CAST(p_size AS BIGINT) AS size FROM part),
          |sky AS (SELECT a.p_partkey, a.price_c, a.size FROM p a
          |  WHERE NOT EXISTS (SELECT 1 FROM p q
          |    WHERE q.price_c <= a.price_c AND q.size >= a.size
          |      AND (q.price_c < a.price_c OR q.size > a.size)))
          |SELECT p_partkey, price_c, size FROM sky
          |ORDER BY price_c, size, p_partkey
          |""".stripMargin),
      (s, dir) => {
        // two-level scan (never a global single-partition sort): running
        // max within a price band + a cumulative carry over the tiny
        // band-max frame; band boundaries preserve strictness exactly
        val p = tbl(s, dir, "part")
          .select(col("p_partkey"),
            floor(col("p_retailprice") * 100 + lit(0.5)).cast("long")
              .as("price_c"),
            col("p_size").cast("long").as("size"))
          .withColumn("band", expr("price_c div 1000"))
          .localCheckpoint() // band maxima + the filtered pass
        val wLocal = Window.partitionBy("band").orderBy("price_c")
          .rangeBetween(Window.unboundedPreceding, -1)
        val wCarry = Window.orderBy("band")
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = p.groupBy("band").agg(max("size").as("bmax"))
          .withColumn("carry", max("bmax").over(wCarry))
          .select(col("band"), col("carry"))
        val out = p
          .withColumn("local_prev", max("size").over(wLocal))
          .join(broadcast(carry), Seq("band"))
          .withColumn("best_cheaper",
            greatest(coalesce(col("local_prev"), lit(-1L)),
              coalesce(col("carry"), lit(-1L))))
          .withColumn("best_same",
            max("size").over(Window.partitionBy("price_c")))
          .filter(col("best_cheaper") < col("size") &&
            col("best_same") <= col("size"))
          .select("p_partkey", "price_c", "size")
          .orderBy("price_c", "size", "p_partkey")
        H.materialized(out, caches = Nil, checkpoints = Seq(p))
      }),

    // 4-hop eccentricity on the focus co-purchase subgraph: per node the
    // max bounded shortest-path distance, plus whether the node attains
    // the bounded radius. Same min-length walk construction as
    // graph_stress_centrality (bounded joins, checkpointed edge list).
    Q("graph_eccentricity4",
      Some(
        """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          |  FROM lineitem WHERE l_partkey < 60),
          |ed AS (SELECT DISTINCT a.pk AS u, b.pk AS v
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
          |w1 AS (SELECT u AS s, v AS t, 1 AS d FROM ed),
          |w2 AS (SELECT w1.s, ed.v AS t, 2 AS d FROM w1 JOIN ed
          |  ON ed.u = w1.t WHERE ed.v <> w1.s),
          |w3 AS (SELECT w2.s, ed.v AS t, 3 AS d FROM w2 JOIN ed
          |  ON ed.u = w2.t WHERE ed.v <> w2.s),
          |w4 AS (SELECT w3.s, ed.v AS t, 4 AS d FROM w3 JOIN ed
          |  ON ed.u = w3.t WHERE ed.v <> w3.s),
          |wk AS (SELECT s, t, d FROM w1 UNION ALL SELECT s, t, d FROM w2
          |  UNION ALL SELECT s, t, d FROM w3 UNION ALL SELECT * FROM w4),
          |mn AS (SELECT s, t, CAST(min(d) AS BIGINT) AS dist FROM wk
          |  GROUP BY s, t),
          |ec AS (SELECT s AS node, CAST(max(dist) AS BIGINT) AS ecc4,
          |  CAST(count(*) AS BIGINT) AS reach4 FROM mn GROUP BY s),
          |rad AS (SELECT min(ecc4) AS r FROM ec)
          |SELECT ec.node, ec.ecc4, ec.reach4,
          |  CASE WHEN ec.ecc4 = rad.r THEN 1 ELSE 0 END AS is_center
          |FROM ec CROSS JOIN rad ORDER BY node
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
          .localCheckpoint()
        def extend(w: org.apache.spark.sql.DataFrame, d: Int) =
          w.join(ed.select(col("u").as("pu"), col("v").as("pv")),
            col("t") === col("pu"))
            .filter(col("pv") =!= col("s"))
            .select(col("s"), col("pv").as("t"), lit(d).as("d"))
        val w1 = ed.select(col("u").as("s"), col("v").as("t"),
          lit(1).as("d"))
        val w2 = extend(w1, 2).localCheckpoint()
        val w3 = extend(w2, 3).localCheckpoint()
        val wk = w1.unionAll(w2).unionAll(w3).unionAll(extend(w3, 4))
        val ec = wk.groupBy("s", "t").agg(min("d").cast("long").as("dist"))
          .groupBy(col("s").as("node"))
          .agg(max("dist").cast("long").as("ecc4"),
            count(lit(1)).cast("long").as("reach4"))
          .localCheckpoint() // radius scan + output rows
        val rad = ec.agg(min("ecc4").as("r"))
        val out = ec.crossJoin(broadcast(rad))
          .select(col("node"), col("ecc4"), col("reach4"),
            when(col("ecc4") === col("r"), 1).otherwise(0).as("is_center"))
          .orderBy("node")
        H.materialized(out, caches = Nil,
          checkpoints = Seq(li, ed, w2, w3, ec))
      }))
}
