package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Sixty-fourth wave: quadrangle census and master-data consolidation —
  * 4-cycle counts from the common-neighbor frame (Σ C(cn,2), exact), and
  * field-level golden-record merge (the MDM survivorship op: per cluster,
  * each field resolves by its own rule rather than keeping one row).
  */
object GoldenOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // 4-cycle census on the focus co-purchase subgraph: every unordered
    // pair with c common neighbors closes C(c,2) quadrangles; the global
    // count divides the per-pair sum by… nothing — each 4-cycle is
    // counted once per opposite-corner pair, i.e. exactly twice, and the
    // output keeps the exact 2× sum alongside the halved count. Builds
    // on the same degree-bounded 2-path enumeration as
    // graph_resource_allocation.
    Q("graph_four_cycles",
      Some(
        """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          |  FROM lineitem WHERE l_partkey < 60),
          |ed AS (SELECT DISTINCT a.pk AS u, b.pk AS v
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
          |cn AS (SELECT e1.u, e2.v, CAST(count(*) AS BIGINT) AS c
          |  FROM ed e1 JOIN ed e2 ON e2.u = e1.v AND e2.v <> e1.u
          |  WHERE e1.u < e2.v GROUP BY e1.u, e2.v),
          |q AS (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS pair_sum,
          |  CAST(count(*) AS BIGINT) AS pairs FROM cn)
          |SELECT pairs, pair_sum AS corner_pair_quads,
          |  pair_sum // 2 AS four_cycles FROM q
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
          .localCheckpoint() // both 2-path sides
        val out = ed.select(col("u"), col("v").as("z"))
          .join(ed.select(col("u").as("z2"), col("v")),
            col("z2") === col("z"))
          .filter(col("u") < col("v"))
          .groupBy("u", "v").agg(count(lit(1)).cast("long").as("c"))
          .agg(sum(expr("c * (c - 1) div 2")).cast("long").as("pair_sum"),
            count(lit(1)).cast("long").as("pairs"))
          .select(col("pairs"), col("pair_sum").as("corner_pair_quads"),
            expr("pair_sum div 2").as("four_cycles"))
        H.materialized(out, caches = Nil, checkpoints = Seq(li, ed))
      }),

    // Golden-record survivorship: clusters of customers (synthetic
    // residue clusters, 10 members each) consolidate FIELD-WISE — id =
    // min key, balance = max, segment = modal value with lexical
    // tie-break, nation = the min-key member's value (source-priority
    // rule). One grouped pass plus a modal window on the (cluster,
    // segment) count domain.
    Q("er_golden_record",
      Some(
        """WITH c AS (SELECT c_custkey // 10 AS cluster, c_custkey,
          |  c_nationkey, c_acctbal, c_mktsegment FROM customer),
          |seg AS (SELECT cluster, c_mktsegment,
          |  CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1, 2),
          |segpick AS (SELECT cluster, c_mktsegment FROM (
          |  SELECT cluster, c_mktsegment, row_number() OVER
          |    (PARTITION BY cluster ORDER BY n DESC, c_mktsegment) AS rn
          |  FROM seg) s WHERE rn = 1),
          |base AS (SELECT cluster,
          |  CAST(min(c_custkey) AS BIGINT) AS golden_id,
          |  CAST(count(*) AS BIGINT) AS members,
          |  CAST(floor(max(c_acctbal)*100 + 0.5) AS BIGINT)
          |    AS best_acctbal_c FROM c GROUP BY cluster),
          |nat AS (SELECT c.cluster, c.c_nationkey FROM c
          |  JOIN base ON base.cluster = c.cluster
          |    AND base.golden_id = c.c_custkey)
          |SELECT b.cluster, b.golden_id, b.members, b.best_acctbal_c,
          |  CAST(n.c_nationkey AS BIGINT) AS nationkey,
          |  sp.c_mktsegment AS segment
          |FROM base b JOIN nat n ON n.cluster = b.cluster
          |JOIN segpick sp ON sp.cluster = b.cluster
          |ORDER BY b.cluster
          |""".stripMargin),
      (s, dir) => {
        val c = tbl(s, dir, "customer")
          .select(expr("c_custkey div 10").as("cluster"), col("c_custkey"),
            col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
          .localCheckpoint() // base, modal, and priority passes
        val segpick = c.groupBy("cluster", "c_mktsegment")
          .agg(count(lit(1)).cast("long").as("n"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("cluster")
              .orderBy(col("n").desc, col("c_mktsegment"))))
          .filter(col("rn") === 1)
          .select(col("cluster"), col("c_mktsegment").as("segment"))
        val base = c.groupBy("cluster")
          .agg(min("c_custkey").cast("long").as("golden_id"),
            count(lit(1)).cast("long").as("members"),
            floor(max("c_acctbal") * 100 + lit(0.5)).cast("long")
              .as("best_acctbal_c"))
        val nat = c.select(col("cluster").as("cl2"),
          col("c_custkey").as("ck"), col("c_nationkey"))
        val out = base
          .join(nat, col("cl2") === col("cluster") &&
            col("ck") === col("golden_id"))
          .join(segpick, Seq("cluster"))
          .select(col("cluster"), col("golden_id"), col("members"),
            col("best_acctbal_c"),
            col("c_nationkey").cast("long").as("nationkey"),
            col("segment"))
          .orderBy("cluster")
        H.materialized(out, caches = Nil, checkpoints = Seq(c))
      }))
}
