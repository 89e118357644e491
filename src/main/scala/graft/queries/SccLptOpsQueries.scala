package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-9 wave 133: directed strongly-connected components (the one graph
  * primitive the board still lacked — condensation of a directed graph) and
  * LPT makespan scheduling (the shard-balancing greedy every distributed
  * writer runs when it assigns uneven files to a fixed worker pool).
  * Both exact-integer end to end.
  */
object SccLptOpsQueries extends QueryModule {

  /** Shared flow CTE: customer-nation → supplier-nation revenue in cents
    * (exact: floor(x*100+0.5) per row, summed as BIGINT). */
  private val flowsSql =
    """f AS (
      |  SELECT c_nationkey AS src, s_nationkey AS dst,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  WHERE c_nationkey <> s_nationkey
      |  GROUP BY 1, 2)""".stripMargin

  def all: Seq[Q] = Seq(

    // STRONGLY CONNECTED COMPONENTS: the "trade bloc" condensation of the
    // directed top-2-supplier graph over nations. Edge A→B iff B is one of
    // A's two largest supplier nations by revenue (deterministic tie-break
    // on nation key); SCC id of n = min nation mutually reachable with n.
    // Per nation: its SCC id, the SCC size, and whether it sits on a cycle.
    // Scale shape: the ONE fact-sized pass is the flow reduce (lineitem ⋈
    // orders ⋈ customer ⋈ supplier → |nations|² rows, map-side combined);
    // everything after — top-2 window, transitive closure by path doubling
    // (log₂|V| rounds), mutual-reachability labeling — runs on the bounded
    // nation domain (≤625-row frames). The closure is iterated squaring
    // R ← R ∪ R∘R, so 5 rounds cover any path in a 25-node graph; each
    // round is checkpointed (lineage doubles per round otherwise — the
    // graph_shortest_path lesson).
    Q("graph_scc",
      Some(
        s"""WITH RECURSIVE $flowsSql,
           |e AS (
           |  SELECT src, dst FROM (
           |    SELECT src, dst, row_number() OVER
           |      (PARTITION BY src ORDER BY cents DESC, dst) AS rnk
           |    FROM f) WHERE rnk <= 2),
           |r AS (
           |  SELECT src AS a, dst AS b FROM e
           |  UNION
           |  SELECT r.a, e.dst FROM r JOIN e ON e.src = r.b),
           |mut AS (
           |  SELECT x.a AS id, CAST(min(x.b) AS BIGINT) AS mn
           |  FROM r x JOIN r y ON y.a = x.b AND y.b = x.a
           |  GROUP BY 1),
           |lab AS (
           |  SELECT n_nationkey AS id, n_name,
           |    least(CAST(n_nationkey AS BIGINT),
           |      coalesce(mut.mn, CAST(n_nationkey AS BIGINT))) AS scc_id
           |  FROM nation LEFT JOIN mut ON mut.id = n_nationkey),
           |sz AS (SELECT scc_id, CAST(count(*) AS BIGINT) AS scc_size
           |  FROM lab GROUP BY 1)
           |SELECT lab.n_name, lab.scc_id, sz.scc_size,
           |  CASE WHEN sz.scc_size > 1 THEN 1 ELSE 0 END AS in_cycle
           |FROM lab JOIN sz ON sz.scc_id = lab.scc_id
           |ORDER BY lab.n_name
           |""".stripMargin),
      (s, dir) => {
        val flows = tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
          .join(tbl(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
          .join(tbl(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
          .filter(col("c_nationkey") =!= col("s_nationkey"))
          .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
          .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5))
            .cast("long")).cast("long").as("cents"))
        val e = flows
          .withColumn("rnk", row_number().over(
            Window.partitionBy("src").orderBy(col("cents").desc, col("dst"))))
          .filter(col("rnk") <= 2)
          .select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
          .localCheckpoint() // joined against itself every doubling round
        // transitive closure by path doubling: R ← R ∪ R∘R, 5 rounds ≥
        // log₂(25) so every path in the 25-node graph is covered
        val ckpts = scala.collection.mutable.ArrayBuffer(e)
        var r = e
        for (_ <- 1 to 5) {
          r = r.union(
              r.as("x").join(r.as("y"), col("x.b") === col("y.a"))
                .select(col("x.a").as("a"), col("y.b").as("b")))
            .distinct()
            .localCheckpoint()
          ckpts += r
        }
        val mut = r.as("x").join(r.as("y"),
            col("y.a") === col("x.b") && col("y.b") === col("x.a"))
          .groupBy(col("x.a").as("id"))
          .agg(min(col("x.b")).cast("long").as("mn"))
        val nation = tbl(s, dir, "nation")
        val lab = nation
          .join(broadcast(mut), col("id") === col("n_nationkey"), "left")
          .select(col("n_name"),
            least(col("n_nationkey").cast("long"),
              coalesce(col("mn"), col("n_nationkey").cast("long")))
              .as("scc_id"))
        val sz = lab.groupBy("scc_id")
          .agg(count(lit(1)).cast("long").as("scc_size"))
        val out = lab.join(broadcast(sz), Seq("scc_id"))
          .select(col("n_name"), col("scc_id"), col("scc_size"),
            when(col("scc_size") > 1, 1L).otherwise(0L).as("in_cycle"))
          .orderBy("n_name")
        H.materialized(out, Nil, ckpts.toSeq)
      }),

    // LPT MAKESPAN SCHEDULING: assign each brand's 64 heaviest parts (by
    // total shipped quantity) to 8 machines with the longest-processing-
    // time greedy — sort jobs descending, give each to the currently
    // least-loaded machine (first-index tie-break). The classic 4/3-OPT
    // bound makes this THE practical shard balancer (uneven file sizes →
    // fixed writer pool). Per brand: makespan, the max(ceil(total/m),
    // max job) lower bound, and the achieved ratio in micro. Scale shape:
    // the per-part quantity reduce is the only fact-sized pass; the
    // ranking window is PARTITIONED by brand over the part domain, the
    // top-64 cap bounds the per-group fold state by construction, and the
    // sequential greedy itself runs as one aggregate() fold per brand —
    // 25 independent 64-step folds, embarrassingly parallel.
    Q("pack_lpt_makespan",
      Some(
        """WITH RECURSIVE j AS (
          |  SELECT p_brand AS brand, l_partkey AS pk,
          |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
          |  FROM lineitem JOIN part ON p_partkey = l_partkey
          |  GROUP BY 1, 2),
          |it AS (
          |  SELECT brand, q, CAST(row_number() OVER (PARTITION BY brand
          |    ORDER BY q DESC, pk) AS BIGINT) AS rn
          |  FROM j QUALIFY rn <= 64),
          |nn AS (SELECT brand, CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(q) AS BIGINT) AS total, CAST(max(q) AS BIGINT)
          |      AS maxjob
          |  FROM it GROUP BY 1),
          |g AS (
          |  SELECT nn.brand, CAST(0 AS BIGINT) AS t,
          |    [CAST(0 AS BIGINT) FOR i IN range(1, 9)] AS loads, nn.n
          |  FROM nn
          |  UNION ALL
          |  SELECT g.brand, g.t + 1,
          |    [CASE WHEN i = list_position(g.loads, list_min(g.loads))
          |      THEN g.loads[i] + it.q ELSE g.loads[i] END
          |      FOR i IN range(1, 9)],
          |    g.n
          |  FROM g JOIN it ON it.brand = g.brand AND it.rn = g.t + 1
          |  WHERE g.t < g.n),
          |fin AS (SELECT g.brand, g.loads FROM g WHERE g.t = g.n)
          |SELECT nn.brand, nn.n AS n_jobs, nn.total AS total_qty,
          |  CAST(list_max(fin.loads) AS BIGINT) AS makespan,
          |  CAST(list_min(fin.loads) AS BIGINT) AS min_load,
          |  CAST(greatest((nn.total + 7) // 8, nn.maxjob) AS BIGINT)
          |    AS lower_bound,
          |  CAST(list_max(fin.loads) * 1000000
          |    // greatest((nn.total + 7) // 8, nn.maxjob) AS BIGINT)
          |    AS lpt_ratio_micro
          |FROM nn JOIN fin ON fin.brand = nn.brand
          |ORDER BY nn.brand
          |""".stripMargin),
      (s, dir) => {
        val j = tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "part"), col("p_partkey") === col("l_partkey"))
          .groupBy(col("p_brand").as("brand"), col("l_partkey").as("pk"))
          .agg(sum(col("l_quantity").cast("long")).cast("long").as("q"))
        val it = j
          .withColumn("rn", row_number().over(
            Window.partitionBy("brand").orderBy(col("q").desc, col("pk")))
            .cast("long"))
          .filter(col("rn") <= 64)
        val packed = it.groupBy("brand")
          .agg(
            transform(array_sort(collect_list(struct(col("rn"), col("q")))),
              x => x.getField("q")).as("jobs"),
            count(lit(1)).cast("long").as("n_jobs"),
            sum("q").cast("long").as("total_qty"),
            max("q").cast("long").as("maxjob"))
          // the greedy fold: state = 8 machine loads; each job lands on
          // the first least-loaded machine (array_position is 1-based,
          // transform's index 0-based)
          .withColumn("loads", expr(
            """aggregate(jobs, array_repeat(CAST(0 AS BIGINT), 8),
              |  (acc, q) -> transform(acc, (x, i) ->
              |    CASE WHEN CAST(i AS BIGINT) =
              |        array_position(acc, array_min(acc)) - 1
              |      THEN x + q ELSE x END))""".stripMargin))
        packed.select(col("brand"), col("n_jobs"), col("total_qty"),
            array_max(col("loads")).as("makespan"),
            array_min(col("loads")).as("min_load"),
            greatest(expr("(total_qty + 7) div 8"), col("maxjob"))
              .as("lower_bound"),
            expr("CAST(array_max(loads) * 1000000 div " +
              "greatest((total_qty + 7) div 8, maxjob) AS BIGINT)")
              .as("lpt_ratio_micro"))
          .orderBy("brand")
      })
  )
}
