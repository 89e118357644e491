package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Seventy-third wave: graph cohesion and storage-audit operators —
  * 4-truss peeling (iterative support-based edge removal, the standard
  * cohesive-subgraph primitive), bounded-radius harmonic centrality
  * with exact LCM-12 weights, a functional-dependency violation audit,
  * and a dictionary-encoding profitability profile driven by exact
  * bit-width arithmetic (`bin`), no logarithms.
  */
object TrussOpsQueries extends QueryModule {

  /** Co-purchase edge list (u < v) over the bounded part universe:
    * parts with key < 200 that share an order. The node set is
    * universe-bounded, so every downstream graph pass is constant-size
    * while only the initial distinct scales with the fact table. */
  private def coEdges(s: SparkSession, dir: String): DataFrame = {
    val li = tbl(s, dir, "lineitem")
      .filter(col("l_partkey") < 200)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .localCheckpoint() // both sides of the pair join
    li.join(li.select(col("ok").as("ok2"), col("pk").as("pk2")),
        col("ok") === col("ok2") && col("pk") < col("pk2"))
      .select(col("pk").as("u"), col("pk2").as("v"))
      .distinct()
  }

  private val edgesSql =
    """WITH li AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |  FROM lineitem WHERE l_partkey < 200),
      |e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk)""".stripMargin

  private val TrussRounds = 6 // converged by round 5 at every tested SF

  def all: Seq[Q] = Seq(

    // 4-truss of the co-purchase graph: peel edges whose triangle
    // support is < 2 until the census is stable. Six unrolled rounds
    // (idempotent once converged — measured convergence: sf0.001
    // round 0, sf0.01 round 5, sf0.1/10x round 2). Each round is two
    // keyed joins; per-round localCheckpoint stops the plan doubling
    // that an iterative frame otherwise suffers.
    Q("graph_ktruss",
      Some {
        val rounds = (1 to TrussRounds).map { i =>
          s"""e$i AS MATERIALIZED (
             |  WITH adj AS (SELECT u AS a, v AS b FROM e${i - 1}
             |    UNION ALL SELECT v, u FROM e${i - 1})
             |  SELECT e.u, e.v FROM e${i - 1} e
             |  JOIN adj x ON x.a = e.u
             |  JOIN adj y ON y.a = e.v AND y.b = x.b
             |  GROUP BY e.u, e.v HAVING count(*) >= 2)""".stripMargin
        }.mkString(",\n")
        val census = (0 to TrussRounds).map { i =>
          s"""SELECT $i AS round, CAST(count(*) AS BIGINT) AS edges,
             |  CAST((SELECT count(DISTINCT n) FROM (SELECT u AS n FROM e$i
             |    UNION ALL SELECT v FROM e$i) q) AS BIGINT) AS nodes
             |FROM e$i""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""$edgesSql,
           |$rounds
           |SELECT CAST(round AS BIGINT) AS round, edges, nodes
           |FROM ($census) z ORDER BY round
           |""".stripMargin
      },
      (s, dir) => {
        var ed = coEdges(s, dir).localCheckpoint()
        val census = Seq.newBuilder[DataFrame]
        def censusOf(round: Int, e: DataFrame): DataFrame = {
          val edges = e.agg(count(lit(1)).cast("long").as("edges"))
          val nodes = e.select(col("u").as("n"))
            .union(e.select(col("v").as("n")))
            .agg(countDistinct("n").cast("long").as("nodes"))
          edges.crossJoin(nodes).select(lit(round.toLong).as("round"),
            col("edges"), col("nodes"))
        }
        census += censusOf(0, ed)
        for (i <- 1 to TrussRounds) {
          val adj = ed.select(col("u").as("a"), col("v").as("b"))
            .union(ed.select(col("v").as("a"), col("u").as("b")))
          ed = ed
            .join(adj.select(col("a").as("xa"), col("b").as("xb")),
              col("xa") === col("u"))
            .join(adj.select(col("a").as("ya"), col("b").as("yb")),
              col("ya") === col("v") && col("yb") === col("xb"))
            .groupBy("u", "v")
            .agg(count(lit(1)).as("sup"))
            .filter(col("sup") >= 2)
            .select("u", "v")
            .localCheckpoint() // next round + census, per-round barrier
          census += censusOf(i, ed)
        }
        census.result().reduce(_ union _).orderBy("round")
      }),

    // Harmonic centrality within radius 4: H(v) = sum over reachable u
    // of 1/d(u,v), weights scaled by lcm(1..4)=12 so every term is an
    // exact integer (12, 6, 4, 3). Distance classes by frontier
    // expansion with anti-joins — each class checkpointed because it
    // feeds both the next expansion and the exclusion set. Top 10 via
    // TakeOrderedAndProject, never a global sort.
    Q("graph_harmonic_top10",
      Some(
        s"""$edgesSql,
           |adj AS MATERIALIZED (SELECT u AS a, v AS b FROM e0
           |  UNION ALL SELECT v, u FROM e0),
           |d1 AS MATERIALIZED (SELECT a, b FROM adj),
           |d2 AS MATERIALIZED (SELECT DISTINCT x.a, y.b
           |  FROM d1 x JOIN adj y ON y.a = x.b
           |  WHERE x.a <> y.b AND NOT EXISTS (SELECT 1 FROM d1
           |    WHERE d1.a = x.a AND d1.b = y.b)),
           |d3 AS MATERIALIZED (SELECT DISTINCT x.a, y.b
           |  FROM d2 x JOIN adj y ON y.a = x.b
           |  WHERE x.a <> y.b AND NOT EXISTS (SELECT 1 FROM d1
           |    WHERE d1.a = x.a AND d1.b = y.b)
           |  AND NOT EXISTS (SELECT 1 FROM d2
           |    WHERE d2.a = x.a AND d2.b = y.b)),
           |d4 AS MATERIALIZED (SELECT DISTINCT x.a, y.b
           |  FROM d3 x JOIN adj y ON y.a = x.b
           |  WHERE x.a <> y.b AND NOT EXISTS (SELECT 1 FROM d1
           |    WHERE d1.a = x.a AND d1.b = y.b)
           |  AND NOT EXISTS (SELECT 1 FROM d2
           |    WHERE d2.a = x.a AND d2.b = y.b)
           |  AND NOT EXISTS (SELECT 1 FROM d3
           |    WHERE d3.a = x.a AND d3.b = y.b)),
           |w AS (SELECT a, 12 AS w FROM d1
           |  UNION ALL SELECT a, 6 FROM d2
           |  UNION ALL SELECT a, 4 FROM d3
           |  UNION ALL SELECT a, 3 FROM d4),
           |sc AS (SELECT a AS node, CAST(sum(w) AS BIGINT) AS score_x12
           |  FROM w GROUP BY a),
           |top AS (SELECT node, score_x12, row_number() OVER
           |  (ORDER BY score_x12 DESC, node) AS rk FROM sc)
           |SELECT CAST(rk AS BIGINT) AS rk, CAST(node AS BIGINT) AS node,
           |  score_x12 FROM top WHERE rk <= 10 ORDER BY rk
           |""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e0 = coEdges(s, dir)
        val adj = e0.select(col("u").as("a"), col("v").as("b"))
          .union(e0.select(col("v").as("a"), col("u").as("b")))
          .localCheckpoint() // every expansion round
        def expand(prev: DataFrame, seen: Seq[DataFrame]): DataFrame = {
          val cand = prev.select(col("a"), col("b").as("mid"))
            .join(adj.select(col("a").as("ya"), col("b").as("nb")),
              col("ya") === col("mid"))
            .filter(col("a") =!= col("nb"))
            .select(col("a"), col("nb").as("b")).distinct()
          seen.foldLeft(cand)((c, d) => c.join(
            d.select(col("a").as("sa"), col("b").as("sb")),
            col("sa") === col("a") && col("sb") === col("b"),
            "left_anti"))
        }
        val d1 = adj
        val d2 = expand(d1, Seq(d1)).localCheckpoint()
        val d3 = expand(d2, Seq(d1, d2)).localCheckpoint()
        val d4 = expand(d3, Seq(d1, d2, d3)).localCheckpoint()
        val w = d1.select(col("a"), lit(12L).as("w"))
          .union(d2.select(col("a"), lit(6L).as("w")))
          .union(d3.select(col("a"), lit(4L).as("w")))
          .union(d4.select(col("a"), lit(3L).as("w")))
        val sc = w.groupBy(col("a").as("node"))
          .agg(sum("w").cast("long").as("score_x12"))
        sc.orderBy(col("score_x12").desc, col("node")).limit(10)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("score_x12").desc, col("node"))).cast("long"))
          .select(col("rk"), col("node").cast("long"), col("score_x12"))
          .orderBy("rk")
      }),

    // Functional-dependency audit: for each candidate FD A -> B, count
    // the rows that disagree with their LHS group's majority RHS
    // (sum over A of n_A - max_b n_{A,b}) plus the violating-LHS
    // census. Two-level keyed aggregation — map-side combinable, no
    // row ever leaves its (A, B) shuffle key.
    Q("dq_fd_violations",
      Some(
        """WITH pairs AS (
          |  SELECT 'c_mktsegment->c_nationkey' AS fd,
          |    c_mktsegment AS a, CAST(c_nationkey AS VARCHAR) AS b
          |  FROM customer
          |  UNION ALL
          |  SELECT 'c_nationkey->n_regionkey', CAST(c_nationkey AS VARCHAR),
          |    CAST(n_regionkey AS VARCHAR)
          |  FROM customer JOIN nation ON n_nationkey = c_nationkey
          |  UNION ALL
          |  SELECT 'o_orderpriority->o_orderstatus', o_orderpriority,
          |    o_orderstatus
          |  FROM orders),
          |ab AS (SELECT fd, a, b, CAST(count(*) AS BIGINT) AS c
          |  FROM pairs GROUP BY fd, a, b),
          |lhs AS (SELECT fd, a, CAST(sum(c) AS BIGINT) AS n,
          |  CAST(max(c) AS BIGINT) AS mx,
          |  CAST(count(*) AS BIGINT) AS nb FROM ab GROUP BY fd, a)
          |SELECT fd, CAST(count(*) AS BIGINT) AS distinct_lhs,
          |  CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS violating_lhs,
          |  CAST(sum(n - mx) AS BIGINT) AS row_violations,
          |  CAST(sum(n) AS BIGINT) AS total_rows
          |FROM lhs GROUP BY fd ORDER BY fd
          |""".stripMargin),
      (s, dir) => {
        val cust = tbl(s, dir, "customer")
        val nat = tbl(s, dir, "nation")
        val pairs =
          cust.select(lit("c_mktsegment->c_nationkey").as("fd"),
              col("c_mktsegment").as("a"),
              col("c_nationkey").cast("string").as("b"))
            .union(cust.join(broadcast(nat),
                col("n_nationkey") === col("c_nationkey"))
              .select(lit("c_nationkey->n_regionkey").as("fd"),
                col("c_nationkey").cast("string").as("a"),
                col("n_regionkey").cast("string").as("b")))
            .union(tbl(s, dir, "orders")
              .select(lit("o_orderpriority->o_orderstatus").as("fd"),
                col("o_orderpriority").as("a"), col("o_orderstatus").as("b")))
        pairs.groupBy("fd", "a", "b")
          .agg(count(lit(1)).cast("long").as("c"))
          .groupBy("fd", "a")
          .agg(sum("c").cast("long").as("n"), max("c").cast("long").as("mx"),
            count(lit(1)).cast("long").as("nb"))
          .groupBy("fd")
          .agg(count(lit(1)).cast("long").as("distinct_lhs"),
            sum(when(col("nb") > 1, 1L).otherwise(0L)).cast("long")
              .as("violating_lhs"),
            sum(col("n") - col("mx")).cast("long").as("row_violations"),
            sum("n").cast("long").as("total_rows"))
          .orderBy("fd")
      }),

    // Dictionary-encoding profitability per column: index width =
    // ceil(log2(cardinality)) computed EXACTLY as length(bin(d - 1)),
    // dictionary payload = 8 bits per distinct-value char, raw payload
    // = 8 bits per stored char. One value-keyed aggregation per column
    // over a pruned single-column scan — the profile a file-format
    // writer would run before choosing an encoding.
    Q("profile_dict_encoding",
      Some {
        // integer-ish columns go through BIGINT so both engines render
        // identical strings (no double/timestamp formatting drift)
        val cols = Seq(
          "l_linestatus" -> "l_linestatus",
          "l_orderkey" -> "CAST(l_orderkey AS BIGINT)",
          "l_quantity" -> "CAST(l_quantity AS BIGINT)",
          "l_returnflag" -> "l_returnflag")
        val per = cols.map { case (c, e) =>
          s"""SELECT '$c' AS col, CAST(sum(c) AS BIGINT) AS n_rows,
             |  CAST(count(*) AS BIGINT) AS n_distinct,
             |  CASE WHEN count(*) = 1 THEN 0
             |    ELSE length(bin(count(*) - 1)) END AS idx_bits,
             |  CAST(8 * sum(length(v)) AS BIGINT) AS dict_bits,
             |  CAST(8 * sum(length(v) * c) AS BIGINT) AS raw_bits
             |FROM (SELECT CAST($e AS VARCHAR) AS v,
             |  CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1) g
             |""".stripMargin
        }.mkString("UNION ALL\n")
        s"""WITH prof AS ($per)
           |SELECT col, n_rows, n_distinct, CAST(idx_bits AS BIGINT)
           |    AS idx_bits, dict_bits, raw_bits,
           |  (n_rows * idx_bits + dict_bits) AS enc_bits,
           |  (n_rows * idx_bits + dict_bits) * 1000000 // raw_bits
           |    AS ratio_micro
           |FROM prof ORDER BY col
           |""".stripMargin
      },
      (s, dir) => {
        val cols = Seq(
          "l_linestatus" -> col("l_linestatus"),
          "l_orderkey" -> col("l_orderkey").cast("long"),
          "l_quantity" -> col("l_quantity").cast("long"),
          "l_returnflag" -> col("l_returnflag"))
        val li = tbl(s, dir, "lineitem")
        val per = cols.map { case (c, e) =>
          li.select(e.cast("string").as("v"))
            .groupBy("v").agg(count(lit(1)).cast("long").as("c"))
            .agg(sum("c").cast("long").as("n_rows"),
              count(lit(1)).cast("long").as("n_distinct"),
              sum(length(col("v"))).cast("long").as("dlen"),
              sum(length(col("v")) * col("c")).cast("long").as("rlen"))
            .select(lit(c).as("col"), col("n_rows"), col("n_distinct"),
              when(col("n_distinct") === 1, 0L)
                .otherwise(length(bin(col("n_distinct") - 1)))
                .cast("long").as("idx_bits"),
              (col("dlen") * 8).as("dict_bits"),
              (col("rlen") * 8).as("raw_bits"))
        }.reduce(_ union _)
        per.select(col("col"), col("n_rows"), col("n_distinct"),
            col("idx_bits"), col("dict_bits"), col("raw_bits"),
            (col("n_rows") * col("idx_bits") + col("dict_bits"))
              .as("enc_bits"),
            expr("(n_rows * idx_bits + dict_bits) * 1000000 div raw_bits")
              .as("ratio_micro"))
          .orderBy("col")
      }))
}
