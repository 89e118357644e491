package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Hundred-eighteenth wave: tie strength, dependency risk, and
  * behavioral predictability — edge embeddedness over the co-supplier
  * graph (how many common neighbors back each edge; embeddedness-0
  * edges are Granovetter's local bridges, the ties that carry novel
  * information), per-supplier customer-dependency risk (what share of
  * a supplier's revenue hangs on its single largest customer), and
  * per-state branching entropy of the session chain (which behaviors
  * are predictable, which are coin flips).
  *
  * Exactness: embeddedness counts are exact wedge joins on the
  * checkpointed edge list; dependency shares are integer bps via
  * distributed per-supplier argmax; entropy terms floor to micro per
  * transition cell pre-sum.
  */
object EmbeddednessOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Edge embeddedness: per co-supplier edge, the number of common
    // neighbors (triangles through the edge) via one wedge join on the
    // undirected adjacency; the census by embeddedness band plus the
    // local-bridge count and share. Weak-tie theory, measured: bridges
    // are where new information crosses communities.
    Q("graph_edge_embeddedness",
      Some(
        """WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey
          |  FROM lineitem),
          |e AS (SELECT x.l_suppkey AS a, y.l_suppkey AS b FROM li x
          |  JOIN li y ON x.l_orderkey = y.l_orderkey
          |    AND x.l_suppkey < y.l_suppkey
          |  GROUP BY 1, 2 HAVING count(*) >= 6),
          |und AS (SELECT a AS u, b AS v FROM e
          |  UNION ALL SELECT b, a FROM e),
          |cn AS (SELECT e.a, e.b, CAST(count(*) AS BIGINT) AS cn
          |  FROM e JOIN und n1 ON n1.u = e.a
          |  JOIN und n2 ON n2.u = e.b AND n2.v = n1.v
          |  GROUP BY 1, 2),
          |emb AS (SELECT CAST(coalesce(cn.cn, 0) AS BIGINT) AS cn
          |  FROM e LEFT JOIN cn ON cn.a = e.a AND cn.b = e.b),
          |bands AS (SELECT CASE WHEN cn = 0 THEN 'a_bridge'
          |  WHEN cn <= 2 THEN 'b_weak' WHEN cn <= 5 THEN 'c_embedded'
          |  ELSE 'd_deep' END AS band FROM emb)
          |SELECT band, CAST(count(*) AS BIGINT) AS n_edges,
          |  CAST(count(*) * 10000 // (SELECT count(*) FROM emb)
          |    AS BIGINT) AS share_bps
          |FROM bands GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey").distinct()
        val e = li.as("x")
          .join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_suppkey") < col("y.l_suppkey"))
          .groupBy(col("x.l_suppkey").as("a"), col("y.l_suppkey").as("b"))
          .agg(count(lit(1)).as("w")).filter(col("w") >= 6)
          .select("a", "b")
          .localCheckpoint()
        val und = e.select(col("a").as("u"), col("b").as("v"))
          .unionAll(e.select(col("b").as("u"), col("a").as("v")))
          .localCheckpoint()
        // common neighbors of (a, b): wedge a–x and b–x
        val cn = e
          .join(und.select(col("u").as("a"), col("v").as("x1")),
            Seq("a"))
          .join(und.select(col("u").as("b"), col("v").as("x2")),
            Seq("b"))
          .filter(col("x1") === col("x2"))
          .groupBy("a", "b").agg(count(lit(1)).cast("long").as("cn"))
        val emb = e.join(cn, Seq("a", "b"), "left")
          .select(coalesce(col("cn"), lit(0L)).as("cn"))
          .localCheckpoint()
        val tot = emb.agg(count(lit(1)).cast("long").as("te"))
        val out = emb.select(
            when(col("cn") === 0, "a_bridge")
              .when(col("cn") <= 2, "b_weak")
              .when(col("cn") <= 5, "c_embedded")
              .otherwise("d_deep").as("band"))
          .groupBy("band")
          .agg(count(lit(1)).cast("long").as("n_edges"))
          .crossJoin(broadcast(tot))
          .select(col("band"), col("n_edges"),
            expr("n_edges * 10000 div te").cast("long").as("share_bps"))
          .orderBy("band")
        H.materialized(out, Nil, Seq(e, und, emb))
      }),

    // Customer-dependency risk: per supplier, the revenue share of its
    // single largest customer in bps — suppliers above 2000 bps are
    // one churn away from distress. Distributed per-(supplier,
    // customer) aggregation, per-supplier argmax, and the band census;
    // the mirror image of the single-source (supplier-side) risk
    // audit.
    Q("supply_customer_dependency",
      Some(
        """WITH sc AS (SELECT l.l_suppkey AS sk, o.o_custkey AS ck,
          |  CAST(sum(CAST(floor(l.l_extendedprice*100 + 0.5)
          |    AS BIGINT)) AS BIGINT) AS cents
          |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          |  GROUP BY 1, 2),
          |t AS (SELECT sk, CAST(sum(cents) AS BIGINT) AS tot,
          |  CAST(max(cents) AS BIGINT) AS mx FROM sc GROUP BY 1),
          |b AS (SELECT sk, mx * 10000 // tot AS dep_bps FROM t)
          |SELECT
          |  CAST(count(*) AS BIGINT) AS n_suppliers,
          |  CAST(sum(CASE WHEN dep_bps > 2000 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS at_risk_suppliers,
          |  CAST(sum(dep_bps) // count(*) AS BIGINT) AS mean_dep_bps,
          |  CAST(max(dep_bps) AS BIGINT) AS max_dep_bps
          |FROM b
          |""".stripMargin),
      (s, dir) => {
        val sc = tbl(s, dir, "lineitem")
          .select(col("l_suppkey").as("sk"), col("l_orderkey"),
            floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
              .as("cents"))
          .join(tbl(s, dir, "orders")
              .select(col("o_orderkey"), col("o_custkey").as("ck")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("sk", "ck")
          .agg(sum(col("cents")).cast("long").as("cents"))
        val t = sc.groupBy("sk")
          .agg(sum(col("cents")).cast("long").as("tot"),
            max(col("cents")).cast("long").as("mx"))
          .withColumn("dep_bps", expr("mx * 10000 div tot"))
        t.agg(count(lit(1)).cast("long").as("n_suppliers"),
          sum(when(col("dep_bps") > 2000, 1L).otherwise(0L))
            .cast("long").as("at_risk_suppliers"),
          expr("sum(dep_bps) div count(*)").cast("long")
            .as("mean_dep_bps"),
          max(col("dep_bps")).cast("long").as("max_dep_bps"))
      }),

    // Branching entropy per session state: the entropy of each event
    // type's next-event distribution (terms micro-floored per cell),
    // with its out-transition count — low entropy = the next step is
    // nearly scripted, high = a genuine decision point. Tells a
    // sequence model where its capacity will actually matter.
    Q("events_branching_entropy",
      Some(
        """WITH t AS (SELECT lag(event_type) OVER (PARTITION BY user_id
          |    ORDER BY ts, event_id) AS i, event_type AS j FROM events),
          |c AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n FROM t
          |  WHERE i IS NOT NULL GROUP BY 1, 2),
          |rt AS (SELECT i, CAST(sum(n) AS BIGINT) AS r FROM c
          |  GROUP BY 1)
          |SELECT c.i AS state, rt.r AS n_out,
          |  CAST(count(*) AS BIGINT) AS n_successors,
          |  CAST(sum(CAST(floor(-(CAST(c.n AS DOUBLE)
          |      / CAST(rt.r AS DOUBLE))
          |    * ln(CAST(c.n AS DOUBLE) / CAST(rt.r AS DOUBLE))
          |    * 1000000.0) AS BIGINT)) AS BIGINT) AS entropy_micro
          |FROM c JOIN rt ON rt.i = c.i GROUP BY 1, 2 ORDER BY 1
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
        c.join(broadcast(rt), Seq("i"))
          .select(col("i"), col("r"),
            floor((lit(0.0d) - col("n").cast("double") /
              col("r").cast("double")) *
              log(col("n").cast("double") / col("r").cast("double")) *
              1000000.0d).cast("long").as("term"))
          .groupBy(col("i").as("state"), col("r").as("n_out"))
          .agg(count(lit(1)).cast("long").as("n_successors"),
            sum(col("term")).cast("long").as("entropy_micro"))
          .orderBy("state")
      })
  )
}
