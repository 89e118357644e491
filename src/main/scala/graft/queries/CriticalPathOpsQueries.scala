package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-10 wave 152: the critical-path method (CPM/PERT) — forward and
  * backward passes over per-order task DAGs, entirely level-synchronous.
  * The scale story is the point: every order is an INDEPENDENT project
  * (its line items are tasks; precedence is the binary tree parent =
  * line/2, depth <= 3 for TPC-H's 7 lines), so the longest-path problem
  * distributes as per-key bounded-depth joins — millions of small DAGs,
  * never one global graph pass.
  */
object CriticalPathOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // CPM: duration = l_quantity days. Forward pass per level (ES/EF),
    // makespan = max EF per order, backward pass per level (LF = min
    // child LS, childless tasks close at the makespan), slack = LF - EF,
    // critical = zero slack. Every pass is an equi-join on
    // (orderkey, parent-line) with map-side-combined min/max — per-order
    // fanout is bounded by the 7-line tree, so AQE sees uniform keys.
    // Output: per order-priority project census — projects, tasks,
    // critical tasks, total slack days, and mean makespan in milli.
    Q("orders_critical_path",
      Some(
        """WITH t AS (SELECT l_orderkey AS ok, l_linenumber AS i,
          |    CAST(l_quantity AS BIGINT) AS dur, l_linenumber // 2 AS par
          |  FROM lineitem),
          |l0 AS (SELECT ok, i, dur, 0 AS es, dur AS ef FROM t WHERE i = 1),
          |l1 AS (SELECT t.ok, t.i, t.dur, p.ef AS es, p.ef + t.dur AS ef
          |  FROM t JOIN l0 p ON p.ok = t.ok AND p.i = t.par
          |  WHERE t.i IN (2, 3)),
          |l2 AS (SELECT t.ok, t.i, t.dur, p.ef AS es, p.ef + t.dur AS ef
          |  FROM t JOIN l1 p ON p.ok = t.ok AND p.i = t.par
          |  WHERE t.i >= 4),
          |fw AS (SELECT * FROM l0 UNION ALL SELECT * FROM l1
          |  UNION ALL SELECT * FROM l2),
          |mk AS (SELECT ok, CAST(max(ef) AS BIGINT) AS m FROM fw GROUP BY 1),
          |b2 AS (SELECT fw.ok, fw.i, fw.dur, fw.es, fw.ef, mk.m AS lf
          |  FROM fw JOIN mk ON mk.ok = fw.ok WHERE fw.i >= 4),
          |b1 AS (SELECT fw.ok, fw.i, fw.dur, fw.es, fw.ef,
          |    coalesce(min(c.lf - c.dur), max(mk.m)) AS lf
          |  FROM fw JOIN mk ON mk.ok = fw.ok
          |  LEFT JOIN b2 c ON c.ok = fw.ok AND c.i // 2 = fw.i
          |  WHERE fw.i IN (2, 3) GROUP BY fw.ok, fw.i, fw.dur, fw.es, fw.ef),
          |b0 AS (SELECT fw.ok, fw.i, fw.dur, fw.es, fw.ef,
          |    coalesce(min(c.lf - c.dur), max(mk.m)) AS lf
          |  FROM fw JOIN mk ON mk.ok = fw.ok
          |  LEFT JOIN b1 c ON c.ok = fw.ok AND c.i // 2 = fw.i
          |  WHERE fw.i = 1 GROUP BY fw.ok, fw.i, fw.dur, fw.es, fw.ef),
          |bw AS (SELECT * FROM b0 UNION ALL SELECT * FROM b1
          |  UNION ALL SELECT * FROM b2),
          |agg AS (SELECT o.o_orderpriority AS priority,
          |    CAST(count(DISTINCT bw.ok) AS BIGINT) AS n_projects,
          |    CAST(count(*) AS BIGINT) AS n_tasks,
          |    CAST(sum(CASE WHEN bw.lf - bw.ef = 0 THEN 1 ELSE 0 END)
          |      AS BIGINT) AS n_critical,
          |    CAST(sum(bw.lf - bw.ef) AS BIGINT) AS total_slack
          |  FROM bw JOIN orders o ON o.o_orderkey = bw.ok GROUP BY 1),
          |mkp AS (SELECT o.o_orderpriority AS priority,
          |    CAST(sum(mk.m) AS BIGINT) AS mksum,
          |    CAST(count(*) AS BIGINT) AS nmk
          |  FROM mk JOIN orders o ON o.o_orderkey = mk.ok GROUP BY 1)
          |SELECT agg.priority, agg.n_projects, agg.n_tasks,
          |  agg.n_critical, agg.total_slack,
          |  mkp.mksum * 1000 // mkp.nmk AS mean_makespan_milli
          |FROM agg JOIN mkp ON mkp.priority = agg.priority
          |ORDER BY agg.priority
          |""".stripMargin),
      (s, dir) => {
        val t = tbl(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"),
            col("l_linenumber").cast("long").as("i"),
            col("l_quantity").cast("long").as("dur"),
            (col("l_linenumber").cast("long") / 2).cast("long").as("par"))
          .localCheckpoint() // three level passes read it
        val l0 = t.filter(col("i") === 1)
          .select(col("ok"), col("i"), col("dur"),
            lit(0L).as("es"), col("dur").as("ef"))
        def fwd(prev: org.apache.spark.sql.DataFrame,
            cond: org.apache.spark.sql.Column) =
          t.filter(cond).as("t")
            .join(prev.select(col("ok").as("pok"), col("i").as("pi"),
              col("ef").as("pef")),
              col("pok") === col("ok") && col("pi") === col("par"))
            .select(col("ok"), col("i"), col("dur"),
              col("pef").as("es"), (col("pef") + col("dur")).as("ef"))
        val l1 = fwd(l0, col("i").isin(2, 3))
        val l2 = fwd(l1, col("i") >= 4)
        val fw = l0.unionAll(l1).unionAll(l2)
          .localCheckpoint() // makespan + every backward level read it
        val mk = fw.groupBy("ok").agg(max("ef").cast("long").as("m"))
          .localCheckpoint() // joined by all three backward levels + mkp
        val b2 = fw.filter(col("i") >= 4).join(mk, Seq("ok"))
          .select(col("ok"), col("i"), col("dur"), col("es"), col("ef"),
            col("m").as("lf"))
        def bwd(level: org.apache.spark.sql.Column,
            children: org.apache.spark.sql.DataFrame) =
          fw.filter(level).join(mk, Seq("ok"))
            .join(children.select(col("ok").as("cok"),
              (col("i") / 2).cast("long").as("cpar"),
              (col("lf") - col("dur")).as("cls")),
              col("cok") === col("ok") && col("cpar") === col("i"), "left")
            .groupBy("ok", "i", "dur", "es", "ef")
            .agg(coalesce(min("cls"), max("m")).as("lf"))
        val b1 = bwd(col("i").isin(2, 3), b2)
        val b0 = bwd(col("i") === 1, b1)
        val bw = b0.select("ok", "i", "dur", "es", "ef", "lf")
          .unionAll(b1.select("ok", "i", "dur", "es", "ef", "lf"))
          .unionAll(b2.select("ok", "i", "dur", "es", "ef", "lf"))
        val pri = tbl(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority").as("priority"))
        val agg = bw.join(pri, col("o_orderkey") === col("ok"))
          .groupBy("priority")
          .agg(countDistinct("ok").cast("long").as("n_projects"),
            count(lit(1)).cast("long").as("n_tasks"),
            sum(when(col("lf") - col("ef") === 0, 1L).otherwise(0L))
              .cast("long").as("n_critical"),
            sum(col("lf") - col("ef")).cast("long").as("total_slack"))
        val mkp = mk.join(pri, col("o_orderkey") === col("ok"))
          .groupBy("priority")
          .agg(sum("m").cast("long").as("mksum"),
            count(lit(1)).cast("long").as("nmk"))
        val out = agg.join(mkp, Seq("priority"))
          .select(col("priority"), col("n_projects"), col("n_tasks"),
            col("n_critical"), col("total_slack"),
            expr("mksum * 1000 div nmk").as("mean_makespan_milli"))
          .orderBy("priority")
        H.materialized(out, caches = Nil, checkpoints = Seq(t, fw, mk))
      })
  )
}
