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

    // CPM: tasks = DISTINCT line numbers per order (the synthetic
    // lineitem is not TPC-H-strict: (order, line) repeats and line sets
    // have gaps, so duration = summed quantity per slot and a task whose
    // parent slot is absent is a ROOT — es = 0). Forward pass per level
    // (ES/EF), makespan = max EF per order, backward pass per level
    // (LF = min child LS, childless tasks close at the makespan),
    // slack = LF - EF, critical = zero slack. Output: per order-priority
    // project census — projects, tasks, critical tasks, total slack
    // days, and mean makespan in milli.
    Q("orders_critical_path",
      Some(
        """WITH t AS (SELECT l_orderkey AS ok, l_linenumber AS i,
          |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS dur,
          |    l_linenumber // 2 AS par
          |  FROM lineitem WHERE l_linenumber BETWEEN 1 AND 7
          |  GROUP BY 1, 2, 4),
          |l0 AS (SELECT ok, i, dur, 0 AS es, dur AS ef FROM t WHERE i = 1),
          |l1 AS (SELECT t.ok, t.i, t.dur, coalesce(p.ef, 0) AS es,
          |    coalesce(p.ef, 0) + t.dur AS ef
          |  FROM t LEFT JOIN l0 p ON p.ok = t.ok AND p.i = t.par
          |  WHERE t.i IN (2, 3)),
          |l2 AS (SELECT t.ok, t.i, t.dur, coalesce(p.ef, 0) AS es,
          |    coalesce(p.ef, 0) + t.dur AS ef
          |  FROM t LEFT JOIN l1 p ON p.ok = t.ok AND p.i = t.par
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
        // The engine does NOT mirror the oracle's per-level joins: the
        // 7-slot tree is closed-form per order, so the whole CPM pivots
        // into one groupBy(orderkey) — d1..d7 duration slots, ES as the
        // ancestor-chain sum, LF via the two-level tail maximum — ONE
        // fact shuffle instead of six per-level joins (the r10 probe
        // measured the join form at slope 8.2/decade; this form rides the
        // single reduce). TPC-H line numbers are consecutive, so a null
        // slot means the line (and its subtree) is absent. Both sides pin
        // the task domain to slots 1..7 (oracle: WHERE l_linenumber
        // BETWEEN 1 AND 7) so a future non-strict provision emitting
        // line numbers >= 8 cannot diverge engine vs oracle (r10 advice).
        val slotAggs = (1 to 7).map(k =>
          sum(when(col("l_linenumber") === k,
            col("l_quantity").cast("long"))).as(s"d$k"))
        val piv = tbl(s, dir, "lineitem")
          .groupBy(col("l_orderkey").as("ok"))
          .agg(slotAggs.head, slotAggs.tail: _*)
        val cpm = piv
          // forward pass, closed form over the ancestor chain; an absent
          // parent slot makes the task a ROOT (coalesce to es = 0)
          .withColumn("ef1", col("d1"))
          .withColumn("ef2", coalesce(col("ef1"), lit(0L)) + col("d2"))
          .withColumn("ef3", coalesce(col("ef1"), lit(0L)) + col("d3"))
          .withColumn("ef4", coalesce(col("ef2"), lit(0L)) + col("d4"))
          .withColumn("ef5", coalesce(col("ef2"), lit(0L)) + col("d5"))
          .withColumn("ef6", coalesce(col("ef3"), lit(0L)) + col("d6"))
          .withColumn("ef7", coalesce(col("ef3"), lit(0L)) + col("d7"))
          .withColumn("m", greatest((1 to 7).map(k =>
            coalesce(col(s"ef$k"), lit(0L))): _*))
          // backward pass: tail(i) = max over present children of
          // dur(child) + tail(child); leaves tail 0
          .withColumn("t2", greatest(coalesce(col("d4"), lit(0L)),
            coalesce(col("d5"), lit(0L))))
          .withColumn("t3", greatest(coalesce(col("d6"), lit(0L)),
            coalesce(col("d7"), lit(0L))))
          .withColumn("t1", greatest(
            coalesce(col("d2") + col("t2"), lit(0L)),
            coalesce(col("d3") + col("t3"), lit(0L))))
        // slack(i) = (M - tail(i)) - ef(i); absent slots contribute null
        val slackCols = Seq(
          col("m") - col("t1") - col("ef1"),
          col("m") - col("t2") - col("ef2"),
          col("m") - col("t3") - col("ef3"),
          col("m") - col("ef4"), col("m") - col("ef5"),
          col("m") - col("ef6"), col("m") - col("ef7"))
        val perOrder = cpm.select(
          col("ok") +: col("m") +:
            slackCols.zipWithIndex.map { case (c, i) => c.as(s"sl${i + 1}") }: _*)
        val pri = tbl(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority").as("priority"))
        val out = perOrder.join(pri, col("o_orderkey") === col("ok"))
          .groupBy("priority")
          .agg(count(lit(1)).cast("long").as("n_projects"),
            (1 to 7).map(k => sum(when(col(s"sl$k").isNotNull, 1L)))
              .reduce(_ + _).cast("long").as("n_tasks"),
            (1 to 7).map(k => sum(when(col(s"sl$k") === 0, 1L)
              .otherwise(when(col(s"sl$k").isNotNull, 0L))))
              .reduce(_ + _).cast("long").as("n_critical"),
            (1 to 7).map(k => sum(col(s"sl$k"))).reduce(_ + _)
              .cast("long").as("total_slack"),
            sum("m").cast("long").as("mksum"))
          .select(col("priority"), col("n_projects"), col("n_tasks"),
            col("n_critical"), col("total_slack"),
            expr("mksum * 1000 div n_projects").as("mean_makespan_milli"))
          .orderBy("priority")
        out
      })
  )
}
