package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{H, Q, QueryModule}
import graft.H.{dec2, tbl}

/** Round-4 analytics wave: iterative graph computation (PageRank), funnel
  * analysis, time-series linear interpolation, CDC merge-apply, and three
  * SQL-surface rows (ordered LISTAGG, correlated LATERAL join, UNPIVOT
  * clause).
  *
  * All queries follow `graft.H`'s determinism rules. PageRank runs in
  * fixed-point integer micro-units so three unrolled iterations hash
  * identically on both engines (no float accumulation order anywhere).
  */
object AdvancedAnalyticsQueries extends QueryModule {

  /** DuckDB CTE pair shared by the PageRank oracle's three rounds. */
  private def prRoundSql(prev: String, cur: String): String =
    s"$cur AS (SELECT n.id, CAST(150000 + (85 * COALESCE(SUM(x.contrib), 0)) // 100 AS BIGINT) AS r " +
      s"FROM nodes n LEFT JOIN (SELECT e.dst AS id, $prev.r // o.d AS contrib " +
      s"FROM edges e JOIN $prev ON e.src = $prev.id JOIN outdeg o ON e.src = o.src) x " +
      "ON n.id = x.id GROUP BY n.id)"

  /** DuckDB CTE for one synchronous label-propagation round: each node
    * takes the most frequent label among its in-neighbors (ties → smallest
    * label), keeping its own when it has none. */
  private def lpRoundSql(prev: String, cur: String): String =
    s"$cur AS (SELECT n.id, coalesce(x.lbl, p.lbl) AS lbl FROM nodes n " +
      s"JOIN $prev p ON p.id = n.id LEFT JOIN (" +
      "SELECT id, lbl FROM (SELECT e.dst AS id, q.lbl, " +
      "row_number() OVER (PARTITION BY e.dst ORDER BY count(*) DESC, q.lbl) AS rk " +
      s"FROM uedges e JOIN $prev q ON q.id = e.src GROUP BY e.dst, q.lbl) " +
      "WHERE rk = 1) x ON x.id = n.id)"

  def all: Seq[Q] = Seq(

    // Community detection by synchronous label propagation (Raghavan et
    // al. 2007), 3 rounds, over the undirected trade graph (same top-7
    // sparsified nation edges as graph_pagerank, symmetrized). The async
    // LPA of the paper is order-dependent; the judged form is the
    // deterministic synchronous variant with a total tie order (max
    // neighbor-label frequency, ties → smallest label), so rounds are pure
    // integer relational algebra and hash identically in DuckDB. Scale
    // shape per round: edges ⋈ broadcast(label state) → two partial-agg
    // groupBys — label state is |nodes| rows while the billion-edge side
    // is never re-shuffled (same argument as pageRankMicro; at huge
    // |nodes| the same loop runs co-partitioned on src).
    Q("graph_label_prop",
      Some("WITH pairs AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey " +
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey GROUP BY 1, 2), " +
        "edges AS (SELECT src, dst FROM (SELECT src, dst, " +
        "row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rk FROM pairs) WHERE rk <= 7), " +
        "uedges AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges), " +
        "nodes AS (SELECT n_nationkey AS id FROM nation), " +
        "l0 AS (SELECT id, CAST(id AS BIGINT) AS lbl FROM nodes), " +
        lpRoundSql("l0", "l1") + ", " + lpRoundSql("l1", "l2") + ", " +
        lpRoundSql("l2", "l3") + " " +
        "SELECT n_name, lbl AS community FROM l3 JOIN nation ON id = n_nationkey " +
        "ORDER BY n_name"),
      (s, dir) => {
        val li = tbl(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        val ord = tbl(s, dir, "orders").select("o_orderkey", "o_custkey")
        val cust = tbl(s, dir, "customer").select("c_custkey", "c_nationkey")
        val supp = tbl(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
          .groupBy(cust("c_nationkey").cast("int").as("src"),
            supp("s_nationkey").cast("int").as("dst"))
          .agg(count(lit(1)).as("w"))
        val rk = row_number()
          .over(Window.partitionBy("src").orderBy(col("w").desc, col("dst")))
        val edges = pairs.withColumn("rk", rk).filter(col("rk") <= 7)
          .select("src", "dst")
        val uedges = edges.union(edges.select(col("dst").as("src"),
          col("src").as("dst"))).distinct().localCheckpoint()
        val nodes = tbl(s, dir, "nation").select(col("n_nationkey").as("id"))
        val l0 = nodes.select(col("id"), col("id").cast("long").as("lbl"))
        def round(prev: org.apache.spark.sql.DataFrame) = {
          val st = broadcast(prev.select(col("id").as("nid"), col("lbl")))
          val top = uedges.join(st, col("src") === col("nid"))
            .groupBy(col("dst").as("id"), col("lbl"))
            .agg(count(lit(1)).as("cnt"))
            .withColumn("rk", row_number().over(
              Window.partitionBy("id").orderBy(col("cnt").desc, col("lbl"))))
            .filter(col("rk") === 1).select(col("id"), col("lbl").as("nl"))
          prev.join(top, Seq("id"), "left")
            .select(col("id"), coalesce(col("nl"), col("lbl")).as("lbl"))
        }
        // checkpoint each round: prev is read twice (broadcast state +
        // outer join), so un-materialized rounds double the subtree per
        // iteration (the graph_shortest_path lesson)
        val ckpts = scala.collection.mutable.ArrayBuffer(uedges)
        var lbl = l0.localCheckpoint(); ckpts += lbl
        for (_ <- 1 to 3) { lbl = round(lbl).localCheckpoint(); ckpts += lbl }
        val nation = tbl(s, dir, "nation")
        val out = lbl.join(broadcast(nation), lbl("id") === nation("n_nationkey"))
          .select(col("n_name"), col("lbl").as("community"))
          .orderBy("n_name")
        H.materialized(out, Nil, ckpts.toSeq)
      }),

    // Fixed-point PageRank, 3 iterations, over the international trade
    // graph (customer nation -> supplier nation). The dense trade matrix is
    // sparsified scale-invariantly: each source keeps its top-7
    // destinations by trade count (ties by key), so the rule holds at any
    // SF. Ranks are BIGINT micro-units; contrib = r div outdeg and the
    // damped update (150000 + 85*sum div 100) are pure integer ops — no
    // float accumulation, so three unrolled rounds hash identically in
    // DuckDB. Scale shape: the edge list is built once (one shuffle +
    // window) and checkpointed; each round is edges ⋈ broadcast(ranks) →
    // groupBy(dst), i.e. rank state (|nodes| rows) broadcasts while the
    // billion-edge side never re-shuffles. At |nodes| too large to
    // broadcast, the same loop runs as a co-partitioned shuffle join on
    // src — the round structure (O(iterations) passes over edges) is the
    // scalable shape either way; lineage is truncated by the edge
    // checkpoint so the 3-round plan stays shallow.
    Q("graph_pagerank",
      Some("WITH pairs AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey " +
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey GROUP BY 1, 2), " +
        "edges AS (SELECT src, dst FROM (SELECT src, dst, " +
        "row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rk FROM pairs) WHERE rk <= 7), " +
        "outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY src), " +
        "nodes AS (SELECT n_nationkey AS id FROM nation), " +
        "r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes), " +
        prRoundSql("r0", "r1") + ", " + prRoundSql("r1", "r2") + ", " + prRoundSql("r2", "r3") + " " +
        "SELECT n_name, r AS rank_micro FROM r3 JOIN nation ON id = n_nationkey ORDER BY n_name"),
      (s, dir) => {
        val li = tbl(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        val ord = tbl(s, dir, "orders").select("o_orderkey", "o_custkey")
        val cust = tbl(s, dir, "customer").select("c_custkey", "c_nationkey")
        val supp = tbl(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
          .groupBy(cust("c_nationkey").cast("int").as("src"),
            supp("s_nationkey").cast("int").as("dst"))
          .agg(count(lit(1)).as("w"))
        val rk = row_number()
          .over(Window.partitionBy("src").orderBy(col("w").desc, col("dst")))
        val edges = pairs.withColumn("rk", rk).filter(col("rk") <= 7)
          .select("src", "dst")
        val nodes = tbl(s, dir, "nation").select(col("n_nationkey").as("id"))
        // iterative core lives in Iteratives.pageRankMicro — checkpoint
        // mode is a parameter (Local here; Reliable for cluster restart,
        // proven equivalent in IterativesSpec)
        val ranks = graft.functions.Iteratives.pageRankMicro(edges, nodes, rounds = 3)
        val nation = tbl(s, dir, "nation")
        val out = ranks.join(broadcast(nation), ranks("id") === nation("n_nationkey"))
          .select(col("n_name"), col("r").as("rank_micro"))
          .orderBy("n_name")
        H.materialized(out, Nil, Seq(ranks))
      }),

    // Conversion funnel with per-stage 24h deadlines: first view, first
    // click within 24h of that view, first purchase within 24h of that
    // click. Each stage is one groupBy(user_id) over a type-filtered scan
    // joined to the (much smaller) surviving cohort — all three joins hash
    // on user_id, so at scale they co-partition; no window over the full
    // event stream, no self-join on time ranges. 150 -> 60 -> 25 at sf0.01.
    Q("events_funnel_steps",
      Some("WITH v AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1), " +
        "c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id " +
        "AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 24 HOURS WHERE e.event_type = 'click' GROUP BY 1), " +
        "p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id " +
        "AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 24 HOURS WHERE e.event_type = 'purchase' GROUP BY 1) " +
        "SELECT (SELECT count(*) FROM v) AS n_view, (SELECT count(*) FROM c) AS n_click24, " +
        "(SELECT count(*) FROM p) AS n_purchase24"),
      (s, dir) => {
        val ev = H.events(s, dir).select("user_id", "event_type", "ts")
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val c = ev.filter(col("event_type") === "click").join(v, Seq("user_id"))
          .filter(col("ts") > col("t1") &&
            col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
          .groupBy("user_id").agg(min("ts").as("t2"))
        val p = ev.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
          .filter(col("ts") > col("t2") &&
            col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
          .groupBy("user_id").agg(min("ts").as("t3"))
        v.agg(count(lit(1)).as("n_view"))
          .crossJoin(c.agg(count(lit(1)).as("n_click24")))
          .crossJoin(p.agg(count(lit(1)).as("n_purchase24")))
      }),

    // Time-series linear interpolation: daily high-value event counts per
    // type over a generated 30-day spine; missing days are filled linearly
    // between the nearest known neighbors (edges clamp to the nearest
    // value). Two frame-bounded windows (carry-forward / carry-backward
    // with ignoreNulls) over the same partition order — Catalyst plans one
    // sort per direction on a |days|×|types| grid, never touching the raw
    // event volume again after the first aggregate. The interpolation
    // arithmetic is a single per-row IEEE expression, identical on both
    // engines.
    Q("ts_interpolate",
      Some("WITH spine AS (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30', " +
        "INTERVAL 1 DAY))::DATE AS day), " +
        "types AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type), " +
        "daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, count(*) AS n " +
        "FROM events WHERE value > 200 GROUP BY 1, 2), " +
        "grid AS (SELECT s.day, t.event_type, d.n FROM spine s CROSS JOIN types t " +
        "LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type), " +
        "marked AS (SELECT day, event_type, n, " +
        "last_value(CASE WHEN n IS NOT NULL THEN day END IGNORE NULLS) OVER w_prev AS pday, " +
        "last_value(n IGNORE NULLS) OVER w_prev AS pn, " +
        "first_value(CASE WHEN n IS NOT NULL THEN day END IGNORE NULLS) OVER w_next AS nday, " +
        "first_value(n IGNORE NULLS) OVER w_next AS nn FROM grid WINDOW " +
        "w_prev AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "w_next AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
        "SELECT strftime(day, '%Y-%m-%d') AS day, event_type, " +
        "CASE WHEN n IS NOT NULL THEN CAST(n AS DOUBLE) " +
        "WHEN pn IS NULL THEN CAST(nn AS DOUBLE) " +
        "WHEN nn IS NULL THEN CAST(pn AS DOUBLE) " +
        "ELSE pn + (nn - pn) * date_diff('day', pday, day) / date_diff('day', pday, nday) END AS filled " +
        "FROM marked ORDER BY event_type, day"),
      (s, dir) => {
        import s.implicits._
        val spine = s.range(1).select(explode(expr(
          "sequence(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)")).as("day"))
        val types = Seq("click", "error", "purchase", "signup", "view").toDF("event_type")
        val daily = H.events(s, dir).filter(col("value") > 200)
          .groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val grid = spine.crossJoin(types).join(daily, Seq("day", "event_type"), "left")
        val wPrev = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wNext = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        grid
          .withColumn("pday", last(when(col("n").isNotNull, col("day")), ignoreNulls = true).over(wPrev))
          .withColumn("pn", last(col("n"), ignoreNulls = true).over(wPrev))
          .withColumn("nday", first(when(col("n").isNotNull, col("day")), ignoreNulls = true).over(wNext))
          .withColumn("nn", first(col("n"), ignoreNulls = true).over(wNext))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("event_type"),
            when(col("n").isNotNull, col("n").cast("double"))
              .when(col("pn").isNull, col("nn").cast("double"))
              .when(col("nn").isNull, col("pn").cast("double"))
              .otherwise(col("pn") + (col("nn") - col("pn")) *
                datediff(col("day"), col("pday")) / datediff(col("nday"), col("pday")))
              .as("filled"))
          .orderBy("event_type", "day")
      }),

    // CDC merge-apply (MERGE INTO semantics on plain parquet): a change set
    // with insert/update/delete ops applied to the base table in one
    // full-outer join on the key — deletes drop, updates override, inserts
    // survive on the change side. One shuffle on the join key; at scale
    // this co-partitions with a bucketed base table. Result verified via
    // per-priority counts + exact totals (any wrong row moves a sum).
    Q("batch_merge_apply",
      Some("WITH changes AS (SELECT CASE WHEN o_orderkey % 10 = 3 THEN o_orderkey + 2000000000 " +
        "ELSE o_orderkey END AS key, " +
        "CASE WHEN o_orderkey % 10 = 0 THEN 'D' WHEN o_orderkey % 10 IN (1, 2) THEN 'U' ELSE 'I' END AS op, " +
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 100 AS DECIMAL(12,2)) AS new_price, o_orderpriority " +
        "FROM orders WHERE o_orderkey % 10 IN (0, 1, 2, 3)), " +
        "merged AS (SELECT COALESCE(b.o_orderkey, c.key) AS key, " +
        "CASE WHEN c.op = 'U' THEN CAST(c.new_price AS DOUBLE) " +
        "ELSE COALESCE(b.o_totalprice, CAST(c.new_price AS DOUBLE)) END AS price, " +
        "COALESCE(b.o_orderpriority, c.o_orderpriority) AS prio " +
        "FROM orders b FULL OUTER JOIN changes c ON b.o_orderkey = c.key " +
        "WHERE COALESCE(c.op, '') <> 'D') " +
        "SELECT prio, count(*) AS n, CAST(sum(CAST(price AS DECIMAL(14,2))) AS DOUBLE) AS total " +
        "FROM merged GROUP BY prio ORDER BY prio"),
      (s, dir) => {
        val base = tbl(s, dir, "orders")
        val m = col("o_orderkey") % 10
        val changes = base.filter(m.isin(0, 1, 2, 3))
          .select(
            when(m === 3, col("o_orderkey") + 2000000000L)
              .otherwise(col("o_orderkey")).as("key"),
            when(m === 0, "D").when(m.isin(1, 2), "U").otherwise("I").as("op"),
            (dec2(col("o_totalprice")) + 100).cast(DecimalType(12, 2)).as("new_price"),
            col("o_orderpriority").as("c_prio"))
        base.join(changes, base("o_orderkey") === changes("key"), "full_outer")
          .filter(coalesce(col("op"), lit("")) =!= "D")
          .select(
            when(col("op") === "U", col("new_price").cast("double"))
              .otherwise(coalesce(col("o_totalprice"), col("new_price").cast("double")))
              .as("price"),
            coalesce(col("o_orderpriority"), col("c_prio")).as("prio"))
          .groupBy("prio")
          .agg(count(lit(1)).as("n"),
            sum(col("price").cast(DecimalType(14, 2))).cast("double").as("total"))
          .orderBy("prio")
      }),

    // Linear-regression / correlation aggregates (regr_slope, regr_intercept,
    // corr) — computed from EXACT integer/decimal moments (n, Σx, Σy, Σx²,
    // Σxy, Σy²) so the result is engine-bit-exact, unlike the built-in
    // double-accumulating corr/regr_* whose partial-aggregation order
    // varies run to run. One hash-aggregate pass; the closed-form per-group
    // arithmetic is a single identical IEEE expression on both engines.
    Q("agg_regression",
      Some("WITH m AS (SELECT o_orderpriority, CAST(count(*) AS DOUBLE) AS n, " +
        "CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) AS sx, " +
        "CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy, " +
        "CAST(CAST(sum(x * x) AS BIGINT) AS DOUBLE) AS sxx, " +
        "CAST(CAST(sum(x * y) AS BIGINT) AS DOUBLE) AS sxy, " +
        "CAST(CAST(sum(y * y) AS BIGINT) AS DOUBLE) AS syy " +
        "FROM (SELECT o_orderpriority, " +
        "CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate) AS BIGINT) AS x, " +
        "CAST(floor(o_totalprice) AS BIGINT) AS y FROM orders) GROUP BY o_orderpriority) " +
        "SELECT o_orderpriority, CAST(n AS BIGINT) AS n, " +
        "(n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope, " +
        "(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept, " +
        "(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS r " +
        "FROM m ORDER BY o_orderpriority"),
      (s, dir) => {
        val o = tbl(s, dir, "orders").select(col("o_orderpriority"),
          datediff(col("o_orderdate"), lit("1992-01-01").cast("timestamp"))
            .cast("long").as("x"),
          floor(col("o_totalprice")).cast("long").as("y"))
        // integer moments only: y in whole dollars keeps Σy² < 2^53 far
        // past sf1, and a BIGINT→DOUBLE cast is single-rounded identically
        // on both engines — a big-DECIMAL→DOUBLE cast is not (DuckDB
        // double-rounds via (double)unscaled / (double)10^scale)
        val m = o.groupBy("o_orderpriority").agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("x")).cast("long").cast("double").as("sx"),
          sum(col("y")).cast("long").cast("double").as("sy"),
          sum(col("x") * col("x")).cast("long").cast("double").as("sxx"),
          sum(col("x") * col("y")).cast("long").cast("double").as("sxy"),
          sum(col("y") * col("y")).cast("long").cast("double").as("syy"))
        val cov = col("n") * col("sxy") - col("sx") * col("sy")
        val varx = col("n") * col("sxx") - col("sx") * col("sx")
        val vary = col("n") * col("syy") - col("sy") * col("sy")
        m.select(col("o_orderpriority"), col("n").cast("long").as("n"),
            (cov / varx).as("slope"),
            ((col("sy") - cov / varx * col("sx")) / col("n")).as("intercept"),
            (cov / (sqrt(varx) * sqrt(vary))).as("r"))
          .orderBy("o_orderpriority")
      }),

    // Ordered LISTAGG (SQL:2016 WITHIN GROUP) — suppliers per nation as a
    // deterministic comma-joined list. The ordered aggregate sorts inside
    // each hash-aggregate group; group payloads stay bounded by the group's
    // own members (no global sort).
    Q("agg_listagg",
      Some("SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS sups " +
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name"),
      (s, dir) => {
        tbl(s, dir, "supplier").createOrReplaceTempView("supplier_la")
        tbl(s, dir, "nation").createOrReplaceTempView("nation_la")
        s.sql("SELECT n_name, listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name) AS sups " +
          "FROM supplier_la JOIN nation_la ON s_nationkey = n_nationkey " +
          "GROUP BY n_name ORDER BY n_name")
      }),

    // Correlated LATERAL join: per region, the top-2 nations by key —
    // the subquery re-evaluates per outer row and its ORDER BY/LIMIT is
    // decorrelated by Catalyst into a ranked window (no per-row re-scan).
    Q("sql_lateral_join",
      Some("SELECT r.r_name, l.n_name, l.n_nationkey FROM region r, " +
        "LATERAL (SELECT n_name, n_nationkey FROM nation n " +
        "WHERE n.n_regionkey = r.r_regionkey ORDER BY n_nationkey DESC LIMIT 2) l " +
        "ORDER BY r.r_name, l.n_nationkey"),
      (s, dir) => {
        tbl(s, dir, "region").createOrReplaceTempView("region_lj")
        tbl(s, dir, "nation").createOrReplaceTempView("nation_lj")
        s.sql("SELECT r.r_name, l.n_name, l.n_nationkey FROM region_lj r, " +
          "LATERAL (SELECT n_name, n_nationkey FROM nation_lj n " +
          "WHERE n.n_regionkey = r.r_regionkey ORDER BY n_nationkey DESC LIMIT 2) l " +
          "ORDER BY r.r_name, l.n_nationkey")
      }),

    // Native whole-operator as-of join (graft.plans.AsOfJoinExec): custom
    // logical node + planner strategy + physical merge pass, sharing
    // join_asof's oracle — the two formulations must agree bit-for-bit.
    // Unlike the composed equi-join + row_number shape, the physical
    // operator streams both co-partitioned sorted runs once and keeps one
    // candidate row of state — no |left|×|matching-right| intermediate.
    Q("join_asof_native",
      Some("WITH j AS (SELECT p.event_id AS p_id, p.ts AS pts, " +
        "c.event_id AS c_id, c.ts AS cts, " +
        "row_number() OVER (PARTITION BY p.event_id " +
        "ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST) AS rn " +
        "FROM events p LEFT JOIN events c ON c.user_id = p.user_id " +
        "AND c.event_type = 'click' AND c.ts <= p.ts " +
        "WHERE p.event_type = 'purchase') " +
        "SELECT p_id, strftime(pts, '%Y-%m-%d %H:%M:%S.%f') AS p_ts, " +
        "coalesce(c_id, -1) AS c_id, " +
        "coalesce(strftime(cts, '%Y-%m-%d %H:%M:%S.%f'), '-') AS c_ts " +
        "FROM j WHERE rn = 1 ORDER BY p_id"),
      (s, dir) => {
        val ev = H.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
            col("ts").as("c_ts"))
        graft.plans.AsOfJoin.asOf(purchases, clicks,
            leftKey = "user_id", rightKey = "c_user",
            leftTs = "p_ts", rightTs = "c_ts", rightTieBreak = "c_id")
          .select(col("p_id"), H.fmtTs(col("p_ts")).as("p_ts"),
            coalesce(col("c_id"), lit(-1L)).as("c_id"),
            coalesce(H.fmtTs(col("c_ts")), lit("-")).as("c_ts"))
          .orderBy("p_id")
      }),

    // Tolerance-bounded as-of (pandas merge_asof(tolerance=...) semantics)
    // through the same native operator: matches older than 6h lapse to
    // null-extension. The bound is checked on the final candidate only —
    // the best candidate either qualifies or nothing does — so the merge
    // pass still carries one row of state.
    Q("join_asof_tolerance",
      Some("WITH j AS (SELECT p.event_id AS p_id, p.ts AS pts, " +
        "c.event_id AS c_id, c.ts AS cts, " +
        "row_number() OVER (PARTITION BY p.event_id " +
        "ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST) AS rn " +
        "FROM events p LEFT JOIN events c ON c.user_id = p.user_id " +
        "AND c.event_type = 'click' AND c.ts <= p.ts " +
        "AND c.ts >= p.ts - INTERVAL 6 HOURS " +
        "WHERE p.event_type = 'purchase') " +
        "SELECT p_id, strftime(pts, '%Y-%m-%d %H:%M:%S.%f') AS p_ts, " +
        "coalesce(c_id, -1) AS c_id, " +
        "coalesce(strftime(cts, '%Y-%m-%d %H:%M:%S.%f'), '-') AS c_ts " +
        "FROM j WHERE rn = 1 ORDER BY p_id"),
      (s, dir) => {
        val ev = H.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
            col("ts").as("c_ts"))
        graft.plans.AsOfJoin.asOf(purchases, clicks,
            leftKey = "user_id", rightKey = "c_user",
            leftTs = "p_ts", rightTs = "c_ts", rightTieBreak = "c_id",
            toleranceMicros = Some(6L * 3600 * 1000000))
          .select(col("p_id"), H.fmtTs(col("p_ts")).as("p_ts"),
            coalesce(col("c_id"), lit(-1L)).as("c_id"),
            coalesce(H.fmtTs(col("c_ts")), lit("-")).as("c_ts"))
          .orderBy("p_id")
      }),

    // Forward-direction as-of through the same operator: the FIRST click
    // at/after each purchase (merge_asof direction='forward'). The forward
    // merge needs no candidate state at all — rows behind the left time
    // are dead for every later left, and the matched row is peeked, not
    // consumed.
    Q("join_asof_forward",
      Some("WITH j AS (SELECT p.event_id AS p_id, p.ts AS pts, " +
        "c.event_id AS c_id, c.ts AS cts, " +
        "row_number() OVER (PARTITION BY p.event_id " +
        "ORDER BY c.ts ASC NULLS LAST, c.event_id ASC NULLS LAST) AS rn " +
        "FROM events p LEFT JOIN events c ON c.user_id = p.user_id " +
        "AND c.event_type = 'click' AND c.ts >= p.ts " +
        "WHERE p.event_type = 'purchase') " +
        "SELECT p_id, strftime(pts, '%Y-%m-%d %H:%M:%S.%f') AS p_ts, " +
        "coalesce(c_id, -1) AS c_id, " +
        "coalesce(strftime(cts, '%Y-%m-%d %H:%M:%S.%f'), '-') AS c_ts " +
        "FROM j WHERE rn = 1 ORDER BY p_id"),
      (s, dir) => {
        val ev = H.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
            col("ts").as("c_ts"))
        graft.plans.AsOfJoin.asOf(purchases, clicks,
            leftKey = "user_id", rightKey = "c_user",
            leftTs = "p_ts", rightTs = "c_ts", rightTieBreak = "c_id",
            forward = true)
          .select(col("p_id"), H.fmtTs(col("p_ts")).as("p_ts"),
            coalesce(col("c_id"), lit(-1L)).as("c_id"),
            coalesce(H.fmtTs(col("c_ts")), lit("-")).as("c_ts"))
          .orderBy("p_id")
      }),

    // UNPIVOT SQL clause (the standard-dialect twin of the stack() query):
    // wide per-order measures to (key, value) rows; both engines exclude
    // NULL measures by default.
    Q("sql_unpivot",
      Some("SELECT o_orderkey, k, v FROM (SELECT o_orderkey, o_totalprice AS price, " +
        "CAST(o_custkey AS DOUBLE) AS cust FROM orders WHERE o_orderkey % 100 = 0) " +
        "UNPIVOT (v FOR k IN (price, cust)) ORDER BY o_orderkey, k"),
      (s, dir) => {
        tbl(s, dir, "orders").createOrReplaceTempView("orders_up")
        s.sql("SELECT o_orderkey, k, v FROM (SELECT o_orderkey, o_totalprice AS price, " +
          "CAST(o_custkey AS DOUBLE) AS cust FROM orders_up WHERE o_orderkey % 100 = 0) " +
          "UNPIVOT (v FOR k IN (price, cust)) ORDER BY o_orderkey, k")
      })
  )
}
