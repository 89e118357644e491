package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Forty-first wave: degree assortativity (the network-science mixing
  * coefficient), CUSUM change alarms, and hash-seeded deterministic
  * walks (the DeepWalk sampling shape without nondeterministic RNG).
  */
object NetworkStatsOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Degree assortativity (Newman 2002): Pearson correlation of
    // endpoint degrees over edges. Every sum is an exact BIGINT over
    // integer degrees; the final r = num/sqrt(da·db) is one sqrt and one
    // division (both IEEE-exact). Negative r = hubs link to leaves
    // (disassortative — typical for trade/dependency graphs).
    Q("graph_assortativity",
      Some(s"WITH $uedges, " +
        "deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS d " +
        "FROM uedges GROUP BY src), " +
        "ed AS (SELECT da.d AS x, db.d AS y FROM uedges e " +
        "JOIN deg da ON da.id = e.src JOIN deg db ON db.id = e.dst), " +
        "s AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
        "CAST(sum(x * y) AS BIGINT) AS sxy, " +
        "CAST(sum(x * x) AS BIGINT) AS sxx, " +
        "CAST(sum(y * y) AS BIGINT) AS syy FROM ed) " +
        "SELECT n, n * sxy - sx * sy AS r_num, " +
        "n * sxx - sx * sx AS var_x, n * syy - sy * sy AS var_y, " +
        "CAST(n * sxy - sx * sy AS DOUBLE) / " +
        "(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * " +
        "sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r FROM s"),
      (s, dir) => {
        val uedges = RetrievalQueries.uedgesDf(s, dir).localCheckpoint()
        val deg = uedges.groupBy(col("src").as("id"))
          .agg(count(lit(1)).cast("long").as("d"))
        val ed = uedges
          .join(deg.select(col("id").as("ia"), col("d").as("x")),
            col("src") === col("ia"))
          .join(deg.select(col("id").as("ib"), col("d").as("y")),
            col("dst") === col("ib"))
        H.materialized(
          ed.agg(count(lit(1)).cast("long").as("n"),
              sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
              sum(col("x") * col("y")).cast("long").as("sxy"),
              sum(col("x") * col("x")).cast("long").as("sxx"),
              sum(col("y") * col("y")).cast("long").as("syy"))
            .select(col("n"),
              (col("n") * col("sxy") - col("sx") * col("sy")).as("r_num"),
              (col("n") * col("sxx") - col("sx") * col("sx")).as("var_x"),
              (col("n") * col("syy") - col("sy") * col("sy")).as("var_y"),
              ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
                (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
                  sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
                .as("r")),
          caches = Nil, checkpoints = Seq(uedges))
      }),

    // CUSUM change detection over the daily purchase-count series:
    // S_t = max(0, S_{t−1} + (x_t − μ − slack)) in n-SCALED integer
    // units (multiply through by n: no division anywhere, μ and the
    // slack k = μ/10 become exact integers n·x − Σx − Σx/10-scaled).
    // Alarms where the statistic crosses 5·σ-free threshold h = Σx/2.
    // The classic online detector, here as the KM-style fold.
    Q("ts_cusum_alarms",
      Some("WITH RECURSIVE daily AS (SELECT CAST(strftime(ts, '%d') AS BIGINT) AS day, " +
        "CAST(count(*) AS BIGINT) AS x FROM events " +
        "WHERE event_type = 'purchase' GROUP BY day), " +
        "t AS (SELECT day, x FROM daily WHERE day BETWEEN 1 AND 30), " +
        "st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx FROM t), " +
        "cusum AS (SELECT CAST(0 AS BIGINT) AS day, CAST(0 AS BIGINT) AS s " +
        "UNION ALL SELECT t.day, " +
        "greatest(0, c.s + (st.n * t.x * 10 - st.sx * 10 - st.sx)) " +
        "FROM cusum c JOIN t ON t.day = c.day + 1 CROSS JOIN st) " +
        "SELECT c.day, t.x, c.s AS cusum_scaled, " +
        "CASE WHEN c.s > 5 * st.sx THEN 1 ELSE 0 END AS alarm " +
        "FROM cusum c JOIN t ON t.day = c.day CROSS JOIN st ORDER BY c.day"),
      (s, dir) => {
        val daily = H.events(s, dir)
          .filter(col("event_type") === "purchase")
          .groupBy(date_format(col("ts"), "d").cast("long").as("day"))
          .agg(count(lit(1)).cast("long").as("x"))
          .filter(col("day").between(1, 30))
        val folded = daily
          .agg(array_sort(collect_list(struct(col("day"), col("x")))).as("arr"),
            count(lit(1)).cast("long").as("n"), sum("x").cast("long").as("sx"))
          .select(col("n"), col("sx"), explode(expr(
            "aggregate(arr, array(named_struct('day', CAST(0 AS BIGINT), " +
              "'x', CAST(0 AS BIGINT), 's', CAST(0 AS BIGINT))), " +
              "(acc, e) -> acc || array(named_struct('day', e.day, 'x', e.x, " +
              "'s', greatest(CAST(0 AS BIGINT), element_at(acc, -1).s + " +
              "(n * e.x * 10 - sx * 10 - sx)))))")).as("r"))
        folded.filter(col("r.day") > 0)
          .select(col("r.day").as("day"), col("r.x").as("x"),
            col("r.s").as("cusum_scaled"),
            when(col("r.s") > lit(5L) * col("sx"), 1).otherwise(0).as("alarm"))
          .orderBy("day")
      }),

    // Hash-seeded walks: 2 walks of length 4 from every node, the next
    // hop chosen by hash(node, walk, step) mod degree over the SORTED
    // neighbor list — DeepWalk-style corpus sampling with replay-exact
    // determinism (no RNG state to coordinate across executors; the hash
    // IS the seed). Visit counts per node are the walk corpus statistic.
    // Each step is one join against the ranked adjacency — per-round
    // checkpoints per the iterative-state rule.
    Q("graph_hash_walks",
      Some(s"WITH $uedges, " +
        "adj AS (SELECT src, dst, row_number() OVER " +
        "(PARTITION BY src ORDER BY dst) - 1 AS slot, " +
        "count(*) OVER (PARTITION BY src) AS deg FROM uedges), " +
        "w0 AS (SELECT n_nationkey AS cur, n_nationkey AS origin, wk, " +
        "CAST(0 AS BIGINT) AS step FROM nation, (SELECT unnest([0, 1]) AS wk) t), " +
        "s1 AS (SELECT a.dst AS cur, w.origin, w.wk, w.step + 1 AS step FROM w0 w " +
        "JOIN adj a ON a.src = w.cur " +
        "AND a.slot = (w.origin * 31 + w.wk * 17 + w.step * 7) % a.deg), " +
        "s2 AS (SELECT a.dst AS cur, w.origin, w.wk, w.step + 1 AS step FROM s1 w " +
        "JOIN adj a ON a.src = w.cur " +
        "AND a.slot = (w.origin * 31 + w.wk * 17 + w.step * 7) % a.deg), " +
        "s3 AS (SELECT a.dst AS cur, w.origin, w.wk, w.step + 1 AS step FROM s2 w " +
        "JOIN adj a ON a.src = w.cur " +
        "AND a.slot = (w.origin * 31 + w.wk * 17 + w.step * 7) % a.deg), " +
        "s4 AS (SELECT a.dst AS cur, w.origin, w.wk, w.step + 1 AS step FROM s3 w " +
        "JOIN adj a ON a.src = w.cur " +
        "AND a.slot = (w.origin * 31 + w.wk * 17 + w.step * 7) % a.deg), " +
        "visits AS (SELECT cur FROM s1 UNION ALL SELECT cur FROM s2 " +
        "UNION ALL SELECT cur FROM s3 UNION ALL SELECT cur FROM s4) " +
        "SELECT n_name, CAST(coalesce(v.c, 0) AS BIGINT) AS visits " +
        "FROM nation LEFT JOIN (SELECT cur, count(*) AS c FROM visits " +
        "GROUP BY cur) v ON v.cur = n_nationkey ORDER BY n_name"),
      (s, dir) => {
        val uedgesDf = RetrievalQueries.uedgesDf(s, dir)
        val adj = uedgesDf
          .withColumn("slot", row_number().over(
            Window.partitionBy("src").orderBy("dst")) - 1)
          .withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
          .localCheckpoint()
        val nodes = tbl(s, dir, "nation").select(col("n_nationkey").as("id"))
        val ckpts = scala.collection.mutable.ArrayBuffer(adj)
        var w = nodes
          .select(col("id").as("cur"), col("id").as("origin"),
            explode(expr("array(0, 1)")).as("wk"), lit(0L).as("step"))
          .localCheckpoint()
        ckpts += w
        var visits = Vector.empty[org.apache.spark.sql.DataFrame]
        for (_ <- 1 to 4) {
          w = w.join(adj,
              col("src") === col("cur") &&
                col("slot") === (col("origin") * 31 + col("wk") * 17 +
                  col("step") * 7) % col("deg"))
            .select(col("dst").as("cur"), col("origin"), col("wk"),
              (col("step") + 1).as("step"))
            .localCheckpoint()
          ckpts += w
          visits :+= w.select(col("cur"))
        }
        val vc = visits.reduce(_ unionAll _)
          .groupBy("cur").agg(count(lit(1)).cast("long").as("c"))
        val nation = tbl(s, dir, "nation")
        H.materialized(
          nation.join(vc, col("cur") === col("n_nationkey"), "left")
            .select(col("n_name"),
              coalesce(col("c"), lit(0L)).as("visits"))
            .orderBy("n_name"),
          caches = Nil, checkpoints = ckpts.toSeq)
      }))

  private def uedges: String = RetrievalQueries.uedgesSql
}
