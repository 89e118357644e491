package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Thirty-seventh wave: Condorcet rank fusion, Holt linear-trend
  * smoothing, and personalized PageRank — the voting, forecasting, and
  * seeded-graph members of their families, all integer-exact.
  */
object FusionOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Condorcet fusion with Copeland scoring: three rankers (length,
    // content hash, key stripe) vote pairwise; doc a beats b if a
    // majority of rankers place it earlier; Copeland = wins − losses.
    // The pairwise matrix is quadratic, so the universe is first cut to
    // the UNION of each ranker's top-100 (the production fusion-over-
    // pools shape — k² stays constant as the corpus grows). Integer
    // throughout; unlike RRF (rank_rrf) no reciprocal weights are needed.
    Q("rank_condorcet_copeland",
      Some("WITH r AS (SELECT doc_id, " +
        "row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r1, " +
        "row_number() OVER (ORDER BY md5(text), doc_id) AS r2, " +
        "row_number() OVER (ORDER BY doc_id % 97, doc_id) AS r3 " +
        "FROM documents), " +
        "pool AS (SELECT * FROM r WHERE r1 <= 100 OR r2 <= 100 OR r3 <= 100), " +
        "pw AS (SELECT a.doc_id AS da, b.doc_id AS db, " +
        "(CASE WHEN a.r1 < b.r1 THEN 1 ELSE 0 END + " +
        "CASE WHEN a.r2 < b.r2 THEN 1 ELSE 0 END + " +
        "CASE WHEN a.r3 < b.r3 THEN 1 ELSE 0 END) AS votes " +
        "FROM pool a JOIN pool b ON a.doc_id <> b.doc_id), " +
        "cope AS (SELECT da AS doc_id, " +
        "CAST(sum(CASE WHEN votes >= 2 THEN 1 ELSE -1 END) AS BIGINT) AS copeland " +
        "FROM pw GROUP BY da) " +
        "SELECT CAST(row_number() OVER (ORDER BY copeland DESC, doc_id) AS BIGINT) AS rnk, " +
        "doc_id, copeland FROM cope QUALIFY rnk <= 20 ORDER BY rnk"),
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val r = docs.select(col("doc_id"),
          row_number().over(Window.orderBy(col("n_chars").desc, col("doc_id"))).as("r1"),
          row_number().over(Window.orderBy(md5(col("text")), col("doc_id"))).as("r2"),
          row_number().over(Window.orderBy(col("doc_id") % 97, col("doc_id"))).as("r3"))
        val pool = r.filter(col("r1") <= 100 || col("r2") <= 100 || col("r3") <= 100)
          .localCheckpoint() // both pairwise sides read the pool
        val b = pool.select(col("doc_id").as("db"), col("r1").as("b1"),
          col("r2").as("b2"), col("r3").as("b3"))
        val pw = pool.join(b, col("doc_id") =!= col("db"))
          .select(col("doc_id"),
            (when(col("r1") < col("b1"), 1).otherwise(0) +
              when(col("r2") < col("b2"), 1).otherwise(0) +
              when(col("r3") < col("b3"), 1).otherwise(0)).as("votes"))
        val cope = pw.groupBy("doc_id")
          .agg(sum(when(col("votes") >= 2, 1L).otherwise(-1L))
            .cast("long").as("copeland"))
        val top = cope.orderBy(col("copeland").desc, col("doc_id")).limit(20)
        H.materialized(
          top.withColumn("rnk", row_number().over(
              Window.orderBy(col("copeland").desc, col("doc_id"))).cast("long"))
            .select("rnk", "doc_id", "copeland").orderBy("rnk"),
          caches = Nil, checkpoints = Seq(pool))
      }),

    // Holt's linear-trend smoothing over the daily event series, α = 1/5
    // and β = 1/10 as exact integer fractions: level' = (2y·10⁶ +
    // 8(level+trend)) div 10, trend' = ((level'−level) + 9·trend) div 10
    // — the same integer-fold discipline as ts_survival_km (array fold /
    // recursive CTE), extended with a 5-day linear forecast. ts_ewma
    // covers simple smoothing; Holt adds the trend component.
    Q("ts_holt_linear",
      Some("WITH RECURSIVE daily AS (SELECT CAST(strftime(ts, '%d') AS BIGINT) AS day, " +
        "CAST(count(*) AS BIGINT) AS y FROM events GROUP BY day), " +
        "t AS (SELECT day, y FROM daily WHERE day BETWEEN 1 AND 30), " +
        "seed AS (SELECT (SELECT y FROM t WHERE day = 1) AS y1, " +
        "(SELECT y FROM t WHERE day = 2) AS y2), " +
        "holt AS (SELECT CAST(1 AS BIGINT) AS day, " +
        "CAST(y1 * 1000000 AS BIGINT) AS l, " +
        "CAST((y2 - y1) * 1000000 AS BIGINT) AS tr FROM seed " +
        "UNION ALL SELECT t.day, " +
        "(2 * t.y * 1000000 + 8 * (h.l + h.tr)) // 10 AS l, " +
        "(((2 * t.y * 1000000 + 8 * (h.l + h.tr)) // 10 - h.l) + 9 * h.tr) // 10 AS tr " +
        "FROM holt h JOIN t ON t.day = h.day + 1), " +
        "lastrow AS (SELECT l, tr FROM holt WHERE day = 30), " +
        "fc AS (SELECT 30 + f AS day, CAST(-1 AS BIGINT) AS y, " +
        "l + f * tr AS fitted_micro FROM lastrow, " +
        "(SELECT unnest(range(1, 6)) AS f) fs) " +
        "SELECT h.day, t.y, h.l + h.tr AS fitted_micro FROM holt h " +
        "JOIN t ON t.day = h.day " +
        "UNION ALL SELECT day, y, fitted_micro FROM fc ORDER BY day"),
      (s, dir) => {
        val daily = H.events(s, dir)
          .groupBy(date_format(col("ts"), "d").cast("long").as("day"))
          .agg(count(lit(1)).cast("long").as("y"))
          .filter(col("day").between(1, 30))
        val folded = daily
          .agg(array_sort(collect_list(struct(col("day"), col("y")))).as("arr"))
          .select(expr(
            "aggregate(slice(arr, 2, 29), " +
              "array(named_struct('day', CAST(1 AS BIGINT), " +
              "'y', element_at(arr, 1).y, " +
              "'l', element_at(arr, 1).y * CAST(1000000 AS BIGINT), " +
              "'tr', (element_at(arr, 2).y - element_at(arr, 1).y) * CAST(1000000 AS BIGINT))), " +
              "(acc, x) -> acc || array(named_struct('day', x.day, 'y', x.y, " +
              "'l', (2 * x.y * 1000000 + 8 * (element_at(acc, -1).l + element_at(acc, -1).tr)) div 10, " +
              "'tr', (((2 * x.y * 1000000 + 8 * (element_at(acc, -1).l + element_at(acc, -1).tr)) div 10 " +
              "- element_at(acc, -1).l) + 9 * element_at(acc, -1).tr) div 10)))").as("h"))
          .localCheckpoint() // actuals AND the forecast tail read the fold
        val actual = folded.select(explode(col("h")).as("r"))
          .select(col("r.day").as("day"), col("r.y").as("y"),
            (col("r.l") + col("r.tr")).as("fitted_micro"))
        val fc = folded
          .select(expr("element_at(h, -1)").as("last"),
            explode(expr("sequence(1, 5)")).as("f"))
          .select((lit(30L) + col("f")).as("day"), lit(-1L).as("y"),
            (col("last.l") + col("f") * col("last.tr")).as("fitted_micro"))
        H.materialized(actual.unionAll(fc).orderBy("day"),
          caches = Nil, checkpoints = Seq(folded))
      }),

    // Personalized PageRank (topic-sensitive PR, Haveliwala 2002):
    // restart mass concentrates on nation 0, v' = (85·Pᵀv) div 100 +
    // 15·10⁶·[j = 0] div 100 — exact integers, three rounds over the
    // trade edge set. Reuses the pagerank sparsified edges; the ranking
    // answers "influence AS SEEN FROM node 0", which plain PR cannot.
    Q("graph_ppr_seed",
      Some {
        def round(i: Int, o: Int) =
          s"v$o AS (SELECT n.id, CAST((85 * coalesce(s.m, 0)) // 100 + " +
            "CASE WHEN n.id = 0 THEN 150000 ELSE 0 END AS BIGINT) AS p " +
            "FROM nodes n LEFT JOIN (SELECT e.dst AS id, " +
            s"CAST(sum((v$i.p * 1000000 // od.d) ) // 1000000 AS BIGINT) AS m " +
            s"FROM edges e JOIN v$i ON v$i.id = e.src " +
            "JOIN outdeg od ON od.src = e.src GROUP BY e.dst) s ON s.id = n.id)"
        "WITH pairs AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w " +
          "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
          "JOIN customer c ON o.o_custkey = c.c_custkey " +
          "JOIN supplier s ON l.l_suppkey = s.s_suppkey GROUP BY 1, 2), " +
          "edges AS (SELECT src, dst FROM (SELECT src, dst, " +
          "row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rk FROM pairs) WHERE rk <= 7), " +
          "outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src), " +
          "nodes AS (SELECT n_nationkey AS id FROM nation), " +
          "v0 AS (SELECT id, CAST(CASE WHEN id = 0 THEN 1000000 ELSE 0 END AS BIGINT) AS p FROM nodes), " +
          round(0, 1) + ", " + round(1, 2) + ", " + round(2, 3) + " " +
          "SELECT n_name, p AS ppr_micro FROM v3 JOIN nation ON id = n_nationkey " +
          "ORDER BY n_name"
      },
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
        val rk = row_number().over(
          Window.partitionBy("src").orderBy(col("w").desc, col("dst")))
        val edges = pairs.withColumn("rk", rk).filter(col("rk") <= 7)
          .select("src", "dst").localCheckpoint()
        val outdeg = edges.groupBy(col("src").as("os"))
          .agg(count(lit(1)).cast("long").as("d"))
        val nodes = tbl(s, dir, "nation").select(col("n_nationkey").as("id"))
        val ckpts = scala.collection.mutable.ArrayBuffer(edges)
        var v = nodes.select(col("id"),
          when(col("id") === 0, 1000000L).otherwise(0L).cast("long").as("p"))
          .localCheckpoint()
        ckpts += v
        for (_ <- 1 to 3) {
          val mass = edges
            .join(v.select(col("id").as("vid"), col("p")), col("vid") === col("src"))
            .join(outdeg, col("os") === col("src"))
            .groupBy(col("dst").as("mid"))
            .agg(expr("CAST(sum((p * 1000000 div d)) div 1000000 AS BIGINT)").as("m"))
          v = nodes.join(mass, col("id") === col("mid"), "left")
            .select(col("id"),
              (expr("(85 * coalesce(m, 0)) div 100") +
                when(col("id") === 0, 150000L).otherwise(0L)).cast("long").as("p"))
            .localCheckpoint()
          ckpts += v
        }
        val nation = tbl(s, dir, "nation")
        H.materialized(
          v.join(broadcast(nation), col("id") === col("n_nationkey"))
            .select(col("n_name"), col("p").as("ppr_micro"))
            .orderBy("n_name"),
          caches = Nil, checkpoints = ckpts.toSeq)
      }))
}
