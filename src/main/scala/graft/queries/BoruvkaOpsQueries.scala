package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Sixty-ninth wave: minimum spanning forest by distributed Boruvka
  * rounds, IQR fence outlier audit, and hapax-legomena vocabulary
  * richness.
  *
  * The MST determinism argument: edge weights are a strict total
  * order (row_number), so the MSF is UNIQUE — the engine may run
  * Boruvka while the oracle replays Kruskal, and the outputs must
  * still agree edge-for-edge.
  */
object BoruvkaOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Minimum spanning forest of the co-purchase graph, distance =
    // support rank (strongest ties first). Boruvka: every component
    // picks its minimum outgoing edge in one grouped pass (no
    // sequential edge scan), the chosen component-links contract by
    // min-label pointer rounds, repeat — O(log V) outer rounds, each
    // a bounded shuffle, per-round localCheckpoint. This is THE
    // scalable MST schedule (Kruskal's sorted scan is inherently
    // serial); at 100 TB the same plan runs on billions of edges.
    Q("graph_mst_boruvka",
      Some(
        """WITH RECURSIVE li AS MATERIALIZED (
          |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          |  FROM lineitem WHERE l_partkey < 60),
          |ed AS MATERIALIZED (SELECT a.pk AS u, b.pk AS v,
          |  CAST(count(*) AS BIGINT) AS support
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          |  GROUP BY 1, 2),
          |rk AS MATERIALIZED (SELECT u, v, support,
          |  CAST(row_number() OVER (ORDER BY support DESC, u, v)
          |    AS BIGINT) AS rn FROM ed),
          |k AS (
          |  SELECT CAST(0 AS BIGINT) AS i,
          |    [CAST(x AS BIGINT) FOR x IN range(0, 60)] AS comp,
          |    CAST(NULL AS BIGINT) AS tu, CAST(NULL AS BIGINT) AS tv,
          |    false AS took
          |  UNION ALL
          |  SELECT rk.rn,
          |    CASE WHEN k.comp[CAST(rk.u AS INTEGER) + 1]
          |        <> k.comp[CAST(rk.v AS INTEGER) + 1]
          |      THEN list_transform(k.comp, x -> CASE
          |        WHEN x = greatest(k.comp[CAST(rk.u AS INTEGER) + 1],
          |          k.comp[CAST(rk.v AS INTEGER) + 1])
          |        THEN least(k.comp[CAST(rk.u AS INTEGER) + 1],
          |          k.comp[CAST(rk.v AS INTEGER) + 1])
          |        ELSE x END)
          |      ELSE k.comp END,
          |    rk.u, rk.v,
          |    k.comp[CAST(rk.u AS INTEGER) + 1]
          |      <> k.comp[CAST(rk.v AS INTEGER) + 1]
          |  FROM k JOIN rk ON rk.rn = k.i + 1
          |)
          |SELECT CAST(k.tu AS BIGINT) AS u, CAST(k.tv AS BIGINT) AS v,
          |  rk.support
          |FROM k JOIN rk ON rk.u = k.tu AND rk.v = k.tv
          |WHERE k.took ORDER BY u, v
          |""".stripMargin),
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
          .filter(col("l_partkey") < 60)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
          .localCheckpoint() // both 2-path sides
        val ed = li.join(
            li.select(col("ok").as("ok2"), col("pk").as("pk2")),
            col("ok") === col("ok2") && col("pk") < col("pk2"))
          .groupBy(col("pk").as("u"), col("pk2").as("v"))
          .agg(count(lit(1)).cast("long").as("support"))
        // bounded edge set: the global rank window is fine here
        val rk = ed.withColumn("rn", row_number().over(
            Window.orderBy(col("support").desc, col("u"), col("v")))
          .cast("long")).localCheckpoint()
        // comp: vertex -> component label, initially itself
        var comp = rk.select(col("u").as("vert"))
          .union(rk.select(col("v").as("vert"))).distinct()
          .select(col("vert"), col("vert").as("c"))
          .localCheckpoint()
        var forest = rk.filter(lit(false)).localCheckpoint()
        var rounds = 0
        var done = false
        while (!done && rounds < 20) {
          val lab = rk
            .join(comp.select(col("vert").as("cu_v"), col("c").as("cu")),
              col("u") === col("cu_v"))
            .join(comp.select(col("vert").as("cv_v"), col("c").as("cv")),
              col("v") === col("cv_v"))
            .filter(col("cu") =!= col("cv"))
            .select(col("u"), col("v"), col("support"), col("rn"),
              col("cu"), col("cv"))
            .localCheckpoint() // emptiness probe + candidate pick
          if (lab.count() == 0) done = true
          else {
            // each component nominates its min-rank outgoing edge
            val sel = lab.select(col("cu").as("c"), col("rn"))
              .union(lab.select(col("cv").as("c"), col("rn")))
              .groupBy("c").agg(min("rn").as("mrn"))
              .join(lab, col("mrn") === col("rn"))
              .select(col("u"), col("v"), col("support"), col("rn"),
                col("cu"), col("cv"))
              .distinct()
              .localCheckpoint() // forest append + contraction links
            forest = forest.union(
              sel.select(col("u"), col("v"), col("support"), col("rn")))
              .localCheckpoint()
            // contract: min-label propagation over the chosen links.
            // Gather form — p'(a) = min(p(a), min over neighbors of
            // p(b)) — lets the minimum flow BOTH ways along chains
            // (pointer-doubling alone strands nodes whose own pointer
            // is already a self-loop); fixpoint in diameter rounds.
            val links = sel.select(col("cu").as("a"), col("cv").as("b"))
              .union(sel.select(col("cv").as("a"), col("cu").as("b")))
              .distinct()
              .localCheckpoint() // reused every gather round
            var m = links.groupBy("a").agg(min("b").as("mb"))
              .select(col("a"), least(col("a"), col("mb")).as("p"))
              .localCheckpoint()
            var stable = false
            var inner = 0
            while (!stable && inner < 30) {
              val nbr = links
                .join(m.select(col("a").as("b"), col("p").as("pb")),
                  Seq("b"))
                .groupBy("a").agg(min("pb").as("mnb"))
              val m2 = m.join(nbr, Seq("a"), "left")
                .select(col("a"), least(col("p"),
                  coalesce(col("mnb"), col("p"))).as("p"))
                .localCheckpoint() // gather round (iterative-state rule)
              stable = m2.join(m.select(col("a"), col("p").as("p0")),
                Seq("a")).filter(col("p") =!= col("p0")).count() == 0
              m = m2
              inner += 1
            }
            comp = comp.join(m.select(col("a"), col("p")),
                col("c") === col("a"), "left")
              .select(col("vert"), coalesce(col("p"), col("c")).as("c"))
              .localCheckpoint() // relabeled components
          }
          rounds += 1
        }
        forest.select(col("u"), col("v"), col("support"))
          .orderBy("u", "v")
      }),

    // IQR fence outlier audit per event type: Q1/Q3 as rank-picked
    // exact discrete quantiles of the cent values, fences at 1.5 IQR
    // (exact: 2*value vs 2*fence avoids halving), and the flagged
    // share per type — the box-plot rule as a data-quality gate.
    Q("dq_iqr_fences",
      Some(
        """WITH e AS (SELECT event_type AS t,
          |  CAST(floor(value*100 + 0.5) AS BIGINT) AS c FROM events),
          |r AS (SELECT t, c, CAST(row_number() OVER (PARTITION BY t
          |    ORDER BY c) AS BIGINT) AS rn,
          |  CAST(count(*) OVER (PARTITION BY t) AS BIGINT) AS n
          |  FROM e),
          |q AS (SELECT t, n,
          |  CAST(min(CASE WHEN 4*rn >= n THEN c END) AS BIGINT) AS q1,
          |  CAST(min(CASE WHEN 4*rn >= 3*n THEN c END) AS BIGINT)
          |    AS q3
          |  FROM r GROUP BY t, n)
          |SELECT q.t AS event_type, q.n, q.q1, q.q3,
          |  q.q3 - q.q1 AS iqr,
          |  CAST(sum(CASE WHEN 2*e.c < 2*q.q1 - 3*(q.q3 - q.q1)
          |    OR 2*e.c > 2*q.q3 + 3*(q.q3 - q.q1)
          |    THEN 1 ELSE 0 END) AS BIGINT) AS outliers,
          |  CAST(sum(CASE WHEN 2*e.c < 2*q.q1 - 3*(q.q3 - q.q1)
          |    OR 2*e.c > 2*q.q3 + 3*(q.q3 - q.q1)
          |    THEN 1 ELSE 0 END) * 1000000 // q.n AS BIGINT)
          |    AS outlier_micro
          |FROM q JOIN e ON e.t = q.t
          |GROUP BY 1, 2, 3, 4, 5 ORDER BY event_type
          |""".stripMargin),
      (s, dir) => {
        val e = H.events(s, dir)
          .select(col("event_type").as("t"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
          .localCheckpoint() // quantile pass + fence pass
        val r = e
          .withColumn("rn", row_number().over(Window.partitionBy("t")
            .orderBy("c")).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("t"))
            .cast("long"))
        val q = r.groupBy("t", "n")
          .agg(min(when(lit(4) * col("rn") >= col("n"), col("c")))
            .cast("long").as("q1"),
            min(when(lit(4) * col("rn") >= lit(3) * col("n"), col("c")))
              .cast("long").as("q3"))
        val lo = lit(2) * col("q1") - lit(3) * (col("q3") - col("q1"))
        val hi = lit(2) * col("q3") + lit(3) * (col("q3") - col("q1"))
        val out = q.join(e.select(col("t").as("t2"), col("c")),
            col("t2") === col("t"))
          .groupBy(col("t"), col("n"), col("q1"), col("q3"))
          .agg(sum(when(lit(2) * col("c") < lo ||
            lit(2) * col("c") > hi, 1).otherwise(0)).cast("long")
            .as("outliers"))
          .select(col("t").as("event_type"), col("n"), col("q1"),
            col("q3"), (col("q3") - col("q1")).as("iqr"),
            col("outliers"),
            expr("outliers * 1000000 div n").as("outlier_micro"))
          .orderBy("event_type")
        H.materialized(out, caches = Nil, checkpoints = Seq(e))
      }),

    // Hapax legomena per source: the share of vocabulary seen exactly
    // once — the classic vocabulary-richness / crawl-quality signal
    // (low hapax share flags template-stamped or deduplicated-to-death
    // sources). One token explode, two grouped passes.
    Q("text_hapax_ratio",
      Some(
        """WITH tok AS (SELECT source, unnest(string_split(text, ' '))
          |  AS w FROM documents),
          |wc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
          |  FROM tok WHERE w <> '' GROUP BY 1, 2)
          |SELECT source, CAST(count(*) AS BIGINT) AS vocab,
          |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS hapax,
          |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS dis,
          |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
          |    // count(*) AS BIGINT) AS hapax_micro
          |FROM wc GROUP BY source ORDER BY source
          |""".stripMargin),
      (s, dir) => {
        tbl(s, dir, "documents")
          .select(col("source"),
            explode(split(col("text"), " ", -1)).as("w"))
          .filter(col("w") =!= "")
          .groupBy("source", "w")
          .agg(count(lit(1)).cast("long").as("c"))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("vocab"),
            sum(when(col("c") === 1, 1).otherwise(0)).cast("long")
              .as("hapax"),
            sum(when(col("c") === 2, 1).otherwise(0)).cast("long")
              .as("dis"))
          .select(col("source"), col("vocab"), col("hapax"), col("dis"),
            expr("hapax * 1000000 div vocab").as("hapax_micro"))
          .orderBy("source")
      }))
}
