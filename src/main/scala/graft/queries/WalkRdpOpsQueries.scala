package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{VectorSim => VS}

/** Round-9 wave 135: graph-ANN navigability evaluation (multi-start greedy
  * walk on the kNN graph, scored against brute-force ground truth — the
  * audit that tells you whether a graph index can route THIS corpus before
  * you build one) and Ramer–Douglas–Peucker series simplification (the
  * standard polyline compaction behind every dashboard downsampler).
  */
object WalkRdpOpsQueries extends QueryModule {

  private val Hops = 12 // walk cap: improvement paths are strictly
                        // sim-increasing, so walks cannot cycle; 12 bounds
                        // worst-case work identically in both engines
  private val RdpRounds = 16

  def all: Seq[Q] = Seq(

    // GRAPH-ANN NAVIGABILITY EVAL: build the LSH-candidate kNN graph
    // (k=5, undirected), run a greedy best-first walk from 8 fixed entry
    // points per query, and score the best final state against the
    // brute-force top-1. On THIS corpus the embeddings are near-orthogonal
    // (within-label mean cosine ≈ 0.0016 — no cluster structure), so local
    // greedy routing stalls almost immediately — the measured hit rate and
    // approximation ratio quantify exactly WHY this corpus needs
    // cell-routed indexes (sim_ivfpq_topk/sim_ann_multiprobe) rather than
    // a graph index; that negative certificate is the point of the audit.
    // Scale shape: the graph build is the bucket equi-join (never
    // all-pairs); each walk round joins the ≤|queries|×|starts| frontier
    // to the kNN edges — bounded rows against an edge list that grows
    // linearly; the ground-truth leg is |queries|(≤17, FIXED by the
    // vec_id<1700 cap)×N — linear in the corpus, and only exists because
    // this is an eval. Walks are strictly sim-increasing (no cycles).
    Q("sim_graph_walk_eval",
      Some {
        val dotAB = VS.dotSql("a.v", "b.v")
        val dotQN = VS.dotSql("q.qv", "n.v")
        s"""WITH RECURSIVE ${VS.skewCappedCtesSql},
           |d AS MATERIALIZED (
           |  SELECT src, dst FROM (
           |    SELECT a.vec_id AS src, b.vec_id AS dst, row_number() OVER
           |      (PARTITION BY a.vec_id ORDER BY ($dotAB)
           |        / (sqrt(a.nrm) * sqrt(b.nrm)) DESC, b.vec_id) AS rnk
           |    FROM n a JOIN n b ON a.bucket = b.bucket
           |      AND a.vec_id <> b.vec_id) WHERE rnk <= 5),
           |knn AS MATERIALIZED (
           |  SELECT src, dst FROM d UNION SELECT dst, src FROM d),
           |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n
           |  WHERE vec_id % 101 = 7 AND vec_id < 1700),
           |qsim AS MATERIALIZED (
           |  SELECT q.qid, n.vec_id, ($dotQN) / (sqrt(q.qn) * sqrt(n.nrm))
           |    AS sim
           |  FROM q CROSS JOIN n),
           |bestnext AS MATERIALIZED (
           |  SELECT qid, src, dst, sim FROM (
           |    SELECT s.qid, e2.src, e2.dst, s.sim, row_number() OVER
           |      (PARTITION BY s.qid, e2.src ORDER BY s.sim DESC, e2.dst)
           |      AS r
           |    FROM knn e2 JOIN qsim s ON s.vec_id = e2.dst) WHERE r = 1),
           |starts AS (SELECT vec_id AS entry FROM n WHERE vec_id % 61 = 5
           |  ORDER BY vec_id LIMIT 8),
           |walk AS (
           |  SELECT s.qid, st.entry, CAST(st.entry AS BIGINT) AS cur,
           |    s.sim AS cursim, CAST(0 AS BIGINT) AS hops
           |  FROM starts st JOIN qsim s ON s.vec_id = st.entry
           |  UNION ALL
           |  SELECT w.qid, w.entry, b.dst, b.sim, w.hops + 1
           |  FROM walk w JOIN bestnext b ON b.qid = w.qid AND b.src = w.cur
           |  WHERE b.sim > w.cursim AND w.hops < $Hops),
           |wend AS (SELECT qid, entry, max(cursim) AS fsim,
           |    CAST(arg_max(cur, hops) AS BIGINT) AS fvec,
           |    CAST(max(hops) AS BIGINT) AS fhops
           |  FROM walk GROUP BY 1, 2),
           |fin AS (SELECT qid, fvec AS final_vec, fsim AS final_sim,
           |    fhops AS hops FROM (
           |  SELECT qid, fvec, fsim, fhops, row_number() OVER
           |    (PARTITION BY qid ORDER BY fsim DESC, fvec, entry) AS r
           |  FROM wend) WHERE r = 1),
           |t1 AS (SELECT qid, vec_id AS true_vec, sim AS true_sim FROM (
           |  SELECT qid, vec_id, sim, row_number() OVER
           |    (PARTITION BY qid ORDER BY sim DESC, vec_id) AS r
           |  FROM qsim) WHERE r = 1)
           |SELECT f.qid, f.hops, f.final_vec, f.final_sim,
           |  CAST(t1.true_vec AS BIGINT) AS true_vec, t1.true_sim,
           |  CASE WHEN f.final_vec = t1.true_vec THEN 1 ELSE 0 END AS hit,
           |  CAST(floor(f.final_sim / t1.true_sim * 1000000) AS BIGINT)
           |    AS approx_ratio_ppm
           |FROM fin f JOIN t1 ON t1.qid = f.qid ORDER BY f.qid
           |""".stripMargin
      },
      (s, dir) => {
        import graft.functions.{CustomExpressions => CE}
        val e0 = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        // skew-capped join keys (plain 8-plane buckets at gate SFs)
        val (nk, sigCk) = VS.skewCappedKey(e0, "v", e0.count(), "bucket")
        val n = nk.localCheckpoint() // graph build + query set + ground truth
        val a = n.select(col("vec_id").as("src"), col("v").as("av"),
          col("bucket"))
        val b = n.select(col("vec_id").as("dst"), col("v").as("bv"),
          col("bucket").as("bucket_b"))
        // sims via the fused native cosine_sim (bit-identical to the
        // oracle's unrolled form; a 64-term element_at chain here breaks
        // whole-stage codegen and measured 20x slower at 20k vectors),
        // and the 64-double arrays are PROJECTED AWAY before the ranking
        // window so the shuffle carries (src, dst, sim), not kilobyte rows
        val dEdges = a.join(b,
            col("bucket") === col("bucket_b") && col("src") =!= col("dst"))
          .withColumn("sim", CE.cosine_sim(col("av"), col("bv")))
          .select("src", "dst", "sim")
          .withColumn("rnk", row_number().over(
            Window.partitionBy("src").orderBy(col("sim").desc, col("dst"))))
          .filter(col("rnk") <= 5)
          .select("src", "dst")
        val knn = dEdges
          .union(dEdges.select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
          .localCheckpoint() // joined every walk round
        val q = n.filter(pmod(col("vec_id"), lit(101)) === 7 &&
            col("vec_id") < 1700)
          .select(col("vec_id").as("qid"), col("v").as("qv"))
        val starts = n.filter(pmod(col("vec_id"), lit(61)) === 5)
          .orderBy("vec_id").limit(8)
          .select(col("vec_id").as("entry"), col("v").as("sv"))
        // r12 restructure, mirroring the oracle's MATERIALIZED CTEs: the
        // old loop recomputed candidate cosines and checkpointed state
        // every round, plus a convergence-probe job — 67 jobs for a
        // ≤|q|×8-walker search. Now qsim (all query-to-vector sims, |q|
        // is FIXED at ≤17 by the vec_id cap, so this is one linear pass)
        // is computed ONCE and shared by the ground truth and bestnext;
        // bestnext (the best next hop per (query, node)) is computed ONCE;
        // and the 12 walk rounds chain LAZILY — a stalled walker is a
        // fixed point, so running the hop cap unconditionally computes
        // the same result as early exit, in ONE job instead of ~5/round.
        val qsim = n.select(col("vec_id"), col("v"))
          .crossJoin(broadcast(q))
          .select(col("qid"), col("vec_id"),
            CE.cosine_sim(col("qv"), col("v")).as("sim"))
          .localCheckpoint() // read by bestnext AND the ground truth
        val bn = knn
          .join(qsim.select(col("qid").as("qid2"), col("vec_id").as("dst"),
            col("sim").as("nsim")), "dst")
          .groupBy(col("qid2"), col("src").as("bsrc"))
          .agg(max(struct(col("nsim"), (-col("dst")).as("negDst")))
            .as("best"))
          .select(col("qid2"), col("bsrc"),
            col("best.nsim").as("bsim"), (-col("best.negDst")).as("bdst"))
          .localCheckpoint() // joined by all 12 lazy rounds
        val ckpts =
          scala.collection.mutable.ArrayBuffer(n, sigCk, knn, qsim, bn)
        var state = broadcast(starts).crossJoin(q)
          .withColumn("cursim", CE.cosine_sim(col("qv"), col("sv")))
          .select(col("qid"), col("entry"),
            col("entry").cast("long").as("cur"), col("cursim"),
            lit(0L).as("hops"))
        (1 to Hops).foreach { _ =>
          val adv = col("bsim").isNotNull && col("bsim") > col("cursim")
          state = state.join(bn,
              col("qid") === col("qid2") && col("cur") === col("bsrc"),
              "left")
            .select(col("qid"), col("entry"),
              when(adv, col("bdst")).otherwise(col("cur")).as("cur"),
              when(adv, col("bsim")).otherwise(col("cursim")).as("cursim"),
              when(adv, col("hops") + 1).otherwise(col("hops")).as("hops"))
        }
        val fin = state
          .withColumn("r", row_number().over(Window.partitionBy("qid")
            .orderBy(col("cursim").desc, col("cur"), col("entry"))))
          .filter(col("r") === 1)
          .select(col("qid"), col("hops"), col("cur").as("final_vec"),
            col("cursim").as("final_sim"))
        val t1 = qsim
          .withColumn("r", row_number().over(Window.partitionBy("qid")
            .orderBy(col("sim").desc, col("vec_id"))))
          .filter(col("r") === 1)
          .select(col("qid").as("qid3"), col("vec_id").as("true_vec"),
            col("sim").as("true_sim"))
        val out = fin.join(t1, col("qid") === col("qid3"))
          .select(col("qid"), col("hops"), col("final_vec"), col("final_sim"),
            col("true_vec"), col("true_sim"),
            when(col("final_vec") === col("true_vec"), 1L).otherwise(0L)
              .as("hit"),
            floor(col("final_sim") / col("true_sim") * 1000000)
              .cast("long").as("approx_ratio_ppm"))
          .orderBy("qid")
        H.materialized(out, Nil, ckpts.toSeq)
      }),

    // RAMER–DOUGLAS–PEUCKER SERIES SIMPLIFICATION: compact each brand's
    // 80-month revenue curve to the minimal point set whose linear
    // interpolation stays within 15% of the series range — vertical
    // deviation, the time-series RDP variant (perpendicular distance is
    // meaningless when the axes are months vs dollars), which also keeps
    // the whole recursion in exact integers: split iff max |cross| >
    // eps · Δm, where cross = Δm·(y−y₁) − Δy·(m−m₁). Each split lands at
    // the FIRST max-deviation point (list order = month order, both
    // engines). Scale shape: one fact-sized (brand, month) reduce; the
    // recursion is a per-brand worklist of segments over the calendar-
    // bounded 80-point grid — segment frames shrink as splits finalize,
    // every round is a bounded map. The 16-round cap is an INTENTIONAL
    // truncation, mirrored exactly by the oracle's `t = $RdpRounds` stop:
    // worst-case RDP split depth on 80 points is ~78 (every split peeling
    // a 2-point segment), but real revenue curves split log-deep, and any
    // segment still open at round 16 is emitted as-is by BOTH engines —
    // parity holds by construction; the cap bounds cost, not correctness
    // of the compare. Raising it costs one checkpointed pass per round.
    Q("ts_rdp_simplify",
      Some {
        val dev = """[abs( (s.pts[-1].m - s.pts[1].m) * (p.y - s.pts[1].y)
          | - (s.pts[-1].y - s.pts[1].y) * (p.m - s.pts[1].m) )
          | FOR p IN s.pts[2:-2]]""".stripMargin
        val inner =
          s"""CASE WHEN s.done OR len(s.pts) <= 2
             |  THEN [{'pts': s.pts, 'done': true}]
             |WHEN list_max($dev) > eps * (s.pts[-1].m - s.pts[1].m)
             |THEN [
             |  {'pts': s.pts[1 : 1 + list_position($dev, list_max($dev))],
             |   'done': false},
             |  {'pts': s.pts[1 + list_position($dev, list_max($dev)) : ],
             |   'done': false}]
             |ELSE [{'pts': s.pts, 'done': true}] END""".stripMargin
        s"""WITH RECURSIVE my AS (
           |  SELECT p_brand AS brand,
           |    CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate)
           |      AS BIGINT) AS m,
           |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
           |      // 100 AS BIGINT) AS y
           |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           |  JOIN part ON p_partkey = l_partkey GROUP BY 1, 2),
           |grid AS (
           |  SELECT b.brand, CAST(mo.m AS BIGINT) AS m, coalesce(my.y, 0)
           |    AS y
           |  FROM (SELECT DISTINCT brand FROM my) b
           |  CROSS JOIN (SELECT unnest(range(1, 81)) AS m) mo
           |  LEFT JOIN my ON my.brand = b.brand AND my.m = mo.m),
           |arr AS (
           |  SELECT brand, list({'m': m, 'y': y} ORDER BY m) AS pts,
           |    (max(y) - min(y)) * 150 // 1000 AS eps
           |  FROM grid GROUP BY 1),
           |st AS (
           |  SELECT brand, eps, 0 AS t, [{'pts': pts, 'done': false}] AS segs
           |  FROM arr
           |  UNION ALL
           |  SELECT brand, eps, t + 1, flatten([$inner FOR s IN segs])
           |  FROM st WHERE t < $RdpRounds),
           |fin AS (SELECT brand, segs FROM st WHERE t = $RdpRounds),
           |kept AS (
           |  SELECT brand,
           |    unnest([s.pts[1] FOR s IN segs] || [segs[-1].pts[-1]]) AS pt
           |  FROM fin)
           |SELECT brand, CAST(pt.m AS BIGINT) AS m, CAST(pt.y AS BIGINT)
           |  AS y
           |FROM kept ORDER BY brand, m
           |""".stripMargin
      },
      (s, dir) => {
        val my = tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
          .join(tbl(s, dir, "part"), col("p_partkey") === col("l_partkey"))
          .groupBy(col("p_brand").as("brand"),
            ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")))
              .cast("long").as("m"))
          .agg(expr("CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)" +
            " AS BIGINT)) div 100 AS BIGINT)").as("y"))
        val months = s.range(1, 81).select(col("id").as("m"))
        val grid = my.select("brand").distinct()
          .crossJoin(broadcast(months))
          .join(my, Seq("brand", "m"), "left")
          .select(col("brand"), col("m"), coalesce(col("y"), lit(0L)).as("y"))
        val arr = grid.groupBy("brand")
          .agg(
            transform(array_sort(collect_list(struct(col("m"), col("y")))),
              p => struct(p.getField("m").as("m"), p.getField("y").as("y")))
              .as("pts"),
            expr("CAST((max(y) - min(y)) * 150 div 1000 AS BIGINT)").as("eps"))
        // devs over interior points; split at the FIRST max-deviation point
        val devExpr = """transform(slice(pts, 2, size(pts) - 2), p ->
          | abs( (element_at(pts, -1).m - element_at(pts, 1).m)
          |        * (p.y - element_at(pts, 1).y)
          |    - (element_at(pts, -1).y - element_at(pts, 1).y)
          |        * (p.m - element_at(pts, 1).m) ))""".stripMargin
        val stepExpr = expr(
          s"""CASE WHEN done OR size(pts) <= 2
             |  THEN array(named_struct('pts', pts, 'done', true))
             |WHEN array_max($devExpr) >
             |    eps * (element_at(pts, -1).m - element_at(pts, 1).m)
             |THEN array(
             |  named_struct('pts', slice(pts, 1,
             |    CAST(array_position($devExpr, array_max($devExpr))
             |      AS INT) + 1), 'done', false),
             |  named_struct('pts', slice(pts,
             |    CAST(array_position($devExpr, array_max($devExpr))
             |      AS INT) + 1,
             |    size(pts) - CAST(array_position($devExpr,
             |      array_max($devExpr)) AS INT)), 'done', false))
             |ELSE array(named_struct('pts', pts, 'done', true)) END"""
            .stripMargin)
        var segs = arr.select(col("brand"), col("eps"), col("pts"),
          lit(false).as("done")).localCheckpoint()
        val ckpts = scala.collection.mutable.ArrayBuffer(segs)
        for (_ <- 1 to RdpRounds) {
          segs = segs.select(col("brand"), col("eps"),
              explode(stepExpr).as("sg"))
            .select(col("brand"), col("eps"), col("sg.pts").as("pts"),
              col("sg.done").as("done"))
            .localCheckpoint()
          ckpts += segs
        }
        val firsts = segs.select(col("brand"),
          element_at(col("pts"), 1).getField("m").as("m"),
          element_at(col("pts"), 1).getField("y").as("y"))
        val lasts = segs
          .select(col("brand"), element_at(col("pts"), -1).as("lp"))
          .groupBy("brand")
          .agg(max(struct(col("lp.m").as("m"), col("lp.y").as("y")))
            .as("last"))
          .select(col("brand"), col("last.m").as("m"), col("last.y").as("y"))
        val out = firsts.union(lasts).orderBy("brand", "m")
        H.materialized(out, Nil, ckpts.toSeq)
      })
  )
}
