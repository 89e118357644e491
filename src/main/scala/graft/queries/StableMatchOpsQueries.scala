package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-10 wave 153: Gale-Shapley stable matching (deferred acceptance,
  * 1962) — the two-sided assignment primitive behind school choice,
  * ad-slot allocation, and replica placement. Regions propose to market
  * segments: a region ranks segments by its revenue in the cell, a
  * segment ranks regions by its order count. The engine runs the
  * SYNCHRONOUS-round variant (every free proposer proposes each round;
  * each segment tentatively holds its best offer) — proposer-optimality
  * of deferred acceptance makes the fixed point identical to the
  * sequential algorithm, so the matching is order-invariant and
  * oracle-checkable (cross-validated against an independent sequential
  * implementation while building the wave). Scale shape: ONE fact-sized
  * (region, segment) reduce builds both preference relations; the
  * iteration runs on the bounded 5x5 domain — round count is <= n^2 by
  * construction, INDEPENDENT of corpus size. The DuckDB twin carries the
  * whole matching state as one list-typed row through a recursive CTE.
  */
object StableMatchOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    Q("orders_stable_matching",
      Some {
        // the per-region target expression (engaged -> its segment, free
        // -> its ptr-th preference), reused across the lambda
        def tgt(v: String, p: String) =
          s"(CASE WHEN $v.eng <> '' THEN $v.eng " +
            s"ELSE list_filter(pr, $p -> $p.reg = $v.reg)[1].prefs[$v.ptr] END)"
        """WITH RECURSIVE cells AS (
          |  SELECT r.r_name AS reg, c.c_mktsegment AS seg,
          |    CAST(count(*) AS BIGINT) AS cnt,
          |    CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
          |      AS BIGINT) AS rev
          |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          |  JOIN nation n ON n.n_nationkey = c.c_nationkey
          |  JOIN region r ON r.r_regionkey = n.n_regionkey
          |  GROUP BY 1, 2),
          |prefr AS (SELECT reg, list(seg ORDER BY rev DESC, seg) AS prefs
          |  FROM cells GROUP BY reg),
          |prefsr AS (SELECT seg, reg,
          |    CAST(row_number() OVER (PARTITION BY seg
          |      ORDER BY cnt DESC, reg) AS BIGINT) AS rk
          |  FROM cells),
          |packed AS (SELECT
          |  (SELECT list(struct_pack(reg := reg, prefs := prefs)
          |    ORDER BY reg) FROM prefr) AS pr,
          |  (SELECT list(struct_pack(seg := seg, reg := reg, rk := rk))
          |    FROM prefsr) AS ps),
          |gs AS (
          |  SELECT 0 AS round,
          |    (SELECT list(struct_pack(reg := reg,
          |      ptr := CAST(1 AS BIGINT), eng := '') ORDER BY reg)
          |      FROM prefr) AS st,
          |    pr, ps FROM packed
          |  UNION ALL
          |  SELECT round + 1,
          |    list_transform(st, x ->
          |      CASE
          |      WHEN x.reg = (
          |         list_sort(list_transform(
          |           list_filter(st, y -> (y.eng = """.stripMargin +
          tgt("x", "p") + """)
          |             OR (y.eng = '' AND
          |                 list_filter(pr, p -> p.reg = y.reg)[1]
          |                   .prefs[y.ptr] = """.stripMargin +
          tgt("x", "p2") + """)),
          |           y -> struct_pack(
          |             rk := list_filter(ps, q -> q.seg = """.stripMargin +
          tgt("x", "p3") + """
          |                AND q.reg = y.reg)[1].rk,
          |             reg := y.reg)))[1].reg)
          |      THEN struct_pack(reg := x.reg, ptr := x.ptr,
          |        eng := """.stripMargin + tgt("x", "p") + """)
          |      ELSE struct_pack(reg := x.reg, ptr := x.ptr + 1, eng := '')
          |      END),
          |    pr, ps
          |  FROM gs
          |  WHERE round < 30
          |    AND len(list_filter(st, x -> x.eng = '')) > 0),
          |fin AS (SELECT round, unnest(st, recursive := true) FROM gs
          |  WHERE round = (SELECT max(round) FROM gs))
          |SELECT fin.reg AS region, fin.eng AS segment,
          |  fin.ptr AS region_rank, p.rk AS segment_rank,
          |  CAST(fin.round AS BIGINT) AS rounds
          |FROM fin JOIN prefsr p ON p.seg = fin.eng AND p.reg = fin.reg
          |ORDER BY region
          |""".stripMargin
      },
      (s, dir) => {
        // the ONLY fact-sized pass: the (region, segment) cell census
        val cells = tbl(s, dir, "orders")
          .join(tbl(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
          .join(broadcast(tbl(s, dir, "nation")),
            col("n_nationkey") === col("c_nationkey"))
          .join(broadcast(tbl(s, dir, "region")),
            col("r_regionkey") === col("n_regionkey"))
          .groupBy(col("r_name").as("reg"), col("c_mktsegment").as("seg"))
          .agg(count(lit(1)).cast("long").as("cnt"),
            sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
              .cast("long").as("rev"))
          .localCheckpoint() // both preference relations read it
        val prefR = cells.withColumn("idx", row_number().over(
            Window.partitionBy("reg").orderBy(col("rev").desc, col("seg")))
            .cast("long"))
          .select("reg", "idx", "seg").localCheckpoint() // joined per round
        val prefS = cells.withColumn("rk", row_number().over(
            Window.partitionBy("seg").orderBy(col("cnt").desc, col("reg")))
            .cast("long"))
          .select(col("seg"), col("reg"), col("rk"))
          .localCheckpoint() // joined per round
        var st = prefR.select(col("reg")).distinct()
          .select(col("reg"), lit(1L).as("ptr"), lit("").as("eng"))
          .localCheckpoint()
        var rounds = 0L
        // synchronous deferred acceptance on the bounded n x n domain:
        // round count <= n^2 regardless of corpus size; each round is
        // three joins over <= n-row frames. The per-round count() is the
        // blessed driver-side convergence probe (a 5-row frame).
        while (rounds < 30 && st.filter(col("eng") === "").count() > 0) {
          val holders = st.filter(col("eng") =!= "")
            .select(col("reg"), col("eng").as("seg"))
          val proposals = st.filter(col("eng") === "")
            .join(prefR.select(col("reg"), col("idx"),
              col("seg")), Seq("reg"))
            .filter(col("idx") === col("ptr"))
            .select(col("reg"), col("seg"))
          val winners = holders.unionByName(proposals)
            .join(prefS, Seq("seg", "reg"))
            .withColumn("w", row_number().over(
              Window.partitionBy("seg").orderBy(col("rk"), col("reg"))))
            .filter(col("w") === 1)
            .select(col("reg").as("wreg"), col("seg").as("wseg"))
          val next = st.join(winners, col("reg") === col("wreg"), "left")
            .select(col("reg"),
              when(col("wseg").isNotNull, col("ptr"))
                .otherwise(col("ptr") + 1).as("ptr"),
              coalesce(col("wseg"), lit("")).as("eng"))
            .localCheckpoint()
          H.freeLocalCheckpoint(st)
          st = next
          rounds += 1
        }
        val out = st
          .join(prefS.select(col("seg").as("eng"), col("reg"),
            col("rk")), Seq("reg", "eng"))
          .select(col("reg").as("region"), col("eng").as("segment"),
            col("ptr").as("region_rank"), col("rk").as("segment_rank"),
            lit(rounds).as("rounds"))
          .orderBy("region")
        H.materialized(out, caches = Nil,
          checkpoints = Seq(cells, prefR, prefS, st))
      })
  )
}
