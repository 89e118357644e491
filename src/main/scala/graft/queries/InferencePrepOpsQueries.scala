package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-11 waves 164-165: inference-serving prep — a KV-cache
  * prefix-sharing analysis (the vLLM paged-attention page-dedup
  * planning stat) and padding-minimal length bucketing for batch
  * inference. (pass@k is already on the board:
  * EvalMetricsOpsQueries.eval_pass_at_k.)
  */
object InferencePrepOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // KV-CACHE PREFIX SHARING: for page depths 8/16/32 chars, how much
    // prefix mass do documents share? Groups of docs with an identical
    // d-char prefix can share that page in a paged-attention cache —
    // chars_saved = Σ_groups (count−1)·d. One explode (3 rows per doc)
    // + one map-side-combined reduce per depth; the report is 3 rows.
    // The planning stat behind prefix-caching serving deployments.
    Q("cache_prefix_sharing",
      Some {
        def face(d: Int) =
          s"""SELECT CAST($d AS BIGINT) AS depth,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(DISTINCT substr(text, 1, $d)) AS BIGINT)
             |    AS n_prefixes,
             |  CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_shared_docs,
             |  CAST(sum(CASE WHEN cnt >= 2 THEN $d ELSE 0 END)
             |    - CAST(count(DISTINCT CASE WHEN cnt >= 2
             |        THEN substr(text, 1, $d) END) AS BIGINT) * $d
             |    AS BIGINT) AS chars_saved
             |FROM (SELECT text, count(*) OVER
             |    (PARTITION BY substr(text, 1, $d)) AS cnt
             |  FROM documents WHERE n_chars >= $d) t""".stripMargin
        Seq(8, 16, 32).map(face).mkString(" UNION ALL ") + " ORDER BY depth"
      },
      (s, dir) => {
        val docs = tbl(s, dir, "documents").select("text", "n_chars")
        val faces = Seq(8, 16, 32).map { d =>
          val g = docs.filter(col("n_chars") >= d)
            .groupBy(substring(col("text"), 1, d).as("p"))
            .agg(count(lit(1)).cast("long").as("cnt"))
          g.agg(sum("cnt").cast("long").as("n_docs"),
            count(lit(1)).cast("long").as("n_prefixes"),
            sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L))
              .cast("long").as("shared_docs"),
            sum(when(col("cnt") >= 2, (col("cnt") - 1) * d).otherwise(0L))
              .cast("long").as("chars_saved"))
            .select(lit(d.toLong).as("depth"), col("n_docs"),
              col("n_prefixes"), col("shared_docs").as("n_shared_docs"),
              col("chars_saved"))
        }
        faces.reduce(_ unionByName _).orderBy("depth")
      }),

    // LENGTH BUCKETING for batch inference: quantize doc length to
    // 32-char units (bounded 32-slot histogram), then pick 3 boundaries
    // (4 buckets) minimizing total padding — every doc pads to its
    // bucket's top. Enumeration of C(≤31,3) boundary triples over the
    // BOUNDED histogram domain via prefix sums: cost(l..r] =
    // r·(S0(r)−S0(l)) − (S1(r)−S1(l)). One fact-sized reduce builds the
    // histogram; everything after is domain-sized (the Wagner-Whitin /
    // stable-matching bounded-iteration discipline). Deterministic
    // tie-break: min cost, then lexicographic boundaries.
    Q("pack_length_buckets",
      Some(
        """WITH h AS (SELECT least(n_chars // 32, 31) AS b,
          |    CAST(count(*) AS BIGINT) AS c,
          |    CAST(sum(least(n_chars // 32, 31)) AS BIGINT) AS cb
          |  FROM documents GROUP BY 1),
          |d AS (SELECT range AS b FROM range(0, 32)),
          |s AS (SELECT d.b,
          |    (SELECT coalesce(CAST(sum(h.c) AS BIGINT), 0) FROM h
          |      WHERE h.b <= d.b) AS s0,
          |    (SELECT coalesce(CAST(sum(h.c * h.b) AS BIGINT), 0) FROM h
          |      WHERE h.b <= d.b) AS s1
          |  FROM d),
          |mx AS (SELECT max(b) AS top FROM h),
          |combos AS (SELECT b1.b AS x1, b2.b AS x2, b3.b AS x3, mx.top,
          |    (SELECT s0 FROM s WHERE b = b1.b) AS s0a,
          |    (SELECT s1 FROM s WHERE b = b1.b) AS s1a,
          |    (SELECT s0 FROM s WHERE b = b2.b) AS s0b,
          |    (SELECT s1 FROM s WHERE b = b2.b) AS s1b,
          |    (SELECT s0 FROM s WHERE b = b3.b) AS s0c,
          |    (SELECT s1 FROM s WHERE b = b3.b) AS s1c,
          |    (SELECT s0 FROM s WHERE b = mx.top) AS s0t,
          |    (SELECT s1 FROM s WHERE b = mx.top) AS s1t
          |  FROM d b1 CROSS JOIN d b2 CROSS JOIN d b3 CROSS JOIN mx
          |  WHERE b1.b < b2.b AND b2.b < b3.b AND b3.b < mx.top),
          |costed AS (SELECT x1, x2, x3,
          |    (x1 * s0a - s1a) + (x2 * (s0b - s0a) - (s1b - s1a))
          |    + (x3 * (s0c - s0b) - (s1c - s1b))
          |    + (top * (s0t - s0c) - (s1t - s1c)) AS pad_units
          |  FROM combos),
          |best AS (SELECT * FROM costed
          |  ORDER BY pad_units, x1, x2, x3 LIMIT 1)
          |SELECT best.x1 * 32 AS bound1_chars, best.x2 * 32 AS bound2_chars,
          |  best.x3 * 32 AS bound3_chars,
          |  CAST(best.pad_units * 32 AS BIGINT) AS padding_chars,
          |  (SELECT CAST(sum(c) AS BIGINT) FROM h) AS n_docs
          |FROM best
          |""".stripMargin),
      (s, dir) => {
        val h0 = tbl(s, dir, "documents")
          .groupBy(least(expr("n_chars div 32"), lit(31)).as("b"))
          .agg(count(lit(1)).cast("long").as("c"))
        // densify to the full 0..31 domain — the oracle enumerates
        // boundary positions at ABSENT buckets too, and the lexicographic
        // tie-break can land on one when a segment is empty
        val h = s.range(32).select(col("id").as("b"))
          .join(h0, Seq("b"), "left")
          .select(col("b"), coalesce(col("c"), lit(0L)).as("c"))
          .localCheckpoint() // bounded 32-row domain, read 3 times
        import org.apache.spark.sql.expressions.Window
        // prefix sums on the bounded 32-slot histogram domain: the
        // single-partition window is bounded by construction (the
        // windowAllow-listed class)
        val sp = h
          .withColumn("s0", sum("c").over(
            Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("s1", sum(col("c") * col("b")).over(
            Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("b"), col("s0").cast("long"), col("s1").cast("long"))
          .localCheckpoint()
        // `top` is the max PRESENT bucket (oracle's mx over h), while the
        // prefix sums at `top` equal the dense-domain totals (everything
        // above is empty by construction)
        val top = h.filter(col("c") > 0).agg(max("b").as("top"))
          .crossJoin(sp.agg(max("s0").as("s0t"), max("s1").as("s1t")))
        def leg(n: Int) = sp.select(col("b").as(s"x$n"),
          col("s0").as(s"s0$n"), col("s1").as(s"s1$n"))
        val costed = leg(1).crossJoin(leg(2)).crossJoin(leg(3))
          .crossJoin(broadcast(top))
          .filter(col("x1") < col("x2") && col("x2") < col("x3") &&
            col("x3") < col("top"))
          .select(col("x1"), col("x2"), col("x3"),
            (col("x1") * col("s01") - col("s11") +
              (col("x2") * (col("s02") - col("s01")) - (col("s12") - col("s11"))) +
              (col("x3") * (col("s03") - col("s02")) - (col("s13") - col("s12"))) +
              (col("top") * (col("s0t") - col("s03")) - (col("s1t") - col("s13"))))
              .cast("long").as("pad_units"))
        val best = costed
          .orderBy(col("pad_units"), col("x1"), col("x2"), col("x3"))
          .limit(1)
        val out = best.crossJoin(broadcast(h.agg(sum("c").cast("long").as("n_docs"))))
          .select((col("x1") * 32).cast("long").as("bound1_chars"),
            (col("x2") * 32).cast("long").as("bound2_chars"),
            (col("x3") * 32).cast("long").as("bound3_chars"),
            (col("pad_units") * 32).cast("long").as("padding_chars"),
            col("n_docs"))
        H.materialized(out, caches = Nil, checkpoints = Seq(h, sp))
      })
  )
}
