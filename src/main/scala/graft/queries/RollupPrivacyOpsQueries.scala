package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Hundred-twentieth wave: practical disclosure control, pooling
  * justification, and style fingerprints — small groups folded into an
  * OTHER bucket with the grand total preserved BY CONSTRUCTION (the
  * release pattern that actually ships, vs wave 98's flag-only
  * suppression), Woolf's test for odds-ratio homogeneity (was wave
  * 113's Mantel-Haenszel pooling even justified?), and a casing
  * profile per source (UPPER/Title/lower/other token shares — the
  * cheapest style fingerprint that separates shouting spam from
  * prose).
  *
  * Exactness: the rollup emits its own reconciliation column; Woolf's
  * per-stratum ln(OR) terms (Haldane-corrected at +½ via 2× integer
  * cells) floor to micro pre-sum; casing classes are codegen'd regex
  * counts in exact bps.
  */
object RollupPrivacyOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Small-group rollup: the (nation, priority) 2001 release again —
    // but groups under 5 orders fold into ('OTHER', 'OTHER') instead
    // of being flagged. The reconciliation column proves the fold
    // preserved every cent; group counts shrink, totals don't. This is
    // the form a privacy office actually approves for publication.
    Q("privacy_small_group_rollup",
      Some(
        """WITH c AS (SELECT n.n_name AS nation,
          |  o.o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents
          |  FROM orders o
          |  JOIN customer cu ON cu.c_custkey = o.o_custkey
          |  JOIN nation n ON n.n_nationkey = cu.c_nationkey
          |  WHERE year(o.o_orderdate) = 2001 GROUP BY 1, 2),
          |r AS (SELECT CASE WHEN n < 5 THEN 'OTHER' ELSE nation END
          |    AS nation,
          |  CASE WHEN n < 5 THEN 'OTHER' ELSE pri END AS priority,
          |  n, cents FROM c),
          |g AS (SELECT nation, priority, CAST(sum(n) AS BIGINT) AS n,
          |  CAST(sum(cents) AS BIGINT) AS cents FROM r GROUP BY 1, 2),
          |t AS (SELECT CAST(sum(cents) AS BIGINT) AS pub,
          |  (SELECT CAST(sum(cents) AS BIGINT) FROM c) AS raw FROM g)
          |SELECT g.nation, g.priority, g.n, g.cents,
          |  CAST(CASE WHEN t.pub = t.raw THEN 1 ELSE 0 END AS BIGINT)
          |    AS totals_reconcile
          |FROM g, t ORDER BY 1, 2
          |""".stripMargin),
      (s, dir) => {
        val c = tbl(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 2001)
          .join(broadcast(tbl(s, dir, "customer")
              .select(col("c_custkey"), col("c_nationkey"))),
            col("c_custkey") === col("o_custkey"))
          .join(broadcast(tbl(s, dir, "nation")
              .select(col("n_nationkey"), col("n_name").as("nation"))),
            col("n_nationkey") === col("c_nationkey"))
          .groupBy(col("nation"), col("o_orderpriority").as("pri"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(floor(col("o_totalprice") * 100 + lit(0.5))
              .cast("long")).cast("long").as("cents"))
          .localCheckpoint()
        val g = c.select(
            when(col("n") < 5, "OTHER").otherwise(col("nation"))
              .as("nation"),
            when(col("n") < 5, "OTHER").otherwise(col("pri"))
              .as("priority"),
            col("n"), col("cents"))
          .groupBy("nation", "priority")
          .agg(sum(col("n")).cast("long").as("n"),
            sum(col("cents")).cast("long").as("cents"))
        val t = g.agg(sum(col("cents")).cast("long").as("pub"))
          .crossJoin(broadcast(
            c.agg(sum(col("cents")).cast("long").as("raw"))))
        val out = g.crossJoin(broadcast(t))
          .select(col("nation"), col("priority"), col("n"),
            col("cents"),
            when(col("pub") === col("raw"), 1L).otherwise(0L)
              .cast("long").as("totals_reconcile"))
          .orderBy("nation", "priority")
        H.materialized(out, Nil, Seq(c))
      }),

    // Woolf's homogeneity test: are the per-segment odds ratios
    // (urgent ⇒ returned) consistent enough to pool? Per stratum,
    // ln(OR) with Haldane's +½ correction carried as 2× integer cells,
    // weights w = 1/(Σ 1/cell) as one chain, X² = Σw·lnOR² −
    // (Σw·lnOR)²/Σw with every per-stratum term micro-floored
    // pre-sum. If this rejects, wave 113's MH number is an average
    // over genuinely different effects.
    Q("stats_woolf_homogeneity",
      Some(
        """WITH lab AS (SELECT l_orderkey AS ok,
          |  max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
          |  FROM lineitem GROUP BY 1),
          |b AS (SELECT c.c_mktsegment AS seg,
          |  CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
          |    AS urg, lab.ret
          |  FROM orders o JOIN lab ON lab.ok = o.o_orderkey
          |  JOIN customer c ON c.c_custkey = o.o_custkey),
          |s AS (SELECT seg,
          |  2*CAST(sum(CASE WHEN urg = 1 AND ret = 1 THEN 1 ELSE 0
          |    END) AS BIGINT) + 1 AS a2,
          |  2*CAST(sum(CASE WHEN urg = 1 AND ret = 0 THEN 1 ELSE 0
          |    END) AS BIGINT) + 1 AS b2,
          |  2*CAST(sum(CASE WHEN urg = 0 AND ret = 1 THEN 1 ELSE 0
          |    END) AS BIGINT) + 1 AS c2,
          |  2*CAST(sum(CASE WHEN urg = 0 AND ret = 0 THEN 1 ELSE 0
          |    END) AS BIGINT) + 1 AS d2
          |  FROM b GROUP BY 1),
          |w AS (SELECT seg,
          |  CAST(floor(ln(CAST(a2 AS DOUBLE) * CAST(d2 AS DOUBLE)
          |    / (CAST(b2 AS DOUBLE) * CAST(c2 AS DOUBLE)))
          |    * 1000000.0) AS BIGINT) AS lor_micro,
          |  CAST(floor(1.0 / (2.0/CAST(a2 AS DOUBLE)
          |    + 2.0/CAST(b2 AS DOUBLE) + 2.0/CAST(c2 AS DOUBLE)
          |    + 2.0/CAST(d2 AS DOUBLE)) * 1000.0) AS BIGINT)
          |    AS w_milli FROM s),
          |t AS (SELECT CAST(count(*) AS BIGINT) AS k,
          |  CAST(sum(w_milli) AS BIGINT) AS sw,
          |  CAST(sum(w_milli * lor_micro) AS BIGINT) AS swl,
          |  sum(CAST(w_milli AS HUGEINT) * lor_micro * lor_micro)
          |    AS swll FROM w)
          |SELECT k AS strata,
          |  CAST(floor((CAST(swll AS DOUBLE)
          |    - CAST(swl AS DOUBLE)*CAST(swl AS DOUBLE)
          |      /CAST(sw AS DOUBLE)) / 1000.0 / 1000000.0 / 1000000.0
          |    * 1000000.0) AS BIGINT) AS woolf_x2_micro
          |FROM t
          |""".stripMargin),
      (s, dir) => {
        val lab = tbl(s, dir, "lineitem")
          .groupBy(col("l_orderkey").as("ok"))
          .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0))
            .as("ret"))
        val b = tbl(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)
              .as("urg"))
          .join(lab, col("ok") === col("o_orderkey"))
          .join(broadcast(tbl(s, dir, "customer")
              .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
            col("o_custkey") === col("c_custkey"))
        def c2(u: Int, r: Int) =
          (lit(2) * sum(when(col("urg") === u && col("ret") === r, 1L)
            .otherwise(0L)) + 1).cast("long")
        val st = b.groupBy("seg")
          .agg(c2(1, 1).as("a2"), c2(1, 0).as("b2"),
            c2(0, 1).as("cc2"), c2(0, 0).as("d2"))
        val w = st.select(
          floor(log(col("a2").cast("double") * col("d2").cast("double")
            / (col("b2").cast("double") * col("cc2").cast("double"))) *
            1000000.0d).cast("long").as("lor_micro"),
          floor(lit(1.0d) / (lit(2.0d) / col("a2").cast("double") +
            lit(2.0d) / col("b2").cast("double") +
            lit(2.0d) / col("cc2").cast("double") +
            lit(2.0d) / col("d2").cast("double")) * 1000.0d)
            .cast("long").as("w_milli"))
        w.agg(count(lit(1)).cast("long").as("k"),
            sum(col("w_milli")).cast("long").as("sw"),
            sum(col("w_milli") * col("lor_micro")).cast("long")
              .as("swl"),
            sum(col("w_milli").cast("decimal(38,0)") *
              col("lor_micro") * col("lor_micro"))
              .cast("decimal(38,0)").as("swll"))
          .select(col("k").as("strata"),
            floor((col("swll").cast("double") -
              col("swl").cast("double") * col("swl").cast("double") /
                col("sw").cast("double")) / 1000.0d / 1000000.0d /
              1000000.0d * 1000000.0d).cast("long")
              .as("woolf_x2_micro"))
      }),

    // Casing profile per source: UPPER / Title / lower / other token
    // shares in bps — one codegen'd regex class per token, one scan.
    // Shouting spam, headline farms, and prose have unmistakably
    // different fingerprints; this is the two-cent style classifier
    // that routes before any model runs.
    Q("text_casing_profile",
      Some(
        """WITH t AS (SELECT source,
          |  unnest(string_split(text, ' ')) AS w FROM documents),
          |k AS (SELECT source,
          |  CASE WHEN regexp_full_match(w, '[A-Z]+') THEN 'upper'
          |       WHEN regexp_full_match(w, '[A-Z][a-z]+') THEN 'title'
          |       WHEN regexp_full_match(w, '[a-z]+') THEN 'lower'
          |       ELSE 'other' END AS cls
          |  FROM t WHERE w <> ''),
          |g AS (SELECT source, cls, CAST(count(*) AS BIGINT) AS n
          |  FROM k GROUP BY 1, 2),
          |tt AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot FROM g
          |  GROUP BY 1)
          |SELECT g.source, g.cls, g.n,
          |  CAST(g.n * 10000 // tt.tot AS BIGINT) AS share_bps
          |FROM g JOIN tt ON tt.source = g.source ORDER BY 1, 2
          |""".stripMargin),
      (s, dir) => {
        val k = tbl(s, dir, "documents")
          .select(col("source"),
            explode(split(col("text"), " ", -1)).as("w"))
          .filter(col("w") =!= "")
          .select(col("source"),
            when(col("w").rlike("^[A-Z]+$"), "upper")
              .when(col("w").rlike("^[A-Z][a-z]+$"), "title")
              .when(col("w").rlike("^[a-z]+$"), "lower")
              .otherwise("other").as("cls"))
        val g = k.groupBy("source", "cls")
          .agg(count(lit(1)).cast("long").as("n"))
        val tt = g.groupBy("source")
          .agg(sum(col("n")).cast("long").as("tot"))
        g.join(broadcast(tt), Seq("source"))
          .select(col("source"), col("cls"), col("n"),
            expr("n * 10000 div tot").cast("long").as("share_bps"))
          .orderBy("source", "cls")
      })
  )
}
