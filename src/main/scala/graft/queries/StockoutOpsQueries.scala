package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Hundred-sixteenth wave: availability forensics, multivariate
  * testing, and clustering evaluation — stockout-suspect parts (sales
  * gaps far beyond what their own rate predicts), Hotelling's T² on
  * the (quantity, price) mean vector between two segments (the
  * 2-D case has a closed-form inverse — no linear algebra library,
  * just moment chains), and the purity/entropy of IVF cells against
  * labels (is the ANN index's geometry aligned with semantics?).
  *
  * Exactness: gaps are integer day windows per part (parallel);
  * T² assembles from exact HUGEINT moments with one micro chain;
  * purity is an integer ratio and the cell-label contingency reuses
  * the micro-floored entropy idiom.
  */
object StockoutOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Stockout suspects: per part, the largest gap between consecutive
    // sale days vs the expected gap from its own rate (span/sales, in
    // milli-days) — flag parts whose max gap exceeds 5× expectation
    // with ≥ 20 sales. Per-part lag windows are hash-parallel; output
    // = top 20 by gap ratio. The availability question asked of sales
    // data when no inventory feed exists.
    Q("supply_stockout_gaps",
      Some(
        """WITH sd AS (SELECT DISTINCT l_partkey AS pk,
          |  CAST(date_diff('day', TIMESTAMP '1992-01-01', l_shipdate)
          |    AS BIGINT) AS d FROM lineitem),
          |g AS (SELECT pk, d - lag(d) OVER (PARTITION BY pk ORDER BY d)
          |    AS gap, d FROM sd),
          |a AS (SELECT pk, CAST(count(*) AS BIGINT) AS days,
          |  CAST(max(d) - min(d) AS BIGINT) AS span,
          |  CAST(max(gap) AS BIGINT) AS max_gap FROM g GROUP BY 1
          |  HAVING count(*) >= 20)
          |SELECT pk AS partkey, days AS sale_days, span, max_gap,
          |  CAST(span * 1000 // (days - 1) AS BIGINT)
          |    AS expected_gap_milli,
          |  CAST(max_gap * 1000000 // (span * 1000 // (days - 1))
          |    AS BIGINT) AS gap_ratio_milli
          |FROM a
          |WHERE max_gap * 1000000 // (span * 1000 // (days - 1)) > 5000
          |ORDER BY gap_ratio_milli DESC, partkey LIMIT 20
          |""".stripMargin),
      (s, dir) => {
        val sd = tbl(s, dir, "lineitem")
          .select(col("l_partkey").as("pk"),
            datediff(col("l_shipdate"),
              to_timestamp(lit("1992-01-01 00:00:00"))).cast("long")
              .as("d"))
          .distinct()
        val g = sd.withColumn("gap",
          col("d") - lag("d", 1).over(
            Window.partitionBy("pk").orderBy("d")))
        val a = g.groupBy("pk")
          .agg(count(lit(1)).cast("long").as("days"),
            (max(col("d")) - min(col("d"))).cast("long").as("span"),
            max(col("gap")).cast("long").as("max_gap"))
          .filter(col("days") >= 20)
        a.select(col("pk").as("partkey"), col("days").as("sale_days"),
            col("span"), col("max_gap"),
            expr("span * 1000 div (days - 1)").cast("long")
              .as("expected_gap_milli"),
            expr("max_gap * 1000000 div (span * 1000 div (days - 1))")
              .cast("long").as("gap_ratio_milli"))
          .filter(col("gap_ratio_milli") > 5000)
          .orderBy(col("gap_ratio_milli").desc, col("partkey"))
          .limit(20)
      }),

    // Hotelling's T² for the (quantity, price-cents) mean vector,
    // BUILDING vs MACHINERY order lines: the 2×2 pooled covariance
    // inverts in closed form, so the whole multivariate test is exact
    // moments + ONE micro chain. Catches joint shifts the two
    // marginal t-tests each miss — the multivariate A/B gate.
    Q("stats_hotelling_t2",
      Some(
        """WITH b AS (SELECT c.c_mktsegment AS g,
          |  CAST(l.l_quantity AS BIGINT) AS x,
          |  CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT) // 100
          |    AS y
          |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          |  JOIN customer c ON c.c_custkey = o.o_custkey
          |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
          |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |  sum(CAST(x AS HUGEINT)*x) AS sxx,
          |  sum(CAST(y AS HUGEINT)*y) AS syy,
          |  sum(CAST(x AS HUGEINT)*y) AS sxy FROM b GROUP BY 1),
          |p AS (SELECT
          |  max(CASE WHEN g='BUILDING' THEN n END) AS na,
          |  max(CASE WHEN g='BUILDING' THEN sx END) AS sxa,
          |  max(CASE WHEN g='BUILDING' THEN sy END) AS sya,
          |  max(CASE WHEN g='BUILDING' THEN sxx END) AS sxxa,
          |  max(CASE WHEN g='BUILDING' THEN syy END) AS syya,
          |  max(CASE WHEN g='BUILDING' THEN sxy END) AS sxya,
          |  max(CASE WHEN g='MACHINERY' THEN n END) AS nb,
          |  max(CASE WHEN g='MACHINERY' THEN sx END) AS sxb,
          |  max(CASE WHEN g='MACHINERY' THEN sy END) AS syb,
          |  max(CASE WHEN g='MACHINERY' THEN sxx END) AS sxxb,
          |  max(CASE WHEN g='MACHINERY' THEN syy END) AS syyb,
          |  max(CASE WHEN g='MACHINERY' THEN sxy END) AS sxyb FROM m),
          |z AS (SELECT na, nb,
          |  CAST(sxa AS DOUBLE)/CAST(na AS DOUBLE)
          |    - CAST(sxb AS DOUBLE)/CAST(nb AS DOUBLE) AS dx,
          |  CAST(sya AS DOUBLE)/CAST(na AS DOUBLE)
          |    - CAST(syb AS DOUBLE)/CAST(nb AS DOUBLE) AS dy,
          |  ((CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE)
          |      *CAST(sxa AS DOUBLE)/CAST(na AS DOUBLE))
          |   + (CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE)
          |      *CAST(sxb AS DOUBLE)/CAST(nb AS DOUBLE)))
          |    / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2.0) AS vxx,
          |  ((CAST(syya AS DOUBLE) - CAST(sya AS DOUBLE)
          |      *CAST(sya AS DOUBLE)/CAST(na AS DOUBLE))
          |   + (CAST(syyb AS DOUBLE) - CAST(syb AS DOUBLE)
          |      *CAST(syb AS DOUBLE)/CAST(nb AS DOUBLE)))
          |    / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2.0) AS vyy,
          |  ((CAST(sxya AS DOUBLE) - CAST(sxa AS DOUBLE)
          |      *CAST(sya AS DOUBLE)/CAST(na AS DOUBLE))
          |   + (CAST(sxyb AS DOUBLE) - CAST(sxb AS DOUBLE)
          |      *CAST(syb AS DOUBLE)/CAST(nb AS DOUBLE)))
          |    / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2.0) AS vxy
          |  FROM p)
          |SELECT na AS n_building, nb AS n_machinery,
          |  CAST(floor((CAST(na AS DOUBLE)*CAST(nb AS DOUBLE)
          |    /(CAST(na AS DOUBLE)+CAST(nb AS DOUBLE)))
          |    * (dx*(vyy*dx - vxy*dy) + dy*(vxx*dy - vxy*dx))
          |    / (vxx*vyy - vxy*vxy) * 1000000.0) AS BIGINT)
          |    AS t2_micro
          |FROM z
          |""".stripMargin),
      (s, dir) => {
        val b = tbl(s, dir, "lineitem")
          .select(col("l_orderkey"),
            col("l_quantity").cast("long").as("x"),
            expr("CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)" +
              " div 100").as("y"))
          .join(tbl(s, dir, "orders")
              .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(tbl(s, dir, "customer")
              .select(col("c_custkey"), col("c_mktsegment").as("g"))
              .filter(col("g").isin("BUILDING", "MACHINERY"))),
            col("o_custkey") === col("c_custkey"))
        val m = b.groupBy("g")
          .agg(count(lit(1)).cast("long").as("n"),
            sum(col("x")).cast("long").as("sx"),
            sum(col("y")).cast("long").as("sy"),
            sum(col("x").cast("decimal(38,0)") * col("x"))
              .cast("decimal(38,0)").as("sxx"),
            sum(col("y").cast("decimal(38,0)") * col("y"))
              .cast("decimal(38,0)").as("syy"),
            sum(col("x").cast("decimal(38,0)") * col("y"))
              .cast("decimal(38,0)").as("sxy"))
        def cell(gv: String, f: String) =
          max(when(col("g") === gv, col(f)))
        val p = m.agg(cell("BUILDING", "n").as("na"),
          cell("BUILDING", "sx").as("sxa"),
          cell("BUILDING", "sy").as("sya"),
          cell("BUILDING", "sxx").as("sxxa"),
          cell("BUILDING", "syy").as("syya"),
          cell("BUILDING", "sxy").as("sxya"),
          cell("MACHINERY", "n").as("nb"),
          cell("MACHINERY", "sx").as("sxb"),
          cell("MACHINERY", "sy").as("syb"),
          cell("MACHINERY", "sxx").as("sxxb"),
          cell("MACHINERY", "syy").as("syyb"),
          cell("MACHINERY", "sxy").as("sxyb"))
        def d(c: String) = col(c).cast("double")
        val z = p
          .withColumn("dx", d("sxa") / d("na") - d("sxb") / d("nb"))
          .withColumn("dy", d("sya") / d("na") - d("syb") / d("nb"))
          .withColumn("den", d("na") + d("nb") - 2.0d)
          .withColumn("vxx", ((d("sxxa") - d("sxa") * d("sxa") /
            d("na")) + (d("sxxb") - d("sxb") * d("sxb") / d("nb"))) /
            col("den"))
          .withColumn("vyy", ((d("syya") - d("sya") * d("sya") /
            d("na")) + (d("syyb") - d("syb") * d("syb") / d("nb"))) /
            col("den"))
          .withColumn("vxy", ((d("sxya") - d("sxa") * d("sya") /
            d("na")) + (d("sxyb") - d("sxb") * d("syb") / d("nb"))) /
            col("den"))
        z.select(col("na").cast("long").as("n_building"),
          col("nb").cast("long").as("n_machinery"),
          floor((d("na") * d("nb") / (d("na") + d("nb"))) *
            (col("dx") * (col("vyy") * col("dx") -
              col("vxy") * col("dy")) +
              col("dy") * (col("vxx") * col("dy") -
                col("vxy") * col("dx"))) /
            (col("vxx") * col("vyy") - col("vxy") * col("vxy")) *
            1000000.0d).cast("long").as("t2_micro"))
      }),

    // IVF cell purity: vectors assign to their nearest of 8 seed
    // centroids (the sim_ivf_topk geometry); against labels, each
    // cell's majority share and the weighted overall purity — plus the
    // cell-label mutual information in micro. High purity = the
    // index's geometry already respects semantics; low = filtered
    // search will fan out. Clustering evaluated, not eyeballed.
    Q("sim_cell_purity",
      Some("WITH e AS (SELECT vec_id, label, " +
        "embedding::DOUBLE[] AS v FROM embeddings), " +
        "cent AS (SELECT vec_id AS cid, v AS cv FROM e " +
        "WHERE vec_id < 8), " +
        "assign AS (SELECT e.vec_id, e.label, cid, row_number() OVER " +
        "(PARTITION BY e.vec_id ORDER BY " +
        s"(${graft.functions.VectorSim.ssdSql("e.v", "cent.cv")}), cid)" +
        " AS arn FROM e, cent), " +
        "cl AS (SELECT cid AS cell, label, CAST(count(*) AS BIGINT) " +
        "AS n FROM assign WHERE arn = 1 GROUP BY 1, 2), " +
        "pc AS (SELECT cell, CAST(max(n) AS BIGINT) AS maj, " +
        "CAST(sum(n) AS BIGINT) AS tot FROM cl GROUP BY 1), " +
        "t AS (SELECT CAST(sum(tot) AS BIGINT) AS nn, " +
        "CAST(sum(maj) AS BIGINT) AS majsum, " +
        "CAST(count(*) AS BIGINT) AS cells FROM pc), " +
        "rl AS (SELECT label, CAST(sum(n) AS BIGINT) AS nl FROM cl " +
        "GROUP BY 1), " +
        "mi AS (SELECT CAST(sum(CAST(floor(" +
        "(CAST(cl.n AS DOUBLE)/CAST(t.nn AS DOUBLE)) * " +
        "ln(CAST(cl.n AS DOUBLE) * CAST(t.nn AS DOUBLE) / " +
        "(CAST(pc.tot AS DOUBLE) * CAST(rl.nl AS DOUBLE))) * " +
        "1000000.0) AS BIGINT)) AS BIGINT) AS mi_micro " +
        "FROM cl JOIN pc ON pc.cell = cl.cell " +
        "JOIN rl ON rl.label = cl.label, t) " +
        "SELECT t.cells, t.nn AS n_vectors, " +
        "CAST(t.majsum * 10000 // t.nn AS BIGINT) AS purity_bps, " +
        "mi.mi_micro FROM t, mi"),
      (s, dir) => {
        import graft.functions.{CustomExpressions => CE}
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("v"))
        val cent = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("v").as("cv"))
        val assign = e.join(broadcast(cent))
          .withColumn("ssd", CE.squared_distance(col("v"), col("cv")))
          .withColumn("arn", row_number().over(
            Window.partitionBy("vec_id").orderBy(col("ssd"), col("cid"))))
          .filter(col("arn") === 1)
          .select(col("cid").as("cell"), col("label"))
        val cl = assign.groupBy("cell", "label")
          .agg(count(lit(1)).cast("long").as("n"))
          .localCheckpoint()
        val pc = cl.groupBy("cell")
          .agg(max(col("n")).cast("long").as("maj"),
            sum(col("n")).cast("long").as("tot"))
        val t = pc.agg(sum(col("tot")).cast("long").as("nn"),
          sum(col("maj")).cast("long").as("majsum"),
          count(lit(1)).cast("long").as("cells"))
        val rl = cl.groupBy("label")
          .agg(sum(col("n")).cast("long").as("nl"))
        val mi = cl.join(broadcast(pc), Seq("cell"))
          .join(broadcast(rl), Seq("label"))
          .crossJoin(broadcast(t))
          .select(floor((col("n").cast("double") /
            col("nn").cast("double")) *
            log(col("n").cast("double") * col("nn").cast("double") /
              (col("tot").cast("double") * col("nl").cast("double"))) *
            1000000.0d).cast("long").as("term"))
          .agg(sum(col("term")).cast("long").as("mi_micro"))
        val out = t.crossJoin(broadcast(mi))
          .select(col("cells"), col("nn").as("n_vectors"),
            expr("majsum * 10000 div nn").cast("long").as("purity_bps"),
            col("mi_micro"))
        H.materialized(out, Nil, Seq(cl))
      })
  )
}
