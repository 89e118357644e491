package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Pixel-value census row for the image-entropy query (top-level case
  * class so the Dataset encoder resolves). */
final case class PxCount(doc_id: Long, v: Int, n: Long)

/** Hundredth wave: ANN tuning evidence, codec-backed information
  * content, sequential testing, and counterfactual pricing — the IVF
  * nprobe→recall curve (one candidate pass scores all four probe
  * depths against brute-force truth), per-image byte entropy over TRUE
  * decoded PNG rasters (the oracle predicts every byte closed-form),
  * Wald's SPRT with exact micro log-likelihood increments and its
  * first boundary crossing, and an elasticity-driven what-if price
  * projection.
  *
  * Exactness: recall counts are integers over deterministic top-k sets
  * (cosines are the fused native expression, bit-identical to the
  * unrolled oracle); entropy and LLR terms floor to micro per cell
  * BEFORE any sum; the what-if chain is one micro-floored expression.
  */
object CurveOpsQueries extends QueryModule {

  import graft.functions.{VectorSim => VS}

  def all: Seq[Q] = Seq(

    // IVF nprobe → recall@10 curve: vectors assign to their nearest of
    // 8 seed centroids; each of 10 query vectors probes its 1 / 2 / 4 /
    // 8 nearest cells. ONE candidate pass carries the query's cell
    // rank, so every curve point filters the same frame; truth is the
    // brute-force top-10. The tuning table that decides how much
    // recall a 1e9-vector index buys per probe — measured, not
    // guessed.
    Q("sim_ivf_nprobe_curve",
      Some("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v " +
        "FROM embeddings), " +
        s"n AS (SELECT vec_id, v, (${VS.norm2Sql("v")}) AS nrm FROM e), " +
        "cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8), " +
        "assign AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY " +
        s"vec_id ORDER BY (${VS.ssdSql("n.v", "cent.cv")}), cid) AS arn " +
        "FROM n, cent), " +
        "cells AS (SELECT n.vec_id, n.v, n.nrm, a.cid AS cell " +
        "FROM n JOIN assign a ON a.vec_id = n.vec_id AND a.arn = 1), " +
        "q AS (SELECT n.vec_id AS qid, n.v AS qv, n.nrm AS qn, a.cid, " +
        "a.arn FROM n JOIN assign a ON a.vec_id = n.vec_id " +
        "WHERE n.vec_id < 10), " +
        "cand AS (SELECT q.qid, c.vec_id AS vid, q.arn AS cellrank, " +
        s"(${VS.dotSql("q.qv", "c.v")}) / (sqrt(q.qn) * sqrt(c.nrm)) " +
        "AS sim FROM q JOIN cells c ON c.cell = q.cid " +
        "AND c.vec_id <> q.qid), " +
        "truth AS (SELECT a.vec_id AS qid, b.vec_id AS vid, " +
        "row_number() OVER (PARTITION BY a.vec_id ORDER BY " +
        s"(${VS.dotSql("a.v", "b.v")}) / (sqrt(a.nrm) * sqrt(b.nrm)) " +
        "DESC, b.vec_id) AS rnk FROM n a JOIN n b " +
        "ON b.vec_id <> a.vec_id WHERE a.vec_id < 10 QUALIFY rnk <= 10), " +
        "pts AS (SELECT p.np, c.qid, c.vid, row_number() OVER " +
        "(PARTITION BY p.np, c.qid ORDER BY c.sim DESC, c.vid) AS rnk " +
        "FROM (SELECT unnest([1, 2, 4, 8]) AS np) p " +
        "JOIN cand c ON c.cellrank <= p.np QUALIFY rnk <= 10) " +
        "SELECT pts.np AS nprobe, " +
        "CAST(count(truth.vid) AS BIGINT) AS hits, " +
        "CAST(count(truth.vid) * 10000 // 100 AS BIGINT) AS recall_bps " +
        "FROM pts LEFT JOIN truth ON truth.qid = pts.qid " +
        "AND truth.vid = pts.vid GROUP BY 1 ORDER BY 1"),
      (s, dir) => {
        import graft.functions.{CustomExpressions => CE}
        import s.implicits._
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("v"))
        val cent = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("v").as("cv"))
        val aw = Window.partitionBy("vec_id")
          .orderBy(col("ssd"), col("cid"))
        val assign = e.join(broadcast(cent))
          .withColumn("ssd", CE.squared_distance(col("v"), col("cv")))
          .withColumn("arn", row_number().over(aw))
          .localCheckpoint()
        val cells = e.join(assign.filter(col("arn") === 1)
          .select(col("vec_id"), col("cid").as("cell")), "vec_id")
          .localCheckpoint()
        val q = assign.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("cid"), col("arn").as("cellrank"))
        val cand = cells
          .select(col("vec_id").as("vid"), col("v").as("cv"),
            col("cell"))
          .join(broadcast(q), col("cell") === col("cid") &&
            col("vid") =!= col("qid"))
          .withColumn("sim", CE.cosine_sim(col("qv"), col("cv")))
          .select("qid", "vid", "cellrank", "sim")
          .localCheckpoint()
        val tw = Window.partitionBy("qid")
          .orderBy(col("sim").desc, col("vid"))
        val truth = e.select(col("vec_id").as("qid"), col("v").as("qv"))
          .filter(col("qid") < 10)
          .join(e.select(col("vec_id").as("vid"), col("v").as("cv")),
            col("vid") =!= col("qid"))
          .withColumn("sim", CE.cosine_sim(col("qv"), col("cv")))
          .withColumn("rnk", row_number().over(tw))
          .filter(col("rnk") <= 10).select("qid", "vid")
        val pw = Window.partitionBy("np", "qid")
          .orderBy(col("sim").desc, col("vid"))
        val pts = Seq(1, 2, 4, 8).toDF("np")
          .join(cand, col("cellrank") <= col("np"))
          .withColumn("rnk", row_number().over(pw))
          .filter(col("rnk") <= 10)
        val out = pts
          .join(broadcast(truth.withColumnRenamed("qid", "tq")
              .withColumnRenamed("vid", "tv")),
            col("tq") === col("qid") && col("tv") === col("vid"), "left")
          .groupBy(col("np").cast("long").as("nprobe"))
          .agg(count(col("tv")).cast("long").as("hits"),
            expr("count(tv) * 10000 div 100").cast("long")
              .as("recall_bps"))
          .orderBy("nprobe")
        H.materialized(out, Nil, Seq(assign, cells, cand))
      }),

    // Per-image byte entropy over TRUE decoded PNG rasters (docs <
    // 500): the engine synthesizes each doc's PNG, runs the full
    // inflate + unfilter decode, and histograms the raster bytes; the
    // oracle predicts every byte closed-form ((i·31 + doc_id) % 256),
    // so the entropy audit doubles as a codec regression test. Terms
    // floor to micro per byte value BEFORE the per-image sum; the
    // decode is a typed mapPartitions (executor-side, no UDF
    // registration), emitting the bounded (doc, value, count) census.
    Q("multimodal_image_entropy",
      Some(
        """WITH px AS (SELECT doc_id, unnest(list_transform(range(0,
          |  (1 + doc_id % 32) * (1 + (doc_id * 7 +
          |    octet_length(encode(text))) % 32) * 3),
          |  i -> (i * 31 + doc_id) % 256)) AS v
          |  FROM documents WHERE doc_id < 500),
          |h AS (SELECT doc_id, v, CAST(count(*) AS BIGINT) AS n
          |  FROM px GROUP BY 1, 2),
          |t AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS np FROM h
          |  GROUP BY 1)
          |SELECT h.doc_id, t.np AS n_px,
          |  CAST(count(*) AS BIGINT) AS n_values,
          |  CAST(sum(CAST(floor(-(CAST(h.n AS DOUBLE)
          |      / CAST(t.np AS DOUBLE))
          |    * ln(CAST(h.n AS DOUBLE) / CAST(t.np AS DOUBLE))
          |    * 1000000.0) AS BIGINT)) AS BIGINT) AS entropy_micro
          |FROM h JOIN t ON t.doc_id = h.doc_id
          |GROUP BY 1, 2 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        import s.implicits._
        import graft.functions.Multimodal
        val census = tbl(s, dir, "documents")
          .filter(col("doc_id") < 500)
          .select(col("doc_id"), col("text").cast("binary").as("body"))
          .as[(Long, Array[Byte])]
          .mapPartitions { it =>
            it.flatMap { case (id, body) =>
              val w = (1L + id % 32L).toInt
              val h = (1L + (id * 7L + body.length) % 32L).toInt
              val px = Multimodal.decodePngPixels(
                Multimodal.synthesizePngPixels(w, h, id))
              val counts = new Array[Long](256)
              px.foreach(b => counts(b & 0xff) += 1L)
              (0 until 256).iterator.filter(counts(_) > 0)
                .map(v => PxCount(id, v, counts(v)))
            }
          }.toDF()
        val t = census.groupBy("doc_id")
          .agg(sum(col("n")).cast("long").as("np"))
        census.join(t, Seq("doc_id"))
          .select(col("doc_id"), col("np"),
            floor((lit(0.0d) - col("n").cast("double") /
              col("np").cast("double")) *
              log(col("n").cast("double") / col("np").cast("double")) *
              1000000.0d).cast("long").as("term"))
          .groupBy(col("doc_id"), col("np").as("n_px"))
          .agg(count(lit(1)).cast("long").as("n_values"),
            sum(col("term")).cast("long").as("entropy_micro"))
          .orderBy("doc_id")
      }),

    // Wald's SPRT on the daily purchase share — H0: p = 0.10 vs H1:
    // p = 0.18, α = β = 0.05: per-day log-likelihood increments floor
    // to micro, the cumulative path rides the bounded day frame, and
    // the verdict is the FIRST boundary crossing (±ln 19). Sequential
    // testing is how experiment platforms stop early without p-hacking;
    // the exact integer path makes the stopping day reproducible.
    Q("stats_sprt_boundary",
      Some(
        """WITH d AS (SELECT CAST(ts AS DATE) AS day,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
          |    END) AS BIGINT) AS x
          |  FROM events GROUP BY 1),
          |l AS (SELECT day, n, x,
          |  x * CAST(floor(ln(0.18/0.10) * 1000000.0) AS BIGINT)
          |  + (n - x) * CAST(floor(ln(0.82/0.90) * 1000000.0) AS BIGINT)
          |    AS llr_micro FROM d),
          |c AS (SELECT day, n, x,
          |  CAST(sum(llr_micro) OVER (ORDER BY day
          |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM l),
          |b AS (SELECT CAST(floor(ln(19.0) * 1000000.0) AS BIGINT)
          |    AS ub),
          |f AS (SELECT c.day, c.cum,
          |  CASE WHEN c.cum >= b.ub THEN 'accept_h1'
          |       WHEN c.cum <= -b.ub THEN 'accept_h0' END AS verdict
          |  FROM c, b),
          |x AS (SELECT min(day) AS stop_day FROM f
          |  WHERE verdict IS NOT NULL)
          |SELECT (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_days,
          |  (SELECT strftime(stop_day, '%Y-%m-%d') FROM x) AS stop_day,
          |  (SELECT f.verdict FROM f JOIN x ON x.stop_day = f.day)
          |    AS verdict,
          |  (SELECT CAST(cum AS BIGINT) FROM c
          |    WHERE day = (SELECT stop_day FROM x)) AS cum_at_stop
          |""".stripMargin),
      (s, dir) => {
        val d = H.events(s, dir)
          .groupBy(col("ts").cast("date").as("day"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .cast("long").as("x"))
        val l1 = math.floor(math.log(0.18 / 0.10) * 1000000.0).toLong
        val l0 = math.floor(math.log(0.82 / 0.90) * 1000000.0).toLong
        val ub = math.floor(math.log(19.0) * 1000000.0).toLong
        val c = d.withColumn("cum",
          sum(col("x") * lit(l1) + (col("n") - col("x")) * lit(l0))
            .over(Window.orderBy("day")
              .rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
          .withColumn("verdict",
            when(col("cum") >= ub, "accept_h1")
              .when(col("cum") <= -ub, "accept_h0"))
          .localCheckpoint()
        val x = c.filter(col("verdict").isNotNull)
          .agg(min(col("day")).as("stop_day"))
        val out = c.agg(count(lit(1)).cast("long").as("n_days"))
          .crossJoin(broadcast(x))
          .join(c.select(col("day"), col("cum"),
            col("verdict").as("v2")), col("day") === col("stop_day"))
          .select(col("n_days"),
            date_format(col("stop_day"), "yyyy-MM-dd").as("stop_day"),
            col("v2").as("verdict"),
            col("cum").cast("long").as("cum_at_stop"))
        H.materialized(out, Nil, Seq(c))
      }),

    // What-if price move: own-price elasticity per brand (Δln q on
    // Δln p across months, micro-quantized logs) projected onto a +5%
    // price change — projected revenue = base · 1.05 · (1 + 0.05·ε),
    // one micro-floored chain per brand. The counterfactual the
    // pricing committee actually asks for, traceable to the measured
    // elasticity instead of a slide-deck guess.
    Q("orders_whatif_price",
      Some(
        """WITH f AS (SELECT p.p_brand AS brand,
          |  year(l.l_shipdate)*12 + month(l.l_shipdate) - 1 AS ym,
          |  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q,
          |  CAST(sum(CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents
          |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          |  WHERE p.p_brand IN ('Brand#4', 'Brand#2', 'Brand#19')
          |  GROUP BY 1, 2),
          |m AS (SELECT brand, ym, q, cents,
          |  CAST(CAST(cents AS HUGEINT) * 1000 // q AS BIGINT) AS pm
          |  FROM f),
          |d AS (SELECT brand, ym,
          |  CAST(floor(ln(CAST(q AS DOUBLE)) * 1000000.0) AS BIGINT)
          |    - CAST(floor(ln(CAST(lag(q) OVER w AS DOUBLE))
          |      * 1000000.0) AS BIGINT) AS dlq,
          |  CAST(floor(ln(CAST(pm AS DOUBLE)) * 1000000.0) AS BIGINT)
          |    - CAST(floor(ln(CAST(lag(pm) OVER w AS DOUBLE))
          |      * 1000000.0) AS BIGINT) AS dlp
          |  FROM m WINDOW w AS (PARTITION BY brand ORDER BY ym)),
          |mm AS (SELECT brand, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(dlp) AS BIGINT) AS sx, CAST(sum(dlq) AS BIGINT)
          |    AS sy,
          |  sum(CAST(dlp AS HUGEINT) * dlp) AS sxx,
          |  sum(CAST(dlp AS HUGEINT) * dlq) AS sxy
          |  FROM d WHERE dlq IS NOT NULL AND dlp IS NOT NULL
          |  GROUP BY 1),
          |el AS (SELECT brand,
          |  (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
          |    - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
          |  / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
          |    - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) AS eps
          |  FROM mm),
          |base AS (SELECT brand, CAST(sum(cents) AS BIGINT) AS cents
          |  FROM f GROUP BY 1)
          |SELECT b.brand,
          |  CAST(floor(el.eps * 1000000.0) AS BIGINT)
          |    AS elasticity_micro,
          |  b.cents AS base_cents,
          |  CAST(floor(CAST(b.cents AS DOUBLE) * 1.05
          |    * (1.0 + 0.05 * el.eps)) AS BIGINT) AS whatif_cents
          |FROM base b JOIN el ON el.brand = b.brand ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val f = tbl(s, dir, "lineitem")
          .join(broadcast(tbl(s, dir, "part")
              .select(col("p_partkey"), col("p_brand").as("brand"))
              .filter(col("brand").isin("Brand#4", "Brand#2",
                "Brand#19"))),
            col("p_partkey") === col("l_partkey"))
          .groupBy(col("brand"),
            (year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
              .as("ym"))
          .agg(sum(col("l_quantity").cast("long")).cast("long").as("q"),
            sum(floor(col("l_extendedprice") * 100 + lit(0.5))
              .cast("long")).cast("long").as("cents"))
          .localCheckpoint()
        val m = f.withColumn("pm",
          expr("CAST(CAST(cents AS DECIMAL(38,0)) * 1000 div q" +
            " AS BIGINT)"))
        val w = Window.partitionBy("brand").orderBy("ym")
        val d = m.select(col("brand"), col("ym"),
          (floor(log(col("q").cast("double")) * 1000000.0d)
            .cast("long") -
            floor(log(lag("q", 1).over(w).cast("double")) * 1000000.0d)
              .cast("long")).as("dlq"),
          (floor(log(col("pm").cast("double")) * 1000000.0d)
            .cast("long") -
            floor(log(lag("pm", 1).over(w).cast("double")) * 1000000.0d)
              .cast("long")).as("dlp"))
        val mm = d.filter(col("dlq").isNotNull && col("dlp").isNotNull)
          .groupBy("brand")
          .agg(count(lit(1)).cast("long").as("n"),
            sum(col("dlp")).cast("long").as("sx"),
            sum(col("dlq")).cast("long").as("sy"),
            sum(col("dlp").cast("decimal(38,0)") * col("dlp"))
              .cast("decimal(38,0)").as("sxx"),
            sum(col("dlp").cast("decimal(38,0)") * col("dlq"))
              .cast("decimal(38,0)").as("sxy"))
        val el = mm.select(col("brand"),
          ((col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")))
            .as("eps"))
        val base = f.groupBy("brand")
          .agg(sum(col("cents")).cast("long").as("cents"))
        val out = base.join(el, Seq("brand"))
          .select(col("brand"),
            floor(col("eps") * 1000000.0d).cast("long")
              .as("elasticity_micro"),
            col("cents").as("base_cents"),
            floor(col("cents").cast("double") * 1.05d *
              (lit(1.0d) + lit(0.05d) * col("eps"))).cast("long")
              .as("whatif_cents"))
          .orderBy("brand")
        H.materialized(out, Nil, Seq(f))
      })
  )
}
