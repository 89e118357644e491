package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{DedupSketches => DS}

/** Eighteenth wave: calibration/affinity ops — sketch-vs-exact MinHash
  * calibration (is the LSH tuned right for THIS corpus?), a single-pass
  * correlation matrix, market-basket brand affinity, and ViT-style patch
  * statistics over true decoded JPEG rasters.
  *
  * Determinism: MinHash estimate and exact Jaccard are both ratios of
  * exact integers; their mean absolute gap sums through a round-to-1e9
  * integer cast (the repo's standard trick for order-independent double
  * accumulation); correlations are exact DECIMAL sums finished by sqrt;
  * basket lift is the exact-integer lift ratio.
  */
object CalibrationOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // MINHASH CALIBRATION: for every LSH band-candidate pair, compare the
    // signature's Jaccard ESTIMATE (matching minima / 12) against the
    // EXACT shingle Jaccard (|∩|/|∪| via a shingle equi-join on the
    // candidate pairs only — never all-pairs), and report the calibration
    // summary a dedup operator reads before trusting a threshold: pair
    // count, mean/max absolute error, and how often the sketch over- vs
    // under-estimates. This is the QA loop that catches a mistuned
    // band/row split on a NEW corpus before it silently drops documents.
    Q("dedup_minhash_calibration",
      Some(s"WITH sh AS (${DS.shinglesSql(3)}), " +
        s"sig AS (${DS.minhashSignatureSql}), " +
        s"bands AS (${DS.lshBandsSql}), " +
        s"cand AS (${DS.candidatePairsSql}), " +
        "est AS (SELECT c.doc_a, c.doc_b, " +
        (0 until DS.NumHashes)
          .map(i => s"(CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END)")
          .mkString("(", " + ", ")") + " AS m, a.n AS na, b.n AS nb " +
        "FROM cand c JOIN sig a ON c.doc_a = a.doc_id " +
        "JOIN sig b ON c.doc_b = b.doc_id), " +
        "inter AS (SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS i " +
        "FROM cand c JOIN sh x ON c.doc_a = x.doc_id " +
        "JOIN sh y ON c.doc_b = y.doc_id AND x.shingle = y.shingle " +
        "GROUP BY 1, 2), " +
        "err AS (SELECT e.doc_a, " +
        s"abs(CAST(e.m AS DOUBLE) / ${DS.NumHashes}.0 - " +
        "CAST(coalesce(i.i, 0) AS DOUBLE) / " +
        "CAST(e.na + e.nb - coalesce(i.i, 0) AS DOUBLE)) AS ae, " +
        s"CASE WHEN CAST(e.m AS DOUBLE) / ${DS.NumHashes}.0 > " +
        "CAST(coalesce(i.i, 0) AS DOUBLE) / " +
        "CAST(e.na + e.nb - coalesce(i.i, 0) AS DOUBLE) THEN 1 ELSE 0 END " +
        "AS over " +
        "FROM est e LEFT JOIN inter i " +
        "ON e.doc_a = i.doc_a AND e.doc_b = i.doc_b) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(sum(CAST(round(ae * 1000000000) AS BIGINT)) AS DOUBLE) " +
        "/ 1000000000.0 / count(*) AS mean_abs_err, " +
        "max(ae) AS max_abs_err, " +
        "CAST(sum(over) AS BIGINT) AS n_overestimates, " +
        "CAST(count(*) - sum(over) AS BIGINT) AS n_underestimates FROM err"),
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val sh = DS.shingles(docs, 3).cache()
        val sig = DS.minhashSignature(sh).cache()
        // cand feeds BOTH the estimate join and the exact-intersection
        // join: eager localCheckpoint (not .cache — see the verifiedJaccard
        // guard: caching freezes partitioning and disables AQE skew-split
        // inside the band join) so the band self-join executes exactly once
        val cand = DS.candidatePairs(DS.lshBands(sig)).localCheckpoint()
        val m = (0 until DS.NumHashes)
          .map(i => when(col(s"a.h$i") === col(s"b.h$i"), 1).otherwise(0))
          .reduce(_ + _)
        val est = cand
          .join(sig.as("a"), col("doc_a") === col("a.doc_id"))
          .join(sig.as("b"), col("doc_b") === col("b.doc_id"))
          .select(col("doc_a"), col("doc_b"), m.as("m"),
            col("a.n").as("na"), col("b.n").as("nb"))
        val inter = cand
          .join(sh.select(col("doc_id").as("doc_a"), col("shingle")),
            Seq("doc_a"))
          .join(sh.select(col("doc_id").as("doc_b"), col("shingle")),
            Seq("doc_b", "shingle"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
        val nh = DS.NumHashes.toDouble
        val err = est
          .join(inter, Seq("doc_a", "doc_b"), "left")
          .select(
            abs(col("m").cast("double") / nh -
              coalesce(col("i"), lit(0L)).cast("double") /
                (col("na") + col("nb") - coalesce(col("i"), lit(0L)))
                  .cast("double")).as("ae"),
            when(col("m").cast("double") / nh >
              coalesce(col("i"), lit(0L)).cast("double") /
                (col("na") + col("nb") - coalesce(col("i"), lit(0L)))
                  .cast("double"), 1).otherwise(0).as("over"))
        H.materialized(
          err.agg(count(lit(1)).as("n_pairs"),
            (sum(round(col("ae") * 1000000000L).cast("long")).cast("double")
              / 1000000000.0 / count(lit(1))).as("mean_abs_err"),
            max("ae").as("max_abs_err"),
            sum("over").cast("long").as("n_overestimates"),
            (count(lit(1)) - sum("over")).cast("long").as("n_underestimates")),
          caches = Seq(sh, sig), checkpoints = Seq(cand))
      }),

    // SINGLE-PASS CORRELATION MATRIX of (quantity, price, discount): all
    // nine moment sums accumulate as exact DECIMALs in ONE map-side
    // combined aggregation over one scan, and the three pairwise Pearson
    // coefficients assemble from them — the way a profiler computes a
    // feature-correlation matrix without one pass per pair. sqrt is the
    // only libm call (correctly-rounded, engine-exact).
    Q("agg_corr_matrix",
      Some(
        """WITH m AS (
          |  SELECT CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sq,
          |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sp,
          |    CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sd,
          |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) *
          |      CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sqq,
          |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
          |      CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS spp,
          |    CAST(sum(CAST(l_discount AS DECIMAL(4,2)) *
          |      CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sdd,
          |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) *
          |      CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sqp,
          |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) *
          |      CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sqd,
          |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
          |      CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS spd
          |  FROM lineitem)
          |SELECT p.var_a, p.var_b,
          |  (n * sxy - sx * sy) /
          |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr
          |FROM m, LATERAL (VALUES
          |  ('quantity', 'price', sq, sp, sqq, spp, sqp),
          |  ('quantity', 'discount', sq, sd, sqq, sdd, sqd),
          |  ('price', 'discount', sp, sd, spp, sdd, spd))
          |  AS p(var_a, var_b, sx, sy, sxx, syy, sxy)
          |ORDER BY var_a, var_b""".stripMargin),
      (s, dir) => {
        val q = H.dec2(col("l_quantity")); val p = H.dec2(col("l_extendedprice"))
        val d = H.dec2s(col("l_discount"))
        val m = tbl(s, dir, "lineitem").agg(
          count(lit(1)).as("n"),
          sum(q).cast("double").as("sq"), sum(p).cast("double").as("sp"),
          sum(d).cast("double").as("sd"),
          sum(q * q).cast("double").as("sqq"),
          sum(p * p).cast("double").as("spp"),
          sum(d * d).cast("double").as("sdd"),
          sum(q * p).cast("double").as("sqp"),
          sum(q * d).cast("double").as("sqd"),
          sum(p * d).cast("double").as("spd"))
        m.select(expr(
            "stack(3, " +
              "'quantity', 'price', sq, sp, sqq, spp, sqp, " +
              "'quantity', 'discount', sq, sd, sqq, sdd, sqd, " +
              "'price', 'discount', sp, sd, spp, sdd, spd) " +
              "AS (var_a, var_b, sx, sy, sxx, syy, sxy)"),
            col("n"))
          .select(col("var_a"), col("var_b"),
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
              (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
               sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
              .as("corr"))
          .orderBy("var_a", "var_b")
      }),

    // MARKET-BASKET BRAND AFFINITY: which part brands co-occur in the
    // same order beyond chance — lift = P(ab)/(P(a)P(b)) over the order
    // universe, exact integers end to end. The distinct (order, brand)
    // set is the reduced stream (orders×brands, far below line items);
    // its self-join is an equi-join on the order key, the brand marginals
    // join back on the |brands| domain (unhinted — AQE broadcasts), and
    // the result is bounded by |brands|² with min support 50.
    Q("agg_basket_lift",
      Some(
        """WITH ob AS (
          |  SELECT DISTINCT l.l_orderkey AS ord, p.p_brand AS brand
          |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
          |n AS (SELECT CAST(count(DISTINCT ord) AS BIGINT) AS n FROM ob),
          |bc AS (SELECT brand, CAST(count(*) AS BIGINT) AS c FROM ob
          |       GROUP BY 1),
          |pairs AS (
          |  SELECT a.brand AS brand_a, b.brand AS brand_b,
          |         CAST(count(*) AS BIGINT) AS cab
          |  FROM ob a JOIN ob b ON a.ord = b.ord AND a.brand < b.brand
          |  GROUP BY 1, 2 HAVING count(*) >= 50)
          |SELECT brand_a, brand_b, cab, ca.c AS ca, cb.c AS cb,
          |  CAST(cab * n AS DOUBLE) / CAST(ca.c * cb.c AS DOUBLE) AS lift
          |FROM pairs JOIN bc ca ON pairs.brand_a = ca.brand
          |           JOIN bc cb ON pairs.brand_b = cb.brand, n
          |ORDER BY lift DESC, brand_a, brand_b LIMIT 15""".stripMargin),
      (s, dir) => {
        // FOUR consumers read the order-brand distinct (total, brand
        // counts, both self-join sides) — materialize once or the heavy
        // lineitem⋈part distinct runs four times
        val ob = tbl(s, dir, "lineitem").as("l")
          .join(tbl(s, dir, "part").as("p"),
            col("l.l_partkey") === col("p.p_partkey"))
          .select(col("l.l_orderkey").as("ord"), col("p.p_brand").as("brand"))
          .distinct().localCheckpoint()
        val n = ob.agg(countDistinct("ord").as("n"))
        val bc = ob.groupBy("brand").agg(count(lit(1)).as("c"))
        // r12: the ord self-join shuffled ob TWICE and probed per pair;
        // the pair stream now expands in-row from each order's sorted
        // brand SET (bounded by the |brands| domain, so no skew risk at
        // any scale) — one exchange to group, then the 300-group pair
        // count collapses map-side. sort_array makes i<j ≡ brand_a<brand_b.
        val pairs = ob.groupBy("ord")
          .agg(sort_array(collect_set(col("brand"))).as("bs"))
          .select(explode(expr(
            "flatten(transform(bs, (x, i) -> " +
              "transform(slice(bs, i + 2, size(bs) - i - 1), y -> " +
              "named_struct('ba', x, 'bb', y))))")).as("p"))
          .groupBy(col("p.ba").as("brand_a"), col("p.bb").as("brand_b"))
          .agg(count(lit(1)).as("cab"))
          .filter(col("cab") >= 50)
        pairs
          .join(bc.select(col("brand").as("brand_a"), col("c").as("ca")),
            Seq("brand_a"))
          .join(bc.select(col("brand").as("brand_b"), col("c").as("cb")),
            Seq("brand_b"))
          .crossJoin(broadcast(n))
          .select(col("brand_a"), col("brand_b"), col("cab"), col("ca"),
            col("cb"),
            ((col("cab") * col("n")).cast("double") /
              (col("ca") * col("cb")).cast("double")).as("lift"))
          .orderBy(col("lift").desc, col("brand_a"), col("brand_b"))
          .limit(15)
          .transform(out => graft.H.materialized(out, Nil, Seq(ob)))
      }),

    // VIT-STYLE PATCH GRID over true decoded JPEG rasters: each image
    // splits into a 4×4 patch grid with exact integer stats per patch —
    // the tensor-preprocessing step before a vision encoder. The raster
    // comes from the REAL baseline-JPEG codec (container bytes → Huffman
    // → IDCT → crop), so the oracle's closed-form pixel prediction pins
    // the whole decode path; the patch mapping (y·4÷h)·4 + (x·4÷w) stays
    // total for dimensions not divisible by 4.
    Q("multimodal_patches",
      Some(
        """WITH dims AS (
          |  SELECT doc_id, 5 + doc_id % 28 AS w,
          |         5 + (doc_id * 5 + octet_length(encode(text))) % 28 AS h
          |  FROM documents WHERE doc_id < 40),
          |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS i FROM dims),
          |p AS (
          |  SELECT doc_id,
          |    ((i // w) * 4 // h) * 4 + ((i % w) * 4 // w) AS patch,
          |    (doc_id * 11 + ((i % w) // 8) * 37 + ((i // w) // 8) * 101)
          |      % 256 AS v
          |  FROM px)
          |SELECT doc_id, CAST(patch AS BIGINT) AS patch,
          |  CAST(count(*) AS BIGINT) AS n_px,
          |  CAST(sum(v) AS BIGINT) AS px_sum,
          |  CAST(min(v) AS BIGINT) AS px_min,
          |  CAST(max(v) AS BIGINT) AS px_max
          |FROM p GROUP BY 1, 2 ORDER BY doc_id, patch""".stripMargin),
      (s, dir) =>
        graft.functions.Multimodal
          .transformPatches(s, tbl(s, dir, "documents")
            .filter(col("doc_id") < 40))
          .toDF()
          .orderBy("doc_id", "patch"))
  )
}
