package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Forty-third wave: classical ML evaluation ops over the embedding and fact
  * tables — the model-in-the-loop side of a training-data pipeline (quality
  * classifiers, label-propagation checks, feature screening). All arithmetic
  * is exact: vectors are micro-quantized to BIGINT at the load edge
  * (floor(x*1e6 + 0.5), the emb_quantize_int8 discipline), every sum is an
  * integer sum, and doubles appear only as final casts of exact integers
  * (cast → sqrt → divide is correctly rounded in both engines, so the
  * DuckDB hash compare holds bit-for-bit).
  */
object ClassifierOpsQueries extends QueryModule {

  private val Dim = 64

  def all: Seq[Q] = Seq(

    // Nearest-centroid (Rocchio) classification: train on vec_id%5!=0,
    // classify the held-out fold by cosine against per-label centroid
    // directions, emit the confusion matrix. The centroid is kept as the
    // per-label component-SUM vector — cosine is scale-invariant, so the
    // mean's division (engine-divergent for negative ints) never happens.
    // Scale: centroids are one map-side-combined groupBy over the corpus
    // (640 rows out), then a broadcast to the scoring side — no shuffle on
    // the test fold; at 100 TB the corpus pass is embarrassingly parallel.
    Q("clf_centroid_nearest",
      Some(
        """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
          |  list_transform(embedding::DOUBLE[],
          |    x -> CAST(floor(x*1000000.0 + 0.5) AS BIGINT)) AS q
          |  FROM embeddings),
          |tr AS (SELECT * FROM e WHERE vec_id % 5 <> 0),
          |te AS (SELECT * FROM e WHERE vec_id % 5 = 0),
          |tp AS (SELECT label, i, CAST(sum(q[i+1]) AS BIGINT) AS sx
          |  FROM tr, unnest(range(0, 64)) t(i) GROUP BY label, i),
          |cn AS (SELECT label, CAST(sum(sx*sx) AS BIGINT) AS nc
          |  FROM tp GROUP BY label),
          |tn AS (SELECT vec_id, CAST(sum(x*x) AS BIGINT) AS nt
          |  FROM (SELECT vec_id, unnest(q) AS x FROM te) GROUP BY vec_id),
          |d AS (SELECT te.vec_id, te.label AS tl, tp.label AS pl,
          |  CAST(sum(te.q[tp.i+1] * tp.sx) AS BIGINT) AS dot
          |  FROM te CROSS JOIN tp GROUP BY te.vec_id, te.label, tp.label),
          |s AS (SELECT d.vec_id, d.tl, d.pl,
          |  CAST(d.dot AS DOUBLE) /
          |    (sqrt(CAST(tn.nt AS DOUBLE)) * sqrt(CAST(cn.nc AS DOUBLE))) AS sim
          |  FROM d JOIN tn USING (vec_id) JOIN cn ON cn.label = d.pl),
          |p AS (SELECT vec_id, tl, pl,
          |  row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, pl) AS rn
          |  FROM s)
          |SELECT tl AS label, pl AS pred, CAST(count(*) AS BIGINT) AS n
          |FROM p WHERE rn = 1 GROUP BY tl, pl ORDER BY label, pred
          |""".stripMargin),
      (s, dir) => {
        val e = tbl(s, dir, "embeddings").select(
          col("vec_id"), col("label").cast("long").as("label"),
          transform(col("embedding").cast("array<double>"),
            x => floor(x * lit(1000000.0) + lit(0.5)).cast("long")).as("q"))
        val cent = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
          .select(col("label"), posexplode(col("q")).as(Seq("i", "x")))
          .groupBy("label", "i").agg(sum("x").as("sx"))
          .groupBy("label")
          .agg(transform(array_sort(collect_list(struct(col("i"), col("sx")))),
            p => p.getField("sx")).as("c"))
          .withColumn("nc",
            aggregate(col("c"), lit(0L), (acc, x) => acc + x * x))
          .select(col("label").as("pl"), col("c"), col("nc"))
        val te = e.filter(pmod(col("vec_id"), lit(5)) === 0)
          .withColumn("nt",
            aggregate(col("q"), lit(0L), (acc, x) => acc + x * x))
        val w = Window.partitionBy("vec_id")
          .orderBy(col("sim").desc, col("pl"))
        te.join(broadcast(cent))
          .withColumn("dot", aggregate(
            zip_with(col("q"), col("c"), (a, b) => a * b),
            lit(0L), (acc, x) => acc + x))
          .withColumn("sim", col("dot").cast("double") /
            (sqrt(col("nt").cast("double")) * sqrt(col("nc").cast("double"))))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .groupBy(col("label"), col("pl").as("pred"))
          .agg(count(lit(1)).cast("long").as("n"))
          .orderBy("label", "pred")
      }),

    // k-NN majority-vote evaluation (k=5): bounded query fold (vec_id<200,
    // %5=0) against the train corpus, exact integer dot-product cosine,
    // vote ties broken by smallest label. This is the eval harness for the
    // ANN family (sim_ann_lsh / sim_ivf_topk are the production retrieval
    // path); queries are broadcast, so the corpus side streams with no
    // shuffle and the per-query top-k is a bounded window.
    Q("clf_knn_vote",
      Some(
        """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
          |  list_transform(embedding::DOUBLE[],
          |    x -> CAST(floor(x*1000000.0 + 0.5) AS BIGINT)) AS q
          |  FROM embeddings),
          |te AS (SELECT * FROM e WHERE vec_id % 5 = 0 AND vec_id < 200),
          |tr AS (SELECT * FROM e WHERE vec_id % 5 <> 0),
          |nn AS (SELECT vec_id, CAST(sum(x*x) AS BIGINT) AS n2
          |  FROM (SELECT vec_id, unnest(q) AS x FROM e) GROUP BY vec_id),
          |d AS (SELECT te.vec_id AS qid, te.label AS tl, tr.vec_id AS vid,
          |  tr.label AS nl,
          |  CAST(sum(te.q[i+1] * tr.q[i+1]) AS BIGINT) AS dot
          |  FROM te CROSS JOIN tr, unnest(range(0, 64)) t(i)
          |  GROUP BY te.vec_id, te.label, tr.vec_id, tr.label),
          |s AS (SELECT d.qid, d.tl, d.vid, d.nl,
          |  CAST(d.dot AS DOUBLE) /
          |    (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS sim
          |  FROM d JOIN nn a ON a.vec_id = d.qid JOIN nn b ON b.vec_id = d.vid),
          |k AS (SELECT qid, tl, vid, nl,
          |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vid) AS rn
          |  FROM s),
          |v AS (SELECT qid, tl, nl, CAST(count(*) AS BIGINT) AS votes
          |  FROM k WHERE rn <= 5 GROUP BY qid, tl, nl),
          |p AS (SELECT qid, tl, nl AS pred, votes,
          |  row_number() OVER (PARTITION BY qid ORDER BY votes DESC, nl) AS vr
          |  FROM v)
          |SELECT qid AS vec_id, tl AS label, pred, votes,
          |  CASE WHEN pred = tl THEN 1 ELSE 0 END AS hit
          |FROM p WHERE vr = 1 ORDER BY vec_id
          |""".stripMargin),
      (s, dir) => {
        val e = tbl(s, dir, "embeddings").select(
          col("vec_id"), col("label").cast("long").as("label"),
          transform(col("embedding").cast("array<double>"),
            x => floor(x * lit(1000000.0) + lit(0.5)).cast("long")).as("q"))
          .withColumn("n2",
            aggregate(col("q"), lit(0L), (acc, x) => acc + x * x))
        val te = e.filter(pmod(col("vec_id"), lit(5)) === 0 &&
            col("vec_id") < 200)
          .select(col("vec_id").as("qid"), col("label").as("tl"),
            col("q").as("qq"), col("n2").as("qn"))
        val tr = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
          .select(col("vec_id").as("vid"), col("label").as("nl"),
            col("q").as("cq"), col("n2").as("cn"))
        val wk = Window.partitionBy("qid").orderBy(col("sim").desc, col("vid"))
        val wv = Window.partitionBy("qid")
          .orderBy(col("votes").desc, col("nl"))
        tr.join(broadcast(te))
          .withColumn("dot", aggregate(
            zip_with(col("qq"), col("cq"), (a, b) => a * b),
            lit(0L), (acc, x) => acc + x))
          .withColumn("sim", col("dot").cast("double") /
            (sqrt(col("qn").cast("double")) * sqrt(col("cn").cast("double"))))
          .withColumn("rn", row_number().over(wk))
          .filter(col("rn") <= 5)
          .groupBy("qid", "tl", "nl")
          .agg(count(lit(1)).cast("long").as("votes"))
          .withColumn("vr", row_number().over(wv))
          .filter(col("vr") === 1)
          .select(col("qid").as("vec_id"), col("tl").as("label"),
            col("nl").as("pred"), col("votes"),
            when(col("nl") === col("tl"), 1).otherwise(0).as("hit"))
          .orderBy("vec_id")
      }),

    // Decision-stump feature screening: for each candidate feature
    // (quantity, discount-percent, tax-percent) and each threshold, the
    // weighted Gini impurity of the `returnflag='R'` split, best three
    // thresholds per feature. Pure integer arithmetic (impurity scaled to
    // micro; operands all non-negative so Spark `div` == DuckDB `//`).
    // Scale: one explode→groupBy pass compresses the fact table to
    // per-(feature,value) counts (~70 rows); the threshold sweep is a
    // window cumsum over that tiny frame — the 100 TB cost is the single
    // map-side-combined aggregation.
    Q("clf_decision_stump",
      Some(
        """WITH li AS (SELECT
          |  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos,
          |  CAST(l_quantity AS BIGINT) AS qty,
          |  CAST(floor(l_discount*100 + 0.5) AS BIGINT) AS disc,
          |  CAST(floor(l_tax*100 + 0.5) AS BIGINT) AS tax FROM lineitem),
          |f AS (SELECT 'disc' AS feature, disc AS fval, pos FROM li
          |  UNION ALL SELECT 'qty', qty, pos FROM li
          |  UNION ALL SELECT 'tax', tax, pos FROM li),
          |a AS (SELECT feature, fval, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(pos) AS BIGINT) AS p FROM f GROUP BY feature, fval),
          |c AS (SELECT feature, fval,
          |  CAST(sum(n) OVER w AS BIGINT) AS nl,
          |  CAST(sum(p) OVER w AS BIGINT) AS pl,
          |  CAST(sum(n) OVER (PARTITION BY feature) AS BIGINT) AS nt,
          |  CAST(sum(p) OVER (PARTITION BY feature) AS BIGINT) AS pt
          |  FROM a WINDOW w AS (PARTITION BY feature ORDER BY fval)),
          |g AS (SELECT feature, fval AS threshold, nl, nt - nl AS nr,
          |  1000000 - (pl*1000 // nl) * (pl*1000 // nl)
          |    - ((nl-pl)*1000 // nl) * ((nl-pl)*1000 // nl) AS gl,
          |  1000000 - ((pt-pl)*1000 // (nt-nl)) * ((pt-pl)*1000 // (nt-nl))
          |    - (((nt-nl)-(pt-pl))*1000 // (nt-nl))
          |      * (((nt-nl)-(pt-pl))*1000 // (nt-nl)) AS gr
          |  FROM c WHERE nl > 0 AND nt - nl > 0),
          |s AS (SELECT feature, threshold,
          |  CAST((nl*gl + nr*gr) // (nl + nr) AS BIGINT) AS split_micro
          |  FROM g),
          |r AS (SELECT feature, threshold, split_micro,
          |  CAST(row_number() OVER
          |    (PARTITION BY feature ORDER BY split_micro, threshold)
          |    AS BIGINT) AS rn FROM s)
          |SELECT feature, threshold, split_micro, rn FROM r
          |WHERE rn <= 3 ORDER BY feature, rn
          |""".stripMargin),
      (s, dir) => {
        val li = tbl(s, dir, "lineitem").select(
          (col("l_returnflag") === "R").cast("long").as("pos"),
          col("l_quantity").cast("long").as("qty"),
          floor(col("l_discount") * 100 + lit(0.5)).cast("long").as("disc"),
          floor(col("l_tax") * 100 + lit(0.5)).cast("long").as("tax"))
        val f = li.select(explode(array(
            struct(lit("disc").as("feature"), col("disc").as("fval"),
              col("pos")),
            struct(lit("qty").as("feature"), col("qty").as("fval"),
              col("pos")),
            struct(lit("tax").as("feature"), col("tax").as("fval"),
              col("pos")))).as("x"))
          .select("x.*")
        val wc = Window.partitionBy("feature").orderBy("fval")
        val wt = Window.partitionBy("feature")
        val wr = Window.partitionBy("feature")
          .orderBy("split_micro", "threshold")
        f.groupBy("feature", "fval")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("pos").cast("long").as("p"))
          .withColumn("nl", sum("n").over(wc))
          .withColumn("pl", sum("p").over(wc))
          .withColumn("nt", sum("n").over(wt))
          .withColumn("pt", sum("p").over(wt))
          .filter(col("nl") > 0 && col("nt") - col("nl") > 0)
          .select(col("feature"), col("fval").as("threshold"), col("nl"),
            (col("nt") - col("nl")).as("nr"),
            // Gini as 1e6 − p²_milli − q²_milli (ratios floored to milli
            // BEFORE squaring): numerators stay within 64 bits up to 10¹²
            // rows — the (pl²+…)·10⁶ form overflowed at 6M rows (measured
            // at the k=10 probe)
            expr("1000000L - (pl*1000 div nl) * (pl*1000 div nl)" +
              " - ((nl-pl)*1000 div nl) * ((nl-pl)*1000 div nl)")
              .as("gl"),
            expr("1000000L - ((pt-pl)*1000 div (nt-nl))" +
              " * ((pt-pl)*1000 div (nt-nl))" +
              " - (((nt-nl)-(pt-pl))*1000 div (nt-nl))" +
              " * (((nt-nl)-(pt-pl))*1000 div (nt-nl))").as("gr"))
          .withColumn("split_micro",
            expr("(nl*gl + nr*gr) div (nl + nr)"))
          .withColumn("rn", row_number().over(wr).cast("long"))
          .filter(col("rn") <= 3)
          .select("feature", "threshold", "split_micro", "rn")
          .orderBy("feature", "rn")
      }))
}
