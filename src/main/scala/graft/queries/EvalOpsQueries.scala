package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Twenty-third wave: evaluation ops — retrieval-quality metrics
  * (MRR/P@k/R@k), seasonal-residual anomaly flags, and bitmap-aggregate
  * distinct counting (the two-level exact-distinct shape).
  *
  * Determinism: every metric is a single division of exact integers and
  * is emitted PER QUERY (no cross-row double accumulation); the anomaly
  * gate compares each residual against a MAD computed by exact rank
  * selection (lower median), never an interpolated float.
  */
object EvalOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // RETRIEVAL EVALUATION: MRR, precision@5 and recall@10 for three
    // single-term queries over the term-frequency ranking, with binary
    // relevance = "term appears ≥3 times" — the eval harness that turns
    // a ranking (rank_bm25 / rank_rrf) into a quality number. Postings
    // are bounded by the query terms (never the corpus); each query's
    // ranking is a WindowGroupLimit-bounded top-10; metrics are exact
    // ratios emitted per query so no double ever crosses a row boundary.
    Q("rank_eval",
      Some(
        """WITH qt AS (SELECT unnest(['spark', 'join', 'window']) AS term),
          |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
          |        FROM documents),
          |tf AS (SELECT t.term, t.doc_id, CAST(count(*) AS BIGINT) AS tf
          |       FROM tok t JOIN qt ON t.term = qt.term GROUP BY 1, 2),
          |rel AS (SELECT term, doc_id FROM tf WHERE tf >= 3),
          |nrel AS (SELECT term, CAST(count(*) AS BIGINT) AS n_rel FROM rel
          |         GROUP BY 1),
          |rk AS (SELECT term, doc_id, tf,
          |         CAST(row_number() OVER (PARTITION BY term
          |           ORDER BY tf DESC, doc_id) AS BIGINT) AS rnk
          |       FROM tf QUALIFY rnk <= 10),
          |j AS (SELECT rk.term, rk.rnk,
          |        CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel
          |      FROM rk LEFT JOIN rel
          |        ON rk.term = rel.term AND rk.doc_id = rel.doc_id)
          |SELECT j.term,
          |  CAST(min(CASE WHEN is_rel = 1 THEN rnk END) AS BIGINT)
          |    AS first_rel_rank,
          |  1.0 / min(CASE WHEN is_rel = 1 THEN rnk END) AS rr,
          |  CAST(sum(CASE WHEN rnk <= 5 THEN is_rel ELSE 0 END) AS DOUBLE)
          |    / 5.0 AS p_at_5,
          |  CAST(sum(is_rel) AS DOUBLE) / CAST(max(n.n_rel) AS DOUBLE)
          |    AS r_at_10,
          |  max(n.n_rel) AS n_rel
          |FROM j JOIN nrel n ON j.term = n.term
          |GROUP BY j.term ORDER BY j.term""".stripMargin),
      (s, dir) => {
        val qt = s.createDataFrame(Seq(Tuple1("spark"), Tuple1("join"),
          Tuple1("window"))).toDF("term")
        val tf = tbl(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .join(broadcast(qt), Seq("term"))
          .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
        val rel = tf.filter(col("tf") >= 3).select("term", "doc_id")
        val nrel = rel.groupBy("term").agg(count(lit(1)).as("n_rel"))
        val rk = tf
          .withColumn("rnk", row_number().over(
            Window.partitionBy("term").orderBy(col("tf").desc, col("doc_id")))
            .cast("long"))
          .filter(col("rnk") <= 10)
        // rel and rk both descend from tf: rename BOTH of rel's join
        // columns (a df("c") === df2("c") self-join compare degenerates)
        val rel2 = rel.select(col("term").as("rterm"),
          col("doc_id").as("rel_doc"))
        val j = rk
          .join(rel2, col("term") === col("rterm") &&
            col("doc_id") === col("rel_doc"), "left")
          .select(col("term"), col("rnk"),
            when(col("rel_doc").isNotNull, 1).otherwise(0).as("is_rel"))
        j.join(nrel, Seq("term"))
          .groupBy("term")
          .agg(
            min(when(col("is_rel") === 1, col("rnk"))).cast("long")
              .as("first_rel_rank"),
            (lit(1.0) / min(when(col("is_rel") === 1, col("rnk")))).as("rr"),
            (sum(when(col("rnk") <= 5, col("is_rel")).otherwise(0))
              .cast("double") / 5.0).as("p_at_5"),
            (sum("is_rel").cast("double") / max("n_rel").cast("double"))
              .as("r_at_10"),
            max("n_rel").as("n_rel"))
          .orderBy("term")
      }),

    // SEASONAL-RESIDUAL ANOMALY FLAGS: the composition a monitor actually
    // runs — detrend (7-day centered MA), de-season (weekday index), then
    // flag days whose residual exceeds 3× the MAD of all residuals. Both
    // medians are EXACT RANK SELECTIONS (lower median via row_number), so
    // the gate value is an existing data point, not an interpolated
    // float; the per-day comparison is then deterministic double
    // arithmetic with no cross-row accumulation. Everything after the
    // daily reduce runs on the |days| domain.
    Q("ts_anomaly_seasonal",
      Some(
        """WITH d AS (
          |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
          |  FROM events GROUP BY 1),
          |t AS (
          |  SELECT day, c,
          |    CAST(sum(c) OVER w AS DOUBLE) / CAST(count(*) OVER w AS DOUBLE)
          |      AS trend,
          |    CAST(count(*) OVER w AS BIGINT) AS wdays
          |  FROM d WINDOW w AS (ORDER BY day
          |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
          |s AS (
          |  SELECT *, CAST(strftime(day, '%w') AS BIGINT) AS dow,
          |         c - trend AS detr FROM t),
          |idx AS (
          |  SELECT dow,
          |    CAST(sum(CAST(round(detr * 1000000000) AS BIGINT)) AS DOUBLE)
          |      / 1000000000.0 / count(*) AS seasonal
          |  FROM s WHERE wdays = 7 GROUP BY dow),
          |res AS (
          |  SELECT s.day, s.c, s.detr - i.seasonal AS r
          |  FROM s JOIN idx i ON s.dow = i.dow),
          |med AS (
          |  SELECT r AS m FROM (
          |    SELECT r, row_number() OVER (ORDER BY r) AS rn,
          |           count(*) OVER () AS n FROM res)
          |  WHERE rn = (n + 1) // 2),
          |mad AS (
          |  SELECT ad AS mad FROM (
          |    SELECT abs(r - (SELECT m FROM med)) AS ad,
          |           row_number() OVER (ORDER BY abs(r - (SELECT m FROM med)))
          |             AS rn,
          |           count(*) OVER () AS n FROM res)
          |  WHERE rn = (n + 1) // 2)
          |SELECT strftime(res.day, '%Y-%m-%d') AS day, res.c, res.r,
          |  (SELECT mad FROM mad) AS mad,
          |  CAST(CASE WHEN abs(res.r - (SELECT m FROM med)) >
          |    3 * (SELECT mad FROM mad) THEN 1 ELSE 0 END AS BIGINT)
          |    AS is_anomaly
          |FROM res ORDER BY day""".stripMargin),
      (s, dir) => {
        val d = H.events(s, dir)
          .groupBy(col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("c"))
        val w = Window.orderBy("day").rowsBetween(-3, 3)
        val t = d
          .withColumn("trend", sum("c").over(w).cast("double") /
            count(lit(1)).over(w).cast("double"))
          .withColumn("wdays", count(lit(1)).over(w).cast("long"))
        val sdf = t
          .withColumn("dow", (dayofweek(col("day")) - 1).cast("long"))
          .withColumn("detr", col("c") - col("trend"))
        val idx = sdf.filter(col("wdays") === 7)
          .groupBy("dow")
          .agg((sum(round(col("detr") * 1000000000L).cast("long"))
            .cast("double") / 1000000000.0 / count(lit(1))).as("seasonal"))
        val res = sdf.join(idx, Seq("dow"))
          .select(col("day"), col("c"),
            (col("detr") - col("seasonal")).as("r"))
        def lowerMedian(df: org.apache.spark.sql.DataFrame, c: String) = df
          .withColumn("rn", row_number().over(Window.orderBy(col(c))))
          .withColumn("n", count(lit(1)).over(Window.partitionBy()))
          .filter(col("rn") === expr("(n + 1) div 2"))
          .select(col(c))
        val med = broadcast(lowerMedian(res.select(col("r")), "r")
          .withColumnRenamed("r", "m"))
        val mad = broadcast(lowerMedian(
          res.crossJoin(med).select(abs(col("r") - col("m")).as("ad")), "ad")
          .withColumnRenamed("ad", "mad"))
        res.crossJoin(med).crossJoin(mad)
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("c"),
            col("r"), col("mad"),
            when(abs(col("r") - col("m")) > lit(3) * col("mad"), 1L)
              .otherwise(0L).cast("long").as("is_anomaly"))
          .orderBy("day")
      }),

    // BITMAP-AGGREGATE DISTINCT: exact count-distinct via Spark's bitmap
    // aggregate family — positions OR-merge per bucket, buckets sum —
    // the two-level shape that makes exact distinct shuffle fixed-width
    // bitmap bytes instead of raw values (the same reason the sketch
    // family ships bytes). Oracle: plain COUNT(DISTINCT). Per order-year
    // distinct customers.
    Q("agg_bitmap_distinct",
      Some(
        """SELECT CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS yr,
          |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
          |  CAST(count(*) AS BIGINT) AS n_orders
          |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin),
      (s, dir) => {
        val o = tbl(s, dir, "orders")
          .select(date_format(col("o_orderdate"), "yyyy").cast("long")
            .as("yr"), col("o_custkey"))
        val buckets = o
          .groupBy(col("yr"), expr("bitmap_bucket_number(o_custkey)")
            .as("bkt"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))")
            .as("bm"))
        val counts = buckets.groupBy("yr")
          .agg(sum(expr("bitmap_count(bm)")).cast("long").as("n_customers"))
        val orders = o.groupBy("yr").agg(count(lit(1)).as("n_orders"))
        counts.join(orders, Seq("yr")).orderBy("yr")
      })
  )
}
