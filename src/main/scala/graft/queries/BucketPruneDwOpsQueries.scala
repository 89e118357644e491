package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-10 wave 151: three surfaces the board lacked —
  *   - bucket PRUNING (the scan-planning face of bucketing: a point
  *     predicate on the bucket column reads 1-of-8 buckets, the join face
  *     is already covered by join_bucketed),
  *   - Spark 4 star-EXCEPT projection + ORDER BY ALL (the ergonomic SQL
  *     surface, cross-checked against DuckDB's EXCLUDE/ORDER BY ALL),
  *   - the Durbin-Watson test (first-order autocorrelation of regression
  *     residuals — the companion diagnostic to the board's Ljung-Box,
  *     which tests the raw series, not a fit's residuals).
  */
object BucketPruneDwOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // BUCKET PRUNING: orders written bucketBy(8, o_custkey); a point
    // predicate on the bucket column lets the scan read ONLY the bucket
    // the key hashes to — 1/8 of the files, no shuffle, no other-bucket
    // IO (PlanGuardsSpec pins "SelectedBucketsCount: 1 out of 8" in the
    // executed plan). The oracle computes the same per-customer rollup
    // from the raw table. At 100 TB this is the point-lookup path on a
    // bucketed fact: file-set pruning at PLANNING time, before a single
    // row is read.
    Q("layout_bucket_pruning",
      Some("SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders, " +
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)" +
        " AS cents " +
        "FROM orders WHERE o_custkey IN (7, 19, 42) " +
        "GROUP BY 1 ORDER BY 1"),
      (s, dir) => {
        val (out, _) = bucketPruneFrames(s, dir)
        out
      }),

    // STAR-EXCEPT + ORDER BY ALL (Spark 4.1 SQL surface): project a wide
    // row with `* EXCEPT (...)` instead of enumerating the keep-list, and
    // let ORDER BY ALL sort by every output column left-to-right. DuckDB
    // cross-checks with its EXCLUDE spelling — same projection algebra,
    // independently implemented in both engines.
    Q("sql_star_except",
      Some("SELECT * EXCLUDE (o_orderstatus, o_orderdate, o_totalprice) " +
        "FROM (SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate, " +
        "o_totalprice, o_orderpriority FROM orders WHERE o_orderkey % 97 = 0) " +
        "ORDER BY ALL"),
      (s, dir) => {
        tbl(s, dir, "orders").createOrReplaceTempView("orders_se")
        s.sql("SELECT * EXCEPT (o_orderstatus, o_orderdate, o_totalprice) " +
          "FROM (SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate, " +
          "o_totalprice, o_orderpriority FROM orders_se " +
          "WHERE o_orderkey % 97 = 0) ORDER BY ALL")
      }),

    // DURBIN-WATSON: first-order autocorrelation of the residuals of a
    // daily-revenue linear trend fit. Daily revenue cents come from one
    // fact reduce onto the 30-day calendar domain; the OLS slope and
    // intercept derive from exact integer moments over those 30 rows
    // (milli-scaled floor divisions, both engines identical); per-day
    // residuals are exact milli integers, and DW = Σ(e_t − e_{t−1})² /
    // Σe_t² lands in milli via HUGEINT/DECIMAL(38,0) products. DW ≈ 2
    // means independent residuals; ≪ 2 flags the positive autocorrelation
    // that invalidates the fit's error bars. Bounded 30-row domain after
    // the single reduce.
    Q("stats_durbin_watson",
      Some(
        """WITH d AS (SELECT CAST(strftime(o_orderdate, '%d') AS BIGINT) AS t,
          |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
          |      AS BIGINT) AS y
          |  FROM orders WHERE year(o_orderdate) = 1997
          |    AND month(o_orderdate) = 3 GROUP BY 1),
          |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(t) AS BIGINT) AS st, CAST(sum(y) AS BIGINT) AS sy,
          |    CAST(sum(t * t) AS BIGINT) AS stt,
          |    CAST(sum(CAST(t AS HUGEINT) * y) AS BIGINT) AS sty
          |  FROM d),
          |fit AS (SELECT n, st, sy, stt, sty,
          |    CAST((CAST(n AS HUGEINT) * sty - CAST(st AS HUGEINT) * sy)
          |      * 1000 // (CAST(n AS HUGEINT) * stt
          |        - CAST(st AS HUGEINT) * st) AS BIGINT) AS slope_milli
          |  FROM m),
          |fit2 AS (SELECT n, st, sy, stt, sty, slope_milli,
          |    (sy * 1000 - slope_milli * st) // n AS icept_milli FROM fit),
          |e AS (SELECT d.t,
          |    d.y * 1000 - (fit2.slope_milli * d.t + fit2.icept_milli)
          |      AS e_milli
          |  FROM d CROSS JOIN fit2),
          |dw AS (SELECT
          |    CAST(sum(CASE WHEN prev IS NULL THEN 0 ELSE
          |      CAST((e_milli - prev) AS HUGEINT) * (e_milli - prev) END)
          |      AS HUGEINT) AS num,
          |    CAST(sum(CAST(e_milli AS HUGEINT) * e_milli) AS HUGEINT)
          |      AS den
          |  FROM (SELECT t, e_milli,
          |      lag(e_milli) OVER (ORDER BY t) AS prev FROM e))
          |SELECT fit2.n AS n_days, fit2.slope_milli, fit2.icept_milli,
          |  CAST(dw.num * 1000 // greatest(dw.den, 1) AS BIGINT)
          |    AS dw_milli
          |FROM fit2 CROSS JOIN dw
          |""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1997 &&
            month(col("o_orderdate")) === 3)
          .groupBy(date_format(col("o_orderdate"), "d").cast("long").as("t"))
          .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
            .cast("long").as("y"))
          .localCheckpoint() // the moment reduce + residual pass read it
        val m = d.agg(count(lit(1)).cast("long").as("n"),
          sum("t").cast("long").as("st"), sum("y").cast("long").as("sy"),
          sum(expr("t * t")).cast("long").as("stt"),
          sum(expr("CAST(t AS DECIMAL(38,0)) * y")).cast("long").as("sty"))
        val fit2 = m
          .withColumn("slope_milli", expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * sty" +
              " - CAST(st AS DECIMAL(38,0)) * sy) * 1000" +
              " div (CAST(n AS DECIMAL(38,0)) * stt" +
              " - CAST(st AS DECIMAL(38,0)) * st) AS BIGINT)"))
          .withColumn("icept_milli",
            expr("(sy * 1000 - slope_milli * st) div n"))
        val e = d.crossJoin(broadcast(fit2))
          .select(col("t"), col("n"), col("slope_milli"), col("icept_milli"),
            expr("y * 1000 - (slope_milli * t + icept_milli)").as("e_milli"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("t")
        // the ordered lag window runs on the bounded 31-row calendar
        // domain (one month), never the fact stream — single-partition by
        // construction, the PlanGuards calendar-spine allowance
        val dw = e.withColumn("prev", lag("e_milli", 1).over(w))
          .agg(
            sum(expr("CASE WHEN prev IS NULL THEN CAST(0 AS DECIMAL(38,0))" +
              " ELSE CAST((e_milli - prev) AS DECIMAL(38,0))" +
              " * (e_milli - prev) END")).cast("decimal(38,0)").as("num"),
            sum(expr("CAST(e_milli AS DECIMAL(38,0)) * e_milli"))
              .cast("decimal(38,0)").as("den"))
        val out = fit2.crossJoin(broadcast(dw))
          .select(col("n").as("n_days"), col("slope_milli"),
            col("icept_milli"),
            expr("CAST(num * 1000 div greatest(den, CAST(1 AS DECIMAL(38,0)))" +
              " AS BIGINT)").as("dw_milli"))
        H.materialized(out, caches = Nil, checkpoints = Seq(d))
      })
  )

  /** layout_bucket_pruning's interior (result, bucketed table name),
    * exposed so PlanGuardsSpec can assert SelectedBucketsCount in the
    * executed scan. */
  def bucketPruneFrames(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, String) = {
    val db = "graft_bucketprune"
    s.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val dbPath = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), s"$db.db")
    val fs = dbPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(dbPath)) fs.delete(dbPath, true)
    s.sql(s"CREATE DATABASE `$db`")
    // pre-partition on the bucket hash (repartition(8, key) IS the bucket
    // spec's pmod(murmur3, 8)): each task holds exactly one bucket and
    // writes exactly one file, so the encode+compress runs 8-way instead
    // of single-task (r12: the write stage was 10 s of one-task wall)
    tbl(s, dir, "orders").repartition(8, col("o_custkey"))
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey")
      .format("parquet").saveAsTable(s"$db.orders_bp")
    val out = s.table(s"$db.orders_bp")
      .filter(col("o_custkey").isin(7, 19, 42))
      .groupBy("o_custkey")
      .agg(count(lit(1)).cast("long").as("n_orders"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .cast("long").as("cents"))
      .orderBy("o_custkey")
    (out, s"$db.orders_bp")
  }
}
