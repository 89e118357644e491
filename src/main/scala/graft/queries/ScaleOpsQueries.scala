package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{H, Q, QueryModule}
import graft.H.{dec2, sumMoney, tbl}

/** Round-4 scale-operations wave: runtime bloom-filter join pruning,
  * range-sorted file layout with min/max pruning, interpolated percentiles,
  * mode()/FILTER aggregates, executed observe() telemetry, ntile binning,
  * Unicode canonicalization (native expression), and an exactly-computable
  * character-concentration quality signal.
  */
object ScaleOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // ---- Runtime bloom-filter join pruning ------------------------------
    //
    // The 100 TB case: fact ⋈ selective dim where the dim side is too big
    // to broadcast. Spark's runtime row-level filtering builds a bloom
    // filter from the dim's join keys as a scalar subquery and injects
    // might_contain(...) into the fact scan, so most fact rows die before
    // the shuffle instead of after it. Here the thresholds are lowered (and
    // broadcast disabled) so the sf-scale plan is shaped exactly like the
    // 100 TB plan: the optimized plan carries bloom_filter_agg on the
    // orders side and might_contain above the lineitem scan. The bloom is a
    // prefilter only — the exact join still runs, so results are exact.
    Q("join_bloom_prefilter",
      Some("SELECT l.l_orderkey, CAST(count(*) AS BIGINT) AS n_items, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "WHERE o.o_orderpriority = '1-URGENT' " +
        "GROUP BY 1 ORDER BY 1"),
      (s, dir) => {
        // child session: conf changes are invisible to concurrently-planned
        // queries in the main session (same pattern as the streaming group)
        val ss = s.newSession()
        ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
        ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val l = tbl(ss, dir, "lineitem")
        val o = tbl(ss, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy(l("l_orderkey"))
          .agg(count(lit(1)).as("n_items"),
            sumMoney(col("l_extendedprice")).as("revenue"))
          .orderBy("l_orderkey")
      }),

    // ---- Range-sorted layout + min/max pruning --------------------------
    //
    // The write path that makes a 100 TB time-series table cheap to query:
    // repartitionByRange on the time column (range shuffle → each output
    // file owns a disjoint time slice) + sortWithinPartitions (rows sorted
    // inside each file → tight parquet row-group min/max). A reader with a
    // time predicate then skips whole files/row-groups instead of scanning
    // the table. The read-back below carries the filter into the pruned
    // scan; results are judged against the unsorted original.
    Q("layout_range_sorted",
      Some("SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue " +
        "FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1995-03-01' AND l_shipdate < TIMESTAMP '1995-06-01' " +
        "GROUP BY 1 ORDER BY 1"),
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_layout")
          .toString + "/lineitem_sorted"
        tbl(s, dir, "lineitem")
          .repartitionByRange(8, col("l_shipdate"))
          .sortWithinPartitions("l_shipdate")
          .write.mode("overwrite").parquet(tmp)
        s.read.parquet(tmp)
          .filter(col("l_shipdate") >= lit("1995-03-01").cast("timestamp") &&
            col("l_shipdate") < lit("1995-06-01").cast("timestamp"))
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
          .agg(count(lit(1)).as("n"),
            sumMoney(col("l_extendedprice")).as("revenue"))
          .orderBy("ship_month")
      }),

    // ---- Interpolated percentiles (exact, WITHIN GROUP) -----------------
    //
    // percentile_cont semantics: Spark's exact `percentile` aggregate vs
    // DuckDB's percentile_cont. Exactness of the compare: l_quantity is
    // integer-valued, and 0.25/0.5/0.75 are exact binary fractions, so the
    // interpolation lo + (hi-lo)*f is a product and sum of exactly
    // representable doubles — bit-identical in both engines.
    Q("agg_percentile_cont",
      Some("SELECT l_returnflag, " +
        "percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25, " +
        "percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS p50, " +
        "percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity) AS p75, " +
        "median(l_quantity) AS med " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(percentile(col("l_quantity"), lit(0.25)).as("p25"),
            percentile(col("l_quantity"), lit(0.5)).as("p50"),
            percentile(col("l_quantity"), lit(0.75)).as("p75"),
            median(col("l_quantity")).as("med"))
          .orderBy("l_returnflag")),

    // ---- mode() WITHIN GROUP + FILTER-clause aggregates -----------------
    //
    // mode's tie behavior is engine-defined, so the mode target is a
    // structurally-skewed size class (small=50%, medium=30%, big=20% of the
    // uniform 1..50 quantity) — the argmax is unique at any scale factor.
    // FILTER (WHERE ...) plans as a conditional partial aggregate: one scan,
    // no per-predicate self-joins. Quantity sums are integer-valued doubles
    // (exact, order-independent).
    Q("agg_mode_filter",
      Some("SELECT l_returnflag, " +
        "mode(CASE WHEN l_quantity <= 25 THEN 'small' " +
        "WHEN l_quantity <= 40 THEN 'medium' ELSE 'big' END) AS size_mode, " +
        "CAST(count(*) FILTER (WHERE l_quantity > 40) AS BIGINT) AS n_big, " +
        "CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS n_f, " +
        "sum(l_quantity) FILTER (WHERE l_discount < 0.05) AS qty_lowdisc " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),
      (s, dir) => {
        tbl(s, dir, "lineitem").createOrReplaceTempView("graft_modef_l")
        s.sql("""SELECT l_returnflag,
          mode() WITHIN GROUP (ORDER BY CASE WHEN l_quantity <= 25 THEN 'small'
            WHEN l_quantity <= 40 THEN 'medium' ELSE 'big' END) AS size_mode,
          count(*) FILTER (WHERE l_quantity > 40) AS n_big,
          count(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
          sum(l_quantity) FILTER (WHERE l_discount < 0.05) AS qty_lowdisc
          FROM graft_modef_l GROUP BY 1 ORDER BY 1""")
      }),

    // ---- Executed observe() telemetry -----------------------------------
    //
    // Pipeline telemetry without a second scan: CollectMetrics piggybacks
    // accumulator-style aggregates on a query's one pass (the reference
    // re-queries its sink for run-report counts — O23; observe() is the
    // engine-native shape of that report). The observed row itself is the
    // judged result.
    Q("obs_metrics",
      Some("SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total, " +
        "min(o_orderkey) AS min_key, max(o_orderkey) AS max_key FROM orders"),
      (s, dir) => {
        import s.implicits._
        val obs = new org.apache.spark.sql.Observation()
        val observed = tbl(s, dir, "orders").observe(obs,
          count(lit(1)).as("n_rows"),
          sumMoney(col("o_totalprice")).as("total"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        observed.write.format("noop").mode("overwrite").save()
        val m = obs.get
        Seq((m("n_rows").asInstanceOf[Long], m("total").asInstanceOf[Double],
          m("min_key").asInstanceOf[Long], m("max_key").asInstanceOf[Long]))
          .toDF("n_rows", "total", "min_key", "max_key")
      }),

    // ---- ntile equal-frequency binning ----------------------------------
    //
    // Deciles of order value inside each priority class. ntile's row→bin
    // assignment depends on the total order, so the sort key is made
    // deterministic ((o_totalprice, o_orderkey)) — ties can't straddle a
    // bin boundary differently between engines.
    Q("win_ntile_binning",
      Some("WITH b AS (SELECT o_orderpriority, o_totalprice, " +
        "ntile(10) OVER (PARTITION BY o_orderpriority " +
        "ORDER BY o_totalprice, o_orderkey) AS bin FROM orders) " +
        "SELECT o_orderpriority, bin, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS lo, " +
        "CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS hi " +
        "FROM b GROUP BY 1, 2 ORDER BY 1, 2"),
      (s, dir) =>
        tbl(s, dir, "orders")
          .withColumn("bin", ntile(10).over(Window
            .partitionBy("o_orderpriority")
            .orderBy(col("o_totalprice"), col("o_orderkey"))))
          .groupBy("o_orderpriority", "bin")
          .agg(count(lit(1)).as("n"),
            min(dec2(col("o_totalprice"))).cast("double").as("lo"),
            max(dec2(col("o_totalprice"))).cast("double").as("hi"))
          .orderBy("o_orderpriority", "bin")),

    // ---- Unicode canonicalization (native expression) -------------------
    //
    // canon_text = NFC-compose + strip diacritics: the normalization pass a
    // multilingual corpus needs before hashing/dedup (bytes differ between
    // composed and decomposed forms of the same text; shingle/minhash keys
    // would too). Native codegen expression with an ASCII fast path that
    // returns the input UTF8String untouched. Fixture accents are planted
    // per doc_id since the synthetic corpus is ASCII; the oracle is
    // DuckDB's independent strip_accents(nfc_normalize(...)).
    Q("text_normalize_unicode",
      Some("WITH p AS (SELECT doc_id, " +
        "CASE doc_id % 4 WHEN 0 THEN 'résumé of ' " +
        "WHEN 1 THEN 'naïve Ångström ' " +
        "WHEN 2 THEN 'déjà vu ' " +  // decomposed combining marks
        "ELSE '' END || substr(text, 1, 40) AS t FROM documents), " +
        "n AS (SELECT doc_id, strip_accents(nfc_normalize(t)) AS canon, t " +
        "FROM p) " +
        "SELECT doc_id, canon, " +
        "CAST(CASE WHEN canon = t THEN 1 ELSE 0 END AS BIGINT) AS was_clean " +
        "FROM n ORDER BY doc_id"),
      (s, dir) => {
        import graft.functions.CustomExpressions.canon_text
        val planted = tbl(s, dir, "documents")
          .select(col("doc_id"),
            concat(
              when(pmod(col("doc_id"), lit(4)) === 0, lit("résumé of "))
                .when(pmod(col("doc_id"), lit(4)) === 1, lit("naïve Ångström "))
                .when(pmod(col("doc_id"), lit(4)) === 2, lit("déjà vu "))
                .otherwise(lit("")),
              substring(col("text"), 1, 40)).as("t"))
        planted
          .select(col("doc_id"), canon_text(col("t")).as("canon"), col("t"))
          .select(col("doc_id"), col("canon"),
            when(col("canon") === col("t"), 1L).otherwise(0L).as("was_clean"))
          .orderBy("doc_id")
      }),

    // ---- Character-concentration quality signal -------------------------
    //
    // Gibberish/boilerplate detector from the character distribution.
    // Shannon entropy needs log2 on the compare path (engine log ULPs
    // differ), so the emitted signals are the exactly-computable family:
    // collision probability Σc²/N² (Rényi-2 concentration — low for
    // natural text, high for repeated-char junk) and top-character share
    // max(c)/N. Both are single IEEE divisions of exact BIGINT-derived
    // values — bit-identical across engines. Shape: per-(doc,char) counts
    // come from a partial-agg explode (map-side combine), then one doc-level
    // reduce; no all-pairs, no driver collect.
    Q("text_char_dist",
      Some("WITH ch AS (SELECT doc_id, " +
        "unnest(string_split_regex(substr(text, 1, 400), '')) AS c " +
        "FROM documents), " +
        "cnt AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n FROM ch " +
        "WHERE c <> '' GROUP BY doc_id, c), " +
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS distinct_chars, " +
        "sum(n) AS tot, sum(n * n) AS sumsq, max(n) AS maxn " +
        "FROM cnt GROUP BY doc_id) " +
        "SELECT doc_id, distinct_chars, " +
        "CAST(sumsq AS DOUBLE) / CAST(tot * tot AS DOUBLE) AS collision_prob, " +
        "CAST(maxn AS DOUBLE) / CAST(tot AS DOUBLE) AS top_char_share " +
        "FROM agg ORDER BY doc_id"),
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(col("doc_id"),
            explode(split(substring(col("text"), 1, 400), "")).as("c"))
          .filter(col("c") =!= "")
          .groupBy("doc_id", "c").agg(count(lit(1)).as("n"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("distinct_chars"),
            sum(col("n")).as("tot"),
            sum(col("n") * col("n")).as("sumsq"),
            max(col("n")).as("maxn"))
          .select(col("doc_id"), col("distinct_chars"),
            (col("sumsq").cast("double") /
              (col("tot") * col("tot")).cast("double")).as("collision_prob"),
            (col("maxn").cast("double") / col("tot").cast("double"))
              .as("top_char_share"))
          .orderBy("doc_id"))
  )
}
