package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, QueryModule}
import graft.H.tbl

/** Round-9 wave 138: 2-D vector bin packing (the cluster-scheduler fit —
  * tasks carry BOTH a cpu-like and a memory-like demand), hierarchical
  * forecast reconciliation (bottom-up vs exactly-allocated top-down over
  * the region→nation tree), and the engine-config introspection report
  * that closes the reference's /envVariables surface
  * (reference/app.py:81-90: dump runtime config with secrets redacted).
  */
object VectorPackReconcileOpsQueries extends QueryModule {

  private val Cap = 250L // per-dimension bin capacity (permille units)

  def all: Seq[Q] = Seq(

    // 2-D VECTOR BIN PACKING: each brand's 48 heaviest parts carry two
    // demands — shipped-quantity share and revenue share, both in
    // permille of the brand total — and first-fit-decreasing (ordered by
    // the larger dimension, the standard vector-FFD heuristic) packs
    // them into (250, 250) bins: the scheduler shape where a task must
    // fit BOTH cpu and memory on one executor. First fit = lowest-index
    // open bin with room in both dims; a new bin opens when none fits
    // (items are ≤1000 permille so a fresh bin of max(Cap, item) always
    // fits — capacity stretches per brand only if one part dominates).
    // Output: bins used vs the per-dimension lower bound, utilization.
    // Scale shape: one fact-sized per-part reduce; ranking window
    // PARTITIONED by brand; top-48 cap bounds the fold state; the
    // greedy is one aggregate() fold per brand — 25 independent folds.
    Q("pack_vector_bins",
      Some(
        s"""WITH RECURSIVE j AS (
           |  SELECT p_brand AS brand, l_partkey AS pk,
           |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
           |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
           |      AS BIGINT) AS rev
           |  FROM lineitem JOIN part ON p_partkey = l_partkey
           |  GROUP BY 1, 2),
           |tot AS (SELECT brand, CAST(sum(q) AS BIGINT) AS tq,
           |    CAST(sum(rev) AS BIGINT) AS trev FROM j GROUP BY 1),
           |it0 AS (
           |  SELECT j.brand, j.pk,
           |    CAST(j.q * 1000 // tot.tq AS BIGINT) AS d1,
           |    CAST(j.rev * 1000 // tot.trev AS BIGINT) AS d2
           |  FROM j JOIN tot ON tot.brand = j.brand),
           |it AS (
           |  SELECT brand, d1, d2, CAST(row_number() OVER
           |    (PARTITION BY brand
           |     ORDER BY greatest(d1, d2) DESC, d1 DESC, pk) AS BIGINT)
           |    AS rn
           |  FROM it0 QUALIFY rn <= 48),
           |nn AS (SELECT brand, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(d1) AS BIGINT) AS s1, CAST(sum(d2) AS BIGINT) AS s2,
           |    CAST(greatest($Cap, max(d1), max(d2)) AS BIGINT) AS cap
           |  FROM it GROUP BY 1),
           |g AS (
           |  SELECT nn.brand, CAST(0 AS BIGINT) AS t,
           |    CAST([] AS STRUCT(r1 BIGINT, r2 BIGINT)[]) AS bins,
           |    nn.n, nn.cap
           |  FROM nn
           |  UNION ALL
           |  SELECT g.brand, g.t + 1,
           |    CASE WHEN list_position([b.r1 >= it.d1 AND b.r2 >= it.d2
           |        FOR b IN g.bins], true) IS NULL
           |      OR list_position([b.r1 >= it.d1 AND b.r2 >= it.d2
           |        FOR b IN g.bins], true) = 0
           |    THEN list_append(g.bins,
           |      {'r1': g.cap - it.d1, 'r2': g.cap - it.d2})
           |    ELSE [CASE WHEN i = list_position([b.r1 >= it.d1
           |          AND b.r2 >= it.d2 FOR b IN g.bins], true)
           |        THEN {'r1': g.bins[i].r1 - it.d1,
           |              'r2': g.bins[i].r2 - it.d2}
           |        ELSE g.bins[i] END
           |      FOR i IN range(1, len(g.bins) + 1)] END,
           |    g.n, g.cap
           |  FROM g JOIN it ON it.brand = g.brand AND it.rn = g.t + 1
           |  WHERE g.t < g.n),
           |fin AS (SELECT g.brand, len(g.bins) AS bins_used FROM g
           |  WHERE g.t = g.n)
           |SELECT nn.brand, nn.n AS n_items,
           |  CAST(fin.bins_used AS BIGINT) AS bins_used,
           |  CAST(greatest((nn.s1 + nn.cap - 1) // nn.cap,
           |    (nn.s2 + nn.cap - 1) // nn.cap) AS BIGINT) AS lower_bound,
           |  CAST(nn.s1 * 1000000 // (fin.bins_used * nn.cap) AS BIGINT)
           |    AS util1_ppm,
           |  CAST(nn.s2 * 1000000 // (fin.bins_used * nn.cap) AS BIGINT)
           |    AS util2_ppm
           |FROM nn JOIN fin ON fin.brand = nn.brand
           |ORDER BY nn.brand
           |""".stripMargin),
      (s, dir) => {
        val j = tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "part"), col("p_partkey") === col("l_partkey"))
          .groupBy(col("p_brand").as("brand"), col("l_partkey").as("pk"))
          .agg(sum(col("l_quantity").cast("long")).cast("long").as("q"),
            sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
              .cast("long").as("rev"))
        val tot = j.groupBy("brand")
          .agg(sum("q").cast("long").as("tq"),
            sum("rev").cast("long").as("trev"))
        val it = j.join(tot, Seq("brand"))
          .select(col("brand"), col("pk"),
            expr("CAST(q * 1000 div tq AS BIGINT)").as("d1"),
            expr("CAST(rev * 1000 div trev AS BIGINT)").as("d2"))
          .withColumn("rn", row_number().over(Window.partitionBy("brand")
            .orderBy(greatest(col("d1"), col("d2")).desc, col("d1").desc,
              col("pk"))).cast("long"))
          .filter(col("rn") <= 48)
        val packed = it.groupBy("brand")
          .agg(
            transform(array_sort(collect_list(struct(col("rn"), col("d1"),
              col("d2")))), x => struct(x.getField("d1").as("d1"),
              x.getField("d2").as("d2"))).as("items"),
            count(lit(1)).cast("long").as("n_items"),
            sum("d1").cast("long").as("s1"),
            sum("d2").cast("long").as("s2"),
            greatest(lit(Cap), max("d1"), max("d2")).cast("long").as("cap"))
          // first-fit-decreasing fold; bins = array of (r1, r2) remainders.
          // array_position is 1-based and returns null/0 when no bin fits;
          // transform's index is 0-based, hence the i+1 comparison.
          .withColumn("bins", expr(
            """aggregate(items,
              |  CAST(array() AS ARRAY<STRUCT<r1: BIGINT, r2: BIGINT>>),
              |  (bins, x) -> CASE
              |    WHEN coalesce(array_position(
              |        transform(bins, b -> b.r1 >= x.d1 AND b.r2 >= x.d2),
              |        true), 0) = 0
              |    THEN array_append(bins,
              |      named_struct('r1', cap - x.d1, 'r2', cap - x.d2))
              |    ELSE transform(bins, (b, i) ->
              |      CASE WHEN CAST(i + 1 AS BIGINT) = array_position(
              |          transform(bins, bb -> bb.r1 >= x.d1
              |            AND bb.r2 >= x.d2), true)
              |        THEN named_struct('r1', b.r1 - x.d1,
              |          'r2', b.r2 - x.d2)
              |        ELSE b END) END)""".stripMargin))
        packed.select(col("brand"), col("n_items"),
            size(col("bins")).cast("long").as("bins_used"),
            greatest(expr("(s1 + cap - 1) div cap"),
              expr("(s2 + cap - 1) div cap")).cast("long").as("lower_bound"),
            expr("CAST(s1 * 1000000 div (size(bins) * cap) AS BIGINT)")
              .as("util1_ppm"),
            expr("CAST(s2 * 1000000 div (size(bins) * cap) AS BIGINT)")
              .as("util2_ppm"))
          .orderBy("brand")
      }),

    // HIERARCHICAL FORECAST RECONCILIATION: naive growth forecasts at two
    // levels of the region→nation tree disagree (the sum of nation
    // forecasts ≠ the region forecast — the coherence problem every
    // hierarchical planning stack hits). Bottom-up = Σ child forecasts;
    // top-down = the region forecast allocated by 1997 revenue shares
    // with LARGEST-REMAINDER rounding so children sum to the parent
    // EXACTLY (the Neyman-allocation idiom). Per nation: its own base
    // forecast, the top-down allocation, and the region coherence gap.
    // Scale shape: one fact-sized (region, nation, year) reduce; all
    // reconciliation math on the 25-row nation domain.
    Q("orders_forecast_reconcile",
      Some(
        """WITH a AS (
          |  SELECT r_name AS region, n_name AS nat,
          |    CAST(sum(CASE WHEN year(o_orderdate) = 1996 THEN
          |      CAST(floor(o_totalprice + 0.5) AS BIGINT) ELSE 0 END)
          |      AS BIGINT) AS c96,
          |    CAST(sum(CASE WHEN year(o_orderdate) = 1997 THEN
          |      CAST(floor(o_totalprice + 0.5) AS BIGINT) ELSE 0 END)
          |      AS BIGINT) AS c97
          |  FROM orders JOIN customer ON c_custkey = o_custkey
          |  JOIN nation ON n_nationkey = c_nationkey
          |  JOIN region ON r_regionkey = n_regionkey
          |  WHERE year(o_orderdate) IN (1996, 1997)
          |  GROUP BY 1, 2),
          |base AS (SELECT region, nat, c96, c97,
          |    c97 * (c97 * 1000 // greatest(c96, 1)) // 1000 AS fc FROM a),
          |reg AS (SELECT region, CAST(sum(c96) AS BIGINT) AS r96,
          |    CAST(sum(c97) AS BIGINT) AS r97,
          |    CAST(sum(fc) AS BIGINT) AS bu
          |  FROM base GROUP BY 1),
          |rfc AS (SELECT region, r96, r97, bu,
          |    r97 * (r97 * 1000 // greatest(r96, 1)) // 1000 AS rf FROM reg),
          |alloc AS (
          |  SELECT b.region, b.nat, b.fc, rfc.rf, rfc.bu,
          |    rfc.rf * b.c97 // greatest(rfc.r97, 1) AS floor_td,
          |    rfc.rf * b.c97 % greatest(rfc.r97, 1) AS rem,
          |    rfc.rf - CAST(sum(rfc.rf * b.c97 // greatest(rfc.r97, 1)) OVER
          |      (PARTITION BY b.region) AS BIGINT) AS short
          |  FROM base b JOIN rfc ON rfc.region = b.region),
          |td AS (
          |  SELECT region, nat, fc, rf, bu,
          |    floor_td + CASE WHEN CAST(row_number() OVER
          |      (PARTITION BY region ORDER BY rem DESC, nat) AS BIGINT)
          |      <= short THEN 1 ELSE 0 END AS td_fc
          |  FROM alloc)
          |SELECT region, nat, CAST(fc AS BIGINT) AS base_fc,
          |  CAST(td_fc AS BIGINT) AS td_fc,
          |  CAST(rf AS BIGINT) AS region_fc,
          |  CAST(rf - bu AS BIGINT) AS coherence_gap
          |FROM td ORDER BY region, nat
          |""".stripMargin),
      (s, dir) => {
        val a = tbl(s, dir, "orders")
          .join(tbl(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
          .join(tbl(s, dir, "nation"),
            col("n_nationkey") === col("c_nationkey"))
          .join(broadcast(tbl(s, dir, "region")),
            col("r_regionkey") === col("n_regionkey"))
          .filter(year(col("o_orderdate")).isin(1996, 1997))
          .groupBy(col("r_name").as("region"), col("n_name").as("nat"))
          .agg(
            sum(when(year(col("o_orderdate")) === 1996,
              floor(col("o_totalprice") + lit(0.5)).cast("long"))
              .otherwise(0L)).cast("long").as("c96"),
            sum(when(year(col("o_orderdate")) === 1997,
              floor(col("o_totalprice") + lit(0.5)).cast("long"))
              .otherwise(0L)).cast("long").as("c97"))
        // denominators guarded with greatest(x, 1) on BOTH sides (r9
        // advisor): a (region, nation) group with 1997 orders but no 1996
        // orders — plausible on sparse SFs — would otherwise abort both
        // engines on divide-by-zero. A zero year-total forces the matching
        // numerator to 0, so the guard never shifts a real forecast.
        val base = a.withColumn("fc",
          expr("c97 * (c97 * 1000 div greatest(c96, 1)) div 1000"))
        val rfc = base.groupBy("region")
          .agg(sum("c96").cast("long").as("r96"),
            sum("c97").cast("long").as("r97"),
            sum("fc").cast("long").as("bu"))
          .withColumn("rf",
            expr("r97 * (r97 * 1000 div greatest(r96, 1)) div 1000"))
        val alloc = base.join(broadcast(rfc), Seq("region"))
          .withColumn("floor_td", expr("rf * c97 div greatest(r97, 1)"))
          .withColumn("rem", expr("rf * c97 % greatest(r97, 1)"))
          .withColumn("short", col("rf") -
            sum("floor_td").over(Window.partitionBy("region")))
        val td = alloc.withColumn("td_fc",
          col("floor_td") + when(row_number().over(
            Window.partitionBy("region").orderBy(col("rem").desc, col("nat")))
            .cast("long") <= col("short"), 1L).otherwise(0L))
        td.select(col("region"), col("nat"), col("fc").as("base_fc"),
            col("td_fc").cast("long").as("td_fc"),
            col("rf").as("region_fc"),
            (col("rf") - col("bu")).as("coherence_gap"))
          .orderBy("region", "nat")
      }),

    // ENGINE CONFIG INTROSPECTION (reference /envVariables, app.py:81-90:
    // dump the app's runtime configuration with secret-looking keys
    // redacted). The engine equivalent reports the session's contract
    // knobs plus app-scoped tags set through the same config channel —
    // any key whose name smells like a credential is masked, never
    // echoed. Driver-side only by nature (config lives on the driver);
    // the oracle pins the expected report literally.
    Q("o26_env_report",
      Some(
        """SELECT * FROM (VALUES
          |  ('graft.app.tenant', 'demo-tenant'),
          |  ('graft.secret.apiKey', '***'),
          |  ('spark.sql.legacy.parquet.nanosAsLong', 'true'),
          |  ('spark.sql.session.timeZone', 'UTC'))
          |AS t(key, value) ORDER BY key
          |""".stripMargin),
      (s, dir) => {
        import s.implicits._
        // app-scoped tags arrive through the same runtime-config channel
        // the contract knobs use (the reference reads os.environ; Spark's
        // equivalent is the session conf)
        s.conf.set("graft.app.tenant", "demo-tenant")
        s.conf.set("graft.secret.apiKey", "s3cr3t-do-not-print")
        val keys = Seq("graft.app.tenant", "graft.secret.apiKey",
          "spark.sql.legacy.parquet.nanosAsLong",
          "spark.sql.session.timeZone")
        val rows = keys.map { k =>
          val v = s.conf.getOption(k).getOrElse("")
          val masked =
            if (k.toLowerCase.matches(".*(secret|password|token|key|credential).*"))
              "***"
            else v
          (k, masked)
        }
        rows.toDF("key", "value").orderBy("key")
      })
  )
}
