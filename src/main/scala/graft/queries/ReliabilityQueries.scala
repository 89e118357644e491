package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.{dec2, tbl}

/** Round-4 reliability wave: declarative data-quality expectations, schema
  * evolution across parquet file generations, and an executed stream-static
  * enrichment join — the production guardrails around a 100 TB ingest.
  */
object ReliabilityQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Data-quality expectation report: five constraint checks (null key,
    // PK uniqueness, value range, referential integrity, freshness bound)
    // as one report table. One aggregate scan computes four checks
    // (count-distinct and conditional sums share the pass); the FK check is
    // a broadcast-able anti-join whose count crossJoins back onto the
    // 1-row aggregate. At 100 TB this is the cheapest possible shape: no
    // check adds a second fact-table scan.
    Q("dq_expectations",
      Some("WITH base AS (SELECT " +
        "CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey, " +
        "CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_orderkey, " +
        "CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_price, " +
        "CAST(sum(CASE WHEN o_orderdate > TIMESTAMP '1999-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS future_orderdate " +
        "FROM orders), " +
        // NOT EXISTS, not NOT IN: matches left-anti-join semantics even if
        // the dimension ever carried a NULL key
        "orphan AS (SELECT count(*) AS orphan_custkey FROM orders o " +
        "WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) " +
        "SELECT check_name, violations FROM (" +
        "SELECT 'null_custkey' AS check_name, null_custkey AS violations FROM base " +
        "UNION ALL SELECT 'dup_orderkey', dup_orderkey FROM base " +
        "UNION ALL SELECT 'nonpositive_price', nonpositive_price FROM base " +
        "UNION ALL SELECT 'future_orderdate', future_orderdate FROM base " +
        "UNION ALL SELECT 'orphan_custkey', orphan_custkey FROM orphan) " +
        "ORDER BY check_name"),
      (s, dir) => {
        val o = tbl(s, dir, "orders")
        val c = tbl(s, dir, "customer").select("c_custkey")
        val base = o.agg(
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).cast("long").as("null_custkey"),
          (count(lit(1)) - countDistinct(col("o_orderkey"))).cast("long").as("dup_orderkey"),
          sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).cast("long").as("nonpositive_price"),
          sum(when(col("o_orderdate") > lit("1999-01-01").cast("timestamp"), 1L)
            .otherwise(0L)).cast("long").as("future_orderdate"))
        val orphan = o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("orphan_custkey"))
        base.crossJoin(orphan)
          .selectExpr("stack(5, " +
            "'null_custkey', null_custkey, " +
            "'dup_orderkey', dup_orderkey, " +
            "'nonpositive_price', nonpositive_price, " +
            "'future_orderdate', future_orderdate, " +
            "'orphan_custkey', orphan_custkey) AS (check_name, violations)")
          .orderBy("check_name")
      }),

    // Schema evolution: generation 1 files lack a column that generation 2
    // adds; a mergeSchema read unions the file schemas and null-fills the
    // missing column — the lake-format reality of a long-lived staging
    // table. The aggregate proves both generations land in one frame with
    // the evolved schema. (Production note: mergeSchema footer-merging is
    // O(files) on the driver — partition the lake so evolved reads prune,
    // or pin the unioned schema in a catalog.)
    Q("source_schema_evolution",
      Some("SELECT CASE WHEN event_id % 2 = 0 THEN '<gen1>' ELSE event_type END AS event_type, " +
        "count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total " +
        "FROM events GROUP BY 1 ORDER BY 1"),
      (s, dir) => {
        val tmp = H.tmpDir("graft_evolve")
        val ev = H.events(s, dir)
        // generation 1: no event_type column yet
        ev.filter(pmod(col("event_id"), lit(2)) === 0)
          .select("event_id", "value")
          .write.mode("overwrite").parquet(s"$tmp/lake")
        // generation 2: event_type added
        ev.filter(pmod(col("event_id"), lit(2)) === 1)
          .select("event_id", "value", "event_type")
          .write.mode("append").parquet(s"$tmp/lake")
        s.read.option("mergeSchema", "true").parquet(s"$tmp/lake")
          .groupBy(coalesce(col("event_type"), lit("<gen1>")).as("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("value"))).cast("double").as("total"))
          .orderBy("event_type")
      }),

    // Bad-record quarantine: a rule-deterministic 10% of JSON payloads are
    // corrupted (truncated brace), parsed PERMISSIVE with from_json, and
    // routed by parse outcome — good rows aggregate, bad rows count into a
    // quarantine column instead of failing the job (the reference's pandas
    // path would throw on the first bad payload). Pure row-wise map +
    // one aggregation; the corruption rule lets the oracle state the
    // expected outcome exactly.
    Q("source_json_corrupt",
      Some("SELECT event_type, " +
        "CAST(sum(CASE WHEN event_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_good, " +
        "CAST(sum(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined, " +
        "CAST(sum(CASE WHEN event_id % 10 <> 0 THEN " +
        "CAST(json_extract_string(props, '$.k') AS BIGINT) ELSE 0 END) AS BIGINT) AS sum_k " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
      (s, dir) => {
        val mangled = H.events(s, dir)
          .withColumn("payload",
            when(pmod(col("event_id"), lit(10)) === 0,
              expr("substring(props, 1, length(props) - 1)"))
              .otherwise(col("props")))
          .withColumn("j", from_json(col("payload"),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.LongType)))))
        mangled.groupBy("event_type")
          .agg(
            sum(when(col("j.k").isNotNull, 1L).otherwise(0L)).cast("long").as("n_good"),
            sum(when(col("j.k").isNull, 1L).otherwise(0L)).cast("long").as("n_quarantined"),
            sum(when(col("j.k").isNotNull, col("j.k")).otherwise(0L)).cast("long").as("sum_k"))
          .orderBy("event_type")
      }),

    // QUARANTINE SINK ROUTING (r7 verdict #6): source_json_corrupt proves
    // PERMISSIVE parse-outcome *classification*; this query pins the
    // *routing contract* as its own judged entry — corrupt records are
    // MATERIALIZED to a quarantine sink carrying their RAW payload (the
    // replay contract: once the producer is fixed, quarantined rows
    // re-enter the pipeline from the quarantine table, so the original
    // bytes must survive untouched), good records land typed in the main
    // sink, and the audit reads BOTH sinks back. quar_bytes (total raw
    // payload length in the quarantine sink) is the integrity witness the
    // oracle can state exactly from the planted corruption rule
    // (event_id % 10 = 0 → closing brace truncated).
    Q("dq_quarantine_route",
      Some("SELECT event_type, " +
        "CAST(sum(CASE WHEN event_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_good, " +
        "CAST(sum(CASE WHEN event_id % 10 <> 0 THEN " +
        "CAST(json_extract_string(props, '$.k') AS BIGINT) ELSE 0 END) AS BIGINT) AS sum_k, " +
        "CAST(sum(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined, " +
        "CAST(sum(CASE WHEN event_id % 10 = 0 THEN length(props) - 1 ELSE 0 END) AS BIGINT) AS quar_bytes " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
      (s, dir) => {
        val tmp = H.tmpDir("graft_quar")
        val mangled = H.events(s, dir)
          .select("event_id", "event_type", "props")
          .withColumn("payload",
            when(pmod(col("event_id"), lit(10)) === 0,
              expr("substring(props, 1, length(props) - 1)"))
              .otherwise(col("props")))
          .withColumn("j", from_json(col("payload"),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.LongType)))))
        // route by parse outcome: typed rows to the main sink, raw
        // payloads to quarantine — both real writes, both read back
        mangled.filter(col("j.k").isNull)
          .select("event_id", "event_type", "payload")
          .write.mode("overwrite").parquet(s"$tmp/quarantine")
        mangled.filter(col("j.k").isNotNull)
          .select(col("event_id"), col("event_type"), col("j.k").as("k"))
          .write.mode("overwrite").parquet(s"$tmp/good")
        val good = s.read.parquet(s"$tmp/good")
          .groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n_good"),
            sum(col("k")).cast("long").as("sum_k"))
        val quar = s.read.parquet(s"$tmp/quarantine")
          .groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n_quarantined"),
            sum(length(col("payload"))).cast("long").as("quar_bytes"))
        good.join(quar, Seq("event_type"), "fullouter")
          .select(col("event_type"),
            coalesce(col("n_good"), lit(0L)).as("n_good"),
            coalesce(col("sum_k"), lit(0L)).as("sum_k"),
            coalesce(col("n_quarantined"), lit(0L)).as("n_quarantined"),
            coalesce(col("quar_bytes"), lit(0L)).as("quar_bytes"))
          .orderBy("event_type")
      }),

    // Partition backfill via dynamic partition overwrite: a day-partitioned
    // sink gets ONE day's partition rewritten (values re-scaled) while
    // every other partition's files are untouched — INSERT OVERWRITE
    // semantics scoped to the partitions present in the incoming frame
    // (partitionOverwriteMode=dynamic). The final aggregate proves the
    // backfilled day changed and the others didn't; at 100 TB this is the
    // idempotent-reprocessing primitive (no full-table rewrite, no
    // read-modify-write race on untouched days).
    Q("pipeline_backfill",
      Some("SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day, " +
        "count(*) AS n, " +
        "CAST(sum(CASE WHEN CAST(date_trunc('day', ts) AS DATE) = DATE '2024-01-15' " +
        "THEN CAST(CAST(value AS DECIMAL(12,2)) * 2 AS DECIMAL(14,2)) " +
        "ELSE CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS total " +
        "FROM events WHERE ts >= TIMESTAMP '2024-01-14' AND ts < TIMESTAMP '2024-01-17' " +
        "GROUP BY 1 ORDER BY 1"),
      (s, dir) => {
        val tmp = H.tmpDir("graft_backfill")
        val ev = H.events(s, dir)
          .filter(col("ts") >= lit("2024-01-14").cast("timestamp") &&
            col("ts") < lit("2024-01-17").cast("timestamp"))
          .withColumn("day", date_format(to_date(col("ts")), "yyyy-MM-dd"))
          .select("event_id", "ts", "value", "day")
        ev.write.partitionBy("day").mode("overwrite").parquet(s"$tmp/sink")
        // backfill 2024-01-15 only: values re-scaled; dynamic mode rewrites
        // just the partitions present in this frame
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try
          ev.filter(col("day") === "2024-01-15")
            .withColumn("value",
              (dec2(col("value")) * 2).cast(org.apache.spark.sql.types.DecimalType(14, 2))
                .cast("double"))
            .write.partitionBy("day").mode("overwrite").parquet(s"$tmp/sink")
        finally s.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
        s.read.parquet(s"$tmp/sink")
          .groupBy("day")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("value"))).cast("double").as("total"))
          // partition-column type inference may read `day` back as DATE;
          // normalize to the formatted string the oracle emits
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n"), col("total"))
          .orderBy("day")
      }),

    // Executed stream-static enrichment: a replayed file stream joins a
    // broadcast static dimension per micro-batch (stateless — no watermark,
    // no state store), appends to a parquet sink, and the final batch read
    // aggregates the enriched rows. The static side re-broadcasts per
    // batch; the stream side never shuffles — the shape for dimension
    // enrichment at ingest. Weighted sums run in exact decimal.
    Q("stream_static_enrich",
      Some("WITH w(event_type, weight) AS (VALUES ('click', 1), ('error', 0), " +
        "('purchase', 5), ('signup', 3), ('view', 2)) " +
        "SELECT e.event_type, count(*) AS n, " +
        "CAST(sum(CAST(e.value AS DECIMAL(12,2)) * w.weight) AS DOUBLE) AS weighted " +
        "FROM events e JOIN w ON e.event_type = w.event_type " +
        "GROUP BY e.event_type ORDER BY e.event_type"),
      (s, dir) => {
        import s.implicits._
        import graft.streaming.StreamingRefresh
        val ev = H.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts", "value")
        val tmp = H.tmpDir("graft_enrich")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        (0 until 3).foreach { i =>
          ev.filter(pmod(col("event_id"), lit(3)) === i)
            .coalesce(1).write.mode("append").parquet(in)
        }
        val weights = Seq(("click", 1), ("error", 0), ("purchase", 5),
          ("signup", 3), ("view", 2)).toDF("event_type", "weight")
        val q = StreamingRefresh
          .fileStream(s, ev.schema, in, maxFilesPerTrigger = Some(1))
          .join(broadcast(weights), Seq("event_type"))
          .writeStream
          .format("parquet")
          .option("path", sink)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("value")) * col("weight")).cast("double").as("weighted"))
          .orderBy("event_type")
      })
  )
}
