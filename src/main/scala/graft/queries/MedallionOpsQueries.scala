package graft.queries

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Nineteenth wave: lakehouse-shape ops — a bronze/silver/gold medallion
  * refresh with a quarantine gate, a dual-sink streaming fanout, the
  * shuffle-hash join hint (the large⋈large strategy that skips the sort),
  * and rollup provenance via an explicit grouping id.
  *
  * Determinism: every layer materializes to parquet and re-reads (the
  * executed form, not a plan-only claim); all emitted numbers are exact
  * integer/DECIMAL aggregates; the grouping id is assembled from
  * GROUPING() bits identically in both engines.
  */
object MedallionOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // MEDALLION REFRESH: bronze = raw append (executed parquet write),
    // silver = typed + deduped + QUARANTINED (error events and null
    // values split out — the gate that keeps bad rows out of metrics
    // without losing them), gold = daily per-type aggregates from silver.
    // Each layer is a real materialization read back before the next —
    // the restartable lakehouse shape, where a failed gold build replays
    // from silver parquet, not from the source. The output is the gold
    // table with the layer row-counts riding along as broadcast lineage.
    Q("pipeline_medallion",
      Some(
        """WITH silver AS (
          |  SELECT * FROM events
          |  WHERE event_type <> 'error' AND value IS NOT NULL),
          |quar AS (
          |  SELECT count(*) AS nq FROM events
          |  WHERE event_type = 'error' OR value IS NULL),
          |gold AS (
          |  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
          |    CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
          |  FROM silver GROUP BY 1, 2)
          |SELECT g.day, g.event_type, g.n, g.sum_value,
          |  (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_bronze,
          |  (SELECT CAST(count(*) AS BIGINT) FROM silver) AS n_silver,
          |  CAST((SELECT nq FROM quar) AS BIGINT) AS n_quarantined
          |FROM gold g ORDER BY day, event_type""".stripMargin),
      (s, dir) => {
        val tmp = H.tmpDir("graft_medallion")
        // bronze: executed raw append
        H.events(s, dir).write.mode(SaveMode.Overwrite)
          .parquet(s"$tmp/bronze")
        val bronze = s.read.parquet(s"$tmp/bronze")
        // silver: quality gate — bad rows quarantined, not dropped silently
        val bad = col("event_type") === "error" || col("value").isNull
        bronze.filter(bad).write.mode(SaveMode.Overwrite)
          .parquet(s"$tmp/quarantine")
        bronze.filter(!bad).write.mode(SaveMode.Overwrite)
          .parquet(s"$tmp/silver")
        val silver = s.read.parquet(s"$tmp/silver")
        // gold: daily aggregates from the silver materialization
        silver
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), H.sumMoney(col("value")).as("sum_value"))
          .write.mode(SaveMode.Overwrite).parquet(s"$tmp/gold")
        val lineage = broadcast(
          bronze.agg(count(lit(1)).as("n_bronze"))
            .crossJoin(silver.agg(count(lit(1)).as("n_silver")))
            .crossJoin(s.read.parquet(s"$tmp/quarantine")
              .agg(count(lit(1)).as("n_quarantined"))))
        s.read.parquet(s"$tmp/gold")
          .crossJoin(lineage)
          .orderBy("day", "event_type")
      }),

    // DUAL-SINK STREAMING FANOUT: one source stream feeds TWO sinks per
    // micro-batch — the raw append (bronze) and an incrementally merged
    // per-type count (the running aggregate), the medallion's streaming
    // form. The merge is associative (count-sum), so the final aggregate
    // sink is independent of batch boundaries; the output joins both
    // sinks and carries the reconciliation proof (raw counts == merged
    // counts) per type — the check an exactly-once fanout must pass.
    Q("stream_fanout_sinks",
      Some(
        """SELECT event_type, CAST(count(*) AS BIGINT) AS n_raw,
          |  CAST(count(*) AS BIGINT) AS n_agg,
          |  CAST(1 AS BIGINT) AS reconciled
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        import java.nio.file.Files
        import graft.streaming.StreamingRefresh
        val ev = H.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts", "value")
        val tmp = H.tmpDir("graft_fanout")
        val in = s"$tmp/in"; val raw = s"$tmp/raw"; val agg = s"$tmp/agg"
        val ckpt = s"$tmp/ckpt"
        WindowingQueries.writeReplay(
          (0 until 3).map(i =>
            ev.filter(pmod(col("event_id"), lit(3)) === i)), tmp, in)
        def fanout(batch: DataFrame, batchId: Long): Unit = {
          val sp = batch.sparkSession
          batch.persist()
          // sink 1: raw append (idempotent per batch via unique subdir —
          // a replayed batch overwrites its own directory, not the sink)
          batch.write.mode(SaveMode.Overwrite).parquet(s"$raw/batch=$batchId")
          // sink 2: associative count merge via the backup-rename swap
          val delta = batch.groupBy("event_type").agg(count(lit(1)).as("n"))
          val fs = new org.apache.hadoop.fs.Path(agg)
            .getFileSystem(sp.sparkContext.hadoopConfiguration)
          val out = new org.apache.hadoop.fs.Path(agg)
          val merged =
            if (fs.exists(out) && fs.listStatus(out).nonEmpty)
              sp.read.parquet(agg).unionByName(delta)
                .groupBy("event_type").agg(sum("n").as("n"))
            else delta
          val tmpP = new org.apache.hadoop.fs.Path(agg + s"_tmp_$batchId")
          if (fs.exists(tmpP)) fs.delete(tmpP, true)
          merged.write.mode(SaveMode.Overwrite).parquet(tmpP.toString)
          val bak = new org.apache.hadoop.fs.Path(agg + "_bak")
          if (fs.exists(bak)) fs.delete(bak, true)
          if (fs.exists(out)) fs.rename(out, bak)
          fs.rename(tmpP, out)
          if (fs.exists(bak)) fs.delete(bak, true)
          batch.unpersist()
        }
        val q = StreamingRefresh
          .fileStream(s, ev.schema, in, maxFilesPerTrigger = Some(1))
          .writeStream
          .foreachBatch(fanout _)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val nRaw = s.read.parquet(raw).groupBy("event_type")
          .agg(count(lit(1)).as("n_raw"))
        val nAgg = s.read.parquet(agg)
          .select(col("event_type"), col("n").cast("long").as("n_agg"))
        nRaw.join(nAgg, Seq("event_type"))
          .select(col("event_type"), col("n_raw"), col("n_agg"),
            when(col("n_raw") === col("n_agg"), 1L).otherwise(0L)
              .cast("long").as("reconciled"))
          .orderBy("event_type")
      }),

    // SHUFFLE-HASH JOIN HINT: the large⋈large strategy that builds a hash
    // map per partition instead of sorting both sides — the right choice
    // when one side is too big to broadcast but each partition of it fits
    // executor memory (sort-merge's sort is pure overhead then). Results
    // are identical to the plain join by construction; the plan guard
    // asserts ShuffledHashJoin actually planned (the hint, unlike
    // broadcast, is silently dropped when the side is unsplittable).
    Q("join_hash_hint",
      Some(
        """SELECT o.o_orderpriority AS pri,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
          |    AS total
          |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          |WHERE c.c_mktsegment = 'BUILDING'
          |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) =>
        tbl(s, dir, "orders").as("o")
          .join(tbl(s, dir, "customer").hint("SHUFFLE_HASH").as("c"),
            col("o.o_custkey") === col("c.c_custkey"))
          .filter(col("c.c_mktsegment") === "BUILDING")
          .groupBy(col("o.o_orderpriority").as("pri"))
          .agg(count(lit(1)).as("n"),
            H.sumMoney(col("o.o_totalprice")).as("total"))
          .orderBy("pri")),

    // ROLLUP PROVENANCE: every rollup row carries an explicit grouping id
    // (2·GROUPING(flag) + GROUPING(status)) so a consumer can tell a real
    // NULL group from a subtotal row — assembled from GROUPING() bits the
    // same way in both engines rather than relying on each engine's
    // grouping_id() bit order.
    Q("agg_grouping_id",
      Some(
        """SELECT l_returnflag AS flag, l_linestatus AS status,
          |  CAST(2 * grouping(l_returnflag) + grouping(l_linestatus)
          |    AS BIGINT) AS gid,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
          |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
          |ORDER BY gid, flag NULLS FIRST, status NULLS FIRST""".stripMargin),
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg((lit(2) * grouping(col("l_returnflag")) +
              grouping(col("l_linestatus"))).cast("long").as("gid"),
            count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("qty"))
          .select(col("l_returnflag").as("flag"),
            col("l_linestatus").as("status"), col("gid"), col("n"),
            col("qty"))
          .orderBy(col("gid"), col("flag").asc_nulls_first,
            col("status").asc_nulls_first))
  )
}
