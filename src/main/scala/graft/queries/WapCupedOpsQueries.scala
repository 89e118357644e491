package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}

/** Round-8 wave 124: write-audit-publish (batch-level atomic promotion
  * through a versioned pointer — the lakehouse WAP pattern, complementing
  * pipeline_medallion's row-level quarantine) and CUPED pre-period
  * variance reduction (the standard experiment-sensitivity lever).
  */
object WapCupedOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // WRITE-AUDIT-PUBLISH: each candidate batch is STAGED to its own
    // versioned directory, audited as a whole (row count > 0, no null
    // keys, event_id unique), and only a passing batch's version is
    // committed to the CURRENT pointer — readers never observe a
    // half-written or failing batch. Batch v1 (early window) passes and
    // publishes; batch v2 carries planted null user_ids (event_id % 97)
    // and is rejected — the pointer still names v1. The output is the
    // consumer's view THROUGH the pointer plus both audit verdicts.
    // Batch-level gate vs pipeline_medallion's row-level quarantine:
    // WAP is what protects downstream from a structurally-bad refresh
    // (schema drift, half-upload, duplicate replay) where row triage is
    // the wrong granularity. The pointer file is one line — the only
    // driver-side I/O; data moves executor-side.
    Q("pipeline_wap",
      Some(
        """WITH a AS (SELECT * FROM events
          |  WHERE ts < TIMESTAMP '2024-01-08 00:00:00'),
          |b AS (SELECT CASE WHEN event_id % 97 = 0 THEN NULL
          |    ELSE user_id END AS user_id
          |  FROM events WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'),
          |aud_b AS (SELECT CASE WHEN count(*) > 0
          |    AND sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) = 0
          |    THEN 1 ELSE 0 END AS pass FROM b)
          |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT)
          |    AS cents,
          |  CAST(1 AS BIGINT) AS published_version,
          |  CAST(1 AS BIGINT) AS audit_v1_pass,
          |  CAST((SELECT pass FROM aud_b) AS BIGINT) AS audit_v2_pass
          |FROM a GROUP BY event_type ORDER BY event_type
          |""".stripMargin),
      (s, dir) => {
        import java.nio.file.{Files, Paths}
        val tmp = H.tmpDir("graft_wap")
        val cut = lit("2024-01-08 00:00:00").cast("timestamp")
        val ev = H.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts", "value")
        val batches = Seq(
          1 -> ev.filter(col("ts") < cut),
          2 -> ev.filter(col("ts") >= cut)
            // planted violation: the producer shipped null keys
            .withColumn("user_id",
              when(pmod(col("event_id"), lit(97)) === 0, lit(null))
                .otherwise(col("user_id"))))
        var published = 0L
        val verdicts = batches.map { case (v, b) =>
          b.write.mode("overwrite").parquet(s"$tmp/stage/v$v")
          val staged = s.read.parquet(s"$tmp/stage/v$v")
          // the audit runs against the STAGED files (what a publish
          // would expose), one aggregate row to the gate
          val a = staged.agg(
            count(lit(1)).as("n"),
            sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("nulls"),
            countDistinct(col("event_id")).as("ids")).first()
          val pass = a.getLong(0) > 0 && a.getLong(1) == 0 &&
            a.getLong(2) == a.getLong(0)
          if (pass) {
            // the atomic commit: one pointer write names the new version
            Files.writeString(Paths.get(s"$tmp/CURRENT"), s"v$v")
            published = v.toLong
          }
          v -> (if (pass) 1L else 0L)
        }.toMap
        // the data-shape assumption the oracle hardcodes (v1 publishes,
        // v2 is rejected) is asserted HERE: if the pre-cut window were
        // empty or carried duplicate event_ids, the pointer would never
        // be written and the raw file read below would throw a bare
        // NoSuchFileException far from the cause
        require(published == 1L,
          s"pipeline_wap: batch v1 failed its audit (published=$published)" +
            " — expected a non-empty pre-2024-01-08 window with unique" +
            " event_ids; nothing was promoted")
        // the consumer's path: resolve the pointer, read that version only
        val current = Files.readString(Paths.get(s"$tmp/CURRENT")).trim
        val lineage = broadcast(s.range(1).select(
          lit(published).as("published_version"),
          lit(verdicts(1)).as("audit_v1_pass"),
          lit(verdicts(2)).as("audit_v2_pass")))
        s.read.parquet(s"$tmp/stage/$current")
          .groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n"),
            sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
              .cast("long").as("cents"))
          .crossJoin(lineage)
          .orderBy("event_type")
      }),

    // CUPED: reduce the variance of a post-period per-user metric with
    // its pre-period covariate — Y' = Y − θ(X − X̄), θ = cov(X,Y)/var(X)
    // (Deng et al. 2013). Moment sums (n, ΣX, ΣY, ΣXX, ΣXY, ΣYY) are
    // EXACT BIGINTs over per-user dollar totals (one fact-sized groupBy,
    // map-side combined; the moment fold is one tiny reduce), and every
    // reported figure derives from those six integers cast to double —
    // bit-identical across engines because the inputs are exact and
    // IEEE ops are deterministic. Reported: θ (micro), the correlation
    // (micro), and the variance-reduction factor 1−ρ² (micro) — the
    // fraction of experiment traffic CUPED saves.
    Q("stats_cuped",
      Some(
        """WITH u AS (SELECT user_id,
          |  CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
          |    THEN CAST(floor(value*100 + 0.5) AS BIGINT) ELSE 0 END) // 100
          |    AS BIGINT) AS x,
          |  CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
          |    THEN CAST(floor(value*100 + 0.5) AS BIGINT) ELSE 0 END) // 100
          |    AS BIGINT) AS y
          |  FROM events GROUP BY user_id),
          |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |  CAST(sum(x*x) AS BIGINT) AS sxx,
          |  CAST(sum(x*y) AS BIGINT) AS sxy,
          |  CAST(sum(y*y) AS BIGINT) AS syy FROM u)
          |SELECT n,
          |  CAST(floor(CAST(n*sxy - sx*sy AS DOUBLE)
          |    / CAST(n*sxx - sx*sx AS DOUBLE) * 1000000) AS BIGINT)
          |    AS theta_micro,
          |  CAST(floor(CAST(n*sxy - sx*sy AS DOUBLE)
          |    / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
          |         * CAST(n*syy - sy*sy AS DOUBLE)) * 1000000) AS BIGINT)
          |    AS corr_micro,
          |  CAST(floor((1.0 - (CAST(n*sxy - sx*sy AS DOUBLE)
          |      * CAST(n*sxy - sx*sy AS DOUBLE))
          |    / (CAST(n*sxx - sx*sx AS DOUBLE)
          |      * CAST(n*syy - sy*sy AS DOUBLE))) * 1000000) AS BIGINT)
          |    AS var_reduction_micro
          |FROM m
          |""".stripMargin),
      (s, dir) => {
        val cut = lit("2024-01-15 00:00:00").cast("timestamp")
        val cents = floor(col("value") * 100 + lit(0.5)).cast("long")
        val u = H.events(s, dir)
          .groupBy("user_id")
          .agg(
            expr(s"sum(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' " +
              "THEN CAST(floor(value*100 + 0.5) AS BIGINT) ELSE 0 END) div 100")
              .cast("long").as("x"),
            expr(s"sum(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00' " +
              "THEN CAST(floor(value*100 + 0.5) AS BIGINT) ELSE 0 END) div 100")
              .cast("long").as("y"))
        val _ = (cut, cents) // documented construction lives in the expr
        val m = u.agg(
          count(lit(1)).cast("long").as("n"),
          sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
          sum(col("x") * col("x")).cast("long").as("sxx"),
          sum(col("x") * col("y")).cast("long").as("sxy"),
          sum(col("y") * col("y")).cast("long").as("syy"))
        m.select(col("n"),
          floor(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
              * 1000000).cast("long").as("theta_micro"),
          floor(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
                * (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))
              * 1000000).cast("long").as("corr_micro"),
          floor((lit(1.0) -
            ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              * (col("n") * col("sxy") - col("sx") * col("sy")).cast("double"))
              / ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
                * (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
            * 1000000).cast("long").as("var_reduction_micro"))
      }))
}
