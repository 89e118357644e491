package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{CustomExpressions => CE}

/** Seventeenth wave: fidelity ops — Matryoshka truncated-embedding recall,
  * time-series autocorrelation, deterministic pseudonymization, and a CDC
  * changelog stream with tombstone deletes.
  *
  * Determinism: recall is an exact overlap count over two deterministic
  * rankings; autocorrelation is exact integer sums finished by sqrt (IEEE
  * correctly-rounded, unlike ln) and one division; pseudonyms come from the
  * codegen'd rolling-hash Catalyst expression whose DuckDB twin is a
  * list_reduce over the same byte sequence.
  */
object FidelityOpsQueries extends QueryModule {

  private val PrefixDim = 8

  private def pdot(a: String, b: String): Column =
    (1 to PrefixDim).map(i => element_at(col(a), i) * element_at(col(b), i))
      .reduce(_ + _)
  private def pdotSql(a: String, b: String): String =
    (1 to PrefixDim).map(i => s"$a[$i] * $b[$i]").mkString(" + ")

  def all: Seq[Q] = Seq(

    // MATRYOSHKA PREFIX RECALL: how much of the exact top-5 cosine
    // neighborhood survives when vectors are truncated to their first 8
    // of 64 dimensions — the evaluation run before adopting
    // truncated-embedding retrieval (MRL-style) as the cheap first stage.
    // Both rankings are computed in one pass over the same broadcast
    // probe set (rank<=5 bounds each window), and recall@5 is an exact
    // overlap count joined per probe. At 100 TB the corpus side stays a
    // partitioned scan; only probes×5 rows survive each ranking.
    Q("sim_prefix_recall",
      Some("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v " +
        "FROM embeddings), " +
        s"n AS (SELECT vec_id, v, (${graft.functions.VectorSim.norm2Sql("v")}) AS nrm, " +
        s"(${pdotSql("v", "v")}) AS pnrm FROM e), " +
        "p AS (SELECT q.vec_id AS qid, c.vec_id AS vid, " +
        s"(${graft.functions.VectorSim.dotSql("q.v", "c.v")}) / " +
        "(sqrt(q.nrm) * sqrt(c.nrm)) AS fsim, " +
        s"(${pdotSql("q.v", "c.v")}) / (sqrt(q.pnrm) * sqrt(c.pnrm)) AS psim " +
        "FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id), " +
        "fr AS (SELECT qid, vid, row_number() OVER " +
        "(PARTITION BY qid ORDER BY fsim DESC, vid) AS rnk FROM p " +
        "QUALIFY rnk <= 5), " +
        "pr AS (SELECT qid, vid, row_number() OVER " +
        "(PARTITION BY qid ORDER BY psim DESC, vid) AS rnk FROM p " +
        "QUALIFY rnk <= 5) " +
        "SELECT fr.qid, CAST(count(pr.vid) AS BIGINT) AS n_overlap, " +
        "CAST(count(pr.vid) AS DOUBLE) / 5.0 AS recall_at_5 " +
        "FROM fr LEFT JOIN pr ON fr.qid = pr.qid AND fr.vid = pr.vid " +
        "GROUP BY fr.qid ORDER BY fr.qid"),
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val n = e
          .withColumn("nrm", graft.functions.VectorSim.norm2("v"))
          .withColumn("pnrm", pdot("v", "v"))
        val q = n.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("nrm").as("qn"), col("pnrm").as("qpn"))
        val p = n.select(col("vec_id").as("vid"), col("v").as("cv"),
            col("nrm").as("cn"), col("pnrm").as("cpn"))
          .join(broadcast(q), col("vid") =!= col("qid"))
          .select(col("qid"), col("vid"),
            (graft.functions.VectorSim.dot("qv", "cv") /
              (sqrt(col("qn")) * sqrt(col("cn")))).as("fsim"),
            (pdot("qv", "cv") /
              (sqrt(col("qpn")) * sqrt(col("cpn")))).as("psim"))
        def top5(simCol: String): DataFrame = p
          .withColumn("rnk", row_number().over(
            Window.partitionBy("qid").orderBy(col(simCol).desc, col("vid"))))
          .filter(col("rnk") <= 5).select("qid", "vid")
        // rename BOTH join columns on one side: the two rankings descend
        // from the same frame, and df("qid") === df2("qid") on a self-join
        // lineage degenerates to a trivially-true same-attribute compare
        val fr = top5("fsim")
        val pr = top5("psim")
          .withColumnRenamed("qid", "pqid").withColumnRenamed("vid", "pvid")
        // pr is probes×5 rows BY CONSTRUCTION (rank<=5), so the hint is
        // safe at any corpus size — without it the stats-blind planner
        // sort-merges a 50-row join
        fr.join(broadcast(pr),
            col("qid") === col("pqid") && col("vid") === col("pvid"), "left")
          .groupBy("qid")
          .agg(count("pvid").as("n_overlap"),
            (count("pvid").cast("double") / 5.0).as("recall_at_5"))
          .orderBy("qid")
      }),

    // AUTOCORRELATION of the daily event-count series, lags 1-3: the
    // seasonality probe a forecasting pipeline runs before model choice.
    // Pearson r per (type, lag) from six exact BIGINT sums over the
    // lag-joined day domain — the only non-integer steps are two sqrt
    // calls (IEEE correctly-rounded in every engine, unlike ln) and one
    // division. The heavy pass is the one (type, day) count reduce; the
    // lag join is an equi-join on the |types|×|days| domain.
    Q("ts_autocorr",
      Some(
        """WITH d AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day,
          |         CAST(count(*) AS BIGINT) AS c
          |  FROM events GROUP BY 1, 2),
          |lags AS (SELECT unnest([1, 2, 3]) AS lag),
          |p AS (
          |  SELECT a.event_type, l.lag, a.c AS x, b.c AS y
          |  FROM d a JOIN lags l ON true
          |       JOIN d b ON a.event_type = b.event_type
          |              AND b.day = a.day + CAST(l.lag AS INTEGER)),
          |m AS (
          |  SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |    CAST(sum(x * y) AS BIGINT) AS sxy,
          |    CAST(sum(x * x) AS BIGINT) AS sxx,
          |    CAST(sum(y * y) AS BIGINT) AS syy
          |  FROM p GROUP BY 1, 2)
          |SELECT event_type, CAST(lag AS BIGINT) AS lag, n,
          |  CAST(n * sxy - sx * sy AS DOUBLE) /
          |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
          |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS autocorr
          |FROM m ORDER BY event_type, lag""".stripMargin),
      (s, dir) => {
        val d = H.events(s, dir)
          .groupBy(col("event_type"), col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("c"))
        val lags = s.createDataFrame(Seq(Tuple1(1), Tuple1(2), Tuple1(3)))
          .toDF("lag")
        val p = d.as("a").crossJoin(broadcast(lags))
          .join(d.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("b.day") === date_add(col("a.day"), col("lag")))
          .select(col("a.event_type").as("event_type"), col("lag"),
            col("a.c").as("x"), col("b.c").as("y"))
        p.groupBy("event_type", "lag")
          .agg(count(lit(1)).as("n"),
            sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
            sum(col("x") * col("y")).cast("long").as("sxy"),
            sum(col("x") * col("x")).cast("long").as("sxx"),
            sum(col("y") * col("y")).cast("long").as("syy"))
          .select(col("event_type"), col("lag").cast("long").as("lag"),
            col("n"),
            ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) *
               sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                .cast("double")))).as("autocorr"))
          .orderBy("event_type", "lag")
      }),

    // DETERMINISTIC PSEUDONYMIZATION: user_ids become surrogate keys via
    // the codegen'd rolling-hash expression (stable across runs — the
    // property that keeps longitudinal joins working after PII removal),
    // with the injectivity proof (collisions = 0 over this universe)
    // carried in the output rather than assumed. Per-row map work; the
    // report reduce is map-side combined; distinct counts are exact.
    Q("privacy_pseudonymize",
      Some(
        """WITH m AS (
          |  SELECT event_type, user_id,
          |    list_reduce(list_prepend(CAST(7 AS BIGINT),
          |      list_apply(range(1, length('u:' || CAST(user_id AS VARCHAR))
          |        + 1),
          |      i -> CAST(ascii(substr('u:' || CAST(user_id AS VARCHAR),
          |        CAST(i AS INT), 1)) AS BIGINT))),
          |      (a, b) -> (a * 31 + b) % 1000000007) AS surrogate
          |  FROM events),
          |tot AS (
          |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) -
          |         CAST(count(DISTINCT surrogate) AS BIGINT) AS collisions
          |  FROM m)
          |SELECT event_type,
          |  CAST(count(*) AS BIGINT) AS n_events,
          |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
          |  CAST(count(DISTINCT surrogate) AS BIGINT) AS n_surrogates,
          |  CAST(max(collisions) AS BIGINT) AS global_collisions
          |FROM m, tot GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        CE.registerTemp(s)
        val m = H.events(s, dir)
          .select(col("event_type"), col("user_id"),
            expr("rolling_hash(concat('u:', CAST(user_id AS STRING)))")
              .as("surrogate"))
        val tot = m.agg(
          (countDistinct("user_id") - countDistinct("surrogate"))
            .as("collisions"))
        m.crossJoin(broadcast(tot))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            countDistinct("user_id").as("n_users"),
            countDistinct("surrogate").as("n_surrogates"),
            max("collisions").cast("long").as("global_collisions"))
          .orderBy("event_type")
      }),

    // CDC CHANGELOG WITH TOMBSTONES: a keyed change stream where
    // event_type='error' marks a DELETE of the key, replayed through the
    // same crash-safe foreachBatch keep-latest merge as
    // stream_upsert_final. The tombstone is RETAINED in the sink state
    // (dropping it pre-merge would let a late-arriving older version
    // resurrect the key — the classic CDC bug); deletion is applied at
    // read. Because keep-latest-by-version is associative, the final
    // state is independent of batch boundaries — which is what lets the
    // batch SQL oracle verify the executed 3-batch stream.
    Q("stream_cdc_tombstones",
      Some("SELECT user_id, event_id, event_type, " +
        "strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, value FROM events " +
        "QUALIFY row_number() OVER (PARTITION BY user_id " +
        "ORDER BY event_id DESC) = 1 AND event_type <> 'error' " +
        "ORDER BY user_id"),
      (s, dir) => {
        import java.nio.file.Files
        import graft.streaming.StreamingRefresh
        val ev = H.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts", "value")
        val tmp = H.tmpDir("graft_cdc")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        WindowingQueries.writeReplay(
          (0 until 3).map(i =>
            ev.filter(pmod(col("event_id"), lit(3)) === i)), tmp, in)
        val q = StreamingRefresh
          .fileStream(s, ev.schema, in, maxFilesPerTrigger = Some(1))
          .writeStream
          .foreachBatch(
            StreamingRefresh.upsertBatch(Seq("user_id"), "event_id", sink) _)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .filter(col("event_type") =!= "error") // tombstones drop at read
          .select(col("user_id"), col("event_id"), col("event_type"),
            H.fmtTs(col("ts")).as("ts"), col("value"))
          .orderBy("user_id")
      })
  )
}
