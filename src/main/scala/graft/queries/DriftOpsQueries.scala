package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Twenty-first wave: drift/temporal ops — total-variation corpus drift,
  * an hour×weekday activity heatmap, scene-cut detection over true decoded
  * video frames, and the nearest (bidirectional) as-of join.
  *
  * Determinism: TVD's numerator is an exact BIGINT cross-product sum;
  * heatmap cells are exact counts; scene cuts compare integer cross
  * products (no float threshold); the nearest-match tie-break is
  * backward-first then event_id.
  */
object DriftOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // CORPUS DRIFT (TVD): total-variation distance between the token
    // distributions of the corpus's first and second half, per language —
    // the drift monitor that catches a source change before it shifts a
    // model. TVD = Σ|c1·N2 − c2·N1| / (2·N1·N2) keeps every term an exact
    // BIGINT until one final division (χ² and KL need ratios/logs that
    // break engine-exactness; TVD is the drift metric that doesn't). One
    // token-count reduce per half via a single grouped pass; the halves
    // join on the (lang, token) domain.
    Q("corpus_drift_tvd",
      Some(
        """WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
          |tok AS (
          |  SELECT lang, CASE WHEN doc_id * 2 < m THEN 0 ELSE 1 END AS half,
          |         unnest(string_split(text, ' ')) AS t
          |  FROM documents, mx),
          |c AS (SELECT lang, t,
          |        CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
          |          AS c1,
          |        CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
          |          AS c2
          |      FROM tok GROUP BY 1, 2),
          |n AS (SELECT lang, CAST(sum(c1) AS BIGINT) AS n1,
          |             CAST(sum(c2) AS BIGINT) AS n2 FROM c GROUP BY 1)
          |SELECT c.lang, CAST(count(*) AS BIGINT) AS n_tokens,
          |  max(n.n1) AS n1, max(n.n2) AS n2,
          |  CAST(sum(abs(c.c1 * n.n2 - c.c2 * n.n1)) AS DOUBLE) /
          |    CAST(2 * max(n.n1) * max(n.n2) AS DOUBLE) AS tvd
          |FROM c JOIN n ON c.lang = n.lang
          |GROUP BY c.lang ORDER BY c.lang""".stripMargin),
      (s, dir) => {
        val mx = tbl(s, dir, "documents").agg((max("doc_id") + 1).as("m"))
        val tok = tbl(s, dir, "documents").crossJoin(broadcast(mx))
          .select(col("lang"),
            when(col("doc_id") * 2 < col("m"), 0).otherwise(1).as("half"),
            explode(split(col("text"), " ")).as("t"))
        val c = tok.groupBy("lang", "t")
          .agg(sum(when(col("half") === 0, 1).otherwise(0)).cast("long")
              .as("c1"),
            sum(when(col("half") === 1, 1).otherwise(0)).cast("long")
              .as("c2"))
        val n = c.groupBy("lang")
          .agg(sum("c1").cast("long").as("n1"),
            sum("c2").cast("long").as("n2"))
        c.join(n, Seq("lang"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_tokens"),
            max("n1").as("n1"), max("n2").as("n2"),
            (sum(abs(col("c1") * col("n2") - col("c2") * col("n1")))
              .cast("double") /
              (lit(2) * max("n1") * max("n2")).cast("double")).as("tvd"))
          .orderBy("lang")
      }),

    // ACTIVITY HEATMAP: hour-of-day × weekday event counts as a WIDE
    // pivot (the BI artifact every ops dashboard renders). Spark's pivot
    // API generates the 24 hour columns from one grouped pass; weekday is
    // normalized to %w (0 = Sunday) so both engines bucket identically.
    Q("ts_heatmap",
      Some {
        val cols = (0 to 23).map(h =>
          f"CAST(sum(CASE WHEN CAST(strftime(ts, '%%H') AS INTEGER) = $h " +
            f"THEN 1 ELSE 0 END) AS BIGINT) AS h$h%02d").mkString(", ")
        "SELECT CAST(strftime(ts, '%w') AS BIGINT) AS dow, " + cols +
          " FROM events GROUP BY 1 ORDER BY dow"
      },
      (s, dir) =>
        H.events(s, dir)
          .select((dayofweek(col("ts")) - 1).cast("long").as("dow"),
            hour(col("ts")).as("hr"))
          .groupBy("dow")
          .pivot("hr", (0 to 23).map(Integer.valueOf).toSeq)
          .agg(count(lit(1)))
          .na.fill(0L)
          .select(col("dow") +:
            (0 to 23).map(h => col(h.toString).cast("long")
              .as(f"h$h%02d")): _*)
          .orderBy("dow")),

    // SCENE-CUT DETECTION over TRUE decoded video: consecutive-frame mean
    // absolute pixel delta from the real AVI container walk + per-frame
    // JPEG decode (every frame this time — deltas need each pair), with
    // the cut decision an exact integer compare (sum|Δ| ≥ 48·n_px). The
    // oracle recomputes every frame pair closed-form, so a codec bug in
    // ANY frame — not just the sampled ones — breaks the hash.
    Q("multimodal_scenecut",
      Some(
        """WITH dims AS (
          |  SELECT doc_id, 5 + doc_id % 28 AS w,
          |         5 + (doc_id * 5 + octet_length(encode(text))) % 28 AS h,
          |         2 + doc_id % 4 AS nf
          |  FROM documents),
          |fp AS (SELECT doc_id, w, h, unnest(range(1, nf)) AS f FROM dims),
          |d AS (
          |  SELECT doc_id, f, CAST(w * h AS BIGINT) AS n_px,
          |    CAST(list_sum(list_transform(range(0, w * h), i ->
          |      abs((doc_id * 11 + f * 59 + ((i % w) // 8) * 37 +
          |             ((i // w) // 8) * 101) % 256 -
          |          (doc_id * 11 + (f - 1) * 59 + ((i % w) // 8) * 37 +
          |             ((i // w) // 8) * 101) % 256))) AS BIGINT)
          |      AS sum_abs_delta
          |  FROM fp)
          |SELECT doc_id, CAST(f AS BIGINT) AS frame, n_px, sum_abs_delta,
          |  CAST(CASE WHEN sum_abs_delta >= 48 * n_px THEN 1 ELSE 0 END
          |    AS BIGINT) AS is_cut
          |FROM d ORDER BY doc_id, frame""".stripMargin),
      (s, dir) =>
        graft.functions.Multimodal
          .transformSceneCuts(s, tbl(s, dir, "documents"))
          .toDF()
          .select(col("doc_id"), col("frame"), col("n_px"),
            col("sum_abs_delta"), col("is_cut"))
          .orderBy("doc_id", "frame")),

    // NEAREST AS-OF JOIN: each purchase matches the nearest click of the
    // same user within ±1 h, in EITHER direction (ties: backward wins,
    // then event_id) — the bidirectional variant completing the as-of
    // family (backward / forward / tolerance already judged). Both
    // directions come from ignore-nulls windows over the SAME per-user
    // ordered pass — no self-join, one hash-partition exchange; at 100 TB
    // this is the same single shuffle the sessionizer pays.
    Q("join_asof_nearest",
      Some(
        """WITH ev AS (
          |  SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us
          |  FROM events WHERE event_type IN ('purchase', 'click')),
          |w AS (
          |  SELECT *,
          |    last_value(CASE WHEN event_type = 'click' THEN us END
          |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bk_us,
          |    last_value(CASE WHEN event_type = 'click' THEN event_id END
          |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bk_id,
          |    first_value(CASE WHEN event_type = 'click' THEN us END
          |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS fw_us,
          |    first_value(CASE WHEN event_type = 'click' THEN event_id END
          |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS fw_id
          |  FROM ev),
          |m AS (
          |  SELECT user_id, event_id,
          |    CASE
          |      WHEN bk_us IS NOT NULL AND us - bk_us <= 3600000000
          |        AND (fw_us IS NULL OR fw_us - us > 3600000000
          |             OR us - bk_us <= fw_us - us) THEN bk_id
          |      WHEN fw_us IS NOT NULL AND fw_us - us <= 3600000000
          |        THEN fw_id END AS match_id,
          |    CASE
          |      WHEN bk_us IS NOT NULL AND us - bk_us <= 3600000000
          |        AND (fw_us IS NULL OR fw_us - us > 3600000000
          |             OR us - bk_us <= fw_us - us) THEN us - bk_us
          |      WHEN fw_us IS NOT NULL AND fw_us - us <= 3600000000
          |        THEN fw_us - us END AS delta_us,
          |    CASE
          |      WHEN bk_us IS NOT NULL AND us - bk_us <= 3600000000
          |        AND (fw_us IS NULL OR fw_us - us > 3600000000
          |             OR us - bk_us <= fw_us - us) THEN 'backward'
          |      WHEN fw_us IS NOT NULL AND fw_us - us <= 3600000000
          |        THEN 'forward' END AS direction
          |  FROM w WHERE event_type = 'purchase')
          |SELECT user_id, event_id, match_id, delta_us, direction
          |FROM m ORDER BY user_id, event_id""".stripMargin),
      (s, dir) => {
        val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val back = ord.rowsBetween(Window.unboundedPreceding, -1)
        val fwd = ord.rowsBetween(1, Window.unboundedFollowing)
        val click = col("event_type") === "click"
        val tol = 3600000000L
        val w = H.events(s, dir)
          .filter(col("event_type").isin("purchase", "click"))
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("ts"), unix_micros(col("ts")).as("us"))
          .withColumn("bk_us",
            last(when(click, col("us")), ignoreNulls = true).over(back))
          .withColumn("bk_id",
            last(when(click, col("event_id")), ignoreNulls = true).over(back))
          .withColumn("fw_us",
            first(when(click, col("us")), ignoreNulls = true).over(fwd))
          .withColumn("fw_id",
            first(when(click, col("event_id")), ignoreNulls = true).over(fwd))
        val bkOk = col("bk_us").isNotNull && col("us") - col("bk_us") <= tol
        val fwOk = col("fw_us").isNotNull && col("fw_us") - col("us") <= tol
        val pickBack = bkOk && (!fwOk ||
          col("us") - col("bk_us") <= col("fw_us") - col("us"))
        w.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"),
            when(pickBack, col("bk_id")).when(fwOk, col("fw_id"))
              .as("match_id"),
            when(pickBack, col("us") - col("bk_us"))
              .when(fwOk, col("fw_us") - col("us")).as("delta_us"),
            when(pickBack, "backward").when(fwOk, "forward").as("direction"))
          .orderBy("user_id", "event_id")
      })
  )
}
