package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Per-bucket heavy-hitter state for stream_topk_snapshot: exact user
  * counts within the bucket plus an invocation counter that versions
  * emissions (the keyed upsert sink keeps the highest version — the
  * final state snapshot). */
final case class BucketTopState(ver: Long, counts: Map[Long, Long])
final case class BucketEv(user_id: Long, bucket: Long)
final case class TopEmit(bucket: Long, rank: Long, user_id: Long,
    cnt: Long, ver: Long)

/** Eighty-third wave: a streaming heavy-hitter snapshot (bucketed
  * top-k under flatMapGroupsWithState — the partial-topk-then-merge
  * shape production heavy-hitter pipelines use, exact here so the
  * whole replay collapses to a GROUP BY oracle), a Haar wavelet
  * energy decomposition of the daily event series (multi-resolution
  * variance, exact unnormalized integers — no FFT, no floats), a
  * code-vs-prose detector over the documents table (the char-class
  * signals an LLM corpus filter runs before tokenizer selection), and
  * an id/event-time alignment audit (are ingest ids monotone in event
  * time at hour granularity).
  */
object HeavyHitterStreamQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Streaming top-3 users per hash bucket across a 3-batch replay.
    // State per bucket = exact user counts + an invocation version;
    // each trigger emits the bucket's current top-3 (count desc, user
    // asc) and the upsert sink keeps the latest version per
    // (bucket, rank) — so the final sink IS the end-of-stream state
    // snapshot, independent of how the replay batched, and the oracle
    // is a plain windowed GROUP BY. At 1e9 keys the in-state map
    // becomes a CMS+heap (approximate); the BUCKETED partial-topk →
    // merge topology shown here is unchanged — state is bounded per
    // task, the merge is k·buckets rows.
    Q("stream_topk_snapshot",
      Some(
        """WITH c AS (SELECT user_id % 8 AS bucket, user_id,
          |  CAST(count(*) AS BIGINT) AS cnt FROM events
          |  WHERE event_id % 5 = 2 GROUP BY 1, 2),
          |r AS (SELECT bucket, user_id, cnt, row_number() OVER
          |  (PARTITION BY bucket ORDER BY cnt DESC, user_id) AS rank
          |  FROM c)
          |SELECT CAST(bucket AS BIGINT) AS bucket,
          |  CAST(rank AS BIGINT) AS rank,
          |  CAST(user_id AS BIGINT) AS user_id, cnt
          |FROM r WHERE rank <= 3 ORDER BY bucket, rank
          |""".stripMargin),
      (s, dir) => {
        import java.nio.file.Files
        import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
        import graft.streaming.StreamingRefresh
        val ev = H.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts")
          .filter(pmod(col("event_id"), lit(5)) === 2)
        val tmp = H.tmpDir("graft_topk")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        WindowingQueries.writeReplay(
          (0 until 3).map(i => ev.filter(pmod(col("event_id"), lit(3)) === i)),
          tmp, in)
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        import ss.implicits._
        val src = StreamingRefresh
          .fileStream(ss, ev.schema, in, maxFilesPerTrigger = Some(1))
          .select(col("user_id"), pmod(col("user_id"), lit(8L)).as("bucket"))
          .as[BucketEv]
        val tops = src.groupByKey(_.bucket)
          .flatMapGroupsWithState(
            OutputMode.Update, GroupStateTimeout.NoTimeout) {
            (bucket: Long, rows: Iterator[BucketEv],
                state: GroupState[BucketTopState]) =>
              val prev = state.getOption.getOrElse(BucketTopState(0L, Map.empty))
              val upd = rows.foldLeft(prev.counts)((m, e) =>
                m.updated(e.user_id, m.getOrElse(e.user_id, 0L) + 1L))
              val next = BucketTopState(prev.ver + 1L, upd)
              state.update(next)
              upd.toSeq.sortBy { case (u, c) => (-c, u) }.take(3)
                .zipWithIndex.iterator.map { case ((u, c), i) =>
                  TopEmit(bucket, i + 1L, u, c, next.ver)
                }
          }
        val q = tops.toDF().writeStream
          .outputMode("update")
          .foreachBatch(
            StreamingRefresh.upsertBatch(Seq("bucket", "rank"), "ver", sink) _)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .select(col("bucket").cast("long").as("bucket"),
            col("rank").cast("long").as("rank"),
            col("user_id").cast("long").as("user_id"), col("cnt"))
          .orderBy("bucket", "rank")
      }),

    // Haar wavelet energy: the daily event counts on a dense 32-slot
    // dyadic grid (absent days are zero), five unrolled levels of the
    // unnormalized Haar transform (a = even+odd, d = even−odd — exact
    // integers), energy per level = Σd². Level 5's single scaling
    // coefficient (the grand total) is emitted as level 0. The
    // multi-resolution variance profile — which timescale carries the
    // series' power — with no floats anywhere. Every level is a keyed
    // aggregation on a ≤32-row frame.
    Q("ts_haar_energy",
      Some(
        """WITH d AS (SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP))
          |    // 86400000000 AS BIGINT) AS dy,
          |  CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
          |l0 AS (SELECT g.i AS idx, coalesce(d.c, 0) AS a
          |  FROM (SELECT CAST(range AS BIGINT) AS i,
          |    (SELECT min(dy) FROM d) + CAST(range AS BIGINT) AS tgt
          |    FROM range(0, 32)) g
          |  LEFT JOIN d ON d.dy = g.tgt),
          |l1 AS (SELECT idx // 2 AS idx, sum(a) AS a,
          |  sum(CASE WHEN idx % 2 = 0 THEN a ELSE -a END) AS d
          |  FROM l0 GROUP BY 1),
          |l2 AS (SELECT idx // 2 AS idx, sum(a) AS a,
          |  sum(CASE WHEN idx % 2 = 0 THEN a ELSE -a END) AS d
          |  FROM l1 GROUP BY 1),
          |l3 AS (SELECT idx // 2 AS idx, sum(a) AS a,
          |  sum(CASE WHEN idx % 2 = 0 THEN a ELSE -a END) AS d
          |  FROM l2 GROUP BY 1),
          |l4 AS (SELECT idx // 2 AS idx, sum(a) AS a,
          |  sum(CASE WHEN idx % 2 = 0 THEN a ELSE -a END) AS d
          |  FROM l3 GROUP BY 1),
          |l5 AS (SELECT idx // 2 AS idx, sum(a) AS a,
          |  sum(CASE WHEN idx % 2 = 0 THEN a ELSE -a END) AS d
          |  FROM l4 GROUP BY 1)
          |SELECT CAST(level AS BIGINT) AS level,
          |  CAST(energy AS BIGINT) AS energy FROM (
          |  SELECT 1 AS level, sum(d * d) AS energy FROM l1
          |  UNION ALL SELECT 2, sum(d * d) FROM l2
          |  UNION ALL SELECT 3, sum(d * d) FROM l3
          |  UNION ALL SELECT 4, sum(d * d) FROM l4
          |  UNION ALL SELECT 5, sum(d * d) FROM l5
          |  UNION ALL SELECT 0, sum(a * a) FROM l5)
          |ORDER BY level
          |""".stripMargin),
      (s, dir) => {
        val d = H.events(s, dir)
          .select(expr("unix_micros(ts) div 86400000000").cast("long")
            .as("dy"))
          .groupBy("dy").agg(count(lit(1)).cast("long").as("c"))
        val d0 = d.agg(min("dy").as("d0"))
        val l0 = s.range(0, 32).select(col("id").as("idx"))
          .crossJoin(broadcast(d0))
          .join(d, col("dy") === col("d0") + col("idx"), "left")
          .select(col("idx"), coalesce(col("c"), lit(0L)).as("a"))
          .localCheckpoint() // dense 32-slot dyadic grid
        def lvl(g: org.apache.spark.sql.DataFrame) = g
          .groupBy(expr("idx div 2").as("idx"))
          .agg(sum("a").as("a"),
            sum(when(col("idx") % 2 === 0, col("a")).otherwise(-col("a")))
              .as("d"))
        val ls = Iterator.iterate(l0)(lvl).take(6).toSeq // l0..l5
        val energies = (1 to 5).map(i =>
          ls(i).agg(sum(expr("d * d")).as("energy"))
            .select(lit(i.toLong).as("level"), col("energy"))) :+
          ls(5).agg(sum(expr("a * a")).as("energy"))
            .select(lit(0L).as("level"), col("energy"))
        val out = energies.reduce(_ unionAll _)
          .select(col("level").cast("long").as("level"),
            col("energy").cast("long").as("energy"))
          .orderBy("level")
        H.materialized(out, Nil, Seq(l0))
      }),

    // Code-vs-prose detector: char-class densities over the first 400
    // chars — code symbols {}();=<>[] and digits, both as exact micro
    // ratios via the length-difference idiom (literal character
    // classes behave identically in Java regex and RE2). The corpus
    // filter an LLM pipeline runs to route documents to a code
    // tokenizer. One scan, per-row codegen'd expressions.
    Q("text_code_detect",
      Some(
        """WITH t AS (SELECT doc_id, lang, substr(text, 1, 400) AS s
          |  FROM documents),
          |m AS (SELECT doc_id, lang,
          |  CAST(length(s) AS BIGINT) AS n,
          |  CAST(length(s) - length(regexp_replace(s, '[{}();=<>\[\]]', '',
          |    'g')) AS BIGINT) AS sym,
          |  CAST(length(s) - length(regexp_replace(s, '[0-9]', '', 'g'))
          |    AS BIGINT) AS dig
          |  FROM t)
          |SELECT doc_id, lang,
          |  CAST(sym * 1000000 // GREATEST(n, 1) AS BIGINT) AS sym_micro,
          |  CAST(dig * 1000000 // GREATEST(n, 1) AS BIGINT) AS dig_micro,
          |  CAST(CASE WHEN sym * 1000000 // GREATEST(n, 1) > 20000
          |    THEN 1 ELSE 0 END AS BIGINT) AS is_code
          |FROM m ORDER BY doc_id
          |""".stripMargin),
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            substring(col("text"), 1, 400).as("s"))
          .select(col("doc_id"), col("lang"),
            length(col("s")).cast("long").as("n"),
            (length(col("s")) - length(regexp_replace(col("s"),
              "[{}();=<>\\[\\]]", ""))).cast("long").as("sym"),
            (length(col("s")) - length(regexp_replace(col("s"),
              "[0-9]", ""))).cast("long").as("dig"))
          .select(col("doc_id"), col("lang"),
            expr("sym * 1000000 div GREATEST(n, 1)").cast("long")
              .as("sym_micro"),
            expr("dig * 1000000 div GREATEST(n, 1)").cast("long")
              .as("dig_micro"),
            when(expr("sym * 1000000 div GREATEST(n, 1)") > 20000, 1L)
              .otherwise(0L).cast("long").as("is_code"))
          .orderBy("doc_id")),

    // Id / event-time alignment audit: does ingest id order agree with
    // event time at hour granularity? Per hour: min/max event_id; a
    // boundary violation = this hour's min id below the running max id
    // of all earlier hours (cumulative window on the bounded ~720-row
    // hour frame). The standard "can I trust id-range incremental
    // loads" ingestion check. Fact table reduces to hours first.
    Q("dq_id_ts_alignment",
      Some(
        """WITH h AS (SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP))
          |    // 3600000000 AS BIGINT) AS hr,
          |  CAST(min(event_id) AS BIGINT) AS min_id,
          |  CAST(max(event_id) AS BIGINT) AS max_id,
          |  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
          |x AS (SELECT hr, min_id, max_id, n,
          |  max(max_id) OVER (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING
          |    AND 1 PRECEDING) AS prev_max FROM h),
          |v AS (SELECT hr, min_id, max_id, n,
          |  CASE WHEN prev_max IS NOT NULL AND min_id < prev_max
          |    THEN 1 ELSE 0 END AS viol FROM x),
          |t AS (SELECT CAST(sum(viol) AS BIGINT) AS total_violations,
          |  CAST(count(*) AS BIGINT) AS n_hours FROM v)
          |SELECT v.hr, v.min_id, v.max_id, v.n,
          |  CAST(v.viol AS BIGINT) AS violation,
          |  t.total_violations, t.n_hours
          |FROM v, t WHERE v.viol = 1 OR v.hr % 100 = 0
          |ORDER BY v.hr
          |""".stripMargin),
      (s, dir) => {
        val h = H.events(s, dir)
          .groupBy(expr("unix_micros(ts) div 3600000000").cast("long")
            .as("hr"))
          .agg(min("event_id").cast("long").as("min_id"),
            max("event_id").cast("long").as("max_id"),
            count(lit(1)).cast("long").as("n"))
          .localCheckpoint() // bounded hour frame
        val w = Window.orderBy("hr")
          .rowsBetween(Window.unboundedPreceding, -1)
        val v = h.withColumn("prev_max", max("max_id").over(w))
          .select(col("hr"), col("min_id"), col("max_id"), col("n"),
            when(col("prev_max").isNotNull &&
              col("min_id") < col("prev_max"), 1L).otherwise(0L)
              .as("viol"))
        val t = v.agg(sum("viol").cast("long").as("total_violations"),
          count(lit(1)).cast("long").as("n_hours"))
        val out = v.crossJoin(broadcast(t))
          .filter(col("viol") === 1 || col("hr") % 100 === 0)
          .select(col("hr"), col("min_id"), col("max_id"), col("n"),
            col("viol").cast("long").as("violation"),
            col("total_violations"), col("n_hours"))
          .orderBy("hr")
        H.materialized(out, Nil, Seq(h))
      }))
}
