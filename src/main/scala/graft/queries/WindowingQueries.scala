package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.{dec2, fmtTs, fmtTsSec}

/** Event-time windowing — the batch-checkable faces of the Structured
  * Streaming operators (`graft.streaming` runs the same expressions under
  * readStream + watermark; specs cover that path with MemoryStream). Spark's
  * `window`/`session_window` are usable in batch aggregation, which is what
  * makes them DuckDB-verifiable here.
  */
/** Encoder case classes for the executed flatMapGroupsWithState query and
  * the typed cogroup query. */
final case class EvSlim(event_id: Long, user_id: Long, value: Double)
final case class UserSides(
    user_id: Long, n_clicks: Long, n_purchases: Long,
    click_cents: Long, purchase_cents: Long)
final case class UserAggState(
    user_id: Long, n: Long, last_event_id: Long, total_cents: Long)
final case class EvTyped(event_id: Long, user_id: Long, event_type: String)
final case class TypeCount(user_id: Long, event_type: String, n: Long)

/** Spark 4 `transformWithState` processor: two independent typed state
  * variables per user — a ValueState running total and a MapState of
  * per-event-type counts (RocksDB-backed; the HDFS provider does not
  * support the new API). Each batch emits the updated cumulative count for
  * every touched type plus an `__all__` row; counts only grow, so the
  * last upsert per (user, type) is the replay-invariant final value. */
final class TypeCountProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, EvTyped, TypeCount] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig,
    TimerValues, ValueState, MapState}
  import org.apache.spark.sql.Encoders
  @transient private var total: ValueState[Long] = _
  @transient private var byType: MapState[String, Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    total = getHandle.getValueState[Long](
      "total", Encoders.scalaLong, TTLConfig.NONE)
    byType = getHandle.getMapState[String, Long](
      "byType", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }
  override def handleInputRows(key: Long, rows: Iterator[EvTyped],
      timerValues: TimerValues): Iterator[TypeCount] = {
    val perType = rows.foldLeft(Map.empty[String, Long]) { (m, e) =>
      m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
    }
    perType.foreach { case (t, c) =>
      val cur = if (byType.containsKey(t)) byType.getValue(t) else 0L
      byType.updateValue(t, cur + c)
    }
    val newTotal =
      (if (total.exists()) total.get() else 0L) + perType.valuesIterator.sum
    total.update(newTotal)
    (perType.keysIterator.map(t => TypeCount(key, t, byType.getValue(t))) ++
      Iterator.single(TypeCount(key, "__all__", newTotal))).toVector.iterator
  }
}

final case class UserSnapshot(user_id: Long, n: Long, total_cents: Long)

/** transformWithState warm-started from a BATCH snapshot
  * (StatefulProcessorWithInitialState): the engine-native form of the
  * reference's initial-load-then-incremental lifecycle — historical totals
  * land in keyed state before the first micro-batch, then stream
  * increments accumulate on top. Emission is cumulative, so the keyed
  * upsert sink is replay-invariant; users without stream-era rows never
  * emit (initial state alone does not produce output). */
final class SnapshotTotalsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
      Long, EvSlim, UserSnapshot, UserSnapshot] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig,
    TimerValues, ValueState}
  import org.apache.spark.sql.Encoders
  @transient private var st: ValueState[UserSnapshot] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[UserSnapshot](
      "totals", Encoders.product[UserSnapshot], TTLConfig.NONE)
  override def handleInitialState(key: Long, snap: UserSnapshot,
      timerValues: TimerValues): Unit =
    st.update(snap)
  override def handleInputRows(key: Long, rows: Iterator[EvSlim],
      timerValues: TimerValues): Iterator[UserSnapshot] = {
    val prev =
      if (st.exists()) st.get() else UserSnapshot(key, 0L, 0L)
    val next = rows.foldLeft(prev) { (acc, e) =>
      UserSnapshot(key, acc.n + 1, acc.total_cents + math.round(e.value * 100))
    }
    st.update(next)
    Iterator.single(next)
  }
}

final case class EvTimer(
    event_id: Long, user_id: Long, ts: java.sql.Timestamp, ts_us: Long)
final case class OpenSession(s_start_us: Long, s_end_us: Long, n_events: Long)
final case class SessionOut(
    user_id: Long, s_start_us: Long, s_end_us: Long, n_events: Long)

/** Event-time-timer sessionization (Spark 4 transformWithState,
  * TimeMode.EventTime): keyed state holds the open session; each batch
  * extends it or — when the gap is exceeded — closes it. A registered
  * event-time timer at (session end + gap) closes sessions whose user never
  * returns, once the watermark passes. Closure happens exactly once per
  * session through whichever path runs first (input arrival or timer
  * expiry), so the keyed upsert sink equals the batch gap-and-island
  * oracle. Timers are re-registered on every extension (the stale one is
  * deleted), and the expiry handler re-arms if the watermark has not truly
  * passed the gap — belt-and-braces against ms-rounding of the timer
  * registration.
  */
final class SessionTimerProcessor(gapUs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, EvTimer, SessionOut] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig,
    TimerValues, ValueState, ExpiredTimerInfo}
  import org.apache.spark.sql.Encoders
  @transient private var open: ValueState[OpenSession] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState[OpenSession](
      "open", Encoders.product[OpenSession], TTLConfig.NONE)

  private def armTimer(c: OpenSession): Unit = {
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
    getHandle.registerTimer((c.s_end_us + gapUs) / 1000 + 2) // ms, round up
  }

  override def handleInputRows(key: Long, rows: Iterator[EvTimer],
      timerValues: TimerValues): Iterator[SessionOut] = {
    val sorted = rows.toVector.sortBy(e => (e.ts_us, e.event_id))
    var out = Vector.empty[SessionOut]
    var cur = if (open.exists()) Option(open.get()) else None
    sorted.foreach { e =>
      cur match {
        case Some(c) if e.ts_us - c.s_end_us <= gapUs =>
          cur = Some(OpenSession(c.s_start_us,
            math.max(c.s_end_us, e.ts_us), c.n_events + 1))
        case Some(c) => // gap exceeded before the timer fired: close inline
          out :+= SessionOut(key, c.s_start_us, c.s_end_us, c.n_events)
          cur = Some(OpenSession(e.ts_us, e.ts_us, 1))
        case None =>
          cur = Some(OpenSession(e.ts_us, e.ts_us, 1))
      }
    }
    cur.foreach { c => open.update(c); armTimer(c) }
    out.iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
    if (!open.exists()) return Iterator.empty
    val c = open.get()
    if (timerValues.getCurrentWatermarkInMs() * 1000L > c.s_end_us + gapUs) {
      open.clear()
      Iterator.single(SessionOut(key, c.s_start_us, c.s_end_us, c.n_events))
    } else { armTimer(c); Iterator.empty } // fired early: re-arm
  }
}

object WindowingQueries extends QueryModule {

  private val F6 = "%Y-%m-%d %H:%M:%S.%f"
  private val F0 = "%Y-%m-%d %H:%M:%S"

  /** Split `df` into `n` deterministic parquet files under `inDir` (one
    * micro-batch per file with maxFilesPerTrigger=1) — the replay harness
    * for executed-streaming queries. Splits by `event_id % n` so every split
    * is content-defined, not order-defined. */
  private def replayFiles(df: org.apache.spark.sql.DataFrame,
      n: Int, tmp: String, inDir: String): Unit =
    writeReplay(
      (0 until n).map(i => df.filter(pmod(col("event_id"), lit(n)) === i)),
      tmp, inDir)

  /** Write each frame as one parquet file batch$i under `inDir` — the
    * general replay harness (batches need not partition one frame; e.g.
    * duplicate injection replays overlapping subsets). */
  private[queries] def writeReplay(batches: Seq[org.apache.spark.sql.DataFrame],
      tmp: String, inDir: String, startAt: Int = 0): Unit = {
    import java.nio.file.{Files, Paths}
    batches.zipWithIndex.map { case (b, i) => (b, i + startAt) }.foreach { case (b, i) =>
      val stage = s"$tmp/stage_${Paths.get(inDir).getFileName}_$i"
      b.coalesce(1).write.parquet(stage)
      val listing = Files.list(Paths.get(stage))
      val part =
        try listing.filter(p => p.toString.endsWith(".parquet")).findFirst().get()
        finally listing.close()
      Files.createDirectories(Paths.get(inDir))
      Files.move(part, Paths.get(s"$inDir/batch$i.parquet"))
    }
  }

  def all: Seq[Q] = Seq(

    Q("stream_tumbling",
      Some("SELECT strftime(time_bucket(INTERVAL '1 hour', ts), " +
        s"'$F0') AS wstart, event_type, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
      (s, dir) =>
        H.events(s, dir)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("value"))).cast("double").as("sum_value"))
          .select(fmtTsSec(col("window.start")).as("wstart"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("wstart", "event_type")),

    // Sliding 1h window every 15min: each event lands in 4 windows.
    Q("stream_sliding",
      Some("SELECT strftime(time_bucket(INTERVAL '15 minutes', ts) " +
        s"- k * INTERVAL '15 minutes', '$F0') AS wstart, " +
        "event_type, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value " +
        "FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) ks " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
      (s, dir) =>
        H.events(s, dir)
          .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("value"))).cast("double").as("sum_value"))
          .select(fmtTsSec(col("window.start")).as("wstart"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("wstart", "event_type")),

    // Session windows, 24h inactivity gap, per user. Session end is
    // last-event + gap (Spark's half-open [start, last+gap) semantics:
    // an event exactly `gap` after the last starts a NEW session → the
    // oracle's gaps-and-islands break uses `>=`).
    Q("stream_session",
      Some("WITH e AS (SELECT user_id, ts, value, " +
        "CASE WHEN lag(ts) OVER w IS NULL " +
        "OR ts - lag(ts) OVER w >= INTERVAL '24 hours' THEN 1 ELSE 0 END AS new_s " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT user_id, ts, value, sum(new_s) OVER " +
        "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM e) " +
        s"SELECT user_id, strftime(min(ts), '$F6') AS s_start, " +
        s"strftime(max(ts) + INTERVAL '24 hours', '$F6') AS s_end, " +
        "count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value " +
        "FROM s GROUP BY user_id, sid ORDER BY user_id, s_start"),
      (s, dir) =>
        H.events(s, dir)
          .groupBy(session_window(col("ts"), "24 hours"), col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("value"))).cast("double").as("sum_value"))
          .select(col("user_id"),
            fmtTs(col("session_window.start")).as("s_start"),
            fmtTs(col("session_window.end")).as("s_end"),
            col("n"), col("sum_value"))
          .orderBy("user_id", "s_start")),

    // REAL streaming execution, oracle-verified: events replayed as three
    // deterministic parquet micro-batches (one file per trigger) through
    // foreachBatch keep-latest upsert (StreamingRefresh.upsertBatch). The
    // final sink state — latest event per user by event_id — is independent
    // of batch order (per-key max is associative), which is what makes a
    // multi-batch streaming run SQL-checkable.
    Q("stream_upsert_final",
      Some("SELECT user_id, event_id, event_type, " +
        s"strftime(ts, '$F6') AS ts, value FROM events " +
        "QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1 " +
        "ORDER BY user_id"),
      (s, dir) => {
        import java.nio.file.Files
        import graft.streaming.StreamingRefresh
        val ev = H.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts", "value")
        val tmp = H.tmpDir("graft_upsert")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        // three micro-batch files (disjoint by event_id, all keys collide)
        replayFiles(ev, 3, tmp, in)
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
          .select(col("user_id"), col("event_id"), col("event_type"),
            fmtTs(col("ts")).as("ts"), col("value"))
          .orderBy("user_id")
      }),

    // REAL watermark-drop semantics, oracle-verified, and empirically
    // pinned against the engine: in a streaming aggregation the LATE-DATA
    // FILTER for micro-batch N uses the watermark of batch N-1 while
    // EVICTION (append-mode emission) uses batch N's watermark — the
    // filter lags eviction by exactly one batch. Replay therefore uses
    // three batches split purely on event time so the global max (hence
    // the watermark, max - 10 days ~= month-end minus 10d) is fixed by
    // batch 0: batch 0 = ts >= Jan 6 (bulk; advances the watermark),
    // batch 1 = Jan 4..6 stragglers (filtered with batch 0's initial
    // watermark 0 -> ACCEPTED despite being far below the current
    // watermark, then emitted complete by that batch's eviction),
    // batch 2 = ts < Jan 4 stragglers (filtered with the advanced
    // watermark -> every row genuinely DROPPED; their windows never
    // appear). The oracle recomputes the observable result: windows
    // closed by the final watermark, counting only rows from batches
    // 0-1 (ts >= Jan 4).
    Q("stream_late_drop",
      Some("WITH sub AS (SELECT * FROM events WHERE event_id % 5 = 3), " +
        "wm AS (SELECT max(ts) - INTERVAL '10 days' AS w FROM sub) " +
        s"SELECT strftime(time_bucket(INTERVAL '1 day', ts), '$F0') AS wstart, " +
        "event_type, count(*) AS n FROM sub, wm " +
        "WHERE ts >= TIMESTAMP '2024-01-04' " +
        "AND time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' <= w " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
      (s, dir) => {
        import java.nio.file.Files
        import graft.streaming.StreamingRefresh
        val ev = H.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts")
          .filter(pmod(col("event_id"), lit(5)) === 3)
        val j4 = lit("2024-01-04").cast("timestamp")
        val j6 = lit("2024-01-06").cast("timestamp")
        val tmp = H.tmpDir("graft_late")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        writeReplay(Seq(
          ev.filter(col("ts") >= j6),
          ev.filter(col("ts") >= j4 && col("ts") < j6),
          ev.filter(col("ts") < j4)), tmp, in)
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        val q = StreamingRefresh
          .fileStream(ss, ev.schema, in, maxFilesPerTrigger = Some(1))
          .withWatermark("ts", "10 days")
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(fmtTsSec(col("window.start")).as("wstart"),
            col("event_type"), col("n"))
          .writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", sink)
          .start()
        q.awaitTermination()
        s.read.parquet(sink).orderBy("wstart", "event_type")
      }),

    // Typed KeyValueGroupedDataset.cogroup — the per-key two-sided typed
    // surface (the Scala analogue of a grouped-map UDF over two frames):
    // clicks and purchases cogrouped per user into exact side totals.
    // Both sides hash-partition on the key once; the per-group closure
    // sees both iterators. Cents stay integer-exact so the oracle is a
    // conditional aggregation.
    Q("typed_cogroup",
      Some("SELECT user_id, " +
        "count(*) FILTER (WHERE event_type = 'click') AS n_clicks, " +
        "count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases, " +
        "CAST(coalesce(sum(CAST(value AS DECIMAL(12,2)) * 100) " +
        "FILTER (WHERE event_type = 'click'), 0) AS BIGINT) AS click_cents, " +
        "CAST(coalesce(sum(CAST(value AS DECIMAL(12,2)) * 100) " +
        "FILTER (WHERE event_type = 'purchase'), 0) AS BIGINT) AS purchase_cents " +
        "FROM events WHERE event_type IN ('click', 'purchase') " +
        "GROUP BY user_id ORDER BY user_id"),
      (s, dir) => {
        import s.implicits._
        val ev = H.events(s, dir)
          .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
        def side(t: String) = ev.filter(col("event_type") === t)
          .select("event_id", "user_id", "value").as[EvSlim]
          .groupByKey(_.user_id)
        side("click").cogroup(side("purchase")) {
          (user: Long, cs: Iterator[EvSlim], ps: Iterator[EvSlim]) =>
            val (cn, cc) = cs.foldLeft((0L, 0L)) { case ((n, c), e) =>
              (n + 1, c + math.round(e.value * 100)) }
            val (pn, pc) = ps.foldLeft((0L, 0L)) { case ((n, c), e) =>
              (n + 1, c + math.round(e.value * 100)) }
            Iterator.single(UserSides(user, cn, pn, cc, pc))
        }.toDF().orderBy("user_id")
      }),

    // REAL arbitrary stateful processing, oracle-verified: a per-user
    // running aggregate (count, last event id, exact cents total) held in
    // flatMapGroupsWithState across three replayed micro-batches, with
    // Update-mode emissions keep-latest-merged into the sink. Every state
    // component is associative+commutative, so the final state is
    // independent of how the replay splits batches — the property that
    // makes arbitrary streaming state SQL-checkable.
    Q("stream_stateful_totals",
      Some("SELECT user_id, count(*) AS n, max(event_id) AS last_event_id, " +
        "CAST(sum(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS total_cents " +
        "FROM events WHERE event_id % 5 = 1 GROUP BY user_id ORDER BY user_id"),
      (s, dir) => {
        import java.nio.file.Files
        import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
        import graft.streaming.StreamingRefresh
        val ev = H.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts", "value")
          .filter(pmod(col("event_id"), lit(5)) === 1)
        val tmp = H.tmpDir("graft_fmgws")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        replayFiles(ev, 3, tmp, in)
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        import ss.implicits._
        val src = StreamingRefresh
          .fileStream(ss, ev.schema, in, maxFilesPerTrigger = Some(1))
          .select(col("event_id"), col("user_id"), col("value"))
          .as[EvSlim]
        val totals = src.groupByKey(_.user_id)
          .flatMapGroupsWithState(
            OutputMode.Update, GroupStateTimeout.NoTimeout) {
            (user: Long, rows: Iterator[EvSlim], state: GroupState[UserAggState]) =>
              val prev = state.getOption.getOrElse(UserAggState(user, 0L, 0L, 0L))
              val batch = rows.toSeq
              val next = UserAggState(user,
                prev.n + batch.size,
                (prev.last_event_id +: batch.map(_.event_id)).max,
                prev.total_cents + batch.map(e => math.round(e.value * 100)).sum)
              state.update(next)
              Iterator.single(next)
          }
        val q = totals.toDF().writeStream
          .outputMode("update")
          .foreachBatch(StreamingRefresh.upsertBatch(Seq("user_id"), "n", sink) _)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .select(col("user_id"), col("n"), col("last_event_id"), col("total_cents"))
          .orderBy("user_id")
      }),

    // Spark 4 transformWithState (the successor of mapGroupsWithState),
    // executed over a 3-batch replay with TWO typed state variables per
    // key — ValueState total + MapState per-type counts — on the RocksDB
    // state store. Emission is cumulative, so the keyed upsert sink's
    // final value per (user, event_type) is replay-invariant and the
    // whole run collapses to a GROUP BY oracle (per-type rows plus the
    // __all__ ValueState face).
    Q("stream_tws_by_type",
      Some("SELECT user_id, event_type, count(*) AS n FROM events " +
        "WHERE event_id % 5 = 4 GROUP BY 1, 2 " +
        "UNION ALL SELECT user_id, '__all__' AS event_type, count(*) AS n " +
        "FROM events WHERE event_id % 5 = 4 GROUP BY 1 " +
        "ORDER BY 1, 2"),
      (s, dir) => {
        import java.nio.file.Files
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
        import graft.streaming.StreamingRefresh
        val ev = H.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts")
          .filter(pmod(col("event_id"), lit(5)) === 4)
        val tmp = H.tmpDir("graft_tws")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        replayFiles(ev, 3, tmp, in)
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        ss.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        import ss.implicits._
        val src = StreamingRefresh
          .fileStream(ss, ev.schema, in, maxFilesPerTrigger = Some(1))
          .select(col("event_id"), col("user_id"), col("event_type"))
          .as[EvTyped]
        val counts = src.groupByKey(_.user_id)
          .transformWithState(new TypeCountProcessor,
            TimeMode.None(), OutputMode.Update())
        val q = counts.toDF().writeStream
          .outputMode("update")
          .foreachBatch(
            StreamingRefresh.upsertBatch(Seq("user_id", "event_type"), "n", sink) _)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .select(col("user_id"), col("event_type"), col("n"))
          .orderBy("user_id", "event_type")
      }),

    // Checkpoint recovery, executed: the stream runs AvailableNow to
    // completion over two files, STOPS, a third file lands, and a brand-new
    // query object resumes from the same checkpoint — the offset log admits
    // only the unseen file and the aggregation state (counts, cents) picks
    // up where run 1 committed, giving exactly-once totals across the
    // restart. The upsert sink is keyed by user, so the final values equal
    // the one-shot GROUP BY oracle.
    Q("stream_resume",
      Some("SELECT user_id, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS total_cents " +
        "FROM events WHERE event_id % 7 = 5 GROUP BY 1 ORDER BY 1"),
      (s, dir) => {
        import java.nio.file.Files
        import graft.streaming.StreamingRefresh
        val ev = H.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts", "value")
          .filter(pmod(col("event_id"), lit(7)) === 5)
        val tmp = H.tmpDir("graft_resume")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        val parts = (0 until 3).map(i => ev.filter(pmod(col("event_id"), lit(3)) === i))
        def runOnce(): Unit = {
          val ss = s.newSession()
          ss.conf.set("spark.sql.shuffle.partitions", "4")
          val q = StreamingRefresh
            .fileStream(ss, ev.schema, in, maxFilesPerTrigger = Some(1))
            .groupBy(col("user_id"))
            .agg(count(lit(1)).as("n"),
              sum((col("value").cast("decimal(12,2)") * 100).cast("long"))
                .as("total_cents"))
            .writeStream
            .outputMode("update")
            .foreachBatch(
              StreamingRefresh.upsertBatch(Seq("user_id"), "n", sink) _)
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        writeReplay(parts.take(2), tmp, in)
        runOnce()                       // run 1: files 0-1, then terminates
        writeReplay(Seq(parts(2)), tmp, in, startAt = 2)
        runOnce()                       // run 2: resumes, admits only file 2
        s.read.parquet(sink)
          .select(col("user_id"), col("n"), col("total_cents"))
          .orderBy("user_id")
      }),

    // The reference's initial-load-then-incremental lifecycle as ONE
    // stateful stream: a batch snapshot of historical totals warm-starts
    // the keyed state (StatefulProcessorWithInitialState.handleInitialState
    // runs before the first micro-batch), then replayed increments
    // accumulate on top. Cumulative emission + keyed upsert = the final
    // sink equals snapshot ∪ increments for every user that streamed —
    // the GROUP-BY-with-live-users oracle.
    Q("stream_tws_initial_state",
      Some("WITH sub AS (SELECT * FROM events WHERE event_id % 9 = 1), " +
        "live AS (SELECT DISTINCT user_id FROM sub " +
        "WHERE ts >= TIMESTAMP '2024-01-15') " +
        "SELECT s.user_id, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS total_cents " +
        "FROM sub s JOIN live l ON l.user_id = s.user_id " +
        "GROUP BY 1 ORDER BY 1"),
      (s, dir) => {
        import java.nio.file.Files
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
        import org.apache.spark.sql.Encoders
        import graft.streaming.StreamingRefresh
        val tmp = H.tmpDir("graft_twsinit")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        ss.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        import ss.implicits._
        // everything (snapshot AND replay) built from the child session so
        // the initial-state dataset and the stream share one planner
        val ev = H.events(ss, dir)
          .select("event_id", "user_id", "ts", "value")
          .filter(pmod(col("event_id"), lit(9)) === 1)
        val j15 = lit("2024-01-15").cast("timestamp")
        writeReplay(Seq(
          ev.filter(col("ts") >= j15 &&
            pmod(col("event_id"), lit(2)) === 0),
          ev.filter(col("ts") >= j15 &&
            pmod(col("event_id"), lit(2)) === 1)), tmp, in)
        val snapshot = ev.filter(col("ts") < j15)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            sum((col("value").cast("decimal(12,2)") * 100).cast("long"))
              .as("total_cents"))
          .as[UserSnapshot]
          .groupByKey(_.user_id)
        val src = StreamingRefresh
          .fileStream(ss, ev.schema, in, maxFilesPerTrigger = Some(1))
          .select(col("event_id"), col("user_id"), col("value"))
          .as[EvSlim]
        val totals = src.groupByKey(_.user_id)
          .transformWithState(new SnapshotTotalsProcessor,
            TimeMode.None(), OutputMode.Update(), snapshot,
            Encoders.product[UserSnapshot], Encoders.product[UserSnapshot])
        val q = totals.toDF().writeStream
          .outputMode("update")
          .foreachBatch(
            StreamingRefresh.upsertBatch(Seq("user_id"), "n", sink) _)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .select(col("user_id"), col("n"), col("total_cents"))
          .orderBy("user_id")
      }),

    // REAL streaming deduplication, oracle-verified: batch 0 carries a
    // 1-in-5 event subset; batches 1-2 replay overlapping slices of the
    // SAME rows — duplicates arriving in later micro-batches, which only
    // cross-batch dropDuplicates state can eliminate. Rows are exact
    // copies, so the final sink equals the distinct subset regardless of
    // arrival order — what makes the run SQL-checkable. (Production bounds
    // the dedup state with dropDuplicatesWithinWatermark; unbounded state
    // here keeps the oracle exact over the whole replay.)
    Q("stream_dedup",
      Some("SELECT event_id, user_id, event_type, " +
        s"strftime(ts, '$F6') AS ts FROM events " +
        "WHERE event_id % 5 = 2 ORDER BY event_id"),
      (s, dir) => {
        import java.nio.file.Files
        import graft.streaming.StreamingRefresh
        val ev = H.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts")
          .filter(pmod(col("event_id"), lit(5)) === 2)
        val tmp = H.tmpDir("graft_sdedup")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        writeReplay(Seq(ev,
          ev.filter(pmod(col("event_id"), lit(3)) === 0),
          ev.filter(pmod(col("event_id"), lit(7)) === 1)), tmp, in)
        // dedup state is per shuffle partition per batch — child session
        // sizes it to the data without touching the shared session conf
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        val q = StreamingRefresh
          .fileStream(ss, ev.schema, in, maxFilesPerTrigger = Some(1))
          .withWatermark("ts", "3650 days")
          .dropDuplicates("event_id")
          .writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", sink)
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .select(col("event_id"), col("user_id"), col("event_type"),
            fmtTs(col("ts")).as("ts"))
          .orderBy("event_id")
      }),

    // The state-BOUNDED production variant: dropDuplicatesWithinWatermark
    // evicts dedup state once the watermark passes a row's event time, so
    // state follows the lateness bound instead of the corpus. Duplicates
    // here are exact row copies replayed across batches within the 40-day
    // bound (> the one-month data span), so every duplicate is caught while
    // the operator still runs with eviction armed — the result equals
    // DISTINCT regardless of arrival order, which is what makes it
    // SQL-checkable.
    Q("stream_dedup_within_wm",
      Some("SELECT event_id, user_id, event_type, " +
        s"strftime(ts, '$F6') AS ts FROM events " +
        "WHERE event_id % 5 = 0 ORDER BY event_id"),
      (s, dir) => {
        import java.nio.file.Files
        import graft.streaming.StreamingRefresh
        val ev = H.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts")
          .filter(pmod(col("event_id"), lit(5)) === 0)
        val tmp = H.tmpDir("graft_ddwm")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        writeReplay(Seq(ev,
          ev.filter(pmod(col("event_id"), lit(2)) === 0),
          ev.filter(pmod(col("event_id"), lit(3)) === 0)), tmp, in)
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        val q = StreamingRefresh
          .fileStream(ss, ev.schema, in, maxFilesPerTrigger = Some(1))
          .withWatermark("ts", "40 days")
          .dropDuplicatesWithinWatermark("event_id")
          .writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", sink)
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .select(col("event_id"), col("user_id"), col("event_type"),
            fmtTs(col("ts")).as("ts"))
          .orderBy("event_id")
      }),

    // REAL stream-stream join, oracle-verified: purchase and click streams
    // replayed as two independent file sources, inner-joined on user within
    // ±1h event time. The watermark delay exceeds the data span, so no
    // state is evicted and the appended result is exactly the batch join —
    // independent of file arrival order, hence SQL-checkable. (Production
    // tightens the delay to bound state; semantics are identical for
    // in-watermark data.)
    Q("stream_join_final",
      Some("SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id, " +
        s"strftime(p.ts, '$F6') AS p_ts, strftime(c.ts, '$F6') AS c_ts " +
        "FROM events p JOIN events c ON p.user_id = c.user_id " +
        "AND p.event_type = 'purchase' AND c.event_type = 'click' " +
        "AND p.event_id % 5 = 0 AND c.event_id % 5 = 0 " +
        "AND c.ts >= p.ts - INTERVAL '1 hour' " +
        "AND c.ts <= p.ts + INTERVAL '1 hour' " +
        "ORDER BY p_id, c_id"),
      (s, dir) => {
        import java.nio.file.Files
        import graft.streaming.StreamingRefresh
        // deterministic 1-in-5 subsample: the harness checks join SEMANTICS,
        // not volume (the batch faces cover volume). Cached for the four
        // replay write jobs below — without it each one re-scans and
        // re-canonicalizes the events table (r7 verdict #3: the replay
        // staging, not the stream, carried most of the regression).
        val ev = H.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts")
          .filter(pmod(col("event_id"), lit(5)) === 0)
          .cache()
        val tmp = H.tmpDir("graft_ssjoin")
        val inP = s"$tmp/purchases"; val inC = s"$tmp/clicks"
        val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        replayFiles(ev.filter(col("event_type") === "purchase"), 2, tmp, inP)
        replayFiles(ev.filter(col("event_type") === "click"), 2, tmp, inC)
        val schema = ev.schema
        // state-store partition count sized to the (small) state volume:
        // each shuffle partition is a state store instance PER side PER
        // micro-batch — 32 would be pure per-batch overhead here. The
        // override lives in a CHILD SESSION (per-session conf over the
        // shared SparkContext), so queries planned concurrently in the
        // main session never observe it and there is no save/restore race.
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        // the inner join needs no eviction pass (the huge watermark never
        // advances past data) — the engine's trailing no-data micro-batch
        // would be a pure orchestration tax here, so turn it off
        ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        // no maxFilesPerTrigger: both replay files per side land in ONE
        // micro-batch (r8, verdict #3 — each extra trigger costs a fixed
        // ~0.6 s of state-store/WAL orchestration at this scale and proves
        // nothing the multi-batch streaming queries (stream_resume,
        // stream_dedup, stream_stateful_totals) don't already prove; the
        // join still buffers both sides in keyed state stores)
        val p = StreamingRefresh.fileStream(ss, schema, inP)
          .select(col("event_id").as("p_id"), col("user_id"),
            col("ts").as("p_ts"))
          .withWatermark("p_ts", "3650 days")
        val c = StreamingRefresh.fileStream(ss, schema, inC)
          .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
            col("ts").as("c_ts"))
          .withWatermark("c_ts", "3650 days")
        val joined = p.join(c,
          col("user_id") === col("c_user") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"))
        val q = joined.writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", sink)
          .start()
        q.awaitTermination()
        ev.unpersist(blocking = false)
        s.read.parquet(sink)
          .select(col("p_id"), col("c_id"), col("user_id"),
            fmtTs(col("p_ts")).as("p_ts"), fmtTs(col("c_ts")).as("c_ts"))
          .orderBy("p_id", "c_id")
      }),

    // Stream-stream LEFT OUTER join with watermark-driven null emission:
    // purchases with no click within ±1 hour surface as null-padded rows
    // only once the watermark passes the end of their join window (before
    // that, a match could still arrive — emitting earlier would be wrong).
    // Replay shape (consolidated in r8 — verdict #3 flagged this query's
    // per-trigger orchestration floor): ONE data file per side carrying
    // all real events PLUS two far-future sentinels. Nothing is dropped
    // as late because in-batch rows are filtered against the PREVIOUS
    // batch's watermark (initially 0); the sentinels then advance the
    // watermark past all real data at the end of that single batch, and
    // the engine's no-data micro-batch (noDataMicroBatches, on by
    // default — empirically verified to run under AvailableNow) performs
    // the eviction pass that emits the null-padded outer rows. Sentinel
    // rows never reach the sink: negative ids are filtered, and the
    // 2100-01-02 sentinel keeps the 2100-01-01 one inside the final
    // watermark so neither ever joins real data. Late-arrival DROP
    // semantics (what the old multi-batch replay also exercised) are
    // covered on their own by stream_late_drop.
    Q("stream_join_outer",
      Some("SELECT p.event_id AS p_id, coalesce(c.event_id, -1) AS c_id, " +
        "p.user_id, " +
        s"strftime(p.ts, '$F6') AS p_ts, " +
        s"coalesce(strftime(c.ts, '$F6'), '') AS c_ts " +
        "FROM events p LEFT JOIN events c ON p.user_id = c.user_id " +
        "AND c.event_type = 'click' AND c.event_id % 5 = 0 " +
        "AND c.ts >= p.ts - INTERVAL '1 hour' " +
        "AND c.ts <= p.ts + INTERVAL '1 hour' " +
        "WHERE p.event_type = 'purchase' AND p.event_id % 5 = 0 " +
        "ORDER BY p_id, c_id"),
      (s, dir) => {
        import java.nio.file.Files
        import graft.streaming.StreamingRefresh
        val ev = H.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts")
          .filter(pmod(col("event_id"), lit(5)) === 0)
          .cache()
        val tmp = H.tmpDir("graft_ssojoin")
        val inP = s"$tmp/purchases"; val inC = s"$tmp/clicks"
        val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        def mk(id: Long, user: Long, tpe: String, ts: String) =
          ev.sparkSession.sql(
            s"SELECT ${id}L AS event_id, ${user}L AS user_id, " +
              s"'$tpe' AS event_type, TIMESTAMP '$ts' AS ts")
        def replay(tpe: String, inDir: String): Unit = writeReplay(Seq(
          ev.filter(col("event_type") === tpe)
            .unionAll(mk(-1L, -777L, tpe, "2100-01-01 00:00:00"))
            .unionAll(mk(-2L, -778L, tpe, "2100-01-02 00:00:00"))),
          tmp, inDir)
        replay("purchase", inP)
        replay("click", inC)
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        val p = StreamingRefresh.fileStream(ss, ev.schema, inP, Some(1))
          .select(col("event_id").as("p_id"), col("user_id"),
            col("ts").as("p_ts"))
          .withWatermark("p_ts", "1 minute")
        val c = StreamingRefresh.fileStream(ss, ev.schema, inC, Some(1))
          .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
            col("ts").as("c_ts"))
          .withWatermark("c_ts", "1 minute")
        val joined = p.join(c,
          col("user_id") === col("c_user") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"),
          "leftOuter")
        val q = joined.writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", sink)
          .start()
        q.awaitTermination()
        ev.unpersist(blocking = false)
        val sunk = s.read.parquet(sink).filter(col("p_id") >= 0)
        // eviction tripwire: the null-padded outer rows are emitted by the
        // trailing no-data micro-batch under Trigger.AvailableNow — an
        // empirically verified behavior, NOT a documented Spark contract.
        // If a Spark change stops running that eviction pass, fail HERE
        // with a pointed message instead of as an oracle hash mismatch
        // three layers away (the sink is micro-batch-sized, so this extra
        // probe action is cheap).
        require(sunk.filter(col("c_id").isNull).limit(1).count() == 1L,
          "stream_join_outer: sink contains no null-padded outer rows — " +
            "the trailing no-data micro-batch did not run the watermark " +
            "eviction pass (AvailableNow behavior change?)")
        sunk
          .select(col("p_id"), coalesce(col("c_id"), lit(-1L)).as("c_id"),
            col("user_id"),
            fmtTs(col("p_ts")).as("p_ts"),
            coalesce(fmtTs(col("c_ts")), lit("")).as("c_ts"))
          .orderBy("p_id", "c_id")
      }),

    // State-store introspection (Spark 4 state data source): run a
    // watermarked windowed aggregation to completion, then read the
    // checkpoint's STATE back with format("statestore") — the keys and
    // counts still held are exactly the windows the final watermark has
    // not evicted (end > max(ts) - delay), which the oracle recomputes
    // relationally. This is the observability surface a production
    // streaming pipeline needs to debug state growth; the read is
    // partition-parallel over the state files, not a driver dump.
    Q("stream_state_reader",
      Some("WITH wm AS (SELECT max(ts) - INTERVAL '10 days' AS w FROM events), " +
        "d AS (SELECT time_bucket(INTERVAL '1 day', ts) AS ws, event_type, " +
        "count(*) AS n FROM events GROUP BY 1, 2) " +
        s"SELECT strftime(ws, '$F0') AS wstart, event_type, " +
        "CAST(n AS BIGINT) AS n FROM d, wm " +
        "WHERE ws + INTERVAL '1 day' > w ORDER BY 1, 2"),
      (s, dir) => {
        import java.nio.file.Files
        val ev = H.events(s, dir).select("event_id", "event_type", "ts")
        val tmp = H.tmpDir("graft_statereader")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        ev.coalesce(1).write.parquet(in)
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        graft.streaming.StreamingRefresh.tuneCheckpointConf(ss)
        val q = ss.readStream.schema(ev.schema).parquet(in)
          .withWatermark("ts", "10 days")
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", sink)
          .start()
        q.awaitTermination()
        s.read.format("statestore").load(ckpt)
          .select(fmtTsSec(col("key.window.start")).as("wstart"),
            col("key.event_type").as("event_type"),
            col("value.count").as("n"))
          .orderBy("wstart", "event_type")
      }),

    // Event-time TIMERS (transformWithState, TimeMode.EventTime): timer-
    // driven sessionization over a 5-batch replay — three time-ordered
    // event ranges plus two far-future sentinel batches that push the
    // watermark past every real session's (end + gap) timer, so sessions
    // whose user never returns are closed by handleExpiredTimer rather
    // than by a subsequent event. Closure is exactly-once through either
    // path, so the (user, session_start)-keyed upsert sink equals the
    // batch gap-and-island oracle (the streaming twin of
    // events_sessionize, which shares the 8h gap).
    Q("stream_tws_timers",
      Some("WITH e AS (SELECT user_id, event_id, ts FROM events " +
        "WHERE event_id % 5 = 1), " +
        "g AS (SELECT user_id, event_id, ts, " +
        "CASE WHEN lag(epoch_us(ts)) OVER w IS NULL " +
        "OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 28800000000 " +
        "THEN 1 ELSE 0 END AS new_s FROM e " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS si FROM g) " +
        s"SELECT user_id, strftime(min(ts), '$F6') AS s_start, " +
        s"strftime(max(ts), '$F6') AS s_end, " +
        "CAST(count(*) AS BIGINT) AS n_events FROM s GROUP BY user_id, si " +
        "ORDER BY user_id, s_start"),
      (s, dir) => {
        import java.nio.file.Files
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
        import graft.streaming.StreamingRefresh
        val gapUs = 8L * 3600 * 1000000
        val ev = H.events(s, dir)
          .filter(pmod(col("event_id"), lit(5)) === 1)
          .select(col("event_id"), col("user_id"), col("ts"),
            unix_micros(col("ts")).as("ts_us"))
        def sentinel(id: Long, tsLit: String) = ev.sparkSession.range(1)
          .select(lit(id).as("event_id"), lit(-1L).as("user_id"),
            to_timestamp(lit(tsLit)).as("ts"),
            unix_micros(to_timestamp(lit(tsLit))).as("ts_us"))
        val tmp = H.tmpDir("graft_tws_timers")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        writeReplay(Seq(
          ev.filter(col("ts") < to_timestamp(lit("2024-01-11 00:00:00"))),
          ev.filter(col("ts") >= to_timestamp(lit("2024-01-11 00:00:00")) &&
            col("ts") < to_timestamp(lit("2024-01-21 00:00:00"))),
          ev.filter(col("ts") >= to_timestamp(lit("2024-01-21 00:00:00"))),
          sentinel(-2L, "2024-03-01 00:00:00"),
          sentinel(-3L, "2024-04-01 00:00:00")), tmp, in)
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        ss.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        import ss.implicits._
        val src = StreamingRefresh
          .fileStream(ss, ev.schema, in, maxFilesPerTrigger = Some(1))
          .withWatermark("ts", "1 hour")
          .as[EvTimer]
        val sessions = src.groupByKey(_.user_id)
          .transformWithState(new SessionTimerProcessor(gapUs),
            TimeMode.EventTime(), OutputMode.Update())
        val q = sessions.toDF().writeStream
          .outputMode("update")
          .foreachBatch(StreamingRefresh.upsertBatch(
            Seq("user_id", "s_start_us"), "n_events", sink) _)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .filter(col("user_id") >= 0)
          .select(col("user_id"),
            fmtTs(timestamp_micros(col("s_start_us"))).as("s_start"),
            fmtTs(timestamp_micros(col("s_end_us"))).as("s_end"),
            col("n_events"))
          .orderBy("user_id", "s_start")
      }),

    // Chained stateful aggregations (Spark ≥3.5 multi-stateful append
    // mode): hourly windowed counts re-aggregated into daily windows
    // INSIDE one streaming query — two state stores, watermark propagated
    // through the first aggregate into the second. Replay is time-ordered
    // ranges plus two far-future sentinels so the watermark closes every
    // real daily window (append emits each window exactly once — the sink
    // is a plain append, no upsert needed); sentinel rows carry a marker
    // type filtered at read. Oracle = the same double aggregation in
    // batch.
    Q("stream_chained_aggs",
      Some("WITH h AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS hw, " +
        "event_type, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents " +
        "FROM events WHERE event_id % 5 = 2 GROUP BY 1, 2) " +
        "SELECT strftime(time_bucket(INTERVAL '1 day', hw), " +
        s"'$F0') AS dstart, event_type, " +
        "CAST(sum(n) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS cents " +
        "FROM h GROUP BY 1, 2 ORDER BY 1, 2"),
      (s, dir) => {
        import java.nio.file.Files
        import graft.streaming.StreamingRefresh
        val ev = H.events(s, dir)
          .filter(pmod(col("event_id"), lit(5)) === 2)
          .select("event_id", "event_type", "ts", "value")
        def sentinel(id: Long, tsLit: String) = ev.sparkSession.range(1)
          .select(lit(id).as("event_id"), lit("__s__").as("event_type"),
            to_timestamp(lit(tsLit)).as("ts"), lit(0.0).as("value"))
        val tmp = H.tmpDir("graft_chained")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        writeReplay(Seq(
          ev.filter(col("ts") < to_timestamp(lit("2024-01-11 00:00:00"))),
          ev.filter(col("ts") >= to_timestamp(lit("2024-01-11 00:00:00")) &&
            col("ts") < to_timestamp(lit("2024-01-21 00:00:00"))),
          ev.filter(col("ts") >= to_timestamp(lit("2024-01-21 00:00:00"))),
          sentinel(-2L, "2024-03-01 00:00:00"),
          sentinel(-3L, "2024-04-01 00:00:00")), tmp, in)
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        val hourly = StreamingRefresh
          .fileStream(ss, ev.schema, in, maxFilesPerTrigger = Some(1))
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum((col("value").cast("decimal(12,2)") * 100).cast("long"))
              .as("cents"))
        val daily = hourly
          .groupBy(window(col("window"), "1 day"), col("event_type"))
          .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
        val q = daily
          .select(col("window.start").as("dstart"), col("event_type"),
            col("n"), col("cents"))
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", sink)
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .filter(col("event_type") =!= "__s__")
          .select(fmtTsSec(col("dstart")).as("dstart"), col("event_type"),
            col("n"), col("cents"))
          .orderBy("dstart", "event_type")
      }))
}
