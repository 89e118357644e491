package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}

/** Round-11 wave 159: streaming state-store SCHEMA EVOLUTION across a
  * query upgrade — the operational gap next to `stream_resume`: a
  * long-running stateful stream is stopped, its processor is upgraded
  * with a WIDER state schema (new nullable field), and the new code
  * resumes the SAME checkpoint, reading v1 state rows through the v2
  * schema (the added field defaults to null). Spark 4 supports this for
  * `transformWithState` when the state store encodes rows as Avro
  * (`spark.sql.streaming.stateStore.encodingFormat=avro`).
  *
  * Scale story: state evolution is the only zero-downtime-upgrade path
  * at 100 TB — re-keying a multi-TB state store from scratch replays
  * the whole retained input; schema evolution re-reads each row lazily
  * at its next touch, an O(touched keys) cost.
  */
final case class TotalsStateV1(n: Long, total_cents: Long)
final case class TotalsStateV2(
    n: Long, total_cents: Long, max_event_id: Option[Long])
final case class TotalsOutV1(user_id: Long, n: Long, total_cents: Long)
final case class TotalsOutV2(
    user_id: Long, n: Long, total_cents: Long, max_event_id_p2: Long)

/** v1 processor: per-user running (count, exact-cents total). */
final class TotalsV1Processor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, EvSlim, TotalsOutV1] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig,
    TimerValues, ValueState}
  import org.apache.spark.sql.Encoders
  @transient private var st: ValueState[TotalsStateV1] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[TotalsStateV1](
      "totals", Encoders.product[TotalsStateV1], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[EvSlim],
      timerValues: TimerValues): Iterator[TotalsOutV1] = {
    val prev = if (st.exists()) st.get() else TotalsStateV1(0L, 0L)
    val next = rows.foldLeft(prev) { (acc, e) =>
      TotalsStateV1(acc.n + 1, acc.total_cents + math.round(e.value * 100))
    }
    st.update(next)
    Iterator.single(TotalsOutV1(key, next.n, next.total_cents))
  }
}

/** v2 processor — the UPGRADE: same state var name, schema widened by a
  * nullable `max_event_id`. v1 rows read back with the field null
  * (Avro default), which the fold seeds from the first v2-era row. */
final class TotalsV2Processor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, EvSlim, TotalsOutV2] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig,
    TimerValues, ValueState}
  import org.apache.spark.sql.Encoders
  @transient private var st: ValueState[TotalsStateV2] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[TotalsStateV2](
      "totals", Encoders.product[TotalsStateV2], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[EvSlim],
      timerValues: TimerValues): Iterator[TotalsOutV2] = {
    val prev = if (st.exists()) st.get() else TotalsStateV2(0L, 0L, None)
    val next = rows.foldLeft(prev) { (acc, e) =>
      TotalsStateV2(acc.n + 1, acc.total_cents + math.round(e.value * 100),
        Some(math.max(acc.max_event_id.getOrElse(Long.MinValue), e.event_id)))
    }
    st.update(next)
    Iterator.single(TotalsOutV2(
      key, next.n, next.total_cents, next.max_event_id.getOrElse(-1L)))
  }
}

object StateEvolveOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // STATE SCHEMA EVOLUTION, executed: phase 1 runs the v1 processor
    // over replay files 0-1 (event_id%3 ∈ {0,1}) and terminates; phase 2
    // resumes the SAME checkpoint with the v2 processor (state widened by
    // nullable max_event_id) over file 2. The final answer is the v2
    // sink (users touched in phase 2 — their v1 state carried across the
    // upgrade) plus the v1 sink rows for users phase 2 never touched
    // (max_event_id_p2 = -1). Totals are replay-invariant, so the whole
    // two-binary lifecycle collapses to a GROUP BY oracle.
    Q("stream_state_evolve",
      Some("WITH sub AS (SELECT * FROM events WHERE event_id % 7 = 2), " +
        "agg AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS total_cents " +
        "FROM sub GROUP BY 1), " +
        "p2 AS (SELECT user_id, CAST(max(event_id) AS BIGINT) AS mx " +
        "FROM sub WHERE event_id % 3 = 2 GROUP BY 1) " +
        "SELECT a.user_id, a.n, a.total_cents, " +
        "coalesce(p2.mx, -1) AS max_event_id_p2 " +
        "FROM agg a LEFT JOIN p2 USING (user_id) ORDER BY 1"),
      (s, dir) => {
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
        import graft.streaming.StreamingRefresh
        val ev = H.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts", "value")
          .filter(pmod(col("event_id"), lit(7)) === 2)
        val tmp = H.tmpDir("graft_evolve")
        val in = s"$tmp/in"; val ckpt = s"$tmp/ckpt"
        val sink1 = s"$tmp/sink1"; val sink2 = s"$tmp/sink2"
        val parts = (0 until 3).map(i =>
          ev.filter(pmod(col("event_id"), lit(3)) === i))
        def session() = {
          val ss = s.newSession()
          ss.conf.set("spark.sql.shuffle.partitions", "4")
          ss.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
          // Avro state encoding is what makes the v2 schema able to read
          // v1 rows (UnsafeRow encoding pins the exact binary layout)
          ss.conf.set("spark.sql.streaming.stateStore.encodingFormat", "avro")
          ss
        }
        // phase 1: v1 binary over files 0-1, then terminates
        WindowingQueries.writeReplay(parts.take(2), tmp, in)
        locally {
          val ss = session()
          import ss.implicits._
          val q = StreamingRefresh
            .fileStream(ss, ev.schema, in, maxFilesPerTrigger = Some(1))
            .select(col("event_id"), col("user_id"), col("value"))
            .as[EvSlim]
            .groupByKey(_.user_id)
            .transformWithState(new TotalsV1Processor,
              TimeMode.None(), OutputMode.Update())
            .toDF().writeStream
            .outputMode("update")
            .foreachBatch(
              StreamingRefresh.upsertBatch(Seq("user_id"), "n", sink1) _)
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        // phase 2: the UPGRADED binary resumes the same checkpoint
        WindowingQueries.writeReplay(Seq(parts(2)), tmp, in, startAt = 2)
        locally {
          val ss = session()
          import ss.implicits._
          val q = StreamingRefresh
            .fileStream(ss, ev.schema, in, maxFilesPerTrigger = Some(1))
            .select(col("event_id"), col("user_id"), col("value"))
            .as[EvSlim]
            .groupByKey(_.user_id)
            .transformWithState(new TotalsV2Processor,
              TimeMode.None(), OutputMode.Update())
            .toDF().writeStream
            .outputMode("update")
            .foreachBatch(
              StreamingRefresh.upsertBatch(Seq("user_id"), "n", sink2) _)
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        val v2 = s.read.parquet(sink2)
          .select("user_id", "n", "total_cents", "max_event_id_p2")
        val v1only = s.read.parquet(sink1)
          .join(v2.select("user_id"), Seq("user_id"), "left_anti")
          .select(col("user_id"), col("n"), col("total_cents"),
            lit(-1L).as("max_event_id_p2"))
        v2.unionByName(v1only).orderBy("user_id")
      })
  )
}
