package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}

final case class EvVal(event_id: Long, event_type: String, cents: Long)
final case class EwmaSt(ewma_milli: Long, n: Long, alarms: Long)
final case class EwmaOut(event_type: String, n: Long, alarms: Long,
    ewma_milli: Long)

/** Streaming EWMA anomaly detector (α = 1/4, integer milli state): per
  * event type, a ValueState holds (ewma, n, alarms); each micro-batch
  * folds its rows in event_id order, raising an alarm when a value
  * deviates from the running mean by more than the threshold BEFORE the
  * mean absorbs it. Emission is cumulative, so the keyed upsert sink is
  * replay-invariant. All arithmetic is non-negative integer (floor
  * division agrees across engines), and the replay order — (event_id
  * mod 3, event_id) — is stated explicitly in the oracle's ranking, so
  * the batch recursion reproduces the stream bit-for-bit.
  */
final class EwmaAlarmProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, EvVal, EwmaOut] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig,
    TimerValues, ValueState}
  import org.apache.spark.sql.Encoders
  @transient private var st: ValueState[EwmaSt] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[EwmaSt]("ewma",
      Encoders.product[EwmaSt], TTLConfig.NONE)
  override def handleInputRows(key: String, rows: Iterator[EvVal],
      timerValues: TimerValues): Iterator[EwmaOut] = {
    var s = if (st.exists()) st.get() else EwmaSt(0L, 0L, 0L)
    rows.toVector.sortBy(_.event_id).foreach { e =>
      val vm = e.cents * 1000L
      s = if (s.n == 0L) EwmaSt(vm, 1L, 0L)
      else {
        val alarm = if (math.abs(vm - s.ewma_milli) > 20000000L) 1L else 0L
        EwmaSt((vm + 3L * s.ewma_milli) / 4L, s.n + 1L, s.alarms + alarm)
      }
    }
    st.update(s)
    Iterator.single(EwmaOut(key, s.n, s.alarms, s.ewma_milli))
  }
}

object StreamAnalyticsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    Q("stream_ewma_alarm",
      Some(
        """WITH RECURSIVE e AS MATERIALIZED (
          |  SELECT event_type AS t,
          |    CAST(floor(value*100 + 0.5) AS BIGINT) * 1000 AS vm,
          |    CAST(row_number() OVER (PARTITION BY event_type
          |      ORDER BY event_id % 3, event_id) AS BIGINT) AS rn
          |  FROM events WHERE event_id % 2 = 0),
          |cnt AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY t),
          |f AS (
          |  SELECT e.t, CAST(1 AS BIGINT) AS i, e.vm AS ewma,
          |    CAST(0 AS BIGINT) AS alarms FROM e WHERE e.rn = 1
          |  UNION ALL
          |  SELECT f.t, f.i + 1,
          |    (e.vm + 3*f.ewma) // 4,
          |    f.alarms + CASE WHEN abs(e.vm - f.ewma) > 20000000
          |      THEN 1 ELSE 0 END
          |  FROM f JOIN e ON e.t = f.t AND e.rn = f.i + 1
          |)
          |SELECT f.t AS event_type, cnt.n, f.alarms,
          |  CAST(f.ewma AS BIGINT) AS ewma_milli
          |FROM f JOIN cnt ON cnt.t = f.t WHERE f.i = cnt.n
          |ORDER BY event_type
          |""".stripMargin),
      (s, dir) => {
        import java.nio.file.Files
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
        import graft.streaming.StreamingRefresh
        val ev = H.events(s, dir)
          .filter(pmod(col("event_id"), lit(2)) === 0)
          .select(col("event_id"), col("event_type"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
        val tmp = H.tmpDir("graft_ewma")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        WindowingQueries.writeReplay(
          (0 until 3).map(i =>
            ev.filter(pmod(col("event_id"), lit(3)) === i)), tmp, in)
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        ss.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state." +
            "RocksDBStateStoreProvider")
        import ss.implicits._
        val src = StreamingRefresh
          .fileStream(ss, ev.schema, in, maxFilesPerTrigger = Some(1))
          .as[EvVal]
        val out = src.groupByKey(_.event_type)
          .transformWithState(new EwmaAlarmProcessor,
            TimeMode.None(), OutputMode.Update())
        val q = out.toDF().writeStream
          .outputMode("update")
          .foreachBatch(StreamingRefresh.upsertBatch(
            Seq("event_type"), "n", sink) _)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .select(col("event_type"), col("n"), col("alarms"),
            col("ewma_milli"))
          .orderBy("event_type")
      }))
}
