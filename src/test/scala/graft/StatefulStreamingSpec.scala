package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

final case class Click(user_id: Long, ts: Timestamp, value: Double)
final case class UserTotal(user_id: Long, n: Long, total: Double)

/** Custom streaming state via flatMapGroupsWithState — the §2.2 stateful
  * surface beyond built-in windows: a per-user running total that survives
  * across micro-batches.
  */
class StatefulStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t(s: String) = Timestamp.valueOf(s)

  test("stream-stream join: purchases enriched with prior clicks inside the time bound") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Click]

    val c = clicks.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val p = purchases.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("amount"))
    // time-bounded equi join: click within 30min before the purchase
    val joined = p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"))

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    try {
      clicks.addData(Click(1, t("2024-01-01 10:00:00"), 0.0),
        Click(2, t("2024-01-01 09:00:00"), 0.0)) // too old for user 2's purchase
      purchases.addData(Click(1, t("2024-01-01 10:10:00"), 50.0),
        Click(2, t("2024-01-01 10:10:00"), 70.0))
      q.processAllAvailable()
      val rows = spark.table("ss_join")
        .select("p_user", "amount").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows == Set((1L, 50.0))) // user 2's click was outside the bound
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps per-key state across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Click]

    val totals = in.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Click], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(user, 0L, 0.0))
          val batch = rows.toSeq
          val next = UserTotal(user,
            prev.n + batch.size,
            prev.total + batch.map(_.value).sum)
          state.update(next)
          Iterator.single(next)
      }

    val q = totals.writeStream.outputMode("update")
      .format("memory").queryName("user_totals").start()
    try {
      in.addData(Click(1, t("2024-01-01 00:00:01"), 10.0),
        Click(1, t("2024-01-01 00:00:02"), 5.0),
        Click(2, t("2024-01-01 00:00:03"), 1.0))
      q.processAllAvailable()
      in.addData(Click(1, t("2024-01-01 00:10:00"), 2.5))
      q.processAllAvailable()

      val latest = spark.table("user_totals")
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("n").as("n"),
          org.apache.spark.sql.functions.max("total").as("total"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(latest == Set((1L, 3L, 17.5), (2L, 1L, 1.0))) // state carried over
    } finally q.stop()
  }

  // The executed query stream_tws_timers can close most sessions through
  // the input path (a later event arrives past the gap); this pins the
  // TIMER path in isolation: one user, ONE event, then only watermark
  // advancement from sentinel users — the session must still be emitted.
  test("event-time timer alone closes an abandoned session") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamingRefresh
    import graft.queries.{EvTimer, SessionTimerProcessor}
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

    val tmp = Files.createTempDirectory("graft_timer_spec").toString
    val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
    def row(id: Long, user: Long, ts: String) =
      spark.range(1).select(lit(id).as("event_id"), lit(user).as("user_id"),
        to_timestamp(lit(ts)).as("ts"),
        unix_micros(to_timestamp(lit(ts))).as("ts_us"))
    Seq(row(1L, 7L, "2024-01-01 00:00:00"),       // the only real event
      row(-2L, -1L, "2024-02-01 00:00:00"),       // watermark pushers
      row(-3L, -1L, "2024-03-01 00:00:00"))
      .zipWithIndex.foreach { case (b, i) =>
        val stage = s"$tmp/stage$i"
        b.coalesce(1).write.parquet(stage)
        val listing = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        val part = try listing.filter(_.toString.endsWith(".parquet"))
          .findFirst().get() finally listing.close()
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
        java.nio.file.Files.move(part,
          java.nio.file.Paths.get(s"$in/batch$i.parquet"))
      }
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    val src = StreamingRefresh
      .fileStream(ss, row(0, 0, "2024-01-01 00:00:00").schema, in,
        maxFilesPerTrigger = Some(1))
      .withWatermark("ts", "1 hour")
      .as[EvTimer]
    val q = src.groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(8L * 3600 * 1000000),
        TimeMode.EventTime(), OutputMode.Update())
      .toDF().writeStream.outputMode("update")
      .foreachBatch(StreamingRefresh.upsertBatch(
        Seq("user_id", "s_start_us"), "n_events", sink) _)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(sink).filter(col("user_id") >= 0)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
    assert(out.toSeq == Seq((7L, 1L))) // timer fired, session emitted once
  }
}
