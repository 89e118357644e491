package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Encoder case classes for the ListState streaming query. */
final case class L3Ev(event_id: Long, user_id: Long, ts_us: Long,
    cents: Long)
final case class L3Out(user_id: Long, last_eid: Long, n_kept: Long,
    v1_cents: Long, v2_cents: Long, v3_cents: Long)

/** A bounded recent-history buffer per key, held in transformWithState
  * ListState — the state primitive the tws family had not yet exercised
  * (ValueState: totals; MapState: by-type; timers: tws_timers; ListState:
  * THIS). The buffer is capped at 3, so state is O(1) per key no matter
  * how long the stream runs. */
final class Last3Processor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, L3Ev, L3Out] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig,
    TimerValues, ListState}
  import org.apache.spark.sql.Encoders
  @transient private var recent: ListState[L3Ev] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    recent = getHandle.getListState[L3Ev](
      "recent", Encoders.product[L3Ev], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[L3Ev],
      timerValues: TimerValues): Iterator[L3Out] = {
    // event-time order: day-ranged replay guarantees cross-batch order,
    // the sort covers within-batch file arrival
    val merged = (recent.get().toSeq ++ rows.toSeq)
      .sortBy(e => (e.ts_us, e.event_id))
    val kept = merged.takeRight(3)
    recent.clear()
    recent.appendList(kept.toArray)
    val desc = kept.reverse // v1 = most recent
    def at(i: Int) = if (i < desc.length) desc(i).cents else -1L
    Iterator.single(L3Out(key, desc.head.event_id, kept.length.toLong,
      at(0), at(1), at(2)))
  }
}

/** Thirty-eighth wave: sequential pattern mining and the ListState
  * streaming buffer. */
object SequentialOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Sequential 2-patterns over the order history: item a in one order,
    // item b in the SAME customer's NEXT order (temporal direction —
    // what co-purchase can't see). Adjacent-order pairing bounds volume:
    // items² per adjacent order pair, orders per customer bounded — the
    // whole expansion is O(|orders| · maxsize²), same flat-at-scale
    // argument as the basket miners.
    Q("mining_sequential_pairs",
      Some("WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem), " +
        "seq AS (SELECT o_custkey AS c, o_orderkey AS o, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn " +
        "FROM orders), " +
        "adj AS (SELECT a.c, a.o AS o1, b.o AS o2 FROM seq a " +
        "JOIN seq b ON b.c = a.c AND b.rn = a.rn + 1), " +
        "pat AS (SELECT pa.p AS a, pb.p AS b, CAST(count(*) AS BIGINT) AS support " +
        "FROM adj JOIN op pa ON pa.o = adj.o1 JOIN op pb ON pb.o = adj.o2 " +
        "GROUP BY pa.p, pb.p HAVING count(*) >= 2) " +
        "SELECT CAST(row_number() OVER (ORDER BY support DESC, a, b) AS BIGINT) AS rnk, " +
        "a, b, support FROM pat QUALIFY rnk <= 20 ORDER BY rnk"),
      (s, dir) => {
        val op = tbl(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
          // spread: the two-sided pattern-expansion joins below probe this
          // checkpoint; at its AQE-coalesced 2-3 partitions they ran on as
          // many tasks (H.spread)
          .transform(H.spread(_, col("o"))).localCheckpoint()
        val seq0 = tbl(s, dir, "orders")
          .select(col("o_custkey").as("c"), col("o_orderkey").as("o"),
            row_number().over(Window.partitionBy("o_custkey")
              .orderBy("o_orderdate", "o_orderkey")).as("rn"))
          .localCheckpoint() // both adjacency sides read the ranked frame
        val adj = seq0.select(col("c"), col("o").as("o1"), col("rn"))
          .join(seq0.select(col("c").as("c2"), col("o").as("o2"),
            (col("rn") - 1).as("rn2")),
            col("c") === col("c2") && col("rn") === col("rn2"))
        val pat = adj
          .join(op.select(col("o").as("o1"), col("p").as("a")), "o1")
          .join(op.select(col("o").as("o2"), col("p").as("b")), "o2")
          .groupBy("a", "b").agg(count(lit(1)).cast("long").as("support"))
          .filter(col("support") >= 2)
        val top = pat.orderBy(col("support").desc, col("a"), col("b")).limit(20)
        H.materialized(
          top.withColumn("rnk", row_number().over(
              Window.orderBy(col("support").desc, col("a"), col("b"))).cast("long"))
            .select("rnk", "a", "b", "support").orderBy("rnk"),
          caches = Nil, checkpoints = Seq(op, seq0))
      }),

    // Last-3-values-per-user via ListState across day-ordered replay
    // batches: the bounded recent-history buffer (O(1) state per key)
    // that powers "recent activity" features. Final state per user
    // equals the batch top-3-by-recency — the replay-invariant property
    // that makes the run SQL-checkable.
    Q("stream_tws_last3",
      Some("WITH r AS (SELECT user_id, event_id, " +
        "CAST(round(value * 100) AS BIGINT) AS cents, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn, " +
        "count(*) OVER (PARTITION BY user_id) AS nu " +
        "FROM events WHERE event_id % 4 = 1) " +
        "SELECT user_id, CAST(least(nu, 3) AS BIGINT) AS n_kept, " +
        "CAST(max(CASE WHEN rn = 1 THEN cents END) AS BIGINT) AS v1_cents, " +
        "CAST(coalesce(max(CASE WHEN rn = 2 THEN cents END), -1) AS BIGINT) AS v2_cents, " +
        "CAST(coalesce(max(CASE WHEN rn = 3 THEN cents END), -1) AS BIGINT) AS v3_cents " +
        "FROM r WHERE rn <= 3 GROUP BY user_id, nu ORDER BY user_id"),
      (s, dir) => {
        import java.nio.file.Files
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
        import graft.streaming.StreamingRefresh
        val ev = H.events(s, dir)
          .filter(pmod(col("event_id"), lit(4)) === 1)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        val tmp = H.tmpDir("graft_l3")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        val d10 = unix_micros(to_timestamp(lit("2024-01-11 00:00:00")))
        val d20 = unix_micros(to_timestamp(lit("2024-01-21 00:00:00")))
        WindowingQueries.writeReplay(Seq(
          ev.filter(col("ts_us") < d10),
          ev.filter(col("ts_us") >= d10 && col("ts_us") < d20),
          ev.filter(col("ts_us") >= d20)), tmp, in)
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        ss.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        import ss.implicits._
        val out = StreamingRefresh
          .fileStream(ss, ev.schema, in, maxFilesPerTrigger = Some(1))
          .as[L3Ev]
          .groupByKey(_.user_id)
          .transformWithState(new Last3Processor,
            TimeMode.None(), OutputMode.Update())
        val q = out.toDF().writeStream
          .outputMode("update")
          .foreachBatch(
            StreamingRefresh.upsertBatch(Seq("user_id"), "last_eid", sink) _)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .select(col("user_id"), col("n_kept"), col("v1_cents"),
            col("v2_cents"), col("v3_cents"))
          .orderBy("user_id")
      }))
}
