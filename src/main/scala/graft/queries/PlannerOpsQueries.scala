package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Typed rows for the streaming quota query (top-level for Encoders). */
final case class EvQuota(event_id: Long, event_type: String)
final case class QuotaState(ids: Array[Long], seen: Long)
final case class QuotaSnap(event_type: String, n_seen: Long, n_admitted: Long,
    max_admitted: Long, sum_admitted: Long)

/** Twelfth wave: planner/QA ops — exact range-partition planning from the
  * value distribution, tokenizer fertility reporting, and a streaming
  * per-key admission quota whose state is a min-N semilattice (so the
  * admitted set is independent of batch splits and within-batch order —
  * the property that makes arbitrary streaming state SQL-checkable).
  */
object PlannerOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // RANGE-PARTITION PLANNING: compute 16 count-balanced split points for
    // l_partkey EXACTLY from the value distribution — what
    // repartitionByRange estimates by sampling, made deterministic. The
    // cumulative sum runs over DISTINCT values (domain-bounded input, not
    // the row stream); the total joins back broadcast. A value maps to
    // shard floor(rowsBefore·16/n) so every shard's planned row count is
    // within one value-group of balanced, and the output reports the
    // per-shard bounds plus the balance ratio a table optimizer would act
    // on. The distribution cumsum IS the two-phase range-partitioned
    // prefix sum (H.globalCumSum — range partitions + broadcast
    // per-partition sum offsets): the key domain is unbounded at 100 TB,
    // so a global `sum OVER (ORDER BY v)` window would sort it in ONE
    // task (r9 window-discipline sweep catch).
    Q("layout_range_planner",
      Some(
        """WITH dist AS (
          |  SELECT l_partkey AS v, count(*) AS c FROM lineitem GROUP BY 1),
          |tot AS (SELECT sum(c) AS n FROM dist),
          |cum AS (
          |  SELECT v, c, sum(c) OVER (ORDER BY v) AS cum, n FROM dist, tot),
          |sh AS (
          |  SELECT least(15, CAST(floor((cum - c) * 16.0 / n) AS BIGINT)) AS shard,
          |         v, c, n
          |  FROM cum)
          |SELECT shard, min(v) AS lo, max(v) AS hi,
          |       CAST(sum(c) AS BIGINT) AS n_rows,
          |       CAST(count(*) AS BIGINT) AS n_distinct,
          |       CAST(sum(c) AS DOUBLE) * 16 / max(n) AS balance
          |FROM sh GROUP BY shard ORDER BY shard""".stripMargin),
      (s, dir) => {
        val dist = tbl(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("v")).agg(count(lit(1)).as("c"))
        val (cs, pp) = H.globalCumSum(dist, Seq(col("v")), col("c"), "cum")
        val tot = pp.agg(sum("c").as("n"))
        val out = cs.crossJoin(broadcast(tot))
          .select(
            least(lit(15), floor((col("cum") - col("c")) * 16.0 / col("n"))
              .cast("long")).as("shard"),
            col("v"), col("c"), col("n"))
          .groupBy("shard")
          .agg(min("v").as("lo"), max("v").as("hi"),
            sum("c").cast("long").as("n_rows"),
            count(lit(1)).as("n_distinct"),
            (sum("c").cast("double") * 16 / max("n")).as("balance"))
          .orderBy("shard")
        H.materialized(out, caches = Nil, checkpoints = Seq(pp))
      }),

    // TOKENIZER FERTILITY REPORT: per-language tokens-per-word and
    // chars-per-token under the corpus's BPE-ish subword rule (words
    // chunked to <=4 chars, same rule as text_tokens_bpe) — the standard
    // tokenizer-QA artifact deciding whether a vocab underserves a
    // language. All counters are exact BIGINT sums inside one map-side
    // combined aggregation (the higher-order fold stays in codegen — no
    // UDF); the two ratios are single IEEE divisions at the end.
    Q("vocab_fertility",
      Some(
        """SELECT lang,
          |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
          |  CAST(sum(list_sum(list_apply(string_split(text, ' '),
          |    w -> CAST(ceil(length(w) / 4.0) AS BIGINT)))) AS BIGINT) AS n_tokens,
          |  CAST(sum(list_sum(list_apply(string_split(text, ' '),
          |    w -> CAST(length(w) AS BIGINT)))) AS BIGINT) AS n_chars,
          |  CAST(sum(list_sum(list_apply(string_split(text, ' '),
          |    w -> CAST(ceil(length(w) / 4.0) AS BIGINT)))) AS DOUBLE) /
          |    sum(len(string_split(text, ' '))) AS fertility,
          |  CAST(sum(list_sum(list_apply(string_split(text, ' '),
          |    w -> CAST(length(w) AS BIGINT)))) AS DOUBLE) /
          |    sum(list_sum(list_apply(string_split(text, ' '),
          |    w -> CAST(ceil(length(w) / 4.0) AS BIGINT)))) AS chars_per_token
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
      (s, dir) =>
        tbl(s, dir, "documents")
          .select(col("lang"),
            size(split(col("text"), " ")).cast("long").as("words"),
            expr("aggregate(split(text, ' '), 0L, " +
              "(acc, w) -> acc + CAST(ceil(length(w) / 4.0) AS LONG))").as("toks"),
            expr("aggregate(split(text, ' '), 0L, " +
              "(acc, w) -> acc + CAST(length(w) AS LONG))").as("chars"))
          .groupBy("lang")
          .agg(sum("words").as("n_words"), sum("toks").as("n_tokens"),
            sum("chars").as("n_chars"),
            (sum("toks").cast("double") / sum("words")).as("fertility"),
            (sum("chars").cast("double") / sum("toks")).as("chars_per_token"))
          .orderBy("lang")),

    // STREAMING ADMISSION QUOTA: at most N=200 events pass per event_type,
    // enforced by flatMapGroupsWithState across a 3-batch replay. The
    // state is the N SMALLEST admitted event_ids — a min-N semilattice:
    // merging any batch in any order yields the same final set, so the
    // admitted events are a pure function of the data (NOT of batch
    // boundaries or within-batch iterator order), which is what lets a
    // batch SQL oracle (row_number <= N per key) verify an executed
    // stream. Emission is a cumulative snapshot; the keyed sink keeps the
    // latest per type. This is the idempotent form of quota/rate-limit
    // enforcement — "first N by arrival" is NOT replay-safe, id-order is.
    Q("stream_throttle",
      Some(
        """WITH r AS (
          |  SELECT event_type, event_id, row_number() OVER (
          |    PARTITION BY event_type ORDER BY event_id) AS rn
          |  FROM events)
          |SELECT event_type, CAST(count(*) AS BIGINT) AS n_admitted,
          |       max(event_id) AS max_admitted,
          |       CAST(sum(event_id) AS BIGINT) AS sum_admitted
          |FROM r WHERE rn <= 200 GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        import java.nio.file.Files
        import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
        import graft.streaming.StreamingRefresh
        val quota = 200
        val ev = H.events(s, dir).select("event_id", "event_type")
        val tmp = H.tmpDir("graft_quota")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        WindowingQueries.writeReplay(
          (0 until 3).map(i => ev.filter(pmod(col("event_id"), lit(3)) === i)),
          tmp, in)
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        import ss.implicits._
        val src = StreamingRefresh
          .fileStream(ss, ev.schema, in, maxFilesPerTrigger = Some(1))
          .as[EvQuota]
        val snaps = src.groupByKey(_.event_type)
          .flatMapGroupsWithState(
            OutputMode.Update, GroupStateTimeout.NoTimeout) {
            (tpe: String, rows: Iterator[EvQuota], state: GroupState[QuotaState]) =>
              val prev = state.getOption.getOrElse(QuotaState(Array.empty[Long], 0L))
              val batch = rows.map(_.event_id).toArray
              val merged = (prev.ids ++ batch).sorted.take(quota)
              val seen = prev.seen + batch.length
              state.update(QuotaState(merged, seen))
              // n_seen grows strictly every batch the key appears in, so the
              // keyed keep-latest sink always keeps the final snapshot —
              // n_admitted saturates at the quota and CANNOT order snapshots
              Iterator.single(QuotaSnap(tpe, seen, merged.length.toLong,
                merged.last, merged.sum))
          }
        val q = snaps.toDF().writeStream
          .outputMode("update")
          .foreachBatch(
            StreamingRefresh.upsertBatch(Seq("event_type"), "n_seen", sink) _)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .select(col("event_type"), col("n_admitted"), col("max_admitted"),
            col("sum_admitted"))
          .orderBy("event_type")
      }))
}
