package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Fortieth wave: first-fit-decreasing context packing (the quality
  * upgrade over greedy concatenation), inter-arrival latency profiles,
  * and a BMP codec leg (bottom-up rows + stride padding — the container
  * quirks PNG/GIF/JPEG don't exercise).
  */
object BinPackOpsQueries extends QueryModule {

  private val Cap = 512L // context budget (tokens)

  def all: Seq[Q] = Seq(

    // First-fit-decreasing bin packing per source: sort documents by
    // token budget descending, place each into the FIRST open context
    // with room, else open a new one — the 11/9·OPT-guaranteed upgrade
    // over pack_contexts' greedy cumulative split. Inherently sequential
    // per shard, so it runs as ONE integer fold per source over the
    // sorted item array (the ts_survival_km discipline) — a 100 TB corpus
    // packs each shard independently, exactly this shape. The greedy
    // pack count rides along for the quality comparison.
    Q("pack_bin_ffd",
      Some("WITH RECURSIVE items AS (SELECT source, doc_id, " +
        "1 + (n_chars // 10) AS len, " +
        "row_number() OVER (PARTITION BY source ORDER BY 1 + (n_chars // 10) DESC, doc_id) AS rn " +
        "FROM documents), " +
        "nper AS (SELECT source, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(len) AS BIGINT) AS total_len FROM items GROUP BY source), " +
        "ffd AS (" +
        "  SELECT source, CAST(0 AS BIGINT) AS step, CAST([] AS BIGINT[]) AS caps FROM nper" +
        "  UNION ALL" +
        "  SELECT f.source, f.step + 1, " +
        "    CASE WHEN len(list_filter(range(1, len(f.caps) + 1), " +
        "             j -> f.caps[j] >= i.len)) > 0 " +
        "    THEN list_transform(range(1, len(f.caps) + 1), " +
        "      j -> CASE WHEN j = list_filter(range(1, len(f.caps) + 1), " +
        "             k -> f.caps[k] >= i.len)[1] " +
        s"      THEN f.caps[j] - i.len ELSE f.caps[j] END) " +
        s"    ELSE list_append(f.caps, $Cap - i.len) END " +
        "  FROM ffd f JOIN items i ON i.source = f.source AND i.rn = f.step + 1), " +
        "fin AS (SELECT f.source, f.caps FROM ffd f JOIN nper n " +
        "ON n.source = f.source AND f.step = n.n), " +
        "greedy AS (SELECT source, CAST(max(pack_id) + 1 AS BIGINT) AS greedy_bins FROM (" +
        "  SELECT source, (sum(1 + (n_chars // 10)) OVER (PARTITION BY source " +
        "  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        s"  - (1 + (n_chars // 10))) // $Cap AS pack_id FROM documents) GROUP BY source) " +
        "SELECT f.source, CAST(len(f.caps) AS BIGINT) AS ffd_bins, " +
        "g.greedy_bins, n.total_len, " +
        s"(n.total_len * 1000000) // (len(f.caps) * $Cap) AS util_micro " +
        "FROM fin f JOIN greedy g ON g.source = f.source " +
        "JOIN nper n ON n.source = f.source ORDER BY f.source"),
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val items = docs.select(col("source"), col("doc_id"),
          (lit(1L) + expr("n_chars div 10")).as("len"))
        // ONE fold per source over the length-sorted array: state = open
        // bins' remaining capacities; first-fit via an indexed transform
        val folded = items
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("len").cast("long").as("total_len"),
            expr("array_sort(collect_list(struct(-len AS nl, doc_id, len)))")
              .as("arr")) // sort by len DESC (negated), tie doc_id asc
          .select(col("source"), col("n"), col("total_len"),
            expr(
              "aggregate(arr, CAST(array() AS ARRAY<BIGINT>), (caps, x) -> " +
                "IF(size(filter(transform(caps, (c, j) -> IF(c >= x.len, j, -1)), " +
                "p -> p >= 0)) > 0, " +
                "transform(caps, (c, j) -> IF(j = element_at(" +
                "filter(transform(caps, (c2, j2) -> IF(c2 >= x.len, j2, -1)), " +
                "p -> p >= 0), 1), c - x.len, c)), " +
                s"concat(caps, array($Cap - x.len))))").as("caps"))
        val wSrc = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val greedy = docs
          .withColumn("len", lit(1L) + expr("n_chars div 10"))
          .withColumn("pack_id",
            expr(s"(sum(len) OVER (PARTITION BY source ORDER BY doc_id " +
              s"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - len) div $Cap"))
          .groupBy("source")
          .agg((max("pack_id") + 1).cast("long").as("greedy_bins"))
        folded.join(greedy, "source")
          .select(col("source"), size(col("caps")).cast("long").as("ffd_bins"),
            col("greedy_bins"), col("total_len"),
            expr(s"(total_len * 1000000) div (size(caps) * $Cap)")
              .as("util_micro"))
          .orderBy("source")
      }),

    // Inter-arrival latency profile per event type: exact discrete
    // percentiles (p50/p90/max) of the per-user gap distribution in
    // SECONDS — the ops dashboard for event-stream health. Gaps derive
    // from one lag window per user; percentile_disc picks ACTUAL data
    // points, so the compare path stays integer.
    Q("events_interarrival_profile",
      Some("WITH g AS (SELECT event_type, " +
        "(epoch_us(ts) - epoch_us(prev)) // 1000000 AS gap_s " +
        "FROM (SELECT event_type, ts, lag(ts) OVER " +
        "(PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev " +
        "FROM events) t WHERE prev IS NOT NULL), " +
        // discrete percentiles as explicit rank selection (smallest value
        // at ceil(p·n)) — engine-neutral, no interpolation semantics
        "r AS (SELECT event_type, gap_s, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY gap_s) AS rk, " +
        "count(*) OVER (PARTITION BY event_type) AS n FROM g) " +
        "SELECT event_type, CAST(max(n) AS BIGINT) AS n_gaps, " +
        "CAST(max(CASE WHEN rk = (n + 1) // 2 THEN gap_s END) AS BIGINT) AS p50_s, " +
        "CAST(max(CASE WHEN rk = (9 * n + 9) // 10 THEN gap_s END) AS BIGINT) AS p90_s, " +
        "CAST(max(gap_s) AS BIGINT) AS max_s " +
        "FROM r GROUP BY event_type ORDER BY event_type"),
      (s, dir) => {
        val g = H.events(s, dir)
          .withColumn("prev", lag("ts", 1).over(
            Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")))
          .filter(col("prev").isNotNull)
          .select(col("event_type"),
            expr("(unix_micros(ts) - unix_micros(prev)) div 1000000").as("gap_s"))
        val wT = Window.partitionBy("event_type")
        val r = g
          .withColumn("rk", row_number().over(wT.orderBy("gap_s")))
          .withColumn("n", count(lit(1)).over(wT))
        r.groupBy("event_type")
          .agg(max("n").cast("long").as("n_gaps"),
            max(when(col("rk") === expr("(n + 1) div 2"), col("gap_s")))
              .cast("long").as("p50_s"),
            max(when(col("rk") === expr("(9 * n + 9) div 10"), col("gap_s")))
              .cast("long").as("p90_s"),
            max("gap_s").cast("long").as("max_s"))
          .orderBy("event_type")
      }))
}
