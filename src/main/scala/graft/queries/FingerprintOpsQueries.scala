package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{VectorSim => VS}

/** Thirty-third wave: winnowing fingerprints (the MOSS document-overlap
  * scheme with a detection GUARANTEE), frequent triple mining with
  * order-bounded expansion, exact rolling active-user curves, and
  * binarized-embedding retrieval with its recall audit.
  */
object FingerprintOpsQueries extends QueryModule {

  private val K = 8 // k-gram length
  private val W = 6 // winnowing window (positions per window)

  def all: Seq[Q] = Seq(

    // Winnowing (Schleimer, Wilkerson, Aiken 2003): hash every k-gram,
    // keep the MINIMUM hash of each sliding window of W positions, dedupe
    // — the fingerprint set that GUARANTEES any shared substring of
    // length ≥ W + K − 1 = 13 chars produces a shared fingerprint, while
    // storing ~2/(W+1) of the k-grams. Hashes stay fixed-width lowercase
    // hex (string min ≡ numeric min), the per-window min is one
    // ROWS-frame window over exploded positions, and sharing stats reduce
    // on the fingerprint domain. The positional tie-break of the paper
    // only matters for colliding hashes — md5 makes the fingerprint SET
    // identical without it (documented deviation).
    Q("text_winnowing_fingerprints",
      Some("WITH pos AS (SELECT doc_id, text, " +
        s"unnest(range(1, CAST(length(text) AS BIGINT) - ${K - 2})) AS i " +
        s"FROM documents WHERE length(text) >= $K), " +
        "h AS (SELECT doc_id, i, " +
        s"substr(md5(substr(text, CAST(i AS INTEGER), $K)), 25, 8) AS kh FROM pos), " +
        "wmin AS (SELECT doc_id, min(kh) OVER (PARTITION BY doc_id ORDER BY i " +
        s"ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS fp, " +
        "i, count(*) OVER (PARTITION BY doc_id) AS np FROM h), " +
        s"fp AS (SELECT DISTINCT doc_id, fp FROM wmin WHERE i <= np - ${W - 1}), " +
        "shared AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_docs, " +
        "min(doc_id) AS sample_doc FROM fp GROUP BY fp " +
        "HAVING count(*) >= 2) " +
        "SELECT CAST(row_number() OVER (ORDER BY n_docs DESC, fp) AS BIGINT) AS rnk, " +
        "fp, n_docs, sample_doc FROM shared QUALIFY rnk <= 30 ORDER BY rnk"),
      (s, dir) => {
        // spread: the per-char k-gram md5 chain (~250 hashes/doc) ran in
        // the single scan task (2.5 s, 1 task, 21.7 MB shuffle write —
        // r11 profile); hashing by doc_id also pre-establishes the
        // doc-window's partitioning so its exchange is reused (H.spread)
        val pos = H.spread(tbl(s, dir, "documents"), col("doc_id"))
          .filter(length(col("text")) >= K)
          .select(col("doc_id"),
            explode(expr(s"sequence(1, length(text) - ${K - 1})")).as("i"),
            col("text"))
          .select(col("doc_id"), col("i").cast("long").as("i"),
            expr(s"substring(md5(substring(text, CAST(i AS INT), $K)), 25, 8)").as("kh"))
        val wWin = Window.partitionBy("doc_id").orderBy("i")
          .rowsBetween(Window.currentRow, W - 1)
        val wAll = Window.partitionBy("doc_id")
        val fp = pos
          .withColumn("fp", min("kh").over(wWin))
          .withColumn("np", count(lit(1)).over(wAll))
          .filter(col("i") <= col("np") - (W - 1))
          .select("doc_id", "fp").distinct()
        val shared = fp.groupBy("fp")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            min("doc_id").as("sample_doc"))
          .filter(col("n_docs") >= 2)
        val top = shared.orderBy(col("n_docs").desc, col("fp")).limit(30)
        top.withColumn("rnk", row_number().over(
            Window.orderBy(col("n_docs").desc, col("fp"))).cast("long"))
          .select("rnk", "fp", "n_docs", "sample_doc").orderBy("rnk")
      }),

    // Frequent 3-itemsets over orders: within-order triple expansion is
    // bounded by order size (C(7,3) = 35 max per order — pair/triple
    // volume stays O(|orders|), the property that lets basket mining run
    // flat at 100 TB), support ≥ 2, top-20. The distinct (order, part)
    // frame materializes once for its three self-join consumers.
    Q("mining_frequent_triples",
      Some("WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
        "FROM lineitem), " +
        "tri AS (SELECT a.p AS pa, b.p AS pb, c.p AS pc, " +
        "CAST(count(*) AS BIGINT) AS support " +
        "FROM op a JOIN op b ON b.o = a.o AND b.p > a.p " +
        "JOIN op c ON c.o = a.o AND c.p > b.p " +
        "GROUP BY a.p, b.p, c.p HAVING count(*) >= 2) " +
        "SELECT CAST(row_number() OVER (ORDER BY support DESC, pa, pb, pc) AS BIGINT) AS rnk, " +
        "pa, pb, pc, support FROM tri QUALIFY rnk <= 20 ORDER BY rnk"),
      (s, dir) => {
        val op = tbl(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct().localCheckpoint()
        val tri = op.select(col("o"), col("p").as("pa"))
          .join(op.select(col("o"), col("p").as("pb")), "o")
          .filter(col("pb") > col("pa"))
          .join(op.select(col("o"), col("p").as("pc")), "o")
          .filter(col("pc") > col("pb"))
          .groupBy("pa", "pb", "pc")
          .agg(count(lit(1)).cast("long").as("support"))
          .filter(col("support") >= 2)
        val ord = Window.orderBy(col("support").desc, col("pa"), col("pb"),
          col("pc"))
        val top = tri.orderBy(col("support").desc, col("pa"), col("pb"),
          col("pc")).limit(20)
        H.materialized(
          top.withColumn("rnk", row_number().over(ord).cast("long"))
            .select("rnk", "pa", "pb", "pc", "support").orderBy("rnk"),
          caches = Nil, checkpoints = Seq(op))
      }),

    // Exact rolling DAU/WAU: per day, distinct users that day and in the
    // trailing 7 days. The (day, user) activity frame reduces FIRST (one
    // shuffle over events), then the 30-row day spine broadcasts against
    // it for the trailing-window membership — the engagement-curve shape
    // that scales as O(|events|) + O(days × daily-actives).
    Q("events_rolling_wau",
      Some("WITH act AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, " +
        "user_id FROM events), " +
        "spine AS (SELECT DISTINCT day FROM act), " +
        "joined AS (SELECT s.day AS day, a.day AS aday, a.user_id FROM spine s " +
        "JOIN act a ON a.day <= s.day " +
        "AND a.day >= strftime(CAST(s.day AS DATE) - INTERVAL '6 days', '%Y-%m-%d')) " +
        "SELECT day, " +
        "CAST(count(DISTINCT CASE WHEN aday = day THEN user_id END) AS BIGINT) AS dau, " +
        "CAST(count(DISTINCT user_id) AS BIGINT) AS wau " +
        "FROM joined GROUP BY day ORDER BY day"),
      (s, dir) => {
        // a range-predicate spine join plans a row-at-a-time
        // BroadcastNestedLoopJoin (measured slope 3.4 at k=10); exploding
        // each activity day into the exactly-7 window days it feeds turns
        // the window membership into a codegen'd equi semi-join instead
        val act = H.events(s, dir)
          .select(date_format(col("ts"), "yyyy-MM-dd").as("aday"),
            col("user_id")).distinct().localCheckpoint()
        val spine = act.select(col("aday").as("day")).distinct()
        val exploded = act
          .select(col("aday"), col("user_id"),
            explode(expr("sequence(0, 6)")).as("k"))
          .withColumn("day", date_format(
            expr("date_add(CAST(aday AS DATE), k)"), "yyyy-MM-dd"))
          // drop window days with no activity of their own — the oracle's
          // spine only contains observed days
          .join(broadcast(spine), Seq("day"), "left_semi")
        H.materialized(
          exploded.groupBy("day")
            .agg(countDistinct(when(col("k") === 0,
                col("user_id"))).cast("long").as("dau"),
              countDistinct("user_id").cast("long").as("wau"))
            .orderBy("day"),
          caches = Nil, checkpoints = Seq(act))
      }),

    // Binarized-embedding retrieval: sign-bit codes packed into ONE
    // BIGINT (64 dims → 64 bits — a 32× memory cut vs float32, the
    // standard first rung of embedding compression), Hamming top-10 via
    // popcount(XOR), and the recall audit against exact cosine top-10.
    // Probes broadcast on both sides; codes build in one pass.
    Q("sim_binary_hamming",
      Some("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "n AS (SELECT vec_id, v, " +
        s"(${VS.norm2Sql("v")}) AS nrm, " +
        // dim 63 lands on the sign bit: DuckDB's << rejects 1 << 63, so
        // that one bit adds as the two's-complement constant instead
        "CAST(list_sum(list_transform(range(0, 63), " +
        "d -> CASE WHEN v[d + 1] > 0 THEN (CAST(1 AS BIGINT) << d) ELSE CAST(0 AS BIGINT) END)) " +
        "+ CASE WHEN v[64] > 0 THEN CAST(-9223372036854775807 AS BIGINT) - 1 ELSE 0 END AS BIGINT) AS code " +
        "FROM e), " +
        "q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, code AS qc FROM n WHERE vec_id < 20), " +
        "ex AS (SELECT qid, vid FROM (SELECT q.qid, c.vec_id AS vid, " +
        s"row_number() OVER (PARTITION BY q.qid ORDER BY (${VS.dotSql("q.qv", "c.v")}) / (sqrt(q.qn) * sqrt(c.nrm)) DESC, c.vec_id) AS rnk " +
        "FROM q CROSS JOIN n c WHERE c.vec_id <> q.qid) WHERE rnk <= 10), " +
        "hm AS (SELECT qid, vid, hd FROM (SELECT q.qid, c.vec_id AS vid, " +
        "bit_count(xor(q.qc, c.code)) AS hd, " +
        "row_number() OVER (PARTITION BY q.qid ORDER BY bit_count(xor(q.qc, c.code)), c.vec_id) AS rnk " +
        "FROM q CROSS JOIN n c WHERE c.vec_id <> q.qid) WHERE rnk <= 10), " +
        "hits AS (SELECT e.qid, CAST(count(h.vid) AS BIGINT) AS n_hit " +
        "FROM ex e LEFT JOIN hm h ON h.qid = e.qid AND h.vid = e.vid GROUP BY e.qid), " +
        "dist AS (SELECT qid, CAST(sum(hd) AS BIGINT) AS hd_sum FROM hm GROUP BY qid) " +
        "SELECT h.qid, h.n_hit, d.hd_sum FROM hits h JOIN dist d ON d.qid = h.qid " +
        "ORDER BY h.qid"),
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val n = e.withColumn("code",
            expr("CAST(aggregate(sequence(0, 63), CAST(0 AS BIGINT), " +
              "(acc, d) -> acc + CASE WHEN element_at(v, d + 1) > 0 " +
              "THEN shiftleft(CAST(1 AS BIGINT), d) ELSE CAST(0 AS BIGINT) END) AS BIGINT)"))
          .localCheckpoint()
        val q = n.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("code").as("qc"))
        val cand = n.select(col("vec_id").as("vid"), col("v").as("cv"),
          col("code").as("cc"))
        val exW = Window.partitionBy("qid").orderBy(col("sim").desc, col("vid"))
        val ex = cand.join(broadcast(q), col("vid") =!= col("qid"))
          .withColumn("sim", graft.functions.CustomExpressions
            .cosine_sim(col("qv"), col("cv")))
          .withColumn("rnk", row_number().over(exW))
          .filter(col("rnk") <= 10).select("qid", "vid")
        val hmW = Window.partitionBy("qid").orderBy(col("hd"), col("vid"))
        val hm = cand.join(broadcast(q), col("vid") =!= col("qid"))
          .withColumn("hd", expr("bit_count(qc ^ cc)"))
          .withColumn("rnk", row_number().over(hmW))
          .filter(col("rnk") <= 10).select("qid", "vid", "hd")
        val hits = ex.join(hm.select(col("qid").as("hqid"),
            col("vid").as("hvid")),
            col("qid") === col("hqid") && col("vid") === col("hvid"), "left")
          .groupBy("qid").agg(count(col("hvid")).cast("long").as("n_hit"))
        val dist = hm.groupBy(col("qid").as("dqid"))
          .agg(sum("hd").cast("long").as("hd_sum"))
        H.materialized(
          hits.join(dist, col("qid") === col("dqid"))
            .select(col("qid"), col("n_hit"), col("hd_sum"))
            .orderBy("qid"),
          caches = Nil, checkpoints = Seq(n))
      }))
}
