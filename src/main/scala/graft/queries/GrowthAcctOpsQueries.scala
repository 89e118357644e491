package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{DedupSketches => DS}

/** Hundred-thirteenth wave: growth accounting, stratified inference,
  * and dedup methodology — the monthly customer growth ledger
  * (new / retained / resurrected / churned, the four flows that BY
  * IDENTITY sum to the MAU delta), the Mantel-Haenszel pooled odds
  * ratio (does priority predict returns AFTER stratifying by
  * segment?), and a head-to-head of candidate generators (MinHash-LSH
  * vs rare-shingle anchors: sizes, overlap, and verified precision of
  * each — measured, not argued).
  *
  * Exactness: growth flows are set cardinalities from one
  * (customer, month) frame; MH terms quantize per stratum to micro
  * before the ratio; candidate precision verifies exact Jaccard on the
  * UNION of both candidate sets, so neither generator is judged by the
  * other's blind spots.
  */
object GrowthAcctOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Growth accounting: per month, customers who are new (first-ever
    // month), retained (also active last month), resurrected (active,
    // gap > 1 month), churned (active last month, absent now) — and
    // the identity MAU_t = MAU_{t-1} + new + resurrected − churned
    // checked as a column. One (customer, month) frame, one lag
    // window partitioned by customer, one keyed rollup.
    Q("orders_growth_accounting",
      Some(
        """WITH cm AS (SELECT DISTINCT o_custkey AS ck,
          |  year(o_orderdate)*12 + month(o_orderdate) - 1 AS ym
          |  FROM orders),
          |f AS (SELECT ck, ym,
          |  lag(ym) OVER (PARTITION BY ck ORDER BY ym) AS prev
          |  FROM cm),
          |cls AS (SELECT ym,
          |  CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END)
          |    AS BIGINT) AS new_c,
          |  CAST(sum(CASE WHEN prev = ym - 1 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS retained,
          |  CAST(sum(CASE WHEN prev IS NOT NULL AND prev < ym - 1
          |    THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
          |  FROM f GROUP BY 1),
          |mau AS (SELECT ym, CAST(count(*) AS BIGINT) AS mau FROM cm
          |  GROUP BY 1),
          |ch AS (SELECT a.ym + 1 AS ym, CAST(count(*) AS BIGINT)
          |    AS churned
          |  FROM cm a LEFT JOIN cm b ON b.ck = a.ck
          |    AND b.ym = a.ym + 1
          |  WHERE b.ck IS NULL GROUP BY 1)
          |SELECT CAST(m.ym // 12 AS BIGINT) AS yr,
          |  CAST(m.ym % 12 + 1 AS BIGINT) AS mon, m.mau,
          |  cls.new_c AS new_customers, cls.retained, cls.resurrected,
          |  CAST(coalesce(ch.churned, 0) AS BIGINT) AS churned,
          |  CAST(CASE WHEN lag(m.mau) OVER (ORDER BY m.ym) IS NULL
          |    THEN 1
          |    WHEN m.mau = lag(m.mau) OVER (ORDER BY m.ym) + cls.new_c
          |      + cls.resurrected - coalesce(ch.churned, 0) THEN 1
          |    ELSE 0 END AS BIGINT) AS identity_holds
          |FROM mau m JOIN cls ON cls.ym = m.ym
          |LEFT JOIN ch ON ch.ym = m.ym ORDER BY 1, 2
          |""".stripMargin),
      (s, dir) => {
        val cm = tbl(s, dir, "orders")
          .select(col("o_custkey").as("ck"),
            (year(col("o_orderdate")) * 12 +
              month(col("o_orderdate")) - 1).as("ym"))
          .distinct()
          .localCheckpoint()
        val f = cm.withColumn("prev",
          lag("ym", 1).over(Window.partitionBy("ck").orderBy("ym")))
        val cls = f.groupBy("ym")
          .agg(sum(when(col("prev").isNull, 1L).otherwise(0L))
              .cast("long").as("new_c"),
            sum(when(col("prev") === col("ym") - 1, 1L).otherwise(0L))
              .cast("long").as("retained"),
            sum(when(col("prev").isNotNull &&
              col("prev") < col("ym") - 1, 1L).otherwise(0L))
              .cast("long").as("resurrected"))
        val mau = cm.groupBy("ym")
          .agg(count(lit(1)).cast("long").as("mau"))
        val ch = cm.as("a")
          .join(cm.as("b"), col("b.ck") === col("a.ck") &&
            col("b.ym") === col("a.ym") + 1, "left_anti")
          .groupBy((col("ym") + 1).as("ym"))
          .agg(count(lit(1)).cast("long").as("churned"))
        val j = mau.join(cls, Seq("ym"))
          .join(ch, Seq("ym"), "left")
          .withColumn("churned",
            coalesce(col("churned"), lit(0L)).cast("long"))
        val wm = Window.orderBy("ym")
        j.withColumn("prev_mau", lag("mau", 1).over(wm))
          .select(expr("ym div 12").cast("long").as("yr"),
            (col("ym") % 12 + 1).cast("long").as("mon"), col("mau"),
            col("new_c").as("new_customers"), col("retained"),
            col("resurrected"), col("churned"),
            when(col("prev_mau").isNull, 1L)
              .when(col("mau") === col("prev_mau") + col("new_c") +
                col("resurrected") - col("churned"), 1L)
              .otherwise(0L).cast("long").as("identity_holds"))
          .orderBy("yr", "mon")
      }),

    // Mantel-Haenszel pooled odds ratio: urgent-priority vs returned-
    // order odds, stratified by customer segment so segment mix can't
    // confound the answer. Per-stratum 2×2 counts are exact; the MH
    // terms a·d/n and b·c/n quantize to micro per stratum BEFORE the
    // ratio — the epidemiology-grade stratified estimate, on retail
    // facts.
    Q("stats_mantel_haenszel",
      Some(
        """WITH lab AS (SELECT l_orderkey AS ok,
          |  max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
          |  FROM lineitem GROUP BY 1),
          |b AS (SELECT c.c_mktsegment AS seg,
          |  CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
          |    AS urg, lab.ret
          |  FROM orders o JOIN lab ON lab.ok = o.o_orderkey
          |  JOIN customer c ON c.c_custkey = o.o_custkey),
          |s AS (SELECT seg,
          |  CAST(sum(CASE WHEN urg = 1 AND ret = 1 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS a,
          |  CAST(sum(CASE WHEN urg = 1 AND ret = 0 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS bb,
          |  CAST(sum(CASE WHEN urg = 0 AND ret = 1 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS cc,
          |  CAST(sum(CASE WHEN urg = 0 AND ret = 0 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS d
          |  FROM b GROUP BY 1),
          |t AS (SELECT
          |  CAST(sum(CAST(a AS HUGEINT) * d * 1000000
          |    // (a + bb + cc + d)) AS BIGINT) AS num_micro,
          |  CAST(sum(CAST(bb AS HUGEINT) * cc * 1000000
          |    // (a + bb + cc + d)) AS BIGINT) AS den_micro,
          |  CAST(count(*) AS BIGINT) AS strata FROM s)
          |SELECT strata, num_micro, den_micro,
          |  CAST(CAST(num_micro AS HUGEINT) * 1000000 // den_micro
          |    AS BIGINT) AS mh_odds_ratio_micro
          |FROM t
          |""".stripMargin),
      (s, dir) => {
        val lab = tbl(s, dir, "lineitem")
          .groupBy(col("l_orderkey").as("ok"))
          .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0))
            .as("ret"))
        val b = tbl(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)
              .as("urg"))
          .join(lab, col("ok") === col("o_orderkey"))
          .join(broadcast(tbl(s, dir, "customer")
              .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
            col("o_custkey") === col("c_custkey"))
        val st = b.groupBy("seg")
          .agg(sum(when(col("urg") === 1 && col("ret") === 1, 1L)
              .otherwise(0L)).cast("long").as("a"),
            sum(when(col("urg") === 1 && col("ret") === 0, 1L)
              .otherwise(0L)).cast("long").as("bb"),
            sum(when(col("urg") === 0 && col("ret") === 1, 1L)
              .otherwise(0L)).cast("long").as("cc"),
            sum(when(col("urg") === 0 && col("ret") === 0, 1L)
              .otherwise(0L)).cast("long").as("d"))
        st.agg(
            sum(expr("CAST(a AS DECIMAL(38,0)) * d * 1000000" +
              " div (a + bb + cc + d)")).cast("long").as("num_micro"),
            sum(expr("CAST(bb AS DECIMAL(38,0)) * cc * 1000000" +
              " div (a + bb + cc + d)")).cast("long").as("den_micro"),
            count(lit(1)).cast("long").as("strata"))
          .select(col("strata"), col("num_micro"), col("den_micro"),
            expr("CAST(CAST(num_micro AS DECIMAL(38,0)) * 1000000" +
              " div den_micro AS BIGINT)").as("mh_odds_ratio_micro"))
      }),

    // Candidate-generator face-off: MinHash-LSH band pairs vs
    // rare-shingle anchor pairs (shingles with df ≤ 3 propose their
    // doc pairs). Sizes, overlap, and — verifying exact Jaccard on the
    // UNION — each generator's precision at θ=0.5 and the true pairs
    // only IT found. The measured answer to "do we even need MinHash
    // here", priced on the real corpus.
    Q("dedup_candidate_gen_compare",
      Some {
        s"WITH sh AS (${DS.shinglesSql(3)}), " +
          s"sig AS (${DS.minhashSignatureSql}), " +
          s"bands AS (${DS.lshBandsSql}), " +
          "lsh AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
          "FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key " +
          "AND a.doc_id < b.doc_id), " +
          "rare AS (SELECT shingle FROM sh GROUP BY 1 " +
          "HAVING count(DISTINCT doc_id) BETWEEN 2 AND 3), " +
          "anc AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
          "FROM sh a JOIN rare r ON r.shingle = a.shingle " +
          "JOIN sh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id), " +
          "uni AS (SELECT doc_a, doc_b FROM lsh " +
          "UNION SELECT doc_a, doc_b FROM anc), " +
          "counts AS (SELECT doc_id, n FROM sig), " +
          "inter AS (SELECT u.doc_a, u.doc_b, count(*) AS ni FROM uni u " +
          "JOIN sh sa ON sa.doc_id = u.doc_a " +
          "JOIN sh sb ON sb.doc_id = u.doc_b AND sb.shingle = sa.shingle " +
          "GROUP BY 1, 2), " +
          "j AS (SELECT u.doc_a, u.doc_b, " +
          "CAST(coalesce(i.ni, 0) AS DOUBLE) / " +
          "CAST(ca.n + cb.n - coalesce(i.ni, 0) AS DOUBLE) >= 0.5 AS hit " +
          "FROM uni u JOIN counts ca ON ca.doc_id = u.doc_a " +
          "JOIN counts cb ON cb.doc_id = u.doc_b " +
          "LEFT JOIN inter i ON i.doc_a = u.doc_a AND i.doc_b = u.doc_b), " +
          "m AS (SELECT j.doc_a, j.doc_b, j.hit, " +
          "CASE WHEN l.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_lsh, " +
          "CASE WHEN an.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_anc " +
          "FROM j LEFT JOIN lsh l ON l.doc_a = j.doc_a AND l.doc_b = j.doc_b " +
          "LEFT JOIN anc an ON an.doc_a = j.doc_a AND an.doc_b = j.doc_b) " +
          "SELECT CAST(sum(in_lsh) AS BIGINT) AS lsh_pairs, " +
          "CAST(sum(in_anc) AS BIGINT) AS anchor_pairs, " +
          "CAST(sum(in_lsh * in_anc) AS BIGINT) AS both_pairs, " +
          "CAST(sum(CASE WHEN hit AND in_lsh = 1 THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS lsh_true, " +
          "CAST(sum(CASE WHEN hit AND in_anc = 1 THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS anchor_true, " +
          "CAST(sum(CASE WHEN hit AND in_lsh = 1 AND in_anc = 0 THEN 1 " +
          "ELSE 0 END) AS BIGINT) AS only_lsh_true, " +
          "CAST(sum(CASE WHEN hit AND in_anc = 1 AND in_lsh = 0 THEN 1 " +
          "ELSE 0 END) AS BIGINT) AS only_anchor_true FROM m"
      },
      (s, dir) => {
        val sh = DS.shingles(tbl(s, dir, "documents"), 3).cache()
        val sig = DS.minhashSignature(sh).cache()
        // r10 slope fix (6.2×/decade → the q21 treatment): membership flags
        // ride the UNION into one (doc_a, doc_b) groupBy instead of the old
        // uni-distinct + two post-verification pair-frame re-joins against
        // checkpointed lsh/anc copies — the pair list is shuffled ONCE to
        // dedup-and-tag, and each generator leg streams into it
        // un-checkpointed (each is now referenced exactly once). Same
        // membership algebra: max(flag) over the union == the old left-join
        // null test.
        val lsh = DS.lshBands(sig)
          .select(col("band"), col("key"), col("doc_id").as("doc_a"))
          .join(DS.lshBands(sig)
            .select(col("band"), col("key"), col("doc_id").as("doc_b")),
            Seq("band", "key"))
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            lit(1).as("fl"), lit(0).as("fa"))
        val rare = sh.groupBy("shingle")
          .agg(countDistinct(col("doc_id")).as("df"))
          .filter(col("df").between(2, 3)).select("shingle")
        val anc = sh.join(rare, Seq("shingle"))
          .select(col("shingle"), col("doc_id").as("doc_a"))
          .join(sh.select(col("shingle"), col("doc_id").as("doc_b")),
            Seq("shingle"))
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            lit(0).as("fl"), lit(1).as("fa"))
        // checkpointed: referenced twice inside verifiedJaccard (the same
        // contract as cand in dedup_minhash_lsh)
        val tagged = lsh.unionByName(anc)
          .groupBy("doc_a", "doc_b")
          .agg(max(col("fl")).as("in_lsh"), max(col("fa")).as("in_anc"))
          .localCheckpoint()
        val m = DS.verifiedJaccard(tagged, sh,
            Some(sig.select(col("doc_id"), col("n"))))
          .select((col("jaccard") >= 0.5d).as("hit"),
            col("in_lsh"), col("in_anc"))
        val out = m.agg(
          sum(col("in_lsh")).cast("long").as("lsh_pairs"),
          sum(col("in_anc")).cast("long").as("anchor_pairs"),
          sum(col("in_lsh") * col("in_anc")).cast("long")
            .as("both_pairs"),
          sum(when(col("hit") && col("in_lsh") === 1, 1L).otherwise(0L))
            .cast("long").as("lsh_true"),
          sum(when(col("hit") && col("in_anc") === 1, 1L).otherwise(0L))
            .cast("long").as("anchor_true"),
          sum(when(col("hit") && col("in_lsh") === 1 &&
            col("in_anc") === 0, 1L).otherwise(0L)).cast("long")
            .as("only_lsh_true"),
          sum(when(col("hit") && col("in_anc") === 1 &&
            col("in_lsh") === 0, 1L).otherwise(0L)).cast("long")
            .as("only_anchor_true"))
        H.materialized(out, caches = Seq(sh, sig),
          checkpoints = Seq(tagged))
      })
  )
}
