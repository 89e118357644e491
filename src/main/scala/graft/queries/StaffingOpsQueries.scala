package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Hundred-fifth wave: capacity planning and dependence measures — the
  * Erlang-B blocking curve for the observed peak load (the classic
  * staffing table, computed by the 20-step unrolled recurrence whose
  * SQL both engines run verbatim), mutual information between language
  * and source (is the corpus mix factorized or entangled?), and
  * supplier revenue concentration (CR1/CR4/CR8).
  *
  * Exactness: the Erlang recurrence is one shared IEEE chain — floors
  * apply only to the EMITTED per-step values, never feed back; MI and
  * entropy terms floor to micro per cell pre-sum; CR shares are
  * integer cross-multiplied bps.
  */
object StaffingOpsQueries extends QueryModule {

  /** Erlang-B recurrence B(k) = a·B(k−1)/(k + a·B(k−1)) unrolled to
    * 20 servers, emitted per step — identical SQL text for both
    * engines (pure float arithmetic, no integer division). `eload`
    * must provide one row (a DOUBLE offered-load column named a). */
  private val ErlangSteps = 20
  private def erlangSql: String = {
    val stages = (1 to ErlangSteps).map { k =>
      s"b$k AS (SELECT a, (a * b) / ($k.0 + a * b) AS b FROM b${k - 1})"
    }.mkString(",\n")
    val fin = (1 to ErlangSteps).map { k =>
      s"SELECT $k AS servers, b FROM b$k"
    }.mkString(" UNION ALL ")
    s"""b0 AS (SELECT a, 1.0 AS b FROM eload),
       |$stages,
       |curve AS ($fin)
       |SELECT CAST(servers AS BIGINT) AS servers,
       |  CAST(floor(b * 1000000.0) AS BIGINT) AS blocking_micro,
       |  CAST(CASE WHEN b <= 0.05 THEN 1 ELSE 0 END AS BIGINT)
       |    AS meets_5pct_sla
       |FROM curve ORDER BY 1""".stripMargin
  }

  def all: Seq[Q] = Seq(

    // Erlang-B staffing curve: offered load a = peak-hour event count
    // × 5-minute mean handle time (in erlangs), blocking probability
    // for 1..20 servers via the standard recurrence — the capacity
    // table a support/ops team reads off directly. The load reduces
    // from one scan; the 20-step curve is a one-row chain both engines
    // execute identically.
    Q("events_erlang_staffing",
      Some(
        s"""WITH hr AS (SELECT epoch_us(ts) // 3600000000 AS h,
           |  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
           |pk AS (SELECT CAST(max(n) AS BIGINT) AS peak FROM hr),
           |eload AS (SELECT CAST(peak AS DOUBLE) * 5.0 / 60.0 AS a
           |  FROM pk),
           |${erlangSql}
           |""".stripMargin),
      (s, dir) => {
        H.events(s, dir)
          .groupBy(expr("unix_micros(ts) div 3600000000").as("h"))
          .agg(count(lit(1)).cast("long").as("n"))
          .agg(max(col("n")).cast("long").as("peak"))
          .select((col("peak").cast("double") * 5.0d / 60.0d).as("a"))
          .createOrReplaceTempView("eload")
        s.sql("WITH " + erlangSql)
      }),

    // Mutual information of the (lang, source) contingency: how much
    // does knowing the source tell you about the language? MI plus
    // both marginal entropies in micro (every cell/row term floored
    // pre-sum), and the normalized MI/min(H) in milli. Independence ≈
    // a factorized sampler can reproduce the mix; entanglement means
    // stratify jointly. One keyed aggregation; the cell frame is
    // domain-bounded.
    Q("corpus_mi_lang_source",
      Some(
        """WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n
          |  FROM documents GROUP BY 1, 2),
          |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM c),
          |rl AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nl FROM c
          |  GROUP BY 1),
          |rs AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns FROM c
          |  GROUP BY 1),
          |mi AS (SELECT CAST(sum(CAST(floor(
          |    (CAST(c.n AS DOUBLE)/CAST(t.nn AS DOUBLE))
          |    * ln(CAST(c.n AS DOUBLE) * CAST(t.nn AS DOUBLE)
          |      / (CAST(rl.nl AS DOUBLE) * CAST(rs.ns AS DOUBLE)))
          |    * 1000000.0) AS BIGINT)) AS BIGINT) AS mi_micro
          |  FROM c JOIN rl ON rl.lang = c.lang
          |  JOIN rs ON rs.source = c.source, t),
          |hl AS (SELECT CAST(sum(CAST(floor(
          |    -(CAST(nl AS DOUBLE)/CAST(t.nn AS DOUBLE))
          |    * ln(CAST(nl AS DOUBLE)/CAST(t.nn AS DOUBLE))
          |    * 1000000.0) AS BIGINT)) AS BIGINT) AS h_lang_micro
          |  FROM rl, t),
          |hs AS (SELECT CAST(sum(CAST(floor(
          |    -(CAST(ns AS DOUBLE)/CAST(t.nn AS DOUBLE))
          |    * ln(CAST(ns AS DOUBLE)/CAST(t.nn AS DOUBLE))
          |    * 1000000.0) AS BIGINT)) AS BIGINT) AS h_source_micro
          |  FROM rs, t)
          |SELECT t.nn AS n_docs, mi.mi_micro, hl.h_lang_micro,
          |  hs.h_source_micro,
          |  CAST(mi.mi_micro * 1000 // LEAST(hl.h_lang_micro,
          |    hs.h_source_micro) AS BIGINT) AS nmi_milli
          |FROM t, mi, hl, hs
          |""".stripMargin),
      (s, dir) => {
        val c = tbl(s, dir, "documents")
          .groupBy("lang", "source")
          .agg(count(lit(1)).cast("long").as("n"))
          .localCheckpoint()
        val t = c.agg(sum(col("n")).cast("long").as("nn"))
        val rl = c.groupBy("lang").agg(sum(col("n")).cast("long")
          .as("nl"))
        val rs = c.groupBy("source").agg(sum(col("n")).cast("long")
          .as("ns"))
        val mi = c.join(broadcast(rl), Seq("lang"))
          .join(broadcast(rs), Seq("source"))
          .crossJoin(broadcast(t))
          .select(floor((col("n").cast("double") /
            col("nn").cast("double")) *
            log(col("n").cast("double") * col("nn").cast("double") /
              (col("nl").cast("double") * col("ns").cast("double"))) *
            1000000.0d).cast("long").as("term"))
          .agg(sum(col("term")).cast("long").as("mi_micro"))
        def ent(df: org.apache.spark.sql.DataFrame, cnt: String,
            out: String) =
          df.crossJoin(broadcast(t))
            .select(floor((lit(0.0d) - col(cnt).cast("double") /
              col("nn").cast("double")) *
              log(col(cnt).cast("double") / col("nn").cast("double")) *
              1000000.0d).cast("long").as("term"))
            .agg(sum(col("term")).cast("long").as(out))
        val out = t.crossJoin(broadcast(mi))
          .crossJoin(broadcast(ent(rl, "nl", "h_lang_micro")))
          .crossJoin(broadcast(ent(rs, "ns", "h_source_micro")))
          .select(col("nn").as("n_docs"), col("mi_micro"),
            col("h_lang_micro"), col("h_source_micro"),
            expr("mi_micro * 1000 div LEAST(h_lang_micro," +
              " h_source_micro)").cast("long").as("nmi_milli"))
        H.materialized(out, Nil, Seq(c))
      }),

    // Supplier revenue concentration: CR1 / CR4 / CR8 in bps from the
    // top-8 supplier revenues (distributed TopN) against the exact
    // total — the antitrust-style market-structure read that pairs
    // with the HHI. One keyed aggregation + an 8-row ordered take.
    Q("orders_cr_concentration",
      Some(
        """WITH r AS (SELECT l_suppkey,
          |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))
          |    AS BIGINT) AS cents FROM lineitem GROUP BY 1),
          |t AS (SELECT CAST(sum(cents) AS BIGINT) AS tot,
          |  CAST(count(*) AS BIGINT) AS n_suppliers FROM r),
          |top AS (SELECT cents, row_number() OVER (ORDER BY cents DESC,
          |    l_suppkey) AS rk FROM r),
          |cr AS (SELECT
          |  CAST(sum(CASE WHEN rk <= 1 THEN cents ELSE 0 END) AS BIGINT)
          |    AS c1,
          |  CAST(sum(CASE WHEN rk <= 4 THEN cents ELSE 0 END) AS BIGINT)
          |    AS c4,
          |  CAST(sum(CASE WHEN rk <= 8 THEN cents ELSE 0 END) AS BIGINT)
          |    AS c8 FROM top WHERE rk <= 8)
          |SELECT t.n_suppliers, t.tot AS total_cents,
          |  CAST(cr.c1 * 10000 // t.tot AS BIGINT) AS cr1_bps,
          |  CAST(cr.c4 * 10000 // t.tot AS BIGINT) AS cr4_bps,
          |  CAST(cr.c8 * 10000 // t.tot AS BIGINT) AS cr8_bps
          |FROM t, cr
          |""".stripMargin),
      (s, dir) => {
        val r = tbl(s, dir, "lineitem")
          .groupBy("l_suppkey")
          .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5))
            .cast("long")).cast("long").as("cents"))
          .localCheckpoint()
        val t = r.agg(sum(col("cents")).cast("long").as("tot"),
          count(lit(1)).cast("long").as("n_suppliers"))
        val top = r.orderBy(col("cents").desc, col("l_suppkey")).limit(8)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("cents").desc, col("l_suppkey"))))
        val cr = top.agg(
          sum(when(col("rk") <= 1, col("cents")).otherwise(0L))
            .cast("long").as("c1"),
          sum(when(col("rk") <= 4, col("cents")).otherwise(0L))
            .cast("long").as("c4"),
          sum(when(col("rk") <= 8, col("cents")).otherwise(0L))
            .cast("long").as("c8"))
        val out = t.crossJoin(broadcast(cr))
          .select(col("n_suppliers"), col("tot").as("total_cents"),
            expr("c1 * 10000 div tot").cast("long").as("cr1_bps"),
            expr("c4 * 10000 div tot").cast("long").as("cr4_bps"),
            expr("c8 * 10000 div tot").cast("long").as("cr8_bps"))
        H.materialized(out, Nil, Seq(r))
      })
  )
}
