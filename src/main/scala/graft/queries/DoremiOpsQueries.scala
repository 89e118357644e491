package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-11 wave 163: a DoReMi-style domain-reweighting step (Xie et
  * al. 2023's mirror descent on per-domain excess loss — the
  * mixture-optimization sibling of mix_temperature/select_dsir).
  * (Parquet file bloom indexes are already covered by
  * CostingOpsQueries.source_parquet_bloom.)
  */
object DoremiOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // DOREMI REWEIGHTING STEP: one mirror-descent update of the domain
    // mixture from per-domain excess loss — w'_i ∝ exp(η·e_i), e_i the
    // domain's deviation from the corpus mean of a deterministic
    // per-doc loss proxy (n_chars mod 997; the OPERATOR under test is
    // the reweighting machinery, the proxy stands in for a reference-
    // model loss). Each exp is micro-quantized to an integer BEFORE the
    // normalization sum (bounded domain, order-free integer arithmetic —
    // a raw double Σexp would be partial-order-dependent). One fact
    // reduce onto the bounded source domain; everything after is
    // domain-sized.
    Q("mix_doremi_step",
      Some(
        """WITH d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          |    CAST(sum(n_chars % 997) AS BIGINT) AS s
          |  FROM documents GROUP BY 1),
          |t AS (SELECT CAST(sum(s) AS BIGINT) AS st,
          |    CAST(sum(n_docs) AS BIGINT) AS nt,
          |    CAST(count(*) AS BIGINT) AS k FROM d),
          |e AS (SELECT d.source, d.n_docs,
          |    s * 1000 // n_docs - t.st * 1000 // t.nt AS excess_milli,
          |    t.k FROM d CROSS JOIN t),
          |q AS (SELECT source, n_docs, excess_milli, k,
          |    CAST(floor(exp(CAST(excess_milli AS DOUBLE) / 100000.0)
          |      * 1000000000.0) AS BIGINT) AS qexp FROM e),
          |z AS (SELECT CAST(sum(qexp) AS BIGINT) AS zq FROM q)
          |SELECT q.source, q.n_docs, q.excess_milli,
          |  CAST(CAST(q.qexp AS HUGEINT) * 1000000 // z.zq AS BIGINT)
          |    AS weight_micro,
          |  1000000 // q.k AS uniform_micro
          |FROM q CROSS JOIN z ORDER BY q.source
          |""".stripMargin),
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(expr("n_chars % 997")).cast("long").as("s"))
        val t = d.agg(sum("s").cast("long").as("st"),
          sum("n_docs").cast("long").as("nt"),
          count(lit(1)).cast("long").as("k"))
        val q = d.crossJoin(broadcast(t))
          .select(col("source"), col("n_docs"), col("k"),
            expr("s * 1000 div n_docs - st * 1000 div nt").as("excess_milli"))
          .withColumn("qexp",
            expr("CAST(floor(exp(CAST(excess_milli AS DOUBLE) / 100000.0)" +
              " * 1000000000.0) AS BIGINT)"))
        val z = q.agg(sum("qexp").cast("long").as("zq"))
        q.crossJoin(broadcast(z))
          .select(col("source"), col("n_docs"), col("excess_milli"),
            expr("CAST(CAST(qexp AS DECIMAL(38,0)) * 1000000 div zq AS BIGINT)")
              .as("weight_micro"),
            expr("1000000 div k").as("uniform_micro"))
          .orderBy("source")
      })
  )
}
