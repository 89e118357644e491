package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{VectorSim => VS}

/** Round-10 wave 156: the MIPS→cosine reduction (Bachrach et al. 2014) —
  * the standard serving-path transform that turns maximum-inner-product
  * search into cosine search so the whole LSH/IVF stack (built for
  * angular metrics) can serve dot-product models: every corpus vector
  * gains one coordinate sqrt(M² − |x|²) (M = max corpus norm), queries
  * gain a zero — inner products are preserved while all corpus vectors
  * land on a sphere. The eval runs BOTH retrievals and lands the
  * rank-preservation as data.
  */
object MipsAugmentOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // MIPS AUGMENTATION EVAL: top-3 by raw inner product vs top-3 by
    // cosine over the augmented vectors, per query (vec_id < 10). The
    // augmented cosine is computed the honest way — the extra coordinate
    // is materialized (aug = sqrt(M² − |x|²)) and enters the norm as
    // aug·aug — in the SAME left-assoc accumulation order in both
    // engines, so the doubles are bit-identical. agree pins the
    // reduction's guarantee (rank lists coincide, ties broken by vid).
    // Scale shape: one norm pass + a broadcast scalar max + a 10-query
    // broadcast sweep — the exact-baseline shape of sim_cosine_topk; the
    // production path feeds the augmented vectors to the LSH/IVF heads.
    Q("sim_mips_augment",
      Some("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        s"n AS MATERIALIZED (SELECT vec_id, v, (${VS.norm2Sql("v")}) AS n2 FROM e), " +
        "mx AS (SELECT max(n2) AS m2 FROM n), " +
        "c AS MATERIALIZED (SELECT vec_id, v, n2, " +
        "sqrt(greatest(mx.m2 - n2, 0)) AS aug FROM n CROSS JOIN mx), " +
        "q AS MATERIALIZED (SELECT vec_id AS qid, v AS qv, n2 AS qn2 " +
        "FROM n WHERE vec_id < 10), " +
        "p AS (SELECT q.qid, c.vec_id AS vid, " +
        s"(${VS.dotSql("q.qv", "c.v")}) AS dot, " +
        s"(${VS.dotSql("q.qv", "c.v")}) / (sqrt(q.qn2 + 0.0 * 0.0) " +
        "* sqrt(c.n2 + c.aug * c.aug)) AS aug_cos " +
        "FROM q CROSS JOIN c WHERE c.vec_id <> q.qid), " +
        "r AS (SELECT qid, vid, dot, aug_cos, " +
        "CAST(row_number() OVER (PARTITION BY qid " +
        "ORDER BY dot DESC, vid) AS BIGINT) AS rnk_dot, " +
        "CAST(row_number() OVER (PARTITION BY qid " +
        "ORDER BY aug_cos DESC, vid) AS BIGINT) AS rnk_aug FROM p), " +
        "md AS (SELECT qid, rnk_dot AS rnk, vid AS vid_dot, dot " +
        "FROM r WHERE rnk_dot <= 3), " +
        "ma AS (SELECT qid, rnk_aug AS rnk, vid AS vid_aug, aug_cos " +
        "FROM r WHERE rnk_aug <= 3) " +
        "SELECT md.qid, md.rnk, md.vid_dot, ma.vid_aug, md.dot, ma.aug_cos, " +
        "CAST(md.vid_dot = ma.vid_aug AS INTEGER) AS agree " +
        "FROM md JOIN ma ON ma.qid = md.qid AND ma.rnk = md.rnk " +
        "ORDER BY md.qid, md.rnk"),
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val n = e.withColumn("n2", VS.norm2("v"))
          .localCheckpoint() // max pass + corpus side + query side read it
        val mx = n.agg(max("n2").as("m2"))
        val c = n.crossJoin(broadcast(mx))
          .select(col("vec_id").as("vid"), col("v").as("cv"), col("n2"),
            sqrt(greatest(col("m2") - col("n2"), lit(0d))).as("aug"))
        val q = n.select(col("vec_id").as("qid"), col("v").as("qv"),
          col("n2").as("qn2")).filter(col("qid") < 10)
        val p = c.join(broadcast(q), col("vid") =!= col("qid"))
          .withColumn("dot", VS.dot("qv", "cv"))
          .withColumn("aug_cos", col("dot") /
            (sqrt(col("qn2") + lit(0d) * lit(0d)) *
              sqrt(col("n2") + col("aug") * col("aug"))))
          .select("qid", "vid", "dot", "aug_cos")
          .localCheckpoint() // both rankings read it
        val r = p
          .withColumn("rnk_dot", row_number().over(Window.partitionBy("qid")
            .orderBy(col("dot").desc, col("vid"))).cast("long"))
          .withColumn("rnk_aug", row_number().over(Window.partitionBy("qid")
            .orderBy(col("aug_cos").desc, col("vid"))).cast("long"))
        val md = r.filter(col("rnk_dot") <= 3)
          .select(col("qid"), col("rnk_dot").as("rnk"),
            col("vid").as("vid_dot"), col("dot"))
        val ma = r.filter(col("rnk_aug") <= 3)
          .select(col("qid").as("qid2"), col("rnk_aug").as("rnk2"),
            col("vid").as("vid_aug"), col("aug_cos"))
        val out = md.join(ma,
            col("qid2") === col("qid") && col("rnk2") === col("rnk"))
          .select(col("qid"), col("rnk"), col("vid_dot"), col("vid_aug"),
            col("dot"), col("aug_cos"),
            (col("vid_dot") === col("vid_aug")).cast("int").as("agree"))
          .orderBy("qid", "rnk")
        H.materialized(out, caches = Nil, checkpoints = Seq(n, p))
      })
  )
}
