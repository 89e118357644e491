package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{VectorSim => VS}

/** Fifty-fifth wave: multi-probe LSH — the standard recall-vs-memory trick
  * (Lv et al., VLDB'07): instead of more hash tables, each query ALSO
  * probes the buckets reached by flipping its two lowest-|margin|
  * hyperplane bits (the two planes most likely to have mis-hashed a true
  * neighbor). Candidates stay bucket-equi-join shaped — 3 probe keys per
  * query, never a scan — and the exact-cosine rerank runs only on bucket
  * residents. Same LCG hyperplanes and bit-reproducible dot chains as
  * sim_ann_lsh, so the two queries' results are directly comparable.
  */
object MultiprobeOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    Q("sim_ann_multiprobe",
      Some {
        val dCols = (0 until VS.NumPlanes).map { p =>
          val d = (1 to VS.Dim).map { i =>
            val k = p * VS.Dim + (i - 1)
            s"v[$i] * (CAST((1103515245 * CAST($k AS BIGINT) + 12345) " +
              "% 2147483648 AS DOUBLE) / 2147483648.0 - 0.5)"
          }.mkString(" + ")
          s"($d) AS d$p"
        }.mkString(", ")
        val dCase = (0 until VS.NumPlanes)
          .map(p => s"WHEN $p THEN d$p").mkString(" ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
           |  FROM embeddings),
           |n AS MATERIALIZED (SELECT vec_id, v, (${VS.norm2Sql("v")}) AS nrm,
           |  ${VS.lshBucketSql("v")} AS bucket FROM e),
           |q0 AS MATERIALIZED (SELECT vec_id, v, nrm, bucket, $dCols FROM n
           |  WHERE vec_id < 10),
           |m AS (SELECT vec_id, i,
           |  abs(CASE i $dCase END) AS ad FROM q0,
           |  unnest(range(0, ${VS.NumPlanes})) t(i)),
           |fl AS (SELECT vec_id, i, row_number() OVER
           |  (PARTITION BY vec_id ORDER BY ad, i) AS rn FROM m),
           |pr AS MATERIALIZED (SELECT q0.vec_id AS qid, q0.v AS qv, q0.nrm AS qn,
           |    q0.bucket AS probe FROM q0
           |  UNION ALL
           |  SELECT q0.vec_id, q0.v, q0.nrm,
           |    substr(q0.bucket, 1, fl.i) ||
           |    (CASE WHEN substr(q0.bucket, fl.i + 1, 1) = '1'
           |      THEN '0' ELSE '1' END) ||
           |    substr(q0.bucket, fl.i + 2, ${VS.NumPlanes})
           |  FROM q0 JOIN fl ON fl.vec_id = q0.vec_id AND fl.rn <= 2),
           |cand AS (SELECT DISTINCT pr.qid, pr.qv, pr.qn,
           |  c.vec_id AS vid, c.v AS cv, c.nrm AS cn
           |  FROM pr JOIN n c ON c.bucket = pr.probe
           |    AND c.vec_id <> pr.qid),
           |s AS (SELECT qid, vid,
           |  (${VS.dotSql("qv", "cv")}) / (sqrt(qn) * sqrt(cn)) AS sim
           |  FROM cand),
           |r AS (SELECT qid, vid, sim, CAST(row_number() OVER
           |  (PARTITION BY qid ORDER BY sim DESC, vid) AS BIGINT) AS rnk
           |  FROM s)
           |SELECT qid, vid, rnk, sim FROM r WHERE rnk <= 3
           |ORDER BY qid, rnk
           |""".stripMargin
      },
      (s, dir) => {
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>")
            .as("v"))
        val n = e
          .withColumn("nrm", VS.norm2("v"))
          .withColumn("bucket", VS.lshBucket("v"))
          .localCheckpoint() // queries + corpus side of the probe join
        val dArr = array((0 until VS.NumPlanes).map { p =>
          (1 to VS.Dim).map(i =>
            element_at(col("v"), i) * lit(VS.coef(p, i - 1)))
            .reduce(_ + _)
        }: _*)
        val q0 = n.filter(col("vec_id") < 10)
          .withColumn("ds", dArr)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("nrm").as("qn"), col("bucket"), col("ds"))
          .localCheckpoint() // exact probe + the two flip probes
        val wfl = Window.partitionBy("qid").orderBy("ad", "i")
        val flips = q0
          .select(col("qid"), col("qv"), col("qn"), col("bucket"),
            posexplode(col("ds")).as(Seq("i", "d")))
          .withColumn("ad", abs(col("d")))
          .withColumn("rn", row_number().over(wfl))
          .filter(col("rn") <= 2)
          .select(col("qid"), col("qv"), col("qn"),
            expr("concat(substring(bucket, 1, i), " +
              "CASE WHEN substring(bucket, i + 1, 1) = '1' THEN '0' " +
              s"ELSE '1' END, substring(bucket, i + 2, ${VS.NumPlanes}))")
              .as("probe"))
        val pr = q0.select(col("qid"), col("qv"), col("qn"),
            col("bucket").as("probe"))
          .unionAll(flips)
        val cand = pr
          .join(n.select(col("vec_id").as("vid"), col("v").as("cv"),
            col("nrm").as("cn"), col("bucket").as("cb")),
            col("cb") === col("probe") && col("vid") =!= col("qid"))
          .select("qid", "qv", "qn", "vid", "cv", "cn")
          .distinct()
        val wr = Window.partitionBy("qid").orderBy(col("sim").desc,
          col("vid"))
        val out = cand
          .withColumn("sim",
            VS.dot("qv", "cv") / (sqrt(col("qn")) * sqrt(col("cn"))))
          .withColumn("rnk", row_number().over(wr).cast("long"))
          .filter(col("rnk") <= 3)
          .select("qid", "vid", "rnk", "sim")
          .orderBy("qid", "rnk")
        H.materialized(out, caches = Nil, checkpoints = Seq(n, q0))
      }))
}
