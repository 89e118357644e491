package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for the SemDeDup-style semantic dedup and the IVF-PQ
  * index layout — properties the DuckDB hash compare can't express (drop
  * decisions justified by an in-cell witness; ADC candidates confined to the
  * query's coarse cell).
  */
class AnnDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("dedup_semantic: every drop has an in-cell witness that beats it; keeps have none") {
    import graft.functions.{CustomExpressions => CE}
    val out = SparkEntry.queries("dedup_semantic")(spark, sf).cache()
    val e = H.tbl(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val withV = out.join(e, "vec_id")
    val y = withV.select(col("vec_id").as("y_vid"), col("cell").as("y_cell"),
      col("cent_sim").as("y_cs"), col("v").as("y_v"))
    // witness relation: same cell, cosine >= 0.4, and y "beats" x (farther
    // from the centroid, id as tie-break) — exactly the judged drop rule
    val witnessed = withV.join(y,
        col("cell") === col("y_cell") && col("vec_id") =!= col("y_vid") &&
          CE.cosine_sim(col("v"), col("y_v")) >= 0.4 &&
          (col("cent_sim") > col("y_cs") ||
            (col("cent_sim") === col("y_cs") && col("vec_id") > col("y_vid"))),
        "left_semi")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val decisions = out.select("vec_id", "decision").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(decisions.nonEmpty)
    decisions.foreach { case (vid, dec) =>
      assert((dec == "drop_semantic") == witnessed.contains(vid),
        s"vec $vid decision $dec but witness=${witnessed.contains(vid)}")
    }
    // the fixture plants near-dups, so the operator must actually fire
    assert(decisions.values.exists(_ == "drop_semantic"))
    assert(decisions.values.count(_ == "keep") > decisions.size / 2)
    out.unpersist()
  }

  test("sim_ivfpq_topk: every scored candidate shares the query's coarse cell") {
    import graft.functions.{CustomExpressions => CE}
    import org.apache.spark.sql.expressions.Window
    val out = SparkEntry.queries("sim_ivfpq_topk")(spark, sf)
    val e = H.tbl(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cent = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val aw = Window.partitionBy("vec_id").orderBy(col("ssd"), col("cid"))
    val cellOf = e.join(broadcast(cent))
      .withColumn("ssd", CE.squared_distance(col("v"), col("cv")))
      .withColumn("rn", row_number().over(aw)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qid, vid, rnk) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(cellOf(qid) == cellOf(vid), s"q $qid cell ${cellOf(qid)} scored $vid cell ${cellOf(vid)}")
      assert(rnk >= 1 && rnk <= 3)
      assert(!r.isNullAt(3) && r.getDouble(3) >= 0.0, s"adist must be a non-negative sum of SSDs: $r")
    }
  }
}
