package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl
import graft.functions.{VectorSim => VS}

/** Round-9 wave 142: two-stage retrieval cascade evaluation (coarse PQ/ADC
  * prefilter → exact re-rank — the serving funnel every vector deployment
  * runs) and parquet row-group footer introspection (the statistics that
  * power zonemap/min-max scan planning, read from the container bytes).
  */
object CascadeFooterOpsQueries extends QueryModule {

  private val Stage1K = 32
  private val FinalK = 5

  def all: Seq[Q] = Seq(

    // TWO-STAGE CASCADE: stage 1 scores every vector with the asymmetric
    // PQ distance (4×16 subspaces, the sim_pq_topk codebook — partial
    // distances come back through single-valued max(CASE) pivots so the
    // double addition order is frozen), keeps the top-32; stage 2 re-ranks
    // those 32 with exact cosine and keeps 5. Both funnel stages are
    // scored against the exact brute-force top-5: recall@5 of raw ADC vs
    // recall@5 after the refine step — the refine recovery is the point
    // of the cascade, and it lands as data. Scale shape: ADC is codebook-
    // sized joins (never raw-vector pairs); the exact leg touches only
    // 32 candidates per query; the brute-force leg is |queries|(10)×N —
    // linear, eval-only.
    Q("sim_two_stage_cascade",
      Some {
        val ssdA = VS.ssdSqlN("a.sv", "c.cv", 16)
        val ssdQ = VS.ssdSqlN("q.sv", "c.cv", 16)
        val dotQV = VS.dotSql("qv.v", "cv.v")
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
          "nrm AS (SELECT vec_id, v, (" + VS.norm2Sql("v") + ") AS nn FROM e), " +
          "subs AS (SELECT vec_id, s.sub, v[s.sub*16+1 : s.sub*16+16] AS sv " +
          "FROM e, (SELECT unnest([0,1,2,3]) AS sub) s), " +
          "cent AS (SELECT sub, vec_id AS cid, sv AS cv FROM subs WHERE vec_id < 8), " +
          "assign AS (SELECT vec_id, sub, cid FROM (" +
          "SELECT a.vec_id, a.sub, c.cid, " +
          s"row_number() OVER (PARTITION BY a.vec_id, a.sub ORDER BY ($ssdA), c.cid) AS rn " +
          "FROM subs a JOIN cent c ON a.sub = c.sub) WHERE rn = 1), " +
          s"dtab AS (SELECT q.vec_id AS qid, c.sub, c.cid, ($ssdQ) AS ssd " +
          "FROM subs q JOIN cent c ON q.sub = c.sub WHERE q.vec_id < 10), " +
          "scores AS (SELECT d.qid, a.vec_id AS vid, " +
          "max(CASE WHEN a.sub = 0 THEN d.ssd END) + max(CASE WHEN a.sub = 1 THEN d.ssd END) " +
          "+ max(CASE WHEN a.sub = 2 THEN d.ssd END) + max(CASE WHEN a.sub = 3 THEN d.ssd END) AS adist " +
          "FROM assign a JOIN dtab d ON a.sub = d.sub AND a.cid = d.cid " +
          "WHERE a.vec_id <> d.qid GROUP BY d.qid, a.vec_id), " +
          "s1 AS (SELECT qid, vid FROM (SELECT qid, vid, row_number() OVER " +
          s"(PARTITION BY qid ORDER BY adist, vid) AS rnk FROM scores) WHERE rnk <= $Stage1K), " +
          "adc5 AS (SELECT qid, vid FROM (SELECT qid, vid, row_number() OVER " +
          s"(PARTITION BY qid ORDER BY adist, vid) AS rnk FROM scores) WHERE rnk <= $FinalK), " +
          "ref AS (SELECT qid, vid FROM (SELECT s1.qid, s1.vid, row_number() OVER " +
          s"(PARTITION BY s1.qid ORDER BY ($dotQV) / (sqrt(qv.nn) * sqrt(cv.nn)) DESC, s1.vid) AS rnk " +
          "FROM s1 JOIN nrm qv ON qv.vec_id = s1.qid JOIN nrm cv ON cv.vec_id = s1.vid) " +
          s"WHERE rnk <= $FinalK), " +
          "ex AS (SELECT qid, vid FROM (SELECT qv.vec_id AS qid, cv.vec_id AS vid, " +
          s"row_number() OVER (PARTITION BY qv.vec_id ORDER BY ($dotQV) / (sqrt(qv.nn) * sqrt(cv.nn)) DESC, cv.vec_id) AS rnk " +
          "FROM nrm qv CROSS JOIN nrm cv WHERE qv.vec_id < 10 AND cv.vec_id <> qv.vec_id) " +
          s"WHERE rnk <= $FinalK) " +
          "SELECT q.qid, " +
          s"CAST((SELECT count(*) FROM s1 WHERE s1.qid = q.qid) AS BIGINT) AS n_stage1, " +
          s"CAST((SELECT count(*) FROM ex JOIN adc5 a ON a.qid = ex.qid AND a.vid = ex.vid WHERE ex.qid = q.qid) * 1000000 // $FinalK AS BIGINT) AS recall_adc_ppm, " +
          s"CAST((SELECT count(*) FROM ex JOIN ref r ON r.qid = ex.qid AND r.vid = ex.vid WHERE ex.qid = q.qid) * 1000000 // $FinalK AS BIGINT) AS recall_cascade_ppm " +
          "FROM (SELECT DISTINCT qid FROM scores) q ORDER BY q.qid"
      },
      (s, dir) => {
        import graft.functions.{CustomExpressions => CE}
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          .localCheckpoint()
        val subs = e.select(col("vec_id"), posexplode(array(
            (0 until 4).map(sb => slice(col("v"), sb * 16 + 1, 16)): _*))
          .as(Seq("sub", "sv")))
        val cent = subs.filter(col("vec_id") < 8)
          .select(col("sub").as("c_sub"), col("vec_id").as("cid"),
            col("sv").as("cv"))
        val aw = Window.partitionBy("vec_id", "sub")
          .orderBy(col("ssd"), col("cid"))
        val assign = subs.join(broadcast(cent), col("sub") === col("c_sub"))
          .withColumn("ssd", CE.squared_distance(col("sv"), col("cv")))
          .withColumn("rn", row_number().over(aw)).filter(col("rn") === 1)
          .select(col("vec_id"), col("sub"), col("cid"))
        val dtab = subs.filter(col("vec_id") < 10)
          .join(broadcast(cent), col("sub") === col("c_sub"))
          .select(col("vec_id").as("qid"), col("sub").as("d_sub"),
            col("cid").as("d_cid"),
            CE.squared_distance(col("sv"), col("cv")).as("ssd"))
        val scores = assign
          .join(broadcast(dtab),
            col("sub") === col("d_sub") && col("cid") === col("d_cid") &&
              col("vec_id") =!= col("qid"))
          .groupBy(col("qid"), col("vec_id").as("vid"))
          .agg((max(when(col("sub") === 0, col("ssd"))) +
            max(when(col("sub") === 1, col("ssd"))) +
            max(when(col("sub") === 2, col("ssd"))) +
            max(when(col("sub") === 3, col("ssd")))).as("adist"))
          .localCheckpoint() // two top-k cuts read it
        val w = Window.partitionBy("qid").orderBy(col("adist"), col("vid"))
        val s1 = scores.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= Stage1K).select("qid", "vid")
        val adc5 = scores.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= FinalK).select("qid", "vid")
        val vecs = e.select(col("vec_id").as("vv"), col("v").as("cvv"))
        val qvecs = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qq"), col("v").as("qvv"))
        val ref = s1.join(broadcast(qvecs), col("qid") === col("qq"))
          .join(vecs, col("vid") === col("vv"))
          .withColumn("sim", CE.cosine_sim(col("qvv"), col("cvv")))
          .select("qid", "vid", "sim")
          .withColumn("rnk", row_number().over(Window.partitionBy("qid")
            .orderBy(col("sim").desc, col("vid"))))
          .filter(col("rnk") <= FinalK).select("qid", "vid")
        val ex = broadcast(qvecs).crossJoin(vecs)
          .filter(col("vv") =!= col("qq"))
          .withColumn("sim", CE.cosine_sim(col("qvv"), col("cvv")))
          .select(col("qq").as("qid"), col("vv").as("vid"), col("sim"))
          .withColumn("rnk", row_number().over(Window.partitionBy("qid")
            .orderBy(col("sim").desc, col("vid"))))
          .filter(col("rnk") <= FinalK).select("qid", "vid")
          .localCheckpoint()
        def recall(a: org.apache.spark.sql.DataFrame, nm: String) =
          ex.join(a.select(col("qid").as("aq"), col("vid").as("av")),
              col("qid") === col("aq") && col("vid") === col("av"))
            .groupBy(col("qid").as(nm + "_q"))
            .agg(count(lit(1)).as(nm))
        val out = scores.select("qid").distinct()
          .join(s1.groupBy(col("qid").as("sq"))
            .agg(count(lit(1)).cast("long").as("n_stage1")),
            col("qid") === col("sq"), "left")
          .join(recall(adc5, "ha"), col("qid") === col("ha_q"), "left")
          .join(recall(ref, "hc"), col("qid") === col("hc_q"), "left")
          .select(col("qid"), coalesce(col("n_stage1"), lit(0L))
              .as("n_stage1"),
            expr(s"CAST(coalesce(ha, 0) * 1000000 div $FinalK AS BIGINT)")
              .as("recall_adc_ppm"),
            expr(s"CAST(coalesce(hc, 0) * 1000000 div $FinalK AS BIGINT)")
              .as("recall_cascade_ppm"))
          .orderBy("qid")
        H.materialized(out, Nil, Seq(e, scores, ex))
      }),

    // PARQUET FOOTER INTROSPECTION: per table, the row-group statistics
    // the scan planner prunes with — group count, row count, and the key
    // column's min/max recovered from the FOOTER BYTES (parquet-hadoop
    // ParquetFileReader on the engine side, never a data scan; DuckDB's
    // parquet_metadata() on the oracle side). This is the mechanism
    // behind layout_zonemap_prune/scan_agg_pushdown made first-class:
    // the audit a layout advisor runs to know what pruning is possible.
    // Metadata-domain by nature (footers only, one per file). ORACLE
    // NOTE: parquet_metadata() needs a literal file path (views don't
    // carry one), so the oracle pins the correctness-gate directory
    // (sf0.01 — the only SF the driver hash-compares at); at other SFs
    // this query gets engine-side verification only.
    Q("source_rowgroup_stats",
      Some {
        val tables = Seq(
          ("customer", "c_custkey"), ("documents", "doc_id"),
          ("embeddings", "vec_id"), ("events", "event_id"),
          ("lineitem", "l_orderkey"), ("nation", "n_nationkey"),
          ("orders", "o_orderkey"), ("part", "p_partkey"),
          ("region", "r_regionkey"), ("supplier", "s_suppkey"))
        tables.map { case (t, k) =>
          s"SELECT '$t' AS table_name, '$k' AS key_column, " +
            "CAST(count(*) AS BIGINT) AS n_row_groups, " +
            "CAST(sum(num_values) AS BIGINT) AS n_rows, " +
            "CAST(min(CAST(stats_min_value AS BIGINT)) AS BIGINT) AS min_key, " +
            "CAST(max(CAST(stats_max_value AS BIGINT)) AS BIGINT) AS max_key " +
            s"FROM parquet_metadata('/root/testdata/sf0.01/$t.parquet') " +
            s"WHERE path_in_schema = '$k'"
        }.mkString(" UNION ALL ") + " ORDER BY table_name"
      },
      (s, dir) => {
        import s.implicits._
        import org.apache.hadoop.fs.Path
        import org.apache.parquet.hadoop.ParquetFileReader
        import org.apache.parquet.hadoop.util.HadoopInputFile
        val conf = s.sparkContext.hadoopConfiguration
        val tables = Seq(
          ("customer", "c_custkey"), ("documents", "doc_id"),
          ("embeddings", "vec_id"), ("events", "event_id"),
          ("lineitem", "l_orderkey"), ("nation", "n_nationkey"),
          ("orders", "o_orderkey"), ("part", "p_partkey"),
          ("region", "r_regionkey"), ("supplier", "s_suppkey"))
        val rows = tables.map { case (t, k) =>
          val root = new Path(s"$dir/$t.parquet")
          val fs = root.getFileSystem(conf)
          val files =
            if (fs.getFileStatus(root).isDirectory)
              fs.listStatus(root).map(_.getPath)
                .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
            else Array(root)
          var groups = 0L; var nRows = 0L
          var minK = Long.MaxValue; var maxK = Long.MinValue
          files.foreach { f =>
            val rd = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
            try {
              val md = rd.getFooter.getBlocks
              md.forEach { blk =>
                groups += 1
                nRows += blk.getRowCount
                blk.getColumns.forEach { cc =>
                  if (cc.getPath.toDotString == k) {
                    val st = cc.getStatistics
                    val mn = st.genericGetMin match {
                      case i: java.lang.Integer => i.longValue()
                      case l: java.lang.Long => l.longValue()
                      case o => o.toString.toLong
                    }
                    val mx = st.genericGetMax match {
                      case i: java.lang.Integer => i.longValue()
                      case l: java.lang.Long => l.longValue()
                      case o => o.toString.toLong
                    }
                    if (mn < minK) minK = mn
                    if (mx > maxK) maxK = mx
                  }
                }
              }
            } finally rd.close()
          }
          (t, k, groups, nRows, minK, maxK)
        }
        rows.toDF("table_name", "key_column", "n_row_groups", "n_rows",
            "min_key", "max_key")
          .orderBy("table_name")
      })
  )
}
