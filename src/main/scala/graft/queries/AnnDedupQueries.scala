package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, QueryModule}
import graft.H.tbl
import graft.functions.{VectorSim => VS}

final case class BandRow(doc_id: Long, band: Int, key: String)
final case class BandOk(doc_id: Long, ok: Boolean)

/** First-writer-wins LSH band-bucket claiming — the keyed state behind
  * streaming near-dup dedup at ingest. State per (band, key) bucket is ONE
  * long (the claiming doc), so total state is bounded by the number of
  * distinct buckets the stream has seen, never by pair counts; a bucket's
  * claim decision inside a micro-batch is min(doc_id), making the run
  * replay-deterministic and batch-oracle-checkable.
  */
final class BandClaimProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, BandRow, BandOk] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig,
    TimerValues, ValueState}
  import org.apache.spark.sql.Encoders
  @transient private var claimant: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    claimant = getHandle.getValueState[Long](
      "claimant", Encoders.scalaLong, TTLConfig.NONE)
  override def handleInputRows(key: String, rows: Iterator[BandRow],
      timerValues: TimerValues): Iterator[BandOk] = {
    val batch = rows.toVector
    val owner =
      if (claimant.exists()) claimant.get()
      else {
        val first = batch.iterator.map(_.doc_id).min
        claimant.update(first)
        first
      }
    batch.iterator.map(r => BandOk(r.doc_id, r.doc_id == owner))
  }
}

/** Third wave of embedding-side corpus operators: semantic (cluster-local)
  * dedup in the SemDeDup shape, the combined IVF-PQ index layout, and
  * streaming near-dup dedup at ingest — the pieces a 100 TB corpus needs
  * beyond the flat/LSH/IVF/PQ primitives that already exist as separate
  * queries.
  */
object AnnDedupQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Semantic dedup, SemDeDup-style (Abbas et al. 2023, arXiv:2303.09540):
    // cluster the corpus, then look for near-duplicate pairs ONLY inside a
    // cluster — pairwise cost is bounded by cluster size, never corpus
    // size, which is the published recipe's whole scale argument (K grows
    // with N so clusters stay small). Within a cluster, any pair with
    // cosine >= 0.4 drops the member CLOSER to the centroid (higher
    // centroid-cosine) — the paper keeps low-centroid-similarity examples
    // to preserve diversity. Tie-break on vec_id keeps the decision total.
    // Plan shape: 8 centroids broadcast against the corpus, one shuffle by
    // vec_id for the argmin window, one shuffle by cell for the
    // within-cluster semi-join; no all-pairs stage anywhere. Production
    // chains emb_kmeans's trained centroids into the same shape; the fixed
    // seed set here keeps the oracle exact.
    Q("dedup_semantic",
      Some {
        val ssd = VS.ssdSql("n.v", "cent.cv")
        val centSim = VS.cosineSql("n.v", "n.nrm", "cent.cv", "cent.cnrm")
        val pairSim = VS.cosineSql("x.v", "x.nrm", "y.v", "y.nrm")
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
          s"n AS (SELECT vec_id, v, (${VS.norm2Sql("v")}) AS nrm FROM e), " +
          "cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n " +
          "WHERE vec_id < 8), " +
          "a AS (SELECT vec_id, v, nrm, cid AS cell, cent_sim FROM (" +
          s"SELECT n.vec_id, n.v, n.nrm, cent.cid, ($centSim) AS cent_sim, " +
          s"row_number() OVER (PARTITION BY n.vec_id ORDER BY ($ssd), cid) AS arn " +
          "FROM n, cent) WHERE arn = 1), " +
          "d AS (SELECT DISTINCT x.vec_id FROM a x JOIN a y " +
          "ON x.cell = y.cell AND x.vec_id <> y.vec_id " +
          s"AND ($pairSim) >= 0.4 " +
          "AND (x.cent_sim > y.cent_sim OR " +
          "(x.cent_sim = y.cent_sim AND x.vec_id > y.vec_id))) " +
          "SELECT a.vec_id, a.cell, a.cent_sim, " +
          "CASE WHEN d.vec_id IS NOT NULL THEN 'drop_semantic' ELSE 'keep' END " +
          "AS decision FROM a LEFT JOIN d ON d.vec_id = a.vec_id " +
          "ORDER BY a.vec_id"
      },
      (s, dir) => {
        import graft.functions.{CustomExpressions => CE}
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val cent = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("v").as("cv"))
        val aw = Window.partitionBy("vec_id").orderBy(col("ssd"), col("cid"))
        val a = e.join(broadcast(cent))
          .withColumn("ssd", CE.squared_distance(col("v"), col("cv")))
          .withColumn("arn", row_number().over(aw)).filter(col("arn") === 1)
          .withColumn("cent_sim", CE.cosine_sim(col("v"), col("cv")))
          .select(col("vec_id"), col("v"), col("cid").as("cell"),
            col("cent_sim"))
          .cache()
        val y = a.select(col("vec_id").as("y_vid"), col("v").as("y_v"),
          col("cell").as("y_cell"), col("cent_sim").as("y_cs"))
        val dropped = a.join(y,
            col("cell") === col("y_cell") && col("vec_id") =!= col("y_vid") &&
              CE.cosine_sim(col("v"), col("y_v")) >= 0.4 &&
              (col("cent_sim") > col("y_cs") ||
                (col("cent_sim") === col("y_cs") &&
                  col("vec_id") > col("y_vid"))),
            "left_semi")
          .select(col("vec_id")).withColumn("is_drop", lit(1))
        graft.H.materialized(
          a.join(dropped, Seq("vec_id"), "left")
            .select(col("vec_id"), col("cell"), col("cent_sim"),
              when(col("is_drop").isNotNull, "drop_semantic")
                .otherwise("keep").as("decision"))
            .orderBy("vec_id"),
          caches = Seq(a))
      }),

    // The combined IVF-PQ layout (the FAISS serving shape for corpora too
    // big for exact residency): vectors route to a coarse cell (IVF), the
    // RESIDUAL v - centroid is product-quantized to 4 subspace codes (PQ),
    // and a query scans only its own cell via an asymmetric-distance table
    // over its residual — per-candidate work is 4 pivoted lookups + a
    // fixed-order add, per-query work follows cell size, and the stored
    // corpus is 4 small ints per vector. Codebooks are the residual
    // subvectors of a deterministic seed slice (vec_id 8..15; the coarse
    // seeds themselves have zero residual, so they can't seed codebooks).
    Q("sim_ivfpq_topk",
      Some {
        val ssdCoarse = VS.ssdSql("n.v", "cent.cv")
        val ssdA = VS.ssdSqlN("s.rv", "cb.cv", 16)
        val ssdQ = VS.ssdSqlN("s.rv", "cb.cv", 16)
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
          "n AS (SELECT vec_id, v FROM e), " +
          "cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8), " +
          "a AS (SELECT vec_id, v, cid AS cell, cv FROM (" +
          "SELECT n.vec_id, n.v, cent.cid, cent.cv, " +
          s"row_number() OVER (PARTITION BY n.vec_id ORDER BY ($ssdCoarse), cid) AS arn " +
          "FROM n, cent) WHERE arn = 1), " +
          "r AS (SELECT vec_id, cell, " +
          "list_transform(range(1, 65), i -> v[i] - cv[i]) AS rv FROM a), " +
          "subs AS (SELECT vec_id, cell, s.sub, " +
          "rv[s.sub*16+1 : s.sub*16+16] AS rv " +
          "FROM r, (SELECT unnest([0,1,2,3]) AS sub) s), " +
          "cb AS (SELECT sub, vec_id AS code, rv AS cv FROM subs " +
          "WHERE vec_id >= 8 AND vec_id < 16), " +
          "enc AS (SELECT vec_id, cell, sub, code FROM (" +
          "SELECT s.vec_id, s.cell, s.sub, cb.code, " +
          s"row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY ($ssdA), cb.code) AS rn " +
          "FROM subs s JOIN cb ON cb.sub = s.sub) WHERE rn = 1), " +
          "dtab AS (SELECT s.vec_id AS qid, s.cell AS qcell, s.sub, cb.code, " +
          s"($ssdQ) AS ssd FROM subs s JOIN cb ON cb.sub = s.sub " +
          "WHERE s.vec_id < 10), " +
          "scores AS (SELECT d.qid, a.vec_id AS vid, " +
          "max(CASE WHEN a.sub = 0 THEN d.ssd END) + " +
          "max(CASE WHEN a.sub = 1 THEN d.ssd END) + " +
          "max(CASE WHEN a.sub = 2 THEN d.ssd END) + " +
          "max(CASE WHEN a.sub = 3 THEN d.ssd END) AS adist " +
          "FROM enc a JOIN dtab d ON a.sub = d.sub AND a.code = d.code " +
          "AND a.cell = d.qcell AND a.vec_id <> d.qid " +
          "GROUP BY d.qid, a.vec_id) " +
          "SELECT qid, vid, CAST(row_number() OVER " +
          "(PARTITION BY qid ORDER BY adist, vid) AS BIGINT) AS rnk, adist " +
          "FROM scores QUALIFY rnk <= 3 ORDER BY qid, rnk"
      },
      (s, dir) => {
        import graft.functions.{CustomExpressions => CE}
        val e = tbl(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val cent = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("v").as("cv"))
        val aw = Window.partitionBy("vec_id").orderBy(col("ssd"), col("cid"))
        // coarse route + residual; the residual subtraction is exact, so
        // both engines see bit-identical rv arrays
        val subs = e.join(broadcast(cent))
          .withColumn("ssd", CE.squared_distance(col("v"), col("cv")))
          .withColumn("arn", row_number().over(aw)).filter(col("arn") === 1)
          .withColumn("rv", zip_with(col("v"), col("cv"), (x, y) => x - y))
          .select(col("vec_id"), col("cid").as("cell"),
            posexplode(array((0 until 4).map(sb =>
              slice(col("rv"), sb * 16 + 1, 16)): _*)).as(Seq("sub", "rv")))
          .cache()
        val cb = subs.filter(col("vec_id") >= 8 && col("vec_id") < 16)
          .select(col("sub").as("c_sub"), col("vec_id").as("code"),
            col("rv").as("cbv"))
        val ew = Window.partitionBy("vec_id", "sub").orderBy(col("essd"), col("code"))
        val enc = subs.join(broadcast(cb), col("sub") === col("c_sub"))
          .withColumn("essd", CE.squared_distance(col("rv"), col("cbv")))
          .withColumn("rn", row_number().over(ew)).filter(col("rn") === 1)
          .select(col("vec_id"), col("cell"), col("sub"), col("code"))
        val dtab = subs.filter(col("vec_id") < 10)
          .join(broadcast(cb), col("sub") === col("c_sub"))
          .select(col("vec_id").as("qid"), col("cell").as("qcell"),
            col("sub").as("d_sub"), col("code").as("d_code"),
            CE.squared_distance(col("rv"), col("cbv")).as("ssd"))
        val w = Window.partitionBy("qid").orderBy(col("adist"), col("vid"))
        graft.H.materialized(
          enc.join(broadcast(dtab),
              col("sub") === col("d_sub") && col("code") === col("d_code") &&
                col("cell") === col("qcell") && col("vec_id") =!= col("qid"))
            .groupBy(col("qid"), col("vec_id").as("vid"))
            .agg((max(when(col("sub") === 0, col("ssd"))) +
              max(when(col("sub") === 1, col("ssd"))) +
              max(when(col("sub") === 2, col("ssd"))) +
              max(when(col("sub") === 3, col("ssd")))).as("adist"))
            .withColumn("rnk", row_number().over(w).cast("long"))
            .filter(col("rnk") <= 3)
            .select("qid", "vid", "rnk", "adist")
            .orderBy("qid", "rnk"),
          caches = Seq(subs))
      }),

    // Streaming near-dup dedup AT INGEST: documents arrive over three
    // micro-batches as pre-sketched LSH band rows; keyed state claims each
    // (band, key) bucket for its first writer, and a document is kept iff
    // it claimed EVERY one of its bands — any already-claimed band means a
    // probable near-duplicate already entered the corpus, so the newcomer
    // drops without ever being paired against it. This is the bounded-state
    // production shape for dedup-at-ingest: state is one long per distinct
    // bucket (not per pair, not per document), per-batch work is one
    // shuffle by bucket key, and the batch LSH family's verified-Jaccard
    // pass remains the offline refinement. Docs too short to shingle have
    // no bands and pass through as keeps.
    Q("stream_dedup_minhash",
      Some {
        import graft.functions.{DedupSketches => DS}
        s"WITH sh AS (${DS.shinglesSql(3)}), " +
          s"sig AS (${DS.minhashSignatureSql}), " +
          s"bands AS (${DS.lshBandsSql}), " +
          "bk AS (SELECT doc_id, band, key, doc_id % 3 AS batch FROM bands), " +
          "cl AS (SELECT band, key, doc_id AS claimant, row_number() OVER " +
          "(PARTITION BY band, key ORDER BY batch, doc_id) AS rn FROM bk), " +
          "own AS (SELECT band, key, claimant FROM cl WHERE rn = 1), " +
          "dec AS (SELECT b.doc_id, count(*) AS n_bands, " +
          "bool_and(o.claimant = b.doc_id) AS all_ok " +
          "FROM bk b JOIN own o ON o.band = b.band AND o.key = b.key " +
          "GROUP BY b.doc_id) " +
          "SELECT d.doc_id, CAST(coalesce(dec.n_bands, 0) AS BIGINT) AS n_bands, " +
          "CASE WHEN dec.all_ok = false THEN 'drop_neardup' ELSE 'keep' END " +
          "AS decision FROM documents d LEFT JOIN dec ON dec.doc_id = d.doc_id " +
          "ORDER BY d.doc_id"
      },
      (s, dir) => {
        import java.nio.file.Files
        import graft.functions.{DedupSketches => DS}
        import graft.streaming.StreamingRefresh
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
        val docs = tbl(s, dir, "documents")
        // sketch batch-side (the sketch is a per-row map-side transform; at
        // ingest it rides the same executor pass that parses the document)
        // materialize the sketch ONCE: the three replay-batch filters each
        // re-ran the whole shingle->minhash->bands pipeline otherwise
        val bands = DS.lshBands(DS.minhashSignature(DS.shingles(docs, 3)))
          .select(col("doc_id"), col("band"),
            col("key").cast("string").as("key")).localCheckpoint()
        val tmp = graft.H.tmpDir("graft_sminhash")
        val in = s"$tmp/in"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
        WindowingQueries.writeReplay(
          (0 until 3).map(i => bands.filter(pmod(col("doc_id"), lit(3)) === i)),
          tmp, in)
        graft.H.freeLocalCheckpoint(bands)
        val ss = s.newSession()
        // state partitions sized to VOLUME, not a constant: each shuffle
        // partition is a state-store instance (fixed per-batch overhead),
        // so tiny replays want few, but a fixed 4 caps the stateful
        // stage's parallelism as the corpus grows (the r8 k=10→k=100
        // probe measured slope 9.7 with 4 partitions pinned — 500k docs'
        // band rows funneled through 4 of 32 cores). One doc ≈ 4 band
        // rows; ~5k docs per store instance keeps both regimes right.
        val nDocs = docs.count()
        ss.conf.set("spark.sql.shuffle.partitions",
          math.max(4L, math.min(32L, nDocs / 5000L)).toString)
        // transformWithState needs column families → RocksDB provider
        ss.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        import ss.implicits._
        val src = StreamingRefresh
          .fileStream(ss, bands.schema, in, maxFilesPerTrigger = Some(1))
          .as[BandRow]
        val verdicts = src.groupByKey(r => s"${r.band}|${r.key}")
          .transformWithState(new BandClaimProcessor,
            TimeMode.None(), OutputMode.Update())
        val q = verdicts.toDF().writeStream
          .outputMode("update")
          // a doc's bands all live in one micro-batch, so the per-doc fold
          // is batch-local — a stateless groupBy inside foreachBatch, no
          // second stateful stage needed
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.groupBy("doc_id")
              .agg(count(lit(1)).as("n_bands"),
                expr("bool_and(ok)").as("all_ok"))
              .write.mode("append").parquet(sink)
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        docs.select(col("doc_id"))
          .join(s.read.parquet(sink), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bands"), lit(0L)).as("n_bands"),
            when(col("all_ok") === false, "drop_neardup")
              .otherwise("keep").as("decision"))
          .orderBy("doc_id")
      }))
}
