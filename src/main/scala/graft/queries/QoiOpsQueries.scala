package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, QueryModule}
import graft.H.tbl

/** Round-11 wave 173: QOI image codec (qoiformat.org, 2022) — the
  * run/index/diff-coded sibling the multimodal family lacked next to the
  * entropy-coded PNG/JPEG/GIF. See functions/QoiCodec.scala for the
  * spec-pinned encoder/decoder; QoiCodecSpec pins byte-exact vectors.
  */
object QoiOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // QOI ROUNDTRIP: synthesize a deterministic RGB test card per doc
    // (x-triples share r, row-pairs share g, b tracks r+g with a periodic
    // accent — so RUN/INDEX/DIFF/LUMA/RGB ops are all on the wire; the
    // codec spec asserts that), encode to QOI, decode with the
    // independent chunk-walking decoder (magic/trailer/pixel-count
    // validated), and profile the recovered channel stream. The card is
    // closed-form in (doc_id, i) so the oracle reproduces the stream with
    // no codec. Per-row executor-side map, zero shuffle before the final
    // sort — the O(1)-state single-pass codec shape you'd run inline in a
    // 100 TB ingest stage.
    Q("multimodal_qoi",
      Some(
        """WITH dims AS (SELECT doc_id, 4 + doc_id % 21 AS w,
          |    4 + (doc_id * 5 + n_chars) % 19 AS h FROM documents),
          |px AS (SELECT doc_id, list_transform(range(0, w * h * 3),
          |  k -> CASE k % 3
          |    WHEN 0 THEN (doc_id*7 + (((k//3) % w) // 3) * 2) % 256
          |    WHEN 1 THEN (doc_id*11 + (((k//3) // w) // 2) * 3) % 256
          |    ELSE CASE WHEN (k//3) % 17 = 0 THEN doc_id % 256
          |      ELSE ((doc_id*7 + (((k//3) % w) // 3) * 2) % 256
          |        + (doc_id*11 + (((k//3) // w) // 2) * 3) % 256) % 256
          |    END END) AS vs FROM dims)
          |SELECT doc_id, CAST(len(vs) AS BIGINT) AS n_px,
          |  md5(array_to_string(vs, ',')) AS px_md5,
          |  CAST(list_sum(vs) AS BIGINT) AS px_sum,
          |  CAST(list_min(vs) AS BIGINT) AS px_min,
          |  CAST(list_max(vs) AS BIGINT) AS px_max
          |FROM px ORDER BY doc_id
          |""".stripMargin),
      (s, dir) =>
        graft.functions.QoiCodec.transformQoi(s, tbl(s, dir, "documents"))
          .toDF().orderBy("doc_id"))
  )
}
