package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, QueryModule}
import graft.H.tbl

/** Round-10 wave 154: G.711 µ-law companding — the telephony/ASR audio
  * codec the multimodal family lacked next to linear-PCM WAV: a REAL
  * nonlinear quantizer whose round-trip is a spec-defined step function,
  * reproducible in closed-form integer SQL (segment exponent via a CASE
  * ladder, mantissa via shifts, interval-midpoint reconstruction).
  */
object G711OpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // µ-LAW ROUND-TRIP: per document, synthesize a deterministic 16-bit
    // PCM stream (64-192 samples, closed-form in doc_id), push every
    // sample through the byte-level encoder+decoder
    // (functions/G711Codec.scala — CCITT clip/bias/segment/mantissa on
    // the way in, interval midpoints on the way out), and profile the
    // decoded stream. The oracle reproduces decode(encode(s)) as pure
    // integer SQL — no codec, just the spec's arithmetic — so a
    // single-bit slip in either direction breaks the md5. Per-row
    // data-parallel, executor-side only; zero shuffle before the sort.
    Q("multimodal_g711_ulaw",
      Some {
        val s = "((doc_id * 31 + i * 17) % 65536) - 32768"
        val mag = s"(least(abs($s), 32635) + 132)"
        val e = s"(CASE WHEN $mag < 256 THEN 0 WHEN $mag < 512 THEN 1" +
          s" WHEN $mag < 1024 THEN 2 WHEN $mag < 2048 THEN 3" +
          s" WHEN $mag < 4096 THEN 4 WHEN $mag < 8192 THEN 5" +
          s" WHEN $mag < 16384 THEN 6 ELSE 7 END)"
        val m = s"(($mag // (1 << ($e + 3))) % 16)"
        val dec = s"(CASE WHEN $s < 0 THEN -1 ELSE 1 END)" +
          s" * ((33 + 2 * $m) * (1 << ($e + 2)) - 132)"
        "WITH dims AS (SELECT doc_id, 64 + doc_id % 129 AS n FROM documents), " +
          s"dec AS (SELECT doc_id, list_transform(range(0, n), i -> $dec) " +
          "AS vs FROM dims) " +
          "SELECT doc_id, CAST(len(vs) AS BIGINT) AS n_px, " +
          "md5(array_to_string(vs, ',')) AS px_md5, " +
          "CAST(list_sum(vs) AS BIGINT) AS px_sum, " +
          "CAST(list_min(vs) AS BIGINT) AS px_min, " +
          "CAST(list_max(vs) AS BIGINT) AS px_max FROM dec ORDER BY doc_id"
      },
      (s, dir) =>
        graft.functions.G711Codec.transformG711(s, tbl(s, dir, "documents"))
          .toDF().orderBy("doc_id"))
  )
}
