package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Round-9 wave 136: BMP image decode (pure-JDK, spec-parsing — the
  * uncompressed-raster sibling of the JPEG/GIF/PNG codecs already on the
  * board) and fixed-width legacy-record ingestion with zoned-decimal
  * overpunch signs (the COBOL/mainframe extract format every enterprise
  * migration pipeline still has to read).
  */
object BmpFixedWidthOpsQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // BMP DECODE: synthesize a real 24 bpp bottom-up BMP per document
    // (BITMAPFILEHEADER + BITMAPINFOHEADER + padded BGR rows), decode it
    // with an independent header-parsing decoder (magic, offset, bit
    // depth, compression, stride, orientation all validated — see
    // functions/BmpCodec.scala), and profile the recovered luma pixels.
    // Dims/content are closed-form in (doc_id, n_chars) so the oracle
    // reproduces the pixel stream without any codec. Per-row
    // data-parallel, executor-side only — nothing ships through the
    // driver. Scale: pure map, zero shuffle before the final sort.
    Q("multimodal_bmp",
      Some("WITH dims AS (SELECT doc_id, 4 + doc_id % 37 AS w, " +
        "4 + (doc_id * 3 + n_chars) % 37 AS h FROM documents), " +
        "px AS (SELECT doc_id, list_transform(range(0, w * h), " +
        "i -> (doc_id * 13 + (i % w) * 5 + (i // w) * 7) % 256) " +
        "AS vs FROM dims) " +
        "SELECT doc_id, CAST(len(vs) AS BIGINT) AS n_px, " +
        "md5(array_to_string(vs, ',')) AS px_md5, " +
        "CAST(list_sum(vs) AS BIGINT) AS px_sum, " +
        "CAST(list_min(vs) AS BIGINT) AS px_min, " +
        "CAST(list_max(vs) AS BIGINT) AS px_max FROM px ORDER BY doc_id"),
      (s, dir) =>
        graft.functions.BmpCodec.transformBmp(s, tbl(s, dir, "documents"))
          .toDF().orderBy("doc_id")),

    // FIXED-WIDTH + ZONED OVERPUNCH: write the customer table as 33-byte
    // fixed-width records — zero-padded keys, a 9-digit zoned-decimal
    // balance in cents whose LAST digit carries the sign as an overpunch
    // character ('{' = +0, A–I = +1..9, '}' = −0, J–R = −1..9 — the
    // EBCDIC overpunch convention in its standard ASCII transliteration),
    // and a space-padded segment — then read the file back as text,
    // slice fields by position, decode the overpunch, and aggregate.
    // The oracle computes the same aggregate from the table directly, so
    // the round-trip (encode → file → substring parse → sign decode)
    // must be lossless including every negative balance. Scale: encode
    // and parse are per-row maps; one bounded (segment) reduce.
    Q("source_fixed_width",
      Some(
        """WITH c AS (
          |  SELECT c_mktsegment AS segment,
          |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
          |  FROM customer)
          |SELECT segment, CAST(count(*) AS BIGINT) AS n_rows,
          |  CAST(sum(cents) AS BIGINT) AS sum_cents,
          |  CAST(sum(CASE WHEN cents < 0 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_negative,
          |  CAST(min(cents) AS BIGINT) AS min_cents,
          |  CAST(max(cents) AS BIGINT) AS max_cents
          |FROM c GROUP BY 1 ORDER BY 1
          |""".stripMargin),
      (s, dir) => {
        val out = H.tmpDir("graft_fw") + "/customer"
        // encode: 10-digit key, 4-digit nation, 8 digits + overpunch, then
        // the 10-char segment — 33 bytes per record
        tbl(s, dir, "customer")
          .select(concat(
            lpad(col("c_custkey").cast("string"), 10, "0"),
            lpad(col("c_nationkey").cast("string"), 4, "0"),
            expr("""substring(lpad(CAST(abs(CAST(floor(c_acctbal * 100
              |  + 0.5) AS BIGINT)) AS STRING), 9, '0'), 1, 8)"""
              .stripMargin),
            expr("""CASE
              |  WHEN CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) >= 0 THEN
              |    substring('{ABCDEFGHI',
              |      CAST(abs(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
              |        % 10 AS INT) + 1, 1)
              |  ELSE
              |    substring('}JKLMNOPQR',
              |      CAST(abs(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
              |        % 10 AS INT) + 1, 1)
              |  END""".stripMargin),
            rpad(col("c_mktsegment"), 10, " ")).as("value"))
          .write.mode("overwrite").text(out)
        // decode: positional slicing + overpunch sign recovery
        s.read.text(out)
          .select(
            expr("CAST(substring(value, 1, 10) AS BIGINT)").as("custkey"),
            expr("CAST(substring(value, 15, 8) AS BIGINT)").as("hi8"),
            expr("substring(value, 23, 1)").as("punch"),
            expr("rtrim(substring(value, 24, 10))").as("segment"))
          .withColumn("cents", expr(
            """CASE WHEN instr('{ABCDEFGHI', punch) > 0
              |  THEN hi8 * 10 + instr('{ABCDEFGHI', punch) - 1
              |  ELSE -(hi8 * 10 + instr('}JKLMNOPQR', punch) - 1) END"""
              .stripMargin))
          .groupBy("segment")
          .agg(count(lit(1)).cast("long").as("n_rows"),
            sum("cents").cast("long").as("sum_cents"),
            sum(when(col("cents") < 0, 1L).otherwise(0L)).cast("long")
              .as("n_negative"),
            min("cents").cast("long").as("min_cents"),
            max("cents").cast("long").as("max_cents"))
          .orderBy("segment")
      })
  )
}
