package graft.queries

import org.apache.spark.sql.functions._
import graft.{H, Q, QueryModule}
import graft.H.tbl

/** Sixty-third wave: two more source formats under oracle — the
  * `binaryFile` reader (opaque-blob ingestion, the entry point of every
  * multimodal pipeline) audited per file against the text the blobs were
  * minted from, and hive-style partitioned layout (write partitioned,
  * read back through partition discovery with a pruning filter).
  */
object SourceExtraQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // binaryFile ingestion audit: every focus doc's text is written as a
    // standalone .bin blob; spark.read.format("binaryFile") lists and
    // reads them, and the audit re-derives (doc_id, length, md5) from
    // the CONTENT — hash-matched against the source table, proving the
    // blob path carries bytes intact. At scale this reader is the
    // object-store entry point; pathGlobFilter and the content-free
    // `length` column are the pushdown levers. The fixture blobs are
    // written EXECUTOR-SIDE via foreachPartition (r7 verdict #2) — no
    // corpus-derived frame ever crosses to the driver; each partition
    // writes its own files to the shared filesystem, which is exactly
    // how a cluster job would mint per-row objects onto a shared store.
    Q("source_binaryfile_audit",
      Some(
        """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT)
          |  AS byte_len, md5(text) AS content_md5
          |FROM documents WHERE doc_id % 7 = 0 ORDER BY doc_id
          |""".stripMargin),
      (s, dir) => {
        import java.nio.file.Files
        val docs = tbl(s, dir, "documents")
          .filter(pmod(col("doc_id"), lit(7)) === 0)
          .select(col("doc_id"), col("text"))
        val tmp = H.tmpDir("graft_bin")
        docs.foreachPartition {
          (it: Iterator[org.apache.spark.sql.Row]) =>
            it.foreach { r =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(tmp, f"doc_${r.getLong(0)}%08d.bin"),
                r.getString(1).getBytes("UTF-8"))
            }
        }
        s.read.format("binaryFile")
          .option("pathGlobFilter", "*.bin")
          .load(tmp)
          .select(
            regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
              .cast("long").as("doc_id"),
            col("length").as("byte_len"),
            md5(col("content")).as("content_md5"))
          .orderBy("doc_id")
      }),

    // Hive-partitioned layout: write events partitioned by event_type,
    // read back through partition discovery with a type filter, and
    // aggregate per day. The filter must prune at the DIRECTORY level
    // (PartitionFilters, not data filters) — asserted by the plan guard;
    // the oracle states the same aggregate over the unpartitioned truth.
    Q("source_hive_partitions",
      Some(
        """SELECT CAST(strftime(ts, '%d') AS BIGINT) AS day,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT)
          |    AS cents
          |FROM events WHERE event_type IN ('purchase', 'error')
          |GROUP BY day ORDER BY day
          |""".stripMargin),
      (s, dir) => {
        import java.nio.file.Files
        val tmp = H.tmpDir("graft_hivep")
        H.events(s, dir)
          .select(col("event_id"), col("ts"), col("value"),
            col("event_type"))
          .write.partitionBy("event_type").parquet(s"$tmp/events")
        s.read.parquet(s"$tmp/events")
          .filter(col("event_type").isin("purchase", "error"))
          .groupBy(date_format(col("ts"), "d").cast("long").as("day"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
              .cast("long").as("cents"))
          .orderBy("day")
      }))
}
