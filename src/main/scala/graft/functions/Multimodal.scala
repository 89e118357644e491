package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata extracted executor-side in batches.
  *
  * The decode itself is STUBBED (no image/audio codecs in this
  * environment): `decodeMeta` derives deterministic fake dimensions from the
  * real bytes. Everything around it — binary column handling, the typed
  * `mapPartitions` batch shape (one iterator per partition, the Scala
  * analogue of `mapInPandas`), schema, partitioning — is real and tested.
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      first_byte: Long,
      width: Long,
      height: Long,
      channels: Long,
      format: String)

  /** STUB decode: a real implementation would parse the container header
    * (e.g. PNG IHDR / JPEG SOF0); this derives deterministic dimensions from
    * the payload so the pipeline is end-to-end testable. */
  def decodeMeta(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val len = bytes.length.toLong
    val first = if (bytes.nonEmpty) (bytes(0) & 0xff).toLong else 0L
    MediaMeta(
      doc_id = docId,
      byte_len = len,
      first_byte = first,
      width = 64L + len % 512L,
      height = 64L + (len * 7L + first) % 512L,
      channels = 3L,
      format = "fake/rgb8")
  }

  /** documents(text) → binary payload → per-partition batched decode. */
  def extractMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decodeMeta(id, bytes) } }
  }
}
