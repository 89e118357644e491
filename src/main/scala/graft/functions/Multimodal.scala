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

  final case class MediaTransform(
      doc_id: Long,
      resized_len: Long,
      resized_md5: String,
      n_vowel: Long,
      n_space: Long,
      n_other: Long)

  /** STUB resize + feature-extract over the real bytes: "resize" keeps every
    * 4th byte (a deterministic stand-in for pixel subsampling) and hashes
    * the result; features are byte-class counts. All real executor-side
    * byte-array work in one mapPartitions batch. */
  def transform(spark: SparkSession, docs: DataFrame): Dataset[MediaTransform] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val resized = bytes.indices.collect {
            case i if i % 4 == 0 => bytes(i)
          }.toArray
          md.reset()
          val hex = md.digest(resized).map("%02x".format(_)).mkString
          var vowel = 0L; var space = 0L; var other = 0L
          bytes.foreach { b =>
            val c = (b & 0xff).toChar
            if ("aeiou".indexOf(c) >= 0) vowel += 1
            else if (c == ' ') space += 1
            else other += 1
          }
          MediaTransform(id, resized.length.toLong, hex, vowel, space, other)
        }
      }
  }
}
