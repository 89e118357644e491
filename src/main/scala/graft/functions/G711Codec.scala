package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** ITU-T G.711 companding — the µ-law codec every telephony/ASR corpus
  * pipeline decodes before feature extraction. Same honest-codec
  * discipline as the other pure-JDK codecs: the encoder implements the
  * CCITT reference algorithm (clip to 32635, +132 bias, segment exponent
  * from the magnitude's top bit, 4-bit mantissa, complemented byte) and
  * the decoder independently reconstructs the quantization-interval
  * MIDPOINT — decode(e, m) = ((33 + 2m) << (e+2)) − 132 — so the
  * round-trip is the exact step function the spec defines, and a DuckDB
  * oracle can reproduce decode(encode(s)) in closed-form integer SQL
  * without any codec.
  */
object G711Codec {

  /** 16-bit linear PCM sample → µ-law byte (CCITT reference shape). */
  def encodeMuLaw(sample: Int): Byte = {
    val sign = if (sample < 0) 0x80 else 0x00
    var mag = math.min(math.abs(sample), 32635) + 132
    var e = 7
    var probe = 0x4000 // bit 14: mag <= 32767 always
    while (e > 0 && (mag & probe) == 0) { e -= 1; probe >>= 1 }
    // probe found the top bit at position e+7 (mag >= 132 => e >= 0)
    val m = (mag >> (e + 3)) & 0x0f
    (~(sign | (e << 4) | m) & 0xff).toByte
  }

  /** µ-law byte → 16-bit linear PCM (quantization-interval midpoint). */
  def decodeMuLaw(b: Byte): Int = {
    val u = (~b) & 0xff
    val sign = (u & 0x80) != 0
    val e = (u >> 4) & 0x07
    val m = u & 0x0f
    val mag = ((33 + 2 * m) << (e + 2)) - 132
    if (sign) -mag else mag
  }

  /** Per-document synthesize→encode→decode→profile pass (executor-side).
    * Sample count and content are closed-form in doc_id, so the oracle
    * reproduces the decoded stream via the same integer step function. */
  def transformG711(spark: SparkSession, docs: DataFrame)
      : Dataset[Multimodal.MediaTransform] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { id =>
          val n = (64L + id % 129L).toInt
          val dec = new Array[Int](n)
          var i = 0
          while (i < n) {
            val s = (((id * 31L + i * 17L) % 65536L) - 32768L).toInt
            dec(i) = decodeMuLaw(encodeMuLaw(s))
            i += 1
          }
          md.reset()
          val hex = md.digest(dec.mkString(",").getBytes("US-ASCII"))
            .map("%02x".format(_)).mkString
          Multimodal.MediaTransform(id, dec.length.toLong, hex,
            dec.foldLeft(0L)(_ + _), dec.min.toLong, dec.max.toLong)
        }
      }
  }
}
