package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Windows BMP (BITMAPINFOHEADER, uncompressed 24 bpp) encoder + decoder in
  * pure JDK — the same honest-codec discipline as JpegCodec/GifCodec: the
  * encoder writes a spec-complete file (BITMAPFILEHEADER 14 bytes +
  * BITMAPINFOHEADER 40 bytes + bottom-up BGR rows padded to 4-byte
  * boundaries, per the public Windows GDI format documented in e.g. the
  * Windows SDK wingdi.h structures), and the decoder independently parses
  * headers (magic, pixel-array offset, header size, bit depth, compression,
  * row stride, bottom-up orientation) rather than assuming what the encoder
  * wrote. Grayscale content is stored as R=G=B; the decoder recovers
  * luminance via the integer ITU-R BT.601 weights (299/587/114 per mille),
  * which is exact for R=G=B pixels.
  */
object BmpCodec {

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def p16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def p32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }

  /** Encode a grayscale image (pixel function over top-down x,y) as a
    * 24 bpp bottom-up BMP with 4-byte row padding. */
  def synthesizeBmpGray(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val dataSize = stride * h
    val fileSize = 14 + 40 + dataSize
    val b = new Array[Byte](fileSize)
    b(0) = 'B'; b(1) = 'M'
    p32(b, 2, fileSize)
    p32(b, 10, 54) // bfOffBits
    p32(b, 14, 40) // biSize
    p32(b, 18, w)
    p32(b, 22, h) // positive => bottom-up
    p16(b, 26, 1) // biPlanes
    p16(b, 28, 24) // biBitCount
    p32(b, 30, 0) // BI_RGB
    p32(b, 34, dataSize)
    var y = 0
    while (y < h) {
      val row = 54 + (h - 1 - y) * stride // bottom-up storage
      var x = 0
      while (x < w) {
        val v = (px(x, y) & 0xff).toByte
        val o = row + x * 3
        b(o) = v; b(o + 1) = v; b(o + 2) = v // BGR, gray
        x += 1
      }
      y += 1
    }
    b
  }

  /** Parse headers and return top-down luma pixels (row-major). Rejects
    * anything that is not an uncompressed 24 bpp BITMAPINFOHEADER file. */
  def decodeBmpGrayPixels(bmp: Array[Byte]): Array[Int] = {
    require(bmp.length >= 54 && bmp(0) == 'B' && bmp(1) == 'M',
      "not a BMP file")
    val offBits = u32(bmp, 10)
    require(u32(bmp, 14) == 40, "unsupported DIB header")
    val w = u32(bmp, 18)
    val hRaw = u32(bmp, 22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    require(u16(bmp, 28) == 24, "unsupported bit depth")
    require(u32(bmp, 30) == 0, "compressed BMP unsupported")
    val stride = ((w * 3 + 3) / 4) * 4
    require(bmp.length >= offBits + stride * h, "truncated pixel array")
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = offBits + (if (bottomUp) (h - 1 - y) else y) * stride
      var x = 0
      while (x < w) {
        val o = srcRow + x * 3
        val bl = bmp(o) & 0xff; val g = bmp(o + 1) & 0xff
        val r = bmp(o + 2) & 0xff
        out(y * w + x) = (r * 299 + g * 587 + bl * 114) / 1000
        x += 1
      }
      y += 1
    }
    out
  }

  /** Per-document synthesize→decode→profile pass (executor-side; nothing
    * ships through the driver). Dims and pixel content are closed-form in
    * (doc_id, n_chars) so the DuckDB oracle reproduces them exactly. */
  def transformBmp(spark: SparkSession, docs: DataFrame)
      : Dataset[Multimodal.MediaTransform] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, nChars) =>
          val w = (4L + id % 37L).toInt
          val h = (4L + (id * 3L + nChars) % 37L).toInt
          val bmp = synthesizeBmpGray(w, h,
            (x, y) => ((id * 13L + x * 5L + y * 7L) % 256L).toInt)
          val px = decodeBmpGrayPixels(bmp)
          md.reset()
          val hex = md.digest(px.mkString(",").getBytes("US-ASCII"))
            .map("%02x".format(_)).mkString
          Multimodal.MediaTransform(id, px.length.toLong, hex,
            px.foldLeft(0L)(_ + _), px.min.toLong, px.max.toLong)
        }
      }
  }
}
