package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** QOI ("Quite OK Image") codec — the 2022 single-pass byte-oriented
  * image format (public spec: qoiformat.org/qoi-specification.pdf),
  * implemented from the spec in pure JDK. QOI is the interesting
  * multimodal sibling to PNG/JPEG here because its compression state is a
  * 64-slot color index + previous-pixel register — O(1) state, one pass,
  * no entropy coder — which is exactly the shape of a codec you'd run
  * inline in a 100 TB ingest map stage.
  *
  * Encoder and decoder implement the full RGB op set:
  *   QOI_OP_RUN   (0b11xxxxxx, run 1..62, bias -1)
  *   QOI_OP_INDEX (0b00xxxxxx, hash (3r+5g+7b+11a) % 64)
  *   QOI_OP_DIFF  (0b01drdgdb, per-channel diff -2..1, bias 2, wrapping)
  *   QOI_OP_LUMA  (0b10dggggg | drdg<<4 | dbdg, dg -32..31, dr-dg/db-dg
  *                 -8..7, wrapping)
  *   QOI_OP_RGB   (0xFE r g b)
  * (QOI_OP_RGBA / channels=4 omitted: the synthesized corpus is RGB with
  * a constant 255 alpha, which the spec encodes identically.)
  * Header: "qoif" + u32BE width/height + channels + colorspace; trailer:
  * seven 0x00 then 0x01.
  */
object QoiCodec {

  private def hash(r: Int, g: Int, b: Int): Int =
    (r * 3 + g * 5 + b * 7 + 255 * 11) % 64

  /** Encode an RGB pixel stream (3 ints per pixel, 0..255). */
  def encodeQoiRgb(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(px.length == w * h * 3, "pixel buffer must be w*h*3")
    val out = new java.io.ByteArrayOutputStream(14 + px.length / 2)
    def u32be(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    u32be(w); u32be(h); out.write(3); out.write(0)
    val index = Array.fill(64 * 3)(0)
    // spec: previous-pixel register starts (r,g,b,a) = (0,0,0,255);
    // alpha stays 255 throughout for RGB
    var pr = 0; var pg = 0; var pb = 0
    var run = 0
    var i = 0
    while (i < px.length) {
      val (r, g, b) = (px(i), px(i + 1), px(i + 2))
      if (r == pr && g == pg && b == pb) {
        run += 1
        if (run == 62) { out.write(0xc0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
        val hx = hash(r, g, b)
        if (index(hx * 3) == r && index(hx * 3 + 1) == g &&
            index(hx * 3 + 2) == b) {
          out.write(hx) // OP_INDEX (top bits 00, hx < 64)
        } else {
          index(hx * 3) = r; index(hx * 3 + 1) = g; index(hx * 3 + 2) = b
          // wrapping signed-byte diffs, per spec
          val vr = ((r - pr + 128) & 0xff) - 128
          val vg = ((g - pg + 128) & 0xff) - 128
          val vb = ((b - pb + 128) & 0xff) - 128
          if (vr >= -2 && vr <= 1 && vg >= -2 && vg <= 1 &&
              vb >= -2 && vb <= 1) {
            out.write(0x40 | ((vr + 2) << 4) | ((vg + 2) << 2) | (vb + 2))
          } else if (vg >= -32 && vg <= 31 && vr - vg >= -8 && vr - vg <= 7 &&
              vb - vg >= -8 && vb - vg <= 7) {
            out.write(0x80 | (vg + 32))
            out.write(((vr - vg + 8) << 4) | (vb - vg + 8))
          } else {
            out.write(0xfe); out.write(r); out.write(g); out.write(b)
          }
        }
      }
      pr = r; pg = g; pb = b
      i += 3
    }
    if (run > 0) out.write(0xc0 | (run - 1))
    (0 until 7).foreach(_ => out.write(0))
    out.write(1)
    out.toByteArray
  }

  /** Per-op-kind counts from a decode — spec instrumentation, proving the
    * synthesized corpus puts every op on the wire. Order:
    * (run, index, diff, luma, rgb). */
  final case class QoiDecoded(w: Int, h: Int, px: Array[Int],
      ops: (Long, Long, Long, Long, Long))

  /** Decode; validates magic, trailer, and exact pixel count. */
  def decodeQoiRgb(bytes: Array[Byte]): QoiDecoded = {
    def u8(i: Int): Int = bytes(i) & 0xff
    require(bytes.length >= 22 && bytes(0) == 'q' && bytes(1) == 'o' &&
      bytes(2) == 'i' && bytes(3) == 'f', "bad QOI magic")
    def u32be(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val w = u32be(4); val h = u32be(8)
    require(u8(12) == 3 && u8(13) == 0, "expected RGB/sRGB")
    val n = w * h * 3
    val px = new Array[Int](n)
    val index = Array.fill(64 * 3)(0)
    var r = 0; var g = 0; var b = 0 // register starts (0,0,0,255)
    var (nRun, nIdx, nDiff, nLuma, nRgb) = (0L, 0L, 0L, 0L, 0L)
    var p = 14
    var o = 0
    def emit(): Unit = { px(o) = r; px(o + 1) = g; px(o + 2) = b; o += 3 }
    def remember(): Unit = {
      val hx = hash(r, g, b)
      index(hx * 3) = r; index(hx * 3 + 1) = g; index(hx * 3 + 2) = b
    }
    while (o < n) {
      val b0 = u8(p); p += 1
      if (b0 == 0xfe) {
        r = u8(p); g = u8(p + 1); b = u8(p + 2); p += 3
        nRgb += 1; remember(); emit()
      } else if ((b0 & 0xc0) == 0x00) {
        r = index(b0 * 3); g = index(b0 * 3 + 1); b = index(b0 * 3 + 2)
        nIdx += 1; emit()
      } else if ((b0 & 0xc0) == 0x40) {
        r = (r + ((b0 >> 4) & 0x03) - 2) & 0xff
        g = (g + ((b0 >> 2) & 0x03) - 2) & 0xff
        b = (b + (b0 & 0x03) - 2) & 0xff
        nDiff += 1; remember(); emit()
      } else if ((b0 & 0xc0) == 0x80) {
        val dg = (b0 & 0x3f) - 32
        val b1 = u8(p); p += 1
        r = (r + dg + ((b1 >> 4) & 0x0f) - 8) & 0xff
        g = (g + dg) & 0xff
        b = (b + dg + (b1 & 0x0f) - 8) & 0xff
        nLuma += 1; remember(); emit()
      } else { // OP_RUN
        val run = (b0 & 0x3f) + 1
        require(run <= 62, "illegal run tag")
        nRun += 1
        var k = 0
        while (k < run) { emit(); k += 1 }
      }
    }
    require(o == n, "pixel overrun")
    require((0 until 7).forall(i => u8(p + i) == 0) && u8(p + 7) == 1,
      "bad QOI trailer")
    QoiDecoded(w, h, px, (nRun, nIdx, nDiff, nLuma, nRgb))
  }

  /** Deterministic RGB test card for doc (id, nChars): x-triples share r,
    * row-pairs share g, b tracks (r+g) except a periodic accent color —
    * so RUN/DIFF/LUMA/INDEX/RGB are all exercised on the wire. Closed
    * form in (doc_id, i), reproduced verbatim by the SQL oracle. */
  def cardPixels(id: Long, nChars: Long): (Int, Int, Array[Int]) = {
    val w = (4L + id % 21L).toInt
    val h = (4L + (id * 5L + nChars) % 19L).toInt
    val px = new Array[Int](w * h * 3)
    var i = 0
    while (i < w * h) {
      val x = i % w; val y = i / w
      val r = ((id * 7L + (x / 3) * 2L) % 256L).toInt
      val g = ((id * 11L + (y / 2) * 3L) % 256L).toInt
      val b = if (i % 17 == 0) (id % 256L).toInt else (r + g) % 256
      px(i * 3) = r; px(i * 3 + 1) = g; px(i * 3 + 2) = b
      i += 1
    }
    (w, h, px)
  }

  /** Synthesize → encode → decode → profile, per doc; executor-side map,
    * zero shuffle. Output shape matches the other media transforms. */
  def transformQoi(spark: SparkSession, docs: DataFrame)
      : Dataset[Multimodal.MediaTransform] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, nChars) =>
          val (w, h, px) = cardPixels(id, nChars)
          val qoi = encodeQoiRgb(w, h, px)
          val dec = decodeQoiRgb(qoi)
          require(dec.w == w && dec.h == h, "dim mismatch after roundtrip")
          val vs = dec.px
          md.reset()
          val hex = md.digest(vs.mkString(",").getBytes("US-ASCII"))
            .map("%02x".format(_)).mkString
          Multimodal.MediaTransform(id, vs.length.toLong, hex,
            vs.foldLeft(0L)(_ + _), vs.min.toLong, vs.max.toLong)
        }
      }
  }
}
