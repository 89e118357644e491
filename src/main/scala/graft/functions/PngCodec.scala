package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** PNG (ISO/IEC 15948 / RFC 2083) encoder + decoder in pure JDK for 8-bit
  * grayscale images — the DEFLATE-compressed sibling of the board's
  * JPEG/GIF/BMP codecs, and the first one whose pixel stream rides a real
  * entropy coder (zlib via java.util.zip.Deflater/Inflater, which IS the
  * JDK's bundled zlib). Same honest-codec discipline as BmpCodec: the
  * encoder writes a spec-complete file (PNG signature; IHDR/IDAT/IEND
  * chunks, each with its CRC-32 over type+data; zlib-wrapped scanlines,
  * one filter byte per row) and the decoder independently walks the chunk
  * structure (signature, lengths, CRC validation on every chunk, IHDR
  * geometry/bit-depth/color-type checks), inflates the IDAT stream, and
  * REVERSES the per-row filters — all five spec filter types (None, Sub,
  * Up, Average, Paeth) are exercised, because the encoder deterministically
  * cycles filter = row % 5, so a broken Paeth predictor or Average
  * rounding cannot hide behind filter-0 rows.
  */
object PngCodec {

  private def crc32(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32()
    c.update(b, off, len)
    c.getValue.toInt
  }

  private def p32be(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = ((v >>> 24) & 0xff).toByte; b(o + 1) = ((v >>> 16) & 0xff).toByte
    b(o + 2) = ((v >>> 8) & 0xff).toByte; b(o + 3) = (v & 0xff).toByte
  }
  private def u32be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  /** Paeth predictor (RFC 2083 §6.6) — shared by encoder and decoder. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + data.length)
    p32be(out, 0, data.length)
    tpe.getBytes("US-ASCII").copyToArray(out, 4)
    data.copyToArray(out, 8)
    p32be(out, 8 + data.length, crc32(out, 4, 4 + data.length))
    out
  }

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Encode a grayscale image (pixel fn over top-down x,y) as an 8-bit
    * greyscale PNG; row r uses filter type r % 5 so every filter is on
    * the wire for any image with >= 5 rows. */
  def synthesizePngGray(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    // raw scanlines with per-row filtering
    val raw = new Array[Byte]((w + 1) * h)
    val cur = new Array[Int](w)
    val prev = new Array[Int](w) // zero for row 0, per spec
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { cur(x) = px(x, y) & 0xff; x += 1 }
      val ft = y % 5
      raw(y * (w + 1)) = ft.toByte
      x = 0
      while (x < w) {
        val a = if (x > 0) cur(x - 1) else 0
        val b = if (y > 0) prev(x) else 0
        val c = if (x > 0 && y > 0) prev(x - 1) else 0
        val f = ft match {
          case 0 => cur(x)
          case 1 => cur(x) - a
          case 2 => cur(x) - b
          case 3 => cur(x) - (a + b) / 2
          case 4 => cur(x) - paeth(a, b, c)
        }
        raw(y * (w + 1) + 1 + x) = (f & 0xff).toByte
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, w)
      y += 1
    }
    // zlib-wrap via Deflater (level pinned for deterministic bytes; the
    // DECODER never depends on the compression level, only the checksums)
    val defl = new java.util.zip.Deflater(6)
    defl.setInput(raw); defl.finish()
    // deflate can EXPAND incompressible input (stored-block overhead is
    // 5 bytes per 64 KiB plus the 2-byte zlib header / 4-byte adler tail);
    // a fixed raw+128 buffer would make the drain loop spin forever once
    // the buffer fills (deflate returns 0 with !finished). Grow on demand.
    var buf = new Array[Byte](raw.length + raw.length / 1000 + 128)
    var n = 0
    while (!defl.finished()) {
      if (n == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      n += defl.deflate(buf, n, buf.length - n)
    }
    defl.end()
    val idat = java.util.Arrays.copyOf(buf, n)
    val ihdr = new Array[Byte](13)
    p32be(ihdr, 0, w); p32be(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // color type 0 = greyscale
    // compression 0, filter 0, interlace 0 already zero
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Walk chunks (validating every CRC), inflate IDAT, reverse the per-row
    * filters, and return top-down row-major pixels. Rejects anything that
    * is not an 8-bit non-interlaced greyscale PNG. */
  def decodePngGrayPixels(png: Array[Byte]): Array[Int] = {
    require(png.length >= 8 && Signature.indices.forall(i => png(i) == Signature(i)),
      "not a PNG file")
    var o = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && o + 12 <= png.length) {
      val len = u32be(png, o)
      val tpe = new String(png, o + 4, 4, "US-ASCII")
      require(o + 12 + len <= png.length, s"truncated chunk $tpe")
      require(u32be(png, o + 8 + len) == crc32(png, o + 4, 4 + len),
        s"CRC mismatch in $tpe")
      tpe match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          w = u32be(png, o + 8); h = u32be(png, o + 12)
          require(png(o + 16) == 8, "unsupported bit depth")
          require(png(o + 17) == 0, "unsupported color type")
          require(png(o + 20) == 0, "interlaced PNG unsupported")
        case "IDAT" => idat.write(png, o + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped (none are written here)
      }
      o += 12 + len
    }
    require(sawEnd && w > 0 && h > 0, "missing IHDR/IEND")
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    val raw = new Array[Byte]((w + 1) * h)
    var n = 0
    while (n < raw.length && !infl.finished())
      n += infl.inflate(raw, n, raw.length - n)
    infl.end()
    require(n == raw.length, s"short inflate: $n of ${raw.length}")
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (w + 1)) & 0xff
      require(ft <= 4, s"bad filter type $ft")
      var x = 0
      while (x < w) {
        val f = raw(y * (w + 1) + 1 + x) & 0xff
        val a = if (x > 0) out(y * w + x - 1) else 0
        val b = if (y > 0) out((y - 1) * w + x) else 0
        val c = if (x > 0 && y > 0) out((y - 1) * w + x - 1) else 0
        val v = ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + (a + b) / 2
          case 4 => f + paeth(a, b, c)
        }
        out(y * w + x) = v & 0xff
        x += 1
      }
      y += 1
    }
    out
  }

  /** Per-document synthesize→decode→profile pass (executor-side). Dims and
    * pixel content are closed-form in (doc_id, n_chars) — a DIFFERENT
    * stream than BmpCodec's so a cross-wired oracle cannot pass — and the
    * height floor of 5 guarantees all five filter types are on the wire
    * for every single document. */
  def transformPng(spark: SparkSession, docs: DataFrame)
      : Dataset[Multimodal.MediaTransform] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, nChars) =>
          val w = (5L + id % 29L).toInt
          val h = (5L + (id * 7L + nChars) % 31L).toInt
          val png = synthesizePngGray(w, h,
            (x, y) => ((id * 11L + x * 3L + y * 13L) % 256L).toInt)
          val px = decodePngGrayPixels(png)
          md.reset()
          val hex = md.digest(px.mkString(",").getBytes("US-ASCII"))
            .map("%02x".format(_)).mkString
          Multimodal.MediaTransform(id, px.length.toLong, hex,
            px.foldLeft(0L)(_ + _), px.min.toLong, px.max.toLong)
        }
      }
  }
}
