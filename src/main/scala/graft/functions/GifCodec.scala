package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Real GIF89a codec (grayscale, non-interlaced) — the dictionary-coding
  * member of the multimodal codec family (PNG = LZ77+filters, JPEG = DCT,
  * WAV = PCM, AVI = container; GIF = LZW). The DECODER is the product and
  * is fully general for the profile: header + logical-screen-descriptor
  * walk, global color table, extension-block skipping, sub-block
  * reassembly, and a complete variable-width LZW decode — LSB-first bit
  * order, CLEAR/EOI handling, the cScSc self-reference case, width growth
  * at dictionary-size boundaries, the 12-bit cap with add-suppression,
  * and palette mapping through the parsed color table. The ENCODER is the
  * simulation boundary (the "camera"): a REAL LZW compressor (dictionary
  * build, width bumps one step ahead of the decoder's, mid-stream CLEAR
  * on overflow) emitting spec-valid containers, so the decoder exercises
  * every path on genuine compressed bytes.
  *
  * Spec: CompuServe GIF89a (W3C note), LZW per Welch 1984 as profiled in
  * the GIF spec appendix. Reference treats media as opaque payloads
  * (/root/reference/readme.md:60-63 form-field blobs); the codec layer is
  * engine-original.
  */
object GifCodec {

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)

  /** LSB-first bit writer (GIF bit order is the reverse of JPEG's). */
  private final class LsbBitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L; private var nbits = 0
    def put(code: Int, width: Int): Unit = {
      acc |= (code.toLong & ((1L << width) - 1)) << nbits
      nbits += width
      while (nbits >= 8) {
        out.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) out.write((acc & 0xff).toInt)
      out.toByteArray
    }
  }

  private final class LsbBitReader(data: Array[Byte]) {
    private var acc = 0L; private var nbits = 0; private var pos = 0
    def read(width: Int): Int = {
      while (nbits < width) {
        if (pos >= data.length) sys.error("gif: LZW stream truncated")
        acc |= (data(pos) & 0xffL) << nbits; pos += 1; nbits += 8
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nbits -= width
      v
    }
  }

  private val Mcs = 8               // 256-color table → min code size 8
  private val Clear = 1 << Mcs      // 256
  private val Eoi = Clear + 1       // 257

  /** Real LZW compression of the index stream. The width bump runs one
    * dictionary entry AHEAD of the decoder's (the decoder's table lags by
    * exactly one add), so: widen after our nextFree reaches 2^width + 1.
    * A CLEAR resets both sides when the table nears the 12-bit cap. */
  private def lzwEncode(pixels: Array[Byte]): Array[Byte] = {
    val bw = new LsbBitWriter
    var dict = scala.collection.mutable.HashMap.empty[String, Int]
    var nextFree = Eoi + 1; var width = Mcs + 1
    def reset(): Unit = { dict = scala.collection.mutable.HashMap.empty
      nextFree = Eoi + 1; width = Mcs + 1 }
    bw.put(Clear, width)
    var cur = ""
    for (p <- pixels) {
      val c = (p & 0xff).toChar
      val next = cur + c
      if (cur.isEmpty || dict.contains(next)) {
        if (cur.isEmpty && !dict.contains(next)) () // single byte: implicit
        cur = next
      } else {
        bw.put(codeOf(dict, cur), width)
        dict(next) = nextFree; nextFree += 1
        if (nextFree == (1 << width) + 1 && width < 12) width += 1
        // decoder stops adding at 4096; stay clear of the cap entirely
        if (nextFree >= 4093) { bw.put(codeOf(dict, c.toString), width)
          // emit pending symbol inside the old table, then hard reset
          bw.put(Clear, width); reset(); cur = "" }
        else cur = c.toString
      }
    }
    if (cur.nonEmpty) bw.put(codeOf(dict, cur), width)
    bw.put(Eoi, width)
    bw.finish()
  }
  private def codeOf(dict: scala.collection.mutable.HashMap[String, Int],
      s: String): Int =
    if (s.length == 1) s.charAt(0).toInt else dict(s)

  /** A REAL grayscale GIF89a: header, LSD, 256-entry gray color table,
    * image descriptor, LZW-compressed index stream in ≤255-byte
    * sub-blocks, trailer. `value(x, y)` ∈ [0, 255]. */
  def synthesizeGifGray(width: Int, height: Int,
      value: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(u16le(width)); out.write(u16le(height))
    out.write(0xf7) // GCT present, 8-bit color res, 2^(7+1) = 256 entries
    out.write(0); out.write(0) // background index, aspect
    for (i <- 0 until 256) { out.write(i); out.write(i); out.write(i) }
    out.write(0x2c) // image descriptor
    out.write(u16le(0)); out.write(u16le(0))
    out.write(u16le(width)); out.write(u16le(height))
    out.write(0) // no local color table, not interlaced
    out.write(Mcs)
    val px = Array.tabulate(width * height)(i =>
      (value(i % width, i / width) & 0xff).toByte)
    val lzw = lzwEncode(px)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n); off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decode a grayscale GIF89a to its w·h pixel bytes (palette-mapped
    * through the parsed global color table — a palette bug breaks the
    * output, not just the indices). Fully general for the non-interlaced
    * single-image profile, including extension blocks and mid-stream
    * CLEAR codes. */
  def decodeGifGrayPixels(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length > 13 &&
      new String(bytes, 0, 6, "US-ASCII") == "GIF89a", "gif: bad header")
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val gctFlag = (bytes(10) & 0x80) != 0
    val gctSize = 2 << (bytes(10) & 7)
    var pos = 13
    require(gctFlag, "gif: global color table required in this profile")
    val palette = new Array[Byte](gctSize)
    for (i <- 0 until gctSize) {
      val r = bytes(pos) & 0xff; val g = bytes(pos + 1) & 0xff
      val b = bytes(pos + 2) & 0xff
      require(r == g && g == b, "gif: non-grayscale palette")
      palette(i) = r.toByte; pos += 3
    }
    // block walk: skip extensions, find the image descriptor
    while ((bytes(pos) & 0xff) == 0x21) {
      pos += 2 // introducer + label
      while ((bytes(pos) & 0xff) != 0) pos += 1 + (bytes(pos) & 0xff)
      pos += 1
    }
    require((bytes(pos) & 0xff) == 0x2c, "gif: image descriptor expected")
    val w = u16(pos + 5); val h = u16(pos + 7)
    val packed = bytes(pos + 9) & 0xff
    require((packed & 0x80) == 0, "gif: local color table unsupported")
    require((packed & 0x40) == 0, "gif: interlace unsupported")
    pos += 10
    val mcs = bytes(pos) & 0xff; pos += 1
    require(mcs == Mcs, s"gif: unexpected min code size $mcs")
    // sub-block reassembly
    val data = new java.io.ByteArrayOutputStream()
    while ((bytes(pos) & 0xff) != 0) {
      val n = bytes(pos) & 0xff
      data.write(bytes, pos + 1, n); pos += 1 + n
    }
    val br = new LsbBitReader(data.toByteArray)
    val out = new java.io.ByteArrayOutputStream(w * h)
    var dict: Array[String] = null
    var nextFree = 0; var width = 0; var prev: String = null
    def reset(): Unit = {
      dict = new Array[String](4096)
      for (i <- 0 until Clear) dict(i) = i.toChar.toString
      nextFree = Eoi + 1; width = Mcs + 1; prev = null
    }
    reset()
    var done = false
    while (!done) {
      val code = br.read(width)
      if (code == Clear) reset()
      else if (code == Eoi) done = true
      else {
        val entry =
          if (code < nextFree && dict(code) != null) dict(code)
          else if (code == nextFree && prev != null) prev + prev.charAt(0)
          else sys.error(s"gif: bad LZW code $code (nextFree=$nextFree)")
        entry.foreach(ch => out.write(palette(ch.toInt) & 0xff))
        if (prev != null && nextFree < 4096) {
          dict(nextFree) = prev + entry.charAt(0); nextFree += 1
          if (nextFree == (1 << width) && width < 12) width += 1
        }
        prev = entry
      }
    }
    val px = out.toByteArray
    require(px.length == w * h,
      s"gif: decoded ${px.length} pixels for ${w}x$h")
    px
  }

  /** The GIF leg of the multimodal family: per doc a real LZW-compressed
    * container, decoded back to true pixels from bytes alone; exact
    * feature aggregates. Dimensions up to 44×44 so the LZW table grows
    * through two width bumps on real data. */
  def transformGif(spark: SparkSession, docs: DataFrame): Dataset[Multimodal.MediaTransform] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, body) =>
          val w = (5L + id % 40L).toInt
          val h = (5L + (id * 5L + body.length) % 40L).toInt
          val gif = synthesizeGifGray(w, h,
            (x, y) => ((id * 7L + x * 3L + y * 11L) % 256L).toInt)
          val px = decodeGifGrayPixels(gif).map(_ & 0xff)
          md.reset()
          val hex = md.digest(px.mkString(",").getBytes("US-ASCII"))
            .map("%02x".format(_)).mkString
          Multimodal.MediaTransform(id, px.length.toLong, hex,
            px.foldLeft(0L)(_ + _), px.min.toLong, px.max.toLong)
        }
      }
  }
}
