package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GifCodec

/** GIF89a LZW codec pinning — the decoder must recover exact pixels from
  * real compressed containers across every LZW regime: dictionary growth
  * through width bumps, the cScSc self-reference, mid-stream CLEAR on
  * table overflow, sub-block fragmentation, and palette mapping. */
class GifCodecSpec extends AnyFunSuite {

  private def roundTrip(w: Int, h: Int, f: (Int, Int) => Int): Unit = {
    val px = GifCodec.decodeGifGrayPixels(GifCodec.synthesizeGifGray(w, h, f))
    assert(px.length == w * h)
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xff) == (f(x, y) & 0xff),
        s"pixel ($x,$y) of ${w}x$h")
  }

  test("round-trip: constant image (immediate cScSc chains)") {
    roundTrip(17, 9, (_, _) => 200)
  }

  test("round-trip: two-value stripes (repeated short phrases)") {
    roundTrip(31, 7, (x, _) => if (x % 2 == 0) 0 else 255)
  }

  test("round-trip: high-entropy raster across width bumps (9→10→11 bits)") {
    // 44x44 = 1936 px with a non-repeating pattern drives the dictionary
    // past 512 and 1024 entries — two width bumps on real data
    roundTrip(44, 44, (x, y) => (x * 3 + y * 11 + (x * y) % 13) % 256)
  }

  test("round-trip: large image forces mid-stream CLEAR (table overflow)") {
    // 120x80 = 9600 px of high-entropy pattern exceeds the 4093-entry
    // reset threshold — the decoder must survive a CLEAR inside the scan
    roundTrip(120, 80, (x, y) => (x * 7 + y * 13 + (x ^ y)) % 256)
  }

  test("round-trip: single-pixel and single-row edge shapes") {
    roundTrip(1, 1, (_, _) => 42)
    roundTrip(255, 1, (x, _) => x % 256)
    roundTrip(1, 63, (_, y) => (y * 5) % 256)
  }

  test("sub-block fragmentation: large streams span many 255-byte blocks") {
    val gif = GifCodec.synthesizeGifGray(120, 80,
      (x, y) => (x * 7 + y * 13 + (x ^ y)) % 256)
    // count data sub-blocks: after header(6)+LSD(7)+GCT(768)+desc(10)+mcs(1)
    var pos = 6 + 7 + 768 + 10 + 1
    var blocks = 0
    while ((gif(pos) & 0xff) != 0) { blocks += 1; pos += 1 + (gif(pos) & 0xff) }
    assert(blocks > 5, s"expected many sub-blocks, got $blocks")
    assert((gif(pos + 1) & 0xff) == 0x3b) // trailer follows terminator
  }

  test("extension blocks are skipped, truncation and bad headers rejected") {
    val gif = GifCodec.synthesizeGifGray(5, 4, (x, y) => x + y)
    // splice a graphic-control extension between GCT and image descriptor
    val at = 6 + 7 + 768
    val ext = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = gif.take(at) ++ ext ++ gif.drop(at)
    val px = GifCodec.decodeGifGrayPixels(spliced)
    assert(px.length == 20 && (px(7) & 0xff) == 3) // (2,1) → 3
    intercept[Exception] {
      GifCodec.decodeGifGrayPixels(gif.take(gif.length / 2))
    }
    intercept[Exception] {
      GifCodec.decodeGifGrayPixels("NOTAGIF89a-----".getBytes("US-ASCII"))
    }
  }
}
