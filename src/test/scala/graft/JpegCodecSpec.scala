package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Multimodal

/** Pins the baseline JPEG codec (ITU-T T.81) at the BIT level.
  *
  * The hand-computed fixtures below were derived from the spec, not from
  * the encoder: canonical code assignment (C.2) over the Annex K luminance
  * tables gives DC category 0 = "00", category 2 = "011"; AC EOB (RS=0x00)
  * = "1010"; negative values send value+(1<<t)-1 in t bits (F.1.2.1.3).
  * Asserting the encoder's entropy bytes EQUAL the hand-packed bits pins
  * both sides of the wire to the spec; decoding then proves the decoder
  * reads the same spec back.
  */
class JpegCodecSpec extends AnyFunSuite {

  /** Entropy-coded bytes between the SOS header and EOI. */
  private def scanBytes(jpeg: Array[Byte]): Array[Byte] = {
    var pos = 2
    while (!(jpeg(pos) == 0xff.toByte && jpeg(pos + 1) == 0xda.toByte)) {
      pos += 2 + (((jpeg(pos + 2) & 0xff) << 8) | (jpeg(pos + 3) & 0xff))
    }
    val start = pos + 4 + (((jpeg(pos + 2) & 0xff) << 8) | (jpeg(pos + 3) & 0xff)) - 2
    jpeg.slice(start, jpeg.length - 2) // drop trailing EOI
  }

  test("single all-128 block encodes to the hand-packed bits 0x2B and decodes back") {
    // dc = 0 -> category 0 = "00"; EOB = "1010"; pad with 1s -> 00101011
    val jpeg = Multimodal.synthesizeJpegGrayBlocks(8, 8, (_, _) => 128)
    assert(scanBytes(jpeg).toSeq == Seq(0x2b.toByte))
    val px = Multimodal.decodeJpegGrayPixels(jpeg)
    assert(px.length == 64 && px.forall(b => (b & 0xff) == 128))
  }

  test("negative DC diff encodes via EXTEND's complement form and decodes back") {
    // block 0: v=128 (dc 0): "00" + "1010"
    // block 1: v=126 (dc -2, diff -2): category 2 = "011", bits -2+3=1 = "01",
    //          EOB "1010"  =>  001010 01101 1010 + pad "1" = 0x29 0xB5
    val jpeg = Multimodal.synthesizeJpegGrayBlocks(16, 8,
      (bx, _) => if (bx == 0) 128 else 126)
    assert(scanBytes(jpeg).toSeq == Seq(0x29.toByte, 0xb5.toByte))
    val px = Multimodal.decodeJpegGrayPixels(jpeg)
    assert(px.length == 128)
    for (y <- 0 until 8; x <- 0 until 16) {
      val want = if (x < 8) 128 else 126
      assert((px(y * 16 + x) & 0xff) == want, s"($x,$y)")
    }
  }

  test("round-trip matches the closed-form raster for 200 images, cropping included") {
    for (id <- 0L until 200L) {
      val w = (5L + id % 28L).toInt
      val h = (5L + (id * 5L + 40L) % 28L).toInt
      def v(bx: Int, by: Int): Int = ((id * 11L + bx * 37L + by * 101L) % 256L).toInt
      val jpeg = Multimodal.synthesizeJpegGrayBlocks(w, h, v)
      val px = Multimodal.decodeJpegGrayPixels(jpeg)
      assert(px.length == w * h, s"id=$id")
      for (y <- 0 until h; x <- 0 until w)
        assert((px(y * w + x) & 0xff) == v(x / 8, y / 8), s"id=$id ($x,$y)")
    }
  }

  test("0xFF00 byte stuffing (B.1.1.5) round-trips through the decoder") {
    // search two-block value pairs for a bit packing that emits a raw 0xFF
    // entropy byte — the encoder must stuff it with 0x00 and the decoder
    // must read through the stuffing transparently
    val found = (for {
      v1 <- (0 to 255).iterator; v2 <- (0 to 255).iterator
      jpeg = Multimodal.synthesizeJpegGrayBlocks(16, 8,
        (bx, _) => if (bx == 0) v1 else v2)
      sb = scanBytes(jpeg)
      i <- sb.indices.dropRight(1)
      if sb(i) == 0xff.toByte && sb(i + 1) == 0x00.toByte
    } yield (v1, v2, jpeg)).nextOption()
    assert(found.isDefined,
      "no two-block image produced a stuffed 0xFF byte — widen the search")
    val (v1, v2, jpeg) = found.get
    val px = Multimodal.decodeJpegGrayPixels(jpeg)
    for (y <- 0 until 8; x <- 0 until 16) {
      val want = if (x < 8) v1 else v2
      assert((px(y * 16 + x) & 0xff) == want, s"($x,$y) v1=$v1 v2=$v2")
    }
  }

  test("decoder rejects non-baseline and malformed containers") {
    val ok = Multimodal.synthesizeJpegGrayBlocks(8, 8, (_, _) => 7)
    intercept[IllegalArgumentException] {
      Multimodal.decodeJpegGrayPixels(ok.drop(2)) // no SOI
    }
    // flip SOF0 (C0) to progressive (C2): must refuse, not mis-decode
    val prog = ok.clone()
    val sofAt = prog.indices.find(i =>
      prog(i) == 0xff.toByte && prog(i + 1) == 0xc0.toByte).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(intercept[RuntimeException] {
      Multimodal.decodeJpegGrayPixels(prog)
    }.getMessage.contains("baseline"))
    // truncated entropy stream: fail loudly, never return garbage pixels
    intercept[RuntimeException] {
      Multimodal.decodeJpegGrayPixels(
        ok.dropRight(3) ++ Array(0xff.toByte, 0xd9.toByte))
    }
  }
}
