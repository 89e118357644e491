package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.QoiCodec

/** Byte-exact QOI vectors computed BY HAND from the public spec
  * (qoiformat.org/qoi-specification.pdf) — so a self-consistent but
  * spec-deviant encoder/decoder pair cannot hide behind roundtripping. */
class QoiCodecSpec extends AnyFunSuite {

  test("encoder emits the hand-computed byte stream (all op kinds reachable)") {
    // 2x2 image: (0,0,0) [= start register -> RUN 1], (0,0,1) [DIFF],
    // (100,10,20) [RGB; LUMA fails on dr-dg=90], (0,0,1) [INDEX slot 60:
    // hash = (0*3 + 0*5 + 1*7 + 255*11) % 64 = 2812 % 64 = 60]
    val px = Array(0, 0, 0, 0, 0, 1, 100, 10, 20, 0, 0, 1)
    val got = QoiCodec.encodeQoiRgb(2, 2, px)
    val want = Array[Int](
      'q', 'o', 'i', 'f', 0, 0, 0, 2, 0, 0, 0, 2, 3, 0, // header
      0xC0,                   // OP_RUN  len 1  (bias -1)
      0x6B,                   // OP_DIFF dr=0 dg=0 db=+1 -> 01 10 10 11
      0xFE, 100, 10, 20,      // OP_RGB
      0x3C,                   // OP_INDEX slot 60
      0, 0, 0, 0, 0, 0, 0, 1  // trailer
    ).map(_.toByte)
    assert(got.toSeq == want.toSeq)
    val dec = QoiCodec.decodeQoiRgb(got)
    assert(dec.w == 2 && dec.h == 2 && dec.px.toSeq == px.toSeq)
    assert(dec.ops == ((1L, 1L, 1L, 0L, 1L)), "run/index/diff/rgb on the wire")
  }

  test("62-run cap splits long runs; LUMA carries the head pixel") {
    // 65 x 1 constant (5,5,5): head pixel via LUMA (dg=5, dr-dg=db-dg=0),
    // then 64 repeats -> OP_RUN 62 + OP_RUN 2
    val px = Array.fill(65)(Array(5, 5, 5)).flatten
    val got = QoiCodec.encodeQoiRgb(65, 1, px)
    val body = got.slice(14, got.length - 8).map(_ & 0xff).toSeq
    assert(body == Seq(0x80 | 37, 0x88, 0xC0 | 61, 0xC0 | 1))
    val dec = QoiCodec.decodeQoiRgb(got)
    assert(dec.px.toSeq == px.toSeq && dec.ops._1 == 2L && dec.ops._4 == 1L)
  }

  test("wrapping diffs cross the 0/255 boundary per spec") {
    // 254 -> 255 -> 1: +1 then +2 (wraps 255 -> 1), both legal DIFF/LUMA
    val px = Array(254, 254, 254, 255, 255, 255, 1, 1, 1)
    val got = QoiCodec.encodeQoiRgb(3, 1, px)
    assert(QoiCodec.decodeQoiRgb(got).px.toSeq == px.toSeq)
  }

  test("roundtrip property over seeded random images") {
    val rnd = new scala.util.Random(41)
    (1 to 50).foreach { _ =>
      val w = 1 + rnd.nextInt(24); val h = 1 + rnd.nextInt(24)
      // mix flat regions (runs), small walks (diff/luma), and jumps (rgb)
      var (r, g, b) = (128, 128, 128)
      val px = new Array[Int](w * h * 3)
      (0 until w * h).foreach { i =>
        rnd.nextInt(4) match {
          case 0 => // hold -> runs
          case 1 => r = (r + rnd.nextInt(4) - 2) & 0xff
            g = (g + rnd.nextInt(4) - 2) & 0xff
            b = (b + rnd.nextInt(4) - 2) & 0xff
          case 2 => g = (g + rnd.nextInt(32) - 16) & 0xff
            r = (r + rnd.nextInt(8) - 4) & 0xff
          case _ => r = rnd.nextInt(256); g = rnd.nextInt(256)
            b = rnd.nextInt(256)
        }
        px(i * 3) = r; px(i * 3 + 1) = g; px(i * 3 + 2) = b
      }
      val dec = QoiCodec.decodeQoiRgb(QoiCodec.encodeQoiRgb(w, h, px))
      assert(dec.w == w && dec.h == h && dec.px.toSeq == px.toSeq)
    }
  }

  test("the synthesized corpus cards exercise every op kind") {
    var tot = (0L, 0L, 0L, 0L, 0L)
    (0L until 64L).foreach { id =>
      val (w, h, px) = QoiCodec.cardPixels(id, 100 + id * 37)
      val dec = QoiCodec.decodeQoiRgb(QoiCodec.encodeQoiRgb(w, h, px))
      assert(dec.px.toSeq == px.toSeq)
      tot = (tot._1 + dec.ops._1, tot._2 + dec.ops._2, tot._3 + dec.ops._3,
        tot._4 + dec.ops._4, tot._5 + dec.ops._5)
    }
    assert(tot._1 > 0 && tot._2 > 0 && tot._3 > 0 && tot._4 > 0 && tot._5 > 0,
      s"op mix degenerate: $tot")
  }
}
