package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Multimodal

/** Pins the Motion-JPEG AVI container walk. The JPEG frames themselves are
  * pinned bit-level by JpegCodecSpec; here the container contract is under
  * test: nested LIST recursion, word alignment, avih cross-checks, and
  * refusal of frame-count lies.
  */
class AviCodecSpec extends AnyFunSuite {

  private def frame(w: Int, h: Int, v: Int): Array[Byte] =
    Multimodal.synthesizeJpegGrayBlocks(w, h, (_, _) => v)

  test("multi-frame AVI round-trips every raster in order") {
    val avi = Multimodal.synthesizeAvi(16, 8,
      Seq(frame(16, 8, 10), frame(16, 8, 200), frame(16, 8, 77)))
    val (w, h, frames) = Multimodal.decodeAviFrames(avi)
    assert(w == 16 && h == 8 && frames.length == 3)
    assert(frames(0).forall(b => (b & 0xff) == 10))
    assert(frames(1).forall(b => (b & 0xff) == 200))
    assert(frames(2).forall(b => (b & 0xff) == 77))
  }

  test("odd-sized frame chunks keep the walk word-aligned") {
    // find a value whose one-block entropy length makes the whole frame
    // odd-sized (entropy is 1-3 bytes depending on the DC category), then
    // alternate it with even frames — a walker that forgets the pad byte
    // desyncs and dies on a bad fourcc
    val oddV = (0 to 255).find(v => frame(5, 5, v).length % 2 == 1)
    assert(oddV.isDefined, "no value produces an odd-length frame")
    val vals = Seq(oddV.get, 40, oddV.get, 41, oddV.get, 42)
    val (_, _, frames) = Multimodal.decodeAviFrames(
      Multimodal.synthesizeAvi(5, 5, vals.map(frame(5, 5, _))))
    assert(frames.length == 6)
    for (i <- vals.indices)
      assert(frames(i).forall(b => (b & 0xff) == vals(i)), s"frame $i")
  }

  test("rejects a header that lies about the frame count, and non-AVI RIFF") {
    val avi = Multimodal.synthesizeAvi(8, 8, Seq(frame(8, 8, 1), frame(8, 8, 2)))
    // dwTotalFrames lives 16 bytes into avih; avih data starts after
    // RIFF(12) + LIST hdr(8) + 'hdrl'(4) + chunk hdr(8) = byte 32
    val lying = avi.clone()
    lying(32 + 16) = 9
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodeAviFrames(lying)
    }.getMessage.contains("declares"))
    val wav = Multimodal.synthesizeWav(8000, Array[Short](1, 2))
    intercept[IllegalArgumentException] {
      Multimodal.decodeAviFrames(wav) // RIFF but WAVE, not 'AVI '
    }
  }
}
