package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Multimodal

/** Pins the RIFF/WAVE PCM codec at the byte level. The hand-built fixture
  * is authored from the public RIFF spec (little-endian sizes, word
  * alignment), independent of the encoder.
  */
class WavCodecSpec extends AnyFunSuite {

  private def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def ascii(s: String) = s.getBytes("US-ASCII")

  test("hand-built two-sample fixture decodes exactly") {
    // RIFF( WAVE fmt (PCM,1ch,44100,16bit) data [1000, -2] )
    val fmt = le16(1) ++ le16(1) ++ le32(44100) ++ le32(88200) ++ le16(2) ++ le16(16)
    val data = le16(1000) ++ le16(0xfffe) // -2 as little-endian two's complement
    val body = ascii("WAVE") ++ ascii("fmt ") ++ le32(16) ++ fmt ++
      ascii("data") ++ le32(4) ++ data
    val wav = ascii("RIFF") ++ le32(body.length) ++ body
    val (rate, samples) = Multimodal.decodeWavSamples(wav)
    assert(rate == 44100)
    assert(samples.toSeq == Seq(1000.toShort, (-2).toShort))
  }

  test("odd-sized ancillary chunk honors word alignment; synthesized wav round-trips") {
    val src = Array.tabulate(300)(i => ((i * 13) % 65536 - 32768).toShort)
    val wav = Multimodal.synthesizeWav(8000, src)
    // the synthesized container really contains the odd LIST chunk
    assert(new String(wav, "ISO-8859-1").contains("LIST"))
    val (rate, samples) = Multimodal.decodeWavSamples(wav)
    assert(rate == 8000 && samples.toSeq == src.toSeq)
  }

  test("rejects float PCM, stereo, 8-bit, and truncated data") {
    val good = Multimodal.synthesizeWav(8000, Array[Short](1, 2, 3))
    def patched(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = v; b
    }
    // fmt chunk starts at byte 20 (RIFF8 + WAVE4 + id4 + size4)
    val fmtAt = 20
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodeWavSamples(patched(fmtAt, 3)) // format tag 3 = float
    }.getMessage.contains("PCM"))
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodeWavSamples(patched(fmtAt + 2, 2)) // 2 channels
    }.getMessage.contains("mono"))
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodeWavSamples(patched(fmtAt + 14, 8)) // 8-bit
    }.getMessage.contains("16-bit"))
    intercept[IllegalArgumentException] {
      Multimodal.decodeWavSamples(good.dropRight(2)) // truncated data chunk
    }
  }
}
