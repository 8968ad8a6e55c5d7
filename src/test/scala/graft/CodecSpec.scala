package graft

import graft.multimodal.Codecs

/** Pure-JVM container codecs: encode -> parse roundtrips, row padding,
  * malformed-input rejection. */
class CodecSpec extends SparkSpec {

  test("BMP 24-bit roundtrip across padding widths") {
    for (w <- 1 to 9; h <- Seq(1, 3, 5)) {
      val bytes = Codecs.encodeBmp24(w, h, (x, y) => ((x * 37 + y * 101) % 256) * 0x010101)
      assert(bytes.length == 54 + h * Codecs.bmpRowStride(w), s"$w x $h size")
      val hd = Codecs.parseBmpHeader(bytes).get
      assert(hd.width == w && hd.height == h && hd.bitCount == 24 && hd.dataOffset == 54)
      val (dw, dh, luma) = Codecs.decodeBmp24Luma(bytes).get
      assert(dw == w && dh == h)
      // top-down pixel recovery through the bottom-up encoding
      for (y <- 0 until h; x <- 0 until w)
        assert((luma(y * w + x) & 0xFF) == (x * 37 + y * 101) % 256, s"pixel $x,$y of $w x $h")
    }
  }

  test("BMP parser rejects malformed input") {
    assert(Codecs.parseBmpHeader(Array[Byte](1, 2, 3)).isEmpty)
    assert(Codecs.parseBmpHeader("not a bitmap at all, just text".getBytes).isEmpty)
    val truncated = Codecs.encodeBmp24(8, 8, (_, _) => 0xFFFFFF).take(60)
    assert(Codecs.decodeBmp24Luma(truncated).isEmpty, "truncated pixel data must not decode")
  }

  test("WAV PCM roundtrip and sample accounting") {
    val data = Array.tabulate(480)(i => (i % 251).toByte)
    val bytes = Codecs.encodeWavPcm(16000, 2, 8, data)
    assert(bytes.length == 44 + 480)
    val h = Codecs.parseWavHeader(bytes).get
    assert(h.sampleRate == 16000 && h.channels == 2 && h.bitsPerSample == 8)
    assert(h.dataLen == 480 && h.nSamples == 240) // 2 channels x 1 byte
    assert(Codecs.parseWavHeader("RIFFxxxxNOPE".getBytes).isEmpty)
  }

  test("WAV parser rejects corrupt fmt/data fields (ADVICE r03)") {
    import java.nio.{ByteBuffer, ByteOrder}
    val good = Codecs.encodeWavPcm(16000, 2, 8, Array.tabulate(480)(_.toByte))
    def corrupt(f: ByteBuffer => Unit): Array[Byte] = {
      val b = good.clone()
      f(ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)); b
    }
    // negative dataLen, over-length dataLen, zero channels, zero bits —
    // all valid RIFF/WAVE magic, all must parse to None (not garbage
    // n_frames downstream)
    assert(Codecs.parseWavHeader(corrupt(_.putInt(40, -100))).isEmpty)
    assert(Codecs.parseWavHeader(corrupt(_.putInt(40, Int.MaxValue))).isEmpty)
    assert(Codecs.parseWavHeader(corrupt(_.putShort(22, 0))).isEmpty)
    assert(Codecs.parseWavHeader(corrupt(_.putShort(34, 0))).isEmpty)
    assert(Codecs.parseWavHeader(good).nonEmpty) // the clone() base is intact
  }

  test("AVI roundtrip: header fields, total size, per-frame pixel recovery") {
    for (w <- Seq(1, 4, 7); h <- Seq(1, 3); frames <- Seq(1, 4)) {
      def px(x: Int, y: Int, f: Int): Int = (x * 31 + y * 97 + f * 13) % 256
      val bytes = Codecs.encodeAviDib(w, h, frames, (x, y, f) => px(x, y, f) * 0x010101, rate = 30)
      val frameSize = Codecs.bmpRowStride(w) * h
      assert(bytes.length == 232 + frames * (24 + frameSize), s"$w x $h x $frames size")
      val hd = Codecs.parseAviHeader(bytes).get
      assert(hd.width == w && hd.height == h && hd.nFrames == frames)
      assert(hd.usPerFrame == 1000000 / 30)
      val decoded = Codecs.decodeAviFrames(bytes).get
      assert(decoded.length == frames)
      val stride = Codecs.bmpRowStride(w)
      for (f <- 0 until frames; y <- 0 until h; x <- 0 until w) {
        // bottom-up rows, blue byte first (gray frames: all channels equal)
        val b = decoded(f)((h - 1 - y) * stride + 3 * x) & 0xFF
        assert(b == px(x, y, f), s"pixel $x,$y frame $f of $w x $h")
      }
    }
  }

  test("AVI parser rejects malformed input") {
    assert(Codecs.parseAviHeader("RIFFxxxxAVI but not really a container".getBytes).isEmpty)
    assert(Codecs.parseAviHeader(Array[Byte](1, 2, 3)).isEmpty)
    val good = Codecs.encodeAviDib(6, 4, 2, (_, _, _) => 0x808080)
    import java.nio.{ByteBuffer, ByteOrder}
    def corrupt(f: ByteBuffer => Unit): Array[Byte] = {
      val b = good.clone()
      f(ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)); b
    }
    // avih data begins at 32: width @ +32 = 64, totalFrames @ +16 = 48
    assert(Codecs.parseAviHeader(corrupt(_.putInt(64, -5))).isEmpty, "negative width")
    assert(Codecs.parseAviHeader(corrupt(_.putInt(48, 0))).isEmpty, "zero frames")
    assert(Codecs.parseAviHeader(corrupt(_.putInt(16, -1))).isEmpty, "corrupt hdrl size")
    assert(Codecs.parseAviHeader(good).nonEmpty)
    // shallow truncation (into idx1 only): frames still decode
    val cutIdx = good.take(good.length - 10)
    assert(Codecs.parseAviHeader(cutIdx).nonEmpty)
    assert(Codecs.decodeAviFrames(cutIdx).get.length == 2)
    // deep truncation (into movi): header parses, frame walk refuses the
    // overflowing list instead of reading out of bounds
    val cutMovi = good.take(good.length - 50)
    assert(Codecs.parseAviHeader(cutMovi).nonEmpty)
    assert(Codecs.decodeAviFrames(cutMovi).isEmpty)
    // frame-size arithmetic that overflows Int must hit the 2 GiB guard,
    // not wrap into a negative/garbage allocation
    val big = intercept[IllegalArgumentException] {
      Codecs.encodeAviDib(1000000, 1000000, 1, (_, _, _) => 0)
    }
    assert(big.getMessage.contains("2 GiB"), big.getMessage)
    // width where 3·width wraps Int: a wrapped stride of 0 would sneak a
    // corrupt zero-frame AVI past the total-size guard
    val wide = intercept[IllegalArgumentException] {
      Codecs.encodeAviDib(1431655765, 1, 1, (_, _, _) => 0)
    }
    assert(wide.getMessage.contains("2 GiB"), wide.getMessage)
    val bmp = intercept[IllegalArgumentException] {
      Codecs.encodeBmp24(1431655765, 1, (_, _) => 0)
    }
    assert(bmp.getMessage.contains("2 GiB"), bmp.getMessage)
  }
}
