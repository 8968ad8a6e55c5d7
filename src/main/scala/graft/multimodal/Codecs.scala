package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codecs for two deterministic container formats — 24-bit
  * uncompressed BMP (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding)
  * and RIFF WAV PCM (canonical 44-byte header). No external libraries: the
  * formats are fixed-layout little-endian structs, so encode/parse are
  * plain ByteBuffer arithmetic. These make the multimodal decode path REAL
  * for images and audio (round-2 verdict #6); only video keeps the
  * declared stub (no pure-JVM video container is practical here).
  */
object Codecs {

  // ---------- BMP: 24-bit uncompressed, BITMAPINFOHEADER ----------

  /** Rows pad to 4-byte boundaries: stride = ceil(3w / 4) * 4. */
  def bmpRowStride(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Encode a width x height image; `rgb(x, y)` returns 0xRRGGBB with
    * (0,0) the TOP-left pixel (rows are written bottom-up per the spec). */
  def encodeBmp24(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad BMP dims $width x $height")
    val stride = bmpRowStride(width)
    val dataSize = stride * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize).putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val c = rgb(x, y)
        buf.put((c & 0xFF).toByte).put(((c >> 8) & 0xFF).toByte).put(((c >> 16) & 0xFF).toByte)
        x += 1
      }
      var p = 3 * width
      while (p < stride) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  final case class BmpHeader(width: Int, height: Int, bitCount: Int, dataOffset: Int)

  /** Parse the BITMAPFILEHEADER + BITMAPINFOHEADER; None unless the magic
    * and minimum length hold. */
  def parseBmpHeader(bytes: Array[Byte]): Option[BmpHeader] =
    if (bytes == null || bytes.length < 54 || bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte)
      None
    else {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      Some(BmpHeader(buf.getInt(18), buf.getInt(22), buf.getShort(28) & 0xFFFF, buf.getInt(10)))
    }

  /** Sanity bounds for a parsed header: 24-bit, positive dims that cannot
    * overflow the pixel-count arithmetic, and a data offset at or past the
    * 54-byte headers (a corrupt negative offset would otherwise pass the
    * length check and index out of bounds). */
  def plausible(h: BmpHeader): Boolean =
    h.bitCount == 24 && h.width > 0 && h.height > 0 &&
      h.width <= (1 << 20) && h.height <= (1 << 20) && h.dataOffset >= 54

  /** Decode 24-bit bottom-up pixel data to a TOP-down luminance grid
    * ((r+g+b)/3 per pixel). None for non-24-bit, implausible, or truncated
    * payloads. */
  def decodeBmp24Luma(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    parseBmpHeader(bytes)
      .filter(plausible)
      .flatMap { h =>
        val stride = bmpRowStride(h.width)
        if (bytes.length < h.dataOffset.toLong + stride.toLong * h.height) None
        else {
          val out = new Array[Byte](h.width * h.height)
          var y = 0
          while (y < h.height) {
            val rowOff = h.dataOffset + (h.height - 1 - y) * stride
            var x = 0
            while (x < h.width) {
              val b = bytes(rowOff + 3 * x) & 0xFF
              val g = bytes(rowOff + 3 * x + 1) & 0xFF
              val r = bytes(rowOff + 3 * x + 2) & 0xFF
              out(y * h.width + x) = ((r + g + b) / 3).toByte
              x += 1
            }
            y += 1
          }
          Some((h.width, h.height, out))
        }
      }

  // ---------- WAV: RIFF PCM, canonical 44-byte header ----------

  def encodeWavPcm(
      sampleRate: Int, channels: Int, bitsPerSample: Int, data: Array[Byte]): Array[Byte] = {
    require(channels > 0 && bitsPerSample % 8 == 0, s"bad WAV shape $channels ch $bitsPerSample bit")
    val buf = ByteBuffer.allocate(44 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1)
    buf.putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * bitsPerSample / 8)
      .putShort((channels * bitsPerSample / 8).toShort).putShort(bitsPerSample.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    buf.array()
  }

  final case class WavHeader(sampleRate: Int, channels: Int, bitsPerSample: Int, dataLen: Int) {
    def nSamples: Int = dataLen / math.max(channels * (bitsPerSample / 8), 1)
  }

  /** Field plausibility mirroring the BMP guard: a 'RIFF...WAVE'-tagged
    * blob with a corrupt fmt/data chunk (negative or over-length dataLen,
    * zero channels/bits) must fall back to None — not report garbage or
    * negative frame counts downstream. */
  def wavPlausible(h: WavHeader, totalLen: Int): Boolean =
    h.dataLen >= 0 && 44L + h.dataLen <= totalLen &&
      h.channels > 0 && h.bitsPerSample > 0 && h.bitsPerSample % 8 == 0 &&
      h.sampleRate > 0

  def parseWavHeader(bytes: Array[Byte]): Option[WavHeader] = {
    def tag(off: Int, s: String) =
      bytes.length >= off + 4 && s.getBytes("US-ASCII").indices.forall(i => bytes(off + i) == s.getBytes("US-ASCII")(i))
    if (bytes == null || bytes.length < 44 ||
      !tag(0, "RIFF") || !tag(8, "WAVE") || !tag(12, "fmt ") || !tag(36, "data")) None
    else {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      Some(WavHeader(
        sampleRate = buf.getInt(24),
        channels = buf.getShort(22) & 0xFFFF,
        bitsPerSample = buf.getShort(34) & 0xFFFF,
        dataLen = buf.getInt(40)))
        .filter(wavPlausible(_, bytes.length))
    }
  }
}
