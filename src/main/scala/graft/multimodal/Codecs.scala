package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codecs for three deterministic container formats — 24-bit
  * uncompressed BMP (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding),
  * RIFF WAV PCM (canonical 44-byte header), and RIFF AVI with uncompressed
  * DIB frames ('00db' chunks + idx1 index). No external libraries: the
  * formats are fixed-layout little-endian structs, so encode/parse are
  * plain ByteBuffer arithmetic / a bounded RIFF chunk walk. These make the
  * multimodal decode path REAL for images, audio AND video (compressed
  * codecs like H.264 stay out of scope — that part of a real pipeline is
  * a native library call; the container parsing, frame indexing and
  * Spark-side plumbing here are the deployment shape).
  */
object Codecs {

  // ---------- BMP: 24-bit uncompressed, BITMAPINFOHEADER ----------

  /** Rows pad to 4-byte boundaries: stride = ceil(3w / 4) * 4. Callers
    * must bound `width` first (decode does via [[plausible]]); the encoders
    * use [[bmpRowStrideL]] because 3·width wraps Int from width ≥ 715M and
    * a wrapped stride would sail through the size guards below. */
  def bmpRowStride(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Long-domain stride for encode-side size arithmetic. */
  def bmpRowStrideL(width: Int): Long = ((3L * width + 3) / 4) * 4

  /** Encode a width x height image; `rgb(x, y)` returns 0xRRGGBB with
    * (0,0) the TOP-left pixel (rows are written bottom-up per the spec). */
  def encodeBmp24(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad BMP dims $width x $height")
    val totalL = 54L + bmpRowStrideL(width) * height // Long end-to-end: no wrap
    require(totalL <= Int.MaxValue, s"BMP of $totalL bytes exceeds the 2 GiB blob limit")
    val stride = bmpRowStride(width)
    val dataSize = (totalL - 54L).toInt
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

  // ---------- AVI: RIFF container, uncompressed 24-bit DIB frames ----------
  //
  // Canonical layout this writer emits (all little-endian):
  //   0   RIFF <size> 'AVI '
  //   12  LIST 192 'hdrl'
  //   24    avih 56   (µs/frame, …, totalFrames @+16, streams=1, w @+32, h @+36)
  //   88    LIST 116 'strl'
  //   100     strh 56 ('vids'/'DIB ', scale=1, rate, length=totalFrames)
  //   164     strf 40 (BITMAPINFOHEADER, 24-bit, sizeImage=stride*h)
  //   212 LIST <4 + n*(8+frameSize)> 'movi'   ('00db' <frameSize> … per frame)
  //   …   idx1 <16*n> ('00db', AVIIF_KEYFRAME, offset-from-'movi', size)
  // Total bytes = 232 + n_frames * (24 + frameSize), frameSize = stride(w)*h.

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Encode frames of a width x height 24-bit video; `rgb(x, y, f)` returns
    * 0xRRGGBB for frame f with (0,0) the TOP-left pixel (rows stored
    * bottom-up like BMP). `rate` is frames/sec (scale fixed at 1). */
  def encodeAviDib(width: Int, height: Int, frames: Int, rgb: (Int, Int, Int) => Int,
      rate: Int = 25): Array[Byte] = {
    require(width > 0 && height > 0 && frames > 0 && rate > 0,
      s"bad AVI shape $width x $height x $frames @ $rate")
    // Long end-to-end: bmpRowStride's 3·width wraps Int from width ≥ 715M,
    // and a wrapped stride (or frame product) would sail through the guard
    // with a tiny bogus total. With frameSizeL capped at Int.MaxValue
    // first, frames·(24 + frameSizeL) ≤ 2^31 · (2^31 + 24) < Long.MaxValue,
    // so the total itself cannot wrap either.
    val frameSizeL = bmpRowStrideL(width) * height
    require(frameSizeL <= Int.MaxValue,
      s"AVI frame of $frameSizeL bytes exceeds the 2 GiB blob limit")
    val total = 232L + frames.toLong * (24L + frameSizeL)
    require(total <= Int.MaxValue, s"AVI of $total bytes exceeds the 2 GiB blob limit")
    val stride = bmpRowStride(width)
    val frameSize = frameSizeL.toInt
    val buf = ByteBuffer.allocate(total.toInt).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(fourcc("RIFF")).putInt(total.toInt - 8).put(fourcc("AVI "))
    buf.put(fourcc("LIST")).putInt(192).put(fourcc("hdrl"))
    buf.put(fourcc("avih")).putInt(56)
      .putInt(1000000 / rate).putInt(0).putInt(0).putInt(0x10 /* HASINDEX */)
      .putInt(frames).putInt(0).putInt(1).putInt(frameSize + 8)
      .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
    buf.put(fourcc("LIST")).putInt(116).put(fourcc("strl"))
    buf.put(fourcc("strh")).putInt(56)
      .put(fourcc("vids")).put(fourcc("DIB ")).putInt(0).putShort(0).putShort(0)
      .putInt(0).putInt(1).putInt(rate).putInt(0).putInt(frames)
      .putInt(frameSize + 8).putInt(0).putInt(0)
      .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    buf.put(fourcc("strf")).putInt(40)
      .putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(frameSize).putInt(0).putInt(0).putInt(0).putInt(0)
    buf.put(fourcc("LIST")).putInt(4 + frames * (8 + frameSize)).put(fourcc("movi"))
    var f = 0
    while (f < frames) {
      buf.put(fourcc("00db")).putInt(frameSize)
      var y = height - 1
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val c = rgb(x, y, f)
          buf.put((c & 0xFF).toByte).put(((c >> 8) & 0xFF).toByte).put(((c >> 16) & 0xFF).toByte)
          x += 1
        }
        var p = 3 * width
        while (p < stride) { buf.put(0.toByte); p += 1 }
        y -= 1
      }
      f += 1
    }
    buf.put(fourcc("idx1")).putInt(16 * frames)
    f = 0
    while (f < frames) {
      buf.put(fourcc("00db")).putInt(0x10).putInt(4 + f * (8 + frameSize)).putInt(frameSize)
      f += 1
    }
    buf.array()
  }

  final case class AviHeader(width: Int, height: Int, nFrames: Int, usPerFrame: Int)

  def aviPlausible(h: AviHeader): Boolean =
    h.width > 0 && h.height > 0 && h.width <= (1 << 20) && h.height <= (1 << 20) &&
      h.nFrames > 0 && h.nFrames <= (1 << 20) && h.usPerFrame > 0

  private def tagAt(bytes: Array[Byte], off: Int, s: String): Boolean =
    off >= 0 && bytes.length >= off + 4 && {
      val t = s.getBytes("US-ASCII"); t.indices.forall(i => bytes(off + i) == t(i))
    }

  /** Bounded RIFF chunk walk from `from` until `until`, yielding
    * (fourcc, dataOffset, dataSize); stops at the first malformed chunk
    * (negative/overflowing size). Honors the RIFF even-byte padding rule. */
  private def chunks(bytes: Array[Byte], from: Int, until: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var pos = from
      override def hasNext: Boolean = {
        if (pos + 8 > until) false
        else {
          val size = ByteBuffer.wrap(bytes, pos + 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
          size >= 0 && pos + 8L + size <= until
        }
      }
      override def next(): (String, Int, Int) = {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val size = ByteBuffer.wrap(bytes, pos + 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
        val r = (id, pos + 8, size)
        pos += 8 + size + (size & 1)
        r
      }
    }

  /** Find the LIST of the given type at the top level; (contentFrom,
    * contentUntil) spans the bytes AFTER the list-type fourcc. */
  private def findList(bytes: Array[Byte], listType: String): Option[(Int, Int)] =
    chunks(bytes, 12, bytes.length).collectFirst {
      case ("LIST", off, size) if tagAt(bytes, off, listType) => (off + 4, off + size)
    }

  /** Parse the avih main header out of LIST hdrl; None unless the RIFF/AVI
    * magic holds and the fields pass [[aviPlausible]]. */
  def parseAviHeader(bytes: Array[Byte]): Option[AviHeader] =
    if (bytes == null || bytes.length < 88 || !tagAt(bytes, 0, "RIFF") || !tagAt(bytes, 8, "AVI "))
      None
    else
      findList(bytes, "hdrl").flatMap { case (from, until) =>
        chunks(bytes, from, until).collectFirst { case ("avih", d, size) if size >= 40 =>
          val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
          AviHeader(
            width = buf.getInt(d + 32), height = buf.getInt(d + 36),
            nFrames = buf.getInt(d + 16), usPerFrame = buf.getInt(d))
        }.filter(aviPlausible)
      }

  /** The '00db'/'00dc' frame payloads from LIST movi, in stream order.
    * None when the container is unparseable; an empty Seq when movi holds
    * no frame chunks. */
  def decodeAviFrames(bytes: Array[Byte]): Option[Seq[Array[Byte]]] =
    parseAviHeader(bytes).flatMap { _ =>
      findList(bytes, "movi").map { case (from, until) =>
        chunks(bytes, from, until).collect {
          case (id, off, size) if id.length == 4 && (id.endsWith("db") || id.endsWith("dc")) =>
            java.util.Arrays.copyOfRange(bytes, off, off + size)
        }.toSeq
      }
    }
}
