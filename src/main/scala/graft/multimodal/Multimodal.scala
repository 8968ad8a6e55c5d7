package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata. ALL THREE decode paths are REAL pure-JVM parsers
  * ([[Codecs]]: 24-bit BMP, RIFF WAV PCM, RIFF AVI with uncompressed DIB
  * frames — width/height/sample/frame metadata comes from the actual
  * binary headers, and frame sampling walks the actual movi chunk list).
  * Unrecognized bytes fall back to a clearly-marked deterministic stub so
  * every operator stays total. The Spark shape — schema, batch layout,
  * partition-preserving typed map, feature-vector layout — is the real
  * deployment shape throughout.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, modality: String, bytes: Array[Byte])
  case class DecodedRow(
      doc_id: Long, modality: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int, features: Array[Float])

  /** Dispatching decoder: real BMP/WAV/AVI header parses (falling back to
    * the stub on unrecognized bytes). Mapping: image -> (width, height,
    * 1 frame); audio -> (sample_rate as width, bits_per_sample as height,
    * n_samples as frames); video -> (width, height, total frames). */
  def decode(r: MediaRow): DecodedRow = r.modality match {
    case "image" =>
      // plausible() guards corrupt 'BM'-prefixed blobs (negative dims /
      // offsets, non-24-bit) — they fall back to the stub, not garbage
      Codecs.parseBmpHeader(r.bytes).filter(Codecs.plausible) match {
        case Some(h) =>
          DecodedRow(r.doc_id, r.modality, r.bytes.length, h.width, h.height, 1, histogram(r.bytes))
        case None => stubDecode(r)
      }
    case "audio" =>
      Codecs.parseWavHeader(r.bytes) match {
        case Some(h) =>
          DecodedRow(r.doc_id, r.modality, r.bytes.length,
            h.sampleRate, h.bitsPerSample, h.nSamples, histogram(r.bytes))
        case None => stubDecode(r)
      }
    case "video" =>
      Codecs.parseAviHeader(r.bytes) match {
        case Some(h) =>
          DecodedRow(r.doc_id, r.modality, r.bytes.length,
            h.width, h.height, h.nFrames, histogram(r.bytes))
        case None => stubDecode(r)
      }
    case _ => stubDecode(r)
  }

  /** 8-dim byte-histogram sketch (a real pipeline would emit a model
    * embedding here). */
  private def histogram(bytes: Array[Byte]): Array[Float] = {
    val n = bytes.length
    val feats = new Array[Float](8)
    var i = 0
    while (i < n) { feats(bytes(i) & 7) += 1f; i += 1 }
    if (n > 0) { var j = 0; while (j < 8) { feats(j) /= n; j += 1 } }
    feats
  }

  /** STUB decoder (unrecognized-bytes fallback only, now that all three
    * container parsers are real) — deterministic fake so the operators
    * stay total and tests are reproducible. */
  def stubDecode(r: MediaRow): DecodedRow = {
    val n = r.bytes.length
    // 64-bit arithmetic: n * 104729 overflows Int for payloads over ~20 KB
    // and Scala's % preserves sign, while the q30 DuckDB oracle evaluates
    // the same formula in 64-bit — so compute in Long, narrow at the end.
    val width = (16L + (n.toLong * 7919L) % 1024L).toInt
    val height = (16L + (n.toLong * 104729L) % 768L).toInt
    val frames = if (r.modality == "video") 1 + n % 32 else 1
    DecodedRow(r.doc_id, r.modality, n, width, height, frames, histogram(r.bytes))
  }

  /** Batch decode: typed partition-preserving map (no shuffle); the batch
    * shape (one partition = one decode task working set) is exactly what a
    * mapInPandas/mapInArrow deployment would see. */
  def decodeAll(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decode))
  }

  /** Frame sampling for "video" blobs: every strideth REAL '00db' DIB
    * frame payload off the AVI movi chunk list (frame rows carry (doc_id,
    * frame_idx, frame_bytes)); non-AVI bytes fall back to strideth
    * 256-byte windows so the operator stays total. Partition-preserving
    * flatMap — the explode-side plumbing a GPU decode stage would sit
    * behind. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media
      .filter(_.modality == "video")
      .flatMap { r =>
        Codecs.decodeAviFrames(r.bytes) match {
          case Some(frames) =>
            (0 until frames.length by stride).map(f => (r.doc_id, f, frames(f)))
          case None =>
            val frameSize = 256
            val nFrames = math.max(r.bytes.length / frameSize, 1)
            (0 until nFrames by stride).map { f =>
              val from = math.min(f * frameSize, r.bytes.length)
              val until = math.min(from + frameSize, r.bytes.length)
              (r.doc_id, f, java.util.Arrays.copyOfRange(r.bytes, from, until))
            }
        }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes")
  }

  /** REAL image resize: decode the 24-bit BMP pixel grid (bottom-up rows,
    * padding honored), then nearest-neighbor resample the luminance plane
    * to `width` x `height`. Non-BMP payloads fall back to a flat-byte
    * resample (the old stub behavior) so the operator stays total. The
    * Spark plumbing is the deployment shape: typed partition-preserving
    * map, no shuffle, explicit (doc_id, width, height, pixels) schema. */
  def resizeImages(media: Dataset[MediaRow], width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0 && width.toLong * height <= Int.MaxValue,
      s"target $width x $height must be positive and fit an Int pixel count")
    import media.sparkSession.implicits._
    media
      .filter(_.modality == "image")
      .map { r =>
        val out = new Array[Byte](width * height)
        Codecs.decodeBmp24Luma(r.bytes) match {
          case Some((sw, sh, luma)) =>
            var y = 0
            while (y < height) {
              val sy = (y.toLong * sh / height).toInt
              var x = 0
              while (x < width) {
                val sx = (x.toLong * sw / width).toInt
                out(y * width + x) = luma(sy * sw + sx)
                x += 1
              }
              y += 1
            }
          case None =>
            val n = r.bytes.length
            if (n > 0) {
              var i = 0
              while (i < out.length) {
                out(i) = r.bytes((i.toLong * n / out.length).toInt)
                i += 1
              }
            }
        }
        (r.doc_id, width, height, out)
      }
      .toDF("doc_id", "width", "height", "pixels")
  }

  /** Build a media table from documents with REAL container bytes:
    * image rows carry a deterministic 24-bit BMP (dims + pixel content
    * derived from doc_id/text), audio rows a RIFF WAV PCM blob, video
    * rows a RIFF AVI whose DIB frames sample the utf8(text) payload.
    * Deterministic, so the q30 oracle can replay the header arithmetic
    * from the documents table. */
  def mediaFromDocs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        def pay(i: Int): Int = if (payload.isEmpty) 0 else payload(i % payload.length) & 0xFF
        java.lang.Math.floorMod(id, 3L).toInt match {
          case 0 =>
            val w = 4 + java.lang.Math.floorMod(id, 13L).toInt
            val h = 3 + java.lang.Math.floorMod(id, 7L).toInt
            val bmp = Codecs.encodeBmp24(w, h, (x, y) => {
              val g = pay(x + y * w)
              (g << 16) | (g << 8) | g
            })
            MediaRow(id, "image", bmp)
          case 1 =>
            val sampleRate = 8000 + java.lang.Math.floorMod(id, 8L).toInt * 1000
            val channels = 1 + java.lang.Math.floorMod(id, 2L).toInt
            val nSamples = 16 + payload.length % 241
            val data = Array.tabulate(nSamples * channels)(i => pay(i).toByte)
            MediaRow(id, "audio", Codecs.encodeWavPcm(sampleRate, channels, 8, data))
          case _ =>
            val w = 4 + java.lang.Math.floorMod(id, 11L).toInt
            val h = 3 + java.lang.Math.floorMod(id, 5L).toInt
            val frames = 1 + java.lang.Math.floorMod(id, 6L).toInt
            val avi = Codecs.encodeAviDib(w, h, frames, (x, y, f) => {
              val g = pay(x + y * w + 17 * f)
              (g << 16) | (g << 8) | g
            })
            MediaRow(id, "video", avi)
        }
      }
      .toDF("doc_id", "modality", "bytes")
  }
}
