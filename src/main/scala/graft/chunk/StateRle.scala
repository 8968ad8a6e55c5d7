package graft.chunk

/** Dictionary + run-length state chunk codec — the storage tier for
  * LOW-CARDINALITY series (language labels, HTTP status classes, floored
  * state bands), where [[Gorilla]]'s per-point XOR/bit-zone stream loses to
  * one record per RUN. Both streams are run-length encoded: timestamps as
  * (delta-of-delta, run-length) pairs — a regular cadence with occasional
  * gaps collapses to a handful of pairs — and values as (dictionary-code,
  * run-length) pairs. Classic columnar RLE + dictionary encoding (public
  * knowledge; the reference has no compression — north-rule addition,
  * SURVEY.md §2.10).
  *
  * Format (all varints are LEB128, little-endian 7-bit groups, zigzag for
  * signed quantities; exact enough that an oracle can recompute the blob
  * length from first principles — see GraftQueries.sqlCodecManifest):
  *   varint n                      — point count; n == 0 ends the blob
  *   zigzag-varint ts(0)           — first timestamp, epoch µs
  *   dod runs until n-1 deltas covered (delta(0) := 0, so the first
  *   encoded dod IS the first delta):
  *     zigzag-varint dod           — delta(i) - delta(i-1)
  *     varint runLen               — ≥ 1 consecutive equal dods
  *   varint dictSize               — distinct present values, first-appearance
  *   dictSize × 8 bytes            — raw IEEE-754 bits, little-endian
  *   value runs until n points covered:
  *     varint code                 — 0 = null run, else dictIndex + 1
  *     varint runLen               — ≥ 1
  *
  * Dictionary keys are the RAW double bits, so NaN payloads and -0.0 vs 0.0
  * round-trip byte-exactly (same contract as Gorilla). Pure deterministic
  * Scala over per-chunk arrays, invoked from already-grouped aggregations —
  * the distributed plan never sees row-at-a-time codec work.
  */
object StateRle {

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  /** LEB128 byte length of an unsigned varint — shared with the manifest
    * spec (the oracle mirrors this formula in SQL). */
  def varintLen(v: Long): Int = {
    var x = v; var n = 1
    while ((x & ~0x7fL) != 0L) { x >>>= 7; n += 1 }
    n
  }

  private final class Writer(initial: Int = 64) {
    private var buf = new Array[Byte](initial)
    private var pos = 0
    private def ensure(k: Int): Unit =
      if (pos + k > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, pos + k))
    def varint(v: Long): Unit = {
      ensure(10)
      var x = v
      while ((x & ~0x7fL) != 0L) { buf(pos) = ((x & 0x7f) | 0x80).toByte; pos += 1; x >>>= 7 }
      buf(pos) = x.toByte; pos += 1
    }
    def raw64(bits: Long): Unit = {
      ensure(8)
      var i = 0
      while (i < 8) { buf(pos + i) = (bits >>> (8 * i)).toByte; i += 1 }
      pos += 8
    }
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, pos)
  }

  private final class Reader(bytes: Array[Byte]) {
    private var pos = 0
    def varint(): Long = {
      var v = 0L; var shift = 0; var b = 0L
      do { b = bytes(pos) & 0xffL; pos += 1; v |= (b & 0x7f) << shift; shift += 7 } while ((b & 0x80L) != 0L)
      v
    }
    def raw64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      v
    }
  }

  /** Encode parallel arrays (sorted by t); vs(i) may be null. Inverse of
    * [[decode]]; byte length exactly matches [[encodedLen]]. */
  def encode(ts: Array[Long], vs: Array[java.lang.Double]): Array[Byte] = {
    val n = ts.length
    require(vs.length == n, "parallel arrays required")
    val w = new Writer(16 + n)
    w.varint(n.toLong)
    if (n == 0) return w.toBytes

    // timestamps: first raw, then RLE over delta-of-delta (delta(0) := 0)
    w.varint(zigzag(ts(0)))
    var i = 1
    while (i < n) {
      val dod = dodAt(ts, i)
      var j = i + 1
      while (j < n && dodAt(ts, j) == dod) j += 1
      w.varint(zigzag(dod))
      w.varint((j - i).toLong)
      i = j
    }

    // dictionary in first-appearance order, keyed by raw bits
    val dict = new java.util.LinkedHashMap[java.lang.Long, Integer]()
    i = 0
    while (i < n) {
      if (vs(i) != null) {
        val bits = java.lang.Double.doubleToRawLongBits(vs(i))
        if (!dict.containsKey(bits)) dict.put(bits, dict.size())
      }
      i += 1
    }
    w.varint(dict.size().toLong)
    val it = dict.keySet().iterator()
    while (it.hasNext) w.raw64(it.next())

    // value runs over codes (0 = null, else dictIndex + 1)
    def codeOf(j: Int): Long =
      if (vs(j) == null) 0L
      else dict.get(java.lang.Double.doubleToRawLongBits(vs(j))).toLong + 1L
    i = 0
    while (i < n) {
      val c = codeOf(i)
      var j = i + 1
      while (j < n && codeOf(j) == c) j += 1
      w.varint(c)
      w.varint((j - i).toLong)
      i = j
    }
    w.toBytes
  }

  /** delta(i) - delta(i-1) with delta(0) := 0 (so dodAt(_, 1) is the first
    * delta itself). */
  private def dodAt(ts: Array[Long], i: Int): Long = {
    val d = ts(i) - ts(i - 1)
    if (i == 1) d else d - (ts(i - 1) - ts(i - 2))
  }

  /** Decode back to parallel arrays; inverse of [[encode]]. */
  def decode(bytes: Array[Byte]): (Array[Long], Array[java.lang.Double]) = {
    val r = new Reader(bytes)
    val n = r.varint().toInt
    val ts = new Array[Long](n)
    val vs = new Array[java.lang.Double](n)
    if (n == 0) return (ts, vs)
    ts(0) = unzigzag(r.varint())
    var prevDelta = 0L
    var filled = 1
    while (filled < n) {
      val dod = unzigzag(r.varint())
      var len = r.varint()
      while (len > 0L) {
        prevDelta += dod
        ts(filled) = ts(filled - 1) + prevDelta
        filled += 1
        len -= 1L
      }
    }
    val dictSize = r.varint().toInt
    val dict = new Array[Double](dictSize)
    var i = 0
    while (i < dictSize) { dict(i) = java.lang.Double.longBitsToDouble(r.raw64()); i += 1 }
    filled = 0
    while (filled < n) {
      val c = r.varint()
      val len = r.varint().toInt
      val v: java.lang.Double = if (c == 0L) null else java.lang.Double.valueOf(dict(c.toInt - 1))
      i = 0
      while (i < len) { vs(filled) = v; filled += 1; i += 1 }
    }
    (ts, vs)
  }

  /** Exact byte length [[encode]] will produce — the manifest column the
    * oracle recomputes from the format spec (n, dod runs, dict size, value
    * runs), proving the format itself, not just the round-trip. */
  def encodedLen(ts: Array[Long], vs: Array[java.lang.Double]): Int =
    encode(ts, vs).length

  /** (n_runs, dict_size) of the VALUE stream from a blob's structure —
    * skips the timestamp runs and dictionary payload, walks the run
    * lists only. */
  def runStats(bytes: Array[Byte]): (Long, Long) = {
    val r = new Reader(bytes)
    val n = r.varint()
    if (n == 0L) return (0L, 0L)
    r.varint() // ts(0)
    var covered = 1L
    while (covered < n) { r.varint(); covered += r.varint() } // dod runs
    val dictSize = r.varint()
    var i = 0L
    while (i < dictSize) { r.raw64(); i += 1 }
    covered = 0L
    var runs = 0L
    while (covered < n) {
      r.varint() // code
      covered += r.varint()
      runs += 1
    }
    (runs, dictSize)
  }
}
