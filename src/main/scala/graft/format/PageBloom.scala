package graft.format

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** Per-page membership filter for equality page skipping.
  *
  * The prefix zone maps ([[StrawFormat.StatsPrefix]]) prune poorly when a
  * high-cardinality string column shares long prefixes — URLs, UUIDs with a
  * common stem, content digests: every page's 8-byte prefix [min, max]
  * covers the whole domain and an `=` probe keeps every page. An opt-in
  * per-page bloom filter (write option `bloomColumns`) closes that gap: the
  * writer hashes each non-null value of the page, and [[graft.spark
  * .ZoneMapFilter]] consults the filter for `EqualTo`/`In` probes — a page
  * whose filter excludes the literal provably holds no match and is
  * skipped. False positives only cost IO (the page is read and the filter
  * re-evaluated above the scan); false negatives cannot happen.
  *
  * The reference format has no per-page filter structure (its PageMeta is
  * length + num_values only, reference: src/lib.rs:75-80) — this is part of
  * the SURVEY §7.4 stats extension, same family as the zone maps.
  *
  * Layout (inside the footer, per page): `k` (1 byte) | `words` (u32,
  * number of 64-bit words, always a power of two) | words×8 bytes, LE.
  * Membership: double hashing `g_i = h1 + i*h2` (h2 forced odd) over the
  * xxh64 of the value's canonical encoding — raw UTF-8 bytes for strings,
  * the stats-domain long ([[graft.spark.ZoneMapFilter.toStatsLong]]
  * encoding) for long-backed types — with a FIXED seed, which makes the
  * hash function part of the on-disk format.
  */
object PageBloom {
  /** Fixed format-level seed (changing it invalidates every stored filter). */
  val Seed = 0x5741b007L

  /** Bloom size cap per page: at the default 64k-row pages this is ~16
    * bits/value worst case; beyond the cap the filter degrades (higher fpp)
    * rather than growing — footers stay bounded in the [[graft.spark
    * .FooterCache]]. */
  val MaxBytes: Int = 128 << 10

  /** Largest byte image [[build]] can emit: the 5-byte header (k + word
    * count) plus at most [[MaxBytes]] of filter words — the footer parser's
    * corruption bound. */
  val MaxEncodedBytes: Int = MaxBytes + 5
  private val MinBits = 64

  def hashBytes(b: Array[Byte], off: Int, len: Int): Long =
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET + off, len, Seed)
  def hashBytes(b: Array[Byte]): Long = hashBytes(b, 0, b.length)
  def hashLong(v: Long): Long = XXH64.hashLong(v, Seed)

  /** Leaf types that can build (and be probed through) a page bloom:
    * string/binary bytes and the long-backed family. Wide decimals (two
    * planes) and NullType are out. */
  def capable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType | BinaryType | BooleanType | ByteType | ShortType |
           IntegerType | LongType | DateType | TimestampType |
           TimestampNTZType | FloatType | DoubleType => true
      case d: DecimalType => d.precision <= 18
      case _ => false
    }
  }

  /** Build the filter over `hashes(0 until n)` sized for `fpp`, or null
    * when the page has no hashable values. */
  def build(hashes: Array[Long], n: Int, fpp: Double): Array[Byte] = {
    if (n == 0) return null
    // m = -n ln(p) / ln(2)^2, rounded up to a power of two within bounds
    val ideal = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    var bits = MinBits.toLong
    val capBits = MaxBytes * 8L
    while (bits < ideal && bits < capBits) bits <<= 1
    val k = math.max(1, math.min(8, math.round(bits.toDouble / n * math.log(2)).toInt))
    val words = new Array[Long]((bits >>> 6).toInt)
    val mask = bits - 1
    var i = 0
    while (i < n) {
      val h1 = hashes(i)
      val h2 = (h1 >>> 32) | 1L
      var j = 0
      while (j < k) {
        val bit = ((h1 + j * h2) & mask).toInt
        words(bit >>> 6) |= (1L << (bit & 63))
        j += 1
      }
      i += 1
    }
    val out = new Array[Byte](5 + words.length * 8)
    out(0) = k.toByte
    out(1) = (words.length & 0xff).toByte
    out(2) = ((words.length >>> 8) & 0xff).toByte
    out(3) = ((words.length >>> 16) & 0xff).toByte
    out(4) = ((words.length >>> 24) & 0xff).toByte
    var w = 0
    while (w < words.length) {
      var v = words(w)
      var b = 0
      while (b < 8) { out(5 + w * 8 + b) = (v & 0xff).toByte; v >>>= 8; b += 1 }
      w += 1
    }
    out
  }

  /** Conservative membership: true unless the filter PROVES absence (also
    * true on any malformed filter — pruning must never be load-bearing). */
  def mightContain(bloom: Array[Byte], hash: Long): Boolean = {
    if (bloom == null || bloom.length < 5) return true
    val k = bloom(0) & 0xff
    val nWords = (bloom(1) & 0xff) | ((bloom(2) & 0xff) << 8) |
      ((bloom(3) & 0xff) << 16) | ((bloom(4) & 0xff) << 24)
    // bound nWords BEFORE the length check: a crafted header declaring
    // ~2^29 words would overflow `5 + nWords * 8` right back to the actual
    // length and then index far out of bounds — malformed must mean "keep",
    // never a crash out of query planning
    if (k < 1 || nWords < 1 || nWords > MaxBytes / 8 ||
      bloom.length != 5 + nWords * 8 ||
      java.lang.Integer.bitCount(nWords) != 1) return true
    val mask = (nWords.toLong << 6) - 1
    val h2 = (hash >>> 32) | 1L
    var j = 0
    while (j < k) {
      val bit = ((hash + j * h2) & mask).toInt
      val w = bloom(5 + (bit >>> 6) * 8 + ((bit & 63) >>> 3))
      if (((w >>> (bit & 7)) & 1) == 0) return false
      j += 1
    }
    true
  }
}
