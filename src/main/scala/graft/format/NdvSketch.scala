package graft.format

/** Dense HyperLogLog sketch for per-column distinct-count estimation
  * (m = 512 byte registers, fed with the same xxhash64 family the page
  * blooms use). Standard error ≈ 1.04/√512 ≈ 4.6% — plenty for steering
  * cost-based join ordering, the sketch's only consumer.
  *
  * One sketch per TOP-LEVEL FLAT leaf accumulates across every page of a
  * file and lands in the footer's extension section; the scan merges the
  * surviving files' sketches register-wise (exact for HLL) and reports the
  * estimate through DSv2 `columnStats()`. Nested leaves carry no sketch:
  * Catalyst column statistics key on top-level attributes only, so the
  * bytes (and the per-value hash on e.g. embedding arrays) would buy
  * nothing. */
final class NdvSketch {
  val registers = new Array[Byte](NdvSketch.M)

  /** Feed one value's 64-bit hash. Top P bits pick the register; the rank
    * is the count of leading zeros in the remaining 64-P bits, + 1. */
  def addHash(h: Long): Unit = {
    val idx = (h >>> (64 - NdvSketch.P)).toInt
    val w = h << NdvSketch.P
    val rank =
      (if (w == 0L) 64 - NdvSketch.P
       else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > registers(idx)) registers(idx) = rank.toByte
  }
}

object NdvSketch {
  val P = 9
  val M = 1 << P // 512 registers, 512 bytes serialized
  private val Alpha = 0.7213 / (1.0 + 1.079 / M) // standard HLL bias constant

  /** Register-wise max merge of `src` into `acc` (HLL merge is exact). */
  def mergeInto(acc: Array[Byte], src: Array[Byte]): Unit = {
    var i = 0
    while (i < M) { if (src(i) > acc(i)) acc(i) = src(i); i += 1 }
  }

  /** Cardinality estimate: harmonic-mean HLL with the linear-counting
    * correction for the small range (empty registers present and the raw
    * estimate under 2.5m). No large-range correction — 64-bit hashes don't
    * saturate. */
  def estimate(registers: Array[Byte]): Long = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      val r = registers(i) & 0xff
      invSum += java.lang.Double.longBitsToDouble((1023L - r) << 52) // 2^-r
      if (r == 0) zeros += 1
      i += 1
    }
    val raw = Alpha * M.toDouble * M.toDouble / invSum
    val e =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.max(math.rint(e).toLong, if (zeros == M) 0L else 1L)
  }
}
