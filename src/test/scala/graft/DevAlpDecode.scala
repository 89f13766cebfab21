package graft

/** Same-JVM interleaved A/B of ALP decode-loop variants on the q1 shape
  * (cents-like decimal doubles, f=0, e=2). Round-18 follow-up to the
  * recorded ~12% ALP read surcharge on full-aggregate scans: the decode
  * loop is the only per-value float work the ALP path adds over plain.
  *
  * Variants:
  *   A current   — digits(i).toDouble / div, doubleToLongBits, fresh out[]
  *   B raw+inplace — doubleToRawLongBits (no NaN branch: finite/10^e is
  *                   never NaN), write back into digits[]
  *   C int fast  — when every digit fits an int, loop over an int cast
  *                 (AVX2 vectorizes int→double; long→double needs AVX-512)
  */
object DevAlpDecode {
  private val F10: Array[Double] = (0 to 18).map(i => math.pow(10.0, i)).toArray

  def variantA(digits: Array[Long], n: Int, e: Int): Array[Long] = {
    val div = F10(e)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = java.lang.Double.doubleToLongBits(digits(i).toDouble / div)
      i += 1
    }
    out
  }

  def variantB(digits: Array[Long], n: Int, e: Int): Array[Long] = {
    val div = F10(e)
    var i = 0
    while (i < n) {
      digits(i) = java.lang.Double.doubleToRawLongBits(digits(i).toDouble / div)
      i += 1
    }
    digits
  }

  def variantC(digits: Array[Long], n: Int, e: Int): Array[Long] = {
    val div = F10(e)
    var fitsInt = true
    var i = 0
    while (i < n && fitsInt) {
      val d = digits(i)
      if (d > Int.MaxValue || d < Int.MinValue) fitsInt = false
      i += 1
    }
    if (!fitsInt) return variantB(digits, n, e)
    val ints = new Array[Int](n)
    i = 0
    while (i < n) { ints(i) = digits(i).toInt; i += 1 }
    i = 0
    while (i < n) {
      digits(i) = java.lang.Double.doubleToRawLongBits(ints(i).toDouble / div)
      i += 1
    }
    digits
  }

  /** Split the convert+divide (homogeneous FP loop — vcvtqq2pd + vdivpd
    * candidates) from the bitcast store (pure reinterpret loop). */
  def variantD(digits: Array[Long], n: Int, e: Int): Array[Long] = {
    val div = F10(e)
    val dbl = new Array[Double](n)
    var i = 0
    while (i < n) { dbl(i) = digits(i).toDouble / div; i += 1 }
    i = 0
    while (i < n) {
      digits(i) = java.lang.Double.doubleToRawLongBits(dbl(i)); i += 1
    }
    digits
  }

  def main(args: Array[String]): Unit = {
    val n = 65536
    val rnd = new java.util.Random(7)
    val base = Array.fill(n)((rnd.nextInt(2000000) - 1000000).toLong) // cents
    val e = 2
    val reps = 2000
    var blackhole = 0L
    def time(name: String, f: () => Array[Long]): Double = {
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) { blackhole ^= f()(r % n); r += 1 }
      (System.nanoTime() - t0) / 1e6
    }
    // correctness first: B and C must reproduce A bit-exactly
    val refA = variantA(base.clone(), n, e)
    assert(java.util.Arrays.equals(refA, variantB(base.clone(), n, e)), "B != A")
    assert(java.util.Arrays.equals(refA, variantC(base.clone(), n, e)), "C != A")
    assert(java.util.Arrays.equals(refA, variantD(base.clone(), n, e)), "D != A")
    // interleave rounds so JIT/GC drift hits all variants equally
    for (round <- 1 to 5) {
      val a = time("A", () => variantA(base.clone(), n, e))
      val b = time("B", () => variantB(base.clone(), n, e))
      val c = time("C", () => variantC(base.clone(), n, e))
      val dd = time("D", () => variantD(base.clone(), n, e))
      println(f"round $round%d  A=${a}%8.1f  B=${b}%8.1f  C=${c}%8.1f  D=${dd}%8.1f ms  (${reps}x${n} values)")
    }
    println(s"blackhole $blackhole")
  }
}
