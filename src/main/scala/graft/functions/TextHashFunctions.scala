package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text hashing kernels for the dedup operators. The SQL
  * formulations (sequence + transform + substr + array_distinct, or
  * explode-tokens + 64 bit-vote aggregations) pay interpreted higher-order
  * dispatch and per-shingle string allocation per element; these walk the
  * UTF-8 bytes once per row inside whole-stage codegen. At 100 TB the shape
  * matters more than the constant: [[ShingleMinHash]] makes the MinHash
  * signature a MAP-ONLY projection — no shingle table is ever shuffled for
  * signatures, so the only shuffled relations are (doc, signature) and the
  * candidate pairs. */
private[functions] object TextHashKernel {
  val Seed = 42L // Spark's xxhash64 default seed

  /** Byte offsets of character boundaries; returns (bounds, nChars) with
    * bounds(nChars) == numBytes — or (null, numBytes) when the string is
    * pure ASCII (boundaries are the identity), which skips the per-call
    * bounds allocation on the dominant corpus shape. Callers treat a null
    * bounds array as `bounds(i) == i`. */
  def charBounds(base: AnyRef, off: Long, nb: Int): (Array[Int], Int) = {
    // 8-byte strided high-bit scan: pure-ASCII iff no byte has bit 7 set
    var acc = 0L
    var i = 0
    while (i + 8 <= nb) { acc |= Platform.getLong(base, off + i); i += 8 }
    var accB = 0
    while (i < nb) { accB |= Platform.getByte(base, off + i); i += 1 }
    if ((acc & 0x8080808080808080L) == 0L && (accB & 0x80) == 0) return (null, nb)
    val bounds = new Array[Int](nb + 1)
    var nChars = 0
    i = 0
    while (i < nb) {
      bounds(nChars) = i
      nChars += 1
      i += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + i))
    }
    bounds(nChars) = nb
    (bounds, nChars)
  }

  /** `bounds(i)` with the null-means-identity convention of [[charBounds]]. */
  @inline def boundAt(bounds: Array[Int], i: Int): Int =
    if (bounds == null) i else bounds(i)
}

/** Distinct xxhash64 values of the k-character shingles of `child` —
  * array<long>, one row-local pass. A string shorter than k characters
  * yields its own (truncated) hash, matching `substr(i, k)` semantics of
  * the SQL formulation it replaces. Set semantics downstream are preserved:
  * Jaccard over hashed shingles equals Jaccard over string shingles modulo
  * ~2^-64 collisions. */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"shingle_hashes expects string, got $other")
  }

  def compute(s: UTF8String): GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val (bounds, nChars) = TextHashKernel.charBounds(base, off, s.numBytes)
    val nWin = math.max(1, nChars - (k - 1))
    // open-addressing distinct set (0 needs a presence flag of its own)
    var cap = 8
    while (cap < nWin * 2) cap <<= 1
    val table = new Array[Long](cap)
    val present = new Array[Boolean](cap)
    val out = new Array[Long](nWin)
    var n = 0
    var w = 0
    while (w < nWin) {
      val startB = TextHashKernel.boundAt(bounds, w)
      val endB = TextHashKernel.boundAt(bounds, math.min(w + k, nChars))
      val h = XXH64.hashUnsafeBytes(base, off + startB, endB - startB, TextHashKernel.Seed)
      var slot = (h ^ (h >>> 29)).toInt & (cap - 1)
      var dup = false
      while (present(slot) && !dup) {
        if (table(slot) == h) dup = true else slot = (slot + 1) & (cap - 1)
      }
      if (!dup) {
        present(slot) = true
        table(slot) = h
        out(n) = h
        n += 1
      }
      w += 1
    }
    new GenericArrayData(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingler", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature of `child`'s k-character shingle set — array<long> of
  * `numHashes` minima of seeded mixes of the shingle hashes, computed in one
  * row-local pass (no shingle relation, no shuffle; duplicates can't change
  * a min so no distinct set is needed). */
case class ShingleMinHash(child: Expression, k: Int, numHashes: Int)
  extends UnaryExpression {
  require(k >= 1 && numHashes >= 1, s"bad params k=$k numHashes=$numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"minhash_signature expects string, got $other")
  }

  // per-function seeds, mirroring the seeded-xxhash64 family of the
  // aggregation formulation this replaces
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => i * 2654435761L + 42L)

  def compute(s: UTF8String): GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val (bounds, nChars) = TextHashKernel.charBounds(base, off, s.numBytes)
    val nWin = math.max(1, nChars - (k - 1))
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var w = 0
    while (w < nWin) {
      val startB = TextHashKernel.boundAt(bounds, w)
      val endB = TextHashKernel.boundAt(bounds, math.min(w + k, nChars))
      val h = XXH64.hashUnsafeBytes(base, off + startB, endB - startB, TextHashKernel.Seed)
      var j = 0
      while (j < numHashes) {
        val m = XXH64.hashLong(h, seeds(j))
        if (m < sig(j)) sig(j) = m
        j += 1
      }
      w += 1
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhasher", this, classOf[ShingleMinHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash-64 fingerprint in one row-local pass: whitespace-delimited
  * tokens (ASCII \s, matching Java regex `\\s+` splitting), xxhash64 per
  * occurrence, ±1 votes per bit, sign bits as the fingerprint — replacing
  * an explode + 64 bit-vote aggregations (a full token-table shuffle) with
  * a map-only projection. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"simhash64 expects string, got $other")
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  def compute(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes
    val votes = new Array[Int](64)
    var i = 0
    while (i < nb) {
      while (i < nb && isSpace(Platform.getByte(base, off + i))) i += 1
      val start = i
      while (i < nb && !isSpace(Platform.getByte(base, off + i))) i += 1
      if (i > start) {
        val h = XXH64.hashUnsafeBytes(base, off + start, i - start, TextHashKernel.Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhasher", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact Jaccard similarity of the k-character shingle-hash sets of two
  * strings, in one row-local pass — the LSH verify step as a pairwise
  * codegen'd expression. Joining texts onto the (pruned) candidate pairs
  * and verifying in place replaces a shingle relation + two joins + two
  * aggregations; per-pair cost is O(len_a + len_b). */
case class ShingleJaccard(left: Expression, right: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_jaccard expects (string, string), got $other")
    }

  private def distinctHashes(s: UTF8String): (Array[Long], Array[Boolean], Int, Int) = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val (bounds, nChars) = TextHashKernel.charBounds(base, off, s.numBytes)
    val nWin = math.max(1, nChars - (k - 1))
    var cap = 8
    while (cap < nWin * 2) cap <<= 1
    val table = new Array[Long](cap)
    val present = new Array[Boolean](cap)
    var n = 0
    var w = 0
    while (w < nWin) {
      val startB = TextHashKernel.boundAt(bounds, w)
      val endB = TextHashKernel.boundAt(bounds, math.min(w + k, nChars))
      val h = XXH64.hashUnsafeBytes(base, off + startB, endB - startB, TextHashKernel.Seed)
      var slot = (h ^ (h >>> 29)).toInt & (cap - 1)
      var dup = false
      while (present(slot) && !dup) {
        if (table(slot) == h) dup = true else slot = (slot + 1) & (cap - 1)
      }
      if (!dup) { present(slot) = true; table(slot) = h; n += 1 }
      w += 1
    }
    (table, present, cap, n)
  }

  def compute(a: UTF8String, b: UTF8String): Double = {
    val (tableA, presentA, capA, nA) = distinctHashes(a)
    // distinct windows of b: count intersections by probing a's set
    val base = b.getBaseObject
    val off = b.getBaseOffset
    val (bounds, nChars) = TextHashKernel.charBounds(base, off, b.numBytes)
    val nWin = math.max(1, nChars - (k - 1))
    var cap = 8
    while (cap < nWin * 2) cap <<= 1
    val table = new Array[Long](cap)
    val present = new Array[Boolean](cap)
    var nB = 0
    var inter = 0
    var w = 0
    while (w < nWin) {
      val startB = TextHashKernel.boundAt(bounds, w)
      val endB = TextHashKernel.boundAt(bounds, math.min(w + k, nChars))
      val h = XXH64.hashUnsafeBytes(base, off + startB, endB - startB, TextHashKernel.Seed)
      var slot = (h ^ (h >>> 29)).toInt & (cap - 1)
      var dup = false
      while (present(slot) && !dup) {
        if (table(slot) == h) dup = true else slot = (slot + 1) & (cap - 1)
      }
      if (!dup) {
        present(slot) = true; table(slot) = h; nB += 1
        var slotA = (h ^ (h >>> 29)).toInt & (capA - 1)
        var hit = false
        while (presentA(slotA) && !hit) {
          if (tableA(slotA) == h) hit = true else slotA = (slotA + 1) & (capA - 1)
        }
        if (hit) inter += 1
      }
      w += 1
    }
    val union = nA + nB - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jac", this, classOf[ShingleJaccard].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Space-joined word n-grams of `child` (whitespace tokenization, ASCII
  * `\s`, empty tokens dropped — the same semantics as
  * `split(trim(s), "\\s+")` windows joined with single spaces) as
  * array<string>, in ONE pass over the UTF-8 bytes. Replaces a
  * sequence+transform+slice+array_join SQL chain whose interpreted
  * higher-order dispatch dominated the decontamination scan (~10 µs per
  * gram); each gram is one byte copy here. Documents shorter than n words
  * yield an empty array. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"word_ngrams expects string, got $other")
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  def compute(s: UTF8String): GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes
    // token boundaries in one scan
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    var i = 0
    while (i < nb) {
      while (i < nb && isSpace(Platform.getByte(base, off + i))) i += 1
      val st = i
      while (i < nb && !isSpace(Platform.getByte(base, off + i))) i += 1
      if (i > st) {
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = st; ends(nTok) = i; nTok += 1
      }
    }
    val nWin = nTok - (n - 1)
    if (nWin <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nWin)
    var w = 0
    while (w < nWin) {
      var len = n - 1 // single joining spaces
      var t = w
      while (t < w + n) { len += ends(t) - starts(t); t += 1 }
      val bytes = new Array[Byte](len)
      var pos = 0
      t = w
      while (t < w + n) {
        if (t > w) { bytes(pos) = ' '; pos += 1 }
        val wl = ends(t) - starts(t)
        Platform.copyMemory(base, off + starts(t), bytes,
          Platform.BYTE_ARRAY_OFFSET + pos, wl)
        pos += wl
        t += 1
      }
      out(w) = UTF8String.fromBytes(bytes)
      w += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ngrams", this, classOf[WordNgrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextHashFunctions {
  private[functions] def intLit(e: Expression, what: String): Int = e.eval() match {
    case n: java.lang.Number => n.intValue()
    case other => throw new IllegalArgumentException(s"$what: expected integer literal, got $other")
  }

  /** (name, impl class, builder) of every text-hash function — shared by
    * [[register]] and [[graft.spark.GraftExtensions]]. */
  val descriptions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("shingle_hashes", classOf[ShingleHashes],
      (c: Seq[Expression]) => ShingleHashes(c(0), intLit(c(1), "shingle_hashes"))),
    ("minhash_signature", classOf[ShingleMinHash],
      (c: Seq[Expression]) => ShingleMinHash(c(0), intLit(c(1), "minhash_signature"),
        intLit(c(2), "minhash_signature"))),
    ("simhash64", classOf[SimHash64], (c: Seq[Expression]) => SimHash64(c(0))),
    ("shingle_jaccard", classOf[ShingleJaccard],
      (c: Seq[Expression]) => ShingleJaccard(c(0), c(1), intLit(c(2), "shingle_jaccard"))),
    ("word_ngrams", classOf[WordNgrams],
      (c: Seq[Expression]) => WordNgrams(c(0), intLit(c(1), "word_ngrams"))))

  /** Register the text-hash functions with the session. Idempotent. */
  def register(spark: SparkSession): Unit =
    FunctionRegistration.register(spark, descriptions)

  import org.apache.spark.sql.functions.{call_function, lit}

  def shingleHashes(spark: SparkSession, text: Column, k: Int): Column = {
    register(spark)
    call_function("shingle_hashes", text, lit(k))
  }

  def minHashSignature(spark: SparkSession, text: Column, k: Int, numHashes: Int): Column = {
    register(spark)
    call_function("minhash_signature", text, lit(k), lit(numHashes))
  }

  def simHash64(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("simhash64", text)
  }

  def shingleJaccard(spark: SparkSession, a: Column, b: Column, k: Int): Column = {
    register(spark)
    call_function("shingle_jaccard", a, b, lit(k))
  }

  def wordNgrams(spark: SparkSession, text: Column, n: Int): Column = {
    register(spark)
    call_function("word_ngrams", text, lit(n))
  }
}
