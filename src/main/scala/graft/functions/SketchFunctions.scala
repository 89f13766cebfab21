package graft.functions

import scala.collection.mutable

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass mergeable sketch aggregates. At 100 TB the difference between
  * these and the plain `groupBy(key).count` formulations is the shuffle:
  * a full groupBy moves the ENTIRE distinct-key space between executors
  * (billions of token keys), where a sketch aggregate ships one
  * fixed-size summary per map task and merges them associatively — the
  * same partial/final split Catalyst gives every built-in aggregate, with
  * state bounded by the capacity regardless of input size.
  */
object SketchFunctions {

  /** Misra–Gries heavy-hitters buffer: item → lower-bound count. */
  final class MgBuffer(val capacity: Int) {
    val map = new mutable.HashMap[UTF8String, Long]()
    var processed = 0L
  }

  /** Bottom-k sample buffer: md5-hex priority → item, trimmed to k. */
  final class BkBuffer(val k: Int) {
    val map = new java.util.TreeMap[String, UTF8String]()
  }

  /** Weighted sample buffer: (priority, item-string) → item, trimmed to k. */
  final class WbkBuffer(val k: Int) {
    val map = new mutable.TreeMap[(Double, String), UTF8String]()
  }

  /** Bounded top-k buffer: a binary heap over parallel (score, id) arrays
    * whose ROOT is the worst retained entry, so an insert against a full
    * buffer is one compare (reject) or one sift-down (evict the worst).
    * `asc = false` keeps the highest scores (cosine), `asc = true` the
    * lowest (Hamming); ties always prefer the smaller id. */
  final class TopKBuffer(val k: Int, val asc: Boolean) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0
    // "a is worse than b" in the retained order (the heap is worst-at-root)
    private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
      if (sa != sb) { if (asc) sa > sb else sa < sb } else ia > ib
    def insert(s: Double, id: Long): Unit = {
      if (size < k) {
        var i = size
        scores(i) = s; ids(i) = id; size += 1
        // sift up: a child worse than its parent swaps toward the root
        while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
          val p = (i - 1) / 2
          val ts = scores(i); val ti = ids(i)
          scores(i) = scores(p); ids(i) = ids(p)
          scores(p) = ts; ids(p) = ti
          i = p
        }
      } else if (size > 0 && worse(scores(0), ids(0), s, id)) {
        scores(0) = s; ids(0) = id
        // sift down toward the worse child
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = l + 1
          var w = i
          if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
          if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
          if (w == i) done = true
          else {
            val ts = scores(i); val ti = ids(i)
            scores(i) = scores(w); ids(i) = ids(w)
            scores(w) = ts; ids(w) = ti
            i = w
          }
        }
      }
    }
  }

  val descriptions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("mg_topk", classOf[MisraGriesTopK],
      (c: Seq[Expression]) => MisraGriesTopK(c(0),
        TextHashFunctions.intLit(c(1), "mg_topk"))),
    ("bottomk_sample", classOf[BottomKSample],
      (c: Seq[Expression]) => BottomKSample(c(0),
        TextHashFunctions.intLit(c(1), "bottomk_sample"))),
    ("weighted_bottomk", classOf[WeightedBottomK],
      (c: Seq[Expression]) => WeightedBottomK(c(0), c(1),
        TextHashFunctions.intLit(c(2), "weighted_bottomk"))),
    ("topk_by", classOf[TopKByScore],
      (c: Seq[Expression]) => TopKByScore(c(0), c(1),
        TextHashFunctions.intLit(c(2), "topk_by"),
        c.lift(3).exists(_.eval() match {
          case b: java.lang.Boolean => b.booleanValue()
          case other => throw new IllegalArgumentException(
            s"topk_by: ascending must be a boolean literal, got $other")
        }))))

  def register(spark: SparkSession): Unit =
    FunctionRegistration.register(spark, descriptions)

  import org.apache.spark.sql.functions.{call_function, lit}
  import org.apache.spark.sql.Column

  /** DataFrame-side helper (requires [[register]] or the extensions). */
  def mgTopK(item: Column, capacity: Int): Column =
    call_function("mg_topk", item, lit(capacity))

  /** DataFrame-side helper (requires [[register]] or the extensions). */
  def bottomKSample(item: Column, k: Int): Column =
    call_function("bottomk_sample", item, lit(k))

  /** DataFrame-side helper (requires [[register]] or the extensions). */
  def weightedBottomK(item: Column, weight: Column, k: Int): Column =
    call_function("weighted_bottomk", item, weight, lit(k))

  /** DataFrame-side helper (requires [[register]] or the extensions):
    * bounded mergeable per-group top-k by score — see [[TopKByScore]]. */
  def topKBy(score: Column, id: Column, k: Int,
      ascending: Boolean = false): Column =
    call_function("topk_by", score, id, lit(k), lit(ascending))
}

/** Misra–Gries heavy-hitters sketch (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012): at most `capacity`
  * (item, count) pairs where count is a LOWER bound underestimating the
  * true frequency by at most n/(capacity+1). Every item with true count
  * > n/(capacity+1) is guaranteed present — so a second cheap pass that
  * exact-counts only the returned candidates recovers the EXACT top-k
  * whenever the k-th item clears that share, without ever shuffling the
  * full key space.
  *
  * Returns array<struct<item string, count_lo bigint, processed bigint>>
  * sorted by (count_lo desc, item asc); `processed` (the aggregate's
  * total input size, same in every element) lets callers compute the
  * error bound n/(capacity+1) without a second aggregate.
  */
case class MisraGriesTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SketchFunctions.MgBuffer]
  with UnaryLike[Expression] {

  require(capacity > 0 && capacity <= (1 << 20),
    s"mg_topk capacity must be in (0, 2^20], got $capacity")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_topk requires a string column, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count_lo", LongType, nullable = false),
    StructField("processed", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): SketchFunctions.MgBuffer =
    new SketchFunctions.MgBuffer(capacity)

  override def update(buf: SketchFunctions.MgBuffer,
      input: InternalRow): SketchFunctions.MgBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.processed += 1
      val k = v.asInstanceOf[UTF8String]
      val cur = buf.map.getOrElse(k, -1L)
      if (cur >= 0) buf.map.update(k, cur + 1)
      else if (buf.map.size < capacity) {
        // the incoming UTF8String may point into a reused scan buffer —
        // copy before it becomes a map key
        buf.map.update(k.clone(), 1L)
      } else {
        // decrement-all: amortized O(1) per input (each decrement cancels
        // one prior increment); zeros evict
        buf.map.filterInPlace((_, c) => c > 1)
          .mapValuesInPlace((_, c) => c - 1)
      }
    }
    buf
  }

  override def merge(buf: SketchFunctions.MgBuffer,
      other: SketchFunctions.MgBuffer): SketchFunctions.MgBuffer = {
    other.map.foreach { case (k, c) =>
      buf.map.updateWith(k) { case prev => Some(prev.getOrElse(0L) + c) }
    }
    buf.processed += other.processed
    if (buf.map.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything and
      // evict the non-positives: ≤ capacity survivors, error bound adds
      val counts = buf.map.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1)
      buf.map.filterInPlace((_, c) => c > sub)
        .mapValuesInPlace((_, c) => c - sub)
    }
    buf
  }

  override def eval(buf: SketchFunctions.MgBuffer): Any = {
    val entries = buf.map.toArray
    // (count desc, item asc): deterministic regardless of hash-map order
    java.util.Arrays.sort(entries, (a: (UTF8String, Long), b: (UTF8String, Long)) => {
      val byCount = java.lang.Long.compare(b._2, a._2)
      if (byCount != 0) byCount else a._1.compareTo(b._1)
    })
    new GenericArrayData(entries.map { case (k, c) =>
      new GenericInternalRow(Array[Any](k, c, buf.processed))
    })
  }

  override def serialize(buf: SketchFunctions.MgBuffer): Array[Byte] = {
    var size = 4 + 8
    buf.map.foreach { case (k, _) => size += 4 + k.numBytes() + 8 }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.map.size)
    bb.putLong(buf.processed)
    buf.map.foreach { case (k, c) =>
      val bytes = k.getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SketchFunctions.MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new SketchFunctions.MgBuffer(capacity)
    val n = bb.getInt
    buf.processed = bb.getLong
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.map.update(UTF8String.fromBytes(arr), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)
  override def prettyName: String = "mg_topk"
}

/** Bounded per-group top-k by score — the shortlist/ranking stage of the
  * ANN tiers as a MERGEABLE aggregate. The window formulation
  * (`row_number() OVER (PARTITION BY query ORDER BY score)`) pushes the
  * ENTIRE scored frame — corpus × queries rows — through one Exchange
  * into as many partitions as there are queries, then sorts each: the
  * textbook scale-killer at corpus scale, and a parallelism ceiling of
  * #queries. This aggregate keeps a k-bounded heap per (task, group), so
  * map tasks ship ≤k entries per group and the cross product never
  * shuffles; the final merge is associative (Exchange carries
  * tasks × groups × k entries, not rows).
  *
  * Returns `array<struct<score double, id bigint>>` sorted best-first —
  * (score desc, id asc) when `ascending = false` (cosine), (score asc,
  * id asc) when true (Hamming) — so `posexplode` ordinal + 1 equals the
  * window's row_number exactly, ties included. Null score/id rows are
  * skipped (the never-match convention). Any numeric score casts to
  * double (exact for the int/float ranges the tiers produce). */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    ascending: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SketchFunctions.TopKBuffer]
  with BinaryLike[Expression] {

  require(k > 0 && k <= (1 << 22),
    s"topk_by k must be in (0, 2^22], got $k")

  override def left: Expression = score
  override def right: Expression = id
  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType.isInstanceOf[NumericType] && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_by requires (numeric score, bigint id), got " +
        s"${score.dataType.simpleString} / ${id.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): SketchFunctions.TopKBuffer =
    new SketchFunctions.TopKBuffer(k, ascending)

  // Spark's Decimal is not a java.lang.Number — a blanket Number cast
  // would pass analysis (DecimalType IS NumericType) then ClassCast at
  // execution; dispatch on the declared type once instead
  @transient private lazy val scoreToDouble: Any => Double =
    score.dataType match {
      case _: DecimalType =>
        v => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
      case _ => v => v.asInstanceOf[Number].doubleValue()
    }

  override def update(buf: SketchFunctions.TopKBuffer,
      input: InternalRow): SketchFunctions.TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(scoreToDouble(s), i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: SketchFunctions.TopKBuffer,
      other: SketchFunctions.TopKBuffer): SketchFunctions.TopKBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: SketchFunctions.TopKBuffer): Any = {
    val idx = Array.range(0, buf.size)
    val boxed = idx.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, (a: Integer, b: Integer) => {
      val byScore =
        if (ascending) java.lang.Double.compare(buf.scores(a), buf.scores(b))
        else java.lang.Double.compare(buf.scores(b), buf.scores(a))
      if (byScore != 0) byScore
      else java.lang.Long.compare(buf.ids(a), buf.ids(b))
    })
    new GenericArrayData(boxed.map(i =>
      new GenericInternalRow(Array[Any](buf.scores(i), buf.ids(i)))))
  }

  override def serialize(buf: SketchFunctions.TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SketchFunctions.TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new SketchFunctions.TopKBuffer(k, ascending)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKByScore = copy(score = newLeft, id = newRight)
  override def prettyName: String = "topk_by"
}

/** Deterministic bottom-k (KMV-family) sample: keeps the k DISTINCT items
  * whose md5 hex digest sorts smallest — a uniform without-replacement
  * sample when md5 spreads the items, with three properties a
  * rand()-based sample lacks at pipeline scale:
  *
  *  - REPLAYABLE: the winners are a pure function of the item values, so
  *    any engine (the DuckDB oracle replays it as `ORDER BY md5(item)
  *    LIMIT k`), any re-run, and any partitioning produce the SAME sample
  *    — the property the packing/split family already builds on
  *    (`Packing.assignSplit`'s md5 point).
  *  - BOUNDED + MERGEABLE: one ≤k-entry summary per map task, merged by
  *    union-and-trim; the shuffle carries tasks·k entries, not the group's
  *    rows — where the `row_number() OVER (ORDER BY md5(..))` formulation
  *    sorts every row of every group.
  *  - STABLE under appends: new items only enter the sample by beating
  *    the current k-th digest, so a grown corpus re-samples consistently
  *    (KMV's defining property).
  *
  * Duplicate item values collapse (set semantics — the digest is the
  * identity); returns array<string> of the winners sorted by digest, i.e.
  * in sample order.
  */
case class BottomKSample(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SketchFunctions.BkBuffer]
  with UnaryLike[Expression] {

  require(k > 0 && k <= (1 << 20),
    s"bottomk_sample k must be in (0, 2^20], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottomk_sample requires a string column (cast the id), got " +
        child.dataType.simpleString)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private def hex(item: UTF8String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(item.getBytes)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  override def createAggregationBuffer(): SketchFunctions.BkBuffer =
    new SketchFunctions.BkBuffer(k)

  override def update(buf: SketchFunctions.BkBuffer,
      input: InternalRow): SketchFunctions.BkBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      val h = hex(item)
      // skip the digest insert when it can't win: the common case on big
      // groups (k-th smallest stabilizes fast), keeps updates allocation-light
      if (buf.map.size < k || h.compareTo(buf.map.lastKey()) < 0) {
        buf.map.put(h, item.clone())
        if (buf.map.size > k) buf.map.remove(buf.map.lastKey())
      }
    }
    buf
  }

  override def merge(buf: SketchFunctions.BkBuffer,
      other: SketchFunctions.BkBuffer): SketchFunctions.BkBuffer = {
    buf.map.putAll(other.map)
    while (buf.map.size > k) buf.map.remove(buf.map.lastKey())
    buf
  }

  override def eval(buf: SketchFunctions.BkBuffer): Any = {
    val out = new Array[Any](buf.map.size)
    val it = buf.map.values().iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: SketchFunctions.BkBuffer): Array[Byte] = {
    var size = 4
    buf.map.forEach((h, v) => size += 4 + h.length + 4 + v.numBytes())
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.map.size)
    buf.map.forEach { (h, v) =>
      val hb = h.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      bb.putInt(hb.length); bb.put(hb)
      val vb = v.getBytes
      bb.putInt(vb.length); bb.put(vb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SketchFunctions.BkBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new SketchFunctions.BkBuffer(k)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val hb = new Array[Byte](bb.getInt); bb.get(hb)
      val vb = new Array[Byte](bb.getInt); bb.get(vb)
      buf.map.put(new String(hb, java.nio.charset.StandardCharsets.US_ASCII),
        UTF8String.fromBytes(vb))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKSample =
    copy(child = newChild)
  override def prettyName: String = "bottomk_sample"
}

/** Deterministic WEIGHTED k-sample without replacement (Efraimidis &
  * Spirakis 2006, A-ES): keep the k items with the smallest priority
  * `-ln(u)/w`, where u is the md5-derived uniform the packing/split
  * family already standardizes on (first 8 digest hex digits, +0.5, over
  * 2^32) and w the item's weight. Inclusion probability is proportional
  * to weight (quality-weighted corpus subsampling: heavier documents
  * draw in more often), yet the winners stay a pure function of the
  * (item, weight) values — replayable by any engine as `row_number()
  * OVER (ORDER BY -ln(u)/w, item)`, partitioning-independent, mergeable
  * (union-and-trim, ≤k entries per map task), and append-stable.
  *
  * The weight must be a function of the item (duplicates collapse on the
  * (priority, item) key); weights must be positive — null/non-positive
  * weights skip the row. Returns array<string> in priority order.
  */
case class WeightedBottomK(
    child: Expression,
    weight: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SketchFunctions.WbkBuffer]
  with BinaryLike[Expression] {

  require(k > 0 && k <= (1 << 20),
    s"weighted_bottomk k must be in (0, 2^20], got $k")

  override def left: Expression = child
  override def right: Expression = weight

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"weighted_bottomk requires a string item (cast the id), got " +
          child.dataType.simpleString)
    else if (!weight.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"weighted_bottomk requires a numeric weight, got " +
          weight.dataType.simpleString)
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private def weightAsDouble(w: Any): Double = w match {
    case d: java.lang.Double => d
    case f: java.lang.Float => f.toDouble
    case i: java.lang.Integer => i.toDouble
    case l: java.lang.Long => l.toDouble
    case s: java.lang.Short => s.toDouble
    case b: java.lang.Byte => b.toDouble
    case d: Decimal => d.toDouble
  }

  /** u in (0, 1): first 8 md5 hex digits as u32, +0.5, over 2^32 — the
    * exact point `Packing.assignSplit`'s oracle replays; the +0.5 keeps
    * ln() finite on the all-zero digest. */
  private def point(item: UTF8String): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(item.getBytes)
    var v = 0L
    var i = 0
    while (i < 4) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v + 0.5) / 4294967296.0
  }

  override def createAggregationBuffer(): SketchFunctions.WbkBuffer =
    new SketchFunctions.WbkBuffer(k)

  override def update(buf: SketchFunctions.WbkBuffer,
      input: InternalRow): SketchFunctions.WbkBuffer = {
    val v = child.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) {
      val wd = weightAsDouble(w)
      if (wd > 0 && !wd.isNaN) {
        val item = v.asInstanceOf[UTF8String]
        val p = -math.log(point(item)) / wd
        val key = (p, item.toString)
        if (buf.map.size < k || Ordering[(Double, String)].lt(key, buf.map.lastKey)) {
          buf.map.update(key, item.clone())
          if (buf.map.size > k) buf.map.remove(buf.map.lastKey): Unit
        }
      }
    }
    buf
  }

  override def merge(buf: SketchFunctions.WbkBuffer,
      other: SketchFunctions.WbkBuffer): SketchFunctions.WbkBuffer = {
    other.map.foreach { case (key, item) => buf.map.update(key, item) }
    while (buf.map.size > k) buf.map.remove(buf.map.lastKey): Unit
    buf
  }

  override def eval(buf: SketchFunctions.WbkBuffer): Any =
    new GenericArrayData(buf.map.values.toArray[Any])

  override def serialize(buf: SketchFunctions.WbkBuffer): Array[Byte] = {
    var size = 4
    buf.map.foreach { case (_, v) => size += 8 + 4 + v.numBytes() }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.map.size)
    buf.map.foreach { case ((p, _), v) =>
      bb.putDouble(p)
      val vb = v.getBytes
      bb.putInt(vb.length); bb.put(vb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SketchFunctions.WbkBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new SketchFunctions.WbkBuffer(k)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val p = bb.getDouble
      val vb = new Array[Byte](bb.getInt); bb.get(vb)
      val item = UTF8String.fromBytes(vb)
      buf.map.update((p, item.toString), item)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WeightedBottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WeightedBottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): WeightedBottomK =
    copy(child = newLeft, weight = newRight)
  override def prettyName: String = "weighted_bottomk"
}
