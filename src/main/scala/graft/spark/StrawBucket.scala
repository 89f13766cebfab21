package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Hash-bucketed table layout.
  *
  * `df.write.format("strawboat").option("bucketBy", "key").option("buckets", n)`
  * routes each row to one of `n` buckets by murmur3 of the key column; every
  * data file holds exactly one bucket, tagged in its NAME (`-bBBBBBofNNNNN`
  * before the extension) so planning needs zero extra IO to group or prune.
  *
  * Why it matters at scale: two large tables bucketed the same way join on
  * the bucket column with NO shuffle on either side — the scan reports
  * `KeyGroupedPartitioning(bucket(n, key))` and Spark's storage-partitioned
  * execution aligns bucket i with bucket i. Hive identity partitioning gives
  * the same for low-cardinality columns; bucketing extends it to
  * high-cardinality join keys (user id, order key) where a directory per
  * value is impossible. Equality filters on the key additionally prune to
  * 1/n of the files before any footer IO.
  *
  * The hash is fixed (murmur3, seed 42) and implemented once here for the
  * write path, the filter-pruning path, and the V2 `bucket` catalog function
  * that Spark's `V2ExpressionUtils` resolves transforms against — all three
  * must agree or co-location silently breaks.
  */
object StrawBucket {
  private val Seed = 42

  /** Types a bucket key may have: fixed-width integrals and strings — the
    * realistic join-key shapes. (Float/decimal equality is a modeling bug
    * more often than a join key; nested types have no stable hash.) */
  def bucketable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
        BooleanType | DateType | TimestampType => true
    case _ => false
  }

  /** The spec's column list: a comma-joined spelling ("a" or "a,b") split
    * into trimmed names. The SPELLING is canonical — tags hash it whole, so
    * every producer must join with bare commas in declared order. */
  def colsOf(spec: String): Seq[String] =
    spec.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  /** Murmur3 of an INTERNAL value (UTF8String for strings, micros for
    * timestamps) under `seed`. Null hashes are never taken — [[bucketOf]]
    * pins nulls. */
  private def hash(value: Any, dt: DataType, seed: Int): Int = dt match {
    case ByteType => Murmur3_x86_32.hashLong(value.asInstanceOf[Byte].toLong, seed)
    case ShortType => Murmur3_x86_32.hashLong(value.asInstanceOf[Short].toLong, seed)
    case IntegerType | DateType => Murmur3_x86_32.hashLong(value.asInstanceOf[Int].toLong, seed)
    case LongType | TimestampType => Murmur3_x86_32.hashLong(value.asInstanceOf[Long], seed)
    case BooleanType => Murmur3_x86_32.hashLong(if (value.asInstanceOf[Boolean]) 1L else 0L, seed)
    case StringType =>
      val s = value.asInstanceOf[UTF8String]
      Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
    case other =>
      throw new IllegalArgumentException(s"strawboat: unbucketable type $other")
  }

  /** Bucket of an internal value in [0, n). Nulls go to bucket 0 — a fixed,
    * documented choice both the writer and the pruner share. */
  def bucketOf(value: Any, dt: DataType, n: Int): Int =
    if (value == null) 0
    else {
      val h = hash(value, dt, Seed) % n
      if (h < 0) h + n else h
    }

  /** Bucket of a MULTI-column internal key in [0, n): per-value murmur3
    * chained through the seed (hash of value i seeds value i+1), the
    * HashExpression idiom. Nulls mix a fixed sentinel so (null, x) and
    * (x, null) differ; an all-null key pins to bucket 0, and a one-column
    * key reduces exactly to [[bucketOf]] — existing single-key tables'
    * layouts are untouched. */
  def bucketOfMulti(values: Array[Any], dts: Array[DataType], n: Int): Int = {
    var h = Seed
    var anyNonNull = false
    var i = 0
    while (i < values.length) {
      if (values(i) == null) h = Murmur3_x86_32.hashLong(-1L, h)
      else { h = hash(values(i), dts(i), h); anyNonNull = true }
      i += 1
    }
    if (!anyNonNull) 0
    else { val m = h % n; if (m < 0) m + n else m }
  }

  /** EXTERNAL (v1 Filter API) value to the internal shape [[hash]] takes;
    * None = unhashable value shape (dates/timestamps arrive as
    * java.sql/java.time — skip). */
  def internalOf(value: Any, dt: DataType): Option[Any] = (dt, value) match {
    case (_, null) => None
    case (StringType, s: String) => Some(UTF8String.fromString(s))
    case (ByteType, v: Byte) => Some(v)
    case (ShortType, v: Short) => Some(v)
    case (IntegerType, v: Int) => Some(v)
    case (LongType, v: Long) => Some(v)
    case (BooleanType, v: Boolean) => Some(v)
    case _ => None
  }

  /** Bucket of a filter-side (EXTERNAL) value: Scala/Java types as the
    * v1 Filter API carries them. None = unprunable value shape. */
  def bucketOfExternal(value: Any, dt: DataType, n: Int): Option[Int] =
    internalOf(value, dt).map(bucketOf(_, dt, n))

  /** Can this Spark's storage-partitioned execution use a MULTI-reference
    * bucket transform? Probed once against the running Catalyst instead of
    * hard-coding a version: Spark 4.1.2's
    * `KeyGroupedPartitioning.supportsExpressions` requires every transform
    * to have exactly one child (`isSupportedTransform`: children.size == 1,
    * verified against the 4.1.2 bytecode), so `bucket(n, a, b)` resolves
    * through V2ExpressionUtils but the scan's reported partitioning
    * downgrades to Unknown and no shuffle is saved. On a Spark that lifts
    * the limit this probe flips to true and the bucket-grouped layout
    * engages for multi-column keys with zero code change here. */
  lazy val spjSupportsMultiRef: Boolean =
    try {
      import org.apache.spark.sql.catalyst.expressions.AttributeReference
      val expr = org.apache.spark.sql.catalyst.expressions.TransformExpression(
        new BoundBucket(Array(LongType, LongType)),
        Seq(AttributeReference("a", LongType)(), AttributeReference("b", LongType)()),
        Some(8))
      org.apache.spark.sql.catalyst.plans.physical.KeyGroupedPartitioning
        .supportsExpressions(Seq(expr))
    } catch { case scala.util.control.NonFatal(_) => false }

  // ---- file-name tag ------------------------------------------------------

  /** 16-bit hash of the bucket COLUMN's (lowercased) name — baked into the
    * tag so a file is self-describing about WHAT it was hashed on. Without
    * it, a spec whose column diverged from the files' (a crashed rebucket,
    * a mis-optioned read) would prune/group by the wrong hash and silently
    * lose rows; with it, any divergence is detected per file and the
    * layout safely declines. */
  def colHash(col: String): Int = {
    val b = col.toLowerCase(java.util.Locale.ROOT).getBytes("UTF-8")
    Murmur3_x86_32.hashUnsafeBytes(b,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, Seed) & 0xffff
  }

  /** Inserted before the extension: `part-...-b00003of00016hA1B2.strb`. */
  def fileTag(bucket: Int, n: Int, col: String): String =
    f"-b$bucket%05dof$n%05dh${colHash(col)}%04X"

  /** One parsed tag: bucket ordinal, bucket count, and (absent only in
    * files from the short-lived pre-hash format) the column-name hash. */
  final case class Tag(bucket: Int, n: Int, colHash: Option[Int])

  private val TagRe = raw"-b(\d{5})of(\d{5})(h[0-9A-F]{4})?\.".r

  /** The bucket tag from a data-file path, if tagged. */
  def parseTag(path: String): Option[Tag] = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    TagRe.findFirstMatchIn(name).map(m => Tag(m.group(1).toInt, m.group(2).toInt,
      Option(m.group(3)).map(h => Integer.parseInt(h.substring(1), 16))))
  }

  /** Does this file's tag certify it holds bucket-of-`spec` data? Requires
    * the count AND the column hash to agree — an absent or foreign hash is
    * a divergence and the caller must not prune or group by it. */
  def tagMatches(tag: Tag, col: String, n: Int): Boolean =
    tag.n == n && tag.colHash.contains(colHash(col))

  /** Schema-only marker files (`part-empty-*`) carry no bucket; they are
    * legal in a bucketed table and invisible to the layout. */
  def isMarker(path: String): Boolean =
    path.substring(path.lastIndexOf('/') + 1).startsWith("part-empty-")

  // ---- table-level spec ---------------------------------------------------

  val PropBucketBy = "write.bucketBy"
  val PropBuckets = "write.buckets"

  /** The table's bucket spec from its (sidecar) properties, if declared. */
  def specFromProps(props: Map[String, String]): Option[(String, Int)] = {
    def get(k: String): Option[String] =
      props.collectFirst { case (key, v) if key.equalsIgnoreCase(k) => v }
    for (c <- get(PropBucketBy); n <- get(PropBuckets)) yield (c.trim, n.trim.toInt)
  }

  /** The spec persisted on disk: `_straw_table.json` properties. Catalog
    * tables record it at CREATE; a bucketed path write claims a minimal
    * sidecar at commit ([[recordSpec]]) so every later reader, mutation,
    * and maintenance pass resolves the layout with no options. */
  def specOf(dir: String): Option[(String, Int)] =
    try StrawTableSidecar.read(dir).flatMap(s => specFromProps(s.properties))
    catch { case scala.util.control.NonFatal(_) => None }

  /** `opts` with the table's persisted spec filled in — what MERGE inserts,
    * DML rewrites, and compaction call so their outputs keep the layout a
    * plain write established. No-op when `opts` already carries a spec or
    * the table has none. */
  def withTableSpec(dir: String, opts: graft.format.WriteOptions)
      : graft.format.WriteOptions =
    if (opts.buckets > 0) opts
    else specOf(dir) match {
      case Some((c, n)) => opts.copy(bucketBy = Some(c), buckets = n)
      case None => opts
    }

  private def stripSpec(props: Map[String, String]): Map[String, String] =
    props.filterNot { case (k, _) =>
      k.equalsIgnoreCase(PropBucketBy) || k.equalsIgnoreCase(PropBuckets) }

  /** Driver-side, at write-commit time: make the sidecar agree with this
    * write's layout. A bucketed write records its spec (claiming a minimal
    * sidecar on path tables that have none); an unbucketed TRUNCATE drops a
    * stale spec. Racing first writes both carry the same spec (the append
    * gate enforced it), so losing the claim is a no-op. */
  def recordSpec(dir: String, opts: graft.format.WriteOptions,
      truncate: Boolean): Unit = {
    val cur =
      try StrawTableSidecar.read(dir)
      catch { case scala.util.control.NonFatal(_) => return }
    if (opts.buckets > 0) {
      val col = opts.bucketBy.get
      val want = Map(PropBucketBy -> col, PropBuckets -> opts.buckets.toString)
      cur match {
        case None =>
          try StrawTableSidecar.claim(dir, StrawTableSidecar(Seq.empty, want))
          catch { case _: java.io.IOException => () } // racing writer recorded it
        case Some(s) =>
          val curSpec = specFromProps(s.properties)
          // a sidecar WITHOUT a spec (catalog metadata, stripped by an
          // unbucketed truncate) takes this write's spec like a fresh
          // claim; an existing DIFFERENT spec may only change on TRUNCATE
          // (it replaced every file) — the append gate refuses mismatched
          // appends up front, so reaching here on an append means a racing
          // writer: leave the sidecar alone, tag verification declines
          if (curSpec.isEmpty || (truncate && !curSpec.contains((col, opts.buckets))))
            StrawTableSidecar.write(dir,
              s.copy(properties = stripSpec(s.properties) ++ want))
      }
    } else if (truncate && cur.exists(s => specFromProps(s.properties).isDefined)) {
      val s = cur.get
      StrawTableSidecar.write(dir, s.copy(properties = stripSpec(s.properties)))
    }
  }

  // ---- V2 catalog function ------------------------------------------------

  /** The `bucket` function [[StrawCatalog]] serves. Spark's
    * storage-partitioned join resolves a scan-reported `bucket(n, col)`
    * transform by loading THIS function from the table's catalog and
    * binding it to `(int, colType)`; two scans whose bound functions share
    * a canonical name and bucket count are co-partitioned. The same
    * function is directly callable in SQL as `mycat.bucket(n, col)`. */
  object BucketFunction extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col[, col2…]) - murmur3 hash-bucket of the key in [0, n)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length >= 2,
        s"strawboat: bucket takes (numBuckets, col[, col2…]), got ${inputType.catalogString}")
      require(inputType.fields(0).dataType == IntegerType,
        s"strawboat: bucket's first argument is the int bucket count, got " +
          inputType.fields(0).dataType.catalogString)
      val keyTypes = inputType.fields.drop(1).map(_.dataType)
      keyTypes.foreach(kt => require(bucketable(kt),
        s"strawboat: unbucketable key type ${kt.catalogString}"))
      new BoundBucket(keyTypes)
    }
  }

  final class BoundBucket(keyTypes: Array[DataType]) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = IntegerType +: keyTypes
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    // keyed by the INPUT TYPES: co-partitioning requires the same hash of the
    // same physical values, which int vs string keys do not share
    override def canonicalName(): String =
      s"strawboat.bucket(${keyTypes.map(_.catalogString).mkString(",")})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      require(n >= 1, s"strawboat: bucket count must be positive, got $n")
      val vs = new Array[Any](keyTypes.length)
      var i = 0
      while (i < keyTypes.length) {
        vs(i) = if (input.isNullAt(i + 1)) null else input.get(i + 1, keyTypes(i))
        i += 1
      }
      Integer.valueOf(bucketOfMulti(vs, keyTypes, n))
    }
  }
}
