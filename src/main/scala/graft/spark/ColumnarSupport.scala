package graft.spark

import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

import graft.format._

/** Vectorized read support: one ColumnarBatch per page group, decoded pages
  * bulk-filled into OnHeapColumnVectors so everything above the scan stays
  * inside whole-stage codegen. Nested types fall back to the row reader. */
object ColumnarSupport {

  def isFlat(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | DateType |
         LongType | TimestampType | TimestampNTZType | FloatType | DoubleType |
         StringType | BinaryType => true
    case d: DecimalType => d.precision <= 18
    case _ => false
  }

  /** Vectorizable = flat, or a struct tree bottoming out in flat leaves
    * (struct levels carry a validity mask only, so row counts line up
    * across leaves). Maps stay on the row reader. */
  def isVectorizable(dt: DataType): Boolean = dt match {
    case s: StructType => s.fields.forall(f => isVectorizable(f.dataType))
    case a: ArrayType => isVectorizable(a.elementType)
    case other => isFlat(other)
  }

  /** Survivor compaction (in-reader filters / deletion vectors) copies
    * values between vectors — implemented for every vectorizable shape:
    * flat, struct trees, and arrays (an array column compacts by building
    * the surviving ELEMENT position list and recursing into the child —
    * the embeddings hot path, filtered vector columns, stays columnar). */
  def isCompactable(dt: DataType): Boolean = isVectorizable(dt)

  private def fill(v: OnHeapColumnVector, dt: DataType, page: DecodedPage): Unit = {
    val n = page.numValues
    page match {
      case lp: LongPage =>
        val vals = lp.values
        val valid = lp.valid
        // values first (bulk / branch-free: null slots hold the writer's
        // repeat-last filler, harmless under the null mask), then the mask
        dt match {
          case BooleanType =>
            var i = 0
            while (i < n) { v.putBoolean(i, vals(i) != 0L); i += 1 }
          case ByteType =>
            var i = 0
            while (i < n) { v.putByte(i, vals(i).toByte); i += 1 }
          case ShortType =>
            var i = 0
            while (i < n) { v.putShort(i, vals(i).toShort); i += 1 }
          case IntegerType | DateType =>
            var i = 0
            while (i < n) { v.putInt(i, vals(i).toInt); i += 1 }
          case LongType | TimestampType | TimestampNTZType =>
            v.putLongs(0, n, vals, 0)
          case FloatType =>
            var i = 0
            // low 32 bits regardless of codec sign/zero extension
            while (i < n) { v.putFloat(i, java.lang.Float.intBitsToFloat(vals(i).toInt)); i += 1 }
          case DoubleType =>
            // bit-identical reinterpretation: one bulk copy through a
            // scratch double[] instead of n scalar putDouble calls — the
            // TPC-H money columns' hot path
            val d = new Array[Double](n)
            org.apache.spark.unsafe.Platform.copyMemory(
              vals, org.apache.spark.unsafe.Platform.LONG_ARRAY_OFFSET,
              d, org.apache.spark.unsafe.Platform.DOUBLE_ARRAY_OFFSET, n * 8L)
            v.putDoubles(0, n, d, 0)
          case d: DecimalType =>
            // Spark backs precision <= 9 with an INT vector, 10..18 with long
            if (d.precision <= 9) {
              var i = 0
              while (i < n) { v.putInt(i, vals(i).toInt); i += 1 }
            } else v.putLongs(0, n, vals, 0)
          case other => throw new UnsupportedOperationException(s"columnar fill: $other")
        }
        if (valid != null) {
          var i = 0
          while (i < n) { if (!valid(i)) v.putNull(i); i += 1 }
        }
      case bp: BinaryPage =>
        val valid = bp.valid
        // the decoded page is already the vector's wire shape — one
        // contiguous byte run + offsets — so copy the bytes ONCE and
        // record per-row (offset, length) views; putByteArray would pay a
        // memcpy and an append-bookkeeping call per value
        val child = v.arrayData()
        val total = bp.offsets(n)
        child.reserve(total)
        child.putBytes(0, total, bp.bytes, 0)
        var i = 0
        while (i < n) {
          if (valid != null && !valid(i)) v.putNull(i)
          else v.putArray(i, bp.offsets(i), bp.offsets(i + 1) - bp.offsets(i))
          i += 1
        }
      case _: NullPage =>
        v.putNulls(0, n)
      case sp: StructPage =>
        // parent validity mask, then each child leaf into its child vector
        // (null parents leave child slots as filler — masked by the parent)
        val st = dt.asInstanceOf[StructType]
        if (sp.valid != null) {
          var i = 0
          while (i < n) { if (!sp.valid(i)) v.putNull(i); i += 1 }
        }
        var f = 0
        while (f < st.fields.length) {
          // reserve() on a struct vector resizes only its own buffers, not
          // its children's — a struct under an array (child count can exceed
          // the allocation-time 4x-rows child capacity) needs each field
          // vector grown explicitly before the bulk fill
          val cv = v.getChild(f).asInstanceOf[OnHeapColumnVector]
          cv.reserve(n)
          fill(cv, st.fields(f).dataType, sp.fields(f))
          f += 1
        }
      case ap: ArrayPage =>
        // per-row (offset, length) into a bulk-filled element child vector
        val elemDt = dt.asInstanceOf[ArrayType].elementType
        val childN = ap.child.numValues
        val childVec = v.arrayData().asInstanceOf[OnHeapColumnVector]
        childVec.reserve(childN)
        fill(childVec, elemDt, ap.child)
        var i = 0
        while (i < n) {
          if (ap.valid != null && !ap.valid(i)) v.putNull(i)
          else v.putArray(i, ap.childStart(i), ap.lengths(i))
          i += 1
        }
      case other =>
        throw new UnsupportedOperationException(s"columnar fill: ${other.getClass}")
    }
  }

  /** Survivor copy between long-backed / byte-backed vectors (compaction
    * after an in-reader filter). Only flat types appear here ([[isFlat]]);
    * struct and array shapes compact per-column in [[compactColumn]]. */
  private def copyValue(dt: DataType, src: OnHeapColumnVector, i: Int,
      dst: OnHeapColumnVector, j: Int): Unit = {
    if (src.isNullAt(i)) { dst.putNull(j); return }
    dt match {
      case BooleanType => dst.putBoolean(j, src.getBoolean(i))
      case ByteType => dst.putByte(j, src.getByte(i))
      case ShortType => dst.putShort(j, src.getShort(i))
      case IntegerType | DateType => dst.putInt(j, src.getInt(i))
      case LongType | TimestampType | TimestampNTZType => dst.putLong(j, src.getLong(i))
      case FloatType => dst.putFloat(j, src.getFloat(i))
      case DoubleType => dst.putDouble(j, src.getDouble(i))
      case d: DecimalType => // int-backed <= 9, long-backed 10..18
        if (d.precision <= 9) dst.putInt(j, src.getInt(i))
        else dst.putLong(j, src.getLong(i))
      case StringType | BinaryType =>
        val b = src.getBinary(i)
        dst.putByteArray(j, b, 0, b.length): Unit
      case other => throw new UnsupportedOperationException(s"columnar copy: $other")
    }
  }

  /** Compact one column: copy the `n` rows of `src` named by `positions`
    * into `dst[0..n)`. Flat values copy directly; a struct recurses into
    * each child over the SAME positions (null parents masked, child filler
    * copied harmlessly — identical to the page fill's layout); an array
    * writes compacted (offset, length) entries and recurses into the
    * element child over the surviving ELEMENT position list, so
    * arbitrarily nested array/struct trees compact without ever leaving
    * the columnar path. */
  private def compactColumn(dt: DataType, src: OnHeapColumnVector,
      positions: Array[Int], n: Int, dst: OnHeapColumnVector): Unit = dt match {
    case st: StructType =>
      var j = 0
      while (j < n) { if (src.isNullAt(positions(j))) dst.putNull(j); j += 1 }
      var f = 0
      while (f < st.fields.length) {
        // reserve() does not propagate to struct children; under an array
        // the survivor ELEMENT count can exceed the child vectors'
        // allocation-time capacity — grow each field vector to n first
        val dc = dst.getChild(f).asInstanceOf[OnHeapColumnVector]
        dc.reserve(n)
        compactColumn(st.fields(f).dataType,
          src.getChild(f).asInstanceOf[OnHeapColumnVector], positions, n, dc)
        f += 1
      }
    case at: ArrayType =>
      // pass 1: survivor (offset, length) entries + total element count
      var total = 0
      var j = 0
      while (j < n) {
        val i = positions(j)
        if (src.isNullAt(i)) dst.putNull(j)
        else {
          val len = src.getArrayLength(i)
          dst.putArray(j, total, len)
          total += len
        }
        j += 1
      }
      // pass 2: surviving element positions, then compact the child
      val childPos = new Array[Int](total)
      var k = 0
      j = 0
      while (j < n) {
        val i = positions(j)
        if (!src.isNullAt(i)) {
          val off = src.getArrayOffset(i)
          val len = src.getArrayLength(i)
          var e = 0
          while (e < len) { childPos(k) = off + e; k += 1; e += 1 }
        }
        j += 1
      }
      val srcChild = src.arrayData().asInstanceOf[OnHeapColumnVector]
      val dstChild = dst.arrayData().asInstanceOf[OnHeapColumnVector]
      dstChild.reserve(total)
      compactColumn(at.elementType, srcChild, childPos, total, dstChild)
    case flat =>
      var j = 0
      while (j < n) { copyValue(flat, src, positions(j), dst, j); j += 1 }
  }

  /** Vectorized reader. `readSchema` may extend the produced schema with
    * trailing filter-only columns (consumed filters whose columns Catalyst
    * pruned); `outCols` is the produced prefix width. `pred`, when non-null,
    * filters rows IN the reader (the filters were consumed — no Filter node
    * remains above): an all-pass page emits zero-copy, a mixed page
    * compacts survivors into a second vector set, an all-fail page is
    * skipped, and `part.limit` counts PASSING rows. `dead`, when non-null,
    * is the file's deletion-vector bitmap: dead ordinals are dropped by the
    * same survivor compaction (a page with no dead rows stays zero-copy, a
    * fully-dead page is skipped without decoding). */
  final class StrawColumnarReader(
      part: StrawInputPartition,
      readSchema: StructType,
      outCols: Int,
      pred: org.apache.spark.sql.catalyst.InternalRow => Boolean = null,
      dead: org.roaringbitmap.RoaringBitmap = null,
      mapping: ColumnMappingState = ColumnMappingState.Empty,
      appendPos: Boolean = false)
    extends PartitionReader[ColumnarBatch] {

    def this(part: StrawInputPartition, requiredSchema: StructType) =
      this(part, requiredSchema, requiredSchema.length, null, null)

    private val input = StrawIO.open(part.path)
    private val (footer, resolved) =
      try {
        val f = mapping.toLogicalFooter(FooterCache.get(part.path, input))
        // per-file name resolution (files in a dir may have evolved schemas)
        val r = StrawSchemaResolver.resolve(part.path, f.schema, readSchema)
        // backstop: the vectorized fill has no widening conversion — batch
        // planning routes type-widened tables to the row reader, so hitting
        // this means a planner path forgot to (fail loudly, never misread)
        r.zipWithIndex.foreach { case (ci, c) =>
          if (ci >= 0) {
            val fileDt = f.schema.fields(ci).dataType
            val readDt = readSchema.fields(c).dataType
            require(fileDt == readDt ||
              LeafLayout.pruneCompatible(fileDt, readDt),
              s"strawboat: widened column '${readSchema.fields(c).name}' in " +
                s"${part.path} requires the row reader")
          }
        }
        (f, r)
      } catch { case e: Throwable => input.close(); throw e }
    private val pageRows: Array[Int] =
      if (footer.columns.isEmpty) Array.empty else footer.columns(0).pages.map(_.numValues)
    // whole-file chaining (bucket partitions) passes pageEnd=MaxValue —
    // clamp to the real page count like the row reader does
    private val pageEnd: Int = math.min(part.pageEnd, pageRows.length)
    // file-absolute ordinal of each page's first row (deletion vectors,
    // the `_pos` metadata column)
    private val pageStartOrd: Array[Long] =
      if (dead == null && !appendPos) null else pageRows.scanLeft(0L)(_ + _)
    // `_pos` vector: appended AFTER the produced data prefix; refilled per
    // batch with the surviving rows' file-absolute ordinals
    private var posVec: OnHeapColumnVector = _
    private def withPos(vecs: Array[OnHeapColumnVector], cap: Int)
        : Array[ColumnVector] = {
      if (!appendPos) return vecs.map(_.asInstanceOf[ColumnVector])
      if (posVec == null)
        posVec = OnHeapColumnVector.allocateColumns(cap,
          StructType(Seq(org.apache.spark.sql.types.StructField("_pos",
            org.apache.spark.sql.types.LongType, nullable = false))))(0)
      else posVec.reserve(cap)
      (vecs :+ posVec).map(_.asInstanceOf[ColumnVector])
    }
    // survivor compaction engages when EITHER filter source is active
    private def filtering: Boolean = pred != null || dead != null
    // per-column leaf read plan (flat = one leaf, struct = its leaf set);
    // page byte offsets precomputed per leaf
    private val plans: Array[ProjCol] = resolved.zipWithIndex.map { case (ci, c) =>
      if (ci < 0) null else ProjCol.plan(footer, ci, readSchema.fields(c).dataType)
    }
    private val leafOffsets: Array[Array[Array[Long]]] = plans.map { pl =>
      if (pl == null) null else pl.globalLeaves.map(l => footer.columns(l).pageOffsets)
    }
    private val outSchema = StructType(readSchema.fields.take(outCols))
    private var pageIdx = part.pageStart
    private var emitted = 0L
    private var batch: ColumnarBatch = _
    // vectors are reused across pages (reset, not reallocated)
    private var vectors: Array[OnHeapColumnVector] = _
    private var fullBatch: ColumnarBatch = _ // over all read columns (pred view)
    private var outBatch: ColumnarBatch = _ // over the produced prefix
    private var compactVectors: Array[OnHeapColumnVector] = _
    private var compactBatch: ColumnarBatch = _
    private var selection: Array[Int] = _
    private var vectorCapacity = 0
    // zero-column files carry rows only in the footer (mirror of the row
    // reader's path): emit one vector-less batch of numRows
    private var zeroColDone = footer.columns.nonEmpty

    override def next(): Boolean = {
      if (!zeroColDone) {
        zeroColDone = true
        // a zero-column file reads as all-null rows: a predicate evaluates
        // once against one all-null row (comparisons are UNKNOWN → fail;
        // IsNull passes) and applies to every row uniformly
        if (pred != null && !pred(
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            readSchema.length))) return false
        val live =
          if (dead == null) footer.numRows
          else math.max(0L, footer.numRows - dead.getLongCardinality)
        val n = math.min(live, part.limit)
        if (n <= 0) return false
        val zeroVecs =
          if (outSchema.isEmpty) Array.empty[OnHeapColumnVector]
          else {
            // zero-column file under a non-empty merged schema: null-fill
            // every required column (mirror of the row reader's path) so
            // downstream column access works
            vectors = OnHeapColumnVector.allocateColumns(n.toInt, outSchema)
            vectors.foreach(_.putNulls(0, n.toInt))
            vectors
          }
        if (appendPos) {
          // live ordinals advance past dead rows (mirror of the row
          // reader's zero-column PosIterator)
          val cols = withPos(zeroVecs, n.toInt)
          var ord = -1L
          var j = 0
          while (j < n.toInt) {
            ord += 1
            if (dead != null) while (dead.contains(ord.toInt)) ord += 1
            posVec.putLong(j, ord)
            j += 1
          }
          batch = new ColumnarBatch(cols, n.toInt)
        } else
          batch = new ColumnarBatch(
            zeroVecs.map(_.asInstanceOf[ColumnVector]), n.toInt)
        return true
      }
      while (pageIdx < pageEnd && emitted < part.limit) {
        val p = pageIdx
        pageIdx += 1
        val n0 = pageRows(p)
        val deadInPage =
          if (dead == null || n0 == 0) 0L
          else dead.rangeCardinality(pageStartOrd(p), pageStartOrd(p) + n0)
        // a fully-dead page is skipped without decoding a byte
        if (n0 > 0 && deadInPage < n0) {
          if (vectors == null || vectorCapacity < n0) {
            if (vectors != null) vectors.foreach(_.close())
            if (compactVectors != null) compactVectors.foreach(_.close())
            vectors = OnHeapColumnVector.allocateColumns(n0, readSchema)
            fullBatch = new ColumnarBatch(vectors.map(_.asInstanceOf[ColumnVector]), n0)
            outBatch =
              if (outCols == readSchema.length && !appendPos) fullBatch
              else new ColumnarBatch(withPos(vectors.take(outCols), n0), n0)
            compactVectors =
              if (!filtering) null else OnHeapColumnVector.allocateColumns(n0, outSchema)
            compactBatch =
              if (!filtering) null
              else new ColumnarBatch(withPos(compactVectors, n0), n0)
            selection = if (!filtering) null else new Array[Int](n0)
            vectorCapacity = n0
          } else {
            vectors.foreach(_.reset())
          }
          var c = 0
          while (c < resolved.length) {
            if (resolved(c) < 0) vectors(c).putNulls(0, n0)
            else {
              val pl = plans(c)
              // decode each leaf page, reassemble (flat = the leaf itself)
              val leaves = new Array[(Array[LevelHeader], DecodedPage)](
                pl.globalLeaves.length)
              var li = 0
              while (li < pl.globalLeaves.length) {
                val cm = footer.columns(pl.globalLeaves(li))
                val bytes = input.readFully(leafOffsets(c)(li)(p),
                  cm.pages(p).compLen.toInt)
                leaves(li) = LeafDecoder.decode(pl.levelKinds(li), pl.leafDts(li),
                  ByteIO.reader(bytes))
                li += 1
              }
              fill(vectors(c), readSchema.fields(c).dataType,
                LeafDecoder.assemble(readSchema.fields(c).dataType, leaves))
            }
            c += 1
          }
          if (pred == null && deadInPage == 0L) {
            val n = math.min(n0.toLong, part.limit - emitted).toInt
            if (n > 0) {
              if (appendPos) {
                var j = 0
                while (j < n) { posVec.putLong(j, pageStartOrd(p) + j); j += 1 }
              }
              emitted += n
              outBatch.setNumRows(n)
              batch = outBatch
              return true
            }
          } else {
            // survivor selection: deletion vector first (a dead row must
            // never reach the predicate), then the consumed filters
            fullBatch.setNumRows(n0)
            var nSel = 0
            var i = 0
            while (i < n0 && emitted + nSel < part.limit) {
              val alive = deadInPage == 0L ||
                !dead.contains((pageStartOrd(p) + i).toInt)
              if (alive && (pred == null || pred(fullBatch.getRow(i)))) {
                selection(nSel) = i; nSel += 1
              }
              i += 1
            }
            if (nSel == n0 && outCols == readSchema.length) {
              // every row passed and nothing to project away: zero copy
              if (appendPos) {
                var j = 0
                while (j < nSel) { posVec.putLong(j, pageStartOrd(p) + j); j += 1 }
              }
              emitted += nSel
              outBatch.setNumRows(nSel)
              batch = outBatch
              return true
            } else if (nSel > 0) {
              compactVectors.foreach(_.reset())
              var c2 = 0
              while (c2 < outCols) {
                compactColumn(outSchema.fields(c2).dataType, vectors(c2),
                  selection, nSel, compactVectors(c2))
                c2 += 1
              }
              if (appendPos) {
                var j = 0
                while (j < nSel) {
                  posVec.putLong(j, pageStartOrd(p) + selection(j))
                  j += 1
                }
              }
              emitted += nSel
              compactBatch.setNumRows(nSel)
              batch = compactBatch
              return true
            }
            // all rows failed: fall through to the next page
          }
        }
      }
      false
    }

    override def get(): ColumnarBatch = batch

    override def close(): Unit = {
      // close every allocated vector exactly once (batches share vectors)
      if (vectors != null) { vectors.foreach(_.close()); vectors = null }
      if (compactVectors != null) { compactVectors.foreach(_.close()); compactVectors = null }
      if (posVec != null) { posVec.close(); posVec = null }
      batch = null
      input.close()
    }
  }
}
