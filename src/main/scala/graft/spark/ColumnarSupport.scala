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
            var i = 0
            while (i < n) { v.putDouble(i, java.lang.Double.longBitsToDouble(vals(i))); i += 1 }
          case d: DecimalType => // precision <= 18: long-backed vector
            v.putLongs(0, n, vals, 0)
          case other => throw new UnsupportedOperationException(s"columnar fill: $other")
        }
        if (valid != null) {
          var i = 0
          while (i < n) { if (!valid(i)) v.putNull(i); i += 1 }
        }
      case bp: BinaryPage =>
        val valid = bp.valid
        // reserve the child byte vector once (putByteArray would otherwise
        // grow it repeatedly through doubling)
        v.arrayData().reserve(bp.offsets(n))
        var i = 0
        while (i < n) {
          if (valid != null && !valid(i)) v.putNull(i)
          else v.putByteArray(i, bp.bytes, bp.offsets(i), bp.offsets(i + 1) - bp.offsets(i))
          i += 1
        }
      case _: NullPage =>
        v.putNulls(0, n)
      case other =>
        throw new UnsupportedOperationException(s"columnar fill: ${other.getClass}")
    }
  }

  final class StrawColumnarReader(
      part: StrawInputPartition,
      requiredSchema: StructType)
    extends PartitionReader[ColumnarBatch] {

    private val input = StrawIO.open(part.path)
    private val (footer, resolved) =
      try {
        val f = FooterCache.get(part.path, input)
        // per-file name resolution (files in a dir may have evolved schemas)
        (f, StrawSchemaResolver.resolve(part.path, f.schema, requiredSchema))
      } catch { case e: Throwable => input.close(); throw e }
    private val pageRows: Array[Int] =
      if (footer.columns.isEmpty) Array.empty else footer.columns(0).pages.map(_.numValues)
    private val pageOffsets: Array[Array[Long]] = resolved.map { ci =>
      if (ci < 0) null else footer.columns(ci).pageOffsets
    }
    private var pageIdx = part.pageStart
    private var emitted = 0L
    private var batch: ColumnarBatch = _
    // vectors are reused across pages (reset, not reallocated)
    private var vectors: Array[OnHeapColumnVector] = _
    private var vectorCapacity = 0
    // zero-column files carry rows only in the footer (mirror of the row
    // reader's path): emit one vector-less batch of numRows
    private var zeroColDone = footer.columns.nonEmpty

    override def next(): Boolean = {
      if (!zeroColDone) {
        zeroColDone = true
        val n = math.min(footer.numRows, part.limit)
        if (n <= 0) return false
        if (requiredSchema.isEmpty)
          batch = new ColumnarBatch(Array.empty[ColumnVector], n.toInt)
        else {
          // zero-column file under a non-empty merged schema: null-fill
          // every required column (mirror of the row reader's path) so
          // downstream column access works
          vectors = OnHeapColumnVector.allocateColumns(n.toInt, requiredSchema)
          vectors.foreach(_.putNulls(0, n.toInt))
          batch = new ColumnarBatch(vectors.map(_.asInstanceOf[ColumnVector]), n.toInt)
        }
        return true
      }
      if (pageIdx >= part.pageEnd || emitted >= part.limit) return false
      val p = pageIdx
      pageIdx += 1
      val n = math.min(pageRows(p).toLong, part.limit - emitted).toInt
      if (n <= 0) return next()
      if (vectors == null || vectorCapacity < pageRows(p)) {
        if (vectors != null) vectors.foreach(_.close())
        vectors = OnHeapColumnVector.allocateColumns(pageRows(p), requiredSchema)
        vectorCapacity = pageRows(p)
        batch = new ColumnarBatch(vectors.map(_.asInstanceOf[ColumnVector]), n)
      } else {
        vectors.foreach(_.reset())
      }
      var c = 0
      while (c < resolved.length) {
        if (resolved(c) < 0) vectors(c).putNulls(0, pageRows(p))
        else {
          val cm = footer.columns(resolved(c))
          val pm = cm.pages(p)
          val bytes = input.readFully(pageOffsets(c)(p), pm.compLen.toInt)
          val page = PageDecoder.decode(footer.schema.fields(resolved(c)).dataType,
            ByteIO.reader(bytes))
          fill(vectors(c), requiredSchema.fields(c).dataType, page)
        }
        c += 1
      }
      emitted += n
      batch.setNumRows(n)
      true
    }

    override def get(): ColumnarBatch = batch

    override def close(): Unit = {
      if (batch != null) { batch.close(); batch = null; vectors = null } // closes vectors
      input.close()
    }
  }
}
