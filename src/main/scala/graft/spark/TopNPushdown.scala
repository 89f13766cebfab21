package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.SQLOrderingUtil
import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection, SortOrder}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.format.{PageMeta, StrawFormat}

/** Partial Top-N pushdown: each scan partition returns only its own top-k
  * candidates (Spark still applies the global sort+limit above, so emitting
  * a superset per partition is always correct). Two effects compound at
  * scale: (a) at most k rows per partition cross the scan boundary, and
  * (b) once a partition's candidate buffer is full, pages whose zone-map
  * bound on the primary sort column provably cannot beat the current k-th
  * candidate are skipped without IO — a sorted-ish table answers ORDER BY x
  * LIMIT k from a handful of pages. */
object TopNPushdown {

  final case class SortCol(name: String, desc: Boolean, nullsFirst: Boolean)
  final case class Spec(cols: Seq[SortCol], limit: Int)

  // bound candidate-buffer memory: each partition holds up to k row COPIES
  // on heap; beyond this, Spark's own spill-capable sort is the better plan
  private val MaxPushedLimit = 1 << 16

  private def comparable(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         DateType | TimestampType | TimestampNTZType | FloatType | DoubleType |
         StringType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Accept when every sort key is a plain top-level column of a comparable
    * type. Page-bound skipping additionally needs StatsSigned zone maps on
    * the FIRST key (checked per file at read time); other keys only need a
    * row comparator. */
  def translate(orders: Array[SortOrder], schema: StructType, limit: Int): Option[Spec] = {
    if (limit <= 0 || limit > MaxPushedLimit || orders.isEmpty) return None
    val cols = orders.map { o =>
      o.expression() match {
        case fr: NamedReference if fr.fieldNames().length == 1 =>
          val name = fr.fieldNames()(0)
          schema.fields.find(_.name == name) match {
            case Some(f) if comparable(f.dataType) =>
              SortCol(name,
                desc = o.direction() == SortDirection.DESCENDING,
                nullsFirst = o.nullOrdering() == NullOrdering.NULLS_FIRST)
            case _ => return None
          }
        case _ => return None
      }
    }
    Some(Spec(cols.toSeq, limit))
  }

  /** Spark-consistent non-null value comparison (NaN greatest, -0.0 == 0.0,
    * UTF8 binary order). */
  private def compareValues(dt: DataType, a: Any, b: Any): Int = dt match {
    case BooleanType => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case ByteType => java.lang.Byte.compare(a.asInstanceOf[Byte], b.asInstanceOf[Byte])
    case ShortType => java.lang.Short.compare(a.asInstanceOf[Short], b.asInstanceOf[Short])
    case IntegerType | DateType => java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case LongType | TimestampType | TimestampNTZType =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case FloatType => SQLOrderingUtil.compareFloats(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case DoubleType => SQLOrderingUtil.compareDoubles(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case StringType => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case _: DecimalType => a.asInstanceOf[Decimal].compareTo(b.asInstanceOf[Decimal])
    case other => throw new IllegalStateException(s"uncomparable $other")
  }

  /** "Better first" comparator over produced rows: cmp(a, b) < 0 ⇔ a ranks
    * before b in the requested ordering. */
  def rowComparator(idx: Array[Int], dts: Array[DataType], spec: Spec)
      : java.util.Comparator[InternalRow] =
    new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = {
        var c = 0
        while (c < idx.length) {
          val col = spec.cols(c)
          val i = idx(c)
          val an = a.isNullAt(i)
          val bn = b.isNullAt(i)
          val r =
            if (an && bn) 0
            else if (an) { if (col.nullsFirst) -1 else 1 }
            else if (bn) { if (col.nullsFirst) 1 else -1 }
            else {
              val base = compareValues(dts(c), a.get(i, dts(c)), b.get(i, dts(c)))
              if (col.desc) -base else base
            }
          if (r != 0) return r
          c += 1
        }
        0
      }
    }

  /** The primary key's value mapped into the StatsSigned zone-map domain —
    * must mirror the writer's stats encoding exactly. None when the type
    * has no signed stats (string prefix / wide decimal are lossy). */
  def toSortable(dt: DataType, v: Any): Option[Long] = dt match {
    case BooleanType => Some(if (v.asInstanceOf[Boolean]) 1L else 0L)
    case ByteType => Some(v.asInstanceOf[Byte].toLong)
    case ShortType => Some(v.asInstanceOf[Short].toLong)
    case IntegerType | DateType => Some(v.asInstanceOf[Int].toLong)
    case LongType | TimestampType | TimestampNTZType => Some(v.asInstanceOf[Long])
    case FloatType => Some(StrawFormat.sortableDouble(v.asInstanceOf[Float].toDouble))
    case DoubleType => Some(StrawFormat.sortableDouble(v.asInstanceOf[Double]))
    case d: DecimalType if d.precision <= 18 =>
      Some(v.asInstanceOf[Decimal].toUnscaledLong)
    case _ => None
  }

  /** Can page `pm` contain a row strictly better than the current k-th
    * candidate's primary key? Conservative: ties keep the page (secondary
    * keys could win), unknown stats keep the page, null candidates at the
    * boundary keep everything. */
  def pageMayBeat(pm: PageMeta, primary: SortCol, worstKey: Option[Long],
      worstIsNull: Boolean): Boolean = {
    if (worstIsNull) {
      // a null occupies the k-th slot: with nulls-first everything non-null
      // ranks after it only if... no — nulls-first means null is BEST, so a
      // full buffer with a null k-th implies fewer than k non-null rows seen;
      // any page may still contribute. With nulls-last a null k-th means
      // every value beats it. Either way: keep.
      return true
    }
    if (pm.statsKind != StrawFormat.StatsSigned) return true
    worstKey match {
      case None => true
      case Some(w) =>
        val couldBeat =
          if (primary.desc) pm.max >= w // strictly-better needs > w; ties kept for tiebreaks
          else pm.min <= w
        // nulls-first: nulls rank best, so a page holding nulls always may beat
        couldBeat || (primary.nullsFirst && pm.nullCount > 0)
    }
  }
}

/** Bounded candidate buffer: keeps the k best rows seen (defensive copies —
  * upstream readers may reuse row objects). `worst` exposes the k-th
  * candidate once full, for page-bound pruning. */
final class TopKBuffer(cmp: java.util.Comparator[InternalRow], k: Int) {
  // priority queue ordered worst-first so peek() is the k-th candidate
  private val pq = new java.util.PriorityQueue[InternalRow](k, cmp.reversed())
  def offer(row: InternalRow): Unit = {
    if (pq.size < k) pq.add(row.copy()): Unit
    else if (cmp.compare(row, pq.peek()) < 0) {
      pq.poll()
      pq.add(row.copy()): Unit
    }
  }
  def worst: InternalRow = if (pq.size < k) null else pq.peek()
  def drain(): Iterator[InternalRow] = {
    import scala.collection.JavaConverters._
    pq.iterator().asScala
  }
}
