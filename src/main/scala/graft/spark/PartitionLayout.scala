package graft.spark

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Hive-style directory partitioning for strawboat tables:
  * `dir/<col>=<encodedValue>/part-*.strb`.
  *
  * The partition column is ALSO stored in the data files — the directory
  * layer is purely an acceleration structure, so reads need no schema
  * reconstruction and unpartitioned/partitioned files can coexist. What the
  * layout buys at scale is elimination of whole directories BEFORE any
  * footer IO: a filter on the partition column prunes terabytes of files
  * from the plan with zero reads (classic date/category partitioning).
  *
  * Pruning is conservative: only filters provably contradicted by the
  * directory value eliminate it; any parse failure keeps the directory.
  */
object PartitionLayout {

  val NullDir = "__null__"

  def encode(value: String): String =
    if (value == null) NullDir
    else {
      val enc = java.net.URLEncoder.encode(value, "UTF-8")
      // a LITERAL "__null__" value must not collide with the null sentinel:
      // percent-escape its first underscore (URLDecoder inverts it)
      if (enc == NullDir) "%5F" + enc.substring(1) else enc
    }

  private def decode(raw: String): Option[String] =
    if (raw == NullDir) None
    else Some(java.net.URLDecoder.decode(raw, "UTF-8"))

  /** (column, decodedValueOrNull) from the file's parent directory, if that
    * directory is a `col=value` segment — the INNERMOST level of a (possibly
    * multi-level) layout. */
  def partitionOf(file: String): Option[(String, Option[String])] =
    segmentOf(new org.apache.hadoop.fs.Path(file).getParent)

  private def segmentOf(dir: org.apache.hadoop.fs.Path)
      : Option[(String, Option[String])] = {
    if (dir == null) return None
    val seg = dir.getName
    val eq = seg.indexOf('=')
    if (eq <= 0) None
    else
      try Some((seg.substring(0, eq), decode(seg.substring(eq + 1))))
      catch { case _: IllegalArgumentException => None }
  }

  /** EVERY `col=value` ancestor segment of the file, outer→inner — the full
    * key of a multi-level layout (`.../date=D/hour=H/part-*.strb` yields
    * `Seq(date -> D, hour -> H)`). The walk stops at the first ancestor that
    * is not a partition segment, so a partitioned table nested under a
    * `key=value`-looking data directory cannot capture foreign segments. */
  def partitionsOf(file: String): Seq[(String, Option[String])] = {
    partitionsOfImpl(file)
  }

  /** The hive layout's column sequence derived from a file listing — what
    * the mutation writers (merge inserts, DML rewrites) route new rows by.
    * Schema-only markers (`part-empty-*`, written at the table ROOT by
    * CREATE/truncate) carry no partition directories and must not defeat
    * the derivation; genuinely mixed layouts still derive as unpartitioned
    * (PartitionLayout tolerates mixed levels on read). */
  def layoutColsOf(listed: Seq[StrawIO.Listed]): Seq[String] =
    listed.filterNot(lf => StrawBucket.isMarker(lf.meta.path))
      .map(lf => partitionsOf(lf.meta.path).map(_._1))
      .distinct match {
      case Seq(one) => one
      case _ => Seq.empty
    }

  private def partitionsOfImpl(file: String): Seq[(String, Option[String])] = {
    var out = List.empty[(String, Option[String])]
    var dir = new org.apache.hadoop.fs.Path(file).getParent
    var seg = segmentOf(dir)
    while (seg.isDefined) {
      out = seg.get :: out
      dir = dir.getParent
      seg = segmentOf(dir)
    }
    out
  }

  /** Typed equality between the directory's string value and a filter
    * literal. None = not comparable (keep the directory). */
  private def valueEquals(dt: DataType, dirValue: String, lit: Any): Option[Boolean] = {
    if (lit == null) return None
    try dt match {
      case StringType => Some(dirValue == lit.toString)
      case ByteType | ShortType | IntegerType | LongType =>
        Some(dirValue.toLong == (lit match {
          case n: java.lang.Number => n.longValue()
          case _ => return None
        }))
      case BooleanType => Some(dirValue.toBoolean == lit.asInstanceOf[Boolean])
      case _ => None
    } catch { case _: IllegalArgumentException | _: NumberFormatException => None }
  }

  /** Can any row under this directory satisfy `f`? Conservative. */
  private def mayMatch(schema: StructType, col: String, value: Option[String], f: Filter): Boolean = {
    def dtOf: Option[DataType] = schema.fields.find(_.name == col).map(_.dataType)
    f match {
      case EqualTo(a, v) if a == col => value match {
        case None => false // null partition never equals a literal
        case Some(dv) => dtOf.flatMap(valueEquals(_, dv, v)).getOrElse(true)
      }
      case In(a, vs) if a == col => value match {
        case None => false
        case Some(dv) =>
          dtOf.map(dt => vs.exists(v => valueEquals(dt, dv, v).getOrElse(true)))
            .getOrElse(true)
      }
      case IsNull(a) if a == col => value.isEmpty
      case IsNotNull(a) if a == col => value.nonEmpty
      case And(l, r) =>
        mayMatch(schema, col, value, l) && mayMatch(schema, col, value, r)
      case Or(l, r) =>
        mayMatch(schema, col, value, l) || mayMatch(schema, col, value, r)
      case _ => true // non-partition or unsupported filter: keep
    }
  }

  /** Drop files whose `col=value` directory is provably excluded by the
    * filters — before any footer is read. */
  def prune(files: Seq[String], schema: StructType, filters: Array[Filter]): Seq[String] =
    pruneBy(files, schema, filters)(identity)

  /** [[prune]] over any carrier of a file path (e.g. listing entries that
    * also hold the footer-cache version key). Every partition level the
    * file sits under constrains it: a filter provably contradicted at ANY
    * level eliminates the file. */
  def pruneBy[T](items: Seq[T], schema: StructType, filters: Array[Filter])
      (pathOf: T => String): Seq[T] =
    if (filters.isEmpty) items
    else items.filter { it =>
      val segs = partitionsOf(pathOf(it))
        .filter { case (col, _) => schema.fieldNames.contains(col) }
      filters.forall(f =>
        segs.forall { case (col, value) => mayMatch(schema, col, value, f) })
    }
}
