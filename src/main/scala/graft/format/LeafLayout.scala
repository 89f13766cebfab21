package graft.format

import org.apache.spark.sql.types._

/** Leaf-flattened view of a nested Spark schema: every nested type is
  * decomposed into separately addressable LEAF columns (DFS order), each
  * written as its own page stream with its own [[ColumnMeta]] and per-page
  * stats — mirroring the reference's flatten-to-leaves layout (reference:
  * src/write/common.rs:60-68, one ColumnMeta per leaf;
  * src/read/deserialize.rs:203-234, reassembly from per-leaf streams).
  * Reading one struct field reads only that leaf's bytes, and a struct-path
  * leaf carries its own zone maps, so predicates on nested fields prune
  * pages exactly like top-level ones.
  *
  * A leaf page stays self-contained: it carries the (validity[, lengths])
  * header of every ancestor nesting level above the leaf, top-down, then
  * the leaf's own validity + data. Sibling leaves replicate their shared
  * ancestor headers — tiny relative to data, the same trade parquet makes
  * by storing rep/def levels with every leaf.
  */
object LeafLayout {
  /** Ancestor level kinds, top-down. */
  val LevelStruct = 0 // validity block only
  val LevelRep = 1 // validity + lengths blocks (array or map)

  def isNested(dt: DataType): Boolean = dt match {
    case _: StructType | _: ArrayType | _: MapType => true
    case _ => false
  }

  def leafCount(dt: DataType): Int = dt match {
    case s: StructType => s.fields.foldLeft(0)((a, f) => a + leafCount(f.dataType))
    case a: ArrayType => leafCount(a.elementType)
    case m: MapType => leafCount(m.keyType) + leafCount(m.valueType)
    case _ => 1
  }

  /** Starting leaf index of each top-level field, plus the total last. */
  def starts(schema: StructType): Array[Int] = {
    val out = new Array[Int](schema.fields.length + 1)
    var acc = 0
    var i = 0
    while (i < schema.fields.length) {
      out(i) = acc
      acc += leafCount(schema.fields(i).dataType)
      i += 1
    }
    out(schema.fields.length) = acc
    out
  }

  /** (ancestor level kinds, leaf type) of each leaf of `dt`, DFS order. */
  def leaves(dt: DataType): Seq[(Array[Int], DataType)] = {
    val out = Seq.newBuilder[(Array[Int], DataType)]
    def walk(d: DataType, path: List[Int]): Unit = d match {
      case s: StructType => s.fields.foreach(f => walk(f.dataType, LevelStruct :: path))
      case a: ArrayType => walk(a.elementType, LevelRep :: path)
      case m: MapType =>
        walk(m.keyType, LevelRep :: path)
        walk(m.valueType, LevelRep :: path)
      case leaf => out += ((path.reverse.toArray, leaf))
    }
    walk(dt, Nil)
    out.result()
  }

  /** Dotted display path of each leaf (array elements as `element`, map
    * sides as `key`/`value`) — inspection/debugging only. */
  def leafNames(dt: DataType): Seq[String] = {
    val out = Seq.newBuilder[String]
    def walk(d: DataType, path: List[String]): Unit = d match {
      case s: StructType => s.fields.foreach(f => walk(f.dataType, f.name :: path))
      case a: ArrayType => walk(a.elementType, "element" :: path)
      case m: MapType =>
        walk(m.keyType, "key" :: path)
        walk(m.valueType, "value" :: path)
      case _ => out += path.reverse.mkString(".")
    }
    walk(dt, Nil)
    out.result()
  }

  /** Full dotted leaf paths of a top-level schema (field name + the
    * column-internal [[leafNames]] path), aligned with the schema's leaf
    * numbering — exactly the names `ColumnWriter.apply` threads down and
    * the `bloomColumns` option selects on. */
  def leafPaths(schema: StructType): Seq[String] =
    schema.fields.toSeq.flatMap(f => leafNames(f.dataType).map(s =>
      if (s.isEmpty) f.name else s"${f.name}.$s"))

  /** Is `req` readable from a column stored as `file` by decoding a subset
    * of its leaves? True when `req` only prunes struct fields (matched by
    * name, any order) and every surviving leaf type matches exactly. */
  def pruneCompatible(file: DataType, req: DataType): Boolean =
    prunedLeafIdx(file, req).isDefined

  /** Leaf indices (relative to the column's own first leaf) that `req`
    * selects out of `file`'s leaf layout, in DFS order of `req` — or None
    * when `req` is not a prune-subset of `file`. */
  def prunedLeafIdx(file: DataType, req: DataType): Option[Array[Int]] = (file, req) match {
    case (f: StructType, r: StructType) =>
      // A zero-field req struct selects NO leaf, but the assembled struct
      // still needs one leaf to carry row alignment/validity — widen instead.
      if (r.fields.isEmpty) return None
      val offs = starts(f)
      val out = Array.newBuilder[Int]
      var ok = true
      r.fields.foreach { rf =>
        if (ok) {
          val i = f.fields.indexWhere(_.name == rf.name)
          if (i < 0) ok = false
          else prunedLeafIdx(f.fields(i).dataType, rf.dataType) match {
            case Some(sub) => sub.foreach(x => out += offs(i) + x)
            case None => ok = false
          }
        }
      }
      if (ok) Some(out.result()) else None
    case (f: ArrayType, r: ArrayType) => prunedLeafIdx(f.elementType, r.elementType)
    case (f: MapType, r: MapType) =>
      for {
        k <- prunedLeafIdx(f.keyType, r.keyType)
        v <- prunedLeafIdx(f.valueType, r.valueType)
      } yield k ++ v.map(_ + leafCount(f.keyType))
    case (f, r) if !isNested(f) && !isNested(r) && f == r => Some(Array(0))
    case _ => None
  }

  /** Resolve a (possibly dotted, backtick-quoted) pushed-filter attribute
    * to (leaf index in `schema`'s leaf numbering, leaf type). Defined only
    * when every step descends through STRUCT fields and the target is a
    * flat non-null type: struct-path leaf pages are row-aligned, so their
    * stats prune pages soundly; array/map paths are element-aligned and a
    * top-level nested column's footer meta no longer reflects the column's
    * OWN null count — neither resolves. */
  def resolveLeaf(schema: StructType, attr: String): Option[(Int, DataType)] = {
    val parts = splitAttr(attr)
    if (parts.isEmpty) return None
    var fields = schema.fields
    var base = 0
    var i = 0
    while (i < parts.length) {
      val idx = fields.indexWhere(_.name == parts(i))
      if (idx < 0) return None
      var j = 0
      while (j < idx) { base += leafCount(fields(j).dataType); j += 1 }
      val dt = fields(idx).dataType
      if (i == parts.length - 1)
        return if (isNested(dt) || dt == NullType) None else Some((base, dt))
      dt match {
        case st: StructType => fields = st.fields
        case _ => return None
      }
      i += 1
    }
    None
  }

  /** Split a pushed attribute on '.', honouring backtick quoting of parts
    * that themselves contain dots (doubled backticks escape a literal). */
  def splitAttr(attr: String): Array[String] = {
    val out = Array.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    var quoted = false
    while (i < attr.length) {
      val c = attr.charAt(i)
      if (c == '`') {
        if (quoted && i + 1 < attr.length && attr.charAt(i + 1) == '`') {
          sb.append('`'); i += 1
        } else quoted = !quoted
      } else if (c == '.' && !quoted) { out += sb.toString; sb.clear(): Unit }
      else sb.append(c)
      i += 1
    }
    out += sb.toString
    out.result()
  }
}
