package graft.spark

import org.apache.spark.sql.types.{StructField, StructType}

/** Logical-to-physical column aliasing for metadata-only RENAME/DROP COLUMN
  * (top-level columns), the same idea as Delta's column mapping but keyed on
  * stable physical FIELD SPELLINGS instead of field ids (the footer's
  * StructType-JSON schema round-trips names, not ids).
  *
  * Invariants:
  *  - A data file's fields are spelled as the columns were named WHEN IT WAS
  *    WRITTEN. Files are immutable, so a rename cannot touch them; instead
  *    `alias` records `physical spelling -> current logical name` for every
  *    spelling that differs from the live name.
  *  - `dropped` holds spellings that are dead: a file field with a dropped
  *    spelling reads as absent (the column was DROPPED while it was live).
  *  - Re-using a retired spelling (re-ADD after DROP, or RENAME onto one)
  *    must not resurrect old data, so such columns write under a FRESH
  *    physical spelling (`name@v<version>`); `writeNames` maps the logical
  *    name to it for the write path.
  *
  * A rename therefore costs one log commit and zero data IO; compaction and
  * row-level rewrites write current logical spellings, materializing old
  * aliases away over time. */
final case class ColumnMappingState(
    alias: Map[String, String],
    dropped: Set[String],
    writeNames: Map[String, String]) {

  def isEmpty: Boolean = alias.isEmpty && dropped.isEmpty && writeNames.isEmpty

  /** A file/footer schema translated into the live logical namespace:
    * dropped spellings removed, aliased spellings renamed. Top-level only —
    * nested fields ride along with their top-level column. Use ONLY where
    * field positions need not align with a footer's leaf array (schema
    * inference); scans use [[toLogicalFooter]]. */
  def toLogical(fileSchema: StructType): StructType =
    if (isEmpty) fileSchema
    else StructType(fileSchema.fields.flatMap { f =>
      if (dropped.contains(f.name)) None
      else alias.get(f.name) match {
        case Some(logical) => Some(f.copy(name = logical))
        case None => Some(f)
      }
    })

  /** Footer-schema translation that PRESERVES field positions (leaf metas
    * and page stats align positionally): aliased spellings renamed, dropped
    * spellings tombstoned under [[ColumnMappingState.DroppedPrefix]] so no
    * logical name can ever match them. */
  def toLogicalFooter(fileSchema: StructType): StructType =
    if (isEmpty) fileSchema
    else StructType(fileSchema.fields.map { f =>
      if (dropped.contains(f.name))
        f.copy(name = ColumnMappingState.DroppedPrefix + f.name)
      else alias.get(f.name) match {
        case Some(logical) => f.copy(name = logical)
        case None => f
      }
    })

  /** A footer with its schema in the logical namespace (leaf-aligned). */
  def toLogicalFooter(footer: graft.format.StrawFooter): graft.format.StrawFooter =
    if (isEmpty) footer else footer.copy(schema = toLogicalFooter(footer.schema))

  /** A dotted leaf path translated on its top-level segment; None when the
    * top-level column is dropped. */
  def logicalLeafPath(path: String): Option[String] = {
    if (isEmpty) return Some(path)
    val dot = path.indexOf('.')
    val head = if (dot < 0) path else path.substring(0, dot)
    val tail = if (dot < 0) "" else path.substring(dot)
    if (dropped.contains(head)) None
    else Some(alias.getOrElse(head, head) + tail)
  }

  /** A LOGICAL dotted leaf path in the write namespace (fresh physical
    * spellings for re-added columns; identity otherwise). */
  def writeLeafPath(path: String): String = {
    if (writeNames.isEmpty) return path
    val dot = path.indexOf('.')
    if (dot < 0) writeSpelling(path)
    else writeSpelling(path.substring(0, dot)) + path.substring(dot)
  }

  /** The spelling a write must use for `logical` (fresh-physical columns
    * only; identity otherwise). */
  def writeSpelling(logical: String): String =
    writeNames.getOrElse(logical, logical)

  /** A write-side schema translated to physical spellings. */
  def toPhysical(writeSchema: StructType): StructType =
    if (writeNames.isEmpty) writeSchema
    else StructType(writeSchema.fields.map(f =>
      f.copy(name = writeSpelling(f.name))))

  /** Spellings that exist in historical files with a non-identity meaning —
    * re-using one as a fresh column name needs a fresh physical. */
  def retiredSpellings: Set[String] = dropped ++ alias.keySet

  // --- serialization (tab-framed; tokens are UNPADDED base64 — names are
  // arbitrary — joined with ':' and ',', neither in the base64 alphabet) --
  private def b64(s: String): String =
    java.util.Base64.getEncoder.withoutPadding.encodeToString(s.getBytes("UTF-8"))

  def serialize: String = {
    def pairs(m: Map[String, String]): String =
      m.toSeq.sorted.map { case (k, v) => b64(k) + ":" + b64(v) }.mkString(",")
    def set(s: Set[String]): String = s.toSeq.sorted.map(b64).mkString(",")
    s"${pairs(alias)}\t${set(dropped)}\t${pairs(writeNames)}"
  }
}

object ColumnMappingState {
  val Empty: ColumnMappingState =
    ColumnMappingState(Map.empty, Set.empty, Map.empty)

  /** Reserved spelling prefix for tombstoned (dropped) footer fields; user
    * column names starting with it are refused at DDL boundaries. */
  val DroppedPrefix = "!dropped!"

  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  /** Parse [[ColumnMappingState.serialize]]'s three tab-separated tokens. */
  def parse(aliasTok: String, droppedTok: String, writeTok: String): ColumnMappingState = {
    def pairs(t: String): Map[String, String] =
      if (t.isEmpty) Map.empty
      else t.split(',').map { kv =>
        val i = kv.indexOf(':')
        require(i > 0, s"bad column-mapping pair: $kv")
        unb64(kv.substring(0, i)) -> unb64(kv.substring(i + 1))
      }.toMap
    def set(t: String): Set[String] =
      if (t.isEmpty) Set.empty else t.split(',').map(unb64).toSet
    ColumnMappingState(pairs(aliasTok), set(droppedTok), pairs(writeTok))
  }

  /** The state after renaming logical `from` to `to`. */
  def rename(cur: ColumnMappingState, from: String, to: String,
      freshSuffix: => String): ColumnMappingState = {
    // every historical spelling of the column follows the new name; the
    // identity spelling `from` joins the alias unless it belongs to some
    // EARLIER column — dead (dropped) or renamed-away (already a key in the
    // alias map) — in which case this column's data never used it (its
    // writes carried a fresh spelling precisely because of that collision)
    val realiased = cur.alias.map { case (p, l) => (p, if (l == from) to else l) }
    val withIdentity =
      if (cur.dropped.contains(from) || realiased.contains(from)) realiased
      else realiased + (from -> to)
    // drop the no-op identity entry if the rename cycles back (b -> a -> b)
    val alias2 = withIdentity.filter { case (p, l) => p != l }
    // collision AFTER re-aliasing: `to` is dangerous only if historical
    // files spell some OTHER (or dead) column that way — a rename cycling
    // back onto the column's own original spelling is collision-free
    val collision = cur.dropped.contains(to) || alias2.contains(to)
    val fresh = if (collision) to + freshSuffix else to
    ColumnMappingState(
      alias = if (collision) alias2 + (fresh -> to) else alias2,
      dropped = cur.dropped,
      writeNames = (cur.writeNames - from) ++
        (if (collision) Map(to -> fresh) else Map.empty))
  }

  /** The state after dropping logical `name`. */
  def drop(cur: ColumnMappingState, name: String): ColumnMappingState = {
    // every historical spelling of the column dies; the identity spelling
    // dies too unless it belongs to an EARLIER column — dead, or an alias
    // key pointing at some other live column (then THIS column's data never
    // used it: its writes carried a fresh spelling)
    val identityDead =
      !cur.dropped.contains(name) && !cur.alias.contains(name)
    val spellings = cur.alias.collect { case (p, l) if l == name => p }.toSet ++
      (if (identityDead) Set(name) else Set.empty[String])
    ColumnMappingState(
      alias = cur.alias.filter { case (_, l) => l != name },
      dropped = cur.dropped ++ spellings,
      writeNames = cur.writeNames - name)
  }

  /** The fresh spelling (if needed) for ADDing logical `name`; None when the
    * identity spelling is safe. */
  def addSpelling(cur: ColumnMappingState, name: String,
      freshSuffix: => String): Option[String] =
    if (cur.retiredSpellings.contains(name)) Some(name + freshSuffix) else None

  /** The state after adding logical `name` (with `spelling` from
    * [[addSpelling]]). */
  def add(cur: ColumnMappingState, name: String,
      spelling: Option[String]): ColumnMappingState = spelling match {
    case None => cur
    case Some(fresh) => cur.copy(
      alias = cur.alias + (fresh -> name),
      writeNames = cur.writeNames + (name -> fresh))
  }
}
