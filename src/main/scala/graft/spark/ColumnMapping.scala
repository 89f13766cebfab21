package graft.spark

import org.apache.spark.sql.types.{StructField, StructType}

/** Logical-to-physical column aliasing for metadata-only RENAME/DROP COLUMN
  * — top-level columns AND nested struct fields — the same idea as Delta's
  * column mapping but keyed on stable physical FIELD SPELLINGS instead of
  * field ids (the footer's StructType-JSON schema round-trips names, not
  * ids).
  *
  * Key convention (what makes nested translation per-level): every map key
  * is `<logical parent path>.<physical leaf spelling>` — ancestors in the
  * LIVE logical namespace, the leaf as files spell it. Translating a file
  * schema walks the tree accumulating the logical path, so a field under a
  * renamed parent resolves through ONE entry regardless of which parent
  * spelling the file carries (the parent's own entry already translated
  * it). Values are full LOGICAL paths.
  *
  * Invariants:
  *  - A data file's fields are spelled as the columns were named WHEN IT WAS
  *    WRITTEN. Files are immutable, so a rename cannot touch them; instead
  *    `alias` records `spelling key -> current logical path` for every
  *    spelling that differs from the live name.
  *  - `dropped` holds spelling keys that are dead: a file field with a
  *    dropped spelling reads as absent, subtree included (the column was
  *    DROPPED while it was live).
  *  - Re-using a retired spelling (re-ADD after DROP, or RENAME onto one)
  *    must not resurrect old data, so such columns write under a FRESH
  *    physical spelling (`name@v<version>`); `writeNames` maps the logical
  *    path to it for the write path.
  *  - A rename of a STRUCT re-prefixes its descendants' keys and values —
  *    the children's logical parents moved with it; a drop removes the
  *    subtree's entries outright (the parent tombstone covers them, and a
  *    re-added parent of the same name must not inherit stale child state).
  *
  * A rename therefore costs one log commit and zero data IO; compaction and
  * row-level rewrites write current logical spellings, materializing old
  * aliases away over time. */
final case class ColumnMappingState(
    alias: Map[String, String],
    dropped: Set[String],
    writeNames: Map[String, String]) {

  def isEmpty: Boolean = alias.isEmpty && dropped.isEmpty && writeNames.isEmpty

  private def lastSeg(path: String): String =
    path.substring(path.lastIndexOf('.') + 1)

  /** Recursive physical→logical struct translation. `footerMode` keeps
    * field POSITIONS (dropped fields tombstone under
    * [[ColumnMappingState.DroppedPrefix]], subtree untouched); otherwise
    * dropped fields are removed. `parentLogical` is "" at the top. */
  private def toLogicalStruct(st: StructType, parentLogical: String,
      footerMode: Boolean): StructType =
    StructType(st.fields.flatMap { f =>
      val key = if (parentLogical.isEmpty) f.name else s"$parentLogical.${f.name}"
      if (dropped.contains(key)) {
        if (footerMode)
          Some(f.copy(name = ColumnMappingState.DroppedPrefix + f.name))
        else None
      } else {
        val logicalPath = alias.getOrElse(key, key)
        val dt = f.dataType match {
          case s: StructType => toLogicalStruct(s, logicalPath, footerMode)
          case other => other // paths through arrays/maps are not mappable
        }
        Some(f.copy(name = lastSeg(logicalPath), dataType = dt))
      }
    })

  /** A file/footer schema translated into the live logical namespace:
    * dropped spellings removed (subtrees included), aliased spellings
    * renamed at every struct level. Use ONLY where field positions need
    * not align with a footer's leaf array (schema inference); scans use
    * [[toLogicalFooter]]. */
  def toLogical(fileSchema: StructType): StructType =
    if (isEmpty) fileSchema else toLogicalStruct(fileSchema, "", footerMode = false)

  /** Footer-schema translation that PRESERVES field positions (leaf metas
    * and page stats align positionally): aliased spellings renamed, dropped
    * spellings tombstoned under [[ColumnMappingState.DroppedPrefix]] so no
    * logical name can ever match them. */
  def toLogicalFooter(fileSchema: StructType): StructType =
    if (isEmpty) fileSchema else toLogicalStruct(fileSchema, "", footerMode = true)

  /** A footer with its schema in the logical namespace (leaf-aligned). */
  def toLogicalFooter(footer: graft.format.StrawFooter): graft.format.StrawFooter =
    if (isEmpty) footer else footer.copy(schema = toLogicalFooter(footer.schema))

  /** A dotted PHYSICAL leaf path translated segment-by-segment into the
    * logical namespace; None when any segment is dropped. */
  def logicalLeafPath(path: String): Option[String] = {
    if (isEmpty) return Some(path)
    var logical = ""
    var i = 0
    val segs = path.split('.')
    while (i < segs.length) {
      val key = if (logical.isEmpty) segs(i) else s"$logical.${segs(i)}"
      if (dropped.contains(key)) return None
      logical = alias.getOrElse(key, key)
      i += 1
    }
    Some(logical)
  }

  /** A LOGICAL dotted leaf path in the write namespace (fresh physical
    * spellings for re-added columns at any level; identity otherwise). */
  def writeLeafPath(path: String): String = {
    if (writeNames.isEmpty) return path
    val segs = path.split('.')
    val out = new StringBuilder
    var logical = ""
    var i = 0
    while (i < segs.length) {
      logical = if (logical.isEmpty) segs(i) else s"$logical.${segs(i)}"
      if (i > 0) out.append('.')
      out.append(writeNames.get(logical).map(lastSeg).getOrElse(segs(i)))
      i += 1
    }
    out.toString
  }

  /** The spelling a write must use for top-level `logical` (fresh-physical
    * columns only; identity otherwise). */
  def writeSpelling(logical: String): String =
    writeNames.get(logical).map(lastSeg).getOrElse(logical)

  private def toPhysicalStruct(st: StructType, parentLogical: String): StructType =
    StructType(st.fields.map { f =>
      val lpath = if (parentLogical.isEmpty) f.name else s"$parentLogical.${f.name}"
      val dt = f.dataType match {
        case s: StructType => toPhysicalStruct(s, lpath)
        case other => other
      }
      f.copy(name = writeNames.get(lpath).map(lastSeg).getOrElse(f.name),
        dataType = dt)
    })

  /** A write-side schema translated to physical spellings (every level). */
  def toPhysical(writeSchema: StructType): StructType =
    if (writeNames.isEmpty) writeSchema
    else toPhysicalStruct(writeSchema, "")

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

  private def reprefix(s: String, from: String, to: String): String =
    if (s.startsWith(from + ".")) to + s.substring(from.length) else s

  /** The state after renaming logical path `from` to `to` (same parent,
    * new leaf name). Top-level columns are the paths without dots. */
  def rename(cur: ColumnMappingState, from: String, to: String,
      freshSuffix: => String): ColumnMappingState = {
    // descendants of a renamed STRUCT follow it: their keys' logical
    // parents and their values' logical prefixes both moved
    val aliasD = cur.alias.map { case (k, v) =>
      (reprefix(k, from, to), reprefix(v, from, to)) }
    val droppedD = cur.dropped.map(reprefix(_, from, to))
    val writeD = cur.writeNames.map { case (k, v) =>
      (reprefix(k, from, to), reprefix(v, from, to)) }
    // every historical spelling of the column follows the new name; the
    // identity spelling `from` joins the alias unless it belongs to some
    // EARLIER column — dead (dropped) or renamed-away (already a key in the
    // alias map) — in which case this column's data never used it (its
    // writes carried a fresh spelling precisely because of that collision)
    val realiased = aliasD.map { case (p, l) => (p, if (l == from) to else l) }
    val withIdentity =
      if (droppedD.contains(from) || realiased.contains(from)) realiased
      else realiased + (from -> to)
    // drop the no-op identity entry if the rename cycles back (b -> a -> b)
    val alias2 = withIdentity.filter { case (p, l) => p != l }
    // collision AFTER re-aliasing: `to` is dangerous only if historical
    // files spell some OTHER (or dead) column that way — a rename cycling
    // back onto the column's own original spelling is collision-free
    val collision = droppedD.contains(to) || alias2.contains(to)
    val fresh = if (collision) to + freshSuffix else to
    ColumnMappingState(
      alias = if (collision) alias2 + (fresh -> to) else alias2,
      dropped = droppedD,
      writeNames = (writeD - from) ++
        (if (collision) Map(to -> fresh) else Map.empty))
  }

  /** The state after dropping logical path `name` (subtree included). */
  def drop(cur: ColumnMappingState, name: String): ColumnMappingState = {
    // every historical spelling of the column dies; the identity spelling
    // dies too unless it belongs to an EARLIER column — dead, or an alias
    // key pointing at some other live column (then THIS column's data never
    // used it: its writes carried a fresh spelling)
    val identityDead =
      !cur.dropped.contains(name) && !cur.alias.contains(name)
    val spellings = cur.alias.collect { case (p, l) if l == name => p }.toSet ++
      (if (identityDead) Set(name) else Set.empty[String])
    // descendants' entries vanish outright: the parent tombstone covers
    // the subtree on every read, and a later re-ADD of the same parent
    // name must not inherit the old children's state
    def under(s: String): Boolean = s.startsWith(name + ".")
    ColumnMappingState(
      alias = cur.alias.filter { case (k, l) =>
        l != name && !under(k) && !under(l) },
      dropped = cur.dropped.filterNot(under) ++ spellings,
      writeNames = (cur.writeNames - name)
        .filter { case (k, _) => !under(k) })
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
