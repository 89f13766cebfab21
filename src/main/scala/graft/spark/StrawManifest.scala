package graft.spark

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.{DataType, StructType}

import graft.format.{ColumnMeta, LeafLayout, PageMeta, StrawFormat, StrawFooter}
import graft.spark.StrawIO.FileMeta

/** Committed-files snapshot layer. [[readEntries]] resolves a table's live
  * data files (path + the (mtime, len) version key + per-file stats) for
  * planning, in place of a recursive directory walk: the [[StrawLog]]
  * transaction log is the authority when the table has one; the legacy
  * single-file `_strawboat_manifest` (written by pre-log versions of this
  * library) serves older tables read-only and is folded into the log's
  * bootstrap version on their first new commit.
  *
  * Why: at 100k-file / object-store scale, LIST is the dominant planning
  * cost once footers are cached ([[FooterCache]]) — every query paid
  * `inferSchema` + selectivity-probe + scan-planning listings, and listings
  * are eventually-consistent on some stores. With a snapshot, planning
  * over an unchanged table is ONE small cached read (zero directory
  * walks — [[StrawIO.listings]] observable), and a reader during a
  * concurrent commit sees a complete old or complete new snapshot instead
  * of a mid-rename partial listing.
  *
  * Entries (v3) carry PER-FILE column statistics: each entry may reference
  * its file's schema (deduplicated in a dictionary section) and a compact
  * blob of per-leaf (kind, min, max, nullCount) merged over the file's
  * pages. Planning turns each blob into a synthetic one-page footer and
  * runs the ordinary [[ZoneMapFilter]] satisfiability over it — so a
  * selective filter prunes WHOLE FILES from the scan before any footer IO,
  * the difference between reading 100k footers and reading the few that
  * can match. Stats are computed once at commit time for the just-written
  * files and carried forward verbatim in the log; an entry without stats
  * simply doesn't prune. The entry-line grammar is shared with the log's
  * add actions ([[appendEntryLine]]/[[parseEntryLine]]).
  *
  * Trust model: snapshots are maintained by THIS library's committers, the
  * only writers of visible data files. Files dropped in by external tools
  * are not seen; delete `_straw_log/` and the manifest file to force
  * listing. Any read/parse problem falls back to a directory walk — the
  * snapshot layer is an accelerator with a well-defined failure mode,
  * never a wall.
  */
object StrawManifest {
  val FileName = "_strawboat_manifest"
  private val HeaderV1 = "strawboat-manifest v1"
  private val HeaderV2Prefix = "strawboat-manifest v2 "
  private val HeaderV3Prefix = "strawboat-manifest v3 "

  /** One manifest entry: the file's version-keyed identity plus optional
    * file-level stats (`schemaJson`/`statsB64` null when absent).
    * `schemaParsed` is the pre-parsed schema when the producer had it in
    * hand (the v3 dictionary parses each distinct schema ONCE for all its
    * files — 100k same-schema entries must not mean 100k JSON parses).
    * `dv` is the file's deletion vector, null for a fully-live file — only
    * the transaction log carries DV references ([[StrawLog]] `D` actions);
    * the legacy manifest predates row-level deletes and never has one. */
  final case class Entry(meta: FileMeta, schemaJson: String, statsB64: String,
      schemaParsed: StructType = null,
      dv: DeletionVector.DvInfo = null) {
    /** Rows the file contributes to the table (footer rows minus dead). */
    def liveRowsOf(footerRows: Long): Long =
      if (dv == null) footerRows else math.max(0L, footerRows - dv.cardinality)
    /** Synthetic one-page-per-leaf footer for file-level pruning, or None
      * when this entry carries no stats (or they fail to parse — the
      * manifest must accelerate, never wall). Memoized: entries live in the
      * parse cache, so each file's stats decode once per snapshot. */
    lazy val synthetic: Option[StrawFooter] =
      if (schemaJson == null || statsB64 == null) None
      else
        try {
          val schema =
            if (schemaParsed != null) schemaParsed
            else DataType.fromJson(schemaJson).asInstanceOf[StructType]
          Some(ManifestStats.decode(schema,
            java.util.Base64.getDecoder.decode(statsB64)))
        } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Parsed-manifest cache keyed by (path, snapshot id). The snapshot id is
    * a per-write UUID embedded in the v2+/v3 header line — unlike the
    * (mtime, len) key the rest of the IO stack uses, it cannot collide when
    * the manifest (rewritten every commit/epoch, far more often than data
    * files) is replaced twice within one mtime granularity unit by
    * equal-length content. Legacy v1 manifests fall back to an
    * (mtime, len)-derived id. Small LRU: one entry per live table. */
  private val cache =
    new java.util.LinkedHashMap[(String, String), Seq[Entry]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), Seq[Entry]]): Boolean =
        size() > 1024
    }

  /** Manifest-backed listings served (cache or parse) — observability. */
  val hits = new AtomicLong()

  def manifestPath(dir: String): Path = new Path(dir, FileName)

  /** The manifest bypasses the checksummed local FS wrapper: it carries its
    * own header + per-line parse guard (any corruption falls back to a
    * walk), and skipping `.crc` sidecars is what lets the local swap be a
    * single atomic rename. */
  private def rawFs(dir: String): org.apache.hadoop.fs.FileSystem =
    StrawIO.fs(dir) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }

  /** The live-file snapshot of `dir`, or None when absent/unreadable
    * (callers fall back to walking the directory). */
  def read(dir: String): Option[Seq[FileMeta]] = readEntries(dir).map(_.map(_.meta))

  /** The snapshot WITH per-file stats entries. The transaction log
    * ([[StrawLog]]) is the authority when the table has one; the
    * single-file legacy manifest (written by pre-log commits) serves tables
    * that predate it. Callers that get None fall back to walking. */
  def readEntries(dir: String): Option[Seq[Entry]] =
    StrawLog.snapshot(dir).map { s => hits.incrementAndGet(); s.entries }
      .orElse(readLegacyEntries(dir))

  /** The legacy single-file `_strawboat_manifest` snapshot only — no log
    * consultation (used by the log's own bootstrap, which must fold in the
    * PRE-log state). */
  def readLegacyEntries(dir: String): Option[Seq[Entry]] = {
    try {
      val f = rawFs(dir)
      val mp = manifestPath(dir)
      val st =
        try f.getFileStatus(mp)
        catch { case _: java.io.FileNotFoundException => return None }
      val in = f.open(mp)
      try {
        // Sniff the header line first: the embedded snapshot id is the
        // cache key, so a hit costs one ~96-byte read instead of a parse.
        val head = new Array[Byte](math.min(st.getLen, 96L).toInt)
        in.readFully(0, head)
        val headLine = new String(head, "UTF-8").takeWhile(_ != '\n')
        val snapshotId =
          if (headLine.startsWith(HeaderV3Prefix)) headLine.stripPrefix(HeaderV3Prefix)
          else if (headLine.startsWith(HeaderV2Prefix)) headLine.stripPrefix(HeaderV2Prefix)
          else if (headLine == HeaderV1) s"v1:${st.getModificationTime}:${st.getLen}"
          else return None
        val key = (mp.toString, snapshotId)
        val hit = cache.synchronized(cache.get(key))
        if (hit != null) { hits.incrementAndGet(); return Some(hit) }
        val bytes = new Array[Byte](st.getLen.toInt)
        in.readFully(0, bytes)
        val lines = new String(bytes, "UTF-8").split('\n')
        // Re-check: the file may have been swapped between the two reads —
        // a changed header means the parse would mix snapshots; fall back.
        if (lines.isEmpty || lines(0) != headLine) return None
        val qdir = f.makeQualified(new Path(dir)).toString
        val entries =
          if (headLine.startsWith(HeaderV3Prefix)) parseV3(lines, qdir)
          else parseV2(lines, qdir)
        cache.synchronized(cache.put(key, entries))
        hits.incrementAndGet()
        Some(entries)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def parseV2(lines: Array[String], qdir: String): Seq[Entry] =
    lines.iterator.drop(1).filter(_.nonEmpty).map { line =>
      val a = line.indexOf('\t')
      val b = line.indexOf('\t', a + 1)
      require(a > 0 && b > a, s"bad manifest line: $line")
      Entry(FileMeta(s"$qdir/${line.substring(b + 1)}",
        line.substring(0, a).toLong, line.substring(a + 1, b).toLong), null, null)
    }.toVector

  /** v3 layout after the header line:
    * {{{
    * S<idx>\t<schema json>          (schema dictionary, deduplicated)
    * F\t<mtime>\t<len>\t<schemaIdx|->\t<statsB64|->\t<relative path>
    * }}}
    * The relative path is LAST so the fixed-position fields parse even
    * though it is unconstrained. Schema JSON cannot contain raw tabs or
    * newlines (JSON escapes control characters), so line/tab framing is
    * safe. */
  private def parseV3(lines: Array[String], qdir: String): Seq[Entry] = {
    val schemas = scala.collection.mutable.ArrayBuffer.empty[(String, StructType)]
    val out = Vector.newBuilder[Entry]
    lines.iterator.drop(1).filter(_.nonEmpty).foreach { line =>
      if (line.startsWith("S")) parseSchemaLine(line, schemas, "manifest")
      else {
        require(line.startsWith("F\t"), s"bad manifest line: $line")
        out += parseEntryLine(line, schemas, qdir, "manifest")
      }
    }
    out.result()
  }

  // -------------------------------------------------------------------
  // Shared v3 entry-line codec: manifest `F` lines and transaction-log
  // `A` lines ([[StrawLog]]) use the same grammar after their tag —
  //   <tag>\t<mtime>\t<len>\t<schemaIdx|->\t<statsB64|->\t<relative path>
  // with an `S<idx>\t<schema json>` dictionary above. One codec, two
  // framings: a format change (new field, escaping fix) lands here once.
  // The relative path is LAST so the fixed-position fields parse even
  // though it is unconstrained; schema JSON cannot contain raw tabs or
  // newlines (JSON escapes control characters), so framing is safe.
  // -------------------------------------------------------------------

  private[spark] def appendSchemaDict(sb: StringBuilder,
      sorted: Seq[Entry]): scala.collection.Map[String, Int] = {
    val schemaIdx = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    sorted.foreach { e =>
      if (e.schemaJson != null && !schemaIdx.contains(e.schemaJson)) {
        val idx = schemaIdx.size
        schemaIdx(e.schemaJson) = idx
        sb.append('S').append(idx).append('\t').append(e.schemaJson).append('\n')
      }
    }
    schemaIdx
  }

  private[spark] def appendEntryLine(sb: StringBuilder, tag: Char, e: Entry,
      schemaIdx: scala.collection.Map[String, Int], prefix: String,
      what: String): Unit = {
    require(e.meta.path.startsWith(prefix),
      s"$what entry outside table: ${e.meta.path}")
    sb.append(tag).append('\t').append(e.meta.mtime).append('\t').append(e.meta.len)
      .append('\t')
      .append(if (e.schemaJson == null) "-" else schemaIdx(e.schemaJson).toString)
      .append('\t')
      .append(if (e.statsB64 == null) "-" else e.statsB64)
      .append('\t')
      .append(e.meta.path.substring(prefix.length)).append('\n')
  }

  /** Parse one `S<idx>\t<json>` dictionary line; each DISTINCT schema
    * parses once, every entry of that schema shares the instance. */
  private[spark] def parseSchemaLine(line: String,
      schemas: scala.collection.mutable.ArrayBuffer[(String, StructType)],
      what: String): Unit = {
    val t = line.indexOf('\t')
    require(t > 0 && line.substring(1, t).toInt == schemas.size,
      s"bad $what schema line: $line")
    val json = line.substring(t + 1)
    schemas += ((json, DataType.fromJson(json).asInstanceOf[StructType]))
  }

  private[spark] def parseEntryLine(line: String,
      schemas: scala.collection.IndexedSeq[(String, StructType)], qdir: String,
      what: String): Entry = {
    val parts = line.split('\t') // path (last) re-joined below if it had tabs
    require(parts.length >= 6, s"bad $what line: $line")
    val relPath = parts.drop(5).mkString("\t")
    val (schemaJson, schemaParsed) =
      if (parts(3) == "-") (null, null) else schemas(parts(3).toInt)
    val statsB64 = if (parts(4) == "-") null else parts(4)
    Entry(FileMeta(s"$qdir/$relPath", parts(1).toLong, parts(2).toLong),
      schemaJson, statsB64, schemaParsed)
  }

  /** File-level stats from the (cached) footer; stats-less on any error —
    * a commit must never fail because statistics couldn't be derived.
    * Shared with [[StrawLog]] commits, whose A-lines carry the same stats. */
  def entryFor(m: FileMeta): Entry = computeEntry(m)

  private def computeEntry(m: FileMeta): Entry =
    try {
      val footer = FooterCache.get(m.path, m.mtime, m.len)
      Entry(m, footer.schema.json,
        java.util.Base64.getEncoder.encodeToString(ManifestStats.encode(footer)))
    } catch { case scala.util.control.NonFatal(_) => Entry(m, null, null) }

  /** Stats-less snapshot write (testing / external callers). */
  def write(dir: String, entries: Seq[FileMeta]): Unit = {
    writeEntries(dir, entries.map(Entry(_, null, null))): Unit
  }

  /** Write a snapshot: temp + swap. On a `file:` FS the swap is a true
    * atomic replace (NIO ATOMIC_MOVE) — a concurrent reader sees old or
    * new, never a gap; elsewhere it is delete→rename, whose gap degrades a
    * reader to a directory walk, never to wrong data.
    * @return false when the swap failed and the manifest was deleted. */
  def writeEntries(dir: String, entries: Seq[Entry]): Boolean = {
    val f = rawFs(dir)
    val qdir = StrawIO.fs(dir).makeQualified(new Path(dir)).toString
    val prefix = qdir + "/"
    val sb = new StringBuilder(HeaderV3Prefix)
      .append(java.util.UUID.randomUUID().toString).append('\n')
    val sorted = entries.sortBy(_.meta.path)
    val schemaIdx = appendSchemaDict(sb, sorted)
    sorted.foreach(appendEntryLine(sb, 'F', _, schemaIdx, prefix, "manifest"))
    val tmp = new Path(dir,
      s".$FileName.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val os = f.create(tmp, true)
    var ok = false
    var swapped = false
    try { os.write(sb.toString.getBytes("UTF-8")); ok = true }
    finally {
      os.close()
      if (ok) {
        val mp = manifestPath(dir)
        if (atomicReplace(f, tmp, mp)) swapped = true
        else {
          f.delete(mp, false)
          if (f.rename(tmp, mp)) swapped = true
          else { f.delete(tmp, false); invalidate(dir) }
        }
      } else f.delete(tmp, false)
    }
    swapped
  }

  private def atomicReplace(f: org.apache.hadoop.fs.FileSystem,
      src: Path, dst: Path): Boolean =
    // getUri, not getScheme: RawLocalFileSystem doesn't implement the latter
    f.getUri.getScheme == "file" && {
      try {
        java.nio.file.Files.move(
          java.nio.file.Paths.get(f.makeQualified(src).toUri.getPath),
          java.nio.file.Paths.get(f.makeQualified(dst).toUri.getPath),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        true
      } catch { case scala.util.control.NonFatal(_) => false }
    }

  /** Drop the legacy manifest file (external-writer escape hatch; also
    * called by the log bootstrap to retire the pre-log snapshot). */
  def invalidate(dir: String): Unit =
    try { rawFs(dir).delete(manifestPath(dir), false): Unit }
    catch { case scala.util.control.NonFatal(_) => }

  def clearCache(): Unit = {
    cache.synchronized(cache.clear())
  }
}

/** File-level column statistics: each leaf's page stats merged over the
  * whole file, serialized as a small binary blob in the manifest and
  * re-materialized as a synthetic ONE-page footer — so file-level pruning
  * reuses [[ZoneMapFilter]]'s page satisfiability verbatim instead of
  * duplicating its kind-aware comparison logic. */
object ManifestStats {

  /** Layout (LE, via ByteBuf), version 2: version u8 | numRows i64 | per
    * leaf (schema DFS order): flags u8 (low 6 bits = stats kind, 0x40 =
    * has i128 sum) | nullCount i64 | if kind != None: min, max i64 | if
    * kind == Decimal128: min2, max2 i64 | if has sum: sumHi, sumLo i64.
    * Version-1 blobs (pre-sum) still decode. */
  def encode(footer: StrawFooter): Array[Byte] = {
    val out = new graft.format.ByteBuf(256)
    out.putByte(2)
    out.putLong(footer.numRows)
    footer.columns.foreach { col =>
      var kind = StrawFormat.StatsNone
      var mn = 0L; var mx = 0L; var mn2 = 0L; var mx2 = 0L
      var nulls = 0L
      var mixed = false
      // file-level sum exists iff EVERY page carries one (the writer emits
      // sums uniformly per leaf, so a mixed leaf means generations differ)
      var hasSum = col.pages.nonEmpty
      var sHi = 0L; var sLo = 0L
      col.pages.foreach { p =>
        nulls += p.nullCount
        if (p.hasSum) {
          val s = StrawFormat.add128(sHi, sLo, p.sumHi, p.sumLo)
          sHi = s._1; sLo = s._2
        } else hasSum = false
        if (p.statsKind != StrawFormat.StatsNone && !mixed) {
          if (kind == StrawFormat.StatsNone) {
            kind = p.statsKind; mn = p.min; mx = p.max; mn2 = p.min2; mx2 = p.max2
          } else if (kind != p.statsKind) {
            // pages disagree on kind (legacy/new decimal mix): no file stats
            mixed = true; kind = StrawFormat.StatsNone
          } else {
            if (lessThan(kind, p.min, p.min2, mn, mn2)) { mn = p.min; mn2 = p.min2 }
            if (lessThan(kind, mx, mx2, p.max, p.max2)) { mx = p.max; mx2 = p.max2 }
          }
        }
      }
      out.putByte(kind | (if (hasSum) 0x40 else 0))
      out.putLong(nulls)
      if (kind != StrawFormat.StatsNone) { out.putLong(mn); out.putLong(mx) }
      if (kind == StrawFormat.StatsDecimal128) { out.putLong(mn2); out.putLong(mx2) }
      if (hasSum) { out.putLong(sHi); out.putLong(sLo) }
    }
    java.util.Arrays.copyOf(out.buf, out.len)
  }

  private def lessThan(kind: Int, aHi: Long, aLo: Long, bHi: Long, bLo: Long): Boolean =
    kind match {
      case StrawFormat.StatsDecimal128 => StrawFormat.compare128(aHi, aLo, bHi, bLo) < 0
      case StrawFormat.StatsPrefix => java.lang.Long.compareUnsigned(aHi, bHi) < 0
      case _ => aHi < bHi
    }

  /** Synthetic footer: one page per leaf carrying the file-merged stats.
    * `numValues`/`nullCount` clamp to Int range (page counts are ints)
    * while preserving EXACTLY the two boolean signals pruning reads from
    * them — all-null (nulls == rows) and has-null (nulls > 0): a >2B-row
    * file with most-but-not-all slots null must not clamp into an all-null
    * page that a comparison filter would wrongly prune. */
  def decode(schema: StructType, bytes: Array[Byte]): StrawFooter = {
    val in = graft.format.ByteIO.reader(bytes)
    val version = in.get() & 0xff
    require(version == 1 || version == 2, s"unknown manifest stats version $version")
    val numRows = in.getLong()
    val rowsInt = math.min(numRows, Int.MaxValue.toLong).toInt
    val leafCount = LeafLayout.starts(schema).last
    val cols = new Array[ColumnMeta](leafCount)
    var i = 0
    while (i < leafCount) {
      val flags = in.get() & 0xff
      val hasSum = version >= 2 && (flags & 0x40) != 0
      val kind = flags & 0x3f
      require(kind <= StrawFormat.StatsDecimal128, s"bad stats kind $kind")
      val nulls = in.getLong()
      val (mn, mx) =
        if (kind != StrawFormat.StatsNone) (in.getLong(), in.getLong()) else (0L, 0L)
      val (mn2, mx2) =
        if (kind == StrawFormat.StatsDecimal128) (in.getLong(), in.getLong()) else (0L, 0L)
      val (sHi, sLo) = if (hasSum) (in.getLong(), in.getLong()) else (0L, 0L)
      val nullsInt =
        if (nulls >= numRows) rowsInt
        else math.min(nulls, (rowsInt - 1).toLong).toInt
      cols(i) = ColumnMeta(0L,
        Array(PageMeta(rowsInt, 0L, nullsInt, kind, mn, mx, mn2, mx2, null,
          hasSum, sHi, sLo)))
      i += 1
    }
    StrawFooter(schema, numRows, cols)
  }
}
