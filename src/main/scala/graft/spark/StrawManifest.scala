package graft.spark

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path

import graft.spark.StrawIO.FileMeta

/** Committed-files manifest: a `_strawboat_manifest` snapshot of the
  * table's live data files (path + the (mtime, len) version key), written
  * by the commit protocol on every successful batch commit / streaming
  * epoch and read by planning in place of a recursive directory walk.
  *
  * Why: at 100k-file / object-store scale, LIST is the dominant planning
  * cost once footers are cached ([[FooterCache]]) — every query paid
  * `inferSchema` + selectivity-probe + scan-planning listings, and listings
  * are eventually-consistent on some stores. With the manifest, planning
  * over an unchanged table is ONE small cached read (zero directory
  * walks — [[StrawIO.listings]] observable), and a reader during a
  * concurrent append sees a complete old or complete new snapshot instead
  * of a mid-rename partial listing.
  *
  * Trust model: the manifest is maintained by THIS library's commit
  * protocol, which is the only writer of visible data files. It is written
  * from a post-commit directory walk UNIONed with the just-committed files
  * (under a per-table in-process lock, so same-driver concurrent commits
  * serialize their snapshot writes); a CROSS-process concurrent committer
  * can still produce a momentarily-incomplete manifest — the same
  * non-atomic-commit window the rename fan-out itself has (documented at
  * [[StrawCommitProtocol]]), closed only by a true transaction log, which
  * is out of scope. Files dropped into the directory by external tools are
  * not seen until the next commit; delete the manifest to force listing.
  * Any read/parse problem falls back to a directory walk — the manifest is
  * an accelerator with a well-defined failure mode, never a wall.
  */
object StrawManifest {
  val FileName = "_strawboat_manifest"
  private val HeaderV1 = "strawboat-manifest v1"
  private val HeaderV2Prefix = "strawboat-manifest v2 "

  /** Parsed-manifest cache keyed by (path, snapshot id). The snapshot id is
    * a per-write UUID embedded in the v2 header line — unlike the
    * (mtime, len) key the rest of the IO stack uses, it cannot collide when
    * the manifest (rewritten every commit/epoch, far more often than data
    * files) is replaced twice within one mtime granularity unit by
    * equal-length content. Legacy v1 manifests fall back to an
    * (mtime, len)-derived id. Small LRU: one entry per live table. */
  private val cache =
    new java.util.LinkedHashMap[(String, String), Seq[FileMeta]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), Seq[FileMeta]]): Boolean =
        size() > 1024
    }

  /** Manifest-backed listings served (cache or parse) — observability. */
  val hits = new AtomicLong()

  private val writeLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

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
  def read(dir: String): Option[Seq[FileMeta]] = {
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
          if (headLine.startsWith(HeaderV2Prefix)) headLine.stripPrefix(HeaderV2Prefix)
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
        val entries = lines.iterator.drop(1).filter(_.nonEmpty).map { line =>
          val a = line.indexOf('\t')
          val b = line.indexOf('\t', a + 1)
          require(a > 0 && b > a, s"bad manifest line: $line")
          FileMeta(s"$qdir/${line.substring(b + 1)}",
            line.substring(0, a).toLong, line.substring(a + 1, b).toLong)
        }.toVector
        cache.synchronized(cache.put(key, entries))
        hits.incrementAndGet()
        Some(entries)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Rewrite the snapshot after a commit: one direct directory walk UNION
    * the just-committed `fresh` files (the walk may race another in-flight
    * rename fan-out; fresh entries are exact). Serialized per table within
    * this process. On any failure the manifest is DELETED — a missing
    * manifest degrades to listing, a stale one would lose data. */
  def refresh(dir: String, fresh: Seq[FileMeta]): Unit = {
    val lock = writeLocks.computeIfAbsent(dir, _ => new Object)
    lock.synchronized {
      try {
        val listed = StrawIO.walkFilesMeta(dir)
        val byPath = scala.collection.mutable.LinkedHashMap.empty[String, FileMeta]
        listed.foreach(e => byPath(e.path) = e)
        fresh.foreach(e => byPath(e.path) = e)
        write(dir, byPath.values.toSeq)
      } catch {
        case scala.util.control.NonFatal(_) => invalidate(dir)
      }
    }
  }

  /** Write a snapshot: temp + swap. On a `file:` FS the swap is a true
    * atomic replace (NIO ATOMIC_MOVE) — a concurrent reader sees old or
    * new, never a gap; elsewhere it is delete→rename, whose gap degrades a
    * reader to a directory walk, never to wrong data. */
  def write(dir: String, entries: Seq[FileMeta]): Unit = {
    val f = rawFs(dir)
    val qdir = StrawIO.fs(dir).makeQualified(new Path(dir)).toString
    val prefix = qdir + "/"
    val sb = new StringBuilder(HeaderV2Prefix)
      .append(java.util.UUID.randomUUID().toString).append('\n')
    entries.sortBy(_.path).foreach { e =>
      require(e.path.startsWith(prefix), s"manifest entry outside table: ${e.path}")
      sb.append(e.mtime).append('\t').append(e.len).append('\t')
        .append(e.path.substring(prefix.length)).append('\n')
    }
    val tmp = new Path(dir,
      s".$FileName.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val os = f.create(tmp, true)
    var ok = false
    try { os.write(sb.toString.getBytes("UTF-8")); ok = true }
    finally {
      os.close()
      if (ok) {
        val mp = manifestPath(dir)
        if (!atomicReplace(f, tmp, mp)) {
          f.delete(mp, false)
          if (!f.rename(tmp, mp)) { f.delete(tmp, false); invalidate(dir) }
        }
      } else f.delete(tmp, false)
    }
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

  /** Drop the manifest (external-writer escape hatch / failed refresh). */
  def invalidate(dir: String): Unit =
    try { rawFs(dir).delete(manifestPath(dir), false): Unit }
    catch { case scala.util.control.NonFatal(_) => }

  def clearCache(): Unit = cache.synchronized(cache.clear())
}
