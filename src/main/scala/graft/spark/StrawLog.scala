package graft.spark

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.spark.StrawIO.FileMeta
import graft.spark.StrawManifest.Entry

/** Transaction log: the table's commit history as a `_straw_log/` directory
  * of version-numbered action files, making every table mutation — batch
  * append/truncate, streaming epoch, compaction — one ATOMIC metadata
  * operation with snapshot isolation. This closes the crash/concurrency
  * windows the walk-union [[StrawManifest]] protocol documented as "closed
  * only by a true transaction log":
  *
  *  - a reader (planning a query) resolves the table to the entries of the
  *    latest complete log version — a crash after the data-file rename
  *    fan-out but before the log commit leaves those files INVISIBLE
  *    (uncommitted debris for [[vacuumUnreferenced]]), not a partial commit;
  *  - truncate and compaction become atomic generation switches: the log
  *    records removes+adds in ONE version file, physical deletes happen
  *    after — a reader sees the old or the new generation, never both and
  *    never neither;
  *  - concurrent committers race on `createLink`/rename-claimed version
  *    files instead of silently overwriting each other's walk-based
  *    manifests: the loser re-reads and retries (appends commute) or fails
  *    cleanly (conflicting removes);
  *  - streaming epochs carry an idempotence action (`X query version`):
  *    a replayed epoch whose log commit already won is recognized and
  *    dropped even when the engine's own marker was lost in a crash;
  *  - commits are O(changed files), not O(table): the old protocol re-walked
  *    the directory and rewrote the full manifest every commit — at 100k
  *    files that is the dominant commit cost and an eventual-consistency
  *    hazard on object stores. A log commit writes one small delta file.
  *
  * Old versions remain readable ([[snapshotAt]] — time travel /
  * `versionAsOf`) until their files are reclaimed by compaction's vacuum or
  * [[vacuumUnreferenced]].
  *
  * Layout (all files under `<table>/_straw_log/`):
  * {{{
  * 00000000000000000001.commit      // one per version, atomically claimed
  * 00000000000000000010.checkpoint  // full snapshot every Nth version
  * }}}
  * Commit/checkpoint body is line-framed UTF-8, the [[StrawManifest]] v3
  * grammar plus remove/txn actions:
  * {{{
  * strawboat-log v1 <uuid>
  * S<idx>\t<schema json>                     (schema dictionary)
  * A\t<mtime>\t<len>\t<schemaIdx|->\t<statsB64|->\t<relpath>
  * R\t<relpath>
  * X\t<version>\t<appId>                     (streaming idempotence)
  * E                                         (completeness terminator)
  * }}}
  *
  * Atomicity of the version claim: the commit body is written to a temp
  * file, then linked/renamed to `<version>.commit` with a create-if-absent
  * primitive — `Files.createLink` on the local FS (atomic, fails when the
  * target exists), non-overwriting rename on HDFS-likes. Object stores
  * without an atomic claim degrade to last-writer-wins on a same-version
  * race, the same caveat Delta has without a coordinating LogStore.
  *
  * Trust model mirrors the manifest: this library's committers are the only
  * writers. Files dropped in externally are not seen; delete `_straw_log/`
  * (and `_strawboat_manifest`) to force directory walking. Any replay
  * problem (corrupt or missing version file) falls back to the legacy
  * manifest, then to a walk — the log accelerates and isolates, it must
  * never wall off the data.
  */
object StrawLog {
  val DirName = "_straw_log"
  private val Header = "strawboat-log v1 "
  private val CommitExt = ".commit"
  private val CheckpointExt = ".checkpoint"

  /** Write a checkpoint every this many versions (replay cost bound). */
  val CheckpointInterval = 10

  /** One resolved table state: `entries` keyed by path (sorted), `txns` the
    * latest committed version per streaming query id. */
  final case class Snapshot(version: Long, entries: Seq[Entry],
      txns: Map[String, Long]) {
    lazy val pathSet: Set[String] = entries.map(_.meta.path).toSet
  }

  def logDir(table: String): Path = new Path(table, DirName)

  /** Log-served snapshot resolutions — observability (zero-walk proofs). */
  val hits = new java.util.concurrent.atomic.AtomicLong()

  // replayed snapshots keyed by (log dir, version, commit-file mtime, len):
  // replay happens once per version per process, every later planning pass
  // is a map hit. The (mtime, len) of the version FILE is in the key so a
  // deleted-and-recreated log (the external-writer escape hatch) can never
  // serve the previous incarnation's snapshot for a colliding version
  // number — same version-keying discipline as [[FooterCache]].
  private val cache =
    new java.util.LinkedHashMap[(String, Long, Long, Long), Snapshot](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long, Long), Snapshot]): Boolean =
        size() > 256
    }

  private val writeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Raw FS (no checksum sidecars) — single-file atomic ops, as manifest. */
  private def rawFs(dir: String): FileSystem =
    StrawIO.fs(dir) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }

  private def versionOf(name: String, ext: String): Option[Long] =
    if (!name.endsWith(ext)) None
    else {
      val stem = name.dropRight(ext.length)
      if (stem.length == 20 && stem.forall(_.isDigit)) Some(stem.toLong) else None
    }

  private def commitPath(ld: Path, v: Long) = new Path(ld, f"$v%020d$CommitExt")
  private def checkpointPath(ld: Path, v: Long) = new Path(ld, f"$v%020d$CheckpointExt")

  /** (commit version → file (mtime, len), checkpoint versions) present —
    * ONE shallow listing of the log directory (not a recursive data walk). */
  private def listVersions(f: FileSystem, ld: Path)
      : (scala.collection.SortedMap[Long, (Long, Long)], Seq[Long]) = {
    val sts =
      try f.listStatus(ld)
      catch { case _: java.io.FileNotFoundException =>
        return (scala.collection.SortedMap.empty, Nil) }
    val commits = scala.collection.SortedMap.newBuilder[Long, (Long, Long)]
    val checkpoints = Seq.newBuilder[Long]
    sts.foreach { st =>
      val n = st.getPath.getName
      versionOf(n, CommitExt).foreach(
        commits += _ -> ((st.getModificationTime, st.getLen)))
      versionOf(n, CheckpointExt).foreach(checkpoints += _)
    }
    (commits.result(), checkpoints.result().sorted)
  }

  def exists(table: String): Boolean =
    try rawFs(table).getFileStatus(logDir(table)).isDirectory
    catch { case _: java.io.IOException => false }

  def latestVersion(table: String): Option[Long] = {
    val (commits, _) = listVersions(rawFs(table), logDir(table))
    commits.keySet.lastOption
  }

  /** The latest snapshot, or None when the table has no (readable) log —
    * callers fall back to the legacy manifest, then to walking. */
  def snapshot(table: String): Option[Snapshot] = resolve(table, None)

  /** The snapshot AS OF `version` (time travel). None when the log is
    * absent/unreadable or the version exceeds the latest; reads of entries
    * whose files were since vacuumed fail at scan time, not here. */
  def snapshotAt(table: String, version: Long): Option[Snapshot] =
    resolve(table, Some(version))

  /** The newest version whose commit-file timestamp is at or before
    * `tsMs` — the `timestampAsOf` resolution. None when the log is absent
    * or nothing was committed by then. Commit timestamps are the log
    * files' mtimes: monotone in practice (commits serialize on the version
    * claim) but clock-skewed writers can blur sub-second ordering. */
  def versionAtTimestamp(table: String, tsMs: Long): Option[Long] = {
    val (commits, _) = listVersions(rawFs(table), logDir(table))
    commits.toSeq.filter(_._2._1 <= tsMs).map(_._1).maxOption
  }

  /** (version, commit-file mtime) of the newest retained commit. */
  def latestCommitInfo(table: String): Option[(Long, Long)] = {
    val (commits, _) = listVersions(rawFs(table), logDir(table))
    commits.lastOption.map { case (v, (mtime, _)) => (v, mtime) }
  }

  private def resolve(table: String, asOf: Option[Long]): Option[Snapshot] =
    try {
      val f = rawFs(table)
      val ld = logDir(table)
      val (commits, checkpoints) = listVersions(f, ld)
      if (commits.isEmpty) return None
      val target = asOf match {
        case Some(v) => if (commits.contains(v)) v else return None
        case None => commits.lastKey
      }
      val (tMtime, tLen) = commits(target)
      val key = (f.makeQualified(ld).toString, target, tMtime, tLen)
      cache.synchronized(Option(cache.get(key))).foreach { s =>
        hits.incrementAndGet(); return Some(s)
      }
      // replay: nearest checkpoint at or below the target, then the commit
      // tail. A gap in the tail (cleaned or lost version file) is a replay
      // failure — fall back rather than serve a snapshot with holes.
      val base = checkpoints.filter(_ <= target).lastOption
      val start = base.map(_ + 1).getOrElse(
        if (commits.firstKey == 1L) 1L else return None)
      val tail = (start to target).filter { v =>
        if (!commits.contains(v)) return None
        true
      }
      val qdir = StrawIO.fs(table).makeQualified(new Path(table)).toString
      val entries = scala.collection.mutable.LinkedHashMap.empty[String, Entry]
      var txns = Map.empty[String, Long]
      base.foreach { cv =>
        val a = parseActions(readLines(f, checkpointPath(ld, cv)), qdir)
          .getOrElse(return None)
        a.actions.foreach { case Right(e) => entries(e.meta.path) = e; case _ => }
        txns ++= a.txns
      }
      tail.foreach { v =>
        val a = parseActions(readLines(f, commitPath(ld, v)), qdir)
          .getOrElse(return None)
        a.actions.foreach {
          case Right(e) => entries(e.meta.path) = e
          case Left(removed) => entries.remove(removed): Unit
        }
        txns ++= a.txns
      }
      val snap = Snapshot(target, entries.values.toVector.sortBy(_.meta.path), txns)
      cache.synchronized(cache.put(key, snap))
      hits.incrementAndGet()
      Some(snap)
    } catch { case scala.util.control.NonFatal(_) => None }

  private def readLines(f: FileSystem, p: Path): Array[String] = {
    val st = f.getFileStatus(p)
    val in = f.open(p)
    try {
      val bytes = new Array[Byte](st.getLen.toInt)
      in.readFully(0, bytes)
      new String(bytes, "UTF-8").split('\n')
    } finally in.close()
  }

  /** One parsed commit/checkpoint body: (Right(add) | Left(removePath))
    * actions in file order, txns, and the operation description. */
  private final case class Actions(actions: Seq[Either[String, Entry]],
      txns: Map[String, Long], op: String)

  /** Parse one commit/checkpoint body; None on any malformed framing
    * (missing header or `E` terminator, bad line) — the caller treats the
    * whole log as unreadable rather than trusting a partial parse. */
  private def parseActions(lines: Array[String], qdir: String): Option[Actions] = {
    if (lines.isEmpty || !lines(0).startsWith(Header)) return None
    val body = lines.drop(1).filter(_.nonEmpty)
    if (body.isEmpty || body.last != "E") return None
    val schemas = scala.collection.mutable.ArrayBuffer.empty[(String, StructType)]
    val out = Seq.newBuilder[Either[String, Entry]]
    var txns = Map.empty[String, Long]
    var op = ""
    try {
      body.dropRight(1).foreach { line =>
        if (line.startsWith("S")) StrawManifest.parseSchemaLine(line, schemas, "log")
        else if (line.startsWith("A\t"))
          out += Right(StrawManifest.parseEntryLine(line, schemas, qdir, "log"))
        else if (line.startsWith("R\t")) {
          out += Left(s"$qdir/${line.substring(2)}")
        } else if (line.startsWith("X\t")) {
          val parts = line.split('\t')
          require(parts.length >= 3, s"bad log txn line: $line")
          txns += (parts.drop(2).mkString("\t") -> parts(1).toLong)
        } else if (line.startsWith("O\t")) {
          op = line.substring(2)
        } else require(false, s"bad log line: $line")
      }
      Some(Actions(out.result(), txns, op))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def serialize(adds: Seq[Entry], removes: Seq[String],
      txns: Map[String, Long], qdir: String, op: String): String = {
    val prefix = qdir + "/"
    val sb = new StringBuilder(Header)
      .append(java.util.UUID.randomUUID().toString).append('\n')
    if (op.nonEmpty)
      sb.append("O\t").append(op.replace('\n', ' ').replace('\t', ' ')).append('\n')
    val sorted = adds.sortBy(_.meta.path)
    val schemaIdx = StrawManifest.appendSchemaDict(sb, sorted)
    // R before A: replay applies actions in file order, so if the
    // adds/removes disjointness requirement is ever relaxed, an in-place
    // path replacement nets to ADDED rather than silently removed
    removes.sorted.foreach { p =>
      require(p.startsWith(prefix), s"log remove outside table: $p")
      sb.append("R\t").append(p.substring(prefix.length)).append('\n')
    }
    sorted.foreach(StrawManifest.appendEntryLine(sb, 'A', _, schemaIdx, prefix, "log"))
    txns.toSeq.sortBy(_._1).foreach { case (app, v) =>
      sb.append("X\t").append(v).append('\t').append(app).append('\n')
    }
    sb.append("E\n")
    sb.toString
  }

  /** Claim `dst` with create-if-absent semantics.
    * @return true when THIS writer's content is at `dst`. */
  private[spark] def claim(f: FileSystem, tmp: Path, dst: Path): Boolean = {
    val won =
      if (f.getUri.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(f.makeQualified(dst).toUri.getPath),
            java.nio.file.Paths.get(f.makeQualified(tmp).toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case scala.util.control.NonFatal(_) => false
        }
      } else {
        // HDFS-like rename does not overwrite an existing destination
        try !f.exists(dst) && f.rename(tmp, dst)
        catch { case scala.util.control.NonFatal(_) => false }
      }
    try f.delete(tmp, false) catch { case scala.util.control.NonFatal(_) => }
    won
  }

  /** Raised when a commit with removes loses a race against another
    * committer that already removed (or replaced) one of the same files —
    * retrying blindly would resurrect or double-delete a generation. */
  final class ConflictException(msg: String)
    extends java.util.ConcurrentModificationException(msg)

  /** Commit `adds` (absolute-path entries, stats optional) and `removes`
    * (absolute paths) as the next log version and return it.
    *
    * First commit on a table BOOTSTRAPS the log: the current table state
    * (legacy manifest when present — its stats carry over — else one
    * directory walk) is folded into version 1 as adds, and the legacy
    * manifest file is retired so a later log-read failure can never fall
    * back to a STALE pre-log snapshot.
    *
    * `txn = (appId, version)` makes the commit idempotent per appId: when
    * the log already records `appId` at `version` or later the commit is a
    * no-op returning the current version — the streaming-epoch replay guard.
    *
    * Append-only commits retry transparently when another committer claims
    * the version first (adds commute). Commits with `removes` throw
    * [[ConflictException]] when any removed path is no longer in the latest
    * snapshot. */
  def commit(table: String, adds: Seq[Entry], removes: Set[String] = Set.empty,
      txn: Option[(String, Long)] = None, op: String = ""): Long = {
    require(adds.map(_.meta.path).toSet.intersect(removes).isEmpty,
      "strawboat: log commit adds and removes must be disjoint (an in-place " +
        "path replacement would net to REMOVED on replay)")
    val lock = writeLocks.computeIfAbsent(table, _ => new Object)
    lock.synchronized {
      val f = rawFs(table)
      val ld = logDir(table)
      f.mkdirs(ld)
      val qdir = StrawIO.fs(table).makeQualified(new Path(table)).toString
      var attempt = 0
      while (true) {
        val cur = snapshot(table)
        if (cur.isEmpty) {
          // distinguish "no log" (bootstrap) from "log present but
          // unreadable" (corrupt/vacuumed tail, concurrent cleanup):
          // bootstrapping over an EXISTING log would claim a low version
          // number the latest snapshot never replays — a silent fork that
          // loses the commit (and, with removes, deletes files the live
          // snapshot still references). Refuse instead.
          val (commits, _) = listVersions(f, ld)
          if (commits.nonEmpty) throw new IllegalStateException(
            s"strawboat: transaction log of $table exists (versions " +
              s"${commits.firstKey}..${commits.lastKey}) but cannot be " +
              "resolved — refusing to commit over an unreadable log; repair " +
              "or delete _straw_log to fall back to directory listing")
        }
        txn.foreach { case (app, v) =>
          if (cur.exists(_.txns.getOrElse(app, Long.MinValue) >= v))
            return cur.get.version // replayed epoch: already committed
        }
        if (removes.nonEmpty) cur.foreach { s =>
          val gone = removes.filterNot(s.pathSet)
          if (gone.nonEmpty) throw new ConflictException(
            s"strawboat: log commit removes ${gone.size} file(s) no longer in " +
              s"version ${s.version} of $table (concurrent truncate/compaction?): " +
              gone.take(3).mkString(", "))
        }
        val next = cur.map(_.version + 1).getOrElse(1L)
        val addPaths = adds.map(_.meta.path).toSet
        val bootstrap: Seq[Entry] =
          if (cur.isDefined) Seq.empty
          else {
            // fold the pre-log table state into version 1; prefer the legacy
            // manifest (zero walks, stats carry), else walk once
            val prior = StrawManifest.readLegacyEntries(table)
              .getOrElse(StrawIO.walkFilesMeta(table).map(Entry(_, null, null)))
            prior.filterNot(e => addPaths(e.meta.path) || removes(e.meta.path))
          }
        // a bootstrap needs no R lines: files subtracted from the folded
        // prior state are simply never listed
        val removeLines = if (cur.isEmpty) Seq.empty else removes.toSeq
        val opLine = if (cur.isEmpty && op.nonEmpty) s"$op (bootstrap)" else op
        val body = serialize(bootstrap ++ adds, removeLines,
          txn.map { case (app, v) => Map(app -> v) }.getOrElse(Map.empty), qdir,
          opLine)
        val tmp = new Path(ld, s".tmp-${java.util.UUID.randomUUID().toString.take(12)}")
        val os = f.create(tmp, true)
        var ok = false
        try { os.write(body.getBytes("UTF-8")); ok = true }
        finally { os.close(); if (!ok) f.delete(tmp, false): Unit }
        if (claim(f, tmp, commitPath(ld, next))) {
          if (cur.isEmpty) StrawManifest.invalidate(table) // retire legacy snapshot
          afterCommit(table, f, ld, qdir, next)
          return next
        }
        attempt += 1
        require(attempt < 50,
          s"strawboat: log commit on $table lost ${attempt} version races — aborting")
        // lost the race: invalidate nothing (cache is version-keyed), retry
      }
      -1L // unreachable
    }
  }

  /** Post-commit maintenance: materialize the new snapshot into the cache
    * and write a checkpoint every [[CheckpointInterval]] versions. Failures
    * here never fail the commit — the version file IS the commit. */
  private def afterCommit(table: String, f: FileSystem, ld: Path, qdir: String,
      version: Long): Unit = {
    try {
      val snap = snapshot(table).getOrElse(return)
      if (snap.version == version && version % CheckpointInterval == 0) {
        val body = serialize(snap.entries, Seq.empty, snap.txns, qdir, "checkpoint")
        val tmp = new Path(ld, s".tmp-${java.util.UUID.randomUUID().toString.take(12)}")
        val os = f.create(tmp, true)
        var ok = false
        try { os.write(body.getBytes("UTF-8")); ok = true }
        finally { os.close(); if (!ok) f.delete(tmp, false): Unit }
        if (ok) claim(f, tmp, checkpointPath(ld, version)): Unit
      }
    } catch { case scala.util.control.NonFatal(_) => }
  }

  /** One table-history row ([[history]]): the version, the commit file's
    * timestamp, the writer-recorded operation, and the commit's action
    * counts. `addedFiles` of a bootstrap commit includes the folded pre-log
    * state. */
  final case class HistoryRow(version: Long, timestampMs: Long, operation: String,
      addedFiles: Int, removedFiles: Int, txn: Option[(String, Long)])

  /** The table's commit history, newest first — a DESCRIBE-HISTORY-style
    * audit of every retained log version (vacuumed versions are absent).
    * Unreadable version files yield a row with operation
    * `"(unreadable)"` rather than hiding the version. */
  def history(table: String): Seq[HistoryRow] = {
    val f = rawFs(table)
    val ld = logDir(table)
    val (commits, _) = listVersions(f, ld)
    val qdir = StrawIO.fs(table).makeQualified(new Path(table)).toString
    commits.toSeq.sortBy(-_._1).map { case (v, (mtime, _)) =>
      (try parseActions(readLines(f, commitPath(ld, v)), qdir)
      catch { case scala.util.control.NonFatal(_) => None }) match {
        case Some(a) =>
          HistoryRow(v, mtime, a.op,
            addedFiles = a.actions.count(_.isRight),
            removedFiles = a.actions.count(_.isLeft),
            txn = a.txns.headOption)
        case None => HistoryRow(v, mtime, "(unreadable)", 0, 0, None)
      }
    }
  }

  /** Reclaim data files that are VISIBLE on disk (`*.strb`, no stage
    * suffix) but absent from the latest snapshot — crash debris from a
    * rename fan-out whose log commit never happened, or a remove whose
    * physical delete crashed. Only files older than `olderThanMs` go (a
    * concurrent commit's just-renamed files are younger — but compaction
    * stamps outputs with their max INPUT mtime, so do not run this while a
    * compaction is in flight). Reclaiming a file breaks time travel to the
    * versions that referenced it.
    * @return deleted file count */
  def vacuumUnreferenced(table: String, olderThanMs: Long = 24 * 3600 * 1000L): Int = {
    val snap = snapshot(table).getOrElse(return 0)
    val f = StrawIO.fs(table)
    val cutoff = System.currentTimeMillis() - olderThanMs
    var n = 0
    StrawIO.walkFiles(f, new Path(table)) { st =>
      val p = f.makeQualified(st.getPath).toString
      if (p.endsWith(graft.format.StrawFormat.Extension) && !snap.pathSet(p) &&
        st.getModificationTime < cutoff) {
        if (f.delete(st.getPath, false)) n += 1
      }
    }
    n
  }

  /** Drop log versions older than the checkpoint preceding `keepVersions`
    * back from the latest — bounds log-directory growth for long-lived
    * streaming sinks at the cost of time travel past the horizon. Never
    * removes the basis of the CURRENT snapshot. */
  def vacuumLog(table: String, keepVersions: Int = 100): Int = {
    val f = rawFs(table)
    val ld = logDir(table)
    val (commits, checkpoints) = listVersions(f, ld)
    if (commits.isEmpty) return 0
    val horizon = commits.lastKey - math.max(0, keepVersions)
    // newest checkpoint at or below the horizon becomes the replay base for
    // every retained version; STRICTLY older files are droppable (the base
    // version's own commit file stays, so snapshotAt(base) and the
    // commits-nonEmpty invariant survive even keepVersions = 0)
    val base = checkpoints.filter(_ <= horizon).lastOption.getOrElse(return 0)
    var n = 0
    commits.keysIterator.filter(_ < base).foreach { v =>
      if (f.delete(commitPath(ld, v), false)) n += 1
    }
    checkpoints.filter(_ < base).foreach { v =>
      if (f.delete(checkpointPath(ld, v), false)) n += 1
    }
    n
  }

  /** External-writer escape hatch: delete the whole log (readers fall back
    * to the legacy manifest or directory walking). */
  def invalidate(table: String): Unit =
    try { rawFs(table).delete(logDir(table), true): Unit }
    catch { case scala.util.control.NonFatal(_) => }

  def clearCache(): Unit = cache.synchronized(cache.clear())
}
