package graft.spark

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

import graft.format.WriteOptions

/** Small-file compaction for strawboat tables.
  *
  * Streaming sinks emit a file set per epoch and incremental batch appends
  * add more; a long-lived table accumulates files that every plan and scan
  * pays for forever (footer IO, task scheduling, page fragmentation). The
  * reference format is single-file and has no table maintenance surface —
  * this is part of the table layer built around it (SURVEY §2.9).
  *
  * `compact` bin-packs the table's small files (per partition directory,
  * per file schema) into `targetFileBytes`-sized rewrites and swaps them in
  * through the commit-protocol machinery:
  *
  *  1. rewrite bins DISTRIBUTED (one Spark task per bin) into files staged
  *     under a job-scoped suffix — invisible to every reader;
  *  2. rename outputs visible, stamped with the bin's MAX INPUT mtime (not
  *     commit time: compaction moves bytes, not data — a file-stream reader
  *     whose high-water mark already passed the inputs must not see the
  *     rewrite as fresh rows);
  *  3. commit the generation switch to the [[StrawLog]] transaction log in
  *     ONE atomic version file (adds = outputs, removes = inputs) — log
  *     readers observe the old or the new generation, never both;
  *  4. delete the inputs (vacuum).
  *
  * Files at or above `smallFileBytes` (default: the target itself) are left
  * untouched — compaction cost is proportional to the small-file backlog,
  * not table size. Schema-evolved generations are compacted within their
  * own schema group (rewriting never converts data); hive partition
  * directories compact independently, preserving the layout and its
  * pruning.
  *
  * Crash/concurrency contract (backed by the [[StrawLog]] transaction
  * log): the generation switch is ONE atomic log commit, so log readers
  * observe the old or the new file set, never both. A crash or IO failure
  * before the commit leaves nothing visible (outputs are rolled back on an
  * ordinary failure; after a hard crash they are unreferenced debris for
  * [[StrawLog.vacuumUnreferenced]]); a crash after the commit but before
  * the input vacuum leaves unreferenced INPUTS, reclaimed the same way. A
  * concurrent committer that removed any input first surfaces as a clean
  * [[StrawLog.ConflictException]] no-op. Only a directory-WALKING reader
  * (log and manifest both deleted/corrupt) can transiently see both
  * generations mid-vacuum. Readers that captured a pre-compaction snapshot
  * can fail (not mis-answer) when the vacuum deletes inputs under them.
  *
  * Streaming a directory AS A SOURCE while compacting it is OUT OF
  * CONTRACT unless the stream's high-water mark has already advanced past
  * `max input mtime` — and note the mark trails the newest seen file by
  * the source's safety lag (5 minutes), so compacting files a live stream
  * saw less than that ago WILL re-deliver the rewritten rows under their
  * new paths. Compact stream SOURCES only when the feeding stream is
  * stopped/drained and the inputs are older than the lag, or when
  * downstream re-delivery is acceptable. (Stream SINKS are always safe to
  * compact: the writing query's exactly-once bookkeeping is the epoch
  * markers + engine checkpoint, which compaction never touches.) This is
  * the same limitation Spark's own FileStreamSource has for files
  * rewritten in place.
  */
/** Mechanics shared by the table-maintenance rewriters ([[StrawCompaction]],
  * [[StrawDelete]]): bloom re-derivation, the stamped rename-visible fan-out
  * with rollback, and the atomic log switch + vacuum epilogue. One
  * implementation, so a fix to the rollback or mtime-stamping contract
  * cannot diverge between the two paths. */
private[spark] object MaintenanceOps {

  /** Row-aligned leaf paths of `footer`'s schema that carry page blooms —
    * rewrites re-derive these so routine maintenance never silently strips
    * the point-lookup acceleration the table was written with. Repeated
    * (array/map) leaves are dropped: not row-aligned, never probe-able
    * (files written before the writer rejected such paths may carry them). */
  def bloomLeavesOf(footer: graft.format.StrawFooter): Set[String] = {
    val paths = graft.format.LeafLayout.leafPaths(footer.schema)
    val aligned = graft.format.LeafLayout.leaves(footer.schema)
      .map(!_._1.contains(graft.format.LeafLayout.LevelRep))
    footer.columns.indices.collect {
      case li if aligned(li) && footer.columns(li).pages.exists(_.bloom != null) =>
        paths(li)
    }.toSet
  }

  /** The row-matching ops' candidate ladder: hive partition directories,
    * then file-level stats from the snapshot, then the real footer's page
    * zone maps — a file excluded by any tier provably holds no matching
    * row and costs no data IO.
    * @return (candidate files, pruned-file count) */
  def matchCandidates(listed: Seq[(StrawIO.FileMeta, Option[graft.format.StrawFooter])],
      schema: org.apache.spark.sql.types.StructType,
      filters: Array[org.apache.spark.sql.sources.Filter])
      : (Seq[StrawIO.FileMeta], Int) = {
    val afterPartition = PartitionLayout.pruneBy(listed, schema, filters)(_._1.path)
    val afterStats = afterPartition.filter { case (_, synth) =>
      synth.forall(sf => ZoneMapFilter.keptPages(sf, filters)(0))
    }
    val candidates = StrawIO.mapParallel(afterStats) { case (m, _) =>
      val footer = FooterCache.get(m.path, m.mtime, m.len)
      val keep = ZoneMapFilter.keptPages(footer, filters)
      (m, footer.columns.headOption.map(_.pages.length).getOrElse(0), keep)
    }.collect { case (m, nPages, keep) if (0 until nPages).exists(keep) => m }
    (candidates, listed.size - candidates.size)
  }

  /** One candidate file's rewrite outcome ([[rewriteMatching]]). */
  final case class RewriteOut(input: String, inputMtime: Long, matched: Long,
      staged: Seq[String]) extends Serializable

  /** The row-matching ops' distributed rewrite: one task per candidate file
    * streams TABLE-schema rows (the reader null-fills and widens per file),
    * counts `filters`-conjunction TRUE rows (SQL 3VL — [[RowFilterEval]]),
    * and stages the file's replacement: matching rows are DROPPED when
    * `assigns` is None (DELETE) or rewritten with the (ordinal, catalyst
    * value) assignments applied (UPDATE); non-matching rows pass through
    * unchanged. Input page blooms are re-derived; zero surviving rows stage
    * no file. On any task failure the job's staged debris is swept and the
    * error rethrown — nothing visible changed. */
  def rewriteMatching(spark: org.apache.spark.sql.SparkSession, dir: String,
      jobId: String, schema: org.apache.spark.sql.types.StructType,
      candidates: Seq[StrawIO.FileMeta],
      filters: Array[org.apache.spark.sql.sources.Filter],
      assigns: Option[Seq[(Int, Any)]],
      opts: WriteOptions): Array[RewriteOut] = {
    val serConf = new org.apache.spark.util.SerializableConfiguration(StrawIO.conf)
    val schemaJson = schema.json
    val filtersB = spark.sparkContext.broadcast(filters)
    val assignsB = spark.sparkContext.broadcast(assigns)
    try {
      spark.sparkContext.parallelize(candidates, candidates.size).map { m =>
        StrawIO.install(serConf.value)
        val tableSchema = org.apache.spark.sql.types.DataType
          .fromJson(schemaJson).asInstanceOf[org.apache.spark.sql.types.StructType]
        val pred = RowFilterEval.build(tableSchema, filtersB.value).getOrElse(
          throw new IllegalStateException(
            "strawboat: rewrite condition no longer compiles on the executor"))
        val as = assignsB.value
        val bloomLeaves = bloomLeavesOf(FooterCache.get(m.path, m.mtime, m.len))
        val parent = new Path(m.path).getParent.toString
        val writer = new StrawDataWriter(parent, tableSchema,
          partitionId = 0, taskId = 0,
          opts.copy(bloomColumns = opts.bloomColumns ++ bloomLeaves), jobId)
        val factory = new StrawPartitionReaderFactory(tableSchema, tableSchema, serConf)
        var matched = 0L
        var ok = false
        try {
          val reader = factory.createReader(
            StrawInputPartition(m.path, 0, Int.MaxValue, Long.MaxValue))
          try {
            while (reader.next()) {
              val row = reader.get()
              if (pred(row)) {
                matched += 1
                as.foreach { a =>
                  // copy() yields a mutable GenericInternalRow regardless
                  // of the reader's buffer representation
                  val r = row.copy()
                  a.foreach { case (i, cv) => r.update(i, cv) }
                  writer.write(r)
                }
              } else writer.write(row)
            }
          } finally reader.close()
          val msg = writer.commit().asInstanceOf[StrawCommitMessage]
          ok = true
          RewriteOut(m.path, m.mtime, matched, msg.files)
        } finally if (!ok) writer.abort()
      }.collect()
    } catch {
      case e: Throwable =>
        try StrawCommitProtocol.sweepStaged(dir, jobId)
        catch { case scala.util.control.NonFatal(s) => e.addSuppressed(s) }
        throw e
    }
  }

  /** Rename staged outputs visible, each group stamped with its mtime
    * BEFORE the rename (a reader must never list a file under a wrong
    * mtime; maintenance stamps the inputs' max mtime so a file-stream
    * source that already saw the data does not re-deliver it). On any
    * failure every output already made visible is deleted (the inputs are
    * untouched until the caller's vacuum, so nothing is lost) and this
    * job's staged debris swept before rethrowing — an ordinary IO error is
    * a clean no-op, never a both-generations directory. */
  def renameVisibleStamped(dir: String, jobId: String,
      groups: Seq[(Long, Seq[String])]): Seq[StrawIO.FileMeta] = {
    val f = StrawIO.fs(dir)
    val suffix = StrawCommitProtocol.stageSuffix(jobId)
    val visible = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
    try {
      groups.flatMap { case (mtime, names) =>
        StrawIO.mapParallel(names) { s =>
          val sp = new Path(s)
          val dst = new Path(sp.getParent, sp.getName.stripSuffix(suffix))
          val len = f.getFileStatus(sp).getLen
          f.setTimes(sp, mtime, -1)
          if (!f.rename(sp, dst))
            throw new java.io.IOException(s"strawboat: maintenance rename $sp -> $dst failed")
          visible.add(dst)
          StrawIO.FileMeta(f.makeQualified(dst).toString, mtime, len)
        }
      }
    } catch {
      case e: Throwable =>
        visible.forEach { p =>
          try f.delete(p, false)
          catch { case scala.util.control.NonFatal(s) => e.addSuppressed(s) }
        }
        try StrawCommitProtocol.sweepStaged(dir, jobId)
        catch { case scala.util.control.NonFatal(s) => e.addSuppressed(s) }
        throw e
    }
  }

  /** The maintenance epilogue: ONE atomic log version switches generations
    * (adds = rewrites, removes = inputs, recorded as `op`) — log readers
    * observe the old or the new set, never both. On a failed/conflicting
    * commit the visible `adds` are rolled back and staged debris swept
    * before rethrowing (inputs untouched — a clean no-op). On success the
    * removed inputs are vacuumed and staged debris swept; a crash between
    * commit and vacuum leaves unreferenced inputs for
    * [[StrawLog.vacuumUnreferenced]]. */
  def commitSwitchAndVacuum(dir: String, jobId: String,
      adds: Seq[StrawManifest.Entry], removes: Set[String], op: String): Unit = {
    val f = StrawIO.fs(dir)
    try StrawLog.commit(dir, adds, removes = removes, op = op)
    catch {
      case e: Throwable =>
        adds.foreach { a =>
          try f.delete(new Path(a.meta.path), false)
          catch { case scala.util.control.NonFatal(s) => e.addSuppressed(s) }
        }
        try StrawCommitProtocol.sweepStaged(dir, jobId)
        catch { case scala.util.control.NonFatal(s) => e.addSuppressed(s) }
        throw e
    }
    StrawIO.mapParallel(removes.toSeq)(p => f.delete(new Path(p), false))
    StrawCommitProtocol.sweepStaged(dir, jobId)
  }
}

object StrawCompaction {

  final case class CompactionResult(
      inputFiles: Int,
      outputFiles: Int,
      rewrittenBytes: Long,
      skippedFiles: Int,
      /** Always true since the [[StrawLog]] switch: a failed commit now
        * rolls back and throws instead of degrading. Retained for caller
        * compatibility. */
      manifestSwapped: Boolean = true) {
    def filesRemoved: Int = inputFiles - outputFiles
  }

  /** One rewrite unit: small files of one (partition directory, schema)
    * group whose lengths bin-pack under the target. */
  private final case class Bin(parent: String, schemaJson: String,
      files: Seq[StrawIO.FileMeta]) extends Serializable {
    def bytes: Long = files.foldLeft(0L)(_ + _.len)
    def maxMtime: Long = files.map(_.mtime).max
  }

  /** Compact `dir` in place. Returns counts; a table with nothing to do
    * (fewer than two small files per group) is a no-op.
    *
    * `clusterBy`: sort each rewritten bin by these top-level columns before
    * writing (ascending, SQL null ordering) — the OPTIMIZE-style clustering
    * pass. Small files arrive in arrival order, so their zone maps overlap
    * and range/point queries keep every page; a clustered rewrite makes
    * page (and file-stats) bounds disjoint, so the same queries prune.
    * Sorting buffers one bin in memory as materialized rows, so clustered
    * bins are ADDITIONALLY capped at `maxClusterRows` (boxed-row memory
    * tracks row count far more predictably than compressed bytes — a
    * 50×-compressed 128 MB bin can be gigabytes of heap). Clustered
    * outputs may therefore be smaller than `targetFileBytes`; rerun with a
    * higher cap to consolidate further. A bin whose schema generation
    * lacks a cluster column is written unsorted (schema evolution must not
    * block maintenance) — but a column no generation has fails fast. */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L << 20,
      opts: WriteOptions = WriteOptions(),
      smallFileBytes: Option[Long] = None,
      clusterBy: Seq[String] = Nil,
      maxClusterRows: Long = 4L << 20): CompactionResult = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val threshold = smallFileBytes.getOrElse(targetFileBytes)
    val live = StrawIO.listFilesMeta(dir)
    val (candidates, skipped) = live.partition(_.len < threshold)

    // group by (partition directory, exact file schema): rewrites never
    // cross a partition boundary (layout pruning survives) and never
    // convert between schema generations (read semantics unchanged)
    val withSchema = StrawIO.mapParallel(candidates) { m =>
      val footer = FooterCache.get(m.path, m.mtime, m.len)
      (m, footer.schema, footer.numRows)
    }
    // fail fast on a cluster column NO generation has (typo / wrong case /
    // dotted leaf path — clusterBy is top-level only); a per-bin miss
    // still falls back to unsorted for genuine schema evolution
    if (clusterBy.nonEmpty && withSchema.nonEmpty) {
      val known = withSchema.flatMap(_._2.fieldNames).toSet
      val unknown = clusterBy.filterNot(known)
      require(unknown.isEmpty,
        s"strawboat: clusterBy column(s) ${unknown.mkString(", ")} exist in no " +
          s"file schema (top-level columns: ${known.toSeq.sorted.mkString(", ")})")
    }
    val rowCap = if (clusterBy.isEmpty) Long.MaxValue else maxClusterRows
    val bins = withSchema
      .groupBy { case (m, schema, _) =>
        (new Path(m.path).getParent.toString, schema.json)
      }
      .toSeq.sortBy(_._1)
      .flatMap { case ((parent, schemaJson), members) =>
        // first-fit in path order; only multi-file bins are worth a rewrite
        val out = Seq.newBuilder[Bin]
        var cur = Vector.empty[StrawIO.FileMeta]
        var bytes = 0L
        var rows = 0L
        for ((m, _, nRows) <- members.sortBy(_._1.path)) {
          if (cur.nonEmpty && (bytes + m.len > targetFileBytes || rows + nRows > rowCap)) {
            if (cur.size > 1) out += Bin(parent, schemaJson, cur)
            cur = Vector.empty; bytes = 0L; rows = 0L
          }
          cur :+= m; bytes += m.len; rows += nRows
        }
        if (cur.size > 1) out += Bin(parent, schemaJson, cur)
        out.result()
      }

    if (bins.isEmpty)
      return CompactionResult(0, 0, 0L, skipped.size + candidates.size)

    val jobId = java.util.UUID.randomUUID().toString.take(8)
    val serConf = new org.apache.spark.util.SerializableConfiguration(StrawIO.conf)
    val outOpts = opts.copy(targetFileBytes = targetFileBytes)

    // one task per bin: stream the bin's rows through a fresh writer into
    // staged (invisible) files; executors return the staged names
    val staged: Array[(Bin, Seq[String])] =
      try {
        spark.sparkContext.parallelize(bins, bins.size).map { bin =>
          StrawIO.install(serConf.value)
          val schema = DataType.fromJson(bin.schemaJson).asInstanceOf[StructType]
          val factory = new StrawPartitionReaderFactory(schema, schema, serConf)
          // preserve page bloom filters through the rewrite: the input
          // footers record exactly which leaves carry them — without this,
          // routine maintenance would silently strip the point-lookup
          // acceleration the table was written with
          val bloomLeaves = bin.files.flatMap(fm =>
            MaintenanceOps.bloomLeavesOf(FooterCache.get(fm.path, fm.mtime, fm.len))).toSet
          val writer = new StrawDataWriter(bin.parent, schema,
            partitionId = 0, taskId = 0,
            outOpts.copy(bloomColumns = outOpts.bloomColumns ++ bloomLeaves),
            jobId)
          // clustering: sort the bin in memory when every cluster column
          // exists in this schema generation (ascending, SQL null order) —
          // bounded by the bin's size, which bin-packing already caps
          val sortIdx = clusterBy.map(schema.fieldNames.indexOf(_))
          val ordering: Option[Ordering[org.apache.spark.sql.catalyst.InternalRow]] =
            if (clusterBy.isEmpty || sortIdx.exists(_ < 0)) None
            else Some(new org.apache.spark.sql.catalyst.expressions.InterpretedOrdering(
              sortIdx.map(i => org.apache.spark.sql.catalyst.expressions.SortOrder(
                org.apache.spark.sql.catalyst.expressions.BoundReference(
                  i, schema.fields(i).dataType, schema.fields(i).nullable),
                org.apache.spark.sql.catalyst.expressions.Ascending))))
          var ok = false
          try {
            ordering match {
              case None =>
                for (f <- bin.files) {
                  val reader = factory.createReader(
                    StrawInputPartition(f.path, 0, Int.MaxValue, Long.MaxValue))
                  try { while (reader.next()) writer.write(reader.get()) }
                  finally reader.close()
                }
              case Some(ord) =>
                val buf = scala.collection.mutable.ArrayBuffer
                  .empty[org.apache.spark.sql.catalyst.InternalRow]
                for (f <- bin.files) {
                  val reader = factory.createReader(
                    StrawInputPartition(f.path, 0, Int.MaxValue, Long.MaxValue))
                  // copy: the reader reuses its row buffer across next()
                  try { while (reader.next()) buf += reader.get().copy() }
                  finally reader.close()
                }
                val arr = buf.toArray
                java.util.Arrays.sort(arr, ord)
                arr.foreach(writer.write)
            }
            val msg = writer.commit().asInstanceOf[StrawCommitMessage]
            ok = true
            (bin, msg.files)
          } finally if (!ok) writer.abort()
        }.collect()
      } catch {
        case e: Throwable =>
          // failed rewrite: nothing visible changed; drop this job's debris
          StrawCommitProtocol.sweepStaged(dir, jobId)
          throw e
      }

    // make outputs visible stamped with the bin's max input mtime, then
    // switch generations atomically and vacuum — shared mechanics (incl.
    // rollback on every failure path) live in [[MaintenanceOps]]
    val fresh = MaintenanceOps.renameVisibleStamped(dir, jobId,
      staged.toSeq.map { case (bin, names) => (bin.maxMtime, names) })
    val inputs = bins.flatMap(_.files.map(_.path)).toSet
    val adds = StrawIO.mapParallel(fresh)(StrawManifest.entryFor)
    MaintenanceOps.commitSwitchAndVacuum(dir, jobId, adds, inputs, op = "compact")

    CompactionResult(
      inputFiles = inputs.size,
      outputFiles = fresh.size,
      rewrittenBytes = bins.foldLeft(0L)(_ + _.bytes),
      skippedFiles = live.size - inputs.size,
      manifestSwapped = true)
  }
}
