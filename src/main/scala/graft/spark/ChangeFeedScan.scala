package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DSv2 execution of the change data feed ([[StrawChanges]]): reached via
  * reader options —
  * {{{
  * spark.read.format("strawboat")
  *   .option("readChangeFeed", "true")
  *   .option("startingVersion", "2")
  *   .option("endingVersion", "5")    // optional; omitted = pinned latest
  *   .load(dir)
  * }}}
  * One input partition per (file, change) task; each reader decodes only
  * the pages holding wanted ordinals (positions-bitmap page skip, the
  * common case for small DV diffs) and emits the file's schema-resolved
  * rows plus the `_change_type` / `_commit_version` labels. No filter or
  * column pushdown: a feed is an audit/replication scan, read whole by
  * design (Catalyst still filters/projects above the scan). */
private[spark] class ChangeFeedTable(dir: String, from: Long, to: Long,
    bounded: Boolean = false)
  extends Table with SupportsRead {
  override def name(): String = s"strawboat-changes:$dir@[$from,$to]"
  override def schema(): StructType = StrawChanges.plan(dir, from, to).outSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new ChangeFeedScan(dir, from, to, bounded,
        Option(options.get("maxFilesPerTrigger")).map(_.toInt),
        Option(options.get("maxBytesPerTrigger")).map(_.toLong))
    }
}

private[spark] class ChangeFeedScan(dir: String, from: Long, to: Long,
    bounded: Boolean = false, maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None)
  extends Scan with Batch {
  private lazy val plan = StrawChanges.plan(dir, from, to)
  override def readSchema(): StructType = plan.outSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"strawboat changes $dir versions [$from, $to] (${plan.tasks.size} tasks)"
  override def planInputPartitions(): Array[InputPartition] =
    plan.tasks.map(t => ChangeFeedPartition(t): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ChangeFeedReaderFactory(plan.dataSchema.json,
      new org.apache.spark.util.SerializableConfiguration(StrawIO.conf),
      plan.mapping)
  /** Streaming surface: replay the feed from `from`, then follow the
    * log's tail ([[ChangeFeedMicroBatchStream]]). An EXPLICIT
    * endingVersion bounds the stream (it drains and idles there); the
    * pinned-latest of an omitted one only fixes the schema. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ChangeFeedMicroBatchStream(dir, from, if (bounded) Some(to) else None,
      plan.dataSchema, maxFilesPerTrigger, maxBytesPerTrigger)
}

private[spark] final case class ChangeFeedPartition(
    task: StrawChanges.ChangeTask) extends InputPartition

private[spark] class ChangeFeedReaderFactory(dataSchemaJson: String,
    serConf: org.apache.spark.util.SerializableConfiguration,
    mapping: ColumnMappingState = ColumnMappingState.Empty)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    StrawIO.install(serConf.value)
    new ChangeFeedReader(
      partition.asInstanceOf[ChangeFeedPartition].task, dataSchemaJson, mapping)
  }
}

private[spark] class ChangeFeedReader(t: StrawChanges.ChangeTask,
    dataSchemaJson: String,
    mapping: ColumnMappingState = ColumnMappingState.Empty)
  extends PartitionReader[InternalRow] {

  private val (invert, label) =
    if (t.changeType.startsWith("!")) (true, t.changeType.substring(1))
    else (false, t.changeType)
  private val positions = Option(t.positionBytes).map(StrawChanges.fromBytes)
  private val dataSch = DataType.fromJson(dataSchemaJson).asInstanceOf[StructType]
  private val width = dataSch.length

  private val input =
    try StrawIO.open(t.path)
    catch {
      case e: java.io.FileNotFoundException => throw new IllegalStateException(
        s"strawboat: change feed needs ${t.path} (version ${t.version}) " +
          "but it was vacuumed — derive feeds within the retention window", e)
    }
  private val footer = mapping.toLogicalFooter(FooterCache.get(t.path, input))
  private val read = new MaintenanceOps.ResolvedFileRead(input, footer, dataSch)
  private val pageRows: Array[Int] =
    if (footer.columns.isEmpty) Array.empty
    else footer.columns(0).pages.map(_.numValues)

  // the labels are constant per task; data slots 0..width-1 refill per row
  private val row = new GenericInternalRow(width + 2)
  row.update(width, UTF8String.fromString(label))
  row.update(width + 1, t.version)

  private var p = 0
  private var i = 0
  private var ord = 0L
  private var zeroColOrd = 0L
  private var pages: Array[graft.format.DecodedPage] = _

  private def emit(o: Long): Boolean = positions match {
    case None => true
    case Some(b) =>
      val in = o <= Int.MaxValue && b.contains(o.toInt)
      if (invert) !in else in
  }

  override def next(): Boolean = {
    if (pageRows.isEmpty) {
      // zero-column file: every row is all-null (labels still apply)
      while (zeroColOrd < footer.numRows) {
        val o = zeroColOrd
        zeroColOrd += 1
        if (emit(o)) return true // slots 0..width-1 never written: stay null
      }
      return false
    }
    while (p < pageRows.length) {
      if (pages == null) {
        val n = pageRows(p)
        // page-skip: a positions-mode task decodes only pages holding a
        // wanted ordinal
        val wanted = positions match {
          case Some(b) if !invert =>
            ord <= Int.MaxValue &&
              b.rangeCardinality(ord, math.min(ord + n, Int.MaxValue.toLong + 1)) > 0
          case _ => true
        }
        if (wanted) {
          pages = read.decodePages(p)
          i = 0
        } else {
          ord += n
          p += 1
        }
      } else {
        val n = pageRows(p)
        while (i < n) {
          val o = ord
          val at = i
          i += 1
          ord += 1
          if (emit(o)) {
            read.fill(pages, at, row)
            return true
          }
        }
        pages = null
        p += 1
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = input.close()
}

// ---------------------------------------------------------------------------
// Streaming change feed
// ---------------------------------------------------------------------------

/** Position in a change-feed stream: every task of versions `< version` is
  * consumed, plus the first `idx` tasks of `version` in the stream's
  * deterministic per-version order ([[ChangeFeedMicroBatchStream.tasksOf]]).
  * Commit files and sidecars are write-once, so any `(start, end]` replays
  * to the same task list. */
private[spark] case class CdfStreamOffset(version: Long, idx: Int)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"v":$version,"i":$idx}"""
  def key: (Long, Int) = (version, idx)
}

private[spark] object CdfStreamOffset {
  def fromJson(json: String): CdfStreamOffset = {
    val s = json.trim
    require(s.startsWith("{") && s.endsWith("}"), s"bad cdf stream offset: $s")
    def field(k: String): String = {
      val i = s.indexOf(s""""$k":""")
      require(i >= 0, s"bad cdf stream offset (no $k): $s")
      s.substring(i + k.length + 3).takeWhile(c => c == '-' || c.isDigit)
    }
    CdfStreamOffset(field("v").toLong, field("i").toInt)
  }
  def leq(a: CdfStreamOffset, b: CdfStreamOffset): Boolean =
    Ordering[(Long, Int)].lteq(a.key, b.key)
}

/** Micro-batch source over the change data feed: each trigger delivers the
  * row-level changes of committed versions past the stream's position —
  * including the DELETEs and UPDATEs the append-only table stream must
  * skip, labeled with `_change_type`/`_commit_version`. This is the CDC
  * replication surface: a downstream MERGE keyed on `_change_type` tracks
  * the table exactly, retractions included.
  *
  * Semantics inherited from [[StrawChanges.plan]]: compaction delivers
  * nothing; a version whose preimage files or sidecars were vacuumed fails
  * LOUDLY rather than under-reporting. The schema is pinned at stream
  * start (a later-added column is dropped; an absent one null-fills per
  * file). Admission control caps tasks (`maxFilesPerTrigger`) or bytes
  * (`maxBytesPerTrigger`) per micro-batch, prefix-only so the offset
  * always describes a contiguous consumed range. */
private[spark] class ChangeFeedMicroBatchStream(dir: String, from: Long,
    bound: Option[Long], dataSchema: StructType,
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  require(from >= 1, s"strawboat: change-feed stream startingVersion must be >= 1, got $from")

  // Trigger.AvailableNow: pin the drain target once; capped micro-batches
  // then drain exactly this backlog and the query stops.
  @volatile private var availableNowVersion: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowVersion = Some(StrawLog.latestVersion(dir).getOrElse(0L))

  private def latestNow(): Long = {
    val l = availableNowVersion.getOrElse(StrawLog.latestVersion(dir).getOrElse(
      throw new IllegalStateException(
        s"strawboat: no transaction log under $dir — no change feed")))
    bound.fold(l)(math.min(l, _))
  }

  /** One version's change tasks in DETERMINISTIC order — the offset's idx
    * indexes this sequence, so it must replay identically across restarts
    * (the planner's map iteration order is not a contract; the sort is). */
  private def tasksOf(v: Long): Seq[StrawChanges.ChangeTask] =
    StrawChanges.plan(dir, v, v).tasks.sortBy(t => (t.path, t.changeType))

  /** Every unconsumed (position-after-it, task) from `start` through
    * version `hi`, in delivery order. */
  private def pendingFrom(start: CdfStreamOffset, hi: Long)
      : Seq[(CdfStreamOffset, StrawChanges.ChangeTask)] = {
    val out = Seq.newBuilder[(CdfStreamOffset, StrawChanges.ChangeTask)]
    var v = math.max(start.version, from)
    while (v <= hi) {
      val ts = tasksOf(v)
      var i = if (v == start.version) start.idx else 0
      while (i < ts.size) {
        out += ((CdfStreamOffset(v, i + 1), ts(i)))
        i += 1
      }
      v += 1
    }
    out.result()
  }

  override def initialOffset(): Offset = CdfStreamOffset(from, 0)
  override def deserializeOffset(json: String): Offset = CdfStreamOffset.fromJson(json)
  override def reportLatestOffset(): Offset = CdfStreamOffset(latestNow() + 1, 0)
  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def getDefaultReadLimit: ReadLimit = {
    val limits = maxFilesPerTrigger.map(ReadLimit.maxFiles).toSeq ++
      maxBytesPerTrigger.map(ReadLimit.maxBytes).toSeq
    limits match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  /** Prefix-only admission (mirrors the table stream's applyLimit): a gap
    * could advance the offset past a skipped task and lose it. */
  private def admit(pending: Seq[(CdfStreamOffset, StrawChanges.ChangeTask)],
      limit: ReadLimit): Int = limit match {
    case mf: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
      math.min(pending.size, mf.maxFiles())
    case mb: org.apache.spark.sql.connector.read.streaming.ReadMaxBytes =>
      var budget = mb.maxBytes()
      var n = 0
      var stop = false
      for ((_, t) <- pending if !stop) {
        if (n == 0 || t.len <= budget) { n += 1; budget -= t.len }
        else stop = true
      }
      n
    case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
      c.getReadLimits.foldLeft(pending.size)((acc, l) =>
        math.min(acc, admit(pending, l)))
    case _ => pending.size
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val so = start.asInstanceOf[CdfStreamOffset]
    val hi = latestNow()
    if (so.version > hi) return so
    val pending = pendingFrom(so, hi)
    if (pending.isEmpty) {
      // only task-less versions (compaction) ahead: fast-forward past them
      // so the position never lags into the vacuumLog horizon
      val ff = CdfStreamOffset(hi + 1, 0)
      if (CdfStreamOffset.leq(ff, so)) so else ff
    } else {
      val n = admit(pending, limit)
      if (n <= 0) so
      else if (n == pending.size) CdfStreamOffset(hi + 1, 0)
      else pending(n - 1)._1
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CdfStreamOffset]
    val e = end.asInstanceOf[CdfStreamOffset]
    // enumerate through e.version (its first e.idx tasks), never touching a
    // version past the consumed range — e may be the (hi+1, 0) sentinel
    val hi = if (e.idx > 0) e.version else e.version - 1
    pendingFrom(s, hi)
      .filter { case (pos, _) => CdfStreamOffset.leq(pos, e) }
      .map { case (_, t) => ChangeFeedPartition(t): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangeFeedReaderFactory(dataSchema.json,
      new org.apache.spark.util.SerializableConfiguration(StrawIO.conf),
      StrawLog.mappingAt(dir))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
