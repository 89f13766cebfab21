package graft.spark

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.roaringbitmap.RoaringBitmap

/** Change data feed: the ROW-LEVEL difference each committed version made,
  * as a DataFrame of the table's columns plus `_change_type` and
  * `_commit_version` — the audit/replication/incremental-ETL surface over
  * the transaction log (Delta's CDF shape, derived rather than stored).
  *
  * Nothing extra is written at commit time: a version's changes are the
  * LIVE-SET DIFF between its snapshot and its predecessor's, computed from
  * the log alone — files only in the new snapshot contribute inserts, files
  * dropped from it contribute deletes (their rows read back with the
  * PREDECESSOR's deletion vector applied), and a deletion-vector swap on a
  * shared file contributes exactly the newly-dead (deletes) and newly-live
  * (inserts — a restore clearing a vector) ordinals. This derivation is
  * uniform across append, truncate, DELETE/UPDATE/MERGE, and restore;
  * compaction commits are skipped wholesale (bytes move, data does not).
  * An UPDATE's dead rows surface as `update_preimage` and its rewritten
  * versions as `update_postimage`; a MERGE's replaced rows surface as
  * `delete` + `insert` (the log does not record which of its appended rows
  * replaced vs inserted — documented approximation).
  *
  * Scale shape: the driver touches only log metadata (snapshots + bitmap
  * diffs); row reads fan out one task per (file, change) with the wanted
  * ordinals' bitmap broadcast in the task, page-skipped like the
  * maintenance scans. The feed is replay-deterministic — commit files are
  * write-once.
  *
  * The one genuine limit is physical retention, as with time travel: rows
  * are read from the files the DIFF references. Merge-on-read mutations
  * keep everything the feed needs within the age-based vacuum window
  * (data files stay live; superseded sidecars are retained for the sweep)
  * — but an op that drops bytes EAGERLY (truncate, compaction's inputs,
  * a copy-on-write rewrite, a fully-dead delete) makes that version's
  * preimages unreadable immediately, and the feed fails LOUDLY rather
  * than under-reporting. */
object StrawChanges {

  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  /** One per-file read task: emit the file's rows at `positions` (explicit
    * ordinal bitmap) labeled `changeType`/`version`. `null` bitmap bytes =
    * every row. Bitmaps ship portable-serialized — tasks broadcast with
    * the closure. */
  private final case class ChangeTask(path: String, mtime: Long, len: Long,
      positionBytes: Array[Byte], changeType: String, version: Long)

  private def toBytes(b: RoaringBitmap): Array[Byte] = {
    b.runOptimize()
    val buf = java.nio.ByteBuffer.allocate(b.serializedSizeInBytes())
    b.serialize(buf)
    buf.array()
  }
  private def fromBytes(a: Array[Byte]): RoaringBitmap = {
    val b = new RoaringBitmap()
    b.deserialize(java.nio.ByteBuffer.wrap(a))
    b
  }

  /** Driver-side sidecar read with the feed's retention story attached —
    * a superseded sidecar lives until the age-based vacuum, so a miss
    * means the feed reached past the retention window. */
  private def readDv(dir: String, v: Long, dv: DeletionVector.DvInfo): RoaringBitmap =
    try DeletionVector.read(dv.path, dv.len)
    catch {
      case e: java.io.FileNotFoundException => throw new IllegalStateException(
        s"strawboat: change feed of $dir version $v needs sidecar ${dv.path} " +
          "but it was vacuumed — derive feeds within the retention window", e)
    }

  /** Row-level changes committed in versions `[fromVersion, toVersion]`
    * (both inclusive), ordered by nothing — apply your own ORDER BY. */
  def changes(spark: SparkSession, dir: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    val latest = StrawLog.latestVersion(dir).getOrElse(
      throw new IllegalStateException(
        s"strawboat: no transaction log under $dir — no change feed"))
    require(fromVersion >= 1 && fromVersion <= toVersion,
      s"strawboat: bad change range [$fromVersion, $toVersion]")
    require(toVersion <= latest,
      s"strawboat: change range end $toVersion is beyond the latest " +
        s"committed version $latest of $dir")

    def snapAt(v: Long): Seq[StrawManifest.Entry] =
      if (v < 1) Seq.empty
      else StrawLog.snapshotAt(dir, v).getOrElse(throw new IllegalStateException(
        s"strawboat: version $v of $dir is not resolvable (vacuumed log?) — " +
          "cannot derive its change feed")).entries

    // emit-all sentinel distinct from an empty positions bitmap
    val All: Array[Byte] = null

    val tasks = Seq.newBuilder[ChangeTask]
    var prev = snapAt(fromVersion - 1).map(e => e.meta.path -> e).toMap
    (fromVersion to toVersion).foreach { v =>
      val op = StrawLog.commitDelta(dir, v).map(_.op).getOrElse(
        throw new IllegalStateException(
          s"strawboat: commit $v of $dir is no longer retained (vacuumLog) — " +
            "cannot derive its change feed"))
      val cur = snapAt(v).map(e => e.meta.path -> e).toMap
      if (!op.startsWith("compact")) {
        val isUpdate = op.startsWith("update")
        val insLabel = if (isUpdate) "update_postimage" else "insert"
        val delLabel = if (isUpdate) "update_preimage" else "delete"
        // files entering the snapshot: their live rows insert
        cur.foreach { case (p, e) =>
          prev.get(p) match {
            case None =>
              val dead = Option(e.dv).map(d => readDv(dir, v, d))
              tasks += (dead match {
                case None => ChangeTask(e.meta.path, e.meta.mtime, e.meta.len,
                  All, insLabel, v)
                case Some(d) => ChangeTask(e.meta.path, e.meta.mtime, e.meta.len,
                  toBytes(d), s"!$insLabel", v) // "!": all EXCEPT positions
              })
            case Some(pe) if Option(pe.dv).map(_.path) != Option(e.dv).map(_.path) =>
              // shared file, vector swapped: newly-dead rows delete,
              // newly-live rows (restore clearing a vector) insert
              val before = Option(pe.dv).map(d => readDv(dir, v, d))
                .getOrElse(new RoaringBitmap())
              val after = Option(e.dv).map(d => readDv(dir, v, d))
                .getOrElse(new RoaringBitmap())
              val newlyDead = RoaringBitmap.andNot(after, before)
              val newlyLive = RoaringBitmap.andNot(before, after)
              if (!newlyDead.isEmpty)
                tasks += ChangeTask(e.meta.path, e.meta.mtime, e.meta.len,
                  toBytes(newlyDead), delLabel, v)
              if (!newlyLive.isEmpty)
                tasks += ChangeTask(e.meta.path, e.meta.mtime, e.meta.len,
                  toBytes(newlyLive), insLabel, v)
            case _ => // unchanged entry
          }
        }
        // files leaving the snapshot: their remaining live rows delete
        prev.foreach { case (p, pe) =>
          if (!cur.contains(p)) {
            val dead = Option(pe.dv).map(d => readDv(dir, v, d))
            tasks += (dead match {
              case None => ChangeTask(pe.meta.path, pe.meta.mtime, pe.meta.len,
                All, delLabel, v)
              case Some(d) => ChangeTask(pe.meta.path, pe.meta.mtime, pe.meta.len,
                toBytes(d), s"!$delLabel", v)
            })
          }
        }
      }
      prev = cur
    }
    val all = tasks.result()

    // table schema for the feed: merged over every referenced file, the
    // same name-resolution rules as the scan (absent → null, widen)
    val schemas = StrawIO.mapParallel(all.map(t => (t.path, t.mtime, t.len))
      .distinct)(f => (f._1, FooterCache.get(f._1, f._2, f._3).schema))
    val dataSchema =
      if (schemas.isEmpty) StructType(Nil) else StrawSchemaResolver.merge(schemas)
    val outSchema = StructType(dataSchema.fields ++ Seq(
      StructField(ChangeTypeCol, StringType, nullable = false),
      StructField(CommitVersionCol, LongType, nullable = false)))

    if (all.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], outSchema)

    val serConf = new org.apache.spark.util.SerializableConfiguration(StrawIO.conf)
    val schemaJson = dataSchema.json
    val width = dataSchema.length
    val rowRdd = spark.sparkContext.parallelize(all, all.size).flatMap { t =>
      StrawIO.install(serConf.value)
      val dataSch = org.apache.spark.sql.types.DataType
        .fromJson(schemaJson).asInstanceOf[StructType]
      val toScala = dataSch.fields.map(f =>
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToScalaConverter(f.dataType))
      val (invert, label) =
        if (t.changeType.startsWith("!")) (true, t.changeType.substring(1))
        else (false, t.changeType)
      val positions = Option(t.positionBytes).map(fromBytes)
      val input =
        try StrawIO.open(t.path)
        catch {
          case e: java.io.FileNotFoundException => throw new IllegalStateException(
            s"strawboat: change feed needs ${t.path} (version ${t.version}) " +
              "but it was vacuumed — derive feeds within the retention window", e)
        }
      try {
        val footer = FooterCache.get(t.path, input)
        val read = new MaintenanceOps.ResolvedFileRead(input, footer, dataSch)
        val pageRows: Array[Int] =
          if (footer.columns.isEmpty) Array.empty
          else footer.columns(0).pages.map(_.numValues)
        def emit(ord: Long): Boolean = positions match {
          case None => true
          case Some(b) =>
            val in = ord <= Int.MaxValue && b.contains(ord.toInt)
            if (invert) !in else in
        }
        val out = Seq.newBuilder[Row]
        if (pageRows.isEmpty && footer.numRows > 0) {
          // zero-column file: every row is all-null
          var o = 0L
          while (o < footer.numRows) {
            if (emit(o)) out += Row.fromSeq(
              Seq.fill[Any](width)(null) :+ label :+ t.version)
            o += 1
          }
        }
        var ord = 0L
        var p = 0
        while (p < pageRows.length) {
          val n = pageRows(p)
          // page-skip: a positions-mode task decodes only pages holding a
          // wanted ordinal (the common case for small DV diffs)
          val wanted = positions match {
            case Some(b) if !invert =>
              ord <= Int.MaxValue &&
                b.rangeCardinality(ord, math.min(ord + n, Int.MaxValue.toLong + 1)) > 0
            case _ => true
          }
          if (wanted) {
            val pages = read.decodePages(p)
            val internal = new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(width)
            var i = 0
            while (i < n) {
              if (emit(ord)) {
                read.fill(pages, i, internal)
                val vals = new Array[Any](width + 2)
                var c = 0
                while (c < width) {
                  val v = internal.values(c)
                  vals(c) = if (v == null) null else toScala(c)(v)
                  c += 1
                }
                vals(width) = label
                vals(width + 1) = t.version
                out += Row.fromSeq(scala.collection.immutable.ArraySeq
                  .unsafeWrapArray(vals))
              }
              i += 1
              ord += 1
            }
          } else ord += n
          p += 1
        }
        out.result()
      } finally input.close()
    }
    spark.createDataFrame(rowRdd, outSchema)
  }
}
