package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ImageMetaFunctions, SketchFunctions, TextHashFunctions, VectorFunctions}

/** SQL access to table metadata that is otherwise a Scala API.
  *
  * `straw_history('path')` is a table-valued function over
  * [[StrawLog.history]] — the DESCRIBE-HISTORY audit as a relation:
  * {{{
  * SELECT version, operation, added_files FROM straw_history('/data/t')
  * ORDER BY version DESC
  * }}}
  * The history resolves at ANALYSIS time, so every query sees the current
  * commit log. Time travel in SQL needs no function: the reader options
  * work through a temporary view —
  * {{{
  * CREATE TEMPORARY VIEW t_v3 USING strawboat
  *   OPTIONS (path '/data/t', versionAsOf '3')
  * }}}
  * (`timestampAsOf` likewise).
  */
object StrawSqlSurface {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  val HistoryName = "straw_history"

  private def historySchema: Seq[AttributeReference] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("timestamp", TimestampType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("added_files", IntegerType, nullable = false)(),
    AttributeReference("removed_files", IntegerType, nullable = false)(),
    AttributeReference("dv_files", IntegerType, nullable = false)(),
    AttributeReference("txn_app", StringType, nullable = true)(),
    AttributeReference("txn_version", LongType, nullable = true)())

  /** Table-function argument → table directory. Accepts a filesystem path
    * verbatim, or a CATALOG IDENTIFIER (`straw.ns.t`) resolved through the
    * session's registered [[StrawCatalog]] — so SQL users of catalog tables
    * never handle warehouse paths:
    * {{{ SELECT * FROM straw_history('straw.prod.orders') }}} */
  private[spark] def resolveDir(arg: String): String = {
    if (arg.contains("/") || arg.contains("\\")) return arg
    val spark = org.apache.spark.sql.SparkSession.active
    val parts =
      try spark.sessionState.sqlParser.parseMultipartIdentifier(arg)
      catch { case scala.util.control.NonFatal(_) => return arg }
    if (parts.length < 2) return arg
    val mgr = spark.sessionState.catalogManager
    if (!mgr.isCatalogRegistered(parts.head)) return arg
    mgr.catalog(parts.head) match {
      case sc: StrawCatalog => sc.tableDir(
        org.apache.spark.sql.connector.catalog.Identifier.of(
          parts.tail.init.toArray, parts.last))
      case _ => arg
    }
  }

  /** Builds the relation for one `straw_history('<path>')` call. */
  def historyBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1 && args.head.foldable &&
      args.head.dataType == StringType,
      s"$HistoryName expects one string literal: the table path")
    val path = args.head.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    require(path != null, s"$HistoryName: path must not be null")
    val rows = StrawLog.history(resolveDir(path.toString)).map { h =>
      org.apache.spark.sql.catalyst.InternalRow(
        h.version,
        h.timestampMs * 1000L, // ms → µs
        UTF8String.fromString(h.operation),
        h.addedFiles,
        h.removedFiles,
        h.dvFiles,
        h.txn.map(t => UTF8String.fromString(t._1)).orNull,
        h.txn.map(t => Long.box(t._2)).orNull)
    }
    LocalRelation(historySchema, rows)
  }

  val RestoreName = "straw_restore"

  private def restoreSchema: Seq[AttributeReference] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("restored_to", LongType, nullable = false)(),
    AttributeReference("added_files", IntegerType, nullable = false)(),
    AttributeReference("removed_files", IntegerType, nullable = false)(),
    AttributeReference("dv_changes", IntegerType, nullable = false)())

  // (path, version) pairs this process has already restored through the
  // SQL surface: re-EXECUTING the same call (the same query collected
  // twice, a cached Dataset re-actioned) must not re-execute the restore —
  // between executions a racing append would land in the new diff and be
  // silently undone by what reads as a query. First execution's metrics
  // are replayed.
  private val restored =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), StrawRestore.RestoreResult]()

  /** `straw_restore('<path>', <version>)`: performs the restore and returns
    * its metrics as one row (Delta's RESTORE TABLE shape). The restore runs
    * at EXECUTION time — EXPLAIN and view re-analysis never touch the table
    * ([[DeferredOpPlan]]) — when the call first EXECUTES in this process;
    * later executions of the same (path, version) replay the recorded
    * metrics. To deliberately restore the same target again after new
    * commits, use the programmatic [[StrawRestore.restore]]. */
  def restoreBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 && args.forall(_.foldable) &&
      args.head.dataType == StringType &&
      Seq[org.apache.spark.sql.types.DataType](ByteType, ShortType,
        IntegerType, LongType).contains(args(1).dataType),
      s"$RestoreName expects (table path string, version integer) literals")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val path = args.head.eval(empty)
    val v = args(1).eval(empty)
    require(path != null && v != null, s"$RestoreName: arguments must not be null")
    val dir = resolveDir(path.toString)
    val ver = v.asInstanceOf[Number].longValue()
    DeferredOpPlan(RestoreName, restoreSchema, () => {
      val r = restored.computeIfAbsent((dir, ver),
        { case (p, w) => StrawRestore.restore(p, w) })
      Seq(org.apache.spark.sql.catalyst.InternalRow(
        r.version, r.restoredTo, r.addedFiles, r.removedFiles, r.dvChanges))
    })
  }

  val CompactName = "straw_compact"

  private def compactSchema: Seq[AttributeReference] = Seq(
    AttributeReference("input_files", IntegerType, nullable = false)(),
    AttributeReference("output_files", IntegerType, nullable = false)(),
    AttributeReference("rewritten_bytes", LongType, nullable = false)(),
    AttributeReference("skipped_files", IntegerType, nullable = false)())

  // same re-execution guard as [[restored]]: a compaction is a distributed
  // rewrite job — re-actioning the same query must not run it twice
  private val compacted = new java.util.concurrent.ConcurrentHashMap[
    (String, Seq[String], Boolean), StrawCompaction.CompactionResult]()

  /** `straw_compact('<path>'[, '<col,col,...>'[, <zorder>]])`: rewrites the
    * table's small files (Delta's OPTIMIZE shape), optionally clustering by
    * the named columns — lexicographic by default, multi-column Z-ORDER when
    * the third argument is true — and returns the rewrite metrics as one
    * row. Runs at EXECUTION time (EXPLAIN/re-analysis rewrite nothing,
    * [[DeferredOpPlan]]), when the call first executes in this process;
    * later executions of the same (path, columns, zorder) replay the
    * metrics. To deliberately compact again, use [[StrawCompaction.compact]]. */
  def compactBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.length <= 3 && args.forall(_.foldable) &&
      args.head.dataType == StringType &&
      args.drop(1).headOption.forall(_.dataType == StringType) &&
      args.drop(2).headOption.forall(_.dataType == BooleanType),
      s"$CompactName expects (table path string[, cluster columns string[, zorder boolean]])")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val path = args.head.eval(empty)
    require(path != null, s"$CompactName: path must not be null")
    val cols: Seq[String] = args.drop(1).headOption.map(_.eval(empty)) match {
      case Some(null) | None => Nil
      case Some(s) => s.toString.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    }
    val zorder = args.drop(2).headOption.exists { e =>
      val v = e.eval(empty)
      require(v != null, s"$CompactName: zorder must not be null")
      v.asInstanceOf[Boolean]
    }
    val dir = resolveDir(path.toString)
    DeferredOpPlan(CompactName, compactSchema, () => {
      val r = compacted.computeIfAbsent((dir, cols, zorder), { _ =>
        StrawCompaction.compact(org.apache.spark.sql.SparkSession.active,
          dir, clusterBy = cols, zOrder = zorder)
      })
      Seq(org.apache.spark.sql.catalyst.InternalRow(
        r.inputFiles, r.outputFiles, r.rewrittenBytes, r.skippedFiles))
    })
  }

  val RebucketName = "straw_rebucket"

  // one-shot guard like [[compacted]]: a rebucket is a distributed rewrite
  private val rebucketed = new java.util.concurrent.ConcurrentHashMap[
    (String, Int, Option[String]), StrawCompaction.CompactionResult]()

  /** `straw_rebucket('<path-or-table>', <n>[, '<col>'])`: evolve the
    * table's hash-bucket layout to `n` buckets (on `col`, defaulting to
    * the current spec's column) — full rewrite into the new layout, one
    * atomic generation switch, storage-partitioned joins work again after
    * the sidecar spec updates. Runs at EXECUTION time with the one-shot
    * replay guard of [[compactBuilder]]. See [[StrawCompaction.rebucket]]. */
  def rebucketBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 2 && args.length <= 3 && args.forall(_.foldable) &&
      args.head.dataType == StringType &&
      Seq(org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.ByteType).contains(args(1).dataType) &&
      args.drop(2).headOption.forall(_.dataType == StringType),
      s"$RebucketName expects (table path string, bucket count int[, column string])")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val path = args.head.eval(empty)
    require(path != null, s"$RebucketName: path must not be null")
    val n = args(1).eval(empty).asInstanceOf[Number].intValue()
    val col = args.drop(2).headOption.map(_.eval(empty)) match {
      case Some(null) | None => None
      case Some(s) => Some(s.toString)
    }
    val dir = resolveDir(path.toString)
    DeferredOpPlan(RebucketName, compactSchema, () => {
      val r = rebucketed.computeIfAbsent((dir, n, col), { _ =>
        StrawCompaction.rebucket(org.apache.spark.sql.SparkSession.active,
          dir, n, col)
      })
      Seq(org.apache.spark.sql.catalyst.InternalRow(
        r.inputFiles, r.outputFiles, r.rewrittenBytes, r.skippedFiles))
    })
  }

  val VacuumName = "straw_vacuum"

  /** `straw_vacuum('<path>'[, <older_than_hours>])`: reclaims unreferenced
    * debris (crashed-op leftovers, aged-out superseded sidecars, files a
    * restore retired) older than the cutoff — default 24h, the
    * restore/change-feed retention window. Age-based and idempotent, and it
    * runs at EXECUTION time ([[DeferredOpPlan]]): EXPLAIN and view
    * re-analysis delete nothing; each actual execution sweeps once and
    * returns the count. */
  def vacuumBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.length <= 2 && args.forall(_.foldable) &&
      args.head.dataType == StringType &&
      args.drop(1).headOption.forall(a =>
        Seq[org.apache.spark.sql.types.DataType](ByteType, ShortType,
          IntegerType, LongType).contains(a.dataType)),
      s"$VacuumName expects (table path string[, older-than hours integer])")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val path = args.head.eval(empty)
    require(path != null, s"$VacuumName: path must not be null")
    val hours = if (args.length < 2) 24L else {
      val h = args(1).eval(empty)
      require(h != null, s"$VacuumName: hours must not be null")
      h.asInstanceOf[Number].longValue()
    }
    val dir = resolveDir(path.toString)
    DeferredOpPlan(VacuumName,
      Seq(AttributeReference("removed_files", IntegerType, nullable = false)()),
      () => Seq(org.apache.spark.sql.catalyst.InternalRow(
        StrawLog.vacuumUnreferenced(dir, hours * 3600 * 1000L))))
  }

  val VacuumLogName = "straw_vacuum_log"

  /** `straw_vacuum_log('<path>'[, keep_versions])`: drops log commit and
    * checkpoint files no retained version's replay needs — strictly older
    * than the checkpoint that anchors the newest `keep_versions` (default
    * 100) versions. THE steady-state commit-latency lever alongside file
    * compaction: the mutation drill measured appends at 744 ms/commit with
    * a 3.4k-file log directory vs 188 after vacuuming it (checkpoint
    * writes and cold resolutions still touch the directory even with
    * probe-based planning). Time travel BEFORE the retained window stops
    * resolving — that is the deal, same as straw_vacuum's data-file side.
    * Idempotent per call, and it runs at EXECUTION time
    * ([[DeferredOpPlan]]): EXPLAIN and view re-analysis trim nothing —
    * which matters here more than for the age-based straw_vacuum, because
    * after new commits a re-run advances the horizon and irreversibly
    * drops more time-travel history. Returns the dropped-file count. */
  def vacuumLogBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.length <= 2 && args.forall(_.foldable) &&
      args.head.dataType == StringType &&
      args.drop(1).headOption.forall(a =>
        Seq[org.apache.spark.sql.types.DataType](ByteType, ShortType,
          IntegerType, LongType).contains(a.dataType)),
      s"$VacuumLogName expects (table path string[, keep-versions integer])")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val path = args.head.eval(empty)
    require(path != null, s"$VacuumLogName: path must not be null")
    val keep = if (args.length < 2) 100 else {
      val k = args(1).eval(empty)
      require(k != null, s"$VacuumLogName: keep-versions must not be null")
      val n = k.asInstanceOf[Number].longValue()
      require(n >= 0 && n <= Int.MaxValue,
        s"$VacuumLogName: keep-versions must be in [0, ${Int.MaxValue}], got $n")
      n.toInt
    }
    val dir = resolveDir(path.toString)
    DeferredOpPlan(VacuumLogName,
      Seq(AttributeReference("removed_log_files", IntegerType, nullable = false)()),
      () => Seq(org.apache.spark.sql.catalyst.InternalRow(
        StrawLog.vacuumLog(dir, keep))))
  }

  val ChangesName = "straw_changes"

  /** `straw_changes('<path>', <from>[, <to>])`: the change data feed as a
    * RELATION — the distributed [[ChangeFeedScan]], never collected to the
    * driver (unlike the metadata TVFs above, this one can be table-sized).
    * {{{
    * SELECT * FROM straw_changes('/data/t', 2)        -- through latest
    * SELECT * FROM straw_changes('/data/t', 2, 5)     -- pinned range
    * }}} */
  def changesBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      s"$ChangesName expects (table path string, from version[, to version])")
    require(args.forall(_.foldable) && args.head.dataType == StringType,
      s"$ChangesName expects literal arguments (path string, integer versions)")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val path = args.head.eval(empty)
    require(path != null, s"$ChangesName: path must not be null")
    def ver(i: Int): Long = {
      val v = args(i).eval(empty)
      require(v != null, s"$ChangesName: version must not be null")
      v.asInstanceOf[Number].longValue()
    }
    val spark = org.apache.spark.sql.SparkSession.active
    val reader = spark.read.format("strawboat")
      .option("readChangeFeed", "true")
      .option("startingVersion", ver(1).toString)
    val df = (if (args.length == 3) reader.option("endingVersion", ver(2).toString)
      else reader).load(resolveDir(path.toString))
    df.queryExecution.analyzed
  }

  val ConstraintsName = "straw_constraints"

  /** `straw_constraints('<path>')`: the table's live CHECK constraints as
    * (name, expression) rows — resolves at analysis time, so every query
    * sees the current log state. */
  def constraintsBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1 && args.head.foldable &&
      args.head.dataType == StringType,
      s"$ConstraintsName expects one string literal: the table path")
    val path = args.head.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    require(path != null, s"$ConstraintsName: path must not be null")
    val rows = StrawConstraints.list(resolveDir(path.toString)).toSeq.sortBy(_._1).map {
      case (n, e) => org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(n), UTF8String.fromString(e))
    }
    LocalRelation(Seq(
      AttributeReference("name", StringType, nullable = false)(),
      AttributeReference("expression", StringType, nullable = false)()), rows)
  }

  val DetailName = "straw_detail"

  /** `straw_detail('<path>')`: one DESCRIBE-DETAIL-style row — current
    * version, file/DV counts, live bytes and rows, constraint count, and
    * the column-mapping footprint (renamed/dropped spellings). Answers
    * from the log snapshot alone: zero data IO. */
  def detailBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1 && args.head.foldable &&
      args.head.dataType == StringType,
      s"$DetailName expects one string literal: the table path")
    val path = args.head.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    require(path != null, s"$DetailName: path must not be null")
    val dir = resolveDir(path.toString)
    val snap = StrawLog.snapshot(dir).getOrElse(throw new IllegalArgumentException(
      s"$DetailName: no transaction log under $dir"))
    val dvFiles = snap.entries.count(_.dv != null)
    val deadRows = snap.entries.collect { case e if e.dv != null => e.dv.cardinality }.sum
    // per-file row counts ride the entries' stats blobs when the writer
    // recorded them — report null (unknown) rather than pay footer IO here
    val counts = snap.entries.map(_.synthetic.map(_.numRows))
    val numRows: Any =
      if (counts.exists(_.isEmpty)) null else counts.flatten.sum - deadRows
    LocalRelation(Seq(
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("num_files", LongType, nullable = false)(),
      AttributeReference("size_bytes", LongType, nullable = false)(),
      AttributeReference("num_rows", LongType, nullable = true)(),
      AttributeReference("dv_files", LongType, nullable = false)(),
      AttributeReference("dv_dead_rows", LongType, nullable = false)(),
      AttributeReference("constraints", LongType, nullable = false)(),
      AttributeReference("renamed_columns", LongType, nullable = false)(),
      AttributeReference("dropped_spellings", LongType, nullable = false)(),
      AttributeReference("bucket_spec", StringType, nullable = true)()),
      Seq(org.apache.spark.sql.catalyst.InternalRow(
        snap.version,
        snap.entries.size.toLong,
        snap.entries.map(_.meta.len).sum,
        numRows,
        dvFiles.toLong,
        deadRows,
        snap.constraints.size.toLong,
        snap.mapping.alias.size.toLong,
        snap.mapping.dropped.size.toLong,
        StrawBucket.specOf(dir)
          .map { case (c, n) => org.apache.spark.unsafe.types.UTF8String
            .fromString(s"bucket($n, $c)") }.orNull)))
  }

  val IvfDetailName = "straw_ivf_detail"

  /** `straw_ivf_detail('<index dir>')`: one row per IVF cell —
    * (cent_id, files, size_bytes, rows, dead_rows) from the log snapshot's
    * hive-partition paths and stats blobs (zero data IO). What makes cell
    * SKEW visible: a reindex is due when appends have concentrated mass in
    * few cells (max(rows)/avg(rows) ≫ 1) — probes of a hot cell then scan
    * far more than corpus/nCentroids. */
  def ivfDetailBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1 && args.head.foldable &&
      args.head.dataType == StringType,
      s"$IvfDetailName expects one string literal: the index path")
    val path = args.head.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    require(path != null, s"$IvfDetailName: path must not be null")
    val dir = resolveDir(path.toString)
    val snap = StrawLog.snapshot(dir).getOrElse(throw new IllegalArgumentException(
      s"$IvfDetailName: no transaction log under $dir"))
    val byCell = snap.entries.groupBy { e =>
      PartitionLayout.partitionsOf(e.meta.path).collectFirst {
        case ("cent_id", Some(v)) => v.toInt
      }.getOrElse(-1)
    }
    val rows = byCell.toSeq.sortBy(_._1).map { case (cell, entries) =>
      val dead = entries.collect { case e if e.dv != null => e.dv.cardinality }.sum
      val counts = entries.map(_.synthetic.map(_.numRows))
      val live: Any =
        if (counts.exists(_.isEmpty)) null else counts.flatten.sum - dead
      org.apache.spark.sql.catalyst.InternalRow(
        cell, entries.size.toLong, entries.map(_.meta.len).sum, live, dead)
    }
    LocalRelation(Seq(
      AttributeReference("cent_id", IntegerType, nullable = false)(),
      AttributeReference("files", LongType, nullable = false)(),
      AttributeReference("size_bytes", LongType, nullable = false)(),
      AttributeReference("rows", LongType, nullable = true)(),
      AttributeReference("dead_rows", LongType, nullable = false)()), rows)
  }

  val LexDetailName = "straw_lex_detail"

  /** `straw_lex_detail('<index dir>')`: one row per postings BUCKET —
    * (bucket, files, size_bytes, rows) from the log snapshot's file tags
    * and stats blobs (zero data IO), plus the corpus constants from the
    * meta table. What makes term skew and append fragmentation visible:
    * a compaction is due when files/bucket grows, and a hot bucket
    * (rows ≫ total/buckets) means one term dominates its probes. */
  def lexDetailBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1 && args.head.foldable &&
      args.head.dataType == StringType,
      s"$LexDetailName expects one string literal: the index path")
    val path = args.head.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    require(path != null, s"$LexDetailName: path must not be null")
    val dir = resolveDir(path.toString) + "/postings"
    val snap = StrawLog.snapshot(dir).getOrElse(throw new IllegalArgumentException(
      s"$LexDetailName: no postings log under $dir — not a buildLexicalIndex directory"))
    val byBucket = snap.entries.groupBy(e =>
      StrawBucket.parseTag(e.meta.path).map(_.bucket).getOrElse(-1))
    val rows = byBucket.toSeq.sortBy(_._1).map { case (bucket, entries) =>
      val counts = entries.map(_.synthetic.map(_.numRows))
      val n: Any = if (counts.exists(_.isEmpty)) null else counts.flatten.sum
      org.apache.spark.sql.catalyst.InternalRow(
        bucket, entries.size.toLong, entries.map(_.meta.len).sum, n)
    }
    LocalRelation(Seq(
      AttributeReference("bucket", IntegerType, nullable = false)(),
      AttributeReference("files", LongType, nullable = false)(),
      AttributeReference("size_bytes", LongType, nullable = false)(),
      AttributeReference("rows", LongType, nullable = true)()), rows)
  }

  val Bm25Name = "straw_bm25"

  /** `straw_bm25('<index dir>', '<terms, space-separated>', k)`: BM25
    * top-k over a [[graft.ops.Search.buildLexicalIndex]] directory as a
    * pure-SQL table function — (doc_id, score) rows. LAZY: the builder
    * returns the same bucket-pruned probe plan the DataFrame API builds
    * (arguments still validate at analysis time), so EXPLAIN costs
    * nothing, the probe runs once per execution, and the result composes
    * — join it, aggregate over it, feed it to a CTE — without anything
    * passing through the driver. */
  def bm25Builder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3 && args.take(2).forall(a =>
        a.foldable && a.dataType == StringType) &&
      args(2).foldable && args(2).dataType == IntegerType,
      s"$Bm25Name expects (index path string, terms string, k int)")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val path = args(0).eval(empty)
    val termsArg = args(1).eval(empty)
    val k = args(2).eval(empty)
    require(path != null && termsArg != null && k != null,
      s"$Bm25Name: arguments must not be null")
    // split exactly like the index tokenizer ([[graft.ops.Search.tokens]],
    // "[^a-z0-9]+") — a "\\s+" split would keep e.g. 'hash-join' as one
    // token that matches no indexed term and silently contributes nothing
    val terms = termsArg.toString.toLowerCase.split("[^a-z0-9]+")
      .filter(_.nonEmpty).distinct.toSeq
    // hand the analyzer the probe's own (already analyzed) plan; each
    // invocation builds a fresh Dataset, so two probes in one query carry
    // distinct expression ids and self-joins stay well-formed
    graft.ops.Search.bm25TopKIndexed(
        org.apache.spark.sql.SparkSession.active, resolveDir(path.toString),
        terms, k.asInstanceOf[Int])
      .selectExpr("cast(doc_id as long) doc_id", "score")
      .queryExecution.analyzed
  }

  val PhraseName = "straw_phrase"

  /** `straw_phrase('<index dir>', '<exact phrase>', k)`: up to `k`
    * documents (lowest doc_id first) containing the phrase's tokens
    * consecutively, from a POSITIONAL index
    * (`buildLexicalIndex(..., positions = true)`) — (doc_id) rows, plain
    * SQL. LAZY like [[bm25Builder]]: the plan is the DataFrame probe plus
    * `ORDER BY doc_id LIMIT k` (rides TakeOrdered — no full sort
    * materializes). The limit is REQUIRED: a bare SQL call must state how
    * many of a possibly-huge match set it wants; the DataFrame API
    * ([[graft.ops.Search.phraseSearch]]) is the unbounded path. */
  def phraseBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3 && args.take(2).forall(a =>
        a.foldable && a.dataType == StringType) &&
      args(2).foldable && args(2).dataType == IntegerType,
      s"$PhraseName expects (index path string, phrase string, k int)")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val path = args(0).eval(empty)
    val phraseArg = args(1).eval(empty)
    val k = args(2).eval(empty)
    require(path != null && phraseArg != null && k != null,
      s"$PhraseName: arguments must not be null")
    require(k.asInstanceOf[Int] > 0, s"$PhraseName: k must be positive")
    val phrase = phraseArg.toString.toLowerCase.split("[^a-z0-9]+")
      .filter(_.nonEmpty).toSeq
    graft.ops.Search.phraseSearch(
        org.apache.spark.sql.SparkSession.active, resolveDir(path.toString),
        phrase)
      .selectExpr("cast(doc_id as long) doc_id")
      .limit(k.asInstanceOf[Int])
      .queryExecution.analyzed
  }

  val AsofName = "straw_asof"

  /** `straw_asof('<left path>', '<right path>', '<leftKey[=rightKey]>',
    * '<leftTime[=rightTime]>', '<right tie-break col>'[, '<direction>'[,
    * <tolerance>[, <allowExactMatches>]]])`: point-in-time join of two
    * strawboat tables as plain SQL — every left row with the matched right
    * row's columns attached under an `r_` prefix (inner semantics:
    * unmatched left rows drop). Direction is `backward` (default) /
    * `forward` / `nearest`; `tolerance` is a numeric literal (numeric time
    * columns) or an interval-expression STRING like `'INTERVAL ''90''
    * MINUTE'` (timestamp columns) bounding the match distance;
    * `allowExactMatches` (boolean, default true) excludes same-instant
    * matches when false — the full pandas `merge_asof` control set. LAZY
    * like [[bm25Builder]]: the builder returns the join-free sweep plan
    * ([[graft.ops.TemporalJoin.asofJoin]] — one key shuffle, no join
    * node), so EXPLAIN probes nothing and the result composes in CTEs. */
  def asofBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 5 && args.length <= 9 &&
      args.take(5).forall(a => a.foldable && a.dataType == StringType) &&
      args.lift(5).forall(a => a.foldable && a.dataType == StringType),
      s"$AsofName expects (left path, right path, 'leftKey[=rightKey]', " +
        "'leftTime[=rightTime]', tieBreak[, direction[, tolerance[, " +
        "allowExactMatches[, bucketWidth]]]])")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val vals = args.take(6).map(_.eval(empty))
    require(vals.forall(_ != null), s"$AsofName: arguments must not be null")
    def pair(s: String): (String, String) = s.split("=", 2) match {
      case Array(a) => (a.trim, a.trim)
      case Array(a, b) => (a.trim, b.trim)
    }
    val (lk, rk) = pair(vals(2).toString)
    val (lt, rt) = pair(vals(3).toString)
    val tieBreak = vals(4).toString.trim
    val direction = if (args.length >= 6) vals(5).toString.trim else "backward"
    // tolerance: a numeric literal passes through as-is; a string parses
    // as a SQL expression (the interval-literal route — SQL has no
    // interval ARGUMENT type a TVF literal can carry)
    val tolerance: Option[org.apache.spark.sql.Column] = args.lift(6).map { a =>
      require(a.foldable, s"$AsofName: tolerance must be a literal")
      val v = a.eval(empty)
      require(v != null, s"$AsofName: tolerance must not be null")
      a.dataType match {
        case StringType => org.apache.spark.sql.functions.expr(v.toString)
        case _: org.apache.spark.sql.types.NumericType =>
          org.apache.spark.sql.functions.lit(v)
        case other => throw new IllegalArgumentException(
          s"$AsofName: tolerance must be numeric or an interval-expression " +
            s"string, got $other")
      }
    }
    val allowExact = args.lift(7).map { a =>
      require(a.foldable && a.dataType ==
        org.apache.spark.sql.types.BooleanType,
        s"$AsofName: allowExactMatches must be a boolean literal")
      val v = a.eval(empty)
      require(v != null, s"$AsofName: allowExactMatches must not be null")
      v.asInstanceOf[Boolean]
    }.getOrElse(true)
    // optional 9th arg: a bucket width routes backward/forward through
    // the skew-splitting asofJoinBucketed (the hot-key escape hatch)
    val bucketWidth: Option[Long] = args.lift(8).map { a =>
      require(a.foldable && (a.dataType == LongType ||
        a.dataType == IntegerType),
        s"$AsofName: bucketWidth must be an int/long literal")
      val v = a.eval(empty)
      require(v != null, s"$AsofName: bucketWidth must not be null")
      v.asInstanceOf[Number].longValue()
    }
    val spark = org.apache.spark.sql.SparkSession.active
    val left = spark.read.format("strawboat").load(resolveDir(vals(0).toString))
    val right = spark.read.format("strawboat").load(resolveDir(vals(1).toString))
    val joined = bucketWidth match {
      case Some(w) => graft.ops.TemporalJoin.asofJoinBucketed(left, right,
        lk, rk, lt, rt, rightValues = right.columns.filterNot(_ == rk).toSeq,
        rightTieBreak = tieBreak, bucketWidth = w, direction = direction,
        allowExactMatches = allowExact, tolerance = tolerance,
        rightPrefix = "r_")
      case None => graft.ops.TemporalJoin.asofJoin(left, right, lk, rk, lt, rt,
        rightValues = right.columns.filterNot(_ == rk).toSeq,
        rightTieBreak = tieBreak, direction = direction,
        allowExactMatches = allowExact, tolerance = tolerance,
        rightPrefix = "r_")
    }
    joined.queryExecution.analyzed
  }

  val AsofBothName = "straw_asof_both"

  /** `straw_asof_both('<left path>', '<right path>', '<leftKey[=rightKey]>',
    * '<leftTime[=rightTime]>', '<tie-break col>'[, <allowExactMatches>])`:
    * both-neighbor as-of join as plain SQL — every left row with BOTH the
    * latest at-or-before and earliest at-or-after right rows attached
    * under `r_bwd_` / `r_fwd_` prefixes (inner semantics: probes missing
    * either neighbor drop) — the SQL route to time interpolation: lerp
    * between the neighbors in the SELECT. LAZY; same one-shuffle
    * join-free plan as [[asofBuilder]]. */
  def asofBothBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 5 && args.length <= 7 &&
      args.take(5).forall(a => a.foldable && a.dataType == StringType),
      s"$AsofBothName expects (left path, right path, 'leftKey[=rightKey]', " +
        "'leftTime[=rightTime]', tieBreak[, allowExactMatches[, bucketWidth]])")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val vals = args.take(5).map(_.eval(empty))
    require(vals.forall(_ != null), s"$AsofBothName: arguments must not be null")
    def pair(s: String): (String, String) = s.split("=", 2) match {
      case Array(a) => (a.trim, a.trim)
      case Array(a, b) => (a.trim, b.trim)
    }
    val (lk, rk) = pair(vals(2).toString)
    val (lt, rt) = pair(vals(3).toString)
    val tieBreak = vals(4).toString.trim
    val allowExact = args.lift(5).map { a =>
      require(a.foldable && a.dataType ==
        org.apache.spark.sql.types.BooleanType,
        s"$AsofBothName: allowExactMatches must be a boolean literal")
      val v = a.eval(empty)
      require(v != null, s"$AsofBothName: allowExactMatches must not be null")
      v.asInstanceOf[Boolean]
    }.getOrElse(true)
    // optional 7th arg: a bucket width routes through the skew-splitting
    // asofBothJoinBucketed (the hot-key escape hatch, straw_asof parity)
    val bucketWidth: Option[Long] = args.lift(6).map { a =>
      require(a.foldable && (a.dataType == LongType ||
        a.dataType == IntegerType),
        s"$AsofBothName: bucketWidth must be an int/long literal")
      val v = a.eval(empty)
      require(v != null, s"$AsofBothName: bucketWidth must not be null")
      v.asInstanceOf[Number].longValue()
    }
    val spark = org.apache.spark.sql.SparkSession.active
    val left = spark.read.format("strawboat").load(resolveDir(vals(0).toString))
    val right = spark.read.format("strawboat").load(resolveDir(vals(1).toString))
    val rightVals = right.columns.filterNot(_ == rk).toSeq
    val joined = bucketWidth match {
      case Some(w) => graft.ops.TemporalJoin.asofBothJoinBucketed(left, right,
        lk, rk, lt, rt, rightValues = rightVals,
        rightTieBreak = tieBreak, bucketWidth = w,
        allowExactMatches = allowExact)
      case None => graft.ops.TemporalJoin.asofBothJoin(left, right, lk, rk,
        lt, rt, rightValues = rightVals,
        rightTieBreak = tieBreak, allowExactMatches = allowExact)
    }
    // asofBothJoin prefixes bwd_/fwd_; re-prefix exactly the KNOWN
    // right-side output names to the TVF's r_ family so the SQL surface
    // is uniform with straw_asof. Matching by name set, not string
    // prefix: a LEFT column that happens to be named bwd_*/fwd_* (but is
    // not one of these outputs) must pass through untouched, or the
    // rename manufactures the r_bwd_* clash it exists to prevent.
    val rightOut = (rt +: rightVals).distinct
      .flatMap(n => Seq("bwd_" + n, "fwd_" + n)).toSet
    joined.select(joined.columns.map { c =>
      if (rightOut(c)) joined(c).as("r_" + c) else joined(c)
    }: _*).queryExecution.analyzed
  }

  val OverlapName = "straw_overlap"

  /** `straw_overlap('<left path>', '<right path>', '<left low>',
    * '<left high>', '<right low>', '<right high>', <binWidth long>)`:
    * keyless interval-OVERLAP join of two strawboat tables from plain SQL
    * — every (left, right) row pair whose intervals intersect, exactly
    * once, right columns under an `r_` prefix. binWidth is in the bound
    * columns' own units (MICROSECONDS for timestamps; see
    * [[graft.ops.TemporalJoin.suggestBinWidth]]). LAZY; the plan is
    * [[graft.ops.TemporalJoin.rangeOverlapJoin]]'s bin-bucketed equi-join
    * — no cartesian, no broadcast-nested-loop, and the
    * bins-per-interval cap fails loudly on degenerate widths. */
  def overlapBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 7 &&
      args.take(6).forall(a => a.foldable && a.dataType == StringType) &&
      args(6).foldable && (args(6).dataType == LongType ||
        args(6).dataType == IntegerType),
      s"$OverlapName expects (left path, right path, left low col, " +
        "left high col, right low col, right high col, binWidth int/long)")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val vals = args.map(_.eval(empty))
    require(vals.forall(_ != null), s"$OverlapName: arguments must not be null")
    val binWidth = vals(6) match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
    }
    // the Scala API's binWidth <= 0 auto-derivation is an EAGER
    // distributed job (suggestBinWidth's percentile scan) — a documented
    // opt-in there, but a lazy-TVF contract violation here: EXPLAIN of a
    // TVF must run zero jobs. The SQL route therefore requires an
    // explicit positive width.
    require(binWidth > 0,
      s"$OverlapName: binWidth must be a positive literal (in the bound " +
        "columns' own units); derive one with the Scala API's " +
        "TemporalJoin.suggestBinWidth, which runs a percentile scan " +
        "the lazy SQL route must not")
    val spark = org.apache.spark.sql.SparkSession.active
    val left = spark.read.format("strawboat").load(resolveDir(vals(0).toString))
    val right0 = spark.read.format("strawboat").load(resolveDir(vals(1).toString))
    val right = right0.select(
      right0.columns.map(c => right0(c).as("r_" + c)): _*)
    graft.ops.TemporalJoin.rangeOverlapJoin(left,
        vals(2).toString.trim, vals(3).toString.trim,
        right, "r_" + vals(4).toString.trim, "r_" + vals(5).toString.trim,
        binWidth)
      .queryExecution.analyzed
  }

  val RangeJoinName = "straw_range"

  /** `straw_range('<intervals path>', '<points path>', '<low col>',
    * '<high col>', '<point col>', <binWidth long>)`: keyless interval-
    * containment join of two strawboat tables from plain SQL — every
    * (interval row, point row) pair with low ≤ point ≤ high, point
    * columns under a `p_` prefix. binWidth is in the point column's own
    * units (MICROSECONDS for timestamps). LAZY like [[bm25Builder]]: the
    * plan is [[graft.ops.TemporalJoin.rangeJoin]]'s bin-bucketed
    * equi-join — no cartesian, no broadcast-nested-loop. */
  def rangeJoinBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 6 &&
      args.take(5).forall(a => a.foldable && a.dataType == StringType) &&
      args(5).foldable && (args(5).dataType == LongType ||
        args(5).dataType == IntegerType),
      s"$RangeJoinName expects (intervals path, points path, low col, " +
        "high col, point col, binWidth int/long)")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val vals = args.map(_.eval(empty))
    require(vals.forall(_ != null), s"$RangeJoinName: arguments must not be null")
    val binWidth = vals(5) match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
    }
    // see overlapBuilder: auto-derivation (binWidth <= 0) is eager and
    // stays Scala-only; the lazy SQL route refuses at analysis
    require(binWidth > 0,
      s"$RangeJoinName: binWidth must be a positive literal (in the point " +
        "column's own units); derive one with the Scala API's " +
        "TemporalJoin.suggestBinWidth, which runs a percentile scan " +
        "the lazy SQL route must not")
    val spark = org.apache.spark.sql.SparkSession.active
    val intervals = spark.read.format("strawboat")
      .load(resolveDir(vals(0).toString))
    val points0 = spark.read.format("strawboat")
      .load(resolveDir(vals(1).toString))
    val points = points0.select(
      points0.columns.map(c => points0(c).as("p_" + c)): _*)
    graft.ops.TemporalJoin.rangeJoin(intervals,
        vals(2).toString.trim, vals(3).toString.trim,
        points, "p_" + vals(4).toString.trim, binWidth)
      .queryExecution.analyzed
  }

  val TopkName = "straw_topk"

  /** `straw_topk('<table path>', '<column>', k[, capacity])`: EXACT top-k
    * heavy hitters of a strawboat table column from plain SQL — (item,
    * cnt) rows via the mg_topk sketch→verify composition: pass 1
    * aggregates a capacity-bounded (default 256) Misra–Gries summary
    * (map-side merged — the column's key space never shuffles), pass 2
    * exact-counts only the ≤capacity candidates, and the n/(capacity+1)
    * membership bound is ASSERTED on every returned row, so a
    * distribution too flat for guaranteed exactness fails loudly instead
    * of returning a silently-lossy top-k. DEFERRED like [[knnBuilder]]'s
    * PQ tiers: the sketch job and its bounded (≤capacity) collect run at
    * execution time — EXPLAIN probes nothing. */
  def topkBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 3 && args.length <= 4 &&
      args.take(2).forall(a => a.foldable && a.dataType == StringType) &&
      args(2).foldable && args(2).dataType == IntegerType &&
      args.drop(3).headOption.forall(a =>
        a.foldable && a.dataType == IntegerType),
      s"$TopkName expects (table path, column, k int[, capacity int]) literals")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val pathArg = args(0).eval(empty)
    val colArg = args(1).eval(empty)
    val kArg = args(2).eval(empty)
    require(pathArg != null && colArg != null && kArg != null,
      s"$TopkName: arguments must not be null")
    val k = kArg.asInstanceOf[Int]
    val capacity = args.drop(3).headOption.map { e =>
      val v = e.eval(empty)
      require(v != null, s"$TopkName: capacity must not be null")
      v.asInstanceOf[Int]
    }.getOrElse(256)
    require(k > 0, s"$TopkName: k must be positive, got $k")
    require(capacity >= k,
      s"$TopkName: capacity ($capacity) must be >= k ($k)")
    val colName = colArg.toString.trim
    val dir = resolveDir(pathArg.toString)
    // column existence validates at analysis (loud, early); the schema
    // read is one cached footer, not a data scan
    val probe = org.apache.spark.sql.SparkSession.active
      .read.format("strawboat").load(dir)
    require(probe.columns.contains(colName),
      s"$TopkName: no column '$colName' in $dir " +
        s"(have: ${probe.columns.mkString(", ")})")
    val out = Seq(
      AttributeReference("item", StringType, nullable = true)(),
      AttributeReference("cnt", LongType, nullable = false)())
    DeferredOpPlan(TopkName, out, () => {
      import org.apache.spark.sql.functions._
      val s = org.apache.spark.sql.SparkSession.active
      import s.implicits._
      graft.functions.SketchFunctions.register(s)
      val items = s.read.format("strawboat").load(dir)
        .select(col(colName).cast("string").as("_item"))
        .filter(col("_item").isNotNull)
      val entries = items
        .agg(graft.functions.SketchFunctions.mgTopK(col("_item"), capacity)
          .as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item"), col("e.processed"))
        .collect()
      if (entries.isEmpty) {
        // a flat-enough distribution can evict EVERYTHING from the MG
        // buffer (the summary is then empty and carries no n either) —
        // over a non-empty table that must be loud, not an empty result
        require(items.isEmpty,
          s"$TopkName: the sketch retained no candidates over a non-empty " +
            s"table — distribution too flat for capacity $capacity; raise it")
        Seq.empty
      } else {
        val n = entries.head.getLong(1)
        val cands = entries.map(_.getString(0)).toSeq.toDF("_item")
        // exact-recount ALL candidates (≤capacity rows — bounded): the
        // sum of their counts vs n tells whether the candidate set covers
        // the whole table (fewer-than-k distinct values is then exact)
        val recount = items.join(broadcast(cands), "_item")
          .groupBy(col("_item")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("_item"))
          .collect()
        val covered = recount.map(_.getLong(1)).sum
        val topk = recount.take(k)
        // guarantee check 1: a short result is only exact when the
        // candidates cover EVERY occurrence (i.e. the table has < k
        // distinct values) — a thinned-out sketch on a flat distribution
        // must fail loudly, not return few rows
        require(topk.length == k || covered == n,
          s"$TopkName: top-$k not guaranteed exact — the sketch retained " +
            s"only ${topk.length} candidates covering $covered of $n rows; " +
            "raise capacity")
        // guarantee check 2: every returned count must clear the
        // n/(capacity+1) membership bound (the k-th row is the binding one)
        topk.foreach { r =>
          require(r.getLong(1) * (capacity + 1L) > n || covered == n,
            s"$TopkName: top-$k not guaranteed exact — count ${r.getLong(1)}" +
              s" <= n/${capacity + 1} of $n; raise capacity")
        }
        topk.map(r => org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(r.getString(0)), r.getLong(1))).toSeq
      }
    })
  }

  val KmeansName = "straw_kmeans"

  /** `straw_kmeans('<table path>', dim, k[, iters])`: full-corpus
    * distributed Lloyd k-means ([[graft.ops.Ann.kmeansFit]]) from plain
    * SQL — (cluster, n, sse_first, sse_last) rows: the assignment
    * histogram plus the first/last-iteration SSE (non-increasing by
    * Lloyd's invariant; the driver gate asserts it, here it surfaces so
    * a SQL user can see convergence). DEFERRED like [[topkBuilder]]: the
    * Lloyd passes and their k·dim-bounded collects run at execution,
    * EXPLAIN probes nothing. The table needs `vec_id` and `embedding`
    * columns (validated at analysis from the cached footer schema). */
  def kmeansBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 3 && args.length <= 4 &&
      args.head.foldable && args.head.dataType == StringType &&
      args.tail.forall(a => a.foldable && a.dataType == IntegerType),
      s"$KmeansName expects (table path, dim int, k int[, iters int]) literals")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val vals = args.map(_.eval(empty))
    require(vals.forall(_ != null), s"$KmeansName: arguments must not be null")
    val dir = resolveDir(vals(0).toString)
    val dim = vals(1).asInstanceOf[Int]
    val k = vals(2).asInstanceOf[Int]
    val iters = if (args.length == 4) vals(3).asInstanceOf[Int] else 3
    require(dim > 0 && k > 0 && iters >= 1,
      s"$KmeansName: dim, k, iters must be positive")
    val probe = org.apache.spark.sql.SparkSession.active
      .read.format("strawboat").load(dir)
    Seq("vec_id", "embedding").foreach(c => require(probe.columns.contains(c),
      s"$KmeansName: table must carry a '$c' column " +
        s"(have: ${probe.columns.mkString(", ")})"))
    val out = Seq(
      AttributeReference("cluster", IntegerType, nullable = false)(),
      AttributeReference("n", LongType, nullable = false)(),
      AttributeReference("sse_first", DoubleType, nullable = false)(),
      AttributeReference("sse_last", DoubleType, nullable = false)())
    DeferredOpPlan(KmeansName, out, () => {
      val s = org.apache.spark.sql.SparkSession.active
      val corpus = s.read.format("strawboat").load(dir)
      val (cents, sses) = graft.ops.Ann.kmeansFit(s, corpus, dim, k, iters)
      graft.ops.Ann.kmeansAssign(s, corpus, cents)
        .groupBy(org.apache.spark.sql.functions.col("cluster"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .orderBy(org.apache.spark.sql.functions.col("cluster"))
        .collect() // ≤k rows
        .map(r => org.apache.spark.sql.catalyst.InternalRow(
          r.getInt(0), r.getLong(1), sses.head, sses.last))
        .toSeq
    })
  }

  val HybridName = "straw_hybrid"

  /** `straw_hybrid('<lex dir>', '<ivf dir>', '<terms>', array(<vec...>),
    * k[, nProbe])`: reciprocal-rank fusion of the persisted lexical and IVF
    * tiers ([[graft.ops.Search.hybridTopKIndexed]]) as plain SQL —
    * (id, rrf, rank) rows for ONE query. The terms string tokenizes
    * exactly like [[bm25Builder]]; the vector is any numeric SQL array
    * (`array(0.1D, ...)`) cast to float. `nProbe` defaults to the Scala
    * API's 4 (pruned probe — approximate vector pool; pass the index's
    * centroid count for the exact brute-equal pool). LAZY like
    * [[bm25Builder]]: the builder returns the fusion's own logical plan —
    * the only analysis-time work is the nCentroids-bounded cell-assignment
    * job (same as [[knnBuilder]]); EXPLAIN never touches corpus-scale
    * data, and the result composes in joins/CTEs. */
  def hybridBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 5 && args.length <= 6 && args.forall(_.foldable) &&
      args.take(3).forall(_.dataType == StringType) &&
      (args(3).dataType match {
        case ArrayType(et, _) => Seq[org.apache.spark.sql.types.DataType](
          FloatType, DoubleType).contains(et) ||
          et.isInstanceOf[org.apache.spark.sql.types.DecimalType]
        case _ => false
      }) &&
      args(4).dataType == IntegerType &&
      args.drop(5).headOption.forall(_.dataType == IntegerType),
      s"$HybridName expects (lex index path, ivf index path, terms string, " +
        "numeric array vector, k int[, nProbe int]) literals")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val Seq(lexArg, ivfArg, termsArg) = args.take(3).map(_.eval(empty))
    val vecArg = args(3).eval(empty)
    val k = args(4).eval(empty)
    require(lexArg != null && ivfArg != null && termsArg != null &&
      vecArg != null && k != null, s"$HybridName: arguments must not be null")
    val nProbe = args.drop(5).headOption.map { e =>
      val v = e.eval(empty)
      require(v != null, s"$HybridName: nProbe must not be null")
      v.asInstanceOf[Int]
    }.getOrElse(4)
    val terms = termsArg.toString.toLowerCase.split("[^a-z0-9]+")
      .filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, s"$HybridName: terms must tokenize to at least one term")
    val arr = vecArg.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val et = args(3).dataType.asInstanceOf[ArrayType].elementType
    val vec: Array[Float] = (0 until arr.numElements()).map { i =>
      require(!arr.isNullAt(i), s"$HybridName: vector must not contain nulls")
      et match {
        case FloatType => arr.getFloat(i)
        case DoubleType => arr.getDouble(i).toFloat
        case d: org.apache.spark.sql.types.DecimalType =>
          arr.getDecimal(i, d.precision, d.scale).toFloat
      }
    }.toArray
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    // the synthetic query id is never a corpus id (matching knnBuilder):
    // 0L would collide with a real vec_id 0 and the vector tier's
    // self-exclusion join would silently drop that vector from the pool,
    // losing its vec_rank contribution to RRF. The term-side id only
    // needs to MATCH the vector-side id for the fusion join.
    val vecs = Seq((Long.MinValue, vec)).toDF("vec_id", "embedding")
    graft.ops.Search.hybridTopKIndexed(spark,
        resolveDir(lexArg.toString), resolveDir(ivfArg.toString),
        Seq(Long.MinValue -> terms), vecs, k.asInstanceOf[Int], nProbe = nProbe)
      .selectExpr("cast(id as long) id", "rrf", "rank")
      .queryExecution.analyzed
  }

  val KnnName = "straw_knn"

  /** `straw_knn('<index dir>', array(<vec...>), k[, nProbe])`: cosine
    * top-k over a persisted vector index as plain SQL — (id, cosine, rank)
    * rows for ONE query vector (any numeric SQL array). Serves ALL the
    * persisted tiers, dispatching on the index's sidecars:
    *
    *  - IVF (`_ivf_centroids`): [[graft.ops.Ann.ivfTopKIndexed]], LAZY
    *    like [[bm25Builder]] — the directory-pruned probe plan itself
    *    returns; the only analysis-time work is the nCentroids-bounded
    *    cell assignment. The 4th argument is `nProbe` (default 4; pass
    *    the centroid count for the exact brute-equal result).
    *  - IVF-PQ (`_ivf_centroids` + `_pq_codebooks`):
    *    [[graft.ops.Ann.ivfPqTopK]]. The 4th argument is `nProbe`.
    *  - flat PQ (`_pq_codebooks` only): [[graft.ops.Ann.pqTopKIndexed]].
    *    The 4th argument is the rerank SHORTLIST (default 4·k).
    *
    * The PQ tiers materialize a bounded (k- and shortlist-scale)
    * candidate set mid-probe, so they cannot return one lazy plan; they
    * run at EXECUTION time instead ([[DeferredOpPlan]], the mutating
    * TVFs' lifecycle) — EXPLAIN probes nothing, and each action re-probes
    * (read-only, so re-execution is safe). */
  def knnBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 3 && args.length <= 4 && args.forall(_.foldable) &&
      args(0).dataType == StringType &&
      (args(1).dataType match {
        case ArrayType(et, _) => Seq[org.apache.spark.sql.types.DataType](
          FloatType, DoubleType).contains(et) ||
          et.isInstanceOf[org.apache.spark.sql.types.DecimalType]
        case _ => false
      }) &&
      args(2).dataType == IntegerType &&
      args.drop(3).headOption.forall(_.dataType == IntegerType),
      s"$KnnName expects (ivf index path, numeric array vector, k int" +
        "[, nProbe int]) literals")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val path = args(0).eval(empty)
    val vecArg = args(1).eval(empty)
    val k = args(2).eval(empty)
    require(path != null && vecArg != null && k != null,
      s"$KnnName: arguments must not be null")
    val fourth: Option[Int] = args.drop(3).headOption.map { e =>
      val v = e.eval(empty)
      require(v != null, s"$KnnName: nProbe/shortlist must not be null")
      v.asInstanceOf[Int]
    }
    val arr = vecArg.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val et = args(1).dataType.asInstanceOf[ArrayType].elementType
    val vec: Array[Float] = (0 until arr.numElements()).map { i =>
      require(!arr.isNullAt(i), s"$KnnName: vector must not contain nulls")
      et match {
        case FloatType => arr.getFloat(i)
        case DoubleType => arr.getDouble(i).toFloat
        case d: org.apache.spark.sql.types.DecimalType =>
          arr.getDecimal(i, d.precision, d.scale).toFloat
      }
    }.toArray
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val dir = resolveDir(path.toString)
    val kk = k.asInstanceOf[Int]
    // sidecar dispatch (three bounded metadata probes at analysis time)
    val fs = StrawIO.fs(dir)
    val hasPq = fs.exists(new org.apache.hadoop.fs.Path(dir, "_pq_codebooks"))
    val hasIvf = fs.exists(new org.apache.hadoop.fs.Path(dir, "_ivf_centroids"))
    val hasBq = fs.exists(new org.apache.hadoop.fs.Path(dir, "_bq_meta"))
    // the query id is never a corpus id: self-exclusion can't misfire
    def queryDf = Seq((Long.MinValue, vec)).toDF("vec_id", "embedding")
    if (hasBq) {
      // BQ tiers: Hamming shortlist + bounded mid-flight collect + exact
      // rerank — deferred like the PQ tiers (EXPLAIN probes nothing).
      // With the IVF sidecar too, the probe is cell-pruned (4th arg =
      // nProbe); flat BQ takes the 4th arg as shortlist.
      val out = Seq(
        AttributeReference("id", LongType, nullable = false)(),
        AttributeReference("cosine", DoubleType, nullable = false)(),
        AttributeReference("rank", IntegerType, nullable = false)())
      DeferredOpPlan(KnnName, out, () => {
        val s = org.apache.spark.sql.SparkSession.active
        import s.implicits._
        val q = Seq((Long.MinValue, vec)).toDF("vec_id", "embedding")
        val res =
          if (hasIvf)
            graft.ops.Ann.ivfBqTopK(s, dir, q, kk,
              nProbe = fourth.getOrElse(4))
          else
            graft.ops.Ann.bqTopKIndexed(s, dir, q, kk,
              shortlist = fourth.getOrElse(0))
        res.selectExpr("cast(neighbor_id as long) id", "cosine", "rank")
          .collect()
          .map(r => org.apache.spark.sql.catalyst.InternalRow(
            r.getLong(0), r.getDouble(1), r.getInt(2)))
          .toSeq
      })
    } else if (hasPq) {
      // PQ tiers: the probe collects a bounded shortlist mid-flight, so it
      // runs at EXECUTION time as a whole (EXPLAIN probes nothing)
      val out = Seq(
        AttributeReference("id", LongType, nullable = false)(),
        AttributeReference("cosine", DoubleType, nullable = false)(),
        AttributeReference("rank", IntegerType, nullable = false)())
      DeferredOpPlan(KnnName, out, () => {
        val s = org.apache.spark.sql.SparkSession.active
        import s.implicits._
        val q = Seq((Long.MinValue, vec)).toDF("vec_id", "embedding")
        val res =
          if (hasIvf)
            graft.ops.Ann.ivfPqTopK(s, dir, q, kk, nProbe = fourth.getOrElse(4))
          else
            graft.ops.Ann.pqTopKIndexed(s, dir, q, kk,
              shortlist = fourth.getOrElse(0))
        res.selectExpr("cast(neighbor_id as long) id", "cosine", "rank")
          .collect()
          .map(r => org.apache.spark.sql.catalyst.InternalRow(
            r.getLong(0), r.getDouble(1), r.getInt(2)))
          .toSeq
      })
    } else
      graft.ops.Ann.ivfTopKIndexed(spark, dir, queryDf, kk,
          nProbe = fourth.getOrElse(4))
        .selectExpr("cast(neighbor_id as long) id", "cosine", "rank")
        .queryExecution.analyzed
  }

  val ChunkName = "straw_chunk"

  private def numericLit(e: Expression, what: String): Double = {
    require(e.foldable && (e.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]),
      s"$what must be a numeric literal, got ${e.dataType}")
    val v = e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    require(v != null, s"$what must not be null")
    v match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number => n.doubleValue
      case other => throw new IllegalArgumentException(
        s"$what: unexpected literal $other")
    }
  }

  /** `straw_chunk('<table path>', '<id col>', '<text col>', chunkTokens,
    * overlap)`: RAG token-window chunking ([[graft.ops.TextOps.chunkDocs]])
    * over a strawboat table as plain SQL — (id, chunk_id, chunk_text,
    * n_tokens) rows. LAZY like [[bm25Builder]]: the builder returns the
    * map-only chunking plan, so EXPLAIN costs nothing and the result
    * composes in joins/CTEs. */
  def chunkBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 5 && args.take(3).forall(a =>
        a.foldable && a.dataType == StringType),
      s"$ChunkName expects (table path, id col, text col, chunkTokens, overlap)")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val Seq(path, idCol, textCol) = args.take(3).map(_.eval(empty))
    require(path != null && idCol != null && textCol != null,
      s"$ChunkName: arguments must not be null")
    val chunkTokens = numericLit(args(3), s"$ChunkName: chunkTokens")
    val overlap = numericLit(args(4), s"$ChunkName: overlap")
    require(chunkTokens == chunkTokens.toInt && overlap == overlap.toInt,
      s"$ChunkName: chunkTokens/overlap must be integers")
    val spark = org.apache.spark.sql.SparkSession.active
    graft.ops.TextOps.chunkDocs(
        spark.read.format("strawboat").load(resolveDir(path.toString)),
        idCol.toString, textCol.toString, chunkTokens.toInt, overlap.toInt)
      .queryExecution.analyzed
  }

  val DupSpansName = "straw_dup_spans"

  /** `straw_dup_spans('<table path>', '<id col>', '<text col>', n[,
    * minDf])`: exact substring (span) dedup
    * ([[graft.ops.Dedup.duplicateSpans]], Lee et al. 2022) over a
    * strawboat table as plain SQL — (doc_id, span_start, span_end) rows
    * in token coordinates, maximal cross-document runs of >= n tokens
    * occurring in >= minDf (default 2) documents. The dedup family's
    * first SQL entry point. LAZY like [[chunkBuilder]]: the builder
    * returns the md5-gram + gaps-and-islands plan, EXPLAIN costs
    * nothing, and the output composes (e.g. anti-join a cleaning pass). */
  def dupSpansBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 4 && args.length <= 5 && args.take(3).forall(a =>
        a.foldable && a.dataType == StringType),
      s"$DupSpansName expects (table path, id col, text col, n[, minDf])")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val Seq(path, idCol, textCol) = args.take(3).map(_.eval(empty))
    require(path != null && idCol != null && textCol != null,
      s"$DupSpansName: arguments must not be null")
    val n = numericLit(args(3), s"$DupSpansName: n")
    require(n == n.toInt, s"$DupSpansName: n must be an integer")
    val minDf = args.lift(4).map(numericLit(_, s"$DupSpansName: minDf"))
      .getOrElse(2.0)
    require(minDf == minDf.toInt, s"$DupSpansName: minDf must be an integer")
    val spark = org.apache.spark.sql.SparkSession.active
    graft.ops.Dedup.duplicateSpans(
        spark.read.format("strawboat").load(resolveDir(path.toString)),
        idCol.toString, textCol.toString, n.toInt, minDf.toInt)
      .queryExecution.analyzed
  }

  val DedupName = "straw_dedup"

  /** `straw_dedup('<table path>', '<id col>', '<content col>')`: exact
    * dedup by content digest ([[graft.ops.Dedup.exact]]) — one (digest,
    * keep_id, dup_count) row per distinct content value, keeping the
    * smallest id. LAZY like [[dupSpansBuilder]]: one hash-partitioned
    * aggregation, EXPLAIN costs nothing, composes in CTEs (e.g. semi-join
    * keep_id back for the kept corpus). */
  def dedupBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3 && args.forall(a =>
        a.foldable && a.dataType == StringType),
      s"$DedupName expects (table path, id col, content col) string literals")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val Seq(path, idCol, contentCol) = args.map(_.eval(empty))
    require(path != null && idCol != null && contentCol != null,
      s"$DedupName: arguments must not be null")
    val spark = org.apache.spark.sql.SparkSession.active
    graft.ops.Dedup.exact(
        spark.read.format("strawboat").load(resolveDir(path.toString)),
        idCol.toString, contentCol.toString)
      .queryExecution.analyzed
  }

  val NearDupName = "straw_neardup"

  /** `straw_neardup('<table path>', '<id col>', '<text col>'[, threshold[,
    * shingle k]])`: MinHash+LSH near-duplicate pairs
    * ([[graft.ops.Dedup.minHashNearDup]]) — (id_a, id_b, jaccard) rows,
    * id_a < id_b, exact-verified at >= threshold (default 0.8; shingle
    * size default 5). LAZY: the signature → band → bucket-join →
    * row-local-verify plan itself — the only shuffled data is signatures,
    * buckets, and candidate pairs, never an all-pairs product. */
  def nearDupBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 3 && args.length <= 5 && args.take(3).forall(a =>
        a.foldable && a.dataType == StringType),
      s"$NearDupName expects (table path, id col, text col[, threshold[, k]])")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val Seq(path, idCol, textCol) = args.take(3).map(_.eval(empty))
    require(path != null && idCol != null && textCol != null,
      s"$NearDupName: arguments must not be null")
    val threshold = args.lift(3)
      .map(numericLit(_, s"$NearDupName: threshold")).getOrElse(0.8)
    require(threshold > 0.0 && threshold <= 1.0,
      s"$NearDupName: threshold must be in (0, 1], got $threshold")
    val k = args.lift(4).map(numericLit(_, s"$NearDupName: k")).getOrElse(5.0)
    require(k == k.toInt && k >= 1,
      s"$NearDupName: k must be a positive integer, got $k")
    val spark = org.apache.spark.sql.SparkSession.active
    graft.ops.Dedup.minHashNearDup(
        spark.read.format("strawboat").load(resolveDir(path.toString)),
        idCol.toString, textCol.toString, k = k.toInt, threshold = threshold)
      .queryExecution.analyzed
  }

  val SemDedupIndexedName = "straw_semdedup_indexed"

  /** `straw_semdedup_indexed('<IVF index dir>', tau)`: the dup vec_ids of
    * [[graft.ops.Dedup.semanticDupIdsIndexed]] — SemDeDup over a
    * persisted IVF index's stored cell assignments (zero assignment
    * cost; the same-cell self-join is storage-partitioned under SPJ).
    * LAZY, unlike its fitting sibling [[semDedupBuilder]]: the cells are
    * already on disk, so this is a pure read plan — EXPLAIN costs
    * nothing, and the ids compose (anti-join them for the kept corpus,
    * the same CTE shape as [[dedupBuilder]]). */
  def semDedupIndexedBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 && args.head.foldable &&
        args.head.dataType == StringType,
      s"$SemDedupIndexedName expects (IVF index dir, tau)")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val path = args.head.eval(empty)
    require(path != null, s"$SemDedupIndexedName: index dir must not be null")
    val tau = numericLit(args(1), s"$SemDedupIndexedName: tau")
    require(tau > 0.0 && tau <= 1.0,
      s"$SemDedupIndexedName: tau must be in (0, 1], got $tau")
    val spark = org.apache.spark.sql.SparkSession.active
    graft.ops.Dedup.semanticDupIdsIndexed(
        spark, resolveDir(path.toString), tau)
      .queryExecution.analyzed
  }

  val SemDedupName = "straw_semdedup"

  private def semDedupSchema: Seq[AttributeReference] = Seq(
    AttributeReference("n_in", LongType, nullable = false)(),
    AttributeReference("n_dropped", LongType, nullable = false)(),
    AttributeReference("n_kept", LongType, nullable = false)(),
    AttributeReference("dest_dir", StringType, nullable = false)())

  // one-shot guard like [[compacted]]: the dedup is a fit + distributed
  // rewrite — re-actioning the same query must not run it twice
  private val semDeduped = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Int, Int, Double, Int), (Long, Long)]()

  /** `straw_semdedup('<source table>', '<dest dir>', dim, k, tau[,
    * iters])`: SemDeDup ([[graft.ops.Dedup.semanticDupIdsFit]], Abbas et
    * al. 2023) from plain SQL — fits full-corpus k-means over the source's
    * (vec_id, embedding), drops every row with an earlier-id neighbor at
    * round(cosine, 4) >= tau in the SAME cluster, and writes the kept
    * corpus as a strawboat table at dest. Returns one (n_in, n_dropped,
    * n_kept, dest_dir) row. Runs at EXECUTION time ([[DeferredOpPlan]],
    * the mutating TVFs' lifecycle — the Lloyd fit collects only k·dim
    * centroids and the rewrite is distributed, so nothing corpus-sized
    * touches the driver) with [[compactBuilder]]'s one-shot replay
    * guard. */
  def semDedupBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 5 && args.length <= 6 &&
      args.take(2).forall(a => a.foldable && a.dataType == StringType),
      s"$SemDedupName expects (source table, dest dir, dim, k, tau[, iters])")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val Seq(srcArg, destArg) = args.take(2).map(_.eval(empty))
    require(srcArg != null && destArg != null,
      s"$SemDedupName: arguments must not be null")
    val dimD = numericLit(args(2), s"$SemDedupName: dim")
    val kD = numericLit(args(3), s"$SemDedupName: k")
    require(dimD == dimD.toInt && kD == kD.toInt && dimD > 0 && kD > 0,
      s"$SemDedupName: dim and k must be positive integers")
    val tau = numericLit(args(4), s"$SemDedupName: tau")
    require(tau > 0.0 && tau <= 1.0,
      s"$SemDedupName: tau must be in (0, 1], got $tau")
    val itersD = args.lift(5).map(numericLit(_, s"$SemDedupName: iters"))
      .getOrElse(3.0)
    require(itersD == itersD.toInt && itersD >= 1,
      s"$SemDedupName: iters must be a positive integer")
    val src = resolveDir(srcArg.toString)
    val dest = resolveDir(destArg.toString)
    require(src != dest, s"$SemDedupName: dest must differ from source")
    // column presence validates at analysis from the cached footer schema
    val probe = org.apache.spark.sql.SparkSession.active
      .read.format("strawboat").load(src)
    Seq("vec_id", "embedding").foreach(c => require(probe.columns.contains(c),
      s"$SemDedupName: source must carry a '$c' column " +
        s"(have: ${probe.columns.mkString(", ")})"))
    val (dim, k, iters) = (dimD.toInt, kD.toInt, itersD.toInt)
    DeferredOpPlan(SemDedupName, semDedupSchema, () => {
      val (nIn, nKept) = semDeduped.computeIfAbsent(
        (src, dest, dim, k, tau, iters), { _ =>
          val s = org.apache.spark.sql.SparkSession.active
          val corpus = s.read.format("strawboat").load(src)
          val (dups, _) = graft.ops.Dedup.semanticDupIdsFit(
            s, corpus, dim, k, tau, iters)
          corpus.join(dups, Seq("vec_id"), "left_anti")
            .write.format("strawboat").mode("overwrite").save(dest)
          (corpus.count(), s.read.format("strawboat").load(dest).count())
        })
      Seq(org.apache.spark.sql.catalyst.InternalRow(
        nIn, nIn - nKept, nKept, UTF8String.fromString(dest)))
    })
  }

  val LmScoreName = "straw_lm_score"

  /** `straw_lm_score('<table path>', '<id col>', '<text col>')`: the
    * corpus-trained bigram-LM perplexity score
    * ([[graft.ops.TextOps.lmScore]], α = 1) over a strawboat table as
    * plain SQL — (id, lm_score, n_bigrams) rows. LAZY: returns the
    * train+score plan itself. */
  def lmScoreBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3 && args.forall(a =>
        a.foldable && a.dataType == StringType),
      s"$LmScoreName expects (table path, id col, text col) string literals")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val Seq(path, idCol, textCol) = args.map(_.eval(empty))
    require(path != null && idCol != null && textCol != null,
      s"$LmScoreName: arguments must not be null")
    val spark = org.apache.spark.sql.SparkSession.active
    graft.ops.TextOps.lmScore(
        spark.read.format("strawboat").load(resolveDir(path.toString)),
        idCol.toString, textCol.toString)
      .queryExecution.analyzed
  }

  val TemperatureName = "straw_temperature"

  /** `straw_temperature('<table path>', '<key col>', '<stratum col>', tau,
    * fraction)`: temperature-scaled mixture sampling
    * ([[graft.ops.Packing.temperatureSample]]) over a strawboat table as
    * plain SQL — the kept rows, stratum column first. LAZY: returns the
    * map-only keep plan. */
  def temperatureBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 5 && args.take(3).forall(a =>
        a.foldable && a.dataType == StringType),
      s"$TemperatureName expects (table path, key col, stratum col, tau, fraction)")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val Seq(path, keyCol, stratumCol) = args.take(3).map(_.eval(empty))
    require(path != null && keyCol != null && stratumCol != null,
      s"$TemperatureName: arguments must not be null")
    val tau = numericLit(args(3), s"$TemperatureName: tau")
    val fraction = numericLit(args(4), s"$TemperatureName: fraction")
    val spark = org.apache.spark.sql.SparkSession.active
    graft.ops.Packing.temperatureSample(
        spark.read.format("strawboat").load(resolveDir(path.toString)),
        keyCol.toString, stratumCol.toString, tau, fraction)
      .queryExecution.analyzed
  }

  val IndexName = "straw_index"
  val IndexAppendName = "straw_index_append"

  private def indexSchema: Seq[AttributeReference] = Seq(
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("rows_indexed", LongType, nullable = false)(),
    AttributeReference("index_dir", StringType, nullable = false)())

  // one-shot guard like [[compacted]]: an index build is a distributed
  // rewrite — re-actioning the same query must not rebuild
  private val indexed = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String, String), Long]()

  private def parseOpts(s: String, what: String): Map[String, String] =
    s.split(',').map(_.trim).filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"$what: options are 'k=v,k=v', got '$kv'")
      kv.take(i).trim.toLowerCase -> kv.drop(i + 1).trim
    }.toMap

  /** `straw_index('<source table>', '<index dir>', '<kind>'[, '<options>'])`:
    * build a persisted retrieval index over a strawboat table from plain
    * SQL — the missing write half of the straw_bm25/straw_knn query
    * surface. `kind` ∈ `ivf` | `pq` | `ivfpq` | `lexical`; options are
    * `k=v,k=v`:
    *
    *  - vector kinds read (vec_id, embedding); `dim` is REQUIRED;
    *    `ncentroids` (ivf/ivfpq), `m`, `ncodes` (pq/ivfpq),
    *    `opq=true` (pq/ivfpq), `seed`, `samplesize` are optional.
    *  - `lexical` reads (`id`, `text`) columns named by the `id`/`text`
    *    options (defaults `doc_id`/`text`); `buckets` and
    *    `positions=true` (phrase support) are optional.
    *
    * Runs at EXECUTION time ([[DeferredOpPlan]], the mutating TVFs'
    * lifecycle) with [[compactBuilder]]'s one-shot replay guard; returns
    * (kind, rows_indexed, index_dir). Probe the result with `straw_bm25`
    * / `straw_phrase` / `straw_knn` / `straw_hybrid`. */
  def indexBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 3 && args.length <= 4 && args.forall(a =>
        a.foldable && a.dataType == StringType),
      s"$IndexName expects (source table, index dir, kind[, options]) strings")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val Seq(srcArg, dirArg, kindArg) = args.take(3).map(_.eval(empty))
    require(srcArg != null && dirArg != null && kindArg != null,
      s"$IndexName: arguments must not be null")
    val optStr = args.drop(3).headOption.map { e =>
      val v = e.eval(empty)
      require(v != null, s"$IndexName: options must not be null")
      v.toString
    }.getOrElse("")
    val opts = parseOpts(optStr, IndexName)
    val kind = kindArg.toString.toLowerCase
    require(Seq("ivf", "pq", "ivfpq", "bq", "ivfbq", "lexical").contains(kind),
      s"$IndexName: kind must be ivf | pq | ivfpq | bq | ivfbq | lexical, got '$kind'")
    val knownKeys = kind match {
      case "lexical" => Set("id", "text", "buckets", "positions")
      case "ivf" => Set("dim", "ncentroids", "seed", "samplesize")
      case "pq" => Set("dim", "m", "ncodes", "opq", "seed", "samplesize")
      case "bq" => Set("dim")
      case "ivfbq" => Set("dim", "ncentroids", "seed", "samplesize")
      case _ => Set("dim", "ncentroids", "m", "ncodes", "opq", "seed", "samplesize")
    }
    val unknown = opts.keySet -- knownKeys
    require(unknown.isEmpty,
      s"$IndexName($kind): unknown option(s) ${unknown.mkString(", ")} — " +
        s"supported: ${knownKeys.toSeq.sorted.mkString(", ")}")
    def intOpt(k: String, dflt: Int): Int = opts.get(k).map(_.toInt).getOrElse(dflt)
    require(kind == "lexical" || opts.contains("dim"),
      s"$IndexName($kind): option dim=<embedding length> is required")
    val src = resolveDir(srcArg.toString)
    val dir = resolveDir(dirArg.toString)
    DeferredOpPlan(IndexName, indexSchema, () => {
      val n = indexed.computeIfAbsent((src, dir, kind, optStr), { _ =>
        val s = org.apache.spark.sql.SparkSession.active
        val source = s.read.format("strawboat").load(src)
        kind match {
          case "lexical" =>
            graft.ops.Search.buildLexicalIndex(source,
              opts.getOrElse("id", "doc_id"), opts.getOrElse("text", "text"),
              dir, buckets = intOpt("buckets", 64),
              positions = opts.get("positions").exists(_.toBoolean))
          case "ivf" =>
            graft.ops.Ann.buildIvfIndex(s, source, dir, opts("dim").toInt,
              nCentroids = intOpt("ncentroids", 16),
              seed = intOpt("seed", 7).toLong,
              sampleSize = intOpt("samplesize", 1024)): Unit
          case "pq" =>
            graft.ops.Ann.buildPqIndex(s, source, dir, opts("dim").toInt,
              m = intOpt("m", 16), nCodes = intOpt("ncodes", 64),
              seed = intOpt("seed", 7).toLong,
              sampleSize = intOpt("samplesize", 1024),
              opq = opts.get("opq").exists(_.toBoolean)): Unit
          case "bq" =>
            graft.ops.Ann.buildBqIndex(s, source, dir, opts("dim").toInt)
          case "ivfbq" =>
            graft.ops.Ann.buildIvfBqIndex(s, source, dir, opts("dim").toInt,
              nCentroids = intOpt("ncentroids", 16),
              seed = intOpt("seed", 7).toLong,
              sampleSize = intOpt("samplesize", 1024))
          case _ =>
            graft.ops.Ann.buildIvfPqIndex(s, source, dir, opts("dim").toInt,
              nCentroids = intOpt("ncentroids", 16), m = intOpt("m", 16),
              nCodes = intOpt("ncodes", 64), seed = intOpt("seed", 7).toLong,
              sampleSize = intOpt("samplesize", 1024),
              opq = opts.get("opq").exists(_.toBoolean))
        }
        source.count()
      })
      Seq(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(kind), n,
        org.apache.spark.unsafe.types.UTF8String.fromString(dir)))
    })
  }

  /** `straw_index_append('<source table>', '<index dir>'[, '<options>'])`:
    * incrementally index new rows into an EXISTING [[indexBuilder]]
    * directory, dispatching on its sidecars (`_ivf_centroids` +
    * `_pq_codebooks` → ivfpq; `_pq_codebooks` → pq; `_ivf_centroids` →
    * ivf; `_bq_meta` → bq; a `postings/` subdirectory → lexical, with the same `id`/`text`
    * options). The frozen-fit contract of the Scala appends applies:
    * quantizers/codebooks/rotation stay as built — rebuild via
    * [[indexBuilder]] when the recall gates say so. Deferred + replay-
    * guarded like [[indexBuilder]]. */
  def indexAppendBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 2 && args.length <= 3 && args.forall(a =>
        a.foldable && a.dataType == StringType),
      s"$IndexAppendName expects (source table, index dir[, options]) strings")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val Seq(srcArg, dirArg) = args.take(2).map(_.eval(empty))
    require(srcArg != null && dirArg != null,
      s"$IndexAppendName: arguments must not be null")
    val optStr = args.drop(2).headOption.map { e =>
      val v = e.eval(empty)
      require(v != null, s"$IndexAppendName: options must not be null")
      v.toString
    }.getOrElse("")
    val opts = parseOpts(optStr, IndexAppendName)
    val unknown = opts.keySet -- Set("id", "text")
    require(unknown.isEmpty,
      s"$IndexAppendName: unknown option(s) ${unknown.mkString(", ")} — " +
        "supported: id, text (lexical only)")
    val src = resolveDir(srcArg.toString)
    val dir = resolveDir(dirArg.toString)
    // sidecar dispatch at analysis time (bounded metadata probes)
    val fs = StrawIO.fs(dir)
    def at(n: String) = fs.exists(new org.apache.hadoop.fs.Path(dir, n))
    val kind =
      if (at("_pq_codebooks") && at("_ivf_centroids")) "ivfpq"
      else if (at("_bq_meta") && at("_ivf_centroids")) "ivfbq"
      else if (at("_pq_codebooks")) "pq"
      else if (at("_ivf_centroids")) "ivf"
      else if (at("_bq_meta")) "bq"
      else if (at("postings")) "lexical"
      else throw new IllegalArgumentException(
        s"$IndexAppendName: $dir carries no index sidecars — not a " +
          s"$IndexName directory")
    DeferredOpPlan(IndexAppendName, indexSchema, () => {
      val n = indexed.computeIfAbsent((src, dir, s"append-$kind", optStr), { _ =>
        val s = org.apache.spark.sql.SparkSession.active
        val source = s.read.format("strawboat").load(src)
        kind match {
          case "lexical" =>
            graft.ops.Search.appendToLexicalIndex(source,
              opts.getOrElse("id", "doc_id"), opts.getOrElse("text", "text"), dir)
          case "ivf" => graft.ops.Ann.appendToIvfIndex(s, source, dir)
          case "pq" => graft.ops.Ann.appendToPqIndex(s, source, dir)
          case "bq" => graft.ops.Ann.appendToBqIndex(s, source, dir)
          case "ivfbq" => graft.ops.Ann.appendToIvfBqIndex(s, source, dir)
          case _ => graft.ops.Ann.appendToIvfPqIndex(s, source, dir)
        }
        source.count()
      })
      Seq(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(kind), n,
        org.apache.spark.unsafe.types.UTF8String.fromString(dir)))
    })
  }

  val AddConstraintName = "straw_add_constraint"
  val DropConstraintName = "straw_drop_constraint"

  private def constraintOpSchema: Seq[AttributeReference] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("name", StringType, nullable = false)(),
    AttributeReference("expression", StringType, nullable = true)())

  // same re-execution guard as [[restored]]: the add validates the whole
  // table (a scan) and the drop fails on a missing name — re-actioning the
  // same query must replay the first execution instead
  private val constraintOps =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Option[String]), Long]()

  /** `straw_add_constraint('<path>', '<name>', '<expr>')`: validates every
    * existing row against the CHECK expression, then commits it to the log
    * ([[StrawConstraints.add]]); returns (version, name, expression). Runs
    * at EXECUTION time ([[DeferredOpPlan]]) with a first-execution replay
    * guard. */
  def addConstraintBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3 && args.forall(a =>
      a.foldable && a.dataType == StringType),
      s"$AddConstraintName expects (table path, name, expression) string literals")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val Seq(path, name, expr) = args.map(_.eval(empty))
    require(path != null && name != null && expr != null,
      s"$AddConstraintName: arguments must not be null")
    val dir = resolveDir(path.toString)
    DeferredOpPlan(AddConstraintName, constraintOpSchema, () => {
      val v = constraintOps.computeIfAbsent(
        (dir, name.toString, Some(expr.toString)),
        _ => StrawConstraints.add(org.apache.spark.sql.SparkSession.active,
          dir, name.toString, expr.toString))
      Seq(org.apache.spark.sql.catalyst.InternalRow(
        v, UTF8String.fromString(name.toString), UTF8String.fromString(expr.toString)))
    })
  }

  /** `straw_drop_constraint('<path>', '<name>')`: removes the named
    * constraint ([[StrawConstraints.drop]]); returns (version, name, null).
    * Runs at EXECUTION time ([[DeferredOpPlan]]) with a first-execution
    * replay guard. */
  def dropConstraintBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 && args.forall(a =>
      a.foldable && a.dataType == StringType),
      s"$DropConstraintName expects (table path, name) string literals")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val Seq(path, name) = args.map(_.eval(empty))
    require(path != null && name != null,
      s"$DropConstraintName: arguments must not be null")
    val dir = resolveDir(path.toString)
    DeferredOpPlan(DropConstraintName, constraintOpSchema, () => {
      val v = constraintOps.computeIfAbsent((dir, name.toString, None),
        _ => StrawConstraints.drop(dir, name.toString))
      Seq(org.apache.spark.sql.catalyst.InternalRow(
        v, UTF8String.fromString(name.toString), null))
    })
  }

  /** Session-scoped registration (code-driven use; [[GraftExtensions]]
    * injects the same builders config-only). Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    // the mutating TVFs plan to [[DeferredOpPlan]]; the planner needs its
    // strategy (GraftExtensions injects it config-side)
    if (!spark.experimental.extraStrategies.contains(DeferredOpStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ DeferredOpStrategy
    }
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(HistoryName),
      new ExpressionInfo(classOf[StrawLog.HistoryRow].getName, HistoryName),
      historyBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(RestoreName),
      new ExpressionInfo(classOf[StrawRestore.RestoreResult].getName, RestoreName),
      restoreBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(VacuumName),
      new ExpressionInfo(classOf[StrawLog.HistoryRow].getName, VacuumName),
      vacuumBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(VacuumLogName),
      new ExpressionInfo(classOf[StrawLog.HistoryRow].getName, VacuumLogName),
      vacuumLogBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(CompactName),
      new ExpressionInfo(classOf[StrawCompaction.CompactionResult].getName, CompactName),
      compactBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(RebucketName),
      new ExpressionInfo(classOf[StrawCompaction.CompactionResult].getName, RebucketName),
      rebucketBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(ConstraintsName),
      new ExpressionInfo(classOf[StrawConstraints.Constraint].getName, ConstraintsName),
      constraintsBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(DetailName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, DetailName),
      detailBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(IvfDetailName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, IvfDetailName),
      ivfDetailBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(Bm25Name),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, Bm25Name),
      bm25Builder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(LexDetailName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, LexDetailName),
      lexDetailBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(PhraseName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, PhraseName),
      phraseBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(AsofName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, AsofName),
      asofBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(RangeJoinName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, RangeJoinName),
      rangeJoinBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(AsofBothName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, AsofBothName),
      asofBothBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(OverlapName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, OverlapName),
      overlapBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(TopkName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, TopkName),
      topkBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(KmeansName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, KmeansName),
      kmeansBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(HybridName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, HybridName),
      hybridBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(KnnName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, KnnName),
      knnBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(ChunkName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, ChunkName),
      chunkBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(DupSpansName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, DupSpansName),
      dupSpansBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(SemDedupName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, SemDedupName),
      semDedupBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(SemDedupIndexedName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        SemDedupIndexedName),
      semDedupIndexedBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(DedupName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, DedupName),
      dedupBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(NearDupName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, NearDupName),
      nearDupBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(LmScoreName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, LmScoreName),
      lmScoreBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(TemperatureName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, TemperatureName),
      temperatureBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(IndexName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, IndexName),
      indexBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(IndexAppendName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName, IndexAppendName),
      indexAppendBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(AddConstraintName),
      new ExpressionInfo(classOf[StrawConstraints.Constraint].getName, AddConstraintName),
      addConstraintBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(DropConstraintName),
      new ExpressionInfo(classOf[StrawConstraints.Constraint].getName, DropConstraintName),
      dropConstraintBuilder _)
  }
}

/** Session-extensions entry point: injects every graft codegen'd function
  * (vector similarity/LSH/IVF kernels, text-hash kernels, media header
  * parsers) into the session at build time, so a cluster operator enables
  * the whole surface with CONFIG ONLY — no code:
  *
  * {{{
  * spark.sql.extensions=graft.spark.GraftExtensions
  * }}}
  *
  * or programmatically `SparkSession.builder().withExtensions(new
  * GraftExtensions)`. After that, plain SQL works everywhere the session
  * reaches (thriftserver, notebooks, `spark.sql(...)`):
  *
  * {{{
  * SELECT doc_id FROM docs WHERE cosine_similarity(emb, array(...)) > 0.9
  * SELECT simhash64(text) FROM docs
  * }}}
  *
  * The per-object `register(spark)` helpers remain for session-scoped,
  * code-driven use; both routes share the same function descriptions, so
  * the surfaces cannot drift apart. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    val all = VectorFunctions.descriptions ++
      TextHashFunctions.descriptions ++
      ImageMetaFunctions.descriptions ++
      SketchFunctions.descriptions
    all.foreach { case (name, clazz, builder) =>
      extensions.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder))
    }
    // table-valued metadata access (straw_history, straw_restore) rides
    // the same config
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.HistoryName),
      new ExpressionInfo(classOf[StrawLog.HistoryRow].getName,
        StrawSqlSurface.HistoryName),
      StrawSqlSurface.historyBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.RestoreName),
      new ExpressionInfo(classOf[StrawRestore.RestoreResult].getName,
        StrawSqlSurface.RestoreName),
      StrawSqlSurface.restoreBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.VacuumName),
      new ExpressionInfo(classOf[StrawLog.HistoryRow].getName,
        StrawSqlSurface.VacuumName),
      StrawSqlSurface.vacuumBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.VacuumLogName),
      new ExpressionInfo(classOf[StrawLog.HistoryRow].getName,
        StrawSqlSurface.VacuumLogName),
      StrawSqlSurface.vacuumLogBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.CompactName),
      new ExpressionInfo(classOf[StrawCompaction.CompactionResult].getName,
        StrawSqlSurface.CompactName),
      StrawSqlSurface.compactBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.RebucketName),
      new ExpressionInfo(classOf[StrawCompaction.CompactionResult].getName,
        StrawSqlSurface.RebucketName),
      StrawSqlSurface.rebucketBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.ChangesName),
      new ExpressionInfo(classOf[StrawChanges.ChangeTask].getName,
        StrawSqlSurface.ChangesName),
      StrawSqlSurface.changesBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.ConstraintsName),
      new ExpressionInfo(classOf[StrawConstraints.Constraint].getName,
        StrawSqlSurface.ConstraintsName),
      StrawSqlSurface.constraintsBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.AddConstraintName),
      new ExpressionInfo(classOf[StrawConstraints.Constraint].getName,
        StrawSqlSurface.AddConstraintName),
      StrawSqlSurface.addConstraintBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.DropConstraintName),
      new ExpressionInfo(classOf[StrawConstraints.Constraint].getName,
        StrawSqlSurface.DropConstraintName),
      StrawSqlSurface.dropConstraintBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.Bm25Name),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.Bm25Name),
      StrawSqlSurface.bm25Builder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.LexDetailName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.LexDetailName),
      StrawSqlSurface.lexDetailBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.PhraseName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.PhraseName),
      StrawSqlSurface.phraseBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.AsofName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.AsofName),
      StrawSqlSurface.asofBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.RangeJoinName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.RangeJoinName),
      StrawSqlSurface.rangeJoinBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.AsofBothName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.AsofBothName),
      StrawSqlSurface.asofBothBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.OverlapName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.OverlapName),
      StrawSqlSurface.overlapBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.TopkName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.TopkName),
      StrawSqlSurface.topkBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.KmeansName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.KmeansName),
      StrawSqlSurface.kmeansBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.HybridName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.HybridName),
      StrawSqlSurface.hybridBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.DetailName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.DetailName),
      StrawSqlSurface.detailBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.KnnName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.KnnName),
      StrawSqlSurface.knnBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.ChunkName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.ChunkName),
      StrawSqlSurface.chunkBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.DupSpansName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.DupSpansName),
      StrawSqlSurface.dupSpansBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.SemDedupName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.SemDedupName),
      StrawSqlSurface.semDedupBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.SemDedupIndexedName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.SemDedupIndexedName),
      StrawSqlSurface.semDedupIndexedBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.DedupName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.DedupName),
      StrawSqlSurface.dedupBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.NearDupName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.NearDupName),
      StrawSqlSurface.nearDupBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.LmScoreName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.LmScoreName),
      StrawSqlSurface.lmScoreBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.TemperatureName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.TemperatureName),
      StrawSqlSurface.temperatureBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.IndexName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.IndexName),
      StrawSqlSurface.indexBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.IndexAppendName),
      new ExpressionInfo(classOf[StrawLog.Snapshot].getName,
        StrawSqlSurface.IndexAppendName),
      StrawSqlSurface.indexAppendBuilder _))
    // the mutating TVFs above defer their side effect to execution time
    // through [[DeferredOpPlan]] — plan it
    extensions.injectPlannerStrategy(_ => DeferredOpStrategy)
    // SQL UPDATE / MERGE INTO over the native mutation machinery
    extensions.injectPostHocResolutionRule(session => new StrawDmlRules(session))
    // streaming filter pushdown: Spark never runs V2 pushdown on streaming
    // scans, so this rule registers each micro-batch plan's filters on the
    // stream as prune-only hints (see [[StreamFilterPruning]])
    extensions.injectOptimizerRule(session => StreamFilterPruning(session))
  }
}
