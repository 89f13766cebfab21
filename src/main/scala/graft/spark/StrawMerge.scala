package graft.spark

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.format.WriteOptions

/** MERGE INTO (upsert) for strawboat tables — the natural completion of the
  * mutation surface: one atomic commit that updates matched rows, deletes
  * them, and/or inserts unmatched source rows.
  *
  * Semantics are keyed equi-merge, the standard upsert shape:
  * {{{
  * MERGE INTO target USING source ON target.k = source.k
  *   WHEN MATCHED THEN UPDATE SET * | DELETE
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  * expressed as [[merge]](whenMatched = Replace|Delete|Keep,
  * insertNotMatched). A matched TARGET row's replacement is its source
  * row (SET *). With duplicate keys in the TARGET, all duplicates die and
  * ONE source row replaces them — the merge deduplicates the key, which
  * is STRICTER than SQL MERGE (it would update each duplicate in place);
  * key-unique tables are unaffected. Duplicate non-null keys in the
  * SOURCE are rejected up front — SQL MERGE declares multiple source
  * matches per target row nondeterministic and errors; so do we. Null
  * source keys never match anything (SQL equality) and simply insert.
  *
  * Execution is MERGE-ON-READ over the deletion-vector machinery: the
  * source's keys broadcast to one task per candidate target file (pruned
  * by the key columns' file/page statistics first), matched ordinals
  * union into each file's DV, and the surviving source rows are written
  * DISTRIBUTED as new files — target rows never rewrite. Everything
  * switches in ONE atomic [[StrawLog]] commit (op `merge`); a concurrent
  * mutation of a touched file conflicts cleanly.
  *
  * Two match strategies, chosen by the SOURCE's estimated key bytes
  * against [[BroadcastKeyBytesConf]] (default 64 MiB):
  *
  *  - '''broadcast''' (small source — the usual upsert): the source's key
  *    set is collected to the driver and broadcast; one task per candidate
  *    target file probes it. Cost tracks the source size and the files
  *    containing matches, not the table.
  *  - '''distributed''' (large source — a backfill): NOTHING key-shaped
  *    ever reaches the driver. Candidate files emit their live key rows
  *    tagged (file, ordinal); a shuffle semi-join against the source keys
  *    yields the matched pairs; matched ordinals aggregate into per-file
  *    RoaringBitmaps ON EXECUTORS, which write the DVs; insert gating is a
  *    semi/anti join of the source against the matched keys. The driver
  *    sees only per-file [[MatchOut]] metadata (bounded by the file
  *    count) — a source of any size survives.
  *
  * Both paths stage inserts distributed and share the single atomic
  * commit. Candidate pruning runs before either: hive partition dirs,
  * file stats and page zone maps against the source keys' ranges (plus
  * exact In-sets when the source is small enough to enumerate them).
  */
object StrawMerge {

  /** Runtime conf: max estimated source-key bytes for the driver-collect
    * (broadcast) match path; larger sources take the shuffle-join path. */
  val BroadcastKeyBytesConf = "spark.strawboat.merge.broadcastKeyBytes"
  private val BroadcastKeyBytesDefault: Long = 64L << 20

  sealed trait MatchedAction
  /** Replace each matched target row with its source row (UPDATE SET *). */
  case object Replace extends MatchedAction
  /** Delete matched target rows (WHEN MATCHED THEN DELETE). */
  case object Delete extends MatchedAction
  /** Leave matched target rows as they are (insert-only merge). */
  case object Keep extends MatchedAction

  final case class MergeResult(
      matchedRows: Long,
      /** source rows written because their key matched NO target row —
        * true WHEN NOT MATCHED inserts only. (Until round 14 this field
        * counted every freshly written row, replacement versions
        * included; a re-merge of an already-applied source then reported
        * thousands of "inserts" while the table row count stood still.) */
      insertedRows: Long,
      removedFiles: Int,
      dvFiles: Int,
      newFiles: Int,
      prunedFiles: Int,
      /** true = the shuffle-join (large-source) match path ran; the
        * driver never materialized the source key set. */
      distributedSource: Boolean = false,
      /** target rows deleted because their key had NO source match
        * (WHEN NOT MATCHED BY SOURCE THEN DELETE). */
      notMatchedBySourceDeleted: Long = 0L,
      /** matched source rows written as replacement versions (Replace
        * action). insertedRows + replacedRows = rows this merge wrote. */
      replacedRows: Long = 0L)

  /** One candidate file's match outcome, driver-bound (O(files), never
    * O(keys)): matched live-row count, the DV switch, full-death. */
  private final case class MatchOut(input: String, matched: Long,
      oldDvPath: String, newDv: DeletionVector.DvInfo, fullDead: Boolean)
    extends Serializable

  /** Key types we can hash/compare value-exactly on the driver and prune
    * by zone maps — the flat orderable set minus floats (NaN equality) and
    * binary (reference equality). */
  private[spark] def keyType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case BooleanType | ByteType | ShortType | IntegerType | DateType |
           LongType | TimestampType | TimestampNTZType | StringType => true
      case d: DecimalType => d.precision <= 38
      case _ => false
    }
  }

  /** @param insertCondition SQL predicate over the TABLE's columns gating
    *        which NOT-MATCHED source rows insert (`WHEN NOT MATCHED AND c
    *        THEN INSERT *`); analyzed by the session against the aligned
    *        source. Matching itself is unaffected — a matched source row
    *        is never an insert candidate regardless. */
  def merge(spark: SparkSession, dir: String, source: DataFrame,
      keys: Seq[String], whenMatched: MatchedAction = Replace,
      insertNotMatched: Boolean = true,
      opts: WriteOptions = WriteOptions(),
      deleteNotMatchedBySource: Boolean = false,
      insertCondition: Option[String] = None): MergeResult = {
    require(keys.nonEmpty, "strawboat: merge needs at least one key column")
    require(whenMatched != Keep || insertNotMatched || deleteNotMatchedBySource,
      "strawboat: merge with whenMatched=Keep and insertNotMatched=false is a no-op")
    // a bucketed table's inserts keep its layout (sidecar-recorded spec)
    val opts0 = StrawBucket.withTableSpec(dir, opts)
    val listed = StrawIO.listFilesMetaWithStats(dir)
    require(listed.nonEmpty, s"strawboat: no data files under $dir")
    // rename/drop history: keys and the merged schema speak the logical
    // namespace; per-file footer translation happens at each access below
    val mapping = StrawLog.mappingAt(dir)
    val schema = StrawSchemaResolver.merge(StrawIO.mapParallel(listed) {
      case StrawIO.Listed(m, Some(synth), _) =>
        (m.path, mapping.toLogical(synth.schema))
      case StrawIO.Listed(m, None, _) =>
        (m.path, mapping.toLogical(FooterCache.get(m.path, m.mtime, m.len).schema))
    })
    val keyIdx = keys.map { k =>
      val i = schema.fields.indexWhere(_.name == k)
      require(i >= 0, s"strawboat: merge key '$k' not in ${schema.fieldNames.mkString(",")}")
      require(keyType(schema.fields(i).dataType),
        s"strawboat: merge key '$k' has type ${schema.fields(i).dataType} " +
          "(supported: string / integral / boolean / date / timestamp / decimal)")
      i
    }
    // align the source to the TABLE schema (by name, exact types) — SET * /
    // INSERT * semantics need a full row per source record
    val srcAligned = {
      val missing = schema.fieldNames.filterNot(source.columns.contains)
      require(missing.isEmpty,
        s"strawboat: merge source lacks table column(s): ${missing.mkString(", ")}")
      val sel = source.select(schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
      sel.schema.fields.zip(schema.fields).foreach { case (s, t) =>
        require(s.dataType == t.dataType,
          s"strawboat: merge source column '${t.name}' is ${s.dataType} but the " +
            s"table stores ${t.dataType} — cast the source first")
        // a nullable source column feeding a non-nullable table column
        // could write nulls the table's read schema then denies (codegen
        // elides the null checks) — reject statically, coalesce to fix
        require(!s.nullable || t.nullable,
          s"strawboat: merge source column '${t.name}' is nullable but the " +
            "table column is not — coalesce the source first")
      }
      sel
    }

    // MATERIALIZE the source before anything reads it: the key collect and
    // the insert write are two separate Spark jobs over the same frame — a
    // non-deterministic or concurrently-changing source evaluated twice
    // could insert rows whose keys were never probed (duplicate keys /
    // lost updates). localCheckpoint CUTS LINEAGE, not just caches: losing
    // a materialized partition fails the merge loudly instead of silently
    // recomputing the source (persist would re-evaluate on cache loss —
    // the exact hazard again). Blocks are reclaimed by the context cleaner
    // once the frame is unreachable.
    val srcMat = srcAligned.localCheckpoint(true)
    // path gate: estimated source KEY bytes. Row count is exact (the frame
    // is materialized); variable-width key columns (string/binary) use the
    // MEASURED average byte width — defaultSize=20 undercounts URL/digest
    // keys several-fold and would route an oversized source to the
    // driver-collect path. One aggregate job computes count + widths.
    val keySchema = StructType(keyIdx.map(schema.fields(_)))
    val varWidth = keySchema.fields.filter(f =>
      f.dataType == org.apache.spark.sql.types.StringType ||
      f.dataType == org.apache.spark.sql.types.BinaryType)
    val (srcRows, perRowKeyBytes) = {
      import org.apache.spark.sql.functions._
      val aggs = count(lit(1)) +: varWidth.toSeq.map(f =>
        coalesce(avg(octet_length(col(f.name))), lit(0.0)))
      val r = srcMat.agg(aggs.head, aggs.tail: _*).collect()(0)
      val fixed = keySchema.fields.filterNot(varWidth.contains)
        .map(_.dataType.defaultSize + 16L).sum
      val measured = varWidth.indices.map(i => r.getDouble(i + 1) + 16L).sum
      (r.getLong(0), fixed + measured.toLong)
    }
    val gateBytes = spark.conf.get(BroadcastKeyBytesConf,
      BroadcastKeyBytesDefault.toString).toLong
    // bind the insert condition up front: a typo'd column or analysis
    // error must fail before anything mutates
    val icCol: Option[org.apache.spark.sql.Column] =
      insertCondition.map(c => org.apache.spark.sql.functions.expr(c))
    icCol.foreach(c => srcMat.filter(c).queryExecution.assertAnalyzed())
    if (srcRows * perRowKeyBytes <= gateBytes)
      mergeBroadcast(spark, dir, srcMat, keys, keyIdx, whenMatched,
        insertNotMatched, opts0, listed, schema, deleteNotMatchedBySource, icCol)
    else
      mergeDistributed(spark, dir, srcMat, keys, keyIdx, whenMatched,
        insertNotMatched, opts0, listed, schema, deleteNotMatchedBySource, icCol)
  }

  private def mergeBroadcast(spark: SparkSession, dir: String,
      srcAligned: DataFrame, keys: Seq[String], keyIdx: Seq[Int],
      whenMatched: MatchedAction, insertNotMatched: Boolean,
      opts: WriteOptions, listed: Seq[StrawIO.Listed],
      schema: StructType, deleteUnmatched: Boolean,
      insertCond: Option[org.apache.spark.sql.Column]): MergeResult = {
    val mapping = StrawLog.mappingAt(dir)
    // the source KEY SET comes to the driver: dedup check + pruning bounds
    // + broadcast probe set (catalyst-valued tuples; the types above are
    // all value-hashable)
    val keyRows = srcAligned
      .select(keys.map(org.apache.spark.sql.functions.col).toSeq: _*).collect()
    val keySchema = StructType(keyIdx.map(schema.fields(_)))
    val toCatalyst = keySchema.fields.map(f =>
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(f.dataType))
    val keyTuples: Seq[Vector[Any]] = keyRows.toSeq.map { r =>
      Vector.tabulate(keys.size)(c =>
        if (r.isNullAt(c)) null else toCatalyst(c)(r.get(c)))
    }
    // a null key never equals anything (SQL equality) — it can match no
    // target row, so several null-keyed rows are NOT ambiguous matches;
    // they simply insert when insertNotMatched
    val probeList = keyTuples.filterNot(_.contains(null))
    val probeKeys: Set[Vector[Any]] = probeList.toSet
    require(probeKeys.size == probeList.length,
      s"strawboat: merge source carries duplicate keys (${probeList.length} " +
        s"non-null-keyed rows, ${probeKeys.size} distinct " +
        s"${keys.mkString("(", ",", ")")}) — SQL MERGE declares multiple " +
        "source matches per target row nondeterministic")

    // candidate pruning: per-key-column In filters (external-form values)
    // ride the ordinary stats ladder; row matching below uses the hash
    // set. Beyond the 1000-value enumeration cap an In filter drops, but
    // the key range still prunes: zone maps exclude files wholly outside
    // [min, max] — a clustered batch (the common backfill) keeps pruning.
    // WHEN NOT MATCHED BY SOURCE deletes rows anywhere in the table — no
    // key-derived pruning is sound then; every file is a candidate
    val pruneFilters: Array[org.apache.spark.sql.sources.Filter] =
      if (deleteUnmatched) Array.empty
      else keys.zipWithIndex.flatMap { case (k, c) =>
        val vals: Array[Any] = keyRows.iterator.map(r => r.get(c))
          .filter(_ != null).toArray.distinct
        if (vals.nonEmpty && vals.length <= 1000)
          Seq(org.apache.spark.sql.sources.In(k, vals))
        else rangeFilters(k, vals)
      }.toArray
    // Keep still MATCHES (to know which source keys must not insert) but
    // never mutates the matched target rows
    val mutate = whenMatched != Keep
    val (candidates, pruned) =
      MaintenanceOps.matchCandidates(listed, schema, pruneFilters, mapping)
    require(candidates.forall(_.numRows <= Int.MaxValue.toLong),
      "strawboat: merge needs 32-bit row ordinals per file")

    val jobId = java.util.UUID.randomUUID().toString.take(8)

    // ---- match phase: one task per candidate file probes the key set ----
    val serConf = new org.apache.spark.util.SerializableConfiguration(StrawIO.conf)
    val keySchemaJson = keySchema.json
    val probeB = spark.sparkContext.broadcast(probeKeys)
    val mutateB = spark.sparkContext.broadcast(mutate)
    val delUnB = spark.sparkContext.broadcast(deleteUnmatched)
    val mappingB = spark.sparkContext.broadcast(mapping)
    final case class Probe(input: String, matched: Long, oldDvPath: String,
        newDv: DeletionVector.DvInfo, fullDead: Boolean,
        matchedKeys: Seq[Vector[Any]], unmatchedDeleted: Long)
    val outs: Array[Probe] =
      if (candidates.isEmpty) Array.empty
      else spark.sparkContext.parallelize(candidates, candidates.size).map { cand =>
        StrawIO.install(serConf.value)
        val m = cand.meta
        val keySub = org.apache.spark.sql.types.DataType
          .fromJson(keySchemaJson).asInstanceOf[StructType]
        val probe = probeB.value
        val existing: org.roaringbitmap.RoaringBitmap =
          if (cand.dv == null) null else DeletionVector.read(cand.dv.path, cand.dv.len)
        val input = StrawIO.open(m.path)
        try {
          val footer = mappingB.value.toLogicalFooter(FooterCache.get(m.path, input))
          val read = new MaintenanceOps.ResolvedFileRead(input, footer, keySub)
          val matched = new org.roaringbitmap.RoaringBitmap()
          val unmatched = new org.roaringbitmap.RoaringBitmap()
          val matchedKeys = scala.collection.mutable.LinkedHashSet.empty[Vector[Any]]
          val keep = ZoneMapFilter.keptPages(footer, pruneFilters)
          val pageRows: Array[Int] =
            if (footer.columns.isEmpty) Array.empty
            else footer.columns(0).pages.map(_.numValues)
          val row = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(keySub.length)
          var ord = 0L
          var p = 0
          while (p < pageRows.length) {
            val n = pageRows(p)
            if (!keep(p)) ord += n
            else {
              val pages = read.decodePages(p)
              var i = 0
              while (i < n) {
                if (existing == null || !existing.contains(ord.toInt)) {
                  read.fill(pages, i, row)
                  val key = Vector.tabulate(keySub.length)(c =>
                    if (row.isNullAt(c)) null
                    else row.get(c, keySub.fields(c).dataType))
                  if (!key.contains(null) && probe(key)) {
                    matched.add(ord.toInt)
                    matchedKeys += key
                  } else if (delUnB.value) {
                    // no source match (null target keys match nothing):
                    // WHEN NOT MATCHED BY SOURCE THEN DELETE
                    unmatched.add(ord.toInt)
                  }
                }
                i += 1
                ord += 1
              }
            }
            p += 1
          }
          val matchedCount = matched.getLongCardinality
          val unmatchedCount = unmatched.getLongCardinality
          // rows this merge kills: matched ones when the action mutates,
          // source-unmatched ones under WHEN NOT MATCHED BY SOURCE DELETE
          val dying = new org.roaringbitmap.RoaringBitmap()
          if (mutateB.value) dying.or(matched)
          if (delUnB.value) dying.or(unmatched)
          if (dying.isEmpty)
            Probe(m.path, matchedCount,
              if (cand.dv == null) null else cand.dv.path, null, fullDead = false,
              matchedKeys.toSeq, 0L)
          else {
            if (existing != null) dying.or(existing)
            val fullDead = dying.getLongCardinality >= footer.numRows
            val newDv =
              if (fullDead) null
              else DeletionVector.write(StrawIO.fs(m.path), new Path(m.path), dying)
            Probe(m.path, matchedCount,
              if (cand.dv == null) null else cand.dv.path, newDv, fullDead,
              matchedKeys.toSeq, unmatchedCount)
          }
        } finally input.close()
      }.collect()
    val allMatchedKeys: Set[Vector[Any]] = outs.flatMap(_.matchedKeys).toSet

    // ---- insert phase: choose the source rows to write, distributed ----
    // Replace: every source row lands (matched ones are the new versions,
    // unmatched the inserts — gated by insertNotMatched). Delete/Keep:
    // only unmatched rows insert.
    val keepMatchedSrc = whenMatched == Replace
    val toWrite: DataFrame = {
      // broadcast the matched-key set in EXTERNAL form (converted once on
      // the driver), so the per-row filter compares Row values directly —
      // no converter allocation inside the hot lambda
      val toScala = keySchema.fields.map(f =>
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToScalaConverter(f.dataType))
      val matchedExternal: Set[Vector[Any]] =
        allMatchedKeys.map(k => Vector.tabulate(k.size)(c =>
          if (k(c) == null) null else toScala(c)(k(c))))
      val matchedB = spark.sparkContext.broadcast(matchedExternal)
      val kIdx = keyIdx.toArray
      def keyOf(r: org.apache.spark.sql.Row): Vector[Any] =
        Vector.tabulate(kIdx.length)(c =>
          if (r.isNullAt(kIdx(c))) null else r.get(kIdx(c)))
      insertCond match {
        case None =>
          val filterFn: org.apache.spark.sql.Row => Boolean = { r =>
            val isMatched = matchedB.value(keyOf(r))
            (isMatched && keepMatchedSrc) || (!isMatched && insertNotMatched)
          }
          srcAligned.filter(filterFn)
        case Some(ic) =>
          // the condition gates only the NOT-MATCHED branch — matched
          // source rows (the replacement versions) are never subject to it
          val matchedPart =
            if (!keepMatchedSrc) srcAligned.limit(0)
            else srcAligned.filter((r: org.apache.spark.sql.Row) =>
              matchedB.value(keyOf(r)))
          val unmatchedPart =
            if (!insertNotMatched) srcAligned.limit(0)
            else srcAligned.filter((r: org.apache.spark.sql.Row) =>
              !matchedB.value(keyOf(r))).filter(ic)
          matchedPart.unionAll(unmatchedPart)
      }
    }
    val mutated: Array[MatchOut] = outs
      .filter(o => o.newDv != null || o.fullDead)
      .map(o => MatchOut(o.input, o.matched, o.oldDvPath, o.newDv, o.fullDead))
    // source keys are verified-unique, so distinct matched target keys
    // count exactly the source rows the Replace action writes back
    commitMerge(spark, dir, jobId, toWrite, schema, mapping, opts, listed,
      serConf, mutated, matchedRows = outs.map(_.matched).sum, pruned,
      unmatchedDeleted = outs.map(_.unmatchedDeleted).sum,
      replacedSrcRows = if (keepMatchedSrc) allMatchedKeys.size.toLong else 0L)
  }

  /** The shuffle-join match path: nothing proportional to the source's
    * key set touches the driver. See the object scaladoc for the shape. */
  private def mergeDistributed(spark: SparkSession, dir: String,
      srcAligned: DataFrame, keys: Seq[String], keyIdx: Seq[Int],
      whenMatched: MatchedAction, insertNotMatched: Boolean,
      opts: WriteOptions, listed: Seq[StrawIO.Listed],
      schema: StructType, deleteUnmatched: Boolean,
      insertCond: Option[org.apache.spark.sql.Column]): MergeResult = {
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    val mapping = StrawLog.mappingAt(dir)
    val keySchema = StructType(keyIdx.map(schema.fields(_)))
    val keyCols = keys.map(col)
    // null keys never equal anything (SQL equality): they match no target
    // row and are not duplicate-ambiguous — drop them from the probe side
    val srcKeys = srcAligned.select(keyCols: _*)
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
    // duplicate-key rejection, distributed (the broadcast path's driver
    // set-dedup, re-expressed as a grouped count)
    val dupSample = srcKeys.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__straw_cnt"))
      .filter(col("__straw_cnt") > 1).limit(1).collect()
    require(dupSample.isEmpty,
      s"strawboat: merge source carries duplicate keys (e.g. " +
        s"${keys.mkString("(", ",", ")")} = " +
        s"${dupSample.headOption.map(_.toSeq.dropRight(1).mkString(",")).getOrElse("")}) " +
        "— SQL MERGE declares multiple source matches per target row " +
        "nondeterministic")

    // candidate pruning by the source keys' RANGE (one tiny agg job): a
    // clustered backfill still skips most of the table's files/pages even
    // though the key set itself is too big to enumerate. WHEN NOT MATCHED
    // BY SOURCE deletes rows anywhere — no pruning is sound then.
    val pruneFilters: Array[org.apache.spark.sql.sources.Filter] =
      if (deleteUnmatched) Array.empty
      else {
        val aggExprs = keys.flatMap(k =>
          Seq(min(col(k)).as(s"__min_$k"), max(col(k)).as(s"__max_$k")))
        val rangeRow = srcKeys.agg(aggExprs.head, aggExprs.tail: _*).collect()(0)
        keys.zipWithIndex.flatMap { case (k, i) =>
          val lo = rangeRow.get(2 * i); val hi = rangeRow.get(2 * i + 1)
          if (lo == null || hi == null) Nil // empty probe side: no pruning info
          else Seq(org.apache.spark.sql.sources.GreaterThanOrEqual(k, lo),
            org.apache.spark.sql.sources.LessThanOrEqual(k, hi))
        }.toArray
      }
    val mutate = whenMatched != Keep
    val (candidates, pruned) =
      MaintenanceOps.matchCandidates(listed, schema, pruneFilters, mapping)
    require(candidates.forall(_.numRows <= Int.MaxValue.toLong),
      "strawboat: merge needs 32-bit row ordinals per file")

    val jobId = java.util.UUID.randomUUID().toString.take(8)
    val serConf = new org.apache.spark.util.SerializableConfiguration(StrawIO.conf)
    val keySchemaJson = keySchema.json
    val mappingB = spark.sparkContext.broadcast(mapping)
    val delUn = deleteUnmatched

    // ---- target side: every candidate file streams its live key rows,
    // tagged (file index, row ordinal), page-skipped by the range zone
    // maps. External-form values so the rows build a regular DataFrame.
    val extSchema = StructType(
      org.apache.spark.sql.types.StructField("__straw_file",
        org.apache.spark.sql.types.IntegerType, nullable = false) +:
      org.apache.spark.sql.types.StructField("__straw_ord",
        org.apache.spark.sql.types.LongType, nullable = false) +:
      keySchema.fields)
    val targetKeyRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
      if (candidates.isEmpty) spark.sparkContext.emptyRDD
      else spark.sparkContext.parallelize(candidates.zipWithIndex, candidates.size)
        .flatMap { case (cand, fi) =>
          StrawIO.install(serConf.value)
          val m = cand.meta
          val keySub = org.apache.spark.sql.types.DataType
            .fromJson(keySchemaJson).asInstanceOf[StructType]
          val toScala = keySub.fields.map(f =>
            org.apache.spark.sql.catalyst.CatalystTypeConverters
              .createToScalaConverter(f.dataType))
          val existing: org.roaringbitmap.RoaringBitmap =
            if (cand.dv == null) null else DeletionVector.read(cand.dv.path, cand.dv.len)
          val input = StrawIO.open(m.path)
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null) tc.addTaskCompletionListener[Unit](_ => input.close())
          val footer = mappingB.value.toLogicalFooter(FooterCache.get(m.path, input))
          val read = new MaintenanceOps.ResolvedFileRead(input, footer, keySub)
          val keep = ZoneMapFilter.keptPages(footer, pruneFilters)
          val pageRows: Array[Int] =
            if (footer.columns.isEmpty) Array.empty
            else footer.columns(0).pages.map(_.numValues)
          val pageBase = pageRows.scanLeft(0L)(_ + _)
          val row = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(keySub.length)
          // page-lazy iterator: one decoded page in memory at a time
          pageRows.indices.iterator.filter(keep).flatMap { p =>
            val pages = read.decodePages(p)
            (0 until pageRows(p)).iterator.flatMap { i =>
              val ord = pageBase(p) + i
              if (existing != null && existing.contains(ord.toInt)) Iterator.empty
              else {
                read.fill(pages, i, row)
                var hasNull = false
                val vals = new Array[Any](keySub.length + 2)
                vals(0) = fi
                vals(1) = ord
                var c = 0
                while (c < keySub.length) {
                  if (row.isNullAt(c)) hasNull = true
                  else vals(c + 2) = toScala(c)(row.get(c, keySub.fields(c).dataType))
                  c += 1
                }
                // null-keyed target rows match nothing: they are dead
                // weight for MATCHING, but under WHEN NOT MATCHED BY
                // SOURCE they are exactly the rows to delete — keep them
                if (hasNull && !delUn) Iterator.empty
                else Iterator(org.apache.spark.sql.Row.fromSeq(
                  scala.collection.immutable.ArraySeq.unsafeWrapArray(vals)))
              }
            }
          }
        }
    val targetKeysRaw = spark.createDataFrame(targetKeyRdd, extSchema)
    // the unmatched-delete shape consumes the target keys TWICE (semi and
    // anti joins) — checkpoint so candidate files read once
    val targetKeys =
      if (deleteUnmatched) targetKeysRaw.localCheckpoint(true) else targetKeysRaw

    // ---- match: shuffle semi-join (source keys are verified-unique, so
    // semi ≡ inner here), then CUT LINEAGE so the two consumers below
    // don't re-read every candidate file
    val matchedPairs = targetKeys.join(srcKeys, keys, "left_semi")
      .localCheckpoint(true)
    val matchedRows = matchedPairs.count()
    // source-unmatched target rows (anti join keeps null-keyed rows —
    // null matches nothing, so they are "not matched by source")
    val unmatchedPairs: Option[DataFrame] =
      if (!deleteUnmatched) None
      else Some(targetKeys.join(srcKeys, keys, "left_anti")
        .select(col("__straw_file"), col("__straw_ord")).localCheckpoint(true))
    val unmatchedDeleted = unmatchedPairs.map(_.count()).getOrElse(0L)

    // ---- DV phase: dying ordinals (matched when the action mutates,
    // plus source-unmatched under the delete clause) aggregate into
    // per-file bitmaps on executors (combiner-based — never a
    // materialized per-file ordinal list), which read/union/write each
    // file's DV in place
    val dvPairs: Seq[org.apache.spark.rdd.RDD[(Int, Long)]] =
      (if (mutate && matchedRows > 0)
        Seq(matchedPairs.select(col("__straw_file"), col("__straw_ord")).rdd
          .map(r => (r.getInt(0), r.getLong(1))))
      else Nil) ++
      (if (unmatchedDeleted > 0)
        unmatchedPairs.map(_.rdd.map(r => (r.getInt(0), r.getLong(1)))).toSeq
      else Nil)
    val outs: Array[MatchOut] =
      dvPairs.reduceOption(_ union _) match {
        case None => Array.empty
        case Some(pairs) => MaintenanceOps.dvFromPairs(spark, pairs,
          candidates.toIndexedSeq)
          .map(o => MatchOut(o.input, o.matched, o.oldDvPath, o.newDv, o.fullDead))
      }

    // ---- insert gating: semi/anti join against the matched keys (a
    // frame bounded by the matched target rows). Anti-join keeps
    // null-keyed source rows (null matches nothing) — same semantics as
    // the broadcast path's set filter.
    val keepMatchedSrc = whenMatched == Replace
    val toWrite: DataFrame =
      if (keepMatchedSrc && insertNotMatched && insertCond.isEmpty) srcAligned
      else {
        val matchedKeys = matchedPairs.select(keyCols: _*)
        val matchedPart =
          if (keepMatchedSrc) srcAligned.join(matchedKeys, keys, "left_semi")
          else srcAligned.limit(0)
        val unmatchedPart =
          if (!insertNotMatched) srcAligned.limit(0)
          else {
            val anti = srcAligned.join(matchedKeys, keys, "left_anti")
            insertCond.map(anti.filter).getOrElse(anti)
          }
        matchedPart.unionAll(unmatchedPart)
      }
    // distinct matched target keys == matched source rows (source keys
    // verified-unique); one bounded aggregation over the checkpointed
    // matched pairs, only when Replace actually writes them back
    val replacedSrcRows =
      if (keepMatchedSrc && matchedRows > 0)
        matchedPairs.select(keyCols: _*).distinct().count()
      else 0L
    commitMerge(spark, dir, jobId, toWrite, schema, mapping, opts, listed,
      serConf, outs, matchedRows, pruned, unmatchedDeleted = unmatchedDeleted,
      replacedSrcRows = replacedSrcRows)
      .copy(distributedSource = true)
  }

  /** Min/max range filters over external-form key values (all supported
    * key types are Comparable); sound page/file pruning when the exact
    * value set is too large to enumerate. */
  private def rangeFilters(k: String,
      vals: Array[Any]): Seq[org.apache.spark.sql.sources.Filter] =
    if (vals.isEmpty) Nil
    else {
      var lo = vals(0); var hi = vals(0)
      vals.foreach { v =>
        val c = v.asInstanceOf[Comparable[Any]]
        if (c.compareTo(lo) < 0) lo = v
        if (c.compareTo(hi) > 0) hi = v
      }
      Seq(org.apache.spark.sql.sources.GreaterThanOrEqual(k, lo),
        org.apache.spark.sql.sources.LessThanOrEqual(k, hi))
    }

  /** Shared tail of both match paths: stage `toWrite` distributed, then
    * switch DVs + removes + adds in one atomic log commit. */
  private def commitMerge(spark: SparkSession, dir: String, jobId: String,
      toWrite: DataFrame, schema: StructType, mapping: ColumnMappingState,
      opts: WriteOptions, listed: Seq[StrawIO.Listed],
      serConf: org.apache.spark.util.SerializableConfiguration,
      mutated: Array[MatchOut], matchedRows: Long, pruned: Int,
      unmatchedDeleted: Long = 0L, replacedSrcRows: Long = 0L): MergeResult = {
    val f = StrawIO.fs(dir)
    def q(p: String): String = f.makeQualified(new Path(p)).toString
    // hive-partitioned targets route inserted rows into their value
    // directories, preserving the (possibly multi-level) layout and its
    // pruning — every existing file must agree on the column sequence
    val partitionCols: Seq[String] = PartitionLayout.layoutColsOf(listed)
    // written files carry PHYSICAL spellings (fresh names for re-added
    // columns); rows bind positionally so only the field names differ
    val schemaJson = mapping.toPhysical(schema).json
    // every row this phase writes is NEW data (inserts and replaced
    // versions alike) — CHECK constraints bind once here and ride the task
    val checker = StrawConstraints.checkerFor(spark, dir, schema).orNull
    val staged: Seq[String] = {
      val optsB = opts
      toWrite.queryExecution.toRdd.mapPartitionsWithIndex { (pid, rows) =>
        StrawIO.install(serConf.value)
        val s = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
          .asInstanceOf[StructType]
        val writer = new StrawDataWriter(dir, s, pid, pid.toLong, optsB, jobId,
          partitionCols, checker)
        var ok = false
        try {
          rows.foreach(writer.write)
          val msg = writer.commit().asInstanceOf[StrawCommitMessage]
          ok = true
          Iterator(msg.files)
        } finally if (!ok) writer.abort()
      }.collect().flatten.toSeq
    }

    // Keep produced no sidecars — nothing to switch on the target side;
    // with nothing staged either, commit NO version (an all-matched
    // insert-only merge must not append a blank history entry)
    if (mutated.isEmpty && staged.isEmpty) {
      StrawCommitProtocol.sweepStaged(dir, jobId)
      return MergeResult(matchedRows, 0L, 0, 0, 0, pruned)
    }

    val fresh = MaintenanceOps.renameVisibleStamped(dir, jobId,
      Seq((System.currentTimeMillis(), staged)))
    // fresh rows = replacement versions + true inserts; report them apart
    val writtenRows = fresh.map(fm =>
      FooterCache.get(fm.path, fm.mtime, fm.len).numRows).sum
    val insertedRows = writtenRows - replacedSrcRows
    assert(insertedRows >= 0,
      s"merge accounting: wrote $writtenRows rows but $replacedSrcRows replacements")
    val (full, partial) = mutated.partition(_.fullDead)
    val removes = full.map(c => q(c.input)).toSet
    val dvUpdates = partial.map(c => StrawLog.DvUpdate(q(c.input), c.newDv,
      Option(c.oldDvPath))).toSeq
    val adds = StrawIO.mapParallel(fresh)(StrawManifest.entryFor)
    MaintenanceOps.commitSwitchAndVacuum(dir, jobId, adds, removes, op = "merge",
      dvs = dvUpdates,
      // partial files keep their superseded sidecar for the age-based
      // vacuum (restore/change-feed retention); full-dead files' sidecars
      // go with their bytes
      alsoVacuum = full.flatMap(c => Option(c.oldDvPath)).toSeq,
      alsoRollback = partial.map(_.newDv.path).toSeq,
      expectDvOnRemove = full.map(c => q(c.input) -> Option(c.oldDvPath)).toMap)

    MergeResult(
      matchedRows = matchedRows,
      insertedRows = insertedRows,
      removedFiles = removes.size,
      dvFiles = dvUpdates.size,
      newFiles = fresh.size,
      prunedFiles = pruned,
      notMatchedBySourceDeleted = unmatchedDeleted,
      replacedRows = replacedSrcRows)
  }
}
