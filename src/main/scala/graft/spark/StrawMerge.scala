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
  * mutation of a touched file conflicts cleanly. At 100 TB this is a
  * broadcast-join-shaped plan: cost tracks the SOURCE size and the files
  * containing matches, not the table.
  *
  * Scale bound: the source's KEY SET is collected to the driver and
  * broadcast (the source data itself is written distributed, never
  * collected) — the usual upsert shape where the batch is orders of
  * magnitude smaller than the table. A shuffle-based large-source merge
  * is deliberately out of scope.
  */
object StrawMerge {

  sealed trait MatchedAction
  /** Replace each matched target row with its source row (UPDATE SET *). */
  case object Replace extends MatchedAction
  /** Delete matched target rows (WHEN MATCHED THEN DELETE). */
  case object Delete extends MatchedAction
  /** Leave matched target rows as they are (insert-only merge). */
  case object Keep extends MatchedAction

  final case class MergeResult(
      matchedRows: Long,
      insertedRows: Long,
      removedFiles: Int,
      dvFiles: Int,
      newFiles: Int,
      prunedFiles: Int)

  /** Key types we can hash/compare value-exactly on the driver and prune
    * by zone maps — the flat orderable set minus floats (NaN equality) and
    * binary (reference equality). */
  private def keyType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case BooleanType | ByteType | ShortType | IntegerType | DateType |
           LongType | TimestampType | TimestampNTZType | StringType => true
      case d: DecimalType => d.precision <= 38
      case _ => false
    }
  }

  def merge(spark: SparkSession, dir: String, source: DataFrame,
      keys: Seq[String], whenMatched: MatchedAction = Replace,
      insertNotMatched: Boolean = true,
      opts: WriteOptions = WriteOptions()): MergeResult = {
    require(keys.nonEmpty, "strawboat: merge needs at least one key column")
    require(whenMatched != Keep || insertNotMatched,
      "strawboat: merge with whenMatched=Keep and insertNotMatched=false is a no-op")
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
    mergeMaterialized(spark, dir, srcMat, keys, keyIdx, whenMatched,
      insertNotMatched, opts, listed, schema)
  }

  private def mergeMaterialized(spark: SparkSession, dir: String,
      srcAligned: DataFrame, keys: Seq[String], keyIdx: Seq[Int],
      whenMatched: MatchedAction, insertNotMatched: Boolean,
      opts: WriteOptions, listed: Seq[StrawIO.Listed],
      schema: StructType): MergeResult = {
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
    // ride the ordinary stats ladder; row matching below uses the hash set
    val pruneFilters: Array[org.apache.spark.sql.sources.Filter] =
      keys.zipWithIndex.map { case (k, c) =>
        val vals: Array[Any] = keyRows.iterator.map(r => r.get(c))
          .filter(_ != null).toArray.distinct.take(1001)
        org.apache.spark.sql.sources.In(k, vals)
      }.filter(_.values.length <= 1000).toArray
    // Keep still MATCHES (to know which source keys must not insert) but
    // never mutates the matched target rows
    val mutate = whenMatched != Keep
    val (candidates, pruned) =
      MaintenanceOps.matchCandidates(listed, schema, pruneFilters, mapping)
    require(candidates.forall(_.numRows <= Int.MaxValue.toLong),
      "strawboat: merge needs 32-bit row ordinals per file")

    val jobId = java.util.UUID.randomUUID().toString.take(8)
    val f = StrawIO.fs(dir)
    def q(p: String): String = f.makeQualified(new Path(p)).toString

    // ---- match phase: one task per candidate file probes the key set ----
    val serConf = new org.apache.spark.util.SerializableConfiguration(StrawIO.conf)
    val keySchemaJson = keySchema.json
    val probeB = spark.sparkContext.broadcast(probeKeys)
    val mutateB = spark.sparkContext.broadcast(mutate)
    val mappingB = spark.sparkContext.broadcast(mapping)
    final case class MatchOut(input: String, matched: Long, oldDvPath: String,
        newDv: DeletionVector.DvInfo, fullDead: Boolean,
        matchedKeys: Seq[Vector[Any]])
    val outs: Array[MatchOut] =
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
                  }
                }
                i += 1
                ord += 1
              }
            }
            p += 1
          }
          val matchedCount = matched.getLongCardinality
          if (matchedCount == 0)
            MatchOut(m.path, 0L,
              if (cand.dv == null) null else cand.dv.path, null, fullDead = false,
              Seq.empty)
          else if (!mutateB.value) {
            // Keep: the matched keys gate inserts; the target rows stay
            MatchOut(m.path, matchedCount,
              if (cand.dv == null) null else cand.dv.path, null, fullDead = false,
              matchedKeys.toSeq)
          } else {
            val union = matched.clone()
            if (existing != null) union.or(existing)
            val fullDead = union.getLongCardinality >= footer.numRows
            val newDv =
              if (fullDead) null
              else DeletionVector.write(StrawIO.fs(m.path), new Path(m.path), union)
            MatchOut(m.path, matchedCount,
              if (cand.dv == null) null else cand.dv.path, newDv, fullDead,
              matchedKeys.toSeq)
          }
        } finally input.close()
      }.collect()
    val changed = outs.filter(_.matched > 0)
    val allMatchedKeys: Set[Vector[Any]] = changed.flatMap(_.matchedKeys).toSet

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
      val filterFn: org.apache.spark.sql.Row => Boolean = { r =>
        val key = Vector.tabulate(kIdx.length)(c =>
          if (r.isNullAt(kIdx(c))) null else r.get(kIdx(c)))
        val isMatched = matchedB.value(key)
        (isMatched && keepMatchedSrc) || (!isMatched && insertNotMatched)
      }
      srcAligned.filter(filterFn)
    }
    // hive-partitioned targets route inserted rows into their value
    // directories, preserving the (possibly multi-level) layout and its
    // pruning — every existing file must agree on the column sequence
    val partitionCols: Seq[String] = listed
      .map(lf => PartitionLayout.partitionsOf(lf.meta.path).map(_._1))
      .distinct match {
      case Seq(one) => one
      case _ => Seq.empty
    }
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
    val mutated = if (mutate) changed else Array.empty[MatchOut]
    if (mutated.isEmpty && staged.isEmpty) {
      StrawCommitProtocol.sweepStaged(dir, jobId)
      return MergeResult(changed.map(_.matched).sum, 0L, 0, 0, 0, pruned)
    }

    val fresh = MaintenanceOps.renameVisibleStamped(dir, jobId,
      Seq((System.currentTimeMillis(), staged)))
    val insertedRows = fresh.map(fm =>
      FooterCache.get(fm.path, fm.mtime, fm.len).numRows).sum
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
      matchedRows = changed.map(_.matched).sum,
      insertedRows = insertedRows,
      removedFiles = removes.size,
      dvFiles = dvUpdates.size,
      newFiles = fresh.size,
      prunedFiles = pruned)
  }
}
