package graft.spark

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

import graft.format.WriteOptions

/** Row-level DELETE over a strawboat table, copy-on-write: files that may
  * hold matching rows are rewritten without them and swapped in through ONE
  * atomic [[StrawLog]] commit; everything else is untouched. The
  * GDPR/takedown primitive an LLM-corpus table needs — at 100 TB the cost
  * must be proportional to the files CONTAINING matches, not table size,
  * which the snapshot's file-level stats and the footers' page zone maps
  * provide: a file whose stats prove no row can match costs nothing.
  *
  * `condition` is a conjunction of [[org.apache.spark.sql.sources.Filter]]s
  * (the public pushdown algebra — EqualTo/GreaterThan/In/IsNull/And/Or/Not,
  * string predicates). Rows where the conjunction evaluates TRUE under SQL
  * three-valued logic are deleted; FALSE and UNKNOWN rows are kept — SQL
  * DELETE semantics, evaluated by the same [[RowFilterEval]] machinery that
  * carries the scan's consumed-filter correctness obligation (pinned
  * adversarially against Spark's own evaluation in
  * ExactFilterEquivalenceSpec). A condition [[RowFilterEval]] cannot compile
  * exactly is REJECTED up front — never approximated.
  *
  * Rows are evaluated and rewritten in the TABLE schema (per-file null-fill
  * and lossless widening, the scan's own resolution): a schema-evolved file
  * lacking the condition column keeps all its rows (absent reads as null →
  * UNKNOWN), and a rewritten file comes out in the current table schema.
  *
  * Crash/concurrency contract mirrors [[StrawCompaction]]: rewrites stage
  * invisibly, the add/remove switch is one atomic log version (op
  * `delete`), physical input deletion follows the metadata commit, any
  * failure rolls visible outputs back, and a concurrent remover surfaces as
  * [[StrawLog.ConflictException]]. Outputs carry their input's max mtime so
  * a file-stream source that already saw the input does not re-deliver the
  * surviving rows (same contract as compaction; deleting from a LIVE stream
  * source is subject to the same safety-lag caveat).
  */
object StrawDelete {

  final case class DeleteResult(
      deletedRows: Long,
      rewrittenFiles: Int,
      removedFiles: Int,
      /** files the stats tiers proved could not match (zero IO). */
      prunedFiles: Int,
      /** candidate files whose rewrite found no matching row (discarded). */
      falsePositiveFiles: Int)

  /** Delete rows matching `condition` (conjunction, SQL 3VL) from `dir`.
    * No-op (version unchanged) when nothing matches. */
  def delete(spark: SparkSession, dir: String, condition: Seq[Filter],
      opts: WriteOptions = WriteOptions()): DeleteResult = {
    require(condition.nonEmpty, "strawboat: delete needs a condition " +
      "(to remove every row, overwrite the table instead)")
    // ONE listing snapshot drives both the table schema and the candidate
    // set: deriving the schema from a separate (earlier) resolution could
    // rewrite a concurrently-appended file in a stale schema that silently
    // drops its new column's data
    val listed = StrawIO.listFilesMetaWithStats(dir)
    require(listed.nonEmpty, s"strawboat: no data files under $dir")
    val schema = StrawSchemaResolver.merge(StrawIO.mapParallel(listed) {
      case (m, Some(synth)) => (m.path, synth.schema)
      case (m, None) => (m.path, FooterCache.get(m.path, m.mtime, m.len).schema)
    })
    require(RowFilterEval.build(schema, condition.toArray).isDefined,
      s"strawboat: delete condition is not exactly row-evaluable over " +
        s"${schema.catalogString}: ${condition.mkString(", ")} (supported: the " +
        "pushdown filter algebra over flat comparable columns)")
    val filters = condition.toArray

    // pruning tiers before any data IO: hive partition directories, then
    // file-level stats from the snapshot, then the real footer's page zone
    // maps — exactly the scan's planning ladder
    val (candidates, pruned) = MaintenanceOps.matchCandidates(listed, schema, filters)

    if (candidates.isEmpty)
      return DeleteResult(0L, 0, 0, pruned, 0)

    val jobId = java.util.UUID.randomUUID().toString.take(8)
    // one task per candidate file: stream rows (table schema — the reader
    // null-fills and widens per file), drop cond=TRUE rows, stage survivors
    // (shared distributed-rewrite scaffolding; assigns=None means DROP)
    val rewrites = MaintenanceOps.rewriteMatching(spark, dir, jobId, schema,
      candidates, filters, assigns = None, opts)

    val f = StrawIO.fs(dir)
    val (changed, untouched) = rewrites.partition(_.matched > 0)
    // zone maps keep a file whose pages MIGHT match; a rewrite that found
    // no matching row is discarded (the epilogue's staged sweep reclaims
    // its outputs) and its input stays byte-identical

    if (changed.isEmpty) {
      StrawCommitProtocol.sweepStaged(dir, jobId)
      return DeleteResult(0L, 0, 0, pruned, untouched.length)
    }

    // make survivors visible under the input's mtime (stream seen-ness),
    // with rollback on any failure — shared mechanics in [[MaintenanceOps]]
    val fresh = MaintenanceOps.renameVisibleStamped(dir, jobId,
      changed.toSeq.map(rw => (rw.inputMtime, rw.staged)))

    val removes = changed.map(c => f.makeQualified(new Path(c.input)).toString).toSet
    // every row of every file deleted: leave one schema-only marker so the
    // table stays self-describing and reads back empty (as BatchWrite does
    // for an empty overwrite)
    var freshAll = fresh
    if (fresh.isEmpty && removes.size == listed.size) {
      val name = s"part-empty-${java.util.UUID.randomUUID().toString.take(8)}" +
        graft.format.StrawFormat.Extension
      val tmp = new Path(dir, s".$name.tmp")
      val os = f.create(tmp, true)
      var ok = false
      try { new graft.format.StrawFileWriter(schema, opts).writeTo(os); ok = true }
      finally {
        os.close()
        if (ok) {
          if (!f.rename(tmp, new Path(dir, name)))
            throw new java.io.IOException(s"strawboat: rename $tmp -> $name failed")
        } else f.delete(tmp, false)
      }
      val st = f.getFileStatus(new Path(dir, name))
      freshAll :+= StrawIO.FileMeta(f.makeQualified(st.getPath).toString,
        st.getModificationTime, st.getLen)
    }
    val adds = StrawIO.mapParallel(freshAll)(StrawManifest.entryFor)
    MaintenanceOps.commitSwitchAndVacuum(dir, jobId, adds, removes, op = "delete")

    DeleteResult(
      deletedRows = changed.map(_.matched).sum,
      rewrittenFiles = fresh.size,
      removedFiles = removes.size,
      prunedFiles = pruned,
      falsePositiveFiles = untouched.length)
  }
}
