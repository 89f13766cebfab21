package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.execution.{ColumnarToRowExec, InputAdapter,
  SparkPlan, WholeStageCodegenExec}

import graft.format.WriteOptions

/** Columnar bulk conversion: when the source plan already produces
  * ColumnarBatches (a parquet or strawboat scan), encode the batches
  * straight into strawboat page builders — the ColumnarToRow stage and the
  * per-row UnsafeRow materialization both disappear from the pipeline.
  * Commit/abort/staging are the SAME [[StrawBatchWrite]] machinery the DSv2
  * row path uses (one atomic log commit, truncate semantics, empty-result
  * markers), so the two paths differ only in how bytes reach the page
  * buffers — and emit byte-identical files (spec-pinned).
  *
  * Falls back to the ordinary `df.write.format("strawboat")` row path
  * whenever the plan's columnar output isn't directly reachable (adaptive
  * plans with exchanges, row-producing sources) or options demand row
  * routing (hive partitioning, bucketing, CHECK constraints). Fallback is
  * always correct — this is purely a CPU shortcut. */
object StrawBulkLoad {

  /** The batch-producing subtree feeding the plan's final ColumnarToRow
    * transition, if the whole plan IS just that transition (scan-shaped
    * query: no exchanges, no row-level operators above the scan). */
  private def columnarRoot(p: SparkPlan): Option[SparkPlan] = p match {
    case w: WholeStageCodegenExec => columnarRoot(w.child)
    case i: InputAdapter => columnarRoot(i.child)
    case c: ColumnarToRowExec =>
      val src = c.child match {
        case i: InputAdapter => i.child
        case other => other
      }
      if (src.supportsColumnar) Some(src) else None
    case p if p.supportsColumnar => Some(p)
    case _ => None
  }

  /** Write `df` to `path` (overwrite), columnar when possible. */
  def save(df: DataFrame, path: String,
      opts: WriteOptions = WriteOptions()): Unit = {
    val needsRowPath = opts.bucketBy.isDefined
    val root = if (needsRowPath) None else columnarRoot(df.queryExecution.executedPlan)
    root match {
      case None =>
        df.write.format("strawboat").mode("overwrite").save(path)
      case Some(plan) =>
        val spark = df.sparkSession
        val schema = df.schema
        val bw = new StrawBatchWrite(path, schema, truncate = true, opts)
        val jobId = bw.stagingJobId
        val serConf = new org.apache.spark.util.SerializableConfiguration(StrawIO.conf)
        val messages: Array[WriterCommitMessage] =
          try plan.executeColumnar().mapPartitionsWithIndex { (pid, it) =>
            StrawIO.install(serConf.value)
            val w = new StrawDataWriter(path, schema, pid,
              org.apache.spark.TaskContext.get().taskAttemptId(), opts, jobId)
            var ok = false
            try {
              it.foreach(w.writeBatch)
              val m = w.commit()
              ok = true
              Iterator.single(m: WriterCommitMessage)
            } finally if (!ok) w.abort()
          }.collect()
          catch {
            case e: Throwable =>
              try bw.abort(Array.empty)
              catch { case scala.util.control.NonFatal(s) => e.addSuppressed(s) }
              throw e
          }
        bw.commit(messages)
        spark: Unit
    }
  }
}
