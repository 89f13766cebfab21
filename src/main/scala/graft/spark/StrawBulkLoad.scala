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
  * Hive-partitioned loads ride the columnar path too: the writer
  * dispatches maximal runs of rows sharing a partition key into that
  * partition's page builders, so input clustered by the partition columns
  * (the normal conversion shape) keeps full batch speed and unclustered
  * input merely degrades to shorter runs.
  *
  * Hash-bucketed loads route each batch by ONE pass over its row cursor
  * (only the key columns are touched) into per-bucket selection vectors;
  * each bucket's positions then gather-append columnar into its page
  * builders. A task holds up to `buckets` open page-buffer sets per live
  * partition value — the same fan-out the unordered row path carries.
  *
  * Falls back to the ordinary `df.write.format("strawboat")` row path
  * whenever the plan's columnar output isn't directly reachable (adaptive
  * plans with exchanges, row-producing sources); the fallback carries the
  * full WriteOptions through [[StrawWriteOptions.unparse]], so both paths
  * write the same layout. Fallback is always correct — the columnar route
  * is purely a CPU shortcut. */
object StrawBulkLoad {

  /** Columnar-path engagements (driver-side), pinned by specs so a routing
    * regression — a shape silently falling back to rows — is loud. */
  private[graft] val columnarLoads = new java.util.concurrent.atomic.AtomicLong

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

  /** Write `df` to `path` (overwrite), columnar when possible. With
    * `partitionCols`, the output lands in hive `col=value/` directories —
    * same layout, validation, and commit as the DSv2 `partitionBy` option. */
  def save(df: DataFrame, path: String,
      opts: WriteOptions = WriteOptions(),
      partitionCols: Seq[String] = Seq.empty): Unit = {
    require(partitionCols.distinct.size == partitionCols.size,
      s"strawboat: partitionBy lists a column twice: ${partitionCols.mkString(",")}")
    partitionCols.foreach { c =>
      val fld = df.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"strawboat: partitionBy column '$c' not in schema ${df.schema.fieldNames.mkString(",")}"))
      require(StrawKeyedPartition.parseable(fld.dataType),
        s"strawboat: partitionBy column '$c' has unsupported type ${fld.dataType} " +
          "(supported: string, int, long, short, byte, boolean)")
    }
    opts.bucketBy.toSeq.flatMap(StrawBucket.colsOf).foreach { c =>
      val fld = df.schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"strawboat: bucketBy column '$c' not in schema ${df.schema.fieldNames.mkString(",")}"))
      require(StrawBucket.bucketable(fld.dataType),
        s"strawboat: bucketBy column '$c' has unbucketable type ${fld.dataType}")
      require(!partitionCols.exists(_.equalsIgnoreCase(c)),
        s"strawboat: '$c' cannot be both a partition and a bucket column")
    }
    val root = columnarRoot(df.queryExecution.executedPlan)
    root match {
      case None =>
        val w = df.write.format("strawboat").mode("overwrite")
          .options(StrawWriteOptions.unparse(opts))
        (if (partitionCols.isEmpty) w
         else w.option("partitionBy", partitionCols.mkString(","))).save(path)
      case Some(plan) =>
        columnarLoads.incrementAndGet()
        val spark = df.sparkSession
        val schema = df.schema
        val bw = new StrawBatchWrite(path, schema, truncate = true, opts, partitionCols)
        val jobId = bw.stagingJobId
        val serConf = new org.apache.spark.util.SerializableConfiguration(StrawIO.conf)
        val messages: Array[WriterCommitMessage] =
          try plan.executeColumnar().mapPartitionsWithIndex { (pid, it) =>
            StrawIO.install(serConf.value)
            val w = new StrawDataWriter(path, schema, pid,
              org.apache.spark.TaskContext.get().taskAttemptId(), opts, jobId,
              partitionCols)
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
