package graft.spark

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

import graft.format.StrawFileReader

/** Structured Streaming over the strawboat format.
  *
  * Read side: a micro-batch file stream — each trigger picks up `.strb`
  * files not yet committed, ordered by (modificationTime, path). The offset
  * is the sorted list of seen files (fine for the file counts a test/demo
  * touches; a production deployment would compact into a metadata log like
  * FileStreamSource's).
  *
  * Write side: per-epoch rolling files via the same [[StrawDataWriter]] as
  * batch — exactly-once relies on downstream dedup of epoch-suffixed files.
  */
object StrawOffset {
  def toJson(files: Seq[String]): String =
    files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")

  def fromJson(json: String): Seq[String] = {
    // minimal JSON string-array parser (offsets are written by toJson only)
    val s = json.trim
    require(s.startsWith("[") && s.endsWith("]"), s"bad offset json: $s")
    val body = s.substring(1, s.length - 1).trim
    if (body.isEmpty) Seq.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var inStr = false
      var escape = false
      body.foreach { c =>
        if (escape) { sb.append(c); escape = false }
        else if (c == '\\') escape = true
        else if (c == '"') { if (inStr) { out += sb.toString; sb.clear() }; inStr = !inStr }
        else if (inStr) sb.append(c)
      }
      out.toSeq
    }
  }
}

case class StrawStreamOffset(files: Seq[String]) extends Offset {
  override def json(): String = StrawOffset.toJson(files)
}

class StrawMicroBatchStream(path: String, fullSchema: StructType,
    requiredSchema: StructType, maxFilesPerTrigger: Option[Int] = None)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow: snapshot the file set once; subsequent capped
  // micro-batches drain exactly this backlog, then the query stops
  @volatile private var availableNowSnapshot: Option[Seq[String]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowSnapshot = Some(currentFiles())
  override def reportLatestOffset(): Offset =
    StrawStreamOffset(availableNowSnapshot.getOrElse(currentFiles()))

  private def currentFiles(): Seq[String] = {
    val fs = StrawIO.fs(path)
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isFile)
      .filter(_.getPath.getName.endsWith(graft.format.StrawFormat.Extension))
      .sortBy(st => (st.getModificationTime, st.getPath.toString))
      .map(_.getPath.toString).toSeq
  }

  override def initialOffset(): Offset = StrawStreamOffset(Seq.empty)
  override def latestOffset(): Offset = StrawStreamOffset(currentFiles())

  // backpressure: cap the files admitted per micro-batch
  // (.option("maxFilesPerTrigger", n) on the stream reader)
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val seenFiles = start.asInstanceOf[StrawStreamOffset].files
    val seen = seenFiles.toSet
    val visible = availableNowSnapshot.getOrElse(currentFiles())
    val fresh = visible.filterNot(seen)
    val admitted = limit match {
      case mf: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        fresh.take(mf.maxFiles())
      case _ => fresh
    }
    StrawStreamOffset(seenFiles ++ admitted)
  }

  override def deserializeOffset(json: String): Offset =
    StrawStreamOffset(StrawOffset.fromJson(json))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[StrawStreamOffset].files.toSet
    val fresh = end.asInstanceOf[StrawStreamOffset].files.filterNot(seen)
    fresh.flatMap { file =>
      val footer = StrawIO.withInput(file)(StrawFileReader.readFooter)
      if (footer.columns.isEmpty) Nil
      else Seq(StrawInputPartition(file, 0, footer.columns(0).pages.length, Long.MaxValue))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StrawPartitionReaderFactory(fullSchema, requiredSchema)
}

case class StrawStreamingWriterFactory(path: String, schema: StructType, opts: graft.format.WriteOptions)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new StrawDataWriter(path, schema, partitionId, taskId + epochId * 100000L, opts)
}

class StrawStreamingWrite(path: String, schema: StructType,
    opts: graft.format.WriteOptions) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    StrawStreamingWriterFactory(path, schema, opts)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val f = StrawIO.fs(path)
    messages.foreach {
      case StrawCommitMessage(fs) =>
        fs.foreach(x => f.delete(new org.apache.hadoop.fs.Path(x), false))
      case _ =>
    }
  }
}
