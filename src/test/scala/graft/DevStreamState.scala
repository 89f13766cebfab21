package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Dev measurement (test scope): streaming-sessionization STATE at scale
  * (VERDICT r12 #6 / r13 #5). Drives `nUsers` users (default 1M) through
  * `nBatches` micro-batches of graft.ops.Sessionize.streamingSessions;
  * every user stays inside the gap the whole run, so the state store holds
  * one open interval per user THROUGHOUT — the worst steady-state shape.
  * A StreamingQueryListener records per-batch latency, state rows, and
  * state memory; PASS = latency and state bytes/user stay flat as batches
  * accumulate (no per-batch growth), then a sentinel drains every session
  * and the emitted count equals nUsers.
  * Usage: sbt "Test/runMain graft.DevStreamState [nUsers] [nBatches]" */
object DevStreamState {
  def main(args: Array[String]): Unit = {
    val nUsers = args.headOption.map(_.toInt).getOrElse(1000000)
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(12)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmp = "/root/repo/target/devstreamstate"
    val root = new java.io.File(tmp)
    if (root.exists()) {
      val w = java.nio.file.Files.walk(root.toPath)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally w.close()
    }
    val data = s"$tmp/events"
    val base = 1704067200000000L // 2024-01-01T00:00Z micros
    // batch b: one event per user at base + b minutes (always inside the
    // 10-minute gap, so every session stays OPEN); one file per batch so
    // maxFilesPerTrigger=1 replays them as distinct micro-batches
    (0 until nBatches).foreach { b =>
      spark.range(nUsers).select(
          (col("id") + lit(b.toLong * nUsers)).as("event_id"),
          timestamp_micros(lit(base + b * 60000000L) + col("id") % 1000).as("ts"),
          col("id").as("user_id"),
          lit(1.25).as("value"))
        .coalesce(1)
        .write.format("strawboat").mode("append").save(data)
    }
    // sentinel far in the future drains all open sessions
    spark.range(1).select(lit(-1L).as("event_id"),
        timestamp_micros(lit(base + 86400L * 1000000L)).as("ts"),
        lit(-1L).as("user_id"), lit(0.0).as("value"))
      .coalesce(1).write.format("strawboat").mode("append").save(data)
    println(s"STATE source built users=$nUsers batches=$nBatches")

    val progress = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long)]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val so = p.stateOperators
        if (so.nonEmpty) {
          val rec = (p.batchId, p.batchDuration,
            so.map(_.numRowsTotal).sum, so.map(_.memoryUsedBytes).sum,
            p.numInputRows)
          progress.synchronized(progress += rec)
          println(f"STATE batch=${rec._1}%3d dur_ms=${rec._2}%6d state_rows=${rec._3}%9d state_mb=${rec._4 / 1e6}%8.1f input=${rec._5}")
        }
      }
    })

    val stream = spark.readStream.format("strawboat")
      .option("maxFilesPerTrigger", 1).load(data)
    val t0 = System.nanoTime()
    val q = graft.ops.Sessionize.streamingSessions(stream,
        "ts", "user_id", "event_id", "value", gapMicros = 10L * 60 * 1000000)
      .writeStream.format("memory").queryName("state_drill")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    require(q.awaitTermination(1800000), "stream drain timed out")
    val wall = (System.nanoTime() - t0) / 1e9
    spark.streams.listListeners.foreach(spark.streams.removeListener)

    val emitted = spark.sql(
      "SELECT count(*), sum(n_events), round(sum(total_value), 2) " +
        "FROM state_drill WHERE user_id >= 0").head()
    println(s"STATE drained sessions=${emitted.getLong(0)} " +
      s"events=${emitted.getLong(1)} total=${emitted.getDouble(2)} " +
      f"wall_s=$wall%.1f")
    require(emitted.getLong(0) == nUsers,
      s"expected $nUsers sessions, got ${emitted.getLong(0)}")
    require(emitted.getLong(1) == nUsers.toLong * nBatches)

    // flatness: compare mean latency of the 2nd quarter vs the last
    // quarter of steady-state batches (skip batch 0 = state build)
    val steady = progress.filter(p => p._1 > 0 && p._3 >= nUsers).toSeq
    if (steady.size >= 4) {
      val q2 = steady.slice(steady.size / 4, steady.size / 2).map(_._2.toDouble)
      val q4 = steady.drop(3 * steady.size / 4).map(_._2.toDouble)
      val growth = (q4.sum / q4.size) / (q2.sum / q2.size)
      val bytesPerUser = steady.last._4.toDouble / nUsers
      println(f"STATE flatness late/early=$growth%.2f bytes/user=$bytesPerUser%.0f")
    }
    spark.stop()
  }
}
