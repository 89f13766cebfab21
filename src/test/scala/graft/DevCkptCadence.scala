package graft

import org.apache.spark.sql.SparkSession

/** Dev harness (test scope): the checkpoint-cadence A/B the r14 drill
  * extrapolated but never ran (VERDICT r14 #3). For each
  * `spark.straw.log.checkpointInterval` under test, builds a fresh table
  * with a real-stats entry population (one commit of `baseFiles` lineitem
  * files), then times `micro` tiny appends in chunks — the every-Nth
  * checkpoint serializes O(table entries), so the chunk slope is the
  * interval's cost — and finally the OTHER side of the trade: cold
  * latest-snapshot resolution (replay = anchor checkpoint + tail commits,
  * tail length ~ interval/2 on average, worst case ~interval).
  *
  * Usage: sbt "Test/runMain graft.DevCkptCadence [baseFiles] [micro] [k1,k2,...]"
  */
object DevCkptCadence {
  def main(args: Array[String]): Unit = {
    val baseFiles = args.headOption.map(_.toInt).getOrElse(1536)
    val micro = args.drop(1).headOption.map(_.toInt).getOrElse(1500)
    val intervals = args.drop(2).headOption.map(_.split(',').map(_.toInt).toSeq)
      .getOrElse(Seq(10, 100))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(body: => Any): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val root = new java.io.File("/root/repo/target/devckpt")
    val src = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .repartition(baseFiles)
    src.persist(); src.count()
    val tiny = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .limit(10).coalesce(1)
    tiny.persist(); tiny.count()

    // untimed warm-up arm: JIT/classload the whole commit path so the first
    // TIMED arm isn't inflated relative to the second (the first run of
    // this drill showed exactly that skew)
    locally {
      val wdir = s"$root/warmup"
      val d = new java.io.File(wdir)
      if (d.exists()) {
        val w = java.nio.file.Files.walk(d.toPath)
        try w.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally w.close()
      }
      tiny.write.format("strawboat").mode("overwrite").save(wdir)
      (0 until 60).foreach(_ =>
        tiny.write.format("strawboat").mode("append").save(wdir))
      graft.spark.StrawLog.clearCache()
      graft.spark.StrawLog.snapshot(wdir)
      println("CKPT warmup done")
    }

    intervals.foreach { k =>
      val dir = s"$root/t_i$k"
      val d = new java.io.File(dir)
      if (d.exists()) {
        val w = java.nio.file.Files.walk(d.toPath)
        try w.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally w.close()
      }
      spark.conf.set(graft.spark.StrawLog.CheckpointIntervalConf, k.toString)
      try {
        val tBuild = time {
          src.write.format("strawboat").mode("overwrite").save(dir)
        }
        println(f"CKPT k=$k base build files=$baseFiles sec=$tBuild%.1f")
        var i = 0
        var tChunk = System.nanoTime()
        val chunk = 250
        while (i < micro) {
          tiny.write.format("strawboat").mode("append").save(dir)
          i += 1
          if (i % chunk == 0) {
            val now = System.nanoTime()
            println(f"CKPT k=$k append $i/$micro chunk_s=${(now - tChunk) / 1e9}%.1f " +
              f"(${(now - tChunk) / 1e6 / chunk}%.0f ms/commit)")
            tChunk = now
          }
        }
        // cold resolution: the replay tail is (latest − anchor checkpoint),
        // up to k−1 commits — the cost the longer cadence trades for its
        // cheaper commits. Cold = snapshot cache dropped; the log files'
        // page cache stays warm for both arms (equally).
        val colds = Seq.tabulate(5) { _ =>
          graft.spark.StrawLog.clearCache()
          time(graft.spark.StrawLog.snapshot(dir).get)
        }
        println(f"CKPT k=$k cold_resolve min=${colds.min}%.3f " +
          f"med=${colds.sorted.apply(2)}%.3f max=${colds.max}%.3f " +
          s"logFiles=${new java.io.File(dir, "_straw_log").listFiles().length}")
      } finally spark.conf.unset(graft.spark.StrawLog.CheckpointIntervalConf)
    }
    src.unpersist(); tiny.unpersist()
    spark.stop()
  }
}
