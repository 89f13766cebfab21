package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement (test scope): the multimodal AUDIO path at scale —
  * `DevImgScale`'s sibling (that drill caught imageio's file-backed
  * stream cache collapsing under concurrency; this one checks
  * javax.sound's WAV reader for the same class of hidden per-payload
  * cost). Synthesizes n PCM WAVs + 2% planted junk, stores through
  * strawboat binary pages, times header parse (codegen'd kernel) vs the
  * full sample decode (frames/duration/RMS).
  * Usage: sbt "Test/runMain graft.DevAudioScale [nClips]" */
object DevAudioScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = "/root/repo/target/devaudioscale"
    val root = new java.io.File(tmp)
    if (root.exists()) {
      val w = java.nio.file.Files.walk(root.toPath)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally w.close()
    }
    def time(body: => Any): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val docs = spark.range(n).select(col("id").as("doc_id"))
    val clips = graft.ops.Multimodal.asAudio(docs)
      .withColumn("payload",
        when(col("doc_id") % 50 === 7, lit("RIFFjunk".getBytes("UTF-8")))
          .otherwise(col("payload")))
    val tGen = time {
      clips.repartition(32).write.format("strawboat").mode("overwrite")
        .save(s"$tmp/clips")
    }
    val stored = spark.read.format("strawboat").load(s"$tmp/clips")
    val bytes = new java.io.File(s"$tmp/clips").listFiles()
      .filter(_.getName.endsWith(".strb")).map(_.length).sum
    println(f"GEN    $n%,d wavs synthesized+stored in $tGen%.1f s " +
      f"(${bytes / 1e6}%.0f MB on disk)")

    var parsed = 0L
    val tMeta = time {
      parsed = graft.ops.Multimodal.audioMeta(spark, stored)
        .filter(col("format").isNotNull).count()
    }
    println(f"META   $parsed%,d headers parsed in $tMeta%.1f s " +
      f"(${n / tMeta / 1000}%.0f K clips/s, codegen'd kernel)")

    var decoded = 0L; var nulls = 0L
    val tDec = time {
      val r = graft.ops.Multimodal.decodeAudioFeatures(stored)
        .agg(count(col("frames")), sum(when(col("frames").isNull, 1L).otherwise(0L)))
        .collect()(0)
      decoded = r.getLong(0); nulls = r.getLong(1)
    }
    println(f"DECODE $decoded%,d ok + $nulls%,d quarantined in $tDec%.1f s " +
      f"(${n / tDec / 1000}%.0f K clips/s, full PCM sample pass)")
    require(nulls == (0L until n).count(_ % 50 == 7),
      s"quarantine count $nulls != planted")
    spark.stop()
  }
}
