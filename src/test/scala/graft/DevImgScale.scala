package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement (test scope): the multimodal image path at scale —
  * synthesize n PNGs (the generator's dimension formula), store through
  * strawboat binary pages, then time the REAL pixel decode
  * (`decodeImageFeatures`) and the decode→resample→re-encode loop
  * (`resizeImages`) over the stored column. What this proves: the
  * mapPartitions decode amortizes codec setup per task (throughput, not
  * per-image latency), corrupt payloads quarantine without failing the
  * job, and binary-page scan throughput carries media-sized blobs.
  * Usage: sbt "Test/runMain graft.DevImgScale [nImages]" */
object DevImgScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = "/root/repo/target/devimgscale"
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

    // 2% corrupt payloads planted: web-scale corpora always carry junk
    val docs = spark.range(n).select(col("id").as("doc_id"))
    val imgs = graft.ops.Multimodal.asImages(docs)
      .withColumn("payload",
        when(col("doc_id") % 50 === 7, lit("not a png".getBytes("UTF-8")))
          .otherwise(col("payload")))
    val tGen = time {
      imgs.repartition(32).write.format("strawboat").mode("overwrite")
        .save(s"$tmp/images")
    }
    val stored = spark.read.format("strawboat").load(s"$tmp/images")
    val bytes = new java.io.File(s"$tmp/images").listFiles()
      .filter(_.getName.endsWith(".strb")).map(_.length).sum
    println(f"GEN    $n%,d pngs synthesized+encoded+stored in $tGen%.1f s " +
      f"(${bytes / 1e6}%.0f MB on disk)")

    var decoded = 0L; var nulls = 0L
    val tDec = time {
      val r = graft.ops.Multimodal.decodeImageFeatures(stored)
        .agg(count(col("width")), sum(when(col("width").isNull, 1L).otherwise(0L)))
        .collect()(0)
      decoded = r.getLong(0); nulls = r.getLong(1)
    }
    println(f"DECODE $decoded%,d ok + $nulls%,d quarantined in $tDec%.1f s " +
      f"(${n / tDec / 1000}%.0f K imgs/s)")
    require(nulls == (0L until n).count(_ % 50 == 7),
      s"quarantine count $nulls != planted")

    var resized = 0L
    val tRes = time {
      resized = graft.ops.Multimodal.imageMeta(spark,
          graft.ops.Multimodal.resizeImages(stored, 12))
        .filter(col("width") === 12).count()
    }
    println(f"RESIZE $resized%,d thumbnails (decode+bilinear+re-encode+" +
      f"re-parse) in $tRes%.1f s (${n / tRes / 1000}%.0f K imgs/s)")
    spark.stop()
  }
}
