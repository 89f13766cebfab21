package graft

import org.apache.spark.sql.SparkSession

/** Dev measurement: bucketed conversion through the columnar bulk loader
  * vs the row path (same input, same single-pass shape). Run with
  * `sbt "Test/runMain graft.DevBucketConvert"`. */
object DevBucketConvert {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("dev-bucket-convert")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("bconv").toString
    val src = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val opts = graft.format.WriteOptions(bucketBy = Some("l_orderkey"), buckets = 16)

    // row path: DSv2 write with clustering suppressed (same no-shuffle shape
    // as the bulk loader) — warm once, then min-of-3
    def rowOnce(i: Int): Double = time {
      src.write.format("strawboat")
        .option("bucketBy", "l_orderkey").option("buckets", "16")
        .option("distribute", "none")
        .mode("overwrite").save(s"$tmp/row$i")
    }
    def colOnce(i: Int): Double = time {
      graft.spark.StrawBulkLoad.save(src, s"$tmp/col$i", opts)
    }
    rowOnce(0); colOnce(0) // warm
    val row = Seq(rowOnce(1), rowOnce(2), rowOnce(3)).min
    val col = Seq(colOnce(1), colOnce(2), colOnce(3)).min
    println(f"DEV|bucketed_row_s|$row%.3f")
    println(f"DEV|bucketed_columnar_s|$col%.3f")
    println(f"DEV|speedup|${row / col}%.2f")
    val a = spark.read.format("strawboat").load(s"$tmp/row1").count()
    val b = spark.read.format("strawboat").load(s"$tmp/col1").count()
    println(s"DEV|counts|$a=$b")
    spark.stop()
  }
}
