package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (test scope): time hive-partitioned conversion, row path vs
  * columnar bulk load, clustered and unclustered input.
  * Usage: sbt "Test/runMain graft.DevPartLoad <sfDir>" */
object DevPartLoad {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("devpart").toString

    // clustered parquet source: events sorted by event_type (the shape a
    // date-partitioned raw feed has naturally)
    spark.read.parquet(s"$sfDir/events.parquet")
      .sort("event_type").write.parquet(s"$tmp/src")
    val src = spark.read.parquet(s"$tmp/src")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def bench(label: String)(body: String => Unit): Unit = {
      body(s"$tmp/warm_$label") // warm
      val times = Seq.tabulate(3)(i => time(body(s"$tmp/out_${label}_$i")))
      println(f"PARTLOAD $label%-16s min=${times.min}%.3f med=${times.sorted.apply(1)}%.3f")
    }
    bench("row") { out =>
      src.write.format("strawboat").option("partitionBy", "event_type")
        .mode("overwrite").save(out)
    }
    bench("columnar") { out =>
      graft.spark.StrawBulkLoad.save(src, out, partitionCols = Seq("event_type"))
    }
    // parity: same rows
    val a = spark.read.format("strawboat").load(s"$tmp/out_row_0").count()
    val b = spark.read.format("strawboat").load(s"$tmp/out_columnar_0").count()
    println(s"PARTLOAD rows row=$a columnar=$b equal=${a == b}")
    spark.stop()
  }
}
