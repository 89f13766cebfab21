import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

object DriveS {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("strawstreamf").toString
    // hive-partitioned source: cat=a / cat=b
    spark.range(10000).select((col("id") % 2 === 0).cast("string").as("flag"),
      col("id"), when(col("id") % 2 === 0, "a").otherwise("b").as("cat"))
      .write.format("strawboat").option("partitionBy", "cat")
      .mode("overwrite").save(dir)
    println("DIRS " + new java.io.File(dir).listFiles().map(_.getName).toSeq)

    def run(filtered: Boolean): Long = {
      val src = spark.readStream.format("strawboat").load(dir)
      val q = (if (filtered) src.filter(col("cat") === "a") else src)
        .groupBy().count()
      val out = q.writeStream.format("memory")
        .queryName(s"q_${filtered}_${System.nanoTime()}")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ck").toString)
        .start()
      out.awaitTermination()
      val rows = out.recentProgress.map(_.numInputRows).sum
      rows
    }
    val all = run(false)
    val filt = run(true)
    println(s"RESULT unfiltered=$all filtered=$filt pruned=${filt < all}")
    spark.stop()
  }
}
