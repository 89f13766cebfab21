package graft

import org.apache.spark.sql.SparkSession

/** Dev harness (test scope): where does the lineitem conversion wall go —
  * the parquet read (columnar decode) or the strawboat encode? Times the
  * read alone (noop sink over the same columnar plan) against the full
  * bulk load. Usage: sbt "Test/runMain graft.DevConvSplit [sfDir]" */
object DevConvSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val tmp = java.nio.file.Files.createTempDirectory("devsplit").toString
    for (t <- Seq("lineitem", "orders", "events")) {
      def src = spark.read.parquet(s"$sfDir/$t.parquet")
      src.write.format("noop").mode("overwrite").save() // warm
      graft.spark.StrawBulkLoad.save(src, s"$tmp/w_$t")  // warm
      val read = Seq.fill(3)(time(
        src.write.format("noop").mode("overwrite").save())).min
      val conv = Seq.fill(3)(time(
        graft.spark.StrawBulkLoad.save(src, s"$tmp/c_$t"))).min
      println(f"SPLIT $t%-10s read=$read%.3f convert=$conv%.3f encode~=${conv - read}%.3f")
    }
    spark.stop()
  }
}
