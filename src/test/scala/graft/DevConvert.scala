package graft

import org.apache.spark.sql.SparkSession

/** Dev harness (test scope): conversion fan-out experiment — does shrinking
  * the parquet read's split size parallelize the bulk load (no exchange, so
  * the columnar path survives), and does the resulting multi-file table
  * still join fast under bin-packed reads?
  * Usage: sbt "Test/runMain graft.DevConvert [sfDir]" */
object DevConvert {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("devconv").toString
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def convert(label: String, mpb: String): String = {
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
      val out = s"$tmp/li_$label"
      val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val parts = src.rdd.getNumPartitions
      graft.spark.StrawBulkLoad.save(src, out) // warm
      val t = Seq.fill(3)(time(graft.spark.StrawBulkLoad.save(
        spark.read.parquet(s"$sfDir/lineitem.parquet"), out))).min
      val nFiles = graft.spark.StrawIO.listFiles(out).size
      println(f"CONV $label%-8s inputParts=$parts%2d files=$nFiles%2d sec=$t%.3f")
      spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
      out
    }
    val one = convert("128m", "134217728")
    val four = convert("4m", "4194304")
    val two = convert("2m", "2097152")
    // join speed: fragmented table vs single-file (the r9 regression check)
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.format("strawboat").mode("overwrite").save(s"$tmp/ord")
    def joinT(dir: String): Double = {
      def q = spark.read.format("strawboat").load(dir)
        .join(spark.read.format("strawboat").load(s"$tmp/ord"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_extendedprice"))
      q.write.format("noop").mode("overwrite").save()
      Seq.fill(3)(time(q.write.format("noop").mode("overwrite").save())).min
    }
    println(f"CONV join 1file=${joinT(one)}%.3f 4m=${joinT(four)}%.3f 2m=${joinT(two)}%.3f")
    spark.stop()
  }
}
