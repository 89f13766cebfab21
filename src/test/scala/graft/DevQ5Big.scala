package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement (test scope): the TPC-H Q5 bushy-reorder CROSSOVER
  * (VERDICT r12 #1 / r13 #2). At sf0.1 the CBO's DP join reorder loses to
  * the naive left-deep plan — its bushy shape (region⋈nation⋈supplier
  * semi-reduces lineitem BEFORE the fact-fact shuffle) carries fixed
  * overheads 600k rows can't amortize. This drill scales lineitem+orders
  * K× with REMAPPED order keys (join cardinality scales linearly — a true
  * larger-SF join graph, dims unchanged) and A/Bs q_tpch_q5 under the CBO
  * variants to find where the scale-correct plan starts winning.
  * Usage: sbt "Test/runMain graft.DevQ5Big [K]"   (K=64 -> 38.4M lineitem;
  * K=100 -> 60M) */
object DevQ5Big {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // synthesize the scaled sfDir: lineitem/orders replicated with shifted
    // order keys (collision-free: sf0.1 keys < 6M, stride 10M), dims as-is
    val sfDir = s"/root/repo/target/devq5big/sfq5x$k"
    val marker = new java.io.File(sfDir, "_BUILT")
    if (!marker.exists()) {
      new java.io.File(sfDir).mkdirs()
      val src = "/root/testdata/sf0.1"
      def rep(table: String, key: String): Unit = {
        val base = spark.read.parquet(s"$src/$table.parquet")
        (0 until k).map(i => base.withColumn(key, col(key) + lit(i * 10000000L)))
          .reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$sfDir/$table.parquet")
      }
      rep("lineitem", "l_orderkey")
      rep("orders", "o_orderkey")
      for (t <- Seq("customer", "supplier", "nation", "region"))
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$src/$t.parquet"),
          java.nio.file.Paths.get(s"$sfDir/$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      marker.createNewFile()
    }
    val nLi = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    println(s"Q5BIG K=$k lineitem=$nLi orders=${
      spark.read.parquet(s"$sfDir/orders.parquet").count()}")
    // convert once outside the timings
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(t => Tables.strawDir(spark, sfDir, t))

    def once(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries("q_tpch_q5")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def run(label: String, conf: Map[String, String]): Unit = {
      conf.foreach { case (key, v) => spark.conf.set(key, v) }
      once() // warm
      val times = Seq.fill(4)(once()).sorted
      println(f"Q5BIG $label%-22s min=${times.head}%.3f med=${times(1)}%.3f")
      conf.keys.foreach(key => spark.conf.set(key, "true"))
    }
    run("cbo_off", Map("spark.sql.cbo.enabled" -> "false"))
    run("reorder_off", Map("spark.sql.cbo.joinReorder.enabled" -> "false"))
    run("reorder_on", Map.empty)
    // correctness rider: all three configs agree
    val on = SparkEntry.queries("q_tpch_q5")(spark, sfDir).collect().toSeq
    spark.conf.set("spark.sql.cbo.enabled", "false")
    val off = SparkEntry.queries("q_tpch_q5")(spark, sfDir).collect().toSeq
    spark.conf.set("spark.sql.cbo.enabled", "true")
    require(on == off, s"plans disagree:\n$on\n$off")
    println("Q5BIG results_equal=true")
    spark.stop()
  }
}
