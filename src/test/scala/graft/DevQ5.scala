package graft

import org.apache.spark.sql.SparkSession

/** Dev harness (test scope): A/B q_tpch_q5 under CBO config variations in
  * one JVM. Usage: sbt "Test/runMain graft.DevQ5 <sfDir>" */
object DevQ5 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries("q_tpch_q5")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def run(label: String, conf: Map[String, String]): Unit = {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      once() // warm
      val times = Seq.fill(4)(once())
      println(f"Q5AB $label%-28s min=${times.min}%.3f med=${times.sorted.apply(1)}%.3f")
      conf.keys.foreach(spark.conf.unset)
    }
    run("cbo_off", Map("spark.sql.cbo.enabled" -> "false"))
    run("cbo_on_reorder_on", Map(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true"))
    run("cbo_on_reorder_off", Map("spark.sql.cbo.enabled" -> "true"))
    run("cbo_on_star", Map(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.cbo.starSchemaDetection" -> "true"))
    run("cbo_on_cardweight1", Map(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.cbo.joinReorder.card.weight" -> "1.0"))
    spark.stop()
  }
}
