package graft

import org.apache.spark.sql.SparkSession

/** Dev harness (test scope, not shipped): dump named SparkEntry queries to
  * parquet for an ad-hoc DuckDB compare while iterating. Usage:
  *   sbt "Test/runMain graft.DevDump <sfDir> <outDir> <query> [query…]"
  */
object DevDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.cbo.enabled", sys.env.getOrElse("DEV_CBO", "true"))
      .config("spark.sql.cbo.joinReorder.enabled", sys.env.getOrElse("DEV_CBO", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (sys.env.contains("DEV_EXPLAIN")) {
        println(s"=== optimized plan: $n ===")
        println(df.queryExecution.optimizedPlan.treeString)
        println(s"=== physical plan: $n ===")
        println(df.queryExecution.executedPlan.treeString)
      }
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
      println(s"DUMPED $n")
    }
    spark.stop()
  }
}
