package graft

import org.apache.spark.sql.SparkSession

/** Dev harness (test scope): per-table conversion timing in the exact
  * Bench convert_write shape (concurrent futures over all ten tables, same
  * invalidate-first policy), so the wall-clock's critical path is
  * attributable. Usage: sbt "Test/runMain graft.DevConvertAll [sfDir]" */
object DevConvertAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // same warm-up as Bench
    Tables.invalidate(sfDir)
    Tables.strawDir(spark, sfDir, "region")
    spark.read.format("strawboat").load(Tables.strawDir(spark, sfDir, "region"))
      .write.format("noop").mode("overwrite").save()
    for (round <- 1 to 2) {
      Tables.invalidate(sfDir)
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext = ExecutionContext.global
      val per = new java.util.concurrent.ConcurrentHashMap[String, Double]()
      val total = time {
        Await.result(Future.sequence(tables.map(t => Future {
          per.put(t, time(Tables.strawDir(spark, sfDir, t)))
        })), 10.minutes): Unit
      }
      println(f"CONVALL round $round total=$total%.3f " +
        tables.map(t => f"$t=${per.get(t)}%.2f").mkString(" "))
    }
    spark.stop()
  }
}
