package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the conversion/write path: times each table's
  * parquet→strawboat conversion separately (cold, then warm repeat) so
  * fixed per-write overhead is visible apart from data volume. Not part
  * of the driver contract. */
object DevProfileWrite {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // warm codegen/JIT once on a tiny table
    Tables.invalidate(sfDir)
    Tables.strawDir(spark, sfDir, "region")

    for (round <- 1 to 2) {
      Tables.invalidate(sfDir)
      val times = tables.map { t =>
        t -> time(Tables.strawDir(spark, sfDir, t))
      }
      println(s"== round $round sequential: " + times.map { case (t, s) =>
        f"$t=$s%.2f" }.mkString(" ") + f" total=${times.map(_._2).sum}%.2f")
    }
    // concurrent, like Bench
    Tables.invalidate(sfDir)
    val conc = time {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext = ExecutionContext.global
      Await.result(
        Future.sequence(tables.map(t => Future(Tables.strawDir(spark, sfDir, t)))),
        10.minutes): Unit
    }
    println(f"== concurrent total=$conc%.2f")
    spark.stop()
  }
}
