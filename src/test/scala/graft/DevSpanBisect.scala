package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev bisect harness for duplicateSpans variants (test scope, not shipped):
  * measures wall + summed task time for each variant over the sf0.1
  * documents table. Usage: sbt "Test/runMain graft.DevSpanBisect <sfDir>"
  */
object DevSpanBisect {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("DEV_CODEGEN_CACHE", "100"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0)
    val perStage = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null) {
            taskTime.addAndGet(e.taskMetrics.executorRunTime)
            perStage.merge(e.stageId, (1, e.taskMetrics.executorRunTime),
              (a, b) => (a._1 + b._1, a._2 + b._2)): Unit
          }
      })
    val docs = spark.read.format("strawboat")
      .load(Tables.strawDir(spark, sfDir, "documents"))

    val n = 8
    def islands(hits: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("span_start"))
      hits
        .withColumn("__new",
          when(col("span_start") <=
            coalesce(lag(col("span_start"), 1).over(w), lit(Long.MinValue / 2))
              + n, lit(0)).otherwise(lit(1)))
        .withColumn("__island", sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("__island"))
        .agg(min(col("span_start")).cast("long").as("span_start"),
          (max(col("span_start")) + n).cast("long").as("span_end"))
        .select(col("doc_id"), col("span_start"), col("span_end"))
    }
    def build(fan: Boolean, key: String): DataFrame = {
      val base0 = docs.select(col("doc_id"), col("text").as("__txt"))
      val base = if (fan) base0.repartition(32, col("doc_id")) else base0
      val toks = base.select(col("doc_id"),
        filter(split(lower(col("__txt")), "\\s+"), t => t =!= lit("")).as("__t"))
      val exploded = toks
        .filter(size(col("__t")) >= n)
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(0), size(col("__t")) - n),
          i => concat_ws(" ", slice(col("__t"), i + 1, lit(n)))))
          .as(Seq("span_start", "__s")))
      val grams = key match {
        case "md5" => exploded.select(col("doc_id"), col("span_start"),
          md5(col("__s")).as("__g"))
        case "xx2" => exploded.select(col("doc_id"), col("span_start"),
          struct(xxhash64(col("__s")).as("h1"),
            xxhash64(col("__s"), lit(1)).as("h2")).as("__g"))
        case "xx1" => exploded.select(col("doc_id"), col("span_start"),
          xxhash64(col("__s")).as("__g"))
      }
      val dup = grams.select(col("__g"), col("doc_id")).distinct()
        .groupBy(col("__g")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") >= 2).select(col("__g"))
      islands(grams.join(dup, "__g").select(col("doc_id"), col("span_start")))
    }
    def run(label: String, df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      Thread.sleep(300)
      taskTime.set(0); perStage.clear()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[bisect] $label%-20s wall=$wall%.2f task_s=${taskTime.get / 1000.0}%.2f")
      import scala.jdk.CollectionConverters._
      perStage.asScala.toSeq.sortBy(_._1).foreach { case (sid, (n, ms)) =>
        println(f"[bisect]   stage=$sid tasks=$n time=${ms / 1000.0}%.2f")
      }
    }
    sys.env.get("DEV_LOOP") match {
      case Some(v) =>
        val Array(variant, times) = v.split(":")
        (1 to times.toInt).foreach { _ =>
          run(s"loop_$variant", build(fan = true, variant))
        }
      case None =>
        run("nofan_md5", build(fan = false, "md5"))
        run("fan_md5", build(fan = true, "md5"))
        run("nofan_xx2", build(fan = false, "xx2"))
        run("fan_xx2", build(fan = true, "xx2"))
        run("fan_xx1", build(fan = true, "xx1"))
    }
    spark.stop()
  }
}
