package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev harness (test scope, not shipped): per-query profile for the
  * optimization rounds. For each named bench query, dumps the formatted
  * physical plan to <outDir>/<name>_<tag>.txt and measures one warmed
  * noop-sink run under a listener that counts jobs/stages/tasks and sums
  * task time + shuffle bytes — separating fixed per-job overhead from
  * data-proportional work. Usage:
  *   sbt "Test/runMain graft.DevProfile <sfDir> <outDir> <tag> <query> [query...]"
  * (query "ALL" profiles the whole Bench headline list)
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names: Seq[String] =
      if (args.drop(3).toSeq == Seq("ALL")) {
        // mirror Bench.headline via reflection-free copy: read from Bench
        val f = Bench.getClass.getDeclaredField("headline")
        f.setAccessible(true)
        f.get(Bench).asInstanceOf[Seq[String]]
      } else args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("DEV_CODEGEN_CACHE", "100"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0)
    val gcMs = new AtomicLong(0)
    val shufRead = new AtomicLong(0)
    val shufWrite = new AtomicLong(0)
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet(): Unit
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    println("name,wall_s,jobs,stages,tasks,task_time_s,gc_s,shuf_read_mb,shuf_write_mb")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        if (sys.env.contains("DEV_SPLIT_TIMING"))
          println(f"[split] $name cons=${(t1 - t0) / 1e9}%.3f " +
            f"write=${(t2 - t1) / 1e9}%.3f")
        (t2 - t0) / 1e9
      }
      try {
        // plan dump from a fresh construction (includes any eager sub-jobs)
        val df = fn(spark, sfDir)
        Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        once() // warm-up
        Thread.sleep(400) // let queued listener events drain (dev tool)
        jobs.set(0); stages.set(0); tasks.set(0)
        taskTimeMs.set(0); gcMs.set(0); shufRead.set(0); shufWrite.set(0)
        val w = once()
        Thread.sleep(400)
        println(f"$name,$w%.3f,${jobs.get},${stages.get},${tasks.get}," +
          f"${taskTimeMs.get / 1000.0}%.2f,${gcMs.get / 1000.0}%.2f," +
          f"${shufRead.get / 1048576.0}%.2f,${shufWrite.get / 1048576.0}%.2f")
      } catch {
        case e: Throwable =>
          println(s"$name,ERROR: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString)
      }
    }
    spark.stop()
  }
}
