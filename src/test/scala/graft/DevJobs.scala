package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Dev harness (test scope): per-job trace for one bench query — job id,
  * task count, and the callsite/description Spark recorded, so the fixed
  * per-probe job overhead is attributable line by line.
  * Usage: sbt "Test/runMain graft.DevJobs <sfDir> <query> [query...]" */
object DevJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var trace = false
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (trace) {
        val nTasks = e.stageInfos.map(_.numTasks).sum
        val names = e.stageInfos.map(si =>
          s"[${si.numTasks}t: " + si.rddInfos.map(_.name).mkString(",") + "]")
          .mkString(" | ")
        lines.add(f"  job ${e.jobId}%3d stages=${e.stageIds.size} tasks=$nTasks%3d  $names")
      }
    })
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          if (trace) plans.add(qe.executedPlan.toString)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      Thread.sleep(500)
      trace = true
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      Thread.sleep(500)
      trace = false
      println(s"=== $name")
      lines.forEach(l => println(l))
      lines.clear()
      if (sys.env.contains("DEV_FINAL_PLANS"))
        plans.forEach(p => println("---- executed plan ----\n" + p))
      plans.clear()
    }
    spark.stop()
  }
}
