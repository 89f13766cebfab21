package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (test scope): scale-stress drill. Builds a many-file big
  * table (N appends of sf0.1 lineitem, each fragmented into F files) and
  * measures the driver-side planning path the sf0.1 bench can't see:
  * schema inference, split planning, statistics + CBO column-stats sweep,
  * log replay, footer-cache behavior — then a few headline query shapes
  * for linear-scaling sanity.
  * Usage: sbt "Test/runMain graft.DevScale [appends] [filesPerAppend]" */
object DevScale {
  def main(args: Array[String]): Unit = {
    val appends = args.headOption.map(_.toInt).getOrElse(64)
    val filesPer = args.drop(1).headOption.map(_.toInt).getOrElse(48)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = "/root/repo/target/devscale/lineitem_big"
    val marker = new java.io.File(dir, "_BUILT_" + appends + "_" + filesPer)
    def time(body: => Any): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    if (!marker.exists()) {
      val root = new java.io.File("/root/repo/target/devscale")
      if (root.exists()) {
        val w = java.nio.file.Files.walk(root.toPath)
        try w.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally w.close()
      }
      val src = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .repartition(filesPer)
      src.persist()
      src.count()
      val tBuild = time {
        var i = 0
        while (i < appends) {
          src.write.format("strawboat")
            .mode(if (i == 0) "overwrite" else "append").save(dir)
          i += 1
        }
      }
      src.unpersist()
      println(f"SCALE build sec=$tBuild%.1f")
      marker.createNewFile()
    }
    val nFiles = graft.spark.StrawIO.listFiles(dir).size
    val logDir = new java.io.File(dir, "_straw_log")
    val nLog = if (logDir.exists()) logDir.listFiles().length else 0
    println(s"SCALE files=$nFiles logEntries=$nLog")

    // ---- driver-side planning costs -------------------------------------
    def freshRead = spark.read.format("strawboat").load(dir)
    def loads: Long = graft.spark.FooterCache.loads.get
    var l0 = loads
    def loadDelta(): Long = { val d = loads - l0; l0 = loads; d }
    // 1. schema inference (includes log replay + snapshot resolution)
    val tInferCold = time(freshRead.schema)
    val tInferWarm = time(freshRead.schema)
    println(f"SCALE infer cold=$tInferCold%.3f warm=$tInferWarm%.3f footerloads=${loadDelta()}")
    // 2a. split planning WITHOUT CBO (the plain read path)
    spark.conf.set("spark.sql.cbo.enabled", "false")
    val dfNoCbo = freshRead
    val tSplitNoCbo = time(dfNoCbo.queryExecution.toRdd.getNumPartitions)
    println(f"SCALE split_nocbo sec=$tSplitNoCbo%.3f partitions=${dfNoCbo.queryExecution.toRdd.getNumPartitions} footerloads=${loadDelta()}")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    // 2b. statistics estimation (sizeInBytes sweep; CBO col-stats sweep)
    val df = freshRead
    val tStats = time(df.queryExecution.optimizedPlan.stats)
    val tStats2 = time(freshRead.queryExecution.optimizedPlan.stats)
    println(f"SCALE stats cold=$tStats%.3f warm=$tStats2%.3f footerloads=${loadDelta()}")
    // 3. split planning (partition computation over all files)
    val tSplit = time(df.queryExecution.toRdd.getNumPartitions)
    println(f"SCALE split sec=$tSplit%.3f partitions=${df.queryExecution.toRdd.getNumPartitions} footerloads=${loadDelta()}")
    // 4. filtered planning: zone-map sweep across every footer
    val filt = freshRead.filter(col("l_quantity") < lit(2.0))
    val tFiltPlan = time(filt.queryExecution.toRdd.getNumPartitions)
    println(f"SCALE filterplan sec=$tFiltPlan%.3f footerloads=${loadDelta()}")

    // ---- execution shapes ------------------------------------------------
    def bench(label: String)(body: => Any): Unit = {
      body // warm
      val times = Seq.tabulate(3)(_ => time(body))
      println(f"SCALE $label%-18s min=${times.min}%.3f med=${times.sorted.apply(1)}%.3f")
    }
    bench("count_meta")(freshRead.count())
    bench("q6") {
      freshRead
        .filter(col("l_shipdate") >= lit(java.time.LocalDateTime.of(1996, 1, 1, 0, 0)) &&
          col("l_shipdate") < lit(java.time.LocalDateTime.of(1997, 1, 1, 0, 0)) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
        .write.format("noop").mode("overwrite").save()
    }
    bench("agg_groupby") {
      freshRead.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sq"), avg("l_extendedprice").as("ae"))
        .write.format("noop").mode("overwrite").save()
    }
    bench("point_filter") {
      freshRead.filter(col("l_orderkey") === 1L)
        .write.format("noop").mode("overwrite").save()
    }
    // footer cache footprint after everything
    println("SCALE footercache size=" + graft.spark.FooterCache.size +
      " loads=" + graft.spark.FooterCache.loads.get)
    spark.stop()
  }
}
