package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{LessThan, EqualTo}

/** Dev harness (test scope): mutation-path scale drill (VERDICT r12 #1 /
  * r13 #2). Builds a 38.4M-row / 3,072-file lineitem table, grows the
  * transaction log past 3,000 entries with micro-appends, then times the
  * paths the sf0.1 bench can't see at this shape:
  *   - log replay / schema inference / split planning over a 3,000+ entry
  *     log and ~6,000 files;
  *   - DELETE via deletion vectors across every file (stats pruning +
  *     distributed DV build);
  *   - reads through the DVs;
  *   - distributed MERGE (forced shuffle-join match path) with a
  *     multi-million-row source;
  *   - compaction of the whole fragmented table (+DV materialization),
  *     then the same reads post-compaction.
  * Usage: sbt "Test/runMain graft.DevMutScale [appends] [filesPerAppend] [microAppends]"
  */
object DevMutScale {
  def main(args: Array[String]): Unit = {
    val appends = args.headOption.map(_.toInt).getOrElse(64)
    val filesPer = args.drop(1).headOption.map(_.toInt).getOrElse(48)
    val micro = args.drop(2).headOption.map(_.toInt).getOrElse(3000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(body: => Any): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val dir = "/root/repo/target/devmut/lineitem_big"
    val root = new java.io.File("/root/repo/target/devmut")
    // mutations change the table, so a FULL run starts from a fresh build —
    // but iterating on the later phases can resume a built table (_P2):
    // the delete re-runs as a provable no-op, merge re-applies the same
    // source, compaction is idempotent
    val built = new java.io.File(dir, s"_P2_${appends}_${filesPer}_$micro")
    if (!built.exists()) {
      if (root.exists()) {
        val w = java.nio.file.Files.walk(root.toPath)
        try w.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally w.close()
      }
      val src = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .repartition(filesPer)
      src.persist(); src.count()
      val tBuild = time {
        var i = 0
        while (i < appends) {
          src.write.format("strawboat")
            .mode(if (i == 0) "overwrite" else "append").save(dir)
          i += 1
        }
      }
      src.unpersist()
      println(f"MUT build appends=$appends files/append=$filesPer sec=$tBuild%.1f")

      // ---- grow the log past 3,000 entries with tiny appends ------------
      // per-chunk timings expose any per-commit cost growth as the log
      // lengthens (replay is checkpoint-bounded, so this should stay flat)
      val tiny = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .limit(10).coalesce(1)
      tiny.persist(); tiny.count()
      val tMicro = time {
        var i = 0
        var tChunk = System.nanoTime()
        while (i < micro) {
          tiny.write.format("strawboat").mode("append").save(dir)
          i += 1
          if (i % 500 == 0) {
            val now = System.nanoTime()
            println(f"MUT microappend $i/$micro chunk_s=${(now - tChunk) / 1e9}%.1f")
            tChunk = now
          }
        }
      }
      tiny.unpersist()
      println(f"MUT microappends=$micro total_s=$tMicro%.1f (${micro / tMicro}%.1f/s)")
      built.createNewFile()
    }
    val logDir = new java.io.File(dir, "_straw_log")
    val nLog = if (logDir.exists()) logDir.listFiles().length else 0
    val nFiles = graft.spark.StrawIO.listFiles(dir).size
    println(s"MUT logEntries=$nLog files=$nFiles")

    // ---- planning over the long log --------------------------------------
    def freshRead = spark.read.format("strawboat").load(dir)
    graft.spark.FooterCache.clear()
    val tInfer = time(freshRead.schema)
    val tInferWarm = time(freshRead.schema)
    println(f"MUT infer cold=$tInfer%.3f warm=$tInferWarm%.3f")
    val df0 = freshRead
    val tSplit = time(df0.queryExecution.toRdd.getNumPartitions)
    println(f"MUT split sec=$tSplit%.3f partitions=${df0.queryExecution.toRdd.getNumPartitions}")
    def q6(label: String): Unit = {
      def body = freshRead
        .filter(col("l_shipdate") >= lit(java.time.LocalDateTime.of(1996, 1, 1, 0, 0)) &&
          col("l_shipdate") < lit(java.time.LocalDateTime.of(1997, 1, 1, 0, 0)) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
        .write.format("noop").mode("overwrite").save()
      body // warm
      val ts = Seq.tabulate(3)(_ => time(body))
      println(f"MUT $label%-22s min=${ts.min}%.3f med=${ts.sorted.apply(1)}%.3f")
    }
    val rowsBefore = freshRead.count()
    q6("q6_fragmented")

    // ---- DELETE via deletion vectors across the whole table --------------
    val tDelete = time {
      val res = graft.spark.StrawDelete.delete(spark, dir,
        Seq(LessThan("l_quantity", 2.0)))
      println(s"MUT delete result=$res")
    }
    println(f"MUT delete sec=$tDelete%.1f")
    val rowsAfterDelete = freshRead.count()
    println(s"MUT rows before=$rowsBefore afterDelete=$rowsAfterDelete " +
      s"(deleted ${rowsBefore - rowsAfterDelete})")
    q6("q6_through_dvs")

    // ---- distributed MERGE (forced shuffle-join match path) --------------
    // source: ~2% of keys updated (comment rewritten) + ~0.5% inserts with
    // shifted keys — the backfill shape; the gate forced to 0 so the driver
    // never materializes the source key set. The drill table is 64 copies
    // of the same lineitem, so the source dedups to ONE row per key (SQL
    // MERGE refuses duplicate-source keys as nondeterministic); prior-run
    // inserts (shifted keys) are excluded so a resume stays well-formed.
    // updates marked in l_tax (a sentinel value no generator row carries),
    // inserts recognizable by their shifted keys
    val baseRows = freshRead.filter(col("l_orderkey") < 1000000000L)
    val mergeSrc = baseRows
      .filter(col("l_orderkey") % 50 === 0 && col("l_linenumber") === 1)
      .dropDuplicates("l_orderkey", "l_linenumber")
      .withColumn("l_tax", lit(9.99))
      .unionByName(baseRows
        .filter(col("l_orderkey") % 200 === 0 && col("l_linenumber") === 1)
        .dropDuplicates("l_orderkey", "l_linenumber")
        .withColumn("l_orderkey", col("l_orderkey") + 1000000000L)
        .withColumn("l_tax", lit(9.99)))
    spark.conf.set(graft.spark.StrawMerge.BroadcastKeyBytesConf, "0")
    var mergeRes: graft.spark.StrawMerge.MergeResult = null
    val tMerge = time {
      val res =
        try graft.spark.StrawMerge.merge(spark, dir, mergeSrc,
          keys = Seq("l_orderkey", "l_linenumber"))
        finally spark.conf.unset(graft.spark.StrawMerge.BroadcastKeyBytesConf)
      require(res.distributedSource, s"expected distributed path: $res")
      mergeRes = res
      println(s"MUT merge result=$res")
    }
    println(f"MUT merge sec=$tMerge%.1f")
    val updated = freshRead.filter(
      col("l_tax") === 9.99 && col("l_orderkey") < 1000000000L).count()
    val inserted = freshRead.filter(col("l_orderkey") >= 1000000000L).count()
    println(s"MUT merge verify updated=$updated inserted=$inserted (this run: $mergeRes)")
    q6("q6_post_merge")

    // ---- compaction of the fragmented, DV-carrying table -----------------
    val tCompact = time {
      val res = graft.spark.StrawCompaction.compact(spark, dir)
      println(s"MUT compact result: rewritten=${res}")
    }
    println(f"MUT compact sec=$tCompact%.1f")
    val nFilesAfter = graft.spark.StrawIO.listFiles(dir).size
    val nLogAfter = if (logDir.exists()) logDir.listFiles().length else 0
    println(s"MUT post-compact files=$nFilesAfter logEntries=$nLogAfter")
    // conservation: Replace collapses the drill table's 64 duplicate
    // copies per matched key into ONE replacement row, so
    // rows' = rows − matchedTargetRows + replacedSrcRows + trueInserts
    val rowsAfterCompact = freshRead.count()
    val expect = rowsAfterDelete - mergeRes.matchedRows +
      mergeRes.replacedRows + mergeRes.insertedRows
    require(rowsAfterCompact == expect,
      s"row count drifted: $rowsAfterCompact vs $expect ($mergeRes)")
    graft.spark.FooterCache.clear()
    val tInferPost = time(freshRead.schema)
    val tSplitPost = time(freshRead.queryExecution.toRdd.getNumPartitions)
    println(f"MUT post-compact infer=$tInferPost%.3f split=$tSplitPost%.3f")
    q6("q6_post_compact")

    // ---- what drives per-commit append cost? ------------------------------
    // compaction collapsed the ENTRY count (6k files -> ~35) but the log
    // DIRECTORY still holds 3k+ commit files; vacuumLog then collapses the
    // directory too. Timing 200 tiny appends after each isolates snapshot/
    // checkpoint/manifest O(entries) cost from log-listing O(log files)
    // cost — the two levers a 100 TB deployment tunes (compact + vacuum).
    val tiny2 = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .limit(10).coalesce(1)
    tiny2.persist(); tiny2.count()
    def appendBurst(label: String): Unit = {
      val t = time { (0 until 200).foreach { _ =>
        tiny2.write.format("strawboat").mode("append").save(dir) } }
      println(f"MUT $label%-26s 200_appends_s=$t%.1f (${t / 200 * 1000}%.0f ms/commit)")
    }
    appendBurst("append_post_compact")
    val dropped = graft.spark.StrawLog.vacuumLog(dir, keepVersions = 100)
    println(s"MUT vacuumLog dropped=$dropped logEntries=${
      if (logDir.exists()) logDir.listFiles().length else 0}")
    appendBurst("append_post_vacuum")
    tiny2.unpersist()
    spark.stop()
  }
}
