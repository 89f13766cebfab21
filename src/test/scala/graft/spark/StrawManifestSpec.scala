package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Committed-files manifest: planning over an unchanged table performs
  * ZERO directory walks, snapshots stay complete under concurrent commits,
  * and every failure mode degrades to a directory walk. */
class StrawManifestSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("straw-manifest-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("strawmanifest").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("commit writes a manifest; repeat queries perform zero directory walks") {
    val out = s"$dir/zerolist"
    spark.range(0, 5000).selectExpr("id", "id % 7 as k")
      .write.format("strawboat").mode("overwrite").save(out)
    // commits write the transaction log; readEntries serves from it
    assert(StrawLog.exists(out))

    // snapshot content == a direct walk of the directory
    val walked = StrawIO.walkFilesMeta(out)
    val manifest = StrawManifest.read(out).get.sortBy(_.path)
    assert(manifest.map(_.path) == walked.map(_.path))
    assert(manifest.map(_.len) == walked.map(_.len))

    // warm the query once (footer cache etc.), then: NO walks on repeats
    val q = () => spark.read.format("strawboat").load(out)
      .filter(col("k") === 3).agg(sum("id")).collect()(0).getLong(0)
    val first = q()
    val walks0 = StrawIO.listings.get()
    assert(q() == first)
    assert(q() == first)
    assert(spark.read.format("strawboat").load(out).count() == 5000)
    assert(StrawIO.listings.get() == walks0,
      s"expected zero directory walks, saw ${StrawIO.listings.get() - walks0}")
  }

  test("manifest absent or invalid: reads fall back to walking, results identical") {
    val out = s"$dir/fallback"
    spark.range(0, 1000).write.format("strawboat").mode("overwrite").save(out)
    val withManifest = spark.read.format("strawboat").load(out).count()
    StrawLog.invalidate(out)
    StrawManifest.invalidate(out)
    val walks0 = StrawIO.listings.get()
    assert(spark.read.format("strawboat").load(out).count() == withManifest)
    assert(StrawIO.listings.get() > walks0) // really walked
    // corrupt manifest → parse guard → walk, never wrong data
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, StrawManifest.FileName),
      "garbage\nnot\ta manifest".getBytes("UTF-8"))
    StrawManifest.clearCache()
    assert(spark.read.format("strawboat").load(out).count() == withManifest)
  }

  test("append and truncate keep the manifest in sync") {
    val out = s"$dir/sync"
    spark.range(0, 100).write.format("strawboat").mode("overwrite").save(out)
    spark.range(100, 300).write.format("strawboat").mode("append").save(out)
    assert(spark.read.format("strawboat").load(out).count() == 300)
    assert(StrawManifest.read(out).get.map(_.path).toSet ==
      StrawIO.walkFilesMeta(out).map(_.path).toSet)
    spark.range(0, 50).write.format("strawboat").mode("overwrite").save(out)
    assert(spark.read.format("strawboat").load(out).count() == 50)
    assert(StrawManifest.read(out).get.map(_.path).toSet ==
      StrawIO.walkFilesMeta(out).map(_.path).toSet)
  }

  test("hive-partitioned tables: manifest covers subdirectories, pruning intact") {
    val out = s"$dir/parts"
    spark.range(0, 1000).selectExpr("id", "cast(id % 4 as string) as part")
      .write.format("strawboat").option("partitionBy", "part")
      .mode("overwrite").save(out)
    assert(StrawManifest.read(out).get.map(_.path).toSet ==
      StrawIO.walkFilesMeta(out).map(_.path).toSet)
    val walks0 = StrawIO.listings.get()
    assert(spark.read.format("strawboat").load(out)
      .filter(col("part") === "2").count() == 250)
    assert(StrawIO.listings.get() == walks0)
  }

  test("same-length rewrite within one mtime tick serves the fresh snapshot") {
    val out = s"$dir/rewrite"
    new java.io.File(out).mkdirs()
    val qdir = StrawIO.fs(out).makeQualified(new org.apache.hadoop.fs.Path(out)).toString
    // equal line lengths: same mtime/len digits, path differs by one char —
    // the (path, mtime, len) cache key of the rest of the IO stack cannot
    // tell these apart when both writes land in one mtime granularity unit
    val a = Seq(StrawIO.FileMeta(s"$qdir/a.strb", 1000L, 10L))
    val b = Seq(StrawIO.FileMeta(s"$qdir/b.strb", 1000L, 10L))
    StrawManifest.write(out, a)
    assert(StrawManifest.read(out).get.map(_.path) == a.map(_.path))
    StrawManifest.write(out, b)
    assert(StrawManifest.read(out).get.map(_.path) == b.map(_.path))
  }

  test("reader during concurrent appends sees complete snapshots only") {
    val out = s"$dir/concurrent"
    spark.range(0, 1000).repartition(4)
      .write.format("strawboat").mode("overwrite").save(out)
    @volatile var failure: Option[String] = None
    @volatile var writing = true
    val reader = new Thread(() => {
      try {
        while (writing && failure.isEmpty) {
          // manifest-backed listing: complete old or complete new snapshot,
          // never a mid-rename partial (each append commits 4 files)
          val n = StrawManifest.read(out).map(_.size).getOrElse(-1)
          if (n >= 0 && n % 4 != 0)
            failure = Some(s"partial snapshot: $n files")
        }
      } catch { case e: Throwable => failure = Some(e.toString) }
    })
    reader.start()
    for (i <- 1 to 5)
      spark.range(i * 1000, i * 1000 + 1000).repartition(4)
        .write.format("strawboat").mode("append").save(out)
    writing = false
    reader.join(30000)
    assert(failure.isEmpty, failure)
    assert(spark.read.format("strawboat").load(out).count() == 6000)
  }

  test("streaming sink epochs refresh the manifest") {
    val src = s"$dir/streamsrc"
    val sink = s"$dir/streamsink"
    val ckpt = s"$dir/streamckpt"
    spark.range(0, 600).selectExpr("id", "id * 2 as v")
      .repartition(3).write.format("strawboat").mode("overwrite").save(src)
    val q = spark.readStream.format("strawboat")
      .option("maxFilesPerTrigger", 1).load(src)
      .writeStream.format("strawboat")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    assert(StrawLog.exists(sink)) // every epoch is a log version
    assert(StrawManifest.read(sink).get.map(_.path).toSet ==
      StrawIO.walkFilesMeta(sink).map(_.path).toSet)
    assert(spark.read.format("strawboat").load(sink).count() == 600)
  }
}
