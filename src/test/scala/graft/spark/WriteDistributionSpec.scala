package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.format.{LocalFileInput, StrawFileReader, WriteOptions}

/** Write-side distribution & ordering (RequiresDistributionAndOrdering):
  * the anti-small-files / bounded-writer-memory story for partitioned
  * writes at scale. */
class WriteDistributionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("write-distribution-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("strawdist").toString
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
  }

  private def strbFiles(out: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.endsWith(".strb")) Seq(f) else Seq.empty
    walk(new java.io.File(out))
  }

  test("partitioned write clusters rows: one file per value, any input parallelism") {
    val src = spark.range(0, 5000)
      .select(col("id"), (col("id") % 5).cast("string").as("k"))
      .repartition(8) // every task holds every k — the worst fan-out shape
    val out = s"$dir/clustered"
    src.write.format("strawboat").mode("overwrite")
      .option("partitionBy", "k").save(out)
    val byDir = strbFiles(out).groupBy(_.getParentFile.getName)
    assert(byDir.keySet == (0 to 4).map(i => s"k=$i").toSet)
    byDir.foreach { case (d, fs) =>
      assert(fs.size == 1, s"partition $d has ${fs.size} files — write not clustered")
    }
    val back = spark.read.format("strawboat").load(out)
    assert(back.count() == 5000 && back.exceptAll(src).isEmpty)

    // opting out restores the raw task fan-out: 8 tasks x 5 values
    val out2 = s"$dir/unclustered"
    src.write.format("strawboat").mode("overwrite")
      .option("partitionBy", "k").option("distribute", "none").save(out2)
    assert(strbFiles(out2).size > 5,
      "distribute=none should leave one file per task per value")
  }

  test("sortBy: pages land sorted — disjoint, monotone zone maps per file") {
    // scrambled ints; sortBy must produce per-file sorted runs
    val src = spark.range(0, 50000)
      .select(((col("id") * 2654435761L) % 100000).cast("int").as("v"))
      .repartition(4)
    val out = s"$dir/sorted"
    src.write.format("strawboat").mode("overwrite")
      .option("sortBy", "v").option("maxPageSize", "1024").save(out)
    val files = strbFiles(out)
    assert(files.nonEmpty)
    files.foreach { f =>
      val in = new LocalFileInput(f.getPath)
      val footer = try StrawFileReader.readFooter(in) finally in.close()
      val pages = footer.topLeaf(0).pages
      assert(pages.length > 1, s"${f.getName}: want multiple pages to compare")
      pages.sliding(2).foreach { case Array(a, b) =>
        assert(a.max <= b.min,
          s"${f.getName}: page zone maps overlap ([${a.min},${a.max}] then " +
            s"[${b.min},${b.max}]) — rows not sorted by v")
      }
    }
    val back = spark.read.format("strawboat").load(out)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("ordered partitioned writer holds ONE open buffer, rolling on value change") {
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("x", LongType)))
    val out = s"$dir/ordered-writer"
    val w = new StrawDataWriter(out, schema, 0, 0L, WriteOptions(), "job1",
      partitionCols = Seq("k"), ordered = true)
    for (k <- Seq("a", "b", "c"); i <- 0 until 10) {
      w.write(InternalRow(UTF8String.fromString(k), i.toLong))
      assert(w.openPartitions <= 1,
        s"ordered writer grew to ${w.openPartitions} open partition buffers")
    }
    val msg = w.commit().asInstanceOf[StrawCommitMessage]
    // one staged file per value: each buffer was final when its value ended
    assert(msg.files.size == 3)
    val subdirs = msg.files.map(f =>
      new org.apache.hadoop.fs.Path(f).getParent.getName).sorted
    assert(subdirs == Seq("k=a", "k=b", "k=c"))
  }

  test("unordered partitioned writer keeps a buffer per live value (old shape)") {
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("x", LongType)))
    val out = s"$dir/unordered-writer"
    val w = new StrawDataWriter(out, schema, 0, 0L, WriteOptions(), "job2",
      partitionCols = Seq("k"), ordered = false)
    for (i <- 0 until 10; k <- Seq("a", "b", "c")) // interleaved
      w.write(InternalRow(UTF8String.fromString(k), i.toLong))
    assert(w.openPartitions == 3)
    val msg = w.commit().asInstanceOf[StrawCommitMessage]
    assert(msg.files.size == 3)
  }

  test("partitionBy + sortBy: values grouped then sorted within each partition") {
    val src = spark.range(0, 6000).select(
      (col("id") % 3).cast("string").as("g"),
      ((col("id") * 48271L) % 7919).cast("int").as("v"))
      .repartition(6)
    val out = s"$dir/part-sorted"
    src.write.format("strawboat").mode("overwrite")
      .option("partitionBy", "g").option("sortBy", "v")
      .option("maxPageSize", "256").save(out)
    val byDir = strbFiles(out).groupBy(_.getParentFile.getName)
    assert(byDir.keySet == Set("g=0", "g=1", "g=2"))
    byDir.values.foreach(fs => assert(fs.size == 1))
    // v is sorted inside each partition file (v is leaf 0 of the pruned
    // file schema: partition values live in the directory, data holds g,v
    // minus nothing here — locate v by field name)
    byDir.values.flatten.foreach { f =>
      val in = new LocalFileInput(f.getPath)
      val footer = try StrawFileReader.readFooter(in) finally in.close()
      val vi = footer.schema.fieldNames.indexOf("v")
      assert(vi >= 0)
      val pages = footer.topLeaf(vi).pages
      pages.sliding(2).foreach {
        case Array(a, b) => assert(a.max <= b.min,
          s"${f.getName}: v not sorted within partition")
        case _ =>
      }
    }
    val back = spark.read.format("strawboat").load(out)
    assert(back.count() == 6000 && back.exceptAll(src).isEmpty)
  }

  test("dynamic partition overwrite replaces only the touched partitions") {
    val out = s"$dir/dynover"
    val gen1 = spark.range(0, 500)
      .select(col("id"), (col("id") % 5).cast("string").as("k"))
    gen1.write.format("strawboat").mode("overwrite")
      .option("partitionBy", "k").save(out)
    val untouchedBefore = strbFiles(out)
      .filter(f => Set("k=0", "k=3", "k=4").contains(f.getParentFile.getName))
      .map(_.getPath).toSet
    // replacement rows for k=1 and k=2 only
    val gen2 = spark.range(1000, 1200)
      .select(col("id"), (lit(1) + col("id") % 2).cast("string").as("k"))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      gen2.write.format("strawboat").mode("overwrite")
        .option("partitionBy", "k").save(out)
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    val back = spark.read.format("strawboat").load(out)
    val expect = gen1.filter(!col("k").isin("1", "2")).unionAll(gen2)
    assert(back.count() == expect.count() && back.exceptAll(expect).isEmpty,
      "k=1/k=2 replaced, k=0/3/4 kept")
    // untouched partitions kept their PHYSICAL files (no rewrite)
    val untouchedAfter = strbFiles(out)
      .filter(f => Set("k=0", "k=3", "k=4").contains(f.getParentFile.getName))
      .map(_.getPath).toSet
    assert(untouchedAfter == untouchedBefore)
    // audited as its own operation
    assert(StrawLog.history(out).head.operation == "overwrite (dynamic)")
    // STATIC overwrite (default conf) still replaces the whole table
    gen2.write.format("strawboat").mode("overwrite")
      .option("partitionBy", "k").save(out)
    val afterStatic = spark.read.format("strawboat").load(out)
    assert(afterStatic.count() == 200)
  }

  test("multi-level partitionBy: nested layout, every level prunes, clustered") {
    import org.apache.spark.sql.sources.{EqualTo, Filter}
    val src = spark.range(0, 4000).select(
      col("id"),
      (col("id") % 2).cast("string").as("d"),
      (col("id") % 3).cast("int").as("h"))
      .repartition(8)
    val out = s"$dir/multi"
    src.write.format("strawboat").mode("overwrite")
      .option("partitionBy", "d,h").save(out)
    // nested dirs d=?/h=?, one clustered file per leaf
    val byDir = strbFiles(out).groupBy(f =>
      s"${f.getParentFile.getParentFile.getName}/${f.getParentFile.getName}")
    assert(byDir.keySet ==
      (for (d <- 0 to 1; h <- 0 to 2) yield s"d=$d/h=$h").toSet)
    byDir.values.foreach(fs => assert(fs.size == 1))
    // both levels prune before footer IO
    val schema = spark.read.format("strawboat").load(out).schema
    def planned(filters: Array[Filter]): Int = {
      val sb = new StrawScanBuilder(out, schema)
      sb.pushFilters(filters)
      // count file slices — small files bin-pack into shared tasks, so the
      // task count alone cannot show directory pruning
      sb.build().asInstanceOf[StrawScan].planInputPartitions().map {
        case p: StrawPackedPartition => p.slices.size
        case _ => 1
      }.sum
    }
    val all = planned(Array.empty)
    assert(all >= 6)
    assert(planned(Array(EqualTo("d", "1"))) <= all / 2)
    assert(planned(Array(EqualTo("h", 2))) <= all / 3 + 1)
    assert(planned(Array(EqualTo("d", "0"), EqualTo("h", 1))) == 1)
    // round trip + filter parity
    val back = spark.read.format("strawboat").load(out)
    assert(back.count() == 4000 && back.exceptAll(src).isEmpty)
    val got = back.filter(col("d") === "1" && col("h") === 0).agg(sum("id")).head.getLong(0)
    val exp = src.filter(col("d") === "1" && col("h") === 0).agg(sum("id")).head.getLong(0)
    assert(got == exp)
  }
}
