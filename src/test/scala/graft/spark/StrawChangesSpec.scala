package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Change data feed ([[StrawChanges]]): row-level inserts/deletes/updates
  * derived from snapshot diffs over the log — append, DELETE (DV diff),
  * UPDATE (pre/postimage), MERGE, RESTORE (newly-live rows), compaction
  * silence, and the loud failure past an eager vacuum. */
class StrawChangesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("strawchanges-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("strawchanges").toString
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  private def feed(out: String, from: Long, to: Long): Seq[(Long, String, Long)] =
    StrawChanges.changes(spark, out, from, to)
      .select(col("id"), col(StrawChanges.ChangeTypeCol),
        col(StrawChanges.CommitVersionCol))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._3, t._2, t._1)).toSeq

  test("appends surface as inserts with their commit version") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/appends"
    (0L until 5L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1).write.format("strawboat").mode("overwrite").save(out)
    (5L until 8L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1).write.format("strawboat").mode("append").save(out)
    assert(feed(out, 1, 1) == (0L until 5L).map(i => (i, "insert", 1L)))
    assert(feed(out, 2, 2) == (5L until 8L).map(i => (i, "insert", 2L)))
    assert(feed(out, 1, 2).size == 8)
  }

  test("DV delete feeds exactly the dead rows; merge feeds delete+insert") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/del"
    (0L until 100L).map(i => (i, i % 5)).toDF("id", "b")
      .coalesce(1).write.format("strawboat").mode("overwrite").save(out)
    val del = StrawDelete.delete(spark, out, Seq(LessThan("id", 10L): Filter))
    assert(del.rewrittenFiles == 0, del.toString)
    assert(feed(out, 2, 2) == (0L until 10L).map(i => (i, "delete", 2L)))
    // merge: replace id=50, insert id=999 (one commit)
    val src = Seq((50L, 0L), (999L, 9L)).toDF("id", "b")
    StrawMerge.merge(spark, out, src, Seq("id"))
    assert(feed(out, 3, 3) == Seq((50L, "delete", 3L),
      (50L, "insert", 3L), (999L, "insert", 3L)))
  }

  test("a second DV delete feeds only the newly-dead rows (superseded sidecar retained)") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/del2"
    (0L until 100L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.format("strawboat").mode("overwrite").save(out)
    StrawDelete.delete(spark, out, Seq(LessThan("id", 10L): Filter))
    // the second delete SUPERSEDES the first sidecar; its feed needs the
    // first one as the before-state — retained until the age-based vacuum
    StrawDelete.delete(spark, out, Seq(LessThan("id", 25L): Filter))
    assert(feed(out, 3, 3) == (10L until 25L).map(i => (i, "delete", 3L)))
    // restore to between the deletes also still works (same retention)
    val r = StrawRestore.restore(out, 2L)
    assert(r.dvChanges == 1, r.toString)
    assert(spark.read.format("strawboat").load(out).count() == 90)
  }

  test("UPDATE feeds update_preimage and update_postimage") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/upd"
    (0L until 50L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.format("strawboat").mode("overwrite").save(out)
    StrawUpdate.update(spark, out, Seq(EqualTo("id", 7L): Filter),
      Map("v" -> 700L))
    val rows = StrawChanges.changes(spark, out, 2, 2)
      .select("id", "v", StrawChanges.ChangeTypeCol).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._3).toSeq
    assert(rows == Seq((7L, 700L, "update_postimage"), (7L, 7L, "update_preimage")),
      rows.toString)
  }

  test("RESTORE feeds the resurrected rows as inserts") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/restore"
    (0L until 30L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.format("strawboat").mode("overwrite").save(out)
    StrawDelete.delete(spark, out, Seq(LessThan("id", 4L): Filter))
    StrawRestore.restore(out, 1L)
    assert(feed(out, 3, 3) == (0L until 4L).map(i => (i, "insert", 3L)))
  }

  test("compaction commits feed nothing; vacuumed inputs fail loudly") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/compact"
    for (g <- 0 until 3)
      (g * 10L until g * 10L + 10L).map(i => (i, i)).toDF("id", "v")
        .coalesce(1).write.format("strawboat")
        .mode(if (g == 0) "overwrite" else "append").save(out)
    val c = StrawCompaction.compact(spark, out)
    assert(c.filesRemoved > 0)
    val v = StrawLog.latestVersion(out).get
    assert(StrawChanges.changes(spark, out, v, v).count() == 0,
      "compaction must feed no row changes")
    // versions 1..3 referenced the compacted-away inputs: loud failure
    val e = intercept[Exception] {
      StrawChanges.changes(spark, out, 1, 3).count()
    }
    assert(e.getMessage != null, e.toString)
  }

  test("bad ranges are rejected") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/bad"
    Seq((1L, 1L)).toDF("id", "v")
      .write.format("strawboat").mode("overwrite").save(out)
    intercept[IllegalArgumentException] { StrawChanges.changes(spark, out, 0, 1) }
    intercept[IllegalArgumentException] { StrawChanges.changes(spark, out, 2, 1) }
    intercept[IllegalArgumentException] { StrawChanges.changes(spark, out, 1, 99) }
  }

  test("reader options read the feed; omitted endingVersion pins latest once") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/opts"
    (0L until 5L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1).write.format("strawboat").mode("overwrite").save(out)
    (5L until 8L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1).write.format("strawboat").mode("append").save(out)
    def open() = spark.read.format("strawboat")
      .option("readChangeFeed", "true").option("startingVersion", "1").load(out)
    assert(open().count() == 8) // resolves and PINS endingVersion = 2
    // a commit landing after the pin must not shift the same options' feed:
    // schema inference and scan building already agreed on [1, 2], and a
    // re-read with identical options replays that resolution
    (8L until 10L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1).write.format("strawboat").mode("append").save(out)
    assert(open().count() == 8)
    // an explicit endingVersion reaches past the pin
    val full = spark.read.format("strawboat")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").option("endingVersion", "3").load(out)
    assert(full.count() == 10)
    // the label columns are ordinary columns above the scan
    assert(full.filter(col(StrawChanges.CommitVersionCol) === 3L)
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq == Seq(8L, 9L))
    assert(full.filter(col(StrawChanges.ChangeTypeCol) === "insert").count() == 10)
  }

  test("readChangeFeed rejects missing startingVersion and time-travel combos") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/optsbad"
    Seq((1L, 1L)).toDF("id", "v")
      .write.format("strawboat").mode("overwrite").save(out)
    val noStart = intercept[IllegalArgumentException] {
      spark.read.format("strawboat")
        .option("readChangeFeed", "true").load(out).collect()
    }
    assert(noStart.getMessage.contains("startingVersion"))
    val combo = intercept[IllegalArgumentException] {
      spark.read.format("strawboat")
        .option("readChangeFeed", "true").option("startingVersion", "1")
        .option("versionAsOf", "1").load(out).collect()
    }
    assert(combo.getMessage.contains("versionAsOf"))
  }
}
