package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** RESTORE to an earlier log version ([[StrawRestore]]): metadata-only undo
  * of appends and merge-on-read mutations, restore-of-restore (forward), DV
  * re-attachment on a re-added file, loud failure when the target's files
  * were physically reclaimed, and the SQL table-valued surface. */
class StrawRestoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("strawrestore-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("strawrestore").toString
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  private def read(out: String) = spark.read.format("strawboat").load(out)
  private def ids(out: String): Seq[Long] =
    read(out).select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("restore undoes an append; restoring forward undoes the restore") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/append"
    (0L until 100L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1).write.format("strawboat").mode("overwrite").save(out)
    (100L until 150L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1).write.format("strawboat").mode("append").save(out)
    assert(ids(out) == (0L until 150L))

    val r = StrawRestore.restore(out, 1L)
    assert(r.restoredTo == 1L && r.removedFiles == 1 && r.addedFiles == 0, r)
    assert(ids(out) == (0L until 100L), "append must be undone")
    assert(StrawLog.history(out).head.operation == "restore to v1")

    // the un-appended file's bytes were deliberately NOT reclaimed, so the
    // restore itself can be undone by restoring forward
    val fwd = StrawRestore.restore(out, 2L)
    assert(fwd.restoredTo == 2L && fwd.addedFiles == 1, fwd)
    assert(ids(out) == (0L until 150L), "restore must be undoable")

    // no-op restore to the current version commits nothing
    val cur = StrawLog.latestVersion(out).get
    val noop = StrawRestore.restore(out, cur)
    assert(noop.version == -1L && StrawLog.latestVersion(out).get == cur)
  }

  test("restore undoes a DV delete (clears the vector, metadata-only)") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/dvclear"
    (0L until 1000L).map(i => (i, i % 10)).toDF("id", "bucket")
      .coalesce(1).write.format("strawboat").mode("overwrite").save(out)
    val del = StrawDelete.delete(spark, out, Seq(LessThan("id", 300L): Filter))
    assert(del.deletedRows == 300 && del.rewrittenFiles == 0, del.toString)
    assert(read(out).count() == 700)

    val before = StrawIO.walkFilesMeta(out).map(m => m.path -> m.len).toMap
    val r = StrawRestore.restore(out, 1L)
    assert(r.dvChanges == 0 && r.addedFiles == 1 && r.removedFiles == 0,
      s"clearing a DV is a re-add of the entry: $r")
    assert(read(out).count() == 1000, "deleted rows must be back")
    val after = StrawIO.walkFilesMeta(out).map(m => m.path -> m.len).toMap
    assert(before == after, "restore must move no data bytes")

    // forward again: the delete's sidecar still exists (nothing reclaimed),
    // so the DV re-attaches and the rows disappear again
    val fwd = StrawRestore.restore(out, 2L)
    assert(fwd.dvChanges == 1, fwd)
    assert(read(out).count() == 700)
  }

  test("re-added file carries the DV the target version held") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/readd_dv"
    (0L until 100L).map(i => (i, "a")).toDF("id", "g")
      .coalesce(1).write.format("strawboat").mode("overwrite").save(out) // v1
    (100L until 200L).map(i => (i, "b")).toDF("id", "g")
      .coalesce(1).write.format("strawboat").mode("append").save(out) // v2
    // v3: DV on the second file only
    val del = StrawDelete.delete(spark, out,
      Seq(GreaterThanOrEqual("id", 150L): Filter))
    assert(del.deletedRows == 50 && del.dvFiles == 1, del.toString)
    // v4: back to v1 — second file REMOVED from the snapshot (bytes stay)
    StrawRestore.restore(out, 1L)
    assert(ids(out) == (0L until 100L))
    // v5: forward to v3 — the file returns WITH its deletion vector
    val r = StrawRestore.restore(out, 3L)
    assert(r.addedFiles == 1 && r.dvChanges == 1, s"re-add + DV re-attach: $r")
    assert(ids(out) == (0L until 150L), "restored file must honor its DV")
  }

  test("restore across a physical rewrite fails loudly, table unchanged") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/compacted"
    for (g <- 0 until 3)
      (g * 100L until (g + 1) * 100L).map(i => (i, s"r$i")).toDF("id", "s")
        .coalesce(1).write.format("strawboat")
        .mode(if (g == 0) "overwrite" else "append").save(out)
    val v = StrawLog.latestVersion(out).get
    val c = StrawCompaction.compact(spark, out)
    assert(c.filesRemoved > 0, c.toString)
    // the compaction vacuumed its inputs — the pre-compaction version's
    // files are gone, so restore must refuse before committing anything
    val vAfter = StrawLog.latestVersion(out).get
    val e = intercept[IllegalStateException] { StrawRestore.restore(out, v) }
    assert(e.getMessage.contains("missing file"), e.getMessage)
    assert(StrawLog.latestVersion(out).get == vAfter, "no half-restore commit")
    assert(ids(out) == (0L until 300L), "table unchanged after failed restore")
  }

  test("bad targets are rejected; no log is rejected") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/bad"
    (0L until 10L).map(i => (i, i)).toDF("id", "v")
      .write.format("strawboat").mode("overwrite").save(out)
    intercept[IllegalArgumentException] { StrawRestore.restore(out, 0L) }
    intercept[IllegalArgumentException] { StrawRestore.restore(out, 99L) }
    intercept[IllegalStateException] {
      StrawRestore.restore(s"$dir/definitely_missing", 1L)
    }
  }

  test("straw_restore SQL surface restores and reports metrics") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/sql"
    (0L until 60L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1).write.format("strawboat").mode("overwrite").save(out)
    (60L until 90L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1).write.format("strawboat").mode("append").save(out)
    StrawSqlSurface.register(spark)
    val row = spark.sql(s"SELECT * FROM straw_restore('$out', 1)").collect().head
    assert(row.getLong(1) == 1L && row.getInt(3) == 1, row.toString)
    assert(ids(out) == (0L until 60L))
    // history is visible through the SQL surface too
    val ops = spark.sql(
      s"SELECT operation FROM straw_history('$out') ORDER BY version DESC")
      .collect().map(_.getString(0))
    assert(ops.head == "restore to v1", ops.mkString(","))
    // re-RESOLVING the same restore replays its metrics without touching
    // the table (a racing append must not be silently undone)
    (90L until 95L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1).write.format("strawboat").mode("append").save(out)
    val again = spark.sql(s"SELECT * FROM straw_restore('$out', 1)").collect().head
    assert(again.getLong(1) == 1L && again.getInt(3) == 1, again.toString)
    assert(ids(out) == ((0L until 60L) ++ (90L until 95L)),
      "replayed restore metrics must not re-execute over the append")
    // the vacuum surface reclaims what the restore retired (0h cutoff)
    val vac = spark.sql(s"SELECT removed_files FROM straw_vacuum('$out', 0)")
      .collect().head.getInt(0)
    assert(vac >= 1, s"expected the restored-away file reclaimed, got $vac")
  }
}
