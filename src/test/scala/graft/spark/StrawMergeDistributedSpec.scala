package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The large-source MERGE path ([[StrawMerge.mergeDistributed]]): above the
  * [[StrawMerge.BroadcastKeyBytesConf]] gate the source key set must NEVER
  * be collected to the driver — matching is a shuffle semi-join, per-file
  * deletion vectors are built and written on executors, and only O(files)
  * metadata returns. These cases force the gate low and assert (a) the
  * distributed path actually ran ([[StrawMerge.MergeResult.distributedSource]])
  * and (b) its end state is row-identical to the broadcast path's. */
class StrawMergeDistributedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("strawmerge-dist-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("strawmergedist").toString
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  private def read(out: String) = spark.read.format("strawboat").load(out)

  private def forcedDistributed[A](body: => A): A = {
    spark.conf.set(StrawMerge.BroadcastKeyBytesConf, "0")
    try body finally spark.conf.unset(StrawMerge.BroadcastKeyBytesConf)
  }

  test("distributed upsert matches the broadcast path's end state") {
    val sp = spark; import sp.implicits._
    // a genuinely null-keyed target row keeps the stored key column
    // nullable, so the null-keyed source row is schema-legal (it matches
    // nothing on either side — SQL null equality)
    val target = (0L until 4000L)
      .map(i => (java.lang.Long.valueOf(i), s"old$i", i * 10))
      .:+((null.asInstanceOf[java.lang.Long], "oldnull", -1L))
      .toDF("k", "s", "v")
    // backfill-sized source: 30% updates + inserts, plus null-keyed rows
    // (null matches nothing — they insert)
    val source = ((2800L until 4000L) ++ (9000L until 9600L))
      .map(i => (i, s"new$i", i * 100)).toDF("k", "s", "v")
      .unionAll(Seq((null.asInstanceOf[java.lang.Long], "nullkey", 1L))
        .toDF("k", "s", "v").select(col("k").cast("long"), col("s"), col("v")))
    val outD = s"$dir/upsert_dist"; val outB = s"$dir/upsert_bcast"
    target.repartition(3).write.format("strawboat").mode("overwrite").save(outD)
    target.repartition(3).write.format("strawboat").mode("overwrite").save(outB)
    val resD = forcedDistributed(
      StrawMerge.merge(spark, outD, source, keys = Seq("k")))
    val resB = StrawMerge.merge(spark, outB, source, keys = Seq("k"))
    assert(resD.distributedSource, resD.toString)
    assert(!resB.distributedSource, resB.toString)
    assert(resD.matchedRows == 1200 && resB.matchedRows == 1200,
      s"$resD vs $resB")
    // 600 new keys + the null-keyed row insert; the 1200 matched source
    // rows are replacement versions, reported apart
    assert(resD.insertedRows == 601 && resD.replacedRows == 1200,
      resD.toString)
    assert(resD.insertedRows == resB.insertedRows &&
      resD.replacedRows == resB.replacedRows, s"$resD vs $resB")
    val backD = read(outD); val backB = read(outB)
    assert(backD.count() == backB.count())
    assert(backD.exceptAll(backB).isEmpty && backB.exceptAll(backD).isEmpty)
    assert(StrawLog.history(outD).head.operation == "merge")
  }

  test("distributed Delete and Keep semantics match broadcast") {
    val sp = spark; import sp.implicits._
    val target = (0L until 2000L).map(i => (i, i.toString)).toDF("k", "s")
    for ((action, insert) <- Seq(
        (StrawMerge.Delete: StrawMerge.MatchedAction, true),
        (StrawMerge.Keep: StrawMerge.MatchedAction, true),
        (StrawMerge.Delete: StrawMerge.MatchedAction, false))) {
      val source = ((1500L until 2000L) ++ (5000L until 5100L))
        .map(i => (i, s"src$i")).toDF("k", "s")
      val outD = s"$dir/act_${action}_${insert}_d"
      val outB = s"$dir/act_${action}_${insert}_b"
      target.write.format("strawboat").mode("overwrite").save(outD)
      target.write.format("strawboat").mode("overwrite").save(outB)
      val resD = forcedDistributed(StrawMerge.merge(spark, outD, source,
        Seq("k"), whenMatched = action, insertNotMatched = insert))
      val resB = StrawMerge.merge(spark, outB, source,
        Seq("k"), whenMatched = action, insertNotMatched = insert)
      assert(resD.distributedSource && !resB.distributedSource)
      assert(resD.matchedRows == resB.matchedRows, s"$action/$insert: $resD vs $resB")
      val backD = read(outD); val backB = read(outB)
      assert(backD.exceptAll(backB).isEmpty && backB.exceptAll(backD).isEmpty,
        s"$action/$insert end states differ")
    }
  }

  test("distributed path rejects duplicate source keys") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/dups"
    (0L until 100L).map(i => (i, i.toString)).toDF("k", "s")
      .write.format("strawboat").mode("overwrite").save(out)
    val dupSrc = Seq((5L, "a"), (5L, "b"), (7L, "c")).toDF("k", "s")
    val e = intercept[IllegalArgumentException] {
      forcedDistributed(StrawMerge.merge(spark, out, dupSrc, Seq("k")))
    }
    assert(e.getMessage.contains("duplicate keys"), e.getMessage)
  }

  test("distributed merge composes with existing deletion vectors") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/dv_compose"
    (0L until 1000L).map(i => (i, i * 2)).toDF("k", "v")
      .write.format("strawboat").mode("overwrite").save(out)
    // first a DELETE puts DVs on the file; the merge must respect them
    // (deleted rows are not matchable) and union its own ordinals in
    val del = StrawDelete.delete(spark, out,
      Seq(org.apache.spark.sql.sources.LessThan("k", 100L)))
    assert(del.deletedRows == 100)
    // source hits deleted keys (re-insert) and live keys (replace)
    val source = (50L until 150L).map(i => (i, i * 1000)).toDF("k", "v")
    val res = forcedDistributed(StrawMerge.merge(spark, out, source, Seq("k")))
    assert(res.distributedSource)
    assert(res.matchedRows == 50, res.toString) // only 100..149 live
    val back = read(out)
    // 900 live after delete − 50 replaced + 100 source rows
    assert(back.count() == 950)
    val got = back.filter(col("k") < 150).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got sameElements (50L until 150L).map(i => (i, i * 1000)))
  }

  test("size gate: small sources stay on the broadcast path by default") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/gate_default"
    (0L until 100L).map(i => (i, i.toString)).toDF("k", "s")
      .write.format("strawboat").mode("overwrite").save(out)
    val res = StrawMerge.merge(spark, out,
      Seq((1L, "x"), (200L, "y")).toDF("k", "s"), Seq("k"))
    assert(!res.distributedSource, res.toString)
    assert(res.matchedRows == 1 && res.insertedRows == 1 && res.replacedRows == 1)
  }
  test("WHEN NOT MATCHED BY SOURCE THEN DELETE: sync semantics, both paths") {
    val sp = spark; import sp.implicits._
    val target = (0L until 1000L).map(i => (i, s"old$i")).toDF("k", "s")
    // source: updates for 200..699, fresh rows 2000..2099
    val source = ((200L until 700L) ++ (2000L until 2100L))
      .map(i => (i, s"new$i")).toDF("k", "s")
    def run(dist: Boolean): (StrawMerge.MergeResult, Set[(Long, String)]) = {
      val out = s"$dir/sync_${if (dist) "d" else "b"}"
      target.write.format("strawboat").mode("overwrite").save(out)
      val res =
        if (dist) forcedDistributed(StrawMerge.merge(spark, out, source,
          Seq("k"), deleteNotMatchedBySource = true))
        else StrawMerge.merge(spark, out, source, Seq("k"),
          deleteNotMatchedBySource = true)
      (res, read(out).collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    }
    val (resB, gotB) = run(dist = false)
    val (resD, gotD) = run(dist = true)
    assert(!resB.distributedSource && resD.distributedSource)
    // full sync: the table now IS the source
    val want = source.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(gotB == want, s"broadcast sync diff: ${(gotB diff want).take(3)}")
    assert(gotD == want)
    // 0..199 and 700..999 had no source match
    assert(resB.notMatchedBySourceDeleted == 500, resB.toString)
    assert(resD.notMatchedBySourceDeleted == 500, resD.toString)
    assert(resB.matchedRows == 500 && resD.matchedRows == 500)
  }

  test("Keep + deleteNotMatchedBySource keeps matched target versions") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/keep_sync"
    (0L until 100L).map(i => (i, s"t$i")).toDF("k", "s")
      .write.format("strawboat").mode("overwrite").save(out)
    val source = ((40L until 60L) ++ (500L until 510L))
      .map(i => (i, s"s$i")).toDF("k", "s")
    val res = StrawMerge.merge(spark, out, source, Seq("k"),
      whenMatched = StrawMerge.Keep, insertNotMatched = true,
      deleteNotMatchedBySource = true)
    assert(res.matchedRows == 20 && res.notMatchedBySourceDeleted == 80, res.toString)
    val got = read(out).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // matched keys keep their TARGET versions; source-only rows insert
    val want = (40L until 60L).map(i => (i, s"t$i")).toSet ++
      (500L until 510L).map(i => (i, s"s$i")).toSet
    assert(got == want)
  }

  test("insert condition gates the not-matched branch on both paths") {
    val sp = spark; import sp.implicits._
    val target = (0L until 500L).map(i => (i, s"t$i")).toDF("k", "s")
    val source = ((400L until 500L) ++ (900L until 1000L))
      .map(i => (i, s"s$i")).toDF("k", "s")
    def run(dist: Boolean): Set[(Long, String)] = {
      val out = s"$dir/ic_${if (dist) "d" else "b"}"
      target.write.format("strawboat").mode("overwrite").save(out)
      val body = () => StrawMerge.merge(spark, out, source, Seq("k"),
        insertCondition = Some("k % 2 = 0"))
      val res = if (dist) forcedDistributed(body()) else body()
      assert(res.distributedSource == dist)
      read(out).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    }
    // matched 400..499 all replaced (condition gates inserts only);
    // unmatched 900..999 inserted only when even
    val want = (0L until 400L).map(i => (i, s"t$i")).toSet ++
      (400L until 500L).map(i => (i, s"s$i")).toSet ++
      (900L until 1000L by 2).map(i => (i, s"s$i")).toSet
    assert(run(dist = false) == want)
    assert(run(dist = true) == want)
  }

  test("re-merging an applied source reports zero inserts, both paths") {
    // found by the round-14 mutation drill: insertedRows used to count
    // every freshly written row (replacement versions included), so an
    // idempotent re-merge claimed thousands of inserts while the table
    // row count stood still
    val sp = spark; import sp.implicits._
    for (dist <- Seq(false, true)) {
      val out = s"$dir/remerge_$dist"
      (0L until 500L).map(i => (i, s"old$i")).toDF("k", "s")
        .write.format("strawboat").mode("overwrite").save(out)
      val source = ((100L until 200L) ++ (900L until 950L))
        .map(i => (i, s"new$i")).toDF("k", "s")
      def merge() =
        if (dist) forcedDistributed(StrawMerge.merge(spark, out, source, Seq("k")))
        else StrawMerge.merge(spark, out, source, Seq("k"))
      val first = merge()
      assert(first.distributedSource == dist, first.toString)
      assert(first.matchedRows == 100 && first.replacedRows == 100 &&
        first.insertedRows == 50, first.toString)
      val n = read(out).count()
      val again = merge()
      // every source key now matches (the prior inserts included):
      // replacements only, NO inserts, row count unchanged
      assert(again.matchedRows == 150 && again.replacedRows == 150 &&
        again.insertedRows == 0, again.toString)
      assert(read(out).count() == n)
    }
  }

}
