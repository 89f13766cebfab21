package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, LessThan, And}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Model-based property test for the transaction-log table: a random
  * interleaving of append / truncate / compact / delete / update is mirrored
  * into an in-memory multiset model, and after EVERY step the table must
  * agree with the model exactly (row multiset via sorted collect) and the
  * log's version counter must advance only when the model changed. Time
  * travel is then spot-checked against remembered historical models.
  *
  * This is the whole-system invariant the per-feature specs can't state:
  * no sequence of the five mutation kinds, in any order, loses, duplicates,
  * or resurrects a row.
  */
class LogModelPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("logmodel-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("logmodel").toString
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  // row = (id, tag); the model is a multiset of rows
  private type Row2 = (Long, String)

  test("random mutation sequences keep table == model at every step") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/t"
    val rnd = new scala.util.Random(20260813L)
    var model = Vector.empty[Row2]
    var nextId = 0L
    // remembered (version, model) pairs for time-travel spot checks —
    // only append-only prefixes stay physically readable (truncate/compact/
    // delete/update vacuum their inputs), so remember metadata-only
    var historyModels = List.empty[(Long, Int)] // (version, model size)

    def freshRows(n: Int): Seq[Row2] = {
      val rows = (0 until n).map(i => (nextId + i, s"t${rnd.nextInt(5)}"))
      nextId += n
      rows
    }

    def check(step: String): Unit = {
      val got = spark.read.format("strawboat").load(out)
        .as[Row2].collect().sortBy(r => (r._1, r._2)).toSeq
      val want = model.sortBy(r => (r._1, r._2))
      assert(got == want,
        s"$step: table diverged from model (got ${got.size} rows, want ${want.size})")
    }

    // seed
    val seed = freshRows(200)
    seed.toDF("id", "tag").coalesce(1)
      .write.format("strawboat").mode("overwrite").save(out)
    model = seed.toVector
    check("seed")

    for (step <- 1 to 24) {
      val op = rnd.nextInt(10)
      val before = StrawLog.latestVersion(out).get
      var expectNewVersion = true
      op match {
        case 0 | 1 | 2 | 3 => // append (most common, like real tables)
          val rows = freshRows(50 + rnd.nextInt(100))
          rows.toDF("id", "tag").coalesce(1 + rnd.nextInt(2))
            .write.format("strawboat").mode("append").save(out)
          model ++= rows
        case 4 => // truncate to a fresh set
          val rows = freshRows(100)
          rows.toDF("id", "tag").coalesce(1)
            .write.format("strawboat").mode("overwrite").save(out)
          model = rows.toVector
        case 5 => // compact
          val res = StrawCompaction.compact(spark, out, targetFileBytes = 64L << 20)
          expectNewVersion = res.outputFiles > 0
        case 6 => // merge: replace an id range with source versions + inserts
          val lo = rnd.nextLong(math.max(1L, nextId))
          val hi = lo + 30
          val updates = model.collect { case (id, _) if id >= lo && id < hi => id }
            .distinct.map(id => (id, s"m$step"))
          val inserts = freshRows(10)
          val src = (updates ++ inserts).toDF("id", "tag")
          val res = StrawMerge.merge(spark, out, src, keys = Seq("id"))
          val matched = model.count(r => r._1 >= lo && r._1 < hi)
          assert(res.matchedRows == matched, s"step $step merge: $res vs $matched")
          // source-wins: every matched row replaced by its source version
          // (duplicate target ids collapse to one source row each), plus
          // the inserts
          model = model.filterNot(r => r._1 >= lo && r._1 < hi) ++
            updates ++ inserts
          expectNewVersion = true // inserts always land
        case 7 => // delete an id range (3VL irrelevant: no nulls here)
          val lo = rnd.nextLong(math.max(1L, nextId))
          val hi = lo + 40
          val cond: Seq[Filter] =
            Seq(And(GreaterThanOrEqual("id", lo), LessThan("id", hi)))
          val res = StrawDelete.delete(spark, out, cond)
          val expect = model.count(r => r._1 >= lo && r._1 < hi)
          assert(res.deletedRows == expect, s"step $step delete: $res vs $expect")
          model = model.filterNot(r => r._1 >= lo && r._1 < hi)
          expectNewVersion = expect > 0
        case _ => // update a tag over an id range
          val lo = rnd.nextLong(math.max(1L, nextId))
          val hi = lo + 60
          val cond: Seq[Filter] =
            Seq(And(GreaterThanOrEqual("id", lo), LessThan("id", hi)))
          val res = StrawUpdate.update(spark, out, cond, Map("tag" -> s"u$step"))
          val expect = model.count(r => r._1 >= lo && r._1 < hi)
          assert(res.updatedRows == expect, s"step $step update: $res vs $expect")
          model = model.map(r =>
            if (r._1 >= lo && r._1 < hi) (r._1, s"u$step") else r)
          expectNewVersion = expect > 0
      }
      check(s"step $step (op $op)")
      val after = StrawLog.latestVersion(out).get
      if (expectNewVersion)
        assert(after == before + 1, s"step $step: expected one new version")
      else
        assert(after == before, s"step $step: no-op must not commit")
      historyModels ::= ((after, model.size))
    }

    // version history is a complete audit trail of the mutation sequence
    val h = StrawLog.history(out)
    assert(h.map(_.version) == h.map(_.version).sorted.reverse)
    assert(h.forall(_.operation.nonEmpty))
    // pinned METADATA of every remembered version still resolves (files of
    // rewritten generations are vacuumed, so only the listing is promised)
    historyModels.foreach { case (v, _) =>
      assert(StrawLog.snapshotAt(out, v).isDefined, s"version $v must resolve")
    }
  }
}
