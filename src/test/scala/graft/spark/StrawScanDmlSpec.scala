package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The `_pos` metadata column and the scan-based DML fallback
  * ([[StrawScanDml]]): SQL DELETE/UPDATE conditions beyond the v1 filter
  * algebra — IN-subqueries, correlated EXISTS — execute through the
  * ordinary scan's `(_file, _pos)` row addressing and ride the deletion-
  * vector machinery; translatable conditions are spec-pinned to still take
  * the native fast paths. */
class StrawScanDmlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("strawscandml").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("straw-scan-dml-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.catalog.straw", classOf[StrawCatalog].getName)
      .config("spark.sql.catalog.straw.warehouse", warehouse)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  private def fallbacks: Long = StrawScanDml.invocations.get()

  test("_pos metadata column: file-absolute ordinals, stable across deletes") {
    val sp = spark; import sp.implicits._
    val dir = s"$warehouse/_posbasic"
    (0L until 1000L).map(i => (i, i % 7)).toDF("id", "g")
      .repartition(2).write.format("strawboat").mode("overwrite").save(dir)
    val df = spark.read.format("strawboat").load(dir)
    // `_pos` reads stay VECTORIZED (the ordinal vector fills per batch)
    val plan = df.select("_file", "_pos", "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), s"_pos scan left columnar:\n$plan")
    val pos = df.select("_file", "_pos", "id").collect()
    assert(pos.length == 1000)
    // per file: ordinals are exactly 0..n-1
    pos.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ords = rows.map(_.getLong(1)).sorted
      assert(ords.head == 0L && ords.last == ords.length - 1L,
        s"ordinals not dense: ${ords.take(5).mkString(",")}..")
    }
    val before = pos.map(r => (r.getString(0), r.getLong(2)) -> r.getLong(1)).toMap
    // delete some rows: survivors keep their ORIGINAL file-absolute
    // ordinals (the DV ordinal space), leaving gaps
    StrawDelete.delete(spark, dir,
      Seq(org.apache.spark.sql.sources.EqualTo("g", 3L)))
    val after = spark.read.format("strawboat").load(dir)
      .select("_file", "_pos", "id").collect()
    assert(after.length < 1000)
    after.foreach { r =>
      assert(before((r.getString(0), r.getLong(2))) == r.getLong(1),
        s"ordinal moved for id=${r.getLong(2)}")
    }
  }

  test("DELETE with IN-subquery routes to the scan fallback and is exact") {
    spark.sql("CREATE TABLE straw.sd1 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO straw.sd1 SELECT id, id * 10 FROM range(100)")
    spark.sql("CREATE TABLE straw.sd1_kill (id BIGINT)")
    spark.sql("INSERT INTO straw.sd1_kill VALUES (3), (17), (42), (999)")
    val n0 = fallbacks
    spark.sql("DELETE FROM straw.sd1 WHERE id IN (SELECT id FROM straw.sd1_kill)")
    assert(fallbacks == n0 + 1, "subquery DELETE must take the scan fallback")
    val left = spark.sql("SELECT id FROM straw.sd1 ORDER BY id").collect().map(_.getLong(0))
    assert(left.length == 97 && !left.contains(3L) && !left.contains(17L) && !left.contains(42L))
    val hist = StrawLog.history(s"$warehouse/sd1")
    assert(hist.head.operation == "delete" && hist.head.dvFiles > 0,
      s"expected a DV-sidecar delete commit, got ${hist.head}")
    spark.sql("DROP TABLE straw.sd1"); spark.sql("DROP TABLE straw.sd1_kill")
  }

  test("translatable DELETE still takes the native SupportsDelete path") {
    spark.sql("CREATE TABLE straw.sd2 (id BIGINT, k STRING)")
    spark.sql("INSERT INTO straw.sd2 SELECT id, CAST(id % 3 AS STRING) FROM range(30)")
    val n0 = fallbacks
    spark.sql("DELETE FROM straw.sd2 WHERE k = '1' AND id < 20")
    assert(fallbacks == n0, "translatable DELETE must NOT take the scan fallback")
    assert(spark.sql("SELECT count(*) FROM straw.sd2").collect()(0).getLong(0) == 23)
    spark.sql("DROP TABLE straw.sd2")
  }

  test("DELETE with correlated EXISTS") {
    spark.sql("CREATE TABLE straw.sd3 (id BIGINT, grp BIGINT)")
    spark.sql("INSERT INTO straw.sd3 SELECT id, id % 5 FROM range(50)")
    spark.sql("CREATE TABLE straw.sd3_bad (grp BIGINT)")
    spark.sql("INSERT INTO straw.sd3_bad VALUES (2), (4)")
    spark.sql("""DELETE FROM straw.sd3 t WHERE EXISTS (
      SELECT 1 FROM straw.sd3_bad b WHERE b.grp = t.grp)""")
    assert(spark.sql("SELECT count(*) FROM straw.sd3").collect()(0).getLong(0) == 30)
    assert(spark.sql("SELECT count(*) FROM straw.sd3 WHERE grp IN (2, 4)")
      .collect()(0).getLong(0) == 0)
    spark.sql("DROP TABLE straw.sd3"); spark.sql("DROP TABLE straw.sd3_bad")
  }

  test("UPDATE with IN-subquery condition routes to the scan fallback") {
    spark.sql("CREATE TABLE straw.su1 (id BIGINT, v BIGINT, tag STRING)")
    spark.sql("INSERT INTO straw.su1 SELECT id, id, 'keep' FROM range(40)")
    spark.sql("CREATE TABLE straw.su1_hit (id BIGINT)")
    spark.sql("INSERT INTO straw.su1_hit VALUES (5), (6), (35)")
    val n0 = fallbacks
    spark.sql("""UPDATE straw.su1 SET v = v * 100, tag = 'hit'
      WHERE id IN (SELECT id FROM straw.su1_hit)""")
    assert(fallbacks == n0 + 1, "subquery UPDATE must take the scan fallback")
    val rows = spark.sql("SELECT id, v, tag FROM straw.su1 ORDER BY id").collect()
    assert(rows.length == 40)
    assert(rows(5).getLong(1) == 500 && rows(5).getString(2) == "hit")
    assert(rows(6).getLong(1) == 600 && rows(6).getString(2) == "hit")
    assert(rows(35).getLong(1) == 3500 && rows(35).getString(2) == "hit")
    assert(rows(7).getLong(1) == 7 && rows(7).getString(2) == "keep")
    assert(StrawLog.history(s"$warehouse/su1").head.operation == "update")
    spark.sql("DROP TABLE straw.su1"); spark.sql("DROP TABLE straw.su1_hit")
  }

  test("translatable UPDATE still takes the native path") {
    spark.sql("CREATE TABLE straw.su2 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO straw.su2 SELECT id, id FROM range(10)")
    val n0 = fallbacks
    spark.sql("UPDATE straw.su2 SET v = v + 1 WHERE id >= 5")
    assert(fallbacks == n0, "translatable UPDATE must NOT take the scan fallback")
    assert(spark.sql("SELECT sum(v) FROM straw.su2").collect()(0).getLong(0) ==
      (0 until 5).sum + (5 until 10).map(_ + 1).sum)
    spark.sql("DROP TABLE straw.su2")
  }

  test("UPDATE with a scalar-subquery ASSIGNMENT routes to the scan fallback") {
    spark.sql("CREATE TABLE straw.su3 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO straw.su3 SELECT id, id FROM range(20)")
    spark.sql("CREATE TABLE straw.su3_src (x BIGINT)")
    spark.sql("INSERT INTO straw.su3_src VALUES (100), (250)")
    val n0 = fallbacks
    // translatable CONDITION, but the RHS holds a scalar subquery the
    // native SQL-round-trip path cannot carry
    spark.sql("""UPDATE straw.su3 SET v = (SELECT max(x) FROM straw.su3_src)
      WHERE id >= 15""")
    assert(fallbacks == n0 + 1, "subquery-assigned UPDATE must take the scan fallback")
    val rows = spark.sql("SELECT id, v FROM straw.su3 ORDER BY id").collect()
    assert(rows.take(15).forall(r => r.getLong(1) == r.getLong(0)))
    assert(rows.drop(15).forall(_.getLong(1) == 250L), rows.drop(15).mkString(","))
    // ... and without a WHERE clause at all
    spark.sql("UPDATE straw.su3 SET v = (SELECT min(x) FROM straw.su3_src)")
    assert(spark.sql("SELECT count(*) FROM straw.su3 WHERE v = 100")
      .collect()(0).getLong(0) == 20)
    spark.sql("DROP TABLE straw.su3"); spark.sql("DROP TABLE straw.su3_src")
  }

  test("scan-fallback DELETE composes with prior deletion vectors") {
    spark.sql("CREATE TABLE straw.sd4 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO straw.sd4 SELECT id, id FROM range(100)")
    spark.sql("DELETE FROM straw.sd4 WHERE id < 10") // native, DVs appear
    spark.sql("CREATE TABLE straw.sd4_kill (id BIGINT)")
    spark.sql("INSERT INTO straw.sd4_kill SELECT id FROM range(5, 25)")
    spark.sql("DELETE FROM straw.sd4 WHERE id IN (SELECT id FROM straw.sd4_kill)")
    // 0..9 died natively, 10..24 via the fallback
    assert(spark.sql("SELECT count(*), min(id) FROM straw.sd4").collect()(0)
      .toSeq == Seq(75L, 25L))
    spark.sql("DROP TABLE straw.sd4"); spark.sql("DROP TABLE straw.sd4_kill")
  }
}
