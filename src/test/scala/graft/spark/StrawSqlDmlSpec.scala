package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** SQL DML against catalog tables: DELETE FROM (SupportsDelete),
  * UPDATE (rewritten onto StrawUpdate), MERGE INTO (onto StrawMerge) —
  * each one atomic log commit, merge-on-read where applicable. */
class StrawSqlDmlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("strawdml").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("straw-sql-dml-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.catalog.straw", classOf[StrawCatalog].getName)
      .config("spark.sql.catalog.straw.warehouse", warehouse)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
  }

  test("DELETE FROM with WHERE goes merge-on-read; audited as delete") {
    spark.sql("CREATE TABLE straw.d1 (id BIGINT, k STRING)")
    spark.sql("INSERT INTO straw.d1 SELECT id, CAST(id % 3 AS STRING) FROM range(30)")
    spark.sql("DELETE FROM straw.d1 WHERE k = '1'")
    assert(spark.sql("SELECT count(*) FROM straw.d1").collect()(0).getLong(0) == 20)
    assert(spark.sql("SELECT count(*) FROM straw.d1 WHERE k = '1'")
      .collect()(0).getLong(0) == 0)
    val hist = StrawLog.history(s"$warehouse/d1")
    assert(hist.head.operation == "delete")
    // merge-on-read: the delete touched no data file, only a DV sidecar
    assert(hist.head.dvFiles > 0)
    spark.sql("DROP TABLE straw.d1")
  }

  test("DELETE FROM without WHERE truncates") {
    spark.sql("CREATE TABLE straw.d2 (id BIGINT)")
    spark.sql("INSERT INTO straw.d2 SELECT id FROM range(10)")
    spark.sql("DELETE FROM straw.d2")
    assert(spark.sql("SELECT count(*) FROM straw.d2").collect()(0).getLong(0) == 0)
    // table still self-describing after full delete
    assert(spark.sql("SELECT * FROM straw.d2").schema.fieldNames.toSeq == Seq("id"))
    spark.sql("DROP TABLE straw.d2")
  }

  test("UPDATE with expression assignments and WHERE") {
    spark.sql("CREATE TABLE straw.u1 (id BIGINT, name STRING, n BIGINT)")
    spark.sql("INSERT INTO straw.u1 SELECT id, concat('n', id), id FROM range(10)")
    spark.sql("UPDATE straw.u1 SET name = upper(name), n = n + 100 WHERE id >= 5")
    val rows = spark.sql("SELECT id, name, n FROM straw.u1 ORDER BY id").collect()
    assert(rows(4).getString(1) == "n4" && rows(4).getLong(2) == 4)
    assert(rows(5).getString(1) == "N5" && rows(5).getLong(2) == 105)
    assert(StrawLog.history(s"$warehouse/u1").head.operation == "update")
    spark.sql("DROP TABLE straw.u1")
  }

  test("UPDATE without WHERE touches every row") {
    spark.sql("CREATE TABLE straw.u2 (id BIGINT, flag STRING)")
    spark.sql("INSERT INTO straw.u2 SELECT id, 'old' FROM range(5)")
    spark.sql("UPDATE straw.u2 SET flag = 'new'")
    assert(spark.sql("SELECT count(*) FROM straw.u2 WHERE flag = 'new'")
      .collect()(0).getLong(0) == 5)
    spark.sql("DROP TABLE straw.u2")
  }

  test("MERGE INTO: upsert (UPDATE SET * / INSERT *)") {
    spark.sql("CREATE TABLE straw.m1 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO straw.m1 VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("CREATE TABLE straw.m1src (id BIGINT, v STRING)")
    spark.sql("INSERT INTO straw.m1src VALUES (2, 'B'), (4, 'D')")
    spark.sql("""MERGE INTO straw.m1 AS t USING straw.m1src AS s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    val out = spark.sql("SELECT id, v FROM straw.m1 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D")))
    assert(StrawLog.history(s"$warehouse/m1").head.operation == "merge")
    spark.sql("DROP TABLE straw.m1"); spark.sql("DROP TABLE straw.m1src")
  }

  test("MERGE INTO: WHEN MATCHED THEN DELETE; subquery source") {
    spark.sql("CREATE TABLE straw.m2 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO straw.m2 VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("""MERGE INTO straw.m2 USING (SELECT id, 'x' AS v FROM range(2, 3)) s
                 ON m2.id = s.id
                 WHEN MATCHED THEN DELETE""")
    assert(spark.sql("SELECT id FROM straw.m2 ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L))
    spark.sql("DROP TABLE straw.m2")
  }

  test("unsupported MERGE forms fail loudly, not approximately") {
    spark.sql("CREATE TABLE straw.m3 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO straw.m3 VALUES (1, 'a')")
    spark.sql("CREATE TABLE straw.m3src (id BIGINT, v STRING)")
    spark.sql("INSERT INTO straw.m3src VALUES (1, 'A')")
    // conditional matched actions route to the GENERAL path and work
    // (StrawMergeGeneralSpec covers the surface in depth)
    spark.sql("""MERGE INTO straw.m3 t USING straw.m3src s ON t.id = s.id
                 WHEN MATCHED AND s.v = 'A' THEN DELETE""")
    assert(spark.sql("SELECT count(*) FROM straw.m3").head.getLong(0) == 0)
    // non-equi condition stays refused (both paths are keyed equi-merges)
    val e2 = intercept[Exception](
      spark.sql("""MERGE INTO straw.m3 t USING straw.m3src s ON t.id > s.id
                   WHEN MATCHED THEN DELETE"""))
    assert(e2.getMessage.contains("strawboat"))
    spark.sql("DROP TABLE straw.m3"); spark.sql("DROP TABLE straw.m3src")
  }

  test("DELETE/UPDATE against a pinned snapshot are refused") {
    spark.sql("CREATE TABLE straw.p1 (id BIGINT)")
    spark.sql("INSERT INTO straw.p1 SELECT id FROM range(5)")
    // DELETE parses time travel but the pinned table must refuse
    val e = intercept[Exception](
      spark.sql("DELETE FROM straw.p1 VERSION AS OF 1 WHERE id = 1"))
    assert(e.getMessage != null)
    assert(spark.sql("SELECT count(*) FROM straw.p1").collect()(0).getLong(0) == 5)
    spark.sql("DROP TABLE straw.p1")
  }

  test("straw_* table functions accept catalog identifiers, not only paths") {
    spark.sql("CREATE TABLE straw.tvf (id BIGINT)")
    spark.sql("INSERT INTO straw.tvf SELECT id FROM range(4)")
    val ops = spark.sql("SELECT operation FROM straw_history('straw.tvf')")
      .collect().map(_.getString(0))
    assert(ops.contains("append"))
    // paths keep working; unknown identifiers fail with the table name
    val byPath = spark.sql(s"SELECT count(*) c FROM straw_history('$warehouse/tvf')")
      .collect()(0).getLong(0)
    assert(byPath == ops.length)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM straw_history('straw.missing')").collect())
    assert(e.getMessage.contains("missing"))
    spark.sql("DROP TABLE straw.tvf")
  }

  test("ANSI CHECK constraints: CREATE TABLE ... CHECK, ALTER ADD/DROP CONSTRAINT") {
    spark.sql("""CREATE TABLE straw.cons (id BIGINT, n BIGINT,
                 CONSTRAINT pos CHECK (n > 0))""")
    spark.sql("INSERT INTO straw.cons VALUES (1, 5)")
    // a violating insert fails and leaves nothing behind
    intercept[Exception](spark.sql("INSERT INTO straw.cons VALUES (2, -1)"))
    assert(spark.sql("SELECT count(*) FROM straw.cons").collect()(0).getLong(0) == 1)
    // ALTER ADD validates existing rows up front
    intercept[Exception](
      spark.sql("ALTER TABLE straw.cons ADD CONSTRAINT big CHECK (n > 100)"))
    spark.sql("ALTER TABLE straw.cons ADD CONSTRAINT small CHECK (n < 100)")
    intercept[Exception](spark.sql("INSERT INTO straw.cons VALUES (3, 500)"))
    // DROP re-opens the gate
    spark.sql("ALTER TABLE straw.cons DROP CONSTRAINT small")
    spark.sql("INSERT INTO straw.cons VALUES (3, 500)")
    assert(spark.sql("SELECT count(*) FROM straw.cons").collect()(0).getLong(0) == 2)
    spark.sql("DROP TABLE straw.cons")
  }

  test("TRUNCATE TABLE, SHOW CREATE TABLE, and readStream.table work") {
    import org.apache.spark.sql.streaming.Trigger
    spark.sql("CREATE TABLE straw.misc (id BIGINT, k STRING) PARTITIONED BY (k)")
    spark.sql("INSERT INTO straw.misc SELECT id, CAST(id % 2 AS STRING) FROM range(10)")
    // streaming read from a catalog identifier
    val sinkDir = s"$warehouse/_outside/misc_sink"
    val q = spark.readStream.table("straw.misc")
      .writeStream.format("strawboat")
      .option("path", sinkDir)
      .option("checkpointLocation", s"$warehouse/_outside/misc_ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    assert(spark.read.format("strawboat").load(sinkDir).count() == 10)
    // SHOW CREATE TABLE names the connector and partitioning
    val ddl = spark.sql("SHOW CREATE TABLE straw.misc").collect()(0).getString(0)
    assert(ddl.contains("straw.misc") && ddl.toLowerCase.contains("partitioned"), ddl)
    // TRUNCATE empties but keeps the schema
    spark.sql("TRUNCATE TABLE straw.misc")
    assert(spark.sql("SELECT count(*) FROM straw.misc").collect()(0).getLong(0) == 0)
    assert(spark.sql("SELECT * FROM straw.misc").schema.fieldNames.toSeq ==
      Seq("id", "k"))
    spark.sql("DROP TABLE straw.misc")
  }

  test("EXPLAIN of UPDATE/MERGE does not execute them") {
    spark.sql("CREATE TABLE straw.x1 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO straw.x1 VALUES (1, 'a')")
    spark.sql("EXPLAIN UPDATE straw.x1 SET v = 'CHANGED'").collect()
    assert(spark.sql("SELECT v FROM straw.x1").collect()(0).getString(0) == "a")
    spark.sql("DROP TABLE straw.x1")
  }
  test("MERGE WHEN NOT MATCHED BY SOURCE THEN DELETE syncs the target") {
    spark.sql("CREATE TABLE straw.sync (id BIGINT, v STRING)")
    spark.sql("INSERT INTO straw.sync SELECT id, concat('t', id) FROM range(50)")
    spark.sql("CREATE TABLE straw.sync_src (id BIGINT, v STRING)")
    spark.sql("""INSERT INTO straw.sync_src
      SELECT id, concat('s', id) FROM range(20, 60)""")
    spark.sql("""MERGE INTO straw.sync AS t USING straw.sync_src AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    val got = spark.sql("SELECT id, v FROM straw.sync ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == (20L until 60L).map(i => (i, s"s$i")))
    // conditional BY SOURCE forms route to the general path and work:
    // post-sync the table is 20..59; none are < 30 AND unmatched, so this
    // deletes nothing — then shrink the source and delete a real slice
    spark.sql("""MERGE INTO straw.sync AS t USING straw.sync_src AS s
      ON t.id = s.id
      WHEN NOT MATCHED BY SOURCE AND t.id < 30 THEN DELETE""")
    assert(spark.sql("SELECT count(*) FROM straw.sync").head.getLong(0) == 40)
    spark.sql("DELETE FROM straw.sync_src WHERE id < 25")
    spark.sql("""MERGE INTO straw.sync AS t USING straw.sync_src AS s
      ON t.id = s.id
      WHEN NOT MATCHED BY SOURCE AND t.id < 23 THEN DELETE""")
    assert(spark.sql("SELECT min(id), count(*) FROM straw.sync").collect()(0)
      .toSeq == Seq(23L, 37L))
    spark.sql("DROP TABLE straw.sync"); spark.sql("DROP TABLE straw.sync_src")
  }

  test("MERGE WHEN NOT MATCHED AND <cond> THEN INSERT gates inserts only") {
    spark.sql("CREATE TABLE straw.ci (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO straw.ci SELECT id, id FROM range(10)")
    spark.sql("CREATE TABLE straw.ci_src (id BIGINT, v BIGINT)")
    // 5..9 matched (v=1000x), 20..29 unmatched with mixed v parity
    spark.sql("""INSERT INTO straw.ci_src
      SELECT id, id * 1000 FROM range(5, 10)
      UNION ALL SELECT id, id FROM range(20, 30)""")
    spark.sql("""MERGE INTO straw.ci AS t USING straw.ci_src AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED AND s.v % 2 = 0 THEN INSERT *""")
    val got = spark.sql("SELECT id, v FROM straw.ci ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // matched rows replaced REGARDLESS of the insert condition; unmatched
    // rows inserted only when even
    val want = (0L until 5L).map(i => (i, i)) ++
      (5L until 10L).map(i => (i, i * 1000)) ++
      (20L until 30L by 2).map(i => (i, i))
    assert(got == want, got.mkString(","))
    // a target-column reference in the insert condition refuses loudly
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO straw.ci AS t USING straw.ci_src AS s
        ON t.id = s.id
        WHEN NOT MATCHED AND t.v > 0 THEN INSERT *""")
    }
    assert(e.getMessage.contains("SOURCE columns") ||
      e.getMessage.contains("UNRESOLVED_COLUMN"), e.getMessage)
    spark.sql("DROP TABLE straw.ci"); spark.sql("DROP TABLE straw.ci_src")
  }

}
