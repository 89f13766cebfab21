package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The GENERAL SQL MERGE surface ([[StrawMergeScan]]): conditional and
  * multiple WHEN clauses, partial assignments, partial inserts, conditional
  * NOT MATCHED BY SOURCE update/delete, renamed join keys — plus the pins
  * that simple shapes still ride [[StrawMerge]]'s fast machinery and that
  * the refusals stay loud. */
class StrawMergeGeneralSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("strawmrg").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("straw-merge-general-test")
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

  private def rows(sql: String): Seq[Seq[Any]] =
    spark.sql(sql).collect().toSeq.map(r =>
      (0 until r.length).map(i => if (r.isNullAt(i)) null else r.get(i)))

  test("conditional matched clauses with partial assignments, first-match-wins") {
    spark.sql("CREATE TABLE straw.g1 (id BIGINT, v BIGINT, tag STRING)")
    spark.sql("INSERT INTO straw.g1 VALUES (1, 10, 'a'), (2, 20, 'b'), (3, 30, 'c'), (4, 40, 'd')")
    val fast0 = StrawMergeScan.invocations.get()
    spark.sql(
      """MERGE INTO straw.g1 AS t
        |USING (SELECT 1 AS id, 100 AS dv UNION ALL SELECT 2, 5
        |       UNION ALL SELECT 3, 7 UNION ALL SELECT 9, 9) AS s
        |ON t.id = s.id
        |WHEN MATCHED AND s.dv > 50 THEN DELETE
        |WHEN MATCHED AND t.v >= 30 THEN UPDATE SET v = t.v + s.dv
        |WHEN MATCHED THEN UPDATE SET tag = concat(t.tag, '!')""".stripMargin)
    assert(StrawMergeScan.invocations.get() == fast0 + 1,
      "conditional clauses must route to the general path")
    // id=1: first clause (dv=100>50) -> deleted. id=2: dv=5, v=20<30 ->
    // third clause, tag='b!'. id=3: v=30 -> second clause, v=37.
    // id=4: unmatched, untouched. id=9: source-only, no insert clause.
    assert(rows("SELECT id, v, tag FROM straw.g1 ORDER BY id") ==
      Seq(Seq(2L, 20L, "b!"), Seq(3L, 37L, "c"), Seq(4L, 40L, "d")))
  }

  test("partial INSERT clauses with conditions; unassigned columns go NULL") {
    spark.sql("CREATE TABLE straw.g2 (id BIGINT, v BIGINT, note STRING)")
    spark.sql("INSERT INTO straw.g2 VALUES (1, 1, 'x')")
    spark.sql(
      """MERGE INTO straw.g2 AS t
        |USING (SELECT 1 AS id, 50 AS sv UNION ALL SELECT 7, 70
        |       UNION ALL SELECT 8, 8) AS s
        |ON t.id = s.id
        |WHEN NOT MATCHED AND s.sv > 50 THEN INSERT (id, v) VALUES (s.id, s.sv)
        |WHEN NOT MATCHED THEN INSERT (id, note) VALUES (s.id, 'small')""".stripMargin)
    assert(rows("SELECT id, v, note FROM straw.g2 ORDER BY id") ==
      Seq(Seq(1L, 1L, "x"), Seq(7L, 70L, null), Seq(8L, null, "small")))
  }

  test("NOT MATCHED BY SOURCE with conditions: update and delete") {
    spark.sql("CREATE TABLE straw.g3 (id BIGINT, v BIGINT, st STRING)")
    spark.sql(
      """INSERT INTO straw.g3 VALUES
        |(1, 10, 'live'), (2, 20, 'live'), (3, 30, 'live'), (4, 40, 'live')""".stripMargin)
    spark.sql(
      """MERGE INTO straw.g3 AS t
        |USING (SELECT 1 AS id) AS s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET st = 'seen'
        |WHEN NOT MATCHED BY SOURCE AND t.v >= 40 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET st = 'orphan'""".stripMargin)
    assert(rows("SELECT id, v, st FROM straw.g3 ORDER BY id") ==
      Seq(Seq(1L, 10L, "seen"), Seq(2L, 20L, "orphan"), Seq(3L, 30L, "orphan")))
  }

  test("join keys need not share a name across sides") {
    spark.sql("CREATE TABLE straw.g4 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO straw.g4 VALUES (1, 10), (2, 20)")
    spark.sql(
      """MERGE INTO straw.g4 AS t
        |USING (SELECT 2 AS sid, 99 AS sv UNION ALL SELECT 5, 55) AS s
        |ON t.id = s.sid
        |WHEN MATCHED THEN UPDATE SET v = s.sv
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.sid, s.sv)""".stripMargin)
    assert(rows("SELECT id, v FROM straw.g4 ORDER BY id") ==
      Seq(Seq(1L, 10L), Seq(2L, 99L), Seq(5L, 55L)))
  }

  test("simple shapes still ride the fast path; one commit per merge") {
    spark.sql("CREATE TABLE straw.g5 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO straw.g5 VALUES (1, 10), (2, 20)")
    val general0 = StrawMergeScan.invocations.get()
    val v0 = StrawLog.snapshot(s"$warehouse/g5").get.version
    spark.sql(
      """MERGE INTO straw.g5 AS t
        |USING (SELECT 2 AS id, 99 AS v UNION ALL SELECT 3, 30) AS s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(StrawMergeScan.invocations.get() == general0,
      "an unconditional star merge must keep taking StrawMerge's fast path")
    assert(StrawLog.snapshot(s"$warehouse/g5").get.version == v0 + 1,
      "merge must be ONE atomic commit")
    assert(rows("SELECT id, v FROM straw.g5 ORDER BY id") ==
      Seq(Seq(1L, 10L), Seq(2L, 99L), Seq(3L, 30L)))

    // a general merge is also one commit
    val v1 = v0 + 1
    spark.sql(
      """MERGE INTO straw.g5 AS t
        |USING (SELECT 1 AS id) AS s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = t.v + 1""".stripMargin)
    assert(StrawMergeScan.invocations.get() == general0 + 1)
    assert(StrawLog.snapshot(s"$warehouse/g5").get.version == v1 + 1)
    assert(rows("SELECT v FROM straw.g5 WHERE id = 1") == Seq(Seq(11L)))
  }

  test("refusals: duplicate source matches, subqueries, null into non-nullable") {
    spark.sql("CREATE TABLE straw.g6 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO straw.g6 VALUES (1, 10)")
    val dup = intercept[Exception] {
      spark.sql(
        """MERGE INTO straw.g6 AS t
          |USING (SELECT 1 AS id, 5 AS sv UNION ALL SELECT 1, 6) AS s
          |ON t.id = s.id
          |WHEN MATCHED AND s.sv > 0 THEN UPDATE SET v = s.sv""".stripMargin)
    }
    assert(dup.getMessage.contains("multiple source rows"), dup.getMessage)
    // table unchanged after the refused merge
    assert(rows("SELECT id, v FROM straw.g6") == Seq(Seq(1L, 10L)))

    val sub = intercept[Exception] {
      spark.sql(
        """MERGE INTO straw.g6 AS t
          |USING (SELECT 1 AS id, 5 AS sv) AS s
          |ON t.id = s.id
          |WHEN MATCHED AND t.v IN (SELECT id FROM straw.g6) THEN DELETE""".stripMargin)
    }
    assert(sub.getMessage.contains("subquery"), sub.getMessage)

    // a nullable INSERT value into a NOT NULL column is refused up front
    spark.sql("DROP TABLE IF EXISTS straw.g6n")
    spark.sql("CREATE TABLE straw.g6n (id BIGINT, v BIGINT NOT NULL)")
    spark.sql("INSERT INTO straw.g6n VALUES (1, 1)")
    val nn = intercept[Exception] {
      spark.sql(
        """MERGE INTO straw.g6n AS t
          |USING (SELECT CAST(9 AS BIGINT) AS id,
          |              CAST(NULL AS BIGINT) AS maybe) AS s
          |ON t.id = s.id
          |WHEN NOT MATCHED AND s.maybe IS NULL
          |  THEN INSERT (id, v) VALUES (s.id, s.maybe)""".stripMargin)
    }
    assert(nn.getMessage.contains("non-nullable"), nn.getMessage)
  }

  /** Corrupt every data page of `f` (footer intact, .crc dropped): any
    * later DECODE of the file throws — the proof its pages were pruned. */
  private def corruptAllPages(f: java.io.File): Unit = {
    import graft.format._
    val footer = {
      val in = new LocalFileInput(f.getPath)
      try StrawFileReader.readFooter(in) finally in.close()
    }
    val raf = new java.io.RandomAccessFile(f, "rw")
    try {
      for (c <- footer.columns.indices) {
        val offs = footer.columns(c).pageOffsets
        for (p <- footer.columns(c).pages.indices) {
          raf.seek(offs(p))
          raf.write(Array.fill(
            math.min(16, footer.columns(c).pages(p).compLen.toInt))(0x5A.toByte))
        }
      }
    } finally raf.close()
    new java.io.File(f.getParentFile, s".${f.getName}.crc").delete(): Unit
  }

  test("source key bounds prune target files the merge cannot touch") {
    spark.sql("CREATE TABLE straw.g8 (id BIGINT, v BIGINT)")
    for (b <- 0 until 4)
      spark.sql(s"INSERT INTO straw.g8 SELECT id, id FROM range(${b * 100}, ${b * 100 + 100})")
    val files = new java.io.File(s"$warehouse/g8").listFiles
      .filter(f => f.getName.endsWith(".strb") && !f.getName.startsWith("part-empty-"))
    // files provably outside the source's key range [10, 49] get their
    // pages destroyed — the merge can only succeed if it never reads them
    val outOfRange = files.filter { f =>
      spark.read.format("strawboat").load(f.getPath)
        .agg(org.apache.spark.sql.functions.min("id")).head.getLong(0) >= 100
    }
    assert(outOfRange.nonEmpty, "fixture wrote no out-of-range files")
    outOfRange.foreach(corruptAllPages)
    FooterCache.clear()
    spark.sql(
      """MERGE INTO straw.g8 t
        |USING (SELECT id, id * 10 AS nv FROM range(10, 50)) s
        |ON t.id = s.id
        |WHEN MATCHED AND s.nv > 100 THEN UPDATE SET v = s.nv""".stripMargin)
    val got = spark.sql(
      "SELECT v FROM straw.g8 WHERE id BETWEEN 11 AND 49 ORDER BY id")
      .collect().map(_.getLong(0))
    assert(got.toSeq == (11L until 50L).map(_ * 10))
    assert(spark.sql("SELECT v FROM straw.g8 WHERE id = 10").head.getLong(0) == 10)
  }

  test("MERGE WITH SCHEMA EVOLUTION adds source columns metadata-only") {
    spark.sql("CREATE TABLE straw.g9 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO straw.g9 VALUES (1, 10), (2, 20)")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO straw.g9 AS t
        |USING (SELECT CAST(2 AS BIGINT) AS id, CAST(99 AS BIGINT) AS v, 'fresh' AS note
        |       UNION ALL SELECT 5, 55, 'new') AS s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // the new column exists; pre-evolution rows read NULL for it
    assert(rows("SELECT id, v, note FROM straw.g9 ORDER BY id") ==
      Seq(Seq(1L, 10L, null), Seq(2L, 99L, "fresh"), Seq(5L, 55L, "new")))
    // without the keyword, extra source columns do NOT evolve the table
    // (SET * expands over the TARGET's columns; the extra is ignored)
    spark.sql(
      """MERGE INTO straw.g9 AS t
        |USING (SELECT CAST(1 AS BIGINT) AS id, CAST(2 AS BIGINT) AS v,
        |              'x' AS note, 7 AS extra) AS s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(!spark.sql("SELECT * FROM straw.g9").columns.contains("extra"),
      "plain MERGE must not evolve the schema")
    assert(rows("SELECT id, v, note FROM straw.g9 WHERE id = 1") ==
      Seq(Seq(1L, 2L, "x")))
  }

  test("general merge moves updated rows across hive partitions") {
    // assigning the hive partition column is legal HERE (unlike file-local
    // UPDATE): the old row version dies via DV in its directory and the
    // new version routes to the new one — directory pruning sees both
    spark.sql("DROP TABLE IF EXISTS straw.gp")
    spark.sql(
      "CREATE TABLE straw.gp (id BIGINT, kind STRING, v BIGINT) PARTITIONED BY (kind)")
    spark.sql("INSERT INTO straw.gp VALUES (1, 'a', 10), (2, 'a', 20), (3, 'b', 30)")
    spark.sql(
      """MERGE INTO straw.gp t USING (SELECT CAST(2 AS BIGINT) AS id) s
        |ON t.id = s.id
        |WHEN MATCHED AND t.kind = 'a' THEN UPDATE SET kind = 'b'""".stripMargin)
    assert(rows("SELECT id, kind, v FROM straw.gp WHERE kind = 'b' ORDER BY id") ==
      Seq(Seq(2L, "b", 20L), Seq(3L, "b", 30L)))
    assert(rows("SELECT id FROM straw.gp WHERE kind = 'a'") == Seq(Seq(1L)))
    // physically: the moved row's fresh file lives under kind=b/
    val bFiles = new java.io.File(s"$warehouse/gp/kind=b").listFiles
      .filter(_.getName.endsWith(".strb"))
    val bIds = bFiles.flatMap(f => spark.read.format("strawboat")
      .load(f.getPath).select("id").collect().map(_.getLong(0))).sorted
    assert(bIds.toSeq == Seq(2L, 3L), s"kind=b holds $bIds")
  }

  test("INSERT * condition on a source-only column routes to the general path") {
    // the fast path aligns the source to the target's columns, so an insert
    // condition referencing a source column ABSENT from the target schema
    // (s.keep) cannot ride it — it must fall through to the scan path and
    // execute, not throw at re-analysis
    spark.sql("CREATE TABLE straw.g10 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO straw.g10 VALUES (1, 10)")
    val gen0 = StrawMergeScan.invocations.get()
    spark.sql(
      """MERGE INTO straw.g10 AS t
        |USING (SELECT CAST(1 AS BIGINT) AS id, CAST(11 AS BIGINT) AS v, true AS keep
        |       UNION ALL SELECT 2, 20, true
        |       UNION ALL SELECT 3, 30, false) AS s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED AND s.keep THEN INSERT *""".stripMargin)
    assert(StrawMergeScan.invocations.get() == gen0 + 1,
      "source-only insert condition must route to the general path")
    assert(rows("SELECT id, v FROM straw.g10 ORDER BY id") ==
      Seq(Seq(1L, 11L), Seq(2L, 20L)))
  }

  test("general merge respects CHECK constraints on written rows") {
    spark.sql(
      "CREATE TABLE straw.g7 (id BIGINT, v BIGINT, CONSTRAINT nonneg CHECK (v >= 0))")
    spark.sql("INSERT INTO straw.g7 VALUES (1, 10)")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO straw.g7 AS t
          |USING (SELECT 1 AS id, 5 AS sv) AS s
          |ON t.id = s.id
          |WHEN MATCHED AND s.sv > 0 THEN UPDATE SET v = -1""".stripMargin)
    }
    assert(e.getMessage != null)
    assert(rows("SELECT v FROM straw.g7 WHERE id = 1") == Seq(Seq(10L)),
      "failed merge must not partially apply")
    // the failure happened after markInflight — the marker must be cleared,
    // or vacuum is blocked for the full 6h TTL
    val markers = new java.io.File(s"$warehouse/g7/_straw_log").listFiles()
      .filter(_.getName.startsWith(".inflight."))
    assert(markers.isEmpty, s"leaked inflight markers: ${markers.mkString(",")}")
  }
}
