package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Metadata-only RENAME/DROP COLUMN via physical-spelling aliases
  * ([[ColumnMappingState]]): old files read through the mapping, new files
  * write current spellings, re-ADD after DROP never resurrects, DML and
  * time travel compose. */
class ColumnMappingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("strawmap").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("straw-colmap-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.straw", classOf[StrawCatalog].getName)
      .config("spark.sql.catalog.straw.warehouse", warehouse)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  test("state transitions: rename chains, drops, re-adds, serialization") {
    val s0 = ColumnMappingState.Empty
    val s1 = ColumnMappingState.rename(s0, "a", "b", "@v2")
    assert(s1.alias == Map("a" -> "b") && s1.writeNames.isEmpty)
    // rename back: collision-free (spelling 'a' always meant this column)
    val s2 = ColumnMappingState.rename(s1, "b", "a", "@v3")
    assert(s2.alias == Map("b" -> "a") && s2.writeNames.isEmpty)
    // drop kills every historical spelling
    val s3 = ColumnMappingState.drop(s2, "a")
    assert(s3.dropped == Set("a", "b") && s3.alias.isEmpty)
    // re-add of a dead spelling needs a fresh physical
    val sp = ColumnMappingState.addSpelling(s3, "a", "@v5")
    assert(sp.contains("a@v5"))
    val s4 = ColumnMappingState.add(s3, "a", sp)
    assert(s4.alias == Map("a@v5" -> "a") && s4.writeNames == Map("a" -> "a@v5"))
    // rename onto a retired spelling also needs a fresh physical
    val s5 = ColumnMappingState.rename(s4, "a", "b", "@v6")
    assert(s5.writeNames == Map("b" -> "b@v6") &&
      s5.alias("a@v5") == "b" && s5.alias("b@v6") == "b")
    // round-trip
    val parsed = {
      val toks = s5.serialize.split("\t", -1)
      ColumnMappingState.parse(toks(0), toks(1), toks(2))
    }
    assert(parsed == s5)
  }

  test("rename: old data reads under the new name; filters, aggs, appends") {
    spark.sql("CREATE TABLE straw.r1 (id BIGINT, qty BIGINT)")
    spark.sql("INSERT INTO straw.r1 VALUES (1, 10), (2, 20), (3, 30)")
    spark.sql("ALTER TABLE straw.r1 RENAME COLUMN qty TO quantity")
    assert(spark.table("straw.r1").columns.toSeq == Seq("id", "quantity"))
    // pre-rename files read through the alias
    assert(spark.sql("SELECT sum(quantity) FROM straw.r1").collect()(0).getLong(0) == 60)
    // filter pushdown on the renamed column over old files
    assert(spark.sql("SELECT id FROM straw.r1 WHERE quantity > 15 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    // appends after the rename carry the new spelling and coexist
    spark.sql("INSERT INTO straw.r1 VALUES (4, 40)")
    assert(spark.sql("SELECT sum(quantity) FROM straw.r1").collect()(0).getLong(0) == 100)
    assert(spark.sql("SELECT quantity FROM straw.r1 WHERE id = 1").collect()(0).getLong(0) == 10)
    // renaming to an existing name is refused
    intercept[Exception](spark.sql("ALTER TABLE straw.r1 RENAME COLUMN id TO quantity"))
  }

  test("drop: data invisible; re-add never resurrects") {
    spark.sql("CREATE TABLE straw.d1 (id BIGINT, secret STRING, keep STRING)")
    spark.sql("INSERT INTO straw.d1 VALUES (1, 'x', 'k1'), (2, 'y', 'k2')")
    spark.sql("ALTER TABLE straw.d1 DROP COLUMN secret")
    assert(spark.table("straw.d1").columns.toSeq == Seq("id", "keep"))
    assert(spark.sql("SELECT * FROM straw.d1").count() == 2)
    // re-add the same name: old values must NOT come back
    spark.sql("ALTER TABLE straw.d1 ADD COLUMN secret STRING")
    val vals = spark.sql("SELECT secret FROM straw.d1").collect().map(_.isNullAt(0))
    assert(vals.forall(identity), "dropped data resurrected!")
    spark.sql("INSERT INTO straw.d1 VALUES (3, 'k3', 'fresh')")
    assert(spark.sql("SELECT secret FROM straw.d1 WHERE id = 3")
      .collect()(0).getString(0) == "fresh")
    assert(spark.sql("SELECT count(secret) FROM straw.d1").collect()(0).getLong(0) == 1)
    // dropping the only remaining... guards
    intercept[Exception](spark.sql("ALTER TABLE straw.d1 DROP COLUMN nope"))
  }

  test("DML after rename: UPDATE, DELETE, MERGE speak the new name") {
    spark.sql("CREATE TABLE straw.m1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO straw.m1 VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("ALTER TABLE straw.m1 RENAME COLUMN v TO label")
    spark.sql("UPDATE straw.m1 SET label = upper(label) WHERE k <= 2")
    assert(spark.sql("SELECT label FROM straw.m1 ORDER BY k")
      .collect().map(_.getString(0)).toSeq == Seq("A", "B", "c"))
    spark.sql("DELETE FROM straw.m1 WHERE label = 'B'")
    assert(spark.sql("SELECT k FROM straw.m1 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    spark.sql("CREATE TABLE straw.m1src (k BIGINT, label STRING)")
    spark.sql("INSERT INTO straw.m1src VALUES (3, 'C!'), (9, 'new')")
    spark.sql(
      """MERGE INTO straw.m1 t USING straw.m1src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT k, label FROM straw.m1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "A"), (3L, "C!"), (9L, "new")))
  }

  test("time travel reads the version's own names") {
    spark.sql("CREATE TABLE straw.tt1 (id BIGINT, old_name BIGINT)")
    spark.sql("INSERT INTO straw.tt1 VALUES (1, 5)")
    val vBefore = spark.sql("SELECT max(version) FROM straw_history('straw.tt1')")
      .collect()(0).getLong(0)
    spark.sql("ALTER TABLE straw.tt1 RENAME COLUMN old_name TO new_name")
    assert(spark.table("straw.tt1").columns.contains("new_name"))
    val asOf = spark.sql(
      s"SELECT * FROM straw.tt1 VERSION AS OF $vBefore")
    assert(asOf.columns.toSeq == Seq("id", "old_name"))
    assert(asOf.collect()(0).getLong(1) == 5L)
  }

  test("guards: partition and constrained columns are not alterable") {
    spark.sql("CREATE TABLE straw.g1 (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO straw.g1 VALUES (1, 'a')")
    intercept[Exception](spark.sql("ALTER TABLE straw.g1 RENAME COLUMN p TO q"))
    intercept[Exception](spark.sql("ALTER TABLE straw.g1 DROP COLUMN p"))
    spark.sql("CREATE TABLE straw.g2 (id BIGINT, amt BIGINT)")
    spark.sql("ALTER TABLE straw.g2 ADD CONSTRAINT pos CHECK (amt >= 0)")
    intercept[Exception](spark.sql("ALTER TABLE straw.g2 RENAME COLUMN amt TO amount"))
    intercept[Exception](spark.sql("ALTER TABLE straw.g2 DROP COLUMN amt"))
    // dropping the constraint unblocks the rename
    spark.sql("ALTER TABLE straw.g2 DROP CONSTRAINT pos")
    spark.sql("ALTER TABLE straw.g2 RENAME COLUMN amt TO amount")
    assert(spark.table("straw.g2").columns.contains("amount"))
  }

  test("compaction materializes renames and drops into current spellings") {
    spark.sql("CREATE TABLE straw.cp1 (id BIGINT, old BIGINT, dead STRING)")
    spark.sql("INSERT INTO straw.cp1 VALUES (1, 10, 'x')")
    spark.sql("INSERT INTO straw.cp1 VALUES (2, 20, 'y')")
    spark.sql("ALTER TABLE straw.cp1 RENAME COLUMN old TO fresh")
    spark.sql("ALTER TABLE straw.cp1 DROP COLUMN dead")
    val dir = s"$warehouse/cp1"
    val res = StrawCompaction.compact(spark, dir, targetFileBytes = 1L << 20,
      smallFileBytes = Some(1L << 20))
    assert(res.outputFiles >= 1)
    // outputs carry the CURRENT spelling physically: identity mapping reads
    // them even if the alias were lost
    // every DATA-carrying file now spells current names (the CREATE-time
    // 0-row schema marker may survive in its own bin; the alias covers it)
    val files = StrawIO.listFilesMeta(dir)
    val schemas = files.map(f => FooterCache.get(f.path, f.mtime, f.len))
      .filter(_.numRows > 0).map(_.schema.fieldNames.toSeq)
    assert(schemas.nonEmpty && schemas.forall(_ == Seq("id", "fresh")),
      s"physical spellings after compaction: $schemas")
    assert(spark.sql("SELECT id, fresh FROM straw.cp1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 20L)))
  }

  test("change feed after rename labels columns with current names") {
    spark.sql("CREATE TABLE straw.cf1 (id BIGINT, txt STRING)")
    spark.sql("INSERT INTO straw.cf1 VALUES (1, 'a')")
    spark.sql("ALTER TABLE straw.cf1 RENAME COLUMN txt TO body")
    spark.sql("INSERT INTO straw.cf1 VALUES (2, 'b')")
    val dir = s"$warehouse/cf1"
    val feed = spark.read.format("strawboat")
      .option("readChangeFeed", "true").option("startingVersion", 1)
      .load(dir)
    assert(feed.columns.contains("body") && !feed.columns.contains("txt"))
    assert(feed.filter("_change_type = 'insert'").count() == 2)
  }

  test("nested-field RENAME/DROP are metadata-only through the leaf layout") {
    spark.sql("CREATE TABLE straw.nst (id BIGINT, meta STRUCT<lang: STRING, n: BIGINT>)")
    spark.sql("INSERT INTO straw.nst VALUES (1, named_struct('lang', 'en', 'n', 5L))")
    // nested rename: old files read through the spelling alias
    spark.sql("ALTER TABLE straw.nst RENAME COLUMN meta.lang TO language")
    val r0 = spark.sql("SELECT id, meta.language, meta.n FROM straw.nst").collect()(0)
    assert(r0.getLong(0) == 1L && r0.getString(1) == "en" && r0.getLong(2) == 5L)
    // appends under the evolved schema interleave with pre-rename files
    spark.sql("INSERT INTO straw.nst VALUES (2, named_struct('language', 'de', 'n', 7L))")
    assert(spark.sql("SELECT meta.language FROM straw.nst ORDER BY id")
      .collect().map(_.getString(0)).toSeq == Seq("en", "de"))
    // filters on the renamed nested path still push/prune correctly
    assert(spark.sql("SELECT id FROM straw.nst WHERE meta.language = 'de'")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // chained parent + child renames compose: meta -> info, then a second
    // child rename under the NEW parent; all three file generations read
    spark.sql("ALTER TABLE straw.nst RENAME COLUMN meta TO info")
    spark.sql("ALTER TABLE straw.nst RENAME COLUMN info.language TO lng")
    spark.sql("INSERT INTO straw.nst VALUES (3, named_struct('lng', 'fr', 'n', 9L))")
    assert(spark.sql("SELECT info.lng FROM straw.nst ORDER BY id")
      .collect().map(_.getString(0)).toSeq == Seq("en", "de", "fr"))
    // nested drop: the field vanishes from every generation; its sibling
    // survives; dropping the struct's LAST field is refused
    spark.sql("ALTER TABLE straw.nst DROP COLUMN info.lng")
    assert(spark.sql("SELECT info FROM straw.nst").schema
      .fields(0).dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("n"))
    assert(spark.sql("SELECT info.n FROM straw.nst ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(5L, 7L, 9L))
    val eLast = intercept[Exception] {
      spark.sql("ALTER TABLE straw.nst DROP COLUMN info.n")
    }
    assert(eLast.getMessage.contains("only field"), eLast.getMessage)
    // paths through arrays/maps stay refused loudly
    spark.sql("CREATE TABLE straw.nst2 (id BIGINT, xs ARRAY<STRUCT<a: STRING>>)")
    val eArr = intercept[Exception] {
      spark.sql("ALTER TABLE straw.nst2 RENAME COLUMN xs.element.a TO b")
    }
    assert(eArr.getMessage != null)
  }

  test("RENAME/DROP resolve case-insensitively under the default resolver") {
    spark.sql("CREATE TABLE straw.ci1 (id BIGINT, lang STRING, extra BIGINT)")
    spark.sql("INSERT INTO straw.ci1 VALUES (1, 'en', 7)")
    // Spark's default resolution is case-insensitive: 'Lang' must find
    // the stored 'lang' and the mapping must record the STORED spelling
    spark.sql("ALTER TABLE straw.ci1 RENAME COLUMN Lang TO language")
    assert(spark.sql("SELECT language FROM straw.ci1").collect()(0).getString(0) == "en")
    spark.sql("ALTER TABLE straw.ci1 DROP COLUMN EXTRA")
    assert(!spark.table("straw.ci1").columns.contains("extra"))
    assert(spark.sql("SELECT id, language FROM straw.ci1").collect()(0).getLong(0) == 1L)
  }

  test("DDL commits conflict on ANY intervening commit, not only mapping ones") {
    spark.sql("CREATE TABLE straw.race1 (id BIGINT, a STRING)")
    spark.sql("INSERT INTO straw.race1 VALUES (1, 'x')")
    val dir = s"$warehouse/race1"
    val v0 = StrawLog.snapshot(dir).get.version
    // a plain DATA commit lands in between (the ADD COLUMN race shape:
    // same mapping state before and after)
    spark.sql("INSERT INTO straw.race1 VALUES (2, 'y')")
    val cur = StrawLog.mappingAt(dir)
    val next = ColumnMappingState.rename(cur, "a", "b", s"@v${v0 + 1}")
    // the mapping-state check alone would pass (unchanged); the version
    // pin must reject
    val e = intercept[StrawLog.ConflictException] {
      StrawLog.commit(dir, Seq.empty, op = "rename column a -> b",
        mappingUpdate = Some((cur, next)), expectVersion = Some(v0))
    }
    assert(e.getMessage.contains("concurrent commit"), e.getMessage)
    // and the statement-level retry (fresh version) succeeds
    spark.sql("ALTER TABLE straw.race1 RENAME COLUMN a TO b")
    assert(spark.table("straw.race1").columns.toSeq == Seq("id", "b"))
  }
}
