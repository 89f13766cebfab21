package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Nested schema evolution: ADD COLUMN and lossless type widening INSIDE
  * struct columns (including structs under arrays and maps). Old files
  * lack the added leaf and read it as null; narrower nested leaves decode
  * native and widen on read; new writes carry the evolved shape. Both the
  * path-level DSv2 surface (mergeSchema append) and the catalog DDL
  * surface (ALTER TABLE ADD COLUMNS / ALTER COLUMN TYPE) are covered. */
class StrawNestedEvolutionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("strawnest").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("straw-nested-evolution-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.catalog.straw", classOf[StrawCatalog].getName)
      .config("spark.sql.catalog.straw.warehouse", warehouse)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("strawnestp").toString
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  private def rows(sql: String): Seq[Seq[Any]] =
    spark.sql(sql).collect().toSeq.map(r =>
      (0 until r.length).map(i => if (r.isNullAt(i)) null else r.get(i)))

  test("mergeSchema append: struct gains a field and widens one") {
    val out = s"$dir/t1"
    // generation 1: m = struct<a:int, b:string>
    spark.range(10).select(col("id"),
      struct((col("id") * 2).cast("int").as("a"),
        concat(lit("x"), col("id")).as("b")).as("m"))
      .coalesce(1)
      .write.format("strawboat").mode("overwrite").save(out)
    // generation 2: m = struct<a:long, b:string, c:double> — a widened,
    // c added; declared evolution
    spark.range(10, 20).select(col("id"),
      struct((col("id") * 2).as("a"),
        concat(lit("x"), col("id")).as("b"),
        (col("id") + 0.5).as("c")).as("m"))
      .coalesce(1)
      .write.format("strawboat").mode("append").option("mergeSchema", "true")
      .save(out)

    val df = spark.read.format("strawboat").load(out)
    val mdt = df.schema("m").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(mdt.fieldNames.toSeq == Seq("a", "b", "c"), mdt.treeString)
    assert(mdt("a").dataType == org.apache.spark.sql.types.LongType)
    assert(mdt("c").dataType == org.apache.spark.sql.types.DoubleType)

    val got = df.select("id", "m.a", "m.b", "m.c").collect().sortBy(_.getLong(0))
    assert(got.length == 20)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == id * 2, s"id=$id a")
      assert(r.getString(2) == s"x$id", s"id=$id b")
      if (id < 10) assert(r.isNullAt(3), s"id=$id c must null-fill")
      else assert(r.getDouble(3) == id + 0.5, s"id=$id c")
    }
    // whole-struct read materializes the union shape on old rows too
    assert(df.filter(col("id") === 3).select("m").collect().toSeq ==
      Seq(org.apache.spark.sql.Row(org.apache.spark.sql.Row(6L, "x3", null))))
    // filters on the added leaf: old files have no m.c stats — must not
    // mis-prune
    assert(df.filter(col("m.c").isNull).count() == 10)
    assert(df.filter(col("m.c") > 15).count() == 5)
    // aggregate over the widened leaf spans both generations
    assert(df.agg(sum("m.a")).collect()(0).getLong(0) == (0L until 20L).map(_ * 2).sum)
  }

  test("structs under arrays and maps evolve too") {
    val out = s"$dir/t2"
    spark.range(5).select(col("id"),
      array(struct(col("id").cast("int").as("p")),
        struct((col("id") + 1).cast("int").as("p"))).as("items"),
      map(lit("k"), struct(col("id").cast("int").as("q"))).as("mm"))
      .coalesce(1)
      .write.format("strawboat").mode("overwrite").save(out)
    spark.range(5, 10).select(col("id"),
      array(struct(col("id").as("p"), lit("n").as("tag"))).as("items"),
      map(lit("k"), struct(col("id").as("q"), lit(true).as("ok"))).as("mm"))
      .coalesce(1)
      .write.format("strawboat").mode("append").option("mergeSchema", "true")
      .save(out)
    val df = spark.read.format("strawboat").load(out)
    val got = df.selectExpr("id", "items[0].p", "items[0].tag", "mm['k'].q",
      "mm['k'].ok").collect().sortBy(_.getLong(0))
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == id, s"id=$id p")
      if (id < 5) {
        assert(r.isNullAt(2) && r.isNullAt(4), s"id=$id old rows null-fill")
        assert(r.getLong(3) == id, s"id=$id q")
      } else {
        assert(r.getString(2) == "n" && r.getBoolean(4), s"id=$id new rows")
        assert(r.getLong(3) == id, s"id=$id q")
      }
    }
    // exploded aggregation across generations
    val total = df.selectExpr("explode(items) AS it").agg(sum("it.p"))
      .collect()(0).getLong(0)
    assert(total == (0L until 5L).map(i => i + i + 1).sum + (5L until 10L).sum)
  }

  test("catalog DDL: ADD COLUMNS m.c, ALTER COLUMN m.a TYPE BIGINT") {
    spark.sql("CREATE TABLE straw.n1 (id BIGINT, m STRUCT<a: INT, b: STRING>)")
    spark.sql("INSERT INTO straw.n1 VALUES (1, named_struct('a', 10, 'b', 'one'))")
    spark.sql("ALTER TABLE straw.n1 ADD COLUMNS (m.c STRING)")
    // old rows read the added nested field as null
    assert(rows("SELECT m.a, m.b, m.c FROM straw.n1") == Seq(Seq(10, "one", null)))
    // new writes bind at the evolved schema
    spark.sql("INSERT INTO straw.n1 VALUES (2, named_struct('a', 20, 'b', 'two', 'c', 'C'))")
    assert(rows("SELECT id, m.c FROM straw.n1 ORDER BY id") ==
      Seq(Seq(1L, null), Seq(2L, "C")))

    spark.sql("ALTER TABLE straw.n1 ALTER COLUMN m.a TYPE BIGINT")
    val mdt = spark.table("straw.n1").schema("m").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(mdt("a").dataType == org.apache.spark.sql.types.LongType, mdt.treeString)
    spark.sql("INSERT INTO straw.n1 VALUES (3, named_struct('a', CAST(4000000000 AS BIGINT), 'b', 'big', 'c', 'D'))")
    assert(rows("SELECT id, m.a FROM straw.n1 ORDER BY id") ==
      Seq(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, 4000000000L)))

    // refusals stay loud: duplicate nested name, non-lossless widen,
    // non-struct parent
    val dup = intercept[Exception](
      spark.sql("ALTER TABLE straw.n1 ADD COLUMNS (m.c BIGINT)"))
    assert(dup.getMessage.contains("already exists"), dup.getMessage)
    // Spark's analyzer refuses string->bigint before the catalog sees it;
    // a layout-changing numeric narrow (bigint->int on m.a) reaches the
    // catalog and must hit OUR lossless-widening refusal
    val narrow = intercept[Exception](
      spark.sql("ALTER TABLE straw.n1 ALTER COLUMN m.b TYPE BIGINT"))
    assert(narrow.getMessage != null)
    val narrow2 = intercept[Exception](
      spark.sql("ALTER TABLE straw.n1 ALTER COLUMN m.a TYPE DOUBLE"))
    assert(narrow2.getMessage.contains("lossless"), narrow2.getMessage)
    val nonStruct = intercept[Exception](
      spark.sql("ALTER TABLE straw.n1 ADD COLUMNS (id.sub STRING)"))
    assert(nonStruct.getMessage != null)
  }

  test("evolved nested table survives DELETE and compaction") {
    spark.sql("CREATE TABLE straw.n2 (id BIGINT, m STRUCT<a: INT>)")
    spark.sql("INSERT INTO straw.n2 SELECT id, named_struct('a', CAST(id AS INT)) FROM range(100)")
    spark.sql("ALTER TABLE straw.n2 ADD COLUMNS (m.b STRING)")
    spark.sql("ALTER TABLE straw.n2 ALTER COLUMN m.a TYPE BIGINT")
    spark.sql("INSERT INTO straw.n2 SELECT id, named_struct('a', id, 'b', concat('v', id)) FROM range(100, 200)")
    spark.sql("DELETE FROM straw.n2 WHERE id % 10 = 3")
    assert(rows("SELECT count(*), sum(m.a) FROM straw.n2") ==
      Seq(Seq(180L, (0L until 200L).filter(_ % 10 != 3).sum)))
    // compaction rewrites old files AT the evolved schema (nested convert)
    spark.sql("SELECT * FROM straw_compact('straw.n2')").collect()
    assert(rows("SELECT count(*), sum(m.a) FROM straw.n2") ==
      Seq(Seq(180L, (0L until 200L).filter(_ % 10 != 3).sum)))
    assert(rows("SELECT m.b FROM straw.n2 WHERE id = 5") == Seq(Seq(null)))
    assert(rows("SELECT m.b FROM straw.n2 WHERE id = 105") == Seq(Seq("v105")))
  }
}
