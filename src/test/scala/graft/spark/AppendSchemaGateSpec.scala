package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The append-schema gate ([[StrawSchemaResolver.validateAppend]]):
  * structural evolution must be declared with `mergeSchema=true`, a typo'd
  * column can no longer fork the table silently, incompatible appends die
  * at write time, and nullability drift stays free. */
class AppendSchemaGateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("appendgate-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("appendgate").toString
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  private def read(out: String) = spark.read.format("strawboat").load(out)

  test("matching append passes; new column requires mergeSchema") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/newcol"
    Seq((1L, "a")).toDF("id", "s")
      .write.format("strawboat").mode("overwrite").save(out)
    Seq((2L, "b")).toDF("id", "s")
      .write.format("strawboat").mode("append").save(out)
    val e = intercept[IllegalArgumentException] {
      Seq((3L, "c", 1.5)).toDF("id", "s", "score")
        .write.format("strawboat").mode("append").save(out)
    }
    assert(e.getMessage.contains("mergeSchema") &&
      e.getMessage.contains("score"), e.getMessage)
    assert(read(out).count() == 2, "rejected append must not land")
    // declared evolution goes through and reads merged + null-filled
    Seq((3L, "c", 1.5)).toDF("id", "s", "score")
      .write.format("strawboat").option("mergeSchema", "true")
      .mode("append").save(out)
    val back = read(out).orderBy("id").collect()
    assert(back.length == 3 && back(0).isNullAt(2) && back(2).getDouble(2) == 1.5)
  }

  test("omitted nullable column evolves with the option; widening too") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/omit"
    Seq((1L, "a")).toDF("id", "s")
      .write.format("strawboat").mode("overwrite").save(out)
    intercept[IllegalArgumentException] {
      Seq(9L).toDF("id").write.format("strawboat").mode("append").save(out)
    }
    Seq(9L).toDF("id").write.format("strawboat")
      .option("mergeSchema", "true").mode("append").save(out)
    assert(read(out).filter(col("s").isNull).count() == 1)
    // int -> long widening is evolution: gated, then fine
    val out2 = s"$dir/widen"
    Seq((1, "a")).toDF("id", "s")
      .write.format("strawboat").mode("overwrite").save(out2)
    intercept[IllegalArgumentException] {
      Seq((2L, "b")).toDF("id", "s")
        .write.format("strawboat").mode("append").save(out2)
    }
    Seq((2L, "b")).toDF("id", "s").write.format("strawboat")
      .option("mergeSchema", "true").mode("append").save(out2)
    assert(read(out2).schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("omitting a non-nullable column is rejected even with mergeSchema") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/nonnull"
    // lit() makes a non-nullable column in the written footer schema
    Seq(1L).toDF("id").select(col("id"), lit("tag").as("t"))
      .write.format("strawboat").mode("overwrite").save(out)
    val e = intercept[IllegalArgumentException] {
      Seq(2L).toDF("id").write.format("strawboat")
        .option("mergeSchema", "true").mode("append").save(out)
    }
    assert(e.getMessage.contains("non-nullable"), e.getMessage)
  }

  test("incompatible type change dies at write time, option or not") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/badtype"
    Seq((1L, "a")).toDF("id", "s")
      .write.format("strawboat").mode("overwrite").save(out)
    intercept[IllegalArgumentException] {
      Seq(("x", "b")).toDF("id", "s")
        .write.format("strawboat").option("mergeSchema", "true")
        .mode("append").save(out)
    }
    assert(read(out).count() == 1)
  }

  test("nullability drift and overwrite are never gated") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/drift"
    // table column non-nullable (lit), append nullable — same structure
    Seq(1L).toDF("id").select(col("id"), lit("x").as("s"))
      .write.format("strawboat").mode("overwrite").save(out)
    Seq((2L, "y")).toDF("id", "s")
      .write.format("strawboat").mode("append").save(out)
    assert(read(out).count() == 2)
    // overwrite replaces the schema wholesale, no option needed
    Seq(("z", 1.0)).toDF("a", "b")
      .write.format("strawboat").mode("overwrite").save(out)
    assert(read(out).schema.fieldNames.toSeq == Seq("a", "b"))
  }
}
