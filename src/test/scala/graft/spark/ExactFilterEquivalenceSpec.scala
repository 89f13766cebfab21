package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The consumed-filter path removes Spark's own Filter node, so the
  * reader's row-level evaluation IS the semantics. This spec pins
  * equivalence adversarially: for random data (nulls, NaN, ±0.0, extreme
  * longs, multibyte strings, decimals) and random filter expressions, the
  * query result with consumption FORCED ON (`exactFilterMaxPass=1.0`,
  * reader evaluates) must equal the result with consumption OFF
  * (`exactFilterMaxPass=0.0`, Spark's codegen evaluates). Both full plans
  * run end-to-end through the connector, covering the columnar-compaction
  * and row/late-materialization paths plus null-fill schema evolution. */
class ExactFilterEquivalenceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("exact-filter-equiv")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("exactfilter").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def run(df: DataFrame, maxPass: String): Seq[Seq[Any]] = {
    spark.conf.set("spark.strawboat.exactFilterMaxPass", maxPass)
    // bit-normalize doubles: Scala's boxed == makes NaN != NaN, which would
    // fail the harness comparison on rows both plans agree on
    try df.collect().toSeq.map(_.toSeq.map {
      case d: java.lang.Double => java.lang.Double.doubleToLongBits(d)
      case f: java.lang.Float => java.lang.Float.floatToIntBits(f)
      case v => v
    })
    finally spark.conf.unset("spark.strawboat.exactFilterMaxPass")
  }

  private def assertEquivalent(mk: => DataFrame, what: String): Unit = {
    val on = run(mk, "1.0")
    val off = run(mk, "0.0")
    // MULTISET comparison: row duplication/omission at equal cardinality is
    // exactly the bug class survivor compaction could introduce, and a set
    // compare would miss it
    def counted(rows: Seq[Seq[Any]]): Map[Seq[Any], Int] =
      rows.groupBy(identity).map { case (k, v) => (k, v.size) }
    val onC = counted(on)
    val offC = counted(off)
    if (onC != offC) fail(
      s"$what: consumed=${on.size} rows, residual=${off.size} rows; " +
        s"diff=${(onC.toSet -- offC.toSet).take(3)} vs ${(offC.toSet -- onC.toSet).take(3)}")
  }

  test("consumed filters are semantically identical to Spark's evaluation (adversarial values)") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(4242)
    val adversarialD = Array(Double.NaN, 0.0, -0.0, Double.MinValue,
      Double.MaxValue, Double.MinPositiveValue, -1.5, 2.5,
      Double.NegativeInfinity, Double.PositiveInfinity)
    val adversarialL = Array(Long.MinValue, Long.MaxValue, 0L, -1L, 1L, 42L)
    val strings = Array("", "a", "ab", "abc", "zz", "Zebra", "日本語", "m",
      "a\u0000b", "ABC")
    val rows = (0 until 4000).map { i =>
      (i.toLong,
        if (i % 13 == 0) None
        else Some(if (i % 7 == 0) adversarialL(rnd.nextInt(adversarialL.length))
        else rnd.nextInt(200).toLong - 100),
        if (i % 11 == 0) None
        else Some(if (i % 5 == 0) adversarialD(rnd.nextInt(adversarialD.length))
        else rnd.nextDouble() * 200 - 100),
        if (i % 17 == 0) None else Some(strings(rnd.nextInt(strings.length))),
        if (i % 19 == 0) None
        else Some(BigDecimal(rnd.nextInt(2000000) - 1000000, 2)))
    }
    val out = s"$dir/adv"
    rows.toDF("id", "l", "d", "s", "dec")
      .select(col("id"), col("l"), col("d"), col("s"),
        col("dec").cast("decimal(12,2)").as("dec"))
      .coalesce(2).write.format("strawboat")
      .option("maxPageSize", "128").mode("overwrite").save(out)

    def t = spark.read.format("strawboat").load(out)
    val probes: Seq[(String, DataFrame => DataFrame)] = Seq(
      ("l > 0", _.filter(col("l") > 0)),
      ("l >= Long.Max", _.filter(col("l") >= Long.MaxValue)),
      ("l = -1", _.filter(col("l") === -1L)),
      ("d > 0.0 (NaN/±0 semantics)", _.filter(col("d") > 0.0)),
      ("d = 0.0 (−0.0 equality)", _.filter(col("d") === 0.0)),
      ("d <= NaN-adjacent max", _.filter(col("d") <= Double.MaxValue)),
      ("d IS NULL", _.filter(col("d").isNull)),
      ("s = 'Zebra'", _.filter(col("s") === "Zebra")),
      ("s > 'ab' (binary order)", _.filter(col("s") > "ab")),
      ("s startsWith a", _.filter(col("s").startsWith("a"))),
      ("s contains 本", _.filter(col("s").contains("本"))),
      ("s endsWith b", _.filter(col("s").endsWith("b"))),
      ("dec range", _.filter(col("dec") > new java.math.BigDecimal("-5000.00") &&
        col("dec") <= new java.math.BigDecimal("5000.00"))),
      ("IN list", _.filter(col("l").isin(0L, 1L, -1L, Long.MinValue))),
      ("l <=> -1 (null-safe eq)", _.filter(col("l") <=> -1L)),
      ("d <=> 0.0 (null-safe ±0)", _.filter(col("d") <=> 0.0)),
      ("s <=> null (null-safe null)", _.filter(col("s") <=> lit(null))),
      ("conjunction", _.filter(col("l") > -50 && col("d") < 50.0 && col("s").isNotNull)),
      ("disjunction", _.filter(col("l") > 90 || col("d") < -90.0)),
      ("negation", _.filter(!(col("s") === "a"))),
      ("projection drops filter col", df =>
        df.filter(col("d") > 0.0 && col("l") < 50).select(col("id"), col("s"))),
      ("filtered limit", _.filter(col("l") > 0).limit(37)),
      ("filtered topN drops filter col", df =>
        df.filter(col("d") > 0.0)
          .orderBy(col("l").desc_nulls_last, col("id")).limit(25)
          .select(col("id"), col("s"))),
      ("filtered count", df =>
        df.filter(col("s").isNotNull && col("l") =!= 0L)
          .agg(count(lit(1)).as("c")))
    )
    for ((name, p) <- probes) name match {
      case "filtered limit" =>
        // limit rows are order-unstable; compare counts only
        assert(run(p(t), "1.0").size == run(p(t), "0.0").size, name)
      case _ => assertEquivalent(p(t), name)
    }
  }

  test("consumed filters on schema-evolved tables (null-filled filter columns)") {
    val ss = spark
    import ss.implicits._
    val out = s"$dir/evolved"
    Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "s")
      .write.format("strawboat").mode("append").save(out)
    Seq((4L, "w", 10.5), (5L, "v", -3.0)).toDF("id", "s", "score")
      .write.format("strawboat").option("mergeSchema", "true")
      .mode("append").save(out)
    def t = spark.read.format("strawboat").load(out)
    assertEquivalent(t.filter(col("score") > 0.0), "range on evolved col")
    assertEquivalent(t.filter(col("score").isNull), "IS NULL on evolved col")
    assertEquivalent(t.filter(col("score").isNull || col("score") < 0.0)
      .select(col("id")), "disjunction + projection drops evolved col")
  }
}
