package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.format._

/** Property: zone-map page skipping never loses a matching row — for
  * arbitrary data, page sizes and filters, scanning only the kept pages
  * yields exactly the rows a full scan + in-memory filter yields. */
class ZoneMapPropertySpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("v", LongType), StructField("s", StringType)))

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60).withMaxSize(300), prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  private val genRows: Gen[List[(Option[Long], Option[String])]] =
    Gen.listOf(for {
      v <- Gen.option(Gen.frequency(
        5 -> Gen.chooseNum(-100L, 100L), 1 -> Gen.oneOf(Long.MinValue, Long.MaxValue)))
      s <- Gen.option(Gen.oneOf("", "a", "ab", "abcdefghij", "zz", "Zebra", "日本"))
    } yield (v, s))

  private val genFilter: Gen[Filter] = {
    val vLit = Gen.chooseNum(-100L, 100L)
    val sLit = Gen.oneOf("", "a", "ab", "abc", "zz", "Zebra", "日本", "m")
    Gen.oneOf(
      vLit.map(EqualTo("v", _)), vLit.map(GreaterThan("v", _)),
      vLit.map(GreaterThanOrEqual("v", _)), vLit.map(LessThan("v", _)),
      vLit.map(LessThanOrEqual("v", _)),
      Gen.listOfN(3, vLit).map(vs => In("v", vs.toArray.map(_.asInstanceOf[Any]))),
      Gen.const(IsNull("v")), Gen.const(IsNotNull("v")),
      sLit.map(EqualTo("s", _)), sLit.map(GreaterThan("s", _)),
      sLit.map(LessThan("s", _)),
      for (a <- vLit; b <- sLit) yield And(GreaterThanOrEqual("v", a), LessThanOrEqual("s", b)),
      for (a <- vLit; b <- vLit) yield Or(LessThan("v", a), GreaterThan("v", b)))
  }

  private def matches(f: Filter, v: Option[Long], s: Option[String]): Boolean = f match {
    case EqualTo("v", x) => v.contains(x.asInstanceOf[Long])
    case GreaterThan("v", x) => v.exists(_ > x.asInstanceOf[Long])
    case GreaterThanOrEqual("v", x) => v.exists(_ >= x.asInstanceOf[Long])
    case LessThan("v", x) => v.exists(_ < x.asInstanceOf[Long])
    case LessThanOrEqual("v", x) => v.exists(_ <= x.asInstanceOf[Long])
    case In("v", xs) => v.exists(y => xs.contains(y))
    case IsNull("v") => v.isEmpty
    case IsNotNull("v") => v.isDefined
    // string comparisons must mirror Spark's UTF8String binary ordering
    case EqualTo("s", x) => s.contains(x.asInstanceOf[String])
    case GreaterThan("s", x) =>
      s.exists(y => UTF8String.fromString(y).compareTo(
        UTF8String.fromString(x.asInstanceOf[String])) > 0)
    case LessThan("s", x) =>
      s.exists(y => UTF8String.fromString(y).compareTo(
        UTF8String.fromString(x.asInstanceOf[String])) < 0)
    case GreaterThanOrEqual("s", x) =>
      s.exists(y => UTF8String.fromString(y).compareTo(
        UTF8String.fromString(x.asInstanceOf[String])) >= 0)
    case LessThanOrEqual("s", x) =>
      s.exists(y => UTF8String.fromString(y).compareTo(
        UTF8String.fromString(x.asInstanceOf[String])) <= 0)
    case And(l, r) => matches(l, v, s) && matches(r, v, s)
    case Or(l, r) => matches(l, v, s) || matches(r, v, s)
    case other => fail(s"unhandled $other")
  }

  // --- wide decimals (precision 19..38, exact StatsDecimal128 zone maps;
  // the ±1-unit neighbors that used to stress the lossy double-approx kind
  // now also pin exact-stat soundness at every magnitude) ------------------

  private val decSchema = StructType(Seq(StructField("d", DecimalType(25, 4))))

  /** Values across 20 orders of magnitude, with ±1-unscaled-unit neighbors
    * (bump) that collapse to the same double at high magnitude — the lossy
    * case the blurred strict bounds must survive. */
  private val genDecVal: Gen[java.math.BigDecimal] = for {
    mag <- Gen.chooseNum(0, 20)
    base <- Gen.chooseNum(-9999L, 9999L)
    bump <- Gen.oneOf(0L, 1L)
  } yield new java.math.BigDecimal(
    java.math.BigInteger.valueOf(base)
      .multiply(java.math.BigInteger.TEN.pow(mag))
      .add(java.math.BigInteger.valueOf(bump)), 4)

  private val genDecRows: Gen[List[Option[java.math.BigDecimal]]] =
    Gen.listOf(Gen.option(genDecVal))

  private val genDecFilter: Gen[Filter] = Gen.oneOf(
    genDecVal.map(EqualTo("d", _)), genDecVal.map(GreaterThan("d", _)),
    genDecVal.map(GreaterThanOrEqual("d", _)), genDecVal.map(LessThan("d", _)),
    genDecVal.map(LessThanOrEqual("d", _)),
    Gen.const(IsNull("d")), Gen.const(IsNotNull("d")))

  private def decMatches(f: Filter, v: Option[java.math.BigDecimal]): Boolean = {
    def lit(x: Any) = x.asInstanceOf[java.math.BigDecimal]
    f match {
      case EqualTo("d", x) => v.exists(_.compareTo(lit(x)) == 0)
      case GreaterThan("d", x) => v.exists(_.compareTo(lit(x)) > 0)
      case GreaterThanOrEqual("d", x) => v.exists(_.compareTo(lit(x)) >= 0)
      case LessThan("d", x) => v.exists(_.compareTo(lit(x)) < 0)
      case LessThanOrEqual("d", x) => v.exists(_.compareTo(lit(x)) <= 0)
      case IsNull("d") => v.isEmpty
      case IsNotNull("d") => v.isDefined
      case other => fail(s"unhandled $other")
    }
  }

  test("wide-decimal page skipping preserves every matching row (property)") {
    check(Prop.forAllNoShrink(genDecRows, genDecFilter, Gen.oneOf(3, 7, 16)) {
      (rows, filter, pageSize) =>
        val w = new StrawFileWriter(decSchema, WriteOptions(maxPageSize = pageSize))
        rows.foreach { v =>
          w.write(new GenericInternalRow(Array[Any](
            v.map(Decimal(_, 25, 4)).orNull)))
        }
        val in = new ByteArrayInput(w.finish())
        val footer = StrawFileReader.readFooter(in)
        val keep = ZoneMapFilter.keptPages(footer, Array(filter))
        val got = StrawFileReader.rowsByField(in, footer, Array(0), keepPage = keep)
          .map(r => if (r.isNullAt(0)) None
            else Some(r.getDecimal(0, 25, 4).toJavaBigDecimal))
          .filter(v => decMatches(filter, v)).toList
        val expected = rows.filter(v => decMatches(filter, v))
        got.size == expected.size && got.zip(expected).forall {
          case (None, None) => true
          case (Some(a), Some(b)) => a.compareTo(b) == 0
          case _ => false
        }
    })
  }

  test("wide-decimal zone maps actually skip pages on a sorted range filter") {
    val w = new StrawFileWriter(decSchema, WriteOptions(maxPageSize = 100))
    for (i <- 0 until 1000) { // sorted: i * 100.0000
      val bd = new java.math.BigDecimal(
        java.math.BigInteger.valueOf(i.toLong * 1000000L), 4)
      w.write(new GenericInternalRow(Array[Any](Decimal(bd, 25, 4))))
    }
    val in = new ByteArrayInput(w.finish())
    val footer = StrawFileReader.readFooter(in)
    val nPages = footer.columns(0).pages.length
    assert(nPages == 10)
    val cut = new java.math.BigDecimal("95000.0000")
    val keep = ZoneMapFilter.keptPages(footer, Array(GreaterThanOrEqual("d", cut)))
    val kept = (0 until nPages).count(keep)
    assert(kept == 1, s"expected exactly the last page kept, got $kept")
    val got = StrawFileReader.rowsByField(in, footer, Array(0), keepPage = keep)
      .map(_.getDecimal(0, 25, 4).toJavaBigDecimal)
      .filter(_.compareTo(cut) >= 0).toList
    assert(got.size == 50)
  }

  // --- file-level stats merge (ManifestStats): the manifest's synthetic
  // one-page footer must never prune a file that contains a match — a
  // wrong merge would silently drop whole files from scans -----------------

  test("file-level stats merge never prunes a file containing a match (property)") {
    check(Prop.forAllNoShrink(genRows, genFilter, Gen.oneOf(3, 7, 16)) {
      (rows, filter, pageSize) =>
        val w = new StrawFileWriter(schema, WriteOptions(maxPageSize = pageSize))
        rows.foreach { case (v, s) =>
          w.write(new GenericInternalRow(Array[Any](
            v.map(Long.box).orNull, s.map(UTF8String.fromString).orNull)))
        }
        val in = new ByteArrayInput(w.finish())
        val footer = StrawFileReader.readFooter(in)
        val synthetic = ManifestStats.decode(schema, ManifestStats.encode(footer))
        val fileKept = ZoneMapFilter.keptPages(synthetic, Array(filter))(0)
        val anyMatch = rows.exists { case (v, s) => matches(filter, v, s) }
        // soundness: a matching row forces the file to be kept. (Sharpness
        // is not required — a kept file with no match only costs IO.)
        !anyMatch || fileKept
    })
  }

  test("file-level wide-decimal merge stays sound (property)") {
    check(Prop.forAllNoShrink(genDecRows, genDecFilter, Gen.oneOf(3, 7, 16)) {
      (rows, filter, pageSize) =>
        val w = new StrawFileWriter(decSchema, WriteOptions(maxPageSize = pageSize))
        rows.foreach { v =>
          w.write(new GenericInternalRow(Array[Any](
            v.map(Decimal(_, 25, 4)).orNull)))
        }
        val in = new ByteArrayInput(w.finish())
        val footer = StrawFileReader.readFooter(in)
        val synthetic = ManifestStats.decode(decSchema, ManifestStats.encode(footer))
        val fileKept = ZoneMapFilter.keptPages(synthetic, Array(filter))(0)
        val anyMatch = rows.exists(v => decMatches(filter, v))
        !anyMatch || fileKept
    })
  }

  test("page skipping preserves every matching row for arbitrary data and filters") {
    check(Prop.forAllNoShrink(genRows, genFilter, Gen.oneOf(3, 7, 16)) { (rows, filter, pageSize) =>
      val w = new StrawFileWriter(schema, WriteOptions(maxPageSize = pageSize))
      rows.foreach { case (v, s) =>
        w.write(new GenericInternalRow(Array[Any](
          v.map(Long.box).orNull, s.map(UTF8String.fromString).orNull)))
      }
      val in = new ByteArrayInput(w.finish())
      val footer = StrawFileReader.readFooter(in)
      val keep = ZoneMapFilter.keptPages(footer, Array(filter))
      val got = StrawFileReader.rowsByField(in, footer, Array(0, 1), keepPage = keep)
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          if (r.isNullAt(1)) None else Some(r.getUTF8String(1).toString)))
        .filter { case (v, s) => matches(filter, v, s) } // row-level re-eval, like Spark
        .toList
      val expected = rows.filter { case (v, s) => matches(filter, v, s) }
      got == expected
    })
  }
}
