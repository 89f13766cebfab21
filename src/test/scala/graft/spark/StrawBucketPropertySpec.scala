package graft.spark

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the bucket algebra. The load-bearing one: the EXTERNAL
  * value form (what the v1 Filter API carries into pruning) must land in
  * exactly the bucket the INTERNAL form (what the writer routed by) did —
  * any disagreement silently prunes files that hold matching rows. */
class StrawBucketPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  private val genN = Gen.choose(1, 4096)

  test("bucketOf lands in [0, n) for every supported type") {
    check(Prop.forAll(Gen.long, genN) { (v, n) =>
      val b = StrawBucket.bucketOf(v, LongType, n)
      b >= 0 && b < n
    })
    check(Prop.forAll(Gen.asciiPrintableStr, genN) { (s, n) =>
      val b = StrawBucket.bucketOf(UTF8String.fromString(s), StringType, n)
      b >= 0 && b < n
    })
  }

  test("external filter values agree with internal routing") {
    check(Prop.forAll(Gen.long, genN) { (v, n) =>
      StrawBucket.bucketOfExternal(v, LongType, n)
        .contains(StrawBucket.bucketOf(v, LongType, n))
    })
    check(Prop.forAll(Gen.choose(Int.MinValue, Int.MaxValue), genN) { (v, n) =>
      StrawBucket.bucketOfExternal(v, IntegerType, n)
        .contains(StrawBucket.bucketOf(v, IntegerType, n))
    })
    val genStr = Gen.listOf(Gen.choose(32.toChar, 0xD7FF.toChar)).map(_.mkString)
    check(Prop.forAll(genStr, genN) { (s, n) =>
      StrawBucket.bucketOfExternal(s, StringType, n)
        .contains(StrawBucket.bucketOf(UTF8String.fromString(s), StringType, n))
    })
    check(Prop.forAll(Gen.choose(Short.MinValue, Short.MaxValue), genN) { (v, n) =>
      StrawBucket.bucketOfExternal(v.toShort, ShortType, n)
        .contains(StrawBucket.bucketOf(v.toShort, ShortType, n))
    })
    check(Prop.forAll(Gen.oneOf(true, false), genN) { (v, n) =>
      StrawBucket.bucketOfExternal(v, BooleanType, n)
        .contains(StrawBucket.bucketOf(v, BooleanType, n))
    })
  }

  test("the V2 bucket function computes the writer's hash") {
    val f = StrawBucket.BucketFunction.bind(StructType(Seq(
      StructField("n", IntegerType), StructField("k", LongType))))
      .asInstanceOf[StrawBucket.BoundBucket]
    check(Prop.forAll(Gen.long, genN) { (v, n) =>
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](n, v))
      f.produceResult(row).intValue == StrawBucket.bucketOf(v, LongType, n)
    })
  }

  test("file tags round-trip and never false-positive on plain names") {
    check(Prop.forAll(Gen.choose(0, 65535), Gen.choose(1, 65536)) { (b, n) =>
      val name = s"/x/part-00001-2-abc-0003${StrawBucket.fileTag(b % n, n, "k")}.strb"
      StrawBucket.parseTag(name).contains(
        StrawBucket.Tag(b % n, n, Some(StrawBucket.colHash("k"))))
    })
    // the pre-hash tag format still parses (hash absent -> never certifies)
    assert(StrawBucket.parseTag("/x/part-0-b00003of00016.strb")
      .contains(StrawBucket.Tag(3, 16, None)))
    assert(!StrawBucket.tagMatches(StrawBucket.Tag(3, 16, None), "k", 16))
    assert(StrawBucket.parseTag("/x/part-00001-2-abc-0003.strb").isEmpty)
    assert(StrawBucket.parseTag("/x/part-empty-deadbeef.strb").isEmpty)
    // a tag-shaped substring in a DIRECTORY must not read as a tag
    assert(StrawBucket.parseTag("/x/-b00001of00004./part-0.strb").isEmpty)
  }

  test("nulls pin to bucket 0") {
    assert(StrawBucket.bucketOf(null, LongType, 16) == 0)
    assert(StrawBucket.bucketOf(null, StringType, 7) == 0)
  }

  test("multi-column hash: single-key identity, order sensitivity, null rules") {
    // a one-column key reduces EXACTLY to bucketOf — existing single-key
    // tables' layouts must not move under the chained hash
    check(Prop.forAll(Gen.long, genN) { (v, n) =>
      StrawBucket.bucketOfMulti(Array[Any](v), Array[DataType](LongType), n) ==
        StrawBucket.bucketOf(v, LongType, n)
    })
    check(Prop.forAll(Gen.asciiPrintableStr, genN) { (s, n) =>
      val u = UTF8String.fromString(s)
      StrawBucket.bucketOfMulti(Array[Any](u), Array[DataType](StringType), n) ==
        StrawBucket.bucketOf(u, StringType, n)
    })
    // range + determinism over two-column keys
    check(Prop.forAll(Gen.long, Gen.asciiPrintableStr, genN) { (a, s, n) =>
      val dts = Array[DataType](LongType, StringType)
      val b = StrawBucket.bucketOfMulti(
        Array[Any](a, UTF8String.fromString(s)), dts, n)
      b >= 0 && b < n &&
        b == StrawBucket.bucketOfMulti(
          Array[Any](a, UTF8String.fromString(s)), dts, n)
    })
    // the chain is order-sensitive: bucket(a, b) and bucket(b, a) must be
    // allowed to differ (they do for almost all pairs at n=4096)
    val dts2 = Array[DataType](LongType, LongType)
    val diff = (0L until 200L).count(i =>
      StrawBucket.bucketOfMulti(Array[Any](i, i + 1), dts2, 4096) !=
        StrawBucket.bucketOfMulti(Array[Any](i + 1, i), dts2, 4096))
    assert(diff > 150, s"order barely matters? only $diff/200 pairs differ")
    // null rules: all-null pins to 0; (null, x) and (x, null) differ from
    // each other and from (x) alone for typical x
    assert(StrawBucket.bucketOfMulti(
      Array[Any](null, null), dts2, 16) == 0)
    val nx = StrawBucket.bucketOfMulti(Array[Any](null, 7L), dts2, 4096)
    val xn = StrawBucket.bucketOfMulti(Array[Any](7L, null), dts2, 4096)
    assert(nx >= 0 && nx < 4096 && xn >= 0 && xn < 4096 && nx != xn)
  }
}
