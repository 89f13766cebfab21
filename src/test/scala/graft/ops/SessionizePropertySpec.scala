package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Model check of the sessionization interval algebra: folding
  * [[Sessionize.insert]] over events in ANY insertion order must yield
  * exactly the gaps-and-islands sessions of the time-sorted sequence —
  * the invariant that makes the streaming operator correct under
  * arbitrary within-watermark disorder (late extension, interval
  * bridging, cascaded merges). */
class SessionizePropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  /** Reference model: sort by time, split where the gap exceeds `gap`. */
  private def model(ts: Seq[Long], gap: Long): Seq[(Long, Long, Long)] = {
    if (ts.isEmpty) return Seq.empty
    val sorted = ts.sorted
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var start = sorted.head
    var last = sorted.head
    var n = 1L
    sorted.tail.foreach { t =>
      if (t - last > gap) {
        out += ((start, last, n)); start = t; last = t; n = 1L
      } else { last = t; n += 1L }
    }
    out += ((start, last, n))
    out.toSeq
  }

  private val genCase = for {
    gap <- Gen.choose(1L, 50L)
    n <- Gen.choose(1, 60)
    // timestamps clustered enough that merges/bridges actually happen
    ts <- Gen.listOfN(n, Gen.choose(0L, 400L))
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield (gap, ts, new scala.util.Random(seed).shuffle(ts))

  test("insert-fold equals the gaps-and-islands model under any insertion order") {
    check(Prop.forAllNoShrink(genCase) { case (gap, ts, order) =>
      val folded = order.foldLeft(Seq.empty[Sessionize.Interval]) {
        (acc, t) => Sessionize.insert(acc, t, 1.0, gap)
      }
      val got = folded.map(s => (s.start, s.last, s.n))
      val want = model(ts, gap)
      assert(got == want, s"gap=$gap ts=$ts order=$order got=$got want=$want")
      // event counts and value mass conserved (each event carries 1.0 =
      // 100 cents in the exact fixed-point state)
      assert(folded.map(_.n).sum == ts.size)
      assert(folded.map(_.sumCents).sum == ts.size.toLong * 100L)
      // intervals sorted and strictly gap-separated
      folded.sliding(2).foreach {
        case Seq(a, b) => assert(b.start - a.last > gap, s"$a / $b not separated")
        case _ =>
      }
      true
    })
  }
}
