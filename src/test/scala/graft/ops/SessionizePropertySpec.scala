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

  private val genValued = for {
    gap <- Gen.choose(1L, 50L)
    n <- Gen.choose(1, 60)
    events <- Gen.listOfN(n, for {
      t <- Gen.choose(0L, 400L)
      // magnitudes spanning ten orders so cancellation/rounding differ by
      // order; the property characterizes the DRIFT BOUND, not exactness
      v <- Gen.oneOf(Gen.choose(-1e6, 1e6), Gen.choose(-1e-4, 1e-4))
    } yield (t, v))
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield (gap, events, new scala.util.Random(seed).shuffle(events))

  test("Unrounded totals: any insertion order agrees within n·ulp drift") {
    check(Prop.forAllNoShrink(genValued) { case (gap, events, order) =>
      def fold(evs: Seq[(Long, Double)]): Seq[Sessionize.Interval] =
        evs.foldLeft(Seq.empty[Sessionize.Interval]) { case (acc, (t, v)) =>
          Sessionize.insert(acc, t, v, gap, Sessionize.Unrounded)
        }
      val a = fold(events)
      val b = fold(order)
      // interval STRUCTURE is order-independent (first property); only the
      // floating sum may drift, bounded by n additions of magnitude <= Σ|v|
      assert(a.map(s => (s.start, s.last, s.n)) ==
        b.map(s => (s.start, s.last, s.n)))
      val sumAbs = events.map(x => math.abs(x._2)).sum
      val tol = 2.0 * events.size * Math.ulp(sumAbs + 1.0)
      a.zip(b).foreach { case (x, y) =>
        val (dx, dy) = (java.lang.Double.longBitsToDouble(x.sumCents),
          java.lang.Double.longBitsToDouble(y.sumCents))
        assert(math.abs(dx - dy) <= tol,
          s"order drift ${math.abs(dx - dy)} beyond $tol for $x vs $y")
      }
      true
    })
  }

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
