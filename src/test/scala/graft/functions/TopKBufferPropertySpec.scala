package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Model check of the bounded top-k heap behind `topk_by`: any insert
  * sequence, split arbitrarily into sub-buffers and merged in any
  * grouping, must retain exactly the k best (score, id) pairs of the
  * whole input under the total order (score desc|asc, id asc) — the
  * invariant that makes the aggregate's map-side partials equal the
  * window formulation regardless of partitioning. */
class TopKBufferPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  /** Reference model: full sort under the retained order, take k. */
  private def model(xs: Seq[(Double, Long)], k: Int,
      asc: Boolean): Seq[(Double, Long)] = {
    val sorted = xs.sortWith { case ((sa, ia), (sb, ib)) =>
      if (sa != sb) { if (asc) sa < sb else sa > sb } else ia < ib
    }
    sorted.take(k)
  }

  private def drain(buf: SketchFunctions.TopKBuffer,
      asc: Boolean): Seq[(Double, Long)] = {
    val entries = (0 until buf.size).map(i => (buf.scores(i), buf.ids(i)))
    entries.sortWith { case ((sa, ia), (sb, ib)) =>
      if (sa != sb) { if (asc) sa < sb else sa > sb } else ia < ib
    }
  }

  private val entriesGen: Gen[List[(Double, Long)]] = Gen.listOf(for {
    // quantized scores: plenty of planted ties
    s <- Gen.choose(0, 30).map(_ / 10.0)
    id <- Gen.choose(0L, 200L)
  } yield (s, id))

  test("inserts retain exactly the k best, both directions") {
    check(Prop.forAll(entriesGen, Gen.choose(1, 25),
        Gen.oneOf(true, false)) { (xs, k, asc) =>
      val buf = new SketchFunctions.TopKBuffer(k, asc)
      xs.foreach { case (s, id) => buf.insert(s, id) }
      drain(buf, asc) == model(xs, k, asc)
    })
  }

  test("arbitrary splits + merges equal the single-buffer fold") {
    check(Prop.forAll(entriesGen, Gen.choose(1, 25), Gen.oneOf(true, false),
        Gen.choose(1, 7)) { (xs, k, asc, parts) =>
      val chunks = xs.grouped(math.max(1, (xs.size + parts - 1) / parts)).toSeq
      val bufs = chunks.map { c =>
        val b = new SketchFunctions.TopKBuffer(k, asc)
        c.foreach { case (s, id) => b.insert(s, id) }
        b
      }
      val merged = bufs.foldLeft(new SketchFunctions.TopKBuffer(k, asc)) {
        (acc, b) =>
          var i = 0
          while (i < b.size) { acc.insert(b.scores(i), b.ids(i)); i += 1 }
          acc
      }
      drain(merged, asc) == model(xs, k, asc)
    })
  }

  test("duplicate (score, id) pairs are kept as duplicates (multiset, not set)") {
    // the scored ANN frames can't produce duplicate (query, neighbor)
    // rows, but the aggregate itself must stay a faithful multiset fold
    val buf = new SketchFunctions.TopKBuffer(3, false)
    Seq((1.0, 5L), (1.0, 5L), (0.5, 9L), (2.0, 1L)).foreach {
      case (s, id) => buf.insert(s, id)
    }
    assert(drain(buf, asc = false) == Seq((2.0, 1L), (1.0, 5L), (1.0, 5L)))
  }
}
