package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** As-of / range join semantics vs plain-Scala brute force, plus the plan
  * shapes the operators exist for (no join node / no cartesian).
  */
class TemporalJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  // deterministic pseudo-random fixtures (no Random: reproducible)
  private def probes: Seq[(Long, Long, Long)] = // (id, key, t)
    (0L until 200L).map(i => (i, i % 7, (i * 37 + 11) % 500))
  private def refs: Seq[(Long, Long, Long, Double)] = // (rid, key, t, v)
    (0L until 300L).map(i => (i, i % 9, (i * 53 + 3) % 500, i * 0.5))

  private def probeDf: DataFrame = {
    val sp = spark; import sp.implicits._
    probes.toDF("id", "k", "t")
  }
  private def refDf: DataFrame = {
    val sp = spark; import sp.implicits._
    refs.toDF("rid", "rk", "rt", "rv")
  }

  /** Brute-force as-of: nearest by |Δ| with the direction filter, greatest
    * rid on (t, direction-rank) ties, None when nothing qualifies. */
  private def expect(direction: String, allowExact: Boolean,
      tol: Option[Long]): Map[Long, Option[Long]] =
    probes.map { case (id, k, t) =>
      val cands = refs.filter(_._2 == k).filter { case (_, _, rt, _) =>
        direction match {
          case "backward" => if (allowExact) rt <= t else rt < t
          case "forward" => if (allowExact) rt >= t else rt > t
          case "nearest" => if (allowExact) true else rt != t
        }
      }.filter { case (_, _, rt, _) => tol.forall(x => math.abs(rt - t) <= x) }
      val best = direction match {
        case "backward" => cands.sortBy { case (rid, _, rt, _) => (-rt, -rid) }.headOption
        case "forward" => cands.sortBy { case (rid, _, rt, _) => (rt, -rid) }.headOption
        case "nearest" => cands.sortBy { case (rid, _, rt, _) =>
          // min |Δ|; backward preferred on cross-direction ties; greatest rid
          (math.abs(rt - t), if (rt <= t) 0L else 1L, -rid)
        }.headOption
      }
      id -> best.map(_._1)
    }.toMap

  private def run(direction: String, allowExact: Boolean = true,
      tol: Option[Long] = None, joinType: String = "inner"): Map[Long, Option[Long]] =
    TemporalJoin.asofJoin(probeDf, refDf, "k", "rk", "t", "rt",
        rightValues = Seq("rid", "rv"), rightTieBreak = "rid",
        direction = direction, allowExactMatches = allowExact,
        tolerance = tol.map(lit(_)), joinType = joinType)
      .select("id", "rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap

  test("backward == brute force (inner drops unmatched)") {
    val exp = expect("backward", allowExact = true, None)
    val got = run("backward")
    assert(got == exp.collect { case (id, Some(r)) => id -> Option(r) })
    assert(exp.values.exists(_.isEmpty), "fixture should have unmatched probes")
  }

  test("left join keeps unmatched probes with null refs") {
    val exp = expect("backward", allowExact = true, None)
    val got = run("backward", joinType = "left")
    assert(got == exp)
  }

  test("forward and nearest, with and without exact matches") {
    for (dir <- Seq("forward", "nearest"); exact <- Seq(true, false)) {
      val exp = expect(dir, exact, None).collect { case (id, Some(r)) => id -> Option(r) }
      assert(run(dir, allowExact = exact) == exp, s"dir=$dir exact=$exact")
    }
    // the fixtures contain exact-time collisions, so allowExact matters
    assert(expect("backward", allowExact = true, None) !=
      expect("backward", allowExact = false, None))
  }

  test("tolerance gates far matches; nearest respects it") {
    for (dir <- Seq("backward", "forward", "nearest")) {
      val exp = expect(dir, allowExact = true, Some(5L))
        .collect { case (id, Some(r)) => id -> Option(r) }
      assert(run(dir, tol = Some(5L)) == exp, s"dir=$dir")
      assert(exp.size < expect(dir, allowExact = true, None)
        .count(_._2.isDefined), s"tolerance should drop some matches, dir=$dir")
    }
  }

  test("duplicate (key, time) reference rows pick the greatest tie-break") {
    val sp = spark; import sp.implicits._
    val l = Seq((1L, 1L, 100L)).toDF("id", "k", "t")
    val r = Seq((10L, 1L, 90L, 1.0), (11L, 1L, 90L, 2.0), (9L, 1L, 90L, 3.0))
      .toDF("rid", "rk", "rt", "rv")
    val got = TemporalJoin.asofJoin(l, r, "k", "rk", "t", "rt",
      Seq("rid"), rightTieBreak = "rid").select("rid").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(11L))
  }

  test("asof plan has no join node and exactly one shuffle") {
    val plan = TemporalJoin.asofJoin(probeDf, refDf, "k", "rk", "t", "rt",
      Seq("rid"), rightTieBreak = "rid", direction = "nearest")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free plan:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected exactly one Exchange:\n$plan")
  }

  test("timestamp time columns: gap/tolerance via interval arithmetic") {
    val sp = spark; import sp.implicits._
    val l = Seq((1L, 1L, "2024-01-01 10:00:00"), (2L, 1L, "2024-01-01 12:00:00"))
      .toDF("id", "k", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val r = Seq((10L, 1L, "2024-01-01 09:30:00"), (20L, 1L, "2024-01-01 08:00:00"))
      .toDF("rid", "rk", "rts").withColumn("rts", col("rts").cast("timestamp"))
    val got = TemporalJoin.asofJoin(l, r, "k", "rk", "ts", "rts",
        Seq("rid"), rightTieBreak = "rid",
        tolerance = Some(expr("INTERVAL '1' HOUR")), joinType = "left")
      .select("id", "rid").collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
    // probe 1: 09:30 is 30min back (within 1h); probe 2: nearest back is
    // 09:30, 2.5h away -> out of tolerance -> null
    assert(got == Map(1L -> Some(10L), 2L -> None))
  }

  test("composite keys work as a struct column (the multi-key recipe)") {
    val sp = spark; import sp.implicits._
    val l = Seq((1L, "A", 1L, 100L), (2L, "A", 2L, 100L), (3L, "B", 1L, 100L))
      .toDF("id", "sym", "venue", "t")
      .withColumn("k", struct(col("sym"), col("venue")))
    val r = Seq((10L, "A", 1L, 90L), (11L, "A", 2L, 95L), (12L, "B", 9L, 80L))
      .toDF("rid", "rsym", "rvenue", "rt")
      .withColumn("rk", struct(col("rsym"), col("rvenue")))
    val got = TemporalJoin.asofJoin(l, r, "k", "rk", "t", "rt",
        Seq("rid"), rightTieBreak = "rid")
      .select("id", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    // (A,1)->10, (A,2)->11; (B,1) has no ref — (B,9) must NOT leak in
    assert(got == Map(1L -> 10L, 2L -> 11L))
  }

  test("asofBothJoin: both neighbors match the directional brute forces") {
    val expB = expect("backward", allowExact = true, None)
    val expF = expect("forward", allowExact = true, None)
    val got = TemporalJoin.asofBothJoin(probeDf, refDf, "k", "rk", "t", "rt",
        Seq("rid"), rightTieBreak = "rid", joinType = "left")
      .select("id", "bwd_rid", "fwd_rid").collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    probes.foreach { case (id, _, _) =>
      assert(got(id) == ((expB(id), expF(id))), s"probe $id")
    }
    // inner requires BOTH neighbors
    val inner = TemporalJoin.asofBothJoin(probeDf, refDf, "k", "rk", "t", "rt",
        Seq("rid"), rightTieBreak = "rid")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(inner == probes.map(_._1)
      .filter(id => expB(id).isDefined && expF(id).isDefined).toSet)
    // still one exchange, no join node
    val plan = TemporalJoin.asofBothJoin(probeDf, refDf, "k", "rk", "t", "rt",
        Seq("rid"), rightTieBreak = "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && "Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("null keys and times never match (merge_asof semantics)") {
    val sp = spark; import sp.implicits._
    val l = Seq((1L, Option(1L), Option(100L)), (2L, None, Option(100L)),
      (3L, Option(1L), None)).toDF("id", "k", "t")
    val r = Seq((10L, Option(1L), Option(90L), 1.0),
      (11L, Option.empty[Long], Option(90L), 2.0), // null-key ref: invisible
      (12L, Option(1L), Option.empty[Long], 3.0))  // null-time ref: invisible
      .toDF("rid", "rk", "rt", "rv")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val got = TemporalJoin.asofJoin(l, r, "k", "rk", "t", "rt",
          Seq("rid"), rightTieBreak = "rid", direction = dir,
          joinType = "left")
        .select("id", "rid").collect()
        .map(x => x.getLong(0) -> Option(x.get(1))).toMap
      // probe 1 matches rid 10 (backward/nearest) or nothing (forward);
      // probes 2 and 3 (null key / null time) never match anything
      assert(got(2L).isEmpty && got(3L).isEmpty, s"dir=$dir: $got")
      if (dir != "forward") assert(got(1L).contains(10L), s"dir=$dir: $got")
      val inner = TemporalJoin.asofJoin(l, r, "k", "rk", "t", "rt",
          Seq("rid"), rightTieBreak = "rid", direction = dir)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(!inner.contains(2L) && !inner.contains(3L), s"dir=$dir")
    }
  }

  // ---- rangeJoin -------------------------------------------------------

  test("rangeJoin == brute force, each pair exactly once, bin edges included") {
    val sp = spark; import sp.implicits._
    val ivs = (0L until 60L).map { i =>
      val lo = (i * 71 + 5) % 400; (i, lo, lo + (i % 5) * 25)
    }
    val pts = (0L until 500L).map(p => (p, (p * 13 + 2) % 450))
    val ivDf = ivs.toDF("iid", "lo", "hi")
    val ptDf = pts.toDF("pid", "pt")
    val expected = (for {
      (iid, lo, hi) <- ivs; (pid, pt) <- pts if pt >= lo && pt <= hi
    } yield (iid, pid)).sorted
    for (width <- Seq(10L, 25L, 100L)) {
      val got = TemporalJoin.rangeJoin(ivDf, "lo", "hi", ptDf, "pt", width)
        .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sorted
      assert(got == expected, s"width=$width")
    }
    assert(expected.nonEmpty)
    // multiplicity: exactly once even when an interval spans many bins
    val once = TemporalJoin.rangeJoin(ivDf, "lo", "hi", ptDf, "pt", 7L)
      .groupBy("iid", "pid").count().filter(col("count") > 1).count()
    assert(once == 0L)
  }

  test("rangeOverlapJoin == brute force, exactly once, across bin widths") {
    val sp = spark; import sp.implicits._
    val as = (0L until 50L).map { i =>
      val lo = (i * 83 + 11) % 400; (i, lo, lo + (i % 7) * 20)
    }
    val bs = (0L until 70L).map { j =>
      val lo = (j * 59 + 3) % 420; (j, lo, lo + (j % 5) * 25)
    }
    val aDf = as.toDF("aid", "alo", "ahi")
    val bDf = bs.toDF("bid", "blo", "bhi")
    val expected = (for {
      (aid, alo, ahi) <- as; (bid, blo, bhi) <- bs
      if alo <= bhi && blo <= ahi
    } yield (aid, bid)).sorted
    assert(expected.nonEmpty)
    for (width <- Seq(7L, 25L, 120L)) {
      val got = TemporalJoin.rangeOverlapJoin(aDf, "alo", "ahi", bDf, "blo", "bhi", width)
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sorted
      assert(got == expected, s"width=$width")
    }
    val dupes = TemporalJoin.rangeOverlapJoin(aDf, "alo", "ahi", bDf, "blo", "bhi", 10L)
      .groupBy("aid", "bid").count().filter(col("count") > 1).count()
    assert(dupes == 0L, "each overlapping pair must emit exactly once")
  }

  test("rangeJoin honors extra equality keys and plans a hash join (no cartesian)") {
    val sp = spark; import sp.implicits._
    val ivDf = Seq((1L, 0L, 100L, "a"), (2L, 0L, 100L, "b")).toDF("iid", "lo", "hi", "ig")
    val ptDf = Seq((10L, 50L, "a"), (11L, 50L, "b"), (12L, 50L, "c")).toDF("pid", "pt", "pg")
    val joined = TemporalJoin.rangeJoin(ivDf, "lo", "hi", ptDf, "pt", 50L,
      extraKeys = Seq(("ig", "pg")))
    val got = joined.select("iid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 11L)))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"range join must not plan a cartesian:\n$plan")
  }

  test("nearest + tolerance: per-side gating pinned (merge_asof semantics)") {
    val sp = spark; import sp.implicits._
    // tolerance filters EACH side's candidate before the nearer-side
    // choice — structurally the merge_asof filter-then-pick order. (For a
    // symmetric tolerance the two orders agree — if the nearer gap is out
    // the farther one is too — but this pins the contract.)
    val l = Seq((1L, 1L, 100L), (2L, 1L, 200L), (3L, 1L, 300L),
      (4L, 1L, 400L), (5L, 1L, 500L)).toDF("id", "k", "t")
    val r = Seq(
      (10L, 1L, 97L, 0.0), (11L, 1L, 101L, 0.0), // probe 1: fwd gap 1 wins
      (12L, 1L, 196L, 0.0), (13L, 1L, 205L, 0.0), // probe 2: both out of tol
      (14L, 1L, 299L, 0.0), // probe 3: backward-only, gap 1, in
      (15L, 1L, 403L, 0.0), // probe 4: forward-only, gap 3, out
      (16L, 1L, 500L, 0.0), (17L, 1L, 501L, 0.0)) // probe 5: exact excluded
      .toDF("rid", "rk", "rt", "rv")
    def run(allowExact: Boolean): Map[Long, Option[Long]] =
      TemporalJoin.asofJoin(l, r, "k", "rk", "t", "rt", Seq("rid"),
        rightTieBreak = "rid", direction = "nearest", joinType = "left",
        allowExactMatches = allowExact, tolerance = Some(lit(2L)))
        .select("id", "rid").collect()
        .map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long]))
        .toMap
    assert(run(allowExact = true) == Map(1L -> Some(11L), 2L -> None,
      3L -> Some(14L), 4L -> None, 5L -> Some(16L)))
    // exact match excluded: probe 5 falls to rid 17 (gap 1, within tol)
    assert(run(allowExact = false)(5L) == Some(17L))
  }

  test("bin joins fail loudly past the replication cap; sane widths pass") {
    val sp = spark; import sp.implicits._
    val iv = Seq((1L, 0L, 500L)).toDF("iid", "lo", "hi")
    val pt = Seq((10L, 250L)).toDF("pid", "pt")
    // 501 bins at width 1 > cap 100 -> executor-side assert_true raises
    val err = intercept[Exception] {
      TemporalJoin.rangeJoin(iv, "lo", "hi", pt, "pt", 1L,
        maxBinsPerInterval = 100).count()
    }
    assert(err.getMessage != null && err.getMessage.contains("replicates"),
      s"expected the replication-cap message, got: ${err.getMessage}")
    // same data passes at the same cap with a sane width
    assert(TemporalJoin.rangeJoin(iv, "lo", "hi", pt, "pt", 100L,
      maxBinsPerInterval = 100).count() == 1L)
    // overlap join carries the same guard
    val b = Seq((2L, 400L, 600L)).toDF("bid", "blo", "bhi")
    intercept[Exception] {
      TemporalJoin.rangeOverlapJoin(iv, "lo", "hi", b, "blo", "bhi", 1L,
        maxBinsPerInterval = 100).count()
    }
    assert(TemporalJoin.rangeOverlapJoin(iv, "lo", "hi", b, "blo", "bhi",
      500L, maxBinsPerInterval = 100).count() == 1L)
  }

  test("inverted (lo > hi) intervals never match, either family") {
    val sp = spark; import sp.implicits._
    val iv = Seq((1L, 10L, 5L)).toDF("iid", "lo", "hi") // malformed
    val pt = Seq((10L, 7L)).toDF("pid", "pt")
    assert(TemporalJoin.rangeJoin(iv, "lo", "hi", pt, "pt", 2L).count() == 0L)
    // before the guard, [10,5] x [3,20] satisfied aLo<=bHi && bLo<=aHi
    // through sequence()'s auto-step -1 — now the row drops pre-explode
    val b = Seq((2L, 3L, 20L)).toDF("bid", "blo", "bhi")
    assert(TemporalJoin.rangeOverlapJoin(iv, "lo", "hi", b, "blo", "bhi", 5L)
      .count() == 0L)
    // and an inverted long span cannot trip the replication cap either
    val ivBig = Seq((1L, 1000000L, 0L)).toDF("iid", "lo", "hi")
    assert(TemporalJoin.rangeJoin(ivBig, "lo", "hi", pt, "pt", 1L,
      maxBinsPerInterval = 10).count() == 0L)
  }

  test("suggestBinWidth: span quantile, timestamp units, empty-safe") {
    val sp = spark; import sp.implicits._
    val iv = Seq((1L, 0L, 10L), (2L, 5L, 15L), (3L, 20L, 30L),
      (4L, 0L, 100L), (5L, 9L, 2L)) // last row inverted: ignored
      .toDF("iid", "lo", "hi")
    assert(TemporalJoin.suggestBinWidth(iv, "lo", "hi", 0.5) == 10L)
    assert(TemporalJoin.suggestBinWidth(iv, "lo", "hi") == 100L) // p95 tail
    // timestamps: micros — a 1-hour span suggests 3.6e9 at q=1
    val ts = Seq(("2024-01-01 10:00:00", "2024-01-01 11:00:00"))
      .toDF("lo", "hi")
      .select(col("lo").cast("timestamp").as("lo"),
        col("hi").cast("timestamp").as("hi"))
    assert(TemporalJoin.suggestBinWidth(ts, "lo", "hi", 1.0) == 3600000000L)
    assert(TemporalJoin.suggestBinWidth(iv.filter(lit(false)), "lo", "hi") == 1L)
    intercept[IllegalArgumentException] {
      TemporalJoin.suggestBinWidth(iv, "lo", "hi", 0.0)
    }
  }

  test("asofJoinBucketed == asofJoin across directions, exact-match, " +
      "tolerance, join type, and bucket widths (incl. degenerate)") {
    val l = probeDf
    val r = refDf
    def run(dir: String, allowExact: Boolean, tol: Option[Long],
        jt: String, width: Long): Seq[(Long, Option[Long])] =
      TemporalJoin.asofJoinBucketed(l, r, "k", "rk", "t", "rt", Seq("rid"),
          rightTieBreak = "rid", bucketWidth = width, direction = dir,
          allowExactMatches = allowExact,
          tolerance = tol.map(x => lit(x)), joinType = jt)
        .select("id", "rid").collect()
        .map(x => (x.getLong(0), Option(x.get(1)).map(_.asInstanceOf[Long])))
        .toSeq.sortBy(_._1)
    def runPlain(dir: String, allowExact: Boolean, tol: Option[Long],
        jt: String): Seq[(Long, Option[Long])] =
      TemporalJoin.asofJoin(l, r, "k", "rk", "t", "rt", Seq("rid"),
          rightTieBreak = "rid", direction = dir,
          allowExactMatches = allowExact,
          tolerance = tol.map(x => lit(x)), joinType = jt)
        .select("id", "rid").collect()
        .map(x => (x.getLong(0), Option(x.get(1)).map(_.asInstanceOf[Long])))
        .toSeq.sortBy(_._1)
    for (dir <- Seq("backward", "forward", "nearest");
         ae <- Seq(true, false);
         tol <- Seq(None, Some(5L));
         jt <- Seq("inner", "left");
         // width 1 = one bucket per tick (all carry), 37 = odd split,
         // 10000 = one bucket (degenerates to the plain sweep)
         width <- Seq(1L, 37L, 10000L)) {
      assert(run(dir, ae, tol, jt, width) == runPlain(dir, ae, tol, jt),
        s"dir=$dir ae=$ae tol=$tol jt=$jt width=$width")
    }
    // timestamps ride the micros axis: a quick timestamp-typed case
    val sp = spark; import sp.implicits._
    val lts = Seq((1L, 1L, "2024-01-01 10:00:00"), (2L, 1L, "2024-01-01 12:00:00"))
      .toDF("id", "k", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val rts = Seq((10L, 1L, "2024-01-01 09:30:00", 1.0),
      (20L, 1L, "2024-01-01 11:45:00", 2.0))
      .toDF("rid", "rk", "rts", "rv")
      .withColumn("rts", col("rts").cast("timestamp"))
    val got = TemporalJoin.asofJoinBucketed(lts, rts, "k", "rk", "ts", "rts",
        Seq("rid"), rightTieBreak = "rid", bucketWidth = 3600000000L)
      .select("id", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(got == Map(1L -> 10L, 2L -> 20L))
  }

  test("asofBothJoinBucketed == asofBothJoin across exact-match, join " +
      "type, and bucket widths (incl. degenerate)") {
    val l = probeDf
    val r = refDf
    def run(ae: Boolean, jt: String,
        width: Option[Long]): Seq[(Long, Option[Long], Option[Long])] = {
      val df = width match {
        case Some(w) => TemporalJoin.asofBothJoinBucketed(l, r, "k", "rk",
          "t", "rt", Seq("rid"), rightTieBreak = "rid", bucketWidth = w,
          allowExactMatches = ae, joinType = jt)
        case None => TemporalJoin.asofBothJoin(l, r, "k", "rk", "t", "rt",
          Seq("rid"), rightTieBreak = "rid", allowExactMatches = ae,
          joinType = jt)
      }
      df.select("id", "bwd_rid", "fwd_rid").collect()
        .map(x => (x.getLong(0),
          Option(x.get(1)).map(_.asInstanceOf[Long]),
          Option(x.get(2)).map(_.asInstanceOf[Long])))
        .toSeq.sortBy(_._1)
    }
    for (ae <- Seq(true, false);
         jt <- Seq("inner", "left");
         width <- Seq(1L, 37L, 10000L)) {
      assert(run(ae, jt, Some(width)) == run(ae, jt, None),
        s"ae=$ae jt=$jt width=$width")
    }
    // structural: both sweeps partition by (key, bucket) — the hot-key
    // ceiling is gone in BOTH directions
    val plan = TemporalJoin.asofBothJoinBucketed(l, r, "k", "rk", "t", "rt",
        Seq("rid"), rightTieBreak = "rid", bucketWidth = 50L)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val sweeps = plan.collect {
      case w: LWindow if w.windowExpressions.exists(e =>
        e.toString.contains("__rb") || e.toString.contains("__rf")) => w
    }
    assert(sweeps.nonEmpty, "expected the both-direction sweep windows")
    sweeps.foreach { w =>
      assert(w.partitionSpec.size == 2,
        s"sweep must partition by (key, bucket): ${w.partitionSpec}")
    }
  }

  test("asofJoinBucketed splits a hot key across (key, bucket) partitions") {
    // structural proof the skew ceiling is gone: the sweep window's
    // partition key carries the bucket, so one key's rows cannot all
    // land in one window partition
    val plan = TemporalJoin.asofJoinBucketed(probeDf, refDf, "k", "rk",
        "t", "rt", Seq("rid"), rightTieBreak = "rid", bucketWidth = 50L)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val sweepWindows = plan.collect {
      case w: LWindow if w.windowExpressions.exists(
        _.toString.contains("__ref")) => w
    }
    assert(sweepWindows.nonEmpty, "expected the sweep window")
    sweepWindows.foreach { w =>
      assert(w.partitionSpec.size == 2,
        s"sweep must partition by (key, bucket): ${w.partitionSpec}")
    }
  }

  test("rangeJoin rejects colliding names; binWidth <= 0 auto-derives") {
    val sp = spark; import sp.implicits._
    val a = Seq((1L, 2L, 3L)).toDF("x", "lo", "hi")
    val b = Seq((1L, 2L)).toDF("x", "pt")
    intercept[IllegalArgumentException] {
      TemporalJoin.rangeJoin(a, "lo", "hi", b, "pt", 10L)
    }
    // binWidth <= 0 = derive from the p95 span instead of failing
    val iv = Seq((1L, 100L, 200L), (2L, 150L, 160L), (3L, 900L, 950L))
      .toDF("iid", "lo", "hi")
    val pts = Seq((10L, 155L), (11L, 199L), (12L, 500L)).toDF("pid", "pt")
    val auto = TemporalJoin.rangeJoin(iv, "lo", "hi", pts, "pt", 0L)
      .select("iid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val explicit = TemporalJoin.rangeJoin(iv, "lo", "hi", pts, "pt",
        TemporalJoin.suggestBinWidth(iv, "lo", "hi"))
      .select("iid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == explicit && auto == Set((1L, 10L), (1L, 11L), (2L, 10L)))
    // overlap join too
    val bIv = Seq((20L, 120L, 180L)).toDF("bid", "blo", "bhi")
    assert(TemporalJoin.rangeOverlapJoin(iv, "lo", "hi", bIv, "blo", "bhi", 0L)
      .select("iid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 20L), (2L, 20L)))
  }
}
