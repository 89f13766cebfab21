package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale drill for the temporal joins (not part of `sbt test`):
  *
  *   sbt "Test/runMain graft.DevTemporalScale [nProbes] [nRefs]"
  *
  * 1. asofJoin at millions of rows vs the naive theta-join formulation
  *    (JOIN ... ON key = key AND rt <= t, then keep the max rt) — the
  *    naive plan explodes per key (rows × refs/key) before aggregating
  *    back down; the sweep stays linear. Results must be identical.
  * 2. rangeJoin (no equality key) vs the naive inequality join, which
  *    Spark can only plan as a broadcast-nested-loop — O(intervals ×
  *    points) comparisons. Results must be identical.
  */
object DevTemporalScale {
  def main(args: Array[String]): Unit = {
    val nProbes = if (args.length > 0) args(0).toInt else 2000000
    val nRefs = if (args.length > 1) args(1).toInt else 2000000
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nKeys = 1000
    val probes = spark.range(nProbes.toLong)
      .select(col("id"), pmod(xxhash64(col("id")), lit(nKeys)).as("k"),
        pmod(xxhash64(col("id") + 7), lit(100000000L)).as("t"))
    val refs = spark.range(nRefs.toLong)
      .select(col("id").as("rid"), pmod(xxhash64(col("id") + 13), lit(nKeys)).as("rk"),
        pmod(xxhash64(col("id") + 31), lit(100000000L)).as("rt"),
        (col("id") % 1000).cast("double").as("rv"))

    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // --- as-of: sweep vs naive theta-join ---------------------------------
    val skipBaselines = args.length > 2 && args(2) == "extreme"
    if (!skipBaselines) {
    val sweep = time(s"asof sweep ($nProbes probes x $nRefs refs)") {
      val out = graft.ops.TemporalJoin.asofJoin(probes, refs,
        "k", "rk", "t", "rt", Seq("rid", "rv"), rightTieBreak = "rid")
      out.agg(count(lit(1)), sum(hash(col("id"), col("rid")).cast("long")))
        .collect()(0)
    }
    println(s"  sweep rows/checksum: $sweep")

    // the naive formulation at the SAME size would materialize
    // probes × (refs per key) pairs — run it on a 1/32 slice and scale up
    val sliceKeys = nKeys / 32
    val pSlice = probes.filter(col("k") < sliceKeys)
    val rSlice = refs.filter(col("rk") < sliceKeys)
    val naive = time(s"naive theta-join (1/32 key slice!)") {
      val joined = pSlice.join(rSlice, col("k") === col("rk") && col("rt") <= col("t"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("rt").desc, col("rid").desc)
      joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .agg(count(lit(1)), sum(hash(col("id"), col("rid")).cast("long")))
        .collect()(0)
    }
    println(s"  naive rows/checksum (slice): $naive")
    val sweepSlice = time("asof sweep on the same slice (identity check)") {
      graft.ops.TemporalJoin.asofJoin(pSlice, rSlice,
          "k", "rk", "t", "rt", Seq("rid", "rv"), rightTieBreak = "rid")
        .agg(count(lit(1)), sum(hash(col("id"), col("rid")).cast("long")))
        .collect()(0)
    }
    require(sweepSlice == naive, s"slice mismatch: $sweepSlice vs $naive")
    println("  slice identity: OK")

    // --- range join: bins vs broadcast-nested-loop ------------------------
    val nIv = 2000
    val ivs = spark.range(nIv.toLong).select(col("id").as("iid"),
        pmod(xxhash64(col("id") + 3), lit(100000000L)).as("lo"))
      .withColumn("hi", col("lo") + 50000L)
    val pts = probes.select(col("id").as("pid"), col("t").as("pt"))
    val binned = time(s"rangeJoin bins ($nIv intervals x $nProbes points)") {
      graft.ops.TemporalJoin.rangeJoin(ivs, "lo", "hi", pts, "pt", 50000L)
        .agg(count(lit(1)), sum(hash(col("iid"), col("pid")).cast("long")))
        .collect()(0)
    }
    println(s"  bins rows/checksum: $binned")
    val bnl = time("naive inequality join (broadcast-nested-loop)") {
      ivs.join(pts, col("pt") >= col("lo") && col("pt") <= col("hi"))
        .agg(count(lit(1)), sum(hash(col("iid"), col("pid")).cast("long")))
        .collect()(0)
    }
    require(binned == bnl, s"range mismatch: $binned vs $bnl")
    println("  range identity: OK")
    } // !skipBaselines

    // --- as-of skew arm: one key carries half of both sides --------------
    // The window sweep is per-key SEQUENTIAL: a hot key lands on one task
    // and cannot split (unlike AQE skew-join splitting — the sweep needs
    // the key's full time order). Measure the ceiling: it is the sort of
    // the hot key's rows, still far cheaper than the naive join's
    // hot-key CARTESIAN (probes × refs within the key).
    // third arg "extreme" (== skipBaselines above): ONE key holds
    // everything — the shape where the per-key-sequential ceiling binds
    // outright and bucketing must win
    val extreme = skipBaselines
    val skewP =
      if (extreme) probes.withColumn("k", lit(0L))
      else probes.withColumn("k",
        when(pmod(col("id"), lit(2)) === 0, lit(0L)).otherwise(col("k")))
    val skewR =
      if (extreme) refs.withColumn("rk", lit(0L))
      else refs.withColumn("rk",
        when(pmod(col("rid"), lit(2)) === 0, lit(0L)).otherwise(col("rk")))
    val skew = time(s"asof sweep, one key holding half of both sides") {
      graft.ops.TemporalJoin.asofJoin(skewP, skewR,
          "k", "rk", "t", "rt", Seq("rid", "rv"), rightTieBreak = "rid")
        .agg(count(lit(1)), sum(hash(col("id"), col("rid")).cast("long")))
        .collect()(0)
    }
    println(s"  skew rows/checksum: $skew")

    // --- bucketed skew arm: the same hot key split across time buckets ---
    // asofJoinBucketed partitions the sweep by (key, bucket) with a
    // carry-in pre-pass, so the hot key's rows spread over its buckets'
    // tasks. Same result checksum required.
    val width = 1000000L / 64 // ~64 buckets over the time range
    val skewB = time(s"asof BUCKETED sweep, same hot key, width=$width") {
      graft.ops.TemporalJoin.asofJoinBucketed(skewP, skewR,
          "k", "rk", "t", "rt", Seq("rid", "rv"), rightTieBreak = "rid",
          bucketWidth = width)
        .agg(count(lit(1)), sum(hash(col("id"), col("rid")).cast("long")))
        .collect()(0)
    }
    println(s"  bucketed skew rows/checksum: $skewB")
    require(skew == skewB, s"bucketed result drifted: $skew vs $skewB")

    // --- both-neighbor skew arm: the interpolation building block --------
    // asofBothJoin sweeps each direction per key (two sequential sorts of
    // the hot key); asofBothJoinBucketed spreads both sweeps across
    // (key, bucket) with carry-in AND carry-out rows. Checksum identity.
    val both = time("asof BOTH sweep, same hot key (plain)") {
      graft.ops.TemporalJoin.asofBothJoin(skewP, skewR,
          "k", "rk", "t", "rt", Seq("rid", "rv"), rightTieBreak = "rid",
          joinType = "left")
        .agg(count(lit(1)),
          sum(hash(col("id"), col("bwd_rid"), col("fwd_rid")).cast("long")))
        .collect()(0)
    }
    println(s"  both rows/checksum: $both")
    val bothB = time(s"asof BOTH bucketed sweep, same hot key, width=$width") {
      graft.ops.TemporalJoin.asofBothJoinBucketed(skewP, skewR,
          "k", "rk", "t", "rt", Seq("rid", "rv"), rightTieBreak = "rid",
          bucketWidth = width, joinType = "left")
        .agg(count(lit(1)),
          sum(hash(col("id"), col("bwd_rid"), col("fwd_rid")).cast("long")))
        .collect()(0)
    }
    println(s"  bucketed both rows/checksum: $bothB")
    require(both == bothB, s"bucketed both drifted: $both vs $bothB")
    spark.stop()
  }
}
