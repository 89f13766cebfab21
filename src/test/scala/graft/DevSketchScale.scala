package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale drill for the sketch aggregates (not part of `sbt test`):
  *
  *   sbt "Test/runMain graft.DevSketchScale [rows]"
  *
  * 1. Heavy hitters over a zipf token stream: mg_topk sketch→verify vs
  *    the full groupBy(token).count + top-k. Both exact (the skew
  *    clears the membership bound); the sketch path shuffles one bounded
  *    summary per task instead of the full distinct-key space.
  * 2. Per-group deterministic k-sample: bottomk_sample aggregate vs the
  *    row_number-over-md5 window. Identical samples; the window sorts
  *    every row of every group, the aggregate keeps k per task.
  */
object DevSketchScale {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 20000000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.SketchFunctions.register(spark)

    // zipf-ish tokens: rank r with mass ~ 1/r over ~1M distinct; the hash
    // keeps heavy ranks interleaved with the tail
    val toks = spark.range(rows).select(
      concat(lit("w"), floor(pow(lit(1000000.0),
        pmod(xxhash64(col("id")), lit(1000000L)) / 1000000.0)).cast("long").cast("string"))
        .as("w"))

    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val exact = time(s"full groupBy+count top-20 ($rows rows)") {
      toks.groupBy("w").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w")).limit(20).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    val sketched = time("mg_topk(1024) sketch -> verify top-20") {
      val cands = toks.agg(graft.functions.SketchFunctions.mgTopK(col("w"), 1024).as("sk"))
        .select(explode(col("sk")).as("e")).select(col("e.item").as("w"))
      toks.join(broadcast(cands), "w")
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w")).limit(20).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    require(sketched == exact, s"sketch->verify diverged:\n$sketched\n$exact")
    println("  heavy-hitter identity: OK")

    // distinct keys the exact path had to shuffle
    val nd = toks.select(approx_count_distinct(col("w"))).collect()(0).getLong(0)
    println(s"  ~distinct tokens: $nd (exact path shuffles them all; sketch ships 1024/task)")

    // --- per-group sample ---------------------------------------------------
    val grouped = spark.range(rows / 4).select(
      pmod(xxhash64(col("id")), lit(32L)).as("g"),
      col("id").cast("string").as("item"))
    val viaAgg = time(s"bottomk_sample(16) per 32 groups (${rows / 4} rows)") {
      grouped.groupBy("g")
        .agg(graft.functions.SketchFunctions.bottomKSample(col("item"), 16).as("s"))
        .select(col("g"), explode(col("s")).as("item")).collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    }
    val viaWindow = time("row_number over md5 window (same sample)") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(md5(col("item")))
      grouped.withColumn("rn", row_number().over(w)).filter(col("rn") <= 16)
        .select("g", "item").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    }
    require(viaAgg == viaWindow, "sample mismatch between aggregate and window")
    println("  sample identity: OK")
    spark.stop()
  }
}
