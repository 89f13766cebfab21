package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev measurement (test scope): the per-query top-k ranking stage at
  * scored-frame scale — `topk_by` (bounded mergeable aggregate; map tasks
  * ship k entries per query) vs the window formulation (row_number over
  * PARTITION BY query_id, which shuffles every scored row into #queries
  * partitions and sorts each). The ANN tiers produce exactly this frame
  * as corpus × queries; equality of results is spec-pinned, this drill
  * measures the structural gap and its scaling.
  * Usage: sbt "Test/runMain graft.DevTopKScale [nRows] [nQueries] [k]" */
object DevTopKScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nQ = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val k = args.drop(2).headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.SketchFunctions.register(spark)
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // deterministic scored frame with ties: the ANN post-join shape
    val scored = spark.range(n).select(
      pmod(col("id"), lit(nQ.toLong)).as("query_id"),
      col("id").as("neighbor_id"),
      (pmod(xxhash64(col("id")), lit(100000L)).cast("double") / 100.0)
        .as("cosine"))

    def winV(): Long = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k).count()
    }
    def aggV(): Long =
      scored.groupBy(col("query_id"))
        .agg(graft.functions.SketchFunctions.topKBy(
          col("cosine"), col("neighbor_id"), k).as("_top"))
        .select(col("query_id"), explode(col("_top")).as("e"))
        .count()

    assert(winV() == aggV(), "formulations must agree on row count")
    val wins = Seq.fill(3)(time(winV(): Unit)).sorted
    val aggs = Seq.fill(3)(time(aggV(): Unit)).sorted
    println(f"TOPK n=$n%,d queries=$nQ k=$k window=${wins.head}%.2f s " +
      f"agg=${aggs.head}%.2f s speedup=${wins.head / aggs.head}%.2fx")
    // exactness at full fidelity on a 1/100 slice (count() above only
    // proves cardinality; this proves the actual pairs)
    val slice = scored.filter(col("neighbor_id") % 100 === 0)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val a = slice.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = slice.groupBy(col("query_id"))
      .agg(graft.functions.SketchFunctions.topKBy(
        col("cosine"), col("neighbor_id"), k).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_r", "_e")))
      .select(col("query_id"), col("_e.id"), (col("_r") + 1).cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    println(s"EXACT slice pairs equal: ${a == b} (${a.size} rows)")
    spark.stop()
  }
}
