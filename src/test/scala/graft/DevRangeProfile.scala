package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 two-sample-rule profile of the q_range_join BENCH ENTRY
  * itself (not a synthetic A/B shape): the r17 bench sampled +65% on the
  * round that added the per-row bins-per-interval assert_true guard, while
  * a five-run A/B on a synthetic shape measured the guard at <=7%. This
  * drill interleaves, same-JVM, warm, on the exact bench query at sf0.1:
  *   guarded  — the shipped TemporalJoin.rangeJoin
  *   bare     — an inline clone whose explode is a plain sequence()
  *              (no when/assert_true wrapper), everything else identical
  * Usage: sbt "Test/runMain graft.DevRangeProfile [sfDir] [rounds]" */
object DevRangeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("rangeprof").toString
    spark.read.parquet(s"$sfDir/events.parquet")
      .write.format("strawboat").mode("overwrite").save(s"$tmp/events")
    def ev = spark.read.format("strawboat").load(s"$tmp/events")

    val width = 90L * 60 * 1000000
    def incidents = ev
      .filter(col("event_type") === "error" && col("value") > 200)
      .select(col("event_id").as("incident_id"),
        (col("ts") - expr("INTERVAL '90' MINUTE")).as("lo"),
        (col("ts") + expr("INTERVAL '90' MINUTE")).as("hi"))
    def pts = ev.select(col("event_id").as("e_id"), col("ts").as("e_ts"),
      col("value").as("e_value"))

    def finish(joined: DataFrame): DataFrame = joined
      .groupBy(col("incident_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("e_value")), 2).as("sum_value"))
      .orderBy(col("incident_id"))

    def guarded(): DataFrame = finish(
      graft.ops.TemporalJoin.rangeJoin(incidents, "lo", "hi", pts, "e_ts",
        binWidth = width))

    // inline clone of rangeJoin with the explode guard stripped — must
    // track the shipped implementation apart from binsGuarded
    def bare(): DataFrame = {
      val iv0 = incidents; val pt0 = pts
      def num(df: DataFrame, name: String): Column =
        unix_micros(df(name).cast("timestamp"))
      val iv = iv0.filter(iv0("lo") <= iv0("hi"))
        .withColumn("__bin", explode(sequence(
          floor(num(iv0, "lo") / width).cast("long"),
          floor(num(iv0, "hi") / width).cast("long"))))
      val pt = pt0.withColumn("__bin",
        floor(num(pt0, "e_ts") / width).cast("long"))
      finish(iv.join(pt, iv("__bin") === pt("__bin"))
        .filter(pt0("e_ts") >= iv0("lo") && pt0("e_ts") <= iv0("hi"))
        .drop("__bin"))
    }

    def run(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // identical results first
    val a = guarded().collect().map(_.toString).mkString("|")
    val b = bare().collect().map(_.toString).mkString("|")
    assert(a == b, "guarded != bare results")
    println(s"rows identical: ${a.count(_ == '|') + 1} groups")
    // warm both, then interleave
    run(guarded()); run(bare())
    val gs = collection.mutable.ArrayBuffer.empty[Double]
    val bs = collection.mutable.ArrayBuffer.empty[Double]
    for (r <- 1 to rounds) {
      val g = run(guarded()); val bb = run(bare())
      gs += g; bs += bb
      println(f"round $r%d  guarded=$g%.3f  bare=$bb%.3f  ratio=${g / bb}%.2f")
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"median guarded=${med(gs.toSeq)}%.3f bare=${med(bs.toSeq)}%.3f " +
      f"ratio=${med(gs.toSeq) / med(bs.toSeq)}%.2f min ratio=${gs.min / bs.min}%.2f")
    spark.stop()
  }
}
