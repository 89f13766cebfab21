package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale drill for substring-span dedup (not part of `sbt test`):
  * synthetic corpus of `nDocs` documents (~40 tokens each) where one doc
  * in `dupEvery` carries a planted 12-token boilerplate block — the
  * realistic shape (a license header / navigation chrome shared by a
  * fraction of the corpus). Checks: span count equals the planted count,
  * every planted doc's span covers exactly the boilerplate, and the
  * wall-clock scales with the corpus (the only corpus shuffle carries
  * (md5, doc, start); the island merge windows per DOC).
  * Usage: sbt "Test/runMain graft.DevSpanScale [nDocs] [dupEvery]" */
object DevSpanScale {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(200000)
    val dupEvery = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // globally unique filler per (doc, position) — hash-bucketed filler
    // collides across planted docs at this corpus size and legitimately
    // extends some spans past the planted block, which is correct
    // behavior but breaks the drill's exact-coordinate check
    val boiler = "the quick brown fox jumps over the lazy dog near the riverbank"
    val filler = (i: org.apache.spark.sql.Column, j: Int) =>
      concat(lit("u"), (i * 40 + j).cast("string"))
    val fillerCols = (0 until 40).map(j => filler(col("id"), j))
    val docs = spark.range(nDocs.toLong)
      .select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(dupEvery.toLong)) === 0,
          concat_ws(" ",
            (fillerCols.take(14) :+ lit(boiler)) ++ fillerCols.drop(34): _*))
          .otherwise(concat_ws(" ", fillerCols: _*)).as("text"))
      .repartition(32)
    docs.localCheckpoint(true) // freeze the corpus out of the timing
    val frozen = docs.localCheckpoint(true)
    val t0 = System.nanoTime()
    val spans = graft.ops.Dedup.duplicateSpans(frozen, "doc_id", "text", 12)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val planted = (nDocs + dupEvery - 1) / dupEvery
    println(f"SPANS $nDocs%,d docs, planted $planted%,d: got ${spans.length}%,d " +
      f"spans in $secs%.1f s")
    require(spans.length == planted,
      s"expected $planted spans, got ${spans.length}")
    // the boilerplate is 12 tokens at position 14: every span must be
    // exactly [14, 26) — a wider span would mean filler collided
    spans.foreach { r =>
      require(r.getLong(1) == 14 && r.getLong(2) == 26,
        s"span drifted: $r")
    }
    println("SPANS span coordinates exact: OK")
    spark.stop()
  }
}
