package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and drop) training documents that share
  * a word n-gram with an evaluation/probe corpus — the standard guard
  * against test-set leakage into training data.
  *
  * Scale shape: eval sets are small (MBs), the training corpus is not. The
  * probe side's distinct n-grams are BROADCAST; the corpus side explodes its
  * n-grams map-side and broadcast-hash-joins — the 100 TB side is never
  * shuffled, and matching is on the gram STRING, so results are exact (no
  * hash-collision false positives to verify away). */
object Decontaminate {

  /** Space-joined word n-grams of `text` via the codegen'd
    * [[graft.functions.WordNgrams]] kernel — one pass over the UTF-8
    * bytes, one byte-copy per gram (the interpreted
    * sequence+transform+slice chain it replaces cost ~10 µs/gram).
    * Documents shorter than n words contribute none. */
  def wordNgrams(spark: org.apache.spark.sql.SparkSession,
      text: Column, n: Int): Column =
    graft.functions.TextHashFunctions.wordNgrams(spark, text, n)

  /** Ids of documents sharing at least one word n-gram with the probes. */
  def contaminatedIds(docs: DataFrame, probes: DataFrame, idCol: String,
      textCol: String, probeTextCol: String, n: Int): DataFrame = {
    val spark = docs.sparkSession
    val pg = probes
      .select(explode(wordNgrams(spark, col(probeTextCol), n)).as("gram"))
      .distinct()
    docs.select(col(idCol), explode(wordNgrams(spark, col(textCol), n)).as("gram"))
      .join(broadcast(pg), "gram")
      .select(col(idCol))
      .distinct()
  }

  /** The corpus minus contaminated documents (left anti join on id). */
  def decontaminate(docs: DataFrame, probes: DataFrame, idCol: String,
      textCol: String, probeTextCol: String, n: Int): DataFrame =
    docs.join(contaminatedIds(docs, probes, idCol, textCol, probeTextCol, n),
      Seq(idCol), "left_anti")
}
