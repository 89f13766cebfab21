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

  /** Space-joined word n-grams of `text` (whitespace tokenization, empty
    * tokens dropped). Documents shorter than n words contribute none. */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val ws = filter(split(trim(text), "\\s+"), w => w =!= lit(""))
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Ids of documents sharing at least one word n-gram with the probes. */
  def contaminatedIds(docs: DataFrame, probes: DataFrame, idCol: String,
      textCol: String, probeTextCol: String, n: Int): DataFrame = {
    val pg = probes.select(explode(wordNgrams(col(probeTextCol), n)).as("gram"))
      .distinct()
    docs.select(col(idCol), explode(wordNgrams(col(textCol), n)).as("gram"))
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
