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

  /** Semantic (embedding-space) contamination: corpus rows whose cosine
    * against ANY probe embedding reaches `threshold`, with the best
    * probe's id and similarity attached — the tier n-gram overlap misses
    * (paraphrased or translated benchmark leakage has no shared grams but
    * sits next to the probe in embedding space).
    *
    * Scale shape: the probe set (benchmark suites — thousands of rows)
    * BROADCASTS; the corpus streams once through the codegen'd cosine
    * kernel and reduces per-row by max(struct(sim, probe)) with map-side
    * combine — no corpus shuffle, no driver collect. Cost is
    * corpus × probes kernel evaluations, the irreducible brute-force
    * term (pre-filter the probes, not the corpus, to cut it).
    *
    * Similarities round to 4 decimals BEFORE thresholding (the repo-wide
    * cross-engine convention — a last-ulp engine difference at the
    * boundary must not flip membership). Ties on rounded sim pick the
    * greater probe id. */
  def semanticContaminatedIds(corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, probeIdCol: String,
      probeVecCol: String, threshold: Double): DataFrame = {
    val spark = corpus.sparkSession
    val p = probes.select(col(probeIdCol).as("__pid"),
      col(probeVecCol).as("__pv"))
    corpus.select(col(idCol), col(vecCol).as("__cv"))
      .join(broadcast(p))
      .withColumn("__sim",
        round(graft.functions.VectorFunctions.cosine(spark,
          col("__cv"), col("__pv")), 4))
      .filter(col("__sim") >= threshold)
      .groupBy(col(idCol))
      .agg(max(struct(col("__sim").as("sim"), col("__pid").as("probe_id")))
        .as("__m"))
      .select(col(idCol), col("__m.probe_id").as("probe_id"),
        col("__m.sim").as("sim"))
  }
}
