package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, document fingerprinting.
  * Everything is built from codegen'd Spark SQL functions (no UDFs), so the
  * operators stay inside whole-stage codegen and scale linearly. */
object TextOps {

  /** Whitespace token count (empty tokens dropped). */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= lit("")))

  /** BPE-ish subword proxy: count of letter-runs, digit-runs and
    * punctuation marks — a cheap deterministic stand-in for a tokenizer's
    * piece count. */
  def pieceCount(text: Column): Column =
    size(filter(split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"), t => trim(t) =!= lit("")))

  /** Quality features: alpha ratio, whitespace ratio, punctuation ratio,
    * mean token length. Whitespace means \s (tabs/newlines included), so
    * mean_token_len agrees with [[tokenCount]]'s \s+ splitting. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val len = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val spaces = (len - length(regexp_replace(text, "\\s", ""))).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    Seq(
      "alpha_ratio" -> round(alpha / greatest(len, lit(1.0)), 4),
      "space_ratio" -> round(spaces / greatest(len, lit(1.0)), 4),
      "punct_ratio" -> round(punct / greatest(len, lit(1.0)), 4),
      "mean_token_len" -> round((len - spaces) / greatest(tokenCount(text).cast("double"), lit(1.0)), 4))
  }

  /** Order-sensitive polynomial fingerprint: sum over positions i of
    * ascii(char_i) · ((i-1) mod 64 + 1). Deterministic, oracle-checkable,
    * and sensitive to transpositions (unlike a bag-of-chars sum). */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), "")).as(Seq("pos", "ch")))
      .filter(col("ch") =!= "")
      .groupBy(col(idCol))
      .agg(sum(ascii(col("ch")) * ((col("pos") % 64) + 1)).as("fingerprint"))

  /** Gopher-style repetition features per document: total words, the top
    * word's frequency share, and the duplicate word-bigram fraction —
    * the classic signals for boilerplate/spam filtering in pretraining
    * pipelines (Rae et al. 2021's repetition rules, re-expressed
    * relationally). Two hash-partitioned aggregations keyed by document —
    * no cross-document state, linear at corpus scale. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = filter(split(trim(col(textCol)), "\\s+"), w => w =!= lit(""))
    val wordStats = df.select(col(idCol), explode(ws).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        sum(col("c")).as("n_words"),
        max(col("c")).as("top_word_count"))
    val bigramStats = df.select(col(idCol),
        explode(Decontaminate.wordNgrams(df.sparkSession, col(textCol), 2)).as("g"))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_bigrams"),
        countDistinct(col("g")).as("n_distinct_bigrams"))
    wordStats.join(bigramStats, Seq(idCol), "left")
      .select(col(idCol), col("n_words"),
        round(col("top_word_count") * 1.0 / col("n_words"), 4).as("top_word_frac"),
        coalesce(
          round(lit(1.0) - col("n_distinct_bigrams") * 1.0 / greatest(col("n_bigrams"), lit(1L)), 4),
          lit(0.0)).as("dup_bigram_frac"))
  }

  /** Tiny per-language stopword profiles for heuristic language ID. Public
    * common-word lists; scoring = distinct profile hits per language. */
  private val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "as"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es" -> Seq("el", "la", "los", "que", "es", "no", "por", "con", "una", "para"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Heuristic n-gram/stopword language ID: score = distinct profile-word
    * hits; highest score wins, 'und' (undetermined) when nothing hits. */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val toks = array_distinct(filter(split(lower(col(textCol)), "\\s+"), t => t =!= lit("")))
    val scores = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(array_intersect(toks, array(words.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    df.withColumn("pred_lang",
      when(greatest(scores: _*).getField("score") > 0,
        greatest(scores: _*).getField("lang")).otherwise(lit("und")))
  }

  /** Corpus-quantile thresholding — "keep the top (1−q) of the corpus by
    * this score", the standard quality-filter shape in pretraining
    * pipelines. The threshold is ONE aggregated row broadcast back; the
    * corpus itself is never shuffled, so the filter is map-only at any
    * scale.
    *
    * `exact = true` computes the interpolated percentile (a sort-based
    * aggregate — the oracle-checkable audit tier). The default uses
    * Spark's mergeable `approx_percentile` sketch: one
    * map-side-combinable pass, bounded memory per partition — the 100 TB
    * tier, gated against the exact tier by q_quality_threshold_gate.
    * The threshold is rounded to 6 decimals so a last-ulp difference in
    * interpolation arithmetic cannot flip boundary membership across
    * engines. */
  def keepAboveQuantile(df: DataFrame, scoreCol: String, q: Double,
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(q > 0 && q < 1, s"keepAboveQuantile: q must be in (0,1), got $q")
    // backtick-quote the identifier (with embedded backticks doubled) so a
    // column name needing quoting — spaces, dots, keywords — parses as one
    // identifier instead of breaking or resolving to a nested field
    val ident = "`" + scoreCol.replace("`", "``") + "`"
    val agg =
      if (exact) expr(s"percentile($ident, $q)")
      else expr(s"approx_percentile($ident, $q, $accuracy)")
    val thr = df.agg(round(agg, 6).as("_thr"))
    // col() parses its argument too: the same quoted identifier keeps a
    // dotted score column a top-level reference, not nested-field access
    df.crossJoin(broadcast(thr))
      .filter(col(ident) >= col("_thr"))
      .drop("_thr")
  }
}
