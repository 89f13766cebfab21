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

  /** CCNet-style LM quality score: a bigram language model with Laplace
    * smoothing trained on the corpus itself, scoring each document by its
    * mean token-level log-probability — the classic perplexity filter of
    * pretraining pipelines (Wenzek et al. 2020), re-expressed relationally
    * so the "train the LM" step is two hash aggregations and the "score"
    * step is two joins. Low (very negative) scores flag gibberish /
    * boilerplate; combine with [[keepAboveQuantile]] for the usual
    * keep-top-fraction filter.
    *
    * score(doc) = mean over its token bigrams of
    * ln((c(prev,tok) + α) / (c(prev) + α·V)), with c(·) corpus occurrence
    * counts and V the vocabulary size — rounded to 4 decimals so
    * summation-order float drift cannot flip a comparison across engines.
    * Documents with fewer than two tokens have no bigrams and drop out.
    *
    * Scale shape: tokenization AND bigram construction are map-only (the
    * bigram pairs derive from each row's token array — no window, no
    * shuffle of the token stream); the model is two groupBy
    * aggregations (map-side combined); scoring joins PER-DOCUMENT bigram
    * counts (not per-occurrence rows) against the model on term keys —
    * common words are hot keys, which AQE's skew-join handles, and both
    * model sides broadcast when small. No driver materialization at any
    * step. */
  def lmScore(df: DataFrame, idCol: String, textCol: String,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"lmScore: smoothing alpha must be positive, got $alpha")
    // NOT fanned out (Par.fanOut): measured at sf0.1, repartitioning the
    // doc frame before the two Generate branches cost more in added
    // exchanges than the 32-way tokenize saved — this op's time lives in
    // its aggregation shuffles and the model joins, not the tokenize
    // (bench median 2.46 -> 2.71 s with the fan-out; reverted)
    val base = df.select(col(idCol), col(textCol))
    val tokArr = filter(split(col(textCol), "\\s+"), w => w =!= lit(""))
    val toks = base.select(col(idCol).as("_doc"), explode(tokArr).as("_tok"))
    // bigrams derive per row from the token ARRAY — zip each token with
    // its successor (zip_with pads the shorter side with null; the last
    // pair's null successor is the filter below). Map-only: the corpus's
    // token stream never shuffles before the first aggregation, unlike a
    // lag()-over-(doc,pos) window, whose Exchange+sort of every token row
    // is the textbook avoidable shuffle at 100 TB.
    val pairs = zip_with(tokArr, slice(tokArr, lit(2), greatest(size(tokArr) - 1, lit(0))),
      (a, b) => struct(a.as("_prev"), b.as("_tok")))
    val bigrams = base
      .select(col(idCol).as("_doc"), explode(pairs).as("_bg"))
      .filter(col("_bg._tok").isNotNull)
      .select(col("_doc"), col("_bg._prev").as("_prev"), col("_bg._tok").as("_tok"))
    // unigram counts, with the vocabulary size attached as a broadcast
    // one-row aggregate cross-joined back on (the keepAboveQuantile
    // idiom). A count(*) OVER () window would funnel the whole counts
    // table through ONE task — "vocab-sized" is still O(10^8-10^9)
    // distinct tokens on a web corpus, so the scalar must come from a
    // distributed aggregate, not a single-partition sort. The counts
    // table feeds TWO branches (the scoring join and the V scalar); the
    // lazy localCheckpoint (the q_dedup_simhash_gate idiom) materializes
    // the vocab-sized aggregate ONCE so neither branch re-tokenizes the
    // corpus — relying on AQE exchange reuse instead measured 48.5 vs
    // 42.4 s warm (and 128 vs 49 s cold) at 1M docs: the reuse does not
    // reliably fire across the aggregate branches. (Re-measured in r19
    // after StrawScan gained value equality: dropping the checkpoint in
    // favor of reuse was STILL a wash-to-loss at sf0.1 — 1.97/2.01/2.67 s
    // vs 1.89/2.30/2.32 with it, one extra job — so the checkpoint
    // stands.)
    val c1 = toks.groupBy(col("_tok").as("_prev")).agg(count(lit(1)).as("_c1"))
      .localCheckpoint(false)
    val vocab = c1.agg(count(lit(1)).as("_v"))
    val c1v = c1.crossJoin(broadcast(vocab))
    val docBg = bigrams.groupBy("_doc", "_prev", "_tok").agg(count(lit(1)).as("_n"))
    // corpus bigram counts roll up from the per-doc counts: strictly less
    // aggregation input, and the shared lineage lets AQE reuse docBg's
    // exchange instead of re-tokenizing the corpus
    val c2 = docBg.groupBy("_prev", "_tok").agg(sum(col("_n")).as("_c2"))
    docBg
      .join(c2, Seq("_prev", "_tok"))
      .join(c1v, Seq("_prev"))
      .select(col("_doc"), col("_n"),
        log((col("_c2") + lit(alpha)) / (col("_c1") + lit(alpha) * col("_v")))
          .as("_lp"))
      .groupBy(col("_doc").as(idCol))
      .agg(round(sum(col("_lp") * col("_n")) / sum(col("_n")), 4).as("lm_score"),
        sum(col("_n")).as("n_bigrams"))
  }

  /** Overlapping token-window chunking — the RAG/embedding-ingestion
    * shape: each document splits into windows of `chunkTokens` whitespace
    * tokens starting every `chunkTokens − overlap` tokens, the last window
    * possibly short, a document shorter than one window yielding exactly
    * one chunk. Pure codegen'd array functions (split → slice → explode),
    * map-only at any corpus size; `chunk_id` is the 0-based window ordinal
    * so (doc_id, chunk_id) is a stable chunk key for downstream embedding
    * or dedup joins. Empty/whitespace-only documents yield no chunks. */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkDocs: chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"chunkDocs: overlap must be in [0, chunkTokens), got $overlap")
    val step = chunkTokens - overlap
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= lit(""))
    // window starts: 0, step, 2·step, … while the window still contributes
    // tokens beyond the previous one's overlap (start < n − overlap; a
    // doc shorter than one window gets exactly start 0). sequence() needs
    // start <= stop, so guard the empty case.
    val starts = when(size(toks) > 0,
      sequence(lit(0), greatest(size(toks) - overlap - 1, lit(0)), lit(step)))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), toks.as("_toks"), posexplode(starts).as(Seq("chunk_id", "_s")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        array_join(slice(col("_toks"), col("_s") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(size(col("_toks")) - col("_s"), lit(chunkTokens)).cast("long")
          .as("n_tokens"))
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
