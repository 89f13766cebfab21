package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Lexical retrieval over a document corpus — the keyword-side complement
  * to [[Ann]]'s embedding search in a training-data curation stack
  * (query-targeted corpus slicing, seed-set mining, eval-set retrieval).
  *
  * Everything is codegen'd Spark SQL functions over the token array — no
  * UDFs, no inverted index materialization, no shuffle proportional to the
  * corpus:
  *   - per-document term frequencies and length are ONE map-only pass over
  *     the text column, reduced to a handful of numeric columns (the only
  *     thing the corpus ever re-exposes downstream);
  *   - corpus statistics (N, total length, per-term document frequency)
  *     are ONE tree-aggregated row, broadcast back;
  *   - the final top-k is Spark's TakeOrderedAndProject (per-partition
  *     k-best, k rows to the driver).
  * At 100 TB the text column is read exactly once: the per-document frame
  * is persisted (spillable, a few longs per doc) before the stats pass.
  */
object Search {

  /** Lowercased alphanumeric tokens — the exact split the DuckDB oracle
    * replays (`regexp_split_to_array(lower(t), '[^a-z0-9]+')`, empties
    * dropped). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))

  /** BM25 top-k retrieval: the `k` highest-scoring documents for a bag of
    * query terms, classic Robertson/Sparck-Jones BM25 with the Lucene
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf. Scores are rounded to 6
    * decimals (cross-engine `ln` differs in the last ulp) and ties break
    * on the document id, so results are deterministic on any engine.
    *
    * Term contributions sum in the caller's declared term order
    * (left-associated), which the oracle replays literally — bitwise
    * reproducible, not just tolerance-equal.
    *
    * @param queryTerms distinct, already-lowercased bag of words
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    require(queryTerms.distinct.size == queryTerms.size,
      s"bm25TopK: duplicate query terms in ${queryTerms.mkString(",")}")
    require(queryTerms.forall(t => t.nonEmpty && t == t.toLowerCase),
      "bm25TopK: terms must be non-empty lowercase")
    require(k > 0, "bm25TopK: k must be positive")

    // one pass over the text: doc length + one tf column per query term.
    // Persisted so the corpus-stats aggregate and the scoring join read
    // these few longs, not the text column, a second time.
    val toks = tokens(col(textCol))
    val base = docs.select(
      col(idCol) +: size(toks).cast("long").as("_dl") +:
        queryTerms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).cast("long").as(s"_tf$i")
        }: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // corpus statistics: one tree-aggregated row (exact integer sums)
    val aggCols = sum(col("_dl")).as("_sumdl") +:
      queryTerms.indices.map(i =>
        sum((col(s"_tf$i") > 0).cast("long")).as(s"_df$i"))
    val stats = base.agg(count(lit(1)).as("_n"), aggCols: _*)

    val scored = base.crossJoin(broadcast(stats))
    val n = col("_n").cast("double")
    val avgdl = col("_sumdl").cast("double") / n
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl").cast("double") / avgdl)
    val score = queryTerms.indices.map { i =>
      val tf = col(s"_tf$i").cast("double")
      val idf = log((n - col(s"_df$i") + lit(0.5)) / (col(s"_df$i") + lit(0.5)) + lit(1.0))
      idf * tf * lit(k1 + 1.0) / (tf + norm)
    }.reduce(_ + _)

    scored.select(col(idCol), round(score, 6).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
