package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two tiers, as a 100 TB pipeline needs both:
  *  - [[bruteForceTopK]]: exact top-k for a SMALL broadcast query set —
  *    the corpus streams once, no shuffle of the corpus, cost O(|corpus|·|Q|).
  *  - [[lshTopK]]: random-hyperplane LSH — corpus is bucketed by sign
  *    bits once, lookups join only their bucket, so the per-query cost is
  *    the bucket population, not the corpus.
  */
object Ann {

  /** Exact cosine top-k of `queries` (small, broadcast) against `corpus`.
    * Uses the codegen'd [[graft.functions.CosineSimilarity]] expression. */
  def bruteForceTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val scored = corpus.as("c")
      .join(broadcast(queries.as("q")), col("c.vec_id") =!= col("q.vec_id"))
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        round(VectorFunctions.cosine(spark, col("q.embedding"), col("c.embedding")), 4)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic random hyperplanes (seeded) as literal arrays. */
  private def planes(dim: Int, nPlanes: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit bucket id from `nPlanes` hyperplanes — pure SQL functions
    * (zip_with dot product), no UDF. */
  def signBucket(emb: org.apache.spark.sql.Column, dim: Int, nPlanes: Int,
      seed: Long = 7): org.apache.spark.sql.Column = {
    planes(dim, nPlanes, seed).zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      val dot = aggregate(
        zip_with(emb, planeLit, (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Approximate top-k: corpus and queries bucketed by hyperplane signs;
    * candidates meet only within their bucket (scale path). */
  def lshTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      dim: Int, k: Int, nPlanes: Int = 8): DataFrame = {
    val cb = corpus.withColumn("bucket", signBucket(col("embedding"), dim, nPlanes))
    val qb = queries.withColumn("bucket", signBucket(col("embedding"), dim, nPlanes))
    val scored = cb.as("c")
      .join(qb.as("q"),
        col("c.bucket") === col("q.bucket") && col("c.vec_id") =!= col("q.vec_id"))
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        round(VectorFunctions.cosine(spark, col("q.embedding"), col("c.embedding")), 4)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs, exact tier: all (a < b) pairs
    * above `threshold` via a broadcast self-join — the verification shape
    * for small corpora / samples. */
  def exactNearDupPairs(spark: SparkSession, corpus: DataFrame,
      threshold: Double): DataFrame =
    corpus.as("a")
      .join(broadcast(corpus.as("b")), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(VectorFunctions.cosine(spark, col("a.embedding"), col("b.embedding")), 4)
          .as("cosine"))
      .filter(col("cosine") >= threshold)

  /** Embedding-cosine near-duplicate pairs, scale tier: candidates meet
    * only inside a shared hyperplane-sign bucket (O(n·bucket), not n²). */
  def lshNearDupPairs(spark: SparkSession, corpus: DataFrame, dim: Int,
      threshold: Double, nPlanes: Int = 8): DataFrame = {
    val b = corpus.withColumn("bucket", signBucket(col("embedding"), dim, nPlanes))
    b.as("a")
      .join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(VectorFunctions.cosine(spark, col("a.embedding"), col("b.embedding")), 4)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** L2 norm of an embedding column via SQL aggregate (codegen'd). */
  def l2Norm(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sqrt(aggregate(emb, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
}
