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
    * Uses the codegen'd [[graft.functions.CosineSimilarity]] expression.
    * `excludeSelf` assumes queries share the corpus id space (queries ⊆
    * corpus); pass false when the two are independent datasets whose ids
    * may coincide without denoting the same vector. */
  def bruteForceTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val scored = corpus.as("c")
      .join(broadcast(queries.as("q")),
        if (excludeSelf) col("c.vec_id") =!= col("q.vec_id") else lit(true))
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

  /** IVF (inverted-file) ANN: a coarse quantizer (seeded k-means over a
    * bounded driver-side sample, like Spark ML model fitting) assigns every
    * corpus vector to its nearest centroid once; queries probe only their
    * `nProbe` nearest cells. Cluster assignment is a broadcast join against
    * the tiny centroid table + per-vector top-1 window — one corpus pass,
    * no n² anywhere.
    */
  def ivfTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      dim: Int, k: Int, nCentroids: Int = 16, nProbe: Int = 4,
      seed: Long = 7, sampleSize: Int = 1024): DataFrame = {
    import spark.implicits._

    // --- driver-side coarse quantizer over a bounded sample --------------
    val sample: Array[Array[Float]] = corpus.select(col("embedding"))
      .limit(sampleSize).collect()
      .map(_.getSeq[Float](0).toArray)
    val rnd = new scala.util.Random(seed)
    var centroids: Array[Array[Float]] =
      rnd.shuffle(sample.indices.toList).take(nCentroids).map(sample(_)).toArray
    for (_ <- 0 until 5) { // few Lloyd iterations suffice for a coarse index
      val sums = Array.fill(nCentroids)(new Array[Double](dim))
      val counts = new Array[Int](nCentroids)
      sample.foreach { v =>
        val c = nearest(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat)
      }
    }

    // --- distributed assignment via broadcast centroid table -------------
    val centDf = broadcast(centroids.zipWithIndex.toSeq
      .map { case (v, i) => (i, v.toSeq) }.toDF("cent_id", "cent"))
    def assign(df: DataFrame, probes: Int): DataFrame = {
      val dist = aggregate(
        zip_with(col("embedding"), col("cent"),
          (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)
      val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cent_id"))
      df.join(centDf)
        .withColumn("dist", dist)
        .withColumn("cr", row_number().over(w))
        .filter(col("cr") <= probes)
        .drop("cent", "dist", "cr")
    }

    val corpusCells = assign(corpus, 1)
    val queryCells = assign(queries, nProbe)
    val scored = corpusCells.as("c")
      .join(queryCells.as("q"),
        col("c.cent_id") === col("q.cent_id") && col("c.vec_id") =!= col("q.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        round(VectorFunctions.cosine(spark, col("q.embedding"), col("c.embedding")), 4)
          .as("cosine"))
      .distinct() // a neighbor may appear via several probed cells
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  private def nearest(v: Array[Float], cents: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var i = 0
      while (i < v.length) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** L2 norm of an embedding column via SQL aggregate (codegen'd). */
  def l2Norm(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sqrt(aggregate(emb, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
}
