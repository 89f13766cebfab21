package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 recall A/B for the opt-in full-corpus quantizer refinement
  * (`buildIvfIndex(refineIters = ...)`): the 1024-row sampled quantizer
  * vs the same quantizer refined with distributed Lloyd passes over
  * EVERY vector, measured on DevPqScale's jittery clustered corpus
  * (true structure = 64 planted clusters; the index fits fewer cells, so
  * quantizer quality is the binding recall factor at fixed nProbe).
  * Usage: sbt "Test/runMain graft.DevIvfRefine [nVectors] [nQueries]" */
object DevIvfRefine {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val nQ = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val dim = 64
    val k = 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = "/root/repo/target/devivfrefine"
    val root = new java.io.File(tmp)
    if (root.exists()) {
      val w = java.nio.file.Files.walk(root.toPath)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally w.close()
    }
    def time(body: => Any): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // DevPqScale's corpus: 64 planted clusters + per-coordinate jitter
    val emb = transform(sequence(lit(0), lit(dim - 1)).as("i"), i =>
      (when(i === (pmod(xxhash64(col("vec_id")), lit(64L)) % dim).cast("int"), lit(8.0f))
        .otherwise(lit(0.0f)) +
        (pmod(xxhash64(col("vec_id"), i), lit(2000L)).cast("float") / lit(1000.0f)
          - lit(1.0f))).cast("float"))
    val gen = spark.range(n).select(col("id").as("vec_id"))
      .select(col("vec_id"), emb.as("embedding"))
    gen.repartition(32).write.format("strawboat").mode("overwrite")
      .save(s"$tmp/corpus")
    val corpus = spark.read.format("strawboat").load(s"$tmp/corpus")
    val queries = corpus.filter(col("vec_id") < nQ)
      .select(col("vec_id"), col("embedding"))
    val exact = graft.ops.Ann.bruteForceTopK(spark, corpus, queries, k)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    for ((label, iters) <- Seq("sampled (refineIters=0)" -> 0,
        "refined (refineIters=3)" -> 3)) {
      val dir = s"$tmp/ivf_$iters"
      val tB = time {
        graft.ops.Ann.buildIvfIndex(spark, corpus, dir, dim,
          nCentroids = 16, refineIters = iters): Unit
      }
      val got = graft.ops.Ann.ivfTopKIndexed(spark, dir, queries, k,
          nProbe = 2)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = got.intersect(exact).size.toDouble / exact.size
      println(f"IVF $label%-24s build=$tB%6.1f s  recall@$k (nProbe=2) = $recall%.3f")
    }
    spark.stop()
  }
}
