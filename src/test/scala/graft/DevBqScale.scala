package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement (test scope): the BQ tier at megascale — the sf0.1
  * bench (5k vectors) can't show where 8-byte sign codes beat 256-byte
  * floats, so this drill builds a 1M-vector persisted BQ index (dim 64,
  * the DevPqScale clustered generator) and head-to-heads the Hamming
  * shortlist + exact rerank probe against float brute force on the same
  * queries, plus recall and the on-disk code/float byte ratio.
  * Usage: sbt "Test/runMain graft.DevBqScale [nVectors] [nQueries]" */
object DevBqScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val nQ = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val dim = 64
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = "/root/repo/target/devbqscale"
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

    // 4096 clusters, each a deterministic ±4 SIGN PATTERN across all 64
    // dims (hash(cluster, dim) decides the sign) + U(-2,2) jitter: the
    // realistic BQ regime — same-cluster vectors share nearly all sign
    // bits (|±4| >> jitter), cross-cluster differ on ~32, and the true
    // cosine top-10 is same-cluster, so recall measures whether the
    // Hamming shortlist finds the right cluster and the rerank orders it
    val clusterC = pmod(xxhash64(col("vec_id")), lit(4096L))
    val emb = transform(sequence(lit(0), lit(dim - 1)).as("i"), i =>
      (when(pmod(xxhash64(clusterC, i), lit(2L)) === 0, lit(4.0f))
        .otherwise(lit(-4.0f)) +
        (pmod(xxhash64(col("vec_id"), i), lit(2000L)).cast("float") / lit(500.0f)
          - lit(2.0f))).cast("float"))
    val gen = spark.range(n).select(col("id").as("vec_id"))
      .select(col("vec_id"), emb.as("embedding"))
    val corpusDir = s"$tmp/corpus"
    val tGen = time {
      gen.repartition(32).write.format("strawboat").mode("overwrite").save(corpusDir)
    }
    val corpus = spark.read.format("strawboat").load(corpusDir)
    println(f"GEN    $n%,d vectors (dim $dim) in $tGen%.1f s")

    val idxDir = s"$tmp/bqindex"
    val tBuild = time {
      graft.ops.Ann.buildBqIndex(spark, corpus, idxDir, dim)
    }
    println(f"BUILD  BQ index (8 B/vec codes; no training) in $tBuild%.1f s")

    val queries = corpus.filter(col("vec_id") < nQ)
    var brute: Array[(Long, Long)] = null
    val tBrute = time {
      brute = graft.ops.Ann.bruteForceTopK(spark, corpus, queries, 10)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    println(f"BRUTE  float top-10 of $nQ queries in $tBrute%.1f s")

    for (short <- Seq(100, 1000)) {
      var bq: Array[(Long, Long)] = null
      val tBq = time {
        bq = graft.ops.Ann.bqTopKIndexed(spark, idxDir, queries, 10,
            shortlist = short)
          .select(col("query_id"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
      }
      val recall = bq.toSet.intersect(brute.toSet).size.toDouble / brute.length
      println(f"BQ     shortlist=$short%d Hamming+rerank top-10 in $tBq%.1f s " +
        f"(${tBrute / tBq}%.2fx vs brute) recall=$recall%.3f")
    }

    // the byte story: what a code-only scan reads vs the float column —
    // column-pruned page bytes measured from the format's own stats
    val det = new java.io.File(idxDir).listFiles()
      .filter(_.getName.endsWith(".strb"))
      .flatMap(f => graft.format.StrawStats.fileStats(f.getPath))
    val byCol = det.groupBy(_.column).view
      .mapValues(_.map(_.compBytes).sum).toMap
    val codeB = byCol.filter(_._1.contains("bqcode")).values.sum
    val floatB = byCol.filter(_._1.contains("embedding")).values.sum
    println(f"BYTES  bqcode=${codeB / 1e6}%.1f MB float=${floatB / 1e6}%.1f MB " +
      f"ratio=${floatB.toDouble / codeB}%.1fx")
    spark.stop()
  }
}
