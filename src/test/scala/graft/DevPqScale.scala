package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement (test scope): the PQ tier at megascale — the sf0.1
  * bench (5k vectors) can't show the crossover where 16-byte codes beat
  * 256-byte floats, so this drill builds a 1M-vector persisted index
  * (dim 64, clustered data so recall is meaningful) and head-to-heads the
  * ADC+rerank probe against float brute force on the same queries, plus
  * recall of the probe vs the exact result.
  * Usage: sbt "Test/runMain graft.DevPqScale [nVectors] [nQueries]" */
object DevPqScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val nQ = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val dim = 64
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = "/root/repo/target/devpqscale"
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

    // 64 clusters with per-coordinate jitter: deterministic (hash-seeded),
    // margins realistic but not degenerate
    val cluster = pmod(xxhash64(col("vec_id")), lit(64L))
    val emb = transform(sequence(lit(0), lit(dim - 1)).as("i"), i =>
      (when(i === (pmod(xxhash64(col("vec_id")), lit(64L)) % dim).cast("int"), lit(8.0f))
        .otherwise(lit(0.0f)) +
        (pmod(xxhash64(col("vec_id"), i), lit(2000L)).cast("float") / lit(1000.0f)
          - lit(1.0f))).cast("float"))
    val gen = spark.range(n).select(col("id").as("vec_id"))
      .select(col("vec_id"), emb.as("embedding"))
    val corpusDir = s"$tmp/corpus"
    val tGen = time {
      gen.repartition(32).write.format("strawboat").mode("overwrite").save(corpusDir)
    }
    val corpus = spark.read.format("strawboat").load(corpusDir)
    println(f"GEN    $n%,d vectors (dim $dim) in $tGen%.1f s")

    val idxDir = s"$tmp/pqindex"
    val tBuild = time {
      graft.ops.Ann.buildPqIndex(spark, corpus, idxDir, dim,
        m = 16, nCodes = 64, sampleSize = 4096): Unit
    }
    val codeBytes = new java.io.File(idxDir).listFiles()
      .filter(_.getName.endsWith(".strb")).map(_.length).sum
    println(f"BUILD  PQ index (m=16, 64 codes, 16 B/vec) in $tBuild%.1f s " +
      f"(${codeBytes / 1e6}%.0f MB incl. floats for rerank)")

    val queries = corpus.filter(col("vec_id") < nQ)
    var brute: Array[(Long, Long)] = null
    val tBrute = time {
      brute = graft.ops.Ann.bruteForceTopK(spark, corpus, queries, 10)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    println(f"BRUTE  float top-10 of $nQ queries in $tBrute%.1f s")

    var pq: Array[(Long, Long)] = null
    val tPq = time {
      pq = graft.ops.Ann.pqTopKIndexed(spark, idxDir, queries, 10)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    val recall = pq.toSet.intersect(brute.toSet).size.toDouble / brute.length
    println(f"PQ     ADC+rerank top-10 in $tPq%.1f s (${tBrute / tPq}%.2fx vs " +
      f"brute) recall=$recall%.3f")

    // IVF-PQ: the composed index — directory-pruned cells mean the ADC
    // probe never touches most of the corpus, which is where the
    // wall-clock win lives (the flat-PQ probe above scans every code)
    val ivfpqDir = s"$tmp/ivfpqindex"
    val tBuild2 = time {
      graft.ops.Ann.buildIvfPqIndex(spark, corpus, ivfpqDir, dim,
        nCentroids = 64, m = 16, nCodes = 64, sampleSize = 4096)
    }
    println(f"BUILD2 IVF-PQ index (64 cells) in $tBuild2%.1f s")
    var ivfpq: Array[(Long, Long)] = null
    val tIvfPq = time {
      ivfpq = graft.ops.Ann.ivfPqTopK(spark, ivfpqDir, queries, 10, nProbe = 8)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    val recall2 = ivfpq.toSet.intersect(brute.toSet).size.toDouble / brute.length
    println(f"IVFPQ  8-of-64-cell ADC+rerank top-10 in $tIvfPq%.1f s " +
      f"(${tBrute / tIvfPq}%.2fx vs brute) recall=$recall2%.3f")

    // OPQ arms: the SAME corpus through the learned pre-rotation — the
    // recall delta vs the raw-block indexes above is the dial's value on
    // clustered data (Ge et al.: balanced per-block variance products)
    val opqDir = s"$tmp/opqindex"
    val tBuildO = time {
      graft.ops.Ann.buildPqIndex(spark, corpus, opqDir, dim,
        m = 16, nCodes = 64, sampleSize = 4096, opq = true): Unit
    }
    var opq: Array[(Long, Long)] = null
    val tOpq = time {
      opq = graft.ops.Ann.pqTopKIndexed(spark, opqDir, queries, 10)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    val recallO = opq.toSet.intersect(brute.toSet).size.toDouble / brute.length
    println(f"OPQ    rotated ADC+rerank top-10 in $tOpq%.1f s (build " +
      f"$tBuildO%.1f s) recall=$recallO%.3f (vs raw-block $recall%.3f)")
    val opqIvfDir = s"$tmp/opqivfindex"
    val tBuildO2 = time {
      graft.ops.Ann.buildIvfPqIndex(spark, corpus, opqIvfDir, dim,
        nCentroids = 64, m = 16, nCodes = 64, sampleSize = 4096, opq = true)
    }
    var opqIvf: Array[(Long, Long)] = null
    val tOpqIvf = time {
      opqIvf = graft.ops.Ann.ivfPqTopK(spark, opqIvfDir, queries, 10, nProbe = 8)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    val recallO2 = opqIvf.toSet.intersect(brute.toSet).size.toDouble / brute.length
    println(f"OPQIVF rotated 8-of-64-cell top-10 in $tOpqIvf%.1f s (build " +
      f"$tBuildO2%.1f s) recall=$recallO2%.3f (vs raw-block $recall2%.3f)")

    // off-axis control: rotate the WHOLE corpus by a fixed random rotation
    // — the spike structure is axis-aligned (raw-block PQ's best case,
    // each block contains its cluster's spike coordinate); after rotation
    // the spikes smear across every block, raw PQ degrades, and the
    // LEARNED rotation should recover it (OPQ's actual use case — real
    // embedding models don't emit axis-aligned variance)
    val rnd0 = new scala.util.Random(99)
    val g = Array.fill(dim, dim)(rnd0.nextGaussian())
    for (i <- 0 until dim) {
      for (j <- 0 until i) {
        val d = (0 until dim).map(k => g(i)(k) * g(j)(k)).sum
        for (k <- 0 until dim) g(i)(k) -= d * g(j)(k)
      }
      val nn = math.sqrt((0 until dim).map(k => g(i)(k) * g(i)(k)).sum)
      for (k <- 0 until dim) g(i)(k) /= nn
    }
    val r0 = g.map(_.map(_.toFloat))
    val corpus2Dir = s"$tmp/corpus_rot"
    corpus.select(col("vec_id"),
        graft.functions.VectorFunctions.matVec(spark, col("embedding"), r0)
          .as("embedding"))
      .write.format("strawboat").mode("overwrite").save(corpus2Dir)
    val corpus2 = spark.read.format("strawboat").load(corpus2Dir)
    val queries2 = corpus2.filter(col("vec_id") < nQ)
    val brute2 = graft.ops.Ann.bruteForceTopK(spark, corpus2, queries2, 10)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(dirX: String, label: String): Unit = {
      val got = graft.ops.Ann.pqTopKIndexed(spark, dirX, queries2, 10)
        .select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"$label recall=${got.intersect(brute2).size.toDouble / brute2.size}%.3f")
    }
    graft.ops.Ann.buildPqIndex(spark, corpus2, s"$tmp/rotraw", dim,
      m = 16, nCodes = 64, sampleSize = 4096)
    recallOf(s"$tmp/rotraw", "ROTRAW off-axis corpus, raw-block PQ: ")
    graft.ops.Ann.buildPqIndex(spark, corpus2, s"$tmp/rotopq", dim,
      m = 16, nCodes = 64, sampleSize = 4096, opq = true)
    recallOf(s"$tmp/rotopq", "ROTOPQ off-axis corpus, OPQ PQ:      ")

    // COLD-IO arm (reproducible): evict the page cache, then re-run the
    // float brute force and the PQ probe — the regime where the 16x
    // on-disk code shrink becomes wall clock (disks re-read 256 B/vec of
    // floats vs 16 B of codes). Root-only knob; skipped loudly otherwise.
    def dropCaches(): Boolean =
      try new ProcessBuilder("sh", "-c",
          "sync && echo 1 > /proc/sys/vm/drop_caches")
        .start().waitFor() == 0
      catch { case _: Exception => false }
    if (dropCaches()) {
      val tBruteCold = time {
        graft.ops.Ann.bruteForceTopK(spark, corpus, queries, 10).collect(): Unit
      }
      dropCaches()
      val tPqCold = time {
        graft.ops.Ann.pqTopKIndexed(spark, idxDir, queries, 10).collect(): Unit
      }
      dropCaches()
      val tIvfPqCold = time {
        graft.ops.Ann.ivfPqTopK(spark, ivfpqDir, queries, 10, nProbe = 8)
          .collect(): Unit
      }
      println(f"COLD   floats-evicted: brute $tBruteCold%.1f s vs PQ " +
        f"$tPqCold%.1f s (${tBruteCold / tPqCold}%.1fx) vs IVF-PQ " +
        f"$tIvfPqCold%.1f s (${tBruteCold / tIvfPqCold}%.1fx)")
    } else println("COLD   skipped: /proc/sys/vm/drop_caches not writable here")

    // scan-level head-to-head WITHOUT the rank window (which dominates
    // both paths above at this scale and hides the scan economics): one
    // full-corpus scoring pass, aggregate-max only. This is the number
    // that scales — scan bytes 16 B/vec vs 256, compute 16 lookups vs a
    // 64-wide dot.
    val spark2 = spark
    val cbs = graft.ops.Ann.loadPqCodebooks(idxDir)
    val index = spark.read.format("strawboat")
      .option("mergeSchema", "false").load(idxDir)
    val qs = corpus.filter(col("vec_id") < 32)
      .select(col("vec_id").as("_qid"), col("embedding").as("_qemb"))
    def bench(label: String)(body: => Unit): Double = {
      body // warm
      val ts = (1 to 3).map(_ => time(body))
      val t = ts.min
      println(f"$label $t%.2f s")
      t
    }
    val tF = bench("SCANF  32-query float cosine pass (no ranking):") {
      corpus.crossJoin(broadcast(qs))
        .groupBy(col("_qid"))
        .agg(max(graft.functions.VectorFunctions.cosine(spark2,
          col("embedding"), col("_qemb")))).collect(): Unit
    }
    val qsPrep = qs.select(col("_qid"),
      graft.functions.VectorFunctions.pqDotTable(spark2, col("_qemb"), cbs).as("_tab"),
      graft.functions.VectorFunctions.norm(spark2, col("_qemb")).as("_qn"))
    val tC = bench("SCANC  32-query ADC pass over codes (no ranking):") {
      index.select(col("pqcode")).crossJoin(broadcast(qsPrep))
        .groupBy(col("_qid"))
        .agg(max(graft.functions.VectorFunctions.pqAdcCosine(spark2,
          col("pqcode"), col("_tab"), col("_qn"), cbs))).collect(): Unit
    }
    println(f"SCANR  ADC compute ${tF / tC}%.2fx vs float at 32 queries/row")

    // storage economics straight from the footers: compressed bytes of the
    // code column vs the float column in the SAME index table
    var codeB = 0L
    var floatB = 0L
    new java.io.File(idxDir).listFiles().filter(_.getName.endsWith(".strb"))
      .foreach { f =>
        val in = new graft.format.LocalFileInput(f.getAbsolutePath)
        try {
          val ftr = graft.format.StrawFileReader.readFooter(in)
          val leaves = graft.format.LeafLayout.starts(ftr.schema)
          def colBytes(field: Int): Long =
            (leaves(field) until leaves(field + 1))
              .map(l => ftr.columns(l).pages.map(_.compLen).sum).sum
          val ci = ftr.schema.fieldIndex("pqcode")
          val fi = ftr.schema.fieldIndex("embedding")
          codeB += colBytes(ci)
          floatB += colBytes(fi)
        } finally in.close()
      }
    println(f"BYTES  code column ${codeB / 1e6}%.1f MB vs float column " +
      f"${floatB / 1e6}%.1f MB (${floatB.toDouble / codeB}%.1fx)")
    spark.stop()
  }
}
