package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement (test scope): the lexical index on a REALISTIC corpus
  * (VERDICT r12 #4 / r13 #3). The r12 DevLexScale run replicated the
  * driver documents table, whose tiny vocabulary makes every query term
  * COMMON — postings ≈ corpus, the worst case for an inverted index. This
  * drill generates a zipfian corpus instead (50k-term vocabulary, s≈1, the
  * published shape of natural text): most terms are rare, so a probe's
  * postings ≪ corpus bytes and the bucket-pruned index should win. It
  * measures direct-scan vs indexed BM25 across the document-frequency
  * range to find the crossover, then times the MinHash near-dup pass on
  * the same 1M-doc corpus (10k planted dup pairs).
  * Usage: sbt "Test/runMain graft.DevLexCorpus [nDocs] [docLen] [vocab]" */
object DevLexCorpus {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(1000000)
    val docLen = args.drop(1).headOption.map(_.toInt).getOrElse(120)
    val vocab = args.drop(2).headOption.map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = "/root/repo/target/devlexcorpus"
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

    // zipf(s=1) over ranks 1..vocab via inverse CDF: P(rank<=r)=ln r/ln V,
    // so rank = V^u for uniform u. u is a per-(doc,pos) hash — fully
    // deterministic, no Date/Random needed.
    val u = pmod(xxhash64(col("doc_id"), col("i")), lit(1000000L))
      .cast("double") / lit(1000000.0)
    val word = concat(lit("w"),
      floor(pow(lit(vocab.toDouble), u)).cast("long").cast("string"))
    val gen = spark.range(nDocs).select(col("id").as("doc_id"))
      .select(col("doc_id"), array_join(
        transform(sequence(lit(0), lit(docLen - 1)).as("i"),
          i => concat(lit("w"), floor(pow(lit(vocab.toDouble),
            pmod(xxhash64(col("doc_id"), i), lit(1000000L)).cast("double")
              / lit(1000000.0))).cast("long").cast("string"))),
        " ").as("text"))
    // planted near-dups: 1% of docs reappear under fresh ids
    val dups = gen.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text"))
    val tGen = time {
      gen.unionAll(dups).repartition(32)
        .write.format("strawboat").mode("overwrite").save(s"$tmp/corpus")
    }
    val corpus = spark.read.format("strawboat").load(s"$tmp/corpus")
    val corpusBytes = graft.spark.StrawIO.listFilesMeta(s"$tmp/corpus")
      .map(_.len).sum
    println(f"LEXC corpus docs=${corpus.count()} bytes=${corpusBytes / 1e6}%.0fMB gen_s=$tGen%.1f")

    val tBuild = time {
      graft.ops.Search.buildLexicalIndex(corpus, "doc_id", "text",
        s"$tmp/idx", buckets = 64)
    }
    val idxBytes = graft.spark.StrawIO.listFilesMeta(s"$tmp/idx/postings")
      .map(_.len).sum
    val nPostings = spark.read.format("strawboat").load(s"$tmp/idx/postings").count()
    println(f"LEXC index build_s=$tBuild%.1f postings=$nPostings bytes=${idxBytes / 1e6}%.0fMB (${idxBytes * 100.0 / corpusBytes}%.0f%% of corpus)")

    // term document frequencies across the zipf range (reported so the
    // crossover is interpretable)
    def dfOf(t: String): Long = spark.read.format("strawboat")
      .load(s"$tmp/idx/postings").filter(col("term") === t).count()
    val queries = Seq(
      "rare"   -> Seq("w49000", "w43210", "w47777"),
      "mid"    -> Seq("w5000", "w3000", "w7000"),
      "common" -> Seq("w1", "w2", "w3"))
    queries.foreach { case (label, terms) =>
      println(s"LEXC df $label " +
        terms.map(t => s"$t=${dfOf(t)}").mkString(" "))
    }

    queries.foreach { case (label, terms) =>
      def direct(): Unit = graft.ops.Search.bm25TopK(corpus, "doc_id",
        "text", terms, 20).write.format("noop").mode("overwrite").save()
      def indexed(): Unit = graft.ops.Search.bm25TopKIndexed(spark,
        s"$tmp/idx", terms, 20).write.format("noop").mode("overwrite").save()
      direct(); indexed() // warm
      val d = Seq.tabulate(3)(_ => time(direct())).min
      val i = Seq.tabulate(3)(_ => time(indexed())).min
      println(f"LEXC probe $label%-7s direct=$d%.2fs indexed=$i%.2fs speedup=${d / i}%.1fx")
      // correctness rider: identical results on this corpus too
      val a = graft.ops.Search.bm25TopK(corpus, "doc_id", "text", terms, 20)
        .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
      val b = graft.ops.Search.bm25TopKIndexed(spark, s"$tmp/idx", terms, 20)
        .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
      require(a == b, s"$label: indexed != direct\n$a\n$b")
    }

    // batch path: all nine terms in ONE probe vs three separate probes
    val batchQ = queries.zipWithIndex.map { case ((_, terms), i) => (i.toLong, terms) }
    def batch(): Unit = graft.ops.Search.bm25TopKIndexedBatch(spark,
      s"$tmp/idx", batchQ, 20).write.format("noop").mode("overwrite").save()
    batch()
    val tb = Seq.tabulate(3)(_ => time(batch())).min
    println(f"LEXC probe batch3  one-probe=$tb%.2fs")

    // MinHash near-dup over the 1.01M-doc corpus: 10k planted pairs
    val tMh = time {
      val pairs = graft.ops.Dedup.minHashNearDup(corpus, "doc_id", "text")
      val n = pairs.count()
      val planted = pairs.filter(col("id_b") - col("id_a") === 10000000L).count()
      println(s"LEXC minhash pairs=$n planted_found=$planted/${nDocs / 100}")
    }
    println(f"LEXC minhash sec=$tMh%.1f")
    spark.stop()
  }
}
