package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement: direct BM25 corpus scan vs the term-bucketed inverted
  * index on a scaled-up corpus (sf0.1 documents replicated 64x with fresh
  * ids -> 320k docs). The index probe should win by reading only the query
  * terms' buckets. Run with `sbt "Test/runMain graft.DevLexScale"`. */
object DevLexScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("dev-lex-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("lexscale").toString

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val n = base.count()
    val big = (0 until 64).map(i =>
      base.select((col("doc_id") + lit(i * n)).as("doc_id"), col("text")))
      .reduce(_ union _)
    big.write.format("strawboat").mode("overwrite").save(s"$tmp/corpus")
    val corpus = spark.read.format("strawboat").load(s"$tmp/corpus")
    println(s"DEV|corpus_docs|${corpus.count()}")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val terms = if (sys.env.contains("LEX_RARE")) Seq("dup") else Seq("dup", "vector", "join")

    val tBuild = time {
      graft.ops.Search.buildLexicalIndex(corpus, "doc_id", "text",
        s"$tmp/idx", buckets = 64)
    }
    println(f"DEV|index_build_s|$tBuild%.2f")
    val nPostFiles = graft.spark.StrawIO.listFiles(s"$tmp/idx/postings").size
    println(s"DEV|postings_files|$nPostFiles")

    def direct(): Unit = graft.ops.Search.bm25TopK(corpus, "doc_id", "text",
      terms, 20).write.format("noop").mode("overwrite").save()
    def indexed(): Unit = graft.ops.Search.bm25TopKIndexed(spark, s"$tmp/idx",
      terms, 20).write.format("noop").mode("overwrite").save()

    direct(); indexed() // warm
    val d = Seq(direct _, direct _, direct _).map(f => time(f()))
    val i = Seq(indexed _, indexed _, indexed _).map(f => time(f()))
    println(f"DEV|direct_min_s|${d.min}%.3f")
    println(f"DEV|indexed_min_s|${i.min}%.3f")
    println(f"DEV|speedup|${d.min / i.min}%.1f")

    // results agree
    val a = graft.ops.Search.bm25TopK(corpus, "doc_id", "text", terms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = graft.ops.Search.bm25TopKIndexed(spark, s"$tmp/idx", terms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    println(s"DEV|results_equal|${a == b}")
    spark.stop()
  }
}
