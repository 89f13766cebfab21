package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement (test scope): `TextOps.lmScore` and
  * `Packing.temperatureSample` at megascale. The sf0.1 oracle run is
  * 5k docs — far too small to exercise the shapes that matter at 100 TB:
  * the tokenize→window pass over every token, the per-doc and corpus
  * bigram aggregations, and the docBg⋈c2⋈c1 joins whose keys are zipfian
  * (hot common-word keys — the AQE skew-join case). This drill reuses
  * DevLexCorpus's deterministic zipfian generator (s≈1, natural-text
  * shape) so bigram-type counts behave like real text.
  * Usage: sbt "Test/runMain graft.DevLmScale [nDocs] [docLen] [vocab]" */
object DevLmScale {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(1000000)
    val docLen = args.drop(1).headOption.map(_.toInt).getOrElse(60)
    val vocab = args.drop(2).headOption.map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = "/root/repo/target/devlmscale"
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

    // zipf(s=1) ranks via inverse CDF on a per-(doc,pos) hash (DevLexCorpus's
    // generator) — but with MARKOV structure so the LM has something to
    // learn: every odd position is its predecessor's deterministic
    // successor (rank → "w<rank>x"), so half the corpus bigrams are
    // systematic pairs and half are chance adjacencies, natural-text-ish.
    // Plus a skewed stratum column for the temperature rider.
    def rankAt(doc: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      floor(pow(lit(vocab.toDouble),
        pmod(xxhash64(doc, i), lit(1000000L)).cast("double") / lit(1000000.0)))
        .cast("long")
    val gen = spark.range(nDocs).select(col("id").as("doc_id"))
      .select(col("doc_id"),
        array_join(
          transform(sequence(lit(0), lit(docLen - 1)).as("i"),
            i => when(i % 2 === 0,
              concat(lit("w"), rankAt(col("doc_id"), i).cast("string")))
              .otherwise(concat(lit("w"),
                rankAt(col("doc_id"), i - 1).cast("string"), lit("x")))),
          " ").as("text"),
        // strata sized 1 : 4 : 20 (zipf-ish source skew)
        when(col("doc_id") % 25 === 0, "rare")
          .when(col("doc_id") % 5 === 0, "mid").otherwise("head").as("src"))
    val tGen = time {
      gen.repartition(32).write.format("strawboat").mode("overwrite")
        .save(s"$tmp/corpus")
    }
    val corpus = spark.read.format("strawboat").load(s"$tmp/corpus")
    println(f"GEN   $nDocs%,d docs x $docLen tokens (vocab $vocab): $tGen%.1f s")

    var scored: Long = 0L
    val tScore = time {
      scored = graft.ops.TextOps.lmScore(corpus, "doc_id", "text").count()
    }
    println(f"LM    scored $scored%,d docs in $tScore%.1f s " +
      f"(${nDocs * docLen / tScore / 1e6}%.1f M tokens/s)")

    // sanity: scrambled-vs-natural separation at scale — append docs whose
    // tokens are drawn INDEPENDENTLY (no Markov pairing, same zipf
    // marginals over the base vocabulary); they never produce the corpus's
    // systematic (w, wx) bigrams, so their mean score must sit clearly
    // below the natural docs' mean
    val shuffled = spark.range(2000)
      .select((col("id") + lit(nDocs + 1000000L)).as("doc_id"),
        array_join(
          transform(sequence(lit(0), lit(docLen - 1)).as("i"),
            i => concat(lit("w"),
              floor(pow(lit(vocab.toDouble),
                pmod(xxhash64(col("id") + lit(77), i, lit(13)), lit(999983L))
                  .cast("double") / lit(999983.0))).cast("long").cast("string"))),
          " ").as("text"))
    val both = corpus.select(col("doc_id"), col("text")).unionAll(shuffled)
    val sep = graft.ops.TextOps.lmScore(both, "doc_id", "text")
      .groupBy((col("doc_id") >= nDocs + 1000000L).as("is_shuffled"))
      .agg(avg(col("lm_score")).as("mean"), count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    println(f"SEP   natural mean ${sep(false)}%.4f vs independent ${sep(true)}%.4f")

    var kept: Array[(String, Long)] = null
    val tTemp = time {
      kept = graft.ops.Packing
        .temperatureSample(corpus, "doc_id", "src", 0.5, 0.5)
        .groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    }
    println(f"TEMP  ${kept.map { case (s, n) => s"$s=$n" }.mkString(" ")} " +
      f"in $tTemp%.1f s")
    spark.stop()
  }
}
