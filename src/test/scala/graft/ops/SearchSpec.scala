package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** BM25 lexical retrieval: scores match a plain-Scala reference
  * implementation bit-for-bit (same formula, same association order),
  * ranking and determinism hold, and the plan shape stays scale-safe
  * (no corpus-sized shuffle, broadcast stats). */
class SearchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("search-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  private def corpus = Seq(
    (1L, "spark shuffle join performance tuning guide"),
    (2L, "join join join strategies in distributed systems"),
    (3L, "gardening tips for tomato growers"),
    (4L, "spark streaming watermark semantics"),
    (5L, "the quick brown fox, jumps over the lazy dog!"),
    (6L, "shuffle service configuration and spark executor sizing"))

  /** Plain-Scala BM25 with the operator's exact association order. */
  private def reference(docs: Seq[(Long, String)], terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val tokenized = docs.map { case (id, t) => (id, toks(t)) }
    val n = tokenized.size.toDouble
    val sumdl = tokenized.map(_._2.size.toLong).sum
    val avgdl = sumdl.toDouble / n
    val dfs = terms.map(t => tokenized.count(_._2.contains(t)).toDouble)
    tokenized.map { case (id, tk) =>
      val dl = tk.size.toDouble
      val norm = k1 * ((1.0 - b) + b * dl / avgdl)
      val score = terms.zipWithIndex.map { case (t, i) =>
        val tf = tk.count(_ == t).toDouble
        val idf = math.log((n - dfs(i) + 0.5) / (dfs(i) + 0.5) + 1.0)
        idf * tf * (k1 + 1.0) / (tf + norm)
      }.reduce(_ + _)
      id -> BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  test("scores match the plain-Scala reference bit-for-bit") {
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val got = Search.bm25TopK(df, "doc_id", "text", Seq("spark", "join"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = reference(corpus, Seq("spark", "join"))
      .filter(_._2 > 0).toSeq.sortBy { case (id, s) => (-s, id) }
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
  }

  test("ranking: rare-term doc beats common-term doc; unrelated docs drop out") {
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val got = Search.bm25TopK(df, "doc_id", "text", Seq("watermark"), 10).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(4L))
    // doc 2's triple 'join' saturates: still ranked, but scores stay finite
    val joins = Search.bm25TopK(df, "doc_id", "text", Seq("join"), 10).collect()
    assert(joins.head.getLong(0) == 2L)
    assert(joins.forall(r => r.getDouble(1) > 0 && !r.getDouble(1).isInfinite))
  }

  test("k bounds the result; order is (score desc, id)") {
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val got = Search.bm25TopK(df, "doc_id", "text", Seq("spark", "shuffle"), 2)
      .collect()
    assert(got.length == 2)
    assert(got(0).getDouble(1) >= got(1).getDouble(1))
  }

  test("guards: empty query, duplicate terms, non-lowercase refuse loudly") {
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Search.bm25TopK(df, "doc_id", "text", Seq.empty, 5))
    intercept[IllegalArgumentException](
      Search.bm25TopK(df, "doc_id", "text", Seq("a", "a"), 5))
    intercept[IllegalArgumentException](
      Search.bm25TopK(df, "doc_id", "text", Seq("Spark"), 5))
    intercept[IllegalArgumentException](
      Search.bm25TopK(df, "doc_id", "text", Seq("spark"), 0))
  }

  test("indexed BM25 equals the direct scorer exactly; term buckets prune") {
    val docs = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lexidx").toString
    Search.buildLexicalIndex(docs, "doc_id", "text", dir, buckets = 4)

    for (terms <- Seq(Seq("spark", "join"), Seq("join"), Seq("watermark"),
        Seq("shuffle", "spark", "the"))) {
      val direct = Search.bm25TopK(docs, "doc_id", "text", terms, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val indexed = Search.bm25TopKIndexed(spark, dir, terms, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(indexed == direct, s"terms=$terms indexed=$indexed direct=$direct")
    }

    // the postings scan plans only the probed terms' buckets
    val probe = spark.read.format("strawboat").load(s"$dir/postings")
      .filter(org.apache.spark.sql.functions.col("term").isin("spark"))
    val scan = probe.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.get
    val planned = scan.toBatch.planInputPartitions().flatMap {
      case p: graft.spark.StrawInputPartition => Seq(p.path)
      case p: graft.spark.StrawPackedPartition => p.slices.map(_.path)
      case _ => Seq.empty
    }.distinct
    val want = graft.spark.StrawBucket.bucketOf(
      org.apache.spark.unsafe.types.UTF8String.fromString("spark"),
      org.apache.spark.sql.types.StringType, 4)
    assert(planned.nonEmpty)
    assert(planned.forall(p =>
      graft.spark.StrawBucket.parseTag(p).exists(t => t.n == 4 && t.bucket == want)),
      s"planned files outside bucket $want: ${planned.toSeq}")
  }

  test("appended index scores identically to a full rebuild and the direct scorer") {
    val docs = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val half1 = docs.filter(org.apache.spark.sql.functions.col("doc_id") <= 3)
    val half2 = docs.filter(org.apache.spark.sql.functions.col("doc_id") > 3)
    val dir = java.nio.file.Files.createTempDirectory("lexappend").toString
    Search.buildLexicalIndex(half1, "doc_id", "text", dir, buckets = 4)
    Search.appendToLexicalIndex(half2, "doc_id", "text", dir)

    for (terms <- Seq(Seq("spark", "join"), Seq("shuffle"))) {
      val direct = Search.bm25TopK(docs, "doc_id", "text", terms, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val appended = Search.bm25TopKIndexed(spark, dir, terms, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(appended == direct, s"terms=$terms appended=$appended direct=$direct")
    }
    // a non-index directory refuses loudly
    val plain = java.nio.file.Files.createTempDirectory("notidx").toString
    docs.write.format("strawboat").mode("overwrite").save(s"$plain/postings")
    intercept[IllegalArgumentException](
      Search.appendToLexicalIndex(half2, "doc_id", "text", plain))
  }

  test("positional index: phrase search is exact, ordered, and append-safe") {
    val docs = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lexpos").toString
    Search.buildLexicalIndex(docs.filter(
        org.apache.spark.sql.functions.col("doc_id") <= 4),
      "doc_id", "text", dir, buckets = 4, positions = true)
    Search.appendToLexicalIndex(docs.filter(
        org.apache.spark.sql.functions.col("doc_id") > 4),
      "doc_id", "text", dir)

    def hits(phrase: String*): Seq[Long] =
      Search.phraseSearch(spark, dir, phrase).collect().map(_.getLong(0)).toSeq
    assert(hits("shuffle", "join") == Seq(1L)) // "spark shuffle join ..."
    assert(hits("join", "shuffle") == Seq.empty) // order matters
    assert(hits("spark", "shuffle", "join") == Seq(1L)) // 3-term
    assert(hits("join", "join") == Seq(2L)) // repeated term, adjacency real
    assert(hits("the", "lazy", "dog") == Seq(5L)) // punctuation-split tokens
    assert(hits("spark") == Seq(1L, 4L, 6L)) // single term degenerates to lookup
    assert(hits("nonexistent", "phrase") == Seq.empty)

    // BM25 still works on a positional index (extra leaf is pruned away)
    val bm = Search.bm25TopKIndexed(spark, dir, Seq("spark"), 10)
      .collect().map(_.getLong(0)).toSeq
    assert(bm.toSet == Set(1L, 4L, 6L))

    // a positions-less index refuses phrase search loudly
    val flat = java.nio.file.Files.createTempDirectory("lexflat").toString
    Search.buildLexicalIndex(docs, "doc_id", "text", flat, buckets = 4)
    intercept[IllegalArgumentException](
      Search.phraseSearch(spark, flat, Seq("spark", "shuffle")))
  }

  test("hybrid RRF: both-list docs outrank single-list docs; pools bound the join") {
    val sp = spark; import sp.implicits._
    val docs = spark.createDataFrame(corpus).toDF("doc_id", "text")
    // embeddings: doc 1 near the query (doc 6's vector), doc 3 far
    val emb = Seq(
      (1L, Array(1.0f, 0.1f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f)), (4L, Array(0.9f, 0.2f)),
      (5L, Array(0.1f, 0.9f)), (6L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Search.hybridTopK(docs, "doc_id", "text", Seq("spark"),
      emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") === 6), 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // doc 1: lexical hit ('spark') AND nearest vector -> fused top
    assert(got.head._1 == 1L, s"got ${got.toSeq}")
    // docs on one list only still appear, with a single reciprocal term
    assert(got.map(_._1).contains(3L))
    assert(got.map(_._2).forall(v => v > 0))
    intercept[IllegalArgumentException](
      Search.hybridTopK(docs, "doc_id", "text", Seq("spark"),
        emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") === 6), 10, poolSize = 5))
  }

  test("index maintenance: compaction of many-appended postings preserves results") {
    val docs = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lexcompact").toString
    // build one doc at a time: five appends -> many small bucket files
    Search.buildLexicalIndex(docs.filter(
        org.apache.spark.sql.functions.col("doc_id") === 1),
      "doc_id", "text", dir, buckets = 4)
    (2L to 6L).foreach { id =>
      Search.appendToLexicalIndex(docs.filter(
          org.apache.spark.sql.functions.col("doc_id") === id),
        "doc_id", "text", dir)
    }
    val before = Search.bm25TopKIndexed(spark, dir, Seq("spark", "join"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val filesBefore = graft.spark.StrawIO.listFiles(s"$dir/postings").size

    val res = graft.spark.StrawCompaction.compact(spark, s"$dir/postings")
    assert(res.inputFiles > 0, s"nothing compacted of $filesBefore files")
    val filesAfter = graft.spark.StrawIO.listFiles(s"$dir/postings").size
    assert(filesAfter < filesBefore, s"$filesBefore -> $filesAfter files")
    // bucket layout survived (every file still tagged) and scores identical
    assert(graft.spark.StrawIO.listFiles(s"$dir/postings")
      .forall(f => graft.spark.StrawBucket.parseTag(f).isDefined))
    val after = Search.bm25TopKIndexed(spark, dir, Seq("spark", "join"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == before, s"compaction changed results: $after vs $before")
    val direct = Search.bm25TopK(docs, "doc_id", "text", Seq("spark", "join"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == direct)
  }

  test("plan is scale-safe: stats broadcast, top-k via TakeOrdered, no sort-shuffle") {
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val (base, topk) = Search.bm25TopKPlan(df, "doc_id", "text", Seq("spark"), 3)
    try {
      val s = topk.queryExecution.executedPlan.toString
      assert(s.contains("TakeOrderedAndProject"), s)
      assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastExchange"), s)
    } finally base.unpersist()
  }

  test("repeated bm25TopK calls leave no cached frames behind") {
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.size
    (1 to 3).foreach { _ =>
      Search.bm25TopK(df, "doc_id", "text", Seq("spark", "join"), 5).collect()
    }
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "bm25TopK leaked persisted frames: " +
        spark.sparkContext.getPersistentRDDs.values.map(_.name).mkString(", "))
  }

  test("batch indexed BM25 equals the per-query scorer exactly, shared terms and all") {
    val docs = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lexbatch").toString
    Search.buildLexicalIndex(docs, "doc_id", "text", dir, buckets = 4)
    // 'join' is SHARED between queries (one pivot column feeds two scores),
    // 'the' is a stopword-common term, 'zebra' matches nothing — the empty
    // query result must stay empty, not surface 0-score rows
    val queries = Seq(
      0L -> Seq("spark", "join"),
      1L -> Seq("join", "shuffle", "the"),
      2L -> Seq("zebra"))
    val batch = Search.bm25TopKIndexedBatch(spark, dir, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sortBy(x => (x._1, x._4))
    val perQuery = queries.flatMap { case (qid, terms) =>
      val rows = Search.bm25TopKIndexed(spark, dir, terms, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      rows.zipWithIndex.map { case ((doc, score), i) => (qid, doc, score, i + 1) }
    }
    assert(batch == perQuery, s"batch=$batch perQuery=$perQuery")
    assert(batch.count(_._1 == 2L) == 0, "no-match query leaked rows")
    // guards: empty batch, duplicate query ids, per-query term hygiene
    intercept[IllegalArgumentException](
      Search.bm25TopKIndexedBatch(spark, dir, Seq.empty, 5))
    intercept[IllegalArgumentException](Search.bm25TopKIndexedBatch(spark, dir,
      Seq(0L -> Seq("spark"), 0L -> Seq("join")), 5))
    intercept[IllegalArgumentException](Search.bm25TopKIndexedBatch(spark, dir,
      Seq(0L -> Seq("spark", "spark")), 5))
    intercept[IllegalArgumentException](Search.bm25TopKIndexedBatch(spark, dir,
      Seq(0L -> Seq("Spark")), 5))
  }

  test("100-query batch chunks under the codegen field limit and stays exact") {
    // the chunker itself: caps respected, order/partition preserved, an
    // oversized single query still probes alone instead of failing
    val wide = 0L -> (0 until 200).map(i => s"t$i")
    val mixed = wide +: (1L to 9L).map(q => q -> Seq(s"a$q", s"b$q"))
    val chunks = Search.chunkQueries(mixed)
    assert(chunks.flatten == mixed, "chunking must preserve order and partition")
    assert(chunks.head == Seq(wide), "oversized query probes alone")
    chunks.tail.foreach { c =>
      assert(c.size <= Search.MaxChunkQueries &&
        c.flatMap(_._2).distinct.size <= Search.MaxChunkTerms)
    }

    val docs = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lexbatch100").toString
    Search.buildLexicalIndex(docs, "doc_id", "text", dir, buckets = 4)
    val vocab = corpus.flatMap(_._2.toLowerCase.split("[^a-z0-9]+"))
      .filter(_.nonEmpty).distinct
    val queries = (0 until 100).map { i =>
      i.toLong -> Seq(vocab(i % vocab.size), vocab((i + 7) % vocab.size),
        vocab((i + 13) % vocab.size)).distinct
    }
    assert(Search.chunkQueries(queries).size > 1, "100 queries must chunk")

    // the wide-batch cliff this guards against: every chunk's aggregate
    // stays inside whole-stage codegen (AQE off so the pre-execution plan
    // shows the codegen spans deterministically)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Search.bm25TopKIndexedBatch(spark, dir, queries, 5)
      val plan = df.queryExecution.executedPlan.toString
      // the guard targets the wide PIVOT aggregate (sum-when columns) —
      // the bounded topk_by ranking is a TypedImperativeAggregate, which
      // Spark always plans as ObjectHashAggregate (no codegen form
      // exists); it aggregates the k-bounded candidates, not the pivot's
      // wide row, so it is exempt here
      val bareAggs = plan.linesIterator
        .filter(l => l.contains("HashAggregate") && !l.contains("*(") &&
          !l.contains("topk_by")).toSeq
      assert(bareAggs.isEmpty,
        s"pivot aggregate fell out of codegen:\n${bareAggs.mkString("\n")}")
      assert(!plan.contains("CodegenFallback"), plan)

      // exactness across chunk boundaries: sampled queries (including ones
      // from different chunks) equal the per-query scorer
      val got = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .groupBy(_._1)
      Seq(0L, 1L, 31L, 63L, 64L, 65L, 99L).foreach { qid =>
        val expect = Search.bm25TopKIndexed(spark, dir, queries(qid.toInt)._2, 5)
          .collect().zipWithIndex
          .map { case (r, i) => (qid, r.getLong(0), r.getDouble(1), i + 1) }.toSeq
        val actual = got.getOrElse(qid, Array.empty).sortBy(_._4).toSeq
        assert(actual == expect, s"query $qid: $actual vs $expect")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("hybrid over persisted tiers equals per-query brute-force hybrid on a full probe") {
    val sp = spark; import sp.implicits._
    val docs = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1.0f, 0.1f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f)), (4L, Array(0.9f, 0.2f)),
      (5L, Array(0.1f, 0.9f)), (6L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val lexDir = java.nio.file.Files.createTempDirectory("hyblex").toString
    Search.buildLexicalIndex(docs, "doc_id", "text", lexDir, buckets = 4)
    val ivfDir = java.nio.file.Files.createTempDirectory("hybivf").toString + "/index"
    Ann.buildIvfIndex(spark, emb, ivfDir, 2, nCentroids = 2, seed = 7)

    val termQueries = Seq(1L -> Seq("spark", "join"), 5L -> Seq("fox", "dog"))
    val queryVecs = emb.filter(
      org.apache.spark.sql.functions.col("vec_id").isin(1L, 5L))
    val got = Search.hybridTopKIndexed(spark, lexDir, ivfDir,
        termQueries, queryVecs, 6, poolSize = 10, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sortBy(x => (x._1, x._4))
    // the full probe makes the vector pool exactly brute force, so each
    // query's slice must equal the direct (non-indexed) hybrid verbatim
    val want = termQueries.flatMap { case (qid, terms) =>
      Search.hybridTopK(docs, "doc_id", "text", terms, emb,
          emb.filter(org.apache.spark.sql.functions.col("vec_id") === qid),
          6, poolSize = 10)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, r.getLong(0), r.getDouble(1), i + 1) }
    }
    assert(got == want, s"got=$got want=$want")

    // id pairing guards: a DUPLICATE query row must refuse (a set-only
    // check would pass it and fan the fusion join out), as must extra
    // rows and plain id mismatches
    val dup = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 1L)
      .unionAll(queryVecs)
    intercept[IllegalArgumentException](Search.hybridTopKIndexed(
      spark, lexDir, ivfDir, termQueries, dup, 3, nProbe = 2))
    intercept[IllegalArgumentException](Search.hybridTopKIndexed(
      spark, lexDir, ivfDir, termQueries, emb, 3, nProbe = 2))
    intercept[IllegalArgumentException](Search.hybridTopKIndexed(
      spark, lexDir, ivfDir, termQueries,
      emb.filter(org.apache.spark.sql.functions.col("vec_id").isin(1L, 6L)),
      3, nProbe = 2))
  }
}
