package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** PII redaction, repetition quality features, benchmark decontamination. */
class PipelineTextOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("pipeline-text-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  test("Privacy.redact replaces emails, IPs and phones; counts match") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "mail me at a.b-c_d%x+1@sub.example.org or x@y.io thanks"),
      (2L, "server 10.0.255.3 and 192.168.1.42 are down"),
      (3L, "call 555-123-4567 or 555.987.6543 or 555 111 2222"),
      (4L, "no pii here, just 1.5 numbers and a@b (not an email)"),
      (5L, "mixed: u@example.com from 8.8.8.8 called 555-000-1111"))
      .toDF("id", "t")
    val out = df.select(
        (col("id") +: Privacy.redact(col("t")).as("r") +:
          Privacy.piiCounts(col("t")).map { case (n, c) => c.as(n) }): _*)
      .orderBy("id").collect()
    assert(out(0).getString(1) == "mail me at [EMAIL] or [EMAIL] thanks")
    assert(out(1).getString(1) == "server [IP] and [IP] are down")
    assert(out(2).getString(1) == "call [PHONE] or [PHONE] or [PHONE]")
    // "a@b" has no dot-TLD → not an email; "1.5" is not an IP
    assert(out(3).getString(1) == "no pii here, just 1.5 numbers and a@b (not an email)")
    assert(out(4).getString(1) == "mixed: [EMAIL] from [IP] called [PHONE]")
    assert(out.map(r => (r.getInt(2), r.getInt(3), r.getInt(4))).toSeq ==
      Seq((2, 0, 0), (0, 2, 0), (0, 0, 3), (0, 0, 0), (1, 1, 1)))
  }

  test("TextOps.repetitionStats: word totals, top-word share, dup bigrams") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "a b a b a"), // 5 words, top a=3; bigrams: ab ba ab ba → 4 total 2 distinct
      (2L, "x y z w"), // all distinct, bigrams all distinct
      (3L, "solo")) // 1 word, no bigrams
      .toDF("doc_id", "text")
    val out = TextOps.repetitionStats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 5L, 0.6, 0.5),
      (2L, 4L, 0.25, 0.0),
      (3L, 1L, 1.0, 0.0)))
  }

  test("Decontaminate: exact word-n-gram matches, short docs safe") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a completely different document about sparks"),
      (3L, "prefix words then quick brown fox jumps suffix"), // shares 4-gram
      (4L, "quick brown fox"), // shorter than n → no grams → clean
      (5L, "")).toDF("doc_id", "text")
    val probes = Seq("the quick brown fox jumps").toDF("ptext")
    val flagged = Decontaminate
      .contaminatedIds(docs, probes, "doc_id", "text", "ptext", 4)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(flagged == Seq(1L, 3L))
    val clean = Decontaminate
      .decontaminate(docs, probes, "doc_id", "text", "ptext", 4)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(clean == Seq(2L, 4L, 5L))
    // the corpus side joins against a broadcast of probe grams
    val plan = Decontaminate
      .contaminatedIds(docs, probes, "doc_id", "text", "ptext", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join in:\n$plan")
  }

  test("Decontaminate.semanticContaminatedIds: threshold, argmax probe, broadcast") {
    val sp = spark; import sp.implicits._
    // unit-ish vectors with known cosines: c1 ~ p10 (cos 1), c2 at 45° to
    // p10 and p11 (cos ~.707 each — argmax tie → greater probe id),
    // c3 orthogonal to both (below any positive threshold)
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 1.0f)), (3L, Array(0.0f, 0.0f))
    ).toDF("id", "v")
    val probes = Seq((10L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 1.0f)))
      .toDF("pid", "pv")
    val got = Decontaminate.semanticContaminatedIds(
        corpus, probes, "id", "v", "pid", "pv", 0.5)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 10L, 1.0), (2L, 11L, 0.7071)))
    // the probe side broadcasts; the corpus never shuffles before the agg
    val plan = Decontaminate.semanticContaminatedIds(
        corpus, probes, "id", "v", "pid", "pv", 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"expected broadcast in:\n$plan")
  }

  test("TextOps.keepAboveQuantile: exact tier matches manual percentile; approx close") {
    val sp = spark; import sp.implicits._
    // 0..99 shuffled across partitions; p75 of 0..99 = 74.25 interpolated
    val df = spark.range(100).select(col("id"),
      ((col("id") * 37) % 100).cast("double").as("score")).repartition(4)
    val exact = TextOps.keepAboveQuantile(df, "score", 0.75, exact = true)
    // kept = scores >= round(74.25, 6) → 75..99, 25 rows
    assert(exact.count() == 25)
    assert(exact.agg(min(col("score"))).head.getDouble(0) == 75.0)
    val approx = TextOps.keepAboveQuantile(df, "score", 0.75)
    val nA = approx.count()
    assert(math.abs(nA - 25L) <= 5, s"approx kept $nA, exact 25")
    // threshold is one broadcast row: the data side never shuffles
    val plan = exact.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast threshold join in:\n$plan")
    intercept[IllegalArgumentException](
      TextOps.keepAboveQuantile(df, "score", 1.0))
    // a column name needing quoting (space, keyword-ish) resolves as ONE
    // identifier — the threshold expression backtick-quotes it
    val odd = df.withColumnRenamed("score", "quality score")
    assert(TextOps.keepAboveQuantile(odd, "quality score", 0.75,
      exact = true).count() == 25)
    // a DOTTED name is the sharper case: unquoted it parses as
    // nested-field access — both the aggregate AND the filter must quote
    val dotted = df.withColumnRenamed("score", "quality.score")
    assert(TextOps.keepAboveQuantile(dotted, "quality.score", 0.75,
      exact = true).count() == 25)
  }

  test("TextOps.chunkDocs: window algebra, coverage, edges") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, (1 to 35).map(i => s"t$i").mkString(" ")), // 0,15: tail suppressed
      (2L, (1 to 25).map(i => s"t$i").mkString(" ")), // 0,15: short last
      (3L, (1 to 20).map(i => s"t$i").mkString(" ")), // exactly one window
      (4L, "a b c"), // shorter than one window: one chunk
      (5L, "   "), // whitespace-only: no chunks
      (6L, (1 to 31).map(i => s"t$i").mkString(" "))) // start 30 ≥ 31−5? no: 30<26 false → suppressed
    val got = TextOps.chunkDocs(docs.toDF("doc_id", "text"), "doc_id", "text", 20, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap

    // plain-Scala reference of the same contract
    docs.foreach { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val starts = Iterator.from(0, 15)
        .takeWhile(s => s == 0 || s < toks.length - 5)
        .takeWhile(_ => toks.nonEmpty).toSeq
      starts.zipWithIndex.foreach { case (s, k) =>
        val w = toks.slice(s, s + 20)
        assert(got((id, k.toLong)) == ((w.mkString(" "), w.length.toLong)),
          s"doc $id chunk $k")
      }
      assert(got.keys.count(_._1 == id) == (if (toks.isEmpty) 0 else starts.size),
        s"doc $id chunk count")
    }
    // every token of every doc appears in at least one chunk (coverage)
    assert(got((1L, 1L))._1.endsWith("t35"))
    assert(got((6L, 1L))._1.endsWith("t31"))
    intercept[IllegalArgumentException](
      TextOps.chunkDocs(docs.toDF("doc_id", "text"), "doc_id", "text", 0, 0))
    intercept[IllegalArgumentException](
      TextOps.chunkDocs(docs.toDF("doc_id", "text"), "doc_id", "text", 20, 20))
  }

  test("pipeline composition: chunk → LM score → quality filter → dedup → shard") {
    val sp = spark; import sp.implicits._
    // a small corpus with structure: natural docs share Markov bigram
    // pairs (every odd token is its predecessor's fixed successor — the
    // signal the LM learns), one gibberish doc of one-off tokens, one
    // exact duplicate of doc 1. The quadratic position term makes chunks
    // collision-free across docs AND window offsets (a shifted window
    // alignment would need 2j'(s1−s2) ≡ const mod 97 for every j').
    def natText(i: Long): String = (0 until 40).map { j =>
      val r = if (j % 2 == 0) (i * 5 + j * j) % 97 else (i * 5 + (j - 1) * (j - 1)) % 97
      if (j % 2 == 0) s"w$r" else s"w${r}x"
    }.mkString(" ")
    val docs = ((1L to 20L).map(i => (i, natText(i))) :+
      (31L, (0 until 40).map(j => s"z$j-unique-${j * 31}").mkString(" ")) :+ // gibberish
      (32L, natText(1L))) // doc 32 duplicates doc 1 exactly
      .toDF("doc_id", "text").repartition(4)

    // 1. chunk
    val chunks = TextOps.chunkDocs(docs, "doc_id", "text", 16, 4)
      .withColumn("chunk_key",
        concat(col("doc_id"), lit("#"), col("chunk_id")))
    val nChunks = chunks.count()
    assert(nChunks == 22 * 3, s"expected 3 chunks per doc, got $nChunks")

    // 2. LM-score the chunks (model trained on the chunk corpus itself)
    val scored = TextOps.lmScore(chunks, "chunk_key", "chunk_text")
      .join(chunks, "chunk_key")
    assert(scored.count() == nChunks) // every chunk has ≥2 tokens here

    // 3. keep the top 75% by LM score: the gibberish doc's chunks die first
    val kept = TextOps.keepAboveQuantile(scored, "lm_score", 0.25)
    val keptN = kept.count()
    assert(keptN < nChunks && keptN >= nChunks * 6 / 10)
    assert(kept.filter(col("chunk_key").startsWith("31#")).count() == 0,
      "gibberish chunks must fall below the quantile")

    // 4. exact dedup on chunk text: doc 32's surviving chunks collapse
    //    into doc 1's digests (keep_id = the doc-1 chunk key)
    val deduped = Dedup.exact(kept, "chunk_key", "chunk_text")
    val dups = deduped.filter(col("dup_count") > 1).collect()
    assert(dups.nonEmpty, "the planted duplicate must survive to dedup")
    dups.foreach(r => assert(r.getString(1).startsWith("1#"),
      s"keep_id must prefer the smaller doc: ${r.getString(1)}"))

    // 5. shard the kept unique chunks for training: complete and stable
    val shards = Packing.shardForTraining(
      deduped.select(col("keep_id")), "keep_id", 4)
    assert(shards.count() == deduped.count())
    assert(shards.select("shard").distinct().count() == 4)
    val again = Packing.shardForTraining(
      deduped.select(col("keep_id")), "keep_id", 4)
    assert(shards.exceptAll(again).isEmpty, "sharding must be reproducible")
  }

  test("TextOps.lmScore: bigram LM matches a plain-Scala model; ranks sanely") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the hat"),
      (3L, "mat hat zzz the"), // scrambled: should score lower than 1-2
      (4L, "single"), // one token: no bigrams, drops out
      (5L, "the cat sat on the mat the cat sat on the mat"))
    val df = docs.toDF("doc_id", "text").repartition(3)
    val got = TextOps.lmScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap

    // plain-Scala reference model over the same corpus
    val toks = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val c1 = toks.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size }
    val vocab = c1.size
    val bgs = toks.flatMap { case (id, ws) =>
      ws.sliding(2).filter(_.size == 2).map(p => (p(0), p(1)))
    }
    val c2 = bgs.groupBy(identity).map { case (k, v) => k -> v.size }
    toks.filter(_._2.size >= 2).foreach { case (id, ws) =>
      val lps = ws.sliding(2).filter(_.size == 2).map { p =>
        math.log((c2((p(0), p(1))) + 1.0) / (c1(p(0)) + 1.0 * vocab))
      }.toSeq
      val want = BigDecimal(lps.sum / lps.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id)._2 == lps.size.toLong, s"doc $id bigram count")
      assert(math.abs(got(id)._1 - want) <= 1e-4,
        s"doc $id score ${got(id)._1} vs $want")
    }
    assert(!got.contains(4L)) // no bigrams
    // common phrasing outranks the scrambled doc
    assert(got(1L)._1 > got(3L)._1 && got(2L)._1 > got(3L)._1)
    intercept[IllegalArgumentException](TextOps.lmScore(df, "doc_id", "text", 0.0))
  }

  test("TextOps.lmScore: bigram construction is map-only — no shuffle or " +
      "window below the first aggregate") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, "a b c"), (2L, "b c d e")).toDF("doc_id", "text")
    val qe = TextOps.lmScore(df, "doc_id", "text").queryExecution

    // logical: NO Window node anywhere — the vocabulary size now arrives
    // as a broadcast one-row aggregate cross-joined onto the counts table,
    // so nothing (not even the vocab-sized counts table, which is still
    // O(distinct tokens) ~ 10^8-10^9 rows on a web corpus) funnels through
    // a single-partition window sort
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    qe.optimizedPlan.foreach {
      case w: LWindow => fail(s"lmScore plan must contain no Window node:\n$w")
      case _ =>
    }

    // physical: every shuffle exchange must sit ABOVE a partial aggregate —
    // the corpus token stream reaches its first groupBy with map-side
    // combine on unshuffled input (the old lag()-over-window plan had an
    // Exchange+Sort of every token row directly over the scan)
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val phys = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = phys.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.nonEmpty, "expected the aggregation shuffles to exist")
    shuffles.foreach { s =>
      // allowed shuffles: (a) an aggregation exchange above a partial
      // aggregate, or (b) the Par.fanOut repartition of the bare
      // (id, text) projection — DOC-scale rows BELOW the explode, which
      // only fires on inputs too small to fan out at the scan; the token
      // stream itself must never shuffle. The fan-out escape hatch is
      // SHAPE-CHECKED: no Generate/Join/Window anywhere in the exchange's
      // subtree AND a narrow (<= 2 column) output — an un-aggregated
      // doc-scale join or sort exchange added later must fail here, not
      // slip through as a "fan-out"
      import org.apache.spark.sql.execution.GenerateExec
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      import org.apache.spark.sql.execution.window.WindowExec
      val aggregated = s.collectFirst { case a: BaseAggregateExec => a }.nonEmpty
      val docScaleFanOut =
        s.collectFirst { case g: GenerateExec => g }.isEmpty &&
        s.collectFirst { case j: BaseJoinExec => j }.isEmpty &&
        s.collectFirst { case w: WindowExec => w }.isEmpty &&
        s.output.size <= 2
      assert(aggregated || docScaleFanOut,
        s"shuffle of un-aggregated (token-scale) rows:\n$s")
    }
  }
}
