package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Lexical retrieval over a document corpus — the keyword-side complement
  * to [[Ann]]'s embedding search in a training-data curation stack
  * (query-targeted corpus slicing, seed-set mining, eval-set retrieval).
  *
  * Everything is codegen'd Spark SQL functions over the token array — no
  * UDFs, no inverted index materialization, no shuffle proportional to the
  * corpus:
  *   - per-document term frequencies and length are ONE map-only pass over
  *     the text column, reduced to a handful of numeric columns (the only
  *     thing the corpus ever re-exposes downstream);
  *   - corpus statistics (N, total length, per-term document frequency)
  *     are ONE tree-aggregated row, broadcast back;
  *   - the final top-k is Spark's TakeOrderedAndProject (per-partition
  *     k-best, k rows to the driver).
  * At 100 TB the text column is read exactly once: the per-document frame
  * is persisted (spillable, a few longs per doc) before the stats pass.
  */
object Search {

  /** Lowercased alphanumeric tokens — the exact split the DuckDB oracle
    * replays (`regexp_split_to_array(lower(t), '[^a-z0-9]+')`, empties
    * dropped). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))

  /** BM25 top-k retrieval: the `k` highest-scoring documents for a bag of
    * query terms, classic Robertson/Sparck-Jones BM25 with the Lucene
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf. Scores are rounded to 6
    * decimals (cross-engine `ln` differs in the last ulp) and ties break
    * on the document id, so results are deterministic on any engine.
    *
    * Term contributions sum in the caller's declared term order
    * (left-associated), which the oracle replays literally — bitwise
    * reproducible, not just tolerance-equal.
    *
    * @param queryTerms distinct, already-lowercased bag of words
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // one pass over the text: doc length + one tf column per query term.
    // Persisted so the corpus-stats aggregate and the scoring join read
    // these few longs, not the text column, a second time. Both actions run
    // HERE — the k result rows come back as a LocalRelation — so the cache
    // releases before returning instead of leaking for the session's
    // lifetime (one leaked MEMORY_AND_DISK frame per query otherwise).
    // k-bounded, so the collect is driver-safe at any corpus size.
    val (base, topk) = bm25TopKPlan(docs, idCol, textCol, queryTerms, k, k1, b)
    try {
      val spark = docs.sparkSession
      spark.createDataFrame(
        java.util.Arrays.asList(topk.collect(): _*), topk.schema)
    } finally base.unpersist()
  }

  /** The lazy (cached per-doc frame, top-k plan) pair behind [[bm25TopK]] —
    * exposed to the spec suite so the physical plan (TakeOrdered, broadcast
    * stats) stays assertable after the public API went eager. Callers own
    * the persist: unpersist `_1` once `_2` is materialized. */
  private[ops] def bm25TopKPlan(docs: DataFrame, idCol: String,
      textCol: String, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): (DataFrame, DataFrame) = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    require(queryTerms.distinct.size == queryTerms.size,
      s"bm25TopK: duplicate query terms in ${queryTerms.mkString(",")}")
    require(queryTerms.forall(t => t.nonEmpty && t == t.toLowerCase),
      "bm25TopK: terms must be non-empty lowercase")
    require(k > 0, "bm25TopK: k must be positive")

    val toks = tokens(col(textCol))
    // the tokenize+tf projection is the corpus pass — fan a narrow input
    // out first so it uses every core (no-op at scale, see Par.fanOut)
    val base = Par.fanOut(docs.select(col(idCol), col(textCol)), idCol)
      .select(
        col(idCol) +: size(toks).cast("long").as("_dl") +:
          queryTerms.zipWithIndex.map { case (t, i) =>
            size(filter(toks, x => x === lit(t))).cast("long").as(s"_tf$i")
          }: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // corpus statistics: one tree-aggregated row (exact integer sums)
    val aggCols = sum(col("_dl")).as("_sumdl") +:
      queryTerms.indices.map(i =>
        sum((col(s"_tf$i") > 0).cast("long")).as(s"_df$i"))
    val stats = base.agg(count(lit(1)).as("_n"), aggCols: _*)

    val scored = base.crossJoin(broadcast(stats))
    val n = col("_n").cast("double")
    val avgdl = col("_sumdl").cast("double") / n
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl").cast("double") / avgdl)
    val score = queryTerms.indices.map { i =>
      val tf = col(s"_tf$i").cast("double")
      val idf = log((n - col(s"_df$i") + lit(0.5)) / (col(s"_df$i") + lit(0.5)) + lit(1.0))
      idf * tf * lit(k1 + 1.0) / (tf + norm)
    }.reduce(_ + _)

    val topk = scored.select(col(idCol), round(score, 6).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
    (base, topk)
  }

  /** Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
    * vector (cosine) rankings — fused score = Σ 1/(rrfK + rank) over the
    * lists a document appears in, the standard zero-tuning fusion in
    * modern retrieval stacks. Both pools are top-`poolSize` with
    * deterministic score-then-id tiebreaks, the vector side rides
    * [[Ann.bruteForceTopK]] (swap in the IVF/LSH tiers at scale — any
    * ranked (neighbor_id, rank) frame fuses the same way), the fused
    * score rounds to 6 decimals, and final ties break on the id — so the
    * result is engine-reproducible. Pools are k-bounded, so the fusion
    * join moves `2 · poolSize` rows regardless of corpus size. */
  def hybridTopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], emb: DataFrame, queries: DataFrame, k: Int,
      poolSize: Int = 100, rrfK: Int = 60,
      excludeSelf: Boolean = true): DataFrame = {
    require(k > 0 && poolSize >= k,
      s"hybridTopK: need poolSize >= k > 0, got k=$k poolSize=$poolSize")
    // one query per call: the lexical side scores ONE term bag, so a
    // multi-row vector side would silently fan the fusion join out and
    // mix unrelated rankings under the same ids. limit(2) bounds the
    // guard's cost — it proves ==1 without counting the whole frame.
    val nQueries = queries.limit(2).count()
    require(nQueries == 1,
      s"hybridTopK: exactly one query vector expected, got ${
        if (nQueries == 0) "none" else "several"}")
    val spark = docs.sparkSession
    val lex = bm25TopK(docs, idCol, textCol, queryTerms, poolSize)
      .select(col(idCol).as("id"), row_number()
        .over(Window.orderBy(col("score").desc, col(idCol))).as("lex_rank"))
    val vec = Ann.bruteForceTopK(spark, emb, queries, poolSize, excludeSelf)
      .select(col("neighbor_id").as("id"), col("rank").as("vec_rank"))
    lex.join(vec, Seq("id"), "full_outer")
      .select(col("id"), round(
          coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("vec_rank")), lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(k)
  }

  /** BM25 top-k for a BATCH of queries against a [[buildLexicalIndex]]
    * directory, in ONE index probe. The postings scan prunes to the UNION
    * of all queries' terms (bucket + bloom + zone-map, exactly like the
    * single-query path), per-(term, doc) contributions pivot to one column
    * per distinct term, and a single projection computes every query's
    * score — each adding its own terms' columns in its declared order, so
    * every score is IDENTICAL to [[bm25TopKIndexed]] run per query (pivot
    * columns for a query's unmatched terms hold exact 0.0, and adding 0.0
    * is exact in IEEE754). `stack` then unpivots to (query_id, score) rows
    * and a per-query_id window keeps each query's top `k` — the only
    * per-query cost is one projection column, not one index scan.
    *
    * Large batches CHUNK into probes of at most [[MaxChunkQueries]] queries
    * / [[MaxChunkTerms]] distinct terms each (a single query with more
    * terms still probes alone), unioned — per-query scores are independent
    * (df is per TERM over its own postings, identical whatever other terms
    * share a scan), so union-of-chunks is exact, and the bound keeps every
    * chunk's pivot aggregate and score projection under Spark's
    * whole-stage-codegen field limit (`spark.sql.codegen.maxFields`, 100)
    * and its `isin` list within pushdown-friendly width. Without it, a
    * realistic reranking batch (hundreds of queries) would silently fall
    * out of codegen with one O(queries × terms)-wide plan.
    *
    * @param queries (query_id, distinct lowercase terms) — ids distinct
    * @return (query_id, doc_id, score, rank), rank 1-based per query
    */
  def bm25TopKIndexedBatch(spark: SparkSession, dir: String,
      queries: Seq[(Long, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25TopKIndexedBatch: no queries")
    require(queries.map(_._1).distinct.size == queries.size,
      "bm25TopKIndexedBatch: duplicate query ids")
    queries.foreach { case (qid, terms) =>
      require(terms.nonEmpty, s"bm25TopKIndexedBatch: empty query $qid")
      require(terms.distinct.size == terms.size,
        s"bm25TopKIndexedBatch: duplicate terms in query $qid")
      require(terms.forall(t => t.nonEmpty && t == t.toLowerCase),
        s"bm25TopKIndexedBatch: query $qid terms must be non-empty lowercase")
    }
    require(k > 0, "bm25TopKIndexedBatch: k must be positive")
    chunkQueries(queries)
      .map(chunk => bm25BatchChunk(spark, dir, chunk, k, k1, b))
      .reduce(_.union(_))
  }

  /** Per-chunk caps for [[bm25TopKIndexedBatch]]: chunk output schemas stay
    * `queries + 1` / `terms + 1` columns wide, both under the codegen field
    * limit (100) with headroom. */
  private[ops] val MaxChunkQueries = 64
  private[ops] val MaxChunkTerms = 64

  /** Order-preserving greedy partition of the batch under the chunk caps.
    * A chunk always takes at least one query, so a single query with more
    * than [[MaxChunkTerms]] terms probes alone rather than failing. */
  private[ops] def chunkQueries(queries: Seq[(Long, Seq[String])])
      : Seq[Seq[(Long, Seq[String])]] = {
    val out = Seq.newBuilder[Seq[(Long, Seq[String])]]
    var cur = Vector.empty[(Long, Seq[String])]
    var terms = Set.empty[String]
    queries.foreach { q =>
      val merged = terms ++ q._2
      if (cur.nonEmpty &&
          (cur.size >= MaxChunkQueries || merged.size > MaxChunkTerms)) {
        out += cur; cur = Vector(q); terms = q._2.toSet
      } else { cur = cur :+ q; terms = merged }
    }
    if (cur.nonEmpty) out += cur
    out.result()
  }

  /** One bounded probe of the index for one chunk of the batch. */
  private def bm25BatchChunk(spark: SparkSession, dir: String,
      queries: Seq[(Long, Seq[String])], k: Int,
      k1: Double, b: Double): DataFrame = {
    val allTerms = queries.flatMap(_._2).distinct
    val meta = spark.read.format("strawboat").load(s"$dir/meta")
    val post = spark.read.format("strawboat").load(s"$dir/postings")
      .filter(col("term").isin(allTerms: _*)) // union of buckets, pruned by name
    // per-term df over the pruned postings — identical per term whatever
    // other queries' terms ride along in the same scan
    val withDf = post.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("term"))))
    val scored = withDf.crossJoin(broadcast(meta))

    val n = col("n").cast("double")
    val avgdl = col("sumdl").cast("double") / n
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl)
    val tf = col("tf").cast("double")
    val idf = log((n - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val contrib = idf * tf * lit(k1 + 1.0) / (tf + norm)

    val pivots = allTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === lit(t), contrib).otherwise(lit(0.0))).as(s"_c$i")
    }
    val pivoted = scored.groupBy(col("doc_id")).agg(pivots.head, pivots.tail: _*)
    val termIdx = allTerms.zipWithIndex.toMap
    val scoreCols = queries.zipWithIndex.map { case ((_, terms), i) =>
      round(terms.map(t => col(s"_c${termIdx(t)}")).reduce(_ + _), 6).as(s"_s$i")
    }
    val proj = pivoted.select(col("doc_id") +: scoreCols: _*)
    val stackArgs = queries.zipWithIndex
      .map { case ((qid, _), i) => s"${qid}L, _s$i" }.mkString(", ")
    // per-query top-k as the bounded mergeable topk_by aggregate (the
    // ANN-tier conversion): the candidate frame is every doc matching any
    // query term — common terms make that corpus-scale — and the window
    // formulation would shuffle all of it into #queries partitions. Map
    // tasks ship ≤k entries per query instead.
    graft.functions.SketchFunctions.register(spark)
    proj.selectExpr("doc_id",
        s"stack(${queries.size}, $stackArgs) AS (query_id, score)")
      .filter(col("score") > 0)
      .groupBy(col("query_id"))
      .agg(graft.functions.SketchFunctions.topKBy(
        col("score"), col("doc_id").cast("long"), k).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_r", "_e")))
      .select(col("query_id"), col("_e.id").as("doc_id"),
        col("_e.score").as("score"), (col("_r") + 1).cast("int").as("rank"))
  }

  /** Hybrid retrieval over the PERSISTED tiers, for a batch of queries:
    * reciprocal-rank fusion of [[bm25TopKIndexedBatch]] (one bucket-pruned
    * probe of the lexical index for all queries) and
    * [[Ann.ivfTopKIndexed]] (directory-pruned probe of the persisted IVF
    * index; `nProbe = nCentroids` makes the vector pool exact). Same
    * fusion rule, rounding, and tiebreaks as [[hybridTopK]], applied per
    * query_id — the fusion join moves `2 · poolSize` rows PER QUERY
    * regardless of corpus size. The two sides pair by id: `termQueries`'
    * query ids must equal `queryVecs`' vec_ids (validated — the collect is
    * bounded by the number of queries, a handful of rows by contract).
    *
    * @param termQueries (query_id, lowercase term bag) per query
    * @param queryVecs (vec_id, embedding) rows, one per query_id
    * @return (query_id, id, rrf, rank) — rank 1-based per query, k rows each
    */
  def hybridTopKIndexed(spark: SparkSession, lexDir: String, ivfDir: String,
      termQueries: Seq[(Long, Seq[String])], queryVecs: DataFrame, k: Int,
      poolSize: Int = 100, rrfK: Int = 60, nProbe: Int = 4): DataFrame = {
    require(k > 0 && poolSize >= k,
      s"hybridTopKIndexed: need poolSize >= k > 0, got k=$k poolSize=$poolSize")
    // limit(n+1) bounds the collect AND catches both failure shapes: a
    // set-only comparison would accept duplicate query rows (ids [0,1,0]
    // vs bags {0,1}), which then fan out and corrupt per-query ranks in
    // the fusion join — so row COUNT must equal the bag count too
    val vecIdRows = queryVecs.select(col("vec_id").cast("long"))
      .limit(termQueries.size + 1).collect().map(_.getLong(0)).toSeq
    require(vecIdRows.size == termQueries.size &&
        vecIdRows.toSet == termQueries.map(_._1).toSet,
      s"hybridTopKIndexed: vector frame must carry exactly one row per " +
        s"term-bag query id — term bags (${
          termQueries.map(_._1).sorted.mkString(",")}) vs vector rows (${
          vecIdRows.sorted.mkString(",")}${
          if (vecIdRows.size > termQueries.size) ",..." else ""})")
    // the pools are k-BOUNDED (<= poolSize rows per query per side), so at
    // a handful-to-chunk-sized batch the whole fusion fits one partition:
    // collapsing both sides to 1 lets the full-outer join, the per-query
    // rank window, and any caller sort all run in a single task with no
    // further exchanges (SinglePartition satisfies every clustered/ordered
    // distribution) — measured 30% off the whole entry at sf0.1, and
    // scale-safe because the row bound is the CONTRACT, not the corpus.
    // Past a chunk's worth of queries, keep the hash-partitioned fusion.
    val fuse: DataFrame => DataFrame =
      if (termQueries.size <= MaxChunkQueries) _.repartition(1) else identity
    val lex = fuse(bm25TopKIndexedBatch(spark, lexDir, termQueries, poolSize)
      .select(col("query_id"), col("doc_id").as("id"), col("rank").as("lex_rank")))
    val vec = fuse(Ann.ivfTopKIndexed(spark, ivfDir, queryVecs, poolSize, nProbe)
      .select(col("query_id"), col("neighbor_id").as("id"), col("rank").as("vec_rank")))
    lex.join(vec, Seq("query_id", "id"), "full_outer")
      .select(col("query_id"), col("id"), round(
          coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("vec_rank")), lit(0.0)),
          6).as("rrf"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("rrf").desc, col("id"))))
      .filter(col("rank") <= k)
  }

  /** Persisted inverted index — the repeated-query path. [[bm25TopK]]
    * re-scans the corpus per query; a standing index amortizes that at
    * 100 TB: postings `(term, doc_id, tf, dl)` land in a strawboat table
    * hash-bucketed by TERM with per-page term blooms, so a query's terms
    * prune to their buckets by file NAME (the other `1 - |terms|/buckets`
    * of the index is excluded before any IO) and blooms/prefix zone maps
    * skip the surviving files' non-matching pages. Each posting is
    * denormalized with its document's token count, and a one-row meta
    * table carries the corpus constants — scoring never touches the
    * corpus. */
  /** The postings frame `(term, doc_id, tf, dl[, positions])` for one
    * document set — one explode + agg, dl as a window over the doc key (no
    * second tokenize pass) — and its bucketed, term-sorted, bloom'd write.
    * Shared verbatim by [[buildLexicalIndex]] and [[appendToLexicalIndex]]
    * so the two paths cannot drift (append == rebuild is spec-pinned). */
  private def writePostings(docs: DataFrame, idCol: String, textCol: String,
      dir: String, buckets: Int, positions: Boolean, mode: String): Unit = {
    val toks = tokens(col(textCol))
    val exploded =
      if (positions)
        docs.select(col(idCol).as("doc_id"),
            posexplode(toks).as(Seq("pos", "term")))
          .groupBy(col("term"), col("doc_id"))
          .agg(count(lit(1)).as("tf"),
            sort_array(collect_list(col("pos"))).as("positions"))
      else
        docs.select(col(idCol).as("doc_id"), explode(toks).as("term"))
          .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val postings = exploded
      .withColumn("dl", sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
    val cols = Seq("term", "doc_id", "tf", "dl") ++
      (if (positions) Seq("positions") else Nil)
    postings.select(cols.map(col): _*)
      .write.format("strawboat")
      .option("sortBy", "term,doc_id") // term-clustered pages -> zone maps
      .option("bucketBy", "term").option("buckets", buckets.toString)
      .option("bloomColumns", "term")
      .mode(mode).save(s"$dir/postings")
  }

  def buildLexicalIndex(docs: DataFrame, idCol: String, textCol: String,
      dir: String, buckets: Int = 64, positions: Boolean = false): Unit = {
    require(buckets >= 1, "buildLexicalIndex: buckets must be positive")
    val toks = tokens(col(textCol))
    writePostings(docs, idCol, textCol, dir, buckets, positions, "overwrite")
    // corpus constants over ALL documents (token-less docs count toward N
    // and the average length, exactly as in the direct scorer)
    docs.select(size(toks).cast("long").as("dl"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("sumdl"))
      .write.format("strawboat").mode("overwrite").save(s"$dir/meta")
  }

  /** Incrementally index new documents into a [[buildLexicalIndex]]
    * directory: their postings APPEND into the term-bucketed layout (the
    * sidecar spec gates the bucket count/key, so the co-location survives
    * by construction) and the one-row meta table advances by the new
    * documents' exact (count, token-total) delta. Because document
    * frequency is derived from the postings at query time and the meta
    * row adds exactly, an appended index scores IDENTICALLY to a full
    * rebuild over the union (spec-pinned). The caller must not re-append
    * documents already indexed — postings are per-document rows, so a
    * duplicate id would double-count (same contract as the IVF append).
    * The postings commit lands before the meta swap; a crash between them
    * leaves scores on the stale corpus constants (slightly off, never
    * structurally wrong) until the append is retried. Appends are
    * CALLER-SERIALIZED: two concurrent appends could both base the meta
    * advance on the same old row (lost update) — and concurrent appends
    * of overlapping documents would double-count postings anyway, so the
    * single-logical-writer contract is inherent, not incidental. */
  def appendToLexicalIndex(newDocs: DataFrame, idCol: String,
      textCol: String, dir: String): Unit = {
    val spark = newDocs.sparkSession
    val buckets = graft.spark.StrawBucket.specOf(s"$dir/postings").getOrElse(
      throw new IllegalArgumentException(
        s"appendToLexicalIndex: $dir/postings carries no bucket spec — " +
          "not a buildLexicalIndex directory"))._2
    val toks = tokens(col(textCol))
    // match the existing schema: a positional index appends positions too
    val positional = spark.read.format("strawboat").load(s"$dir/postings")
      .schema.fieldNames.contains("positions")
    writePostings(newDocs, idCol, textCol, dir, buckets, positional, "append")
    val old = spark.read.format("strawboat").load(s"$dir/meta")
      .select(col("n"), col("sumdl")).head()
    val delta = newDocs.select(size(toks).cast("long").as("dl"))
      .agg(count(lit(1)).as("dn"),
        coalesce(sum(col("dl")), lit(0L)).as("dsum")).head()
    spark.range(1).select(
        lit(old.getLong(0) + delta.getLong(0)).as("n"),
        lit(old.getLong(1) + delta.getLong(1)).as("sumdl"))
      .write.format("strawboat").mode("overwrite").save(s"$dir/meta")
  }

  /** Exact-phrase search against a POSITIONAL index
    * (`buildLexicalIndex(..., positions = true)`): documents containing
    * the phrase's tokens consecutively, in order. Each term's postings
    * prune to their bucket (and, term-sorted, to their pages); the
    * per-term (doc, positions) lists then inner-join on the document and
    * a codegen'd `exists` checks adjacency — `p` in term 0's list with
    * `p+i` in term i's for all i. No corpus access, no driver-side state;
    * the joins carry only the phrase terms' postings. */
  def phraseSearch(spark: SparkSession, dir: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    require(phrase.forall(t => t.nonEmpty && t == t.toLowerCase),
      "phraseSearch: terms must be non-empty lowercase")
    val post = spark.read.format("strawboat").load(s"$dir/postings")
    require(post.schema.fieldNames.contains("positions"),
      s"phraseSearch: $dir/postings carries no positions — rebuild the " +
        "index with buildLexicalIndex(..., positions = true)")
    // one pruned scan per DISTINCT term (a repeated term reuses its frame)
    val frames: Map[String, DataFrame] = phrase.distinct.map { t =>
      t -> post.filter(col("term") === t).select(col("doc_id"), col("positions"))
    }.toMap
    val joined = phrase.zipWithIndex.map { case (t, i) =>
      frames(t).select(col("doc_id"), col("positions").as(s"_p$i"))
    }.reduce((a, b) => a.join(b, "doc_id"))
    val adjacent = exists(col("_p0"), p =>
      phrase.indices.tail
        .map(i => array_contains(col(s"_p$i"), p + lit(i)))
        .foldLeft(lit(true))(_ && _))
    joined.filter(adjacent).select(col("doc_id")).orderBy(col("doc_id"))
  }

  /** BM25 top-k against a [[buildLexicalIndex]] directory. Scores are
    * IDENTICAL to [[bm25TopK]]'s — per-term contributions pivot to fixed
    * columns (each document holds at most one posting per term, so the
    * pivot sums add exact zeros) and the final score adds in the declared
    * term order. Only the probed terms' buckets are read. */
  def bm25TopKIndexed(spark: SparkSession, dir: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopKIndexed: empty query")
    require(queryTerms.distinct.size == queryTerms.size,
      s"bm25TopKIndexed: duplicate query terms in ${queryTerms.mkString(",")}")
    require(queryTerms.forall(t => t.nonEmpty && t == t.toLowerCase),
      "bm25TopKIndexed: terms must be non-empty lowercase")
    require(k > 0, "bm25TopKIndexed: k must be positive")

    val meta = spark.read.format("strawboat").load(s"$dir/meta")
    val post = spark.read.format("strawboat").load(s"$dir/postings")
      .filter(col("term").isin(queryTerms: _*)) // bucket + bloom + zone-map pruned
    // per-term document frequency as a window over the pruned postings —
    // ONE scan of the index (a groupBy+self-join would read it twice)
    val withDf = post.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("term"))))
    val scored = withDf.crossJoin(broadcast(meta))

    val n = col("n").cast("double")
    val avgdl = col("sumdl").cast("double") / n
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl)
    val tf = col("tf").cast("double")
    val idf = log((n - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val contrib = idf * tf * lit(k1 + 1.0) / (tf + norm)

    val pivots = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === lit(t), contrib).otherwise(lit(0.0))).as(s"_c$i")
    }
    val pivoted = scored.groupBy(col("doc_id")).agg(pivots.head, pivots.tail: _*)
    val score = queryTerms.indices.map(i => col(s"_c$i")).reduce(_ + _)
    pivoted.select(col("doc_id"), round(score, 6).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
