package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora. All shapes are
  * shuffle-bounded: exact dedup is a hash aggregation on a digest, near-dup
  * detection is LSH-bucketed (candidates only ever meet inside a band
  * bucket — never an all-pairs cross join), so each scales as
  * O(n · bucket_size) on a partitioned cluster.
  */
object Dedup {

  /** Exact dedup by content digest: one row per distinct `col`, keeping the
    * smallest `idCol`. A single hash-partitioned aggregation — the 100 TB
    * shape (shuffle on digest, no sort). */
  def exact(df: DataFrame, idCol: String, col: String): DataFrame =
    df.groupBy(md5(org.apache.spark.sql.functions.col(col)).as("digest"))
      .agg(
        min(org.apache.spark.sql.functions.col(idCol)).as("keep_id"),
        count(lit(1)).as("dup_count"))

  /** STREAMING exact dedup, first-writer-wins: one row per distinct
    * content digest, emitted exactly once — in the first micro-batch that
    * carries it — with the smallest id of that batch's group. State is one
    * marker per distinct digest (flatMapGroupsWithState, no timeout): the
    * inherent cost of exact dedup over an unbounded stream; bound it by
    * keying on time-windowed digests or switch to
    * `dropDuplicatesWithinWatermark` when the duplicate horizon is
    * time-limited. If the stream admits batches in ascending-id order (the
    * replay/backfill shape), the kept id is the GLOBAL minimum per digest —
    * what a batch `groupBy(digest).min(id)` oracle replays. */
  def streamingFirstSeen(stream: DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.Dataset[(String, Long)] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(
        md5(org.apache.spark.sql.functions.col(textCol)).as("digest"),
        org.apache.spark.sql.functions.col(idCol).cast("long").as("keep_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (digest, rows, state) =>
          if (state.exists) Iterator.empty // emitted in an earlier batch
          else {
            state.update(true)
            Iterator.single((digest, rows.map(_._2).min))
          }
      }
  }

  /** STREAMING MinHash near-dup, first-writer-wins: emits the ids of docs
    * that are NOT near-duplicates of any earlier-arriving doc — the
    * unbounded-stream counterpart of [[minHashNearDup]], the way
    * [[streamingFirstSeen]] is [[exact]]'s.
    *
    * Two chained stateful stages (both Append — Spark admits multiple
    * flatMapGroupsWithState in append mode):
    *
    *  1. keyed by LSH (band, bucket): state is ONE exemplar per bucket —
    *     the first-arriving doc's (id, signature). Later docs in the
    *     bucket verify their signature against the exemplar's
    *     (agreement fraction >= threshold — the MinHash Jaccard
    *     estimator, Binomial(numHashes, j)/numHashes). Within a batch,
    *     rows process in ascending-id order.
    *  2. keyed by doc id, STATELESS (state never written — the group pass
    *     is per-batch): a doc survives iff NO band called it a dup. All
    *     of a doc's band rows are emitted in its own micro-batch, so
    *     nothing waits across batches.
    *
    * Approximation contract (all deliberate, all bounded-state):
    * verification is against the estimator, not an exact re-shingle (the
    * same class as [[minHashNearDup]]'s signaturePrefilter); each bucket
    * keeps only its FIRST exemplar, so a dup of a NON-exemplar neighbor
    * is caught only via one of its other `bands` buckets (the banding
    * OR-construction that carries LSH recall anyway); dropped docs still
    * serve as exemplars — the same greedy chain every first-writer-wins
    * dedup has. State: one (id, signature) per DISTINCT occupied bucket —
    * `bands` rows per distinct doc at worst, fixed-width longs.
    *
    * Doc ids are assumed UNIQUE (the contract everywhere in this
    * module): a re-sent id verdicts against its own stored exemplar
    * signature (agreement 1.0) and drops — re-sends never re-emit.
    *
    * If batches admit in ascending-id order (the replay/backfill shape),
    * the kept set equals [[nearDupFirstSeenBatch]] exactly — the gate
    * hook. */
  def streamingNearDupFirstSeen(stream: DataFrame, idCol: String,
      textCol: String, k: Int = 5, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.8): org.apache.spark.sql.Dataset[Long] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(numHashes % bands == 0,
      s"streamingNearDupFirstSeen: bands ($bands) must divide numHashes ($numHashes)")
    require(threshold > 0.0 && threshold <= 1.0,
      s"streamingNearDupFirstSeen: threshold must be in (0, 1], got $threshold")
    val spark = stream.sparkSession
    import spark.implicits._
    // signature AND band buckets in one map-only projection (the batch
    // path's lshBuckets join would be a stream-stream join here)
    val sigRows = stream.select(
        col(idCol).cast("long").as("sid"),
        graft.functions.TextHashFunctions.minHashSignature(
          spark, col(textCol), k, numHashes).as("sig"))
    val rows = numHashes / bands
    val bandHashes = (0 until bands).map { b =>
      xxhash64((b * rows until (b + 1) * rows)
        .map(i => element_at(col("sig"), i + 1)): _*)
    }
    val bucketRows = sigRows.select(col("sid"), col("sig"),
        posexplode(array(bandHashes: _*)).as(Seq("band", "bucket")))
      .select(col("band"), col("bucket"), col("sid"), col("sig"))
      .as[(Int, Long, Long, Seq[Long])]
    val verdicts = bucketRows
      .groupByKey { case (band, bucket, _, _) => (band, bucket) }
      .flatMapGroupsWithState[(Long, Seq[Long]), (Long, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, it, state) =>
          val batch = it.toSeq.sortBy(_._3)
          val out = Seq.newBuilder[(Long, Boolean)]
          var exemplar = state.getOption
          batch.foreach { case (_, _, sid, sig) =>
            exemplar match {
              case None =>
                exemplar = Some((sid, sig))
                state.update((sid, sig))
                out += ((sid, false))
              case Some((_, esig)) =>
                val agree = sig.iterator.zip(esig.iterator)
                  .count { case (a, b) => a == b }
                out += ((sid, agree.toDouble / numHashes >= threshold))
            }
          }
          out.result().iterator
      }
    verdicts
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, Long](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sid, it, _) => // state never written: a per-batch group pass
          if (it.exists(_._2)) Iterator.empty else Iterator.single(sid)
      }
  }

  /** The batch replay of [[streamingNearDupFirstSeen]] under ascending-id
    * admission: the exemplar of each (band, bucket) is its MINIMUM doc id,
    * and a doc survives iff no band's exemplar (other than itself)
    * estimates >= threshold against it. Returns the kept ids. The only
    * shuffles are the bucket aggregation and the bucket-keyed verdict
    * join — work proportional to bucket population, never corpus². */
  def nearDupFirstSeenBatch(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0,
      s"nearDupFirstSeenBatch: bands ($bands) must divide numHashes ($numHashes)")
    val spark = df.sparkSession
    val sigs = minHashSignatures(df, idCol, textCol, k, numHashes)
    val buckets = lshBuckets(sigs, bands, numHashes / bands)
      .join(sigs, "sid")
    val exemplars = buckets
      .groupBy(col("band"), col("bucket"))
      .agg(min_by(struct(col("sid").as("eid"), col("sig").as("esig")),
        col("sid")).as("e"))
      .select(col("band"), col("bucket"),
        col("e.eid").as("eid"), col("e.esig").as("esig"))
    buckets.join(exemplars, Seq("band", "bucket"))
      .withColumn("est",
        size(filter(zip_with(col("sig"), col("esig"),
          (x, y) => x === y), e => e)).cast("double") / numHashes)
      .groupBy(col("sid"))
      .agg(max(when(col("eid") =!= col("sid") && col("est") >= threshold,
        1).otherwise(0)).as("dup"))
      .filter(col("dup") === 0)
      .select(col("sid"))
  }

  /** Distinct k-character shingles of `text` as 64-bit hashes, one row per
    * (id, shingle) — the codegen'd [[graft.functions.ShingleHashes]] kernel
    * (one pass over the UTF-8 bytes per row; the SQL sequence/transform/
    * array_distinct formulation paid interpreted per-element dispatch).
    * Every downstream shuffle/join moves fixed-width longs, never k-char
    * strings; set semantics are preserved modulo ~2^-64 collisions. */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    Par.fanOut(df.select(col(idCol), col(textCol)), idCol).select(
      col(idCol).as("sid"),
      explode(graft.functions.TextHashFunctions.shingleHashes(
        df.sparkSession, col(textCol), k)).as("shingle"))

  /** MinHash signatures as a MAP-ONLY projection: one (sid, array<long>)
    * row per doc via the codegen'd [[graft.functions.ShingleMinHash]] — no
    * shingle relation is materialized or shuffled for signatures at all. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int): DataFrame =
    Par.fanOut(df.select(col(idCol), col(textCol)), idCol)
      .select(col(idCol).as("sid"),
        graft.functions.TextHashFunctions.minHashSignature(
          df.sparkSession, col(textCol), k, numHashes).as("sig"))

  /** LSH band buckets from signature arrays: `bands` bands of `rows` hashes
    * each; docs sharing any band bucket are candidate near-duplicates.
    * Emitted in ONE pass via posexplode. */
  def lshBuckets(sigs: DataFrame, bands: Int, rows: Int): DataFrame = {
    val bandHashes = (0 until bands).map { b =>
      xxhash64((b * rows until (b + 1) * rows).map(i => element_at(col("sig"), i + 1)): _*)
    }
    sigs.select(col("sid"),
      posexplode(array(bandHashes: _*)).as(Seq("band", "bucket")))
  }

  /** Candidate pairs (a < b) from shared band buckets — the only join, and
    * it is keyed on (band, bucket), so work is proportional to bucket
    * population, not corpus². */
  def candidatePairs(buckets: DataFrame): DataFrame = {
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.sid") < col("b.sid"))
      .select(col("a.sid").as("id_a"), col("b.sid").as("id_b"))
      .distinct()
  }

  /** Exact shingle-set Jaccard for a pair table (verification step after
    * LSH candidate generation; joins only on candidate ids). */
  def verifyJaccard(pairs: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy(col("sid")).agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.as("sa"), col("id_a") === col("sa.sid"))
      .join(sh.as("sb"), col("id_b") === col("sb.sid") &&
        col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("na"), col("id_a") === col("na.sid"))
      .join(sizes.as("nb"), col("id_b") === col("nb.sid"))
      .select(col("id_a"), col("id_b"),
        (col("inter") / (col("na.n") + col("nb.n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Full MinHash+LSH near-duplicate pipeline: signature → band →
    * bucket-join → pairwise exact-verify.
    *
    * Band shape: 8 bands × 4 rows puts the LSH S-curve threshold at
    * j ≈ 0.77 — per-pair recall ≈ 0.985 at j = 0.8 (the verify threshold)
    * and ≈ 1.0 above 0.85, while weakly-similar pairs (j ≤ 0.3) stay under
    * ~6% candidate rate. Looser pruning than 4×8 is the right trade now
    * that verification is a row-local O(len) expression rather than a
    * multi-join over a shingle relation. */
  def minHashNearDup(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.8, reuseShingleHashes: Boolean = false,
      signaturePrefilter: Double = -1.0): DataFrame = {
    // 100 TB shape: signatures are a map-only projection (no shingle table
    // is ever shuffled for them); verification joins the two texts onto the
    // LSH-pruned pair set and computes the exact shingle Jaccard ROW-LOCALLY
    // (codegen'd ShingleJaccard) — no shingle relation exists anywhere in
    // the plan, so the only shuffled data is (doc, signature), the band
    // buckets, and the candidate pairs. Per-pair verify cost is
    // O(len_a + len_b); a doc in several pairs re-hashes per pair, bounded
    // by LSH pruning.
    //
    // `reuseShingleHashes` trades one stored array<long> column per doc for
    // that re-hash: each doc's distinct shingle-hash SET is computed once
    // (the same map-only ShingleHashes kernel) and pairs verify by set
    // intersection over the stored arrays — O(|a|+|b|) compares instead of
    // O(len_a+len_b) re-hashing per pair. The right trade when candidate
    // multiplicity per doc is high; identical output by construction (both
    // sides verify the same distinct 64-bit hash sets).
    // `signaturePrefilter` drops candidates whose MinHash-estimated Jaccard
    // (signature agreement fraction) falls below it BEFORE the exact
    // verify. The estimator is Binomial(numHashes, j)/numHashes, so a cut
    // 3σ below the verify threshold mis-drops a true j>=threshold pair
    // with P ~ 1e-3 at worst (1e-5 at the default threshold=0.8, whose σ
    // shrinks as j→1; the hashes are seeded, so on a given corpus the
    // outcome is deterministic and oracle-checkable) — the same
    // approximation class as banding itself, which also prunes by
    // signature. On high-baseline-similarity corpora this cuts the verify
    // set several-fold. Negative (the default) DERIVES the cut as
    // max(0, threshold − 3·sqrt(threshold·(1−threshold)/numHashes)) so
    // recall holds for ANY caller threshold — a fixed cut tuned for 0.8
    // would silently lose boundary pairs at, say, threshold=0.5. Explicit
    // 0.0 disables the prefilter entirely.
    val effectivePrefilter =
      if (signaturePrefilter >= 0.0) signaturePrefilter
      else math.max(0.0,
        threshold - 3.0 * math.sqrt(threshold * (1 - threshold) / numHashes))
    val spark = df.sparkSession
    val sigs = minHashSignatures(df, idCol, textCol, k, numHashes)
    val cands =
      if (effectivePrefilter <= 0.0)
        candidatePairs(lshBuckets(sigs, bands, numHashes / bands))
      else {
        // prefilter path: CARRY the signature through the bucket relation
        // instead of joining sigs back onto the pair set — the old shape
        // evaluated the signature kernel over the corpus four times (the
        // bucket self-join twice, the ga/gb prefilter joins twice); this
        // one evaluates it twice (once under exchange reuse), trading
        // bands x |sig| bytes per doc of extra shuffle for two fewer
        // corpus scans + kernel passes. Output identical: the estimator
        // reads the same per-doc signatures, dedup by (id_a, id_b) is the
        // same set, and first() over identical per-sid sig copies is
        // deterministic in value.
        val rows = numHashes / bands
        val bandHashes = (0 until bands).map { b =>
          xxhash64((b * rows until (b + 1) * rows)
            .map(i => element_at(col("sig"), i + 1)): _*)
        }
        val buckets = sigs.select(col("sid"), col("sig"),
          posexplode(array(bandHashes: _*)).as(Seq("band", "bucket")))
        buckets.as("a")
          .join(buckets.as("b"),
            col("a.band") === col("b.band") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.sid") < col("b.sid"))
          .select(col("a.sid").as("id_a"), col("b.sid").as("id_b"),
            col("a.sig").as("_siga"), col("b.sig").as("_sigb"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(first(col("_siga")).as("_siga"), first(col("_sigb")).as("_sigb"))
          .withColumn("est",
            size(filter(zip_with(col("_siga"), col("_sigb"),
              (x, y) => x === y), e => e)).cast("double") / numHashes)
          .filter(col("est") >= effectivePrefilter)
          .select(col("id_a"), col("id_b"))
      }
    if (reuseShingleHashes) {
      val hashed = df.select(col(idCol).as("tid"),
        graft.functions.TextHashFunctions.shingleHashes(
          spark, col(textCol), k).as("tsh"))
      cands
        .join(hashed.as("ta"), col("id_a") === col("ta.tid"))
        .join(hashed.as("tb"), col("id_b") === col("tb.tid"))
        .withColumn("inter",
          size(array_intersect(col("ta.tsh"), col("tb.tsh"))).cast("double"))
        .select(col("id_a"), col("id_b"),
          (col("inter") /
            (size(col("ta.tsh")) + size(col("tb.tsh")) - col("inter")))
            .as("jaccard"))
        .filter(col("jaccard") >= threshold)
    } else {
      val texts = df.select(col(idCol).as("tid"), col(textCol).as("ttext"))
      cands
        .join(texts.as("ta"), col("id_a") === col("ta.tid"))
        .join(texts.as("tb"), col("id_b") === col("tb.tid"))
        .select(col("id_a"), col("id_b"),
          graft.functions.TextHashFunctions.shingleJaccard(
            spark, col("ta.ttext"), col("tb.ttext"), k).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
  }

  /** Exact n-gram Jaccard similarity over ALL pairs above `threshold`,
    * computed by joining on shared grams (an inverted-index join: pairs with
    * zero overlap never materialize). Oracle-checkable in plain SQL.
    *
    * `maxDocFreqFraction` is the stop-gram guard for scale: a gram present
    * in more than that fraction of documents is dropped BEFORE the
    * inverted-index join (a ubiquitous gram otherwise funnels nearly every
    * doc pair through one reducer). Sizes are computed on the same filtered
    * gram sets, so the result is the true Jaccard over retained grams —
    * identical to the exact answer whenever the cutoff is unreached, a
    * documented approximation when it engages (the standard web-dedup
    * trade: exactness on noise-grams for skew immunity). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double, maxDocFreqFraction: Double = 1.0): DataFrame = {
    val sh0 = shingles(df, idCol, textCol, k)
    val sh = if (maxDocFreqFraction >= 1.0) sh0 else {
      // shingles() is distinct per (sid, shingle), so count == doc frequency
      val nDocs = df.agg(countDistinct(col(idCol)).as("n_docs"))
      val keepGrams = sh0.groupBy(col("shingle")).agg(count(lit(1)).as("gram_docs"))
        .crossJoin(broadcast(nDocs))
        .filter(col("gram_docs") <= col("n_docs") * maxDocFreqFraction)
        .select(col("shingle"))
      sh0.join(keepGrams, "shingle").select(col("sid"), col("shingle"))
    }
    val sizes = sh.groupBy(col("sid")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.sid") < col("b.sid"))
      .groupBy(col("a.sid").as("id_a"), col("b.sid").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("na"), col("id_a") === col("na.sid"))
      .join(sizes.as("nb"), col("id_b") === col("nb.sid"))
      .select(col("id_a"), col("id_b"),
        round(col("inter") / (col("na.n") + col("nb.n") - col("inter")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over a near-duplicate pair table: every doc in
    * the pair graph gets the SMALLEST doc id of its duplicate cluster as
    * `cluster_id` (the canonical survivor; rows with `doc_id != cluster_id`
    * are the drop set).
    *
    *  - `algorithm = "label"` (default): label propagation to a fixpoint —
    *    O(cluster diameter) rounds, each ONE join + min-aggregation whose
    *    single materializing action also yields the changed-count (labels
    *    only ever decrease, so `new < old` detects change without a second
    *    join). The right choice for shallow near-dup clusters.
    *  - `algorithm = "star"`: alternating large-star/small-star
    *    ([[alternatingStarClusters]]) — O(log n) rounds on deep chain
    *    graphs, for adversarial pair graphs at extreme scale. */
  def duplicateClusters(pairs: DataFrame, algorithm: String = "label"): DataFrame =
    algorithm match {
      case "label" => labelPropagationClusters(pairs)._1
      case "star" => alternatingStarClusters(pairs)._1
      case other => throw new IllegalArgumentException(
        s"duplicateClusters: unknown algorithm '$other' (label|star)")
    }

  /** @return (labels (doc_id, cluster_id), rounds run). See
    * [[duplicateClusters]]. Iteration caches are released; the result is a
    * lineage-truncated localCheckpoint (NOT recomputable after executor
    * loss — on an unreliable cluster re-run the operator, or swap in
    * reliable checkpointing). */
  private[ops] def labelPropagationClusters(pairs: DataFrame): (DataFrame, Int) = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))
        .localCheckpoint(true)
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < 64) {
        val prop = edges.join(labels, col("dst") === col("id"))
          .select(col("src").as("id"), col("label"))
        // one aggregation carries BOTH the new label (min over own + heard)
        // and the previous one (min over own rows only — each id has exactly
        // one). The LAZY localCheckpoint truncates lineage (iterative plans
        // otherwise grow exponentially — `labels` appears twice per round)
        // and is materialized by the count() below, so each round costs ONE
        // action and no label-vs-label join: `new < old` is the change
        // signal, labels being monotone non-increasing.
        val merged = labels.select(col("id"), col("label"), lit(true).as("own"))
          .union(prop.select(col("id"), col("label"), lit(false).as("own")))
          .groupBy(col("id"))
          .agg(min(col("label")).as("label"),
            min(when(col("own"), col("label"))).as("prev"))
          .localCheckpoint(false)
        changed = merged.filter(col("label") < col("prev")).count()
        labels = merged.select(col("id"), col("label"))
        rounds += 1
      }
      // checkpoint blocks of intermediate rounds are reclaimed by the
      // context cleaner as the frames go out of scope. Tradeoff:
      // localCheckpoint blocks are NOT recomputable after executor loss —
      // on an unreliable cluster, re-run the operator (or swap in reliable
      // checkpointing to a checkpoint dir).
      val out = labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
        .localCheckpoint(true)
      (out, rounds)
    } finally edges.unpersist(): Unit
  }

  /** SimHash 64-bit fingerprints from whitespace tokens: per bit, sum ±1
    * weighted votes of token hashes; fingerprint = sign bits. One MAP-ONLY
    * pass via the codegen'd [[graft.functions.SimHash64]] — the former
    * explode-tokens + 64 bit-vote aggregations shuffled the whole token
    * table. Near-dup candidates share a 16-bit band (Hamming-tolerant
    * bucketing, [[simHashCandidates]]). */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("sid"),
      graft.functions.TextHashFunctions.simHash64(
        df.sparkSession, col(textCol)).as("simhash"))

  /** SimHash near-dup candidates: same 16-bit band in any of 4 bands
    * (single-pass band emission, as in [[lshBuckets]]). */
  def simHashCandidates(fps: DataFrame): DataFrame = {
    val bandCols = (0 until 4).map { b =>
      shiftright(col("simhash"), 16 * b).bitwiseAND(lit(0xffffL))
    }
    val banded = fps.select(col("sid"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bucket")))
    candidatePairs(banded)
  }

  /** Candidate-quality gate for [[simHashCandidates]]: one row
    * `(n_docs, covered_ok)` where `covered_ok` is TRUE iff the candidate
    * set contains EVERY fingerprint pair within `maxHamming` bits —
    * derivable exactly from the fingerprints themselves. With 4 bands of
    * 16 bits, any pair differing in ≤ 3 bits cannot touch all four bands
    * (pigeonhole), so coverage at `maxHamming = 3` is a construction
    * invariant; at 4 bits it holds unless each differing bit lands in a
    * distinct band. The ground-truth side is an all-pairs broadcast
    * self-join over the 8-byte fingerprints — the explicit small-corpus
    * VERIFICATION tier (the scale path is the banded candidates being
    * gated; deriving ground truth any other way would reuse the same band
    * join and gate nothing). */
  def simHashCoverageGate(fps: DataFrame, cands: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    val close = fps.as("a")
      .join(broadcast(fps.as("b")), col("a.sid") < col("b.sid"))
      .select(col("a.sid").as("id_a"), col("b.sid").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hd"))
      .filter(col("hd") <= maxHamming)
    val nDocs = fps.agg(count(lit(1)).as("n_docs"))
    val uncovered = close
      .join(cands.select(col("id_a"), col("id_b"), lit(1).as("cand")),
        Seq("id_a", "id_b"), "left")
      .agg(coalesce(sum(when(col("cand").isNull, 1).otherwise(0)), lit(0))
        .as("n_uncovered"))
    nDocs.crossJoin(broadcast(uncovered))
      .select(col("n_docs"), (col("n_uncovered") === 0).as("covered_ok"))
  }

  // -------------------------------------------------------------------------
  // Connected components, alternating-star variant
  // -------------------------------------------------------------------------

  /** Exact SUBSTRING (span) dedup — Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": any run of `n`
    * consecutive whitespace tokens occurring in at least `minDf`
    * DOCUMENTS is a duplicated span. Returns (doc_id, span_start,
    * span_end) in token coordinates (start inclusive, end exclusive),
    * overlapping/touching duplicated n-grams merged into MAXIMAL spans.
    * This is the cross-document repeated-boilerplate pass the doc-level
    * family (exact/minhash/simhash) cannot express: two documents that
    * share one paragraph but nothing else never clear a Jaccard
    * threshold, yet the paragraph still memorizes.
    *
    * Spark-first shape (the distributed reformulation of the paper's
    * single-node suffix array): a span of length >= n duplicates iff each
    * of its n-grams duplicates, so n-gram DOCUMENT frequency is exact for
    * spans. The only corpus-scale shuffles carry (md5(gram), doc, start)
    * tuples — md5 keys are fixed-width on the wire AND replayable by the
    * SQL oracle; the gram text itself never shuffles. Span merging is
    * classic gaps-and-islands over each doc's duplicated starts — a
    * per-DOC window bounded by that document's own token count, never a
    * corpus sort. Self-repeats inside one document do not count toward
    * `minDf` (document frequency, not occurrence count).
    *
    * The gram relation materializes ONCE: an explicit repartition by the
    * gram key sits directly above the explode, and both consumers — the
    * document-frequency aggregate and the hit semi-join — hang off that
    * SAME exchange (Spark exchange reuse), so the expensive gram
    * construction (tokenize rides the fan-out exchange below; slice +
    * concat + two hashes per gram) runs a single time. hash(__g)
    * partitioning satisfies every downstream clustering requirement —
    * countDistinct's (gram, doc) partial, the per-gram count, and both
    * sides of the hit join (the dup side derives from the same exchange)
    * — so the only other shuffle is the island window's doc_id exchange
    * over the HIT rows (duplicated grams only). Both consumers reference
    * the identical (doc_id, span_start, __g) column set so column pruning
    * cannot specialize one side's projection below the exchange and split
    * it in two (reuse additionally requires the strawboat Scan's value
    * equality — see StrawScan.equals).
    * Per-gram work stays aggregate-shaped (partial + final count), never
    * a per-gram occurrence list — a boilerplate gram present in every
    * document still reduces through map-side combine, not one task.
    *
    * Gram identity is a 128-bit key (two xxhash64 lanes over the gram
    * text with independent effective seeds: the second lane hashes a
    * constant 1L FIRST, so it is xxhash64 of the gram under a different
    * seed rather than a function of the first lane) — same collision
    * contract as the previous md5 key at a fraction of the hash cost, and
    * the shuffled key is 16 bytes, not a 32-char hex string. The key
    * never reaches the output (spans are (doc, start, end)), so the
    * oracle's own md5 replay is unaffected. */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 20, minDf: Int = 2): DataFrame = {
    require(n >= 1, s"duplicateSpans: n must be >= 1, got $n")
    require(minDf >= 2, s"duplicateSpans: minDf must be >= 2, got $minDf")
    val toks = Par.fanOut(df.select(col(idCol).as("doc_id"),
        col(textCol).as("__txt")), "doc_id")
      .select(col("doc_id"),
        filter(split(lower(col("__txt")), "\\s+"), t => t =!= lit("")).as("__t"))
    // the too-short guard lives INSIDE the explode (empty array -> row
    // dropped by Generate) rather than as a filter(size >= n): a filter
    // gets pushed below the fan-out exchange, where evaluating it
    // re-tokenizes the corpus on the narrow pre-shuffle side
    val grams = toks
      .select(col("doc_id"), posexplode(when(size(col("__t")) >= n,
        transform(
          sequence(lit(0), size(col("__t")) - n),
          i => concat_ws(" ", slice(col("__t"), i + 1, lit(n)))))
        .otherwise(array().cast("array<string>")))
        .as(Seq("span_start", "__s")))
      .select(col("doc_id"), col("span_start"),
        struct(xxhash64(col("__s")).as("h1"),
          xxhash64(lit(1), col("__s")).as("h2")).as("__g"))
    val gramsX = grams.repartition(math.max(1,
      df.sparkSession.sessionState.conf.numShufflePartitions), col("__g"))
    val dup = gramsX
      .groupBy(col("__g")).agg(countDistinct(col("doc_id")).as("__df"),
        // semantically inert (posexplode ordinals are >= 0, so the filter
        // arm below never drops a group) — it exists so BOTH consumers of
        // the gram exchange keep the identical (doc_id, span_start, __g)
        // projection: a column set specialized to one side would sit below
        // the repartition and split the shared exchange in two, running
        // the gram Generate once per branch
        max(col("span_start")).as("__maxs"))
      .filter(col("__df") >= minDf && col("__maxs") >= 0)
      .select(col("__g"))
    val hits = gramsX.join(dup, "__g")
      .select(col("doc_id"), col("span_start"))
    // gaps-and-islands: two n-gram spans chain iff the later start is at
    // most n past the earlier (overlap or exact adjacency); island extent
    // is [min start, max start + n)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("span_start"))
    hits
      .withColumn("__new",
        when(col("span_start") <=
          coalesce(lag(col("span_start"), 1).over(w), lit(Long.MinValue / 2))
            + n, lit(0)).otherwise(lit(1)))
      .withColumn("__island", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__island"))
      .agg(min(col("span_start")).cast("long").as("span_start"),
        (max(col("span_start")) + n).cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"))
  }

  /** Rewrite `textCol` dropping the whitespace tokens covered by `spans`
    * ((doc_id, span_start, span_end) in [[duplicateSpans]]' token
    * coordinates) — the mechanical half of substring dedup; the caller
    * picks the retention policy by filtering `spans` first (e.g. keep the
    * lowest-id document's copy). MAP-ONLY over the corpus: spans group
    * into one bounded array per affected doc (merged islands are
    * disjoint, so a doc carries at most tokens/n entries), broadcast-or-
    * shuffle joined once, and the rewrite is a codegen'd
    * filter-with-index over the ORIGINAL tokens (case preserved — the
    * lowercase in [[duplicateSpans]] is match-only). Documents with no
    * spans pass through untouched. */
  def stripSpans(df: DataFrame, idCol: String, textCol: String,
      spans: DataFrame): DataFrame = {
    val sp = spans.groupBy(col("doc_id").as("__sid"))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("__spans"))
    df.join(sp, df(idCol) === sp("__sid"), "left")
      .withColumn(textCol, when(col("__spans").isNull, col(textCol))
        .otherwise(concat_ws(" ", filter(
          filter(split(col(textCol), "\\s+"), t => t =!= lit("")),
          (t, i) => !exists(col("__spans"),
            s => i >= s.getField("s") && i < s.getField("e"))))))
      .drop("__sid", "__spans")
  }

  // -------------------------------------------------------------------------
  // Semantic (embedding-space) dedup, cluster-bounded — SemDeDup
  // -------------------------------------------------------------------------

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): embedding-space
    * near-duplicate REMOVAL with the pairwise work bounded by k-means
    * clusters. [[graft.ops.Ann.exactNearDupPairs]] is O(n²) and
    * [[graft.ops.Ann.lshNearDupPairs]] buckets by data-independent random
    * hyperplanes; SemDeDup instead compares only rows assigned to the SAME
    * learned centroid — the paper's observation is that at web scale
    * semantic duplicates overwhelmingly co-locate in k-means cells, so
    * O(Σ cell²) with k grown alongside n (they run k≈11k over 100M+ docs)
    * replaces O(n²) while keeping recall near the exact tier.
    *
    * Returns the ids to DROP under the keep-earliest policy: a row is a
    * duplicate iff some EARLIER-id row in the same cluster scores
    * round(cosine, 4) >= tau — the same greedy first-writer-wins rule as
    * [[exact]] and [[streamingFirstSeen]], deterministic and exactly
    * SQL-replayable given the centroids (note the chain subtlety it
    * shares with every greedy dedup: b can be dropped for resembling a
    * row that was itself dropped). The paper's keep-farthest-from-
    * centroid policy is [[semanticDupIdsKeepFarthest]] (the general
    * ordering form is [[semanticDupIdsBy]]); earliest-id is the
    * replayable default.
    *
    * Scale shape: assignment is the broadcast codegen'd nearest-centroid
    * kernel (map-only); the ONLY shuffle is the equi-join on cell id, and
    * the per-cell pair blowup is the algorithm's own contract — size k so
    * cells stay task-sized (cells/k of the corpus each), exactly as the
    * reference pipelines do. No window, no driver loop, no all-pairs. */
  def semanticDupIds(spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame, centroids: Array[Array[Float]], tau: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(tau > 0.0 && tau <= 1.0,
      s"semanticDupIds: tau must be in (0, 1], got $tau")
    require(centroids.nonEmpty, "semanticDupIds: centroids must be non-empty")
    val a = Ann.kmeansAssign(spark,
      corpus.select(col(idCol), col(embCol)), centroids, embCol, "__sd_cell")
    // the pair scan's work is O(Σ cell²) FLOPs over O(rows) bytes, so a
    // byte-driven layout under-parallelizes it: on a small corpus the
    // stream side is one scan task (and AQE would coalesce a tiny
    // exchange to one partition), putting every pairwise cosine on one
    // core. Pin the stream side to an explicit cell-keyed repartition at
    // the session's shuffle width — the same exchange a sort-merge plan
    // needs anyway, so at scale this changes nothing but the pinning.
    val aw = a.repartition(math.max(1,
      spark.sessionState.conf.numShufflePartitions), col("__sd_cell"))
    // BOTH join sides are the same pinned frame: identical subtrees let
    // exchange reuse materialize the assignment kernel + cell shuffle once
    // (an unpinned b side planned its own ENSURE_REQUIREMENTS exchange —
    // different shuffle origin, no reuse — so the kernel ran twice)
    aw.as("a")
      .join(aw.as("b"),
        col("a.__sd_cell") === col("b.__sd_cell") &&
        col("a." + idCol) < col("b." + idCol))
      .filter(round(graft.functions.VectorFunctions.cosine(spark,
        col("a." + embCol), col("b." + embCol)), 4) >= tau)
      .select(col("b." + idCol).as(idCol))
      .distinct()
  }

  /** [[semanticDupIds]] under an explicit keep ORDERING: a row is a
    * duplicate iff some same-cell row with a strictly smaller
    * (orderKey, id) pair scores round(cosine, 4) >= tau — the LOWEST
    * (orderKey, id) in a duplicate neighborhood survives. With
    * `orderKey = lit(0)` this IS keep-earliest (spec-pinned); with the
    * round-4 cosine-to-centroid it is the paper's keep-farthest policy
    * ([[semanticDupIdsKeepFarthest]]). The key must be deterministic for
    * the result to be (round yours like the kernel rounds the cosine).
    * Same scale shape as [[semanticDupIds]]: the key is computed map-side
    * before the one cell-keyed shuffle. */
  def semanticDupIdsBy(spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame, centroids: Array[Array[Float]], tau: Double,
      orderKey: Column, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    require(tau > 0.0 && tau <= 1.0,
      s"semanticDupIdsBy: tau must be in (0, 1], got $tau")
    require(centroids.nonEmpty, "semanticDupIdsBy: centroids must be non-empty")
    val a = Ann.kmeansAssign(spark,
      corpus.select(col(idCol), col(embCol), orderKey.as("__sd_key")),
      centroids, embCol, "__sd_cell")
    // pair-scan parallelism pinned, and BOTH sides share the pinned
    // exchange — see semanticDupIds
    val aw = a.repartition(math.max(1,
      spark.sessionState.conf.numShufflePartitions), col("__sd_cell"))
    aw.as("a")
      .join(aw.as("b"),
        col("a.__sd_cell") === col("b.__sd_cell") &&
        (col("a.__sd_key") < col("b.__sd_key") ||
          (col("a.__sd_key") === col("b.__sd_key") &&
            col("a." + idCol) < col("b." + idCol))))
      .filter(round(graft.functions.VectorFunctions.cosine(spark,
        col("a." + embCol), col("b." + embCol)), 4) >= tau)
      .select(col("b." + idCol).as(idCol))
      .distinct()
  }

  /** SemDeDup's own keep policy (Abbas et al. 2023 §2: within a
    * duplicate neighborhood, keep the example with the LOWEST cosine
    * similarity to its cluster centroid — the farthest-out, most
    * "extreme" representative; keep-earliest keeps an arbitrary-but-
    * replayable one instead). The key is the round-4 cosine to the row's
    * own nearest centroid, id-tiebroken — deterministic and
    * SQL-replayable given the centroids. */
  def semanticDupIdsKeepFarthest(spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame, centroids: Array[Array[Float]], tau: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty,
      "semanticDupIdsKeepFarthest: centroids must be non-empty")
    val centsArr = array(centroids.map(c =>
      array(c.map(v => lit(v)): _*)): _*)
    val cell = element_at(graft.functions.VectorFunctions.nearestCells(
      spark, col(embCol), centroids, 1), 1)
    val key = round(graft.functions.VectorFunctions.cosine(spark,
      col(embCol), element_at(centsArr, cell + 1)), 4)
    semanticDupIdsBy(spark, corpus, centroids, tau, key, idCol, embCol)
  }

  /** The kept corpus: [[semanticDupIds]] anti-joined back — one extra
    * shuffle-or-broadcast join on the id (dup ids are typically a small
    * fraction, so AQE broadcasts them). */
  def semanticDedup(spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame, centroids: Array[Array[Float]], tau: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    corpus.join(semanticDupIds(spark, corpus, centroids, tau, idCol, embCol),
      Seq(idCol), "left_anti")

  /** Fit-then-dedup convenience: full-corpus [[graft.ops.Ann.kmeansFit]]
    * (EAGER — one corpus pass per iteration, k·dim driver collect, like
    * every model-fitting API) then the lazy [[semanticDupIds]] plan over
    * the fitted centroids. Returns (dupIds, centroids) so the caller can
    * reuse the fit for assignment or incremental appends. */
  def semanticDupIdsFit(spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame, dim: Int, k: Int, tau: Double, iters: Int = 3,
      seed: Long = 7, idCol: String = "vec_id",
      embCol: String = "embedding"): (DataFrame, Array[Array[Float]]) = {
    val (cents, _) = Ann.kmeansFit(spark, corpus, dim, k, iters, seed,
      embCol = embCol)
    (semanticDupIds(spark, corpus, cents, tau, idCol, embCol), cents)
  }

  /** SemDeDup over a PERSISTED IVF index ([[graft.ops.Ann.buildIvfIndex]])
    * — the amortized form of [[semanticDupIds]] for a corpus that is
    * already an ANN serving table. The cell assignment is ON DISK as the
    * index's `cent_id` hive-partition column, written by the same
    * nearest-centroid kernel [[semanticDupIds]] would run (frozen-
    * quantizer appends included), so the dup scan pays ZERO assignment
    * cost — O(k·dim) per row, paid once at index-build time. Measured
    * (DevSemScale, 1M × dim 16, k = 1024): direct 25.3 s → indexed scan
    * 18.3 s; the removed share grows linearly with k·dim, so at the
    * paper's operating point (k ≈ 11k, dim ≈ 768) assignment is the
    * dominant term. Both self-join sides read `keyGrouped`
    * (`KeyGroupedPartitioning` over the hive layout), so with
    * `spark.sql.sources.v2.bucketing.enabled` the same-cell join plans as
    * a storage-partitioned join — NO Exchange on either side; the pair
    * scan runs cell-local. Result == [[semanticDupIds]] over
    * [[graft.ops.Ann.loadIvfCentroids]] by construction (spec-pinned). */
  def semanticDupIdsIndexed(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, tau: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(tau > 0.0 && tau <= 1.0,
      s"semanticDupIdsIndexed: tau must be in (0, 1], got $tau")
    def side = spark.read.format("strawboat").option("keyGrouped", "true")
      .load(indexDir).select(col("cent_id"), col(idCol), col(embCol))
    side.as("a")
      .join(side.as("b"),
        col("a.cent_id") === col("b.cent_id") &&
        col("a." + idCol) < col("b." + idCol))
      .filter(round(graft.functions.VectorFunctions.cosine(spark,
        col("a." + embCol), col("b." + embCol)), 4) >= tau)
      .select(col("b." + idCol).as(idCol))
      .distinct()
  }

  /** STREAMING SemDeDup, first-writer-wins — the semantic member of the
    * streaming dedup family ([[streamingFirstSeen]] is [[exact]]'s,
    * [[streamingNearDupFirstSeen]] is [[minHashNearDup]]'s): emits the
    * ids of docs that are NOT semantic near-duplicates of any
    * earlier-arriving doc, under the same cluster-bounded rule as
    * [[semanticDupIds]].
    *
    * One stateful stage keyed by the k-means cell (assignment is the
    * same broadcast codegen'd kernel, applied map-side before the
    * shuffle): state holds EVERY (id, embedding) the cell has seen —
    * kept AND dropped, because [[semanticDupIds]]'s keep-earliest rule
    * compares against any earlier row, dropped ones included (the greedy
    * chain: b dropped for resembling a, c dropped for resembling b even
    * when c !~ a). A batch's rows verdict in ascending-id order against
    * the stored exemplars plus earlier in-batch rows; the cosine and its
    * round-to-4 match the batch kernel's arithmetic exactly (same
    * accumulation order, same HALF_UP rounding), so under ascending-id
    * admission the kept set EQUALS the batch complement — corpus minus
    * [[semanticDupIds]] — exactly (spec- and driver-gated).
    *
    * State is one embedding per doc per cell — the corpus, spread across
    * cells. That is the inherent cost of exact-replay semantic dedup
    * over an unbounded stream (the same class as
    * [[streamingFirstSeen]]'s per-digest marker, dim floats heavier);
    * bound it by windowing the key or restarting from a compacted
    * checkpoint when the duplicate horizon is finite. */
  def streamingSemanticFirstSeen(stream: DataFrame,
      centroids: Array[Array[Float]], tau: Double,
      idCol: String = "vec_id", embCol: String = "embedding")
      : org.apache.spark.sql.Dataset[Long] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(tau > 0.0 && tau <= 1.0,
      s"streamingSemanticFirstSeen: tau must be in (0, 1], got $tau")
    require(centroids.nonEmpty,
      "streamingSemanticFirstSeen: centroids must be non-empty")
    val spark = stream.sparkSession
    import spark.implicits._
    val assigned = Ann.kmeansAssign(spark,
        stream.select(col(idCol).cast("long").as("sid"),
          col(embCol).cast("array<float>").as("emb")),
        centroids, "emb", "__cell")
      .select(col("__cell"), col("sid"), col("emb"))
      .as[(Int, Long, Array[Float])]
    assigned.groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Array[Float])], Long](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, it, state) =>
          var seen = state.getOption.getOrElse(Nil) // newest-first
          val out = Seq.newBuilder[Long]
          it.toSeq.sortBy(_._2).foreach { case (_, sid, emb) =>
            if (!seen.exists { case (_, e) => cosineRound4(e, emb) >= tau })
              out += sid
            seen = (sid, emb) :: seen
          }
          state.update(seen)
          out.result().iterator
      }
  }

  /** Row-local cosine rounded to 4 decimals, mirroring
    * [[graft.functions.CosineSimilarity]]'s accumulation order and
    * Spark `round`'s HALF_UP exactly — the stream == batch equality
    * depends on bit-identical arithmetic. */
  private def cosineRound4(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; nx += x * x; ny += y * y
      i += 1
    }
    val c = if (nx == 0.0 || ny == 0.0) 0.0
      else dot / (math.sqrt(nx) * math.sqrt(ny))
    if (c.isNaN || c.isInfinite) c
    else BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** The kept corpus of [[semanticDupIdsIndexed]]: the index's rows
    * (cell column included — the survivors are still a valid probe
    * target) anti-joined on the dup ids. */
  def semanticDedupIndexed(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, tau: Double, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    spark.read.format("strawboat").load(indexDir)
      .join(semanticDupIdsIndexed(spark, indexDir, tau, idCol, embCol),
        Seq(idCol), "left_anti")

  private def symmetrize(e: DataFrame): DataFrame =
    e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()

  /** One large-star round: every node connects its LARGER neighbors to the
    * minimum of its closed neighborhood. Shrinks deep trees toward the
    * minimum without growing any star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond"). */
  private def largeStar(sym: DataFrame): DataFrame = {
    val m = sym.groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("m"))
    sym.join(m, "src")
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .union(m.select(col("src"), col("m").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** One small-star round: every node connects its SMALLER-or-equal
    * neighbors (and itself) to the minimum among them. */
  private def smallStar(sym: DataFrame): DataFrame = {
    val down = sym.filter(col("dst") <= col("src"))
    val m = down.groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("m"))
    down.join(m, "src")
      .filter(col("dst") =!= col("m"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .union(m.select(col("src"), col("m").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Connected components by alternating large-star/small-star rounds —
    * component diameter shrinks geometrically, so a path graph converges in
    * O(log n) rounds where label propagation needs O(n). Termination is the
    * edge-set FIXPOINT (the state is a fixpoint of the round function iff
    * the graph is a star forest rooted at component minima): edge sets are
    * distinct, so `same count ∧ empty one-way except` proves equality.
    * @return (labels (doc_id, cluster_id), rounds run) */
  private[ops] def alternatingStarClusters(pairs: DataFrame): (DataFrame, Int) = {
    // lazy localCheckpoint per round truncates the otherwise-exponential
    // iterative lineage; the count() that drives the convergence check
    // materializes it, so the common round costs one action (+ an exceptAll
    // only when counts tie)
    var edges = symmetrize(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      .localCheckpoint(false)
    var edgeCount = edges.count()
    var rounds = 0
    var changed = true
    while (changed && rounds < 64) {
      // BOTH operators must see the undirected graph: their neighborhoods
      // are defined over Γ(u), and each round's output is directed (child →
      // parent) — feeding it in un-symmetrized would make every node blind
      // to its children
      val next = smallStar(symmetrize(largeStar(symmetrize(edges))))
        .localCheckpoint(false)
      val nextCount = next.count()
      changed =
        if (nextCount != edgeCount) true
        else next.exceptAll(edges).count() > 0
      edges = next
      edgeCount = nextCount
      rounds += 1
    }
    // converged: stars around minima — each node's min closed neighbor IS
    // its component minimum. Roots carry their own id.
    val out = symmetrize(edges).groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("cluster_id"))
      .select(col("src").as("doc_id"), col("cluster_id"))
      .localCheckpoint(true)
    (out, rounds)
  }
}
