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

  /** Distinct k-character shingles of `text` as 64-bit hashes, one row per
    * (id, shingle) — the codegen'd [[graft.functions.ShingleHashes]] kernel
    * (one pass over the UTF-8 bytes per row; the SQL sequence/transform/
    * array_distinct formulation paid interpreted per-element dispatch).
    * Every downstream shuffle/join moves fixed-width longs, never k-char
    * strings; set semantics are preserved modulo ~2^-64 collisions. */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(
      col(idCol).as("sid"),
      explode(graft.functions.TextHashFunctions.shingleHashes(
        df.sparkSession, col(textCol), k)).as("shingle"))

  /** MinHash signatures as a MAP-ONLY projection: one (sid, array<long>)
    * row per doc via the codegen'd [[graft.functions.ShingleMinHash]] — no
    * shingle relation is materialized or shuffled for signatures at all. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int): DataFrame =
    df.select(col(idCol).as("sid"),
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
      threshold: Double = 0.8): DataFrame = {
    // 100 TB shape: signatures are a map-only projection (no shingle table
    // is ever shuffled for them); verification joins the two texts onto the
    // LSH-pruned pair set and computes the exact shingle Jaccard ROW-LOCALLY
    // (codegen'd ShingleJaccard) — no shingle relation exists anywhere in
    // the plan, so the only shuffled data is (doc, signature), the band
    // buckets, and the candidate pairs. Per-pair verify cost is
    // O(len_a + len_b); a doc in several pairs re-hashes per pair, bounded
    // by LSH pruning.
    val spark = df.sparkSession
    val cands = candidatePairs(
      lshBuckets(minHashSignatures(df, idCol, textCol, k, numHashes),
        bands, numHashes / bands))
    val texts = df.select(col(idCol).as("tid"), col(textCol).as("ttext"))
    cands
      .join(texts.as("ta"), col("id_a") === col("ta.tid"))
      .join(texts.as("tb"), col("id_b") === col("tb.tid"))
      .select(col("id_a"), col("id_b"),
        graft.functions.TextHashFunctions.shingleJaccard(
          spark, col("ta.ttext"), col("tb.ttext"), k).as("jaccard"))
      .filter(col("jaccard") >= threshold)
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
    * are the drop set). Label propagation to a fixpoint — O(cluster
    * diameter) rounds, each a join + min-aggregation; near-dup clusters are
    * shallow in practice so this converges in a handful of rounds. Edges
    * are pinned (MEMORY_AND_DISK) for the duration of the loop; at very
    * large graph scale swap in the large-star/small-star variant, which
    * shrinks diameter quadratically per round on the same join shape. */
  def duplicateClusters(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < 64) {
        val prop = edges.join(labels, col("dst") === col("id"))
          .select(col("src").as("id"), col("label"))
        val next = labels.union(prop)
          .groupBy(col("id")).agg(min(col("label")).as("label"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        changed = next.join(labels.withColumnRenamed("label", "prev"), "id")
          .filter(col("label") =!= col("prev")).count()
        labels.unpersist()
        labels = next
        rounds += 1
      }
      // materialize into a lineage-truncated checkpoint, then release every
      // iteration cache (blocks of the checkpoint are reclaimed by the
      // context cleaner once the returned frame is garbage-collected).
      // Tradeoff: localCheckpoint blocks are NOT recomputable after executor
      // loss — on an unreliable cluster, re-run the operator (or swap in
      // reliable checkpointing to a checkpoint dir) rather than relying on
      // lineage that the iteration caches no longer back
      val out = labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
        .localCheckpoint(true)
      labels.unpersist()
      out
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
}
