package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing and dataset sampling/mixing for training pipelines.
  *
  * Packing is the concat-and-chunk form most LLM data pipelines use: lay
  * documents out in a DETERMINISTIC order (per shard), run a cumulative
  * token sum, and cut training sequences every `budget` tokens. A document
  * straddling a boundary belongs to the bucket its span STARTS in (the
  * trainer's chunker splits it; the assignment stays deterministic). All
  * window work — one shuffle on the shard key, then codegen'd running
  * sums; no driver-side state, no UDFs.
  *
  * Sampling is hash-free deterministic stratified sampling: a stable
  * per-row key modulo 1000 against a per-stratum permille threshold. The
  * key is an arbitrary integral column (ids in the testdata); a production
  * deployment would substitute `xxhash64(id)` — same plan shape, same
  * pushdown behavior — the modulo form is chosen here so the DuckDB oracle
  * can replay the exact selection.
  */
object Packing {

  /** Assign each document to a training-sequence bucket of `budget` tokens
    * under concat-and-chunk, packed INDEPENDENTLY per `shardCol` value in
    * ascending `idCol` order within the shard. Output keeps the shard, id,
    * token count, bucket, and the offset of the document's first token
    * within its bucket.
    *
    * Scale shape: one shuffle on the shard key, then a codegen'd running
    * sum per shard — shards pack in parallel across the cluster. A single
    * global ordering would serialize the cumulative sum into one task;
    * sharding (by source, language, date — whatever the pipeline already
    * groups by) is the 100 TB form, and is also what keeps bucket ids
    * stable when shards are added or re-packed. */
  def packSequences(df: DataFrame, shardCol: String, idCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"strawboat: packing budget must be positive ($budget)")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(shardCol), col(idCol), col(tokensCol).cast("long").as("tokens"))
      .withColumn("cum", sum(col("tokens")).over(w))
      .select(
        col(shardCol),
        col(idCol),
        col("tokens"),
        expr(s"(cum - tokens) div ${budget}L").as("bucket"),
        ((col("cum") - col("tokens")) % budget).as("offset"))
  }

  /** Per-(shard, bucket) packing summary: document count, token total, and
    * fill ratio against the budget (the tail bucket underfills; interior
    * buckets may overfill by at most one straddling document). */
  def packingSummary(df: DataFrame, shardCol: String, idCol: String,
      tokensCol: String, budget: Long): DataFrame =
    packSequences(df, shardCol, idCol, tokensCol, budget)
      .groupBy(col(shardCol), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("tokens"))
      .withColumn("fill", round(col("tokens") / lit(budget.toDouble), 4))

  /** Deterministic stratified sampling: keep a row iff
    * `pmod(key, 1000) < permille(stratum)`. Missing strata keep nothing.
    * The selection is reproducible run-over-run and cluster-size-invariant
    * (pure map work — the filter pushes into the scan where the key is a
    * stored column). */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      permille: Map[String, Int]): DataFrame = {
    require(permille.values.forall(p => p >= 0 && p <= 1000),
      s"strawboat: permille rates must be 0..1000: $permille")
    val rate = permille.foldLeft(lit(0)) { case (acc, (s, p)) =>
      when(col(stratumCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(pmod(col(keyCol), lit(1000)) < rate)
  }

  /** Weighted dataset mixing: union the sources, each thinned to its
    * permille rate by [[stratifiedSample]]'s rule on `keyCol`, labeled with
    * its source name. Schemas must match by name (union by name). */
  def mixDatasets(sources: Seq[(String, DataFrame, Int)], keyCol: String): DataFrame = {
    require(sources.nonEmpty, "strawboat: mixDatasets needs at least one source")
    sources.map { case (name, df, permille) =>
      require(permille >= 0 && permille <= 1000,
        s"strawboat: permille rate for '$name' must be 0..1000: $permille")
      df.filter(pmod(col(keyCol), lit(1000)) < lit(permille))
        .withColumn("source_ds", lit(name))
    }.reduce(_.unionByName(_))
  }

  /** Deterministic training shards with a reproducible within-shard
    * shuffle: `shard` = md5(key) mod n, `shard_pos` = the row's ordinal in
    * md5 order inside its shard. The point is REPRODUCIBILITY across
    * engines and runs — md5 of the key's decimal string is the whole
    * randomness source, so any system (this engine, DuckDB, a Python
    * loader) replays the identical global shuffle and split, and a re-run
    * over the same corpus yields byte-identical shards.
    *
    * 100 TB shape: one hash-partition shuffle on `shard` plus a per-shard
    * sort — the exact physical plan a shard-writer wants (`repartition(n,
    * shard).sortWithinPartitions(...)` downstream); no global ordering,
    * no driver state. Keys must be unique for `shard_pos` stability (ties
    * break on the key itself, so equal-hash collisions stay
    * deterministic). */
  def shardForTraining(df: DataFrame, keyCol: String, numShards: Int): DataFrame = {
    require(numShards >= 1, s"strawboat: numShards must be positive: $numShards")
    val hx = md5(col(keyCol).cast("string"))
    val shard = pmod(conv(substring(hx, 1, 8), 16, 10).cast("long"),
      lit(numShards.toLong))
    df.withColumn("shard", shard)
      .withColumn("shard_pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(hx, col(keyCol))).cast("long"))
  }

  /** Deterministic train/val/test assignment: each row lands in the split
    * whose cumulative-weight interval contains its key-hash point —
    * `point = md5(key) first 8 hex digits / 2^32`, so the split is a pure
    * function of the key and ANY engine or later run reproduces it
    * row-for-row (the property that keeps a held-out set held out across
    * pipeline re-runs). Map-only: no shuffle, no state, no sampling
    * variance beyond the hash itself. Weights are normalized; interval
    * edges follow the declared order. */
  def assignSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "assignSplit: no splits given")
    require(splits.forall(_._2 > 0), s"assignSplit: weights must be positive")
    require(splits.map(_._1).distinct.size == splits.size,
      "assignSplit: duplicate split names")
    val total = splits.map(_._2).sum
    // a NULL key has no hash point — fail loudly instead of silently
    // dumping every null row into the last split (which would corrupt the
    // held-out set's proportions)
    val key = when(col(keyCol).isNull,
        raise_error(lit(s"assignSplit: null value in key column '$keyCol'")))
      .otherwise(col(keyCol))
    // point in [0, 1): first 8 md5 hex digits as a 32-bit uniform
    val point = conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    val cuts = splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    // declared order, last interval closed at 1.0 (hash can't reach it,
    // but guard anyway)
    val assigned = splits.map(_._1).zip(cuts).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, (name, hi)) =>
        when(point < lit(hi), lit(name)).otherwise(acc)
      }
    df.withColumn("split", assigned)
  }

  /** Temperature-scaled mixture sampling — the multilingual-corpus
    * balancing rule (mT5 / XLM-R style): stratum s is targeted with
    * probability p_s ∝ count_s^τ, so τ < 1 flattens the mix toward rare
    * strata (languages, sources) and τ = 1 keeps natural proportions.
    * Downsampling-only: the per-stratum keep rate is
    * min(1, targetFraction · N · p_s / count_s), rounded to 6 decimals so
    * a last-ulp `pow` difference between engines cannot flip boundary
    * membership, and a row keeps iff its md5 key point (the same 32-bit
    * uniform [[assignSplit]] uses) falls below its stratum's rate —
    * deterministic, engine-replayable, re-run-stable.
    *
    * Scale shape: stratum counts are one map-side-combined aggregation
    * (output = #strata rows); rates derive from two tiny aggregates and
    * broadcast-join back; the keep decision is map-only. No driver step,
    * no shuffle of the corpus itself. */
  def temperatureSample(df: DataFrame, keyCol: String, stratumCol: String,
      tau: Double, targetFraction: Double): DataFrame = {
    require(tau > 0, s"temperatureSample: tau must be positive, got $tau")
    require(targetFraction > 0 && targetFraction <= 1,
      s"temperatureSample: targetFraction must be in (0,1], got $targetFraction")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).cast("double").as("_n"))
    // corpus totals as a window over the counts table (#strata rows in one
    // partition — trivially small by contract), so the corpus itself is
    // scanned exactly once
    val w = Window.partitionBy()
    val rates = counts.select(col(stratumCol),
      round(least(lit(1.0),
        pow(col("_n"), tau) / sum(pow(col("_n"), tau)).over(w) *
          sum(col("_n")).over(w) * lit(targetFraction) / col("_n")),
        6).as("_rate"))
    val point = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    df.join(broadcast(rates), stratumCol)
      .filter(point < col("_rate"))
      .drop("_rate")
  }
}
