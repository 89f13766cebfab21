package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Fan-out for compute-dense map stages over narrow inputs — the
  * optimization-guide §2.5 move ("one huge unsplittable file →
  * repartition immediately after the read") applied to the LLM text/vector
  * operators, whose per-row work (n-gram hashing, MinHash signatures,
  * tokenize+bigram explode, pairwise cosine) dwarfs their input bytes.
  *
  * A small corpus lands in one strawboat file with one page per column, so
  * the scan cannot split and the expensive map stage runs on ONE core
  * while the other 31 idle (measured: q_dedup_spans' gram pass carried
  * ~3.9 s of task time in 1-2 tasks at sf0.1). Repartitioning the bare
  * (id, text/vector) projection costs one shuffle of the input bytes —
  * trivial exactly when this fires — and buys cores× parallelism for
  * everything after.
  *
  * Scale safety: gated on the plan's ESTIMATED size (logical stats — no
  * physical planning, no job, lazy-TVF-safe). Inputs at or above
  * cores × `spark.sql.files.openCostInBytes` (the same knob the scan's
  * split floor reads, default 4 MiB) already fan out at the scan, so the
  * gate makes this a no-op on any corpus big enough to matter — a 100 TB
  * input is never re-shuffled.
  */
private[graft] object Par {
  /** `df` repartitioned to the session's default parallelism when its
    * estimated size says the scan cannot have fanned out on its own;
    * otherwise `df` unchanged. Pass `key` (a deterministic, well-spread
    * column) to hash-partition — cheaper than round-robin (which pays a
    * local sort for retry determinism) and reusable by downstream
    * operators keyed the same way. */
  def fanOut(df: DataFrame, key: String = null): DataFrame = {
    val spark = df.sparkSession
    val par = math.max(1, spark.sparkContext.defaultParallelism)
    // both catch arms DISABLE the fan-out (estBytes = MaxValue) — log when
    // they fire so a plan shape that silently stops fanning out is visible
    // in dev profiling runs instead of reading as a perf regression
    val floor =
      try org.apache.spark.sql.internal.SQLConf.get.filesOpenCostInBytes
      catch {
        case e: Exception =>
          log.warn(s"Par.fanOut: filesOpenCostInBytes unreadable ($e); " +
            "using the 4 MiB default")
          4L << 20
      }
    val estBytes =
      try df.queryExecution.optimizedPlan.stats.sizeInBytes
      catch {
        case e: Exception =>
          log.warn(s"Par.fanOut: stats estimation failed ($e); " +
            "fan-out DISABLED for this plan")
          BigInt(Long.MaxValue)
      }
    if (estBytes >= BigInt(par) * floor) df
    else if (key == null) df.repartition(par)
    else df.repartition(par, col(key))
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)
}
