package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Time-series joins Spark's built-in operators can't express without an
  * inequality (theta) join — which Catalyst plans as a per-key cartesian:
  * O(n·m) comparisons per key and a broadcast-nested-loop fallback when no
  * equality key exists at all. Both operators here are join-free rewrites
  * whose cost stays linear in the input:
  *
  *  - [[asofJoin]]: the point-in-time "latest reference row at or before
  *    each probe row" join (pandas `merge_asof`, DuckDB/QuestDB `ASOF
  *    JOIN`). Implemented as union → one hash shuffle on the key → sorted
  *    window sweep, so the plan contains NO join node: each row is
  *    shuffled once and touched once, exactly the lower bound any
  *    key-partitioned join already pays. Skewed keys split under AQE like
  *    any other window.
  *  - [[rangeJoin]]: interval containment WITHOUT an equality key
  *    (point-in-range). Implemented by bucketing time into fixed bins:
  *    each interval replicates to the bins it covers, each point lands in
  *    exactly one bin, and the match becomes an equi-join on the bin id
  *    that Catalyst shuffles hash-partitioned — no cartesian, no
  *    broadcast-nested-loop. Each qualifying pair is emitted exactly once.
  *
  * Neither has a reference analog (the reference is a storage format;
  * its query surface has no temporal joins) — these are the Spark-first
  * designs for the two classic time-series shapes.
  */
object TemporalJoin {

  /** As-of join: for every row of `left`, attach the single `right` row
    * with the same key whose time is the nearest at-or-before
    * (`direction = "backward"`, the default), at-or-after (`"forward"`),
    * or closest on either side (`"nearest"`, ties prefer backward).
    *
    * Output: every `left` column, plus `rightTime` and `rightValues`
    * (prefixed with `rightPrefix`) from the matched row — null when no
    * match and `joinType = "left"`; unmatched rows are dropped under
    * `"inner"` (the default).
    *
    * @param rightTieBreak right column ordering duplicates at the same
    *   (key, time) — the row with the GREATEST tie-break wins; pass a
    *   unique column for deterministic results.
    * @param allowExactMatches when false, a right row at exactly the
    *   probe time does not match (strictly-before / strictly-after).
    * @param tolerance max separation between the probe and the matched
    *   row: an interval literal (e.g. `expr("INTERVAL '90' MINUTE")`)
    *   for timestamp time columns, a numeric for numeric ones. Matches
    *   farther away are treated as no-match.
    *
    * Scale shape: one Exchange on the key (what any join on that key
    * costs), a per-partition sort, zero join nodes, zero row
    * amplification. `"nearest"` adds a second sort (opposite direction)
    * over the same shuffle, not a second shuffle. Skew ceiling: the
    * sweep needs each key's full time order, so a hot key cannot split
    * across tasks (unlike AQE skew-JOIN splitting) — its cost is the
    * sort of that key's rows, measured flat at one-key-holds-half
    * (DevTemporalScale's skew arm: 6.6 s vs 6.6 s uniform at 2M×2M),
    * where the join formulation pays the hot key's probes×refs
    * cartesian.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightValues: Seq[String],
      rightTieBreak: String,
      direction: String = "backward",
      allowExactMatches: Boolean = true,
      tolerance: Option[Column] = None,
      joinType: String = "inner",
      rightPrefix: String = ""): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(Set("inner", "left")(joinType),
      s"joinType must be inner|left, got $joinType")
    val refNames = (rightTime +: rightValues).distinct
    val outRefNames = refNames.map(rightPrefix + _)
    val clash = left.columns.toSet.intersect(outRefNames.toSet)
    require(clash.isEmpty,
      s"right columns collide with left after prefixing: ${clash.mkString(",")}; " +
        "pass rightPrefix or rename")
    val (all, leftSide) = taggedUnion(left, right, leftKey, rightKey,
      leftTime, rightTime, refNames, rightTieBreak, allowExactMatches)

    def sweep(forward: Boolean): Column = {
      val t = if (forward) col("__t").desc else col("__t").asc
      val w = Window.partitionBy(col("__k"))
        .orderBy(t, col("__side").asc, col("__tb").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      last(col("__r"), ignoreNulls = true).over(w)
    }
    // gap is non-negative by construction; timestamp subtraction yields a
    // day-time interval, numeric subtraction a numeric — both compare
    // against the caller's tolerance directly.
    def gap(ref: Column, forward: Boolean): Column =
      if (forward) ref.getField(rightTime) - col("__t")
      else col("__t") - ref.getField(rightTime)

    val picked = direction match {
      case "backward" => all.withColumn("__ref", sweep(forward = false))
        .withColumn("__gap", gap(col("__ref"), forward = false))
      case "forward" => all.withColumn("__ref", sweep(forward = true))
        .withColumn("__gap", gap(col("__ref"), forward = true))
      case "nearest" =>
        nearestPick(all
          .withColumn("__rb", sweep(forward = false))
          .withColumn("__rf", sweep(forward = true)), rightTime, tolerance)
    }

    val within = tolerance.map(tol => col("__gap") <= tol).getOrElse(lit(true))
    val gated = picked.withColumn("__ref",
      when(col("__k").isNotNull && col("__t").isNotNull &&
        col("__ref").isNotNull && within, col("__ref")))
    val probes = gated.filter(col("__side") === leftSide)
    val matched =
      if (joinType == "inner") probes.filter(col("__ref").isNotNull) else probes
    matched.select(
      left.columns.map(n => col("__l").getField(n).as(n)) ++
        refNames.map(n => col("__ref").getField(n).as(rightPrefix + n)): _*)
  }

  /** The shared merge_asof NEAREST pick over a frame carrying both-neighbor
    * refs `__rb`/`__rf`: derive per-side gaps, gate EACH side's gap against
    * the tolerance BEFORE the nearer-side choice (pandas merge_asof
    * semantics — a probe whose nearest neighbor is out of tolerance still
    * matches the other side when that one is within; gating only the
    * winner would drop it), pick the nearer side (ties prefer backward),
    * emit `__ref`/`__gap`. One implementation serves both the plain
    * [[asofJoin]] sweep and the bucketed route, so the spec-pinned
    * semantics cannot diverge. */
  private def nearestPick(withBoth: DataFrame, rightTime: String,
      tolerance: Option[Column]): DataFrame = {
    val raw = withBoth
      .withColumn("__gb", col("__t") - col("__rb").getField(rightTime))
      .withColumn("__gf", col("__rf").getField(rightTime) - col("__t"))
    val both = tolerance match {
      case Some(tol) => raw
        .withColumn("__rb", when(col("__gb") <= tol, col("__rb")))
        .withColumn("__gb", when(col("__gb") <= tol, col("__gb")))
        .withColumn("__rf", when(col("__gf") <= tol, col("__rf")))
        .withColumn("__gf", when(col("__gf") <= tol, col("__gf")))
      case None => raw
    }
    both.withColumn("__ref",
        when(col("__rb").isNull, col("__rf"))
          .when(col("__rf").isNull, col("__rb"))
          .when(col("__gf") < col("__gb"), col("__rf"))
          .otherwise(col("__rb")))
      .withColumn("__gap",
        when(col("__ref").isNull, lit(null))
          .when(col("__gf") < col("__gb"), col("__gf"))
          .otherwise(coalesce(col("__gb"), col("__gf"))))
      .drop("__rb", "__rf", "__gb", "__gf")
  }

  /** Monotone numeric sweep axis for the tagged union's `__t`: micros for
    * timestamps (NTZ → TZ in the session zone; both sides convert
    * identically, so the zone choice cancels), exact long for integral
    * times, double for fractional numerics. One implementation serves both
    * bucketed routes. */
  private def timeAxis(dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case TimestampType | TimestampNTZType =>
        unix_micros(col("__t").cast(TimestampType))
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
        col("__t").cast("long")
      case _ => col("__t").cast("double")
    }

  /** [[asofJoin]] with the hot-key ceiling removed — the OPT-IN skew
    * path. The plain sweep needs each key's full time order, so one hot
    * key (half the rows on one symbol) sorts in ONE task. Here time
    * splits into `bucketWidth`-sized buckets and the sweep partitions by
    * (key, bucket): a hot key's rows spread across its buckets' tasks.
    * Exactness is restored by a CARRY-IN pre-pass — per (key, bucket),
    * the best reference from any EARLIER bucket, computed as a
    * per-(key, bucket) `max_by` aggregate (map-side combined; the
    * reference rows never sort globally) followed by a per-key running
    * window over the BUCKET AXIS (O(distinct buckets) rows per key, not
    * O(rows)) — injected into each bucket's sweep as an extra reference
    * row, where its older time orders it naturally before everything.
    *
    * Semantics are IDENTICAL to [[asofJoin]] for every direction
    * (spec-pinned across directions × exact-match × tolerance × join
    * type); `nearest` rides [[bucketedBothSweep]] — both neighbors from
    * one Exchange, then the per-side-tolerance-gated nearer-side pick.
    * `bucketWidth` is in the time column's own
    * units (MICROSECONDS for timestamps); any width is CORRECT — it only
    * tunes the parallelism/carry-pass balance (≈ the hot key's span
    * divided by the cluster's task count is a good start). */
  def asofJoinBucketed(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightValues: Seq[String],
      rightTieBreak: String,
      bucketWidth: Long,
      direction: String = "backward",
      allowExactMatches: Boolean = true,
      tolerance: Option[Column] = None,
      joinType: String = "inner",
      rightPrefix: String = ""): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(Set("inner", "left")(joinType),
      s"joinType must be inner|left, got $joinType")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val refNames = (rightTime +: rightValues).distinct
    val outRefNames = refNames.map(rightPrefix + _)
    val clash = left.columns.toSet.intersect(outRefNames.toSet)
    require(clash.isEmpty,
      s"right columns collide with left after prefixing: ${clash.mkString(",")}; " +
        "pass rightPrefix or rename")
    if (direction == "nearest") {
      // nearest needs both sweeps — ride [[bucketedBothSweep]] and apply
      // [[asofJoin]]'s exact nearest pick: tolerance gates EACH side's
      // gap BEFORE the nearer-side choice (merge_asof semantics), ties
      // prefer backward
      val (swept, ls) = bucketedBothSweep(left, right, leftKey, rightKey,
        leftTime, rightTime, refNames, rightTieBreak, allowExactMatches,
        bucketWidth)
      val picked = nearestPick(swept, rightTime, tolerance)
      val within =
        tolerance.map(tol => col("__gap") <= tol).getOrElse(lit(true))
      val gated = picked.withColumn("__ref",
        when(col("__k").isNotNull && col("__t").isNotNull &&
          col("__ref").isNotNull && within, col("__ref")))
      val probes =
        gated.filter(col("__side") === ls && col("__l").isNotNull)
      val matched =
        if (joinType == "inner") probes.filter(col("__ref").isNotNull)
        else probes
      return matched.select(
        left.columns.map(n => col("__l").getField(n).as(n)) ++
          refNames.map(n => col("__ref").getField(n).as(rightPrefix + n)): _*)
    }
    val (all0, leftSide) = taggedUnion(left, right, leftKey, rightKey,
      leftTime, rightTime, refNames, rightTieBreak, allowExactMatches)
    val forward = direction == "forward"
    // one monotone sweep AXIS folds the direction in: ascending axis ==
    // ascending time for backward, descending time for forward — the
    // winner at any position is then always the max (axis, side, tb)
    val tNum = timeAxis(all0.schema("__t").dataType)
    val axis = if (forward) -tNum else tNum
    val all = all0
      .withColumn("__ax", axis)
      .withColumn("__bkt", floor(col("__ax") / bucketWidth).cast("long"))

    // carry-in pre-pass: best reference per (key, bucket) — a bounded
    // aggregate, not a sort — then the running best over each key's
    // bucket axis, shifted one bucket late (strictly-earlier buckets)
    val refs = all.filter(col("__side") =!= leftSide && col("__ax").isNotNull)
    val bestPerBucket = refs.groupBy(col("__k"), col("__bkt"))
      .agg(max_by(struct(col("__ax"), col("__side"), col("__tb"), col("__r")),
        struct(col("__ax"), col("__tb"))).as("__best"))
    val bucketAxis = all.select(col("__k"), col("__bkt")).distinct()
      .join(bestPerBucket, Seq("__k", "__bkt"), "left")
    val wCarry = Window.partitionBy(col("__k")).orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = bucketAxis
      .withColumn("__carry", last(col("__best"), ignoreNulls = true).over(wCarry))
      .filter(col("__carry").isNotNull)
      .select(col("__k"), col("__bkt"),
        col("__carry.__ax").as("__ax"), col("__carry.__side").as("__side"),
        col("__carry.__tb").as("__tb"), col("__carry.__r").as("__r"))
      .withColumn("__l", lit(null).cast(all.schema("__l").dataType))
      .withColumn("__t", lit(null).cast(all.schema("__t").dataType))
      .select(all.columns.map(col): _*)

    // the per-(key, bucket) sweep — the plain asofJoin sweep with the
    // bucket folded into the partition key; the carried reference's
    // smaller axis orders it before everything in the bucket
    val w = Window.partitionBy(col("__k"), col("__bkt"))
      .orderBy(col("__ax").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = all.unionByName(carries)
      .withColumn("__ref", last(col("__r"), ignoreNulls = true).over(w))
    val gap =
      if (forward) col("__ref").getField(rightTime) - col("__t")
      else col("__t") - col("__ref").getField(rightTime)
    val within = tolerance.map(tol => gap <= tol).getOrElse(lit(true))
    val gated = swept.withColumn("__ref",
      when(col("__k").isNotNull && col("__t").isNotNull &&
        col("__ref").isNotNull && within, col("__ref")))
    val probes = gated.filter(col("__side") === leftSide && col("__l").isNotNull)
    val matched =
      if (joinType == "inner") probes.filter(col("__ref").isNotNull) else probes
    matched.select(
      left.columns.map(n => col("__l").getField(n).as(n)) ++
        refNames.map(n => col("__ref").getField(n).as(rightPrefix + n)): _*)
  }

  /** The shared bucketed two-direction sweep: tagged union on the NATURAL
    * time axis, bucket = floor(axis / bucketWidth), then one backward and
    * one forward window sweep both partitioned by (key, bucket) — ONE
    * Exchange, two sorts, the same plan family as [[asofBothJoin]] with
    * the hot-key ceiling removed. Exactness across bucket borders comes
    * from two carry rows per (key, bucket), computed in one bounded
    * aggregate pass (O(distinct buckets) rows per key, never row-sorted
    * globally):
    *
    *  - CARRY-IN: the backward-best reference (max (axis, tieBreak)) of
    *    the latest earlier non-empty bucket — its axis is strictly BELOW
    *    the bucket's range, so it sorts first in the backward sweep
    *    (visible to every probe) and last in the forward sweep
    *    (visible to nothing).
    *  - CARRY-OUT: the forward-best reference (min axis, max tieBreak on
    *    ties — the sweep's last-wins tie rule) of the nearest later
    *    non-empty bucket — strictly ABOVE the range: first in the forward
    *    sweep, inert in the backward one.
    *
    * Domination makes "nearest non-empty bucket" sufficient: every
    * reference in a closer bucket beats every reference in a farther one
    * on the axis, so the running `last` over the bucket axis is the
    * correct carry in both directions.
    *
    * Returns (swept frame with `__rb`/`__rf` both-neighbor refs,
    * leftSideTag). Callers gate null keys/times and filter probes. */
  private def bucketedBothSweep(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      refNames: Seq[String], rightTieBreak: String,
      allowExactMatches: Boolean, bucketWidth: Long): (DataFrame, Int) = {
    val (all0, leftSide) = taggedUnion(left, right, leftKey, rightKey,
      leftTime, rightTime, refNames, rightTieBreak, allowExactMatches)
    val all = all0
      .withColumn("__ax", timeAxis(all0.schema("__t").dataType))
      .withColumn("__bkt", floor(col("__ax") / bucketWidth).cast("long"))
    val refs = all.filter(col("__side") =!= leftSide && col("__ax").isNotNull)
    // one bounded pass: both per-(key, bucket) bests. Backward best =
    // max (axis, tb); forward best = min axis with max tb on axis ties
    // (the traversal's last-wins rule) = max (-axis, tb).
    val bests = refs.groupBy(col("__k"), col("__bkt"))
      .agg(
        max_by(struct(col("__ax"), col("__side"), col("__tb"), col("__r")),
          struct(col("__ax"), col("__tb"))).as("__bestB"),
        max_by(struct(col("__ax"), col("__side"), col("__tb"), col("__r")),
          struct((-col("__ax")).as("__nax"), col("__tb"))).as("__bestF"))
    val bucketAxis = all.select(col("__k"), col("__bkt")).distinct()
      .join(bests, Seq("__k", "__bkt"), "left")
    val wIn = Window.partitionBy(col("__k")).orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOut = Window.partitionBy(col("__k")).orderBy(col("__bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = bucketAxis
      .withColumn("__cin", last(col("__bestB"), ignoreNulls = true).over(wIn))
      .withColumn("__cout", last(col("__bestF"), ignoreNulls = true).over(wOut))
    def carryRows(c: String): DataFrame = carried.filter(col(c).isNotNull)
      .select(col("__k"), col("__bkt"),
        col(s"$c.__ax").as("__ax"), col(s"$c.__side").as("__side"),
        col(s"$c.__tb").as("__tb"), col(s"$c.__r").as("__r"))
      .withColumn("__l", lit(null).cast(all.schema("__l").dataType))
      .withColumn("__t", lit(null).cast(all.schema("__t").dataType))
      .select(all.columns.map(col): _*)
    val wB = Window.partitionBy(col("__k"), col("__bkt"))
      .orderBy(col("__ax").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("__k"), col("__bkt"))
      .orderBy(col("__ax").desc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = all
      .unionByName(carryRows("__cin")).unionByName(carryRows("__cout"))
      .withColumn("__rb", last(col("__r"), ignoreNulls = true).over(wB))
      .withColumn("__rf", last(col("__r"), ignoreNulls = true).over(wF))
    (swept, leftSide)
  }

  /** [[asofBothJoin]] with the hot-key ceiling removed — the OPT-IN skew
    * path for the interpolation building block, completing the family
    * [[asofJoinBucketed]] opened for backward/forward. Semantics are
    * IDENTICAL to [[asofBothJoin]] (spec-pinned across exact-match ×
    * join type × bucket widths incl. degenerates); `bucketWidth` is in
    * the time column's own units (MICROSECONDS for timestamps) and any
    * positive width is CORRECT — it only tunes the parallelism/
    * carry-pass balance. */
  def asofBothJoinBucketed(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightValues: Seq[String],
      rightTieBreak: String,
      bucketWidth: Long,
      allowExactMatches: Boolean = true,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left")(joinType),
      s"joinType must be inner|left, got $joinType")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val refNames = (rightTime +: rightValues).distinct
    val outNames = refNames.flatMap(n => Seq("bwd_" + n, "fwd_" + n))
    val clash = left.columns.toSet.intersect(outNames.toSet)
    require(clash.isEmpty,
      s"right columns collide with left after prefixing: ${clash.mkString(",")}")
    val (swept, leftSide) = bucketedBothSweep(left, right, leftKey, rightKey,
      leftTime, rightTime, refNames, rightTieBreak, allowExactMatches,
      bucketWidth)
    val valid = col("__k").isNotNull && col("__t").isNotNull
    val gated = swept
      .withColumn("__rb", when(valid, col("__rb")))
      .withColumn("__rf", when(valid, col("__rf")))
    val probes = gated.filter(col("__side") === leftSide && col("__l").isNotNull)
    val matched =
      if (joinType == "inner")
        probes.filter(col("__rb").isNotNull && col("__rf").isNotNull)
      else probes
    matched.select(
      left.columns.map(n => col("__l").getField(n).as(n)) ++
        refNames.map(n => col("__rb").getField(n).as("bwd_" + n)) ++
        refNames.map(n => col("__rf").getField(n).as("fwd_" + n)): _*)
  }

  /** The tagged probe/reference union both as-of variants sweep over.
    * Traversal order is by time (asc for backward, desc for forward); the
    * side tag decides whether a right row at the probe's exact time is
    * already visible when the probe is reached. Null reference keys/times
    * drop entirely (merge_asof: they never match); composite struct keys
    * with different FIELD NAMES cast positionally to the left's type.
    * Returns (union, leftSideTag). */
  private def taggedUnion(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTime: String, rightTime: String,
      refNames: Seq[String], rightTieBreak: String,
      allowExactMatches: Boolean): (DataFrame, Int) = {
    val (leftSide, rightSide) = if (allowExactMatches) (1, 0) else (0, 1)
    val refType = right.select(refNames.map(col): _*).schema
    val leftType = left.schema
    val tbType = right.schema(rightTieBreak).dataType
    val lTagged = left.select(
      left(leftKey).as("__k"), left(leftTime).as("__t"),
      lit(leftSide).as("__side"), lit(null).cast(tbType).as("__tb"),
      struct(left.columns.map(left(_)): _*).as("__l"),
      lit(null).cast(refType).as("__r"))
    val lKeyType = left.schema(leftKey).dataType
    val rKey0 = right(rightKey)
    val rKey =
      if (right.schema(rightKey).dataType == lKeyType) rKey0
      else if (org.apache.spark.sql.types.DataType.equalsStructurally(
        right.schema(rightKey).dataType, lKeyType, ignoreNullability = true))
        rKey0.cast(lKeyType)
      else rKey0
    val rTagged = right
      .filter(rKey0.isNotNull && right(rightTime).isNotNull)
      .select(
        rKey.as("__k"), right(rightTime).as("__t"),
        lit(rightSide).as("__side"), right(rightTieBreak).as("__tb"),
        lit(null).cast(leftType).as("__l"),
        struct(refNames.map(n => right(n).as(n)): _*).as("__r"))
    (lTagged.unionByName(rTagged), leftSide)
  }

  /** Both-neighbor as-of: every `left` row with BOTH the latest
    * at-or-before AND the earliest at-or-after `right` row attached
    * (prefixes `bwd_`/`fwd_`) — the building block for time
    * INTERPOLATION (lerp between the neighbors), gap measurement, and
    * sandwich validation. `joinType = "inner"` keeps only probes with
    * both neighbors; `"left"` keeps all probes, missing sides null.
    * One shuffle, two sorts, no join node — the same plan family as
    * [[asofJoin]]'s "nearest". */
  def asofBothJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightValues: Seq[String],
      rightTieBreak: String,
      allowExactMatches: Boolean = true,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left")(joinType),
      s"joinType must be inner|left, got $joinType")
    val refNames = (rightTime +: rightValues).distinct
    val outNames = refNames.flatMap(n => Seq("bwd_" + n, "fwd_" + n))
    val clash = left.columns.toSet.intersect(outNames.toSet)
    require(clash.isEmpty,
      s"right columns collide with left after prefixing: ${clash.mkString(",")}")
    val (all, leftSide) = taggedUnion(left, right, leftKey, rightKey,
      leftTime, rightTime, refNames, rightTieBreak, allowExactMatches)
    def sweep(forward: Boolean): Column = {
      val t = if (forward) col("__t").desc else col("__t").asc
      val w = Window.partitionBy(col("__k"))
        .orderBy(t, col("__side").asc, col("__tb").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      last(col("__r"), ignoreNulls = true).over(w)
    }
    val valid = col("__k").isNotNull && col("__t").isNotNull
    val both = all
      .withColumn("__rb", when(valid, sweep(forward = false)))
      .withColumn("__rf", when(valid, sweep(forward = true)))
      .filter(col("__side") === leftSide)
    val matched =
      if (joinType == "inner")
        both.filter(col("__rb").isNotNull && col("__rf").isNotNull)
      else both
    matched.select(
      left.columns.map(n => col("__l").getField(n).as(n)) ++
        refNames.map(n => col("__rb").getField(n).as("bwd_" + n)) ++
        refNames.map(n => col("__rf").getField(n).as("fwd_" + n)): _*)
  }

  /** Interval-containment join with no equality key: every (interval,
    * point) pair with `low <= point <= high`, each emitted exactly once.
    * `intervals` and `points` column names must be disjoint (rename
    * first); rows with a null bound or point never match.
    *
    * @param binWidth bucket size in the time column's own units —
    *   MICROSECONDS for timestamp columns, plain units for numerics.
    *   Each interval replicates to `span/binWidth + 1` bins (each point
    *   to exactly one), so pick it near the typical interval span: the
    *   replication stays a small constant and the equi-join on the bin
    *   id carries all the pruning.
    * @param extraKeys optional (intervalCol, pointCol) equality pairs
    *   folded into the join key.
    */
  /** Interval-OVERLAP join with no equality key: every (left interval,
    * right interval) pair with `aLo <= bHi && bLo <= aHi`, each emitted
    * EXACTLY once. Both sides replicate to their covering bins, the
    * match becomes a bin-id equi-join — and because an overlapping pair
    * shares every bin their intersection covers, the join keeps only the
    * bin containing the overlap's START (`max(aLo, bLo)`), which each
    * pair has exactly one of. Same no-cartesian plan shape as
    * [[rangeJoin]]; column names must be disjoint. */
  def rangeOverlapJoin(
      left: DataFrame, leftLow: String, leftHigh: String,
      right: DataFrame, rightLow: String, rightHigh: String,
      binWidth: Long,
      maxBinsPerInterval: Int = DefaultMaxBinsPerInterval): DataFrame = {
    // binWidth <= 0 opts into auto-derivation: the p95 span quantile of
    // the LEFT intervals ([[suggestBinWidth]] — one aggregate at
    // plan-build time, trading the lazy-builder convention for a width
    // that cannot be degenerately wrong)
    val width =
      if (binWidth > 0) binWidth else suggestBinWidth(left, leftLow, leftHigh)
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty,
      s"left/right column names must be disjoint, got: ${clash.mkString(",")}")
    def num(df: DataFrame, name: String): Column =
      df.schema(name).dataType match {
        case TimestampType | TimestampNTZType =>
          unix_micros(df(name).cast(TimestampType))
        case _ => df(name)
      }
    // inverted (lo > hi) intervals never match — the same contract as
    // null bounds. Without the filter, sequence() auto-steps -1 and a
    // malformed row could still satisfy aLo<=bHi && bLo<=aHi.
    val a = left.filter(left(leftLow) <= left(leftHigh)).withColumn("__bin",
      explode(binsGuarded(num(left, leftLow), num(left, leftHigh),
        width, maxBinsPerInterval, "rangeOverlapJoin")))
    val b = right.filter(right(rightLow) <= right(rightHigh)).withColumn("__bin",
      explode(binsGuarded(num(right, rightLow), num(right, rightHigh),
        width, maxBinsPerInterval, "rangeOverlapJoin")))
    a.join(b, a("__bin") === b("__bin") &&
        a(leftLow) <= b(rightHigh) && b(rightLow) <= a(leftHigh) &&
        // exactly-once: only the bin holding the overlap's start emits
        floor(greatest(num(a, leftLow), num(b, rightLow)) / width)
          .cast("long") === a("__bin"))
      .drop("__bin")
  }

  def rangeJoin(
      intervals: DataFrame, low: String, high: String,
      points: DataFrame, point: String,
      binWidth: Long,
      extraKeys: Seq[(String, String)] = Nil,
      maxBinsPerInterval: Int = DefaultMaxBinsPerInterval): DataFrame = {
    // binWidth <= 0 opts into auto-derivation (see [[rangeOverlapJoin]])
    val width =
      if (binWidth > 0) binWidth else suggestBinWidth(intervals, low, high)
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    val clash = intervals.columns.toSet.intersect(points.columns.toSet)
    require(clash.isEmpty,
      s"interval/point column names must be disjoint, got: ${clash.mkString(",")}")

    def num(df: DataFrame, name: String): Column =
      df.schema(name).dataType match {
        // NTZ → TZ interprets in the session zone; both sides convert
        // identically and the exact filter compares the ORIGINAL columns,
        // so the zone choice can't change results
        case TimestampType | TimestampNTZType =>
          unix_micros(df(name).cast(TimestampType))
        case _ => df(name)
      }
    // inverted intervals can't contain any point (the exact filter would
    // drop them anyway) — filtering them BEFORE the explode also stops
    // sequence()'s auto-step -1 from replicating malformed rows for free
    val iv = intervals.filter(intervals(low) <= intervals(high))
      .withColumn("__bin", explode(binsGuarded(num(intervals, low),
        num(intervals, high), width, maxBinsPerInterval, "rangeJoin")))
    val pt = points.withColumn("__bin",
      floor(num(points, point) / width).cast("long"))
    val cond = extraKeys.foldLeft(iv("__bin") === pt("__bin")) {
      case (acc, (ik, pk)) => acc && iv(ik) === pt(pk)
    }
    iv.join(pt, cond)
      .filter(points(point) >= intervals(low) && points(point) <= intervals(high))
      .drop("__bin")
  }

  /** Default ceiling on bins-per-interval for the bin-join family. One
    * long-tail interval at a too-fine binWidth (a year-long span at
    * minute bins is 525k copies) silently amplifies rows with no
    * feedback; past this bound the job fails loudly instead. */
  val DefaultMaxBinsPerInterval: Int = 65536

  /** The guarded covering-bin list for one interval: `sequence(binLo,
    * binHi)` with a loud per-row replication cap — an interval spanning
    * more than `cap` bins raises (executor-side, via `assert_true`)
    * instead of silently exploding the row count. The caller filters
    * inverted intervals first, so binLo <= binHi here. */
  private def binsGuarded(lo: Column, hi: Column, binWidth: Long, cap: Int,
      op: String): Column = {
    val binLo = floor(lo / binWidth).cast("long")
    val binHi = floor(hi / binWidth).cast("long")
    val nBins = binHi - binLo + lit(1L)
    val msg = concat(
      lit(s"$op: interval replicates to "), nBins.cast("string"),
      lit(s" bins at binWidth=$binWidth (cap $cap) - raise binWidth " +
        "(see suggestBinWidth) or maxBinsPerInterval"))
    // assert_true returns NULL when the predicate holds and raises
    // otherwise; chaining via when(...isNull) keeps it un-prunable
    when(assert_true(nBins <= cap, msg).isNull, sequence(binLo, binHi))
  }

  /** Derive a binWidth for [[rangeJoin]]/[[rangeOverlapJoin]] from the
    * data: the `quantile` (default 0.95) of the interval spans, so the
    * typical interval replicates to ~1-2 bins and only the long tail
    * past the quantile replicates more. One distributed
    * `approx_percentile` aggregate over the interval table (a single
    * action, no driver-side row materialization); inverted/null
    * intervals are ignored; returns at least 1. Units follow the bound
    * columns' own units — MICROSECONDS for timestamps. */
  def suggestBinWidth(intervals: DataFrame, low: String, high: String,
      quantile: Double = 0.95): Long = {
    require(quantile > 0 && quantile <= 1,
      s"quantile must be in (0,1], got $quantile")
    def num(name: String): Column = intervals.schema(name).dataType match {
      case TimestampType | TimestampNTZType =>
        unix_micros(intervals(name).cast(TimestampType))
      case _ => intervals(name)
    }
    val row = intervals.filter(intervals(low) <= intervals(high))
      .select((num(high) - num(low)).cast("double").as("__span"))
      .agg(expr(s"approx_percentile(__span, $quantile)"))
      .head()
    if (row.isNullAt(0)) 1L else math.max(1L, math.round(row.getDouble(0)))
  }
}
