package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Sequence packing + deterministic sampling/mixing invariants. */
class PackingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("packing-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  test("packSequences: deterministic concat-and-chunk per shard") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      ("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 60L), ("a", 4L, 100L),
      ("b", 1L, 250L), ("b", 2L, 10L)).toDF("shard", "id", "toks")
    val packed = Packing.packSequences(docs, "shard", "id", "toks", 200L)
      .orderBy("shard", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // shard a: cum-before = 0,100,200,260 → buckets 0,0,1,1; offsets 0,100,0,60
    // shard b: cum-before = 0,250 → buckets 0,1; offsets 0,50
    assert(packed.toSeq == Seq(
      ("a", 1L, 0L, 0L), ("a", 2L, 0L, 100L), ("a", 3L, 1L, 0L), ("a", 4L, 1L, 60L),
      ("b", 1L, 0L, 0L), ("b", 2L, 1L, 50L)))
    // invariants: every document assigned exactly once; token totals conserved
    val summary = Packing.packingSummary(docs, "shard", "id", "toks", 200L)
    assert(summary.agg(sum("n_docs")).collect()(0).getLong(0) == 6)
    assert(summary.agg(sum("tokens")).collect()(0).getLong(0) == 620)
    // a document never starts past the budget boundary
    assert(Packing.packSequences(docs, "shard", "id", "toks", 200L)
      .filter(col("offset") >= 200).count() == 0)
  }

  test("stratifiedSample + mixDatasets: deterministic, rate-bounded") {
    val sp = spark; import sp.implicits._
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val sampled = Packing.stratifiedSample(df, "id", "lang",
      Map("en" -> 500, "de" -> 100))
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ids 0..999: en = even ids with id%1000<500 → 250; de = odd with <100 → 50
    assert(byLang == Map("en" -> 250L, "de" -> 50L))
    // determinism: same selection twice
    assert(sampled.collect().map(_.getLong(0)).sorted.toSeq ==
      Packing.stratifiedSample(df, "id", "lang", Map("en" -> 500, "de" -> 100))
        .collect().map(_.getLong(0)).sorted.toSeq)
    // mixing: weights apply per source, label column added
    val mixed = Packing.mixDatasets(Seq(
      ("even", df.filter(col("id") % 2 === 0), 1000),
      ("odd", df.filter(col("id") % 2 === 1), 0)), "id")
    assert(mixed.filter(col("source_ds") === "even").count() == 500)
    assert(mixed.filter(col("source_ds") === "odd").count() == 0)
  }

  test("shardForTraining: complete, balanced-ish, reproducible shards") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 1000L).toDF("id")
    val sharded = Packing.shardForTraining(df, "id", 8).cache()
    // complete and disjoint: every row lands in exactly one shard
    assert(sharded.count() == 1000)
    assert(sharded.select("shard").distinct().count() == 8)
    assert(sharded.agg(org.apache.spark.sql.functions.min("shard"),
      org.apache.spark.sql.functions.max("shard")).head.toSeq == Seq(0L, 7L))
    // within-shard positions are dense 1..size (a reproducible ordering,
    // not just an arbitrary partition order)
    val sizes = sharded.groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxPos = sharded.groupBy("shard")
      .agg(org.apache.spark.sql.functions.max("shard_pos").as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == maxPos, s"positions not dense: $sizes vs $maxPos")
    // md5 is the whole randomness source: a second run replays exactly
    val again = Packing.shardForTraining(df, "id", 8)
    assert(sharded.select("id", "shard", "shard_pos").exceptAll(
      again.select("id", "shard", "shard_pos")).isEmpty)
    // and the shuffle actually shuffles: within a shard, id order and
    // position order disagree somewhere
    val firstShard = sharded.filter(col("shard") === 0)
      .orderBy(col("shard_pos")).select("id").collect().map(_.getLong(0))
    assert(firstShard.toSeq != firstShard.sorted.toSeq,
      "md5 ordering should not coincide with key order")
    sharded.unpersist()
  }

  test("assignSplit: complete, proportional, reproducible, declared-order intervals") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 2000L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = Packing.assignSplit(df, "id", splits).cache()
    assert(assigned.count() == 2000)
    val counts = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 2000)
    // hash-uniform: each split within ±4 sigma of its expectation
    assert(math.abs(counts("train") - 1600L) < 72, counts.toString)
    assert(math.abs(counts("val") - 200L) < 54, counts.toString)
    // a second run replays the identical assignment
    val again = Packing.assignSplit(df, "id", splits)
    assert(assigned.exceptAll(again).isEmpty)
    // unnormalized weights land identically (4:1:... scaled)
    val scaled = Packing.assignSplit(df, "id",
      Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
    assert(assigned.exceptAll(scaled).isEmpty)
    // a null key has no hash point: loud failure, not a silent dump into
    // the last split
    val withNull = spark.sql("SELECT CAST(null AS BIGINT) AS id")
      .union(df.limit(3))
    val err = intercept[Exception](
      Packing.assignSplit(withNull, "id", splits).collect())
    assert(err.getMessage.contains("assignSplit") ||
      (err.getCause != null && err.getCause.getMessage.contains("assignSplit")),
      s"unexpected error: ${err.getMessage}")
    intercept[IllegalArgumentException](Packing.assignSplit(df, "id", Seq.empty))
    intercept[IllegalArgumentException](
      Packing.assignSplit(df, "id", Seq("a" -> 1.0, "a" -> 1.0)))
    intercept[IllegalArgumentException](
      Packing.assignSplit(df, "id", Seq("a" -> -1.0)))
    assigned.unpersist()
  }

  test("temperatureSample: flattens skew toward rare strata; deterministic") {
    val sp = spark; import sp.implicits._
    // skewed strata: a=4000, b=1000, c=250
    val df = spark.range(5250).select(col("id"),
      when(col("id") < 4000, "a").when(col("id") < 5000, "b")
        .otherwise("c").as("src")).repartition(4)
    val kept = Packing.temperatureSample(df, "id", "src", tau = 0.5,
      targetFraction = 0.5).persist()
    val counts = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // expected rates from the model: p_s ∝ √count_s, kept_s = min(n, rate·n)
    val n = Map("a" -> 4000.0, "b" -> 1000.0, "c" -> 250.0)
    val z = n.values.map(math.sqrt).sum
    val total = n.values.sum
    val exp = n.map { case (s, c) =>
      s -> math.min(c, BigDecimal(math.min(1.0, math.sqrt(c) / z * total * 0.5 / c))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * c)
    }
    exp.foreach { case (s, e) =>
      val sd = 4 * math.sqrt(e) + 8 // generous hash-uniformity band
      assert(math.abs(counts(s) - e) < sd, s"stratum $s: ${counts(s)} vs $e")
    }
    // τ=0.5 flattens: the rare stratum keeps a LARGER fraction than the big
    assert(counts("c").toDouble / 250 > counts("a").toDouble / 4000)
    // τ=1 is proportional sampling: every stratum keeps ≈ targetFraction
    val nat = Packing.temperatureSample(df, "id", "src", tau = 1.0,
      targetFraction = 0.5).groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    n.foreach { case (s, c) =>
      assert(math.abs(nat(s) - 0.5 * c) < 4 * math.sqrt(0.5 * c) + 8,
        s"tau=1 stratum $s: ${nat(s)}")
    }
    // deterministic: a second run keeps the identical rows
    val again = Packing.temperatureSample(df, "id", "src", 0.5, 0.5)
    assert(kept.exceptAll(again).isEmpty && again.exceptAll(kept).isEmpty)
    intercept[IllegalArgumentException](
      Packing.temperatureSample(df, "id", "src", 0.0, 0.5))
    intercept[IllegalArgumentException](
      Packing.temperatureSample(df, "id", "src", 0.5, 0.0))
    kept.unpersist()
  }
}
