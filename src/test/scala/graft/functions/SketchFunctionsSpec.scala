package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Misra–Gries heavy-hitters aggregate: the membership/lower-bound
  * guarantees on skewed data, the distributed merge path, and the
  * sketch→verify exact-top-k composition. */
class SketchFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SketchFunctions.register(spark)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  // zipf-ish: item i appears ~4000/i times; interleaved deterministically
  // (sorted by a hash) so heavy items spread across all partitions
  private val items: Seq[String] =
    (1 to 200).flatMap(i => Seq.fill(4000 / i)(s"w$i"))
      .sortBy(s => (s.hashCode * 2654435761L) ^ s.length)
  private val exact: Map[String, Long] =
    items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  private val n = items.size.toLong

  private def itemsDf(parts: Int): DataFrame = {
    val sp = spark; import sp.implicits._
    items.toDF("w").repartition(parts)
  }

  private def sketch(df: DataFrame, capacity: Int): Seq[(String, Long, Long)] =
    df.agg(SketchFunctions.mgTopK(col("w"), capacity).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select("e.item", "e.count_lo", "e.processed").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("membership + lower-bound guarantees hold across distributed merges") {
    for (parts <- Seq(1, 8)) {
      val got = sketch(itemsDf(parts), capacity = 64)
      assert(got.size <= 64)
      assert(got.forall(_._3 == n), s"processed must be the total input size")
      val bound = n / 65 // error ≤ n/(capacity+1)
      val gotMap = got.map(e => e._1 -> e._2).toMap
      // every item with true count above the bound is present
      exact.filter(_._2 > bound).keys.foreach { k =>
        assert(gotMap.contains(k), s"heavy item $k missing (parts=$parts)")
      }
      // every reported count is a lower bound within the error budget
      got.foreach { case (k, lo, _) =>
        assert(lo <= exact(k), s"$k overcounted: $lo > ${exact(k)}")
        assert(exact(k) - lo <= bound, s"$k undercounted past the bound")
      }
    }
  }

  test("sketch->verify recovers the exact top-k; capacity forces evictions") {
    val toks = itemsDf(8)
    // 200 distinct >> capacity 64: the update path must evict constantly
    val cands = toks.agg(SketchFunctions.mgTopK(col("w"), 64).as("sk"))
      .select(explode(col("sk")).as("e")).select(col("e.item").as("w"))
    val topk = toks.join(broadcast(cands), "w")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = exact.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
    assert(topk == expected)
  }

  test("SQL route and null handling") {
    val sp = spark; import sp.implicits._
    (items.map(Option(_)) ++ Seq(None, None)).toDF("w")
      .createOrReplaceTempView("mg_in")
    val viaSql = spark.sql(
      "SELECT mg_topk(w, 64) AS sk FROM mg_in")
      .select(explode(col("sk")).as("e")).select("e.item", "e.processed")
      .collect()
    assert(viaSql.forall(_.getLong(1) == n), "nulls must not count as input")
    assert(viaSql.map(_.getString(0)).contains("w1"))
  }

  test("mg_topk runs in streaming aggregation: state carries across micro-batches") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mg_stream").toString
    (1 to 300).map(i => s"h${i % 3}").toDF("w")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val q = spark.readStream.schema("w string").parquet(dir)
      .agg(SketchFunctions.mgTopK(col("w"), 8).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.count_lo"), col("e.processed"))
      .writeStream.format("memory").queryName("mg_mem")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val r1 = spark.sql("SELECT * FROM mg_mem").collect()
      assert(r1.length == 3 && r1.forall(_.getLong(2) == 300L))
      // a late file: the sketch state must accumulate, not reset
      (1 to 150).map(_ => "hot").toDF("w")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val r2 = spark.sql("SELECT * FROM mg_mem").collect()
      assert(r2.forall(_.getLong(2) == 450L),
        s"processed must accumulate: ${r2.mkString(",")}")
      assert(r2.find(_.getString(0) == "hot").exists(_.getLong(1) == 150L))
    } finally q.stop()
  }

  test("capacity is validated") {
    val sp = spark; import sp.implicits._
    val df = Seq("a").toDF("w")
    intercept[Exception] {
      df.agg(SketchFunctions.mgTopK(col("w"), 0)).collect()
    }
  }

  test("bottomk_sample: deterministic across partitionings, equals the sort formulation") {
    val sp = spark; import sp.implicits._
    val ids = (0 until 5000).map(i => s"id$i")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = ids.sortBy(md5hex).take(25)
    for (parts <- Seq(1, 8)) {
      val got = ids.toDF("w").repartition(parts)
        .agg(SketchFunctions.bottomKSample(col("w"), 25).as("s"))
        .select(explode(col("s"))).collect().map(_.getString(0)).toSeq
      assert(got == expected, s"parts=$parts")
    }
    // stability under appends (KMV): the grown corpus's sample agrees with
    // the old one wherever the old digests still win
    val grown = (ids ++ (5000 until 6000).map(i => s"id$i")).sortBy(md5hex).take(25)
    val stillIn = expected.toSet.intersect(grown.toSet)
    assert(grown.filter(stillIn).toSeq == expected.filter(stillIn).toSeq)
  }

  test("bottomk_sample: duplicates collapse; nulls skipped; per-group via groupBy") {
    val sp = spark; import sp.implicits._
    val df = Seq(("a", Some("x")), ("a", Some("x")), ("a", Some("y")),
      ("a", None), ("b", Some("z"))).toDF("g", "w")
    val got = df.groupBy("g")
      .agg(SketchFunctions.bottomKSample(col("w"), 10).as("s"))
      .select(col("g"), size(col("s")).as("n")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 2, "b" -> 1))
  }

  test("weighted_bottomk: A-ES priorities, partitioning-independent, weight skew") {
    val sp = spark; import sp.implicits._
    val rows = (0 until 3000).map(i => (s"id$i", 1.0 + (i % 10)))
    def md5u(s: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val v = d.take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      (v + 0.5) / 4294967296.0
    }
    val expected = rows
      .map { case (id, w) => (-math.log(md5u(id)) / w, id) }
      .sorted.take(50).map(_._2)
    for (parts <- Seq(1, 8)) {
      val got = rows.toDF("id", "w").repartition(parts)
        .agg(SketchFunctions.weightedBottomK(col("id"), col("w"), 50).as("s"))
        .select(explode(col("s"))).collect().map(_.getString(0)).toSeq
      assert(got == expected, s"parts=$parts")
    }
    // weight skew: items weighted 10 should dominate items weighted 1
    val winners = expected.map(id => rows.find(_._1 == id).get._2)
    assert(winners.count(_ >= 9.0) > winners.count(_ <= 2.0),
      s"heavy weights should win more slots: ${winners.mkString(",")}")
    // null / non-positive weights are skipped, not sampled
    val mixed = Seq(("a", Some(5.0)), ("b", None), ("c", Some(0.0)),
      ("d", Some(-1.0)), ("e", Some(2.0))).toDF("id", "w")
    val kept = mixed.agg(SketchFunctions.weightedBottomK(col("id"), col("w"), 10).as("s"))
      .select(explode(col("s"))).collect().map(_.getString(0)).toSet
    assert(kept == Set("a", "e"))
  }

  test("uniform narrow vocabulary (the driver-table regime) is exact") {
    val sp = spark; import sp.implicits._
    // 30 items, capacity 256: no evictions can fire, counts are exact
    val uni = (0 until 3000).map(i => s"u${i % 30}").toDF("w").repartition(8)
    val got = sketch(uni, capacity = 256)
    assert(got.size == 30 && got.forall(_._2 == 100L))
  }

  test("topk_by equals the window row_number formulation exactly, both " +
      "directions, ties included, across partitionings") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.expressions.Window
    // deterministic scores with PLANTED TIES (score quantized to 20
    // levels) across 5 groups; ids interleaved so groups span partitions
    val rows = (0L until 2000L).map { id =>
      (id % 5, id, ((id * 2654435761L) % 20L).toDouble / 10.0)
    }
    for (parts <- Seq(1, 4, 13); asc <- Seq(false, true); k <- Seq(1, 7, 50)) {
      val df = rows.toDF("query_id", "neighbor_id", "score").repartition(parts)
      val ord = if (asc) col("score").asc else col("score").desc
      val w = Window.partitionBy(col("query_id"))
        .orderBy(ord, col("neighbor_id").asc)
      val want = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      val got = df.groupBy(col("query_id"))
        .agg(SketchFunctions.topKBy(col("score"), col("neighbor_id"), k,
          ascending = asc).as("_top"))
        .select(col("query_id"), posexplode(col("_top")).as(Seq("_r", "_e")))
        .select(col("query_id"), col("_e.id"), col("_e.score"),
          (col("_r") + 1).cast("int"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      assert(got == want, s"parts=$parts asc=$asc k=$k")
    }
    // null scores and ids skip (never-match convention)
    val withNulls = Seq((1L, Some(10L), Some(1.0)), (1L, None, Some(9.0)),
      (1L, Some(11L), None), (1L, Some(12L), Some(0.5)))
      .toDF("query_id", "neighbor_id", "score")
    val kept = withNulls.groupBy(col("query_id"))
      .agg(SketchFunctions.topKBy(col("score"), col("neighbor_id"), 10).as("t"))
      .select(explode(col("t")).as("e")).select(col("e.id"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 12L))
    // k validates
    intercept[Exception] {
      withNulls.groupBy(col("query_id"))
        .agg(SketchFunctions.topKBy(col("score"), col("neighbor_id"), 0).as("t"))
        .collect()
    }
  }

  test("topk_by runs in streaming aggregation: state carries across micro-batches") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("topk_stream").toString
    (0L until 100L).map(id => (id % 2, id, (id % 10).toDouble))
      .toDF("g", "id", "s").coalesce(1).write.mode("overwrite").parquet(dir)
    val q = spark.readStream.schema("g long, id long, s double").parquet(dir)
      .groupBy(col("g"))
      .agg(SketchFunctions.topKBy(col("s"), col("id"), 2).as("t"))
      .select(col("g"), explode(col("t")).as("e"))
      .select(col("g"), col("e.score"), col("e.id"))
      .writeStream.format("memory").queryName("topk_mem")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // per group: best scores are 9.0; smallest ids with s=9 are 9,29 (g=1)
      // and 19,39... wait g = id%2: s=9 when id%10==9 -> ids 9,19,29,...
      // g=1 ids 9,19(g=1? 19%2=1),29(1),39(1)... all odd -> g=1 gets 9,19;
      // g=0 best s=8 at ids 8,18,28 -> top2 = 8,18
      val r1 = spark.sql("SELECT * FROM topk_mem ORDER BY g, id").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(r1 == Seq((0L, 8.0, 8L), (0L, 8.0, 18L),
        (1L, 9.0, 9L), (1L, 9.0, 19L)), r1.mkString(","))
      // a late file with a new global best: state accumulates, not resets
      Seq((0L, 1000L, 99.0)).toDF("g", "id", "s")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val r2 = spark.sql("SELECT * FROM topk_mem ORDER BY g, id").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(r2 == Seq((0L, 8.0, 8L), (0L, 99.0, 1000L),
        (1L, 9.0, 9L), (1L, 9.0, 19L)), r2.mkString(","))
    } finally q.stop()
  }

  test("topk_by partial-merges under the Exchange: map tasks ship k entries") {
    val sp = spark; import sp.implicits._
    val df = (0L until 1000L).map(id => (id % 3, id, id.toDouble))
      .toDF("query_id", "neighbor_id", "score").repartition(4)
    val agg = df.groupBy(col("query_id"))
      .agg(SketchFunctions.topKBy(col("score"), col("neighbor_id"), 5).as("t"))
    val plan = agg.queryExecution.executedPlan.toString
    // a partial topk_by below the shuffle proves map-side combining —
    // the scored rows themselves never cross the Exchange
    assert(plan.contains("partial_topk_by"),
      s"expected a map-side partial aggregate:\n$plan")
  }
}
