package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Per-column statistics for Catalyst's cost-based optimizer: distinct
  * counts from the footers' HLL sketches, null counts and min/max from the
  * page metas — all metadata-only, reported through DSv2 `columnStats()`.
  * Proven end-to-end: attribute statistics reach the logical plan, filter
  * cardinality estimates use min/max, and a 3-table join REORDERS under
  * the stats (the selective dimension joins first). */
class CboStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("straw-cbo-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("strawcbo").toString
    spark.range(200000).select(col("id").as("fk_big"),
      (col("id") % 100).as("fk_tiny"),
      (col("id").cast("double") / 3).as("score"),
      when(col("id") % 10 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("u"), col("id") % 1000)).as("tag"))
      .write.format("strawboat").mode("overwrite").save(s"$dir/fact")
    spark.range(200000).select(col("id").as("big_id"),
      concat(lit("big"), col("id")).as("big_name"))
      .write.format("strawboat").mode("overwrite").save(s"$dir/dimbig")
    spark.range(100).select(col("id").as("tiny_id"),
      concat(lit("t"), col("id")).as("tiny_name"))
      .write.format("strawboat").mode("overwrite").save(s"$dir/dimtiny")
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  private def fact = spark.read.format("strawboat").load(s"$dir/fact")

  test("attribute statistics reach the optimized plan") {
    val stats = fact.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(200000)))
    val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
    // HLL ndv within 10% of truth (m=512 gives ~4.6% standard error)
    val ndvTiny = byName("fk_tiny").distinctCount.get.toLong
    assert(ndvTiny >= 90 && ndvTiny <= 110, s"fk_tiny ndv=$ndvTiny")
    val ndvBig = byName("fk_big").distinctCount.get.toLong
    assert(ndvBig >= 180000 && ndvBig <= 200000, s"fk_big ndv=$ndvBig")
    // min/max exact from the zone-map planes (long + double domains)
    assert(byName("fk_big").min.contains(0L) && byName("fk_big").max.contains(199999L))
    assert(byName("score").min.contains(0.0))
    // null count exact from the page metas (every 10th tag is null)
    assert(byName("tag").nullCount.contains(BigInt(20000)))
    // strings report ndv (no usable min/max from prefix stats); true
    // distinct = 900 (residues ≡0 mod 10 only ever appear under the null)
    val ndvTag = byName("tag").distinctCount.get.toLong
    assert(ndvTag >= 810 && ndvTag <= 990, s"tag ndv=$ndvTag")
    // exact value-length stats (footer ExtLen): tags are "u"+(id%1000) with
    // non-multiples-of-10 residues → lengths 2..4, so avgLen lands in
    // [2,4] and maxLen is exactly 4. These feed CBO's row-width estimates
    // (string min/max stays withheld — Spark's filter estimation only
    // builds value intervals for numeric/date types).
    val avgLen = byName("tag").avgLen.get.toLong
    val maxLen = byName("tag").maxLen.get.toLong
    assert(avgLen >= 2 && avgLen <= 4, s"tag avgLen=$avgLen")
    assert(maxLen == 4, s"tag maxLen=$maxLen")
    assert(byName("tag").min.isEmpty && byName("tag").max.isEmpty)
  }

  test("filter cardinality estimates use min/max") {
    val est = fact.filter(col("fk_tiny") < 10)
      .queryExecution.optimizedPlan.stats.rowCount.get.toLong
    // true 20000; range estimation from (min=0, max=99) should be close
    assert(est > 10000 && est < 40000, s"estimated $est rows for 10% range filter")
  }

  test("3-table join reorders: selective dimension joins first") {
    val dimBig = spark.read.format("strawboat").load(s"$dir/dimbig")
    val dimTiny = spark.read.format("strawboat").load(s"$dir/dimtiny")
    // declared order does the expensive fact-vs-dimBig join FIRST; the
    // 5%-filtered tiny dim shrinks the fact 20x, so cost-based reorder
    // must move it innermost
    val j = fact.join(dimBig, col("fk_big") === col("big_id"))
      .join(dimTiny.filter(col("tiny_id") < 5), col("fk_tiny") === col("tiny_id"))
      .select(sum(length(concat(col("big_name"), col("tiny_name")))).as("s"))
    val joins = j.queryExecution.optimizedPlan.collect {
      case jn: org.apache.spark.sql.catalyst.plans.logical.Join => jn
    }
    assert(joins.size == 2)
    val innermost = joins.last.collectLeaves().map(_.toString).mkString(" ")
    assert(innermost.contains("dimtiny") && !innermost.contains("dimbig"),
      s"innermost join should pair fact with dimtiny, got: ${innermost.take(200)}")
    // and the result matches the un-reordered plan's
    val reordered = j.collect()(0).getLong(0)
    spark.conf.set("spark.sql.cbo.enabled", "false")
    try {
      val plain = fact.join(dimBig, col("fk_big") === col("big_id"))
        .join(dimTiny.filter(col("tiny_id") < 5), col("fk_tiny") === col("tiny_id"))
        .select(sum(length(concat(col("big_name"), col("tiny_name")))).as("s"))
        .collect()(0).getLong(0)
      assert(reordered == plain)
    } finally spark.conf.set("spark.sql.cbo.enabled", "true")
  }

  test("old files without sketches withhold ndv but keep null/min/max") {
    // simulate a pre-extension file: strip the ndv from a footer round-trip
    val f = graft.spark.StrawIO.listFiles(s"$dir/dimtiny").head
    val in = graft.spark.StrawIO.open(f)
    try {
      val footer = FooterCache.get(f, in)
      assert(footer.ndv != null && footer.ndv.exists(_ != null))
      val stripped = footer.copy(ndv = null)
      val cs = StrawScan.columnStatistics(stripped.schema,
        Seq((f, stripped, 0L, null)), stripped.numRows)
      val tiny = cs.get(
        org.apache.spark.sql.connector.expressions.Expressions.column("tiny_id"))
      assert(tiny != null)
      assert(!tiny.distinctCount.isPresent) // partial ndv would mislead CBO
      assert(tiny.min.isPresent && tiny.max.isPresent)
    } finally in.close()
  }

  test("TPC-H Q5 shape reorders: region filter joins first, not last") {
    // q_tpch_q5 declares the classic naive order — customer ⋈ orders ⋈
    // lineitem ⋈ supplier ⋈ nation ⋈ region, the selective region filter
    // LAST and no hints. NDV-steered reorder must surface the filtered
    // region ⋈ nation pair as the deepest join instead of appending
    // region to the whole 5-table chain.
    val df = graft.SparkEntry.queries("q_tpch_q5")(spark, "/root/testdata/sf0.001")
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size == 5, s"expected 5 joins, got ${joins.size}")
    // collect is pre-order, so the LAST join whose leaves include region is
    // the smallest subtree containing it — the pair region actually joins
    val regionJoin = joins.filter(
      _.collectLeaves().exists(_.toString.contains("/region"))).last
    val leaves = regionJoin.collectLeaves().map(_.toString).mkString(" ")
    assert(leaves.contains("/nation") && !leaves.contains("/lineitem") &&
      !leaves.contains("/orders") && !leaves.contains("/customer"),
      s"region should join the nation dimension directly, got: ${leaves.take(300)}")
    // and the reordered plan still executes (group count varies by sf;
    // exact values are the driver oracle's job)
    assert(df.collect().nonEmpty)
  }

  test("column-stats cache: repeat CBO planning over a footer-evicted " +
      "table reads zero footers") {
    // the 100 TB planning shape: a table with more files than the
    // FooterCache capacity evicts itself, and before the snapshot-keyed
    // ColStatsCache every CBO-enabled query re-read the whole footer set
    // for the stats sweep. Shrink the footer cache below the file count
    // instead of writing 17k files.
    val d = s"$dir/manyfiles"
    spark.range(40000).repartition(40)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
      .write.format("strawboat").mode("overwrite").save(d)
    val nFiles = graft.spark.StrawIO.listFiles(d).size
    assert(nFiles >= 40, s"expected >= 40 data files, got $nFiles")
    val savedMax = FooterCache.maxEntries
    try {
      FooterCache.maxEntries = 8 // << nFiles: the cache can never hold them
      FooterCache.clear()
      ColStatsCache.clear()
      def planStats(): java.util.OptionalLong = {
        val plan = spark.read.format("strawboat").load(d)
          .filter(col("v") < 50).groupBy(col("v")).count()
          .queryExecution.optimizedPlan
        var ndv = java.util.OptionalLong.empty()
        plan.foreach {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            plan.stats // force the whole-tree computation
            val cs = r.stats.attributeStats.find(_._1.name == "v").map(_._2)
            ndv = cs.flatMap(_.distinctCount)
              .map(d => java.util.OptionalLong.of(d.toLong))
              .getOrElse(java.util.OptionalLong.empty())
          case _ =>
        }
        ndv
      }
      val ndv1 = planStats()
      assert(ndv1.isPresent && ndv1.getAsLong >= 90 && ndv1.getAsLong <= 105,
        s"ndv(v) should estimate ~97, got $ndv1")
      val loadsAfterFirst = FooterCache.loads.get()
      val mergesAfterFirst = ColStatsCache.merges.get()
      assert(mergesAfterFirst >= 2) // k and v both merged
      // second, independent query over the same snapshot: the merged
      // column stats are served from the snapshot-keyed cache — ZERO
      // footer loads even though every footer has been evicted
      val ndv2 = planStats()
      assert(ndv2 == ndv1, s"cached stats drifted: $ndv2 vs $ndv1")
      assert(ColStatsCache.merges.get() == mergesAfterFirst,
        "second query must not re-merge")
      assert(FooterCache.loads.get() == loadsAfterFirst,
        s"second query must read zero footers, read " +
          s"${FooterCache.loads.get() - loadsAfterFirst}")
      // a new snapshot (append) mints a new key and re-merges
      spark.range(5).select(col("id").as("k"), (col("id") % 97).as("v"))
        .write.format("strawboat").mode("append").save(d)
      planStats()
      assert(ColStatsCache.merges.get() > mergesAfterFirst,
        "a new snapshot must re-merge")
      // mapping state participates in the key: a drop/re-add must not
      // serve the dropped column's numbers
      val files = Seq(("/t/a", 1L, 2L), ("/t/b", 3L, 4L))
      assert(ColStatsCache.tableKey(files, 1) != ColStatsCache.tableKey(files, 2))
      // and the key is listing-order independent
      assert(ColStatsCache.tableKey(files, 1) ==
        ColStatsCache.tableKey(files.reverse, 1))
    } finally {
      FooterCache.maxEntries = savedMax
      FooterCache.clear()
      ColStatsCache.clear()
    }
  }
}
