package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Hash-bucketed layout: tagged single-bucket files on write, bucket
  * pruning on equality filters, storage-partitioned (shuffle-free) joins
  * between co-bucketed catalog tables, DV survival, and the append
  * consistency gate. */
class StrawBucketSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    dir = Files.createTempDirectory("strawbucket").toString
    warehouse = Files.createTempDirectory("strawbucketcat").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("straw-bucket-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.catalog.straw", classOf[StrawCatalog].getName)
      .config("spark.sql.catalog.straw.warehouse", warehouse)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
  }

  private def orders: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
  private def customer: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")

  private def dataFiles(out: String): Seq[java.io.File] =
    new java.io.File(out).listFiles.toSeq
      .filter(f => f.getName.endsWith(".strb") && !f.getName.startsWith("part-empty-"))

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("bucketed write tags every file and preserves content") {
    val out = s"$dir/o_bucketed"
    orders.write.format("strawboat")
      .option("bucketBy", "o_custkey").option("buckets", "8")
      .mode("overwrite").save(out)
    val files = dataFiles(out)
    assert(files.nonEmpty)
    val tags = files.map(f => StrawBucket.parseTag(f.getName))
    assert(tags.forall(_.exists(t => t.n == 8 &&
      t.colHash.contains(StrawBucket.colHash("o_custkey")))),
      s"untagged files among $files")
    // every file holds exactly its tag's bucket
    for (f <- files; t <- StrawBucket.parseTag(f.getName); (b, n) = (t.bucket, t.n)) {
      val keys = spark.read.format("strawboat").load(f.getPath)
        .select("o_custkey").collect().map(_.getLong(0))
      assert(keys.forall(k => StrawBucket.bucketOf(k,
        org.apache.spark.sql.types.LongType, n) == b),
        s"file $f holds rows outside bucket $b")
    }
    assert(sameRows(spark.read.format("strawboat").load(out), orders))
  }

  test("equality filter on the bucket column prunes to one bucket's files") {
    val out = s"$dir/o_prune"
    orders.write.format("strawboat")
      .option("bucketBy", "o_custkey").option("buckets", "8")
      .option("maxPageSize", "512")
      .mode("overwrite").save(out)
    val key = orders.select("o_custkey").head.getLong(0)
    // NO read options: the bucketed write recorded its spec in the sidecar
    // at commit, so a plain path read self-discovers the layout
    val df = spark.read.format("strawboat").load(out)
      .filter(col("o_custkey") === key)
    val expect = orders.filter(col("o_custkey") === key)
    assert(sameRows(df, expect))
    // planned partitions touch only the matching bucket's files
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.get
    val planned = scan.toBatch.planInputPartitions().collect {
      case p: StrawInputPartition => p.path
    }.distinct
    val wantBucket = StrawBucket.bucketOf(key,
      org.apache.spark.sql.types.LongType, 8)
    assert(planned.nonEmpty)
    assert(planned.forall(p =>
      StrawBucket.parseTag(p).exists(t => t.n == 8 && t.bucket == wantBucket)),
      s"planned files outside bucket $wantBucket: $planned")
  }

  test("co-bucketed catalog tables join with no shuffle (SPJ) and aggregate per key") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS straw.spj")
    spark.sql("DROP TABLE IF EXISTS straw.spj.ord")
    spark.sql("DROP TABLE IF EXISTS straw.spj.cust")
    orders.createOrReplaceTempView("src_orders")
    customer.createOrReplaceTempView("src_customer")
    spark.sql(
      """CREATE TABLE straw.spj.ord PARTITIONED BY (bucket(8, o_custkey))
        |AS SELECT o_orderkey, o_custkey, o_totalprice FROM src_orders""".stripMargin)
    spark.sql(
      """CREATE TABLE straw.spj.cust PARTITIONED BY (bucket(8, c_custkey))
        |AS SELECT c_custkey, c_name, c_acctbal FROM src_customer""".stripMargin)
    // both tables' data files are tagged
    for (t <- Seq("ord", "cust")) {
      val files = dataFiles(s"$warehouse/spj/$t")
      assert(files.nonEmpty && files.forall(f =>
        StrawBucket.parseTag(f.getName).exists(_.n == 8)), s"untagged files in $t")
    }
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        """SELECT c.c_custkey, count(*) AS orders, sum(o.o_totalprice) AS total
          |FROM straw.spj.ord o JOIN straw.spj.cust c ON o.o_custkey = c.c_custkey
          |GROUP BY c.c_custkey""".stripMargin)
      val expect = spark.sql(
        """SELECT c.c_custkey, count(*) AS orders, sum(o.o_totalprice) AS total
          |FROM src_orders o JOIN src_customer c ON o.o_custkey = c.c_custkey
          |GROUP BY c.c_custkey""".stripMargin)
      assert(sameRows(joined, expect))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join should be shuffle-free:\n$plan")
      // and the bucket-grouped scans stay VECTORIZED (chained per-file
      // columnar readers) — the layout must not forfeit batch speed
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scans = finalPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.nonEmpty && scans.forall(_.supportsColumnar),
        s"bucket-grouped scans should read columnar:\n$finalPlan")
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("straw_rebucket evolves the bucket count; SPJ still no-Exchange after") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS straw.rb")
    spark.sql("DROP TABLE IF EXISTS straw.rb.ord")
    spark.sql("DROP TABLE IF EXISTS straw.rb.cust")
    orders.createOrReplaceTempView("src_orders_rb")
    customer.createOrReplaceTempView("src_customer_rb")
    spark.sql(
      """CREATE TABLE straw.rb.ord PARTITIONED BY (bucket(4, o_custkey))
        |AS SELECT o_orderkey, o_custkey, o_totalprice FROM src_orders_rb""".stripMargin)
    spark.sql(
      """CREATE TABLE straw.rb.cust PARTITIONED BY (bucket(8, c_custkey))
        |AS SELECT c_custkey, c_name, c_acctbal FROM src_customer_rb""".stripMargin)
    // a merge-on-read delete before the rebucket: the rewrite must
    // materialize the DV away, not resurrect the rows
    spark.sql("DELETE FROM straw.rb.ord WHERE o_orderkey % 10 = 3")
    val expectCnt = spark.sql(
      "SELECT count(*) FROM src_orders_rb WHERE o_orderkey % 10 != 3")
      .collect()(0).getLong(0)

    // 4-bucket ord cannot storage-partition-join 8-bucket cust — evolve it
    val res = spark.sql(s"SELECT * FROM straw_rebucket('straw.rb.ord', 8)").collect()(0)
    assert(res.getInt(0) > 0, "rebucket should rewrite the data files")
    assert(StrawBucket.specOf(s"$warehouse/rb/ord").contains(("o_custkey", 8)))
    val files = dataFiles(s"$warehouse/rb/ord")
    assert(files.nonEmpty && files.forall(f =>
      StrawBucket.parseTag(f.getName).exists(_.n == 8)),
      s"post-rebucket files must carry 8-bucket tags: ${files.map(_.getName)}")
    // DVs materialized: no sidecar remains referenced, count is post-delete
    assert(spark.sql("SELECT count(*) FROM straw.rb.ord").collect()(0).getLong(0)
      == expectCnt)

    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        """SELECT c.c_custkey, count(*) AS orders
          |FROM straw.rb.ord o JOIN straw.rb.cust c ON o.o_custkey = c.c_custkey
          |GROUP BY c.c_custkey""".stripMargin)
      val expect = spark.sql(
        """SELECT c.c_custkey, count(*) AS orders
          |FROM src_orders_rb o JOIN src_customer_rb c
          |ON o.o_custkey = c.c_custkey WHERE o.o_orderkey % 10 != 3
          |GROUP BY c.c_custkey""".stripMargin)
      assert(sameRows(joined, expect))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"rebucketed tables should storage-partition-join:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }

    // refusals stay loud: no spec and no column named
    val out = s"$dir/rb_nospec"
    orders.limit(10).select(col("o_orderkey"))
      .write.format("strawboat").mode("overwrite").save(out)
    val e = intercept[Exception](
      StrawCompaction.rebucket(spark, out, 4))
    assert(e.getMessage.contains("no bucket spec"), e.getMessage)
    // and an un-routable generation (column missing) is refused
    val e2 = intercept[Exception](
      StrawCompaction.rebucket(spark, out, 4, Some("nope")))
    assert(e2.getMessage != null)
  }

  test("append with the same count but a different bucket column is refused") {
    val out = s"$dir/o_colgate"
    orders.limit(50).write.format("strawboat")
      .option("bucketBy", "o_custkey").option("buckets", "4")
      .mode("overwrite").save(out)
    val e = intercept[Exception] {
      orders.limit(50).write.format("strawboat")
        .option("bucketBy", "o_orderkey").option("buckets", "4")
        .mode("append").save(out)
    }
    assert(e.getMessage.contains("mix layouts"), e.getMessage)
    // and the sidecar spec survived untouched
    assert(StrawBucket.specOf(out).contains(("o_custkey", 4)))
  }

  test("bucketed append onto a spec-less sidecar records the spec") {
    // a catalog CREATE leaves a sidecar with NO bucket properties; the
    // first bucketed append must still record its spec there (it is a
    // first claim, not a divergence) so later reads/INSERTs inherit it
    spark.sql("CREATE NAMESPACE IF NOT EXISTS straw.sl0")
    spark.sql("DROP TABLE IF EXISTS straw.sl0.t")
    spark.sql("CREATE TABLE straw.sl0.t (k BIGINT, v BIGINT)")
    orders.limit(20).selectExpr("o_orderkey AS k", "o_custkey AS v")
      .write.format("strawboat").option("bucketBy", "k").option("buckets", "4")
      .mode("append").save(s"$warehouse/sl0/t")
    assert(StrawBucket.specOf(s"$warehouse/sl0/t").contains(("k", 4)))
    // a plain catalog INSERT now inherits the recorded spec
    spark.sql("INSERT INTO straw.sl0.t VALUES (100, 1)")
    val files = dataFiles(s"$warehouse/sl0/t")
    assert(files.nonEmpty && files.forall(f =>
      StrawBucket.parseTag(f.getName).exists(_.n == 4)), files.mkString(","))
  }

  test("a stale sidecar spec (crashed rebucket) cannot cause wrong pruning") {
    // files hashed on o_custkey; the sidecar then (wrongly) claims the
    // spec is (o_orderkey, 8) — the crash window between a rebucketing
    // truncate's log commit and its sidecar update. The tags' column
    // hashes disagree with the claimed spec, so equality filters on
    // o_orderkey must NOT bucket-prune (and results stay exact).
    val out = s"$dir/o_stale"
    orders.write.format("strawboat")
      .option("bucketBy", "o_custkey").option("buckets", "8")
      .mode("overwrite").save(out)
    val side = StrawTableSidecar.read(out).get
    StrawTableSidecar.write(out, side.copy(properties =
      side.properties + (StrawBucket.PropBucketBy -> "o_orderkey")))
    // a MID-RANGE key: every bucket file's o_orderkey [min,max] straddles
    // it, so file-level range stats cannot prune — only (wrong) bucket
    // pruning could, which is exactly what must not happen
    val keys = orders.select("o_orderkey").orderBy(col("o_orderkey"))
      .collect().map(_.getLong(0))
    val key = keys(keys.length / 2)
    val df = spark.read.format("strawboat").load(out)
      .filter(col("o_orderkey") === key)
    assert(sameRows(df, orders.filter(col("o_orderkey") === key)))
    // planning kept files of EVERY bucket (no tag certifies the claim)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.get
    val plannedBuckets = scan.toBatch.planInputPartitions().flatMap {
      case p: StrawInputPartition => Seq(p)
      case p: StrawPackedPartition => p.slices // small files bin-pack
      case _ => Seq.empty
    }.flatMap(p => StrawBucket.parseTag(p.path).map(_.bucket)).distinct
    assert(plannedBuckets.size > 1,
      s"divergent spec must not prune to one bucket, planned: $plannedBuckets")
  }

  test("the SQL bucket function rejects a non-positive count") {
    val e = intercept[Exception] {
      spark.sql("SELECT straw.bucket(0, CAST(1 AS BIGINT))").collect()
    }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: chain(t.getCause)
    assert(chain(e).exists(_.contains("must be positive")), chain(e).mkString(" | "))
  }

  test("bucket layout survives merge-on-read deletes (DVs threaded per file)") {
    // SPJ needs the bucket transform resolved against a FunctionCatalog, so
    // the co-location proof runs over CATALOG tables; the DV delete mutates
    // the same directories in place
    spark.sql("CREATE NAMESPACE IF NOT EXISTS straw.dv")
    spark.sql("DROP TABLE IF EXISTS straw.dv.ord")
    spark.sql("DROP TABLE IF EXISTS straw.dv.cust")
    orders.createOrReplaceTempView("src_orders")
    customer.createOrReplaceTempView("src_customer")
    spark.sql(
      """CREATE TABLE straw.dv.ord PARTITIONED BY (bucket(4, o_custkey))
        |AS SELECT o_orderkey, o_custkey, o_totalprice FROM src_orders""".stripMargin)
    spark.sql(
      """CREATE TABLE straw.dv.cust PARTITIONED BY (bucket(4, c_custkey))
        |AS SELECT c_custkey, c_acctbal FROM src_customer""".stripMargin)
    // delete via deletion vectors (merge-on-read: files stay, DVs appear)
    val res = StrawDelete.delete(spark, s"$warehouse/dv/ord", Seq(
      org.apache.spark.sql.sources.LessThan("o_totalprice", 50000.0)))
    assert(res.dvFiles > 0, s"expected a merge-on-read delete, got $res")
    val expectedA = orders.select("o_orderkey", "o_custkey", "o_totalprice")
      .filter(col("o_totalprice") >= 50000.0)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        """SELECT o.o_orderkey, o.o_custkey, c.c_acctbal
          |FROM straw.dv.ord o JOIN straw.dv.cust c
          |ON o.o_custkey = c.c_custkey""".stripMargin)
      val expect = expectedA.join(customer.select("c_custkey", "c_acctbal"),
        expectedA("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_custkey", "c_acctbal")
      assert(sameRows(joined, expect))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"DV'd co-bucketed join should stay shuffle-free:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("append consistency: layout mismatches are refused, matching appends compose") {
    val out = s"$dir/o_gate"
    val half = orders.limit(100).cache()
    half.write.format("strawboat")
      .option("bucketBy", "o_custkey").option("buckets", "4")
      .mode("overwrite").save(out)
    // different n refused
    val e1 = intercept[Exception] {
      half.write.format("strawboat")
        .option("bucketBy", "o_custkey").option("buckets", "8")
        .mode("append").save(out)
    }
    assert(e1.getMessage.contains("mix layouts"), e1.getMessage)
    // unbucketed append refused
    val e2 = intercept[Exception] {
      half.write.format("strawboat").mode("append").save(out)
    }
    assert(e2.getMessage.contains("bucketed"), e2.getMessage)
    // matching append composes; grouping still engages
    half.write.format("strawboat")
      .option("bucketBy", "o_custkey").option("buckets", "4")
      .mode("append").save(out)
    assert(spark.read.format("strawboat").load(out).count() == 200)
    // bucketed append onto unbucketed data refused too
    val out2 = s"$dir/o_gate2"
    half.write.format("strawboat").mode("overwrite").save(out2)
    val e3 = intercept[Exception] {
      half.write.format("strawboat")
        .option("bucketBy", "o_custkey").option("buckets", "4")
        .mode("append").save(out2)
    }
    assert(e3.getMessage.contains("unbucketed"), e3.getMessage)
    half.unpersist()
  }

  test("catalog INSERT inherits the bucket spec; DESCRIBE shows the transform") {
    spark.sql("DROP TABLE IF EXISTS straw.spj.ins")
    spark.sql(
      """CREATE TABLE straw.spj.ins (k BIGINT, v STRING)
        |PARTITIONED BY (bucket(4, k))""".stripMargin)
    spark.sql("INSERT INTO straw.spj.ins VALUES (1, 'a'), (2, 'b'), (17, 'c')")
    val files = dataFiles(s"$warehouse/spj/ins")
    assert(files.nonEmpty && files.forall(f =>
      StrawBucket.parseTag(f.getName).exists(_.n == 4)),
      s"INSERT did not inherit the bucket layout: $files")
    assert(spark.sql("SELECT v FROM straw.spj.ins WHERE k = 17")
      .collect().map(_.getString(0)).toSeq == Seq("c"))
    // the transform round-trips through the table's reported partitioning
    val parts = spark.sessionState.catalogManager.catalog("straw")
      .asInstanceOf[StrawCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("spj"), "ins")).partitioning().map(_.toString)
    assert(parts.exists(_.contains("bucket(4, k)")), parts.mkString(","))
  }

  test("MERGE INTO keeps the layout; later INSERTs and SPJ still compose") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS straw.mrg")
    spark.sql("DROP TABLE IF EXISTS straw.mrg.t")
    spark.sql(
      """CREATE TABLE straw.mrg.t (k BIGINT, v STRING)
        |PARTITIONED BY (bucket(4, k))""".stripMargin)
    spark.sql("INSERT INTO straw.mrg.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql(
      """MERGE INTO straw.mrg.t AS t
        |USING (SELECT 2 AS k, 'B' AS v UNION ALL SELECT 9, 'i') AS s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // merge-inserted rows landed in tagged files; the append gate stays open
    val dir0 = s"$warehouse/mrg/t"
    assert(dataFiles(dir0).forall(f =>
      StrawBucket.parseTag(f.getName).exists(_.n == 4)),
      s"MERGE wrote untagged files: ${dataFiles(dir0)}")
    spark.sql("INSERT INTO straw.mrg.t VALUES (12, 'z')")
    assert(spark.sql("SELECT k, v FROM straw.mrg.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "i"), (12L, "z")))
  }

  test("compaction preserves the layout (bucket-pure bins, re-tagged outputs)") {
    val out = s"$dir/o_compact"
    // several write tasks, clustering off -> several small files per
    // bucket, all compaction candidates
    orders.select("o_orderkey", "o_custkey", "o_totalprice").repartition(3)
      .write.format("strawboat")
      .option("bucketBy", "o_custkey").option("buckets", "4")
      .option("distribute", "none")
      .mode("overwrite").save(out)
    val before = dataFiles(out).size
    assert(before > 4, s"fixture too small to compact: $before files")
    val res = StrawCompaction.compact(spark, out, targetFileBytes = 64L << 20)
    assert(res.outputFiles > 0)
    val after = dataFiles(out)
    assert(after.size < before)
    // every output file still carries a tag and holds only its bucket
    for (f <- after) {
      val tag = StrawBucket.parseTag(f.getName)
      assert(tag.exists(t => t.n == 4 &&
        t.colHash.contains(StrawBucket.colHash("o_custkey"))),
        s"compaction emitted untagged file $f")
      val keys = spark.read.format("strawboat").load(f.getPath)
        .select("o_custkey").collect().map(_.getLong(0))
      assert(keys.forall(k => StrawBucket.bucketOf(k,
        org.apache.spark.sql.types.LongType, 4) == tag.get.bucket))
    }
    assert(sameRows(spark.read.format("strawboat").load(out),
      orders.select("o_orderkey", "o_custkey", "o_totalprice")))
  }

  test("renaming or dropping the bucket column is refused") {
    spark.sql("DROP TABLE IF EXISTS straw.mrg.guard")
    spark.sql(
      """CREATE TABLE straw.mrg.guard (k BIGINT, v STRING)
        |PARTITIONED BY (bucket(4, k))""".stripMargin)
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE straw.mrg.guard RENAME COLUMN k TO kk")
    }
    assert(e1.getMessage.contains("bucket column"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE straw.mrg.guard DROP COLUMN k")
    }
    assert(e2.getMessage.contains("bucket column"), e2.getMessage)
    spark.sql("ALTER TABLE straw.mrg.guard RENAME COLUMN v TO w") // others fine
  }

  test("hive partitioning and bucketing compose in one layout") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS straw.hb")
    spark.sql("DROP TABLE IF EXISTS straw.hb.t")
    spark.sql(
      """CREATE TABLE straw.hb.t (id BIGINT, kind STRING, v BIGINT)
        |PARTITIONED BY (kind, bucket(4, id))""".stripMargin)
    spark.sql(
      """INSERT INTO straw.hb.t
        |SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END, id * 10
        |FROM range(200)""".stripMargin)
    // files live under kind=X/ AND carry bucket tags
    for (k <- Seq("a", "b")) {
      val files = new java.io.File(s"$warehouse/hb/t/kind=$k").listFiles
        .filter(_.getName.endsWith(".strb"))
      assert(files.nonEmpty && files.forall(f =>
        StrawBucket.parseTag(f.getName).exists(_.n == 4)),
        s"kind=$k: ${files.mkString(",")}")
    }
    // partition pruning and bucket-key equality compose
    assert(spark.sql("SELECT v FROM straw.hb.t WHERE kind = 'a' AND id = 42")
      .collect().map(_.getLong(0)).toSeq == Seq(420L))
    assert(spark.sql("SELECT count(*) FROM straw.hb.t").head.getLong(0) == 200)
    // SPJ on the bucket key still engages across hive partitions
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val self = spark.sql(
        """SELECT a.id FROM straw.hb.t a JOIN straw.hb.t b ON a.id = b.id
          |WHERE a.kind = 'a'""".stripMargin)
      assert(self.count() == 100)
      assert(!self.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucketed self-join across hive partitions should be shuffle-free")
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("streaming sink routes to tagged buckets and records the spec") {
    val src = s"$dir/stream_src"
    val out = s"$dir/stream_out"
    val ckpt = s"$dir/stream_ckpt"
    orders.limit(200).select("o_orderkey", "o_custkey")
      .write.format("strawboat").mode("overwrite").save(src)
    val q = spark.readStream.format("strawboat").load(src)
      .writeStream.format("strawboat")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .option("bucketBy", "o_custkey").option("buckets", "4")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val files = dataFiles(out)
    assert(files.nonEmpty && files.forall(f =>
      StrawBucket.parseTag(f.getName).exists(_.n == 4)),
      s"streaming sink wrote untagged files: $files")
    assert(StrawBucket.specOf(out).contains(("o_custkey", 4)))
    assert(sameRows(spark.read.format("strawboat").load(out),
      spark.read.format("strawboat").load(src)))
  }

  test("SQL bucket function matches the writer's hash") {
    val got = spark.sql("SELECT straw.bucket(8, CAST(42 AS BIGINT))")
      .head.getInt(0)
    assert(got == StrawBucket.bucketOf(42L, org.apache.spark.sql.types.LongType, 8))
    val gotS = spark.sql("SELECT straw.bucket(16, 'hello')").head.getInt(0)
    assert(gotS == StrawBucket.bucketOf(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello"),
      org.apache.spark.sql.types.StringType, 16))
  }

  test("multi-column bucket key: tagged layout, full-key pruning, gated SPJ") {
    val sp = spark; import sp.implicits._
    spark.sql("DROP TABLE IF EXISTS straw.mb.t1")
    spark.sql("DROP TABLE IF EXISTS straw.mb.t2")
    spark.sql("CREATE TABLE straw.mb.t1 (a BIGINT, b STRING, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, a, b))")
    spark.sql("CREATE TABLE straw.mb.t2 (a BIGINT, b STRING, w DOUBLE) " +
      "PARTITIONED BY (bucket(8, a, b))")
    spark.range(4000)
      .selectExpr("id AS a", "concat('k', id % 97) AS b", "cast(id AS double) AS v")
      .writeTo("straw.mb.t1").append()
    spark.range(4000)
      .selectExpr("id AS a", "concat('k', id % 97) AS b", "cast(id/2 AS double) AS w")
      .writeTo("straw.mb.t2").append()
    // every file single-bucket-tagged under the joined-spelling column hash
    val t1dir = s"$warehouse/mb/t1"
    val files = dataFiles(t1dir)
    assert(files.nonEmpty)
    assert(files.forall(f => StrawBucket.parseTag(f.getName)
      .exists(t => StrawBucket.tagMatches(t, "a,b", 8))))
    // full-key equality prunes to ONE bucket's files before footer IO
    val schema = spark.table("straw.mb.t1").schema
    def plannedFiles(fs: Array[org.apache.spark.sql.sources.Filter]): Int = {
      val sb = new StrawScanBuilder(t1dir, schema,
        bucketSpec = StrawBucket.specOf(t1dir))
      sb.pushFilters(fs)
      sb.build().asInstanceOf[StrawScan].planInputPartitions().map {
        case p: StrawPackedPartition => p.slices.size
        case _ => 1
      }.sum
    }
    import org.apache.spark.sql.sources.EqualTo
    val all = plannedFiles(Array.empty)
    val full = plannedFiles(Array(EqualTo("a", 7L), EqualTo("b", "k7")))
    assert(full < all, s"full-key equality should bucket-prune: $all -> $full")
    // a PARTIAL key cannot compute the chained hash — only zone maps may
    // prune, so strictly more files survive than under the full key
    val partial = plannedFiles(Array(EqualTo("a", 7L)))
    assert(partial > full,
      s"partial key must not bucket-prune: full=$full partial=$partial all=$all")
    // and the pruned read is exact
    assert(spark.sql("SELECT * FROM straw.mb.t1 WHERE a = 7 AND b = 'k7'")
      .count() == 1)

    // storage-partitioned join: version-pinned expectation. Spark 4.1.2's
    // KeyGroupedPartitioning.supportsExpressions requires single-child
    // transforms (isSupportedTransform, verified against the bytecode), so
    // the multi-ref bucket transform resolves but SPJ must NOT engage —
    // the scan degrades to ordinary packed splits and the join shuffles.
    // On a Spark that lifts the limit the probe flips and this test
    // asserts the shuffle-free plan instead, so the unlock is verified,
    // not just hoped for.
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql("SELECT mb1.a, mb1.b, v, w FROM straw.mb.t1 mb1 " +
        "JOIN straw.mb.t2 mb2 ON mb1.a = mb2.a AND mb1.b = mb2.b")
      val plan = j.queryExecution.executedPlan.toString
      if (StrawBucket.spjSupportsMultiRef)
        assert(!plan.contains("Exchange"),
          s"this Spark supports multi-ref SPJ — expected shuffle-free:\n$plan")
      else
        assert(plan.contains("Exchange"),
          "probe says SPJ can't consume multi-ref transforms, yet no shuffle planned")
      assert(j.count() == 4000)
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    // append gate: a single-column spec over the same table is refused
    val e = intercept[Exception] {
      spark.range(10).selectExpr("id AS a", "'x' AS b", "1.0d AS v")
        .write.format("strawboat")
        .option("bucketBy", "a").option("buckets", "8")
        .mode("append").save(t1dir)
    }
    assert(e.getMessage.contains("would mix layouts"), e.getMessage)

    // bucket-count evolution keeps the multi-column key
    val before = spark.table("straw.mb.t1").collect().toSet
    val res = StrawCompaction.rebucket(spark, t1dir, 4)
    assert(res.outputFiles > 0)
    assert(StrawBucket.specOf(t1dir).contains(("a,b", 4)))
    assert(dataFiles(t1dir).forall(f => StrawBucket.parseTag(f.getName)
      .exists(t => StrawBucket.tagMatches(t, "a,b", 4))))
    assert(spark.table("straw.mb.t1").collect().toSet == before)
    assert(spark.sql("SELECT * FROM straw.mb.t1 WHERE a = 7 AND b = 'k7'")
      .count() == 1)
  }
}
