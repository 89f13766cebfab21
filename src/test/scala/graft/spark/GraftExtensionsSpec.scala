package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Config-only activation of the whole function surface: a session built
  * with `spark.sql.extensions=graft.spark.GraftExtensions` answers plain
  * SQL over every graft kernel without any code-side registration. */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("extensions-test")
      // the config-file route a cluster operator uses — not withExtensions
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  test("vector kernels answer from plain SQL") {
    val cos = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-9)
    val orth = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(orth) < 1e-9)
    val norm = spark.sql("SELECT vector_norm(array(3.0D, 4.0D)) AS n")
      .collect()(0).getDouble(0)
    assert(math.abs(norm - 5.0) < 1e-9)
  }

  test("text-hash kernels answer from plain SQL") {
    // simhash is deterministic: equal inputs hash equal, and a self-jaccard is 1
    val rows = spark.sql(
      """SELECT simhash64('the quick brown fox') AS h1,
        |       simhash64('the quick brown fox') AS h2,
        |       shingle_jaccard('abcdefgh', 'abcdefgh', 3) AS j""".stripMargin)
      .collect()(0)
    assert(rows.getLong(0) == rows.getLong(1))
    assert(math.abs(rows.getDouble(2) - 1.0) < 1e-9)
    assert(spark.sql("SELECT minhash_signature('hello world text', 5, 8) AS s")
      .collect()(0).getSeq[Long](0).size == 8)
  }

  test("media header parsers answer from plain SQL") {
    // 1x1 PNG synthesized inline (pure JDK), parsed by image_meta
    val sp = spark; import sp.implicits._
    val img = java.awt.image.BufferedImage.TYPE_INT_RGB
    val bi = new java.awt.image.BufferedImage(7, 5, img)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    val row = Seq(Tuple1(bos.toByteArray)).toDF("payload")
      .selectExpr("image_meta(payload) AS m")
      .selectExpr("m.format", "m.width", "m.height")
      .collect()(0)
    assert(row.getString(0) == "png" && row.getInt(1) == 7 && row.getInt(2) == 5)
  }

  test("straw_history answers as a table-valued function in plain SQL") {
    val sp = spark; import sp.implicits._
    val out = java.nio.file.Files.createTempDirectory("extshistory").toString
    (0L until 50L).map(i => (i, s"r$i")).toDF("id", "s")
      .coalesce(1).write.format("strawboat").mode("overwrite").save(out)
    (50L until 80L).map(i => (i, s"r$i")).toDF("id", "s")
      .coalesce(1).write.format("strawboat").mode("append").save(out)
    import org.apache.spark.sql.sources.{Filter, LessThan}
    StrawDelete.delete(spark, out, Seq(LessThan("id", 5L): Filter)): Unit
    val rows = spark.sql(
      s"""SELECT version, operation, added_files, dv_files
         |FROM straw_history('$out') ORDER BY version""".stripMargin).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("truncate (bootstrap)", "append", "delete"))
    assert(rows(2).getInt(3) == 1, "the delete's DV action must surface")
    // the relation re-resolves per query: a new commit is visible at once
    (80L until 90L).map(i => (i, s"r$i")).toDF("id", "s")
      .coalesce(1).write.format("strawboat").mode("append").save(out)
    assert(spark.sql(s"SELECT count(*) AS c FROM straw_history('$out')")
      .collect()(0).getLong(0) == 4L)
    // time travel from SQL via a temporary view with reader options
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW tt_v1
         |USING strawboat OPTIONS (path '$out', versionAsOf '1')""".stripMargin)
    assert(spark.sql("SELECT count(*) AS c FROM tt_v1").collect()(0).getLong(0) == 50L)
  }

  test("straw_changes serves the change feed from plain SQL, distributed") {
    val sp = spark; import sp.implicits._
    val out = java.nio.file.Files.createTempDirectory("extschanges").toString
    (0L until 20L).map(i => (i, i % 4)).toDF("id", "b")
      .coalesce(1).write.format("strawboat").mode("overwrite").save(out) // v1
    import org.apache.spark.sql.sources.{Filter, LessThan}
    StrawDelete.delete(spark, out, Seq(LessThan("id", 3L): Filter)): Unit // v2
    val rows = spark.sql(
      s"""SELECT id, _change_type, _commit_version
         |FROM straw_changes('$out', 2) ORDER BY id""".stripMargin).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      (0L until 3L).map(i => (i, "delete", 2L)))
    // pinned range + aggregation over the feed
    val counts = spark.sql(
      s"""SELECT _change_type, count(*) AS c
         |FROM straw_changes('$out', 1, 2) GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(counts == Seq(("delete", 3L), ("insert", 20L)))
    // the plan is the distributed change-feed scan, not a collected relation
    val plan = spark.sql(s"SELECT * FROM straw_changes('$out', 1)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("strawboat changes"), s"expected a ChangeFeedScan:\n$plan")
  }

  test("straw_compact rewrites small files from plain SQL; re-resolution replays") {
    val sp = spark; import sp.implicits._
    val out = java.nio.file.Files.createTempDirectory("extscompact").toString
    (0L until 4000L).map(i => (i, (i * 2654435761L) % 1009L, (i * 40503L) % 1013L))
      .toDF("id", "x", "y")
      .repartition(4)
      .write.format("strawboat").mode("overwrite")
      .option("targetFileBytes", "4096").option("maxPageSize", "250")
      .save(out)
    val before = StrawIO.listFilesMeta(out).size
    val row = spark.sql(
      s"""SELECT input_files, output_files
         |FROM straw_compact('$out', 'x,y', true)""".stripMargin).collect()(0)
    assert(row.getInt(0) == before && row.getInt(1) < before)
    assert(spark.read.format("strawboat").load(out).count() == 4000L)
    // re-resolving the same call replays metrics, no second rewrite: the
    // file set (names + mtimes) is untouched
    val after = StrawLog.snapshot(out).get.entries.map(e => (e.meta.path, e.meta.mtime))
    val again = spark.sql(
      s"SELECT output_files FROM straw_compact('$out', 'x,y', true)").collect()(0)
    assert(again.getInt(0) == row.getInt(1))
    assert(StrawLog.snapshot(out).get.entries.map(e => (e.meta.path, e.meta.mtime)) == after)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM straw_compact('$out', 'x', true)").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("zOrder")))
  }

  test("constraint lifecycle runs from plain SQL: add, list, enforce, drop") {
    val sp = spark; import sp.implicits._
    val out = java.nio.file.Files.createTempDirectory("extsconstraint").toString
    (0L until 50L).map(i => (i, s"r$i")).toDF("id", "s")
      .coalesce(1).write.format("strawboat").mode("overwrite").save(out)
    val added = spark.sql(
      s"SELECT version, name, expression FROM straw_add_constraint('$out', 'id_small', 'id < 100')")
      .collect()(0)
    assert(added.getLong(0) == 2L && added.getString(1) == "id_small" &&
      added.getString(2) == "id < 100")
    val listed = spark.sql(
      s"SELECT name, expression FROM straw_constraints('$out')").collect()
    assert(listed.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("id_small", "id < 100")))
    val e = intercept[Exception] {
      (100L until 105L).map(i => (i, s"r$i")).toDF("id", "s")
        .write.format("strawboat").mode("append").save(out)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("CHECK constraint")))
    val dropped = spark.sql(
      s"SELECT version, name FROM straw_drop_constraint('$out', 'id_small')")
      .collect()(0)
    assert(dropped.getLong(0) == 3L && dropped.getString(1) == "id_small")
    assert(spark.sql(s"SELECT * FROM straw_constraints('$out')").collect().isEmpty)
    (100L until 105L).map(i => (i, s"r$i")).toDF("id", "s")
      .write.format("strawboat").mode("append").save(out)
    assert(spark.read.format("strawboat").load(out).count() == 55L)
  }

  test("straw_detail reports the table's log state from plain SQL") {
    val ss = spark
    import ss.implicits._
    val out = java.nio.file.Files.createTempDirectory("ext_detail").toString + "/t"
    (0L until 50L).map(i => (i, s"r$i")).toDF("id", "s")
      .write.format("strawboat").mode("overwrite").save(out)
    StrawDelete.delete(spark, out,
      Seq(org.apache.spark.sql.sources.LessThan("id", 5L)))
    val d = spark.sql(s"SELECT * FROM straw_detail('$out')").collect()(0)
    assert(d.getLong(0) == 2L) // version: write + delete
    assert(d.getLong(1) >= 1L) // files
    assert(d.getLong(2) > 0L) // bytes
    assert(d.getLong(3) == 45L) // live rows net of the DV
    assert(d.getLong(4) == 1L && d.getLong(5) == 5L) // dv files / dead rows
    assert(d.getLong(6) == 0L && d.getLong(7) == 0L && d.getLong(8) == 0L)
    assert(d.isNullAt(9)) // unbucketed table: no bucket_spec

    // a bucketed table reports its spec
    val out2 = out + "_b"
    (0L until 50L).map(i => (i, s"r$i")).toDF("id", "s")
      .write.format("strawboat")
      .option("bucketBy", "id").option("buckets", "4")
      .mode("overwrite").save(out2)
    val d2 = spark.sql(s"SELECT bucket_spec FROM straw_detail('$out2')").collect()(0)
    assert(d2.getString(0) == "bucket(4, id)", d2.getString(0))
  }

  test("straw_vacuum_log drops replay-unneeded log files from plain SQL") {
    val sp = spark; import sp.implicits._
    val out = java.nio.file.Files.createTempDirectory("extsvaclog").toString
    (0 until 25).foreach { i =>
      (i * 10 until i * 10 + 10).map(j => (j.toLong, s"r$j")).toDF("id", "s")
        .coalesce(1).write.format("strawboat")
        .mode(if (i == 0) "overwrite" else "append").save(out)
    }
    val logDir = new java.io.File(out, StrawLog.DirName)
    StrawLog.awaitLogMaintenance() // checkpoints write async
    val before = logDir.listFiles().count(!_.getName.startsWith("."))
    val dropped = spark.sql(
      s"SELECT * FROM straw_vacuum_log('$out', 3)").collect()(0).getInt(0)
    assert(dropped > 0 && logDir.listFiles()
      .count(!_.getName.startsWith(".")) == before - dropped)
    // the retained window still serves reads and recent time travel
    assert(spark.read.format("strawboat").load(out).count() == 250L)
    assert(spark.read.format("strawboat").option("versionAsOf", "24")
      .load(out).count() == 240L)
    // pre-window time travel now refuses (that is the deal)
    intercept[Exception](spark.read.format("strawboat")
      .option("versionAsOf", "2").load(out).count())
    // idempotent: a second call drops nothing further
    assert(spark.sql(s"SELECT * FROM straw_vacuum_log('$out', 3)")
      .collect()(0).getInt(0) == 0)
    // arg validation is loud — including TYPE errors (a string or
    // fractional keep-versions must hit the function's own message at
    // analysis, not a ClassCastException or a silent intValue truncation)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    Seq(s"SELECT * FROM straw_vacuum_log('$out', -1)",
        s"SELECT * FROM straw_vacuum_log('$out', 'three')",
        s"SELECT * FROM straw_vacuum_log('$out', 1.5)").foreach { q =>
      val e = intercept[Exception](spark.sql(q).collect())
      assert(msgs(e).exists(_.contains("straw_vacuum_log")), q)
    }
    val ev = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_vacuum('$out', 'soon')").collect())
    assert(msgs(ev).exists(_.contains("straw_vacuum ")), ev.getMessage)
  }

  test("mutating straw_* functions run at EXECUTION time: EXPLAIN changes nothing") {
    val sp = spark; import sp.implicits._
    val out = java.nio.file.Files.createTempDirectory("extsdeferred").toString
    (0 until 25).foreach { i =>
      (i * 10 until i * 10 + 10).map(j => (j.toLong, s"r$j")).toDF("id", "s")
        .coalesce(1).write.format("strawboat")
        .mode(if (i == 0) "overwrite" else "append").save(out)
    }
    val logDir = new java.io.File(out, StrawLog.DirName)
    StrawLog.awaitLogMaintenance() // checkpoints write async
    def logFiles(): Set[(String, Long)] = logDir.listFiles()
      .filter(!_.getName.startsWith(".")).map(f => (f.getName, f.lastModified)).toSet
    def dataFiles(): Set[(String, Long)] =
      StrawLog.snapshot(out).get.entries.map(e => (e.meta.path, e.meta.mtime)).toSet

    // EXPLAIN plans each call to the deferred node and mutates NOTHING —
    // not the log (vacuum_log), not the file set (compact), not the data
    // (restore); re-analysis (a second EXPLAIN) is equally inert
    val logBefore = logFiles()
    val dataBefore = dataFiles()
    (1 to 2).foreach { _ =>
      val planVac = spark.sql(
        s"EXPLAIN SELECT * FROM straw_vacuum_log('$out', 3)")
        .collect()(0).getString(0)
      assert(planVac.contains("DeferredOpExec straw_vacuum_log"), planVac)
      spark.sql(s"EXPLAIN SELECT * FROM straw_compact('$out')").collect()
      spark.sql(s"EXPLAIN SELECT * FROM straw_restore('$out', 1)").collect()
      spark.sql(s"EXPLAIN SELECT * FROM straw_vacuum('$out', 0)").collect()
    }
    assert(logFiles() == logBefore, "EXPLAIN must not vacuum the log")
    assert(dataFiles() == dataBefore, "EXPLAIN must not compact or restore")
    assert(spark.read.format("strawboat").load(out).count() == 250L)

    // actually EXECUTING still performs the operation and returns its rows
    val dropped = spark.sql(s"SELECT * FROM straw_vacuum_log('$out', 3)")
      .collect()(0).getInt(0)
    assert(dropped > 0 && logFiles().size == logBefore.size - dropped)
    // restore within the retained window (the vacuum kept >= the anchor
    // checkpoint's version, 20)
    val restored = spark.sql(s"SELECT * FROM straw_restore('$out', 22)")
      .collect()(0)
    assert(restored.getLong(1) == 22L)
    assert(spark.read.format("strawboat").load(out).count() == 220L)
  }

  test("straw_bm25 probes a lexical index from plain SQL") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "spark shuffle join tuning"),
      (2L, "gardening tips"),
      (3L, "spark streaming state")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ext_bm25").toString
    graft.ops.Search.buildLexicalIndex(docs, "doc_id", "text", dir, buckets = 4)
    // SQL gives no row order through a table function without an outer
    // ORDER BY (observed reordering under concurrent load) — state one
    val got = spark.sql(
      s"""SELECT * FROM straw_bm25('$dir', 'spark', 10)
         |ORDER BY score DESC, doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = graft.ops.Search.bm25TopKIndexed(spark, dir, Seq("spark"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      .sortBy { case (id, s) => (-s, id) }
    assert(got == want, s"got $got want $want")
    assert(got.map(_._1).toSet == Set(1L, 3L))
    // arg validation is loud
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM straw_bm25('$dir', 'spark', 'x')").collect())
    assert(e.getMessage.contains("straw_bm25") ||
      (e.getCause != null && e.getCause.getMessage.contains("straw_bm25")))

    // straw_lex_detail reports the bucket layout from the log alone
    val d = spark.sql(s"SELECT * FROM straw_lex_detail('$dir')").collect()
    assert(d.nonEmpty)
    assert(d.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 4)) // tagged buckets
    assert(d.map(_.getLong(1)).sum >= d.length.toLong) // files per bucket
    assert(d.map(_.getLong(3)).sum > 0L) // postings rows from stats blobs
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_lex_detail('${dir}_nope')").collect())
    assert(e2.getMessage.contains("straw_lex_detail") ||
      (e2.getCause != null && e2.getCause.getMessage.contains("straw_lex_detail")))

    // straw_phrase needs a positional index: build one, probe from SQL
    val pdir = java.nio.file.Files.createTempDirectory("ext_phrase").toString
    graft.ops.Search.buildLexicalIndex(docs, "doc_id", "text", pdir,
      buckets = 4, positions = true)
    val ph = spark.sql(s"SELECT * FROM straw_phrase('$pdir', 'spark shuffle', 10)")
      .collect().map(_.getLong(0)).toSeq
    assert(ph == Seq(1L), s"got $ph")
    assert(spark.sql(s"SELECT * FROM straw_phrase('$pdir', 'shuffle spark', 10)")
      .collect().isEmpty) // order matters
    // the k bound is REQUIRED (this surface goes through the driver) and
    // enforced: a 2-arg call refuses loudly, k caps the match set
    val eK = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_phrase('$pdir', 'spark shuffle')").collect())
    assert(eK.getMessage.contains("k int") ||
      (eK.getCause != null && eK.getCause.getMessage.contains("k int")))
    assert(spark.sql(s"SELECT * FROM straw_phrase('$pdir', 'spark shuffle', 1)")
      .collect().length <= 1)
    // a positions-less index refuses through the SQL surface too
    val e3 = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_phrase('$dir', 'spark shuffle', 10)").collect())
    assert(e3.getMessage.contains("positions") ||
      (e3.getCause != null && e3.getCause.getMessage.contains("positions")))

    // LAZY: the table function resolves to the index-probe PLAN, not an
    // analysis-time materialization — the analyzed tree bottoms out in
    // real index scans (a LocalRelation-only tree would mean the probe
    // already ran on the driver)
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    for (sql <- Seq(s"SELECT * FROM straw_bm25('$dir', 'spark', 10)",
        s"SELECT * FROM straw_phrase('$pdir', 'spark shuffle', 10)")) {
      val leaves = spark.sql(sql).queryExecution.analyzed.collectLeaves()
      assert(leaves.nonEmpty && leaves.forall(!_.isInstanceOf[LocalRelation]),
        s"expected lazy scan leaves for $sql, got:\n${leaves.mkString("\n")}")
    }
    // ...and therefore COMPOSES: join the probe back to the corpus in SQL
    docs.createOrReplaceTempView("ext_bm25_docs")
    val joined = spark.sql(
      s"""SELECT d.text, s.score FROM straw_bm25('$dir', 'spark', 10) s
         |JOIN ext_bm25_docs d ON d.doc_id = s.doc_id
         |ORDER BY s.score DESC, d.doc_id""".stripMargin).collect()
    assert(joined.length == 2 && joined.forall(_.getString(0).contains("spark")))
    spark.catalog.dropTempView("ext_bm25_docs")
  }

  test("straw_hybrid fuses the persisted tiers from plain SQL") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "spark shuffle join tuning"),
      (2L, "gardening tips for tomatoes"),
      (3L, "spark streaming state store"),
      (4L, "join strategies in databases")).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1.0f, 0.1f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.9f, 0.3f)), (4L, Array(-0.5f, 0.5f))).toDF("vec_id", "embedding")
    val base = java.nio.file.Files.createTempDirectory("ext_hybrid").toString
    graft.ops.Search.buildLexicalIndex(docs, "doc_id", "text", s"$base/lex", buckets = 4)
    graft.ops.Ann.buildIvfIndex(spark, emb, s"$base/ivf", 2, nCentroids = 2, seed = 7)

    // lazy: EXPLAIN shows the live index probes (BatchScan leaves), not a
    // LocalRelation of pre-materialized result rows (the one-row query
    // VECTOR is legitimately local)
    val plan = spark.sql(
      s"""EXPLAIN SELECT * FROM straw_hybrid('$base/lex', '$base/ivf',
         |'spark join', array(1.0D, 0.2D), 3, 2)""".stripMargin)
      .collect()(0).getString(0)
    assert(plan.contains("BatchScan"), plan)

    val got = spark.sql(
      s"""SELECT id, rrf, rank FROM straw_hybrid('$base/lex', '$base/ivf',
         |'spark join', array(1.0D, 0.2D), 3, 2) ORDER BY rank""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    val want = graft.ops.Search.hybridTopKIndexed(spark, s"$base/lex", s"$base/ivf",
        Seq(0L -> Seq("spark", "join")),
        Seq((0L, Array(1.0f, 0.2f))).toDF("vec_id", "embedding"), 3, nProbe = 2)
      .orderBy(org.apache.spark.sql.functions.col("rank"))
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == want, s"sql=$got scala=$want")
    assert(got.nonEmpty && got.map(_._3) == (1 to got.size))

    // arg hygiene: wrong vector type and empty terms refuse with the
    // function's own message
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e1 = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_hybrid('$base/lex', '$base/ivf', 'spark', 'notavec', 3)"))
    assert(msgs(e1).exists(_.contains("straw_hybrid")))
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_hybrid('$base/lex', '$base/ivf', '!!', array(1.0D), 3)"))
    assert(msgs(e2).exists(_.contains("at least one term")))
  }

  test("straw_chunk / straw_lm_score / straw_temperature run from plain SQL") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat sat again near the mat today", "en"),
      (2L, "the cat sat on the hat and the dog sat again near the rug today", "en"),
      (3L, "uno dos tres quatro cinco seis siete ocho nueve diez once doce", "es"),
      (4L, "the dog sat on the mat and the cat ran again near the hat today", "en"))
      .toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("ext_textops").toString + "/t"
    docs.write.format("strawboat").mode("overwrite").save(dir)

    // SQL == Scala, row for row, for all three
    val chunkSql = spark.sql(
      s"SELECT * FROM straw_chunk('$dir', 'doc_id', 'text', 8, 2) ORDER BY doc_id, chunk_id")
      .collect().toSeq
    val chunkApi = graft.ops.TextOps.chunkDocs(
        spark.read.format("strawboat").load(dir), "doc_id", "text", 8, 2)
      .orderBy("doc_id", "chunk_id").collect().toSeq
    assert(chunkSql == chunkApi && chunkSql.nonEmpty)

    val lmSql = spark.sql(
      s"SELECT * FROM straw_lm_score('$dir', 'doc_id', 'text') ORDER BY doc_id")
      .collect().toSeq
    val lmApi = graft.ops.TextOps.lmScore(
        spark.read.format("strawboat").load(dir), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(lmSql == lmApi && lmSql.size == 4)

    val tSql = spark.sql(
      s"SELECT doc_id FROM straw_temperature('$dir', 'doc_id', 'lang', 0.5, 1.0) ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    val tApi = graft.ops.Packing.temperatureSample(
        spark.read.format("strawboat").load(dir), "doc_id", "lang", 0.5, 1.0)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(tSql == tApi)

    // straw_dup_spans: SQL == Scala (docs 1/2/4 share token runs), lazy,
    // minDf literal accepted, loud on a non-numeric n
    val spansSql = spark.sql(
      s"""SELECT * FROM straw_dup_spans('$dir', 'doc_id', 'text', 4)
         |ORDER BY doc_id, span_start""".stripMargin).collect().toSeq
    val spansApi = graft.ops.Dedup.duplicateSpans(
        spark.read.format("strawboat").load(dir), "doc_id", "text", 4)
      .orderBy("doc_id", "span_start").collect().toSeq
    assert(spansSql == spansApi && spansSql.nonEmpty)
    assert(spark.sql(
      s"SELECT * FROM straw_dup_spans('$dir', 'doc_id', 'text', 4, 3)")
      .collect().length <= spansSql.length) // stricter df never adds spans
    val eSpan = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_dup_spans('$dir', 'doc_id', 'text', 'x')").collect())
    assert(eSpan.getMessage.contains("straw_dup_spans") ||
      (eSpan.getCause != null &&
        eSpan.getCause.getMessage.contains("straw_dup_spans")))

    // lazy: EXPLAIN shows the probe plan, composition in a CTE works
    val plan = spark.sql(
      s"EXPLAIN SELECT count(*) FROM straw_chunk('$dir', 'doc_id', 'text', 8, 2)")
      .collect()(0).getString(0)
    assert(plan.contains("BatchScan") || plan.contains("strawboat"), plan)
    val joined = spark.sql(
      s"""WITH c AS (SELECT * FROM straw_chunk('$dir', 'doc_id', 'text', 8, 2)),
         |s AS (SELECT * FROM straw_lm_score('$dir', 'doc_id', 'text'))
         |SELECT count(*) FROM c JOIN s USING (doc_id)""".stripMargin)
      .collect()(0).getLong(0)
    assert(joined == chunkApi.size.toLong)

    // loud validation
    val e1 = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_chunk('$dir', 'doc_id', 'text', 'x', 2)").collect())
    assert(e1.getMessage.contains("straw_chunk") ||
      (e1.getCause != null && e1.getCause.getMessage.contains("straw_chunk")))
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_temperature('$dir', 'doc_id', 'lang', 0.5, 2.0)").collect())
    assert(e2.getMessage.contains("targetFraction") ||
      (e2.getCause != null && e2.getCause.getMessage.contains("targetFraction")))
  }

  test("straw_dedup / straw_neardup serve the doc-dedup family from SQL, " +
      "lazy, SQL == Scala") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat sat again near the mat today"),
      (2L, "the cat sat on the mat and the cat sat again near the mat today"),
      (3L, "uno dos tres quatro cinco seis siete ocho nueve diez once doce"),
      (4L, "the cat sat on the mat and the cat sat again near the rug today"),
      (5L, "completely different words entirely here nothing shared at all"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ext_dedup").toString + "/t"
    docs.write.format("strawboat").mode("overwrite").save(dir)

    // exact dedup: docs 1/2 collapse (keep 1); SQL == Scala
    val exSql = spark.sql(
      s"SELECT * FROM straw_dedup('$dir', 'doc_id', 'text') ORDER BY keep_id")
      .collect().toSeq
    val exApi = graft.ops.Dedup.exact(
        spark.read.format("strawboat").load(dir), "doc_id", "text")
      .orderBy("keep_id").collect().toSeq
    assert(exSql == exApi && exSql.size == 4)
    assert(exSql.map(r => (r.getLong(1), r.getLong(2))).toSet ==
      Set((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L)))

    // minhash near-dup: 1-2 are identical (j=1.0), 1-4 / 2-4 near; 3 and
    // 5 pair with nothing; SQL == Scala incl. the optional literals
    val ndSql = spark.sql(
      s"SELECT * FROM straw_neardup('$dir', 'doc_id', 'text') ORDER BY id_a, id_b")
      .collect().toSeq
    val ndApi = graft.ops.Dedup.minHashNearDup(
        spark.read.format("strawboat").load(dir), "doc_id", "text")
      .orderBy("id_a", "id_b").collect().toSeq
    assert(ndSql == ndApi)
    assert(ndSql.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 2L)))
    assert(!ndSql.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
    val loose = spark.sql(
      s"SELECT * FROM straw_neardup('$dir', 'doc_id', 'text', 0.5, 4)")
      .collect()
    assert(loose.length >= ndSql.length) // looser threshold never shrinks

    // lazy: EXPLAIN is a plan over the scan, no jobs
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val plan = spark.sql(
      s"EXPLAIN SELECT * FROM straw_neardup('$dir', 'doc_id', 'text')")
      .collect()(0).getString(0)
    assert(plan.contains("BatchScan") || plan.contains("strawboat"), plan)
    assert(spark.sparkContext.statusTracker.getJobIdsForGroup(null).length ==
      before, "EXPLAIN must run no jobs")

    // loud validation
    val e1 = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_neardup('$dir', 'doc_id', 'text', 1.5)").collect())
    assert(e1.getMessage.contains("threshold") ||
      (e1.getCause != null && e1.getCause.getMessage.contains("threshold")))
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_dedup('$dir', 'doc_id')").collect())
    assert(e2.getMessage.contains("straw_dedup") ||
      (e2.getCause != null && e2.getCause.getMessage.contains("straw_dedup")))
  }

  test("straw_knn probes a persisted IVF index from plain SQL") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(5)
    val centers = Array.tabulate(4, 16)((c, i) => if (i / 4 == c) 8.0f else 0.0f)
    val vecs = (0L until 400L).map { id =>
      (id, centers((id % 4).toInt).map(x => x + (rnd.nextFloat() - 0.5f) * 0.4f))
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ext_knn").toString + "/ivf"
    graft.ops.Ann.buildIvfIndex(spark, vecs, dir, 16, nCentroids = 4)
    val qvec = (0 until 16).map(i => if (i < 4) 8.0 else 0.0)
    val vecSql = s"array(${qvec.mkString("D, ")}D)"
    val got = spark.sql(
      s"SELECT * FROM straw_knn('$dir', $vecSql, 5, 4) ORDER BY rank")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    // equals the Scala API with the same full probe
    val qdf = Seq((Long.MinValue, qvec.map(_.toFloat).toArray)).toDF("vec_id", "embedding")
    val want = graft.ops.Ann.ivfTopKIndexed(spark, dir, qdf, 5, nProbe = 4)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == want && got.size == 5, s"got $got want $want")
    // all neighbors from cluster 0 (the query sits on its center)
    assert(got.forall(_._1 % 4 == 0))
    // lazy: EXPLAIN shows the probe scan, no execution needed
    val plan = spark.sql(
      s"EXPLAIN SELECT * FROM straw_knn('$dir', $vecSql, 5)").collect()(0).getString(0)
    assert(plan.contains("BatchScan") || plan.contains("strawboat"), plan)
    // loud validation
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_knn('$dir', 'nope', 5)").collect())
    assert(e.getMessage.contains("straw_knn") ||
      (e.getCause != null && e.getCause.getMessage.contains("straw_knn")))
  }

  test("straw_index builds and appends every index kind from plain SQL") {
    val ss = spark
    import ss.implicits._
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .flatMap(x => Option(x.getMessage)).toSeq
    val base = java.nio.file.Files.createTempDirectory("ext_index").toString
    // corpora as strawboat tables (the TVF reads strawboat sources)
    val docs = Seq(
      (1L, "spark joins shuffle data"), (2L, "spark broadcast joins are fast"),
      (3L, "lexical retrieval with bm25"), (4L, "vectors use cosine"))
      .toDF("doc_id", "text")
    docs.write.format("strawboat").mode("append").save(s"$base/docs")
    val rnd = new scala.util.Random(9)
    val centers = Array.tabulate(4, 16)((c, i) => if (i / 4 == c) 8.0f else 0.0f)
    def vecs(ids: Range) = ids.map { id =>
      (id.toLong, centers(id % 4).map(x => x + (rnd.nextFloat() - 0.5f) * 0.4f))
    }.toDF("vec_id", "embedding")
    vecs(0 until 400).write.format("strawboat").mode("append").save(s"$base/vecs")
    vecs(400 until 460).write.format("strawboat").mode("append").save(s"$base/vecs2")

    // lexical: build via SQL, probe via straw_bm25
    val lexRow = spark.sql(
      s"SELECT * FROM straw_index('$base/docs', '$base/lex', 'lexical')")
      .collect()(0)
    assert(lexRow.getString(0) == "lexical" && lexRow.getLong(1) == 4)
    val hits = spark.sql(
      s"SELECT * FROM straw_bm25('$base/lex', 'spark joins', 2)").collect()
    assert(hits.length == 2 && hits.map(_.getLong(0)).toSet == Set(1L, 2L))

    // ivf: build + probe + SQL append; the grown index serves the new ids
    spark.sql(s"""SELECT * FROM straw_index('$base/vecs', '$base/ivf', 'ivf',
      'dim=16,ncentroids=4')""").collect()
    val qvec = s"array(${(0 until 16).map(i => if (i < 4) "8.0D" else "0.0D").mkString(", ")})"
    val knn = spark.sql(
      s"SELECT * FROM straw_knn('$base/ivf', $qvec, 5, 4)").collect()
    assert(knn.length == 5 && knn.forall(_.getLong(0) % 4 == 0))
    val app = spark.sql(
      s"SELECT * FROM straw_index_append('$base/vecs2', '$base/ivf')").collect()(0)
    assert(app.getString(0) == "ivf" && app.getLong(1) == 60)
    val knn2 = spark.sql(
      s"SELECT * FROM straw_knn('$base/ivf', $qvec, 100, 4)").collect()
    assert(knn2.exists(_.getLong(0) >= 400L), "appended vectors must be probeable")

    // ivfpq with OPQ: build via SQL, probe via the deferred straw_knn tier
    spark.sql(s"""SELECT * FROM straw_index('$base/vecs', '$base/ivfpq',
      'ivfpq', 'dim=16,ncentroids=4,m=4,ncodes=16,opq=true')""").collect()
    assert(new java.io.File(s"$base/ivfpq", "_opq_rotation").exists())
    val pqknn = spark.sql(
      s"SELECT * FROM straw_knn('$base/ivfpq', $qvec, 5, 4)").collect()
    assert(pqknn.length == 5 && pqknn.forall(_.getLong(0) % 4 == 0))

    // bq: build + probe + SQL append — the whole lifecycle without Scala
    spark.sql(s"""SELECT * FROM straw_index('$base/vecs', '$base/bq', 'bq',
      'dim=16')""").collect()
    assert(new java.io.File(s"$base/bq", "_bq_meta").exists())
    val bqknn = spark.sql(
      s"SELECT * FROM straw_knn('$base/bq', $qvec, 5, 120)").collect()
    assert(bqknn.length == 5 && bqknn.forall(_.getLong(0) % 4 == 0))
    val bqApp = spark.sql(
      s"SELECT * FROM straw_index_append('$base/vecs2', '$base/bq')").collect()(0)
    assert(bqApp.getString(0) == "bq" && bqApp.getLong(1) == 60)
    val bqknn2 = spark.sql(
      s"SELECT * FROM straw_knn('$base/bq', $qvec, 100, 460)").collect()
    assert(bqknn2.exists(_.getLong(0) >= 400L), "appended BQ vectors must be probeable")

    // ivfbq: cell-pruned BQ — build + probe (4th straw_knn arg = nProbe)
    // + append, all from SQL; sign-separable AND spatially separated
    // clusters so the pruned probe lands on the right cell
    val bqCenters = Array.tabulate(4, 16)((c, i) => if (i / 4 == c) 10.0f else -10.0f)
    def bqVecs(ids: Range) = ids.map { id =>
      (id.toLong, bqCenters(id % 4).map(x => x + (rnd.nextFloat() - 0.5f) * 0.5f))
    }.toDF("vec_id", "embedding")
    bqVecs(0 until 400).write.format("strawboat").mode("append").save(s"$base/bvecs")
    bqVecs(400 until 460).write.format("strawboat").mode("append").save(s"$base/bvecs2")
    spark.sql(s"""SELECT * FROM straw_index('$base/bvecs', '$base/ivfbq',
      'ivfbq', 'dim=16,ncentroids=4')""").collect()
    assert(new java.io.File(s"$base/ivfbq", "_bq_meta").exists())
    assert(new java.io.File(s"$base/ivfbq", "_ivf_centroids").exists())
    val bqQ = s"array(${(0 until 16).map(i => if (i < 4) "10.0D" else "-10.0D").mkString(", ")})"
    val ivfbqKnn = spark.sql(
      s"SELECT * FROM straw_knn('$base/ivfbq', $bqQ, 5, 1)").collect()
    assert(ivfbqKnn.length == 5 && ivfbqKnn.forall(_.getLong(0) % 4 == 0),
      ivfbqKnn.mkString(","))
    val ivfbqApp = spark.sql(
      s"SELECT * FROM straw_index_append('$base/bvecs2', '$base/ivfbq')").collect()(0)
    assert(ivfbqApp.getString(0) == "ivfbq" && ivfbqApp.getLong(1) == 60)
    // k exceeds the query's cluster size (115 incl. 15 appended): rounded
    // cosines tie near 1.0 and break by id asc, so only a k that covers
    // the whole cluster must surface appended ids
    assert(spark.sql(s"SELECT * FROM straw_knn('$base/ivfbq', $bqQ, 120, 4)")
      .collect().exists(_.getLong(0) >= 400L))

    // deferred: EXPLAIN builds nothing
    val probe = s"$base/never"
    spark.sql(s"EXPLAIN SELECT * FROM straw_index('$base/vecs', '$probe', " +
      "'ivf', 'dim=16')").collect()
    assert(!new java.io.File(probe).exists(), "EXPLAIN must not build")

    // loud validation: bad kind, missing dim, unknown option, non-index append
    val e1 = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_index('$base/vecs', '$base/x', 'hnsw')").collect())
    assert(msgs(e1).exists(_.contains("kind must be")))
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_index('$base/vecs', '$base/x', 'pq')").collect())
    assert(msgs(e2).exists(_.contains("dim=")))
    val e3 = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_index('$base/vecs', '$base/x', 'ivf', 'dim=16,bogus=1')").collect())
    assert(msgs(e3).exists(_.contains("unknown option")))
    val e4 = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_index_append('$base/vecs2', '$base/docs')").collect())
    assert(msgs(e4).exists(_.contains("no index sidecars")))
  }

  test("straw_knn serves the PQ and IVF-PQ tiers (deferred execution)") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(6)
    val centers = Array.tabulate(4, 16)((c, i) => if (i / 4 == c) 8.0f else 0.0f)
    val vecs = (0L until 400L).map { id =>
      (id, centers((id % 4).toInt).map(x => x + (rnd.nextFloat() - 0.5f) * 0.4f))
    }.toDF("vec_id", "embedding")
    val base = java.nio.file.Files.createTempDirectory("ext_knnpq").toString
    graft.ops.Ann.buildPqIndex(spark, vecs, s"$base/pq", 16, m = 4, nCodes = 16)
    graft.ops.Ann.buildIvfPqIndex(spark, vecs, s"$base/ivfpq", 16,
      nCentroids = 4, m = 4, nCodes = 16)
    val qvec = (0 until 16).map(i => if (i < 4) 8.0 else 0.0)
    val vecSql = s"array(${qvec.mkString("D, ")}D)"
    val qdf = Seq((Long.MinValue, qvec.map(_.toFloat).toArray))
      .toDF("vec_id", "embedding")

    // flat PQ: SQL == Scala (4th arg = shortlist here)
    val gotPq = spark.sql(
      s"SELECT * FROM straw_knn('$base/pq', $vecSql, 5, 40) ORDER BY rank")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    val wantPq = graft.ops.Ann.pqTopKIndexed(spark, s"$base/pq", qdf, 5,
        shortlist = 40).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(gotPq == wantPq && gotPq.size == 5, s"got $gotPq want $wantPq")

    // IVF-PQ: SQL == Scala (4th arg = nProbe here)
    val gotIvf = spark.sql(
      s"SELECT * FROM straw_knn('$base/ivfpq', $vecSql, 5, 4) ORDER BY rank")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    val wantIvf = graft.ops.Ann.ivfPqTopK(spark, s"$base/ivfpq", qdf, 5,
        nProbe = 4).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(gotIvf == wantIvf && gotIvf.size == 5, s"got $gotIvf want $wantIvf")

    // deferred: EXPLAIN shows the DeferredOp node, probes nothing — the
    // PQ probe's bounded mid-flight collect must not run at analysis
    val plan = spark.sql(
      s"EXPLAIN SELECT * FROM straw_knn('$base/pq', $vecSql, 5)")
      .collect()(0).getString(0)
    assert(plan.contains("DeferredOp"), plan)
    assert(!plan.contains("BatchScan"), plan)
  }

  test("straw_knn serves the BQ tier (deferred execution)") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(9)
    // sign-separable clusters (the BQ OpsSpec fixture)
    val centers = Array.tabulate(4, 16)((c, i) => if (i / 4 == c) 1.0f else -1.0f)
    val vecs = (0L until 400L).map { id =>
      (id, centers((id % 4).toInt).map(x => x + (rnd.nextFloat() - 0.5f) * 0.4f))
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ext_knnbq").toString + "/bq"
    graft.ops.Ann.buildBqIndex(spark, vecs, dir, 16)
    val qvec = (0 until 16).map(i => if (i < 4) 1.0 else -1.0)
    val vecSql = s"array(${qvec.mkString("D, ")}D)"
    val got = spark.sql(
      s"SELECT * FROM straw_knn('$dir', $vecSql, 5, 100) ORDER BY rank")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    val qdf = Seq((Long.MinValue, qvec.map(_.toFloat).toArray))
      .toDF("vec_id", "embedding")
    val want = graft.ops.Ann.bqTopKIndexed(spark, dir, qdf, 5, shortlist = 100)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == want && got.size == 5, s"got $got want $want")
    // deferred: EXPLAIN shows DeferredOp and runs no probe job
    val plan = spark.sql(
      s"EXPLAIN SELECT * FROM straw_knn('$dir', $vecSql, 5)")
      .collect()(0).getString(0)
    assert(plan.contains("DeferredOp"), plan)
  }

  test("straw_asof joins two tables point-in-time from plain SQL, SQL == Scala") {
    val sp = spark; import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("asof_sql").toString
    val probes = Seq((1L, 10L, 100L), (2L, 10L, 250L), (3L, 20L, 50L))
      .toDF("id", "k", "t")
    val refs = Seq((7L, 10L, 90L, 1.5), (8L, 10L, 240L, 2.5), (9L, 30L, 10L, 9.9))
      .toDF("rid", "rk", "rt", "rv")
    probes.write.format("strawboat").mode("overwrite").save(s"$base/probes")
    refs.write.format("strawboat").mode("overwrite").save(s"$base/refs")
    val got = spark.sql(
      s"""SELECT id, r_rid, r_rv FROM
         |  straw_asof('$base/probes', '$base/refs', 'k=rk', 't=rt', 'rid')
         |ORDER BY id""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // probe 1 at t=100: latest rk=10 ref at rt<=100 is rid 7; probe 2 at
    // 250 -> rid 8; probe 3 has no k=20 refs -> dropped (inner)
    assert(got == Seq((1L, 7L, 1.5), (2L, 8L, 2.5)))
    val scala = graft.ops.TemporalJoin.asofJoin(
        spark.read.format("strawboat").load(s"$base/probes"),
        spark.read.format("strawboat").load(s"$base/refs"),
        "k", "rk", "t", "rt", Seq("rid", "rv"), rightTieBreak = "rid")
      .selectExpr("id", "rid AS r_rid", "rv AS r_rv").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(scala == got)
    // forward direction via the optional 6th arg
    val fwd = spark.sql(
      s"""SELECT id, r_rid FROM straw_asof('$base/probes', '$base/refs',
         |  'k=rk', 't=rt', 'rid', 'forward') ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // probe 1 (t=100) -> next rk=10 ref is rid 8 at rt=240; probe 2
    // (t=250) has nothing later; probe 3 has no k=20 refs at all
    assert(fwd == Seq((1L, 8L)))
    // EXPLAIN is lazy: a join-free sweep plan, no job, no join node
    val plan = spark.sql(
      s"""EXPLAIN SELECT * FROM straw_asof('$base/probes', '$base/refs',
         |  'k=rk', 't=rt', 'rid')""".stripMargin).collect()(0).getString(0)
    assert(!plan.contains("Join"), plan)
    // bad args fail loudly at analysis
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM straw_asof('$base/probes', '$base/refs', 'k=rk', 't=rt', 'rid', 'sideways')").collect()
    }
    assert(e.getMessage.contains("backward|forward|nearest") ||
      (e.getCause != null && e.getCause.getMessage.contains("backward|forward|nearest")))
  }

  test("straw_range joins intervals to points from plain SQL, no nested loop") {
    val sp = spark; import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("range_sql").toString
    Seq((1L, 100L, 200L), (2L, 150L, 160L), (3L, 900L, 950L))
      .toDF("iid", "lo", "hi")
      .write.format("strawboat").mode("overwrite").save(s"$base/ivs")
    Seq((10L, 155L), (11L, 199L), (12L, 500L))
      .toDF("pid", "pt")
      .write.format("strawboat").mode("overwrite").save(s"$base/pts")
    val df = spark.sql(
      s"""SELECT iid, p_pid FROM
         |  straw_range('$base/ivs', '$base/pts', 'lo', 'hi', 'pt', 50L)
         |ORDER BY iid, p_pid""".stripMargin)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L), (1L, 11L), (2L, 10L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"must plan an equi-join on bins:\n$plan")
  }

  test("straw_range/straw_overlap refuse binWidth <= 0: no analysis-time job") {
    val sp = spark; import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("range_auto").toString
    Seq((1L, 100L, 200L)).toDF("iid", "lo", "hi")
      .write.format("strawboat").mode("overwrite").save(s"$base/ivs")
    Seq((10L, 155L)).toDF("pid", "pt")
      .write.format("strawboat").mode("overwrite").save(s"$base/pts")
    // the Scala API's binWidth<=0 auto-derivation runs an eager percentile
    // job — acceptable there (documented opt-in), a contract violation on
    // the lazy TVF route where EXPLAIN must probe nothing. The TVF refuses
    // at analysis, and crucially refuses WITHOUT running any Spark job.
    // statusTracker is synchronous driver state — no listener-bus race
    def jobsSeen: Int =
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val before = jobsSeen
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    for (from <- Seq(
        s"straw_range('$base/ivs', '$base/pts', 'lo', 'hi', 'pt', 0L)",
        s"straw_overlap('$base/ivs', '$base/ivs', " +
          "'lo', 'hi', 'lo', 'hi', 0L)")) {
      // analysis of the bare SELECT throws (loudly, pointing at the
      // Scala-side derivation) ...
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM $from").collect()
      }
      assert(msgs(e).exists(_.contains("suggestBinWidth")),
        s"refusal must point at the Scala derivation: ${msgs(e)}")
      // ... and EXPLAIN folds the refusal into its output (Spark 4 prints
      // a generic planning-error line) rather than producing a plan —
      // the zero-jobs assertion below is the contract being pinned
      val plan = spark.sql(s"EXPLAIN SELECT * FROM $from")
        .collect()(0).getString(0)
      assert(plan.toLowerCase.contains("error"), plan)
    }
    assert(jobsSeen == before,
      s"binWidth=0 TVF refusal must run zero jobs, ran ${jobsSeen - before}")
    // the positive-literal route is unaffected
    val ok = spark.sql(
      s"""SELECT iid, p_pid FROM
         |  straw_range('$base/ivs', '$base/pts', 'lo', 'hi', 'pt', 50L)
         |""".stripMargin).collect()
    assert(ok.length == 1)
  }

  test("straw_asof tolerance + allowExactMatches controls from SQL") {
    val sp = spark; import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("asof_tol").toString
    Seq((1L, 10L, 100L), (2L, 10L, 250L)).toDF("id", "k", "t")
      .write.format("strawboat").mode("overwrite").save(s"$base/probes")
    Seq((7L, 10L, 90L, 1.5), (8L, 10L, 100L, 2.5))
      .toDF("rid", "rk", "rt", "rv")
      .write.format("strawboat").mode("overwrite").save(s"$base/refs")
    // numeric tolerance 20: probe 1 matches rid 8 (exact, gap 0); probe 2's
    // nearest back is 150 away -> dropped
    val tol = spark.sql(
      s"""SELECT id, r_rid FROM straw_asof('$base/probes', '$base/refs',
         |  'k=rk', 't=rt', 'rid', 'backward', 20L) ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(tol == Seq((1L, 8L)))
    // allowExactMatches=false: probe 1's exact-time rid 8 is excluded,
    // falls to rid 7 at 90 (gap 10, within 20)
    val strict = spark.sql(
      s"""SELECT id, r_rid FROM straw_asof('$base/probes', '$base/refs',
         |  'k=rk', 't=rt', 'rid', 'backward', 20L, false)
         |ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(strict == Seq((1L, 7L)))
    // timestamp columns take an interval-expression string
    Seq((1L, 1L, "2024-01-01 10:00:00"), (2L, 1L, "2024-01-01 12:00:00"))
      .toDF("id", "k", "ts").withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      .write.format("strawboat").mode("overwrite").save(s"$base/tsp")
    Seq((10L, 1L, "2024-01-01 09:30:00")).toDF("rid", "rk", "rts")
      .withColumn("rts", org.apache.spark.sql.functions.col("rts").cast("timestamp"))
      .write.format("strawboat").mode("overwrite").save(s"$base/tsr")
    val iv = spark.sql(
      s"""SELECT id, r_rid FROM straw_asof('$base/tsp', '$base/tsr',
         |  'k=rk', 'ts=rts', 'rid', 'backward', 'INTERVAL ''1'' HOUR')
         |ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(iv == Seq((1L, 10L))) // probe 2 is 2.5h past the ref: out
    // non-literal tolerance types fail loudly
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM straw_asof('$base/probes', '$base/refs', " +
        "'k=rk', 't=rt', 'rid', 'backward', 20L, 'yes')").collect()
    }
    assert(e.getMessage.contains("boolean literal") ||
      (e.getCause != null && e.getCause.getMessage.contains("boolean literal")))
    // 9th arg = bucketWidth routes through the skew-splitting path, with
    // identical results (the spec-pinned equality, here through SQL)
    val bucketed = spark.sql(
      s"""SELECT id, r_rid FROM straw_asof('$base/probes', '$base/refs',
         |  'k=rk', 't=rt', 'rid', 'backward', 20L, false, 7L)
         |ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bucketed == strict, s"bucketed SQL route drifted: $bucketed")
    // nearest now rides the bucketed path too (both-sweep + nearer pick)
    def nearest(extra: String): Seq[(Long, Long)] = spark.sql(
      s"""SELECT id, r_rid FROM straw_asof('$base/probes', '$base/refs',
         |  'k=rk', 't=rt', 'rid', 'nearest', 200L, true$extra)
         |ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(nearest(", 7L") == nearest(""),
      "bucketed nearest SQL route drifted")
  }

  test("straw_asof_both attaches both neighbors from SQL, SQL == Scala") {
    val sp = spark; import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("asof_both").toString
    Seq((1L, 10L, 100L), (2L, 10L, 250L), (3L, 10L, 10L))
      .toDF("id", "k", "t")
      .write.format("strawboat").mode("overwrite").save(s"$base/probes")
    Seq((7L, 10L, 90L, 1.0), (8L, 10L, 240L, 3.0))
      .toDF("rid", "rk", "rt", "rv")
      .write.format("strawboat").mode("overwrite").save(s"$base/refs")
    val df = spark.sql(
      s"""SELECT id, r_bwd_rid, r_fwd_rid,
         |  r_bwd_rv + (r_fwd_rv - r_bwd_rv) * (t - r_bwd_rt)
         |    / (r_fwd_rt - r_bwd_rt) AS lerp
         |FROM straw_asof_both('$base/probes', '$base/refs', 'k=rk', 't=rt',
         |  'rid') ORDER BY id""".stripMargin)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // probe 1 sandwiches between rid 7 (t=90,v=1) and rid 8 (t=240,v=3):
    // lerp at 100 = 1 + 2*(10/150); probes 2 and 3 miss a side -> drop
    assert(got.map(x => (x._1, x._2, x._3)) == Seq((1L, 7L, 8L)))
    assert(math.abs(got.head._4 - (1.0 + 2.0 * 10 / 150)) < 1e-9)
    val scala = graft.ops.TemporalJoin.asofBothJoin(
        spark.read.format("strawboat").load(s"$base/probes"),
        spark.read.format("strawboat").load(s"$base/refs"),
        "k", "rk", "t", "rt", Seq("rid", "rv"), rightTieBreak = "rid")
      .selectExpr("id", "bwd_rid", "fwd_rid").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(scala == got.map(x => (x._1, x._2, x._3)))
    // lazy + join-free
    val plan = spark.sql(
      s"""EXPLAIN SELECT * FROM straw_asof_both('$base/probes', '$base/refs',
         |  'k=rk', 't=rt', 'rid')""".stripMargin).collect()(0).getString(0)
    assert(!plan.contains("Join"), plan)
    // optional bucketWidth routes through asofBothJoinBucketed — same rows
    val bucketed = spark.sql(
      s"""SELECT id, r_bwd_rid, r_fwd_rid
         |FROM straw_asof_both('$base/probes', '$base/refs', 'k=rk', 't=rt',
         |  'rid', true, 37L) ORDER BY id""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(bucketed == got.map(x => (x._1, x._2, x._3)))
  }

  test("straw_overlap joins overlapping intervals from SQL, no nested loop") {
    val sp = spark; import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("overlap_sql").toString
    Seq((1L, 100L, 200L), (2L, 300L, 400L)).toDF("aid", "alo", "ahi")
      .write.format("strawboat").mode("overwrite").save(s"$base/a")
    Seq((10L, 150L, 350L), (11L, 500L, 600L)).toDF("bid", "blo", "bhi")
      .write.format("strawboat").mode("overwrite").save(s"$base/b")
    val df = spark.sql(
      s"""SELECT aid, r_bid FROM straw_overlap('$base/a', '$base/b',
         |  'alo', 'ahi', 'blo', 'bhi', 100L) ORDER BY aid""".stripMargin)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // b10 [150,350] overlaps both a1 [100,200] and a2 [300,400]; b11 none
    assert(got == Seq((1L, 10L), (2L, 10L)))
    val scala = graft.ops.TemporalJoin.rangeOverlapJoin(
        spark.read.format("strawboat").load(s"$base/a"), "alo", "ahi",
        spark.read.format("strawboat").load(s"$base/b")
          .withColumnRenamed("bid", "r_bid")
          .withColumnRenamed("blo", "r_blo")
          .withColumnRenamed("bhi", "r_bhi"), "r_blo", "r_bhi", 100L)
      .selectExpr("aid", "r_bid").orderBy("aid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(scala == got)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"must plan an equi-join on bins:\n$plan")
  }

  test("straw_topk: exact sketch-verified heavy hitters from SQL, deferred") {
    val sp = spark; import sp.implicits._
    val base = java.nio.file.Files.createTempDirectory("topk_sql").toString
    // zipf-ish: token i appears 200/i times — top counts well clear n/257
    val rows = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"tok$i"))
    rows.map(Tuple1(_)).toDF("w").write.format("strawboat")
      .mode("overwrite").save(base)
    val got = spark.sql(
      s"SELECT item, cnt FROM straw_topk('$base', 'w', 5) ORDER BY cnt DESC")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("tok1", 200L), ("tok2", 100L), ("tok3", 66L),
      ("tok4", 50L), ("tok5", 40L)))
    // deferred: EXPLAIN shows the DeferredOp node, runs no sketch job
    val plan = spark.sql(s"EXPLAIN SELECT * FROM straw_topk('$base', 'w', 5)")
      .collect()(0).getString(0)
    assert(plan.contains("DeferredOp"), plan)
    // a too-flat distribution fails loudly: capacity 4 over 40-ish evenly
    // matched tokens cannot guarantee an exact top-4
    val flat = (1 to 500).map(i => s"t${i % 100}")
    flat.map(Tuple1(_)).toDF("w").write.format("strawboat")
      .mode("overwrite").save(s"$base/flat")
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM straw_topk('$base/flat', 'w', 4, 4)").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("not guaranteed exact") ||
      m.contains("retained no candidates")), msgs(e).mkString)
    // bad args are loud at analysis: unknown column, capacity < k
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM straw_topk('$base', 'nope', 5)").collect()
    }
    assert(msgs(e2).exists(_.contains("no column")), msgs(e2).mkString)
    val e3 = intercept[Exception] {
      spark.sql(s"SELECT * FROM straw_topk('$base', 'w', 10, 5)").collect()
    }
    assert(msgs(e3).exists(_.contains("must be >= k")), msgs(e3).mkString)
  }

  test("straw_kmeans clusters a vector table from SQL, deferred, loud args") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(13)
    val centers = Array.tabulate(4, 16)((c, i) => if (i / 4 == c) 10.0f else 0.0f)
    val vecs = (0L until 200L).map { id =>
      (id, centers((id % 4).toInt).map(x => x + (rnd.nextFloat() - 0.5f) * 0.5f))
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ext_kmeans").toString
    vecs.write.format("strawboat").mode("overwrite").save(dir)
    val rows = spark.sql(
      s"SELECT * FROM straw_kmeans('$dir', 16, 4, 3) ORDER BY cluster")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    // 4 clean clusters of 50; SSE non-increasing
    assert(rows.length == 4 && rows.forall(_._2 == 50L), rows.mkString(","))
    assert(rows.forall(r => r._4 <= r._3 + 1e-6), rows.mkString(","))
    // deferred: EXPLAIN runs no Lloyd pass
    val plan = spark.sql(s"EXPLAIN SELECT * FROM straw_kmeans('$dir', 16, 4)")
      .collect()(0).getString(0)
    assert(plan.contains("DeferredOp"), plan)
    // loud: missing columns, bad arity
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .flatMap(x => Option(x.getMessage)).toSeq
    val noCols = java.nio.file.Files.createTempDirectory("ext_kmeans2").toString
    Seq((1L, "x")).toDF("id", "s").write.format("strawboat")
      .mode("overwrite").save(noCols)
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_kmeans('$noCols', 16, 4)").collect())
    assert(msgs(e).exists(_.contains("must carry")), msgs(e).mkString)
  }

  test("straw_semdedup fits, drops, and writes the kept corpus from SQL, " +
      "deferred, SQL == Scala, loud args") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(17)
    val centers = Array.tabulate(4, 16)((c, i) => if (i / 4 == c) 10.0f else 0.0f)
    val base = (0L until 200L).map { id =>
      (id, centers((id % 4).toInt).map(x => x + (rnd.nextFloat() - 0.5f) * 0.5f))
    }
    // near-exact copies of rows 0 and 1 — must be dropped at any sane tau
    val copies = Seq(0L, 1L).map { src =>
      (200L + src, base(src.toInt)._2.map(x => x + 0.0001f))
    }
    val dir = java.nio.file.Files.createTempDirectory("ext_semdedup").toString
    val dest = dir + "_clean"
    (base ++ copies).toDF("vec_id", "embedding")
      .write.format("strawboat").mode("overwrite").save(dir)
    // deferred: EXPLAIN fits and writes NOTHING
    val plan = spark.sql(
      s"EXPLAIN SELECT * FROM straw_semdedup('$dir', '$dest', 16, 4, 0.9999)")
      .collect()(0).getString(0)
    assert(plan.contains("DeferredOp"), plan)
    assert(!new java.io.File(dest).exists, "EXPLAIN must not write the dest")
    val row = spark.sql(
      s"SELECT * FROM straw_semdedup('$dir', '$dest', 16, 4, 0.9999)")
      .collect()(0)
    assert(row.getLong(0) == 202L, row.toString)
    assert(row.getLong(1) >= 2L && row.getLong(1) == 202L - row.getLong(2))
    assert(row.getString(3).nonEmpty)
    // SQL route == the Scala route (same seed, same fit, same rule)
    val corpus = spark.read.format("strawboat").load(dir)
    val (dups, _) = graft.ops.Dedup.semanticDupIdsFit(
      spark, corpus, 16, 4, 0.9999)
    val wantKept = corpus.join(dups, Seq("vec_id"), "left_anti")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val gotKept = spark.read.format("strawboat").load(dest)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(gotKept == wantKept)
    assert(!gotKept.contains(200L) && !gotKept.contains(201L),
      "planted near-exact copies must be dropped")
    // one-shot replay guard: the same call replays the metrics
    val again = spark.sql(
      s"SELECT * FROM straw_semdedup('$dir', '$dest', 16, 4, 0.9999)")
      .collect()(0)
    assert(again.getLong(2) == row.getLong(2))
    // loud: tau out of range, dest == source, missing columns
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .flatMap(x => Option(x.getMessage)).toSeq
    val e1 = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_semdedup('$dir', '$dest', 16, 4, 1.5)").collect())
    assert(msgs(e1).exists(_.contains("tau")), msgs(e1).mkString)
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_semdedup('$dir', '$dir', 16, 4, 0.9)").collect())
    assert(msgs(e2).exists(_.contains("differ")), msgs(e2).mkString)
    val noCols = java.nio.file.Files.createTempDirectory("ext_semdedup2").toString
    Seq((1L, "x")).toDF("id", "s").write.format("strawboat")
      .mode("overwrite").save(noCols)
    val e3 = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_semdedup('$noCols', '${noCols}_c', 16, 4, 0.9)")
      .collect())
    assert(msgs(e3).exists(_.contains("must carry")), msgs(e3).mkString)
  }

  test("straw_semdedup_indexed reads the stored cells: lazy, SQL == Scala") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(23)
    val base = (0L until 150L).map { id =>
      val c = (id % 3).toInt
      (id, Array.tabulate(9)(i =>
        (if (i / 3 == c) 4.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.4f))
    }
    val copies = Seq(2L, 5L).map { src =>
      (150L + src, base(src.toInt)._2.map(x => x + 0.0002f))
    }
    val idxDir = java.nio.file.Files.createTempDirectory("ext_semidx").toString
    graft.ops.Ann.buildIvfIndex(spark,
      (base ++ copies).toDF("vec_id", "embedding"), idxDir, 9,
      nCentroids = 3, seed = 7)

    // lazy: EXPLAIN is a plan over the index scan, zero jobs
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val plan = spark.sql(
      s"EXPLAIN SELECT * FROM straw_semdedup_indexed('$idxDir', 0.999)")
      .collect()(0).getString(0)
    assert(plan.contains("BatchScan") || plan.contains("strawboat"), plan)
    assert(spark.sparkContext.statusTracker.getJobIdsForGroup(null).length ==
      before, "EXPLAIN must run no jobs")

    val sql = spark.sql(
      s"SELECT * FROM straw_semdedup_indexed('$idxDir', 0.999) ORDER BY vec_id")
      .collect().map(_.getLong(0)).toSeq
    val api = graft.ops.Dedup.semanticDupIdsIndexed(spark, idxDir, 0.999)
      .orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    assert(sql == api)
    assert(Seq(152L, 155L).forall(sql.contains), s"got $sql")

    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM straw_semdedup_indexed('$idxDir', 0.0)").collect())
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .flatMap(x => Option(x.getMessage)).toSeq
    assert(msgs(e).exists(_.contains("tau")), msgs(e).mkString)
  }

  test("hyperplane buckets reject non-integer config args with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT hyperplane_buckets(array(1.0D), 'abc', 4, 2, 42L)")
        .collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      (e.getCause != null && e.getCause.getMessage.contains("integer literal")))
  }
}
