package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The custom expressions must COMPILE under whole-stage codegen — with
  * fallback disabled, a janino error (e.g. colliding local names when two
  * instances share a scope) fails the query instead of silently dropping to
  * interpreted execution. Also pins eval/codegen agreement and kernel
  * consistency (pairwise Jaccard == set Jaccard of the hash arrays). */
class ExpressionCodegenSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.codegen.fallback", "false") // codegen errors are FATAL
      .config("spark.sql.ui.explainMode", "extended")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("multiple vector-kernel instances compile in one codegen scope") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (1L, Array.fill(8)(0.5f), Array.fill(8)(0.25f)),
      (2L, Array.fill(8)(-1.0f), Array.fill(8)(1.0f)))
      .toDF("id", "a", "b")
    val cents = Array.fill(3)(Array.fill(8)(0.1f))
    val out = df.select(
      VectorFunctions.cosine(spark, col("a"), col("b")).as("c1"),
      VectorFunctions.cosine(spark, col("b"), col("a")).as("c2"),
      VectorFunctions.hyperplaneBuckets(spark, col("a"), 8, 4, 2, 7).as("h1"),
      VectorFunctions.hyperplaneBuckets(spark, col("b"), 8, 4, 2, 7).as("h2"),
      VectorFunctions.nearestCells(spark, col("a"), cents, 2).as("n1"),
      VectorFunctions.nearestCells(spark, col("b"), cents, 2).as("n2"),
      VectorFunctions.norm(spark, col("a")).as("norm_a"),
      VectorFunctions.norm(spark, col("b")).as("norm_b"))
      .collect()
    assert(out.length == 2)
    assert(out.forall(r => math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
    // vector_norm matches the closed form on a constant vector
    val r1 = out(0)
    assert(math.abs(r1.getAs[Double]("norm_a") - math.sqrt(8 * 0.25)) < 1e-12)
  }

  test("cosine_int8 compiles under strict codegen; scales cancel exactly") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (Array[Byte](127, 0, -127, 64), Array[Byte](127, 0, -127, 64)),
      (Array[Byte](1, 2, 3, 4), Array[Byte](-1, -2, -3, -4)),
      (Array[Byte](0, 0, 0, 0), Array[Byte](5, 5, 5, 5)))
      .toDF("a", "b")
    val out = df.select(
      VectorFunctions.cosineInt8(spark, col("a"), col("b")).as("c"),
      VectorFunctions.cosineInt8(spark, col("b"), col("a")).as("cr"))
      .collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)   // identical vectors
    assert(math.abs(out(1).getDouble(0) + 1.0) < 1e-12)   // exact negation
    assert(out(2).getDouble(0) == 0.0)                    // zero vector
    assert(out.forall(r => r.getDouble(0) == r.getDouble(1))) // symmetric
    // quantization round-trip: int8 cosine tracks float cosine closely
    val vecs = Seq(
      (1L, Array.tabulate(16)(i => (math.sin(i + 1) / 2).toFloat)),
      (2L, Array.tabulate(16)(i => (math.cos(i * 2 + 1) / 3).toFloat)))
      .toDF("vec_id", "embedding")
    val q = graft.ops.Ann.quantizeInt8(vecs, "embedding")
    val both = q.as("x").join(q.as("y"),
      col("x.vec_id") < col("y.vec_id"))
      .select(
        VectorFunctions.cosine(spark, col("x.embedding"), col("y.embedding")).as("f"),
        VectorFunctions.cosineInt8(spark, col("x.qvec"), col("y.qvec")).as("q"))
      .collect()(0)
    assert(math.abs(both.getDouble(0) - both.getDouble(1)) < 0.02,
      s"float=${both.getDouble(0)} int8=${both.getDouble(1)}")
  }

  test("PQ kernels compile under strict codegen; ADC equals the closed form") {
    val ss = spark
    import ss.implicits._
    // dim 8, m 2, codes 4: hand-buildable codebooks
    val codebooks: Array[Array[Array[Float]]] = Array.tabulate(2, 4, 4) {
      (b, c, i) => (b + 1) * 0.1f * (c + 1) * (if (i % 2 == 0) 1f else -1f)
    }
    val vecs = Seq(
      (1L, Array.tabulate(8)(i => 0.3f * (i + 1))),
      (2L, Array.tabulate(8)(i => -0.2f * (8 - i))))
      .toDF("vec_id", "embedding")
    // encode + score through the kernels (codegen fallback disabled → any
    // janino failure is fatal)
    val coded = graft.ops.Ann.pqEncode(spark, vecs, "embedding", codebooks)
    val rows = coded.select(col("vec_id"),
        VectorFunctions.pqDotTable(spark, col("embedding"), codebooks).as("tab"),
        VectorFunctions.norm(spark, col("embedding")).as("qn"),
        col("pqcode"))
      .select(col("vec_id"), col("pqcode"), col("tab"), col("qn"),
        VectorFunctions.pqAdcCosine(spark, col("pqcode"), col("tab"),
          col("qn"), codebooks).as("adc"))
      .collect()
    rows.foreach { r =>
      val code = r.getSeq[Byte](1)
      val tab = r.getSeq[Double](2)
      val qn = r.getDouble(3)
      // closed form: Σ_b tab[b·4 + code_b] / (qn · sqrt(Σ ‖cb‖²))
      var dot = 0.0
      var ns = 0.0
      code.zipWithIndex.foreach { case (cb, b) =>
        dot += tab(b * 4 + (cb & 0xff))
        ns += codebooks(b)(cb & 0xff).map(x => x.toDouble * x).sum
      }
      val want = dot / (qn * math.sqrt(ns))
      assert(math.abs(r.getDouble(4) - want) < 1e-9,
        s"vec ${r.getLong(0)}: adc ${r.getDouble(4)} vs $want")
    }
    // the dot table matches a hand dot product per (block, code) for vec 1
    val vraw = Array.tabulate(8)(i => 0.3 * (i + 1))
    val tab1 = rows.find(_.getLong(0) == 1L).get.getSeq[Double](2)
    for (b <- 0 until 2; c <- 0 until 4) {
      val want = (0 until 4).map(i => vraw(b * 4 + i) * codebooks(b)(c)(i)).sum
      assert(math.abs(tab1(b * 4 + c) - want) < 1e-6, s"table[$b][$c]")
    }
    // encoding picks the ACTUAL nearest sub-centroid of the unit vector
    val v = Array.tabulate(8)(i => 0.3f * (i + 1))
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    val unit = v.map(x => (x / n).toFloat)
    val code0 = rows.find(_.getLong(0) == 1L).get.getSeq[Byte](1)
    for (b <- 0 until 2) {
      val block = unit.slice(b * 4, b * 4 + 4)
      val dists = codebooks(b).map(cb =>
        cb.zip(block).map { case (x, y) => (x - y) * (x - y) }.sum)
      assert(code0(b) == dists.zipWithIndex.minBy(p => (p._1, p._2))._2.toByte,
        s"block $b encoded ${code0(b)}, nearest ${dists.indexOf(dists.min)}")
    }
  }

  test("pq_residual_cosine compiles under strict codegen; equals closed form") {
    val ss = spark
    import ss.implicits._
    // dim 8, m 2, codes 4, 3 cells — every table small enough to hand-check
    val codebooks: Array[Array[Array[Float]]] = Array.tabulate(2, 4, 4) {
      (b, c, i) => 0.05f * (b + 1) * (c + 1) * (if (i % 3 == 0) -1f else 1f)
    }
    val centroids: Array[Array[Float]] = Array.tabulate(3, 8) {
      (c, i) => 0.2f * (c + 1) * (if (i % 2 == 0) 1f else 0.5f)
    }
    val rows = Seq(
      (Array[Byte](0, 3), 1, Array.tabulate(8)(i => 0.4f * (i + 1))),
      (Array[Byte](2, 1), 0, Array.tabulate(8)(i => -0.3f * (8 - i))),
      (Array[Byte](3, 2), 2, Array.tabulate(8)(i => 0.1f * (i % 3))))
      .toDF("code", "cell", "q")
    val got = rows.select(col("code"), col("cell"), col("q"),
        VectorFunctions.pqDotTable(spark, col("q"), codebooks).as("tab"),
        VectorFunctions.norm(spark, col("q")).as("qn"))
      .withColumn("qdotc",
        aggregate(zip_with(col("q"),
          element_at(typedLit(centroids.map(_.toSeq).toSeq), col("cell") + 1),
          (a, b) => a.cast("double") * b.cast("double")),
          lit(0.0), (acc, x) => acc + x))
      .select(col("code"), col("cell"), col("q"), col("qn"), col("qdotc"),
        VectorFunctions.pqResidualCosine(spark, col("code"), col("tab"),
          col("qn"), col("qdotc"), col("cell"), centroids, codebooks).as("res"))
      .collect()
    got.foreach { r =>
      val code = r.getAs[Array[Byte]](0)
      val cell = r.getInt(1)
      val q = r.getSeq[Float](2).map(_.toDouble)
      val qn = r.getDouble(3)
      // closed form straight from the definition: x̃ = c_cell + r̃
      val recon = Array.tabulate(8) { i =>
        centroids(cell)(i).toDouble + codebooks(i / 4)(code(i / 4) & 0xff)(i % 4)
      }
      val dot = q.zip(recon).map { case (a, b) => a * b }.sum
      val rn = math.sqrt(recon.map(x => x * x).sum)
      val want = dot / (qn * rn)
      assert(math.abs(r.getDouble(5) - want) < 1e-9,
        s"cell $cell: got ${r.getDouble(5)} want $want")
    }
  }

  test("vector_norm plan holds no interpreted higher-order function") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, Array.fill(16)(0.5f))).toDF("id", "emb")
    val q = df.select(round(graft.ops.Ann.l2Norm(col("emb")), 4).as("l2"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("aggregate(") && !plan.contains("lambdafunction"),
      s"interpreted HOF survives in plan:\n$plan")
    assert(q.collect()(0).getDouble(0) == 2.0) // sqrt(16 * 0.25)
  }

  test("text and media kernels compile together under strict codegen") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, "the quick brown fox", "jumped over it")).toDF("id", "t1", "t2")
    val out = df.select(
      TextHashFunctions.shingleHashes(spark, col("t1"), 3).as("s1"),
      TextHashFunctions.shingleHashes(spark, col("t2"), 3).as("s2"),
      TextHashFunctions.minHashSignature(spark, col("t1"), 3, 8).as("m1"),
      TextHashFunctions.minHashSignature(spark, col("t2"), 3, 8).as("m2"),
      TextHashFunctions.simHash64(spark, col("t1")).as("f1"),
      TextHashFunctions.simHash64(spark, col("t2")).as("f2"),
      TextHashFunctions.shingleJaccard(spark, col("t1"), col("t2"), 3).as("j"))
      .collect()
    assert(out.length == 1)
  }

  test("pairwise shingle jaccard equals set jaccard of the hash arrays") {
    val ss = spark
    import ss.implicits._
    val texts = Seq(
      ("abcdefgh", "abcdxyzh"), ("same text", "same text"), ("", "x"),
      ("日本語のテキスト", "日本語のテスト"), ("aaaa", "aaab"))
    val df = texts.toDF("t1", "t2")
    val rows = df.select(
      TextHashFunctions.shingleJaccard(spark, col("t1"), col("t2"), 3).as("j"),
      TextHashFunctions.shingleHashes(spark, col("t1"), 3).as("h1"),
      TextHashFunctions.shingleHashes(spark, col("t2"), 3).as("h2")).collect()
    rows.foreach { r =>
      val j = r.getDouble(0)
      val s1 = r.getSeq[Long](1).toSet
      val s2 = r.getSeq[Long](2).toSet
      val inter = (s1 & s2).size
      val union = (s1 | s2).size
      val expect = if (union == 0) 0.0 else inter.toDouble / union
      assert(math.abs(j - expect) < 1e-12, s"$j vs $expect")
    }
  }

  test("mat_vec compiles under strict codegen; equals the hand matmul") {
    val ss = spark
    import ss.implicits._
    val mtx = Array.tabulate(3, 4)((r, i) => 0.25f * (r + 1) * (i - 1))
    val out = Seq(
      (1L, Array.tabulate(4)(i => 0.5f * (i + 1))),
      (2L, Array.fill(4)(0.0f)))
      .toDF("id", "v")
      .select(col("id"), col("v"),
        VectorFunctions.matVec(spark, col("v"), mtx).as("mv"))
      .collect()
    out.foreach { row =>
      val v = row.getSeq[Float](1)
      val mv = row.getSeq[Float](2)
      assert(mv.length == 3)
      for (r <- 0 until 3) {
        val want = (0 until 4).map(i => mtx(r)(i).toDouble * v(i)).sum.toFloat
        assert(math.abs(mv(r) - want) < 1e-6, s"row $r: ${mv(r)} vs $want")
      }
    }
  }

  test("sign_pack / hamming_dist compile under strict codegen; specials " +
      "pinned (NaN/-0.0/Inf); eval == codegen") {
    val ss = spark
    import ss.implicits._
    VectorFunctions.register(spark)
    // specials: bit j = (x_j > 0.0) — NaN > 0 is FALSE (bit 0), -0.0 and
    // +0.0 are 0, +Inf is 1, -Inf is 0; subnormals follow their sign
    val specials = Array(Float.NaN, -0.0f, 0.0f, Float.PositiveInfinity,
      Float.NegativeInfinity, java.lang.Float.MIN_VALUE,
      -java.lang.Float.MIN_VALUE, 1.0f, -1.0f)
    val df = Seq((1L, specials)).toDF("id", "emb")
    // strict codegen (fallback disabled in this session): the select
    // compiles or the test dies
    val code = df.select(VectorFunctions.signPack(spark, col("emb")))
      .collect()(0).getAs[Array[Byte]](0)
    def model(xs: Array[Float]): Array[Byte] = {
      val out = new Array[Byte]((xs.length + 7) / 8)
      xs.zipWithIndex.foreach { case (x, i) =>
        if (x > 0) out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      }
      out
    }
    assert(code.toSeq == model(specials).toSeq,
      s"specials pack drifted: ${code.toSeq} vs ${model(specials).toSeq}")
    // eval (interpreted) == codegen: route the same input through a
    // non-codegen context (a literal fold via the expression's eval)
    val expr = SignPack(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(specials),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(expr.eval(null).asInstanceOf[Array[Byte]].toSeq == code.toSeq)
    // hamming over random packed codes equals the model, and the strict
    // codegen session compiled it
    val rnd = new scala.util.Random(3)
    val pairs = (0 until 50).map { i =>
      (i.toLong, Array.fill(19)(rnd.nextFloat() - 0.5f),
        Array.fill(19)(rnd.nextFloat() - 0.5f))
    }
    val got = pairs.toDF("id", "a", "b")
      .select(col("id"), VectorFunctions.hammingDist(spark,
        VectorFunctions.signPack(spark, col("a")),
        VectorFunctions.signPack(spark, col("b"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    pairs.foreach { case (id, a, b) =>
      val want = model(a).zip(model(b))
        .map { case (x, y) => java.lang.Integer.bitCount((x ^ y) & 0xff) }.sum
      assert(got(id) == want, s"row $id")
    }
  }

  test("ADC kernels REJECT wrong-width codes (column vs sidecar mismatch)") {
    val ss = spark
    import ss.implicits._
    val codebooks: Array[Array[Array[Float]]] = Array.tabulate(2, 4, 4) {
      (b, c, i) => 0.1f * (b + c + i + 1)
    }
    val centroids: Array[Array[Float]] = Array.tabulate(3, 8)((c, i) => 0.1f * (c + i))
    // a 3-byte code against m=2 codebooks: an index built with different m.
    // Scoring a prefix would return a plausible-but-wrong cosine — both
    // kernels must fail loudly instead (truncated codes the same way).
    val bad = Seq((Array[Byte](0, 1, 2), 1, Array.tabulate(8)(i => 0.2f * (i + 1))))
      .toDF("code", "cell", "q")
      .select(col("code"), col("cell"), col("q"),
        VectorFunctions.pqDotTable(spark, col("q"), codebooks).as("tab"),
        VectorFunctions.norm(spark, col("q")).as("qn"))
    val eAdc = intercept[Exception] {
      bad.select(VectorFunctions.pqAdcCosine(spark, col("code"), col("tab"),
        col("qn"), codebooks)).collect()
    }
    assert(exceptionChain(eAdc).exists(_.getMessage != null) &&
      exceptionChain(eAdc).exists(m => m.getMessage != null &&
        m.getMessage.contains("code width 3 != codebook m=2")), eAdc.toString)
    val eRes = intercept[Exception] {
      bad.withColumn("qdotc", lit(0.5))
        .select(VectorFunctions.pqResidualCosine(spark, col("code"), col("tab"),
          col("qn"), col("qdotc"), col("cell"), centroids, codebooks)).collect()
    }
    assert(exceptionChain(eRes).exists(m => m.getMessage != null &&
      m.getMessage.contains("code width 3 != codebook m=2")), eRes.toString)
    // exact width still scores (and the short/truncated case also throws)
    val ok = Seq((Array[Byte](0, 1), Array.tabulate(8)(i => 0.2f * (i + 1))))
      .toDF("code", "q")
      .select(VectorFunctions.pqAdcCosine(spark, col("code"),
        VectorFunctions.pqDotTable(spark, col("q"), codebooks),
        VectorFunctions.norm(spark, col("q")), codebooks)).collect()
    assert(ok.length == 1 && !ok(0).isNullAt(0))
    val eShort = intercept[Exception] {
      Seq((Array[Byte](0), Array.tabulate(8)(i => 0.2f * (i + 1))))
        .toDF("code", "q")
        .select(VectorFunctions.pqAdcCosine(spark, col("code"),
          VectorFunctions.pqDotTable(spark, col("q"), codebooks),
          VectorFunctions.norm(spark, col("q")), codebooks)).collect()
    }
    assert(exceptionChain(eShort).exists(m => m.getMessage != null &&
      m.getMessage.contains("code width 1 != codebook m=2")), eShort.toString)
  }

  private def exceptionChain(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
}
