package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** LLM-pipeline operator behavior: ANN tier recall vs the exact baseline. */
class OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("IVF and LSH top-k are subsets of the brute-force candidate space with sane recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Ann.bruteForceTopK(spark, emb, queries, 10))
    val ivf = pairs(Ann.ivfTopK(spark, emb, queries, 64, 10))
    val lsh = pairs(Ann.lshTopK(spark, emb, queries, 64, 10))
    assert(exact.nonEmpty)
    // approximate tiers return valid (query, neighbor) pairs only
    assert(ivf.forall { case (q, n) => q < 10 && n != q })
    assert(lsh.forall { case (q, n) => q < 10 && n != q })
    // IVF with 4-of-16 probes should recover a reasonable share of true top-k
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.2, s"IVF recall too low: $recall")
  }

  test("PQ: encode/ADC on clustered data; rerank recovers exact top-k; 256-code wrap") {
    val sp = spark; import sp.implicits._
    // 4 well-separated clusters: PQ ALONE must rank within-cluster
    // neighbors above cross-cluster ones (margins far exceed quantization
    // noise), unlike the near-random driver embeddings where only the
    // reranked tier is gated
    val rnd = new scala.util.Random(11)
    val centers = Array.tabulate(4, 16)((c, i) =>
      if (i / 4 == c) 1.0f else 0.0f)
    val vecs = (0L until 200L).map { id =>
      val c = (id % 4).toInt
      (id, centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 4)
    val pq = Ann.pqTopK(spark, vecs, queries, 16, 5, m = 4, nCodes = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // every PQ neighbor is from the query's own cluster
    pq.foreach { case (q, n) =>
      assert(n % 4 == q % 4, s"query $q got cross-cluster neighbor $n")
    }
    // rerank equals exact brute force when the shortlist covers the whole
    // cluster with margin (every true top-5 lives within-cluster; ADC
    // scores across these far-apart clusters sit near 0 vs ~0.95 within)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = rows(Ann.bruteForceTopK(spark, vecs, queries, 5))
    val rer = rows(Ann.pqTopKReranked(spark, vecs, queries, 16, 5, m = 4,
      nCodes = 16, shortlist = 60))
    assert(rer === exact, "PQ+rerank must equal brute force on clustered data")
    // determinism: same seed, same codes
    val c1 = Ann.pqEncode(spark, vecs, "embedding", Ann.fitPq(vecs, 16, 4, 16))
      .select("vec_id", "pqcode").collect().map(r =>
        r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val c2 = Ann.pqEncode(spark, vecs, "embedding", Ann.fitPq(vecs, 16, 4, 16))
      .select("vec_id", "pqcode").collect().map(r =>
        r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(c1 == c2)
    // 256-code books wrap code indexes through the signed byte without
    // ANSI overflow, and ADC still ranks within-cluster first
    val big = Ann.pqTopK(spark, vecs, queries, 16, 5, m = 4, nCodes = 256,
        sampleSize = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    big.foreach { case (q, n) => assert(n % 4 == q % 4, s"wrap: $q -> $n") }
    intercept[IllegalArgumentException](Ann.fitPq(vecs, 16, 5)) // m ∤ dim

    // persisted PQ index: probe equals the inline reranked path exactly
    // (same seed → same codebooks → same shortlist → same exact re-rank),
    // and the ADC scan's plan never reads the float column
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString + "/index"
    Ann.buildPqIndex(spark, vecs, dir, 16, m = 4, nCodes = 16)
    assert(new java.io.File(dir, "_pq_codebooks").exists())
    val idx = rows(Ann.pqTopKIndexed(spark, dir, queries, 5, shortlist = 60))
    assert(idx === exact, "indexed PQ probe must equal the inline rerank")
    val cbs = Ann.loadPqCodebooks(dir)
    assert(cbs.length == 4 && cbs(0).length == 16 && cbs(0)(0).length == 4)

    // IVF-PQ composition: hive layout by cell + both sidecars; a FULL
    // probe (nProbe = nCentroids) eliminates the coarse error, so with the
    // cluster-covering shortlist the result again equals brute force; a
    // pruned probe (nProbe=1 on 4 clean clusters) must too — each query's
    // own cluster is its nearest cell here
    val dir2 = java.nio.file.Files.createTempDirectory("ivfpq").toString + "/index"
    Ann.buildIvfPqIndex(spark, vecs, dir2, 16, nCentroids = 4, m = 4, nCodes = 16)
    val top2 = new java.io.File(dir2).listFiles
    assert(top2.exists(f => f.isDirectory && f.getName.startsWith("cent_id=")))
    assert(top2.exists(_.getName == "_ivf_centroids"))
    assert(top2.exists(_.getName == "_pq_codebooks"))
    val full = rows(Ann.ivfPqTopK(spark, dir2, queries, 5, nProbe = 4, shortlist = 60))
    assert(full === exact, "full-probe IVF-PQ must equal brute force here")
    val pruned = rows(Ann.ivfPqTopK(spark, dir2, queries, 5, nProbe = 1, shortlist = 60))
    assert(pruned === exact, "1-probe IVF-PQ on clean clusters must equal brute force")

    // append to the flat PQ index with frozen codebooks: probing the
    // grown index equals probing a fresh one built over the full corpus
    // with the same codebooks (same seed + same training sample, since
    // the hash-order sample of the ORIGINAL corpus is what both trained on)
    val more = (200L until 260L).map { id =>
      val c = (id % 4).toInt
      (id, centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }.toDF("vec_id", "embedding")
    Ann.appendToPqIndex(spark, more, dir)
    val allVecs = vecs.unionAll(more)
    val exactAll = rows(Ann.bruteForceTopK(spark, allVecs, queries, 5))
    val grown = rows(Ann.pqTopKIndexed(spark, dir, queries, 5, shortlist = 75))
    assert(grown === exactAll, "append-grown PQ index must rank the full corpus")
  }

  test("IVF-BQ: full probe equals flat BQ equals brute; pruned probe on " +
      "clean clusters; frozen-cell append; straw_knn dispatch") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(37)
    // sign-separable AND spatially separated clusters: lloyd lands one
    // coarse cell per cluster, sign codes separate exactly
    val centers = Array.tabulate(4, 16)((c, i) => if (i / 4 == c) 10.0f else -10.0f)
    def batch(ids: Range) = ids.map { id =>
      (id.toLong, centers(id % 4).map(x => x + (rnd.nextFloat() - 0.5f) * 0.5f))
    }.toDF("vec_id", "embedding")
    val vecs = batch(0 until 200)
    val queries = vecs.filter(col("vec_id") < 4)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = rows(Ann.bruteForceTopK(spark, vecs, queries, 5))

    val dir = java.nio.file.Files.createTempDirectory("ivfbq").toString + "/index"
    Ann.buildIvfBqIndex(spark, vecs, dir, 16, nCentroids = 4)
    val top = new java.io.File(dir).listFiles
    assert(top.exists(f => f.isDirectory && f.getName.startsWith("cent_id=")))
    assert(top.exists(_.getName == "_ivf_centroids"))
    assert(top.exists(_.getName == "_bq_meta"))
    // full probe == flat BQ == brute (shortlist covers the cluster)
    val full = rows(Ann.ivfBqTopK(spark, dir, queries, 5, nProbe = 4,
      shortlist = 50))
    assert(full === exact, "full-probe IVF-BQ must equal brute force here")
    // pruned probe: each query's own cluster is its nearest cell
    val pruned = rows(Ann.ivfBqTopK(spark, dir, queries, 5, nProbe = 1,
      shortlist = 50))
    assert(pruned === exact, "1-probe IVF-BQ on clean clusters must equal brute")

    // append with frozen cells: grown index ranks the full corpus
    val more = batch(200 until 260)
    Ann.appendToIvfBqIndex(spark, more, dir)
    val exactAll = rows(Ann.bruteForceTopK(spark, vecs.unionAll(more), queries, 5))
    val grown = rows(Ann.ivfBqTopK(spark, dir, queries, 5, nProbe = 4,
      shortlist = 65))
    assert(grown === exactAll, "append-grown IVF-BQ must rank the full corpus")
    // non-index dirs refuse loudly (missing-centroids IO error or the
    // missing-sidecar message, depending on which probe fires first)
    intercept[Exception] {
      Ann.ivfBqTopK(spark, dir + "/nope", queries, 3)
    }
  }

  test("kmeansFit: full-corpus Lloyd recovers planted clusters; SSE " +
      "monotone; deterministic across partitionings; empty cells keep init") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(41)
    val centers = Array.tabulate(4, 16)((c, i) => if (i / 4 == c) 10.0f else 0.0f)
    // ONE materialized dataset: the partitioning arms below must see the
    // same rows, not fresh draws from the shared generator
    val rows = (0L until 400L).map { id =>
      (id, centers((id % 4).toInt).map(x => x + (rnd.nextFloat() - 0.5f) * 0.5f))
    }
    def data(parts: Int) = rows.toDF("vec_id", "embedding").repartition(parts)
    val corpus = data(4)
    val (cents, sses) = Ann.kmeansFit(spark, corpus, 16, 4, iters = 4)
    // SSE non-increasing (Lloyd's invariant)
    sses.toSeq.sliding(2).foreach { w =>
      assert(w(1) <= w(0) + 1e-6, s"SSE must not increase: ${sses.mkString(",")}")
    }
    // each learned centroid sits on one planted center (blocks of ~10)
    val matched = centers.indices.map { c =>
      cents.exists { ct =>
        (0 until 16).forall { i =>
          val want = if (i / 4 == c) 10.0 else 0.0
          math.abs(ct(i) - want) < 1.0
        }
      }
    }
    assert(matched.forall(identity), s"centroids missed a planted center")
    // assignment groups exactly by planted cluster
    val assigns = Ann.kmeansAssign(spark, corpus, cents)
      .select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val byPlanted = assigns.groupBy(_._1 % 4).values.toSeq
    assert(byPlanted.forall(g => g.map(_._2).distinct.size == 1),
      "every planted cluster must map to one learned cluster")
    assert(assigns.map(_._2).distinct.length == 4)
    // determinism: the per-round 4-decimal rounding absorbs reorder drift
    val (cents1, _) = Ann.kmeansFit(spark, data(1), 16, 4, iters = 4)
    val (cents7, _) = Ann.kmeansFit(spark, data(7), 16, 4, iters = 4)
    assert(cents1.map(_.toSeq).toSeq == cents7.map(_.toSeq).toSeq,
      "centroids must be identical across partitionings")
    // k > distinct clusters: the empty cells keep their init centroid and
    // nothing crashes; the 4 real clusters still separate
    val (cents8, sses8) = Ann.kmeansFit(spark, corpus, 16, 8, iters = 3)
    assert(cents8.length == 8 && sses8.forall(_ >= 0))
    intercept[IllegalArgumentException](Ann.kmeansFit(spark, corpus, 16, 0))
  }

  test("BQ index maintenance: clustered compaction of an appended index " +
      "preserves probe results and the sidecar") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(31)
    val centers = Array.tabulate(4, 16)((c, i) => if (i / 4 == c) 1.0f else -1.0f)
    def batch(ids: Range) = ids.map { id =>
      (id.toLong, centers(id % 4).map(x => x + (rnd.nextFloat() - 0.5f) * 0.4f))
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("bqcompact").toString + "/index"
    Ann.buildBqIndex(spark, batch(0 until 200), dir, 16)
    Ann.appendToBqIndex(spark, batch(200 until 240), dir)
    Ann.appendToBqIndex(spark, batch(240 until 280), dir)
    val queries = batch(0 until 4)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long, Double)] =
      df.select("query_id", "rank", "neighbor_id", "cosine").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
    val before = rows(Ann.bqTopKIndexed(spark, dir, queries, 5, shortlist = 70))
    val filesBefore = graft.spark.StrawIO.listFiles(dir).size
    assert(filesBefore >= 3, s"expected a fragmented index, got $filesBefore files")
    val res = graft.spark.StrawCompaction.compact(spark, dir,
      clusterBy = Seq("vec_id"))
    assert(res.inputFiles > 0, "nothing compacted")
    assert(graft.spark.StrawIO.listFiles(dir).size < filesBefore)
    assert(new java.io.File(dir, "_bq_meta").exists(),
      "compaction must not touch the _bq_meta sidecar")
    assert(Ann.loadBqDim(dir).contains(16))
    val after = rows(Ann.bqTopKIndexed(spark, dir, queries, 5, shortlist = 70))
    assert(after == before, "compaction changed BQ probe results")
  }

  test("PQ index maintenance: clustered compaction of an appended index " +
      "preserves probe results, sidecars, and point-read page pruning") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(17)
    // wide separation (the proven 4-cell shape of the persisted-IVF spec):
    // lloyd reliably lands one coarse cell per cluster, so the pruning
    // assertion below has real margin
    val centers = Array.tabulate(4, 16)((c, i) => if (i / 4 == c) 10.0f else 0.0f)
    def batch(ids: Range) = ids.map { id =>
      (id.toLong, centers(id % 4).map(x => x + (rnd.nextFloat() - 0.5f) * 0.3f))
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("pqcompact").toString + "/index"
    Ann.buildPqIndex(spark, batch(0 until 200), dir, 16, m = 4, nCodes = 16)
    // three appends -> fragmented index, overlapping per-file vec_id ranges
    Ann.appendToPqIndex(spark, batch(200 until 240), dir)
    Ann.appendToPqIndex(spark, batch(240 until 280), dir)
    Ann.appendToPqIndex(spark, batch(280 until 320), dir)
    val queries = batch(0 until 4)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long, Double)] =
      df.select("query_id", "rank", "neighbor_id", "cosine").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
    val before = rows(Ann.pqTopKIndexed(spark, dir, queries, 5, shortlist = 80))
    val filesBefore = graft.spark.StrawIO.listFiles(dir).size
    assert(filesBefore >= 4, s"expected a fragmented index, got $filesBefore files")

    // clustered compaction: vec_id-sorted rewrite keeps the point-read
    // zone maps PRUNABLE (arrival-order merges would overlap every page)
    val res = graft.spark.StrawCompaction.compact(spark, dir,
      clusterBy = Seq("vec_id"))
    assert(res.inputFiles > 0, "nothing compacted")
    val filesAfter = graft.spark.StrawIO.listFiles(dir).size
    assert(filesAfter < filesBefore, s"$filesBefore -> $filesAfter files")
    assert(new java.io.File(dir, "_pq_codebooks").exists(),
      "compaction must not touch the codebook sidecar")
    val after = rows(Ann.pqTopKIndexed(spark, dir, queries, 5, shortlist = 80))
    assert(after == before, s"compaction changed probe results")

    // the rewritten files are vec_id-sorted WITHIN: every page's zone map
    // is disjoint-ascending, so a pushed point read keeps pruning
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".strb")).foreach { f =>
      val in = new graft.format.LocalFileInput(f.getAbsolutePath)
      try {
        val ftr = graft.format.StrawFileReader.readFooter(in)
        val leaves = graft.format.LeafLayout.starts(ftr.schema)
        val vi = ftr.schema.fieldIndex("vec_id")
        val pages = ftr.columns(leaves(vi)).pages
        pages.toSeq.sliding(2).foreach {
          case Seq(a, b) =>
            assert(a.max <= b.min,
              s"${f.getName}: vec_id pages overlap after clustered compaction " +
                s"(${a.min}..${a.max} then ${b.min}..${b.max})")
          case _ =>
        }
      } finally in.close()
    }

    // IVF-PQ: a fresh index (one file per cell, nothing small enough to
    // merge across cells — rewrites never cross partition directories) is
    // a no-op, and the pruned probe still skips unprobed cells' footers
    val dir2 = java.nio.file.Files.createTempDirectory("ivfpqcompact").toString + "/index"
    val base2 = batch(0 until 1200) // batch() consumes the shared rnd:
    // materialize each frame ONCE and reuse (re-calling with the same
    // range would yield different jitter)
    Ann.buildIvfPqIndex(spark, base2, dir2, 16, nCentroids = 4,
      m = 4, nCodes = 16)
    val b2 = rows(Ann.ivfPqTopK(spark, dir2, queries, 5, nProbe = 4, shortlist = 80))
    graft.spark.StrawCompaction.compact(spark, dir2, clusterBy = Seq("vec_id"))
    assert(new java.io.File(dir2, "_pq_codebooks").exists())
    assert(new java.io.File(dir2, "_ivf_centroids").exists())
    val a2 = rows(Ann.ivfPqTopK(spark, dir2, queries, 5, nProbe = 4, shortlist = 80))
    assert(a2 == b2, "IVF-PQ results changed across compaction")
    val totalFiles = graft.spark.StrawIO.listFiles(dir2).size
    assert(totalFiles >= 4, s"expected one file per cell, got $totalFiles")
    graft.spark.FooterCache.clear()
    val c0 = graft.spark.FooterCache.loads.get()
    Ann.ivfPqTopK(spark, dir2, queries.limit(1), 3, nProbe = 1).collect()
    val loads = graft.spark.FooterCache.loads.get() - c0
    assert(loads < totalFiles,
      s"pruned probe loaded $loads footers of $totalFiles files")

    // IVF-PQ append with FROZEN centroids + codebooks: the grown index
    // ranks the full corpus exactly with a covering shortlist (frozen-fit
    // contract of appendToIvfIndex/appendToPqIndex), cells stay hive-laid
    val extra2 = batch(1200 until 1360)
    Ann.appendToIvfPqIndex(spark, extra2, dir2)
    val exactAll = rows(Ann.bruteForceTopK(spark, base2.unionAll(extra2), queries, 5))
    val grown = rows(Ann.ivfPqTopK(spark, dir2, queries, 5, nProbe = 4,
      shortlist = 400))
    assert(grown == exactAll, "append-grown IVF-PQ must rank the full corpus")
    assert(new java.io.File(dir2).listFiles
      .count(f => f.isDirectory && f.getName.startsWith("cent_id=")) >= 4)
    // and a clustered compaction of the now-fragmented cells preserves it
    val res2 = graft.spark.StrawCompaction.compact(spark, dir2,
      clusterBy = Seq("vec_id"))
    assert(res2.inputFiles > 0, "append should have fragmented the cells")
    val grown2 = rows(Ann.ivfPqTopK(spark, dir2, queries, 5, nProbe = 4,
      shortlist = 400))
    assert(grown2 == grown, "compaction changed the grown index's results")
  }

  test("PQ rerank wide-batch path: >1000 candidate ids fall back to the " +
      "pushed range filter and stay exact") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(23)
    val centers = Array.tabulate(4, 16)((c, i) => if (i / 4 == c) 10.0f else 0.0f)
    val vecs = (0L until 1600L).map { id =>
      (id, centers((id % 4).toInt).map(x => x + (rnd.nextFloat() - 0.5f) * 0.3f))
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("pqwide").toString + "/index"
    Ann.buildPqIndex(spark, vecs, dir, 16, m = 4, nCodes = 16)
    // 8 queries x shortlist 420 -> up to 3,360 candidate ids, far past the
    // 1000-value In enumeration cap: the float fetch pushes the [min,max]
    // range instead, and the rerank join restores exactness — covering
    // shortlists (each cluster is 400 vectors) mean the result must equal
    // brute force EXACTLY, which a prefix-truncated or broken wide fetch
    // could not produce
    val queries = vecs.filter(col("vec_id") < 8)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = rows(Ann.bruteForceTopK(spark, vecs, queries, 5))
    val wide = rows(Ann.pqTopKIndexed(spark, dir, queries, 5, shortlist = 420))
    assert(wide === exact, "wide-batch rerank must equal brute force")
  }

  test("OPQ: rotation is orthogonal, preserves cosine; rotated indexes " +
      "stay exact with covering shortlists; appends inherit the rotation") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(13)
    val centers = Array.tabulate(4, 16)((c, i) => if (i / 4 == c) 1.0f else 0.0f)
    val vecs = (0L until 200L).map { id =>
      val c = (id % 4).toInt
      (id, centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 4)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = rows(Ann.bruteForceTopK(spark, vecs, queries, 5))

    // the learned rotation is orthogonal: R·Rᵀ = I (its rows are the
    // covariance eigenvectors), so cosine is preserved exactly
    val r = Ann.fitOpqRotation(vecs, 16, 4, sampleSize = 200)
    assert(r.length == 16 && r.forall(_.length == 16))
    for (i <- 0 until 16; j <- 0 until 16) {
      val dot = (0 until 16).map(k => r(i)(k).toDouble * r(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-4, s"RRt[$i][$j] = $dot")
    }

    // OPQ-built flat PQ index: sidecar lands, probe stays EXACT with the
    // cluster-covering shortlist (rotation changes the block structure,
    // never the metric), and determinism holds
    val dir = java.nio.file.Files.createTempDirectory("opqidx").toString + "/index"
    Ann.buildPqIndex(spark, vecs, dir, 16, m = 4, nCodes = 16, opq = true)
    assert(new java.io.File(dir, "_opq_rotation").exists())
    val rBack = Ann.loadOpqRotation(dir).get
    assert(rBack.map(_.toSeq).toSeq == r.map(_.toSeq).toSeq,
      "rotation sidecar must round-trip exactly")
    val idx = rows(Ann.pqTopKIndexed(spark, dir, queries, 5, shortlist = 60))
    assert(idx === exact, "OPQ-indexed probe must equal brute force here")

    // appends encode through the PERSISTED rotation: the grown index
    // ranks the full corpus exactly (a rotation-less append would score
    // garbage — codes in one basis, queries in another)
    val more = (200L until 260L).map { id =>
      val c = (id % 4).toInt
      (id, centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }.toDF("vec_id", "embedding")
    Ann.appendToPqIndex(spark, more, dir)
    val allVecs = vecs.unionAll(more)
    val exactAll = rows(Ann.bruteForceTopK(spark, allVecs, queries, 5))
    val grown = rows(Ann.pqTopKIndexed(spark, dir, queries, 5, shortlist = 75))
    assert(grown === exactAll, "OPQ append-grown index must rank the full corpus")

    // OPQ IVF-PQ: the whole chain (centroids, residuals, codebooks) lives
    // in the rotated space; full probe + covering shortlist stays exact
    val dir2 = java.nio.file.Files.createTempDirectory("opqivf").toString + "/index"
    Ann.buildIvfPqIndex(spark, vecs, dir2, 16, nCentroids = 4, m = 4,
      nCodes = 16, opq = true)
    assert(new java.io.File(dir2, "_opq_rotation").exists())
    val full = rows(Ann.ivfPqTopK(spark, dir2, queries, 5, nProbe = 4, shortlist = 60))
    assert(full === exact, "full-probe OPQ IVF-PQ must equal brute force here")
  }

  test("BQ: sign codes match plain-Scala packing; Hamming kernel; width guard") {
    val sp = spark; import sp.implicits._
    // odd dim (10 -> 2 bytes), mixed signs, exact zero (bit stays 0)
    val vecs = Seq(
      (1L, Array(1.0f, -2.0f, 0.0f, 3.5f, -0.1f, 0.2f, -7f, 8f, 9f, -1f)),
      (2L, Array(-1.0f, 2.0f, 1.0f, -3.5f, 0.1f, 0.2f, 7f, -8f, 9f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Ann.bqEncode(spark, vecs).select("vec_id", "bqcode").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    def pack(xs: Array[Float]): Array[Byte] = {
      val out = new Array[Byte]((xs.length + 7) / 8)
      xs.zipWithIndex.foreach { case (x, i) =>
        if (x > 0) out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      }
      out
    }
    val v1 = Array(1.0f, -2.0f, 0.0f, 3.5f, -0.1f, 0.2f, -7f, 8f, 9f, -1f)
    val v2 = Array(-1.0f, 2.0f, 1.0f, -3.5f, 0.1f, 0.2f, 7f, -8f, 9f, 1f)
    assert(got(1L).toSeq == pack(v1).toSeq && got(2L).toSeq == pack(v2).toSeq)
    // Hamming == plain popcount of the packed codes
    val ham = vecs.as("a").join(vecs.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(graft.functions.VectorFunctions.hammingDist(spark,
        graft.functions.VectorFunctions.signPack(spark, col("a.embedding")),
        graft.functions.VectorFunctions.signPack(spark, col("b.embedding"))))
      .collect()(0).getInt(0)
    val want = pack(v1).zip(pack(v2))
      .map { case (x, y) => java.lang.Integer.bitCount((x ^ y) & 0xff) }.sum
    assert(ham == want && ham == 8) // dims 0,1,2,3,6,7,9 flip + dim 4; dim 2: 0->1 flips
    // doubles work through the same kernel
    val d = Seq((1L, Array(1.0, -1.0))).toDF("vec_id", "embedding")
    assert(Ann.bqEncode(spark, d).select("bqcode").collect()(0)
      .getAs[Array[Byte]](0).toSeq == Seq(1.toByte))
    // mismatched widths fail loudly, never score a prefix
    val e = intercept[Exception] {
      Seq((Array[Byte](1, 2), Array[Byte](1))).toDF("a", "b")
        .select(graft.functions.VectorFunctions.hammingDist(spark,
          col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("code widths differ")), msgs(e).mkString)
  }

  test("BQ shortlist + exact rerank equals brute force; persisted/appended/knn") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(23)
    // BQ-friendly clusters: +1 in the cluster's block, -1 elsewhere, so
    // sign codes separate clusters exactly (|x|=1 >> noise 0.2: no flips)
    // — within-cluster Hamming 0, cross-cluster 8
    val centers = Array.tabulate(4, 16)((c, i) => if (i / 4 == c) 1.0f else -1.0f)
    def batch(ids: Range) = ids.map { id =>
      (id.toLong, centers(id % 4).map(x => x + (rnd.nextFloat() - 0.5f) * 0.4f))
    }.toDF("vec_id", "embedding")
    val vecs = batch(0 until 200)
    val queries = vecs.filter(col("vec_id") < 4)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = rows(Ann.bruteForceTopK(spark, vecs, queries, 5))
    // the cluster holds 50 vectors; a 50-wide shortlist covers it
    val direct = rows(Ann.bqTopK(spark, vecs, queries, 5, shortlist = 50))
    assert(direct === exact, "BQ+rerank must equal brute force on sign-separable clusters")

    // persisted index: sidecar, equality with the direct path
    val dir = java.nio.file.Files.createTempDirectory("bqidx").toString + "/index"
    Ann.buildBqIndex(spark, vecs, dir, 16)
    assert(new java.io.File(dir, "_bq_meta").exists())
    assert(Ann.loadBqDim(dir).contains(16))
    val idx = rows(Ann.bqTopKIndexed(spark, dir, queries, 5, shortlist = 50))
    assert(idx === exact, "indexed BQ probe must equal the direct path")

    // append (no frozen state): grown index ranks the full corpus
    val more = batch(200 until 260)
    Ann.appendToBqIndex(spark, more, dir)
    val exactAll = rows(Ann.bruteForceTopK(spark, vecs.unionAll(more), queries, 5))
    val grown = rows(Ann.bqTopKIndexed(spark, dir, queries, 5, shortlist = 65))
    assert(grown === exactAll, "append-grown BQ index must rank the full corpus")

    // wrong-dim query fails loudly at the float stage (byte-padded codes
    // alone cannot distinguish dims within one byte)
    val bad = Seq((999L, Array.fill(8)(1.0f))).toDF("vec_id", "embedding")
    intercept[Exception] {
      Ann.bqTopKIndexed(spark, dir, bad, 3).collect()
    }
    // not-an-index dirs refuse
    intercept[IllegalArgumentException] {
      Ann.bqTopKIndexed(spark, dir + "/nope", queries, 3)
    }
  }

  test("IVF with nProbe = nCentroids equals brute force exactly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
      df.select("query_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = rows(Ann.bruteForceTopK(spark, emb, queries, 5))
    val full = rows(Ann.ivfTopK(spark, emb, queries, 64, 5, nCentroids = 8, nProbe = 8))
    assert(exact.nonEmpty)
    assert(full === exact)
  }

  test("IVF recall survives a corpus SORTED by cluster (randomized quantizer sample)") {
    // 3000 vectors in 6 well-separated clusters, physically ordered by
    // cluster — the layout where a first-rows quantizer sample (limit(n))
    // would only ever see the first ~2 clusters and recall collapses for
    // queries in the others. The seeded hash-order sample must keep recall
    // high for queries drawn from the LAST cluster.
    val ss = spark
    import ss.implicits._
    val dim = 16
    val rnd = new scala.util.Random(42)
    val centers = Array.tabulate(6) { c =>
      Array.tabulate(dim)(i => if (i % 6 == c) 10.0f else 0.0f)
    }
    val rows = (0 until 3000).map { j =>
      val c = j / 500 // sorted: cluster 0 first, cluster 5 last
      val v = Array.tabulate(dim)(i => centers(c)(i) + rnd.nextGaussian().toFloat * 0.3f)
      (j.toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding").coalesce(1) // one partition, cluster order
    val queries = emb.filter(col("vec_id") >= 2990) // all from the last cluster
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Ann.bruteForceTopK(spark, emb, queries, 5))
    val ivf = pairs(Ann.ivfTopK(spark, emb, queries, dim, 5,
      nCentroids = 6, nProbe = 2, sampleSize = 1024))
    assert(exact.nonEmpty)
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall on cluster-sorted corpus: $recall")
  }

  test("persisted IVF index: hive layout, pruned probes, full-probe equals brute force") {
    val ss = spark
    import ss.implicits._
    val dim = 16
    val rnd = new scala.util.Random(7)
    val centers = Array.tabulate(4)(c => Array.tabulate(dim)(i => if (i % 4 == c) 10.0f else 0.0f))
    val rows = (0 until 1200).map { j =>
      val c = j % 4
      (j.toLong, Array.tabulate(dim)(i => centers(c)(i) + rnd.nextGaussian().toFloat * 0.3f))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString + "/index"
    Ann.buildIvfIndex(spark, emb, dir, dim, nCentroids = 4, seed = 7)
    // index layout: one directory per cell + the centroid sidecar
    val top = new java.io.File(dir).listFiles
    assert(top.exists(f => f.isDirectory && f.getName.startsWith("cent_id=")))
    assert(top.exists(_.getName == "_ivf_centroids"))
    val queries = emb.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // full probe == brute force exactly
    val exact = pairs(Ann.bruteForceTopK(spark, emb, queries, 5))
    val full = pairs(Ann.ivfTopKIndexed(spark, dir, queries, 5, nProbe = 4))
    assert(full == exact)
    // partial probe keeps recall on the clustered corpus
    val one = pairs(Ann.ivfTopKIndexed(spark, dir, queries, 5, nProbe = 1))
    assert(one.intersect(exact).size.toDouble / exact.size >= 0.9)
    // and it PRUNES: a single-cell probe must not read every index file's
    // footer (directory pruning fires before footer IO; one extra footer
    // resolves the schema)
    val totalFiles = graft.spark.StrawIO.listFiles(dir).size
    assert(totalFiles >= 4)
    graft.spark.FooterCache.clear()
    val before = graft.spark.FooterCache.loads.get()
    Ann.ivfTopKIndexed(spark, dir, emb.filter(col("vec_id") === 0L), 3, nProbe = 1)
      .collect()
    val loads = graft.spark.FooterCache.loads.get() - before
    assert(loads < totalFiles, s"probe loaded $loads footers of $totalFiles files")
  }

  test("IVF reindex restores recall after append drift; cell skew is reportable") {
    val ss = spark
    import ss.implicits._
    graft.spark.StrawSqlSurface.register(spark)
    val dim = 16
    val rnd = new scala.util.Random(11)
    def noisy(center: Array[Float]): Array[Float] =
      Array.tabulate(dim)(i => center(i) + rnd.nextGaussian().toFloat * 0.5f)
    // initial distribution: 4 tight one-hot-ish clusters
    val aCenters = Array.tabulate(4)(c =>
      Array.tabulate(dim)(i => if (i % 4 == c) 10.0f else 0.0f))
    val initial = (0 until 1200).map(j => (j.toLong, noisy(aCenters(j % 4)))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfreidx").toString + "/index"
    Ann.buildIvfIndex(spark, initial, dir, dim, nCentroids = 4, seed = 7)
    // drift: 5× the corpus appears from NEW clusters planted exactly on
    // the bisectors between pairs of original centroids — the frozen
    // quantizer splits each new cluster ~50/50 across two cells, so a
    // 1-probe query misses about half its true neighbors
    val bCenters = Array.tabulate(4) { c =>
      val x = aCenters(c); val y = aCenters((c + 1) % 4)
      Array.tabulate(dim)(i => (x(i) + y(i)) / 2)
    }
    val appended = (0 until 6000)
      .map(j => (10000L + j, noisy(bCenters(j % 4)))).toDF("vec_id", "embedding")
    Ann.appendToIvfIndex(spark, appended, dir)
    // skew is visible with zero data IO: the appended mass concentrated
    // into the original cells' rows
    val cells = spark.sql(s"SELECT cent_id, rows FROM straw_ivf_detail('$dir')")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cells.values.sum == 7200, s"cell rows: $cells")
    val corpus = initial.unionAll(appended)
    val queries = appended.filter(col("vec_id") < 10005L)
    def recall(got: org.apache.spark.sql.DataFrame,
        exact: Set[(Long, Long)]): Double = {
      val g = got.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      g.intersect(exact).size.toDouble / exact.size
    }
    val exact = Ann.bruteForceTopK(spark, corpus, queries, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = recall(Ann.ivfTopKIndexed(spark, dir, queries, 5, nProbe = 1), exact)
    assert(before < 0.9, f"drifted index unexpectedly healthy: recall=$before%.2f")
    // reindex: retrain on the CURRENT contents, atomic rewrite
    Ann.reindexIvf(spark, dir, dim, nCentroids = 8, seed = 7)
    val after = recall(Ann.ivfTopKIndexed(spark, dir, queries, 5, nProbe = 1), exact)
    assert(after >= 0.9, f"reindex did not restore recall: $before%.2f -> $after%.2f")
    // the index remains a well-formed table: full probe == brute force
    val full = Ann.ivfTopKIndexed(spark, dir, queries, 5, nProbe = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact)
  }

  test("IVF probes=1 assignment is expression-only: no Exchange, no row blowup") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Array.fill(4)(Array.fill(64)(scala.util.Random.nextGaussian().toFloat))
    val assigned = Ann.assignCells(spark, emb, cents, 1)
    assert(assigned.count() === emb.count())
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment plan shuffles:\n$plan")
    // every row got a valid cell
    assert(assigned.filter(col("cent_id") < 0 || col("cent_id") >= 4).count() === 0)
  }

  test("banded LSH near-dup recall >= 0.9 vs the exact tier (sf0.01)") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Ann.exactNearDupPairs(spark, emb, 0.45))
    // short bands (4 planes) OR'd 16× trade per-band precision for recall;
    // bucket cardinality (parallelism) stays configurable via nPlanes
    val lsh = pairSet(Ann.lshNearDupPairs(spark, emb, 64, 0.45,
      nPlanes = 4, nBands = 16))
    assert(exact.nonEmpty)
    assert(lsh.subsetOf(exact), "LSH pairs must be a subset of exact pairs")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall too low: $recall (${lsh.size}/${exact.size})")
  }

  test("duplicateSpans == plain-Scala brute force; stripSpans drops exactly " +
      "the span tokens, case preserved") {
    val ss = spark
    import ss.implicits._
    // shared 4-token boilerplate inside otherwise-unrelated docs; doc 4
    // self-repeats a phrase (must NOT count toward document frequency);
    // docs 5/6 share an ADJACENT pair of 3-grams (island must merge)
    val docs = Seq(
      (1L, "Alpha beta THE QUICK brown fox gamma delta"),
      (2L, "omega THE quick BROWN fox epsilon zeta eta"),
      (3L, "totally unrelated words here nothing shared at all"),
      (4L, "ping pong ping pong ping pong ping pong solo"),
      (5L, "xx one two three four five six yy"),
      (6L, "zz one two three four five six qq")
    ).toDF("doc_id", "text")
    val n = 3
    def brute(minDf: Int): Set[(Long, Long, Long)] = {
      val toks = docs.collect().map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq).toMap
      val gramDocs = toks.toSeq.flatMap { case (id, ts) =>
        ts.sliding(n).filter(_.size == n).map(g => (g.mkString(" "), id))
      }.distinct.groupBy(_._1).map { case (g, xs) => g -> xs.size }
      toks.toSeq.flatMap { case (id, ts) =>
        val starts = ts.sliding(n).zipWithIndex
          .filter { case (g, _) => g.size == n && gramDocs(g.mkString(" ")) >= minDf }
          .map(_._2.toLong).toSeq.sorted
        // merge starts into maximal islands (chain while <= prev + n)
        val spans = starts.foldLeft(List.empty[(Long, Long)]) {
          case (acc, s) => acc match {
            case (a, b) :: rest if s <= b => (a, math.max(b, s + n)) :: rest
            case _ => (s, s + n) :: acc
          }
        }.reverse
        spans.map { case (a, b) => (id, a, b) }
      }.toSet
    }
    val got = Dedup.duplicateSpans(docs, "doc_id", "text", n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute(2), s"got $got\nexp ${brute(2)}")
    // the known fixture facts, asserted directly: docs 1/2 share
    // "the quick brown fox" -> two overlapping 3-grams merge into one
    // 4-token span per doc; doc 4's self-repeat produces NOTHING; docs
    // 5/6's shared 6-token run merges 4 overlapping grams
    assert(got.exists { case (d, a, b) => d == 1L && b - a == 4 })
    assert(got.exists { case (d, a, b) => d == 2L && b - a == 4 })
    assert(!got.exists(_._1 == 4L), "self-repeats must not clear minDf")
    assert(got.count(t => t._1 == 5L || t._1 == 6L) == 2 &&
      got.filter(t => t._1 == 5L).forall(t => t._3 - t._2 == 6))
    // strip: doc 3 untouched (no spans row at all), span tokens removed,
    // surviving tokens keep ORIGINAL case and order
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", n)
    val cleaned = Dedup.stripSpans(docs, "doc_id", "text", spans)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(3L) == "totally unrelated words here nothing shared at all")
    assert(cleaned(4L) == "ping pong ping pong ping pong ping pong solo")
    assert(cleaned(1L) == "Alpha beta gamma delta", cleaned(1L))
    assert(cleaned(2L) == "omega epsilon zeta eta", cleaned(2L))
    assert(cleaned(5L) == "xx yy" && cleaned(6L) == "zz qq")
    // token-count identity: after == before - sum(span lengths) (merged
    // islands are disjoint by construction)
    val before = docs.collect().map(r => r.getLong(0) ->
      r.getString(1).split("\\s+").count(_.nonEmpty)).toMap
    val lens = spans.collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(r => r.getLong(2) - r.getLong(1)).sum }
    cleaned.foreach { case (d, txt) =>
      val after = txt.split("\\s+").count(_.nonEmpty)
      assert(after == before(d) - lens.getOrElse(d, 0L), s"doc $d")
    }
    // null/empty/short texts: no grams, no spans, strip passes them
    // through untouched (incl. null)
    val edge = Seq((10L, null.asInstanceOf[String]), (11L, ""),
      (12L, "one two"), (13L, "shared run here zz"),
      (14L, "shared run here qq")).toDF("doc_id", "text")
    val eSpans = Dedup.duplicateSpans(edge, "doc_id", "text", n)
    val eRows = eSpans.collect().map(_.getLong(0)).toSet
    assert(eRows == Set(13L, 14L), s"edge spans: $eRows")
    val eClean = Dedup.stripSpans(edge, "doc_id", "text", eSpans)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(eClean(10L).isEmpty && eClean(11L).contains("") &&
      eClean(12L).contains("one two"))
    assert(eClean(13L).contains("zz") && eClean(14L).contains("qq"))
  }

  test("ngram stop-gram cutoff: identity when unreached, prunes ubiquitous grams when hit") {
    val ss = spark
    import ss.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // cutoff high enough that no gram reaches it → bit-identical output
    val base = pairs(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8))
    val withGuard = pairs(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
      maxDocFreqFraction = 0.999))
    assert(withGuard === base)

    // skew shape: every doc shares one ubiquitous gram ("zzz"); two docs are
    // real near-dups. The guard must keep the real pair and collapse the
    // stop-gram fan-out (candidate rows through the join shrink).
    val skewed = (0 until 50).map(i => (i.toLong, s"zzz unique content $i $i $i")) ++
      Seq((100L, "zzz the quick brown fox jumps"), (101L, "zzz the quick brown fox jumps"))
    val sdf = skewed.toDF("doc_id", "text")
    val guarded = pairs(Dedup.ngramJaccardPairs(sdf, "doc_id", "text", 3, 0.8,
      maxDocFreqFraction = 0.5))
    assert(guarded.exists { case (a, b, _) => a == 100L && b == 101L })
  }

  test("pairwise shingle-jaccard expression equals the relational verify") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // relational formulation over the hashed-shingle relation
    val sh = Dedup.shingles(docs, "doc_id", "text", 5)
    val allPairs = docs.select(col("doc_id").as("id_a"))
      .crossJoin(docs.select(col("doc_id").as("id_b")))
      .filter(col("id_a") < col("id_b")).limit(500)
    val relational = Dedup.verifyJaccard(allPairs, sh, 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        math.rint(r.getDouble(2) * 10000) / 10000)).toMap
    val texts = docs.select(col("doc_id").as("tid"), col("text").as("ttext"))
    val pairwise = allPairs
      .join(texts.as("ta"), col("id_a") === col("ta.tid"))
      .join(texts.as("tb"), col("id_b") === col("tb.tid"))
      .select(col("id_a"), col("id_b"),
        graft.functions.TextHashFunctions.shingleJaccard(
          spark, col("ta.ttext"), col("tb.ttext"), 5).as("j"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        math.rint(r.getDouble(2) * 10000) / 10000)).toMap
    assert(relational.nonEmpty)
    // relational drops zero-intersection pairs (inner join); pairwise keeps
    // them with jaccard 0 — compare on the relational domain
    relational.foreach { case (k, v) =>
      assert(pairwise.getOrElse(k, -1.0) == v, s"pair $k: $v vs ${pairwise.get(k)}")
    }
  }

  test("shingle kernel matches string-substring semantics (incl. multibyte UTF-8)") {
    val ss = spark
    import ss.implicits._
    // reference: distinct k-char substrings computed on java Strings
    def refCount(text: String, k: Int): Int = {
      val n = text.length // java String length == code-unit count; our texts are BMP
      val wins = math.max(1, n - (k - 1))
      (0 until wins).map(i => text.substring(i, math.min(i + k, n))).distinct.size
    }
    val texts = Seq("", "a", "ab", "abcabcabc", "日本語のテキストです日本語",
      "mixed 日本 ascii text", "aaaaaaa", "ab ab ab ab")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = graft.ops.Dedup.shingles(df, "doc_id", "text", 3)
      .groupBy("sid").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == refCount(t, 3).toLong, s"text '$t'")
    }
  }

  test("simhash: identical docs collide, fingerprints are stable and map-only") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content about databases and columnar formats"),
      (4L, "")).toDF("doc_id", "text")
    val fps = Dedup.simHash(docs, "doc_id", "text")
    val m = fps.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(m(1L) == m(2L)) // identical text => identical fingerprint
    assert(m(1L) != m(3L))
    assert(m(4L) == 0L) // no tokens => zero votes => zero fingerprint
    // no Exchange anywhere: the fingerprint is a pure projection
    val plan = fps.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // identical docs are candidates (all four 16-bit bands collide)
    val cands = Dedup.simHashCandidates(fps).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
  }

  test("simhash coverage gate: every close pair is a candidate (pigeonhole at hd<=3)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fps = Dedup.simHash(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = Dedup.simHashCandidates(fps)
    val row = Dedup.simHashCoverageGate(fps, cands, maxHamming = 3).collect()(0)
    assert(row.getLong(0) == docs.count())
    assert(row.getBoolean(1), "a pair within 3 bits missed all 4 bands — impossible")
    fps.unpersist()
  }

  test("simhash coverage gate: synthetic 4-bit pair spread across all bands is the counterexample") {
    val ss = spark
    import ss.implicits._
    // fingerprints differing in exactly one bit PER 16-bit band: candidates
    // (shared band) are empty, so the gate at hd<=4 must report uncovered —
    // proving the gate actually measures coverage rather than echoing true
    val a = 0L
    val b = (1L << 0) | (1L << 16) | (1L << 32) | (1L << 48)
    val fps = Seq((1L, a), (2L, b)).toDF("sid", "simhash")
    val cands = Dedup.simHashCandidates(fps)
    assert(cands.count() == 0)
    val gate4 = Dedup.simHashCoverageGate(fps, cands, maxHamming = 4).collect()(0)
    assert(!gate4.getBoolean(1))
    val gate3 = Dedup.simHashCoverageGate(fps, cands, maxHamming = 3).collect()(0)
    assert(gate3.getBoolean(1)) // the pair is 4 bits apart: not "close" at 3
  }

  test("alternating-star components equal label propagation on random pair graphs") {
    val ss = spark
    import ss.implicits._
    for (seed <- Seq(11, 42, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 200
      val pairs = (0 until 150).map { _ =>
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val df = pairs.toDF("id_a", "id_b")
      def m(r: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        r.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      val label = m(Dedup.labelPropagationClusters(df)._1)
      val star = m(Dedup.alternatingStarClusters(df)._1)
      assert(star == label, s"seed=$seed")
    }
  }

  test("alternating star converges in O(log n) rounds on a path graph") {
    val ss = spark
    import ss.implicits._
    val n = 64
    val path = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.alternatingStarClusters(path)
    assert(labels.collect().forall(_.getLong(1) == 0L))
    assert(rounds <= 12, s"star took $rounds rounds on a 64-path (expected O(log n))")
    // label propagation needs O(n) rounds on the same graph
    val (_, lpRounds) = Dedup.labelPropagationClusters(path)
    assert(lpRounds > rounds, s"label=$lpRounds star=$rounds")
  }

  test("minhash verify via stored shingle-hash arrays equals per-pair re-hashing") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    val direct = rows(Dedup.minHashNearDup(docs, "doc_id", "text"))
    val reused = rows(Dedup.minHashNearDup(docs, "doc_id", "text", reuseShingleHashes = true))
    assert(direct.nonEmpty)
    assert(reused == direct)
  }

  test("signature prefilter derives from threshold: low thresholds keep recall") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def pairs(prefilter: Double, threshold: Double): Set[(Long, Long)] =
      Dedup.minHashNearDup(docs, "doc_id", "text", threshold = threshold,
        signaturePrefilter = prefilter)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // at threshold=0.5 a fixed 0.5 cut would drop a large share of true
    // boundary pairs; the derived cut (≈0.23) must keep the exact-verified
    // set identical to running with the prefilter disabled
    val noPrefilter = pairs(0.0, 0.5)
    val derived = pairs(-1.0, 0.5)
    assert(noPrefilter.nonEmpty)
    assert(derived == noPrefilter,
      s"derived prefilter lost ${(noPrefilter -- derived).size} pairs")
    // the default threshold keeps its prior behavior (prefilter active)
    assert(pairs(-1.0, 0.8) == pairs(0.0, 0.8))
  }

  test("duplicate clusters: connected components with min-label canonical ids") {
    val ss = spark
    import ss.implicits._
    // chain 1-2-3-4 (multi-round propagation), pair 10-11, triangle-ish 20-21-22
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("minhash near-dup agrees with exact ngram jaccard on planted dups") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mh = Dedup.minHashNearDup(docs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verified-minhash pairs are exactly the exact-jaccard pairs (same
    // shingle definition, LSH only prunes candidates)
    assert(mh.subsetOf(exact))
    if (exact.nonEmpty) assert(mh.nonEmpty)
  }

  test("semanticDupIds == plain-Scala reference on planted clusters; " +
      "cross-cell pairs survive; fitted tier subsets the exact set") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(43)
    val dim = 8
    def axis(c: Int, amp: Float = 1.0f) =
      Array.tabulate(dim)(i => if (i == c) amp else 0.0f)
    // 3 jittered groups + near-exact copies of rows 0/1/2 + one pair that
    // is similar ACROSS the fixed cell boundary (argmax dims 0 vs 1): the
    // cluster bound must keep BOTH halves of that pair
    val base = (0L until 90L).map { id =>
      val c = (id % 3).toInt
      (id, axis(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.8f))
    }
    val copies = Seq(0L, 1L, 2L).map { src =>
      (90L + src, base(src.toInt)._2.map(x => x + 0.001f))
    }
    val crossPair = Seq(
      (200L, Array(0.9f, 0.8f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (201L, Array(0.8f, 0.9f, 0f, 0f, 0f, 0f, 0f, 0f)))
    val rows = base ++ copies ++ crossPair
    val corpus = rows.toDF("vec_id", "embedding").repartition(5)
    val cents = Array.tabulate(3, dim)((c, i) => if (i == c) 1.0f else 0.0f)
    val tau = 0.98

    // plain-Scala reference: same assignment (L2 argmin, lowest-cell tie),
    // same round-4 cosine, same keep-earliest rule
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    def cell(v: Array[Float]): Int =
      cents.zipWithIndex.minBy { case (c, i) => (l2(c, v), i) }._2
    def cos4(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < dim) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      math.rint(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e4) / 1e4
    }
    val expected = rows.filter { case (id, v) =>
      rows.exists { case (id2, v2) =>
        id2 < id && cell(v2) == cell(v) && cos4(v2, v) >= tau
      }
    }.map(_._1).toSet
    assert(expected.intersect(Set(90L, 91L, 92L)) == Set(90L, 91L, 92L),
      "planted copies must be droppable in the reference")

    val got = Dedup.semanticDupIds(spark, corpus, cents, tau)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected, s"got ${got.toSeq.sorted}, want ${expected.toSeq.sorted}")
    // the cross-cell similar pair is NOT deduped (cells differ: argmax
    // dim 0 vs dim 1) even though its cosine clears tau
    assert(cos4(crossPair(0)._2, crossPair(1)._2) >= tau)
    assert(!got.contains(201L))

    // kept corpus == corpus minus dups
    val kept = Dedup.semanticDedup(spark, corpus, cents, tau)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == rows.map(_._1).toSet -- expected)

    // fitted tier: cluster-bounded dups are always a SUBSET of the
    // unbounded exact droppable set; the near-exact planted copies land
    // with their originals (identical assignment) so they are recovered
    val exactDroppable = rows.filter { case (id, v) =>
      rows.exists { case (id2, v2) => id2 < id && cos4(v2, v) >= tau }
    }.map(_._1).toSet
    val (fitted, fittedCents) =
      Dedup.semanticDupIdsFit(spark, corpus, dim, 3, tau, iters = 2)
    val fittedIds = fitted.collect().map(_.getLong(0)).toSet
    assert(fittedCents.length == 3)
    assert(fittedIds.subsetOf(exactDroppable))
    assert(Set(90L, 91L, 92L).subsetOf(fittedIds))

    intercept[IllegalArgumentException](
      Dedup.semanticDupIds(spark, corpus, cents, 0.0))
    intercept[IllegalArgumentException](
      Dedup.semanticDupIds(spark, corpus, Array.empty[Array[Float]], 0.5))
  }

  test("semanticDupIdsBy: keep-farthest matches a plain-Scala reference; " +
      "orderKey = 0 degenerates to keep-earliest") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(47)
    val dim = 6
    val rows = (0L until 120L).map { id =>
      val c = (id % 2).toInt
      (id, Array.tabulate(dim)(i =>
        (if (i == c) 3.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 2.2f))
    }
    val corpus = rows.toDF("vec_id", "embedding").repartition(4)
    val cents = Array.tabulate(2, dim)((c, i) => if (i == c) 1.0f else 0.0f)
    val tau = 0.9

    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    def cell(v: Array[Float]): Int =
      cents.zipWithIndex.minBy { case (c, i) => (l2(c, v), i) }._2
    def cos4(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < dim) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // reference: drop b iff a same-cell row with smaller (cosToCent, id)
    // clears tau — the paper's keep-farthest (lowest centroid similarity
    // survives its neighborhood)
    def key(v: Array[Float]): Double = cos4(v, cents(cell(v)))
    val expected = rows.filter { case (id, v) =>
      rows.exists { case (id2, v2) =>
        cell(v2) == cell(v) &&
        (key(v2) < key(v) || (key(v2) == key(v) && id2 < id)) &&
        cos4(v2, v) >= tau
      }
    }.map(_._1).toSet
    assert(expected.nonEmpty, "fixture must produce at least one dup")

    val got = Dedup.semanticDupIdsKeepFarthest(spark, corpus, cents, tau)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"got ${got.toSeq.sorted}, want ${expected.toSeq.sorted}")
    // the policies agree on WHAT is a duplicate neighborhood, not on the
    // survivor: same total count whenever neighborhoods are cliques is
    // NOT guaranteed in general, so only the degenerate equivalence is
    // pinned — orderKey = lit(0) IS keep-earliest
    val earliest = Dedup.semanticDupIds(spark, corpus, cents, tau)
      .collect().map(_.getLong(0)).toSet
    val degenerate = Dedup.semanticDupIdsBy(spark, corpus, cents, tau, lit(0))
      .collect().map(_.getLong(0)).toSet
    assert(degenerate == earliest)

    intercept[IllegalArgumentException](
      Dedup.semanticDupIdsBy(spark, corpus, cents, 0.0, lit(0)))
  }

  test("semanticDupIdsIndexed == semanticDupIds over the sidecar centroids; " +
      "the same-cell self-join is exchange-free under SPJ") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(19)
    val dim = 8
    val base = (0L until 300L).map { id =>
      val c = (id % 4).toInt
      (id, Array.tabulate(dim)(i =>
        (if (i == c) 5.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.6f))
    }
    val copies = Seq(3L, 7L, 11L).map { src =>
      (300L + src, base(src.toInt)._2.map(x => x + 0.0005f))
    }
    val corpus = (base ++ copies).toDF("vec_id", "embedding").repartition(3)
    val idxDir = java.nio.file.Files.createTempDirectory("semidx").toString
    Ann.buildIvfIndex(spark, corpus, idxDir, dim, nCentroids = 4, seed = 7)

    val tau = 0.999
    val direct = Dedup.semanticDupIds(spark, corpus,
        Ann.loadIvfCentroids(idxDir), tau)
      .collect().map(_.getLong(0)).toSet
    val indexed = Dedup.semanticDupIdsIndexed(spark, idxDir, tau)
    val got = indexed.collect().map(_.getLong(0)).toSet
    assert(got == direct, s"indexed ${got.toSeq.sorted} != direct ${direct.toSeq.sorted}")
    assert(Set(303L, 307L, 311L).subsetOf(got),
      "planted near-exact copies must be dropped")

    // kept corpus: index rows minus dups, cell column preserved
    val kept = Dedup.semanticDedupIndexed(spark, idxDir, tau)
    assert(kept.columns.contains("cent_id"))
    assert(kept.select("vec_id").collect().map(_.getLong(0)).toSet ==
      (base ++ copies).map(_._1).toSet -- got)

    // scale shape: under SPJ the cell-keyed self-join shuffles NEITHER
    // side — the stored hive layout satisfies the join's distribution
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Dedup.semanticDupIdsIndexed(spark, idxDir, tau)
        .queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("Join")
      assert(joinIdx > 0, plan)
      // no Exchange below the join (the trailing distinct() may shuffle —
      // that frame is the dup candidates, not the corpus)
      assert(!plan.substring(joinIdx).contains("Exchange"),
        s"same-cell self-join must be storage-partitioned:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }

    intercept[IllegalArgumentException](
      Dedup.semanticDupIdsIndexed(spark, idxDir, 1.5))
  }
}
