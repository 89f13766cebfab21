package graft.spark

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, In}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.format._

/** Per-page equality filters ([[PageBloom]], write option `bloomColumns`):
  * the structure, the writer/footer round trip, and the pruning they unlock
  * on the shared-prefix high-cardinality keys the prefix zone maps are
  * blind to. */
class PageBloomSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("bloom-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("bloomtest").toString
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  private def footerOf(out: String): StrawFooter = {
    val file = new java.io.File(out).listFiles.filter(_.getName.endsWith(".strb")).head
    val in = new LocalFileInput(file.getPath)
    try StrawFileReader.readFooter(in) finally in.close()
  }

  /** Deterministic pseudo-random digest-style key (no common order). */
  private def digest(i: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"key-$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  // ---------------------------------------------------------------------
  // Structure unit tests
  // ---------------------------------------------------------------------

  test("bloom has no false negatives and bounded false positives") {
    val n = 10000
    val hashes = Array.tabulate(n)(i => PageBloom.hashBytes(digest(i.toLong).getBytes("UTF-8")))
    val bloom = PageBloom.build(hashes, n, 0.01)
    assert(bloom != null)
    hashes.foreach(h => assert(PageBloom.mightContain(bloom, h), "false negative"))
    val fp = (n until 5 * n).count(i =>
      PageBloom.mightContain(bloom, PageBloom.hashBytes(digest(i.toLong).getBytes("UTF-8"))))
    // target fpp 1%; allow generous slack (sizing rounds to powers of two)
    assert(fp.toDouble / (4 * n) < 0.05, s"false positive rate too high: $fp / ${4 * n}")
  }

  test("malformed bloom bytes degrade to keep, never to a wrong skip") {
    assert(PageBloom.mightContain(null, 1L))
    assert(PageBloom.mightContain(Array[Byte](3), 1L)) // truncated header
    assert(PageBloom.mightContain(Array[Byte](0, 1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8), 1L)) // k=0
    assert(PageBloom.mightContain(Array[Byte](2, 3, 0, 0, 0, 1, 2), 1L)) // non-pow2/short
    // crafted nWords=2^29: `5 + nWords * 8` overflows Int right back to 5,
    // passing a naive length check — must keep, not crash out of planning
    assert(PageBloom.mightContain(Array[Byte](1, 0, 0, 0, 0x20), 1L))
    assert(PageBloom.mightContain(Array[Byte](1, 0, 0, 0, 0x20), Long.MinValue))
  }

  test("bloomColumns typos and unsupported types fail fast at write") {
    val sp = spark; import sp.implicits._
    val df = (0L until 10L).map(i => (i, digest(i))).toDF("id", "key")
    val e1 = intercept[Exception] {
      df.write.format("strawboat").mode("overwrite")
        .option("bloomColumns", "kye") // typo
        .save(s"$dir/badcol")
    }
    assert(e1.getMessage.contains("kye") || e1.getCause.getMessage.contains("kye"))
    val dec = df.select(col("id").cast("decimal(25,0)").as("wide"))
    val e2 = intercept[Exception] {
      dec.write.format("strawboat").mode("overwrite")
        .option("bloomColumns", "wide") // wide decimal: no bloom support
        .save(s"$dir/badtype")
    }
    assert(e2.getMessage.contains("wide") || e2.getCause.getMessage.contains("wide"))
    // a path crossing an array level names a real leaf but is not
    // row-aligned: ZoneMapFilter can never probe it, so the writer must
    // reject rather than emit dead footer bytes
    val arr = df.select(col("id"), array(col("key")).as("tags"))
    val e3 = intercept[Exception] {
      arr.write.format("strawboat").mode("overwrite")
        .option("bloomColumns", "tags.element")
        .save(s"$dir/badrep")
    }
    val msg3 = e3.getMessage + Option(e3.getCause).map(_.getMessage).getOrElse("")
    assert(msg3.contains("array/map"), s"unexpected: $msg3")
  }

  test("build returns null on an empty page") {
    assert(PageBloom.build(Array.empty[Long], 0, 0.01) == null)
  }

  // ---------------------------------------------------------------------
  // Writer / footer round trip
  // ---------------------------------------------------------------------

  test("blooms attach only to the named leaves and survive the footer") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/attach"
    (0L until 3000L).map(i => (i, digest(i), s"plain-$i"))
      .toDF("id", "key", "other")
      .coalesce(1)
      .write.format("strawboat").mode("overwrite")
      .option("maxPageSize", "1000")
      .option("bloomColumns", "key,id")
      .save(out)
    val footer = footerOf(out)
    assert(footer.columns(0).pages.forall(_.bloom != null), "id bloom missing")
    assert(footer.columns(1).pages.forall(_.bloom != null), "key bloom missing")
    assert(footer.columns(2).pages.forall(_.bloom == null), "unnamed column grew a bloom")
    assert(footer.columns(1).pages.length == 3)
    // data unchanged by the footer extension
    val back = spark.read.format("strawboat").load(out)
    assert(back.count() == 3000)
    assert(back.filter(col("key") === digest(17L)).select("id").as[Long].collect().toSeq == Seq(17L))
  }

  test("nested struct leaf accepts a dotted bloom path") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/nested"
    (0L until 2000L).map(i => (i, (digest(i), i % 5)))
      .toDF("id", "meta")
      .select(col("id"), col("meta._1").as("digest"), col("meta._2").as("tag"))
      .select(col("id"), struct(col("digest"), col("tag")).as("meta"))
      .coalesce(1)
      .write.format("strawboat").mode("overwrite")
      .option("maxPageSize", "500")
      .option("bloomColumns", "meta.digest")
      .save(out)
    val footer = footerOf(out)
    // leaves: id, meta.digest, meta.tag
    assert(footer.columns(1).pages.forall(_.bloom != null))
    assert(footer.columns(0).pages.forall(_.bloom == null))
    assert(footer.columns(2).pages.forall(_.bloom == null))
    // dotted-path equality prunes through the bloom
    val absent = EqualTo("meta.digest", digest(999999L))
    val keep = ZoneMapFilter.keptPages(footer, Array(absent))
    assert((0 until 4).forall(p => !keep(p)), "absent nested probe must prune all pages")
  }

  // ---------------------------------------------------------------------
  // Pruning on shared-prefix high-cardinality keys
  // ---------------------------------------------------------------------

  /** URL-style keys: every value shares the >8-byte stem, so the 8-byte
    * prefix zone maps are ONE value for every page — provably unable to
    * prune — while the bloom pinpoints the page. */
  private lazy val urlTable: (String, StrawFooter) = {
    val sp = spark; import sp.implicits._
    val out = s"$dir/urls"
    (0L until 8000L).map(i => (i, s"https://cdn.example.com/obj/${digest(i)}"))
      .toDF("id", "url")
      .coalesce(1)
      .write.format("strawboat").mode("overwrite")
      .option("maxPageSize", "1000")
      .option("bloomColumns", "url")
      .save(out)
    (out, footerOf(out))
  }

  test("prefix zone maps are blind on shared-prefix keys; blooms are not") {
    val (_, footer) = urlTable
    val urlPages = footer.columns(1).pages
    assert(urlPages.length == 8)
    // the blindness premise: every page's 8-byte prefix min == max
    assert(urlPages.forall(p => p.statsKind == StrawFormat.StatsPrefix && p.min == p.max))
    // a PRESENT key: its actual page is kept
    val present = s"https://cdn.example.com/obj/${digest(4321L)}"
    val keepHit = ZoneMapFilter.keptPages(footer, Array(EqualTo("url", present)))
    assert(keepHit(4321 / 1000), "the containing page must be kept")
    // most other pages are bloom-pruned (fpp leaves room for stray keeps)
    val keptCount = (0 until 8).count(keepHit)
    assert(keptCount <= 2, s"expected <=2 kept pages, got $keptCount")
    // an ABSENT key prunes everything (modulo fp)
    val keepMiss = ZoneMapFilter.keptPages(footer,
      Array(EqualTo("url", "https://cdn.example.com/obj/not-a-digest")))
    assert((0 until 8).count(keepMiss) <= 1)
  }

  test("EqualNullSafe probes prune through the bloom like EqualTo") {
    val (_, footer) = urlTable
    import org.apache.spark.sql.sources.{EqualNullSafe, IsNull}
    val present = s"https://cdn.example.com/obj/${digest(4321L)}"
    val keepHit = ZoneMapFilter.keptPages(footer, Array(EqualNullSafe("url", present)))
    assert(keepHit(4), "the containing page must be kept")
    assert((0 until 8).count(keepHit) <= 2)
    val keepMiss = ZoneMapFilter.keptPages(footer,
      Array(EqualNullSafe("url", "https://cdn.example.com/obj/not-a-digest")))
    assert((0 until 8).count(keepMiss) <= 1)
    // null literal reduces to IS NULL: the url column has no nulls, so
    // every page is provably unsatisfiable
    val keepNull = ZoneMapFilter.keptPages(footer, Array(EqualNullSafe("url", null)))
    assert((0 until 8).forall(p => !keepNull(p)), "<=> null must prune null-free pages")
    assert(ZoneMapFilter.keptPages(footer, Array(IsNull("url")))(0) == keepNull(0))
  }

  test("In() probes prune through the bloom per value") {
    val (_, footer) = urlTable
    val keys = Array[Any](
      s"https://cdn.example.com/obj/${digest(100L)}",
      s"https://cdn.example.com/obj/${digest(6100L)}")
    val keep = ZoneMapFilter.keptPages(footer, Array(In("url", keys)))
    assert(keep(0) && keep(6), "pages containing IN members must be kept")
    val kept = (0 until 8).count(keep)
    assert(kept <= 4, s"IN over 2 values kept $kept of 8 pages")
  }

  test("long-backed bloom prunes an unsorted integer key") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/longs"
    // values scattered so every page spans nearly the full [min, max] range:
    // range zone maps keep everything, the bloom does the work
    val n = 8000L
    (0L until n).map(i => (i, (i * 2654435761L) % 1000000007L))
      .toDF("id", "scatter")
      .coalesce(1)
      .write.format("strawboat").mode("overwrite")
      .option("maxPageSize", "1000")
      .option("bloomColumns", "scatter")
      .save(out)
    val footer = footerOf(out)
    val probe = (4321L * 2654435761L) % 1000000007L
    val keep = ZoneMapFilter.keptPages(footer, Array(EqualTo("scatter", probe)))
    assert(keep(4), "containing page kept")
    assert((0 until 8).count(keep) <= 2)
    // absent probe that falls inside the global range
    val keepMiss = ZoneMapFilter.keptPages(footer, Array(EqualTo("scatter", 12345L)))
    assert((0 until 8).count(keepMiss) <= 1)
  }

  test("nulls: bloom pages exclude null slots but equality still finds values") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/nulls"
    (0L until 2000L).map(i => (i, if (i % 3 == 0) null else digest(i)))
      .toDF("id", "key")
      .coalesce(1)
      .write.format("strawboat").mode("overwrite")
      .option("maxPageSize", "500")
      .option("bloomColumns", "key")
      .save(out)
    val back = spark.read.format("strawboat").load(out)
    assert(back.filter(col("key") === digest(1000L)).count() == 1)
    assert(back.filter(col("key").isNull).count() == (0L until 2000L).count(_ % 3 == 0))
    // an all-null page region still answers IsNull without a bloom veto
    val footer = footerOf(out)
    assert(footer.columns(1).pages.forall(_.bloom != null))
  }

  // ---------------------------------------------------------------------
  // End-to-end: pruned pages are never read
  // ---------------------------------------------------------------------

  test("bloom-pruned pages cost zero IO (corruption proof)") {
    val sp = spark; import sp.implicits._
    val out = s"$dir/corrupt"
    (0L until 8000L).map(i => (i, s"https://cdn.example.com/obj/${digest(i)}"))
      .toDF("id", "url")
      .coalesce(1)
      .write.format("strawboat").mode("overwrite")
      .option("maxPageSize", "1000")
      .option("bloomColumns", "url")
      .save(out)
    // find a key in page 0 whose bloom probe keeps ONLY page 0 (dodge fp)
    val footer = footerOf(out)
    val target = (0L until 1000L).find { i =>
      val keep = ZoneMapFilter.keptPages(footer,
        Array(EqualTo("url", s"https://cdn.example.com/obj/${digest(i)}")))
      keep(0) && (1 until 8).forall(p => !keep(p))
    }.get
    // corrupt every page except the first, in every column
    val file = new java.io.File(out).listFiles.filter(_.getName.endsWith(".strb")).head
    val raf = new java.io.RandomAccessFile(file, "rw")
    try {
      for (c <- footer.columns.indices) {
        val offs = footer.columns(c).pageOffsets
        for (p <- 1 until footer.columns(c).pages.length) {
          raf.seek(offs(p))
          raf.write(Array.fill(math.min(16, footer.columns(c).pages(p).compLen.toInt))(0x5A.toByte))
        }
      }
    } finally raf.close()
    new java.io.File(file.getParentFile, s".${file.getName}.crc").delete(): Unit
    FooterCache.clear()
    val back = spark.read.format("strawboat").load(out)
    val url = s"https://cdn.example.com/obj/${digest(target)}"
    val got = back.filter(col("url") === url).select("id").as[Long].collect()
    assert(got.toSeq == Seq(target), "bloom-kept page answered the lookup")
    intercept[org.apache.spark.SparkException] {
      back.agg(sum(length(col("url")))).collect() // must decode a corrupted page
    }
  }
}
