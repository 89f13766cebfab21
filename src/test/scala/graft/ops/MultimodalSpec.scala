package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.ImageMeta

/** Multimodal binary path: synthesized PNGs must be REAL (JDK ImageIO
  * decodes them with the right dimensions), and the image_meta header
  * parser must read PNG/JPEG/GIF containers and reject garbage. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("synthesized PNG is standards-valid: JDK ImageIO decodes it") {
    val bytes = Multimodal.pngBytes(37, 21, seed = 7)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not decode the synthesized PNG")
    assert(img.getWidth == 37 && img.getHeight == 21)
  }

  test("image_meta parses PNG / JPEG / GIF headers and rejects garbage") {
    def meta(b: Array[Byte]): Option[(String, Int, Int, Int)] =
      Option(ImageMeta(org.apache.spark.sql.catalyst.expressions.Literal(b)).compute(b))
        .map(r => (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getInt(3)))

    assert(meta(Multimodal.pngBytes(320, 200, 1)) == Some(("png", 320, 200, 8)))
    // minimal JPEG: SOI + APP0 (skipped) + SOF0 with precision 8, h=480, w=640
    val jpeg = Array[Int](
      0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x04, 0x00, 0x00, // APP0, length 4
      0xff, 0xc0, 0x00, 0x11, 0x08, 0x01, 0xe0, 0x02, 0x80, 0x03,
      0x01, 0x11, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01).map(_.toByte)
    assert(meta(jpeg) == Some(("jpeg", 640, 480, 8)))
    // GIF89a logical screen 64 x 32, packed byte 0x70 => colour resolution 8
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](64, 0, 32, 0, 0x70.toByte, 0, 0)
    assert(meta(gif) == Some(("gif", 64, 32, 8)))
    // JPEG with a fill byte (0xFF) before the SOF marker is still valid
    val jpegFill = Array[Int](0xff, 0xd8, 0xff,
      0xff, 0xc0, 0x00, 0x11, 0x08, 0x00, 0x10, 0x00, 0x20,
      0x01, 0x11, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01).map(_.toByte)
    assert(meta(jpegFill) == Some(("jpeg", 32, 16, 8)))
    assert(meta(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)).isEmpty)
    assert(meta("plain text bytes, definitely not an image".getBytes).isEmpty)
  }

  test("synthesized WAV is standards-valid: JDK javax.sound decodes its format") {
    val bytes = Multimodal.wavBytes(channels = 2, sampleRate = 44100, nSamples = 300, seed = 3)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getChannels == 2 && fmt.getSampleRate == 44100f &&
      fmt.getSampleSizeInBits == 16)
    assert(in.getFrameLength == 300)
  }

  test("audio_meta parses WAV headers and rejects garbage") {
    import graft.functions.AudioMeta
    def meta(b: Array[Byte]): Option[(String, Int, Int, Int, Long)] =
      Option(AudioMeta(org.apache.spark.sql.catalyst.expressions.Literal(b)).compute(b))
        .map(r => (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2),
          r.getInt(3), r.getLong(4)))
    assert(meta(Multimodal.wavBytes(1, 16000, 250, 1)) == Some(("wav", 1, 16000, 16, 250L)))
    assert(meta(Multimodal.pngBytes(8, 8, 1)).isEmpty)
    assert(meta("RIFFxxxxNOPE".getBytes).isEmpty)
  }

  test("decodeImageFeatures: real pixel decode equals a plain-JDK reference") {
    val sp = spark; import sp.implicits._
    val rows = Seq(1L, 2L, 3L, 4L).map(id =>
      (id, Multimodal.pngBytes((10 + id).toInt, (6 + id).toInt, id)))
    val df = rows.toDF("doc_id", "payload")
    val got = Multimodal.decodeImageFeatures(df).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3))))
      .toMap
    rows.foreach { case (id, bytes) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var sum = 0.0
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
      }
      val want = BigDecimal(sum / (img.getWidth * img.getHeight))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gw, gh, gl) = (got(id)._1, got(id)._2, got(id)._3)
      assert((gw, gh) == (img.getWidth, img.getHeight))
      assert(gl == want, s"doc $id luma $gl vs $want")
    }
    // undecodable payloads yield NULL features, never fail the job
    val junk = Seq((9L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val nr = Multimodal.decodeImageFeatures(junk).collect()(0)
    assert(nr.getLong(0) == 9L && nr.isNullAt(1) && nr.isNullAt(2) && nr.isNullAt(3))
  }

  test("resizeImages: thumbnail dims follow the shared rule; pixels survive") {
    val sp = spark; import sp.implicits._
    val rows = Seq((1L, Multimodal.pngBytes(40, 24, 1)),
      (2L, Multimodal.pngBytes(9, 30, 2)), // portrait: height is the long side
      (3L, Multimodal.pngBytes(5, 3, 3))) // already smaller: scales UP to 12
    val out = Multimodal.resizeImages(rows.toDF("doc_id", "payload"), 12)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toMap
    rows.foreach { case (id, orig) =>
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(orig))
      val (ew, eh) = Multimodal.resizedDims(src.getWidth, src.getHeight, 12)
      val thumb = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(out(id)))
      assert(thumb != null, s"doc $id thumbnail did not re-decode")
      assert((thumb.getWidth, thumb.getHeight) == (ew, eh),
        s"doc $id dims (${thumb.getWidth},${thumb.getHeight}) vs ($ew,$eh)")
    }
    assert(Multimodal.resizedDims(40, 24, 12) == ((12, 7)))
    assert(Multimodal.resizedDims(9, 30, 12) == ((4, 12)))
    assert(Multimodal.resizedDims(5, 3, 12) == ((12, 7)))
    // garbage passes through as NULL payload
    val junk = Seq((9L, "nope".getBytes("UTF-8"))).toDF("doc_id", "payload")
    assert(Multimodal.resizeImages(junk, 12).collect()(0).isNullAt(1))
  }

  test("decodeAudioFeatures: real PCM decode equals a plain-JDK reference") {
    val sp = spark; import sp.implicits._
    val rows = Seq(1L, 2L, 3L, 6L).map { id =>
      (id, Multimodal.wavBytes((1 + id % 2).toInt,
        if (id % 3 == 0) 16000 else 44100, (100 + id % 400).toInt, id))
    }
    val got = Multimodal.decodeAudioFeatures(rows.toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    rows.foreach { case (id, bytes) =>
      // independent reference: re-derive channels/rate from the generator
      // formula and RMS straight off the PCM block of the container
      val ch = (1 + id % 2).toInt
      val rate = if (id % 3 == 0) 16000 else 44100
      val n = (100 + id % 400).toInt
      val bb = java.nio.ByteBuffer.wrap(bytes, 44, bytes.length - 44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var sumSq = 0.0
      var cnt = 0
      while (bb.remaining >= 2) { val s = bb.getShort.toDouble; sumSq += s * s; cnt += 1 }
      assert(cnt == n * ch)
      val wantRms = BigDecimal(math.sqrt(sumSq / cnt))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gc, gr, gf, gd, grms) = got(id)
      assert((gc, gr, gf) == ((ch, rate, n.toLong)), s"doc $id meta")
      assert(gd == n * 1000.0 / rate, s"doc $id duration")
      assert(grms == wantRms, s"doc $id rms $grms vs $wantRms")
    }
    // undecodable payloads yield NULL features, never fail the job
    val junk = Seq((9L, "RIFFnope".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val nr = Multimodal.decodeAudioFeatures(junk).collect()(0)
    assert(nr.getLong(0) == 9L && (1 to 5).forall(nr.isNullAt))

    // a NON-WAV container (AIFF, big-endian PCM) exercises the javax.sound
    // fallback behind the RIFF fast path: same frames and RMS as the WAV
    // carrying identical samples
    val wav = Multimodal.wavBytes(2, 44100, 150, 42L)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val aiff = bos.toByteArray
    assert(!(aiff(0) == 'R' && aiff(1) == 'I')) // really not RIFF
    val pair = Multimodal.decodeAudioFeatures(
      Seq((1L, wav), (2L, aiff)).toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(5)))).toMap
    assert(pair(1L) == pair(2L),
      s"AIFF fallback ${pair(2L)} != WAV fast path ${pair(1L)}")
  }

  test("image table round-trips through strawboat and parses via the expression") {
    val ss = spark
    import ss.implicits._
    val docs = (0L until 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("strawimg").toString + "/t"
    Multimodal.asImages(docs).write.format("strawboat").mode("overwrite").save(dir)
    val got = Multimodal.imageMeta(spark, spark.read.format("strawboat").load(dir))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSeq
    assert(got.size == 50)
    got.foreach { case (id, fmt, w, h) =>
      assert(fmt == "png" && w == (16 + id % 32).toInt && h == (8 + id % 16).toInt, s"doc $id")
    }
  }

  test("video: raw container meta parses via built-in expressions; frame " +
      "sampling decodes real pixels, re-encodes real PNGs, quarantines garbage") {
    val sp = spark; import sp.implicits._
    val docs = (0L until 24L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
    val vids = Multimodal.asVideo(docs)
    // meta: every field equals the generator formula
    val meta = Multimodal.videoMeta(vids).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getDouble(6))).toSeq
    meta.foreach { case (id, fmt, w, h, fps, n, dur) =>
      assert(fmt == "grv1" && w == (8 + (id % 3) * 4).toInt &&
        h == (8 + (id % 2) * 4).toInt && fps == (4 + id % 4).toInt &&
        n == (6 + id % 10).toInt, s"doc $id")
      assert(math.abs(dur - BigDecimal(n.toDouble / fps)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    // sampling: grid matches the formula; ts = idx/fps; dims carried
    val frames = Multimodal.sampleFrames(vids, everyN = 4).collect()
    val byDoc = frames.groupBy(_.getLong(0))
    (0L until 24L).foreach { id =>
      val n = (6 + id % 10).toInt
      val want = (0 until n by 4).toSeq
      val got = byDoc(id).map(_.getInt(1)).toSeq.sorted
      assert(got == want, s"doc $id sampled $got want $want")
    }
    // real pixels both ways: the PNG payload re-parses with the frame's
    // dims, and its DECODED mean luma equals the reported one (uniform
    // random bytes also keep luma in a wide central band)
    frames.take(20).foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](6)))
      assert(img != null && img.getWidth == r.getInt(3) &&
        img.getHeight == r.getInt(4))
      var sum = 0.0
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
      }
      val luma = sum / (img.getWidth * img.getHeight)
      assert(math.abs(luma - r.getDouble(5)) < 1e-3,
        s"png luma $luma vs reported ${r.getDouble(5)}")
      assert(r.getDouble(5) > 60 && r.getDouble(5) < 195,
        s"uniform-byte luma out of band: ${r.getDouble(5)}")
    }
    // garbage and truncated payloads yield zero frames, never a crash
    val junk = Seq(
      (100L, "not a video".getBytes("UTF-8")),
      (101L, Multimodal.rawVideoBytes(4, 4, 2, 3, 7).take(20).toArray))
      .toDF("doc_id", "payload")
    assert(Multimodal.sampleFrames(junk, 2).count() == 0L)
    // the header parser reads what's THERE: garbage yields null format,
    // while a truncated-but-intact header still reports its metadata (the
    // image_meta contract) — the frame SAMPLER is what refuses short data
    val metaJunk = Multimodal.videoMeta(junk).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getString(1))))
      .toMap
    assert(metaJunk(100L).isEmpty && metaJunk(101L).contains("grv1"))
    intercept[IllegalArgumentException](Multimodal.sampleFrames(vids, 0))
  }
}
