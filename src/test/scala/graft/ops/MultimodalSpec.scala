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
}
