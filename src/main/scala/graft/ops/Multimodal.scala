package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column pattern: media payloads ride as opaque `binary`
  * columns next to a typed metadata struct, stored and scanned through the
  * strawboat format (BinaryType pages + StructType pages).
  *
  * The decode/feature-extraction step for real image/audio bytes would be a
  * vectorized Pandas UDF over `mapInPandas` on a cluster with codec
  * libraries; this container has none, so [[stubFeatures]] is a clearly
  * marked deterministic stand-in — the Spark-side plumbing (schema, binary
  * paging, partitioning, batch shape) is the real, tested part.
  */
object Multimodal {

  /** Synthesize a multimodal table from documents: payload = UTF-8 bytes of
    * the text (stands in for image/audio bytes), metadata = typed struct. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("lang").as("lang"),
        col("source").as("source"),
        col("n_chars").cast("int").as("n_chars"),
        lit("text/plain").as("mime")).as("meta"))

  /** STUB feature extractor: a real pipeline would decode `payload`
    * (image/audio) via a Pandas UDF batch; here features are deterministic
    * functions of the bytes so the dataflow is testable end-to-end. */
  def stubFeatures(mm: DataFrame): DataFrame =
    mm.select(
      col("doc_id"),
      length(col("payload")).as("byte_len"),
      md5(col("payload")).as("digest"),
      col("meta.lang").as("lang"),
      col("meta.mime").as("mime"))

  /** A minimal but fully VALID grayscale PNG (signature, IHDR with CRC,
    * deflate-compressed scanlines, IEND) — pure JDK, no codec libraries.
    * Test fixture for the image path: payloads synthesized with this decode
    * in any standards-compliant reader (proven against javax.imageio). */
  def pngBytes(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val bos = new java.io.ByteArrayOutputStream(width * height + 128)
    bos.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def be32(v: Int): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      bos.write(be32(data.length))
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(tb)
      crc.update(data)
      bos.write(tb)
      bos.write(data)
      bos.write(be32(crc.getValue.toInt))
    }
    // IHDR: w, h, bit depth 8, color type 0 (grayscale), deflate, no filter,
    // no interlace
    chunk("IHDR", be32(width) ++ be32(height) ++ Array[Byte](8, 0, 0, 0, 0))
    val raw = new Array[Byte](height * (width + 1)) // filter byte + pixels
    val rnd = new java.util.Random(seed)
    var y = 0
    while (y < height) {
      raw(y * (width + 1)) = 0 // filter: None
      var x = 0
      while (x < width) { raw(y * (width + 1) + 1 + x) = rnd.nextInt(256).toByte; x += 1 }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.empty[Byte])
    bos.toByteArray
  }

  /** Documents → synthetic image table: one valid PNG payload per doc with
    * dimensions derived deterministically from doc_id (the generation UDF is
    * a test fixture; the SCALE-PATH operator is the codegen'd
    * [[graft.functions.ImageMeta]] header parser run over the stored binary
    * column). */
  def asImages(docs: DataFrame): DataFrame = {
    val gen = udf((id: Long) =>
      pngBytes((16 + id % 32).toInt, (8 + id % 16).toInt, id))
    docs.select(col("doc_id"), gen(col("doc_id")).as("payload"))
  }

  /** A minimal valid PCM WAV (RIFF + fmt + data chunks) — pure JDK. Test
    * fixture for the audio path; decodable by javax.sound.sampled. */
  def wavBytes(channels: Int, sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && nSamples >= 0)
    val bits = 16
    val dataLen = nSamples * channels * (bits / 8)
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * (bits / 8))
      .putShort((channels * (bits / 8)).toShort)
      .putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    val rnd = new java.util.Random(seed)
    var i = 0
    while (i < nSamples * channels) { bb.putShort((rnd.nextInt(65536) - 32768).toShort); i += 1 }
    bb.array()
  }

  /** Documents → synthetic audio table (fixture UDF; the scale-path
    * operator is the codegen'd [[graft.functions.AudioMeta]] parser). */
  def asAudio(docs: DataFrame): DataFrame = {
    val gen = udf((id: Long) =>
      wavBytes((1 + id % 2).toInt, if (id % 3 == 0) 16000 else 44100,
        (100 + id % 400).toInt, id))
    docs.select(col("doc_id"), gen(col("doc_id")).as("payload"))
  }

  /** Parse WAV container metadata from stored payloads — flattened. */
  def audioMeta(spark: SparkSession, mm: DataFrame): DataFrame = {
    val meta = graft.functions.ImageMetaFunctions.audioMeta(spark, col("payload"))
    mm.select(
      col("doc_id"),
      meta.getField("format").as("format"),
      meta.getField("channels").as("channels"),
      meta.getField("sample_rate").as("sample_rate"),
      meta.getField("bits").as("bits"),
      meta.getField("n_samples").as("n_samples"))
  }

  /** Parse container metadata from stored payloads (PNG/JPEG/GIF headers,
    * no pixel decode) — flattened for oracle comparison. */
  def imageMeta(spark: SparkSession, mm: DataFrame): DataFrame = {
    val meta = graft.functions.ImageMetaFunctions.imageMeta(spark, col("payload"))
    mm.select(
      col("doc_id"),
      meta.getField("format").as("format"),
      meta.getField("width").as("width"),
      meta.getField("height").as("height"),
      meta.getField("bit_depth").as("bit_depth"))
  }
}
