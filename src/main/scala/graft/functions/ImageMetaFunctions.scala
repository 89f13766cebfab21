package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-header metadata for an image payload in a `binary` column:
  * `struct<format, width, height, bit_depth>`, or NULL when the magic bytes
  * match no known container. Pure byte parsing of PNG IHDR / JPEG SOF / GIF
  * logical-screen headers — the "decode metadata without decoding pixels"
  * step a multimodal pipeline runs at full scale before routing payloads to
  * real (library-backed) decoders. Codegen-compatible single pass. */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageMeta.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"image_meta expects binary, got $other")
  }

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u16le(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def row(format: String, w: Long, h: Long, depth: Int): GenericInternalRow =
    // corrupt headers can carry out-of-range dims — the contract for an
    // invalid container is NULL, never a negative width
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue || depth <= 0) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(format), w.toInt, h.toInt, depth))

  def compute(b: Array[Byte]): GenericInternalRow = {
    if (b.length >= 25 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      // PNG: IHDR is always the first chunk — width/height/bit-depth at
      // fixed offsets after the 8-byte signature + 8-byte chunk header
      row("png", u32be(b, 16), u32be(b, 20), b(24) & 0xff)
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // JPEG: walk marker segments to the first SOFn frame header
      var i = 2
      while (i + 9 < b.length) {
        if ((b(i) & 0xff) != 0xff) return null
        val marker = b(i + 1) & 0xff
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
        else if (marker == 0x01) i += 2
        else if (marker == 0xff) i += 1 // fill byte before a marker: skip ONE
        else {
          val len = u16be(b, i + 2)
          if (len < 2) return null
          val isSof = (marker >= 0xc0 && marker <= 0xcf) &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof)
            return row("jpeg", u16be(b, i + 7).toLong, u16be(b, i + 5).toLong, b(i + 4) & 0xff)
          i += 2 + len
        }
      }
      null
    } else if (b.length >= 11 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') {
      // logical-screen packed byte: bits 4-6 are colour resolution - 1
      row("gif", u16le(b, 6).toLong, u16le(b, 8).toLong, ((b(10) >> 4) & 7) + 1)
    } else null
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("imgmeta", this, classOf[ImageMeta].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = $self.compute($c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageMeta {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false)))
}

/** Container-header metadata for an audio payload in a `binary` column:
  * `struct<format, channels, sample_rate, bits, n_samples>`, or NULL for
  * unknown magic. Parses the WAV RIFF fmt/data chunks — header-only, no
  * sample decode. */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioMeta.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"audio_meta expects binary, got $other")
  }

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3)

  def compute(b: Array[Byte]): GenericInternalRow = {
    if (b.length < 44 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var channels = -1
    var rate = -1L
    var bits = -1
    var dataLen = -1L
    var i = 12L
    while (i + 8 <= b.length) {
      val size = u32(b, i.toInt + 4) // unsigned chunk size
      if (tag(b, i.toInt, "fmt ") && i + 24 <= b.length) {
        channels = u16(b, i.toInt + 10)
        rate = u32(b, i.toInt + 12)
        bits = u16(b, i.toInt + 22)
      } else if (tag(b, i.toInt, "data")) dataLen = size
      // long arithmetic on the UNSIGNED size: a corrupt size near 2^32 must
      // terminate the walk (i grows past length), never loop or go negative
      i += 8L + size + (size & 1L)
    }
    if (channels <= 0 || rate <= 0 || rate > Int.MaxValue || bits <= 0 || dataLen < 0) null
    else {
      val frameBytes = channels * (bits / 8)
      new GenericInternalRow(Array[Any](
        UTF8String.fromString("wav"), channels, rate.toInt, bits,
        if (frameBytes > 0) (dataLen / frameBytes) else 0L))
    }
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("audmeta", this, classOf[AudioMeta].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = $self.compute($c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioMeta {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false)))
}

object ImageMetaFunctions {
  /** (name, impl class, builder) — shared by [[register]] and
    * [[graft.spark.GraftExtensions]]. */
  val descriptions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("image_meta", classOf[ImageMeta], (c: Seq[Expression]) => ImageMeta(c(0))),
    ("audio_meta", classOf[AudioMeta], (c: Seq[Expression]) => AudioMeta(c(0))))

  def register(spark: SparkSession): Unit =
    FunctionRegistration.register(spark, descriptions)

  def imageMeta(spark: SparkSession, bin: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("image_meta", bin)
  }

  def audioMeta(spark: SparkSession, bin: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("audio_meta", bin)
  }
}
