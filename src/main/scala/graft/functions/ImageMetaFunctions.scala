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
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(format), w.toInt, h.toInt, depth))

  def compute(b: Array[Byte]): GenericInternalRow = {
    if (b.length >= 24 &&
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
        else if (marker == 0x01 || marker == 0xff) i += 2
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
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') {
      row("gif", u16le(b, 6).toLong, u16le(b, 8).toLong, 8)
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

object ImageMetaFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier("image_meta")
    if (!reg.functionExists(ident))
      reg.registerFunction(ident,
        new ExpressionInfo(classOf[ImageMeta].getName, "image_meta"),
        (children: Seq[Expression]) => ImageMeta(children(0)))
  }

  def imageMeta(spark: SparkSession, bin: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("image_meta", bin)
  }
}
