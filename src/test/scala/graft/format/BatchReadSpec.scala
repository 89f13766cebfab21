package graft.format

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The eager batch tier must agree with the streaming reader on every
  * value — same page decoders, so the only new surface is the per-column
  * page concatenation ([[BatchRead.ConcatPage]] index math) and the
  * projection plumbing. Shapes mirror the reference's batch tests
  * (reference: tests/it/io.rs runs its chunks through BOTH readers). */
class BatchReadSpec extends AnyFunSuite {

  private def write(schema: StructType, rows: Seq[InternalRow],
      opts: WriteOptions): (ByteArrayInput, StrawFooter) = {
    val w = new StrawFileWriter(schema, opts)
    rows.foreach(w.write)
    val in = new ByteArrayInput(w.finish())
    (in, StrawFileReader.readFooter(in))
  }

  private def extract(r: InternalRow, i: Int, dt: DataType): Any =
    if (r.isNullAt(i)) null else r.get(i, dt)

  private def norm(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (b: Array[Byte], BinaryType) => b.toSeq
    case (a: ArrayData, ArrayType(et, _)) =>
      a.toObjectArray(et).map(norm(_, et)).toSeq
    case (m: MapData, MapType(kt, vt, _)) =>
      m.keyArray().toObjectArray(kt).map(norm(_, kt)).toSeq
        .zip(m.valueArray().toObjectArray(vt).map(norm(_, vt)).toSeq).toMap
    case (r: InternalRow, st: StructType) =>
      st.fields.zipWithIndex.map { case (f, i) =>
        norm(extract(r, i, f.dataType), f.dataType)
      }.toSeq
    case (f: Float, FloatType) => java.lang.Float.floatToRawIntBits(f)
    case (d: Double, DoubleType) => java.lang.Double.doubleToRawLongBits(d)
    case (x, _) => x
  }

  /** streaming == batch, field by field, over the given projection. */
  private def assertAgree(in: ByteArrayInput, footer: StrawFooter,
      fields: Array[Int]): Unit = {
    val schema = StructType(fields.map(footer.schema.fields(_)))
    val streamed = StrawFileReader.rowsByField(in, footer, fields).toSeq
    val batch = BatchRead.readColumns(in, footer, fields)
    assert(batch.numRows == streamed.length)
    assert(batch.schema == schema)
    val rows = batch.toRows.toSeq
    streamed.zip(rows).zipWithIndex.foreach { case ((s, b), i) =>
      schema.fields.zipWithIndex.foreach { case (f, c) =>
        assert(norm(extract(s, c, f.dataType), f.dataType) ==
          norm(extract(b, c, f.dataType), f.dataType),
          s"row $i col ${f.name}")
      }
    }
  }

  test("multi-type flat chunk: batch == streaming across page boundaries") {
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("dec", DecimalType(12, 2))))
    val rnd = new Random(7)
    val rows = (0 until 1000).map { i =>
      def nv[T](v: T): Any = if (rnd.nextDouble() < 0.15) null else v
      new GenericInternalRow(Array[Any](
        nv(rnd.nextBoolean()), nv(rnd.nextInt()), nv(rnd.nextLong()),
        nv(rnd.nextFloat()), nv(rnd.nextDouble()),
        nv(UTF8String.fromString(s"s$i-${rnd.nextInt(100)}")),
        nv(Array.fill(rnd.nextInt(9))(rnd.nextInt().toByte)),
        nv(org.apache.spark.sql.types.Decimal(BigDecimal(rnd.nextInt(100000), 2), 12, 2))))
    }
    // 64-row pages force ~16 page groups: the concat index math is live
    val (in, footer) = write(schema, rows, WriteOptions(maxPageSize = 64))
    assert(footer.columns(0).pages.length > 4)
    assertAgree(in, footer, schema.fields.indices.toArray)
    // projection: a strict subset in non-schema order
    assertAgree(in, footer, Array(5, 1))
  }

  test("nested list/map/struct: batch == streaming") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("arr", ArrayType(IntegerType, containsNull = true)),
      StructField("m", MapType(StringType, LongType, valueContainsNull = true)),
      StructField("st", StructType(Seq(
        StructField("x", DoubleType), StructField("y", StringType))))))
    val rnd = new Random(11)
    val rows = (0 until 400).map { i =>
      val arr =
        if (rnd.nextDouble() < 0.1) null
        else new GenericArrayData(Array.fill[Any](rnd.nextInt(5))(
          if (rnd.nextBoolean()) rnd.nextInt() else null))
      val m =
        if (rnd.nextDouble() < 0.1) null
        else {
          val n = rnd.nextInt(4)
          new ArrayBasedMapData(
            new GenericArrayData(Array.tabulate[Any](n)(k => UTF8String.fromString(s"k$k"))),
            new GenericArrayData(Array.fill[Any](n)(
              if (rnd.nextBoolean()) rnd.nextLong() else null)))
        }
      val st =
        if (rnd.nextDouble() < 0.1) null
        else new GenericInternalRow(Array[Any](rnd.nextDouble(),
          if (rnd.nextBoolean()) UTF8String.fromString(s"v$i") else null))
      new GenericInternalRow(Array[Any](i.toLong, arr, m, st))
    }
    val (in, footer) = write(schema, rows, WriteOptions(maxPageSize = 50))
    assertAgree(in, footer, schema.fields.indices.toArray)
    assertAgree(in, footer, Array(3, 1)) // nested-only projection
  }

  test("random access through the concat view is position-stable") {
    val schema = StructType(Seq(StructField("v", LongType)))
    val rows = (0 until 500).map(i => new GenericInternalRow(Array[Any](i * 3L)))
    val (in, footer) = write(schema, rows, WriteOptions(maxPageSize = 32))
    val col = BatchRead.readColumns(in, footer).columns(0)
    // backward, forward, and jumping reads all resolve the right page
    Seq(499, 0, 250, 31, 32, 33, 498, 1, 464).foreach { i =>
      assert(col.value(i) == i * 3L, s"index $i")
      assert(!col.isNullAt(i))
    }
  }

  test("readFile convenience: local path + named projection; empty file") {
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))
    val rows = (0 until 100).map(i =>
      new GenericInternalRow(Array[Any](i, UTF8String.fromString(s"r$i"))))
    val dir = java.nio.file.Files.createTempDirectory("batchread").toFile
    val path = new java.io.File(dir, "f.strb").getAbsolutePath
    val w = new StrawFileWriter(schema, WriteOptions(maxPageSize = 40))
    rows.foreach(w.write)
    val img = w.finish()
    java.nio.file.Files.write(java.nio.file.Paths.get(path), img)
    val batch = BatchRead.readFile(path, Seq("b"))
    assert(batch.numRows == 100 && batch.schema.fieldNames.toSeq == Seq("b"))
    assert(batch.columns(0).value(73).toString == "r73")
    intercept[IllegalArgumentException](BatchRead.readFile(path, Seq("nope")))
    // zero-row file
    val w2 = new StrawFileWriter(schema, WriteOptions())
    val img2 = w2.finish()
    val in2 = new ByteArrayInput(img2)
    val b2 = BatchRead.readColumns(in2, StrawFileReader.readFooter(in2))
    assert(b2.numRows == 0 && b2.toRows.isEmpty)
  }
}
