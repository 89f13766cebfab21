package graft.format

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Leaf-flattening of nested schemas (format v2): numbering, pruned-subset
  * resolution, dotted-attribute leaf lookup, and pruned reassembly at the
  * reader level — including proof that unrequested sibling leaves are never
  * decoded. */
class LeafLayoutSpec extends AnyFunSuite {

  private val meta = StructType(Seq(
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", IntegerType),
    StructField("mime", StringType)))
  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("meta", meta),
    StructField("tags", ArrayType(StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType))))),
    StructField("props", MapType(StringType, LongType)),
    StructField("score", DoubleType)))

  test("leaf counting and per-field starts") {
    assert(LeafLayout.leafCount(schema) == 1 + 4 + 2 + 2 + 1)
    assert(StrawFooter(schema, 0, Array.empty).leafStarts.toSeq == Seq(0, 1, 5, 7, 9, 10))
    assert(LeafLayout.leafNames(meta) == Seq("lang", "source", "n_chars", "mime"))
  }

  test("prunedLeafIdx: struct subsets resolve to the right leaves, others reject") {
    // meta pruned to (mime, lang) — request order preserved, file offsets right
    val pruned = StructType(Seq(StructField("mime", StringType), StructField("lang", StringType)))
    assert(LeafLayout.prunedLeafIdx(meta, pruned).get.toSeq == Seq(3, 0))
    // array<struct> element pruning
    val arr = ArrayType(StructType(Seq(
      StructField("k", StringType), StructField("v", IntegerType))))
    val arrPruned = ArrayType(StructType(Seq(StructField("v", IntegerType))))
    assert(LeafLayout.prunedLeafIdx(arr, arrPruned).get.toSeq == Seq(1))
    // not a subset: unknown field, type change, flat mismatch
    assert(LeafLayout.prunedLeafIdx(meta,
      StructType(Seq(StructField("nope", StringType)))).isEmpty)
    assert(LeafLayout.prunedLeafIdx(meta,
      StructType(Seq(StructField("lang", IntegerType)))).isEmpty)
    assert(LeafLayout.prunedLeafIdx(IntegerType, LongType).isEmpty)
    assert(LeafLayout.prunedLeafIdx(IntegerType, IntegerType).get.toSeq == Seq(0))
    // a zero-field req struct has no leaf to carry validity — must widen,
    // not resolve to an empty leaf set the assembler would index into
    assert(LeafLayout.prunedLeafIdx(meta, StructType(Seq.empty)).isEmpty)
    assert(LeafLayout.prunedLeafIdx(
      ArrayType(meta), ArrayType(StructType(Seq.empty))).isEmpty)
  }

  test("resolveLeaf: dotted struct paths resolve, array/map/nested targets do not") {
    assert(LeafLayout.resolveLeaf(schema, "id") == Some((0, LongType)))
    assert(LeafLayout.resolveLeaf(schema, "meta.lang") == Some((1, StringType)))
    assert(LeafLayout.resolveLeaf(schema, "meta.n_chars") == Some((3, IntegerType)))
    assert(LeafLayout.resolveLeaf(schema, "score") == Some((9, DoubleType)))
    // a struct itself is not a stats-bearing leaf
    assert(LeafLayout.resolveLeaf(schema, "meta").isEmpty)
    // paths through arrays/maps are element-aligned — no row-level stats
    assert(LeafLayout.resolveLeaf(schema, "tags.k").isEmpty)
    assert(LeafLayout.resolveLeaf(schema, "props").isEmpty)
    assert(LeafLayout.resolveLeaf(schema, "missing.x").isEmpty)
    // backtick quoting: a field literally named "a.b"
    val dotted = StructType(Seq(StructField("a.b", StructType(Seq(
      StructField("c", IntegerType))))))
    assert(LeafLayout.resolveLeaf(dotted, "`a.b`.c") == Some((0, IntegerType)))
    assert(LeafLayout.splitAttr("`a.b`.c").toSeq == Seq("a.b", "c"))
    assert(LeafLayout.splitAttr("m.lang").toSeq == Seq("m", "lang"))
    assert(LeafLayout.splitAttr("```x``y`").toSeq == Seq("`x`y"))
  }

  private def writeRows(schema: StructType, rows: Seq[InternalRow],
      pageSize: Int = 64): Array[Byte] = {
    val w = new StrawFileWriter(schema, WriteOptions(maxPageSize = pageSize))
    rows.foreach(w.write)
    w.finish()
  }

  private def mkRow(vals: Any*): InternalRow = InternalRow.fromSeq(vals)

  test("pruned read of struct/array/map columns equals full read, sibling leaves untouched") {
    val n = 500
    val rows = (0 until n).map { i =>
      val metaRow =
        if (i % 11 == 0) null
        else mkRow(UTF8String.fromString(s"lang$i"),
          if (i % 7 == 0) null else UTF8String.fromString(s"src$i"), i, UTF8String.fromString("mime"))
      val tags =
        if (i % 13 == 0) null
        else new GenericArrayData((0 until i % 4).map(j =>
          mkRow(UTF8String.fromString(s"k$j"), if (j == 2) null else j * i)).toArray[Any])
      val props = new ArrayBasedMapData(
        new GenericArrayData(Array[Any](UTF8String.fromString(s"p$i"))),
        new GenericArrayData(Array[Any](i.toLong)))
      mkRow(i.toLong, metaRow, tags, props, i * 0.5)
    }
    val bytes = writeRows(schema, rows)
    val in = new ByteArrayInput(bytes)
    val footer = StrawFileReader.readFooter(in)
    assert(footer.columns.length == 10)
    assert(footer.columns(0).pages.forall(_.numValues <= 64))

    // full read round-trips
    val full = StrawFileReader.rowsByField(in, footer, Array(0, 1, 2, 3, 4)).toSeq
    assert(full.size == n)
    assert(full(1).getStruct(1, 4).getUTF8String(0).toString == "lang1")
    assert(full(0).isNullAt(1)) // i=0: meta null
    assert(full(2).getArray(2).numElements() == 2)

    // pruned read: meta -> (n_chars, lang) only, tags -> element struct<v>
    val prunedMeta = StructType(Seq(
      StructField("n_chars", IntegerType), StructField("lang", StringType)))
    val prunedTags = ArrayType(StructType(Seq(StructField("v", IntegerType))))
    val proj = Array(
      ProjCol.plan(footer, 1, prunedMeta),
      ProjCol.plan(footer, 2, prunedTags),
      ProjCol.plan(footer, 3, footer.schema.fields(3).dataType))
    val pruned = StrawFileReader.rows(in, footer, proj).toSeq
    assert(pruned.size == n)
    for (i <- 0 until n) {
      val f = full(i)
      val p = pruned(i)
      if (f.isNullAt(1)) assert(p.isNullAt(0))
      else {
        val fm = f.getStruct(1, 4)
        val pm = p.getStruct(0, 2)
        assert(pm.getInt(0) == fm.getInt(2))
        assert(pm.getUTF8String(1) == fm.getUTF8String(0))
      }
      if (f.isNullAt(2)) assert(p.isNullAt(1))
      else {
        val fa = f.getArray(2)
        val pa = p.getArray(1)
        assert(pa.numElements() == fa.numElements())
        for (j <- 0 until fa.numElements()) {
          val fs = fa.getStruct(j, 2)
          if (fs.isNullAt(1)) assert(pa.getStruct(j, 1).isNullAt(0))
          else assert(pa.getStruct(j, 1).getInt(0) == fs.getInt(1))
        }
      }
      assert(p.getMap(2).numElements() == f.getMap(3).numElements())
    }

    // sibling-leaf isolation: corrupt every leaf EXCEPT id and the two
    // requested meta leaves (lang=1, n_chars=3); the pruned projection
    // still decodes, the full struct read fails on the corrupted source leaf
    val keepLeaves = Set(0, 1, 3)
    val corrupted = bytes.clone()
    for (l <- footer.columns.indices if !keepLeaves(l)) {
      val offs = footer.columns(l).pageOffsets
      for (p <- footer.columns(l).pages.indices) {
        val len = math.min(16L, footer.columns(l).pages(p).compLen).toInt
        java.util.Arrays.fill(corrupted, offs(p).toInt, offs(p).toInt + len, 0x5a.toByte)
      }
    }
    val cin = new ByteArrayInput(corrupted)
    val prunedOk = StrawFileReader.rows(cin, footer,
      Array(ProjCol.plan(footer, 0, LongType), ProjCol.plan(footer, 1, prunedMeta))).toSeq
    assert(prunedOk.size == n)
    assert(!prunedOk(1).isNullAt(1) && prunedOk(1).getStruct(1, 2).getInt(0) == 1)
    intercept[Exception] {
      StrawFileReader.rowsByField(cin, footer, Array(1)).foreach(_ => ())
    }
  }

  test("nested zone maps: struct-path leaf stats prune pages soundly") {
    // rows sorted by meta.n_chars so pages carve the domain
    val s2 = StructType(Seq(
      StructField("id", LongType),
      StructField("meta", StructType(Seq(
        StructField("lang", StringType), StructField("n_chars", IntegerType))))))
    val rows = (0 until 1000).map(i =>
      mkRow(i.toLong, mkRow(UTF8String.fromString(if (i < 500) "en" else "de"), i)))
    val in = new ByteArrayInput(writeRows(s2, rows, pageSize = 100))
    val footer = StrawFileReader.readFooter(in)
    val nPages = footer.columns(0).pages.length
    assert(nPages == 10)
    import org.apache.spark.sql.sources._
    def kept(f: Filter): Seq[Int] =
      (0 until nPages).filter(graft.spark.ZoneMapFilter.keptPages(footer, Array(f)))
    // page 8 spans 800..899: a strict > 899 proves it empty and prunes it
    assert(kept(GreaterThan("meta.n_chars", 899)) == Seq(9))
    assert(kept(GreaterThanOrEqual("meta.n_chars", 899)) == Seq(8, 9))
    assert(kept(EqualTo("meta.n_chars", 250)) == Seq(2))
    assert(kept(LessThan("meta.n_chars", 100)) == Seq(0))
    // string-prefix stats on the nested lang leaf
    assert(kept(EqualTo("meta.lang", "de")) == (5 until 10))
    // results stay exact under pruning
    val keepFn = graft.spark.ZoneMapFilter.keptPages(footer,
      Array(GreaterThanOrEqual("meta.n_chars", 899)))
    val got = StrawFileReader.rowsByField(in, footer, Array(0, 1), keepPage = keepFn)
      .map(r => r.getStruct(1, 2).getInt(1)).toSeq
    assert(got == (800 until 1000)) // pages 8,9 kept; Spark re-filters above
  }
}
