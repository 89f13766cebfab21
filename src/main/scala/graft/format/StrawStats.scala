package graft.format

/** Inspect utility for `.strb` files: per-column, per-page layout, chosen
  * codec, sizes and zone-map stats — the debugging tool for codec choices
  * at scale (reference: stat_simple, src/stat.rs:62-147).
  *
  * CLI: `sbt "runMain graft.format.StrawStats <file-or-dir>"`.
  */
object StrawStats {

  final case class PageStat(
      column: String,
      dataType: String,
      page: Int,
      numValues: Int,
      nullCount: Int,
      compBytes: Long,
      codec: String,
      statsKind: Int,
      min: Long,
      max: Long,
      bloomBytes: Int = 0)

  /** Per-page stats of one file, one row per LEAF page (nested columns
    * surface as dotted leaf paths, e.g. `meta.lang`). The codec is sniffed
    * from the leaf's first encoded block: ancestor level headers are parsed
    * through (validity [+ lengths] per level), then the leaf's validity,
    * then the data block whose leading byte is the codec id. */
  def fileStats(path: String): Seq[PageStat] = {
    val in = new LocalFileInput(path)
    try {
      val footer = StrawFileReader.readFooter(in)
      val leafInfo: Seq[(String, Array[Int], String)] =
        footer.schema.fields.toSeq.flatMap { f =>
          val names = LeafLayout.leafNames(f.dataType)
          val lvs = LeafLayout.leaves(f.dataType)
          names.zip(lvs).map { case (n, (kinds, leafDt)) =>
            (if (n.isEmpty) f.name else s"${f.name}.$n", kinds, leafDt.simpleString)
          }
        }
      leafInfo.zipWithIndex.flatMap { case ((name, kinds, dtName), li) =>
        val cm = footer.columns(li)
        var off = cm.offset
        cm.pages.zipWithIndex.map { case (pm, p) =>
          // A stats sweep must not read whole pages. A flat leaf's codec id
          // sits right after the validity block, whose size is bounded by
          // 8 (counts) + 9 (block header) + ceil(n/8) (bitmap) + 1; nested
          // leaves carry variable-size ancestor level headers, so cap the
          // sniff read and report codec n/a past the cap (stats/sizes stay
          // exact either way — they come from the footer).
          val sniffCap =
            if (kinds.isEmpty) 8L + 9L + (pm.numValues + 7) / 8 + 1
            else 256L * 1024
          val codecId =
            try {
              val bytes = in.readFully(off, math.min(pm.compLen, sniffCap).toInt)
              val buf = ByteIO.reader(bytes)
              kinds.foreach { k =>
                val (n, _) = ValidityReader.read(buf)
                if (k == LeafLayout.LevelRep) { PageDecoder.readLengths(buf, n): Unit }
              }
              ValidityReader.read(buf) // the leaf's own validity
              if (buf.remaining() > 0) buf.get() & 0xff else -1
            } catch { case _: Exception => -1 }
          off += pm.compLen
          PageStat(name, dtName, p, pm.numValues, pm.nullCount, pm.compLen,
            if (codecId < 0) "n/a" else Codec.name(codecId),
            pm.statsKind, pm.min, pm.max,
            if (pm.bloom == null) 0 else pm.bloom.length)
        }
      }.toSeq
    } finally in.close()
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: StrawStats <file-or-dir>")
    val files =
      if (new java.io.File(args(0)).isDirectory)
        new java.io.File(args(0)).listFiles()
          .filter(_.getName.endsWith(StrawFormat.Extension)).map(_.getPath).sorted
      else Array(args(0))
    for (f <- files) {
      println(s"== $f")
      val stats = fileStats(f)
      val byCol = stats.groupBy(s => (s.column, s.dataType))
      byCol.toSeq.sortBy(_._1._1).foreach { case ((col, dt), pages) =>
        val codecs = pages.groupBy(_.codec).map { case (c, ps) => s"$c x${ps.size}" }
          .mkString(",")
        val bytes = pages.map(_.compBytes).sum
        val rows = pages.map(_.numValues.toLong).sum
        val nulls = pages.map(_.nullCount.toLong).sum
        val bloom = pages.map(_.bloomBytes.toLong).sum
        println(f"  $col%-20s $dt%-12s pages=${pages.size}%-4d rows=$rows%-8d " +
          f"nulls=$nulls%-6d bytes=$bytes%-10d codecs=$codecs" +
          (if (bloom > 0) s" bloomBytes=$bloom" else ""))
      }
    }
  }
}
