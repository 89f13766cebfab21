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
      max: Long)

  /** Per-page stats of one file. The codec is read from the first encoded
    * block after the validity section (for nested columns this is the
    * lengths block — still the page's leading encoding). */
  def fileStats(path: String): Seq[PageStat] = {
    val in = new LocalFileInput(path)
    try {
      val footer = StrawFileReader.readFooter(in)
      footer.schema.fields.zipWithIndex.flatMap { case (f, c) =>
        val cm = footer.columns(c)
        var off = cm.offset
        cm.pages.zipWithIndex.map { case (pm, p) =>
          val head = in.readFully(off, math.min(32L, pm.compLen).toInt)
          val buf = ByteIO.reader(head)
          buf.getInt() // row count
          val nullCount = buf.getInt()
          val codecId =
            if (nullCount > 0) {
              // skip the validity block: codec u8 | comp u32 | raw u32 | data
              buf.get(); val vLen = buf.getInt(); buf.getInt()
              val codecPos = 8 + 9 + vLen
              if (codecPos < pm.compLen) in.readFully(off + codecPos, 1)(0) & 0xff
              else -1
            } else if (head.length > 8) head(8) & 0xff
            else -1
          off += pm.compLen
          PageStat(f.name, f.dataType.simpleString, p, pm.numValues,
            pm.nullCount, pm.compLen,
            if (codecId < 0) "n/a" else Codec.name(codecId),
            pm.statsKind, pm.min, pm.max)
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
        println(f"  $col%-20s $dt%-12s pages=${pages.size}%-4d rows=$rows%-8d " +
          f"nulls=$nulls%-6d bytes=$bytes%-10d codecs=$codecs")
      }
    }
  }
}
