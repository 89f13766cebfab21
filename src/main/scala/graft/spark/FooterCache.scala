package graft.spark

import java.util.concurrent.atomic.AtomicLong

import graft.format.{StrawFileReader, StrawFooter}

/** Process-wide cache of parsed `.strb` footers, keyed by
  * `(path, mtime, length)` — content-addressed under the commit protocol,
  * which bumps a file's mtime at commit time before the rename that makes
  * it visible ([[StrawCommitProtocol.finalizeFiles]]), so any republished
  * file misses the stale entry by key.
  *
  * Why this exists: at 100k-file / 100 TB table scale, planning-metadata IO
  * is the dominant per-query cost if every scan re-reads every surviving
  * footer (the reference is a single-file library and reads one footer per
  * open, src/read/reader.rs:168-241; parquet amortizes listings with
  * summary files / external catalogs). With this cache:
  *  - the driver pays footer IO once per file VERSION, not once per query —
  *    a repeated query over an unchanged table does zero footer reads
  *    (directory listing supplies the (mtime, len) keys, no per-file RPC);
  *  - an executor pays footer IO once per file, not once per page-range
  *    input partition of that file (a large file splits into many).
  *
  * Entries are LRU-bounded ([[maxEntries]]); a footer is O(pages × columns)
  * small, so the bound caps driver memory at extreme file counts without a
  * time-based expiry (stale keys of deleted files simply age out).
  *
  * Key-collision caveat (shared with every (path, mtime, length)-keyed
  * metadata cache, e.g. HDFS-style listing caches): two VERSIONS of the
  * same path aliasing requires identical name, byte length, and mtime
  * millisecond. Files produced by this library's own writers embed a task
  * uuid in the name, so rewrites always mint new paths; only an external
  * tool overwriting a file in place within one millisecond at equal length
  * could alias, and such a writer violates the commit protocol anyway.
  */
object FooterCache {
  final case class Key(path: String, mtime: Long, len: Long)

  /** LRU capacity. Overridable before first use via
    * `-Dgraft.footerCache.maxEntries=N`; 0 disables caching. */
  @volatile var maxEntries: Int =
    sys.props.get("graft.footerCache.maxEntries").map(_.toInt).getOrElse(16384)

  private val map = new java.util.LinkedHashMap[Key, StrawFooter](1024, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Key, StrawFooter]): Boolean =
      size() > maxEntries
  }

  /** Count of footer loads that actually hit storage (cache misses) —
    * the observable for "the second query performs zero footer IO" specs. */
  val loads = new AtomicLong()

  /** The parsed footer of `path` at version `(mtime, len)`, loading it from
    * storage on first sight of that version. Concurrent first loads of the
    * same key may each read (last write wins) — footers are immutable, so
    * this is benign and avoids holding the lock across IO. */
  def get(path: String, mtime: Long, len: Long): StrawFooter =
    getOrLoad(Key(path, mtime, len),
      StrawIO.withInput(path)(StrawFileReader.readFooter))

  /** Variant for callers that already hold the file open (task readers) —
    * a miss reads the footer from `in` instead of re-opening. */
  def get(path: String, in: StrawIO.StatusInput): StrawFooter =
    getOrLoad(Key(path, in.mtime, in.length), StrawFileReader.readFooter(in))

  private def getOrLoad(key: Key, load: => StrawFooter): StrawFooter = {
    if (maxEntries <= 0) { loads.incrementAndGet(); return load }
    val hit = map.synchronized(map.get(key))
    if (hit != null) hit
    else {
      loads.incrementAndGet()
      val f = load
      map.synchronized(map.put(key, f))
      f
    }
  }

  def clear(): Unit = map.synchronized(map.clear())
  def size: Int = map.synchronized(map.size())
}
