package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming gap-sessionization (flatMapGroupsWithState +
  * EventTimeTimeout): the stream replay must equal the batch
  * gaps-and-islands window exactly, including sessions that SPAN
  * micro-batches (open state carried across triggers) and final sessions
  * emitted by watermark timeout rather than by a closing event. */
class SessionizeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("sessionize-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = java.nio.file.Files.createTempDirectory("sessionize").toString
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  test("stream replay equals batch sessionization; state spans micro-batches") {
    val sp = spark; import sp.implicits._
    val gapMicros = 10L * 60 * 1000000 // 10 minutes
    val base = 1704067200000000L // 2024-01-01T00:00Z in micros
    def ev(id: Long, user: Long, offsetMin: Double, v: Double) =
      (id, new java.sql.Timestamp(base / 1000 + (offsetMin * 60000).toLong),
        user, v)
    // user 1: burst at 0-5 min, burst at 30-32 (2 sessions); the first
    // burst CROSSES the file boundary below. user 2: one long session
    // (every 8 min — never gapped). user 3: single event.
    val batch1 = Seq(
      ev(1, 1, 0, 1.0), ev(2, 1, 4, 2.0),
      ev(3, 2, 0, 5.0), ev(4, 2, 8, 5.0),
      ev(5, 3, 2, 9.0))
    val batch2 = Seq(
      ev(6, 1, 5, 3.0), // continues user 1's open session from batch 1
      ev(7, 1, 30, 4.0), ev(8, 1, 32, 4.5), // new session (gap 25 min)
      ev(9, 2, 16, 5.0), ev(10, 2, 24, 5.0)) // still one session
    // sentinel far in the future: advances the watermark so every real
    // session times out before the AvailableNow drain ends
    val sentinel = Seq(ev(99, -1, 24 * 60, 0.0))

    val data = s"$dir/events"
    for (b <- Seq(batch1, batch2, sentinel))
      b.toDF("event_id", "ts", "user_id", "value")
        .coalesce(1).write.format("strawboat").mode("append").save(data)

    val stream = spark.readStream.format("strawboat")
      .option("maxFilesPerTrigger", 1).load(data)
    val q = Sessionize.streamingSessions(stream,
        "ts", "user_id", "event_id", "value", gapMicros)
      .writeStream.format("memory").queryName("sess_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream drain timed out")

    val got = spark.sql(
      """SELECT user_id, session_start, session_end, n_events, total_value
        |FROM sess_out WHERE user_id >= 0
        |ORDER BY user_id, session_start""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq

    def m(min: Double) = base + (min * 60000000L).toLong
    val want = Seq(
      (1L, m(0), m(5), 3L, 6.0),    // spans batch 1 → 2
      (1L, m(30), m(32), 2L, 8.5),  // closed by watermark timeout
      (2L, m(0), m(24), 4L, 20.0),  // spans batches, never gapped
      (3L, m(2), m(2), 1L, 9.0))
    assert(got == want, s"got $got")
  }

  test("out-of-order events extend sessions backward and bridge intervals") {
    val sp = spark; import sp.implicits._
    val gapMicros = 10L * 60 * 1000000 // 10 minutes
    val base = 1704067200000000L
    def ev(id: Long, user: Long, offsetMin: Double, v: Double) =
      (id, new java.sql.Timestamp(base / 1000 + (offsetMin * 60000).toLong),
        user, v)
    // batch 1: user 7 at 60min; user 8 at 0 and 25min (two intervals).
    // batch 2 (watermark now 20min): user 7's 35/45/52min arrive LATE but
    // admissible — 45 extends 35 forward, 52 BRIDGES [35,45] with [60,60],
    // so the emitted session starts BEFORE the first-seen event. User 8 is
    // silent, so its sealed [0,0] must emit via the event-time timeout.
    val batch1 = Seq(ev(1, 7, 60, 1.0), ev(2, 8, 0, 1.0), ev(3, 8, 25, 2.0))
    val batch2 = Seq(ev(4, 7, 35, 2.0), ev(5, 7, 45, 3.0), ev(6, 7, 52, 4.0))
    val sentinel = Seq(ev(99, -1, 24 * 60, 0.0))
    val data = s"$dir/disorder"
    for (b <- Seq(batch1, batch2, sentinel))
      b.toDF("event_id", "ts", "user_id", "value")
        .coalesce(1).write.format("strawboat").mode("append").save(data)

    val stream = spark.readStream.format("strawboat")
      .option("maxFilesPerTrigger", 1).load(data)
    val q = Sessionize.streamingSessions(stream,
        "ts", "user_id", "event_id", "value", gapMicros,
        watermarkDelay = "40 minutes")
      .writeStream.format("memory").queryName("sess_disorder")
      .option("checkpointLocation", s"$dir/ckptDisorder")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream drain timed out")

    val got = spark.sql(
      """SELECT user_id, session_start, session_end, n_events, total_value
        |FROM sess_disorder WHERE user_id >= 0
        |ORDER BY user_id, session_start""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    def m(min: Double) = base + (min * 60000000L).toLong
    val want = Seq(
      (7L, m(35), m(60), 4L, 10.0), // late events moved start 60 -> 35
      (8L, m(0), m(0), 1L, 1.0),    // sealed + emitted by timeout alone
      (8L, m(25), m(25), 1L, 2.0))
    assert(got == want, s"got $got")
  }

  test("streaming first-seen dedup: one emission per digest, earliest batch wins") {
    val sp = spark; import sp.implicits._
    val data = s"$dir/dedup"
    // batch 1: ids 1-3, texts a/b/a; batch 2: ids 4-6 re-sending a/b/c
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("doc_id", "text")
      .coalesce(1).write.format("strawboat").mode("append").save(data)
    Seq((4L, "a"), (5L, "b"), (6L, "c")).toDF("doc_id", "text")
      .coalesce(1).write.format("strawboat").mode("append").save(data)
    val stream = spark.readStream.format("strawboat")
      .option("maxFilesPerTrigger", 1).load(data)
    val q = Dedup.streamingFirstSeen(stream, "doc_id", "text")
      .toDF("digest", "keep_id")
      .writeStream.format("memory").queryName("dd_out")
      .option("checkpointLocation", s"$dir/ddckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream drain timed out")
    val got = spark.sql("SELECT keep_id FROM dd_out ORDER BY keep_id")
      .collect().map(_.getLong(0)).toSeq
    // 'a' kept once with batch-1 min id 1; 'b' id 2; 'c' first seen batch 2
    assert(got == Seq(1L, 2L, 6L), s"got $got")
  }

  test("streaming near-dup first-seen: stream == batch replay under " +
      "ascending admission; same-batch and cross-batch dups drop") {
    val sp = spark; import sp.implicits._
    val data = s"$dir/neardup"
    val textA = "the quick brown fox jumps over the lazy dog by the river today"
    val textA2 = "the quick brown fox jumps over the lazy dog by the river now"
    val textA3 = "a quick brown fox jumps over the lazy dog by the river today"
    val textB = "uno dos tres quatro cinco seis siete ocho nueve diez once doce"
    val textC = "completely different content with no shared shingles at all here"
    // batch 1: 1 (base), 2 (near-dup of 1, SAME batch), 3 (distinct)
    Seq((1L, textA), (2L, textA2), (3L, textB)).toDF("doc_id", "text")
      .coalesce(1).write.format("strawboat").mode("append").save(data)
    // batch 2: 4 (near-dup of 1, CROSS batch), 5 (distinct), 6 (copy of 5)
    Seq((4L, textA3), (5L, textC), (6L, textC)).toDF("doc_id", "text")
      .coalesce(1).write.format("strawboat").mode("append").save(data)
    val stream = spark.readStream.format("strawboat")
      .option("maxFilesPerTrigger", 1).load(data)
    val q = Dedup.streamingNearDupFirstSeen(stream, "doc_id", "text",
        threshold = 0.5)
      .toDF("doc_id")
      .writeStream.format("memory").queryName("nd_out")
      .option("checkpointLocation", s"$dir/ndckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream drain timed out")
    val got = spark.sql("SELECT doc_id FROM nd_out ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    // the batch replay is the contract under ascending-id admission
    val batch = Dedup.nearDupFirstSeenBatch(
        spark.read.format("strawboat").load(data), "doc_id", "text",
        threshold = 0.5)
      .orderBy("sid").collect().map(_.getLong(0)).toSeq
    assert(got == batch, s"stream $got != batch replay $batch")
    // and the planted structure holds: bases/distincts kept, dups dropped
    assert(got.contains(1L) && got.contains(3L) && got.contains(5L), s"got $got")
    assert(!got.contains(2L) && !got.contains(6L), s"got $got")
    // guards
    intercept[IllegalArgumentException](Dedup.streamingNearDupFirstSeen(
      stream, "doc_id", "text", bands = 7))
    intercept[IllegalArgumentException](Dedup.streamingNearDupFirstSeen(
      stream, "doc_id", "text", threshold = 0.0))
  }

  test("streaming semantic first-seen: kept set == corpus minus " +
      "semanticDupIds; the greedy chain carries across batches") {
    val sp = spark; import sp.implicits._
    val data = s"$dir/semstream"
    val dim = 6
    def v(xs: Double*): Array[Float] = xs.toArray.map(_.toFloat)
    // cell 0 (axis 0) and cell 1 (axis 1); tau 0.98 ~ an 11.5-degree cap.
    // Angles in the (x0, x1) plane: 1 at 0deg, 2 at 10deg (cos 0.9848 —
    // same-batch drop), 5 = cell-1 base
    val b1 = Seq(
      (1L, v(1.0, 0.0, 0, 0, 0, 0)),
      (2L, v(0.98480775, 0.17364818, 0, 0, 0, 0)),
      (5L, v(0.0, 1.0, 0, 0, 0, 0)))
    // batch 2: 6 at 20deg — cos vs the DROPPED 2 is 0.9848 (>= tau) but
    // vs the KEPT 1 only 0.9397 (< tau): drops ONLY because the greedy
    // chain compares against dropped rows too, across a batch boundary;
    // 7 at 40deg = distinct in cell 0 (kept; <= 0.9397 vs all),
    // 8 at 5deg off axis 1 = near-copy of 5 (plain cross-batch drop)
    val b2 = Seq(
      (6L, v(0.93969262, 0.34202014, 0, 0, 0, 0)),
      (7L, v(0.76604444, 0.64278761, 0, 0, 0, 0)),
      (8L, v(0.08715574, 0.99619470, 0, 0, 0, 0)))
    b1.toDF("vec_id", "embedding").coalesce(1)
      .write.format("strawboat").mode("append").save(data)
    b2.toDF("vec_id", "embedding").coalesce(1)
      .write.format("strawboat").mode("append").save(data)
    val cents = Array(
      Array(1f, 0f, 0f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f, 0f, 0f))
    val tau = 0.98
    val stream = spark.readStream.format("strawboat")
      .option("maxFilesPerTrigger", 1).load(data)
    val q = Dedup.streamingSemanticFirstSeen(stream, cents, tau)
      .toDF("vec_id")
      .writeStream.format("memory").queryName("sem_out")
      .option("checkpointLocation", s"$dir/semckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream drain timed out")
    val got = spark.sql("SELECT vec_id FROM sem_out ORDER BY vec_id")
      .collect().map(_.getLong(0)).toSeq
    // the batch complement is the contract under ascending-id admission
    val corpus = spark.read.format("strawboat").load(data)
    val dups = Dedup.semanticDupIds(spark, corpus, cents, tau)
      .collect().map(_.getLong(0)).toSet
    val want = (b1 ++ b2).map(_._1).filterNot(dups).sorted
    assert(got == want, s"stream $got != batch complement $want")
    // planted structure: bases + the distinct kept; copies AND the
    // chained copy-of-a-dropped-copy dropped
    assert(got == Seq(1L, 5L, 7L), s"got $got")
    // guards
    intercept[IllegalArgumentException](
      Dedup.streamingSemanticFirstSeen(stream, cents, 0.0))
    intercept[IllegalArgumentException](
      Dedup.streamingSemanticFirstSeen(stream,
        Array.empty[Array[Float]], 0.5))
  }

  test("guards: non-positive gap refuses") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, new java.sql.Timestamp(0L), 1L, 1.0))
      .toDF("event_id", "ts", "user_id", "value")
    intercept[IllegalArgumentException](
      Sessionize.streamingSessions(df, "ts", "user_id", "event_id", "value", 0L))
  }

  test("value modes: fixed-point is loud, relative-tolerant, and widenable; unrounded is total") {
    // default cents: a 3-decimal value refuses with the remediation hint
    val e = intercept[IllegalArgumentException](Sessionize.FixedPoint(2).encode(1.005))
    assert(e.getMessage.contains("not representable at 2 decimal places"))
    assert(e.getMessage.contains("valueScale"))
    // the representability test is RELATIVE: a legitimately 2-decimal value
    // above 1e8 has ulp(value*100) > 1e-6, so an absolute epsilon would
    // reject it — this one must encode exactly
    assert(Sessionize.FixedPoint(2).encode(123456789.25) == 12345678925L)
    assert(Sessionize.FixedPoint(2).encode(19.99) == 1999L)
    // widening the scale admits what cents refused
    assert(Sessionize.FixedPoint(3).encode(1.005) == 1005L)
    // unrounded mode: ANY double round-trips through the Long state field
    for (v <- Seq(0.1 + 0.2, math.Pi, -3.7e-11, 0.0))
      assert(Sessionize.Unrounded.emit(Sessionize.Unrounded.encode(v)) == v)
    assert(Sessionize.Unrounded.emit(Sessionize.Unrounded.add(
      Sessionize.Unrounded.encode(0.1), Sessionize.Unrounded.encode(0.2)))
      == 0.1 + 0.2)
    assert(Sessionize.modeFor(-1) == Sessionize.Unrounded)
    assert(Sessionize.modeFor(2) == Sessionize.FixedPoint(2))
  }

  test("valueScale < 0 sessionizes non-monetary doubles end-to-end") {
    val sp = spark; import sp.implicits._
    val gapMicros = 10L * 60 * 1000000
    val base = 1704067200000000L
    def ev(id: Long, user: Long, offsetMin: Double, v: Double) =
      (id, new java.sql.Timestamp(base / 1000 + (offsetMin * 60000).toLong),
        user, v)
    // 3+-decimal durations: the default cents mode would refuse these
    val batch = Seq(ev(1, 1, 0, 0.125), ev(2, 1, 4, 0.375), ev(3, 2, 1, math.Pi))
    val sentinel = Seq(ev(99, -1, 24 * 60, 0.0))
    val data = s"$dir/unrounded"
    for (b <- Seq(batch, sentinel))
      b.toDF("event_id", "ts", "user_id", "value")
        .coalesce(1).write.format("strawboat").mode("append").save(data)
    val stream = spark.readStream.format("strawboat")
      .option("maxFilesPerTrigger", 1).load(data)
    val q = Sessionize.streamingSessions(stream,
        "ts", "user_id", "event_id", "value", gapMicros, valueScale = -1)
      .writeStream.format("memory").queryName("sess_unrounded")
      .option("checkpointLocation", s"$dir/ckptUnrounded")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream drain timed out")
    val got = spark.sql(
      """SELECT user_id, n_events, total_value FROM sess_unrounded
        |WHERE user_id >= 0 ORDER BY user_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 0.125 + 0.375), (2L, 1L, math.Pi)), s"got $got")
  }
}
