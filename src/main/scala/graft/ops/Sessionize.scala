package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-sessionization — the custom-state streaming shape:
  * `flatMapGroupsWithState` holds each user's open session INTERVALS in
  * the state store and emits a session only once the event-time watermark
  * passes `last + gap`, when nothing admissible can extend or bridge it —
  * so the emitted set equals the batch gaps-and-islands window over the
  * admitted events under ANY arrival order the watermark tolerates, not
  * just time-ordered replays. Out-of-order events extend a session
  * backward (`start` moves down) and can BRIDGE two intervals into one;
  * both cases are interval merges, kept per user as a small sorted list.
  * Output is append-mode; state is bounded by each user's unsealed
  * sessions (one, plus however many the disorder horizon keeps open).
  * The batch equivalent is the lag/gaps-and-islands window (SparkEntry
  * q_events_sessions) — the same rule replayed incrementally, so a batch
  * oracle checks the stream.
  */
object Sessionize {

  /** One input event (ets carries the watermark; tsu the exact micros). */
  case class In(user_id: Long, ets: java.sql.Timestamp, tsu: Long,
      event_id: Long, value: Double)
  /** One session interval, open (in state) or closed (emitted). `sumCents`
    * holds the running value total as ONE Long whose meaning the
    * [[ValueMode]] fixes: fixed-point integer units at 10^valueScale
    * (exact and order-independent — a double sum would fold in stream
    * interval-merge order while the batch oracle sums in group order, and
    * round(x, 2) equality across the two can flip on a half-ulp boundary),
    * or the raw IEEE754 bits of a running double in unrounded mode. Both
    * modes share this field so the flatMapGroupsWithState STATE SCHEMA is
    * one case class — NOTE the schema already changed in round 13
    * (Double sum → Long sumCents): a streaming query resuming a
    * pre-round-13 checkpoint must discard it and rebuild. */
  case class Interval(start: Long, last: Long, n: Long, sumCents: Long)
  /** Per-user state: gap-separated intervals, sorted by start. */
  case class SessState(sessions: Seq[Interval])
  /** One closed session (timestamps in epoch micros). */
  case class Out(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, total_value: Double)

  /** How session totals accumulate inside the Long state field. */
  private[ops] sealed trait ValueMode extends Serializable {
    def encode(value: Double): Long
    def add(a: Long, b: Long): Long
    def emit(acc: Long): Double
  }
  /** Exact fixed-point at 10^scale units — loud on inputs the fixed point
    * cannot represent (silently truncating a 3-decimal value into cents
    * would corrupt sums). The representability test is RELATIVE: above
    * ~1e8 the ulp of value·10^scale exceeds any absolute epsilon, so an
    * absolute test would reject legitimately scale-decimal values. */
  private[ops] final case class FixedPoint(scale: Int) extends ValueMode {
    private val factor = math.pow(10.0, scale)
    def encode(value: Double): Long = {
      val units = math.rint(value * factor)
      require(math.abs(value * factor - units) <=
          1e-6 * math.max(1.0, math.abs(value * factor)),
        s"streamingSessions: value $value is not representable at " +
          s"$scale decimal places — total_value accumulates in exact " +
          s"fixed-point (valueScale = $scale); widen valueScale or pass " +
          "valueScale < 0 for unrounded double totals")
      units.toLong
    }
    def add(a: Long, b: Long): Long = a + b
    def emit(units: Long): Double = units / factor
  }
  /** Unrounded double totals carried as raw bits — accepts ANY double
    * (durations, scores) but the total folds in stream interval-merge
    * order, so an exact-equality batch oracle needs a tolerance. */
  private[ops] case object Unrounded extends ValueMode {
    def encode(value: Double): Long = java.lang.Double.doubleToLongBits(value)
    def add(a: Long, b: Long): Long = java.lang.Double.doubleToLongBits(
      java.lang.Double.longBitsToDouble(a) + java.lang.Double.longBitsToDouble(b))
    def emit(acc: Long): Double = java.lang.Double.longBitsToDouble(acc)
  }
  private[ops] def modeFor(valueScale: Int): ValueMode =
    if (valueScale < 0) Unrounded else FixedPoint(valueScale)

  /** Fold one event into the interval set: every interval within `gap` of
    * the event merges with it (an event between two near intervals bridges
    * them), the rest stay. */
  private[ops] def insert(intervals: Seq[Interval], tsu: Long, value: Double,
      gapMicros: Long, mode: ValueMode = FixedPoint(2)): Seq[Interval] = {
    val (near, far) = intervals.partition(s =>
      tsu >= s.start - gapMicros && tsu <= s.last + gapMicros)
    val merged = near.foldLeft(Interval(tsu, tsu, 1L, mode.encode(value))) { (a, s) =>
      Interval(math.min(a.start, s.start), math.max(a.last, s.last),
        a.n + s.n, mode.add(a.sumCents, s.sumCents))
    }
    (far :+ merged).sortBy(_.start)
  }

  /** Sessionize a (micro-batch) event stream: events group by `userCol`,
    * a gap of more than `gapMicros` between consecutive events closes the
    * session. A session emits when the WATERMARK passes its `last + gap`
    * (via EventTimeTimeout or on the next data batch, whichever comes
    * first) — any event the watermark still admits merges correctly, in
    * any order. Sessions whose close the watermark never passes stay in
    * state; drain with a sentinel event far in the future, as the driver
    * query does. `watermarkDelay` must cover the source's disorder.
    *
    * `valueScale` picks how `total_value` accumulates: `>= 0` is exact
    * fixed-point at that many decimal places (default 2 — monetary cents;
    * inputs with more decimals FAIL LOUDLY, and the total is
    * order-independent so a batch replay matches bit-for-bit), `< 0` is
    * unrounded double accumulation (accepts any value — durations,
    * scores — but the sum folds in stream merge order, so compare against
    * a batch oracle with a tolerance, not exact equality). */
  def streamingSessions(events: DataFrame, tsCol: String, userCol: String,
      idCol: String, valueCol: String, gapMicros: Long,
      watermarkDelay: String = "1 second",
      valueScale: Int = 2): Dataset[Out] = {
    require(gapMicros > 0, "streamingSessions: gap must be positive")
    val mode = modeFor(valueScale)
    val spark = events.sparkSession
    import spark.implicits._
    val gapMillis = gapMicros / 1000
    events.select(
        col(userCol).cast("long").as("user_id"),
        col(tsCol).cast("timestamp").as("ets"),
        unix_micros(col(tsCol).cast("timestamp")).as("tsu"),
        col(idCol).cast("long").as("event_id"),
        col(valueCol).cast("double").as("value"))
      .withWatermark("ets", watermarkDelay)
      .as[In]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Out](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[In], state: GroupState[SessState]) =>
          var intervals: Seq[Interval] =
            state.getOption.map(_.sessions).getOrElse(Seq.empty)
          // (tsu, event_id) order inside the invocation keeps the merge
          // deterministic; cross-batch order is whatever the watermark let
          // through — the interval algebra absorbs it
          it.toArray.sortBy(e => (e.tsu, e.event_id)).foreach { e =>
            intervals = insert(intervals, e.tsu, e.value, gapMicros, mode)
          }
          // seal everything the watermark has passed: any future admitted
          // event has tsu >= wm*1000, so an interval with last + gap below
          // that can never merge again
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) = intervals.partition(_.last + gapMicros < wmMicros)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessState(open))
            // fires once the watermark passes the EARLIEST possible seal;
            // +1ms keeps it strictly above a watermark sitting exactly on
            // the truncated millisecond
            state.setTimeoutTimestamp(
              open.map(s => s.last / 1000 + gapMillis).min + 1)
          }
          closed.sortBy(_.start).iterator
            .map(s => Out(uid, s.start, s.last, s.n, mode.emit(s.sumCents)))
      }
  }
}
