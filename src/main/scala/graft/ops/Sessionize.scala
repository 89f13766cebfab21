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
    * holds the running value total scaled to integer cents: a double sum
    * would fold in stream interval-merge order while a batch replay (the
    * oracle) sums in group order, and round(x, 2) equality across the two
    * can flip on a half-ulp boundary. Integer cents make the total
    * order-independent and exact (inputs are validated to be 2-decimal on
    * entry). */
  case class Interval(start: Long, last: Long, n: Long, sumCents: Long)
  /** Per-user state: gap-separated intervals, sorted by start. */
  case class SessState(sessions: Seq[Interval])
  /** One closed session (timestamps in epoch micros). */
  case class Out(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, total_value: Double)

  /** `value` as exact integer cents — loud on inputs the fixed-point state
    * cannot represent (this operator totals 2-decimal monetary-style
    * values; silently truncating a 3-decimal input would corrupt sums). */
  private[ops] def toCents(value: Double): Long = {
    val cents = math.rint(value * 100.0)
    require(math.abs(value * 100.0 - cents) < 1e-6,
      s"streamingSessions: value $value is not representable in cents — " +
        "total_value accumulates in exact fixed-point (2 decimals)")
    cents.toLong
  }

  /** Fold one event into the interval set: every interval within `gap` of
    * the event merges with it (an event between two near intervals bridges
    * them), the rest stay. */
  private[ops] def insert(intervals: Seq[Interval], tsu: Long, value: Double,
      gapMicros: Long): Seq[Interval] = {
    val (near, far) = intervals.partition(s =>
      tsu >= s.start - gapMicros && tsu <= s.last + gapMicros)
    val merged = near.foldLeft(Interval(tsu, tsu, 1L, toCents(value))) { (a, s) =>
      Interval(math.min(a.start, s.start), math.max(a.last, s.last),
        a.n + s.n, a.sumCents + s.sumCents)
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
    * query does. `watermarkDelay` must cover the source's disorder. */
  def streamingSessions(events: DataFrame, tsCol: String, userCol: String,
      idCol: String, valueCol: String, gapMicros: Long,
      watermarkDelay: String = "1 second"): Dataset[Out] = {
    require(gapMicros > 0, "streamingSessions: gap must be positive")
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
            intervals = insert(intervals, e.tsu, e.value, gapMicros)
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
            .map(s => Out(uid, s.start, s.last, s.n, s.sumCents / 100.0))
      }
  }
}
