package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-sessionization — the custom-state streaming shape:
  * `flatMapGroupsWithState` holds ONE open session per user in the state
  * store, closes it when a later event arrives past the gap (emitted
  * immediately) or when the event-time watermark passes `last + gap`
  * (emitted on timeout), so output is append-mode and state is bounded by
  * the live-user count, not the event count. The batch equivalent is the
  * lag/gaps-and-islands window (SparkEntry q_events_sessions); this is the
  * same rule replayed incrementally, so a batch oracle checks the stream.
  */
object Sessionize {

  /** One input event (ets carries the watermark; tsu the exact micros). */
  case class In(user_id: Long, ets: java.sql.Timestamp, tsu: Long,
      event_id: Long, value: Double)
  /** Per-user state: the single open (not yet gap-closed) session. */
  case class OpenSession(start: Long, last: Long, n: Long, sum: Double)
  /** One closed session (timestamps in epoch micros). */
  case class Out(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, total_value: Double)

  /** Sessionize a (micro-batch) event stream: events group by `userCol`,
    * a gap of more than `gapMicros` between consecutive events closes the
    * session. Events are applied in (timestamp, event id) order within
    * each invocation — the same total order the batch window uses — so
    * counts and sums are reproducible. The stream must carry a watermark
    * ≥ the source's disorder; sessions whose close the watermark never
    * passes stay in state (drain with a sentinel event far in the future,
    * as the driver query does). */
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
      .flatMapGroupsWithState[OpenSession, Out](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[In], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: nothing can extend this session
            val s = state.get
            state.remove()
            Iterator.single(Out(uid, s.start, s.last, s.n, s.sum))
          } else {
            val evs = it.toArray.sortBy(e => (e.tsu, e.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[Out]
            var cur = state.getOption
            evs.foreach { e =>
              cur match {
                case Some(s) if e.tsu - s.last <= gapMicros =>
                  cur = Some(OpenSession(s.start, math.max(s.last, e.tsu),
                    s.n + 1, s.sum + e.value))
                case Some(s) =>
                  out += Out(uid, s.start, s.last, s.n, s.sum)
                  cur = Some(OpenSession(e.tsu, e.tsu, 1L, e.value))
                case None =>
                  cur = Some(OpenSession(e.tsu, e.tsu, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fires once the WATERMARK (not the clock) passes the gap;
              // +1ms keeps it strictly above a watermark sitting exactly
              // on the last event
              state.setTimeoutTimestamp(s.last / 1000 + gapMillis + 1)
            }
            out.iterator
          }
      }
  }
}
