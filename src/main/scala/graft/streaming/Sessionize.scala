package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization per user via
  * `flatMapGroupsWithState` (the brief's "KeyValueGroupedDataset
  * custom state" surface — richer than the built-in `session_window`
  * because the state transition is arbitrary code).
  *
  * Semantics match the batch `session_window(ts, gap)` (w06): a
  * session extends while successive events are < gap apart; an event
  * ≥ gap after the last closes the session and opens a new one. A
  * session is emitted when (a) a later event closes it, or (b) the
  * event-time watermark passes its timeout (last event + gap).
  *
  * Scale: state is one small struct per active user key, dropped on
  * timeout — bounded by concurrently-active users, not event volume;
  * exactly the shape that survives 100 TB/day event streams.
  */
object Sessionize {

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  /** Times in MICROseconds — `Timestamp.getTime` is millis and would
    * silently truncate the micros the batch twin keeps.
    */
  case class SessionState(startUs: Long, lastUs: Long, events: Int, cents: Long)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                        events: Int, total_value: Double)

  def toMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def close(key: Long, s: SessionState): SessionOut =
    SessionOut(key, fromMicros(s.startUs), s.events, s.cents / 100.0)

  /** The state-transition function, factored out for unit testing. */
  def transition(gapMinutes: Int)(key: Long, events: Iterator[Event],
                                  state: GroupState[SessionState]): Iterator[SessionOut] = {
    val gapUs = gapMinutes * 60L * 1000000L
    if (state.hasTimedOut) {
      val out = close(key, state.get)
      state.remove()
      Iterator.single(out)
    } else {
      val sorted = events.toSeq.sortBy(e => toMicros(e.ts))
      var closed = List.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = toMicros(e.ts)
        val cents = math.floor(e.value * 100 + 0.5).toLong
        cur match {
          case Some(s) if t - s.lastUs < gapUs =>
            cur = Some(SessionState(s.startUs, t, s.events + 1, s.cents + cents))
          case Some(s) =>
            closed ::= close(key, s)
            cur = Some(SessionState(t, t, 1, cents))
          case None =>
            cur = Some(SessionState(t, t, 1, cents))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastUs / 1000L + gapMinutes * 60L * 1000L)
      }
      closed.reverseIterator
    }
  }

  /** Streaming sessionizer: watermark + event-time timeout. */
  def sessions(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        transition(gapMinutes))
  }
}
