package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming FUNNEL state machine — the real-time twin of the batch
  * r08 funnel: one tiny `FunnelState(step, stepUs)` per user tracks
  * the furthest strictly-sequential step reached (next step only via
  * an event AFTER the previous conversion and within the window),
  * advanced by `flatMapGroupsWithState` as events arrive.
  *
  * Determinism: events are sorted by event time WITHIN each
  * micro-batch before the walk, so any within-batch arrival order
  * yields the batch answer; across batches the machine continues
  * from its stored state, which is exact as long as batches arrive
  * in event-time order (the file-replay harness and any
  * watermark-disciplined ingest do). Step emission is monotone —
  * Update-mode sinks keep the max step per user as the verdict.
  *
  * Scale: state is two longs per user that has entered the funnel —
  * bounded by users, not events; exactly the structure a real-time
  * conversion dashboard keeps.
  */
object FunnelMachine {

  case class FEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class FunnelState(step: Int, stepUs: Long)
  case class FunnelOut(user_id: Long, step: Int)

  /** The transition, factored for unit testing: walk the batch's
    * events in event-time order, advancing at most one step per
    * qualifying event.
    */
  def transition(steps: Seq[String], windowHours: Long)(
      key: Long, events: Iterator[FEvent],
      state: GroupState[FunnelState]): Iterator[FunnelOut] = {
    val winUs = windowHours * 3600L * 1000000L
    val sorted = events.toSeq.sortBy(e => Sessionize.toMicros(e.ts))
    var cur = state.getOption.getOrElse(FunnelState(0, 0L))
    sorted.foreach { e =>
      if (cur.step < steps.size && e.event_type == steps(cur.step)) {
        val t = Sessionize.toMicros(e.ts)
        if (cur.step == 0 || (t > cur.stepUs && t <= cur.stepUs + winUs))
          cur = FunnelState(cur.step + 1, t)
      }
    }
    state.update(cur)
    if (cur.step > 0) Iterator.single(FunnelOut(key, cur.step))
    else Iterator.empty
  }

  def furthest(events: Dataset[FEvent], steps: Seq[String],
               windowHours: Long): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        transition(steps, windowHours))
  }
}
