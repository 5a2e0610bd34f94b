package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Custom stateful streaming (flatMapGroupsWithState): gap
  * sessionization — in-batch closes, watermark-timeout closes, and
  * agreement with the batch session_window twin.
  */
class SessionizeSpec extends AnyFunSuite {
  import TestSpark._
  import Sessionize._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streaming sessionizer closes sessions by gap and by watermark") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[Event]
    val q = sessions(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory")
      .queryName("sess_mem").outputMode("append").start()
    try {
      // one user: two events 10 min apart → one open session
      mem.addData(
        Event(1L, ts("2024-01-01 00:00:00"), 10.0),
        Event(1L, ts("2024-01-01 00:10:00"), 5.0))
      q.processAllAvailable()
      assert(s.table("sess_mem").count() === 0) // still open
      // an event 110 min later closes it in-function (gap exceeded)
      mem.addData(Event(1L, ts("2024-01-01 02:00:00"), 1.0))
      q.processAllAvailable()
      val afterClose = s.table("sess_mem").as[SessionOut].collect()
      assert(afterClose.toSeq === Seq(
        SessionOut(1L, ts("2024-01-01 00:00:00"), 2, 15.0)))
      // advancing the watermark far past the open session times it out
      mem.addData(Event(2L, ts("2024-01-01 06:00:00"), 2.0))
      q.processAllAvailable()
      val afterTimeout = s.table("sess_mem").as[SessionOut].collect()
      assert(afterTimeout.map(o => (o.user_id, o.session_start, o.events,
        o.total_value)).toSet.contains((1L, ts("2024-01-01 02:00:00"), 1, 1.0)))
    } finally q.stop()
  }

  test("transition function: gap boundary starts a new session (>= gap)") {
    // pure-function check via the batch twin's oracle rule: an event
    // exactly 30 min after the last is a NEW session
    val state = new TestGroupState(None)
    val out = transition(30)(7L, Iterator(
      Event(7L, ts("2024-01-01 00:00:00"), 1.0),
      Event(7L, ts("2024-01-01 00:30:00"), 2.0)), state).toSeq
    assert(out.map(o => (o.session_start, o.events)) ===
      Seq((ts("2024-01-01 00:00:00"), 1)))
    assert(state.updated.get.events === 1) // the 00:30 event is open
  }

  test("batch session_window and streaming sessionizer agree on closed sessions") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val batch = StreamingQueries.sessionWindows(spark, sfDir)
      .as[(Long, java.sql.Timestamp, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3.toInt, r._4)).toSet
    val mem = MemoryStream[Event]
    val events = Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("user_id") < 10)
      .select("user_id", "ts", "value").as[Event].collect()
    mem.addData(events.toIndexedSeq)
    // a far-future flush event per user closes every real session
    mem.addData(events.map(e => Event(e.user_id,
      ts("2030-01-01 00:00:00"), 0.0)).distinct.toIndexedSeq)
    val q = sessions(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory")
      .queryName("sess_batch_cmp").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = s.table("sess_batch_cmp").as[SessionOut].collect()
      .filter(_.session_start.before(ts("2029-01-01 00:00:00")))
      .map(o => (o.user_id, o.session_start, o.events, o.total_value)).toSet
    assert(streamed === batch,
      s"\nonlyStreamed=${(streamed -- batch).toSeq.sortBy(_._2.getTime).take(5)}" +
        s"\nonlyBatch=${(batch -- streamed).toSeq.sortBy(_._2.getTime).take(5)}" +
        s"\ncounts streamed=${streamed.size} batch=${batch.size}")
  }
}

/** Minimal GroupState stub for pure transition-function tests. */
class TestGroupState(init: Option[Sessionize.SessionState])
    extends org.apache.spark.sql.streaming.GroupState[Sessionize.SessionState] {
  var updated: Option[Sessionize.SessionState] = init
  var removed = false
  override def exists: Boolean = updated.isDefined
  override def get: Sessionize.SessionState = updated.get
  override def getOption: Option[Sessionize.SessionState] = updated
  override def update(s: Sessionize.SessionState): Unit = updated = Some(s)
  override def remove(): Unit = { updated = None; removed = true }
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(d: Long): Unit = ()
  override def setTimeoutDuration(d: String): Unit = ()
  override def setTimeoutTimestamp(t: Long): Unit = ()
  override def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
