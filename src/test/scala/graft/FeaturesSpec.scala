package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the 7 ⚠ SEMANTICS divergences (SURVEY.md §2.12) with the
  * FIXTURES.md boundary rows: dow conventions, night_flag edges,
  * tip_rate guards, label conventions, derived arithmetic.
  */
class FeaturesSpec extends AnyFunSuite {
  import TestSpark._

  private def enriched(rows: (Long, String, Long, String, Double, String)*) =
    Features.enrich(eventsFixture(rows))

  private def one(rows: (Long, String, Long, String, Double, String)*): Row =
    enriched(rows: _*).head()

  // ⚠1 day-of-week: both conventions on pinned dates
  test("dow conventions: Sunday is 1 (dayofweek) and 7 (ISO)") {
    val r = one((1L, "2024-01-07 13:00:00", 1L, "card", 10.0, """{"k": 7}"""))
    assert(r.getAs[Int]("pickup_dow") === 1)
    assert(r.getAs[Int]("pickup_dow_iso") === 7)
  }

  test("dow conventions: Monday is 2 (dayofweek) and 1 (ISO)") {
    val r = one((1L, "2024-01-01 10:30:00", 1L, "card", 10.0, """{"k": 7}"""))
    assert(r.getAs[Int]("pickup_dow") === 2)
    assert(r.getAs[Int]("pickup_dow_iso") === 1)
  }

  // U1 is_weekend under the 1=Sunday convention: {1,7} are weekend
  test("is_weekend: Saturday and Sunday yes, Friday no") {
    val df = enriched(
      (1L, "2024-01-06 12:00:00", 1L, "card", 10.0, """{"k": 7}"""), // Sat
      (2L, "2024-01-07 12:00:00", 1L, "card", 10.0, """{"k": 7}"""), // Sun
      (3L, "2024-01-05 12:00:00", 1L, "card", 10.0, """{"k": 7}""")) // Fri
    val m = df.select("event_id", "is_weekend").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m === Map(1L -> 1, 2L -> 1, 3L -> 0))
  }

  // ⚠6 night_flag: hour >= 22 OR hour <= 5, inclusive both ends
  test("night_flag boundaries: 5→1, 6→0, 21→0, 22→1") {
    val df = enriched(
      (5L, "2024-01-03 05:59:00", 1L, "card", 10.0, """{"k": 7}"""),
      (6L, "2024-01-03 06:00:00", 1L, "card", 10.0, """{"k": 7}"""),
      (21L, "2024-01-03 21:59:00", 1L, "card", 10.0, """{"k": 7}"""),
      (22L, "2024-01-03 22:00:00", 1L, "card", 10.0, """{"k": 7}"""))
    val m = df.select("event_id", "night_flag").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m === Map(5L -> 1, 6L -> 0, 21L -> 0, 22L -> 1))
  }

  // ⚠2 tip_rate: tip/fare guarded, tip_rate_total: tip/total guarded
  test("tip_rate guards: fare=0 gives 0.0, not null or error") {
    val r = one((1L, "2024-01-03 12:00:00", 1L, "card", 0.0, """{"k": 7}"""))
    assert(r.getAs[Double]("tip_rate") === 0.0)
    assert(r.getAs[Double]("tip_rate_total") === 0.0)
  }

  test("tip_rate arithmetic: 15% tip on positive fare") {
    val r = one((1L, "2024-01-03 12:00:00", 1L, "card", 10.0, """{"k": 7}"""))
    assert(r.getAs[Double]("tip_amount") === 1.5)
    assert(r.getAs[Double]("tip_rate") === 0.15)
    assert(r.getAs[Double]("total_amount") === 11.5)
  }

  // ⚠5 label_tip = tip_amount > 0 (04b convention)
  test("label_tip: k%5==0 means no tip and label 0, else label 1") {
    val df = enriched(
      (1L, "2024-01-03 12:00:00", 1L, "card", 10.0, """{"k": 10}"""),
      (2L, "2024-01-03 12:00:00", 1L, "card", 10.0, """{"k": 11}"""))
    val m = df.select("event_id", "tip_amount", "label_tip").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    assert(m(1L) === ((0.0, 0)))
    assert(m(2L)._1 > 0 && m(2L)._2 === 1)
  }

  // F7 duration arithmetic: dropoff = ts + (k+1) minutes
  test("duration_min is k+1 minutes via epoch-seconds arithmetic") {
    val r = one((1L, "2024-01-03 12:00:00", 1L, "card", 10.0, """{"k": 40}"""))
    assert(r.getAs[Double]("duration_min") === 41.0)
    assert(r.getAs[Double]("trip_distance") === 5.0)
  }

  // F8 guarded division: avg_speed = distance / hours, 2-dp floored
  test("avg_speed_mph: floor-2dp of distance over duration-hours") {
    val r = one((1L, "2024-01-03 12:00:00", 1L, "card", 10.0, """{"k": 40}"""))
    // 5.0 mi / (41/60 h) = 7.317… → floor 2dp = 7.31
    assert(r.getAs[Double]("avg_speed_mph") === 7.31)
  }

  test("null k (missing props key) leaves derived columns null-safe") {
    val df = enriched((1L, "2024-01-03 12:00:00", 1L, "card", 10.0, "{}"))
    val r = df.head()
    assert(r.isNullAt(r.fieldIndex("trip_distance")))
    // strict clean drops the row (trip_distance > 0 is null → false)
    assert(Clean.strict(df).count() === 0)
  }
}
