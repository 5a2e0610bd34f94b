package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cleaning-pipeline properties (SURVEY.md §5 items 2–3) on the real
  * sf0.001 table: idempotence, post-clean invariants, and per-filter
  * boundary behavior on fixture rows.
  */
class CleanSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val enriched = Features.enrich(Tables.events(spark, sfDir))

  test("strict clean is idempotent: clean(clean(x)) == clean(x)") {
    val once = Clean.strict(enriched)
    assert(once.count() === Clean.strict(once).count())
  }

  test("light clean is idempotent and no stricter than strict") {
    val strictN = Clean.strict(enriched).count()
    val light = Clean.light(enriched)
    assert(light.count() === Clean.light(light).count())
    assert(light.count() >= strictN)
  }

  test("post-clean invariant: duplicate detector finds 0 key groups") {
    val cleaned = Clean.strict(enriched)
    val dups = cleaned
      .groupBy("pickup_ts", "dropoff_ts", "user_id", "event_type",
        "fare_amount", "tip_amount", "total_amount", "trip_distance")
      .count().filter(col("count") > 1).count()
    assert(dups === 0)
  }

  test("post-clean invariant: all rows satisfy every strict range") {
    val bad = Clean.strict(enriched).filter(
      !(col("fare_amount") > 0 && col("fare_amount") <= 500 &&
        col("total_amount") > 0 && col("total_amount") <= 1000 &&
        col("tip_amount") >= 0 && col("tip_amount") <= 200 &&
        col("trip_distance") > 0 && col("trip_distance") <= 100 &&
        col("duration_min") >= 1 && col("duration_min") <= 240 &&
        col("dropoff_ts") >= col("pickup_ts"))).count()
    assert(bad === 0)
  }

  test("strict boundaries: fare 0 excluded, 500 kept, 500.01 excluded") {
    def frame(v: Double) = Features.enrich(eventsFixture(Seq(
      (1L, "2024-01-03 12:00:00", 1L, "card", v, """{"k": 10}"""))))
    // k=10 → k%5==0 → tip 0 → total == fare: isolates the fare filter
    assert(Clean.strict(frame(0.0)).count() === 0)
    assert(Clean.strict(frame(500.0)).count() === 1)
    assert(Clean.strict(frame(500.01)).count() === 0)
  }

  test("strict drops exact duplicates on the 8-column key") {
    val row = (1L, "2024-01-03 12:00:00", 1L, "card", 10.0, """{"k": 7}""")
    val dup = Features.enrich(eventsFixture(Seq(row, row.copy(_1 = 2L))))
    assert(Clean.strict(dup).count() === 1)
  }
}
