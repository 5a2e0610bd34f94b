package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sampling surface (O6/F12): seeded shuffle-sample properties —
  * excluded from the hash oracle by design (partition-dependent),
  * pinned here instead (SURVEY §5.1).
  */
class SamplingSpec extends AnyFunSuite {
  import TestSpark._

  test("rand(42) sample: exact size, rows drawn from the source") {
    val sample = IoQueries.randSample(spark, sfDir)
    assert(sample.count() === 100)
    val src = Tables.events(spark, sfDir).select("event_id")
    assert(sample.select("event_id").exceptAll(src).count() === 0)
  }

  test("rand(42) sample is stable within a session (fixed partitioning)") {
    val a = IoQueries.randSample(spark, sfDir)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    val b = IoQueries.randSample(spark, sfDir)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(a === b)
  }

  test("rand with different seeds draws different samples") {
    val base = Tables.events(spark, sfDir)
    val a = base.orderBy(rand(42)).limit(100)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val b = base.orderBy(rand(43)).limit(100)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(a !== b)
  }
}
