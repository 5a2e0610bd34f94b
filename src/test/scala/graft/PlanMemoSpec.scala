package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[PlanMemo]] boundedness: a long-lived session cycling many corpus
  * dirs (each dir contributing its own memo keys) must not pin
  * unbounded cached plans — the access-ordered LRU evicts the oldest
  * and unpersists its frame (round-7 advice item 5).
  */
class PlanMemoSpec extends AnyFunSuite {
  import TestSpark._

  test("memo entries are LRU-capped under many-dir churn") {
    val before = PlanMemo.size
    var rebuilds = 0
    // far more distinct keys than the cap, as a session cycling
    // hundreds of dirs would produce
    (0 until 200).foreach { i =>
      PlanMemo.cached(spark, s"memospec-df-$i") {
        rebuilds += 1
        spark.range(5).toDF("v")
      }
      PlanMemo.cachedValue(spark, s"memospec-v-$i") { i * 2 }
    }
    assert(rebuilds === 200)
    assert(PlanMemo.size <= 64 + 128,
      s"memo grew to ${PlanMemo.size} entries; LRU caps not applied")
    // recency is honored: the most recent keys are still memoized
    // (no rebuild) and an evicted early key rebuilds transparently
    PlanMemo.cached(spark, "memospec-df-199") { fail("199 was evicted") }
    var rebuilt = false
    PlanMemo.cached(spark, "memospec-df-0") {
      rebuilt = true; spark.range(5).toDF("v")
    }
    assert(rebuilt, "key 0 should have been LRU-evicted after 200 inserts")
    assert(before >= 0)
  }

  test("cachedValue returns the memoized driver-side value") {
    var builds = 0
    def get() = PlanMemo.cachedValue(spark, "memospec-value-stable") {
      builds += 1; Seq(1.0, 2.0)
    }
    assert(get() === Seq(1.0, 2.0))
    assert(get() === Seq(1.0, 2.0))
    assert(builds === 1)
  }
}
