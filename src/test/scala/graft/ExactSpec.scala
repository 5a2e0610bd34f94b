package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Determinism machinery: the integer-cents aggregates must be exact
  * on .5 boundaries and invariant under repartitioning (partial-agg
  * merge order) — the property that makes every money oracle stable.
  */
class ExactSpec extends AnyFunSuite {
  import TestSpark._

  private def df(vals: Double*) = {
    val s = spark
    import s.implicits._
    vals.toDF("v")
  }

  test("cents recovers exact integer cents from 2-dp doubles") {
    val out = df(0.29, 2.00, 19.99, 0.01, 123.45)
      .select(Exact.cents(col("v")).cast("long")).collect().map(_.getLong(0))
    assert(out.toSeq === Seq(29L, 200L, 1999L, 1L, 12345L))
  }

  test("avgMoney rounds half-up on the exact .005 boundary") {
    // mean of 0.01 and 0.02 = 1.5 cents → half-up → 2 cents
    val r = df(0.01, 0.02).agg(Exact.avgMoney(col("v"))).head().getDouble(0)
    assert(r === 0.02)
  }

  test("round4 half-up at the 4-dp boundary") {
    val out = df(0.12345, 0.11111, 0.99999)
      .select(Exact.round4(col("v"))).collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(0.1235, 0.1111, 1.0))
  }

  test("avgMoney/sumMoney invariant under repartitioning") {
    val base = Tables.events(spark, sfDir)
    def agg(parts: Int) = base.repartition(parts)
      .agg(Exact.avgMoney(col("value")), Exact.sumMoney(col("value")))
      .head()
    val a = agg(1); val b = agg(7); val c = agg(32)
    assert(a === b)
    assert(b === c)
  }

  test("stddev4 matches a reference computation on small input") {
    // values 1.00, 2.00, 3.00 → sample stddev = 1.0
    val r = df(1.0, 2.0, 3.0).agg(Exact.stddev4(col("v"))).head().getDouble(0)
    assert(r === 1.0)
  }
}
