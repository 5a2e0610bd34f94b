package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ⚠3/⚠7 pins: both bucket schemes' boundaries and their divergent
  * null semantics, plus a totality property (every double — including
  * specials — lands in exactly one bucket).
  */
class BucketsSpec extends AnyFunSuite {
  import TestSpark._

  private def bucketsOf(vals: Seq[java.lang.Double]): Seq[(String, String)] = {
    val s = spark
    import s.implicits._
    val df = vals.map(Option(_).map(_.doubleValue)).toDF("d")
    df.select(Buckets.bucketA(col("d")), Buckets.bucketB(col("d")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  test("bucket A boundaries: 0.99|1.0 … 9.99|10.0") {
    assert(bucketsOf(Seq(0.99, 1.0, 2.99, 3.0, 4.99, 5.0, 9.99, 10.0)).map(_._1) ===
      Seq("<1mi", "1-3mi", "1-3mi", "3-5mi", "3-5mi", "5-10mi", "5-10mi", ">=10mi"))
  }

  test("bucket B boundaries: 0.99|1.0|1.99|2.0 … 10.0") {
    assert(bucketsOf(Seq(0.99, 1.0, 1.99, 2.0, 4.99, 5.0, 9.99, 10.0)).map(_._2) ===
      Seq("<1mi", "1-2mi", "1-2mi", "2-5mi", "2-5mi", "5-10mi", "5-10mi", ">=10mi"))
  }

  test("null semantics diverge: A sends null to >=10mi, B to <1mi (⚠7)") {
    assert(bucketsOf(Seq(null)) === Seq((">=10mi", "<1mi")))
  }

  test("totality: every double (incl. specials) maps to exactly one label") {
    val rnd = new scala.util.Random(42)
    val samples: Seq[java.lang.Double] =
      Seq[java.lang.Double](Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, Double.MaxValue, Double.MinPositiveValue,
        -1.0, 0.0, null) ++
        (1 to 200).map(_ => java.lang.Double.valueOf(rnd.nextDouble() * 20 - 2))
    val labelsA = Set("<1mi", "1-3mi", "3-5mi", "5-10mi", ">=10mi")
    val labelsB = Set("<1mi", "1-2mi", "2-5mi", "5-10mi", ">=10mi")
    bucketsOf(samples).foreach { case (a, b) =>
      assert(labelsA.contains(a), s"A produced $a")
      assert(labelsB.contains(b), s"B produced $b")
    }
  }
}
