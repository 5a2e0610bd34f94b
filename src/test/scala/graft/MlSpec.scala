package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ML surface: randomSplit properties (O7 — excluded from the hash
  * oracle by design, SURVEY §5.1) and metric plausibility bands
  * (§7.5.7: spark.ml algorithms are identical but fold membership
  * differs, so §6 numbers are bands, not hash targets).
  */
class MlSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val frame = MlQueries.mlFrame(spark, sfDir).cache()

  test("randomSplit 80/20: partitions the frame (sizes sum, disjoint)") {
    val total = frame.count()
    val Array(tr, te) = frame.randomSplit(Array(0.8, 0.2), 42)
    val (nTr, nTe) = (tr.count(), te.count())
    assert(nTr + nTe === total)
    assert(tr.select("event_id").intersect(te.select("event_id")).count() === 0)
    // 80/20 within a loose band
    assert(nTr.toDouble / total > 0.7 && nTr.toDouble / total < 0.9)
  }

  test("randomSplit is deterministic for a fixed seed within a session") {
    val a = frame.randomSplit(Array(0.8, 0.2), 42)(1)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = frame.randomSplit(Array(0.8, 0.2), 42)(1)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
  }

  test("vectorize/scale: constant feature width, rows preserved") {
    val (nRows, dimMax, dimMin) = MlQueries.vectorizeScaleValues(spark, sfDir)
    assert(nRows > 0)
    assert(dimMax === dimMin)
    assert(dimMax >=
      MlQueries.numericFeatures.size + MlQueries.leakyFeatures.size)
    // and the driver row's band reduction is all-green
    val r = MlQueries.vectorizeScale(spark, sfDir).head()
    assert(r.getAs[Boolean]("band_nonempty"))
    assert(r.getAs[Boolean]("band_dim_constant"))
    assert(r.getAs[Boolean]("band_dim_min_width"))
  }

  test("RF regression lands in the plausibility band (reference R² 0.91)") {
    val (rmse, mae, r2, _) = MlQueries.rfRegMetrics(spark, sfDir)
    assert(r2 > 0.1 && r2 <= 1.0, s"r2=$r2")
    assert(rmse > 0)
    assert(mae > 0)
  }

  test("leaky LR classifier reproduces the reference's near-1.0 AUC") {
    val (auc, acc, _) = MlQueries.lrClsMetrics(spark, sfDir)
    assert(auc > 0.95, s"auc=$auc")
    assert(acc > 0.9)
  }

  test("pipeline save/load round-trip scores identically") {
    val (nScored, nMismatch, maxProbDiff) =
      MlQueries.persistenceValues(spark, sfDir)
    assert(nScored > 0)
    assert(nMismatch === 0)
    assert(maxProbDiff === 0.0)
  }

  test("threshold scoring: raising the cut shrinks the positive set") {
    val (n, p30, p50, p70) = MlQueries.thresholdValues(spark, sfDir)
    assert(n > 0 && n <= 500)
    assert(p30 >= p50 && p50 >= p70)
    assert(p30 <= n && p70 >= 0)
  }
}
