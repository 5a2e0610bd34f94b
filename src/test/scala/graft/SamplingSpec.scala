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

  test("temperature mix: quotas track sqrt(n), spend ~the budget, stay exact") {
    val mix = Dedup.temperatureMix(spark, sfDir).collect()
    val quotas = mix.map(r => r.getString(0) -> r.getLong(1)).toMap
    // per-stratum delivery is exact: rows per lang == its quota
    val delivered = mix.groupBy(_.getString(0)).view.mapValues(_.length)
    delivered.foreach { case (lang, got) => assert(got.toLong === quotas(lang)) }
    // floor(+0.5) spends the budget within one doc per stratum
    val spent = quotas.values.sum
    assert(math.abs(spent - Dedup.mixBudget) <= quotas.size)
    // α=0.5 flattens the mix: every low-resource stratum gets a LARGER
    // share than proportional sampling would give it, head strata smaller
    val counts = Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val meanN = total / counts.size
    counts.foreach { case (lang, n) =>
      val proportional = n / total * Dedup.mixBudget
      if (n < meanN)
        assert(quotas(lang) >= proportional,
          s"$lang (low-resource) must be upsampled vs proportional")
    }
  }
}
