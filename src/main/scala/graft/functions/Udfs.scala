package graft

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The UDF/UDAF surface the reference exercises via `@F.udf`
  * (SURVEY.md §2.9, §7.3): kept to demonstrate the extension points,
  * but NOT used on default code paths — the native Column twins
  * ([[Buckets.bucketB]], `when`-chains) stay the hot path because a
  * Scala UDF is an opaque box to Catalyst: no predicate pushdown
  * through it, no whole-stage codegen, per-row (de)serialization.
  * UdfsSpec pins udf-vs-native parity so the demonstration can't
  * drift from the real implementation.
  */
object Udfs {

  /** U2 as a genuine Scala UDF — `bucket_distance` incl. the
    * null→"<1mi" branch (spark_jobs/05c_make_report.py:27-36).
    */
  val bucketDistanceUdf = udf { (mi: java.lang.Double) =>
    if (mi == null) "<1mi"
    else if (mi < 1) "<1mi"
    else if (mi < 2) "1-2mi"
    else if (mi < 5) "2-5mi"
    else if (mi < 10) "5-10mi"
    else ">=10mi"
  }

  /** U1 as a genuine Scala UDF — `is_weekend(dow)` with the
    * reference's null→0 branch (spark_jobs/03a_engineer_features.py:28-36).
    */
  val isWeekendUdf = udf { (dow: java.lang.Integer) =>
    if (dow == null) 0 else if (dow == 1 || dow == 7) 1 else 0
  }

  /** A typed `Aggregator` (UDAF surface): fare-weighted mean tip rate
    * Σ(tip)/Σ(fare) — exact integer-cents sums internally, so the
    * result is partition-order independent like the Exact aggregates.
    * Input rows are (tip_cents, fare_cents) pairs.
    */
  object WeightedTipRate extends Aggregator[(Long, Long), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
      (b._1 + a._1, b._2 + a._2)
    def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
      (b1._1 + b2._1, b1._2 + b2._2)
    def finish(r: (Long, Long)): Double =
      if (r._2 == 0) 0.0 else r._1.toDouble / r._2
    def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Untyped-DataFrame form of the Aggregator (what `groupBy.agg`
    * consumes): weighted_tip_rate(tip_amount, fare_amount).
    */
  def weightedTipRate(tip: Column, fare: Column): Column =
    udaf(WeightedTipRate, Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .apply(Exact.cents(tip).cast("long"), Exact.cents(fare).cast("long"))
}

/** Schema-flexible helpers (SURVEY.md §1.2): the reference's
  * `with_if_missing` (spark_jobs/05c_make_report.py:21-25) and the
  * frontend's pickup-column sniffing (F14, app5.py:76-101).
  */
object SchemaFlex {

  /** Add the column only when absent — idempotent schema patching. */
  def withIfMissing(df: DataFrame, name: String, e: Column): DataFrame =
    if (df.columns.contains(name)) df else df.withColumn(name, e)

  /** F14 — case-insensitive prefix sniffing for the pickup-timestamp
    * column across the two vendor naming schemes.
    */
  def sniffPickupColumn(df: DataFrame): Option[String] =
    df.columns.find { c =>
      val l = c.toLowerCase
      l.startsWith("tpep_pickup") || l.startsWith("pickup_datetime") ||
        l == "pickup_ts" || l == "ts"
    }

  /** Dropoff twin of [[sniffPickupColumn]] (app5.py:77). */
  def sniffDropoffColumn(df: DataFrame): Option[String] =
    df.columns.find { c =>
      val l = c.toLowerCase
      l.startsWith("tpep_dropoff") || l.startsWith("dropoff_datetime") ||
        l == "dropoff_ts"
    }
}
