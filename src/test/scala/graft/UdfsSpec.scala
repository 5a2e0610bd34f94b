package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** UDF/UDAF surface: the genuine udf/Aggregator demonstrations must
  * agree exactly with their native Column twins.
  */
class UdfsSpec extends AnyFunSuite {
  import TestSpark._

  test("bucket UDF agrees with native bucketB on boundaries and null") {
    val s = spark
    import s.implicits._
    val vals: Seq[java.lang.Double] =
      Seq[java.lang.Double](null, 0.0, 0.99, 1.0, 1.99, 2.0, 4.99, 5.0,
        9.99, 10.0, 250.0) ++
        (1 to 100).map(i => java.lang.Double.valueOf(i * 0.17))
    val df = vals.map(Option(_).map(_.doubleValue)).toDF("d")
    val diff = df.select(
        Udfs.bucketDistanceUdf(col("d")).as("u"),
        Buckets.bucketB(col("d")).as("n"))
      .filter(col("u") =!= col("n")).count()
    assert(diff === 0)
  }

  test("is_weekend UDF agrees with the native when-chain incl. null") {
    val s = spark
    import s.implicits._
    val df = (Seq[java.lang.Integer](null) ++ (1 to 7).map(Int.box))
      .map(Option(_).map(_.intValue)).toDF("dow")
    val diff = df.select(
        Udfs.isWeekendUdf(col("dow")).as("u"),
        when(col("dow").isin(1, 7), 1).otherwise(0).as("n"))
      .filter(col("u") =!= col("n")).count()
    assert(diff === 0)
  }

  test("WeightedTipRate aggregator: exact Σtip/Σfare, zero-safe") {
    val s = spark
    import s.implicits._
    val df = Seq((1.0, 10.0), (3.0, 10.0), (0.0, 5.0))
      .toDF("tip_amount", "fare_amount")
    val r = df.agg(Udfs.weightedTipRate(col("tip_amount"), col("fare_amount")))
      .head().getDouble(0)
    assert(r === 4.0 / 25.0)
    val empty = Seq((0.0, 0.0)).toDF("tip_amount", "fare_amount")
    assert(empty.agg(Udfs.weightedTipRate(col("tip_amount"),
      col("fare_amount"))).head().getDouble(0) === 0.0)
  }

  test("aggregator is repartition-invariant (exact integer buffers)") {
    val base = Features.enrich(Tables.events(spark, sfDir))
    def agg(p: Int) = base.repartition(p)
      .agg(Udfs.weightedTipRate(col("tip_amount"), col("fare_amount")))
      .head().getDouble(0)
    assert(agg(1) === agg(13))
  }

  test("withIfMissing adds only absent columns; sniffing finds ts") {
    val df = Tables.events(spark, sfDir)
    assert(SchemaFlex.withIfMissing(df, "ts", lit(0)).schema === df.schema)
    val patched = SchemaFlex.withIfMissing(df, "flag", lit(1))
    assert(patched.columns.contains("flag"))
    assert(SchemaFlex.sniffPickupColumn(df) === Some("ts"))
    assert(SchemaFlex.sniffPickupColumn(
      Tables.region(spark, sfDir)) === None)
  }
}
