package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distance bucketing — both of the reference's bucket schemes
  * (⚠ SEMANTICS 3) with their distinct null semantics (⚠ 7).
  * Native `when` chains, not UDFs, so they stay inside whole-stage
  * codegen.
  */
object Buckets {

  /** Variant A: `<1 / 1-3 / 3-5 / 5-10 / >=10` mi, SQL CASE form
    * (spark_jobs/02d_sql_aggs.py:80-92, 02e_join_lookup.py:70-74).
    * Null falls through every WHEN to the ELSE: null → ">=10mi".
    */
  def bucketA(d: Column): Column =
    when(d < 1, "<1mi")
      .when(d < 3, "1-3mi")
      .when(d < 5, "3-5mi")
      .when(d < 10, "5-10mi")
      .otherwise(">=10mi")

  val bucketASql: String =
    """CASE WHEN trip_distance < 1 THEN '<1mi'
      |     WHEN trip_distance < 3 THEN '1-3mi'
      |     WHEN trip_distance < 5 THEN '3-5mi'
      |     WHEN trip_distance < 10 THEN '5-10mi'
      |     ELSE '>=10mi' END""".stripMargin

  /** Variant B: `<1 / 1-2 / 2-5 / 5-10 / >=10` mi, the bucket_distance
    * UDF (spark_jobs/05c_make_report.py:27-36) — null maps to "<1mi"
    * (the UDF's `if mi is None` branch, 05c:28-30). Preserved exactly.
    */
  def bucketB(d: Column): Column =
    when(d.isNull, "<1mi")
      .when(d < 1, "<1mi")
      .when(d < 2, "1-2mi")
      .when(d < 5, "2-5mi")
      .when(d < 10, "5-10mi")
      .otherwise(">=10mi")

  val bucketBSql: String =
    """CASE WHEN trip_distance IS NULL THEN '<1mi'
      |     WHEN trip_distance < 1 THEN '<1mi'
      |     WHEN trip_distance < 2 THEN '1-2mi'
      |     WHEN trip_distance < 5 THEN '2-5mi'
      |     WHEN trip_distance < 10 THEN '5-10mi'
      |     ELSE '>=10mi' END""".stripMargin
}
