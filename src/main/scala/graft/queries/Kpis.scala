package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KPI queries — the reference's named query inventory (SURVEY.md §2.12
  * Q1–Q19) re-expressed over the driver's `events` table (events ≈
  * trips: ts→pickup, user_id→vendor, value→fare, event_type→payment).
  *
  * Every query is a pure `(SparkSession, sfDir) => DataFrame` — a lazy
  * logical plan; Catalyst handles pushdown/pruning. Aggregates are
  * rounded in-query (reference rounds KPIs to 2–4 dp, e.g.
  * spark_jobs/02d_sql_aggs.py:57-58) and ordered totally for the
  * DuckDB-oracle hash compare.
  */
object Kpis {

  /** Q2 trips_per_hour (spark_jobs/02d_sql_aggs.py:64-67): count per
    * pickup hour. Scan → derive hour → partial/final hash agg → sort.
    */
  def tripsPerHour(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull)
      .groupBy(hour(col("ts")).cast("int").as("hour"))
      .agg(count(lit(1)).as("trips"))
      .orderBy("hour")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q02_trips_per_hour" -> ((s, d) => tripsPerHour(s, d))
  )

  def oracles: Map[String, String] = Map(
    "q02_trips_per_hour" ->
      """SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS hour, COUNT(*) AS trips
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
