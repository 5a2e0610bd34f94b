package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cleaning pipelines — the reference's two rule sets (⚠ SEMANTICS 4),
  * re-keyed onto the events-as-trips columns produced by
  * [[Features.enrich]].
  *
  * Strict (spark_jobs/02_clean_eda.py:46-70): tight value ranges,
  * cross-column timestamp sanity, multi-column dedup.
  * Light (spark_jobs/02b_basic_clean.py:49-64): looser ranges, smaller
  * dedup key, no passenger/geo analogs.
  *
  * All filters are declarative Column predicates → Catalyst merges
  * them into a single Filter and pushes what it can into the parquet
  * scan; `dropDuplicates` is the one shuffle.
  */
object Clean {

  /** Strict rules. Dedup key = the 8-column analog of
    * 02_clean_eda.py:67-69. Subset-dedup keeps an arbitrary row per
    * key group — callers needing oracle determinism must project onto
    * the key columns (then it degenerates to DISTINCT).
    */
  def strict(trips: DataFrame): DataFrame = trips
    .filter(col("pickup_ts").isNotNull && col("dropoff_ts").isNotNull)
    .filter(col("dropoff_ts") >= col("pickup_ts"))
    .filter(col("fare_amount") > 0 && col("fare_amount") <= 500)
    .filter(col("total_amount") > 0 && col("total_amount") <= 1000)
    .filter(col("tip_amount") >= 0 && col("tip_amount") <= 200)
    .filter(col("trip_distance") > 0 && col("trip_distance") <= 100)
    .filter(col("duration_min") >= 1 && col("duration_min") <= 240)
    .dropDuplicates(Seq("pickup_ts", "dropoff_ts", "user_id", "event_type",
      "fare_amount", "tip_amount", "total_amount", "trip_distance"))

  /** Matching DuckDB WHERE clause (dedup handled per-query). */
  val strictWhereSql: String =
    """pickup_ts IS NOT NULL AND dropoff_ts IS NOT NULL
      |AND dropoff_ts >= pickup_ts
      |AND fare_amount > 0 AND fare_amount <= 500
      |AND total_amount > 0 AND total_amount <= 1000
      |AND tip_amount >= 0 AND tip_amount <= 200
      |AND trip_distance > 0 AND trip_distance <= 100
      |AND duration_min >= 1 AND duration_min <= 240""".stripMargin

  /** Light rules (02b_basic_clean.py:49-64): wider ranges, 5-col key. */
  def light(trips: DataFrame): DataFrame = trips
    .filter(col("pickup_ts").isNotNull && col("dropoff_ts").isNotNull)
    .filter(col("dropoff_ts") >= col("pickup_ts"))
    .filter(col("fare_amount") >= 0 && col("fare_amount") <= 1000)
    .filter(col("total_amount") >= 0 && col("total_amount") <= 2000)
    .filter(col("trip_distance") >= 0 && col("trip_distance") <= 200)
    .dropDuplicates(Seq("pickup_ts", "dropoff_ts", "user_id",
      "fare_amount", "total_amount"))

  val lightWhereSql: String =
    """pickup_ts IS NOT NULL AND dropoff_ts IS NOT NULL
      |AND dropoff_ts >= pickup_ts
      |AND fare_amount >= 0 AND fare_amount <= 1000
      |AND total_amount >= 0 AND total_amount <= 2000
      |AND trip_distance >= 0 AND trip_distance <= 200""".stripMargin
}
