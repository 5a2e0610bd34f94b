package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * Each key in [[queries]] is one operator/query from the SURVEY.md §2
  * inventory; [[oracleSql]] carries DuckDB-runnable ANSI SQL computing
  * the same result on the same parquet tables (omitted only for
  * genuinely non-SQL-expressible ops — ML training, approx sketches —
  * which the driver then checks rows-only).
  *
  * Determinism rules (SURVEY.md §5.1): every oracle-checked query ends
  * in a total ORDER BY (key tie-breakers), floating aggregates are
  * rounded in-query, column names are identical on both sides.
  */
object SparkEntry {

  /** Flagship query on sf0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Kpis.tripsPerHour(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Kpis.queries ++ Relational.queries ++ Text.queries ++
      Dedup.queries ++ Similarity.queries ++ MlQueries.queries ++
      StreamingQueries.queries ++ IoQueries.queries ++
      Multimodal.queries ++ Temporal.queries ++ Packing.queries ++
      Clustering.queries ++ Quantization.queries ++ Pipeline.queries

  def oracleSql: Map[String, String] =
    Kpis.oracles ++ Relational.oracles ++ Text.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ MlQueries.oracles ++
      StreamingQueries.oracles ++
      IoQueries.oracles ++ Multimodal.oracles ++ Temporal.oracles ++
      Packing.oracles ++ Clustering.oracles ++ Quantization.oracles ++
      Pipeline.oracles
}
