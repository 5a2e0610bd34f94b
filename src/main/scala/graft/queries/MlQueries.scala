package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
/** Placeholder — filled in as operators land. */
object MlQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracles: Map[String, String] = Map()
}
