package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-gated temporal join queries over `events` exercising
  * [[TemporalJoins]]. The DuckDB oracles deliberately use a DIFFERENT
  * algorithm (native `ASOF JOIN` / plain inequality join) than the
  * Spark implementations (union+window / bucketed equi join), so a
  * hash match is an independent cross-check of the semantics, not an
  * echo of the same plan.
  *
  * Timestamp parity: both engines compare at microsecond precision —
  * Tables.events truncates nanos→micros, the oracles CAST the raw
  * TIMESTAMP_NS to TIMESTAMP (same truncation).
  */
object Temporal {

  /** r06 — as-of join: every click annotated with the user's latest
    * purchase value at-or-before the click. Purchases are
    * pre-aggregated per (user, ts) — [[TemporalJoins.leftAsOf]]'s
    * uniqueness contract and the determinism the oracle needs.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max("value").as("pval"))
    TemporalJoins.leftAsOf(clicks, purchases, Seq("user_id"),
        "ts", "ts", Seq("pval"), prefix = "")
      .select(col("event_id"), col("user_id"),
        col("pval").as("last_purchase_value"))
      .orderBy("event_id")
  }

  val asofJoinSql: String =
    """WITH clicks AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS cts
      |  FROM events WHERE event_type = 'click'
      |), purch AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS pts, MAX(value) AS pval
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
      |)
      |SELECT c.event_id, c.user_id, p.pval AS last_purchase_value
      |FROM clicks c ASOF LEFT JOIN purch p
      |  ON c.user_id = p.user_id AND c.cts >= p.pts
      |ORDER BY c.event_id""".stripMargin

  /** r07 — range join: clicks landing within 30 minutes (inclusive)
    * after each purchase by the same user, counted per purchase.
    * Bucket size = the window length, so each interval explodes into
    * at most 2 bucket keys.
    */
  val windowSeconds = 1800L

  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("pts"))
      .withColumn("end_ts", expr(s"timestampadd(SECOND, $windowSeconds, pts)"))
    val matched = TemporalJoins.rangeJoin(clicks, purchases, Seq("user_id"),
        "cts", "pts", "end_ts", windowSeconds)
      .groupBy("p_id", "user_id")
      .agg(count(lit(1)).as("n_clicks"))
    purchases.select("p_id", "user_id")
      .join(matched, Seq("p_id", "user_id"), "left")
      .select(col("p_id"), col("user_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
      .orderBy("p_id")
  }

  val rangeJoinSql: String =
    s"""WITH c AS (
       |  SELECT user_id, CAST(ts AS TIMESTAMP) AS cts
       |  FROM events WHERE event_type = 'click'
       |), p AS (
       |  SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS pts
       |  FROM events WHERE event_type = 'purchase'
       |)
       |SELECT p.p_id, p.user_id, COUNT(c.cts) AS n_clicks
       |FROM p LEFT JOIN c
       |  ON c.user_id = p.user_id
       |  AND c.cts >= p.pts
       |  AND c.cts <= p.pts + INTERVAL $windowSeconds SECOND
       |GROUP BY 1, 2 ORDER BY p_id""".stripMargin

  // ---------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r06_asof_join" -> asofJoin _,
    "r07_range_join" -> rangeJoin _
  )

  def oracles: Map[String, String] = Map(
    "r06_asof_join" -> asofJoinSql,
    "r07_range_join" -> rangeJoinSql
  )
}
