package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Star-schema relational coverage beyond the single broadcast-dim
  * join of the KPI surface (round-1 verdict "What's missing" 6), plus
  * the true Greenwald-Khanna approxQuantile (A10 — the reference's
  * `df.approxQuantile`, spark_jobs/02c_nulls_and_stats.py:57-62).
  *
  * Join strategy is chosen per table size — the 100 TB posture:
  *   - orders ⋈ customer: both sides scale with the data → shuffle
  *     hash/sort-merge on the key, left to Catalyst + AQE (skew-join
  *     splitting enabled in Tables.configure).
  *   - customer ⋈ nation ⋈ region: bounded dims (25 / 5 rows at any
  *     scale) → explicit `broadcast()` hints, no shuffle.
  *   - anti join (r04): customers with no orders — Catalyst picks
  *     broadcast/shuffle anti-join; never a driver-side NOT IN.
  *
  * Money sums use exact integer-cents arithmetic ([[Exact]]) so group
  * aggregates are partition-order independent — the property that
  * makes these oracles stable at every scale factor.
  */
object Relational {

  /** Exact revenue unit: extendedprice-cents × (1 − discount) in
    * basis points — both factors are exact small integers (prices are
    * 2-dp money, discounts ≤4-dp fractions), so the product is an
    * exact integer-valued double (< 2⁵³) that casts identically in
    * both engines; sums are exact longs, /10⁶ only at the end.
    * Order-independent, scales to DECIMAL(38,0) sums at 100 TB.
    */
  private val revenueUnits =
    (floor(col("l_extendedprice") * 100 + lit(0.5)) *
      (lit(10000) - floor(col("l_discount") * 10000 + lit(0.5)))).cast("long")

  private val revenueUnitsSql =
    """CAST(floor(l_extendedprice * 100 + 0.5)
      |  * (10000 - floor(l_discount * 10000 + 0.5)) AS BIGINT)""".stripMargin

  // ---------------------------------------------------------------
  /** r01 — star revenue rollup: orders ⋈ customer (shuffle) ⋈ nation
    * ⋈ region (broadcast chain) → per region/nation order count, total
    * and average order value.
    */
  def starRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("orders"),
        Exact.sumMoney(col("o_totalprice")).as("total_value"),
        Exact.avgMoney(col("o_totalprice")).as("avg_value"))
      .orderBy("region", "nation")

  val starRevenueSql: String =
    s"""SELECT r_name AS region, n_name AS nation, COUNT(*) AS orders,
       |  ${Exact.sumMoneySql("o_totalprice")} AS total_value,
       |  ${Exact.avgMoneySql("o_totalprice")} AS avg_value
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY 1, 2 ORDER BY region, nation""".stripMargin

  // ---------------------------------------------------------------
  /** r02 — lineitem ⋈ part ⋈ supplier revenue by brand: two fact-dim
    * joins where the dims grow with scale (shuffle joins under AQE;
    * part/supplier would be bucketed co-partitioned tables in a real
    * 100 TB layout). Discounted revenue via exact integer arithmetic.
    */
  def brandRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(
        count(lit(1)).as("items"),
        (sum(revenueUnits) / 1000000.0).as("revenue"),
        countDistinct("s_suppkey").as("suppliers"))
      .orderBy("brand")

  val brandRevenueSql: String =
    s"""SELECT p_brand AS brand, COUNT(*) AS items,
       |  SUM($revenueUnitsSql) / 1000000.0 AS revenue,
       |  COUNT(DISTINCT s_suppkey) AS suppliers
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY 1 ORDER BY brand""".stripMargin

  // ---------------------------------------------------------------
  /** r03 — customers with no large order (>$300k) per market segment:
    * left anti join against a filtered fact side (the reference never
    * needed one; a real engine surface does). The filter pushes into
    * the orders scan before the anti join; non-empty at every SF.
    */
  def customersNoOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("customers_no_large_order"))
      .orderBy("segment")

  val customersNoOrdersSql: String =
    """SELECT c_mktsegment AS segment,
      |  COUNT(*) AS customers_no_large_order
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |GROUP BY 1 ORDER BY segment""".stripMargin

  // ---------------------------------------------------------------
  /** r04 — the reference's actual approxQuantile API (A10):
    * `df.stat.approxQuantile` (Greenwald-Khanna, relativeError 0.01)
    * over the lineitem numerics. Approximate by contract → no SQL
    * oracle (driver checks rows/schema only); the exact-percentile
    * twin q14 is the hash-checked variant. GK sketches merge
    * per-partition — one pass, bounded memory at any scale, unlike
    * exact percentile's per-group value buffering.
    */
  def approxQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val df = Tables.lineitem(spark, dir)
    val qs = df.stat.approxQuantile(cols.toArray, Array(0.05, 0.5, 0.95), 0.01)
    cols.zip(qs).map { case (c, Array(p05, p50, p95)) => (c, p05, p50, p95) }
      .toDF("col_name", "p05", "p50", "p95")
      .orderBy("col_name")
  }

  // ---------------------------------------------------------------
  /** r05 — approx distinct (SURVEY §7.4): HLL++ `approx_count_distinct`
    * at two precisions. Sketch values are engine-specific → rows-only
    * check; RelationalSpec computes the exact count separately and
    * pins the ≤5% relative error. Deliberately NOT mixed with an
    * exact `countDistinct` in the same agg: that combination forces
    * an Expand (row duplication per aggregate family) — at 100 TB the
    * sketch-only form is the whole point (fixed memory, one pass, no
    * key shuffle).
    */
  // no `balanced` rebalance: HLL register updates are ~ns-per-row —
  // nowhere near the CPU-per-row bar that pays for a full-width
  // shuffle of the table (the gate exists for shingle/codec stages)
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).agg(
      count(lit(1)).as("orders"),
      approx_count_distinct("o_custkey").as("approx_customers"),
      approx_count_distinct("o_custkey", 0.01).as("approx_customers_1pct"))

  // ---------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r05_approx_distinct" -> approxDistinct _,
    "r01_star_revenue" -> starRevenue _,
    "r02_brand_revenue" -> brandRevenue _,
    "r03_customers_no_orders" -> customersNoOrders _,
    "r04_approx_quantiles" -> approxQuantiles _
  )

  def oracles: Map[String, String] = Map(
    "r01_star_revenue" -> starRevenueSql,
    "r02_brand_revenue" -> brandRevenueSql,
    "r03_customers_no_orders" -> customersNoOrdersSql
    // r04 rows-only: approximate by design
  )
}
