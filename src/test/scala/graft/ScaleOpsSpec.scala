package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.funsuite.AnyFunSuite

/** Scale-posture operators: salted skew join correctness and the
  * bucketed co-located join (shuffle-free by layout).
  */
class ScaleOpsSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import TestSpark._

  test("salted join returns exactly the unsalted join's result") {
    val fact = Tables.orders(spark, sfDir)
    val dim = Tables.customer(spark, sfDir)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = fact.join(dim, Seq("o_custkey"), "inner")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"),
        Exact.sumMoney(col("o_totalprice")).as("v"))
    val salted = SkewJoin.saltedInnerJoin(fact, dim, "o_custkey",
        factSaltSource = col("o_orderkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"),
        Exact.sumMoney(col("o_totalprice")).as("v"))
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.exceptAll(plain).count() === 0)
  }

  test("salting spreads a hot key across nSalts partitions") {
    val s = spark
    import s.implicits._
    // one pathological key with 10k rows
    val fact = (1 to 10000).map(i => (1L, i)).toDF("k", "payload")
    val dim = Seq((1L, "hot")).toDF("k", "label")
    val joined = SkewJoin.saltedInnerJoin(fact, dim, "k",
      factSaltSource = col("payload"), nSalts = 8)
    assert(joined.count() === 10000)
    // the derived salt must actually take all 8 values
    val salts = fact.select(pmod(hash(col("payload")), lit(8)))
      .distinct().count()
    assert(salts === 8)
  }

  test("bucketed tables co-locate: equi-join plans without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse directories persist — clear them or CTAS refuses
    val wh = new java.io.File(java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath)
    Seq("b_orders", "b_customer").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    Reports.writeBucketed(Tables.orders(spark, sfDir),
      "b_orders", 8, "o_custkey")
    Reports.writeBucketed(
      Tables.customer(spark, sfDir).withColumnRenamed("c_custkey", "o_custkey"),
      "b_customer", 8, "o_custkey")
    // force a sort-merge join (broadcast would mask the layout win)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), Seq("o_custkey"))
        .filter(col("o_totalprice") > 0)
      joined.write.format("noop").mode("overwrite").save()
      val plan = joined.queryExecution.executedPlan
      val exchanges = collectWithSubqueries(plan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join should be shuffle-free, got:\n$plan")
      val smj = collectWithSubqueries(plan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, "expected a sort-merge join over buckets")
      // and it returns the same rows as the plain join
      assert(joined.count() ===
        Tables.orders(spark, sfDir).join(
          Tables.customer(spark, sfDir).withColumnRenamed("c_custkey", "o_custkey"),
          Seq("o_custkey")).filter(col("o_totalprice") > 0).count())
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
