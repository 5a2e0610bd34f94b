package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local session for every suite (suites run sequentially —
  * build.sbt `Test / parallelExecution := false`).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Tables.session("graft-test", "4")
    s.sparkContext.setLogLevel("ERROR")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }

  val sfDir = "/root/testdata/sf0.001"

  /** Events-schema fixture frame: (event_id, ts "yyyy-MM-dd HH:mm:ss",
    * user_id, event_type, value, props-JSON).
    */
  def eventsFixture(rows: Seq[(Long, String, Long, String, Double, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .to_timestamp(org.apache.spark.sql.functions.col("ts_s")))
      .drop("ts_s")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
}
