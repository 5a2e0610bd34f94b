package graft

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's interactive frontend session re-expressed as a
  * plain long-lived class — the state streamlit keeps between widget
  * interactions (`/root/reference/streamlit_app/app5.py:200-276`):
  * one SparkSession, a current enriched frame (bundled project sample
  * OR an uploaded CSV), a registered temp view for free-form SQL, a
  * seeded cached scoring sample, and loaded PipelineModels.
  *
  * Every capability delegates to the oracle-gated engine pieces:
  * upload = S4 ([[Sources.uploadedCsv]]) + [[Features.enrich]]
  * (app5.py:118-127), preview = S11 safe projection
  * ([[Reports.preview]], app5.py:129-152), SQL = the `taxi` temp view
  * (app5.py:263-276, q19's surface), KPI tables = tab-3's
  * aggregations (app5.py:280-320), reports = the 05c tree, scoring =
  * ml07's seeded-cached-sample + threshold override
  * (app5.py:355-426). Only the session/state glue is new here.
  *
  * Scale posture: the session holds LAZY plans plus one bounded
  * cached sample (n rows, unpersisted on source switch) — nothing
  * here materializes the full frame on the driver.
  */
final class AppSession(val spark: SparkSession, sfDir: String) {
  import AppSession.ViewName

  private var frame: DataFrame = _
  private var sample: Option[DataFrame] = None

  useProjectSample() // app5 boots on the bundled sample (app5.py:200-203)

  /** The current enriched frame (whatever source is active). */
  def current: DataFrame = frame

  /** Source "Project sample": bundled events, enriched. */
  def useProjectSample(): DataFrame =
    setSource(Features.enrich(Tables.events(spark, sfDir)))

  /** Source "Upload CSV": bytes → temp file → header/inferSchema read
    * → enrich (S4, app5.py:118-127). An events-schema CSV takes the
    * exact project path; anything else (e.g. a genuine
    * `tpep_pickup_datetime` vendor CSV) goes through the
    * schema-FLEXIBLE enrichment — sniffed timestamp columns, derived
    * features where possible, typed nulls elsewhere — so upload
    * degrades like app5 instead of throwing (app5.py:76-101).
    */
  def uploadCsv(bytes: Array[Byte]): DataFrame = {
    val raw = Sources.uploadedCsv(spark, bytes)
    val isEventsSchema =
      Seq("ts", "value", "props").forall(raw.columns.contains)
    setSource(
      if (isEventsSchema) Features.enrich(raw)
      else Features.enrichFlexible(raw))
  }

  private def setSource(df: DataFrame): DataFrame = {
    sample.foreach(_.unpersist()) // a stale sample is the old source's
    sample = None
    frame = df
    frame.createOrReplaceTempView(ViewName)
    frame
  }

  /** Tab 1 preview: display-safe projection + bounded collect. */
  def preview(n: Int = 20): Array[Row] = Reports.preview(frame, n)

  /** Tab 1 quick summary (rows / avg fare / avg total / avg tip rate,
    * app5.py:248-258).
    */
  def summary(): DataFrame = frame.agg(
    count(lit(1)).as("rows"),
    Exact.avgMoney(col("fare_amount")).as("avg_fare"),
    Exact.avgMoney(col("total_amount")).as("avg_total"),
    Exact.round4(avg("tip_rate")).as("avg_tip_rate"))

  /** Tab 2: free-form SQL over the registered `taxi` view. */
  def sql(query: String): DataFrame = spark.sql(query)

  /** Tab 3 KPI tables, computed over the CURRENT frame (not the
    * bundled tables — an uploaded CSV changes these, app5.py:280-320).
    */
  def kpiByPayment: DataFrame = frame
    .groupBy(col("event_type").as("payment_type"))
    .agg(count(lit(1)).as("trips"),
      Exact.avgMoney(col("fare_amount")).as("avg_fare"),
      Exact.avgMoney(col("total_amount")).as("avg_total"),
      Exact.round4(avg("tip_rate")).as("avg_tip_rate"))
    .orderBy(desc("trips"), col("payment_type"))

  def kpiByHour: DataFrame = frame
    .groupBy(col("pickup_hour"))
    .agg(count(lit(1)).as("trips"),
      Exact.avgMoney(col("fare_amount")).as("avg_fare"))
    .orderBy("pickup_hour")

  def kpiHeatmap: DataFrame = frame
    .groupBy(col("pickup_dow"), col("pickup_hour"))
    .agg(count(lit(1)).as("trips"),
      Exact.avgMoney(col("total_amount")).as("avg_total"))
    .orderBy("pickup_dow", "pickup_hour")

  /** Tab 4: the 05c report tree (bundled KPI queries → CSV dir). */
  def writeReports(outDir: String): Seq[String] =
    Reports.writeReportTree(spark, sfDir, outDir)

  /** Tab 5 scoring sample: seeded shuffle, bounded, CACHED (O6 + M13,
    * app5.py:355-356) — memoized for the session, invalidated when the
    * source changes.
    */
  def scoringSample(n: Int = 500, seed: Int = 42): DataFrame =
    sample.getOrElse {
      val s = frame.orderBy(rand(seed)).limit(n).cache()
      sample = Some(s)
      s
    }

  /** Tab 5 prediction with threshold override (M12, app5.py:388-426):
    * transform the cached sample; for classifiers expose P(class=1)
    * and the thresholded decision.
    */
  def score(model: PipelineModel, threshold: Double = 0.5): DataFrame = {
    val scored = model.transform(scoringSample())
    if (scored.columns.contains("probability"))
      scored
        .withColumn("proba1", vector_to_array(col("probability")).getItem(1))
        .withColumn("prediction_at_threshold",
          (col("proba1") >= threshold).cast("int"))
    else scored
  }

  def loadModel(dir: String): PipelineModel = PipelineModel.load(dir)

  def close(): Unit = { sample.foreach(_.unpersist()); sample = None }
}

object AppSession {
  /** The reference's temp-view name (app5.py:263). */
  val ViewName = "taxi"
}

/** Interactive driver program: `runMain graft.Shell [sfDir]` — a
  * stdin REPL over [[AppSession]], the long-lived "session + uploaded
  * file + cached sample" shape of the reference's streamlit app
  * without the widget layer.
  */
object Shell {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val spark = Tables.session("graft-shell")
    spark.sparkContext.setLogLevel("ERROR")
    val session = new AppSession(spark, sfDir)
    println("graft shell — commands: preview [n] | summary | sql <q> | " +
      "kpis | report <dir> | plots <dir> | upload <csvPath> | sample | " +
      "list [prefix] | run <query> | quit")
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
    var live = true
    while (live) {
      print("graft> "); Console.flush()
      val line = Option(in.readLine()).map(_.trim).getOrElse("quit")
      val (cmd, rest) = line.split("\\s+", 2) match {
        case Array(c, r) => (c, r)
        case Array(c) => (c, "")
      }
      try cmd match {
        case "" =>
        case "quit" | "exit" => live = false
        case "preview" =>
          session.preview(rest.toIntOption.getOrElse(20)).foreach(println)
        case "summary" => session.summary().show(truncate = false)
        case "sql" => session.sql(rest).show(50, truncate = false)
        case "kpis" =>
          session.kpiByPayment.show(truncate = false)
          session.kpiByHour.show(24, truncate = false)
        case "report" =>
          session.writeReports(rest).foreach(n => println(s"Saved: $rest/$n.csv"))
        case "plots" =>
          Plots.writePlotTree(spark, sfDir, rest)
            .foreach(n => println(s"Saved: $rest/$n"))
        case "upload" =>
          val df = session.uploadCsv(
            java.nio.file.Files.readAllBytes(java.nio.file.Path.of(rest)))
          println(s"CSV loaded and enriched (${df.count()} rows).")
        case "sample" =>
          println(s"project sample (${session.useProjectSample().count()} rows)")
        case "list" => // the full library surface, by optional prefix
          SparkEntry.queries.keys.toSeq.sorted
            .filter(_.startsWith(rest)).foreach(println)
        case "run" => // any registered query against this session's sfDir
          SparkEntry.queries.get(rest) match {
            case Some(fn) => fn(spark, sfDir).show(50, truncate = false)
            case None => println(
              s"unknown query: $rest (try `list` for the registry)")
          }
        case other => println(s"unknown command: $other")
      } catch { case e: Exception => println(s"error: ${e.getMessage}") }
    }
    session.close()
    spark.stop()
    sys.exit(0)
  }
}
