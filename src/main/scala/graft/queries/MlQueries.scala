package graft

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.classification.{LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator, RegressionEvaluator}
import org.apache.spark.ml.feature.{HashingTF, Imputer, OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.regression.{LinearRegression, RandomForestRegressor}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The spark.ml surface (SURVEY.md §2.10, Q20): the reference's four
  * train/evaluate pipelines re-keyed onto the events-as-trips features,
  * plus the standalone vectorize/scale job, model persistence, and
  * threshold scoring.
  *
  * Configs mirror the reference exactly:
  *   - feature stages: StringIndexer(handleInvalid=keep) → OneHotEncoder
  *     → Imputer(median) → VectorAssembler(handleInvalid=keep) →
  *     StandardScaler(withMean, withStd)
  *     (spark_jobs/03b_vectorize_scale.py:30-44)
  *   - LinearRegression maxIter=50, regParam=0.1, elasticNet=0,
  *     standardization=false (spark_jobs/04a_reg_total_lr_PIPE.py:59-66)
  *   - LogisticRegression maxIter=50, regParam=0.1
  *     (spark_jobs/04b_cls_tip_lr_PIPE2.py:66)
  *   - RandomForestRegressor 60 trees / depth 8 / bins 32 / subsample
  *     0.7 / sqrt / seed 42 / cacheNodeIds
  *     (spark_jobs/04c_reg_total_rf_PIPE.py:48-58)
  *   - RandomForestClassifier 80 trees / depth 10, same knobs
  *     (spark_jobs/04d_cls_tip_rf_PIPE2.py:57-60)
  *   - randomSplit([0.8, 0.2], seed=42) after na.drop on the label
  *     (04a:71); classification feature set excludes the leaky
  *     tip_rate exactly where the reference does (04d:30-34 vs
  *     04b:42-44 — the documented AUC gap between the two).
  *
  * Results are one-row metric frames (rounded 4 dp) — the driver
  * checks these rows-only (no SQL oracle: ML training is not
  * SQL-expressible; SURVEY §7.5.7 pins metrics as plausibility bands,
  * not hash targets). Scalatest asserts the bands (MlSpec).
  *
  * Scale posture: training data is the cleaned feature frame (one
  * shuffle from dropDuplicates); spark.ml's own iterations cache the
  * assembled vectors (M13), trees use cacheNodeIds. Nothing here
  * collects rows to the driver beyond the final metric scalars.
  */
object MlQueries {

  /** Numeric feature columns (all cast double for Imputer). */
  val numericFeatures: Seq[String] = Seq(
    "trip_distance", "duration_min", "avg_speed_mph",
    "pickup_hour", "pickup_dow", "is_weekend", "night_flag")

  /** The reference's leaky extra regressor/classifier feature
    * (04b includes tip_rate; 04d deliberately drops it).
    */
  val leakyFeatures: Seq[String] = Seq("tip_rate")

  /** Cleaned trips-analog frame with double-cast ML columns.
    * na.drop / na.fill here are the reference's exact API forms
    * (P10/P11 — 04a:71, 03b:67-69).
    */
  def mlFrame(spark: SparkSession, dir: String): DataFrame = {
    val base = Clean.strict(Features.enrich(Tables.events(spark, dir)))
      .withColumn("label_total", col("total_amount"))
      .withColumn("label", col("label_tip").cast("double"))
    val casted = (numericFeatures ++ leakyFeatures).foldLeft(base) {
      (df, c) => df.withColumn(c, col(c).cast("double"))
    }
    casted
      .na.drop(Seq("label_total", "label"))
      .na.fill(0, Seq("is_weekend", "night_flag"))
      // pin the partitioning by a unique key: randomSplit samples
      // per-partition (after an internal within-partition sort), and
      // dropDuplicates' shuffle arrival order is otherwise
      // nondeterministic — without this, fold membership (and hence
      // metrics) drifts between runs on identical data
      .repartition(8, col("event_id"))
  }

  /** Feature stages 03b: index → OHE → impute(median) → assemble →
    * scale. Imputer writes `_imp` copies (Spark disallows true
    * in-place outputCols); the assembler consumes the imputed copies.
    */
  def featureStages(numerics: Seq[String]): Array[PipelineStage] = {
    val imputed = numerics.map(_ + "_imp")
    Array(
      new StringIndexer()
        .setInputCol("event_type").setOutputCol("pt_idx")
        .setHandleInvalid("keep"),
      new OneHotEncoder()
        .setInputCol("pt_idx").setOutputCol("pt_ohe"),
      new Imputer()
        .setInputCols(numerics.toArray).setOutputCols(imputed.toArray)
        .setStrategy("median"),
      new VectorAssembler()
        .setInputCols((imputed :+ "pt_ohe").toArray)
        .setOutputCol("features_raw").setHandleInvalid("keep"),
      new StandardScaler()
        .setInputCol("features_raw").setOutputCol("features")
        .setWithMean(true).setWithStd(true))
  }

  private def split(df: DataFrame): (DataFrame, DataFrame) = {
    val Array(tr, te) = df.randomSplit(Array(0.8, 0.2), 42)
    (tr, te)
  }

  private def r4(x: Double): Double = math.rint(x * 1e4) / 1e4

  /** Persist a model + its metrics.json the way the 04x jobs do
    * (S9/S10): `<tmp>/graft_models/<name>/` + `metrics.json`.
    */
  private def persist(name: String, model: PipelineModel,
                      metrics: Seq[(String, Double)]): String = {
    // tmpfs-backed scratch — see Reports.csvRoundTrip
    val dir = TempArtifacts.stableScratchDir("graft_models")
      .resolve(name).toString
    model.write.overwrite().save(s"$dir/model")
    val json = metrics
      .map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/metrics.json"), json)
    dir
  }

  private def regMetrics(pred: DataFrame): Seq[(String, Double)] = {
    def eval(m: String) = new RegressionEvaluator()
      .setLabelCol("label_total").setPredictionCol("prediction")
      .setMetricName(m).evaluate(pred)
    Seq("rmse" -> r4(eval("rmse")), "mae" -> r4(eval("mae")),
      "r2" -> r4(eval("r2")))
  }

  private def clsMetrics(pred: DataFrame): Seq[(String, Double)] = {
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC").evaluate(pred)
    val acc = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
      .setMetricName("accuracy").evaluate(pred)
    Seq("auc" -> r4(auc), "accuracy" -> r4(acc))
  }

  // ---------------------------------------------------------------
  /** ml01 — standalone vectorize/scale (03b): fit the feature
    * pipeline, transform, report row count + assembled vector width.
    * Returned raw for [[vectorizeScale]]'s band reduction and the
    * MlSpec assertions.
    */
  private[graft] def vectorizeScaleValues(
      spark: SparkSession, dir: String): (Long, Int, Int) = {
    val df = mlFrame(spark, dir)
    val out = new Pipeline()
      .setStages(featureStages(numericFeatures ++ leakyFeatures))
      .fit(df).transform(df)
      .withColumn("dim", size(vector_to_array(col("features"))))
    val row = out.agg(
      count(lit(1)).as("n_rows"), max("dim").as("feature_dim"),
      min("dim").as("min_dim")).head()
    (row.getLong(0), row.getInt(1), row.getInt(2))
  }

  /** ml01 driver row (round-11 verdict "next" 3): the raw count/width
    * scalars are data-dependent, so the driver gate asserts the
    * INVARIANTS as booleans with a constant-TRUE oracle — the ml08
    * trick: the frame is non-empty, every assembled vector has the
    * same width (no ragged assembly), and that width is at least the
    * raw input feature count (OHE only widens). Any violation
    * hash-reds the row instead of hiding behind rows-only.
    */
  def vectorizeScale(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (nRows, dimMax, dimMin) = vectorizeScaleValues(spark, dir)
    Seq((nRows > 0L, dimMax == dimMin,
        dimMin >= numericFeatures.size + leakyFeatures.size))
      .toDF("band_nonempty", "band_dim_constant", "band_dim_min_width")
  }

  // ---------------------------------------------------------------
  /** Memoized train-and-evaluate (round-10): ml02–ml05 AND the ml08
    * band gate consume the same metrics, so each pipeline trains at
    * most once per (session, dir) — `PlanMemo.cachedValue` keeps the
    * scalars across Bench/Verify `clearCache` calls.
    */
  private[graft] def regResult(spark: SparkSession, dir: String,
                        name: String, model: => PipelineStage,
                        feats: Seq[String]): (Double, Double, Double, Long) =
    PlanMemo.cachedValue(spark, s"ml.reg:$name:$dir") {
      val (tr, te) = split(mlFrame(spark, dir))
      val fitted = new Pipeline()
        .setStages(featureStages(feats) :+ model).fit(tr)
      val pred = fitted.transform(te)
      val m = regMetrics(pred)
      persist(name, fitted, m)
      (m(0)._2, m(1)._2, m(2)._2, te.count())
    }

  private[graft] def clsResult(spark: SparkSession, dir: String,
                        name: String, model: => PipelineStage,
                        feats: Seq[String]): (Double, Double, Long) =
    PlanMemo.cachedValue(spark, s"ml.cls:$name:$dir") {
      val (tr, te) = split(mlFrame(spark, dir))
      val fitted = new Pipeline()
        .setStages(featureStages(feats) :+ model).fit(tr)
      val pred = fitted.transform(te)
      val m = clsMetrics(pred)
      persist(name, fitted, m)
      (m(0)._2, m(1)._2, te.count())
    }

  /** ml02/ml04 driver rows (round-11 verdict "next" 3): training
    * metrics are float scalars no SQL oracle can recompute, but their
    * CONTRACTS are exact — errors are positive, MAE ≤ RMSE (Jensen),
    * R² ≤ 1, and the eval split is non-empty. Reduced to booleans
    * with a constant-TRUE oracle (the ml08 trick); the raw metrics
    * stay reachable via the memoized [[regResult]] (MlSpec bands,
    * ml08's cross-model gate, the S10 JSON metrics sink).
    */
  private def trainRegression(spark: SparkSession, dir: String,
                              name: String, model: => PipelineStage,
                              feats: Seq[String]): DataFrame = {
    import spark.implicits._
    val (rmse, mae, r2, nTest) = regResult(spark, dir, name, model, feats)
    Seq((rmse > 0.0 && mae > 0.0, mae <= rmse, r2 <= 1.0, nTest > 0L))
      .toDF("band_errors_positive", "band_mae_le_rmse", "band_r2_le_1",
        "band_eval_nonempty")
  }

  /** ml03/ml05 driver rows: AUC/accuracy are probabilities (∈ [0, 1])
    * over a non-empty split, and any trained model beats coin-flip
    * AUC on this corpus (the leaky-vs-honest MAGNITUDE split is
    * ml08's cross-model gate).
    */
  private def trainClassification(spark: SparkSession, dir: String,
                                  name: String, model: => PipelineStage,
                                  feats: Seq[String]): DataFrame = {
    import spark.implicits._
    val (auc, acc, nTest) = clsResult(spark, dir, name, model, feats)
    Seq((auc > 0.5 && auc <= 1.0, acc > 0.0 && acc <= 1.0, nTest > 0L))
      .toDF("band_auc", "band_accuracy", "band_eval_nonempty")
  }

  // the four model configurations (defs: estimators are stateful,
  // each fit gets a fresh instance) — shared by ml02–ml05 and ml08
  private def lrRegModel = new LinearRegression()
    .setLabelCol("label_total").setFeaturesCol("features")
    .setMaxIter(50).setRegParam(0.1).setElasticNetParam(0.0)
    .setStandardization(false)
  private def lrClsModel = new LogisticRegression()
    .setLabelCol("label").setFeaturesCol("features")
    .setMaxIter(50).setRegParam(0.1)
  private def rfRegModel = new RandomForestRegressor()
    .setLabelCol("label_total").setFeaturesCol("features")
    .setNumTrees(60).setMaxDepth(8).setMaxBins(32)
    .setSubsamplingRate(0.7).setFeatureSubsetStrategy("sqrt")
    .setSeed(42).setCacheNodeIds(true)
  private def rfClsModel = new RandomForestClassifier()
    .setLabelCol("label").setFeaturesCol("features")
    .setNumTrees(80).setMaxDepth(10).setMaxBins(32)
    .setSubsamplingRate(0.7).setFeatureSubsetStrategy("sqrt")
    .setSeed(42).setCacheNodeIds(true)

  /** Raw memoized metrics for the scalatest plausibility bands (the
    * driver rows reduce these to booleans).
    */
  private[graft] def rfRegMetrics(spark: SparkSession, dir: String) =
    regResult(spark, dir, "reg_total_rf", rfRegModel,
      numericFeatures ++ leakyFeatures)
  private[graft] def lrClsMetrics(spark: SparkSession, dir: String) =
    clsResult(spark, dir, "cls_tip_lr", lrClsModel,
      numericFeatures ++ leakyFeatures)

  /** ml02 — LinearRegression on label_total (04a). */
  def lrRegression(spark: SparkSession, dir: String): DataFrame =
    trainRegression(spark, dir, "reg_total_lr", lrRegModel,
      numericFeatures ++ leakyFeatures)

  /** ml03 — LogisticRegression on label_tip (04b — includes the leaky
    * tip_rate feature, reproducing the reference's near-1.0 AUC).
    */
  def lrClassification(spark: SparkSession, dir: String): DataFrame =
    trainClassification(spark, dir, "cls_tip_lr", lrClsModel,
      numericFeatures ++ leakyFeatures)

  /** ml04 — RandomForestRegressor (04c). */
  def rfRegression(spark: SparkSession, dir: String): DataFrame =
    trainRegression(spark, dir, "reg_total_rf", rfRegModel,
      numericFeatures ++ leakyFeatures)

  /** ml05 — RandomForestClassifier (04d — tip_rate excluded, the
    * honest-AUC variant).
    */
  def rfClassification(spark: SparkSession, dir: String): DataFrame =
    trainClassification(spark, dir, "cls_tip_rf", rfClsModel,
      numericFeatures)

  /** ml08 — the BASELINE.md metric-band gate as a hash-checkable
    * query (round-9 verdict "next" 2): ml02–ml05's raw metrics are
    * rows-only by design (float training metrics are not hash
    * targets), which left the published-pattern plausibility bands
    * visible only to scalatest. This entry reduces the four models'
    * memoized metrics to BOOLEAN verdicts over the reference's
    * published PATTERN (BASELINE.md §"published model metrics"):
    * the leaky-LR classifier saturates AUC (0.999957 published),
    * the honest RF classifier scores strictly below it, and the RF
    * regressor beats the LR regressor on both RMSE and R². The
    * band bounds are calibrated to the synthetic events mapping
    * (leaky AUC > 0.99 matches the reference; absolute R² does not
    * transfer across datasets, so the R² bands assert the PATTERN:
    * RF materially positive, LR near zero — the synthetic twin of
    * the reference's 0.9098 vs −34.5304).
    *
    * With a constant-TRUE DuckDB oracle, any broken band turns this
    * row hash-red in the driver's correctness gate. Training is NOT
    * repeated: the memoized scalars from ml02–ml05 are reused.
    */
  def metricBands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (lrRmse, _, lrR2, _) =
      regResult(spark, dir, "reg_total_lr", lrRegModel,
        numericFeatures ++ leakyFeatures)
    val (rfRmse, _, rfR2, _) =
      regResult(spark, dir, "reg_total_rf", rfRegModel,
        numericFeatures ++ leakyFeatures)
    val (lrAuc, lrAcc, _) =
      clsResult(spark, dir, "cls_tip_lr", lrClsModel,
        numericFeatures ++ leakyFeatures)
    val (rfAuc, rfAcc, _) =
      clsResult(spark, dir, "cls_tip_rf", rfClsModel, numericFeatures)
    Seq((
      lrAuc > 0.99,                      // leakage saturates AUC
      rfAuc < lrAuc,                     // honest model scores below
      rfAuc > 0.5 && rfAuc < 0.99,       // ...but beats chance
      rfR2 > 0.1 && rfR2 <= 1.0,         // RF regression has signal
      rfR2 > lrR2 && rfRmse < lrRmse,    // and beats linear
      lrAcc > 0.9 && rfAcc > 0.5 && rfAcc <= 1.0
    )).toDF("band_lr_leak_auc", "band_rf_below_lr_auc",
      "band_rf_honest_auc", "band_rf_r2", "band_rf_beats_lr_reg",
      "band_accuracies")
  }

  // ---------------------------------------------------------------
  /** ml06 — model persistence round-trip (S9, M6): save the fitted
    * classifier pipeline, PipelineModel.load it back, score the same
    * split with both, and compare. Raw counts for MlSpec; the driver
    * row ([[persistenceRoundTrip]]) reduces them to booleans.
    */
  private[graft] def persistenceValues(
      spark: SparkSession, dir: String): (Long, Long, Double) = {
    val (tr, te) = split(mlFrame(spark, dir))
    val fitted = new Pipeline()
      .setStages(featureStages(numericFeatures) :+
        new LogisticRegression()
          .setLabelCol("label").setFeaturesCol("features")
          .setMaxIter(10).setRegParam(0.1))
      .fit(tr)
    val path = persist("roundtrip_lr", fitted, Seq())
    val reloaded = PipelineModel.load(s"$path/model")
    def scored(m: PipelineModel, p: String, pr: String) =
      m.transform(te).select(col("event_id"), col("prediction").as(p),
        vector_to_array(col("probability")).getItem(1).as(pr))
    val joined = scored(fitted, "p1", "pr1")
      .join(scored(reloaded, "p2", "pr2"), "event_id")
    val row = joined.agg(
      count(lit(1)).as("n_scored"),
      sum(when(col("p1") =!= col("p2"), 1).otherwise(0)).as("n_mismatch"),
      max(abs(col("pr1") - col("pr2"))).as("max_prob_diff")).head()
    (row.getLong(0), row.getLong(1), row.getDouble(2))
  }

  /** ml06 driver row (round-11 verdict "next" 3): the save→load→
    * transform equality contract as booleans with a constant-TRUE
    * oracle — the reloaded pipeline scored a non-empty test split
    * with ZERO prediction disagreements and BIT-IDENTICAL class-1
    * probabilities (save/load round-trips the coefficients exactly,
    * so the scoring arithmetic is the same IEEE sequence). A lossy
    * round-trip hash-reds the row.
    */
  def persistenceRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (nScored, nMismatch, maxProbDiff) = persistenceValues(spark, dir)
    Seq((nScored > 0L, nMismatch == 0L, maxProbDiff == 0.0))
      .toDF("band_scored", "band_predictions_equal", "band_probabilities_equal")
  }

  /** ml07 — threshold-override scoring (M12/M13, O6 —
    * app5.py:355-426): rand(seed)-shuffled cached sample, P(class=1)
    * from the probability vector, per-threshold positive counts.
    */
  private[graft] def thresholdValues(
      spark: SparkSession, dir: String): (Long, Long, Long, Long) = {
    val (tr, te) = split(mlFrame(spark, dir))
    val fitted = new Pipeline()
      .setStages(featureStages(numericFeatures) :+
        new LogisticRegression()
          .setLabelCol("label").setFeaturesCol("features")
          .setMaxIter(10).setRegParam(0.1))
      .fit(tr)
    val sample = te.orderBy(rand(42)).limit(500).cache()
    val scored = fitted.transform(sample)
      .withColumn("proba1", vector_to_array(col("probability")).getItem(1))
    val row = scored.agg(
      count(lit(1)).as("n"),
      sum(when(col("proba1") >= 0.3, 1).otherwise(0)).as("pos_at_030"),
      sum(when(col("proba1") >= 0.5, 1).otherwise(0)).as("pos_at_050"),
      sum(when(col("proba1") >= 0.7, 1).otherwise(0)).as("pos_at_070")).head()
    sample.unpersist()
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
  }

  /** ml07 driver row (round-11 verdict "next" 3): the per-threshold
    * positive counts are model-dependent scalars, but the THRESHOLD
    * CONTRACT is exact — raising the cut can only shrink the positive
    * set (monotone nesting), and every count is bounded by the sample
    * size. Reduced to booleans with a constant-TRUE oracle; a scoring
    * path that breaks the nesting hash-reds the row.
    */
  def thresholdScoring(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (n, p30, p50, p70) = thresholdValues(spark, dir)
    Seq((n > 0L, p30 >= p50 && p50 >= p70, p30 <= n && p70 >= 0L))
      .toDF("band_sampled", "band_threshold_monotone", "band_counts_bounded")
  }

  // ---------------------------------------------------------------
  // ---------------------------------------------------------------
  /** Raw held-out metrics of the ml09 learned-quality-classifier
    * twin: spark.ml LogisticRegression over HashingTF([[Text.qcDim]])
    * hashed bag-of-words features — the fastText-style spelling with
    * a real iterative optimizer — trained on t23's deterministic
    * split with t23's median-split teacher ([[Text.qcLabels]]).
    * Memoized so the driver row and MlSpec's tighter empirical bands
    * share one training run.
    */
  /** Held-out per-document predictions of the ml09 LR twin — the
    * pipeline-stage output ml10 checks for agreement with t23's
    * closed-form scorer. Memoized cached frame: the model fit runs
    * once per (session, corpus) and the transform survives the
    * metrics evaluate + the ml10 join.
    */
  private[graft] def qcLrPreds(spark: SparkSession, dir: String): DataFrame =
    PlanMemo.cached(spark, s"ml.qcLrPreds:$dir") {
      // the SAME memo key t23 uses, so one session computes the
      // corpus-wide teacher pass once across both entries (and the
      // persisted frame survives the LR fit/transform/evaluate chain
      // instead of re-deriving per action)
      val labels = PlanMemo.cached(spark, s"text.qcLabels:$dir")(
        Text.qcLabels(spark, dir))
      val base = Tables.documents(spark, dir)
        .select(col("doc_id"), Text.tokens(lower(col("text"))).as("words"))
        .join(labels, "doc_id")
        .withColumn("label", col("y").cast("double"))
      val tf = new HashingTF()
        .setInputCol("words").setOutputCol("features")
        .setNumFeatures(Text.qcDim)
      val train = tf.transform(
        base.filter(col("doc_id") % Text.qcFolds =!= 0))
      val eval = tf.transform(
        base.filter(col("doc_id") % Text.qcFolds === 0))
      val lr = new LogisticRegression()
        .setMaxIter(20).setRegParam(0.01)
        .setFeaturesCol("features").setLabelCol("label")
      lr.fit(train).transform(eval)
        .select("doc_id", "label", "rawPrediction", "prediction")
    }

  private[graft] def qcLrMetrics(spark: SparkSession, dir: String)
      : (Double, Double, Long) =
    PlanMemo.cachedValue(spark, s"ml.qcLr:$dir") {
      val pred = qcLrPreds(spark, dir)
      val Seq((_, auc), (_, acc)) = clsMetrics(pred)
      (auc, acc, pred.count())
    }

  /** ml09 — learned quality classifier, spark.ml twin of t23 (the
    * round-13 verdict's "fastText-style hashed-ngram linear
    * classifier scoring every document"): LogisticRegression on the
    * SAME hashed feature space and teacher labels as t23's
    * closed-form scorer, band-gated on held-out AUC/accuracy (an
    * iterative optimizer is not SQL-replayable — t23 carries the
    * hash gate for this family). Band floors sit under the measured
    * minima across sf0.001 → GenData sf1 (AUC ≥ 0.92 measured; 0.85
    * floor) so the gate fails on a real regression, not on noise.
    */
  def qualityClassifierLr(spark: SparkSession, dir: String): DataFrame = {
    val (auc, acc, n) = qcLrMetrics(spark, dir)
    import spark.implicits._
    Seq((auc >= 0.85, acc >= 0.55, auc <= 1.0 && acc <= 1.0, n > 0L))
      .toDF("band_auc", "band_accuracy", "band_bounded",
        "band_eval_nonempty")
  }

  /** ml10 — SCORING PARITY between the two quality classifiers
    * (round-15 verdict "next" 8): the spark.ml LR twin checked as a
    * PIPELINE STAGE, not just a metric — on the held-out fifth, each
    * model selects its own top q fraction (q = t23's positive rate;
    * the per-model (1−q) score quantile is the cutoff) and the two
    * SELECTIONS must agree on ≥ 80% of documents. Rate-matched
    * selection, not raw pred comparison, because the raw thresholds
    * calibrate differently — t23 cuts at score 0 (no intercept), LR
    * fits one — and MEASURED raw agreement swings 0.62→0.83→0.98
    * across sf0.001→0.1 on intercept placement alone, while
    * rate-matched agreement holds 0.88–0.98 (Probe `qcagree`). The
    * selection is also the decision a curation pipeline actually
    * ships ("keep the top q%"). Floor 0.8 sits under the measured
    * minimum (0.878 at sf0.01) the way every ML band here does.
    *
    * Scale shape: one shuffle_hash join of two held-out-fifth-sized
    * frames, two single-pass aggregations (rate + the two quantiles),
    * one agreement count — no global sort, no driver-side ranking.
    */
  def qcAgreement(spark: SparkSession, dir: String): DataFrame = {
    val lr = qcLrPreds(spark, dir)
      .select(col("doc_id"),
        vector_to_array(col("rawPrediction")).getItem(1).as("raw"))
    val t23 = Text.qualityClassifier(spark, dir)
      .filter(col("heldout") === 1)
      .select(col("doc_id"), col("score8"), col("pred"))
    // shuffle_hash: both sides are held-out-fifth-sized (corpus-scale);
    // memoized so the rate, cutoff and agreement passes share one join
    val j = PlanMemo.cached(spark, s"ml.qcAgree:$dir")(
      lr.join(t23.hint("shuffle_hash"), "doc_id"))
    val q = j.agg(avg(col("pred").cast("double"))).head().getDouble(0)
    val frac = math.min(math.max(1.0 - q, 0.0), 1.0)
    val cuts = j.agg(
      expr(s"percentile(score8, ${frac}D)").as("c23"),
      expr(s"percentile(raw, ${frac}D)").as("clr")).head()
    val (c23, cLr) = (cuts.getDouble(0), cuts.getDouble(1))
    val row = j.agg(count(lit(1)).as("n"),
      sum(when((col("score8") > c23) === (col("raw") > cLr), 1L)
        .otherwise(0L)).as("agree")).head()
    val (n, agree) = (row.getLong(0), row.getLong(1))
    import spark.implicits._
    Seq((n > 0L, agree * 10L >= n * 8L, agree <= n))
      .toDF("band_eval_nonempty", "band_selection_agreement", "band_bounded")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml10_qc_agreement" -> qcAgreement _,
    "ml09_quality_lr" -> qualityClassifierLr _,
    "ml01_vectorize_scale" -> vectorizeScale _,
    "ml02_lr_regression" -> lrRegression _,
    "ml03_lr_classification" -> lrClassification _,
    "ml04_rf_regression" -> rfRegression _,
    "ml05_rf_classification" -> rfClassification _,
    "ml06_persistence" -> persistenceRoundTrip _,
    "ml07_threshold_scoring" -> thresholdScoring _,
    "ml08_metric_bands" -> metricBands _
  )

  /** Float training metrics are not hash targets, so every ml driver
    * row reduces its exact CONTRACT to booleans and carries a
    * constant-TRUE oracle (round-11 verdict "next" 3 — 0 `no_oracle`
    * entries): any broken band hash-reds the row. The raw metrics
    * stay reachable via the memoized [[regResult]]/[[clsResult]] and
    * the `private[graft]` value helpers (MlSpec pins the tighter
    * empirical bands there).
    */
  private def trueOracle(cols: String*): String =
    cols.map(c => s"TRUE AS $c").mkString("SELECT ", ", ", "")

  def oracles: Map[String, String] = Map(
    "ml10_qc_agreement" -> trueOracle(
      "band_eval_nonempty", "band_selection_agreement", "band_bounded"),
    "ml09_quality_lr" -> trueOracle(
      "band_auc", "band_accuracy", "band_bounded", "band_eval_nonempty"),
    "ml01_vectorize_scale" -> trueOracle(
      "band_nonempty", "band_dim_constant", "band_dim_min_width"),
    "ml02_lr_regression" -> trueOracle(
      "band_errors_positive", "band_mae_le_rmse", "band_r2_le_1",
      "band_eval_nonempty"),
    "ml03_lr_classification" -> trueOracle(
      "band_auc", "band_accuracy", "band_eval_nonempty"),
    "ml04_rf_regression" -> trueOracle(
      "band_errors_positive", "band_mae_le_rmse", "band_r2_le_1",
      "band_eval_nonempty"),
    "ml05_rf_classification" -> trueOracle(
      "band_auc", "band_accuracy", "band_eval_nonempty"),
    "ml06_persistence" -> trueOracle(
      "band_scored", "band_predictions_equal", "band_probabilities_equal"),
    "ml07_threshold_scoring" -> trueOracle(
      "band_sampled", "band_threshold_monotone", "band_counts_bounded"),
    "ml08_metric_bands" ->
      """SELECT TRUE AS band_lr_leak_auc, TRUE AS band_rf_below_lr_auc,
        |  TRUE AS band_rf_honest_auc, TRUE AS band_rf_r2,
        |  TRUE AS band_rf_beats_lr_reg, TRUE AS band_accuracies""".stripMargin
  )
}
