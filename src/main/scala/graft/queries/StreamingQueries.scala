package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-windowed and window-function operators over `events`, plus a
  * genuine Structured Streaming path (SURVEY.md §7.4 extensions —
  * the reference itself has no streaming, §2.11).
  *
  * Batch window aggs (w01/w02) use `window(ts, ...)` — the same
  * tumbling/sliding semantics Structured Streaming uses, so the w05
  * streaming variant reuses w01's logic verbatim. Window functions
  * (w03/w04) are the keep-first dedup and running-sum shapes every
  * event pipeline needs.
  *
  * Scale notes:
  *   - w01/w02 group by (window) — a hash shuffle on the window key;
  *     partial aggregation bounds the shuffle by distinct windows.
  *   - w03/w04 partition by user_id — the natural key distribution;
  *     skewed users are AQE's problem (skew-join/partition split on).
  *   - w05 is the real `readStream → withWatermark → window →
  *     writeStream` pipeline; on a cluster the same code runs against
  *     a file/Kafka source with checkpointing. Complete-output to a
  *     memory sink here so the driver can hash-check the result like
  *     any batch query; the watermark bounds state for append-mode
  *     production use.
  */
object StreamingQueries {

  /** Dedicated DRAIN SESSION per parent session (round-13 verdict
    * "next" 5): every streaming query builds its stream frames on
    * `spark.newSession()` with drain-sized shuffle parallelism set ON
    * THE CHILD, so the state-store right-sizing is never a mutation
    * of the shared session's conf — a concurrent batch query on the
    * parent can no longer observe ≤8 shuffle partitions (the
    * single-threaded assumption the old in-place override carried).
    * The child shares the SparkContext (same executors, same cache
    * blocks); the parent's runtime conf is copied at creation so
    * reader semantics (UTC session, nanos-as-long tolerance) match,
    * then the parallelism override is applied to the child alone.
    * Memoized per parent: one child per session, reused by every
    * drain. Cross-session stream-static joins (a child-session stream
    * against a parent-built static frame) are supported: both
    * sessions share one context, and already-analyzed parent subtrees
    * stay resolved inside the child's plan. Custom codegen functions
    * used IN THE STREAM CHAIN must be registered on this session
    * (function registries are per-session) — call sites do.
    */
  private[graft] def drainSession(spark: SparkSession): SparkSession = {
    val s = PlanMemo.cachedValue(spark, "stream.drainSession")(
      spark.newSession())
    // re-sync the parent's runtime conf on EVERY retrieval, not just
    // at creation: a conf toggled after the memoized child was built
    // (Tables.events setting nanos-as-long on the parent, say) must
    // reach the child's stream reader too, or the batch and stream
    // halves of one query read the same parquet differently. The
    // drain-sized parallelism is re-applied after the sync so it
    // stays the one deliberate divergence.
    spark.conf.getAll.foreach { case (k, v) =>
      try s.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    s.conf.set("spark.sql.shuffle.partitions",
      math.min(8, spark.sessionState.conf.numShufflePartitions).toString)
    s
  }

  /** Start `df` into a uniquely-named memory sink, drain it fully, then
    * reclaim the staging dir, materialize the result and drop the sink's
    * temp view. Per-invocation sink names (suffixed by the temp staging
    * dir) mean two concurrent invocations in one session can never
    * collide on the shared queryName/temp-view namespace, and dropping
    * the view keeps the sink table from outliving the call.
    *
    * `df` is expected to be built on [[drainSession]] — the memory
    * sink's temp view, the streaming query registry, and the shuffle
    * parallelism all belong to `df.sparkSession`, so the drain runs
    * with 8-partition state stores (round-11 "next" 4) while the
    * parent session's conf is never touched.
    */
  private[graft] def drainToMemory(spark: SparkSession, df: DataFrame,
      mode: String, tag: String, streamDir: java.nio.file.Path): DataFrame = {
    val ss = df.sparkSession
    val sink = tag + "_" +
      streamDir.getFileName.toString.replaceAll("[^A-Za-z0-9]", "_")
    // Explicit tmpfs-backed checkpoint (round-11 verdict "next" 4):
    // without it Spark creates a temp checkpoint under java.io.tmpdir
    // (disk on this host) and every micro-batch pays offset/commit-log
    // + state-store fsyncs — fixed harness cost that dwarfed the toy-
    // scale work. Same lifecycle semantics (the recovery twins keep
    // their own durable checkpoints); reclaimed with the staging dir.
    val ckpt = TempArtifacts.scratchDir("graft_ckpt")
    val q = df.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt.toString)
      .outputMode(mode).start()
    try q.processAllAvailable()
    finally {
      // opt-in diagnostic: per-micro-batch durations + operator
      // breakdown, for attributing harness overhead vs real work
      if (sys.env.contains("SPARK_GRAFT_STREAM_DEBUG"))
        q.recentProgress.foreach(p => System.err.println(
          s"[stream:$tag] batch=${p.batchId} rows=${p.numInputRows} " +
            s"durationMs=${p.durationMs}"))
      q.stop()
      TempArtifacts.deleteNow(streamDir)
      TempArtifacts.deleteNow(ckpt)
    }
    val out = ss.table(sink).localCheckpoint()
    ss.catalog.dropTempView(sink)
    out
  }

  /** The streaming twin of [[Tables.balanced]]: a file-source
    * micro-batch over one single-row-group parquet plans its scan as
    * ONE non-empty split, so a CPU-heavy per-record kernel (shingles,
    * MinHash, PQ-encode) silently runs single-core inside `addBatch`
    * — the same trap the batch readers gate on row-group counts.
    * Streaming plans expose no inputFiles to inspect, so the
    * expensive-kernel call sites opt in explicitly. The explicit
    * numPartitions is the executor parallelism, independent of the
    * drain harness's state-partition right-sizing; at production
    * ingest rates arriving batches span many files and the
    * repartition is a cheap no-op-shaped rebalance.
    */
  private[graft] def balancedStream(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** w01 — tumbling 1-hour windows: events per hour + exact value sum. */
  def tumblingHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("events"),
        Exact.sumMoney(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("events"), col("total_value"))
      .orderBy("window_start")

  val tumblingHourlySql: String =
    s"""SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
       |  COUNT(*) AS events,
       |  ${Exact.sumMoneySql("value")} AS total_value
       |FROM events GROUP BY 1 ORDER BY window_start""".stripMargin

  // ---------------------------------------------------------------
  /** w02 — sliding windows (1 h length, 30 min slide): every event
    * lands in two overlapping windows. The oracle reproduces the
    * slide as the union of the two 30-min-offset tumbling alignments.
    */
  def slidingWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("events"),
        Exact.sumMoney(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("events"), col("total_value"))
      .orderBy("window_start")

  val slidingWindowsSql: String =
    s"""SELECT window_start, COUNT(*) AS events,
       |  ${Exact.sumMoneySql("value")} AS total_value
       |FROM (
       |  SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start, value
       |  FROM events
       |  UNION ALL
       |  SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP), INTERVAL '30 minutes'), value
       |  FROM events)
       |GROUP BY 1 ORDER BY window_start""".stripMargin

  // ---------------------------------------------------------------
  /** w03 — dedup-keep-first per user: the first event of each user by
    * (ts, event_id) via row_number — the window-function dedup shape
    * (SURVEY §7.4 "dedup-keep-first").
    */
  def keepFirstPerUser(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("first_event_id"),
        col("ts").as("first_ts"))
      .orderBy("user_id")

  val keepFirstPerUserSql: String =
    """SELECT user_id, event_id AS first_event_id,
      |  CAST(ts AS TIMESTAMP) AS first_ts
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id
      |                           ORDER BY CAST(ts AS TIMESTAMP), event_id) = 1
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  /** w04 — per-user running value totals (users 0–4): unbounded-
    * preceding running sum over event time, exact integer cents.
    */
  def runningTotals(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("user_id") < 5)
      .withColumn("running_cents", sum(Exact.cents(col("value")).cast("long"))
        .over(Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("running_cents") / 100.0).as("running_total"))
      .orderBy("user_id", "ts", "event_id")

  val runningTotalsSql: String =
    s"""SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
       |  SUM(${Exact.centsSql("value")}) OVER (
       |    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
       |    ROWS UNBOUNDED PRECEDING) / 100.0 AS running_total
       |FROM events WHERE user_id < 5
       |ORDER BY user_id, ts, event_id""".stripMargin

  // ---------------------------------------------------------------
  /** w05 — real Structured Streaming: file-source `readStream` over
    * the events parquet, 1-hour event-time watermark, tumbling window
    * count, `writeStream` into a memory sink, run to completion.
    * Same semantics as w01 (the oracle is w01's, counts only).
    */
  def streamingHourly(spark: SparkSession, dir: String): DataFrame = {
    // set BEFORE drainSession(): every retrieval re-syncs the
    // parent's runtime conf into the child, so the stream reader
    // sees the toggle too
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ds = drainSession(spark)
    val path = s"$dir/events.parquet"
    // The file stream source requires a directory of plain files —
    // stage symlinks (file or per-part; tables are read-only).
    val streamDir = TempArtifacts.scratchDir("graft_stream")
    TempArtifacts.stageTable(streamDir, path)
    val schema = spark.read.parquet(path).schema
    val raw = ds.readStream.schema(schema).parquet(streamDir.toString)
    // Same physical-encoding tolerance as Tables.events: nanos-as-long
    // and TIMESTAMP_NTZ both normalize to TimestampType — a watermark
    // on an NTZ column is rejected by Structured Streaming.
    val events = graft.Tables.normalizeTs(raw)
    val agg = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("events"))
      .select(col("window.start").as("window_start"), col("events"))
    drainToMemory(spark, agg, "complete", "w05", streamDir)
      .orderBy("window_start")
  }

  val streamingHourlySql: String =
    """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
      |  COUNT(*) AS events
      |FROM events GROUP BY 1 ORDER BY window_start""".stripMargin

  // ---------------------------------------------------------------
  /** w06 — batch session windows: per-user 30-minute-gap sessions via
    * the built-in `session_window` (the stateful-streaming twin is
    * [[Sessionize]]). Oracle: classic gaps-and-islands SQL. Boundary
    * semantics: an event exactly `gap` after the last starts a NEW
    * session (Spark's session end is exclusive) — the oracle's
    * `>= INTERVAL` mirrors that.
    */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("user_id") < 10)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("events"),
        Exact.sumMoney(col("value")).as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("events"), col("total_value"))
      .orderBy("user_id", "session_start")

  val sessionWindowsSql: String =
    s"""WITH e AS (
       |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
       |  FROM events WHERE user_id < 10
       |), m AS (
       |  SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
       |    OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
       |    THEN 1 ELSE 0 END AS new_s
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       |), s AS (
       |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
       |    ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM m)
       |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS events,
       |  ${Exact.sumMoneySql("value")} AS total_value
       |FROM s GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin

  // ---------------------------------------------------------------
  /** w07 — STREAMING exact dedup: `readStream` over the documents
    * parquet, content fingerprint, `dropDuplicates` (stateful,
    * keep-first-arrival), append-mode memory sink. The streaming twin
    * of d01 — what a continuously-ingesting training-data pipeline
    * runs instead of a batch dedup. Output is the distinct fingerprint
    * SET (key-only), which is arrival-order independent — that is what
    * makes a hash oracle possible; at scale the same plan runs with a
    * watermark bounding the dedup state.
    */
  def streamingDedup(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/documents.parquet"
    val streamDir = TempArtifacts.scratchDir("graft_stream_d")
    TempArtifacts.stageTable(streamDir, path)
    val schema = spark.read.parquet(path).schema
    val dedup = drainSession(spark)
      .readStream.schema(schema).parquet(streamDir.toString)
      .select(md5(col("text")).as("fingerprint"))
      .dropDuplicates("fingerprint")
    drainToMemory(spark, dedup, "append", "w07", streamDir)
      .orderBy("fingerprint")
  }

  val streamingDedupSql: String =
    """SELECT DISTINCT md5(text) AS fingerprint FROM documents
      |ORDER BY fingerprint""".stripMargin

  /** The production spelling of w07: file source → stateful
    * `dropDuplicates` → append-mode PARQUET sink with a checkpoint.
    * The memory-sink variant above proves semantics; this one proves
    * the operational contract a continuously-ingesting pipeline
    * relies on — kill the query mid-stream, restart from the same
    * checkpoint, and the sink holds each fingerprint exactly once
    * (dedup state and source offsets both restore from the
    * checkpoint; the parquet sink commits batches transactionally).
    * StreamingSpec pins exactly that with a mid-stream kill/restart.
    *
    * Callers own the query lifecycle: pass `availableNow = true` for
    * a drain-everything-then-stop run (the restart leg), false for a
    * continuous micro-batch run (the kill leg).
    */
  def checkpointedDedup(spark: SparkSession, srcDir: String,
      schema: org.apache.spark.sql.types.StructType,
      checkpointDir: String, outDir: String,
      availableNow: Boolean = false,
      maxFilesPerTrigger: Int = 1)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val deduped = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .select(md5(col("text")).as("fingerprint"))
      .dropDuplicates("fingerprint")
    val writer = deduped.writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    (if (availableNow)
      writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else writer).start()
  }

  /** The production spelling of w05: file source → watermark →
    * tumbling-window count → append-mode PARQUET sink with a
    * checkpoint. Append mode emits each window exactly once, when the
    * watermark passes its end — which is what makes kill/restart
    * verifiable: windows emitted before the kill must not re-emit
    * after recovery (offsets, watermark AND window state all restore
    * from the checkpoint). StreamingSpec drives this with
    * time-range-ordered source files and a mid-stream kill.
    */
  def checkpointedHourlyCounts(spark: SparkSession, srcDir: String,
      schema: org.apache.spark.sql.types.StructType,
      checkpointDir: String, outDir: String,
      availableNow: Boolean = false,
      maxFilesPerTrigger: Int = 1)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val events = graft.Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(srcDir))
    val agg = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("events"))
      .select(col("window.start").as("window_start"), col("events"))
    val writer = agg.writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    (if (availableNow)
      writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else writer).start()
  }

  // ---------------------------------------------------------------
  /** w08 — STREAMING benchmark-contamination screen: d07's semantics
    * at ingest time. New corpus documents arrive as a stream; the
    * benchmark's distinct shingle set is a STATIC bounded frame
    * (benchmarks are MBs), so the screen is a stream-static broadcast
    * equi join — the canonical "enrich a stream against a reference
    * table" shape — followed by a streaming aggregation. Counts are
    * arrival-order independent, hence hash-gateable; at scale the
    * same plan runs continuously on the ingest feed with the memory
    * sink swapped for a real one.
    */
  def streamingContamination(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/documents.parquet"
    val streamDir = TempArtifacts.scratchDir("graft_stream_c")
    TempArtifacts.stageTable(streamDir, path)
    val schema = spark.read.parquet(path).schema
    // static side built from the batch reader — tiny, broadcast
    val bench = Dedup.benchShingles(spark, dir)
    val corpus = balancedStream(
      drainSession(spark)
        .readStream.schema(schema).parquet(streamDir.toString)
        .filter(col("doc_id") >= Dedup.contaminationBenchDocs))
      .withColumn("toks",
        expr("filter(split(lower(text), ' '), t -> t != '')"))
      .select(col("doc_id"),
        explode_outer(expr(Dedup.shingleFpsExpr)).as("sh"))
      .filter(col("sh").isNotNull)
    val overlap = corpus.join(broadcast(bench), "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("overlap"))
    drainToMemory(spark, overlap, "complete", "w08", streamDir)
      .orderBy("doc_id")
  }

  /** Oracle: the overlap half of d07's screen. */
  val streamingContaminationSql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, ${Dedup.shingleFpsSql} AS fps FROM documents
       |), ex AS (
       |  SELECT doc_id, unnest(fps) AS sh FROM sh
       |), bench AS (
       |  SELECT DISTINCT sh FROM ex
       |  WHERE doc_id < ${Dedup.contaminationBenchDocs}
       |)
       |SELECT e.doc_id, COUNT(*) AS overlap
       |FROM ex e JOIN bench b ON e.sh = b.sh
       |WHERE e.doc_id >= ${Dedup.contaminationBenchDocs}
       |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** w11 — STREAMING QUALITY GATE: the t17 Gopher rules evaluated at
    * ingest time. Every metric is a map-side projection
    * ([[Text.gopherMetrics]] — shared verbatim with the batch t17),
    * so the gate is a fully STATELESS streaming transform: append
    * mode, no watermark, no state store, each micro-batch scored
    * independently. That is the production posture — quality
    * verdicts attach to documents as they arrive, before any
    * stateful dedup stage sees them. Output = per-doc verdict
    * columns, hash-gated against the batch oracle (arrival order
    * cannot matter for a stateless map).
    */
  def streamingQualityGate(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/documents.parquet"
    val streamDir = TempArtifacts.scratchDir("graft_stream_q")
    TempArtifacts.stageTable(streamDir, path)
    val schema = spark.read.parquet(path).schema
    val gated = Text.gopherMetrics(
      drainSession(spark)
        .readStream.schema(schema).parquet(streamDir.toString))
      .select("doc_id", "n_words", "gopher_pass")
    drainToMemory(spark, gated, "append", "w11", streamDir)
      .orderBy("doc_id")
  }

  /** Oracle: the verdict projection of t17's batch SQL. */
  val streamingQualityGateSql: String =
    s"""SELECT doc_id, n_words, gopher_pass
       |FROM (${Text.gopherRulesSql})
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** w13 — STREAMING HEAVY HITTERS: t20's one-pass frequent-items
    * sketch computed AT INGEST — the production vocabulary monitor
    * (token-distribution drift is the first signal of a bad crawl
    * batch). `approx_top_k` is a mergeable DataSketches aggregate,
    * so it runs as a streaming aggregation with O(maxTracked) state
    * per partition — no per-word state, no watermark needed;
    * complete-mode drain emits the current sketch.
    *
    * Gate: identical band reduction to t20 (the sketch contract vs
    * the exact batch twin — count-exactness below maxTracked, recall
    * above the error cut, every estimate within N·ε), constant-TRUE
    * oracle. Arrival order cannot change a merged sketch below
    * maxTracked (every count is exact there), so the bands are
    * deterministic at gate scale.
    */
  def streamingHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = s"$dir/documents.parquet"
    val streamDir = TempArtifacts.scratchDir("graft_stream_hh")
    TempArtifacts.stageTable(streamDir, path)
    val schema = spark.read.parquet(path).schema
    val sketch = drainSession(spark)
      .readStream.schema(schema).parquet(streamDir.toString)
      .select(explode(Text.tokens(lower(col("text")))).as("w"))
      .agg(expr(s"approx_top_k(w, ${Text.heavyHitterK}, " +
        s"${Text.heavyHitterMaxTracked})").as("tk"))
    val drained = drainToMemory(spark, sketch, "complete", "w13", streamDir)
    val sk = drained
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("w"), col("e.count").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact twin + band reduction shared with t20 (memoized batch
    // scan — both gates compare against the SAME exact state)
    Text.heavyHitterBands(spark, dir, sk)
  }

  val streamingHeavyHittersSql: String =
    """SELECT TRUE AS band_k_returned, TRUE AS band_top1,
      |  TRUE AS band_recall, TRUE AS band_counts_within""".stripMargin

  // ---------------------------------------------------------------
  /** w14 — STREAMING SEMANTIC DEDUP GATE: d14's embedding near-dup
    * screen AT INGEST — incoming vectors are checked against the
    * static base corpus before admission, the production shape where
    * a re-crawled or lightly-edited document must not re-enter the
    * training set just because its bytes changed.
    *
    * Model-at-ingest semantics (the streaming-native design):
    *   - k-means cells are trained ONCE on the BASE corpus (the
    *     [[Clustering.centroidsOn]] Lloyd loop, k·d driver metadata)
    *     and FROZEN — the stream never retrains; it applies the model
    *     per record via [[Clustering.assignWith]], a pure codegen
    *     `pq_encode` against the literal codebook (stateless).
    *   - the candidate screen is a stateless stream-static LEFT OUTER
    *     join on the cell id (within-cell cosine only — the same
    *     no-all-pairs bound d14 proves), then ONE streaming
    *     max-verdict aggregation per incoming vector (complete mode
    *     into the memory sink; update mode at scale).
    *   - at 100 TB the base side is corpus-scale: the join shuffles
    *     by cell id (never broadcasts the corpus), state is one row
    *     per in-flight incoming vector, and cell occupancy is bounded
    *     by the same k ≈ n/[[Dedup.semCellTarget]] scaling d14 uses.
    *
    * The staged feed plants near-dups DETERMINISTICALLY: incoming
    * vec v with v % 10 ∈ {7, 9} arrives as a jittered copy of base
    * vector v % split (the d14 jitter arithmetic, retargeted so
    * matches straddle the base/stream split); other vectors arrive
    * as themselves — random unit vectors, cosine-far from everything.
    * Verdicts are per-record and arrival-order-free, so the DuckDB
    * oracle replays the exact semantics batch-side.
    */
  def streamingSemanticGate(spark: SparkSession, dir: String): DataFrame = {
    val ds = drainSession(spark)
    // the stream chain is analyzed on the drain session, so its
    // custom codegen kernels register there; the parent keeps its own
    // registrations for the batch-side frames
    DotProduct.register(spark)
    DotProduct.register(ds)
    PqEncode.register(ds)
    val emb = Tables.embeddings(spark, dir)
    val split = PlanMemo.cachedValue(spark, s"w14.split:$dir")(emb.count() / 2)
    val toDouble = "transform(embedding, x -> CAST(x AS DOUBLE))"
    def quantize(c: String) =
      s"transform($c, x -> CAST(FLOOR(x * ${Clustering.quantScale}) AS BIGINT))"
    val base = emb.filter(col("vec_id") < split)
      .select(col("vec_id"), expr(toDouble).as("emb"))
    val baseQe = base.select(col("vec_id"), expr(quantize("emb")).as("q"))
    val k = math.max(Clustering.kClusters,
      (split / Dedup.semCellTarget).toInt)
    val cents = Clustering.centroidsOn(spark, s"w14:$dir", baseQe, k)
    val baseSide = Clustering.assignWith(
        base.withColumn("q", expr(quantize("emb"))), cents)
      .withColumn("nrm", sqrt(expr("dot_product(emb, emb)")))
      .select(col("cluster").as("bcluster"), col("vec_id").as("b_id"),
        col("emb").as("b_emb"), col("nrm").as("b_nrm"))
    // stage the incoming feed AS DATA (not a live self-join): the
    // gate's input is "vectors arriving", so the jittered revisions
    // are materialized into the staging dir batch-side — scaffolding
    // for the planted ground truth, not part of the operator
    val staged = emb.filter(col("vec_id") >= split)
      .withColumn("t_id", col("vec_id") % split)
      .join(emb.select(col("vec_id").as("t_id"),
        col("embedding").as("t_emb")), "t_id")
      .select(col("vec_id"),
        when(col("vec_id") % 10 === 7 || col("vec_id") % 10 === 9,
          expr(s"""transform(t_emb, (x, i) ->
                  |  CAST(x AS DOUBLE) +
                  |  ((vec_id * ${Dedup.semDim} + i + 1) % 7 - 3) * 0.001D)"""
            .stripMargin))
          .otherwise(expr(toDouble)).as("emb"))
    // The staged feed is deterministic per (session, dir) — write it
    // ONCE into a session-lifetime scratch dir and reuse the file
    // across invocations (round-12 verdict "next" 7: every bench rep
    // re-paid the coalesce(1) write + join, ~0.5 s of pure fixture
    // scaffolding; w14 was the only streaming entry staging data
    // instead of symlinking). The per-drain streamDir below stays
    // fresh so sink names never collide and drain cleanup semantics
    // are unchanged; the feed dir is reclaimed at JVM exit. The dir
    // NAME is derived from the same (session, dir) key as the memo
    // (round-13 advice): an LRU eviction + rebuild overwrites the one
    // staging dir in place instead of leaking a copy per rebuild.
    val feed = PlanMemo.cachedValue(spark, s"w14.feed:$dir") {
      // pid in the name: identityHashCode is only unique within one
      // JVM, and the scratch root (/dev/shm) is host-shared — two
      // concurrent graft JVMs must never resolve the same feed dir
      // (one's exit hook would delete it out from under the other)
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest((ProcessHandle.current().pid() + ":" +
          System.identityHashCode(spark) + ":" + dir)
          .getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
      val d = TempArtifacts.stableScratchDir(s"graft_stream_sg_feed_$key")
      val f = d.resolve("incoming.parquet").toString
      staged.coalesce(1).write.mode("overwrite").parquet(f)
      f
    }
    val streamDir = TempArtifacts.scratchDir("graft_stream_sg")
    val schema = spark.read.parquet(feed).schema
    // balancedStream: the per-record quantize + pq_encode assignment
    // and the within-cell dot products are the CPU stage
    val incoming = balancedStream(
      ds.readStream.schema(schema).parquet(feed))
    val assigned = Clustering.assignWith(
        incoming.withColumn("q", expr(quantize("emb"))), cents)
      .withColumn("nrm", sqrt(expr("dot_product(emb, emb)")))
    val scored = assigned
      .join(baseSide, col("cluster") === col("bcluster"), "left_outer")
      .withColumn("cos", Exact.round4(expr("dot_product(emb, b_emb)") /
        (col("nrm") * col("b_nrm"))))
    val verdicts = scored.groupBy("vec_id").agg(
      max(when(col("cos") >= Dedup.semTheta, 1).otherwise(0)).as("is_dup"),
      min(when(col("cos") >= Dedup.semTheta, col("b_id"))).as("match_id"),
      max(col("cos")).as("best_cos"))
    drainToMemory(spark, verdicts, "complete", "w14", streamDir)
      .select("vec_id", "is_dup", "match_id", "best_cos")
      .orderBy("vec_id")
  }

  /** DuckDB replay: train the cells on the base half (the shared
    * [[Clustering.oracleCtes]] Lloyd mirror), assign the jittered
    * incoming half against the FINAL centroids (`c<T>`), then score
    * within-cell cosine exactly like the stream does. The oracle's k
    * is the SAME max(kClusters, split/semCellTarget) the engine
    * computes, as a scalar-subquery LIMIT over the base half — a
    * hardcoded kClusters silently diverged once the base outgrew
    * kClusters × [[Dedup.semCellTarget]] vectors (round-12 advice;
    * GenData sf1's 10 000-vector base half already crossed it).
    */
  val streamingSemanticGateSql: String = {
    val half = "(SELECT COUNT(*) // 2 FROM embeddings)"
    val T = Clustering.lloydIters
    val dot = Similarity.duckDot("x.embedding", "y.embedding")
    s"""WITH b AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
       |  FROM embeddings WHERE vec_id < $half
       |), ${Clustering.oracleCtes("b",
             s"(SELECT GREATEST(${Clustering.kClusters}, " +
               s"(COUNT(*) // 2) // ${Dedup.semCellTarget}) FROM embeddings)")},
       |s AS (
       |  SELECT v.vec_id,
       |    CASE WHEN v.vec_id % 10 IN (7, 9) THEN
       |      list_transform(range(1, ${Dedup.semDim + 1}), i ->
       |        CAST(t.embedding[i] AS DOUBLE) +
       |        ((v.vec_id * ${Dedup.semDim} + i) % 7 - 3) * 0.001)
       |    ELSE list_transform(v.embedding, x -> CAST(x AS DOUBLE))
       |    END AS embedding
       |  FROM embeddings v JOIN embeddings t ON t.vec_id = v.vec_id % $half
       |  WHERE v.vec_id >= $half
       |), sqv AS (
       |  SELECT vec_id,
       |    list_transform(range(1, len(embedding) + 1), i ->
       |      CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * ${Clustering.quantScale}) AS BIGINT)) AS qv
       |  FROM s
       |), sa AS (
       |  SELECT e.vec_id, c.cid, ${Clustering.listDist2Sql("e.qv", "c.cv")} AS d
       |  FROM sqv e CROSS JOIN c$T c
       |), sfin AS (
       |  SELECT vec_id, cid AS cluster FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |    FROM sa)
       |  WHERE rn = 1
       |), bn AS (
       |  SELECT b.vec_id, b.embedding, f.cluster,
       |    sqrt(${Similarity.duckDot("b.embedding", "b.embedding")}) AS nrm
       |  FROM b JOIN fin f USING (vec_id)
       |), sn AS (
       |  SELECT s.vec_id, s.embedding, f.cluster,
       |    sqrt(${Similarity.duckDot("s.embedding", "s.embedding")}) AS nrm
       |  FROM s JOIN sfin f USING (vec_id)
       |), sc AS (
       |  SELECT x.vec_id, y.vec_id AS b_id,
       |    ${Exact.round4Sql(s"($dot) / (x.nrm * y.nrm)")} AS cos
       |  FROM sn x LEFT JOIN bn y ON x.cluster = y.cluster
       |)
       |SELECT vec_id,
       |  MAX(CASE WHEN cos >= ${Dedup.semTheta} THEN 1 ELSE 0 END) AS is_dup,
       |  MIN(CASE WHEN cos >= ${Dedup.semTheta} THEN b_id END) AS match_id,
       |  MAX(cos) AS best_cos
       |FROM sc GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------
  /** w12 — STREAMING FUNNEL: r08's strictly-sequential windowed
    * funnel computed at ingest by the [[FunnelMachine]]
    * `flatMapGroupsWithState` state machine (two longs of state per
    * funnel-active user). The memory sink accumulates Update-mode
    * emissions; the step counter is monotone, so max(step) per user
    * is the final verdict, aggregated into the identical 3-row
    * summary r08 ships — and hash-gated against r08's batch oracle.
    */
  def streamingFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = s"$dir/events.parquet"
    val streamDir = TempArtifacts.scratchDir("graft_stream_f")
    TempArtifacts.stageTable(streamDir, path)
    val schema = spark.read.parquet(path).schema
    val raw = drainSession(spark)
      .readStream.schema(schema).parquet(streamDir.toString)
    // same physical-encoding tolerance as Tables.events (nanos-as-long,
    // TIMESTAMP_NTZ, or plain timestamp all normalize to TimestampType)
    val normalized = graft.Tables.normalizeTs(raw)
    val ev = normalized
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[FunnelMachine.FEvent]
    val emitted = drainToMemory(spark,
      FunnelMachine
        .furthest(ev, Temporal.funnelSteps, Temporal.funnelWindowHours)
        .toDF(),
      "update", "w12", streamDir)
    val fin = emitted
      .groupBy("user_id").agg(max("step").as("furthest"))
    val counts = Temporal.funnelSteps.zipWithIndex.map { case (s, i) =>
      fin.filter(col("furthest") >= i + 1)
        .agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step"), lit(s).as("event_type"), col("users"))
    }.reduce(_ unionAll _)
    val first = counts.filter(col("step") === 1)
      .select(col("users").cast("double").as("u1"))
    counts.crossJoin(broadcast(first))
      .withColumn("conversion",
        Exact.round4(col("users") / greatest(col("u1"), lit(1.0))))
      .select("step", "event_type", "users", "conversion")
      .orderBy("step")
  }

  // ---------------------------------------------------------------
  /** w15 — STREAMING TOKEN ACCOUNTING: per-source word/token
    * throughput at ingest under the FROZEN batch-trained tokenizer
    * (t21's merge table) — the token-budget monitor every pipeline
    * runs while crawl batches arrive. The frozen model is applied
    * exactly as production does it: as a FUNCTION, map-side —
    * [[Text.bpeNtokExpr]] spells the whole merge chain as one codegen
    * string expression per word occurrence (char-split via
    * regexp_replace + 8 replaces; no dictionary join, no interpreted
    * HOF), so the only stateful op is the `groupBy(source)` whose
    * state is O(sources) — bounded regardless of corpus size, unlike
    * a per-doc aggregation. Contrast with batch t22, where joining
    * the vocabulary-sized dictionary beats re-deriving per
    * occurrence; at ingest there is no "distinct words of the batch"
    * worth indexing, and stateless-map + tiny-state-agg is the
    * posture that survives an unbounded stream.
    *
    * Every streamed word was seen in training (same corpus), so the
    * oracle's dictionary join drops nothing and the map-side chain
    * equals the dictionary's ntok (TextBpeSpec pins the equality over
    * the whole vocabulary). Arrival semantics: a source whose
    * documents carry zero words emits NO row (nothing arrived to
    * account), and the oracle's join drops it identically — unlike
    * t22's per-doc coverage left-join, which reports (0, 0) for
    * wordless documents; StreamingSpec's batch twin applies the same
    * drop. The tokenizer is the FROZEN artifact ([[Text.bpeMerges]])
    * — ingest consumes the shipped model, it never trains.
    */
  def streamingTokenAccounting(spark: SparkSession, dir: String): DataFrame = {
    val merges = Text.bpeMerges(spark, dir)
    val path = s"$dir/documents.parquet"
    val streamDir = TempArtifacts.scratchDir("graft_stream_tok")
    TempArtifacts.stageTable(streamDir, path)
    val schema = spark.read.parquet(path).schema
    // balancedStream: the per-occurrence regexp + replace chain is
    // the CPU stage
    val occ = balancedStream(
        drainSession(spark)
          .readStream.schema(schema).parquet(streamDir.toString))
      .select(col("source"),
        explode_outer(Text.bpeWords(col("text"))).as("w"))
      .filter(col("w").isNotNull)
      .select(col("source"), expr(Text.bpeNtokExpr(merges, "w")).as("ntok"))
    val agg = occ.groupBy("source")
      .agg(count(lit(1)).as("n_words"), sum("ntok").as("n_tokens"))
    drainToMemory(spark, agg, "complete", "w15", streamDir)
      .orderBy("source")
  }

  /** Oracle: the t22 dictionary chain aggregated per source. */
  val streamingTokenAccountingSql: String =
    s"""WITH ${Text.bpeDictCteSql}, occ AS (
       |  SELECT source, word FROM (
       |    SELECT source, unnest(${Text.bpeWordsSql("text")}) AS word
       |    FROM documents) t
       |)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(ntok) AS BIGINT) AS n_tokens
       |FROM occ JOIN dict USING (word)
       |GROUP BY source
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  /** w16 — STREAMING ADMISSION GATE: e01's quality stage at ingest
    * time — every arriving document is scored under the FROZEN
    * learned classifier ([[Text.qcFrozenWeights]] — trained batch-
    * side, served as a stream-static broadcast of the dim-bounded
    * weight table, exactly how a production model ships to the ingest
    * tier) and the admission verdict attaches per distinct CONTENT.
    *
    * Keying the one stateful aggregation by content fingerprint (not
    * doc_id) buys two things at once: the output is arrival-order
    * INDEPENDENT (identical texts score identically, so the per-fp
    * row is the same whatever order copies land in — what makes a
    * hash oracle possible, the w07 discipline), and the gate doubles
    * as the exact-dedup admission ledger — n_copies is the dup count
    * the pipeline monitors. Per-copy values recover exactly: every
    * copy contributes identical tokens, so s8 = Σw8e / n_copies and
    * n_tokens = rows / n_copies are exact integer divisions
    * (truncation direction irrelevant on exact multiples).
    *
    * Scale shape: token scoring is map-side (explode_outer + the
    * broadcast weight join — no corpus-sized static frame anywhere);
    * the single stateful agg keys on fingerprint, so state is
    * O(distinct contents) — the w07 class; at 100 TB the same plan
    * runs with a watermark (or the d17 bloom screen) bounding it.
    * Zero-token documents never reach the agg (nothing to score at
    * ingest); the oracle's join on `scored` drops them identically.
    */
  def streamingAdmission(spark: SparkSession, dir: String): DataFrame =
    admissionLedger(spark, dir, 0L, "w16").orderBy("fingerprint")

  /** The drained admission LEDGER (per content fingerprint: rep doc,
    * copy count, token count, frozen-classifier score, verdict) over
    * the stream of documents with doc_id ≥ `minDocId` — w16 presents
    * it for the whole corpus (minDocId 0); e06 drains the INCREMENT
    * (minDocId = the d13 split) and feeds the admitted set straight
    * into the e03 append. The doc_id filter is STATELESS and sits
    * before the stateful agg, so the state store only ever carries
    * in-scope fingerprints.
    */
  private[graft] def admissionLedger(spark: SparkSession, dir: String,
      minDocId: Long, name: String): DataFrame = {
    val path = s"$dir/documents.parquet"
    val streamDir = TempArtifacts.scratchDir("graft_stream_adm")
    TempArtifacts.stageTable(streamDir, path)
    val schema = spark.read.parquet(path).schema
    val agg = admissionAggOn(spark, dir,
      drainSession(spark)
        .readStream.schema(schema).parquet(streamDir.toString),
      minDocId)
    admissionVerdict(drainToMemory(spark, agg, "complete", name, streamDir))
  }

  /** The admission chain's STATEFUL half on an arbitrary streaming
    * source of (doc_id, text, …) rows: stateless doc_id screen →
    * map-side token scoring under the frozen classifier → ONE agg
    * keyed by content fingerprint. Factored out of [[admissionLedger]]
    * so StreamingSpec can drive the same chain through a DURABLE
    * checkpoint with a mid-stream kill (the e06 restart property).
    */
  private[graft] def admissionAggOn(spark: SparkSession, dir: String,
      stream: DataFrame, minDocId: Long): DataFrame = {
    val (weights, defW8) = Text.qcFrozenWeights(spark, dir)
    val toks = balancedStream(stream)
      .filter(col("doc_id") >= minDocId)
      .select(col("doc_id"), md5(col("text")).as("fingerprint"),
        posexplode_outer(Text.tokens(lower(col("text"))))
          .as(Seq("pos", "w")))
      .filter(col("w").isNotNull)
      .select(col("fingerprint"), col("doc_id"), col("pos"),
        (Text.fp64(col("w")) % Text.qcDim).as("f"))
      .join(broadcast(weights), Seq("f"), "left")
      .select(col("fingerprint"), col("doc_id"), col("pos"),
        coalesce(col("w8"), lit(defW8)).as("w8e"))
    toks.groupBy("fingerprint").agg(
      min("doc_id").as("rep_doc"),
      sum(when(col("pos") === 0, 1L).otherwise(0L)).as("n_copies"),
      count(lit(1)).as("tok_rows"),
      sum("w8e").as("s8_total"))
  }

  /** Per-copy recovery + verdict over a drained admission agg (see
    * [[streamingAdmission]]'s scaladoc for why the integer divisions
    * are exact).
    */
  private[graft] def admissionVerdict(drained: DataFrame): DataFrame =
    drained
      .select(col("fingerprint"), col("rep_doc"), col("n_copies"),
        expr("tok_rows div n_copies").as("n_tokens"),
        expr("s8_total div n_copies").as("s8"),
        (expr("s8_total div n_copies") > 0).as("admitted"))

  /** Oracle: t23's per-doc scores grouped by content fingerprint —
    * copies of one content collapse to one admission row.
    */
  val streamingAdmissionSql: String =
    s"""WITH ${Text.qcCtesSql}, dt AS (
       |  SELECT doc_id, md5(text) AS fingerprint,
       |    len(${Text.tokensSql("lower(text)")}) AS n_toks
       |  FROM documents
       |), j AS (
       |  SELECT dt.fingerprint, dt.doc_id, dt.n_toks, s.s8
       |  FROM dt JOIN scored s USING (doc_id)
       |)
       |SELECT fingerprint, CAST(MIN(doc_id) AS BIGINT) AS rep_doc,
       |  CAST(COUNT(*) AS BIGINT) AS n_copies,
       |  CAST(MIN(n_toks) AS BIGINT) AS n_tokens,
       |  CAST(MIN(s8) AS BIGINT) AS s8,
       |  MIN(s8) > 0 AS admitted
       |FROM j GROUP BY fingerprint
       |ORDER BY fingerprint""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w16_streaming_admission" -> streamingAdmission _,
    "w15_streaming_tokens" -> streamingTokenAccounting _,
    "w12_streaming_funnel" -> streamingFunnel _,
    "w13_streaming_heavy_hitters" -> streamingHeavyHitters _,
    "w14_streaming_semantic_gate" -> streamingSemanticGate _,
    "w11_streaming_quality" -> streamingQualityGate _,
    "w08_streaming_contamination" -> streamingContamination _,
    "w01_tumbling_hourly" -> tumblingHourly _,
    "w02_sliding_windows" -> slidingWindows _,
    "w03_keep_first_per_user" -> keepFirstPerUser _,
    "w04_running_totals" -> runningTotals _,
    "w05_streaming_hourly" -> streamingHourly _,
    "w06_session_windows" -> sessionWindows _,
    "w07_streaming_dedup" -> streamingDedup _
  )

  def oracles: Map[String, String] = Map(
    "w16_streaming_admission" -> streamingAdmissionSql,
    "w15_streaming_tokens" -> streamingTokenAccountingSql,
    // the ingest-time state machine computes exactly r08's semantics
    "w12_streaming_funnel" -> Temporal.funnelSql,
    "w13_streaming_heavy_hitters" -> streamingHeavyHittersSql,
    "w14_streaming_semantic_gate" -> streamingSemanticGateSql,
    "w11_streaming_quality" -> streamingQualityGateSql,
    "w08_streaming_contamination" -> streamingContaminationSql,
    "w07_streaming_dedup" -> streamingDedupSql,
    "w06_session_windows" -> sessionWindowsSql,
    "w01_tumbling_hourly" -> tumblingHourlySql,
    "w02_sliding_windows" -> slidingWindowsSql,
    "w03_keep_first_per_user" -> keepFirstPerUserSql,
    "w04_running_totals" -> runningTotalsSql,
    "w05_streaming_hourly" -> streamingHourlySql
  )
}
