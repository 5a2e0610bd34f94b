package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The END-TO-END training-data pipeline — the stages every family in
  * this library implements individually, composed in the order a
  * production corpus build runs them (the Gopher/RefinedWeb shape:
  * model-based quality filter → near-dup dedup among survivors →
  * tokenize survivors → pack into fixed-capacity training chunks):
  *
  *   1. QUALITY GATE — the learned classifier (t23) scores every
  *      document; only `pred = 1` (score > 0) survives.
  *   2. NEAR-DUP DEDUP — the verified Jaccard pair graph (d03/d19
  *      kernel) restricted to the SURVIVOR subgraph, connected
  *      components (d08's fixpoint), keep the min-doc_id member of
  *      each cluster. Running CC on the filtered subgraph (not
  *      reusing d08's full-corpus labels) matters: a cluster whose
  *      min member failed quality must still keep one SURVIVING
  *      member, which full-corpus keep-min would drop.
  *   3. TOKENIZE — the frozen t21 BPE artifact applied to survivors
  *      only ([[Text.bpeTokenIdSeqsOn]]): at 100 TB tokenizing
  *      drop-outs is the largest avoidable cost in the composed plan.
  *   4. PACK — p01/p07's concat-and-chunk placement over the
  *      survivors' real token counts (one shared spelling,
  *      [[Packing.placed]]).
  *
  * Output: one row per SHIPPED document — (lang, doc_id, n_tok,
  * tok_offset, first_chunk, last_chunk, spans) — the manifest a shard
  * writer consumes. The DuckDB oracle replays all four stages in one
  * statement (the t23 CTE chain + the pair CTE + a recursive-CTE CC
  * over the filtered edges + the t22 dictionary encode + the window
  * placement), so the gate hashes the composition end-to-end, not
  * just the stages.
  *
  * Scale shape: every stage keeps its own audited posture (t23's
  * dim-bounded broadcast weights, the bucketed pair kernel, CC's
  * diameter-bounded fixpoint on the pair graph — a sliver of the
  * corpus — and the per-shard prefix-sum window). The composition
  * adds only doc_id-keyed semi/anti joins, all shuffle_hash: the
  * survivor set is a RATIO of the corpus, never broadcast-safe.
  */
object Pipeline {

  /** Survivors of stage 1+2 (quality gate, then keep-one near-dup
    * dedup on the survivor subgraph). Memoized eager: the CC fixpoint
    * runs jobs at build time, and both the e01 entry and PipelineSpec
    * consume it.
    */
  private[graft] def keptDocs(spark: SparkSession, dir: String): DataFrame =
    PlanMemo.cached(spark, s"pipeline.keptDocs:$dir") {
      val kept0 = PlanMemo.publishedParquet(spark, dir,
          "t23_quality_classifier")(Text.qualityClassifier(spark, dir))
        .filter(col("pred") === 1).select("doc_id")
      val pairs = Dedup.jaccardPairs(spark, dir).select("d1", "d2")
        .join(kept0.select(col("doc_id").as("d1")).hint("shuffle_hash"),
          Seq("d1"), "left_semi")
        .join(kept0.select(col("doc_id").as("d2")).hint("shuffle_hash"),
          Seq("d2"), "left_semi")
      val losers = Dedup.connectedComponents(pairs)
        .filter(col("node") =!= col("lbl"))
        .select(col("node").as("doc_id"))
      kept0.join(losers.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
    }

  def trainingPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .join(keptDocs(spark, dir).hint("shuffle_hash"),
        Seq("doc_id"), "left_semi")
    val seqs = Text.bpeTokenIdSeqsOn(spark, dir, docs)
      .select(col("doc_id"), size(col("ids")).as("nt"))
    Packing.placed(docs.select(col("lang"), col("doc_id"))
      .join(seqs.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("lang"), col("doc_id"),
        coalesce(col("nt"), lit(0)).cast("long").as("n_tok")))
  }

  /** All four stages in ONE statement. CTE-name note: the t23 chain
    * reserves qst/qmed/labels/feats/tr/counts/totals/weights/scored,
    * the pair block sh/ex/capped/sizes/inter/pairs, the BPE chain
    * words/w0..wN/p1..pN/dict; kept0/fedges/reach/cc/keptf/docw/enc/
    * base/o are this oracle's own. MATERIALIZED on the twice-read
    * frames (the bpeChainCtes discipline — default inlining
    * re-executes a CTE per reference).
    */
  val trainingPipelineSql: String =
    s"""WITH RECURSIVE ${Text.qcCtesSql},
       |kept0 AS MATERIALIZED (
       |  SELECT l.doc_id FROM labels l LEFT JOIN scored USING (doc_id)
       |  WHERE COALESCE(s8, 0) > 0
       |),
       |${Dedup.jaccardPairsCteSql},
       |fpairs AS MATERIALIZED (
       |  SELECT p.d1, p.d2 FROM pairs p
       |  JOIN kept0 ka ON ka.doc_id = p.d1
       |  JOIN kept0 kb ON kb.doc_id = p.d2
       |),
       |fedges AS (
       |  SELECT d1 AS a, d2 AS b FROM fpairs
       |  UNION ALL SELECT d2, d1 FROM fpairs
       |),
       |reach AS (
       |  SELECT a AS node, a AS lbl FROM fedges
       |  UNION
       |  SELECT e.b, r.lbl FROM reach r JOIN fedges e ON e.a = r.node
       |),
       |cc AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
       |keptf AS MATERIALIZED (
       |  SELECT doc_id FROM kept0
       |  WHERE doc_id NOT IN (SELECT node FROM cc WHERE node <> cluster_id)
       |),
       |${Text.bpeDictCteSql},
       |docw AS (
       |  SELECT doc_id, word, COUNT(*) AS cnt FROM (
       |    SELECT doc_id, unnest(${Text.bpeWordsSql("text")}) AS word
       |    FROM documents JOIN keptf USING (doc_id)) t
       |  GROUP BY doc_id, word
       |), enc AS (
       |  SELECT doc_id, CAST(SUM(cnt * ntok) AS BIGINT) AS n_tok
       |  FROM docw JOIN dict USING (word) GROUP BY doc_id
       |), base AS (
       |  SELECT d.lang, d.doc_id, CAST(COALESCE(e.n_tok, 0) AS BIGINT) AS n_tok
       |  FROM documents d JOIN keptf USING (doc_id)
       |  LEFT JOIN enc e USING (doc_id)
       |), o AS (
       |  SELECT lang, doc_id, n_tok,
       |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS tok_offset
       |  FROM base)
       |SELECT lang, doc_id, n_tok, tok_offset,
       |  CAST(tok_offset // ${Packing.chunkTokens} AS BIGINT) AS first_chunk,
       |  CAST((tok_offset + GREATEST(n_tok, 1) - 1) // ${Packing.chunkTokens}
       |    AS BIGINT) AS last_chunk,
       |  CAST((tok_offset + GREATEST(n_tok, 1) - 1) // ${Packing.chunkTokens}
       |    - tok_offset // ${Packing.chunkTokens} + 1 AS BIGINT) AS spans
       |FROM o ORDER BY lang, doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e01_training_pipeline" -> trainingPipeline _
  )

  def oracles: Map[String, String] = Map(
    "e01_training_pipeline" -> trainingPipelineSql
  )
}
