package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface mandated by the build brief (SURVEY.md
  * §7.4): token counting, corpus word frequency, per-document quality
  * scoring, fingerprinting, and a dictionary-overlap language-ID
  * heuristic.
  *
  * Everything is built from codegen'd higher-order functions
  * (`split`/`filter`/`transform`/`aggregate`/`explode`) — no UDFs — so
  * the plans stay whole-stage-codegen'd and scale linearly: per-document
  * work is map-side, and the only shuffles are the final group-bys on
  * low-cardinality keys (lang, word). At 100 TB the explode in word_freq
  * produces a heavy intermediate; partial aggregation (map-side combine)
  * keeps the shuffle proportional to distinct-word count per partition,
  * not token count.
  *
  * Every query has a DuckDB oracle in lock-step; tokenization is
  * "split on single space, drop empties" — identical semantics in
  * Spark's `split` and DuckDB's `string_split`.
  */
object Text {

  /** Tokens of a document: split on space, empties dropped. */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => t =!= lit(""))

  /** DuckDB fragment for the same tokenization. */
  def tokensSql(e: String): String =
    s"list_filter(string_split($e, ' '), t -> t <> '')"

  // ---------------------------------------------------------------
  /** t01 — per-language token statistics (corpus profile). */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_tokens", size(tokens(col("text"))))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        round(sum(col("n_tokens")).cast("double") / count(lit(1)), 4).as("avg_tokens"),
        min("n_tokens").as("min_tokens"),
        max("n_tokens").as("max_tokens"))
      .orderBy("lang")

  val tokenStatsSql: String =
    s"""WITH toks AS (
       |  SELECT lang, CAST(len(${tokensSql("text")}) AS INT) AS n_tokens
       |  FROM documents)
       |SELECT lang, COUNT(*) AS docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  round(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 4) AS avg_tokens,
       |  MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens
       |FROM toks GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  /** t02 — corpus-wide word frequency, top 20 (explode → count).
    * Partial aggregation makes the shuffle O(distinct words), not
    * O(tokens); TakeOrderedAndProject caps the driver collect at 20.
    */
  def wordFreq(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(tokens(lower(col("text")))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("word"))
      .limit(20)

  val wordFreqSql: String =
    s"""SELECT word, COUNT(*) AS freq FROM (
       |  SELECT unnest(${tokensSql("lower(text)")}) AS word FROM documents)
       |GROUP BY word ORDER BY freq DESC, word LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  /** English-y stopword list used for the quality heuristic. */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  private val stopwordsSqlList = stopwords.map("'" + _ + "'").mkString(", ")

  /** t03 — per-document quality scoring: token count, mean token
    * length (aggregate HOF), stopword ratio, distinct-token ratio and
    * a blended 0–1 quality score. Pure map-side work; the ORDER BY is
    * oracle determinism only.
    */
  def qualityScores(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", tokens(lower(col("text"))))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("char_len", length(col("text")))
      .withColumn("avg_token_len",
        Exact.round4(
          aggregate(col("toks"), lit(0), (acc, t) => acc + length(t))
            .cast("double") / col("n_tokens")))
      .withColumn("stopword_ratio",
        Exact.round4(size(filter(col("toks"), t => t.isin(stopwords: _*)))
          .cast("double") / col("n_tokens")))
      .withColumn("uniq_ratio",
        Exact.round4(size(array_distinct(col("toks")))
          .cast("double") / col("n_tokens")))
      .withColumn("quality_score",
        Exact.round4(lit(0.4) * col("uniq_ratio")
          + lit(0.3) * (lit(1.0) - col("stopword_ratio"))
          + lit(0.3) * least(col("n_tokens").cast("double") / 100.0, lit(1.0))))
      .select("doc_id", "lang", "n_tokens", "char_len", "avg_token_len",
        "stopword_ratio", "uniq_ratio", "quality_score")
      .orderBy("doc_id")

  val qualityScoresSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, CAST(length(text) AS INT) AS char_len,
       |    ${tokensSql("lower(text)")} AS t
       |  FROM documents
       |), m AS (
       |  SELECT doc_id, lang, char_len,
       |    CAST(len(t) AS INT) AS n_tokens,
       |    ${Exact.round4Sql(
                 "CAST(list_aggregate(list_transform(t, x -> len(x)), 'sum') AS DOUBLE) / len(t)")} AS avg_token_len,
       |    ${Exact.round4Sql(
                 s"CAST(len(list_filter(t, x -> x IN ($stopwordsSqlList))) AS DOUBLE) / len(t)")} AS stopword_ratio,
       |    ${Exact.round4Sql(
                 "CAST(len(list_distinct(t)) AS DOUBLE) / len(t)")} AS uniq_ratio
       |  FROM toks)
       |SELECT doc_id, lang, n_tokens, char_len, avg_token_len,
       |  stopword_ratio, uniq_ratio,
       |  ${Exact.round4Sql(
             "0.4 * uniq_ratio + 0.3 * (1.0 - stopword_ratio) + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)")} AS quality_score
       |FROM m ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** t04 — document fingerprints: full md5, a 60-bit integer prefix
    * (the cross-engine portable hash used throughout Dedup), and its
    * LSH-style bucket. The md5-prefix→BIGINT recipe is exactly
    * reproducible in DuckDB via '0x…' casting.
    */
  def fp64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def fp64Sql(e: String): String =
    s"CAST(CONCAT('0x', SUBSTR(md5($e), 1, 15)) AS BIGINT)"

  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        md5(col("text")).as("fingerprint"),
        fp64(col("text")).as("fp64"),
        (fp64(col("text")) % 1024).as("bucket"))
      .orderBy("doc_id")

  val fingerprintsSql: String =
    s"""SELECT doc_id, md5(text) AS fingerprint,
       |  ${fp64Sql("text")} AS fp64,
       |  ${fp64Sql("text")} % 1024 AS bucket
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** Tiny per-language function-word dictionaries for the lang-ID
    * heuristic (dictionary-overlap scoring — the classic cheap
    * n-gram/stopword language detector).
    */
  val langDicts: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "les"))

  /** t05 — language-ID confusion matrix: predicted (argmax of
    * dictionary-overlap scores, ties broken in fixed en>es>de>fr
    * order, all-zero → 'other') × labeled lang.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(lower(col("text")))
    val scores = langDicts.map { case (l, dict) =>
      l -> size(filter(toks, t => t.isin(dict: _*)))
    }
    val Seq(en, es, de, fr) = scores.map(_._2)
    val pred = when(en === 0 && es === 0 && de === 0 && fr === 0, "other")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
    Tables.documents(spark, dir)
      .withColumn("pred_lang", pred)
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("docs"))
      .orderBy("lang", "pred_lang")
  }

  val langIdSql: String = {
    def score(dict: Seq[String]): String =
      s"len(list_filter(t, x -> x IN (${dict.map("'" + _ + "'").mkString(", ")})))"
    val Seq(en, es, de, fr) = langDicts.map(d => score(d._2))
    s"""WITH toks AS (
       |  SELECT lang, ${tokensSql("lower(text)")} AS t FROM documents
       |), s AS (
       |  SELECT lang, $en AS s_en, $es AS s_es, $de AS s_de, $fr AS s_fr
       |  FROM toks
       |), p AS (
       |  SELECT lang,
       |    CASE WHEN s_en = 0 AND s_es = 0 AND s_de = 0 AND s_fr = 0 THEN 'other'
       |         WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       |         WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
       |         WHEN s_de >= s_fr THEN 'de'
       |         ELSE 'fr' END AS pred_lang
       |  FROM s)
       |SELECT lang, pred_lang, COUNT(*) AS docs
       |FROM p GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin
  }

  // ---------------------------------------------------------------
  /** t06 — BPE-ish token counting (build brief: "token counting
    * (whitespace + a BPE-ish regex)"): subword-style units = letter
    * runs, digit runs, and single punctuation marks, versus plain
    * whitespace tokens. The regex is ASCII-classed so Java and RE2
    * (DuckDB) agree exactly.
    */
  // Spark SQL string literals process backslash escapes ('\s'→'s'),
  // DuckDB's don't — so the identical regex needs \\s on the Spark
  // side and \s on the DuckDB side.
  val bpeishPatternSpark = """[a-z]+|[0-9]+|[^a-z0-9\\s]"""
  val bpeishPattern = """[a-z]+|[0-9]+|[^a-z0-9\s]"""

  def bpeishTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_sub",
        size(expr(s"regexp_extract_all(lower(text), '$bpeishPatternSpark', 0)")))
      .withColumn("n_ws", size(tokens(col("text"))))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_sub").cast("long")).as("subword_tokens"),
        sum(col("n_ws").cast("long")).as("ws_tokens"),
        Exact.round4(sum(col("n_sub")).cast("double") / sum(col("n_ws")))
          .as("subword_per_ws"))
      .orderBy("lang")

  val bpeishTokensSql: String =
    s"""WITH t AS (
       |  SELECT lang,
       |    len(regexp_extract_all(lower(text), '$bpeishPattern')) AS n_sub,
       |    len(${tokensSql("text")}) AS n_ws
       |  FROM documents)
       |SELECT lang, COUNT(*) AS docs,
       |  CAST(SUM(n_sub) AS BIGINT) AS subword_tokens,
       |  CAST(SUM(n_ws) AS BIGINT) AS ws_tokens,
       |  ${Exact.round4Sql("CAST(SUM(n_sub) AS DOUBLE) / SUM(n_ws)")} AS subword_per_ws
       |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  /** t07 — the quality-filter pipeline (the training-data use case
    * the scores exist for): keep documents with quality ≥ 0.5 and
    * ≥ 5 tokens, report the per-language survival profile.
    */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val scored = qualityScores(spark, dir)
    scored
      .withColumn("kept",
        (col("quality_score") >= 0.5 && col("n_tokens") >= 5).cast("int"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        sum("kept").as("kept_docs"),
        Exact.round4(sum("kept").cast("double") / count(lit(1)))
          .as("keep_rate"))
      .orderBy("lang")
  }

  val qualityFilterSql: String = {
    // reuse the t03 oracle as a subquery so the two stay in lock-step
    s"""WITH scores AS (${qualityScoresSql.replace("ORDER BY doc_id", "")})
       |SELECT lang, COUNT(*) AS docs,
       |  CAST(SUM(CAST(quality_score >= 0.5 AND n_tokens >= 5 AS INT)) AS BIGINT) AS kept_docs,
       |  ${Exact.round4Sql(
             "CAST(SUM(CAST(quality_score >= 0.5 AND n_tokens >= 5 AS INT)) AS DOUBLE) / COUNT(*)")} AS keep_rate
       |FROM scores GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** t08 — rolling-hash document fingerprints (winnowing family):
    * Karp-Rabin-style polynomial hashes over a 4-token sliding window
    * of token fingerprints, profiled per document (window count,
    * winnowing minimum, distinct windows). All integer arithmetic —
    * values < 2³¹·31³ fit BIGINT exactly in both engines.
    */
  val rollWindow = 4
  private val rollExpr: String = {
    val horner = (0 until rollWindow)
      .map(j => s"element_at(fps, i + $j)")
      .reduce((acc, x) => s"($acc * 31 + $x)")
    s"""transform(sequence(1, size(fps) - ${rollWindow - 1}), i -> $horner)"""
  }
  private val rollSql: String = {
    val horner = (0 until rollWindow)
      .map(j => s"fps[i + $j]")
      .reduce((acc, x) => s"($acc * 31 + $x)")
    s"""list_transform(range(1, len(fps) - ${rollWindow - 2}), i -> $horner)"""
  }

  def rollingFingerprints(spark: SparkSession, dir: String): DataFrame = {
    // optimizer_barrier: the size(fps) filter below is otherwise
    // alias-inlined (full md5-per-token transform) and pushed below
    // the rebalance Exchange — the q11/d02 trap. The fence keeps the
    // filter above the projection that computes fps, and also stops
    // CollapseProject from inlining fps into the rolling-window
    // expression that references it rollWindow times.
    OptimizerBarrier.register(spark)
    Tables.documents(spark, dir)
      .withColumn("toks", tokens(lower(col("text"))))
      .withColumn("fps", expr(
        "optimizer_barrier(transform(toks, t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) % 2147483647))"))
      .filter(size(col("fps")) >= rollWindow)
      .withColumn("whs", expr(rollExpr))
      .select(
        col("doc_id"),
        size(col("whs")).as("n_windows"),
        array_min(col("whs")).as("min_fp"),
        size(array_distinct(col("whs"))).as("distinct_windows"))
      .orderBy("doc_id")
  }

  val rollingFingerprintsSql: String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |    list_transform(${tokensSql("lower(text)")},
       |      t -> ${fp64Sql("t")} % 2147483647) AS fps
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(fps) - ${rollWindow - 1} AS INT) AS n_windows,
       |  list_aggregate($rollSql, 'min') AS min_fp,
       |  CAST(len(list_distinct($rollSql)) AS INT) AS distinct_windows
       |FROM f WHERE len(fps) >= $rollWindow
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** t09 — repetition quality stats (the Gopher/RefinedWeb-family
    * repetition signals): per document, the fraction of word bigrams
    * taken by the single most frequent bigram, and the distinct-bigram
    * fraction. Repetitive generated/boilerplate text scores a high
    * top_bigram_frac and low distinct_frac and is filtered before
    * training. Shape: explode bigrams (explode_outer + null filter —
    * see Dedup.minhashLsh for why not inner explode) then two codegen
    * group-bys with partial aggregation; shuffles carry (doc_id,
    * bigram) counts, never document text.
    */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val grams = docs
      .withColumn("toks", tokens(lower(col("text"))))
      .select(col("doc_id"), explode_outer(expr(
        """CASE WHEN size(toks) < 2 THEN array()
          |ELSE transform(sequence(1, size(toks) - 1),
          |  i -> concat(toks[i-1], ' ', toks[i])) END""".stripMargin)).as("g"))
      .filter(col("g").isNotNull)
    val stats = grams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_bigrams"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_count"))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct"),
        Exact.round4(col("top_count").cast("double") / col("n_bigrams"))
          .as("top_bigram_frac"),
        Exact.round4(col("n_distinct").cast("double") / col("n_bigrams"))
          .as("distinct_frac"))
    // shuffle_hash: per-doc stats are corpus-scale — the static
    // planner's post-aggregate size guess must not broadcast them
    docs.select("doc_id").join(stats.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"),
        coalesce(col("distinct_frac"), lit(1.0)).as("distinct_frac"))
      .orderBy("doc_id")
  }

  val repetitionStatsSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, ${tokensSql("lower(text)")} AS toks FROM documents
       |), g AS (
       |  SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN []
       |    ELSE list_transform(range(1, len(toks)),
       |      i -> toks[i] || ' ' || toks[i+1]) END) AS g
       |  FROM t
       |), c AS (
       |  SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2
       |), s AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
       |    COUNT(*) AS n_distinct, MAX(c) AS top_count
       |  FROM c GROUP BY 1)
       |SELECT d.doc_id,
       |  COALESCE(s.n_bigrams, 0) AS n_bigrams,
       |  COALESCE(s.n_distinct, 0) AS n_distinct,
       |  COALESCE(${Exact.round4Sql("CAST(top_count AS DOUBLE) / n_bigrams")}, 0.0) AS top_bigram_frac,
       |  COALESCE(${Exact.round4Sql("CAST(n_distinct AS DOUBLE) / n_bigrams")}, 1.0) AS distinct_frac
       |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** t10 — per-document top-3 terms by smoothed TF-IDF
    * (tf · ln((N+1)/(df+1))): the classic salient-term extractor a
    * corpus-curation pipeline runs for topic tagging. All three
    * inputs are aggregates with map-side combine (term counts per
    * doc, document frequency per term, corpus size — the last a
    * broadcast single row), the scoring join is per-term equi, and
    * the final per-doc rank window partitions on doc_id with
    * per-doc-vocabulary row counts — every shuffle is bounded by
    * distinct (doc, term) pairs, never token count.
    */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val words = docs.withColumn("toks", tokens(lower(col("text"))))
      .select(col("doc_id"), explode_outer(col("toks")).as("w"))
      .filter(col("w").isNotNull) // explode_outer: see Dedup.minhashLsh
    val tf = words.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    // shuffle_hash: document frequencies span the corpus VOCABULARY —
    // unbounded at scale, never a broadcast candidate
    tf.join(dfreq.hint("shuffle_hash"), "w")
      .crossJoin(broadcast(total))
      .withColumn("score", Exact.round4(
        col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0))))
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("score"), col("w"))))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("w").as("term"), col("score"))
      .orderBy("doc_id", "rank")
  }

  val tfidfTopTermsSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(${tokensSql("lower(text)")}) AS w FROM documents
       |), tf AS (
       |  SELECT doc_id, w, COUNT(*) AS tf FROM t GROUP BY 1, 2
       |), dfq AS (
       |  SELECT w, COUNT(*) AS df FROM tf GROUP BY 1
       |), n AS (
       |  SELECT COUNT(*) AS n_docs FROM documents
       |), s AS (
       |  SELECT doc_id, tf.w,
       |    ${Exact.round4Sql("tf * ln((n_docs + 1.0) / (df + 1.0))")} AS score
       |  FROM tf JOIN dfq USING (w) CROSS JOIN n
       |), r AS (
       |  SELECT doc_id, w, score,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY score DESC, w) AS "rank"
       |  FROM s)
       |SELECT doc_id, "rank", w AS term, score FROM r WHERE "rank" <= 3
       |ORDER BY doc_id, "rank"""".stripMargin

  // ---------------------------------------------------------------
  /** t11 — PII detection + redaction: the scrub stage every shipped
    * corpus runs (emails, phone numbers, IPv4 addresses → typed
    * placeholder tokens, with per-document match counts).
    *
    * The synthetic corpus carries no PII, so the query AUGMENTS each
    * document with a deterministic doc_id-derived contact line built
    * by identical string arithmetic in both engines — the hash then
    * genuinely exercises cross-engine regex semantics (match sets,
    * replace-all, boundary handling) instead of passing on an all-zero
    * column. Patterns are written in the Java-regex ∩ RE2 dialect both
    * engines parse identically. Redaction order is fixed
    * (email → phone → IP) so the fingerprints agree.
    *
    * Scale shape: pure map-side projections (regex count + replace +
    * md5) — the only shuffle is the final sort; text never shuffles
    * with the counts.
    */
  private val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phonePat = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private val ipPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def piiRedaction(spark: SparkSession, dir: String): DataFrame = {
    val aug = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or 555-123-4567 from 10.0.0."),
      (col("doc_id") % 256).cast("string"))
    Tables.documents(spark, dir)
      .withColumn("aug", aug)
      .select(
        col("doc_id"),
        regexp_count(col("aug"), lit(emailPat)).as("n_emails"),
        regexp_count(col("aug"), lit(phonePat)).as("n_phones"),
        regexp_count(
          regexp_replace(col("aug"), phonePat, "[PHONE]"), lit(ipPat))
          .as("n_ips"),
        md5(
          regexp_replace(
            regexp_replace(
              regexp_replace(col("aug"), emailPat, "[EMAIL]"),
              phonePat, "[PHONE]"),
            ipPat, "[IP]")).as("redacted_fp"))
      .orderBy("doc_id")
  }

  val piiRedactionSql: String = {
    // DuckDB standard string literals pass backslashes through to RE2
    // untouched, so the Scala pattern values embed verbatim
    val (e, p, i) = (emailPat, phonePat, ipPat)
    s"""WITH a AS (
       |  SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR)
       |      || '@mail.example.com or 555-123-4567 from 10.0.0.'
       |      || CAST(doc_id % 256 AS VARCHAR) AS aug
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(aug, '$e')) AS n_emails,
       |  len(regexp_extract_all(aug, '$p')) AS n_phones,
       |  len(regexp_extract_all(
       |    regexp_replace(aug, '$p', '[PHONE]', 'g'), '$i')) AS n_ips,
       |  md5(regexp_replace(regexp_replace(regexp_replace(
       |    aug, '$e', '[EMAIL]', 'g'), '$p', '[PHONE]', 'g'),
       |    '$i', '[IP]', 'g')) AS redacted_fp
       |FROM a ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  /** t12 — vocabulary coverage / OOV rate: induce the top-`vocabSize`
    * corpus vocabulary (count desc, word asc — fully deterministic)
    * and measure, per document, the fraction of tokens falling
    * outside it. The tokenizer-coverage stat every vocab/BPE decision
    * is judged by.
    *
    * Scale shape: the vocabulary is bounded (`vocabSize` rows) →
    * broadcast; the OOV count is a broadcast LEFT ANTI join on the
    * exploded token stream + partial-combining counts. The global
    * top-k vocab sort is a TakeOrdered over (distinct words) — never
    * the token stream. Docs with zero tokens drop out on both sides.
    */
  val vocabSize = 10

  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode_outer(
        expr("filter(split(lower(text), ' '), t -> t != '')")).as("w"))
      .filter(col("w").isNotNull)
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("w"))
      .limit(vocabSize)
      .select("w")
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    val oov = toks.join(broadcast(vocab), Seq("w"), "left_anti")
      .groupBy("doc_id").agg(count(lit(1)).as("n_oov"))
    // shuffle_hash: per-doc OOV counts are corpus-scale (the top-K
    // `vocab` above is the bounded side and stays a broadcast)
    sizes.join(oov.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        Exact.round4(coalesce(col("n_oov"), lit(0L)).cast("double")
          / col("n_tok")).as("oov_rate"))
      .orderBy("doc_id")
  }

  val vocabCoverageSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS w
       |  FROM documents
       |), vocab AS (
       |  SELECT w FROM toks GROUP BY w
       |  ORDER BY COUNT(*) DESC, w LIMIT $vocabSize
       |), sizes AS (
       |  SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY 1
       |), oov AS (
       |  SELECT doc_id, COUNT(*) AS n_oov FROM toks
       |  WHERE w NOT IN (SELECT w FROM vocab) GROUP BY 1)
       |SELECT s.doc_id, s.n_tok, COALESCE(o.n_oov, 0) AS n_oov,
       |  ${Exact.round4Sql("CAST(COALESCE(o.n_oov, 0) AS DOUBLE) / s.n_tok")} AS oov_rate
       |FROM sizes s LEFT JOIN oov o ON s.doc_id = o.doc_id
       |ORDER BY s.doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** t14 — BM25 RANKING (Okapi, k1=1.2, b=0.75): score every document
    * against a query and return the top 20 — the retrieval scorer
    * behind corpus search / eval-set mining. The query is the corpus's
    * own top-`bm25QueryTerms` non-stopword terms by document
    * frequency (deterministic: df desc, term asc), so both engines
    * derive it identically from the data.
    *
    * Determinism hardening beyond t10: a per-DOC score sums several
    * per-term floats, and Spark's partial aggregation adds them in
    * partition order — a run-to-run hash hazard t10 never has (its
    * score is a pure per-row function). Each term's contribution is
    * therefore FLOOR-rounded to 4 dp first, making the document score
    * a sum of integers-in-disguise: exact, associative,
    * order-independent (the Exact.scala money discipline applied to
    * relevance scores).
    *
    * Scale shape: tf/df are partial-combining aggregates bounded by
    * distinct (doc, term); the query-term set and the (N, avgdl)
    * scalar row are broadcast; the final top-k is a sort-limit
    * (TakeOrderedAndProject), never a full global sort.
    */
  val bm25QueryTerms = 5
  val bm25TopK = 20
  private val bm25K1 = "1.2"
  private val bm25B = "0.75"

  def bm25Rank(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val words = docs.withColumn("toks", tokens(lower(col("text"))))
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode_outer(col("toks")).as("w"))
      .filter(col("w").isNotNull) // explode_outer: see Dedup.minhashLsh
    // persisted: the scoring join AND the query-term derivation both
    // read tf — without the cache the tokenize→explode→aggregate
    // pipeline (the dominant cost) runs twice; rows are bounded by
    // distinct (doc, term)
    val tf = PlanMemo.cached(spark, s"text.bm25tf:$dir")(
      words.groupBy("doc_id", "dl", "w").agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val qterms = dfreq
      .filter(!col("w").isin(stopwords: _*))
      .orderBy(desc("df"), col("w")).limit(bm25QueryTerms)
    val stats = docs
      .withColumn("dl", size(tokens(lower(col("text")))))
      .agg(count(lit(1)).as("n_docs"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val contrib = tf
      .join(broadcast(qterms.select("w", "df")), "w")
      .crossJoin(broadcast(stats))
      // D-suffixed literals (round 14): Spark SQL parses a bare `0.5`
      // as DECIMAL, so `n_docs - df + 0.5` ran the whole ratio through
      // base-10 DECIMAL division (scale-capped, rounded) before ln —
      // while DuckDB promotes decimal division to DOUBLE. The two
      // agreed on every corpus gated so far only by rounding luck
      // (t18's identical pattern measurably flaked on the rich
      // corpus). Double literals make both engines evaluate the
      // IDENTICAL IEEE doubles.
      .withColumn("c4", expr(
        s"""CAST(FLOOR(
           |  ln((n_docs - df + 0.5D) / (df + 0.5D) + 1.0D) *
           |  (tf * (${bm25K1}D + 1.0D)) /
           |  (tf + ${bm25K1}D * (1.0D - ${bm25B}D + ${bm25B}D * dl / avgdl))
           |  * 10000) AS BIGINT)""".stripMargin))
    contrib.groupBy("doc_id")
      .agg((sum("c4") / 10000.0).as("bm25"),
        count(lit(1)).as("terms_hit"))
      .orderBy(desc("bm25"), col("doc_id"))
      .limit(bm25TopK)
  }

  val bm25RankSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(${tokensSql("lower(text)")}) AS w,
       |    CAST(len(${tokensSql("lower(text)")}) AS INT) AS dl
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, dl, w, COUNT(*) AS tf FROM t GROUP BY 1, 2, 3
       |), dfq AS (
       |  SELECT w, COUNT(*) AS df FROM tf GROUP BY 1
       |), q AS (
       |  SELECT w, df FROM dfq WHERE w NOT IN ($stopwordsSqlList)
       |  ORDER BY df DESC, w LIMIT $bm25QueryTerms
       |), st AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(CAST(len(${tokensSql("lower(text)")}) AS INT)) AS DOUBLE)
       |      / COUNT(*) AS avgdl
       |  FROM documents
       |), c AS (
       |  SELECT doc_id,
       |    CAST(FLOOR(
       |      ln((n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0) *
       |      (tf * ($bm25K1 + 1.0)) /
       |      (tf + $bm25K1 * (1.0 - $bm25B + $bm25B * dl / avgdl))
       |      * 10000) AS BIGINT) AS c4
       |  FROM tf JOIN q USING (w) CROSS JOIN st
       |)
       |SELECT doc_id, SUM(c4) / 10000.0 AS bm25,
       |  COUNT(*) AS terms_hit
       |FROM c GROUP BY doc_id
       |ORDER BY bm25 DESC, doc_id LIMIT $bm25TopK""".stripMargin

  // ---------------------------------------------------------------
  /** t15 — BIGRAM-LM QUALITY SCORING: train an add-one-smoothed
    * bigram language model on the corpus itself and score every
    * document by mean per-bigram log-probability — the
    * KenLM/CCNet-style perplexity filter every web-scale pipeline
    * runs (gibberish and boilerplate score low; fluent text scores
    * high). p(w₂|w₁) = (c(w₁w₂)+1) / (c(w₁·)+V).
    *
    * Determinism: the same discipline as t14 — each DISTINCT bigram's
    * log-prob is floor-rounded to 4 dp, multiplied by its integer
    * per-doc count, and summed as integers, so document scores are
    * partial-aggregation-order independent.
    *
    * Scale shape: the per-doc bigram stream is aggregated to
    * (doc, w₁, w₂, n) BEFORE any join (bounded by distinct per-doc
    * bigrams, not token count); model counts c₂/c₁ partial-aggregate;
    * V is one broadcast scalar; scoring joins are equi on the bigram.
    */
  def bigramQuality(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bigrams = docs
      .withColumn("toks", tokens(lower(col("text"))))
      .select(col("doc_id"), explode_outer(expr(
        """CASE WHEN size(toks) < 2 THEN CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>)
          |ELSE zip_with(slice(toks, 1, size(toks) - 1),
          |              slice(toks, 2, size(toks) - 1),
          |              (a, b) -> struct(a AS w1, b AS w2))
          |END""".stripMargin)).as("bg"))
      .filter(col("bg").isNotNull) // explode_outer: see Dedup.minhashLsh
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      // Key fingerprinting (round-12, the q16 recipe): every exchange
      // in this pipeline — the per-doc type counts, the c2/c1 model
      // aggregates, and both scoring joins — needs the bigram only as
      // an IDENTITY, never as text, so hash the words map-side and
      // shuffle two longs instead of two strings (~2× narrower rows,
      // fixed-width agg/join fast paths). LM semantics unchanged
      // modulo a 2^-64 fingerprint collision merging two bigram
      // types — far below the smoothing noise floor at any scale.
      .select(col("doc_id"), xxhash64(col("w1")).as("w1h"),
        xxhash64(col("w1"), col("w2")).as("bh"))
    // persisted: per_doc feeds the model counts (c2, c1) AND the
    // scoring join — three consumers of the bigram explode pipeline
    val perDoc = PlanMemo.cached(spark, s"text.bigramPerDoc:$dir")(
      bigrams.groupBy("doc_id", "w1h", "bh")
        .agg(count(lit(1)).as("n")))
    val c2 = perDoc.groupBy("bh").agg(sum("n").as("c2"))
    val c1 = perDoc.groupBy("w1h").agg(sum("n").as("c1"))
    val vocab = docs
      .select(explode_outer(tokens(lower(col("text")))).as("w"))
      .filter(col("w").isNotNull)
      .agg(countDistinct("w").as("v"))
    // shuffle_hash: bigram (vocab²-scale) and unigram (vocab-scale)
    // LM counts grow with the corpus vocabulary — shuffle, never
    // broadcast; only the 1-row `vocab` total is a broadcast side
    val scored = perDoc
      .join(c2.hint("shuffle_hash"), Seq("bh"))
      .join(c1.hint("shuffle_hash"), Seq("w1h"))
      .crossJoin(broadcast(vocab))
      .withColumn("lp4", expr(
        "n * CAST(FLOOR(ln((c2 + 1.0) / (c1 + v)) * 10000) AS BIGINT)"))
      .groupBy("doc_id")
      .agg(sum("lp4").as("lp4sum"), sum("n").as("n_bigrams"))
    docs.select("doc_id")
      .join(scored.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        Exact.round4(coalesce(
          col("lp4sum").cast("double") / (col("n_bigrams") * 10000.0),
          lit(0.0))).as("avg_logprob"))
      .orderBy("doc_id")
  }

  val bigramQualitySql: String =
    s"""WITH t AS (
       |  SELECT doc_id, ${tokensSql("lower(text)")} AS toks FROM documents
       |), bg AS (
       |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
       |  FROM (
       |    SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t)
       |), per_doc AS (
       |  SELECT doc_id, w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2, 3
       |), c2 AS (
       |  SELECT w1, w2, CAST(SUM(n) AS BIGINT) AS c2 FROM per_doc GROUP BY 1, 2
       |), c1 AS (
       |  SELECT w1, CAST(SUM(n) AS BIGINT) AS c1 FROM per_doc GROUP BY 1
       |), vocab AS (
       |  SELECT COUNT(DISTINCT w) AS v FROM (
       |    SELECT unnest(${tokensSql("lower(text)")}) AS w FROM documents)
       |), scored AS (
       |  SELECT doc_id,
       |    CAST(SUM(n * CAST(FLOOR(ln((c2 + 1.0) / (c1 + v)) * 10000) AS BIGINT)) AS BIGINT)
       |      AS lp4sum,
       |    CAST(SUM(n) AS BIGINT) AS n_bigrams
       |  FROM per_doc JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab
       |  GROUP BY doc_id
       |)
       |SELECT d.doc_id,
       |  COALESCE(s.n_bigrams, 0) AS n_bigrams,
       |  ${Exact.round4Sql(
            "COALESCE(CAST(s.lp4sum AS DOUBLE) / (s.n_bigrams * 10000.0), 0.0)")}
       |    AS avg_logprob
       |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** t13 — Unicode NFC normalization over the corpus, via the native
    * [[NfcNormalize]] codegen expression (Spark ships no normalizer;
    * a UDF would break whole-stage codegen). The same logical content
    * arrives precomposed (é) and decomposed (e + U+0301) in real
    * corpora, so every hash-keyed dedup needs this pass first; the
    * query reports per-document whether NFC changed the text, the
    * code-point delta, and the post-NFC fingerprint a dedup would key
    * on.
    *
    * The corpus is ASCII (pinned in TextDedupSpec), so like t11's PII
    * augment a deterministic decomposed-sequence suffix (keyed on
    * doc_id, one branch left unaugmented) makes the cross-engine gate
    * real: DuckDB's `nfc_normalize` must compose the identical bytes
    * for the md5s to match.
    *
    * Map-side only — no shuffle at all but the presentation sort.
    */
  private val nfcSuffixes = Seq(
    // combining marks spelled as escapes: a source-file NFC pass (an
    // editor, a formatter) must not silently erase the fixture
    "cafe\u0301 re\u0301sume\u0301", // e + COMBINING ACUTE
    "A\u030angstro\u0308m",           // A + RING ABOVE, o + DIAERESIS
    "pin\u0303a o\u0302tel")          // n + TILDE, o + CIRCUMFLEX

  def nfcNormalize(spark: SparkSession, dir: String): DataFrame = {
    val suffix = element_at(
      array(nfcSuffixes.map(lit): _*), (col("doc_id") % 3 + 1).cast("int"))
    val aug = when(col("doc_id") % 4 === 3, col("text"))
      .otherwise(concat(col("text"), lit(" "), suffix))
    Tables.documents(spark, dir)
      .withColumn("aug", aug)
      .withColumn("nfc", expr("nfc_normalize(aug)"))
      .select(
        col("doc_id"),
        (col("nfc") =!= col("aug")).cast("int").as("changed"),
        (length(col("aug")) - length(col("nfc"))).cast("long")
          .as("composed_points"),
        md5(col("nfc")).as("nfc_fp"))
      .orderBy("doc_id")
  }

  val nfcNormalizeSql: String = {
    val cases = nfcSuffixes.zipWithIndex
      .map { case (s, i) => s"WHEN $i THEN text || ' ' || '$s'" }
      .mkString("\n      ")
    s"""WITH a AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 4 = 3 THEN text ELSE
       |      CASE doc_id % 3
       |      $cases
       |      END
       |    END AS aug
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(nfc_normalize(aug) <> aug AS INT) AS changed,
       |  CAST(length(aug) - length(nfc_normalize(aug)) AS BIGINT)
       |    AS composed_points,
       |  md5(nfc_normalize(aug)) AS nfc_fp
       |FROM a ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  /** t16 — C4-STYLE HEURISTIC CLEANING (Raffel et al. 2020, §2.2 of
    * the T5 paper): the line- and page-level rules the C4 corpus was
    * built with. Line rules — keep a line only if it ends in terminal
    * punctuation, has ≥ `c4MinWords` words, and mentions neither
    * "javascript" nor "cookie". Page rules — drop the whole page if it
    * contains a curly brace (code), the phrase "lorem ipsum"
    * (placeholder boilerplate), or fewer than `c4MinKept` surviving
    * sentences.
    *
    * The corpus is single-line word-soup, so like t11/t13 the query
    * PLANTS its fixture: each document becomes a multi-line page —
    * its own text plus doc_id-keyed boilerplate lines (concat_ws
    * skips the NULL branches identically in both engines) — and the
    * hash then exercises every rule against real variety instead of
    * passing vacuously.
    *
    * Scale shape: pure map-side line explode + one partial-combining
    * per-doc aggregate; shuffles carry (doc_id, counters), never text.
    */
  val c4MinWords = 5
  val c4MinKept = 3

  private val c4Boilerplate: Seq[(Int, Int, String)] = Seq(
    (2, 0, "the quick brown fox jumps over the lazy dog."),
    (3, 0, "a second full sentence keeps this page alive."),
    (4, 1, "please enable javascript and accept our cookie policy."),
    (5, 2, "short line."),
    (6, 3, "this line lacks terminal punctuation entirely so it goes"),
    (11, 4, "lorem ipsum dolor sit amet consectetur."),
    (13, 5, "var f = function() { return 1; }."))

  def c4Clean(spark: SparkSession, dir: String): DataFrame = {
    val page = concat_ws("\n",
      concat(col("text"), lit(".")) +:
        c4Boilerplate.map { case (m, r, l) =>
          when(col("doc_id") % m === r, lit(l))
        }: _*)
    val pages = Tables.documents(spark, dir)
      .select(col("doc_id"), page.as("page"))
    val keepLine = expr(s"right(l, 1)").isin(".", "!", "?", "\"") &&
      size(tokens(col("l"))) >= c4MinWords &&
      instr(lower(col("l")), "javascript") === 0 &&
      instr(lower(col("l")), "cookie") === 0
    val agg = pages
      .select(col("doc_id"), explode_outer(split(col("page"), "\n")).as("l"))
      .filter(col("l").isNotNull)
      .select(col("doc_id"), keepLine.cast("int").as("keep"),
        length(col("l")).as("n_chars"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum("keep").as("n_kept"),
        coalesce(sum(col("n_chars") * col("keep")), lit(0L)).as("kept_chars"))
    // shuffle_hash on the NARROW per-doc aggregate: both sides are
    // corpus-scale, and `pages` carries the full cleaned text — the
    // static plan was broadcasting the TEXT side
    pages.join(agg.hint("shuffle_hash"), "doc_id")
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("kept_chars"),
        when(instr(col("page"), "{") > 0, "brace")
          .when(instr(lower(col("page")), "lorem ipsum") > 0, "lorem")
          .when(col("n_kept") < c4MinKept, "few_sentences")
          .otherwise("").as("drop_reason"))
      .withColumn("page_keep",
        (col("drop_reason") === "").cast("int"))
      .orderBy("doc_id")
  }

  val c4CleanSql: String = {
    val branches = c4Boilerplate.map { case (m, r, l) =>
      s"CASE WHEN doc_id % $m = $r THEN '$l' END"
    }.mkString(",\n       |    ")
    s"""WITH pg AS (
       |  SELECT doc_id, concat_ws(chr(10), text || '.',
       |    $branches) AS page
       |  FROM documents
       |), ln AS (
       |  SELECT doc_id, unnest(string_split(page, chr(10))) AS l FROM pg
       |), lf AS (
       |  SELECT doc_id,
       |    CASE WHEN right(l, 1) IN ('.', '!', '?', '"')
       |      AND len(list_filter(string_split(l, ' '), t -> t <> '')) >= $c4MinWords
       |      AND instr(lower(l), 'javascript') = 0
       |      AND instr(lower(l), 'cookie') = 0
       |    THEN 1 ELSE 0 END AS keep,
       |    len(l) AS n_chars
       |  FROM ln
       |), ag AS (
       |  SELECT doc_id, COUNT(*) AS n_lines,
       |    CAST(SUM(keep) AS BIGINT) AS n_kept,
       |    CAST(COALESCE(SUM(n_chars * keep), 0) AS BIGINT) AS kept_chars
       |  FROM lf GROUP BY doc_id)
       |SELECT p.doc_id, ag.n_lines, ag.n_kept, ag.kept_chars,
       |  CASE WHEN instr(p.page, '{') > 0 THEN 'brace'
       |       WHEN instr(lower(p.page), 'lorem ipsum') > 0 THEN 'lorem'
       |       WHEN ag.n_kept < $c4MinKept THEN 'few_sentences'
       |       ELSE '' END AS drop_reason,
       |  CAST(CASE WHEN instr(p.page, '{') = 0
       |       AND instr(lower(p.page), 'lorem ipsum') = 0
       |       AND ag.n_kept >= $c4MinKept THEN 1 ELSE 0 END AS INT)
       |    AS page_keep
       |FROM pg p JOIN ag USING (doc_id)
       |ORDER BY p.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  /** t17 — GOPHER QUALITY RULES (Rae et al. 2021, Appendix A1.1): the
    * word-level document filters the Gopher/MassiveText pipeline runs
    * before training — word count bounds, mean-word-length band,
    * symbol-to-word ratio (# / …), alphabetic-word ratio, and the
    * "contains ≥ 2 of a small stopword set" fluency check. (The
    * line-level Gopher rules — bullet/ellipsis line ratios — are the
    * t16 territory; this is the per-word family.)
    *
    * The corpus is clean lowercase word-soup, so like t11/t16 the
    * query PLANTS deterministic doc_id-keyed tails (symbol words,
    * ellipsis words, numeric words, stopwords) with identical string
    * arithmetic in both engines — each rule genuinely fires on a
    * subset of documents instead of passing vacuously. Pass/fail
    * flags compare the floor-rounded ratios, so the decision is
    * bit-identical cross-engine.
    *
    * Scale shape: pure map-side token HOFs (no explode, no join); the
    * only shuffle is the oracle-determinism sort. At 100 TB this is a
    * single scan emitting one bounded row per document.
    */
  val gopherMinWords = 50
  val gopherMaxWords = 100000
  val gopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private val gopherTails: Seq[(Int, Int, String)] = Seq(
    (7, 0, "# # # # # #"),                 // symbol-ratio offenders
    (7, 1, "... ... ... ..."),             // ellipsis symbol words
    (5, 2, "12345 678 90 11 22"),          // non-alphabetic words
    (3, 0, "and of that have"),            // stopword-rule passers
    // mean-word-length offenders: eight 25-char words push a short
    // document's mean past 10 while long documents absorb them
    (11, 3, Seq.fill(8)("x" * 25).mkString(" ")))

  /** The t17 metric block over any (doc_id, text) frame — shared with
    * the streaming ingest gate (w11): every column is a map-side
    * projection, so the same expressions run unchanged on a batch or
    * a streaming scan.
    */
  private[graft] def gopherMetrics(docs: DataFrame): DataFrame = {
    val aug = concat_ws(" ",
      col("text") +: gopherTails.map { case (m, r, t) =>
        when(col("doc_id") % m === r, lit(t))
      }: _*)
    docs
      .withColumn("toks", tokens(aug))
      .withColumn("n_words", size(col("toks")))
      .withColumn("mean_word_len", Exact.round4(
        aggregate(col("toks"), lit(0), (acc, t) => acc + length(t))
          .cast("double") / greatest(col("n_words"), lit(1))))
      .withColumn("symbol_ratio", Exact.round4(
        size(filter(col("toks"), t => t.isin("#", "...")))
          .cast("double") / greatest(col("n_words"), lit(1))))
      .withColumn("alpha_ratio", Exact.round4(
        size(filter(col("toks"), t => t.rlike("[a-z]")))
          .cast("double") / greatest(col("n_words"), lit(1))))
      .withColumn("n_stop",
        size(array_intersect(array_distinct(col("toks")),
          array(gopherStops.map(lit): _*))))
      .withColumn("pass_words",
        (col("n_words") >= gopherMinWords &&
          col("n_words") <= gopherMaxWords).cast("int"))
      .withColumn("pass_word_len",
        (col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0).cast("int"))
      .withColumn("pass_symbol", (col("symbol_ratio") <= 0.1).cast("int"))
      .withColumn("pass_alpha", (col("alpha_ratio") >= 0.8).cast("int"))
      .withColumn("pass_stop", (col("n_stop") >= 2).cast("int"))
      .withColumn("gopher_pass",
        (col("pass_words") + col("pass_word_len") + col("pass_symbol") +
          col("pass_alpha") + col("pass_stop") === 5).cast("int"))
      .select("doc_id", "n_words", "mean_word_len", "symbol_ratio",
        "alpha_ratio", "n_stop", "pass_words", "pass_word_len",
        "pass_symbol", "pass_alpha", "pass_stop", "gopher_pass")
  }

  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherMetrics(Tables.documents(spark, dir)).orderBy("doc_id")

  val gopherRulesSql: String = {
    val tailSql = gopherTails.map { case (m, r, t) =>
      s"CASE WHEN doc_id % $m = $r THEN '$t' END"
    }.mkString(", ")
    val stopsSql = gopherStops.map("'" + _ + "'").mkString(", ")
    s"""WITH aug AS (
       |  SELECT doc_id, concat_ws(' ', text, $tailSql) AS a FROM documents
       |), t AS (
       |  SELECT doc_id, ${tokensSql("a")} AS toks FROM aug
       |), m AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS INT) AS n_words,
       |    ${Exact.round4Sql(
              "CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS DOUBLE)" +
              " / greatest(len(toks), 1)")} AS mean_word_len,
       |    ${Exact.round4Sql(
              "CAST(len(list_filter(toks, x -> x IN ('#', '...'))) AS DOUBLE)" +
              " / greatest(len(toks), 1)")} AS symbol_ratio,
       |    ${Exact.round4Sql(
              "CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)" +
              " / greatest(len(toks), 1)")} AS alpha_ratio,
       |    CAST(len(list_intersect(list_distinct(toks), [$stopsSql])) AS INT)
       |      AS n_stop
       |  FROM t)
       |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_ratio, n_stop,
       |  CAST(CASE WHEN n_words BETWEEN $gopherMinWords AND $gopherMaxWords
       |    THEN 1 ELSE 0 END AS INT) AS pass_words,
       |  CAST(CASE WHEN mean_word_len BETWEEN 3.0 AND 10.0
       |    THEN 1 ELSE 0 END AS INT) AS pass_word_len,
       |  CAST(CASE WHEN symbol_ratio <= 0.1 THEN 1 ELSE 0 END AS INT) AS pass_symbol,
       |  CAST(CASE WHEN alpha_ratio >= 0.8 THEN 1 ELSE 0 END AS INT) AS pass_alpha,
       |  CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS INT) AS pass_stop,
       |  CAST(CASE WHEN (CASE WHEN n_words BETWEEN $gopherMinWords AND $gopherMaxWords THEN 1 ELSE 0 END)
       |    + (CASE WHEN mean_word_len BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END)
       |    + (CASE WHEN symbol_ratio <= 0.1 THEN 1 ELSE 0 END)
       |    + (CASE WHEN alpha_ratio >= 0.8 THEN 1 ELSE 0 END)
       |    + (CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END) = 5
       |    THEN 1 ELSE 0 END AS INT) AS gopher_pass
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  /** t18 — DSIR-STYLE IMPORTANCE WEIGHTS (the data-selection recipe
    * of Xie et al. 2023: score every raw document by the
    * log-likelihood ratio of a TARGET language model over a RAW
    * language model, then sample proportionally). Here the target
    * distribution is the English slice of the corpus, the raw
    * distribution is the whole corpus, and both models are add-one-
    * smoothed unigram LMs — p(w) = (c(w)+1)/(N+V) — so the weight is
    *
    *   w(doc) = (1/|doc|) · Σ_w n_doc(w) · ln(p_target(w)/p_raw(w)).
    *
    * Determinism: the t14/t15 discipline — each DISTINCT word's log
    * ratio is floor-rounded to 4 dp once, multiplied by integer
    * per-doc counts, and summed as integers, so document scores are
    * aggregation-order independent and bit-identical cross-engine.
    * Round-14 incident, diagnosed to root cause: this gate FLAKED on
    * the rich corpus (±1 lw4 on three words) and the cause was NOT
    * ln — Java Math.log and libm agreed on every one of the corpus's
    * 24 853 ratios — but Spark parsing the bare `1.0` literal as
    * DECIMAL, running the ratio through scale-capped base-10 DECIMAL
    * division before ln, where DuckDB promotes decimal division to
    * DOUBLE. The expression now uses D-suffixed double literals, so
    * both engines ln the IDENTICAL IEEE double. The residual
    * cross-engine risk is a genuine 1-ulp ln difference landing
    * exactly on a 1e-4 floor boundary — measured zero hits over this
    * corpus's full vocabulary; if a gate ever flakes with ±1 lw4 on
    * one word, check that class before hunting corpus bugs (t23
    * avoids even that by pure-integer weights, an option DSIR's
    * log-ratio definition does not allow).
    *
    * Scale shape: the token stream is reduced to (doc, word, n)
    * BEFORE any join (bounded by distinct per-doc words); model
    * counts partial-aggregate; the corpus totals are one broadcast
    * scalar row; scoring is an equi join on the word.
    */
  val dsirTargetLang = "en"

  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // lang rides along (functionally dependent on doc_id — free)
    // Key fingerprinting (round-12, the q16/t15 recipe): the word is
    // only ever an IDENTITY downstream — per-doc type counts, the
    // per-word model aggregate, the scoring join, the vocab count —
    // so hash it map-side and shuffle a long instead of a string.
    // LM semantics unchanged modulo a 2^-64 collision merging two
    // word types (and shifting V by the same count) — far below the
    // add-one smoothing noise floor at any corpus size.
    val perDocWord = PlanMemo.cached(spark, s"text.dsirPerDocWord:$dir")(
      docs
        .select(col("doc_id"), col("lang"),
          explode_outer(tokens(lower(col("text")))).as("w"))
        .filter(col("w").isNotNull)
        .groupBy(col("doc_id"), col("lang"), xxhash64(col("w")).as("wh"))
        .agg(count(lit(1)).as("n")))
    val isT = col("lang") === dsirTargetLang
    val wordStats = perDocWord.groupBy("wh")
      .agg(sum("n").as("cr"), sum(when(isT, col("n")).otherwise(0L)).as("ct"))
    val totals = perDocWord
      .agg(sum("n").as("nr"), sum(when(isT, col("n")).otherwise(0L)).as("nt"))
    val vocab = wordStats.agg(count(lit(1)).as("v"))
    // shuffle_hash: per-word raw/target counts span the corpus
    // vocabulary — unbounded; the 1-row totals stay broadcasts
    val scored = perDocWord
      .join(wordStats.hint("shuffle_hash"), "wh")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(vocab))
      .withColumn("lw4", expr(
        // 1.0D, not 1.0 (round 14): a bare decimal literal made
        // `ct + 1.0` DECIMAL and the ratio ran through Spark's
        // scale-capped DECIMAL division before ln — DuckDB promotes
        // to DOUBLE, and the two roundings diverged by one 1e-4 floor
        // step on three rich-corpus words (the observed t18 flake).
        // With double literals both engines ln the identical double.
        "n * CAST(FLOOR(ln(((ct + 1.0D) / (nt + v)) / ((cr + 1.0D) / (nr + v))) * 10000) AS BIGINT)"))
      .groupBy("doc_id")
      .agg(sum("lw4").as("lw4sum"), sum("n").as("n_tokens"))
    docs.select(col("doc_id"), col("lang"))
      .join(scored.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("lang"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        Exact.round4(coalesce(
          col("lw4sum").cast("double") / (col("n_tokens") * 10000.0),
          lit(0.0))).as("dsir_weight"))
      .orderBy("doc_id")
  }

  val dsirWeightsSql: String =
    s"""WITH ex AS (
       |  SELECT doc_id, lang, unnest(${tokensSql("lower(text)")}) AS w
       |  FROM documents
       |), pdw AS (
       |  SELECT doc_id, lang, w, COUNT(*) AS n FROM ex GROUP BY 1, 2, 3
       |), ws AS (
       |  SELECT w, CAST(SUM(n) AS BIGINT) AS cr,
       |    CAST(SUM(CASE WHEN lang = '$dsirTargetLang' THEN n ELSE 0 END) AS BIGINT) AS ct
       |  FROM pdw GROUP BY 1
       |), tot AS (
       |  SELECT CAST(SUM(n) AS BIGINT) AS nr,
       |    CAST(SUM(CASE WHEN lang = '$dsirTargetLang' THEN n ELSE 0 END) AS BIGINT) AS nt
       |  FROM pdw
       |), vc AS (
       |  SELECT COUNT(*) AS v FROM ws
       |), scored AS (
       |  SELECT doc_id,
       |    CAST(SUM(n * CAST(FLOOR(ln(((ct + 1.0) / (nt + v)) / ((cr + 1.0) / (nr + v))) * 10000) AS BIGINT)) AS BIGINT)
       |      AS lw4sum,
       |    CAST(SUM(n) AS BIGINT) AS n_tokens
       |  FROM pdw JOIN ws USING (w) CROSS JOIN tot CROSS JOIN vc
       |  GROUP BY doc_id
       |)
       |SELECT d.doc_id, d.lang,
       |  COALESCE(s.n_tokens, 0) AS n_tokens,
       |  ${Exact.round4Sql(
            "COALESCE(CAST(s.lw4sum AS DOUBLE) / (s.n_tokens * 10000.0), 0.0)")}
       |    AS dsir_weight
       |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** t19 — CONTENT-DEFINED CHUNKING (the rolling-hash boundary rule
    * behind storage-level dedup and rsync/LBFS-style delta encoding,
    * and the chunking FastCDC-family corpus pipelines use): a chunk
    * boundary falls AFTER token i+3 wherever the t08 rolling window
    * hash at position i satisfies `whs[i] % cdcMod == 0`. Unlike the
    * fixed [[Dedup.paraSize]]-token grid (d15), CDC boundaries are a
    * function of CONTENT alone — an insertion early in a document
    * shifts every fixed-grid chunk but leaves all later CDC chunks
    * (and their dedup hashes) intact.
    *
    * Per-document profile: chunk count, boundary density, mean/max
    * chunk length — pure map-side array arithmetic over the already-
    * fingerprinted token stream; the only shuffle is the oracle sort.
    * Expected chunk length ≈ cdcMod tokens.
    */
  val cdcMod = 8

  def cdcChunks(spark: SparkSession, dir: String): DataFrame = {
    OptimizerBarrier.register(spark)
    Tables.documents(spark, dir)
      .withColumn("toks", tokens(lower(col("text"))))
      .withColumn("fps", expr(
        "optimizer_barrier(transform(toks, t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) % 2147483647))"))
      .filter(size(col("fps")) >= rollWindow)
      .withColumn("whs", expr(rollExpr))
      // boundary token positions: window i ends at token i+3; a
      // boundary flush with the document end would cut an empty chunk
      .withColumn("bpt", expr(
        s"""filter(transform(sequence(1, size(whs)),
           |  i -> CASE WHEN element_at(whs, i) % $cdcMod = 0
           |    THEN i + ${rollWindow - 1} ELSE -1 END),
           |  p -> p > 0 AND p < size(toks))""".stripMargin))
      .withColumn("starts", expr("concat(array(0), bpt)"))
      .withColumn("ends", expr("concat(bpt, array(size(toks)))"))
      .withColumn("lens", expr("zip_with(ends, starts, (e, s) -> e - s)"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(col("lens")).as("n_chunks"),
        Exact.round4(size(col("lens")).cast("double") /
          size(col("toks"))).as("boundary_density"),
        Exact.round4(size(col("toks")).cast("double") /
          size(col("lens"))).as("mean_chunk_tokens"),
        array_max(col("lens")).as("max_chunk_tokens"))
      .orderBy("doc_id")
  }

  val cdcChunksSql: String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |    list_transform(${tokensSql("lower(text)")},
       |      t -> ${fp64Sql("t")} % 2147483647) AS fps
       |  FROM documents
       |), w AS (
       |  SELECT doc_id, CAST(len(fps) AS INT) AS n_tokens, $rollSql AS whs
       |  FROM f WHERE len(fps) >= $rollWindow
       |), b AS (
       |  SELECT doc_id, n_tokens,
       |    list_filter(list_transform(range(1, len(whs) + 1),
       |      i -> CASE WHEN whs[i] % $cdcMod = 0
       |        THEN i + ${rollWindow - 1} ELSE -1 END),
       |      p -> p > 0 AND p < n_tokens) AS bpt
       |  FROM w
       |), c AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(len(bpt) + 1 AS INT) AS n_chunks,
       |    list_aggregate(list_transform(
       |      range(1, len(bpt) + 2),
       |      i -> (CASE WHEN i = len(bpt) + 1 THEN n_tokens ELSE bpt[i] END)
       |         - (CASE WHEN i = 1 THEN 0 ELSE bpt[i - 1] END)), 'max')
       |      AS max_chunk_tokens
       |  FROM b)
       |SELECT doc_id, n_tokens, n_chunks,
       |  ${Exact.round4Sql("CAST(n_chunks AS DOUBLE) / n_tokens")} AS boundary_density,
       |  ${Exact.round4Sql("CAST(n_tokens AS DOUBLE) / n_chunks")} AS mean_chunk_tokens,
       |  max_chunk_tokens
       |FROM c ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** t20 — APPROXIMATE HEAVY HITTERS: the corpus top-k vocabulary by
    * `approx_top_k` (Spark 4's DataSketches frequent-items aggregate)
    * — the bounded-memory one-pass spelling of t02's exact top-20.
    * At 100 TB the exact twin shuffles the full distinct vocabulary
    * to count it; the sketch tracks `maxTracked` items per partition
    * in fixed memory, merges map-side, and guarantees every estimate
    * within N·ε of truth (ε ≈ 3.5/maxTracked for the underlying
    * LongsSketch) — the same one-pass/bounded-memory story as r05's
    * HLL and r04's GK, and gated the same way (round-12): the sketch
    * CONTRACT reduces to booleans against the exact twin, with a
    * constant-TRUE DuckDB oracle:
    *   - band_k_returned:  the sketch returned min(k, vocab) items;
    *   - band_top1:        its max estimate equals the exact top
    *     count (the sketch is count-exact for items it never evicts);
    *   - band_recall:      every word whose exact count clears the
    *     exact 20th count by the error bound appears in the sketch's
    *     top-20 (the frequent-items recall guarantee);
    *   - band_counts_within: every sketch estimate for a word in the
    *     exact top-20 is within the N·ε bound of its exact count.
    */
  val heavyHitterK = 20
  val heavyHitterMaxTracked = 10000

  /** Exact-twin scaffolding shared by t20 and the streaming w13:
    * (exact top-k with counts, vocab, total tokens). Memoized
    * driver-side — both gates compare against the SAME exact state,
    * and the extra scan runs once per (session, dir).
    */
  private[graft] def heavyHitterExact(spark: SparkSession, dir: String)
      : (Seq[(String, Long)], Long, Long) =
    PlanMemo.cachedValue(spark, s"text.hhExact:$dir") {
      val ex = Tables.documents(spark, dir)
        .select(explode(tokens(lower(col("text")))).as("w"))
      val exact = ex.groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), col("w")).limit(heavyHitterK)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      val vn = ex.agg(countDistinct("w").as("v"), count(lit(1)).as("n")).head()
      (exact, vn.getLong(0), vn.getLong(1))
    }

  /** Band reduction shared by t20 and w13: the frequent-items sketch
    * contract checked against the exact twin.
    */
  private[graft] def heavyHitterBands(spark: SparkSession, dir: String,
      sk: Map[String, Long]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val (exact, vocab, n) = heavyHitterExact(spark, dir)
    val bound = math.ceil(n * 3.5 / heavyHitterMaxTracked).toLong
    val kReturned = sk.size == math.min(heavyHitterK.toLong, vocab)
    val top1 = exact.headOption.forall { case (_, c) =>
      sk.nonEmpty && sk.values.max == c }
    val cut = exact.lastOption.map(_._2).getOrElse(0L) + bound
    val recall = exact.filter(_._2 > cut).forall { case (w, _) => sk.contains(w) }
    val countsWithin = exact.forall { case (w, c) =>
      sk.get(w).forall(est => math.abs(est - c) <= bound) }
    Seq((kReturned, top1, recall, countsWithin))
      .toDF("band_k_returned", "band_top1", "band_recall",
        "band_counts_within")
  }

  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val ex = Tables.documents(spark, dir)
      .select(explode(tokens(lower(col("text")))).as("w"))
    val sk = ex.agg(expr(
        s"approx_top_k(w, $heavyHitterK, $heavyHitterMaxTracked)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("w"), col("e.count").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    heavyHitterBands(spark, dir, sk)
  }

  val heavyHittersSql: String =
    """SELECT TRUE AS band_k_returned, TRUE AS band_top1,
      |  TRUE AS band_recall, TRUE AS band_counts_within""".stripMargin

  // ---------------------------------------------------------------
  /** Target vocabulary size for the BPE tokenizer: 256 base byte
    * symbols + learned merges — the production stopping rule (GPT-2's
    * 50257 = 256 byte symbols + 50 000 merges + 1 special; training
    * runs until the vocabulary reaches the target). [[bpeRounds]] is
    * the merge-count this target implies; it is a compile-time
    * constant because the DuckDB twin is a statically UNROLLED chain
    * of one CTE pair per round.
    */
  val bpeVocabTarget: Int = 268
  /** Merge rounds implied by [[bpeVocabTarget]] — shared by the
    * engine's training loop and the unrolled oracle.
    */
  val bpeRounds: Int = bpeVocabTarget - 256

  /** Format version of the PUBLISHED `bpe_merges` artifact (round-15
    * verdict "next" 6): bumped whenever the trained-table semantics
    * change (v2 = byte-level UTF-8 hex symbols). The artifact carries
    * (version, word pattern, vocab target, alphabet) beside every
    * merge row, and [[bpeArtifactDecode]] REFUSES a mismatched table —
    * a consumer session can never silently mis-encode under a
    * tokenizer trained with a different configuration; it re-trains
    * instead.
    */
  val bpeFormatVersion: Int = 2

  /** Symbol-alphabet tag published in the artifact: UTF-8 bytes as
    * uppercase hex pairs (see [[byteSym]]).
    */
  val bpeAlphabet: String = "utf8-bytes-hex"

  /** Pre-tokenization for the BPE family (byte-level v2): maximal
    * Unicode-letter runs, digit runs, or ONE other non-whitespace
    * char — the GPT-2-style shape, case-preserving (no lowercasing;
    * real tokenizers train on raw text). The whitespace class is
    * spelled explicitly (space/tab/LF/CR/FF) because Java's `\s` and
    * RE2's `\s` disagree on \x0B — the explicit class makes engine
    * and oracle match on EVERY byte sequence, not just realistic
    * ones. Each alternative matches ≥1 char, so no empty tokens.
    */
  val bpeWordPattern: String = """\p{L}+|[0-9]+|[^\p{L}0-9 \t\n\r\f]"""

  /** The BPE word stream of a text column (Java regex side). */
  private[graft] def bpeWords(c: Column): Column =
    regexp_extract_all(c, lit(bpeWordPattern), lit(0))

  /** DuckDB fragment for the same pre-tokenization (RE2 side —
    * `\p{L}`, the digit class and the explicit whitespace class mean
    * the same thing in both engines).
    */
  private[graft] def bpeWordsSql(e: String): String =
    s"regexp_extract_all($e, '$bpeWordPattern')"

  /** A word's UTF-8 bytes as a space-joined string of UPPERCASE hex
    * pairs — the byte-level symbol alphabet ("é" → "C3 A9", "ab" →
    * "61 62"). Both engines' `hex` render uppercase, every symbol is
    * space-free, and merged symbols are hex-pair concatenations, so
    * the merge machinery below is alphabet-agnostic and the byte
    * split is EXACTLY shared with the oracle.
    */
  private[graft] def byteSym(c: Column): Column =
    trim(regexp_replace(hex(encode(c, "UTF-8")), lit("(..)"), lit("$1 ")))

  /** DuckDB fragment for the same byte split. */
  private[graft] def byteSymSql(e: String): String =
    s"""trim(regexp_replace(hex(encode($e)), '(..)', '\\1 ', 'g'))"""

  /** t21's training table: the corpus word-frequency dictionary with
    * each word pre-split into its byte-symbol string. This is classic
    * Sennrich BPE's input shape — and the whole reason the operator
    * scales: the ONLY corpus-sized pass is this one explode →
    * groupBy(word) count (partial aggregation makes the shuffle
    * O(distinct words), not O(tokens)); every merge round afterwards
    * runs on this dictionary, whose cardinality is the corpus
    * VOCABULARY (~1e8 rows at 100 TB, not 1e12 tokens). Memoized
    * eager: all [[bpeRounds]] pair-count jobs re-scan it. Byte-level
    * (round-14): symbols are UTF-8 bytes, so punctuation, digits,
    * mixed case, and multi-byte scripts all train exactly — no
    * alphabet restriction.
    */
  private[graft] def bpeVocab(spark: SparkSession, dir: String): DataFrame =
    PlanMemo.cachedEager(spark, s"text.bpeVocab:$dir")(
      // PUBLISHED artifact (round 19): the word-frequency dictionary
      // is the canonical first artifact of every real BPE training
      // pipeline — the word-count table the trainer consumes and the
      // encode/accounting tiers join against. It is corpus-derived,
      // vocabulary-sized, and consumed by a dozen operators (t21-t33
      // dictionaries, the e-family token accounting, w15, p07), each
      // of which previously re-ran the corpus tokenize+explode+groupBy
      // to rebuild it. Same content-fingerprint keying as bpe_merges
      // (a mutated corpus re-derives); build cost is visible as the
      // first consumer's cold_sec/memo_cold in Bench. Values are
      // byte-identical: the artifact is the same (word, freq, sym)
      // rows round-tripped through parquet (string/long/string).
      PlanMemo.publishedParquet(spark, dir, "bpe_vocab")(
        Tables.documents(spark, dir)
          .select(explode(bpeWords(col("text"))).as("word"))
          .groupBy("word").agg(count(lit(1)).as("freq"))
          .withColumn("sym", byteSym(col("word")))
          // `word` rides along for t22's encode join; t21's pair
          // counting reads only (freq, sym)
          .select("word", "freq", "sym")))

  /** The eager Lloyd-style training loop (see Clustering.centroidsOn
    * for the pattern): each round is one pair-count aggregation over
    * the dictionary — explode adjacent symbol pairs weighted by word
    * freq, groupBy(pair) sum, TakeOrdered(1) by (cnt DESC, pair ASC)
    * — followed by a driver-side record of the winning merge. The
    * collect is ONE row per round (O(k) driver metadata, like the
    * k-means centroids), and the merge is re-applied lazily as a
    * growing `replace` chain over the memoized base dictionary, so
    * no per-round re-materialization is needed (k×replace per row ≈
    * trivial next to the pair explode).
    *
    * Merge application contract (pinned by TextBpeSpec and mirrored
    * verbatim by the DuckDB oracle): a merge (l, r) rewrites the
    * symbol string via `trim(replace(' '||sym||' ', ' l r ', ' lr '))`
    * — leftmost-first, non-overlapping, separator-consuming. On a run
    * like "a a a a" this merges ONE pair per round ("aa a a"), where
    * canonical BPE would take two; both engines implement `replace`
    * identically, so the gate is exact, and the deviation only
    * matters for same-symbol runs (rare outside degenerate corpora).
    *
    * Invariant (TextBpeSpec): winning counts are non-increasing
    * across rounds — any pair CREATED by a merge (x, lr) occurs only
    * where (x, l) occurred, so its count is bounded by a candidate
    * the previous round already considered.
    *
    * Degenerate corpora (no adjacent pair anywhere before `rounds`
    * merges complete — e.g. single-letter words only): the engine
    * fails LOUDLY here (the require below), surfacing as a Verify
    * `err`, while the unrolled oracle would degrade to fewer rows /
    * NULL-sym CTEs. The failure modes differ but neither can pass a
    * gate silently; unreachable on any realistic text corpus.
    */
  /** The ONE spelling of merge application — (l, r) rewritten over a
    * symbol-string expression as a leftmost-first, non-overlapping,
    * separator-consuming replace. Train (bpeMergesOn), batch encode
    * (bpeEncodeDict) and stream encode (bpeNtokExpr) all go through
    * here, so their spellings cannot drift (the divergence class
    * TextBpeSpec's equality tests gate).
    */
  private def mergeReplaceExpr(e: String, l: String, r: String): String =
    s"trim(replace(concat(' ', $e, ' '), ' $l $r ', ' $l$r '))"

  private[graft] def bpeMergesOn(
      spark: SparkSession, key: String, vocab: => DataFrame,
      rounds: Int = bpeRounds)
      : Seq[(Int, String, String, Long)] =
    PlanMemo.cachedValue(spark, s"text.bpeMerges:$key:$rounds") {
      // vocab is by-name: a memo HIT never touches the dictionary, so
      // w15 (which only needs the merge list) doesn't rebuild the
      // eager vocab frame after a cache eviction
      val dict = vocab
      val merges = scala.collection.mutable.ListBuffer
        .empty[(Int, String, String, Long)]
      var symExpr = "sym"
      for (round <- 1 to rounds) {
        val best = dict
          .select(col("freq"), split(expr(symExpr), " ").as("ss"))
          .filter(size(col("ss")) >= 2)
          .select(col("freq"), explode(expr(
            "transform(sequence(1, size(ss) - 1), " +
              "i -> concat(element_at(ss, i), ' ', element_at(ss, i + 1)))"))
            .as("pair"))
          .groupBy("pair").agg(sum("freq").as("cnt"))
          .orderBy(desc("cnt"), col("pair"))
          .limit(1).collect()
        require(best.nonEmpty,
          s"bpe training ran out of mergeable pairs at round $round")
        val pair = best(0).getString(0)
        val cnt = best(0).getLong(1)
        val Array(l, r) = pair.split(" ", 2)
        merges += ((round, l, r, cnt))
        symExpr = mergeReplaceExpr(symExpr, l, r)
      }
      merges.toList
    }

  /** The corpus's trained tokenizer as a PUBLISHED disk artifact —
    * the shape every real pipeline ships: train once, persist the
    * merge table, and have every consumer (batch encode, streaming
    * accounting, future sessions) load the FROZEN artifact instead of
    * re-training. Goes through [[PlanMemo.publishedParquet]], so the
    * artifact is keyed by the corpus content fingerprint (a mutated
    * corpus re-trains; an unchanged one re-reads) and a prior Verify
    * run's `bpe_merges` output is consumed as-is under
    * `SPARK_GRAFT_ARTIFACTS`. The driver-side value memo on top makes
    * repeat in-session loads free.
    */
  /** Decode + VALIDATE a published `bpe_merges` artifact. `None` when
    * the table does not carry the v2 config payload or any row's
    * (version, word pattern, vocab target, alphabet) differs from this
    * build's compile-time tokenizer configuration — the caller must
    * then RE-TRAIN rather than encode under a drifted tokenizer
    * (round-15 verdict "next" 6: a config drift was previously
    * undetectable because the artifact carried only the merge rows).
    */
  private[graft] def bpeArtifactDecode(
      df: DataFrame): Option[Seq[(Int, String, String, Long)]] = {
    val need = Set("round", "lhs", "rhs", "cnt",
      "fmt_version", "word_pattern", "vocab_target", "alphabet")
    if (!need.subsetOf(df.columns.toSet)) return None
    val rows = df.orderBy("round").collect()
    val configOk = rows.nonEmpty && rows.forall { r =>
      r.getAs[Int]("fmt_version") == bpeFormatVersion &&
        r.getAs[String]("word_pattern") == bpeWordPattern &&
        r.getAs[Int]("vocab_target") == bpeVocabTarget &&
        r.getAs[String]("alphabet") == bpeAlphabet
    }
    if (!configOk) None
    else Some(rows.map(r => (r.getAs[Int]("round"), r.getAs[String]("lhs"),
      r.getAs[String]("rhs"), r.getAs[Long]("cnt"))).toSeq)
  }

  private[graft] def bpeMerges(
      spark: SparkSession, dir: String): Seq[(Int, String, String, Long)] =
    // the memo key carries the corpus CONTENT fingerprint, not just
    // the dir: an in-session corpus mutation must fall through to
    // publishedParquet (whose own fingerprint keying re-trains) —
    // a dir-only key would serve the stale merge table from memory
    // and make the artifact invalidation unreachable
    PlanMemo.cachedValue(spark,
      s"text.bpeMergeArtifact:$dir:${PlanMemo.corpusFingerprint(dir)}") {
      val df = PlanMemo.publishedParquet(spark, dir, "bpe_merges") {
        val m = bpeMergesOn(spark, s"text:$dir", bpeVocab(spark, dir))
        import spark.implicits._
        m.toDF("round", "lhs", "rhs", "cnt")
          .withColumn("fmt_version", lit(bpeFormatVersion))
          .withColumn("word_pattern", lit(bpeWordPattern))
          .withColumn("vocab_target", lit(bpeVocabTarget))
          .withColumn("alphabet", lit(bpeAlphabet))
      }
      bpeArtifactDecode(df).getOrElse {
        // stale or config-mismatched artifact (e.g. a pre-v2 table
        // under SPARK_GRAFT_ARTIFACTS): refuse it and train fresh in
        // this session — mis-encoding under a drifted tokenizer is
        // the one failure a frozen-artifact pipeline must never have
        bpeMergesOn(spark, s"text:$dir:retrain", bpeVocab(spark, dir))
      }
    }

  /** t21 — BPE tokenizer training: learn merge rules from the corpus
    * until the vocabulary reaches [[bpeVocabTarget]] (the operation
    * behind every real tokenizer shipped with a trained model).
    * Output is the learned merge table (round, lhs, rhs, merged, cnt)
    * over byte symbols — small, deterministic, persisted as the
    * frozen tokenizer artifact ([[bpeMerges]]), and hash-gated
    * against a fully unrolled DuckDB twin.
    */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    val m = bpeMerges(spark, dir)
    import spark.implicits._
    m.map { case (round, l, r, cnt) => (round, l, r, l + r, cnt) }
      .toDF("round", "lhs", "rhs", "merged", "cnt")
      .orderBy("round")
  }

  /** Shared DuckDB spelling of the unrolled training chain. Every CTE
    * is `AS MATERIALIZED`: each `w{r-1}` is referenced twice (by
    * `p_r` and `w_r`), so default CTE inlining re-executes the whole
    * prefix chain per reference — 2^rounds base scans (minutes at
    * sf0.01, unbounded above). Materialization restores the linear
    * one-pass-per-round shape the engine executes. `word` rides the
    * w-chain untouched so t22 can join the fully-merged dictionary
    * back to documents; `lastWord` controls whether the final round
    * also rewrites the dictionary (t22) or only elects a pair (t21).
    */
  private def bpeChainCtes(lastWord: Boolean): String = {
    def pairCte(r: Int): String =
      s"""p$r AS MATERIALIZED (
         |  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(list_transform(range(1, len(ss)),
         |             i -> ss[i] || ' ' || ss[i+1])) AS pair, freq
         |    FROM (SELECT string_split(sym, ' ') AS ss, freq FROM w${r - 1}) s) p
         |  GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1
         |)""".stripMargin
    def wordCte(r: Int): String =
      s"""w$r AS MATERIALIZED (
         |  SELECT word, freq, trim(replace(' ' || sym || ' ',
         |    (SELECT ' ' || pair || ' ' FROM p$r),
         |    (SELECT ' ' || replace(pair, ' ', '') || ' ' FROM p$r))) AS sym
         |  FROM w${r - 1}
         |)""".stripMargin
    val ctes = (1 to bpeRounds).map { r =>
      if (r == bpeRounds && !lastWord) pairCte(r)
      else pairCte(r) + ", " + wordCte(r)
    }.mkString(", ")
    s"""words AS MATERIALIZED (
       |  SELECT word, COUNT(*) AS freq FROM (
       |    SELECT unnest(${bpeWordsSql("text")}) AS word FROM documents) t
       |  GROUP BY word
       |), w0 AS MATERIALIZED (
       |  SELECT word, freq, ${byteSymSql("word")} AS sym
       |  FROM words
       |), $ctes""".stripMargin
  }

  val bpeTrainSql: String = {
    val selects = (1 to bpeRounds).map { r =>
      s"""SELECT CAST($r AS INT) AS round, split_part(pair, ' ', 1) AS lhs,
         |  split_part(pair, ' ', 2) AS rhs, replace(pair, ' ', '') AS merged,
         |  cnt FROM p$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${bpeChainCtes(lastWord = false)}
       |$selects
       |ORDER BY round""".stripMargin
  }

  // ---------------------------------------------------------------
  /** Result of the driver-side trainer: the merge table, whether the
    * dictionary ran out of adjacent pairs before `rounds`, and the
    * corpus token totals (Σ freq·|symbols|) initially, after
    * `checkpointRound` merges, and at the end — the compression
    * accounting t25's bands check without ever re-encoding.
    */
  private[graft] final case class BpeDriverTrain(
      merges: List[(Int, String, String, Long)],
      exhausted: Boolean,
      tokensInitial: Long,
      tokensAtCheckpoint: Long,
      tokensFinal: Long)

  /** Production-scale BPE training (round-15 verdict "next" 1): the
    * classic in-memory trainer over the COLLECTED word-frequency
    * dictionary — the architecture every shipped tokenizer trainer
    * uses (Sennrich's subword-nmt and HuggingFace `tokenizers` both
    * count words distributed/streamed, then run the merge loop on the
    * in-memory dictionary). The Spark side contributes the one
    * corpus-sized pass ([[bpeVocab]]'s explode→groupBy, shuffle
    * O(distinct words)); this loop is O(dictionary), incremental, and
    * runs thousands of merges per second — vs the oracle-gated
    * [[bpeMergesOn]]'s one driver-paced Spark job PER ROUND, which is
    * correct but caps at [[bpeRounds]] by pacing and by the statically
    * unrolled DuckDB twin.
    *
    * EXACTLY the same contract as [[bpeMergesOn]] / TextBpeSpec's
    * `refBpe` (fuzz-pinned): pair counts weighted by word freq over
    * adjacent symbols (same-symbol runs count every overlapping
    * position), winner by (cnt DESC, "l r" ASC), and the merge applied
    * as the separator-consuming leftmost non-overlapping replace —
    * after a merge fires at position i, a new match may not begin at
    * i+2 (its leading separator was consumed by the replacement), the
    * exact `replace(' l r ', ' lr ')` semantics of the engine/oracle
    * spelling ([[mergeReplaceExpr]]).
    *
    * Incremental bookkeeping: a (cnt, pair) ordered set gives O(log P)
    * winner selection; each merge rescans ONLY the words containing
    * the winning pair (tracked per pair), so a round's cost is
    * proportional to the affected dictionary slice, not the
    * dictionary — sub-linear in rounds overall, the verdict's "done"
    * bar. At 100 TB the collected dictionary is bounded by df-pruning
    * (`spark.graft.bpeMinFreq` in [[bpeTrainLarge]]) — the standard
    * min-frequency cut every production trainer applies.
    */
  /** Separator-consuming leftmost non-overlapping merge application —
    * the ONE in-memory spelling of [[mergeReplaceExpr]]'s
    * `replace(' l r ', ' lr ')` contract, shared by the trainer's
    * rescans and the large-vocabulary encoder ([[bpeEncodeSymsLarge]]).
    * Returns the SAME array instance when no merge fires (callers use
    * the reference check to skip bookkeeping).
    */
  private[graft] def bpeApplyMerge(
      w: Array[String], l: String, r: String): Array[String] = {
    var found = false; var i = 0
    while (!found && i < w.length - 1) {
      if (w(i) == l && w(i + 1) == r) found = true
      i += 1
    }
    if (!found) return w
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    i = 0
    var justMerged = false
    while (i < w.length) {
      if (!justMerged && i < w.length - 1 && w(i) == l && w(i + 1) == r) {
        buf += l + r; justMerged = true; i += 2
      } else { buf += w(i); justMerged = false; i += 1 }
    }
    buf.toArray
  }

  /** Growable primitive int bag for the trainer's pair→words posting
    * lists (round-17, after the vstress measurement): the boxed
    * `mutable.Set[Int]` spelling dominated the 32k train's cost at
    * vocabulary stress (~28 GB peak heap / 588 s over 6.2M words —
    * SCALE.md). A bag is enough because the merge loop ALREADY
    * tolerates stale members (a word whose pair was destroyed rewrites
    * to itself) and duplicates collapse in [[drainSortedDistinct]], so
    * membership semantics are unchanged: appends on (+1) scans, no
    * removal on (−1) scans (removal was only an optimization), and the
    * bag resets when its pair is drained — the rescan of residual
    * holders re-appends exactly the current members.
    */
  private[graft] final class IntBag(initialCap: Int) {
    private var a = new Array[Int](math.max(4, initialCap))
    private var n = 0
    def add(v: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, a.length << 1)
      a(n) = v
      n += 1
    }
    /** Sorted distinct snapshot, then reset — ascending order, the
      * same iteration the set spelling's `.toArray.sorted` produced.
      */
    def drainSortedDistinct(): Array[Int] = {
      val s = java.util.Arrays.copyOf(a, n)
      java.util.Arrays.sort(s)
      var w = 0
      var i = 0
      while (i < s.length) {
        if (w == 0 || s(w - 1) != s(i)) { s(w) = s(i); w += 1 }
        i += 1
      }
      n = 0
      if (a.length > 64) a = new Array[Int](16)
      if (w == s.length) s else java.util.Arrays.copyOf(s, w)
    }
  }

  private[graft] def bpeTrainDriver(
      vocab: Seq[(Long, String)], rounds: Int,
      checkpointRound: Int = 0): BpeDriverTrain = {
    import scala.collection.mutable
    val freqs = vocab.map(_._1).toArray
    val words = vocab.map(_._2.split(" ")).toArray
    val cnt = mutable.HashMap.empty[String, Long]
    val where = mutable.HashMap.empty[String, IntBag]
    val queue = mutable.TreeSet.empty[(Long, String)](
      Ordering.by { case (c, p) => (-c, p) })
    def bump(p: String, delta: Long): Unit = {
      val old = cnt.getOrElse(p, 0L)
      if (old != 0L) queue.remove((old, p))
      val nw = old + delta
      if (nw != 0L) { cnt(p) = nw; queue.add((nw, p)); () }
      else { cnt.remove(p); () }
    }
    def scanWord(wi: Int, sign: Long): Unit = {
      val w = words(wi); val f = freqs(wi) * sign
      var i = 0
      while (i < w.length - 1) {
        val p = w(i) + " " + w(i + 1)
        bump(p, f)
        // posting membership: append-only (see IntBag — (−1) removal
        // was an optimization the stale-tolerant loop never needed)
        if (sign > 0) where.getOrElseUpdate(p, new IntBag(4)).add(wi)
        i += 1
      }
    }
    var wi0 = 0
    while (wi0 < words.length) { scanWord(wi0, 1L); wi0 += 1 }
    def total: Long = {
      var t = 0L; var j = 0
      while (j < words.length) { t += freqs(j) * words(j).length; j += 1 }
      t
    }
    def applyMerge(w: Array[String], l: String, r: String): Array[String] =
      bpeApplyMerge(w, l, r)
    val tokensInitial = total
    var tokensCk = if (checkpointRound == 0) tokensInitial else -1L
    val out = mutable.ListBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    var round = 1
    while (round <= rounds && !exhausted) {
      if (queue.isEmpty) exhausted = true
      else {
        val (c, p) = queue.head
        val sep = p.indexOf(' ')
        val (l, r) = (p.substring(0, sep), p.substring(sep + 1))
        out += ((round, l, r, c))
        // affected = words that held the pair at some point since this
        // pair's bag was last drained (a SUPERSET of current holders);
        // a stale member (pair since destroyed) rewrites to itself.
        // Draining resets the bag — the rescans below re-append the
        // residual holders (alternate-occurrence replace can leave the
        // same pair standing), so a later round's drain sees exactly
        // the live members plus whatever went stale in between.
        val affected = where.get(p).map(_.drainSortedDistinct())
          .getOrElse(Array.empty[Int])
        var k = 0
        while (k < affected.length) {
          val wi = affected(k)
          val w = words(wi)
          val nw = applyMerge(w, l, r)
          if (!(nw eq w)) {
            scanWord(wi, -1L)
            words(wi) = nw
            scanWord(wi, 1L)
          }
          k += 1
        }
        if (round == checkpointRound) tokensCk = total
        round += 1
      }
    }
    if (tokensCk < 0) tokensCk = total
    BpeDriverTrain(out.toList, exhausted, tokensInitial, tokensCk, total)
  }

  /** Vocabulary target for the production-scale trainer: 256 byte
    * symbols + 1000 merges. Unlike [[bpeVocabTarget]] this is NOT
    * bounded by an unrolled oracle — the t25 gate is the band set
    * below, each property pinned in TextBpeSpec (incl. exact
    * merge-table equality against the independent pure-Scala
    * reference at this rounds count).
    */
  val bpeLargeVocabTarget: Int = 1256

  /** t25 — PRODUCTION-SCALE BPE TRAINING: train the tokenizer to a
    * ≥1k-merge vocabulary ([[bpeLargeVocabTarget]]) with the
    * dictionary-collect architecture ([[bpeTrainDriver]]) and gate
    * the result's structure as bands:
    *   - vocab_reached: the merge table hit the target (or the
    *     dictionary was fully merged — impossible on realistic text);
    *   - prefix_agrees: the first [[bpeRounds]] merges EQUAL the
    *     oracle-hash-gated t21 artifact — the two trainers implement
    *     one contract, so the driver loop inherits t21's cross-engine
    *     gate on its prefix;
    *   - counts_nonincreasing: winning counts never rise (the BPE
    *     invariant TextBpeSpec proves);
    *   - wellformed: every merged symbol is a hex byte concatenation;
    *   - compression: corpus token totals strictly improve from 12 to
    *     1000 merges and never beat the byte floor.
    *
    * `spark.graft.bpeMinFreq` (default 1 = exact) df-prunes the
    * collected dictionary — at 100 TB the vocabulary tail is pruned
    * before collect exactly as production trainers do; the bands gate
    * runs unpruned.
    */
  /** The memoized production-vocabulary training result — t25's bands
    * and t27's encode both consume it, one train per (session, corpus,
    * minFreq).
    */
  private[graft] def bpeLargeTrain(
      spark: SparkSession, dir: String): BpeDriverTrain =
    bpeTrainAt(spark, dir, bpeLargeVocabTarget - 256, bpeRounds)

  /** One in-memory train at an arbitrary merge-rounds target,
    * memoized per (corpus, minFreq, rounds, checkpoint). The
    * dictionary collect reuses [[bpeVocab]]'s memoized corpus pass;
    * determinism does NOT depend on collect order (the pair queue
    * aggregates counts and tie-breaks on the pair string), which is
    * what makes the prefix bands exact: training to N merges and
    * training to M > N merges agree on the first N rules.
    */
  /** Driver dictionary budget (rows) for the in-memory trainer. The
    * default keeps the largest MEASURED-viable vocabulary-stress point
    * driver-side (SCALE.md: 14.05M distinct words trained exact at
    * 46.3 GB peak heap on a 128 GiB driver) with headroom; a pruned
    * dictionary above it — the 1e8-word web-vocabulary shape the
    * round-17 measurement declared driver-non-viable — delegates to
    * the executor-side trainer ([[BpeDist.train]]), which is pinned
    * bit-identical and keeps driver state O(distinct pairs). Same
    * size-gate pattern as the connected-components driver cut
    * (`Dedup.scala` `ccDriverMaxEdges`). Override with
    * `spark.graft.bpeMaxDriverDictRows` (0 forces delegation — how
    * the specs and the t33 gate exercise the distributed path on
    * small corpora).
    */
  val bpeMaxDriverDictRows: Long = 16000000L

  private[graft] def bpeTrainAt(
      spark: SparkSession, dir: String,
      rounds: Int, checkpointRound: Int): BpeDriverTrain = {
    val minFreq = spark.conf.get("spark.graft.bpeMinFreq", "1").toLong
    val budget = spark.conf.get("spark.graft.bpeMaxDriverDictRows",
      bpeMaxDriverDictRows.toString).toLong
    PlanMemo.cachedValue(spark,
      s"text.bpeLarge:$dir:${PlanMemo.corpusFingerprint(dir)}:$minFreq" +
        s":$rounds:$checkpointRound") {
      val pruned = bpeVocab(spark, dir)
        .filter(col("freq") >= minFreq)
        .select("freq", "sym")
      // one cheap count decides the path; the memoized result is
      // bit-identical either way (TextBpeSpec + t33 pin it), so the
      // memo key deliberately omits the budget
      if (pruned.count() <= budget) {
        val dict = pruned.collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq
        bpeTrainDriver(dict, rounds, checkpointRound = checkpointRound)
      } else {
        BpeDist.train(spark, pruned, rounds,
          checkpointRound = checkpointRound)
      }
    }
  }

  /** Vocabulary target for the PRODUCTION tokenizer: 256 byte symbols
    * + 32768 merges — the size real byte-level tokenizers ship
    * (32k–50k). The merge count is DATA-BOUNDED: every learned rule
    * must fire on ≥1 dictionary word and each application removes ≥1
    * symbol from the distinct-word dictionary, so
    * rounds ≤ Σ_vocab (word_bytes − 1). A corpus whose vocabulary is
    * smaller than the target trains to EXHAUSTION (every word fully
    * fused to one token) and the artifact carries the corpus's full
    * merge capacity — t30's band_vocab_reached accepts either
    * outcome, TextBpeSpec pins which one each fixture hits, and
    * SCALE.md banks the measured capacity per corpus class.
    */
  val bpeProdVocabTarget: Int = 256 + 32768

  /** The production-vocabulary (32k-merge-target) training result —
    * t30's bands and t31/t32's encodes all consume it; the compression
    * checkpoint sits at the 1k boundary so the band set compares the
    * production artifact against [[bpeLargeTrain]]'s.
    *
    * PUBLISHED as a versioned disk artifact (round-17: the 32k train
    * is minutes at vocabulary stress — a real pipeline trains once and
    * SHIPS the table, it never retrains per session): the
    * `bpe_merges_prod[_mfN]` parquet carries the v2 config payload
    * (version, word pattern, vocab target, alphabet) PLUS the training
    * `min_freq` and the train's token accounting, and
    * [[bpeProdArtifactDecode]] REFUSES any drift — including an
    * artifact trained under a DIFFERENT pruning regime, which would
    * otherwise silently change every fertility band downstream. The
    * artifact name itself is minFreq-suffixed so two pruning regimes
    * of one corpus never collide on disk.
    */
  private[graft] def bpeProdTrain(
      spark: SparkSession, dir: String): BpeDriverTrain = {
    val minFreq = spark.conf.get("spark.graft.bpeMinFreq", "1").toLong
    PlanMemo.cachedValue(spark,
      s"text.bpeProdArtifact:$dir:${PlanMemo.corpusFingerprint(dir)}" +
        s":$minFreq") {
      val name = if (minFreq == 1L) "bpe_merges_prod"
        else s"bpe_merges_prod_mf$minFreq"
      def payload(res: BpeDriverTrain): DataFrame = {
        import spark.implicits._
        res.merges.toDF("round", "lhs", "rhs", "cnt")
          .withColumn("fmt_version", lit(bpeFormatVersion))
          .withColumn("word_pattern", lit(bpeWordPattern))
          .withColumn("vocab_target", lit(bpeProdVocabTarget))
          .withColumn("alphabet", lit(bpeAlphabet))
          .withColumn("min_freq", lit(minFreq))
          .withColumn("exhausted", lit(res.exhausted))
          .withColumn("tokens_initial", lit(res.tokensInitial))
          .withColumn("tokens_checkpoint", lit(res.tokensAtCheckpoint))
          .withColumn("tokens_final", lit(res.tokensFinal))
      }
      def freshTrain(): BpeDriverTrain =
        bpeTrainAt(spark, dir, bpeProdVocabTarget - 256,
          bpeLargeVocabTarget - 256)
      val df = PlanMemo.publishedParquet(spark, dir, name)(
        payload(freshTrain()))
      bpeProdArtifactDecode(df, minFreq).getOrElse {
        // stale or config-mismatched artifact (a pre-upgrade table or
        // one trained under a different pruning regime staged via
        // SPARK_GRAFT_ARTIFACTS): refuse it, train fresh, and REPAIR
        // the published table so later sessions don't silently re-pay
        // the full train behind what looks like a shipped artifact. A
        // read-only staged mount can't be repaired — log so the
        // operator sees the stale mount.
        val res = freshTrain()
        if (PlanMemo.stagedArtifact(dir, name).isEmpty)
          PlanMemo.republishParquet(spark, dir, name)(payload(res))
        else
          org.slf4j.LoggerFactory.getLogger("graft.Text").warn(
            s"graft: refusing staged BPE artifact '$name' for $dir " +
              "(format/pruning-regime drift); trained fresh — repair " +
              "or remove the SPARK_GRAFT_ARTIFACTS mount")
        res
      }
    }
  }

  /** Decode + VALIDATE a published `bpe_merges_prod` artifact. `None`
    * when the table lacks the config payload or any row's (version,
    * word pattern, vocab target, alphabet, min_freq) differs from
    * this build's configuration and the requested pruning regime —
    * the caller must then RE-TRAIN rather than encode under a drifted
    * tokenizer (the [[bpeArtifactDecode]] contract, extended with the
    * training-time pruning knob).
    */
  private[graft] def bpeProdArtifactDecode(
      df: DataFrame, minFreq: Long): Option[BpeDriverTrain] = {
    // names AND types: a hand-staged artifact whose metadata columns
    // drifted (fmt_version stored as BIGINT, cnt as INT, ...) must
    // refuse like any other drift, not throw ClassCastException out
    // of the typed getters below — schema drift IS the stale-artifact
    // case this decoder exists to handle.
    import org.apache.spark.sql.types._
    val need: Map[String, DataType] = Map(
      "round" -> IntegerType, "lhs" -> StringType, "rhs" -> StringType,
      "cnt" -> LongType, "fmt_version" -> IntegerType,
      "word_pattern" -> StringType, "vocab_target" -> IntegerType,
      "alphabet" -> StringType, "min_freq" -> LongType,
      "exhausted" -> BooleanType, "tokens_initial" -> LongType,
      "tokens_checkpoint" -> LongType, "tokens_final" -> LongType)
    val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
    if (!need.forall { case (n, t) => have.get(n).contains(t) })
      return None
    val rows = df.orderBy("round").collect()
    val configOk = rows.nonEmpty && rows.forall { r =>
      r.getAs[Int]("fmt_version") == bpeFormatVersion &&
        r.getAs[String]("word_pattern") == bpeWordPattern &&
        r.getAs[Int]("vocab_target") == bpeProdVocabTarget &&
        r.getAs[String]("alphabet") == bpeAlphabet &&
        r.getAs[Long]("min_freq") == minFreq
    }
    if (!configOk) None
    else {
      val h = rows.head
      Some(BpeDriverTrain(
        rows.map(r => (r.getAs[Int]("round"), r.getAs[String]("lhs"),
          r.getAs[String]("rhs"), r.getAs[Long]("cnt"))).toList,
        h.getAs[Boolean]("exhausted"),
        h.getAs[Long]("tokens_initial"),
        h.getAs[Long]("tokens_checkpoint"),
        h.getAs[Long]("tokens_final")))
    }
  }

  def bpeTrainLarge(spark: SparkSession, dir: String): DataFrame = {
    val rounds = bpeLargeVocabTarget - 256
    val res = bpeLargeTrain(spark, dir)
    val artifact = bpeMerges(spark, dir)
    val m = res.merges
    val counts = m.map(_._4)
    import spark.implicits._
    Seq((
      m.length == rounds || res.exhausted,
      m.take(bpeRounds) == artifact.toList,
      counts.zip(counts.drop(1)).forall { case (a, b) => a >= b },
      m.forall { case (_, l, r, _) => (l + r).matches("^([0-9A-F]{2})+$") },
      res.tokensFinal < res.tokensAtCheckpoint &&
        res.tokensAtCheckpoint < res.tokensInitial &&
        res.tokensFinal >= 0L))
      .toDF("band_vocab_reached", "band_prefix_agrees",
        "band_counts_nonincreasing", "band_wellformed", "band_compression")
  }

  val bpeTrainLargeSql: String =
    """SELECT TRUE AS band_vocab_reached, TRUE AS band_prefix_agrees,
      |  TRUE AS band_counts_nonincreasing, TRUE AS band_wellformed,
      |  TRUE AS band_compression""".stripMargin

  // ---------------------------------------------------------------
  /** In-memory encode of ONE byte-symbol string under a frozen merge
    * list: fold every rule in rank order through [[bpeApplyMerge]] —
    * exactly the contract the 12-merge nested-replace chain
    * ([[bpeEncodeDict]]) compiles into SQL/Catalyst, at a vocabulary
    * size where a 1000-deep replace chain is not a sane expression.
    * Returns the token count.
    *
    * Rank-order single-pass application is ENOUGH (no fixpoint loop):
    * a rule (l, r) over pre-existing symbols can never become newly
    * applicable after a later merge — replacing a pair with a fused
    * symbol only creates adjacencies INVOLVING the fused symbol, and
    * any rule consuming a fused symbol was necessarily learned after
    * the rule that created it. TextBpeSpec fuzz-pins this equal to
    * the naive reference at 1000 rounds.
    *
    * The symbol-presence set makes skipping a non-firing rule O(1):
    * 1000 rules × a hash probe ≪ 1000 × an array scan — the
    * difference between micro- and milliseconds per dictionary word.
    * Stale entries (a symbol later consumed entirely) only cost a
    * redundant scan, never a wrong merge.
    */
  private[graft] def bpeEncodeSymsLargeArr(
      sym: String, rules: Array[(String, String)]): Array[String] = {
    var w = sym.split(" ")
    if (w.length <= 1) return w
    val present = scala.collection.mutable.HashSet.empty[String]
    var i = 0
    while (i < w.length) { present += w(i); i += 1 }
    var r = 0
    while (r < rules.length && w.length > 1) {
      val (l, rr) = rules(r)
      if (present.contains(l) && present.contains(rr)) {
        val nw = bpeApplyMerge(w, l, rr)
        if (!(nw eq w)) { w = nw; present += l + rr }
      }
      r += 1
    }
    w
  }

  private[graft] def bpeEncodeSymsLarge(
      sym: String, rules: Array[(String, String)]): Int =
    bpeEncodeSymsLargeArr(sym, rules).length

  /** Pair → ASCENDING rank list for [[bpeEncodeSymsRank]]. Built ONCE
    * per partition (broadcast ships the rules array; the map is a
    * local rebuild) — at 32k rules the map is ~MBs and amortizes over
    * the partition's dictionary slice. A LIST per pair, not a single
    * rank: the engine's merge pass is the alternate-occurrence
    * separator-consuming replace (see mergeReplaceExpr), which can
    * leave residual occurrences of a just-merged pair in the
    * dictionary ("61 61 61 61" → "6161 61 61"), so the SAME pair can
    * win again at a later round and trained tables genuinely contain
    * duplicate pairs at distinct ranks.
    */
  private[graft] def bpeRankOf(rules: Array[(String, String)])
      : scala.collection.mutable.AnyRefMap[String, Array[Int]] = {
    // accumulate in buffers, convert once: Array ':+' per duplicate
    // would be O(d²) reallocation per duplicated pair key — this map
    // is rebuilt per partition against 32k+ rule tables
    val bufs = new scala.collection.mutable.AnyRefMap[
      String, scala.collection.mutable.ArrayBuffer[Int]](rules.length * 2)
    var i = 0
    while (i < rules.length) {
      val k = rules(i)._1 + " " + rules(i)._2
      bufs.getOrElseUpdate(
        k, new scala.collection.mutable.ArrayBuffer[Int](1)) += i
      i += 1
    }
    val m = new scala.collection.mutable.AnyRefMap[String, Array[Int]](
      rules.length * 2)
    bufs.foreach { case (k, b) => m(k) = b.toArray }
    m
  }

  /** PRODUCTION-SHAPE encode of one byte-symbol string: the rank-map
    * BPE encode shipped tokenizers use, spelled to be EXACTLY the
    * rank-ordered fold [[bpeEncodeSymsLargeArr]] computes. A rank
    * CURSOR enforces the fold's contract — each rule applies at most
    * once, in rank order: each step finds the lowest-rank pair
    * present in the word at rank ≥ cursor, applies it (one
    * alternate-occurrence pass, like the fold), and advances the
    * cursor past it. Skipping straight to the lowest PRESENT rank is
    * sound because a skipped rule's pair was absent at the moment the
    * fold would have evaluated it (no rule fired in between), and the
    * fold never revisits a passed rule — TextBpeSpec fuzz-pins the
    * two equal, including on run-heavy words where the same pair
    * holds multiple ranks. The win is the work bound: O(|word|²)
    * rank-map probes per word instead of O(rules) — at 32k rules the
    * fold's per-word rule sweep (even with the symbol-presence skip)
    * costs 32k probes/word, the rank encode ~100, independent of
    * vocabulary size. That ~300× is the difference between the
    * 50k-rule encode being a dictionary-sized flea or the job's
    * dominant term.
    */
  private[graft] def bpeEncodeSymsRank(
      sym: String, rules: Array[(String, String)],
      rank: scala.collection.Map[String, Array[Int]]): Array[String] = {
    var w = sym.split(" ")
    var cursor = 0
    var cont = w.length > 1
    while (cont) {
      var best = Int.MaxValue
      var i = 0
      while (i < w.length - 1) {
        val rs = rank.getOrElse(w(i) + " " + w(i + 1), null)
        if (rs != null) {
          // first rank ≥ cursor in the (tiny, ascending) list
          var j = 0
          while (j < rs.length && rs(j) < cursor) j += 1
          if (j < rs.length && rs(j) < best) best = rs(j)
        }
        i += 1
      }
      if (best == Int.MaxValue) cont = false
      else {
        w = bpeApplyMerge(w, rules(best)._1, rules(best)._2)
        cursor = best + 1
        cont = w.length > 1
      }
    }
    w
  }

  /** The production-vocabulary encode dictionary — (word, ntok_large)
    * under the [[bpeLargeTrain]] merge table. The rules ship as ONE
    * broadcast (vocab-target-sized: 1k here, 50k in production — KBs
    * either way) and each DICTIONARY row encodes in-executor via
    * [[bpeEncodeSymsLarge]]. This is the one place in the text family
    * where a typed map replaces a Catalyst expression, and it is
    * deliberate: the work is per-DISTINCT-WORD (corpus-vocabulary-
    * sized, like t22's dictionary — never per token or per document),
    * and a 1000-rule merge chain cannot be spelled as a sane
    * expression tree (the 12-rule chain is one and stays).
    */
  private[graft] def bpeEncodeLargeDict(
      spark: SparkSession, dir: String): DataFrame =
    bpeEncodeDictUnder(spark, dir, bpeLargeTrain(spark, dir), "ntok_large")

  /** (word, <colName>) under an arbitrary frozen merge table, via the
    * rank-map encode ([[bpeEncodeSymsRank]]): rules ship as ONE
    * broadcast, the rank map rebuilds once per PARTITION
    * (mapPartitions, not map — at 32k rules a per-row rebuild would
    * dwarf the encode itself), each dictionary row encodes
    * in-executor. Work is per DISTINCT word — vocabulary-sized,
    * never per token or per document.
    */
  private[graft] def bpeEncodeDictUnder(
      spark: SparkSession, dir: String, res: BpeDriverTrain,
      colName: String): DataFrame = {
    val rules = res.merges.map { case (_, l, r, _) => (l, r) }.toArray
    val bc = spark.sparkContext.broadcast(rules)
    val s = spark
    import s.implicits._
    bpeVocab(spark, dir).select("word", "sym").as[(String, String)]
      .mapPartitions { it =>
        val rl = bc.value
        val rank = bpeRankOf(rl)
        it.map { case (w, sym) =>
          (w, bpeEncodeSymsRank(sym, rl, rank).length)
        }
      }
      .toDF("word", colName)
  }

  /** t27 — ENCODE UNDER THE PRODUCTION-SIZE VOCABULARY: the loop t25
    * left open — training now reaches a ≥1k-merge vocabulary, so the
    * corpus must also ENCODE under it. Engine path: the broadcast-
    * rules dictionary encode above; accounting: one corpus word pass
    * (the t22 shape) joined to BOTH dictionaries (12-merge and
    * 1000-merge), aggregated per language.
    *
    * Bands (constant-TRUE oracle, each earned in TextBpeSpec):
    *   - word_bounds: every dictionary word encodes to 1 ≤ n ≤ its
    *     byte length, and never MORE tokens than under the 12-merge
    *     prefix (rules only ever fuse — and the first 12 applications
    *     are identical, band_prefix_agrees in t25);
    *   - per_lang_improved: every language's corpus token total
    *     strictly drops from the 12-merge to the 1000-merge
    *     vocabulary (the fertility win a bigger vocab exists to buy);
    *   - nonempty: the dictionary is not degenerate.
    */
  def bpeEncodeLarge(spark: SparkSession, dir: String): DataFrame = {
    val dictL = bpeEncodeLargeDict(spark, dir)
    val dict12 = bpeEncodeDict(bpeMerges(spark, dir), bpeVocab(spark, dir))
    val both = PlanMemo.cached(spark, s"text.bpeBothDicts:$dir")(
      bpeVocab(spark, dir)
        .withColumn("n_bytes", length(regexp_replace(col("sym"), " ", "")) / 2)
        .join(dictL.hint("shuffle_hash"), "word")
        .join(dict12.hint("shuffle_hash"), "word"))
    bpeEncodeBands(spark, dir, both, "ntok_large", "ntok",
      improvedRequired = true)
  }

  /** t27/t31's shared band computation — same restructuring rationale
    * as [[bpeIdsBands]]: word-bounds violations + nonempty fuse into
    * ONE aggregation over the cached dictionary pair (was a count
    * plus a separate limit(1).count()), run concurrently with the
    * per-language corpus accounting pass ([[Par.jobs]]). Band VALUES
    * unchanged.
    */
  private[graft] def bpeEncodeBands(
      spark: SparkSession, dir: String, both: DataFrame,
      newCol: String, refCol: String, improvedRequired: Boolean)
      : DataFrame = {
    val violF = () => {
      val r = both.agg(
        sum(when(col(newCol) < 1 || col(newCol) > col("n_bytes") ||
          col(newCol) > col(refCol), 1L).otherwise(0L)).as("viol"),
        count(lit(1)).as("nw")).head()
      (r.getLong(0), r.getLong(1))
    }
    val perLangF = () => Tables.documents(spark, dir)
      .select(col("lang"), explode(bpeWords(col("text"))).as("word"))
      .groupBy("lang", "word").agg(count(lit(1)).as("cnt"))
      .join(both.hint("shuffle_hash"), "word")
      .groupBy("lang").agg(
        sum(col("cnt") * col(newCol)).as("tl"),
        sum(col("cnt") * col(refCol)).as("tref"))
      .collect()
    // NO eager count() on `both` here (measured, round 19): its build
    // is a cheap expression-only dictionary join, and a serial
    // materialization pass cost MORE than the two jobs racing on it
    // (t27 solo @32: 1.71 s racing vs 1.87 s with count(); @8 0.88 vs
    // 1.32) — the cachedEager discipline pays off only when the
    // shared build is expensive (bpeIdsBands' rank-encode dict).
    val res = Par.jobs[Any](violF, perLangF)
    val (viol, nWords) = res(0).asInstanceOf[(Long, Long)]
    val perLang = res(1).asInstanceOf[Array[org.apache.spark.sql.Row]]
    import spark.implicits._
    Seq((
      viol == 0L,
      perLang.nonEmpty &&
        (!improvedRequired ||
          perLang.forall(r => r.getLong(1) < r.getLong(2))),
      nWords > 0L))
      .toDF("band_word_bounds", "band_per_lang_improved", "band_nonempty")
  }

  val bpeEncodeLargeSql: String =
    """SELECT TRUE AS band_word_bounds, TRUE AS band_per_lang_improved,
      |  TRUE AS band_nonempty""".stripMargin

  // ---------------------------------------------------------------
  /** The id dictionary under the PRODUCTION vocabulary — (word, ids,
    * rt_ok, n): each distinct corpus word's ordered token-id sequence
    * under the [[bpeLargeTrain]] merge table, t24's id layout at the
    * 1k scale (byte b → id b; merge rule r → 255 + r, EARLIEST rule
    * on fused-string ties), plus an in-executor ROUNDTRIP verdict —
    * the ids decoded back through the inverse vocabulary must
    * reproduce the word's exact byte sequence. Typed map like
    * [[bpeEncodeLargeDict]] (a 1000-deep merge chain is not a sane
    * expression tree); work is per DISTINCT word, vocabulary-sized.
    */
  private[graft] def bpeIdsLargeDict(
      spark: SparkSession, dir: String): DataFrame =
    bpeIdsDictUnder(spark, dir, bpeLargeTrain(spark, dir))

  /** The id dictionary under an arbitrary frozen merge table (see
    * [[bpeIdsLargeDict]] for the layout contract). Rank-map encode,
    * one broadcast, per-partition rank rebuild — the same
    * production-shape plumbing as [[bpeEncodeDictUnder]].
    */
  private[graft] def bpeIdsDictUnder(
      spark: SparkSession, dir: String, res: BpeDriverTrain): DataFrame = {
    val rules = res.merges.map { case (_, l, r, _) => (l, r) }.toArray
    val idOf = res.merges
      .groupBy { case (_, l, r, _) => l + r }
      .view.mapValues(_.map(m => 255 + m._1).min).toMap
    val fusedByRound = res.merges
      .map { case (r, l, rr, _) => (255 + r, l + rr) }.toMap
    val bc = spark.sparkContext.broadcast((rules, idOf, fusedByRound))
    val s = spark
    import s.implicits._
    bpeVocab(spark, dir).select("word", "sym").as[(String, String)]
      .mapPartitions { it =>
        val (rl, io, fb) = bc.value
        val rank = bpeRankOf(rl)
        it.map { case (w, sym) =>
          val syms = bpeEncodeSymsRank(sym, rl, rank)
          val ids = syms.map(sm =>
            io.getOrElse(sm, Integer.parseInt(sm, 16)))
          // roundtrip: re-render each id's byte symbol and compare to
          // the word's own hex split — exact invertibility, per word
          val hex = ids.map(i =>
            if (i >= 256) fb(i) else f"$i%02X").mkString
          (w, ids, hex == sym.replace(" ", ""), ids.length)
        }
      }
      .toDF("word", "ids", "rt_ok", "n")
  }

  /** t29 — TOKEN-ID SEQUENCES UNDER THE PRODUCTION VOCABULARY: the
    * id-level product t27 only counts — what training shards would
    * carry once the 1k tokenizer ships. Not SQL-expressible (the
    * 1k-merge chain has no writable oracle — the t25 constraint), so
    * the driver gate is the band set, each property exact and
    * engine-verified over the FULL corpus vocabulary:
    *   - band_roundtrip: every distinct word's ids decode back to its
    *     exact byte sequence through the inverse vocabulary (0
    *     violations — id assignment is invertible at vocab scale);
    *   - band_counts_agree: id-sequence lengths equal t27's encode
    *     counts word-for-word, and every id is in [0, vocab);
    *   - band_docs_not_longer: every document's token total under the
    *     1k vocabulary is ≤ its 12-merge total (merges only fuse);
    *   - band_conservation: the corpus total summed per document
    *     equals the dictionary-side Σ cnt·|ids| (the two groupings of
    *     one encode agree);
    *   - band_nonempty.
    * TextBpeSpec pins the id layout (earliest-rule ties, base-byte
    * ids) and the symbol stream is already fuzz-pinned against the
    * naive per-rule fold; [[bpeDecode]] hash-gates the same layout
    * cross-engine at the 12-merge scale.
    *
    * Scale shape: every check is a dictionary-sized join or a
    * doc-keyed integer aggregation — no id arrays ever shuffle.
    */
  def bpeIdsLarge(spark: SparkSession, dir: String): DataFrame = {
    val dict = PlanMemo.cached(spark, s"text.idsLargeDict:$dir")(
      bpeIdsLargeDict(spark, dir))
    bpeIdsBands(spark, dir, dict,
      bpeEncodeLargeDict(spark, dir), "ntok_large",
      bpeEncodeDict(bpeMerges(spark, dir), bpeVocab(spark, dir)), "ntok",
      bpeLargeVocabTarget)
  }

  /** t29/t32's shared band computation, restructured for job shape
    * (optimization guide §1.2: remove redundant passes before tuning
    * anything else). The original spelling ran FIVE sequential
    * actions, recomputing the (doc_id, word, cnt) explode twice and
    * the per-doc totals join twice; here
    *   - rt violations + count mismatches + nonempty fuse into ONE
    *     aggregation over the id dictionary (left join keeps every
    *     dict row exactly once — cmpDict is word-unique by
    *     construction — and the isNotNull guard reproduces the inner
    *     join's "only compared rows can violate" counting);
    *   - docs-not-longer + the doc-side conservation total fuse into
    *     ONE aggregation over ONE per-doc pass (was a count plus a
    *     separate sum re-executing the whole explode+join chain);
    *   - the dictionary-side conservation total stays its own pass —
    *     the band's SEMANTIC is that two independent groupings of the
    *     encode agree, so the two sides must not share a plan.
    * The three remaining actions are independent, so they run as
    * concurrent jobs ([[Par.jobs]], guide §2.6) sharing the cached
    * dict via per-block locks. Band VALUES are unchanged — the same
    * rows are counted by the same predicates, grouped the same way.
    */
  private[graft] def bpeIdsBands(
      spark: SparkSession, dir: String, dict: DataFrame,
      cmpDict: DataFrame, cmpCol: String,
      refDict: DataFrame, refCol: String, vocabBound: Int): DataFrame = {
    val docw = Tables.documents(spark, dir)
      .select(col("doc_id"), explode_outer(bpeWords(col("text"))).as("word"))
      .filter(col("word").isNotNull)
      .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
    val dictAggF = () => {
      val r = dict.join(cmpDict.hint("shuffle_hash"), Seq("word"), "left")
        .agg(
          sum(when(!col("rt_ok"), 1L).otherwise(0L)).as("v_rt"),
          sum(when(col(cmpCol).isNotNull &&
            (col("n") =!= col(cmpCol) ||
              expr(s"exists(ids, i -> i < 0 OR i >= $vocabBound)")), 1L)
            .otherwise(0L)).as("v_cnt"),
          count(lit(1)).as("nw")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val perDocF = () => {
      val r = docw
        .join(dict.select("word", "n").hint("shuffle_hash"), "word")
        .join(refDict.hint("shuffle_hash"), "word")
        .groupBy("doc_id").agg(
          sum(col("cnt") * col("n")).as("tids"),
          sum(col("cnt") * col(refCol)).as("tref"))
        .agg(
          sum(when(col("tids") > col("tref"), 1L).otherwise(0L)).as("v_long"),
          sum("tids").as("doc_total")).head()
      (r.getLong(0), r.getLong(1))
    }
    val dictTotalF = () => docw.groupBy("word").agg(sum("cnt").as("c"))
      .join(dict.select("word", "n").hint("shuffle_hash"), "word")
      .agg(sum(col("c") * col("n"))).head().getLong(0)
    // materialize the SHARED cached id dictionary before the fan-out
    // (Par.jobs contract / PlanMemo.cachedEager's doc): all three jobs
    // consume `dict`, and racing on its persisted-but-unmaterialized
    // relation made each job recompute the whole 1k-merge rank-encode
    // build itself — the r18 driver leg's t29 anti-scaling at 32 cores.
    dict.count()
    val res = Par.jobs[Any](dictAggF, perDocF, dictTotalF)
    val (violRt, violCounts, nWords) =
      res(0).asInstanceOf[(Long, Long, Long)]
    val (violLonger, docTotal) = res(1).asInstanceOf[(Long, Long)]
    val dictTotal = res(2).asInstanceOf[Long]
    val s = spark
    import s.implicits._
    Seq((violRt == 0L, violCounts == 0L, violLonger == 0L,
      docTotal == dictTotal, nWords > 0L))
      .toDF("band_roundtrip", "band_counts_agree", "band_docs_not_longer",
        "band_conservation", "band_nonempty")
  }

  val bpeIdsLargeSql: String =
    """SELECT TRUE AS band_roundtrip, TRUE AS band_counts_agree,
      |  TRUE AS band_docs_not_longer, TRUE AS band_conservation,
      |  TRUE AS band_nonempty""".stripMargin

  // ---------------------------------------------------------------
  /** t30 — PRODUCTION-SIZE (32k) BPE TRAINING: [[bpeProdTrain]] runs
    * the same in-memory trainer to [[bpeProdVocabTarget]] (256 +
    * 32768 — the size shipped tokenizers actually use) and the bands
    * gate the artifact's structure:
    *   - vocab_reached: 32768 merges OR dictionary exhaustion (the
    *     data bound — see [[bpeProdVocabTarget]]; the driver corpora
    *     exhaust, the GenData `rich` ladder classes train tens of
    *     thousands of real merges, SCALE.md banks each capacity);
    *   - prefix_1k_agrees: the first |1k-table| merges EQUAL
    *     [[bpeLargeTrain]]'s full table — training is prefix-stable,
    *     so the production artifact inherits the 1k table's gate,
    *     which itself inherits t21's cross-engine hash gate on ITS
    *     12-merge prefix (a 3-level pin chain to the DuckDB oracle);
    *   - counts_nonincreasing / wellformed: as t25;
    *   - compression: the corpus token total strictly improves past
    *     the 1k checkpoint iff training actually proceeded past it,
    *     and the checkpoint strictly improves on the byte floor.
    */
  def bpeTrainProd(spark: SparkSession, dir: String): DataFrame = {
    val res = bpeProdTrain(spark, dir)
    val large = bpeLargeTrain(spark, dir)
    val m = res.merges
    val counts = m.map(_._4)
    val past = m.length > large.merges.length
    import spark.implicits._
    Seq((
      m.length == bpeProdVocabTarget - 256 || res.exhausted,
      m.take(large.merges.length) == large.merges,
      counts.zip(counts.drop(1)).forall { case (a, b) => a >= b },
      m.forall { case (_, l, r, _) => (l + r).matches("^([0-9A-F]{2})+$") },
      (if (past) res.tokensFinal < res.tokensAtCheckpoint
       else res.tokensFinal == res.tokensAtCheckpoint) &&
        res.tokensAtCheckpoint < res.tokensInitial &&
        res.tokensFinal >= 0L))
      .toDF("band_vocab_reached", "band_prefix_1k_agrees",
        "band_counts_nonincreasing", "band_wellformed",
        "band_compression")
  }

  val bpeTrainProdSql: String =
    """SELECT TRUE AS band_vocab_reached, TRUE AS band_prefix_1k_agrees,
      |  TRUE AS band_counts_nonincreasing, TRUE AS band_wellformed,
      |  TRUE AS band_compression""".stripMargin

  /** t31 — ENCODE UNDER THE PRODUCTION (32k) VOCABULARY: the corpus
    * encode under [[bpeProdTrain]], compared per word and per
    * language against the 1k vocabulary's encode (exactly how t27
    * compares 1k against the 12-merge prefix). Bands:
    *   - word_bounds: every dictionary word encodes to
    *     1 ≤ n ≤ byte length, and never MORE tokens than under the
    *     1k table (the first 1k rules are identical — prefix_1k
    *     band in t30 — and further rules only fuse);
    *   - per_lang_improved: every language's corpus token total
    *     strictly drops 1k → 32k WHEN the production table actually
    *     extends the 1k table (on a corpus whose capacity is below
    *     1k merges the two artifacts coincide and the band is
    *     vacuously green — TextBpeSpec pins both regimes);
    *   - nonempty.
    */
  def bpeEncodeProd(spark: SparkSession, dir: String): DataFrame = {
    val resP = bpeProdTrain(spark, dir)
    val resL = bpeLargeTrain(spark, dir)
    val both = PlanMemo.cached(spark, s"text.prodBothDicts:$dir")(
      bpeVocab(spark, dir)
        .withColumn("n_bytes", length(regexp_replace(col("sym"), " ", "")) / 2)
        .join(bpeEncodeDictUnder(spark, dir, resP, "ntok_prod")
          .hint("shuffle_hash"), "word")
        .join(bpeEncodeDictUnder(spark, dir, resL, "ntok_1k")
          .hint("shuffle_hash"), "word"))
    val extended = resP.merges.length > resL.merges.length
    bpeEncodeBands(spark, dir, both, "ntok_prod", "ntok_1k",
      improvedRequired = extended)
  }

  val bpeEncodeProdSql: String =
    """SELECT TRUE AS band_word_bounds, TRUE AS band_per_lang_improved,
      |  TRUE AS band_nonempty""".stripMargin

  /** t32 — TOKEN-ID SEQUENCES UNDER THE PRODUCTION (32k) VOCABULARY:
    * t29's band set re-gated under [[bpeProdTrain]] — the id product
    * a real 32k tokenizer would hand the shard packer. Same checks,
    * same scale shape (dictionary-sized joins + doc-keyed integer
    * aggregation, id arrays never shuffle); band_docs_not_longer
    * compares against the 1k vocabulary's per-doc totals and the id
    * range bound uses the artifact's ACTUAL vocabulary size
    * (256 + merges learned), tighter than the target.
    */
  def bpeIdsProd(spark: SparkSession, dir: String): DataFrame = {
    val resP = bpeProdTrain(spark, dir)
    val resL = bpeLargeTrain(spark, dir)
    val vocabSize = 256 + resP.merges.length
    val dict = PlanMemo.cached(spark, s"text.idsProdDict:$dir")(
      bpeIdsDictUnder(spark, dir, resP))
    bpeIdsBands(spark, dir, dict,
      bpeEncodeDictUnder(spark, dir, resP, "ntok_prod"), "ntok_prod",
      bpeEncodeDictUnder(spark, dir, resL, "ntok_1k"), "ntok_1k",
      vocabSize)
  }

  val bpeIdsProdSql: String =
    """SELECT TRUE AS band_roundtrip, TRUE AS band_counts_agree,
      |  TRUE AS band_docs_not_longer, TRUE AS band_conservation,
      |  TRUE AS band_nonempty""".stripMargin

  /** The encode dictionary (word → token count under the learned
    * merges): the full merge chain re-spelled as one nested-replace
    * expression over the memoized vocabulary — vocabulary-sized work,
    * never a corpus pass. Takes the FROZEN merge list (the published
    * artifact at corpus level; fixture merges in TextBpeSpec) — the
    * encode side never trains.
    */
  private[graft] def bpeEncodeDict(
      merges: Seq[(Int, String, String, Long)],
      vocab: DataFrame): DataFrame = {
    val symFinal = merges
      .foldLeft("sym") { case (e, (_, l, r, _)) => mergeReplaceExpr(e, l, r) }
    vocab.select(col("word"),
      expr(s"size(split($symFinal, ' '))").as("ntok"))
  }

  /** The frozen tokenizer as ONE map-side expression over a word
    * column: byte-split via hex/regexp_replace (codegen string ops —
    * no interpreted array HOF in the per-occurrence path) then the
    * merge chain, returning the word's token count. The
    * per-OCCURRENCE spelling w15 needs at ingest, where t22's
    * per-DISTINCT-WORD dictionary join is the batch-side optimum;
    * TextBpeSpec pins the two spellings equal over the whole corpus
    * vocabulary.
    */
  private[graft] def bpeNtokExpr(
      merges: Seq[(Int, String, String, Long)], wordCol: String): String = {
    val base =
      s"trim(regexp_replace(hex(encode($wordCol, 'UTF-8')), '(..)', '$$1 '))"
    val chain = merges.foldLeft(base) { case (e, (_, l, r, _)) =>
      mergeReplaceExpr(e, l, r)
    }
    s"size(split($chain, ' '))"
  }

  /** The chain plus the final encode dictionary (word → ntok), shared
    * by the t22 and w15 oracles.
    */
  private[graft] def bpeDictCteSql: String =
    s"""${bpeChainCtes(lastWord = true)},
       |dict AS (
       |  SELECT word, len(string_split(sym, ' ')) AS ntok FROM w$bpeRounds
       |)""".stripMargin

  /** t22 — BPE ENCODE / token accounting: apply the FROZEN trained
    * tokenizer ([[bpeMerges]] — the published artifact) to the corpus
    * and report each document's word and token counts — the
    * token-budget accounting pass every training pipeline runs before
    * mixing data. The encode itself touches the corpus exactly once,
    * as a (doc_id, word)-distinct count stream joined to the
    * vocabulary-sized dictionary.
    *
    * Scale shape: per-doc word counts partial-aggregate before the
    * join (bounded by distinct words per doc, not tokens); the
    * dictionary is corpus-vocabulary-sized and unbounded at 100 TB,
    * so both joins are shuffle_hash, never broadcast. All-integer
    * output — no rounding discipline needed.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val dict = bpeEncodeDict(bpeMerges(spark, dir), bpeVocab(spark, dir))
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode_outer(bpeWords(col("text"))).as("word"))
      .filter(col("word").isNotNull)
      .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
      .join(dict.hint("shuffle_hash"), "word")
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_words"),
        sum(col("cnt") * col("ntok")).as("n_tokens"))
    Tables.documents(spark, dir).select("doc_id")
      .join(perDoc.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      .orderBy("doc_id")
  }

  val bpeEncodeSql: String =
    s"""WITH $bpeDictCteSql, docw AS (
       |  SELECT doc_id, word, COUNT(*) AS cnt FROM (
       |    SELECT doc_id, unnest(${bpeWordsSql("text")}) AS word
       |    FROM documents) t
       |  GROUP BY doc_id, word
       |), enc AS (
       |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words,
       |    CAST(SUM(cnt * ntok) AS BIGINT) AS n_tokens
       |  FROM docw JOIN dict USING (word) GROUP BY doc_id
       |)
       |SELECT d.doc_id,
       |  COALESCE(n_words, 0) AS n_words,
       |  COALESCE(n_tokens, 0) AS n_tokens
       |FROM documents d LEFT JOIN enc USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** t24 — BPE TOKEN-ID SEQUENCES: the tokenizer's actual production
    * output — each document's ordered token-ID sequence under the
    * frozen trained tokenizer, reported as (n_tokens, md5 digest of
    * the comma-joined ids) so the gate stays row-per-doc while
    * pinning the ENTIRE sequence byte-for-byte. IDs follow the
    * production convention: base byte b → id b (0–255), merge rule r
    * → id 255+r (GPT-2's 256-bytes-then-merge-ranks layout). Two
    * merge rules CAN concatenate to the same symbol string (("AB","C")
    * and ("A","BC") both yield "ABC"); the symbol→id map takes the
    * EARLIEST rule, mirrored by the oracle's MIN(id) GROUP BY sym.
    *
    * Scale shape: the id derivation is vocabulary-sized (the t22
    * dictionary with an id-array column — the merge chain plus one
    * literal ≤[[bpeRounds]]-entry map lookup per symbol); documents
    * re-assemble order via posexplode → dictionary join →
    * collect_list(struct(pos, ids)) → array_sort → flatten — one
    * doc_id-keyed shuffle whose per-group size is one document's
    * tokens (bounded by definition). The dictionary join is
    * shuffle_hash: corpus vocabulary is unbounded at 100 TB.
    */
  /** The per-document token-ID SEQUENCES themselves — (doc_id, ids
    * array<int>), one row per document that has at least one word —
    * the actual training-data product t24 digests and p07 packs into
    * shards (round-15 verdict "next" 2). Pure plan builder (no
    * caching) so each consumer's physical plan is the one
    * PlanAuditSpec pins; the per-doc reassembly and the shuffle_hash
    * dictionary join are the t24 scale shape documented there.
    */
  private[graft] def bpeTokenIdSeqs(
      spark: SparkSession, dir: String): DataFrame =
    bpeTokenIdSeqsOn(spark, dir, Tables.documents(spark, dir))

  /** [[bpeTokenIdSeqs]] over an explicit document frame — e01's
    * pipeline tokenizes only its quality+dedup SURVIVORS, so the
    * corpus-sized token pass must run on the filtered frame, not be
    * filtered after the fact (at 100 TB tokenizing drop-outs is the
    * single largest avoidable cost in the composed plan).
    */
  private[graft] def bpeTokenIdSeqsOn(
      spark: SparkSession, dir: String, docs: DataFrame): DataFrame = {
    val merges = bpeMerges(spark, dir)
    val symFinal = merges
      .foldLeft("sym") { case (e, (_, l, r, _)) => mergeReplaceExpr(e, l, r) }
    val idPairs = merges
      .groupBy { case (_, l, r, _) => l + r }
      .view.mapValues(_.map(m => 255 + m._1).min)
      .toSeq.sortBy(_._2)
    val mapExpr = idPairs
      .map { case (s, id) => s"'$s', $id" }.mkString("map(", ", ", ")")
    val dict = bpeVocab(spark, dir).select(col("word"), expr(
      s"""transform(split($symFinal, ' '),
         |  s -> coalesce(element_at($mapExpr, s),
         |                CAST(conv(s, 16, 10) AS INT)))""".stripMargin)
      .as("ids"))
    docs
      .select(col("doc_id"),
        posexplode_outer(bpeWords(col("text"))).as(Seq("pos", "word")))
      .filter(col("word").isNotNull)
      .join(dict.hint("shuffle_hash"), "word")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("ids"))))
        .as("ent"))
      .select(col("doc_id"),
        expr("flatten(transform(ent, e -> e.ids))").as("ids"))
  }

  def bpeTokenIds(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = bpeTokenIdSeqs(spark, dir)
      .select(col("doc_id"), size(col("ids")).as("n_tokens"),
        md5(expr(
          "array_join(transform(ids, i -> CAST(i AS STRING)), ',')"))
          .as("ids_md5"))
    Tables.documents(spark, dir).select("doc_id")
      .join(perDoc.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0)).as("n_tokens"),
        coalesce(col("ids_md5"), md5(lit(""))).as("ids_md5"))
      .orderBy("doc_id")
  }

  /** The token-ID dictionary CTE chain — merge chain + symbol→id map
    * + per-word ordered id strings (`wids`: word, idstr, nids).
    * Shared by the t24 oracle and e02's shard oracle.
    */
  private[graft] val bpeIdDictCtesSql: String = {
    val rows = (1 to bpeRounds).map(r =>
      s"SELECT replace(pair, ' ', '') AS sym, 255 + $r AS id FROM p$r")
      .mkString("\n    UNION ALL ")
    s"""${bpeChainCtes(lastWord = true)}, mergeids AS MATERIALIZED (
       |  SELECT sym, MIN(id) AS id FROM (
       |    $rows) m
       |  GROUP BY sym
       |), wsym AS MATERIALIZED (
       |  SELECT word, unnest(string_split(sym, ' ')) AS s,
       |    generate_subscripts(string_split(sym, ' '), 1) AS i
       |  FROM w$bpeRounds
       |), wids AS MATERIALIZED (
       |  SELECT word,
       |    string_agg(CAST(COALESCE(m.id, CAST(('0x' || s) AS INT))
       |      AS VARCHAR), ',' ORDER BY i) AS idstr,
       |    COUNT(*) AS nids
       |  FROM wsym LEFT JOIN mergeids m ON m.sym = wsym.s
       |  GROUP BY word
       |)""".stripMargin
  }

  val bpeTokenIdsSql: String = {
    s"""WITH $bpeIdDictCtesSql, docw AS MATERIALIZED (
       |  -- MATERIALIZED throughout (the bpeChainCtes discipline):
       |  -- inlined, the optimizer fused the 50M-row occurrence
       |  -- stream, the dictionary join and the ordered string_agg
       |  -- into one pipeline that exceeded DuckDB's memory at the
       |  -- rich sf10 gate; staged, each step fits comfortably
       |  SELECT doc_id, unnest(${bpeWordsSql("text")}) AS word,
       |    generate_subscripts(${bpeWordsSql("text")}, 1) AS pos
       |  FROM documents
       |), docids AS MATERIALIZED (
       |  -- ordered string_agg, NOT flatten(list(ids ORDER BY pos)):
       |  -- nested per-doc id LISTS blew DuckDB's memory at the rich
       |  -- sf10 gate (500k docs / 27M ids); the comma-joined digest
       |  -- input is the same sequence built as flat strings
       |  SELECT doc_id, CAST(SUM(nids) AS INT) AS n_tokens,
       |    md5(string_agg(idstr, ',' ORDER BY pos)) AS ids_md5
       |  FROM docw JOIN wids USING (word)
       |  GROUP BY doc_id
       |)
       |SELECT d.doc_id,
       |  COALESCE(n_tokens, 0) AS n_tokens,
       |  COALESCE(ids_md5, md5('')) AS ids_md5
       |FROM documents d LEFT JOIN docids USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  /** t28 — BPE DECODE (the tokenizer roundtrip): reconstruct each
    * document's text from its t24 token-ID sequence under the frozen
    * artifact — the other half every shipped tokenizer has, and the
    * property that makes byte-level BPE byte-level: decode is exact,
    * not approximate. Decode inverts the id layout (id < 256 → that
    * byte; id 255+r → rule r's fused byte symbol), concatenates the
    * hex, and UTF-8-decodes the bytes. The gate is maximal: the
    * ORACLE never sees ids — DuckDB recomputes each document's
    * pre-token stream directly from raw `text`, so a full hash match
    * on the decoded STRINGS proves the entire chain (pre-tokenize →
    * byte split → 12-rule merge chain → earliest-rule id assignment →
    * inverse vocabulary → bytes → text) is lossless, cross-engine,
    * byte-for-byte. (Whitespace is not carried by the GPT-2-style
    * pre-tokenizer, so the roundtrip target is the word stream — the
    * exact content the ids encode.)
    *
    * Scale shape: t24's — the id derivation and the inverse
    * vocabulary are both artifact-sized; the only corpus pass is
    * [[bpeTokenIdSeqs]]'s (posexplode → shuffle_hash dictionary join
    * → per-doc reassembly), and decode itself is one codegen'd
    * transform/unhex/decode over the assembled array. The final
    * document join is shuffle_hash (doc-sized, unbounded at 100 TB).
    */
  def bpeDecode(spark: SparkSession, dir: String): DataFrame = {
    val merges = bpeMerges(spark, dir)
    val symFinal = merges
      .foldLeft("sym") { case (e, (_, l, r, _)) => mergeReplaceExpr(e, l, r) }
    val idPairs = merges
      .groupBy { case (_, l, r, _) => l + r }
      .view.mapValues(_.map(m => 255 + m._1).min)
      .toSeq.sortBy(_._2)
    val mapExpr = idPairs
      .map { case (s, id) => s"'$s', $id" }.mkString("map(", ", ", ")")
    // inverse vocabulary: merge id 255+r → rule r's fused hex symbol
    // (total on ids ≥ 256 by construction; base ids re-hex)
    val invMap = merges
      .map { case (r, l, rr, _) => s"${255 + r}, '${l + rr}'" }
      .mkString("map(", ", ", ")")
    // Decode runs per DISTINCT dictionary word (vocab-sized work):
    // word → ids (the t24 layout, earliest-rule id per symbol) →
    // inverse map → bytes → text. The per-document pass then only
    // REASSEMBLES short decoded strings — the first spelling ran the
    // id→hex transform HOF over every document's full id array
    // (interpreted-HOF cost per element; 5.9× at 10× data at gensf10,
    // vs ~3× for the t24-shaped reassembly alone).
    val dict = bpeVocab(spark, dir).select(col("word"), expr(
      s"""decode(unhex(array_join(transform(
         |  transform(split($symFinal, ' '),
         |    s -> coalesce(element_at($mapExpr, s),
         |                  CAST(conv(s, 16, 10) AS INT))),
         |  i -> coalesce(element_at($invMap, i),
         |                lpad(conv(i, 10, 16), 2, '0'))), '')),
         |'UTF-8')""".stripMargin).as("dec"))
    val decoded = Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode_outer(bpeWords(col("text"))).as(Seq("pos", "word")))
      .filter(col("word").isNotNull)
      .join(dict.hint("shuffle_hash"), "word")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("dec"))))
        .as("ent"))
      .select(col("doc_id"),
        expr("array_join(transform(ent, e -> e.dec), '')").as("decoded"))
    Tables.documents(spark, dir).select("doc_id")
      .join(decoded.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("decoded"), lit("")).as("decoded"))
      .orderBy("doc_id")
  }

  /** t28's oracle: the word stream straight off the raw text — no id
    * machinery at all, which is the point (see [[bpeDecode]]).
    */
  val bpeDecodeSql: String =
    s"""SELECT doc_id,
       |  array_to_string(${bpeWordsSql("text")}, '') AS decoded
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  /** t26 — TOKENIZER FERTILITY under the FROZEN t21 artifact
    * (round-15 verdict "next" 5, the t12 re-spelling): per-language
    * word/token/byte totals with bytes-per-token and tokens-per-word
    * (fertility) — the numbers tokenizer teams actually watch.
    * Byte-level BPE has no true OOV (t12's induced-vocab OOV rate is
    * the pre-BPE spelling), so coverage under the SHIPPED tokenizer
    * is compression: how many bytes each learned token carries per
    * language, and how many subword tokens a word fragments into.
    *
    * Scale shape: exactly t22's — per-(lang, word) counts
    * partial-aggregate before the vocabulary-sized dictionary join
    * (shuffle_hash: corpus vocabulary is unbounded at 100 TB), then a
    * lang-keyed aggregate of pure integer sums; the two ratios are
    * round4 doubles over those integers (aggregation-order
    * independent). The dictionary is [[bpeEncodeDict]] over the
    * published artifact — the same frozen-tokenizer spelling t22
    * (batch) and w15 (stream, via [[bpeNtokExpr]], spec-pinned equal)
    * consume.
    */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    val dict = bpeEncodeDict(bpeMerges(spark, dir), bpeVocab(spark, dir))
    Tables.documents(spark, dir)
      .select(col("lang"), explode_outer(bpeWords(col("text"))).as("word"))
      .filter(col("word").isNotNull)
      .groupBy("lang", "word").agg(count(lit(1)).as("cnt"))
      .join(dict.hint("shuffle_hash"), "word")
      .groupBy("lang")
      .agg(sum("cnt").as("n_words"),
        sum(col("cnt") * col("ntok")).as("n_tokens"),
        sum(col("cnt") * octet_length(col("word"))).as("n_bytes"))
      .select(col("lang"), col("n_words"), col("n_tokens"), col("n_bytes"),
        Exact.round4(col("n_bytes").cast("double") / col("n_tokens"))
          .as("bytes_per_token"),
        Exact.round4(col("n_tokens").cast("double") / col("n_words"))
          .as("tokens_per_word"))
      .orderBy("lang")
  }

  val tokenizerFertilitySql: String =
    s"""WITH $bpeDictCteSql, lw AS (
       |  SELECT lang, word, COUNT(*) AS cnt FROM (
       |    SELECT lang, unnest(${bpeWordsSql("text")}) AS word
       |    FROM documents) t
       |  GROUP BY lang, word
       |), agg AS (
       |  SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_words,
       |    CAST(SUM(cnt * ntok) AS BIGINT) AS n_tokens,
       |    CAST(SUM(cnt * strlen(word)) AS BIGINT) AS n_bytes
       |  FROM lw JOIN dict USING (word) GROUP BY lang
       |)
       |SELECT lang, n_words, n_tokens, n_bytes,
       |  ${Exact.round4Sql("CAST(n_bytes AS DOUBLE) / n_tokens")}
       |    AS bytes_per_token,
       |  ${Exact.round4Sql("CAST(n_tokens AS DOUBLE) / n_words")}
       |    AS tokens_per_word
       |FROM agg ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  /** Hashed-feature dimensionality for the learned quality classifier
    * (t23 + ml09) — the hashing-trick bucket count, shared by the
    * closed-form scorer and the spark.ml LogisticRegression twin.
    */
  val qcDim: Int = 4096

  /** Deterministic train/eval split for the classifier family:
    * doc_id % qcFolds == 0 is held out (never trained on); metrics
    * bands evaluate on the held-out fifth.
    */
  val qcFolds: Int = 5

  /** Teacher labels for the learned quality classifier: stopword
    * density at or above the exact corpus median — the
    * natural-language-likeness signal real quality classifiers
    * separate (Gopher/C4 treat adequate function-word density as the
    * strongest cheap "real text vs junk" feature), and the bootstrap
    * teacher a pipeline uses when no curated gold set exists. A
    * median split is balanced BY CONSTRUCTION at every corpus scale
    * (a fixed threshold degenerates as the vocabulary grows — the
    * t07 gate keeps 100% of this synthetic corpus). Median is the
    * exact interpolated percentile of round4 densities — both
    * engines interpolate lower + (upper − lower)·frac over identical
    * round4 doubles, so the label is bit-deterministic cross-engine.
    */
  private[graft] def qcLabels(spark: SparkSession, dir: String): DataFrame = {
    val st = Tables.documents(spark, dir)
      .withColumn("toks", tokens(lower(col("text"))))
      .select(col("doc_id"),
        Exact.round4(size(filter(col("toks"), t => t.isin(stopwords: _*)))
          .cast("double") / size(col("toks"))).as("st"))
    val med = st.agg(expr("percentile(st, 0.5)").as("med"))
    st.crossJoin(broadcast(med))
      .select(col("doc_id"), (col("st") >= col("med")).cast("int").as("y"))
  }

  /** Shared SQL CTE block: `labels` (doc_id, y) — the oracle twin of
    * [[qcLabels]].
    */
  private[graft] def qcLabelsCteSql: String =
    s"""qst AS (
       |  SELECT doc_id, ${Exact.round4Sql(
             s"len(list_filter(toks, t -> t IN ($stopwordsSqlList))) * 1.0 " +
               "/ len(toks)")} AS st
       |  FROM (SELECT doc_id, ${tokensSql("lower(text)")} AS toks
       |        FROM documents) t
       |), qmed AS (SELECT quantile_cont(st, 0.5) AS med FROM qst),
       |labels AS (
       |  SELECT doc_id, CAST(st >= med AS INT) AS y
       |  FROM qst CROSS JOIN qmed
       |)""".stripMargin

  /** Weight scale for the t23 classifier: class-conditional unigram
    * probabilities are held as integers in units of 1e-8. Overflow
    * audit: (cp+1)·1e8 needs cp < 9.2e10 — fine to ~1e10 training
    * tokens per class; beyond that (a true 100 TB single-model train)
    * drop the scale a decade or widen to DECIMAL.
    */
  val qcScale: Long = 100000000L

  /** t23 — LEARNED QUALITY CLASSIFIER (fastText-style linear scorer):
    * the standard pipeline stage between the heuristic gates
    * (t07/t17) and sampling (t18/d10) — a linear model over hashed
    * bag-of-words features scores EVERY document. The model is a
    * Rocchio/centroid-difference classifier: training is ONE
    * aggregation pass counting hashed-unigram occurrences per class
    * on the deterministic train split ([[qcLabels]] teacher), and
    * scoring is score(doc) = Σ_f n(doc,f)·w(f) with add-one-smoothed
    * class-conditional probability DIFFERENCES
    * w(f) = ⌊S·(cp+1)/(Sp+D)⌋ − ⌊S·(cn+1)/(Sn+D)⌋ (S = [[qcScale]]).
    * Measured on the held-out fifth this separates as well as the
    * ln-ratio Naive Bayes spelling (AUC 0.93–1.0 across sf0.001 →
    * GenData sf1 incl. the rich corpus) — and unlike ln weights it is
    * computable in PURE INTEGER arithmetic, so training AND scoring
    * are exactly DuckDB-replayable with no floating-point anywhere:
    * the ln spelling measurably flaked at GenData-sf1-rich on a
    * 1-ulp Java-vs-libm `ln` difference crossing a floor boundary.
    * The per-document outputs are HASH-gated like t18; the iterative
    * spark.ml LogisticRegression twin on the same features is ml09
    * (band-gated). Integer division is truncating in both engines
    * and every operand here is positive, so truncation == floor ==
    * identical.
    *
    * Features are md5-bucketed unigrams ([[fp64]] % [[qcDim]]) — the
    * cross-engine portable hash; a production run swaps in the
    * engine-native xxhash64 % D (cheaper per token, same semantics).
    * No prior term: the median-split teacher balances classes by
    * construction, and pred = score > 0 measures 0.64–0.98 held-out
    * accuracy without one.
    *
    * Scale shape: the token stream reduces map-side to (doc, f, n)
    * (≤ D distinct buckets per doc) before any join; per-class
    * feature counts partial-aggregate to ≤ D rows, so the WEIGHT
    * TABLE is bounded by the fixed dimensionality — the one genuinely
    * broadcast-safe side in the family at ANY corpus size. Doc-sized
    * frames (labels, scores) join shuffle_hash as usual.
    */
  /** Feature-hash family for the classifier (round-15 verdict "next"
    * 3): `md5` (default) is the cross-engine-portable [[fp64]]
    * spelling the DuckDB twin replays; `xxh64` is the PRODUCTION path
    * — Spark's codegen'd 64-bit xxHash (one shift/multiply pass per
    * token vs md5's full digest), same hashing-trick semantics,
    * selected via `spark.graft.qcHash`. The two paths train different
    * (equally arbitrary) bucketings, so the engine path is gated on
    * held-out separation quality (QualityClassifierSpec: AUC/accuracy
    * floors match the md5 path's) rather than per-document hashes —
    * exactly why md5 stays the oracle spelling.
    */
  private[graft] def qcHashMode(spark: SparkSession): String =
    spark.conf.get("spark.graft.qcHash", "md5")

  private[graft] def qcFeature(spark: SparkSession, w: Column): Column =
    if (qcHashMode(spark) == "xxh64") pmod(xxhash64(w), lit(qcDim.toLong))
    else fp64(w) % qcDim

  /** The FROZEN classifier model as a servable artifact: the trained
    * (f, w8) weight table — bounded by [[qcDim]], broadcast-safe at
    * any corpus size — plus the unseen-bucket default weight, as a
    * plain Long (it is one deterministic integer; w16's stream path
    * coalesces misses with it as a literal). Training replays t23's
    * exact arithmetic over the SAME memoized feats/labels frames, so
    * the stream scores and the batch t23 scores cannot drift; the
    * totals collect is ONE row (bounded driver data).
    */
  private[graft] def qcFrozenWeights(
      spark: SparkSession, dir: String): (DataFrame, Long) = {
    // PUBLISHED artifact (optimization round 18): the weight table is
    // the thing a production ingest tier actually receives — a
    // ≤qcDim-row parquet — so serve the stream from the shipped
    // artifact instead of re-running the training aggregation chain
    // (corpus explode → per-doc features → per-class counts) on every
    // consumer invocation (the w16/e06 per-rep cost under Bench's
    // clearCache). Same content-fingerprint keying as every artifact;
    // weight VALUES are unchanged (deterministic integer arithmetic).
    val tbl = PlanMemo.publishedParquet(spark, dir, "qc_frozen_weights") {
      val labels = PlanMemo.cached(spark, s"text.qcLabels:$dir")(
        qcLabels(spark, dir))
      val feats = PlanMemo.cached(spark, s"text.qcFeatures:$dir:md5")(
        Tables.documents(spark, dir)
          .select(col("doc_id"),
            explode_outer(tokens(lower(col("text")))).as("w"))
          .filter(col("w").isNotNull)
          .groupBy(col("doc_id"), (fp64(col("w")) % qcDim).as("f"))
          .agg(count(lit(1)).as("n")))
      val counts = PlanMemo.cached(spark, s"text.qcCounts:$dir")(
        feats.join(labels.hint("shuffle_hash"), "doc_id")
          .filter(col("doc_id") % qcFolds =!= 0)
          .groupBy("f").agg(
            sum(when(col("y") === 1, col("n")).otherwise(0L)).as("cp"),
            sum(when(col("y") === 0, col("n")).otherwise(0L)).as("cn")))
      val (sp, sn) = PlanMemo.cachedValue(spark, s"text.qcTotals:$dir") {
        val r = counts.agg(sum("cp"), sum("cn")).first()
        (r.getLong(0), r.getLong(1))
      }
      // Scala Long division truncates; both operands positive here, so
      // it equals the engines' div/// — the same t23 discipline.
      // def_w8 (the unseen-bucket default) rides every row as a
      // constant column: a scalar has no parquet home of its own and
      // the table is dim-bounded, so the duplication is bytes-trivial
      counts.select(col("f"), expr(
        s"(cp + 1) * $qcScale div (${sp}L + $qcDim) - " +
          s"(cn + 1) * $qcScale div (${sn}L + $qcDim)").as("w8"))
        .withColumn("def_w8",
          lit(qcScale / (sp + qcDim) - qcScale / (sn + qcDim)))
    }
    val defW8 = PlanMemo.cachedValue(spark, s"text.qcDefW8:$dir")(
      tbl.select("def_w8").head().getLong(0))
    (tbl.select("f", "w8"), defW8)
  }

  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val hashMode = qcHashMode(spark)
    val labels = PlanMemo.cached(spark, s"text.qcLabels:$dir")(
      qcLabels(spark, dir))
    val feats = PlanMemo.cached(spark, s"text.qcFeatures:$dir:$hashMode")(
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          explode_outer(tokens(lower(col("text")))).as("w"))
        .filter(col("w").isNotNull)
        .groupBy(col("doc_id"), qcFeature(spark, col("w")).as("f"))
        .agg(count(lit(1)).as("n")))
    val trainFeats = feats.join(labels.hint("shuffle_hash"), "doc_id")
      .filter(col("doc_id") % qcFolds =!= 0)
    val counts = trainFeats.groupBy("f").agg(
      sum(when(col("y") === 1, col("n")).otherwise(0L)).as("cp"),
      sum(when(col("y") === 0, col("n")).otherwise(0L)).as("cn"))
    val totals = counts.agg(sum("cp").as("sp"), sum("cn").as("sn"))
    val weights = counts.crossJoin(broadcast(totals))
      .select(col("f"), expr(
        s"(cp + 1) * $qcScale div (sp + $qcDim) - " +
          s"(cn + 1) * $qcScale div (sn + $qcDim)").as("w8"))
    // unseen-in-training buckets score the cp=cn=0 smoothed
    // difference — the same formula with counts zero
    val scored = feats
      .join(broadcast(weights), Seq("f"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("w8e", coalesce(col("w8"), expr(
        s"$qcScale div (sp + $qcDim) - $qcScale div (sn + $qcDim)")))
      .groupBy("doc_id").agg(sum(col("n") * col("w8e")).as("s8"))
    labels
      .join(scored.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("y"),
        coalesce(col("s8"), lit(0L)).as("score8"),
        (coalesce(col("s8"), lit(0L)) > 0).cast("int").as("pred"),
        (col("doc_id") % qcFolds === 0).cast("int").as("heldout"))
      .orderBy("doc_id")
  }

  /** The t23 train+score CTE chain, exposed for composition (e01's
    * pipeline oracle reuses it verbatim): `labels` (doc_id, y) and
    * `scored` (doc_id, s8) are the consumable outputs. Every name here
    * (qst/qmed/labels/feats/tr/counts/totals/weights/scored) is
    * reserved across composed oracles.
    */
  private[graft] val qcCtesSql: String =
    s"""$qcLabelsCteSql, feats AS (
       |  SELECT doc_id, f, COUNT(*) AS n FROM (
       |    SELECT doc_id, ${fp64Sql("w")} % $qcDim AS f FROM (
       |      SELECT doc_id, unnest(${tokensSql("lower(text)")}) AS w
       |      FROM documents) u) v
       |  GROUP BY doc_id, f
       |), tr AS (
       |  SELECT f, n, y FROM feats JOIN labels USING (doc_id)
       |  WHERE doc_id % $qcFolds != 0
       |), counts AS (
       |  SELECT f, CAST(SUM(CASE WHEN y = 1 THEN n ELSE 0 END) AS BIGINT) AS cp,
       |    CAST(SUM(CASE WHEN y = 0 THEN n ELSE 0 END) AS BIGINT) AS cn
       |  FROM tr GROUP BY f
       |), totals AS (
       |  SELECT CAST(SUM(cp) AS BIGINT) AS sp,
       |    CAST(SUM(cn) AS BIGINT) AS sn FROM counts
       |), weights AS (
       |  SELECT f, (cp + 1) * $qcScale // (sp + $qcDim) -
       |    (cn + 1) * $qcScale // (sn + $qcDim) AS w8
       |  FROM counts CROSS JOIN totals
       |), scored AS (
       |  SELECT doc_id, CAST(SUM(n * COALESCE(w8,
       |    $qcScale // (sp + $qcDim) -
       |    $qcScale // (sn + $qcDim))) AS BIGINT) AS s8
       |  FROM feats LEFT JOIN weights USING (f) CROSS JOIN totals
       |  GROUP BY doc_id
       |)""".stripMargin

  val qualityClassifierSql: String =
    s"""WITH $qcCtesSql
       |SELECT l.doc_id, l.y,
       |  COALESCE(s8, 0) AS score8,
       |  CAST(COALESCE(s8, 0) > 0 AS INT) AS pred,
       |  CAST(l.doc_id % $qcFolds = 0 AS INT) AS heldout
       |FROM labels l LEFT JOIN scored USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Merge-rounds target for the t33 distributed-trainer gate — deep
    * enough to exercise multi-step batching, delta re-election, the
    * mid-run checkpoint boundary and the bound refresh, shallow
    * enough to stay a bench-friendly entry (FULL-depth equivalence is
    * pinned by TextBpeSpec's 300-merge fixture and the vstress bank
    * in SCALE.md). Override with `spark.graft.bpeDistGateRounds`.
    */
  val bpeDistGateRounds: Int = 64

  /** t33 — EXECUTOR-SIDE BPE TRAINING (the above-driver-budget path,
    * round-18 — see [[BpeDist]]): train with the dictionary sharded
    * on executors and driver state O(distinct pairs), and gate it
    * BIT-IDENTICAL against [[bpeTrainDriver]] on the same pruned
    * dictionary:
    *   - band_merges_identical: the full merge table (round numbers,
    *     pairs, winning counts) is EQUAL;
    *   - band_accounting_identical: exhaustion flag + token totals
    *     (initial / checkpoint / final) are EQUAL — the checkpoint
    *     sits mid-run, so the distributed batch capper must land a
    *     step boundary exactly on it;
    *   - band_nonempty: the corpus actually trained ≥1 merge.
    * The oracle is the constant-TRUE band (precedent: t29–t32 — a
    * merge chain has no writable SQL twin), earned by the
    * engine-verified equality above plus TextBpeSpec's fuzz,
    * duplicate-pair, exhaustion and forced-delegation pins.
    */
  def bpeTrainDist(spark: SparkSession, dir: String): DataFrame = {
    val rounds = spark.conf.get("spark.graft.bpeDistGateRounds",
      bpeDistGateRounds.toString).toInt
    val ck = math.min(12, rounds)
    val minFreq = spark.conf.get("spark.graft.bpeMinFreq", "1").toLong
    val (dist, drv) = PlanMemo.cachedValue(spark,
      s"text.bpeDistGate:$dir:${PlanMemo.corpusFingerprint(dir)}" +
        s":$minFreq:$rounds") {
      val pruned = bpeVocab(spark, dir)
        .filter(col("freq") >= minFreq).select("freq", "sym")
      val d = BpeDist.train(spark, pruned, rounds, checkpointRound = ck)
      val dict = pruned.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      (d, bpeTrainDriver(dict, rounds, checkpointRound = ck))
    }
    import spark.implicits._
    Seq((
      dist.merges == drv.merges,
      dist.exhausted == drv.exhausted &&
        dist.tokensInitial == drv.tokensInitial &&
        dist.tokensAtCheckpoint == drv.tokensAtCheckpoint &&
        dist.tokensFinal == drv.tokensFinal,
      dist.merges.nonEmpty))
      .toDF("band_merges_identical", "band_accounting_identical",
        "band_nonempty")
  }

  val bpeTrainDistSql: String =
    """SELECT TRUE AS band_merges_identical,
      |  TRUE AS band_accounting_identical,
      |  TRUE AS band_nonempty""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t33_bpe_train_dist" -> bpeTrainDist _,
    "t32_bpe_ids_prod" -> bpeIdsProd _,
    "t31_bpe_encode_prod" -> bpeEncodeProd _,
    "t30_bpe_train_prod" -> bpeTrainProd _,
    "t29_bpe_ids_large" -> bpeIdsLarge _,
    "t28_bpe_decode" -> bpeDecode _,
    "t27_bpe_encode_large" -> bpeEncodeLarge _,
    "t26_tokenizer_fertility" -> tokenizerFertility _,
    "t25_bpe_train_large" -> bpeTrainLarge _,
    "t24_bpe_token_ids" -> bpeTokenIds _,
    "t23_quality_classifier" -> qualityClassifier _,
    "t22_bpe_encode" -> bpeEncode _,
    "t21_bpe_train" -> bpeTrain _,
    "t20_heavy_hitters" -> heavyHitters _,
    "t19_cdc_chunks" -> cdcChunks _,
    "t18_dsir_weights" -> dsirWeights _,
    "t17_gopher_rules" -> gopherRules _,
    "t16_c4_clean" -> c4Clean _,
    "t15_bigram_quality" -> bigramQuality _,
    "t14_bm25_rank" -> bm25Rank _,
    "t13_nfc_normalize" -> nfcNormalize _,
    "t12_vocab_coverage" -> vocabCoverage _,
    "t11_pii_redaction" -> piiRedaction _,
    "t10_tfidf_top_terms" -> tfidfTopTerms _,
    "t09_repetition_stats" -> repetitionStats _,
    "t06_bpeish_tokens" -> bpeishTokens _,
    "t07_quality_filter" -> qualityFilter _,
    "t08_rolling_fingerprints" -> rollingFingerprints _,
    "t01_token_stats" -> tokenStats _,
    "t02_word_freq" -> wordFreq _,
    "t03_quality_scores" -> qualityScores _,
    "t04_fingerprints" -> fingerprints _,
    "t05_lang_id" -> langId _
  )

  def oracles: Map[String, String] = Map(
    "t33_bpe_train_dist" -> bpeTrainDistSql,
    "t32_bpe_ids_prod" -> bpeIdsProdSql,
    "t31_bpe_encode_prod" -> bpeEncodeProdSql,
    "t30_bpe_train_prod" -> bpeTrainProdSql,
    "t29_bpe_ids_large" -> bpeIdsLargeSql,
    "t28_bpe_decode" -> bpeDecodeSql,
    "t27_bpe_encode_large" -> bpeEncodeLargeSql,
    "t26_tokenizer_fertility" -> tokenizerFertilitySql,
    "t25_bpe_train_large" -> bpeTrainLargeSql,
    "t24_bpe_token_ids" -> bpeTokenIdsSql,
    "t23_quality_classifier" -> qualityClassifierSql,
    "t22_bpe_encode" -> bpeEncodeSql,
    "t21_bpe_train" -> bpeTrainSql,
    "t20_heavy_hitters" -> heavyHittersSql,
    "t19_cdc_chunks" -> cdcChunksSql,
    "t18_dsir_weights" -> dsirWeightsSql,
    "t17_gopher_rules" -> gopherRulesSql,
    "t16_c4_clean" -> c4CleanSql,
    "t15_bigram_quality" -> bigramQualitySql,
    "t14_bm25_rank" -> bm25RankSql,
    "t13_nfc_normalize" -> nfcNormalizeSql,
    "t12_vocab_coverage" -> vocabCoverageSql,
    "t11_pii_redaction" -> piiRedactionSql,
    "t10_tfidf_top_terms" -> tfidfTopTermsSql,
    "t09_repetition_stats" -> repetitionStatsSql,
    "t06_bpeish_tokens" -> bpeishTokensSql,
    "t07_quality_filter" -> qualityFilterSql,
    "t08_rolling_fingerprints" -> rollingFingerprintsSql,
    "t01_token_stats" -> tokenStatsSql,
    "t02_word_freq" -> wordFreqSql,
    "t03_quality_scores" -> qualityScoresSql,
    "t04_fingerprints" -> fingerprintsSql,
    "t05_lang_id" -> langIdSql
  )
}
