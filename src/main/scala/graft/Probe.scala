package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Dedup

/** Dev-loop micro-profiler: times named sub-plans of a query family so
  * regressions can be localized without a full Bench run. Not part of
  * the driver contract; see Bench for the recorded harness.
  *
  * Usage: `sbt "runMain graft.Probe <what> [sfDir]"` where `<what>`
  * selects a probe set below. Each probe noop-writes the plan (full
  * physical execution, no sink I/O) and prints `PROBE <label> <sec>`.
  */
object Probe {

  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("d11")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    what match {
      case "exnodes" =>
        // real exchange NODES in the executed tree (a cached
        // relation's embedded build plan prints in toString but is
        // not part of the tree) — warm, like the PlanAuditSpec pin
        val name = sys.env.getOrElse("SPARK_GRAFT_QUERY", "d19_prefix_jaccard")
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan
        def countNodes(p: org.apache.spark.sql.execution.SparkPlan): Map[String, Int] = {
          val b = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
          def walk(n: org.apache.spark.sql.execution.SparkPlan): Unit = {
            val nm = n.getClass.getSimpleName
            if (nm.contains("Exchange") || nm.contains("InMemoryTableScan"))
              b(nm) += 1
            n.children.foreach(walk)
            n match {
              case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
                walk(a.executedPlan)
              case _ =>
            }
          }
          walk(p)
          b.toMap
        }
        println(s"PROBE exnodes $name ${countNodes(plan)}")
      case "bpeprod" =>
        // t30 production-train accounting: merges learned vs target,
        // exhaustion regime, trainer wall-time (dictionary collect +
        // in-memory loop, isolated from the corpus vocab pass), and
        // the rank-encode dictionary pass — the SCALE.md numbers
        Text.bpeVocab(spark, dir).count() // warm the corpus pass
        val t0 = System.nanoTime()
        val prod = Text.bpeProdTrain(spark, dir)
        val trainSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        run(Text.bpeEncodeDictUnder(spark, dir, prod, "ntok_prod"))
        val encSec = (System.nanoTime() - t1) / 1e9
        println(f"PROBE bpeprod merges=${prod.merges.length} " +
          f"target=${Text.bpeProdVocabTarget - 256} " +
          f"exhausted=${prod.exhausted} " +
          f"tokens=${prod.tokensInitial}->${prod.tokensAtCheckpoint}" +
          f"->${prod.tokensFinal} train=$trainSec%.2f s " +
          f"encodeDict=$encSec%.2f s")
      case "e05plan" =>
        val contents = Pipeline.shardContents(spark, dir)
        run(contents)
        val warm = Pipeline.shardContents(spark, dir)
        run(warm)
        val p = warm.queryExecution.executedPlan
        println(p.toString.take(6000))
      case "emission" =>
        // d03-dispatch signal: sampled posting-emission pairs/doc
        println(f"PROBE emission $dir " +
          f"${Dedup.pairEmissionPerDoc(spark, dir)}%.1f pairs/doc")
      case "qcagree" =>
        // ml10 calibration diagnosis: raw threshold-pred agreement vs
        // rate-matched (each model selecting its own top half of the
        // held-out fifth) between t23 and the spark.ml LR twin
        import org.apache.spark.sql.functions._
        val t23 = Text.qualityClassifier(spark, dir)
          .filter(col("heldout") === 1)
          .select(col("doc_id"), col("score8"), col("pred").as("p23"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        val lr = MlQueries.qcLrPreds(spark, dir)
          .select(col("doc_id"),
            org.apache.spark.ml.functions.vector_to_array(col("rawPrediction"))
              .getItem(1).as("raw"),
            col("prediction").cast("int").as("plr"))
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
          .map(t => t._1 -> (t._2, t._3)).toMap
        val n = t23.length
        val raw = t23.count { case (id, _, p) => lr(id)._2 == p }.toDouble / n
        val k = t23.count(_._3 == 1) // match t23's own selection rate
        val sel23 = t23.sortBy(t => (-t._2, t._1)).take(k).map(_._1).toSet
        val selLr = t23.map(t => (t._1, lr(t._1)._1))
          .sortBy(t => (-t._2, t._1)).take(k).map(_._1).toSet
        val rate = (sel23 & selLr).size.toDouble / math.max(k, 1)
        println(f"PROBE qcagree n=$n raw=$raw%.3f k=$k rateMatched=$rate%.3f")
      case "d11" =>
        time("d11_cold") { run(Dedup.neardupVerified(spark, dir)) }
        spark.catalog.clearCache()
        time("cand_only") { run(Dedup.lshCandidates(spark, dir)) }
        time("d11_warm_cand") { run(Dedup.neardupVerified(spark, dir)) }
        spark.catalog.clearCache()
        time("d11_again") { run(Dedup.neardupVerified(spark, dir)) }
        println("PROBE cand_count " +
          Dedup.lshCandidates(spark, dir).count())
        println("PROBE docs_count " + Tables.documents(spark, dir).count())
      case "explain" =>
        val plan = Dedup.minhashLsh(spark, dir).queryExecution.executedPlan.toString
        println(plan.take(8000))
        println("PROBE md5_count " + "md5".r.findAllIn(plan).length)
        println("PROBE exchange_count " + "Exchange".r.findAllIn(plan).length)
      case "d11parts" =>
        import org.apache.spark.sql.functions._
        val docs = Tables.documents(spark, dir)
        println("PROBE avg_len " + docs.selectExpr("avg(length(text))").first().getDouble(0))
        val cands = Dedup.lshCandidates(spark, dir).select("d1", "d2")
        run(cands) // warm the memo
        val joined = cands
          .hint("shuffle_hash")
          .join(docs.select(col("doc_id").as("d1"), col("text").as("t1")), "d1")
          .hint("shuffle_hash")
          .join(docs.select(col("doc_id").as("d2"), col("text").as("t2")), "d2")
        time("join_only") { run(joined.select(length(col("t1")), length(col("t2")))) }
        time("join_lev") { run(joined.select(levenshtein(col("t1"), col("t2")))) }
        time("join_lev_banded") { run(joined.select(
          expr("levenshtein(t1, t2, cast(greatest(length(t1), length(t2)) / 5 + 2 as int))"))) }
      case "q09" =>
        import org.apache.spark.sql.functions._
        val raw = spark.read.parquet(s"$dir/events.parquet")
        time("raw_scan") { run(raw) }
        val norm = Tables.normalizeTs(raw)
        time("norm_ts") { run(norm) }
        time("norm_agg") { run(norm.groupBy(
          (weekday(col("ts")) + 1).as("dow"), hour(col("ts")).as("hour"))
          .count()) }
        val enriched = graft.Features.enrich(norm)
        time("enrich") { run(enriched) }
        time("enrich_agg") { run(enriched
          .groupBy(col("pickup_dow_iso").as("dow"), col("pickup_hour").as("hour"))
          .agg(count(lit(1)).as("trips"))) }
        time("q09_full") { run(Kpis.heatmapDowHour(spark, dir)) }
        time("q09_again") { run(Kpis.heatmapDowHour(spark, dir)) }
        OptimizerBarrier.register(spark)
        val fenced = graft.Features.enrich(norm, graft.Features.kColFenced)
        time("enrich_fenced") { run(fenced) }
        time("fenced_q09_agg") { run(fenced
          .groupBy(col("pickup_dow_iso").as("dow"), col("pickup_hour").as("hour"))
          .agg(count(lit(1)).as("trips"),
            graft.Exact.avgMoney(col("total_amount")).as("avg_total"))
          .orderBy("dow", "hour")) }
        time("fenced_q09_again") { run(fenced
          .groupBy(col("pickup_dow_iso").as("dow"), col("pickup_hour").as("hour"))
          .agg(count(lit(1)).as("trips"),
            graft.Exact.avgMoney(col("total_amount")).as("avg_total"))
          .orderBy("dow", "hour")) }
      case "d03pairs" =>
        import org.apache.spark.sql.functions._
        // A/B the pair-emission spelling over the same posting lists:
        // cross-emit df^2 rows + filter (current) vs sorted+slice
        // emitting df(df-1)/2 rows directly.
        val posting = PlanMemo.cachedEager(spark, s"probe.posting:$dir")(
          Dedup.shingled(spark, dir)
            .select(col("doc_id"), explode_outer(col("fps")).as("sh"))
            .filter(col("sh").isNotNull)
            .groupBy("sh")
            .agg(collect_list(col("doc_id")).as("docs"))
            .filter(size(col("docs")) <= Dedup.maxShingleDf))
        run(posting) // warm the memo so both arms read the same cache
        def agg(df: DataFrame) =
          df.groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
        val cross = posting
          .select(explode(col("docs")).as("d1"), col("docs"))
          .select(col("d1"), explode(col("docs")).as("d2"))
          .filter(col("d1") < col("d2"))
        val sliced = posting
          .select(array_sort(col("docs")).as("docs"))
          .select(posexplode(col("docs")), col("docs"))
          .select(col("col").as("d1"),
            explode(expr("slice(docs, pos + 2, size(docs))")).as("d2"))
        time("cross_emit_1") { run(agg(cross)) }
        time("slice_emit_1") { run(agg(sliced)) }
        time("cross_emit_2") { run(agg(cross)) }
        time("slice_emit_2") { run(agg(sliced)) }
      case "d03stages" =>
        import org.apache.spark.sql.functions._
        // stage ladder for the shared jaccardPairs pipeline: each step
        // adds one operator block, so step-to-step deltas localize the
        // dominant cost (tokenize+md5 scan vs posting shuffle vs pair
        // emission vs the sizes joins).
        val sh = Dedup.shingled(spark, dir)
        time("shingled_scan") { run(sh.select(col("doc_id"), size(col("fps")))) }
        val ex = sh
          .select(col("doc_id"), explode_outer(col("fps")).as("sh"))
          .filter(col("sh").isNotNull)
        time("exploded") { run(ex) }
        val posting = ex.groupBy("sh")
          .agg(collect_list(col("doc_id")).as("docs"))
          .filter(size(col("docs")) <= Dedup.maxShingleDf)
        time("posting") { run(posting) }
        time("posting_again") { run(posting) }
        val emitted = posting
          .select(array_sort(col("docs")).as("docs"))
          .select(posexplode_outer(col("docs")), col("docs"))
          .select(col("col").as("d1"),
            explode_outer(expr("slice(docs, pos + 2, size(docs))")).as("d2"))
          .filter(col("d2").isNotNull)
        time("pairs_emit") { run(emitted) }
        // A/B: row-per-pair shuffle vs the packed-array shuffle +
        // post-exchange explode that Dedup.pairCounts ships (r12)
        time("pairs_count_rowper") { run(emitted
          .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))) }
        val packed = posting
          .select(array_sort(col("docs")).as("docs"))
          .select(posexplode_outer(col("docs")), col("docs"))
          .select(col("col").as("d1"),
            expr("slice(docs, pos + 2, size(docs))").as("d2s"))
          .repartition(spark.sessionState.conf.numShufflePartitions,
            col("d1"))
          .select(col("d1"), explode(col("d2s")).as("d2"))
          .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
        time("pairs_count_packed") { run(packed) }
        spark.catalog.clearCache()
        time("d03_full_cold") { run(Dedup.ngramJaccard(spark, dir)) }
      case "d19stages" =>
        import org.apache.spark.sql.functions._
        // stage ladder for the PPJoin spelling: localize cost between
        // the sorted-set build, the prefix index, candidate emission,
        // and the full-array verify joins.
        time("sortedSets") { run(Dedup.sortedSets(spark, dir)) }
        time("prefixEntries") { run(Dedup.prefixEntries(spark, dir)) }
        time("prefixPosting") { run(Dedup.prefixPosting(spark, dir)) }
        time("prefixCand") { run(Dedup.prefixCand(spark, dir)) }
        println("PROBE cand_count " + Dedup.prefixCand(spark, dir).count())
        time("d19_verify") { run(Dedup.prefixJaccard(spark, dir)) }
        spark.catalog.clearCache()
        time("d19_full_cold") { run(Dedup.prefixJaccard(spark, dir)) }
      case "e03parts" =>
        import org.apache.spark.sql.functions._
        // time appendAgainst's INTERNAL frames exactly as the query
        // spells them (published pairs artifact, increment screens,
        // checkpoint, CC, accounting, placement) under the bench's
        // per-rep clearCache contract — e03cold's ladder used the
        // REBUILD pairs path, which the query does not pay.
        run(Pipeline.incrementAppend(spark, dir)) // warm artifacts
        spark.catalog.clearCache()
        val sid = Dedup.incrementalSplitId(spark, dir)
        val docs = Tables.documents(spark, dir)
        val baseKept = Pipeline.baseKeptDocs(spark, dir)
        val incQ = PlanMemo.publishedParquet(spark, dir,
            "t23_quality_classifier")(Text.qualityClassifier(spark, dir))
          .filter(col("pred") === 1 && col("doc_id") >= sid).select("doc_id")
        val fpx = expr("optimizer_barrier(md5(text))")
        val incNoExact = docs
          .join(incQ.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
          .select(col("doc_id"), fpx.as("fp"))
          .join(Pipeline.baseFpsArtifact(spark, dir).hint("shuffle_hash"),
            Seq("fp"), "left_anti")
          .select("doc_id")
        time("incNoExact") { run(incNoExact) }
        val pairsP = Pipeline.pairsArtifact(spark, dir)
        time("pairs_published_read") { run(pairsP) }
        val crossLosers = pairsP
          .join(baseKept.select(col("doc_id").as("d1")).hint("shuffle_hash"),
            Seq("d1"), "left_semi")
          .select(col("d2").as("doc_id"))
          .union(pairsP
            .join(baseKept.select(col("doc_id").as("d2")).hint("shuffle_hash"),
              Seq("d2"), "left_semi")
            .select(col("d1").as("doc_id")))
          .distinct()
        time("crossLosers") { run(crossLosers) }
        var incScreened: DataFrame = null
        time("incScreened_checkpoint") {
          incScreened = incNoExact
            .join(crossLosers.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
            .localCheckpoint()
        }
        val incPairs = pairsP
          .join(incScreened.select(col("doc_id").as("d1"))
            .hint("shuffle_hash"), Seq("d1"), "left_semi")
          .join(incScreened.select(col("doc_id").as("d2"))
            .hint("shuffle_hash"), Seq("d2"), "left_semi")
        time("ccIncrement") { run(Dedup.connectedComponents(incPairs)) }
        val dict = Text.bpeEncodeDict(
          Text.bpeMerges(spark, dir), Text.bpeVocab(spark, dir))
        val incDocs = docs.join(incScreened.hint("shuffle_hash"),
          Seq("doc_id"), "left_semi")
        val incCounts = incDocs
          .select(col("doc_id"), explode_outer(Text.bpeWords(col("text")))
            .as("word"))
          .filter(col("word").isNotNull)
          .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
          .join(dict.hint("shuffle_hash"), "word")
          .groupBy("doc_id")
          .agg(sum(col("cnt") * col("ntok")).cast("long").as("nt"))
        time("incCounts") { run(incCounts) }
        val incBase = incDocs.select(col("lang"), col("doc_id"))
          .join(incCounts.hint("shuffle_hash"), Seq("doc_id"), "left")
          .select(col("lang"), col("doc_id"),
            coalesce(col("nt"), lit(0L)).as("n_tok"))
        time("placement") { run(Packing.placed(incBase)) }
        spark.catalog.clearCache()
        time("e03_full_cleared") { run(Pipeline.incrementAppend(spark, dir)) }
      case "e08parts" =>
        import org.apache.spark.sql.functions._
        // localize the two-append chain's per-rep cost under the
        // bench's clearCache contract: first append (p1, checkpoint),
        // state rollforward (fps1 md5 scan), second append's screens /
        // CC / accounting, full query. Mirrors incrementAppendChain's
        // spelling (see the appendAgainst probe-sync note).
        run(Pipeline.incrementAppendChain(spark, dir)) // warm artifacts
        spark.catalog.clearCache()
        val (sid1, sid2) = Pipeline.chainSplitIds(spark, dir)
        val docs = Tables.documents(spark, dir)
        val qc = PlanMemo.publishedParquet(spark, dir,
            "t23_quality_classifier")(Text.qualityClassifier(spark, dir))
          .filter(col("pred") === 1)
        val inc1Q = qc
          .filter(col("doc_id") >= sid1 && col("doc_id") < sid2)
          .select("doc_id")
        val inc2Q = qc.filter(col("doc_id") >= sid2).select("doc_id")
        var p1: DataFrame = null
        time("p1_append_checkpoint") {
          p1 = Pipeline.appendAgainst(spark, dir,
            Pipeline.baseKeptDocs(spark, dir),
            Pipeline.baseFpsArtifact(spark, dir),
            Pipeline.baseTotalsArtifact(spark, dir), inc1Q,
            crossLosersPre =
              Some(Pipeline.baseCrossLosersArtifact(spark, dir)))
            .localCheckpoint()
        }
        val fps1 = Pipeline.baseFpsArtifact(spark, dir)
          .union(docs
            .join(p1.select("doc_id").hint("shuffle_hash"),
              Seq("doc_id"), "left_semi")
            .select(expr("optimizer_barrier(md5(text))").as("fp")))
        time("fps1") { run(fps1) }
        val totals1 = Pipeline.baseTotalsArtifact(spark, dir).as("b")
          .join(p1.groupBy("lang")
            .agg(sum("n_tok").cast("long").as("inc_tok")).as("i"),
            Seq("lang"), "full")
          .select(col("lang"),
            (coalesce(col("base_tok"), lit(0L)) +
              coalesce(col("inc_tok"), lit(0L))).as("base_tok"))
        time("totals1") { run(totals1) }
        val pairsArt = Pipeline.pairsArtifact(spark, dir)
        val crossLosers2 = Pipeline.baseCrossLosersArtifact(spark, dir)
          .union(pairsArt
            .join(p1.select(col("doc_id").as("d1")).hint("shuffle_hash"),
              Seq("d1"), "left_semi")
            .select(col("d2").as("doc_id")))
          .union(pairsArt
            .join(p1.select(col("doc_id").as("d2")).hint("shuffle_hash"),
              Seq("d2"), "left_semi")
            .select(col("d1").as("doc_id")))
        time("crossLosers2") { run(crossLosers2) }
        val incNoExact2 = docs
          .join(inc2Q.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
          .select(col("doc_id"),
            expr("optimizer_barrier(md5(text))").as("fp"))
          .join(fps1.hint("shuffle_hash"), Seq("fp"), "left_anti")
          .select("doc_id")
        time("incNoExact2") { run(incNoExact2) }
        var incScreened2: DataFrame = null
        time("incScreened2_checkpoint") {
          incScreened2 = incNoExact2
            .join(crossLosers2.hint("shuffle_hash"), Seq("doc_id"),
              "left_anti")
            .localCheckpoint()
        }
        val incPairs2 = pairsArt
          .join(incScreened2.select(col("doc_id").as("d1"))
            .hint("shuffle_hash"), Seq("d1"), "left_semi")
          .join(incScreened2.select(col("doc_id").as("d2"))
            .hint("shuffle_hash"), Seq("d2"), "left_semi")
        time("cc2") { run(Dedup.connectedComponents(incPairs2)) }
        spark.catalog.clearCache()
        time("e08_full_cleared") {
          run(Pipeline.incrementAppendChain(spark, dir))
        }
        spark.catalog.clearCache()
        time("e08_full_cleared2") {
          run(Pipeline.incrementAppendChain(spark, dir))
        }
      case "d16ab" =>
        // round-18 verdict "next" 8: what the para_hash_index artifact
        // buys at GenData scale — d16 per-rep (clearCache) via the
        // published artifact vs the inline tokenize+chunk+md5 pass.
        // Measured at gensf1: artifact 0.74–1.06 s vs inline
        // 0.56–0.57 s — the artifact LOST and inline is now the
        // default (see Dedup.paraHashes).
        spark.conf.set("spark.graft.paraIndexPublish", "true")
        try {
          run(Dedup.sourceOverlap(spark, dir)) // publish + warm memo
          spark.catalog.clearCache()
          time("d16_artifact_rep1") { run(Dedup.sourceOverlap(spark, dir)) }
          spark.catalog.clearCache()
          time("d16_artifact_rep2") { run(Dedup.sourceOverlap(spark, dir)) }
        } finally {
          spark.conf.set("spark.graft.paraIndexPublish", "false")
          PlanMemo.drop(spark, s"dedup.paraHashes:$dir")
        }
        run(Dedup.sourceOverlap(spark, dir)) // build the inline memo
        spark.catalog.clearCache()
        time("d16_inline_rep1") { run(Dedup.sourceOverlap(spark, dir)) }
        spark.catalog.clearCache()
        time("d16_inline_rep2") { run(Dedup.sourceOverlap(spark, dir)) }
      case "e03stages" =>
        import org.apache.spark.sql.functions._
        // stage ladder for the incremental append: localize warm cost
        // between the frozen-base artifacts (memoized — should be
        // ~free after rep 1), the increment screens, the
        // intra-increment CC fixpoint, and the accounting+placement.
        time("baseKept_build") { Pipeline.baseKeptDocs(spark, dir).count() }
        time("e03_rep1") { run(Pipeline.incrementAppend(spark, dir)) }
        val sid = Dedup.incrementalSplitId(spark, dir)
        val pairs = Dedup.jaccardPairs(spark, dir).select("d1", "d2")
        time("pairs_warm_scan") { run(pairs) }
        val baseKept = Pipeline.baseKeptDocs(spark, dir)
        val incQ = Text.qualityClassifier(spark, dir)
          .filter(col("pred") === 1 && col("doc_id") >= sid).select("doc_id")
        time("incQ") { run(incQ) }
        val crossLosers = pairs
          .join(baseKept.select(col("doc_id").as("d1")), Seq("d1"), "left_semi")
          .select(col("d2").as("doc_id"))
          .union(pairs
            .join(baseKept.select(col("doc_id").as("d2")), Seq("d2"), "left_semi")
            .select(col("d1").as("doc_id")))
          .distinct()
        time("crossLosers") { run(crossLosers) }
        val incPairs = pairs
          .join(incQ.select(col("doc_id").as("d1")), Seq("d1"), "left_semi")
          .join(incQ.select(col("doc_id").as("d2")), Seq("d2"), "left_semi")
        time("ccIncrement") { run(Dedup.connectedComponents(incPairs)) }
        time("e03_rep2") { run(Pipeline.incrementAppend(spark, dir)) }
        time("e03_rep3") { run(Pipeline.incrementAppend(spark, dir)) }
        time("e03_rep4") { run(Pipeline.incrementAppend(spark, dir)) }
      case "e03cold" =>
        import org.apache.spark.sql.functions._
        // replicate incrementAppend's stage frames under the bench's
        // per-rep clearCache contract, materializing stage by stage
        run(Pipeline.incrementAppend(spark, dir)) // warm artifacts
        spark.catalog.clearCache()
        val sid = Dedup.incrementalSplitId(spark, dir)
        val docs = Tables.documents(spark, dir)
        time("baseKept_read") { Pipeline.baseKeptDocs(spark, dir).count() }
        val baseKept = Pipeline.baseKeptDocs(spark, dir)
        val incQ = PlanMemo.publishedParquet(spark, dir,
            "t23_quality_classifier")(Text.qualityClassifier(spark, dir))
          .filter(col("pred") === 1 && col("doc_id") >= sid).select("doc_id")
        time("incQ_read") { run(incQ) }
        val pairs = Dedup.jaccardPairs(spark, dir).select("d1", "d2")
        time("pairs_rebuild") { run(pairs) }
        val crossLosers = pairs
          .join(baseKept.select(col("doc_id").as("d1")), Seq("d1"), "left_semi")
          .select(col("d2").as("doc_id"))
          .union(pairs
            .join(baseKept.select(col("doc_id").as("d2")), Seq("d2"), "left_semi")
            .select(col("d1").as("doc_id")))
          .distinct()
        time("crossLosers") { run(crossLosers) }
        val incPairs = pairs
          .join(incQ.select(col("doc_id").as("d1")), Seq("d1"), "left_semi")
          .join(incQ.select(col("doc_id").as("d2")), Seq("d2"), "left_semi")
        time("ccIncrement") { run(Dedup.connectedComponents(incPairs)) }
        val dict = Text.bpeEncodeDict(
          Text.bpeMerges(spark, dir), Text.bpeVocab(spark, dir))
        time("dict_rebuild") { run(dict) }
        time("e03_full_cleared") {
          spark.catalog.clearCache()
          run(Pipeline.incrementAppend(spark, dir))
        }
        time("e03_full_cleared2") {
          spark.catalog.clearCache()
          run(Pipeline.incrementAppend(spark, dir))
        }
      case "q14" =>
        import org.apache.spark.sql.functions._
        // A/B the histogram build key: string col_name (current) vs
        // int ordinal mapped back after aggregation.
        val cols = Kpis.quantileCols
        val li = Tables.balanced(Tables.lineitem(spark, dir))
        val strArgs = cols.map(c => s"'$c', $c").mkString(", ")
        val strHist = li.select(expr(
            s"stack(${cols.size}, $strArgs) AS (col_name, v)"))
          .groupBy("col_name", "v").agg(count(lit(1)).as("cnt"))
        val ordArgs = cols.zipWithIndex
          .map { case (c, i) => s"$i, $c" }.mkString(", ")
        val ordHist = li.select(expr(
            s"stack(${cols.size}, $ordArgs) AS (ord, v)"))
          .groupBy("ord", "v").agg(count(lit(1)).as("cnt"))
        time("hist_string_1") { run(strHist) }
        time("hist_ordinal_1") { run(ordHist) }
        time("hist_string_2") { run(strHist) }
        time("hist_ordinal_2") { run(ordHist) }
        println("PROBE distinct_rows " + ordHist.count())
        spark.catalog.clearCache()
        time("q14_full_cold") { run(Kpis.quantiles(spark, dir)) }
      case "shingle" =>
        import org.apache.spark.sql.functions._
        // isolate the shingle kernel from scan / sort / persist cost
        ShingleFps.register(spark)
        val docs = Tables.documents(spark, dir)
        time("scan_only") { run(docs.select(col("doc_id"),
          length(col("text")).as("n"))) }
        time("kernel") { run(docs.select(col("doc_id"),
          expr("shingle_fps(text)").as("fps"))) }
        time("kernel_sorted") { run(docs.select(col("doc_id"),
          array_sort(expr("shingle_fps(text)")).as("fps"))) }
        time("kernel_again") { run(docs.select(col("doc_id"),
          expr("shingle_fps(text)").as("fps"))) }
        println("PROBE total_shingles " + docs
          .select(expr("shingle_fps(text)").as("fps"))
          .selectExpr("coalesce(sum(size(fps)), 0)").first().getLong(0))
        println("PROBE total_chars " + docs
          .selectExpr("coalesce(sum(length(text)), 0)").first().getLong(0))
      case "cand" =>
        // candidates-per-doc growth: the d11 scale invariant's raw data
        val n = Tables.documents(spark, dir).count()
        val c = Dedup.lshCandidates(spark, dir).count()
        println(s"PROBE docs $n cands $c per_doc ${c.toDouble / n}")
      case "bpedist" =>
        // bank the executor-side trainer at vocabulary stress
        // (round-18 "next" 1): full 32k train through BOTH paths on
        // the same pruned dictionary, bit-identity asserted on the
        // whole result, wall + driver-retained state printed for
        // SCALE.md. SPARK_GRAFT_PROBE_MF picks the pruning regime
        // (default 1 = exact); SPARK_GRAFT_PROBE_SKIP_DRIVER=1 skips
        // the in-memory leg (for corpora where the driver number is
        // already banked and only the distributed wall is wanted).
        import org.apache.spark.sql.functions.col
        val vocab = Text.bpeVocab(spark, dir)
        vocab.write.format("noop").mode("overwrite").save()
        val mf = sys.env.getOrElse("SPARK_GRAFT_PROBE_MF", "1").toLong
        val pruned = vocab.filter(col("freq") >= mf).select("freq", "sym")
        val nDict = pruned.count()
        println(s"PROBE bpedist dict_rows $nDict minFreq $mf")
        val rounds = Text.bpeProdVocabTarget - 256
        val ck = Text.bpeLargeVocabTarget - 256
        var t0 = System.nanoTime()
        val dist = BpeDist.train(spark, pruned, rounds, checkpointRound = ck)
        val distSec = (System.nanoTime() - t0) / 1e9
        println(f"PROBE bpedist dist_train $distSec%.1f s " +
          s"merges ${dist.merges.length} steps ${BpeDist.lastSteps} " +
          s"exhausted ${dist.exhausted} " +
          s"tokens_final ${dist.tokensFinal}")
        if (!sys.env.get("SPARK_GRAFT_PROBE_SKIP_DRIVER").contains("1")) {
          t0 = System.nanoTime()
          val dict = pruned.collect()
            .map(r => (r.getLong(0), r.getString(1))).toSeq
          val collectSec = (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime()
          val drv = Text.bpeTrainDriver(dict, rounds, checkpointRound = ck)
          val drvSec = (System.nanoTime() - t0) / 1e9
          println(f"PROBE bpedist driver_collect $collectSec%.1f s " +
            f"driver_train $drvSec%.1f s merges ${drv.merges.length}")
          val same = dist == drv
          println(s"PROBE bpedist bit_identical $same")
          require(same, "distributed train diverged from the driver trainer")
        }

      case "retrcurve" =>
        // recall-vs-candidate-volume curve for the IVF retrieval
        // (round-18 "next" 3): sweep nprobe at the default shortlist,
        // then shortlist K at full probing — separates cell-miss loss
        // (recovered by probes) from coarse-shortlist loss (recovered
        // by K). Each point prints mean recall@5 over the query set
        // and the mean per-query candidate volume (Σ probed-cell
        // chunk occupancy — the cost the probes actually buy).
        // SCALE.md banks the rows; s17 gates the chosen ≥0.9 point.
        import org.apache.spark.sql.functions._
        val nVecs = Similarity.retrNVecs(spark, dir)
        val cells = Similarity.retrCellsFor(nVecs)
        val def_ = Similarity.retrProbeFor(cells)
        val chunks = Similarity.retrChunks(spark, dir)
        val occ = chunks
          .join(Similarity.retrAssigned(spark, dir), "vec_id")
          .groupBy("cell").agg(count(lit(1)).as("occ"))
        println(s"PROBE retrcurve nvecs $nVecs cells $cells nprobe_def $def_")
        def point(nPr: Int, k: Int): Unit = {
          val rec = Similarity.retrievalRecallAt(spark, dir, nPr, k)
            .agg(avg("recall"), count(lit(1))).first()
          val cand = Similarity.retrProbesAt(spark, dir, nPr)
            .join(occ, "cell")
            .agg((sum("occ") / countDistinct("q_id")).cast("double"))
            .first().getDouble(0)
          println(f"PROBE retrcurve nprobe $nPr K $k " +
            f"mean_recall ${rec.getDouble(0)}%.4f " +
            f"queries ${rec.getLong(1)} cand_per_q $cand%.1f")
        }
        def flatPoint(nPr: Int): Unit = {
          val top = Similarity.retrievalFlatTop5(spark, dir,
            chunks, "chunk_key", nPr)
          val rec = Similarity.recallAgainstExact(spark, dir, top)
            .agg(avg("recall"), count(lit(1))).first()
          val cand = Similarity.retrProbesAt(spark, dir, nPr)
            .join(occ, "cell")
            .agg((sum("occ") / countDistinct("q_id")).cast("double"))
            .first().getDouble(0)
          println(f"PROBE retrcurve FLAT nprobe $nPr " +
            f"mean_recall ${rec.getDouble(0)}%.4f " +
            f"queries ${rec.getLong(1)} cand_per_q $cand%.1f")
        }
        val sweep = Seq(def_, 2 * def_, 4 * def_, cells)
          .map(math.min(_, cells)).distinct
        for (p <- sweep) point(p, Similarity.retrShortlistK)
        for (k <- Seq(40, 80, 160)) point(cells, k)
        for (k <- Seq(40, 80)) point(math.min(4 * def_, cells), k)
        // the s17 path: full-dim scoring — recall loss is cell misses
        // only, nprobe is the whole lever
        for (p <- sweep) flatPoint(p)

      case "vstress" =>
        // Vocabulary-stress measurement of the BPE trainer's one
        // driver-growth path (round-16 verdict "next" 1): the
        // (freq, sym) dictionary collect is corpus-FLAT but
        // vocabulary-SIZED, and `spark.graft.bpeMinFreq` df-pruning
        // is the documented relief valve. Run against a GenData
        // `vstress` corpus (≥5M distinct words at sf3); prints, per
        // minFreq ∈ {1, 2, 3}: dictionary rows collected, collect
        // wall + retained driver heap, 32k-train wall + peak heap,
        // merges learned, and the full-dictionary rank-cursor encode
        // wall — the numbers SCALE.md banks.
        import java.lang.management.{ManagementFactory, MemoryType}
        import scala.jdk.CollectionConverters._
        def heapUsed(): Long = {
          System.gc(); System.gc(); Thread.sleep(300)
          val r = Runtime.getRuntime; r.totalMemory - r.freeMemory
        }
        def resetPeaks(): Unit = ManagementFactory.getMemoryPoolMXBeans
          .asScala.foreach(_.resetPeakUsage())
        def peakHeap(): Long = ManagementFactory.getMemoryPoolMXBeans
          .asScala.filter(_.getType == MemoryType.HEAP)
          .map(_.getPeakUsage.getUsed).sum
        import org.apache.spark.sql.functions.col
        val vocab = Text.bpeVocab(spark, dir)
        vocab.write.format("noop").mode("overwrite").save() // warm memo
        val nDict = vocab.count()
        val nTok = vocab.selectExpr("sum(freq)").first().getLong(0)
        println(s"PROBE dict_rows_total $nDict corpus_tokens $nTok")
        val mfs = sys.env.get("SPARK_GRAFT_PROBE_MF")
          .map(_.split(",").toSeq.map(_.trim.toLong))
          .getOrElse(Seq(1L, 2L, 3L))
        for (mf <- mfs) {
          val h0 = heapUsed()
          var t0 = System.nanoTime()
          val dict = vocab.filter(col("freq") >= mf)
            .select("freq", "sym").collect()
            .map(r => (r.getLong(0), r.getString(1))).toSeq
          val collectSec = (System.nanoTime() - t0) / 1e9
          val hDict = heapUsed() - h0
          resetPeaks()
          t0 = System.nanoTime()
          val res = Text.bpeTrainDriver(dict,
            Text.bpeProdVocabTarget - 256,
            checkpointRound = Text.bpeLargeVocabTarget - 256)
          val trainSec = (System.nanoTime() - t0) / 1e9
          val peakGb = peakHeap() / 1e9
          println(f"PROBE mf$mf rows ${dict.size} collect $collectSec%.2f" +
            f" s dict_heap ${hDict / 1e9}%.2f GB train $trainSec%.2f s" +
            f" peak_heap $peakGb%.2f GB merges ${res.merges.length}" +
            f" exhausted ${res.exhausted} tokens_final ${res.tokensFinal}")
          // the rank-cursor encode over the FULL (unpruned) dictionary
          // under this table — the serving-side cost of a pruned train
          // — and the CORPUS-weighted token total (Σ freq·n), the
          // fertility a pruned vocabulary actually costs at serve time
          t0 = System.nanoTime()
          val enc = Text.bpeIdsDictUnder(spark, dir, res)
            .join(vocab.select("word", "freq"), "word")
            .selectExpr("sum(n)", "sum(CAST(rt_ok AS INT))",
              "sum(freq * n)")
            .first()
          println(f"PROBE mf$mf encode ${(System.nanoTime() - t0) / 1e9}%.2f" +
            s" s tokens ${enc.getLong(0)} rt_ok ${enc.getLong(1)} of" +
            s" $nDict corpus_tokens ${enc.getLong(2)}")
        }
      case other =>
        System.err.println(s"unknown probe set: $other")
    }
    spark.stop()
    sys.exit(0)
  }
}
