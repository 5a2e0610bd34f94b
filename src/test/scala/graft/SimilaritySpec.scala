package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Similarity-search invariants: hyperplane determinism, cosine
  * self-identity, rank shape, bucket range.
  */
class SimilaritySpec extends AnyFunSuite {
  import TestSpark._

  test("hyperplanes: 8 planes × 64 dims, all in [-1, 1], deterministic") {
    val p = Similarity.planes
    assert(p.size === 8)
    assert(p.forall(_.size === 64))
    assert(p.flatten.forall(v => v >= -1.0 && v <= 1.0))
    // distinct planes (not all the same constant)
    assert(p.flatten.distinct.size > 100)
  }

  test("brute-force top-k: rank 1..5 per query, cosine within [-1, 1]") {
    val df = Similarity.cosineTopK(spark, sfDir).cache()
    val perQuery = df.groupBy("q_id").agg(
      count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
    assert(perQuery.filter(col("n") =!= 5 || col("lo") =!= 1 || col("hi") =!= 5)
      .count() === 0)
    assert(df.filter(col("cosine") < -1.0 || col("cosine") > 1.0).count() === 0)
    // ranks are ordered by non-increasing cosine within each query
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy("rank")
    assert(df.withColumn("prev", lag("cosine", 1).over(w))
      .filter(col("prev").isNotNull && col("cosine") > col("prev"))
      .count() === 0)
    df.unpersist()
  }

  test("cosine self-similarity is 1.0 after round4") {
    val emb = Tables.embeddings(spark, sfDir).limit(20)
    val self = emb.select(col("vec_id"), col("embedding").as("a"),
        col("embedding").as("b"))
      .withColumn("dot", expr(
        """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          |CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin))
      .withColumn("nrm", sqrt(col("dot")))
      .select(Exact.round4(col("dot") / (col("nrm") * col("nrm"))).as("cos"))
    assert(self.filter(col("cos") =!= 1.0).count() === 0)
  }

  test("LSH buckets are within [0, 255] and stable across evaluations") {
    val a = Similarity.lshAnn(spark, sfDir).collect()
    val b = Similarity.lshAnn(spark, sfDir).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.forall { r =>
      val bkt = r.getAs[Int]("bucket"); bkt >= 0 && bkt <= 255
    })
  }

  test("multi-probe ANN dominates single-bucket ANN in recall") {
    val single = Similarity.lshAnn(spark, sfDir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Similarity.multiProbeAnn(spark, sfDir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every query keeps >= as many candidates; with top-k re-ranking the
    // multi-probe result can swap members but never serves fewer queries
    val singleQs = single.map(_._1)
    val multiQs = multi.map(_._1)
    assert(singleQs.subsetOf(multiQs))
    assert(multi.size >= single.size)
  }

  test("IVF cells partition the corpus: occupancy sums to vector count") {
    val total = Tables.embeddings(spark, sfDir).count()
    val cells = Similarity.ivfCells(spark, sfDir)
      .agg(sum("n_vectors")).head().getLong(0)
    assert(cells === total)
  }

  test("LSH ANN results are a subset of brute-force candidate space") {
    // every (q_id, vec_id) pair found by LSH exists in the full space
    // with the same cosine the brute-force path computes
    val lsh = Similarity.lshAnn(spark, sfDir)
      .select("q_id", "vec_id", "cosine")
    val brute = Similarity.cosineTopK(spark, sfDir)
      .select(col("q_id"), col("vec_id"), col("cosine").as("bf_cos"))
    val joined = lsh.join(brute, Seq("q_id", "vec_id"), "inner")
    assert(joined.filter(col("cosine") =!= col("bf_cos")).count() === 0)
  }

  test("int8-quantized top-5 agrees with full-precision top-5 (recall >= 0.8)") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(spark, sfDir))
    val quant = pairs(Similarity.quantizedTopK(spark, sfDir))
    assert(quant.size === exact.size)
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.8, f"quantized recall $recall%.2f too low")
  }

  test("s12 coarse rerank: exact scores, high agreement with brute force") {
    val rr = Similarity.coarseRerank(spark, sfDir)
    // stage-2 scores are the full-precision cosine: any (q, vec) pair
    // shared with s01 must carry the identical score
    val brute = Similarity.cosineTopK(spark, sfDir)
      .select(col("q_id"), col("vec_id"), col("cosine").as("bf_cos"))
    val joined = rr.join(brute, Seq("q_id", "vec_id"), "inner")
    assert(joined.filter(col("cosine") =!= col("bf_cos")).count() === 0)
    // a 50-deep 32-dim shortlist should recover most of the exact top-5
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(spark, sfDir))
    val got = pairs(rr)
    assert(got.size === exact.size)
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.6, f"coarse-rerank recall $recall%.2f too low")
  }

  test("s13 radius search: exactly the above-threshold slice of the space") {
    val rs = Similarity.radiusSearch(spark, sfDir).cache()
    assert(rs.filter(col("cosine") < Similarity.radiusTheta).count() === 0)
    // agreement with s01: any exact-top-5 pair above θ must be found,
    // with the identical score
    val brute = Similarity.cosineTopK(spark, sfDir)
      .filter(col("cosine") >= Similarity.radiusTheta)
      .select(col("q_id"), col("vec_id"), col("cosine").as("bf"))
    assert(brute.join(rs, Seq("q_id", "vec_id"), "left_anti").count() === 0)
    assert(brute.join(rs, Seq("q_id", "vec_id"))
      .filter(col("bf") =!= col("cosine")).count() === 0)
    rs.unpersist()
  }

  test("IVF search: every query answered from probed cells, recall vs exact") {
    val ivf = Similarity.ivfSearch(spark, sfDir)
    val rows = ivf.select("q_id", "vec_id", "cosine").collect()
    // all queries served, 3 ranked hits each
    assert(rows.map(_.getLong(0)).distinct.length === Similarity.nQueries)
    assert(rows.length === Similarity.nQueries * 3)
    // IVF's top-3 should mostly agree with the exact top-5 superset —
    // nProbe=2 of 8 cells scans ~a quarter of the corpus, and near
    // neighbors concentrate in the query's nearest cells
    val exact = Similarity.cosineTopK(spark, sfDir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect got).size.toDouble / got.size
    assert(recall >= 0.5, f"IVF precision-vs-exact $recall%.2f too low")
  }

  test("kNN join: one nearest neighbor per non-singleton-bucket vector") {
    val knn = Similarity.knnJoin(spark, sfDir).collect()
    // one row per covered vector, never a self-match
    assert(knn.map(_.getLong(0)).distinct.length === knn.length)
    knn.foreach(r => assert(r.getLong(0) !== r.getLong(1)))
    val total = Tables.embeddings(spark, sfDir).count()
    assert(knn.length > 0 && knn.length <= total)
    knn.foreach(r => assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
    // symmetry of the underlying metric: when a→b and b→a both chose
    // each other, the two rows carry the identical cosine
    val byId = knn.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val mutual = byId.filter { case (a, (b, _)) => byId.get(b).exists(_._1 == a) }
    assert(mutual.nonEmpty, "expected at least one mutual-NN pair")
    mutual.foreach { case (a, (b, c)) => assert(byId(b)._2 === c) }
  }

  test("scaled LSH planes: occupancy-driven, zero below driver scales") {
    import Similarity.{bucketTarget, extraPlanes, nPlanes}
    // every driver testdata scale stays on the base 8 planes — the
    // fixed-plane oracle SQL remains valid exactly where it is checked
    assert(extraPlanes(200L) === 0)
    assert(extraPlanes(2000L) === 0)
    assert(extraPlanes(bucketTarget << nPlanes) === 0) // boundary
    assert(extraPlanes((bucketTarget << nPlanes) + 1) === 1)
    // GenData sf10 (200k vectors) refines to 4096 buckets (~49/bucket)
    assert(extraPlanes(200000L) === 4)
    // monotone, and occupancy never exceeds target post-refinement
    var prev = 0
    for (e <- 10 to 30) {
      val n = 1L << e
      val x = extraPlanes(n)
      assert(x >= prev); prev = x
      assert(n <= (bucketTarget << (nPlanes + x)))
    }
  }

  test("scaled-bucket oracle gates mirror extraPlanes thresholds") {
    import Similarity.{bucketTarget, nPlanes}
    // the s03/s08 oracle unrolls extraPlanes' while-loop as count-
    // gated CASEs: refinement plane p fires iff COUNT(*) exceeds
    // bucketTarget·2^p — the exact condition under which extraPlanes
    // admits it. Pin the first gates and that both consumers carry
    // the scaled spelling (a fixed-plane oracle diverged at gensf1).
    val sql = Similarity.duckScaledBucketExpr
    for (p <- nPlanes until nPlanes + 4) {
      assert(sql.contains(s"> ${bucketTarget << p}"),
        s"missing count gate for plane $p")
      assert(sql.contains(s"THEN ${1L << p} ELSE 0"),
        s"missing weight for plane $p")
    }
    assert(Similarity.nearDupPairsSql.contains(sql))
    assert(Similarity.knnJoinSql.contains(sql))
  }

  test("s14 candidate volume = sum of probed-cell chunk occupancy, never all-pairs") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    // the s08-style occupancy invariant: the coarse stage's candidate
    // count, measured two structurally different ways — (a) the
    // pipeline's own candidate join, (b) per-cell chunk occupancy ×
    // the number of queries probing that cell — must agree, and must
    // sit strictly under the all-pairs product the IVF probe exists
    // to avoid
    val chunks = Similarity.retrChunks(spark, sfDir)
    val assigned = Similarity.retrAssigned(spark, sfDir)
      .select("vec_id", "cell")
    val probes = Similarity.retrProbes(spark, sfDir).select("q_id", "cell")
    val joinCount = chunks.join(assigned, "vec_id")
      .join(probes, "cell").count()
    val occ = chunks.join(assigned, "vec_id")
      .groupBy("cell").agg(count(lit(1)).as("n_chunks"))
    val probesPerCell = probes.groupBy("cell")
      .agg(count(lit(1)).as("n_probes"))
    val occVolume = occ.join(probesPerCell, "cell")
      .agg(sum(col("n_chunks") * col("n_probes"))).head().getLong(0)
    assert(joinCount === occVolume)
    val allPairs = Similarity.nQueries * chunks.count()
    assert(occVolume > 0L)
    assert(occVolume < allPairs,
      s"candidate volume $occVolume must stay under all-pairs $allPairs")
    // the final product is exactly top-5 per query
    val r = Similarity.retrievalE2e(spark, sfDir)
    assert(r.count() === Similarity.nQueries * 5L)
  }

  test("s14 IVF sizing: FAISS-convention growth, sublinear candidate bound") {
    // cells ≈ ⌊√N⌋ (min 8), probes ≈ ⌈√cells⌉ (min 2): the centroid
    // broadcast stays bounded and expected candidate volume per query
    // (≈ N·probes/cells ≈ N/√cells) is SUBLINEAR in N — pinned as
    // pure functions so a future constant-8 regression fails by name
    assert(Similarity.retrCellsFor(20L) === 8)       // fixture floor
    assert(Similarity.retrCellsFor(2000L) === 44)    // driver sf0.01
    assert(Similarity.retrCellsFor(200000L) === 447) // gensf1
    assert(Similarity.retrCellsFor(2000000L) === 1414)
    assert(Similarity.retrProbeFor(8) === 3)
    assert(Similarity.retrProbeFor(447) === 22)
    assert(Similarity.retrProbeFor(1414) === 38)
    // candidate fraction (probes/cells) strictly falls as N grows
    val fracs = Seq(2000L, 200000L, 2000000L).map { n =>
      val c = Similarity.retrCellsFor(n)
      Similarity.retrProbeFor(c).toDouble / c
    }
    assert(fracs.sliding(2).forall { case Seq(a, b) => b < a })
  }

  test("s15 recall vs exact: per-query frame well-formed, mean recall floor") {
    import org.apache.spark.sql.functions.{avg, col}
    // recall values are HASH-gated cross-engine (the oracle recomputes
    // both retrievals); here pin the structure and the floor the √N
    // sizing must keep buying: every query answered with exactly 5
    // exact rows, hits within [0, 5], and mean recall ≥ 0.5 on the
    // fixture (measured 0.68 at sf0.01, banked per-SF in SCALE.md)
    val r = Similarity.retrievalRecall(spark, sfDir).collect()
    assert(r.length === Similarity.nQueries)
    r.foreach { row =>
      assert(row.getLong(1) === 5L)
      assert(row.getLong(2) >= 0L && row.getLong(2) <= 5L)
    }
    val mean = Similarity.retrievalRecall(spark, sfDir)
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(mean >= 0.5, f"mean recall $mean%.2f fell under the 0.5 floor")
  }

  test("s16 over the published artifact equals s16 over the in-session plan") {
    import org.apache.spark.sql.functions.{col, expr, lit, min}
    // the artifact-vs-truth closure: retrieval over the chunks READ
    // OFF DISK (e05's published parquet) must be row-identical to the
    // same composition over the in-session shardContents recomputation
    // — a stale, truncated, or re-keyed artifact diverges here even if
    // both sides are internally consistent
    val fromArtifact = Similarity.retrievalArtifact(spark, sfDir).collect()
    val (_, manifest) = Pipeline.shardArtifacts(spark, sfDir)
    val mount = manifest.agg(min("lang").as("lang")).first().getString(0)
    val nVecs = Tables.embeddings(spark, sfDir).count()
    val planChunks = Pipeline.shardContents(spark, sfDir)
      .filter(col("lang") === lit(mount))
      .select(col("chunk_id"),
        expr(s"((chunk_id % 2147483647) * 1299709 + 104729) % 2147483647" +
          s" % $nVecs").as("vec_id"))
    val fromPlan = Similarity.retrievalOverChunks(
      spark, sfDir, planChunks, "chunk_id").collect()
    assert(fromArtifact.nonEmpty)
    assert(fromArtifact.map(_.toString).toSeq ===
      fromPlan.map(_.toString).toSeq)
  }

  // ----- round-18: the measured recall lever (s17) -----

  test("s17 high-recall gate: ≥0.9 floor at the 2×√cells flat operating point") {
    import org.apache.spark.sql.functions.{avg, col}
    // the retrcurve measurement located s14's recall ceiling in the
    // 32-dim coarse shortlist (full probing at K=20 left recall at
    // 0.68–0.76), so the high-recall path scores probed candidates at
    // FULL dimension (IVFFlat) where cell misses are the only loss;
    // at 2×⌈√cells⌉ probes the measured floor clears 0.9 with margin
    // (0.94 sf0.01 / 1.00 sf0.1 — banked in SCALE.md). Values are
    // hash-gated cross-engine; this pins the structure + the floor.
    val r = Similarity.retrievalRecallHi(spark, sfDir).collect()
    assert(r.length === Similarity.nQueries)
    r.foreach { row =>
      assert(row.getLong(1) === 5L)
      assert(row.getLong(2) >= 0L && row.getLong(2) <= 5L)
    }
    val mean = Similarity.retrievalRecallHi(spark, sfDir)
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(mean >= 0.9, f"mean recall $mean%.2f fell under the 0.9 floor")
    // and it strictly dominates (or ties) the default operating point
    val meanDefault = Similarity.retrievalRecall(spark, sfDir)
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(mean >= meanDefault,
      f"high-recall point $mean%.2f under default $meanDefault%.2f")
  }

  test("s17 operating point: probe function pinned, candidate volume still cell-bounded") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    // the probe-count function: exactly 2× the FAISS default, capped
    // at the cell count — a silent constant regression fails by name
    assert(Similarity.retrProbeHiFor(8) === 6)
    assert(Similarity.retrProbeHiFor(22) === 10)
    assert(Similarity.retrProbeHiFor(447) === 44)
    assert(Similarity.retrProbeHiFor(3) === 3) // cap engages
    // occupancy invariant on the FLAT path: its candidate join count
    // equals Σ probed-cell chunk occupancy under the hi probes frame,
    // and stays under all-pairs
    val chunks = Similarity.retrChunks(spark, sfDir)
    val assigned = Similarity.retrAssigned(spark, sfDir)
      .select("vec_id", "cell")
    val nVecs = Tables.embeddings(spark, sfDir).count()
    val hiPr = Similarity.retrProbeHiFor(Similarity.retrCellsFor(nVecs))
    val probes = Similarity.retrProbesAt(spark, sfDir, hiPr)
      .select("q_id", "cell")
    val joinCount = chunks.join(assigned, "vec_id")
      .join(probes, "cell").count()
    val occVolume = chunks.join(assigned, "vec_id")
      .groupBy("cell").agg(count(lit(1)).as("n_chunks"))
      .join(probes.groupBy("cell").agg(count(lit(1)).as("n_probes")), "cell")
      .agg(sum(col("n_chunks") * col("n_probes"))).head().getLong(0)
    assert(joinCount === occVolume)
    assert(occVolume > 0L)
    assert(occVolume < Similarity.nQueries * chunks.count(),
      "flat candidate volume must stay under all-pairs")
  }
}
