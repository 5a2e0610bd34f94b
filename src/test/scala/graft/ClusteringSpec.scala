package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer-lattice k-means invariants beyond the hash oracle. */
class ClusteringSpec extends AnyFunSuite {
  import TestSpark._

  test("every vector gets exactly one cluster in [0, k)") {
    val total = Tables.embeddings(spark, sfDir).count()
    val df = Clustering.kmeansAssign(spark, sfDir)
    assert(df.count() === total)
    assert(df.filter(
      col("cluster") < 0 || col("cluster") >= Clustering.kClusters ||
        col("dist2") < 0).count() === 0)
  }

  test("profile partitions the corpus and inertia sums the distances") {
    val assign = Clustering.kmeansAssign(spark, sfDir)
    val prof = Clustering.kmeansProfile(spark, sfDir)
    val n = prof.agg(sum("n")).head().getLong(0)
    assert(n === assign.count())
    val inertiaA = assign.agg(sum("dist2")).head().getLong(0)
    val inertiaP = prof.agg(sum("inertia")).head().getLong(0)
    assert(inertiaA === inertiaP)
  }

  test("assignment is deterministic across runs (lattice reproducibility)") {
    val a = Clustering.kmeansAssign(spark, sfDir).collect().map(_.toSeq).toSeq
    val b = Clustering.kmeansAssign(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("central sample: quota-capped ranks, and no outsider beats a prototype") {
    val sample = Clustering.centralSample(spark, sfDir)
    val assign = Clustering.kmeansAssign(spark, sfDir)
    val bad = sample.filter(
      col("rank") < 1 || col("rank") > Clustering.centralQuota).count()
    assert(bad === 0)
    // every sampled vector's dist2 is <= every unsampled same-cluster one
    val joined = sample.join(assign, Seq("vec_id", "cluster"))
    val worstIn = joined.groupBy("cluster").agg(max("dist2").as("worst"))
    val outsiders = assign.join(
        sample.select("vec_id"), Seq("vec_id"), "left_anti")
      .groupBy("cluster").agg(min("dist2").as("bestOut"))
    val violations = worstIn.join(outsiders, "cluster")
      .filter(col("worst") > col("bestOut")).count()
    assert(violations === 0)
  }

  test("matches an independent driver-side Lloyd reimplementation") {
    // plain-Scala k-means over the same quantized lattice — an
    // algorithm-level cross-check of the distributed joins/aggregates
    // (third implementation besides Spark and the DuckDB oracle)
    val data = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr(
        s"transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * ${Clustering.quantScale}) AS BIGINT))").as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var cents = data.take(Clustering.kClusters).map(_._2.clone())
    def nearest(q: Array[Long]): (Int, Long) = {
      var best = 0; var bd = d2(q, cents(0)); var c = 1
      while (c < cents.length) {
        val dd = d2(q, cents(c))
        if (dd < bd) { bd = dd; best = c }
        c += 1
      }
      (best, bd)
    }
    for (_ <- 1 to Clustering.lloydIters) {
      val members = data.groupBy { case (_, q) => nearest(q)._1 }
      cents = cents.zipWithIndex.map { case (old, c) =>
        members.get(c) match {
          case Some(ms) =>
            val dim = old.length
            Array.tabulate(dim) { i =>
              val s = ms.map(_._2(i)).sum
              math.floor(s.toDouble / ms.length).toLong
            }
          case None => old
        }
      }
    }
    val expected = data.map { case (id, q) =>
      val (c, dd) = nearest(q); (id, c, dd)
    }.toSeq
    val actual = Clustering.kmeansAssign(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(actual === expected)
  }

  test("km04 elbow: inertia never increases with k, every centroid used") {
    val rows = Clustering.elbowCurve(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq === Clustering.elbowKs)
    rows.foreach(r => assert(r.getLong(2) === r.getInt(0),
      s"k=${r.getInt(0)} left centroids empty"))
    rows.map(_.getLong(1)).sliding(2).foreach {
      case Array(a, b) => assert(a >= b, s"inertia rose with k: $a -> $b")
      case _ =>
    }
    // the k=8 point restates km02's total inertia (same centroids)
    val km02 = Clustering.kmeansProfile(spark, sfDir)
      .agg(sum("inertia")).head().getLong(0)
    assert(rows.last.getLong(1) === km02)
  }
}
