package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PQ invariants beyond the hash oracle. */
class QuantizationSpec extends AnyFunSuite {
  import TestSpark._

  test("codes are in range and every candidate is coded") {
    val cand = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") >= Similarity.nQueries).count()
    val codes = Quantization.pqCodes(spark, sfDir)
    assert(codes.count() === cand)
    val codeCols = (0 until Quantization.m).map(s => col(s"code$s"))
    val bad = codes.filter(
      codeCols.map(c => c < 0 || c >= Quantization.codebookK)
        .reduce(_ || _) || col("qerr") < 0).count()
    assert(bad === 0)
  }

  test("ADC search has real recall against exact lattice L2 top-k") {
    // exact integer-lattice L2 top-k per query, driver-side
    val all = Clustering.quantized(spark, sfDir)
      .select("vec_id", "q").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val (queries, cands) = all.partition(_._1 < Similarity.nQueries)
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val exact = queries.map { case (qid, qv) =>
      qid -> cands.map { case (vid, v) => (d2(qv, v), vid) }
        .sortBy(identity).take(Quantization.topK).map(_._2).toSet
    }.toMap
    val approx = Quantization.pqSearch(spark, sfDir).collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.map(_.getLong(2)).toSet }
    val recalls = exact.map { case (qid, ex) =>
      approx(qid).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    // 4-bit-per-subspace PQ is coarse; demand genuine signal, not
    // perfection: mean recall@10 well above the ~2% random baseline
    assert(mean > 0.2, s"mean recall@10 = $mean")
  }

  test("IVFPQ agrees with full PQ search on every shared (query, vec) pair") {
    val full = Quantization.pqSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val pruned = Quantization.ivfPqSearch(spark, sfDir).collect()
    assert(pruned.nonEmpty)
    var shared = 0
    pruned.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      full.get(key).foreach { d =>
        assert(d === r.getLong(3), s"adist mismatch for $key")
        shared += 1
      }
    }
    // the probed cells genuinely contain near neighbors: a healthy
    // fraction of IVFPQ's picks coincide with the unpruned search
    assert(shared > pruned.length / 4, s"only $shared shared pairs")
  }

  test("streaming PQ coding equals the batch coding row-for-row") {
    val batch = Quantization.pqCodes(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val stream = Quantization.streamingPqCodes(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(stream === batch)
  }

  test("adist is a lower-bound-consistent sum: nonnegative, ranked ascending") {
    val res = Quantization.pqSearch(spark, sfDir).collect()
    res.groupBy(_.getLong(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      val dists = sorted.map(_.getLong(3))
      assert(dists.forall(_ >= 0))
      assert(dists.sameElements(dists.sorted))
    }
  }
}
