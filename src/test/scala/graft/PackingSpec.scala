package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Packing]] — concat-and-chunk invariants beyond the hash oracle. */
class PackingSpec extends AnyFunSuite {
  import TestSpark._

  test("offsets are gap-free prefix sums within each lang shard") {
    val rows = Packing.packChunks(spark, sfDir)
      .select("lang", "doc_id", "n_tok", "tok_offset")
      .collect()
      .groupBy(_.getString(0))
    rows.values.foreach { docs =>
      val sorted = docs.sortBy(_.getLong(1))
      var expect = 0L
      sorted.foreach { r =>
        assert(r.getLong(3) === expect,
          s"offset gap at doc ${r.getLong(1)}")
        expect += r.getInt(2) // size() is IntegerType
      }
    }
  }

  test("chunk placement is consistent with capacity") {
    val bad = Packing.packChunks(spark, sfDir)
      .filter(col("first_chunk") =!= floor(col("tok_offset") / Packing.chunkTokens)
        || col("spans") < 1
        || col("last_chunk") < col("first_chunk"))
      .count()
    assert(bad === 0)
  }

  test("p07 conserves t24's token accounting and covers every document") {
    // Σ n_tok in the packed layout = Σ t24 n_tokens — the shards
    // carry exactly the tokenizer's output, nothing dropped or
    // double-packed (round-15 verdict "next" 2's conservation bar)
    val packed = Packing.packBpeIds(spark, sfDir)
    val pSum = packed.agg(sum("n_tok")).head().getLong(0)
    val tSum = Text.bpeTokenIds(spark, sfDir)
      .agg(sum("n_tokens")).head().getLong(0)
    assert(pSum === tSum)
    assert(packed.count() === Tables.documents(spark, sfDir).count())
    // offsets are gap-free prefix sums within each lang shard (the
    // p01 invariant, re-proven over the real BPE counts)
    packed.select("lang", "doc_id", "n_tok", "tok_offset").collect()
      .groupBy(_.getString(0)).values.foreach { docs =>
        var expect = 0L
        docs.sortBy(_.getLong(1)).foreach { r =>
          assert(r.getLong(3) === expect)
          expect += r.getLong(2)
        }
      }
  }

  test("shard manifest partitions the corpus and is layout-invariant") {
    val docs = Tables.documents(spark, sfDir).count()
    val m = Packing.shardManifest(spark, sfDir).collect()
    assert(m.map(_.getLong(m.head.fieldIndex("docs"))).sum === docs)
    assert(m.forall { r =>
      val s = r.getLong(0); s >= 0 && s < Packing.nShards
    })
    // the XOR checksum must not depend on row order / partitioning
    val again = Packing.shardManifest(spark, sfDir).collect()
    assert(m.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("rag chunks: full coverage with the configured overlap, no gaps") {
    val rows = Packing.ragChunks(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(Text.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 === 1L) // first chunk starts at token 1
      // every token is covered: next start <= previous end + 1
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 <= a._4 + 1)
        case _ =>
      }
      // last chunk reaches the end of the document
      assert(sorted.last._4 === math.max(toks(doc), 1).toLong)
      // consecutive chunks overlap by exactly chunk - stride tokens
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 - a._3 === Packing.ragChunkStride.toLong)
        case _ =>
      }
    }
  }

  test("p05 curriculum plan: conserves the corpus, quality descends by stage") {
    val plan = Packing.curriculumPlan(spark, sfDir).collect()
    // every document lands in exactly one stage
    val total = Tables.documents(spark, sfDir).count()
    assert(plan.map(_.getLong(plan.head.fieldIndex("docs"))).sum === total)
    // cumulative tokens are a prefix sum of stage tokens
    var cum = 0L
    plan.sortBy(_.getInt(0)).foreach { r =>
      cum += r.getLong(r.fieldIndex("stage_tokens"))
      assert(r.getLong(r.fieldIndex("cum_tokens")) === cum)
    }
    // the curriculum is ordered: stage means never increase
    val means = plan.sortBy(_.getInt(0))
      .map(_.getDouble(plan.head.fieldIndex("mean_quality")))
    means.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, s"stage means not descending: $a < $b")
      case _ =>
    }
  }

  test("p06 splits: cluster scheme leaks zero pairs, partitions the corpus") {
    val rows = Packing.leakageSplits(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    Seq("cluster", "naive").foreach { scheme =>
      val rs = rows.filter(_.getString(0) == scheme)
      assert(rs.map(_.getLong(2)).sum === total, s"$scheme splits lose docs")
    }
    // the guarantee the operator exists for: a near-dup pair can
    // never straddle splits when the split key is the cluster id
    rows.filter(_.getString(0) == "cluster")
      .foreach(r => assert(r.getLong(3) === 0, "cluster scheme leaked"))
  }

  test("profile conserves tokens and bounds the tail chunk") {
    val prof = Packing.packProfile(spark, sfDir).collect()
    prof.foreach { r =>
      val total = r.getLong(r.fieldIndex("total_tokens"))
      val chunks = r.getLong(r.fieldIndex("chunks"))
      val tail = r.getLong(r.fieldIndex("tail_tokens"))
      assert(tail > 0 && tail <= Packing.chunkTokens)
      // full chunks + tail = every token, nothing padded or dropped
      assert((chunks - 1) * Packing.chunkTokens + tail === total)
    }
  }
}
