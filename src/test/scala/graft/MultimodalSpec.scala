package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: the binary schema, the mapPartitions batch
  * shape, and the deterministic stub codec.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._
  import Multimodal.FakeCodec

  test("media table schema: opaque binary payload + typed metadata") {
    val df = Multimodal.mediaTable(spark, sfDir)
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("payload") === "binary")
    assert(types("media_type") === "string")
    assert(types("n_bytes") === "long")
    assert(df.filter(col("n_bytes") =!= length(col("payload"))).count() === 0)
  }

  test("stub codec: deterministic dims, mean, resize, frame sampling") {
    val payload = "hello world, a fake media payload".getBytes("UTF-8")
    assert(FakeCodec.decodeDims(payload) === FakeCodec.decodeDims(payload))
    val (w, h) = FakeCodec.decodeDims(payload)
    assert(w >= 16 && w < 80 && h >= 16 && h < 80)
    val mean = FakeCodec.byteMean(payload)
    assert(mean > 0 && mean < 256)
    assert(FakeCodec.byteMean(Array.emptyByteArray) === 0.0)
    assert(FakeCodec.resize(payload, 8).length === 8)
    assert(FakeCodec.resize(payload, 64).length === 64) // pads
    assert(FakeCodec.sampleFrames(payload, 32).length ===
      (payload.length + 31) / 32)
  }

  test("extractFeatures streams partitions; features match the codec") {
    val feats = Multimodal.extractFeatures(spark, sfDir)
    // payload must NOT survive the decode stage
    assert(!feats.schema.fieldNames.contains("payload"))
    val byId = feats.collect().map(f => f.doc_id -> f).toMap
    val raw = Multimodal.mediaTable(spark, sfDir)
      .select("doc_id", "payload").collect()
    raw.foreach { r =>
      val f = byId(r.getLong(0))
      val p = r.getAs[Array[Byte]]("payload")
      assert((f.width, f.height) === FakeCodec.decodeDims(p))
      assert(f.byte_mean === FakeCodec.byteMean(p))
      assert(f.n_frames === FakeCodec.sampleFrames(p, 32).length)
    }
  }
}
