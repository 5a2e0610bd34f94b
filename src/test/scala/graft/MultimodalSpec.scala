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

  test("mm03 decodes REAL PNG bytes and recovers the closed-form pixels") {
    // re-run just the encode half standalone to inspect the payloads
    val s = spark
    import s.implicits._
    val payloads = Tables.documents(spark, sfDir).select("doc_id")
      .as[Long].limit(5).collect().map { id =>
      val w = (8 + id % 16).toInt
      val h = (8 + (id / 16) % 16).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.getRaster.setSample(x, y, 0, ((id * 31 + x * 7 + y * 13) % 256).toInt)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      id -> bos.toByteArray
    }
    payloads.foreach { case (_, p) =>
      // genuine PNG container: 8-byte signature, not a raw raster dump
      assert(p.take(8).map(_ & 0xff).toSeq ===
        Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    }
    // and the full query's decoded features equal the closed form
    val got = Multimodal.pngRoundtrip(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    payloads.foreach { case (id, _) =>
      val w = 8 + id % 16
      val h = 8 + (id / 16) % 16
      val expectSum = (for { y <- 0L until h; x <- 0L until w }
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(got(id) === ((w, h, expectSum)))
    }
  }

  test("mm05 samples every 2nd frame and decodes only the kept ones") {
    val rows = Multimodal.frameSample(spark, sfDir).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val nf = r.getLong(1)
      assert(nf === 4 + id % 9)
      // ceil(nf / stride) frames survive the stride
      assert(r.getLong(2) === (nf + Multimodal.frameStride - 1) /
        Multimodal.frameStride)
      assert(r.getLong(3) === 8 + id % 8)
      assert(r.getLong(4) === 8 + (id / 8) % 8)
      // sampled-frame pixel sum equals the closed form
      val (w, h) = (r.getLong(3), r.getLong(4))
      val expect = (for {
        f <- 0L until nf if f % Multimodal.frameStride == 0
        y <- 0L until h; x <- 0L until w
      } yield (id * 31 + f * 17 + x * 7 + y * 13) % 256).sum
      assert(r.getLong(5) === expect)
    }
  }

  test("mm07 resize halves both dims; kernel means bound the pixel sum") {
    val rows = Multimodal.imageResize(spark, sfDir).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === 8 + (id % 8) * 2)
      assert(r.getLong(2) === 8 + ((id / 8) % 8) * 2)
      assert(r.getLong(3) === r.getLong(1) / 2)
      assert(r.getLong(4) === r.getLong(2) / 2)
      // the decoded resized sum equals the closed-form box filter
      val (rw, rh) = (r.getLong(3), r.getLong(4))
      val expect = (for { y <- 0L until rh; x <- 0L until rw } yield
        ((id * 31 + 2 * x * 7 + 2 * y * 13) % 256 +
          (id * 31 + (2 * x + 1) * 7 + 2 * y * 13) % 256 +
          (id * 31 + 2 * x * 7 + (2 * y + 1) * 13) % 256 +
          (id * 31 + (2 * x + 1) * 7 + (2 * y + 1) * 13) % 256) / 4).sum
      assert(r.getLong(5) === expect)
    }
  }

  test("mm06 resample halves the rate and keeps the decimated samples") {
    val rows = Multimodal.audioResample(spark, sfDir).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === 8000L && r.getLong(2) === 4000L)
      val n = 256 + id % 512
      assert(r.getLong(3) === n)
      assert(r.getLong(4) === (n + 1) / Multimodal.resampleFactor)
      val expect = (0L until n).filter(_ % 2 == 0)
        .map(i => (id * 7 + i * 31) % 65536 - 32768).sum
      assert(r.getLong(6) === expect)
    }
  }
}
