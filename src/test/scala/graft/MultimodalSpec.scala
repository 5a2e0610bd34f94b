package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: the binary schema, the mapPartitions batch
  * shape, and the mixed-media real-codec dispatch.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("media table schema: opaque binary payload + typed metadata") {
    val df = Multimodal.mediaTable(spark, sfDir)
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("payload") === "binary")
    assert(types("media_type") === "string")
    assert(types("n_bytes") === "long")
    assert(df.filter(col("n_bytes") =!= length(col("payload"))).count() === 0)
  }

  test("extractFeatures: every modality matches its codec's closed form") {
    val feats = Multimodal.extractFeatures(spark, sfDir)
    // payload must NOT survive the decode stage
    assert(!feats.schema.fieldNames.contains("payload"))
    val rows = feats.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.media_type).toSet === Set("image", "audio", "video"))
    rows.foreach { f =>
      val id = f.doc_id
      f.media_type match {
        case "image" =>
          val (w, h) = ((8 + id % 16).toInt, (8 + (id / 16) % 16).toInt)
          assert((f.width, f.height, f.n_frames) === ((w, h, 1)))
          val pxSum = (for (y <- 0 until h; x <- 0 until w)
            yield (id * 31 + x * 7 + y * 13) % 256).sum
          assert(f.byte_mean === pxSum.toDouble / (w * h))
        case "audio" =>
          val n = (256 + id % 512).toInt
          assert((f.width, f.height, f.n_frames) === ((0, 0, n)))
          val ampSum = (0 until n).map(i => (id * 7 + i * 31) % 65536 - 32768).sum
          assert(f.byte_mean === ampSum.toDouble / n)
        case _ =>
          val nf = (4 + id % 9).toInt
          val (w, h) = ((8 + id % 8).toInt, (8 + (id / 8) % 8).toInt)
          assert((f.width, f.height, f.n_frames) === ((w, h, nf)))
          val pxSum = (for (fr <- 0 until nf; y <- 0 until h; x <- 0 until w)
            yield (id * 31 + fr * 17 + x * 7 + y * 13) % 256).sum
          assert(f.byte_mean === pxSum.toDouble / (nf.toLong * w * h))
      }
      // payloads are REAL containers: byte length is codec output,
      // strictly larger than any fixed header
      assert(f.n_bytes > 40)
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
