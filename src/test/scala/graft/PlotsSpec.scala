package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[Plots]] — the 05b chart-rasterization analog: real PNG output,
  * deterministic bytes, correct tree layout.
  */
class PlotsSpec extends AnyFunSuite {
  import TestSpark._

  test("nice axis ceiling picks 1/2/5 decades") {
    assert(Plots.niceCeil(0.7) === 1.0)
    assert(Plots.niceCeil(1.0) === 1.0)
    assert(Plots.niceCeil(3.2) === 5.0)
    assert(Plots.niceCeil(7.0) === 10.0)
    assert(Plots.niceCeil(1200) === 2000.0)
    assert(Plots.niceCeil(0) === 1.0)
  }

  test("barChart renders a decodable PNG of the declared size") {
    val png = Plots.barChart(Seq("a", "b", "c"), Seq(1.0, 4.0, 2.5),
      "t", "x", "y")
    assert(png.take(8).map(_ & 0xff).toSeq ===
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth === Plots.Width)
    assert(img.getHeight === Plots.Height)
    // the 4.0 bar on a 0..5 axis fills the top half of the plot area;
    // scan a row through it for bar-colored pixels
    val barRgb = new java.awt.Color(70, 114, 178).getRGB
    val hasBar = (0 until img.getWidth).exists(x => img.getRGB(x, 200) == barRgb)
    assert(hasBar, "expected the max bar to reach the upper plot area")
  }

  test("identical data renders byte-identical PNGs; different data differs") {
    val a1 = Plots.barChart(Seq("a", "b"), Seq(1.0, 2.0), "t", "x", "y")
    val a2 = Plots.barChart(Seq("a", "b"), Seq(1.0, 2.0), "t", "x", "y")
    val b = Plots.barChart(Seq("a", "b"), Seq(2.0, 1.0), "t", "x", "y")
    assert(a1.toSeq === a2.toSeq)
    assert(a1.toSeq !== b.toSeq)
  }

  test("plot tree writes the reference's six 05b charts") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_plots").toString
    val names = Plots.writePlotTree(spark, sfDir, out)
    assert(names === Seq(
      "01_trips_por_payment_type.png", "02_trips_by_hour.png",
      "03_avg_fare_by_hora.png", "04_tip_rate_por_payment_type.png",
      "05_avg_total_by_dist_bucket.png", "06_trips_by_dist_bucket.png"))
    names.foreach { n =>
      val f = new java.io.File(out, n)
      assert(f.isFile && f.length() > 1000, s"$n missing or trivially small")
      val img = javax.imageio.ImageIO.read(f)
      assert(img.getWidth === Plots.Width && img.getHeight === Plots.Height)
    }
  }
}
