package graft

import org.apache.spark.unsafe.types.UTF8String

/** Driver-side microbenchmark for the hot per-row kernels — the
  * feedback loop for single-kernel work that Bench (whole-query) is
  * too coarse for. No SparkSession: the kernels are static JVM
  * methods, so this times exactly the per-row cost an executor pays
  * inside whole-stage codegen.
  *
  * Usage: `sbt "runMain graft.KernelBench"`. Current suites:
  *   - shingle_fps across doc lengths (250 → 64k tokens): pins the
  *     round-12 O(n²) fix — per-token cost must stay ~flat across the
  *     256-shingle flip to the open-addressing set (the pre-fix
  *     linear-scan distinct went quadratic here; see SCALE.md).
  */
object KernelBench {

  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(7)
    val words = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu", "nu", "xi",
      "omicron", "pi")
    def doc(n: Int) = UTF8String.fromString(
      (0 until n).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    println("shingle_fps per-doc cost by length (flat us/token = linear):")
    for (n <- Seq(250, 1000, 4000, 16000, 64000)) {
      val d = doc(n)
      (1 to 5).foreach(_ => ShingleFps.compute(d))
      val reps = math.max(3, 200000 / n)
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => ShingleFps.compute(d))
      val us = (System.nanoTime() - t0) / 1e3 / reps
      println(f"  tokens=$n%6d  $us%10.1f us/doc  (${us / n}%6.3f us/token)")
    }
  }
}
