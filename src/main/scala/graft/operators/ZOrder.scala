package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) data layout — multi-dimensional clustering for
  * scan pruning, the write-side operator behind `OPTIMIZE ... ZORDER
  * BY` in lakehouse engines: interleaving the bits of two dimension
  * keys and sorting by the result makes every file/row-group cover a
  * RECTANGLE in (d1, d2) space instead of a full-width stripe, so
  * min/max footer stats prune scans filtered on EITHER dimension.
  * At 100 TB this is the difference between reading a few percent of
  * files and reading everything for the second predicate.
  *
  * The interleave is plain integer arithmetic (div/mod/multiply —
  * no engine bit intrinsics), so the same formula runs identically in
  * Spark and DuckDB and the derived key is hash-gateable (c05).
  */
object ZOrder {

  val bits = 8 // per dimension → 16-bit Morton key
  private val mask = (1 << bits) - 1

  /** Portable nonnegative 8-bit mask. Truncating `div` (Spark) vs
    * flooring `//` (DuckDB) and sign-of-dividend `%` would make an
    * unmasked NEGATIVE dimension interleave to divergent (and
    * non-bijective) keys across engines, so the mask lives HERE, not
    * by caller convention. `(x % 256 + 256) % 256` is engine-agnostic:
    * both engines' `%` carries the dividend's sign, so the double-mod
    * lands in [0, 255] in both, and is the identity for inputs already
    * in range (existing c05 hashes unchanged).
    */
  private def nonneg(x: String) =
    s"(((($x) % ${mask + 1}) + ${mask + 1}) % ${mask + 1})"

  /** Spark SQL spelling of the 8×8-bit Morton interleave of `a`,`b`. */
  def interleaveExpr(a: String, b: String): String = {
    val (ma, mb) = (nonneg(a), nonneg(b))
    (0 until bits).map { i =>
      s"(($ma div ${1 << i}) % 2) * ${1L << (2 * i)} + " +
        s"(($mb div ${1 << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")
  }

  /** DuckDB spelling — `//` for integer division, otherwise identical. */
  def interleaveSql(a: String, b: String): String = {
    val (ma, mb) = (nonneg(a), nonneg(b))
    (0 until bits).map { i =>
      s"(($ma // ${1 << i}) % 2) * ${1L << (2 * i)} + " +
        s"(($mb // ${1 << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")
  }

  /** Write `df` parquet clustered by the Morton key of (d1, d2):
    * range-partition on the key (files = key ranges = rectangles),
    * sort within partitions (row groups tight), drop the helper key.
    * `parts` defaults to the session's parallelism.
    */
  def writeZOrdered(df: DataFrame, d1: String, d2: String,
                    path: String, parts: Int = 0): Unit = {
    val n = if (parts > 0) parts
      else df.sparkSession.sparkContext.defaultParallelism
    df.withColumn("zkey", expr(interleaveExpr(d1, d2)))
      .repartitionByRange(n, col("zkey"))
      .sortWithinPartitions("zkey")
      .drop("zkey")
      .write.mode("overwrite").parquet(path)
  }
}
