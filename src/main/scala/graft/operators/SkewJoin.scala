package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew-join salting (build brief: "salting for skew") — the
  * fallback for when AQE's skew-join splitting can't help (e.g. a
  * skewed *broadcast-ineligible* dim, or pre-3.0 clusters).
  *
  * Shape: the skewed fact side appends a uniform salt in [0, n); the
  * dim side is exploded n× with every salt value; the join key becomes
  * (key, salt), spreading each hot key over n reducers. Results are
  * identical to the unsalted join (SkewJoinSpec pins equality); cost
  * is an n× replication of the dim side — cheap when the dim is
  * small-ish but above the broadcast threshold.
  *
  * At 100 TB: AQE skew splitting (on in Tables.configure) is the
  * first line of defense; salting is the deterministic plan-shape
  * guarantee for known-hot keys (e.g. the null/default key of a
  * foreign-key column).
  */
object SkewJoin {

  /** Inner equi-join `fact ⋈ dim` on `key`, salted `nSalts` ways.
    * `fact`'s salt is derived deterministically from a uniform hash of
    * the whole fact row key set — `pmod(hash(monotonically...))` would
    * be nondeterministic under retries, so we hash the join key plus a
    * disambiguating column expression supplied by the caller.
    */
  def saltedInnerJoin(fact: DataFrame, dim: DataFrame, key: String,
                      factSaltSource: Column, nSalts: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(factSaltSource), lit(nSalts)))
    val saltedDim = dim.withColumn("_salt",
      explode(array((0 until nSalts).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
