package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the (skewed) big side into
  * `salts` sub-keys and replicate the small side across every salt —
  * the standard manual remedy when one key dominates a shuffle and the
  * small side is too large to broadcast outright. AQE's skew-join
  * handles sort-merge skew automatically; this is the explicit form
  * for deterministic layouts (and for pre-AQE engines).
  *
  * Row multiplication is on the SMALL side only (`salts`×); the big
  * side gets a uniform pseudo-random salt so each hot key spreads over
  * `salts` reducers.
  */
object SaltedJoin {

  def inner(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // deterministic per-row spread: hash the key plus a per-row
    // discriminator so a single hot key still fans out
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
