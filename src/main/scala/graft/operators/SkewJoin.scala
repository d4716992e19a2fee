package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Explicit salting for skewed equi-joins.
 *
 * AQE's runtime skew-join splitting (`spark.sql.adaptive.skewJoin.*`)
 * handles most skew adaptively and is the first tool to reach for; explicit
 * salting still matters when the plan must be fixed up front — e.g. a hot
 * key known at design time (null-surrogate keys, celebrity users) whose
 * single reducer would otherwise spill or OOM regardless of how AQE splits
 * file-level partitions.
 */
object SkewJoin {

  /**
   * Inner equi-join with the big side's hot keys spread over `salts`
   * reducers: each big row gets one pseudo-random salt, the small side is
   * replicated `salts` times, and the join key becomes (key, salt).
   * Exactly equivalent to `big.join(small, key)` — every big row still
   * meets every matching small row exactly once (against its one salted
   * replica).
   *
   * Cost: small side shuffles `salts` copies — keep `salts` near the ratio
   * (hottest key count / average key count), not higher.
   */
  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      seed: Long = 42L): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val bigS = big.withColumn("__graft_salt", (rand(seed) * salts).cast("int"))
    val smallS = small.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__graft_salt"), "inner").drop("__graft_salt")
  }
}
