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

  /**
   * Join-key skew diagnostic: the top-k hottest keys with their row
   * counts and shares, next to the table-wide skew ratio
   * `max_count / avg_count` — the report that decides whether a join
   * needs [[saltedInnerJoin]] (and how many salts: the ratio IS the salt
   * count to aim at). One map-side-combined key count, one tiny
   * all-stats aggregate, one TakeOrdered top-k cut — nothing
   * driver-sized but the k rows.
   *
   * Output: (keyCol, cnt, share, n_keys, n_rows, max_cnt, skew_ratio),
   * one row per top key; `share` and `skew_ratio` are single divisions
   * of exact longs.
   */
  def keySkewReport(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"), max(col("cnt")).as("max_cnt"))
    counts.orderBy(col("cnt").desc, col(keyCol).asc).limit(topK)
      .crossJoin(broadcast(stats))
      .select(col(keyCol), col("cnt"),
        (col("cnt").cast("double") / col("n_rows").cast("double")).as("share"),
        col("n_keys"), col("n_rows"), col("max_cnt"),
        ((col("max_cnt") * col("n_keys")).cast("double") /
          col("n_rows").cast("double")).as("skew_ratio"))
  }
}
