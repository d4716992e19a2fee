package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Privacy-governance operators over a table with quasi-identifier columns —
 * the release-gate checks a data pipeline runs BEFORE publishing a training
 * corpus or analytics extract (Sweeney, "k-anonymity: a model for protecting
 * privacy", IJUFKS 2002; Machanavajjhala et al., "l-diversity", TKDD 2007).
 *
 * The reference engine (two CLI binaries, /root/reference/src/bin/) has no
 * governance surface; this is blueprint extension work.
 *
 * Scale notes (100 TB): every op reduces the table to its EQUIVALENCE-CLASS
 * relation first — one hash shuffle on the quasi-identifier tuple, map-side
 * combinable counts, and everything downstream (profiling, the suppression
 * join) runs on |distinct quasi tuples| rows, which is bounded by the
 * identifier domain, not the corpus. Suppression joins the class relation
 * back with a BROADCAST equi-join, so the raw rows shuffle zero times.
 */
object Privacy {

  /**
   * k-anonymity / l-diversity profile: one row per quasi-identifier
   * equivalence class with its size (`class_n`), the number of DISTINCT
   * sensitive values inside it (`l_distinct`), and the two violation flags.
   * A class is k-anonymous when at least k rows share its quasi tuple, and
   * l-diverse when the sensitive attribute takes at least l values in it —
   * the profile is what a release audit reads, and [[suppress]] enforces.
   */
  def kAnonymityProfile(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      k: Int,
      l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column required")
    require(k >= 1, s"k must be >= 1, got $k")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_n"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
      .withColumn("k_violation", col("class_n") < k)
      .withColumn("l_violation", col("l_distinct") < l)
  }

  /**
   * Suppression enforcement: drop every row whose quasi-identifier
   * equivalence class has fewer than k members (the classic cell-suppression
   * release rule — the surviving relation is k-anonymous by construction).
   * The violating-class relation is small (bounded by the quasi domain), so
   * it broadcasts; the input streams through one broadcast hash anti-join.
   */
  def suppress(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column required")
    require(k >= 1, s"k must be >= 1, got $k")
    val violating = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__class_n"))
      .filter(col("__class_n") < k)
      .select(quasiCols.map(c => col(c).as(s"__v_$c")): _*)
    val cond = quasiCols.map(c => df(c) <=> violating(s"__v_$c")).reduce(_ && _)
    df.join(broadcast(violating), cond, "left_anti")
  }

  /**
   * Keyed pseudonymization: replace each direct-identifier column with a
   * salted SHA-256 token (`sha256(salt || '|' || value)` hex). Tokens are
   * DETERMINISTIC per (salt, value) — referential integrity survives
   * (joins on the pseudonym still work across tables sharing the salt) —
   * while reversal requires the salt, which lives in the release config,
   * not the data. NULL identifiers stay NULL (no phantom token class).
   *
   * This is the GDPR-article-4(5) pseudonymization shape every training-
   * corpus release pipeline needs next to [[suppress]]: suppression
   * handles quasi-identifiers, pseudonymization handles direct ones.
   * Scan-fused codegen (one sha2 per cell, no shuffle, no UDF).
   */
  def pseudonymize(df: DataFrame, idCols: Seq[String], salt: String): DataFrame = {
    require(idCols.nonEmpty, "at least one identifier column required")
    require(salt.nonEmpty, "empty salt defeats the purpose — pass a release key")
    idCols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(col(c).isNull, lit(null: String))
          .otherwise(sha2(concat_ws("|", lit(salt), col(c).cast("string")), 256)))
    }
  }

  /**
   * Differential-privacy noise for released aggregates: adds
   * `<valCol>_dp = valCol + Laplace(sensitivity / epsilon)` (Dwork et al.,
   * "Calibrating Noise to Sensitivity in Private Data Analysis", TCC 2006
   * — the epsilon-DP mechanism for counting/sum queries). The draw is
   * DETERMINISTIC per (seed, key tuple): an md5-derived 52-bit uniform
   * through the inverse Laplace CDF `-scale * sign(u) * ln(1 - 2|u|)` —
   * so a re-released aggregate carries the SAME noise (re-release with
   * fresh noise would average it away; the portable-hash discipline is
   * the q13 md5-rank sampler's). Engine-side `ln` makes this rows-only
   * (libm), like every RNG op here; the spec pins determinism,
   * partitioning-immunity, the empirical scale, and exact 1/epsilon
   * scaling.
   *
   * Scale: scan-fused expression — no shuffle, no UDF, no state.
   */
  def withLaplaceNoise(
      df: DataFrame, valCol: String, keyCols: Seq[String],
      epsilon: Double, sensitivity: Double, seed: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(sensitivity > 0, s"sensitivity must be positive, got $sensitivity")
    require(keyCols.nonEmpty, "need key columns to derive the per-row draw")
    val scale = sensitivity / epsilon
    // 52 hex-prefix bits -> uniform on (0,1) (the +0.5 keeps it off 0)
    val u01 = (conv(substring(md5(concat_ws("|",
        (lit(seed) +: keyCols.map(c => col(c).cast("string"))): _*)), 1, 13),
      16, 10).cast("double") + 0.5) / lit(4503599627370496.0)
    val u = u01 - 0.5
    // clamp the ln argument away from 0: |noise| caps at ~36*scale
    val mag = -lit(scale) * log(greatest(lit(1.0) - abs(u) * 2.0, lit(1e-16)))
    df.withColumn(s"${valCol}_dp",
      col(valCol).cast("double") + signum(u) * mag)
  }
}
