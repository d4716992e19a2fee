package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic distributed bootstrap confidence intervals for per-group
 * means — the experiment-readout companion to [[RegressionOps.cuped]] and
 * the Welch/Mann-Whitney tests: a nonparametric CI that assumes nothing
 * about the metric's distribution.
 *
 * The classic bootstrap (Efron 1979) resamples n rows WITH replacement B
 * times — n·B indexed draws, unimplementable as a scan. The distributed
 * form is the POISSON bootstrap (Chamandy, Muralidharan, Najmi, Naidu,
 * "Estimating Uncertainty for Massive Data Streams", Google research
 * report 2012; Kleiner et al.'s BLB is the heavier alternative): in
 * resample b, each row independently appears Poisson(1) times, so one scan
 * emits each row's weight for every b and the per-resample mean is
 * Σwx / Σw — a pair of exact integer sums per (group, b).
 *
 * Everything is DETERMINISTIC and cross-engine replayable (the q13
 * portable-sampler discipline):
 *  - the uniform for (row, b) is the first 13 hex chars of
 *    `md5(seed:id:b)` — compared LEXICOGRAPHICALLY against the pinned
 *    [[Bootstrap.PoissonCdfHex52]] thresholds (hex strings of
 *    floor(F(k)·2^52)), so no engine ever parses hex to a float;
 *  - weights are truncated at 9 (P(X>9) ≈ 1e-7) — identically on both
 *    engines, so the truncation is part of the pinned definition;
 *  - per-resample means are ONE IEEE division of exact long sums; the
 *    percentile CI picks order statistics at
 *    `floor((B_eff−1)·q)+1` with ties broken by resample index, and the
 *    quantile fractions are caller-pinned decimal literals (`0.025`,
 *    `0.975`) parsed identically by any engine.
 *
 * Scale shape: the explode multiplies the SCAN by B, but partial
 * aggregation map-side-combines, so only |groups|·B partial rows shuffle;
 * the ranking window is per-group over B rows (bounded by construction,
 * never by the data). B is the accuracy/cost knob — the md5 evaluations
 * are n·B and dominate; callers at 100 TB bootstrap a uniform sample or
 * per-stratum caps first ([[graft.operators.Sampler]]).
 */
object Bootstrap {

  /** floor(F(k)·2^52) for the Poisson(1) CDF, k = 0..8, as 13-digit hex —
    * pinned constants (BootstrapSpec re-derives them from StrictMath.exp
    * and pins equality). A 13-hex-char md5 prefix u satisfies
    * `u < PoissonCdfHex52(k)` iff the 52-bit uniform falls below F(k). */
  val PoissonCdfHex52: Seq[String] = Seq(
    "5e2d58d8b3bce", // F(0) = e^-1
    "bc5ab1b16779c", // F(1)
    "eb715e1dc1583", // F(2)
    "fb23979734a25", // F(3)
    "ff1025f59174e", // F(4)
    "ffd90f3ba4056", // F(5)
    "fffa8b71fc72c", // F(6)
    "ffff540c0914b", // F(7)
    "ffffed1f4aa8f") // F(8)

  /** Poisson(1) weight of a 13-hex-char uniform: first threshold the hex
    * sorts below (hex strings compare like their numeric value), else 9. */
  def poissonWeight(hex13: Column): Column =
    PoissonCdfHex52.zipWithIndex
      .foldLeft(when(lit(false), lit(0))) { case (acc, (t, k)) =>
        acc.when(hex13 < lit(t), lit(k))
      }
      .otherwise(lit(9))

  /**
   * Percentile-bootstrap CI of the per-group mean of `centsCol` (an exact
   * integer metric — the round(x*100) cents discipline).
   *
   * Output per group: `n_rows`, `mean_cents` (Σcents/n, one IEEE
   * division), `ci_lo` / `ci_hi` (percentile-method bounds over the
   * resample means), `b_eff` (resamples with nonzero total weight).
   *
   * `lowerQ`/`upperQ` must be plain decimal literals mirrored verbatim in
   * any replaying engine (`0.025` / `0.975`) — deriving one from the other
   * (1 − α/2) can land an ulp away and flip a floor().
   */
  def bootstrapMeanCi(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      centsCol: String,
      resamples: Int = 200,
      seed: String = "graft-bootstrap",
      lowerQ: Double = 0.025,
      upperQ: Double = 0.975): DataFrame = {
    require(resamples >= 2, s"resamples must be >= 2, got $resamples")
    require(lowerQ > 0 && upperQ < 1 && lowerQ < upperQ,
      s"need 0 < lowerQ < upperQ < 1, got ($lowerQ, $upperQ)")
    val g = groupCols.map(col)

    val hex = substring(md5(concat_ws(":",
      lit(seed), col(idCol).cast("string"), col("__b").cast("string"))), 1, 13)
    val partials = df
      .select((g :+ col(idCol) :+ col(centsCol)): _*)
      .withColumn("__b", explode(sequence(lit(0), lit(resamples - 1))))
      .withColumn("__w", poissonWeight(hex))
      .groupBy((g :+ col("__b")): _*)
      .agg(sum(col("__w").cast("long") * col(centsCol)).as("__swc"),
        sum(col("__w").cast("long")).as("__sw"))
      .filter(col("__sw") > 0)
      .withColumn("__mean", col("__swc").cast("double") / col("__sw").cast("double"))

    val byMean = Window.partitionBy(g: _*).orderBy(col("__mean").asc, col("__b").asc)
    val whole = Window.partitionBy(g: _*)
    val ranked = partials
      .withColumn("__rn", row_number().over(byMean))
      .withColumn("__beff", count(lit(1)).over(whole))
    val loIdx = floor((col("__beff") - 1).cast("double") * lit(lowerQ)).cast("long") + 1
    val hiIdx = floor((col("__beff") - 1).cast("double") * lit(upperQ)).cast("long") + 1
    val ci = ranked.groupBy(g: _*)
      .agg(max(when(col("__rn") === loIdx, col("__mean"))).as("ci_lo"),
        max(when(col("__rn") === hiIdx, col("__mean"))).as("ci_hi"),
        max(col("__beff")).as("b_eff"))

    val stat = df.groupBy(g: _*)
      .agg(count(lit(1)).as("n_rows"),
        (sum(col(centsCol)).cast("double") / count(lit(1)).cast("double")).as("mean_cents"))

    stat.join(ci, groupCols)
      .select((g :+ col("n_rows") :+ col("mean_cents") :+
        col("ci_lo") :+ col("ci_hi") :+ col("b_eff")): _*)
  }
}
