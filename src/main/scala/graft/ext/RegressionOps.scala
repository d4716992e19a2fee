package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Closed-form statistics over groups — per-group ordinary least squares and
 * pairwise Pearson correlation — from EXACT sufficient statistics: all five
 * sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulate in DECIMAL (2-decimal inputs
 * ⇒ 4-decimal products, exact), cast to double once, and combine in ONE
 * fixed IEEE expression tree — so a SQL oracle reproduces slope/intercept/
 * r²/correlation bit-for-bit, immune to summation order.
 *
 * Scale shape: a single map-side-combined hash aggregate per group — the
 * sums, never the points, cross the wire. This is the moment-sketch trick
 * that makes regression embarrassingly parallel; contrast with iterative
 * fits (QualityModel's LBFGS) which need passes.
 */
object RegressionOps {

  /**
   * Per-group simple OLS of y on x: slope, intercept, r². Inputs are cast
   * to DECIMAL(15,2) (the repo's 2-decimal money discipline) so every sum
   * is exact; groups with zero x-variance emit NULL slope/intercept/r²
   * (division by zero → NULL on both engines... guarded explicitly).
   */
  def olsByGroup(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(15,2)")
    val y = col(yCol).cast("decimal(15,2)")
    // decimal -> STRING -> double, not a direct decimal cast: once a
    // second-moment sum's scaled value exceeds 2^53, engines' native
    // decimal-to-double conversions can differ in the last ulp (int128
    // conversion + scale division = two roundings); parsing the exact
    // decimal string is ONE correctly-rounded step on every engine
    def asD(c: Column): Column = c.cast("string").cast("double")
    val agged = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        asD(sum(x)).as("__sx"),
        asD(sum(y)).as("__sy"),
        asD(sum(x * y)).as("__sxy"),
        asD(sum(x * x)).as("__sxx"),
        asD(sum(y * y)).as("__syy"))
    val n = col("n").cast("double")
    val num = n * col("__sxy") - col("__sx") * col("__sy")
    val den = n * col("__sxx") - col("__sx") * col("__sx")
    val deny = n * col("__syy") - col("__sy") * col("__sy")
    val slope = when(den =!= 0.0, num / den)
    agged.select(col(groupCol), col("n"),
      slope.as("slope"),
      when(den =!= 0.0, (col("__sy") - (num / den) * col("__sx")) / n).as("intercept"),
      when(den =!= 0.0 && deny =!= 0.0, (num * num) / (den * deny)).as("r2"))
  }

  /**
   * Pairwise Pearson correlation of per-bucket counts between categories:
   * the co-occurrence analysis a telemetry pipeline runs over its event mix
   * ("do error spikes track purchase spikes?"). The (bucket x category)
   * count matrix is densified (absent cells = 0 — correlation over a
   * sparse LEFT-present set would be biased), then self-joined on the
   * bucket — all post-aggregation relations are |buckets| x |categories|
   * rows, never the log. Counts are integers, so the sums are exact and
   * the final correlation is one fixed double expression.
   */
  def countCorrelation(df: DataFrame, bucketCol: Column, catCol: String): DataFrame = {
    val counts = df.groupBy(bucketCol.as("__cc_bucket"), col(catCol).as("__cc_cat"))
      .agg(count(lit(1)).as("__cc_n"))
    val buckets = counts.select(col("__cc_bucket")).distinct()
    val cats = counts.select(col("__cc_cat")).distinct()
    val dense = buckets.crossJoin(cats)
      .join(counts, Seq("__cc_bucket", "__cc_cat"), "left")
      .select(col("__cc_bucket"), col("__cc_cat"),
        coalesce(col("__cc_n"), lit(0L)).as("__cc_n"))
    val a = dense.select(col("__cc_bucket"), col("__cc_cat").as("cat_a"), col("__cc_n").as("__na"))
    val b = dense.select(col("__cc_bucket"), col("__cc_cat").as("cat_b"), col("__cc_n").as("__nb"))
    val paired = a.join(b, "__cc_bucket").filter(col("cat_a") < col("cat_b"))
    val agged = paired.groupBy(col("cat_a"), col("cat_b"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("__na")).as("__sa"), sum(col("__nb")).as("__sb"),
        sum(col("__na") * col("__nb")).as("__sab"),
        sum(col("__na") * col("__na")).as("__saa"),
        sum(col("__nb") * col("__nb")).as("__sbb"))
    val n = col("n_buckets").cast("double")
    def d(c: String): Column = col(c).cast("double")
    val num = n * d("__sab") - d("__sa") * d("__sb")
    val dena = n * d("__saa") - d("__sa") * d("__sa")
    val denb = n * d("__sbb") - d("__sb") * d("__sb")
    agged.select(col("cat_a"), col("cat_b"), col("n_buckets"),
      when(dena > 0.0 && denb > 0.0, num / sqrt(dena * denb)).as("pearson_r"))
  }
}
