package graft.ext

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Model-based quality filtering — the fastText-style quality-classifier
 * stage of an LLM data pipeline (score every document with a trained
 * model, keep the high-probability tail), built the Spark-first way:
 *
 *  - TRAIN distributed with MLlib `LogisticRegression` over the codegen'd
 *    [[TextStats]] feature projection (the model is tiny — one weight per
 *    feature);
 *  - SCORE by EXPORTING the fitted coefficients into a plain Column
 *    expression (`sigmoid(w·x + b)` over the same feature expressions), so
 *    the 100 TB scoring pass is a scan-fused whole-stage-codegen
 *    projection — no MLlib transformer, no vector UDF, no extra plan nodes
 *    on the hot path. Train once on a sample, score everything for free.
 *
 * The reference has no ML surface at all (it is two CLI binaries,
 * /root/reference/src/bin/); this is extension work mandated by the
 * training-pipeline blueprint.
 */
object QualityModel {

  /** Fitted model: feature names (stable order) + weights + intercept. */
  final case class LogisticModel(
      featureNames: Seq[String], weights: Array[Double], intercept: Double) {
    require(featureNames.length == weights.length,
      s"${featureNames.length} names vs ${weights.length} weights")
  }

  /** The feature block: pure Column expressions over the text — identical
    * at train and score time by construction. */
  val featureNames: Seq[String] =
    Seq("n_tokens", "mean_token_len", "punct_ratio", "digit_ratio", "space_ratio")

  // feature columns stay under this reserved prefix end-to-end so a caller
  // DataFrame that already has e.g. an `n_tokens` column is never clobbered
  private val Prefix = "__qm_"

  private def withFeatures(df: DataFrame, textCol: String): DataFrame = {
    val s = TextStats.withStats(df, textCol, prefix = Prefix)
    val keep = featureNames.map(Prefix + _).toSet
    s.withColumn(Prefix + "n_tokens", col(Prefix + "n_tokens").cast("double"))
      .drop(s.columns.filter(c => c.startsWith(Prefix) && !keep(c)).toIndexedSeq: _*)
  }

  /**
   * Fit a logistic-regression quality model on `labelCol` (0.0/1.0). The
   * label source is the caller's: human ratings, an LLM judge, or — the
   * self-training demo the gate query runs — a heuristic weak label.
   * Deterministic for fixed input data (LBFGS over a fixed feature matrix;
   * standardization on).
   */
  def train(
      df: DataFrame, textCol: String, labelCol: String,
      maxIter: Int = 50, regParam: Double = 0.01): LogisticModel = {
    require(maxIter > 0, s"maxIter must be positive, got $maxIter")
    require(regParam >= 0, s"regParam must be non-negative, got $regParam")
    val feats = withFeatures(df, textCol)
      .select((featureNames.map(n => col(Prefix + n).as(n)) :+
        col(labelCol).cast("double").as("__label")): _*)
    val assembled = new VectorAssembler()
      .setInputCols(featureNames.toArray).setOutputCol("__features")
      .transform(feats)
    val fitted = new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol("__label")
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(assembled)
    LogisticModel(featureNames, fitted.coefficients.toArray, fitted.intercept)
  }

  /** The exported scoring expression: sigmoid(w·x + b) over the codegen'd
    * feature columns of `df` (add them with the same [[score]] path). */
  private def sigmoidExpr(model: LogisticModel): Column = {
    val margin = model.featureNames.zip(model.weights)
      .foldLeft(lit(model.intercept)) { case (acc, (name, w)) =>
        acc + col(Prefix + name) * lit(w)
      }
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  /**
   * Score every document with the exported expression; appends
   * `quality_prob` (and keeps the feature columns off the output). The
   * whole scoring pass fuses into the scan projection.
   */
  def score(df: DataFrame, textCol: String, model: LogisticModel,
      outCol: String = "quality_prob"): DataFrame =
    withFeatures(df, textCol)
      .withColumn(outCol, sigmoidExpr(model))
      .drop(featureNames.map(Prefix + _): _*)
}
