package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // clearly separable crafted corpus: prose-like vs punctuation/digit soup
  private def crafted = {
    val good = (1L to 40L).map(i =>
      (i, s"this is a plain readable sentence number $i with ordinary words", 1.0))
    val bad = (41L to 80L).map(i =>
      (i, s"!!! ### $i 123456 @@@ %%% 999 ### !!! 777 &&& $i$i$i ***", 0.0))
    (good ++ bad).toDF("doc_id", "text", "label")
  }

  test("train separates crafted good/bad docs; exported expression scores match the labels") {
    val df = crafted
    val model = QualityModel.train(df, "text", "label")
    val scored = QualityModel.score(df, "text", model)
      .select($"doc_id", $"label", $"quality_prob")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val acc = scored.count { case (_, label, p) =>
      (p >= 0.5) == (label == 1.0)
    }.toDouble / scored.length
    assert(acc >= 0.95, s"training accuracy $acc below 0.95")
    // probabilities are genuine (not a constant predictor)
    val probs = scored.map(_._3)
    assert(probs.max > 0.9 && probs.min < 0.1)
  }

  test("exported sigmoid expression == MLlib's own probability (same coefficients)") {
    val df = crafted
    val model = QualityModel.train(df, "text", "label")
    // recompute the margin by hand from the model's weights over the same
    // feature block and compare to the scored column
    val feats = TextStats.withStats(df, "text", prefix = "f_")
    val margin = model.featureNames.zip(model.weights).foldLeft(lit(model.intercept)) {
      case (acc, (name, w)) =>
        val c = name match {
          case "n_tokens" => col("f_n_tokens").cast("double")
          case "mean_token_len" => col("f_mean_token_len")
          case other => col("f_" + other)
        }
        acc + c * lit(w)
    }
    val byHand = feats.withColumn("p", lit(1.0) / (lit(1.0) + exp(-margin)))
      .select($"doc_id", $"p").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val scored = QualityModel.score(df, "text", model)
      .select($"doc_id", $"quality_prob")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    byHand.foreach { case (id, p) =>
      assert(math.abs(scored(id) - p) < 1e-12, s"doc $id: $p vs ${scored(id)}")
    }
  }

  test("caller columns named like model features are never clobbered by score()") {
    // the feature block runs under a reserved __qm_ prefix end-to-end: a
    // pre-existing n_tokens/punct_ratio column must survive untouched
    val df = crafted
      .withColumn("n_tokens", lit(-7L))
      .withColumn("punct_ratio", lit(-1.5))
    val model = QualityModel.train(df, "text", "label")
    val out = QualityModel.score(df, "text", model)
    assert(out.columns.count(_ == "n_tokens") == 1)
    val row = out.filter($"doc_id" === 1L).select($"n_tokens", $"punct_ratio", $"quality_prob").head()
    assert(row.getLong(0) == -7L && row.getDouble(1) == -1.5,
      "caller's feature-named columns must pass through unchanged")
    // and the scores are identical to scoring the clean frame (the caller
    // columns never leak into the model's features)
    val clean = QualityModel.score(crafted, "text", model)
      .select($"doc_id", $"quality_prob").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.select($"doc_id", $"quality_prob").collect().foreach { r =>
      assert(r.getDouble(1) == clean(r.getLong(0)))
    }
  }

  test("input validation") {
    intercept[IllegalArgumentException] {
      QualityModel.train(crafted, "text", "label", maxIter = 0)
    }
    intercept[IllegalArgumentException] {
      QualityModel.train(crafted, "text", "label", regParam = -1.0)
    }
  }
}
