package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.bottom_k_sample

class PerGroupSampleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("perGroupExactK: exactly min(k, groupSize) rows per group, subset of input") {
    val k = 3
    val got = Sampler.perGroupExactK(docs, Seq("lang"), k, seed = 7L)
    val sizes = docs.groupBy($"lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotSizes = got.groupBy($"lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(gotSizes.getOrElse(lang, 0L) === math.min(k.toLong, n), s"lang $lang")
    }
    assert(got.schema === docs.schema)
    assert(got.join(docs, Seq("doc_id"), "left_anti").count() === 0)
  }

  test("deterministic AND partition-layout-independent (unlike reservoir sampling)") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampler.perGroupExactK(df, Seq("lang"), 5, seed = 42L)
        .select($"doc_id").as[Long].collect().sorted.toSeq
    val a = ids(docs)
    val b = ids(docs.repartition(13, $"source"))
    val c = ids(docs.repartition(1))
    assert(a === b)
    assert(a === c)
    // and a different seed picks a different sample
    assert(a !== Sampler.perGroupExactK(docs, Seq("lang"), 5, seed = 43L)
      .select($"doc_id").as[Long].collect().sorted.toSeq)
  }

  test("bottom_k_sample aggregate: global (no grouping) and empty-group behavior") {
    val out = docs.agg(bottom_k_sample(struct(docs.columns.map(col): _*), 10, 1L).as("s"))
      .select(size($"s")).head().getInt(0)
    assert(out === 10)
    val empty = docs.filter($"doc_id" < 0)
      .agg(bottom_k_sample(struct(docs.columns.map(col): _*), 10, 1L).as("s"))
      .select(size($"s")).head().getInt(0)
    assert(empty === 0)
  }

  test("perGroupWeightedK: heavy weights dominate selection; non-positive weights excluded") {
    import org.apache.spark.sql.functions.when
    // 100 rows, ids 0..4 weighted 1000x, id 99 weight 0, rest weight 1
    val df = (0L until 100L).toDF("id").withColumn("g", lit(1))
      .withColumn("w",
        when($"id" < 5, 1000.0).when($"id" === 99L, 0.0).otherwise(1.0))
    val hits = (1 to 10).map { seed =>
      Sampler.perGroupWeightedK(df, Seq("g"), "w", k = 10, seed).select($"id").as[Long].collect().toSet
    }
    // the five 1000x ids should essentially always be picked
    val heavyHitRate = hits.map(s => (0L until 5L).count(s.contains)).sum / 50.0
    assert(heavyHitRate > 0.9, s"heavy-weight hit rate $heavyHitRate")
    // zero-weight row must never appear
    assert(hits.forall(!_.contains(99L)))
    // exact k per group
    assert(hits.forall(_.size === 10))
  }

  test("perGroupExactKByRank: sketch equals the window selection over the same rank") {
    val rank = Sampler.hexRank("42", $"doc_id")
    val got = Sampler.perGroupExactKByRank(docs, Seq("lang", "source"), 3, rank)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang", $"source").orderBy(Sampler.hexRank("42", $"doc_id"))
    val want = docs.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(got === want)
    // and is partition-layout-independent (the sketch merges map-side)
    val re = Sampler.perGroupExactKByRank(docs.repartition(17, $"n_chars"),
      Seq("lang", "source"), 3, rank).select($"doc_id").as[Long].collect().sorted.toSeq
    assert(re === want)
  }

  test("bottom_k_by_rank: general top-k per group by a numeric rank (no window sort)") {
    import graft.functions.bottom_k_by_rank
    // k smallest n_chars per lang == window selection with the same tie-break
    val got = docs.groupBy($"lang")
      .agg(bottom_k_by_rank(struct($"n_chars", $"doc_id"), $"doc_id", 5).as("ids"))
      .select($"lang", explode($"ids").as("doc_id"))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"n_chars", $"doc_id")
    val want = docs.withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(got === want)
  }

  test("perGroupWeightedKByRank: weights bias selection; w<=0 excluded; deterministic") {
    val df = (0L until 100L).toDF("id").withColumn("g", lit(1))
      .withColumn("w",
        when($"id" < 5, 1000.0).when($"id" === 99L, 0.0).otherwise(1.0))
    // different seeds = independent draws; heavy ids should dominate
    val hits = (1 to 10).map { seed =>
      Sampler.perGroupWeightedKByRank(df, Seq("g"), "w", k = 10,
        Sampler.hexRank(seed.toString, $"id")).select($"id").as[Long].collect().toSet
    }
    val heavyHitRate = hits.map(s => (0L until 5L).count(s.contains)).sum / 50.0
    assert(heavyHitRate > 0.9, s"heavy-weight hit rate $heavyHitRate")
    assert(hits.forall(!_.contains(99L))) // zero weight never selected
    assert(hits.forall(_.size === 10))
    // bit-determinism across partition layouts (priority = one IEEE division)
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampler.perGroupWeightedKByRank(d, Seq("g"), "w", k = 10,
        Sampler.hexRank("7", $"id")).select($"id").as[Long].collect().sorted.toSeq
    assert(run(df) === run(df.repartition(13)))
  }

  test("sampling is unbiased across the id range (chi-square, 10 buckets)") {
    // one group, k=200 of 500 docs; bucket selected ids by decile
    val sel = Sampler.perGroupExactK(docs.withColumn("g", lit(1)), Seq("g"), 200, seed = 3L)
    val buckets = sel.groupBy((col("doc_id") / 50).cast("int").as("b")).count()
      .collect().map(_.getLong(1).toDouble)
    val exp = 200.0 / 10
    val chi2 = buckets.map(o => (o - exp) * (o - exp) / exp).sum +
      (10 - buckets.length) * exp // empty buckets contribute (0-exp)^2/exp
    assert(chi2 < 40.0, s"chi2=$chi2 buckets=${buckets.mkString(",")}")
  }
}
