package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 3)

  test("sqTopK with rerank covering the corpus equals exact brute-force") {
    // exact rerank over every row => the SQ tier can only reorder the
    // shortlist, and a full-corpus shortlist makes the result identical
    val n = emb.count().toInt
    val sq = VectorOps.sqTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 10, rerank = n)
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding", k = 10)
    assert(sq.except(brute).count() === 0 && brute.except(sq).count() === 0)
  }

  test("quantization round-trip error is bounded by half a step per dimension") {
    val idx = VectorOps.buildSqIndex(emb, "vec_id", "embedding")
    val dim = idx.lo.length
    val steps = idx.lo.indices.map(i => (idx.hi(i) - idx.lo(i)) / 255.0)
    val orig = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    val codes = idx.codes.as[(Long, Seq[Byte])].collect()
    assert(codes.nonEmpty)
    for ((id, code) <- codes; i <- 0 until dim) {
      val deq = idx.lo(i) + (code(i) + 128) * steps(i)
      assert(math.abs(deq - orig(id)(i)) <= steps(i) / 2.0 + 1e-9,
        s"dim $i of vec $id: deq=$deq orig=${orig(id)(i)} step=${steps(i)}")
    }
  }

  test("signRow is deterministic and balanced-ish") {
    val a = VectorOps.signRow(7L, 3, 64)
    val b = VectorOps.signRow(7L, 3, 64)
    assert(a === b)
    assert(a.toSet === Set(1.0, -1.0)) // both signs occur
    assert(VectorOps.signRow(8L, 3, 64) !== a) // seed changes the row
  }

  test("randomProject matches a hand-computed projection") {
    val df = Seq((1L, Array(1.0f, 2.0f, -3.0f, 0.5f))).toDF("vec_id", "embedding")
    val out = VectorOps.randomProject(df, "vec_id", "embedding", dim = 4, outDim = 2, seed = 11L)
      .collect().head
    for (j <- 0 until 2) {
      val row = VectorOps.signRow(11L, j, 4)
      val expected = (Seq(1.0f, 2.0f, -3.0f, 0.5f).zip(row)
        .foldLeft(0.0) { case (acc, (x, s)) => acc + x.toDouble * s }) / math.sqrt(2.0)
      assert(out.getDouble(1 + j) === expected)
    }
  }

  test("mmrRerank picks the top-1 first, then trades relevance for diversity") {
    // planted geometry: query q = e0 axis; a-cluster (ids 1,2) nearly
    // identical and most relevant; b (id 3) less relevant but orthogonal
    // to the a-cluster in its tail dims
    def v(parts: (Int, Float)*) = {
      val a = Array.fill(8)(0.0f); parts.foreach { case (i, x) => a(i) = x }; a
    }
    val data = Seq(
      (1L, v(0 -> 1.0f, 1 -> 0.10f)),
      (2L, v(0 -> 1.0f, 1 -> 0.11f)),
      (3L, v(0 -> 0.6f, 5 -> 0.8f))
    ).toDF("vec_id", "embedding")
    val q = Seq((100L, v(0 -> 1.0f))).toDF("vec_id", "embedding")

    // plain top-2: the two near-duplicates
    val brute = Similarity.bruteTopK(data, "vec_id", "embedding", q, "vec_id", "embedding", k = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(brute === Set(1L, 2L))

    // diversity-weighted MMR: keeps the top-1, swaps the duplicate for b
    val mmr = VectorOps.mmrRerank(data, "vec_id", "embedding", q, "vec_id", "embedding",
      k = 2, poolSize = 3, lambda = 0.5)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(mmr.head === 1L, "first pick must be the plain top-1")
    assert(mmr(1) === 3L, "second pick must be the diverse item, not the near-duplicate")
  }

  test("ingestSq: build-on-subset + ingest-rest searches like build-on-all (full rerank)") {
    val n = emb.count().toInt
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val fresh = emb.filter(col("vec_id") % 5 === 0)
    val (merged, clamped, total) =
      VectorOps.ingestSq(VectorOps.buildSqIndex(old, "vec_id", "embedding"),
        fresh, "vec_id", "embedding")
    assert(total > 0L && clamped <= total)
    // with an exact full-corpus rerank the SQ tier only builds the
    // shortlist, so the merged index must equal brute force over ALL rows
    val got = VectorOps.searchSq(merged, emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10, rerank = n)
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10)
    assert(got.except(brute).count() === 0 && brute.except(got).count() === 0)
    // codes are append-only: old ids keep their EXACT pre-ingest codes
    val before = VectorOps.buildSqIndex(old, "vec_id", "embedding")
      .codes.as[(Long, Seq[Byte])].collect().toMap
    val after = merged.codes.as[(Long, Seq[Byte])].collect().toMap
    assert(before.forall { case (id, c) => after(id) == c })
  }

  test("ingestSq refuses duplicate ids and drifted batches, loudly") {
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val idx = VectorOps.buildSqIndex(old, "vec_id", "embedding")
    val dup = intercept[IllegalArgumentException] {
      VectorOps.ingestSq(idx, old.limit(1), "vec_id", "embedding")
    }
    assert(dup.getMessage.contains("already indexed"))
    // a batch far outside the trained bounds is DRIFT: refuse, don't saturate
    val drifted = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"),
        transform(col("embedding"), x => x * lit(100.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      VectorOps.ingestSq(idx, drifted, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("drifted"))
    // the same batch passes with an explicit permissive threshold
    val (merged, clamped, total) =
      VectorOps.ingestSq(idx, drifted, "vec_id", "embedding", maxClampFrac = 1.0)
    assert(clamped > 0L && clamped <= total)
    assert(merged.codes.count() === emb.count())
  }

  test("SqIndex round-trips through save/load and searches identically") {
    val dir = java.nio.file.Files.createTempDirectory("sqidx").toString
    val built = VectorOps.buildSqIndex(emb, "vec_id", "embedding")
    built.save(dir)
    val loaded = VectorOps.loadSqIndex(spark, dir)
    assert(loaded.lo.toSeq === built.lo.toSeq && loaded.hi.toSeq === built.hi.toSeq)
    val a = VectorOps.searchSq(built, emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
    val b = VectorOps.searchSq(loaded, emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("mmrRerank is deterministic and pool-closed") {
    val a = VectorOps.mmrRerank(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, poolSize = 20, lambda = 0.7)
    val b = VectorOps.mmrRerank(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, poolSize = 20, lambda = 0.7)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    assert(a.groupBy("query_id").count().filter(col("count") =!= 5).count() === 0)
    val pool = Similarity.bruteTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding", k = 20)
    assert(a.join(pool.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_anti").count() === 0)
  }

  test("filtered searchSq == brute force over the filtered corpus (full rerank)") {
    val allowed = emb.filter(col("label") % 2 === 0).select(col("vec_id"))
    val got = VectorOps.searchSq(
      VectorOps.buildSqIndex(emb, "vec_id", "embedding"),
      emb, "vec_id", "embedding", queries, "vec_id", "embedding",
      k = 5, rerank = 100000, allowed = Some(allowed))
    val brute = Similarity.bruteTopK(
      emb.join(allowed, Seq("vec_id"), "left_semi"), "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
    assert(got.except(brute).count() === 0 && brute.except(got).count() === 0)
    // and every neighbor actually passes the predicate
    assert(got.join(allowed.withColumnRenamed("vec_id", "neighbor_id"),
      Seq("neighbor_id"), "left_anti").count() === 0)
  }

  test("binarySignature packs sign bits into 32-bit words, hand-checked") {
    // dims 0,2,5 positive in word 0; dims 32,34 positive in word 1
    val v = Array.fill(64)(-1.0f)
    for (i <- Seq(0, 2, 5, 32, 34)) v(i) = 0.5f
    val df = Seq((1L, v.toSeq)).toDF("id", "vec")
      .select(col("id"), VectorOps.binarySignature(col("vec"), 64).as("sig"))
    val sig = df.as[(Long, Seq[Long])].collect().head._2
    assert(sig === Seq((1L << 0) | (1L << 2) | (1L << 5), (1L << 0) | (1L << 2)))
    // zero is NOT positive: an all-zero vector has an all-zero signature
    val z = Seq((2L, Array.fill(64)(0.0f).toSeq)).toDF("id", "vec")
      .select(VectorOps.binarySignature(col("vec"), 64).as("sig"))
      .as[Seq[Long]].collect().head
    assert(z === Seq(0L, 0L))
  }

  test("binaryHamming counts differing sign bits exactly") {
    val a = Array.fill(64)(1.0f); val b = Array.fill(64)(1.0f)
    for (i <- Seq(3, 17, 40, 63)) b(i) = -1.0f
    val got = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(VectorOps.binaryHamming(
        VectorOps.binarySignature(col("a"), 64),
        VectorOps.binarySignature(col("b"), 64)).as("h"))
      .as[Long].collect().head
    assert(got === 4L)
  }

  test("searchBinary with rerank covering the corpus equals exact brute-force") {
    val n = emb.count().toInt
    val got = VectorOps.searchBinary(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", dim = 64, k = 10, rerank = n)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10)
    assert(got.except(brute).count() === 0 && brute.except(got).count() === 0)
  }

  test("searchBinary shortlist is genuinely hamming-driven at small rerank") {
    val got = VectorOps.searchBinary(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", dim = 64, k = 5, rerank = 20)
    // k rows per query, hamming never exceeds the dimension, each query's
    // own row is hamming 0 and must survive any shortlist
    assert(got.groupBy(col("query_id")).count().collect().forall(_.getLong(1) === 5L))
    assert(got.filter(col("hamming") > 64 || col("hamming") < 0).count() === 0)
    assert(got.filter(col("query_id") === col("neighbor_id"))
      .collect().forall(_.getAs[Long]("hamming") === 0L))
  }

  test("hardestPairs: planted geometry picks the right positive and negative") {
    // anchor 0 (label A) at e0; 1 (A) near e0; 2 (A) far; 3 (B) nearer
    // than any A; 4 (B) orthogonal
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat, 0f, 0f)
    val data = Seq(
      (0L, 0, v(1, 0)), (1L, 0, v(0.9, 0.1)), (2L, 0, v(0.1, 0.9)),
      (3L, 1, v(0.99, 0.05)), (4L, 1, v(0, 1))
    ).toDF("id", "label", "vec")
    val got = VectorOps.hardestPairs(data, "id", "vec", "label",
        data.filter(col("id") === 0L))
      .collect().head
    assert(got.getAs[Long]("pos_id") === 1L)   // nearest same-label
    assert(got.getAs[Long]("neg_id") === 3L)   // most confusable other-label
    assert(got.getAs[Double]("pos_cos") > got.getAs[Double]("neg_cos") - 1.0)
    // margin is exactly the difference of the two reported cosines
    assert(got.getAs[Double]("margin") ===
      got.getAs[Double]("pos_cos") - got.getAs[Double]("neg_cos"))
  }

  test("hardestPairs excludes the anchor itself and ties break on lower id") {
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    // two identical positives (ids 5, 6): the tie goes to id 5
    val data = Seq(
      (0L, 0, v(1, 0)), (5L, 0, v(0.5, 0.5)), (6L, 0, v(0.5, 0.5)),
      (9L, 1, v(0, 1))).toDF("id", "label", "vec")
    val got = VectorOps.hardestPairs(data, "id", "vec", "label",
      data.filter(col("id") === 0L)).collect().head
    assert(got.getAs[Long]("pos_id") === 5L)
    assert(got.getAs[Long]("neg_id") === 9L)
  }

  test("dimStats: exact per-dimension means, dead-dim detection") {
    val df = Seq(
      (1L, Seq(1.0f, 0.5f, 2.0f)),
      (2L, Seq(3.0f, 0.5f, -2.0f)),
      (3L, Seq(5.0f, 0.5f, 0.0f))).toDF("id", "vec")
      .withColumn("vec", $"vec".cast("array<float>"))
    val got = VectorOps.dimStats(df, "vec")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(0L) === ((3L, 3.0, 1.0, 5.0)))
    // the dead dimension: min == max == mean
    assert(got(1L) === ((3L, 0.5, 0.5, 0.5)))
    assert(got(2L) === ((3L, 0.0, -2.0, 2.0)))
  }

  test("normHistogram: exact buckets and bounds from the codegen norm") {
    val df = Seq(
      (1L, Seq(3.0f, 4.0f)), // norm 5   -> bucket 20
      (2L, Seq(0.3f, 0.4f)), // norm 0.5 -> bucket 2
      (3L, Seq(0.0f, 0.0f)) // norm 0    -> bucket 0
    ).toDF("id", "vec").withColumn("vec", $"vec".cast("array<float>"))
    val got = VectorOps.normHistogram(df, "vec")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(20L -> 1L, 2L -> 1L, 0L -> 1L))
  }
}
