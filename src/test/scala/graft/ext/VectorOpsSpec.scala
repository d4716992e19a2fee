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
}
