package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sharded HNSW: recall against brute-force ground truth, build
  * determinism (the artifact contract), genuinely sublinear distance
  * evaluations, persisted-index round-trip, and the loud query cap. */
class GraphAnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("recall@10 vs brute force clears 0.9 on the embeddings fixture") {
    val q = emb.filter(col("vec_id") < 10)
    val cfg = GraphAnn.HnswConfig(m = 8, efConstruction = 64, efSearch = 64, shards = 4)
    val approx = GraphAnn.hnswTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10, cfg)
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10)
    val hit = approx.join(brute.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 10L).foreach { qid =>
      assert(hit.getOrElse(qid, 0L) >= 9L, s"query $qid recall ${hit.getOrElse(qid, 0L)}/10")
    }
  }

  test("build is deterministic: two builds emit byte-identical index rows") {
    val cfg = GraphAnn.HnswConfig(shards = 3)
    def rows() = GraphAnn.hnswBuild(emb.repartition(7), "vec_id", "embedding", cfg)
      .collect().map(_.toString).sorted.toSeq
    assert(rows() === rows())
  }

  test("beam search is sublinear: distance evals well below the scan count") {
    // a beam of ef·Mmax0 nodes only looks sublinear once n is well past it
    // — 4000 synthetic 16-d points (deterministic hash coordinates)
    val big = spark.range(1, 4001).select(col("id").as("vec_id"),
      array((0 until 16).map(j =>
        (pmod(xxhash64(col("id"), lit(j)), lit(1000L)) / 500d - 1d).cast("float")): _*)
        .as("embedding"))
    val q = big.filter(col("vec_id") <= 10)
    val cfg = GraphAnn.HnswConfig(m = 8, efConstruction = 48, efSearch = 32, shards = 1)
    val index = GraphAnn.hnswBuild(big, "vec_id", "embedding", cfg).cache()
    val n = index.count() // one shard holds the whole corpus
    val visited = spark.sparkContext.longAccumulator("hnsw_visited")
    GraphAnn.hnswQuery(index, q, "vec_id", "embedding", k = 10, cfg, visited).count()
    val fullScan = n * 10 // 10 queries x n evals each
    assert(visited.value > 0L && visited.value < fullScan / 4,
      s"visited ${visited.value} of $fullScan brute evals — not sublinear")
    index.unpersist()
    ()
  }

  test("persisted index round-trips: query(parquet(build)) == query(build)") {
    val cfg = GraphAnn.HnswConfig(shards = 2)
    val q = emb.filter(col("vec_id") < 3)
    val built = GraphAnn.hnswBuild(emb, "vec_id", "embedding", cfg)
    val path = graft.io.TempDirs.create("hnsw_spec_").resolve("idx").toString
    built.write.parquet(path)
    def res(ix: org.apache.spark.sql.DataFrame) =
      GraphAnn.hnswQuery(ix, q, "vec_id", "embedding", k = 5, cfg)
        .collect().map(_.toString).sorted.toSeq
    assert(res(spark.read.parquet(path)) === res(built))
  }

  test("filtered search: results all allowed, recall vs filtered brute, cap refusal") {
    val q = emb.filter(col("vec_id") < 10)
    val allow = emb.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
    val cfg = GraphAnn.HnswConfig(m = 8, efConstruction = 64, efSearch = 96, shards = 4)
    val got = GraphAnn.hnswQuery(
      GraphAnn.hnswBuild(emb, "vec_id", "embedding", cfg),
      q, "vec_id", "embedding", k = 10, cfg, allowed = Some(allow))
    // every returned neighbor satisfies the predicate
    assert(got.filter(col("neighbor_id") % 3 =!= 0).count() === 0)
    val brute = Similarity.bruteTopK(emb.filter(col("vec_id") % 3 === 0),
      "vec_id", "embedding", q, "vec_id", "embedding", k = 10)
    val hit = got.join(brute.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 10L).foreach { qid =>
      assert(hit.getOrElse(qid, 0L) >= 8L, s"query $qid filtered recall ${hit.getOrElse(qid, 0L)}/10")
    }
    // allow-set past the cap refuses loudly
    val e = intercept[IllegalArgumentException] {
      GraphAnn.hnswQuery(GraphAnn.hnswBuild(emb.limit(50), "vec_id", "embedding", cfg),
        q, "vec_id", "embedding", k = 5, cfg,
        allowed = Some(allow), maxAllowRows = 3)
    }
    assert(e.getMessage.contains("maxAllowRows"))
  }

  test("hnswInsert: monotone-id ingest is byte-identical to a from-scratch rebuild") {
    // the append-ingest shape: the batch's ids all sort after the indexed
    // ids, so replaying the insertions onto the adopted graph IS the
    // from-scratch build's suffix (canonical id-sorted adjacency removes
    // scan-order freedom) — the q253 mergeIndex discipline
    val cfg = GraphAnn.HnswConfig(m = 8, efConstruction = 64, efSearch = 64, shards = 4)
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val inserted = GraphAnn.hnswInsert(
      GraphAnn.hnswBuild(base, "vec_id", "embedding", cfg),
      batch, "vec_id", "embedding", cfg)
    val rebuilt = GraphAnn.hnswBuild(emb, "vec_id", "embedding", cfg)
    assert(canon(inserted) === canon(rebuilt))
  }

  test("hnswInsert: interleaved ids still meet the recall contract; persisted round-trip") {
    val cfg = GraphAnn.HnswConfig(m = 8, efConstruction = 64, efSearch = 64, shards = 4)
    val base = emb.filter(col("vec_id") % 5 =!= 4)
    val batch = emb.filter(col("vec_id") % 5 === 4)
    val path = graft.io.TempDirs.create("hnsw_ins_").resolve("idx").toString
    GraphAnn.hnswBuild(base, "vec_id", "embedding", cfg).write.parquet(path)
    val idx = GraphAnn.hnswInsert(spark.read.parquet(path), batch, "vec_id", "embedding", cfg)
    val q = emb.filter(col("vec_id") < 10)
    val approx = GraphAnn.hnswQuery(idx, q, "vec_id", "embedding", k = 10, cfg)
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10)
    val hit = approx.join(brute.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 10L).foreach { qid =>
      assert(hit.getOrElse(qid, 0L) >= 9L, s"query $qid recall ${hit.getOrElse(qid, 0L)}/10")
    }
  }

  test("hnswInsert: an already-indexed id refuses loudly") {
    val cfg = GraphAnn.HnswConfig(shards = 2)
    val idx = GraphAnn.hnswBuild(emb.filter(col("vec_id") < 100), "vec_id", "embedding", cfg)
    val e = intercept[org.apache.spark.SparkException] {
      GraphAnn.hnswInsert(idx, emb.filter(col("vec_id") === 50), "vec_id", "embedding", cfg)
        .count()
    }
    assert(e.getMessage.contains("already indexed") ||
      Option(e.getCause).exists(_.getMessage.contains("already indexed")))
  }

  test("a cfg mismatch on m/maxLevel fails loudly at query and insert time") {
    val buildCfg = GraphAnn.HnswConfig(m = 8, shards = 2)
    val idx = GraphAnn.hnswBuild(emb.limit(80), "vec_id", "embedding", buildCfg).cache()
    idx.count()
    val otherCfg = buildCfg.copy(m = 4)
    val eq = intercept[org.apache.spark.SparkException] {
      GraphAnn.hnswQuery(idx, emb.limit(2), "vec_id", "embedding", k = 3, otherCfg).count()
    }
    assert(eq.getMessage.contains("m/maxLevel") ||
      Option(eq.getCause).exists(_.getMessage.contains("m/maxLevel")))
    val ei = intercept[org.apache.spark.SparkException] {
      GraphAnn.hnswInsert(idx, emb.filter(col("vec_id") > 400), "vec_id", "embedding",
        otherCfg).count()
    }
    assert(ei.getMessage.contains("m/maxLevel") ||
      Option(ei.getCause).exists(_.getMessage.contains("m/maxLevel")))
    idx.unpersist()
    ()
  }

  test("filtered beam is expansion-bounded: a sparse allow-set cannot walk the whole shard") {
    // 20k synthetic nodes in ONE shard; allow only 5 ids. Without the
    // budget the beam would expand through the entire connected component
    // hunting for ef admissible nodes (~20k evals/query); with it, evals
    // stay within the documented bound.
    val big = spark.range(1, 20001).select(col("id").as("vec_id"),
      array((0 until 8).map(j =>
        (pmod(xxhash64(col("id"), lit(j)), lit(1000L)) / 500d - 1d).cast("float")): _*)
        .as("embedding"))
    val cfg = GraphAnn.HnswConfig(m = 4, efConstruction = 16, efSearch = 8, shards = 1)
    val index = GraphAnn.hnswBuild(big, "vec_id", "embedding", cfg).cache()
    index.count()
    val allow = big.filter(col("vec_id") % 4000 === 0).select(col("vec_id"))
    val visited = spark.sparkContext.longAccumulator("hnsw_filtered_visited")
    val got = GraphAnn.hnswQuery(index, big.filter(col("vec_id") === 7),
      "vec_id", "embedding", k = 3, cfg, visited, allowed = Some(allow))
    assert(got.count() > 0) // best-so-far results still come back
    // budget = max(4096, 64*ef*m) = 4096; overshoot at most one neighbor scan
    assert(visited.value <= 4096L + 2L * cfg.m + 1L,
      s"filtered beam visited ${visited.value} — budget not enforced")
    assert(visited.value < 20000L, "filtered beam walked the whole component")
    index.unpersist()
    ()
  }

  test("serve-time delete-list: tombstoned ids never surface but still route; composes with allow") {
    val q = emb.filter(col("vec_id") < 10)
    val cfg = GraphAnn.HnswConfig(m = 8, efConstruction = 64, efSearch = 96, shards = 4)
    val idx = GraphAnn.hnswBuild(emb, "vec_id", "embedding", cfg).cache()
    idx.count()
    val dead = emb.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    val got = GraphAnn.hnswQuery(idx, q, "vec_id", "embedding", k = 10, cfg,
      deleted = Some(dead))
    assert(got.filter(col("neighbor_id") % 7 === 0).count() === 0)
    // recall vs brute over the corpus MINUS the tombstones (deleted nodes
    // keep routing the beam, so there is no post-delete recall cliff)
    val brute = Similarity.bruteTopK(emb.filter(col("vec_id") % 7 =!= 0),
      "vec_id", "embedding", q, "vec_id", "embedding", k = 10)
    val hit = got.join(brute.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 10L).foreach { qid =>
      assert(hit.getOrElse(qid, 0L) >= 8L, s"query $qid post-delete recall ${hit.getOrElse(qid, 0L)}/10")
    }
    // composed with an allow-set: both predicates hold on every result
    val allow = emb.filter(col("vec_id") % 2 === 0).select(col("vec_id"))
    val both = GraphAnn.hnswQuery(idx, q, "vec_id", "embedding", k = 10, cfg,
      allowed = Some(allow), deleted = Some(dead))
    assert(both.filter(col("neighbor_id") % 2 =!= 0 || col("neighbor_id") % 7 === 0)
      .count() === 0)
    assert(both.count() > 0)
    idx.unpersist()
    ()
  }

  test("hnswCompact: rebuild minus tombstones is byte-identical to a fresh build over survivors") {
    val cfg = GraphAnn.HnswConfig(m = 8, efConstruction = 64, efSearch = 64, shards = 4)
    val idx = GraphAnn.hnswBuild(emb, "vec_id", "embedding", cfg)
    val dead = emb.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    val compacted = GraphAnn.hnswCompact(idx, dead, "vec_id", cfg)
      .collect().map(_.toString).sorted.toSeq
    val fresh = GraphAnn.hnswBuild(emb.filter(col("vec_id") % 7 =!= 0),
        "vec_id", "embedding", cfg)
      .collect().map(_.toString).sorted.toSeq
    assert(compacted === fresh,
      "compaction must be indistinguishable from never indexing the dead ids")
    // the compacted index serves with an EMPTY delete list and can never
    // surface a dead id (they are simply not in the graph any more)
    val q = emb.filter(col("vec_id") < 5)
    val viaCompacted = GraphAnn.hnswQuery(
      GraphAnn.hnswCompact(idx, dead, "vec_id", cfg),
      q, "vec_id", "embedding", k = 10, cfg)
    assert(viaCompacted.filter(col("neighbor_id") % 7 === 0).count() === 0)
    assert(viaCompacted.count() === 50) // 5 queries x full top-10
    // cfg mismatch refuses
    val e = intercept[IllegalArgumentException] {
      GraphAnn.hnswCompact(idx, dead, "vec_id", cfg.copy(m = 16))
    }
    assert(e.getMessage.contains("hnswCompact"))
  }

  test("hnswCompact is shard-scoped: dead ids confined to one shard still yield the exact from-scratch rebuild") {
    // r10 verdict #1: compaction must only rebuild shards that CONTAIN a
    // dead id. Correctness pin: with the dead set confined to a single
    // shard, the scoped output (1 shard rebuilt + 3 carried verbatim)
    // must STILL be byte-identical to a full from-scratch build over the
    // survivors — per-shard determinism makes carried == rebuilt.
    val cfg = GraphAnn.HnswConfig(m = 8, efConstruction = 64, efSearch = 64, shards = 4)
    val idx = GraphAnn.hnswBuild(emb, "vec_id", "embedding", cfg)
    val oneShard = idx.filter(col("shard") === 2).select(col("id").as("vec_id"))
    val dead = oneShard.limit(20)
    val deadIds = dead.collect().map(_.getLong(0)).toSet
    assert(deadIds.nonEmpty)
    val compacted = GraphAnn.hnswCompact(idx, dead, "vec_id", cfg)
      .collect().map(_.toString).sorted.toSeq
    val fresh = GraphAnn.hnswBuild(
        emb.filter(!col("vec_id").isin(deadIds.toSeq: _*)), "vec_id", "embedding", cfg)
      .collect().map(_.toString).sorted.toSeq
    assert(compacted === fresh)
    // a dead set matching NOTHING in the index touches no shard at all
    val noop = GraphAnn.hnswCompact(idx,
        Seq(99999991L, 99999992L).toDF("vec_id"), "vec_id", cfg)
      .collect().map(_.toString).sorted.toSeq
    assert(noop === idx.collect().map(_.toString).sorted.toSeq)
  }

  test("query fan-out past maxQueryRows refuses loudly") {
    val cfg = GraphAnn.HnswConfig(shards = 2, maxQueryRows = 3)
    val index = GraphAnn.hnswBuild(emb.limit(50), "vec_id", "embedding", cfg)
    val e = intercept[IllegalArgumentException] {
      GraphAnn.hnswQuery(index, emb.limit(10), "vec_id", "embedding", k = 5, cfg)
    }
    assert(e.getMessage.contains("maxQueryRows"))
  }

  test("tiny and degenerate corpora: single node, zero vectors") {
    val one = Seq((1L, Seq.fill(4)(1.0f))).toDF("vec_id", "embedding")
    val got = GraphAnn.hnswTopK(one, "vec_id", "embedding",
      one, "vec_id", "embedding", k = 3, GraphAnn.HnswConfig(shards = 2))
      .collect()
    assert(got.length === 1 && got(0).getLong(1) === 1L)
    // zero-norm vectors: cosine 0 to everything, still indexed and returned
    val withZero = Seq((1L, Seq(1.0f, 0f)), (2L, Seq(0f, 0f)), (3L, Seq(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val r = GraphAnn.hnswTopK(withZero, "vec_id", "embedding",
      withZero.filter(col("vec_id") === 1L), "vec_id", "embedding", k = 3,
      GraphAnn.HnswConfig(shards = 1))
      .collect().map(x => x.getLong(1) -> x.getDouble(2)).toMap
    assert(r.size === 3 && r(2L) === 0.0 && r(1L) > 0.99)
  }
}
