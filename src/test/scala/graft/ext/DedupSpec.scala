package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // corpus with planted structure: (0,1) exact dup; (2,3) near dup (one word
  // changed); 4..9 unrelated
  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"),
    (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu xi"),
    (4L, "completely different words about cooking pasta with fresh tomato sauce"),
    (5L, "weather report says heavy rain and strong winds expected tomorrow evening"),
    (6L, "stock markets rallied sharply after the central bank cut interest rates"),
    (7L, "the museum opened a new exhibition of impressionist paintings this weekend"),
    (8L, "astronomers discovered a distant galaxy cluster using the new telescope"),
    (9L, "local team wins championship final after dramatic penalty shootout drama")
  ).toDF("doc_id", "text")

  /** brute-force word-3-gram jaccard for ground truth */
  private def bruteJaccard(a: String, b: String): Double = {
    def sh(s: String) = s.toLowerCase.trim.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val (x, y) = (sh(a), sh(b))
    x.intersect(y).size.toDouble / x.union(y).size
  }

  test("exactDedup keeps min-id representative per key") {
    val out = Dedup.exactDedup(docs, "text", "doc_id")
    assert(out.count() === 9) // 10 docs, one exact dup collapsed
    assert(out.filter($"doc_id" === 0L).count() === 1) // min id kept
    assert(out.filter($"doc_id" === 1L).count() === 0)
  }

  test("ngramJaccardPairs computes exact jaccard values") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.keySet === Set((0L, 1L), (2L, 3L)))
    assert(pairs((0L, 1L)) === 1.0)
    val expected = bruteJaccard(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu xi")
    assert(math.abs(pairs((2L, 3L)) - expected) < 1e-12)
  }

  test("minhashPairs finds planted near-dups and verifies with exact jaccard") {
    val got = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // LSH with 128 hashes / 32 bands finds j>=0.7 pairs essentially surely
    assert(got.contains((0L, 1L)) && got((0L, 1L)) === 1.0)
    assert(got.contains((2L, 3L)))
    // verification stage reports EXACT jaccard, same as the brute force
    assert(math.abs(got((2L, 3L)) - bruteJaccard(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu xi")) < 1e-12)
    // no unrelated pair sneaks past verification
    assert(got.keySet.forall(p => Set((0L, 1L), (2L, 3L)).contains(p)))
  }

  test("minhash index: ingest pairs equal the batch-vs-corpus slice of a full-corpus run") {
    // batch: a resubmission of doc 2 (new id) and a fresh unrelated doc
    val batch = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"),
      (101L, "brand new text about gardening tulips in the early spring sunshine")
    ).toDF("doc_id", "text")
    val idx = Dedup.buildMinhashIndex(docs, "doc_id", "text")
    val got = Dedup.ingestNearDupPairs(batch, "doc_id", "text", idx, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // resubmitted doc matches its source exactly and its planted near-dup
    assert(got((100L, 2L)) === 1.0)
    assert(got.contains((100L, 3L)))
    assert(math.abs(got((100L, 3L)) - bruteJaccard(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu xi")) < 1e-12)
    // the novel doc matches nothing; no corpus-corpus pair leaks in
    assert(got.keySet.forall(_._1 == 100L))
    // identity vs a from-scratch run over corpus + batch, cross slice only
    val full = Dedup.minhashPairs(docs.unionByName(batch), "doc_id", "text", 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      .filter { case ((a, b), _) => b >= 100L ^ a >= 100L }
      .map { case ((a, b), j) => ((math.max(a, b), math.min(a, b)), j) }
    assert(got === full)
  }

  test("minhash index: save/load round trip answers identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_idx").toString
    val batch = Seq(
      (200L, "the quick brown fox jumps over the lazy dog near the river bank today")
    ).toDF("doc_id", "text")
    Dedup.buildMinhashIndex(docs, "doc_id", "text").save(dir)
    val loaded = Dedup.loadMinhashIndex(spark, dir)
    val got = Dedup.ingestNearDupPairs(batch, "doc_id", "text", loaded, threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toSet
    assert(got === Set(((200L, 0L), 1.0), ((200L, 1L), 1.0)))
  }

  test("simhashPairs: identical docs at hamming 0; near-dups within radius; dissimilar out") {
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 12, chunks = 16)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got((0L, 1L)) === 0)
    assert(got.get((2L, 3L)).exists(_ <= 12))
  }

  test("embeddingNearDupPairs finds planted near-identical vectors with exact cosine") {
    val rng = new scala.util.Random(1)
    def vec() = Array.fill(16)(rng.nextGaussian().toFloat)
    val base = vec()
    val nearDup = base.zipWithIndex.map { case (v, i) => if (i == 0) v + 0.01f else v }
    val rows = Seq((0L, base.toSeq), (1L, nearDup.toSeq)) ++
      (2L to 20L).map(i => (i, vec().toSeq))
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", $"embedding".cast("array<float>"))
    val got = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding",
      dim = 16, threshold = 0.95, numPlanes = 16, bands = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.contains((0L, 1L)), s"planted pair missed: $got")
    assert(got((0L, 1L)) > 0.99)
  }

  test("sharedShingleIndex memoizes per (source, cols, n) and is consumed by both join paths") {
    Dedup.clearShingleIndexCache()
    val ix1 = Dedup.sharedShingleIndex(docs, "doc_id", "text", 3)
    val ix2 = Dedup.sharedShingleIndex(docs, "doc_id", "text", 3)
    assert(ix1 eq ix2, "semantically-equal source must return the SAME materialized index")
    assert(Dedup.sharedShingleIndex(docs, "doc_id", "text", 2) ne ix1, "different n = different index")
    // groups is slim (no shingle arrays ride the collapse) and collapses the
    // exact dup: 10 docs -> 9 distinct sets, rep of {0,1} is 0 with both ids
    assert(ix1.groups.columns.toSet === Set("rid", "ids", "sz"))
    assert(ix1.groups.count() === 9)
    val g01 = ix1.groups.filter($"rid" === 0L).select($"ids").head().getSeq[Long](0).toSet
    assert(g01 === Set(0L, 1L))
    // the prebuilt-index entry points agree with the df entry points
    val viaIndex = Dedup.ngramJaccardPairs(ix1, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex === Set((0L, 1L), (2L, 3L)))
    val viaMinhash = Dedup.minhashPairs(ix1, threshold = 0.5, Dedup.MinHashConfig())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaMinhash.contains((0L, 1L)))
  }

  test("shingle index cache is LRU-bounded: an evicted corpus's pinned storage is freed") {
    import org.apache.spark.storage.StorageLevel
    Dedup.clearShingleIndexCache()
    // three distinct corpora at the same (cols, n): the cache holds 2, so
    // indexing the third must evict and UNPERSIST the least-recently-used
    val ixA = Dedup.sharedShingleIndex(docs.filter($"doc_id" < 4), "doc_id", "text", 3)
    val ixB = Dedup.sharedShingleIndex(docs.filter($"doc_id" >= 4), "doc_id", "text", 3)
    assert(ixA.base.storageLevel != StorageLevel.NONE, "resident index must stay persisted")
    val ixC = Dedup.sharedShingleIndex(docs.filter($"doc_id" % 2 === 0), "doc_id", "text", 3)
    assert(ixA.base.storageLevel == StorageLevel.NONE,
      "evicted index must release its MEMORY_AND_DISK storage")
    assert(ixB.base.storageLevel != StorageLevel.NONE)
    assert(ixC.base.storageLevel != StorageLevel.NONE)
    // a re-request after eviction rebuilds (fresh instance), and evicts B
    val ixA2 = Dedup.sharedShingleIndex(docs.filter($"doc_id" < 4), "doc_id", "text", 3)
    assert(ixA2 ne ixA)
    assert(ixA2.base.storageLevel != StorageLevel.NONE)
    Dedup.clearShingleIndexCache()
  }

  test("duplicateClusters: components labeled by min id; singletons keep their own id") {
    val verts = (0L to 9L).toDF("id")
    // components: {0,1,2} (chain), {3,4}, singletons 5..9
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(verts, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) === 0L && got(1L) === 0L && got(2L) === 0L)
    assert(got(3L) === 3L && got(4L) === 3L)
    (5L to 9L).foreach(i => assert(got(i) === i))
  }

  test("duplicateClusters: long chain converges (diameter > 2)") {
    val n = 12L
    val verts = (0L until n).toDF("id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(verts, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until n).foreach(i => assert(got(i) === 0L, s"vertex $i"))
  }

  test("duplicateClusters: planted path graph converges in O(log n) rounds, not O(diameter)") {
    // a 400-vertex path is the pointer-jumping acceptance case: pure
    // min-label propagation moves the min ONE hop per round and needs 399
    // rounds — far past the 15-round cap below — while hook+jump chains
    // double per round (~log2(400) ≈ 9 rounds). Ids are bit-reversed so
    // the path order carries no accidental monotone shortcut for the min.
    val n = 400
    def rev(i: Int): Long = java.lang.Integer.reverse(i).toLong & 0xffffffffL
    val ids = (0 until n).map(rev)
    val verts = ids.toDF("id")
    val pairs = (0 until n - 1).map(i => (ids(i), ids(i + 1))).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(verts, "id", pairs, maxIterations = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val minId = ids.min
    ids.foreach(i => assert(got(i) === minId, s"vertex $i"))
  }

  test("duplicateClusters: change-count plateau escalates early, not after the full hook budget") {
    // a 200-vertex path plateaus immediately (the frontier walks the
    // diameter, changed stays ~flat), so escalation must fire at round 3
    // — the MinHookRounds floor — leaving ~log2(200) ≈ 8 star rounds.
    // maxIterations = 13 only fits if the plateau detector works: burning
    // the full 10-round hook budget first would need 10 + 8 > 13 and trip
    // the loud non-convergence throw.
    val n = 200
    def rev(i: Int): Long = java.lang.Integer.reverse(i).toLong & 0xffffffffL
    val ids = (0 until n).map(rev)
    val verts = ids.toDF("id")
    val pairs = (0 until n - 1).map(i => (ids(i), ids(i + 1))).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(verts, "id", pairs, maxIterations = 13)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val minId = ids.min
    ids.foreach(i => assert(got(i) === minId, s"vertex $i"))
  }

  test("duplicateClusters: two interleaved paths stay separate components") {
    // interleaved ids make the label LUT dense across both components —
    // guards the jump step against cross-component label bleed
    val n = 60
    val evens = (0 until n).map(i => 2L * i)
    val odds = (0 until n).map(i => 2L * i + 1)
    val verts = (evens ++ odds).toDF("id")
    val pairs = ((0 until n - 1).map(i => (evens(i), evens(i + 1))) ++
      (0 until n - 1).map(i => (odds(i), odds(i + 1)))).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(verts, "id", pairs, maxIterations = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    evens.foreach(i => assert(got(i) === 0L, s"even vertex $i"))
    odds.foreach(i => assert(got(i) === 1L, s"odd vertex $i"))
  }

  test("embeddingNearDupPairs: exact-duplicate vectors expand to all member pairs") {
    val rng = new scala.util.Random(5)
    val shared = Array.fill(16)(rng.nextGaussian().toFloat).toSeq
    // ids 0,1,2 carry the identical vector; 10..29 are random
    val rows = Seq((0L, shared), (1L, shared), (2L, shared)) ++
      (10L to 29L).map(i => (i, Array.fill(16)(rng.nextGaussian().toFloat).toSeq))
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", $"embedding".cast("array<float>"))
    val got = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding",
      dim = 16, threshold = 0.95, numPlanes = 16, bands = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // all three intra-group pairs, each at cosine(v,v)
    assert(Set((0L, 1L), (0L, 2L), (1L, 2L)).subsetOf(got.keySet), s"got $got")
    Seq((0L, 1L), (0L, 2L), (1L, 2L)).foreach(p => assert(got(p) > 0.999999))
  }

  test("duplicatedSpans: planted shared span detected; unique docs report zero; short-doc fallback") {
    val span = (1 to 5).map(i => s"tok$i").mkString(" ") // n=5 spans below
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta"),   // shares the 5-token span with doc 2
      (2L, s"one two three $span four"),
      (3L, "entirely unique words here nothing shared at all"),
      (4L, "tiny doc"), (5L, "tiny doc")       // < n words: whole-doc span, dup'd
    ).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpans(docs, "doc_id", "text", n = 5)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L)._2 === 1L && r(2L)._2 === 1L) // exactly the planted span is shared
    assert(r(3L)._2 === 0L && r(3L)._3 === 0.0)
    assert(r(4L) === ((1L, 1L, 1.0)) && r(5L) === ((1L, 1L, 1.0)))
  }

  test("incrementalIngest: corpus hits rejected, batch dups collapse to min id, whitespace-robust") {
    val corpus = Seq(
      (100L, "existing corpus document one"),
      (101L, "another old document")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "a brand new document"),
      (2L, "  Existing   corpus DOCUMENT one "), // normalizes to a corpus hit
      (3L, "a duplicated fresh document"),
      (4L, "A   DUPLICATED fresh document"),     // within-batch dup of 3
      (5L, "another old document"),              // exact corpus hit
      (6L, "a brand new document")               // within-batch dup of 1
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalIngest(batch, corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 2L, 3L -> 2L))
  }

  test("dedupKeepBest: highest quality wins per normalized group, ties to min id") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "the same document", 2.0),
      (2L, "THE   same Document", 9.0),  // normalizes equal; best quality -> kept
      (3L, "the same document", 9.0),    // quality tie with 2 -> higher id loses
      (4L, "a unique document", 1.0),
      (5L, "another unique one", 3.0)
    ).toDF("doc_id", "text", "score")
    val out = Dedup.dedupKeepBest(docs, "doc_id", "text", col("score"))
    assert(out.columns.toSeq ===
      Seq("doc_id", "text", "score", "n_dups", "content_fp"))
    val kept = out.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(kept === Map(2L -> 3L, 4L -> 1L, 5L -> 1L))
  }

  test("dedupKeepBest plans one partial hash agg — no window, no join, no sort") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = Dedup.dedupKeepBest(docs, "doc_id", "text", col("n_chars"))
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("WindowExec") && !plan.contains("Join") &&
      !plan.contains("SortExec"), s"expected pure hash agg:\n$plan")
    assert(plan.contains("partial_max_by") || plan.contains("partial_maxby") ||
      plan.toLowerCase.contains("partial"), s"expected map-side combine:\n$plan")
  }

  test("containmentPairs: planted subset found at containment 1.0 where jaccard misses it") {
    // doc 1 is a 5-token quote fully contained in doc 2's 40-token page:
    // containment = 1.0 but jaccard ~ 3/38 — invisible to the symmetric tier
    val quote = "alpha beta gamma delta epsilon"
    val page = quote + " " + (1 to 35).map(i => s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, quote), (2L, page), (3L, other)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L, 1.0)))
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.7)
    assert(jac.count() === 0L, "jaccard at 0.7 must NOT see the subset pair")
  }

  test("containmentPairs: identical sets, partial overlap below threshold, and role orientation") {
    val a = "one two three four five six"           // 4 shingles
    val dup = "one two three four five six"          // identical -> group member
    val partial = "one two three nine ten eleven"    // shares 1 of 4 shingles
    val big = a + " seven eight nine ten eleven twelve thirteen fourteen"
    val docs = Seq((10L, a), (11L, dup), (12L, partial), (13L, big))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // identical pair at 1.0 (equal sizes -> id order); both members
    // contained in the big page; partial overlap stays out
    assert(got.contains((10L, 11L, 1.0)))
    assert(got.contains((10L, 13L, 1.0)) && got.contains((11L, 13L, 1.0)))
    assert(!got.exists(p => p._1 == 12L || p._2 == 12L))
    // the contained side is always the smaller set
    assert(got.forall { case (s, b, c) => c >= 0.8 && s != b })
  }

  test("containmentPairs: intra-group pairs canonicalize by id under ANY list order") {
    // groups.ids is a collect_list (partition order, NOT sorted): many
    // identical-text groups under an adversarial partitioning must still
    // come out (min, max) — the sf0.1 regression (5 swapped pairs)
    Dedup.clearShingleIndexCache()
    val texts = (0 until 8).map(g => s"group $g payload words ${"x " * 5}")
    val docs = (0 until 8).flatMap(g =>
      Seq((100L + g * 10 + 7, texts(g)), (100L + g * 10 + 1, texts(g)),
        (100L + g * 10 + 4, texts(g))))
      .toDF("doc_id", "text")
      .repartition(13) // scramble the collection order
    val got = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    assert(got.forall { case (s, b) => s < b },
      s"orientation must be id-canonical for identical sets: ${got.filterNot(p => p._1 < p._2).mkString(",")}")
    // every group contributes its full C(3,2) pair set exactly once
    assert(got.length === 8 * 3)
    assert(got.distinct.length === got.length)
    Dedup.clearShingleIndexCache()
  }

  test("capClusters: at most k smallest ids survive per cluster, singletons untouched") {
    import org.apache.spark.sql.functions.col
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), // cluster 1: 4 members
      (5L, 5L), // singleton
      (7L, 6L), (6L, 6L) // cluster 6: 2 members
    ).toDF("id", "cluster_id")
    val got = Dedup.capClusters(clusters, "id", "cluster_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 1L), (2L, 1L), (5L, 5L), (6L, 6L), (7L, 6L)))
    // layout independence of the mergeable selection
    val again = Dedup.capClusters(clusters.repartition(5), "id", "cluster_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === got)
    // k = 1 is plain dedup-to-representative
    assert(Dedup.capClusters(clusters, "id", "cluster_id", k = 1)
      .collect().map(_.getLong(0)).toSet === Set(1L, 5L, 6L))
    intercept[IllegalArgumentException] {
      Dedup.capClusters(clusters, "id", "cluster_id", k = 0)
    }
  }

  test("jaroWinklerClusters: near-identical names cluster, blocking is the recall contract") {
    import org.apache.spark.sql.functions.{col, split}
    val df = Seq(
      (1L, "smith john a"), (2L, "smith john b"),   // near-dup, same block
      (3L, "smith zzv 99"),                          // same block, too far (jw 0.83)
      (4L, "smyth john a"),                          // near-dup of 1 but
                                                     // DIFFERENT block: invisible
      (5L, "quincy solo x")                          // singleton
    ).toDF("id", "name")
    val got = Dedup.jaroWinklerClusters(df, "id", "name",
        split(col("name"), " ").getItem(0), threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === got(2L)) // transitive entity
    assert(got(3L) !== got(1L))
    assert(got(4L) !== got(1L)) // blocked away by design
    assert(got(5L) === 5L) // untouched singleton keeps its own label
    assert(got.size === 5)
    intercept[IllegalArgumentException] {
      Dedup.jaroWinklerClusters(df, "id", "name", col("name"), threshold = 0.0)
    }
  }
}
