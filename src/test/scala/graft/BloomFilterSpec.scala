package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{BloomBuffer, BloomFunctions}

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  test("buffer: inserted keys always hit; serde round-trips; merge is bitwise-or") {
    val (m, k) = BloomBuffer.shapeFor(1000, 0.01)
    val a = new BloomBuffer(m, k)
    val b = new BloomBuffer(m, k)
    (0L until 500L).foreach(a.add)
    (500L until 1000L).foreach(b.add)
    a.mergeFrom(b)
    assert((0L until 1000L).forall(a.mightContain)) // no false negatives, ever
    val rt = BloomBuffer.deserialize(a.serialized)
    assert(rt.numBits === m && rt.numHashes === k)
    assert((0L until 1000L).forall(rt.mightContain))
  }

  test("false-positive rate lands near the built fpp") {
    val (m, k) = BloomBuffer.shapeFor(10000, 0.01)
    val buf = new BloomBuffer(m, k)
    (0L until 10000L).foreach(i => buf.add(i * 2654435761L)) // spread keys
    val probes = (1L to 20000L).map(i => -i) // disjoint from inserts
    val fp = probes.count(buf.mightContain).toDouble / probes.size
    assert(fp < 0.03, s"fp rate $fp far above built 0.01")
  }

  test("per-filter ceiling: sizing beyond one JVM array fails fast with the shard hint") {
    import org.apache.spark.sql.graft.BloomBuffer
    // ~1.8e9 keys at fpp=0.01 is the documented ceiling; 10x that must not
    // wrap (numBits/64).toInt or ByteBuffer.allocate into a negative size
    val e = intercept[IllegalArgumentException] {
      BloomBuffer.shapeFor(expectedItems = 20000000000L, fpp = 0.01)
    }
    assert(e.getMessage.contains("shard"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      new BloomBuffer(BloomBuffer.MaxBits + 64, 7)
    }
    assert(e2.getMessage.contains("ceiling"), e2.getMessage)
    // the largest legal shape still constructs a real word array
    assert(BloomBuffer.MaxBits % 64 == 0)
  }

  test("shape sizing validates inputs") {
    intercept[IllegalArgumentException] { BloomBuffer.shapeFor(0, 0.01) }
    intercept[IllegalArgumentException] { BloomBuffer.shapeFor(100, 0.0) }
    intercept[IllegalArgumentException] { BloomBuffer.shapeFor(100, 1.0) }
  }

  test("aggregate + probe: distributed build matches local; partitioning-independent") {
    val keys = (1L to 5000L).map(i => i * 104729L)
    val df = keys.toDF("k").repartition(7)
    val bytes = df.agg(BloomFunctions.bloom_filter_agg(col("k"), 5000, 0.01))
      .head.getAs[Array[Byte]](0)
    val local = BloomBuffer.deserialize(bytes)
    assert(keys.forall(local.mightContain))
    // the codegen probe expression agrees with the local buffer
    val probeDf = (1L to 1000L).map(i => i * 104729L).toDF("k")
      .withColumn("hit", BloomFunctions.bloom_might_contain(bytes, col("k")))
    assert(probeDf.filter(!col("hit")).count() === 0)
    // different partitioning -> same filter bytes (merge is commutative OR)
    val bytes2 = df.repartition(3).agg(BloomFunctions.bloom_filter_agg(col("k"), 5000, 0.01))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(bytes, bytes2))
  }

  test("probe expression compares by filter content, not array reference") {
    import org.apache.spark.sql.graft.BloomMightContain
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
    import org.apache.spark.sql.types.LongType
    val keys = (1L to 100L).map(i => i * 31L)
    val bytes = keys.toDF("k").agg(BloomFunctions.bloom_filter_agg(col("k"), 100, 0.01))
      .head.getAs[Array[Byte]](0)
    val attr = AttributeReference("k", LongType)()
    val a = BloomMightContain(bytes.clone(), attr)
    val b = BloomMightContain(bytes.clone(), attr)
    // distinct array instances with equal content: the expressions must be
    // equal (subexpression elimination / semanticEquals reuse depends on it)
    assert(a === b && a.hashCode === b.hashCode)
    assert(a.semanticEquals(b))
    val other = BloomMightContain(bytes ++ Array(0.toByte), attr)
    assert(a !== other)
    assert(a !== BloomMightContain(bytes, Literal(1L)))
  }

  test("bloomDecontaminate: superset of the exact decontaminate flags (no false negatives)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val evalSet = docs.filter(col("doc_id") % 50 === 0)
    val exact = graft.ext.CorpusFilters.decontaminate(train, evalSet, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = graft.ext.CorpusFilters.bloomDecontaminate(train, evalSet, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloom.keySet === exact.keySet) // same doc universe
    // every exact hit is flagged, and counts never under-count
    exact.foreach { case (id, nExact) =>
      assert(bloom(id) >= nExact, s"doc $id: bloom ${bloom(id)} < exact $nExact")
    }
    assert(exact.exists(_._2 > 0)) // the fixture really plants contamination
  }

  test("shardsFor: 1 under the cap; ceil(ideal bits / cap) over it; validates inputs") {
    assert(BloomBuffer.shardsFor(1000, 0.01) === 1)
    // 1000 keys at fpp 0.01 need ~9586 bits -> 9600 word-rounded; a 1024-bit
    // cap forces ceil(9600/1024) = 10 shards
    assert(BloomBuffer.shardsFor(1000, 0.01, maxBitsPerShard = 1024) === 10)
    intercept[IllegalArgumentException] { BloomBuffer.shardsFor(0, 0.01) }
    intercept[IllegalArgumentException] { BloomBuffer.shardsFor(10, 1.5) }
    intercept[IllegalArgumentException] { BloomBuffer.shardsFor(10, 0.01, 32) }
  }

  test("sharded build: no false negatives, fp rate near fpp, partition-independent") {
    val keys = (1L to 4000L).map(i => i * 104729L)
    val df = keys.toDF("k").repartition(7)
    // force many shards with a tiny per-shard cap (the synthetic stand-in
    // for a >MaxBits blocklist, which would need ~2 GB per filter to test
    // directly); sizing for 4000 keys at 0.03 is ~29k bits -> 8 shards
    val filters = BloomFunctions.buildShardedFilters(
      df, col("k"), expected = 4000L, fpp = 0.03, maxBitsPerShard = 4096)
    assert(filters.length >= 2, s"cap must force sharding, got ${filters.length}")
    // NO false negatives across shard routing
    val hits = keys.toDF("k")
      .withColumn("hit", BloomFunctions.bloom_might_contain_sharded(filters, col("k")))
    assert(hits.filter(!col("hit")).count() === 0)
    // fp rate on disjoint keys stays near the built fpp (generous 3x bound)
    val fresh = (1L to 4000L).map(i => i * 999331L + 7L).filterNot(keys.toSet)
    val fp = fresh.toDF("k")
      .withColumn("hit", BloomFunctions.bloom_might_contain_sharded(filters, col("k")))
      .filter(col("hit")).count()
    assert(fp.toDouble / fresh.size <= 0.09, s"fp rate ${fp.toDouble / fresh.size}")
    // partitioning-independence: per-shard OR-merge is commutative, so a
    // different layout yields byte-identical shard arrays
    val filters2 = BloomFunctions.buildShardedFilters(
      keys.toDF("k").repartition(3), col("k"),
      expected = 4000L, fpp = 0.03, maxBitsPerShard = 4096)
    assert(filters.length === filters2.length)
    filters.indices.foreach(i =>
      assert(java.util.Arrays.equals(filters(i), filters2(i)), s"shard $i"))
  }

  test("sharded build with a non-LONG key column routes like the probe (no false negatives)") {
    // regression: build-time routing hashed the raw INT column (xxhash64
    // over 4 bytes) while probe-time routing is XXH64.hashLong — keys
    // landed in one shard and probed another, a silent false negative.
    val keys = (1 to 4000).map(i => i * 7919)
    val df = keys.toDF("k") // IntegerType column
    val filters = BloomFunctions.buildShardedFilters(
      df, col("k"), expected = 4000L, fpp = 0.03, maxBitsPerShard = 4096)
    assert(filters.length >= 2, s"cap must force sharding, got ${filters.length}")
    val misses = keys.toDF("k")
      .withColumn("hit",
        BloomFunctions.bloom_might_contain_sharded(filters, col("k").cast("long")))
      .filter(!col("hit")).count()
    assert(misses === 0, s"$misses false negatives from int-key shard routing")
  }

  test("bloomDecontaminate sharded == unsharded flags on the same corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val train = docs.filter(col("doc_id") % 50 =!= 0).limit(200)
    val evalSet = docs.filter(col("doc_id") % 50 === 0)
    def run(cap: Long) = graft.ext.CorpusFilters.bloomDecontaminate(
        train, evalSet, "doc_id", "text", n = 5, fpp = 0.01, maxBitsPerShard = cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val single = run(org.apache.spark.sql.graft.BloomBuffer.MaxBits)
    val sharded = run(8192) // forces multi-shard on the eval gram set
    assert(single.keySet === sharded.keySet)
    // shard routing preserves the no-false-negative guarantee: wherever the
    // single filter flags (superset of exact), sharded flags too for every
    // genuinely shared gram — counts may differ only through independent
    // false positives, so compare against the exact lower bound
    val exact = graft.ext.CorpusFilters.decontaminate(
        train, evalSet, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (id, nExact) =>
      assert(sharded(id) >= nExact, s"doc $id: sharded ${sharded(id)} < exact $nExact")
    }
  }
}
