package org.apache.spark.sql.graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/**
 * Bloom filter over LONG keys (the engine's gram/fingerprint hashes are
 * already xxhash64 longs) as a mergeable aggregate + a codegen membership
 * probe. This is the 100 TB membership-test path: a benchmark/blocklist too
 * big to broadcast as a hash set (a distinct-gram set keeps every key — 8+
 * bytes/key and join machinery) collapses into ~1.2 bytes/key at 1% false
 * positives, with NO false negatives — the safe direction for
 * decontamination, where a false positive only over-quarantines a training
 * document.
 *
 * Bit positions use Kirsch-Mitzenmacher double hashing (h1 + i·h2 mod m,
 * "Less hashing, same performance", ESA'06): two XXH64 evaluations serve
 * any number of probe functions with the classic FP guarantee.
 *
 * Filters built with the same (numBits, numHashes) merge by bitwise OR —
 * the aggregate is partition-order-independent and map-side combinable, so
 * building the filter is ONE pass over the blocklist with no shuffle
 * beyond the (numBits/8)-byte buffers themselves.
 */
final class BloomBuffer(val numBits: Long, val numHashes: Int) extends Serializable {
  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64, got $numBits")
  require(numBits <= BloomBuffer.MaxBits,
    s"numBits=$numBits exceeds the single-filter ceiling of ${BloomBuffer.MaxBits} " +
      "(the serialized filter must fit one JVM byte array; at fpp=0.01 that is " +
      "~1.8e9 keys per filter — shard the blocklist across several filters beyond that)")
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")
  val words = new Array[Long]((numBits / 64).toInt)

  @inline private def bitFor(v: Long, i: Int): Long = {
    val h1 = XXH64.hashLong(v, 0L)
    val h2 = XXH64.hashLong(v, 1L)
    val combined = h1 + i.toLong * h2
    (combined & Long.MaxValue) % numBits // mask sign, then mod
  }

  def add(v: Long): Unit = {
    var i = 0
    while (i < numHashes) {
      val bit = bitFor(v, i)
      words((bit >>> 6).toInt) |= (1L << (bit & 63))
      i += 1
    }
  }

  def mightContain(v: Long): Boolean = {
    var i = 0
    while (i < numHashes) {
      val bit = bitFor(v, i)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def mergeFrom(other: BloomBuffer): Unit = {
    require(other.numBits == numBits && other.numHashes == numHashes,
      "cannot merge bloom filters with different shapes")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
  }

  def serialized: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + words.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(numBits)
    bb.putInt(numHashes)
    words.foreach(bb.putLong)
    bb.array()
  }
}

object BloomBuffer {
  /** Largest per-filter bit count whose word array AND serialized form
    * (8 + 4 + words·8 bytes) both fit a JVM array: ~2 GB of filter,
    * ~1.8e9 keys at fpp=0.01. Larger blocklists shard across filters. */
  val MaxBits: Long = ((Int.MaxValue.toLong - 16) / 8) * 64

  /** Number of filter shards needed so each shard's bit array stays under
    * `maxBitsPerShard`: ceil(total ideal bits / cap). 1 = a single plain
    * filter; the sharded build hash-routes keys across shards (see
    * [[BloomFunctions.buildShardedFilters]]), so a 100 TB blocklist past
    * the ~1.8e9-key single-filter ceiling still builds in ONE pass. */
  def shardsFor(expectedItems: Long, fpp: Double,
      maxBitsPerShard: Long = MaxBits): Int = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    require(maxBitsPerShard >= 64 && maxBitsPerShard <= MaxBits,
      s"maxBitsPerShard must be in [64, $MaxBits], got $maxBitsPerShard")
    val ln2 = math.log(2.0)
    val m0 = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong
    val m = ((m0 + 63) / 64) * 64
    math.max(1L, (m + maxBitsPerShard - 1) / maxBitsPerShard).toInt
  }

  /** Standard sizing: m = -n·ln(p)/ln(2)^2 bits (rounded up to a word),
    * k = max(1, round((m/n)·ln 2)) probes. */
  def shapeFor(expectedItems: Long, fpp: Double): (Long, Int) = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    val ln2 = math.log(2.0)
    val m0 = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong
    val m = ((m0 + 63) / 64) * 64
    require(m <= MaxBits,
      s"expectedItems=$expectedItems at fpp=$fpp needs $m bits > per-filter ceiling $MaxBits; " +
        "lower fpp precision, or shard the key set across multiple filters")
    val k = math.max(1, math.round(m.toDouble / expectedItems * ln2).toInt)
    (m, k)
  }

  def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val numBits = bb.getLong
    val numHashes = bb.getInt
    val buf = new BloomBuffer(numBits, numHashes)
    var i = 0
    while (i < buf.words.length) { buf.words(i) = bb.getLong; i += 1 }
    buf
  }
}

/** bloom_filter_agg(longCol) -> binary serialized filter. */
case class BloomFilterAgg(
    child: Expression,
    numBits: Long,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  // widen INT/SMALLINT keys to LONG at analysis time (same rationale as
  // ThetaSketchAgg: update() casts to Long and would otherwise CCE)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_filter_agg"

  override def createAggregationBuffer(): BloomBuffer = new BloomBuffer(numBits, numHashes)

  override def update(buffer: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomBuffer, other: BloomBuffer): BloomBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: BloomBuffer): Any = buffer.serialized
  override def serialize(buffer: BloomBuffer): Array[Byte] = buffer.serialized
  override def deserialize(storageFormat: Array[Byte]): BloomBuffer =
    BloomBuffer.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * bloom_might_contain(<built filter bytes>, longCol) -> boolean. The filter
 * rides the expression as plain constructor state (the q106 two-pass
 * pattern: the built sketch is read once driver-side, then ships to
 * executors inside the serialized plan — one broadcast-sized object, parsed
 * once per executor, probed per row from codegen).
 */
case class BloomMightContain(filterBytes: Array[Byte], child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val parsed: BloomBuffer = BloomBuffer.deserialize(filterBytes)

  // The case-class default compares filterBytes by array REFERENCE, so two
  // semantically identical probes would never compare equal — defeating
  // subexpression elimination and semanticEquals-based plan reuse. Compare
  // the filter by content instead.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      java.util.Arrays.equals(filterBytes, b.filterBytes) && child == b.child
    case _ => false
  }
  // hashCode is hit repeatedly during analysis (ExpressionSet, attribute
  // maps) and the filter can be hundreds of MB — hash the bytes ONCE
  @transient private lazy val filterBytesHash = java.util.Arrays.hashCode(filterBytes)
  override def hashCode(): Int = 31 * filterBytesHash + child.hashCode()

  override def nullSafeEval(v: Any): Any = parsed.mightContain(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", parsed,
      classOf[BloomBuffer].getName)
    defineCodeGen(ctx, ev, v => s"$ref.mightContain($v)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Sharded probe: routes each key to `filters[xxhash64(key, seed=42) mod n]`
 * — the SAME routing the sharded build groups by (Spark's `xxhash64`
 * function on a LONG is `XXH64.hashLong(v, 42)`), so a key always probes
 * the one filter that could contain it. Keeps the per-filter no-false-
 * negative guarantee across an arbitrarily large key set: n shards of
 * ≤ MaxBits each instead of one impossible > 2 GB array.
 */
case class BloomMightContainSharded(filters: Array[Array[Byte]], child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  require(filters.nonEmpty, "need at least one filter shard")
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain_sharded"

  @transient private lazy val parsed: Array[BloomBuffer] =
    filters.map(BloomBuffer.deserialize)

  // content-based equality/hashCode for semanticEquals plan reuse — the
  // BloomMightContain rationale, across the shard array
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContainSharded =>
      filters.length == b.filters.length &&
        filters.indices.forall(i => java.util.Arrays.equals(filters(i), b.filters(i))) &&
        child == b.child
    case _ => false
  }
  @transient private lazy val filtersHash =
    filters.foldLeft(17)((h, f) => 31 * h + java.util.Arrays.hashCode(f))
  override def hashCode(): Int = 31 * filtersHash + child.hashCode()

  def route(v: Long): Int = {
    val m = XXH64.hashLong(v, 42L) % parsed.length
    (if (m < 0) m + parsed.length else m).toInt
  }

  /** Unboxed probe shared by eval and generated code. */
  def probe(v: Long): Boolean = parsed(route(v)).mightContain(v)

  override def nullSafeEval(v: Any): Any = probe(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shardedBloom", this,
      classOf[BloomMightContainSharded].getName)
    defineCodeGen(ctx, ev, v => s"$ref.probe($v)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BloomFunctions {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

  /** Aggregate a long column into a serialized Bloom filter sized for
    * `expectedItems` keys at false-positive rate `fpp`. */
  def bloom_filter_agg(e: Column, expectedItems: Long, fpp: Double = 0.01): Column = {
    val (m, k) = BloomBuffer.shapeFor(expectedItems, fpp)
    ColumnBridge.column(
      BloomFilterAgg(ColumnBridge.expression(e), m, k).toAggregateExpression())
  }

  /** Probe a built filter (bytes from [[bloom_filter_agg]]). No false
    * negatives; false positives at the built fpp. */
  def bloom_might_contain(filter: Array[Byte], e: Column): Column =
    ColumnBridge.column(BloomMightContain(filter, ColumnBridge.expression(e)))

  /** Probe sharded filters from [[buildShardedFilters]]: the key's
    * xxhash64 picks the shard, then the plain membership probe runs
    * against that shard only. */
  def bloom_might_contain_sharded(filters: Array[Array[Byte]], e: Column): Column =
    if (filters.length == 1) bloom_might_contain(filters(0), e)
    else ColumnBridge.column(
      BloomMightContainSharded(filters, ColumnBridge.expression(e)))

  /**
   * Build a blocklist filter that transparently SHARDS past the
   * single-array ceiling: when the ideal sizing for (`expected`, `fpp`)
   * exceeds `maxBitsPerShard`, keys hash-route (xxhash64 mod n) into n
   * independently-sized filters built in ONE grouped aggregation — still
   * one pass, still map-side combinable within each shard, n ≤ 32-ish
   * rows collected. Below the ceiling this is byte-identical to the
   * single-filter build. A shard that received no keys materializes as
   * an empty filter (probes are definitively false).
   */
  def buildShardedFilters(keys: DataFrame, key: Column, expected: Long,
      fpp: Double, maxBitsPerShard: Long = BloomBuffer.MaxBits): Array[Array[Byte]] = {
    val n = BloomBuffer.shardsFor(expected, fpp, maxBitsPerShard)
    if (n == 1) {
      Array(keys.select(bloom_filter_agg(key, expected, fpp).as("__f"))
        .head.getAs[Array[Byte]]("__f"))
    } else {
      // uniform hash routing => expected/n keys per shard; per-shard fpp
      // is the global fpp because each key probes exactly one shard.
      // Key is cast to LONG *before* the routing hash: probe-time routing
      // is XXH64.hashLong, and Spark's xxhash64 over a narrower type (INT)
      // hashes 4 bytes — build/probe shard assignment would silently
      // disagree and violate the no-false-negative guarantee.
      val perShard = math.max(1L, (expected + n - 1) / n)
      val rows = keys.select(key.cast("long").as("__k"))
        .groupBy(pmod(xxhash64(col("__k")), lit(n.toLong)).as("__shard"))
        .agg(bloom_filter_agg(col("__k"), perShard, fpp).as("__f"))
        .collect()
      val (mBits, kHashes) = BloomBuffer.shapeFor(perShard, fpp)
      val out = Array.fill[Array[Byte]](n)(new BloomBuffer(mBits, kHashes).serialized)
      rows.foreach(r => out(r.getLong(0).toInt) = r.getAs[Array[Byte]]("__f"))
      out
    }
  }
}
