package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * SimHash fingerprint algorithm (Charikar 2002), operating on a document's
 * token array. Static helper so the codegen'd expression below emits a
 * single call and stays inside WholeStageCodegen.
 */
object SimHashAlgo {
  /** 64-bit SimHash of a token array: per token, xxhash64 its UTF-8 bytes;
    * each of the 64 bit positions votes +1/-1; sign of the vote total sets
    * the output bit. Near-duplicate docs land within small hamming radius. */
  def simhash64(tokens: ArrayData, seed: Long): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val s = tokens.getUTF8String(t)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** xxhash64 of a single UTF8String (for rolling/fingerprint use). */
  def hashString(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
}

/** Catalyst expression: simhash64(tokens array<string>) -> long. */
case class SimHash64(child: Expression, seed: Long) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any =
    SimHashAlgo.simhash64(v.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"org.apache.spark.sql.graft.SimHashAlgo.simhash64($a, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Compiled set-similarity kernels. Interpreted higher-order functions
 * (transform/aggregate) cost ~1µs per element application; these static
 * helpers are called once per row from codegen'd expressions, so the
 * shingle/minhash/verify hot loops run as plain JIT'd JVM code.
 */
object SetSimilarityAlgo {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** Sorted, distinct 64-bit hashes of the word n-gram shingles of a token
    * array. A doc shorter than n words is one whole-doc shingle. Collision
    * probability over realistic corpus sizes is ~2^-64 — jaccard over the
    * hash sets equals jaccard over the string sets. */
  def shingleHashes(tokens: ArrayData, n: Int, seed: Long): ArrayData = {
    val m = tokens.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    val tokH = new Array[Long](m)
    var i = 0
    while (i < m) {
      tokH(i) =
        if (tokens.isNullAt(i)) 0L
        else {
          val s = tokens.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
        }
      i += 1
    }
    val count = if (m < n) 1 else m - n + 1
    val width = math.min(n, m)
    val out = new Array[Long](count)
    i = 0
    while (i < count) {
      // ordered combine of the window's token hashes
      var h = seed
      var j = 0
      while (j < width) { h = XXH64.hashLong(tokH(i + j), h); j += 1 }
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    // dedup in place (sorted)
    var w = 0
    i = 0
    while (i < count) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** LSH band keys over a shingle-hash set: band b = hash of its
    * numHashes/bands minhash slots (minhash i = min over shingles of
    * hashLong(shingle, i)), salted with the band index. */
  def minhashBandKeys(shh: ArrayData, numHashes: Int, bands: Int, seed: Long): ArrayData = {
    val m = shh.numElements()
    val rowsPerBand = numHashes / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = seed + b
      var j = 0
      while (j < rowsPerBand) {
        val hashIdx = b * rowsPerBand + j
        var mn = Long.MaxValue
        var i = 0
        while (i < m) {
          val v = XXH64.hashLong(shh.getLong(i), hashIdx)
          if (v < mn) mn = v
          i += 1
        }
        h = XXH64.hashLong(mn, h)
        j += 1
      }
      keys(b) = h
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** Intersection size of two SORTED long arrays (single merge scan, no
    * allocation). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}

/** shingle_hashes(tokens array<string>) -> sorted distinct array<long>. */
case class ShingleHashes(child: Expression, n: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(v: Any): Any =
    SetSimilarityAlgo.shingleHashes(v.asInstanceOf[ArrayData], n, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"org.apache.spark.sql.graft.SetSimilarityAlgo.shingleHashes($a, $n, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** minhash_band_keys(shingle_hashes array<long>) -> array<long> of band keys. */
case class MinHashBandKeys(child: Expression, numHashes: Int, bands: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes % bands == 0, "numHashes must divide evenly into bands")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_band_keys"

  override def nullSafeEval(v: Any): Any =
    SetSimilarityAlgo.minhashBandKeys(v.asInstanceOf[ArrayData], numHashes, bands, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"org.apache.spark.sql.graft.SetSimilarityAlgo.minhashBandKeys($a, $numHashes, $bands, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** sorted_intersect_count(a sorted array<long>, b sorted array<long>) -> long. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SetSimilarityAlgo.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.SetSimilarityAlgo.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

object TextExpressionFunctions {
  def simhash64(tokens: Column, seed: Long = 0L): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens), seed))

  def shingle_hashes(tokens: Column, n: Int, seed: Long = 0L): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), n, seed))

  def minhash_band_keys(shingleHashes: Column, numHashes: Int, bands: Int, seed: Long): Column =
    ColumnBridge.column(MinHashBandKeys(ColumnBridge.expression(shingleHashes), numHashes, bands, seed))

  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
