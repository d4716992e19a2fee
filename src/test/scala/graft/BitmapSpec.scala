package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{BitmapBuffer, BitmapFunctions}

/** Exact membership bitmap: reference-set agreement across the array/bitset
  * container boundary, merge associativity, partitioning independence,
  * serialization round-trip, SQL registration. The sf-scale segment-overlap
  * matrix rides the gate (q284) against a COUNT DISTINCT oracle. */
class BitmapSpec extends SparkSpec {

  import spark.implicits._

  private def bitmapOf(ids: Seq[Long]): BitmapBuffer = {
    val b = new BitmapBuffer()
    ids.foreach(b.add)
    b
  }

  // deterministic scatter: lands keys across many chunks and within-chunk
  // densities on both sides of the 4096 array->bitset promotion
  private def scatter(n: Int, seed: Long): Seq[Long] =
    (1 to n).map(i => (i * 0x9e3779b97f4a7c15L + seed) % 500000L)

  test("cardinality and set ops agree with a TreeSet reference on scattered keys") {
    val xs = scatter(30000, 1L)
    val ys = scatter(30000, 2L)
    val (bx, by) = (bitmapOf(xs), bitmapOf(ys))
    val (sx, sy) = (xs.toSet, ys.toSet)
    assert(bx.cardinality === sx.size.toLong)
    assert(BitmapBuffer.andCardinality(bx, by) === (sx & sy).size.toLong)
    assert(BitmapBuffer.orCardinality(bx, by) === (sx | sy).size.toLong)
    assert(BitmapBuffer.andNotCardinality(bx, by) === (sx -- sy).size.toLong)
  }

  test("dense single-chunk set crosses the 4096 promotion; negative and huge keys survive") {
    // 0..9999 share chunk 0 and force the bitset container
    val dense = (0L until 10000L) ++ Seq(-1L, -42L, Long.MaxValue, Long.MinValue)
    val b = bitmapOf(dense)
    assert(b.cardinality === dense.distinct.size.toLong)
    val rt = BitmapBuffer.deserialize(b.serialize())
    assert(rt.cardinality === b.cardinality)
    assert(BitmapBuffer.andCardinality(b, rt) === b.cardinality)
    assert(BitmapBuffer.andNotCardinality(b, rt) === 0L)
  }

  test("exactly-4096 stays an array container; 4097 promotes — both count right") {
    for (n <- Seq(4096L, 4097L)) {
      val b = bitmapOf(0L until n)
      assert(b.cardinality === n)
      assert(BitmapBuffer.deserialize(b.serialize()).cardinality === n)
    }
  }

  test("merge is set union regardless of merge order and container mix") {
    val parts = Seq(scatter(5000, 3L), (0L until 6000L), scatter(100, 4L), Seq(7L, 7L, 7L))
    val expected = parts.flatten.toSet.size.toLong
    // left fold and right fold must agree
    val lf = parts.map(bitmapOf).reduceLeft { (a, b) => a.mergeFrom(b); a }
    val rf = parts.map(bitmapOf).reduceRight { (a, b) => b.mergeFrom(a); b }
    assert(lf.cardinality === expected)
    assert(rf.cardinality === expected)
    assert(BitmapBuffer.andCardinality(lf, rf) === expected)
  }

  test("merge never aliases the other buffer's containers") {
    // fresh-key path copies the source container (array and bitset both)
    val a = new BitmapBuffer()
    val other = bitmapOf(0L until 3000L) // array container in chunk 0
    a.mergeFrom(other)
    a.add(3000L) // mutates a's copy of chunk 0
    assert(other.cardinality === 3000L)
    assert(a.cardinality === 3001L)
    val b = new BitmapBuffer()
    val dense = bitmapOf(0L until 10000L) // bitset container in chunk 0
    b.mergeFrom(dense)
    b.add(10000L)
    assert(dense.cardinality === 10000L)
    assert(b.cardinality === 10001L)
  }

  test("aggregate is partitioning-independent and equals a local build") {
    val ids = scatter(20000, 5L)
    val local = bitmapOf(ids)
    for (parts <- Seq(1, 7, 32)) {
      val bytes = ids.toDF("id").repartition(parts)
        .agg(BitmapFunctions.bitmap_agg(col("id")).as("bm"))
        .head().getAs[Array[Byte]](0)
      val dist = BitmapBuffer.deserialize(bytes)
      assert(dist.cardinality === local.cardinality, s"parts=$parts")
      assert(BitmapBuffer.andCardinality(dist, local) === local.cardinality, s"parts=$parts")
    }
  }

  test("SQL registration: bitmap_agg + pairwise counts, INT keys widen") {
    val reg = spark.sessionState.functionRegistry
    org.apache.spark.sql.graft.GraftExtensions.registrations.foreach {
      case (id, inf, builder) => reg.registerFunction(id, inf, builder)
    }
    val df = Seq((1, 10), (1, 11), (1, 12), (2, 11), (2, 13)).toDF("seg", "user_id")
    df.createOrReplaceTempView("bm_seg")
    val row = spark.sql(
      """WITH s AS (SELECT seg, bitmap_agg(user_id) bm FROM bm_seg GROUP BY seg)
        |SELECT bitmap_count(a.bm) ca, bitmap_count(b.bm) cb,
        |       bitmap_and_count(a.bm, b.bm) i,
        |       bitmap_or_count(a.bm, b.bm) u,
        |       bitmap_andnot_count(a.bm, b.bm) d
        |FROM s a JOIN s b ON a.seg = 1 AND b.seg = 2""".stripMargin).head()
    assert(row.getLong(0) === 3L)
    assert(row.getLong(1) === 2L)
    assert(row.getLong(2) === 1L)
    assert(row.getLong(3) === 4L)
    assert(row.getLong(4) === 2L)
  }
}
