package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ThetaBuffer, ThetaFunctions}

/** KMV/theta sketch: exactness below capacity, estimation-regime accuracy,
  * merge associativity, partitioning independence. The sf-scale segment
  * overlap rides the gate (q266, exact regime). */
class ThetaSketchSpec extends SparkSpec {

  import spark.implicits._

  private def sketchOf(ids: Seq[Long], k: Int): ThetaBuffer = {
    val b = new ThetaBuffer(k)
    ids.foreach(b.addKey)
    b
  }

  test("below capacity the sketch is exact: distinct, intersection, union") {
    val a = sketchOf(1L to 1000L, 4096)
    val b = sketchOf(500L to 1500L, 4096)
    assert(a.estimateDistinct === 1000.0)
    assert(ThetaBuffer.intersectionEstimate(a, b) === 501.0)
    assert(ThetaBuffer.unionEstimate(a, b) === 1500.0)
    assert(a.theta === 1.0)
  }

  test("estimation regime: k=512 over 50k keys lands within 10%; intersection within 15%") {
    val n = 50000
    val a = sketchOf((1L to n.toLong), 512)
    assert(math.abs(a.estimateDistinct - n) / n < 0.10,
      s"distinct est ${a.estimateDistinct} vs $n")
    // 40% true overlap
    val b = sketchOf((30001L to 80000L), 512)
    val est = ThetaBuffer.intersectionEstimate(a, b)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.15, s"intersection est $est vs 20000")
    val u = ThetaBuffer.unionEstimate(a, b)
    assert(math.abs(u - 80000.0) / 80000.0 < 0.10, s"union est $u vs 80000")
  }

  test("merge is exact set union of retained hashes; duplicates never double-count") {
    val a = sketchOf(Seq(1L, 2L, 3L, 2L, 1L), 64)
    val b = sketchOf(Seq(3L, 4L), 64)
    a.mergeFrom(b)
    assert(a.estimateDistinct === 4.0)
  }

  test("aggregate is partitioning-independent and equals a local build") {
    val ids = (1L to 20000L).map(i => i * 7919L % 100000L)
    val local = sketchOf(ids, 256)
    for (parts <- Seq(1, 7, 32)) {
      val bytes = ids.toDF("id").repartition(parts)
        .agg(ThetaFunctions.theta_sketch_agg(col("id"), 256).as("sk"))
        .head().getAs[Array[Byte]](0)
      val dist = ThetaBuffer.deserialize(bytes)
      assert(dist.set === local.set, s"parts=$parts retained sets differ")
    }
  }
}
