package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ground truth for the grid-blocked spatial radius join: hand-placed
  * boundary cases plus brute-force equivalence on hashed point clouds;
  * the sf-scale versions ride the DuckDB hash oracle (q250/q251). */
class GeoJoinSpec extends SparkSpec {

  import spark.implicits._

  test("radiusJoin: adjacent-cell pairs, exact-boundary inclusion, negative coords") {
    // r = 100. a-p1: same cell, dist2 = 25 -> in. a-p2: adjacent cells
    // (99 vs 101), dist2 = 8 -> in (the cross-cell case grid blocking must
    // not lose). a-p3: dist2 = 100^2 exactly -> in (<=). a-p4: same cell,
    // dist2 = 99^2 + 99^2 > r^2 -> out. b sits at negative coords near the
    // 0-cell boundary with p5 across it.
    val left = Seq((1L, 97L, 50L), (2L, -2L, -2L)).toDF("lid", "lat", "lon")
    val right = Seq(
      (10L, 94L, 54L),   // dist2 9+16 = 25
      (11L, 101L, 52L),  // dist2 16+4 = 20, cell (1,0) vs a's (0,0)
      (12L, 97L, 150L),  // dist2 = 10000 = r^2 exactly
      (13L, 1L, 140L),   // dist2 = 96^2+90^2 = 17316 > r^2, still 3x3-near
      (14L, 3L, 1L)      // vs b: dist2 = 25+9 = 34, cells (-1,-1) vs (0,0)
    ).toDF("rid", "lat", "lon")
    val got = GeoJoin.radiusJoin(left, "lid", right, "rid", "lat", "lon", 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((1L, 10L) -> 25L, (1L, 11L) -> 20L,
      (1L, 12L) -> 10000L, (2L, 14L) -> 34L))
  }

  test("radiusJoin: matches brute force on hashed point clouds; no cartesian in the plan") {
    def pts(n: Int, seed: Long) = (1 to n).map { i =>
      val k = i * 2654435761L + seed
      (i.toLong, k % 4294967296L % 5000L, k * 48271L % 4294967296L % 5000L)
    }
    val lp = pts(300, 0L)
    val rp = pts(120, 7919L)
    val r = 400L
    val joined = GeoJoin.radiusJoin(
      lp.toDF("lid", "lat", "lon"), "lid",
      rp.toDF("rid", "lat", "lon"), "rid", "lat", "lon", r)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"grid blocking must equi-join on cells, got:\n$plan")
    val got = joined.collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    val brute = (for {
      (li, la, lo) <- lp; (ri, ra, ro) <- rp
      d2 = (la - ra) * (la - ra) + (lo - ro) * (lo - ro)
      if d2 <= r * r
    } yield (li, ri) -> d2).toMap
    assert(brute.nonEmpty && got === brute)
  }

  test("cellHotspots: own counts plus 3x3 neighborhood totals over occupied cells") {
    // cell size 10. cells (0,0): 2 pts, (0,1): 1 pt, (2,2): 1 pt (isolated),
    // (-1,-1): 1 pt adjacent to (0,0)
    val pts = Seq((5L, 5L), (9L, 1L), (5L, 15L), (25L, 25L), (-3L, -7L))
      .toDF("lat", "lon")
    val got = GeoJoin.cellHotspots(pts, "lat", "lon", 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      (0L, 0L) -> ((2L, 4L)),   // itself 2 + (0,1) 1 + (-1,-1) 1
      (0L, 1L) -> ((1L, 3L)),   // (2,2) is not adjacent to (0,1)
      (2L, 2L) -> ((1L, 1L)),   // isolated
      (-1L, -1L) -> ((1L, 3L))))
  }

  test("nearestWithin: argmin per left point, distance ties break on smaller rid") {
    val left = Seq((1L, 0L, 0L), (2L, 5000L, 5000L)).toDF("lid", "lat", "lon")
    val right = Seq(
      (20L, 3L, 4L),   // dist2 25 from l1
      (21L, 4L, 3L),   // dist2 25 from l1 -> tie, rid 20 wins
      (22L, 1L, 1L)    // dist2 2 from l1 -> the winner
    ).toDF("rid", "lat", "lon")
    val got = GeoJoin.nearestWithin(left, "lid", right, "rid", "lat", "lon", 100L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((22L, 2L)))) // l2 has no neighbor -> absent
    val tie = GeoJoin.nearestWithin(
      left, "lid", right.filter(col("rid") =!= 22L), "rid", "lat", "lon", 100L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(tie === Map(1L -> ((20L, 25L))))
  }

  test("hot-cell salting: planted hot cell yields identical pairs to the plain plan") {
    // 200 left points crammed into ONE cell (coords within [0, 90)) plus a
    // scatter; threshold 16 forces ceil(200/16)+ salted sub-keys on the
    // hot cell while the scatter cells stay salt-0
    val hotL = (1L to 200L).map(i => (i, i % 90L, (i * 7) % 90L))
    val coldL = (301L to 340L).map(i => (i, i * 1000L, i * 991L))
    val leftPts = (hotL ++ coldL).toDF("lid", "lat", "lon")
    val rightPts = ((501L to 560L).map(i => (i, (i * 13) % 120L, (i * 17) % 120L)) ++
      (601L to 620L).map(i => (i, i * 1000L - 299700L, i * 991L - 296900L)))
      .toDF("rid", "lat", "lon")
    def pairs(threshold: Long) = GeoJoin.radiusJoin(
        leftPts, "lid", rightPts, "rid", "lat", "lon", 100L, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = pairs(Long.MaxValue)
    val salted = pairs(16L)
    assert(plain.nonEmpty, "fixture must produce pairs")
    assert(salted === plain)
    intercept[IllegalArgumentException] {
      GeoJoin.radiusJoin(leftPts, "lid", rightPts, "rid", "lat", "lon", 100L, 0L)
    }
  }

  test("supercritical DBSCAN: a giant chain component recovers as ONE cluster") {
    // the percolation worst case: a radius just past the point spacing
    // strings every point into one giant component whose DIAMETER equals
    // the point count — O(diameter) min-label CC would need ~n rounds and
    // abort at its cap; large-star/small-star contracts it in O(log n).
    // Points on a line, spacing 100, radius 150 -> exactly the chain.
    val n = 300
    val pts = (0 until n).map(i => (i.toLong + 1L, i * 100L, 0L))
      .toDF("pid", "lat", "lon")
    val edges = GeoJoin.radiusJoin(pts, "pid",
        pts.select(col("pid").as("other"), col("lat"), col("lon")),
        "other", "lat", "lon", 150L)
      .filter(col("pid") < col("other"))
      .select(col("pid").as("id_a"), col("other").as("id_b"))
    val clusters = graft.ext.Dedup.duplicateClusters(pts, "pid", edges,
        maxIterations = 15) // far below n: proves rounds don't track diameter
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to n.toLong).foreach(i => assert(clusters(i) === 1L, s"point $i"))
  }
}
