package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Spatial radius join on planar integer coordinates — "all pairs within
 * distance r" and "nearest neighbor within r" over two point sets, the
 * geo primitive behind store-coverage, POI-matching, and geotagged-corpus
 * joins. The reference engine has no spatial operator; this is part of the
 * mandated beyond-the-reference analytics surface.
 *
 * Coordinates are INTEGER planar units (e.g. micro-degrees on a local
 * tangent plane); the distance test is exact 64-bit integer arithmetic
 * (`dlat² + dlon² <= r²`), so results are engine-replayable bit for bit —
 * no floating-point haversine drift. Callers working in lat/lon project to
 * a planar frame first (fine for city-scale radii; geodesic correctness at
 * continental radii is out of scope, as it is for every grid-join engine).
 *
 * Plan shape (100 TB): the classic GRID BLOCKING join. Each point maps to
 * a `cellSize`-sized grid cell (floor division, negative-safe via pmod);
 * the RIGHT side expands to its 3x3 cell neighborhood (a 9x fan-out of the
 * smaller relation, two `explode(sequence)`s — codegen, no driver state);
 * candidates come from an EQUI-join on the cell key, then the exact
 * integer distance predicate filters. With cellSize = r, any true pair
 * differs by at most one cell index per axis, so the 3x3 neighborhood is
 * complete — no pair dedup is needed because the probe side keeps its
 * single true cell. Replaces the O(|L|x|R|) cross join with one hash
 * shuffle on cell keys; worst case degrades only when one cell holds a
 * large fraction of BOTH sides (a city-block hot cell) — shrink the cell
 * below r and widen the neighborhood, or salt the hot cells, before that
 * point.
 */
object GeoJoin {

  /** Floor-division grid cell index, exact for |v| < 2^52: subtracting the
    * non-negative `pmod` makes the numerator divisible, so the double
    * division is exact. */
  private def cellIdx(c: Column, size: Long): Column =
    ((c - pmod(c, lit(size))) / lit(size)).cast("long")

  /**
   * All (left, right) pairs with squared planar distance <= radius².
   * Output: (leftId, rightId, dist2) with the caller's id column names.
   * `radius` must keep dist2 in a long: coordinate deltas up to ~2.1e9
   * are safe (dlat² + dlon² < 2^63).
   *
   * `hotCellThreshold` is the city-block-hot-cell escalation: when any
   * single grid cell holds more LEFT points than the threshold, that
   * cell's left rows spread across `ceil(n/threshold)` salted sub-keys
   * (deterministic id-hash) and the right fan-out rows that touch the
   * cell replicate across the same salt range — the one-task hot
   * partition becomes `s` even tasks at the cost of `s`× replication of
   * ONLY the hot cells' right rows. The default (no threshold) keeps the
   * plain plan; results are identical either way (the salt spec pins it).
   */
  def radiusJoin(
      left: DataFrame, leftId: String,
      right: DataFrame, rightId: String,
      latCol: String, lonCol: String,
      radius: Long,
      hotCellThreshold: Long = Long.MaxValue): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    require(hotCellThreshold > 0, s"hotCellThreshold must be positive, got $hotCellThreshold")
    val l = left.select(col(leftId).as("__gl_id"),
      col(latCol).as("__gl_lat"), col(lonCol).as("__gl_lon"),
      cellIdx(col(latCol), radius).as("__gc_lat"),
      cellIdx(col(lonCol), radius).as("__gc_lon"))
    // neighborhood fan-out on the right side: 9 rows per point, all with
    // DISTINCT cell keys, so a candidate pair arises at most once
    val r = right.select(col(rightId).as("__gr_id"),
        col(latCol).as("__gr_lat"), col(lonCol).as("__gr_lon"),
        cellIdx(col(latCol), radius).as("__grc_lat"),
        cellIdx(col(lonCol), radius).as("__grc_lon"))
      .withColumn("__dy", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("__dx", explode(sequence(lit(-1L), lit(1L))))
      .select(col("__gr_id"), col("__gr_lat"), col("__gr_lon"),
        (col("__grc_lat") + col("__dy")).as("__gc_lat"),
        (col("__grc_lon") + col("__dx")).as("__gc_lon"))
    val dlat = col("__gl_lat") - col("__gr_lat")
    val dlon = col("__gl_lon") - col("__gr_lon")
    val joined =
      if (hotCellThreshold == Long.MaxValue) {
        l.join(r, Seq("__gc_lat", "__gc_lon"))
      } else {
        // hot relation is |hot cells| rows — broadcast to both sides
        val hot = l.groupBy(col("__gc_lat"), col("__gc_lon"))
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") > hotCellThreshold)
          .select(col("__gc_lat"), col("__gc_lon"),
            ((col("__n") + lit(hotCellThreshold - 1)) / lit(hotCellThreshold))
              .cast("long").as("__s"))
        val lSalted = l.join(broadcast(hot), Seq("__gc_lat", "__gc_lon"), "left")
          .withColumn("__salt", when(col("__s").isNull, lit(0L))
            .otherwise(pmod(xxhash64(col("__gl_id")), col("__s"))))
          .drop("__s")
        // a left row carries ONE salt; the right fan-out row covers every
        // salt of a hot cell (explode 0..s-1), so each candidate pair
        // still arises exactly once
        val rSalted = r.join(broadcast(hot), Seq("__gc_lat", "__gc_lon"), "left")
          .withColumn("__salt",
            explode(sequence(lit(0L), coalesce(col("__s"), lit(1L)) - 1)))
          .drop("__s")
        lSalted.join(rSalted, Seq("__gc_lat", "__gc_lon", "__salt"))
      }
    joined
      .withColumn("dist2", dlat * dlat + dlon * dlon)
      .filter(col("dist2") <= lit(radius * radius))
      .select(col("__gl_id").as(leftId), col("__gr_id").as(rightId),
        col("dist2"))
  }

  /**
   * Grid hotspot report: per occupied cell, the cell's own point count
   * and its 3x3 neighborhood total — the Getis-Ord-style local density
   * signal behind "where are the points concentrating?" dashboards (the
   * full statistic is a fixed arithmetic tree over these two integers and
   * global moments; the counts are the distributed part). One hash
   * aggregate to the |occupied cells| relation, then a 9x contribution
   * fan-out and a second aggregate — the points themselves shuffle once.
   */
  def cellHotspots(
      points: DataFrame, latCol: String, lonCol: String,
      cellSize: Long): DataFrame = {
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    val counts = points.groupBy(
        cellIdx(col(latCol), cellSize).as("cell_lat"),
        cellIdx(col(lonCol), cellSize).as("cell_lon"))
      .agg(count(lit(1)).as("n"))
    val neighborhood = counts
      .withColumn("__dy", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("__dx", explode(sequence(lit(-1L), lit(1L))))
      .select((col("cell_lat") + col("__dy")).as("cell_lat"),
        (col("cell_lon") + col("__dx")).as("cell_lon"), col("n"))
      .groupBy(col("cell_lat"), col("cell_lon"))
      .agg(sum(col("n")).as("n_neighborhood"))
    counts.join(neighborhood, Seq("cell_lat", "cell_lon"))
      .select(col("cell_lat"), col("cell_lon"), col("n"), col("n_neighborhood"))
  }

  /**
   * Nearest right-side neighbor within `radius` for each left point that
   * has one — argmin over the radius-join candidates via a single
   * map-side-combinable `min(struct(dist2, rightId))` (no per-left window
   * sort); ties on distance break on the smaller right id, so the answer
   * is deterministic and oracle-replayable.
   */
  def nearestWithin(
      left: DataFrame, leftId: String,
      right: DataFrame, rightId: String,
      latCol: String, lonCol: String,
      radius: Long): DataFrame =
    radiusJoin(left, leftId, right, rightId, latCol, lonCol, radius)
      .groupBy(col(leftId))
      .agg(min(struct(col("dist2"), col(rightId))).as("__best"))
      .select(col(leftId), col("__best").getField(rightId).as(rightId),
        col("__best").getField("dist2").as("dist2"))
}
