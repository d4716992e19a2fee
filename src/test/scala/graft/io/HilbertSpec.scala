package graft.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{HilbertAlgo, HilbertFunctions}
import graft.SparkSpec

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  test("2-D bits=4: bijective over the full 16x16 grid") {
    val idx = for (x <- 0 until 16; y <- 0 until 16)
      yield HilbertAlgo.index(4, Array(x.toLong, y.toLong))
    assert(idx.toSet === (0 until 256).map(_.toLong).toSet)
  }

  test("defining Hilbert property: consecutive positions are Manhattan-1 neighbors (Morton is not)") {
    val cells = (for (x <- 0 until 16; y <- 0 until 16)
      yield (HilbertAlgo.index(4, Array(x.toLong, y.toLong)), x, y)).sortBy(_._1)
    cells.sliding(2).foreach { case Seq((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
    // the Z-curve violates this at every power-of-two seam — that locality
    // gap is the whole reason this operator exists
    def morton(x: Int, y: Int): Long =
      (0 until 16).map(b => ((((x >> b) & 1).toLong << (2 * b)) |
        (((y >> b) & 1).toLong << (2 * b + 1)))).sum
    val zCells = (for (x <- 0 until 16; y <- 0 until 16)
      yield (morton(x, y), x, y)).sortBy(_._1)
    val zJumps = zCells.sliding(2).count { case Seq((_, x1, y1), (_, x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(zJumps > 0, "sanity: Morton must show diagonal jumps")
  }

  test("3-D bits=3: bijective over the 8x8x8 cube, consecutive cells adjacent") {
    val cells = (for (x <- 0 until 8; y <- 0 until 8; z <- 0 until 8)
      yield (HilbertAlgo.index(3, Array(x.toLong, y.toLong, z.toLong)), x, y, z)).sortBy(_._1)
    assert(cells.map(_._1).toSet === (0 until 512).map(_.toLong).toSet)
    cells.sliding(2).foreach { case Seq((_, x1, y1, z1), (_, x2, y2, z2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) === 1)
    }
  }

  test("expression agrees with the kernel through codegen, nulls -> bucket 0") {
    val df = (for (x <- 0 until 8; y <- 0 until 8) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val got = df.select($"x", $"y",
        HilbertFunctions.hilbert_index(3, $"x", $"y").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (x <- 0 until 8; y <- 0 until 8)
      assert(got((x.toLong, y.toLong)) === HilbertAlgo.index(3, Array(x.toLong, y.toLong)))
    val withNull = Seq((Some(3L), None: Option[Long])).toDF("x", "y")
      .select(HilbertFunctions.hilbert_index(3, $"x", $"y").as("h")).head().getLong(0)
    assert(withNull === HilbertAlgo.index(3, Array(3L, 0L)))
  }

  test("hilbert layout prunes 2-D range probes on BOTH clustered dims") {
    // controlled 1000x100 grid so the row-group count and data spread are
    // deterministic regardless of the sf fixtures
    val grid = spark.range(100000).select(
      $"id".as("event_id"),
      ($"id" % 1000).as("x"),
      ($"id" / lit(1000)).cast("long").as("y"))
    val hPath = TempDirs.create("hilbert_spec").toString
    HilbertOrder.writeHilbertOrdered(grid, hPath, Seq("x", "y"),
      numFiles = 4, rowGroupBytes = 64 * 1024)
    // content identical to source regardless of layout
    val back = spark.read.parquet(hPath)
    assert(back.count() === grid.count())
    assert(back.agg(sum($"event_id")).head.getLong(0) ===
      grid.agg(sum($"event_id")).head.getLong(0))
    // a ~5% range probe on EITHER clustered dim must skip most row groups
    val (overlapX, totalX) = ZOrder.overlappingRowGroups(spark, hPath, "x", 0, 50)
    val (overlapY, totalY) = ZOrder.overlappingRowGroups(spark, hPath, "y", 0, 5)
    assert(totalX >= 8, s"need several row groups for the pruning check, got $totalX")
    assert(overlapX * 2 <= totalX && overlapY * 2 <= totalY,
      s"hilbert layout should prune on both dims: x=$overlapX/$totalX y=$overlapY/$totalY")
  }

  test("fail-fast: too many bits, single column, all-null column") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException](HilbertOrder.hilbertKey(df, Seq("a", "b"), bits = 32))
    intercept[IllegalArgumentException](HilbertOrder.hilbertKey(df, Seq("a")))
    val nulls = Seq((Option.empty[Long], 1L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException](HilbertOrder.hilbertKey(nulls, Seq("a", "b")))
    assert(e.getMessage.contains("all-NULL"))
  }
}
