package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private val scale = 1000000000000L

  test("hand-computed two-node graph: one iteration of fixed-point propagation") {
    val nodes = Seq(1L, 2L).toDF("node")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = GraphOps.pageRankFixedPoint(nodes, edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = scale * 15 / 100 / 2
    val r0 = scale / 2
    // node 1: no in-edges -> base only; node 2: base + floor(r0*85/100)
    assert(got(1L) === base)
    assert(got(2L) === base + r0 * 85 / (100 * 1))
  }

  test("matches a driver-side reference implementation on an irregular graph") {
    val n = 40
    val nodes = (0L until n.toLong).toDF("node")
    val edgeSeq = for {
      s <- 0L until n.toLong
      j <- 1L to (1 + s % 4)
    } yield (s, (s * (s + 3) + j * 97) % n)
    val edges = edgeSeq.toDF("src", "dst")

    val iters = 5
    // reference: plain Scala loop over the same integer recurrence
    val out = edgeSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = scale * 15 / 100 / n
    var rank = (0L until n.toLong).map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edgeSeq.foreach { case (s, d) =>
        contrib(d) += rank(s) * 85 / (100 * out(s))
      }
      rank = (0L until n.toLong).map(v => v -> (base + contrib(v))).toMap
    }

    val got = GraphOps.pageRankFixedPoint(nodes, edges, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === rank)
    assert(rank.values.toSet.size > 5, "fixture graph should have skewed ranks")
  }

  test("layout independence and mass bound") {
    val n = 30
    val nodes = (0L until n.toLong).toDF("node")
    val edges = (for {
      s <- 0L until n.toLong; j <- 1L to (1 + s % 3)
    } yield (s, (s * s + j * 13) % n)).toDF("src", "dst")
    val a = GraphOps.pageRankFixedPoint(nodes, edges, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraphOps.pageRankFixedPoint(
      nodes.repartition(7), edges.repartition(5), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    // fixed-point mass only leaks DOWN (rounding + dangling), never up
    assert(a.values.sum <= scale)
    assert(a.values.forall(_ >= scale * 15 / 100 / n))
  }

  test("zero iterations returns the uniform start; input validation fails fast") {
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = GraphOps.pageRankFixedPoint(nodes, edges, 0)
      .collect().map(_.getLong(1)).toSet
    assert(got === Set(scale / 3))
    intercept[IllegalArgumentException] {
      GraphOps.pageRankFixedPoint(nodes, edges, -1)
    }
    intercept[IllegalArgumentException] {
      GraphOps.pageRankFixedPoint(nodes, edges, 1, dampPct = 101)
    }
  }
}
