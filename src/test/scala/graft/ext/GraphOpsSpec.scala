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

  test("labelPropagation: hand graph — majority vote, smallest-label ties, keep when isolated") {
    // star: nodes 1,2,3 all point at 4; 5 isolated (no in-edges);
    // 6 has one in-edge from 7
    val nodes = Seq((1L, 10L), (2L, 20L), (3L, 10L), (4L, 99L),
      (5L, 50L), (6L, 60L), (7L, 70L)).toDF("node", "label")
    val edges = Seq((1L, 4L), (2L, 4L), (3L, 4L), (7L, 6L)).toDF("src", "dst")
    val got = GraphOps.labelPropagation(nodes, edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(4L) === 10L) // two votes for 10, one for 20
    assert(got(6L) === 70L) // single in-neighbor's label
    assert(got(5L) === 50L) // no in-edges: keeps its own
    assert(got(1L) === 10L && got(2L) === 20L && got(3L) === 10L)
    // tie: equal votes -> smallest label
    val tieNodes = Seq((1L, 30L), (2L, 20L), (3L, 0L)).toDF("node", "label")
    val tieEdges = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val tie = GraphOps.labelPropagation(tieNodes, tieEdges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tie(3L) === 20L)
  }

  test("labelPropagation is synchronous: round k uses ONLY round k-1 labels") {
    // chain 1 -> 2 -> 3: after one round 3 has 2's ORIGINAL label, not 1's
    val nodes = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("node", "label")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val one = GraphOps.labelPropagation(nodes, edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === Map(1L -> 100L, 2L -> 100L, 3L -> 200L))
    val two = GraphOps.labelPropagation(nodes, edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two === Map(1L -> 100L, 2L -> 100L, 3L -> 100L))
    // iters = 0 is the identity
    val zero = GraphOps.labelPropagation(nodes, edges, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(zero === Map(1L -> 100L, 2L -> 200L, 3L -> 300L))
  }

  test("kCoreSurvivors: triangle survives k=2, pendant chain peels away") {
    // triangle 1-2-3 with a tail 3-4-5: the tail peels in two rounds
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = GraphOps.kCoreSurvivors(edges, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=3: the triangle itself dies (max degree 2)
    assert(GraphOps.kCoreSurvivors(edges, k = 3, rounds = 3).count() === 0L)
    // rounds=0: only direction/dup/self-loop collapse, no peeling
    val raw = GraphOps.kCoreSurvivors(edges, k = 2, rounds = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(raw(5L) === 1L && raw(3L) === 3L)
  }

  test("kCoreSurvivors: K4 is its own 3-core; one round suffices and is stable") {
    val vs = Seq(1L, 2L, 3L, 4L)
    val edges = (for { a <- vs; b <- vs if a < b } yield (a, b)).toDF("src", "dst")
    val r1 = GraphOps.kCoreSurvivors(edges, k = 3, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === vs.map(_ -> 3L).toMap)
    val r5 = GraphOps.kCoreSurvivors(edges, k = 3, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r5 === r1)
  }

  test("triangleCount: hand graph — one triangle, one square, isolated node") {
    // triangle 1-2-3; square 4-5-6-7 (no diagonal => no triangle); node 9
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 7L), (7L, 4L)
    ).toDF("src", "dst")
    val got = GraphOps.triangleCount(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCount collapses direction, parallel edges, and self-loops") {
    // the same triangle stated messily: reversed duplicates, a self-loop,
    // and a doubled edge must count it exactly once
    val edges = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L), (1L, 1L), (1L, 2L)
    ).toDF("src", "dst")
    val got = GraphOps.triangleCount(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCount: K4 has four triangles, three per node") {
    val vs = Seq(10L, 20L, 30L, 40L)
    val edges = (for { a <- vs; b <- vs if a < b } yield (a, b)).toDF("src", "dst")
    val got = GraphOps.triangleCount(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === vs.map(_ -> 3L).toMap)
    // per-node counts triple-count each triangle: sum = 3 * C(4,3)
    assert(got.values.sum === 12L)
  }

  test("triangleCount matches a driver-side reference on an irregular graph") {
    val n = 40L
    val edges = (for {
      s <- 0L until n; j <- 1L to (1 + s % 4)
    } yield (s, (s * (s + 3) + j * 97) % n)).toDF("src", "dst")
    val got = GraphOps.triangleCount(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: brute-force over the canonical undirected simple graph
    val und = (for {
      s <- 0L until n; j <- 1L to (1 + s % 4)
      d = (s * (s + 3) + j * 97) % n if d != s
    } yield (math.min(s, d), math.max(s, d))).toSet
    val ref = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val vs = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    for {
      a <- vs; b <- vs if a < b; c <- vs if b < c
      if und((a, b)) && und((b, c)) && und((a, c))
    } { ref(a) += 1; ref(b) += 1; ref(c) += 1 }
    assert(got === ref.toMap)
    assert(got.nonEmpty) // the fixture family genuinely has triangles
    // layout independence
    val got2 = GraphOps.triangleCount(edges.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === got)
  }

  test("bfsDistances: hand chain, frontier-only correctness, round bound") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val d2 = GraphOps.bfsDistances(seeds, edges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d2 === Map(1L -> 0L, 2L -> 1L, 3L -> 2L)) // 4 is beyond 2 hops
    val d0 = GraphOps.bfsDistances(seeds, edges, rounds = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d0 === Map(1L -> 0L))
  }

  test("bfsDistances: multi-source min, cycles, and unreachable nodes") {
    // 1 -> 2 -> 3, 4 -> 3, 3 -> 1 (cycle back); 9 -> 9 self-loop island
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 3L), (3L, 1L), (9L, 9L))
      .toDF("src", "dst")
    val got = GraphOps.bfsDistances(Seq(1L, 4L, 4L).toDF("node"), edges, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 3 is 2 hops from seed 1 but 1 hop from seed 4 -> min wins
    assert(got === Map(1L -> 0L, 4L -> 0L, 2L -> 1L, 3L -> 1L))
    // 9 never reached: absent, not infinite
    assert(!got.contains(9L))
  }

  test("bfsDistances matches a driver-side reference BFS on the fixture graph") {
    val n = 60
    val edgeSeq = for {
      s <- 0L until n.toLong
      j <- 1L to (1 + s % 4)
    } yield (s, (s * (s + 3) + j * 97) % n)
    val adj = edgeSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = (0L until n.toLong).filter(_ % 7 == 0)
    val rounds = 4
    var ref = seeds.map(_ -> 0L).toMap
    for (r <- 1 to rounds) {
      val frontier = ref.filter(_._2 == r - 1).keys
      val reached = frontier.flatMap(s => adj.getOrElse(s, Nil)).toSet
      ref = reached.filterNot(ref.contains).map(_ -> r.toLong).toMap ++ ref
    }
    val got = GraphOps.bfsDistances(
      seeds.toDF("node"), edgeSeq.toDF("src", "dst").repartition(5), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === ref)
  }
}
