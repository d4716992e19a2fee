package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Iterative graph propagation over edge-list DataFrames — the Pregel-style
 * computation family ([[Dedup.duplicateClusters]]'s connected components is
 * the other member). The motivating pipeline use is quality propagation
 * over a link/citation/domain graph (CommonCrawl-style corpora weight
 * documents by the centrality of their source), where the graph is orders
 * of magnitude smaller than the corpus but still far too large for a
 * single machine.
 *
 * Scale shape: each iteration is ONE equi-join of the rank table to the
 * edge list on `src` plus ONE hash aggregation by `dst` — both shuffles on
 * graph keys, nothing quadratic, no driver-side adjacency. The rank table
 * is `localCheckpoint`ed per round so the plan stays O(1) deep (the same
 * lineage-truncation discipline as connected components). At 100 TB the
 * edge list would be pre-bucketed by `src` so the per-iteration join
 * reuses one layout.
 */
object GraphOps {

  /**
   * Damped rank propagation (PageRank, Brin & Page 1998) in FIXED-POINT
   * integer arithmetic: ranks are integers scaled by `scale`, each
   * iteration sends `floor(rank * dampPct / (100 * outdeg))` along every
   * out-edge and every node restarts from the shared base mass
   * `floor(scale * (100 - dampPct) / 100 / n)`.
   *
   * Integer sums are order-independent, so the result is deterministic
   * bit-for-bit on ANY engine that does the same long division — which is
   * what puts an ITERATIVE distributed computation on the exact-hash
   * oracle (double-arithmetic PageRank can't be cross-engine-compared
   * exactly: float addition orders differ). The usual caveats are
   * documented semantics, not bugs: total mass leaks a little to rounding
   * and to dangling nodes (no out-edges contribute nothing) — ranking
   * order, convergence, and cross-engine equality are unaffected.
   *
   * @param nodes one `node` column (the vertex ids; must be distinct)
   * @param edges `src`/`dst` columns; parallel edges count multiply
   * @param iters fixed iteration count (deterministic, no convergence test)
   */
  def pageRankFixedPoint(
      nodes: DataFrame,
      edges: DataFrame,
      iters: Int,
      scale: Long = 1000000000000L,
      dampPct: Int = 85): DataFrame = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    require(dampPct >= 0 && dampPct <= 100, s"dampPct must be in [0,100], got $dampPct")
    require(scale > 0, s"scale must be positive, got $scale")
    val n = nodes.count()
    require(n > 0, "pageRank needs at least one node")
    // scale*dampPct must fit a long through the per-edge contribution
    require(scale <= Long.MaxValue / 100, s"scale too large: $scale")

    val base = scale * (100 - dampPct) / 100 / n
    val nodeIds = nodes.select(col("node"))
    // outdeg is graph-sized and reused every round; keep it materialized
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .localCheckpoint()
    var ranks = nodeIds.select(col("node"), lit(scale / n).as("rank_fp"))
      .localCheckpoint()
    var i = 0
    while (i < iters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr(s"rank_fp * $dampPct div (100 * od)")).as("c"))
      ranks = nodeIds
        .join(contrib, Seq("node"), "left")
        .select(col("node"), (lit(base) + coalesce(col("c"), lit(0L))).as("rank_fp"))
        .localCheckpoint()
      i += 1
    }
    ranks
  }

  /**
   * Synchronous label propagation (Raghavan et al. 2007) — community
   * detection / semi-supervised label spreading over the link graph: each
   * round, every node adopts the most frequent label among its in-
   * neighbors from the PREVIOUS round (ties to the smallest label; nodes
   * with no in-edges keep their label). Fully deterministic — synchronous
   * updates plus a total tie-break order — so k rounds replay exactly on
   * any engine (the fixed-point PageRank discipline; asynchronous LPA is
   * the textbook nondeterminism trap).
   *
   * Per round: ONE equi-join of the label table to the edge list and two
   * hash aggregations ((dst, label) counts, then the per-dst argmax as a
   * `max(struct(count, -label))` — no window); `localCheckpoint` keeps the
   * plan O(1) deep.
   *
   * @param nodes (node, label) — labels must be LongType-castable
   */
  def labelPropagation(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    var labels = nodes
      .select(col("node"), col("label").cast("long").as("label"))
      .localCheckpoint()
    var i = 0
    while (i < iters) {
      val votes = edges
        .join(labels.select(col("node").as("src"), col("label").as("l")), "src")
        .groupBy(col("dst"), col("l"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("c"), (-col("l")).as("nl"))).as("w"))
        .select(col("dst").as("node"), (-col("w.nl")).as("newl"))
      labels = labels.join(votes, Seq("node"), "left")
        .select(col("node"), coalesce(col("newl"), col("label")).as("label"))
        .localCheckpoint()
      i += 1
    }
    labels
  }

  /**
   * `rounds` synchronous rounds of k-core peeling (Seidman 1983): each
   * round removes every node whose degree in the CURRENT subgraph is
   * below k (and its edges). Once no round removes anything the surviving
   * subgraph is exactly the k-core — the standard "dense backbone" filter
   * for link-spam analysis; the fixed round count keeps the computation
   * deterministic and engine-replayable (a convergence test would make
   * the plan depth data-dependent — callers size `rounds` to their
   * graph's peel depth and verify stability with one extra round).
   *
   * Direction, parallel edges, and self-loops collapse first. Per round:
   * one degree aggregation + two semi joins; `localCheckpoint` truncates
   * lineage. Output: surviving (node, degree).
   */
  def kCoreSurvivors(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 0, s"rounds must be non-negative, got $rounds")
    var und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    var i = 0
    while (i < rounds) {
      val keep = und.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
      und = und
        .join(keep.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("v").as("b")), Seq("b"), "left_semi")
        .localCheckpoint()
      i += 1
    }
    und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
  }

  /**
   * Multi-source BFS: the exact hop distance from the nearest seed node,
   * for every node reachable within `rounds` hops — link-distance-from-
   * trusted-seeds is the classic spam/quality prior (TrustRank's
   * propagation shape) and "distance from a labeled set" is the standard
   * graph feature a curation pipeline joins back onto documents.
   *
   * Synchronous frontier relaxation: round i extends only from nodes
   * whose distance settled at i-1 (exact for unweighted BFS — a node
   * first reachable at depth d is reached from a depth-(d-1) node), so
   * each round is ONE equi-join of the FRONTIER (not the whole distance
   * table) to the edge list plus one min-aggregation; `localCheckpoint`
   * keeps the plan O(1) deep. Fixed round count keeps plan depth
   * data-independent (the kCoreSurvivors discipline) — callers size
   * `rounds` to the diameter they care about; unreached nodes are simply
   * absent. Integer distances make every round engine-replayable.
   *
   * @param sources one `node` column (the seed set; duplicates collapse)
   * @param edges   directed `src`/`dst` columns
   */
  def bfsDistances(sources: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be non-negative, got $rounds")
    var dist = sources.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("dist"))
      .localCheckpoint()
    var i = 1
    while (i <= rounds) {
      val next = dist.filter(col("dist") === (i - 1))
        .select(col("node").as("src"))
        .join(edges, "src")
        .select(col("dst").as("node"), lit(i.toLong).as("dist"))
      dist = dist.unionByName(next)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint()
      i += 1
    }
    dist
  }

  /**
   * Exact per-node triangle counts over an undirected simple graph
   * (parallel edges, self-loops, and direction collapse first) — the
   * clustering-coefficient numerator, the standard structure signal for
   * link-spam/community detection on a document link graph.
   *
   * Algorithm: compact-forward (Latapy 2008). Each edge is oriented from
   * the lower to the higher endpoint in the (degree, id) total order;
   * wedges form only at each triangle's LOWEST-order vertex and close
   * against the oriented edge between the other two. Degree orientation is
   * the scale move: a hub of degree D contributes wedges quadratic in its
   * lower-order OUT-degree, which the (deg, id) order bounds by O(sqrt(m))
   * — a celebrity node with 10^8 followers generates no 10^16-wedge task.
   * Every step is an equi-join or hash aggregation on node keys; nothing
   * driver-side, nothing quadratic in a partition.
   *
   * Output: (node, n_triangles) for every node in at least one triangle
   * (each triangle credits all three corners).
   */
  def triangleCount(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val keyed = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    // orient toward the higher (deg, id); u is the lower-order endpoint
    val oriented = keyed.select(
      when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("da").as("du"),
          col("b").as("v"), col("db").as("dv")))
        .otherwise(struct(col("b").as("u"), col("db").as("du"),
          col("a").as("v"), col("da").as("dv"))).as("e"))
      .select(col("e.u").as("u"), col("e.du").as("du"),
        col("e.v").as("v"), col("e.dv").as("dv"))
    // wedges at the lowest-order corner: (u -> x), (u -> y) with x before y
    // in the same order; the triangle closes iff the oriented edge x -> y
    // exists (x is the middle of the three in the total order)
    val wedges = oriented.select(col("u"), col("v").as("x"), col("dv").as("dx"))
      .join(oriented.select(col("u"), col("v").as("y"), col("dv").as("dy")), "u")
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    val triangles = wedges
      .join(oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
      .select(col("u"), col("x"), col("y"))
    triangles
      .select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
