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
}
