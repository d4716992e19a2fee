package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pairwise association-rule mining over (basket, item) relations — the
 * classic market-basket co-occurrence analysis (Agrawal & Srikant 1994's
 * support/confidence frame, restricted to the pairwise rules that cover
 * the overwhelming share of practical use). The pipeline use is
 * co-occurrence structure over categorical corpus facets: which (source,
 * topic), (lang, domain), or (brand, brand) pairs appear together in the
 * same basket far more often than independence predicts — `lift` is the
 * signal column.
 *
 * Scale shape: baskets collapse to DISTINCT (basket, item) first, so the
 * pair fan-out per basket is C(k, 2) over the basket's DISTINCT item
 * count — bounded in any real log (an order touches tens of items, not
 * millions). The pair generation is a self-equi-join on the basket key
 * (co-partitioned, one shuffle), pair/item supports are map-side-combined
 * hash aggregations, and the item-support join back is a broadcast (the
 * item vocabulary is small by assumption). Every metric is one IEEE
 * division (or one multiply + one division) of EXACT longs, so the output
 * is bit-reproducible on any engine.
 */
object MarketBasket {

  /**
   * Pairwise association rules a→b for every DIRECTED item pair whose
   * joint basket support reaches `minPairSupport`.
   *
   * Output: (ante, cons, n_pair, n_ante, n_cons, n_baskets, confidence,
   * lift) where `confidence = n_pair / n_ante` and
   * `lift = (n_pair * n_baskets) / (n_ante * n_cons)` — lift > 1 means
   * the pair co-occurs above independence. Both are ONE division whose
   * operands are exact longs (`n_pair * n_baskets` stays in long range
   * for any realistic basket log; require guards the overflow edge).
   */
  def pairRules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairSupport: Long = 1L): DataFrame = {
    require(minPairSupport >= 1, s"minPairSupport must be >= 1, got $minPairSupport")
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i")).distinct()
    val nBaskets = items.select(col("__b")).distinct().count()
    require(nBaskets > 0, "pairRules needs at least one basket")
    val itemSupport = items.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    // directed pairs from the undirected co-occurrence join (a < b keeps
    // the join triangular; both rule directions emit from one pair row)
    val pairs = items.select(col("__b"), col("__i").as("a"))
      .join(items.select(col("__b"), col("__i").as("b")), "__b")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairSupport)
    val directed = pairs.select(col("a").as("ante"), col("b").as("cons"), col("n_pair"))
      .unionByName(pairs.select(col("b").as("ante"), col("a").as("cons"), col("n_pair")))
    directed
      .join(broadcast(itemSupport.select(col("__i").as("ante"), col("__n").as("n_ante"))), "ante")
      .join(broadcast(itemSupport.select(col("__i").as("cons"), col("__n").as("n_cons"))), "cons")
      .select(col("ante"), col("cons"), col("n_pair"), col("n_ante"), col("n_cons"),
        lit(nBaskets).as("n_baskets"),
        (col("n_pair").cast("double") / col("n_ante").cast("double")).as("confidence"),
        ((col("n_pair") * nBaskets).cast("double") /
          (col("n_ante") * col("n_cons")).cast("double")).as("lift"),
        // item-item cosine over basket-incidence vectors — the symmetric
        // similarity collaborative filtering ranks by (one correctly-
        // rounded sqrt + one division, bit-reproducible)
        (col("n_pair").cast("double") /
          sqrt((col("n_ante") * col("n_cons")).cast("double"))).as("cosine"))
  }
}
