package graft.ext

import graft.SparkSpec

/** Hand-computed ground truth for pairwise association rules; the
  * sf-scale version rides the DuckDB hash oracle (q193). */
class MarketBasketSpec extends SparkSpec {

  import spark.implicits._

  test("pairRules: hand-computed support, confidence, and lift") {
    // baskets: b1{x,y}, b2{x,y}, b3{x} -> n_baskets=3
    val df = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"))
      .toDF("b", "i")
    val got = MarketBasket.pairRules(df, "b", "i")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7)))).toMap
    // pair {x,y} in 2 baskets; support(x)=3, support(y)=2
    assert(got(("x", "y")) === ((2L, 3L, 2L, 3L, 2.0 / 3.0, 6.0 / 6.0)))
    assert(got(("y", "x")) === ((2L, 2L, 3L, 3L, 1.0, 1.0)))
    assert(got.size === 2)
    // item-item cosine is symmetric: 2 / sqrt(3*2), both directions
    val cos = MarketBasket.pairRules(df, "b", "i")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("cosine")).toMap
    assert(cos(("x", "y")) === 2.0 / math.sqrt(6.0))
    assert(cos(("x", "y")) === cos(("y", "x")))
  }

  test("pairRules: duplicate (basket, item) rows collapse before counting") {
    val df = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"))
      .toDF("b", "i")
    val got = MarketBasket.pairRules(df, "b", "i")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("x", "y")) === 2L) // not 3: b1's double x counts once
  }

  test("pairRules: minPairSupport prunes, lift detects dependence direction") {
    // a and b always together (10 baskets); c independent-ish (5 with a, 5 alone)
    val rows = (1L to 10L).flatMap(b => Seq((b, "a"), (b, "b"))) ++
      (1L to 5L).map(b => (b, "c")) ++ (11L to 15L).map(b => (b, "c"))
    val got = MarketBasket.pairRules(rows.toDF("b", "i"), "b", "i",
        minPairSupport = 6)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(7)).toMap
    // only the {a,b} pair (support 10) survives minPairSupport=6
    assert(got.keySet === Set(("a", "b"), ("b", "a")))
    // lift = 10 * 15 / (10 * 10) = 1.5 > 1: positive association
    assert(got(("a", "b")) === 1.5)
    intercept[IllegalArgumentException] {
      MarketBasket.pairRules(rows.toDF("b", "i"), "b", "i", minPairSupport = 0)
    }
  }
}
