package graft

/**
 * Contract guards for the driver gate:
 *  - every oracle refers to a declared query (a typo'd key silently drops
 *    the correctness check);
 *  - every query produces rows at sf0.001 — the gate runs at sf0.01, and
 *    a query that is non-empty there but empty at another SF (anti-joins,
 *    set ops, threshold filters) is one data tweak away from failing the
 *    rows gate. Running ALL queries also proves none throws at the
 *    smallest SF.
 */
class CoverageSpec extends SparkSpec {

  test("every oracle key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query and oracle names are unique at the source (ListMap would silently last-win)") {
    val qNames = SparkEntry.queryPairs.map(_._1)
    assert(qNames.nonEmpty && qNames.forall(_.nonEmpty))
    assert(qNames.distinct.size === qNames.size,
      s"duplicate query keys: ${qNames.diff(qNames.distinct).distinct}")
    val oNames = SparkEntry.oraclePairs.map(_._1)
    assert(oNames.distinct.size === oNames.size,
      s"duplicate oracle keys: ${oNames.diff(oNames.distinct).distinct}")
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name returns rows at sf0.001") {
      assert(fn(spark, sf0001).count() > 0, s"$name is empty at sf0.001")
    }
  }
}
