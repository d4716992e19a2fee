package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Sampler, SemiJoinReducer}

/**
 * Property-based invariants over randomized inputs (SURVEY.md §5.3):
 * random key overlaps, ratios, and duplicates — the shapes golden tests
 * miss.
 */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** draw deterministic samples from a ScalaCheck generator */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val smallRatio = Gen.chooseNum(0.0, 1.0)
  private val keyPool = Gen.chooseNum(1L, 30L)

  test("property: exact sample size == floor(n*ratio) for arbitrary ratios and duplicate-heavy data") {
    samples(Gen.listOfN(8, smallRatio), 8).foreach { ratios =>
      val df = (1 to 200).map(i => (i.toLong % 17, s"v${i % 5}")).toDF("k", "v") // heavy dups
      ratios.foreach { r =>
        assert(Sampler.exact(df, r, seed = 1L).count() === (200 * r).toLong, s"ratio $r")
      }
    }
  }

  test("property: semi+anti partition the dim table for arbitrary key overlaps") {
    samples(Gen.zip(Gen.listOfN(25, keyPool), Gen.listOfN(40, keyPool)), 10).foreach {
      case (dimKeys, factKeys) =>
        val dim = dimKeys.zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "payload")
        val fact = factKeys.toDF("fk")
        val semi = SemiJoinReducer.reduce(dim, "k", fact, "fk")
        val anti = SemiJoinReducer.antiReduce(dim, "k", fact, "fk")
        assert(semi.count() + anti.count() === dim.count())
        val factSet = factKeys.toSet
        val expectedSemi = dimKeys.count(factSet.contains)
        assert(semi.count() === expectedSemi)
    }
  }

  test("property: semi-join output rows are exactly the dim rows with matching keys (multiset)") {
    samples(Gen.zip(Gen.listOfN(30, keyPool), Gen.listOfN(10, keyPool)), 10).foreach {
      case (dimKeys, factKeys) =>
        val dim = dimKeys.zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "payload")
        val fact = factKeys.toDF("fk")
        val got = SemiJoinReducer.reduce(dim, "k", fact, "fk")
          .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
        val factSet = factKeys.toSet
        val expected = dimKeys.zipWithIndex.collect {
          case (k, i) if factSet.contains(k) => (k, i)
        }.sorted.toSeq
        assert(got === expected)
    }
  }

  test("property: per-group exact-k respects min(k, groupSize) for random group shapes") {
    samples(Gen.zip(Gen.chooseNum(1, 10), Gen.chooseNum(1, 6)), 8).foreach { case (k, nGroups) =>
      val rows = (1 to 100).map(i => (i.toLong % nGroups, i.toLong))
      val df = rows.toDF("g", "id")
      val sizes = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val got = Sampler.perGroupExactK(df, Seq("g"), k, seed = 2L)
        .groupBy($"g").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      sizes.foreach { case (g, n) =>
        assert(got.getOrElse(g, 0L) === math.min(k.toLong, n), s"group $g k=$k")
      }
    }
  }
}
