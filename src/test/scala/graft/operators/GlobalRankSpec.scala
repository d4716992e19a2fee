package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Semantics of the distributed total-order primitive: ranks and NTILE
 * buckets must be bit-identical to the single-partition window functions
 * they replace, for any row count / bin count / partition layout.
 */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  private def randomDf(n: Int, seed: Long) = {
    val r = new scala.util.Random(seed)
    // duplicate `v` values force the tie-break column to matter
    (1 to n).map(i => (i.toLong, r.nextInt(n / 4 + 1))).toDF("id", "v")
      .repartition(7) // deliberately unaligned input layout
  }

  test("withGlobalRank equals window row_number for a fully tie-broken order") {
    val df = randomDf(500, seed = 1L)
    val got = GlobalRank
      .withGlobalRank(df, Seq(col("v").asc, col("id").asc), "r")
      .orderBy("r").select("id").as[Long].collect()
    val want = df
      .withColumn("r", row_number().over(Window.orderBy(col("v").asc, col("id").asc)))
      .orderBy("r").select("id").as[Long].collect()
    assert(got.toSeq == want.toSeq)
  }

  test("ranks are contiguous 1..n and deterministic across runs") {
    val df = randomDf(300, seed = 2L)
    val a = GlobalRank.withGlobalRank(df, Seq(col("v").asc, col("id").asc), "r", numPartitions = 5)
    val b = GlobalRank.withGlobalRank(df, Seq(col("v").asc, col("id").asc), "r", numPartitions = 11)
    val ra = a.orderBy("id").select("r").as[Long].collect()
    assert(a.select("r").as[Long].collect().sorted.toSeq == (1L to 300L))
    // same ranks no matter how many range partitions carried the sort
    assert(ra.toSeq == b.orderBy("id").select("r").as[Long].collect().toSeq)
  }

  test("ntileExpr matches SQL NTILE for uneven, even, and fewer-rows-than-bins cases") {
    for ((n, bins) <- Seq((97, 10), (100, 10), (7, 10), (1, 3), (64, 8), (1000, 7))) {
      val df = (1L to n.toLong).toDF("id")
      val got = GlobalRank.withNtile(df, Seq(col("id").asc), bins, "b", "r")
        .orderBy("r").select("b").as[Long].collect()
      val want = df
        .withColumn("b", ntile(bins).over(Window.orderBy(col("id").asc)).cast("long"))
        .orderBy("id").select("b").as[Long].collect()
      assert(got.toSeq == want.toSeq, s"ntile mismatch for n=$n bins=$bins")
    }
  }

  test("the sort behind the rank is range-partitioned (each task sorts a slice, never the whole input)") {
    val df = randomDf(200, seed = 3L)
    // same construction as withGlobalRank's internal sort
    val sorted = df.repartitionByRange(5, col("v").asc, col("id").asc)
      .sortWithinPartitions(col("v").asc, col("id").asc)
    val plan = sorted.queryExecution.sparkPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("withPrefixSum equals the window running sum on a fully tie-broken order") {
    val df = randomDf(400, seed = 4L).withColumn("w", ($"id" % 13) + 1)
    val got = GlobalRank.withPrefixSum(df,
        Seq($"v".asc, $"id".asc), $"w", rankName = "r", sumName = "ps")
      .select($"id", $"r", $"ps")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"v".asc, $"id".asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = df
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"v".asc, $"id".asc)).cast("long"))
      .withColumn("ps", sum($"w").over(w))
      .select($"id", $"r", $"ps")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(got === want)
  }

  test("withPrefixSum is layout-independent and keeps input columns") {
    val df = randomDf(300, seed = 5L).withColumn("w", ($"id" % 7) + 1)
    def run(d: org.apache.spark.sql.DataFrame) =
      GlobalRank.withPrefixSum(d, Seq($"v".asc, $"id".asc), $"w")
        .select($"id", $"global_rank", $"prefix_sum")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(run(df) === run(df.repartition(11)))
    val out = GlobalRank.withPrefixSum(df, Seq($"id".asc), $"w")
    assert(out.columns.toSeq === Seq("id", "v", "w", "global_rank", "prefix_sum"))
    // the last row's inclusive prefix sum is the grand total
    val total = df.agg(sum($"w")).head().getLong(0)
    assert(out.orderBy($"global_rank".desc).head().getAs[Long]("prefix_sum") === total)
  }

  test("withPrefixSums: k columns over ONE sort equal k single scans") {
    val df = (1L to 500L).map(i => (i, i % 37, i % 5, (i % 7) - 3))
      .toDF("id", "v", "wa", "wb")
    val multi = GlobalRank.withPrefixSums(df,
        Seq($"v".asc, $"id".asc), Seq($"wa", $"wb"),
        rankName = "r", sumNames = Seq("sa", "sb"))
      .select($"id", $"r", $"sa", $"sb")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSet
    val singleA = GlobalRank.withPrefixSum(df, Seq($"v".asc, $"id".asc), $"wa",
        rankName = "r", sumName = "sa")
      .select($"id", $"r", $"sa")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    val singleB = GlobalRank.withPrefixSum(df, Seq($"v".asc, $"id".asc), $"wb",
        rankName = "r", sumName = "sb")
      .select($"id", $"r", $"sb")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(multi === multi.map { case (id, r, _, _) =>
      (id, r, singleA((id, r)), singleB((id, r)))
    })
    // layout independence and schema shape
    val again = GlobalRank.withPrefixSums(df.repartition(13),
        Seq($"v".asc, $"id".asc), Seq($"wa", $"wb"),
        rankName = "r", sumNames = Seq("sa", "sb"))
      .select($"id", $"r", $"sa", $"sb")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSet
    assert(again === multi)
    intercept[IllegalArgumentException] {
      GlobalRank.withPrefixSums(df, Seq($"v"), Seq($"wa", $"wb"),
        sumNames = Seq("only_one"))
    }
  }
}
