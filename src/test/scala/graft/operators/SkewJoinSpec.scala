package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedInnerJoin equals plain inner join on skewed data (90% one key)") {
    val big = ((1 to 9000).map(i => (1L, s"hot$i")) ++ (1 to 1000).map(i => (i.toLong % 50 + 2, s"cold$i")))
      .toDF("k", "payload")
    val small = (1L to 60L).map(i => (i, s"dim$i")).toDF("k", "attr")
    val plain = big.join(small, Seq("k"), "inner")
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", salts = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("join key spreads across (key, salt) partitions in the plan") {
    val big = (1 to 100).map(i => (1L, i)).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "attr")
    val plan = SkewJoin.saltedInnerJoin(big, small, "k", salts = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__graft_salt"), plan)
  }
}
