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

  test("keySkewReport: hot key surfaces with the exact skew ratio, topK ties on key") {
    // key 1 x 6 rows, keys 2..5 x 1 row each -> 10 rows, 5 keys, max 6
    val df = (Seq.fill(6)(1L) ++ Seq(2L, 3L, 4L, 5L)).toDF("k")
    val got = SkewJoin.keySkewReport(df, "k", topK = 3).collect()
    assert(got.length === 3)
    val hot = got.head
    assert(hot.getLong(0) === 1L && hot.getLong(1) === 6L)
    assert(hot.getAs[Double]("share") === 0.6)
    assert(hot.getAs[Long]("n_keys") === 5L && hot.getAs[Long]("n_rows") === 10L)
    // skew ratio = max * keys / rows = 6*5/10 = 3 -> "salt by ~3"
    assert(hot.getAs[Double]("skew_ratio") === 3.0)
    // remaining top slots tie on cnt=1 -> smallest keys first
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      SkewJoin.keySkewReport(df, "k", topK = 0)
    }
  }
}
