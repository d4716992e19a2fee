package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val fact = (1L to 10000L).map(i => (i, i % 100)).toDF("fk", "payload")
  private lazy val dim = (1L to 10000L).filter(_ % 37 == 0).map(i => (i, s"d$i"))
    .toDF("dk", "name")

  test("bloom-filtered join equals the plain inner join exactly") {
    val got = BloomJoin.filteredInnerJoin(fact, "fk", dim, "dk")
      .select("fk", "payload", "dk", "name")
    val want = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "dk", "name")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() === 270) // floor(10000/37) matches
  }

  test("the bloom probe prunes the probe side before the join") {
    val pre = fact.filter(
      org.apache.spark.sql.graft.BloomFunctions.bloom_might_contain(
        dim.select(col("dk")).agg(
          org.apache.spark.sql.graft.BloomFunctions.bloom_filter_agg(col("dk"), 270, 0.01))
          .head.getAs[Array[Byte]](0),
        col("fk")))
    val kept = pre.count()
    // 270 true keys + ~1% false positives of the 9730 others
    assert(kept >= 270 && kept < 270 + 400, s"pruned scan kept $kept rows")
  }

  test("NULL probe keys never survive (inner-join semantics)") {
    val withNull = fact.unionByName(
      Seq((null.asInstanceOf[java.lang.Long], 0L)).toDF("fk", "payload")
        .select(col("fk").cast("long"), col("payload")))
    val got = BloomJoin.filteredInnerJoin(withNull, "fk", dim, "dk")
    assert(got.filter(col("fk").isNull).count() === 0)
  }

  test("explicit expectedItems skips the sizing pass and stays correct") {
    val got = BloomJoin.filteredInnerJoin(fact, "fk", dim, "dk",
      fpp = 0.01, expectedItems = 1000L)
    assert(got.count() === 270)
  }
}
