package graft

import org.apache.spark.sql.functions._

/** Misra-Gries frequent-items sketch: the guarantee (every item with true
  * count > N/(k+1) survives; stored counts are lower bounds) must hold
  * under any partitioning, even though counter VALUES are order-dependent. */
class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish: item i appears ~1000/i times -> a handful of heavies + tail
  private lazy val stream = (1 to 200).flatMap(i => Seq.fill(1000 / i)(s"item_$i"))
  private lazy val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def sketchOf(partitions: Int, k: Int): Map[String, Long] = {
    val df = spark.createDataset(stream).repartition(partitions).toDF("item")
    val arr = df.agg(graft.functions.frequent_items($"item", k).as("fi")).head()
      .getSeq[org.apache.spark.sql.Row](0)
    arr.map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("every item with true count > N/(k+1) is in the sketch; counts are lower bounds") {
    val n = stream.size.toLong
    for (parts <- Seq(1, 7, 32); k <- Seq(20, 50)) {
      val sk = sketchOf(parts, k)
      assert(sk.size <= k)
      val mustHave = truth.filter(_._2 > n / (k + 1)).keySet
      assert(mustHave.subsetOf(sk.keySet),
        s"parts=$parts k=$k missing=${mustHave -- sk.keySet}")
      sk.foreach { case (i, c) =>
        assert(c <= truth(i), s"count must be a lower bound: $i sketch=$c true=${truth(i)}")
        assert(c >= truth(i) - n / (k + 1), s"under-count beyond guarantee for $i")
      }
    }
  }

  test("weighted variant: every item with total weight > W/(k+1) survives any partitioning") {
    // item i carries weight i on each of its appearances -> total weight
    // skews to the high-i items even though their row counts are lower
    val weighted = (1 to 100).flatMap(i => Seq.fill(5)((s"w_$i", i.toLong)))
    val truthW = weighted.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val totalW = weighted.map(_._2).sum
    for (parts <- Seq(1, 13); k <- Seq(10, 30)) {
      val df = spark.createDataset(weighted).repartition(parts).toDF("item", "w")
      val sk = df.agg(graft.functions.frequent_items_weighted($"item", $"w", k).as("fi"))
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val mustHave = truthW.filter(_._2 > totalW / (k + 1)).keySet
      assert(mustHave.subsetOf(sk.keySet),
        s"parts=$parts k=$k missing=${mustHave -- sk.keySet}")
      sk.foreach { case (i, c) => assert(c <= truthW(i)) }
    }
  }

  test("q106 two-pass heavy hitters equals the exact groupBy-HAVING result") {
    val got = SparkEntry.queries("q106_heavy_hitters")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(graft.ext.Dedup.tokens($"text")).as("tok"))
    val n = toks.count()
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * 100L >= n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exact)
    assert(got.nonEmpty)
  }
}
