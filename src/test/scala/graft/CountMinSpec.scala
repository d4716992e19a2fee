package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CountMinBuffer
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{cms_estimate, count_min_agg}

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("estimates never undercount and are exact in the sparse regime") {
    val buf = new CountMinBuffer(4, 1024)
    val truth = Map("a" -> 100L, "b" -> 57L, "c" -> 1L)
    for ((k, c) <- truth; _ <- 1L to c) buf.add(u(k), 1L)
    for ((k, c) <- truth) {
      val est = buf.estimate(u(k))
      assert(est >= c, s"$k undercounted: $est < $c")
      assert(est === c, s"3 keys in 1024 slots must not collide: $k -> $est vs $c")
    }
    assert(buf.total === 158L)
  }

  test("merge equals single-pass build (table-identical, any split)") {
    val whole = new CountMinBuffer(4, 64)
    val p1 = new CountMinBuffer(4, 64)
    val p2 = new CountMinBuffer(4, 64)
    val items = (1 to 500).map(i => s"item${i % 37}")
    items.foreach(i => whole.add(u(i), 1L))
    items.zipWithIndex.foreach { case (i, idx) =>
      (if (idx % 2 == 0) p1 else p2).add(u(i), 1L)
    }
    p1.mergeFrom(p2)
    assert(p1.table.toSeq === whole.table.toSeq)
    assert(p1.total === whole.total)
  }

  test("serialization round-trips") {
    val buf = new CountMinBuffer(3, 128)
    (1 to 200).foreach(i => buf.add(u(s"k${i % 11}"), 1L))
    val back = CountMinBuffer.deserialize(buf.serialize())
    assert(back.depth === 3 && back.width === 128)
    assert(back.table.toSeq === buf.table.toSeq)
    assert(back.total === buf.total)
  }

  test("mismatched shapes refuse to merge") {
    val a = new CountMinBuffer(4, 64)
    val b = new CountMinBuffer(4, 128)
    assertThrows[IllegalArgumentException](a.mergeFrom(b))
  }

  test("aggregate + probe columns: estimates bound true counts over a skewed stream") {
    val df = (1 to 2000).map(i => s"key${(math.sqrt(i)).toInt}").toDF("k") // skewed
    val built = df.agg(count_min_agg(col("k"), 4, 512).as("cms")).head.getAs[Array[Byte]](0)
    val truth = df.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1))
    val est = df.select(col("k")).distinct()
      .select(col("k"), cms_estimate(built, col("k")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 2000L
    val bound = math.ceil(math.E / 512.0 * n).toLong
    for ((k, c) <- truth) {
      assert(est(k) >= c, s"$k undercounted")
      assert(est(k) <= c + bound, s"$k overcounted past the theory bound")
    }
  }

}
