package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins RelCheck.multisetEquals ≡ the two-exceptAll predicate it replaced
  * (optimization r11), including the multiplicity and NULL edge cases. */
class RelCheckSpec extends SparkSpec {
  import spark.implicits._

  private def bothWays(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  private def check(a: DataFrame, b: DataFrame): Unit =
    assert(RelCheck.multisetEquals(a, b) == bothWays(a, b))

  test("equal multisets, including duplicates") {
    val a = Seq((1, "x"), (1, "x"), (2, "y")).toDF("k", "v")
    val b = Seq((2, "y"), (1, "x"), (1, "x")).toDF("k", "v")
    assert(RelCheck.multisetEquals(a, b)); check(a, b)
  }

  test("multiplicity mismatch is NOT equal (set-equal but not multiset-equal)") {
    val a = Seq((1, "x"), (1, "x")).toDF("k", "v")
    val b = Seq((1, "x")).toDF("k", "v")
    assert(!RelCheck.multisetEquals(a, b)); check(a, b)
  }

  test("extra row on either side") {
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq((1, "x"), (3, "z")).toDF("k", "v")
    check(a, b); check(b, a)
    assert(!RelCheck.multisetEquals(a, b))
  }

  test("NULLs compare null-safely like exceptAll") {
    val a = Seq((Some(1), Option.empty[String]), (None, Some("y")))
      .toDF("k", "v")
    val b = Seq((None, Some("y")), (Some(1), Option.empty[String]))
      .toDF("k", "v")
    assert(RelCheck.multisetEquals(a, b)); check(a, b)
    val c = Seq((Some(1), Option.empty[String])).toDF("k", "v")
    assert(!RelCheck.multisetEquals(a, c)); check(a, c)
  }

  test("empty vs empty and empty vs non-empty") {
    val a = Seq.empty[(Int, String)].toDF("k", "v")
    val b = Seq((1, "x")).toDF("k", "v")
    assert(RelCheck.multisetEquals(a, a.limit(0)))
    assert(!RelCheck.multisetEquals(a, b)); check(a, b)
  }

  test("array columns group and compare like exceptAll") {
    val a = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f))).toDF("id", "vec")
    val b = Seq((2L, Seq(3.0f)), (1L, Seq(1.0f, 2.0f))).toDF("id", "vec")
    assert(RelCheck.multisetEquals(a, b)); check(a, b)
    val c = Seq((1L, Seq(1.0f, 2.5f)), (2L, Seq(3.0f))).toDF("id", "vec")
    assert(!RelCheck.multisetEquals(a, c)); check(a, c)
  }
}
