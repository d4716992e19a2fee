package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select(col("id_a"), col("id_b"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("planted typos: substitutions, insertions, and deletions all surface") {
    val rows = Seq(
      (1L, "kitten"),
      (2L, "sitten"),  // 1 substitution from kitten
      (3L, "kittten"), // 1 insertion from kitten
      (4L, "kitte"),   // 1 deletion from kitten
      (5L, "zzzzzz")   // far from everything
    ).toDF("id", "name")
    val got = pairs(FuzzyJoin.join(rows, "id", "name", rows, "id", "name",
      maxDist = 2, selfPairs = true))
    val expected = Set(
      (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L))
    assert(got === expected)
  }

  test("reverseKeys changes only the blocking, never the result") {
    val rows = Seq(
      (1L, "prefix-AAAA"), (2L, "prefix-AAAB"), (3L, "prefix-ZZZZ"),
      (4L, "other-AAAA")
    ).toDF("id", "name")
    val plain = pairs(FuzzyJoin.join(rows, "id", "name", rows, "id", "name",
      maxDist = 2, selfPairs = true))
    val rev = pairs(FuzzyJoin.join(rows, "id", "name", rows, "id", "name",
      maxDist = 2, reverseKeys = true, selfPairs = true))
    assert(plain === rev)
    assert(plain === Set((1L, 2L, 1L)))
  }

  test("exactness vs brute force on real keys (sf0.001 customers)") {
    val c = spark.read.parquet(s"$sf0001/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val fuzzy = pairs(FuzzyJoin.join(c, "id", "name", c, "id", "name",
      maxDist = 2, reverseKeys = true, selfPairs = true))
    val a = c.select(col("id").as("id_a"), col("name").as("name_a"))
    val b = c.select(col("id").as("id_b"), col("name").as("name_b"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 2)
    assert(fuzzy === pairs(brute))
    assert(fuzzy.nonEmpty) // the dataset really exercises the operator
  }

  test("exactness vs brute force on VARIABLE-length keys (indels shift every segment)") {
    // deterministic corpus of mutated strings: base words plus copies with
    // one or two deletions/insertions/substitutions at varying positions
    val base = Seq("sparkenginequery", "distributedjoin", "tokenizerfoo", "zzzzzzzz")
    val variants = base.zipWithIndex.flatMap { case (w, bi) =>
      Seq(
        w,                                        // exact dup (dist 0)
        w.substring(1),                           // 1 deletion at front
        w.substring(0, w.length - 2),             // 2 deletions at end
        w.substring(0, 3) + "X" + w.substring(3), // 1 insertion
        "Y" + w + "Z"                             // 2 insertions
      ).zipWithIndex.map { case (s, vi) => (bi * 10L + vi, s) }
    }
    val df = variants.toDF("id", "name")
    val fuzzy = pairs(FuzzyJoin.join(df, "id", "name", df, "id", "name",
      maxDist = 2, selfPairs = true))
    val a = df.select(col("id").as("id_a"), col("name").as("name_a"))
    val b = df.select(col("id").as("id_b"), col("name").as("name_b"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 2)
    assert(fuzzy === pairs(brute))
    // the corpus really exercises cross-length matches
    assert(fuzzy.exists { case (ia, ib, d) => d > 0 &&
      variants.toMap.apply(ia).length != variants.toMap.apply(ib).length })
  }

  test("hot-block recursive partitioning returns exactly the single-level pair set") {
    // a low-entropy corpus: every key shares the long constant prefix, so
    // the prefix segments form one block holding ALL keys — with
    // hotBlockThreshold=2 the hot path re-blocks on complement sub-segments
    val df = (0L until 40L).map(i => (i, f"Customer#${i % 20}%09d")).toDF("id", "name")
    val twoLevel = pairs(FuzzyJoin.join(df, "id", "name", df, "id", "name",
      maxDist = 2, selfPairs = true, hotBlockThreshold = 2))
    val oneLevel = pairs(FuzzyJoin.join(df, "id", "name", df, "id", "name",
      maxDist = 2, selfPairs = true, hotBlockThreshold = Int.MaxValue))
    assert(twoLevel === oneLevel)
    assert(twoLevel.nonEmpty)
    // brute-force ground truth for full confidence
    val a = df.select(col("id").as("id_a"), col("name").as("name_a"))
    val b = df.select(col("id").as("id_b"), col("name").as("name_b"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 2)
    assert(twoLevel === pairs(brute))
    intercept[IllegalArgumentException] {
      FuzzyJoin.join(df, "id", "name", df, "id", "name", maxDist = 1, hotBlockThreshold = 0)
    }
  }

  test("hot path with variable-length keys (indels) still matches brute force") {
    // shared constant prefix + distinctive tail, with insertions/deletions
    // so probe and index lengths differ and complements shift
    val base = (0L until 12L).map(i => (i, f"https://example.com/page/${i}%03d"))
    val variants = base.flatMap { case (i, s) => Seq(
      (i * 10, s), (i * 10 + 1, s.substring(0, s.length - 1)), // 1 del
      (i * 10 + 2, s + "x"),                                   // 1 ins
      (i * 10 + 3, s.substring(0, 10) + "Q" + s.substring(10)) // mid ins
    )}
    val df = variants.toDF("id", "name")
    val twoLevel = pairs(FuzzyJoin.join(df, "id", "name", df, "id", "name",
      maxDist = 2, selfPairs = true, hotBlockThreshold = 3))
    val a = df.select(col("id").as("id_a"), col("name").as("name_a"))
    val b = df.select(col("id").as("id_b"), col("name").as("name_b"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 2)
    assert(twoLevel === pairs(brute))
    assert(twoLevel.nonEmpty)
  }

  test("cross-frame join and maxDist=0 degenerate to exact equality") {
    val l = Seq((1L, "abc"), (2L, "def")).toDF("id", "k")
    val r = Seq((10L, "abc"), (11L, "xyz")).toDF("id", "k")
    val got = pairs(FuzzyJoin.join(l, "id", "k", r, "id", "k", maxDist = 0))
    assert(got === Set((1L, 10L, 0L)))
    intercept[IllegalArgumentException] {
      FuzzyJoin.join(l, "id", "k", r, "id", "k", maxDist = -1)
    }
  }
}
