package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorpusRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def textOf(df: org.apache.spark.sql.DataFrame, id: Long): Option[String] =
    df.filter(col("doc_id") === id).collect().headOption.map(_.getAs[String]("text"))

  test("segments splits into k-word runs with a short tail") {
    val df = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val segs = CorpusRewrite.segments(df, "doc_id", "text", k = 3)
      .orderBy("seg").select("segtext").as[String].collect()
    assert(segs.toSeq === Seq("a b c", "d e f", "g h"))
  }

  test("dedupSegmentsCorpus keeps only the first corpus-wide occurrence") {
    // doc 1 and doc 2 share the segment "x y z"; doc 2 also repeats it
    val df = Seq(
      (1L, "x y z a a a"),
      (2L, "x y z b b b x y z"),
      (3L, "c c c")
    ).toDF("doc_id", "text")
    val out = CorpusRewrite.dedupSegmentsCorpus(df, "doc_id", "text", k = 3)
    assert(textOf(out, 1L) === Some("x y z a a a"))
    assert(textOf(out, 2L) === Some("b b b")) // both "x y z" copies removed
    assert(textOf(out, 3L) === Some("c c c"))
  }

  test("dedupSegmentsCorpus drops a doc whose every segment is a repeat") {
    val df = Seq((1L, "p q"), (2L, "p q")).toDF("doc_id", "text")
    val out = CorpusRewrite.dedupSegmentsCorpus(df, "doc_id", "text", k = 2)
    assert(textOf(out, 1L) === Some("p q"))
    assert(out.count() === 1) // doc 2 vanished
  }

  test("dedupSegmentsWithinDoc removes repeats inside a doc but not across docs") {
    val df = Seq(
      (1L, "x y x y a b"), // "x y" repeated within doc 1
      (2L, "x y c d")      // doc 2's "x y" must survive
    ).toDF("doc_id", "text")
    val out = CorpusRewrite.dedupSegmentsWithinDoc(df, "doc_id", "text", k = 2)
    assert(textOf(out, 1L) === Some("x y a b"))
    assert(textOf(out, 2L) === Some("x y c d"))
  }

  test("stripBoilerplate removes only segments above the doc-frequency threshold") {
    // "nav bar" appears in 3 of 4 docs (0.75 > 0.5); "rare seg" in 1 (kept)
    val df = Seq(
      (1L, "nav bar hello world"),
      (2L, "nav bar foo baz"),
      (3L, "nav bar rare seg"),
      (4L, "only unique words")
    ).toDF("doc_id", "text")
    val out = CorpusRewrite.stripBoilerplate(df, "doc_id", "text", k = 2, maxDocFrac = 0.5)
    assert(textOf(out, 1L) === Some("hello world"))
    assert(textOf(out, 2L) === Some("foo baz"))
    assert(textOf(out, 3L) === Some("rare seg"))
    assert(textOf(out, 4L) === Some("only unique words"))
  }

  test("stripBoilerplate threshold is strict: df == maxDocFrac*n survives") {
    // "a b" in exactly 2 of 4 docs = 0.5, NOT > 0.5 → kept
    val df = Seq(
      (1L, "a b one two"), (2L, "a b three four"),
      (3L, "five six"), (4L, "seven eight")
    ).toDF("doc_id", "text")
    val out = CorpusRewrite.stripBoilerplate(df, "doc_id", "text", k = 2, maxDocFrac = 0.5)
    assert(textOf(out, 1L) === Some("a b one two"))
    assert(textOf(out, 2L) === Some("a b three four"))
  }

  test("tokenization matches Dedup.tokens: case-folded, whitespace-split") {
    val df = Seq((1L, "  Hello   WORLD  hello world")).toDF("doc_id", "text")
    val out = CorpusRewrite.dedupSegmentsWithinDoc(df, "doc_id", "text", k = 2)
    assert(textOf(out, 1L) === Some("hello world"))
  }
}
