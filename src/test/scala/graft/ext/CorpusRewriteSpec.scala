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

  test("removeDuplicatedSpans excises every occurrence of a cross-doc span") {
    // "a b c" duplicated across docs 1 and 2 -> removed from BOTH
    val df = Seq(
      (1L, "a b c x y z"),
      (2L, "p q a b c r"),
      (3L, "u v w")
    ).toDF("doc_id", "text")
    val out = CorpusRewrite.removeDuplicatedSpans(df, "doc_id", "text", n = 3)
    assert(textOf(out, 1L) === Some("x y z"))
    assert(textOf(out, 2L) === Some("p q r"))
    assert(textOf(out, 3L) === Some("u v w")) // sub-n doc? len 3 = n, unique -> intact
  }

  test("removeDuplicatedSpans merges overlapping duplicated grams into one excision") {
    // doc 1 repeats "a b c d" -> within-doc duplicate; the two occurrences
    // overlap nothing but chain through shared grams in doc 2
    val df = Seq(
      (1L, "a b c d k a b c d"),
      (2L, "m n o p q r s t")
    ).toDF("doc_id", "text")
    val out = CorpusRewrite.removeDuplicatedSpans(df, "doc_id", "text", n = 4)
    // both "a b c d" occurrences covered; "k" at pos 4 is covered by the
    // duplicated gram only if a dup gram starts within 3 before it — the
    // grams "b c d k", "c d k a", "d k a b" occur once each, so "k" survives
    assert(textOf(out, 1L) === Some("k"))
    assert(textOf(out, 2L) === Some("m n o p q r s t"))
  }

  test("removeDuplicatedSpans passes sub-n documents through untouched") {
    val df = Seq(
      (1L, "same short"),
      (2L, "same short"), // exact dup but only 2 words < n=3: kept
      (3L, "one two three four")
    ).toDF("doc_id", "text")
    val out = CorpusRewrite.removeDuplicatedSpans(df, "doc_id", "text", n = 3)
    assert(textOf(out, 1L) === Some("same short"))
    assert(textOf(out, 2L) === Some("same short"))
    assert(textOf(out, 3L) === Some("one two three four"))
  }

  test("removeDuplicatedSpans drops a doc that is one big duplicated span") {
    val df = Seq(
      (1L, "x y z w"),
      (2L, "x y z w"),
      (3L, "a b c d")
    ).toDF("doc_id", "text")
    val out = CorpusRewrite.removeDuplicatedSpans(df, "doc_id", "text", n = 4)
    assert(out.count() === 1)
    assert(textOf(out, 3L) === Some("a b c d"))
  }
}
