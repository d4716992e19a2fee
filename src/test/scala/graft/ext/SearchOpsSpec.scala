package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SearchOpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark scans parquet fast"),
    (2L, "spark joins are hash joins"),
    (3L, "parquet footers hold stats"),
    (4L, "spark writes parquet sinks"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("index postings are sorted, distinct per doc, with exact doc_freq") {
    val idx = SearchOps.buildInvertedIndex(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getSeq[Long](1), r.getLong(2))).toSeq
    val byTok = idx.map(t => t._1 -> t).toMap
    assert(byTok("spark") === (("spark", Seq(1L, 2L, 4L), 3L)))
    assert(byTok("parquet") === (("parquet", Seq(1L, 3L, 4L), 3L)))
    // 'joins' appears twice in doc 2 but posts once
    assert(byTok("joins") === (("joins", Seq(2L), 1L)))
    // the empty doc contributes nothing
    assert(idx.forall(!_._2.contains(5L)))
  }

  test("conjunctive search equals a direct scan") {
    val idx = SearchOps.buildInvertedIndex(docs, "doc_id", "text")
    val got = SearchOps.searchAnd(idx, Seq("spark", "parquet"))
      .as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 4L))
    // single term
    assert(SearchOps.searchAnd(idx, Seq("footers")).as[Long].collect().toSeq === Seq(3L))
    // duplicated query terms do not double-count
    assert(SearchOps.searchAnd(idx, Seq("spark", "spark", "parquet"))
      .as[Long].collect().sorted.toSeq === Seq(1L, 4L))
  }

  test("unseen or stop-listed terms make the conjunction empty (conservative)") {
    val idx = SearchOps.buildInvertedIndex(docs, "doc_id", "text")
    assert(SearchOps.searchAnd(idx, Seq("spark", "nonexistent")).isEmpty)
    val capped = SearchOps.buildInvertedIndex(docs, "doc_id", "text", maxDocFreq = 2)
    // 'spark' (df=3) is stop-listed at cap 2
    assert(capped.filter(col("token") === "spark").isEmpty)
    assert(SearchOps.searchAnd(capped, Seq("spark", "parquet")).isEmpty)
  }

  test("phrase search: adjacency in order, repeated terms, order matters") {
    val pdocs = Seq(
      (1L, "hash join beats nested loop"),
      (2L, "a hash join and a hash table"),
      (3L, "join hash order reversed"),       // both words, wrong order
      (4L, "hash accumulate join split"),     // both words, not adjacent
      (5L, "batch batch batch"),
      (6L, "batch once only")
    ).toDF("doc_id", "text")
    val idx = SearchOps.buildPositionalIndex(pdocs, "doc_id", "text")
    def run(p: String*) =
      SearchOps.searchPhrase(idx, p).as[Long].collect().sorted.toSeq
    assert(run("hash", "join") === Seq(1L, 2L))
    assert(run("join", "hash") === Seq(3L))
    // repeated-term phrase needs genuinely consecutive repeats
    assert(run("batch", "batch") === Seq(5L))
    assert(run("batch", "batch", "batch") === Seq(5L))
    assert(run("batch") === Seq(5L, 6L)) // single-term degenerates to lookup
    assert(run("nested", "loop", "wins") === Seq.empty)
  }

  test("mergeIndex over disjoint halves is identical to a from-scratch rebuild") {
    val a = SearchOps.buildPositionalIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    val b = SearchOps.buildPositionalIndex(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
    val merged = SearchOps.mergeIndex(a, b)
      .collect().map(r => (r.getString(0), r.getSeq[Any](1).toList, r.getLong(2)))
      .sortBy(_._1).toSeq
    val rebuilt = SearchOps.buildPositionalIndex(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getSeq[Any](1).toList, r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(merged === rebuilt)
  }

  test("stop-list gate runs before any posting list materializes") {
    val plan = SearchOps.buildInvertedIndex(docs, "doc_id", "text", maxDocFreq = 2)
      .queryExecution.sparkPlan.toString
    // the doc_freq <= cap filter must exist as a plan-level Filter feeding
    // the join below the collect_list aggregate (the counting pre-pass);
    // the semantic effect (spark df=3 stop-listed) is pinned above
    assert(plan.contains("collect_list"), plan)
    assert("Filter .*doc_freq".r.findFirstIn(plan).isDefined ||
      plan.contains("(doc_freq"), "expected a doc_freq gate in the plan\n" + plan)
  }
}
