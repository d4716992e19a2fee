package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Inverted-index keyword search over a document corpus — build the
 * token → sorted-posting-list index once, answer conjunctive (AND) keyword
 * queries from the postings of the query terms only, never rescanning the
 * corpus. The retrieval shape every corpus-curation console needs next to
 * the ANN tiers (Similarity/VectorOps): exact term search.
 *
 * Scale design: the index build is one (doc, token)-distinct projection +
 * one hash aggregate; each posting list lands on the token's reducer. The
 * known skew is stopwords — a token in every document collects a
 * corpus-sized array on ONE reducer — so the build STOP-LISTS tokens above
 * `maxDocFreq` in a counting pre-pass (standard IR practice: ubiquitous
 * terms carry no selectivity; conjunctive queries on them degenerate to a
 * scan anyway). Queries touch |terms| index rows; the intersection runs
 * over those few posting lists, not the corpus.
 */
object SearchOps {

  /**
   * Token → (postings, doc_freq), tokens with doc_freq > maxDocFreq
   * excluded. Postings are sorted doc-id arrays (merge-friendly,
   * run-length-compressible at rest).
   */
  def buildInvertedIndex(
      docs: DataFrame, idCol: String, textCol: String,
      maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val pairs = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(array_distinct(Dedup.tokens(col(textCol)))).as("token"))
    // counting pre-pass (map-side combined longs) gates the heavy
    // collect_list so no stopword array ever materializes
    val kept = pairs.groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") <= maxDocFreq)
    pairs.join(kept, "token")
      .groupBy(col("token"), col("doc_freq"))
      .agg(sort_array(collect_list(col("doc_id"))).as("postings"))
      .select(col("token"), col("postings"), col("doc_freq"))
  }

  /**
   * Conjunctive query: doc ids containing ALL `terms`, by intersecting the
   * terms' posting lists (explode + count == |terms|). Terms missing from
   * the index (unseen or stop-listed) make the result empty — the
   * conservative contract for a curation filter; scan-search such terms
   * directly instead.
   */
  def searchAnd(index: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "terms must not be empty")
    val distinctTerms = terms.distinct
    val hits = index.filter(col("token").isin(distinctTerms: _*))
    hits.select(explode(col("postings")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__n_terms"))
      .filter(col("__n_terms") === distinctTerms.size)
      .select(col("doc_id"))
  }

  /**
   * Positional index: token → sorted (doc_id, pos) postings (+ doc_freq,
   * same stop-list gate as [[buildInvertedIndex]]) — the structure phrase
   * and proximity queries need.
   */
  def buildPositionalIndex(
      docs: DataFrame, idCol: String, textCol: String,
      maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val pairs = docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(Dedup.tokens(col(textCol))).as(Seq("pos", "token")))
    val kept = pairs.select(col("token"), col("doc_id")).distinct()
      .groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") <= maxDocFreq)
    pairs.join(kept, "token")
      .groupBy(col("token"), col("doc_freq"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("pos")))).as("postings"))
      .select(col("token"), col("postings"), col("doc_freq"))
  }

  /**
   * Exact-phrase query over a positional index: doc ids where the terms
   * occur ADJACENTLY in order. Each term i's postings re-base to
   * (doc, pos - i); a doc matches when some base collects all |phrase|
   * offsets. Touches only the phrase terms' postings. Repeated terms in
   * the phrase are handled correctly (each occurrence re-bases its own
   * posting row).
   */
  def searchPhrase(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must not be empty")
    val perTerm = phrase.zipWithIndex.map { case (term, i) =>
      index.filter(col("token") === term)
        .select(explode(col("postings")).as("__p"))
        .select(col("__p.doc_id").as("doc_id"), (col("__p.pos") - i).as("__base"),
          lit(i).as("__i"))
    }
    perTerm.reduce(_ unionByName _)
      .groupBy(col("doc_id"), col("__base"))
      .agg(countDistinct(col("__i")).as("__hits"))
      .filter(col("__hits") === phrase.length)
      .select(col("doc_id")).distinct()
  }

  /**
   * Incremental index maintenance: merge a delta corpus's index into an
   * existing one (doc sets must be disjoint — dedup upstream via
   * [[graft.operators.Ingest.upsert]]). Posting arrays concatenate and
   * re-sort per token, doc_freqs add; the result is IDENTICAL to a
   * from-scratch rebuild over the union corpus (q191 pins that identity),
   * at the cost of touching only tokens present in either side — the
   * index never rebuilds from the full corpus on ingest.
   */
  def mergeIndex(a: DataFrame, b: DataFrame): DataFrame = {
    val cols = Seq("token", "postings", "doc_freq").map(col)
    a.select(cols: _*).unionByName(b.select(cols: _*))
      .groupBy(col("token"))
      .agg(sort_array(flatten(collect_list(col("postings")))).as("postings"),
        sum(col("doc_freq")).as("doc_freq"))
      .select(col("token"), col("postings"), col("doc_freq"))
  }
}
