package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus REWRITE operators: unlike the scoring/filtering family in
 * [[CorpusFilters]], these return the corpus itself with its text rewritten
 * (extension surface; the reference has no text operators at all —
 * /root/reference/src/bin/join.rs:66-70 stringifies join keys and nothing
 * else). The three classic web-corpus cleanups:
 *
 *  - [[dedupSegmentsCorpus]] — C4-style corpus-level segment dedup (Raffel
 *    et al. 2020, arXiv:1910.10683 §2.2 dedupe "any three-sentence span"
 *    corpus-wide, keeping one occurrence);
 *  - [[dedupSegmentsWithinDoc]] — within-document repetition removal (the
 *    rewrite counterpart of the Gopher repetition *filters* in
 *    [[CorpusFilters.repetitionStats]]);
 *  - [[stripBoilerplate]] — drop segments whose document frequency exceeds
 *    a threshold (nav bars / footers / cookie banners; RefinedWeb, Penedo
 *    et al. 2023, arXiv:2306.01116 line-level "mostly repeated" removal).
 *
 * Documents here have no sentence markers, so the segmentation unit is a
 * run of `k` consecutive words (the last run of a doc may be shorter) —
 * callers with real line/sentence structure segment upstream and pass k
 * large. Tokenization matches [[Dedup.tokens]] (lowercase, split on
 * whitespace); documents with no tokens drop out of the output, and a
 * document whose every segment is removed drops out too (its text would be
 * empty).
 *
 * 100 TB design notes:
 *  - NO global or per-segment-key window sort anywhere: "first occurrence"
 *    is `min(struct(id, seg))` — a hash aggregation with map-side partial
 *    combine, so a boilerplate segment occurring in millions of documents
 *    collapses per-partition before it shuffles (a
 *    `Window.partitionBy(segtext)` would funnel those millions of rows
 *    through one task — the q123/q124 anti-pattern PlanSpec bans).
 *  - Segments are k-bounded, so every `collect_list` group is at most k
 *    words (reassembly groups are doc-bounded, same contract as the
 *    shingle operators).
 *  - [[stripBoilerplate]]'s removal set is broadcast: a segment must occur
 *    in > maxDocFrac of all documents to qualify, so the set has at most
 *    (avg segments per doc) / maxDocFrac entries — corpus-size-independent.
 */
object CorpusRewrite {

  /**
   * Exploded segment relation: (id, seg, segtext) where `seg` is the 0-based
   * segment ordinal and `segtext` the space-joined run of k words.
   * One generator projection + one (id, seg)-keyed hash agg; the
   * `collect_list` groups are bounded by k. `array_sort` on (pos, word)
   * structs restores word order without a sort exchange.
   */
  private[ext] def segments(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"segment size k must be positive, got $k")
    df.select(col(idCol).as("__cr_id"), posexplode(Dedup.tokens(col(textCol))))
      .withColumnRenamed("col", "word")
      .withColumn("seg", floor(col("pos") / k).cast("long"))
      .groupBy(col("__cr_id"), col("seg"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("word")))), s => s("word")),
        " ").as("segtext"))
  }

  /** Reassemble (id, seg, segtext) → (id, text), original segment order. */
  private def reassemble(segs: DataFrame, idCol: String): DataFrame =
    segs.groupBy(col("__cr_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("seg"), col("segtext")))), s => s("segtext")),
        " ").as("text"))
      .select(col("__cr_id").as(idCol), col("text"))

  /**
   * Corpus-level exact segment dedup: every distinct k-word segment keeps
   * only its FIRST occurrence (ordered by (id, seg)); all later occurrences
   * anywhere in the corpus are removed, and documents are reassembled from
   * their surviving segments.
   *
   * Plan: segment → `groupBy(segtext).agg(min(struct(id, seg)))` → doc
   * reassembly. Two hash shuffles (segtext, then id), both map-side
   * combined; no windows, no joins, no skew funnel.
   */
  def dedupSegmentsCorpus(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val firsts = segments(df, idCol, textCol, k)
      .groupBy(col("segtext"))
      .agg(min(struct(col("__cr_id"), col("seg"))).as("__first"))
      .select(col("__first.__cr_id").as("__cr_id"), col("__first.seg").as("seg"), col("segtext"))
    reassemble(firsts, idCol)
  }

  /**
   * Within-document segment dedup: inside each document, repeated k-word
   * segments keep only their first (lowest-position) occurrence. Other
   * documents are irrelevant — a segment may survive in many documents.
   *
   * Plan: one (id, segtext)-keyed `min(seg)` agg, then reassembly — both
   * doc-bounded groups.
   */
  def dedupSegmentsWithinDoc(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val firsts = segments(df, idCol, textCol, k)
      .groupBy(col("__cr_id"), col("segtext"))
      .agg(min(col("seg")).as("seg"))
    reassemble(firsts, idCol)
  }

  /**
   * Boilerplate stripping: a segment occurring in MORE than
   * `maxDocFrac` of all documents is removed from every document.
   *
   * Plan: segment → per-segment `countDistinct(id)` (hash agg) → filter by
   * the threshold (the document total rides a broadcast one-row agg, not a
   * driver action) → broadcast LEFT ANTI join back onto the segment
   * relation → reassembly. The broadcast is safe by construction: the
   * removal set is bounded by (avg segments/doc)/maxDocFrac regardless of
   * corpus size (see class doc).
   */
  def stripBoilerplate(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, maxDocFrac: Double): DataFrame = {
    require(maxDocFrac > 0.0 && maxDocFrac < 1.0,
      s"maxDocFrac must be in (0,1), got $maxDocFrac")
    val segs = segments(df, idCol, textCol, k)
    val totals = df.select(col(idCol)).agg(count(lit(1)).as("__n_docs"))
    val boiler = segs.groupBy(col("segtext"))
      .agg(count_distinct(col("__cr_id")).as("__df"))
      .join(broadcast(totals))
      .filter(col("__df") > col("__n_docs") * maxDocFrac)
      .select(col("segtext"))
    reassemble(segs.join(broadcast(boiler), Seq("segtext"), "left_anti"), idCol)
  }

  /**
   * Exact duplicated-SPAN removal (the rewrite counterpart of
   * [[CorpusFilters]]' q68 dup-span detection; Lee et al. 2022,
   * arXiv:2107.06499 "Deduplicating Training Data Makes Language Models
   * Better" §ExactSubstr): every word position covered by an n-gram that
   * occurs MORE THAN ONCE anywhere in the corpus (including twice in the
   * same document) is excised, and documents are reassembled from the
   * surviving words. Overlapping duplicated grams merge naturally — a
   * position is kept iff NO duplicated gram covers it.
   *
   * Unlike the segment ops above, spans here are position-free exact
   * substrings, so "keep one copy" is ill-defined on overlaps; the
   * contract is REMOVE EVERY OCCURRENCE (use [[dedupSegmentsCorpus]] for
   * keep-first semantics). Documents shorter than n words pass through
   * untouched (they cannot contain an n-word span).
   *
   * Plan, all per-doc windows bounded by document length:
   *  1. gram construction: one per-doc window of n-1 `lead`s (a single
   *     sort per doc partition, no self-join);
   *  2. duplicate detection: gram-keyed count agg (map-side combined);
   *  3. coverage: LEFT join of gram starts against the duplicate set
   *     (equi-join on the gram key; a corpus-hot gram skews its probe
   *     partition — AQE skew-join splits it), then a bounded
   *     `rowsBetween(-(n-1), 0)` frame max turns start flags into
   *     position coverage with no further shuffle.
   */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n > 1, s"span gram size n must be > 1, got $n")
    val w = Window.partitionBy(col("__cr_id")).orderBy(col("pos"))
    val toks = df.select(col(idCol).as("__cr_id"), posexplode(Dedup.tokens(col(textCol))))
      .withColumnRenamed("col", "word")
    val leads = (1 until n).map(i => lead(col("word"), i).over(w))
    // __gram is null on tail positions (no full n-gram starts there)
    val g = toks.withColumn("__gram",
      when(lead(col("word"), n - 1).over(w).isNotNull,
        concat_ws(" ", col("word") +: leads: _*)))
    val dupStarts = g.filter(col("__gram").isNotNull)
      .groupBy(col("__gram")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .select(col("__gram"), lit(1).as("__dup"))
    val covW = Window.partitionBy(col("__cr_id")).orderBy(col("pos"))
      .rowsBetween(-(n - 1), 0)
    g.join(dupStarts, Seq("__gram"), "left")
      .withColumn("__cov", max(col("__dup")).over(covW))
      .filter(col("__cov").isNull)
      .groupBy(col("__cr_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("word")))), s => s("word")),
        " ").as("text"))
      .select(col("__cr_id").as(idCol), col("text"))
  }
}
