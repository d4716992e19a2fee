package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextExpressionFunctions

/**
 * Corpus-curation operators for LLM training-data pipelines (extension
 * surface; the reference has no text operators at all —
 * /root/reference/src/bin/join.rs:66-70 stringifies keys and nothing else):
 * repetition statistics (Gopher-style filters), PII scanning/redaction,
 * benchmark decontamination, corpus-wide n-gram counts, and token-budget
 * subset selection.
 *
 * Design rules shared with the rest of graft:
 *  - no UDFs and no interpreted per-row loops in hot paths: everything is
 *    split / explode / window / hash-agg over codegen'd expressions (the
 *    n-gram fan-out is a generator, not a higher-order function);
 *  - per-document statistics distribute via explode + partial (map-side)
 *    aggregation — a document's words stream through combiners, never a
 *    whole group in memory;
 *  - cross-corpus joins ride small derived keys (the distinct hashed
 *    n-grams of a bounded eval set, broadcast) — the corpus never
 *    self-joins and full text never rides a shuffle.
 */
object CorpusFilters {

  /**
   * Exploded (doc, pos, word, bigram) relation shared by the repetition and
   * n-gram operators: one codegen generator projection for the words, then a
   * per-document `lead` window for the adjacent-word bigram. The only
   * shuffle is the per-doc window partition (documents are bounded-size, so
   * partitions stay balanced at any corpus size).
   */
  private def explodedGrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("__cf_id")).orderBy(col("pos"))
    df.select(col(idCol).as("__cf_id"), posexplode(Dedup.tokens(col(textCol))))
      .withColumnRenamed("col", "word")
      .withColumn("__next", lead(col("word"), 1).over(w))
      .withColumn("gram2",
        when(col("__next").isNotNull, concat_ws(" ", col("word"), col("__next"))))
      .drop("__next")
  }

  /**
   * Per-document repetition statistics (the Gopher repetition filters, Rae
   * et al. 2021, arXiv:2112.11446 §A1.1, re-expressed as distributed aggs):
   * word count, distinct-word fraction, most-frequent-word fraction, and
   * most-frequent-bigram fraction. High top-gram / low distinct fractions
   * flag boilerplate and degenerate repetition.
   *
   * Two hash-aggregations keyed by (doc, gram) — both map-side combined —
   * then a per-doc rollup; no per-doc collection, no interpreted loops.
   * The exploded gram relation is deliberately NOT persisted across the
   * two branches: per-word rows are wider than the columnar text they came
   * from, so re-scanning the corpus (and letting Catalyst prune the unused
   * bigram window from the word branch) is cheaper than materializing the
   * explosion.
   * Documents with no tokens are dropped (same contract as the shingle
   * operators); documents with a single word have no bigrams and report
   * `top_bigram_frac = 0.0`.
   */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val g = explodedGrams(df, idCol, textCol)
    val words = g.groupBy(col("__cf_id"), col("word")).agg(count(lit(1)).as("__wc"))
      .groupBy(col("__cf_id"))
      .agg(sum(col("__wc")).as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max(col("__wc")).as("top_word_cnt"))
    val bigrams = g.filter(col("gram2").isNotNull)
      .groupBy(col("__cf_id"), col("gram2")).agg(count(lit(1)).as("__bc"))
      .groupBy(col("__cf_id"))
      .agg(sum(col("__bc")).as("n_bigrams"), max(col("__bc")).as("top_bigram_cnt"))
    words.join(bigrams, Seq("__cf_id"), "left")
      .select(col("__cf_id").as(idCol),
        col("n_words"), col("n_distinct_words"),
        (col("n_distinct_words").cast("double") / col("n_words").cast("double"))
          .as("distinct_word_frac"),
        (col("top_word_cnt").cast("double") / col("n_words").cast("double"))
          .as("top_word_frac"),
        coalesce(col("top_bigram_cnt").cast("double") / col("n_bigrams").cast("double"),
          lit(0.0)).as("top_bigram_frac"))
  }

  /** PII regexes: deliberately RE2-compatible (no lookaround, no backrefs)
    * so the same pattern text runs on Spark (java.util.regex) and any
    * RE2-family engine a downstream validator might use. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /**
   * PII scan + redaction: per-document counts of email / IPv4 / phone-shaped
   * substrings and the text with each replaced by a typed placeholder.
   * Pure codegen'd regexp projection — scan-fused, embarrassingly parallel,
   * no shuffle. Redaction order (email, then IP, then phone) is part of the
   * contract: a phone-shaped substring inside an already-redacted email
   * can't double-fire.
   */
  def piiScan(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    def cnt(p: String) = size(regexp_extract_all(t, lit(p), lit(0))).cast("long")
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, emailPattern, "<EMAIL>"),
          ipv4Pattern, "<IP>"),
        phonePattern, "<PHONE>")
    df.withColumn("email_cnt", cnt(emailPattern))
      .withColumn("ipv4_cnt", cnt(ipv4Pattern))
      .withColumn("phone_cnt", cnt(phonePattern))
      .withColumn("pii_total", col("email_cnt") + col("ipv4_cnt") + col("phone_cnt"))
      .withColumn("redacted", redacted)
  }

  /**
   * Benchmark decontamination (the n-gram-overlap check every training
   * pipeline runs before a data release; e.g. Brown et al. 2020,
   * arXiv:2005.14165 §C): for each training document, the number of distinct
   * word `n`-grams it shares with ANY document of the eval/benchmark set,
   * and a `contaminated` flag.
   *
   * Scale shape: the eval side (bounded — benchmarks are small) collapses to
   * its DISTINCT hashed n-grams and is broadcast; the training corpus
   * streams through one generator + broadcast-hash-join + per-doc count.
   * Grams ride as 8-byte xxhash64 longs from the codegen kernel
   * ([[TextExpressionFunctions.shingle_hashes]]), never as strings — same
   * 2^-64-collision caveat as the exact-jaccard operator. The training
   * corpus never shuffles its text and never self-joins.
   *
   * Output: one row per training document (docs with no tokens excluded,
   * same contract as the shingle operators), `n_shared_grams >= 0`,
   * `contaminated = n_shared_grams > 0`.
   */
  def decontaminate(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    // one shared column expression — it binds to `textCol` of whichever
    // frame selects it
    val gramExpr =
      TextExpressionFunctions.shingle_hashes(Dedup.tokens(col(textCol)), n, 0L)
    val evalGrams = eval
      .select(explode(gramExpr).as("__gram")).distinct()
    val trainGrams = train
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), explode(gramExpr).as("__gram"))
    val hits = trainGrams.join(broadcast(evalGrams), Seq("__gram"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared_grams"))
    train.filter(length(trim(col(textCol))) > 0).select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
      .withColumn("contaminated", col("n_shared_grams") > 0)
  }

  /**
   * Curriculum ordering — the data-ordering step of curriculum training:
   * rank documents easiest-first by a difficulty proxy (whitespace token
   * count — longer documents are harder context), bucket into `bins`
   * equal-depth difficulty tiers (NTILE semantics), and emit a deterministic
   * global curriculum rank (difficulty, then id — fully tie-broken, so the
   * order is reproducible on any engine). The total order is DISTRIBUTED —
   * [[graft.operators.GlobalRank]]'s range-partitioned sort + zipWithIndex,
   * never a single-partition global window — so the plan survives a corpus
   * that doesn't fit one task.
   */
  def curriculumOrder(
      df: DataFrame, idCol: String, textCol: String, bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val scored = df.select(col(idCol),
      size(Dedup.tokens(col(textCol))).cast("long").as("difficulty"))
    graft.operators.GlobalRank
      .withNtile(scored, Seq(col("difficulty").asc, col(idCol).asc), bins,
        binName = "difficulty_bin", rankName = "curriculum_rank")
      .select(col(idCol), col("difficulty"), col("difficulty_bin"),
        col("curriculum_rank"))
  }

  /**
   * BPE merge discovery — the distributed core of byte-pair-encoding
   * tokenizer training (Sennrich et al. 2016, arXiv:1508.07909): starting
   * from characters, repeatedly find the corpus-wide most frequent adjacent
   * symbol pair (ties broken lexicographically → fully deterministic) and
   * merge it everywhere. Returns the merge table (rank, left, right,
   * frequency at merge time) — the artifact a tokenizer ships.
   *
   * Distribution shape: the corpus lives as a DataFrame of symbol arrays;
   * each round is ONE map-side-combined pair-count aggregation plus a
   * TakeOrdered(1) (no full-dictionary sort), then a codegen'd
   * `transform`-free merge pass (an aggregate-fold over each row's symbol
   * array). k merges = k passes — exactly how distributed BPE trainers
   * work. The iteration count is bounded and driver state is one
   * (pair, count) row per round.
   *
   * Training-corpus cap — the same `trainFraction`/`maxTrainRows`
   * discipline as the IVF/SemDeDup quantizers, IN the API so a library
   * caller can't accidentally run k full-corpus passes: auto mode
   * (`trainFraction < 0`) sizes the sample so at most `maxTrainRows`
   * documents train (the corpus `count()` is metadata-only on parquet);
   * the sample itself is a CONTENT-HASH Bernoulli cut
   * (`xxhash64(text) mod 2^20 < frac·2^20`, ~1e-6 fraction granularity) —
   * deterministic, seedless, independent of file layout, so the merge
   * table is reproducible run-to-run. Pass `trainFraction = 1.0` to train
   * on everything.
   *
   * Word-internal BPE: text lowercases and splits on whitespace; pairs
   * never cross word boundaries (each word is an independent symbol
   * sequence, the standard formulation).
   */
  def bpeMerges(
      df: DataFrame, textCol: String, numMerges: Int,
      trainFraction: Double = -1.0,
      maxTrainRows: Long = 2000000L): Seq[(Int, String, String, Long)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(trainFraction <= 1.0, s"trainFraction must be <= 1, got $trainFraction")
    val spark = df.sparkSession
    val frac =
      if (trainFraction >= 0.0) trainFraction
      else {
        require(maxTrainRows > 0, s"maxTrainRows must be positive, got $maxTrainRows")
        val n = df.count()
        if (n <= maxTrainRows) 1.0 else maxTrainRows.toDouble / n
      }
    val trainSrc =
      if (frac < 1.0)
        df.filter(pmod(xxhash64(col(textCol)), lit(1L << 20)) < (frac * (1L << 20)).toLong)
      else df
    // one row per DISTINCT word with its occurrence count (the standard
    // Sennrich formulation trains on the frequency-weighted vocabulary):
    // every occurrence of a word contributes the same pairs and merges
    // identically, so counting words once and weighting by frequency
    // yields the IDENTICAL merge table while each round's agg and
    // fold-merge run over vocabulary-sized input (≪ occurrence count —
    // the corpus can grow 100x while the vocabulary barely moves)
    var words = trainSrc
      .select(explode(Dedup.tokens(col(textCol))).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__freq"))
      // split keeps a trailing empty match (limit -1): drop empties
      .select(filter(split(col("__w"), "(?!^)"), s => length(s) > 0).as("__syms"),
        col("__freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    // the previous round's persisted vocabulary; unpersisted only after an
    // action has materialized its CHILD (the top-1 collect of the next
    // round does that for free — no per-round count() action, r11)
    var prev: DataFrame = null
    try {
      var round = 0
      var exhausted = false
      while (round < numMerges && !exhausted) {
        // single-symbol words have no pairs (sequence(0, -1) would DESCEND)
        val pairIdx = when(size(col("__syms")) >= 2,
          sequence(lit(0), size(col("__syms")) - 2))
          .otherwise(array().cast("array<int>"))
        val top = words
          .select(explode(transform(pairIdx,
            i => struct(
              element_at(col("__syms"), i + 1).as("l"),
              element_at(col("__syms"), i + 2).as("r")))).as("__p"),
            col("__freq"))
          .groupBy(col("__p.l"), col("__p.r")).agg(sum(col("__freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        // the aggregate above scanned every partition of `words`, so its
        // cache is fully materialized — the previous round's blocks can go
        if (prev != null) { prev.unpersist(); prev = null }
        if (top.isEmpty) exhausted = true
        else {
          val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((round + 1, l, r, cnt))
          // merge every non-overlapping (l, r) occurrence left-to-right:
          // fold the symbol array, joining when the accumulator's tail is l
          // and the next symbol is r. `get` (0-based, null-safe) instead of
          // element_at: ANSI mode would throw on the empty accumulator
          val merged = aggregate(
            col("__syms"),
            array().cast("array<string>"),
            (acc, s) => when(
              get(acc, size(acc) - 1) === lit(l) && s === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(concat(lit(l), lit(r))))
            ).otherwise(concat(acc, array(s))))
          val next = words.select(merged.as("__syms"), col("__freq"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          // no count() here: the NEXT round's top-1 aggregate materializes
          // `next` (halving the actions per round); `words` stays persisted
          // until that happens
          prev = words
          words = next
          round += 1
        }
      }
    } finally {
      if (prev != null) prev.unpersist()
      words.unpersist()
    }
    merges.toSeq
  }

  /**
   * Apply a learned merge table to the corpus — the OTHER half of the
   * tokenizer ([[bpeMerges]] trains it): each word splits to single-char
   * symbols, then the lowest-RANK merge present in the word is applied to
   * all its non-overlapping occurrences left-to-right, repeatedly, until
   * no mergeable pair remains (the canonical BPE apply; matches what the
   * greedy trainer would have produced on the training corpus).
   *
   * Scale shape: the merge table is driver-small (k rows) and broadcasts;
   * encoding is ONE distributed `mapPartitions` pass with plain JVM loops
   * per word (per-element imperative symbol merging — the documented
   * mapPartitions case); nothing shuffles. Output: one row per input row
   * with the token array and its length. Tokens concatenate back to the
   * lowercased whitespace-joined words by construction (merges only fuse
   * adjacent symbols), which the gate pins as a roundtrip contract.
   */
  def bpeEncode(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toIndexedSeq)
    df.select(col(idCol).cast("long").as("__id"),
        coalesce(Dedup.tokens(col(textCol)), array().cast("array<string>")).as("__toks"))
      .as[(Option[Long], Seq[String])]
      .mapPartitions { it =>
        val ms = bc.value
        // FIRST occurrence wins for duplicated pairs (lowest-rank priority;
        // zipWithIndex.toMap would silently keep the last)
        val ranks = {
          val m = scala.collection.mutable.HashMap.empty[(String, String), Int]
          ms.zipWithIndex.foreach { case (p, i) => if (!m.contains(p)) m(p) = i }
          m
        }
        def encodeWord(w: String): Seq[String] = {
          // split by CODE POINTS, matching the trainer's `(?!^)` regex split
          // (and Spark length()'s char counting) — UTF-16 code-unit
          // splitting would halve non-BMP characters into surrogate symbols
          // the trainer never saw
          var syms = {
            val b = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < w.length) {
              val cp = w.codePointAt(i)
              b += new String(Character.toChars(cp))
              i += Character.charCount(cp)
            }
            b
          }
          var done = syms.length < 2 || ranks.isEmpty
          while (!done) {
            // lowest-rank pair present in the word
            var best = Int.MaxValue
            var i = 0
            while (i < syms.length - 1) {
              val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
              if (r < best) best = r
              i += 1
            }
            if (best == Int.MaxValue) done = true
            else {
              val (l, r) = ms(best)
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
                  out += (l + r); j += 2 // non-overlapping, left-to-right
                } else { out += syms(j); j += 1 }
              }
              syms = out
            }
          }
          syms.toSeq
        }
        it.map { case (id, toks) =>
          val encoded = toks.filter(_.nonEmpty).flatMap(encodeWord)
          (id, encoded, encoded.length.toLong)
        }
      }.toDF("__id", "bpe_tokens", "n_bpe_tokens")
      .withColumnRenamed("__id", idCol)
  }

  /** [[bpeMerges]] as a DataFrame (rank, left, right, freq) for the gate. */
  def bpeMergeTable(
      df: DataFrame, textCol: String, numMerges: Int,
      trainFraction: Double = -1.0, maxTrainRows: Long = 2000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    bpeMerges(df, textCol, numMerges, trainFraction, maxTrainRows)
      .toDF("rank", "left", "right", "freq")
      .select(col("rank").cast("long"), col("left"), col("right"), col("freq"))
  }

  /**
   * Corpus vocabulary coverage — the token-frequency export tokenizer
   * training starts from: the top-`k` tokens by corpus count with rank and
   * CUMULATIVE coverage fraction ("the top 1000 tokens cover X% of all
   * token occurrences"). One map-side-combined count agg over the exploded
   * tokens, a TakeOrdered top-k cut, then rank/cumsum windows over just
   * those k rows (never the full vocabulary). The running sum stays in
   * INTEGERS (cum count, divided once at the end) so the coverage column is
   * bit-identical on any engine, free of float-accumulation order.
   */
  def vocabCoverage(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val counts = df.select(explode(Dedup.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("__tot"))
    val ord = Window.orderBy(col("cnt").desc, col("token").asc)
    counts.orderBy(col("cnt").desc, col("token").asc).limit(k)
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("__cum", sum(col("cnt")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(tot))
      .select(col("token"), col("cnt"), col("rank"),
        (col("__cum").cast("double") / col("__tot").cast("double")).as("cum_coverage"))
  }

  /**
   * Bloom-filter decontamination — [[decontaminate]]'s 100 TB sibling for
   * when the eval/blocklist side outgrows a broadcastable distinct-gram
   * set: the blocklist collapses into a ~1.2 byte/key (at fpp=0.01) Bloom
   * filter in ONE pass with NO shuffle (the filter aggregate is map-side
   * mergeable by bitwise OR), is read once driver-side (the q106 two-pass
   * sketch pattern) and ships inside the plan; the training corpus then
   * streams through a codegen'd per-gram membership probe — no join at all.
   *
   * Guarantee direction is the safe one for decontamination: NO false
   * negatives (every truly shared gram is flagged), false positives at
   * `fpp` per probed gram — a flagged count can only OVER-estimate, so a
   * `maybe_contaminated = false` is definitive. Output mirrors
   * [[decontaminate]]: one row per train doc with `n_flagged_grams` (>= the
   * exact shared count) and `maybe_contaminated`.
   *
   * Past the single-filter ceiling (~1.8e9 keys at fpp=0.01 — a 100 TB
   * blocklist) the build transparently SHARDS: keys hash-route across n
   * independently-sized filters built in one grouped aggregation, and each
   * train gram probes only its own shard
   * ([[org.apache.spark.sql.graft.BloomFunctions.buildShardedFilters]]).
   * Below the ceiling the build and plan are byte-identical to the plain
   * single-filter path. `maxBitsPerShard` exists for tests and memory
   * tuning; the default is the JVM array ceiling.
   */
  def bloomDecontaminate(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 5, fpp: Double = 0.01,
      maxBitsPerShard: Long =
        org.apache.spark.sql.graft.BloomBuffer.MaxBits): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    import org.apache.spark.sql.graft.BloomFunctions
    val gramExpr =
      TextExpressionFunctions.shingle_hashes(Dedup.tokens(col(textCol)), n, 0L)
    val evalGrams = eval.select(explode(gramExpr).as("__gram"))
    // sizing pass: Bloom shape needs the key count up front. Both passes
    // are shuffle-free scans of the (small-side) eval set; duplicates only
    // waste a few bits, so no distinct anywhere.
    val expected = math.max(1L, evalGrams.count())
    val filters = BloomFunctions.buildShardedFilters(
      evalGrams, col("__gram"), expected, fpp, maxBitsPerShard)
    val flagged = filter(gramExpr,
      g => BloomFunctions.bloom_might_contain_sharded(filters, g))
    train.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        size(flagged).cast("long").as("n_flagged_grams"))
      .withColumn("maybe_contaminated", col("n_flagged_grams") > 0)
  }

  /**
   * Corpus-wide most-frequent adjacent-word bigrams, deterministically
   * ranked (count desc, gram asc). The global count is a two-level hash agg
   * (map-side combine) and the top-k cut is `orderBy(...).limit(k)` —
   * Spark's TakeOrderedAndProject, a per-partition top-k merged on the
   * driver over k rows only. The rank window then runs over just those k
   * rows; the full gram dictionary never funnels through one partition.
   */
  def topBigrams(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val counts = explodedGrams(df, idCol, textCol)
      .filter(col("gram2").isNotNull)
      .groupBy(col("gram2")).agg(count(lit(1)).as("cnt"))
    counts.orderBy(col("cnt").desc, col("gram2").asc).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("gram2").asc)).cast("long"))
      .select(col("rank"), col("gram2").as("gram"), col("cnt"))
  }

  /**
   * Deterministic token-budget subset selection: per source, admit documents
   * in md5(doc-id) order until the running whitespace-token total reaches
   * `budgetFrac` of that source's tokens. The hash order is an unbiased,
   * seedless, reproducible shuffle — the standard "take the first B tokens
   * of a hashed order" mixture-building step.
   *
   * Shape: one agg for per-source totals (broadcast back — sources are few),
   * one running-sum window per source. The per-source window is the
   * exact-prefix price; for corpora where single sources are petabyte-scale,
   * use [[tokenBudgetByRate]] — a fully parallel two-pass variant that hits
   * the budget in expectation with no global order.
   */
  def tokenBudget(
      df: DataFrame, idCol: String, textCol: String, sourceCol: String,
      budgetFrac: Double): DataFrame = {
    require(budgetFrac >= 0.0 && budgetFrac <= 1.0,
      s"budgetFrac must be in [0,1], got $budgetFrac")
    val tok = df.select(col(idCol), col(sourceCol),
      size(Dedup.tokens(col(textCol))).cast("long").as("ws_tokens"),
      md5(col(idCol).cast("string").cast("binary")).as("__ord"))
    val totals = tok.groupBy(col(sourceCol))
      .agg(sum(col("ws_tokens")).as("__total"))
      .withColumn("__budget",
        floor(col("__total").cast("double") * budgetFrac).cast("long"))
    val w = Window.partitionBy(col(sourceCol)).orderBy(col("__ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tok.join(broadcast(totals), Seq(sourceCol))
      .withColumn("cum_tokens", sum(col("ws_tokens")).over(w))
      .filter(col("cum_tokens") <= col("__budget"))
      .select(col(idCol), col(sourceCol), col("ws_tokens"), col("cum_tokens"))
  }

  /**
   * Per-source mixture report: document/token counts and each source's
   * fraction of the corpus — the summary every mixture-weighting decision
   * starts from. One map-side-combined aggregation plus a broadcast of the
   * single-row grand total.
   */
  def mixtureReport(
      df: DataFrame, textCol: String, sourceCol: String): DataFrame = {
    val tok = df.select(col(sourceCol),
      size(Dedup.tokens(col(textCol))).cast("long").as("__t"))
    val per = tok.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("n_tokens"))
    val tot = per.agg(sum(col("n_docs")).as("__td"), sum(col("n_tokens")).as("__tt"))
    per.join(broadcast(tot))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        (col("n_docs").cast("double") / col("__td").cast("double")).as("doc_frac"),
        (col("n_tokens").cast("double") / col("__tt").cast("double")).as("token_frac"))
  }

  /**
   * Temperature-based mixture reweighting (the multilingual/multi-source
   * rebalancing rule: sampling weight ∝ share^tau, tau < 1 upweights small
   * sources): per source, the natural token share, the tau-tempered
   * weight, the token quota under `budgetTokens`, and the per-source
   * sampling rate (capped at 1 — a source cannot contribute more tokens
   * than it has). Pure aggregate math over one combined agg + a broadcast
   * one-row normalizer.
   *
   * tau = 0.5 computes through `sqrt` (IEEE-exact on every engine); other
   * taus go through `pow`, whose last-ulp behavior is libm-specific —
   * fine for pipelines, not for bit-exact cross-engine comparison.
   */
  def temperatureMixture(
      df: DataFrame, textCol: String, sourceCol: String,
      tau: Double, budgetTokens: Long): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    require(budgetTokens >= 0, s"budgetTokens must be non-negative, got $budgetTokens")
    val per = df.select(col(sourceCol),
        size(Dedup.tokens(col(textCol))).cast("long").as("__t"))
      .groupBy(col(sourceCol)).agg(sum(col("__t")).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("__tt"))
    def temper(c: Column): Column =
      if (tau == 0.5) sqrt(c) else pow(c, lit(tau))
    // tempered weights ride in FIXED POINT (floor(w·2^40) longs): the
    // normalizer is then an integer sum — order-independent, so the result
    // is bit-identical under any partitioning and on any engine that sums
    // the same integers (the q92 centroid pattern)
    val shared = per.join(broadcast(tot))
      .withColumn("share", col("n_tokens").cast("double") / col("__tt").cast("double"))
      .withColumn("__wfx", floor(temper(col("share")) * 1099511627776.0).cast("long"))
    val norm = shared.agg(sum(col("__wfx")).as("__wsum"))
    shared.join(broadcast(norm))
      .withColumn("weight", col("__wfx").cast("double") / col("__wsum").cast("double"))
      .withColumn("quota_tokens", floor(col("weight") * budgetTokens).cast("long"))
      .withColumn("sampling_rate",
        least(lit(1.0), col("quota_tokens").cast("double") / col("n_tokens").cast("double")))
      .select(col(sourceCol), col("n_tokens"), col("share"), col("weight"),
        col("quota_tokens"), col("sampling_rate"))
  }

  /**
   * Deterministic, engine-portable train/val/test assignment ("hash
   * split"): a document's bucket is the first 4 hex chars of
   * md5(id rendered as a string) — a uniform draw over 16^4 buckets — and
   * split k owns the lexicographic bucket range [t_{k-1}, t_k) where
   * t_k = floor(cumFrac_k · 16^4), zero-padded to 4 lowercase hex digits.
   * Properties a real pipeline needs and `rand()` splits lack:
   * reproducible on any engine with md5 (the q58 DuckDB oracle recomputes
   * it bit-for-bit), stable under corpus growth (a doc's split is a pure
   * function of its own id — appending data never reshuffles old
   * assignments), and free at scale (per-row codegen projection; no RNG
   * state, no shuffle, no ordering).
   */
  def hashSplit(
      df: DataFrame, idCol: String, splits: Seq[(String, Double)],
      outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.forall(_._2 >= 0.0),
      s"split fractions must be non-negative, got $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val space = 1 << 16
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val thresholds = cum.init.map(f => f"${math.floor(f * space).toLong}%04x")
    val bucket = substring(md5(col(idCol).cast("string").cast("binary")), 1, 4)
    val assigned = splits.init.zip(thresholds).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), th)) =>
        val cond = bucket < lit(th)
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
    }.fold(lit(splits.last._1))(_.otherwise(splits.last._1))
    df.withColumn("split_bucket", bucket).withColumn(outCol, assigned)
  }

  /**
   * Sequence packing: lay each group's documents head-to-tail in id order
   * and assign every document to the fixed-size token window ("context
   * window") that contains its first token — pack = floor(prefixTokens /
   * windowTokens). Returns one row per (group, pack) with doc/token counts
   * and the id range the pack covers. The prefix sum is per GROUP (shard /
   * source), not global: one hash shuffle on the group key plus one
   * window, so the corpus packs shard-by-shard in parallel.
   *
   * `subShards` is the skew valve for the 100 TB case where ONE group is
   * most of the corpus (a web crawl "source"): documents sub-shard by
   * hash(id) % subShards and the prefix sum runs per (group, sub-shard),
   * bounding any single window task to 1/subShards of the group. Packing
   * semantics only require SOME deterministic partition of each group into
   * windows, not one global order, so sub-sharded packs are equally valid
   * training windows. pack_id = subShard·2^40 + windowIndex stays unique
   * and deterministic; the default subShards=1 reduces to the exact
   * id-ordered layout (what the q59 SQL oracle checks).
   */
  def packSequences(
      df: DataFrame, idCol: String, textCol: String, groupCol: String,
      windowTokens: Long, subShards: Int = 1): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive, got $windowTokens")
    require(subShards >= 1, s"subShards must be >= 1, got $subShards")
    val shard =
      if (subShards == 1) lit(0L)
      else pmod(xxhash64(col(idCol)), lit(subShards.toLong))
    val w = Window.partitionBy(col(groupCol), col("__shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(groupCol),
        size(Dedup.tokens(col(textCol))).cast("long").as("ws_tokens"))
      .withColumn("__shard", shard)
      .withColumn("__off", coalesce(sum(col("ws_tokens")).over(w), lit(0L)))
      .withColumn("pack_id",
        col("__shard") * lit(1099511627776L) +
          floor(col("__off").cast("double") / windowTokens.toDouble).cast("long"))
      .groupBy(col(groupCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ws_tokens")).as("pack_tokens"),
        min(col(idCol)).as("first_id"), max(col(idCol)).as("last_id"))
  }

  /**
   * TF-IDF keyword extraction: the top-`k` most characteristic terms per
   * document, scored `tf · (N − df + 0.5)/(df + 0.5)` — the BM25 idf kernel
   * (Robertson/Spärck Jones probabilistic idf), chosen over `ln(N/df)`
   * deliberately: it is a RATIONAL function of integer counts, so the score
   * is one IEEE division and one multiplication on any engine — bit-exact
   * cross-engine, where `ln` is libm-specific in the last ulp. Ranking ties
   * break on the term string, so the top-k set is fully deterministic.
   *
   * Shape at scale: term frequencies are one map-side-combined hash agg
   * keyed (doc, term); document frequencies aggregate THAT relation keyed
   * by term (vocabulary-sized — Heaps' law keeps it sublinear in the
   * corpus); the single-row corpus count broadcasts. The only per-doc
   * window runs over each document's DISTINCT terms — bounded by document
   * size, never by corpus size.
   */
  def tfidfKeywords(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val docs = df.filter(length(trim(col(textCol))) > 0)
    val tf = docs
      .select(col(idCol).as("__cf_id"), explode(Dedup.tokens(col(textCol))).as("term"))
      .groupBy(col("__cf_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col("__cf_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, Seq("term")).join(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") *
          ((col("__n").cast("double") - col("df").cast("double") + 0.5) /
            (col("df").cast("double") + 0.5)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("__cf_id").as(idCol), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /**
   * Bigram novelty / corpus-support scoring — the integer-exact core of an
   * n-gram LM quality signal: for each document, how "familiar" its
   * adjacent-word bigrams are corpus-wide. Per document: bigram count, the
   * SUM of corpus-wide occurrence counts of its bigrams (exact integer —
   * order-independent, so bit-identical under any partitioning), the mean
   * support (one double division), and the fraction of its bigram
   * occurrences that are corpus-unique (`cnt == 1`: this occurrence is the
   * only one anywhere — high novel_frac flags either fresh content or
   * noise, the same decision axis a smoothed bigram-LM perplexity scores).
   * A true add-k log-perplexity is one `ln` away from these counts; it is
   * left out of the ORACLE-checked surface only because libm `ln` is not
   * bit-portable — [[bigramLogLik]] below computes it for pipeline use.
   *
   * Docs with fewer than 2 tokens have no bigrams and are dropped (same
   * contract as the shingle operators).
   */
  def bigramNovelty(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val big = explodedGrams(df, idCol, textCol).filter(col("gram2").isNotNull)
    val counts = big.groupBy(col("gram2")).agg(count(lit(1)).as("__cnt"))
    big.join(counts, Seq("gram2"))
      .groupBy(col("__cf_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__cnt")).as("support_sum"),
        sum(when(col("__cnt") === 1, 1L).otherwise(0L)).as("novel_cnt"))
      .select(col("__cf_id").as(idCol), col("n_bigrams"), col("support_sum"),
        (col("support_sum").cast("double") / col("n_bigrams").cast("double"))
          .as("avg_support"),
        (col("novel_cnt").cast("double") / col("n_bigrams").cast("double"))
          .as("novel_frac"))
  }

  /**
   * Add-one-smoothed bigram LM average negative log-likelihood per document
   * (the KenLM-style quality score, self-trained on the corpus):
   * `-(1/B) Σ ln((c(w1,w2)+1)/(c(w1)+V))`. Same distributed shape as
   * [[bigramNovelty]] plus a unigram-count join; kept separate from the
   * oracle surface because `ln` is not bit-portable across engines — its
   * spec checks hand-computed values on a tiny corpus instead.
   */
  def bigramLogLik(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val g = explodedGrams(df, idCol, textCol)
    val big = g.filter(col("gram2").isNotNull)
    val bigramCounts = big.groupBy(col("gram2")).agg(count(lit(1)).as("__cb"))
    val unigramCounts = g.groupBy(col("word")).agg(count(lit(1)).as("__cu"))
    val vocab = unigramCounts.agg(count(lit(1)).as("__v"))
    big.join(bigramCounts, Seq("gram2"))
      .join(unigramCounts, Seq("word"))
      .join(broadcast(vocab))
      .withColumn("__nll",
        -log((col("__cb").cast("double") + 1.0) /
          (col("__cu").cast("double") + col("__v").cast("double"))))
      .groupBy(col("__cf_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__nll")).as("__s"))
      .select(col("__cf_id").as(idCol), col("n_bigrams"),
        (col("__s") / col("n_bigrams").cast("double")).as("avg_neg_log_lik"))
  }

  /**
   * CCNet-style cross-corpus perplexity scoring (Wenzek et al., "CCNet:
   * Extracting High Quality Monolingual Datasets from Web Crawl Data",
   * LREC 2020): train an add-one-smoothed bigram LM on a REFERENCE corpus
   * (the trusted/high-quality side), score a TARGET corpus against it —
   * the standard "does this crawl document read like the reference
   * domain?" quality filter, where [[bigramLogLik]] self-scores one
   * corpus. Unseen target bigrams/unigrams fall back to the smoothing
   * floor (count 0), so out-of-domain text scores high perplexity instead
   * of erroring. Output per target doc: n_bigrams, avg_nll, perplexity
   * (= exp(avg_nll); rank by it ascending and keep the head, or threshold
   * per the CCNet head/middle/tail split).
   *
   * Scale: LM counts are vocabulary-keyed aggs (map-side combined); the
   * scoring pass is two gram-keyed equi-joins — the reference corpus
   * never self-joins and document text never rides a shuffle (grams do).
   * Inherently non-oracle (libm `ln` is not bit-portable); the spec pins
   * separation on planted natural-vs-gibberish docs and a hand-computed
   * tiny corpus.
   */
  def perplexityScore(
      reference: DataFrame, target: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val refG = explodedGrams(reference, idCol, textCol)
    val refBig = refG.filter(col("gram2").isNotNull)
      .groupBy(col("gram2")).agg(count(lit(1)).as("__cb"))
    val refUni = refG.groupBy(col("word")).agg(count(lit(1)).as("__cu"))
    val vocab = refUni.agg(count(lit(1)).as("__v"))
    val tgtBig = explodedGrams(target, idCol, textCol)
      .filter(col("gram2").isNotNull)
    tgtBig
      .join(refBig, Seq("gram2"), "left")
      .join(refUni, Seq("word"), "left")
      .join(broadcast(vocab))
      .withColumn("__nll",
        -log((coalesce(col("__cb"), lit(0L)).cast("double") + 1.0) /
          (coalesce(col("__cu"), lit(0L)).cast("double") + col("__v").cast("double"))))
      .groupBy(col("__cf_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__nll")).as("__s"))
      .select(col("__cf_id").as(idCol), col("n_bigrams"),
        (col("__s") / col("n_bigrams").cast("double")).as("avg_nll"),
        exp(col("__s") / col("n_bigrams").cast("double")).as("perplexity"))
  }

  /**
   * GPT-pretraining context packing (concat-and-chunk): documents are laid
   * end-to-end in the total order of `idCol` and the token stream is cut
   * every `contextLen` tokens — the standard way pretraining corpora
   * become fixed-length training examples with zero padding (documents
   * span context boundaries). Each document maps to its placement:
   * `start_pack`/`start_offset` (where its first token lands) and
   * `end_pack` (where its last token lands), all pure integer functions
   * of the EXCLUSIVE prefix sum of token counts. Zero-token documents
   * carry no tokens and are dropped (same contract as the shingle ops).
   *
   * Scale: the prefix sum is [[graft.operators.GlobalRank.withPrefixSum]]
   * — range sort + per-partition local scans + a driver-side exclusive
   * scan of the numPartitions totals, broadcast back. Never a global
   * single-partition window; the oracle may use one at gate scale.
   */
  def contextPack(
      df: DataFrame, idCol: String, tokensCol: String, contextLen: Int): DataFrame = {
    require(contextLen >= 1, s"contextLen must be >= 1, got $contextLen")
    val nz = df.filter(col(tokensCol) > 0)
      .select(col(idCol), col(tokensCol).cast("long").as("n_tokens"))
    graft.operators.GlobalRank.withPrefixSum(
        nz, Seq(col(idCol)), col("n_tokens"),
        rankName = "__cp_rank", sumName = "__cp_cum")
      .select(col(idCol), col("n_tokens"),
        expr(s"(__cp_cum - n_tokens) div $contextLen").as("start_pack"),
        expr(s"(__cp_cum - n_tokens) % $contextLen").as("start_offset"),
        expr(s"(__cp_cum - 1) div $contextLen").as("end_pack"))
  }

  /**
   * DSIR importance weights (Xie et al., "Data Selection for Language
   * Models via Importance Resampling", NeurIPS 2023): score every raw
   * document by how much more likely its hashed n-gram bag is under a
   * TARGET-domain distribution than under the raw distribution —
   * `log w(d) = sum_b c_b(d) * (log p_target(b) - log p_raw(b))` over
   * `buckets` hashed unigram+bigram features with add-one smoothing.
   * Resample the raw corpus proportionally to `exp(log_weight)` (or just
   * keep the top fraction) to tilt it toward the target domain without a
   * trained classifier.
   *
   * Scale: both distributions are bucket-keyed aggs (map-side combined,
   * `buckets` rows each) that BROADCAST to the scoring join; features
   * ride as xxhash64 buckets, text never shuffles. Raw never self-joins.
   * Inherently non-oracle (libm `ln`); specs pin domain separation and a
   * hand-computed tiny corpus.
   */
  def dsirWeights(
      target: DataFrame, raw: DataFrame,
      idCol: String, textCol: String, buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    def bucketed(df: DataFrame): DataFrame = {
      val g = explodedGrams(df, idCol, textCol)
      g.select(col("__cf_id"), col("word").as("__f"))
        .unionAll(g.filter(col("gram2").isNotNull)
          .select(col("__cf_id"), col("gram2").as("__f")))
        .withColumn("__b", pmod(xxhash64(col("__f")), lit(buckets.toLong)))
        .drop("__f")
    }
    def dist(df: DataFrame, cName: String): DataFrame =
      bucketed(df).groupBy(col("__b")).agg(count(lit(1)).as(cName))
    val tgt = dist(target, "__ct")
    val rawD = dist(raw, "__cr")
    val totals = tgt.agg(sum(col("__ct")).as("__nt")).crossJoin(
      rawD.agg(sum(col("__cr")).as("__nr")))
    // log p_t(b) - log p_r(b) with add-one smoothing over the bucket space
    val ratio = tgt.join(rawD, Seq("__b"), "full_outer")
      .crossJoin(broadcast(totals))
      .select(col("__b"),
        (log((coalesce(col("__ct"), lit(0L)).cast("double") + 1.0) /
            (col("__nt").cast("double") + buckets)) -
          log((coalesce(col("__cr"), lit(0L)).cast("double") + 1.0) /
            (col("__nr").cast("double") + buckets))).as("__lr"))
    bucketed(raw)
      .join(broadcast(ratio), Seq("__b"))
      .groupBy(col("__cf_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("__lr")).as("log_weight"))
      .select(col("__cf_id").as(idCol), col("n_feats"), col("log_weight"))
  }

  /**
   * Cross-source contamination matrix: for every unordered pair of sources,
   * the number of distinct word `n`-gram shingles they share and the
   * Jaccard overlap of their shingle vocabularies — the corpus-level
   * companion to per-document [[decontaminate]] (is source A leaking into
   * source B?).
   *
   * Shape at scale: each source collapses to its DISTINCT grams (map-side
   * combined agg keyed (source, gram)). The naive next step — self-join the
   * gram dictionary on the gram key — fans out C(sources-containing-gram, 2)
   * rows PER GRAM, which for a shared-vocabulary corpus is ~(#sources
   * choose 2) × |vocabulary| intermediate rows. Instead each gram collapses
   * to its SOURCE SET (collect_set of an 8-byte source id — `xxhash64` of
   * the source name, no dense-index window, no extra join; #sources is small
   * by the same contract as [[mixtureReport]]), identical sets collapse to
   * one counted row, and the pair expansion runs once per DISTINCT SET —
   * thousands of rows, not per-gram. The per-source size table (#sources
   * rows) broadcasts to complete the matrix with zero-overlap pairs. Grams
   * ride as 8-byte xxhash64 longs from the codegen kernel
   * ([[TextExpressionFunctions.shingle_hashes]]) — text never rides a
   * shuffle; same 2^-64-collision caveat as the other set-similarity ops
   * (and the same for source-name hashes).
   */
  def sourceOverlap(
      df: DataFrame, sourceCol: String, textCol: String, n: Int = 3): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    val grams = df
      .select(col(sourceCol).as("__src"),
        explode(TextExpressionFunctions.shingle_hashes(
          Dedup.tokens(col(textCol)), n, 0L)).as("gram"))
      .distinct()
      .withColumn("__sid", xxhash64(col("__src")))
    val sizes = grams.groupBy(col("__src")).agg(count(lit(1)).as("n_grams"))
      .withColumn("__sid", xxhash64(col("__src")))
    // gram -> sorted source-id set -> count of identical sets
    val sets = grams.groupBy(col("gram"))
      .agg(sort_array(collect_set(col("__sid"))).as("__sids"))
      .groupBy(col("__sids")).agg(count(lit(1)).as("__cnt"))
    // expand each distinct set's (i < j) pairs exactly once (ids ascend
    // within the sorted set, so emitted pairs are hash-ordered)
    val pairExpr = flatten(transform(
      sequence(lit(0), size(col("__sids")) - 2),
      i => transform(
        slice(col("__sids"), i + 2, size(col("__sids"))),
        j => struct(element_at(col("__sids"), i + 1).as("sa"), j.as("sb")))))
    val inter = sets.filter(size(col("__sids")) >= 2)
      .select(col("__cnt"), explode(pairExpr).as("__p"))
      .groupBy(col("__p.sa").as("__sa"), col("__p.sb").as("__sb"))
      .agg(sum(col("__cnt")).as("n_shared"))
    val named = broadcast(sizes)
    // name-ordered output pairs; the hash-ordered (least, greatest) key
    // matches inter's sorted-set pair orientation
    named.select(col("__src").as("src_a"), col("__sid").as("__ha"), col("n_grams").as("grams_a"))
      .join(named.select(col("__src").as("src_b"), col("__sid").as("__hb"), col("n_grams").as("grams_b")),
        col("src_a") < col("src_b"))
      .withColumn("__sa", least(col("__ha"), col("__hb")))
      .withColumn("__sb", greatest(col("__ha"), col("__hb")))
      .join(inter, Seq("__sa", "__sb"), "left")
      .select(col("src_a"), col("src_b"), col("grams_a"), col("grams_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)).cast("double") /
          (col("grams_a") + col("grams_b") - coalesce(col("n_shared"), lit(0L))).cast("double"))
          .as("jaccard"))
  }

  /**
   * Rate-based token-budget selection (the 100 TB path): per source, keep a
   * document iff its md5-derived uniform draw is below
   * `budgetTokens / sourceTokens`. Two fully parallel passes (agg + filter),
   * no window, no global order; hits the budget in expectation with
   * per-document independence (so the kept set is a uniform subsample —
   * exactly the property mixture weighting wants). Deterministic: the draw
   * is a pure function of the id.
   */
  def tokenBudgetByRate(
      df: DataFrame, idCol: String, textCol: String, sourceCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be non-negative, got $budgetTokens")
    val tok = df.select(col(idCol), col(sourceCol),
      size(Dedup.tokens(col(textCol))).cast("long").as("ws_tokens"))
    val rates = tok.groupBy(col(sourceCol))
      .agg(sum(col("ws_tokens")).as("__total"))
      .withColumn("__rate",
        least(lit(1.0), lit(budgetTokens.toDouble) / col("__total").cast("double")))
    // uniform in [0,1): top 8 hex chars of md5(id) / 2^32
    val u = conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long").cast("double") / 4294967296.0
    tok.join(broadcast(rates), Seq(sourceCol))
      .withColumn("__u", u)
      .filter(col("__u") < col("__rate"))
      .select(col(idCol), col(sourceCol), col("ws_tokens"))
  }

  /**
   * Token-balanced shard assignment — the training-shard writer's split:
   * docs ordered by the portable md5 rank (the q55 tokenBudget order, so
   * shard contents are layout-independent and engine-replayable), then
   * shard i = `floor(exclusiveTokenPrefix · nShards / totalTokens)`,
   * capped at nShards−1. Contiguous token mass per shard ⇒ every shard's
   * token sum is within one max-document of the ideal `total/nShards` —
   * the balance a sequence-packing trainer wants from its input files.
   *
   * The prefix sums come from [[graft.operators.GlobalRank.withPrefixSum]]'s
   * two-pass distributed scan (range sort + per-partition offsets) — NOT a
   * `SUM OVER (ORDER BY ...)` global window, which would funnel the corpus
   * through one task. All arithmetic is integer ⇒ bit-exact anywhere.
   *
   * Output: (idCol, ws_tokens, shard) — join back to the corpus to write
   * `partitionBy(shard)`.
   */
  def packShards(
      df: DataFrame, idCol: String, textCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val tok = df.select(col(idCol),
      md5(col(idCol).cast("string").cast("binary")).as("__rk"),
      size(Dedup.tokens(col(textCol))).cast("long").as("ws_tokens"))
    // total from the cheap projection, not a re-run of the sorted scan
    val total = math.max(1L,
      Option(tok.agg(sum(col("ws_tokens"))).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L))
    val summed = graft.operators.GlobalRank.withPrefixSum(
      tok, Seq(col("__rk"), col(idCol)), col("ws_tokens"),
      rankName = "__gr", sumName = "__cum")
    summed.select(col(idCol), col("ws_tokens"),
      expr(s"least(CAST(${nShards - 1} AS BIGINT), ((__cum - ws_tokens) * $nShards) div $total)")
        .as("shard"))
  }

  /**
   * Category-mix diversity report: per group, the Gini impurity
   * `1 − Σ (c_i/N)²` of the category distribution — the corpus-mix
   * diversity metric (0 = monoculture, →1 = uniform across many
   * categories) a curation dashboard tracks per source/shard. Chosen
   * over Shannon entropy deliberately: the Gini form is RATIONAL in the
   * exact counts — one integer Σc², one squared total, ONE division —
   * so it is bit-reproducible cross-engine where `ln`-based entropy is
   * libm luck. One hash aggregation over (group, category), then a
   * group-sized rollup.
   */
  def giniMixReport(df: DataFrame, groupCol: String, catCol: String): DataFrame = {
    val cells = df.groupBy(col(groupCol), col(catCol)).agg(count(lit(1)).as("__c"))
    cells.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n_rows"),
        count(lit(1)).as("n_cats"),
        sum(col("__c") * col("__c")).as("__ss"))
      .select(col(groupCol), col("n_rows"), col("n_cats"),
        (lit(1.0) - col("__ss").cast("double") /
          (col("n_rows") * col("n_rows")).cast("double")).as("gini"))
  }

  /**
   * Deflate compression ratio per document — the Gopher/RefinedWeb
   * "too compressible = boilerplate/repetition, incompressible = noise"
   * quality signal: `deflate_ratio = compressed / raw bytes` at a fixed
   * zlib level. Boilerplate-heavy or repeated text compresses far below
   * typical prose (~0.4-0.6); random bytes sit near 1.
   *
   * The one operator in this family that is NOT a codegen expression —
   * zlib is inherently imperative — so it runs in `mapPartitions` with
   * one reused Deflater per partition (allocation-free per row, text
   * bytes never shuffle). Deterministic for a fixed level/JVM zlib, but
   * not SQL-reproducible → rows-only in the gate, property-spec'd
   * (monotonicity, bounds, layout independence).
   */
  def compressionStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      level: Int = 6): DataFrame = {
    require(level >= 0 && level <= 9, s"deflate level must be in [0,9], got $level")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(level)
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val in =
            if (text == null) Array.emptyByteArray else text.getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(in)
          deflater.finish()
          var out = 0L
          while (!deflater.finished()) out += deflater.deflate(buf)
          (id, in.length.toLong, out)
        }
      }
      .toDF(idCol, "n_bytes", "n_deflate")
      .withColumn("deflate_ratio",
        when(col("n_bytes") > 0,
          col("n_deflate").cast("double") / col("n_bytes").cast("double")))
  }

  /**
   * Jensen-Shannon divergence between the unigram token distributions of
   * two corpora (Lin, "Divergence measures based on the Shannon entropy",
   * IEEE-IT 1991) — the standard symmetric, bounded (0..ln 2 nats)
   * distribution-drift score between a training mix and a new source, or
   * two corpus snapshots. Output is ONE row: exact integer token/vocabulary
   * tallies plus `js_nats`.
   *
   * `js_nats` needs libm `ln`, which is not bit-portable across engines, so
   * this op is NOT on the DuckDB hash-oracle surface (same policy as
   * [[bigramLogLik]]); the closed-form extremes — identical distributions
   * = 0 exactly, disjoint vocabularies = ln 2 — and the [0, ln 2] bound are
   * pinned in CorpusFiltersSpec instead. The integer columns ARE
   * engine-exact (order-free sums).
   *
   * Plan shape (100 TB): each side collapses to its token-count relation in
   * one map-side-combinable shuffle (vocabulary-bounded, not corpus-
   * bounded); one full-outer equi-join on the token aligns them; the
   * per-token contributions reduce in a single-row aggregate. The raw
   * corpora shuffle only as (token, count) pairs.
   */
  /**
   * Out-of-vocabulary rate of an incoming corpus against a training
   * corpus's token vocabulary — the tokenizer-coverage drift check run
   * before mixing a new source in (high OOV = the tokenizer will shred it
   * into bytes). Occurrence-weighted (`oov_rate` = fraction of incoming
   * token OCCURRENCES whose type is unseen in training) plus the type-level
   * tallies. One row; pure counting, so fully on the hash oracle.
   *
   * Plan shape (100 TB): training collapses to its DISTINCT-token
   * vocabulary, incoming to its token-count relation (both map-side
   * combinable, vocabulary-bounded); one left equi-join on the token
   * aligns them. Raw text never shuffles.
   */
  def oovRate(train: DataFrame, incoming: DataFrame, textCol: String): DataFrame = {
    val vocab = train.select(explode(Dedup.tokens(col(textCol))).as("__tok"))
      .distinct().withColumn("__in_vocab", lit(true))
    val newCounts = incoming.select(explode(Dedup.tokens(col(textCol))).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__c"))
    val vt = vocab.agg(count(lit(1)).as("vocab_train"))
    newCounts.join(vocab, Seq("__tok"), "left")
      .agg(sum(col("__c")).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, col("__c")).otherwise(0L)).as("n_oov_tokens"),
        count(lit(1)).as("vocab_incoming"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("oov_types"))
      .crossJoin(broadcast(vt))
      .withColumn("oov_rate",
        when(col("n_tokens") > 0,
          col("n_oov_tokens").cast("double") / col("n_tokens").cast("double")))
  }

  /**
   * Exact-proportion stratified split: within every stratum, rows rank by
   * `md5(id)` (deterministic, layout-independent) and the first
   * `floor(cumFraction·n)` take each split label — so every stratum hits
   * its train/val/test proportions EXACTLY (±1 row), where [[hashSplit]]
   * is only exact in expectation. Cumulative fractions sum in BigDecimal
   * over the doubles' shortest decimal form, so the thresholds an oracle
   * embeds as string literals ('0.8', '0.9') are the engine's bit-for-bit.
   *
   * Scale note (100 TB): the rank is a window sort PER STRATUM — fine for
   * the many-moderate-strata shape this targets (sources, languages,
   * shards); for one monster stratum prefer [[hashSplit]] or pre-shard the
   * stratum key.
   */
  def stratifiedSplit(
      df: DataFrame, idCol: String, strataCol: String,
      splits: Seq[(String, Double)], outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.forall(_._2 >= 0.0),
      s"split fractions must be non-negative, got $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val cum = splits.map(s => BigDecimal(s._2.toString))
      .scanLeft(BigDecimal(0))(_ + _).tail
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")))
    val r = row_number().over(w).cast("long")
    val n = count(lit(1)).over(Window.partitionBy(col(strataCol)))
    val assigned = splits.init.zip(cum.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), cf)) =>
        val cond = r <= floor(lit(cf.toString).cast("double") * n.cast("double"))
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
    }.fold(lit(splits.last._1): Column)(_.otherwise(splits.last._1))
    df.withColumn(outCol, assigned)
  }

  def jsDivergence(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame, tag: String): DataFrame =
      df.select(explode(Dedup.tokens(col(textCol))).as("__tok"))
        .groupBy(col("__tok")).agg(count(lit(1)).as(s"__c$tag"))
    val joined = counts(a, "a").join(counts(b, "b"), Seq("__tok"), "full_outer")
      .select(coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val tot = joined.agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"))
    val p = col("__ca").cast("double") / col("__na").cast("double")
    val q = col("__cb").cast("double") / col("__nb").cast("double")
    val m = (p + q) / 2.0
    val contrib =
      when(col("__ca") > 0, p * log(p / m) * 0.5).otherwise(0.0) +
        when(col("__cb") > 0, q * log(q / m) * 0.5).otherwise(0.0)
    joined.crossJoin(broadcast(tot))
      .agg(first(col("__na")).as("n_tokens_a"), first(col("__nb")).as("n_tokens_b"),
        sum(when(col("__ca") > 0, 1L).otherwise(0L)).as("vocab_a"),
        sum(when(col("__cb") > 0, 1L).otherwise(0L)).as("vocab_b"),
        sum(when(col("__ca") > 0 && col("__cb") > 0, 1L).otherwise(0L)).as("vocab_shared"),
        count(lit(1)).as("vocab_union"),
        sum(when(col("__na") > 0 && col("__nb") > 0, contrib)).as("js_nats"))
  }
}
