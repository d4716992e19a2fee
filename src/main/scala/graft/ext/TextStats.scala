package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextExpressionFunctions

/**
 * Text-analysis operators for corpus curation (extension surface; the
 * reference has no scalar-function surface at all beyond key
 * stringification, /root/reference/src/bin/join.rs:66-70).
 *
 * Everything is built from codegen'd `org.apache.spark.sql.functions`
 * expressions (split/regexp/array ops) — per-row, embarrassingly parallel,
 * no shuffle, no UDFs; the whole stats projection fuses into one
 * WholeStageCodegen stage over the scan.
 */
object TextStats {

  /** Whitespace tokens of the raw (case-preserved) text. */
  def tokens(text: Column): Column = {
    val t = trim(text)
    when(length(t) === 0, array().cast("array<string>")).otherwise(split(t, "\\s+"))
  }

  /**
   * Per-document stats block: token/char counts, punctuation/digit/space
   * ratios, mean token length, and a [0,1] quality score combining them
   * (Gopher/C4-style length+punctuation heuristics).
   */
  def withStats(df: DataFrame, textCol: String, prefix: String = ""): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nChars = length(t).cast("long")
    val nTokens = size(toks).cast("long")
    val punct = length(t) - length(regexp_replace(t, "\\p{Punct}", ""))
    val digits = length(t) - length(regexp_replace(t, "[0-9]", ""))
    val spaces = length(t) - length(regexp_replace(t, "\\s", ""))
    val safeChars = greatest(nChars, lit(1L)).cast("double")
    val meanTokLen = when(nTokens === 0, 0.0)
      .otherwise((nChars - spaces).cast("double") / nTokens.cast("double"))
    df.withColumn(prefix + "n_chars", nChars)
      .withColumn(prefix + "n_tokens", nTokens)
      .withColumn(prefix + "punct_ratio", punct.cast("double") / safeChars)
      .withColumn(prefix + "digit_ratio", digits.cast("double") / safeChars)
      .withColumn(prefix + "space_ratio", spaces.cast("double") / safeChars)
      .withColumn(prefix + "mean_token_len", meanTokLen)
  }

  /** Heuristic quality score in [0,1]: rewards 20..5000-token docs with
    * word-like tokens; penalizes punctuation/digit-heavy text. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val s = withStats(df, textCol, "__q_")
    val lenScore = least(col("__q_n_tokens").cast("double") / 20.0, lit(1.0)) *
      when(col("__q_n_tokens") > 5000, 0.5).otherwise(1.0)
    val tokScore = when(col("__q_mean_token_len").between(2.0, 12.0), 1.0).otherwise(0.5)
    val punctScore = greatest(lit(0.0), lit(1.0) - col("__q_punct_ratio") * 4.0)
    val digitScore = greatest(lit(0.0), lit(1.0) - col("__q_digit_ratio") * 2.0)
    // no round(): identical double arithmetic on both engines must stay
    // bit-identical for the hash-compare oracle
    s.withColumn("quality_score", lenScore * tokScore * punctScore * digitScore)
      .drop(s.columns.filter(_.startsWith("__q_")).toIndexedSeq: _*)
  }

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Real pipelines plug in fastText-style models; the Spark
    * plumbing (scored argmax over per-language token overlap) is identical. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "dans", "que", "pour"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "人", "有", "他", "这"))

  /**
   * Stopword-overlap language ID: per language, score = fraction of that
   * language's stopword list present in the document; argmax wins
   * (deterministic tie-break on language code). "und" (undetermined) when
   * nothing scores.
   */
  def langId(df: DataFrame, textCol: String, outCol: String = "lang_pred"): DataFrame = {
    val toks = array_distinct(Dedup.tokens(col(textCol)))
    val scored = stopwords.toSeq.sortBy(_._1).map { case (code, words) =>
      struct(
        (size(array_intersect(toks, typedlit(words))).cast("double") / words.size).as("score"),
        lit(code).as("code"))
    }
    // greatest over (score, code) structs = max score, ties -> largest code
    val best = greatest(scored: _*)
    df.withColumn(outCol, when(best.getField("score") > 0.0, best.getField("code")).otherwise(lit("und")))
      .withColumn(outCol + "_score", best.getField("score"))
  }

  /**
   * Document fingerprints:
   *  - `content_fp`: xxhash64 of whitespace-normalized lowercase text
   *    (exact-dup key robust to spacing);
   *  - `shingle_fp`: min xxhash64 over word 3-gram shingles (one-permutation
   *    MinHash — equal for near-identical docs with high probability);
   *  - `simhash_fp`: 64-bit SimHash over tokens (custom codegen'd Catalyst
   *    expression).
   */
  def fingerprint(df: DataFrame, textCol: String): DataFrame = {
    val norm = concat_ws(" ", Dedup.tokens(col(textCol)))
    val sh = Dedup.shingles(col(textCol), 3)
    df.withColumn("content_fp", xxhash64(norm))
      .withColumn("shingle_fp",
        when(size(sh) === 0, lit(null).cast("long"))
          .otherwise(array_min(transform(sh, s => xxhash64(s)))))
      .withColumn("simhash_fp", TextExpressionFunctions.simhash64(Dedup.tokens(col(textCol))))
  }

  /**
   * Canonical text-normalization chain (the pre-dedup normalizer every
   * curation pipeline runs so that near-identical texts collide): lowercase
   * → strip everything that is not a letter, digit, or whitespace → collapse
   * whitespace runs to single spaces → trim. Unicode-aware (`\p{L}`/`\p{N}`
   * classes, so CJK and accented letters survive). Pure codegen'd regexp
   * projection — scan-fused, no shuffle; emits the normalized text plus its
   * char/token counts.
   */
  def normalize(df: DataFrame, textCol: String, outCol: String = "norm_text"): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^\\p{L}\\p{N}\\s]", " "),
      "\\s+", " "))
    df.withColumn(outCol, norm)
      .withColumn(outCol + "_chars", length(col(outCol)).cast("long"))
      .withColumn(outCol + "_tokens", size(tokens(col(outCol))).cast("long"))
  }

  /** The classic cp1252/Latin-1-misdecode artifact sequences: UTF-8 bytes
    * of common accented letters re-read as single-byte text ("é" → "Ã©")
    * and of smart punctuation ("'" → "â€™"). A fixed literal alternation,
    * RE2-safe, identical in every engine. */
  private val mojibakeSeqPattern =
    "Ã©|Ã¨|Ã¤|Ã¶|Ã¼|Ã«|Ã±|Ã§|Ã¡|Ã³|Ãº|â€™|â€œ|â€¦|â€“|â€”|Â°|Â·|Â "

  /**
   * Encoding-corruption (mojibake) scan — the corpus-hygiene check next to
   * [[graft.ext.CorpusFilters.piiScan]]: per-document counts of
   * (1) U+FFFD replacement characters (a decoder already gave up),
   * (2) classic double-encoding artifact sequences (UTF-8 read as
   * cp1252/Latin-1 — "Ã©", "â€™", NBSP "Â "), and (3) stray C0 control
   * characters other than tab/newline/CR (binary junk in text columns).
   * `mojibake_total` sums them; filter on it to quarantine corrupt docs.
   *
   * Pure scan-fused codegen regexp projection, no shuffle. The synthetic
   * gate corpus is clean, so q259 pins the schema + zero contract (the PII
   * discipline); crafted-input semantics live in TextStatsSpec.
   */
  def mojibakeScan(df: DataFrame, textCol: String): DataFrame = {
    def cnt(p: String) =
      size(regexp_extract_all(col(textCol), lit(p), lit(0))).cast("long")
    df.withColumn("n_replacement", cnt("�"))
      .withColumn("n_mojibake_seq", cnt(mojibakeSeqPattern))
      .withColumn("n_c0_control", cnt("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"))
      .withColumn("mojibake_total",
        col("n_replacement") + col("n_mojibake_seq") + col("n_c0_control"))
  }

  /** GPT-2-style pre-tokenizer regex (contractions | letter runs | digit
    * runs | symbol runs), giving a BPE-ish token count without a vocab. */
  private val bpeIshPattern =
    "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  def withTokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("ws_tokens", size(tokens(t)).cast("long"))
      .withColumn("bpe_ish_tokens",
        size(regexp_extract_all(t, lit(bpeIshPattern), lit(0))).cast("long"))
  }

  /**
   * Overlapping fixed-width character chunking (retrieval / embedding
   * prep): chunk i of a document covers characters
   * [i·stride, i·stride + chunkChars) — consecutive chunks overlap by
   * (chunkChars - stride) characters so no boundary context is lost. The
   * last chunk may be short; an empty document yields one empty chunk, so
   * every input row is represented downstream. Pure per-row
   * sequence+explode+substr projection — no shuffle; the row fan-out is
   * ~len/stride, which is the output size itself, not an intermediate
   * blow-up.
   */
  /**
   * Canonical URL normalization (the C4/RefinedWeb URL-dedup key): strip
   * the fragment, lowercase the scheme+host, drop a leading `www.`, remove
   * tracking query parameters (`utm_*`, `ref`, `fbclid`, `gclid`) while
   * preserving the relative order of the survivors, tidy the separators
   * the removals leave behind, and drop a trailing path slash. Web corpora
   * carry the same page under dozens of surface URL spellings; this chain
   * collapses them to one dedup key.
   *
   * Pure codegen regexp projection (RE2-safe patterns — no backreferences
   * or lookarounds — so the DuckDB oracle replays the identical chain);
   * scan-fused, no shuffle. `urlDomain` extracts the normalized host for
   * per-domain corpus accounting.
   */
  def urlNormalize(url: Column): Column = {
    // 1. fragment off; 2. split after the host so only scheme+host
    // lowercases; 3. www. off; 4. tracking params off; 5. tidy the "?&",
    // "&&", and trailing "?"/"&" the removals leave; 6. trailing path
    // slash off (also right before a query)
    val noFrag = regexp_replace(url, "#.*", "")
    val prefix = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val head = regexp_replace(lower(prefix), "://www\\.", "://")
    val tail = noFrag.substr(length(prefix) + 1, length(noFrag))
    val noTrack = regexp_replace(tail, "(utm_[A-Za-z0-9]+|ref|fbclid|gclid)=[^&#]*", "")
    val tidied = regexp_replace(regexp_replace(regexp_replace(noTrack,
      "&+", "&"), "\\?&", "?"), "[?&]+$", "")
    val noSlash = regexp_replace(regexp_replace(tidied, "/+$", ""), "/+\\?", "?")
    concat(head, noSlash)
  }

  /** The normalized host of a [[urlNormalize]]d URL (empty string if the
    * value has no `scheme://host` prefix). */
  def urlDomain(normUrl: Column): Column =
    regexp_extract(normUrl, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)

  /**
   * Markup-to-text extraction — the step every web-corpus pipeline runs
   * before any text filter sees a crawled page: drop `<script>`/`<style>`
   * blocks wholesale (their CONTENT is code, not prose — stripping only
   * the tags would leak JavaScript into the corpus), drop comments, strip
   * the remaining tags, unescape the core entities (`&amp;` LAST, so
   * `&amp;lt;` surfaces as the literal `&lt;` instead of resurrecting a
   * tag), collapse whitespace, trim.
   *
   * Pure codegen chain of RE2-safe regexes ((?is) flags and non-greedy
   * `.*?` are RE2-supported — no backreferences/lookarounds) and literal
   * replaces — scan-fused, no shuffle, replayed identically by the oracle.
   */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val unescaped = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /**
   * Sentence segmentation + per-document sentence statistics: sentences
   * are the maximal non-blank runs between `[.!?]+` boundary groups (the
   * C4-style heuristic splitter — no abbreviation model, deliberately,
   * so the rule is engine-replayable), words are whitespace tokens of
   * each trimmed sentence. Appends `n_sentences`, `n_sent_words`,
   * `max_sent_words`, and `mean_sent_words` (ONE IEEE division of exact
   * longs).
   *
   * Whole computation is a scan-fused codegen projection (split + array
   * higher-order functions) — no explode, no shuffle: the per-doc
   * sentence array never leaves its row.
   */
  def sentenceStats(df: DataFrame, textCol: String): DataFrame = {
    val sent = filter(split(col(textCol), "[.!?]+"),
      s => length(trim(s)) > 0)
    val wc = transform(sent, s => size(split(trim(s), "\\s+")).cast("long"))
    val nSent = size(sent).cast("long")
    df.withColumn("n_sentences", nSent)
      .withColumn("n_sent_words",
        aggregate(wc, lit(0L), (acc, x) => acc + x))
      .withColumn("max_sent_words", coalesce(array_max(wc), lit(0L)))
      .withColumn("mean_sent_words",
        when(nSent === 0, lit(0.0))
          .otherwise(col("n_sent_words").cast("double") / nSent.cast("double")))
  }

  /**
   * Flesch reading-ease score: `206.835 − 1.015·(words/sentences) −
   * 84.6·(syllables/words)` with the standard cheap proxies — sentences
   * = `[.!?]+` boundary runs (the [[sentenceStats]] rule), syllables =
   * vowel-group count (`[aeiouy]+` matches; summing per-text equals
   * summing per-word) — the classic text-difficulty feature a curriculum
   * or quality filter consumes. All three counts are exact integers from
   * scan-fused codegen regexes; the score is a fixed IEEE tree over
   * shared literals, so it replays bit-for-bit. Degenerate docs (no
   * sentence or no word) emit NULL.
   */
  def fleschReadability(df: DataFrame, textCol: String): DataFrame = {
    val sent = filter(split(col(textCol), "[.!?]+"), s => length(trim(s)) > 0)
    val nSent = size(sent).cast("long")
    val t = trim(col(textCol))
    val words = when(length(t) === 0, 0L)
      .otherwise(size(split(t, "\\s+")).cast("long"))
    val syll = regexp_count(lower(col(textCol)), lit("[aeiouy]+")).cast("long")
    df.withColumn("n_sentences", nSent)
      .withColumn("n_words", words)
      .withColumn("n_syllables", syll)
      .withColumn("flesch",
        when(col("n_sentences") > 0 && col("n_words") > 0,
          lit(206.835) -
            lit(1.015) * (col("n_words").cast("double") / col("n_sentences").cast("double")) -
            lit(84.6) * (col("n_syllables").cast("double") / col("n_words").cast("double"))))
  }

  /**
   * Sliding WORD-window chunking with overlap — the retrieval/embedding
   * prep step ([[chunkText]] is its cheaper char-offset sibling that only
   * fingerprints): chunk `i` carries the words
   * `[i·stride, i·stride + width)` joined by single spaces, where
   * `stride = width − overlap`, and the chunk count is exactly
   * `((n − width + stride − 1) div stride) + 1` for n > width (1
   * otherwise) — the last chunk always reaches the final word and no
   * degenerate tail chunk is emitted. Pure integer arithmetic + string
   * ops, so the chunk TEXT itself replays bit-exactly in any engine.
   *
   * Scale shape: one `explode(sequence)` per doc — each doc expands to
   * its own chunk rows only (width/stride-bounded fan-out), and text
   * never rides a shuffle beyond those rows.
   */
  def chunkWords(df: DataFrame, idCol: String, textCol: String,
      width: Int, overlap: Int): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    require(overlap >= 0 && overlap < width,
      s"overlap must be in [0, width), got $overlap for width $width")
    val stride = width - overlap
    val w = split(trim(col(textCol)), "\\s+")
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), w.as("__w"))
      .withColumn("__n", size(col("__w")).cast("long"))
      .withColumn("__nc", when(col("__n") <= width, lit(1L))
        .otherwise(expr(s"((__n - $width + ${stride - 1}) div $stride) + 1")))
      .select(col(idCol), col("__w"),
        explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("__w"),
          (col("chunk_id") * stride + 1).cast("int"), lit(width)), " ").as("chunk_text"),
        size(slice(col("__w"),
          (col("chunk_id") * stride + 1).cast("int"), lit(width))).cast("long").as("n_words"))
  }

  def chunkText(df: DataFrame, idCol: String, textCol: String,
      chunkChars: Int, strideChars: Int): DataFrame = {
    require(chunkChars > 0, s"chunkChars must be positive, got $chunkChars")
    require(strideChars > 0 && strideChars <= chunkChars,
      s"strideChars must be in [1, chunkChars], got $strideChars")
    val t = col(textCol)
    val starts = sequence(lit(0), greatest(length(t) - 1, lit(0)), lit(strideChars))
    val chunk = col("__ct_text").substr(col("chunk_start") + 1, lit(chunkChars))
    df.select(col(idCol), t.as("__ct_text"), explode(starts).as("chunk_start"))
      .select(col(idCol),
        (col("chunk_start") / strideChars).cast("long").as("chunk_idx"),
        col("chunk_start").cast("long").as("chunk_start"),
        length(chunk).cast("long").as("chunk_len"),
        md5(chunk.cast("binary")).as("chunk_md5"))
  }
}
