package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("withStats computes exact counts and ratios") {
    val df = Seq((1L, "Hello, world! 42")).toDF("id", "text")
    val r = TextStats.withStats(df, "text").head()
    // "Hello, world! 42": 16 chars, 3 tokens, 2 punct (, !), 2 digits, 2 spaces
    assert(r.getAs[Long]("n_chars") === 16L)
    assert(r.getAs[Long]("n_tokens") === 3L)
    assert(r.getAs[Double]("punct_ratio") === 2.0 / 16)
    assert(r.getAs[Double]("digit_ratio") === 2.0 / 16)
    assert(r.getAs[Double]("space_ratio") === 2.0 / 16)
    assert(r.getAs[Double]("mean_token_len") === 14.0 / 3)
  }

  test("empty and whitespace-only text: zero tokens, no division blowups") {
    val df = Seq((1L, ""), (2L, "   ")).toDF("id", "text")
    val rs = TextStats.withStats(df, "text").orderBy($"id").collect()
    assert(rs(0).getAs[Long]("n_tokens") === 0L)
    assert(rs(1).getAs[Long]("n_tokens") === 0L)
    assert(rs(0).getAs[Double]("mean_token_len") === 0.0)
  }

  test("langId picks the stopword-dominant language; und for no signal") {
    val df = Seq(
      (1L, "the cat sat on the mat and it is warm for a day"),
      (2L, "der hund und die katze das ist ein haus mit garten"),
      (3L, "el perro y la casa de un amigo es por la noche"),
      (4L, "xyzzy plugh qwerty asdf")
    ).toDF("id", "text")
    val got = TextStats.langId(df, "text").select($"id", $"lang_pred")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "en")
    assert(got(2L) === "de")
    assert(got(3L) === "es")
    assert(got(4L) === "und")
  }

  test("fingerprints: whitespace-insensitive content_fp; near-dup docs share shingle_fp behavior") {
    val df = Seq(
      (1L, "alpha  beta\tgamma delta"),
      (2L, "Alpha Beta Gamma Delta"), // same tokens after lowercase/normalize
      (3L, "totally different content here")
    ).toDF("id", "text")
    val fp = TextStats.fingerprint(df, "text")
      .select($"id", $"content_fp", $"simhash_fp").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fp(1L)._1 === fp(2L)._1) // normalized content hash equal
    assert(fp(1L)._2 === fp(2L)._2) // simhash equal for same token multiset
    assert(fp(1L)._1 !== fp(3L)._1)
  }

  test("token counts: whitespace vs BPE-ish regex") {
    val df = Seq((1L, "it's rain-ing 123 tokens!")).toDF("id", "text")
    val r = TextStats.withTokenCounts(df, "text").head()
    assert(r.getAs[Long]("ws_tokens") === 4L)
    // it|'s| rain|-|ing| 123| tokens|! -> 8
    assert(r.getAs[Long]("bpe_ish_tokens") === 8L)
  }

  test("quality score: clean prose scores high; punctuation soup scores low") {
    val df = Seq(
      (1L, ("the quick brown fox jumps over the lazy dog " * 3).trim),
      (2L, "!!! ### $$$ %%% ^^^ &&& *** ((( ))) @@@ !!!")
    ).toDF("id", "text")
    val got = TextStats.qualityScore(df, "text").select($"id", $"quality_score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > 0.8)
    assert(got(2L) === 0.0)
  }

  test("chunkText: overlapping windows, short tail, empty doc yields one empty chunk") {
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val text = ("ab" * 175) // 350 chars
    val df = Seq((1L, text), (2L, "")).toDF("doc_id", "text")
    val got = TextStats.chunkText(df, "doc_id", "text", chunkChars = 200, strideChars = 150)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // doc1: starts 0,150,300 -> lens 200,200,50
    assert(got.keySet === Set((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L)))
    assert(got((1L, 0L)) === ((0L, 200L, md5Hex(text.substring(0, 200)))))
    assert(got((1L, 1L)) === ((150L, 200L, md5Hex(text.substring(150, 350)))))
    assert(got((1L, 2L)) === ((300L, 50L, md5Hex(text.substring(300)))))
    // empty doc is still represented (one empty chunk)
    assert(got((2L, 0L)) === ((0L, 0L, md5Hex(""))))
    // overlap invariant: consecutive chunks share chunkChars - stride chars
    intercept[IllegalArgumentException] {
      TextStats.chunkText(df, "doc_id", "text", chunkChars = 100, strideChars = 200)
    }
  }

  test("normalize: unicode-aware lowering/stripping/collapsing, with counts") {
    val df = Seq(
      (1L, "  Hello, WORLD!!  foo_bar 42 "),
      (2L, "Héllo — 中文, test"),
      (3L, "!!!"),
      (4L, "")
    ).toDF("doc_id", "text")
    val r = TextStats.normalize(df, "text")
      .select($"doc_id", $"norm_text", $"norm_text_chars", $"norm_text_tokens")
      .collect().map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) === (("hello world foo bar 42", 22L, 5L)))
    assert(r(2L) === (("héllo 中文 test", 13L, 3L))) // letters (incl. CJK) survive
    assert(r(3L) === (("", 0L, 0L)))                // punctuation-only -> empty
    assert(r(4L) === (("", 0L, 0L)))
  }

  test("urlNormalize: canonical collapse of surface URL noise") {
    val cases = Seq(
      // scheme/host case + www + fragment
      ("HTTPS://WWW.Example.COM/Path#frag", "https://example.com/Path"),
      // tracking params stripped, survivor order kept, separators tidied
      ("https://a.com/p?utm_source=x&id=3&utm_campaign=y&q=z", "https://a.com/p?id=3&q=z"),
      ("https://a.com/p?utm_source=x&utm_medium=y", "https://a.com/p"),
      ("https://a.com/p?ref=tw", "https://a.com/p"),
      ("https://a.com/p?fbclid=abc&gclid=def", "https://a.com/p"),
      // trailing slash off (also right before a query)
      ("http://b.org/dir/", "http://b.org/dir"),
      ("http://b.org/dir/?id=1", "http://b.org/dir?id=1"),
      // path case preserved — only scheme+host lowercase
      ("http://B.org/CaseSensitive/Path", "http://b.org/CaseSensitive/Path"),
      // no scheme: passes through the tail rules only
      ("plain-text-no-url", "plain-text-no-url"))
    val got = cases.map(_._1).zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select($"id", TextStats.urlNormalize($"url").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (((_, want), i) <- cases.zipWithIndex)
      assert(got(i.toLong) === want, s"case $i: ${cases(i)._1}")
  }

  test("stripHtml: script/style content dies, tags strip, entities unescape in order") {
    val cases = Seq(
      // script CONTENT must vanish (stripping only tags would leak JS)
      ("<p>keep</p><script>var x = 1 < 2;</script><p>this</p>", "keep this"),
      ("<style>p{color:red}</style><b>bold</b>", "bold"),
      ("before<!-- secret -->after", "before after"),
      // entity unescape, &amp; last: &amp;lt; is the LITERAL &lt;
      ("Tom &amp; Jerry &lt;3 &quot;q&quot; it&#39;s&nbsp;x &amp;lt;esc", "Tom & Jerry <3 \"q\" it's x &lt;esc"),
      // attributes and self-closing tags
      ("<img src=\"a.png\"/><a href='x'>link</a>", "link"),
      ("   <div>  spaced   out  </div>  ", "spaced out"),
      ("no markup at all", "no markup at all"))
    val got = cases.zipWithIndex.map { case ((h, _), i) => (i.toLong, h) }
      .toDF("id", "h")
      .select($"id", TextStats.stripHtml($"h").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (((h, want), i) <- cases.zipWithIndex)
      assert(got(i.toLong) === want, s"case $i: $h")
  }

  test("urlDomain extracts the normalized host; empty when schemeless") {
    val got = Seq(
      (1L, "https://docs.site.io/a/b?x=1"),
      (2L, "no-scheme-here")).toDF("id", "u")
      .select($"id", TextStats.urlDomain($"u").as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "docs.site.io")
    assert(got(2L) === "")
  }

  test("sentenceStats: hand-computed boundaries, blanks, and empties") {
    val df = Seq(
      (1L, "Hello big world. Bye!"), // 2 sentences: 3 words + 1 word
      (2L, "One?! Two.. . "), // double punctuation groups; blank tail dies
      (3L, ""), // no sentences at all
      (4L, "no punctuation here") // one unterminated sentence
    ).toDF("id", "t")
    val got = TextStats.sentenceStats(df, "t")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got(1L) === ((2L, 4L, 3L, 2.0)))
    assert(got(2L) === ((2L, 2L, 1L, 1.0)))
    assert(got(3L) === ((0L, 0L, 0L, 0.0)))
    assert(got(4L) === ((1L, 3L, 3L, 3.0)))
  }

  test("fleschReadability: hand counts and the textbook formula") {
    val df = Seq(
      (1L, "The cat sat. It ran away!"), // 2 sentences, 6 words
      (2L, ""), // degenerate -> NULL score
      (3L, "zzz bcd") // words but ZERO syllables (no vowels)
    ).toDF("id", "t")
    val got = TextStats.fleschReadability(df, "t")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    // tuple = (n_sentences, n_words, n_syllables, flesch)
    // syllables by vowel groups: the=1 cat=1 sat=1 it=1 ran=1 away=2 -> 7
    val exp = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (7.0 / 6.0)
    assert(got(1L) === ((2L, 6L, 7L, Some(exp))))
    assert(got(2L) === ((0L, 0L, 0L, None)))
    // zero syllables is fine (the score just goes high): 1 sentence, 2 words
    assert(got(3L) === ((1L, 2L, 0L, Some(206.835 - 1.015 * 2.0))))
  }

  test("mojibakeScan: artifact classes count; clean unicode does not trip it") {
    val docs = Seq(
      (1L, "clean café naïve text"),          // proper accents: clean
      (2L, "broken cafÃ© and more cafÃ©"), // cafÃ© twice
      (3L, "smart quote gone wrong: it\u00e2\u20ac\u2122s"),   // â€™
      (4L, "dec�oder ga�ve up"),              // two U+FFFD
      (5L, "null\u0000byte and bell\u0007, tab\tok\nnewline ok"),
      (6L, "nbsp artifact:Â end")                  // "Â "
    ).toDF("doc_id", "text")
    val got = TextStats.mojibakeScan(docs, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(1L) === ((0L, 0L, 0L, 0L)))
    assert(got(2L) === ((0L, 2L, 0L, 2L)))
    assert(got(3L) === ((0L, 1L, 0L, 1L)))
    assert(got(4L) === ((2L, 0L, 0L, 2L)))
    assert(got(5L) === ((0L, 0L, 2L, 2L))) // \t and \n are NOT junk
    assert(got(6L) === ((0L, 1L, 0L, 1L)))
  }

  test("chunkWords: hand case, overlap coverage, tail clamp, validation") {
    import graft.ext.TextStats
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "x y"), (3L, "  "))
      .toDF("doc_id", "text")
    val got = TextStats.chunkWords(df, "doc_id", "text", width = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    assert(got.size === 4)
    assert(got((1L, 0L)) === (("a b c d", 4L)))
    assert(got((1L, 1L)) === (("d e f g", 4L))) // stride 3: overlaps on "d"
    assert(got((1L, 2L)) === (("g h i j", 4L))) // reaches the final word
    assert(got((2L, 0L)) === (("x y", 2L)))     // short doc = single chunk
    // whitespace-only doc 3 emits nothing; exact-boundary case n = 7
    val exact = TextStats.chunkWords(
        Seq((9L, "a b c d e f g")).toDF("doc_id", "text"), "doc_id", "text", 4, 1)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(exact === Map(0L -> "a b c d", 1L -> "d e f g"))
    intercept[IllegalArgumentException] {
      TextStats.chunkWords(df, "doc_id", "text", 4, 4)
    }
    intercept[IllegalArgumentException] {
      TextStats.chunkWords(df, "doc_id", "text", 0, 0)
    }
  }
}
