package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorpusFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("repetitionStats: ground-truth fractions, single-word and empty docs") {
    val docs = Seq(
      (1L, "a a a b"),      // words 4, distinct 2, top word 3, bigrams: "a a"x2 "a b"x1
      (2L, "x"),            // single word: no bigrams
      (3L, "  "),           // whitespace-only: dropped (no tokens)
      (4L, "p q p q p")     // words 5, distinct 2, top 3; bigrams: "p q"x2 "q p"x2
    ).toDF("doc_id", "text")
    val r = CorpusFilters.repetitionStats(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.keySet === Set(1L, 2L, 4L))
    val d1 = r(1L)
    assert(d1.getLong(1) === 4L && d1.getLong(2) === 2L)
    assert(math.abs(d1.getDouble(3) - 0.5) < 1e-15)
    assert(math.abs(d1.getDouble(4) - 0.75) < 1e-15)
    assert(math.abs(d1.getDouble(5) - 2.0 / 3.0) < 1e-15)
    val d2 = r(2L)
    assert(d2.getLong(1) === 1L && d2.getDouble(4) === 1.0 && d2.getDouble(5) === 0.0)
    val d4 = r(4L)
    assert(d4.getLong(1) === 5L && math.abs(d4.getDouble(5) - 0.5) < 1e-15)
  }

  test("piiScan: counts + typed redaction; clean text is untouched") {
    val docs = Seq(
      (1L, "mail bob@example.com or ops@sub.example.org, host 10.0.0.1, call 555-123-4567"),
      (2L, "nothing sensitive here 123")
    ).toDF("doc_id", "text")
    val r = CorpusFilters.piiScan(docs, "text")
      .select($"doc_id", $"email_cnt", $"ipv4_cnt", $"phone_cnt", $"pii_total", $"redacted", $"text")
      .collect().map(x => x.getLong(0) -> x).toMap
    val hit = r(1L)
    assert(hit.getLong(1) === 2L && hit.getLong(2) === 1L && hit.getLong(3) === 1L)
    assert(hit.getLong(4) === 4L)
    val red = hit.getString(5)
    assert(red.contains("<EMAIL>") && red.contains("<IP>") && red.contains("<PHONE>"))
    assert(!red.contains("bob@") && !red.contains("10.0.0.1") && !red.contains("555-123-4567"))
    val clean = r(2L)
    assert(clean.getLong(4) === 0L && clean.getString(5) === clean.getString(6))
  }

  test("decontaminate: planted 5-gram overlap flags the train doc; short-doc fallback shingle") {
    val evalSet = Seq(
      (100L, "one two three four five six"),
      (101L, "tiny doc")
    ).toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix words then one two three four five and a tail"), // shares 1 distinct 5-gram
      (2L, "completely different vocabulary with no overlap at all"),
      (3L, "tiny doc") // < 5 words: whole-doc shingle matches eval 101
    ).toDF("doc_id", "text")
    val rows = CorpusFilters.decontaminate(train, evalSet, "doc_id", "text", n = 5)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    assert(rows(1L) === ((1L, true)))
    assert(rows(2L) === ((0L, false)))
    assert(rows(3L) === ((1L, true)))
  }

  test("topBigrams: deterministic count-then-gram ranking") {
    val docs = Seq(
      (1L, "a b a b c"),   // "a b"x2, "b a"x1, "b c"x1
      (2L, "a b z z")      // "a b"x1, "b z"x1, "z z"x1
    ).toDF("doc_id", "text")
    val r = CorpusFilters.topBigrams(docs, "doc_id", "text", k = 3)
      .orderBy($"rank").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    assert(r.head === ((1L, "a b", 3L)))
    // count-1 grams tie-break lexicographically
    assert(r(1) === ((2L, "b a", 1L)) && r(2) === ((3L, "b c", 1L)))
  }

  test("tokenBudget: per-source md5-order prefix under the budget") {
    // one source, five docs of 10 tokens each -> total 50, budget 25 -> the
    // first 2 docs in md5(doc_id) order are kept
    val text = Seq.fill(10)("w").mkString(" ")
    val docs = (1L to 5L).map(i => (i, "s0", text)).toDF("doc_id", "source", "text")
    val kept = CorpusFilters.tokenBudget(docs, "doc_id", "text", "source", budgetFrac = 0.5)
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getLong(3)))
    val order = (1L to 5L).sortBy(i => (md5Hex(i.toString), i))
    assert(kept.map(_._1).toSet === order.take(2).toSet)
    assert(kept.map(_._2).forall(_ === 10L))
    assert(kept.map(_._3).max === 20L) // running sum of the kept prefix
  }

  test("mixtureReport: ground-truth counts and fractions summing to 1") {
    val docs = Seq(
      (1L, "a", "w w w"), (2L, "a", "w"), (3L, "b", "w w w w w w")
    ).toDF("doc_id", "source", "text")
    val r = CorpusFilters.mixtureReport(docs, "text", "source")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getLong(1) === 2L && r("a").getLong(2) === 4L)
    assert(r("b").getLong(1) === 1L && r("b").getLong(2) === 6L)
    assert(math.abs(r("a").getDouble(3) - 2.0 / 3.0) < 1e-15)
    assert(math.abs(r("a").getDouble(4) - 0.4) < 1e-15)
    assert(math.abs(r.values.map(_.getDouble(4)).sum - 1.0) < 1e-12)
  }

  test("input validation fails fast with named errors") {
    val docs = Seq((1L, "a", "w")).toDF("doc_id", "source", "text")
    assert(intercept[IllegalArgumentException] {
      CorpusFilters.tokenBudget(docs, "doc_id", "text", "source", budgetFrac = 1.5)
    }.getMessage.contains("budgetFrac"))
    assert(intercept[IllegalArgumentException] {
      CorpusFilters.topBigrams(docs, "doc_id", "text", k = 0)
    }.getMessage.contains("k must be positive"))
    assert(intercept[IllegalArgumentException] {
      CorpusFilters.decontaminate(docs, docs, "doc_id", "text", n = 0)
    }.getMessage.contains("n-gram size"))
    assert(intercept[IllegalArgumentException] {
      CorpusFilters.tokenBudgetByRate(docs, "doc_id", "text", "source", budgetTokens = -1L)
    }.getMessage.contains("budgetTokens"))
  }

  test("null text: repetitionStats drops the row; piiScan propagates null (curation filters then drop it)") {
    val docs = Seq((1L, Some("a b")), (2L, Option.empty[String])).toDF("doc_id", "text")
    val rep = CorpusFilters.repetitionStats(docs, "doc_id", "text").collect()
    assert(rep.map(_.getLong(0)).toSet === Set(1L))
    val pii = CorpusFilters.piiScan(docs, "text")
      .select($"doc_id", $"pii_total").collect().map(x => x.getLong(0) -> x).toMap
    assert(pii(1L).getLong(1) === 0L)
    assert(pii(2L).isNullAt(1)) // null in, null out: a `pii_total = 0` keep-filter drops it
  }

  test("temperatureMixture: tau=0.5 upweights small sources; weights sum to 1; quota <= budget") {
    val big = Seq.fill(90)("w").mkString(" ")
    val small = Seq.fill(10)("w").mkString(" ")
    val docs = Seq((1L, "big", big), (2L, "small", small)).toDF("doc_id", "source", "text")
    val r = CorpusFilters.temperatureMixture(docs, "text", "source", tau = 0.5, budgetTokens = 50L)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(math.abs(r("big").getDouble(2) - 0.9) < 1e-12)   // natural share
    // sqrt tempering: small source's weight exceeds its share, big's shrinks
    assert(r("small").getDouble(3) > 0.1 && r("big").getDouble(3) < 0.9)
    assert(math.abs(r.values.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    assert(r.values.map(_.getLong(4)).sum <= 50L)
    assert(r.values.forall(x => x.getDouble(5) <= 1.0))
    assert(intercept[IllegalArgumentException] {
      CorpusFilters.temperatureMixture(docs, "text", "source", tau = 1.5, budgetTokens = 50L)
    }.getMessage.contains("tau"))
  }

  test("tokenBudgetByRate: deterministic, subset of input, keeps all when budget >= total") {
    val text = Seq.fill(10)("w").mkString(" ")
    val docs = (1L to 20L).map(i => (i, if (i <= 10) "a" else "b", text))
      .toDF("doc_id", "source", "text")
    val all = CorpusFilters.tokenBudgetByRate(docs, "doc_id", "text", "source", budgetTokens = 1000L)
    assert(all.count() === 20L) // rate clamps at 1.0
    val some1 = CorpusFilters.tokenBudgetByRate(docs, "doc_id", "text", "source", budgetTokens = 50L)
      .collect().map(_.getLong(0)).sorted.toSeq
    val some2 = CorpusFilters.tokenBudgetByRate(docs, "doc_id", "text", "source", budgetTokens = 50L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(some1 === some2) // pure function of ids: rerun-stable
    assert(some1.toSet.subsetOf((1L to 20L).toSet))
  }

  test("hashSplit: assignment matches the md5 ground truth; stable under corpus growth") {
    val small = (1L to 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    def expected(id: Long): String = {
      val b = md5Hex(id.toString).substring(0, 4)
      if (b < "cccc") "train" else if (b < "e666") "val" else "test"
    }
    val got = CorpusFilters.hashSplit(small, "doc_id", splits)
      .select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size === 50)
    got.foreach { case (id, s) => assert(s === expected(id), s"doc $id") }
    // growth stability: the same ids keep their split in a 10x corpus
    val big = (1L to 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val bigGot = CorpusFilters.hashSplit(big, "doc_id", splits)
      .select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, s) => assert(bigGot(id) === s) }
    // fractions within binomial noise on 500 draws (p=0.8: sd~=9)
    val trainN = bigGot.values.count(_ == "train")
    assert(trainN > 360 && trainN < 440, s"train count $trainN")
    // validation
    intercept[IllegalArgumentException] {
      CorpusFilters.hashSplit(small, "doc_id", Seq(("a", 0.5), ("b", 0.4)))
    }
    intercept[IllegalArgumentException] {
      CorpusFilters.hashSplit(small, "doc_id", Seq.empty)
    }
  }

  test("packSequences: ground-truth pack boundaries per group") {
    // tokens: doc1=3, doc2=4, doc3=2, doc4=5 in group a (window 6):
    //   offsets 0,3,7,9 -> packs 0,0,1,1
    // group b: doc5=6, doc6=1 -> offsets 0,6 -> packs 0,1
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (1L, "a", words(3)), (2L, "a", words(4)), (3L, "a", words(2)), (4L, "a", words(5)),
      (5L, "b", words(6)), (6L, "b", words(1))
    ).toDF("doc_id", "source", "text")
    val got = CorpusFilters.packSequences(docs, "doc_id", "text", "source", windowTokens = 6L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(("a", 0L)) === ((2L, 7L, 1L, 2L)))
    assert(got(("a", 1L)) === ((2L, 7L, 3L, 4L)))
    assert(got(("b", 0L)) === ((1L, 6L, 5L, 5L)))
    assert(got(("b", 1L)) === ((1L, 1L, 6L, 6L)))
    assert(got.size === 4)
    intercept[IllegalArgumentException] {
      CorpusFilters.packSequences(docs, "doc_id", "text", "source", windowTokens = 0L)
    }
  }

  test("packSequences sub-sharded: full coverage, deterministic, bounded windows") {
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = (1L to 100L).map(i => (i, "crawl", words(5))).toDF("doc_id", "source", "text")
    def run() = CorpusFilters.packSequences(docs, "doc_id", "text", "source",
      windowTokens = 20L, subShards = 4)
    val a = run().collect().map(r => (r.getString(0), r.getLong(1)) ->
      ((r.getLong(2), r.getLong(3)))).toMap
    val b = run().collect().map(r => (r.getString(0), r.getLong(1)) ->
      ((r.getLong(2), r.getLong(3)))).toMap
    assert(a === b) // hash sub-sharding is a pure function of ids
    assert(a.values.map(_._1).sum === 100L) // every doc lands in exactly one pack
    // 5-token docs, 20-token window -> every full window holds exactly 4
    assert(a.values.forall { case (nDocs, toks) => nDocs <= 4 && toks === nDocs * 5 })
    // sub-shard encoding: pack ids from different shards never collide
    val shards = a.keys.map(_._2 / 1099511627776L).toSet
    assert(shards.subsetOf(Set(0L, 1L, 2L, 3L)) && shards.size > 1)
  }

  test("tfidfKeywords: hand-computed BM25-idf scores, deterministic tie-break, rank cut") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry"),
      (4L, "   ") // no tokens: dropped, and not counted in N
    ).toDF("doc_id", "text")
    val r = CorpusFilters.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .collect().map(x => (x.getLong(0), x.getLong(5)) ->
        ((x.getString(1), x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    // N=3; df: apple 1, banana 2, cherry 2
    // idf(apple) = 2.5/1.5; idf(banana) = idf(cherry) = 1.5/2.5 = 0.6
    assert(r((1L, 1L))._1 === "apple")
    assert(math.abs(r((1L, 1L))._4 - 2.0 * (2.5 / 1.5)) < 1e-15)
    assert(r((1L, 2L)) === (("banana", 1L, 2L, 1.0 * (1.5 / 2.5))))
    // d2: banana and cherry tie at 0.6 -> term asc breaks it
    assert(r((2L, 1L))._1 === "banana" && r((2L, 2L))._1 === "cherry")
    // d3: single term, no rank-2 row
    assert(r((3L, 1L))._1 === "cherry" && !r.contains((3L, 2L)))
    assert(math.abs(r((3L, 1L))._4 - 3.0 * 0.6) < 1e-15)
    intercept[IllegalArgumentException] {
      CorpusFilters.tfidfKeywords(docs, "doc_id", "text", k = 0)
    }
  }

  test("bigramNovelty: hand-computed support sums; docs without bigrams dropped") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams: "a b" x2, "b a" x1
      (2L, "a b c"),   // bigrams: "a b", "b c"
      (3L, "solo"),    // one token: no bigrams
      (4L, "")
    ).toDF("doc_id", "text")
    val r = CorpusFilters.bigramNovelty(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4)))).toMap
    assert(r.keySet === Set(1L, 2L))
    // corpus counts: "a b"->3, "b a"->1, "b c"->1
    assert(r(1L)._1 === 3L && r(1L)._2 === 7L) // 3+1+3
    assert(math.abs(r(1L)._3 - 7.0 / 3.0) < 1e-15)
    assert(math.abs(r(1L)._4 - 1.0 / 3.0) < 1e-15) // only "b a" is corpus-unique
    assert(r(2L) === ((2L, 4L, 2.0, 0.5)))         // 3+1; "b c" unique
  }

  test("bigramLogLik: add-one-smoothed NLL matches the closed form on a tiny corpus") {
    val docs = Seq((1L, "a b b")).toDF("doc_id", "text")
    val r = CorpusFilters.bigramLogLik(docs, "doc_id", "text").collect()
    assert(r.length === 1 && r(0).getLong(1) === 2L)
    // unigrams: a=1, b=2; V=2; p(a b)=(1+1)/(1+2); p(b b)=(1+1)/(2+2)
    val expected = -(math.log(2.0 / 3.0) + math.log(0.5)) / 2.0
    assert(math.abs(r(0).getDouble(2) - expected) < 1e-12)
  }

  test("curriculumOrder: easiest-first, dense deterministic rank, equal-depth bins") {
    val docs = Seq(
      (3L, "one two three"),
      (1L, "one"),
      (2L, "one two"),
      (4L, "one two three four"),
      (5L, "one two") // ties with doc 2 -> id breaks it
    ).toDF("doc_id", "text")
    val r = CorpusFilters.curriculumOrder(docs, "doc_id", "text", bins = 2)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) === ((1L, 1L, 1L)))
    assert(r(2L) === ((2L, 1L, 2L)))
    assert(r(5L) === ((2L, 1L, 3L))) // tie after doc 2 by id
    assert(r(3L) === ((3L, 2L, 4L)))
    assert(r(4L) === ((4L, 2L, 5L)))
    intercept[IllegalArgumentException] {
      CorpusFilters.curriculumOrder(docs, "doc_id", "text", bins = 0)
    }
  }

  test("bpeMerges: hand-computed merge table — counts, tie-break, overlap, exhaustion") {
    // corpus "aa ab aa": pairs (a,a)x2 (a,b)x1 -> merge1 (a,a,2);
    // then only (a,b)x1 -> merge2 (a,b,1); then no pairs -> exhausted
    val docs = Seq((1L, "aa ab aa")).toDF("doc_id", "text")
    val m = CorpusFilters.bpeMerges(docs, "text", numMerges = 5)
    assert(m === Seq((1, "a", "a", 2L), (2, "a", "b", 1L)))

    // tie at count 2 between (a,b) and (c,d): lexicographic -> (a,b) first
    val tie = Seq((1L, "ab cd ab cd")).toDF("doc_id", "text")
    val mt = CorpusFilters.bpeMerges(tie, "text", numMerges = 2)
    assert(mt === Seq((1, "a", "b", 2L), (2, "c", "d", 2L)))

    // overlap: "aaa" has (a,a)x2 but only ONE non-overlapping merge fires,
    // leaving [aa, a] -> next round merges (aa, a)
    val ov = Seq((1L, "aaa")).toDF("doc_id", "text")
    val mo = CorpusFilters.bpeMerges(ov, "text", numMerges = 3)
    assert(mo === Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))

    intercept[IllegalArgumentException] {
      CorpusFilters.bpeMerges(docs, "text", numMerges = 0)
    }
  }

  test("bpeEncode: hand-computed tokenizations — rank priority, non-overlap, roundtrip, unknown chars") {
    // merge table trained on "aa ab aa": rank1 (a,a), rank2 (a,b)
    val docs = Seq((1L, "aa ab aa")).toDF("doc_id", "text")
    val merges = CorpusFilters.bpeMerges(docs, "text", 5).map { case (_, l, r, _) => (l, r) }
    assert(merges === Seq(("a", "a"), ("a", "b")))

    val corpus = Seq(
      (1L, "aa ab"),    // [aa] [ab]
      (2L, "aaa"),      // (a,a) left-to-right non-overlap -> [aa, a]; (aa,a) not in table
      (3L, "aab"),      // rank1 first: [aa, b] — NOT [a, ab] (rank2 would lose)
      (4L, "ba xyz"),   // b,a is not a merge; unknown chars stay single
      (5L, "AA  ab ")   // lowercasing + whitespace normalization upstream
    ).toDF("doc_id", "text")
    val enc = CorpusFilters.bpeEncode(corpus, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(enc(1L) === Seq("aa", "ab"))
    assert(enc(2L) === Seq("aa", "a"))
    assert(enc(3L) === Seq("aa", "b"))
    assert(enc(4L) === Seq("b", "a", "x", "y", "z"))
    assert(enc(5L) === Seq("aa", "ab"))
    // empty merge table = character tokenizer
    val chars = CorpusFilters.bpeEncode(corpus.filter($"doc_id" === 1L), "doc_id", "text", Nil)
      .head().getSeq[String](1)
    assert(chars === Seq("a", "a", "a", "b"))
    // non-BMP chars split by CODE POINT (like the trainer), never into
    // surrogate halves; NULL text encodes to zero tokens instead of NPE
    val tricky = Seq((1L, Some("😀a")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val te = CorpusFilters.bpeEncode(tricky, "doc_id", "text", Nil)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(te(1L) === Seq("😀", "a"))
    assert(te(2L) === Seq.empty)
    // duplicated pair in a caller-supplied table: FIRST rank wins
    val dup = CorpusFilters.bpeEncode(
      Seq((1L, "abcd")).toDF("doc_id", "text"), "doc_id", "text",
      Seq(("a", "b"), ("c", "d"), ("a", "b")))
      .head().getSeq[String](1)
    assert(dup === Seq("ab", "cd"))
    // roundtrip on real docs: concatenated tokens == normalized text
    val real = spark.read.parquet(s"$sf0001/documents.parquet")
    val realMerges = CorpusFilters.bpeMerges(real, "text", 8, trainFraction = 0.2)
      .map { case (_, l, r, _) => (l, r) }
    val rt = CorpusFilters.bpeEncode(real, "doc_id", "text", realMerges)
      .join(real, "doc_id")
      .select((concat_ws("", $"bpe_tokens") ===
        concat_ws("", graft.ext.Dedup.tokens($"text"))).as("ok"))
    assert(rt.filter(!$"ok").count() === 0)
  }

  test("bpeMerges training cap: auto mode trains full on small corpora; sampling is deterministic") {
    val docs = Seq((1L, "aa ab aa")).toDF("doc_id", "text")
    // auto mode: n <= maxTrainRows -> full corpus, identical to explicit 1.0
    assert(CorpusFilters.bpeMerges(docs, "text", 5) ===
      CorpusFilters.bpeMerges(docs, "text", 5, trainFraction = 1.0))
    // content-hash sampling is seedless-deterministic: same input, same table
    val many = (1L to 60L).map(i => (i, s"w$i x$i common words here")).toDF("doc_id", "text")
    val a = CorpusFilters.bpeMerges(many, "text", 3, trainFraction = 0.5)
    val b = CorpusFilters.bpeMerges(many, "text", 3, trainFraction = 0.5)
    assert(a === b)
    assert(a.nonEmpty, "half the corpus must still produce merges")
    // auto cap engages above maxTrainRows (frac < 1 -> a strict subset
    // trains; the capped table still exists and is deterministic)
    val capped = CorpusFilters.bpeMerges(many, "text", 3, maxTrainRows = 10)
    assert(capped === CorpusFilters.bpeMerges(many, "text", 3, maxTrainRows = 10))
    intercept[IllegalArgumentException] {
      CorpusFilters.bpeMerges(docs, "text", 1, trainFraction = 1.5)
    }
    intercept[IllegalArgumentException] {
      CorpusFilters.bpeMerges(docs, "text", 1, maxTrainRows = 0)
    }
  }

  test("sourceOverlap: complete matrix incl. zero-overlap pairs; short-doc shingle fallback") {
    val docs = Seq(
      ("A", "x y z w"), // 3-grams: "x y z", "y z w"
      ("B", "x y z"),   // exactly 3 tokens: one 3-gram "x y z"
      ("C", "q")        // short doc: whole text is its own shingle
    ).toDF("source", "text")
    val r = CorpusFilters.sourceOverlap(docs, "source", "text", n = 3)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5)))).toMap
    assert(r.keySet === Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(r(("A", "B")) === ((2L, 1L, 1L, 0.5)))
    assert(r(("A", "C")) === ((2L, 1L, 0L, 0.0)))
    assert(r(("B", "C")) === ((1L, 1L, 0L, 0.0)))
  }

  test("packShards: every doc assigned once, shards contiguous in the md5 order, token-balanced") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val n = docs.count()
    val nShards = 8
    val got = CorpusFilters.packShards(docs, "doc_id", "text", nShards)
    assert(got.count() === n)                       // total assignment
    assert(got.select("doc_id").distinct().count() === n)
    val byShard = got.groupBy($"shard")
      .agg(sum($"ws_tokens").as("tok"), count(lit(1)).as("docs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byShard.keySet === (0L until nShards.toLong).toSet)
    // balance: contiguous token-mass split => each shard within one max
    // document of the ideal share
    val total = got.agg(sum($"ws_tokens")).head().getLong(0)
    val maxDoc = got.agg(max($"ws_tokens")).head().getLong(0)
    val ideal = total.toDouble / nShards
    // a shard's span can miss the ideal by at most one document on each
    // boundary
    for ((s, tok) <- byShard)
      assert(math.abs(tok - ideal) <= 2.0 * maxDoc + 1,
        s"shard $s: $tok vs ideal $ideal (maxDoc $maxDoc)")
    // layout independence (the md5 order, not file order, decides shards)
    val again = CorpusFilters.packShards(docs.repartition(13), "doc_id", "text", nShards)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    val first = got.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    assert(again === first)
    intercept[IllegalArgumentException] {
      CorpusFilters.packShards(docs, "doc_id", "text", 0)
    }
  }

  test("compressionStats: repetition compresses, bounds, empty row, layout-free") {
    val rep = "spam ham " * 200
    val varied = (1 to 200).map(i => s"w${i * 7919}x").mkString(" ")
    val df = Seq((1L, rep), (2L, varied), (3L, "")).toDF("doc_id", "text")
    val got = CorpusFilters.compressionStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    // raw sizes are exact byte counts
    assert(got(1L)._1 === rep.getBytes("UTF-8").length.toLong)
    // the repeated text compresses far harder than the varied text
    assert(got(1L)._3.get < 0.1)
    assert(got(2L)._3.get > got(1L)._3.get * 3)
    // deflate never inflates real text by much, never to zero
    assert(got(1L)._2 > 0L && got(2L)._2 > 0L)
    // empty text: 0 raw bytes, NULL ratio (guarded division)
    assert(got(3L)._1 === 0L && got(3L)._3.isEmpty)
    // deterministic under any partitioning
    val again = CorpusFilters.compressionStats(df.repartition(5), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again === got.map { case (k, v) => k -> v._2 })
    intercept[IllegalArgumentException] {
      CorpusFilters.compressionStats(df, "doc_id", "text", level = 11)
    }
  }

  test("giniMixReport: monoculture 0, uniform (k-1)/k, hand mixed case") {
    val df = (Seq.fill(10)(("mono", "en")) ++
      Seq(("uni", "en"), ("uni", "de"), ("uni", "fr"), ("uni", "ja")) ++
      Seq.fill(3)(("mix", "en")) ++ Seq.fill(1)(("mix", "de"))).toDF("src", "lang")
    val got = CorpusFilters.giniMixReport(df, "src", "lang")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("mono") === ((10L, 1L, 0.0)))
    assert(got("uni") === ((4L, 4L, 0.75)))
    // mix: 1 - (9 + 1)/16 = 0.375
    assert(got("mix") === ((4L, 2L, 0.375)))
  }

  test("jsDivergence: identical = 0 exactly, disjoint = ln 2, symmetric, bounded") {
    val a = Seq("alpha beta beta gamma", "alpha gamma").toDF("text")
    val same = CorpusFilters.jsDivergence(a, a, "text").collect().head
    assert((same.getLong(0), same.getLong(1)) === ((6L, 6L)))
    assert((same.getLong(2), same.getLong(3), same.getLong(4), same.getLong(5)) ===
      ((3L, 3L, 3L, 3L)))
    assert(same.getDouble(6) === 0.0) // p == m per token: every ln term is 0

    val b = Seq("delta epsilon delta").toDF("text")
    val disj = CorpusFilters.jsDivergence(a, b, "text").collect().head
    assert(disj.getLong(4) === 0L) // no shared vocabulary
    assert(math.abs(disj.getDouble(6) - math.log(2.0)) < 1e-12)

    val c = Seq("alpha beta delta delta").toDF("text")
    val ab = CorpusFilters.jsDivergence(a, c, "text").collect().head.getDouble(6)
    val ba = CorpusFilters.jsDivergence(c, a, "text").collect().head.getDouble(6)
    assert(math.abs(ab - ba) < 1e-12) // symmetric up to summation order
    assert(ab > 0.0 && ab < math.log(2.0)) // strictly inside for partial overlap
  }

  test("oovRate: hand-computed occurrence and type tallies") {
    val train = Seq("a b c", "a b").toDF("text")
    val incoming = Seq("a a d", "e").toDF("text")
    val got = CorpusFilters.oovRate(train, incoming, "text").collect().head
    // incoming occurrences: a,a,d,e -> 4; OOV occurrences d,e -> 2
    assert(got.getLong(0) === 4L)
    assert(got.getLong(1) === 2L)
    assert(got.getLong(2) === 3L) // incoming types {a, d, e}
    assert(got.getLong(3) === 2L) // OOV types {d, e}
    assert(got.getLong(4) === 3L) // train vocab {a, b, c}
    assert(got.getDouble(5) === 0.5)
    // full coverage -> rate 0 exactly
    assert(CorpusFilters.oovRate(train, Seq("c b").toDF("text"), "text")
      .collect().head.getDouble(5) === 0.0)
  }

  test("stratifiedSplit: exact per-stratum proportions, layout-independent") {
    val df = ((1 to 10).map(i => (i.toLong, "big")) ++
      (11 to 15).map(i => (i.toLong, "small"))).toDF("id", "src")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val got = CorpusFilters.stratifiedSplit(df, "id", "src", splits)
      .groupBy($"src", $"split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // big (n=10): floor(8)/floor(9): 8 train, 1 val, 1 test
    assert(got(("big", "train")) === 8L)
    assert(got(("big", "val")) === 1L)
    assert(got(("big", "test")) === 1L)
    // small (n=5): floor(4)=4 train, floor(4.5)=4 -> 0 val, 1 test
    assert(got(("small", "train")) === 4L)
    assert(got.getOrElse(("small", "val"), 0L) === 0L)
    assert(got(("small", "test")) === 1L)
    // assignment is a pure function of (id, stratum): partitioning-immune
    val a = CorpusFilters.stratifiedSplit(df, "id", "src", splits)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    val b = CorpusFilters.stratifiedSplit(df.repartition(7), "id", "src", splits)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(a === b)
    intercept[IllegalArgumentException] {
      CorpusFilters.stratifiedSplit(df, "id", "src", Seq(("train", 0.5)))
    }
  }

  test("jsDivergence: an empty side yields NULL score, zero tallies survive") {
    val a = Seq("alpha beta").toDF("text")
    val empty = Seq.empty[String].toDF("text")
    val got = CorpusFilters.jsDivergence(a, empty, "text").collect().head
    assert(got.getLong(0) === 2L)
    assert(got.getLong(1) === 0L)
    assert(got.isNullAt(6))
  }

  test("perplexityScore: cross-corpus closed form, incl. fully-OOV fallback") {
    val ref = Seq((1L, "a b b")).toDF("doc_id", "text")
    // target doc reuses the reference bigrams -> same NLL closed form as
    // bigramLogLik's tiny corpus; the OOV doc hits the smoothing floor
    val tgt = Seq((10L, "a b b"), (11L, "x y")).toDF("doc_id", "text")
    val r = CorpusFilters.perplexityScore(ref, tgt, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2), x.getDouble(3)))).toMap
    // unigrams a=1, b=2; V=2: p(a b)=(1+1)/(1+2), p(b b)=(1+1)/(2+2)
    val expectIn = -(math.log(2.0 / 3.0) + math.log(0.5)) / 2.0
    assert(r(10L)._1 === 2L)
    assert(math.abs(r(10L)._2 - expectIn) < 1e-12)
    assert(math.abs(r(10L)._3 - math.exp(expectIn)) < 1e-12)
    // OOV bigram (x y): c(x y)=0, c(x)=0 -> p = 1/(0+2) = 0.5
    val expectOov = -math.log(0.5)
    assert(r(11L)._1 === 1L)
    assert(math.abs(r(11L)._2 - expectOov) < 1e-12)
    // out-of-domain scores strictly worse than in-domain here
    assert(r(11L)._3 > r(10L)._3)
  }

  test("contextPack: concat-and-chunk placement, boundary spans, zero-token drop") {
    val df = Seq(
      (1L, 3L), (2L, 5L), (3L, 0L), (4L, 4L), (5L, 10L)
    ).toDF("doc_id", "n")
    // token stream (C=4): doc1 [0,3), doc2 [3,8), doc4 [8,12), doc5 [12,22)
    val r = CorpusFilters.contextPack(df, "doc_id", "n", contextLen = 4)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(!r.contains(3L)) // zero-token doc dropped
    assert(r(1L) === ((3L, 0L, 0L, 0L)))
    assert(r(2L) === ((5L, 0L, 3L, 1L))) // spans packs 0 -> 1
    assert(r(4L) === ((4L, 2L, 0L, 2L)))
    assert(r(5L) === ((10L, 3L, 0L, 5L))) // spans packs 3..5
    // partitioning-immune: the placement is a function of the total order
    val shuffled = CorpusFilters.contextPack(df.repartition(7), "doc_id", "n", 4)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(shuffled === r)
    intercept[IllegalArgumentException] { CorpusFilters.contextPack(df, "doc_id", "n", 0) }
  }

  test("dsirWeights: target-domain docs outweigh off-domain docs") {
    val target = (0L until 20L).map(i => (i, "stellar fusion plasma core stellar plasma"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (100L, "stellar fusion plasma core"), // in-domain
      (101L, "cheap shoes discount sale buy now"), // off-domain
      (102L, "stellar plasma core fusion stellar")) // in-domain
      .toDF("doc_id", "text")
    val r = CorpusFilters.dsirWeights(target, raw, "doc_id", "text", buckets = 256)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(100L) > r(101L))
    assert(r(102L) > r(101L))
    intercept[IllegalArgumentException] {
      CorpusFilters.dsirWeights(target, raw, "doc_id", "text", buckets = 1)
    }
  }

  test("dsirWeights: hand-computed log-ratio on a collision-free tiny corpus") {
    val target = Seq((1L, "aa bb")).toDF("doc_id", "text")
    val raw = Seq((10L, "aa cc")).toDF("doc_id", "text")
    val B = 4096
    // target feats: aa, bb, "aa bb" (3 total); raw feats: aa, cc, "aa cc"
    val r = CorpusFilters.dsirWeights(target, raw, "doc_id", "text", buckets = B)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    def lr(ct: Long, cr: Long) =
      math.log((ct + 1.0) / (3.0 + B)) - math.log((cr + 1.0) / (3.0 + B))
    // aa: ct=1, cr=1; cc: ct=0, cr=1; "aa cc": ct=0, cr=1
    val expect = lr(1, 1) + lr(0, 1) + lr(0, 1)
    assert(r(10L)._1 === 3L)
    assert(math.abs(r(10L)._2 - expect) < 1e-12)
  }

  test("perplexityScore: natural text beats scrambled gibberish from the same letters") {
    val natural = (0L until 30L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog and the quick cat"))
    val ref = natural.toDF("doc_id", "text")
    val tgt = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "dog the over quick lazy the brown jumps fox")).toDF("doc_id", "text")
    val r = CorpusFilters.perplexityScore(ref, tgt, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(100L) < r(101L),
      s"natural ${r(100L)} should score below scrambled ${r(101L)}")
  }
}
