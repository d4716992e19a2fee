package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CdcAlgo, CdcChunks, CdcFunctions}
import org.apache.spark.unsafe.types.UTF8String
import graft.ext.Dedup

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(s: String, minLen: Int = 32, maxLen: Int = 256, maskBits: Int = 5) = {
    val arr = CdcAlgo.chunks(UTF8String.fromString(s), minLen, maxLen, maskBits)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
  }

  private def sampleText(n: Int): String =
    (1 to n).map(i => s"word${i % 97}tok${(i * 31) % 53}").mkString(" ")

  test("chunks exactly tile the input; length bounds hold; deterministic") {
    val text = sampleText(400)
    val ch = chunksOf(text)
    assert(ch.nonEmpty)
    // contiguous tiling of the byte range
    assert(ch.head._1 === 0L)
    ch.sliding(2).foreach {
      case Seq((s1, l1, _), (s2, _, _)) => assert(s1 + l1 === s2)
      case _ =>
    }
    assert(ch.last._1 + ch.last._2 === text.getBytes("UTF-8").length.toLong)
    // max bound always; min bound for all but the forced final chunk
    assert(ch.forall(_._2 <= 256L))
    assert(ch.init.forall(_._2 >= 32L))
    assert(chunksOf(text) === ch) // pure function
    assert(chunksOf("") === Seq.empty)
  }

  test("edit re-alignment: a prefix insertion preserves most chunk hashes") {
    val text = sampleText(800)
    val edited = "INSERTED PREFIX zz " + text
    val a = chunksOf(text).map(_._3)
    val b = chunksOf(edited).map(_._3).toSet
    val kept = a.count(b.contains).toDouble / a.size
    assert(kept >= 0.7, s"only ${(kept * 100).round}% of chunk hashes survive a prefix edit")
    // the contrast that motivates CDC: fixed-width chunking keeps ~nothing
    def fixed(s: String) = s.getBytes("UTF-8").grouped(128).map(x => new String(x, "UTF-8")).toSeq
    val fixedKept = fixed(text).count(fixed(edited).toSet.contains).toDouble / fixed(text).size
    assert(fixedKept < kept)
  }

  test("cdcChunkShared: identical docs share everything, disjoint docs nothing") {
    val common = sampleText(300)
    val docs = Seq(
      (1L, common), (2L, common), // exact dups
      (3L, (1 to 300).map(i => s"zq${i}xw${i * 7}").mkString(" ")) // disjoint content
    ).toDF("doc_id", "text")
    val r = Dedup.cdcChunkShared(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L)._3 === 1.0 && r(2L)._3 === 1.0)
    assert(r(3L)._2 === 0L && r(3L)._3 === 0.0)
    assert(r(1L)._1 === r(2L)._1) // same chunking for same text
  }

  test("kernel validates its parameters") {
    def e = org.apache.spark.sql.graft.ColumnBridge.expression(lit("x"))
    intercept[IllegalArgumentException] { CdcChunks(e, 0, 10, 5) }
    intercept[IllegalArgumentException] { CdcChunks(e, 20, 10, 5) }
    intercept[IllegalArgumentException] { CdcChunks(e, 1, 10, 0) }
  }

  test("expression works inside a DataFrame plan (codegen path)") {
    val df = Seq((1L, sampleText(200)), (2L, "")).toDF("doc_id", "text")
      .select($"doc_id", explode(CdcFunctions.cdc_chunks($"text", 32, 256, 5)).as("c"))
      .select($"doc_id", $"c.start", $"c.len", $"c.hash")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(0) === 1L)) // empty doc -> no chunks
  }
}
