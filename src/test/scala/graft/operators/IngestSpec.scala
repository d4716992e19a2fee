package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import graft.SparkSpec

class IngestSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("upsert: updates replace matched keys, new keys append, unmatched base survives") {
    val updates = docs.filter($"doc_id" % 10 === 0)
      .withColumn("text", upper($"text"))
      .unionByName(docs.filter($"doc_id" === 1)
        .withColumn("doc_id", $"doc_id" + 5000L).withColumn("text", lit("brand new")))
    val merged = Ingest.upsert(docs, updates, Seq("doc_id"))
    assert(merged.count() === docs.count() + 1) // replaced in place, one appended
    // a replaced key carries the update's text
    val replaced = merged.filter($"doc_id" === 0).select($"text").as[String].head()
    assert(replaced === replaced.toUpperCase)
    // an untouched key keeps the base text
    val kept = merged.filter($"doc_id" === 1).select($"text").as[String].head()
    assert(kept === docs.filter($"doc_id" === 1).select($"text").as[String].head())
    assert(merged.filter($"doc_id" === 5001L).count() === 1)
    assert(merged.schema === docs.schema)
  }

  test("upsert: NULL key components match null-safely (MERGE semantics)") {
    val base = Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c"))
      .toDF("k", "v")
    val updates = Seq((Option.empty[Long], "B2")).toDF("k", "v")
    val merged = Ingest.upsert(base, updates, Seq("k")).as[(Option[Long], String)]
      .collect().toSet
    // the NULL-keyed base row is REPLACED, not duplicated
    assert(merged === Set((Some(1L), "a"), (None, "B2"), (Some(2L), "c")))
  }

  test("upsert: huge base side is not shuffled (anti join broadcasts the update keys)") {
    val updates = docs.filter($"doc_id" % 10 === 0)
    val plan = Ingest.upsert(docs, updates, Seq("doc_id")).queryExecution.executedPlan
    def findBroadcastAnti(p: SparkPlan): Boolean =
      collectWithSubqueries(p) {
        case b: BroadcastHashJoinExec
          if b.joinType.toString.toLowerCase.contains("anti") => b
      }.nonEmpty
    assert(findBroadcastAnti(plan),
      s"expected a broadcast LeftAnti join, got:\n${plan.toString.take(2000)}")
  }

  test("mergeRows: matched update/delete branches, pass-through, unmatched inserts with typed NULLs") {
    import org.apache.spark.sql.functions.{col, lit}
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("k", "name", "v")
    val source = Seq((1L, 100L, false), (2L, 0L, true), (5L, 500L, false))
      .toDF("k", "bump", "kill")
    val out = Ingest.mergeRows(base, source, Seq("k"),
      whenMatchedSet = Map("v" -> (col("v") + col("src_bump"))),
      whenMatchedDelete = Some(col("src_kill")),
      insertUnmatched = true)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out === Set(
      (1L, Some("a"), 110L),   // matched update: v += src_bump
      // k=2 matched-deleted
      (3L, Some("c"), 30L),    // unmatched base passes through
      (4L, Some("d"), 40L),
      (5L, None, -1L)))        // unmatched source inserts; name/v are NULL
    // insertUnmatched = false drops k=5; setting a key column refuses
    assert(Ingest.mergeRows(base, source, Seq("k"),
      Map("v" -> (col("v") + col("src_bump"))), Some(col("src_kill")),
      insertUnmatched = false).count() === 3)
    intercept[IllegalArgumentException] {
      Ingest.mergeRows(base, source, Seq("k"), Map("k" -> lit(9L)))
    }
  }

  test("snapshotDiff: added/removed/changed/unchanged classification") {
    val newV = docs.filter($"doc_id" % 7 =!= 0)
      .withColumn("text",
        when($"doc_id" % 5 === 0, concat($"text", lit(" v2"))).otherwise($"text"))
      .unionByName(docs.filter($"doc_id" === 3)
        .withColumn("doc_id", $"doc_id" + 9000L).withColumn("text", lit("x")))
    val diff = Ingest.snapshotDiff(docs, newV, Seq("doc_id"), md5($"text".cast("binary")))
    val byStatus = diff.groupBy($"status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    val removed = docs.filter($"doc_id" % 7 === 0).count()
    val changed = docs.filter($"doc_id" % 7 =!= 0 && $"doc_id" % 5 === 0).count()
    assert(byStatus.getOrElse("removed", 0L) === removed)
    assert(byStatus.getOrElse("added", 0L) === 1L)
    assert(byStatus.getOrElse("changed", 0L) === changed)
    assert(byStatus.getOrElse("unchanged", 0L) === n - removed - changed)
    // per-key sanity: a specific changed key
    assert(diff.filter($"doc_id" === 5 && $"status" === "changed").count() === 1)
  }

  test("snapshotDiff: NULL fingerprints do not masquerade as added/removed") {
    // key 1: NULL -> 'x' (changed); key 2: NULL -> NULL (unchanged);
    // key 3 only in old (removed) — presence must come from the key sides,
    // never from fingerprint nullness
    val oldV = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Some("z"))).toDF("k", "v")
    val newV = Seq((1L, Some("x")), (2L, Option.empty[String])).toDF("k", "v")
    val diff = Ingest.snapshotDiff(oldV, newV, Seq("k"), md5($"v".cast("binary")))
      .as[(Long, String)].collect().toMap
    assert(diff === Map(1L -> "changed", 2L -> "unchanged", 3L -> "removed"))
  }

  test("snapshotDiff: NULL keys pair up null-safely instead of double-counting") {
    val oldV = Seq((Some(1L), "a"), (None, "b")).toDF("k", "v")
    val newV = Seq((Some(1L), "a"), (None, "b2")).toDF("k", "v")
    val diff = Ingest.snapshotDiff(oldV, newV, Seq("k"), md5($"v".cast("binary")))
    val rows = diff.as[(Option[Long], String)].collect().toSet
    assert(rows === Set((Some(1L), "unchanged"), (None, "changed")))
  }

  // ---- mergeAggState ------------------------------------------------------

  test("mergeAggState: merged state equals a from-scratch re-aggregation") {
    val base = Seq(("a", 1L, 10L), ("a", 1L, 20L), ("b", 1L, 5L)).toDF("g", "n", "s")
    val delta = Seq(("a", 1L, 7L), ("c", 1L, 1L)).toDF("g", "n", "s")
    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"g").agg(sum($"n").as("n"), sum($"s").as("s"))
    val merged = Ingest.mergeAggState(aggOf(base), aggOf(delta), Seq("g"))
      .as[(String, Long, Long)].collect().toSet
    val scratch = aggOf(base.unionByName(delta))
      .as[(String, Long, Long)].collect().toSet
    assert(merged === scratch)
    assert(merged === Set(("a", 3L, 37L), ("b", 1L, 5L), ("c", 1L, 1L)))
  }

  test("mergeAggState: schema mismatch and value-free state fail fast") {
    val st = Seq(("a", 1L)).toDF("g", "n")
    intercept[IllegalArgumentException] {
      Ingest.mergeAggState(st, Seq(("a", 1L)).toDF("g", "m"), Seq("g"))
    }
    intercept[IllegalArgumentException] {
      Ingest.mergeAggState(st.select("g"), st.select("g"), Seq("g"))
    }
  }

  // ---- cdcApply -----------------------------------------------------------

  // (key, version, op, payload)
  private lazy val feed = Seq(
    (1L, 1L, "U", "a1"), (1L, 3L, "U", "a3"), (1L, 2L, "U", "a2"), // out of order; v3 wins
    (2L, 1L, "U", "b1"), (2L, 2L, "D", ""),                        // tombstoned
    (3L, 5L, "D", ""), (3L, 6L, "U", "c6"),                        // resurrected after delete
    (4L, 9L, "U", "d9")                                            // single insert
  ).toDF("k", "v", "op", "payload")

  test("cdcApply: highest version wins per key, out of order") {
    val got = Ingest.cdcApply(feed, Seq("k"), Seq($"v"), "op")
      .select("k", "v", "payload").as[(Long, Long, String)].collect().toSet
    assert(got === Set((1L, 3L, "a3"), (3L, 6L, "c6"), (4L, 9L, "d9")))
  }

  test("cdcApply: a tombstone as latest change kills the key") {
    val got = Ingest.cdcApply(feed, Seq("k"), Seq($"v"), "op")
    assert(got.filter($"k" === 2L).isEmpty)
  }

  test("cdcApply: tie-breaker column makes same-version changes deterministic") {
    val ties = Seq((1L, 1L, 10L, "U", "lo"), (1L, 1L, 20L, "U", "hi"))
      .toDF("k", "v", "seq", "op", "payload")
    val got = Ingest.cdcApply(ties, Seq("k"), Seq($"v", $"seq"), "op")
      .select("payload").as[String].collect().toSeq
    assert(got === Seq("hi"))
  }

  test("mergeRows: duplicate MATCHED source keys fail loudly (SQL MERGE cardinality violation)") {
    val base = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    // two source rows match base key 1: silent fan-out would duplicate the
    // target row — must raise instead (ADVICE r9)
    val dupMatched = Seq((1L, 100L), (1L, 101L), (3L, 300L)).toDF("k", "v")
    val e = intercept[Exception] {
      Ingest.mergeRows(base, dupMatched, Seq("k"),
        Map("v" -> col("src_v"))).collect()
    }
    assert(e.getMessage.contains("multiple source rows match") ||
      Option(e.getCause).exists(_.getMessage.contains("multiple source rows match")),
      s"unexpected error: ${e.getMessage}")
    // duplicate UNMATCHED source keys are legal WHEN-NOT-MATCHED inserts
    val dupUnmatched = Seq((5L, 500L), (5L, 501L)).toDF("k", "v")
    val out = Ingest.mergeRows(base, dupUnmatched, Seq("k"),
      Map("v" -> col("src_v"))).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 10L), (2L, 20L), (5L, 500L), (5L, 501L)))
    // the guard survives an EMPTY SET clause (insert-if-absent merge): no
    // downstream projection may prune it away
    val e2 = intercept[Exception] {
      Ingest.mergeRows(base, dupMatched, Seq("k"), Map.empty).collect()
    }
    assert(e2.getMessage.contains("multiple source rows match") ||
      Option(e2.getCause).exists(_.getMessage.contains("multiple source rows match")),
      s"unexpected error: ${e2.getMessage}")
    // and insert-if-absent itself stays correct with unique keys
    val iia = Ingest.mergeRows(base, Seq((1L, 100L), (5L, 500L)).toDF("k", "v"),
      Seq("k"), Map.empty).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(iia === Set((1L, 10L), (2L, 20L), (5L, 500L)))
  }

  test("mergeRows cardinality guard survives column pruning: .select(otherCol) and aggregates still raise") {
    // r10 ADVICE: the guard used to ride output column 0 only — Catalyst
    // prunes the first column like any other, so a downstream projection
    // keeping only `v` (or an aggregate over it) silently disabled the
    // guard and emitted multiplied rows. Enforced as a Filter node now.
    val base = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val dupMatched = Seq((1L, 100L), (1L, 101L)).toDF("k", "v")
    val merged = Ingest.mergeRows(base, dupMatched, Seq("k"), Map("v" -> col("src_v")))
    val e1 = intercept[Exception] { merged.select(col("v")).collect() }
    assert(e1.getMessage.contains("multiple source rows match") ||
      Option(e1.getCause).exists(_.getMessage.contains("multiple source rows match")),
      s"pruned projection disabled the guard: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      merged.agg(sum(col("v"))).collect()
    }
    assert(e2.getMessage.contains("multiple source rows match") ||
      Option(e2.getCause).exists(_.getMessage.contains("multiple source rows match")),
      s"aggregate disabled the guard: ${e2.getMessage}")
    val e3 = intercept[Exception] { merged.count() }
    assert(e3.getMessage.contains("multiple source rows match") ||
      Option(e3.getCause).exists(_.getMessage.contains("multiple source rows match")),
      s"count() disabled the guard: ${e3.getMessage}")
  }
}
