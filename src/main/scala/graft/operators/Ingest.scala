package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Incremental-corpus maintenance operators: keyed upsert (refresh a corpus
 * snapshot with a batch of new/updated documents) and snapshot diff
 * (classify what changed between two corpus versions). Both are the batch
 * complements of the streaming ingest gate (StreamGate.ingestFilter) and
 * the fingerprint-keyed incremental dedup (Dedup.incrementalIngest).
 *
 * No counterpart exists in the reference (its sink is write-once,
 * /root/reference/src/lib.rs:13-134); these are the operations a living
 * 100 TB corpus needs between training runs.
 */
object Ingest {

  /**
   * Keyed upsert: rows of `updates` replace base rows with the same key;
   * unmatched base rows pass through; new keys append. SCD-type-1 /
   * MERGE-INTO-matched-update semantics, as a plan:
   *
   *   base ANTI-JOIN updates (null-safe on the keys)  UNION ALL  updates
   *
   * The 100 TB shape is the point: the huge base side is NEVER shuffled —
   * when `updates` is broadcast-small (the daily refresh case) the anti
   * join is a broadcast hash join and the whole upsert is one scan over
   * base; a groupBy/window merge would shuffle every base byte instead.
   * NULL key components match null-safely (a NULL-keyed update replaces
   * the NULL-keyed base row, like MERGE's IS NOT DISTINCT FROM).
   *
   * Keys should be unique within each input (corpus snapshots are keyed by
   * doc id); duplicate update keys all survive, duplicates in base are all
   * replaced together.
   */
  def upsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    val missing = keyCols.filterNot(base.columns.contains) ++
      keyCols.filterNot(updates.columns.contains)
    require(missing.isEmpty, s"key columns not present in both inputs: ${missing.distinct.mkString(", ")}; " +
      s"base has [${base.columns.mkString(", ")}], updates has [${updates.columns.mkString(", ")}]")
    // anti-join base against the update KEYS only (renamed to side-local
    // names): broadcasts just the key columns, and never trips the
    // ambiguous-self-join analysis when updates derive from base itself
    val renamed = keyCols.map(k => k -> s"__graft_uk_$k")
    val updateKeys = updates.select(renamed.map { case (k, a) => col(k).as(a) }: _*).distinct()
    val cond = renamed.map { case (k, a) => col(k) <=> col(a) }.reduce(_ && _)
    base.join(updateKeys, cond, "left_anti")
      .unionByName(updates.select(base.columns.map(col).toSeq: _*))
  }

  /**
   * Generalized MERGE (the SQL MERGE INTO row transform, Delta's
   * whenMatched/whenNotMatched shape): for each base row sharing a key
   * (null-safe) with a source row — MATCHED — the row DROPS when
   * `whenMatchedDelete` holds, otherwise the columns named in
   * `whenMatchedSet` recompute (every other column passes through);
   * unmatched base rows pass through untouched; unmatched SOURCE rows
   * insert when `insertUnmatched` (missing non-key columns surface as
   * typed NULLs). SET expressions and the delete predicate see the base
   * row's columns under their own names and the source row's columns as
   * `src_<name>`.
   *
   * Plan shape, which is the point at 100 TB: base joins the source ONCE
   * (broadcast when the source is daily-merge small — base never
   * shuffles) plus one anti-join for the inserts; no window over base.
   * Duplicate source keys that MATCH a base row fail loudly at execution
   * time (SQL MERGE's and Delta's multiple-source-rows-match cardinality
   * violation — silently multiplying target rows on a transactional
   * surface is corruption, ADVICE r9); duplicate UNMATCHED source keys
   * all insert, like WHEN NOT MATCHED INSERT. The guard costs one window
   * count over the SOURCE side only — the small side by design.
   */
  def mergeRows(base: DataFrame, source: DataFrame, keyCols: Seq[String],
      whenMatchedSet: Map[String, org.apache.spark.sql.Column],
      whenMatchedDelete: Option[org.apache.spark.sql.Column] = None,
      insertUnmatched: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    val missing = keyCols.filterNot(base.columns.contains) ++
      keyCols.filterNot(source.columns.contains)
    require(missing.isEmpty,
      s"key columns not present in both inputs: ${missing.distinct.mkString(", ")}")
    val badSet = whenMatchedSet.keys.filterNot(base.columns.contains)
    require(badSet.isEmpty, s"whenMatchedSet names unknown columns: ${badSet.mkString(", ")}")
    require(!whenMatchedSet.keys.exists(keyCols.contains),
      "whenMatchedSet must not rewrite a key column — that is a delete+insert")
    val srcW = Window.partitionBy(keyCols.map(k => col(s"src_$k")): _*)
    val src = source.select(source.columns.map(c => col(c).as(s"src_$c")).toSeq: _*)
      .withColumn("__graft_matched", lit(true))
      .withColumn("__graft_srcdup", count(lit(1)).over(srcW))
    val cond = keyCols.map(k => col(k) <=> col(s"src_$k")).reduce(_ && _)
    val joined = base.join(src, cond, "left_outer")
    val matched = col("__graft_matched").isNotNull
    // cardinality guard: a base row matched by >1 source row is a MERGE
    // error, not a fan-out — evaluated on the joined rows so unmatched
    // duplicate source keys (legal inserts) never trip it. Enforced as a
    // FILTER node (not a projected column): column pruning can elide any
    // output column — including column 0, under e.g. a downstream
    // .select(otherCol) or an aggregate over other columns (r10 ADVICE) —
    // but an operator in the plan survives every projection, so the guard
    // fires per joined row no matter what the caller keeps
    val guard = matched && col("__graft_srcdup") > 1
    val survivors = (whenMatchedDelete match {
      case Some(d) => joined.filter(!coalesce(matched && d, lit(false)))
      case None => joined
    }).filter(
      when(guard, raise_error(concat(
        lit("mergeRows: multiple source rows match one target row on keys ("),
        lit(keyCols.mkString(", ")),
        lit(") — SQL MERGE cardinality violation; de-duplicate the source"))))
        .otherwise(lit(true)))
    val updated = survivors.select(base.columns.map { c =>
      val v = whenMatchedSet.get(c) match {
        case Some(expr) => when(matched, expr).otherwise(col(c))
        case None => col(c)
      }
      v.as(c)
    }.toSeq: _*)
    if (!insertUnmatched) updated
    else {
      val renamed = keyCols.map(k => k -> s"__graft_mk_$k")
      val baseKeys = base.select(renamed.map { case (k, a) => col(k).as(a) }: _*).distinct()
      val acond = renamed.map { case (k, a) => col(k) <=> col(a) }.reduce(_ && _)
      val inserts = source.join(baseKeys, acond, "left_anti")
        .select(base.schema.map(f =>
          if (source.columns.contains(f.name)) col(f.name)
          else lit(null).cast(f.dataType).as(f.name)): _*)
      updated.unionByName(inserts)
    }
  }

  /**
   * Mergeable aggregate-state maintenance — the materialized-view refresh
   * primitive. `state` holds a keyed table of ADDITIVE statistics (counts,
   * sums, integer cents; anything where merge = +); `deltaState` is the
   * same shape aggregated over only the new rows. The maintained state is
   * `union → groupBy keys → sum every value column` — identical to a
   * from-scratch re-aggregation over base ∪ delta (the q257 oracle pins
   * that identity), at the cost of touching |state| + |delta groups| rows
   * instead of every base byte.
   *
   * This is the table-level face of the engine's map-side-combine
   * discipline: an aggregation whose per-group state is additive can be
   * maintained forever without revisiting history — the daily-rollup /
   * petabyte-fact pattern. Non-additive statistics (min/max survive union
   * + re-min; averages must ride as (sum, n) pairs; distinct counts as
   * mergeable sketches, see BloomFilterSketch/ApproxSketch) are the
   * caller's modeling job; every value column here must be numeric.
   */
  def mergeAggState(
      state: DataFrame, deltaState: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    require(state.columns.sorted.sameElements(deltaState.columns.sorted),
      s"state and delta schemas differ: [${state.columns.mkString(", ")}] vs " +
        s"[${deltaState.columns.mkString(", ")}]")
    val valueCols = state.columns.filterNot(keyCols.contains)
    require(valueCols.nonEmpty, "state must have at least one value column")
    state.unionByName(deltaState)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(valueCols.head)).as(valueCols.head),
        valueCols.tail.map(c => sum(col(c)).as(c)): _*)
  }

  /**
   * Snapshot diff: per-key change classification between two corpus
   * versions — `added` (key only in new), `removed` (key only in old),
   * `changed` (key in both, fingerprint differs), `unchanged`. The
   * fingerprint expression is evaluated on each side (pass a content hash,
   * e.g. `md5(text)`, or a version/etag column).
   *
   * One full-outer hash join on the key — both sides shuffle once on the
   * key and nothing else moves (fingerprints are fixed-width; document
   * bytes stay in place). Null-safe on the keys. Output: key columns +
   * `status`; aggregate downstream for a summary
   * (`.groupBy("status").count()`).
   */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      fingerprint: org.apache.spark.sql.Column): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    // distinct side-local column names (not df("col") references): the two
    // sides often derive from the SAME Dataset (version snapshots of one
    // table), which trips Spark's ambiguous-self-join analysis otherwise.
    // Key presence is tracked with explicit marker columns — inferring it
    // from fingerprint nullness would misclassify a matched key whose
    // fingerprint expression evaluates to NULL (e.g. md5 of a NULL text)
    // as added/removed.
    val o = oldDf.select(keyCols.map(k => col(k).as(s"__graft_ok_$k")) :+
      fingerprint.as("__graft_fp_old") :+ lit(true).as("__graft_in_old"): _*)
    val n = newDf.select(keyCols.map(k => col(k).as(s"__graft_nk_$k")) :+
      fingerprint.as("__graft_fp_new") :+ lit(true).as("__graft_in_new"): _*)
    val cond = keyCols.map(k => col(s"__graft_ok_$k") <=> col(s"__graft_nk_$k")).reduce(_ && _)
    val joined = o.join(n, cond, "full_outer")
    joined.select(
      keyCols.map(k => coalesce(col(s"__graft_ok_$k"), col(s"__graft_nk_$k")).as(k)) :+
        when(col("__graft_in_old").isNull, lit("added"))
          .when(col("__graft_in_new").isNull, lit("removed"))
          .when(col("__graft_fp_old") <=> col("__graft_fp_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"): _*)
  }

  /**
   * CDC change-feed apply: collapse an out-of-order stream of keyed change
   * rows (upserts + tombstones) into the live snapshot — per key, the row
   * with the highest `orderCols` wins; if that winner's `opCol` equals
   * `deleteOp` the key is dead and emits nothing. The Delta/Iceberg
   * merge-on-read compaction semantics, as one plan.
   *
   * `orderCols` must totally order each key's changes (version + a unique
   * tie-breaker) or the winner is nondeterministic. The window partitions
   * by key — one hash shuffle, per-key sorts bounded by that key's change
   * count; a hot key with millions of updates is the one skew risk (gate
   * with SkewJoin-style salting upstream, keeping only each salt's max,
   * before the final per-key pick).
   */
  def cdcApply(
      changes: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      opCol: String,
      deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    require(orderCols.nonEmpty, "orderCols must not be empty")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(_.desc): _*)
    changes.withColumn("__cdc_rn", row_number().over(w))
      .filter(col("__cdc_rn") === 1 && col(opCol) =!= deleteOp)
      .drop("__cdc_rn")
  }
}
