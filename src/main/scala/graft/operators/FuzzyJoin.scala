package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exact edit-distance similarity join (record linkage / fuzzy key join),
 * partition-filtered in the PassJoin style (Li, Deng, Feng, ICDE 2011,
 * "PASS-JOIN: a partition-based method for similarity joins"). The
 * reference engine has exactly one join and it is exact-equality
 * (/root/reference/src/bin/join.rs:39-127); fuzzy matching is extension
 * surface, built the Spark-first way: every stage is a codegen'd
 * generator/projection and the only shuffles are equi-joins on small
 * derived keys — never an all-pairs comparison.
 *
 * Algorithm (exact, no candidate loss):
 *  - index side: each key of length L splits into `maxDist + 1` contiguous
 *    segments (pigeonhole: ≤ maxDist edits leave at least one segment
 *    untouched);
 *  - probe side: each key enumerates, for every compatible index length
 *    L' ∈ [L−d, L+d] and segment ordinal, the substrings that could equal
 *    that untouched segment — same length, start shifted by at most d
 *    (the PassJoin shift bound);
 *  - candidates = equi-join on (indexLength, segmentOrdinal, segmentText),
 *    verified streaming with the banded threshold `levenshtein`, and only
 *    then deduplicated to distinct pairs.
 *
 * Scale shape: index fan-out is d+1 rows/key, probe fan-out ≤
 * (2d+1)²·(d+1) rows/key — constants, not data-dependent. Candidate volume
 * is Σ_blocks |index block|·|probe block|: it is governed by SEGMENT
 * ENTROPY, so the key choice matters. Keys sharing a long constant prefix
 * (URLs, `Customer#0000…` ids) put every row in one block; `reverseKeys`
 * re-blocks on the reversed strings — edit distance is reversal-invariant,
 * so the join stays exact while the distinctive suffix drives the
 * blocking. Residual hot blocks cost one cheap codegen verify per
 * candidate, fully parallel, with no candidate-level shuffle (see the
 * verify-before-dedup note below) — measured 3.1x for 10x data with 90%
 * of keys in one block (SCALEPROBE_r4.md).
 */
object FuzzyJoin {

  /**
   * All pairs (left row, right row) with `levenshtein(leftKey, rightKey) <=
   * maxDist`. Output: (id_a, id_b, key_a, key_b, dist). For a self-join
   * pass the same frame twice and `selfPairs = true` to keep only
   * `id_a < id_b`.
   */
  def join(
      left: DataFrame, leftId: String, leftKey: String,
      right: DataFrame, rightId: String, rightKey: String,
      maxDist: Int, reverseKeys: Boolean = false,
      selfPairs: Boolean = false): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val d = maxDist
    val nSeg = d + 1
    def blockKey(c: org.apache.spark.sql.Column) = if (reverseKeys) reverse(c) else c

    // index side: d+1 positional segments of the (possibly reversed) key.
    // Segment i of a length-L key covers [i*L/(d+1), (i+1)*L/(d+1)) — the
    // floor-division scheme both sides recompute identically.
    val idx = right.select(col(rightId).as("id_b"), col(rightKey).as("key_b"))
      .filter(col("key_b").isNotNull)
      .withColumn("__bk", blockKey(col("key_b")))
      .withColumn("__lb", length(col("__bk")))
      .select(col("id_b"), col("key_b"), col("__lb"),
        explode(transform(sequence(lit(0), lit(d)), i =>
          struct(
            i.as("seg"),
            floor(i * col("__lb") / nSeg).cast("int").as("start"),
            (floor((i + 1) * col("__lb") / nSeg) - floor(i * col("__lb") / nSeg))
              .cast("int").as("len")))).as("__s"),
        col("__bk"))
      .select(col("id_b"), col("key_b"), col("__lb").as("lb"),
        col("__s.seg").as("seg"),
        col("__bk").substr(col("__s.start") + 1, col("__s.len")).as("segtext"))

    // probe side: for every compatible index length lb = la + delta and
    // segment ordinal, the substrings of the probe key with that segment's
    // length, starting within the ±d PassJoin shift window.
    val probe = left.select(col(leftId).as("id_a"), col(leftKey).as("key_a"))
      .filter(col("key_a").isNotNull)
      .withColumn("__ak", blockKey(col("key_a")))
      .withColumn("__la", length(col("__ak")))
      .withColumn("__delta", explode(sequence(lit(-d), lit(d))))
      .withColumn("lb", col("__la") + col("__delta"))
      .filter(col("lb") >= 0)
      .withColumn("seg", explode(sequence(lit(0), lit(d))))
      .withColumn("__start", floor(col("seg") * col("lb") / nSeg).cast("int"))
      .withColumn("__len",
        (floor((col("seg") + 1) * col("lb") / nSeg) - floor(col("seg") * col("lb") / nSeg))
          .cast("int"))
      // empty window when the bounds cross (sequence(a,b) would otherwise
      // DESCEND for a > b and emit junk positions)
      .withColumn("__lo", greatest(col("__start") - d, lit(0)))
      .withColumn("__hi", least(col("__start") + d, col("__la") - col("__len")))
      .withColumn("__p", explode(
        when(col("__lo") <= col("__hi"), sequence(col("__lo"), col("__hi")))
          .otherwise(array().cast("array<int>"))))
      .select(col("id_a"), col("key_a"), col("lb"), col("seg"),
        col("__ak").substr(col("__p") + 1, col("__len")).as("segtext"))

    // Verify BEFORE dedup: keys ride through the block join so the
    // levenshtein filter runs streaming on the join output — candidates
    // never hit a shuffle. This is the hot-block defense: a low-entropy
    // segment shared by most keys (a constant "Customer#"/URL-host region)
    // makes candidate volume quadratic in the block, and deduplicating
    // candidates FIRST would shuffle that quadratic set; verifying first
    // costs one cheap codegen levenshtein per candidate (embarrassingly
    // parallel, no data movement) and only TRUE pairs — output-sized, at
    // most (d+1)x duplicated across matching segments — reach the distinct.
    val pairCond = if (selfPairs) col("id_a") < col("id_b") else lit(true)
    // spread the probe fan-out across the session's full parallelism: a
    // compact input (one parquet file) would otherwise put EVERY candidate
    // of a hot block on one core — candidate production, not data volume,
    // is the cost to parallelize
    val target = left.sparkSession.sessionState.conf.numShufflePartitions
    val probeSpread =
      if (probe.rdd.getNumPartitions < target) probe.repartition(target) else probe
    probeSpread.join(idx, Seq("lb", "seg", "segtext"))
      .filter(pairCond)
      // banded threshold levenshtein: O(len·d) with early exit (-1 when the
      // band overflows) instead of the full O(len²) DP — the verify runs
      // once per CANDIDATE, so its constant factor is the hot-block cost
      .withColumn("dist", levenshtein(col("key_a"), col("key_b"), d).cast("long"))
      .filter(col("dist") =!= -1L)
      .select(col("id_a"), col("id_b"), col("key_a"), col("key_b"), col("dist"))
      .distinct()
  }
}
