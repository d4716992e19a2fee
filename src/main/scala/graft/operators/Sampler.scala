package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/**
 * Uniform random sampling of a table.
 *
 * Reference semantics (/root/reference/src/bin/sample.rs):
 *  - exact-count without replacement: `sample_size = floor(num_rows * ratio)`
 *    (sample.rs:37), distinct row positions drawn by rejection into a
 *    HashSet (sample.rs:41-46), then one merge scan (sample.rs:56-79).
 *  - `ratio > 1.0` never terminates (sample.rs:43-46) — we reject it.
 *  - no seed (`thread_rng`, sample.rs:42) — we REQUIRE one, otherwise no
 *    correctness oracle is possible.
 *  - the whole sample is buffered in driver RAM (sample.rs:56) — we never do
 *    that; everything below stays distributed.
 *
 * Two modes:
 *  - [[bernoulli]]: Spark's native `df.sample` — binomial output size,
 *    the documented approximate fast path (single scan, no shuffle).
 *  - [[exact]] / [[exactN]]: exact output cardinality at scale via ScaSRS
 *    (Meng, "Scalable Simple Random Sampling and Stratified Sampling",
 *    ICML 2013): tag rows with u ~ U[0,1), keep the n smallest. A
 *    high-probability threshold q filters ~n + O(sqrt(n)) candidates in one
 *    scan; the exact n-smallest selection then runs on the small candidate
 *    set with a distributed range-sort + zipWithIndex — the driver never
 *    holds rows, so this survives n in the billions (unlike
 *    `orderBy(rand).limit(n)`, whose TakeOrderedAndProject funnels n rows
 *    to the driver, or `rdd.takeSample`, likewise driver-bound).
 */
object Sampler {

  final case class SampleReport(inputRows: Long, sampleRows: Long, ratio: Double, seed: Long)

  private val RCOL = "__graft_sample_r"
  private val GRANK = "__graft_sample_rank"

  /** Bernoulli sampling: output size is binomial(n, ratio), single pass. */
  def bernoulli(df: DataFrame, ratio: Double, seed: Long): DataFrame = {
    require(ratio >= 0.0 && ratio <= 1.0, s"ratio must be in [0,1], got $ratio")
    df.sample(withReplacement = false, ratio, seed)
  }

  /**
   * Exact-count sample: exactly floor(count * ratio) rows (reference
   * truncation semantics, sample.rs:37). ratio=1 is identity; ratio such
   * that floor(...) == 0 yields an empty (but valid) result.
   */
  def exact(df: DataFrame, ratio: Double, seed: Long): DataFrame = {
    require(ratio >= 0.0 && ratio <= 1.0,
      s"ratio must be in [0,1], got $ratio (the reference would loop forever for ratio>1)")
    val total = df.count()
    exactN(df, (total * ratio).toLong, seed, knownTotal = total)
  }

  /**
   * Exactly-n uniform sample without replacement.
   *
   * @param rankCol optional U[0,1)-distributed column expression used as the
   *                sampling rank; default `rand(seed)` (deterministic for a
   *                fixed partition layout). Pass [[positionalRank]] output
   *                for a rank that is stable across partition layouts.
   */
  def exactN(
      df: DataFrame,
      n: Long,
      seed: Long,
      knownTotal: Long = -1L,
      rankCol: Option[Column] = None): DataFrame = {
    val spark = df.sparkSession
    val total = if (knownTotal >= 0) knownTotal else df.count()
    if (n <= 0 || total == 0) return df.limit(0)
    if (n >= total) return df

    val withR = df.withColumn(RCOL, rankCol.getOrElse(rand(seed)).cast(DoubleType))

    // ScaSRS acceptance threshold: q >= p with P[|{u < q}| < n] < 1e-8,
    // so one filtering scan yields enough candidates w.h.p.
    val p = n.toDouble / total
    val gamma = -math.log(1e-8) / total
    val q = math.min(1.0, p + gamma + math.sqrt(gamma * gamma + 2.0 * gamma * p))

    val candidates = withR.filter(col(RCOL) < q)
    candidates.persist()
    try {
      val candCount = candidates.count()
      val pool = if (candCount >= n) candidates else withR // fallback: full sort (prob < 1e-8)
      // Distributed exact selection of the n smallest ranks: GlobalRank's
      // range-partitioned sort + zipWithIndex over ~n candidate rows — the
      // shared total-order primitive; no driver materialization.
      GlobalRank.withGlobalRank(pool, Seq(col(RCOL).asc), GRANK)
        .filter(col(GRANK) <= n)
        .drop(GRANK, RCOL)
    } finally {
      candidates.unpersist(blocking = false)
    }
  }

  /**
   * Exact-count sample selected by a DETERMINISTIC hex rank (the n
   * lexicographically-smallest ranks win). With a content-hash rank —
   * `md5(seed || key columns)` — the sample is seedless-RNG-free,
   * layout-independent (stable under file compaction/repartition, unlike
   * position ranks), and REPLAYABLE BY ANY ENGINE with the same hash:
   * DuckDB reproduces the exact row set with
   * `QUALIFY row_number() OVER (ORDER BY md5(...)) <= n`, which is what
   * lets a full sample->join pipeline be hash-oracle-checked end-to-end.
   *
   * Scale shape matches [[exactN]]: a ScaSRS-style threshold on the rank's
   * 52-bit numeric prefix cuts ~n + O(sqrt n) candidates in one scan, then
   * [[GlobalRank]]'s distributed range-sort selects the exact n smallest —
   * no driver funnel, no full sort of the table.
   *
   * @param rank a LOWERCASE-HEX string column (md5-style), uniform in its
   *             leading bits; ties (hash collisions) are broken arbitrarily
   */
  def exactNByHexRank(df: DataFrame, ratio: Double, rank: Column): DataFrame = {
    require(ratio >= 0.0 && ratio <= 1.0, s"ratio must be in [0,1], got $ratio")
    val total = df.count()
    val n = (total * ratio).toLong
    if (n <= 0) return df.limit(0)
    if (n >= total) return df
    val withR = df.withColumn(RCOL, rank)
    // numeric prefix: first 13 hex chars = 52 bits, exact in a double
    val u = conv(substring(col(RCOL), 1, 13), 16, 10).cast(DoubleType) /
      lit((1L << 52).toDouble)
    val p = n.toDouble / total
    val gamma = -math.log(1e-8) / total
    val q = math.min(1.0, p + gamma + math.sqrt(gamma * gamma + 2.0 * gamma * p))
    val candidates = withR.filter(u < q)
    candidates.persist()
    try {
      val pool = if (candidates.count() >= n) candidates else withR
      GlobalRank.withGlobalRank(pool, Seq(col(RCOL).asc), GRANK)
        .filter(col(GRANK) <= n)
        .drop(GRANK, RCOL)
    } finally {
      candidates.unpersist(blocking = false)
    }
  }

  /**
   * Systematic (every `step`-th) sampling over the deterministic hex-rank
   * order: row i of the rank-sorted table survives iff `(i - 1) % step ==
   * 0` — the 1-in-k design survey methodology prefers when even coverage
   * of the (hash-shuffled) order matters more than independence, and the
   * third member of the portable-sampler family ([[exactNByHexRank]],
   * `perGroupExactKByRank`). With an md5 content rank the selected set is
   * layout-independent and replayable by ANY engine
   * (`QUALIFY (row_number() OVER (ORDER BY md5(...)) - 1) % step = 0`).
   *
   * Scale shape: ONE [[GlobalRank]] distributed range-sort +
   * zipWithIndex; no threshold pre-cut is possible (survivors are spread
   * evenly through the whole order, not concentrated at its head), so
   * the full table rides the range sort — same cost class as any global
   * ordering pass.
   */
  def systematicByHexRank(df: DataFrame, step: Long, rank: Column): DataFrame = {
    require(step >= 1, s"step must be >= 1, got $step")
    GlobalRank.withGlobalRank(df.withColumn(RCOL, rank), Seq(col(RCOL).asc), GRANK)
      .filter((col(GRANK) - 1) % step === 0)
      .drop(GRANK, RCOL)
  }

  /**
   * Partition-layout-independent sampling rank for file-backed DataFrames:
   * hash of (seed, file, row position in file) mapped to U[0,1). Mirrors the
   * reference's BY-POSITION sampling (duplicate rows are sampled
   * independently, sample.rs:41-46) while staying deterministic no matter
   * how Spark splits the files. Requires the `_metadata` struct, i.e. the
   * DataFrame must come straight from a file source.
   */
  def positionalRank(seed: Long): Column = {
    val h = xxhash64(lit(seed), col("_metadata.file_path"), col("_metadata.row_index"))
    // top 53 bits -> exact double in [0,1)
    shiftrightunsigned(h, 11).cast(DoubleType) / lit((1L << 53).toDouble)
  }

  /**
   * Stratified Bernoulli sampling: per-stratum fractions, seeded. Wraps
   * `df.stat.sampleBy` (stratum-local Bernoulli acceptance — single pass, no
   * shuffle; strata not listed in `fractions` are dropped).
   */
  def stratified(df: DataFrame, stratumCol: String, fractions: Map[Any, Double], seed: Long): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0,1], got $fractions")
    df.stat.sampleBy(stratumCol, fractions, seed)
  }

  /**
   * Exact-count stratified sampling: exactly floor(stratumCount * ratio)
   * rows per stratum. One pass for the stratum histogram, then a single
   * rank-within-stratum selection — the per-stratum analogue of [[exactN]]
   * (window sort is per-stratum, so no global sort and no driver funnel).
   * Assumes stratum cardinality is broadcast-small and no single stratum
   * dominates the data; for one giant stratum, run [[exactN]] on that
   * stratum's slice instead (its ScaSRS path avoids the full sort).
   */
  def stratifiedExact(df: DataFrame, stratumCol: String, ratio: Double, seed: Long): DataFrame = {
    require(ratio >= 0.0 && ratio <= 1.0, s"ratio must be in [0,1], got $ratio")
    // null-safe join key: a NULL stratum is a stratum too — a plain
    // equi-join would silently drop every NULL-stratum row
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__graft_n"))
      .withColumnRenamed(stratumCol, "__graft_stratum")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(col(RCOL))
    df.withColumn(RCOL, rand(seed))
      .withColumn("__graft_rk", row_number().over(w))
      .join(broadcast(counts), col(stratumCol) <=> col("__graft_stratum"))
      .filter(col("__graft_rk") <= floor(col("__graft_n") * ratio))
      .select(df.columns.map(col).toSeq: _*) // join reorders columns; restore
  }

  /**
   * Exactly min(k, groupSize) rows per group, in ONE shuffle (partial
   * bottom-k sketches merge map-side — see
   * [[org.apache.spark.sql.graft.BottomKSample]]). Deterministic and
   * partition-layout-independent. The workhorse for "n examples per
   * class/source/language" training-data selection at corpus scale.
   */
  def perGroupExactK(df: DataFrame, groupCols: Seq[String], k: Int, seed: Long): DataFrame = {
    val allCols = df.columns.toSeq
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.bottom_k_sample(struct(allCols.map(col): _*), k, seed).as("__graft_rows"))
      .select(explode(col("__graft_rows")).as("__graft_row"))
      .select(allCols.map(c => col(s"__graft_row.`$c`").as(c)): _*)
  }

  /**
   * Weighted per-group sample: up to k rows per group, inclusion
   * probability scaling with `weightCol` (A-ES without replacement; rows
   * with null/non-positive weight excluded). Same one-shuffle /
   * layout-independent machinery as [[perGroupExactK]] — e.g. "per source,
   * keep 1000 documents biased by quality_score".
   */
  def perGroupWeightedK(
      df: DataFrame, groupCols: Seq[String], weightCol: String, k: Int, seed: Long): DataFrame = {
    val allCols = df.columns.toSeq
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.bottom_k_sample_weighted(
        struct(allCols.map(col): _*), col(weightCol), k, seed).as("__graft_rows"))
      .select(explode(col("__graft_rows")).as("__graft_row"))
      .select(allCols.map(c => col(s"__graft_row.`$c`").as(c)): _*)
  }

  /**
   * Portable deterministic sampling rank: lowercase-hex `md5(seed:k1:k2…)`
   * over the row's unique key columns. Any engine with md5 reproduces the
   * identical rank (and therefore the identical sample) — DuckDB:
   * `md5('seed:' || k1 || ':' || k2)`. Pair with [[exactNByHexRank]],
   * [[stratifiedExactByRank]], [[perGroupExactKByRank]] or
   * [[perGroupWeightedKByRank]].
   *
   * NULL-propagating, matching SQL `||`: a NULL key component yields a
   * NULL rank (a `concat_ws` would silently SKIP the component, colliding
   * distinct keys like (1, NULL) and (1)). Rows with a NULL rank are
   * excluded by the sketch selections (like SQL aggregates ignoring
   * NULLs); use non-null key columns for exact cross-engine replay.
   */
  def hexRank(seed: String, keys: Column*): Column =
    md5(keys.foldLeft(lit(seed): Column)((acc, k) =>
      concat(acc, lit(":"), k.cast("string"))).cast("binary"))

  /**
   * Exact-count stratified sample selected by a deterministic portable
   * rank: exactly floor(stratumCount * ratio) rows per stratum, the rows
   * with the smallest rank within their stratum. Replayable cross-engine:
   * `QUALIFY row_number() OVER (PARTITION BY s ORDER BY rank)
   *    <= floor(count(*) OVER (PARTITION BY s) * ratio)`.
   * One shuffle (both windows share the stratum partitioning). Same
   * giant-stratum caveat as [[stratifiedExact]]: a stratum sorts within
   * one task, so for a dominant stratum run [[exactNByHexRank]] on its
   * slice instead.
   */
  def stratifiedExactByRank(df: DataFrame, stratumCol: String, ratio: Double, rank: Column): DataFrame = {
    require(ratio >= 0.0 && ratio <= 1.0, s"ratio must be in [0,1], got $ratio")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(col(RCOL))
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(col(stratumCol))
    df.withColumn(RCOL, rank)
      .withColumn("__graft_rk", row_number().over(w))
      .withColumn("__graft_n", count(lit(1)).over(cw))
      .filter(col("__graft_rk") <= floor(col("__graft_n") * ratio))
      .select(df.columns.map(col).toSeq: _*)
  }

  /**
   * Portable per-group exact-k sample: min(k, groupSize) rows per group,
   * the rows with the k smallest `rank` values. Same one-shuffle mergeable
   * sketch shape as [[perGroupExactK]] (bottom-k sketches combine
   * map-side, O(k) memory per group, no per-group window sort), but ranked
   * by a caller expression ANY engine can recompute — with [[hexRank]]
   * the sample replays in SQL as
   * `QUALIFY row_number() OVER (PARTITION BY g ORDER BY md5(...)) <= k`.
   */
  def perGroupExactKByRank(df: DataFrame, groupCols: Seq[String], k: Int, rank: Column): DataFrame = {
    val allCols = df.columns.toSeq
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.bottom_k_by_rank(rank, struct(allCols.map(col): _*), k)
        .as("__graft_rows"))
      .select(explode(col("__graft_rows")).as("__graft_row"))
      .select(allCols.map(c => col(s"__graft_row.`$c`").as(c)): _*)
  }

  /**
   * Portable weighted per-group sample via sequential Poisson / priority
   * sampling (Ohlsson 1998; Duffield-Lund-Thorup priority sampling): each
   * row draws a hash-uniform u and gets priority u / w — the k SMALLEST
   * priorities per group win, so inclusion probability scales with weight,
   * without replacement. Fully deterministic AND bit-replayable in any
   * engine: u is the rank's 13-hex-char (52-bit) prefix as an exact
   * integer-valued double, and IEEE-754 division is correctly rounded, so
   * DuckDB's `(('0x'||substr(h,1,13))::BIGINT)::DOUBLE / w` reproduces the
   * identical priority bits. Ties (identical priorities) break on the full
   * hex rank. Rows with null/non-positive weight are excluded (matching
   * [[perGroupWeightedK]]). One shuffle, mergeable, O(k)/group.
   *
   * Note the weight must survive an exact cast to double on both engines —
   * integers < 2^53 and short decimals qualify; bit-identical replay of a
   * COMPUTED double weight requires the computing expression itself to be
   * portable (e.g. the quality-score formula the q61 oracle replays).
   */
  def perGroupWeightedKByRank(
      df: DataFrame, groupCols: Seq[String], weightCol: String, k: Int, rank: Column): DataFrame = {
    val allCols = df.columns.toSeq
    val u = conv(substring(rank, 1, 13), 16, 10).cast(DoubleType)
    val priority = struct(
      (u / col(weightCol).cast(DoubleType)).as("p"), rank.as("h"))
    df.filter(col(weightCol).isNotNull && col(weightCol).cast(DoubleType) > 0.0)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.bottom_k_by_rank(priority, struct(allCols.map(col): _*), k)
        .as("__graft_rows"))
      .select(explode(col("__graft_rows")).as("__graft_row"))
      .select(allCols.map(c => col(s"__graft_row.`$c`").as(c)): _*)
  }

  /** File-based exact sample with a partition-layout-independent seed. */
  def exactFromParquet(spark: SparkSession, path: String, ratio: Double, seed: Long): DataFrame = {
    require(ratio >= 0.0 && ratio <= 1.0,
      s"ratio must be in [0,1], got $ratio (the reference would loop forever for ratio>1)")
    val df = spark.read.parquet(path)
    val cols = df.columns.map(col).toSeq // drop _metadata from output
    val withMeta = spark.read.parquet(path).select((cols :+ col("_metadata")): _*)
    val total = df.count()
    val n = (total * ratio).toLong
    exactN(withMeta, n, seed, knownTotal = total, rankCol = Some(positionalRank(seed)))
      .select(cols: _*)
  }
}
