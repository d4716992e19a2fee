package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Rank-based robust statistics over groups — exact per-group quantile
 * thresholds and winsorization (outlier clipping), the feature-hygiene
 * pass a training pipeline runs before normalizing numeric columns
 * (q125's z-score sibling: z-scores are distorted by heavy tails unless
 * the tails are clipped first).
 *
 * Scale shape: the obvious plan — `row_number() OVER (PARTITION BY group
 * ORDER BY value)` — sorts each group inside ONE task, which melts down
 * when a group holds a third of a 100 TB fact table (low-cardinality
 * group columns are the common case: return flags, languages, sources).
 * Instead the thresholds come from ONE [[GlobalRank]] distributed total
 * order over (group, value): a group's rows occupy a contiguous global
 * rank range, so its k-th order statistic is the row at global rank
 * `groupStart + k - 1` — per-group quantiles with NO per-group sort,
 * every task holding only its range slice. Quantile indices use integer
 * ceil-division (no float epsilon ambiguity at bucket boundaries).
 */
object RobustStats {

  /**
   * Exact per-group (loPct, hiPct) percentile thresholds of `valueCol`:
   * the k-th smallest value per group with k = max(1, ceil(pct*n/100)).
   * Output: one row per group — (groupCol, n, lo, hi).
   */
  def groupQuantileThresholds(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      loPct: Int,
      hiPct: Int): DataFrame = {
    require(loPct >= 0 && hiPct <= 100 && loPct <= hiPct,
      s"need 0 <= loPct <= hiPct <= 100, got ($loPct, $hiPct)")
    val ranked = GlobalRank.withGlobalRank(
      df.select(col(groupCol), col(valueCol)),
      Seq(col(groupCol), col(valueCol)), rankName = "__gr")
    // a group's rows are contiguous in the total order; its k-th order
    // statistic sits at global rank (min group rank) + k - 1
    val spans = ranked.groupBy(col(groupCol))
      .agg(min(col("__gr")).as("__r0"), count(lit(1)).as("n"))
      .select(col(groupCol), col("n"),
        (col("__r0") + expr(s"greatest(1L, (n * $loPct + 99) div 100)") - 1).as("__kLo"),
        (col("__r0") + expr(s"greatest(1L, (n * $hiPct + 99) div 100)") - 1).as("__kHi"))
    // group count is small by assumption (that's why the window was the
    // tempting-but-wrong plan) — broadcast the k-indices back
    ranked
      .join(broadcast(spans), groupCol)
      .filter(col("__gr") === col("__kLo") || col("__gr") === col("__kHi"))
      .groupBy(col(groupCol))
      .agg(first(col("n")).as("n"),
        min(when(col("__gr") === col("__kLo"), col(valueCol))).as("lo"),
        min(when(col("__gr") === col("__kHi"), col(valueCol))).as("hi"))
  }

  /**
   * Winsorize `valueCol` per group: values below the loPct-th percentile
   * clip up to it, values above the hiPct-th percentile clip down to it.
   * Appends `<valueCol>_w` (clipped value) plus the group thresholds; the
   * join back is a broadcast on the small per-group threshold table, so
   * the data side stays a scan-fused projection.
   */
  def winsorize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      loPct: Int,
      hiPct: Int): DataFrame = {
    val th = groupQuantileThresholds(df, groupCol, valueCol, loPct, hiPct)
      .select(col(groupCol), col("lo"), col("hi"))
    df.join(broadcast(th), groupCol)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("lo")), col("hi")))
  }

  /**
   * Exact per-group quantile VECTOR: the k-th order statistics for every
   * percentile in `pcts` (k = max(1, ceil(pct·n/100)), the
   * [[groupQuantileThresholds]] convention) from ONE GlobalRank total
   * order — the summary-table builder (p25/p50/p75/p90/p99 in a single
   * pass) with the same no-per-group-window-sort scale shape. Output:
   * (groupCol, n, p<pct>...) one column per requested percentile.
   */
  def groupQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty, "pcts must be non-empty")
    require(pcts.forall(p => p >= 0 && p <= 100), s"pcts must be in [0,100], got $pcts")
    require(pcts.distinct.size == pcts.size, s"pcts must be distinct, got $pcts")
    val ranked = GlobalRank.withGlobalRank(
      df.select(col(groupCol), col(valueCol)),
      Seq(col(groupCol), col(valueCol)), rankName = "__gr")
    val spans = ranked.groupBy(col(groupCol))
      .agg(min(col("__gr")).as("__r0"), count(lit(1)).as("n"))
    val withK = spans.select(
      col(groupCol) +: col("n") +: pcts.map(p =>
        (col("__r0") + expr(s"greatest(1L, (n * $p + 99) div 100)") - 1)
          .as(s"__k$p")): _*)
    ranked
      .join(broadcast(withK), groupCol)
      .filter(pcts.map(p => col("__gr") === col(s"__k$p")).reduce(_ || _))
      .groupBy(col(groupCol))
      .agg(first(col("n")).as("n"),
        pcts.map(p =>
          min(when(col("__gr") === col(s"__k$p"), col(valueCol))).as(s"p$p")): _*)
  }

  /**
   * Tukey-fence outlier summary per group: quartiles from ONE
   * [[groupQuantiles]] total order, fences at `q1 − k·IQR` / `q3 + k·IQR`
   * (k = 1.5 by the boxplot convention, expressed as the rational
   * kNum/kDen so the fence arithmetic is a fixed IEEE tree), and the
   * exact count of rows outside each fence — the boxplot-summary /
   * outlier-rate report for every numeric feature column. One broadcast
   * threshold join back; the data side stays a scan-fused conditional
   * aggregation.
   */
  def tukeyFences(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      kNum: Long = 3L,
      kDen: Long = 2L): DataFrame = {
    require(kNum >= 0 && kDen > 0, s"need kNum >= 0, kDen > 0; got ($kNum, $kDen)")
    val k = kNum.toDouble / kDen.toDouble
    val quart = groupQuantiles(df, groupCol, valueCol, Seq(25, 75))
      .select(col(groupCol), col("n"),
        col("p25").cast("double").as("q1"), col("p75").cast("double").as("q3"))
      .withColumn("lo_fence", col("q1") - lit(k) * (col("q3") - col("q1")))
      .withColumn("hi_fence", col("q3") + lit(k) * (col("q3") - col("q1")))
    df.join(broadcast(quart), groupCol)
      .groupBy(col(groupCol))
      .agg(first(col("n")).as("n"),
        first(col("q1")).as("q1"), first(col("q3")).as("q3"),
        first(col("lo_fence")).as("lo_fence"), first(col("hi_fence")).as("hi_fence"),
        sum(when(col(valueCol) < col("lo_fence"), 1L).otherwise(0L)).as("n_below"),
        sum(when(col(valueCol) > col("hi_fence"), 1L).otherwise(0L)).as("n_above"))
  }

  /**
   * Percent-rank feature-transform TABLE: for every DISTINCT (group,
   * value), SQL `PERCENT_RANK()` = (rank − 1) / (n − 1) where rank is the
   * 1-based position of the value's first tie-run row in the group order
   * — the rank-normalization ML preprocessing step (maps any score
   * distribution onto [0,1], immune to outliers and monotone transforms).
   * Emitted as a mapping table (value count included) for the caller to
   * join back; single-row groups map to 0 (the SQL convention).
   *
   * Scale shape: collapse to per-(group, value) counts, ONE
   * [[GlobalRank.withPrefixSum]] scan gives each tie run's start — no
   * per-group window sort; the percent rank is ONE division of exact
   * longs.
   */
  def percentRankTable(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val wv = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("n_with_value"))
    val ps = GlobalRank.withPrefixSum(
      wv, Seq(col(groupCol), col(valueCol)), col("n_with_value"),
      rankName = "__gr", sumName = "__cw")
    val spans = ps.groupBy(col(groupCol))
      .agg(min(col("__cw") - col("n_with_value")).as("__start"),
        max(col("__cw")).as("__end"))
      .select(col(groupCol), col("__start"),
        (col("__end") - col("__start")).as("__n"))
    ps.join(broadcast(spans), groupCol)
      .select(col(groupCol), col(valueCol), col("n_with_value"),
        when(col("__n") === 1, 0.0).otherwise(
          (col("__cw") - col("n_with_value") - col("__start")).cast("double") /
            (col("__n") - 1).cast("double")).as("pct_rank"))
  }

  /**
   * Exact per-group WEIGHTED (lower) median of `valueCol` under integral
   * non-negative `weightCol`: the smallest value v with
   * `2 * cumWeight(<= v) >= totalWeight` — the duplication-aware center
   * a curation pipeline needs when each row carries a multiplicity
   * (token counts, repeat counts, sampling weights) and the unweighted
   * median would let a million one-token rows outvote one million-token
   * row.
   *
   * Scale shape: rows first collapse to per-(group, value) weight sums
   * (one hash aggregation — the only corpus-sized shuffle), then ONE
   * [[GlobalRank.withPrefixSum]] distributed prefix scan over the
   * (group, value) total order yields cumulative weights with no
   * per-group window sort; a group's in-group cumulative weight is its
   * global prefix minus the group's exclusive start (groups are
   * contiguous in the order). All comparisons are integer — the median
   * pick is bit-reproducible on any engine.
   *
   * Output: one row per group — (groupCol, weighted_median, total_w).
   */
  def weightedMedianByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      weightCol: String): DataFrame = {
    val wv = df.groupBy(col(groupCol), col(valueCol))
      .agg(sum(col(weightCol).cast("long")).as("__w"))
    val ps = GlobalRank.withPrefixSum(
      wv, Seq(col(groupCol), col(valueCol)), col("__w"),
      rankName = "__gr", sumName = "__cw")
    // group start = the prefix just before the group's first row; group
    // cardinality is small by assumption — broadcast the spans back
    val spans = ps.groupBy(col(groupCol))
      .agg(min(col("__cw") - col("__w")).as("__start"),
        max(col("__cw")).as("__end"))
      .select(col(groupCol), col("__start"),
        (col("__end") - col("__start")).as("total_w"))
    ps.join(broadcast(spans), groupCol)
      .filter((col("__cw") - col("__start")) * 2 >= col("total_w"))
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("weighted_median"),
        first(col("total_w")).as("total_w"))
  }

  /**
   * Median imputation: NULLs in `valueCol` fill with their group's exact
   * (lower) median — the robust default for numeric feature repair
   * (mean imputation drags toward outliers; the median doesn't move).
   * The median comes from [[groupQuantileThresholds]]' GlobalRank total
   * order over the NON-NULL rows only; groups that are entirely NULL
   * stay NULL (no global fallback — that's a caller policy). Appends
   * `<valueCol>_filled` + `was_imputed`; the data side stays a
   * scan-fused projection after one broadcast threshold join.
   */
  def imputeGroupMedian(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val med = groupQuantileThresholds(
      df.filter(col(valueCol).isNotNull), groupCol, valueCol, 50, 50)
      .select(col(groupCol), col("lo").as("__med"))
    df.join(broadcast(med), Seq(groupCol), "left")
      .withColumn(s"${valueCol}_filled", coalesce(col(valueCol), col("__med")))
      .withColumn("was_imputed", col(valueCol).isNull && col("__med").isNotNull)
      .drop("__med")
  }

  /**
   * Deterministic per-group MODE of a numeric column: the most frequent
   * value, ties broken to the SMALLEST value — one `max(struct(count,
   * −value))` over the (group, value) cell table, no window, no sort
   * (the labelPropagation argmax trick). Output: (groupCol, mode_value,
   * n_mode).
   */
  def modeByGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val cells = df.groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("__c"))
    cells.groupBy(col(groupCol))
      .agg(max(struct(col("__c"), (-col(valueCol)).as("__nv"))).as("__w"))
      .select(col(groupCol), (-col("__w.__nv")).as("mode_value"),
        col("__w.__c").as("n_mode"))
  }

  /**
   * Quantile normalization TABLE: maps each group's values onto the
   * GLOBAL distribution — per distinct (group, value), the in-group
   * inclusive-ECDF percentile index `p = ceil(bins·cum/n)` and the
   * global order statistic at that index (`k = max(1, ceil(p·N/bins))`,
   * the [[groupQuantiles]] convention) — the batch-effect correction
   * standard in ML feature prep (every group ends up with the same
   * marginal distribution, exactly the global one at `bins` resolution).
   *
   * Scale shape: one prefix scan over the (group, value) order for the
   * in-group ECDF (no per-group window sort), ONE GlobalRank pass over
   * the global order for the bins-sized target vector, and broadcast
   * joins for both lookups — the data never self-joins. Everything is
   * integer until the emitted values.
   *
   * Output: (groupCol, valueCol, n_with_value, pct, norm_v).
   */
  def quantileNormalizeTable(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      bins: Int = 100): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    // global target vector: the bins order statistics of the whole column
    val spark = df.sparkSession
    val ranked = GlobalRank.withGlobalRank(
      df.select(col(valueCol)), Seq(col(valueCol)), rankName = "__qr")
    val total = df.count()
    require(total > 0, "quantileNormalizeTable needs at least one row")
    val kToP = (1 to bins).map { p =>
      (math.max(1L, (p.toLong * total + bins - 1) / bins), p)
    }
    import spark.implicits._
    val pk = kToP.toDF("__qk", "pct")
    val targets = ranked.join(broadcast(pk), col("__qr") === col("__qk"))
      .select(col("pct").cast("long").as("pct"), col(valueCol).as("norm_v"))
    // in-group inclusive ECDF percentile per distinct (group, value)
    val wv = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("n_with_value"))
    val ps = GlobalRank.withPrefixSum(
      wv, Seq(col(groupCol), col(valueCol)), col("n_with_value"),
      rankName = "__gr", sumName = "__cw")
    val spans = ps.groupBy(col(groupCol))
      .agg(min(col("__cw") - col("n_with_value")).as("__start"),
        max(col("__cw")).as("__end"))
      .select(col(groupCol), col("__start"),
        (col("__end") - col("__start")).as("__n"))
    ps.join(broadcast(spans), groupCol)
      // integer ceil-division (Column./ would be a double divide)
      .withColumn("pct",
        expr(s"(${bins}L * (__cw - __start) + __n - 1L) div __n"))
      .select(col(groupCol), col(valueCol), col("n_with_value"), col("pct"))
      .join(broadcast(targets), "pct")
      .select(col(groupCol), col(valueCol), col("n_with_value"),
        col("pct"), col("norm_v"))
  }

  /** Convenience: clip column expression given lo/hi. */
  def clip(value: Column, lo: Column, hi: Column): Column =
    least(greatest(value, lo), hi)

  /**
   * Median/MAD robust outlier flags per group: a row is an outlier iff
   * `|value - median| * kDen > kNum * MAD`, where both the median and the
   * MAD (median absolute deviation) are EXACT lower-median order
   * statistics (k = max(1, ceil(n/2))) from [[groupQuantileThresholds]]'s
   * GlobalRank total order — the heavy-tail-immune alternative to z-score
   * thresholds (one wild value moves a mean/stddev arbitrarily; it moves
   * a median not at all).
   *
   * The threshold multiplier is the RATIONAL kNum/kDen and the comparison
   * is cross-multiplied, so on integer-valued columns (prices in cents,
   * token counts) the outlier decision is integer-exact — no float
   * boundary ambiguity, bit-reproducible on any engine.
   *
   * Scale shape: two GlobalRank total orders (value, then |value-median|)
   * and two broadcast threshold joins; the data side stays a scan-fused
   * projection, no per-group window sort anywhere.
   *
   * Output: the input rows plus (med, mad, is_outlier).
   */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      kNum: Long,
      kDen: Long): DataFrame = {
    require(kNum >= 0 && kDen > 0, s"need kNum >= 0, kDen > 0; got ($kNum, $kDen)")
    // the threshold tables are group-cardinality tiny but cost a GlobalRank
    // total order each — localCheckpoint so downstream joins (and every
    // action on the result) reuse them instead of re-running the rank
    val med = groupQuantileThresholds(df, groupCol, valueCol, 50, 50)
      .select(col(groupCol), col("lo").as("med"))
      .localCheckpoint()
    val withMed = df.join(broadcast(med), groupCol)
      .withColumn("__absdev", abs(col(valueCol) - col("med")))
    val mad = groupQuantileThresholds(withMed, groupCol, "__absdev", 50, 50)
      .select(col(groupCol), col("lo").as("mad"))
      .localCheckpoint()
    withMed.join(broadcast(mad), groupCol)
      .withColumn("is_outlier", col("__absdev") * kDen > col("mad") * kNum)
      .drop("__absdev")
  }
}
