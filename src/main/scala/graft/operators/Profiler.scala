package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed column profiler — the "what is in this table?" first step of
 * every data-quality / curation pipeline (an extension surface: the
 * reference's only metadata use is the footer row count,
 * /root/reference/src/bin/sample.rs:31-34).
 *
 * One row out per input column: row/null/distinct counts plus min/max
 * rendered as strings, so profiles of arbitrary tables share one schema and
 * union cleanly into a profile warehouse.
 *
 * Scale design: a SINGLE aggregate pass over the table — never one job per
 * column. With `exact = true` the per-column exact distinct counts make
 * Catalyst plan an Expand (input multiplied by the number of distinct aggs)
 * — correct, and what the DuckDB oracle can check, but the 100 TB path is
 * `exact = false`, which swaps in mergeable HLL sketches
 * (`approx_count_distinct`): one map-side-combined pass, no Expand, error
 * ~2%. Both variants shuffle only the tiny partial-agg state.
 */
object Profiler {

  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.columns.toSeq
    require(cols.nonEmpty, "profile of a zero-column projection")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1L)).as("__n"), aggs: _*)
    // unpivot the single wide row to (col_name, metrics) rows; stack is a
    // generator projection over one row — no extra pass, no shuffle
    val stackExpr = s"stack(${cols.length}, " + cols.map { c =>
      s"'$c', `__nn_$c`, `__nd_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ") + ")"
    one.select(col("__n"), expr(stackExpr)
        .as(Seq("col_name", "n_nonnull", "n_distinct", "min_str", "max_str")))
      .select(col("col_name"), col("__n").as("n_rows"),
        (col("__n") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_str"), col("max_str"))
  }

  /**
   * Exact inner-join cardinality WITHOUT materializing the join:
   * `|A ⋈ B| = Σ_k cA(k)·cB(k)` over the two key-count tables — the
   * pre-flight a planner (or a human) runs before an expensive join to
   * catch the key-multiplicity blow-up (a 10⁶×10⁶ hot key = 10¹² output
   * rows) while touching only key-distinct-sized relations. One count
   * agg per side, one equi-join of the count tables, one sum.
   *
   * Output: one row — (n_left, n_right, n_left_keys, n_right_keys,
   * n_join, max_key_fanout).
   */
  def joinSizeEstimate(
      leftDf: DataFrame, leftKey: String,
      rightDf: DataFrame, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ca = leftDf.groupBy(col(leftKey).as("__k")).agg(count(lit(1)).as("__ca"))
    val cb = rightDf.groupBy(col(rightKey).as("__k")).agg(count(lit(1)).as("__cb"))
    val joined = ca.join(cb, "__k")
      .agg(coalesce(sum(col("__ca") * col("__cb")), lit(0L)).as("n_join"),
        coalesce(max(col("__ca") * col("__cb")), lit(0L)).as("max_key_fanout"))
    val la = ca.agg(sum(col("__ca")).as("n_left"), count(lit(1)).as("n_left_keys"))
    val lb = cb.agg(sum(col("__cb")).as("n_right"), count(lit(1)).as("n_right_keys"))
    la.crossJoin(lb).crossJoin(joined)
      .select(col("n_left"), col("n_right"), col("n_left_keys"),
        col("n_right_keys"), col("n_join"), col("max_key_fanout"))
  }

  /**
   * Equi-width histogram with EXPLICIT bounds [lo, hi): bin i covers
   * [lo + i·w, lo + (i+1)·w), w = (hi-lo)/nBins; values outside the range
   * clamp into the edge bins (so the counts always sum to the non-null row
   * count), nulls are dropped. Explicit bounds keep the operator one
   * fully-parallel hash aggregate — bounds discovery would be a second
   * pass; run [[profile]] first if you need them. Only non-empty bins are
   * returned. Bin arithmetic is plain IEEE double floor((v-lo)/w) — exact
   * and engine-portable for the oracle.
   */
  def histogram(df: DataFrame, c: String, lo: Double, hi: Double,
      nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val w = (hi - lo) / nBins
    val v = col(c).cast("double")
    val bin = least(lit(nBins - 1L),
      greatest(lit(0L), floor((v - lo) / w).cast("long")))
    df.filter(v.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1L)).as("n"))
      .select(col("bin"), (lit(lo) + col("bin") * w).as("bin_lo"),
        (lit(lo) + (col("bin") + 1L) * w).as("bin_hi"), col("n"))
  }

  /**
   * Inclusion coefficients between two key columns — the foreign-key
   * discovery / referential-drift primitive: what fraction of A's distinct
   * (non-null) keys appear in B, and vice versa, plus the key-set Jaccard.
   * `inclusion_a_in_b = 1.0` is the FK candidate signal; values slipping
   * below 1.0 over time measure referential decay (q221 checks a KNOWN
   * FK row-exactly; this DISCOVERS candidates from data).
   *
   * Scale shape (100 TB): both sides collapse to their distinct-key
   * relations first (map-side combinable), so the inner join runs on key
   * cardinalities, never row counts. One row out; all counts exact longs,
   * the three ratios one fixed division each.
   */
  def inclusionCoefficient(
      a: DataFrame, keyA: String, b: DataFrame, keyB: String): DataFrame = {
    val da = a.filter(col(keyA).isNotNull).select(col(keyA).as("__k")).distinct()
    val db = b.filter(col(keyB).isNotNull).select(col(keyB).as("__k")).distinct()
    val na = da.agg(count(lit(1)).as("n_keys_a"))
    val nb = db.agg(count(lit(1)).as("n_keys_b"))
    val shared = da.join(db, "__k").agg(count(lit(1)).as("n_shared"))
    na.crossJoin(nb).crossJoin(shared)
      .select(col("n_keys_a"), col("n_keys_b"), col("n_shared"),
        when(col("n_keys_a") > 0,
          col("n_shared").cast("double") / col("n_keys_a").cast("double"))
          .as("inclusion_a_in_b"),
        when(col("n_keys_b") > 0,
          col("n_shared").cast("double") / col("n_keys_b").cast("double"))
          .as("inclusion_b_in_a"),
        when(col("n_keys_a") + col("n_keys_b") - col("n_shared") > 0,
          col("n_shared").cast("double") /
            (col("n_keys_a") + col("n_keys_b") - col("n_shared")).cast("double"))
          .as("key_jaccard"))
  }

  /**
   * Functional-dependency check `lhs → rhs`: does every distinct LHS tuple
   * determine exactly one RHS value? The schema-discovery primitive behind
   * denormalization safety and dimension extraction. Reports the violating
   * LHS groups (those seeing >1 distinct RHS) plus the dependency verdict —
   * `n_violating = 0` ⇔ the FD holds.
   *
   * Scale shape: ONE map-side-combinable aggregate to the distinct
   * (lhs, rhs) relation, then one count per lhs — both bounded by the LHS
   * domain, never a self-join.
   */
  def functionalDependency(
      df: DataFrame, lhs: Seq[String], rhs: String): DataFrame = {
    require(lhs.nonEmpty, "lhs must be non-empty")
    val perLhs = df.groupBy(lhs.map(col): _*)
      .agg(countDistinct(col(rhs)).as("__n_rhs"))
    perLhs.agg(count(lit(1)).as("n_lhs_groups"),
      sum(when(col("__n_rhs") > 1, 1L).otherwise(0L)).as("n_violating"),
      max(col("__n_rhs")).as("max_rhs_per_lhs"))
      .withColumn("fd_holds", col("n_violating") === 0L)
  }
}
