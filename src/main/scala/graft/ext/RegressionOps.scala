package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Closed-form statistics over groups — per-group ordinary least squares and
 * pairwise Pearson correlation — from EXACT sufficient statistics: all five
 * sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulate in DECIMAL (2-decimal inputs
 * ⇒ 4-decimal products, exact), cast to double once, and combine in ONE
 * fixed IEEE expression tree — so a SQL oracle reproduces slope/intercept/
 * r²/correlation bit-for-bit, immune to summation order.
 *
 * Scale shape: a single map-side-combined hash aggregate per group — the
 * sums, never the points, cross the wire. This is the moment-sketch trick
 * that makes regression embarrassingly parallel; contrast with iterative
 * fits (QualityModel's LBFGS) which need passes.
 */
object RegressionOps {

  /**
   * Per-group simple OLS of y on x: slope, intercept, r². Inputs are cast
   * to DECIMAL(15,2) (the repo's 2-decimal money discipline) so every sum
   * is exact; groups with zero x-variance emit NULL slope/intercept/r²
   * (division by zero → NULL on both engines... guarded explicitly).
   */
  def olsByGroup(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(15,2)")
    val y = col(yCol).cast("decimal(15,2)")
    // decimal -> STRING -> double, not a direct decimal cast: once a
    // second-moment sum's scaled value exceeds 2^53, engines' native
    // decimal-to-double conversions can differ in the last ulp (int128
    // conversion + scale division = two roundings); parsing the exact
    // decimal string is ONE correctly-rounded step on every engine
    def asD(c: Column): Column = c.cast("string").cast("double")
    val agged = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        asD(sum(x)).as("__sx"),
        asD(sum(y)).as("__sy"),
        asD(sum(x * y)).as("__sxy"),
        asD(sum(x * x)).as("__sxx"),
        asD(sum(y * y)).as("__syy"))
    val n = col("n").cast("double")
    val num = n * col("__sxy") - col("__sx") * col("__sy")
    val den = n * col("__sxx") - col("__sx") * col("__sx")
    val deny = n * col("__syy") - col("__sy") * col("__sy")
    val slope = when(den =!= 0.0, num / den)
    agged.select(col(groupCol), col("n"),
      slope.as("slope"),
      when(den =!= 0.0, (col("__sy") - (num / den) * col("__sx")) / n).as("intercept"),
      when(den =!= 0.0 && deny =!= 0.0, (num * num) / (den * deny)).as("r2"))
  }

  /**
   * Pairwise Pearson correlation of per-bucket counts between categories:
   * the co-occurrence analysis a telemetry pipeline runs over its event mix
   * ("do error spikes track purchase spikes?"). The (bucket x category)
   * count matrix is densified (absent cells = 0 — correlation over a
   * sparse LEFT-present set would be biased), then self-joined on the
   * bucket — all post-aggregation relations are |buckets| x |categories|
   * rows, never the log. Counts are integers, so the sums are exact and
   * the final correlation is one fixed double expression.
   */
  def countCorrelation(df: DataFrame, bucketCol: Column, catCol: String): DataFrame = {
    val counts = df.groupBy(bucketCol.as("__cc_bucket"), col(catCol).as("__cc_cat"))
      .agg(count(lit(1)).as("__cc_n"))
    val buckets = counts.select(col("__cc_bucket")).distinct()
    val cats = counts.select(col("__cc_cat")).distinct()
    val dense = buckets.crossJoin(cats)
      .join(counts, Seq("__cc_bucket", "__cc_cat"), "left")
      .select(col("__cc_bucket"), col("__cc_cat"),
        coalesce(col("__cc_n"), lit(0L)).as("__cc_n"))
    val a = dense.select(col("__cc_bucket"), col("__cc_cat").as("cat_a"), col("__cc_n").as("__na"))
    val b = dense.select(col("__cc_bucket"), col("__cc_cat").as("cat_b"), col("__cc_n").as("__nb"))
    val paired = a.join(b, "__cc_bucket").filter(col("cat_a") < col("cat_b"))
    val agged = paired.groupBy(col("cat_a"), col("cat_b"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("__na")).as("__sa"), sum(col("__nb")).as("__sb"),
        sum(col("__na") * col("__nb")).as("__sab"),
        sum(col("__na") * col("__na")).as("__saa"),
        sum(col("__nb") * col("__nb")).as("__sbb"))
    val n = col("n_buckets").cast("double")
    def d(c: String): Column = col(c).cast("double")
    val num = n * d("__sab") - d("__sa") * d("__sb")
    val dena = n * d("__saa") - d("__sa") * d("__sa")
    val denb = n * d("__sbb") - d("__sb") * d("__sb")
    agged.select(col("cat_a"), col("cat_b"), col("n_buckets"),
      when(dena > 0.0 && denb > 0.0, num / sqrt(dena * denb)).as("pearson_r"))
  }

  /**
   * Chi-square contingency cells for two categorical columns: per cell,
   * the observed count, the marginals, and the cell's chi-square
   * contribution `(O·N − R·C)² / (N·R·C)` — algebraically `(O−E)²/E`
   * with `E = R·C/N`, rearranged so the numerator is an EXACT integer
   * (squared in DECIMAL(38,0): `O·N` tops out near 10^12 at warehouse
   * scale, its square near 10^24 — far inside 38 digits, far outside
   * int64). The decimal canonicalizes to double through a STRING cast
   * (the [[olsByGroup]] discipline) and the contribution is ONE
   * division — bit-reproducible per cell. The statistic itself is the
   * SUM of contributions; it's left to the caller because cross-engine
   * float summation order differs — per-cell rows are the exact,
   * comparable artifact.
   *
   * Scale shape: one (a, b) hash aggregation over the data; marginals
   * and N derive from the cell table (|A|·|B| rows) — the data is
   * scanned once and never joined.
   */
  def chiSquareCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("observed"))
    val withMarginals = cells
      .withColumn("row_total",
        sum(col("observed")).over(org.apache.spark.sql.expressions.Window.partitionBy(col(aCol))))
      .withColumn("col_total",
        sum(col("observed")).over(org.apache.spark.sql.expressions.Window.partitionBy(col(bCol))))
      .crossJoin(broadcast(cells.agg(sum(col("observed")).as("n_total"))))
    // every factor is cast to DECIMAL(38,0) BEFORE multiplying: O·N and
    // R·C top out near 10^12 each at warehouse scale but N·R·C reaches
    // 10^36 — a LONG product wraps silently past 2^63 (~9.2e18), i.e. on
    // a ~5M-row table with two dominant marginals
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val dev = dec(col("observed")) * dec(col("n_total")) -
      dec(col("row_total")) * dec(col("col_total"))
    withMarginals.select(col(aCol), col(bCol), col("observed"),
      col("row_total"), col("col_total"), col("n_total"),
      ((dev * dev).cast("string").cast("double") /
        (dec(col("n_total")) * dec(col("row_total")) * dec(col("col_total")))
          .cast("string").cast("double"))
        .as("contribution"))
  }

  /**
   * Two-sample Kolmogorov–Smirnov statistic per group: the max absolute
   * ECDF gap `D = max_v |F_a(v) − F_b(v)|` between two levels of
   * `condCol` — the distribution-shift detector that catches what a mean
   * test (Welch) can't: same mean, different shape. Cross-multiplied
   * integers (`|cumA·n_b − cumB·n_a|`) make every candidate gap exact;
   * `d` is ONE division at the end.
   *
   * Scale shape: rows collapse to per-(group, value) side counts (one
   * hash agg — the only data-sized shuffle), then ONE
   * [[graft.operators.GlobalRank.withPrefixSums]] distributed prefix
   * scan carries BOTH sides' cumulative counts over the (group, value)
   * total order — no per-group window sort (a 3-level group column would
   * funnel a third of the table through one task). ECDF gaps evaluate at
   * distinct values only (ties collapse before the scan — both ECDFs
   * step at a tied value simultaneously, and the gap between steps is
   * measured AFTER the full step on each side, which is exactly the KS
   * convention).
   *
   * Output: one row per group — (groupCol, n_a, n_b, d_num, d) with
   * `d = d_num / (n_a · n_b)`.
   */
  def ksTest(
      df: DataFrame,
      groupCol: String,
      condCol: String,
      valueCol: String,
      levelA: String,
      levelB: String): DataFrame = {
    val sides = df
      .filter(col(condCol) === levelA || col(condCol) === levelB)
      .groupBy(col(groupCol), col(valueCol))
      .agg(sum(when(col(condCol) === levelA, 1L).otherwise(0L)).as("__ca"),
        sum(when(col(condCol) === levelB, 1L).otherwise(0L)).as("__cb"))
    val ps = graft.operators.GlobalRank.withPrefixSums(
      sides, Seq(col(groupCol), col(valueCol)),
      Seq(col("__ca"), col("__cb")),
      rankName = "__gr", sumNames = Seq("__cuma", "__cumb"))
    // group starts: the prefix just before each group's first row (groups
    // are contiguous in the total order); group cardinality is small —
    // broadcast back
    val spans = ps.groupBy(col(groupCol))
      .agg(min(col("__cuma") - col("__ca")).as("__sa"),
        min(col("__cumb") - col("__cb")).as("__sb"),
        max(col("__cuma")).as("__ea"), max(col("__cumb")).as("__eb"))
      .select(col(groupCol), col("__sa"), col("__sb"),
        (col("__ea") - col("__sa")).as("n_a"),
        (col("__eb") - col("__sb")).as("n_b"))
    ps.join(broadcast(spans), groupCol)
      .select(col(groupCol), col("n_a"), col("n_b"),
        abs((col("__cuma") - col("__sa")) * col("n_b") -
          (col("__cumb") - col("__sb")) * col("n_a")).as("__gap"))
      .groupBy(col(groupCol))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        max(col("__gap")).as("d_num"))
      .withColumn("d",
        when(col("n_a") > 0 && col("n_b") > 0,
          col("d_num").cast("double") / (col("n_a") * col("n_b")).cast("double")))
  }

  /**
   * Mann–Whitney U / exact ROC AUC per group: the rank-sum test between
   * two levels of `condCol`, whose normalized statistic
   * `AUC = U_a / (n_a·n_b)` is EXACTLY the probability a random A value
   * outranks a random B value (ties credit ½) — i.e. the ROC AUC of
   * `valueCol` as a score for the A/B label. The robust complement to
   * [[welchTTest]] (rank-based: immune to outliers and monotone
   * transforms) and the distributed exact-AUC evaluator for model scores.
   *
   * All in integers: values collapse to per-(group, value) side counts,
   * ONE [[graft.operators.GlobalRank.withPrefixSums]] scan carries the
   * combined cumulative count, and each tie run's DOUBLED midrank
   * `2·start + (c_a+c_b) + 1` keeps rank sums in longs; the AUC is ONE
   * division of exact longs at the end — bit-reproducible. No per-group
   * window sort anywhere (the ksTest scale shape).
   *
   * Output: (groupCol, n_a, n_b, r2_a = doubled A rank-sum, auc).
   */
  def mannWhitneyAuc(
      df: DataFrame,
      groupCol: String,
      condCol: String,
      valueCol: String,
      levelA: String,
      levelB: String): DataFrame = {
    val sides = df
      .filter(col(condCol) === levelA || col(condCol) === levelB)
      .groupBy(col(groupCol), col(valueCol))
      .agg(sum(when(col(condCol) === levelA, 1L).otherwise(0L)).as("__ca"),
        sum(when(col(condCol) === levelB, 1L).otherwise(0L)).as("__cb"))
    val ps = graft.operators.GlobalRank.withPrefixSums(
      sides, Seq(col(groupCol), col(valueCol)),
      Seq(col("__ca") + col("__cb"), col("__ca"), col("__cb")),
      rankName = "__gr", sumNames = Seq("__cumab", "__cuma", "__cumb"))
    val spans = ps.groupBy(col(groupCol))
      .agg(min(col("__cumab") - col("__ca") - col("__cb")).as("__s0"),
        (max(col("__cuma")) - min(col("__cuma") - col("__ca"))).as("n_a"),
        (max(col("__cumb")) - min(col("__cumb") - col("__cb"))).as("n_b"))
    ps.join(broadcast(spans), groupCol)
      // doubled midrank of this value's tie run, in-group
      .withColumn("__mr2",
        (col("__cumab") - col("__s0") - col("__ca") - col("__cb")) * 2 +
          col("__ca") + col("__cb") + 1)
      .groupBy(col(groupCol))
      // rank sums ride DECIMAL(38,0): __mr2 grows with 2·n_group, so a
      // LONG Σ(ca·mr2) wraps past 2^63 around ~2e9 rows per group; the
      // AUC combines through the string-canonicalized decimal→double
      // discipline (numerator and denominator both exact integers)
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        sum(col("__ca").cast("decimal(38,0)") * col("__mr2").cast("decimal(38,0)"))
          .as("r2_a"))
      .withColumn("auc",
        when(col("n_a") > 0 && col("n_b") > 0,
          (col("r2_a") - col("n_a").cast("decimal(38,0)") *
            (col("n_a") + 1).cast("decimal(38,0)")).cast("string").cast("double") /
            (col("n_a").cast("decimal(38,0)") * col("n_b").cast("decimal(38,0)") * 2)
              .cast("string").cast("double")))
  }

  /**
   * Pairwise covariance matrix over 2-decimal numeric columns — the
   * feature-store summary a training pipeline exports before whitening
   * (PcaOps' Gram pass is its dense-vector sibling). Columns scale to
   * exact integer cents, every moment accumulates as a long / exact
   * DECIMAL(38,0) product sum in ONE single-row aggregation (k + k(k+1)/2
   * sums — nothing else crosses the wire), and each covariance combines
   * in a fixed IEEE tree (string-canonicalized decimal→double, the
   * olsByGroup discipline) scaled back to original units. Output: one
   * row per unordered column pair (col_a, col_b, n, cov), diagonal
   * included (= variance).
   */
  def covarianceMatrixCents(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got $cols")
    require(cols.distinct.size == cols.size, s"columns must be distinct, got $cols")
    val base = df.select(cols.map(c =>
      round(col(c) * 100).cast("long").as(s"__cv_$c")): _*)
    val aggs = Seq(count(lit(1)).as("__n")) ++
      cols.map(c => sum(col(s"__cv_$c")).as(s"__s_$c")) ++
      (for { i <- cols.indices; j <- i until cols.size } yield
        sum(col(s"__cv_${cols(i)}").cast("decimal(38,0)") *
          col(s"__cv_${cols(j)}").cast("decimal(38,0)")).as(s"__p_${i}_$j"))
    val one = base.agg(aggs.head, aggs.tail: _*)
    def asD(c: Column): Column = c.cast("string").cast("double")
    val n = col("__n").cast("double")
    val entries = for { i <- cols.indices; j <- i until cols.size } yield
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        col("__n").as("n"),
        ((asD(col(s"__p_${i}_$j")) -
          asD(col(s"__s_${cols(i)}")) * asD(col(s"__s_${cols(j)}")) / n) /
          (n - 1.0) / 10000.0).as("cov"))
    one.select(explode(array(entries: _*)).as("__e")).select(col("__e.*"))
  }

  /**
   * Spearman rank correlation per group — Pearson over the two
   * variables' midranks, the monotone-association measure that ignores
   * outliers and nonlinearity (the feature-screening complement to
   * [[olsByGroup]]'s linear r²). DOUBLED midranks (the
   * [[mannWhitneyAuc]] trick) keep every rank integer; their sufficient
   * statistics accumulate in DECIMAL(38,0) (rank products overflow
   * longs at warehouse scale), canonicalize to double through a STRING
   * cast, and combine in the fixed [[countCorrelation]] expression tree
   * — bit-reproducible. Doubling cancels: Pearson is scale-invariant.
   *
   * Scale shape: one prefix scan per variable over its (group, value)
   * order (no per-group window sort), two equi-joins back to the data
   * on (group, value), one map-side-combined moment aggregation.
   */
  def spearmanByGroup(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    def midranks(vCol: String, out: String): DataFrame = {
      val wv = df.groupBy(col(groupCol), col(vCol)).agg(count(lit(1)).as("__c"))
      val ps = graft.operators.GlobalRank.withPrefixSum(
        wv, Seq(col(groupCol), col(vCol)), col("__c"),
        rankName = "__gr", sumName = "__cw")
      val spans = ps.groupBy(col(groupCol))
        .agg(min(col("__cw") - col("__c")).as("__s"))
      ps.join(broadcast(spans), groupCol)
        .select(col(groupCol), col(vCol),
          ((col("__cw") - col("__c") - col("__s")) * 2 + col("__c") + 1).as(out))
    }
    val joined = df.select(col(groupCol), col(xCol), col(yCol))
      .join(midranks(xCol, "__mrx"), Seq(groupCol, xCol))
      .join(midranks(yCol, "__mry"), Seq(groupCol, yCol))
    def asD(c: Column): Column = c.cast("string").cast("double")
    val mrx = col("__mrx").cast("decimal(38,0)")
    val mry = col("__mry").cast("decimal(38,0)")
    val agged = joined.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        asD(sum(mrx)).as("__sx"), asD(sum(mry)).as("__sy"),
        asD(sum(mrx * mry)).as("__sxy"),
        asD(sum(mrx * mrx)).as("__sxx"),
        asD(sum(mry * mry)).as("__syy"))
    val n = col("n").cast("double")
    val num = n * col("__sxy") - col("__sx") * col("__sy")
    val dena = n * col("__sxx") - col("__sx") * col("__sx")
    val denb = n * col("__syy") - col("__sy") * col("__sy")
    agged.select(col(groupCol), col("n"),
      when(dena > 0.0 && denb > 0.0, num / sqrt(dena * denb)).as("spearman_rho"))
  }

  /**
   * Welch's unequal-variance t statistic per group, comparing `valueCol`
   * between two levels of `condCol` — the A/B significance test run
   * per segment. Values are 2-decimal money/metric columns: they scale
   * to EXACT integer cents (`round(v·100)` — the q125 discipline), so
   * n/Σ/Σ² are order-independent longs; means, variances, and the t
   * statistic then combine in ONE fixed IEEE expression tree per group —
   * bit-reproducible on any engine. Groups missing a level or with
   * fewer than 2 observations in either level emit NULL t.
   *
   * `t = (m₁ − m₂) / sqrt(s₁²/n₁ + s₂²/n₂)` with the unbiased
   * `s² = (Σx² − (Σx)²/n) / (n−1)`.
   *
   * Scale shape: ONE map-side-combined conditional aggregation — six
   * longs per group cross the wire, nothing else.
   */
  def welchTTest(
      df: DataFrame,
      groupCol: String,
      condCol: String,
      valueCol: String,
      levelA: String,
      levelB: String): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    // second moments ride DECIMAL(38,0): a ~1e7-cent value squares to
    // 1e14 per row, so a LONG Σx² wraps silently around 1e5 such rows —
    // the first moment (Σx) stays LONG (needs ~1e12 rows to wrap)
    val centsDec = cents.cast("decimal(38,0)")
    def side(level: String, tag: String) = Seq(
      sum(when(col(condCol) === level, 1L).otherwise(0L)).as(s"n_$tag"),
      sum(when(col(condCol) === level, cents).otherwise(0L)).as(s"__s_$tag"),
      sum(when(col(condCol) === level, centsDec * centsDec)
        .otherwise(lit(0).cast("decimal(38,0)"))).as(s"__ss_$tag"))
    val agged = df.groupBy(col(groupCol))
      .agg(side(levelA, "a").head, (side(levelA, "a").tail ++ side(levelB, "b")): _*)
    def mean(tag: String) =
      col(s"__s_$tag").cast("double") / col(s"n_$tag").cast("double")
    def variance(tag: String) = {
      val n = col(s"n_$tag").cast("double")
      (col(s"__ss_$tag").cast("string").cast("double") -
        col(s"__s_$tag").cast("double") * col(s"__s_$tag").cast("double") / n) /
        (n - 1.0)
    }
    val se = sqrt(variance("a") / col("n_a").cast("double") +
      variance("b") / col("n_b").cast("double"))
    agged.select(col(groupCol), col("n_a"), col("n_b"),
      when(col("n_a") >= 2 && col("n_b") >= 2 && se > 0.0,
        // means and t are in CENTS-space; the statistic is scale-invariant
        (mean("a") - mean("b")) / se).as("t_stat"))
  }

  /**
   * Cohen's kappa between two categorical labelers (Cohen, "A coefficient
   * of agreement for nominal scales", 1960) — the chance-corrected
   * agreement score a pipeline reads off its label-QA confusion matrix
   * (declared metadata vs a heuristic classifier, or two annotators).
   *
   * Exact by construction: with integer confusion counts, kappa collapses
   * to ONE division of exact integers —
   * `(n·agree − Σ_c row_c·col_c) / (n² − Σ_c row_c·col_c)` — so the
   * DECIMAL(38,0) sufficient statistics reproduce bit-for-bit in any
   * engine. Products are cast to DECIMAL BEFORE multiplying (row·col
   * marginal products overflow longs at petabyte row counts).
   *
   * Plan shape (100 TB): the input reduces to its confusion-cell relation
   * in one map-side-combinable shuffle (|cells| <= |labels|²); marginals
   * and the final scalar run on that tiny relation. Output: one row
   * (n, agree, po, pe, kappa); kappa is NULL when chance agreement is
   * total (pe = 1, the degenerate single-cell matrix).
   */
  /**
   * CUPED variance reduction for controlled experiments (Deng, Xu, Kohavi,
   * Walker — "Improving the Sensitivity of Online Controlled Experiments
   * by Utilizing Pre-Experiment Data", WSDM'13): per-variant means of the
   * post-period metric adjusted by the pooled pre-period covariate,
   * `Y' = Y − θ·(X − mean(X))` with `θ = cov(X,Y)/var(X)` estimated over
   * ALL units (pooled θ keeps the adjustment unbiased under randomized
   * assignment). The input is one row per experimental unit.
   *
   * Exactness: X/Y must be INTEGER-valued metrics (counts, cents,
   * floor-ed sums) — the sufficient statistics (n, ΣX, ΣY, ΣXY, ΣX²)
   * accumulate in DECIMAL(38,0), immune to summation order, and θ plus
   * the adjusted means combine in one fixed IEEE tree, so a SQL oracle
   * reproduces every double bit-for-bit. By linearity,
   * `mean(Y')_v = mean(Y)_v − θ·(mean(X)_v − mean(X)_pooled)` — no
   * per-unit adjusted column ever materializes.
   *
   * Plan shape (100 TB): two map-side-combined aggregates over the unit
   * relation (one global, one per variant) and a broadcast cross of the
   * one-row global moments — the units never shuffle twice and nothing is
   * ordered. Output per variant: n_units, mean_post, mean_adj, theta
   * (θ repeated per row for readability; NULL when var(X) = 0, in which
   * case mean_adj degrades to mean_post).
   */
  def cupedAdjust(
      units: DataFrame, variantCol: String,
      preCol: String, postCol: String): DataFrame = {
    def asD(c: Column): Column = c.cast("string").cast("double")
    val dec = "decimal(38,0)"
    val x = col(preCol).cast(dec)
    val y = col(postCol).cast(dec)
    val global = units.agg(
      count(lit(1)).as("__gn"),
      sum(x).as("__gsx"), sum(y).as("__gsy"),
      sum(x * y).as("__gsxy"), sum(x * x).as("__gsxx"))
    val perVariant = units.groupBy(col(variantCol))
      .agg(count(lit(1)).as("n_units"),
        sum(x).as("__vsx"), sum(y).as("__vsy"))
    val gn = col("__gn").cast("double")
    val num = gn * asD(col("__gsxy")) - asD(col("__gsx")) * asD(col("__gsy"))
    val den = gn * asD(col("__gsxx")) - asD(col("__gsx")) * asD(col("__gsx"))
    val theta = when(den =!= 0.0, num / den)
    val nv = col("n_units").cast("double")
    val meanPost = asD(col("__vsy")) / nv
    val meanAdj = meanPost -
      coalesce(theta, lit(0.0)) * (asD(col("__vsx")) / nv - asD(col("__gsx")) / gn)
    perVariant.crossJoin(broadcast(global))
      .select(col(variantCol), col("n_units"),
        meanPost.as("mean_post"), meanAdj.as("mean_adj"), theta.as("theta"))
  }

  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    def asD(c: Column): Column = c.cast("string").cast("double")
    val dec = "decimal(38,0)"
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__ka"), col(bCol).as("__kb"))
      .agg(count(lit(1)).as("__c"))
    val rowT = cells.groupBy(col("__ka").as("__cat")).agg(sum(col("__c")).as("__ra"))
    val colT = cells.groupBy(col("__kb").as("__cat")).agg(sum(col("__c")).as("__cb"))
    // categories absent on one side contribute a zero product: inner join
    val chance = rowT.join(colT, "__cat")
      .agg(coalesce(sum(col("__ra").cast(dec) * col("__cb").cast(dec)),
        lit(0).cast(dec)).as("__sumrc"))
    val totals = cells.agg(
      sum(col("__c")).as("n"),
      sum(when(col("__ka") === col("__kb"), col("__c")).otherwise(0L)).as("agree"))
    totals.crossJoin(chance)
      .select(col("n"), col("agree"),
        col("agree").cast("double") / col("n").cast("double"),
        asD(col("__sumrc")) / asD(col("n").cast(dec) * col("n").cast(dec)),
        (col("n").cast(dec) * col("agree").cast(dec) - col("__sumrc")).as("__num"),
        (col("n").cast(dec) * col("n").cast(dec) - col("__sumrc")).as("__den"))
      .toDF("n", "agree", "po", "pe", "__num", "__den")
      .select(col("n"), col("agree"), col("po"), col("pe"),
        when(col("__den") =!= lit(0).cast(dec),
          asD(col("__num")) / asD(col("__den"))).as("kappa"))
  }
}
