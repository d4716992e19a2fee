package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Skyline (Pareto-frontier) selection: the rows not dominated by any other
 * row, where y dominates x iff y is >= x on every dimension and > on at
 * least one (Börzsönyi, Kossmann, Stocker, "The Skyline Operator", ICDE
 * 2001). The curation use: "keep the quality/length frontier per language"
 * — documents for which no other document is at least as good on every axis
 * and strictly better on one.
 *
 * Distributed shape is the two-phase local-skyline algorithm:
 *
 *   1. LOCAL: each partition reduces to its own skyline via a sorted
 *      block-nested loop — rows sorted by dimension sum descending, so a
 *      row can only be dominated by a row already in the local skyline
 *      (the sum is a monotone preference function: a dominator's sum is
 *      strictly larger). One `mapPartitions` pass, no shuffle.
 *   2. GLOBAL: the union of local skylines C is a SUPERSET of the global
 *      skyline (every global skyline row survives its own partition), and
 *      every dominated candidate is dominated by some global-skyline row
 *      (follow dominators to a maximal one — dominance is a strict partial
 *      order — and maximal rows are in C). So filtering C against
 *      BROADCAST C is exact: one collect of the candidate relation, one
 *      broadcast, one scan of C.
 *
 * The candidate set is the scale knob: low-dimensional skylines are small
 * (d=2..4 over continuous-ish data gives |skyline| ~ O(log^(d-1) n)), but
 * anti-correlated dimensions can blow it up, so the collect is guarded by
 * `maxCandidates` with a loud failure (the searchPq query-cap discipline)
 * — the caller's escalation is more partitions (smaller local skylines
 * don't help |C|; fewer dims or pre-filtering do).
 *
 * Ties/duplicates: rows equal on EVERY dimension do not dominate each
 * other; all of them survive together — matching the NOT EXISTS oracle
 * semantics exactly.
 *
 * NULL dimensions are rejected up front (dominance is undefined on NULL);
 * filter or impute first ([[RobustStats]] has the imputers).
 */
object Skyline {

  /**
   * Skyline of `df` over numeric `dims`, all maximized (negate a column to
   * minimize it). Output schema = input schema, rows = the Pareto frontier.
   */
  /** @param maxSinglePassRows hard bound on the candidate rows any ONE
    *   tournament task may materialize: the escalation path coalesces
    *   survivors into ever-fewer tasks, and for genuinely anti-correlated
    *   data (frontier ~ n) the bottom-out single-partition pass would
    *   otherwise become a silent executor OOM / unbounded single-task
    *   compute. Exceeding it fails LOUDLY with the bound in the message —
    *   an exact skyline that big needs fewer dims or a pre-filter, not a
    *   bigger heap. */
  def skyline(df: DataFrame, dims: Seq[String], maxCandidates: Int = 2000000,
      maxSinglePassRows: Long = 20000000L): DataFrame = {
    require(dims.nonEmpty, "skyline needs at least one dimension")
    dims.foreach { d =>
      require(df.columns.contains(d), s"no such column '$d' among ${df.columns.mkString(", ")}")
    }
    val spark = df.sparkSession
    val schema = df.schema
    val idx = dims.map(schema.fieldIndex)
    val dimNames = dims.mkString(", ")

    def dimsOf(r: Row): Array[Double] = {
      val a = new Array[Double](idx.length)
      var i = 0
      while (i < idx.length) {
        a(i) = r.get(idx(i)) match {
          case n: java.lang.Number =>
            val d = n.doubleValue()
            // NaN comparisons are all false: a NaN row could never be
            // dominated (it would silently survive every frontier) and it
            // breaks the sum-descending sufficiency argument — reject as
            // loudly as NULL
            if (d.isNaN) throw new IllegalArgumentException(
              s"NaN in skyline dimension(s) $dimNames: dominance is undefined on NaN — filter or impute first")
            d
          case null => throw new IllegalArgumentException(
            s"NULL in skyline dimension(s) $dimNames: dominance is undefined on NULL — filter or impute first")
          case other => throw new IllegalArgumentException(
            s"skyline dimension must be numeric, got $other")
        }
        i += 1
      }
      a
    }

    // y dominates x: >= everywhere, > somewhere
    def dominates(y: Array[Double], x: Array[Double]): Boolean = {
      var strict = false
      var i = 0
      while (i < y.length) {
        if (y(i) < x(i)) return false
        if (y(i) > x(i)) strict = true
        i += 1
      }
      strict
    }

    def localSkyline(rows: Iterator[Row]): Iterator[Row] = {
      // sum-descending order makes the running skyline a sufficient
      // dominator set: any dominator of x sums strictly higher than x
      val sorted = rows.map(r => (r, dimsOf(r))).toArray
      java.util.Arrays.sort(sorted, Ordering.by[(Row, Array[Double]), Double](-_._2.sum))
      val sky = new scala.collection.mutable.ArrayBuffer[(Row, Array[Double])]()
      var i = 0
      while (i < sorted.length) {
        val (r, d) = sorted(i)
        if (!sky.exists(s => dominates(s._2, d))) sky += ((r, d))
        i += 1
      }
      sky.iterator.map(_._1)
    }

    // localCheckpoint: the candidate set is consumed three times (counted
    // cap, dims collect, final refine) — without it each action would
    // re-scan the input and re-run the local phase
    var candRdd = df.rdd.mapPartitions(localSkyline).localCheckpoint()

    // counted cap BEFORE the collect, so an anti-correlated blow-up can
    // never OOM the driver. Instead of failing loudly (the pre-r7
    // behavior), escalate through TOURNAMENT rounds: coalesce candidates
    // into ~8x fewer partitions and local-refine again — merging local
    // skylines prunes cross-partition dominated rows, and the local
    // skyline of a union of candidate sets is still a superset of the
    // global skyline (same two-phase argument, applied recursively). If
    // the rounds bottom out at ONE partition, that pass has seen every
    // candidate, so its output IS the exact global skyline — no broadcast
    // needed (this is the genuinely-huge-frontier path; it trades the
    // broadcast for one executor holding the frontier, which is the best
    // any exact algorithm can do).
    var nCand = candRdd.count()
    var parts = candRdd.getNumPartitions
    var escalations = 0
    while (nCand > maxCandidates && parts > 1) {
      val nextParts = math.max(1, parts / 8)
      // the memory guard the escalation must NOT remove: a merged pass
      // materializes ~nCand/nextParts rows per task (rows.toArray in
      // localSkyline) — refuse loudly before funneling an anti-correlated
      // blow-up into one heap. The merge uses repartition (round-robin
      // shuffle), NOT coalesce: coalesce glues whole parent partitions, so
      // a skewed survivor distribution could put far more than the
      // estimate into one task and bypass this guard (ADVICE r8) —
      // repartition makes the per-task bound actually hold, at the cost of
      // shuffling only the already-pruned candidate set.
      val perTask = nCand / nextParts + 1
      require(perTask <= maxSinglePassRows,
        s"skyline tournament would funnel ~$perTask candidate rows into one task " +
          s"(maxSinglePassRows=$maxSinglePassRows, candidates=$nCand): the frontier " +
          "itself is too large to refine exactly — reduce dimensions, pre-filter, " +
          "or raise maxSinglePassRows explicitly")
      if (escalations == 0)
        System.err.println(s"[skyline] candidate set $nCand exceeds maxCandidates=" +
          s"$maxCandidates — escalating through tournament rounds ($parts -> $nextParts partitions)")
      escalations += 1
      parts = nextParts
      candRdd = candRdd.repartition(parts).mapPartitions(localSkyline).localCheckpoint()
      nCand = candRdd.count()
    }
    if (nCand > maxCandidates) {
      // parts == 1: the last round was a single-partition pass over all
      // surviving candidates — already the exact frontier
      return spark.createDataFrame(candRdd, schema)
    }

    // only the dimension vectors ship — the broadcast is |C| doubles-per-
    // dim, not full rows
    val bc: Broadcast[Array[Array[Double]]] =
      spark.sparkContext.broadcast(candRdd.map(dimsOf).collect())
    val finalSky = candRdd.mapPartitions { rows =>
      val cand = bc.value
      rows.filter { r =>
        val d = dimsOf(r)
        !cand.exists(c => dominates(c, d))
      }
    }
    spark.createDataFrame(finalSky, schema)
  }

  /**
   * Per-group skyline: the frontier within each `groupCols` key — the
   * curation shape ("per language"). Low-cardinality group keys are the
   * scale hazard (3 languages would light up 3 tasks and idle the rest of
   * the cluster), so the exchange is SALTED: phase 1 spreads each group
   * across `spark.sql.shuffle.partitions` salt buckets (salt = hash of the
   * dimension values, deterministic) and reduces every bucket to its local
   * frontier; phase 2 re-shuffles only the surviving candidates on the
   * bare group key and runs the same dominance filter once per group —
   * exact by the two-phase argument (each group's frontier survives its
   * bucket; every dominated candidate has a maximal dominator among the
   * group's candidates). No driver collect, no broadcast: groups never
   * interact.
   */
  def skylinePerGroup(df: DataFrame, groupCols: Seq[String], dims: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "skylinePerGroup needs at least one group column")
    require(dims.nonEmpty, "skyline needs at least one dimension")
    val spark = df.sparkSession
    val schema = df.schema
    val dimIdx = dims.map(schema.fieldIndex)
    val grpIdx = groupCols.map(schema.fieldIndex)
    val dimNames = dims.mkString(", ")

    def dimsOf(r: Row): Array[Double] = {
      val a = new Array[Double](dimIdx.length)
      var i = 0
      while (i < dimIdx.length) {
        a(i) = r.get(dimIdx(i)) match {
          case n: java.lang.Number =>
            val d = n.doubleValue()
            // NaN comparisons are all false: a NaN row could never be
            // dominated (it would silently survive every frontier) and it
            // breaks the sum-descending sufficiency argument — reject as
            // loudly as NULL
            if (d.isNaN) throw new IllegalArgumentException(
              s"NaN in skyline dimension(s) $dimNames: dominance is undefined on NaN — filter or impute first")
            d
          case null => throw new IllegalArgumentException(
            s"NULL in skyline dimension(s) $dimNames: dominance is undefined on NULL — filter or impute first")
          case other => throw new IllegalArgumentException(
            s"skyline dimension must be numeric, got $other")
        }
        i += 1
      }
      a
    }
    def dominates(y: Array[Double], x: Array[Double]): Boolean = {
      var strict = false
      var i = 0
      while (i < y.length) {
        if (y(i) < x(i)) return false
        if (y(i) > x(i)) strict = true
        i += 1
      }
      strict
    }

    // Tungsten hash exchanges (NOT RDD groupBy, whose Java-serialized
    // shuffle of Row objects is the slow path); partition-local dominance
    // filter per group key
    def perGroupFrontier(parted: DataFrame) =
      parted.rdd.mapPartitions { rows =>
        rows.toArray.groupBy(r => grpIdx.map(r.get))
          .iterator.flatMap { case (_, rs) =>
            val sorted = rs.map(r => (r, dimsOf(r)))
            java.util.Arrays.sort(sorted, Ordering.by[(Row, Array[Double]), Double](-_._2.sum))
            val sky = new scala.collection.mutable.ArrayBuffer[(Row, Array[Double])]()
            var i = 0
            while (i < sorted.length) {
              val (r, d) = sorted(i)
              if (!sky.exists(s => dominates(s._2, d))) sky += ((r, d))
              i += 1
            }
            sky.iterator.map(_._1)
          }
      }

    // phase 1: salted spread, local frontiers shrink each bucket
    val salt = pmod(hash(dims.map(col): _*), lit(spark.sessionState.conf.numShufflePartitions))
    val salted = df.withColumn("__sky_salt", salt)
      .repartition((groupCols :+ "__sky_salt").map(col): _*)
      .drop("__sky_salt")
    val candidates = spark.createDataFrame(perGroupFrontier(salted), schema)
    // phase 2: only candidates re-shuffle, on the bare group key
    spark.createDataFrame(
      perGroupFrontier(candidates.repartition(groupCols.map(col): _*)), schema)
  }
}
