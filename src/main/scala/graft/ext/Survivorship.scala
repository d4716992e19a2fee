package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Golden-record survivorship: collapse each entity-resolution cluster to ONE
 * merged record by per-attribute survivorship rules — the step after
 * [[Dedup.jaroWinklerClusters]]/[[Dedup.minhashPairs]] turn raw records into
 * clusters, and the end of the classic record-linkage pipeline (Fellegi &
 * Sunter 1969 frame; the rule vocabulary is the standard MDM set: most
 * frequent, longest, latest, min/max).
 *
 * Every rule is DETERMINISTIC: ties break on the value itself (largest
 * wins), so the merged record is a pure function of the cluster's member
 * set — reproducible across runs, partitionings, and engines, and therefore
 * oracle-checkable bit-for-bit. NULLs never survive while any member has a
 * value (survivorship's point); a rule yields NULL only when every member
 * is NULL on that attribute.
 *
 * Scale shape: single-pass rules (longest/latest/min/max/count) ride ONE
 * hash aggregation keyed by the cluster id via `max_by(value, ordering
 * struct)` — mergeable, map-side combined, no window sort, no per-cluster
 * state beyond the current winner. Each MOST-FREQUENT rule needs value
 * counts, so it adds one (cluster, value)-keyed aggregation followed by a
 * cluster-keyed `max_by` — two shuffles on vocabulary-bounded relations.
 * The final assembly joins |clusters|-row relations on the cluster key
 * (co-partitioned hash joins; every input to a join here has already
 * collapsed to one row per cluster or per (cluster, value)).
 */
object Survivorship {

  /** Per-attribute survivorship rule; `out` names the surviving column. */
  sealed trait Rule { def attr: String; def out: String }
  /** Majority vote over non-null values; ties -> largest value. */
  final case class MostFrequent(attr: String, out: String) extends Rule
  /** Longest string (char count, the SQL `length`); ties -> largest value. */
  final case class Longest(attr: String, out: String) extends Rule
  /** Value on the row with the greatest `tsAttr`; ties -> largest value. */
  final case class Latest(attr: String, tsAttr: String, out: String) extends Rule
  final case class MaxOf(attr: String, out: String) extends Rule
  final case class MinOf(attr: String, out: String) extends Rule

  object MostFrequent { def apply(a: String): MostFrequent = MostFrequent(a, a) }
  object Longest { def apply(a: String): Longest = Longest(a, a) }
  object MaxOf { def apply(a: String): MaxOf = MaxOf(a, a) }
  object MinOf { def apply(a: String): MinOf = MinOf(a, a) }

  /**
   * One golden record per cluster: `clusterCol`, `n_members` (cluster
   * size), then one column per rule in rule order.
   */
  def goldenRecords(records: DataFrame, clusterCol: String, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "goldenRecords needs at least one rule")
    val outs = rules.map(_.out)
    require(outs.distinct.size == outs.size,
      s"duplicate output column among ${outs.mkString(", ")}")
    require(!outs.contains(clusterCol) && !outs.contains("n_members"),
      s"rule outputs may not collide with '$clusterCol'/'n_members'")
    val ck = col(clusterCol)

    // null-skipping deterministic arg-max: max_by ignores rows whose
    // ordering is NULL, so wrapping the ordering struct in when(isNotNull)
    // makes NULL attributes invisible unless the whole cluster is NULL
    def argMax(value: Column, ordering: Column): Column =
      max_by(value, when(value.isNotNull, ordering))

    val singlePass: Seq[Column] = Seq(count(lit(1)).as("n_members")) ++ rules.collect {
      case Longest(a, out) =>
        argMax(col(a), struct(length(col(a)), col(a))).as(out)
      case Latest(a, tsA, out) =>
        argMax(col(a), struct(col(tsA), col(a))).as(out)
      case MaxOf(a, out) => max(col(a)).as(out)
      case MinOf(a, out) => min(col(a)).as(out)
    }
    val base = records.groupBy(ck).agg(singlePass.head, singlePass.tail: _*)

    rules.collect { case MostFrequent(a, out) =>
      records.filter(col(a).isNotNull)
        .groupBy(ck, col(a)).agg(count(lit(1)).as("__n"))
        .groupBy(ck).agg(max_by(col(a), struct(col("__n"), col(a))).as(out))
    }.foldLeft(base)((acc, freq) => acc.join(freq, Seq(clusterCol), "left"))
      .select((col(clusterCol) +: col("n_members") +: rules.map(r => col(r.out))): _*)
  }
}
