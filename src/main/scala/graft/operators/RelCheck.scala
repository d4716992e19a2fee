package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass relation checks for the gate capstones (optimization r11).
  *
  * The capstones pinned multiset equality as
  * `a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty` — TWO actions, each
  * of which re-executes BOTH inputs' full lineage (for the index-follower
  * gates that lineage is a from-scratch index rebuild), so the check cost
  * four subtree computations and four shuffles. [[multisetEquals]] is the
  * same predicate as ONE action computing each input once: count rows per
  * distinct tuple on each side, null-safe full-outer join of the two count
  * relations, empty mismatch set ⇔ equal multisets. Guide §2.4 (remove
  * redundant passes); equivalence is pinned by RelCheckSpec against the
  * exceptAll form.
  */
object RelCheck {

  /** True iff `a` and `b` are equal as MULTISETS (duplicate rows keep
    * multiplicity; NULLs compare null-safely, exactly like exceptAll).
    * Columns are matched by position against `a`'s names. */
  def multisetEquals(a: DataFrame, b: DataFrame): Boolean = {
    require(a.columns.length == b.columns.length,
      s"multisetEquals: arity mismatch ${a.columns.length} vs ${b.columns.length}")
    val cols = a.columns.toSeq
    val ca = a.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__ca"))
    val cb = b.toDF(cols: _*)
      .groupBy(cols.map(col): _*).agg(count(lit(1)).as("__cb"))
    val cond = cols.map(c => ca(c) <=> cb(c)).reduce(_ && _)
    ca.join(cb, cond, "full_outer")
      .filter(!(col("__ca") <=> col("__cb")))
      .isEmpty
  }
}
