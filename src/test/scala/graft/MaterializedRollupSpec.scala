package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MaterializedRollup

/** Materialized-rollup rewrite: rewritten aggregates are bit-identical to
  * the direct plan, the scan provably re-roots onto the rollup table, and
  * non-derivable shapes are left alone. The sf-scale rewrite rides the
  * gate (q288) against the plain-SQL oracle. */
class MaterializedRollupSpec extends SparkSpec {

  private val factPath = s"$sf0001/lineitem.parquet"
  private val rollupPath = "/tmp/graft_rollup_spec"

  private def qtyDec = col("l_quantity").cast("decimal(12,2)")

  private lazy val spec = MaterializedRollup.create(
    spark, factPath, rollupPath,
    dims = Seq("l_returnflag", "l_linestatus"),
    measures = Seq(
      "qty_dec" -> qtyDec,
      "price" -> col("l_extendedprice")))

  private def scanPaths(df: DataFrame): String =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.mkString(",")
    }.mkString(";")

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def aggQuery(): DataFrame =
    spark.read.parquet(factPath)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(qtyDec).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))

  test("subset-dim aggregate rewrites onto the rollup and matches the direct plan bit-for-bit") {
    spec
    val q = aggQuery()
    assert(scanPaths(q).contains(rollupPath), s"expected rollup scan, got ${scanPaths(q)}")
    val qRows = sorted(q) // materialize BEFORE re-create invalidates the file listing
    MaterializedRollup.unregister(factPath)
    val direct = aggQuery()
    assert(!scanPaths(direct).contains(rollupPath))
    val directRows = sorted(direct)
    MaterializedRollup.create(spark, factPath, rollupPath,
      Seq("l_returnflag", "l_linestatus"),
      Seq("qty_dec" -> qtyDec, "price" -> col("l_extendedprice")))
    assert(qRows === directRows)
  }

  test("full-dim and filtered-dim aggregates rewrite; filter survives on the rollup") {
    spec
    def mk() = spark.read.parquet(factPath)
      .filter(col("l_returnflag") =!= "A")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(qtyDec).as("s"), count(lit(1)).as("n"))
    val q = mk()
    assert(scanPaths(q).contains(rollupPath), s"expected rollup scan, got ${scanPaths(q)}")
    val qRows = sorted(q)
    assert(q.collect().map(_.getString(0)).forall(_ != "A"))
    MaterializedRollup.unregister(factPath)
    val direct = mk()
    val directRows = sorted(direct)
    MaterializedRollup.create(spark, factPath, rollupPath,
      Seq("l_returnflag", "l_linestatus"),
      Seq("qty_dec" -> qtyDec, "price" -> col("l_extendedprice")))
    assert(qRows === directRows)
  }

  test("global (ungrouped) aggregate rewrites and agrees, incl. the count-over-empty contract") {
    spec
    def mk() = spark.read.parquet(factPath)
      .agg(count(lit(1)).as("n"), max(col("l_extendedprice")).as("mx"))
    val q = mk()
    assert(scanPaths(q).contains(rollupPath), s"expected rollup scan, got ${scanPaths(q)}")
    val qRows = sorted(q)
    MaterializedRollup.unregister(factPath)
    val direct = mk()
    val directRows = sorted(direct)
    MaterializedRollup.create(spark, factPath, rollupPath,
      Seq("l_returnflag", "l_linestatus"),
      Seq("qty_dec" -> qtyDec, "price" -> col("l_extendedprice")))
    assert(qRows === directRows)
  }

  test("non-derivable shapes leave the plan alone") {
    spec
    val fact = spark.read.parquet(factPath)
    val shapes = Seq(
      // avg has no stored partial
      fact.groupBy(col("l_returnflag")).agg(avg(col("l_quantity")).as("a")),
      // distinct aggregates never rewrite
      fact.groupBy(col("l_returnflag")).agg(countDistinct(col("l_quantity")).as("d")),
      // measure-column filter blocks the rewrite
      fact.filter(col("l_quantity") > 10).groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")),
      // non-dim grouping blocks it
      fact.groupBy(col("l_shipdate")).agg(count(lit(1)).as("n")),
      // sum of a DIFFERENTLY-TYPED cast is not the registered shape
      fact.groupBy(col("l_returnflag")).agg(sum(col("l_quantity").cast("decimal(20,4)")).as("s")),
      // a NON-DETERMINISTIC filter samples fact ROWS; re-evaluating it over
      // rollup groups would change the distribution — must block the rewrite
      // even though its column references are dim-only
      fact.filter(rand(7) < 0.5 && col("l_returnflag") === "A")
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")),
      // count(NULL) is 0 per group; the Σ__cnt rewrite would return the
      // group ROW count — the literal pattern must be non-null-only
      fact.groupBy(col("l_returnflag")).agg(count(lit(null)).as("n")))
    shapes.foreach { q =>
      assert(!scanPaths(q).contains(rollupPath), q.queryExecution.optimizedPlan.toString)
      assert(scanPaths(q).contains("lineitem.parquet"))
    }
    // and the count(NULL) VALUE contract holds with the rollup registered
    val zeros = fact.groupBy(col("l_returnflag")).agg(count(lit(null)).as("n"))
      .collect().map(_.getLong(1))
    assert(zeros.nonEmpty && zeros.forall(_ == 0L))
  }

  test("unregister restores the direct scan") {
    spec
    MaterializedRollup.unregister(factPath)
    try {
      val q = spark.read.parquet(factPath)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      assert(!scanPaths(q).contains(rollupPath))
    } finally {
      MaterializedRollup.create(spark, factPath, rollupPath,
        Seq("l_returnflag", "l_linestatus"),
        Seq("qty_dec" -> qtyDec, "price" -> col("l_extendedprice")))
      ()
    }
  }
}
