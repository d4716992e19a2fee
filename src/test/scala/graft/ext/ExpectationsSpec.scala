package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {

  import spark.implicits._
  import Expectations._

  // 4 rows: one null name, one negative qty, one dup key
  private lazy val df = Seq(
    (1L, Some("alice"), 5.0, "A"),
    (2L, None, -1.0, "B"),
    (3L, Some("carol"), 2.0, "A"),
    (3L, Some("dave"), 3.0, "Z")
  ).toDF("id", "name", "qty", "flag")

  private def result(checkName: String, colName: String) =
    verify(df,
      Seq(notNull("name"), nonNegative("qty"), inSet("flag", Seq("A", "B")),
        inRange("qty", 0.0, 5.0), satisfies("qty_small", "qty", col("qty") <= 3.0, 0.5)),
      uniqueKeys = Seq(Seq("id")))
      .filter(col("check_name") === checkName && col("col_name") === colName)
      .collect().map(r => (r.getDouble(2), r.getBoolean(3))).head

  test("completeness fraction and failure") {
    assert(result("not_null", "name") === ((0.75, false)))
  }

  test("non-negative compliance") {
    assert(result("non_negative", "qty") === ((0.75, false)))
  }

  test("in-set compliance") {
    assert(result("in_set", "flag") === ((0.75, false)))
  }

  test("in-range compliance") {
    assert(result("in_range", "qty") === ((0.75, false)))
  }

  test("minFraction threshold: 0.5 passes at metric 0.75") {
    assert(result("qty_small", "qty") === ((0.75, true)))
  }

  test("uniqueness catches the duplicated key") {
    assert(result("unique", "id") === ((0.75, false)))
  }

  test("clean table passes the whole suite") {
    val clean = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "qty")
    val out = verify(clean, Seq(notNull("name"), nonNegative("qty")),
      uniqueKeys = Seq(Seq("id"))).collect()
    assert(out.length === 3 && out.forall(_.getBoolean(3)))
  }

  test("null rows in the unique key are excluded from both sides") {
    val withNull = Seq(Some(1L), Some(2L), None, None)
      .toDF("id")
    val out = verify(withNull, Nil, uniqueKeys = Seq(Seq("id"))).collect().head
    assert(out.getDouble(2) === 1.0 && out.getBoolean(3))
  }

  test("approx unique mode: metric within the HLL envelope and passes") {
    val many = spark.range(0, 5000).toDF("id")
    val out = verify(many, Nil, uniqueKeys = Seq(Seq("id")), exactUnique = false)
      .collect().head
    assert(out.getString(0) === "unique_approx")
    assert(math.abs(out.getDouble(2) - 1.0) < 0.03 && out.getBoolean(3))
  }

  test("single aggregate pass: no joins, one Exchange for the row-level suite") {
    val plan = verify(df, Seq(notNull("name"), nonNegative("qty")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expectation suite should not join:\n$plan")
  }

  test("leadingDigitProfile: cents-string digits, exclusions, exact shares") {
    import spark.implicits._
    val vals = Seq(1.0, 25.5, 0.05, 999.99, 19.0, 0.0, -3.5)
    val got = Expectations.leadingDigitProfile(vals.toDF("v"), "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getAs[Double]("share"), r.getAs[Double]("benford_p")))).toMap
    // cents: 100->1, 2550->2, 5->5, 99999->9, 1900->1; 0 and negative out
    assert(got.keySet === Set(1L, 2L, 5L, 9L))
    assert(got(1L)._1 === 2L && got(1L)._2 === 0.4)
    assert(got(2L)._1 === 1L && got(5L)._1 === 1L && got(9L)._1 === 1L)
    // expectations are the shared literals, and contribution follows the
    // fixed tree exactly
    assert(got(1L)._3 === Expectations.BenfordP(0))
    val r1 = Expectations.leadingDigitProfile(vals.toDF("v"), "v")
      .filter($"digit" === 1).collect().head
    val e = 5.0 * Expectations.BenfordP(0)
    assert(r1.getAs[Double]("contribution") === (2.0 - e) * (2.0 - e) / e)
  }
}
