package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-record survivorship: rule semantics, deterministic tie-breaks,
  * NULL discipline, partitioning independence. The sf-scale capstone
  * (JW clusters -> survivorship) rides the gate (q286). */
class SurvivorshipSpec extends SparkSpec {

  import Survivorship._
  import spark.implicits._

  private val recs = Seq(
    // cluster 1: clear majorities, one null street
    (1L, "en", "web", "aaaa", Some(10L), "2024-01-03"),
    (1L, "en", "api", "bb", Some(20L), "2024-01-01"),
    (1L, "de", "web", "cccc", None, "2024-01-02"),
    // cluster 2: all-null numeric, frequency tie on lang (de vs en -> en wins)
    (2L, "de", "web", "x", None, "2024-02-01"),
    (2L, "en", "web", "yy", None, "2024-02-02")
  ).toDF("cluster", "lang", "src", "txt", "score", "day")
    .withColumn("score", col("score").cast("long"))

  test("rule semantics: majority, longest, latest, max, min; NULLs never beat values") {
    val g = goldenRecords(recs, "cluster", Seq(
      MostFrequent("lang"),
      Longest("txt"),
      Latest("txt", "day", "latest_txt"),
      MaxOf("score", "max_score"),
      MinOf("day", "first_day")))
      .collect().map(r => r.getLong(0) -> r).toMap

    val c1 = g(1L)
    assert(c1.getAs[Long]("n_members") === 3L)
    assert(c1.getAs[String]("lang") === "en") // 2 of 3
    assert(c1.getAs[String]("txt") === "cccc") // len 4 tie vs aaaa -> larger value
    assert(c1.getAs[String]("latest_txt") === "aaaa") // on the 01-03 row
    assert(c1.getAs[Long]("max_score") === 20L) // null score invisible
    assert(c1.getAs[String]("first_day") === "2024-01-01")

    val c2 = g(2L)
    assert(c2.getAs[String]("lang") === "en") // 1-1 tie -> largest value
    assert(c2.getAs[Any]("max_score") === null) // all-null stays null
  }

  test("deterministic across partitionings and input order") {
    val base = goldenRecords(recs, "cluster",
      Seq(MostFrequent("lang"), Longest("txt"))).collect().sortBy(_.getLong(0)).toSeq
    for (parts <- Seq(1, 7)) {
      val shuffled = recs.orderBy(rand(parts.toLong)).repartition(parts)
      val got = goldenRecords(shuffled, "cluster",
        Seq(MostFrequent("lang"), Longest("txt"))).collect().sortBy(_.getLong(0)).toSeq
      assert(got === base, s"parts=$parts")
    }
  }

  test("output-name collisions and empty rule lists fail loudly") {
    assert(intercept[IllegalArgumentException] {
      goldenRecords(recs, "cluster", Seq(MostFrequent("lang"), Longest("txt", "lang")))
    }.getMessage.contains("duplicate"))
    assert(intercept[IllegalArgumentException] {
      goldenRecords(recs, "cluster", Nil)
    }.getMessage.contains("at least one rule"))
    assert(intercept[IllegalArgumentException] {
      goldenRecords(recs, "cluster", Seq(MostFrequent("lang", "n_members")))
    }.getMessage.contains("collide"))
  }
}
