package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{JaroFunctions, JaroWinklerAlgo}
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends SparkSpec {

  import spark.implicits._

  private def j(a: String, b: String): Double =
    JaroWinklerAlgo.jaro(UTF8String.fromString(a), UTF8String.fromString(b))
  private def jw(a: String, b: String): Double =
    JaroWinklerAlgo.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values (Winkler's canonical pairs)") {
    assert(math.abs(j("MARTHA", "MARHTA") - 17.0 / 18.0) < 1e-15)
    assert(math.abs(jw("MARTHA", "MARHTA") - (17.0 / 18.0 + 3 * 0.1 * (1 - 17.0 / 18.0))) < 1e-15)
    assert(math.abs(j("DIXON", "DICKSONX") - 23.0 / 30.0) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15)
  }

  test("identity, disjoint, and empty-side conventions") {
    assert(j("spark", "spark") === 1.0)
    assert(jw("spark", "spark") === 1.0)
    assert(j("abc", "xyz") === 0.0)
    assert(jw("abc", "xyz") === 0.0)
    // either-empty scores 0 (the DuckDB convention, see scaladoc)
    assert(j("", "") === 0.0 && j("a", "") === 0.0 && jw("", "b") === 0.0)
  }

  test("winkler boost applies only above 0.7 and caps the prefix at 4") {
    // jaro("abc","xbc") = 7/9 > 0.7 but shares no prefix: no boost
    assert(jw("abc", "xbc") === j("abc", "xbc"))
    // long identical prefix: boost counts at most 4 chars
    val base = j("abcdefgh", "abcdefxy")
    assert(math.abs(jw("abcdefgh", "abcdefxy") - (base + 4 * 0.1 * (1 - base))) < 1e-15)
  }

  test("matching window: distant equal chars do not match") {
    // 'a' at pos 0 vs pos 7: window floor(8/2)-1 = 3 -> no match
    assert(j("a2345678", "2345678a") < 1.0)
  }

  test("column API + codegen path agree with the algorithm on real names") {
    val df = Seq(("jonathan smith", "jonathon smyth"), ("alice", "alicia"),
      ("bob", "robert")).toDF("a", "b")
    val got = df.select(JaroFunctions.jaro_winkler_similarity(col("a"), col("b")))
      .as[Double].collect()
    val want = Seq(jw("jonathan smith", "jonathon smyth"), jw("alice", "alicia"),
      jw("bob", "robert"))
    assert(got.toSeq === want)
  }

  test("NULL inputs propagate NULL") {
    val df = Seq((Some("a"), Option.empty[String])).toDF("a", "b")
    val r = df.select(JaroFunctions.jaro_similarity(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
  }

  test("SQL registration evaluates in pure SQL") {
    org.apache.spark.sql.graft.GraftExtensions.registrations.foreach {
      case (id, inf, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
    val r = spark.sql("SELECT jaro_winkler_similarity('MARTHA', 'MARHTA') AS s")
      .collect().head.getDouble(0)
    assert(math.abs(r - jw("MARTHA", "MARHTA")) === 0.0)
  }
}
