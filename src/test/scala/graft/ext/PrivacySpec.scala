package graft.ext

import graft.SparkSpec

/** Hand-computed ground truth for the privacy-governance family; the
  * sf-scale versions ride the DuckDB hash oracle (q237/q238). */
class PrivacySpec extends SparkSpec {

  import spark.implicits._

  // (city, age_band, diagnosis) — classic quasi = (city, age_band)
  private lazy val records = Seq(
    ("A", "20s", "flu"), ("A", "20s", "flu"), ("A", "20s", "cold"),
    ("A", "30s", "flu"),
    ("B", "20s", "cold"), ("B", "20s", "cold"),
    (null.asInstanceOf[String], "30s", "flu"),
    (null.asInstanceOf[String], "30s", "cold")
  ).toDF("city", "age_band", "diagnosis")

  test("kAnonymityProfile: class sizes, l-diversity, and flags match by hand") {
    val got = Privacy
      .kAnonymityProfile(records, Seq("city", "age_band"), "diagnosis", k = 2, l = 2)
      .collect()
      .map(r => ((Option(r.getString(0)).getOrElse("-"), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    assert(got(("A", "20s")) === ((3L, 2L, false, false)))
    assert(got(("A", "30s")) === ((1L, 1L, true, true))) // singleton: both violations
    assert(got(("B", "20s")) === ((2L, 1L, false, true))) // 2 rows, 1 diagnosis
    assert(got(("-", "30s")) === ((2L, 2L, false, false))) // NULL quasi is a class
    assert(got.size === 4)
  }

  test("suppress: survivors are k-anonymous by construction, sub-k classes drop") {
    val kept = Privacy.suppress(records, Seq("city", "age_band"), k = 2)
    // only the (A, 30s) singleton drops — including its row count
    assert(kept.count() === 7)
    assert(kept.filter($"city" === "A" && $"age_band" === "30s").count() === 0)
    // every surviving class has >= k members (the k-anonymity invariant)
    val survivorClasses = kept.groupBy($"city", $"age_band").count().collect()
    assert(survivorClasses.forall(_.getLong(2) >= 2))
    // the NULL-quasi class survives intact (null-safe class equality)
    assert(kept.filter($"city".isNull).count() === 2)
  }

  test("suppress: k=1 keeps everything; input guards fail fast") {
    assert(Privacy.suppress(records, Seq("city", "age_band"), k = 1).count() === 8)
    intercept[IllegalArgumentException] {
      Privacy.suppress(records, Seq.empty, k = 2)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityProfile(records, Seq("city"), "diagnosis", k = 0, l = 1)
    }
  }

  test("pseudonymize: deterministic salted SHA-256 tokens, NULLs stay NULL") {
    val df = Seq((1L, "alice"), (2L, "bob"), (3L, null.asInstanceOf[String]), (4L, "alice"))
      .toDF("id", "name")
    val out = Privacy.pseudonymize(df, Seq("name"), salt = "s1")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // matches a locally computed MessageDigest over the same byte layout
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expect = md.digest("s1|alice".getBytes("UTF-8"))
      .map(b => f"${b & 0xFF}%02x").mkString
    assert(out(1L).get === expect)
    assert(out(1L) === out(4L)) // referential integrity: same value, same token
    assert(out(1L) !== out(2L))
    assert(out(3L).isEmpty) // NULL identifier -> NULL, no phantom token
    // a different salt yields disjoint tokens
    val other = Privacy.pseudonymize(df, Seq("name"), salt = "s2")
      .collect().map(r => Option(r.getString(1))).flatten.toSet
    assert(other.intersect(out.values.flatten.toSet).isEmpty)
    intercept[IllegalArgumentException] { Privacy.pseudonymize(df, Seq("name"), "") }
  }

  test("withLaplaceNoise: deterministic, partitioning-immune, correct scale, exact 1/eps scaling") {
    // base 0.0 so v_dp IS the draw (no float cancellation in the readback)
    val df = (0L until 20000L).map(i => (i, 0.0)).toDF("id", "v")
    def noise(d: org.apache.spark.sql.DataFrame, eps: Double) =
      Privacy.withLaplaceNoise(d, "v", Seq("id"), eps, sensitivity = 1.0, seed = "s")
        .select($"id", $"v_dp").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = noise(df, 1.0)
    val b = noise(df.repartition(13), 1.0)
    assert(a === b) // same (seed, key) -> same draw, any partitioning
    // empirical |Laplace(1)| mean is the scale (=1): 20k draws within 5%
    val meanAbs = a.values.map(math.abs).sum / a.size
    assert(meanAbs > 0.95 && meanAbs < 1.05, s"mean |noise| $meanAbs")
    // both signs occur and roughly balance
    val pos = a.values.count(_ > 0)
    assert(pos > a.size * 0.45 && pos < a.size * 0.55)
    // doubling epsilon halves every draw EXACTLY (scale is linear)
    val half = noise(df, 2.0)
    assert(a.forall { case (k, v) => half(k) === v / 2.0 })
    intercept[IllegalArgumentException] {
      Privacy.withLaplaceNoise(df, "v", Seq("id"), 0.0, 1.0, "s")
    }
  }
}
