package graft.operators

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile: exact counts, nulls, min/max strings on crafted data") {
    val df = Seq(
      (1L, Some("b"), Some(2.5)),
      (2L, Some("a"), None),
      (3L, None, Some(7.25)),
      (4L, Some("a"), Some(2.5))
    ).toDF("id", "s", "v")
    val p = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("id", "s", "v"))
    val id = p("id")
    assert(id.getLong(1) === 4L && id.getLong(2) === 0L && id.getLong(3) === 4L)
    assert(id.getString(4) === "1" && id.getString(5) === "4")
    val s = p("s")
    assert(s.getLong(2) === 1L && s.getLong(3) === 2L)
    assert(s.getString(4) === "a" && s.getString(5) === "b")
    val v = p("v")
    assert(v.getLong(2) === 1L && v.getLong(3) === 2L)
    assert(v.getString(4) === "2.5" && v.getString(5) === "7.25")
  }

  test("profile: approx mode returns the same shape with near-exact distincts") {
    val df = spark.range(1000).selectExpr("id", "id % 10 AS m")
    val p = Profiler.profile(df, exact = false).collect()
      .map(r => r.getString(0) -> r).toMap
    // HLL relative error default ~5%; these cardinalities are tiny so exact
    assert(p("m").getLong(3) === 10L)
    val nd = p("id").getLong(3)
    assert(nd > 950 && nd < 1050, s"approx distinct $nd")
  }

  test("profile: zero-column projection fails fast") {
    intercept[IllegalArgumentException] {
      Profiler.profile(Seq((1, 2)).toDF("a", "b").select())
    }
  }

  test("histogram: bin edges, clamping, null drop, counts sum to non-null rows") {
    val df = Seq(Some(-5.0), Some(0.0), Some(9.99), Some(10.0), Some(25.0),
      Some(99.0), Some(150.0), None).toDF("v")
    val bins = Profiler.histogram(df, "v", lo = 0.0, hi = 100.0, nBins = 10)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    // -5 clamps to bin 0; 150 clamps to bin 9; null dropped
    assert(bins(0L) === ((0.0, 10.0, 3L)))  // -5, 0, 9.99
    assert(bins(1L) === ((10.0, 20.0, 1L))) // 10.0
    assert(bins(2L) === ((20.0, 30.0, 1L))) // 25
    assert(bins(9L) === ((90.0, 100.0, 2L))) // 99, 150(clamped)
    assert(bins.values.map(_._3).sum === 7L)
    assert(bins.size === 4) // only non-empty bins
    intercept[IllegalArgumentException] {
      Profiler.histogram(df, "v", 10.0, 10.0, 5)
    }
    intercept[IllegalArgumentException] {
      Profiler.histogram(df, "v", 0.0, 1.0, 0)
    }
  }

  test("joinSizeEstimate equals the materialized join, catches fanout") {
    import spark.implicits._
    // left: key 1 x 3, key 2 x 2, key 9 x 1; right: key 1 x 4, key 2 x 1
    val l = (Seq.fill(3)(1L) ++ Seq.fill(2)(2L) :+ 9L).toDF("lk")
    val r = (Seq.fill(4)(1L) :+ 2L).toDF("rk")
    val got = Profiler.joinSizeEstimate(l, "lk", r, "rk").collect().head
    assert(got.getLong(0) === 6L && got.getLong(1) === 5L)
    assert(got.getLong(2) === 3L && got.getLong(3) === 2L)
    // 3*4 + 2*1 = 14 — and the real join confirms
    assert(got.getLong(4) === 14L)
    assert(got.getLong(4) ===
      l.join(r, l("lk") === r("rk")).count())
    assert(got.getLong(5) === 12L) // the hot key's 3x4 block
    // disjoint keys: zero, not null
    val none = Profiler.joinSizeEstimate(l, "lk", Seq(7L).toDF("rk"), "rk")
      .collect().head
    assert(none.getLong(4) === 0L && none.getLong(5) === 0L)
  }

  test("inclusionCoefficient: hand-computed overlap, nulls dropped") {
    import spark.implicits._
    // a keys {1,2,3} (dups + null ignored), b keys {2,3,4,5}
    val a = Seq[java.lang.Long](1L, 1L, 2L, 3L, null).toDF("ka")
    val b = Seq[java.lang.Long](2L, 3L, 4L, 5L, 5L).toDF("kb")
    val got = Profiler.inclusionCoefficient(a, "ka", b, "kb").collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) === ((3L, 4L, 2L)))
    assert(got.getDouble(3) === 2.0 / 3.0)
    assert(got.getDouble(4) === 0.5)
    assert(got.getDouble(5) === 0.4) // 2 / (3 + 4 - 2)
    // perfect FK: a subset of b -> inclusion 1.0
    val fk = Profiler.inclusionCoefficient(
      Seq(2L, 3L).toDF("ka"), "ka", b, "kb").collect().head
    assert(fk.getDouble(3) === 1.0)
  }

  test("functionalDependency: holding and violating cases") {
    import spark.implicits._
    val df = Seq((1L, "x", "p"), (1L, "x", "q"), (2L, "y", "p"),
      (2L, "y", "p"), (3L, "z", "r")).toDF("k", "det", "multi")
    // k -> det holds (every k sees one det)
    val holds = Profiler.functionalDependency(df, Seq("k"), "det").collect().head
    assert((holds.getLong(0), holds.getLong(1), holds.getLong(2)) === ((3L, 0L, 1L)))
    assert(holds.getBoolean(3))
    // k -> multi violated by k=1 ({p, q})
    val broken = Profiler.functionalDependency(df, Seq("k"), "multi").collect().head
    assert((broken.getLong(0), broken.getLong(1), broken.getLong(2)) === ((3L, 1L, 2L)))
    assert(!broken.getBoolean(3))
    intercept[IllegalArgumentException] {
      Profiler.functionalDependency(df, Seq.empty, "det")
    }
  }
}
