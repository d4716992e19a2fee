package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
  private lazy val total = li.count()

  test("exact sampling returns exactly floor(count*ratio) rows") {
    for (r <- Seq(0.001, 0.01, 0.5)) {
      val n = (total * r).toLong
      assert(Sampler.exact(li, r, seed = 42L).count() === n, s"ratio $r")
    }
  }

  test("ratio edge cases: 0 -> empty, 1 -> identity, tiny -> floor to 0") {
    assert(Sampler.exact(li, 0.0, 42L).count() === 0)
    assert(Sampler.exact(li, 1.0, 42L).count() === total)
    // ratio small enough that n*r < 1 => empty but valid (reference §2.3.1)
    assert(Sampler.exact(li, 1e-9, 42L).count() === 0)
  }

  test("ratio > 1 rejected (the reference binary would hang)") {
    intercept[IllegalArgumentException](Sampler.exact(li, 1.5, 42L))
    intercept[IllegalArgumentException](Sampler.bernoulli(li, -0.1, 42L))
  }

  test("sample is a subset of the input (multiset) with the input schema") {
    val s = Sampler.exact(li, 0.05, 42L)
    assert(s.schema === li.schema)
    // multiset subset: every sampled row occurs at most as often as in input
    val cnt = s.groupBy(li.columns.map(col): _*).count().withColumnRenamed("count", "s_cnt")
    val in = li.groupBy(li.columns.map(col): _*).count().withColumnRenamed("count", "i_cnt")
    val bad = cnt.join(in, li.columns.toSeq, "left")
      .filter($"i_cnt".isNull || $"s_cnt" > $"i_cnt")
    assert(bad.count() === 0)
  }

  test("same seed -> identical sample; different seed -> different sample") {
    def ids(seed: Long) =
      Sampler.exact(li, 0.02, seed).select($"l_orderkey", $"l_linenumber")
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(ids(42L) === ids(42L))
    assert(ids(42L) !== ids(43L))
  }

  test("positional (file-based) sampling is deterministic and exact") {
    def run() = Sampler.exactFromParquet(spark, s"$sf0001/lineitem.parquet", 0.02, 7L)
    val a = run(); val b = run()
    assert(a.count() === (total * 0.02).toLong)
    assert(a.schema === li.schema)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("exactNByHexRank: exactly the n lexicographically-smallest md5 ranks, engine-replayable") {
    import org.apache.spark.sql.functions.{col, concat_ws, lit, md5}
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val rk = md5(concat_ws(":", lit("42"), col("l_orderkey").cast("string"),
      col("l_linenumber").cast("string")).cast("binary"))
    val got = Sampler.exactNByHexRank(li, 0.05, rk)
    val total = li.count()
    val n = (total * 0.05).toLong
    assert(got.count() === n)
    assert(got.schema === li.schema)
    // ground truth: brute-force n smallest ranks (the DuckDB replay recipe)
    val want = li.withColumn("__r", rk).orderBy($"__r").limit(n.toInt)
      .select($"l_orderkey", $"l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val gotKeys = got.select($"l_orderkey", $"l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(gotKeys === want)
    // deterministic: no RNG anywhere
    val again = Sampler.exactNByHexRank(li, 0.05, rk)
      .select($"l_orderkey", $"l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(again === gotKeys)
    assert(Sampler.exactNByHexRank(li, 0.0, rk).count() === 0)
    assert(Sampler.exactNByHexRank(li, 1.0, rk).count() === total)
    intercept[IllegalArgumentException] { Sampler.exactNByHexRank(li, 1.5, rk) }
  }

  test("exactN caps at total and handles n=0") {
    assert(Sampler.exactN(li, total + 100, 42L).count() === total)
    assert(Sampler.exactN(li, 0, 42L).count() === 0)
  }

  test("bernoulli is seed-deterministic") {
    val a = Sampler.bernoulli(li, 0.05, 9L).count()
    val b = Sampler.bernoulli(li, 0.05, 9L).count()
    assert(a === b)
  }

  test("stratifiedExact: exactly floor(stratumCount*ratio) rows per stratum") {
    val perStratum = li.groupBy($"l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sampler.stratifiedExact(li, "l_returnflag", 0.1, 42L)
      .groupBy($"l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perStratum.foreach { case (k, n) =>
      assert(got.getOrElse(k, 0L) === (n * 0.1).toLong, s"stratum $k")
    }
    assert(Sampler.stratifiedExact(li, "l_returnflag", 0.1, 42L).schema === li.schema)
  }

  test("stratifiedExact: NULL stratum is sampled like any other stratum") {
    val withNulls = li.withColumn("stratum",
      when($"l_linenumber" <= 2, $"l_returnflag")) // ~null for linenumber > 2
    val nullCount = withNulls.filter($"stratum".isNull).count()
    assert(nullCount > 0)
    val got = Sampler.stratifiedExact(withNulls, "stratum", 0.1, 42L)
    assert(got.filter($"stratum".isNull).count() === (nullCount * 0.1).toLong)
  }

  test("stratifiedExactByRank: per-stratum floor cardinality, md5-smallest rows win, layout-independent") {
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem;
    // a unique rank key keeps the selection fully determined (tied ranks
    // would make the picked tie member layout-dependent)
    def uniqueRank = Sampler.hexRank("42", col("l_orderkey"), col("l_linenumber"),
      col("l_partkey"), col("l_suppkey"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate").cast("date"))
    val rank = uniqueRank
    val got = Sampler.stratifiedExactByRank(li, "l_returnflag", 0.1, rank)
    val perStratum = li.groupBy($"l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotSizes = got.groupBy($"l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perStratum.foreach { case (k, n) =>
      assert(gotSizes.getOrElse(k, 0L) === (n * 0.1).toLong, s"stratum $k")
    }
    assert(got.schema === li.schema)
    // selected = the per-stratum md5-smallest prefix, stable under repartition
    def keys(d: org.apache.spark.sql.DataFrame) =
      Sampler.stratifiedExactByRank(d, "l_returnflag", 0.1, uniqueRank)
        .select($"l_orderkey", $"l_linenumber").as[(Long, Long)].collect().sorted.toSeq
    assert(keys(li) === keys(li.repartition(13, $"l_partkey")))
  }

  test("hexRank: NULL key components null-propagate (no silent collisions) and match SQL ||") {
    val df = Seq((Some(1L), Some(2L)), (Some(1L), None), (None, Some(2L)))
      .toDF("a", "b")
      .select(Sampler.hexRank("s", col("a"), col("b")).as("r"),
        md5(concat(lit("s"), lit(":"), col("a").cast("string"),
          lit(":"), col("b").cast("string")).cast("binary")).as("want"))
      .collect()
    df.foreach(r => assert(r.isNullAt(0) === r.isNullAt(1)))
    // non-null row equals the plain concat form; NULL-key rows yield NULL
    // rank instead of colliding with shorter keys (concat_ws would skip)
    assert(df.count(_.isNullAt(0)) === 2)
    assert(df.filter(r => !r.isNullAt(0)).forall(r => r.getString(0) == r.getString(1)))
  }

  test("stratified (Bernoulli): only listed strata survive; seeded") {
    val s1 = Sampler.stratified(li, "l_returnflag", Map[Any, Double]("A" -> 0.2, "R" -> 0.1), 5L)
    assert(s1.select($"l_returnflag").distinct().as[String].collect().toSet.subsetOf(Set("A", "R")))
    assert(s1.count() === Sampler.stratified(li, "l_returnflag", Map[Any, Double]("A" -> 0.2, "R" -> 0.1), 5L).count())
  }

  test("uniformity: chi-square over 10 position buckets within 4 sigma") {
    // sample 10% by positional rank; bucket source rows into deciles by
    // l_orderkey order; expect roughly equal pick counts per decile
    val s = Sampler.exactFromParquet(spark, s"$sf0001/lineitem.parquet", 0.1, 3L)
    val n = s.count().toDouble
    val buckets = s.select(ntile(10).over(
      org.apache.spark.sql.expressions.Window.orderBy($"l_orderkey", $"l_linenumber")).as("b"))
      .groupBy($"b").count().collect().map(_.getLong(1).toDouble)
    val exp = n / 10.0
    val chi2 = buckets.map(o => (o - exp) * (o - exp) / exp).sum
    // df=9; mean 9, sd ~4.24; 4 sigma ~ 26 — generous but catches gross bias
    assert(chi2 < 26.0, s"chi2=$chi2 buckets=${buckets.mkString(",")}")
  }

  test("systematicByHexRank: exact 1-in-k coverage, layout independence, step=1") {
    import org.apache.spark.sql.functions.{col, concat, lit, md5}
    val df = (1L to 1000L).toDF("id")
    val rank = md5(concat(lit("s:"), col("id").cast("string")).cast("binary"))
    val got = Sampler.systematicByHexRank(df, step = 7, rank)
      .collect().map(_.getLong(0)).toSet
    // ranks 1, 8, 15, ... -> ceil(1000/7) survivors
    assert(got.size === 143)
    // deterministic under any physical layout
    val got2 = Sampler.systematicByHexRank(df.repartition(13), step = 7, rank)
      .collect().map(_.getLong(0)).toSet
    assert(got2 === got)
    // the survivor set is the k-th-rank slice of the md5 order, exactly
    val ordered = (1L to 1000L).sortBy(id =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"s:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(got === ordered.zipWithIndex.collect {
      case (id, i) if i % 7 == 0 => id
    }.toSet)
    assert(Sampler.systematicByHexRank(df, step = 1, rank).count() === 1000L)
    intercept[IllegalArgumentException] {
      Sampler.systematicByHexRank(df, step = 0, rank)
    }
  }
}
