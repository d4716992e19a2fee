package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{DDSketchBuffer, DDSketchFunctions}

class DDSketchSpec extends SparkSpec {

  import spark.implicits._

  private val alpha = 0.01

  /** Deterministic heavy-tail-ish values: exp of a triangle wave, spanning
    * ~4 orders of magnitude. */
  private def values(n: Int): IndexedSeq[Double] =
    (0 until n).map(i => math.exp((i % 997).toDouble / 997.0 * 9.0) + i % 13)

  private def exactLower(sorted: IndexedSeq[Double], q: Double): Double =
    sorted(math.floor(q * (sorted.length - 1)).toInt)

  test("relative-error guarantee across the quantile range") {
    val vs = values(20000)
    val buf = new DDSketchBuffer(alpha, 4096)
    vs.foreach(buf.add(_))
    val sorted = vs.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999)) {
      val est = buf.quantile(q)
      val ex = exactLower(sorted, q)
      assert(math.abs(est - ex) <= alpha * ex + 1e-9,
        s"q=$q est=$est exact=$ex rel=${math.abs(est - ex) / ex}")
    }
  }

  test("merge is exact: merged parts equal the single-pass sketch") {
    val vs = values(9999)
    val whole = new DDSketchBuffer(alpha, 4096)
    vs.foreach(whole.add(_))
    val parts = vs.grouped(1000).map { chunk =>
      val b = new DDSketchBuffer(alpha, 4096)
      chunk.foreach(b.add(_))
      b
    }.toSeq
    val merged = new DDSketchBuffer(alpha, 4096)
    parts.foreach(merged.mergeFrom)
    for (q <- Seq(0.05, 0.5, 0.95, 0.99))
      assert(merged.quantile(q) === whole.quantile(q))
  }

  test("serde round-trip preserves every quantile") {
    val buf = new DDSketchBuffer(alpha, 4096)
    values(5000).foreach(buf.add(_))
    val back = DDSketchBuffer.deserialize(buf.serialize())
    for (q <- Seq(0.0, 0.01, 0.5, 0.99, 1.0))
      assert(back.quantile(q) === buf.quantile(q))
  }

  test("zeros and negatives order correctly around zero") {
    val buf = new DDSketchBuffer(alpha, 4096)
    Seq(-100.0, -10.0, 0.0, 0.0, 10.0, 100.0, 1000.0).foreach(buf.add(_))
    assert(buf.quantile(0.0) <= -99.0) // most negative, within alpha
    assert(buf.quantile(0.5) === 0.0)
    assert(buf.quantile(1.0) >= 990.0)
    assert(math.abs(buf.quantile(0.0) + 100.0) <= alpha * 100.0 + 1e-9)
  }

  test("collapse under maxBins keeps upper quantiles within alpha") {
    val vs = values(20000)
    val buf = new DDSketchBuffer(alpha, 64) // force heavy collapsing
    vs.foreach(buf.add(_))
    val sorted = vs.sorted
    for (q <- Seq(0.9, 0.99, 0.999)) {
      val ex = exactLower(sorted, q)
      assert(math.abs(buf.quantile(q) - ex) <= alpha * ex + 1e-9,
        s"q=$q collapsed est=${buf.quantile(q)} exact=$ex")
    }
  }

  test("DataFrame aggregate + probe: grouped quantiles within alpha of exact") {
    val df = values(8000).zipWithIndex
      .map { case (v, i) => (i % 3, v) }.toDF("g", "v")
    val got = df.groupBy("g")
      .agg(DDSketchFunctions.ddsketch_agg(col("v"), alpha, 4096).as("sk"),
        expr("percentile(v, 0.9)").as("ex90"))
      .select(col("g"), DDSketchFunctions.dd_quantile(col("sk"), 0.9).as("est90"), col("ex90"))
      .collect()
    assert(got.length === 3)
    got.foreach { r =>
      val (est, ex) = (r.getDouble(1), r.getDouble(2))
      // interpolated exact vs discrete sketch: allow alpha + a hair of slack
      assert(math.abs(est - ex) <= 2 * alpha * ex, s"g=${r.getInt(0)} est=$est ex=$ex")
    }
  }

  test("SQL registration: ddsketch_agg and dd_quantile compose in pure SQL") {
    org.apache.spark.sql.graft.GraftExtensions.registrations.foreach {
      case (id, inf, builder) =>
        if (!spark.catalog.functionExists(id.funcName))
          spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
    values(2000).toDF("v").createOrReplaceTempView("dd_vals")
    val r = spark.sql(
      "SELECT dd_quantile(ddsketch_agg(v, 0.01, 4096), 0.5) AS p50 FROM dd_vals")
      .collect().head.getDouble(0)
    val ex = exactLower(values(2000).sorted, 0.5)
    assert(math.abs(r - ex) <= alpha * ex + 1e-9)
  }
}
