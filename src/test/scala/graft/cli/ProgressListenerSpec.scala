package graft.cli

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class ProgressListenerSpec extends SparkSpec {

  test("emits a progress line per `every` input rows during a real scan (reference sample.rs:61-66 UX)") {
    val l = new ProgressListener("graft-test", every = 1000L)
    spark.sparkContext.addSparkListener(l)
    try {
      // ~6k-row scan with every=1000 must cross the threshold several times
      spark.read.parquet(s"$sf0001/lineitem.parquet").filter(col("l_quantity") >= 0).count()
      // listener bus is async: poll briefly for the events to drain
      val deadline = System.nanoTime() + 10_000_000_000L
      while (l.emitted.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val lines = l.emitted
      assert(lines.nonEmpty, "expected at least one progress line for a ~6k-row scan")
      val pat = """\[graft-test\] processed (\d+) rows""".r
      lines.foreach {
        case pat(n) => assert(n.toLong >= 1000L)
        case other => fail(s"malformed progress line: $other")
      }
      // totals are monotonically increasing
      val ns = lines.map { case pat(n) => n.toLong }
      assert(ns === ns.sorted)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("stays silent below the threshold") {
    val l = new ProgressListener("graft-quiet", every = 10_000_000L)
    spark.sparkContext.addSparkListener(l)
    try {
      spark.read.parquet(s"$sf0001/region.parquet").count()
      Thread.sleep(500)
      assert(l.emitted.isEmpty)
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
