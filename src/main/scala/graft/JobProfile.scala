package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** Measurement harness (guide §1): run one declared query with a listener
  * that attributes every Spark job's wall time to its call site, so the
  * expensive phase INSIDE a multi-action capstone is visible. Dev tool —
  * never part of the bench or the gate.
  *
  *   runMain graft.JobProfile <sfDir> <queryName>[,<queryName>...] [passes]
  */
object JobProfile {
  private final class Agg { var n = 0; var wallMs = 0L }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val passes = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val sqlStarts = new java.util.concurrent.ConcurrentHashMap[Long, (Long, String)]()
    val bySite = new java.util.concurrent.ConcurrentHashMap[String, Agg]()
    @volatile var record = false
    def add(site: String, ms: Long): Unit =
      bySite.compute(site, (_, old) => {
        val a = if (old == null) new Agg else old
        a.n += 1; a.wallMs += ms; a
      })
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val inSql = Option(e.properties)
          .exists(p => p.getProperty("spark.sql.execution.id") != null)
        val site = if (inSql) null
          else e.stageInfos.lastOption.map(_.name).getOrElse("?")
        starts.put(e.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.remove(e.jobId)
        // jobs inside a SQL execution are accounted by the execution event
        if (s != null && s._2 != null && record)
          add("rdd: " + s._2, (System.nanoTime() - s._1) / 1000000L)
      }
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
              // nested executions (subqueries etc.) roll up into the root
              if s.rootExecutionId.forall(_ == s.executionId) =>
            sqlStarts.put(s.executionId, (System.nanoTime(), s.description))
          case d: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
            val s = sqlStarts.remove(d.executionId)
            if (s != null && record)
              add("sql: " + s._2, (System.nanoTime() - s._1) / 1000000L)
          case _ => ()
        }
    })

    // warmup exactly like Bench so the measured pass is warm
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      if (new java.io.File("/root/testdata/sf0.001").isDirectory)
        SparkEntry.queries("q83_stream_sample")(spark, "/root/testdata/sf0.001").count()
    } catch { case _: Throwable => () }

    import scala.jdk.CollectionConverters._
    names.foreach { name =>
      bySite.clear()
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // one warm pass unrecorded
      record = true
      val t0 = System.nanoTime()
      (1 to passes).foreach(_ => fn(spark, sfDir).count())
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let async job-end events drain
      record = false
      println(f"QUERY $name wall=${wall / passes}%.3f s/pass over $passes passes")
      val rows = bySite.asScala.toSeq.sortBy(-_._2.wallMs)
      val totMs = rows.map(_._2.wallMs).sum
      println(f"total job wall: ${totMs / 1000.0 / passes}%.3f s/pass across ${rows.map(_._2.n).sum / passes} jobs/pass")
      rows.take(40).foreach { case (site, a) =>
        println(f"${a.wallMs / 1000.0 / passes}%8.3f s/pass  ${a.n / passes}%4d jobs  $site")
      }
    }
    spark.stop()
  }
}
