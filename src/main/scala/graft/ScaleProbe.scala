package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.operators.{Sampler, SemiJoinReducer}

/**
 * Scale probe: replicate the sf0.1 tables ~10x into /tmp and run the
 * heavyweight operators, verifying their cost curves hold (the "would this
 * survive another 10x?" question, empirically). Not part of the driver
 * contract — a development tool.
 *
 *   runMain graft.ScaleProbe [workDir]
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft_scale")
    val src = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(table: String, copies: Int, keyCols: Seq[String], offset: Long): DataFrame = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      val copiesDf = (0 until copies).map { i =>
        keyCols.foldLeft(base)((df, kc) => df.withColumn(kc, col(kc) + lit(i * offset)))
      }
      copiesDf.reduce(_ unionAll _)
    }

    val gen = Map(
      // 6M lineitem / 150k orders with consistent order keys per copy
      "lineitem" -> (() => replicate("lineitem", 10, Seq("l_orderkey"), 1000000000L)),
      "orders" -> (() => replicate("orders", 10, Seq("o_orderkey"), 1000000000L)),
      // 20k docs: 4 copies -> a heavily near-duplicate corpus
      "documents" -> (() => replicate("documents", 4, Seq("doc_id"), 1000000L)),
      "embeddings" -> (() => replicate("embeddings", 5, Seq("vec_id"), 1000000L)))
    gen.foreach { case (name, mk) =>
      val path = s"$work/$name.parquet"
      // _SUCCESS marker, not bare existence: a crashed prior run leaves a
      // partial directory that would silently skew every timing below
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        mk().write.mode("overwrite").parquet(path)
        println(s"[scale] generated $path")
      }
    }

    def read(n: String) = spark.read.parquet(s"$work/$n.parquet")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"SCALE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
    }

    println(s"[scale] lineitem=${read("lineitem").count()} orders=${read("orders").count()} " +
      s"documents=${read("documents").count()} embeddings=${read("embeddings").count()}")

    timed("semijoin_orders") {
      SemiJoinReducer.reduce(read("orders"), "o_orderkey", read("lineitem"), "l_orderkey").count()
    }
    timed("sample_exact_0.001") {
      Sampler.exact(read("lineitem"), 0.001, seed = 42L).count()
    }
    timed("per_group_k100") {
      Sampler.perGroupExactK(read("lineitem"), Seq("l_returnflag"), 100, seed = 42L).count()
    }
    timed("dedup_minhash") {
      Dedup.minhashPairs(read("documents"), "doc_id", "text", threshold = 0.7).count()
    }
    timed("dedup_ngram_exact") {
      Dedup.ngramJaccardPairs(read("documents"), "doc_id", "text", n = 3, threshold = 0.7).count()
    }
    timed("dedup_embedding") {
      Dedup.embeddingNearDupPairs(read("embeddings"), "vec_id", "embedding",
        dim = 64, threshold = 0.4, numPlanes = 16, bands = 8).count()
    }
    timed("corpus_pipeline") {
      val scored = ext.TextStats.qualityScore(
        ext.TextStats.langId(read("documents"), "text"), "text")
      val kept = scored.filter(col("lang_pred") === "en" && col("quality_score") >= 0.3)
      ext.TextStats.withTokenCounts(Dedup.exactDedup(kept, "text", "doc_id"), "text")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ws_tokens")).as("sum_ws_tokens"))
        .count()
    }
    timed("vector_centroids") {
      read("embeddings")
        .select((col("vec_id") % 8).cast("long").as("grp"), posexplode(col("embedding")))
        .groupBy(col("grp"), col("pos"))
        .agg(count(lit(1)).as("n"), sum(col("col").cast("double")).as("s"))
        .count()
    }
    timed("knn_ivf") {
      val e = read("embeddings")
      ext.Similarity.ivfTopK(e, "vec_id", "embedding",
        e.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, ext.Similarity.IvfConfig(nlist = 64, nprobe = 4)).count()
    }
    spark.stop()
  }
}
