package graft

import org.apache.spark.sql.graft.GraftExtensions

/** The SQL registration surface: every injected function resolves and
  * computes through `spark.sql(...)` (registered into the active session's
  * registry — the same builders spark.sql.extensions wires at startup). */
class GraftExtensionsSpec extends SparkSpec {

  private lazy val registered: Unit = {
    val reg = spark.sessionState.functionRegistry
    GraftExtensions.registrations.foreach { case (id, inf, builder) =>
      reg.registerFunction(id, inf, builder)
    }
  }

  test("graft_txlog table functions: SQL reads with time travel, dv application, and the CDF") {
    import org.apache.spark.sql.functions.col
    GraftExtensions.registerTableFunctions(spark)
    val tbl = graft.io.TempDirs.create("ext_tvf_").resolve("t").toString
    graft.io.TxLog.create(spark, tbl, spark.range(0, 10).selectExpr("id AS k"))
    graft.io.TxLog.append(spark, tbl, spark.range(10, 20).selectExpr("id AS k"))
    graft.io.TxLog.deleteRows(spark, tbl, col("k") === 5L)
    def one(sql: String) = spark.sql(sql).head().getLong(0)
    // snapshot read applies the deletion vector
    assert(one(s"SELECT count(*) FROM graft_txlog('$tbl')") === 19L)
    // version and wall-clock time travel
    assert(one(s"SELECT count(*) FROM graft_txlog('$tbl', 0)") === 10L)
    val future = System.currentTimeMillis() + 3600000L
    assert(one(s"SELECT count(*) FROM graft_txlog('$tbl', 'ts=$future')") === 19L)
    // the CDF as a relation
    assert(one(s"SELECT count(*) FROM graft_txlog_changes('$tbl', 1) " +
      "WHERE _change_type = 'delete'") === 1L)
    // predicates on the TVF behave like any relation (pushed to the scan)
    assert(one(s"SELECT count(*) FROM graft_txlog('$tbl') WHERE k < 3") === 3L)
    // bad args fail with named errors
    intercept[Exception] { spark.sql(s"SELECT * FROM graft_txlog(42)").collect() }
  }

  test("vector kernels resolve and compute via pure SQL") {
    registered
    spark.read.parquet(s"$sf0001/embeddings.parquet").createOrReplaceTempView("emb")
    val r = spark.sql(
      """SELECT vec_cosine(embedding, embedding) AS c,
        |       vec_dot(embedding, embedding) AS d,
        |       vec_l2sq(embedding, embedding) AS z
        |FROM emb LIMIT 5""".stripMargin).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-9) // cosine(v, v) == 1
      assert(row.getDouble(1) > 0.0 && row.getDouble(2) === 0.0)
    }
  }

  test("sketch aggregate resolves via pure SQL with literal k") {
    registered
    spark.read.parquet(s"$sf0001/documents.parquet").createOrReplaceTempView("docs_ext")
    val r = spark.sql(
      "SELECT frequent_items(lang, 10) AS fi FROM docs_ext").head().getSeq[Any](0)
    assert(r.nonEmpty && r.size <= 10)
  }

  test("bloom_filter_agg accepts decimal fpp rates below 1% and integer percents") {
    registered
    spark.read.parquet(s"$sf0001/orders.parquet").createOrReplaceTempView("ord_ext")
    // decimal literal: a 0.1% rate — inexpressible under the old integer-percent API
    val dec = spark.sql(
      "SELECT bloom_filter_agg(o_orderkey, 10000, 0.001) AS f FROM ord_ext")
      .head().getAs[Array[Byte]](0)
    // integer literal: still read as a percent
    val pct = spark.sql(
      "SELECT bloom_filter_agg(o_orderkey, 10000, 1) AS f FROM ord_ext")
      .head().getAs[Array[Byte]](0)
    assert(dec.length > pct.length) // lower fpp => more bits
  }

  test("count_min_agg resolves via pure SQL and matches the column API bit-for-bit") {
    registered
    import spark.implicits._
    val df = (1 to 300).map(i => s"w${i % 9}").toDF("k")
    df.createOrReplaceTempView("cms_in")
    val viaSql = spark.sql("SELECT count_min_agg(k, 4, 256) AS c FROM cms_in")
      .head.getAs[Array[Byte]](0)
    val viaCol = df.agg(graft.functions.count_min_agg(
      org.apache.spark.sql.functions.col("k"), 4, 256)).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(viaSql, viaCol))
  }

  test("theta_sketch_agg resolves via pure SQL and matches the column API bit-for-bit") {
    registered
    import spark.implicits._
    val df = (1L to 500L).map(i => i % 123L).toDF("k")
    df.createOrReplaceTempView("theta_in")
    val viaSql = spark.sql("SELECT theta_sketch_agg(k, 256) AS s FROM theta_in")
      .head.getAs[Array[Byte]](0)
    val viaCol = df.agg(org.apache.spark.sql.graft.ThetaFunctions
      .theta_sketch_agg(org.apache.spark.sql.functions.col("k"), 256))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(viaSql, viaCol))
    assert(org.apache.spark.sql.graft.ThetaBuffer.deserialize(viaSql)
      .estimateDistinct === 123.0)
  }

  test("out-of-range integer fpp fails with a message naming the parameter") {
    registered
    spark.read.parquet(s"$sf0001/orders.parquet").createOrReplaceTempView("ord_ext2")
    val e = intercept[Exception] {
      spark.sql("SELECT bloom_filter_agg(o_orderkey, 10000, 0) FROM ord_ext2").collect()
    }
    assert(e.getMessage.contains("fpp"))
  }

  test("bottom_k_by_rank and frequent_items_weighted resolve via pure SQL") {
    registered
    spark.read.parquet(s"$sf0001/documents.parquet").createOrReplaceTempView("docs_bk")
    // per-lang 3 smallest doc ids, via the portable-rank aggregate in SQL
    val r = spark.sql(
      """SELECT lang, bottom_k_by_rank(md5(CAST(doc_id AS STRING)), doc_id, 3) AS ids
        |FROM docs_bk GROUP BY lang""".stripMargin).collect()
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getSeq[Long](1).size <= 3))
    val w = spark.sql(
      "SELECT frequent_items_weighted(lang, n_chars, 5) FROM docs_bk").head().getSeq[Any](0)
    assert(w.nonEmpty && w.size <= 5)
  }

  test("non-literal k fails with a clear message") {
    registered
    spark.read.parquet(s"$sf0001/documents.parquet").createOrReplaceTempView("docs_ext2")
    val e = intercept[Exception] {
      spark.sql("SELECT frequent_items(lang, CAST(n_chars AS INT)) FROM docs_ext2").collect()
    }
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("k must"))
  }

  test("g711_expand resolves in SQL and matches the codec LUT for every byte") {
    registered
    import spark.implicits._
    // one row carrying all 256 code bytes
    Seq(Tuple1(Array.tabulate(256)(_.toByte)))
      .toDF("codes").createOrReplaceTempView("g711_codes")
    for (law <- Seq("mulaw", "alaw")) {
      val got = spark.sql(s"SELECT g711_expand(codes, '$law') FROM g711_codes")
        .collect().head.getSeq[Int](0)
      val expand: Int => Int =
        if (law == "mulaw") graft.ext.Multimodal.G711Codec.mulawExpand
        else graft.ext.Multimodal.G711Codec.alawExpand
      assert(got === (0 until 256).map(expand))
    }
    // composes with array HOFs for SQL-side audio math
    val rms = spark.sql(
      """SELECT aggregate(g711_expand(codes, 'mulaw'), 0L, (a, x) -> a + x * x)
        |FROM g711_codes""".stripMargin).collect().head.getLong(0)
    assert(rms > 0L)
    val e = intercept[Exception] {
      spark.sql("SELECT g711_expand(codes, 'pcm') FROM g711_codes").collect()
    }
    assert(e.getMessage.contains("mulaw"))
  }

  test("graft_txlog write procedures: upsert/delete/restore/vacuum/optimize through pure SQL; EXPLAIN commits nothing; one commit per invocation") {
    import org.apache.spark.sql.functions.col
    GraftExtensions.registerTableFunctions(spark)
    val tbl = graft.io.TempDirs.create("ext_proc_").resolve("t").toString
    graft.io.TxLog.create(spark, tbl,
      spark.range(0, 100).selectExpr("id AS k", "id * 10 AS v", "CAST(id % 7 AS DOUBLE) AS a"))
    spark.range(50, 110).selectExpr("id AS k", "id * 100 AS v", "CAST(id % 7 AS DOUBLE) AS a")
      .createOrReplaceTempView("proc_updates")
    // upsert: one summary row, the write applied
    val u = spark.sql(
      s"SELECT * FROM graft_txlog_upsert('$tbl', 'SELECT * FROM proc_updates', 'k')").head()
    assert(u.getLong(0) === 1L && u.getString(1) === "upsert:keys=k")
    assert(graft.io.TxLog.read(spark, tbl).count() === 110L)
    assert(graft.io.TxLog.read(spark, tbl).filter(col("k") === 60L).head().getLong(1) === 6000L)
    // one commit per invocation even under multiple actions on one Dataset
    val del = spark.sql(s"SELECT * FROM graft_txlog_delete('$tbl', 'k >= 105')")
    assert(del.count() === 1L)
    del.collect() // second action on the SAME Dataset: memoized, no new commit
    assert(graft.io.TxLog.history(tbl).length === 3,
      s"ops: ${graft.io.TxLog.history(tbl).map(_.op).mkString(", ")}")
    assert(graft.io.TxLog.read(spark, tbl).count() === 105L)
    // EXPLAIN plans the procedure without committing
    spark.sql(s"EXPLAIN SELECT * FROM graft_txlog_restore('$tbl', 0)").collect()
    assert(graft.io.TxLog.history(tbl).length === 3)
    // merge with a delete branch + no inserts
    spark.range(0, 10).selectExpr("id AS k").createOrReplaceTempView("proc_merge")
    spark.sql(s"SELECT * FROM graft_txlog_merge('$tbl', 'SELECT k FROM proc_merge', " +
      "'k', 'v = v + 1; a = a * CAST(2.0 AS DOUBLE)', 'k = 3', false)").collect()
    val after = graft.io.TxLog.read(spark, tbl)
    assert(after.count() === 104L) // k=3 merge-deleted
    assert(after.filter(col("k") === 4L).head().getLong(1) === 41L)
    // restore + vacuum + scoped optimize round out the surface
    spark.sql(s"SELECT * FROM graft_txlog_restore('$tbl', 2)").collect()
    assert(graft.io.TxLog.read(spark, tbl).count() === 105L)
    val o = spark.sql(
      s"SELECT * FROM graft_txlog_optimize('$tbl', 'k', 'v', 4, true)").head()
    assert(o.getString(1) === "optimize_zorder:k,v")
    val vac = spark.sql(s"SELECT * FROM graft_txlog_vacuum('$tbl', 2)").head()
    assert(vac.getString(1).startsWith("vacuum:retainFrom="))
    // n-dim optimize rides the same procedure surface
    val o3 = spark.sql(
      s"SELECT * FROM graft_txlog_optimize_dims('$tbl', 'k, v, a', 4)").head()
    assert(o3.getString(1) === "optimize_zorder:k,v,a")
    // loud literal validation
    val bad = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_txlog_upsert('$tbl', 'SELECT 1', '')").collect()
    }
    assert(bad.getMessage.contains("key column"))
  }

  test("follower procedures: hnsw/minhash/ivfpq advance via pure SQL with (advanced, consumed_version, action)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.registerTableFunctions(spark)
    val root = graft.io.TempDirs.create("ext_follow_")
    def vecOf(id: Long): Seq[Float] =
      (0 until 8).map(d => (((id * 2654435761L + d * 40503L) % 1000L) / 1000.0f) - 0.5f)
    val vdf = (0L until 40L).map(i => (i, vecOf(i))).toDF("id", "vec")
    val ddf = (0L until 40L).map(i => (i, s"tok$i tok${i + 1} tok${i + 2}")).toDF("id", "text")

    def lifecycle(proc: String, src: String, dst: String, data: org.apache.spark.sql.DataFrame,
        valCol: String): Unit = {
      graft.io.TxLog.create(spark, src, data.filter($"id" < 30L))
      def call() = spark.sql(
        s"SELECT * FROM $proc('$src', '$dst', 'c', 'id', '$valCol')").head()
      val r1 = call()
      assert(r1.getBoolean(0) && r1.getLong(1) === 0L && r1.getString(2) === "bootstrap", s"$proc: $r1")
      graft.io.TxLog.append(spark, src, data.filter($"id" >= 30L))
      val r2 = call()
      assert(r2.getBoolean(0) && r2.getLong(1) === 1L && r2.getString(2) === "advance", s"$proc: $r2")
      val r3 = call()
      assert(!r3.getBoolean(0) && r3.getLong(1) === 1L && r3.getString(2) === "caught_up", s"$proc: $r3")
      // EXPLAIN plans without committing
      val before = graft.io.TxLog.history(dst).length
      spark.sql(s"EXPLAIN SELECT * FROM $proc('$src', '$dst', 'c', 'id', '$valCol')").collect()
      assert(graft.io.TxLog.history(dst).length === before, s"$proc EXPLAIN committed")
    }
    lifecycle("graft_txlog_follow_hnsw", root.resolve("hs").toString,
      root.resolve("hd").toString, vdf, "vec")
    lifecycle("graft_txlog_follow_minhash", root.resolve("ms").toString,
      root.resolve("md").toString, ddf, "text")
    lifecycle("graft_txlog_follow_ivfpq", root.resolve("is").toString,
      root.resolve("id").toString, vdf, "vec")
    // and the followed states resolve/serve
    assert(graft.ext.IndexFollower.nodesOf(
      graft.io.TxLog.read(spark, root.resolve("hd").toString)).count() === 40L)
    assert(graft.ext.IndexFollower.minhashIndexOf(
      graft.io.TxLog.read(spark, root.resolve("md").toString)).base.count() === 40L)
    val (ivf, _) = graft.ext.IndexFollower.ivfPqOf(
      graft.io.TxLog.read(spark, root.resolve("id").toString))
    assert(ivf.assigned.count() === 40L)
  }

  test("graft_txlog_replicate: SQL-driven CDC replica converges under mixed ops; EXPLAIN commits nothing") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.registerTableFunctions(spark)
    val root = graft.io.TempDirs.create("ext_replica_")
    val src = root.resolve("src").toString
    val dst = root.resolve("dst").toString
    graft.io.TxLog.create(spark, src, Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"))
    graft.io.TxLog.append(spark, src, Seq((4L, 40L)).toDF("k", "v"))
    def call(extra: String = "") = spark.sql(
      s"SELECT * FROM graft_txlog_replicate('$src', '$dst', 'k', 'c'$extra)").head()
    val r1 = call()
    assert(r1.getLong(0) === 1L, s"bootstrap: $r1") // one snapshot batch
    // mixed ops drain under a trigger bound of ONE version per batch
    graft.io.TxLog.upsert(spark, src, Seq((2L, 99L)).toDF("k", "v"), Seq("k"))
    graft.io.TxLog.deleteRows(spark, src, col("k") === 3L)
    graft.io.TxLog.append(spark, src, Seq((5L, 50L)).toDF("k", "v"))
    val r2 = call(", 1")
    assert(r2.getLong(0) === 3L, s"drain: $r2")
    val got = graft.io.TxLog.read(spark, dst).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 99L), (4L, 40L), (5L, 50L)))
    // caught up: zero batches, no commits
    assert(call().getLong(0) === 0L)
    val before = graft.io.TxLog.history(dst).length
    spark.sql(s"EXPLAIN SELECT * FROM graft_txlog_replicate('$src', '$dst', 'k', 'c')")
      .collect()
    assert(graft.io.TxLog.history(dst).length === before, "EXPLAIN committed")
  }

  test("replicate floor overrun: loud refusal by default, exactly-once resync on request — lost deletes recovered") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val TxLog = graft.io.TxLog
    val root = graft.io.TempDirs.create("rep_floor_")
    val src = root.resolve("src").toString
    val dst = root.resolve("dst").toString
    TxLog.create(spark, src, Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")) // v0
    assert(TxLog.replicate(spark, src, dst, Seq("k"), "c") === 1)
    // the replica pauses; the source moves on AND vacuums past its mark
    TxLog.append(spark, src, Seq((4L, 40L)).toDF("k", "v"))           // v1
    TxLog.upsert(spark, src, Seq((2L, 99L)).toDF("k", "v"), Seq("k")) // v2
    TxLog.deleteRows(spark, src, col("k") === 3L)                      // v3
    TxLog.append(spark, src, Seq((5L, 50L)).toDF("k", "v"))           // v4
    TxLog.vacuum(spark, src, 1)                                        // floor past v0
    assert(TxLog.retentionFloor(src) > 1L, "fixture must vacuum past the mark")
    // default: loud refusal naming the floor
    val e = intercept[IllegalStateException] {
      TxLog.replicate(spark, src, dst, Seq("k"), "c")
    }
    assert(e.getMessage.contains("retention floor"), e.getMessage)
    // resync: ONE keyed commit; k=3's delete (lost to the vacuum) is
    // recovered by the key anti-join
    assert(TxLog.replicate(spark, src, dst, Seq("k"), "c",
      rebootstrapOnFloorOverrun = true) === 1)
    def replica() = TxLog.read(spark, dst).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replica() === Set((1L, 10L), (2L, 99L), (4L, 40L), (5L, 50L)))
    // incremental following RESUMES from the resync mark
    TxLog.append(spark, src, Seq((6L, 60L)).toDF("k", "v"))
    assert(TxLog.replicate(spark, src, dst, Seq("k"), "c") === 1)
    assert(replica() === Set((1L, 10L), (2L, 99L), (4L, 40L), (5L, 50L), (6L, 60L)))
    // and a caught-up call is a noop even with the flag on
    assert(TxLog.replicate(spark, src, dst, Seq("k"), "c",
      rebootstrapOnFloorOverrun = true) === 0)
  }

  test("partial replica: predicate-scoped; a postimage leaving the predicate deletes its key") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.registerTableFunctions(spark)
    val TxLog = graft.io.TxLog
    val root = graft.io.TempDirs.create("rep_part_")
    val src = root.resolve("src").toString
    val dst = root.resolve("dst").toString
    TxLog.create(spark, src, Seq((1L, 10L), (2L, 20L), (3L, 5L)).toDF("k", "v")) // v0
    def sync() = spark.sql(
      s"SELECT * FROM graft_txlog_replicate('$src', '$dst', 'k', 'p', " +
        "2147483647, false, 'v >= 10')").head()
    def replica() = TxLog.read(spark, dst).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    sync() // bootstrap: only in-scope rows
    assert(replica() === Set((1L, 10L), (2L, 20L)))
    TxLog.upsert(spark, src, Seq((3L, 50L)).toDF("k", "v"), Seq("k")) // enters scope
    TxLog.upsert(spark, src, Seq((1L, 3L)).toDF("k", "v"), Seq("k"))  // LEAVES scope
    TxLog.deleteRows(spark, src, col("k") === 2L)                      // in-scope delete
    TxLog.append(spark, src, Seq((4L, 2L)).toDF("k", "v"))            // out-of-scope insert
    sync()
    assert(replica() === Set((3L, 50L)), s"got ${replica()}")
  }
}
