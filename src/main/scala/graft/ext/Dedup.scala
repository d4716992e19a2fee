package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextExpressionFunctions
import graft.functions.vec_cosine

/**
 * Deduplication operators for large text/embedding corpora — the
 * training-data-pipeline extension surface (the reference has no dedup at
 * all; its only set semantics is the implicit key-DISTINCT in the semi-join
 * build, /root/reference/src/bin/join.rs:40,72).
 *
 * Scale notes (100 TB):
 *  - every candidate-generation step is a hash-partitioned equi-join on a
 *    SMALL derived key (band hash / bit chunk / n-gram), never a cross join;
 *  - verification (exact jaccard / hamming / cosine) runs only on LSH
 *    candidates;
 *  - all token/shingle/signature math is Spark higher-order functions or
 *    codegen'd Catalyst expressions — no UDFs, stays in WholeStageCodegen.
 */
object Dedup {

  /** Lowercased whitespace tokens; empty text -> empty array. */
  def tokens(text: Column): Column = {
    val t = lower(trim(text))
    when(length(t) === 0, array().cast("array<string>")).otherwise(split(t, "\\s+"))
  }

  /** Distinct word n-gram shingles; a doc shorter than n words is its own
    * single shingle so it still participates in the index. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) === 0, array().cast("array<string>"))
        .when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /**
   * Exact dedup: keep the representative row (minimum `idCol`) per distinct
   * value of `keyCol`. One shuffle (hash-partition by key); the window never
   * materializes a group in memory beyond the partition sort.
   */
  def exactDedup(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(idCol))
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** MinHash signature: k independent hash functions via seed-mixed
    * xxhash64; signature[i] = min over shingles of h_i(shingle). */
  def minhashSignature(sh: Column, numHashes: Int, seed: Long): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, s => xxhash64(s, i, lit(seed)))))

  final case class MinHashConfig(
      numHashes: Int = 128,
      bands: Int = 32,
      shingleSize: Int = 3,
      seed: Long = 42L)

  /**
   * MinHash + LSH near-duplicate pairs: shingle -> minhash signature ->
   * band hashes -> bucket self-join -> exact-jaccard verification.
   * Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
   */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    require(cfg.numHashes % cfg.bands == 0, "numHashes must divide evenly into bands")
    val rowsPerBand = cfg.numHashes / cfg.bands

    val base = df
      .select(col(idCol).as("id"), shingles(col(textCol), cfg.shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)

    val banded = base
      .withColumn("sig", minhashSignature(col("sh"), cfg.numHashes, cfg.seed))
      .select(col("id"), col("sh"), posexplode(
        transform(sequence(lit(0), lit(cfg.bands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")

    val a = banded.alias("a")
    val b = banded.alias("b")
    val cand = a
      .join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")

    cand
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /**
   * SimHash near-duplicate pairs with hamming distance <= maxHamming.
   * Candidate generation by the pigeonhole principle: 64 bits split into
   * `chunks` equal pieces; any pair within hamming h < chunks shares at
   * least one identical chunk, so a bucket join on (chunk index, chunk
   * value) has full recall for maxHamming <= chunks - 1.
   */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      chunks: Int = 4,
      seed: Long = 0L): DataFrame = {
    require(64 % chunks == 0, "chunks must divide 64")
    require(maxHamming < chunks, "pigeonhole recall needs maxHamming < chunks")
    val bits = 64 / chunks
    val mask = if (bits == 64) -1L else (1L << bits) - 1

    val base = df.select(col(idCol).as("id"),
      TextExpressionFunctions.simhash64(tokens(col(textCol)), seed).as("sh64"))

    val chunkCols = (0 until chunks).map(c =>
      shiftrightunsigned(col("sh64"), c * bits).bitwiseAND(lit(mask)))
    val chunked = base.select(col("id"), col("sh64"), posexplode(array(chunkCols: _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "cv")

    val a = chunked.alias("a")
    val b = chunked.alias("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh64").as("ha"), col("b.sh64").as("hb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /**
   * Exact n-gram Jaccard pairs via an inverted shingle index (no LSH, no
   * cross join): explode shingles, equi-join postings on the shingle, count
   * shared shingles per pair, jaccard = shared / (|A| + |B| - shared).
   * `maxShingleDf` drops ultra-common shingles (stop-shingles) before the
   * join — the standard guard against posting-list blowup at scale; a pair
   * made ONLY of dropped shingles can be missed, which is the documented
   * trade-off.
   */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxShingleDf: Long = Long.MaxValue): DataFrame = {
    val base = df
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sz", size(col("sh")))

    var inv = base.select(col("id"), col("sz"), explode(col("sh")).as("g"))
    if (maxShingleDf != Long.MaxValue) {
      val w = Window.partitionBy(col("g"))
      inv = inv.withColumn("__df", count(lit(1)).over(w))
        .filter(col("__df") <= maxShingleDf).drop("__df")
    }

    val a = inv.alias("a")
    val b = inv.alias("b")
    a.join(b, col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("sz_a") + col("sz_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /**
   * Embedding near-duplicate pairs: random-hyperplane LSH (Charikar 2002)
   * buckets, then exact cosine verification with the codegen'd
   * [[graft.functions.vec_cosine]]. Signature bits are grouped into bands;
   * a pair is a candidate if ANY band matches, trading a little join fan-out
   * for recall at high thresholds.
   */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      numPlanes: Int = 16,
      bands: Int = 2,
      seed: Long = 42L): DataFrame = {
    val sigCol = LshPlanes.bandKeys(col(vecCol), dim, numPlanes, bands, seed)
    val banded = df.select(col(idCol).as("id"), col(vecCol).as("v"), posexplode(sigCol))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bk")

    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.v").as("va"), col("b.v").as("vb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", vec_cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}

/** Deterministic random-hyperplane generation + sign-bucket keys, shared by
  * dedup and ANN search. */
object LshPlanes {
  import graft.functions.vec_dot

  /** `numPlanes` hyperplanes of dimension `dim`, deterministic in `seed`
    * (driver-side seeded PRNG; broadcast to executors as literals). */
  def planes(dim: Int, numPlanes: Int, seed: Long): Array[Array[Float]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rng.nextGaussian().toFloat))
  }

  /** Sign bit per hyperplane, packed into `bands` long keys. Each key is
    * salted with its band index so keys from different bands never collide
    * in a bucket join. */
  def bandKeys(vec: Column, dim: Int, numPlanes: Int, bands: Int, seed: Long): Column = {
    require(numPlanes % bands == 0, "numPlanes must divide evenly into bands")
    val perBand = numPlanes / bands
    val ps = planes(dim, numPlanes, seed)
    val bandCols = (0 until bands).map { bandIdx =>
      val key = (0 until perBand).map { j =>
        val plane = ps(bandIdx * perBand + j)
        when(vec_dot(vec, typedlit(plane.toSeq)) > 0d, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      // salt with band index (bits 56+) to disambiguate bands
      key + lit(bandIdx.toLong << 56)
    }
    array(bandCols: _*)
  }
}
