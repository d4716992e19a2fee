package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns next to a typed metadata struct; decode / feature
 * extraction / frame sampling run as distributed per-partition batch
 * operators.
 *
 * The actual byte -> pixels/samples decode is STUBBED (this container ships
 * no image/audio codecs): [[StubDecoder]] derives deterministic
 * pseudo-features from the bytes, clearly marked below. Everything around
 * the stub — schema, partitioning, batch iteration shape, encoder wiring —
 * is the real thing: swap [[StubDecoder.decodeFeatures]] for a JNI/codec
 * call and nothing else changes.
 *
 * Scale notes: feature extraction is mapPartitions (one decoder init per
 * partition, not per row — the expensive part of real codec pipelines);
 * media bytes never shuffle unless a downstream op forces it; frame
 * sampling explodes to (frame_idx, frame_bytes) rows so each frame can be
 * processed independently downstream.
 */
object Multimodal {

  /** Typed metadata carried beside the raw bytes. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /**
   * ===== STUB DECODER =====
   * Stands in for a real image/audio decoder (libjpeg/ffmpeg/…): output is a
   * deterministic function of the payload bytes via an xorshift PRNG seeded
   * by a byte hash, so tests are stable and the distributed plumbing is
   * exercised with realistic shapes.
   */
  object StubDecoder {
    def byteHash(bytes: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      h
    }

    /** Fake dim-length feature vector (would be: decode + model forward). */
    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      var s = byteHash(bytes) | 1L
      Array.fill(dim) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        (s.toDouble / Long.MaxValue).toFloat
      }
    }

    /** Fake thumbnail "resize": a fixed-size digest of the payload
      * (would be: decode, scale, re-encode). */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](math.max(4, (w * h) / 64))
      var s = byteHash(bytes) | 1L
      var i = 0
      while (i < out.length) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        out(i) = s.toByte; i += 1
      }
      out
    }
  }

  /**
   * Attach a deterministic synthetic media payload + metadata to each row
   * (test/demo source; a real pipeline reads payload bytes from parquet or
   * object-store manifests). Payload size varies by id to exercise batch
   * skew handling.
   */
  def attachSyntheticMedia(df: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    df.withColumn("media",
        repeat(sha2(id.cast("string"), 256), (id % 7 + 1).cast("int")).cast("binary"))
      .withColumn("media_meta", struct(
        when(id % 3 === 0, "image/png").when(id % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("media_type"),
        (id % 640 + 32).cast("int").as("width"),
        (id % 480 + 32).cast("int").as("height"),
        (id % 30 + 1).cast("int").as("n_frames")))
  }

  /**
   * Per-partition batched feature extraction over the binary payload.
   * Output schema = input schema + `features array<float>`.
   */
  def extractFeatures(df: DataFrame, mediaCol: String, dim: Int): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      // one decoder context per partition (mirrors real codec/model init cost)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val feats =
          if (bytes == null) null
          else StubDecoder.decodeFeatures(bytes, dim)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(Encoders.row(outSchema))
  }

  /**
   * Sample every `stride`-th frame of a video payload into its own row:
   * (…, frame_idx int, frame_bytes binary). Pure Spark expressions — the
   * per-frame byte slice stands in for a real frame extraction.
   */
  def frameSample(df: DataFrame, mediaCol: String, metaCol: String, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val frames = sequence(lit(0), greatest(col(s"$metaCol.n_frames") - 1, lit(0)), lit(stride))
    df.withColumn("frame_idx", explode(frames))
      .withColumn("frame_bytes",
        substring(col(mediaCol), (col("frame_idx") * 8 + 1).cast("int"), lit(8)).cast("binary"))
  }

  /** Thumbnail "resize" over the payload via the stub decoder. */
  def resizeMedia(df: DataFrame, mediaCol: String, w: Int, h: Int): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("thumbnail", BinaryType))
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val thumb = if (bytes == null) null else StubDecoder.resize(bytes, w, h)
        Row.fromSeq(r.toSeq :+ thumb)
      }
    }(Encoders.row(outSchema))
  }
}
