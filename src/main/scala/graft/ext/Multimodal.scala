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
 * Two decode tiers:
 *  - [[PpmCodec]] is a REAL pure-JVM codec for binary PPM (P6) images —
 *    encode, parse, pixel stats, box-filter resize — exercised end-to-end
 *    (and oracle-checked: the synthetic image generator uses a closed-form
 *    pixel formula DuckDB can evaluate in SQL, so a decode bug breaks the
 *    hash-compare).
 *  - COMPRESSED codecs (jpeg/png/wav/mp4) are STUBBED (this container
 *    ships no codec libraries): [[StubDecoder]] derives deterministic
 *    pseudo-features from the bytes, clearly marked below. Everything
 *    around the stub — schema, partitioning, batch iteration shape,
 *    encoder wiring — is the real thing: swap
 *    [[StubDecoder.decodeFeatures]] for a JNI/codec call and nothing else
 *    changes.
 *
 * Scale notes: feature extraction is mapPartitions (one decoder init per
 * partition, not per row — the expensive part of real codec pipelines);
 * media bytes never shuffle unless a downstream op forces it; frame
 * sampling explodes to (frame_idx, frame_bytes) rows so each frame can be
 * processed independently downstream.
 */
object Multimodal {

  /**
   * Pure-JVM binary-PPM (P6) codec: `P6\n<w> <h>\n<maxval>\n` header
   * followed by an interleaved RGB raster, one byte per channel at
   * maxval 255. No external libraries — the whole parse is ASCII token
   * reading plus an array copy, which is exactly why P6 is the standard
   * "prove the plumbing" format.
   */
  object PpmCodec {
    final case class Image(width: Int, height: Int, pixels: Array[Byte]) {
      /** Unsigned channel value at (x, y, c) with c in 0=R,1=G,2=B. */
      def channel(x: Int, y: Int, c: Int): Int =
        pixels((y * width + x) * 3 + c) & 0xFF
    }

    def encode(w: Int, h: Int, pixel: (Int, Int, Int) => Int): Array[Byte] = {
      require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + w * h * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var i = header.length
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) { out(i) = (pixel(x, y, c) & 0xFF).toByte; i += 1; c += 1 }
          x += 1
        }
        y += 1
      }
      out
    }

    def decode(bytes: Array[Byte]): Image = {
      var pos = 0
      def skipWs(): Unit = {
        while (pos < bytes.length &&
            (bytes(pos) == ' ' || bytes(pos) == '\n' || bytes(pos) == '\r' || bytes(pos) == '\t')) {
          pos += 1
          // PPM comments run from '#' to end of line
          if (pos < bytes.length && bytes(pos) == '#') {
            while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          }
        }
      }
      def token(): String = {
        skipWs()
        val start = pos
        while (pos < bytes.length && !Character.isWhitespace(bytes(pos).toChar)) pos += 1
        new String(bytes, start, pos - start, "US-ASCII")
      }
      val magic = token()
      require(magic == "P6", s"not a binary PPM (P6) payload: magic '$magic'")
      val w = token().toInt
      val h = token().toInt
      val maxval = token().toInt
      require(maxval == 255, s"only maxval 255 supported, got $maxval")
      pos += 1 // single whitespace byte separates header from raster
      require(bytes.length - pos >= w * h * 3,
        s"truncated raster: need ${w * h * 3} bytes, have ${bytes.length - pos}")
      Image(w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + w * h * 3))
    }

    /** Box-filter downsample by integer block averaging (truncating
      * division — deterministic), re-encoded as P6. Requires the scale
      * factors to divide the dimensions evenly so every output pixel
      * averages a full block. */
    def resize(img: Image, outW: Int, outH: Int): Image = {
      require(outW > 0 && outH > 0 && img.width % outW == 0 && img.height % outH == 0,
        s"resize ${img.width}x${img.height} -> ${outW}x$outH must be an integer block shrink")
      val bx = img.width / outW
      val by = img.height / outH
      val out = new Array[Byte](outW * outH * 3)
      var oy = 0
      while (oy < outH) {
        var ox = 0
        while (ox < outW) {
          var c = 0
          while (c < 3) {
            var sum = 0
            var dy = 0
            while (dy < by) {
              var dx = 0
              while (dx < bx) {
                sum += img.channel(ox * bx + dx, oy * by + dy, c)
                dx += 1
              }
              dy += 1
            }
            out((oy * outW + ox) * 3 + c) = (sum / (bx * by)).toByte
            c += 1
          }
          ox += 1
        }
        oy += 1
      }
      Image(outW, outH, out)
    }
  }

  /** The synthetic test image's closed-form pixel value — SQL-expressible
    * on purpose, so the DuckDB oracle can recompute decoded statistics
    * without a codec: channel(x, y, c) of image `id` is
    * `(id*31 + x*7 + y*13 + c*5) mod 256`. */
  def syntheticPixel(id: Long, x: Int, y: Int, c: Int): Int =
    ((id * 31 + x * 7 + y * 13 + c * 5) % 256).toInt

  /** Attach a VALID deterministic P6 payload per row (real bytes, real
    * header, real raster — [[ppmStats]] genuinely decodes them). */
  def attachSyntheticPpm(df: DataFrame, idCol: String, w: Int, h: Int): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("ppm", BinaryType))
    val idIdx = inSchema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        Row.fromSeq(r.toSeq :+ PpmCodec.encode(w, h, (x, y, c) => syntheticPixel(id, x, y, c)))
      }
    }(Encoders.row(outSchema))
  }

  /** Decode the P6 payload and project per-channel statistics: dimensions
    * plus exact per-channel means (integer pixel sums — at most
    * w*h*255 < 2^53 — divided as doubles, so the result is reproducible
    * bit-for-bit on any engine that sums the same integers). */
  def ppmStats(df: DataFrame, mediaCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("mean_r", DoubleType), StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val img = PpmCodec.decode(r.getAs[Array[Byte]](mediaIdx))
        val sums = new Array[Long](3)
        var i = 0
        while (i < img.pixels.length) { sums(i % 3) += img.pixels(i) & 0xFF; i += 1 }
        val n = (img.width * img.height).toDouble
        Row.fromSeq(r.toSeq ++ Seq[Any](img.width, img.height,
          sums(0) / n, sums(1) / n, sums(2) / n))
      }
    }(Encoders.row(outSchema))
  }

  /** Decode -> box-filter resize -> re-encode, appending the thumbnail
    * payload and its decoded dimensions. */
  def ppmResize(df: DataFrame, mediaCol: String, outW: Int, outH: Int): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("thumb_ppm", BinaryType),
      StructField("thumb_width", IntegerType), StructField("thumb_height", IntegerType)))
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val img = PpmCodec.resize(PpmCodec.decode(r.getAs[Array[Byte]](mediaIdx)), outW, outH)
        val bytes = PpmCodec.encode(img.width, img.height, (x, y, c) => img.channel(x, y, c))
        Row.fromSeq(r.toSeq ++ Seq(bytes, img.width, img.height))
      }
    }(Encoders.row(outSchema))
  }

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
