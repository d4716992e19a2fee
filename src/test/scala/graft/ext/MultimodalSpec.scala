package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Multimodal.attachSyntheticMedia(
    (0L until 20L).toDF("doc_id"), "doc_id")

  test("synthetic media: binary payload + typed metadata struct, deterministic") {
    val r = base.select($"media", $"media_meta.media_type", $"media_meta.n_frames").head()
    assert(r.getAs[Array[Byte]](0).nonEmpty)
    assert(Set("image/png", "audio/wav", "video/mp4").contains(r.getString(1)))
    val a = base.select(sha2($"media", 256)).as[String].collect().sorted
    val b = base.select(sha2($"media", 256)).as[String].collect().sorted
    assert(a.toSeq === b.toSeq)
  }

  test("extractFeatures: schema adds array<float> of requested dim; deterministic per payload") {
    val out = Multimodal.extractFeatures(base, "media", dim = 8)
    assert(out.schema("features").dataType.typeName === "array")
    val feats = out.select($"doc_id", $"features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.values.forall(_.length === 8))
    val again = Multimodal.extractFeatures(base, "media", dim = 8)
      .select($"doc_id", $"features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats === again)
    // different payloads -> different features
    assert(feats(0L) !== feats(1L))
  }

  test("frameSample explodes stride-spaced frames bounded by n_frames") {
    val out = Multimodal.frameSample(base, "media", "media_meta", stride = 5)
    val counts = out.groupBy($"doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nFrames = base.select($"doc_id", $"media_meta.n_frames").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    counts.foreach { case (id, c) =>
      val expected = (nFrames(id) + 4) / 5 // ceil(n_frames/stride)
      assert(c === expected, s"doc $id: $c frames, n_frames=${nFrames(id)}")
    }
    assert(out.schema("frame_bytes").dataType.typeName === "binary")
  }

  test("resizeMedia adds a thumbnail digest of the payload") {
    val out = Multimodal.resizeMedia(base, "media", 64, 64)
    val thumbs = out.select($"thumbnail").collect().map(_.getAs[Array[Byte]](0))
    assert(thumbs.forall(t => t != null && t.length === 64))
  }

  test("ImageIoCodec: PNG and BMP encode -> decode round-trip every pixel exactly (lossless)") {
    import Multimodal.ImageIoCodec
    for (fmt <- Seq("png", "bmp")) {
      val img = ImageIoCodec.decode(
        ImageIoCodec.encode(fmt, 7, 5, (x, y, c) => (x * 37 + y * 11 + c * 5) % 256))
      assert(img.width === 7 && img.height === 5, fmt)
      for (x <- 0 until 7; y <- 0 until 5; c <- 0 until 3)
        assert(img.channel(x, y, c) === (x * 37 + y * 11 + c * 5) % 256,
          s"$fmt pixel ($x,$y,$c)")
    }
  }

  test("ImageIoCodec: JPEG decodes with exact dimensions and channel means near the source (lossy)") {
    import Multimodal.ImageIoCodec
    // smooth horizontal gradient — JPEG-friendly, so means stay close
    val w = 32; val h = 16
    val img = ImageIoCodec.decode(
      ImageIoCodec.encode("jpg", w, h, (x, _, c) => (x * 8 + c * 3) & 0xFF))
    assert(img.width === w && img.height === h)
    for (c <- 0 until 3) {
      val want = (0 until w).map(x => (x * 8 + c * 3) & 0xFF).sum.toDouble / w
      val got = (for (x <- 0 until w; y <- 0 until h) yield img.channel(x, y, c))
        .sum.toDouble / (w * h)
      assert(math.abs(got - want) < 8.0, s"channel $c mean: decoded $got vs source $want")
    }
  }

  test("ImageIoCodec: non-image payloads fail fast") {
    import Multimodal.ImageIoCodec
    assert(intercept[IllegalArgumentException] {
      ImageIoCodec.decode("definitely not an image".getBytes("US-ASCII"))
    }.getMessage.contains("ImageIO"))
    intercept[IllegalArgumentException] {
      ImageIoCodec.encode("tiff-nope", 2, 2, (_, _, _) => 0)
    }
  }

  test("compressed-image pipeline: attach -> ImageIO decode -> P6 transcode -> shared raster ops") {
    val docs = (0L until 6L).toDF("doc_id")
    val img = Multimodal.attachSyntheticImage(docs, "doc_id", w = 12, h = 8)
    // format mix rides the metadata column
    val fmts = img.select($"doc_id", $"media_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fmts(0L) === "image/png" && fmts(1L) === "image/bmp")
    // transcode to P6, then the PPM stats operator decodes it — means must
    // equal the closed-form formula exactly for BOTH formats
    val stats = Multimodal.ppmStats(Multimodal.transcodeToPpm(img, "img"), "ppm")
      .select($"doc_id", $"width", $"height", $"mean_r").collect()
    stats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 12 && r.getInt(2) === 8)
      val want = (for (x <- 0 until 12; y <- 0 until 8)
        yield Multimodal.syntheticPixel(id, x, y, 0)).sum.toDouble / 96
      assert(r.getDouble(3) === want, s"doc $id mean_r")
    }
    // histogram features: counts sum to n_pixels; normalized features sum to 1
    val hist = Multimodal.imageGrayHistogram(img, "img", bins = 16)
      .select($"doc_id", $"n_pixels", $"gray_counts", $"features").collect()
    hist.foreach { r =>
      assert(r.getSeq[Long](2).sum === r.getLong(1))
      assert(math.abs(r.getSeq[Double](3).sum - 1.0) < 1e-12)
      val wantCounts = new Array[Long](16)
      for (x <- 0 until 12; y <- 0 until 8) {
        val g = (0 until 3).map(c => Multimodal.syntheticPixel(r.getLong(0), x, y, c)).sum / 3
        wantCounts(g * 16 / 256) += 1L
      }
      assert(r.getSeq[Long](2).toSeq === wantCounts.toSeq, s"doc ${r.getLong(0)} histogram")
    }
  }

  test("PpmCodec: encode -> decode round-trips dimensions and every pixel") {
    import Multimodal.PpmCodec
    val img = PpmCodec.decode(PpmCodec.encode(5, 3, (x, y, c) => x * 50 + y * 20 + c))
    assert(img.width === 5 && img.height === 3)
    for (x <- 0 until 5; y <- 0 until 3; c <- 0 until 3)
      assert(img.channel(x, y, c) === ((x * 50 + y * 20 + c) & 0xFF))
  }

  test("PpmCodec: malformed payloads fail fast with named errors") {
    import Multimodal.PpmCodec
    assert(intercept[IllegalArgumentException] {
      PpmCodec.decode("P5\n2 2\n255\nxxxx".getBytes("US-ASCII"))
    }.getMessage.contains("magic"))
    assert(intercept[IllegalArgumentException] {
      PpmCodec.decode("P6\n4 4\n255\nxx".getBytes("US-ASCII"))
    }.getMessage.contains("truncated"))
  }

  test("PpmCodec.resize: 2x2 block average with truncation, exact ground truth") {
    import Multimodal.PpmCodec
    // R channel values 10,20,30,41 -> floor(101/4) = 25
    val img = PpmCodec.decode(PpmCodec.encode(2, 2, (x, y, c) =>
      if (c == 0) Seq(10, 20, 30, 41)(y * 2 + x) else c * 100))
    val small = PpmCodec.resize(img, 1, 1)
    assert(small.channel(0, 0, 0) === 25)
    assert(small.channel(0, 0, 1) === 100 && small.channel(0, 0, 2) === 200)
    // non-integer block shrink rejected
    assert(intercept[IllegalArgumentException] {
      PpmCodec.resize(img, 3, 1)
    }.getMessage.contains("integer block shrink"))
  }

  test("WavCodec: encode -> decode round-trips rate and every sample; malformed fails fast") {
    import Multimodal.WavCodec
    val samples = Array.tabulate(100)(i => ((i * 523 - 5000) % 32768).toShort)
    val a = WavCodec.decode(WavCodec.encode(16000, samples))
    assert(a.sampleRate === 16000 && (a.samples.toSeq == samples.toSeq))
    assert(intercept[IllegalArgumentException] {
      WavCodec.decode("notariffchunkatall-padding-padding-padding-!".getBytes("US-ASCII"))
    }.getMessage.contains("RIFF"))
    // corrupt chunk length (negative / past the buffer) fails instead of
    // looping or over-reading
    val corrupt = WavCodec.encode(8000, Array[Short](1, 2, 3))
    corrupt(40) = -1; corrupt(41) = -1; corrupt(42) = -1; corrupt(43) = -1
    assert(intercept[IllegalArgumentException] {
      WavCodec.decode(corrupt)
    }.getMessage.contains("corrupt RIFF chunk"))
  }

  test("wavStats decodes real PCM payloads: mean/rms match driver-side ground truth") {
    val docs = spark.range(0, 10).toDF("doc_id")
    val stats = Multimodal.wavStats(
      Multimodal.attachSyntheticWav(docs, "doc_id", sampleRate = 8000, nSamples = 64), "wav")
      .select($"doc_id", $"n_samples", $"duration_s", $"mean_amp", $"rms_amp").collect()
    stats.foreach { r =>
      val id = r.getLong(0)
      val vals = (0 until 64).map(i => Multimodal.syntheticSample(id, i).toLong)
      assert(r.getLong(1) === 64L)
      assert(r.getDouble(2) === 64.0 / 8000)
      assert(r.getDouble(3) === vals.sum / 64.0)
      assert(r.getDouble(4) === math.sqrt(vals.map(v => v * v).sum / 64.0), s"doc $id")
    }
  }

  test("videoFrameStats: frame boundaries recovered by parsing; stride sampling; exact means") {
    val docs = spark.range(0, 5).toDF("doc_id")
    val out = Multimodal.videoFrameStats(
      Multimodal.attachSyntheticPpmVideo(docs, "doc_id", w = 4, h = 2, nFrames = 6),
      "video", stride = 3)
      .select($"doc_id", $"frame_idx", $"mean_g").collect()
    // frames 0 and 3 sampled per clip
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      (0L until 5L).flatMap(id => Seq((id, 0L), (id, 3L))).toSet)
    out.foreach { r =>
      val expected = (for (x <- 0 until 4; y <- 0 until 2)
        yield Multimodal.syntheticVideoPixel(r.getLong(0), r.getLong(1).toInt, x, y, 1)).sum / 8.0
      assert(r.getDouble(2) === expected)
    }
  }

  test("ppmStats decodes real P6 payloads: means match the closed-form formula") {
    val docs = spark.range(0, 20).toDF("doc_id")
    val stats = Multimodal.ppmStats(
      Multimodal.attachSyntheticPpm(docs, "doc_id", w = 8, h = 4), "ppm")
      .select($"doc_id", $"width", $"height", $"mean_r").collect()
    stats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 8 && r.getInt(2) === 4)
      val expected = (for (x <- 0 until 8; y <- 0 until 4)
        yield Multimodal.syntheticPixel(id, x, y, 0)).sum / 32.0
      assert(r.getDouble(3) === expected, s"doc $id")
    }
  }

  test("dHash: constant image hashes to 0; horizontal ramp sets all 64 bits") {
    val flat = (0L until 2L).toDF("doc_id").mapPartitions { rows =>
      rows.map(r => org.apache.spark.sql.Row(r.getLong(0),
        Multimodal.PpmCodec.encode(36, 32, (_, _, _) => 128)))
    }(org.apache.spark.sql.Encoders.row(new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("img", "binary")))
    val h0 = Multimodal.imageDHash(flat, "img").select($"dhash").head().getLong(0)
    assert(h0 === 0L)

    // gray rises 2/column (no 256 wrap across 36 px): every adjacent-cell
    // comparison is strictly increasing -> all 64 bits set
    val ramp = (0L until 1L).toDF("doc_id").mapPartitions { rows =>
      rows.map(r => org.apache.spark.sql.Row(r.getLong(0),
        Multimodal.PpmCodec.encode(36, 32, (x, _, _) => 2 * x)))
    }(org.apache.spark.sql.Encoders.row(new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("img", "binary")))
    val h1 = Multimodal.imageDHash(ramp, "img").select($"dhash").head().getLong(0)
    assert(h1 === -1L) // all 64 bits
  }

  test("dHash identical through the raw-PPM and compressed (PNG/BMP) paths") {
    val ids = (0L until 10L).toDF("doc_id")
    val viaPpm = Multimodal.imageDHash(
      Multimodal.attachSyntheticPpm(ids, "doc_id", w = 36, h = 32), "ppm")
      .select($"doc_id", $"dhash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCodec = Multimodal.imageDHash(
      Multimodal.attachSyntheticImage(ids, "doc_id", w = 36, h = 32), "img")
      .select($"doc_id", $"dhash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaPpm === viaCodec)
  }

  test("dHash hammingPairs == brute force over the planted near-dup groups") {
    val imgs = Multimodal.attachSyntheticImageGroups(
      (0L until 40L).toDF("doc_id"), "doc_id", w = 36, h = 32, groupSize = 8)
    val hashed = Multimodal.imageDHash(imgs, "img").select($"doc_id", $"dhash")
    val hashes = hashed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val brute = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if d <= 3
    } yield (a, b, d.toLong)).toSet

    val got = Dedup.hammingPairs(hashed, "doc_id", "dhash", maxHamming = 3, chunks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(got === brute)
    assert(brute.nonEmpty)
    // the planted family structure holds: every pair is intra-group
    assert(brute.forall { case (a, b, _) => a / 8 === b / 8 })
  }

  test("hamming ingest gate: duplicate signatures rejected, novel admitted, recall exact") {
    val corpus = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("id", "h")
    // batch: exact dup of 100, 1-bit neighbor of 200, far-away value
    val batch = Seq((10L, 100L), (11L, 200L ^ 4L), (12L, 0x0F0F0F0F0F0F0F0FL))
      .toDF("id", "h")
    val admitted = Dedup.hammingIngestFilter(batch, corpus, "id", "h",
      maxHamming = 3, chunks = 4).select($"id").collect().map(_.getLong(0)).toSet
    assert(admitted === Set(12L))
    // equals the brute-force gate on the q160 fixture shape
    val imgs = Multimodal.attachSyntheticImageGroups(
      (0L until 24L).toDF("doc_id"), "doc_id", w = 36, h = 32, groupSize = 8)
    val ch = Multimodal.imageDHash(imgs, "img").select($"doc_id", $"dhash")
    val corpusHashes = ch.select($"dhash")
    val batchSide = ch.filter($"doc_id" < 8)
      .select(($"doc_id" + 1000L).as("id"), $"dhash")
    // every batch row duplicates a corpus hash exactly -> all rejected
    assert(Dedup.hammingIngestFilter(batchSide, corpusHashes, "id", "dhash").count() === 0)
  }

  test("audio silence VAD flags exactly the planted silent windows") {
    val clips = Multimodal.attachSyntheticSpeechWav(
      (0L until 6L).toDF("doc_id"), "doc_id", sampleRate = 8000,
      nSamples = 1600, windowLen = 160)
    val rows = Multimodal.audioSilence(clips, "wav", 160, 1600L)
      .select($"doc_id", $"window_idx", $"n_window", $"is_silent").collect()
    assert(rows.length === 6 * 10)
    rows.foreach { r =>
      val (id, w) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) === 160L)
      assert(r.getBoolean(3) === ((w + id) % 3 == 0), s"doc $id window $w")
    }
  }

  test("scene-change detection flags exactly the planted scene boundaries") {
    val clips = Multimodal.attachSyntheticSceneVideo(
      (0L until 5L).toDF("doc_id"), "doc_id", w = 16, h = 12, nFrames = 12, sceneLen = 4)
    val rows = Multimodal.sceneChanges(clips, "video", minSumDiff = 3L * 16 * 12)
      .select($"doc_id", $"frame_idx", $"diff", $"is_cut").collect()
    assert(rows.length === 5 * 12)
    rows.foreach { r =>
      val f = r.getLong(1)
      val expectCut = f > 0 && f % 4 == 0
      assert(r.getBoolean(3) === expectCut, s"doc ${r.getLong(0)} frame $f")
      // within-scene drift is exactly n_pixels; a cut is 6*n_pixels
      if (f > 0) assert(r.getLong(2) === (if (expectCut) 6L * 192 else 192L))
    }
  }
}
