package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import Multimodal.{AdpcmCodec, AviCodec, G711Codec, ImageIoCodec, WavCodec}

/** Compressed audio/video codec layer: G.711 companding, IMA ADPCM, and
  * the MJPEG-in-AVI container — ground-truth properties the DuckDB oracles
  * can't see (idempotence over the full code space, clamp saturation,
  * container transparency, corrupt-input refusal). */
class MediaCodecSpec extends SparkSpec {
  import spark.implicits._

  // ---- G.711 -----------------------------------------------------------

  test("mu-law: known anchors and code idempotence over the full byte space") {
    assert(G711Codec.mulawExpand(0xFF) === 0) // canonical positive zero
    assert(G711Codec.mulawExpand(0x7F) === 0) // negative zero collapses
    assert(G711Codec.mulawExpand(0x80) === 32124) // max magnitude
    assert(G711Codec.mulawExpand(0x00) === -32124)
    // compress(expand(c)) == c for every code except 0x7F (the -0 that
    // canonicalizes to +0 = 0xFF, the standard mu-law quirk)
    for (c <- 0 until 256 if c != 0x7F) {
      assert(G711Codec.mulawCompress(G711Codec.mulawExpand(c)) === c, s"code $c")
    }
    assert(G711Codec.mulawCompress(G711Codec.mulawExpand(0x7F)) === 0xFF)
  }

  test("A-law: known anchors and FULL code idempotence") {
    assert(G711Codec.alawExpand(0xD5) === 8) // the A-law 'silence' byte
    assert(G711Codec.alawExpand(0x2A) === -32256) // 0x2A^0x55=0x7F: max negative
    assert(G711Codec.alawExpand(0xAA) === 32256) // 0xAA^0x55=0xFF: max positive
    for (c <- 0 until 256) {
      assert(G711Codec.alawCompress(G711Codec.alawExpand(c)) === c, s"code $c")
    }
  }

  test("G.711 round-trip quantization error is segment-bounded") {
    var x = -32000
    while (x <= 32000) {
      val m = math.abs(x)
      val bound = math.max(32, m / 8)
      val mu = G711Codec.mulawExpand(G711Codec.mulawCompress(x))
      val al = G711Codec.alawExpand(G711Codec.alawCompress(x))
      assert(math.abs(mu - x) <= bound, s"mu-law err at $x: $mu")
      assert(math.abs(al - x) <= bound, s"A-law err at $x: $al")
      x += 17
    }
  }

  test("G.711 WAV container: encode format 6/7 payloads, decode expands to int16") {
    val codes = Array.tabulate(101)(i => ((i * 37) % 256).toByte)
    val mu = WavCodec.decode(WavCodec.encodeG711(8000, codes, 7))
    assert(mu.sampleRate === 8000)
    assert(mu.samples.toSeq === codes.toSeq.map(b => G711Codec.mulawExpand(b & 0xFF).toShort))
    val al = WavCodec.decode(WavCodec.encodeG711(16000, codes, 6))
    assert(al.sampleRate === 16000)
    assert(al.samples.toSeq === codes.toSeq.map(b => G711Codec.alawExpand(b & 0xFF).toShort))
    // PCM path unchanged by the format extension
    val pcm = Array.tabulate(50)(i => (i * 331 - 8000).toShort)
    assert(WavCodec.decode(WavCodec.encode(8000, pcm)).samples.toSeq === pcm.toSeq)
  }

  // ---- IMA ADPCM -------------------------------------------------------

  test("ADPCM: predictor and index saturate under extreme nibble streams") {
    // nibble 7 = maximum positive delta every step
    val up = AdpcmCodec.decode(Array.fill(64)(0x77.toByte), 128)
    assert(up.last === 32767)
    assert(up.forall(s => s >= -32768 && s <= 32767))
    // nibble 15 = maximum negative delta every step
    val down = AdpcmCodec.decode(Array.fill(64)(0xFF.toByte), 128)
    assert(down.last === -32768)
  }

  test("ADPCM: packed decode matches the per-nibble state machine, low nibble first") {
    val bytes = Array[Byte](0x4A.toByte, 0x93.toByte) // nibbles A=10? no: low-first = 10,4,3,9
    val nibbles = Seq(0x0A, 0x04, 0x03, 0x09)
    var pred = 0
    var idx = 0
    val expect = nibbles.map { n =>
      val (p, i) = AdpcmCodec.step(n, pred, idx)
      pred = p; idx = i
      p.toShort
    }
    assert(AdpcmCodec.decode(bytes, 4).toSeq === expect)
  }

  test("ADPCM: encode/decode tracks a slow signal within adaptive-step error") {
    val signal = Array.tabulate(400)(j => (1500 * math.sin(j / 12.0)).toInt.toShort)
    val decoded = AdpcmCodec.decode(AdpcmCodec.encode(signal), signal.length)
    val meanErr = signal.indices.map(j => math.abs(decoded(j) - signal(j))).sum.toDouble / signal.length
    assert(meanErr < 300, s"mean abs tracking error $meanErr")
  }

  test("ADPCM: fixture nibble formula matches the SQL expression shape") {
    // (id*5 + j*11 + j*j*3) mod 16 — spot anchors so a Scala/SQL drift fails here
    assert(Multimodal.syntheticAdpcmNibble(0, 0) === 0)
    assert(Multimodal.syntheticAdpcmNibble(3, 1) === (15 + 11 + 3) % 16)
    assert(Multimodal.syntheticAdpcmNibble(7, 10) === ((35 + 110 + 300) % 16))
  }

  // ---- MJPEG AVI -------------------------------------------------------

  test("AVI container is transparent: encoded JPEG frames come back byte-identical") {
    val frames = (0 until 5).map(f =>
      ImageIoCodec.encode("jpg", 16, 12, (_, _, _) => 40 + f * 40))
    val avi = AviCodec.encodeMjpeg(frames, 16, 12, fps = 5)
    val back = AviCodec.decodeFrames(avi)
    assert(back.length === 5)
    frames.zip(back).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("AVI parser refuses corrupt payloads loudly") {
    intercept[IllegalArgumentException] {
      AviCodec.decodeFrames("RIFFxxxxWAVE".getBytes("US-ASCII"))
    }
    val frames = Seq(ImageIoCodec.encode("jpg", 8, 8, (_, _, _) => 100))
    val avi = AviCodec.encodeMjpeg(frames, 8, 8, fps = 1)
    avi(16) = 0x7F // blow up a declared chunk length inside the tree
    intercept[IllegalArgumentException] { AviCodec.decodeFrames(avi) }
  }

  test("aviSceneStats: scene structure survives lossy JPEG decode exactly") {
    val df = Multimodal.attachSyntheticMjpegAvi(
      Seq(3L, 10L, 17L).toDF("doc_id"), "doc_id",
      nScenes = 4, framesPerScene = 3, w = 16, h = 12)
    val got = Multimodal.aviSceneStats(df, "avi")
      .select($"doc_id", $"n_frames", $"width", $"height", $"n_bright", $"n_cuts", $"first_cut")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5), r.getInt(6)))).toMap
    for (id <- Seq(3L, 10L, 17L)) {
      val bright = (0 until 4).map(s => if (Multimodal.mjpegSceneGray(id, s) > 128) 1 else 0)
      val cuts = (1 until 4).filter(s => bright(s) != bright(s - 1)).map(_ * 3)
      val expect = (12L, 16, 12, bright.sum * 3L, cuts.length.toLong, cuts.headOption.getOrElse(-1))
      assert(got(id) === expect, s"clip $id")
    }
  }

  test("aviSceneStatsFrameSplit equals the whole-clip-per-task sibling, incl. long clips") {
    // short clips (the q272 fixture) AND a long clip (40 scenes): the
    // frame-split plan must reproduce aviSceneStats' values exactly while
    // decoding frames in independent tasks
    for (nScenes <- Seq(4, 40)) {
      val df = Multimodal.attachSyntheticMjpegAvi(
        Seq(3L, 10L, 17L).toDF("doc_id").repartition(3), "doc_id",
        nScenes = nScenes, framesPerScene = 3, w = 16, h = 12)
      val whole = Multimodal.aviSceneStats(df, "avi")
        .select($"doc_id", $"n_frames", $"width", $"height", $"n_bright", $"n_cuts", $"first_cut")
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
      val split = Multimodal.aviSceneStatsFrameSplit(df, "doc_id", "avi")
        .select($"doc_id", $"n_frames", $"width", $"height", $"n_bright", $"n_cuts", $"first_cut")
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
      assert(split === whole, s"nScenes=$nScenes")
    }
  }

  test("audioPeriodicity recovers the planted period exactly") {
    val df = Multimodal.attachSyntheticPeriodicWav(
      Seq(0L, 3L, 7L, 10L).toDF("doc_id"), "doc_id", sampleRate = 8000, nSamples = 400)
    val got = Multimodal.audioPeriodicity(df, "wav", minLag = 10, maxLag = 35)
      .select($"doc_id", $"best_lag", $"periodicity")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    for (id <- Seq(0L, 3L, 7L, 10L)) {
      val p = (20 + id % 11).toInt
      assert(got(id)._1 === p, s"clip $id: expected period $p")
      // the signal repeats exactly at lag p, so r(p) only loses the p
      // truncated edge terms vs r(0): score stays near 1
      assert(got(id)._2 > 0.8 && got(id)._2 <= 1.0)
    }
    intercept[IllegalArgumentException] {
      Multimodal.audioPeriodicity(df, "wav", minLag = 0, maxLag = 5)
    }
  }

  test("G.711 gate fixture: wavStats over mixed-law payloads is exact per law") {
    val df = Multimodal.attachSyntheticG711Wav(
      Seq(2L, 5L).toDF("doc_id"), "doc_id", sampleRate = 8000, nSamples = 100)
    val got = Multimodal.wavStats(df, "wav")
      .select($"doc_id", $"codec", $"n_samples", $"mean_amp")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    for ((id, law) <- Seq(2L -> "mulaw", 5L -> "alaw")) {
      val expand: Int => Int =
        if (law == "mulaw") G711Codec.mulawExpand else G711Codec.alawExpand
      val vals = (0 until 100).map(i => expand(Multimodal.syntheticG711Code(id, i)))
      assert(got(id) === ((law, 100L, vals.sum.toDouble / 100)), s"clip $id")
    }
  }
}
