package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaAsset, MediaMeta}

/** Multimodal plumbing tests: binary payloads round-trip through the
  * typed schema, the batched feature extractor is deterministic, and the
  * declarative stats twin agrees with the typed path. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def asset(id: Long, payload: String, modality: String = "image") =
    MediaAsset(id, MediaMeta(modality, 64, 48, 16000, 1000L),
      payload.getBytes("UTF-8"))

  test("extractFeatures: deterministic fake decode, byte counts, md5") {
    val ds = Seq(asset(1L, "abc"), asset(2L, "abc"), asset(3L, "xyz", "audio")).toDS()
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.asset_id)
    assert(out.map(_.n_bytes).toSeq == Seq(3L, 3L, 3L))
    assert(out(0).payload_md5 == out(1).payload_md5)
    assert(out(0).payload_md5 != out(2).payload_md5)
    assert(out(0).feature.toSeq == out(1).feature.toSeq) // deterministic
    assert(out(0).feature.length == Multimodal.FakeCodec.FeatureDim)
    assert(out(0).modality == "image" && out(2).modality == "audio")
  }

  test("resizeImages: images transformed, other modalities pass through untouched") {
    val ds = Seq(asset(1L, "some image bytes"), asset(2L, "audio bytes", "audio")).toDS()
    val out = Multimodal.resizeImages(ds, 32, 24).collect().sortBy(_.asset_id)
    assert(out(0).meta.width == 32 && out(0).meta.height == 24)
    assert(out(0).payload.toSeq ==
      Multimodal.FakeCodec.resize("some image bytes".getBytes("UTF-8"), 32, 24).toSeq)
    // non-image untouched, byte-for-byte
    assert(out(1).meta == asset(2L, "audio bytes", "audio").meta)
    assert(out(1).payload.toSeq == "audio bytes".getBytes("UTF-8").toSeq)
    // deterministic across executions
    val again = Multimodal.resizeImages(ds, 32, 24).collect().sortBy(_.asset_id)
    assert(again(0).payload.toSeq == out(0).payload.toSeq)
  }

  // a real PNG, built in-memory: wxh, left half pure red, right half pure blue
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("image modality REALLY decodes PNG bytes: pixel-statistic features") {
    val ds = Seq(MediaAsset(1L, MediaMeta("image", 8, 4, 0, 0L), pngBytes(8, 4))).toDS()
    val f = Multimodal.extractFeatures(ds).collect().head.feature
    assert(f.length == Multimodal.ImageCodec.FeatureDim)
    // half red + half blue: mean R = mean B = 0.5, mean G = 0
    assert(math.abs(f(0) - 0.5f) < 1e-6, s"mean R: ${f(0)}")
    assert(math.abs(f(1)) < 1e-6, s"mean G: ${f(1)}")
    assert(math.abs(f(2) - 0.5f) < 1e-6, s"mean B: ${f(2)}")
    assert(f(4) == 8.0f && f(5) == 4.0f && f(6) == 2.0f, "w, h, aspect")
    assert(f(7) == 0.0f, "no pixel exceeds luma 127 (max is 0.299*255=76)")
  }

  test("resizeImages on a real PNG: nearest-neighbor pixels, PNG re-encode round-trips") {
    val ds = Seq(MediaAsset(1L, MediaMeta("image", 8, 4, 0, 0L), pngBytes(8, 4))).toDS()
    val out = Multimodal.resizeImages(ds, 4, 2).collect().head
    assert(out.meta.width == 4 && out.meta.height == 2)
    val img = Multimodal.ImageCodec.tryDecode(out.payload)
      .getOrElse(fail("resized payload must itself be a decodable PNG"))
    assert(img.getWidth == 4 && img.getHeight == 2)
    for (y <- 0 until 2; x <- 0 until 4)
      assert((img.getRGB(x, y) & 0xffffff) == (if (x < 2) 0xff0000 else 0x0000ff),
        s"pixel ($x,$y) must survive nearest-neighbor downscale exactly")
    // determinism across executions (same pixels, same encoder → same bytes)
    val again = Multimodal.resizeImages(ds, 4, 2).collect().head
    assert(again.payload.toSeq == out.payload.toSeq)
  }

  // a real WAV, built in-memory: 16-bit PCM mono sine
  private def wavBytes(rateHz: Float, freqHz: Double, amp: Double, nSamples: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until nSamples)
      bb.putShort((amp * 32767 * math.sin(2 * math.Pi * freqHz * i / rateHz)).toShort)
    val fmt = new javax.sound.sampled.AudioFormat(rateHz, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio modality REALLY decodes WAV bytes: signal-statistic features") {
    // 1 s of a 440 Hz sine at half amplitude, 8 kHz mono
    val ds = Seq(MediaAsset(1L, MediaMeta("audio", 0, 0, 8000, 1000L),
      wavBytes(8000f, 440.0, 0.5, 8000))).toDS()
    val f = Multimodal.extractFeatures(ds).collect().head.feature
    assert(f.length == Multimodal.AudioCodec.FeatureDim)
    // sine RMS = amp/sqrt(2) ~ 0.3536; mean|s| = 2*amp/pi ~ 0.3183
    assert(math.abs(f(1) - 0.3536f) < 0.01, s"rms: ${f(1)}")
    assert(math.abs(f(0) - 0.3183f) < 0.01, s"mean abs: ${f(0)}")
    // zero crossings: 2 per cycle, 440 cycles/s over 8000 samples/s
    assert(math.abs(f(2) - 2 * 440.0 / 8000) < 0.01, s"zcr: ${f(2)}")
    assert(math.abs(f(3) - 1.0f) < 1e-3, s"duration: ${f(3)}")
    assert(f(4) == 8000f && f(5) == 1.0f, "rate, channels")
    assert(math.abs(f(6) - 0.5f) < 0.01, s"peak: ${f(6)}")
    assert(math.abs(f(7)) < 0.01, s"dc offset: ${f(7)}")
  }

  test("undecodable image payloads fall back to the deterministic fake") {
    val raw = "not an image".getBytes("UTF-8")
    val ds = Seq(MediaAsset(1L, MediaMeta("image", 64, 48, 0, 0L), raw)).toDS()
    val f = Multimodal.extractFeatures(ds).collect().head.feature
    assert(f.toSeq == Multimodal.FakeCodec.decodeFeatures(raw).toSeq)
  }

  // a real MJPEG stream: n solid-color JPEG frames concatenated
  private def jpegBytes(rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }
  private def mjpegBytes(frames: Array[Byte]*): Array[Byte] =
    frames.reduce(_ ++ _)

  test("video modality REALLY parses MJPEG: marker-split frames, per-frame digests") {
    val f0 = jpegBytes(0xff0000); val f1 = jpegBytes(0x00ff00); val f2 = jpegBytes(0x0000ff)
    def md5of(b: Array[Byte]) = java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString
    // marker scan recovers the exact frame boundaries
    val stream = mjpegBytes(f0, f1, f2)
    val spans = Multimodal.MjpegCodec.frames(stream).get
    assert(spans.length == 3)
    assert(spans(0) == ((0, f0.length)) &&
      spans(1) == ((f0.length, f1.length)) &&
      spans(2) == ((f0.length + f1.length, f2.length)))
    // each recovered frame is itself a decodable JPEG
    spans.foreach { case (off, len) =>
      assert(Multimodal.ImageCodec.tryDecode(
        java.util.Arrays.copyOfRange(stream, off, off + len)).isDefined)
    }
    // sampled digests are the md5 of the REAL frame bytes at the mapped index
    val video = MediaAsset(9L, MediaMeta("video", 8, 8, 0, 3000L), stream)
    val frames = Multimodal.sampleFrames(Seq(video).toDS(), everyMs = 1000L)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_md5).toSeq == Seq(md5of(f0), md5of(f1), md5of(f2)))
    // oversampling maps repeated timestamps onto the same real frame —
    // and within-video repeats are NOT counted as cross-video duplicates
    val dense = Multimodal.sampleFrames(Seq(video).toDS(), everyMs = 500L)
      .collect().sortBy(_.frame_idx)
    assert(dense.map(_.frame_md5).distinct.length == 3)
    val share = Multimodal.duplicateFrameShare(Seq(video).toDS(), everyMs = 500L)
      .collect().head
    assert(share.getLong(2) == 0L, "a single video has no cross-video dup frames")
    // a re-upload of the same footage is fully flagged on REAL digests
    val reup = MediaAsset(10L, MediaMeta("video", 8, 8, 0, 3000L), stream)
    val out = Multimodal.duplicateFrameShare(Seq(video, reup).toDS(), everyMs = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(9L) == 0L && out(10L) == 10000L)
  }

  test("sampleFrames: cadence, count, determinism; non-video ignored") {
    val video = MediaAsset(7L, MediaMeta("video", 640, 480, 0, 2500L), "vvv".getBytes("UTF-8"))
    val ds = Seq(video, asset(8L, "img")).toDS()
    val frames = Multimodal.sampleFrames(ds, everyMs = 1000L).collect().sortBy(_.frame_idx)
    // ceil(2500/1000) = 3 frames at ts 0, 1000, 2000; image contributes none
    assert(frames.map(f => (f.asset_id, f.frame_idx, f.frame_ts_ms)).toSeq ==
      Seq((7L, 0, 0L), (7L, 1, 1000L), (7L, 2, 2000L)))
    assert(frames.map(_.frame_md5).distinct.length == 3) // per-frame digests differ
    val again = Multimodal.sampleFrames(ds, everyMs = 1000L).collect().sortBy(_.frame_idx)
    assert(again.map(_.frame_md5).toSeq == frames.map(_.frame_md5).toSeq)
  }

  test("duplicateFrameShare: a re-uploaded video is fully flagged, originals are clean") {
    def video(id: Long, payload: String, durMs: Long) =
      MediaAsset(id, MediaMeta("video", 64, 48, 16000, durMs),
        payload.getBytes("UTF-8"))
    val ds = Seq(
      video(1L, "footage-A", 3000L),
      video(2L, "footage-A", 3000L), // exact re-upload: every frame digest collides
      video(3L, "footage-B", 2000L),
      asset(4L, "not a video", "image")).toDS()
    val out = Multimodal.duplicateFrameShare(ds, everyMs = 1000L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((3L, 0L, 0L)), "first upload owns its frames")
    assert(out(2L) == ((3L, 3L, 10000L)), "re-upload must be 100% duplicate frames")
    assert(out(3L) == ((2L, 0L, 0L)))
    assert(!out.contains(4L), "non-video assets sample no frames")
  }

  test("ingestFromDocuments: schema contract and assetStats agreement") {
    val docs = Seq((0L, "hello world", "en", "src0", 11L),
      (1L, "ciao", "it", "src1", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val assets = Multimodal.ingestFromDocuments(docs)
    val stats = Multimodal.assetStats(assets).collect().sortBy(_.getLong(0))
    assert(stats(0).getString(1) == "image" && stats(1).getString(1) == "audio")
    assert(stats(0).getLong(2) == 11L && stats(1).getLong(2) == 4L)
    // typed path and declarative path agree on md5
    val typed = Multimodal.extractFeatures(
      assets.select(col("asset_id"), col("meta"), col("payload")).as[MediaAsset])
      .collect().map(f => f.asset_id -> f.payload_md5).toMap
    stats.foreach(r => assert(typed(r.getLong(0)) == r.getString(3)))
  }
}
