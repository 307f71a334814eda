package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: image/audio/
  * video payloads are opaque `binary` columns with a typed metadata struct,
  * processed by per-partition batch operators.
  *
  * The IMAGE modality has a real pure-JVM codec ([[ImageCodec]],
  * `javax.imageio`: PNG/JPEG/BMP/GIF): decodable payloads are actually
  * decoded — pixel-statistic features, nearest-neighbor resize with PNG
  * re-encode. The AUDIO modality likewise ([[AudioCodec]],
  * `javax.sound.sampled`: WAV/AIFF/AU 16-bit PCM → signal-statistic
  * features). Payloads that don't parse (this container's synthetic
  * assets are text bytes) and the VIDEO modality (no pure-JVM codec
  * exists) fall back to the clearly-marked deterministic [[FakeCodec]];
  * everything Spark-side — schema, binary column handling, partition/
  * batch shape, the `mapPartitions` operator signature a real vectorized
  * decoder (Arrow-batch worker) plugs into — is identical in all paths
  * and tested on real PNG and WAV bytes (MultimodalSpec).
  */
object Multimodal {

  /** Typed per-asset metadata (what a real ingest would parse from the
    * container header). */
  case class MediaMeta(
      modality: String, // image | audio | video
      width: Int,
      height: Int,
      sampleRateHz: Int,
      durationMs: Long)

  case class MediaAsset(asset_id: Long, meta: MediaMeta, payload: Array[Byte])

  case class MediaFeature(
      asset_id: Long,
      modality: String,
      n_bytes: Long,
      payload_md5: String,
      feature: Array[Float])

  /** One sampled video frame (row-expansion output of [[sampleFrames]]). */
  case class FrameSample(
      asset_id: Long,
      frame_idx: Int,
      frame_ts_ms: Long,
      frame_md5: String)

  /** STUB — deterministic fake decoder standing in for the real image/audio
    * codec (not installed here). Derives a fixed-dim "feature" from payload
    * bytes so tests are reproducible. A real deployment swaps ONLY this
    * object (same batch-iterator signature) for e.g. a JNI/FFM codec. */
  object FakeCodec {
    val FeatureDim = 8
    def decodeFeatures(payload: Array[Byte]): Array[Float] = {
      val f = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        f(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      f
    }

    /** STUB resize: a real codec decodes, scales and re-encodes; the fake
      * folds the source bytes into a buffer sized by the target area so
      * output length and content are a pure function of (payload, w, h). */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](math.max(16, math.min(w * h / 64, 4096)))
      var i = 0
      while (i < payload.length) {
        out(i % out.length) = (out(i % out.length) + payload(i)).toByte
        i += 1
      }
      out
    }

    /** STUB frame extraction: a real codec seeks and decodes the frame at
      * `tsMs`; the fake hashes (payload, tsMs) — deterministic per frame. */
    def frameDigest(md5: java.security.MessageDigest, payload: Array[Byte], tsMs: Long): String = {
      md5.reset()
      md5.update(payload)
      md5.update(java.nio.ByteBuffer.allocate(8).putLong(tsMs).array())
      md5.digest().map("%02x".format(_)).mkString
    }
  }

  /** Real image codec — pure JVM via `javax.imageio` (PNG, JPEG, BMP, GIF
    * readers ship with the JDK). Deterministic: features are exact pixel
    * statistics; resize is nearest-neighbor (no AA, no filter kernels), so
    * the same payload yields the same pixels on every JVM. */
  object ImageCodec {
    import java.awt.image.BufferedImage

    val FeatureDim = 8

    /** None when the payload is not a decodable image (wrong magic bytes,
      * truncated container, or an unsupported format). */
    def tryDecode(payload: Array[Byte]): Option[BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: Exception => None }

    /** Pixel-statistic feature vector: mean R/G/B and luma (0–1), width,
      * height, aspect ratio, share of bright (luma > 127) pixels. */
    def features(img: BufferedImage): Array[Float] = {
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb, sy) = (0.0, 0.0, 0.0, 0.0)
      var bright = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          val luma = 0.299 * r + 0.587 * g + 0.114 * b
          sr += r; sg += g; sb += b; sy += luma
          if (luma > 127.0) bright += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Array(
        (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat,
        (sb / n / 255.0).toFloat, (sy / n / 255.0).toFloat,
        w.toFloat, h.toFloat, w.toFloat / h, bright.toFloat / n)
    }

    /** Nearest-neighbor resize, PNG re-encode. */
    def resize(img: BufferedImage, w: Int, h: Int): Array[Byte] = {
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out.setRGB(x, y,
            img.getRGB(x * img.getWidth / w, y * img.getHeight / h))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** Real audio codec — pure JVM via `javax.sound.sampled` (WAV/AIFF/AU
    * PCM readers ship with the JDK). Deterministic: features are exact
    * arithmetic over the decoded 16-bit PCM samples. */
  object AudioCodec {
    val FeatureDim = 8

    /** Decoded PCM: 16-bit samples (channel-interleaved), rate, channels.
      * None when the payload is not a decodable audio container. */
    def tryDecode(payload: Array[Byte]): Option[(Array[Short], Float, Int)] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = in.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(bytes).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          val samples = new Array[Short](bytes.length / 2)
          bb.asShortBuffer().get(samples)
          Some((samples, fmt.getSampleRate, fmt.getChannels))
        }
      } catch { case _: Exception => None }

    /** Signal-statistic feature vector: mean |s| and RMS (0–1 of full
      * scale), zero-crossing rate, duration (s), sample rate, channels,
      * peak (0–1), DC offset (−1–1). */
    def features(samples: Array[Short], rateHz: Float, channels: Int): Array[Float] = {
      val n = math.max(samples.length, 1)
      var (sumAbs, sumSq, sum) = (0.0, 0.0, 0.0)
      var crossings = 0L
      var peak = 0.0
      var i = 0
      while (i < samples.length) {
        val s = samples(i).toDouble
        sumAbs += math.abs(s); sumSq += s * s; sum += s
        peak = math.max(peak, math.abs(s))
        if (i >= channels && ((samples(i - channels) < 0) != (s < 0))) crossings += 1
        i += 1
      }
      val full = 32768.0
      Array(
        (sumAbs / n / full).toFloat,
        (math.sqrt(sumSq / n) / full).toFloat,
        (crossings.toDouble / n).toFloat,
        (samples.length.toDouble / channels / rateHz).toFloat,
        rateHz, channels.toFloat,
        (peak / full).toFloat, (sum / n / full).toFloat)
    }
  }

  /** Build a MediaAsset table from the `documents` testdata: the text bytes
    * play the opaque payload, metadata derived deterministically. This is
    * the ingest-side schema contract (binary + typed struct). */
  def ingestFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        (pmod(col("doc_id"), lit(640)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 1).cast("int").as("height"),
        lit(16000).as("sampleRateHz"),
        (col("n_chars") * 10L).as("durationMs")).as("meta"),
      encode(col("text"), "UTF-8").as("payload"))

  /** The decode/feature-extract operator: per-partition batched map —
    * exactly the shape a vectorized (Arrow-batch) decoder needs. Binary
    * payloads never hit the driver; partition sizing is the scale knob
    * (`spark.sql.files.maxPartitionBytes` against big asset files). */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // per-partition init (a real codec inits native resources here);
      // one digest instance reused across the partition's records
      val md5 = java.security.MessageDigest.getInstance("MD5")
      batch.map { a =>
        md5.reset()
        // image → real javax.imageio decode, audio → real javax.sound
        // PCM decode when the payload parses; video (no pure-JVM codec)
        // and unparseable payloads → fake
        val feature = a.meta.modality match {
          case "image" =>
            ImageCodec.tryDecode(a.payload).map(ImageCodec.features)
              .getOrElse(FakeCodec.decodeFeatures(a.payload))
          case "audio" =>
            AudioCodec.tryDecode(a.payload)
              .map { case (s, r, c) => AudioCodec.features(s, r, c) }
              .getOrElse(FakeCodec.decodeFeatures(a.payload))
          case _ => FakeCodec.decodeFeatures(a.payload)
        }
        MediaFeature(
          asset_id = a.asset_id,
          modality = a.meta.modality,
          n_bytes = a.payload.length.toLong,
          payload_md5 = md5.digest(a.payload).map("%02x".format(_)).mkString,
          feature = feature)
      }
    }
  }

  /** Image resize: per-partition batched transform of the image-modality
    * rows; other modalities pass through untouched (so the operator
    * composes in a mixed-modality pipeline without a split/union). Same
    * `mapPartitions` batch shape as [[extractFeatures]] — a real decoder
    * inits its native scaler once per partition. */
  def resizeImages(assets: Dataset[MediaAsset], w: Int, h: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      batch.map { a =>
        if (a.meta.modality != "image") a
        else a.copy(
          meta = a.meta.copy(width = w, height = h),
          payload = ImageCodec.tryDecode(a.payload)
            .map(img => ImageCodec.resize(img, w, h))
            .getOrElse(FakeCodec.resize(a.payload, w, h)))
      }
    }
  }

  /** Real video container parser for Motion-JPEG streams (concatenated
    * JPEG frames — the MJPEG-over-HTTP wire format minus the multipart
    * headers; pure JVM, frames decodable by [[ImageCodec]]). Modern
    * inter-frame codecs (H.264/VP9/AV1) require native decoders and stay
    * behind [[FakeCodec]]. */
  object MjpegCodec {
    /** (offset, length) of each JPEG frame (SOI `FFD8` … EOI `FFD9`
      * marker scan). None unless the payload starts with SOI and contains
      * at least one complete frame.
      *
      * Caveat: entropy-coded JPEG data cannot contain `FFD9` (byte
      * stuffing escapes every literal `FF`), but an EXIF APP1 segment may
      * embed a complete thumbnail JPEG whose own EOI would split a frame
      * early. MJPEG encoders emit bare frames (no EXIF), so the scan is
      * exact for real streams; strip APP1 upstream if feeding
      * camera-originals. */
    def frames(payload: Array[Byte]): Option[Vector[(Int, Int)]] = {
      if (payload.length < 4 ||
        (payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8) return None
      val out = Vector.newBuilder[(Int, Int)]
      var start = 0
      var i = 0
      var n = 0
      while (i + 1 < payload.length) {
        if ((payload(i) & 0xff) == 0xff && (payload(i + 1) & 0xff) == 0xd9) {
          out += ((start, i + 2 - start)); n += 1
          start = i + 2
          i += 2
        } else i += 1
      }
      if (n == 0) None else Some(out.result())
    }
  }

  /** THE VIDEO CODEC SEAM — the exact interface a native decoder
    * (H.264/VP9/AV1 via JNI/FFM) drops into; everything Spark-side
    * ([[sampleFrames]]'s partition iterator, row expansion, schema) is
    * codec-agnostic and unchanged by a swap.
    *
    * Contract (CodecContractSpec pins every clause for BOTH shipped
    * implementations):
    *   1. `open` NEVER throws — it returns None for a container this
    *      codec cannot parse (garbage bytes, foreign magic, truncation).
    *   2. An [[OpenedVideo]] is deterministic: the same (payload,
    *      durationMs, tsMs) yields the same digest across instances,
    *      JVMs and executors.
    *   3. `frameDigestAt` is total on [0, durationMs): every sampled
    *      timestamp yields a 32-char lowercase-hex md5 — no gaps, no
    *      exceptions at the edges (ts = 0 and ts = durationMs − 1).
    *   4. `nFrames >= 1`, and the ts → frame mapping is monotone:
    *      ts₁ ≤ ts₂ never maps to a later-then-earlier frame.
    *   5. A REAL codec's digest is content-addressed (md5 of the decoded
    *      frame bytes), so identical footage digests identically across
    *      assets. The stub cannot satisfy 5 (it has no frames) and
    *      documents digest = f(payload, ts) instead — which is why it
    *      must be LAST in the chain, behind every real codec.
    */
  trait VideoCodec extends Serializable {
    def name: String
    /** Parse the container header; None when undecodable. MUST NOT throw. */
    def open(payload: Array[Byte], durationMs: Long): Option[OpenedVideo]
  }

  /** A parsed video stream, ready for random-access frame digests. */
  trait OpenedVideo {
    /** Total decodable frames (≥ 1). */
    def nFrames: Int
    /** md5 hex of the frame nearest `tsMs` (uniform frame spacing when
      * the container carries no per-frame timestamps). `md` is a reusable
      * per-partition digest instance. */
    def frameDigestAt(tsMs: Long, md: java.security.MessageDigest): String
  }

  /** [[MjpegCodec]] behind the seam: real frame extraction, digest = md5
    * of the sampled frame's actual JPEG bytes (contract clause 5). */
  object MjpegVideoCodec extends VideoCodec {
    val name = "mjpeg"
    def open(payload: Array[Byte], durationMs: Long): Option[OpenedVideo] =
      MjpegCodec.frames(payload).map { fr =>
        new OpenedVideo {
          val nFrames: Int = fr.length
          def frameDigestAt(tsMs: Long, md: java.security.MessageDigest): String = {
            val idx = math.min(fr.length - 1,
              (tsMs * fr.length / math.max(durationMs, 1L)).toInt)
            val (off, len) = fr(idx)
            md.reset(); md.update(payload, off, len)
            md.digest().map("%02x".format(_)).mkString
          }
        }
      }
  }

  /** [[FakeCodec]] behind the seam: always opens (the terminal fallback),
    * digest = md5(payload ‖ ts) — deterministic but NOT content-addressed
    * (clause 5 exemption; see the seam doc). Every millisecond is
    * notionally its own frame. */
  object FakeVideoCodec extends VideoCodec {
    val name = "fake"
    def open(payload: Array[Byte], durationMs: Long): Option[OpenedVideo] =
      Some(new OpenedVideo {
        val nFrames: Int =
          math.max(1L, math.min(durationMs, Int.MaxValue.toLong)).toInt
        def frameDigestAt(tsMs: Long, md: java.security.MessageDigest): String =
          FakeCodec.frameDigest(md, payload, tsMs)
      })
  }

  /** Default decode chain: real codecs first, stub last. An H.264 drop-in
    * is `H264VideoCodec +: DefaultVideoCodecs` — no Spark-side change. */
  val DefaultVideoCodecs: Seq[VideoCodec] = Seq(MjpegVideoCodec, FakeVideoCodec)

  /** Video frame sampling: row-expanding per-partition transform — one
    * output row per sampled timestamp (0, everyMs, 2·everyMs, … <
    * durationMs). The expansion happens inside the iterator (no
    * driver-side explode), so a long video becomes many rows WITHOUT
    * materializing all frames of a partition at once — the shape that
    * holds when a partition carries hours of footage.
    *
    * Decoding goes through the [[VideoCodec]] chain (first codec whose
    * `open` accepts the payload wins): MJPEG payloads get REAL frame
    * extraction with content-addressed digests, everything else falls
    * through to the deterministic stub. */
  def sampleFrames(
      assets: Dataset[MediaAsset],
      everyMs: Long,
      codecs: Seq[VideoCodec] = DefaultVideoCodecs): Dataset[FrameSample] = {
    import assets.sparkSession.implicits._
    require(everyMs > 0, "sampling cadence must be positive")
    require(codecs.nonEmpty, "codec chain must not be empty")
    assets.mapPartitions { batch =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
      batch.filter(_.meta.modality == "video").flatMap { a =>
        val n = ((a.meta.durationMs + everyMs - 1) / everyMs).toInt
        val opened = codecs.iterator
          .flatMap(_.open(a.payload, a.meta.durationMs)).nextOption()
        (0 until n).iterator.map { i =>
          val ts = i * everyMs
          val digest = opened match {
            case Some(o) => o.frameDigestAt(ts, md5)
            case None => FakeCodec.frameDigest(md5, a.payload, ts)
          }
          FrameSample(a.asset_id, i, ts, digest)
        }
      }
    }
  }

  /** Cross-video duplicate-frame report: sampled frames dedup'd by content
    * hash (first occurrence by (asset_id, frame_idx) owns the frame), each
    * video reporting the share of its frames already seen in ANOTHER video
    * — near-dup video detection at frame granularity, the multimodal twin
    * of the text chunk-dedup screen (X87). Composition of [[sampleFrames]]
    * (lazy row expansion inside the partition iterator) + one shuffle on
    * the frame hash + one per-video aggregate; frame hashes, not frame
    * bytes, are what shuffles. */
  def duplicateFrameShare(assets: Dataset[MediaAsset], everyMs: Long): DataFrame = {
    val frames = sampleFrames(assets, everyMs).toDF()
    val owner = frames.groupBy("frame_md5")
      .agg(min(struct(col("asset_id"), col("frame_idx"))).as("own"))
    frames.join(owner, "frame_md5")
      .withColumn("dup", (col("own.asset_id") =!= col("asset_id")).cast("long"))
      .groupBy("asset_id")
      .agg(count(lit(1)).as("n_frames"), sum("dup").as("n_dup_frames"))
      .withColumn("dup_x10k",
        floor(lit(10000L) * col("n_dup_frames") / col("n_frames")).cast("long"))
  }

  /** Declarative twin of the metadata/byte-accounting part of
    * [[extractFeatures]] (no codec): SQL-expressible, oracle-checkable. */
  def assetStats(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"),
      col("meta.modality").as("modality"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("payload_md5"))
}
