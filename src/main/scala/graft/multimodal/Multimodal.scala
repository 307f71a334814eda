package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: image/audio/
  * video payloads are opaque `binary` columns with a typed metadata struct,
  * processed by per-partition batch operators.
  *
  * The actual media codecs are NOT available in this environment (builder
  * prompt), so the decode step is a clearly-marked deterministic fake
  * ([[FakeCodec]]); everything Spark-side — schema, binary column handling,
  * partition/batch shape, the `mapPartitions` operator signature that a
  * real vectorized decoder (Pandas-UDF-style batch worker) would plug into
  * — is real and tested.
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
        MediaFeature(
          asset_id = a.asset_id,
          modality = a.meta.modality,
          n_bytes = a.payload.length.toLong,
          payload_md5 = md5.digest(a.payload).map("%02x".format(_)).mkString,
          feature = FakeCodec.decodeFeatures(a.payload))
      }
    }
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
