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
