package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.ops.Dedup

/** Streaming exact dedup must drop content duplicates ACROSS micro-batches
  * (state carries fingerprints between batches), keeping the first
  * arrival, while distinct content passes through. */
class DedupStreamSpec extends SparkSpec {

  import spark.implicits._

  test("cross-batch duplicate content is dropped; first arrival survives") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, String)]
    val q = Dedup.exactStreaming(
      ms.toDF().toDF("doc_id", "ts_ms", "text"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append")
      .start()
    try {
      // batch 1: two docs, one internal duplicate pair (normalization-equal)
      ms.addData(Seq((1L, 1000L, "Hello,   World!"), (2L, 2000L, "fresh content")))
      q.processAllAvailable()
      // batch 2: doc 3 duplicates doc 1 (same normalized text) — must drop;
      // doc 4 is new — must pass
      ms.addData(Seq((3L, 3000L, "hello world"), (4L, 4000L, "another one")))
      q.processAllAvailable()
      val out = spark.table("dedup_stream").select("doc_id").as[Long].collect().sorted
      assert(out.toSeq == Seq(1L, 2L, 4L))
    } finally q.stop()
  }
}
