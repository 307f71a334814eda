package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The continuous priority sample must equal the batch sample over
  * everything seen so far, regardless of batch splits or re-delivered
  * rows — the priority is a pure function of (seed, id, weight). */
class PrioritySampleStreamSpec extends SparkSpec {

  import spark.implicits._

  private val K = 5
  private val Seed = 57L

  private def batchSample(rows: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    rows.toDF("id", "weight")
      .withColumn("priority", PrioritySampleStream.priorityExpr(Seed, "id", "weight"))
      .orderBy(col("priority").desc, col("id")).limit(K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("streamed batches converge to the batch top-k priority sample") {
    implicit val ctx = spark.sqlContext
    val all = (1L to 40L).map(i => (i, 10L + (i * 7) % 90))
    val statePath = java.nio.file.Files.createTempDirectory("graft-psample").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-psample-ckpt").toString
    val ms = MemoryStream[(Long, Long)]
    val q = PrioritySampleStream.sample(
      ms.toDF().toDF("doc_id", "weight"), K, Seed, statePath, ckpt)
    try all.grouped(9).foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    val streamed = PrioritySampleStream.current(spark, statePath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batchSample(all), "stream sample must equal the batch sample")
  }

  test("re-delivered rows cannot change the sample (id dedup + deterministic priority)") {
    implicit val ctx = spark.sqlContext
    val all = (1L to 20L).map(i => (i, 100L - i))
    val statePath = java.nio.file.Files.createTempDirectory("graft-psample").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-psample-ckpt").toString
    val ms = MemoryStream[(Long, Long)]
    val q = PrioritySampleStream.sample(
      ms.toDF().toDF("doc_id", "weight"), K, Seed, statePath, ckpt)
    try {
      ms.addData(all.take(12)); q.processAllAvailable()
      // rows 5-12 arrive AGAIN in a later batch alongside new data
      ms.addData(all.drop(4)); q.processAllAvailable()
    } finally q.stop()
    val streamed = PrioritySampleStream.current(spark, statePath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batchSample(all))
  }
}
