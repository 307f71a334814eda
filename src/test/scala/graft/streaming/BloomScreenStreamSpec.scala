package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** X215 — continuous Bloom screen: the stream-folded bitset equals the
  * one-shot batch bitset under any split INCLUDING redelivered docs
  * (bit union is idempotent); screen counts against the live bitset
  * match q192's candidate arithmetic; the batchId guard holds. */
class BloomScreenStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val evalDocs: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "pack my box with five dozen liquor jugs",
    3L -> "the quick brown fox likes liquor jugs too")

  test("stream-folded bitset == one-shot bitset under splits + redelivery; screen math") {
    val state = Files.createTempDirectory("graft-bss-state").toString
    val ckpt = Files.createTempDirectory("graft-bss-ckpt").toString
    val ms = MemoryStream[(Long, String)]
    val q = BloomScreenStream.maintain(
      ms.toDS().toDF("doc_id", "text"), state, ckpt)
    try {
      ms.addData(evalDocs.take(2)); q.processAllAvailable()
      // doc 2 REDELIVERED alongside doc 3
      ms.addData(evalDocs.drop(1)); q.processAllAvailable()
    } finally q.stop()

    val streamed = BloomScreenStream.bitsSnapshot(spark, state)
      .orderBy("bit").as[Long].collect().toSeq
    val gb = BloomScreenStream.gramBits(evalDocs.toDF("doc_id", "text"), 3)
    val oneShot = gb.select(col("h1").as("bit"))
      .union(gb.select(col("h2").as("bit"))).distinct()
      .orderBy("bit").as[Long].collect().toSeq
    assert(streamed == oneShot, "bit-level equality under splits + redelivery")

    // a doc sharing a full 3-gram with eval must have bloom passes; a
    // disjoint-vocabulary doc must have zero
    val train = Seq(
      10L -> "jumps over the lazy dog tonight",
      11L -> "completely unrelated vocabulary here entirely").toDF("doc_id", "text")
    val r10 = BloomScreenStream.screen(spark, train, state)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(r10(10L)._2 > 0, s"shared grams must pass the bloom: $r10")
    assert(r10(11L)._2 == 0, s"disjoint vocabulary must not pass: $r10")
    assert(r10(10L)._1 > 0 && r10(11L)._1 > 0)
  }

  test("batchId guard: restart replay leaves the bitset generation untouched") {
    val state = Files.createTempDirectory("graft-bss-guard").toString
    val ckpt = Files.createTempDirectory("graft-bss-guard-ck").toString
    val ms = MemoryStream[(Long, String)]
    val q = BloomScreenStream.maintain(
      ms.toDS().toDF("doc_id", "text"), state, ckpt)
    try { ms.addData(evalDocs); q.processAllAvailable() } finally q.stop()
    val before = BloomScreenStream.bitsSnapshot(spark, state).count()
    val ms2 = MemoryStream[(Long, String)]
    val q2 = BloomScreenStream.maintain(
      ms2.toDS().toDF("doc_id", "text"), state, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val after = BloomScreenStream.bitsSnapshot(spark, state).count()
    assert(before == after && before > 0)
  }
}
