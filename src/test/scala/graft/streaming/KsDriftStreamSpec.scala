package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** X277 — continuous KS drift: the stream-folded histogram equals the
  * one-shot batch histogram under uneven splits; the KS read against a
  * frozen reference matches the exact batch-computed statistic; the
  * batchId guard keeps cell addition safe on restart. */
class KsDriftStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // reference corpus (frozen) and an arriving corpus whose src1 lengths
  // shifted up by ~40 chars — KS must rank src1's drift above src0's
  private val reference: Seq[(String, Long)] =
    Seq.tabulate(40)(i => ("src0", 100L + (i % 5) * 10)) ++
      Seq.tabulate(40)(i => ("src1", 100L + (i % 5) * 10))
  private val arriving: Seq[(String, Long)] =
    Seq.tabulate(30)(i => ("src0", 100L + (i % 5) * 10)) ++
      Seq.tabulate(30)(i => ("src1", 140L + (i % 5) * 10))

  private def hist(rows: Seq[(String, Long)]) =
    rows.toDF("source", "n_chars")
      .groupBy("source", "n_chars").agg(count(lit(1)).as("cnt"))

  test("stream-folded histogram == batch histogram; KS matches the exact batch statistic") {
    val state = Files.createTempDirectory("graft-ks-state").toString
    val ckpt = Files.createTempDirectory("graft-ks-ckpt").toString
    val ms = MemoryStream[(String, Long)]
    val q = KsDriftStream.maintain(
      ms.toDS().toDF("source", "n_chars"), state, ckpt)
    try {
      arriving.grouped(17).foreach { g => ms.addData(g); q.processAllAvailable() }
    } finally q.stop()

    val streamed = KsDriftStream.histSnapshot(spark, state)
      .orderBy("source", "n_chars").collect().toSeq
    val oneShot = hist(arriving).orderBy("source", "n_chars").collect().toSeq
    assert(streamed == oneShot, "cell-level histogram equality under splits")

    val ks = KsDriftStream.ks(spark, state, hist(reference))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    // src0 arrived with the SAME distribution → KS 0; src1 shifted → max
    assert(ks("src0")._3 == 0L, s"undrifted source must have ks_num 0: $ks")
    assert(ks("src1")._3 > 0L && ks("src1")._4 > 0L, s"shifted source must drift: $ks")
    // exactness: src1 shifted by 4 of 5 length buckets → D = 4/5 exactly:
    // ks_num = D · n_ref · n_cur = 0.8 · 40 · 30 = 960, ks_x1m = 800000
    assert(ks("src1")._1 == 40L && ks("src1")._2 == 30L)
    assert(ks("src1")._3 == 960L && ks("src1")._4 == 800000L,
      s"exact cross-multiplied KS: $ks")
  }

  test("batchId guard: restart on the same checkpoint leaves the histogram unchanged") {
    val state = Files.createTempDirectory("graft-ks-guard").toString
    val ckpt = Files.createTempDirectory("graft-ks-gck").toString
    val ms = MemoryStream[(String, Long)]
    val q = KsDriftStream.maintain(
      ms.toDS().toDF("source", "n_chars"), state, ckpt)
    try { ms.addData(arriving.take(10)); q.processAllAvailable() } finally q.stop()
    val before = KsDriftStream.histSnapshot(spark, state)
      .agg(sum("cnt")).as[Long].head()
    val ms2 = MemoryStream[(String, Long)]
    val q2 = KsDriftStream.maintain(
      ms2.toDS().toDF("source", "n_chars"), state, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val after = KsDriftStream.histSnapshot(spark, state)
      .agg(sum("cnt")).as[Long].head()
    assert(before == after && before == 10L)
  }
}
