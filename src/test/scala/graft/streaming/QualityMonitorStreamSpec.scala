package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** X207 — continuous quality monitor: stream-folded confusion counts
  * equal the one-shot batch aggregate under any batch split; the
  * report's integer P/R/F1 matches q184's arithmetic; the batchId guard
  * protects the non-idempotent addition merge. */
class QualityMonitorStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // (true, pred): label 0 -> 3/4 correct; label 1 -> 2/3; one stray pred=2
  private val pairsData: Seq[(Long, Long)] =
    Seq(0L -> 0L, 0L -> 0L, 0L -> 0L, 0L -> 1L,
      1L -> 1L, 1L -> 1L, 1L -> 2L)

  test("stream-folded counts == one-shot batch delta under uneven splits; report math") {
    val state = Files.createTempDirectory("graft-qms-state").toString
    val ckpt = Files.createTempDirectory("graft-qms-ckpt").toString
    val ms = MemoryStream[(Long, Long)]
    val q = QualityMonitorStream.maintain(
      ms.toDS().toDF("true_label", "pred_label"), state, ckpt)
    try {
      pairsData.grouped(3).foreach { g => ms.addData(g); q.processAllAvailable() }
    } finally q.stop()

    val streamed = QualityMonitorStream.snapshot(spark, state)
      .orderBy("label").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val oneShot = QualityMonitorStream.confusionDelta(
        pairsData.toDF("true_label", "pred_label"))
      .orderBy("label").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(streamed == oneShot, "count-level equality under batch splits")
    // label 0: n_true 4, tp 3, n_pred 3 -> prec 10000, rec 7500
    assert(streamed.contains(("0", 4L, 3L, 3L)))
    // label 2: never true, predicted once
    assert(streamed.contains(("2", 0L, 0L, 1L)))

    val rep = QualityMonitorStream.report(spark, state)
      .select("label", "prec_x10k", "rec_x10k", "f1_x10k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // label 0: prec=10000, rec=7500, f1=(2*10000*7500) div 17500 = 8571
    assert(rep.contains(("0", 10000L, 7500L, 8571L)))
    // label 2: all zero guards hold
    assert(rep.contains(("2", 0L, 0L, 0L)))
  }

  test("state schema is label-type independent: string labels fold identically") {
    val state = Files.createTempDirectory("graft-qms-str").toString
    val ckpt = Files.createTempDirectory("graft-qms-str-ck").toString
    val ms = MemoryStream[(String, String)]
    val q = QualityMonitorStream.maintain(
      ms.toDS().toDF("true_label", "pred_label"), state, ckpt)
    try {
      ms.addData(Seq("cat" -> "cat", "cat" -> "dog")); q.processAllAvailable()
      ms.addData(Seq("dog" -> "dog")); q.processAllAvailable()
    } finally q.stop()
    val snap = QualityMonitorStream.snapshot(spark, state)
    assert(snap.schema("label").dataType ==
      org.apache.spark.sql.types.StringType)
    val got = snap.orderBy("label").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("cat", 2L, 1L, 1L), ("dog", 1L, 1L, 2L)))
  }

  test("batchId guard: restart replay does not double-count") {
    val state = Files.createTempDirectory("graft-qms-guard").toString
    val ckpt = Files.createTempDirectory("graft-qms-guard-ck").toString
    val ms = MemoryStream[(Long, Long)]
    val q = QualityMonitorStream.maintain(
      ms.toDS().toDF("true_label", "pred_label"), state, ckpt)
    try { ms.addData(pairsData); q.processAllAvailable() } finally q.stop()
    val before = QualityMonitorStream.snapshot(spark, state)
      .agg(sum("n_true")).as[Long].head()
    val ms2 = MemoryStream[(Long, Long)]
    val q2 = QualityMonitorStream.maintain(
      ms2.toDS().toDF("true_label", "pred_label"), state, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val after = QualityMonitorStream.snapshot(spark, state)
      .agg(sum("n_true")).as[Long].head()
    assert(before == after && before == pairsData.size.toLong)
  }
}
