package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** X229 — continuous suggest index: stream-folded vocabulary counts
  * equal the one-shot batch counts under any split; the derived suggest
  * table matches the batch q201 arithmetic; the batchId guard protects
  * the non-idempotent addition. */
class SuggestStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val docs: Seq[String] = Seq(
    "spark sparse sort sort",
    "spark spark soup",
    "sort sortie spark")

  test("stream-folded vocabulary == one-shot batch counts; suggest ranks by merged freq") {
    val state = Files.createTempDirectory("graft-sgs-state").toString
    val ckpt = Files.createTempDirectory("graft-sgs-ckpt").toString
    val ms = MemoryStream[String]
    val q = SuggestStream.maintain(ms.toDS().toDF("text"), state, ckpt)
    try {
      docs.foreach { d => ms.addData(Seq(d)); q.processAllAvailable() }
    } finally q.stop()

    val streamed = SuggestStream.snapshot(spark, state)
      .orderBy("token").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // spark x4, sort x3, sparse 1, soup 1, sortie 1
    assert(streamed == Seq("sort" -> 3L, "sortie" -> 1L, "soup" -> 1L,
      "spark" -> 4L, "sparse" -> 1L))

    val sug = SuggestStream.suggest(spark, state, maxPrefix = 3, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    // prefix "s": spark(4) then sort(3); prefix "sor": sort, sortie
    assert(sug.contains(("s", 1L, "spark")) && sug.contains(("s", 2L, "sort")))
    assert(sug.contains(("sor", 1L, "sort")) && sug.contains(("sor", 2L, "sortie")))
  }

  test("batchId guard: restart replay does not double-count the vocabulary") {
    val state = Files.createTempDirectory("graft-sgs-guard").toString
    val ckpt = Files.createTempDirectory("graft-sgs-guard-ck").toString
    val ms = MemoryStream[String]
    val q = SuggestStream.maintain(ms.toDS().toDF("text"), state, ckpt)
    try { ms.addData(docs); q.processAllAvailable() } finally q.stop()
    val before = SuggestStream.snapshot(spark, state).agg(sum("freq")).as[Long].head()
    val ms2 = MemoryStream[String]
    val q2 = SuggestStream.maintain(ms2.toDS().toDF("text"), state, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val after = SuggestStream.snapshot(spark, state).agg(sum("freq")).as[Long].head()
    assert(before == after && before == 10L)
  }
}
