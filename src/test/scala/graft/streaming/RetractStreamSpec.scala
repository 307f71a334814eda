package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** X188 — retraction-aware maintenance: signed folds converge to the
  * batch net under any batch split, zero-net keys leave the store,
  * out-of-order deletes heal, re-delivery is guarded. */
class RetractStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def run(batches: Seq[Seq[(String, String)]]): (String, Map[String, Long]) = {
    val state = Files.createTempDirectory("graft-retract").toString
    val ckpt = Files.createTempDirectory("graft-retract-ck").toString
    val ms = MemoryStream[(String, String)]
    val q = RetractStream.maintain(ms.toDS().toDF("op", "k"), state, ckpt)
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    (state, RetractStream.totals(spark, state).as[(String, Long)].collect().toMap)
  }

  test("net counts converge to the batch fold; zero-net keys are dropped from state") {
    val changes = Seq(
      Seq("c" -> "a", "c" -> "a", "c" -> "b", "x" -> "a"), // non-c/d ops ignored
      Seq("d" -> "a", "c" -> "c"),
      Seq("d" -> "b")) // b returns to zero → removed
    val (_, got) = run(changes)
    assert(got == Map("a" -> 1L, "c" -> 1L))
  }

  test("a delete arriving before its insert goes negative, then heals") {
    val (state, got) = run(Seq(Seq("d" -> "a"), Seq("c" -> "a", "c" -> "a")))
    assert(got == Map("a" -> 1L))
    // and the intermediate really was negative state, not a drop
    val (_, neg) = run(Seq(Seq("d" -> "z")))
    assert(neg == Map("z" -> -1L))
    assert(state.nonEmpty)
  }

  test("batch-split invariance: one batch vs three batches, same totals") {
    val all = Seq("c" -> "a", "c" -> "b", "d" -> "a", "c" -> "a", "d" -> "b", "c" -> "b")
    val (_, one) = run(Seq(all))
    val (_, three) = run(all.grouped(2).toSeq)
    assert(one == three && one == Map("a" -> 1L, "b" -> 1L))
  }

  test("re-delivery guard: restart on the same checkpoint does not double-fold") {
    val state = Files.createTempDirectory("graft-retract-g").toString
    val ckpt = Files.createTempDirectory("graft-retract-g-ck").toString
    val ms = MemoryStream[(String, String)]
    val q = RetractStream.maintain(ms.toDS().toDF("op", "k"), state, ckpt)
    try { ms.addData(Seq("c" -> "a")); q.processAllAvailable() } finally q.stop()
    val ms2 = MemoryStream[(String, String)]
    val q2 = RetractStream.maintain(ms2.toDS().toDF("op", "k"), state, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(RetractStream.totals(spark, state).as[(String, Long)].collect().toMap ==
      Map("a" -> 1L))
  }
}
