package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Session-window aggregation must converge, over micro-batches with
  * out-of-order arrivals that MERGE previously separate sessions, to the
  * batch result of the same expression. */
class SessionsSpec extends SparkSpec {

  import spark.implicits._

  private val Min = 60L * 1000

  test("streaming session stats over micro-batches == batch on same data") {
    implicit val ctx = spark.sqlContext
    // user 1: events at 0 and 50min (two sessions with a 30min gap) — then
    // a LATE event at 25min bridges them into one session (session merge,
    // the hard case for session-window state)
    val rows = Seq(
      (1L, 0L),
      (1L, 50 * Min),
      (2L, 10 * Min),
      (1L, 25 * Min), // late bridging event, arrives in batch 2
      (2L, 39 * Min), // 29min gap → same session for user 2
      (3L, 120 * Min))
    val ms = MemoryStream[(Long, Long)]
    def named(df: org.apache.spark.sql.DataFrame) = df.toDF("user_id", "ts_ms")
    val q = Sessions.sessionStats(named(ms.toDF()))
      .writeStream.format("memory").queryName("session_stats")
      .outputMode("complete")
      .start()
    try {
      ms.addData(rows.take(3)); q.processAllAvailable()
      ms.addData(rows.slice(3, 5)); q.processAllAvailable()
      ms.addData(rows.drop(5)); q.processAllAvailable()
      val streamed = spark.table("session_stats")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batch = Sessions.sessionStats(named(rows.toDF()))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == batch)
      // the bridged session: user 1's three events 0/25/50min are ONE
      // session (each gap 25min < 30min) ending at 50min + gap
      assert(batch.contains((1L, 0L, 50 * Min + 30 * Min, 3L)))
      assert(batch.contains((2L, 10 * Min, 39 * Min + 30 * Min, 2L)))
      assert(batch.contains((3L, 120 * Min, 150 * Min, 1L)))
      assert(batch.size == 3)
    } finally q.stop()
  }

  test("a gap of exactly the session window MERGES; one past it splits (diff > gap contract)") {
    val exact = Seq((1L, 0L), (1L, 30 * Min)).toDF("user_id", "ts_ms")
    assert(Sessions.sessionStats(exact).collect().length == 1)
    val past = Seq((1L, 0L), (1L, 30 * Min + 1)).toDF("user_id", "ts_ms")
    assert(Sessions.sessionStats(past).collect().length == 2)
  }
}
