package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The structured trace emitter must report per-batch DELTAS of the
  * outcome counters as parseable JSON with the reference span's attribute
  * vocabulary (eventCode / outcome / count). */
class TraceLogSpec extends AnyFunSuite {

  test("emits one record per changed (eventCode, outcome), deltas not totals") {
    val acc = new OutcomeCountsAccumulator
    val lines = scala.collection.mutable.Buffer.empty[String]
    val em = new TraceLog.Emitter(acc, lines += _, () => 1234L)

    acc.add(MergeMetrics.key("ACTIVATED", MergeMetrics.OkFull))
    acc.add(MergeMetrics.key("ACTIVATED", MergeMetrics.OkFull))
    acc.add(MergeMetrics.key("CLOSED", MergeMetrics.NoopStale))
    val r1 = em.emit(0L)
    assert(r1.toSet == Set(
      TraceLog.Record(1234L, 0L, "ACTIVATED", "ok_full", 2L),
      TraceLog.Record(1234L, 0L, "CLOSED", "noop_stale", 1L)))

    // next batch: only one counter moves → only one record, with the delta
    acc.add(MergeMetrics.key("ACTIVATED", MergeMetrics.OkFull))
    val r2 = em.emit(1L)
    assert(r2 == Seq(TraceLog.Record(1234L, 1L, "ACTIVATED", "ok_full", 1L)))

    // an empty batch emits nothing
    assert(em.emit(2L).isEmpty)

    // sink lines are machine-parseable JSON with fixed keys
    assert(lines.size == 3)
    assert(lines.head.contains(""""event_code":"ACTIVATED""""))
    assert(lines.head.contains(""""outcome":"ok_full""""))
    assert(lines.head.contains(""""batch_id":0"""))
    assert(lines.head.contains(""""logger":"graft.trace.merge""""))
  }

  test("JSON escaping survives hostile event codes") {
    val r = TraceLog.Record(1L, 2L, "we\"ird\\code\n", "ok_full", 3L)
    val s = TraceLog.formatJson(r)
    assert(s.contains("we\\\"ird\\\\code\\u000a"))
  }
}
