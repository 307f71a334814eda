package graft.streaming

/** Structured tracing side-channel — the engine's parity for the
  * reference's per-event OTel span + MDC-enriched logging
  * (`utils/ViewUpdateTracingUtils.kt:23-37` sets
  * eventCode/transactionId/outcome span attributes per upsert;
  * `mdcutilities/CdcTracingUtils.java` enriches the log context).
  *
  * Spark-idiomatic twin: one structured JSON record per
  * (eventCode, outcome) per micro-batch, derived as DELTAS of the
  * [[OutcomeCountsAccumulator]] between emissions — per-EVENT spans at
  * 100 TB would dominate the work itself, and the reference's span
  * attributes are exactly the group-by keys of these records, so the
  * aggregated form carries the same signal at batch granularity.
  * Records are machine-parseable (fixed keys, JSON-escaped values) —
  * MDC's role — and go to a pluggable sink (default stderr, i.e. the
  * executor/driver log stream).
  */
object TraceLog {

  final case class Record(
      atMs: Long, batchId: Long, eventCode: String, outcome: String, count: Long)

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def formatJson(r: Record): String =
    s"""{"at_ms":${r.atMs},"batch_id":${r.batchId},"event_code":"${esc(r.eventCode)}",""" +
      s""""outcome":"${esc(r.outcome)}","count":${r.count},"logger":"graft.trace.merge"}"""

  /** Stateful per-query emitter. Call `emit(batchId)` once per micro-batch
    * (e.g. at the end of a foreachBatch body); it reads the accumulator,
    * diffs against the previous snapshot, sinks one JSON line per changed
    * (eventCode, outcome), and returns the records for callers that want
    * them. Not thread-safe across concurrent emits (one emitter per
    * streaming query, which is also the accumulator's scope). */
  final class Emitter(
      acc: OutcomeCountsAccumulator,
      sink: String => Unit = System.err.println,
      clockMs: () => Long = () => System.currentTimeMillis()) {
    private var last = Map.empty[String, Long]

    def emit(batchId: Long): Seq[Record] = {
      val cur = acc.value
      val now = clockMs()
      val recs = cur.toSeq.sortBy(_._1).flatMap { case (k, v) =>
        val d = v - last.getOrElse(k, 0L)
        if (d == 0) None
        else k.split('|') match {
          case Array(code, outcome) => Some(Record(now, batchId, code, outcome, d))
          case _ => Some(Record(now, batchId, k, "unknown", d))
        }
      }
      last = cur
      recs.foreach(r => sink(formatJson(r)))
      recs
    }
  }
}
