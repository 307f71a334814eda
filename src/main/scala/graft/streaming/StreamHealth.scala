package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Liveness / progress monitoring for streaming queries — the engine's
  * form of the reference's health surface: the stream-alive flag plus a
  * staleness bound on the last processed event
  * (`liveness/CustomLivenessIndicator.kt:22-64`, toggles at
  * `EcommerceTransactionsLogEventsStream.kt:47-59,95-97`), and the
  * per-event tracing side-channel (`utils/ViewUpdateTracingUtils.kt:23-37`)
  * whose Spark equivalent is `df.observe(...)` metrics surfaced through
  * query progress events.
  *
  * Register once per session: `spark.streams.addListener(new StreamHealth(...))`;
  * expose [[StreamHealth.state]] on whatever probe endpoint the deployment
  * uses (the reference serves it at `/actuator/health/liveness`).
  */
class StreamHealth(inactivityTimeoutMs: Long = 3600L * 1000)
    extends StreamingQueryListener {

  sealed trait State
  case object Correct extends State
  case object Broken extends State

  private case class QueryHealth(active: Boolean, lastProgressAtMs: Long)
  private val queries = new ConcurrentHashMap[java.util.UUID, QueryHealth]()

  /** Observed metrics per (queryId, observation name), from
    * `df.observe(name, exprs...)` — they ride along with progress at zero
    * extra passes over the data. Two views with different semantics:
    * `latest` (the most recent batch's values — gauges like max/avg) and
    * `totals` (Long/Double fields summed across batches — counters; a
    * trailing empty batch must not zero a count). Callers pick the
    * accessor matching their expression's semantics. */
  private val latestMetrics =
    new ConcurrentHashMap[(java.util.UUID, String), Map[String, Any]]()
  private val totalMetrics =
    new ConcurrentHashMap[(java.util.UUID, String), Map[String, Any]]()

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    queries.put(e.id, QueryHealth(active = true, System.currentTimeMillis()))

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    queries.put(e.progress.id, QueryHealth(active = true, System.currentTimeMillis()))
    e.progress.observedMetrics.forEach { (name, row) =>
      val batch = row.schema.fieldNames.zipWithIndex
        .map { case (f, i) => f -> row.get(i) }.toMap
      latestMetrics.put((e.progress.id, name), batch)
      totalMetrics.merge((e.progress.id, name), batch, (old, nw) =>
        nw.map {
          case (k, v: java.lang.Long) =>
            k -> java.lang.Long.valueOf(old.get(k).collect { case o: java.lang.Long => o.longValue }
              .getOrElse(0L) + v.longValue)
          case (k, v: java.lang.Double) =>
            k -> java.lang.Double.valueOf(old.get(k).collect { case o: java.lang.Double => o.doubleValue }
              .getOrElse(0.0) + v.doubleValue)
          case kv => kv
        })
    }
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    queries.computeIfPresent(e.id, (_, h) => h.copy(active = false))

  /** CORRECT iff every known query is active and none is staler than the
    * inactivity bound (negative bound disables staleness, mirroring the
    * reference's config). No queries yet = CORRECT (startup grace). */
  def state(nowMs: Long = System.currentTimeMillis()): State = {
    val it = queries.values().iterator()
    while (it.hasNext) {
      val h = it.next()
      if (!h.active) return Broken
      if (inactivityTimeoutMs >= 0 && nowMs - h.lastProgressAtMs > inactivityTimeoutMs)
        return Broken
    }
    Correct
  }

  /** Most recent batch's observed values — for gauge expressions. */
  def observedMetric(queryId: java.util.UUID, name: String): Option[Map[String, Any]] =
    Option(latestMetrics.get((queryId, name)))

  /** Cross-batch sums of Long/Double fields — for counter expressions. */
  def observedTotal(queryId: java.util.UUID, name: String): Option[Map[String, Any]] =
    Option(totalMetrics.get((queryId, name)))
}
