package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the continuous form of
  * [[graft.ops.Relational.funnel]]: per user, the first time each stage
  * was reached where stage i counts only at-or-after stage i-1's first
  * reach, maintained AS EVENTS ARRIVE and correct under out-of-order
  * delivery.
  *
  * Why state must buffer: a late-arriving stage-0 event can
  * retroactively qualify an already-seen stage-1 event (the view at t=5
  * arriving after the click at t=10 makes that click count), so earlier
  * stages' reach times only ever DECREASE and later stages can re-qualify
  * backwards. The state therefore keeps, per stage, the sorted distinct
  * event times seen (stage 0 collapses to its min — nothing upstream of
  * it changes), and recomputes the funnel chain per batch: t_0 = min
  * stage-0 ts; t_i = min stage-i ts >= t_(i-1). Within one user the
  * chain walk is O(total buffered events); state is bounded by the
  * event-time TTL eviction, the same horizon as [[CdcStream]].
  *
  * Ordering contract: stages qualify on ts alone (>=); the batch twin
  * breaks exact-ts ties with an event-id column, so convergence holds on
  * data without cross-stage ts ties (the spec's generator guarantees it;
  * production keys are millisecond timestamps where ties are rare and
  * the divergence is one tie-break).
  */
object FunnelStream {

  case class FunnelEvent(user_id: Long, ts_ms: Long, stage: Int)
  case class FunnelBuf(stageTs: Seq[Seq[Long]])
  case class FunnelRow(user_id: Long, reach_ms: Seq[Option[Long]])

  val StateTtlMs: Long = CdcStream.StateTtlMs
  val WatermarkDelay: String = CdcStream.WatermarkDelay

  /** Chain walk over per-stage sorted ts lists. */
  def funnelOf(stageTs: Seq[Seq[Long]]): Seq[Option[Long]] = {
    stageTs.foldLeft(Seq.empty[Option[Long]]) { (acc, tss) =>
      val floor = acc.lastOption.getOrElse(Some(Long.MinValue))
      val t = floor.flatMap(f => tss.find(_ >= f)) // lists kept sorted
      acc :+ t
    }
  }

  def updateUser(nStages: Int)(
      userId: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[FunnelBuf]): Iterator[FunnelRow] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val prev = state.getOption.map(_.stageTs)
      .getOrElse(Seq.fill(nStages)(Seq.empty[Long]))
    val incoming = events.toSeq.filter(e => e.stage >= 0 && e.stage < nStages)
    if (incoming.isEmpty) return Iterator.empty
    val merged = prev.zipWithIndex.map { case (tss, i) =>
      val add = incoming.filter(_.stage == i).map(_.ts_ms)
      val all = (tss ++ add).distinct.sorted
      // stage 0 only ever needs its min; later stages keep the buffer
      if (i == 0) all.take(1) else all
    }
    state.update(FunnelBuf(merged))
    state.setTimeoutTimestamp(math.max(
      incoming.map(_.ts_ms).max + StateTtlMs,
      state.getCurrentWatermarkMs() + 1))
    Iterator.single(FunnelRow(userId, funnelOf(merged)))
  }

  /** Wire a stream of (user_id, ts_ms, event_type) into per-user funnel
    * updates, one row per user per batch it appears in (update mode). */
  def funnelUpdates(
      events: DataFrame,
      stages: Seq[String]): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    val idxCol = stages.foldLeft(lit(-1)) { case (acc, s) =>
      when(col("event_type") === s, lit(stageIdx(s))).otherwise(acc)
    }
    events
      .withColumn("stage", idxCol)
      .filter(col("stage") >= 0)
      .select(col("user_id").cast("long").as("user_id"),
        col("ts_ms").cast("long").as("ts_ms"), col("stage"))
      // watermark column must survive to the stateful operator (a later
      // projection would strip the event-time tag), so tag after the
      // narrowing select; .as[] keeps extra columns
      .withColumn("eventTime", timestamp_millis(col("ts_ms")))
      .withWatermark("eventTime", WatermarkDelay)
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        updateUser(stages.size))
  }
}
