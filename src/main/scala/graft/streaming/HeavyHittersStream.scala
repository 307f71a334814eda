package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters per group — the continuous form of the batch
  * top-k-terms queries (q27/q66), with BOUNDED state.
  *
  * An exact continuous top-k needs every distinct token's count — state
  * O(vocabulary), which at corpus scale is exactly what streaming state
  * must not be. The Misra–Gries summary keeps `capacity` counters per
  * group and guarantees, after N observations:
  *
  *   - every token with true count > N / (capacity+1) IS in the summary
  *     (no false negatives among the true heavy hitters);
  *   - each kept estimate undercounts by at most N / (capacity+1).
  *
  * The summary also MERGES (decrement by the evicted mass), which is what
  * makes it a partial aggregate — the same algebra that lets the sketch
  * family (X50 HLL, X58 quantiles) shuffle sketches instead of values.
  * State per group = `capacity` (token, count) pairs, independent of both
  * stream length and vocabulary size.
  *
  * Emission (update mode): after each batch, the group's current top
  * `emitK` estimates. HeavyHittersStreamSpec pins the presence guarantee,
  * the error bound, and cross-batch accumulation against exact counts.
  */
object HeavyHittersStream {

  case class TokenEvent(group: String, token: String)
  case class HHEstimate(group: String, token: String, minCount: Long, processed: Long)
  case class HHState(counters: Map[String, Long], processed: Long)

  /** Misra–Gries update of `counters` (≤ capacity entries) with one more
    * observation of `t`. */
  private[streaming] def observe(
      counters: Map[String, Long], capacity: Int, t: String): Map[String, Long] =
    counters.get(t) match {
      case Some(c) => counters.updated(t, c + 1)
      case None if counters.size < capacity => counters.updated(t, 1L)
      case None =>
        // decrement-all; drop zeros. The classic MG step: charges one unit
        // to every kept counter AND the new arrival, preserving the
        // undercount bound.
        counters.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
    }

  def heavyHitters(
      events: Dataset[TokenEvent],
      capacity: Int = 64,
      emitK: Int = 10): Dataset[HHEstimate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (group: String, evs: Iterator[TokenEvent], state: GroupState[HHState]) =>
          val prior = state.getOption.getOrElse(HHState(Map.empty, 0L))
          var counters = prior.counters
          var n = prior.processed
          evs.foreach { e => counters = observe(counters, capacity, e.token); n += 1 }
          state.update(HHState(counters, n))
          counters.toSeq.sortBy { case (t, c) => (-c, t) }.take(emitK).iterator
            .map { case (t, c) => HHEstimate(group, t, c, n) }
      }
  }
}
