package graft

import org.apache.spark.sql.SparkSession

/** Session tunings shared by every entry point (Bench, Verify, the dev
  * timers). These change PLANS, never results — each is an optimizer/
  * AQE knob with a measured rationale:
  *
  *  - `InferFiltersFromGenerate` excluded: the rule copies a
  *    generator's input into a `size(...) > 0` filter, and predicate
  *    pushdown then sinks that filter into the SCAN — for the engine's
  *    explode-over-computed-expression pipelines (winnow fingerprints,
  *    char-gram profiles, shingles) the expensive per-document walk
  *    then runs a SECOND time, serially, in the single scan task
  *    below `spread`'s round-robin exchange. JobProfile (round 11):
  *    q211's pre-spread stage 270 ms → 44 ms, whole query 1.4 s →
  *    0.7 s. The rule's upside (skipping empty-array rows early) only
  *    pays when the generator input is a STORED column, which the
  *    engine's hot paths never explode.
  *
  *  - AQE `coalescePartitions.minPartitionSize` 1 MB → 64 KB: AQE
  *    coalesces post-shuffle partitions by BYTE size, and the
  *    posting-list/pair stages are CPU-dense at tiny byte volumes
  *    (sub-µs-per-byte walks): at sf0.1 the q211 pair walk coalesced
  *    to ONE task (91 k rows ≈ 1.6 MB) and serialized 360-440 ms of
  *    CPU. 64 KB keeps tiny-byte CPU-dense stages at local[32]
  *    parallelism; at cluster scale partitions dwarf both floors, so
  *    the knob is inert there.
  */
object Sessions {

  val ExcludedOptimizerRules: String =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  /** Apply the shared tunings to a session builder. */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.optimizer.excludedRules", ExcludedOptimizerRules)
    .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "65536")
}
