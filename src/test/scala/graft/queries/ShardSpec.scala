package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 wave-44 specs: the serpentine balance guarantee (X293), the
  * Bresenham fire-count invariant behind the mixture schedule (X295),
  * and the blocking-audit bound (X298 candidates can only ever MISS
  * truth pairs, never invent them). The oracle gate covers value-level
  * parity; these pin the guarantees the oracle can't express. */
class ShardSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("snake shards: per-shard doc counts differ by at most 1 at ANY corpus size") {
    // the deal is by rank, so counts are ⌈N/S⌉ or ⌊N/S⌋ regardless of the
    // size distribution — the structural half of the balance guarantee
    val out = ShardQueries.q265_snake_shards(spark, sfDir)
      .select("n_docs").as[Long].collect()
    assert(out.size == ShardQueries.SnakeShards)
    assert(out.max - out.min <= 1, s"counts spread ${out.min}..${out.max}")
  }

  test("snake shards: serpentine balance beats plain round-robin on a sorted deal") {
    // rank-sum argument made empirical: with sizes = rank positions
    // (worst case for round-robin), the snake's per-shard size spread is
    // strictly tighter than modulo dealing's
    val n = 160
    val s = 8
    val sizes = (1 to n).map(_.toLong)
    def spread(assign: Int => Int): Long = {
      val sums = sizes.zipWithIndex.groupMapReduce { case (_, i) => assign(i) }(_._1)(_ + _)
      sums.values.max - sums.values.min
    }
    val snake = spread { i =>
      val block = i / s; val pos = i % s
      if (block % 2 == 0) pos else s - 1 - pos
    }
    val rr = spread(_ % s)
    assert(snake == 0, s"snake spread $snake on the pairwise-cancelling case")
    assert(rr > snake, s"round-robin spread $rr should exceed snake's $snake")
  }

  test("mixture schedule: source s fires floor(T*w/W) or +1 times among slots <= T") {
    // the Bresenham invariant: fire times t = ceil(k*W/w) imply the number
    // of fires with t <= T is floor(T*w/W) — check it on the emitted head
    val head = ShardQueries.q267_mixture_schedule(spark, sfDir)
      .select("t", "source").collect()
    assert(head.length == ShardQueries.SchedSlots)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val w = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map { r =>
        val n = r.getLong(1)
        r.getString(0) -> math.max(1L, (100L * math.min(n, ShardQueries.SchedCap)) / n)
      }.toMap
    val tw = w.values.sum
    val tMax = head.map(_.getLong(0)).max
    // count fires per source at horizon tMax-1 (the last slot may be
    // mid-step; the strict-interior horizon is exactly determined)
    val horizon = tMax - 1
    val fired = head.filter(_.getLong(0) <= horizon)
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    w.foreach { case (src, ws) =>
      val expect = horizon * ws / tw
      val got = fired.getOrElse(src, 0L)
      // the head is a 40-slot window: a source can't have fired MORE than
      // its Bresenham quota; it fires exactly the quota unless its docs
      // ran out (impossible here: quota << corpus) or the window cut it
      assert(got <= expect, s"$src fired $got > quota $expect at t<=$horizon")
    }
    // schedule is gap-free: slots are 1..SchedSlots with nondecreasing t
    val ts = ShardQueries.q267_mixture_schedule(spark, sfDir)
      .orderBy("slot").select("t").as[Long].collect()
    assert(ts.sameElements(ts.sorted), "schedule head not t-ordered")
  }

  test("blocking audit: hits never exceed candidates or truth; bounds hold") {
    val r = ShardQueries.q270_blocking_audit(spark, sfDir).collect()(0)
    val (cand, truth, hit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(hit <= cand && hit <= truth)
    val completeness = r.getLong(3)
    assert(completeness >= 0 && completeness <= 10000)
    val reduction = r.getLong(4)
    assert(reduction >= 0 && reduction <= 1000000)
  }
}
