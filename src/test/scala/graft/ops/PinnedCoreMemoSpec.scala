package graft.ops

import graft.SparkSpec
import java.util.concurrent.atomic.AtomicInteger

/** PinnedCoreMemo contract: one build per (session, key) even under
  * concurrent access, same instance to every consumer, eviction via
  * unpersistPinned triggers a rebuild (not an unpersisted-but-memoized
  * frame — the round-5 ADVICE leak). */
class PinnedCoreMemoSpec extends SparkSpec {
  import spark.implicits._

  test("concurrent getOrBuild builds once and hands every caller the same instance") {
    val memo = new PinnedCoreMemo[String]
    val builds = new AtomicInteger(0)
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results =
      try Await.result(Future.sequence(List.fill(8)(Future {
        memo.getOrBuild(spark, "k") {
          builds.incrementAndGet()
          Seq(1, 2, 3).toDF("v")
        }
      })), 60.seconds)
      finally pool.shutdown()
    assert(builds.get() == 1, s"expected one build, got ${builds.get()}")
    assert(results.forall(_ eq results.head), "all callers must share one DataFrame instance")
    assert(results.head.count() == 3)
  }

  test("unpersistPinned evicts the memo: next call rebuilds and re-pins") {
    val memo = new PinnedCoreMemo[String]
    val builds = new AtomicInteger(0)
    def get() = memo.getOrBuild(spark, "x") {
      builds.incrementAndGet(); Seq(1).toDF("v")
    }
    val first = get()
    assert(get() eq first)
    assert(builds.get() == 1)
    Dedup.unpersistPinned(spark)
    val second = get()
    assert(!(second eq first), "eviction must drop the memoized frame")
    assert(builds.get() == 2)
    assert(second.storageLevel.useMemory || second.storageLevel.useDisk,
      "the rebuilt core must be pinned again")
    Dedup.unpersistPinned(spark)
  }
}
