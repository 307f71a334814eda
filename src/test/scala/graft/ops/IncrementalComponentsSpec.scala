package graft.ops

import graft.SparkSpec

/** Folding a batch of new edges into a standing component assignment must
  * equal a full connected-components recompute over the union edge set —
  * including when a batch bridges two standing components through a
  * brand-new node, and when it replays edges already reflected. */
class IncrementalComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def fold(assign: Map[Long, Long], batch: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.incrementalComponents(
        assign.toSeq.toDF("id", "component_id"), batch.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incremental fold == full recompute on random graphs (ScalaCheck)") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val edgeGen = Gen.listOfN(24,
      Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 14L)).suchThat(p => p._1 != p._2))
      .suchThat(_.nonEmpty)
    val prop = forAll(edgeGen, edgeGen) { (first, second) =>
      fold(cc(first), second) == cc(first ++ second)
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(r.passed, r.status.toString)
  }

  test("a new node bridging two standing components merges them to the global min") {
    // standing: {1,2} and {10,11}; batch: 2-99, 99-10 (99 unseen)
    val folded = fold(cc(Seq((1L, 2L), (10L, 11L))), Seq((2L, 99L), (99L, 10L)))
    assert(folded == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L, 99L -> 1L))
  }

  test("replaying already-reflected edges is a no-op (idempotence)") {
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val assign = cc(base)
    assert(fold(assign, base) == assign)
  }

  test("batch touching no standing nodes forms its own components") {
    val folded = fold(cc(Seq((1L, 2L))), Seq((20L, 21L), (21L, 22L)))
    assert(folded == Map(1L -> 1L, 2L -> 1L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("the merge map is applied as a broadcast relabel, not a recompute") {
    val assign = cc(Seq((1L, 2L), (10L, 11L))).toSeq.toDF("id", "component_id")
    val out = Graph.incrementalComponents(assign, Seq((2L, 10L)).toDF("id_a", "id_b"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the comp->comp merge map must broadcast onto the standing assignment")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "no nested-loop join anywhere")
    assert(out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L))
  }
}
